"""Property tests for the pure-Python Avro codec primitives
(sources/avro_io.py) — the byte layer under the write_avro/read_avro
round-trip tests in test_sources.py.

The reference ships its own Avro decode path
(presto-record-decoder/.../avro/) — env-blocked from a live Kafka
endpoint here, so the codec itself carries the parity burden: these
properties pin the zigzag-varint wire format to the Avro spec's
canonical examples and prove encode/decode identity over the full
value domains, including multi-field position threading.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from presto_copy_spark.sources.avro_io import (
    _dec_value,
    _enc_value,
    _zigzag_decode,
    _zigzag_encode,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


def test_zigzag_canonical_spec_examples():
    # Avro spec 1.11 "Binary encoding" table — the wire format is
    # pinned, not just self-consistent
    for n, wire in [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (2, b"\x04"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
    ]:
        assert _zigzag_encode(n) == wire, n
        assert _zigzag_decode(memoryview(wire), 0) == (n, len(wire))


@given(I64)
def test_zigzag_roundtrip_full_i64(n):
    buf = _zigzag_encode(n)
    assert len(buf) <= 10  # 64-bit varint never exceeds 10 bytes
    got, pos = _zigzag_decode(memoryview(buf), 0)
    assert got == n and pos == len(buf)


@given(st.text(max_size=200))
def test_string_value_roundtrip(s):
    buf = _enc_value("string", s)
    got, pos = _dec_value("string", memoryview(buf), 0)
    assert got == s and pos == len(buf)


@given(st.binary(max_size=200))
def test_bytes_value_roundtrip(b):
    buf = _enc_value("bytes", b)
    got, pos = _dec_value("bytes", memoryview(buf), 0)
    assert got == b and pos == len(buf)


@given(st.floats(allow_nan=False))
def test_double_value_roundtrip_exact(x):
    buf = _enc_value("double", x)
    got, pos = _dec_value("double", memoryview(buf), 0)
    assert got == x and pos == 8


@given(st.floats(allow_nan=False, width=32))
def test_float_value_roundtrip_at_f32_precision(x):
    buf = _enc_value("float", x)
    got, pos = _dec_value("float", memoryview(buf), 0)
    assert got == struct.unpack("<f", struct.pack("<f", x))[0] and pos == 4


_FIELD = st.one_of(
    st.tuples(st.just("boolean"), st.booleans()),
    st.tuples(st.just("long"), I64),
    st.tuples(st.just("double"), st.floats(allow_nan=False)),
    st.tuples(st.just("string"), st.text(max_size=50)),
    st.tuples(st.just("bytes"), st.binary(max_size=50)),
)


@settings(max_examples=200)
@given(st.lists(_FIELD, min_size=1, max_size=8))
def test_record_position_threading(fields):
    """A record is fields encoded back-to-back with no framing — every
    decoder step must land exactly on the next field's first byte."""
    buf = memoryview(b"".join(_enc_value(t, v) for t, v in fields))
    pos = 0
    for t, v in fields:
        got, pos = _dec_value(t, buf, pos)
        assert got == v, (t, v, got)
    assert pos == len(buf)
