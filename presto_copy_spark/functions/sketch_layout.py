"""Datasketches compact-theta binary layout readers (round 8).

The engine's SetDigest / theta twins produce Apache DataSketches
CompactSketch binaries (Spark's theta_sketch_agg — the same
datasketches-java library the reference links).  Two reference scalars
introspect sketch internals rather than just estimating:

- ``sketch_theta_summary`` (ThetaSketchFunctions.java:57) — row
  (estimate, theta, upper_bound_std, lower_bound_std, retained_entries).
- ``hash_counts`` (type/setdigest/SetDigestFunctions.java:81) — the
  SetDigest's bottom-k minhash map hash -> count.  The theta twin's
  retained entries ARE that bottom-k hash set (same construction:
  the k smallest 64-bit hashes below theta); multiplicities are not
  tracked by a theta sketch, so every count is 1 — documented
  divergence (COVERAGE.md), same contract (which hashes survive).

Both parse the PUBLIC compact-theta serial format v3
(datasketches.apache.org, theta sketch binary spec):

  byte 0   preamble longs (1 = empty/single, 2 = exact, 3 = estimation)
  byte 1   serial version (3)
  byte 2   family (3 = COMPACT)
  byte 5   flags: 1=BIG_ENDIAN 2=READ_ONLY 4=EMPTY 8=COMPACT
           16=ORDERED 32=SINGLE_ITEM (newer writers)
  6-7      seed hash
  8-11     retained entries count (preLongs >= 2)
  16-23    theta long (preLongs == 3); else theta = 2^63 - 1 (1.0)
  then     retained 64-bit hash longs (little-endian)

and the v4 delta-compressed form newer datasketches-java writers (the
one Spark 4.x bundles) emit for ordered compact sketches:

  byte 0   preamble longs (1 = exact, 2 = estimation)
  byte 1   serial version (4)
  byte 2   family (3 = COMPACT)
  byte 3   bits per packed entry
  byte 4   bytes holding the entry count
  byte 5   flags (as above)
  6-7      seed hash
  8-15     theta long (preLongs == 2 only)
  then     entry count, little-endian, `byte 4` bytes wide
  then     the sorted hashes as successive deltas, each `byte 3` bits,
           packed MSB-first into the byte stream (BitPacking.packBits)

Both parsers are validated entry-for-entry against the JVM library's
own CompactSketch.wrap in tests/test_functions_sketch.py.

Bounds: in the exact regime (theta == 1.0, every fixture-scale sketch)
upper == lower == estimate == retained, bit-for-bit what
CompactSketch.getUpperBound(1)/getLowerBound(1) return.  In estimation
mode datasketches uses BinomialBoundsN; here the documented normal
approximation est +- numStdDev * sqrt(n * (1 - theta)) / theta is
returned instead (COVERAGE.md sketch inventory).
"""

from __future__ import annotations

import math
import struct

__all__ = ["parse_compact_theta", "theta_summary", "theta_hash_counts"]

_LONG_MAX = (1 << 63) - 1
_FLAG_EMPTY = 4
_FLAG_SINGLE = 32


def _unpack_bits(buf: bytes, bit_off: int, bits: int) -> int:
    """Read `bits` MSB-first from absolute bit offset `bit_off`."""
    val = 0
    while bits > 0:
        byte = buf[bit_off >> 3]
        avail = 8 - (bit_off & 7)
        take = avail if avail < bits else bits
        val = (val << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
        bit_off += take
        bits -= take
    return val


def _parse_v4(b: bytes) -> tuple[float, list[int]]:
    pre_longs = b[0] & 0x3F
    bits_per_entry = b[3]
    count_bytes = b[4]
    if b[5] & _FLAG_EMPTY:
        return 1.0, []
    if pre_longs == 2:
        (theta_long,) = struct.unpack_from("<q", b, 8)
        off = 16
    else:
        theta_long = _LONG_MAX
        off = 8
    count = int.from_bytes(b[off : off + count_bytes], "little")
    off += count_bytes
    hashes: list[int] = []
    prev = 0
    bit = off * 8
    for _ in range(count):
        prev += _unpack_bits(b, bit, bits_per_entry)
        bit += bits_per_entry
        hashes.append(prev)
    return theta_long / _LONG_MAX, hashes


def parse_compact_theta(raw: bytes) -> tuple[float, list[int]]:
    """Return (theta, retained_hashes) from a compact theta binary."""
    b = bytes(raw)
    if len(b) < 8:
        raise ValueError(f"theta sketch too short: {len(b)} bytes")
    pre_longs = b[0] & 0x3F
    ser_ver = b[1]
    family = b[2]
    if family != 3:
        raise ValueError(f"not a compact theta sketch (family {family})")
    if ser_ver == 4:
        return _parse_v4(b)
    if ser_ver != 3:
        raise ValueError(f"unsupported theta serial version {ser_ver}")
    flags = b[5]
    if flags & _FLAG_EMPTY:
        return 1.0, []
    if pre_longs == 1:
        # single-item sketch: the one hash immediately follows the
        # preamble long (SINGLE_ITEM flag on newer writers; older ones
        # are identified by preLongs == 1 and not EMPTY)
        (h,) = struct.unpack_from("<q", b, 8)
        return 1.0, [h]
    (count,) = struct.unpack_from("<i", b, 8)
    if pre_longs == 2:
        theta_long = _LONG_MAX
        entries_off = 16
    elif pre_longs == 3:
        (theta_long,) = struct.unpack_from("<q", b, 16)
        entries_off = 24
    else:
        raise ValueError(f"unsupported preamble longs {pre_longs}")
    hashes = list(struct.unpack_from(f"<{count}q", b, entries_off))
    return theta_long / _LONG_MAX, hashes


def theta_summary(raw: bytes, num_std_dev: int = 1) -> tuple[float, float, float, float, int]:
    """(estimate, theta, upper_bound_std, lower_bound_std,
    retained_entries) — ThetaSketchFunctions.thetaSketchSummary."""
    theta, hashes = parse_compact_theta(raw)
    n = len(hashes)
    est = n / theta
    if theta >= 1.0:
        return float(n), 1.0, float(n), float(n), n
    spread = num_std_dev * math.sqrt(n * (1.0 - theta)) / theta
    return est, theta, est + spread, max(float(n), est - spread), n


def theta_hash_counts(raw: bytes) -> dict[int, int]:
    """hash -> count map over the twin's retained bottom-k hash set.

    DOCUMENTED DIVERGENCE (user-facing — ADVICE r8): the reference's
    SetDigestFunctions.hashCounts returns real per-hash multiplicities
    (a SetDigest carries a hash->smallint count map, saturating at
    Short.MAX); this twin is backed by a theta sketch, which tracks
    PRESENCE only, so every value here is the constant 1.  The KEY SET
    is contract-faithful; the VALUES are not multiplicities.  Use this
    function only for key-set semantics (membership, intersections);
    a query that consumes the counts needs the reference's SetDigest
    layout, which is Presto-private (COVERAGE.md sketch residue)."""
    _, hashes = parse_compact_theta(raw)
    return {h: 1 for h in hashes}
