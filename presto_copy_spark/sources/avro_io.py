"""Avro source/sink without the spark-avro module.

Reference: Presto's Hive connector lists AVRO as a first-class storage
format (presto-hive-metastore/.../HiveStorageFormat.java:49-106).  The
container ships neither org.apache.spark:spark-avro nor a Python avro
package (probed — COVERAGE.md §2.1), so this module implements the
Apache Avro 1.x OBJECT CONTAINER FILE format (public spec:
avro.apache.org/docs/current/specification) directly:

- header: magic ``Obj\\x01`` + metadata map (``avro.schema`` JSON,
  ``avro.codec``) + 16-byte sync marker
- blocks: record-count varint, byte-size varint, serialized records,
  sync marker
- binary encoding: zigzag-varint longs/ints, little-endian IEEE
  float/double, length-prefixed UTF-8 strings / bytes, union index for
  nullable fields

Supported schema surface: records of null/boolean/int/long/float/
double/string/bytes and the ``["null", T]`` nullable union — the
relational column types.  Codecs: ``null`` and ``deflate`` (zlib raw)
on read; writes use ``null``.  Nested records/arrays/maps/enums are
rejected with a clear error (use parquet for nested data).

Execution shape (the 100 TB posture):
- write: ``mapInPandas`` — each input partition encodes its Arrow
  batches and streams one ``part-*.avro`` file; bytes never visit the
  driver; returns a one-row-per-partition manifest.
- read: ``binaryFile`` source (one task per file) + ``mapInPandas``
  decode; the schema is sniffed once driver-side from one file header.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_avro", "read_avro"]

_MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}
_AVRO_TO_SPARK = {v: k for k, v in _SPARK_TO_AVRO.items()}


# ---------------------------------------------------------------------------
# primitive binary codec (Avro spec §Binary Encoding)
# ---------------------------------------------------------------------------
def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _enc_value(typ: str, v) -> bytes:
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("int", "long"):
        return _zigzag_encode(int(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        raw = bytes(v)
        return _zigzag_encode(len(raw)) + raw
    raise ValueError(f"unsupported avro type {typ}")


def _dec_value(typ: str, buf: memoryview, pos: int):
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    raise ValueError(f"unsupported avro type {typ}")


# ---------------------------------------------------------------------------
# schema translation
# ---------------------------------------------------------------------------
def _avro_schema_for(df: DataFrame) -> dict:
    fields = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t == "integer":
            t = "int"
        elif t == "bigint":
            t = "long"
        if t not in _SPARK_TO_AVRO:
            raise ValueError(
                f"avro sink supports flat relational types only; column"
                f" {f.name} is {t} (use parquet for nested data)"
            )
        at = _SPARK_TO_AVRO[t]
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": "topLevelRecord", "fields": fields}


def _field_types(schema: dict) -> list[tuple[str, str, bool]]:
    """[(name, primitive type, nullable)] from a record schema."""
    out = []
    for f in schema["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise ValueError(f"unsupported union {t} (field {f['name']})")
            nullable = True
            t = next(x for x in t if x != "null")
        if not isinstance(t, str) or t not in _AVRO_TO_SPARK:
            raise ValueError(
                f"unsupported avro field type {t!r} (field {f['name']});"
                " flat relational schemas only"
            )
        out.append((f["name"], t, nullable))
    return out


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------
def _write_header(out: io.BufferedWriter, schema_json: str, sync: bytes) -> None:
    out.write(_MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    out.write(_zigzag_encode(len(meta)))
    for k, v in meta.items():
        kk = k.encode()
        out.write(_zigzag_encode(len(kk)) + kk)
        out.write(_zigzag_encode(len(v)) + v)
    out.write(_zigzag_encode(0))  # end of metadata map
    out.write(sync)


def _read_header(buf: memoryview) -> tuple[dict, str, bytes, int]:
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("not an avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # block with explicit byte size
            n = -n
            _, pos = _zigzag_decode(buf, pos)
        for _ in range(n):
            klen, pos = _zigzag_decode(buf, pos)
            k = bytes(buf[pos : pos + klen]).decode()
            pos += klen
            vlen, pos = _zigzag_decode(buf, pos)
            meta[k] = bytes(buf[pos : pos + vlen])
            pos += vlen
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = bytes(buf[pos : pos + 16])
    return schema, codec, sync, pos + 16


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> DataFrame:
    """Write ``df`` as Avro part files under ``path``; runs the write
    EAGERLY (exactly one action) and returns the materialized manifest
    (file, n_rows) as a local DataFrame — re-using the result cannot
    re-trigger the encoder and duplicate files.

    ``mode='overwrite'`` (default) clears prior ``*.avro`` parts first,
    ``'append'`` keeps them.  Caveat (documented, like any
    committer-less sink): a task retried by the scheduler after
    partially finishing could leave an extra part file; production
    deployments should stage to a temp dir + rename, which is what the
    engine's DELETE sink does (sources/connectors.py).

    Nullable int/long columns are routed through strings: Arrow->pandas
    turns them into float64 (NaN for null), which silently corrupts
    values above 2^53 — the string path is exact at any magnitude."""
    import glob as _glob

    from pyspark.sql import functions as F  # noqa: N812

    schema_json = json.dumps(_avro_schema_for(df))
    fts = _field_types(json.loads(schema_json))
    os.makedirs(path, exist_ok=True)
    if mode == "overwrite":
        for old in _glob.glob(os.path.join(path, "*.avro")):
            os.remove(old)
    elif mode != "append":
        raise ValueError(f"unsupported write mode {mode!r}")

    via_str = {
        name for name, typ, nullable in fts if nullable and typ in ("int", "long")
    }
    src = df.select(
        *[
            F.col(name).cast("string").alias(name) if name in via_str else F.col(name)
            for name, _, _ in fts
        ]
    )

    def encode(batches):
        import pandas as pd

        sync = uuid.uuid4().bytes
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        n_total = 0
        out = open(fname, "wb")
        _write_header(out, schema_json, sync)
        for pdf in batches:
            if not len(pdf):
                continue
            block = bytearray()
            cols = [pdf[name] for name, _, _ in fts]
            for row in zip(*cols):
                for (name, typ, nullable), v in zip(fts, row):
                    isnull = v is None or (v != v if isinstance(v, float) else False)
                    if nullable:
                        if isnull:
                            block += _zigzag_encode(0)
                            continue
                        block += _zigzag_encode(1)
                    elif isnull:
                        raise ValueError(f"null in non-nullable field {name}")
                    if name in via_str:
                        v = int(v)
                    block += _enc_value(typ, v)
            out.write(_zigzag_encode(len(pdf)))
            out.write(_zigzag_encode(len(block)))
            out.write(bytes(block))
            out.write(sync)
            n_total += len(pdf)
        out.close()
        if n_total == 0:
            os.remove(fname)
            return
        yield pd.DataFrame({"file": [fname], "n_rows": [n_total]})

    rows = src.mapInPandas(encode, schema="file string, n_rows long").collect()
    return df.sparkSession.createDataFrame(rows, schema="file string, n_rows long")

def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read an Avro directory/file written by any Avro writer whose
    schema stays in the supported flat-relational subset."""
    import glob as _glob

    candidates = (
        [path]
        if os.path.isfile(path)
        else sorted(_glob.glob(os.path.join(path, "*.avro")))
    )
    if not candidates:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(candidates[0], "rb") as f:
        schema, _codec, _sync, _pos = _read_header(memoryview(f.read()))
    fts = _field_types(schema)
    spark_fields = ", ".join(
        f"{name} {_AVRO_TO_SPARK[typ]}" for name, typ, _ in fts
    )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                buf = memoryview(bytes(blob))
                fschema, codec, sync, pos = _read_header(buf)
                ffts = _field_types(fschema)
                rows: list[tuple] = []
                n = len(buf)
                while pos < n:
                    count, pos = _zigzag_decode(buf, pos)
                    size, pos = _zigzag_decode(buf, pos)
                    body = buf[pos : pos + size]
                    pos += size
                    if codec == "deflate":
                        body = memoryview(zlib.decompress(bytes(body), -15))
                    elif codec != "null":
                        raise ValueError(f"unsupported avro codec {codec}")
                    bpos = 0
                    for _ in range(count):
                        vals = []
                        for _name, typ, nullable in ffts:
                            if nullable:
                                idx, bpos = _zigzag_decode(body, bpos)
                                if idx == 0:
                                    vals.append(None)
                                    continue
                            v, bpos = _dec_value(typ, body, bpos)
                            vals.append(v)
                        rows.append(tuple(vals))
                    if bytes(buf[pos : pos + 16]) != sync:
                        raise ValueError("avro sync marker mismatch")
                    pos += 16
                yield pd.DataFrame(
                    dict(zip([f[0] for f in ffts], zip(*rows)))
                    if rows
                    else {f[0]: [] for f in ffts}
                )

    files = spark.read.format("binaryFile").load(candidates if len(candidates) > 1 else candidates[0])
    return files.select("content").mapInPandas(decode, schema=spark_fields)
