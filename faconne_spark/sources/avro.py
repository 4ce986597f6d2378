"""Stdlib-only Apache Avro object-container source/sink (S16).

Real Avro 1.11 binary format (the public spec): ``Obj\\x01`` magic, a
file-metadata map carrying ``avro.schema`` (JSON) and ``avro.codec``,
a random 16-byte sync marker, then sync-delimited blocks of
binary-encoded records (zigzag-varint longs, length-prefixed UTF-8 /
bytes, little-endian IEEE floats, union-index-prefixed nullables) with
``null`` or ``deflate`` (raw RFC 1951) codecs — the subset a flat
analytics row needs.  Nested records/arrays/maps/enums/fixed raise
pointedly (the honest seam; this is an ingestion source for tabular
Avro, not a generic object store).

Distribution shape: the WRITER encodes one container per partition
inside ``mapInPandas`` (executor-side; the driver sees one bounded
(path, n_rows) row per partition — the state-metadata-stamp class of
driver step), and the READER decodes whole files from the
``binaryFile`` source (parallelism = file count, same contract as
read_binary_files).  Only the first file's HEADER is read on the
driver, to learn the schema before distributing the decode."""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def _avro_field_type(dt):
    for cls, name in _SPARK_TO_AVRO.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    raise NotImplementedError(
        f"Avro sink supports flat primitive rows; got {dt.simpleString()}"
        " (nested/array/map columns are out of scope for this source)"
    )


def avro_schema_json(schema: T.StructType, name: str = "row") -> str:
    """Avro record schema for a flat Spark schema; every field is a
    ["null", T] union (Spark columns are nullable by default)."""
    fields = [
        {
            "name": f.name,
            "type": (
                ["null", _avro_field_type(f.dataType)]
                if f.nullable
                else _avro_field_type(f.dataType)
            ),
        }
        for f in schema.fields
    ]
    return json.dumps(
        {"type": "record", "name": name, "fields": fields}
    )


# ------------------------------------------------------ binary encoding


def _zz_enc(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_dec(buf: memoryview, pos: int):
    u, shift = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("Avro varint truncated")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _encode_value(out: bytearray, kind: str, v):
    if kind in ("long", "int"):
        out += _zz_enc(int(v))
    elif kind == "double":
        out += struct.pack("<d", float(v))
    elif kind == "float":
        out += struct.pack("<f", float(v))
    elif kind == "string":
        b = str(v).encode("utf-8")
        out += _zz_enc(len(b)) + b
    elif kind == "bytes":
        b = bytes(v)
        out += _zz_enc(len(b)) + b
    elif kind == "boolean":
        out.append(1 if v else 0)
    else:  # pragma: no cover - guarded at schema build
        raise NotImplementedError(kind)


def _decode_value(buf: memoryview, pos: int, kind: str):
    if kind in ("long", "int"):
        return _zz_dec(buf, pos)
    if kind == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if kind in ("string", "bytes"):
        n, pos = _zz_dec(buf, pos)
        raw = bytes(buf[pos : pos + n])
        if len(raw) != n:
            raise ValueError("Avro string/bytes value truncated")
        return (raw.decode("utf-8") if kind == "string" else raw), pos + n
    if kind == "boolean":
        return buf[pos] == 1, pos + 1
    raise NotImplementedError(f"Avro type {kind!r} not supported")


def _field_plan(avro_schema: dict):
    """[(name, kind, logical, nullable)] from a flat record schema —
    the decode plan shared by reader and header check."""
    if avro_schema.get("type") != "record":
        raise ValueError("Avro schema is not a record")
    plan = []
    for f in avro_schema["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise NotImplementedError(
                    f"only [null, T] unions are supported, got {t}"
                )
            t = t[1] if t[0] == "null" else t[0]
            nullable = True
        logical = None
        if isinstance(t, dict):
            logical = t.get("logicalType")
            t = t["type"]
        if t in ("record", "array", "map", "enum", "fixed"):
            raise NotImplementedError(
                f"nested Avro type {t!r} not supported by this source"
            )
        plan.append((f["name"], t, logical, nullable))
    return plan


# --------------------------------------------------------- container IO


def _encode_container(
    pdfs, schema: T.StructType, schema_json: str, codec: str, sync: bytes
) -> tuple:
    """(container bytes, n_rows) for one partition's batches."""
    plan = _field_plan(json.loads(schema_json))
    body = io.BytesIO()
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
    }
    body.write(MAGIC)
    body.write(_zz_enc(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        body.write(_zz_enc(len(kb)) + kb + _zz_enc(len(v)) + v)
    body.write(_zz_enc(0))
    body.write(sync)
    n_rows = 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        block = bytearray()
        cols = [pdf[name] for name, _, _, _ in plan]
        for i in range(len(pdf)):
            for (name, kind, logical, nullable), col in zip(plan, cols):
                v = col.iloc[i]
                is_null = v is None or (
                    isinstance(v, float) and v != v
                ) or v is pd.NaT
                if nullable:
                    block += _zz_enc(1 if not is_null else 0)
                if is_null:
                    if not nullable:
                        raise ValueError(
                            f"NULL in non-nullable Avro field {name}"
                        )
                    continue
                if logical == "timestamp-micros":
                    v = pd.Timestamp(v).value // 1000
                elif logical == "date":
                    v = (pd.Timestamp(v) - pd.Timestamp(0)).days
                _encode_value(block, kind, v)
        data = bytes(block)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        elif codec != "null":
            raise NotImplementedError(f"Avro codec {codec!r}")
        body.write(_zz_enc(len(pdf)))
        body.write(_zz_enc(len(data)))
        body.write(data)
        body.write(sync)
        n_rows += len(pdf)
    return body.getvalue(), n_rows


def _read_header(content: bytes):
    """(schema dict, codec, sync, pos-after-header)."""
    if content[:4] != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    buf = memoryview(content)
    pos = 4
    meta = {}
    while True:
        n, pos = _zz_dec(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative count form: abs count, then a byte size
            n = -n
            _, pos = _zz_dec(buf, pos)
        for _ in range(n):
            klen, pos = _zz_dec(buf, pos)
            k = bytes(buf[pos : pos + klen]).decode()
            pos += klen
            vlen, pos = _zz_dec(buf, pos)
            meta[k] = bytes(buf[pos : pos + vlen])
            pos += vlen
    sync = bytes(buf[pos : pos + 16])
    if len(sync) != 16:
        raise ValueError("Avro header truncated before sync marker")
    if "avro.schema" not in meta:
        raise ValueError("Avro container metadata lacks avro.schema")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, pos + 16


def decode_container(content: bytes) -> tuple:
    """(field names, list of row tuples) from one container — verifies
    magic, per-block sync markers, and block row counts."""
    schema, codec, sync, pos = _read_header(content)
    plan = _field_plan(schema)
    buf = memoryview(content)
    rows = []
    while pos < len(content):
        count, pos = _zz_dec(buf, pos)
        size, pos = _zz_dec(buf, pos)
        data = bytes(buf[pos : pos + size])
        if len(data) != size:
            raise ValueError("Avro block truncated")
        pos += size
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError("Avro block sync marker mismatch")
        pos += 16
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        elif codec != "null":
            raise NotImplementedError(f"Avro codec {codec!r}")
        bbuf = memoryview(data)
        bpos = 0
        for _ in range(count):
            row = []
            for name, kind, logical, nullable in plan:
                if nullable:
                    idx, bpos = _zz_dec(bbuf, bpos)
                    if idx == 0:
                        row.append(None)
                        continue
                v, bpos = _decode_value(bbuf, bpos, kind)
                if logical == "timestamp-micros":
                    v = pd.Timestamp(v, unit="us")
                elif logical == "date":
                    v = (pd.Timestamp(0) + pd.Timedelta(days=v)).date()
                row.append(v)
            rows.append(tuple(row))
        if bpos != len(data):
            raise ValueError(
                f"Avro block decoded {bpos} of {len(data)} bytes"
            )
    return [p[0] for p in plan], rows


_AVRO_TO_SPARK = {
    "long": T.LongType, "int": T.IntegerType, "double": T.DoubleType,
    "float": T.FloatType, "string": T.StringType,
    "boolean": T.BooleanType, "bytes": T.BinaryType,
}


def _spark_schema_of(avro_schema: dict) -> T.StructType:
    fields = []
    for name, kind, logical, nullable in _field_plan(avro_schema):
        if logical == "timestamp-micros":
            dt = T.TimestampType()
        elif logical == "date":
            dt = T.DateType()
        else:
            dt = _AVRO_TO_SPARK[kind]()
        fields.append(T.StructField(name, dt, nullable))
    return T.StructType(fields)


# ------------------------------------------------------------ DataFrame API


def write_avro(
    df: DataFrame, path: str, codec: str = "deflate", mode: str = "error"
) -> int:
    """Write ``df`` as one Avro object container per partition
    (executor-side encode inside mapInPandas — rows never visit the
    driver; the collected result is ONE (path, n_rows) row per
    partition, a bounded metadata read-back).  Returns total rows
    written."""
    if os.path.exists(path):
        if mode == "overwrite":
            import shutil

            shutil.rmtree(path)
        elif mode != "append":
            raise ValueError(f"path exists and mode={mode!r}: {path}")
    os.makedirs(path, exist_ok=True)
    sj = avro_schema_json(df.schema)
    schema = df.schema
    # sync marker must be identical within a file only; derive it
    # per-partition from the path for determinism
    import hashlib

    def part(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sync = hashlib.md5(f"{path}:{pid}".encode()).digest()
        content, n = _encode_container(it, schema, sj, codec, sync)
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        if n or pid == 0:  # partition 0 writes even when empty: the
            with open(fname, "wb") as fh:  # schema must survive an
                fh.write(content)          # empty dataset round trip
        yield pd.DataFrame({"path": [fname], "n_rows": [n]})

    out = df.mapInPandas(part, "path string, n_rows long").collect()
    if not any(f.endswith(".avro") for f in os.listdir(path)):
        # a zero-partition input ran no tasks at all: write the
        # header-only container from the driver so the schema survives
        # an empty dataset round trip (bounded — zero rows)
        sync = hashlib.md5(f"{path}:0".encode()).digest()
        content, _ = _encode_container([], schema, sj, codec, sync)
        with open(os.path.join(path, "part-00000.avro"), "wb") as fh:
            fh.write(content)
    return sum(r["n_rows"] for r in out)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of Avro object containers: ONE driver-side
    header read learns the schema, then whole files decode in
    parallel off the binaryFile source (parallelism = file count —
    the read_binary_files contract; fine for the many-files layout
    write_avro produces, wrong for one giant container)."""
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro")
    )
    if not files:
        raise ValueError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        schema, _codec, _sync, _ = _read_header(fh.read())
    spark_schema = _spark_schema_of(schema)
    names = [f.name for f in spark_schema.fields]
    bf = (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "*.avro"))
        .select("content")
    )

    def decode(it):
        for pdf in it:
            for content in pdf["content"]:
                got_names, rows = decode_container(bytes(content))
                if got_names != names:
                    raise ValueError(
                        f"Avro file schema mismatch: {got_names} != {names}"
                    )
                yield pd.DataFrame(rows, columns=names)

    return bf.mapInPandas(decode, spark_schema)
