"""Avro Object Container Files — pure-Python reader/writer.

Avro is the Hadoop ecosystem's canonical exchange format; the
reference era's pipelines hand SequenceFiles OR Avro containers to
downstream consumers.  This container ships Avro's JVM jars but not
the ``spark-avro`` datasource module, so the Spark-first route is the
repo's established interop discipline (sources/seqfile.py,
sources/recordio.py): parse the CONTAINER in Python, one file per
task over ``binaryFile`` + RDD decode, encode per partition on the
way out — no classpath, no codec library beyond stdlib ``zlib``.

Format (Avro 1.11 spec, "Object Container Files" + "Binary
Encoding"): magic ``Obj\\x01``; a metadata map (zigzag-varint-counted
string→bytes entries; ``avro.schema`` JSON, ``avro.codec``); a 16-byte
sync marker; then data blocks of (object count, byte size, objects,
sync).  Objects encode fields in schema order: zigzag varints for
int/long, little-endian IEEE for float/double, length-prefixed
bytes/string, one byte for boolean, nothing for null; nullable fields
are ``["null", T]`` unions (zigzag branch index, then the value).

Scope: FLAT record schemas over the types a warehouse table uses
(boolean/int/long/float/double/string/bytes, each optionally
nullable), ``null`` and ``deflate`` codecs.  Nested records/arrays/
maps/enums/fixed raise loudly — the honest-gate convention.

Scale: files are the split unit (blocks carry sync markers, so a
block-level splitter is possible; interop ingestion reads whole
files — the reference's isSplitable=false posture); per-partition
writers make file count = write parallelism.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "bytes",
}
_AVRO_TO_SPARK = {v: k for k, v in _SPARK_TO_AVRO.items()}


# --- primitive codecs ---------------------------------------------------------


def _zz_encode(buf: bytearray, n: int) -> None:
    """Zigzag varint (Avro int/long)."""
    u = (n << 1) ^ (n >> 63)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _zz_decode(b: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        byte = b[pos]
        pos += 1
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _enc_value(buf: bytearray, v, avro_type: str) -> None:
    if avro_type in ("long", "int"):
        _zz_encode(buf, int(v))
    elif avro_type == "double":
        buf += struct.pack("<d", float(v))
    elif avro_type == "float":
        buf += struct.pack("<f", float(v))
    elif avro_type == "string":
        raw = str(v).encode("utf-8")
        _zz_encode(buf, len(raw))
        buf += raw
    elif avro_type == "bytes":
        raw = bytes(v)
        _zz_encode(buf, len(raw))
        buf += raw
    elif avro_type == "boolean":
        buf.append(1 if v else 0)
    else:  # pragma: no cover - schema gate catches first
        raise ValueError(f"unsupported avro type {avro_type}")


def _dec_value(b: bytes, pos: int, avro_type: str):
    if avro_type in ("long", "int"):
        return _zz_decode(b, pos)
    if avro_type == "double":
        return struct.unpack_from("<d", b, pos)[0], pos + 8
    if avro_type == "float":
        return struct.unpack_from("<f", b, pos)[0], pos + 4
    if avro_type == "string":
        ln, pos = _zz_decode(b, pos)
        return b[pos : pos + ln].decode("utf-8"), pos + ln
    if avro_type == "bytes":
        ln, pos = _zz_decode(b, pos)
        return bytes(b[pos : pos + ln]), pos + ln
    if avro_type == "boolean":
        return b[pos] != 0, pos + 1
    raise ValueError(f"unsupported avro type {avro_type}")


# --- schema bridge ------------------------------------------------------------


def schema_to_avro_json(schema: T.StructType, name: str = "Record") -> str:
    """StructType → Avro record-schema JSON (nullable fields become
    ["null", T] unions).  Unsupported Spark types raise loudly."""
    fields = []
    for f in schema.fields:
        at = _SPARK_TO_AVRO.get(f.dataType)
        if at is None:
            raise ValueError(
                f"no flat Avro mapping for column '{f.name}' of type "
                f"{f.dataType.simpleString()}"
            )
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return json.dumps(
        {"type": "record", "name": name, "fields": fields}
    )


def _parse_avro_schema(schema_json: str) -> list[tuple[str, str, bool]]:
    """Avro record JSON → [(name, primitive type, nullable)]."""
    sch = json.loads(schema_json)
    if sch.get("type") != "record":
        raise ValueError("only record top-level Avro schemas supported")
    out = []
    for f in sch["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):
            branches = [x for x in t if x != "null"]
            if len(branches) != 1 or len(t) != len(branches) + 1:
                raise ValueError(
                    f"field '{f['name']}': only ['null', T] unions supported"
                )
            t = branches[0]
            nullable = True
        if not isinstance(t, str) or t not in _AVRO_TO_SPARK:
            raise ValueError(
                f"field '{f['name']}': unsupported Avro type {t!r}"
            )
        out.append((f["name"], t, nullable))
    return out


def avro_to_spark_schema(schema_json: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(n, _AVRO_TO_SPARK[t], nullable)
            for n, t, nullable in _parse_avro_schema(schema_json)
        ]
    )


# --- container ----------------------------------------------------------------


def encode_avro_file(
    rows: Iterator[tuple],
    schema_json: str,
    codec: str = "deflate",
    sync_seed: bytes = b"h20w",
    block_records: int = 4096,
) -> bytes:
    """Rows (tuples in schema field order) → one Avro OCF byte string."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec '{codec}'")
    fields = _parse_avro_schema(schema_json)
    sync = hashlib.md5(sync_seed + schema_json.encode()).digest()
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
    }
    _zz_encode(out, len(meta))
    for k, v in sorted(meta.items()):
        raw = k.encode()
        _zz_encode(out, len(raw))
        out += raw
        _zz_encode(out, len(v))
        out += v
    _zz_encode(out, 0)  # metadata map terminator
    out += sync

    def flush(block: bytearray, count: int) -> None:
        if not count:
            return
        body = bytes(block)
        if codec == "deflate":
            # raw DEFLATE (no zlib header/checksum), per the spec
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            body = comp.compress(body) + comp.flush()
        _zz_encode(out, count)
        _zz_encode(out, len(body))
        out.extend(body)
        out.extend(sync)

    block = bytearray()
    count = 0
    for row in rows:
        for v, (name, at, nullable) in zip(row, fields):
            if nullable:
                if v is None:
                    _zz_encode(block, 0)  # union branch: null
                    continue
                _zz_encode(block, 1)
            elif v is None:
                raise ValueError(f"null in non-nullable field '{name}'")
            _enc_value(block, v, at)
        count += 1
        if count >= block_records:
            flush(block, count)
            block = bytearray()
            count = 0
    flush(block, count)
    return bytes(out)


def decode_avro_file(blob: bytes) -> tuple[str, list[tuple]]:
    """One Avro OCF byte string → (schema JSON, rows as tuples)."""
    if blob[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zz_decode(blob, pos)
        if n == 0:
            break
        if n < 0:  # negative count: absolute byte size follows
            n = -n
            _size, pos = _zz_decode(blob, pos)
        for _ in range(n):
            kl, pos = _zz_decode(blob, pos)
            key = blob[pos : pos + kl].decode()
            pos += kl
            vl, pos = _zz_decode(blob, pos)
            meta[key] = blob[pos : pos + vl]
            pos += vl
    schema_json = meta["avro.schema"].decode()
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec '{codec}'")
    fields = _parse_avro_schema(schema_json)
    sync = blob[pos : pos + 16]
    pos += 16
    rows: list[tuple] = []
    n_blob = len(blob)
    while pos < n_blob:
        count, pos = _zz_decode(blob, pos)
        size, pos = _zz_decode(blob, pos)
        body = blob[pos : pos + size]
        pos += size
        if blob[pos : pos + 16] != sync:
            raise ValueError("avro block sync mismatch (torn file?)")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        bpos = 0
        for _ in range(count):
            vals = []
            for _name, at, nullable in fields:
                if nullable:
                    branch, bpos = _zz_decode(body, bpos)
                    if branch == 0:
                        vals.append(None)
                        continue
                v, bpos = _dec_value(body, bpos, at)
                vals.append(v)
            rows.append(tuple(vals))
    return schema_json, rows


# --- Spark plumbing -----------------------------------------------------------


def write_avro(
    df: DataFrame, path: str, codec: str = "deflate"
) -> int:
    """``df`` → one Avro OCF per partition under ``path`` (the
    recordio per-partition writer idiom: executors write part files,
    file count = parallelism).  Returns the row count."""
    os.makedirs(path, exist_ok=True)
    schema_json = schema_to_avro_json(df.schema)

    def _write_part(idx: int, rows) -> Iterator[int]:
        buf = io.BytesIO()
        n = 0
        mat = []
        for r in rows:
            mat.append(tuple(r))
            n += 1
        if n:
            buf.write(
                encode_avro_file(
                    iter(mat), schema_json, codec=codec,
                    sync_seed=f"part-{idx}".encode(),
                )
            )
            with open(
                os.path.join(path, f"part-{idx:05d}.avro"), "wb"
            ) as fh:
                fh.write(buf.getvalue())
        yield n

    return sum(df.rdd.mapPartitionsWithIndex(_write_part).collect())


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro OCFs → DataFrame (one task per file; schema from the
    first file's embedded metadata, all files must agree)."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro")
    )
    first = files.select("content").head()
    if first is None:
        raise ValueError(f"no .avro files under {path}")
    # schema from the first file's embedded metadata (files are
    # interop-sized; a header-only fast path is easy if ever needed)
    schema_json = decode_avro_file(bytes(first[0]))[0]
    spark_schema = avro_to_spark_schema(schema_json)

    def _decode(kv):
        _fname, blob = kv
        got_schema, rows = decode_avro_file(bytes(blob))
        if json.loads(got_schema) != json.loads(schema_json):
            raise ValueError("avro schema mismatch across files")
        return rows

    rdd = (
        files.select("path", "content")
        .rdd.map(tuple)
        .flatMap(_decode)
    )
    return spark.createDataFrame(rdd, spark_schema)
