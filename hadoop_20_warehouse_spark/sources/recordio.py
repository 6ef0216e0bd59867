"""Hadoop Record I/O wire formats: binary and CSV readers/writers.

The reference ships a DDL + compiler ("rcc") whose generated record
classes serialize through pluggable RecordOutput/RecordInput backends
(record/package.html:60-120).  ``types.parse_record_ddl`` already
compiles the DDL to a StructType; this module closes the remaining gap
— reading and writing files in the actual wire formats — so data
serialized by reference-generated records round-trips through the
engine.

Binary format (record/BinaryRecordOutput.java:70-118):
  * byte      -> 1 signed byte
  * boolean   -> 1 byte (0/1)
  * int/long  -> zero-compressed vint/vlong
                 (io/WritableUtils.java:246-288: one byte for
                 -112..127, else a length byte -113..-120 (positive)
                 or -121..-128 (one's-complemented negative) followed
                 by the value's non-zero bytes, high byte first)
  * float     -> 4 bytes big-endian IEEE-754
  * double    -> 8 bytes big-endian IEEE-754
  * ustring   -> vint byte-length + standard UTF-8
                 (record/Utils.java:304-316)
  * buffer    -> vint length + raw bytes
  * vector    -> vint count + elements
  * map       -> vint count + alternating key,value (TreeMap order —
                 keys ascending — record/BinaryRecordOutput.java:115)
  * record    -> fields concatenated, NO framing (start/endRecord are
                 no-ops) — the schema drives both encode and decode.

CSV format (record/CsvRecordOutput.java:57-140, Utils.java:108-240):
  * one record per line, fields comma-separated
  * boolean   -> T / F
  * numerics  -> decimal text
  * ustring   -> leading ' then %-escapes for NUL %00, LF %0A, CR %0D,
                 comma %2C, '}' %7D, '%' %25
  * buffer    -> '#' + lowercase hex
  * nested record -> s{...}; vector -> v{...}; map -> m{...}
    (map entries flatten to k,v,k,v — each write emits
    comma-unless-first, CsvRecordOutput.java:41-46)

Neither format is splittable (no sync markers — unlike SequenceFile),
so the file is the parallelism unit: the writers emit one file per
partition and the readers schedule one task per file, exactly the
reference's FileInputFormat-with-isSplitable=false contract.  These
are interop boundaries, not hot paths — native tables are parquet.

Record I/O has no null: every field of every record is always written
(the generated classes hold primitives/empty collections).  The
encoders therefore REJECT None — callers coalesce first.
"""

from __future__ import annotations

import os
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# zero-compressed vint/vlong (io/WritableUtils.java:261-309)
# --------------------------------------------------------------------------


def write_vlong(buf: bytearray, i: int) -> None:
    """Append the zero-compressed encoding of ``i`` (64-bit signed)."""
    if -112 <= i <= 127:
        buf.append(i & 0xFF)
        return
    ln = -112
    if i < 0:
        i ^= -1  # one's complement -> non-negative payload
        ln = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        ln -= 1
    buf.append(ln & 0xFF)
    n = -(ln + 120) if ln < -120 else -(ln + 112)
    for idx in range(n, 0, -1):
        buf.append((i >> ((idx - 1) * 8)) & 0xFF)


def read_vlong(b, pos: int) -> tuple[int, int]:
    """Decode a zero-compressed long at ``b[pos:]`` -> (value, new_pos)."""
    first = b[pos]
    pos += 1
    if first > 127:
        first -= 256
    if first >= -112:
        return first, pos
    neg = first <= -121
    n = -(first + 120) if neg else -(first + 112)
    i = 0
    for _ in range(n):
        i = (i << 8) | b[pos]
        pos += 1
    return ((i ^ -1) if neg else i), pos


# --------------------------------------------------------------------------
# binary record codec (schema-driven walk)
# --------------------------------------------------------------------------


def _bin_encode(val: Any, dtype: T.DataType, buf: bytearray) -> None:
    if val is None:
        raise ValueError(
            "Record I/O has no null representation; coalesce before encoding"
        )
    if isinstance(dtype, T.ByteType):
        buf.append(val & 0xFF)
    elif isinstance(dtype, T.BooleanType):
        buf.append(1 if val else 0)
    elif isinstance(dtype, (T.IntegerType, T.LongType)):
        write_vlong(buf, int(val))
    elif isinstance(dtype, T.FloatType):
        buf += struct.pack(">f", val)
    elif isinstance(dtype, T.DoubleType):
        buf += struct.pack(">d", val)
    elif isinstance(dtype, T.StringType):
        raw = val.encode("utf-8")
        write_vlong(buf, len(raw))
        buf += raw
    elif isinstance(dtype, T.BinaryType):
        raw = bytes(val)
        write_vlong(buf, len(raw))
        buf += raw
    elif isinstance(dtype, T.ArrayType):
        write_vlong(buf, len(val))
        for x in val:
            _bin_encode(x, dtype.elementType, buf)
    elif isinstance(dtype, T.MapType):
        items = sorted(val.items())  # TreeMap order
        write_vlong(buf, len(items))
        for k, v in items:
            _bin_encode(k, dtype.keyType, buf)
            _bin_encode(v, dtype.valueType, buf)
    elif isinstance(dtype, T.StructType):
        for f, x in zip(dtype.fields, val):
            _bin_encode(x, f.dataType, buf)
    else:
        raise TypeError(f"unsupported Record I/O type: {dtype}")


def _bin_decode(b, pos: int, dtype: T.DataType) -> tuple[Any, int]:
    if isinstance(dtype, T.ByteType):
        v = b[pos]
        return (v - 256 if v > 127 else v), pos + 1
    if isinstance(dtype, T.BooleanType):
        return b[pos] != 0, pos + 1
    if isinstance(dtype, (T.IntegerType, T.LongType)):
        return read_vlong(b, pos)
    if isinstance(dtype, T.FloatType):
        return struct.unpack_from(">f", b, pos)[0], pos + 4
    if isinstance(dtype, T.DoubleType):
        return struct.unpack_from(">d", b, pos)[0], pos + 8
    if isinstance(dtype, T.StringType):
        n, pos = read_vlong(b, pos)
        return bytes(b[pos : pos + n]).decode("utf-8"), pos + n
    if isinstance(dtype, T.BinaryType):
        n, pos = read_vlong(b, pos)
        return bytes(b[pos : pos + n]), pos + n
    if isinstance(dtype, T.ArrayType):
        n, pos = read_vlong(b, pos)
        out = []
        for _ in range(n):
            x, pos = _bin_decode(b, pos, dtype.elementType)
            out.append(x)
        return out, pos
    if isinstance(dtype, T.MapType):
        n, pos = read_vlong(b, pos)
        d = {}
        for _ in range(n):
            k, pos = _bin_decode(b, pos, dtype.keyType)
            v, pos = _bin_decode(b, pos, dtype.valueType)
            d[k] = v
        return d, pos
    if isinstance(dtype, T.StructType):
        row = []
        for f in dtype.fields:
            x, pos = _bin_decode(b, pos, f.dataType)
            row.append(x)
        return tuple(row), pos
    raise TypeError(f"unsupported Record I/O type: {dtype}")


def encode_record_binary(row, schema: T.StructType) -> bytes:
    """One record -> its BinaryRecordOutput byte string."""
    buf = bytearray()
    _bin_encode(tuple(row), schema, buf)
    return bytes(buf)


def decode_records_binary(blob: bytes, schema: T.StructType) -> Iterator[tuple]:
    """A file's byte stream -> records (concatenated, schema-framed)."""
    pos, n = 0, len(blob)
    mv = memoryview(blob)
    while pos < n:
        row, pos = _bin_decode(mv, pos, schema)
        yield row


# --------------------------------------------------------------------------
# CSV record codec
# --------------------------------------------------------------------------

_CSV_ESC = {
    "\0": "%00",
    "\n": "%0A",
    "\r": "%0D",
    ",": "%2C",
    "}": "%7D",
    "%": "%25",
}
_CSV_UNESC = {v[1:]: k for k, v in _CSV_ESC.items()}


def csv_escape(s: str) -> str:
    """Utils.toCSVString minus the leading quote (added by the caller)."""
    return "".join(_CSV_ESC.get(c, c) for c in s)


def csv_unescape(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            code = s[i + 1 : i + 3]
            if code not in _CSV_UNESC:
                raise ValueError(f"bad CSV escape %{code}")
            out.append(_CSV_UNESC[code])
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _csv_encode(val: Any, dtype: T.DataType, parts: list[str]) -> None:
    if val is None:
        raise ValueError(
            "Record I/O has no null representation; coalesce before encoding"
        )
    if isinstance(dtype, T.BooleanType):
        parts.append("T" if val else "F")
    elif isinstance(dtype, (T.ByteType, T.IntegerType, T.LongType)):
        parts.append(str(int(val)))
    elif isinstance(dtype, (T.FloatType, T.DoubleType)):
        parts.append(repr(float(val)))
    elif isinstance(dtype, T.StringType):
        parts.append("'" + csv_escape(val))
    elif isinstance(dtype, T.BinaryType):
        parts.append("#" + bytes(val).hex())
    elif isinstance(dtype, T.ArrayType):
        inner: list[str] = []
        for x in val:
            _csv_encode(x, dtype.elementType, inner)
        parts.append("v{" + ",".join(inner) + "}")
    elif isinstance(dtype, T.MapType):
        inner = []
        for k, v in sorted(val.items()):
            _csv_encode(k, dtype.keyType, inner)
            _csv_encode(v, dtype.valueType, inner)
        parts.append("m{" + ",".join(inner) + "}")
    elif isinstance(dtype, T.StructType):
        inner = []
        for f, x in zip(dtype.fields, val):
            _csv_encode(x, f.dataType, inner)
        parts.append("s{" + ",".join(inner) + "}")
    else:
        raise TypeError(f"unsupported Record I/O type: {dtype}")


def encode_record_csv(row, schema: T.StructType) -> str:
    """One record -> its CsvRecordOutput line (top-level record is
    unwrapped: startRecord with an empty tag writes no s{},
    CsvRecordOutput.java:101-106)."""
    parts: list[str] = []
    for f, x in zip(schema.fields, tuple(row)):
        _csv_encode(x, f.dataType, parts)
    return ",".join(parts)


def _csv_scalar_end(line: str, pos: int) -> int:
    """End of a scalar token: next ',' or '}' or end-of-line (escapes
    make both safe inside strings)."""
    n = len(line)
    while pos < n and line[pos] not in ",}":
        pos += 1
    return pos


def _csv_decode(line: str, pos: int, dtype: T.DataType) -> tuple[Any, int]:
    if isinstance(dtype, T.BooleanType):
        c = line[pos]
        if c not in "TF":
            raise ValueError(f"bad CSV boolean at {pos}")
        return c == "T", pos + 1
    if isinstance(dtype, (T.ByteType, T.IntegerType, T.LongType)):
        end = _csv_scalar_end(line, pos)
        return int(line[pos:end]), end
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        end = _csv_scalar_end(line, pos)
        return float(line[pos:end]), end
    if isinstance(dtype, T.StringType):
        if line[pos] != "'":
            raise ValueError(f"CSV string must start with ' at {pos}")
        end = _csv_scalar_end(line, pos)
        return csv_unescape(line[pos + 1 : end]), end
    if isinstance(dtype, T.BinaryType):
        if line[pos] != "#":
            raise ValueError(f"CSV buffer must start with # at {pos}")
        end = _csv_scalar_end(line, pos)
        return bytes.fromhex(line[pos + 1 : end]), end
    if isinstance(dtype, (T.ArrayType, T.MapType, T.StructType)):
        marker = {T.ArrayType: "v{", T.MapType: "m{", T.StructType: "s{"}[
            type(dtype)
        ]
        if line[pos : pos + 2] != marker:
            raise ValueError(f"expected {marker} at {pos}")
        pos += 2
        if isinstance(dtype, T.ArrayType):
            out: Any = []
            while line[pos] != "}":
                x, pos = _csv_decode(line, pos, dtype.elementType)
                if line[pos] == ",":
                    pos += 1
                out.append(x)
        elif isinstance(dtype, T.MapType):
            out = {}
            while line[pos] != "}":
                k, pos = _csv_decode(line, pos, dtype.keyType)
                pos += 1  # comma between key and value
                v, pos = _csv_decode(line, pos, dtype.valueType)
                if line[pos] == ",":
                    pos += 1
                out[k] = v
        else:
            row = []
            for i, f in enumerate(dtype.fields):
                x, pos = _csv_decode(line, pos, f.dataType)
                if i < len(dtype.fields) - 1:
                    pos += 1  # comma
                row.append(x)
            out = tuple(row)
        return out, pos + 1  # closing }
    raise TypeError(f"unsupported Record I/O type: {dtype}")


def decode_record_csv(line: str, schema: T.StructType) -> tuple:
    row = []
    pos = 0
    for i, f in enumerate(schema.fields):
        x, pos = _csv_decode(line, pos, f.dataType)
        if i < len(schema.fields) - 1:
            if pos >= len(line) or line[pos] != ",":
                raise ValueError(f"expected ',' at {pos} in {line[:60]!r}")
            pos += 1
        row.append(x)
    if pos != len(line):
        raise ValueError(f"trailing data at {pos} in {line[:60]!r}")
    return tuple(row)


# --------------------------------------------------------------------------
# Spark-side readers / writers
# --------------------------------------------------------------------------


def write_record_binary(df: DataFrame, path: str, schema: T.StructType) -> int:
    """Encode ``df`` (whose schema must match ``schema``) to one
    binary-record file per partition under ``path``.

    Executors write part files directly (local mode: same FS; a real
    cluster points ``path`` at the shared mount — this is the custom-
    OutputFormat pattern, the file count = partition count is the
    reader's parallelism).  Returns the record count (the action that
    forces the write)."""
    os.makedirs(path, exist_ok=True)

    def _write_part(idx: int, rows) -> Iterator[int]:
        buf = bytearray()
        n = 0
        for r in rows:
            _bin_encode(tuple(r), schema, buf)
            n += 1
        if n:
            with open(os.path.join(path, f"part-{idx:05d}.rec"), "wb") as fh:
                fh.write(bytes(buf))
        yield n

    return sum(df.rdd.mapPartitionsWithIndex(_write_part).collect())


def read_record_binary(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    skip_corrupt: bool = False,
) -> DataFrame:
    """Binary-record files -> DataFrame[schema].  One task per file
    (the format has no sync markers, so files are the split unit —
    same contract as the reference's isSplitable=false readers).

    ``skip_corrupt=True`` drops an undecodable file WHOLE and keeps
    reading (the file is the failure unit, matching parquet's
    ``ignoreCorruptFiles`` and the spirit of SkipBadRecords,
    mapred/SkipBadRecords.java:31 — a torn write loses one part file,
    not the job); all-or-nothing per file, so a truncated tail never
    yields a partial prefix of its records.  Default is fail-loud with
    the file named."""

    def _decode(kv):
        fname, blob = kv
        try:
            rows = list(decode_records_binary(blob, schema))
        except Exception as e:
            if skip_corrupt:
                return
            raise ValueError(f"corrupt record-I/O file {fname}") from e
        yield from rows

    rdd = spark.sparkContext.binaryFiles(path).flatMap(_decode)
    return spark.createDataFrame(rdd, schema)


def write_record_csv(df: DataFrame, path: str, schema: T.StructType) -> None:
    """Encode ``df`` to CSV-record text files (one record per line —
    newlines inside strings are %0A-escaped, so line framing holds).
    Text files ARE line-splittable, so this side keeps Spark's normal
    split planning."""
    df.rdd.map(lambda r: encode_record_csv(r, schema)).saveAsTextFile(path)


def read_record_csv(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """CSV-record text files -> DataFrame[schema]."""
    rdd = (
        spark.read.text(path)
        .rdd.map(lambda r: decode_record_csv(r.value, schema))
    )
    return spark.createDataFrame(rdd, schema)
