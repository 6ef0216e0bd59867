"""Pure-Python TFile/BCFile interop reader (classpath-free).

TFile (reference ``src/core/org/apache/hadoop/io/file/tfile/
TFile.java:128``) is the reference warehouse's indexed sorted
key-value container — BCFile block storage underneath, a key/value
record stream inside each data block.  SURVEY.md maps the FORMAT's
role to Parquet (its columnar successor); this module is the
legacy-READ surface so a user arriving with TFile data can land it,
following the same pure-Python container-parser pattern as
``sources/seqfile.py`` (parse raw bytes inside mapInPandas — no Hadoop
classpath needed on the executors).

Byte layout implemented (derived from the reference sources; numbers
are file:line of the layout's definition, not copied code):

- **BCFile tail** (BCFile.java:620-631): the last 28 bytes are
  [BE int64 offset-of-meta-index][version major/minor BE int16s]
  [16-byte magic d1 11 d3 68 ...].
- **Meta index** (BCFile.java:758-845): vint entry count, then per
  entry: string "data:<name>", string compression-name, and a block
  region (vlong offset, vlong compressed size, vlong raw size).
- **Data index** — meta block "BCFile.index" (BCFile.java:850-890):
  string default-compression, vint count, block regions of the DATA
  blocks.
- **TFile meta** — meta block "TFile.meta" (TFile.java:2030-2092):
  version, vlong record count, string comparator ("" unsorted,
  "memcmp", or "jclass: ...").
- **Records** inside each data block (TFile.java:445 key path;
  Chunk.java:102-108,253-266 value path): vint key length + key
  bytes, then value CHUNKS — each chunk a vint length whose SIGN is
  the continuation bit (negative = more chunks follow, non-negative =
  final chunk).
- **Vint/vlong** (tfile/Utils.java:91-237): TFile's own
  variable-length coding (NOT WritableUtils): first byte ≥ -32 is the
  value; [-72,-33] → 2-byte; [-104,-73] → 3-byte; [-120,-105] →
  4-byte; -125..-121 → explicit 4..8-byte big-endian payload.
- **Compression**: "none" = raw; "gz" = DefaultCodec zlib-framed
  deflate (Compression.java:233-258) — stdlib ``zlib`` decodes it.
  "lzo" is rejected with a clear error (no public pure-Python
  decoder).

Tests write REAL TFiles through the JVM writer class that ships inside
Spark's bundled hadoop-common (py4j), so the reader is pinned against
the reference implementation's actual bytes — multi-block, gz and
none, sorted and unsorted, multi-chunk values.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BinaryType, StructField, StructType

_BCFILE_MAGIC = bytes(
    [0xD1, 0x11, 0xD3, 0x68, 0x91, 0xB5, 0xD7, 0xB6,
     0x39, 0xDF, 0x41, 0x40, 0x92, 0xBA, 0xE1, 0x50]
)


def read_vlong(b: bytes, pos: int) -> tuple[int, int]:
    """TFile Utils.readVLong (tfile/Utils.java:195-237)."""
    fb = struct.unpack_from(">b", b, pos)[0]
    pos += 1
    if fb >= -32:
        return fb, pos
    if fb >= -72:  # 2-byte
        return ((fb + 52) << 8) | b[pos], pos + 1
    if fb >= -104:  # 3-byte
        return ((fb + 88) << 16) | struct.unpack_from(">H", b, pos)[0], pos + 2
    if fb >= -120:  # 4-byte short form
        hi = struct.unpack_from(">H", b, pos)[0]
        return ((fb + 112) << 24) | (hi << 8) | b[pos + 2], pos + 3
    n = fb + 129  # explicit-length forms: -125..-121 → 4..8 payload bytes
    if n == 4:
        return struct.unpack_from(">i", b, pos)[0], pos + 4
    if n == 5:
        v = struct.unpack_from(">i", b, pos)[0]
        return (v << 8) | b[pos + 4], pos + 5
    if n == 6:
        v = struct.unpack_from(">i", b, pos)[0]
        return (v << 16) | struct.unpack_from(">H", b, pos + 4)[0], pos + 6
    if n == 7:
        v = struct.unpack_from(">i", b, pos)[0]
        mid = struct.unpack_from(">H", b, pos + 4)[0]
        return (v << 24) | (mid << 8) | b[pos + 6], pos + 7
    if n == 8:
        return struct.unpack_from(">q", b, pos)[0], pos + 8
    raise ValueError(f"corrupted TFile vlong leading byte {fb}")


def _read_string(b: bytes, pos: int) -> tuple[str | None, int]:
    """Utils.readString: vint byte length (-1 = null) + UTF-8."""
    n, pos = read_vlong(b, pos)
    if n == -1:
        return None, pos
    return b[pos : pos + n].decode("utf-8"), pos + n


def _read_region(b: bytes, pos: int) -> tuple[tuple[int, int, int], int]:
    off, pos = read_vlong(b, pos)
    csize, pos = read_vlong(b, pos)
    rsize, pos = read_vlong(b, pos)
    return (off, csize, rsize), pos


def _inflate(blob: bytes, region: tuple[int, int, int], algo: str) -> bytes:
    off, csize, rsize = region
    raw = blob[off : off + csize]
    if algo == "none":
        out = raw
    elif algo == "gz":
        # DefaultCodec = zlib-framed deflate (Compression.java:233)
        out = zlib.decompress(raw)
    else:
        raise ValueError(
            f"TFile block compression '{algo}' unsupported by the "
            f"pure-Python parser (none/gz implemented; lzo has no "
            f"public stdlib decoder)"
        )
    if len(out) != rsize:
        raise ValueError(
            f"TFile block inflated to {len(out)} bytes, index says {rsize}"
        )
    return out


def parse_tfile(blob: bytes):
    """Parse one TFile: returns ``(meta, iter[(key_bytes, value_bytes)])``
    where ``meta`` = {"record_count", "comparator", "compression",
    "n_blocks"}."""
    if len(blob) < 28 or blob[-16:] != _BCFILE_MAGIC:
        raise ValueError("not a BCFile/TFile (bad trailing magic)")
    offset_meta_index = struct.unpack_from(">q", blob, len(blob) - 28)[0]
    major, minor = struct.unpack_from(">hh", blob, len(blob) - 20)
    if major != 1:
        raise ValueError(f"unsupported BCFile version {major}.{minor}")
    # meta index
    pos = offset_meta_index
    count, pos = read_vlong(blob, pos)
    metas: dict[str, tuple[str, tuple[int, int, int]]] = {}
    for _ in range(count):
        full, pos = _read_string(blob, pos)
        if not full or not full.startswith("data:"):
            raise ValueError("corrupted BCFile meta index")
        algo, pos = _read_string(blob, pos)
        region, pos = _read_region(blob, pos)
        metas[full[5:]] = (algo, region)

    def meta_block(name: str) -> bytes:
        if name not in metas:
            raise ValueError(f"TFile missing required meta block {name!r}")
        algo, region = metas[name]
        return _inflate(blob, region, algo)

    # data index: default compression + data block regions
    di = meta_block("BCFile.index")
    p = 0
    default_algo, p = _read_string(di, p)
    n_blocks, p = read_vlong(di, p)
    regions = []
    for _ in range(n_blocks):
        region, p = _read_region(di, p)
        regions.append(region)
    # TFile meta: version, record count, comparator
    tm = meta_block("TFile.meta")
    p = 4  # TFile API version (major, minor int16s)
    record_count, p = read_vlong(tm, p)
    comparator, p = _read_string(tm, p)
    meta = {
        "record_count": record_count,
        "comparator": comparator or "",
        "compression": default_algo,
        "n_blocks": n_blocks,
    }

    def records():
        seen = 0
        for region in regions:
            data = _inflate(blob, region, default_algo)
            q = 0
            while q < len(data):
                klen, q = read_vlong(data, q)
                key = data[q : q + klen]
                q += klen
                chunks = []
                while True:
                    clen, q = read_vlong(data, q)
                    last = clen >= 0
                    clen = abs(clen)
                    chunks.append(data[q : q + clen])
                    q += clen
                    if last:
                        break
                seen += 1
                yield key, b"".join(chunks)
        if seen != record_count:
            raise ValueError(
                f"TFile record count mismatch: scanned {seen}, "
                f"TFile.meta says {record_count}"
            )

    return meta, records()


def read_tfile(spark: SparkSession, path: str) -> DataFrame:
    """(key binary, value binary) — every record of every TFile under
    ``path``, parsed classpath-free inside mapInPandas (binaryFile
    scan; one task per file, the format's own parallelism contract —
    like its SequenceFile sibling, migrate to parquet for splits)."""
    schema = StructType(
        [StructField("key", BinaryType()), StructField("value", BinaryType())]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            keys, vals = [], []
            for blob in pdf["content"]:
                _, recs = parse_tfile(bytes(blob))
                for k, v in recs:
                    keys.append(k)
                    vals.append(v)
            yield pd.DataFrame({"key": keys, "value": vals})

    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInPandas(gen, schema=schema)


def write_tfile_jvm(
    spark: SparkSession,
    path: str,
    pairs: list[tuple[bytes, bytes]],
    compression: str = "none",
    comparator: str = "memcmp",
    min_block_size: int = 1024,
) -> None:
    """Write a REAL TFile through the JVM writer bundled in Spark's
    hadoop-common (py4j) — the test/fixture path that pins the Python
    parser against reference-written bytes.  ``pairs`` must be
    pre-sorted when ``comparator='memcmp'``; pass ``comparator=''``
    for an unsorted file."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    out = fs.create(jpath, True)
    writer = jvm.org.apache.hadoop.io.file.tfile.TFile.Writer(
        out, min_block_size, compression, comparator or None, conf
    )
    try:
        for k, v in pairs:
            writer.append(bytearray(k), bytearray(v))
    finally:
        writer.close()
        out.close()


# --- pure-Python writer (distributed; the read symmetry) --------------------


def encode_vlong(n: int) -> bytes:
    """TFile's variable-length integer ENCODER — the exact inverse of
    :func:`read_vlong` (tfile/Utils.java:91-155 writeVLong: one byte
    for [-32,128), then 2/3/4-byte forms keyed by shifted first-byte
    bands, then explicit-length -125..-121 big-endian forms)."""
    if -32 <= n < 128:
        return struct.pack(">b", n)
    un = ~n if n < 0 else n
    length = un.bit_length() // 8 + 1
    first = n >> ((length - 1) * 8)
    if length == 1:
        first >>= 8
    if length <= 2:
        if -20 <= first < 20:
            return struct.pack(">bB", first - 52, n & 0xFF)
        first >>= 8
    if length <= 3:
        if -16 <= first < 16:
            return struct.pack(">bH", first - 88, n & 0xFFFF)
        first >>= 8
    if length <= 4:
        if -8 <= first < 8:
            return struct.pack(
                ">bHB", first - 112, (n >> 8) & 0xFFFF, n & 0xFF
            )
        return struct.pack(">bI", 4 - 129, n & 0xFFFFFFFF)
    if length == 5:
        return struct.pack(">bIB", 5 - 129, (n >> 8) & 0xFFFFFFFF, n & 0xFF)
    if length == 6:
        return struct.pack(
            ">bIH", 6 - 129, (n >> 16) & 0xFFFFFFFF, n & 0xFFFF
        )
    if length == 7:
        return struct.pack(
            ">bIHB", 7 - 129, (n >> 24) & 0xFFFFFFFF,
            (n >> 8) & 0xFFFF, n & 0xFF,
        )
    return struct.pack(">bq", 8 - 129, n)


def _enc_string(s: str | None) -> bytes:
    # tfile/Utils.java:246 writeString: vint byte-length + UTF-8
    if s is None:
        return encode_vlong(-1)
    b = s.encode("utf-8")
    return encode_vlong(len(b)) + b


def _enc_region(offset: int, csize: int, rsize: int) -> bytes:
    return encode_vlong(offset) + encode_vlong(csize) + encode_vlong(rsize)


def encode_tfile(
    pairs,
    compression: str = "gz",
    comparator: str = "memcmp",
    min_block_size: int = 256 * 1024,
) -> bytes:
    """Key/value pairs → one complete TFile, byte-compatible with the
    JVM reader (assembly order per TFile.Writer.close +
    BCFile.Writer.close: head magic, compressed data blocks, meta
    blocks TFile.meta/TFile.index/BCFile.index, meta index, 28-byte
    tail).  ``pairs`` must be non-descending bytewise when
    ``comparator='memcmp'`` (TFile.java:452-457's append check);
    values are written as single final chunks (Chunk.java:204's
    terminal non-negative length — multi-chunk is a writer streaming
    optimization, not a format requirement)."""
    if compression == "gz":
        deflate = zlib.compress
    elif compression == "none":
        def deflate(b):
            return b
    else:
        raise ValueError(
            f"unsupported TFile compression {compression!r} "
            "('gz' and 'none' are)"
        )

    out = bytearray(_BCFILE_MAGIC)  # head magic (BCFile.java:296)
    regions: list[tuple[int, int, int]] = []
    index_entries: list[tuple[bytes, int]] = []  # (last key, n records)
    first_key: bytes | None = None
    record_count = 0

    cur = bytearray()
    cur_n = 0
    last_key: bytes | None = None

    def flush_block():
        nonlocal cur, cur_n
        if cur_n == 0:
            return
        comp = deflate(bytes(cur))
        regions.append((len(out), len(comp), len(cur)))
        index_entries.append((last_key, cur_n))
        out.extend(comp)
        cur = bytearray()
        cur_n = 0

    prev_key: bytes | None = None
    for k, v in pairs:
        k, v = bytes(k), bytes(v)
        if comparator == "memcmp" and prev_key is not None and k < prev_key:
            raise ValueError(
                "keys are not added in sorted order (memcmp TFile)"
            )
        prev_key = k
        if first_key is None:
            first_key = k
        cur += encode_vlong(len(k)) + k + encode_vlong(len(v)) + v
        cur_n += 1
        last_key = k
        record_count += 1
        if len(cur) >= min_block_size:
            flush_block()
    flush_block()

    def meta_block(name: str, payload: bytes, algo: str):
        comp = payload if algo == "none" else deflate(payload)
        region = (len(out), len(comp), len(payload))
        out.extend(comp)
        return name, algo, region

    default_algo = compression
    metas = []
    # TFile.meta: API version + vlong record count + comparator string
    # — always uncompressed (TFile.java:312-315 COMPRESSION_NONE)
    tm = struct.pack(">hh", 1, 0) + encode_vlong(record_count) + _enc_string(
        comparator or ""
    )
    metas.append(meta_block("TFile.meta", tm, "none"))
    # TFile.index: framed first-key entry, then per-block framed
    # (last key, record count) entries (TFile.java:2259-2278)
    ti = bytearray()
    if first_key is None:
        ti += encode_vlong(0)
    else:
        fk = encode_vlong(len(first_key)) + first_key
        ti += encode_vlong(len(fk)) + fk
        for lk, n in index_entries:
            e = encode_vlong(len(lk)) + lk + encode_vlong(n)
            ti += encode_vlong(len(e)) + e
    metas.append(meta_block("TFile.index", bytes(ti), default_algo))
    # BCFile.index: default compression + data block regions
    di = _enc_string(default_algo) + encode_vlong(len(regions))
    for r in regions:
        di += _enc_region(*r)
    metas.append(meta_block("BCFile.index", bytes(di), default_algo))

    # meta index (TreeMap order = sorted by name), then the tail
    offset_meta_index = len(out)
    out += encode_vlong(len(metas))
    for name, algo, region in sorted(metas):
        out += _enc_string("data:" + name)
        out += _enc_string(algo)
        out += _enc_region(*region)
    out += struct.pack(">q", offset_meta_index)
    out += struct.pack(">hh", 1, 0)
    out += _BCFILE_MAGIC
    return bytes(out)


def write_tfile(
    df: DataFrame,
    path: str,
    compression: str = "gz",
    comparator: str = "memcmp",
    min_block_size: int = 256 * 1024,
) -> int:
    """DataFrame[key binary, value binary] → one TFile per partition
    under ``path`` (the sources/avro.py per-partition writer mold —
    executors each encode their own file; nothing but the row count
    crosses the driver).  With ``comparator='memcmp'`` each partition
    is sorted bytewise first (Spark's binary ordering IS memcmp), so
    a range-partitioned frame yields the sorted-shards layout a
    MapFile-style consumer expects.  Replaces the driver-local py4j
    loop for data-scale writes; :func:`write_tfile_jvm` remains the
    fixture path that pins parser parity against JVM bytes."""
    import os as _os

    if len(df.columns) != 2:
        raise ValueError("write_tfile expects exactly (key, value) columns")
    _os.makedirs(path, exist_ok=True)
    kcol, vcol = df.columns
    if comparator == "memcmp":
        df = df.sortWithinPartitions(kcol)

    def _write_part(idx: int, rows):
        n = [0]

        def gen():
            for r in rows:
                n[0] += 1
                yield r[0], r[1]

        blob = encode_tfile(
            gen(), compression=compression, comparator=comparator,
            min_block_size=min_block_size,
        )
        with open(
            _os.path.join(path, f"part-{idx:05d}.tfile"), "wb"
        ) as fh:
            fh.write(blob)
        yield n[0]

    return sum(
        df.select(kcol, vcol)
        .rdd.mapPartitionsWithIndex(_write_part)
        .collect()
    )
