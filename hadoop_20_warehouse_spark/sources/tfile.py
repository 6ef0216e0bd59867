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
