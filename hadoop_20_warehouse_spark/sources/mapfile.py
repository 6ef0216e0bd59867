"""Real-format MapFile interop — classpath-free read + point lookup.

A MapFile (reference ``src/core/org/apache/hadoop/io/MapFile.java:33``)
is a directory of two SequenceFiles: ``data`` (records sorted by key)
and ``index`` ((key, LongWritable byte-position) for every
``io.map.index.interval``-th record — positions taken BEFORE the
append, so they may land exactly on a sync escape, which the record
loop handles).  ``Reader.get`` binary-searches the loaded index, seeks
``data`` to the chosen position, and scans forward at most one
interval (``MapFile.java:403-445 seekInternal``).

This module re-derives that contract classpath-free on top of
``sources/seqfile.py``'s container parser (the repo's parquet analog
``sources/io.write_sorted_table`` remains the native 100 TB path —
this is the legacy-READ surface so a user arriving with real MapFile
directories can land or serve them):

- ``read_mapfile(spark, dir)`` — full typed scan of ``data`` files,
  one task per MapFile directory (the format's own parallelism).
- ``mapfile_get(dir, key)`` — point lookup with BOUNDED I/O: the
  driver reads the (small) index, bisects, then reads only
  ``[position, position + max_scan_bytes)`` of ``data`` — never the
  whole file.  Uncompressed, record- and block-compressed data files
  all work (positions are block-aligned in block mode, the writer's
  own discipline).
- ``write_mapfile_jvm`` — fixture writer through the real JVM
  ``MapFile.Writer`` (py4j), pinning the parser against
  reference-written bytes, tiny ``index.interval`` included.

Wire numbers cited are the layout's definition, not copied code.
"""

from __future__ import annotations

import bisect
import os
import struct

from pyspark.sql import DataFrame, SparkSession

from hadoop_20_warehouse_spark.sources.seqfile import (
    WRITABLE_DECODERS,
    _inflater_for,
    parse_sequence_file,
)

_HEADER_PROBE = 64 * 1024  # plenty for class names + metadata pairs


def _header_info(blob_prefix: bytes) -> dict:
    """Header fields needed for range iteration (sync, codec,
    layout), via the shared container parser on a prefix."""
    # the parser reads only the prefix for header fields; the records
    # iterator is never consumed
    version = blob_prefix[3]
    pos = 4
    from hadoop_20_warehouse_spark.sources.seqfile import (
        _read_text_string,
        _read_utf8_string,
    )

    rd = _read_utf8_string if version < 4 else _read_text_string
    key_class, pos = rd(blob_prefix, pos)
    value_class, pos = rd(blob_prefix, pos)
    compressed = block_compressed = False
    if version > 2:
        compressed = blob_prefix[pos] != 0
        pos += 1
    if version >= 4:
        block_compressed = blob_prefix[pos] != 0
        pos += 1
    codec = "org.apache.hadoop.io.compress.DefaultCodec"
    if (compressed or block_compressed) and version >= 5:
        codec, pos = _read_text_string(blob_prefix, pos)
    if version >= 6:
        (n_meta,) = struct.unpack_from(">i", blob_prefix, pos)
        pos += 4
        for _ in range(n_meta):
            _, pos = _read_text_string(blob_prefix, pos)
            _, pos = _read_text_string(blob_prefix, pos)
    sync = bytes(blob_prefix[pos : pos + 16]) if version > 1 else b""
    return {
        "key_class": key_class,
        "value_class": value_class,
        "compressed": compressed,
        "block_compressed": block_compressed,
        "inflate": _inflater_for(codec)
        if (compressed or block_compressed)
        else None,
        "sync": sync,
        "data_start": pos + (16 if version > 1 else 0),
    }


def _iter_range(data: bytes, info: dict):
    """Records from a byte RANGE of the data stream beginning at a
    record (or sync/block) boundary — the seekInternal scan loop
    (record framing io/SequenceFile.java:1930; block framing :1659).
    Stops cleanly at a torn tail (the range is a bounded window)."""
    sync, inflate = info["sync"], info["inflate"]
    end = len(data)
    p = 0
    if not info["block_compressed"]:
        while p + 4 <= end:
            (rec_len,) = struct.unpack_from(">i", data, p)
            if rec_len == -1:
                if p + 20 > end:
                    return
                if bytes(data[p + 4 : p + 20]) != sync:
                    raise ValueError("corrupt MapFile data: bad sync")
                p += 20
                continue
            if p + 8 + rec_len > end:
                return  # torn tail of the bounded window
            (key_len,) = struct.unpack_from(">i", data, p + 4)
            key = bytes(data[p + 8 : p + 8 + key_len])
            val = bytes(data[p + 8 + key_len : p + 8 + rec_len])
            p += 8 + rec_len
            yield key, inflate(val) if inflate else val
        return
    from hadoop_20_warehouse_spark.sources.recordio import read_vlong

    while p + 20 <= end:
        (esc,) = struct.unpack_from(">i", data, p)
        if esc != -1 or bytes(data[p + 4 : p + 20]) != sync:
            raise ValueError("corrupt MapFile data: block without sync")
        p += 20
        try:
            n, p = read_vlong(data, p)
            bufs = []
            for _ in range(4):
                clen, p = read_vlong(data, p)
                if p + clen > end:
                    return  # torn block at the window tail
                bufs.append(info["inflate"](bytes(data[p : p + clen])))
                p += clen
        except (IndexError, struct.error):
            return
        key_lens, keys_b, val_lens, vals_b = bufs
        kq = vq = koff = voff = 0
        for _ in range(n):
            klen, kq = read_vlong(key_lens, kq)
            vlen, vq = read_vlong(val_lens, vq)
            yield (
                bytes(keys_b[koff : koff + klen]),
                bytes(vals_b[voff : voff + vlen]),
            )
            koff += klen
            voff += vlen


def _decoder(cls: str):
    try:
        return WRITABLE_DECODERS[cls]
    except KeyError:
        raise ValueError(
            f"no wire decoder for MapFile class {cls!r}"
        ) from None


def read_mapfile_index(map_dir: str) -> tuple[str, list, list]:
    """``index`` SequenceFile → (key_class, decoded keys, positions)
    — small by construction (one row per interval)."""
    with open(os.path.join(map_dir, "index"), "rb") as fh:
        blob = fh.read()
    kc, vc, recs = parse_sequence_file(blob)
    if vc != "org.apache.hadoop.io.LongWritable":
        raise ValueError(
            f"MapFile index values must be LongWritable positions, got {vc}"
        )
    _, dec_k = _decoder(kc)
    keys, positions = [], []
    for kb, vb in recs:
        k, _ = dec_k(kb, 0)
        keys.append(k)
        positions.append(struct.unpack(">q", vb)[0])
    return kc, keys, positions


def mapfile_get(
    map_dir: str,
    key,
    max_scan_bytes: int = 4 * 1024 * 1024,
):
    """``MapFile.Reader.get``: bisect the index, read ONLY the bounded
    data range from the chosen position, scan forward until the key is
    found or passed (keys are sorted, so a larger key ends the scan).
    Returns the decoded value or None."""
    kc, keys, positions = read_mapfile_index(map_dir)
    data_path = os.path.join(map_dir, "data")
    with open(data_path, "rb") as fh:
        head = fh.read(_HEADER_PROBE)
        info = _header_info(head)
        if not keys:
            seek = info["data_start"]
        else:
            # rightmost index entry with key <= target; if the target
            # precedes the first indexed key it can still live in the
            # (unindexed) records before it — start at data_start
            i = bisect.bisect_right(keys, key) - 1
            seek = positions[i] if i >= 0 else info["data_start"]
        fh.seek(seek)
        window = fh.read(max_scan_bytes)
    _, dec_k = _decoder(info["key_class"])
    _, dec_v = _decoder(info["value_class"])
    for kb, vb in _iter_range(window, info):
        k, _ = dec_k(kb, 0)
        if k == key:
            return dec_v(vb, 0)[0]
        if k > key:
            return None
    return None


def read_mapfile(spark: SparkSession, path: str) -> DataFrame:
    """Every record of the MapFile directory (or a glob of
    directories) as a typed (key, value) DataFrame — one task per
    ``data`` file, the format's own parallelism contract."""
    data_glob = os.path.join(path, "data")
    files = spark.read.format("binaryFile").load(data_glob)
    first = bytes(files.select("content").head()["content"])
    kc, vc, _ = parse_sequence_file(first)
    kt, dec_k = _decoder(kc)
    vt, dec_v = _decoder(vc)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            keys, vals = [], []
            for blob in pdf["content"]:
                _, _, recs = parse_sequence_file(bytes(blob))
                for kb, vb in recs:
                    keys.append(dec_k(kb, 0)[0])
                    vals.append(dec_v(vb, 0)[0])
            yield pd.DataFrame({"key": keys, "value": vals})

    return files.select("content").mapInPandas(
        gen, f"key {kt}, value {vt}"
    )


def write_mapfile_jvm(
    spark: SparkSession,
    map_dir: str,
    pairs,
    index_interval: int = 16,
    compress_type: str = "NONE",
) -> None:
    """Fixture writer through the real JVM ``MapFile.Writer`` —
    Text/Text pairs, pre-sorted; small ``index_interval`` so tests get
    a multi-entry index; ``compress_type`` NONE/RECORD/BLOCK."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    conf.setInt("io.map.index.interval", index_interval)
    conf.set("io.seqfile.compression.type", compress_type.upper())
    jpath = jvm.org.apache.hadoop.fs.Path(map_dir)
    fs = jpath.getFileSystem(conf)
    text_cls = jvm.org.apache.hadoop.io.Text().getClass()
    # the (conf, fs, dirName, keyClass, valClass, compressionType)
    # constructor — deprecated in Hadoop 3 but present, and the only
    # form py4j can call without building an Option[] varargs array
    writer = jvm.org.apache.hadoop.io.MapFile.Writer(
        conf, fs, map_dir, text_cls, text_cls,
        getattr(
            jvm.org.apache.hadoop.io.SequenceFile.CompressionType,
            compress_type.upper(),
        ),
    )
    try:
        for k, v in pairs:
            writer.append(
                jvm.org.apache.hadoop.io.Text(k),
                jvm.org.apache.hadoop.io.Text(v),
            )
    finally:
        writer.close()


def mapfile_get_many(
    map_dir: str,
    probe_keys,
    max_scan_bytes: int = 4 * 1024 * 1024,
) -> dict:
    """Batched ``get``: load the index ONCE, group the probes by the
    index position their bisect lands on, and do one bounded data
    read + forward scan per GROUP (sorted probes inside a group
    resolve in a single pass — the ``MapFileOutputFormat.getEntry``
    access pattern amortized).  Returns {key: value} for hits only."""
    kc, keys, positions = read_mapfile_index(map_dir)
    data_path = os.path.join(map_dir, "data")
    out = {}
    with open(data_path, "rb") as fh:
        head = fh.read(_HEADER_PROBE)
        info = _header_info(head)
        _, dec_k = _decoder(info["key_class"])
        _, dec_v = _decoder(info["value_class"])
        groups: dict[int, list] = {}
        for k in probe_keys:
            if keys:
                i = bisect.bisect_right(keys, k) - 1
                seek = positions[i] if i >= 0 else info["data_start"]
            else:
                seek = info["data_start"]
            groups.setdefault(seek, []).append(k)
        for seek, probes in sorted(groups.items()):
            probes = sorted(probes)
            fh.seek(seek)
            window = fh.read(max_scan_bytes)
            pi = 0
            for kb, vb in _iter_range(window, info):
                k, _ = dec_k(kb, 0)
                while pi < len(probes) and probes[pi] < k:
                    pi += 1  # absent probe: passed without a match
                if pi >= len(probes):
                    break
                if probes[pi] == k:
                    out[k] = dec_v(vb, 0)[0]
                    pi += 1
    return out
