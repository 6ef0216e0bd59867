"""I/O roundtrips (text, kv-text, SequenceFile, partitioned writes) —
tier-2 format-interop tests (FIXTURES.md F6)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from hadoop_20_warehouse_spark.sources.io import (
    read_kv_text,
    read_sequence,
    read_text,
    write_partitioned,
    write_sequence,
    write_text,
)


def test_text_roundtrip(spark, tmp_path):
    path = str(tmp_path / "txt")
    df = spark.createDataFrame([Row(value=f"line{i}") for i in range(100)])
    write_text(df, path)
    back = read_text(spark, path)
    assert sorted(r["value"] for r in back.collect()) == sorted(
        f"line{i}" for i in range(100)
    )


def test_nline_partitioning(spark, tmp_path):
    path = str(tmp_path / "nline")
    write_text(
        spark.createDataFrame([Row(value=f"l{i}") for i in range(100)]), path
    )
    df = read_text(spark, path, n_per_partition=10)
    assert df.rdd.getNumPartitions() == 10


def test_kv_text_first_separator_only(spark, tmp_path):
    path = str(tmp_path / "kv")
    rows = [Row(value="k1\tv1\tv2"), Row(value="k2\tv"), Row(value="nokey")]
    write_text(spark.createDataFrame(rows), path)
    got = {r["key"]: r["value"] for r in read_kv_text(spark, path).collect()}
    assert got == {"k1": "v1\tv2", "k2": "v", "nokey": ""}


def test_sequence_file_roundtrip(spark, tmp_path):
    path = str(tmp_path / "seq")
    df = spark.createDataFrame([Row(key=i, value=f"v{i}") for i in range(50)])
    write_sequence(df, path)
    back = read_sequence(spark, path)
    assert sorted((r["key"], r["value"]) for r in back.collect()) == [
        (i, f"v{i}") for i in range(50)
    ]


def test_partitioned_write_and_pruning(spark, tmp_path):
    path = str(tmp_path / "parted")
    df = spark.createDataFrame(
        [Row(k=("a" if i % 2 else "b"), v=i) for i in range(100)]
    )
    write_partitioned(df, path, ["k"])
    # MultipleOutputs analog: per-key directories exist
    assert os.path.isdir(os.path.join(path, "k=a"))
    assert os.path.isdir(os.path.join(path, "k=b"))
    back = spark.read.parquet(path).filter(F.col("k") == "a")
    # partition pruning: the plan's scan carries a PartitionFilters entry
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert back.count() == 50


def test_sorted_table_point_lookup(spark, tmp_path):
    from hadoop_20_warehouse_spark.sources.io import point_lookup, write_sorted_table

    path = str(tmp_path / "mapfile")
    df = spark.createDataFrame([Row(key=i, value=f"v{i}") for i in range(1000)])
    write_sorted_table(df, path, ["key"], partitions=4)
    hit = point_lookup(spark, path, "key", 437)
    assert [(r["key"], r["value"]) for r in hit.collect()] == [(437, "v437")]
    # pushdown reaches the scan (row-group skipping at scale)
    from hadoop_20_warehouse_spark.plans.explain import pushed_filters

    assert "key" in pushed_filters(hit)


def test_xml_record_reader(spark, tmp_path):
    from hadoop_20_warehouse_spark.sources.io import read_xml_records

    p = tmp_path / "docs.xml"
    p.write_text(
        "<junk/>\n<doc>\n  <title>a</title>\n</doc>\nnoise\n<doc><title>b</title></doc>\n"
    )
    recs = sorted(
        r["record"] for r in read_xml_records(spark, str(tmp_path), "<doc>", "</doc>").collect()
    )
    assert len(recs) == 2
    assert "<doc><title>b</title></doc>" in recs
    assert any("<title>a</title>" in r for r in recs)


def test_skip_bad_records_permissive(spark, tmp_path):
    """SkipBadRecords analog (mapred/SkipBadRecords.java): corrupt
    inputs are skipped, not fatal, when ignoreCorruptFiles is set."""
    good = str(tmp_path / "data")
    df = spark.createDataFrame([Row(a=i) for i in range(10)])
    df.write.parquet(good)
    # drop a corrupt file into the same directory
    with open(f"{good}/part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a real parquet file")
    bad_read = spark.read.parquet(good)
    import pytest as _pytest

    with _pytest.raises(Exception):
        bad_read.count()  # default: corrupt file is fatal
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        assert spark.read.parquet(good).count() == 10
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")


def test_compression_codecs_roundtrip(spark, tmp_path):
    """Codec parity (SURVEY.md §1.4: gzip/bzip2/LZMA in the reference →
    snappy/zstd/gzip here): same data back from every codec."""
    df = spark.createDataFrame([Row(k=i, v=f"value{i}" * 10) for i in range(500)])
    want = sorted((r["k"], r["v"]) for r in df.collect())
    for codec in ("snappy", "gzip", "zstd"):
        path = str(tmp_path / f"c_{codec}")
        df.write.mode("overwrite").option("compression", codec).parquet(path)
        got = sorted(
            (r["k"], r["v"]) for r in spark.read.parquet(path).collect()
        )
        assert got == want, codec


def test_distcp_style_copy(spark, tmp_path):
    """DistCp analog (tools/DistCp.java:76): parallel read→write copy
    preserving schema and content."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.createDataFrame([Row(a=i, b=str(i)) for i in range(1000)])
    df.write.parquet(src)
    spark.read.parquet(src).write.parquet(dst)
    back = spark.read.parquet(dst)
    assert back.schema == spark.read.parquet(src).schema
    assert back.count() == 1000


def test_bloom_table_negative_lookup(spark, tmp_path):
    from hadoop_20_warehouse_spark.sources.io import point_lookup, write_bloom_table

    path = str(tmp_path / "bloom")
    df = spark.createDataFrame([Row(key=i * 2, value=f"v{i}") for i in range(2000)])
    write_bloom_table(df, path, ["key"], ndv=2000, partitions=4)
    # positive lookup returns the row
    hit = point_lookup(spark, path, "key", 1000)
    assert [(r["key"], r["value"]) for r in hit.collect()] == [(1000, "v500")]
    # negative lookup (odd key) returns nothing — bloom/stats skip
    assert point_lookup(spark, path, "key", 1001).count() == 0
    # bloom filter metadata actually landed in the parquet footers
    import pyarrow.parquet as pq

    part = next(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    md = pq.ParquetFile(part).metadata
    col = next(
        md.row_group(0).column(i)
        for i in range(md.num_columns)
        if md.row_group(0).column(i).path_in_schema == "key"
    )
    assert col.is_stats_set  # sorted write → tight min/max stats


def test_compact_small_files(spark, tmp_path):
    from hadoop_20_warehouse_spark.sources.io import compact_small_files

    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    df = spark.createDataFrame([Row(k=i, v=i * i) for i in range(500)])
    df.repartition(32).write.parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src > 16
    compact_small_files(spark, src, dst, target_files=2)
    n_dst = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_dst <= 2
    # content preserved exactly
    a = sorted((r["k"], r["v"]) for r in spark.read.parquet(src).collect())
    b = sorted((r["k"], r["v"]) for r in spark.read.parquet(dst).collect())
    assert a == b


def test_sequence_composite_mapwritable(spark, tmp_path):
    """MapWritable round-trip: a JVM-written SequenceFile of Text ->
    MapWritable (heterogeneous entry values) reads back as a typed map
    column; the dict write path (JavaToWritableConverter -> MapWritable)
    reads back identically."""
    from hadoop_20_warehouse_spark.sources.io import (
        read_sequence_composite,
        write_sequence,
    )

    # write a real MapWritable file with the hadoop API (the shape a
    # reference job would produce, io/MapWritable.java:35)
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(str(tmp_path / "mw.seq"))
    fs = jpath.getFileSystem(conf)
    Text = jvm.org.apache.hadoop.io.Text
    IntWritable = jvm.org.apache.hadoop.io.IntWritable
    MapWritable = jvm.org.apache.hadoop.io.MapWritable
    w = jvm.org.apache.hadoop.io.SequenceFile.createWriter(
        fs, conf, jpath, Text().getClass(), MapWritable().getClass()
    )
    for i in range(3):
        mw = MapWritable()
        mw.put(Text("n"), IntWritable(i))
        mw.put(Text("s"), Text(f"v{i}"))
        w.append(Text(f"k{i}"), mw)
    w.close()

    df = read_sequence_composite(
        spark,
        str(tmp_path / "mw.seq"),
        "key string, value map<string,string>",
        value_cast=str,
    )
    got = {r["key"]: dict(r["value"]) for r in df.collect()}
    assert got == {f"k{i}": {"n": str(i), "s": f"v{i}"} for i in range(3)}

    # dict write path round-trips through MapWritable
    out = str(tmp_path / "mw_rt.seq")
    write_sequence(df, out)
    back = read_sequence_composite(
        spark, out, "key string, value map<string,string>", value_cast=str
    )
    assert {r["key"]: dict(r["value"]) for r in back.collect()} == got


def test_scratch_dir_honors_env_override(tmp_path, monkeypatch):
    """Cluster-honest round-trips: SPARK_GRAFT_SCRATCH points the
    write+read-back scratch at shared storage (HDFS/NFS mount) so
    executors on other nodes can read what the query wrote; default
    stays a driver-local tempdir (correct on local[*])."""
    from hadoop_20_warehouse_spark import inventory_ext as ext

    monkeypatch.setattr(ext, "_SCRATCH_DIRS", {})
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path / "shared"))
    p = ext._scratch_dir("unit")
    # mkdtemp UNDER the shared root (not a deterministic shared path —
    # two processes sharing the env var must not rmtree each other's
    # data at exit; ADVICE r5)
    assert os.path.dirname(p) == str(tmp_path / "shared")
    assert os.path.basename(p).startswith("h20w_unit_")
    assert os.path.isdir(p)
    # per-tag reuse still applies under the override
    assert ext._scratch_dir("unit") == p

    # default (no env): a driver-local tempdir, one per tag
    monkeypatch.setattr(ext, "_SCRATCH_DIRS", {})
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH")
    q = ext._scratch_dir("unit")
    assert "h20w_unit" in os.path.basename(q) and os.path.isdir(q)
    assert not q.startswith(str(tmp_path))


def test_named_outputs_routing_and_schemas(spark, tmp_path):
    """Mirror of reference TestMultipleOutputs (mapred/lib/
    TestMultipleOutputs.java): one stream, N named outputs, each with
    its own routing predicate, projected schema, and format."""
    import pytest as _pytest

    from hadoop_20_warehouse_spark.sources.io import (
        NamedOutput,
        write_named_outputs,
    )

    df = spark.createDataFrame(
        [Row(k=i, status=("A" if i % 3 == 0 else "B"), v=float(i)) for i in range(90)]
    )
    base = str(tmp_path / "named")
    paths = write_named_outputs(
        df,
        base,
        {
            "aonly": NamedOutput(predicate="status = 'A'", select=["k", "v"]),
            "textkv": NamedOutput(
                predicate=F.col("k") < 10,
                select=["k", "status"],
                fmt="csv",
                options={"header": "true"},
            ),
            "bystat": NamedOutput(select=["k", "status"], multi_col="status"),
        },
    )
    # routing: predicate rows only, projected schema only
    aonly = spark.read.parquet(paths["aonly"])
    assert aonly.columns == ["k", "v"]
    assert aonly.count() == 30
    assert aonly.agg(F.min("k")).first()[0] == 0
    textkv = spark.read.option("header", "true").csv(paths["textkv"])
    assert textkv.columns == ["k", "status"]
    assert textkv.count() == 10
    # multi-named: sub-name partition directories (getCollector(name, sub))
    assert os.path.isdir(os.path.join(paths["bystat"], "status=A"))
    assert os.path.isdir(os.path.join(paths["bystat"], "status=B"))
    bystat = spark.read.parquet(paths["bystat"])
    assert bystat.count() == 90
    assert bystat.filter(F.col("status") == "A").count() == 30
    # staged scratch copy must NOT persist next to the real outputs
    assert not os.path.exists(os.path.join(base, "_stage"))
    # stage=False re-plans from the source directly — same results
    base2 = str(tmp_path / "named2")
    paths2 = write_named_outputs(
        df, base2, {"aonly": NamedOutput(predicate="status = 'A'")}, stage=False
    )
    assert spark.read.parquet(paths2["aonly"]).count() == 30
    # name validation: reference checkTokenName rules (ASCII alnum, not 'part')
    for bad in ("", "part", "a_b", "a-b", "é1", "ｅ", "a b"):
        with _pytest.raises(ValueError):
            write_named_outputs(df, base, {bad: NamedOutput()})


def test_lzma_text_roundtrip_both_formats(spark, tmp_path):
    """LzmaCodec compat (reference io/compress/LzmaCodec.java): .lzma
    (alone) and .xz containers round-trip through stdlib lzma."""
    import lzma as _lzma

    from hadoop_20_warehouse_spark.sources.io import (
        read_text_lzma,
        write_text_lzma,
    )

    df = spark.createDataFrame([(f"line-{i}",) for i in range(100)], "value string")
    for fmt, ext in (("alone", "lzma"), ("xz", "xz")):
        path = str(tmp_path / fmt)
        n = write_text_lzma(df.repartition(3), path, fmt=fmt)
        assert n == 100
        parts = [p for p in os.listdir(path) if p.endswith("." + ext)]
        assert len(parts) == 3
        # the bytes really are the advertised container format
        blob = open(os.path.join(path, parts[0]), "rb").read()
        _lzma.decompress(blob)  # raises if not lzma/xz
        back = read_text_lzma(spark, path)
        assert sorted(r["value"] for r in back.collect()) == sorted(
            f"line-{i}" for i in range(100)
        )
    # a non-lzma file fails loudly with the file named
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "junk.lzma").write_bytes(b"not compressed")
    import pytest as _pytest

    with _pytest.raises(Exception, match="not an lzma/xz stream"):
        read_text_lzma(spark, str(bad)).collect()


def test_lzma_line_framing_matches_line_record_reader(spark, tmp_path):
    """read_text_lzma frames records exactly like LineReader.java
    readLine: records end at LF, CR, or CRLF (bare \\r IS a
    terminator — Mac-style legacy text), and do NOT split on
    \\v/\\f/U+2028, which str.splitlines() would."""
    import lzma as _lzma

    from hadoop_20_warehouse_spark.sources.io import read_text_lzma

    content = "a\u2028b\vc\r\nplain\nmac\rstyle\nlast"
    d = tmp_path / "framing"
    d.mkdir()
    (d / "x.xz").write_bytes(_lzma.compress(content.encode("utf-8")))
    got = sorted(r["value"] for r in read_text_lzma(spark, str(d)).collect())
    assert got == sorted(["a\u2028b\vc", "plain", "mac", "style", "last"])


def test_seqfile_first_tab_framing_preserves_tabby_text(spark, tmp_path):
    """pipeline_seqfile_curate's value framing (source '\\t' text, split
    on the FIRST tab — the KeyValueLineRecordReader discipline) must be
    lossless even when the TEXT itself contains tabs, leading/trailing
    whitespace, or is empty."""
    from pyspark.sql import functions as F

    from hadoop_20_warehouse_spark.sources.io import read_sequence, write_sequence

    rows = [
        (1, "web", "plain text"),
        (2, "web", "text\twith\ttabs"),
        (3, "books", "\tleading tab"),
        (4, "code", "trailing tab\t"),
        (5, "wiki", ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kv = docs.select(
        F.col("doc_id").cast("long").alias("key"),
        F.concat_ws("\t", F.col("source"), F.col("text")).alias("value"),
    )
    path = str(tmp_path / "seq")
    write_sequence(kv, path)
    back = read_sequence(spark, path)
    tabpos = F.instr(F.col("value"), "\t")
    parsed = back.select(
        F.col("key").cast("long").alias("doc_id"),
        F.substring_index(F.col("value"), "\t", 1).alias("source"),
        F.col("value").substr(tabpos + 1, F.length("value")).alias("text"),
    )
    got = sorted(map(tuple, parsed.collect()))
    assert got == sorted(rows)


def test_avro_golden_bytes_and_roundtrip():
    """sources/avro: the wire format pinned by a hand-assembled golden
    container (magic, sorted metadata map, zigzag varints, sync
    discipline, one-record null-codec block) plus round-trips across
    codecs, null unions, and multi-block framing."""
    import hashlib
    import json

    from pyspark.sql import types as T

    from hadoop_20_warehouse_spark.sources.avro import (
        decode_avro_file,
        encode_avro_file,
        schema_to_avro_json,
    )

    sj = json.dumps(
        {"type": "record", "name": "Record",
         "fields": [{"name": "id", "type": "long"}]}
    )
    got = encode_avro_file(iter([(1,)]), sj, codec="null", sync_seed=b"g")
    sync = hashlib.md5(b"g" + sj.encode()).digest()
    want = bytearray(b"Obj\x01")
    want += b"\x04"                      # map count 2 (zigzag)
    want += b"\x14avro.codec\x08null"    # len 10, value len 4
    want += bytes([len("avro.schema") * 2]) + b"avro.schema"
    want += bytes([len(sj) * 2]) if len(sj) < 64 else b""
    if len(sj) >= 64:                    # zigzag varint for the length
        u = len(sj) << 1
        while u:
            b = u & 0x7F
            u >>= 7
            want += bytes([b | 0x80] if u else [b])
    want += sj.encode()
    want += b"\x00" + sync               # map end + sync
    want += b"\x02\x02\x02" + sync       # count 1, size 1, zigzag(1)
    assert bytes(got) == bytes(want)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("blob", T.BinaryType(), True),
        ]
    )
    sj2 = schema_to_avro_json(schema)
    rows = [
        (1, "ann", 1.5, True, b"\x00\xff"),
        (-42, None, None, False, None),
        (2 ** 40, "b" * 300, -0.25, True, b""),
    ]
    for codec in ("null", "deflate"):
        assert decode_avro_file(
            encode_avro_file(iter(rows), sj2, codec=codec)
        )[1] == rows
    big = [(i, f"n{i}", i / 8, i % 2 == 0, None) for i in range(5000)]
    blob = encode_avro_file(iter(big), sj2, codec="deflate",
                            block_records=700)
    assert decode_avro_file(blob)[1] == big
    import pytest as _pytest

    torn = bytearray(blob)
    torn[-1] ^= 0xFF
    with _pytest.raises(ValueError, match="sync"):
        decode_avro_file(bytes(torn))
    with _pytest.raises(ValueError, match="not an Avro"):
        decode_avro_file(b"Obj\x02junk")


def test_avro_spark_write_read(spark, tmp_path):
    """write_avro/read_avro: per-partition OCFs, schema from embedded
    metadata, nullable union survives, file count = parallelism."""
    import os

    from pyspark.sql import functions as F

    from hadoop_20_warehouse_spark.sources.avro import read_avro, write_avro

    df = spark.range(0, 500, 1, 4).select(
        F.col("id"),
        F.when(F.col("id") % 7 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("name"),
        (F.col("id") * 3).cast("long").alias("v"),
    )
    path = str(tmp_path / "avro")
    n = write_avro(df, path)
    assert n == 500
    parts = [p for p in os.listdir(path) if p.endswith(".avro")]
    assert len(parts) == 4
    back = read_avro(spark, path)
    assert back.schema == df.schema
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


def test_avro_nested_types_roundtrip(spark, tmp_path):
    """r17 (r16 VERDICT #6): array<T>, map<string,T> and NESTED record
    columns — recursively composable, each optionally nullable —
    survive the wire format; unsupported constructs (enum, non-null
    unions, non-string map keys) raise loudly."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from hadoop_20_warehouse_spark.sources.avro import (
        avro_to_spark_schema,
        read_avro,
        schema_to_avro_json,
        write_avro,
    )

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField(
            "counts", T.MapType(T.StringType(), T.LongType(), True), True
        ),
        T.StructField("meta", T.StructType([
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), False),
            T.StructField("deep", T.ArrayType(T.LongType(), False), True),
        ]), True),
    ])
    rows = [
        Row(id=1, tags=["x", None, "y"], counts={"k": 3, "j": None},
            meta=Row(a=None, b="hi", deep=[1, 2, 3])),
        Row(id=2, tags=[], counts={}, meta=None),
        Row(id=3, tags=None, counts=None, meta=Row(a=9, b="z", deep=None)),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "nested")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert back.schema == schema
    assert avro_to_spark_schema(schema_to_avro_json(schema)) == schema
    got = sorted(
        (r.asDict(recursive=True) for r in back.collect()),
        key=lambda r: r["id"],
    )
    want = sorted(
        (r.asDict(recursive=True) for r in df.collect()),
        key=lambda r: r["id"],
    )
    assert got == want
    with pytest.raises(ValueError, match="string keys"):
        schema_to_avro_json(T.StructType([T.StructField(
            "m", T.MapType(T.LongType(), T.LongType()), True)]))
    with pytest.raises(ValueError, match="unsupported"):
        avro_to_spark_schema(
            '{"type":"record","name":"r","fields":'
            '[{"name":"e","type":{"type":"no-such-type"}}]}'
        )
    with pytest.raises(ValueError, match="union"):
        avro_to_spark_schema(
            '{"type":"record","name":"r","fields":'
            '[{"name":"u","type":["int","string"]}]}'
        )


def test_avro_empty_write_roundtrips(spark, tmp_path):
    """A filtered-to-empty frame writes ONE header-only OCF so the
    read side round-trips an empty result with the right schema
    instead of raising on a fileless directory (r16 ADVICE)."""
    import os

    from pyspark.sql import functions as F

    from hadoop_20_warehouse_spark.sources.avro import read_avro, write_avro

    df = spark.range(0, 100).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    ).filter("id < 0")
    path = str(tmp_path / "empty")
    assert write_avro(df, path) == 0
    files = [p for p in os.listdir(path) if p.endswith(".avro")]
    assert len(files) == 1
    back = read_avro(spark, path)
    assert back.count() == 0
    assert back.schema == df.schema


def test_avro_block_split_read(spark, tmp_path):
    """r17 (r16 VERDICT #6): a single multi-block container file
    splits into >1 task at sync-marker boundaries with zero row loss
    or duplication — for both codecs — and a split size larger than
    the file degenerates to one task with the same rows."""
    import glob
    import os

    from pyspark.sql import functions as F

    from hadoop_20_warehouse_spark.sources.avro import (
        read_avro_split,
        write_avro,
    )

    big = spark.range(0, 20000).select(
        F.col("id"),
        (F.col("id") * 7 % 1000).alias("v"),
        F.concat(F.lit("name_"), F.col("id")).alias("s"),
    )
    want_sum = big.agg(F.sum("id").alias("s")).collect()[0]["s"]
    for codec in ("deflate", "null"):
        path = str(tmp_path / f"big_{codec}")
        write_avro(big.coalesce(1), path, codec=codec, block_records=256)
        f = glob.glob(os.path.join(path, "*.avro"))
        assert len(f) == 1 and os.path.getsize(f[0]) > 64 * 1024
        sp = read_avro_split(spark, path, split_bytes=32 * 1024)
        assert sp.rdd.getNumPartitions() > 1, codec
        assert sp.count() == 20000, codec
        assert sp.agg(F.sum("id").alias("s")).collect()[0]["s"] == want_sum
        one = read_avro_split(spark, path, split_bytes=1 << 30)
        assert one.count() == 20000, codec


def test_avro_enum_and_fixed_foreign_schema():
    """r17: foreign-written files with ``enum`` (read as its symbol
    string, written back by symbol) and ``fixed`` (exactly ``size``
    bytes, no length prefix) round-trip; Spark schema maps them to
    string/binary; out-of-vocabulary symbols and wrong-size fixed
    values raise.  Non-null unions beyond ['null', T] stay gated."""
    import json

    from pyspark.sql import types as T

    from hadoop_20_warehouse_spark.sources.avro import (
        avro_to_spark_schema,
        decode_avro_file,
        encode_avro_file,
    )

    schema = json.dumps({
        "type": "record", "name": "Foreign", "fields": [
            {"name": "id", "type": "long"},
            {"name": "status", "type": {"type": "enum", "name": "St",
                                        "symbols": ["NEW", "OPEN", "DONE"]}},
            {"name": "digest", "type": {"type": "fixed", "name": "Md5",
                                        "size": 4}},
            {"name": "maybe", "type": ["null", {"type": "enum",
                                                "name": "E2",
                                                "symbols": ["A", "B"]}]},
        ],
    })
    rows = [
        (1, "OPEN", b"\x01\x02\x03\x04", "B"),
        (2, "NEW", b"\xff\x00\xff\x00", None),
        (3, "DONE", b"abcd", "A"),
    ]
    for codec in ("null", "deflate"):
        blob = encode_avro_file(iter(rows), schema, codec=codec)
        assert decode_avro_file(blob)[1] == rows, codec
    assert avro_to_spark_schema(schema) == T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("digest", T.BinaryType(), False),
        T.StructField("maybe", T.StringType(), True),
    ])
    with pytest.raises(ValueError, match="enum symbols"):
        encode_avro_file(iter([(1, "BOGUS", b"aaaa", None)]), schema)
    with pytest.raises(ValueError, match="fixed"):
        encode_avro_file(iter([(1, "NEW", b"toolong!", None)]), schema)


def test_avro_nested_record_names_unique_and_null_complex():
    """r17 review fixes: sibling struct paths ('a'.'b' vs 'a_b') get
    UNIQUE Avro record names (foreign readers reject duplicate named
    types), and a null in a non-nullable complex field raises the
    module's field-contextual ValueError, not a bare TypeError."""
    import json

    from pyspark.sql import types as T

    from hadoop_20_warehouse_spark.sources.avro import (
        encode_avro_file,
        schema_to_avro_json,
    )

    st = T.StructType([
        T.StructField("a", T.StructType([
            T.StructField("b", T.StructType([
                T.StructField("x", T.LongType(), False)]), False),
        ]), False),
        T.StructField("a_b", T.StructType([
            T.StructField("y", T.LongType(), False)]), False),
    ])
    sj = json.loads(schema_to_avro_json(st))
    names = []

    def walk(n):
        if isinstance(n, dict):
            if n.get("type") == "record":
                names.append(n["name"])
            for f in n.get("fields", []):
                walk(f["type"])
            for k in ("items", "values"):
                if k in n:
                    walk(n[k])
        elif isinstance(n, list):
            for x in n:
                walk(x)

    walk(sj)
    assert len(names) == len(set(names)), names

    schema = json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "arr", "type": {"type": "array", "items": "long"}}],
    })
    with pytest.raises(ValueError, match="field 'arr'.*non-nullable"):
        encode_avro_file(iter([(None,)]), schema)


def test_ssf_seekable_compressed_stream(spark, tmp_path):
    """SimpleSeekableFormat analog (r17): chunked-deflate streams with
    per-chunk (uncompressed, compressed) offset metadata — whole-
    stream decode, uncompressed-offset seek WITHOUT inflating the
    prefix, byte-range split reads with zero line loss, and the torn-
    stream / non-SSF gates."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from hadoop_20_warehouse_spark.sources.seekable import (
        decode_ssf,
        encode_ssf,
        read_ssf_lines,
        seek_uncompressed,
        ssf_meta,
        write_ssf,
    )

    lines = [f"line {i} " + "x" * (i % 50) for i in range(2000)]
    blob = encode_ssf(lines, chunk_bytes=4096)
    assert decode_ssf(blob) == lines
    p = tmp_path / "part-00000.ssf"
    p.write_bytes(blob)
    full = ("\n".join(lines) + "\n").encode()
    for off in (0, 1, 5000, len(full) - 3, len(full)):
        assert seek_uncompressed(str(p), off) == full[off:], off
    meta = ssf_meta(str(tmp_path))
    assert meta["chunks"] > 1 and meta["uncompressed"] == len(full)

    df = spark.range(0, 500).select(
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("t")
    )
    d = str(tmp_path / "spark")
    n = write_ssf(df, "t", d, chunk_bytes=512)
    back = read_ssf_lines(spark, d, split_bytes=1024)
    assert back.rdd.getNumPartitions() > 1
    got = sorted(r["line"] for r in back.collect())
    assert len(got) == n == 500
    assert got == sorted(f"doc {i}" for i in range(500))

    with _pytest.raises(ValueError, match="SSF1"):
        decode_ssf(b"NOTSSFjunkjunkjunkjunkjunk")
    torn = bytearray(blob)
    torn[22] ^= 0xFF  # corrupt the first CHUNK sync (bytes 20..35)
    with _pytest.raises(ValueError, match="sync mismatch"):
        decode_ssf(bytes(torn))


def test_avro_fixed_truncation_and_name_sanitization():
    """r18 ADVICE fixes: (1) a truncated buffer under a fixed-type
    value raises like every other type instead of silently returning
    short bytes; (2) nested-record names generated from Spark column
    names are sanitized to the Avro name grammar [A-Za-z0-9_]."""
    import json as _json
    import re as _re

    import pyspark.sql.types as T
    import pytest as _pytest

    from hadoop_20_warehouse_spark.sources.avro import (
        _dec_any,
        schema_to_avro_json,
    )

    node = {"type": "fixed", "size": 8}
    with _pytest.raises(ValueError, match="truncated avro fixed"):
        _dec_any(b"\x01\x02\x03", 0, node)
    val, pos = _dec_any(b"\x01\x02\x03\x04\x05\x06\x07\x08", 0, node)
    assert val == bytes(range(1, 9)) and pos == 8

    schema = T.StructType([
        T.StructField(
            "weird col-nameé",
            T.StructType([T.StructField("x", T.LongType(), False)]),
            False,
        )
    ])
    sj = _json.loads(schema_to_avro_json(schema))
    names = [
        f["type"]["name"] for f in sj["fields"]
        if isinstance(f["type"], dict) and f["type"]["type"] == "record"
    ]
    assert names and all(
        _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n) for n in names
    )


def test_ssf_chunk_length_mismatch_detected():
    """r18 ADVICE fix: a corrupt-but-well-framed SSF chunk whose
    inflated length disagrees with its ulen header raises instead of
    silently corrupting uncompressed offsets."""
    import struct as _struct

    import pytest as _pytest

    from hadoop_20_warehouse_spark.sources.seekable import (
        decode_ssf,
        encode_ssf,
    )

    blob = bytearray(encode_ssf(["alpha", "beta", "gamma"]))
    # chunk header at 20: sync(16) + >QII (uoff, ulen, clen); bump ulen
    uoff, ulen, clen = _struct.unpack_from(">QII", blob, 36)
    _struct.pack_into(">QII", blob, 36, uoff, ulen + 1, clen)
    with _pytest.raises(ValueError, match="length mismatch"):
        decode_ssf(bytes(blob))
