"""I/O roundtrips (text, kv-text, SequenceFile, partitioned writes) —
tier-2 format-interop tests (FIXTURES.md F6)."""

from __future__ import annotations

import os

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
