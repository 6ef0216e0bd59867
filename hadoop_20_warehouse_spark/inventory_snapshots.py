"""Registered queries for the versioned snapshot table layer
(``sources/snapshots.py``): time travel, incremental reads, copy-on-
write delete + compaction, and stats-pruned scans — each hash-checked
against an oracle that recomputes the expected state straight from the
source table, so manifest resolution, atomic commits, file pruning and
provenance tracking all sit inside the checked path.

Reference analog: the reference has no table format — its "versioned
dataset" is FileOutputCommitter's directory rename
(``src/mapred/org/apache/hadoop/mapred/FileOutputCommitter.java``)
plus dated-directory conventions; these queries cover the capability a
corpus release pipeline layers on top of that today."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_spark.catalog import load_table
from hadoop_20_warehouse_spark.registry import register


def _orders_slice(spark: SparkSession, sf_dir: str, mod: int) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == mod)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


def _build_three_version_table(spark: SparkSession, sf_dir: str) -> str:
    """v1 = keys ≡0 (mod 3), v2 appends ≡1, v3 appends ≡2 — one fresh
    table per invocation (concurrent tenants each get their own)."""
    from hadoop_20_warehouse_spark.inventory_ext import (
        _fresh_subdir,
        _scratch_dir,
    )
    from hadoop_20_warehouse_spark.sources.snapshots import (
        commit_append,
        create_table,
    )

    table = _fresh_subdir(_scratch_dir("snap"), "orders3v")
    create_table(
        spark,
        table,
        _orders_slice(spark, sf_dir, 0),
        stats_cols=("o_orderkey",),
        cluster_by="o_orderkey",
    )
    commit_append(
        spark, table, _orders_slice(spark, sf_dir, 1), cluster_by="o_orderkey"
    )
    commit_append(
        spark, table, _orders_slice(spark, sf_dir, 2), cluster_by="o_orderkey"
    )
    return table


@register(
    "snapshot_time_travel",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
WHERE o_orderkey % 3 <= 1
""",
)
def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: three commits land (keys ≡0, then ≡1, then ≡2 mod
    3), the read binds to version 2 — the oracle recomputes exactly the
    first two slices from the source table, so equality proves manifest
    resolution returns the historical file set untouched by the later
    commit.  Scale: the as-of read costs the same as a latest read —
    one manifest JSON resolves the file list; no log replay."""
    from hadoop_20_warehouse_spark.sources.snapshots import read_snapshot

    table = _build_three_version_table(spark, sf_dir)
    return read_snapshot(spark, table, version=2)


@register(
    "snapshot_incremental_read",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
WHERE o_orderkey % 3 >= 1
""",
)
def q_snapshot_incremental_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental (CDC-style) read: rows landed in versions (1, 3] =
    the second and third commits — the train-on-the-delta feed between
    two corpus releases.  A compaction commits BETWEEN the reads (v4);
    because compaction merges only within one ``added`` group, the
    incremental result over the compacted layout must still equal the
    raw slices the oracle recomputes.  Scale: reads only the delta's
    files, never rescans the base — delta-proportional by
    construction."""
    from hadoop_20_warehouse_spark.sources.snapshots import (
        commit_compact,
        incremental_read,
    )

    table = _build_three_version_table(spark, sf_dir)
    commit_compact(spark, table)  # v4: merge small files per group
    return incremental_read(spark, table, from_version=1)


@register(
    "snapshot_delete_compact",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
WHERE o_orderstatus <> 'F'
""",
)
def q_snapshot_delete_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write delete then compaction: create from the full
    table, DELETE WHERE o_orderstatus = 'F' (files with matches are
    rewritten without the victims; untouched files keep their exact
    entries), then compact.  The latest read must equal the oracle's
    anti-filter — one hash covers the rewrite arithmetic, the survivor
    bookkeeping, and compaction's row-preservation at once.  Scale:
    the delete scans only candidate files and rewrites only touched
    ones; compaction is a metadata-plus-small-file operation."""
    from hadoop_20_warehouse_spark.inventory_ext import (
        _fresh_subdir,
        _scratch_dir,
    )
    from hadoop_20_warehouse_spark.sources.snapshots import (
        commit_compact,
        commit_delete_where,
        create_table,
        read_snapshot,
    )

    table = _fresh_subdir(_scratch_dir("snap"), "orders_del")
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    create_table(
        spark,
        table,
        base,
        stats_cols=("o_orderkey",),
        cluster_by="o_orderkey",
    )
    commit_delete_where(spark, table, "o_orderstatus = 'F'")
    commit_compact(spark, table)
    return read_snapshot(spark, table)


@register(
    "snapshot_pruned_scan",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
WHERE o_orderkey BETWEEN 2000 AND 4000
""",
)
def q_snapshot_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level file pruning: the table is written clustered on
    o_orderkey (range partition → tight per-file min/max), the read
    hands [2000, 4000] to the pruner so only overlapping files are
    opened, then applies the exact filter.  Equality against the
    oracle's BETWEEN proves the prune is sound (drops nothing it
    shouldn't); that it actually DROPS files is pinned by
    tests/test_snapshots.py on the same layout.  Scale: this is the
    free partition-pruning win — at 100 TB a keyed point-range scan
    opens O(range) files, not O(table)."""
    from hadoop_20_warehouse_spark.inventory_ext import (
        _fresh_subdir,
        _scratch_dir,
    )
    from hadoop_20_warehouse_spark.sources.snapshots import (
        create_table,
        read_snapshot,
    )

    table = _fresh_subdir(_scratch_dir("snap"), "orders_prune")
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    create_table(
        spark,
        table,
        base,
        stats_cols=("o_orderkey",),
        cluster_by="o_orderkey",
        n_files=8,
    )
    pruned = read_snapshot(
        spark, table, prune=("o_orderkey", 2000, 4000)
    )
    return pruned.filter(F.col("o_orderkey").between(2000, 4000))


@register(
    "snapshot_merge_upsert",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(o_totalprice AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 3 <= 1
),
src AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         CAST(o_totalprice * 2 AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT * FROM src
UNION ALL
SELECT * FROM base
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
""",
)
def q_snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) on a snapshot table: the base holds keys
    ≡0,1 (mod 3); the source upserts every even key with doubled price
    and status 'U' — updates where the key exists, inserts where it
    does not.  The oracle recomputes the upsert relationally
    (source ∪ base-minus-matched), so one hash covers the match join,
    the copy-on-write rewrite of touched files, and the insert path.
    Scale: only files containing a matched key are rewritten (stats-
    pruned match job); the source lands as new files in one write —
    delta-proportional exactly like the delete path."""
    from hadoop_20_warehouse_spark.inventory_ext import (
        _fresh_subdir,
        _scratch_dir,
    )
    from hadoop_20_warehouse_spark.sources.snapshots import (
        commit_merge,
        create_table,
        read_snapshot,
    )

    table = _fresh_subdir(_scratch_dir("snap"), "orders_merge")
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 <= 1).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    create_table(
        spark,
        table,
        base,
        stats_cols=("o_orderkey",),
        cluster_by="o_orderkey",
        n_files=4,
    )
    source = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).cast("double").alias("o_totalprice"),
    )
    commit_merge(spark, table, source, on="o_orderkey")
    return read_snapshot(spark, table)


@register(
    "snapshot_schema_evolution",
    oracle="""
SELECT o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(NULL AS VARCHAR) AS o_channel
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       o_orderpriority AS o_channel
FROM orders WHERE o_orderkey % 2 = 1
""",
)
def q_snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only ALTER TABLE ADD COLUMN: even keys commit under the
    narrow schema, the column lands as a pure manifest operation (zero
    files touched), odd keys append WITH the column — the latest read
    must serve old files as NULL and new files with values, which is
    exactly what the oracle's union recomputes.  Scale: the evolution
    commit is O(1) regardless of table size; no rewrite-the-world
    migration."""
    from hadoop_20_warehouse_spark.inventory_ext import (
        _fresh_subdir,
        _scratch_dir,
    )
    from hadoop_20_warehouse_spark.sources.snapshots import (
        commit_add_columns,
        commit_append,
        create_table,
        read_snapshot,
    )

    table = _fresh_subdir(_scratch_dir("snap"), "orders_evolve")
    orders = load_table(spark, sf_dir, "orders")
    narrow = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    create_table(spark, table, narrow, stats_cols=("o_orderkey",))
    commit_add_columns(spark, table, {"o_channel": "string"})
    wide = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("o_orderpriority").alias("o_channel"),
    )
    commit_append(spark, table, wide)
    return read_snapshot(spark, table)


@register(
    "snapshot_vacuum_read",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
WHERE o_orderstatus <> 'F'
""",
)
def q_snapshot_vacuum_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot expiry (vacuum): a delete commit strands the
    pre-delete files; expire_snapshots retains only the latest
    manifest, physically removes every unreferenced data file (the
    query asserts at least one deletion happened and that survivors
    still exist), and the latest read over the vacuumed table must
    still match the oracle's anti-filter — storage reclaim without
    touching live data.  Scale: the referenced-set union is O(files)
    metadata; deletes are unlinks over that list."""
    from hadoop_20_warehouse_spark.inventory_ext import (
        _fresh_subdir,
        _scratch_dir,
    )
    from hadoop_20_warehouse_spark.sources.snapshots import (
        commit_delete_where,
        create_table,
        expire_snapshots,
        read_snapshot,
    )

    table = _fresh_subdir(_scratch_dir("snap"), "orders_vacuum")
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    create_table(
        spark,
        table,
        base,
        stats_cols=("o_orderkey",),
        cluster_by="o_orderkey",
        n_files=4,
    )
    commit_delete_where(spark, table, "o_orderstatus = 'F'")
    stats = expire_snapshots(table, keep_last=1)
    assert stats["deleted_files"] > 0, "vacuum removed nothing"
    return read_snapshot(spark, table)


@register(
    "snapshot_change_feed",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(o_totalprice AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 3 <= 1
),
src AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         CAST(o_totalprice * 2 AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT *, 'delete' AS _change_type, 2 AS _change_version
FROM base WHERE o_orderstatus = 'F'
UNION ALL
SELECT *, 'delete' AS _change_type, 3 AS _change_version
FROM base
WHERE o_orderstatus <> 'F' AND o_orderkey % 2 = 0
UNION ALL
SELECT *, 'insert' AS _change_type, 3 AS _change_version FROM src
""",
)
def q_snapshot_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change-data feed reconstructed from manifest diffs
    (no change log is written at commit time): v1 creates keys ≡0,1
    (mod 3); v2 DELETEs status 'F'; v3 MERGEs every even key (doubled
    price, status 'U').  The feed over (1, 3] must contain exactly the
    v2 delete events, the v3 delete half of each update pair, and the
    v3 inserts — all recomputed relationally by the oracle, so one
    hash covers the per-version file-diff bookkeeping AND the
    multiset EXCEPT that separates deleted rows from rewritten
    survivors.  Scale: cost ∝ files touched in the window; the
    per-group EXCEPT ALL is an ordinary AQE-planned shuffle."""
    from hadoop_20_warehouse_spark.inventory_ext import (
        _fresh_subdir,
        _scratch_dir,
    )
    from hadoop_20_warehouse_spark.sources.snapshots import (
        change_feed,
        commit_delete_where,
        commit_merge,
        create_table,
    )

    table = _fresh_subdir(_scratch_dir("snap"), "orders_cdf")
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 <= 1).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    create_table(
        spark,
        table,
        base,
        stats_cols=("o_orderkey",),
        cluster_by="o_orderkey",
        n_files=4,
    )
    commit_delete_where(spark, table, "o_orderstatus = 'F'")
    source = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).cast("double").alias("o_totalprice"),
    )
    commit_merge(spark, table, source, on="o_orderkey")
    return change_feed(spark, table, from_version=1)


@register(
    "stream_snapshot_ingest",
    oracle="""
SELECT event_id, user_id, event_type,
       CAST(value AS DOUBLE) AS value,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS event_ts
FROM events
""",
)
def q_stream_snapshot_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingestion: events are staged as four
    parquet files, read back as a REAL Structured Streaming source
    (maxFilesPerTrigger=1 → four micro-batches), and appended into a
    snapshot table through the foreachBatch :func:`streaming_sink`.
    After the stream drains, the first batch is REPLAYED through the
    sink with its original batch id — the at-least-once failure mode —
    and the manifest's transaction marker turns it into a no-op.  The
    oracle is simply ALL events: equality proves every batch landed
    exactly once (a lost batch or a doubled replay both break the
    hash).  Scale: each micro-batch commit is one distributed parquet
    write + one O(files) metadata CAS; the marker map adds one entry
    per stream, not per batch."""
    from hadoop_20_warehouse_spark.inventory_ext import (
        _fresh_subdir,
        _scratch_dir,
    )
    from hadoop_20_warehouse_spark.sources.snapshots import (
        last_committed_batch,
        latest_version,
        read_snapshot,
        streaming_sink,
    )

    import os

    stage = _fresh_subdir(_scratch_dir("snap"), "ingest_src")
    # underscore-prefixed siblings inside the staging dir are invisible
    # to Spark's file listing, so the stream source never reads them;
    # they ride along with the generation's cleanup
    table = os.path.join(stage, "_table")
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("event_ts"),
    )
    events.repartition(4).write.parquet(stage)

    sink = streaming_sink(table, stream_id="ingest_demo")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(stage, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # replay batch 0 — the at-least-once retry a failure would produce
    v_before = latest_version(table)
    replay = spark.read.schema(events.schema).parquet(stage).limit(50)
    sink(replay, 0)
    assert latest_version(table) == v_before, "replayed batch committed"
    assert last_committed_batch(table, "ingest_demo") >= 3

    return read_snapshot(spark, table)
