"""Snapshot table layer (sources/snapshots.py): atomic-commit
concurrency, time travel, provenance-exact incremental reads, copy-on-
write delete, compaction equivalence, and stats pruning effectiveness
(the hash-checked queries prove soundness; these pin the parts a value
hash cannot see — conflicts, which files were touched, how many files
a pruned scan opens)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hadoop_20_warehouse_spark.sources.snapshots import (
    SnapshotConflictError,
    _load_manifest,
    _manifest_path,
    commit_append,
    commit_compact,
    commit_delete_where,
    create_table,
    incremental_read,
    latest_version,
    read_snapshot,
    snapshot_history,
)


def _orders(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


def _keys(df):
    return sorted(r["o_orderkey"] for r in df.collect())


@pytest.fixture()
def table(tmp_path, spark, sf_dir):
    path = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    create_table(
        spark,
        path,
        base.filter("o_orderkey % 3 = 0"),
        stats_cols=("o_orderkey",),
        cluster_by="o_orderkey",
    )
    commit_append(
        spark, path, base.filter("o_orderkey % 3 = 1"), cluster_by="o_orderkey"
    )
    commit_append(
        spark, path, base.filter("o_orderkey % 3 = 2"), cluster_by="o_orderkey"
    )
    return path


def test_time_travel_and_history(table, spark, sf_dir):
    base = _orders(spark, sf_dir)
    assert latest_version(table) == 3
    for v in (1, 2, 3):
        want = _keys(base.filter(F.col("o_orderkey") % 3 < v))
        got = _keys(read_snapshot(spark, table, version=v))
        assert got == want, f"version {v}"
    hist = snapshot_history(table)
    assert [h["operation"] for h in hist] == ["create", "append", "append"]
    assert hist[2]["n_rows"] == base.count()


def test_commit_conflict_atomicity(table, spark, sf_dir, monkeypatch):
    """Two writers racing on the same version slot: exactly one wins.
    Simulate the loser by letting another writer claim the slot AFTER
    this writer resolved its parent (stale-parent view)."""
    from hadoop_20_warehouse_spark.sources import snapshots as S

    stale = latest_version(table)
    nxt = stale + 1
    with open(_manifest_path(table, nxt), "w") as f:
        json.dump({"version": nxt, "claimed": "by-other-writer"}, f)
    monkeypatch.setattr(S, "latest_version", lambda _t: stale)
    with pytest.raises(SnapshotConflictError):
        commit_append(
            spark, table, _orders(spark, sf_dir).limit(5)
        )
    # the loser left no partial manifest behind
    snaps = [
        n
        for n in os.listdir(os.path.join(table, "_snapshots"))
        if n.startswith(".tmp")
    ]
    assert snaps == []


def test_reader_isolation_across_commit(table, spark, sf_dir):
    """A reader bound to version 2 sees version 2 even after later
    commits mutate the table (snapshot isolation)."""
    df_v2 = read_snapshot(spark, table, version=2)
    commit_delete_where(spark, table, "o_orderkey % 3 = 1")
    base = _orders(spark, sf_dir)
    assert _keys(df_v2) == _keys(base.filter("o_orderkey % 3 < 2"))


def test_delete_rewrites_only_touched_files(table, spark):
    before = {e["path"]: e for e in _load_manifest(table, 3)["files"]}
    # keys ≡2 (mod 3) live only in v3's files; delete a key range of them
    commit_delete_where(
        spark,
        table,
        "o_orderkey % 3 = 2 AND o_orderkey < 300",
        prune=("o_orderkey", None, 299),
    )
    after = {e["path"]: e for e in _load_manifest(table, 4)["files"]}
    untouched = [p for p in after if p in before]
    # every surviving original entry is byte-identical metadata
    for p in untouched:
        assert after[p] == before[p]
    # at least one original file genuinely survived AND one was rewritten
    assert untouched and set(after) != set(before)
    # provenance: rewritten files keep added=3
    rewritten = [e for p, e in after.items() if p not in before]
    assert rewritten and all(e["added"] == 3 for e in rewritten)


def test_incremental_exact_across_delete_and_compact(table, spark, sf_dir):
    base = _orders(spark, sf_dir)
    # delete some v2-provenance rows, then compact
    commit_delete_where(spark, table, "o_orderkey % 3 = 1 AND o_orderkey < 500")
    commit_compact(spark, table, small_file_bytes=1 << 30)
    inc = incremental_read(spark, table, from_version=1)
    want = base.filter(
        "(o_orderkey % 3 = 1 AND o_orderkey >= 500) OR o_orderkey % 3 = 2"
    )
    assert _keys(inc) == _keys(want)
    # and the compacted latest still equals its parent version's content
    assert _keys(read_snapshot(spark, table, version=5)) == _keys(
        read_snapshot(spark, table, version=4)
    )


def test_compact_merges_within_added_groups(table, spark):
    commit_compact(spark, table, small_file_bytes=1 << 30)
    files = _load_manifest(table, latest_version(table))["files"]
    by_added = {}
    for e in files:
        by_added.setdefault(e["added"], []).append(e)
    # each commit's group collapsed to one file, provenance intact
    assert set(by_added) == {1, 2, 3}
    assert all(len(g) == 1 for g in by_added.values())


def test_prune_drops_files_and_stays_sound(tmp_path, spark, sf_dir):
    path = str(tmp_path / "pruned")
    base = _orders(spark, sf_dir)
    create_table(
        spark,
        path,
        base,
        stats_cols=("o_orderkey",),
        cluster_by="o_orderkey",
        n_files=8,
    )
    n_total = len(_load_manifest(path, 1)["files"])
    lo, hi = 2000, 4000
    pruned = read_snapshot(spark, path, prune=("o_orderkey", lo, hi))
    n_pruned = len(
        {os.path.basename(f) for f in pruned.inputFiles()}
    )
    assert n_total > 1 and n_pruned < n_total  # effectiveness
    got = _keys(pruned.filter(F.col("o_orderkey").between(lo, hi)))
    want = _keys(base.filter(F.col("o_orderkey").between(lo, hi)))
    assert got == want  # soundness


def test_empty_read_keeps_schema(tmp_path, spark, sf_dir):
    path = str(tmp_path / "empty")
    base = _orders(spark, sf_dir)
    create_table(spark, path, base, stats_cols=("o_orderkey",))
    df = read_snapshot(spark, path, prune=("o_orderkey", -10, -5))
    assert df.count() == 0
    assert df.schema == base.schema
    inc = incremental_read(spark, path, from_version=1)
    assert inc.count() == 0 and inc.schema == base.schema


def test_create_refuses_existing(tmp_path, spark, sf_dir):
    path = str(tmp_path / "dup")
    base = _orders(spark, sf_dir).limit(10)
    create_table(spark, path, base)
    with pytest.raises(ValueError):
        create_table(spark, path, base)


def test_merge_rewrites_only_matched_files(table, spark, sf_dir):
    """Upsert a narrow key range: files without matched keys keep
    byte-identical entries; the source lands with new-version
    provenance; incremental read of the merge window yields exactly
    the upserted rows."""
    from hadoop_20_warehouse_spark.sources.snapshots import commit_merge

    base = _orders(spark, sf_dir)
    before = {e["path"]: e for e in _load_manifest(table, 3)["files"]}
    source = (
        base.filter("o_orderkey % 3 = 0 AND o_orderkey < 200")
        .withColumn("o_totalprice", F.col("o_totalprice") * 10)
    )
    n_src = source.count()
    assert n_src > 0
    v = commit_merge(spark, table, source, on="o_orderkey")
    after = {e["path"]: e for e in _load_manifest(table, v)["files"]}
    untouched = [p for p in after if p in before]
    for p in untouched:
        assert after[p] == before[p]
    assert untouched  # v2/v3 files (keys ≡1,2) never matched
    new_entries = [e for p, e in after.items() if p not in before]
    assert {e["added"] for e in new_entries} <= {1, v}
    assert sum(e["rows"] for e in new_entries if e["added"] == v) == n_src
    # upsert arithmetic: total rows unchanged (pure update, no insert)
    assert sum(e["rows"] for e in after.values()) == base.count()
    # CDC feed of the window = exactly the upserted rows
    inc = incremental_read(spark, table, from_version=3)
    assert _keys(inc) == _keys(source)


def test_merge_insert_and_update(tmp_path, spark, sf_dir):
    from hadoop_20_warehouse_spark.sources.snapshots import commit_merge

    path = str(tmp_path / "m")
    base = _orders(spark, sf_dir)
    create_table(
        spark,
        path,
        base.filter("o_orderkey % 2 = 0"),
        stats_cols=("o_orderkey",),
        cluster_by="o_orderkey",
    )
    source = base.filter("o_orderkey % 4 < 2").withColumn(
        "o_orderstatus", F.lit("U")
    )
    commit_merge(spark, path, source, on="o_orderkey")
    got = read_snapshot(spark, path)
    # expected: source rows + even keys not in source
    want_n = source.count() + base.filter(
        "o_orderkey % 2 = 0 AND o_orderkey % 4 >= 2"
    ).count()
    assert got.count() == want_n
    assert got.filter("o_orderstatus = 'U'").count() == source.count()


def test_merge_rejects_duplicate_source(table, spark, sf_dir):
    from hadoop_20_warehouse_spark.sources.snapshots import commit_merge

    dup = _orders(spark, sf_dir).limit(4).union(
        _orders(spark, sf_dir).limit(2)
    )
    with pytest.raises(ValueError, match="unique"):
        commit_merge(spark, table, dup, on="o_orderkey")


def test_streaming_sink_idempotent_replay(tmp_path, spark, sf_dir):
    from hadoop_20_warehouse_spark.sources.snapshots import (
        last_committed_batch,
        streaming_sink,
    )

    path = str(tmp_path / "sink")
    sink = streaming_sink(path, stream_id="s1")
    b0 = _orders(spark, sf_dir).filter("o_orderkey % 2 = 0")
    b1 = _orders(spark, sf_dir).filter("o_orderkey % 2 = 1")
    sink(b0, 0)  # first batch auto-creates the table
    sink(b1, 1)
    assert latest_version(path) == 2
    assert last_committed_batch(path, "s1") == 1
    sink(b0, 0)  # replay: must be a no-op
    sink(b1, 1)
    assert latest_version(path) == 2
    total = read_snapshot(spark, path).count()
    assert total == b0.count() + b1.count()
    # a DIFFERENT stream's batch ids are independent
    assert last_committed_batch(path, "other") == -1


def test_schema_evolution_metadata_only(table, spark, sf_dir):
    from hadoop_20_warehouse_spark.sources.snapshots import (
        commit_add_columns,
    )

    files_before = _load_manifest(table, 3)["files"]
    v = commit_add_columns(spark, table, {"note": "string", "score": "double"})
    m = _load_manifest(table, v)
    assert m["files"] == files_before  # zero files touched
    df = read_snapshot(spark, table)
    assert df.schema.fieldNames()[-2:] == ["note", "score"]
    assert df.filter("note IS NOT NULL OR score IS NOT NULL").count() == 0
    # appends after evolution carry the new columns
    extra = _orders(spark, sf_dir).limit(7).withColumn(
        "note", F.lit("x")
    ).withColumn("score", F.lit(1.5))
    commit_append(spark, table, extra)
    got = read_snapshot(spark, table)
    assert got.filter("note = 'x'").count() == 7
    with pytest.raises(ValueError, match="already exist"):
        commit_add_columns(spark, table, {"note": "string"})


def test_expire_snapshots_gc(table, spark, sf_dir):
    from hadoop_20_warehouse_spark.sources.snapshots import (
        expire_snapshots,
    )

    commit_delete_where(spark, table, "o_orderkey % 3 = 0")  # v4 strands v1-3 files
    live_before = _keys(read_snapshot(spark, table))
    stats = expire_snapshots(table, keep_last=1)
    assert stats["expired_versions"] == 3
    assert stats["deleted_files"] > 0
    # expired version unreadable, latest intact
    with pytest.raises(ValueError):
        read_snapshot(spark, table, version=1)
    assert _keys(read_snapshot(spark, table)) == live_before
    # every file the latest manifest references still exists on disk
    for e in _load_manifest(table, 4)["files"]:
        assert os.path.exists(os.path.join(table, e["path"]))
    # idempotent re-run deletes nothing further
    again = expire_snapshots(table, keep_last=1)
    assert again["deleted_files"] == 0


def test_clean_orphans(table, spark, sf_dir):
    from hadoop_20_warehouse_spark.sources.snapshots import (
        _write_data_files,
        clean_orphans,
    )

    # simulate a crashed commit: files written, manifest never published
    orphans = _write_data_files(
        _orders(spark, sf_dir).limit(20), table, added=99, stats_cols=()
    )
    assert orphans
    live_before = _keys(read_snapshot(spark, table))
    # fresh files are protected by the in-flight guard
    assert clean_orphans(table, older_than_s=3600) == 0
    removed = clean_orphans(table, older_than_s=0)
    assert removed >= len(orphans)
    for e in orphans:
        assert not os.path.exists(os.path.join(table, e["path"]))
    # live data untouched
    assert _keys(read_snapshot(spark, table)) == live_before


def test_timestamp_stats_json_safe(tmp_path, spark, sf_dir):
    """A timestamp stats column must not break manifest serialization,
    and its ISO string bounds must still prune correctly."""
    path = str(tmp_path / "ts")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    create_table(
        spark, path, ev, stats_cols=("ts",), cluster_by="ts", n_files=4
    )
    bounds = _load_manifest(path, 1)["files"][0]["stats"]["ts"]
    assert all(isinstance(b, str) for b in bounds)
    lo = min(
        b for e in _load_manifest(path, 1)["files"]
        for b in [e["stats"]["ts"][0]]
    )
    hi_mid = sorted(
        e["stats"]["ts"][1] for e in _load_manifest(path, 1)["files"]
    )[0]  # first file's max: a range that should prune later files
    pruned = read_snapshot(spark, path, prune=("ts", lo, hi_mid))
    n_all = len(_load_manifest(path, 1)["files"])
    n_kept = len({os.path.basename(f) for f in pruned.inputFiles()})
    assert n_kept < n_all


def test_tags_immutable_and_retained(table, spark, sf_dir):
    from hadoop_20_warehouse_spark.sources.snapshots import (
        create_tag,
        expire_snapshots,
        list_tags,
    )

    base = _orders(spark, sf_dir)
    assert create_tag(table, "release-a", version=2) == 2
    create_tag(table, "release-a", version=2)  # idempotent re-tag
    with pytest.raises(SnapshotConflictError, match="already pins"):
        create_tag(table, "release-a", version=3)
    with pytest.raises(ValueError):
        create_tag(table, "bad/name")
    with pytest.raises(ValueError):
        create_tag(table, "ghost", version=99)
    assert list_tags(table) == {"release-a": 2}
    # tag read resolves the pinned version
    got = _keys(read_snapshot(spark, table, tag="release-a"))
    assert got == _keys(base.filter("o_orderkey % 3 < 2"))
    # expiry retains the tagged version and its files
    commit_delete_where(spark, table, "o_orderkey % 3 = 0")  # v4
    stats = expire_snapshots(table, keep_last=1)
    assert stats["expired_versions"] == 2  # v1, v3 gone; v2 tagged
    assert _keys(read_snapshot(spark, table, tag="release-a")) == _keys(
        base.filter("o_orderkey % 3 < 2")
    )
    with pytest.raises(ValueError):
        read_snapshot(spark, table, version=1)


def test_delete_keeps_null_predicate_rows(tmp_path, spark, sf_dir):
    """SQL DELETE removes only TRUE matches: rows where the predicate
    evaluates NULL must survive the copy-on-write rewrite."""
    path = str(tmp_path / "nulls")
    base = _orders(spark, sf_dir).withColumn(
        "flag",
        F.when(F.col("o_orderkey") % 4 == 0, F.lit("x")).otherwise(
            F.lit(None).cast("string")
        ),
    )
    create_table(spark, path, base, stats_cols=("o_orderkey",))
    commit_delete_where(spark, path, "flag = 'x'")
    got = read_snapshot(spark, path)
    # NULL-flag rows all survive; only flag='x' rows are gone
    assert got.filter("flag IS NULL").count() == base.filter(
        "flag IS NULL"
    ).count()
    assert got.filter("flag = 'x'").count() == 0


# ---------------------------------------------------------------------------
# model-based property test: random op sequences vs a driver-side model
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_op = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 9)),
            min_size=1,
            max_size=8,
        ),
    ),
    st.tuples(st.just("delete"), st.integers(2, 4), st.integers(0, 3)),
    st.tuples(
        st.just("merge"),
        st.dictionaries(
            st.integers(0, 30), st.integers(100, 109), min_size=1, max_size=6
        ),
    ),
    st.tuples(st.just("compact"), st.just(0)),
)


@settings(max_examples=8, deadline=None)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_snapshot_ops_match_model(ops, tmp_path_factory):
    """Random append/delete/merge/compact sequences: the table's
    latest content, every historical version, and every incremental
    window must match a trivially-correct driver-side model.  Rows are
    (id, val); ids may repeat across appends (multiset semantics);
    merge removes EVERY matching target row and inserts the source row
    once — the model implements the same contract independently."""
    from hadoop_20_warehouse_spark.session import get_session
    from hadoop_20_warehouse_spark.sources.snapshots import commit_merge

    spark = get_session()
    path = str(tmp_path_factory.mktemp("prop") / "tbl")

    model: list[tuple[int, int, int]] = []  # (id, val, added)
    history: dict[int, list[tuple[int, int]]] = {}

    def _df(rows):
        return spark.createDataFrame(rows, "id int, val int")

    version = 0
    for op in ops:
        if op[0] == "append":
            rows = op[1]
            version = commit_append(spark, path, _df(rows))
            model.extend((i, v, version) for i, v in rows)
        elif op[0] == "delete":
            if version == 0:
                continue
            _, k, r = op
            version = commit_delete_where(spark, path, f"val % {k} = {r}")
            model = [t for t in model if t[1] % k != r]
        elif op[0] == "merge":
            if version == 0:
                continue
            src = sorted(op[1].items())
            version = commit_merge(
                spark, path, _df(src), on="id"
            )
            ids = set(op[1])
            model = [t for t in model if t[0] not in ids]
            model.extend((i, v, version) for i, v in src)
        else:
            if version == 0:
                continue
            version = commit_compact(spark, path, small_file_bytes=1 << 30)
        history[version] = sorted((i, v) for i, v, _ in model)

    if version == 0:
        return

    # latest content
    got = sorted(
        (r["id"], r["val"]) for r in read_snapshot(spark, path).collect()
    )
    assert got == history[version]

    # every historical version (time travel)
    for v, want in history.items():
        got_v = sorted(
            (r["id"], r["val"])
            for r in read_snapshot(spark, path, version=v).collect()
        )
        assert got_v == want, f"version {v}"

    # every incremental window from each recorded version to latest
    for v in history:
        want_inc = sorted((i, vv) for i, vv, a in model if a > v)
        got_inc = sorted(
            (r["id"], r["val"])
            for r in incremental_read(spark, path, from_version=v).collect()
        )
        assert got_inc == want_inc, f"incremental from {v}"


def test_history_survives_expiry(table, spark, sf_dir):
    from hadoop_20_warehouse_spark.sources.snapshots import (
        expire_snapshots,
    )

    expire_snapshots(table, keep_last=1)
    hist = snapshot_history(table)
    assert [h["version"] for h in hist] == [3]


def test_delete_and_merge_after_schema_evolution(table, spark, sf_dir):
    """Mixed pre/post-evolution file sets: delete predicates and merges
    on the NEW column must work (manifest-pinned scan schema), whatever
    file Spark would have inferred from."""
    from hadoop_20_warehouse_spark.sources.snapshots import (
        commit_add_columns,
        commit_merge,
    )

    commit_add_columns(spark, table, {"note": "string"})
    extra = _orders(spark, sf_dir).limit(30).withColumn("note", F.lit("n"))
    commit_append(spark, table, extra)
    v = commit_delete_where(spark, table, "note = 'n'")
    got = read_snapshot(spark, table, version=v)
    assert got.filter("note IS NOT NULL").count() == 0
    # merge keyed through the evolved schema
    src = (
        _orders(spark, sf_dir)
        .limit(10)
        .withColumn("note", F.lit("m"))
    )
    commit_merge(spark, table, src, on="o_orderkey")
    assert read_snapshot(spark, table).filter("note = 'm'").count() == 10


def test_append_rejects_schema_mismatch(table, spark, sf_dir):
    bad = _orders(spark, sf_dir).withColumnRenamed(
        "o_totalprice", "total_price"
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        commit_append(spark, table, bad.limit(5))
    wrong_type = _orders(spark, sf_dir).withColumn(
        "o_totalprice", F.col("o_totalprice").cast("string")
    )
    with pytest.raises(ValueError, match="type-changed"):
        commit_append(spark, table, wrong_type.limit(5))


def test_merge_on_temporal_stats_key(tmp_path, spark, sf_dir):
    """Merge keyed on a date column whose stats serialize as strings:
    bounds must compare like-with-like, not str < datetime."""
    from hadoop_20_warehouse_spark.sources.snapshots import commit_merge

    path = str(tmp_path / "tkey")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    base = orders.select(
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    ).groupBy("d").agg(F.sum("o_orderkey").alias("ksum"))
    create_table(
        spark, path, base, stats_cols=("d",), cluster_by="d", n_files=4
    )
    src = base.limit(5).withColumn("ksum", F.col("ksum") + 1)
    commit_merge(spark, path, src, on="d")
    got = read_snapshot(spark, path)
    assert got.count() == base.count()


def test_change_feed_events(table, spark, sf_dir):
    from hadoop_20_warehouse_spark.sources.snapshots import (
        change_feed,
        commit_merge,
    )

    base = _orders(spark, sf_dir)
    commit_delete_where(spark, table, "o_orderkey % 3 = 0 AND o_orderkey < 400")
    commit_compact(spark, table, small_file_bytes=1 << 30)  # v5: no events
    src = base.filter("o_orderkey % 3 = 1 AND o_orderkey < 200").withColumn(
        "o_orderstatus", F.lit("U")
    )
    commit_merge(spark, table, src, on="o_orderkey")  # v6

    feed = change_feed(spark, table, from_version=3)
    ev = {
        (r["o_orderkey"], r["_change_type"], r["_change_version"])
        for r in feed.collect()
    }
    del_v4 = set(
        r["o_orderkey"]
        for r in base.filter(
            "o_orderkey % 3 = 0 AND o_orderkey < 400"
        ).collect()
    )
    src_keys = set(r["o_orderkey"] for r in src.collect())
    want = (
        {(k, "delete", 4) for k in del_v4}
        | {(k, "delete", 6) for k in src_keys}
        | {(k, "insert", 6) for k in src_keys}
    )
    assert ev == want
    # compaction window alone: empty feed with the tagged schema
    v5 = change_feed(spark, table, from_version=4, to_version=5)
    assert v5.count() == 0
    assert v5.schema.fieldNames()[-2:] == ["_change_type", "_change_version"]
    # append-only window: feed == incremental tagged insert
    v13 = change_feed(spark, table, from_version=1, to_version=3)
    assert v13.filter("_change_type = 'delete'").count() == 0
    assert v13.count() == incremental_read(
        spark, table, 1, to_version=3
    ).count()


def test_change_feed_multiset_duplicates(tmp_path, spark, sf_dir):
    """Duplicate rows deleted together must produce one delete event
    per copy (EXCEPT ALL, not EXCEPT)."""
    from hadoop_20_warehouse_spark.sources.snapshots import change_feed

    path = str(tmp_path / "dups")
    one = _orders(spark, sf_dir).limit(6)
    create_table(spark, path, one.union(one), stats_cols=())
    commit_delete_where(spark, path, "o_orderkey % 2 = 0")
    feed = change_feed(spark, path, from_version=1)
    n_even_rows = one.union(one).filter("o_orderkey % 2 = 0").count()
    assert feed.filter("_change_type = 'delete'").count() == n_even_rows


def test_concurrent_appenders_all_land(tmp_path, spark, sf_dir):
    """Six writers race the version CAS from threads (real contention,
    not simulated): with a retry-on-conflict loop every append lands
    exactly once — six new versions, union content, no lost updates."""
    from concurrent.futures import ThreadPoolExecutor

    path = str(tmp_path / "race")
    base = _orders(spark, sf_dir)
    create_table(spark, path, base.filter("o_orderkey % 10 = 9"))

    def worker(mod):
        batch = base.filter(F.col("o_orderkey") % 10 == mod)
        for _ in range(50):
            try:
                return commit_append(spark, path, batch)
            except SnapshotConflictError:
                continue
        raise AssertionError(f"writer {mod} starved")

    with ThreadPoolExecutor(max_workers=6) as ex:
        versions = list(ex.map(worker, range(6)))

    assert sorted(versions) == [2, 3, 4, 5, 6, 7]  # every slot used once
    got = read_snapshot(spark, path)
    want = base.filter("o_orderkey % 10 <= 5 OR o_orderkey % 10 = 9")
    assert got.count() == want.count()
    assert _keys(got) == _keys(want)
