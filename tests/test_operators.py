"""Tier-1/3 operator tests (SURVEY.md §5): spec parsers, TestDatamerge
join-semantics fixtures, SortValidator-style invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from hadoop_20_warehouse_spark.operators import datagen
from hadoop_20_warehouse_spark.operators.join import (
    Func,
    Tbl,
    compose_join,
    parse_join_expr,
)
from hadoop_20_warehouse_spark.operators.select import FieldSpec, parse_field_spec
from hadoop_20_warehouse_spark.operators.sort import (
    KeyFieldPart,
    parse_keyfield_spec,
    total_order_sort,
)
from hadoop_20_warehouse_spark.types import parse_record_ddl


# --- spec parsers ----------------------------------------------------------


def test_field_spec_parser():
    assert parse_field_spec("3,0,2") == FieldSpec((3, 0, 2), None)
    assert parse_field_spec("0-") == FieldSpec((), 0)
    assert parse_field_spec("1,3-") == FieldSpec((1,), 3)
    assert parse_field_spec("-") == FieldSpec((), 0)
    assert parse_field_spec("") == FieldSpec((), None)
    with pytest.raises(ValueError):
        parse_field_spec("3-,1")  # open range must be last


def test_keyfield_spec_parser():
    assert parse_keyfield_spec("-k2,2nr") == [
        KeyFieldPart(2, 1, 2, None, numeric=True, reverse=True)
    ]
    assert parse_keyfield_spec("2.1,2.3n") == [
        KeyFieldPart(2, 1, 2, 3, numeric=True, reverse=False)
    ]
    assert parse_keyfield_spec("-k4,4nr -k1,1") == [
        KeyFieldPart(4, 1, 4, None, numeric=True, reverse=True),
        KeyFieldPart(1, 1, 1, None),
    ]


def test_join_expr_parser():
    e = parse_join_expr("inner(orders, override(c1, c2))")
    assert e == Func("inner", (Tbl("orders"), Func("override", (Tbl("c1"), Tbl("c2")))))
    # reference leaf form: class token ignored, quoted path becomes name
    e2 = parse_join_expr('outer(tbl(SequenceFileInputFormat, "hdfs://x/src0"), s1)')
    assert e2 == Func("outer", (Tbl("src0"), Tbl("s1")))
    with pytest.raises(ValueError):
        parse_join_expr("inner(a,")


def test_record_ddl():
    schemas = parse_record_ddl(
        """
        module test {
          class Inner { int a; ustring b; }
          class Outer {
            long id;
            vector<double> xs;
            map<ustring, int> kv;
            Inner nested;  // nested record
          }
        }
        """
    )
    outer = schemas["Outer"]
    assert [f.name for f in outer.fields] == ["id", "xs", "kv", "nested"]
    assert outer["xs"].dataType.simpleString() == "array<double>"
    assert outer["kv"].dataType.simpleString() == "map<string,int>"
    assert outer["nested"].dataType == schemas["Inner"]


# --- TestDatamerge-style join fixtures ------------------------------------
# Interleaved presence pattern (TestDatamerge.java:76-100): source i holds
# key k iff bit i of (k % 8) is set; duplicate rows in src2 for
# cross-product/multiplicity checks.


@pytest.fixture(scope="module")
def join_fixture(spark):
    def rows(i):
        out = []
        for k in range(32):
            if (k % 8) >> i & 1:
                out.append(Row(key=k, val=i * 1000 + k))
                if i == 2:  # duplicates in the rightmost source
                    out.append(Row(key=k, val=i * 1000 + k + 500))
        return out

    return {f"s{i}": spark.createDataFrame(rows(i)) for i in range(3)}


def test_inner_join_semantics(join_fixture):
    out = compose_join("inner(s0, s1, s2)", join_fixture).collect()
    # keys present in all three sources: k%8 == 7 → 4 keys in 0..31,
    # each with 1×1×2 duplicate cross product
    keys = sorted(r["key"] for r in out)
    assert keys == [7, 7, 15, 15, 23, 23, 31, 31]


def test_outer_join_semantics(join_fixture):
    out = compose_join("outer(s0, s1, s2)", join_fixture)
    rows = {(r["key"], r["val_s0"], r["val_s1"], r["val_s2"]) for r in out.collect()}
    # key with k%8==1: only s0 → others NULL
    assert (1, 1, None, None) in rows
    # every key 1..31 except k%8==0 appears
    assert {k for (k, *_rest) in rows} == {k for k in range(32) if k % 8 != 0}


def test_override_join_semantics(join_fixture):
    out = compose_join("override(s0, s1, s2)", join_fixture).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(r)
    # k%8==3: present in s0,s1 → s1 (rightmost) wins, s0 slot NULL
    assert all(r["val_s1"] is not None and r["val_s0"] is None for r in by_key[3])
    # k%8==4: only s2 → both its duplicate rows survive (multiplicity!)
    assert len(by_key[4]) == 2
    # k%8==7: s2 wins with both duplicates, not 1
    assert len(by_key[7]) == 2 and all(r["val_s2"] is not None for r in by_key[7])


def test_multifilter_join_semantics(join_fixture):
    """MultiFilterRecordReader contract: outer-join tuple stream, one
    emitted value per tuple (leftmost non-null), duplicate-key
    cross-product multiplicity preserved."""
    out = compose_join("multifilter(s0, s1, s2)", join_fixture).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(r["val_s0"])
    # k%8==1: only s0 → one tuple, s0's value emitted
    assert by_key[1] == [1]
    # k%8==4: only s2 (duplicated) → two tuples, both emit the s2 slot
    assert sorted(by_key[4]) == [2004, 2504]
    # k%8==7: 1×1×2 cross product → TWO rows both emitting s0's value
    # (multiplicity survives even though the emitted value repeats)
    assert by_key[7] == [7, 7]
    # key 0 in no source → absent entirely
    assert 0 not in by_key and 8 not in by_key


def test_multifilter_value_class_check(spark, join_fixture):
    """Disagreeing child value classes must raise — the analog of
    MultiFilterRecordReader.java:95-99's ClassCastException."""
    from hadoop_20_warehouse_spark.operators.join import multifilter_join

    s0 = join_fixture["s0"]
    bad = join_fixture["s1"].select("key", F.col("val").cast("string").alias("val"))
    with pytest.raises(TypeError, match="value classes disagree"):
        multifilter_join([s0, bad])


# --- SortValidator-style invariants (mapred/SortValidator.java:97,399) ----


def test_total_order_sort_invariants(spark):
    df = datagen.teragen(spark, 5000, partitions=8)
    # xor-of-hashes, exactly SortValidator's RecordStatsChecker invariant
    # (sum would overflow int64 under ANSI mode)
    xor_checksum = F.expr(
        "bit_xor(cast(conv(substring(md5(key), 1, 15), 16, 10) as bigint))"
    ).alias("checksum")
    before = df.agg(F.count(F.lit(1)).alias("n"), xor_checksum).collect()[0]
    out = total_order_sort(df, "key", partitions=6)
    after = out.agg(F.count(F.lit(1)).alias("n"), xor_checksum).collect()[0]
    # RecordStatsChecker: (#records, checksum) invariant under sort
    assert (before["n"], before["checksum"]) == (after["n"], after["checksum"])
    # RecordChecker: global pairwise ordering incl. across partitions
    keys = [r["key"] for r in out.select("key").collect()]
    assert keys == sorted(keys)
    # partition boundaries respect the total order (range partitioning)
    bounds = (
        out.select(F.spark_partition_id().alias("p"), "key")
        .groupBy("p")
        .agg(F.min("key").alias("lo"), F.max("key").alias("hi"))
        .orderBy("p")
        .collect()
    )
    for prev, cur in zip(bounds, bounds[1:]):
        assert prev["hi"] <= cur["lo"]


def test_datagen_deterministic(spark):
    a = datagen.random_text(spark, 50, 5).collect()
    b = datagen.random_text(spark, 50, 5).collect()
    assert a == b


def test_asof_join_matches_naive_rank(spark):
    """asof_join (union+window) must equal the naive range-join + rank
    construction on interleaved fixtures with ties and keyless rows."""
    from pyspark.sql import Row, Window as W_

    from hadoop_20_warehouse_spark.operators.join import asof_join

    left = spark.createDataFrame(
        [Row(k=k, lts=t, lid=100 * k + t) for k in (1, 2, 3) for t in (5, 10, 20)]
    )
    # key 3 has no right rows at all; key 1 has a tie at t=10
    right = spark.createDataFrame(
        [
            Row(k=1, rts=4, rid=1),
            Row(k=1, rts=10, rid=2),
            Row(k=1, rts=10, rid=3),
            Row(k=1, rts=15, rid=4),
            Row(k=2, rts=1, rid=5),
            Row(k=2, rts=19, rid=6),
        ]
    )
    got = (
        asof_join(left, right, on=["k"], ts_left="lts", ts_right="rts",
                  right_tiebreak="rid")
        .select("k", "lts", "lid", F.col("rid_asof").alias("rid"))
        .collect()
    )
    w = W_.partitionBy("k", "lts", "lid").orderBy(F.desc("rts"), F.desc("rid"))
    naive = (
        left.join(right, on=[left.k == right.k, right.rts <= left.lts], how="left")
        .select(left.k, "lts", "lid", "rts", "rid")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "lts", "lid", "rid")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))
    # tie at rts=10 resolved to the larger tiebreak id
    by_key = {(r.k, r.lts): r.rid for r in got}
    assert by_key[(1, 10)] == 3
    assert by_key[(3, 5)] is None


def test_asof_join_row_atomic_nulls(spark):
    """A genuine NULL in a right payload column must come through as
    NULL — never backfilled from an OLDER right row (the carried match
    is one row, not per-column last-non-null)."""
    from pyspark.sql import Row

    from hadoop_20_warehouse_spark.operators.join import asof_join

    right = spark.createDataFrame(
        [
            Row(k=1, rts=1, rid=1, note="x"),
            Row(k=1, rts=2, rid=2, note=None),
        ]
    )
    left = spark.createDataFrame([Row(k=1, lts=3, lid=10)])
    row = asof_join(
        left, right, on=["k"], ts_left="lts", ts_right="rts", right_tiebreak="rid"
    ).collect()[0]
    assert row.rid_asof == 2
    assert row.note_asof is None, "note must not leak from the rts=1 row"


def test_band_join_matches_theta(spark):
    """Bucketized band join must equal the naive theta range join,
    including boundary-exact pairs (|dt| == band)."""
    from pyspark.sql import Row

    from hadoop_20_warehouse_spark.operators.join import band_join

    import datetime as dt

    def t(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [Row(k=1, lid=i, ts=t(s)) for i, s in enumerate([0, 10, 30, 100])]
    )
    right = spark.createDataFrame(
        [Row(k=1, rid=i, ts=t(s)) for i, s in enumerate([5, 10, 20, 40, 130])]
        + [Row(k=2, rid=99, ts=t(10))]  # other key never matches
    )
    got = sorted(
        (r.lid, r.rid_r)
        for r in band_join(
            left, right, on=["k"], ts_left="ts", ts_right="ts",
            band_us=10_000_000,
        ).collect()
    )
    naive = sorted(
        (lrow.lid, rrow.rid)
        for lrow in left.collect()
        for rrow in right.collect()
        if lrow.k == rrow.k and abs((lrow.ts - rrow.ts).total_seconds()) <= 10
    )
    assert got == naive and len(got) > 0


def test_scd2_build_hand_computed_and_one_exchange(spark):
    """operators/scd.scd2_build: consecutive confirmations collapse,
    NULL is a real state (null-safe change detection both into and out
    of NULL), intervals chain per key, the open interval is current,
    and the whole build runs on ONE key exchange (all three windows
    share the user partitioning + sort)."""
    import datetime as dt
    import re

    from hadoop_20_warehouse_spark.operators.scd import scd2_build

    d = lambda day: dt.datetime(2020, 1, day)  # noqa: E731
    rows = [
        (1, "a", d(1), 1),
        (1, "a", d(2), 2),   # confirm -> collapsed
        (1, "b", d(3), 3),   # change
        (1, None, d(4), 4),  # change to NULL state
        (1, None, d(5), 5),  # confirm NULL -> collapsed
        (1, "a", d(6), 6),   # change back
        (2, "x", d(1), 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    out = scd2_build(
        df, key="user_id", attrs=("event_type",), ts="ts",
        tiebreak=("event_id",),
    )
    got = [
        (r.user_id, r.event_type, r.valid_from.day,
         r.valid_to.day if r.valid_to else None, r.is_current, r.version)
        for r in out.orderBy("user_id", "version").collect()
    ]
    assert got == [
        (1, "a", 1, 3, False, 1),
        (1, "b", 3, 4, False, 2),
        (1, None, 4, 6, False, 3),
        (1, "a", 6, None, True, 4),
        (2, "x", 1, None, True, 1),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_scd2_apply_delta_equals_full_build_and_strict_guard(spark):
    """scd2_apply_delta == scd2_build(full log) across random
    append-only splits (including a delta that OPENS with a
    confirmation of the key's current state — must collapse, not
    fragment), and the strict guard raises on an out-of-order
    backfill delta."""
    import datetime as dt
    import random as _r

    import pytest as _pytest

    from hadoop_20_warehouse_spark.operators.scd import (
        scd2_apply_delta,
        scd2_build,
    )

    rng = _r.Random(31)
    base_t = dt.datetime(2020, 1, 1)
    rows = []
    eid = 0
    for user in range(6):
        t = base_t
        for _ in range(rng.randint(3, 12)):
            t += dt.timedelta(hours=rng.randint(1, 30))
            rows.append((user, rng.choice("abc"), t, eid))
            eid += 1
    schema = "user_id long, state string, ts timestamp, event_id long"
    full = spark.createDataFrame(rows, schema)
    want = sorted(
        tuple(r)
        for r in scd2_build(
            full, "user_id", ("state",), "ts", ("event_id",)
        ).collect()
    )
    for cut_days in (2, 7, 12):
        cut = base_t + dt.timedelta(days=cut_days)
        base = full.filter(F.col("ts") < F.lit(cut))
        delta = full.filter(F.col("ts") >= F.lit(cut))
        dim = scd2_build(
            base, "user_id", ("state",), "ts", ("event_id",),
            keep_tiebreak=True, keep_last_observed=True,
        )
        merged = scd2_apply_delta(
            dim, delta, "user_id", ("state",), "ts", ("event_id",),
            strict=True,
        )
        got = sorted(
            tuple(r)
            for r in merged.drop("event_id", "last_observed").collect()
        )
        assert got == want, f"cut at day {cut_days}"
        # last_observed stays exact through the merge: per key it must
        # equal the FULL log's max raw ts (collapsed confirmations
        # included), so a second apply_delta's strict guard sees truth
        want_last = {
            r["user_id"]: r["mx"]
            for r in full.groupBy("user_id").agg(
                F.max("ts").alias("mx")
            ).collect()
        }
        got_last = {
            r["user_id"]: r["mx"]
            for r in merged.groupBy("user_id").agg(
                F.max("last_observed").alias("mx")
            ).collect()
        }
        assert got_last == want_last, f"last_observed drift at {cut_days}"
    # strict guard: a backfill row older than the key's last change
    dim_full = scd2_build(
        full, "user_id", ("state",), "ts", ("event_id",),
        keep_tiebreak=True, keep_last_observed=True,
    )
    backfill = spark.createDataFrame(
        [(0, "z", base_t + dt.timedelta(hours=1), 9999)], schema
    )
    with _pytest.raises(ValueError, match="older than"):
        scd2_apply_delta(
            dim_full, backfill, "user_id", ("state",), "ts", ("event_id",),
            strict=True,
        ).collect()
    # strict without last_observed is a contract error, not a weaker
    # check — max(valid_from) cannot see collapsed confirmations
    dim_bare = scd2_build(
        full, "user_id", ("state",), "ts", ("event_id",), keep_tiebreak=True
    )
    with _pytest.raises(ValueError, match="keep_last_observed"):
        scd2_apply_delta(
            dim_bare, backfill, "user_id", ("state",), "ts", ("event_id",),
            strict=True,
        )
    # the r15-advice scenario: raw A@1h, A@10h collapse to one interval
    # opened at 1h; a delta at 7h sits between the last CHANGE (1h) and
    # the collapsed confirmation (10h).  The old max(valid_from) guard
    # passed it and the merge silently lost the 10h re-open the full
    # log implies; the last_observed guard must REJECT it.
    tricky = spark.createDataFrame(
        [(99, "a", base_t + dt.timedelta(hours=1), 1),
         (99, "a", base_t + dt.timedelta(hours=10), 2)],
        schema,
    )
    dim_tricky = scd2_build(
        tricky, "user_id", ("state",), "ts", ("event_id",),
        keep_tiebreak=True, keep_last_observed=True,
    )
    between = spark.createDataFrame(
        [(99, "b", base_t + dt.timedelta(hours=7), 3)], schema
    )
    with _pytest.raises(ValueError, match="older than"):
        scd2_apply_delta(
            dim_tricky, between, "user_id", ("state",), "ts",
            ("event_id",), strict=True,
        ).collect()


def test_cdc_merge_semantics_hand_computed(spark):
    """operators/cdc.merge_apply_changes: update replaces the full
    row, delete removes (even for never-seen keys), insert lands,
    latest (ts, tiebreak) wins within a batch, delete-then-reinsert
    resolves in log order, untouched rows pass through."""
    import datetime as dt

    from hadoop_20_warehouse_spark.operators.cdc import merge_apply_changes

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    snap = spark.createDataFrame(
        [(1, "ann", 100), (2, "bob", 200), (3, "cat", 300)],
        "k long, name string, v long",
    )
    changes = spark.createDataFrame(
        [
            # k=1: two updates, later ts wins
            (1, "U", t(5), 1, "ann2", 110),
            (1, "U", t(9), 2, "ann3", 120),
            # k=2: delete
            (2, "D", t(4), 3, None, None),
            # k=4: insert
            (4, "U", t(2), 4, "dan", 400),
            # k=5: delete of a key not in the snapshot -> no row
            (5, "D", t(1), 5, None, None),
            # k=6: delete then reinsert (same ts, tiebreak orders them)
            (6, "D", t(7), 6, None, None),
            (6, "U", t(7), 7, "eve", 600),
            # k=7: insert then delete -> gone
            (7, "U", t(3), 8, "fox", 700),
            (7, "D", t(8), 9, None, None),
        ],
        "k long, op string, ts timestamp, seq long, name string, v long",
    )
    got = sorted(
        tuple(r)
        for r in merge_apply_changes(
            snap, changes, key="k", cols=("name", "v"),
            ts="ts", tiebreak=("seq",),
        ).collect()
    )
    assert got == [
        (1, "ann3", 120),   # latest update won
        (3, "cat", 300),    # untouched pass-through
        (4, "dan", 400),    # insert
        (6, "eve", 600),    # delete-then-reinsert survives
    ]


def test_cdc_merge_rejects_unknown_op(spark):
    """A typo'd op value ('u', 'I') must fail the job loudly instead
    of winning the election and silently deleting the key (r16
    ADVICE): the check rides IN the plan via raise_error, so it stays
    lazy and distributed."""
    import datetime as dt

    import pytest
    from py4j.protocol import Py4JJavaError

    from hadoop_20_warehouse_spark.operators.cdc import merge_apply_changes

    snap = spark.createDataFrame(
        [(1, "ann", 100)], "k long, name string, v long"
    )
    changes = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 5), 1, "ann2", 110)],
        "k long, op string, ts timestamp, seq long, name string, v long",
    )
    out = merge_apply_changes(
        snap, changes, key="k", cols=("name", "v"),
        ts="ts", tiebreak=("seq",),
    )
    with pytest.raises(Exception, match="merge_apply_changes.*got u") as ei:
        out.collect()
    assert isinstance(ei.value, Py4JJavaError) or "USER_RAISED" in str(
        ei.value
    )
