"""Slowly-changing-dimension (Type 2) build: change log → validity
intervals.

The reference's warehouse loads dimensions by full rewrite
(DBOutputFormat round-trips, examples/DBCountPageView.java's
replace-table shape); a production warehouse instead versions each
dimension row so facts can join AS OF their own timestamp.  That is
Kimball's SCD Type 2: every attribute change opens a new interval
``[valid_from, valid_to)`` and closes the previous one; the current
row has ``valid_to IS NULL``.  The interval table then serves either
a band join (operators/join.py:join_band) or the union+window as-of
join (join_asof) — this module builds the table those joins consume.

Scale: one window per step, all partitioned by the dimension KEY —
high-cardinality, never corpus-global; change collapse, interval
close, and version numbering ride the SAME key-partitioned sort, so
the whole build is ONE exchange on the key (Catalyst reuses the
partitioning across the three windows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key: str,
    attrs: Sequence[str],
    ts: str,
    tiebreak: Sequence[str] = (),
    keep_tiebreak: bool = False,
    keep_last_observed: bool = False,
) -> DataFrame:
    """(key, *attrs, valid_from, valid_to, is_current, version) — the
    Type-2 dimension table from a change log.  ``keep_tiebreak=True``
    appends the opening change's tiebreak columns to each interval
    row — required when the table will later feed
    :func:`scd2_apply_delta`, whose replay must re-order same-instant
    changes exactly as the original build did.
    ``keep_last_observed=True`` appends a ``last_observed`` column:
    the key's max raw ``ts`` across ALL its input rows, including
    consecutive confirmations the collapse drops.  It is what
    :func:`scd2_apply_delta`'s ``strict`` guard must compare deltas
    against — a delta between the last recorded CHANGE and a
    collapsed confirmation would silently lose the re-open the full
    log implies, and only the last OBSERVED ts can detect that.  The
    max rides the same key partitioning as the sequence windows (no
    extra exchange).

    ``changes``: one row per observed state (key, attrs..., ts).
    Consecutive observations with UNCHANGED attributes are collapsed
    (they confirm, not change, the state — re-emitting them would
    fragment intervals); a change row opens an interval at its ``ts``
    which the key's next change closes.  ``version`` numbers a key's
    intervals from 1 in time order; ``is_current`` marks the open one.

    Attribute comparison is null-safe (``<=>``): a NULL attribute is a
    real state, and NULL→value / value→NULL transitions are changes.

    ``tiebreak``: extra ordering columns after ``ts`` (e.g. an event
    id) — REQUIRED for determinism whenever one key can log two rows
    at the same timestamp; the last row in (ts, *tiebreak) order wins
    the state at that instant, mirroring log replay order.
    """
    order = [F.col(ts)] + [F.col(c) for c in tiebreak]
    w_seq = Window.partitionBy(key).orderBy(*order)
    state = F.struct(*[F.col(a) for a in attrs])
    # change detection: null-safe struct inequality vs the previous row
    marked = changes.withColumn("_prev", F.lag(state).over(w_seq)).withColumn(
        "_is_change",
        F.col("_prev").isNull() | ~state.eqNullSafe(F.col("_prev")),
    )
    if keep_last_observed:
        # whole-partition max over the PRE-collapse rows: same key
        # partitioning as w_seq, so Catalyst reuses the exchange
        marked = marked.withColumn(
            "last_observed", F.max(ts).over(Window.partitionBy(key))
        )
    last = ("last_observed",) if keep_last_observed else ()
    chg = marked.filter(F.col("_is_change")).select(
        key, *attrs, F.col(ts).alias("valid_from"), *tiebreak, *last
    )
    w_iv = Window.partitionBy(key).orderBy(
        "valid_from", *[F.col(c) for c in tiebreak]
    )
    return chg.select(
        key,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(w_iv).alias("valid_to"),
        F.lead("valid_from").over(w_iv).isNull().alias("is_current"),
        F.row_number().over(w_iv).cast("long").alias("version"),
        *(tiebreak if keep_tiebreak else ()),
        *last,
    )


def scd2_sql(
    changes_cte: str,
    key: str,
    attrs: Sequence[str],
    ts: str,
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB oracle for :func:`scd2_build` — the same three windows
    in ANSI SQL.  ``changes_cte`` must define ``changes`` with the
    key/attr/ts/tiebreak columns.  Null-safe comparison is spelled
    ``IS DISTINCT FROM`` (the ANSI twin of Spark's ``<=>``)."""
    alist = ", ".join(attrs)
    order = ", ".join([ts, *tiebreak])
    iv_order = ", ".join(["valid_from", *tiebreak])
    prev = ", ".join(
        f"LAG({a}) OVER (PARTITION BY {key} ORDER BY {order}) AS _p_{a}"
        for a in attrs
    )
    changed = " OR ".join(f"{a} IS DISTINCT FROM _p_{a}" for a in attrs)
    tb = ("".join(", " + c for c in tiebreak))
    return f"""
WITH {changes_cte},
marked AS (
  SELECT {key}, {alist}, {ts}{tb}, {prev},
         CAST(ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY {order}) AS BIGINT) AS _rn
  FROM changes
),
chg AS (
  SELECT {key}, {alist}, {ts} AS valid_from{tb}
  FROM marked WHERE _rn = 1 OR {changed}
)
SELECT {key}, {alist}, valid_from,
       LEAD(valid_from) OVER (PARTITION BY {key} ORDER BY {iv_order}) AS valid_to,
       (LEAD(valid_from) OVER (PARTITION BY {key} ORDER BY {iv_order}) IS NULL) AS is_current,
       CAST(ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY {iv_order}) AS BIGINT) AS version
FROM chg
""".strip()


def scd2_apply_delta(
    dim: DataFrame,
    delta: DataFrame,
    key: str,
    attrs: Sequence[str],
    ts: str,
    tiebreak: Sequence[str] = (),
    strict: bool = False,
) -> DataFrame:
    """Dimension MAINTENANCE: merge a new change batch into an
    existing Type-2 table without rebuilding untouched keys — close
    the affected keys' open intervals, append their new ones, renumber
    their versions; every other key's rows pass through byte-for-byte.
    Cost is proportional to the DELTA's key set, not the dimension
    (the incremental-curation economics, applied to dimensions).

    ``dim`` must carry the ``tiebreak`` columns (build it with
    ``scd2_build(..., keep_tiebreak=True)``): replay needs them to
    re-order same-instant changes exactly as the original build did.

    Correctness contract — APPEND-ONLY deltas: every delta row for a
    key must be at-or-after that key's last OBSERVED raw row (not
    merely its last recorded change: a delta landing between the last
    change and a collapsed later confirmation would silently lose the
    re-open the full log implies).  An out-of-order (backfill) delta
    row can un-collapse a confirmation the original build dropped,
    which no incremental scheme can recover from the collapsed table;
    backfills must rebuild their keys from the raw log.
    ``strict=True`` verifies the contract with one bounded aggregate
    (count of violating keys) and raises ValueError.  It REQUIRES the
    dim to carry ``last_observed`` (build with
    ``scd2_build(..., keep_last_observed=True)``): comparing against
    ``max(valid_from)`` alone cannot see collapsed confirmations, so
    a weaker check would pass deltas that yield silently wrong
    output.  The check costs one extra pass over dim+delta, so it is
    opt-in for pipelines whose upstream already guarantees ordering.

    Replaying a key's COLLAPSED rows plus an append-only delta equals
    rebuilding from its full raw log: collapse is idempotent on
    already-collapsed prefixes, and the only new adjacency is at the
    boundary (last state vs first delta row), which the replay's own
    collapse resolves.  The registered query's DuckDB oracle runs the
    FULL-log rebuild, so that equality is hash-checked, not argued.

    Shapes: one distinct on the delta keys (broadcast-joinable), one
    anti join to split untouched rows, one scd2_build over ONLY the
    affected keys' rows, one union."""
    has_observed = "last_observed" in dim.columns
    affected = delta.select(key).distinct()
    if strict:
        if not has_observed:
            raise ValueError(
                "scd2_apply_delta: strict=True requires the dim to "
                "carry last_observed (build with scd2_build(..., "
                "keep_last_observed=True)) — max(valid_from) cannot "
                "see collapsed confirmations, so checking against it "
                "would pass deltas that yield silently wrong output"
            )
        last_seen = dim.groupBy(key).agg(
            F.max("last_observed").alias("_last")
        )
        first_new = delta.groupBy(key).agg(F.min(ts).alias("_first"))
        bad = (
            first_new.join(last_seen, on=key)
            .filter(F.col("_first") < F.col("_last"))
            .count()
        )
        if bad:
            raise ValueError(
                f"scd2_apply_delta: {bad} key(s) have delta rows older "
                "than their last observed row — backfills must "
                "rebuild those keys from the raw log"
            )
    out_cols = [key, *attrs, "valid_from", "valid_to", "is_current",
                "version", *tiebreak]
    if has_observed:
        out_cols.append("last_observed")
    untouched = dim.join(affected, on=key, how="left_anti").select(*out_cols)
    replayed = (
        dim.join(affected, on=key, how="left_semi")
        .select(key, *attrs, F.col("valid_from").alias(ts), *tiebreak)
        .unionByName(delta.select(key, *attrs, ts, *tiebreak))
    )
    # When the dim carries last_observed, the rebuilt rows recompute
    # it over the replay (collapsed valid_froms ∪ delta ts).  Under
    # the append-only contract each affected key has a delta row at
    # or after its old last_observed, so max(replay ts) ≥ old
    # last_observed and the recomputed value is exact.
    rebuilt = scd2_build(
        replayed, key=key, attrs=attrs, ts=ts, tiebreak=tiebreak,
        keep_tiebreak=True, keep_last_observed=has_observed,
    ).select(*out_cols)
    return untouched.unionByName(rebuilt)
