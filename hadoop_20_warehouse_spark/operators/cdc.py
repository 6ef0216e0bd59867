"""Change-data-capture merge: MERGE INTO semantics as one keyed pass.

The reference's only table-maintenance story is DBOutputFormat's
replace-the-table round-trip (examples/DBCountPageView.java:79-80 —
drop and rewrite); a production warehouse instead applies a CHANGE LOG
to a snapshot: latest change per key wins, an upsert replaces the
row, a delete removes it, untouched keys pass through byte-for-byte.
That is ANSI ``MERGE INTO`` (and the Delta/Iceberg/Hudi upsert path),
re-expressed Spark-first:

- **one partial-aggregable pass** elects each key's winning change —
  ``max(struct(ts, *tiebreak, op, payload))`` combines map-side, so a
  key with a million change rows ships ONE row per partition to the
  shuffle (the hot-key story at 100 TB: a bot account's churn does
  not become a reducer straggler);
- **one anti join** splits untouched snapshot rows (the changed-key
  set is a distinct projection of the delta — broadcastable whenever
  the delta is day-sized);
- **one union** of pass-through + surviving upserts.

Cost is proportional to the DELTA (plus one snapshot anti-join scan),
never to a rebuild — scd2_apply_delta's economics for CURRENT-state
tables (scd.py keeps history; this keeps only the latest row).

Delete-then-reinsert within one batch resolves by (ts, *tiebreak)
order, exactly as sequential MERGE statements would.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UPSERT = "U"
DELETE = "D"


def merge_apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    cols: Sequence[str],
    op_col: str = "op",
    ts: str = "ts",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Apply a CDC log to a snapshot → the new snapshot
    (key, *cols).

    ``snapshot``: current state, one row per key.  ``changes``: the
    log — (key, op, ts, *tiebreak, *cols) with op ``'U'`` (upsert:
    insert or full-row update) or ``'D'`` (delete).  Per key the
    change with the greatest (ts, *tiebreak) wins; ties are the
    caller's responsibility to make impossible via ``tiebreak``
    (event id, log offset).  A winning 'U' replaces (or inserts) the
    key's row; a winning 'D' removes it even if the key was never in
    the snapshot.

    Op values are validated IN the plan: anything outside
    {'U', 'D'} (a typo'd 'u', an 'I' from an insert-flavored log)
    would otherwise win the per-key election and then be filtered out
    of the upsert branch — silently deleting the key (r16 ADVICE).
    ``raise_error`` keeps the check lazy and distributed; the job
    fails loudly naming the bad value instead."""
    op_checked = F.when(
        F.col(op_col).isin(UPSERT, DELETE), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"merge_apply_changes: {op_col} must be "
                    f"'{UPSERT}' or '{DELETE}', got "
                ),
                F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    payload = F.struct(
        F.col(ts),
        *[F.col(c) for c in tiebreak],
        op_checked.alias("_op"),
        *[F.col(c).alias(f"_v_{c}") for c in cols],
    )
    winners = changes.groupBy(key).agg(F.max(payload).alias("_w"))
    changed_keys = winners.select(key)
    untouched = snapshot.join(changed_keys, on=key, how="left_anti").select(
        key, *cols
    )
    applied = winners.filter(F.col("_w._op") == UPSERT).select(
        key, *[F.col(f"_w._v_{c}").alias(c) for c in cols]
    )
    return untouched.unionByName(applied)


def merge_sql(
    snapshot_cte: str,
    changes_cte: str,
    key: str,
    cols: Sequence[str],
    op_col: str = "op",
    ts: str = "ts",
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB oracle for :func:`merge_apply_changes`: the same
    latest-wins election as a ROW_NUMBER window over (ts, *tiebreak)
    DESC.  ``snapshot_cte``/``changes_cte`` must define ``snapshot``
    and ``changes`` with the declared columns."""
    clist = ", ".join(cols)
    order = ", ".join(
        f"{c} DESC" for c in (ts, *tiebreak)
    )
    return f"""
WITH {snapshot_cte},
{changes_cte},
ranked AS (
  SELECT {key}, {op_col} AS _op, {clist},
         ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY {order}) AS _rn
  FROM changes
),
winners AS (SELECT * FROM ranked WHERE _rn = 1)
SELECT s.{key}, {", ".join(f"s.{c}" for c in cols)}
FROM snapshot s LEFT JOIN winners w ON w.{key} = s.{key}
WHERE w.{key} IS NULL
UNION ALL
SELECT {key}, {clist} FROM winners WHERE _op = '{UPSERT}'
""".strip()
