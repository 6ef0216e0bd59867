"""Streaming operators: event-time windows, watermarks, dedup.

The reference is batch-only (SURVEY.md §1.5/§2.9 — logs arrived via
external copiers and every job read files). These operators are the
Structured-Streaming extension BASELINE.json's north star asks for,
built so that THE SAME function works on a batch DataFrame and on a
streaming DataFrame (Spark's unified API): pass a batch frame and you
get the deterministic batch answer the DuckDB oracle checks; pass a
``readStream`` frame and the identical plan runs incrementally with
watermark-bounded state.

State-at-scale notes:
- Watermarks bound the window/dedup state store; without them a 100 TB
  stream accumulates state forever. Every streaming entry point takes
  ``watermark`` and applies it only when the frame is streaming.
- Tumbling/sliding use ``window()`` (epoch-aligned buckets); session
  windows use ``session_window()`` (gap-merged, per-key state).
- ``dedup_events`` on a stream is ``dropDuplicates`` within the
  watermark horizon — the batch equivalent elects the first row per
  key by (event time, tiebreak) so it is deterministic and
  oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"  # µs precision, matches DuckDB %f


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    duration: str = "1 hour",
    watermark: str | None = "2 hours",
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling-window counts (+ optional exact decimal value sum) per
    key. Output: key cols, window_start (string), n_events[, value_sum]."""
    df = _maybe_watermark(df, ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("value_sum"))
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *key_cols)
        .agg(*aggs)
        .select(
            *key_cols,
            F.date_format("w.start", TS_FMT).alias("window_start"),
            *[F.col(a) for a in (["n_events"] + (["value_sum"] if value_col else []))],
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Sliding-window counts: each event lands in duration/slide
    windows. Epoch-aligned starts, same grid as the oracle's
    time_bucket arithmetic."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.date_format("w.start", TS_FMT).alias("window_start"),
            F.col("n_events"),
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Gap-based session windows per key (session_window — merged while
    consecutive events are < gap apart; session end = last event + gap).
    Output: key cols, session_start, session_end (strings), n_events.
    """
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.date_format("w.start", TS_FMT).alias("session_start"),
            F.date_format("w.end", TS_FMT).alias("session_end"),
            F.col("n_events"),
        )
    )


def session_windows_sql(
    table: str, ts_col: str, key_cols: list[str], gap_minutes: int = 30
) -> str:
    """DuckDB oracle for ``session_windows``: gaps-and-islands — a new
    session starts when the gap from the previous event (same keys)
    is >= gap; session end = last event + gap (Spark's convention)."""
    keys = ", ".join(key_cols)
    return f"""
WITH marked AS (
  SELECT {keys}, {ts_col} AS ts,
         CASE WHEN {ts_col} - LAG({ts_col}) OVER (PARTITION BY {keys} ORDER BY {ts_col})
                   < INTERVAL {gap_minutes} MINUTE THEN 0 ELSE 1 END AS new_session
  FROM {table}
),
islands AS (
  SELECT {keys}, ts,
         SUM(new_session) OVER (PARTITION BY {keys} ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT {keys},
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL {gap_minutes} MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events
FROM islands
GROUP BY {keys}, session_id
""".strip()


def dedup_events(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str | None = "2 hours",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Event dedup by key.

    Streaming: ``dropDuplicates`` within the watermark horizon (state
    bounded by the watermark). Batch: deterministic first-row election
    by (event time, tiebreaks) so the result is oracle-checkable —
    streaming dropDuplicates keeps the first *arrival*, which a batch
    oracle cannot reproduce; we document the difference here.
    """
    if df.isStreaming:
        df = _maybe_watermark(df, ts_col, watermark)
        return df.dropDuplicates(key_cols)
    order = [F.asc(ts_col)] + [F.asc(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
