"""External-process operators — the Hadoop Streaming contract
(SURVEY.md §2.8/§3.2).

The reference forks the user command per task and speaks a
tab-separated stdin/stdout protocol (contrib/streaming:
PipeMapRed.java:48 process setup; key/value split on the configured
separator and ``stream.num.map.output.key.fields``,
PipeMapper.java:75, PipeMapRed.java:341-346; reducers see the
sorted, grouped stream, PipeReducer.reduce:81).

Spark analog:
- ``pipe_map``: ``rdd.pipe(cmd)`` over serialized lines — one process
  per partition, streamed through stdin/stdout exactly like a map-side
  Streaming task.
- ``pipe_reduce``: repartition by key + sortWithinPartitions *then*
  pipe — reproducing the reduce-side contract (each process sees every
  line of a key consecutively, keys sorted within its partition).

Scale: the external process is per-partition (thousands run in
parallel across executors); partition sizing governs memory. This is
the one operator family that is legitimately RDD-based — the data must
leave the JVM by definition. Output re-enters as a line DataFrame for
further relational processing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _to_lines(df: DataFrame, separator: str) -> DataFrame:
    """Serialize all columns to one tab(-like) separated line column —
    the Streaming wire format (``key<SEP>value`` generalized to n
    columns; nulls become empty fields, PipeMapRed's convention)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    return df.select(F.concat_ws(separator, *cols).alias("line"))


def pipe_map(
    df: DataFrame,
    cmd: str,
    separator: str = "\t",
) -> DataFrame:
    """Map-side pipe: serialize rows to lines, stream through ``cmd``,
    return DataFrame[line string] of the process stdout."""
    spark = df.sparkSession
    lines = _to_lines(df, separator)
    piped = lines.rdd.map(lambda r: r["line"]).pipe(cmd)
    return spark.createDataFrame(piped.map(lambda s: (s,)), "line string")


def pipe_reduce(
    df: DataFrame,
    cmd: str,
    key_cols: list[str],
    sort_cols: list[str] | None = None,
    separator: str = "\t",
    num_partitions: int | None = None,
) -> DataFrame:
    """Reduce-side pipe: co-locate and sort by key first so ``cmd``
    sees the reference's reducer contract (grouped, sorted stdin)."""
    spark = df.sparkSession
    parted = df.repartition(num_partitions, *key_cols) if num_partitions else df.repartition(*key_cols)
    sorted_df = parted.sortWithinPartitions(*key_cols, *(sort_cols or []))
    lines = _to_lines(sorted_df, separator)
    piped = lines.rdd.map(lambda r: r["line"]).pipe(cmd)
    return spark.createDataFrame(piped.map(lambda s: (s,)), "line string")


def split_kv(
    lines: DataFrame,
    separator: str = "\t",
    num_key_fields: int = 1,
) -> DataFrame:
    """Split piped output lines back into (key, value) — the
    ``stream.num.map.output.key.fields`` rule (PipeMapRed.java:341-346):
    first N fields are the key, the rest the value."""
    import re

    arr = F.split(F.col("line"), re.escape(separator))
    key = F.concat_ws(separator, *[F.element_at(arr, i + 1) for i in range(num_key_fields)])
    value = F.array_join(
        F.slice(arr, num_key_fields + 1, F.greatest(F.size(arr) - num_key_fields, F.lit(0))),
        separator,
    )
    return lines.select(key.alias("key"), value.alias("value"))
