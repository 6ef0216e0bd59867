"""Projection / filter / per-row transform operators (SURVEY.md §2.3).

Re-expresses the reference's row-transform mappers as DataFrame
expressions:

- ``FieldSelectionMapReduce`` (mapred/lib/FieldSelectionMapReduce.java:64):
  cut(1)-style field projection with a spec language — ``parse_field_spec``
  + ``field_select``.
- ``RegexMapper`` (mapred/lib/RegexMapper.java:35): emit one row per
  regex match — ``regex_matches``.
- ``TokenCountMapper`` (mapred/lib/TokenCountMapper.java:38): tokenize →
  one row per token — ``tokenize``.
- ``InverseMapper`` (mapred/lib/InverseMapper.java:33): trivially
  ``df.select(v, k)``; no helper needed.
- Grep pipeline (examples/Grep.java:48-84): ``grep_count`` composes
  regex_matches → groupBy → count → sort desc.

All pure JVM-side expressions — no Python UDFs — so they stay inside
whole-stage codegen at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldSpec:
    """Parsed form of a FieldSelection spec.

    The reference grammar (FieldSelectionMapReduce.java:64-120):
    comma-separated field ids, where a trailing ``n-`` means "field n
    through the last field". Example specs: ``"3,0,2"``, ``"0-"``,
    ``"1,3-"``. Field ids are 0-based, matching the reference.
    """

    fields: tuple[int, ...]  # explicit single fields, in output order
    open_range_from: int | None  # n for a trailing "n-" (to end of row)


def parse_field_spec(spec: str) -> FieldSpec:
    """Parse ``"3,0,2"`` / ``"0-"`` / ``"1,3-"`` specs.

    Mirrors FieldSelectionMapReduce.parseOutputKeyValueSpec
    (FieldSelectionMapReduce.java:94-120): any number of single fields,
    optionally ending with one open range ``n-``.
    """
    fields: list[int] = []
    open_from: int | None = None
    spec = spec.strip()
    if not spec:
        return FieldSpec((), None)
    for i, part in enumerate(p.strip() for p in spec.split(",")):
        if part.endswith("-"):
            if open_from is not None:
                raise ValueError(f"only one open range allowed: {spec!r}")
            open_from = int(part[:-1]) if part[:-1] else 0
        elif part:
            if open_from is not None:
                raise ValueError(f"open range must be last: {spec!r}")
            fields.append(int(part))
    return FieldSpec(tuple(fields), open_from)


def _spec_expr(arr: Column, spec: FieldSpec, sep: str) -> Column:
    """Build the projected string for one spec over a split-array column."""
    parts: list[Column] = [F.element_at(arr, f + 1) for f in spec.fields]
    if spec.open_range_from is not None:
        n = spec.open_range_from
        tail = F.slice(arr, n + 1, F.greatest(F.size(arr) - n, F.lit(0)))
        parts.append(F.array_join(tail, sep))
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        return F.coalesce(parts[0], F.lit(""))
    return F.concat_ws(sep, *[F.coalesce(p, F.lit("")) for p in parts])


def field_select(
    df: DataFrame,
    line_col: str,
    key_value_spec: str,
    separator: str = "\t",
) -> DataFrame:
    """FieldSelectionMapReduce analog: split ``line_col`` on
    ``separator``, project per the ``keyspec:valuespec`` string into
    string columns ``key`` and ``value``.

    Reference: mapred/lib/FieldSelectionMapReduce.java:64 (spec in
    ``map.output.key.value.fields.spec``, e.g. ``"3,0,2:0-"``;
    separator in ``mapred.data.field.separator``).
    """
    if ":" in key_value_spec:
        key_spec_s, value_spec_s = key_value_spec.split(":", 1)
    else:
        key_spec_s, value_spec_s = key_value_spec, ""
    key_spec = parse_field_spec(key_spec_s)
    value_spec = parse_field_spec(value_spec_s)
    arr = F.split(F.col(line_col), _regex_escape(separator))
    return df.select(
        _spec_expr(arr, key_spec, separator).alias("key"),
        _spec_expr(arr, value_spec, separator).alias("value"),
    )


def _regex_escape(sep: str) -> str:
    """F.split takes a regex; escape a literal separator."""
    import re

    return re.escape(sep)


def tokenize(df: DataFrame, text_col: str, token_name: str = "token") -> DataFrame:
    """TokenCountMapper's tokenizer: whitespace split → one row per
    token, empty tokens dropped (mapred/lib/TokenCountMapper.java:38
    used Java StringTokenizer, which skips empty/whitespace runs).
    """
    tok = F.explode(F.split(F.col(text_col), r"\s+")).alias(token_name)
    return df.select(tok).filter(F.col(token_name) != "")


def regex_matches(df: DataFrame, text_col: str, pattern: str, group: int = 0) -> DataFrame:
    """RegexMapper analog (mapred/lib/RegexMapper.java:35): one output
    row per regex match in the input, selecting capture ``group``.
    """
    m = F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(group)))
    return df.select(m.alias("match"))


def grep_count(df: DataFrame, text_col: str, pattern: str, group: int = 0) -> DataFrame:
    """The Grep example's two-job pipeline (examples/Grep.java:48-84):
    job 1 = regex match count (map + combiner + LongSumReducer), job 2 =
    sort by count descending. Here it is one lazy plan; Catalyst gives
    the map-side partial aggregation the combiner provided.
    """
    return (
        regex_matches(df, text_col, pattern, group)
        .groupBy("match")
        .agg(F.count(F.lit(1)).alias("match_count"))
        .orderBy(F.desc("match_count"), F.asc("match"))
    )
