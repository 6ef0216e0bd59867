"""Join operators + the composite join-expression language (SURVEY.md §2.4).

The reference ships two join frameworks:

1. **Map-side merge join** (mapred/join/CompositeInputFormat.java:48):
   an n-ary equi-join over co-sorted, identically-partitioned sources,
   declared in a tiny expression language
   ``expr ::= func(expr[,expr]) | tbl(class,"path")`` with functions
   ``inner``, ``outer``, ``override`` (ops registered at
   CompositeInputFormat.java:82-85; parser join/Parser.java:64).
2. **Reduce-side join** (contrib/data_join/.../DataJoinReducerBase.java:47):
   tag-by-source, regroup per key, user ``combine`` over the cross
   product — the generic shuffle join.

Spark's sort-merge / broadcast-hash joins subsume both physical
strategies; what we preserve is the *semantics* and the expression
language:

- ``inner(a, b, ...)``  → n-ary inner equi-join; duplicate keys produce
  the cross product per key (InnerJoinRecordReader.java:41 via
  JoinCollector, CompositeRecordReader.java:149).
- ``outer(a, b, ...)``  → n-ary **full outer**; sources missing a key
  contribute empty (NULL) slots (OuterJoinRecordReader.java:41,
  TupleWritable empty slots).
- ``override(a, b, ...)`` → per-key priority coalesce: emit the value
  stream of the **rightmost** source holding the key, with its full
  duplicate multiplicity (OverrideRecordReader.java:36,49-60).
- ``multifilter(a, b, ...)`` → the outer-join tuple stream collapsed
  to ONE value per tuple by an emit function over same-class child
  values (MultiFilterRecordReader.java:36-101, the base of the
  filter-join family registered at CompositeInputFormat.java:82-85).

``compose_join`` evaluates a parsed expression over named DataFrames.
Each source frame must have the join key column ``key_col`` plus value
columns; output carries each source's value columns suffixed by its
source name.

Scale notes: the reference demanded pre-sorted co-partitioned inputs so
the join could stream map-side. In Spark, bucketed tables give the same
no-shuffle sort-merge join; otherwise Catalyst picks SMJ (shuffle both
sides) or broadcast-hash (small side < threshold / hinted). ``override``
is implemented as union + per-key max-source filter — one shuffle, no
join at all, and the window is computed with ``max() over (partition by
key)`` which AQE handles under skew.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast  # re-export for callers

__all__ = [
    "JoinExpr",
    "Tbl",
    "Func",
    "parse_join_expr",
    "compose_join",
    "override_join",
    "multifilter_join",
    "semi_join",
    "anti_join",
    "broadcast",
]


# ---------------------------------------------------------------------------
# Expression language


@dataclass(frozen=True)
class Tbl:
    """Leaf: a named source — ``tbl(format, "path")`` in the reference
    grammar (CompositeInputFormat.java:61-63). Here the identifier
    resolves against the ``sources`` dict passed to ``compose_join``."""

    name: str


@dataclass(frozen=True)
class Func:
    """Interior node: inner/outer/override over child expressions."""

    op: str  # 'inner' | 'outer' | 'override'
    children: tuple["JoinExpr", ...]


JoinExpr = Tbl | Func

_TOKEN = re.compile(r'\s*(?:(inner|outer|override|multifilter|tbl)\s*\(|(\))|(,)|"([^"]*)"|([A-Za-z_][A-Za-z0-9_.]*))')


def parse_join_expr(expr: str) -> JoinExpr:
    """Parse the composite join expression language.

    Accepts both the reference's leaf form ``tbl(cls, "name")`` (the
    class token is ignored — Spark infers schema) and a bare identifier
    shorthand, e.g. ``inner(orders, override(c1, c2))``.

    Reference grammar: CompositeInputFormat.java:61-63; shift-reduce
    parser at join/Parser.java:64 (ours is recursive-descent — the
    grammar is LL(1)).
    """
    pos = 0

    def error(msg: str) -> ValueError:
        return ValueError(f"join expr parse error at {pos}: {msg} in {expr!r}")

    def parse() -> JoinExpr:
        nonlocal pos
        m = _TOKEN.match(expr, pos)
        if not m:
            raise error("expected expression")
        func, rparen, comma, _qstr, ident = m.groups()
        if func == "tbl":
            pos = m.end()
            # tbl(ClassName, "name") — take the quoted string as name
            inner = []
            while True:
                m2 = _TOKEN.match(expr, pos)
                if not m2:
                    raise error("unterminated tbl()")
                pos = m2.end()
                if m2.group(2):  # ')'
                    break
                if m2.group(4) is not None:
                    inner.append(m2.group(4))
                elif m2.group(5):
                    inner.append(m2.group(5))
            if not inner:
                raise error("tbl() needs a name")
            return Tbl(inner[-1].strip("/").split("/")[-1])
        if func:  # inner/outer/override(
            pos = m.end()
            children: list[JoinExpr] = [parse()]
            while True:
                m2 = _TOKEN.match(expr, pos)
                if not m2:
                    raise error("expected ',' or ')'")
                if m2.group(3):  # ','
                    pos = m2.end()
                    children.append(parse())
                elif m2.group(2):  # ')'
                    pos = m2.end()
                    return Func(func, tuple(children))
                else:
                    raise error("expected ',' or ')'")
        if ident:
            pos = m.end()
            return Tbl(ident)
        raise error("unexpected token")

    result = parse()
    if _TOKEN.match(expr, pos) and expr[pos:].strip():
        raise error("trailing input")
    return result


# ---------------------------------------------------------------------------
# Evaluation


def _leaf_frame(df: DataFrame, name: str, key_col: str) -> DataFrame:
    """Suffix every non-key column with the source name so n-ary joins
    don't collide — the positional-slot analog of TupleWritable."""
    cols = [F.col(key_col)] + [
        F.col(c).alias(f"{c}_{name}") for c in df.columns if c != key_col
    ]
    return df.select(*cols)


def compose_join(
    expr: JoinExpr | str,
    sources: dict[str, DataFrame],
    key_col: str = "key",
) -> DataFrame:
    """Evaluate a join expression over named sources.

    Each source must contain ``key_col``. Output: ``key_col`` plus each
    source's value columns suffixed ``_sourcename`` (NULL-filled where a
    full-outer slot is empty, matching TupleWritable empty slots).
    """
    if isinstance(expr, str):
        expr = parse_join_expr(expr)

    def ev(node: JoinExpr) -> DataFrame:
        if isinstance(node, Tbl):
            if node.name not in sources:
                raise KeyError(f"unknown source {node.name!r}; have {sorted(sources)}")
            return _leaf_frame(sources[node.name], node.name, key_col)
        how = {"inner": "inner", "outer": "full_outer"}.get(node.op)
        children = [ev(c) for c in node.children]
        if node.op == "override":
            return _override_frames(children, key_col)
        if node.op == "multifilter":
            return _multifilter_frames(children, key_col)
        out = children[0]
        for child in children[1:]:
            out = out.join(child, on=key_col, how=how)
        return out

    return ev(expr)


def _override_frames(frames: list[DataFrame], key_col: str) -> DataFrame:
    """Rightmost-source-wins with full duplicate multiplicity.

    OverrideRecordReader.java:49-60 emits, per key, every value of the
    highest-priority (rightmost) source that has the key. Implemented as
    union(+source ordinal) → per-key max ordinal → keep matching rows:
    one shuffle, preserves multiplicity, no join.
    """
    tagged = []
    all_value_cols: list[str] = []
    for i, f in enumerate(frames):
        vcols = [c for c in f.columns if c != key_col]
        all_value_cols.extend(c for c in vcols if c not in all_value_cols)
        tagged.append((i, f, vcols))
    union = None
    for i, f, vcols in tagged:
        aligned = f.select(
            F.col(key_col),
            F.lit(i).alias("_src"),
            *[
                (F.col(c) if c in vcols else F.lit(None)).alias(c)
                for c in all_value_cols
            ],
        )
        union = aligned if union is None else union.unionByName(aligned)
    w = Window.partitionBy(key_col)
    return (
        union.withColumn("_max_src", F.max("_src").over(w))
        .filter(F.col("_src") == F.col("_max_src"))
        .drop("_src", "_max_src")
    )


def override_join(frames: list[DataFrame], key_col: str = "key") -> DataFrame:
    """Public entry for the override (priority-coalesce) join."""
    leafed = [_leaf_frame(f, str(i), key_col) for i, f in enumerate(frames)]
    return _override_frames(leafed, key_col)


def _multifilter_frames(frames: list[DataFrame], key_col: str, emit=None) -> DataFrame:
    """MultiFilter join core over already-leafed frames: the full-outer
    composite tuple stream collapsed to ONE value per tuple.

    Mirrors MultiFilterRecordReader.java:36-87 — the JoinCollector's
    outer join of the child readers feeds ``emit(tuple)`` which returns
    a single value "typically one of the values in the tuple"
    (MultiFilterRecordReader.java:50-56); child value classes must
    agree (createValue check, MultiFilterRecordReader.java:92-101).
    Default emit is leftmost-non-null (COALESCE); tuples whose emitted
    value is NULL are dropped. Physically this is n-1 full-outer
    equi-joins plus a projection — no extra shuffle beyond the joins,
    and duplicate keys keep their full cross-product multiplicity.
    """
    slots = []
    out_name: str | None = None
    out_type = None
    narrowed = []
    for i, f in enumerate(frames):
        vcols = [c for c in f.columns if c != key_col]
        if len(vcols) != 1:
            raise ValueError(
                f"multifilter child {i} must expose exactly one value column "
                f"(got {vcols}) — MultiFilterRecordReader children share a "
                "single value class"
            )
        vtype = f.schema[vcols[0]].dataType
        if out_name is None:
            out_name, out_type = vcols[0], vtype
        elif vtype != out_type:
            raise TypeError(
                f"multifilter child value classes disagree: {out_type} vs "
                f"{vtype} (MultiFilterRecordReader.java:95-99 ClassCastException)"
            )
        narrowed.append(
            f.select(F.col(key_col), F.col(vcols[0]).alias(f"__mfv{i}"))
        )
        slots.append(F.col(f"__mfv{i}"))
    joined = narrowed[0]
    for f in narrowed[1:]:
        joined = joined.join(f, on=key_col, how="full_outer")
    value = (emit or (lambda s: F.coalesce(*s)))(slots)
    return joined.select(F.col(key_col), value.alias(out_name)).filter(
        F.col(out_name).isNotNull()
    )


def multifilter_join(
    frames: list[DataFrame], key_col: str = "key", emit=None
) -> DataFrame:
    """Public entry for the MultiFilter composite join: each frame is
    (key, single value column of one agreed type); output one emitted
    value per outer-join tuple. ``emit`` takes the list of slot Columns
    and returns one Column (default COALESCE — leftmost non-null)."""
    return _multifilter_frames(list(frames), key_col, emit)


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """EXISTS — not a named reference operator (expressible via
    data_join presence filter, SURVEY.md §2.4 'not present'); native in
    Spark, broadcast-friendly."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """NOT EXISTS — complement of ``semi_join``."""
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_left: str,
    ts_right: str,
    right_tiebreak: str,
    right_suffix: str = "_asof",
) -> DataFrame:
    """As-of (backward) join: attach to every left row the most recent
    right row with the same keys and ``ts_right <= ts_left`` (NULLs if
    none). Ties on timestamp resolve to the largest ``right_tiebreak``.

    Not a join at all physically — the union+window construction: tag
    both sides, union, one shuffle on the keys, per-key time-sorted
    window carrying the last right ROW forward (packed as one struct so
    the attached values are row-atomic — a genuine NULL in a right
    payload column stays NULL, never backfilled from an older right
    row), keep left rows. Shuffle volume is |L|+|R| rows and there is
    no range-join blowup, which is the 100 TB difference vs a band
    join + rank (the reference had no as-of operator; public pattern,
    e.g. pandas merge_asof semantics).
    """
    rcols = [c for c in right.columns if c not in on and c != ts_right]
    rstruct_fields = rcols + [ts_right]
    rstruct_type = F.struct(
        *[F.col(c) for c in rstruct_fields]
    )
    lrows = left.select(
        *[F.col(k) for k in on],
        F.col(ts_left).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[right_tiebreak].dataType).alias("__tb"),
        *[F.col(c) for c in left.columns if c not in on],
    )
    rrows = right.select(
        *[F.col(k) for k in on],
        F.col(ts_right).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(right_tiebreak).alias("__tb"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
        rstruct_type.alias("__rrow"),
    )
    lrows = lrows.withColumn(
        "__rrow", F.lit(None).cast(rrows.schema["__rrow"].dataType)
    )
    union = lrows.unionByName(rrows)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__tag"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = union.select(
        *on,
        "__tag",
        *[F.col(c) for c in left.columns if c not in on],
        F.last(F.col("__rrow"), ignorenulls=True).over(w).alias("__carried"),
    )
    return (
        carried.filter(F.col("__tag") == 1)
        .select(
            *on,
            *[F.col(c) for c in left.columns if c not in on],
            *[
                F.col(f"__carried.{c}").alias(f"{c}{right_suffix}")
                for c in rstruct_fields
            ],
        )
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_left: str,
    ts_right: str,
    band_us: int,
    right_suffix: str = "_r",
) -> DataFrame:
    """Range (band) join: pairs with the same keys whose timestamps
    differ by at most ``band_us`` microseconds.

    Never a theta join: each left row is replicated into its bucket and
    the two adjacent buckets (bucket width = band), the join is an
    EQUI-join on (keys, bucket), and the exact band predicate filters
    the candidates. Shuffle volume 3|L|+|R| rows instead of the
    |L|x|R| cross product a naive range condition scans — the same
    bucket-candidate-verify shape as the LSH dedup operators, applied
    to time. Skewed (key, bucket) cells are split by AQE.
    """
    lb = F.floor(F.unix_micros(F.col(ts_left)) / F.lit(band_us))
    rb = F.floor(F.unix_micros(F.col(ts_right)) / F.lit(band_us))
    l = left.withColumn(
        "__bucket", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in on],
        rb.alias("__rbucket"),
        *[
            F.col(c).alias(f"{c}{right_suffix}")
            for c in right.columns
            if c not in on
        ],
    )
    cond = [F.col(k) == F.col(f"__rk_{k}") for k in on] + [
        F.col("__bucket") == F.col("__rbucket")
    ]
    tl = F.unix_micros(F.col(ts_left))
    tr = F.unix_micros(F.col(f"{ts_right}{right_suffix}"))
    return (
        l.join(r, cond)
        .filter(F.abs(tl - tr) <= band_us)
        .drop("__bucket", "__rbucket", *[f"__rk_{k}" for k in on])
    )
