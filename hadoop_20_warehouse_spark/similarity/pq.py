"""Product quantization (PQ) — the compression layer of billion-scale
ANN (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI 2011).

A d-dim float vector is split into ``m`` subvectors; each subspace has
its own k-entry codebook, and a vector is stored as m code bytes —
64 floats (256 B) become 8 bytes at m=8/k≤256, a 32x compression that
is what makes exhaustive scans of billion-vector corpora feasible.
Search uses ADC (asymmetric distance computation): the query stays
exact, a per-query m×k lookup table of query-to-code distances is
built once, and each stored vector's distance is m table lookups — no
float math per candidate.

Spark shape (100 TB posture):
- the codebook is O(m·k) — ONE broadcast row of nested arrays;
- encode is a row-local projection (argmin over k codes per subspace,
  inside whole-stage-codegen'd HOFs) — no shuffle;
- the ADC scan is row-local lookups + one global top-k (TakeOrdered:
  per-partition partial top-k, k-row shuffle).

Cross-engine determinism (the repo's oracle discipline): codebooks are
SAMPLED, not trained — code j of every subspace is the j-th corpus
vector under (md5(id), id) order (same seed set as ivf.centroids), so
both engines derive identical codebooks; all distances are squared-L2
rounded to integer MICRO-units (×1e6) so argmins tie-break identically
and ADC sums are order-independent integer adds.  A Lloyd-trained
codebook (train per subspace on a corpus sample) plugs into the same
encode/scan unchanged — the sampled one is the bit-reproducible
default, the same trade ivf.train_centroids documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_M = 8
DEFAULT_K = 16


def _sqdist_u_sql_spark(a: str, b: str) -> str:
    """Squared L2 between two array slices, in integer micro-units —
    Spark SQL expression text (used inside HOF lambdas)."""
    return (
        f"cast(round(aggregate(zip_with({a}, {b}, "
        "(x, y) -> (cast(x as double) - cast(y as double)) * "
        "(cast(x as double) - cast(y as double))), "
        "cast(0.0 as double), (acc, v) -> acc + v) * 1000000) as bigint)"
    )


def pq_codebook(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """ONE-row codebook frame: ``cb`` = array over subspaces s∈[0,m)
    of arrays over codes j∈[0,k) of the j-th seed vector's s-th
    subvector.  Seeds are the k corpus vectors with smallest
    (md5(id), id) — deterministic, O(k) rows via partial top-k."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    seeds = (
        corpus.select(
            F.col(vec_col).alias("sv"),
            F.md5(F.col(id_col).cast("string")).alias("h"),
            F.col(id_col).alias("sid"),
        )
        .orderBy("h", "sid")
        .limit(k)
    )
    # j = seed ordinal under the same (h, sid) order; k rows → window ok
    from pyspark.sql import Window

    seeds = seeds.withColumn(
        "j",
        F.row_number().over(Window.orderBy("h", "sid")) - 1,
    )
    # fold k rows into the nested array: cb[s][j] = slice(seed_j, s)
    return seeds.agg(
        F.array_sort(F.collect_list(F.struct("j", "sv"))).alias("js")
    ).select(
        F.expr(
            f"transform(sequence(0, {m - 1}), s -> "
            f"transform(js, e -> slice(e.sv, s * {sub} + 1, {sub})))"
        ).alias("cb")
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = DEFAULT_M,
    dim: int = 64,
) -> DataFrame:
    """(id, codes array<int>) — row-local encode: each subspace takes
    the argmin over its k codes by micro-unit squared-L2, tie-broken
    on the smaller code (min of (dist_u, j) structs)."""
    sub = dim // m
    d = _sqdist_u_sql_spark(f"slice({vec_col}, s * {sub} + 1, {sub})", "cb[s][j]")
    codes = F.expr(
        f"transform(sequence(0, {m - 1}), s -> "
        f"array_min(transform(sequence(0, size(cb[s]) - 1), j -> "
        f"struct({d} as du, j as code))).code)"
    )
    return corpus.crossJoin(F.broadcast(codebook)).select(
        F.col(id_col), codes.alias("codes")
    )


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    qvec_col: str = "qv",
    topk: int = 20,
    m: int = DEFAULT_M,
    dim: int = 64,
) -> DataFrame:
    """(vec_id, codes_str, adc_u, rank) — ADC scan: the one-row query
    frame joins the one-row codebook to build the m×k lookup table
    (micro-unit squared-L2 of each code to the query's subvector),
    then every stored vector's distance is m integer lookups summed —
    order-independent, no float math per candidate.  Global top-k is
    TakeOrdered (partial per-partition top-k)."""
    sub = dim // m
    d = _sqdist_u_sql_spark(f"slice({qvec_col}, s * {sub} + 1, {sub})", "cv")
    lut = query.crossJoin(F.broadcast(codebook)).select(
        F.expr(
            f"transform(sequence(0, {m - 1}), s -> "
            f"transform(cb[s], cv -> {d}))"
        ).alias("lut")
    )
    scored = codes.crossJoin(F.broadcast(lut)).select(
        F.col(id_col),
        F.expr("array_join(transform(codes, c -> cast(c as string)), '-')").alias("codes_str"),
        F.expr(
            f"aggregate(sequence(0, {m - 1}), cast(0 as bigint), "
            "(acc, s) -> acc + lut[s][codes[s]])"
        ).alias("adc_u"),
    )
    from pyspark.sql import Window

    # global top-k FIRST via TakeOrdered (per-partition partial top-k,
    # k-row shuffle), then rank the k survivors — never a row_number
    # window over the whole corpus in one partition
    top = scored.orderBy(F.col("adc_u").asc(), F.col(id_col).asc()).limit(topk)
    w = Window.orderBy(F.col("adc_u").asc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def pq_adc_topk_sql(
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    topk: int = 20,
) -> str:
    """DuckDB oracle: identical seeds, codebook slices, micro-unit
    distances, argmin tiebreaks, integer ADC sums, and ranking.  The
    query vector is the corpus vector with the LARGEST (md5(id), id)
    — disjoint from the seed set's smallest-k in practice."""
    sub = dim // m
    sq = (
        "CAST(round(list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) * 1000000) AS BIGINT)"
    )
    enc_d = sq.format(
        a=f"e.{vec_col}[g.s * {sub} + 1 : g.s * {sub} + {sub}]", b="cb.sv"
    )
    lut_d = sq.format(
        a=f"q.qv[g.s * {sub} + 1 : g.s * {sub} + {sub}]", b="cb.sv"
    )
    return f"""
WITH seeds AS (
  SELECT {vec_col} AS sv,
         ROW_NUMBER() OVER (ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) - 1 AS j
  FROM {table}
  ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col} LIMIT {k}
),
subs AS (SELECT unnest(generate_series(0, {m - 1})) AS s),
cbflat AS (
  SELECT g.s, seeds.j, seeds.sv[g.s * {sub} + 1 : g.s * {sub} + {sub}] AS sv
  FROM seeds CROSS JOIN subs g
),
q AS (
  SELECT {vec_col} AS qv FROM {table}
  ORDER BY md5(CAST({id_col} AS VARCHAR)) DESC, {id_col} DESC LIMIT 1
),
dists AS (
  SELECT e.{id_col} AS vec_id, g.s, cb.j, {enc_d.replace('cb.sv', 'cb2')} AS du
  FROM {table} e
  CROSS JOIN subs g
  JOIN (SELECT s, j, sv AS cb2 FROM cbflat) cb ON cb.s = g.s
),
enc AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT vec_id, s, j, ROW_NUMBER() OVER (
      PARTITION BY vec_id, s ORDER BY du ASC, j ASC) AS rn
    FROM dists
  ) WHERE rn = 1
),
lut AS (
  SELECT g.s, cb.j, {lut_d.replace('cb.sv', 'cb2')} AS du
  FROM q CROSS JOIN subs g
  JOIN (SELECT s, j, sv AS cb2 FROM cbflat) cb ON cb.s = g.s
),
adc AS (
  SELECT enc.vec_id,
         array_to_string(list(enc.code ORDER BY enc.s), '-') AS codes_str,
         CAST(SUM(lut.du) AS BIGINT) AS adc_u
  FROM enc JOIN lut ON lut.s = enc.s AND lut.j = enc.code
  GROUP BY enc.vec_id
)
SELECT vec_id, codes_str, adc_u,
       CAST(ROW_NUMBER() OVER (ORDER BY adc_u ASC, vec_id ASC) AS BIGINT) AS rank
FROM adc
QUALIFY rank <= {topk}
""".strip()
