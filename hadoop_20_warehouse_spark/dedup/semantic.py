"""Semantic (embedding-space) dedup, SemDeDup-style — cluster-bounded
cosine pruning (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023).

Where MinHash/SimHash/sign-LSH catch *lexical* near-duplicates,
semantic dedup removes documents whose EMBEDDINGS are near-identical —
paraphrases, templated rewrites, boilerplate variants — by

1. quantizing every vector to its nearest centroid cell (k-means /
   sampled centroids — the same rank-1 quantizer as ``similarity.ivf``),
2. comparing pairs ONLY within a cell (the paper's core trick: the
   O(n²) pairwise cosine becomes Σ|cell|², bounded by the clustering),
3. removing every document that has a same-cell neighbor above the
   similarity threshold with a SMALLER id — the lowest id of each
   cell's threshold-graph component survives as the canonical
   representative.

Removal policy note: the paper keeps a (random) single exemplar per
intra-cluster duplicate group; this implementation makes that choice
deterministic — a vector is removed iff SOME lower-id same-cell vector
is within the threshold, so the kept set is exactly the ids with no
smaller near-dup, reproducible across engines and runs (the same
min-id-representative convention as ``dedup.components``).

Spark shape (100 TB posture):
- cell assignment is ROW-LOCAL: the k centroids travel as ONE
  broadcast array row and each vector argmins with array HOFs
  (``similarity.ivf._cells`` — no shuffle, no window);
- the only data-sized shuffle is the self-join keyed on cell id;
  per-cell skew is bounded by the clustering itself — at scale you
  raise ``num_cells`` ∝ N (the paper uses 50k clusters for LAION) so
  cells stay O(N/k) and Σ|cell|² stays near-linear;
- pairs ship (id, vector) only — no document payload ever shuffles;
- the removal aggregation (min smaller-neighbor per doc) is a partial
  agg (min of struct), combiner-friendly.

Cross-engine determinism: sampled centroids (smallest-k by md5(id) —
``similarity.ivf.centroids``), cosines rounded to 6 decimals, min-id
tiebreaks — the DuckDB oracle reproduces cells, pairs, and the removed
set bit-for-bit.  A Lloyd-trained centroid table
(``similarity.ivf.train_centroids``) plugs into ``cents=`` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_20_warehouse_spark.similarity.ivf import _cells
from hadoop_20_warehouse_spark.similarity.knn import _dot, _norm, _safe_div, cosine_sql

DEFAULT_NUM_CELLS = 32
DEFAULT_SEM_THRESHOLD = 0.35


def semantic_dedup_removed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = DEFAULT_NUM_CELLS,
    threshold: float = DEFAULT_SEM_THRESHOLD,
    cents: DataFrame | None = None,
    method: str | None = None,
) -> DataFrame:
    """(vec_id, cell_id, dup_of, sim) — the REMOVED set: each row is a
    document with at least one same-cell neighbor of smaller id whose
    rounded cosine ≥ threshold; ``dup_of`` is the smallest such
    neighbor and ``sim`` that pair's similarity.  ``dup_of`` is a
    greedy link, not necessarily the final survivor (in a chain
    a<b<c with sim(a,b),sim(b,c) ≥ τ but sim(a,c) < τ, c links to b
    while b itself is removed); the minimum id of each cell's
    threshold-graph component always survives.  The kept corpus is
    ``df`` anti-joined on this frame's ``vec_id``.

    ``cents``: optional (centroid_id, cv, cn) table — pass
    ``similarity.ivf.train_centroids(...)`` for a trained quantizer;
    defaults to the deterministic sampled centroids."""
    from hadoop_20_warehouse_spark.session import persist_generation

    # rank-1 cell per vector — shuffle-free broadcast argmin (HOF below
    # the measured k crossover, Arrow-batched GEMM above it — the
    # paper-scale num_cells ∝ N path; method=None auto-picks)
    cells = _cells(
        df, id_col, vec_col, num_cells, nprobe=1, cents=cents, method=method
    ).drop("crank")
    vecs = df.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("nrm")
    )
    # (id, cell, v, n) feeds BOTH sides of the self-join — persist once
    tagged = persist_generation(
        "semdedup_tagged", cells.join(vecs, on=id_col)
    )
    a = tagged.select(
        F.col(id_col).alias("id_a"),
        F.col("centroid_id").alias("cell_id"),
        F.col(vec_col).alias("va"),
        F.col("nrm").alias("na"),
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"),
        F.col("centroid_id").alias("cell_id"),
        F.col(vec_col).alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, on="cell_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cell_id",
            "id_a",
            "id_b",
            F.round(
                _safe_div(_dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")),
                6,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
    # partial-agg min(struct): smallest dup_of per removed doc; id_a is
    # unique per (id_b, cell) pair set so the struct order is total
    best = pairs.groupBy("id_b", "cell_id").agg(
        F.min(F.struct("id_a", "sim")).alias("m")
    )
    return best.select(
        F.col("id_b").alias(id_col),
        "cell_id",
        F.col("m")["id_a"].alias("dup_of"),
        F.col("m")["sim"].alias("sim"),
    )


def semantic_dedup_removed_sql(
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = DEFAULT_NUM_CELLS,
    threshold: float = DEFAULT_SEM_THRESHOLD,
) -> str:
    """DuckDB oracle — identical sampled centroids, rank-1 cells,
    rounded cosines, min-id representative."""
    ccos = cosine_sql("v.v", "c.cv")
    pcos = cosine_sql("x.v", "y.v")
    return f"""
WITH cents AS (
  SELECT {id_col} AS centroid_id, {vec_col} AS cv FROM {table}
  ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col} LIMIT {num_cells}
),
v AS (SELECT {id_col} AS id, {vec_col} AS v FROM {table}),
cellranks AS (
  SELECT id, centroid_id,
         ROW_NUMBER() OVER (
           PARTITION BY id ORDER BY round({ccos}, 6) DESC, centroid_id ASC
         ) AS crank
  FROM v CROSS JOIN cents c
),
tagged AS (
  SELECT a.id, a.centroid_id, v.v
  FROM (SELECT id, centroid_id FROM cellranks WHERE crank = 1) a
  JOIN v USING (id)
),
pairs AS (
  SELECT x.centroid_id AS cell_id, x.id AS id_a, y.id AS id_b,
         round({pcos}, 6) AS sim
  FROM tagged x JOIN tagged y
    ON x.centroid_id = y.centroid_id AND x.id < y.id
),
hits AS (SELECT * FROM pairs WHERE sim >= {threshold}),
best AS (
  SELECT id_b, cell_id, id_a, sim,
         ROW_NUMBER() OVER (PARTITION BY id_b ORDER BY id_a ASC) AS rn
  FROM hits
)
SELECT id_b AS {id_col}, cell_id, id_a AS dup_of, sim
FROM best WHERE rn = 1
""".strip()
