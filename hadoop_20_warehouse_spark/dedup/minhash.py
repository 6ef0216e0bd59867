"""MinHash + LSH near-duplicate detection.

Pipeline (Broder '97 resemblance sketches + banding, the standard
web-dedup construction — see PAPERS.md similarity-search entries):

  shingle → per-(doc, seed) min-hash → band signatures → bucket
  self-join → candidate pairs (+ estimated Jaccard from signature
  agreement).

Design for 100 TB:
- Shingling is ``explode(sequence(...))`` + ``substring`` — pure
  codegen, no UDF, linear output (one row per character position).
- The min-hash reduce is a groupBy(doc, seed) MIN: map-side partial
  min makes the shuffle ~|docs|×n_hashes rows regardless of text size.
- Banding turns the quadratic all-pairs problem into an equi-join on
  (band_idx, band_hash) — the classic LSH trick; Spark executes it as
  a shuffle join keyed on the band digest, and skewed buckets (boiler-
  plate text) are split by AQE skew-join handling.
- Hashes are md5 (functions/hashing.py) so the DuckDB oracle can run
  the identical pipeline: min over hex strings is plain string MIN,
  band digests are md5 of the seed-ordered concatenation.

The reference has no near-dup operator; the closest ancestors are its
MD5 sampling filter (SequenceFileInputFilter.java:195) and the Lucene
index contrib's doc→term pipeline (contrib/index/.../IndexUpdateMapper)
— cited for lineage, the algorithm is public literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_N_HASHES = 8
DEFAULT_BANDS = 4
DEFAULT_SHINGLE = 8  # character shingle width


def shingles(df: DataFrame, id_col: str, text_col: str, width: int = DEFAULT_SHINGLE) -> DataFrame:
    """Distinct character shingles per document. Documents shorter than
    ``width`` contribute their whole text as a single shingle."""
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length(F.col(text_col)) - (width - 1), F.lit(1)))
    ).alias("pos")
    return (
        df.select(F.col(id_col), F.col(text_col), pos)
        .select(F.col(id_col), F.substring(F.col(text_col), F.col("pos"), width).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, id_col: str, n_hashes: int = DEFAULT_N_HASHES
) -> DataFrame:
    """(id, seed, minhash): minhash_i = MIN(md5(i || '|' || shingle)).

    Seeds are exploded from a literal array — the shingle frame is
    scanned once, and the groupBy's partial MIN keeps shuffle volume at
    |docs| × n_hashes.
    """
    seeds = F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("seed")
    return (
        sh.select(F.col(id_col), F.col("shingle"), seeds)
        .select(
            F.col(id_col),
            F.col("seed"),
            F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle"))).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def band_signatures(
    sig: DataFrame, id_col: str, n_hashes: int = DEFAULT_N_HASHES, bands: int = DEFAULT_BANDS
) -> DataFrame:
    """(id, band_idx, band_hash): md5 of the band's minhashes in seed
    order (seed order via sort of (seed, minhash) structs —
    deterministic, matching the oracle's ORDER BY seed string_agg)."""
    rows_per_band = n_hashes // bands
    # integer DIV, not `/` + cast: DuckDB CAST(double AS INT) rounds
    # while Spark truncates — floor-div sidesteps the divergence.
    banded = sig.withColumn("band_idx", F.expr(f"CAST(seed DIV {rows_per_band} AS INT)"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seed", "minhash"))), lambda s: s["minhash"]
    )
    return banded.groupBy(id_col, "band_idx").agg(
        F.md5(F.array_join(ordered, "")).alias("band_hash")
    )


def candidate_pairs(
    bands_df: DataFrame, id_col: str
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one band bucket —
    the LSH candidate set. Equi-join on (band_idx, band_hash)."""
    a = bands_df.select(
        F.col(id_col).alias("id_a"), F.col("band_idx"), F.col("band_hash")
    )
    b = bands_df.select(
        F.col(id_col).alias("id_b"), F.col("band_idx"), F.col("band_hash")
    )
    return (
        a.join(b, on=["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_width: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Full pipeline → (id_a, id_b, est_jaccard) where est_jaccard is
    the fraction of agreeing minhash components (signature estimate of
    the true Jaccard resemblance)."""
    sh = shingles(df, id_col, text_col, shingle_width)
    sig = minhash_signatures(sh, id_col, n_hashes)
    bands_df = band_signatures(sig, id_col, n_hashes, bands)
    cand = candidate_pairs(bands_df, id_col)
    sig_a = sig.select(
        F.col(id_col).alias("id_a"), F.col("seed"), F.col("minhash").alias("mh_a")
    )
    sig_b = sig.select(
        F.col(id_col).alias("id_b"), F.col("seed"), F.col("minhash").alias("mh_b")
    )
    return (
        cand.join(sig_a, on="id_a")
        .join(sig_b, on=["id_b", "seed"])
        .groupBy("id_a", "id_b")
        .agg(
            (
                F.sum(F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0)).cast("double")
                / n_hashes
            ).alias("est_jaccard")
        )
    )


def minhash_lsh_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_width: int = DEFAULT_SHINGLE,
) -> str:
    """DuckDB oracle for ``minhash_lsh_pairs`` — the same pipeline in
    SQL (generate_series shingling, string MIN minhashes, ORDER BY seed
    string_agg band digests, bucket self-join)."""
    rows_per_band = n_hashes // bands
    return f"""
WITH sh AS (
  SELECT DISTINCT id, substring(txt, pos, {shingle_width}) AS shingle
  FROM (
    SELECT {id_col} AS id, {text_col} AS txt,
           unnest(generate_series(1, greatest(len({text_col}) - {shingle_width - 1}, 1))) AS pos
    FROM {table}
  )
),
sig AS (
  SELECT id, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS minhash
  FROM (SELECT id, shingle, unnest(generate_series(0, {n_hashes - 1})) AS seed FROM sh)
  GROUP BY id, seed
),
bands AS (
  SELECT id, CAST(seed // {rows_per_band} AS INTEGER) AS band_idx,
         md5(string_agg(minhash, '' ORDER BY seed)) AS band_hash
  FROM sig GROUP BY id, CAST(seed // {rows_per_band} AS INTEGER)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id
)
SELECT c.id_a, c.id_b,
       CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE) / {n_hashes} AS est_jaccard
FROM cand c
JOIN sig sa ON sa.id = c.id_a
JOIN sig sb ON sb.id = c.id_b AND sb.seed = sa.seed
GROUP BY c.id_a, c.id_b
""".strip()
