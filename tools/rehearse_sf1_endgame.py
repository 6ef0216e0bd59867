"""sf1-scale rehearsal of the COMPOSED release endgames: the full
registered pipeline_release_endgame plan (gate -> SemDeDup ->
tokenizer train/persist/reload -> survivor tokenize -> mixture ->
pack -> shuffle -> partitioned export -> readback digest) and the
round-15 pipeline_release_endgame_full (PII redact -> exact dedup ->
verified MinHash-LSH + components + rep election -> decontamination
prepended, upsampled epoch mixture in the tail) at 10x the sf0.1
corpus.

Corpus: rehearse_sf1's 10x mutated documents replication, PLUS
(VERDICT r14 #2 — the r14 rehearsal symlinked embeddings, so the
composed number didn't price the SemDeDup stage growing with the
corpus) a 10x cluster-structured embeddings table: each sf0.1 vector
is replicated 10x with vec_id*10+copy ids (aligned with the upsampled
doc ids, so the anti-join hits) — copy 0 exact, copies 1-9 perturbed
by deterministic +-1e-3 noise, so every copy stays in its source's
cell (cells stay skewed, 10x denser) and copies near-duplicate each
other (a strictly HARDER SemDeDup load than organic 10x growth, the
same argument rehearse_sf1 makes for its document mutation).  The
registered plan keeps its fixed num_cells=32, so the grouped-GEMM
pair term grows ~100x from its small base — the quadratic term the
num_cells ∝ N production knob exists to bound; the composed ratio
prices it honestly.

Each point is settle + min-of-2 back-to-back in one fresh session.
Prints one RESULT json line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from rehearse_sf1 import SF01, build_sf1_documents, force, steady  # noqa: E402


def build_sf1_embeddings(spark, sf1: str) -> None:
    """Replace the sf1 dir's embeddings symlink with the 10x
    cluster-structured table (see module docstring)."""
    emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    pert = F.expr(
        "transform(embedding, (x, i) -> cast(x + "
        "(CASE WHEN copy = 0 THEN 0.0 "
        " ELSE (abs(hash(vec_id, copy, i)) % 1000 - 500) / 500000.0 END)"
        " as float))"
    )
    up = emb.crossJoin(
        spark.range(10).select(F.col("id").alias("copy"))
    ).select(
        (F.col("vec_id") * 10 + F.col("copy")).alias("vec_id"),
        pert.alias("embedding"),
        "label",
    )
    dst = os.path.join(sf1, "embeddings.parquet")
    if os.path.islink(dst):
        os.remove(dst)
    up.write.mode("overwrite").parquet(dst)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hadoop_20_warehouse_spark.registry import QUERIES
    import hadoop_20_warehouse_spark.inventory  # noqa: F401
    import hadoop_20_warehouse_spark.inventory_llm  # noqa: F401

    root = tempfile.mkdtemp(prefix="h20w_sf1_endgame_")
    out: dict[str, dict] = {}
    try:
        sf1 = build_sf1_documents(spark, root)
        build_sf1_embeddings(spark, sf1)
        for name in ("pipeline_release_endgame", "pipeline_release_endgame_full"):
            fn = QUERIES[name]
            small = steady(lambda: force(fn(spark, SF01)))
            large = steady(lambda: force(fn(spark, sf1)))
            out[name] = {
                "small_s": small,
                "large_s": large,
                "data_ratio": 10.0,
                "time_ratio": round(large / max(small, 0.01), 3),
                "embeddings_scaled": True,
            }
            print(json.dumps({name: out[name]}), flush=True)
        # per-stage attrition at both points (r15 VERDICT #5): the
        # funnel query runs the SAME hygiene chain the full endgame
        # front-loads, so its counters ARE the endgame's stage-by-stage
        # survivor counts — raw -> exact -> neardup -> decontaminated
        # -> gated -> final, plus surviving token/PII mass.
        fun = QUERIES["pipeline_curation_funnel"]
        for tag, d in (("sf0.1", SF01), ("sf1", sf1)):
            row = fun(spark, d).collect()[0]
            out[f"funnel_{tag}"] = {k: int(v) for k, v in row.asDict().items()}
            print(json.dumps({f"funnel_{tag}": out[f"funnel_{tag}"]}),
                  flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print("RESULT " + json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
