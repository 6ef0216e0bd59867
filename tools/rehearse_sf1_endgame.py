"""sf1-scale rehearsal of the COMPOSED release endgame: the full
registered pipeline_release_endgame plan (gate -> SemDeDup ->
tokenizer train/persist/reload -> survivor tokenize -> mixture ->
pack -> shuffle -> partitioned export -> readback digest) at 10x the
sf0.1 documents corpus.

Corpus: rehearse_sf1's 10x mutated replication; embeddings symlink to
sf0.1, so the SemDeDup stage sees its sf0.1 load while every
corpus-sized stage (gate, train word-count, tokenize, placement,
export) sees 10x — the composition's scaling is dominated by exactly
the terms the 100 TB argument claims are linear-or-better.

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

from pyspark.sql import SparkSession  # noqa: E402

from rehearse_sf1 import SF01, build_sf1_documents, force, steady  # noqa: E402


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

    fn = QUERIES["pipeline_release_endgame"]
    root = tempfile.mkdtemp(prefix="h20w_sf1_endgame_")
    try:
        sf1 = build_sf1_documents(spark, root)
        small = steady(lambda: force(fn(spark, SF01)))
        large = steady(lambda: force(fn(spark, sf1)))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out = {
        "pipeline_release_endgame": {
            "small_s": small,
            "large_s": large,
            "data_ratio": 10.0,
            "time_ratio": round(large / max(small, 0.01), 3),
        }
    }
    print("RESULT " + json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
