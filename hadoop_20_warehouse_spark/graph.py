"""Iterative graph operators beyond connected components
(dedup/components.py): integer-scaled PageRank.

The reference has no graph operator (SURVEY.md §1.5); this is part of
the analytics extension — rank propagation is the second most common
iterative dataflow a warehouse runs after dedup grouping (link-graph
quality priors for crawl corpora, citation ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    scale: int = PR_SCALE,
    damping_pct: int = 85,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """(node, r) — PageRank after ``iterations`` rounds, rank 1.0
    scaled to ``scale`` as a BIGINT.

    Every step is integer arithmetic — contributions are floor
    divisions ``r div out_degree``, the damping update is
    ``((100-d)*scale) div 100 + (d*incoming) div 100`` — so partial
    sums commute bit-exactly across engines and partitionings (the
    repo's order-independent-sum discipline applied to an iterative
    algorithm).  Dangling-node mass is dropped (the standard
    simplification, applied identically by the SQL twin in
    inventory_analytics._PR_SQL).

    Scale shape: per iteration one src-keyed join + one dst-keyed
    partial-aggregable sum + one node-keyed left join; the
    degree-annotated edge list is computed once.  ``checkpoint_every``
    truncates lineage for long runs (web-graph iteration counts) the
    way connected_components materializes every round; the default
    None keeps short runs plan-only."""
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    edges_d = edges.join(deg, "src")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    base = (100 - damping_pct) * scale // 100
    for i in range(iterations):
        inc = (
            edges_d.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.expr("r div d").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("inc"))
        )
        ranks = nodes.join(inc, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(inc, 0)) div 100")
            ).cast("long").alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
