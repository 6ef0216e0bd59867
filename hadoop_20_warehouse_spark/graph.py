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


def triangle_counts(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """(node, n_triangles) over an undirected simple graph given as
    distinct (src < dst) edge rows — nodes in no triangle are omitted.

    Degree-oriented wedge counting (the standard distributed
    formulation, e.g. Suri & Vassilvitskii 2011 "Counting Triangles
    and the Curse of the Last Reducer"): every edge is re-oriented
    from its lower-(degree, id) endpoint to the higher one, wedges are
    enumerated per oriented source, and a wedge closes iff its two
    far endpoints are an edge.  Orientation bounds each node's wedge
    fan-out by O(sqrt(E)) regardless of hub degree — the naive
    a<b<c self-join explodes on the hottest node (a hub of degree d
    contributes d^2/2 wedges; after orientation every source's
    out-degree is <= sqrt(2E)).

    Plan: one degree agg, two edge-keyed joins to attach endpoint
    degrees, one wedge self-join per oriented source, one semi-style
    join against the canonical edge set to close wedges, one explode
    + partial-agg count — every shuffle keyed, no corpus-sized
    window, AQE splits residual hot sources."""
    canon = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    deg = (
        canon.select(F.col("a").alias("n"))
        .unionByName(canon.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    withdeg = (
        canon.join(deg.withColumnRenamed("n", "a"), on="a")
        .withColumnRenamed("d", "da")
        .join(deg.withColumnRenamed("n", "b"), on="b")
        .withColumnRenamed("d", "db")
    )
    fwd = F.struct(F.col("da").alias("d"), F.col("a").alias("n")) < F.struct(
        F.col("db").alias("d"), F.col("b").alias("n")
    )
    oriented = withdeg.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    e1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = e1.join(e2, on="u").filter(F.col("x") < F.col("y"))
    tri = wedges.join(
        canon.select(
            F.col("a").alias("x"), F.col("b").alias("y")
        ),
        on=["x", "y"],
    )
    members = tri.select(
        F.explode(F.array(F.col("u"), F.col("x"), F.col("y"))).alias("node")
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
