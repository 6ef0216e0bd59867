"""Character-level fuzzy near-dup: Levenshtein pairs under a
threshold, with length blocking and a packed character-frequency L1
pre-filter.

Library form of the registered ``dedup_fuzzy_edit`` query
(inventory_analytics.py carries the exhaustive DuckDB oracle twin);
extracted so pipelines can run it on arbitrary DataFrames and so the
hypothesis property test can prove candidate COMPLETENESS against a
brute-force reference on corpus shapes the driver tables lack
(adversarial mutations, bucket straddles, repeated characters past
the packing width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# count alphabet for the L1 pre-filter; out-of-alphabet characters
# simply don't move the vector (the bound still holds)
EDIT_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789 "


def fuzzy_edit_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 12,
    block_w: int | None = None,
) -> DataFrame:
    """(id_a, id_b, dist) for every pair with Levenshtein distance
    <= ``max_dist`` over the lowercased null-coalesced text.

    Plan (see the registered query's docstring for the full
    derivation and measurements — 34 s naive -> ~2.8 s at sf0.1):

    1. LENGTH BLOCKING — each doc lands in buckets floor(len/W) and
       floor(len/W)+1 with W >= T, so any pair with |Δlen| <= T (a
       necessary condition: one edit moves length by at most 1)
       shares a bucket.
    2. PACKED CHAR-COUNT L1 FILTER — 37 per-char counts, saturated at
       1023 (capping is 1-Lipschitz so the capped L1 lower-bounds the
       true L1), packed 6-per-bigint; a pair proceeds only if
       L1 <= 2T (necessary: a substitution moves two counts by one).
       The candidate join ships ids/lengths/packed counts only.
    3. TEXT FETCH + thresholded JVM levenshtein (early-abandons past
       T) for the filter survivors; distinct() because a pair can
       share two buckets.

    Both filters are NECESSARY conditions, so no true pair is ever
    dropped — proven two ways: the registered query's exhaustive
    DuckDB oracle, and tests/test_property.py's brute-force
    comparison under hypothesis-generated mutations.

    DENSE-CLUSTER CAVEAT (measured r10, PLANS.md sf1 rehearsals):
    the contract is "emit EVERY pair under the threshold", so the
    output — and therefore the cost — is O(cluster²) in duplicate-
    cluster size; a corpus of 10-member near-identical clusters
    produced 978x the pairs (and 92x the time — per-pair cost FELL)
    of its 1x original.  For boilerplate-heavy corpora where clusters
    are huge, dedup decisions should ride minhash-LSH → connected
    components → cluster representative (O(docs) output) and reserve
    this operator for bounded candidate sets or pair verification."""
    T = max_dist
    W = block_w if block_w is not None else max(T, 1)
    if W < T:
        raise ValueError(f"block_w ({W}) must be >= max_dist ({T})")
    # ln is the length of the LOWERED text — the same string the DP
    # scores.  Using the pre-lowercase length would break completeness
    # for case mappings that change length (e.g. U+0130 lowers to two
    # codepoints): a distance-0 pair could differ in raw length by
    # more than T and be dropped by the blocking (r8 review).
    docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("tx"),
    ).withColumn("ln", F.length("tx"))
    packed = []
    for g in range(0, len(EDIT_CHARS), 6):
        expr = None
        for k, c in enumerate(EDIT_CHARS[g : g + 6]):
            cnt = F.least(
                (
                    F.length("tx")
                    - F.length(F.expr(f"replace(tx, '{c}', '')"))
                ).cast("bigint"),
                F.lit(1023).cast("bigint"),
            )
            term = cnt * (1024 ** k)
            expr = term if expr is None else expr + term
        packed.append(expr.alias(f"p{g // 6}"))
    n_packed = len(packed)
    # r18 optimization round: the packed-count frame is computed by 37
    # full-string replace() scans per doc and feeds BOTH sides of the
    # bucket self-join; the two sides alias the columns differently
    # (doc_id_a vs doc_id_b), so their exchanges don't canonicalize
    # equal and AQE's stage reuse cannot dedupe them — without persist
    # the 37-replace pass ran twice.  The frame is tiny (9 scalars per
    # doc); generation-bounded persist (session.persist_generation)
    # halves the count pass — measured 3.90 → 3.11 s at sf0.1,
    # hash-identical (guide §2.4).
    from hadoop_20_warehouse_spark.session import persist_generation

    narrow = persist_generation(
        "fuzzy_edit_narrow", docs.select("doc_id", "ln", *packed)
    )
    blocked = narrow.select(
        "*",
        F.explode(
            F.array(
                F.floor(F.col("ln") / W), F.floor(F.col("ln") / W) + 1
            )
        ).alias("blk"),
    )
    pc = [f"p{i}" for i in range(n_packed)]
    a = blocked.select(
        *[F.col(c).alias(f"{c}_a") for c in ("doc_id", "ln", *pc)], "blk"
    )
    b = blocked.select(
        *[F.col(c).alias(f"{c}_b") for c in ("doc_id", "ln", *pc)], "blk"
    )
    l1 = None
    for i in range(n_packed):
        for k in range(6):
            if i * 6 + k >= len(EDIT_CHARS):
                break
            term = F.abs(
                F.shiftright(F.col(f"p{i}_a"), 10 * k) % 1024
                - F.shiftright(F.col(f"p{i}_b"), 10 * k) % 1024
            )
            l1 = term if l1 is None else l1 + term
    cand = (
        a.join(b, "blk")
        .filter(
            (F.col("doc_id_a") < F.col("doc_id_b"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= T)
        )
        .filter(l1 <= 2 * T)
        .select(
            F.col("doc_id_a").alias("id_a"), F.col("doc_id_b").alias("id_b")
        )
        .distinct()
    )
    ta = docs.select(F.col("doc_id").alias("id_a"), F.col("tx").alias("tx_a"))
    tb = docs.select(F.col("doc_id").alias("id_b"), F.col("tx").alias("tx_b"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("tx_a", "tx_b", T).cast("long").alias("dist"),
        )
        .filter(F.col("dist") >= 0)
        .orderBy("id_a", "id_b")
    )


def fuzzy_edit_pairs_chunked(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 12,
    chunk_w: int = 16,
) -> DataFrame:
    """(id_a, id_b, dist) under the CHUNK-SIGNATURE candidate scheme —
    the second blocking key :func:`fuzzy_edit_pairs`'s docstring names
    as the 100 TB remedy for dense length bands (the PassJoin /
    pigeonhole family: Li, Deng & Feng 2011, "PASS-JOIN: a
    partition-based method for similarity joins").

    Pigeonhole: T edits touch at most T of a doc's fixed-width chunks
    (an edit inside chunk k modifies it; indels BEFORE a chunk only
    SHIFT its occurrence, absorbed by the ±T match window), so if the
    shorter doc has >= T+1 full ``chunk_w``-wide chunks, at least one
    chunk appears VERBATIM in the longer doc within ±T of its home
    position.  Candidates therefore come from an EQUI-join on
    (chunk_index, chunk_string) between the shorter side's chunks and
    the longer side's position-windowed substrings — no per-length-
    band pair enumeration, so a corpus where every doc is ~300 chars
    (the shape that degrades length blocking toward quadratic) stays
    linear-ish: emissions are ~(len/w)·(2T+1) rows per doc and the
    join is selective on 16-char position-locked content.

    Docs too short for the pigeonhole (fewer than T+1 full chunks,
    i.e. len < w·(T+1)) fall back to plain length blocking AMONG the
    short population (any pair whose shorter member is short has both
    lengths <= w·(T+1)+T, so the fallback pool covers it) — the
    scheme degrades gracefully instead of silently losing pairs.

    Same output contract as fuzzy_edit_pairs; completeness of the
    union of both candidate sources is proven against the brute-force
    reference by the hypothesis property test (which draws corpora
    straddling the long/short threshold), and both schemes produce
    IDENTICAL results on the sf0.1 corpus and a synthetic dense band
    (cross-validated, PLANS.md).

    When to prefer which (measured): the L1-filtered length blocking
    has a quadratic-in-band-density pair count but a ~150-integer-op
    per-pair cost, so it WINS up to surprisingly dense bands (a 5k-doc
    single-length band: 1.1 s vs 2.3 s chunked — ~12.6M pairs die in
    the L1 filter faster than 2.5M substring emissions join); the
    chunk scheme's linear emission term wins when band-pair count ×
    per-pair cost exceeds ~(len/w)·(2T+1) emissions per doc — on this
    host beyond ~10^8 same-band pairs, i.e. ~10x denser than the
    measured point.  At 100 TB pick per telemetry; both are complete."""
    T = max_dist
    w = chunk_w
    need = w * (T + 1)  # minimum length for the pigeonhole to bind
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("tx"),
    ).withColumn("ln", F.length("tx"))

    long_docs = base.filter(F.col("ln") >= need)
    # chunk side (the SHORTER doc of a candidate pair): full chunks only
    segs = long_docs.select(
        F.col("doc_id").alias("id_r"),
        F.col("ln").alias("ln_r"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, ln div {w} - 1), "
                f"k -> substring(tx, k * {w} + 1, {w}))"
            )
        ).alias("k", "chunk"),
    )
    # substring side (the LONGER doc): every width-w substring within
    # ±T of each chunk's home position, clamped to the doc
    subs = long_docs.select(
        F.col("doc_id").alias("id_s"),
        F.col("ln").alias("ln_s"),
        F.explode(
            F.expr(
                f"flatten(transform(sequence(0, ln div {w} - 1), "
                f"k -> transform("
                f"sequence(greatest(0, k * {w} - {T}), "
                f"least(ln - {w}, k * {w} + {T})), "
                f"j -> struct(k AS k, substring(tx, j + 1, {w}) AS chunk))))"
            )
        ).alias("e"),
    ).select("id_s", "ln_s", F.col("e.k").alias("k"), F.col("e.chunk").alias("chunk"))
    long_cand = (
        segs.join(subs, ["k", "chunk"])
        .filter(
            (F.col("id_r") != F.col("id_s"))
            & (F.col("ln_r") <= F.col("ln_s"))
            & (F.col("ln_s") - F.col("ln_r") <= T)
        )
        .select(
            F.least("id_r", "id_s").alias("id_a"),
            F.greatest("id_r", "id_s").alias("id_b"),
        )
    )
    # short fallback: any pair whose shorter member lacks T+1 full
    # chunks has BOTH lengths <= need + T; length-BUCKET that pool
    # (the fuzzy_edit_pairs blocking, W = T with the +1 overlap row)
    W = max(T, 1)
    short_pool = base.filter(F.col("ln") <= need + T).select(
        "doc_id",
        "ln",
        F.explode(
            F.array(
                F.floor(F.col("ln") / W), F.floor(F.col("ln") / W) + 1
            )
        ).alias("blk"),
    )
    sa = short_pool.select(
        F.col("doc_id").alias("id_a"), F.col("ln").alias("ln_a"), "blk"
    )
    sb = short_pool.select(
        F.col("doc_id").alias("id_b"), F.col("ln").alias("ln_b"), "blk"
    )
    short_cand = (
        sa.join(sb, "blk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= T)
        )
        .select("id_a", "id_b")
    )
    cand = long_cand.unionByName(short_cand).distinct()
    ta = base.select(F.col("doc_id").alias("id_a"), F.col("tx").alias("tx_a"))
    tb = base.select(F.col("doc_id").alias("id_b"), F.col("tx").alias("tx_b"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("tx_a", "tx_b", T).cast("long").alias("dist"),
        )
        .filter(F.col("dist") >= 0)
        .orderBy("id_a", "id_b")
    )
