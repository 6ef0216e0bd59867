"""Incremental curation — build-store / apply-delta, split so the two
cost regimes are separately invokable (and separately TIMEABLE):

- :func:`build_curated_store` is the full-refresh path: curate the
  whole release and materialize it (curated columns + the raw-content
  digest) as a parquet artifact.  Cost ~ O(corpus).
- :func:`apply_incremental_curate` is the between-releases path: given
  the stored artifact and the NEW corpus, classify docs by digest,
  re-curate ONLY the added/changed delta, and stitch stored rows for
  unchanged docs with the freshly curated delta.  Cost ~ O(|delta|)
  curation work + one id-keyed digest join — the economics that make
  incremental pipelines worth running (time ∝ delta, not corpus size;
  measured in PLANS.md).

The registered ``pipeline_incremental_curate`` query composes both on
deterministic version slices, with the FULL RECOMPUTE as its DuckDB
oracle: a hash match proves incremental ≡ full.  The split exists so
a bench probe can time the delta path alone with the store prebuilt
(r7 VERDICT item 3).

The store is self-sufficient at delta time: it carries ``raw_digest``
(md5 of the null-coalesced text) alongside the curated columns, so
classification needs the new corpus and the store only — the previous
release's TEXT is never re-read, exactly like a production artifact.

Curation functions passed here must be strictly PER-DOC (row-local)
— the precondition for incremental ≡ full.  Anything with cross-doc
state (dedup, corpus-level stats) needs a different incremental
contract (e.g. the mergeable-sketch store, inventory_ext.py).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_20_warehouse_spark.functions import text as T


def curate_redact_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
) -> DataFrame:
    """The default per-doc curation stage: PII redaction → token count
    → integer quality gate → digest of the curated text.  Row-local by
    construction (every expression is per-row), so it satisfies the
    incremental contract.

    Any ADDITIONAL input columns ride through unchanged (the
    pack_token_budget passthrough convention): build_curated_store
    relies on this to attach ``raw_digest`` in the SAME projection
    instead of a corpus-sized id-keyed join after the fact.
    Passthrough names must not collide with the output columns or the
    internal redaction alias — rejected loudly rather than producing
    ambiguous references (r8 review)."""
    extra = [c for c in df.columns if c not in (id_col, text_col)]
    reserved = {"r", "tok_len", "passed", "curated_digest"}
    clash = reserved.intersection(extra)
    if clash:
        raise ValueError(
            f"passthrough columns collide with curation outputs: {sorted(clash)}"
        )
    red = df.select(
        F.col(id_col), *extra, T.redact_pii(F.col(text_col)).alias("r")
    )
    tok = T.token_count(F.col("r"))
    return red.select(
        F.col(id_col),
        tok.alias("tok_len"),
        (tok >= min_tokens).alias("passed"),
        F.md5("r").alias("curated_digest"),
        *extra,
    )


def build_curated_store(
    docs: DataFrame,
    store_path: str,
    curate: Callable[[DataFrame], DataFrame] = curate_redact_gate,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Full-refresh path: curate the whole release and write the store
    artifact (curated columns + ``raw_digest``) to ``store_path``.

    Scale shape: ONE row-local projection (the raw digest rides
    through the curation as a passthrough column — no id-keyed join,
    no shuffle at all before the write; the earlier join form
    shuffled two corpus-sized projections) and one parquet write.
    This is the O(corpus) job the apply path exists to avoid
    re-running.  A custom ``curate`` must follow the passthrough
    convention (preserve unknown input columns) — the default does."""
    base = docs.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
    with_digest = base.withColumn("raw_digest", F.md5(text_col))
    curated = curate(with_digest)
    if "raw_digest" not in curated.columns:
        # fail at BUILD time, not at delta time after the O(corpus)
        # build was already paid: a custom curate that projects a
        # fixed schema (legal under the old join-based build) breaks
        # the passthrough convention the store now depends on
        raise ValueError(
            "curate dropped the raw_digest passthrough column; "
            "build_curated_store requires curation stages to preserve "
            "unknown input columns (see curate_redact_gate)"
        )
    curated.write.mode("overwrite").parquet(store_path)


def apply_incremental_curate(
    new_docs: DataFrame,
    store: DataFrame,
    curate: Callable[[DataFrame], DataFrame] = curate_redact_gate,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Between-releases path: stitch the curated NEW release from the
    stored artifact plus a delta-only recompute.

    Classification is one id-keyed LEFT join of the new corpus's
    row-local digest projection against the FULL store (text never
    ships into the join — the store's columns are the narrow curated
    outputs: counts, booleans, digests); docs whose digest matches
    reuse their stored curated row straight off that join, docs that
    are new or changed re-join the new corpus for their text and go
    through ``curate``.  Removed docs drop out naturally (absent from
    ``new_docs``).  Work ∝ |delta| for curation and ∝ corpus for TWO
    narrow id-keyed joins (the classify join and the delta text
    re-join; an earlier form paid a third corpus-sized join to fetch
    stored rows for unchanged ids).

    WHEN NOT TO USE THIS (measured round 10, PLANS.md §incremental-
    crossover): the apply path trades the full path's one curation
    pass for two corpus-sized narrow joins plus several jobs of fixed
    overhead (~2s on the bench host), so full recompute WINS for
    small corpora of short documents — measured 0.5x at 1M docs of
    40 tokens.  The apply path wins on either axis out of that
    corner: per-doc curation cost (1.8x at 200 tokens, 3.2x at 1000
    tokens, 1M docs — crossover ≈100-150 tokens with the default
    redact+gate curation) or corpus size (2.3x at 4M docs even at 40
    tokens: the digest-join slope ~0.3µs/doc is BELOW the curation
    slope ~2µs/doc, so once fixed overhead amortizes the apply path
    wins regardless).  Rule of thumb: use full recompute below ~1M
    short docs; use the apply path for long docs, expensive curation,
    or any corpus big enough that a full curation pass is the cost
    you are trying to avoid — which is exactly the 100 TB regime."""
    new_base = new_docs.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
    new_digest = new_base.select(
        F.col(id_col), F.md5(text_col).alias("new_digest")
    )
    status = new_digest.join(store, id_col, "left")
    reused = (
        status.filter(F.col("raw_digest") == F.col("new_digest"))
        .drop("raw_digest", "new_digest")
    )
    delta_ids = status.filter(
        F.col("raw_digest").isNull()
        | (F.col("raw_digest") != F.col("new_digest"))
    ).select(id_col)
    fresh = curate(new_base.join(delta_ids, id_col))
    return reused.unionByName(fresh)
