"""Versioned tokenizer artifact store: persist a trained BPE tokenizer
(merge table + subword vocabulary + manifest) as parquet, reload it,
and apply it — the ship-the-tokenizer step every production pipeline
runs between vocabulary induction and corpus tokenization.

The sketch stores (inventory_ext.q_sketch_store_distinct and friends)
established the repo's persisted-artifact pattern: build a bounded
state table, write it to parquet, read it back, and prove the
round-trip by answering a query FROM THE STORE that hash-matches an
independent derivation.  A tokenizer is the same shape with stricter
stakes: the merge table is ORDER-SENSITIVE (replay applies merges in
training order, and two merges may produce the same token string via
different splits), so the store must restore the exact sequence, not
just the set — the reload sorts by step and the round-trip oracle
re-derives the tokenization from scratch, which only matches if the
reloaded table is the trained table in the trained order.

Layout (one directory per version, monotonically numbered):

    {path}/v{version:05d}/manifest/   1 row: format_version, version,
                                      n_merges, n_vocab
    {path}/v{version:05d}/merges/     (step, pair_a, pair_b, merged,
                                      pair_count)
    {path}/v{version:05d}/vocab/      (token, freq, n_words)

Writes go to a temporary ``_tmp_v...`` directory first and are
renamed into place, so a version directory is visible only complete —
readers never observe a partial artifact (the FileOutputCommitter
discipline, applied at artifact granularity).  Auto-assigned versions
(``version=None``) never overwrite: if two writers race to the same
number, the loser raises ``FileExistsError`` instead of replacing the
winner's committed directory.  Explicit-version overwrite (a retrain
of the same tag) swaps via rename-aside — the only non-atomic seam,
documented as a single-writer maintenance op.  ``read_tokenizer``
resolves ``version=None`` to the highest committed version, so a
pipeline can keep training new tokenizers while consumers pin or
follow latest.

All tables are bounded metadata by construction (merges ≤ vocabulary
capacity, vocab ≤ distinct subwords of the capped word table), so the
collect in ``load_merges`` is legitimate — the same bound that lets
the apply path broadcast the merge table.

Reference lineage: persisting a trained side-artifact and shipping it
to every task is the reference's DistributedCache contract
(filecache/DistributedCache.java:45 — files are "only copied once per
job" and must not be modified while in use, hence the immutable
versioned directories); io/MapFile.java:34's paired data+index
directory layout is the multi-part-artifact-in-one-directory
precedent.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_spark.functions.bpe_scale import _batched_ctes

FORMAT_VERSION = 1

_PARTS = ("manifest", "merges", "vocab")


def _vdir(path: str, version: int) -> str:
    return os.path.join(path, f"v{version:05d}")


def list_versions(path: str) -> list:
    """Committed artifact versions under ``path``, ascending.  Only
    fully-renamed ``v{N}`` directories appear — in-flight ``_tmp_*``
    writes are invisible by construction."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def write_tokenizer(
    merges_df: DataFrame,
    vocab_df: DataFrame,
    path: str,
    version: int | None = None,
) -> int:
    """Persist (merges, vocab, manifest) as artifact ``version`` under
    ``path`` (default: highest existing + 1).  Returns the version
    written.  The artifact appears atomically: parts are written to a
    ``_tmp`` sibling and renamed into place once complete.

    Concurrency contract: an auto-assigned version (``version=None``)
    NEVER replaces a committed directory — if another writer commits
    the same number between our ``list_versions`` read and the final
    rename, this call raises ``FileExistsError`` instead of silently
    clobbering the winner (retry to pick up the next number).  An
    EXPLICIT ``version`` may overwrite (retrain of the same tag): the
    old directory is renamed aside first and deleted only after the
    new one is in place, so the absence window is two atomic renames,
    not an ``rmtree`` — but a ``version=None`` reader racing an
    explicit overwrite can still briefly miss that version; explicit
    overwrite is a single-writer maintenance op by contract."""
    auto = version is None
    if auto:
        vs = list_versions(path)
        version = (vs[-1] + 1) if vs else 1
    n_merges = merges_df.count()
    n_vocab = vocab_df.count()
    spark = merges_df.sparkSession
    manifest = spark.createDataFrame(
        [(int(FORMAT_VERSION), int(version), int(n_merges), int(n_vocab))],
        "format_version long, version long, n_merges long, n_vocab long",
    )
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f"_tmp_v{version:05d}_{uuid.uuid4().hex[:8]}")
    try:
        manifest.write.parquet(os.path.join(tmp, "manifest"))
        merges_df.write.parquet(os.path.join(tmp, "merges"))
        vocab_df.write.parquet(os.path.join(tmp, "vocab"))
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    final = _vdir(path, version)
    aside = None
    if os.path.isdir(final):
        if auto:
            shutil.rmtree(tmp)
            raise FileExistsError(
                f"write_tokenizer: auto-assigned version {version} was "
                f"committed concurrently at {final!r} — retry to pick up "
                f"the next number (auto versions never overwrite)"
            )
        aside = os.path.join(path, f"_old_v{version:05d}_{uuid.uuid4().hex[:8]}")
        os.rename(final, aside)
    try:
        os.rename(tmp, final)
    except OSError as exc:
        if aside is not None:
            os.rename(aside, final)
        shutil.rmtree(tmp, ignore_errors=True)
        if auto and os.path.isdir(final):
            # A winner committed `final` between the isdir check above and
            # our rename — same race as the pre-check branch, so surface the
            # same retryable contract, not a bare ENOTEMPTY.
            raise FileExistsError(
                f"write_tokenizer: auto-assigned version {version} was "
                f"committed concurrently at {final!r} — retry to pick up "
                f"the next number (auto versions never overwrite)"
            ) from exc
        raise
    if aside is not None:
        shutil.rmtree(aside)
    return version


def read_tokenizer(
    spark: SparkSession,
    path: str,
    version: int | None = None,
) -> dict:
    """Load artifact ``version`` (default: latest committed).  Returns
    ``{"manifest": Row, "merges": DataFrame, "vocab": DataFrame,
    "version": int}``; raises with an actionable message on a missing
    store, missing version, or format mismatch."""
    vs = list_versions(path)
    if not vs:
        raise FileNotFoundError(
            f"read_tokenizer: no committed tokenizer versions under {path!r}"
        )
    if version is None:
        version = vs[-1]
    elif version not in vs:
        raise FileNotFoundError(
            f"read_tokenizer: version {version} not in store {path!r} "
            f"(have {vs})"
        )
    vdir = _vdir(path, version)
    manifest = spark.read.parquet(os.path.join(vdir, "manifest")).collect()[0]
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(
            f"read_tokenizer: artifact format {manifest['format_version']} "
            f"!= supported {FORMAT_VERSION} at {vdir!r}"
        )
    return {
        "manifest": manifest,
        "merges": spark.read.parquet(os.path.join(vdir, "merges")),
        "vocab": spark.read.parquet(os.path.join(vdir, "vocab")),
        "version": version,
    }


def load_merges(art: dict) -> list:
    """The reloaded merge table as the ordered [(step, pa, pb, merged,
    cnt), ...] list the apply kernels consume — ORDER BY step restores
    training order (parquet read order is partition-arbitrary), and
    the row count is validated against the manifest so a torn or
    mixed-version artifact fails loudly instead of tokenizing
    subtly differently."""
    rows = art["merges"].orderBy("step").collect()
    if len(rows) != art["manifest"]["n_merges"]:
        raise ValueError(
            f"load_merges: merge table has {len(rows)} rows but manifest "
            f"says {art['manifest']['n_merges']} — torn artifact?"
        )
    return [
        (r["step"], r["pair_a"], r["pair_b"], r["merged"], r["pair_count"])
        for r in rows
    ]


def artifact_roundtrip_sql(
    wordrows_sql: str,
    rounds: int,
    batch: int,
    max_words: int,
    version: int,
) -> str:
    """DuckDB oracle for the full train → write → reload → apply
    round-trip: re-derives the batched merge table AND the
    tokenization from scratch (bpe_scale's shared CTE chain), plus the
    capped-table vocabulary size, and pins the manifest fields as
    literals.  A hash match therefore proves the reloaded merges equal
    the trained merges IN ORDER (replay is order-sensitive), the
    manifest round-tripped, and the reloaded vocab has exactly the
    derivable row count."""
    ctes = _batched_ctes(wordrows_sql, rounds, batch, max_words, all_words=True)
    return f"""WITH RECURSIVE
{ctes},
wtok AS (
  SELECT w, in_cap,
         list_filter(string_split(seq, '||'), z -> z <> '') AS ts
  FROM ap{rounds}
),
nv AS (
  SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS n_vocab
  FROM (SELECT unnest(ts) AS t FROM wtok WHERE in_cap)
)
SELECT wr.did AS doc_id,
       CAST(SUM(len(t.ts)) AS BIGINT) AS bpe_len,
       md5(string_agg(array_to_string(t.ts, ' '), ' ' ORDER BY wr.j)) AS tok_digest,
       CAST({version} AS BIGINT) AS artifact_version,
       CAST({rounds * batch} AS BIGINT) AS artifact_n_merges,
       (SELECT n_vocab FROM nv) AS artifact_n_vocab
FROM wr JOIN wtok t ON t.w = wr.w
GROUP BY wr.did"""
