"""Production-scale BPE: driver-local exact training, distributed
batched training, and merge-count-independent application.

Round 11 shipped the BPE family with a nested-replace apply and a
one-Spark-round-trip-per-merge trainer — both corpus-size-safe but
LINEAR IN MERGE COUNT (a 32k-merge production vocabulary is
inexpressible as 32k nested replaces or 32k Spark jobs).  This module
closes the merge-count axis with three scale paths:

1. ``train_merges_local`` — the exact sequential (Sennrich et al.
   2016) trainer run DRIVER-LOCALLY over the collected capped word
   table.  The word table is bounded to ``max_words`` rows BY
   CONSTRUCTION (functions/bpe.word_counts caps it — the
   lib/aggregate/UniqValueCount.java:30 bounded-state idea), so the
   collect is legitimate bounded metadata, and the incremental
   pair-count index (the standard Sennrich implementation) makes N
   merge rounds cost ZERO Spark jobs and O(total merge applications)
   python time.  Semantics are bit-identical to the r11 Spark-round
   trainer: position-weighted adjacent pair counts, argmax by
   (count DESC, pa ASC, pb ASC), one left-to-right non-overlapping
   merge pass per round.

2. ``train_merges_batched`` — batched top-B BPE: R rounds each take
   the TOP-B pairs of the current tokenization (not the top-1), so a
   32k-merge vocabulary costs R = 32k/B bounded Spark jobs over the
   capped word table instead of 32k.  With B=1 this IS the exact
   sequential trainer (the property the oracle generators exploit).
   Batched merge selection is the standard scalable-BPE construction;
   within a batch, merges apply in rank order with the same replay
   semantics, so the procedure stays deterministic.

3. ``tokenize_with_merges_large`` — application via one Arrow-batched
   ``mapInPandas`` pass with the merge table broadcast: per word, a
   present-pair-set guarded REPLAY of the merge sequence (each merge
   one left-to-right non-overlapping pass — EXACTLY the semantics of
   the nested ``replace`` chain, including the corner where two
   different merges produce the same token string, where rank-greedy
   heaps diverge from replace chains).  Distinct words are memoized
   per worker, so the cost is ~O(distinct words × applied merges) per
   task, FLAT in merge count for the scan itself — one corpus pass,
   no shuffle, any vocabulary size.

Cross-engine verification (the repo's oracle discipline):

- ``batched_train_sql`` derives the ENTIRE batched merge table in
  DuckDB: per round one pair aggregation + a row-wise recursive CTE
  that replays the round's B merges over the word table (each word
  advances independently — no aggregation over the recursive
  reference, which DuckDB 1.0 would reject and executes
  pathologically in the one-row-list-state encoding: measured
  2s/round vs 4ms/round for this shape).  R=8 × B=256 = 2048 merges
  derive in ~9s at sf0.01.
- ``seq_prefix_sql`` is the B=1 instantiation: the EXACT sequential
  trainer reproduced cross-engine to depth ~128 (measured 9.3s; the
  CTE-chain cost grows quadratically past that).  The driver-local
  trainer's first 128 rounds hash against it; training is sequential,
  so rounds 129+ run the identical loop — their validity is pinned by
  ``train_large_invariants_sql`` (exact integer mass conservation:
  every merge with count c removes exactly c frequency-weighted
  symbols; non-increasing counts; vocabulary closure; concat
  integrity) plus the python-vs-Spark-trainer full-agreement test to
  vocabulary exhaustion (tests/test_bpe_scale.py).
- ``batched_tokenize_sql`` / ``batched_pack_sql`` verify the LARGE
  APPLY path end-to-end: DuckDB derives the 2048-merge table, replays
  it over every distinct corpus word (OOV words included — apply is
  vocabulary-blind), reassembles per-document token streams in word
  order, and hashes (bpe_len, md5 token digest) per document — the
  exact values the mapInPandas worker emits.

The real ``documents`` table has only 31 distinct words (vocabulary
exhausts at ~106 merges), so the large-scale queries synthesize a
deterministic md5-hex corpus from order keys — the multimodal-codec
precedent (inventory_ext.q_multimodal_image_decode): both engines
generate identical inputs from the same generating columns, so the
heavy transform is pinned end-to-end.

Reference lineage: no tokenizer induction exists in the reference;
the capped-word-table bound is lib/aggregate/UniqValueCount.java:30's
bounded-state idea, and the batched rounds are the reference's
iterative-job chaining (examples/AggregateWordCount.java, jobcontrol)
with a top-B state update.  Sennrich, Haddow, Birch (ACL 2016) for
the algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from hadoop_20_warehouse_spark.functions.bpe import (
    _EOW,
    _WORD_RE,
    DEFAULT_MAX_WORDS,
    word_counts,
)

# Above this merge count the nested-replace expression tree and the
# per-round Spark jobs stop being sensible; train_merges/
# tokenize_with_merges dispatch to the driver-local / mapInPandas
# paths (functions/bpe.py keeps the small forms verbatim below it,
# where the DuckDB oracle unrolls them).
LARGE_MERGE_THRESHOLD = 64

# Word-table size up to which the driver-local trainer is the
# dispatch default (r18 optimization round): the collect is bounded by
# max_words rows of short strings — a few MB at this bound, far under
# spark.driver.maxResultSize — and the driver loop removes the
# ~1-Spark-job-per-round cost of the aggregation form.  Vocabularies
# capped above this train with the per-round Spark aggregation.
DRIVER_VOCAB_MAX = 262_144

import re as _re_mod  # noqa: E402

# Worker-side normalization for the mapInPandas apply path.  The
# whitespace split is an ASCII-explicit class, NOT python \s: the
# small path and the trainer's word_counts split with Spark/Java
# regex \s+, and Java \s is exactly [ \t\n\x0B\f\r] while python re
# \s also matches U+00A0/U+1680/U+2028/... — on text carrying Unicode
# whitespace the two sides of the LARGE_MERGE_THRESHOLD dispatch
# would tokenize differently (ADVICE r12).  lower() is likewise
# python-vs-JVM; the [a-z0-9]+ word filter confines the surviving
# vocabulary to ASCII, and the documented contract is ASCII-text
# corpora (non-ASCII WORDS are filtered identically on both sides
# because neither engine's lower() maps non-ASCII into [a-z0-9]).
# Module-level so the r13 perf adjudication could A/B the pattern
# order-controlled (PLANS.md round 14).
_WORD_APPLY_RE = _re_mod.compile(r"[a-z0-9]+\Z")
_WS_APPLY_RE = _re_mod.compile(r"[ \t\n\x0b\f\r]+")

_MERGE_SCHEMA = StructType(
    [
        StructField("step", LongType()),
        StructField("pair_a", StringType()),
        StructField("pair_b", StringType()),
        StructField("merged", StringType()),
        StructField("pair_count", LongType()),
    ]
)


# ---------------------------------------------------------------------------
# pure-python kernel (driver trainer + worker apply share it)
# ---------------------------------------------------------------------------


def _one_pass(toks: list, pa: str, pb: str, merged: str) -> list:
    """One left-to-right NON-OVERLAPPING merge pass — exactly
    ``replace(seq, '|pa||pb|', '|merged|')`` on the delimited
    encoding (functions/bpe.py module docstring)."""
    out: list = []
    i, n = 0, len(toks)
    while i < n:
        if i + 1 < n and toks[i] == pa and toks[i + 1] == pb:
            out.append(merged)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def replay_word(word: str, merges3: list) -> list:
    """Tokenize one word by REPLAYING the merge sequence in training
    order (``merges3`` = [(pa, pb, merged), ...]): each merge that has
    an adjacent occurrence gets one non-overlapping pass.  A
    present-pair set makes skipping absent merges O(1), so the scan
    over a 32k-merge table costs 32k set probes per DISTINCT word
    (memoized per worker by the callers)."""
    toks = list(word) + [_EOW]
    if len(toks) < 2:
        return toks
    present = set(zip(toks, toks[1:]))
    for pa, pb, merged in merges3:
        if (pa, pb) not in present:
            continue
        toks = _one_pass(toks, pa, pb, merged)
        if len(toks) < 2:
            break
        present = set(zip(toks, toks[1:]))
    return toks


def build_merge_index(merges3: list) -> dict:
    """merged-string → list of (rank, pa, pb, merged) in rank order —
    the apply-side prefilter: a merge can only ever fire on a word if
    its MERGED string is a contiguous region of word+EOW (every token
    is one), so a word's relevant merges are found by enumerating its
    O(L²) substrings instead of scanning the whole table (32k probes →
    ~L² lookups per distinct word; measured 18-63x at 32k merges,
    PLANS.md r12).  Duplicate merged strings (two merges with
    different splits producing the same token) keep ALL their entries,
    preserving exact replay order."""
    idx: dict = {}
    for rank, (pa, pb, merged) in enumerate(merges3):
        idx.setdefault(merged, []).append((rank, pa, pb, merged))
    return idx


def replay_word_indexed(word: str, merge_index: dict) -> list:
    """:func:`replay_word` through the substring prefilter — identical
    output (property-tested), O(L² + |relevant| log) per distinct
    word instead of O(n_merges)."""
    relevant: list = []
    L = len(word)
    seen: set = set()
    for i in range(L):
        for j in range(i + 1, L + 1):
            s = word[i:j]
            if s not in seen:
                seen.add(s)
                hit = merge_index.get(s)
                if hit:
                    relevant.extend(hit)
        s = word[i:] + _EOW
        hit = merge_index.get(s)
        if hit:
            relevant.extend(hit)
    hit = merge_index.get(_EOW)
    if hit:
        relevant.extend(hit)
    if not relevant:
        return list(word) + [_EOW]
    relevant.sort()
    return replay_word(word, [(pa, pb, m) for _r, pa, pb, m in relevant])


def train_merges_local(
    wc_rows: list,
    n_merges: int,
    applied_out: list | None = None,
    state_out: list | None = None,
) -> list:
    """The exact sequential BPE trainer over a COLLECTED word table
    (``wc_rows`` = [(word, freq), ...], bounded by the word_counts
    cap).  Incremental pair-count maintenance (only words containing
    the merged pair are touched per round — the standard Sennrich
    indexing), zero Spark jobs.  Returns [(step, pair_a, pair_b,
    merged, pair_count), ...]; stops early when the vocabulary
    exhausts — identical semantics to functions/bpe.train_merges'
    per-round Spark aggregation, verified cross-engine to depth 128
    by seq_prefix_sql and to exhaustion by the trainer-equivalence
    test.

    ``applied_out`` (optional list) receives the frequency-weighted
    number of merges ACTUALLY APPLIED per round — distinct from the
    selected pair_count when occurrences overlap (a run ``aaa`` counts
    pair (a,a) at two positions but a non-overlapping pass merges only
    one); the invariant package checks final mass against Σ applied.
    ``state_out`` (optional list) receives the trainer's final
    incrementally-evolved (tokens, freq) word states, for the
    replay-equivalence invariant."""
    import heapq
    from collections import Counter, defaultdict

    words: list = [
        [list(w) + [_EOW], int(wf)] for w, wf in wc_rows
    ]
    counts: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for idx, (toks, wf) in enumerate(words):
        for a, b in zip(toks, toks[1:]):
            counts[(a, b)] += wf
            where[(a, b)].add(idx)
    # lazy max-heap over (-cnt, pa, pb): entries go stale when counts
    # change; pops validate against the live Counter.  The argmax was
    # a full O(|pairs|) scan per round, which dominated a 32k-round
    # run (490s → 21s on the 6k-word rehearsal, PLANS.md r12);
    # heap order (cnt DESC, pa ASC, pb ASC) is exactly the scan's.
    heap: list = [(-c, p[0], p[1]) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list = []
    for step in range(1, n_merges + 1):
        pa = None
        while heap:
            negc, a, b = heapq.heappop(heap)
            if counts.get((a, b)) == -negc:
                pa, pb, cnt = a, b, -negc
                break
        if pa is None:
            break
        merged = pa + pb
        merges.append((step, pa, pb, merged, cnt))
        touched = where.pop((pa, pb), set())
        applied = 0
        changed: set = set()
        for idx in touched:
            toks, wf = words[idx]
            pairs_old = list(zip(toks, toks[1:]))
            if (pa, pb) not in set(pairs_old):
                continue  # stale index entry — word changed earlier
            for a, b in pairs_old:
                counts[(a, b)] -= wf
                changed.add((a, b))
                if counts[(a, b)] <= 0:
                    del counts[(a, b)]
            new = _one_pass(toks, pa, pb, merged)
            applied += (len(toks) - len(new)) * wf
            words[idx][0] = new
            for a, b in zip(new, new[1:]):
                counts[(a, b)] += wf
                changed.add((a, b))
                where[(a, b)].add(idx)
        # re-arm the heap with every pair whose count changed this
        # round (including DECREASES — a pair whose only heap entries
        # carry stale higher counts would otherwise become unreachable)
        for p in changed:
            c = counts.get(p)
            if c:
                heapq.heappush(heap, (-c, p[0], p[1]))
        if applied_out is not None:
            applied_out.append(applied)
    if state_out is not None:
        state_out.extend((toks, wf) for toks, wf in words)
    return merges


def trainer_final_state(
    wc_rows: list,
    merges: list,
) -> list:
    """[(word, freq, token_list), ...] — the word table tokenized
    under a trained merge table (replay semantics).  Used by the
    invariant checks; bounded input by construction."""
    merges3 = [(m[1], m[2], m[3]) for m in merges]
    return [(w, int(wf), replay_word(w, merges3)) for w, wf in wc_rows]


# ---------------------------------------------------------------------------
# Spark entry points
# ---------------------------------------------------------------------------


def train_merges_driver(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 2048,
    max_words: int = DEFAULT_MAX_WORDS,
) -> DataFrame:
    """Driver-local exact sequential training: ONE corpus shuffle (the
    capped word-count agg), one bounded collect (≤ max_words rows),
    then pure-python rounds — merge count no longer multiplies Spark
    jobs (the r11 trainer paid ~1 job per round)."""
    spark = docs.sparkSession
    wc = word_counts(docs, text_col, max_words).select("w", "wf").collect()
    merges = train_merges_local([(r["w"], r["wf"]) for r in wc], n_merges)
    return spark.createDataFrame(merges, schema=_MERGE_SCHEMA)


def tokenize_with_merges_large(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bpe_len, tok_digest) under an arbitrarily large merge
    table: one Arrow-batched mapInPandas corpus pass, merge table
    broadcast, per-worker distinct-word memoization.  Same output
    contract as functions/bpe.tokenize_with_merges (md5 of the
    space-joined token stream; NULL text → 0 tokens, md5(''));
    normalization (lower, \\s+ split, [a-z0-9]+ filter) matches the
    trainer's word-count stage."""
    import hashlib

    spark = docs.sparkSession
    merges3 = [(m[1], m[2], m[3]) for m in merges]
    bc = spark.sparkContext.broadcast(merges3)
    sel = docs.select(F.col(id_col), F.col(text_col))
    id_type = sel.schema[0].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("bpe_len", LongType()),
            StructField("tok_digest", StringType()),
        ]
    )
    word_re = _WORD_APPLY_RE
    ws_re = _WS_APPLY_RE

    def gen(batches):
        import pandas as pd

        midx = build_merge_index(bc.value)
        memo: dict = {}
        for pdf in batches:
            lens, digs = [], []
            for txt in pdf[text_col]:
                if txt is None:
                    txt = ""
                toks_all: list = []
                for w in ws_re.split(str(txt).lower()):
                    if not w or not word_re.match(w):
                        continue
                    t = memo.get(w)
                    if t is None:
                        t = replay_word_indexed(w, midx)
                        memo[w] = t
                    toks_all.extend(t)
                lens.append(len(toks_all))
                digs.append(
                    hashlib.md5(" ".join(toks_all).encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_len": pd.array(lens, dtype="int64"),
                    "tok_digest": digs,
                }
            )

    return sel.mapInPandas(gen, schema=schema)


def train_merges_batched(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 8,
    batch: int = 256,
    max_words: int = DEFAULT_MAX_WORDS,
    strict: bool = False,
) -> DataFrame:
    """Batched top-B BPE: per round, tokenize the capped word table
    under the merges so far (mapInPandas replay — the word table is
    the only frame touched, the corpus is never rescanned), aggregate
    position-weighted adjacent pair counts, and take the TOP ``batch``
    pairs by (count DESC, pa ASC, pb ASC) as the round's merges in
    rank order.  A 32k-merge vocabulary = 32k/B bounded Spark jobs —
    the merge-count axis goes from O(N) jobs to O(N/B).  With batch=1
    this is exactly the sequential trainer.

    Stops if a round yields fewer than ``batch`` pairs (vocabulary
    near exhaustion).  The ``batched_train_sql`` oracle derives the
    FIXED rounds×batch chain (each ap{r} keeps step = lo + batch), so
    a short final round makes the oracle's final frame silently empty
    instead of failing loudly — callers that pin a cross-engine oracle
    MUST pass ``strict=True``, which raises on a short round (the
    registered queries do; ADVICE r12).  Non-strict callers get a
    loud warning and the partial table."""
    spark = docs.sparkSession
    wc = (
        word_counts(docs, text_col, max_words)
        .select("w", "wf")
        .localCheckpoint(eager=True)
    )
    merges: list = []

    def pair_gen_for(bcast):
        def gen(batches):
            import pandas as pd

            midx = build_merge_index(bcast.value)
            for pdf in batches:
                pa_l, pb_l, wf_l = [], [], []
                for w, wf in zip(pdf["w"], pdf["wf"]):
                    toks = replay_word_indexed(str(w), midx)
                    for i in range(len(toks) - 1):
                        pa_l.append(toks[i])
                        pb_l.append(toks[i + 1])
                        wf_l.append(int(wf))
                yield pd.DataFrame(
                    {
                        "pa": pa_l,
                        "pb": pb_l,
                        "wf": pd.array(wf_l, dtype="int64"),
                    }
                )

        return gen

    for _r in range(rounds):
        bc = spark.sparkContext.broadcast(
            [(m[1], m[2], m[3]) for m in merges]
        )
        pairs = wc.mapInPandas(
            pair_gen_for(bc), "pa string, pb string, wf long"
        )
        top = (
            pairs.groupBy("pa", "pb")
            .agg(F.sum("wf").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pa"), F.asc("pb"))
            .limit(batch)
            .collect()
        )
        lo = len(merges)
        for i, row in enumerate(top, start=1):
            merges.append(
                (lo + i, row["pa"], row["pb"], row["pa"] + row["pb"], row["cnt"])
            )
        if len(top) < batch:
            if strict:
                raise ValueError(
                    f"train_merges_batched: round {_r + 1} yielded only "
                    f"{len(top)} pairs (< batch={batch}) — the vocabulary "
                    f"is near exhaustion and the fixed rounds*batch SQL "
                    f"oracle (batched_train_sql) would silently diverge. "
                    f"Reduce rounds*batch below the corpus' merge "
                    f"capacity, or drop strict if no oracle is pinned."
                )
            import warnings

            warnings.warn(
                f"train_merges_batched: short round {_r + 1} "
                f"({len(top)} < batch={batch}); returning a partial "
                f"merge table — do NOT compare against the fixed-chain "
                f"batched_train_sql oracle",
                stacklevel=2,
            )
            break
    return spark.createDataFrame(merges, schema=_MERGE_SCHEMA)


# ---------------------------------------------------------------------------
# DuckDB oracle generators
#
# All are parameterized on a WORD-ROWS subquery yielding (did, j, w):
# document id, word position, word — the caller supplies the corpus
# derivation (the registered queries use the deterministic md5-hex
# synthesis; any corpus expressible as word rows works).
# ---------------------------------------------------------------------------

_SEQ0_W = (
    "'||' || array_to_string(list_transform(generate_series(1, length(w)), "
    "i -> substr(w, i, 1)), '||') || '||" + _EOW + "||'"
)


def _pairs_cte(src: str, lo: int, batch: int, cap_only: bool) -> str:
    """Top-``batch`` adjacent pairs of tokenization ``src`` (w, wf,
    [in_cap,] seq), step-numbered lo+1..lo+batch."""
    capf = "WHERE in_cap" if cap_only else ""
    return f"""(
  SELECT CAST({lo} + ROW_NUMBER() OVER (ORDER BY cnt DESC, pa ASC, pb ASC) AS BIGINT) AS step,
         pa, pb, pa || pb AS merged, cnt AS pair_count
  FROM (
    SELECT pa, pb, CAST(SUM(wf) AS BIGINT) AS cnt FROM (
      SELECT q.wf AS wf, q.toks[u.i] AS pa, q.toks[u.i + 1] AS pb
      FROM (SELECT wf, list_filter(string_split(seq, '||'), z -> z <> '') AS toks
            FROM {src} {capf}) q,
           UNNEST(generate_series(1, len(q.toks) - 1)) AS u(i)
    ) GROUP BY pa, pb
  ) QUALIFY step <= {lo} + {batch}
)"""


def _batched_ctes(
    wordrows_sql: str,
    rounds: int,
    batch: int,
    max_words: int,
    all_words: bool,
) -> str:
    """The shared derivation chain: wr (did, j, w) → dw (distinct
    words, in_cap flag) → ap0 (initial encodings) → per round r:
    m{r} (the round's top-B merges, stats over capped words only) +
    rec{r} (row-wise recursion replaying the round's merges — each
    word advances independently; no aggregate over the recursive
    reference) + ap{r}.  ``all_words``: carry OOV words through the
    replay (the tokenize oracle) or cap-only (the train oracle)."""
    extra = ", in_cap" if all_words else ""
    stages = [
        f"""wr AS MATERIALIZED ({wordrows_sql}),
dw AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS wf,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w ASC) <= {max_words} AS in_cap
  FROM wr GROUP BY w
),
ap0 AS MATERIALIZED (
  SELECT w, wf{extra}, {_SEQ0_W} AS seq FROM dw {"" if all_words else "WHERE in_cap"}
)"""
    ]
    for r in range(1, rounds + 1):
        lo = (r - 1) * batch
        stages.append(
            f"m{r} AS MATERIALIZED "
            f"{_pairs_cte(f'ap{r - 1}', lo, batch, cap_only=all_words)}"
        )
        stages.append(
            f"""rec{r} AS (
  SELECT w, wf{extra}, CAST({lo} AS BIGINT) AS step, seq FROM ap{r - 1}
  UNION ALL
  SELECT a.w, a.wf{', a.in_cap' if all_words else ''}, a.step + 1,
         replace(a.seq, '|' || m.pa || '||' || m.pb || '|', '|' || m.merged || '|')
  FROM rec{r} a JOIN m{r} m ON m.step = a.step + 1
),
ap{r} AS MATERIALIZED (
  SELECT w, wf{extra}, seq FROM rec{r} WHERE step = {lo} + {batch}
)"""
        )
    return ",\n".join(stages)


def batched_train_sql(
    wordrows_sql: str,
    rounds: int = 8,
    batch: int = 256,
    max_words: int = DEFAULT_MAX_WORDS,
) -> str:
    """DuckDB oracle for :func:`train_merges_batched` — the FULL
    rounds×batch merge table derived cross-engine (per round one pair
    aggregation + a row-wise replay recursion)."""
    ctes = _batched_ctes(wordrows_sql, rounds, batch, max_words, all_words=False)
    union = "\nUNION ALL\n".join(
        f"SELECT step, pa AS pair_a, pb AS pair_b, merged, pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return f"WITH RECURSIVE\n{ctes}\n{union}"


def seq_prefix_sql(
    wordrows_sql: str,
    n_prefix: int,
    max_words: int = DEFAULT_MAX_WORDS,
) -> str:
    """DuckDB oracle for the first ``n_prefix`` rounds of EXACT
    SEQUENTIAL training — batched_train_sql with batch=1 (top-1 per
    round IS Sennrich's update).  Training is sequential, so this
    hash-checks the driver-local trainer's prefix verbatim; feasible
    to depth ~128 (the CTE-chain planning cost is quadratic)."""
    return batched_train_sql(wordrows_sql, rounds=n_prefix, batch=1, max_words=max_words)


def batched_tokenize_sql(
    wordrows_sql: str,
    rounds: int = 8,
    batch: int = 256,
    max_words: int = DEFAULT_MAX_WORDS,
) -> str:
    """DuckDB oracle for train_merges_batched → tokenize_with_merges_
    large: derive the merge table, replay it over EVERY distinct
    corpus word (OOV included — apply is vocabulary-blind), reassemble
    per-document token streams in word order, hash (doc_id, bpe_len,
    tok_digest)."""
    ctes = _batched_ctes(wordrows_sql, rounds, batch, max_words, all_words=True)
    return f"""WITH RECURSIVE
{ctes},
wtok AS (
  SELECT w, list_filter(string_split(seq, '||'), z -> z <> '') AS ts FROM ap{rounds}
)
SELECT wr.did AS doc_id,
       CAST(SUM(len(t.ts)) AS BIGINT) AS bpe_len,
       md5(string_agg(array_to_string(t.ts, ' '), ' ' ORDER BY wr.j)) AS tok_digest
FROM wr JOIN wtok t ON t.w = wr.w
GROUP BY wr.did"""


def batched_pack_sql(
    wordrows_sql: str,
    rounds: int = 8,
    batch: int = 256,
    max_words: int = DEFAULT_MAX_WORDS,
    budget: int = 512,
    n_shards: int = 8,
) -> str:
    """DuckDB oracle for large-vocabulary token-budget packing: the
    batched tokenize chain supplies per-doc SUBWORD counts, then the
    established md5-shard cumulative-sum placement
    (dedup/spans.pack_token_budget)."""
    ctes = _batched_ctes(wordrows_sql, rounds, batch, max_words, all_words=True)
    return f"""WITH RECURSIVE
{ctes},
wtok AS (
  SELECT w, CAST(len(list_filter(string_split(seq, '||'), z -> z <> '')) AS BIGINT) AS nt
  FROM ap{rounds}
),
lens AS (
  SELECT wr.did AS doc_id, CAST(SUM(t.nt) AS BIGINT) AS tok_len
  FROM wr JOIN wtok t ON t.w = wr.w GROUP BY wr.did
),
d AS (
  SELECT doc_id, tok_len,
         CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
              % {n_shards} AS BIGINT) AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM lens
),
c AS (
  SELECT doc_id, shard, tok_len,
         SUM(tok_len) OVER (PARTITION BY shard ORDER BY h, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - tok_len AS start_off
  FROM d
)
SELECT doc_id, shard, tok_len,
       CAST(start_off // {budget} AS BIGINT) AS batch_id,
       CAST(start_off % {budget} AS BIGINT) AS batch_offset
FROM c"""


def train_large_invariants_sql(
    wordrows_sql: str,
    n_merges: int,
    max_words: int = DEFAULT_MAX_WORDS,
) -> str:
    """DuckDB oracle for :func:`train_large_invariants`: the
    data-dependent row (initial frequency-weighted symbol mass of the
    capped word table) computed EXACTLY from the corpus, plus literal
    TRUE pins for the integer invariants the Spark side checks over
    the full-depth training run (the repo's invariant-oracle pattern —
    agg_uniq_approx precedent).  The counts_nonincreasing pin is a
    property of the REGISTERED corpora, not a BPE theorem (see
    train_large_invariants) — pinning it TRUE is only valid for
    corpora where the trainer has been observed monotone."""
    return f"""WITH wr AS ({wordrows_sql}),
cw AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS wf FROM wr GROUP BY w
  ORDER BY wf DESC, w ASC LIMIT {max_words}
)
SELECT 'initial_symbols' AS metric,
       CAST(SUM(wf * (length(w) + 1)) AS BIGINT) AS val FROM cw
UNION ALL SELECT 'n_merges', CAST({n_merges} AS BIGINT)
UNION ALL SELECT 'applied_mass_ok', 1
UNION ALL SELECT 'replay_matches_training', 1
UNION ALL SELECT 'counts_nonincreasing', 1
UNION ALL SELECT 'merged_concat_ok', 1
UNION ALL SELECT 'steps_contiguous', 1
UNION ALL SELECT 'vocab_closure_ok', 1"""


def train_large_invariants(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 2048,
    max_words: int = DEFAULT_MAX_WORDS,
) -> DataFrame:
    """Full-depth validity package for the driver-local sequential
    trainer, as EXACT INTEGER facts:

    - initial_symbols: Σ wf·(len(w)+1) over the capped word table —
      computed from the collected table, cross-checked against the
      oracle's direct SQL aggregation (pins the word table itself);
    - applied_mass_ok: each merge pass removes exactly one
      frequency-weighted symbol per APPLIED merge, so the final token
      mass must equal initial_symbols − Σ applied_r (exact integer
      identity over all n_merges rounds; applied_r < pair_count when
      occurrences overlap — a run ``aaa`` counts (a,a) twice but one
      non-overlapping pass merges once);
    - replay_matches_training: the trainer's incrementally-evolved
      final word states equal an INDEPENDENT replay of the finished
      merge table over the original words — the incremental pair-count
      index cross-validated against the apply path's replay kernel,
      token-exact over every word;
    - counts_nonincreasing: the selected argmax counts are observed
      non-increasing over this corpus.  NOT a theorem of BPE (ADVICE
      r12): a merge can create occurrences of a pair whose token
      string already exists via a different split (the
      duplicate-merged-string corner replay_word handles), letting a
      later argmax exceed the current one.  It IS a property of the
      registered synthetic corpora (verified by this very check each
      run — the oracle pins it TRUE for those corpora specifically);
      on a corpus where it fails, drop the pin, not the trainer;
    - merged_concat_ok / steps_contiguous / vocab_closure_ok:
      structural integrity of the full merge table (merged = pa||pb;
      steps 1..N with no gaps; every pa/pb is a symbol available at
      its step — an initial character, the end-of-word marker, or an
      earlier merge's output)."""
    spark = docs.sparkSession
    wc = word_counts(docs, text_col, max_words).select("w", "wf").collect()
    wc_rows = [(r["w"], r["wf"]) for r in wc]
    applied: list = []
    state: list = []
    merges = train_merges_local(
        wc_rows, n_merges, applied_out=applied, state_out=state
    )
    initial = sum(wf * (len(w) + 1) for w, wf in wc_rows)
    final_mass = sum(wf * len(toks) for toks, wf in state)
    mass_ok = final_mass == initial - sum(applied)
    replayed = trainer_final_state(wc_rows, merges)
    replay_ok = all(
        toks == rtoks
        for (toks, _), (_, _, rtoks) in zip(state, replayed)
    )
    noninc = all(
        merges[i][4] >= merges[i + 1][4] for i in range(len(merges) - 1)
    )
    concat_ok = all(m[3] == m[1] + m[2] for m in merges)
    contiguous = [m[0] for m in merges] == list(range(1, len(merges) + 1))
    avail = {c for w, _ in wc_rows for c in w} | {_EOW}
    closure = True
    for _, pa, pb, merged, _cnt in merges:
        if pa not in avail or pb not in avail:
            closure = False
            break
        avail.add(merged)
    rows = [
        ("initial_symbols", int(initial)),
        ("n_merges", len(merges)),
        ("applied_mass_ok", int(mass_ok)),
        ("replay_matches_training", int(replay_ok)),
        ("counts_nonincreasing", int(noninc)),
        ("merged_concat_ok", int(concat_ok)),
        ("steps_contiguous", int(contiguous)),
        ("vocab_closure_ok", int(closure)),
    ]
    schema = StructType(
        [StructField("metric", StringType()), StructField("val", LongType())]
    )
    return spark.createDataFrame(rows, schema=schema)


def vocab_after_merges_large(
    docs: DataFrame,
    merges: list,
    text_col: str = "text",
    max_words: int = DEFAULT_MAX_WORDS,
) -> DataFrame:
    """(token, freq, n_words) — the SUBWORD VOCABULARY under an
    arbitrarily large merge table: the capped word table tokenized by
    the indexed replay worker (one vocab-sized mapInPandas pass), then
    exploded and aggregated — functions/bpe.vocab_after_merges' exact
    output contract with the nested-replace chain swapped for the
    merge-count-flat apply.  Cost = one corpus word-count shuffle +
    a bounded-table pass, any vocabulary size."""
    spark = docs.sparkSession
    merges3 = [(m[1], m[2], m[3]) for m in merges]
    bc = spark.sparkContext.broadcast(merges3)
    wc = word_counts(docs, text_col, max_words).select("w", "wf")

    def gen(batches):
        import pandas as pd

        midx = build_merge_index(bc.value)
        for pdf in batches:
            w_l, wf_l, t_l = [], [], []
            for w, wf in zip(pdf["w"], pdf["wf"]):
                for t in replay_word_indexed(str(w), midx):
                    w_l.append(w)
                    wf_l.append(int(wf))
                    t_l.append(t)
            yield pd.DataFrame(
                {
                    "w": w_l,
                    "wf": pd.array(wf_l, dtype="int64"),
                    "token": t_l,
                }
            )

    toks = wc.mapInPandas(gen, "w string, wf long, token string")
    return toks.groupBy("token").agg(
        F.sum("wf").cast("long").alias("freq"),
        F.countDistinct("w").cast("long").alias("n_words"),
    )


def vocab_large_sql(
    wordrows_sql: str,
    rounds: int = 8,
    batch: int = 256,
    max_words: int = DEFAULT_MAX_WORDS,
) -> str:
    """DuckDB oracle for batched-train → vocab extraction: the
    derivation chain's FINAL capped word table, exploded and
    re-aggregated (functions/bpe.vocab_sql's shape on the batched
    chain)."""
    ctes = _batched_ctes(wordrows_sql, rounds, batch, max_words, all_words=False)
    return f"""WITH RECURSIVE
{ctes},
toks AS (
  SELECT w, wf, unnest(list_filter(string_split(seq, '||'), x -> x <> '')) AS token
  FROM ap{rounds}
)
SELECT token, CAST(SUM(wf) AS BIGINT) AS freq,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
FROM toks GROUP BY token"""
