"""Byte-pair-encoding tokenizer induction and application (Sennrich,
Haddow, Birch, "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016 — the BPE vocabulary every modern pretraining
pipeline trains between curation and packing).

The repo already had the single merge-STEP statistic
(text_bpe_pair_stats); this module adds the iterative trainer and the
vocab-apply tokenizer, so the pack_token_* family can count REAL
subword tokens instead of whitespace words.

Spark shape (100 TB posture):

- The corpus contributes exactly ONE shuffle: the word-frequency
  partial agg (the BPE trick — pair statistics run over the
  DISTINCT-WORD table weighted by frequency, never over raw corpus
  positions).  The word table is then capped to the ``max_words`` most
  frequent words (TakeOrdered, the standard practice — top ~1M words
  carry ~all the mass of a web corpus), which BOUNDS every training
  round regardless of corpus size.
- Each merge round is one vocab-sized agg (adjacent-pair counts,
  partial-aggregable) plus a 1-row argmax collect; the word frame is
  localCheckpoint'd per round so the plan doesn't grow O(rounds) deep
  (the train_centroids precedent).  Rounds are O(max_words · avg_len),
  independent of corpus size.
- Applying a trained vocabulary is a ROW-LOCAL projection: the N
  merges become N nested ``replace`` calls per word (string literals
  — the merge table is bounded metadata, like the centroid
  broadcast), so tokenization is one corpus scan, no shuffle, no UDF.

Cross-engine determinism (the repo's oracle discipline): BPE is
all-integer — pair counts are exact longs, ties break lexicographically
on (pair_a, pair_b), and the merged-token strings are byte-exact — so
the DuckDB oracle reproduces the ENTIRE merge sequence bit-for-bit by
unrolling the N rounds as generated CTE stages.  No floats anywhere.

Token-sequence encoding — the one representational trick: a word's
symbol sequence is carried as a ``||``-delimited string with DOUBLE
delimiters at every boundary (``||h||e||y||</w>||``).  Applying merge
(a, b) is then ``replace(seq, '|a||b|', '|ab|')``: the pattern consumes
ONE bar from each side's pair, so the surviving bars still mark the
boundary for the next non-overlapping left-to-right match — exactly
BPE's greedy single-pass semantics, including runs (``a a a a`` with
merge (a,a) → ``aa aa``), in BOTH engines' plain (non-regex)
``replace``.  Words are restricted to ``[a-z0-9]+`` so the delimiter
can never collide (normalization is standard; the filter is explicit
and documented in the word-count stage).

Reference lineage: the reference has no tokenizer induction; the
iterate-a-small-state-table shape is its AggregateWordCount /
iterative-job chaining pattern (examples/AggregateWordCount.java,
jobcontrol chaining) applied to a vocabulary state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from hadoop_20_warehouse_spark.functions import text as T

DEFAULT_N_MERGES = 12
DEFAULT_MAX_WORDS = 1000

# end-of-word marker (Sennrich et al. §3) — lets merges learn
# word-final subwords; contains no delimiter bars and cannot collide
# with [a-z0-9]+ word characters.
_EOW = "</w>"

_WORD_RE = "^[a-z0-9]+$"

# Spark-side tokens-from-seq: split on the literal double bar, drop the
# empty boundary artifacts.  ('\\|\\|' in SQL text = the regex \|\|.)
_SPARK_TOKS = "filter(split(seq, '\\\\|\\\\|'), x -> x != '')"


def _seq0_spark(w: str) -> str:
    """SQL text: the initial ||-encoded char sequence + marker for
    word column ``w``."""
    return (
        f"concat('||', array_join(transform(sequence(1, length({w})), "
        f"i -> substring({w}, i, 1)), '||'), '||{_EOW}||')"
    )


def _seq0_duck(w: str) -> str:
    return (
        f"'||' || array_to_string(list_transform(generate_series(1, length({w})), "
        f"i -> substr({w}, i, 1)), '||') || '||{_EOW}||'"
    )


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = DEFAULT_MAX_WORDS,
) -> DataFrame:
    """(w, wf, seq): the ``max_words`` most frequent [a-z0-9]+ words
    (count DESC, word ASC — deterministic cap) with their initial
    symbol-sequence encoding.  One corpus shuffle (word-count partial
    agg), then a TakeOrdered cap."""
    words = docs.select(
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("w")
    ).filter(F.col("w").rlike(_WORD_RE))
    wc = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
        .orderBy(F.desc("wf"), F.asc("w"))
        .limit(max_words)
    )
    return wc.withColumn("seq", F.expr(_seq0_spark("w")))


def train_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = DEFAULT_N_MERGES,
    max_words: int = DEFAULT_MAX_WORDS,
) -> DataFrame:
    """Dispatching trainer.

    r18 optimization round: the dispatch key is the DRIVER-MEMORY
    bound (``max_words``), not the merge count.  The driver-local
    exact trainer (bpe_scale.train_merges_driver — one corpus shuffle
    for the capped word count, one bounded collect, pure-python
    rounds) was already the >LARGE_MERGE_THRESHOLD path, which means
    collecting the ≤``max_words``-row word table was already the
    accepted posture; the per-round Spark-aggregation form then pays
    ~1 cluster job per round purely to recompute the same capped
    table's pair counts (measured at 12 merges / sf0.1: rounds 2.93 s
    vs driver 0.59 s, identical output — cross-engine equality is
    pinned by tests/test_bpe_scale.py both ways).  The Spark form
    (:func:`_train_merges_rounds`) remains the executable spec the
    DuckDB oracle unrolls, the cross-validation twin, and the path
    for uncapped vocabularies beyond driver memory."""
    from hadoop_20_warehouse_spark.functions import bpe_scale as BS

    if max_words <= BS.DRIVER_VOCAB_MAX:
        return BS.train_merges_driver(docs, text_col, n_merges, max_words)
    return _train_merges_rounds(docs, text_col, n_merges, max_words)


def _train_merges_rounds(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = DEFAULT_N_MERGES,
    max_words: int = DEFAULT_MAX_WORDS,
) -> DataFrame:
    """The BPE trainer: ``n_merges`` rounds of (count adjacent symbol
    pairs weighted by word frequency → merge the most frequent pair,
    ties lexicographic).  Returns the merge TABLE — (step, pair_a,
    pair_b, merged, pair_count) in training order — which IS the
    tokenizer model (apply with :func:`tokenize_with_merges`).

    Each round is one vocab-sized agg + a 1-row collect; the word
    frame is localCheckpoint'd every few rounds (bounded ≤ max_words
    rows — the checkpoint bounds lineage depth, and spacing it every 4
    rounds halves the trainer's job count: replaying ≤3 replace
    projections over a capped table is cheaper than a checkpoint job).
    Stops early if the vocabulary exhausts (every word one symbol);
    the oracle's CASE-guarded stages reproduce the early stop."""
    spark = docs.sparkSession
    wc = word_counts(docs, text_col, max_words).localCheckpoint(eager=True)
    merges: list[tuple] = []
    for step in range(1, n_merges + 1):
        pairs = (
            wc.select("wf", F.expr(_SPARK_TOKS).alias("t"))
            # a fully-merged word (one symbol) contributes no pairs —
            # and must be excluded BEFORE the sequence() call: Spark's
            # sequence(1, 0) yields a DESCENDING [1, 0], not empty
            # (DuckDB's generate_series(1, 0) IS empty), so an
            # unguarded transform would index past the array
            .filter(F.expr("size(t) >= 2"))
            .select(
                "wf",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t) - 1), "
                        "i -> struct(element_at(t, i) AS pa, "
                        "element_at(t, i + 1) AS pb))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p")["pa"].alias("pa"), F.col("p")["pb"].alias("pb"))
            .agg(F.sum("wf").cast("long").alias("cnt"))
        )
        best = pairs.orderBy(
            F.desc("cnt"), F.asc("pa"), F.asc("pb")
        ).limit(1).collect()
        if not best:
            break  # vocabulary exhausted — every word is one symbol
        pa, pb, cnt = best[0]["pa"], best[0]["pb"], best[0]["cnt"]
        merged = pa + pb
        merges.append((step, pa, pb, merged, cnt))
        wc = wc.withColumn(
            "seq",
            F.expr(f"replace(seq, '|{pa}||{pb}|', '|{merged}|')"),
        )
        if step % 4 == 0:
            wc = wc.localCheckpoint(eager=True)
    schema = StructType(
        [
            StructField("step", LongType()),
            StructField("pair_a", StringType()),
            StructField("pair_b", StringType()),
            StructField("merged", StringType()),
            StructField("pair_count", LongType()),
        ]
    )
    return spark.createDataFrame(merges, schema=schema)


def _train_ctes_duck(
    table: str,
    text_col: str,
    n_merges: int,
    max_words: int,
) -> str:
    """The unrolled training CTE chain: w0 (capped word counts with
    initial encodings), then per round i: p{i} pair counts, m{i} the
    1-row argmax, w{i} the merged re-encoding.  CASE-guarded so an
    exhausted vocabulary (empty m{i}) passes seq through unchanged —
    matching the Spark trainer's early stop."""
    stages = [
        f"""w0 AS MATERIALIZED (
  SELECT w, wf, {_seq0_duck("w")} AS seq FROM (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS wf FROM (
      SELECT unnest(list_filter(string_split_regex(lower({text_col}), '[ \\t\\n\\x0b\\f\\r]+'),
                    t -> t <> '')) AS w
      FROM {table}
    ) WHERE regexp_matches(w, '{_WORD_RE}')
    GROUP BY w ORDER BY wf DESC, w ASC LIMIT {max_words}
  )
)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        stages.append(
            f"""p{i} AS MATERIALIZED (
  SELECT t[i] AS pa, t[i + 1] AS pb, CAST(SUM(wf) AS BIGINT) AS cnt
  FROM (SELECT wf, list_filter(string_split(seq, '||'), x -> x <> '') AS t
        FROM {prev}),
       UNNEST(generate_series(1, len(t) - 1)) AS u(i)
  GROUP BY 1, 2
),
m{i} AS MATERIALIZED (
  SELECT CAST({i} AS BIGINT) AS step, pa, pb, pa || pb AS merged, cnt
  FROM p{i} ORDER BY cnt DESC, pa ASC, pb ASC LIMIT 1
),
w{i} AS MATERIALIZED (
  SELECT w, wf,
         CASE WHEN EXISTS (SELECT 1 FROM m{i})
              THEN replace(seq,
                           '|' || (SELECT pa FROM m{i}) || '||' ||
                                  (SELECT pb FROM m{i}) || '|',
                           '|' || (SELECT merged FROM m{i}) || '|')
              ELSE seq END AS seq
  FROM {prev}
)"""
        )
    return ",\n".join(stages)


def train_merges_sql(
    table: str,
    text_col: str = "text",
    n_merges: int = DEFAULT_N_MERGES,
    max_words: int = DEFAULT_MAX_WORDS,
) -> str:
    """DuckDB oracle for :func:`train_merges` — the full merge sequence
    reproduced exactly (integer counts, lexicographic ties)."""
    ctes = _train_ctes_duck(table, text_col, n_merges, max_words)
    union = "\nUNION ALL\n".join(
        f"SELECT step, pa AS pair_a, pb AS pair_b, merged, cnt AS pair_count FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return f"WITH {ctes}\n{union}".strip()


def apply_merges_expr_spark(word_expr: str, merges: list[tuple]) -> str:
    """SQL text: encode ``word_expr`` and apply the trained merges in
    order — N nested replace calls, all literals (bounded metadata)."""
    s = _seq0_spark(word_expr)
    for _, pa, pb, merged, _ in merges:
        s = f"replace({s}, '|{pa}||{pb}|', '|{merged}|')"
    return s


def bpe_tokens_expr(text_col: str, merges: list[tuple]) -> str:
    """Spark SQL text: the document's full subword-token ARRAY under
    the trained merges — normalize/split words, encode each, apply the
    N replaces, split back, flatten in word order.  One row-local
    expression; the building block of tokenize/pack/chunk-by-BPE."""
    chain = apply_merges_expr_spark("w", merges)
    # coalesce(text, '') — a NULL document must tokenize to the EMPTY
    # array (bpe_len 0, md5('') digest), matching the oracle's LEFT
    # JOIN + COALESCE; without it Spark's split/flatten/size propagate
    # NULL and the hash diverges on the first NULL doc (r11 ADVICE).
    return (
        f"flatten(transform("
        f"filter(filter(split(lower(coalesce({text_col}, '')), '\\\\s+'), "
        f"x -> x != ''), "
        f"x -> x rlike '{_WORD_RE}'), "
        f"w -> filter(split({chain}, '\\\\|\\\\|'), x -> x != '')))"
    )


def tokenize_with_merges(
    docs: DataFrame,
    merges: list[tuple],
    id_col: str = "doc_id",
    text_col: str = "text",
    scatter_input: bool = True,
) -> DataFrame:
    """(id, bpe_len, tok_digest): per-document subword-token count and
    an md5 digest of the space-joined token stream — the corpus
    tokenized with a trained vocabulary, as ONE row-local projection
    (no shuffle, no UDF; the merge table rides as string literals).
    Words outside [a-z0-9]+ are dropped by the same normalization the
    trainer applies.

    Dispatch: above LARGE_MERGE_THRESHOLD merges the nested-replace
    expression tree stops being sensible (N replace calls per word —
    inexpressible at a production 32k-merge vocabulary); the large
    form (bpe_scale.tokenize_with_merges_large, one Arrow-batched
    replay pass with the merge table broadcast) takes over with the
    identical output contract.

    ``scatter_input`` (r19 optimization round, guide §2.5): the
    N-replace chain + per-doc md5 digest is CPU-dense per row, and a
    single-row-group parquet scan plans ONE task — scatter spreads it
    across the cluster (no-op on well-split production scans;
    interleaved A/B at sf0.1: 0.96 → 0.36 s, ~2.7x).  Applies to the
    small-merge JVM-expression branch only — the large mapInPandas
    branch is shared by STREAMING tokenize_stream (a batch-only
    repartition cannot compose with readStream) and its synthetic-doc
    bench input was A/B-measured not to benefit (r18 dead-ends
    list)."""
    from hadoop_20_warehouse_spark.functions import bpe_scale as BS

    if len(merges) > BS.LARGE_MERGE_THRESHOLD:
        return BS.tokenize_with_merges_large(docs, merges, id_col, text_col)
    if scatter_input:
        from hadoop_20_warehouse_spark.session import scatter

        docs = scatter(docs)
    flat = bpe_tokens_expr(text_col, merges)
    return docs.select(
        F.col(id_col),
        F.expr(f"cast(size({flat}) as bigint)").alias("bpe_len"),
        F.expr(f"md5(array_join({flat}, ' '))").alias("tok_digest"),
    )


def tokenize_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = DEFAULT_N_MERGES,
    max_words: int = DEFAULT_MAX_WORDS,
) -> str:
    """DuckDB oracle for train→tokenize: the training CTE chain plus a
    per-(doc, word) unroll of the same N replaces (scalar subqueries —
    lambdas can't host subqueries, so words unnest to rows first),
    re-aggregated in word order."""
    ctes = _tokenize_ctes_duck(table, id_col, text_col, n_merges, max_words)
    return f"""
WITH {ctes}
SELECT d.{id_col},
       COALESCE(a.bpe_len, 0) AS bpe_len,
       md5(COALESCE(a.joined, '')) AS tok_digest
FROM {table} d LEFT JOIN docagg a ON a.did = d.{id_col}
""".strip()


def _tokenize_ctes_duck(
    table: str,
    id_col: str,
    text_col: str,
    n_merges: int,
    max_words: int,
) -> str:
    """Training chain + per-(doc, word) merge application, ending at
    ``docagg`` (did, bpe_len, joined) — shared by the tokenize and the
    BPE-driven packing oracles."""
    ctes = _train_ctes_duck(table, text_col, n_merges, max_words)
    stages = [
        f"""wordrows AS MATERIALIZED (
  SELECT {id_col} AS did, u.i AS widx, ws[u.i] AS w
  FROM (SELECT {id_col},
               list_filter(list_filter(string_split_regex(lower({text_col}), '[ \\t\\n\\x0b\\f\\r]+'),
                           t -> t <> ''), t -> regexp_matches(t, '{_WORD_RE}')) AS ws
        FROM {table}),
       UNNEST(generate_series(1, len(ws))) AS u(i)
),
s0 AS MATERIALIZED (SELECT did, widx, {_seq0_duck("w")} AS seq FROM wordrows)"""
    ]
    for i in range(1, n_merges + 1):
        stages.append(
            f"""s{i} AS MATERIALIZED (
  SELECT did, widx,
         CASE WHEN EXISTS (SELECT 1 FROM m{i})
              THEN replace(seq,
                           '|' || (SELECT pa FROM m{i}) || '||' ||
                                  (SELECT pb FROM m{i}) || '|',
                           '|' || (SELECT merged FROM m{i}) || '|')
              ELSE seq END AS seq
  FROM s{i - 1}
)"""
        )
    body = ",\n".join(stages)
    return f"""{ctes},
{body},
tokrows AS (
  SELECT did, widx,
         list_filter(string_split(seq, '||'), x -> x <> '') AS ts
  FROM s{n_merges}
),
docagg AS (
  SELECT did,
         CAST(SUM(len(ts)) AS BIGINT) AS bpe_len,
         string_agg(array_to_string(ts, ' '), ' ' ORDER BY widx) AS joined,
         flatten(list(ts ORDER BY widx)) AS toks
  FROM tokrows GROUP BY did
)"""


def pack_bpe_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = DEFAULT_N_MERGES,
    max_words: int = DEFAULT_MAX_WORDS,
    budget: int = 512,
    n_shards: int = 8,
) -> str:
    """DuckDB oracle for BPE-driven token-budget packing: the
    train→tokenize chain supplies per-doc SUBWORD counts, then the
    same md5-shard cumulative-sum placement as pack_token_budget."""
    ctes = _tokenize_ctes_duck(table, id_col, text_col, n_merges, max_words)
    return f"""
WITH {ctes},
d AS (
  SELECT t.{id_col},
         COALESCE(a.bpe_len, 0) AS tok_len,
         CAST(CAST('0x' || substring(md5(CAST(t.{id_col} AS VARCHAR)), 1, 15) AS BIGINT)
              % {n_shards} AS BIGINT) AS shard,
         md5(CAST(t.{id_col} AS VARCHAR)) AS h
  FROM {table} t LEFT JOIN docagg a ON a.did = t.{id_col}
),
c AS (
  SELECT {id_col}, shard, tok_len,
         SUM(tok_len) OVER (PARTITION BY shard ORDER BY h, {id_col}
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - tok_len AS start_off
  FROM d
)
SELECT {id_col}, shard, tok_len,
       CAST(start_off // {budget} AS BIGINT) AS batch_id,
       CAST(start_off % {budget} AS BIGINT) AS batch_offset
FROM c
""".strip()


def vocab_after_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = DEFAULT_N_MERGES,
    max_words: int = DEFAULT_MAX_WORDS,
) -> DataFrame:
    """(token, freq, n_words) — the SUBWORD VOCABULARY after training:
    every symbol surviving in the capped word table's segmentations,
    with its frequency-weighted occurrence count and the number of
    distinct words containing it.  This is the artifact a tokenizer
    ships (merge table + symbol inventory); cost = the trainer plus
    one vocab-sized explode/agg."""
    spark = docs.sparkSession
    merges = [
        tuple(r)
        for r in sorted(
            train_merges(docs, text_col, n_merges, max_words).collect()
        )
    ]
    wc = word_counts(docs, text_col, max_words)
    chain = "seq"
    for _, pa, pb, merged, _ in merges:
        chain = f"replace({chain}, '|{pa}||{pb}|', '|{merged}|')"
    toks = wc.select(
        "w",
        "wf",
        F.explode(
            F.expr(f"filter(split({chain}, '\\\\|\\\\|'), x -> x != '')")
        ).alias("token"),
    )
    return toks.groupBy("token").agg(
        F.sum("wf").cast("long").alias("freq"),
        F.countDistinct("w").cast("long").alias("n_words"),
    )


def vocab_sql(
    table: str,
    text_col: str = "text",
    n_merges: int = DEFAULT_N_MERGES,
    max_words: int = DEFAULT_MAX_WORDS,
) -> str:
    """DuckDB oracle for :func:`vocab_after_merges` — the training
    chain's final word table, exploded and re-aggregated."""
    ctes = _train_ctes_duck(table, text_col, n_merges, max_words)
    return f"""
WITH {ctes},
toks AS (
  SELECT w, wf, unnest(list_filter(string_split(seq, '||'), x -> x <> '')) AS token
  FROM w{n_merges}
)
SELECT token, CAST(SUM(wf) AS BIGINT) AS freq,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
FROM toks GROUP BY token
""".strip()


def chunk_bpe_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = DEFAULT_N_MERGES,
    max_words: int = DEFAULT_MAX_WORDS,
    window: int = 48,
    stride: int = 32,
) -> str:
    """DuckDB oracle for sliding-window chunking over the BPE SUBWORD
    stream: the tokenize chain supplies each doc's token array, then
    the same integer-ceil window/stride/slice/digest rule as
    dedup/spans.chunk_sliding_windows_sql."""
    ctes = _tokenize_ctes_duck(table, id_col, text_col, n_merges, max_words)
    return f"""
WITH {ctes},
staged AS (
  SELECT did AS {id_col}, toks, CAST(len(toks) AS BIGINT) AS n
  FROM docagg
),
counted AS (
  SELECT {id_col}, toks, n,
         CASE WHEN n <= {window} THEN 1
              ELSE 1 + (n - {window} + {stride} - 1) // {stride}
         END AS nc
  FROM staged WHERE n > 0
),
chunks AS (
  SELECT {id_col}, toks, n, CAST(i AS BIGINT) AS chunk_idx,
         toks[CAST(i * {stride} + 1 AS BIGINT) :
              CAST(least(i * {stride} + {window}, n) AS BIGINT)] AS sl
  FROM counted, LATERAL unnest(generate_series(0, nc - 1)) t(i)
)
SELECT {id_col}, chunk_idx,
       CAST(chunk_idx * {stride} + 1 AS BIGINT) AS start_tok,
       CAST(len(sl) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(sl, ' ')) AS chunk_digest
FROM chunks
""".strip()
