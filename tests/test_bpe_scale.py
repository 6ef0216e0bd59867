"""Production-scale BPE (functions/bpe_scale.py): driver-local exact
training, batched top-B training, and the merge-count-independent
mapInPandas apply — pinned against the r11 Spark-round trainer, the
nested-replace apply, and each other."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from hadoop_20_warehouse_spark.catalog import load_table
from hadoop_20_warehouse_spark.functions import bpe as B
from hadoop_20_warehouse_spark.functions import bpe_scale as BS


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _collect_merges(df):
    return [tuple(r) for r in sorted(df.collect())]


def _wc_rows(spark, sf_dir, max_words=1000):
    wc = B.word_counts(_docs(spark, sf_dir), max_words=max_words)
    return [(r["w"], r["wf"]) for r in wc.select("w", "wf").collect()]


def test_replay_apply_equals_nested_replace(spark, sf_dir):
    """The mapInPandas replay worker must reproduce the nested-replace
    expression form token-exactly (same merge table, real corpus)."""
    docs = _docs(spark, sf_dir)
    merges = _collect_merges(B._train_merges_rounds(docs, n_merges=12))
    small = {
        r["doc_id"]: (r["bpe_len"], r["tok_digest"])
        for r in B.tokenize_with_merges(docs, merges).collect()
    }
    large = {
        r["doc_id"]: (r["bpe_len"], r["tok_digest"])
        for r in BS.tokenize_with_merges_large(docs, merges).collect()
    }
    assert small == large and len(small) > 0


def test_local_trainer_equals_spark_round_trainer(spark, sf_dir):
    """Driver-local sequential training == the r11 per-round Spark
    aggregation trainer, row for row (same word table, same depth)."""
    docs = _docs(spark, sf_dir)
    spark_rows = _collect_merges(B._train_merges_rounds(docs, n_merges=40))
    local = BS.train_merges_local(_wc_rows(spark, sf_dir), 40)
    assert [tuple(m) for m in local] == spark_rows


def test_local_trainer_exhaustion_parity(spark):
    """Early stop on an exhausted vocabulary: both trainers must stop
    at the same step with identical tables (tiny corpus: one word)."""
    docs = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
    spark_rows = _collect_merges(B._train_merges_rounds(docs, n_merges=10))
    wc = B.word_counts(docs)
    local = BS.train_merges_local(
        [(r["w"], r["wf"]) for r in wc.select("w", "wf").collect()], 10
    )
    assert [tuple(m) for m in local] == spark_rows
    assert len(local) == 2  # (a,b) -> ab, (ab,</w>) -> ab</w>, then done


def test_local_trainer_exhausts_cleanly_at_depth(spark, sf_dir):
    """Full exhaustion run: the 31-word documents vocabulary dies at
    ~106 merges; the trainer must stop, every word must be a single
    token, and the applied-mass identity must hold to the end."""
    wc = _wc_rows(spark, sf_dir)
    applied, state = [], []
    merges = BS.train_merges_local(
        wc, 10_000, applied_out=applied, state_out=state
    )
    assert 0 < len(merges) < 10_000
    assert all(len(toks) == 1 for toks, _ in state)
    initial = sum(wf * (len(w) + 1) for w, wf in wc)
    assert sum(wf * len(t) for t, wf in state) == initial - sum(applied)


def test_batched_b1_equals_sequential(spark, sf_dir):
    """batch=1 batched training IS the sequential trainer (the
    property the seq_prefix oracle relies on)."""
    docs = _docs(spark, sf_dir)
    batched = _collect_merges(
        BS.train_merges_batched(docs, rounds=20, batch=1)
    )
    local = BS.train_merges_local(_wc_rows(spark, sf_dir), 20)
    assert [tuple(m) for m in local] == batched


def test_dispatch_thresholds(spark, sf_dir):
    """bpe.train_merges / tokenize_with_merges route to the scale
    paths above LARGE_MERGE_THRESHOLD with identical semantics."""
    docs = _docs(spark, sf_dir)
    n = BS.LARGE_MERGE_THRESHOLD + 6
    via_dispatch = _collect_merges(B.train_merges(docs, n_merges=n))
    local = BS.train_merges_local(_wc_rows(spark, sf_dir), n)
    assert [tuple(m) for m in local] == via_dispatch
    tok = B.tokenize_with_merges(docs, via_dispatch)
    # the large path emits the same schema and digests as a direct call
    direct = BS.tokenize_with_merges_large(docs, via_dispatch)
    assert tok.collect() == direct.collect()


def test_tokenize_large_null_and_empty_text(spark):
    """NULL / empty / non-word documents tokenize to the empty stream
    (bpe_len 0, md5('') digest) — the r11 ADVICE contract."""
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "!!! ???"), (4, "ab")], schema=schema
    )
    merges = [(1, "a", "b", "ab", 1)]
    rows = {
        r["doc_id"]: (r["bpe_len"], r["tok_digest"])
        for r in BS.tokenize_with_merges_large(docs, merges).collect()
    }
    empty_digest = hashlib.md5(b"").hexdigest()
    for did in (1, 2, 3):
        assert rows[did] == (0, empty_digest)
    assert rows[4] == (2, hashlib.md5(b"ab </w>").hexdigest())
    # the small nested-replace form agrees on the same frame
    small = {
        r["doc_id"]: (r["bpe_len"], r["tok_digest"])
        for r in B.tokenize_with_merges(docs, merges).collect()
    }
    assert small == rows


def test_invariants_all_green_on_synth(spark, sf_dir):
    """The full-depth invariant package holds on the synthetic corpus
    (driver-local 2048-round run at sf0.001)."""
    from hadoop_20_warehouse_spark.inventory_analytics import _bpe_synth_docs

    docs = _bpe_synth_docs(spark, sf_dir)
    rows = {
        r["metric"]: r["val"]
        for r in BS.train_large_invariants(docs, n_merges=2048).collect()
    }
    assert rows["n_merges"] == 2048
    for k in (
        "applied_mass_ok",
        "replay_matches_training",
        "counts_nonincreasing",
        "merged_concat_ok",
        "steps_contiguous",
        "vocab_closure_ok",
    ):
        assert rows[k] == 1, k
    assert rows["initial_symbols"] > 0


def test_replay_word_overlap_semantics():
    """Runs merge non-overlapping left-to-right, exactly like
    replace('|a||a|', '|aa|'): 'aaaa' -> [aa, aa, </w>],
    'aaa' -> [aa, a, </w>]."""
    m = [("a", "a", "aa")]
    assert BS.replay_word("aaaa", m) == ["aa", "aa", "</w>"]
    assert BS.replay_word("aaa", m) == ["aa", "a", "</w>"]
    # chained merges replay in order
    m2 = [("a", "a", "aa"), ("aa", "aa", "aaaa")]
    assert BS.replay_word("aaaa", m2) == ["aaaa", "</w>"]


def test_replay_indexed_equals_plain():
    """The substring-prefiltered replay must equal the full-scan
    replay on adversarial inputs: duplicate merged strings with
    different splits, runs, EOW-suffix merges, merges that never fire,
    and random hex words under a trained-at-depth table."""
    import random

    rng = random.Random(12)
    # hand-built adversarial table: ("a","bc") and ("ab","c") both
    # produce "abc"; EOW merges; dead merges
    merges3 = [
        ("a", "b", "ab"),
        ("b", "c", "bc"),
        ("a", "bc", "abc"),
        ("ab", "c", "abc"),
        ("abc", "</w>", "abc</w>"),
        ("z", "z", "zz"),
        ("zz", "zz", "zzzz"),
        ("q", "x", "qx"),  # never fires below
    ]
    idx = BS.build_merge_index(merges3)
    for w in ["abc", "abcabc", "aabbcc", "zzzzz", "abca", "cab", "a", "zzz"]:
        assert BS.replay_word_indexed(w, idx) == BS.replay_word(w, merges3), w
    # random words under a table trained on them
    words = [
        "".join(rng.choice("0123456789abcdef") for _ in range(rng.randint(1, 24)))
        for _ in range(200)
    ]
    wc = [(w, 1) for w in sorted(set(words))]
    trained = BS.train_merges_local(wc, 300)
    t3 = [(m[1], m[2], m[3]) for m in trained]
    tidx = BS.build_merge_index(t3)
    for w in words:
        assert BS.replay_word_indexed(w, tidx) == BS.replay_word(w, t3), w


def test_batched_short_round_strict_and_warn(spark):
    """ADVICE r12: a round yielding fewer than ``batch`` pairs makes
    the fixed rounds*batch SQL oracle silently diverge — strict=True
    must raise, and the default must warn loudly while still
    returning the partial table."""
    import warnings

    import pytest

    # one word 'ab' -> exactly 2 merges possible; rounds*batch = 40
    docs = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="near exhaustion"):
        BS.train_merges_batched(docs, rounds=4, batch=10, strict=True)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = BS.train_merges_batched(docs, rounds=4, batch=10)
    assert any("short round" in str(w.message) for w in caught)
    assert out.count() == 2  # (a,b)->ab, (ab,</w>)->ab</w>
    # full batches raise nothing even under strict
    full = BS.train_merges_batched(docs, rounds=2, batch=1, strict=True)
    assert full.count() == 2


def test_tokenize_large_unicode_whitespace_matches_small(spark):
    """ADVICE r12 (medium): the large apply path must split on JAVA
    \\s (ASCII [ \\t\\n\\x0b\\f\\r]) like the Spark-side small path and
    the trainer's word_counts — python re \\s also matches U+00A0/
    U+2028 etc., which would tokenize the same (docs, merges) input
    differently on either side of LARGE_MERGE_THRESHOLD."""
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    docs = spark.createDataFrame(
        [
            (1, "ab ab"),       # NBSP: NOT whitespace in Java \s
            (2, "ab ab"),       # LINE SEPARATOR: same
            (3, "ab ab"),       # OGHAM SPACE MARK: same
            (4, "ab\tab\nab\x0bab\fab\rab ab"),  # all Java \s chars
            (5, "ab  ab"),      # NBSP adjacent to real space
        ],
        schema=schema,
    )
    merges = [(1, "a", "b", "ab", 1)]
    small = {
        r["doc_id"]: (r["bpe_len"], r["tok_digest"])
        for r in B.tokenize_with_merges(docs, merges).collect()
    }
    large = {
        r["doc_id"]: (r["bpe_len"], r["tok_digest"])
        for r in BS.tokenize_with_merges_large(docs, merges).collect()
    }
    assert small == large
    # the NBSP-glued token fails the [a-z0-9]+ filter on BOTH sides ->
    # empty stream; the Java-\s doc yields 7 'ab' words -> 14 tokens
    empty_digest = hashlib.md5(b"").hexdigest()
    assert large[1] == (0, empty_digest)
    assert large[4][0] == 14
    # NBSP glues to the first word, second survives the space split
    assert large[5][0] == 2
