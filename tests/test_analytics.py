"""Unit tests for the round-8 analytics operators (the DuckDB oracle
equivalence is the driver's job; these pin the algorithmic invariants
on shapes the driver tables lack)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pagerank_integer_hand_computed(spark):
    """Exact integer arithmetic on a 3-node chain a->b->c, 2 rounds,
    hand-computed: the library must reproduce it bit-for-bit (the
    cross-engine contract depends on this arithmetic being THE
    definition, not an approximation of float PageRank)."""
    from hadoop_20_warehouse_spark.graph import pagerank_integer

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    s = 1_000_000_000
    base = 15 * s // 100
    # round 1: inc(b) = r(a)//1 = s; inc(c) = r(b)//1 = s
    r1 = {"a": base, "b": base + 85 * s // 100, "c": base + 85 * s // 100}
    # round 2: inc(b) = r1(a); inc(c) = r1(b)
    r2 = {
        "a": base,
        "b": base + 85 * r1["a"] // 100,
        "c": base + 85 * r1["b"] // 100,
    }
    got = {
        r.node: r.r
        for r in pagerank_integer(edges, iterations=2).collect()
    }
    assert got == r2


def test_pagerank_mass_bound_and_hub(spark):
    """Star graph: every leaf links to the hub — the hub must rank
    first, total mass must not exceed nodes*scale (dangling mass only
    leaks out, never in), and every rank >= the teleport base."""
    from hadoop_20_warehouse_spark.graph import PR_SCALE, pagerank_integer

    leaves = [(f"n{i}", "hub") for i in range(50)]
    edges = spark.createDataFrame(leaves, ["src", "dst"])
    rows = pagerank_integer(edges, iterations=3).collect()
    ranks = {r.node: r.r for r in rows}
    assert max(ranks, key=ranks.get) == "hub"
    base = 15 * PR_SCALE // 100
    assert all(r >= base for r in ranks.values())
    assert sum(ranks.values()) <= len(ranks) * PR_SCALE


def test_mad_gate_flags_planted_outlier(spark, tmp_path):
    """One hour with 100x volume against a flat baseline must be the
    only flagged cell, and the emitted med/mad must match the
    baseline's exact values."""
    import datetime as dt

    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_events_anomaly_mad,
    )
    import hadoop_20_warehouse_spark.inventory_analytics as A

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for h in range(24):
        n = 500 if h == 7 else 5  # planted spike at hour 7
        for i in range(n):
            rows.append((h * 1000 + i, t0 + dt.timedelta(hours=h), 1, "click", 0.0, ""))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import os

    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = q_events_anomaly_mad(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cnt == 500 and r.hour.startswith("2024-01-01 07")
    assert r.med == 5.0 and r.mad == 0.0


def test_fuzzy_edit_blocking_catches_boundary_straddle(spark, tmp_path):
    """A planted near-dup pair whose lengths fall in ADJACENT length
    buckets (lengths 31 and 33 straddle a boundary at the current
    _EDIT_BLOCK=16 — buckets 1 vs 2; the inline assert guards that
    they really do straddle if the width is ever retuned) must still
    be found — the completeness property the +1 overlap row exists
    for — and a far pair must not."""
    import os

    from hadoop_20_warehouse_spark.inventory_analytics import (
        _EDIT_BLOCK,
        q_dedup_fuzzy_edit,
    )

    near_a = "x" * 31              # bucket 0
    near_b = "x" * 31 + "yz"       # len 33 -> bucket 1, distance 2
    far = "q" * 300
    df = spark.createDataFrame(
        [(1, near_a, "en", "s", len(near_a)),
         (2, near_b, "en", "s", len(near_b)),
         (3, far, "en", "s", len(far))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert len(near_a) // _EDIT_BLOCK != len(near_b) // _EDIT_BLOCK
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "documents.parquet"))
    out = [(r.id_a, r.id_b, r.dist) for r in q_dedup_fuzzy_edit(spark, d).collect()]
    assert out == [(1, 2, 2)]


def test_topk_store_merge_equals_direct(spark, tmp_path):
    """The per-day partial store merged must equal the direct global
    aggregate — on a frame with users spanning days (the associativity
    contract the registered query's oracle checks at sf0.01)."""
    import datetime as dt
    import os

    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_store_topk_incremental,
    )

    rows = []
    t0 = dt.datetime(2024, 3, 1)
    eid = 0
    for day in range(3):
        for u, n in ((1, 5), (2, 3), (3, day + 1)):
            for _ in range(n):
                rows.append((eid, t0 + dt.timedelta(days=day), u, "e", 0.0, ""))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = [(r.user_id, r.total_events) for r in q_store_topk_incremental(spark, d).collect()]
    assert out == [(1, 15), (2, 9), (3, 6)]


def test_zorder_interleave_hand_computed(spark):
    """z(x=3, y=1) = x bits at even positions, y bits at odd:
    1 + 4 (x=0b11) + 2 (y=0b1) = 7; and z(5, 2) = 1 + 16 + 8 = 25."""
    from hadoop_20_warehouse_spark.inventory_analytics import _z_expr

    expr = _z_expr("x", "y", shr=lambda e, i: f"shiftright(({e}), {i})")
    df = spark.createDataFrame([(3, 1), (5, 2)], ["x", "y"])
    got = [r[0] for r in df.selectExpr(f"{expr} AS z").collect()]
    assert got == [7, 25]


def test_containment_finds_planted_subset(spark, tmp_path):
    """A doc that is a strict substring (token-subset) of a larger doc
    must surface with containment 1.0; an unrelated doc pairs with
    nothing (its grams are unique)."""
    import os

    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_dedup_containment,
    )

    core = "alpha beta gamma delta epsilon zeta eta theta"
    big = "intro words here " + core + " trailing words after"
    other = "completely different tokens one two three four five six"
    df = spark.createDataFrame(
        [(1, big, "en", "s", len(big)),
         (2, core, "en", "s", len(core)),
         (3, other, "en", "s", len(other))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "documents.parquet"))
    out = {(r.id_a, r.id_b): r.containment
           for r in q_dedup_containment(spark, d).collect()}
    assert out == {(1, 2): 1.0}


def test_pagerank_checkpoint_every_preserves_ranks(spark):
    """checkpoint_every (the long-run lineage truncation) must not
    change a single rank — same graph, with and without."""
    from hadoop_20_warehouse_spark.graph import pagerank_integer

    edges = spark.createDataFrame(
        [(i, (i * 7) % 20) for i in range(60)], ["src", "dst"]
    )
    plain = {
        r.node: r.r for r in pagerank_integer(edges, iterations=4).collect()
    }
    ckpt = {
        r.node: r.r
        for r in pagerank_integer(
            edges, iterations=4, checkpoint_every=1
        ).collect()
    }
    assert plain == ckpt


def test_deciles_by_source_keeps_null_source_docs(spark, tmp_path):
    """A NULL-source doc must SURVIVE at decile 1 (left join +
    coalesce-to-empty), matching the DuckDB oracle's correlated
    COUNT(*) semantics — an inner join would silently drop it (ADVICE
    r8).  Both engines are run on the same synthetic table and their
    full results compared."""
    import os

    import duckdb

    from hadoop_20_warehouse_spark.inventory_analytics import (
        _DECILE_GRP_SQL,
        q_corpus_length_deciles_by_source,
    )

    rows = [
        (i, " ".join(["w"] * (i + 1)), "en", "a" if i < 20 else "b", 10)
        for i in range(40)
    ]
    rows.append((99, "one two three", "en", None, 13))
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "documents.parquet"))

    got = {
        r.doc_id: (r.source, r.tok_len, r.decile)
        for r in q_corpus_length_deciles_by_source(spark, d).collect()
    }
    assert 99 in got and got[99] == (None, 3, 1)
    assert len(got) == 41

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{os.path.join(d, 'documents.parquet')}/*.parquet')"
    )
    want = {
        int(doc_id): (src, int(tok), int(dec))
        for doc_id, src, tok, dec in con.execute(_DECILE_GRP_SQL).fetchall()
    }
    assert got == want


def test_countmin_store_never_undercounts_and_merges(spark, tmp_path):
    """Count-Min store (inventory_ext.q_store_countmin_freq) on a
    synthetic skewed corpus spanning days: every probe estimate >=
    its exact count (the one-sided CM contract), the heavy key's
    estimate is sane, and the day-partitioned store merged by sum
    equals what a single-pass sketch would give (associativity —
    counts are cell-wise sums either way)."""
    import datetime as dt
    import os

    from hadoop_20_warehouse_spark.inventory_ext import q_store_countmin_freq

    rows = []
    t0 = dt.datetime(2024, 5, 1)
    eid = 0
    # user u occurs freq[u] times, spread over 4 days
    freq = {1: 40, 2: 13, 3: 7, 4: 1, 5: 1, 6: 2, 7: 9}
    for u, n in freq.items():
        for i in range(n):
            rows.append((eid, t0 + dt.timedelta(days=i % 4), u, "e", 0.0, ""))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = {r.user_id: r for r in q_store_countmin_freq(spark, d).collect()}
    assert out, "probe set empty"
    for u, r in out.items():
        assert r.exact_n == freq[u]
        assert r.cm_estimate >= r.exact_n, (u, r)
        assert r.no_undercount
        # 7 keys in 4x64 cells: collisions possible but bounded by the
        # total increment mass
        assert r.cm_estimate <= sum(freq.values())


# ---------------------------------------------------------------------------
# BPE trainer/tokenizer (functions/bpe.py) vs a literal python reference


def _py_bpe(word_freqs: dict, n_merges: int):
    """Literal Sennrich-style reference: greedy single-pass merges,
    ties (count DESC, pair lexicographic ASC)."""
    seqs = {w: [*w, "</w>"] for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict = {}
        for w, toks in seqs.items():
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = (
                    counts.get((toks[i], toks[i + 1]), 0) + word_freqs[w]
                )
        if not counts:
            break
        (pa, pb), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, pa, pb, pa + pb, cnt))
        for w, toks in seqs.items():
            out = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == pa and toks[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def test_bpe_train_matches_python_reference(spark):
    from hadoop_20_warehouse_spark.functions import bpe as B

    rows = [
        (0, "aaaa aaaa ab"),
        (1, "banana bandana"),
        (2, "aaaa banana banana"),
        (3, "ab ab ab cable"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wf: dict = {}
    for _, t in rows:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    want, seqs = _py_bpe(wf, 8)
    got = sorted(map(tuple, B.train_merges(docs, n_merges=8).collect()))
    assert got == sorted(want)
    # tokenize must reproduce the reference's final segmentations,
    # including the greedy run semantics (aaaa with merge (a,a) -> aa aa)
    merges = got
    tk = {
        r["doc_id"]: r
        for r in B.tokenize_with_merges(docs, merges).collect()
    }
    import hashlib

    for did, t in rows:
        toks = [tok for w in t.split() for tok in seqs[w]]
        assert tk[did]["bpe_len"] == len(toks)
        assert (
            tk[did]["tok_digest"]
            == hashlib.md5(" ".join(toks).encode()).hexdigest()
        )


def test_bpe_early_stop_on_exhausted_vocab(spark):
    """More requested merges than the vocabulary supports: the trainer
    must stop (not loop or emit duplicates) and tokenize must still
    apply the partial table."""
    from hadoop_20_warehouse_spark.functions import bpe as B

    docs = spark.createDataFrame([(0, "ab ab ba")], "doc_id long, text string")
    rows = B.train_merges(docs, n_merges=50).collect()
    # vocab {ab:2, ba:1} supports at most 4 merges (2 per word shape)
    assert 0 < len(rows) <= 8
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
    tk = B.tokenize_with_merges(docs, [tuple(r) for r in rows]).collect()
    assert tk[0]["bpe_len"] >= 1


def test_trigram_stream_cross_engine_totality(spark):
    """The natural-BPE word-row derivation must agree between engines
    on exactly the inputs round 14 hardened: docs with <3 words (both
    sides drop them — no empty-text phantom row), vertical tab as a
    word separator (Java \\s includes \\x0B; the oracle's explicit
    class must too), tabs/newlines, and non-[a-z0-9] tokens filtered
    after lowering."""
    import duckdb

    from hadoop_20_warehouse_spark.inventory_analytics import (
        _BPEN_WORDROWS,
        trigram_stream,
    )

    rows = [
        (1, "alpha beta gamma delta"),          # plain
        (2, "one two"),                          # <3 words: dropped
        (3, ""),                                 # empty: dropped
        (4, "a\x0bb\x0bc\x0bd"),                # \x0B separates words
        (5, "Mixed CASE tokens here"),           # lowered
        (6, "x1 y2! z3 w4"),                     # 'y2!' filtered out
        (7, "t\tu\nv\rw\fx"),                   # every ASCII ws class
        (8, "solo"),                             # 1 word: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"] for r in trigram_stream(df).collect()
    }

    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        int(did): txt
        for did, txt in con.sql(
            f"SELECT did, string_agg(w, ' ' ORDER BY j) FROM ({_BPEN_WORDROWS}) GROUP BY did"
        ).fetchall()
    }
    con.close()
    assert got == want
    assert 2 not in got and 3 not in got and 8 not in got  # dropped on BOTH sides
    assert got[4] == "abc bcd"  # \x0B split identically
    assert 6 in got and "y2" not in got[6]


def test_fertility_invariants(spark, sf_dir):
    """tokenizer_fertility_by_lang: every word is >= 1 subword so
    fertility_milli >= 1000; subword streams never contain more chars
    than their words so chars_per_subword_milli <= 1000 * max word
    len; doc counts sum to the corpus size."""
    from hadoop_20_warehouse_spark.catalog import load_table
    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_tokenizer_fertility_by_lang,
    )

    rows = q_tokenizer_fertility_by_lang(spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        if r.total_words:
            assert r.fertility_milli >= 1000
            assert r.total_subwords >= r.total_words
        if r.total_subwords:
            assert r.chars_per_subword_milli >= 1000  # a subword is >= 1 char


def test_association_rules_hand_computed(spark, tmp_path):
    """basket_association_rules vs hand math on four fixed baskets:
    {1,2,3} {1,2} {1,2} {3,4} with minsup 3 → only the 1→2 / 2→1
    rules survive; support 750‰ (3/4), confidence 1000‰ (3/3),
    lift 1333‰ (4·3 // 3·3)."""
    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_basket_association_rules,
    )

    rows = []
    for oid, items in enumerate([(1, 2, 3), (1, 2), (1, 2), (3, 4)]):
        for it in items:
            rows.append((oid, it))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        (r.ante, r.cons): (r.c_pair, r.c_ante, r.support_milli,
                           r.conf_milli, r.lift_milli)
        for r in q_basket_association_rules(spark, str(tmp_path)).collect()
    }
    assert got == {
        (1, 2): (3, 3, 750, 1000, 1333),
        (2, 1): (3, 3, 750, 1000, 1333),
    }


def test_spend_trend_hand_computed(spark, tmp_path):
    """customer_spend_trend: known up/down/flat/degenerate cases —
    +100 cents/day, -100 cents/day (negative quotient must truncate
    toward zero identically on both engines), zero slope, and the
    single-order NULL guard."""
    import datetime as dt

    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_customer_spend_trend,
    )

    base = dt.datetime(2020, 1, 1)
    rows = []
    for i in range(3):  # cust 1: +1.00/day, cust 2: -1.00/day
        rows.append((1, 10.0 + i, base + dt.timedelta(days=i)))
        rows.append((2, 10.0 - i, base + dt.timedelta(days=i)))
        rows.append((3, 5.0, base + dt.timedelta(days=i)))  # flat
    rows.append((4, 7.0, base))  # single order -> den 0 -> NULL
    spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.o_custkey: (r.n, r.slope_milli_cents_per_day)
        for r in q_customer_spend_trend(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (3, 100000),   # +100 cents/day in milli
        2: (3, -100000),
        3: (3, 0),
        4: (1, None),
    }


def test_dq_report_catches_planted_violations(spark, tmp_path):
    """dq_integrity_report on a corpus with PLANTED violations: an
    orphan lineitem, a duplicated order key, a negative price, an
    out-of-range quantity, an empty document — each check must count
    exactly its plant (clean fixtures only prove the checks return 0;
    this proves they FIRE)."""
    import datetime as dt

    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_dq_integrity_report,
    )

    t = dt.datetime(2020, 1, 1)
    spark.createDataFrame(
        [(1, "a", 1, 10.0, "m"), (2, "b", 1, 10.0, "m")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [
            (10, 1, "O", 5.0, t, "1-URGENT"),
            (10, 1, "O", 5.0, t, "1-URGENT"),   # dup key (2 rows -> 1 excess)
            (11, 99, "O", -3.0, t, "1-URGENT"),  # orphan cust + negative price
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, 100, 5.0), (999, 100, 200.0)],  # orphan order + bad qty
        "l_orderkey long, l_partkey long, l_quantity double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "hello", "en", "s", 5), (2, "", "en", "s", 0), (1, "dup", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.check_name: (r.n_violations, r.n_checked)
        for r in q_dq_integrity_report(spark, str(tmp_path)).collect()
    }
    assert got == {
        "lineitem_orphan_orderkey": (1, 2),
        "orders_orphan_custkey": (1, 3),
        "orders_orderkey_duplicates": (1, 3),
        "orders_nonpositive_totalprice": (1, 3),
        "lineitem_quantity_out_of_range": (1, 2),
        "documents_null_or_empty_text": (1, 3),
        "documents_doc_id_duplicates": (1, 3),
    }


def test_profile_column_stats_single_scan_and_values(spark, tmp_path):
    """profile_column_stats: values hand-checked on a tiny orders
    table with NULLs (null count, distinct excludes nulls, numeric
    min/max ranked before rendering — '9' vs '10' must rank
    numerically), and the plan reads the parquet exactly once."""
    import datetime as dt

    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_profile_column_stats,
    )

    t = lambda d: dt.datetime(2020, 1, d)  # noqa: E731
    spark.createDataFrame(
        [
            (9, 1, "O", 1.25, t(1), "1-URGENT"),
            (10, None, "F", 2.50, t(2), "5-LOW"),
            (11, 1, None, None, None, "5-LOW"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    df = q_profile_column_stats(spark, str(tmp_path))
    got = {
        r.column_name: (r.n_rows, r.n_nulls, r.n_distinct, r.min_repr, r.max_repr)
        for r in df.collect()
    }
    assert got["o_orderkey"] == (3, 0, 3, "9", "11")  # numeric rank
    assert got["o_custkey"] == (3, 1, 1, "1", "1")
    assert got["o_orderstatus"] == (3, 1, 2, "F", "O")
    assert got["o_totalprice"] == (3, 1, 2, "125", "250")
    assert got["o_orderdate"] == (3, 1, 2, "18262", "18263")
    assert got["o_orderpriority"] == (3, 0, 2, "1-URGENT", "5-LOW")
    # one scan: the single-agg + stack plan reads the file once (AQE's
    # toString echoes the initial plan below the final one — count
    # only the final section) and pivots via Expand, never a re-scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "Expand" in final


def test_skyline_matches_naive_domination(spark, tmp_path):
    """part_price_skyline vs the O(n²) domination definition on a
    random part table with planted ties: a part is on the front iff
    NO other part has (size >=, price <=) with at least one strict —
    including keeping BOTH parts of an equal-(size, price) tie."""
    import random as _r

    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_part_price_skyline,
    )

    rng = _r.Random(41)
    rows = [
        (i, f"p{i}", "b", "t", rng.randint(1, 12), rng.randint(100, 999) / 10.0)
        for i in range(80)
    ]
    rows.append((900, "tie1", "b", "t", rows[0][4], rows[0][5]))  # tie plant
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))

    pts = [(k, s, round(p * 100)) for k, _n, _b, _t, s, p in rows]
    want = {
        k
        for k, s, c in pts
        if not any(
            (s2 >= s and c2 <= c and (s2 > s or c2 < c))
            for _k2, s2, c2 in pts
        )
    }
    got = {r.p_partkey for r in q_part_price_skyline(spark, str(tmp_path)).collect()}
    assert got == want and len(got) >= 2


def test_out_of_order_report_catches_planted_lateness(spark, tmp_path):
    """events_out_of_order_report on a log with PLANTED inversions:
    user 1 has two late arrivals (worst 90 minutes), user 2 is clean
    — the driver fixture is fully ordered, so this test is where the
    detector proves it FIRES."""
    import datetime as dt

    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_events_out_of_order_report,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # (event_id = arrival order, user, event time)
        (1, 1, t0 + 10 * m),
        (2, 1, t0 + 20 * m),
        (3, 1, t0 + 5 * m),    # 15 min late
        (4, 1, t0 + 30 * m),
        (5, 1, t0 - 60 * m),   # 90 min late (worst)
        (6, 2, t0 + 1 * m),
        (7, 2, t0 + 2 * m),
    ]
    spark.createDataFrame(
        [(e, t, u, "click", 0.0, "") for e, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.user_id: (r.n_events, r.n_inversions, r.max_lateness_us)
        for r in q_events_out_of_order_report(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (5, 2, 90 * 60 * 1_000_000),
        2: (2, 0, 0),
    }


def test_skew_profile_flags_planted_hot_key(spark, tmp_path):
    """skew_profile_report on a table with one planted hot order key
    (600 of 1000 rows) over an otherwise uniform key space: the hot
    key must dominate top_share and be the only >10x-mean key on the
    order side; the part side stays uniform with zero hot keys."""
    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_skew_profile_report,
    )

    rows = [(999, i % 50) for i in range(600)]  # hot orderkey 999
    rows += [(i % 400, i % 50) for i in range(400)]  # uniform rest
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r.join_key: (r.n_keys, r.n_rows, r.max_rows_per_key,
                     r.top_share_micro, r.n_hot_keys)
        for r in q_skew_profile_report(spark, str(tmp_path)).collect()
    }
    assert got["l_orderkey"][1] == 1000
    assert got["l_orderkey"][2] == 600
    assert got["l_orderkey"][3] == 600000  # 60% in ppm
    assert got["l_orderkey"][4] == 1       # exactly the planted key
    assert got["l_partkey"][0] == 50 and got["l_partkey"][4] == 0


def test_activity_coverage_hand_computed_with_engulfed_interval(spark, tmp_path):
    """user_activity_coverage on hand-built intervals including an
    ENGULFED one (starts and ends inside a prior interval — the case
    where lag(e) instead of max(e) would wrongly reopen the island):
    user 1 has events at 0, 2, 20 minutes (5-min windows → islands
    [0,7] and [20,25] = 2 intervals, 12 min covered); user 2's three
    bursts merge into one island."""
    import datetime as dt

    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_user_activity_coverage,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + 2 * m),
        (3, 1, t0 + 20 * m),
        (4, 2, t0),
        (5, 2, t0 + 4 * m),
        (6, 2, t0 + 8 * m),
    ]
    spark.createDataFrame(
        [(e, t, u, "click", 0.0, "") for e, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.user_id: (r.n_intervals, r.covered_us)
        for r in q_user_activity_coverage(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (2, 12 * 60 * 1_000_000),
        2: (1, 13 * 60 * 1_000_000),
    }


def test_transition_matrix_hand_computed(spark, tmp_path):
    """events_transition_matrix on a fixed two-user journey: counts
    and per-milles hand-checked; cross-user adjacency must NOT count
    (the lag partitions by user)."""
    import datetime as dt

    from hadoop_20_warehouse_spark.inventory_analytics import (
        q_events_transition_matrix,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    journeys = {1: ["view", "click", "view", "click", "buy"],
                2: ["view", "buy"]}
    rows, eid = [], 0
    for u, steps in journeys.items():
        for i, s in enumerate(steps):
            rows.append((eid, t0 + i * m, u, s, 0.0, ""))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.prev_type, r.next_type): (r.n, r.p_milli)
        for r in q_events_transition_matrix(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("view", "click"): (2, 666),   # 2 of view's 3 exits
        ("view", "buy"): (1, 333),
        ("click", "view"): (1, 500),
        ("click", "buy"): (1, 500),
    }


def test_k_anonymity_flags_planted_rare_and_homogeneous(spark, tmp_path):
    """privacy_k_anonymity: a planted 2-member QI class trips the
    k-violation, a planted class whose orders all share one priority
    trips the l-violation, and a large diverse class is absent."""
    import os

    from hadoop_20_warehouse_spark.inventory_analytics import (
        _KANON_K,
        q_privacy_k_anonymity,
    )

    cust_rows = []
    # class A (nation 1, AUTOMOBILE, bucket 0): k members, diverse -> clean
    for i in range(_KANON_K):
        cust_rows.append((100 + i, 1, "AUTOMOBILE", 500.0))
    # class B (nation 2, MACHINERY, bucket 0): TWO members -> k-violation
    cust_rows += [(200, 2, "MACHINERY", 10.0), (201, 2, "MACHINERY", 20.0)]
    # class C (nation 3, FURNITURE, bucket 1): k members but every
    # order shares one priority -> l-violation
    for i in range(_KANON_K):
        cust_rows.append((300 + i, 3, "FURNITURE", 1500.0))
    spark.createDataFrame(
        [(k, n, m, b) for k, n, m, b in cust_rows],
        "c_custkey long, c_nationkey long, c_mktsegment string, "
        "c_acctbal double",
    ).write.parquet(os.path.join(str(tmp_path), "customer.parquet"))
    orders = []
    oid = 1
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    for i in range(_KANON_K):  # diverse priorities for class A
        orders.append((oid, 100 + i, pri[i % len(pri)]))
        oid += 1
    orders.append((oid, 200, pri[0])); oid += 1
    orders.append((oid, 201, pri[1])); oid += 1
    for i in range(_KANON_K):  # homogeneous priority for class C
        orders.append((oid, 300 + i, "5-LOW"))
        oid += 1
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderpriority string"
    ).write.parquet(os.path.join(str(tmp_path), "orders.parquet"))

    got = {
        (r.nationkey, r.mktsegment): (r.n_members, r.l_div,
                                      r.k_violation, r.l_violation)
        for r in q_privacy_k_anonymity(spark, str(tmp_path)).collect()
    }
    assert (1, "AUTOMOBILE") not in got          # clean class absent
    assert got[(2, "MACHINERY")] == (2, 2, True, False)
    assert got[(3, "FURNITURE")] == (_KANON_K, 1, False, True)
