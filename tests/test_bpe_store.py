"""Tokenizer artifact store (functions/bpe_store.py): round-trip,
version resolution, and the concurrency contract — an auto-assigned
version must never silently replace a committed directory (VERDICT
r13 #5 / ADVICE r13), and explicit-version overwrite swaps via
rename-aside rather than rmtree-then-rename."""

from __future__ import annotations

import os

import pytest

from hadoop_20_warehouse_spark.functions import bpe_store as BST
from hadoop_20_warehouse_spark.functions.bpe_scale import _MERGE_SCHEMA


def _merges_df(spark, rows):
    return spark.createDataFrame(rows, schema=_MERGE_SCHEMA)


def _vocab_df(spark, rows):
    return spark.createDataFrame(rows, "token string, freq long, n_words long")


MERGES_A = [(1, "a", "b", "ab", 10), (2, "ab", "c", "abc", 7)]
MERGES_B = [(1, "x", "y", "xy", 3)]
VOCAB = [("ab", 10, 2), ("c", 7, 1)]


def test_roundtrip_and_latest_resolution(spark, tmp_path):
    store = str(tmp_path / "store")
    v1 = BST.write_tokenizer(
        _merges_df(spark, MERGES_A), _vocab_df(spark, VOCAB), store
    )
    assert v1 == 1
    v2 = BST.write_tokenizer(
        _merges_df(spark, MERGES_B), _vocab_df(spark, VOCAB), store
    )
    assert v2 == 2
    assert BST.list_versions(store) == [1, 2]
    art = BST.read_tokenizer(spark, store)  # latest
    assert art["version"] == 2
    assert BST.load_merges(art) == MERGES_B
    art1 = BST.read_tokenizer(spark, store, version=1)
    assert BST.load_merges(art1) == MERGES_A
    assert art1["manifest"]["n_merges"] == 2


def test_auto_version_race_raises_instead_of_clobbering(
    spark, tmp_path, monkeypatch
):
    """Two writers both resolve version=None to the same number: the
    loser must raise FileExistsError, and the winner's committed
    artifact must survive untouched (simulated by making the loser's
    list_versions read stale)."""
    store = str(tmp_path / "store")
    BST.write_tokenizer(_merges_df(spark, MERGES_A), _vocab_df(spark, VOCAB), store)
    monkeypatch.setattr(BST, "list_versions", lambda p: [])  # stale read
    with pytest.raises(FileExistsError):
        BST.write_tokenizer(
            _merges_df(spark, MERGES_B), _vocab_df(spark, VOCAB), store
        )
    monkeypatch.undo()
    # winner untouched, and no _tmp litter left behind
    art = BST.read_tokenizer(spark, store, version=1)
    assert BST.load_merges(art) == MERGES_A
    assert [n for n in os.listdir(store) if n.startswith("_tmp")] == []


def test_explicit_version_overwrite_swaps_cleanly(spark, tmp_path):
    store = str(tmp_path / "store")
    BST.write_tokenizer(
        _merges_df(spark, MERGES_A), _vocab_df(spark, VOCAB), store, version=7
    )
    BST.write_tokenizer(
        _merges_df(spark, MERGES_B), _vocab_df(spark, VOCAB), store, version=7
    )
    assert BST.list_versions(store) == [7]
    art = BST.read_tokenizer(spark, store, version=7)
    assert BST.load_merges(art) == MERGES_B
    assert [n for n in os.listdir(store) if n.startswith("_old")] == []
