"""Hadoop Archive (har://) read/write — sources/har.py.

Pins the index grammar against the reference's own definitions
(HarFileSystem.java:48 reader, HadoopArchives.java:570-699 writer):
URL-encoded names, hash-sorted _index, _masterindex hash-range
indirection, v2 props-in-partName dir rows.
"""

from __future__ import annotations

import os

import pytest

from hadoop_20_warehouse_spark.sources.har import (
    HarEntry,
    _format_entry,
    _parse_entry,
    har_hash,
    har_lookup,
    read_har_files,
    read_har_index,
    write_har,
)


def test_har_hash_is_java_string_hashcode():
    # values = Java String.hashCode & 0x7fffffff (31-based over UTF-16
    # units), computed independently
    def jhash(s):
        h = 0
        for ch in s:
            h = (31 * h + ord(ch)) & 0xFFFFFFFF
        return h & 0x7FFFFFFF

    for s in ["/", "/docs", "/docs/a.txt", "/x/ü é.bin", "/" + "q" * 300]:
        assert har_hash(s) == jhash(s)
    # surrogate-pair character hashes as TWO UTF-16 units, as Java does
    emoji = "/e/\U0001f600.txt"
    units = [
        int.from_bytes(emoji.encode("utf-16-be")[i : i + 2], "big")
        for i in range(0, len(emoji.encode("utf-16-be")), 2)
    ]
    h = 0
    for u in units:
        h = (31 * h + u) & 0xFFFFFFFF
    assert har_hash(emoji) == h & 0x7FFFFFFF


def test_har_entry_grammar_roundtrip():
    f = HarEntry("/docs/a b+c%.txt", False, "part-3", 123, 456)
    p = _parse_entry(_format_entry(f).rstrip())
    assert (p.name, p.part, p.start, p.length, p.is_dir) == (
        f.name, f.part, f.start, f.length, False,
    )
    assert p.props  # default deterministic props round-tripped
    d = HarEntry("/docs", True, "none", 0, 0, ["a b+c%.txt", "z.txt"])
    q = _parse_entry(_format_entry(d).rstrip())
    assert q.is_dir and q.children == d.children and q.name == "/docs"


def _fixture_df(spark, n=40):
    rows = [
        (
            f"/docs/d{i:03d}/file {i}.txt" if i % 3 else f"/top{i}.bin",
            bytearray(f"payload-{i}-".encode() + b"\x00\xffDATA" * (i % 7)),
        )
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "name string, payload binary"
    ).repartition(3)


def test_har_write_read_listing_and_files(spark, tmp_path):
    rows, df = _fixture_df(spark)
    out = str(tmp_path / "a.har")
    n = write_har(df, "name", "payload", out, num_indexes=7)
    assert n == len(rows)
    # several part files (one per non-empty partition), several master
    # ranges (num_indexes=7 forces blocks)
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert len(parts) >= 2
    master = open(os.path.join(out, "_masterindex")).read().splitlines()
    assert master[0].split(" ")[0] == "2"
    assert len(master) > 2
    # index is hash-sorted (the format's binary-search premise)
    entries = read_har_index(out)
    hashes = [har_hash(e.name) for e in entries]
    assert hashes == sorted(hashes)
    # listing covers members + synthesized dirs with children
    by_name = {e.name: e for e in entries}
    assert "/" in by_name and by_name["/"].is_dir
    assert "/docs" in by_name
    assert "file 1.txt" in by_name["/docs/d001"].children
    # distributed payload read-back, exact bytes
    got = {
        r["name"]: bytes(r["payload"])
        for r in read_har_files(spark, out).collect()
    }
    assert got == {name: bytes(payload) for name, payload in rows}
    # prefix filter
    docs_only = read_har_files(spark, out, prefix="/docs/").collect()
    assert all(r["name"].startswith("/docs/") for r in docs_only)
    assert len(docs_only) == sum(1 for nm, _ in rows if nm.startswith("/docs/"))


def test_har_lookup_uses_master_ranges(spark, tmp_path):
    rows, df = _fixture_df(spark, n=60)
    out = str(tmp_path / "b.har")
    write_har(df, "name", "payload", out, num_indexes=5)
    for name, payload in rows[::11]:
        e = har_lookup(out, name)
        assert e is not None and e.length == len(payload)
        with open(os.path.join(out, e.part), "rb") as fh:
            fh.seek(e.start)
            assert fh.read(e.length) == bytes(payload)
    assert har_lookup(out, "/definitely/not/there.txt") is None
    # dirs are found too
    d = har_lookup(out, "/docs")
    assert d is not None and d.is_dir


def test_har_version_gate_and_bad_names(spark, tmp_path):
    rows, df = _fixture_df(spark, n=6)
    out = str(tmp_path / "c.har")
    write_har(df, "name", "payload", out)
    master = os.path.join(out, "_masterindex")
    body = open(master, "rb").read()
    open(master, "wb").write(b"3 \n" + body.split(b"\n", 1)[1])
    with pytest.raises(ValueError, match="version 3"):
        read_har_index(out)
    bad = spark.createDataFrame(
        [("relative.txt", bytearray(b"x"))], "name string, payload binary"
    )
    with pytest.raises(ValueError, match="absolute"):
        write_har(bad, "name", "payload", str(tmp_path / "d.har"))


def test_har_duplicate_member_names_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [("/a.txt", bytearray(b"one")), ("/a.txt", bytearray(b"two"))],
        "name string, payload binary",
    )
    with pytest.raises(ValueError, match="duplicate har member"):
        write_har(df, "name", "payload", str(tmp_path / "dup.har"))
