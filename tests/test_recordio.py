"""Record I/O wire-format codec tests (sources/recordio.py).

Byte-level golden vectors pin the zero-compressed vint encoding to the
documented format (io/WritableUtils.java:246-288) independently of the
decoder; hypothesis round-trips cover the full value space; a Spark
file round-trip exercises the distributed read/write path end to end.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from hadoop_20_warehouse_spark.sources.recordio import (
    csv_escape,
    csv_unescape,
    decode_record_csv,
    decode_records_binary,
    encode_record_binary,
    encode_record_csv,
    read_record_binary,
    read_record_csv,
    read_vlong,
    write_record_binary,
    write_record_csv,
    write_vlong,
)
from hadoop_20_warehouse_spark.types import parse_record_ddl

# --- vint/vlong golden vectors (derived by hand from the documented
# --- encoding: 1 byte for -112..127; else length byte -113..-120
# --- (positive) / -121..-128 (negative, one's complement), payload
# --- high-byte-first) ------------------------------------------------------

GOLDEN_VLONG = [
    (0, bytes([0x00])),
    (127, bytes([0x7F])),
    (-112, bytes([0x90])),  # -112 & 0xFF
    (128, bytes([0x8F, 0x80])),  # len=-113 (1 payload byte)
    (-113, bytes([0x87, 0x70])),  # len=-121, payload = ~(-113) = 112
    (255, bytes([0x8F, 0xFF])),
    (256, bytes([0x8E, 0x01, 0x00])),  # len=-114 (2 payload bytes)
    (2**31 - 1, bytes([0x8C, 0x7F, 0xFF, 0xFF, 0xFF])),
    (-(2**31), bytes([0x84, 0x7F, 0xFF, 0xFF, 0xFF])),  # ~x = 2^31-1
    (2**63 - 1, bytes([0x88] + [0x7F] + [0xFF] * 7)),
    (-(2**63), bytes([0x80] + [0x7F] + [0xFF] * 7)),
]


@pytest.mark.parametrize("value,encoded", GOLDEN_VLONG)
def test_vlong_golden(value, encoded):
    buf = bytearray()
    write_vlong(buf, value)
    assert bytes(buf) == encoded
    decoded, pos = read_vlong(bytes(buf), 0)
    assert decoded == value and pos == len(encoded)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_vlong_roundtrip(v):
    buf = bytearray()
    write_vlong(buf, v)
    decoded, pos = read_vlong(bytes(buf), 0)
    assert decoded == v and pos == len(buf)


# --- CSV escaping ----------------------------------------------------------


def test_csv_escape_golden():
    assert csv_escape("a,b\nc%}d\r\0") == "a%2Cb%0Ac%25%7Dd%0D%00"
    assert csv_unescape("a%2Cb%0Ac%25%7Dd%0D%00") == "a,b\nc%}d\r\0"


@given(st.text())
def test_csv_escape_roundtrip(s):
    esc = csv_escape(s)
    assert "," not in esc and "}" not in esc and "\n" not in esc
    assert csv_unescape(esc) == s


# --- record codecs over the full type vocabulary ---------------------------

FULL_DDL = """
module t {
  class Inner { int a; ustring b; }
  class Rec {
    byte b; boolean f; int i; long l; float fl; double d;
    ustring s; buffer buf;
    vector<long> xs;
    map<ustring, double> kv;
    Inner nested;
  }
}
"""
SCHEMAS = parse_record_ddl(FULL_DDL)
REC = SCHEMAS["Rec"]

_text = st.text(max_size=30)
_rows = st.tuples(
    st.integers(-128, 127),
    st.booleans(),
    st.integers(-(2**31), 2**31 - 1),
    st.integers(-(2**63), 2**63 - 1),
    st.just(1.5),  # float32-exact
    st.floats(allow_nan=False, allow_infinity=False),
    _text,
    st.binary(max_size=20),
    st.lists(st.integers(-(2**63), 2**63 - 1), max_size=5),
    st.dictionaries(_text, st.floats(allow_nan=False, allow_infinity=False), max_size=4),
    st.tuples(st.integers(-(2**31), 2**31 - 1), _text),
)


@settings(max_examples=200, deadline=None)
@given(_rows)
def test_binary_record_roundtrip(row):
    blob = encode_record_binary(row, REC)
    out = list(decode_records_binary(blob, REC))
    assert out == [row]


@settings(max_examples=200, deadline=None)
@given(_rows)
def test_csv_record_roundtrip(row):
    line = encode_record_csv(row, REC)
    assert "\n" not in line
    assert decode_record_csv(line, REC) == row


def test_binary_stream_concatenates():
    rows = [(1, True, 2, 3, 1.5, 4.0, "x,y", b"\x00", [1], {"k": 1.0}, (9, "n"))
            for _ in range(3)]
    blob = b"".join(encode_record_binary(r, REC) for r in rows)
    assert list(decode_records_binary(blob, REC)) == rows


def test_encode_rejects_null():
    with pytest.raises(ValueError):
        encode_record_binary((None, "x"), SCHEMAS["Inner"])
    with pytest.raises(ValueError):
        encode_record_csv((None, "x"), SCHEMAS["Inner"])


# --- Spark file round-trips ------------------------------------------------

SIMPLE = parse_record_ddl(
    "class KV { long k; ustring v; vector<ustring> tags; map<ustring, long> m; }"
)["KV"]


def _sample_df(spark):
    rows = [
        (1, "plain", ["a", "b"], {"x": 1}),
        (2, "comma, brace } pct % nl\nend", [], {}),
        (3, "unicode é中\U0001f600", ["c,d"], {"k,1": -5, "k2": 2**40}),
    ]
    return spark.createDataFrame(rows, SIMPLE)


def test_spark_binary_file_roundtrip(spark, tmp_path):
    df = _sample_df(spark).repartition(2)
    n = write_record_binary(df, str(tmp_path / "bin"), SIMPLE)
    assert n == 3
    back = read_record_binary(spark, str(tmp_path / "bin"), SIMPLE)
    key = lambda d: d["k"]  # noqa: E731
    assert sorted((r.asDict(True) for r in back.collect()), key=key) == sorted(
        (r.asDict(True) for r in df.collect()), key=key
    )


def test_spark_csv_file_roundtrip(spark, tmp_path):
    df = _sample_df(spark).repartition(2)
    write_record_csv(df, str(tmp_path / "csv"), SIMPLE)
    back = read_record_csv(spark, str(tmp_path / "csv"), SIMPLE)
    key = lambda d: d["k"]  # noqa: E731
    assert sorted((r.asDict(True) for r in back.collect()), key=key) == sorted(
        (r.asDict(True) for r in df.collect()), key=key
    )


def test_binary_reader_corrupt_file_skipping(spark, tmp_path):
    """skip_corrupt drops the truncated file WHOLE (no partial prefix
    of its records) and keeps every intact file; the default read
    fails loudly naming the file."""
    import glob
    import os

    import py4j.protocol

    df = _sample_df(spark).repartition(3)
    path = str(tmp_path / "bin")
    write_record_binary(df, path, SIMPLE)
    parts = sorted(glob.glob(os.path.join(path, "part-*.rec")))
    assert len(parts) >= 2
    victim = parts[0]
    size = os.path.getsize(victim)
    with open(victim, "r+b") as fh:
        fh.truncate(max(1, size - 3))  # tear mid-record

    want = set()
    for intact in parts[1:]:
        with open(intact, "rb") as fh:
            want |= {r[0] for r in decode_records_binary(fh.read(), SIMPLE)}
    assert want and len(want) < 3  # the victim held at least one record

    got = {r.k for r in
           read_record_binary(spark, path, SIMPLE, skip_corrupt=True).collect()}
    assert got == want  # victim dropped whole, every intact file kept

    with pytest.raises(py4j.protocol.Py4JJavaError):
        read_record_binary(spark, path, SIMPLE).collect()
