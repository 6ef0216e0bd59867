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
    decode_records_xml,
    encode_record_binary,
    encode_record_csv,
    encode_record_xml,
    read_record_binary,
    read_record_csv,
    read_record_xml,
    read_vlong,
    write_record_binary,
    write_record_csv,
    write_record_xml,
    write_vlong,
    xml_escape,
    xml_unescape,
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
    with pytest.raises(ValueError):
        encode_record_xml((None, "x"), SCHEMAS["Inner"])


def test_encode_rejects_arity_mismatch():
    """A short (or long) row must fail loudly at encode time: the
    binary format has no record framing, so a silently-truncated row
    would corrupt every subsequent record in the stream (ADVICE r6)."""
    for bad in [(1,), (1, "x", 99)]:
        with pytest.raises(ValueError):
            encode_record_binary(bad, SCHEMAS["Inner"])
        with pytest.raises(ValueError):
            encode_record_csv(bad, SCHEMAS["Inner"])
        with pytest.raises(ValueError):
            encode_record_xml(bad, SCHEMAS["Inner"])


def test_binary_truncated_string_payload_rejected():
    """A tail truncated INSIDE a trailing string/buffer payload must
    raise, not decode to a shortened value — Python slicing is silent
    on shortfall, which previously defeated corrupt-file detection for
    this class of torn write (ADVICE r6, the round's medium item)."""
    schema = parse_record_ddl("class S { long k; ustring s; }")["S"]
    blob = encode_record_binary((7, "hello world"), schema)
    for cut in range(1, 11):  # every truncation point inside the payload
        with pytest.raises((ValueError, IndexError)):
            list(decode_records_binary(blob[: len(blob) - cut], schema))
    schema_b = parse_record_ddl("class B { long k; buffer b; }")["B"]
    blob_b = encode_record_binary((7, b"0123456789"), schema_b)
    with pytest.raises((ValueError, IndexError)):
        list(decode_records_binary(blob_b[:-3], schema_b))


def test_csv_nonfinite_java_spellings():
    """Non-finite floats must serialize with the Java spellings
    (Double.parseDouble reads Infinity/-Infinity/NaN, not inf/nan —
    ADVICE r6), and round-trip through our decoder."""
    schema = parse_record_ddl("class F { double d; }")["F"]
    inf, ninf, nan = float("inf"), float("-inf"), float("nan")
    assert encode_record_csv((inf,), schema) == "Infinity"
    assert encode_record_csv((ninf,), schema) == "-Infinity"
    assert encode_record_csv((nan,), schema) == "NaN"
    assert decode_record_csv("Infinity", schema) == (inf,)
    assert decode_record_csv("-Infinity", schema) == (ninf,)
    (back,) = decode_record_csv("NaN", schema)
    assert back != back
    doc = encode_record_xml((inf,), schema)
    assert "<double>Infinity</double>" in doc
    assert list(decode_records_xml(doc, schema)) == [(inf,)]


# --- XML codec -------------------------------------------------------------


def test_xml_escape_golden():
    """Pin the Utils.toXMLString alphabet: &lt;/&amp; entities, %0025
    for literal '%', UPPERCASE %XXXX for control chars
    (Utils.java:44-67, hexchars uppercase at Utils.java:36)."""
    assert xml_escape("a<b&c%d\x07e") == "a&lt;b&amp;c%0025d%0007e"
    assert xml_unescape("a&lt;b&amp;c%0025d%0007e") == "a<b&c%d\x07e"
    # astral char -> surrogate PAIR of escapes (Java char-at-a-time)
    assert xml_escape("\U0001f600") == "%D83D%DE00"
    assert xml_unescape("%D83D%DE00") == "\U0001f600"
    assert xml_escape("￿") == "%FFFF"  # >0xFFFD non-character


@given(st.text())
def test_xml_escape_roundtrip(s):
    esc = xml_escape(s)
    # '<' must be entity-escaped; raw '>' is legal XML character data
    # and Utils.toXMLString leaves it alone (only '<' and '&' escape)
    assert "<" not in esc
    assert xml_unescape(esc) == s


def test_xml_document_golden():
    """Pin the full document layout to XmlRecordOutput's envelope
    printer: member envelopes with two-space indentation inside
    structs (XmlRecordOutput.java:56-66), UNindented bare <value>
    elements inside vectors (the vector branch prints no indent,
    XmlRecordOutput.java:67-68), typed element names per
    XmlRecordOutput.java:144-207."""
    schema = parse_record_ddl(
        "class R { long l; ustring s; vector<ustring> v; }"
    )["R"]
    doc = encode_record_xml((123, "a<b&c%d", ["x"]), schema)
    assert doc == (
        "<value><struct>\n"
        "  <member>\n"
        "    <name>l</name>\n"
        "    <value><ex:i8>123</ex:i8></value>\n"
        "  </member>\n"
        "  <member>\n"
        "    <name>s</name>\n"
        "    <value><string>a&lt;b&amp;c%0025d</string></value>\n"
        "  </member>\n"
        "  <member>\n"
        "    <name>v</name>\n"
        "    <value><array>\n"
        "<value><string>x</string></value>\n"
        "    </array></value>\n"
        "  </member>\n"
        "</struct></value>\n"
    )
    assert list(decode_records_xml(doc, schema)) == [(123, "a<b&c%d", ["x"])]


@settings(max_examples=200, deadline=None)
@given(_rows)
def test_xml_record_roundtrip(row):
    doc = encode_record_xml(row, REC)
    assert list(decode_records_xml(doc, REC)) == [row]


def test_xml_stream_concatenates():
    rows = [(i, True, 2, 3, 1.5, 4.0, "x,y<z", b"\x00\xff", [1], {"k": 1.0},
             (9, "n")) for i in range(3)]
    text = "".join(encode_record_xml(r, REC) for r in rows)
    assert list(decode_records_xml(text, REC)) == rows


def test_xml_corrupt_rejected():
    schema = parse_record_ddl("class S { long k; ustring s; }")["S"]
    doc = encode_record_xml((7, "hello"), schema)
    with pytest.raises(ValueError):
        list(decode_records_xml(doc[: len(doc) // 2], schema))
    with pytest.raises(ValueError):  # wrong element type for the schema
        list(decode_records_xml(doc, parse_record_ddl(
            "class S2 { ustring k; ustring s; }")["S2"]))


def test_spark_xml_file_roundtrip(spark, tmp_path):
    df = _sample_df(spark).repartition(2)
    n = write_record_xml(df, str(tmp_path / "xml"), SIMPLE)
    assert n == 3
    back = read_record_xml(spark, str(tmp_path / "xml"), SIMPLE)
    key = lambda d: d["k"]  # noqa: E731
    assert sorted((r.asDict(True) for r in back.collect()), key=key) == sorted(
        (r.asDict(True) for r in df.collect()), key=key
    )


def test_xml_reader_corrupt_file_skipping(spark, tmp_path):
    import glob
    import os

    import py4j.protocol

    df = _sample_df(spark).repartition(3)
    path = str(tmp_path / "xml")
    write_record_xml(df, path, SIMPLE)
    parts = sorted(glob.glob(os.path.join(path, "part-*.xml")))
    assert len(parts) >= 2
    victim = parts[0]
    size = os.path.getsize(victim)
    with open(victim, "r+b") as fh:
        fh.truncate(max(1, size - 10))  # tear mid-document

    want = set()
    for intact in parts[1:]:
        with open(intact, encoding="utf-8") as fh:
            want |= {r[0] for r in decode_records_xml(fh.read(), SIMPLE)}
    assert want and len(want) < 3

    got = {r.k for r in
           read_record_xml(spark, path, SIMPLE, skip_corrupt=True).collect()}
    assert got == want

    with pytest.raises(py4j.protocol.Py4JJavaError):
        read_record_xml(spark, path, SIMPLE).collect()


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


def test_xml_buffer_and_byte_golden():
    """Pin the remaining typed elements against hand-written documents:
    buffer -> <string> with LOWERCASE hex (Buffer.java:221-228,
    Character.forDigit), byte -> <ex:i1>, boolean -> 0/1, and a map
    flattened to alternating bare <value> elements in ascending-key
    order (TreeMap)."""
    schema = parse_record_ddl(
        "class B { byte by; boolean f; buffer b; map<ustring, long> m; }"
    )["B"]
    doc = encode_record_xml((-7, True, b"\x00\xfe", {"k1": 2, "a0": 1}), schema)
    assert "<ex:i1>-7</ex:i1>" in doc
    assert "<boolean>1</boolean>" in doc
    assert "<string>00fe</string>" in doc  # lowercase hex, no marker
    # TreeMap order: a0 before k1, each entry as bare key/value pairs
    assert doc.index("a0") < doc.index("k1")
    assert (
        "<value><string>a0</string></value>\n"
        "<value><ex:i8>1</ex:i8></value>\n" in doc
    )
    assert list(decode_records_xml(doc, schema)) == [
        (-7, True, b"\x00\xfe", {"a0": 1, "k1": 2})
    ]


def test_xml_rejects_inter_tag_garbage():
    """Non-whitespace content OUTSIDE typed elements (a torn/garbled
    write spliced between records) must fail loudly, not silently
    vanish — the XML analog of the binary decoder's payload-overrun
    guard (r7 review).  <name> content stays exempt (the reader
    ignores field names by design)."""
    schema = parse_record_ddl("class S { long k; }")["S"]
    good = encode_record_xml((7,), schema)
    assert list(decode_records_xml(good + good, schema)) == [(7,), (7,)]
    with pytest.raises(ValueError):
        list(decode_records_xml(good + "JUNK" + good, schema))
    # garbage inside a struct envelope, between members
    broken = good.replace("</struct>", "garbage</struct>")
    with pytest.raises(ValueError):
        list(decode_records_xml(broken, schema))
