"""Hadoop Record I/O wire formats: binary, CSV, and XML readers/writers.

The reference ships a DDL + compiler ("rcc") whose generated record
classes serialize through pluggable RecordOutput/RecordInput backends
(record/package.html:60-120).  ``types.parse_record_ddl`` already
compiles the DDL to a StructType; this module closes the remaining gap
— reading and writing files in the actual wire formats — so data
serialized by reference-generated records round-trips through the
engine.

Binary format (record/BinaryRecordOutput.java:70-118):
  * byte      -> 1 signed byte
  * boolean   -> 1 byte (0/1)
  * int/long  -> zero-compressed vint/vlong
                 (io/WritableUtils.java:246-288: one byte for
                 -112..127, else a length byte -113..-120 (positive)
                 or -121..-128 (one's-complemented negative) followed
                 by the value's non-zero bytes, high byte first)
  * float     -> 4 bytes big-endian IEEE-754
  * double    -> 8 bytes big-endian IEEE-754
  * ustring   -> vint byte-length + standard UTF-8
                 (record/Utils.java:304-316)
  * buffer    -> vint length + raw bytes
  * vector    -> vint count + elements
  * map       -> vint count + alternating key,value (TreeMap order —
                 keys ascending — record/BinaryRecordOutput.java:115)
  * record    -> fields concatenated, NO framing (start/endRecord are
                 no-ops) — the schema drives both encode and decode.

CSV format (record/CsvRecordOutput.java:57-140, Utils.java:108-240):
  * one record per line, fields comma-separated
  * boolean   -> T / F
  * numerics  -> decimal text
  * ustring   -> leading ' then %-escapes for NUL %00, LF %0A, CR %0D,
                 comma %2C, '}' %7D, '%' %25
  * buffer    -> '#' + lowercase hex
  * nested record -> s{...}; vector -> v{...}; map -> m{...}
    (map entries flatten to k,v,k,v — each write emits
    comma-unless-first, CsvRecordOutput.java:41-46)

XML format (record/XmlRecordOutput.java, XmlRecordInput.java): one
XML-RPC-flavored document per record — see the XML section below for
the full element/escaping spec.

Neither the binary nor the XML format is splittable (no sync markers /
multi-line documents), so for those the file is the parallelism unit:
the writers emit one file per partition and the readers schedule one
task per file, exactly the reference's
FileInputFormat-with-isSplitable=false contract.  These are interop
boundaries, not hot paths — native tables are parquet.

Record I/O has no null: every field of every record is always written
(the generated classes hold primitives/empty collections).  The
encoders therefore REJECT None — callers coalesce first.
"""

from __future__ import annotations

import os
import re
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# zero-compressed vint/vlong (io/WritableUtils.java:261-309)
# --------------------------------------------------------------------------


def write_vlong(buf: bytearray, i: int) -> None:
    """Append the zero-compressed encoding of ``i`` (64-bit signed)."""
    if -112 <= i <= 127:
        buf.append(i & 0xFF)
        return
    ln = -112
    if i < 0:
        i ^= -1  # one's complement -> non-negative payload
        ln = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        ln -= 1
    buf.append(ln & 0xFF)
    n = -(ln + 120) if ln < -120 else -(ln + 112)
    for idx in range(n, 0, -1):
        buf.append((i >> ((idx - 1) * 8)) & 0xFF)


def read_vlong(b, pos: int) -> tuple[int, int]:
    """Decode a zero-compressed long at ``b[pos:]`` -> (value, new_pos)."""
    first = b[pos]
    pos += 1
    if first > 127:
        first -= 256
    if first >= -112:
        return first, pos
    neg = first <= -121
    n = -(first + 120) if neg else -(first + 112)
    i = 0
    for _ in range(n):
        i = (i << 8) | b[pos]
        pos += 1
    return ((i ^ -1) if neg else i), pos


# --------------------------------------------------------------------------
# binary record codec (schema-driven walk)
# --------------------------------------------------------------------------


def _bin_encode(val: Any, dtype: T.DataType, buf: bytearray) -> None:
    if val is None:
        raise ValueError(
            "Record I/O has no null representation; coalesce before encoding"
        )
    if isinstance(dtype, T.ByteType):
        buf.append(val & 0xFF)
    elif isinstance(dtype, T.BooleanType):
        buf.append(1 if val else 0)
    elif isinstance(dtype, (T.IntegerType, T.LongType)):
        write_vlong(buf, int(val))
    elif isinstance(dtype, T.FloatType):
        buf += struct.pack(">f", val)
    elif isinstance(dtype, T.DoubleType):
        buf += struct.pack(">d", val)
    elif isinstance(dtype, T.StringType):
        raw = val.encode("utf-8")
        write_vlong(buf, len(raw))
        buf += raw
    elif isinstance(dtype, T.BinaryType):
        raw = bytes(val)
        write_vlong(buf, len(raw))
        buf += raw
    elif isinstance(dtype, T.ArrayType):
        write_vlong(buf, len(val))
        for x in val:
            _bin_encode(x, dtype.elementType, buf)
    elif isinstance(dtype, T.MapType):
        items = sorted(val.items())  # TreeMap order
        write_vlong(buf, len(items))
        for k, v in items:
            _bin_encode(k, dtype.keyType, buf)
            _bin_encode(v, dtype.valueType, buf)
    elif isinstance(dtype, T.StructType):
        # strict: the binary format has no record framing, so one
        # silently-truncated row would corrupt every record after it
        # in the stream undetectably (ADVICE r6)
        for f, x in zip(dtype.fields, val, strict=True):
            _bin_encode(x, f.dataType, buf)
    else:
        raise TypeError(f"unsupported Record I/O type: {dtype}")


def _check_payload(b, pos: int, n: int) -> None:
    """Fail loudly when a vint-declared payload overruns the buffer.

    Python slicing silently returns fewer bytes than asked, so without
    this a file truncated mid-payload of a trailing string/buffer field
    would decode to a shortened value and be ACCEPTED — defeating the
    module's all-or-nothing corrupt-file contract for exactly the torn
    write it exists to catch (fixed-width fields already fail via
    struct.unpack_from; ADVICE r6)."""
    if n < 0 or pos + n > len(b):
        raise ValueError(
            f"record payload of {n} bytes overruns buffer at offset {pos} "
            f"(have {len(b) - pos})"
        )


def _bin_decode(b, pos: int, dtype: T.DataType) -> tuple[Any, int]:
    if isinstance(dtype, T.ByteType):
        v = b[pos]
        return (v - 256 if v > 127 else v), pos + 1
    if isinstance(dtype, T.BooleanType):
        return b[pos] != 0, pos + 1
    if isinstance(dtype, (T.IntegerType, T.LongType)):
        return read_vlong(b, pos)
    if isinstance(dtype, T.FloatType):
        return struct.unpack_from(">f", b, pos)[0], pos + 4
    if isinstance(dtype, T.DoubleType):
        return struct.unpack_from(">d", b, pos)[0], pos + 8
    if isinstance(dtype, T.StringType):
        n, pos = read_vlong(b, pos)
        _check_payload(b, pos, n)
        return bytes(b[pos : pos + n]).decode("utf-8"), pos + n
    if isinstance(dtype, T.BinaryType):
        n, pos = read_vlong(b, pos)
        _check_payload(b, pos, n)
        return bytes(b[pos : pos + n]), pos + n
    if isinstance(dtype, T.ArrayType):
        n, pos = read_vlong(b, pos)
        out = []
        for _ in range(n):
            x, pos = _bin_decode(b, pos, dtype.elementType)
            out.append(x)
        return out, pos
    if isinstance(dtype, T.MapType):
        n, pos = read_vlong(b, pos)
        d = {}
        for _ in range(n):
            k, pos = _bin_decode(b, pos, dtype.keyType)
            v, pos = _bin_decode(b, pos, dtype.valueType)
            d[k] = v
        return d, pos
    if isinstance(dtype, T.StructType):
        row = []
        for f in dtype.fields:
            x, pos = _bin_decode(b, pos, f.dataType)
            row.append(x)
        return tuple(row), pos
    raise TypeError(f"unsupported Record I/O type: {dtype}")


def encode_record_binary(row, schema: T.StructType) -> bytes:
    """One record -> its BinaryRecordOutput byte string."""
    buf = bytearray()
    _bin_encode(tuple(row), schema, buf)
    return bytes(buf)


def decode_records_binary(blob: bytes, schema: T.StructType) -> Iterator[tuple]:
    """A file's byte stream -> records (concatenated, schema-framed)."""
    pos, n = 0, len(blob)
    mv = memoryview(blob)
    while pos < n:
        row, pos = _bin_decode(mv, pos, schema)
        yield row


# --------------------------------------------------------------------------
# CSV record codec
# --------------------------------------------------------------------------

def _float_text(x: float) -> str:
    """Text form of a float for the CSV/XML formats, with the JAVA
    spellings for non-finite values — ``Double.parseDouble`` reads
    'Infinity'/'-Infinity'/'NaN' but not Python's 'inf'/'nan', so the
    Python spellings would break the claimed interop for exactly those
    values (ADVICE r6); Python's ``float()`` accepts both, so decode is
    unchanged."""
    if x != x:
        return "NaN"
    if x == float("inf"):
        return "Infinity"
    if x == float("-inf"):
        return "-Infinity"
    return repr(x)


_CSV_ESC = {
    "\0": "%00",
    "\n": "%0A",
    "\r": "%0D",
    ",": "%2C",
    "}": "%7D",
    "%": "%25",
}
_CSV_UNESC = {v[1:]: k for k, v in _CSV_ESC.items()}


def csv_escape(s: str) -> str:
    """Utils.toCSVString minus the leading quote (added by the caller)."""
    return "".join(_CSV_ESC.get(c, c) for c in s)


def csv_unescape(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            code = s[i + 1 : i + 3]
            if code not in _CSV_UNESC:
                raise ValueError(f"bad CSV escape %{code}")
            out.append(_CSV_UNESC[code])
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _csv_encode(val: Any, dtype: T.DataType, parts: list[str]) -> None:
    if val is None:
        raise ValueError(
            "Record I/O has no null representation; coalesce before encoding"
        )
    if isinstance(dtype, T.BooleanType):
        parts.append("T" if val else "F")
    elif isinstance(dtype, (T.ByteType, T.IntegerType, T.LongType)):
        parts.append(str(int(val)))
    elif isinstance(dtype, (T.FloatType, T.DoubleType)):
        parts.append(_float_text(float(val)))
    elif isinstance(dtype, T.StringType):
        parts.append("'" + csv_escape(val))
    elif isinstance(dtype, T.BinaryType):
        parts.append("#" + bytes(val).hex())
    elif isinstance(dtype, T.ArrayType):
        inner: list[str] = []
        for x in val:
            _csv_encode(x, dtype.elementType, inner)
        parts.append("v{" + ",".join(inner) + "}")
    elif isinstance(dtype, T.MapType):
        inner = []
        for k, v in sorted(val.items()):
            _csv_encode(k, dtype.keyType, inner)
            _csv_encode(v, dtype.valueType, inner)
        parts.append("m{" + ",".join(inner) + "}")
    elif isinstance(dtype, T.StructType):
        inner = []
        for f, x in zip(dtype.fields, val, strict=True):
            _csv_encode(x, f.dataType, inner)
        parts.append("s{" + ",".join(inner) + "}")
    else:
        raise TypeError(f"unsupported Record I/O type: {dtype}")


def encode_record_csv(row, schema: T.StructType) -> str:
    """One record -> its CsvRecordOutput line (top-level record is
    unwrapped: startRecord with an empty tag writes no s{},
    CsvRecordOutput.java:101-106)."""
    parts: list[str] = []
    for f, x in zip(schema.fields, tuple(row), strict=True):
        _csv_encode(x, f.dataType, parts)
    return ",".join(parts)


def _csv_scalar_end(line: str, pos: int) -> int:
    """End of a scalar token: next ',' or '}' or end-of-line (escapes
    make both safe inside strings)."""
    n = len(line)
    while pos < n and line[pos] not in ",}":
        pos += 1
    return pos


def _csv_decode(line: str, pos: int, dtype: T.DataType) -> tuple[Any, int]:
    if isinstance(dtype, T.BooleanType):
        c = line[pos]
        if c not in "TF":
            raise ValueError(f"bad CSV boolean at {pos}")
        return c == "T", pos + 1
    if isinstance(dtype, (T.ByteType, T.IntegerType, T.LongType)):
        end = _csv_scalar_end(line, pos)
        return int(line[pos:end]), end
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        end = _csv_scalar_end(line, pos)
        return float(line[pos:end]), end
    if isinstance(dtype, T.StringType):
        if line[pos] != "'":
            raise ValueError(f"CSV string must start with ' at {pos}")
        end = _csv_scalar_end(line, pos)
        return csv_unescape(line[pos + 1 : end]), end
    if isinstance(dtype, T.BinaryType):
        if line[pos] != "#":
            raise ValueError(f"CSV buffer must start with # at {pos}")
        end = _csv_scalar_end(line, pos)
        return bytes.fromhex(line[pos + 1 : end]), end
    if isinstance(dtype, (T.ArrayType, T.MapType, T.StructType)):
        marker = {T.ArrayType: "v{", T.MapType: "m{", T.StructType: "s{"}[
            type(dtype)
        ]
        if line[pos : pos + 2] != marker:
            raise ValueError(f"expected {marker} at {pos}")
        pos += 2
        if isinstance(dtype, T.ArrayType):
            out: Any = []
            while line[pos] != "}":
                x, pos = _csv_decode(line, pos, dtype.elementType)
                if line[pos] == ",":
                    pos += 1
                out.append(x)
        elif isinstance(dtype, T.MapType):
            out = {}
            while line[pos] != "}":
                k, pos = _csv_decode(line, pos, dtype.keyType)
                pos += 1  # comma between key and value
                v, pos = _csv_decode(line, pos, dtype.valueType)
                if line[pos] == ",":
                    pos += 1
                out[k] = v
        else:
            row = []
            for i, f in enumerate(dtype.fields):
                x, pos = _csv_decode(line, pos, f.dataType)
                if i < len(dtype.fields) - 1:
                    pos += 1  # comma
                row.append(x)
            out = tuple(row)
        return out, pos + 1  # closing }
    raise TypeError(f"unsupported Record I/O type: {dtype}")


def decode_record_csv(line: str, schema: T.StructType) -> tuple:
    row = []
    pos = 0
    for i, f in enumerate(schema.fields):
        x, pos = _csv_decode(line, pos, f.dataType)
        if i < len(schema.fields) - 1:
            if pos >= len(line) or line[pos] != ",":
                raise ValueError(f"expected ',' at {pos} in {line[:60]!r}")
            pos += 1
        row.append(x)
    if pos != len(line):
        raise ValueError(f"trailing data at {pos} in {line[:60]!r}")
    return tuple(row)


# --------------------------------------------------------------------------
# XML record codec (record/XmlRecordOutput.java, XmlRecordInput.java)
#
# The third wire format of the reference's triple.  Serialization is an
# XML-RPC-flavored document per record: the top-level record is
# <value><struct> ... </struct></value>, struct fields are
# <member><name>f</name><value>TYPED</value></member> (two-space
# indentation, XmlRecordOutput.java:40-46), vector/map elements are
# bare <value>TYPED</value> lines, and maps flatten to alternating
# key,value elements in TreeMap (ascending-key) order.  Typed elements
# (XmlRecordOutput.java:144-207): <ex:i1> byte, <boolean> 1/0, <i4>
# int, <ex:i8> long, <ex:float>, <double>, <string> for both ustring
# (escaped) and buffer (lowercase hex, Buffer.java:221-228).
#
# String escaping (record/Utils.java:44-101): '<' -> &lt;, '&' ->
# &amp;, '%' -> %0025, and any UTF-16 unit that is a control char
# (<0x20), a surrogate, or >0xFFFD -> %XXXX with UPPERCASE hex
# (Utils.hexchars).  The decoder treats EVERY '%' as starting a 4-hex
# escape — which is why the writer must escape literal '%'.  Escapes
# operate on UTF-16 code units (Java chars): astral characters emit a
# surrogate PAIR of %D8xx%DCxx escapes, recombined on decode.
#
# The reader mirrors XmlRecordInput's SAX strategy: flatten the
# document to an ordered list of typed values (field <name> elements
# are ignored — deserialization is schema-order-driven, not
# name-matched, XmlRecordInput.java:63-101), then walk the schema
# consuming values, with "/array" sentinels ending vectors/maps
# (XmlIndex.done, XmlRecordInput.java:104-116).
# --------------------------------------------------------------------------

_XML_ESC = {"<": "&lt;", "&": "&amp;", "%": "%0025"}
_XML_ENTITIES = {"lt": "<", "gt": ">", "amp": "&", "quot": '"', "apos": "'"}


def xml_escape(s: str) -> str:
    """Utils.toXMLString: entity-escape markup chars, %XXXX-escape
    control/surrogate/non-character UTF-16 units (astral chars as a
    surrogate pair of escapes, matching Java's char-at-a-time walk)."""
    out: list[str] = []
    for ch in s:
        cp = ord(ch)
        if cp > 0xFFFF:  # Java sees a surrogate pair; escape both units
            cp -= 0x10000
            out.append(f"%{0xD800 + (cp >> 10):04X}")
            out.append(f"%{0xDC00 + (cp & 0x3FF):04X}")
        elif ch in _XML_ESC:
            out.append(_XML_ESC[ch])
        elif cp < 0x20 or 0xD7FF < cp < 0xE000 or cp > 0xFFFD:
            out.append(f"%{cp:04X}")
        else:
            out.append(ch)
    return "".join(out)


def xml_unescape(s: str) -> str:
    """XML entity decode (the SAX parser's job in the reference) +
    Utils.fromXMLString %XXXX decode, recombining surrogate pairs."""
    units: list[int] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            if i + 5 > n:
                raise ValueError(f"truncated %XXXX escape at {i}")
            units.append(int(s[i + 1 : i + 5], 16))
            i += 5
        elif c == "&":
            end = s.find(";", i + 1)
            name = s[i + 1 : end] if end != -1 else ""
            if name not in _XML_ENTITIES:
                raise ValueError(f"unknown XML entity at {i}: {s[i:i+8]!r}")
            units.append(ord(_XML_ENTITIES[name]))
            i = end + 1
        else:
            units.append(ord(c))
            i += 1
    out: list[str] = []
    j, m = 0, len(units)
    while j < m:
        u = units[j]
        if 0xD800 <= u <= 0xDBFF and j + 1 < m and 0xDC00 <= units[j + 1] <= 0xDFFF:
            out.append(chr(0x10000 + ((u - 0xD800) << 10) + (units[j + 1] - 0xDC00)))
            j += 2
        else:
            out.append(chr(u))
            j += 1
    return "".join(out)


class _XmlEmitter:
    """Byte-faithful re-implementation of XmlRecordOutput's envelope
    printer: an indent counter and a compound-type stack decide how
    each value is wrapped (member envelope inside structs, bare
    <value> inside vectors/maps, XmlRecordOutput.java:56-93)."""

    def __init__(self) -> None:
        self.parts: list[str] = []
        self.indent = 0
        self.stack: list[str] = []

    def _put_indent(self) -> None:
        self.parts.append("  " * self.indent)

    def begin(self, tag: str) -> None:
        if self.stack and self.stack[-1] == "struct":
            self._put_indent()
            self.parts.append("<member>\n")
            self.indent += 1
            self._put_indent()
            self.parts.append(f"<name>{tag}</name>\n")
            self._put_indent()
            self.parts.append("<value>")
        else:  # vector/map element, or the top-level record
            self.parts.append("<value>")

    def end(self, tag: str) -> None:
        if self.stack and self.stack[-1] == "struct":
            self.parts.append("</value>\n")
            self.indent -= 1
            self._put_indent()
            self.parts.append("</member>\n")
        else:
            self.parts.append("</value>\n")

    def scalar(self, tag: str, elem: str, text: str) -> None:
        self.begin(tag)
        self.parts.append(f"<{elem}>{text}</{elem}>")
        self.end(tag)

    def open_compound(self, tag: str, kind: str, elem: str) -> None:
        self.begin(tag)
        self.stack.append(kind)
        self.parts.append(f"<{elem}>\n")
        self.indent += 1

    def close_compound(self, tag: str, kind: str, elem: str) -> None:
        self.indent -= 1
        self._put_indent()
        self.parts.append(f"</{elem}>")
        popped = self.stack.pop()
        if popped != kind:
            raise ValueError(f"unbalanced {kind} serialization")
        self.end(tag)


def _xml_encode(val: Any, dtype: T.DataType, tag: str, em: _XmlEmitter) -> None:
    if val is None:
        raise ValueError(
            "Record I/O has no null representation; coalesce before encoding"
        )
    if isinstance(dtype, T.ByteType):
        em.scalar(tag, "ex:i1", str(int(val)))
    elif isinstance(dtype, T.BooleanType):
        em.scalar(tag, "boolean", "1" if val else "0")
    elif isinstance(dtype, T.IntegerType):
        em.scalar(tag, "i4", str(int(val)))
    elif isinstance(dtype, T.LongType):
        em.scalar(tag, "ex:i8", str(int(val)))
    elif isinstance(dtype, T.FloatType):
        em.scalar(tag, "ex:float", _float_text(float(val)))
    elif isinstance(dtype, T.DoubleType):
        em.scalar(tag, "double", _float_text(float(val)))
    elif isinstance(dtype, T.StringType):
        em.scalar(tag, "string", xml_escape(val))
    elif isinstance(dtype, T.BinaryType):
        em.scalar(tag, "string", bytes(val).hex())
    elif isinstance(dtype, T.ArrayType):
        em.open_compound(tag, "vector", "array")
        for x in val:
            _xml_encode(x, dtype.elementType, tag, em)
        em.close_compound(tag, "vector", "array")
    elif isinstance(dtype, T.MapType):
        em.open_compound(tag, "map", "array")
        for k, v in sorted(val.items()):  # TreeMap order
            _xml_encode(k, dtype.keyType, tag, em)
            _xml_encode(v, dtype.valueType, tag, em)
        em.close_compound(tag, "map", "array")
    elif isinstance(dtype, T.StructType):
        em.begin(tag)
        em.stack.append("struct")
        em.parts.append("<struct>\n")
        em.indent += 1
        for f, x in zip(dtype.fields, val, strict=True):
            _xml_encode(x, f.dataType, f.name, em)
        em.indent -= 1
        em._put_indent()
        em.parts.append("</struct>")
        popped = em.stack.pop()
        if popped != "struct":
            raise ValueError("unbalanced struct serialization")
        em.end(tag)
    else:
        raise TypeError(f"unsupported Record I/O type: {dtype}")


def encode_record_xml(row, schema: T.StructType) -> str:
    """One record -> its complete XML document, byte-identical to
    ``record.serialize(new XmlRecordOutput(out), "")``."""
    em = _XmlEmitter()
    _xml_encode(tuple(row), schema, "", em)
    return "".join(em.parts)


_XML_TYPED = frozenset(
    ["boolean", "i4", "int", "string", "double", "ex:i1", "ex:i8", "ex:float"]
)
_XML_TAG_RE = re.compile(r"<(/?[^<>]+)>")


def _xml_values(text: str) -> list[tuple[str, str]]:
    """Flatten XML text to the reference's ordered value list:
    (type, raw_text) for typed elements, ("struct"|"array"|"/struct"|
    "/array", "") markers for compounds — exactly the SAX handler's
    output (XmlRecordInput.java:63-101; <value>/<member>/<name> and
    whitespace are discarded).  Accepts any concatenation of record
    documents, so a multi-record part file flattens to a list the
    schema walk consumes record by record."""
    vals: list[tuple[str, str]] = []
    pos = 0
    expect_close: str | None = None  # inside a typed element
    in_name = False  # inside <name>tag</name> (content ignored)
    start = 0
    for m in _XML_TAG_RE.finditer(text):
        tag = m.group(1)
        if expect_close is not None:
            if tag != "/" + expect_close:
                raise ValueError(
                    f"expected </{expect_close}> but found <{tag}>"
                )
            vals.append((expect_close, text[start : m.start()]))
            expect_close = None
            pos = m.end()
            continue
        # OUTSIDE typed elements only whitespace (the writer's
        # indentation/newlines) and <name> content may appear between
        # tags — anything else is a torn/garbled file and must fail
        # loudly, matching the binary decoder's all-or-nothing
        # contract (r7 review)
        between = text[pos : m.start()]
        if not in_name and between.strip():
            raise ValueError(
                f"unexpected content between XML elements: "
                f"{between.strip()[:40]!r}"
            )
        if tag == "name":
            in_name = True
        elif tag == "/name":
            in_name = False
        elif tag in _XML_TYPED:
            expect_close = tag
            start = m.end()
        elif tag in ("struct", "array", "/struct", "/array"):
            vals.append((tag, ""))
        elif tag.lstrip("/") not in ("value", "member"):
            raise ValueError(f"unexpected XML element <{tag}>")
        pos = m.end()
    if expect_close is not None:
        raise ValueError(f"unclosed <{expect_close}> element")
    tail = text[pos:].strip()
    if tail:
        raise ValueError(f"trailing non-markup content: {tail[:40]!r}")
    return vals


class _XmlCursor:
    def __init__(self, vals: list[tuple[str, str]]):
        self.vals = vals
        self.i = 0

    def next(self) -> tuple[str, str]:
        if self.i >= len(self.vals):
            raise ValueError("truncated XML record stream")
        v = self.vals[self.i]
        self.i += 1
        return v

    def at_array_end(self) -> bool:
        if self.i < len(self.vals) and self.vals[self.i][0] == "/array":
            self.i += 1
            return True
        return False


def _xml_decode(cur: _XmlCursor, dtype: T.DataType) -> Any:
    if isinstance(dtype, T.StructType):
        t, _ = cur.next()
        if t != "struct":
            raise ValueError(f"expected <struct>, found {t}")
        row = tuple(_xml_decode(cur, f.dataType) for f in dtype.fields)
        t, _ = cur.next()
        if t != "/struct":
            raise ValueError(f"expected </struct>, found {t}")
        return row
    if isinstance(dtype, (T.ArrayType, T.MapType)):
        t, _ = cur.next()
        if t != "array":
            raise ValueError(f"expected <array>, found {t}")
        if isinstance(dtype, T.ArrayType):
            out: Any = []
            while not cur.at_array_end():
                out.append(_xml_decode(cur, dtype.elementType))
            return out
        d: dict = {}
        while not cur.at_array_end():
            k = _xml_decode(cur, dtype.keyType)
            d[k] = _xml_decode(cur, dtype.valueType)
        return d
    t, raw = cur.next()
    if isinstance(dtype, T.ByteType):
        if t != "ex:i1":
            raise ValueError(f"expected ex:i1, found {t}")
        return int(raw)
    if isinstance(dtype, T.BooleanType):
        if t != "boolean":
            raise ValueError(f"expected boolean, found {t}")
        return raw == "1"
    if isinstance(dtype, T.IntegerType):
        if t not in ("i4", "int"):
            raise ValueError(f"expected i4, found {t}")
        return int(raw)
    if isinstance(dtype, T.LongType):
        if t != "ex:i8":
            raise ValueError(f"expected ex:i8, found {t}")
        return int(raw)
    if isinstance(dtype, T.FloatType):
        if t != "ex:float":
            raise ValueError(f"expected ex:float, found {t}")
        return float(raw)
    if isinstance(dtype, T.DoubleType):
        if t != "double":
            raise ValueError(f"expected double, found {t}")
        return float(raw)
    if isinstance(dtype, T.StringType):
        if t != "string":
            raise ValueError(f"expected string, found {t}")
        return xml_unescape(raw)
    if isinstance(dtype, T.BinaryType):
        if t != "string":
            raise ValueError(f"expected string (buffer), found {t}")
        return bytes.fromhex(raw)
    raise TypeError(f"unsupported Record I/O type: {dtype}")


def decode_records_xml(text: str, schema: T.StructType) -> Iterator[tuple]:
    """A part file's text (concatenated one-record documents) ->
    records.  A reference XmlRecordInput reads one record per document;
    documents are self-delimiting (<value>...</value> root), so the
    concatenation is trivially re-splittable for that consumer."""
    cur = _XmlCursor(_xml_values(text))
    while cur.i < len(cur.vals):
        yield _xml_decode(cur, schema)


# --------------------------------------------------------------------------
# Spark-side readers / writers
# --------------------------------------------------------------------------


def write_record_binary(df: DataFrame, path: str, schema: T.StructType) -> int:
    """Encode ``df`` (whose schema must match ``schema``) to one
    binary-record file per partition under ``path``.

    Executors write part files directly (local mode: same FS; a real
    cluster points ``path`` at the shared mount — this is the custom-
    OutputFormat pattern, the file count = partition count is the
    reader's parallelism).  Returns the record count (the action that
    forces the write)."""
    os.makedirs(path, exist_ok=True)

    def _write_part(idx: int, rows) -> Iterator[int]:
        buf = bytearray()
        n = 0
        for r in rows:
            _bin_encode(tuple(r), schema, buf)
            n += 1
        if n:
            with open(os.path.join(path, f"part-{idx:05d}.rec"), "wb") as fh:
                fh.write(bytes(buf))
        yield n

    return sum(df.rdd.mapPartitionsWithIndex(_write_part).collect())


def read_record_binary(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    skip_corrupt: bool = False,
) -> DataFrame:
    """Binary-record files -> DataFrame[schema].  One task per file
    (the format has no sync markers, so files are the split unit —
    same contract as the reference's isSplitable=false readers).

    ``skip_corrupt=True`` drops an undecodable file WHOLE and keeps
    reading (the file is the failure unit, matching parquet's
    ``ignoreCorruptFiles`` and the spirit of SkipBadRecords,
    mapred/SkipBadRecords.java:31 — a torn write loses one part file,
    not the job); all-or-nothing per file, so a truncated tail never
    yields a partial prefix of its records.  Default is fail-loud with
    the file named."""

    def _decode(kv):
        fname, blob = kv
        try:
            rows = list(decode_records_binary(blob, schema))
        except Exception as e:
            if skip_corrupt:
                return
            raise ValueError(f"corrupt record-I/O file {fname}") from e
        yield from rows

    rdd = spark.sparkContext.binaryFiles(path).flatMap(_decode)
    return spark.createDataFrame(rdd, schema)


def write_record_csv(df: DataFrame, path: str, schema: T.StructType) -> None:
    """Encode ``df`` to CSV-record text files (one record per line —
    newlines inside strings are %0A-escaped, so line framing holds).
    Text files ARE line-splittable, so this side keeps Spark's normal
    split planning."""
    df.rdd.map(lambda r: encode_record_csv(r, schema)).saveAsTextFile(path)


def read_record_csv(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """CSV-record text files -> DataFrame[schema]."""
    rdd = (
        spark.read.text(path)
        .rdd.map(lambda r: decode_record_csv(r.value, schema))
    )
    return spark.createDataFrame(rdd, schema)


def write_record_xml(df: DataFrame, path: str, schema: T.StructType) -> int:
    """Encode ``df`` to XML-record files, one per partition, each a
    concatenation of per-record documents (the reference emits one
    document per serialized record; see decode_records_xml on
    re-splitting).  Documents contain newlines (indented members), so
    the format is NOT line-framed: like the binary format, the file is
    the split unit.  Returns the record count."""
    os.makedirs(path, exist_ok=True)

    def _write_part(idx: int, rows) -> Iterator[int]:
        docs = []
        for r in rows:
            docs.append(encode_record_xml(tuple(r), schema))
        if docs:
            with open(
                os.path.join(path, f"part-{idx:05d}.xml"), "w", encoding="utf-8"
            ) as fh:
                fh.write("".join(docs))
        yield len(docs)

    return sum(df.rdd.mapPartitionsWithIndex(_write_part).collect())


def read_record_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    skip_corrupt: bool = False,
) -> DataFrame:
    """XML-record files -> DataFrame[schema].  One task per file (the
    documents span lines, so files are the split unit — the same
    isSplitable=false contract as the binary reader), with the same
    whole-file corrupt-skip semantics."""

    def _decode(kv):
        fname, text = kv
        try:
            rows = list(decode_records_xml(text, schema))
        except Exception as e:
            if skip_corrupt:
                return
            raise ValueError(f"corrupt record-I/O XML file {fname}") from e
        yield from rows

    rdd = spark.sparkContext.wholeTextFiles(path).flatMap(_decode)
    return spark.createDataFrame(rdd, schema)
