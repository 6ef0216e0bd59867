"""Type system: Writable ↔ Spark SQL mapping + Record I/O DDL compiler.

Two schema mechanisms in the reference (SURVEY.md §1.2/§1.3):

1. Writable classes declared per job — mapped 1:1 to Spark SQL types
   (``WRITABLE_TO_SPARK``).
2. Hadoop Record I/O: a DDL + compiler (``rcc``) generating record
   classes (grammar: src/core/org/apache/hadoop/record/package.html:189-200;
   compiler entry record/compiler/JRecord.java:28). ``parse_record_ddl``
   compiles the same DDL text straight to ``StructType`` — schema-on-read
   replaces codegen.

Grammar accepted (the reference's, module wrapper optional)::

    module m {
      class RecName {
        int     f1;
        ustring name;
        vector<long> xs;
        map<ustring, double> kv;
        OtherRec nested;   // previously-defined record
      }
    }
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# SURVEY.md §1.2 table — io/*.java Writables to Spark SQL types.
WRITABLE_TO_SPARK: dict[str, T.DataType] = {
    "BooleanWritable": T.BooleanType(),
    "ByteWritable": T.ByteType(),
    "IntWritable": T.IntegerType(),
    "VIntWritable": T.IntegerType(),
    "LongWritable": T.LongType(),
    "VLongWritable": T.LongType(),
    "FloatWritable": T.FloatType(),
    "DoubleWritable": T.DoubleType(),
    "Text": T.StringType(),
    "BytesWritable": T.BinaryType(),
    "MD5Hash": T.BinaryType(),
    "NullWritable": T.NullType(),
    # composite Writables (value type per element; MapWritable entries
    # are heterogeneous — readers normalize, sources/io.py
    # read_sequence_composite)
    "ArrayWritable": T.ArrayType(T.StringType()),
    "TwoDArrayWritable": T.ArrayType(T.ArrayType(T.StringType())),
    "MapWritable": T.MapType(T.StringType(), T.StringType()),
    "SortedMapWritable": T.MapType(T.StringType(), T.StringType()),
}

# Record I/O primitive types (record/package.html:129-137).
_DDL_PRIMITIVES: dict[str, T.DataType] = {
    "byte": T.ByteType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "ustring": T.StringType(),
    "buffer": T.BinaryType(),
}

_TOKEN = re.compile(
    r"\s*(?:(module|class)\s+([\w.]+)\s*\{|(\})|([\w.]+)\s*<|([\w.]+)\s+(\w+)\s*;|(>)|,)"
)


def _parse_type(s: str, pos: int, known: dict[str, T.StructType]) -> tuple[T.DataType, int]:
    m = re.match(r"\s*([\w.]+)", s[pos:])
    if not m:
        raise ValueError(f"type expected at {pos}")
    name = m.group(1)
    pos += m.end()
    if name == "vector":
        pos = _expect(s, pos, "<")
        elem, pos = _parse_type(s, pos, known)
        pos = _expect(s, pos, ">")
        return T.ArrayType(elem), pos
    if name == "map":
        pos = _expect(s, pos, "<")
        k, pos = _parse_type(s, pos, known)
        pos = _expect(s, pos, ",")
        v, pos = _parse_type(s, pos, known)
        pos = _expect(s, pos, ">")
        return T.MapType(k, v), pos
    if name in _DDL_PRIMITIVES:
        return _DDL_PRIMITIVES[name], pos
    short = name.split(".")[-1]
    if short in known:
        return known[short], pos
    raise ValueError(f"unknown type {name!r}")


def _expect(s: str, pos: int, ch: str) -> int:
    m = re.match(r"\s*" + re.escape(ch), s[pos:])
    if not m:
        raise ValueError(f"expected {ch!r} at {pos}: {s[pos:pos+20]!r}")
    return pos + m.end()


def parse_record_ddl(ddl: str) -> dict[str, T.StructType]:
    """Compile Record I/O DDL to {record_name: StructType}. Nested
    records must be defined before use (the reference's rcc resolves
    within-module the same way)."""
    # strip comments
    ddl = re.sub(r"//[^\n]*", "", ddl)
    known: dict[str, T.StructType] = {}
    pos = 0
    n = len(ddl)
    while pos < n:
        m = re.match(r"\s*(module|class)\s+([\w.]+)\s*\{", ddl[pos:])
        if m:
            kind, name = m.group(1), m.group(2)
            pos += m.end()
            if kind == "module":
                continue  # module is just a namespace wrapper
            fields: list[T.StructField] = []
            while True:
                mc = re.match(r"\s*\}", ddl[pos:])
                if mc:
                    pos += mc.end()
                    break
                ftype, pos = _parse_type(ddl, pos, known)
                mf = re.match(r"\s*(\w+)\s*;", ddl[pos:])
                if not mf:
                    raise ValueError(f"field name expected at {pos}: {ddl[pos:pos+20]!r}")
                fields.append(T.StructField(mf.group(1), ftype, nullable=True))
                pos += mf.end()
            known[name.split(".")[-1]] = T.StructType(fields)
            continue
        mc = re.match(r"\s*\}", ddl[pos:])
        if mc:
            pos += mc.end()  # closing a module
            continue
        if ddl[pos:].strip() == "":
            break
        raise ValueError(f"unexpected input at {pos}: {ddl[pos:pos+30]!r}")
    return known
