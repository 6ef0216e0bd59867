#!/usr/bin/env python
"""Driver-mimic verification harness (see .claude/skills/verify).

Runs the __spark_entry__ contract exactly the way the build driver
does: a VANILLA SparkSession (none of session.get_session's configs),
entry() smoke at sf0.001, then every queries() entry vs its DuckDB
oracle at sf0.01 — sorted-column-name match, row-count match, and an
order-insensitive stringified value hash.

Usage:
    python tests/drive_contract.py            # full inventory
    python tests/drive_contract.py name1 name2  # just these queries
    python tests/drive_contract.py prefix*      # glob on names
"""

from __future__ import annotations

import fnmatch
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as em  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _hash_frame(pdf) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    cells = []
    for row in pdf.itertuples(index=False):
        cells.append("\x1f".join(_cell(v) for v in row))
    return hashlib.md5("\x1e".join(sorted(cells)).encode()).hexdigest()


def _cell(v) -> str:
    import math

    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return ""
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    try:  # numpy scalars, lists, arrays
        import numpy as np

        if isinstance(v, np.floating):
            return _cell(float(v))
        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.ndarray):
            return "[" + ",".join(_cell(x) for x in v.tolist()) + "]"
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def main() -> int:
    patterns = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = em.entry(spark).count()
    print(f"entry(): {n} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = em.queries(), em.oracle_sql()
    names = [
        nm
        for nm in qs
        if not patterns or any(fnmatch.fnmatch(nm, p) for p in patterns)
    ]
    bad = []
    for nm in names:
        try:
            pdf = qs[nm](spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {nm}: spark err {type(exc).__name__}: {exc}", flush=True)
            bad.append(nm)
            continue
        if nm not in oracles:
            print(f"ok   {nm}: rows-only ({len(pdf)} rows)", flush=True)
            continue
        try:
            odf = con.execute(oracles[nm]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {nm}: oracle err {type(exc).__name__}: {exc}", flush=True)
            bad.append(nm)
            continue
        cols_ok = sorted(pdf.columns) == sorted(odf.columns)
        rows_ok = len(pdf) == len(odf)
        hash_ok = cols_ok and rows_ok and _hash_frame(pdf) == _hash_frame(odf)
        if cols_ok and rows_ok and hash_ok:
            print(f"ok   {nm}: {len(pdf)} rows hash-match", flush=True)
        else:
            print(
                f"FAIL {nm}: cols={cols_ok} ({sorted(pdf.columns)} vs "
                f"{sorted(odf.columns)}) rows={len(pdf)}/{len(odf)} hash={hash_ok}",
                flush=True,
            )
            bad.append(nm)
    print(f"\n{len(names) - len(bad)}/{len(names)} green" + (f"; FAILURES: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
