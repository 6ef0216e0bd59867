"""Ship the engine package to Python workers.

Python-side operators (mapInPandas closures, RDD lambdas that touch
module globals) are cloudpickled BY REFERENCE when defined at module
level — workers must then import ``hadoop_20_warehouse_spark``, which
fails when the driver ran from a different cwd with only a
``sys.path`` insert (no PYTHONPATH propagation to workers).

Policy: closures in this package are written self-contained (see
multimodal/binary.py decode_meta) so they ship by value. For operators
where that is impractical, call ``ensure_shipped(spark)`` once — it
zips the package and registers it via ``addPyFile`` so every worker
can import it. On a real cluster the same call distributes the package
with the job, replacing cluster-wide installs.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[int] = set()


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zip_path = os.path.join(tempfile.gettempdir(), "hadoop_20_warehouse_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)
