"""hadoop_20_warehouse_spark — a PySpark-native analytics engine.

Re-expresses the data-processing capabilities of the reference
warehouse substrate (liangly/hadoop-20-warehouse: MapReduce join
frameworks, declarative aggregation, total-order sort, field
selection, streaming pipes, storage formats) as idiomatic Spark
DataFrame / SQL plans, plus the LLM-data-pipeline operators a modern
100 TB warehouse needs (dedup, similarity search, text analysis,
multimodal columns, structured streaming).

Design principles (SURVEY.md §7):
- DataFrame-first; Catalyst/Tungsten own optimization and execution.
- AQE on everywhere; broadcast small dims; no driver-side data paths.
- Python only parses specs and composes plans; data stays JVM-side.
"""

from hadoop_20_warehouse_spark.session import get_session, stop_session
from hadoop_20_warehouse_spark.catalog import load_tables, TABLE_NAMES

__version__ = "0.1.0"

__all__ = ["get_session", "stop_session", "load_tables", "TABLE_NAMES", "__version__"]
