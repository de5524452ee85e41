"""cdc_plg_spark — a PySpark-native analytics engine.

Re-expresses the data-processing contract of the reference
(detongz/cdc-plg, an RFC for a pluggable CDC transform/sink layer on
TiCDC — /root/reference/README.md) as an idiomatic Spark engine:

- the CDC event contract (ordered row-change streams, resolved-ts,
  checkpoint-ts, pluggable per-batch sinks; README.md:17,59-68) maps to
  Structured Streaming (watermarks, checkpoints, foreachBatch);
- the full relational-analytics operator surface (SURVEY.md §2) is
  plain DataFrame/Catalyst;
- LLM-data-pipeline operators (dedup, similarity, text analysis,
  multimodal plumbing) extend the surface per the north star.

Everything is DataFrame-first and designed for 100 TB scale: no
collect() in operator paths, broadcast hints for dims, AQE on,
Arrow-vectorized UDFs only where built-ins can't express semantics.
"""

from cdc_plg_spark.session import get_spark
from cdc_plg_spark.catalog import load_table, load_tables, TABLES

__all__ = ["get_spark", "load_table", "load_tables", "TABLES"]
__version__ = "0.1.0"
