"""PySpark-native analytics engine with the query and data-processing
capabilities of ``Igor-Chernenko/duckdb-redis-olap-scanner`` ("RedDuck"),
re-expressed Spark-first, plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

See SURVEY.md for the capability blueprint this implements.
"""

from .engine import Engine, get_spark, load_tables, register_datasources

__all__ = ["Engine", "get_spark", "load_tables", "register_datasources"]
__version__ = "0.1.0"
