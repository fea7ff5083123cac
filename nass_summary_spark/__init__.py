"""nass_summary_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
CSTARS/nass-summary reference pipeline (PostgreSQL ETL over USDA NASS
Quick Stats) as idiomatic Spark DataFrame operators, plus the
large-scale training-data operators (dedup, similarity search,
multimodal columns, text analysis) such an engine needs at 100 TB.
"""

__version__ = "0.1.0"
