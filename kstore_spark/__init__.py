"""kstore_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference column store (kennyyu/kstore),
re-expressed Spark-first, plus large-scale training-data pipeline operators.

Layout:
    session     — tuned SparkSession factory for local testing / cluster use
    catalog     — persistent column catalog (Parquet-backed columns + pos ids)
    parser      — the reference's imperative column-algebra DSL front end
    engine      — DSL interpreter: session env of DataFrames, eager printing
    operators/  — select / fetch / join / aggregate / math / mutation / output
    functions/  — dedup, similarity search, text analysis, multimodal plumbing
    plans/      — analytic query suite (TPC-H-style) used by bench + driver
    streaming/  — Structured Streaming operators over the events table
"""

from kstore_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
