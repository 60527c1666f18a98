"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on sf0.001 (smoke check).
- ``queries()``: one entry per implemented operator/query from
  SURVEY.md §2 plus the large-scale pipeline extensions.
- ``oracle_sql()``: DuckDB-equivalent SQL for each query (omitted only
  for genuinely non-SQL-expressible ops → weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: shipping-priority top-k (join + group + top-k) at sf0.001."""
    from kstore_spark.plans import analytics

    return analytics.q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kstore_spark.plans import analytics, extended, kparity

    out: dict[str, Callable] = {}
    out.update(kparity.QUERIES)
    out.update(analytics.QUERIES)
    out.update(extended.QUERIES)
    try:
        from kstore_spark.functions import dedup, multimodal, similarity, text

        out.update(dedup.QUERIES)
        out.update(similarity.QUERIES)
        out.update(text.QUERIES)
        out.update(multimodal.QUERIES)
    except ImportError:
        pass
    try:
        from kstore_spark.streaming import windows as stream_windows

        out.update(stream_windows.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from kstore_spark.plans import analytics, extended, kparity

    out: dict[str, str] = {}
    out.update(kparity.ORACLES)
    out.update(analytics.ORACLES)
    out.update(extended.ORACLES)
    try:
        from kstore_spark.functions import dedup, multimodal, similarity, text

        out.update(dedup.ORACLES)
        out.update(similarity.ORACLES)
        out.update(text.ORACLES)
        out.update(multimodal.ORACLES)
    except ImportError:
        pass
    try:
        from kstore_spark.streaming import windows as stream_windows

        out.update(stream_windows.ORACLES)
    except ImportError:
        pass
    return out
