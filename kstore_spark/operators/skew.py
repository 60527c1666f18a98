"""Skew & co-location tools for joins at scale.

Two mechanisms the 100 TB deployment reaches for when AQE's automatic
skew-join splitting isn't enough or a join key recurs across many
queries:

- **Salted join**: a degenerate-key equi-join (one key holding a large
  fraction of rows) shuffles that key's rows to a single reducer. Salting
  splits each key into ``n_salt`` sub-keys on the big side and replicates
  the small side ``n_salt``× — same logical result (asserted in tests),
  bounded per-reducer fan-in.
- **Bucketed tables**: ``write_bucketed`` persists a DataFrame bucketed
  and sorted by the join key via the Spark catalog; joins between tables
  bucketed the same way execute with NO shuffle exchange on either side
  (asserted in tests) — the Spark-native equivalent of co-partitioned
  column files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.operators.types import PosList, ValVec
from kstore_spark.operators.joins import L_POS, R_POS


def salted_equijoin(left: ValVec, right: ValVec, n_salt: int = 8) -> tuple[PosList, PosList]:
    """Equi-join on value with key salting: identical output to
    equijoin(), but a hot key's rows spread over n_salt reducers.

    Left (big) side: salt = hash(pos) % n_salt — deterministic, uniform.
    Right (small) side: each row replicated once per salt value.
    """
    lf = left.df.select(
        F.col(left.pos_col).alias(L_POS),
        F.col("val").alias("__lv"),
        F.pmod(F.xxhash64(F.col(left.pos_col)), F.lit(n_salt)).alias("__salt"),
    )
    rf = right.df.select(
        F.col(right.pos_col).alias(R_POS),
        F.col("val").alias("__rv"),
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])).alias("__salt"),
    )
    out = lf.join(
        rf, on=[lf["__lv"] == rf["__rv"], lf["__salt"] == rf["__salt"]], how="inner"
    ).select(L_POS, R_POS)
    keys = (L_POS, R_POS)
    return PosList(out, keys=keys, pos_col=L_POS), PosList(out, keys=keys, pos_col=R_POS)


def write_bucketed(df: DataFrame, name: str, key: str, n_buckets: int = 16) -> DataFrame:
    """Persist ``df`` bucketed+sorted by ``key`` as a catalog table and
    return the bucketed reader. Joins/aggregations on ``key`` between
    tables bucketed the same way are exchange-free."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a previous session's managed-table dir blocks re-creation even after
    # DROP (the in-memory catalog forgot it) — clear the location
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )
    return spark.table(name)
