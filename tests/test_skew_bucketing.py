"""Salted joins must be result-identical to plain joins on skewed keys;
bucketed joins must be exchange-free."""

from pyspark.sql import functions as F


def _skewed_vecs(spark):
    from kstore_spark.operators.types import ValVec

    # 90% of left rows share key 7 — the degenerate case
    left = spark.range(0, 20000).select(
        F.col("id").alias("pos"),
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 50).cast("int").alias("val"),
    )
    right = spark.range(0, 200).select(
        F.col("id").alias("pos"), (F.col("id") % 50).cast("int").alias("val")
    )
    return ValVec(left), ValVec(right)


def test_salted_join_identical_to_plain(spark):
    from kstore_spark.operators.joins import equijoin
    from kstore_spark.operators.skew import salted_equijoin

    l, r = _skewed_vecs(spark)
    plain, _ = equijoin(l, r, algorithm="hash")
    salted, _ = salted_equijoin(l, r, n_salt=8)
    assert plain.df.count() == salted.df.count()
    assert plain.df.exceptAll(salted.df).count() == 0
    assert salted.df.exceptAll(plain.df).count() == 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from kstore_spark.operators.skew import write_bucketed

    # tables land in ./spark-warehouse (gitignored); warehouse dir is a
    # static conf that cannot move at runtime
    a = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    ta = write_bucketed(a, "bt_a", "k", 8)
    tb = write_bucketed(b, "bt_b", "k", 8)
    # force sort-merge (tiny tables would broadcast) to show the bucketed
    # layout joins with NO shuffle exchange on either side
    joined = ta.hint("merge").join(tb, "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == 5000
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
