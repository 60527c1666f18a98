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


def test_saltjoin_dsl_verb(spark, tmp_path):
    """The saltjoin extension verb produces the same result as hashjoin."""
    from kstore_spark.engine import Engine

    csv = tmp_path / "t.csv"
    csv.write_text(
        "qa,qb\n" + "\n".join(f"{i % 3},{i}" for i in range(30))
    )
    csv2 = tmp_path / "u.csv"
    csv2.write_text("ra,rb\n0,100\n1,200\n2,300\n")
    e = Engine(spark, str(tmp_path / "db"))
    e.run_script(
        f'create(qa,"unsorted")\ncreate(qb,"unsorted")\n'
        f'create(ra,"unsorted")\ncreate(rb,"unsorted")\n'
        f'load("{csv}")\nload("{csv2}")'
    )
    script = (
        "s1=select(qa)\nf1=fetch(qa,s1)\ns2=select(ra)\nf2=fetch(ra,s2)\n"
        "l,r={algo}join(f1,f2)\ng=fetch(rb,r)\nx=sum(g)\nprint(x)"
    )
    assert e.run_script(script.format(algo="salt")) == e.run_script(script.format(algo="hash"))


def test_partition_pruning(spark, tmp_path):
    """Date-partitioned writes prune at the directory level — the scan
    lists only the queried partition (PartitionFilters in the plan)."""
    from pyspark.sql import functions as F

    from kstore_spark.tables import table

    ev = table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "ev_part")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(out)
    q = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "2024-01-05" in plan or "isnotnull(day" in plan
    assert q.count() > 0
