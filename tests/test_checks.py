"""The consolidated approx-equivalence driver entry must report zero
violations — this is the pytest twin of the driver's all-zeros oracle
(plans/checks.py), run at sf0.001 for speed. Names must cover every
rows-only op so no approximate operator's evidence rests on pytest
gates alone."""

SF_DIR = "/root/testdata/sf0.001"


def test_all_equivalence_checks_zero(spark):
    from kstore_spark.plans.checks import CHECK_NAMES, approx_equivalence_checks

    rows = {r["check_name"]: r["n_diff"]
            for r in approx_equivalence_checks(spark, SF_DIR).collect()}
    assert set(rows) == set(CHECK_NAMES)
    assert all(v == 0 for v in rows.values()), rows


def test_check_names_cover_rows_only_ops():
    import __spark_entry__ as e
    from kstore_spark.plans.checks import CHECK_NAMES

    rows_only = set(e.queries()) - set(e.oracle_sql())
    assert rows_only <= set(CHECK_NAMES)
