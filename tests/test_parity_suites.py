"""The §2 parity suites (kparity._SUITES — the r7 rotation-math fix)
must hash-match their composed DuckDB oracles at sf0.001, cover every
§2 parity key between them, and actually move when a member relation
moves (the checksum is evidence, not decoration)."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("part", "orders", "customer", "supplier"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_suites_cover_every_parity_key():
    from kstore_spark.plans import kparity

    suite_members = {op for ops in kparity._SUITES.values() for op in ops}
    singles = {k for k in kparity._BASE_QUERIES}
    assert suite_members == singles
    # every member has a static column map matching its oracle
    assert set(kparity._SUITE_COLS) == singles


@pytest.mark.parametrize("suite", [
    "parity_suite_scan_agg", "parity_suite_math_mutation",
    "parity_suite_join"])
def test_suite_matches_oracle(spark, con, suite):
    from kstore_spark.plans import kparity

    got = sorted(tuple(r) for r in kparity.QUERIES[suite](spark, SF_DIR).collect())
    exp = sorted(con.execute(kparity.ORACLES[suite]).fetchall())
    assert got == exp and len(got) == len(kparity._SUITES[suite])
    # no degenerate checksums: a suite where every sig_sum is 0 is not
    # evidence (n_rows>0 ops must contribute a nonzero fold)
    assert any(sig != 0 for _, n, sig in got if n > 0)


def test_suite_checksum_detects_a_value_change(spark):
    """Perturb one member relation by one value — the suite signature
    for that op must move (guards against a fold that collapses)."""
    from pyspark.sql import functions as F

    from kstore_spark.plans import kparity

    df = kparity._BASE_QUERIES["math_add"](spark, SF_DIR)
    base = df.select(kparity._row_sig(df).alias("s")).agg(
        F.sum("s")).collect()[0][0]
    bumped = df.withColumn("val", F.col("val") + F.lit(1))
    moved = bumped.select(kparity._row_sig(bumped).alias("s")).agg(
        F.sum("s")).collect()[0][0]
    assert base != moved
