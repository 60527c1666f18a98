"""Property-based tests: the cints expression layer must match C int32
semantics exactly (reference: src/server/aggregate.c arithmetic, C `/`
truncation, two's-complement wraparound) for ALL inputs, not just the
fixtures. Hypothesis drives a Spark column-expression evaluation against
a pure-Python C-semantics model."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kstore_spark.operators.cints import INT32_MAX, INT32_MIN

I32 = st.integers(min_value=INT32_MIN, max_value=INT32_MAX)


def c_model(op, a, b):
    if op == "add":
        r = a + b
    elif op == "sub":
        r = a - b
    elif op == "mul":
        r = a * b
    elif op == "div":
        if b == 0:
            return None
        q = abs(a) // abs(b)  # C: truncate toward zero
        r = q if (a >= 0) == (b >= 0) else -q
    return ((r + 2**31) % 2**32) - 2**31  # wrap to int32


@pytest.fixture(scope="module")
def evaluator(spark):
    """Evaluate all four ops on a batch of pairs in one Spark job."""
    from pyspark.sql import functions as F

    from kstore_spark.operators import cints

    def run(pairs):
        df = spark.createDataFrame(pairs, "a long, b long")
        out = df.select(
            cints.c_add(F.col("a"), F.col("b")).alias("add"),
            cints.c_sub(F.col("a"), F.col("b")).alias("sub"),
            cints.c_mul(F.col("a"), F.col("b")).alias("mul"),
            cints.c_div(F.col("a"), F.col("b")).alias("div"),
        ).collect()
        return [(r["add"], r["sub"], r["mul"], r["div"]) for r in out]

    return run


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(I32, I32), min_size=1, max_size=50))
def test_cints_match_c_semantics(evaluator, pairs):
    got = evaluator(pairs)
    for (a, b), (g_add, g_sub, g_mul, g_div) in zip(pairs, got):
        assert g_add == c_model("add", a, b), (a, b)
        assert g_sub == c_model("sub", a, b), (a, b)
        assert g_mul == c_model("mul", a, b), (a, b)
        assert g_div == c_model("div", a, b), (a, b)


def test_known_edges(evaluator):
    cases = [
        (INT32_MAX, 1), (INT32_MIN, -1), (INT32_MIN, 1), (-7, 2), (7, -2),
        (INT32_MAX, INT32_MAX), (INT32_MIN, INT32_MIN), (0, 5), (5, 0),
    ]
    got = evaluator(cases)
    for (a, b), (g_add, g_sub, g_mul, g_div) in zip(cases, got):
        assert g_add == c_model("add", a, b)
        assert g_sub == c_model("sub", a, b)
        assert g_mul == c_model("mul", a, b)
        assert g_div == c_model("div", a, b)
