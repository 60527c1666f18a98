"""C int32 arithmetic semantics as Spark Column expressions.

The reference engine stores 32-bit signed ints and computes with C
semantics (reference: src/server/aggregate.c:9-182):

- ``+ - *`` wrap around modulo 2^32 (two's complement)
- ``/`` is integer division truncating toward zero
- ``avg`` is ``sum / count`` with the same truncating division — NOT a
  floating-point mean (reference: assts/p3.txt:26-39, avg({1,2}) == 1)
- empty-vector identities: min → INT_MAX, max → INT_MIN (aggregate.c:42-62)

Spark promotes int arithmetic to wider types and (in ANSI mode) raises on
overflow, so we compute in LONG and wrap back to int32 explicitly.
``expr div expr`` in Spark SQL is integral division truncating toward
zero (Java semantics), matching C for all sign combinations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INT32_MIN = -(2**31)
INT32_MAX = 2**31 - 1
_U32 = 2**32


def wrap32(c: Column) -> Column:
    """Wrap a LONG column to int32 two's-complement (C overflow behavior).

    ((x mod 2^32) + 2^32) mod 2^32 maps into [0, 2^32); values >= 2^31 are
    re-centered into the negative range.
    """
    m = ((c % _U32) + _U32) % _U32
    return F.when(m >= _U32 // 2, (m - _U32).cast("int")).otherwise(m.cast("int"))


def c_add(l: Column, r: Column) -> Column:
    return wrap32(l.cast("long") + r.cast("long"))


def c_sub(l: Column, r: Column) -> Column:
    return wrap32(l.cast("long") - r.cast("long"))


def c_mul(l: Column, r: Column) -> Column:
    return wrap32(l.cast("long") * r.cast("long"))


def c_div(l: Column, r: Column) -> Column:
    """C integer division: truncation toward zero.

    Spark SQL's ``%`` on integral types has Java/C remainder semantics
    (sign of the dividend, ``a == (a/b)*b + a%b``), so
    ``(a - a % b) / b`` is the exact C quotient; the float division is
    exact because the numerator is a multiple of b and |a| < 2^63.
    Division by zero yields NULL (non-ANSI mode); callers decide whether
    that is the reference's DBEDIVZERO error.
    """
    ll, rr = l.cast("long"), r.cast("long")
    return wrap32(((ll - (ll % rr)) / rr).cast("long"))


def c_avg(sum_col: Column, cnt_col: Column) -> Column:
    """Truncating integer mean: wrapped int32 sum, C-divided by count."""
    return c_div(sum_col, cnt_col)
