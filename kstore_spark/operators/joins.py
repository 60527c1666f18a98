"""Joins: inner equi-join on value equality over two value vectors,
emitting two ALIGNED position lists into the original base columns.

Reference semantics (src/server/join.c:327-390): all four algorithms
(loopjoin / sortjoin / treejoin / hashjoin) compute the identical logical
result — full M×N multiplicity for duplicate keys, order-insensitive
(reference test.sh:29-36 accepts any row order). The keywords only choose
the physical algorithm.

Spark realization: ONE logical join; the four reference keywords map to
Catalyst join *strategy hints*, and with AQE enabled Spark will itself
pick broadcast vs shuffle-hash vs sort-merge based on runtime sizes —
the reference's "swap smaller side" heuristic (join.c:341-343) is
subsumed by AQE build-side selection.

    hashjoin → SHUFFLE_HASH   (static 2-pass hash table ≈ shuffled hash)
    sortjoin → MERGE          (sort-merge join)
    treejoin → BROADCAST      (index-nested-loop ≈ broadcast probe side)
    loopjoin → SHUFFLE_REPLICATE_NL only if forced; we default it to the
               planner's choice because a true cartesian NL join is never
               the right physical plan at scale.

Output: DataFrame (l_pos, r_pos) — one row per matching pair. Both output
halves are PosLists sharing keys ('l_pos','r_pos') so later fetches stay
row-aligned by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kstore_spark.operators.types import PosList, ValVec

L_POS = "l_pos"
R_POS = "r_pos"

_HINTS = {
    "hash": "SHUFFLE_HASH",
    "sort": "MERGE",
    "tree": "BROADCAST",   # hint applies to the (small) probe side
    "loop": None,          # let Catalyst/AQE choose; NL join never wins at scale
    "auto": None,
}


def equijoin(left: ValVec, right: ValVec, algorithm: str = "auto") -> tuple[PosList, PosList]:
    """l_ids, r_ids = XXXjoin(Lvals, Rvals).

    Inputs are fetched value vectors carrying their id arrays; outputs are
    two aligned position lists with full duplicate-key multiplicity.
    """
    if algorithm not in _HINTS:
        raise ValueError(f"unknown join algorithm {algorithm!r}")
    lf = left.df.select(F.col(left.pos_col).alias(L_POS), F.col("val").alias("__lv"))
    rf = right.df.select(F.col(right.pos_col).alias(R_POS), F.col("val").alias("__rv"))
    hint = _HINTS[algorithm]
    if hint == "BROADCAST":
        # broadcast the right side (the reference's treejoin probes the
        # right column's index; broadcasting it makes every left partition
        # probe locally — no shuffle of the big side at all)
        rf = rf.hint("BROADCAST")
    elif hint:
        rf = rf.hint(hint)
    out = lf.join(rf, on=F.col("__lv") == F.col("__rv"), how="inner").select(L_POS, R_POS)
    keys = (L_POS, R_POS)
    return PosList(out, keys=keys, pos_col=L_POS), PosList(out, keys=keys, pos_col=R_POS)
