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
    loopjoin → planner choice (a true NL join never wins at scale)

Late materialization: when both inputs carry Prov (filtered table
frames), the join is performed directly between those frames, keeping
every base column of both sides reachable. Post-join fetches then
project from THIS join output — the whole select→fetch→join→fetch→agg
chain executes as one shuffle join over pruned scans. Output keys are
('l_pos','r_pos'), one row per matching pair, both halves sharing the
same frame.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kstore_spark.operators.types import POS, PosList, Prov, ValVec

L_POS = "l_pos"
R_POS = "r_pos"

_HINTS = {
    "hash": "SHUFFLE_HASH",
    "sort": "MERGE",
    "tree": "BROADCAST",   # hint applies to the (small) probe side
    "loop": None,          # let Catalyst/AQE choose
    "auto": None,
}


def _apply_hint(rf, hint):
    if hint == "BROADCAST":
        # broadcast the right side (the reference's treejoin probes the
        # right column's index; broadcasting it makes every left partition
        # probe locally — no shuffle of the big side at all)
        return rf.hint("BROADCAST")
    if hint:
        return rf.hint(hint)
    return rf


def equijoin(left: ValVec, right: ValVec, algorithm: str = "auto") -> tuple[PosList, PosList]:
    """l_ids, r_ids = XXXjoin(Lvals, Rvals).

    Inputs are fetched value vectors carrying their id arrays; outputs are
    two aligned position lists with full duplicate-key multiplicity.
    """
    if algorithm not in _HINTS:
        raise ValueError(f"unknown join algorithm {algorithm!r}")
    hint = _HINTS[algorithm]
    keys = (L_POS, R_POS)

    lp, rp = left.prov, right.prov
    if (
        lp is not None and rp is not None
        and left.keys == (POS,) and right.keys == (POS,)
        and left.source_col in lp.cols and right.source_col in rp.cols
        and not set(lp.cols) & set(rp.cols)  # base names must not collide
    ):
        # late-materialization path: join the provenance frames, keep all
        # base columns of both sides reachable for post-join fetches
        lf = lp.frame.withColumnRenamed(POS, L_POS)
        rf = _apply_hint(rp.frame.withColumnRenamed(POS, R_POS), hint)
        cond = F.col(lp.cols[left.source_col]) == F.col(rp.cols[right.source_col])
        joined = lf.join(rf, on=cond, how="inner")
        prov = Prov(frame=joined, cols={**lp.cols, **rp.cols})
        out = joined.select(L_POS, R_POS)
        return (
            PosList(out, keys=keys, pos_col=L_POS, prov=prov),
            PosList(out, keys=keys, pos_col=R_POS, prov=prov),
        )

    lf = left.df.select(F.col(left.pos_col).alias(L_POS), F.col("val").alias("__lv"))
    rf = _apply_hint(
        right.df.select(F.col(right.pos_col).alias(R_POS), F.col("val").alias("__rv")),
        hint,
    )
    out = lf.join(rf, on=F.col("__lv") == F.col("__rv"), how="inner").select(L_POS, R_POS)
    return PosList(out, keys=keys, pos_col=L_POS), PosList(out, keys=keys, pos_col=R_POS)
