"""Intermediate result types of the column-algebra engine.

The reference binds two kinds of intermediates to session variables
(reference: src/common/include/results.h:12-40):

- a *position list* (``column_ids``): bitmap (from selects) or explicit id
  array (from joins);
- a *value vector* (``column_vals``): values + the parallel array of source
  row ids.

In Spark both become DataFrames. The critical invariant is **alignment**:
two vectors fetched with the two halves of a join output must stay
row-aligned (reference: src/server/storage.c:1324-1366 restores id-array
order after gather). A global row index would serialize on one partition
at 100 TB, so instead every intermediate carries its *alignment keys* —
the set of columns that uniquely identify a row of the vector:

- select-derived:   keys = ('pos',)        — position in the base column
- join-derived:     keys = ('l_pos','r_pos') — one row per join match

Zipping two vectors (math ops, tuple) is then an equi-join on the shared
keys: shuffle-partitioned, no driver materialization, no windows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

POS = "pos"
VAL = "val"


@dataclass(frozen=True)
class Prov:
    """Late-materialization provenance: the filtered/joined *table frame*
    an intermediate was derived from.

    ``frame`` holds the alignment keys plus every still-reachable base
    column, under the names in ``cols`` (base column name → frame column
    name). Operators use it to turn positional gathers into projections:

    - fetch(C, ids) where C ∈ ids.prov.cols → ``frame.select(keys, C)``
      — NO self-join on pos; the filter and the projection fuse into one
      Parquet scan with pushdown. This is a column store's late
      materialization, expressed as Catalyst-visible lineage.
    - equijoin(L, R) with both provs → join the two frames directly,
      keeping both sides' columns reachable; post-join fetches become
      projections of the single join output instead of three more joins.
    - math/tuple over vectors sharing one frame → column arithmetic on
      that frame, no zip-join.

    Every fast path has a semantics-identical join fallback, so prov is
    purely an optimization layer. At 100 TB the difference is structural:
    the challenge-style query runs as ONE shuffle join instead of six.
    """

    frame: DataFrame
    cols: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class PosList:
    """A set/sequence of positions into one base column.

    ``df`` holds the alignment-key columns; ``pos_col`` names the column
    whose values are positions into the base column. For select outputs
    keys == (pos_col,) == ('pos',); for a join output's left half,
    keys == ('l_pos','r_pos') and pos_col == 'l_pos' (duplicates allowed —
    full join multiplicity).
    """

    df: DataFrame
    keys: tuple[str, ...] = (POS,)
    pos_col: str = POS
    prov: Prov | None = None


@dataclass(frozen=True)
class ValVec:
    """A value vector aligned to ``keys``; the values live in column 'val'."""

    df: DataFrame
    keys: tuple[str, ...] = (POS,)
    source_col: str | None = None  # base column name values came from
    prov: Prov | None = None
    source_pos: str | None = None  # key column holding this vector's own
    # positions (set at fetch time from the position list's pos_col, so a
    # vector fetched with a join's RIGHT half correctly reports 'r_pos')

    @property
    def pos_col(self) -> str:
        return self.source_pos if self.source_pos is not None else self.keys[0]


def aligned(a: "ValVec", b: "ValVec") -> bool:
    return a.keys == b.keys
