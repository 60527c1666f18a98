"""The DSL interpreter: a session of named intermediates over the catalog.

Mirrors the reference's evaluation model (src/server/server.c:752-871):
each parsed op resolves variables in the session environment, invokes one
operator, then either binds the result or prints it. Two deliberate
differences, both Spark-idiomatic:

- **Lazy until observed**: assignments build DataFrame lineage only;
  Catalyst sees the whole chain (select→fetch→join→agg) as ONE logical
  plan when a printing op finally forces an action — so filter pushdown /
  join reordering apply across DSL statements, which the reference's
  eager per-op execution could never do.
- **No storage-type restrictions**: the reference rejects update/delete on
  sorted/b+tree columns (storage.c:1730-1735); we allow them everywhere
  (SURVEY.md §2.1 — must not rely on the limitation).

Reference parity notes are in each operator module's docstring.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark import parser
from kstore_spark.catalog import Catalog, with_pos
from kstore_spark.operators import (
    agg_avg, agg_count, agg_max, agg_min, agg_sum,
    apply_delete, apply_insert, apply_update,
    equijoin, fetch, select_all, select_range, select_value,
    vec_add, vec_div, vec_mul, vec_sub,
)
from kstore_spark.operators import output as out_ops
from kstore_spark.operators.types import POS, VAL, PosList, ValVec


class EngineError(RuntimeError):
    pass


_AGGS = {"min": agg_min, "max": agg_max, "sum": agg_sum, "avg": agg_avg, "count": agg_count}
_MATH = {"add": vec_add, "sub": vec_sub, "mul": vec_mul, "div": vec_div}


class Engine:
    """One engine ≈ one reference server session: a variable environment
    over a shared persistent catalog (one Engine per client; Engines on
    one db_dir coordinate through the catalog's locked swap)."""

    def __init__(self, spark: SparkSession, db_dir: str, load_dir: str | None = None):
        self.spark = spark
        self.catalog = Catalog(spark, db_dir)
        self.load_dir = load_dir  # ≈ reference client --loaddir
        self.env: dict[str, PosList | ValVec] = {}

    def close(self) -> None:
        """End the session: its bound variables stop pinning tombstoned
        segments (the catalog epoch GC may then reclaim them)."""
        self.env.clear()
        self.catalog.close()

    # -- variable resolution ------------------------------------------
    def _var(self, name: str):
        if name not in self.env:
            raise EngineError(f"undefined variable: {name}")
        return self.env[name]

    def _posvar(self, name: str) -> PosList:
        v = self._var(name)
        if isinstance(v, ValVec):
            # the reference accepts value vectors where ids are needed by
            # using their id array (server.c:720-724); positions = keys
            return PosList(v.df, keys=v.keys, pos_col=v.pos_col, prov=v.prov)
        return v

    def _valvar(self, name: str) -> ValVec:
        v = self._var(name)
        if not isinstance(v, ValVec):
            raise EngineError(f"{name} is a position list, expected a value vector")
        return v

    def _column(self, name: str) -> DataFrame:
        return self.catalog.read(name)

    # -- op dispatch ---------------------------------------------------
    def eval(self, op: parser.Op) -> str | None:
        return getattr(self, f"_op_{op.kind}")(op)

    @staticmethod
    def _consumed(op: parser.Op) -> set[str]:
        ins = {op.args[k] for k in ("posvar", "var", "left", "right") if k in op.args}
        ins.update(op.args.get("vars", []))
        return ins

    def _observed_later(self, idx: int, assigned: set[str]) -> bool:
        """True if a var assigned at script index ``idx`` transitively
        reaches an action (print/tuple/mutation or a bare printing op)
        later in the current script. Used to decide whether a DBEDIVZERO
        guard embedded in the lineage will fire on its own (lazy) or
        needs an eager probe because the result is never observed —
        matching the reference's eager per-op error semantics either way.
        """
        ops = getattr(self, "_script_ops", None)
        if ops is None:
            return False
        derived = set(assigned)
        for op in ops[idx + 1:]:
            ins = self._consumed(op)
            feeds = bool(ins & derived)
            if feeds:
                if op.kind in ("print", "tuple", "delete", "update") or not op.assign:
                    return True
                derived.update(op.assign)
            else:
                derived.difference_update(op.assign)  # rebound elsewhere
        return False

    def _action(self, fn):
        """Run a Spark action, translating lineage-embedded guard errors
        (raise_error in vmath/aggregates) into the reference's error codes."""
        try:
            return fn()
        except EngineError:
            raise
        except Exception as e:
            msg = str(e)
            for tag in ("DBEDIVZERO", "DBEINTERMDIFFLEN"):
                if tag in msg:
                    start = msg.index(tag)
                    raise EngineError(msg[start:].split("\n")[0].rstrip("' ")) from None
            raise

    def run_script(self, text: str) -> str:
        ops = parser.parse_script(text)
        # static ref-count: a join whose outputs are consumed 2+ times
        # would recompute per action (the engine is lazy); persist its
        # frame for the duration of the script
        refs: dict[str, int] = {}
        for op in ops:
            for key in ("posvar", "var", "left", "right"):
                if key in op.args and op.kind != "join":
                    refs[op.args[key]] = refs.get(op.args[key], 0) + 1
            for v in op.args.get("vars", []):
                refs[v] = refs.get(v, 0) + 1
        self._hot_vars = {
            v for op in ops if op.kind == "join" for v in op.assign
            if refs.get(v, 0) >= 2
        }
        self._persisted: list = []
        self._script_ops = ops
        try:
            outputs = []
            for i, op in enumerate(ops):
                self._op_idx = i
                outputs.append(self.eval(op))
            return "\n".join(o for o in outputs if o is not None)
        finally:
            for df in self._persisted:
                df.unpersist()
            self._hot_vars, self._persisted = set(), []
            self._script_ops, self._op_idx = None, 0

    def run_file(self, path: str) -> str:
        with open(path) as f:
            return self.run_script(f.read())

    # -- DDL / load / mutation ----------------------------------------
    def _op_create(self, op) -> None:
        self.catalog.create(op.args["column"], op.args["stype"])

    def _op_load(self, op) -> None:
        path = op.args["path"]
        # relative paths resolve against the session's load dir — the
        # reference client's --loaddir (p3challenge/README), so its
        # scripts run verbatim: load("t.csv")
        if not os.path.isabs(path) and self.load_dir:
            path = os.path.join(self.load_dir, path)
        # the reference ingests only CSV (src/common/csv.c); parquet/json
        # are source extensions — same row-aligned group semantics
        if path.endswith(".parquet"):
            raw = self.spark.read.parquet(path)
        elif path.endswith(".orc"):
            raw = self.spark.read.orc(path)
        elif path.endswith((".json", ".jsonl", ".ndjson")):
            raw = self.spark.read.json(path)
        elif path.endswith((".tsv", ".tab")):
            raw = self.spark.read.csv(path, header=True, sep="\t",
                                      inferSchema=False)
        else:
            raw = self.spark.read.csv(path, header=True, inferSchema=False)
        cols = raw.columns
        for c in cols:
            if not self.catalog.exists(c):
                raise EngineError(f"load: column {c} not created")
        typed = raw.select(*[F.col(c).cast("int").alias(c) for c in cols])
        n = typed.count()
        # one shared pos assignment for the whole row-aligned file
        offset = self.catalog.next_pos(cols[0])
        for c in cols:
            if self.catalog.next_pos(c) != offset:
                raise EngineError("load: columns in one file must be row-aligned")
        # the whole file becomes ONE group segment: aligned columns stay
        # physically row-aligned, enabling late-materialization scans
        self.catalog.load_group(with_pos(typed, offset), cols, offset, n)

    def _op_insert(self, op) -> None:
        # the whole op runs under the catalog's exclusive lock so the
        # next_pos read and the segment append are one atomic
        # read-modify-write — two Engines inserting into one column from
        # different processes cannot bake the same pos into both rows
        # (the reference's storage-lock window, storage.c:1617-1653)
        with self.catalog._locked():
            self._do_insert(op)

    def _do_insert(self, op) -> None:
        pairs = op.args["pairs"]
        cols = [c for c, _ in pairs]
        # batched path: when the insert touches exactly the column set of
        # one live group (the common case — the reference's insert is one
        # row across a loaded file's columns, storage.c:1617-1653), write
        # ONE full-width group segment for the whole op instead of one
        # tiny per-column segment each. Keeps the group alive for
        # late-materialization scans and divides file count by #columns.
        metas = [self.catalog.meta(c) for c in cols]
        gids = {m["group"] for m in metas}
        if len(cols) > 1 and len(gids) == 1 and None not in gids:
            gid = next(iter(gids))
            offsets = {self.catalog.next_pos(c) for c in cols}
            if sorted(cols) == self.catalog.groups[gid]["columns"] and len(offsets) == 1:
                offset = offsets.pop()
                schema = "pos long, " + ", ".join(f"{c} int" for c in cols)
                row_df = self.spark.createDataFrame(
                    [(offset, *[int(v) for _, v in pairs])], schema
                )
                self.catalog.load_group(row_df, cols, offset, 1)
                return
        for col, value in pairs:
            pos = self.catalog.next_pos(col)
            row = apply_insert(
                self.spark.createDataFrame([], "pos long, val int"), self.spark, pos, value
            )
            self.catalog.append_segment(col, row, 1)

    def _op_delete(self, op) -> None:
        ids = self._posvar(op.args["posvar"])
        with self.catalog._locked():  # read-modify-write atomicity
            for col in op.args["columns"]:
                self._action(lambda c=col: self.catalog.replace(c, apply_delete(self._column(c), ids)))

    def _op_update(self, op) -> None:
        ids = self._posvar(op.args["posvar"])
        col = op.args["column"]
        with self.catalog._locked():
            self._action(lambda: self.catalog.replace(col, apply_update(self._column(col), ids, op.args["value"])))

    # -- query ops -----------------------------------------------------
    def _op_select(self, op) -> str | None:
        column = op.args["column"]
        mode = op.args["mode"]
        if mode == "value":  # zone-map pruning of group segments
            bounds = (op.args["value"], op.args["value"])
        elif mode == "range":
            bounds = (op.args["low"], op.args["high"])
        else:
            bounds = (None, None)
        prov = self.catalog.group_prov(column, lo=bounds[0], hi=bounds[1])
        if prov is not None:
            cdf = None
        elif mode == "value":  # zone-map segment pruning (catalog.read)
            cdf = self.catalog.read(column, lo=op.args["value"], hi=op.args["value"])
        elif mode == "range":
            cdf = self.catalog.read(column, lo=op.args["low"], hi=op.args["high"])
        else:
            cdf = self._column(column)
        if mode == "all":
            res = select_all(cdf, prov=prov, column=column)
        elif mode == "value":
            res = select_value(cdf, op.args["value"], prov=prov, column=column)
        else:
            res = select_range(cdf, op.args["low"], op.args["high"], prov=prov, column=column)
        return self._bind_or_print_pos(op, res)

    def _op_fetch(self, op) -> str | None:
        ids = self._posvar(op.args["posvar"])
        column = op.args["column"]
        if ids.prov is not None and self.catalog.meta(column)["group"] is None:
            # column was detached (mutated) after the position list was
            # built: its group-frame snapshot is stale → use the join path
            # against current data, matching the reference's read-latest
            ids = PosList(ids.df, keys=ids.keys, pos_col=ids.pos_col)
        res = fetch(self._column(column), ids, source_col=column)
        return self._bind_or_print_val(op, res)

    def _op_agg(self, op) -> str | None:
        v = self._valvar(op.args["var"])
        res = ValVec(_AGGS[op.args["fn"]](v), keys=())
        # the empty-avg DBEDIVZERO guard is embedded in agg_avg's
        # expression (fires inside the observing action — zero extra
        # jobs); only when nothing in the script ever observes the result
        # do we probe eagerly, to keep the reference's per-op error
        # semantics (aggregate.c:80-84)
        if (
            op.args["fn"] == "avg" and op.assign
            and not self._observed_later(getattr(self, "_op_idx", 0), set(op.assign))
            and v.df.limit(1).count() == 0
        ):
            raise EngineError("DBEDIVZERO: avg of empty vector")
        return self._bind_or_print_val(op, res)

    def _op_math(self, op) -> str | None:
        right = self._valvar(op.args["right"])
        res = _MATH[op.args["fn"]](self._valvar(op.args["left"]), right)
        # DBEDIVZERO is embedded in vec_div's expression (aggregate.c:18-22,
        # fires inside the observing action); eager probe only for results
        # the script never observes
        if (
            op.args["fn"] == "div" and op.assign
            and not self._observed_later(getattr(self, "_op_idx", 0), set(op.assign))
            and right.df.filter(F.col("val") == 0).limit(1).count() > 0
        ):
            raise EngineError("DBEDIVZERO: division by zero")
        return self._bind_or_print_val(op, res)

    def _op_join(self, op) -> None:
        left, right = self._valvar(op.args["left"]), self._valvar(op.args["right"])
        if op.args["algorithm"] == "salt":
            # extension verb: skew-salted join (operators/skew.py)
            from kstore_spark.operators.skew import salted_equijoin

            l_ids, r_ids = salted_equijoin(left, right)
        else:
            l_ids, r_ids = equijoin(left, right, algorithm=op.args["algorithm"])
        l_name, r_name = op.assign
        if getattr(self, "_hot_vars", None) and {l_name, r_name} & self._hot_vars:
            # both halves share one frame (prov or df) — persist it once
            target = l_ids.prov.frame if l_ids.prov is not None else l_ids.df
            target.persist()
            self._persisted.append(target)
        self.env[l_name] = l_ids
        self.env[r_name] = r_ids

    def _op_tuple(self, op) -> str:
        vecs = [self._valvar(v) for v in op.args["vars"]]
        rows = self._action(lambda: out_ops.zip_vectors(vecs).collect())
        return out_ops.format_tuple_rows(rows)

    def _op_explain(self, op) -> str:
        """Extension verb: the optimized physical plan for a bound
        variable — surfacing Catalyst's work (the reference has no
        optimizer to inspect; this engine does)."""
        v = self._var(op.args["var"])
        return v.df._jdf.queryExecution().executedPlan().toString()

    def _op_print(self, op) -> str:
        v = self._var(op.args["var"])
        if isinstance(v, ValVec):
            return self._action(lambda: out_ops.format_vector(v))
        return self._action(lambda: out_ops.format_poslist(v))

    # -- bind-or-print helpers ----------------------------------------
    def _bind_or_print_pos(self, op, res: PosList) -> str | None:
        if op.assign:
            self.env[op.assign[0]] = res
            return None
        return self._action(lambda: out_ops.format_poslist(res))

    def _bind_or_print_val(self, op, res: ValVec) -> str | None:
        if op.assign:
            self.env[op.assign[0]] = res
            return None
        return self._action(lambda: out_ops.format_vector(res))
