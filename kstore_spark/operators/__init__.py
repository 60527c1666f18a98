from kstore_spark.operators.select import select_all, select_range, select_value
from kstore_spark.operators.fetch import fetch
from kstore_spark.operators.joins import equijoin
from kstore_spark.operators.aggregates import agg_avg, agg_count, agg_max, agg_min, agg_sum
from kstore_spark.operators.vmath import vec_add, vec_div, vec_mul, vec_sub
from kstore_spark.operators.mutations import apply_delete, apply_insert, apply_update

__all__ = [
    "select_all", "select_value", "select_range", "fetch", "equijoin",
    "agg_min", "agg_max", "agg_sum", "agg_avg", "agg_count",
    "vec_add", "vec_sub", "vec_mul", "vec_div",
    "apply_insert", "apply_delete", "apply_update",
]
