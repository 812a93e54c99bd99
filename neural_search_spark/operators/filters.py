"""Mongo-style metadata filters compiled to Catalyst Column predicates.

The reference evaluates ``{field: value}`` / ``{field: {"$op": value}}`` dicts
per result row in Python *after* an oversampled kNN
(``/root/reference/src/neural_search/storage/faiss_store.py:215-267``, applied
``:311-313``). Operators: ``$eq $ne $gt $gte $lt $lte $in $nin``; a bare value
means equality; multiple keys AND together; a missing key fails the row.

Here the same dict compiles to native Column predicates, so Catalyst pushes
them into the scan (partition/file pruning + parquet row-group stats) instead
of post-filtering — strictly earlier and cheaper than the reference.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin"}


def _leaf(col: Column, op: str, value: Any) -> Column:
    if op == "$eq":
        return col == F.lit(value)
    if op == "$ne":
        return col != F.lit(value)
    if op == "$gt":
        return col > F.lit(value)
    if op == "$gte":
        return col >= F.lit(value)
    if op == "$lt":
        return col < F.lit(value)
    if op == "$lte":
        return col <= F.lit(value)
    if op == "$in":
        return col.isin(list(value))
    if op == "$nin":
        return ~col.isin(list(value))
    raise ValueError(f"unsupported filter operator: {op}")


def compile_filters(filters: dict[str, Any]) -> Column:
    """Compile a reference-style filter dict to one AND-ed Column predicate."""
    pred: Column | None = None
    for field, cond in filters.items():
        col = F.col(field)
        if isinstance(cond, dict):
            for op, value in cond.items():
                if op not in _OPS:
                    raise ValueError(f"unsupported filter operator: {op}")
                leaf = _leaf(col, op, value)
                pred = leaf if pred is None else pred & leaf
        else:
            leaf = col == F.lit(cond)  # bare value => equality
            pred = leaf if pred is None else pred & leaf
    if pred is None:
        return F.lit(True)
    return pred


def apply_filters(df: DataFrame, filters: dict[str, Any] | None) -> DataFrame:
    if not filters:
        return df
    return df.where(compile_filters(filters))
