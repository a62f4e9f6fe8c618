"""Deterministic hash-based dataset splits (reference S3).

The reference splits pages into train/val/test by row ranges over a seed
flag (``/root/reference/src/data_fetchers.py:55-66``: LIMIT offsets into
``pages where is_seed_page = 1``). Row ranges don't distribute — they
impose a total order — so the Spark-native equivalent assigns each record
a stable bucket from the cross-engine md5 hash family and splits on
bucket ranges: reproducible across runs/engines, no ordering, no shuffle
(the split predicate is a pure projection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entity_linking_spark.hashing import bucket

_RESOLUTION = 10_000


def split_column(
    id_col: Column | str, fractions: dict[str, float], seed: int = 0
) -> Column:
    """Column mapping each id to its split name per ``fractions``
    (values must sum to ≤ 1; remainder falls into the last split)."""
    total = sum(fractions.values())
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"fractions must sum to (0, 1], got {total}")
    b = bucket(id_col, _RESOLUTION, seed=seed)
    expr = None
    hi = 0
    names = list(fractions)
    for name in names[:-1]:
        # round, not floor: 0.29 * 10000 is 2899.999... in floats, and a
        # floored cut point would disagree with any hand-mirrored SQL
        hi += round(fractions[name] * _RESOLUTION)
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: int = 0,
) -> dict[str, DataFrame]:
    """→ {split_name: DataFrame}: disjoint, exhaustive, deterministic."""
    col = split_column(F.col(id_col), fractions, seed=seed)
    with_split = df.withColumn("_split", col)
    return {
        name: with_split.where(F.col("_split") == name).drop("_split")
        for name in fractions
    }
