"""Module-level operations mirroring ``charmpandas/operations.py``.

The reference exposes exactly two module functions: ``read_parquet``
(charmpandas/operations.py:3-4) and ``concat``
(charmpandas/operations.py:6-11). We add ``read_table`` (driver
testdata convenience) and keep everything lazy.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import SparkSession

from .dataframe import DataFrame
from .sources.parquet import read_parquet as _read_parquet, read_table as _read_table

__all__ = ["read_parquet", "read_table", "concat"]


def read_parquet(spark: SparkSession, path, columns=None,
                 merge_schema=False) -> DataFrame:
    return _read_parquet(spark, path, columns, merge_schema)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _read_table(spark, sf_dir, name)


def concat(dfs: list[DataFrame]) -> DataFrame:
    """Union-all by position (reference U1: per-partition
    arrow::ConcatenateTables, schemas must match —
    src/partition.cpp:405-423). ``unionByName`` is strictly safer than
    positional union and identical when schemas match, which the
    reference requires anyway (SURVEY §2.6)."""
    if not dfs:
        raise ValueError("concat of empty list")
    sdfs = [d.sdf if isinstance(d, DataFrame) else d for d in dfs]
    return DataFrame(reduce(lambda a, b: a.unionByName(b), sdfs))
