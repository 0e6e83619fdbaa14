"""ORC source and sink (Spark-native columnar format).

Rounds out the lakehouse surface next to parquet/CSV/JSON (the
reference reads parquet only — SURVEY §2.1): ORC is the other
splittable columnar format Spark ships a vectorized JVM reader for,
with the same predicate-pushdown + column-pruning behavior as
parquet (min/max stripe stats, dictionary encoding), so mixed-format
lakes read through one API.

Scale notes: ORC stripes play the role of parquet row groups — the
clustered-write guidance in ``sources/parquet.py`` (range
repartition + in-file sort for stats-based pruning) applies
unchanged; pushdown is on by default via
``spark.sql.orc.filterPushdown``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..dataframe import DataFrame
from .parquet import _expand_regex_path

__all__ = ["read_orc", "write_orc"]


def read_orc(
    spark: SparkSession,
    path: str | list[str],
    schema=None,
    **options,
) -> DataFrame:
    if isinstance(path, str):
        path = _expand_regex_path(path)
    paths = [path] if isinstance(path, str) else list(path)
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return DataFrame(reader.orc(paths))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              **options) -> None:
    sdf = df.sdf if isinstance(df, DataFrame) else df
    sdf.write.mode(mode).options(**options).orc(path)
