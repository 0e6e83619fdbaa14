"""CSV / JSON-lines sources and sinks.

The reference supports only parquet in (S1) and nothing out
(SURVEY §2.1). Spark's readers make the rest of the lakehouse surface
one-liners; these wrappers keep the engine's DataFrame type and the
same regex-path convention as the parquet source.

Scale notes: explicit ``schema=`` avoids the inference pass (a full
extra scan on TB inputs); ``multiLine=False`` JSON keeps files
splittable (one record per line -> per-block parallel parse).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..dataframe import DataFrame
from .parquet import _expand_regex_path

__all__ = ["read_csv", "read_json", "write_csv", "write_json"]


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema=None,
    header: bool = True,
    sep: str = ",",
    **options,
) -> DataFrame:
    if isinstance(path, str):
        path = _expand_regex_path(path)
    paths = [path] if isinstance(path, str) else list(path)
    reader = spark.read.options(header=header, sep=sep, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return DataFrame(reader.csv(paths))


def read_json(
    spark: SparkSession,
    path: str | list[str],
    schema=None,
    multi_line: bool = False,
    **options,
) -> DataFrame:
    if isinstance(path, str):
        path = _expand_regex_path(path)
    paths = [path] if isinstance(path, str) else list(path)
    reader = spark.read.options(multiLine=multi_line, **options)
    if schema is not None:
        reader = reader.schema(schema)
    return DataFrame(reader.json(paths))


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True, **options) -> None:
    df.sdf.write.mode(mode).options(header=header, **options).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite",
               **options) -> None:
    df.sdf.write.mode(mode).options(**options).json(path)
