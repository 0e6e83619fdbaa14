"""charmpandas_spark — a PySpark-native analytics engine with the
query surface of UIUC-PPL/charmpandas, rebuilt Spark-first.

The reference is a client/server distributed-pandas on Charm++
(thin Python client -> CCS socket -> C++ Arrow/Acero execution).
Here every reference operator (SURVEY.md §2) is a thin lazy wrapper
over ``pyspark.sql`` so Catalyst/Tungsten/AQE provide the planning,
shuffle, skew handling and vectorized execution the reference
hand-rolls — plus the LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) the north star demands.

Typical use::

    import charmpandas_spark as cps
    spark = cps.get_spark()
    df = cps.read_parquet(spark, "/data/lineitem.parquet")
    df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
    out = df[df["l_shipdate"] < datetime(1996, 1, 1)] \
        .groupby("l_returnflag")["revenue"].sum()
    out.get()   # pandas
"""

from .session import get_spark
from .dataframe import DataFrame, Field, GroupBy
from .operations import concat, read_parquet, read_table
from .sources.parquet import write_clustered, write_parquet

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "DataFrame",
    "Field",
    "GroupBy",
    "concat",
    "read_parquet",
    "read_table",
    "write_parquet",
    "write_clustered",
]
