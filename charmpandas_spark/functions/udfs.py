"""Arrow-vectorized Python UDF patterns — the sanctioned slow path.

Rules encoded here (and enforced by example): Python only where no
built-in exists; always ``pandas_udf``/``applyInPandas`` (Arrow
batches, ~10-100x over row-at-a-time Python UDFs); keep the UDF
surface minimal so Catalyst keeps optimizing around it (pushdown and
pruning still apply to the surrounding plan).

Two genuinely-Python examples:
- ``nfkc_normalize``: Unicode NFKC text normalization (unicodedata —
  no Spark built-in), a standard pre-dedup cleanup step.
- ``zscore_by_group``: per-group standardization via applyInPandas
  (grouped-map; whole group as one pandas frame).
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import DataFrame as SparkDF, functions as F
from pyspark.sql.functions import pandas_udf


# NB: pandas_udf decorators parse their return type eagerly and need
# an active SparkSession — at module level that breaks executor-side
# re-imports during closure unpickling (SESSION_OR_CONTEXT_NOT_EXISTS).
# So the udfs are constructed lazily, per call.

def nfkc_normalize(col) -> "F.Column":
    """Vectorized Unicode NFKC normalization (full-width forms,
    ligatures, compatibility chars -> canonical)."""
    @pandas_udf("string")
    def _nfkc(s: pd.Series) -> pd.Series:
        return s.map(lambda x: unicodedata.normalize("NFKC", x)
                     if x is not None else None)
    return _nfkc(col)


def unicode_category_count(col) -> "F.Column":
    """Count of non-ASCII codepoints — a cheap noise signal for
    quality filtering."""
    @pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None
                     else sum(1 for ch in x if ord(ch) > 127))
    return _count(col)


def zscore_by_group(
    df: SparkDF,
    group_col: str,
    value_col: str,
    out_col: str = "zscore",
) -> SparkDF:
    """Per-group standardization via grouped-map applyInPandas: each
    group arrives as one pandas DataFrame (Arrow transfer), so the
    mean/std are exact per group. Groups must fit in executor memory —
    the contract of every grouped-map UDF."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, DoubleType())])

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std()
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / std if std and std > 0 else 0.0
        return pdf.assign(**{out_col: z})

    return df.groupBy(group_col).applyInPandas(standardize, schema)
