"""Scalar (int8) embedding quantization — the storage/serving
compression step of an embedding pipeline: per-dimension global
[min, max] ranges, each float mapped to an 8-bit code. 4x smaller
vectors for ANN candidate generation with exact-rescoring on the
original floats (the standard two-stage serving layout).

Determinism contract: the code assignment is a FIXED-ORDER IEEE double
expression ``least(255, greatest(0, floor((x - lo) * 255 / (hi -
lo))))`` over stats that are exact min/maxes — bit-identical across
engines and partitionings, so even the quantized codes are
hash-checkable cross-engine (constant dimensions code to 0 instead of
dividing by zero).

Scale shape: stats are ONE posexplode + one partial-aggregated
groupBy(dim) (the stream collapses to |dims| rows map-side); the
per-dimension ranges then ride the plan as a broadcast 1-row pair of
sorted arrays, and the coding itself is SCAN-LOCAL — an index
transform over each vector, no second shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

from .dedup import spread

__all__ = ["quantize_embeddings", "quantize_embeddings_sql"]


def quantize_embeddings(df: SparkDF, vec_col: str, id_col: str,
                        levels: int = 256) -> SparkDF:
    """``(id, codes array<int>)`` with per-dimension global-range
    scalar quantization into ``levels`` buckets (default int8).
    Vectors shorter than the longest one code their own dims only;
    null vectors yield null codes."""
    top = levels - 1
    ex = (spread(df.select(F.col(id_col).alias("id"),
                           F.col(vec_col).alias("v")))
          .select("id", F.posexplode("v").alias("d", "x"))
          .select("id", "d", F.col("x").cast("double").alias("x")))
    stats = (ex.groupBy("d")
               .agg(F.min("x").alias("lo"), F.max("x").alias("hi")))
    bounds = stats.agg(
        F.array_sort(F.collect_list(F.struct("d", "lo", "hi")))
         .alias("b"))
    v = F.col("v")
    b = F.col("b")
    code = F.transform(
        F.sequence(F.lit(0), F.size(v) - 1),
        lambda i: F.when(
            b[i]["hi"] == b[i]["lo"], F.lit(0)).otherwise(
            F.least(F.lit(top), F.greatest(F.lit(0), F.floor(
                (v[i].cast("double") - b[i]["lo"]) * F.lit(float(top))
                / (b[i]["hi"] - b[i]["lo"])))))
         .cast("int"))
    return (df.select(F.col(id_col).alias("id"),
                      F.col(vec_col).alias("v"))
              .crossJoin(F.broadcast(bounds))
              .select("id", code.alias("codes")))


def quantize_embeddings_sql(t: str, id_expr: str, vec_expr: str,
                            levels: int = 256) -> str:
    """DuckDB twin in LONG format ``(id, d, code)`` (how the
    registered query exposes it — array-valued result columns don't
    hash-compare portably). Positional indexing via list_transform
    over a range, identical double-op order."""
    top = levels - 1
    return f"""
        WITH ex AS (
            SELECT {id_expr} AS {id_expr}, u.d AS d,
                   CAST({vec_expr}[CAST(u.d + 1 AS INT)] AS DOUBLE) AS x
            FROM {t},
                 (SELECT unnest(range(0,
                      (SELECT max(len({vec_expr})) FROM {t}))) AS d) u
            WHERE u.d < len({vec_expr})),
        stats AS (
            SELECT d, min(x) AS lo, max(x) AS hi FROM ex GROUP BY d)
        SELECT ex.{id_expr}, CAST(ex.d AS INT) AS d,
               CASE WHEN s.hi = s.lo THEN 0
                    ELSE CAST(LEAST({top}, GREATEST(0,
                         FLOOR((ex.x - s.lo) * CAST({top} AS DOUBLE)
                               / (s.hi - s.lo)))) AS INT) END AS code
        FROM ex JOIN stats s USING (d)
    """
