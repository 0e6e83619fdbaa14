"""Approximate/sketch aggregations for 100 TB-scale profiling.

Counting distincts or computing quantiles exactly over 100 TB costs a
full shuffle of the key space; sketches answer within a few percent
with bounded memory and a single pass. All built on Spark's native
sketch aggregates (JVM-side, mergeable, partial-aggregable):

- HyperLogLog++ (``approx_count_distinct``) and Apache DataSketches
  HLL (``hll_sketch_agg`` — mergeable across tables/days via
  ``hll_union_agg``)
- quantile sketches (``percentile_approx``)
- heavy hitters (``count_min_sketch`` / frequency by groupBy-top-k)

These are deliberately NOT in the DuckDB-oracle set: sketch estimates
are implementation-defined, so tests assert error bounds against the
exact answers instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, functions as F

__all__ = [
    "approx_distinct",
    "hll_sketch",
    "hll_merge",
    "approx_quantiles",
    "heavy_hitters",
]


def approx_distinct(df: SparkDF, col: str, rsd: float = 0.02,
                    by: list[str] | None = None) -> SparkDF:
    """HLL++ distinct-count estimate (relative std dev ``rsd``);
    exact shuffles the whole key space, this is one pass + tiny state."""
    agg = F.approx_count_distinct(col, rsd=rsd).alias(f"approx_{col}")
    return df.groupBy(*(by or [])).agg(agg)


def hll_sketch(df: SparkDF, col: str, by: list[str] | None = None,
               lg_k: int = 12) -> SparkDF:
    """Materialize mergeable DataSketches HLL sketches (binary column)
    — the building block for incremental distinct counts across
    partitions/days without re-scanning history."""
    agg = F.hll_sketch_agg(F.col(col).cast("string"), lg_k) \
        .alias(f"{col}_hll")
    return df.groupBy(*(by or [])).agg(agg)


def hll_merge(sketches: SparkDF, sketch_col: str,
              by: list[str] | None = None) -> SparkDF:
    """Union pre-computed HLL sketches and extract the estimate."""
    merged = sketches.groupBy(*(by or [])).agg(
        F.hll_union_agg(sketch_col).alias("_merged"))
    return merged.select(*(by or []),
                         F.hll_sketch_estimate("_merged").alias("estimate"))


def approx_quantiles(df: SparkDF, col: str,
                     probabilities: list[float] = (0.5, 0.95, 0.99),
                     accuracy: int = 10000,
                     by: list[str] | None = None) -> SparkDF:
    """Approximate quantiles (Greenwald-Khanna style) in one pass."""
    agg = F.percentile_approx(
        col, F.array(*[F.lit(p) for p in probabilities]), accuracy
    ).alias(f"{col}_quantiles")
    return df.groupBy(*(by or [])).agg(agg)


def heavy_hitters(df: SparkDF, col: str, k: int = 10,
                  by: list[str] | None = None) -> SparkDF:
    """Top-k most frequent values (exact counts via partial-aggregated
    groupBy, then per-group top-k window — the shuffle carries one row
    per distinct value, not per input row)."""
    from pyspark.sql import Window

    by = by or []
    counts = df.groupBy(*by, col).agg(F.count(F.lit(1)).alias("freq"))
    if by:
        w = Window.partitionBy(*by).orderBy(F.col("freq").desc(),
                                            F.col(col).asc())
        return (counts.withColumn("rank", F.row_number().over(w))
                      .filter(F.col("rank") <= k))
    return counts.orderBy(F.col("freq").desc(), F.col(col).asc()).limit(k)
