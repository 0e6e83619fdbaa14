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
    "approx_quantiles_check",
    "approx_distinct_check",
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


def approx_quantiles_check(df: SparkDF, col: str,
                           probabilities: list[float],
                           accuracy: int = 10000,
                           by: list[str] | None = None) -> SparkDF:
    """CORRECTNESS-GATEABLE verification of the one-pass approximate
    quantile path: computes ``percentile_approx`` (Greenwald-Khanna,
    rank error ``eps = 1/accuracy``) and then CHECKS each returned
    boundary against its exact rank interval, emitting one row per
    (group, probability) with a within-bound boolean.

    The GK guarantee is about RANKS, not values (value distance is
    data-dependent), so the check is the guarantee itself: the
    returned element ``v`` for probability ``p`` over ``n`` rows has
    some rank in ``[count(x < v) + 1, count(x <= v)]`` within
    ``eps*n`` of ``p*n`` — i.e. the interval ``[r_lt, r_le]`` must
    overlap ``[p*n - eps*n, p*n + eps*n]``. ``ok`` is that overlap
    test (with +1 slack for the discrete rank grid).

    Output: ``(*by, quantile, n, ok)`` — ``quantile`` is the integer
    ``p * 100``. The tolerance is ENCODED IN THE QUERY, so a DuckDB
    oracle can assert the expected table (group counts x quantiles,
    ok = true) and a value-hash compare proves the 100 TB approx path
    honors its bound, not just that the exact anchor exists.

    Cost: the sketch pass plus ONE exact rank-counting pass over the
    same scan (the boundaries rejoin as a broadcast — they are
    ``groups x len(probabilities)`` rows). That second pass is the
    price of *verifying*; production profiling uses
    :func:`approx_quantiles` alone."""
    by = list(by or [])
    c = F.col(col).cast("double")
    base = df.where(c.isNotNull()).select(*by, c.alias("__x"))
    qs = base.groupBy(*by).agg(
        F.percentile_approx(
            "__x", F.array(*[F.lit(p) for p in probabilities]),
            F.lit(accuracy)).alias("__qs"))
    bounds = qs.select(*by, F.posexplode("__qs").alias("__i", "__v"))
    joined = (base.join(F.broadcast(bounds), by) if by
              else base.crossJoin(F.broadcast(bounds)))
    counted = (joined.groupBy(*by, "__i")
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.sum((F.col("__x") <= F.col("__v"))
                                .cast("long")).alias("__r_le"),
                          F.sum((F.col("__x") < F.col("__v"))
                                .cast("long")).alias("__r_lt")))
    plit = F.array(*[F.lit(float(p)) for p in probabilities])
    p = F.element_at(plit, F.col("__i") + 1)
    target = p * F.col("n")
    slack = F.col("n") / accuracy + 1
    ok = ((F.col("__r_le") >= target - slack)
          & (F.col("__r_lt") <= target + slack))
    return counted.select(
        *by,
        (p * 100).cast("int").alias("quantile"),
        "n", ok.alias("ok"))


def approx_distinct_check(df: SparkDF, col: str, rsd: float = 0.02,
                          by: list[str] | None = None) -> SparkDF:
    """CORRECTNESS-GATEABLE verification of the HLL++ distinct-count
    path (the third leg after the quantile and histogram gates): one
    aggregation computes BOTH ``approx_count_distinct(col, rsd)`` and
    the exact ``count_distinct`` per group, and emits ``ok`` =
    |estimate - exact| <= max(5 * rsd * exact, 4) — five standard
    errors of the HLL++ guarantee plus an absolute floor for tiny
    groups (where the sketch counts exactly anyway). Output:
    ``(*by, n_distinct, ok)`` — the exact count is real checkable
    content for the oracle; the encoded tolerance makes the sketch's
    bound itself hash-checkable, same doctrine as
    :func:`approx_quantiles_check`.

    The verification pays the exact count's full shuffle — production
    profiling uses :func:`approx_distinct` alone (one pass, tiny
    state, no key-space shuffle)."""
    est = F.approx_count_distinct(col, rsd=rsd)
    exact = F.count_distinct(F.col(col))
    out = df.groupBy(*(by or [])).agg(est.alias("__est"),
                                      exact.alias("n_distinct"))
    ok = (F.abs(F.col("__est") - F.col("n_distinct"))
          <= F.greatest(F.lit(5.0 * rsd) * F.col("n_distinct"),
                        F.lit(4.0)))
    return out.select(*(by or []), "n_distinct", ok.alias("ok"))


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
