"""Group-wise closed-form linear regression (ordinary least squares)
— the "fit a trend per key" analytics primitive (per-metric drift,
per-source quality trajectories, per-user spend slopes).

EXACT by construction: callers pass INTEGER x and y columns (epoch
seconds, micro-units, cents — anything pre-scaled), the five
sufficient statistics (n, Σx, Σy, Σxy, Σx²) are summed as
DECIMAL(38,0) — exact integer arithmetic in Spark, HUGEINT in DuckDB —
and only the final slope/intercept ratios drop to a fixed-order IEEE
double expression, floored to micro-units. Summation order therefore
cannot change a single output bit, which makes a REGRESSION
cross-engine hash-checkable (the usual float Σxy makes it
partitioning-dependent).

One scan, one partial-aggregated groupBy — a regression per group
costs exactly what a sum per group costs, at any scale. Callers keep
x small by centering on an in-plan constant (e.g. the global min
epoch riding as a broadcast 1-row aggregate): DECIMAL keeps the SUMS
exact regardless, but x² terms must individually fit int64 before the
decimal cast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

__all__ = ["linear_fit", "linear_fit_sql",
           "correlation", "correlation_sql",
           "ab_welch", "ab_welch_sql"]

MICRO = 1_000_000


def linear_fit(df: SparkDF, x_col: str | Column, y_col: str | Column,
               group_cols: list[str]) -> SparkDF:
    """Per-group OLS fit ``y ~ slope * x + intercept``: returns
    ``(group_cols..., n, slope_micro, intercept_micro)`` with
    slope/intercept floored to 1e-6 (y-units per x-unit / y-units).
    Groups with a degenerate design (all x equal, or n < 2) yield
    NULL slope/intercept instead of a division error."""
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    d38 = "decimal(38,0)"
    agg = (df.groupBy(*group_cols)
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(x.cast(d38)).alias("sx"),
                  F.sum(y.cast(d38)).alias("sy"),
                  F.sum((x * y).cast(d38)).alias("sxy"),
                  F.sum((x * x).cast(d38)).alias("sxx")))
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    den = n * sxx - sx * sx
    slope = F.when(den == 0.0, F.lit(None)).otherwise(
        F.floor(F.lit(MICRO) * (n * sxy - sx * sy) / den))
    intercept = F.when(den == 0.0, F.lit(None)).otherwise(
        F.floor(F.lit(MICRO) * (sy * sxx - sx * sxy) / den))
    return agg.select(*group_cols, "n",
                      slope.alias("slope_micro"),
                      intercept.alias("intercept_micro"))


def linear_fit_sql(t: str, x_expr: str, y_expr: str,
                   group_exprs: list[str]) -> str:
    """DuckDB twin: BIGINT sums promote to HUGEINT (exact), then the
    identical double-op order for the closed form."""
    gsel = ", ".join(group_exprs)
    return f"""
        WITH s AS (
            SELECT {gsel}, CAST(count(*) AS BIGINT) AS n,
                   sum(CAST({x_expr} AS BIGINT)) AS sx,
                   sum(CAST({y_expr} AS BIGINT)) AS sy,
                   sum(CAST({x_expr} AS BIGINT)
                       * CAST({y_expr} AS BIGINT)) AS sxy,
                   sum(CAST({x_expr} AS BIGINT)
                       * CAST({x_expr} AS BIGINT)) AS sxx
            FROM {t} GROUP BY {gsel})
        SELECT {gsel}, n,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                    THEN NULL
                    ELSE CAST(FLOOR(1000000
                         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                         AS BIGINT) END AS slope_micro,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                    THEN NULL
                    ELSE CAST(FLOOR(1000000
                         * (CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                         AS BIGINT) END AS intercept_micro
        FROM s
    """


def correlation(df: SparkDF, x_col: str | Column, y_col: str | Column,
                group_cols: list[str]) -> SparkDF:
    """Per-group Pearson correlation under the same exactness contract
    as :func:`linear_fit`: integer inputs, DECIMAL(38,0) sufficient
    statistics, one fixed-order double expression at the end —
    ``corr_micro = floor(1e6 * (n Σxy - Σx Σy) / (sqrt(n Σx² - (Σx)²)
    * sqrt(n Σy² - (Σy)²)))``. Degenerate groups (either variance
    zero) yield NULL. One partial-aggregated groupBy; a correlation
    matrix over k columns is k(k-1)/2 of these over ONE such agg."""
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    d38 = "decimal(38,0)"
    agg = (df.groupBy(*group_cols)
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(x.cast(d38)).alias("sx"),
                  F.sum(y.cast(d38)).alias("sy"),
                  F.sum((x * y).cast(d38)).alias("sxy"),
                  F.sum((x * x).cast(d38)).alias("sxx"),
                  F.sum((y * y).cast(d38)).alias("syy")))
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when((vx <= 0.0) | (vy <= 0.0), F.lit(None)).otherwise(
        F.floor(F.lit(MICRO) * (n * sxy - sx * sy)
                / (F.sqrt(vx) * F.sqrt(vy))))
    return agg.select(*group_cols, "n", corr.alias("corr_micro"))


def correlation_sql(t: str, x_expr: str, y_expr: str,
                    group_exprs: list[str]) -> str:
    """DuckDB twin of :func:`correlation` (HUGEINT sums, identical
    final double-op order — sqrt is correctly rounded in both
    engines, so the floor agrees)."""
    gsel = ", ".join(group_exprs)
    nd = "CAST(n AS DOUBLE)"
    sxd, syd = "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)"
    sxyd = "CAST(sxy AS DOUBLE)"
    sxxd, syyd = "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)"
    vx = f"({nd} * {sxxd} - {sxd} * {sxd})"
    vy = f"({nd} * {syyd} - {syd} * {syd})"
    return f"""
        WITH s AS (
            SELECT {gsel}, CAST(count(*) AS BIGINT) AS n,
                   sum(CAST({x_expr} AS BIGINT)) AS sx,
                   sum(CAST({y_expr} AS BIGINT)) AS sy,
                   sum(CAST({x_expr} AS BIGINT)
                       * CAST({y_expr} AS BIGINT)) AS sxy,
                   sum(CAST({x_expr} AS BIGINT)
                       * CAST({x_expr} AS BIGINT)) AS sxx,
                   sum(CAST({y_expr} AS BIGINT)
                       * CAST({y_expr} AS BIGINT)) AS syy
            FROM {t} GROUP BY {gsel})
        SELECT {gsel}, n,
               CASE WHEN {vx} <= 0 OR {vy} <= 0 THEN NULL
                    ELSE CAST(FLOOR(1000000
                         * ({nd} * {sxyd} - {sxd} * {syd})
                         / (sqrt({vx}) * sqrt({vy}))) AS BIGINT)
               END AS corr_micro
        FROM s
    """


def ab_welch(df: SparkDF, variant_col: str | Column,
             value_col: str | Column, group_cols: list[str],
             variant_a="A", variant_b="B") -> SparkDF:
    """Per-group A/B readout with Welch's t statistic — the
    experiment-analysis primitive, under the family's exactness
    contract: integer values, DECIMAL(38,0) per-variant sufficient
    statistics in ONE aggregate (conditional sums — no second pass,
    no join between variants), then one fixed-order double expression
    ``t_micro = floor(1e6 * (mean_a - mean_b) / sqrt(var_a/n_a +
    var_b/n_b))`` (sample variances, n-1 denominator). NULL when
    either arm has n < 2 or both variances are zero. Returns
    ``(group..., n_a, n_b, mean_a_micro, mean_b_micro, t_micro)``."""
    v = F.col(variant_col) if isinstance(variant_col, str) \
        else variant_col
    x = F.col(value_col) if isinstance(value_col, str) else value_col
    d38 = "decimal(38,0)"
    ia = (v == variant_a).cast("bigint")
    ib = (v == variant_b).cast("bigint")
    agg = (df.groupBy(*group_cols)
             .agg(F.sum(ia).alias("n_a"), F.sum(ib).alias("n_b"),
                  F.sum((x * ia).cast(d38)).alias("sa"),
                  F.sum((x * ib).cast(d38)).alias("sb"),
                  F.sum((x * x * ia).cast(d38)).alias("qa"),
                  F.sum((x * x * ib).cast(d38)).alias("qb")))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    qa, qb = F.col("qa").cast("double"), F.col("qb").cast("double")
    va = (qa - sa * sa / na) / (na - 1)
    vb = (qb - sb * sb / nb) / (nb - 1)
    se2 = va / na + vb / nb
    t = F.when((F.col("n_a") < 2) | (F.col("n_b") < 2)
               | (se2 <= 0.0), F.lit(None)).otherwise(
        F.floor(F.lit(MICRO) * (sa / na - sb / nb) / F.sqrt(se2)))
    return agg.select(
        *group_cols, "n_a", "n_b",
        F.floor(F.lit(MICRO) * sa / na).alias("mean_a_micro"),
        F.floor(F.lit(MICRO) * sb / nb).alias("mean_b_micro"),
        t.alias("t_micro"))


def ab_welch_sql(t: str, variant_expr: str, value_expr: str,
                 group_exprs: list[str],
                 variant_a: str = "A", variant_b: str = "B") -> str:
    """DuckDB twin of :func:`ab_welch` (identical double-op order)."""
    gsel = ", ".join(group_exprs)
    ia = f"CASE WHEN {variant_expr} = '{variant_a}' THEN 1 ELSE 0 END"
    ib = f"CASE WHEN {variant_expr} = '{variant_b}' THEN 1 ELSE 0 END"
    x = f"CAST({value_expr} AS BIGINT)"
    na, nb = "CAST(n_a AS DOUBLE)", "CAST(n_b AS DOUBLE)"
    sa, sb = "CAST(sa AS DOUBLE)", "CAST(sb AS DOUBLE)"
    qa, qb = "CAST(qa AS DOUBLE)", "CAST(qb AS DOUBLE)"
    va = f"(({qa} - {sa} * {sa} / {na}) / ({na} - 1))"
    vb = f"(({qb} - {sb} * {sb} / {nb}) / ({nb} - 1))"
    se2 = f"({va} / {na} + {vb} / {nb})"
    return f"""
        WITH s AS (
            SELECT {gsel},
                   CAST(sum({ia}) AS BIGINT) AS n_a,
                   CAST(sum({ib}) AS BIGINT) AS n_b,
                   sum({x} * {ia}) AS sa, sum({x} * {ib}) AS sb,
                   sum({x} * {x} * {ia}) AS qa,
                   sum({x} * {x} * {ib}) AS qb
            FROM {t} GROUP BY {gsel})
        SELECT {gsel}, n_a, n_b,
               CAST(FLOOR(1000000 * {sa} / {na}) AS BIGINT)
                   AS mean_a_micro,
               CAST(FLOOR(1000000 * {sb} / {nb}) AS BIGINT)
                   AS mean_b_micro,
               CASE WHEN n_a < 2 OR n_b < 2 OR {se2} <= 0 THEN NULL
                    ELSE CAST(FLOOR(1000000 * ({sa} / {na} - {sb} / {nb})
                              / sqrt({se2})) AS BIGINT) END AS t_micro
        FROM s
    """
