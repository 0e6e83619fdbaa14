"""Cohort retention analysis over an event stream.

The classic product-analytics matrix: bucket users into cohorts by the
period of their FIRST event, then for every (cohort, period-offset)
cell count how many of the cohort's users were active — "of the users
who signed up in week 3, how many came back in week 5?". The reference
engine has no such composite, but it is table stakes for any event
warehouse; we express it as three aggregations that all hash-partition
on the same keys.

Plan shape / 100 TB story:
- ``per_user`` (min period per user) and ``active`` (distinct
  (user, period)) both shuffle ON ``user_col`` — the join between
  them reuses that partitioning, so the whole pipeline is ONE
  exchange of the events projection plus two small post-join
  aggregations over (cohort, offset) cells (bounded by periods²/2
  rows, not by data size). Map-side partial aggregation collapses
  each scan partition to its distinct (user, period) pairs before
  anything moves.
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
    period = F.expr(f"unix_micros({ts_col}) div {period_us}")
    up = events.select(F.col(user_col).alias("u"),
                       period.alias("p"))
    per_user = up.groupBy("u").agg(F.min("p").alias("cohort"))
    active = up.distinct()
    # same join key as both upstream shuffles -> co-partitioned join
    cells = (active.join(per_user, "u")
                   .groupBy("cohort",
                            (F.col("p") - F.col("cohort")).alias("week_offset"))
                   .agg(F.count(F.lit(1)).alias("n_active")))
    sizes = per_user.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    out = cells.join(F.broadcast(sizes), "cohort")
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
