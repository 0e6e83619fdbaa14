"""Ordered conversion-funnel analysis over event streams.

"Of the users who did A, how many then did B within a window, and
then C?" — the staple product-analytics query. Each stage anchors on
the PREVIOUS stage's first completion time (chained windows), which
is what plain per-type counts get wrong: a click before the first
view must not count.

Scale design: one conditional aggregate per stage (min event time
among events inside the chained window) connected by shuffle joins on
the user key — stage k is an inner join against stage k-1's
completions, so the joined side SHRINKS monotonically down the
funnel. All time arithmetic is integer epoch micros
(``timestamps.epoch_micros``), no interval/timezone semantics in the
hot path. Parallelism follows user-key cardinality at every step;
nothing is collected, nothing is windowed globally.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame as SparkDF, functions as F

from ..timestamps import epoch_micros

__all__ = ["funnel_times", "funnel_counts", "funnel_counts_sql"]


def funnel_times(
    df: SparkDF,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_us: int | None = None,
) -> SparkDF:
    """Per-user chained stage-completion times: ``t0`` is the user's
    first ``stages[0]`` event; ``t{k}`` the first ``stages[k]`` event
    at/after ``t{k-1}`` (and within ``within_us`` micros of it, if
    set). Columns ``t1..`` are NULL once a stage is missed. Epoch
    micros throughout."""
    if len(stages) < 2:
        raise ValueError("a funnel needs >= 2 stages")
    base = df.select(F.col(user_col).alias("user"),
                     F.col(type_col).alias("__et"),
                     epoch_micros(ts_col).alias("__t"))
    cur = (base.where(F.col("__et") == stages[0])
               .groupBy("user")
               .agg(F.min("__t").alias("t0")))
    for i, stage in enumerate(stages[1:], 1):
        prev = f"t{i - 1}"
        ev = base.where(F.col("__et") == stage) \
                 .select("user", F.col("__t").alias("__cand"))
        cond = (F.col("__cand") >= F.col(prev))
        if within_us is not None:
            cond = cond & (F.col("__cand") <= F.col(prev) + within_us)
        step = (ev.join(cur.select("user", prev), "user")
                  .where(cond)
                  .groupBy("user")
                  .agg(F.min("__cand").alias(f"t{i}")))
        cur = cur.join(step, "user", "left")
    return cur


def funnel_counts(
    df: SparkDF,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_us: int | None = None,
) -> SparkDF:
    """One row of per-stage user counts + overall conversion fraction
    (floor-scaled to 1e-6 — count/count is one exact IEEE division)."""
    times = funnel_times(df, stages, user_col, type_col, ts_col,
                         within_us)
    aggs = [F.count(f"t{i}").alias(f"n_{s}")
            for i, s in enumerate(stages)]
    out = times.agg(*aggs)
    first, last = f"n_{stages[0]}", f"n_{stages[-1]}"
    return out.withColumn(
        "conversion",
        F.floor(F.lit(1_000_000) * F.col(last) / F.col(first))
        / 1_000_000)


def funnel_counts_sql(t: str, stages: Sequence[str],
                      user_expr: str = "user_id",
                      type_expr: str = "event_type",
                      ts_expr: str = "ts",
                      within_us: int | None = None) -> str:
    """DuckDB twin of :func:`funnel_counts`."""
    win = (f" AND e.__t <= s{{prev}}.t{{prev}} + {within_us}"
           if within_us is not None else "")
    ctes = [f"""e AS (
        SELECT {user_expr} AS u, {type_expr} AS et,
               epoch_us({ts_expr}) AS __t
        FROM {t})""",
            f"""s0 AS (
        SELECT u, min(__t) AS t0 FROM e WHERE et = '{stages[0]}'
        GROUP BY u)"""]
    for i, stage in enumerate(stages[1:], 1):
        p = i - 1
        w = win.format(prev=p)
        ctes.append(f"""s{i} AS (
        SELECT e.u, min(e.__t) AS t{i}
        FROM e JOIN s{p} ON e.u = s{p}.u
         AND e.__t >= s{p}.t{p}{w}
        WHERE e.et = '{stage}'
        GROUP BY e.u)""")
    counts = ", ".join(
        f"(SELECT CAST(count(*) AS BIGINT) FROM s{i}) AS n_{s}"
        for i, s in enumerate(stages))
    return f"""
        WITH {", ".join(ctes)}
        SELECT *, FLOOR(1000000 * CAST(n_{stages[-1]} AS DOUBLE)
                        / n_{stages[0]}) / 1000000 AS conversion
        FROM (SELECT {counts})
    """
