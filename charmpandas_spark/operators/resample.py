"""Regular-interval resampling with GAP FILLING.

Downsampling an event stream to fixed buckets is one groupBy — the
part warehouses get wrong is the EMPTY buckets: a monitoring chart or
a seasonal model needs the zero rows, and a plain aggregate simply
has no row to emit for an hour with no events. This operator joins
the aggregate against a generated dense bucket scaffold
(distinct groups x full bucket range) so every (group, bucket) cell
exists, zero-filled.

Scale: the aggregate is one shuffle on (group, bucket) with map-side
partial aggregation. The scaffold is metadata-sized — bucket bounds
ride the plan as a broadcast 1-row aggregate (no eager action), the
distinct-groups dim is a shuffle of group keys only, and the
``sequence``-explode generates bounds-many rows per group, never
touching the fact table. The final left join keys on
(group, bucket) — same partitioning as the aggregate. Value sums go
through DECIMAL(18,6) so the zero-filled totals are exact and
cross-engine stable (the tpch_q1 convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, functions as F

from ..timestamps import epoch_micros

__all__ = ["resample_events"]


def resample_events(
    df: SparkDF,
    ts_col: str,
    group_cols: list[str],
    interval_us: int,
    value_col: str | None = None,
) -> SparkDF:
    """(group..., bucket, n_events[, total]) for EVERY bucket in the
    corpus's [min, max] bucket range per group — empty buckets
    zero-filled. ``bucket`` is ``floor(epoch_micros / interval_us)``;
    multiply back for the wall-clock bucket start."""
    b = F.floor(epoch_micros(ts_col) / F.lit(interval_us)) \
         .cast("long").alias("bucket")
    base = df.select(*group_cols, b,
                     *([F.col(value_col)] if value_col else []))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        from ..functions.exact import exact_sum
        aggs.append(
            (F.floor(exact_sum(value_col) * 100) / 100).alias("total"))
    agg = base.groupBy(*group_cols, "bucket").agg(*aggs)

    bounds = base.agg(F.min("bucket").alias("__lo"),
                      F.max("bucket").alias("__hi"))
    dims = base.select(*group_cols).distinct()
    scaffold = (dims.crossJoin(F.broadcast(bounds))
                    .select(*group_cols,
                            F.explode(F.sequence(F.col("__lo"),
                                                 F.col("__hi")))
                             .alias("bucket")))
    out = scaffold.join(agg, [*group_cols, "bucket"], "left") \
                  .withColumn("n_events",
                              F.coalesce(F.col("n_events"), F.lit(0))
                               .cast("long"))
    if value_col:
        out = out.withColumn(
            "total", F.coalesce(F.col("total"), F.lit(0.0)))
    return out


def resample_events_sql(t: str, ts_expr: str, group_expr: str,
                        interval_us: int,
                        value_expr: str | None = None) -> str:
    """DuckDB twin of :func:`resample_events` (single group column)."""
    val_src = f", {value_expr} AS __v" if value_expr else ""
    val_agg = (", FLOOR(CAST(SUM(CAST(__v AS DECIMAL(18,6)))"
               " AS DOUBLE) * 100) / 100 AS total"
               if value_expr else "")
    val_sel = (", coalesce(a.total, 0.0) AS total" if value_expr else "")
    return f"""
        WITH e AS (
            SELECT {group_expr} AS grp,
                   CAST(FLOOR(epoch_us({ts_expr}) * 1.0
                              / {interval_us}) AS BIGINT) AS bucket
                   {val_src}
            FROM {t}),
        b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM e),
        dims AS (SELECT DISTINCT grp FROM e),
        scaffold AS (
            SELECT grp, UNNEST(range(lo, hi + 1)) AS bucket
            FROM dims CROSS JOIN b),
        a AS (
            SELECT grp, bucket, CAST(count(*) AS BIGINT) AS n_events
                   {val_agg}
            FROM e GROUP BY grp, bucket)
        SELECT s.grp AS {group_expr},
               CAST(s.bucket AS BIGINT) AS bucket,
               CAST(coalesce(a.n_events, 0) AS BIGINT) AS n_events
               {val_sel}
        FROM scaffold s
        LEFT JOIN a ON a.grp = s.grp AND a.bucket = s.bucket
    """
