"""AS-OF join — a temporal operator Spark lacks natively.

For every left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key (the classic time-series
enrichment join; DuckDB/kdb call it ASOF JOIN, pandas merge_asof).

Spark-first implementation — NO join at all: tag both sides, union,
and run one ``last(value, ignorenulls=True)`` window over
(key, ts)-sorted rows, then keep the left rows. One shuffle on the
key, linear scan within partitions; at 100 TB this beats any
join-based formulation (a range join would be O(n*m) per key, and a
window self-join shuffles twice).

Ties (equal ts) resolve to the right row matching AT the timestamp
(``<=`` semantics), by ordering right-tagged rows first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    left: SparkDF,
    right: SparkDF,
    ts_col: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> SparkDF:
    """Enrich ``left`` with the latest-at-or-before values of
    ``value_cols`` from ``right``, matched per ``by`` key.

    Output: all left columns + one ``{col}{suffix}`` per value column
    (null when no right row precedes the left row's timestamp).
    """
    by = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in by and c != ts_col]

    lcols = left.columns
    tagged_left = left.select(
        *by, F.col(ts_col).alias("__cps_ts"), F.lit(1).alias("__cps_side"),
        F.struct(*lcols).alias("__cps_row"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__cps_v_{c}")
          for c in value_cols])
    tagged_right = right.select(
        *by, F.col(ts_col).alias("__cps_ts"), F.lit(0).alias("__cps_side"),
        F.lit(None).cast(tagged_left.schema["__cps_row"].dataType)
        .alias("__cps_row"),
        *[F.col(c).alias(f"__cps_v_{c}") for c in value_cols])

    unioned = tagged_left.unionByName(tagged_right)
    # right rows (side=0) sort before left rows at equal ts -> "<=".
    w = (Window.partitionBy(*by)
         .orderBy(F.col("__cps_ts").asc(), F.col("__cps_side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        "__cps_side", "__cps_row",
        *[F.last(f"__cps_v_{c}", ignorenulls=True).over(w)
          .alias(f"__cps_f_{c}") for c in value_cols])
    out = (filled.filter(F.col("__cps_side") == 1)
           .select(*[F.col(f"__cps_row.{c}").alias(c) for c in lcols],
                   *[F.col(f"__cps_f_{c}").alias(f"{c}{suffix}")
                     for c in value_cols]))
    return out
