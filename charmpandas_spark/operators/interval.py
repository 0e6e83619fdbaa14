"""Interval (range-containment) join — an operator Spark lacks.

``left.ts BETWEEN right.start AND right.end`` joins naively plan as
BroadcastNestedLoopJoin (every left row tested against every right
interval — O(n*m), a scale-killer). The scale path is the classic
bin-and-refine composition:

1. bin time into fixed-width buckets (``granularity``),
2. each left row lands in ONE bucket; each right interval EXPLODES
   into the buckets it covers,
3. equi-join on (keys..., bucket) — hash-partitionable, AQE-skew-
   splittable like any other join,
4. refine with the exact containment predicate.

No duplicates by construction: a left row has exactly one bucket, so
it meets each interval at most once. Cost is ``len(interval) /
granularity`` replicas per interval — pick granularity near the
median interval length (~2 bins per interval).

The same shape (with both sides exploded over overlapping buckets +
dedup) extends to interval-overlap joins; containment is the common
pipeline case (event-to-session/episode attribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, functions as F

from ..timestamps import epoch_micros

__all__ = ["interval_join"]

_BIN = "__cps_bin"


def interval_join(
    left: SparkDF,
    right: SparkDF,
    ts_col: str,
    start_col: str,
    end_col: str,
    on: str | list[str] | None = None,
    granularity_sec: int = 86_400,
) -> SparkDF:
    """Rows of ``left`` joined to every ``right`` interval containing
    their timestamp (inclusive bounds), equi-keyed on ``on``.

    ``on`` columns must share names on both sides (rename upstream
    otherwise). Output columns: left columns + right columns (minus
    the join keys' duplicates).
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    g_us = granularity_sec * 1_000_000
    lb = left.withColumn(
        _BIN, F.floor(epoch_micros(ts_col) / F.lit(g_us)))
    rb = right.withColumn(
        _BIN,
        F.explode(F.sequence(
            F.floor(epoch_micros(start_col) / F.lit(g_us)),
            F.floor(epoch_micros(end_col) / F.lit(g_us)))))
    out = (lb.join(rb, keys + [_BIN])
             .filter((F.col(ts_col) >= F.col(start_col))
                     & (F.col(ts_col) <= F.col(end_col)))
             .drop(_BIN))
    return out
