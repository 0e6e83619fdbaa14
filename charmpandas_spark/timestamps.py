"""Timestamp-type portability (TIMESTAMP vs TIMESTAMP_NTZ).

PySpark 4.x infers parquet ``timestamp[us]`` columns written without
a timezone (``isAdjustedToUTC=false`` — what pandas/pyarrow emit by
default, including the driver testdata) as ``TIMESTAMP_NTZ``.  Spark
3.x read the same files as ``TIMESTAMP``.  Two operator families hard-
require the LTZ type and throw ``AnalysisException`` on NTZ input:

- ``withWatermark`` (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — every
  streaming operator;
- ``unix_micros`` (DATATYPE_MISMATCH) — the chunked RANGE window and
  the interval join's integral time arithmetic.

The engine pins ``spark.sql.session.timeZone=UTC`` (session.py), so
casting NTZ -> TIMESTAMP reinterprets the wall-clock fields as UTC —
the underlying micros are unchanged and the cast is lossless and
oracle-neutral (DuckDB reads the same files as tz-less and compares
by value).  Policy: normalize at ingest (batch reader + stream
reader) AND defensively at every watermark/epoch call site, so the
operators also accept user-supplied frames from any source.

The reference engine never hits this class at all (its Arrow kernels
are tz-agnostic, reference src/types.hpp:11-15); it is a portability
class this Spark engine must own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, functions as F
from pyspark.sql.types import TimestampNTZType

__all__ = ["ntz_to_ltz", "ensure_event_time", "epoch_micros"]


def ntz_to_ltz(sdf: SparkDF) -> SparkDF:
    """Cast every top-level TIMESTAMP_NTZ column to TIMESTAMP.

    Lossless under a UTC session timezone (see module docstring).
    No-op (returns ``sdf`` unchanged, no plan node added) when the
    schema has no NTZ columns.  Works on batch and streaming frames;
    on streams the cast lands before any watermark, which is the
    supported shape.  Nested struct/array timestamps are left alone —
    nothing in the engine feeds nested timestamps to watermarks.
    """
    ntz = [f.name for f in sdf.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    if not ntz:
        return sdf
    return sdf.withColumns(
        {c: F.col(c).cast("timestamp") for c in ntz})


def ensure_event_time(sdf: SparkDF, ts_col: str) -> SparkDF:
    """Guarantee ``ts_col`` is TIMESTAMP (LTZ) so ``withWatermark``
    accepts it; no-op when it already is."""
    for f in sdf.schema.fields:
        if f.name == ts_col and isinstance(f.dataType, TimestampNTZType):
            return sdf.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return sdf


def epoch_micros(col: str | Column) -> Column:
    """``unix_micros`` that tolerates TIMESTAMP_NTZ input.

    ``cast("timestamp")`` is the identity on LTZ columns and the
    lossless UTC reinterpretation on NTZ ones, so this is safe to use
    unconditionally wherever integral event time is needed.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
