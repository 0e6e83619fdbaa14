"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming or state at all (SURVEY §2.7). These
are the north-star "custom stateful operator" pattern: per-key state
held in Spark's state store (RocksDB-capable, checkpointed,
watermark-expired), with the user logic as an Arrow-batched pandas
function. The same business logic is exposed as a batch twin for
verification — streaming-vs-batch equivalence is the test contract.

Scale notes: state is partitioned by the grouping key across
executors; each micro-batch only touches keys present in the batch;
watermark + timeout stop unbounded state growth.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame as SparkDF, functions as F

from ..timestamps import ensure_event_time

__all__ = [
    "running_totals_stream",
    "running_totals_batch",
    "threshold_alerts_stream",
]

_RUNNING_OUT_SCHEMA = ("user_id bigint, n_events bigint, "
                       "total_value double, max_value double")
_RUNNING_STATE_SCHEMA = "n bigint, total double, mx double"


def _running_totals_fn(key, pdf_iter: Iterator[pd.DataFrame], state):
    """Accumulate (count, sum, max) per key across micro-batches."""
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [total],
        "max_value": [mx],
    })


def running_totals_stream(
    stream_df: SparkDF,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> SparkDF:
    """Per-user running (count, sum, max) over an event stream —
    state-store-backed, emitted each micro-batch ('update' mode)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream_df = ensure_event_time(stream_df, ts_col)
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(F.col(user_col))
            .applyInPandasWithState(
                _running_totals_fn,
                outputStructType=_RUNNING_OUT_SCHEMA,
                stateStructType=_RUNNING_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def running_totals_batch(df: SparkDF, user_col: str = "user_id") -> SparkDF:
    """Batch twin of :func:`running_totals_stream` (same output
    schema) — the verification oracle for the streaming path."""
    return (df.groupBy(user_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").cast("double").alias("total_value"),
                 F.max("value").cast("double").alias("max_value")))


_ALERT_OUT_SCHEMA = ("user_id bigint, ts timestamp, cum_dev double")
_ALERT_STATE_SCHEMA = "cum double"


def threshold_alerts_stream(
    stream_df: SparkDF,
    threshold: float,
    target: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 day",
) -> SparkDF:
    """CUSUM-style alerting: per-key cumulative deviation from
    ``target``; emits a row whenever the running deviation crosses
    ``threshold`` (then resets) — a genuinely custom stateful operator
    no built-in window expresses."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state):
        cum = state.get[0] if state.exists else 0.0
        alerts_ts, alerts_dev = [], []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                cum = max(0.0, cum + (float(v) - target))
                if cum >= threshold:
                    alerts_ts.append(ts)
                    alerts_dev.append(cum)
                    cum = 0.0
        state.update((cum,))
        yield pd.DataFrame({
            "user_id": [key[0]] * len(alerts_ts),
            "ts": alerts_ts,
            "cum_dev": alerts_dev,
        })

    stream_df = ensure_event_time(stream_df, ts_col)
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(F.col(user_col))
            .applyInPandasWithState(
                fn,
                outputStructType=_ALERT_OUT_SCHEMA,
                stateStructType=_ALERT_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
