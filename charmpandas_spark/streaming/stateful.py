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
    "running_totals_stream_tws",
    "running_totals_batch",
    "threshold_alerts_stream",
    "sessionize_stream",
    "sessionize_batch",
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


def running_totals_stream_tws(
    stream_df: SparkDF,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> SparkDF:
    """``transformWithStateInPandas`` twin of
    :func:`running_totals_stream` — the Spark 4 stateful API that
    supersedes ``applyInPandasWithState`` at cluster scale: typed
    per-key state VARIABLES (value/list/map) instead of one opaque
    tuple, state TTL, processing/event-time timers, initial-state
    bootstrap, and a RocksDB-only store with changelog checkpointing.
    Same output schema and same per-key arithmetic, so the batch twin
    :func:`running_totals_batch` is the oracle for both.

    Requires the RocksDB state-store provider (wrap the stream start
    in ``streaming.state.use_rocksdb_state``) — the HDFS-backed
    default store does not implement the TWS operator — and the
    ``protobuf`` package (PySpark's TWS state-server protocol;
    ``pyspark[connect]`` ships it). The equivalence test skips with a
    precise reason where protobuf is absent."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor)
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    class _RunningTotals(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState(
                "agg",
                StructType([StructField("n", LongType()),
                            StructField("total", DoubleType()),
                            StructField("mx", DoubleType())]))

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, mx = self._state.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, total, mx))
            yield pd.DataFrame({
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            })

        def close(self):
            pass

    stream_df = ensure_event_time(stream_df, ts_col)
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(F.col(user_col))
            .transformWithStateInPandas(
                _RunningTotals(),
                outputStructType=_RUNNING_OUT_SCHEMA,
                outputMode="update",
                timeMode="none"))


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


_SESSION_OUT_SCHEMA = ("user_id bigint, start_ms bigint, end_ms bigint, "
                       "n_events bigint")
_SESSION_STATE_SCHEMA = "start_ms bigint, last_ms bigint, n bigint"


def sessionize_stream(
    stream_df: SparkDF,
    gap_ms: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    ts_ms_col: str = "ts_ms",
    watermark: str = "10 minutes",
) -> SparkDF:
    """Stateful streaming SESSIONIZATION emitting CLOSED sessions
    (append mode): per-user state (session start, last event, count)
    lives in the state store; a session closes when a later event
    arrives past the gap, or when the event-time watermark passes
    ``last + gap`` (EventTimeTimeout) — so sessions of users who
    simply stop emitting still flush, which 'update'-mode running
    aggregates can't express.

    Timezone-proof by construction: the caller supplies ``ts_ms_col``
    (true epoch millis, ``timestamps.epoch_micros``-derived JVM-side);
    all Python-side arithmetic and the timeout registration use epoch
    millis only — the naive-pandas-timestamp/session-timezone trap
    (the r5 NTZ breakage class) can't reach this operator. Output
    session bounds are epoch millis; convert with
    ``F.timestamp_millis`` downstream.

    Ordering contract: events must arrive in rough global time order
    across micro-batches (the watermark contract every stream source
    provides; bounded intra-batch disorder is fine — each batch is
    sorted before the walk). An event arriving later than the
    watermark allows may extend or merge a session the batch oracle
    would have split; the batch twin is the gold standard.

    Scale: state partitions by user across executors; each
    micro-batch touches only keys present in the batch plus expiring
    timers; watermark bounds state lifetime to ``gap + delay``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state):
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [key[0]],
                                "start_ms": [start_ms],
                                "end_ms": [last_ms],
                                "n_events": [n]})
            return
        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms = last_ms = None
            n = 0
        closed_start, closed_end, closed_n = [], [], []
        for pdf in pdf_iter:
            for tm in sorted(int(v) for v in pdf[ts_ms_col]):
                if start_ms is None:
                    start_ms, last_ms, n = tm, tm, 1
                elif tm - last_ms > gap_ms:
                    closed_start.append(start_ms)
                    closed_end.append(last_ms)
                    closed_n.append(n)
                    start_ms, last_ms, n = tm, tm, 1
                else:
                    last_ms = tm
                    n += 1
        state.update((start_ms, last_ms, n))
        # the timer must be strictly beyond the current watermark or
        # Spark rejects it; a session already expired relative to the
        # watermark then fires on the next batch
        state.setTimeoutTimestamp(max(last_ms + gap_ms,
                                      state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame({"user_id": [key[0]] * len(closed_n),
                            "start_ms": closed_start,
                            "end_ms": closed_end,
                            "n_events": closed_n})

    stream_df = ensure_event_time(stream_df, ts_col)
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(F.col(user_col))
            .applyInPandasWithState(
                fn,
                outputStructType=_SESSION_OUT_SCHEMA,
                stateStructType=_SESSION_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def sessionize_batch(df: SparkDF, gap_ms: int,
                     user_col: str = "user_id",
                     ts_ms_col: str = "ts_ms") -> SparkDF:
    """Batch twin of :func:`sessionize_stream` (same output schema):
    lag -> gap flag -> running session id -> per-session aggregate.
    The verification oracle for the streaming path. Window partitions
    by user (high cardinality — parallelism grows with users)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_ms_col)
    new_s = F.when(
        F.lag(ts_ms_col).over(w).isNull()
        | ((F.col(ts_ms_col) - F.lag(ts_ms_col).over(w)) > gap_ms),
        1).otherwise(0)
    ws = Window.partitionBy(user_col).orderBy(ts_ms_col) \
               .rowsBetween(Window.unboundedPreceding, 0)
    return (df.withColumn("__new_s", new_s)
              .withColumn("__sess", F.sum("__new_s").over(ws))
              .groupBy(F.col(user_col).alias("user_id"), "__sess")
              .agg(F.min(ts_ms_col).alias("start_ms"),
                   F.max(ts_ms_col).alias("end_ms"),
                   F.count(F.lit(1)).alias("n_events"))
              .drop("__sess"))
