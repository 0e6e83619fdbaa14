"""NTZ/LTZ timestamp-portability matrix (VERDICT r5 item #5).

PySpark 4 reads tz-less parquet timestamps as TIMESTAMP_NTZ while
tz-aware ones read as TIMESTAMP; r5 shipped with every watermark /
``unix_micros`` path broken on the NTZ flavor. This matrix writes the
SAME events fixture both ways and runs every timestamp-touching
operator against each, so the bug class can never land silently
again. Results must agree across flavors (UTC session tz makes the
NTZ->LTZ reinterpretation lossless).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from charmpandas_spark.timestamps import (
    ensure_event_time, epoch_micros, ntz_to_ltz)


@pytest.fixture(scope="module")
def ts_fixture_dirs(spark, tmp_path_factory):
    """(ntz_dir, ltz_dir): identical micros, opposite parquet flavors.

    pandas naive datetimes -> isAdjustedToUTC=false (NTZ on read);
    tz-aware UTC datetimes -> isAdjustedToUTC=true (LTZ on read).
    """
    base = tmp_path_factory.mktemp("ts_matrix")
    naive = pd.DataFrame({
        "user_id": [i % 7 for i in range(200)],
        "event_id": list(range(200)),
        # micros, not pandas' default nanos — Spark 4 rejects
        # TIMESTAMP(NANOS) parquet outright (PARQUET_TYPE_ILLEGAL)
        "ts": pd.date_range("2024-03-01", periods=200, freq="47min")
                .astype("datetime64[us]"),
        "value": [float(i % 13) for i in range(200)],
    })
    aware = naive.assign(
        ts=naive["ts"].dt.tz_localize("UTC").astype("datetime64[us, UTC]"))
    ntz_dir, ltz_dir = str(base / "ntz"), str(base / "ltz")
    os.makedirs(ntz_dir), os.makedirs(ltz_dir)
    naive.to_parquet(os.path.join(ntz_dir, "part0.parquet"))
    aware.to_parquet(os.path.join(ltz_dir, "part0.parquet"))
    return ntz_dir, ltz_dir


def _raw(spark, d):
    return spark.read.parquet(d)


def test_fixture_flavors_differ(spark, ts_fixture_dirs):
    """Preconditions: the two dirs genuinely read as NTZ vs LTZ —
    otherwise every test below is vacuous."""
    ntz_dir, ltz_dir = ts_fixture_dirs
    ntz_t = dict(_raw(spark, ntz_dir).dtypes)["ts"]
    ltz_t = dict(_raw(spark, ltz_dir).dtypes)["ts"]
    assert ntz_t == "timestamp_ntz", ntz_t
    assert ltz_t == "timestamp", ltz_t


def test_ntz_to_ltz_lossless(spark, ts_fixture_dirs):
    """Casting NTZ->LTZ under the UTC session tz preserves the
    underlying micros exactly."""
    ntz_dir, ltz_dir = ts_fixture_dirs
    a = ntz_to_ltz(_raw(spark, ntz_dir)).select(
        "event_id", F.unix_micros("ts").alias("us"))
    b = _raw(spark, ltz_dir).select(
        "event_id", F.unix_micros("ts").alias("us"))
    assert isinstance(ntz_to_ltz(_raw(spark, ntz_dir)).schema["ts"]
                      .dataType, TimestampType)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_read_parquet_normalizes_at_ingest(spark, ts_fixture_dirs):
    import charmpandas_spark as cps
    ntz_dir, _ = ts_fixture_dirs
    df = cps.read_parquet(spark, os.path.join(ntz_dir, "part0.parquet"))
    assert isinstance(df.sdf.schema["ts"].dataType, TimestampType)


@pytest.mark.parametrize("flavor", ["ntz", "ltz"])
def test_epoch_micros_both_flavors(spark, ts_fixture_dirs, flavor):
    d = ts_fixture_dirs[0 if flavor == "ntz" else 1]
    out = _raw(spark, d).select(epoch_micros("ts").alias("us"))
    assert out.where(F.col("us").isNull()).count() == 0


def _matrix_results(spark, ts_fixture_dirs, build):
    """Run ``build(sdf) -> DataFrame`` on both flavors, return
    pandas frames sorted by all columns."""
    outs = []
    for d in ts_fixture_dirs:
        out = build(_raw(spark, d)).toPandas()
        outs.append(out.sort_values(list(out.columns))
                       .reset_index(drop=True))
    return outs


@pytest.mark.parametrize("op", [
    "tumbling", "sliding", "sessionize", "chunked_range", "interval"])
def test_batch_ts_operators_flavor_agnostic(spark, ts_fixture_dirs, op):
    """Every batch timestamp operator accepts both flavors and
    produces identical results."""
    from charmpandas_spark.operators.interval import interval_join
    from charmpandas_spark.streaming.windows import (
        chunked_range_agg, sessionize, sliding_window_agg,
        tumbling_window_agg)

    def build(sdf):
        if op == "tumbling":
            return tumbling_window_agg(sdf, "ts", ["user_id"], "1 day")
        if op == "sliding":
            return sliding_window_agg(sdf, "ts", [], "2 days", "1 day")
        if op == "sessionize":
            return sessionize(sdf, "ts", "user_id", "90 minutes")
        if op == "chunked_range":
            return chunked_range_agg(
                sdf, ["user_id"], "ts",
                {"s": F.sum("value")}, window=3_600_000_000)
        intervals = sdf.groupBy("user_id").agg(
            F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        return interval_join(sdf, intervals, "ts", "t0", "t1",
                             on="user_id").select("event_id", "user_id")

    a, b = _matrix_results(spark, ts_fixture_dirs, build)
    # window-start columns come back LTZ for one flavor, NTZ for the
    # other; compare on values (pandas renders both as naive UTC)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("flavor", ["ntz", "ltz"])
def test_watermark_accepts_both_flavors(spark, ts_fixture_dirs, flavor):
    """ensure_event_time + withWatermark analyzes cleanly on a real
    stream of either flavor (analysis-time check — the r5 failure was
    an AnalysisException at plan build)."""
    from charmpandas_spark.streaming.windows import (
        stream_from_parquet, stream_tumbling_counts)
    d = ts_fixture_dirs[0 if flavor == "ntz" else 1]
    stream = stream_from_parquet(spark, d)
    out = stream_tumbling_counts(stream, "ts", "1 day", "2 days",
                                 keys=["user_id"])
    assert out.isStreaming  # analysis passed, watermark attached


@pytest.mark.parametrize("flavor", ["ntz", "ltz"])
def test_stateful_stream_accepts_both_flavors(spark, ts_fixture_dirs,
                                              flavor, tmp_path):
    """running_totals_stream end-to-end on each flavor matches the
    batch twin."""
    from charmpandas_spark.streaming.stateful import (
        running_totals_batch, running_totals_stream)
    from charmpandas_spark.streaming.windows import stream_from_parquet
    d = ts_fixture_dirs[0 if flavor == "ntz" else 1]
    stream = stream_from_parquet(spark, d, max_files_per_trigger=1)
    out = running_totals_stream(stream)
    q = (out.writeStream.format("memory")
         .queryName(f"ts_matrix_{flavor}")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (spark.table(f"ts_matrix_{flavor}")
           .groupBy("user_id")
           .agg(F.max("n_events").alias("n_events"),
                F.max("total_value").alias("total_value"),
                F.max("max_value").alias("max_value"))
           .toPandas().sort_values("user_id").reset_index(drop=True))
    want = (running_totals_batch(_raw(spark, d))
            .toPandas().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns],
                                  check_dtype=False)
