"""Stateful streaming: applyInPandasWithState operators must agree
with their batch twins after replaying a table as a stream."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

import charmpandas_spark as cps


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return cps.read_table(spark, sf_dir, "events").sdf


def test_running_totals_stream_matches_batch(spark, events, tmp_path):
    from charmpandas_spark.streaming.stateful import (
        running_totals_batch, running_totals_stream)
    from charmpandas_spark.streaming.windows import stream_from_parquet

    src = str(tmp_path / "ev_src")
    # several files -> several micro-batches (state must carry across)
    events.limit(3000).repartition(4).write.parquet(src)
    stream = stream_from_parquet(spark, src, max_files_per_trigger=1)
    out = running_totals_stream(stream)
    q = (out.writeStream.format("memory").queryName("run_tot")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)

    # 'update' mode re-emits per batch; the LAST emission per user is
    # the final state
    got = spark.sql("""
        SELECT user_id, n_events, total_value, max_value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY n_events DESC) AS rn FROM run_tot)
        WHERE rn = 1
    """).toPandas().set_index("user_id").sort_index()
    want = running_totals_batch(spark.read.parquet(src)) \
        .toPandas().set_index("user_id").sort_index()
    assert (got["n_events"] == want["n_events"]).all()
    assert (abs(got["total_value"] - want["total_value"]) < 1e-6).all()
    assert (got["max_value"] == want["max_value"]).all()


def test_threshold_alerts_stream(spark, events, tmp_path):
    from charmpandas_spark.streaming.stateful import threshold_alerts_stream
    from charmpandas_spark.streaming.windows import stream_from_parquet

    src = str(tmp_path / "ev_alert_src")
    events.limit(2000).coalesce(1).write.parquet(src)
    stream = stream_from_parquet(spark, src)
    alerts = threshold_alerts_stream(stream, threshold=200.0, target=50.0)
    q = (alerts.writeStream.format("memory").queryName("alerts")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM alerts").toPandas()
    # alerts fire only at/above threshold and carry the triggering dev
    assert (got["cum_dev"] >= 200.0).all()
    assert len(got) > 0


def test_compat_module(spark, sf_dir):
    import os

    import charmpandas_spark.compat as cpd
    cpd._session = spark  # reuse the test session
    df = cpd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))
    df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
    out = df[df["rev"] > 100.0].groupby("l_returnflag")["rev"].sum()
    pdf = out.get()
    assert "sum(rev)" in pdf.columns and len(pdf) > 0
    both = cpd.concat([df, df])
    assert both.count() == 2 * df.count()
