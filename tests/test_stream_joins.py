"""Stream-stream and stream-static join equivalence vs batch."""

import pytest

from pyspark.sql import functions as F

import charmpandas_spark as cps


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return cps.read_table(spark, sf_dir, "events").sdf


def test_stream_static_join(spark, events, tmp_path):
    from charmpandas_spark.streaming.joins import stream_static_join
    from charmpandas_spark.streaming.windows import stream_from_parquet

    src = str(tmp_path / "ss_src")
    events.limit(1000).coalesce(1).write.parquet(src)
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("view", 0.1)],
        ["event_type", "weight"])
    stream = stream_from_parquet(spark, src)
    joined = stream_static_join(stream, dim, "event_type")
    q = (joined.writeStream.format("memory").queryName("ss_join")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, count(weight) AS matched FROM ss_join"
    ).first()
    batch = spark.read.parquet(src).join(dim, "event_type", "left")
    assert got["n"] == batch.count()
    assert got["matched"] == batch.filter("weight IS NOT NULL").count()


def test_stream_stream_join_matches_batch(spark, events, tmp_path):
    from charmpandas_spark.streaming.joins import stream_stream_join
    from charmpandas_spark.streaming.windows import stream_from_parquet

    src = str(tmp_path / "s2_src")
    events.limit(2000).coalesce(1).write.parquet(src)
    clicks_b = (spark.read.parquet(src)
                .filter(F.col("event_type") == "click")
                .select("user_id", "ts", "event_id"))
    views_b = (spark.read.parquet(src)
               .filter(F.col("event_type") == "view")
               .select("user_id", "ts", "event_id"))

    stream = stream_from_parquet(spark, src)
    clicks_s = stream.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", "event_id")
    views_s = stream.filter(F.col("event_type") == "view") \
        .select("user_id", "ts", "event_id")
    joined = stream_stream_join(clicks_s, views_s, "user_id",
                                max_delay="6 hours", watermark="30 days")
    q = (joined.writeStream.format("memory").queryName("s2_join")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT count(*) FROM s2_join").first()[0]

    want = clicks_b.alias("a").join(
        views_b.alias("b"),
        on=[F.col("a.user_id") == F.col("b.user_id"),
            F.col("b.ts") <= F.col("a.ts"),
            F.col("b.ts") >= F.col("a.ts") - F.expr("INTERVAL 6 hours")],
        how="inner").count()
    assert got == want
    cols = spark.table("s2_join").columns
    assert "ts_l" in cols and "ts_r" in cols  # _l/_r suffix convention