"""Warehouse-maintenance tour: one CDC change log driven through all
four consumers this engine provides, batch and streaming.

    log (I/U/D, multiple entries per key)
      |-- cdc_latest      -> current snapshot (compacted)
      |-- scd2_build      -> full validity-interval history
      |-- survivorship    -> golden records (latest non-null per attr)
      `-- cdc_stream_into -> the SAME snapshot, maintained by a
                             Structured Streaming micro-batch sink
                             (order-robust tombstone merge)

The streaming leg replays the log split into micro-batches and must
land on the byte-identical snapshot the batch compaction computes —
asserted at the end. Run: python examples/warehouse_demo.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import charmpandas_spark as cps  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    spark = cps.get_spark(app_name="warehouse-demo",
                          master="local[8]", shuffle_partitions=8)
    from charmpandas_spark.operators.cdc import (cdc_latest, scd2_build,
                                                 survivorship)
    from charmpandas_spark.streaming.sinks import (cdc_stream_into,
                                                   read_cdc_snapshot)
    from charmpandas_spark.streaming.windows import stream_from_parquet

    o = cps.read_table(spark, SF_DIR, "orders").sdf
    base = o.select("o_orderkey", "o_custkey",
                    F.floor(F.col("o_totalprice") * 100).cast("long")
                     .alias("price_c"))
    ins = base.select("*", F.lit(1).cast("long").alias("seq"),
                      F.lit("I").alias("op"))
    upd = (base.filter(F.col("o_orderkey") % 3 == 0)
               .select("o_orderkey", "o_custkey",
                       (F.col("price_c") + 1000).alias("price_c"),
                       F.lit(2).cast("long").alias("seq"),
                       F.lit("U").alias("op")))
    dele = (base.filter(F.col("o_orderkey") % 7 == 0)
                .select("o_orderkey", "o_custkey", "price_c",
                        F.lit(3).cast("long").alias("seq"),
                        F.lit("D").alias("op")))
    log = ins.unionByName(upd).unionByName(dele)

    t0 = time.time()
    snap = cdc_latest(log, ["o_orderkey"], "seq", "op")
    n_snap = snap.count()
    print(f"cdc_latest:   {n_snap} live keys        "
          f"({time.time() - t0:.2f}s)")

    t0 = time.time()
    hist = scd2_build(log, ["o_orderkey"], "seq", "op")
    n_cur = hist.where("is_current").count()
    print(f"scd2_build:   {hist.count()} versions, {n_cur} current "
          f"({time.time() - t0:.2f}s)")

    t0 = time.time()
    golden = survivorship(log.drop("op"), ["o_orderkey"], "seq",
                          ["o_custkey", "price_c"])
    print(f"survivorship: {golden.count()} golden records  "
          f"({time.time() - t0:.2f}s)")

    # streaming leg: same log, 4 micro-batches, tombstone merge sink
    t0 = time.time()
    work = tempfile.mkdtemp(prefix="cps_warehouse_demo_")
    src, target = os.path.join(work, "src"), os.path.join(work, "snap")
    log.repartition(4).write.mode("overwrite").parquet(src)
    q = cdc_stream_into(stream_from_parquet(spark, src,
                                            max_files_per_trigger=1),
                        target, os.path.join(work, "ckpt"),
                        ["o_orderkey"], "seq", "op")
    assert q.awaitTermination(300), "stream did not finish"
    streamed = read_cdc_snapshot(spark, target) \
        .select(*snap.columns)
    diff = streamed.exceptAll(snap).count() + \
        snap.exceptAll(streamed).count()
    print(f"streaming:    snapshot diff vs batch = {diff} rows "
          f"({time.time() - t0:.2f}s)")
    shutil.rmtree(work, ignore_errors=True)
    assert diff == 0, "streaming snapshot diverged from batch"
    print("OK: streaming CDC fixed point == batch compaction")
    spark.stop()


if __name__ == "__main__":
    main()
