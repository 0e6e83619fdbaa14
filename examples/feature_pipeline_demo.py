"""Feature-engineering pipeline for a tabular/behavioral model.

The wave-4 composed story: events + orders in, a leakage-safe
train/test feature table out, every stage a distributed DataFrame
transformation with a bounded-statistics plan shape:

    events
      -> LOCF forward-fill of gappy values   (sequence.locf_fill:
                                              one keyed window)
      -> group z-score standardization       (encode.standard_scale:
                                              stats broadcast back)
      -> Markov next-event features          (sequence.markov_
                                              transitions)
      -> TEMPORAL split with 1h embargo      (sequence.temporal_
                                              split_embargo — no
                                              lookback leakage)
    orders
      -> leave-one-out target encoding       (encode.target_encode_
                                              loo — no target
                                              leakage)
      -> per-segment top-k spenders          (topk_per_group: two
                                              bounded aggregations)
    embeddings
      -> k-center coreset (labeling budget)  (coreset.kcenter_select)
      -> top-PC projection (drift monitor)   (pca.pca_power_project)

Run: python examples/feature_pipeline_demo.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import charmpandas_spark as cps
from charmpandas_spark.functions.coreset import kcenter_select
from charmpandas_spark.functions.encode import (standard_scale,
                                                target_encode_loo)
from charmpandas_spark.functions.pca import pca_power_project
from charmpandas_spark.operators.sequence import (
    locf_fill, markov_transitions, temporal_split_embargo)
from charmpandas_spark.operators.topk import topk_per_group

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = cps.get_spark(app_name="feature-pipeline",
                          master="local[8]", shuffle_partitions=16)
    t0 = time.time()
    events = cps.read_table(spark, SF_DIR, "events").sdf
    orders = cps.read_table(spark, SF_DIR, "orders").sdf
    emb = cps.read_table(spark, SF_DIR, "embeddings").sdf

    # -- event features ---------------------------------------------
    ev = events.withColumn(
        "vm", F.floor(F.col("value") * 1_000_000).cast("long"))
    # simulate sensor gaps, then forward-fill per user
    gappy = ev.withColumn(
        "vm", F.when(F.col("event_id") % 7 == 0, None)
               .otherwise(F.col("vm")))
    filled = locf_fill(gappy, "user_id", "ts", "event_id", "vm",
                       "vm_filled")
    scaled = standard_scale(
        filled.where(F.col("vm_filled").isNotNull())
              .select("event_type", F.col("vm_filled").alias("vm")),
        "vm", ["event_type"])
    trans = markov_transitions(events, "user_id", "ts", "event_id",
                               "event_type")
    split = temporal_split_embargo(events, "ts", 0.8,
                                   3_600 * 1_000_000)
    split_counts = {r["split"]: r["n"] for r in
                    split.groupBy("split")
                         .agg(F.count(F.lit(1)).alias("n"))
                         .collect()}

    # -- order features ---------------------------------------------
    o = orders.withColumn(
        "cents", F.floor(F.col("o_totalprice") * 100).cast("long"))
    loo = target_encode_loo(o, "o_orderpriority", "cents",
                            "o_orderkey")
    top = topk_per_group(o, ["o_orderpriority"], "cents",
                         "o_orderkey", 3)

    # -- embedding selection / monitoring ---------------------------
    core = kcenter_select(emb, "embedding", "vec_id", 8,
                          train_cap=256)
    proj = pca_power_project(emb, "embedding", "vec_id")

    n_scaled = scaled.count()
    n_trans = trans.count()
    n_loo = loo.where(F.col("enc_loo_micro").isNotNull()).count()
    top_rows = top.orderBy("o_orderpriority", "rank").collect()
    core_rows = core.orderBy("rank").collect()
    p_stats = proj.agg(F.min("proj"), F.max("proj")).collect()[0]

    print(f"split sizes: {split_counts}")
    print(f"z-scored event rows: {n_scaled}")
    print(f"markov transitions:  {n_trans}")
    print(f"LOO-encoded orders:  {n_loo}")
    print("top spender per priority:",
          [(r["o_orderpriority"], r["o_orderkey"])
           for r in top_rows if r["rank"] == 1])
    print("coreset cover radius^2:",
          max(r["max_r2"] for r in core_rows))
    print(f"top-PC projection range: [{p_stats[0]}, {p_stats[1]}]")
    print(f"total {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
