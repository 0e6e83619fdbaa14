"""Dataset observability pass — the "look before you train" story.

One session, one corpus snapshot, every monitoring operator the
curation platform runs per-ingest, each a one-scan / vocabulary-bound
DataFrame plan:

    lineitem / events / documents
      -> column profile           (rows, nulls, exact distincts, ranges)
      -> equi-width + equi-depth histograms
      -> PII scan                 (where to point the scrub pass)
      -> join-blowup preflight    (orders x lineitem cardinality)
      -> per-type value trend     (OLS slope, exact micro-units)
      -> A/B readout              (Welch's t by user-id parity)
      -> vocabulary drift         (src0 slice vs the rest)
      -> curation funnel          (per-rule drop attribution)

Run: python examples/observability_demo.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import charmpandas_spark as cps
from charmpandas_spark.functions.profile import (
    histogram_equidepth, histogram_equiwidth, join_blowup_profile,
    pii_scan, profile_columns)
from charmpandas_spark.functions.quality import curation_funnel
from charmpandas_spark.functions.regression import ab_welch, linear_fit
from charmpandas_spark.functions.text import (
    token_drift, whitespace_token_count)
from charmpandas_spark.timestamps import epoch_micros


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = cps.get_spark(app_name="observability-demo")
    li = cps.read_table(spark, sf_dir, "lineitem").sdf
    ev = cps.read_table(spark, sf_dir, "events").sdf
    docs = cps.read_table(spark, sf_dir, "documents").sdf
    t0 = time.time()

    prof = profile_columns(li, ["l_orderkey", "l_quantity",
                                "l_returnflag"]).collect()
    print("profile:", {r["column"]: (r["n_rows"], r["n_distinct"])
                       for r in prof})

    hw = histogram_equiwidth(ev, "value", 10).count()
    hd = histogram_equidepth(li, "l_extendedprice", 8).count()
    print(f"histograms: {hw} equi-width bins, {hd} equi-depth buckets")

    pii = pii_scan(docs, ["text"]).collect()[0]
    print("pii (text):", {k: pii[k] for k in
                          ("email_hits", "ipv4_hits", "phone_hits")})

    blow = {r["key"]: r["pairs"] for r in
            join_blowup_profile(cps.read_table(spark, sf_dir,
                                               "orders").sdf,
                                li, "o_orderkey", "l_orderkey",
                                top=3).collect()}
    print("join preflight total pairs:", blow[None])

    ev_ok = ev.where(F.col("value").isNotNull())
    t0e = ev_ok.agg(F.min(epoch_micros("ts")).alias("t0"))
    prepared = (ev_ok.crossJoin(F.broadcast(t0e))
                .select("event_type",
                        F.floor((epoch_micros("ts") - F.col("t0"))
                                / F.lit(1_000_000)).cast("long")
                         .alias("x"),
                        F.floor(F.col("value") * 100).cast("long")
                         .alias("y")))
    trend = linear_fit(prepared, "x", "y", ["event_type"]).collect()
    print("value trends (micro-cents/sec):",
          {r["event_type"]: r["slope_micro"] for r in trend})

    ab = prepared.withColumn(
        "variant", F.when(F.col("x") % 2 == 0, "A").otherwise("B"))
    welch = ab_welch(ab, "variant", "y", ["event_type"]).collect()
    print("A/B t stats:", {r["event_type"]: r["t_micro"]
                           for r in welch})

    drift = (token_drift(docs.where(F.col("source") != "src0"),
                         docs.where(F.col("source") == "src0"),
                         "text", "doc_id")
             .orderBy(F.col("chi_micro").desc()).limit(3).collect())
    print("top drifting tokens:", [r["token"] for r in drift])

    rules = {"min_words": whitespace_token_count("text") >= 10,
             "is_en": F.col("lang") == "en"}
    funnel = {r["rule"]: r["n_first_failed"] for r in
              curation_funnel(docs, rules).collect()}
    print("funnel:", funnel)

    print(f"observability pass in {time.time() - t0:.2f}s")
    assert blow[None] > 0 and funnel["__kept__"] >= 0
    print("observability demo passed")
    spark.stop()


if __name__ == "__main__":
    main()
