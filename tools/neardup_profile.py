"""Segment profiler for the streaming_dedup_neardup ENGINE leg
(VERDICT r17 #3): the leg is the repo's single most expensive timed
entry (17.9 s sf0.1 / 50.1 s sf5) and round 17 only *measured* it.
Before optimizing, attribute its wall-clock to segments:

- coarse: index write | per-micro-batch drain (timed inside the real
  ``streaming_minhash_dedup`` foreachBatch via a timing wrapper
  around ``minhash_dedup_incremental``) | stream machinery residue |
  sink read+dedup+materialize.
- fine (batch 1 replayed as a plain batch, fresh index): every
  ACTION of ``minhash_dedup_incremental`` timed separately —
  banded-rows materialize, bloom probe + bucket collect, match
  build+verify, novel anti-join append, bloom delta, cache fold —
  so the expensive stage is named, not guessed.

Protocol: fresh session, bench mini-warm, N runs, all times
reported (same house rules as tools/solo_witness.py). Jobs are
labeled with setJobDescription.

Usage: python tools/neardup_profile.py [--runs N] [--out FILE]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile_coarse(spark, sf_dir: str) -> dict:
    """Run the REAL registry engine leg once with per-batch timing
    spliced in via a wrapper around minhash_dedup_incremental."""
    import __spark_entry__ as entry
    from charmpandas_spark.functions import dedup as fdedup

    seg: dict = {"batches": []}
    real = fdedup.minhash_dedup_incremental

    def timed(spark_, batch_df, *a, **kw):
        t0 = time.time()
        out = real(spark_, batch_df, *a, **kw)
        seg["batches"].append(round(time.time() - t0, 4))
        return out

    # streaming_minhash_dedup resolves the probe lazily from
    # functions.dedup inside its foreachBatch, so patch it there
    fdedup.minhash_dedup_incremental = timed
    try:
        legs: dict = {}
        t0 = time.time()
        df = entry.q_streaming_dedup_neardup(spark, sf_dir, _legs=legs)
        n = len(df.toPandas())
        total = round(time.time() - t0, 4)
    finally:
        fdedup.minhash_dedup_incremental = real
    seg["engine"] = legs.get("engine")
    seg["oracle_truth_join"] = round(total - (legs.get("engine") or 0), 4)
    seg["total"] = total
    seg["rows"] = n
    # residue = engine minus the in-batch probe time: index write +
    # source fixture write + stream start/commit + sink read
    seg["engine_minus_batches"] = round(
        (legs.get("engine") or 0) - sum(seg["batches"]), 4)
    return seg


def profile_fine(spark, sf_dir: str) -> dict:
    """Replay batch 1 of the engine leg as a PLAIN batch probe
    against a fresh index, timing every action separately."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from charmpandas_spark.functions import dedup as d

    sc = spark.sparkContext
    seg: dict = {}

    def mark(label):
        sc.setJobDescription(f"ndprof: {label}")

    docs = entry._t(spark, sf_dir, "documents").sdf \
        .select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)
    idx = entry._tmp_sink("ndprof_idx")
    shutil.rmtree(idx, ignore_errors=True)

    t = time.time()
    mark("index write")
    d.minhash_index_write(hist, "text", "doc_id", idx, num_hashes=16,
                          bands=8, num_buckets=16)
    seg["index_write"] = round(time.time() - t, 4)

    stored = d._index_meta_read(spark, idx) or {}
    m_bits, bk = stored["bloom_m"], stored["bloom_k"]

    t = time.time()
    mark("banded rows (shingle+sign+band)")
    brows = (d._banded_rows(b1, "text", "doc_id", 16, 8, 5, "md5",
                            False, 3)
             .withColumn("bucket", d._band_bucket(16))
             .persist(StorageLevel.MEMORY_AND_DISK))
    n_brows = brows.count()
    seg["banded_rows"] = round(time.time() - t, 4)

    t = time.time()
    mark("bloom table read+group")
    bloom_tbl = (spark.read.parquet(idx + "/_cps_bloom")
                 .groupBy("word").agg(F.bit_or("bits").alias("bits")))
    bloom_tbl, handle = d.tracked_local_checkpoint(bloom_tbl)
    seg["bloom_read_group"] = round(time.time() - t, 4)

    t = time.time()
    mark("bloom probe")
    from charmpandas_spark.functions.bloom import bloom_probe
    probe_rows = (bloom_probe(brows, "band_key", bloom_tbl, m_bits, bk,
                              out_col="__m")
                  .where(F.col("__m")).drop("__m")
                  .persist(StorageLevel.MEMORY_AND_DISK))
    n_pos = probe_rows.count()
    seg["bloom_probe"] = round(time.time() - t, 4)

    t = time.time()
    mark("bucket distinct collect")
    buckets = [r["bucket"] for r in
               probe_rows.select("bucket").distinct().collect()]
    seg["bucket_collect"] = round(time.time() - t, 4)

    t = time.time()
    mark("band join + verify (+ matches checkpoint)")
    idxdf = (spark.read.parquet(idx)
             .where(F.col("bucket").isin(buckets))
             .withColumnsRenamed({"doc": "matched_doc", "sh": "__sh_h"}))
    cand = (probe_rows.join(idxdf.hint("shuffle_hash"),
                            ["band_idx", "band_key", "bucket"])
            .select("doc", "sh", "matched_doc", "__sh_h"))
    inter = F.size(F.array_intersect("sh", "__sh_h"))
    union = F.size(F.array_union("sh", "__sh_h"))
    matches = (cand.withColumn("jaccard",
                               F.floor(inter.cast("double") / union
                                       * 10000) / 10000)
               .filter(F.col("jaccard") >= 0.7)
               .filter(~F.col("doc").eqNullSafe(F.col("matched_doc")))
               .select("doc", "matched_doc", "jaccard")
               .dropDuplicates(["doc", "matched_doc"]))
    matches, mc = d.tracked_local_checkpoint(matches)
    n_matches = matches.count()
    seg["band_join_verify"] = round(time.time() - t, 4)

    t = time.time()
    mark("novel anti-join + index append")
    novel = (brows.join(matches.select("doc").distinct(),
                        "doc", "left_anti")
             .select("bucket", "band_idx", "band_key", "doc", "sh")
             .persist(StorageLevel.MEMORY_AND_DISK))
    (novel.repartition("bucket")
          .write.mode("append").partitionBy("bucket").parquet(idx))
    seg["novel_append"] = round(time.time() - t, 4)

    t = time.time()
    mark("bloom delta build+append")
    from charmpandas_spark.functions.bloom import bloom_build
    nb = bloom_build(novel.select("band_key"), "band_key", m_bits, bk)
    nb.repartition(1).write.mode("append").parquet(idx + "/_cps_bloom")
    seg["bloom_delta"] = round(time.time() - t, 4)

    t = time.time()
    mark("cache fold (bloom union regroup ckpt)")
    merged, h2 = d.tracked_local_checkpoint(
        bloom_tbl.unionByName(
            spark.read.parquet(idx + "/_cps_bloom")
            .groupBy("word").agg(F.bit_or("bits").alias("bits")))
        .groupBy("word").agg(F.bit_or("bits").alias("bits")))
    seg["cache_fold"] = round(time.time() - t, 4)

    sc.setJobDescription(None)
    seg["n_brows"] = n_brows
    seg["n_bloom_pos"] = n_pos
    seg["n_matches"] = n_matches
    seg["n_buckets"] = len(buckets)
    for x in (brows, probe_rows, novel):
        x.unpersist()
    handle.unpersist()
    h2.unpersist()
    mc.unpersist()
    shutil.rmtree(idx, ignore_errors=True)
    return seg


def main():
    argv = sys.argv[1:]
    runs = 2
    out_path = None
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i:i + 2]
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i:i + 2]
    do_coarse = "--fine-only" not in argv
    do_fine = "--coarse-only" not in argv

    import subprocess

    import bench
    from charmpandas_spark.session import get_spark

    subprocess.run(["sync"], check=False)
    spark = get_spark(app_name="cps-neardup-profile")
    bench._mini_warm(spark)
    doc = {"sf_dir": bench.SF_DIR, "coarse": [], "fine": [],
           "load_start": bench._host_load()}
    for _ in range(runs if do_coarse else 0):
        spark = bench._fresh_session(spark)
        bench._mini_warm(spark)
        c = profile_coarse(spark, bench.SF_DIR)
        c["load1"] = bench._host_load().get("load1")
        doc["coarse"].append(c)
        print(f"# coarse: {json.dumps(c)}", file=sys.stderr)
        bench._cleanup_entry(spark)
        spark.catalog.clearCache()
    for _ in range(runs if do_fine else 0):
        spark = bench._fresh_session(spark)
        bench._mini_warm(spark)
        f = profile_fine(spark, bench.SF_DIR)
        f["load1"] = bench._host_load().get("load1")
        doc["fine"].append(f)
        print(f"# fine: {json.dumps(f)}", file=sys.stderr)
        bench._cleanup_entry(spark)
        spark.catalog.clearCache()
    doc["load_end"] = bench._host_load()
    spark.stop()
    line = json.dumps(doc, indent=2)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
