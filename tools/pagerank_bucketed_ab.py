"""PageRank pre-bucketing A/B (VERDICT r14 #5).

The shipped ``operators.pagerank`` runs 2 shuffles per iteration:
(a) the rank vector shuffles to the persisted edge table's hash
layout for the contribution join, and (b) the contributions
groupBy(dst). The verdict asked whether PRE-BUCKETED edge/rank
tables (``operators.bucketing``) delete those per-iteration
exchanges — the win, if real, should grow with iteration count.

Three variants, all producing BIT-IDENTICAL integer micro-ranks
(asserted per point before any number is reported):

- ``persist``   — the shipped operator, unchanged.
- ``edges_bkt`` — the deduped (src, dst, deg) table written ONCE as a
  bucketed catalog table on ``src``; iterations read it with no
  edge-side exchange (the shipped persist already achieves this in
  memory — this isolates what disk bucketing adds/costs).
- ``ranks_bkt`` — edges bucketed once AND each iteration's rank
  vector WRITTEN as a bucketed table on the join key before the
  contribution join, so the join has zero exchanges on both sides.
  Each write is a synchronous job barrier — exactly the chained-
  checkpoint tail-latency curve CHECKPOINT_REPRO_r13 measured — so
  this is the variant the barrier doctrine predicts will lose on
  wall clock even if the plan shows fewer exchanges.

Usage: python tools/pagerank_bucketed_ab.py [--out FILE] [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MICRO = 1_000_000


def _edges(spark, sf_dir):
    from pyspark.sql import functions as F

    import __spark_entry__ as e

    li = e._t(spark, sf_dir, "lineitem").sdf
    o = e._t(spark, sf_dir, "orders").sdf
    pairs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
               .select(F.concat(F.lit("c"), F.col("o_custkey"))
                        .alias("c"),
                       F.concat(F.lit("s"), F.col("l_suppkey"))
                        .alias("s")))
    return (pairs.select(F.col("c").alias("src"),
                         F.col("s").alias("dst"))
                 .union(pairs.select(F.col("s").alias("src"),
                                     F.col("c").alias("dst"))))


def run_persist(spark, sf_dir, iterations):
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.operators.pagerank import pagerank
    from charmpandas_spark.plans.explain import num_exchanges

    t0 = time.time()
    ranks = pagerank(_edges(spark, sf_dir), iterations=iterations)
    pdf = ranks.toPandas()
    dt = round(time.time() - t0, 2)
    ex = num_exchanges(ranks)
    release(ranks)
    return dt, ex, pdf


def run_bucketed(spark, sf_dir, iterations, bucket_ranks,
                 num_buckets=32):
    """The bucketed rewrite: same integer recurrence as
    operators.pagerank (src-bucketed edge+degree table; optionally a
    bucketed rank table per iteration)."""
    from pyspark.sql import functions as F

    from charmpandas_spark.operators.bucketing import write_bucketed
    from charmpandas_spark.plans.explain import num_exchanges

    tag = f"cps_prab_{os.getpid()}"
    t0 = time.time()
    e = _edges(spark, sf_dir).select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src")
    write_bucketed(ed, f"{tag}_ed", "src", num_buckets)
    ed_b = spark.table(f"{tag}_ed")
    nodes = (e.select(F.col("src").alias("node"))
              .union(e.select(F.col("dst").alias("node")))
              .distinct())
    write_bucketed(nodes, f"{tag}_nodes", "node", num_buckets)
    nodes_b = spark.table(f"{tag}_nodes")
    base = F.lit((3 * MICRO) // 20)  # (20-17)/20 in micro-units
    ranks = nodes_b.select("node", F.lit(MICRO).alias("rank_micro"))
    for i in range(iterations):
        r = ranks.withColumnRenamed("node", "src")
        if bucket_ranks:
            write_bucketed(r, f"{tag}_r{i}", "src", num_buckets)
            r = spark.table(f"{tag}_r{i}")
        contribs = (ed_b.join(r, "src")
                        .select("dst",
                                F.expr("rank_micro DIV deg").alias("c"))
                        .groupBy("dst")
                        .agg(F.sum("c").alias("s")))
        ranks = (nodes_b.join(contribs.withColumnRenamed("dst", "node"),
                              "node", "left")
                 .select("node",
                         (base + F.expr("(17 * coalesce(s, 0L))"
                                        " DIV 20")).alias("rank_micro")))
    pdf = ranks.toPandas()
    dt = round(time.time() - t0, 2)
    ex = num_exchanges(ranks)
    for t in spark.catalog.listTables():
        if t.name.startswith(tag):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    return dt, ex, pdf


def _load():
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except OSError:
        return -1.0


def main():
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i:i + 2]
    sf_dirs = argv or ["/root/testdata/sf0.1",
                       os.path.join(REPO, "bench_sf1")]

    from charmpandas_spark.session import get_spark

    spark = get_spark(app_name="cps-pagerank-ab")
    spark.range(0, 3200, 1, 32).mapInPandas(
        lambda it: it, "id long").count()
    doc = {"tool": "tools/pagerank_bucketed_ab.py (rank identity "
                   "asserted per point before timing is reported)",
           "points": []}
    for sf_dir in sf_dirs:
        for iters in (3, 6):
            point = {"sf_dir": sf_dir, "iterations": iters,
                     "variants": {}}
            canon = None
            for name, fn in (
                    ("persist", lambda: run_persist(spark, sf_dir,
                                                    iters)),
                    ("edges_bkt", lambda: run_bucketed(spark, sf_dir,
                                                       iters, False)),
                    ("ranks_bkt", lambda: run_bucketed(spark, sf_dir,
                                                       iters, True))):
                dt, ex, pdf = fn()
                pdf = pdf.sort_values("node").reset_index(drop=True)
                if canon is None:
                    canon = pdf
                    identical = True
                else:
                    identical = bool(canon.equals(pdf))
                point["variants"][name] = {
                    "wall_sec": dt, "final_plan_exchanges": ex,
                    "rows": len(pdf), "identical": identical,
                    "load1": _load()}
                spark.catalog.clearCache()
            doc["points"].append(point)
            print(f"# {sf_dir} iters={iters}: " + " ".join(
                f"{k}={v['wall_sec']}s/ex{v['final_plan_exchanges']}"
                f"{'' if v['identical'] else ' MISMATCH'}"
                for k, v in point["variants"].items()),
                file=sys.stderr)
    spark.stop()
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=2)
    print(json.dumps(doc))
    ok = all(v["identical"] for p in doc["points"]
             for v in p["variants"].values())
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
