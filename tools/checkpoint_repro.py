"""Minimal repro for the r12 pagerank chained-localCheckpoint
pathology (VERDICT r12 #4).

Background: r12 tried cutting pagerank's static plan (34 inlined
exchanges) by eager-localCheckpointing each iteration's rank vector.
Solo it was fine (~9 s at sf1); inside the full bench sweep it read
36.8 s — 4x the persist-based plan — and was reverted. Hypothesis at
the time: "multiple chained eager localCheckpoints interact badly
with accumulated long-session state". This tool turns the hypothesis
into a measured mechanism.

Design: the SAME pagerank workload (real operator, synthetic edge
list — no fixture dependency) is timed under two plans
(persist-based ``checkpoint_every=4`` = no checkpoints at 3
iterations, vs chained eager checkpoints ``checkpoint_every=1``) in
two session states:

- fresh: a just-built session (mini-warmed so worker-pool spawn isn't
  in the timing);
- aged: the same session after N churn rounds that mimic a bench
  sweep's accumulation — persist/unpersist cycles, temp views,
  completed jobs/stages feeding the UI listener bus, Python-worker
  traffic.

Each (plan, state) cell is a warm min-of-2. Output: one JSON line
with the 4 cells + the aged/fresh ratio per plan, written to
``CHECKPOINT_REPRO_r{round}.json`` when ``--out`` is given.

Run SOLO (no concurrent Spark) — the whole point is separating
session aging from host contention.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGES = 3_000_000
NODES = 300_000
CHURN_ROUNDS = 400


def make_edges(spark):
    """Deterministic synthetic directed graph: node i -> 10 targets
    via multiplicative hashing (same shape as a similarity-pair edge
    list; no fixture dependency, so the repro runs anywhere)."""
    from pyspark.sql import functions as F

    return (spark.range(EDGES)
                 .select((F.col("id") % NODES).alias("src"),
                         ((F.col("id") * 2654435761) % NODES)
                         .alias("dst")))


def run_pagerank(spark, checkpoint_every: int) -> float:
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.operators.pagerank import pagerank

    t0 = time.time()
    out = pagerank(make_edges(spark), iterations=3,
                   checkpoint_every=checkpoint_every)
    n = out.count()
    dt = time.time() - t0
    assert n == NODES, n
    release(out)
    spark.catalog.clearCache()
    return dt


def churn(spark, rounds: int = CHURN_ROUNDS):
    """Mimic a bench sweep's session accumulation: completed jobs and
    stages (listener-bus backlog), persist/unpersist cycles
    (ContextCleaner queue + storage churn), temp views, and
    Python-worker round-trips."""
    from pyspark.sql import functions as F

    for j in range(rounds):
        df = (spark.range(50_000)
                   .select((F.col("id") % 97).alias("k"),
                           F.col("id").alias("v"))
                   .groupBy("k").agg(F.sum("v").alias("s"))
                   .persist())
        df.count()
        df.createOrReplaceTempView(f"churn_{j % 7}")
        df.unpersist()
        if j % 10 == 0:  # python-worker traffic, like the udf queries
            spark.range(0, 3200, 1, 32).mapInPandas(
                lambda it: it, "id long").count()


def min2(fn):
    a = fn()
    b = fn()
    return round(min(a, b), 3)


def main():
    from bench import _fresh_session, _mini_warm
    from charmpandas_spark.session import get_spark

    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark(app_name="ckpt-repro",
                      extra_conf={"spark.ui.enabled": "true"})
    result = {"edges": EDGES, "nodes": NODES,
              "churn_rounds": CHURN_ROUNDS, "iterations": 3}

    # fresh-session cells
    for label, ck in (("persist", 4), ("chained_ckpt", 1)):
        spark = _fresh_session(spark)
        _mini_warm(spark)
        result[f"fresh_{label}"] = min2(lambda: run_pagerank(spark, ck))
        print(f"# fresh {label}: {result[f'fresh_{label}']}s",
              file=sys.stderr)

    # aged-session cells: ONE shared aged session, like the sweep
    spark = _fresh_session(spark)
    _mini_warm(spark)
    t0 = time.time()
    churn(spark)
    result["churn_sec"] = round(time.time() - t0, 1)
    print(f"# churn: {result['churn_sec']}s", file=sys.stderr)
    for label, ck in (("persist", 4), ("chained_ckpt", 1)):
        result[f"aged_{label}"] = min2(lambda: run_pagerank(spark, ck))
        print(f"# aged {label}: {result[f'aged_{label}']}s",
              file=sys.stderr)

    for label in ("persist", "chained_ckpt"):
        result[f"aging_x_{label}"] = round(
            result[f"aged_{label}"] / result[f"fresh_{label}"], 2)

    # contended cells: the competing hypothesis — eager checkpoints
    # turn the iteration pipeline into a chain of SYNCHRONOUS job
    # barriers, and each barrier's straggler tail is what host
    # contention inflates; a plan with 3x the barriers should degrade
    # disproportionately. A competitor process runs continuous Spark
    # aggregations in its own JVM while both variants are timed.
    import subprocess

    spark = _fresh_session(spark)
    _mini_warm(spark)
    comp = subprocess.Popen(
        [sys.executable, "-c", (
            "from charmpandas_spark.session import get_spark\n"
            "from pyspark.sql import functions as F\n"
            "s = get_spark(app_name='ckpt-competitor')\n"
            "while True:\n"
            "    (s.range(3_000_000)"
            ".select((F.col('id') % 1000).alias('k'))"
            ".groupBy('k').count().count())\n")],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        time.sleep(15)  # competitor JVM up and busy
        for label, ck in (("persist", 4), ("chained_ckpt", 1)):
            result[f"contended_{label}"] = min2(
                lambda: run_pagerank(spark, ck))
            print(f"# contended {label}: "
                  f"{result[f'contended_{label}']}s", file=sys.stderr)
    finally:
        comp.terminate()
        comp.wait()
    for label in ("persist", "chained_ckpt"):
        result[f"contention_x_{label}"] = round(
            result[f"contended_{label}"] / result[f"fresh_{label}"], 2)
    spark.stop()
    line = json.dumps(result)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
