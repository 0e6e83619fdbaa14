"""Name the 2x100M knee (VERDICT r16 #3).

``DEMO_SCALE_r16`` measured e(20M->100M) = 1.09 — superlinear — on
the flagship demo join (2-string-key inner join + groupby-count +
fetch). The working hypothesis: at 2x100M the join's shuffle
(~12 GB of spill per the r16 artifact note) exceeds executor memory
and goes LOCAL-DISK-bound on local[32]; on a real cluster this is
exactly where more executors / remote shuffle flatten the curve.

This tool runs the 2x100M point under three configurations and
reports which one flattens the knee:

A. **baseline** — the exact DEMO_SCALE runner config (32 shuffle
   partitions, shuffled hash join), for an apples-to-apples anchor.
B. **shuffle_x4** — 128 shuffle partitions, same fixture: smaller
   per-task hash maps spill less (or not at all); total shuffle
   bytes unchanged. If the knee is per-task memory, this flattens.
C. **bucketed** — both tables written ONCE as 64-bucket
   (first_name, last_name) bucketed parquet; the probe re-registers
   them as external bucketed tables and joins WITHOUT any exchange
   (the scan's bucket layout satisfies the join's distribution —
   asserted from the plan, not assumed). This is the
   pre-partitioned-ingest strategy a 100 TB pipeline uses: pay the
   partitioning once at write time, never at query time. If the
   knee is the shuffle itself, this removes it entirely.

Protocol: fixtures pre-generated in separate processes (reused
across invocations, ``bench_demo/``); every timed run is a fresh
process that only reads; ``sync`` (+ page-cache drop where allowed)
before the first run of each config, ``sync`` between runs (the
r16 writeback lesson). Output: one JSON doc with per-config
readings, the exchange count of each probe plan, and the implied
e(20M->100M) exponent per config against DEMO_SCALE's committed
2x20M warm floor.

Usage: python tools/demo_knee.py [--runs N] [--out FILE]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from demo_scale import (FIXTURE_ROOT, _fixture, drop_page_cache,  # noqa: E402
                        ensure_fixture)

N = int(os.environ.get("CPS_KNEE_ROWS", 100_000_000))  # env: smoke
BUCKETS = 64

_GEN_BUCKETED = r"""
import os, sys, tempfile
sys.path.insert(0, {repo!r})
import charmpandas_spark as cps
from pyspark.sql import functions as F

p1, p2 = {p1!r}, {p2!r}
b1, b2 = {b1!r}, {b2!r}
meta = tempfile.mkdtemp(prefix="cps_knee_meta_")
spark = cps.get_spark(app_name="cps-knee-gen", extra_conf={{
    "spark.sql.warehouse.dir": os.path.join(meta, "wh"),
    "javax.jdo.option.ConnectionURL":
        "jdbc:derby:;databaseName=" + os.path.join(meta, "db")
        + ";create=true",
}})
# one bucket file per bucket: repartition on the bucket columns with
# numPartitions == numBuckets (same murmur3 pmod layout) so the
# bucketBy write does not fan out nbuckets files per write task
for src, dst, tbl in ((p1, b1, "cps_knee_ids"),
                      (p2, b2, "cps_knee_ages")):
    df = spark.read.parquet(src)
    (df.repartition({buckets}, F.col("first_name"),
                    F.col("last_name"))
       .write.mode("overwrite")
       .bucketBy({buckets}, "first_name", "last_name")
       .sortBy("first_name", "last_name")
       .option("path", dst)
       .saveAsTable(tbl))
spark.stop()
print("GEN_OK")
"""

_DDL = """
CREATE TABLE {tbl} ({cols})
USING PARQUET
CLUSTERED BY (first_name, last_name)
SORTED BY (first_name, last_name)
INTO {buckets} BUCKETS
LOCATION '{path}'
"""

_RUNNER = r"""
import os, sys, time, tempfile
sys.path.insert(0, {repo!r})
import charmpandas_spark as cps
from pyspark.sql import functions as F

mode = {mode!r}
conf = {{
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}}
if mode == "bucketed":
    meta = tempfile.mkdtemp(prefix="cps_knee_probe_")
    conf.update({{
        "spark.sql.warehouse.dir": os.path.join(meta, "wh"),
        "javax.jdo.option.ConnectionURL":
            "jdbc:derby:;databaseName=" + os.path.join(meta, "db")
            + ";create=true",
        # bucketed scans satisfy the join's distribution for the
        # sort-merge strategy; SHJ preference would re-shuffle
        "spark.sql.join.preferSortMergeJoin": "true",
    }})
else:
    conf["spark.sql.join.preferSortMergeJoin"] = "false"
    if mode == "shuffle_x4":
        conf["spark.sql.shuffle.partitions"] = "128"
spark = cps.get_spark(extra_conf=conf)
# JVM/codegen warmup on synthetic data (never touches the fixture)
w1 = spark.range(0, 200_000, 1, 32).select(
    F.concat(F.lit("A"), F.col("id")).alias("first_name"),
    F.concat(F.lit("B"), F.col("id")).alias("last_name"),
    (F.col("id") % 101).cast("int").alias("age"))
w2 = spark.range(0, 200_000, 1, 32).select(
    F.concat(F.lit("A"), F.col("id")).alias("first_name"),
    F.concat(F.lit("B"), F.col("id")).alias("last_name"),
    F.col("id").cast("int").alias("user_id"),
    F.concat(F.lit("C"), (F.col("id") % 101)).alias("city"))
(w1.join(w2, ["first_name", "last_name"])
   .groupBy("city").agg(F.count("user_id")).toPandas())

if mode == "bucketed":
    spark.sql({ddl_ids!r})
    spark.sql({ddl_ages!r})
    ids = spark.table("cps_knee_ids")
    ages = spark.table("cps_knee_ages")
else:
    ids = spark.read.parquet({p1!r})
    ages = spark.read.parquet({p2!r})
joined = ages.join(ids, ["first_name", "last_name"], "inner")
agg = joined.groupBy("city").agg(
    F.count("user_id").alias("n"))
t0 = time.time()
res = agg.toPandas()
elapsed = time.time() - t0
assert int(res["n"].sum()) == {n}
# AQE-final plan (post-execution): count real shuffle exchanges —
# the bucketed config must show ONE (the 101-city groupBy; the join
# itself is exchange-free), baseline/shuffle_x4 show three
plan = agg._jdf.queryExecution().executedPlan().toString()
n_exchanges = plan.count("Exchange hashpartitioning")
load1 = open("/proc/loadavg").read().split()[0]
print(f"KNEE_RESULT {{elapsed:.3f}} {{load1}} {{n_exchanges}}")
spark.stop()
"""


def _bucketed_paths() -> tuple[str, str]:
    d = os.path.join(FIXTURE_ROOT, f"2x{N // 1_000_000}M_bucketed")
    return (os.path.join(d, "user_ids_b.parquet"),
            os.path.join(d, "ages_b.parquet"))


def ensure_bucketed() -> None:
    p1, p2 = _fixture(N)
    b1, b2 = _bucketed_paths()
    if (os.path.exists(os.path.join(b1, "_SUCCESS"))
            and os.path.exists(os.path.join(b2, "_SUCCESS"))):
        return
    ensure_fixture(N)
    code = _GEN_BUCKETED.format(repo=REPO, p1=p1, p2=p2, b1=b1,
                                b2=b2, buckets=BUCKETS)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=3600)
    if "GEN_OK" not in out.stdout:
        raise RuntimeError("bucketed fixture gen failed:\n"
                           + out.stderr[-2000:])


def one_run(mode: str) -> tuple[float, float, int]:
    p1, p2 = _fixture(N)
    b1, b2 = _bucketed_paths()
    cols_ids = ("first_name STRING, last_name STRING, "
                "user_id INT, city STRING")
    cols_ages = ("first_name STRING, last_name STRING, age INT")
    code = _RUNNER.format(
        repo=REPO, mode=mode, p1=p1, p2=p2, n=N,
        ddl_ids=_DDL.format(tbl="cps_knee_ids", cols=cols_ids,
                            buckets=BUCKETS, path=b1),
        ddl_ages=_DDL.format(tbl="cps_knee_ages", cols=cols_ages,
                             buckets=BUCKETS, path=b2))
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("KNEE_RESULT"):
            _, sec, load1, nex = line.split()
            return float(sec), float(load1), int(nex)
    raise RuntimeError(f"{mode} run failed:\n{out.stderr[-2000:]}")


def main():
    argv = sys.argv[1:]
    runs = 3
    out_path = None
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i:i + 2]
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]

    ensure_fixture(N)
    ensure_bucketed()
    doc = {"question": "DEMO_SCALE_r16 e(20M->100M)=1.09 — what "
                       "flattens it?",
           "configs": {
               "baseline": "32 shuffle partitions, SHJ (the "
                           "DEMO_SCALE runner config)",
               "shuffle_x4": "128 shuffle partitions, SHJ, same "
                             "fixture",
               "bucketed": f"{BUCKETS}-bucket (first_name,"
                           "last_name) external tables, SMJ, "
                           "exchange-free join (asserted from the "
                           "probe plan)"},
           "readings_sec": {}, "load1": {}, "exchanges": {},
           "warm_min_sec": {}, "labels": {}}
    for mode in ("baseline", "shuffle_x4", "bucketed"):
        dropped = drop_page_cache()
        rs, ls, labels, nexs = [], [], [], []
        for i in range(runs):
            if i > 0:
                try:
                    subprocess.run(["sync"], check=True, timeout=600)
                except Exception:
                    pass
            sec, load1, nex = one_run(mode)
            labels.append("cold" if i == 0 and dropped
                          else "warm?" if i == 0 else "warm")
            rs.append(round(sec, 3))
            ls.append(load1)
            nexs.append(nex)
            print(f"# {mode} run{i+1} [{labels[-1]}]: {sec:.3f}s "
                  f"(load1={load1}, {nex} exchanges)",
                  file=sys.stderr)
        doc["readings_sec"][mode] = rs
        doc["load1"][mode] = ls
        doc["labels"][mode] = labels
        doc["exchanges"][mode] = nexs[0]
        warm = [r for r, l in zip(rs, labels) if l.startswith("warm")]
        doc["warm_min_sec"][mode] = min(warm) if warm else None
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=2)


if __name__ == "__main__":
    main()
