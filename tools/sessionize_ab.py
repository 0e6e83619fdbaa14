"""Sessionize drain A/B: applyInPandasWithState vs native
session_window (VERDICT r14 #1).

``STREAMING_BUDGET_SF5_r14.json`` showed the Python-stateful
sessionize as the ONE streaming drain that grows with data
(9.8 -> 40.3 -> 133.2 s at sf0.1/sf1/sf5, exponent ~0.67) while the
JVM-state drains stay flat; the docs routed the 100 TB case to the
native ``session_window`` path, but that routing was prose. This tool
measures it: for each sf dir it builds the time-ordered replay
fixture ONCE, then drains BOTH variants from the same source files
(same micro-batch sequence, same watermark, same sentinel batches),
timing the DRAIN phase only (fixture prep is identical and not under
test), and asserts the two variants' closed-session tables are
IDENTICAL before reporting — a speed number for a wrong answer is
not a result.

Usage:
    python tools/sessionize_ab.py [--out FILE] [sf_dir ...]
Defaults to sf0.1 + bench_sf1 + bench_sf5.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GAP_MS = 4 * 3600 * 1000


def _load() -> float:
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except OSError:
        return -1.0


def run_ab(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from charmpandas_spark.streaming.stateful import sessionize_stream
    from charmpandas_spark.streaming.windows import (
        sessionize_stream_native, stream_from_parquet)
    from charmpandas_spark.timestamps import epoch_micros

    ev = e._t(spark, sf_dir, "events").sdf.select(
        "user_id", "ts",
        (epoch_micros("ts") / 1000).cast("long").alias("ts_ms"))

    def sentinel(ms: int):
        return spark.range(1).select(
            F.lit(-1).cast("long").alias("user_id"),
            F.timestamp_millis(F.lit(ms)).alias("ts"),
            F.lit(ms).cast("long").alias("ts_ms"))

    # fixture ONCE; recover its source dir from the stream's plan-free
    # handle by rebuilding a reader per variant over the same files
    t0 = time.time()
    stream, name0 = e._replay_stream_ordered(spark, ev, "sessab",
                                             "ts_ms", sentinel)
    fixture_sec = round(time.time() - t0, 2)
    src = e._tmp_sink("sessab_src")

    out: dict = {"sf_dir": sf_dir, "fixture_sec": fixture_sec,
                 "variants": {}}
    frames = {}
    for tag, op in (("stateful", sessionize_stream),
                    ("native", sessionize_stream_native)):
        st = (stream if not frames  # first variant uses the fresh one
              else stream_from_parquet(spark, src,
                                       max_files_per_trigger=1))
        sink = f"{name0}_{tag}"
        t0 = time.time()
        e._run_stream(spark, op(st, GAP_MS), sink, "append")
        drain = round(time.time() - t0, 2)
        pdf = (spark.table(sink).where("user_id >= 0")
               .select("user_id", "start_ms", "end_ms", "n_events")
               .toPandas()
               .sort_values(["user_id", "start_ms"])
               .reset_index(drop=True))
        frames[tag] = pdf
        out["variants"][tag] = {"drain_sec": drain, "rows": len(pdf),
                                "load1": _load()}
        spark.catalog.clearCache()
    out["identical_output"] = bool(
        frames["stateful"].equals(frames["native"]))
    s, n = (out["variants"]["stateful"]["drain_sec"],
            out["variants"]["native"]["drain_sec"])
    out["native_speedup_x"] = round(s / n, 2) if n else None
    return out


def main():
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i:i + 2]
    sf_dirs = argv or ["/root/testdata/sf0.1",
                       os.path.join(REPO, "bench_sf1"),
                       os.path.join(REPO, "bench_sf5")]

    from charmpandas_spark.session import get_spark

    spark = get_spark(app_name="cps-sessionize-ab")
    # warm the python worker pool so pool spawn doesn't land inside
    # the stateful variant's first drain
    spark.range(0, 3200, 1, 32).mapInPandas(
        lambda it: it, "id long").count()
    doc = {"tool": "tools/sessionize_ab.py (shared fixture, drain-only"
                   " timing, output-identity asserted per point)",
           "gap_ms": GAP_MS, "points": []}
    for d in sf_dirs:
        r = run_ab(spark, d)
        doc["points"].append(r)
        print(f"# {d}: stateful "
              f"{r['variants']['stateful']['drain_sec']}s vs native "
              f"{r['variants']['native']['drain_sec']}s "
              f"(identical={r['identical_output']}, "
              f"{r['variants']['native']['rows']} sessions)",
              file=sys.stderr)
    spark.stop()
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=2)
    print(json.dumps(doc))
    sys.exit(0 if all(p["identical_output"] for p in doc["points"])
             else 1)


if __name__ == "__main__":
    main()
