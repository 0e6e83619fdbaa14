"""Attribute streaming drain cost: fixture prep vs micro-batch drain
(VERDICT r10 #8 stretch).

The bench streaming block times each query END-TO-END, which folds
three very different costs into one number:

1. replay-fixture prep: approxQuantile cut points + one coalesce(1)
   write per time slice + sentinel writes (batch jobs on the events
   table, BEFORE any streaming starts);
2. the micro-batch drain itself (availableNow trigger over
   max_files_per_trigger=1 sources — state store, watermark, python
   state workers);
3. the final memory-sink fetch.

This script runs the two most expensive drains with the phases timed
separately by monkeypatching the fixture builder and the stream
runner, so "state-store tuning" work is aimed at the phase that
actually dominates.

Usage: python tools/streaming_budget.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else \
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    import __spark_entry__ as entry_mod
    from charmpandas_spark.session import get_spark

    spark = get_spark(app_name="cps-stream-budget")
    # warm the python worker pool so pool-spawn doesn't land in the
    # first measured phase
    spark.range(0, 3200, 1, 32).mapInPandas(
        lambda it: it, "id long").count()

    phases: dict[str, float] = {}

    def timed(label, fn):
        def wrap(*a, **kw):
            t0 = time.time()
            out = fn(*a, **kw)
            phases[label] = phases.get(label, 0.0) + time.time() - t0
            return out
        return wrap

    real_replay = entry_mod._replay_stream_ordered
    real_run = entry_mod._run_stream

    for qname in ("streaming_stream_join_full", "streaming_sessionize",
                  "streaming_stream_join", "streaming_dedup"):
        phases.clear()
        entry_mod._replay_stream_ordered = timed("fixture", real_replay)
        if hasattr(entry_mod, "_replay_stream"):
            real_replay2 = entry_mod._replay_stream
            entry_mod._replay_stream = timed("fixture", real_replay2)
        entry_mod._run_stream = timed("drain", real_run)
        try:
            t0 = time.time()
            df = entry_mod.queries()[qname](spark, SF_DIR)
            n = len(df.toPandas())
            total = time.time() - t0
        finally:
            entry_mod._replay_stream_ordered = real_replay
            if hasattr(entry_mod, "_replay_stream"):
                entry_mod._replay_stream = real_replay2
            entry_mod._run_stream = real_run
        fix = phases.get("fixture", 0.0)
        drn = phases.get("drain", 0.0)
        print(f"{qname}: total={total:.2f}s fixture={fix:.2f}s "
              f"drain={drn:.2f}s fetch+rest={total - fix - drn:.2f}s "
              f"({n} rows)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
