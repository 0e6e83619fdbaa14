"""Solo sf0.1 re-witness for main-sweep bench entries (VERDICT r12
#1b / #6).

The main sweep's committed numbers are single contended readings; when
one lands far above its own history (r12: join_inner 2.10 s vs 0.85
best, url_domain_filter 3.42 vs 1.76 judge-warm) the honest figure is
a SOLO fresh-session warm floor, measured with nothing else on the
host. This tool runs the named registry queries against the sf0.1
testdata under the same protocol as ``tools/sf1_solo.py`` (fresh
session per query, mini-warmup, ``--runs N`` consecutive timed runs,
ALL times reported), and compares the min against the committed prior
(min across the last 3 BENCH_r*.json + BENCH_FULL.json — exactly the
table the sweep's relative noise-retry uses, via
``bench._load_prior_timings``).

Usage:
    python tools/solo_witness.py [--runs N] [--out FILE] query ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = sys.argv[1:]
    runs = 3
    out_path = None
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i:i + 2]
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i:i + 2]
    names = argv
    if not names:
        print("usage: solo_witness.py [--runs N] [--out FILE] query ...",
              file=sys.stderr)
        sys.exit(2)

    import bench
    import __spark_entry__ as entry_mod
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.session import get_spark

    qs = entry_mod.queries()
    priors = bench._load_prior_timings()
    results: dict[str, dict] = {}
    spark = get_spark(app_name="cps-solo-witness")
    for name in names:
        fn = qs.get(name)
        if fn is None:
            results[name] = {"err": "unknown query"}
            continue
        spark = bench._fresh_session(spark)
        bench._mini_warm(spark)
        times, rows, loads = [], 0, []
        for _ in range(runs):
            try:
                t0 = time.time()
                df = fn(spark, bench.SF_DIR)
                rows = len(df.toPandas())
                times.append(round(time.time() - t0, 3))
                loads.append(bench._host_load().get("load1"))
                release(df)
                spark.catalog.clearCache()
                bench._cleanup_entry(spark)
            except Exception as exc:
                results[name] = {
                    "err": f"{type(exc).__name__}: {exc}"[:200],
                    "runs": times}
                break
        else:
            prior = priors.get(name)
            results[name] = {"runs": times, "min": min(times),
                             "rows": rows, "committed_prior": prior,
                             # one load1 sample per run (VERDICT r13
                             # #2): witness readings carry their own
                             # contention evidence
                             "load1": loads}
            flag = ""
            if prior and min(times) > 2.0 * prior:
                flag = f"  ** >2x committed prior {prior} **"
            print(f"# {name}: {times} min={min(times):.2f}s "
                  f"({rows} rows){flag}", file=sys.stderr)
    spark.stop()
    doc = {"protocol": f"solo fresh-session, mini-warm, {runs} runs, "
                       f"sf0.1 ({bench.SF_DIR})",
           "results": results}
    line = json.dumps(doc, indent=2)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
