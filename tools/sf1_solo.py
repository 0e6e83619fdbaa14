"""Solo sf1 probe re-measurement (VERDICT r11 #1 / #5).

Runs the named registry queries (or SF1_OVERRIDES variants) against
the local ``bench_sf1/`` fixture under the SOLO protocol their
expected table was derived under: a FRESH session per query, the
mini-warmup (shuffle path + Python worker pool), then ``--runs N``
consecutive timed runs (default 2). ALL run times are reported — the
min is the comparable "expected" figure, the spread is the variance
witness the r10 #6 protocol asks for.

Run this with nothing else on the host (no pytest, no other Spark
job): the committed r9-r11 history shows concurrent load inflates
these probes 2-7x and the inflated figures then get committed as
phantom scaling regressions.

Usage:
    python tools/sf1_solo.py [--runs N] [--out FILE] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    names = argv
    if not names:
        print("usage: sf1_solo.py [--runs N] [--out FILE] query ...",
              file=sys.stderr)
        sys.exit(2)

    import bench
    import __spark_entry__ as entry_mod
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.session import get_spark

    bench._ensure_sf1(bench.SF_DIR)
    qs = entry_mod.queries()
    results: dict[str, dict] = {}
    spark = get_spark(app_name="cps-sf1-solo",
                      extra_conf={"spark.ui.enabled": "true"})
    for name in names:
        fn = bench.SF1_OVERRIDES.get(name) or qs.get(name)
        if fn is None:
            results[name] = {"err": "unknown query"}
            continue
        spark = bench._fresh_session(spark)
        bench._mini_warm(spark)
        times, rows = [], 0
        for _ in range(runs):
            try:
                t0 = time.time()
                df = fn(spark, bench.SF1_DIR)
                rows = len(df.toPandas())
                times.append(round(time.time() - t0, 3))
                release(df)
                spark.catalog.clearCache()
                bench._cleanup_entry(spark)
            except Exception as exc:
                results[name] = {
                    "err": f"{type(exc).__name__}: {exc}"[:200],
                    "runs": times}
                break
        else:
            exp = bench.SF1_QUERIES.get(name)
            results[name] = {"runs": times, "min": min(times),
                             "rows": rows, "expected": exp}
            flag = ""
            if exp and min(times) > 2.0 * exp:
                flag = f"  ** >2x expected {exp} **"
            print(f"# {name}: {times} min={min(times):.2f}s "
                  f"({rows} rows){flag}", file=sys.stderr)
    spark.stop()
    doc = {"protocol": f"solo fresh-session, mini-warm, {runs} runs",
           "results": results}
    line = json.dumps(doc, indent=2)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
