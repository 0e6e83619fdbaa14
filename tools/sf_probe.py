"""Generalized solo scale-point probe (r17; VERDICT r16 #5/#7).

Runs named registry queries against ANY sf dir (``--sf-dir``; the
``bench_sf1``/``bench_sf5`` fixtures are ensured automatically when
named) under the solo protocol: fresh session per query, mini-warm,
``--runs N`` consecutive timed runs, ALL times + a per-run load1
sample reported. This subsumes the ad-hoc inline scripts the sf5
re-bases were measured with — one committed tool, one protocol.

``streaming_dedup_neardup`` is probed through its ``_legs`` hook, so
every reading records the ENGINE leg (index write + drain + sink
read) separately from the exact truth-join oracle leg — the scaling
exponent of the engine is not masked by the truth join's pair count
growing ~rows^2 (118/1132/5633 fixture pairs at sf0.1/1/5).

Run with nothing else on the host; the tool refuses (exit 3) when
load1 exceeds ``--max-load`` (default 8.0) at start, because a
loaded-host "floor" committed as a band is a phantom regression
factory (r16 lesson: the first sf5 probes ran at load1 20-25).

Usage:
    python tools/sf_probe.py --sf-dir bench_sf5 [--runs N]
        [--max-load L] [--out FILE] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    argv = sys.argv[1:]
    runs, out_path, max_load = 3, None, 8.0
    sf_dir = None
    for flag, cast in (("--runs", int), ("--out", str),
                       ("--max-load", float), ("--sf-dir", str)):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i:i + 2]
            if flag == "--runs":
                runs = v
            elif flag == "--out":
                out_path = v
            elif flag == "--max-load":
                max_load = v
            else:
                sf_dir = v
    names = argv
    if not names or sf_dir is None:
        print("usage: sf_probe.py --sf-dir DIR [--runs N] "
              "[--max-load L] [--out FILE] query ...",
              file=sys.stderr)
        sys.exit(2)

    import bench
    import __spark_entry__ as entry_mod
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.session import get_spark

    load1 = bench._host_load().get("load1")
    if load1 is not None and load1 > max_load:
        print(f"REFUSING: load1 {load1} > --max-load {max_load} — "
              f"a loaded-host floor is a phantom-regression factory",
              file=sys.stderr)
        sys.exit(3)

    base = os.path.basename(sf_dir.rstrip("/"))
    if base == "bench_sf1":
        bench._ensure_sf1(bench.SF_DIR)
        sf_dir = bench.SF1_DIR
    elif base == "bench_sf5":
        bench._ensure_sf5(bench.SF_DIR)
        if set(names) & bench.SF5_TPCH_QUERIES:
            bench._ensure_sf5_tpch(bench.SF_DIR)
        if set(names) & bench.SF5_EVENTS_QUERIES:
            bench._ensure_sf5_events(bench.SF_DIR)
        sf_dir = bench.SF5_DIR

    qs = entry_mod.queries()
    results: dict[str, dict] = {}
    spark = get_spark(app_name="cps-sf-probe")
    for name in names:
        fn = qs.get(name)
        if fn is None:
            results[name] = {"err": "unknown query"}
            continue
        spark = bench._fresh_session(spark)
        bench._mini_warm(spark)
        rows_out, recs = 0, []
        for _ in range(runs):
            legs: dict = {}
            try:
                t0 = time.time()
                if name == "streaming_dedup_neardup":
                    df = entry_mod.q_streaming_dedup_neardup(
                        spark, sf_dir, _legs=legs)
                else:
                    df = fn(spark, sf_dir)
                rows_out = len(df.toPandas())
                total = round(time.time() - t0, 3)
                rec = {"sec": total,
                       "load1": bench._host_load().get("load1")}
                if "engine" in legs:
                    rec["engine_sec"] = legs["engine"]
                    rec["oracle_sec"] = round(
                        total - legs["engine"], 3)
                recs.append(rec)
                release(df)
                spark.catalog.clearCache()
                bench._cleanup_entry(spark)
            except Exception as exc:
                results[name] = {
                    "err": f"{type(exc).__name__}: {exc}"[:200],
                    "runs": recs}
                break
        else:
            secs = [r["sec"] for r in recs]
            results[name] = {"runs": recs, "min": min(secs),
                             "rows": rows_out}
            eng = [r["engine_sec"] for r in recs
                   if "engine_sec" in r]
            if eng:
                results[name]["engine_min"] = min(eng)
            print(f"# {name}: {secs} min={min(secs):.2f}s "
                  f"({rows_out} rows)"
                  + (f" engine_min={min(eng):.2f}s" if eng else ""),
                  file=sys.stderr)
    spark.stop()
    doc = {"protocol": f"solo fresh-session, mini-warm, {runs} runs, "
                       f"start load1 {load1}",
           "sf_dir": sf_dir, "results": results}
    line = json.dumps(doc, indent=2)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
