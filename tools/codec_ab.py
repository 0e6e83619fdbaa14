"""A/B the shuffle/spill compression codec (guide: "there is no
universal answer — measure shuffle bytes written and stage time with
each").

``spark.io.compression.codec`` covers shuffle blocks, spill files and
broadcast blocks. Default lz4 optimizes for CPU; zstd for ratio. On
local[32] the "network" is loopback + page cache, so the ratio buys
little and the CPU cost is exposed — the cluster translation (where
the shuffle crosses real NICs and the ratio is the lever) is the
reason the knob stays env-parameterised either way.

Protocol: per codec, ONE fresh session (mini-warm) then ``--runs``
consecutive timed runs per query, min reported (same shape as
tools/solo_witness.py). Codecs alternate legs in one process run so
both see the same host window; the FIRST codec listed runs first and
therefore at the cooler start — order the incumbent first so the
comparison is conservative for the challenger.

Usage:
    python tools/codec_ab.py --runs 4 --out CODEC_AB_r17.json \
        --codecs lz4,zstd graph_pagerank dedup_jaccard_prefix ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _host_load() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return -1.0


def _mini_warm(spark):
    nation = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    (nation.join(region, nation.n_regionkey == region.r_regionkey)
     .groupBy("r_name").count().toPandas())
    spark.range(0, 3200, 1, 32).mapInPandas(lambda it: it,
                                            "id long").count()


def main() -> None:
    argv = sys.argv[1:]
    runs, out_path, codecs = 4, None, ["lz4", "zstd"]
    if "--runs" in argv:
        i = argv.index("--runs"); runs = int(argv[i + 1]); del argv[i:i + 2]
    if "--out" in argv:
        i = argv.index("--out"); out_path = argv[i + 1]; del argv[i:i + 2]
    if "--codecs" in argv:
        i = argv.index("--codecs")
        codecs = argv[i + 1].split(","); del argv[i:i + 2]
    names = argv
    # fail fast (ADVICE r17): runs < 1 would leave every per-query
    # min() empty and the ratio block below would blow up only AFTER
    # the expensive legs already ran
    if runs < 1:
        print("codec_ab: --runs must be >= 1", file=sys.stderr)
        sys.exit(2)
    if not names:
        print("codec_ab: no query names given", file=sys.stderr)
        sys.exit(2)
    import __spark_entry__ as entry_mod
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.session import get_spark

    qs = entry_mod.queries()
    result = {"protocol": f"one fresh session per codec, mini-warm, "
                          f"{runs} consecutive timed runs per query, "
                          f"min reported; sf0.1 ({SF_DIR})",
              "codecs": {}}
    for codec in codecs:
        spark = get_spark(app_name=f"cps-codec-{codec}",
                          extra_conf={"spark.io.compression.codec":
                                      codec})
        _mini_warm(spark)
        leg: dict = {"start_load1": _host_load(), "queries": {}}
        for name in names:
            fn = qs[name]
            times = []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(
                    f"codec_ab {codec} {name}")
                t0 = time.time()
                df = fn(spark, SF_DIR)
                n = len(df.toPandas())
                times.append(round(time.time() - t0, 3))
                release(df)
                spark.catalog.clearCache()
            leg["queries"][name] = {"runs": times,
                                    "min": min(times), "rows": n,
                                    "load1": _host_load()}
            print(f"# {codec} {name}: {times} min={min(times)}",
                  file=sys.stderr)
        result["codecs"][codec] = leg
        spark.stop()
        time.sleep(3)
    base = codecs[0]
    # guard the division (ADVICE r17): a degenerate 0.0 s min (e.g. a
    # sub-ms query rounding down) must not crash after the legs ran
    result["ratio_vs_" + base] = {
        c: {n: round(result["codecs"][c]["queries"][n]["min"]
                     / max(result["codecs"][base]["queries"][n]["min"],
                           1e-4), 3)
            for n in names}
        for c in codecs[1:]}
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result["ratio_vs_" + base]))


if __name__ == "__main__":
    main()
