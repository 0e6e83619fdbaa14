"""Audit the physical plans of every registered query.

Prints, per query: shuffle count, join strategies, scan column widths,
pushed filters, codegen stages. Use while iterating on operators —
"the plan you'd want, not the first one that passed".

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    import json

    import __spark_entry__ as entry_mod
    from charmpandas_spark.functions.dedup import release
    from charmpandas_spark.plans.explain import plan_report
    from charmpandas_spark.session import get_spark

    argv = sys.argv[1:]
    as_json = "--json" in argv
    if as_json:
        argv.remove("--json")
    spark = get_spark(app_name="plan-audit", master="local[8]",
                      shuffle_partitions=8)
    only = set(argv)
    out = {}
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            # execute: finalizes AQE plans so codegen counts are the
            # real ones (sf0.01 here — cheap); the audit is explicitly
            # a query-running diagnostic
            r = plan_report(df, execute_for_codegen=True)
            release(df)
            if as_json:
                out[name] = {
                    "exchanges": r["exchanges"],
                    "codegen_stages": r["codegen_stages"],
                    "scan_widths": [len(c) for c in r["scan_columns"]],
                    "joins": r["joins"],
                    "pushed_filters": len(r["pushed_filters"]),
                }
                continue
            scans = "/".join(str(len(c)) for c in r["scan_columns"])
            joins = ",".join(r["joins"]) or "-"
            pf = len(r["pushed_filters"])
            print(f"{name:28s} exch={r['exchanges']:2d} "
                  f"codegen={r['codegen_stages']:2d} scans[cols]={scans:8s} "
                  f"joins={joins} pushed={pf}")
        except Exception as e:
            if as_json:
                out[name] = {"error": str(e)[:200]}
            else:
                print(f"{name:28s} ERROR {e}")
    if as_json:
        print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
