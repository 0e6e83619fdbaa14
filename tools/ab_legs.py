"""Interleaved same-host solo A/B harness (the house protocol for
valid perf evidence — VERDICT r17 audit): alternating fresh-process
solo_witness legs between a PRE worktree (committed baseline code)
and the POST working tree, so each variant is bracketed by the
other's host state and host drift cannot masquerade as a win. A win
is claimed only when the post legs beat BOTH bracketing pre legs.

Usage:
    python tools/ab_legs.py --pre /root/r17pre --legs 4 --runs 4 \
        --out AB_r18.json query [query ...]

Each leg: ``sync``, then a fresh ``python tools/solo_witness.py
--runs N <queries>`` in the leg's tree (fresh session, mini-warm, N
consecutive timed runs, all times + load1 recorded).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(tree: str, names: list[str], runs: int) -> dict:
    subprocess.run(["sync"], check=False)
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "tools", "solo_witness.py"),
         "--runs", str(runs)] + names,
        capture_output=True, text=True, cwd=tree,
        env={**os.environ, "SPARK_GRAFT_BENCH_SOLO": "0"})
    if out.returncode != 0:
        return {"err": out.stderr[-2000:]}
    doc = json.loads(out.stdout)
    return doc.get("results", doc)


def main() -> None:
    argv = sys.argv[1:]
    pre, legs, runs, out_path = None, 4, 4, None
    if "--pre" in argv:
        i = argv.index("--pre"); pre = argv[i + 1]; del argv[i:i + 2]
    if "--legs" in argv:
        i = argv.index("--legs"); legs = int(argv[i + 1]); del argv[i:i + 2]
    if "--runs" in argv:
        i = argv.index("--runs"); runs = int(argv[i + 1]); del argv[i:i + 2]
    if "--out" in argv:
        i = argv.index("--out"); out_path = argv[i + 1]; del argv[i:i + 2]
    names = argv
    if not pre or not names:
        print("usage: ab_legs.py --pre DIR [--legs N] [--runs N] "
              "[--out F] query ...", file=sys.stderr)
        sys.exit(2)

    doc = {"what": ("Interleaved same-host solo A/B: alternating "
                    f"pre ({pre}) / post ({HERE}) legs, fresh process "
                    f"per leg, solo_witness protocol ({runs} runs), "
                    "sync before each leg."),
           "legs": []}
    for leg in range(1, legs + 1):
        code = "pre" if leg % 2 == 1 else "post"
        tree = pre if code == "pre" else HERE
        t0 = time.time()
        res = run_leg(tree, names, runs)
        doc["legs"].append({"leg": leg, "code": code, "results": res,
                            "leg_sec": round(time.time() - t0, 1)})
        print(f"# leg {leg} ({code}): "
              + json.dumps({k: (v.get('min') if isinstance(v, dict)
                                else v) for k, v in res.items()}),
              file=sys.stderr)
    # summary: per query, min over pre legs vs min over post legs
    summary = {}
    for name in names:
        pre_mins = [l["results"][name]["min"] for l in doc["legs"]
                    if l["code"] == "pre"
                    and isinstance(l["results"].get(name), dict)
                    and "min" in l["results"][name]]
        post_mins = [l["results"][name]["min"] for l in doc["legs"]
                     if l["code"] == "post"
                     and isinstance(l["results"].get(name), dict)
                     and "min" in l["results"][name]]
        if pre_mins and post_mins:
            summary[name] = {
                "pre_min": min(pre_mins), "post_min": min(post_mins),
                "ratio": round(min(post_mins) / min(pre_mins), 3),
                "post_beats_all_pre_legs":
                    max(post_mins) < min(pre_mins) if post_mins else None}
    doc["summary"] = summary
    line = json.dumps(doc, indent=1)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
