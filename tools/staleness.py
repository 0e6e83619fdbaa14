"""Per-query driver-row staleness report (VERDICT r10 #9).

For every ``__spark_entry__.queries()`` entry, scan the committed
``CORRECTNESS_r*.json`` artifacts and report the LAST round in which
the driver checked it (and whether that row was green). The registry's
~50-entry driver window should lead with (1) queries changed this
round, (2) the SS2 core slice, (3) the stalest greens — this report
generates that ordering instead of a hand-maintained comment.

Usage:
    python tools/staleness.py            # full report, stalest first
    python tools/staleness.py --window N # suggested next-window tail
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def history() -> dict[str, tuple[int, bool]]:
    """query -> (last round with a driver row, was it green)."""
    seen: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", path)
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, row in data.items():
            green = bool(row.get("rows_match") and row.get("schema_match")
                         and row.get("hash_match", True)
                         and not row.get("err"))
            prev = seen.get(name)
            if prev is None or rnd >= prev[0]:
                seen[name] = (rnd, green)
    return seen


def window_suggestion(k: int = 50) -> list[str]:
    """The k stalest registry queries (round-ascending, then name) —
    the mechanical next-window tail after changed+core. Called by
    bench.py each round (VERDICT r11 #8) so rotation is applied from
    the tool's output rather than re-derived by hand."""
    import __spark_entry__ as entry_mod

    hist = history()
    rows = sorted((hist.get(n, (0, False))[0], n)
                  for n in entry_mod.queries())
    return [f"{n} (r{rnd})" for rnd, n in rows[:k]]


def main():
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    hist = history()
    rows = []
    for n in names:
        rnd, green = hist.get(n, (0, False))
        rows.append((rnd, n, green))
    rows.sort(key=lambda r: (r[0], r[1]))
    print(f"{'last-round':>10}  {'state':>6}  query")
    for rnd, n, green in rows:
        state = "never" if rnd == 0 else ("green" if green else "RED")
        print(f"{rnd:>10}  {state:>6}  {n}")
    reds = [n for rnd, n, green in rows if rnd and not green]
    never = [n for rnd, n, green in rows if not rnd]
    print(f"\n{len(rows)} registry queries; {len(never)} never driver-checked"
          f"{': ' + str(never) if never else ''}; "
          f"{len(reds)} red on latest row{': ' + str(reds) if reds else ''}")
    if "--window" in sys.argv:
        k = int(sys.argv[sys.argv.index("--window") + 1])
        print(f"\nstalest {k} (suggested window tail, after changed+core):")
        for rnd, n, green in rows[:k]:
            print(f"  {n}  (r{rnd})")


if __name__ == "__main__":
    main()
