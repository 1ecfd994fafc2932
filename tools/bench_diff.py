#!/usr/bin/env python
"""Compare two bench outputs per query.

Usage: python tools/bench_diff.py OLD NEW [--threshold 1.3]

OLD/NEW are files containing a bench JSON line (a BENCH_r{N}.json
driver record — the ``tail`` field is parsed if the top level isn't a
bench line — or bench.py's own stdout). Prints per-query ratios
sorted worst-first and exits 1 if any shared query regressed beyond
the threshold — the local twin of the driver's round-over-round
comparison, so a regression is visible before a round ends.
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = {}
        for line in reversed(text.strip().splitlines()):
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in cand:
                d = cand
                break
    if "queries" in d:
        return {k: float(v) for k, v in d["queries"].items()}
    # driver record: the bench line may be truncated inside "tail" —
    # recover every complete "name": value pair
    tail = d.get("tail", "")
    pairs = re.findall(r'"([a-zA-Z0-9_]+)":\s*([0-9.]+)', tail)
    out: dict[str, float] = {}
    for k, v in pairs:
        if k not in ("value", "sf", "n", "rc", "cpus"):
            out[k] = float(v)
    return out


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    threshold = 1.3
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
    old = load_queries(sys.argv[1])
    new = load_queries(sys.argv[2])
    shared = sorted(set(old) & set(new))
    rows = [(new[q] / max(old[q], 1e-9), old[q], new[q], q) for q in shared]
    regressions = 0
    for ratio, o, n, q in sorted(rows, reverse=True):
        flag = " <-- REGRESSION" if ratio > threshold else ""
        if ratio > threshold:
            regressions += 1
        print(f"{ratio:6.2f}x  {o:7.3f} -> {n:7.3f}  {q}{flag}")
    print(
        f"shared={len(shared)} old_total={sum(old[q] for q in shared):.2f} "
        f"new_total={sum(new[q] for q in shared):.2f} "
        f"regressions(>{threshold}x)={regressions}"
    )
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
