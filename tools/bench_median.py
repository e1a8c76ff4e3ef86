"""Merge N bench.py runs into a per-query median exhibit.

This host shows intermittent hypervisor CPU-steal storms (OPTIMIZATION_
r12.md §Methodology) that can inflate individual children 3-15x; a
single full run is therefore not a faithful reading. This tool takes
the medians per query across runs — the same disclose-everything
posture as the r11 three-run exhibit — and emits a bench.py-shaped
JSON line plus a comparison table against a baseline run.

    python tools/bench_median.py out.json run1.json run2.json [...]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    out_path, *run_paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in run_paths]
    base = runs[0]
    merged = dict(base)
    for field in ("queries", "steady", "steady_spread"):
        merged[field] = {
            q: round(statistics.median(r[field][q] for r in runs), 3)
            for q in base[field]
        }
    merged["value"] = round(sum(merged["queries"].values()), 3)
    merged["steady_total"] = round(sum(merged["steady"].values()), 3)
    merged["comparable_total"] = round(
        sum(merged["queries"][q] for q in merged["comparable_set"]), 3)
    merged["median_of_runs"] = len(runs)
    merged["source_runs"] = run_paths
    with open(out_path, "w") as f:
        f.write(json.dumps(merged) + "\n")
    print(json.dumps({k: merged[k] for k in
                      ("value", "steady_total", "comparable_total",
                       "median_of_runs")}))


if __name__ == "__main__":
    main()
