"""Interleaved fresh-JVM A/B between two checkouts, per query.

Runs `python <tree>/bench.py --child <query>` alternating A B A B ... so
slow host drift hits both arms equally; each child is a fresh JVM with
the bench's own warmup, so the numbers are directly comparable to the
driver's bench children.

    python tools/child_ab.py <treeA> <treeB> q_name1 [q_name2 ...] [--reps N]

Prints per-query medians of cold and steady (median of reps[2:]) for
both arms. Measurement harness only — never imported by the engine.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_child(tree: str, name: str, env: dict) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py"), "--child", name],
        capture_output=True, text=True, env=env, timeout=600, cwd=tree,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise RuntimeError(f"child failed: {tree} {name}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def steady_of(rec: dict) -> float:
    tail = sorted(rec["reps"][2:])
    n = len(tail)
    return tail[n // 2] if n % 2 else round((tail[n // 2 - 1] + tail[n // 2]) / 2, 3)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 5
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    tree_a, tree_b, *names = args
    env = os.environ.copy()
    for name in names:
        a_cold, b_cold, a_st, b_st = [], [], [], []
        for r in range(reps):
            ra = run_child(tree_a, name, env)
            rb = run_child(tree_b, name, env)
            a_cold.append(ra["cold"]); a_st.append(steady_of(ra))
            b_cold.append(rb["cold"]); b_st.append(steady_of(rb))
            print(f"#   rep{r}: A cold {ra['cold']:.2f} steady {a_st[-1]:.2f}"
                  f" | B cold {rb['cold']:.2f} steady {b_st[-1]:.2f}",
                  file=sys.stderr, flush=True)
        mac, mbc = statistics.median(a_cold), statistics.median(b_cold)
        mas, mbs = statistics.median(a_st), statistics.median(b_st)
        print(f"{name:24s} cold A {mac:6.2f} B {mbc:6.2f} ({mbc/mac:4.2f}x)"
              f" | steady A {mas:6.3f} B {mbs:6.3f} ({mbs/max(mas,1e-9):4.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
