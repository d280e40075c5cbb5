"""Measure this VM's effective CPU capacity and hypervisor steal — the
hardware context quoted in BENCH/BASELINE.md's scaling-efficiency analysis.

Two measurements:
1. Spin-loop scaling: P parallel pure-Python busy loops for a fixed wall
   window, at P = 1, 8, 16, 32. On an uncontended 32-core box total
   iterations grow ~linearly to 32; a flattening curve shows the effective
   core count (iters(32)/iters(1) ~= usable cores).
2. /proc/stat steal: cumulative ticks the hypervisor withheld from this
   guest, sampled before/after the spin runs.

Usage: python tools/measure_steal.py [--seconds 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _spin(seconds: float, out, idx: int) -> None:
    end = time.monotonic() + seconds
    n = 0
    x = 1
    while time.monotonic() < end:
        for _ in range(10_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 10_000
    out[idx] = n


def spin_total(procs: int, seconds: float) -> tuple[int, int]:
    """-> (total iterations, best single-process iterations)."""
    out = mp.Array("q", procs)
    ps = [mp.Process(target=_spin, args=(seconds, out, i))
          for i in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return int(sum(out)), int(max(out))


def read_steal_ticks() -> int | None:
    try:
        with open("/proc/stat") as fh:
            first = fh.readline().split()
        # cpu user nice system idle iowait irq softirq steal ...
        return int(first[8]) if len(first) > 8 else None
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--levels", type=int, nargs="*", default=[1, 8, 16, 32])
    args = ap.parse_args()

    steal_before = read_steal_ticks()
    t0 = time.monotonic()
    totals: dict[int, int] = {}
    best_single = 0
    for p in args.levels:
        total, single = spin_total(p, args.seconds)
        totals[p] = total
        best_single = max(best_single, single)
    wall = time.monotonic() - t0
    steal_after = read_steal_ticks()

    # Baseline = the FASTEST single process observed at ANY level, not the
    # 1-core probe alone: a steal burst during the baseline window would
    # otherwise inflate every effective-core estimate (a 12 s probe once
    # reported "79 effective cores of 32" exactly that way).
    iters = totals
    effective = {p: round(totals[p] / best_single, 2) for p in args.levels}
    tick_hz = os.sysconf("SC_CLK_TCK")
    steal_sec = (None if steal_before is None or steal_after is None
                 else (steal_after - steal_before) / tick_hz)
    print(json.dumps({
        "advertised_cpus": os.cpu_count(),
        "spin_seconds_per_level": args.seconds,
        "iters_per_level": iters,
        "effective_cores_at_level": effective,
        "steal_sec_during_run": steal_sec,
        "steal_ticks_cumulative": steal_after,
        "wall_sec": round(wall, 2),
    }))


if __name__ == "__main__":
    main()
