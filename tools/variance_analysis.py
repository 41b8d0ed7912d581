#!/usr/bin/env python3
"""Quiet-band variance analysis (r20, TUNING.md): compare per-query walls
across same-code back-to-back quiet bench runs, default harness vs the
forced-GC arm (SPARK_GRAFT_BENCH_GC=1).

Usage: variance_analysis.py A.json B.json C.json D.json
  A,B = default arm; C,D = forced-GC arm. Prints per-arm totals, the
  per-query band (|a-b| and ratio) for the widest queries in each arm, and
  the arm-level spread summary.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def band(qa, qb, min_wall=0.15):
    rows = []
    for k in qa:
        if k not in qb:
            continue
        va, vb = qa[k], qb[k]
        if not isinstance(va, (int, float)) or not isinstance(vb, (int, float)):
            continue
        hi, lo = max(va, vb), min(va, vb)
        if hi < min_wall:
            continue
        rows.append((hi - lo, hi / max(lo, 1e-9), k, va, vb))
    rows.sort(reverse=True)
    return rows


def main():
    a, b, c, d = (load(p) for p in sys.argv[1:5])
    for name, run in zip("ABCD", (a, b, c, d)):
        gc = run.get("jvm_gc_ms_total")
        print(f"run {name}: total={run['value']:.1f}s cpu={run.get('cpu_s') or run.get('cpu_total_s')}"
              f" gc_ms={gc} contended={run.get('contended')}")
    for label, (x, y) in (("default A-B", (a, b)), ("forced-GC C-D", (c, d))):
        rows = band(x["queries"], y["queries"])
        deltas = [r[0] for r in rows]
        print(f"\n{label}: queries>=0.15s n={len(rows)}"
              f" sum|delta|={sum(deltas):.2f}s"
              f" p50={sorted(deltas)[len(deltas)//2]:.3f}"
              f" p90={sorted(deltas)[int(len(deltas)*0.9)]:.3f}")
        for r in rows[:10]:
            print(f"  {r[2]:35s} {r[3]:6.2f} vs {r[4]:6.2f}  delta={r[0]:5.2f} ratio={r[1]:.2f}")


if __name__ == "__main__":
    main()
