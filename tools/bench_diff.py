#!/usr/bin/env python3
"""Round-over-round bench regression diff.

Usage: tools/bench_diff.py OLD.json NEW.json [ratio_threshold]

Compares two bench artifacts (bench_full.json / BENCH_r*.json):
per-query wall ratios on the shared set, added/removed queries, and
a co-tenant-load sanity line for each artifact (os_load1_end vs
cpu_proc_avg*cpus — a hot box makes wall ratios untrustworthy; see
the r8/r11 verdicts). Exits 1 if any shared query regressed beyond
the threshold (default 2.0x) on BOTH-quiet artifacts, so the round
workflow can gate on it.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def loadline(b):
    cpus = b.get("cpus", 0) or 0
    load1 = b.get("os_load1_end", -1)
    cpu = b.get("cpu_proc_avg", -1)
    own = cpu * cpus if cpu and cpu > 0 else 0
    hot = cpus and load1 > own + 0.25 * cpus
    return hot, f"load1_end={load1} vs own~{own:.1f} of {cpus} cpus" + (
        "  << HOT BOX: ratios suspect" if hot else "  (quiet)")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    oq = {k: v for k, v in old["queries"].items() if v >= 0}
    nq = {k: v for k, v in new["queries"].items() if v >= 0}
    shared = sorted(set(oq) & set(nq))
    hot_old, l_old = loadline(old)
    hot_new, l_new = loadline(new)
    print(f"old: {sys.argv[1]}  {l_old}")
    print(f"new: {sys.argv[2]}  {l_new}")
    print(f"shared {len(shared)}  added {sorted(set(nq) - set(oq))}  "
          f"removed {sorted(set(oq) - set(nq))}")
    tot_o = sum(oq[k] for k in shared)
    tot_n = sum(nq[k] for k in shared)
    print(f"shared totals: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)")
    moved = sorted(((nq[k] / oq[k], k) for k in shared if oq[k] > 0.05),
                   reverse=True)
    regressed = [(r, k) for r, k in moved if r >= thr and nq[k] > 0.3]
    print("\nworst ratios (new/old):")
    for r, k in moved[:10]:
        print(f"  {r:5.2f}x  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s")
    print("\nbest ratios:")
    for r, k in sorted(moved)[:5]:
        print(f"  {r:5.2f}x  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s")
    if regressed:
        tag = ("suspect (hot box)" if hot_old or hot_new else "REGRESSED")
        print(f"\n{tag} beyond {thr}x: "
              + ", ".join(f"{k}({r:.1f}x)" for r, k in regressed))
        if not (hot_old or hot_new):
            sys.exit(1)


if __name__ == "__main__":
    main()
