#!/usr/bin/env python3
"""Scale-slope table: per-family wall-time ratios between two bench
artifacts of the SAME code at different scale factors (r18 verdict #5).

Usage: tools/scale_slope.py SMALL.json BIG.json DATA_RATIO [out.json]

Every plan-shape scale claim in SURVEY ("banded, never all-pairs",
"vocab-scale, not corpus-scale") predicts a wall-time slope; this
table MEASURES it: for each query family, total wall at the small SF
vs the big SF, as a ratio against the data-size ratio. A family whose
time ratio exceeds the data ratio is superlinear — either explained
(quadratic-in-pairs semantics like near-dup verification on a corpus
whose collision mass grows faster than rows) or a regression the
per-plan audit can't see. Ratios far BELOW the data ratio mean the
small-SF number is a job-launch/constant floor, which is itself worth
knowing: those queries' costs are latency, not data.

Families are query-name prefixes (q_/ing_/kg_/graph_/dedup_/sim_/
text_/mm_/ev_/dq_ + the TPC-H q1..q5 heads). Per-query ratios are
also emitted for the superlinear tail (time_ratio > data_ratio on
queries whose big-SF wall exceeds 0.5 s — sub-floor queries are all
noise).
"""
import json
import sys
from collections import defaultdict


def family(name: str) -> str:
    for p in ("ing_", "kg_", "graph_", "dedup_", "sim_", "text_",
              "mm_", "ev_", "dq_"):
        if name.startswith(p):
            return p.rstrip("_")
    return "q"  # q1_pricing_summary, q_window_rank, ...


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    data_ratio = float(sys.argv[3])
    out_path = sys.argv[4] if len(sys.argv) > 4 else None

    sq = {k: v for k, v in small["queries"].items() if v >= 0}
    bq = {k: v for k, v in big["queries"].items() if v >= 0}
    shared = sorted(set(sq) & set(bq))

    fam_s = defaultdict(float)
    fam_b = defaultdict(float)
    fam_n = defaultdict(int)
    for q in shared:
        f = family(q)
        fam_s[f] += sq[q]
        fam_b[f] += bq[q]
        fam_n[f] += 1

    rows = []
    for f in sorted(fam_s):
        r = fam_b[f] / fam_s[f] if fam_s[f] > 0 else float("inf")
        verdict = ("sublinear" if r < 0.8 * data_ratio else
                   "~linear" if r <= 1.2 * data_ratio else "SUPERLINEAR")
        rows.append({"family": f, "n_queries": fam_n[f],
                     "small_sec": round(fam_s[f], 2),
                     "big_sec": round(fam_b[f], 2),
                     "time_ratio": round(r, 2), "verdict": verdict})

    # superlinear per-query tail, floor-filtered
    tail = sorted(
        ({"query": q, "small_sec": round(sq[q], 3),
          "big_sec": round(bq[q], 3),
          "time_ratio": round(bq[q] / sq[q], 2)}
         for q in shared if bq[q] > 0.5 and sq[q] > 0 and
         bq[q] / sq[q] > data_ratio),
        key=lambda d: -d["time_ratio"])

    result = {
        "small_sf": small.get("sf"), "big_sf": big.get("sf"),
        "data_ratio": data_ratio, "n_shared": len(shared),
        "total_small_sec": round(sum(sq[q] for q in shared), 2),
        "total_big_sec": round(sum(bq[q] for q in shared), 2),
        "total_time_ratio": round(
            sum(bq[q] for q in shared) / sum(sq[q] for q in shared), 2),
        "families": rows, "superlinear_tail": tail,
    }
    text = json.dumps(result, indent=1)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")

    print(f"scale slope: sf {result['small_sf']} -> {result['big_sf']} "
          f"(data x{data_ratio:g}), {len(shared)} shared queries, "
          f"total time x{result['total_time_ratio']}")
    print(f"{'family':<8} {'n':>4} {'small_s':>9} {'big_s':>9} "
          f"{'t-ratio':>8}  verdict")
    for r in rows:
        print(f"{r['family']:<8} {r['n_queries']:>4} {r['small_sec']:>9} "
              f"{r['big_sec']:>9} {r['time_ratio']:>8}  {r['verdict']}")
    if tail:
        print("\nsuperlinear queries (big > 0.5s, ratio > data ratio):")
        for t in tail:
            print(f"  {t['query']:<28} {t['small_sec']:>8} -> "
                  f"{t['big_sec']:>8}  x{t['time_ratio']}")
    else:
        print("\nno superlinear queries above the 0.5s floor")


if __name__ == "__main__":
    main()
