#!/usr/bin/env python3
"""Per-query ratio table between two Bench history artifacts.

Usage: tools/ab_compare.py <control.json> <current.json>

Ratios use per-query MINs (the load-robust statistic). Each row carries
both runs' max 1-min loadavg and max steal share across reps so an
inflated ratio can be attributed in-artifact: a ratio > 1.25 WITH a
load/steal excursion beside it is host contention, not code.
"""
import json
import statistics
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    rows = []
    for q in shared:
        ra, rb = qa[q], qb[q]
        if not (ra.get("ok") and rb.get("ok")):
            continue
        ratio = rb["min"] / max(ra["min"], 1e-9)
        la = max(ra.get("load1") or [0.0])
        lb = max(rb.get("load1") or [0.0])
        sa = max(ra.get("steal") or [0.0])
        sb = max(rb.get("steal") or [0.0])
        rows.append((ratio, q, ra["min"], rb["min"], la, lb, sa, sb))
    rows.sort(reverse=True)
    print(f"{'query':42s} {'ratio':>6s} {'ctl_min':>8s} {'cur_min':>8s} "
          f"{'ld_c':>5s} {'ld_x':>5s} {'st_c':>6s} {'st_x':>6s}")
    for r, q, ma, mb, la, lb, sa, sb in rows:
        print(f"{q:42s} {r:6.2f} {ma:8.3f} {mb:8.3f} "
              f"{la:5.1f} {lb:5.1f} {sa:6.3f} {sb:6.3f}")
    # totals over BOTH-ok queries only — the same filter the per-query rows
    # use, so a query that failed in exactly one run cannot skew the
    # headline ratio relative to the row table
    both = [q for q in shared if qa[q].get("ok") and qb[q].get("ok")]
    tot_a = sum(qa[q]["min"] for q in both)
    tot_b = sum(qb[q]["min"] for q in both)
    med = statistics.median(r[0] for r in rows) if rows else float("nan")
    print(f"\nshared={len(shared)} min_total ctl={tot_a:.1f}s cur={tot_b:.1f}s "
          f"ratio={tot_b / max(tot_a, 1e-9):.3f} per-query-median={med:.3f}")
    print("attribution: ratio>1.25 with an ld_x/st_x excursion beside it is "
          "host contention, not code")


if __name__ == "__main__":
    main()
