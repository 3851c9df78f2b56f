#!/usr/bin/env python3
"""Compare two Bench JSON records (dev tool, driver-independent).

Usage: bench_compare.py A.json B.json [threshold]

Prints a per-query table of canary-normalized medians and the
agreement ratio B/A, then the stability verdict round 5 asked for:
the fraction of queries whose normalized medians agree within the
threshold (default ±25%). Normalized medians are the machine-speed-
free number (each run's query medians divided by ITS canary median),
so two runs of identical code should agree regardless of how
throttled each run was; a real regression moves the ratio.
"""
import json, sys

a_path, b_path = sys.argv[1], sys.argv[2]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25

def load(p):
    with open(p) as f:
        return json.load(f)

A, B = load(a_path), load(b_path)
na, nb = A.get("normalized", {}), B.get("normalized", {})
shared = sorted(set(na) & set(nb))
if not shared:
    sys.exit("no shared queries with normalized medians")

rows, agree = [], 0
for q in shared:
    x, y = na[q], nb[q]
    ratio = (y / x) if x else float("inf")
    ok = abs(ratio - 1.0) <= thr
    agree += ok
    rows.append((q, x, y, ratio, ok))

rows.sort(key=lambda r: abs(r[3] - 1.0), reverse=True)
print(f"{'query':34s} {'A_norm':>8s} {'B_norm':>8s} {'B/A':>6s}  within ±{int(thr*100)}%")
for q, x, y, r, ok in rows:
    print(f"{q:34s} {x:8.2f} {y:8.2f} {r:6.2f}  {'yes' if ok else 'NO'}")

frac = agree / len(shared)
tot_a, tot_b = sum(na[q] for q in shared), sum(nb[q] for q in shared)
print(f"\ncanary_median A={A.get('canary_median')} (spread {A.get('canary_spread')})"
      f"  B={B.get('canary_median')} (spread {B.get('canary_spread')})")
print(f"aggregate normalized: A={tot_a:.1f} B={tot_b:.1f} ratio={tot_b/tot_a:.3f}")
print(f"agreement: {agree}/{len(shared)} = {frac:.1%} within ±{int(thr*100)}% "
      f"({'PASS' if frac >= 0.9 else 'FAIL'} at the >=90% gate)")
sys.exit(0 if frac >= 0.9 else 1)
