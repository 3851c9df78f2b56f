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

# Staging-vs-loop attribution (VERDICT r13 #4): the loop queries carry a
# per-stage `laps` map ({query: {stage: seconds}}) and, since r15, a
# per-PASS `laps_passes` list ({query: [{_total: secs, stage: secs}]}).
# Stage-name prefixes classify each lap — "stage"/"oracle" = harness
# staging, "drain" = the streaming loop's own drains, "consumer" = the
# converged read-back. Two kinds of laps are structurally EXCLUDED from
# the sums: "epoch N:" and "detail: " marks are per-epoch / internal
# detail recorded INSIDE a drain (summing them would double-count the
# drain; the "detail: " prefix is the emitters' explicit marker, ADVICE
# r14 — classification no longer relies on detail labels happening to
# avoid the classified prefixes), and the reserved "_total" key is the
# pass's own wall clock. Whatever the laps don't cover ("other":
# session setup, plan analysis, the _check twin's oracle side) is the
# pass total minus the covered laps — EXACT per pass when laps_passes
# is present (VERDICT r14 #5), else estimated from the medians as older
# records allow. All numbers are canary-normalized like the table
# above, so a mover reads directly as "staging grew" vs "the loop got
# slower".
import statistics

def _split_of(laps, total_norm, cm):
    split = {"staging": 0.0, "loop": 0.0, "readback": 0.0}
    for stage, secs in laps.items():
        if stage.startswith(("epoch", "detail:")) or stage == "_total":
            continue
        if stage.startswith(("stage", "oracle")):
            split["staging"] += secs / cm
        elif stage.startswith("drain"):
            split["loop"] += secs / cm
        elif stage.startswith("consumer"):
            split["readback"] += secs / cm
        # anything else (e.g. "setup") is deliberately unclassified:
        # it lands in the residual below
    covered = sum(split.values())
    split["other"] = max(0.0, (total_norm if total_norm is not None else covered) - covered)
    return split

def lap_split(rec, q):
    cm = rec.get("canary_median") or 1.0
    passes = rec.get("laps_passes", {}).get(q)
    if passes:
        per_pass = [_split_of(p, p.get("_total", 0.0) / cm, cm) for p in passes]
        return {k: statistics.median([s[k] for s in per_pass])
                for k in ("staging", "loop", "readback", "other")}
    laps = rec.get("laps", {}).get(q)
    if not laps:
        return None
    return _split_of(laps, rec.get("normalized", {}).get(q), cm)

lap_qs = sorted(set(A.get("laps", {})) | set(B.get("laps", {})))
if lap_qs:
    print(f"\nstaging-vs-loop split (canary-normalized; B/A per component):")
    print(f"{'query':34s} {'part':>9s} {'A':>8s} {'B':>8s} {'B/A':>6s}")
    for q in lap_qs:
        sa, sb = lap_split(A, q), lap_split(B, q)
        for part in ("staging", "loop", "readback", "other"):
            x = (sa or {}).get(part, 0.0)
            y = (sb or {}).get(part, 0.0)
            if x == 0.0 and y == 0.0:
                continue
            r = f"{y / x:6.2f}" if x else "   new"
            print(f"{q:34s} {part:>9s} {x:8.2f} {y:8.2f} {r}")
sys.exit(0 if frac >= 0.9 else 1)
