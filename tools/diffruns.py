#!/usr/bin/env python3
"""Diff two Bench runs-files (best-of-k seconds per query, sorted by delta)."""
import json, sys

def best(path):
    d = json.load(open(path))
    return {k: min(r['sec'] for r in v) for k, v in d['query_runs'].items()}, d

a, da = best(sys.argv[1])
b, db = best(sys.argv[2])
keys = sorted(set(a) | set(b), key=lambda k: (a.get(k, 0) - b.get(k, 0)), reverse=True)
ta = tb = 0.0
print(f"{'query':38s} {'before':>8s} {'after':>8s} {'delta':>8s}")
for k in keys:
    va, vb = a.get(k, float('nan')), b.get(k, float('nan'))
    if va == va: ta += va
    if vb == vb: tb += vb
    if abs(va - vb) > 0.15 or not (va == va and vb == vb):
        print(f"{k:38s} {va:8.2f} {vb:8.2f} {va-vb:+8.2f}")
print(f"{'TOTAL (sum of bests)':38s} {ta:8.2f} {tb:8.2f} {ta-tb:+8.2f}")
