#!/usr/bin/env python3
"""Summarize one or more tools/probe_iso.sh output dirs side by side.

Usage: probe_summary.py <dir> [<dir2> ...]
Prints per-query medians per dir plus the ratio of each dir to the
first (the decade-up column when dirs are successive scales)."""
import json, glob, os, sys

dirs = sys.argv[1:]
cols = []
for d in dirs:
    med = {}
    for f in sorted(glob.glob(os.path.join(d, "*.json"))):
        j = json.load(open(f))
        for q, v in j["queries"].items():
            med[q] = v
    cols.append(med)
queries = sorted(cols[0])
hdr = f"{'query':24s}" + "".join(f" {os.path.basename(d.rstrip('/')):>12s}" for d in dirs)
hdr += "".join(f" {'x vs ' + os.path.basename(dirs[0].rstrip('/')):>12s}" for d in dirs[1:])
print(hdr)
tot = [0.0] * len(cols)
for q in queries:
    row = f"{q:24s}"
    for i, c in enumerate(cols):
        v = c.get(q)
        row += f" {v:12.3f}" if v is not None else f" {'-':>12s}"
        if v:
            tot[i] += v
    base = cols[0].get(q)
    for c in cols[1:]:
        v = c.get(q)
        row += f" {v / base:11.1f}x" if v and base else f" {'-':>12s}"
    print(row)
print(f"{'TOTAL':24s}" + "".join(f" {t:12.2f}" for t in tot))
