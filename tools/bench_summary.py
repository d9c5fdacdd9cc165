#!/usr/bin/env python3
"""Summarize BENCH.json for commit messages — numbers derived, not typed.

Usage: python3 tools/bench_summary.py [path]
"""
import json
import statistics
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH.json"
d = json.load(open(path))
q = {k: v for k, v in d["queries"].items() if v is not None}
errs = d.get("errors", {})
print(f"suite: {len(d['queries'])} queries, total {d['value']:.1f}s at {d['sf']}")
print(f"errors: {len(errs)} {list(errs) if errs else ''}")
ts = sorted(q.values())
print(f"median {statistics.median(ts):.2f}s  p90 {ts[int(len(ts)*0.9)]:.2f}s  max {ts[-1]:.2f}s ({max(q, key=q.get)})")
r1 = d.get("sf1_over_sf01_ratio", {})
if r1:
    worst = sorted(r1.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    # the CANONICAL outlier sentence: SURVEY.md §6 embeds this line
    # verbatim and RegistrySpec re-derives it from BENCH.json and greps
    # SURVEY for it — prose can no longer drift from the record (the r10
    # verdict's defect #1). Keep format changes in lockstep with
    # RegistrySpec's "SURVEY outlier sentence" test.
    print(f"sf1 section: {len(r1)} queries")
    print("Worst sf1/sf0.1 ratios at HEAD: "
          + ", ".join(f"{k}={v}" for k, v in worst) + ".")
r10 = d.get("sf10_over_sf01_ratio", {})
if r10:
    print("sf10 probe: " + ", ".join(f"{k}={v}" for k, v in sorted(r10.items(), key=lambda kv: -kv[1])))
p = d.get("pipeline")
if p:
    print(f"pipeline: {p['sec']:.1f}s, {p['docs_in']}->{p['curated']} docs")
