#!/usr/bin/env python3
"""Merge fresh-JVM sf10 probe samples (tools/sf10_probe.sh CSV) into
BENCH.json: per-query min across fresh JVMs, ratio vs the record's own
sf0.1 steady-state times, protocol named in sf10_note. Everything else in
the record is preserved byte-for-byte at the JSON level.

Usage: python3 tools/merge_bench.py <probes.csv> [BENCH.json path]
"""
import csv
import json
import sys

csv_path = sys.argv[1]
bench_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH.json"

samples = {}
with open(csv_path) as f:
    for q, i, v in csv.reader(f):
        if v in ("timeout", "error"):
            samples.setdefault(q, [])
            continue
        samples.setdefault(q, []).append(float(v))

d = json.load(open(bench_path))
# a provenance tail appended to the prior note (after "Provenance:")
# records which rounds measured which probes — preserve it across merges
# so a partial re-probe can't silently erase the record's history
prior_prov = ""
if "Provenance:" in d.get("sf10_note", ""):
    prior_prov = " Provenance:" + d["sf10_note"].split("Provenance:", 1)[1]
base = d["queries"]
sf10, ratios = {}, {}
for q, ts in samples.items():
    if not ts:
        print(f"[merge] {q}: no successful sample — left out", file=sys.stderr)
        continue
    t = min(ts)
    sf10[q] = t
    if base.get(q):
        ratios[q] = round(t / base[q], 2)
    n = len(ts)
    print(f"[merge] {q}: min-of-{n} fresh JVMs = {t:.1f}s "
          f"(samples {'/'.join(f'{x:.1f}' for x in sorted(ts))}) "
          f"ratio100x={ratios.get(q, float('nan')):.2f}", file=sys.stderr)

# per-KEY merge: probes this CSV re-measures win, every other committed
# fresh-JVM entry survives (a 3-query probe run must not drop the other 9)
d["sf10"] = dict(sorted({**d.get("sf10", {}), **sf10}.items()))
d["sf10_over_sf01_ratio"] = dict(
    sorted({**d.get("sf10_over_sf01_ratio", {}), **ratios}.items()))
d["sf10_dir"] = d.get("sf10_dir", "/root/repo/bench-data/sf10")
d["sf10_note"] = (
    "100x key-shifted decorrelated replica (graft.ScaleGen, 100 copies; part "
    "dim scaled with per-copy shifted partkeys; rotations composed with sign "
    "flips past the embedding dim; MEDIA key spaces scale with the copy "
    "offset - Multimodal's laws carve 53 audio tracks and one pixel-law "
    "class per 1M-id block; TEXT vocabulary block-carved per copy since r12 "
    "- ScaleGen.carveToken, one vocabulary slice per copy - so 100 copies "
    "carry ~100x the track/fingerprint/shingle universe and the media AND "
    "token-frequency probes, q113 included, measure real scaling, not "
    "fixed-key-space densification). Protocol: min across FRESH JVMs (one "
    "JVM per sample, tools/sf10_probe.sh - each sample pays full JIT + "
    "page-cache cold start, so these are COLD times, not the warm in-JVM "
    "floor that published q67=27.8x in r9 where fresh JVMs deliver ~150x); "
    "ratio vs the sf0.1 steady state, ~100 = linear scaling on FIXED cores. "
    "q67 SemDeDup's in-cluster pair stage is Theta(n^1.5) at nlist=sqrt(n), "
    "so its expected fixed-core 100x ratio is up to ~1000, NOT sub-linear; "
    "the cluster story is that bucket count (= parallelism) also grows as "
    "sqrt(n). Excluded BY DESIGN: q33/q235 (fixed 2^6 hyperplane space) and "
    "q247 (fixed 16-bit audio signature) are the deliberate fixed-key-space "
    "contrast fixtures - their auto-sized paths q246/q249 are the probed "
    "scale posture (see sf1_note and sf1_diag). A cold ratio slightly over "
    "100 on a small warm base is the fresh-JVM cold start itself, not "
    "super-linearity: q236's ~108 is linear work (warm sf1 ratio 3.0) plus "
    "the ~30-60 s JVM+page-cache start its 4.3 s sf0.1 base cannot amortize "
    "(cold samples span 466-688 s across r12 probes; min taken)."
    + prior_prov
)

# sf10 is now freshly measured — clear any carried-forward stamp for it
carried = [s for s in d.get("carried_sections", []) if s != "sf10"]
if carried:
    d["carried_sections"] = carried
else:
    d.pop("carried_sections", None)
    d.pop("carried_from", None)

with open(bench_path, "w") as f:
    json.dump(d, f, separators=(",", ":"))
    f.write("\n")
print(f"[merge] wrote {bench_path}: sf10={len(sf10)} entries", file=sys.stderr)
