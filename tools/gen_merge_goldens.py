#!/usr/bin/env python3
"""Differential goldens for MergeWriter: replay the reference's upsert SQL
shapes through a REAL SQL engine (DuckDB `INSERT ... ON CONFLICT DO UPDATE`,
same semantics family as the reference's Postgres) over randomized
existing/batch tables, and dump (existing, batch, expected) triples.
MergeGoldenSpec then asserts MergeWriter.merge reproduces every expected
table exactly.

Run from repo root:  python3 tools/gen_merge_goldens.py
"""
import json
import os
import random

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "src/test/resources/goldens")
rng = random.Random(20260812)


def row(k):
    def v():
        return rng.choice([None, "a", "b", "c", "dd", "ee"])
    def ts():
        return rng.choice([None, "2025-06-0%d 00:00:00" % rng.randint(1, 9)])
    return {"k": "k%d" % k, "v": v(), "w": v(), "ts": ts(),
            "lo": rng.randint(0, 50), "hi": rng.randint(50, 100)}


cases = []
for case_i in range(12):
    existing = [row(k) for k in rng.sample(range(12), rng.randint(2, 8))]
    batch_keys = rng.sample(range(12), rng.randint(2, 8))
    batch = [row(k) for k in batch_keys]
    # NOTE: the conditional `WHERE excluded.ts >= t.ts` flavor is NOT
    # goldened here — DuckDB 1.0's ON CONFLICT ... WHERE evaluation proved
    # nondeterministic across repeated upserts on one table (single-row
    # probes are stable and match Postgres NULL semantics; the guard is
    # pinned by MergeWriterSpec's hand-written cases instead).
    conditional = False

    con = duckdb.connect()
    con.execute("""create table t (k varchar primary key, v varchar, w varchar,
                   ts timestamp, lo bigint, hi bigint)""")
    for r in existing:
        con.execute("insert into t values (?,?,?,?,?,?)",
                    [r["k"], r["v"], r["w"], r["ts"], r["lo"], r["hi"]])
    # reference upsert flavors: v overwrite, w coalesce-preserving,
    # lo least, hi greatest; optionally the conditional newer-than guard
    where = "where excluded.ts >= t.ts" if conditional else ""
    for r in batch:
        con.execute(f"""insert into t values (?,?,?,?,?,?)
            on conflict (k) do update set
              v = excluded.v,
              w = coalesce(excluded.w, t.w),
              ts = excluded.ts,
              lo = least(t.lo, excluded.lo),
              hi = greatest(t.hi, excluded.hi)
            {where}""",
            [r["k"], r["v"], r["w"], r["ts"], r["lo"], r["hi"]])
    expected = [dict(zip(["k", "v", "w", "ts", "lo", "hi"], t))
                for t in con.execute(
                    "select k, v, w, cast(ts as varchar), lo, hi from t order by k"
                ).fetchall()]
    cases.append({"conditional": conditional, "existing": existing,
                  "batch": batch, "expected": expected})
    con.close()

path = os.path.join(GOLD, "merge_upsert_parity.json")
with open(path, "w") as f:
    json.dump(cases, f, indent=1)
print(f"wrote {path}: {len(cases)} cases")
