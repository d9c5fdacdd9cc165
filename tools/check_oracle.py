import duckdb, json, glob, sys
import pandas as pd

import os
sfdir = os.environ.get('SFDIR', '/root/testdata/sf0.01')
out = os.environ.get('VOUT', '/tmp/verify_out')
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    # testdata ships single .parquet FILES; ScaleGen replicas (bench-data/
    # sf1, sf10) write Spark DIRECTORIES of part files — glob those, so
    # cross-engine checks run against the replicas too (q249's derived
    # width only widens past 16 bits at sf1+)
    p = f'{sfdir}/{t}.parquet'
    pat = p if os.path.isfile(p) else f'{p}/*.parquet'
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
# optional substring filters (same contract as Verify's args) — running all
# 249 oracles against an sf1 replica takes hours in DuckDB, so targeted
# cross-engine checks need a way to run just the query under test
filters = sys.argv[1:]
for name, sql in sorted(oracle.items()):
    if filters and not any(f in name for f in filters):
        continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f'{out}/{name}/*.parquet'))])
    except Exception as e:
        print(f"{name}: SPARK OUTPUT READ ERROR: {e}"); continue
    # driver-style: sort columns by name
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)].reset_index(drop=True)
    if list(exp.columns) != list(got.columns):
        print(f"{name}: SCHEMA MISMATCH exp={list(exp.columns)} got={list(got.columns)}"); continue
    if len(exp) != len(got):
        print(f"{name}: ROWCOUNT MISMATCH exp={len(exp)} got={len(got)}"); continue
    # row-order-insensitive: sort by all columns
    def norm(df):
        d = df.copy()
        for c in d.columns:
            if str(d[c].dtype).startswith('datetime') or d[c].dtype == object:
                d[c] = d[c].astype(str)
        return d.sort_values(by=list(d.columns)).reset_index(drop=True)
    e2, g2 = norm(exp), norm(got)
    mismatches = []
    for c in e2.columns:
        if not e2[c].equals(g2[c]):
            neq = (e2[c] != g2[c])
            mismatches.append((c, int(neq.sum())))
    if mismatches:
        print(f"{name}: VALUE MISMATCH {mismatches}")
        for c, n in mismatches[:2]:
            neq = (e2[c] != g2[c])
            print("  exp:", e2[neq][c].head(3).tolist(), " got:", g2[neq][c].head(3).tolist())
    else:
        print(f"{name}: OK ({len(exp)} rows)")
