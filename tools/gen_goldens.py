#!/usr/bin/env python3
"""Generate reference-schema fixtures + golden outputs for GoldParitySpec.

Builds small deterministic tables in the reference's schema, then runs the
REFERENCE's own SQL (sql/*_mv.sql, sql/entity_*.sql — lightly adapted for
DuckDB: strip DDL wrapper, ::uuid -> ::varchar, ::numeric -> high-precision
decimal) and dumps each result as JSON-lines goldens. The ScalaTest
GoldParitySpec then asserts our Spark builders reproduce these exactly.

Run from repo root:  python3 tools/gen_goldens.py
(dev-time tool; uses the driver-side duckdb/pandas installs)
"""
import json
import os
import random
import re

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(ROOT, "src/test/resources/fixtures")
GOLD = os.path.join(ROOT, "src/test/resources/goldens")
REF_SQL = "/root/reference/sql"
os.makedirs(FIX, exist_ok=True)
os.makedirs(GOLD, exist_ok=True)

rng = random.Random(1234)
SENTIMENTS = ["positive", "neutral", "negative"]
CONTROLS = ["controlled", "uncontrolled"]

companies = [
    {"id": "c1", "name": "Acme Corporation", "ticker": "ACM", "sector": "Industrials",
     "websites": "acme.com", "favorite": True},
    {"id": "c2", "name": "Globex Group", "ticker": "GLX", "sector": "Tech",
     "websites": "globex.com|globex.io", "favorite": False},
    {"id": "c3", "name": "Initech LLC", "ticker": "INI", "sector": "Tech",
     "websites": "", "favorite": False},
]
ceos = [
    {"id": "e1", "name": "Jane Doe", "company_id": "c1", "alias": "J. Doe", "favorite": False},
    {"id": "e2", "name": "John Smith", "company_id": "c2", "alias": None, "favorite": True},
]

DATES = [f"2025-03-{d:02d}" for d in range(1, 29)] + [f"2025-04-{d:02d}" for d in range(1, 15)]

articles = []
cam, ceam = [], []
camd, ceamd = [], []
for i in range(260):
    aid = f"a{i}"
    articles.append({
        "id": aid, "canonical_url": f"https://news{i % 7}.com/s/{i}",
        "title": f"title {chr(97 + i % 26)}{i:03d}", "publisher": f"news{i % 7}",
        "snippet": "", "published_at": None, "first_seen_at": None,
        "last_seen_at": None, "source": "modal"})
    date = DATES[rng.randrange(len(DATES))]
    if i % 3 != 2:
        cid = companies[i % 3]["id"]
        sent = SENTIMENTS[rng.randrange(3)]
        llm_risk = "crisis_risk" if rng.random() < 0.2 else None
        cam.append({"company_id": cid, "article_id": aid, "sentiment_label": sent,
                    "control_class": CONTROLS[rng.randrange(2)], "finance_routine": rng.random() < 0.2,
                    "uncertain": False, "llm_sentiment_label": None,
                    "llm_risk_label": llm_risk, "llm_control_class": None, "llm_severity": None})
        camd.append({"date": date, "company_id": cid, "article_id": aid,
                     "sentiment_label": sent, "control_class": None,
                     "finance_routine": False, "uncertain": False})
    else:
        eid = ceos[i % 2]["id"]
        sent = SENTIMENTS[rng.randrange(3)]
        llm_risk = "crisis_risk" if rng.random() < 0.15 else None
        ceam.append({"ceo_id": eid, "article_id": aid, "sentiment_label": sent,
                     "control_class": None, "finance_routine": False, "uncertain": False,
                     "llm_sentiment_label": None, "llm_risk_label": llm_risk,
                     "llm_control_class": None, "llm_severity": None})
        ceamd.append({"date": date, "ceo_id": eid, "article_id": aid,
                      "sentiment_label": sent, "control_class": None,
                      "finance_routine": False, "uncertain": False})

# overrides: flip some sentiments (precedence ladder scenario 1)
cao = [{"company_id": m["company_id"], "article_id": m["article_id"],
        "override_sentiment_label": "negative" if m["sentiment_label"] != "negative" else "neutral",
        "override_relevant": None, "override_control_class": None, "note": None,
        "edited_by": "qa", "edited_at": "2025-04-20 10:00:00"}
       for m in camd[::9]]
ceao = [{"ceo_id": m["ceo_id"], "article_id": m["article_id"],
         "override_sentiment_label": "positive",
         "override_relevant": None, "override_control_class": None, "note": None,
         "edited_by": "qa", "edited_at": "2025-04-20 10:00:00"}
        for m in ceamd[::7]]

serp_runs, serp_results, sro = [], [], []
rid = 0
for d in DATES[::2]:
    for ent in companies + ceos:
        is_ceo = "company_id" in ent and ent["id"].startswith("e")
        run_id = f"r{rid}"; rid += 1
        serp_runs.append({
            "id": run_id, "entity_type": "ceo" if is_ceo else "company",
            "company_id": None if is_ceo else ent["id"],
            "ceo_id": ent["id"] if is_ceo else None,
            "query_text": ent["name"], "provider": "serpapi",
            "run_at": f"{d} 06:00:00"})
        for rank in range(1, 9):
            res_id = f"{run_id}_{rank}"
            serp_results.append({
                "id": res_id, "serp_run_id": run_id, "rank": rank,
                "url": f"https://site{rank}.com/{rid}/{rank}",
                "url_hash": f"h{rid}_{rank}", "title": f"serp {rid} {rank}",
                "snippet": "", "domain": f"site{rank}.com", "published_date": None,
                "sentiment_label": SENTIMENTS[rng.randrange(3)],
                "control_class": CONTROLS[rng.randrange(2)],
                "finance_routine": False,
                "llm_sentiment_label": SENTIMENTS[rng.randrange(3)] if rng.random() < 0.3 else None,
                "llm_risk_label": None,
                "llm_control_class": CONTROLS[rng.randrange(2)] if rng.random() < 0.3 else None})
            if rng.random() < 0.06:
                sro.append({"serp_result_id": res_id,
                            "override_sentiment_label": "negative",
                            "override_control_class": "uncontrolled",
                            "note": None, "edited_by": "qa",
                            "edited_at": "2025-04-20 10:00:00"})

FEATURES = ["top_stories_items", "organic", "paa_items"]
sfi, sfio, sfuo = [], [], []
fid = 0
for d in DATES[::2]:
    for ent_type, ents in (("brand", companies), ("ceo", ceos)):
        for ent in ents:
            for ft in FEATURES:
                n = rng.randrange(2, 7)
                for p in range(n):
                    iid = f"f{fid}"; fid += 1
                    uh = f"uh{p % 4}_{ent['id']}_{ft}"
                    sfi.append({
                        "id": iid, "date": d, "entity_type": ent_type,
                        "entity_id": ent["id"], "entity_name": ent["name"],
                        "feature_type": ft, "item_type": "news", "title": f"item {iid}",
                        "snippet": "", "url": f"https://m{p}.com/{iid}",
                        "domain": f"m{p}.com", "published_date": None, "position": p + 1,
                        "url_hash": uh,
                        "sentiment_label": SENTIMENTS[rng.randrange(3)],
                        "llm_sentiment_label": SENTIMENTS[rng.randrange(3)] if rng.random() < 0.4 else None,
                        "llm_control_class": CONTROLS[rng.randrange(2)] if rng.random() < 0.3 else None,
                        "control_class": CONTROLS[rng.randrange(2)] if rng.random() < 0.8 else None,
                        "finance_routine": rng.random() < 0.1, "source": "serpapi"})
                    if rng.random() < 0.05:
                        sfio.append({"serp_feature_item_id": iid,
                                     "override_sentiment_label": "negative",
                                     "override_control_class": "controlled",
                                     "note": None, "edited_by": "qa",
                                     "edited_at": "2025-04-20 10:00:00"})
# URL-level overrides on a few (entity, feature, hash) keys
seen = set()
for row in sfi[::17]:
    key = (row["entity_type"], row["entity_id"], row["feature_type"], row["url_hash"])
    if key in seen:
        continue
    seen.add(key)
    sfuo.append({"entity_type": key[0], "entity_id": key[1], "feature_type": key[2],
                 "url_hash": key[3], "override_sentiment_label": "neutral",
                 "override_control_class": "uncontrolled",
                 "edited_at": "2025-04-20 10:00:00"})

TABLES = {
    "companies": companies, "ceos": ceos, "articles": articles,
    "company_article_mentions": cam, "ceo_article_mentions": ceam,
    "company_article_mentions_daily": camd, "ceo_article_mentions_daily": ceamd,
    "company_article_overrides": cao, "ceo_article_overrides": ceao,
    "serp_runs": serp_runs, "serp_results": serp_results,
    "serp_result_overrides": sro,
    "serp_feature_items": sfi, "serp_feature_item_overrides": sfio,
    "serp_feature_url_overrides": sfuo,
}

for name, rows in TABLES.items():
    with open(os.path.join(FIX, f"{name}.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"fixture {name}: {len(rows)} rows")

con = duckdb.connect()
for name in TABLES:
    con.execute(
        f"CREATE TABLE {name} AS SELECT * FROM read_json_auto('{FIX}/{name}.jsonl', format='newline_delimited')")
    # normalize column types duckdb guessed as JSON nulls
for name in TABLES:
    pass

def adapt(sql: str) -> str:
    # strip "create materialized view if not exists X as" / "create or replace view X as"
    sql = re.sub(r"create (materialized )?(or replace )?view( if not exists)? \w+ as", "", sql, count=1)
    # drop trailing index DDL
    sql = sql.split("create unique index")[0].split("create index")[0]
    sql = sql.rstrip().rstrip(";")
    sql = sql.replace("::uuid", "::varchar")
    # Postgres numeric is arbitrary precision; DuckDB NUMERIC defaults to (18,3)
    sql = sql.replace("::numeric", "::DECIMAL(28,12)")
    return sql

def run_view(path: str) -> str:
    return adapt(open(path).read())

mv_files = {
    "article_daily_counts_mv": "article_daily_counts_mv.sql",
    "serp_daily_counts_mv": "serp_daily_counts_mv.sql",
    "serp_feature_daily_mv": "serp_feature_daily_mv.sql",
    "serp_feature_control_daily_mv": "serp_feature_control_daily_mv.sql",
    "serp_feature_daily_index_mv": "serp_feature_daily_index_mv.sql",
    "serp_feature_control_daily_index_mv": "serp_feature_control_daily_index_mv.sql",
    "negative_articles_summary_mv": "negative_summary_mv.sql",
}
for view, fname in mv_files.items():
    sql = run_view(os.path.join(REF_SQL, fname))
    con.execute(f"CREATE VIEW {view} AS {sql}")

for view in ["entity_daily_metrics_v", "entity_weekly_rollup_v", "entity_anomalies_v"]:
    sql = run_view(os.path.join(REF_SQL, f"{view}.sql"))
    con.execute(f"CREATE VIEW {view} AS {sql}")

for view in list(mv_files) + ["entity_daily_metrics_v", "entity_weekly_rollup_v",
                              "entity_anomalies_v"]:
    df = con.execute(f"SELECT * FROM {view}").df()
    # canonical JSON: dates as ISO strings, decimals as floats
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].dt.strftime("%Y-%m-%d")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: float(v) if hasattr(v, "as_tuple") else v)
    df.to_json(os.path.join(GOLD, f"{view}.jsonl"), orient="records", lines=True,
               double_precision=15)
    print(f"golden {view}: {len(df)} rows")
print("done")
