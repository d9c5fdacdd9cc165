#!/usr/bin/env python3
"""Generate fixtures + goldens for InsightsSpec.

Mirrors the REFERENCE's endpoint aggregation loops faithfully
(dashboard_app/app.py):
  - consecutive_day_durations          (app.py:1602-1617)
  - aggregate_crisis_patterns bucketing (app.py:4696-4770)
  - aggregate_industry_durations        (app.py:4884-4965)
  - sector_baseline rows/summary/peer   (app.py:4523-4637)

Rounding note: the reference rounds floats with Python round() (exact binary
expansion); we round through the value's shortest decimal repr (Spark
round/bround semantics). The two differ only when an aggregate lands exactly
on a rounding boundary in one representation — a <=1-ulp cosmetic
difference; fixture values are chosen off-boundary.

Run from repo root:  python3 tools/gen_insights_goldens.py
"""
import json
import os
import random
from datetime import date, timedelta
from decimal import Decimal, ROUND_HALF_EVEN
from statistics import median

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(ROOT, "src/test/resources/fixtures")
GOLD = os.path.join(ROOT, "src/test/resources/goldens")

rng = random.Random(777)

NON_CRISIS_NARRATIVE_TAGS = {
    'Rebranding',
    'Mergers and acquisitions',
    'Planned Executive Turnover',
}

CRISIS_TAGS = [
    "Activist Investor Interest", "Legal & Regulatory", "Unforced Errors",
    "Labor Disputes", "Fraud",
]
ALL_TAGS = CRISIS_TAGS + sorted(NON_CRISIS_NARRATIVE_TAGS)

SECTORS = ["Tech", "Industrials", ""]  # "" -> 'Unspecified' in durations
ENTITIES = [
    ("e1", "Acme Corporation", "Tech"),
    ("e2", "Globex Group", "Tech"),
    ("e3", "Initech LLC", "Industrials"),
    ("e4", "Umbrella Co", "Industrials"),
    ("e5", "Hooli", ""),
]

START = date(2025, 3, 1)
END = date(2025, 3, 28)           # window end == latest day some rows hit


def narrative_display_tag(tag, group):  # app.py:264-271
    txt = (tag or '').strip()
    if not txt:
        return ''
    g = (group or '').strip().lower()
    if g == 'non_crisis' or txt in NON_CRISIS_NARRATIVE_TAGS:
        return f"{txt} (non-crisis)"
    return txt


def consecutive_day_durations(days):  # app.py:1602-1617
    clean = sorted({d for d in days if d is not None})
    if not clean:
        return []
    durations, streak, prev = [], 1, clean[0]
    for d in clean[1:]:
        if d == prev + timedelta(days=1):
            streak += 1
        else:
            durations.append(streak)
            streak = 1
        prev = d
    durations.append(streak)
    return durations


def rnd(x, nd):
    """Spark round/bround-equivalent: HALF_EVEN on the shortest repr."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-nd), rounding=ROUND_HALF_EVEN))


# ----------------------------------------------------- narrative fixture
rows = []
for eid, ename, sector in ENTITIES:
    for tag in ALL_TAGS:
        if rng.random() < 0.45:
            continue
        # a few consecutive-day runs with gaps
        day = START + timedelta(days=rng.randrange(5))
        for _ in range(rng.randrange(2, 5)):
            run = rng.randrange(1, 4)
            for _ in range(run):
                if day > END:
                    break
                group_style = rng.random()
                if group_style < 0.5:
                    grp = 'crisis' if tag in CRISIS_TAGS else 'non_crisis'
                elif group_style < 0.7:
                    grp = ' Crisis ' if tag in CRISIS_TAGS else 'NON_CRISIS'
                elif group_style < 0.85:
                    grp = ''      # fall back to vocabulary / is_crisis
                else:
                    grp = 'odd_label'
                is_crisis = (rng.choice([True, False, None])
                             if (grp or '').strip().lower() not in
                             {'crisis', 'non_crisis'} else None)
                rows.append({
                    "date": day.isoformat(),
                    "company_id": eid, "entity_id": eid,
                    "entity_name": ename, "company": ename, "ceo": "",
                    "sector": sector,
                    "narrative_primary_tag": tag,
                    "narrative_primary_group": grp,
                    "narrative_is_crisis": is_crisis,
                    "negative_item_count": rng.randrange(0, 6),
                })
                day += timedelta(days=1)
            day += timedelta(days=rng.randrange(2, 5))  # gap
# guarantee some end-date actives
for eid, ename, sector in ENTITIES[:3]:
    rows.append({
        "date": END.isoformat(), "company_id": eid, "entity_id": eid,
        "entity_name": ename, "company": ename, "ceo": "", "sector": sector,
        "narrative_primary_tag": "Fraud", "narrative_primary_group": "crisis",
        "narrative_is_crisis": None, "negative_item_count": 3,
    })

with open(os.path.join(FIX, "narrative_rows.jsonl"), "w") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")


def normalize(row):
    tag = (row.get('narrative_primary_tag') or '').strip()
    grp = (row.get('narrative_primary_group') or '').strip().lower()
    if grp not in {'crisis', 'non_crisis'}:
        if tag in NON_CRISIS_NARRATIVE_TAGS:
            grp = 'non_crisis'
        elif row.get('narrative_is_crisis') is True:
            grp = 'crisis'
        elif row.get('narrative_is_crisis') is False:
            grp = 'non_crisis'
    return tag, grp


# ------------------------------------------ crisis patterns (app.py:4696-)
def crisis_patterns(include_non_crisis):
    by_pattern = {}
    for row in rows:
        tag, grp = normalize(row)
        if not tag:
            continue
        if not include_non_crisis and grp == 'non_crisis':
            continue
        day = date.fromisoformat(row['date'])
        eid = str(row['entity_id'])
        key = (tag.casefold(), grp or '')
        b = by_pattern.setdefault(key, {
            'tag': tag, 'group': grp or None,
            'display_tag': narrative_display_tag(tag, grp or None),
            'entity_days': {}, 'entity_names': {}, 'entity_totals': {},
            'total_negative_items': 0, 'active_entity_ids': set(),
        })
        b['entity_days'].setdefault(eid, set()).add(day)
        b['entity_names'][eid] = row['entity_name']
        b['entity_totals'][eid] = b['entity_totals'].get(eid, 0) + int(row['negative_item_count'] or 0)
        b['total_negative_items'] += int(row['negative_item_count'] or 0)
        if day == END:
            b['active_entity_ids'].add(eid)

    out = []
    for b in by_pattern.values():
        durations = []
        for eid, ds in b['entity_days'].items():
            durations.extend(consecutive_day_durations(list(ds)))
        if not durations:
            continue
        top = sorted(b['entity_totals'].items(),
                     key=lambda kv: (-kv[1], b['entity_names'].get(kv[0], '').casefold()))[:3]
        out.append({
            'tag': b['tag'], 'display_tag': b['display_tag'],
            'group': b['group'], 'is_crisis': b['group'] == 'crisis',
            'entity_type': 'brand',
            'brands_affected': len(b['entity_days']),
            'episode_count': len(durations),
            'avg_duration_days': rnd(sum(durations) / len(durations), 2),
            'median_duration_days': float(median(durations)),
            'max_duration_days': max(durations),
            'active_entities_latest': len(b['active_entity_ids']),
            'total_negative_items': b['total_negative_items'],
            'sample_entities': [b['entity_names'].get(eid, eid) for eid, _ in top],
        })
    out.sort(key=lambda r: (-(r['brands_affected']), -(r['episode_count']),
                            -(r['total_negative_items']), r['tag'].casefold()))
    return out[:10]


# -------------------------------------- industry durations (app.py:4884-)
def industry_durations(include_non_crisis):
    by_sector = {}
    for row in rows:
        tag, grp = normalize(row)
        if not tag:
            continue
        if not include_non_crisis and grp == 'non_crisis':
            continue
        day = date.fromisoformat(row['date'])
        eid = str(row['entity_id'])
        sector = (row.get('sector') or '').strip() or 'Unspecified'
        tk = f"{tag.casefold()}::{grp or ''}"
        b = by_sector.setdefault(sector, {
            'sector': sector, 'entity_ids': set(), 'active_entity_ids': set(),
            'tag_entity_days': {}, 'tag_display': {}, 'tag_totals': {},
            'total_negative_items': 0,
        })
        b['entity_ids'].add(eid)
        if day == END:
            b['active_entity_ids'].add(eid)
        b['tag_entity_days'].setdefault((eid, tk), set()).add(day)
        b['tag_display'][tk] = narrative_display_tag(tag, grp or None)
        b['tag_totals'][tk] = b['tag_totals'].get(tk, 0) + int(row['negative_item_count'] or 0)
        b['total_negative_items'] += int(row['negative_item_count'] or 0)

    out = []
    for b in by_sector.values():
        durations = []
        for ds in b['tag_entity_days'].values():
            durations.extend(consecutive_day_durations(list(ds)))
        if not durations:
            continue
        top = sorted(b['tag_totals'].items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        out.append({
            'sector': b['sector'], 'entity_type': 'brand',
            'brands_affected': len(b['entity_ids']),
            'episode_count': len(durations),
            'avg_duration_days': rnd(sum(durations) / len(durations), 2),
            'median_duration_days': float(median(durations)),
            'max_duration_days': max(durations),
            'active_entities_latest': len(b['active_entity_ids']),
            'total_negative_items': b['total_negative_items'],
            'most_common_tags': [b['tag_display'][tk] for tk, _ in top],
        })
    out.sort(key=lambda r: (-(r['avg_duration_days']), -(r['episode_count']),
                            -(r['brands_affected']), r['sector'].casefold()))
    return out[:25]


# ------------------------------------------ sector baseline (app.py:4523-)
metrics_rows = []
for eid, ename, sector in ENTITIES:
    cid = eid.replace("e", "c")
    for i in range((END - START).days + 1):
        d = START + timedelta(days=i)
        # e2 misses the window end (pins NULLS FIRST ordering on latest)
        if eid == "e2" and d == END:
            continue
        if rng.random() < 0.2:
            continue
        metrics_rows.append({
            "date": d.isoformat(), "entity_type": "brand", "entity_id": eid,
            "company_id": cid, "ceo_id": None, "entity_name": ename,
            "company": ename, "ceo": "",
            "top_stories_negative_count": rng.randrange(0, 5),
        })

with open(os.path.join(FIX, "sector_metrics.jsonl"), "w") as f:
    for r in metrics_rows:
        f.write(json.dumps(r) + "\n")

companies_fix = [
    {"id": eid.replace("e", "c"), "name": ename, "sector": sector or None}
    for eid, ename, sector in ENTITIES
]
with open(os.path.join(FIX, "sector_companies.jsonl"), "w") as f:
    for r in companies_fix:
        f.write(json.dumps(r) + "\n")


def sector_baseline(sector, days=14, entity_name_id="e1"):
    sect_rows = [r for r in metrics_rows
                 if next(c["sector"] for c in companies_fix
                         if c["id"] == r["company_id"]) == sector]
    end = max(date.fromisoformat(r["date"]) for r in sect_rows)
    start = end - timedelta(days=days - 1)
    by_entity = {}
    for r in sect_rows:
        d = date.fromisoformat(r["date"])
        if not (start <= d <= end):
            continue
        key = (r["entity_type"], r["entity_id"], r["company_id"], r["ceo_id"])
        b = by_entity.setdefault(key, {
            "entity_type": r["entity_type"], "entity_id": r["entity_id"],
            "company_id": r["company_id"], "ceo_id": r["ceo_id"],
            "entity_name": r["entity_name"], "company": r["company"],
            "ceo": r["ceo"], "sector": sector, "vals": [], "latest": None})
        v = int(r["top_stories_negative_count"])
        b["vals"].append(v)
        if d == end:
            b["latest"] = v
    out = []
    for b in by_entity.values():
        out.append({
            "entity_type": b["entity_type"], "entity_id": b["entity_id"],
            "company_id": b["company_id"], "ceo_id": b["ceo_id"],
            "entity_name": b["entity_name"], "company": b["company"],
            "ceo": b["ceo"], "sector": b["sector"],
            "window_value": float(sum(b["vals"])),
            "avg_daily_value": sum(b["vals"]) / len(b["vals"]),
            "latest_value": (None if b["latest"] is None else float(b["latest"])),
            "peak_value": float(max(b["vals"])),
            "signal_days": sum(1 for v in b["vals"] if v > 0),
        })
    # postgres: order by window_value desc, latest_value desc (NULLS FIRST),
    # entity_name
    out.sort(key=lambda r: (
        -r["window_value"],
        (0 if r["latest_value"] is None else 1, -(r["latest_value"] or 0)),
        r["entity_name"]))
    wvals = [r["window_value"] for r in out]
    summary = {
        "avg_window_value": rnd(sum(wvals) / len(wvals), 4) if wvals else 0.0,
        "median_window_value": rnd(float(median(wvals)), 4) if wvals else 0.0,
        "active_entity_count": sum(1 for v in wvals if v > 0),
    }
    idx = next(i for i, r in enumerate(out) if r["entity_id"] == entity_name_id)
    rank, n = idx + 1, len(out)
    peer = {
        **out[idx], "rank": rank, "peer_count": n,
        "percentile": rnd(100.0 * ((n - rank) / (n - 1)), 1) if n > 1 else 100.0,
        "vs_sector_avg": rnd(out[idx]["window_value"] - sum(wvals) / len(wvals), 4),
        "vs_sector_median": rnd(out[idx]["window_value"] - float(median(wvals)), 4),
    }
    return out, summary, peer


# ------------------------------- storyline candidates (app.py:1968-2211)
def normalized_narrative_group(tag, primary_group, is_crisis):  # app.py:1898
    group = (primary_group or '').strip().lower()
    if group in {'crisis', 'non_crisis'}:
        return group
    if tag in NON_CRISIS_NARRATIVE_TAGS:
        return 'non_crisis'
    if is_crisis is True:
        return 'crisis'
    if is_crisis is False:
        return 'non_crisis'
    return None


def build_storyline_candidates(analytics_type, rows_in):
    plural = 'brands' if analytics_type == 'brand' else 'CEOs'
    by_sector_tag, by_tag, by_sector = {}, {}, {}
    for row in rows_in:
        tag = (row.get('narrative_primary_tag') or '').strip()
        if not tag:
            continue
        day = date.fromisoformat(row['date'])
        sector = (row.get('sector') or '').strip() or 'Unspecified'
        eid = str(row.get('entity_id') or '')
        ename = (row.get('entity_name') or '').strip()
        neg = int(row.get('negative_item_count') or 0)
        grp = normalized_narrative_group(tag, row.get('narrative_primary_group'),
                                         row.get('narrative_is_crisis'))
        tk = f"{tag.casefold()}::{grp or ''}"
        disp = narrative_display_tag(tag, grp)

        b = by_sector_tag.setdefault((sector, tk), {
            'sector': sector, 'tag': tag, 'display_tag': disp,
            'entity_days': {}, 'entity_names': {},
            'entity_negative_item_totals': {}, 'days': set(),
            'total_negative_items': 0})
        b['entity_days'].setdefault(eid, set()).add(day)
        b['entity_names'][eid] = ename
        b['entity_negative_item_totals'][eid] = b['entity_negative_item_totals'].get(eid, 0) + neg
        b['days'].add(day)
        b['total_negative_items'] += neg

        t = by_tag.setdefault(tk, {
            'tag': tag, 'display_tag': disp, 'sectors': set(),
            'entity_days': {}, 'entity_names': {},
            'entity_negative_item_totals': {}, 'sector_negative_item_totals': {},
            'days': set(), 'total_negative_items': 0})
        t['sectors'].add(sector)
        t['entity_days'].setdefault(eid, set()).add(day)
        t['entity_names'][eid] = ename
        t['entity_negative_item_totals'][eid] = t['entity_negative_item_totals'].get(eid, 0) + neg
        t['sector_negative_item_totals'][sector] = t['sector_negative_item_totals'].get(sector, 0) + neg
        t['days'].add(day)
        t['total_negative_items'] += neg

        s = by_sector.setdefault(sector, {
            'sector': sector, 'entity_days': {}, 'entity_names': {},
            'entity_negative_item_totals': {}, 'tag_negative_item_totals': {},
            'days': set(), 'total_negative_items': 0})
        s['entity_days'].setdefault(eid, set()).add(day)
        s['entity_names'][eid] = ename
        s['entity_negative_item_totals'][eid] = s['entity_negative_item_totals'].get(eid, 0) + neg
        s['tag_negative_item_totals'][disp] = s['tag_negative_item_totals'].get(disp, 0) + neg
        s['days'].add(day)
        s['total_negative_items'] += neg

    cands = []
    base_none = {'sectors_affected': None, 'median_duration_days': None,
                 'active_days': None, 'sector': None, 'display_tag': None,
                 'dominant_tags': None}
    for b in by_sector_tag.values():
        durations = []
        for ds in b['entity_days'].values():
            durations.extend(consecutive_day_durations(list(ds)))
        if not durations:
            continue
        n = len(b['entity_days'])
        avg_d = rnd(sum(durations) / len(durations), 2)
        mx = max(durations)
        top = sorted(b['entity_negative_item_totals'].items(),
                     key=lambda kv: (-kv[1], b['entity_names'].get(kv[0], '').casefold()))[:3]
        score = rnd(n * 6 + b['total_negative_items'] * 0.35 + avg_d * 2
                    + len(b['days']) * 0.4, 2)
        cands.append({**base_none,
            'storyline_key': f"sector_tag:{b['sector']}:{b['tag'].casefold()}",
            'storyline_type': 'sector_tag_pattern',
            'headline': f"{b['sector']} saw concentrated {b['display_tag'].lower()} pressure",
            'angle': (f"{n} {plural} in {b['sector']} showed {b['display_tag']} "
                      "in negative search/news coverage during the selected window."),
            'why_interesting': (
                f"Average duration was {avg_d} days, with a maximum streak of {mx} days "
                f"and {b['total_negative_items']} tagged negative evidence items."),
            'score': score, 'entities_affected': n, 'avg_duration_days': avg_d,
            'max_duration_days': mx, 'episode_count': len(durations),
            'total_negative_items': b['total_negative_items'],
            'active_days': len(b['days']), 'sector': b['sector'],
            'display_tag': b['display_tag'],
            'sample_entities': [b['entity_names'].get(e, e) for e, _ in top],
            'sample_sectors': [b['sector']]})

    for b in by_tag.values():
        if len(b['sectors']) < 2:
            continue
        durations = []
        for ds in b['entity_days'].values():
            durations.extend(consecutive_day_durations(list(ds)))
        if not durations:
            continue
        n = len(b['entity_days'])
        avg_d = rnd(sum(durations) / len(durations), 2)
        mx = max(durations)
        top_sectors = sorted(b['sector_negative_item_totals'].items(),
                             key=lambda kv: (-kv[1], kv[0].casefold()))[:3]
        top = sorted(b['entity_negative_item_totals'].items(),
                     key=lambda kv: (-kv[1], b['entity_names'].get(kv[0], '').casefold()))[:3]
        score = rnd(len(b['sectors']) * 7 + n * 4 + avg_d * 1.6
                    + b['total_negative_items'] * 0.25, 2)
        cands.append({**base_none,
            'storyline_key': f"cross_sector:{b['tag'].casefold()}",
            'storyline_type': 'cross_sector_narrative',
            'headline': f"{b['display_tag']} crossed sector lines",
            'angle': (f"The {b['display_tag']} narrative appeared across "
                      f"{len(b['sectors'])} sectors and {n} {plural} in the selected window."),
            'why_interesting': (
                f"It persisted for {avg_d} days on average, peaked at {mx} days, "
                f"and generated {b['total_negative_items']} tagged negative evidence items."),
            'score': score, 'entities_affected': n,
            'sectors_affected': len(b['sectors']), 'avg_duration_days': avg_d,
            'max_duration_days': mx, 'episode_count': len(durations),
            'total_negative_items': b['total_negative_items'],
            'display_tag': b['display_tag'],
            'sample_entities': [b['entity_names'].get(e, e) for e, _ in top],
            'sample_sectors': [s for s, _ in top_sectors]})

    for b in by_sector.values():
        durations = []
        for ds in b['entity_days'].values():
            durations.extend(consecutive_day_durations(list(ds)))
        if not durations:
            continue
        n = len(b['entity_days'])
        avg_d = rnd(sum(durations) / len(durations), 2)
        med = float(median(durations))
        mx = max(durations)
        top_tags = sorted(b['tag_negative_item_totals'].items(),
                          key=lambda kv: (-kv[1], kv[0].casefold()))[:3]
        top = sorted(b['entity_negative_item_totals'].items(),
                     key=lambda kv: (-kv[1], b['entity_names'].get(kv[0], '').casefold()))[:3]
        score = rnd(avg_d * 3 + n * 3 + b['total_negative_items'] * 0.18, 2)
        cands.append({**base_none,
            'storyline_key': f"sector_duration:{b['sector']}",
            'storyline_type': 'sector_duration_outlier',
            'headline': f"{b['sector']} crises lingered in search",
            'angle': (f"{b['sector']} showed one of the more persistent "
                      f"search-visible crisis patterns for {n} {plural} in the selected window."),
            'why_interesting': (
                f"Average duration was {avg_d} days, the median episode lasted {med} days, "
                f"and the strongest themes were {', '.join(t for t, _ in top_tags[:2]) or 'mixed'}."),
            'score': score, 'entities_affected': n, 'avg_duration_days': avg_d,
            'median_duration_days': med, 'max_duration_days': mx,
            'episode_count': len(durations),
            'total_negative_items': b['total_negative_items'],
            'sector': b['sector'],
            'dominant_tags': [t for t, _ in top_tags],
            'sample_entities': [b['entity_names'].get(e, e) for e, _ in top],
            'sample_sectors': [b['sector']]})
    return cands


def find_storylines(cands, limit=3):  # app.py:5022-5057
    cands = sorted(cands, key=lambda r: (
        0 if r['storyline_type'] == 'cross_sector_narrative' else 1,
        -(r['score'] or 0), (r['headline'] or '').casefold()))
    selected, keys = [], set()
    for st in ['cross_sector_narrative', 'sector_duration_outlier', 'sector_tag_pattern']:
        m = next((r for r in cands if r['storyline_type'] == st
                  and r['storyline_key'] not in keys), None)
        if m:
            selected.append(m)
            keys.add(m['storyline_key'])
        if len(selected) >= limit:
            break
    if len(selected) < limit:
        for r in sorted(cands, key=lambda i: (-(i['score'] or 0),
                                              (i['headline'] or '').casefold())):
            if r['storyline_key'] in keys:
                continue
            selected.append(r)
            keys.add(r['storyline_key'])
            if len(selected) >= limit:
                break
    return selected


# find_storylines default: non-crisis rows dropped before building
filtered = [r for r in rows
            if normalized_narrative_group(
                (r.get('narrative_primary_tag') or '').strip(),
                r.get('narrative_primary_group'),
                r.get('narrative_is_crisis')) != 'non_crisis']
storyline_cands = build_storyline_candidates('brand', filtered)
storyline_sel = find_storylines(storyline_cands, 3)


def dump(name, data):
    with open(os.path.join(GOLD, name), "w") as f:
        if isinstance(data, list):
            for r in data:
                f.write(json.dumps(r) + "\n")
        else:
            f.write(json.dumps(data) + "\n")
    print(f"{name}: {len(data) if isinstance(data, list) else 1} rows")


dump("insights_crisis_patterns.jsonl", crisis_patterns(False))
dump("insights_crisis_patterns_all.jsonl", crisis_patterns(True))
dump("insights_industry_durations.jsonl", industry_durations(False))
sb_rows, sb_summary, sb_peer = sector_baseline("Tech")
dump("insights_sector_baseline_rows.jsonl", sb_rows)
dump("insights_sector_baseline_summary.jsonl", sb_summary)
dump("insights_sector_baseline_peer.jsonl", sb_peer)
dump("storyline_candidates.jsonl",
     sorted(storyline_cands, key=lambda r: (r["storyline_key"], -r["score"])))
dump("storyline_selection.jsonl", storyline_sel)
print(f"narrative fixture rows: {len(rows)}; metric rows: {len(metrics_rows)}")
