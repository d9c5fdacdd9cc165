#!/usr/bin/env python3
"""Generate differential parity goldens for the URL/text kernels.

Runs the REFERENCE's own pure functions (src/url_utils.py, src/risk_rules.py)
plus CPython difflib over an adversarial input battery and dumps JSON goldens;
UrlParitySpec asserts graft.functions.{UrlFunctions,RiskRules,TextLookup}
reproduce every output bit-for-bit.

Run from repo root:  python3 tools/gen_url_goldens.py
(dev-time tool; uses the driver-side python3)
"""
import difflib
import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "src/test/resources/goldens")
os.makedirs(GOLD, exist_ok=True)


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


url_utils = load("url_utils", "/root/reference/src/url_utils.py")
risk_rules = load("risk_rules", "/root/reference/src/risk_rules.py")

URLS = [
    # clean
    "https://www.example.com/news/story?utm_source=x&b=2&a=1",
    "http://example.com/a//b///c?z=9&a=1#frag",
    "HTTP://WWW.Example.COM:8080/Path/",
    # messy real-world
    "http://exa mple.com/Path/X",
    "http://my_host.com/x",
    "example.com/path",
    "www.example.com/path?a=1",
    "http://a.com/x;jsessionid=abc?q=1",
    "weird://a.com/x;y",
    "http://user:pw@Host.com:8080/p?k=v",
    "  http://leading-space.com/b",
    "http://tab\tand\nnewline.com/x",
    "http://a.com/%C3%A9?k=%C3%A9&x=%zz&y=a+b&z",
    "http://a.com?a=&b",
    "http://a.com/x?utm_campaign=c&gaa_sig=s&gclid=g&keep=1",
    "http://xn--bcher-kva.de/path",
    "http://bücher.de/path",
    "//protocol-relative.com/x",
    "http://",
    "http:///path-only",
    "ftp://files.example.com/a;type=i",
    "http://[2001:db8::1]/x",
    "http://[::1]:8080/y?a=1",
    "http://a.com/x#b?c",
    "http://a.com/Ümlaut Pfad/file näme.html?söme=välue",
    "https://www.wwwabc.com/www.test/?www.k=www.v",
    "http://WWW.UPPER.com/WWW.path",
    "mailto:someone@example.com",
    "javascript:alert(1)",
    "http://a.com/x?a=1&a=2&A=0",
    "http://a.com/x?%6b=%76",
    "123:foo/bar",
    "+tel:123",
    "http://a.com/triple///slash//x",
    "   ",
    "",
    # NFKC netloc spoofing guard (CPython _checknetloc raises -> reference "")
    "http://a\u2100b.com/x",
    "http://ex\u00e4mple.com/ok",
    # non-BMP query keys: Python sorts pairs by code point
    "http://a.com/x?\uffa0=1&\U0001F600=2&b=3",
    # bracketed hosts: lowercase-v IPvFuture ok, uppercase V raises
    "http://[vdead.beef]/x",
    "http://[Vdead.beef]/x",
    "http://sub.www.deep.www.com/x",
    "http://a.com/search?q=hello world&lang=en us",
]

CONTROL_CASES = [
    # (company, url, domains, entity_type, person_name, publisher)
    ("Acme Corporation", "https://www.acme.com/about/", {"Acme Corporation": {"acme.com"}}, "company", None, None),
    ("Acme Corporation", "https://news.site.com/acme-story", {"Acme Corporation": {"acme.com"}}, "company", None, "Reuters"),
    ("Acme Corporation", "https://www.facebook.com/acme/posts/123", {}, "company", None, None),
    ("Acme Corporation", "https://www.facebook.com/acme", {}, "company", None, None),
    ("Acme Corporation", "https://instagram.com/acme/p/xyz/", {}, "company", None, None),
    ("Acme Corporation", "https://instagram.com/acme/", {}, "company", None, None),
    ("Acme Corporation", "https://www.threads.net/@acme/posts/1", {}, "company", None, None),
    ("Acme Corporation", "https://www.youtube.com/user/AcmeChannel", {}, "company", None, None),
    ("Acme Corporation", "https://www.youtube.com/User/AcmeChannel", {}, "company", None, None),
    ("Acme Corporation", "https://www.youtube.com/@acmecorp/videos", {}, "company", None, None),
    ("Acme Corporation", "https://www.youtube.com/watch?v=123", {}, "company", None, None),
    ("Acme Corporation", "https://www.linkedin.com/company/acme-corporation/", {}, "company", None, None),
    ("Acme Corporation", "https://www.linkedin.com/Company/acme/", {}, "company", None, None),
    ("Acme Corporation", "https://x.com/acme/status/123", {}, "company", None, None),
    ("Acme Corporation", "https://x.com/AcmeCorp", {}, "company", None, None),
    ("Acme Corporation", "https://twitter.com/acme", {}, "company", None, None),
    ("Acme Corporation", "https://acme.substack.com/p/post", {}, "company", None, None),
    ("Acme Corporation", "https://apps.apple.com/us/app/acme/id1", {}, "company", None, None),
    ("Acme Corporation", "http://exa mple.com/acme", {}, "company", None, None),
    ("Acme Corporation", "http://acme_store.my_host.com/x", {}, "company", None, None),
    ("Jane Doe", "https://www.linkedin.com/in/jane-doe-123/", {}, "ceo", "Jane Doe", None),
    ("Acme Corporation", "https://www.linkedin.com/In/jane-doe/", {}, "ceo", "Jane Doe", None),
    ("Acme Corporation", "https://en.wikipedia.org/wiki/Jane_Doe", {}, "ceo", "Jane Doe", None),
    ("Acme Corporation", "https://x.com/janedoe", {}, "ceo", "Jane Doe", None),
    ("Acme Corporation", "https://acme.com/leadership/jane", {"Acme Corporation": {"acme.com"}}, "ceo", "Jane Doe", None),
    ("Acme Corporation", "https://somesite.com/about/acme", {}, "ceo", "Jane Doe", None),
    ("Globex Group", "https://globex.io/products", {"Globex Group": {"globex.com", "globex.io"}}, "company", None, None),
    ("Globex Group", "https://blog.globex.com/post", {"Globex Group": {"globex.com", "globex.io"}}, "company", None, None),
    ("Globex Group", "https://globexnews.com/story", {}, "company", None, "Globex News"),
    ("The Example Company", "https://example.othersite.com/x", {}, "company", None, None),
]

FINANCE_CASES = [
    ("Acme Q3 earnings beat estimates", "", "https://cnn.com/x", ""),
    ("Acme opens new factory", "revenue is up", "https://cnn.com/x", ""),
    ("Acme opens new factory", "", "https://finance.yahoo.com/x", ""),
    ("Is Acme stock a buy?", "", "https://fool.com/x", "Motley Fool"),
    ("Acme (NYSE: ACM) expands", "", "https://site.com/x", ""),
    ("Acme (NYSE:ACM) expands", "", "https://site.com/x", ""),
    ("Acme lawsuit over fraud", "", "https://marketwatch.com/x", ""),
    ("Acme hit with class action", "shares tumble", "https://cnn.com/x", ""),
    ("Acme CEO steps down", "", "http://my_host.com/x", ""),
    ("Plain story", "", "http://exa mple.com/x", ""),
]

RATIO_CASES = [
    ("acme corporation", "acme corp"),
    ("globex", "globex group"),
    ("initech", "intertech"),
    ("abcdef", "fedcba"),
    ("", ""),
    ("a", ""),
    ("same", "same"),
    ("kitten", "sitting"),
    ("the quick brown fox jumps over the lazy dog", "the quick brown dog jumps over the lazy fox"),
    # autojunk territory: b longer than 199 chars with popular chars
    ("a" * 50 + "xyz", "a" * 250 + "xyz"),
    ("abc " * 30, ("abc " * 60) + "tail"),
    ("x" + "ab" * 120, "ab" * 130),
    ("mississippi river delta", "m" + "is" * 110 + " river"),
    ("acme corporation inc", "a" * 5 + ("cme corporation " * 14) + "zz"),
]

norm_rows = []
for u in URLS:
    try:
        norm_rows.append({"in": u, "out": url_utils.normalize_url(u), "err": False})
    except Exception:
        norm_rows.append({"in": u, "out": "", "err": True})
hash_rows = []
for u in URLS:
    try:
        hash_rows.append({"in": u, "out": url_utils.url_hash(u), "err": False})
    except Exception:
        hash_rows.append({"in": u, "out": "", "err": True})
host_rows = [{"in": u, "out": risk_rules.hostname(u)} for u in URLS]
control_rows = [
    {"company": c, "url": u, "domains": sorted(d.get(c, set())), "entity_type": t,
     "person": p, "publisher": pub,
     "out": risk_rules.classify_control(c, u, d, entity_type=t, person_name=p, publisher=pub)}
    for (c, u, d, t, p, pub) in CONTROL_CASES
]
finance_rows = [
    {"title": t, "snippet": s, "url": u, "source": src,
     "out": risk_rules.is_financial_routine(t, s, u, src)}
    for (t, s, u, src) in FINANCE_CASES
]
ratio_rows = [
    {"a": a, "b": b, "out": difflib.SequenceMatcher(None, a, b).ratio()}
    for (a, b) in RATIO_CASES
]

out = {
    "normalize_url": norm_rows,
    "url_hash": hash_rows,
    "hostname": host_rows,
    "classify_control": control_rows,
    "is_financial_routine": finance_rows,
    "sequence_matcher_ratio": ratio_rows,
}
path = os.path.join(GOLD, "url_text_parity.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1, ensure_ascii=False)
print(f"wrote {path}:", {k: len(v) for k, v in out.items()})
