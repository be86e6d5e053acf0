"""URL normalization/domain functions vs a Python urllib oracle."""

from __future__ import annotations

from urllib.parse import urlsplit, parse_qsl

from pyspark.sql import functions as F

from lisp_batch_processor_spark.functions.urls import (
    TRACKING_PARAMS, filter_domain_blocklist, normalize_url,
    registered_domain, url_host)

URLS = [
    "http://www.Example.COM/path/page?utm_source=x&b=2&a=1#frag",
    "https://example.com:443/path/page?a=1&b=2",
    "http://example.com:80/",
    "http://example.com:8080/x",
    "https://sub.shop.example.co.uk/item?id=7&fbclid=zz",
    "http://192.168.0.1/admin",
    "https://bbc.co.uk",
    "http://example.com/?gclid=abc",
    "not a url at all",
    None,
]


def _oracle(u):
    if u is None:
        return None
    s = urlsplit(u)
    if not s.scheme or not s.netloc:
        return None
    host = s.hostname or ""
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    scheme = s.scheme.lower()
    port = ""
    if s.port is not None and not (
            (scheme, s.port) in (("http", 80), ("https", 443))):
        port = f":{s.port}"
    path = s.path or "/"
    drop = {p.lower() for p in TRACKING_PARAMS}
    kept = sorted(f"{k}={v}" if v != "" or "=" in pair else pair
                  for pair, (k, v) in
                  ((p, p.split("=", 1) if "=" in p else (p, ""))
                   for p in s.query.split("&") if p)
                  if k.lower() not in drop)
    q = "?" + "&".join(kept) if kept else ""
    return f"{scheme}://{host}{port}{path}{q}"


def test_normalize_url_matches_urllib_oracle(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [r[0] for r in
           df.select(normalize_url("url")).collect()]
    want = [_oracle(u) for u in URLS]
    assert got == want
    # Tracking params stripped, survivors sorted, www./port/fragment
    # gone — variants differing only in transport noise share a key.
    assert got[0] == "http://example.com/path/page?a=1&b=2"
    assert got[1] == "https://example.com/path/page?a=1&b=2"
    assert got[7] == "http://example.com/"


def test_host_and_registered_domain(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    rows = df.select(url_host("url").alias("h"),
                     registered_domain("url").alias("d")).collect()
    hosts = [r["h"] for r in rows]
    doms = [r["d"] for r in rows]
    assert hosts[0] == "example.com"
    assert hosts[4] == "sub.shop.example.co.uk"
    assert doms[4] == "example.co.uk"        # two-part suffix
    assert doms[5] == "192.168.0.1"          # IP literal unchanged
    assert doms[6] == "bbc.co.uk"
    assert doms[8] is None and doms[9] is None


def test_filter_domain_blocklist(spark):
    docs = spark.createDataFrame(
        [(1, "https://spam.example.com/x"),
         (2, "https://keep.org/y"),
         (3, "http://www.EXAMPLE.com/z"),
         (4, None)],
        "doc_id long, url string")
    blocked = spark.createDataFrame([("Example.com",)], "domain string")
    out = filter_domain_blocklist(docs, blocked)
    assert sorted(r.doc_id for r in out.collect()) == [2, 4]
    assert out.columns == ["doc_id", "url"]
