"""Hand-derivable URL-canonicalization semantics (r12).

DuckDB parity (edge/fuzz suites + the driver gate) proves both engines
AGREE; these cases prove the rules are RIGHT — each input/output pair is
derivable by hand from the documented contract (lower-case scheme+host,
drop fragment, drop utm_* params keeping real params in order, drop the
scheme-default port only, empty path → '/', registrable domain = last
two labels or last three under a multi-part suffix).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.operators.curation import (
    _URL_BLOCKLIST,
    synth_url,
    url_canonical_columns,
    url_domain_profile,
)

CASES = [
    # (raw, canonical, host, registrable domain)
    (
        "HTTPS://WWW.Example.COM:443/Path?utm_source=x&q=1#frag",
        "https://www.example.com/Path?q=1",
        "www.example.com",
        "example.com",
    ),
    # default port dropped only for the matching scheme
    ("http://a.example.com:80/x", "http://a.example.com/x", "a.example.com", "example.com"),
    ("http://a.example.com:443/x", "http://a.example.com:443/x", "a.example.com", "example.com"),
    ("https://a.example.com:8080/x", "https://a.example.com:8080/x", "a.example.com", "example.com"),
    # empty path normalizes; all-tracking query disappears entirely
    ("http://b.org?utm_medium=email", "http://b.org/", "b.org", "b.org"),
    ("http://b.org#only-frag", "http://b.org/", "b.org", "b.org"),
    # real params keep their original order; utm_* drop from anywhere
    (
        "http://c.net/p?a=1&utm_x=2&b=3&utm_y=4",
        "http://c.net/p?a=1&b=3",
        "c.net",
        "c.net",
    ),
    # multi-part public suffix takes three labels; plain TLD takes two
    ("http://deep.sub.site.co.uk/", "http://deep.sub.site.co.uk/", "deep.sub.site.co.uk", "site.co.uk"),
    ("http://deep.sub.site.com/", "http://deep.sub.site.com/", "deep.sub.site.com", "site.com"),
    # single-label host: no second label to take — the host itself
    ("http://localhost/x", "http://localhost/x", "localhost", "localhost"),
    # '?' inside the fragment belongs to the fragment, not the query
    ("http://d.com/x#f?utm_source=y", "http://d.com/x", "d.com", "d.com"),
]


def test_canonicalization_cases(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, *_ ) in enumerate(CASES)], "i long, url string")
    cols = url_canonical_columns(F.col("url"))
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            cols["canon"].alias("canon"),
            cols["host"].alias("host"),
            cols["domain"].alias("domain"),
        ).collect()
    }
    for i, (raw, canon, host, domain) in enumerate(CASES):
        assert got[i]["canon"] == canon, (raw, got[i]["canon"])
        assert got[i]["host"] == host, (raw, got[i]["host"])
        assert got[i]["domain"] == domain, (raw, got[i]["domain"])


def test_canonicalization_idempotent(spark):
    """canon(canon(url)) == canon(url) — the fixed-point property every
    canonicalizer needs (mirrors crawl frontier re-visits)."""
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, *_ ) in enumerate(CASES)], "i long, url string"
    )
    once = df.select(
        "i", url_canonical_columns(F.col("url"))["canon"].alias("url")
    )
    twice = once.select(
        "i", url_canonical_columns(F.col("url"))["canon"].alias("url")
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_profile_shares_and_blocklist(spark):
    rows = url_domain_profile(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no domains"
    # shares are a partition of 1 (rounded), cumulative share is monotone
    # in token-desc order and ends at 1
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-3
    by_tokens = sorted(rows, key=lambda r: (-r.n_tokens, r.domain))
    cums = [r.cum_token_share for r in by_tokens]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-9
    # blocklist verdicts fire exactly on the synthesized block domains
    assert {r.domain for r in rows if r.blocked} == set(_URL_BLOCKLIST)
    # canonicalization accounting discriminates: some changed, some not
    changed = sum(r.n_canonicalized for r in rows)
    total = sum(r.n_docs for r in rows)
    assert 0 < changed < total


def test_synth_exercises_every_rule(spark):
    """The synthesized raw-URL universe must hit each canonicalization
    rule at least once — otherwise the profile stops certifying them."""
    df = spark.range(0, 500).select(synth_url(F.col("id")).alias("url"))
    urls = [r.url for r in df.collect()]
    assert any("#" in u for u in urls)
    assert any("utm_" in u for u in urls)
    assert any(":80/" in u for u in urls)  # default port + non-empty path
    assert any(":443" in u and ":8080" not in u for u in urls)
    assert any(":8080" in u for u in urls)
    assert any("WWW." in u for u in urls)
    assert any("Site" in u for u in urls)
    assert any(".co.uk" in u for u in urls)
    assert any(u.startswith("HTTPS://") for u in urls)
