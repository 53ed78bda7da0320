"""Pure-Python recomputation twin for the URL canonicalizer (r12).

The engines canonicalize with regex/array Column expressions
(operators/curation.url_canonical_columns); this twin replays the rules
with urllib-free straight-line Python over a combinatorial URL universe
(every component crossed with every other), so a rule bug that both
engines share — the class DuckDB parity cannot catch — fails a value
comparison here. Same pattern as tests/test_media_twin.py.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.operators.curation import (
    _URL_MULTI_SUFFIX,
    url_canonical_columns,
)


def _twin_canon(url: str) -> tuple[str, str, str]:
    """(canon, host, domain) by hand — independent of the engines' regex
    derivations."""
    nofrag = url.split("#", 1)[0]
    scheme, sep, rest = nofrag.partition("://")
    if not sep:
        scheme, rest = "", nofrag
    scheme = scheme.lower()
    hostport = rest.split("/", 1)[0].split("?", 1)[0].lower()
    host, port = hostport, ""
    if ":" in hostport:
        maybe_host, maybe_port = hostport.rsplit(":", 1)
        if maybe_port.isdigit():
            host, port = maybe_host, maybe_port
    after_host = rest[len(hostport):]
    path = after_host.split("?", 1)[0] or "/"
    qs = after_host.split("?", 1)[1] if "?" in after_host else ""
    kept = [p for p in qs.split("&") if p and not p.startswith("utm_")]
    default = (scheme == "http" and port == "80") or (
        scheme == "https" and port == "443"
    )
    canon = (
        scheme + "://" + host
        + (f":{port}" if port and not default else "")
        + path
        + ("?" + "&".join(kept) if kept else "")
    )
    labels = host.split(".")
    domain = host
    for suf in _URL_MULTI_SUFFIX:
        if host.endswith("." + suf):
            domain = ".".join(labels[-3:])
            break
    else:
        if len(labels) >= 2:
            domain = ".".join(labels[-2:])
    return canon, host, domain


def _universe() -> list[str]:
    """Combinatorial URL universe crossing every component class."""
    schemes = ["http", "HTTPS", "Ftp"]
    hosts = [
        "Site1.com", "www.site2.co.uk", "M.Deep.Sub.site3.com.br",
        "localhost", "a.b",
    ]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/P/1", "/a/b.html"]
    queries = ["", "?utm_source=x", "?a=1&utm_m=2&b=3", "?utm_a=1&utm_b=2"]
    frags = ["", "#f", "#f?utm_fake=1"]
    urls = [
        s + "://" + h + po + pa + q + f
        for s, h, po, pa, q, f in itertools.product(
            schemes, hosts, ports, paths, queries, frags
        )
    ]
    # component-free stragglers the regexes must not trip on
    urls += ["http://x.com", "https://Y.CO.UK:443?utm_only=1#z"]
    return urls


def test_url_canonical_twin_exact(spark):
    urls = _universe()
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    cols = url_canonical_columns(F.col("url"))
    got = {
        r["i"]: (r["canon"], r["host"], r["domain"])
        for r in df.select(
            "i",
            cols["canon"].alias("canon"),
            cols["host"].alias("host"),
            cols["domain"].alias("domain"),
        ).collect()
    }
    bad = []
    for i, u in enumerate(urls):
        want = _twin_canon(u)
        if got[i] != want:
            bad.append((u, got[i], want))
    assert not bad, bad[:5]
