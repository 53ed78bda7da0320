"""Hand-derived contracts for the generic PII detect+redact stage,
including the ORDER contract (emails before IPs before phones) and
dialect-fragment agreement on adversarial strings — the same
fragment-replay pattern as tests/test_html_extract.py."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from amazon_climate_data_etl_spark.operators.textops import (
    _PII_RULES,
    pii_redact_stage,
)

CASES = [
    (
        "plain_email",
        "write to jo.doe+x@sub.example.org today",
        dict(n_email=1, n_ip=0, n_phone=0,
             clean="write to <EMAIL> today"),
    ),
    (
        # the email pattern requires an ALPHABETIC tld (\.[A-Za-z]{2,}),
        # so a raw-IP "host" is not an email — the address part survives
        # and the IP inside it redacts (both engines agree; documented)
        "email_host_is_raw_ip",
        "ping admin@10.0.0.12 now",
        dict(n_email=0, n_ip=1, n_phone=0, clean="ping admin@<IP> now"),
    ),
    (
        # an alphabetic-tld host with digit labels IS an email, and
        # email-first ordering keeps the ip counter from ever seeing it
        "email_with_digit_host_labels",
        "ping admin@10.0.0.12.example.com now",
        dict(n_email=1, n_ip=0, n_phone=0, clean="ping <EMAIL> now"),
    ),
    (
        "bare_ip_and_phone",
        "from 192.168.0.1 call 555-0199",
        dict(n_email=0, n_ip=1, n_phone=1,
             clean="from <IP> call <PHONE>"),
    ),
    (
        # 3-1-4 digits inside an IP octet run must not double-count as a
        # phone: \b…\b plus the ip-first order keeps them disjoint
        "phone_digits_inside_ip",
        "node 555-1234 at 255.255.255.255 end",
        dict(n_email=0, n_ip=1, n_phone=1,
             clean="node <PHONE> at <IP> end"),
    ),
    (
        # word boundaries: digits glued to letters are NOT a phone, and a
        # 5th octet breaks the \b…\b ip match at that position
        "boundary_negatives",
        "id555-1234x and 1.2.3.4.5 tail",
        dict(n_email=0, n_ip=1, n_phone=0,
             # \b[0-9]{1,3}(\.[0-9]{1,3}){3}\b scans left-to-right:
             # '1.2.3.4' matches, the trailing '.5' survives
             clean="id555-1234x and <IP>.5 tail"),
    ),
    (
        "multiple_emails",
        "a@b.co c@d.io",
        dict(n_email=2, n_ip=0, n_phone=0, clean="<EMAIL> <EMAIL>"),
    ),
    (
        "no_pii",
        "nothing sensitive here at all",
        dict(n_email=0, n_ip=0, n_phone=0,
             clean="nothing sensitive here at all"),
    ),
    ("empty", "", dict(n_email=0, n_ip=0, n_phone=0, clean="")),
]


@pytest.fixture(scope="module")
def redacted(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (_, t, _) in enumerate(CASES)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in pii_redact_stage(df).collect()}


@pytest.mark.parametrize("idx", range(len(CASES)), ids=[c[0] for c in CASES])
def test_stage_hand_derived(redacted, idx):
    name, text, want = CASES[idx]
    r = redacted[idx]
    assert (r.n_email, r.n_ip, r.n_phone) == (
        want["n_email"], want["n_ip"], want["n_phone"]), name
    assert r.n_pii == want["n_email"] + want["n_ip"] + want["n_phone"], name
    assert r.chars_delta == len(text) - len(want["clean"]), name
    assert r.redacted_md5 == hashlib.md5(want["clean"].encode()).hexdigest(), name


@pytest.mark.parametrize("idx", range(len(CASES)), ids=[c[0] for c in CASES])
def test_oracle_fragments_agree_on_edges(idx):
    """Replay the oracle's count + ordered-redact fragments in DuckDB on
    the same strings — RE2 must reach the Java-regex verdicts exactly."""
    name, text, want = CASES[idx]
    conn = duckdb.connect()
    stage = "t"
    counts = []
    for _, p, rep in _PII_RULES:
        counts.append(f"len(regexp_extract_all({stage}, '{p}'))")
        stage = f"regexp_replace({stage}, '{p}', '{rep}', 'g')"
    row = conn.execute(
        f"SELECT {', '.join(counts)}, {stage} FROM (SELECT ? AS t)", [text]
    ).fetchone()
    assert row[:3] == (want["n_email"], want["n_ip"], want["n_phone"]), name
    assert row[3] == want["clean"], name
