"""Edge behavior of the generic HTML extraction stage on hand-written —
including malformed — markup.

The extraction contract is regex-based, not a parser: ``<[^>]*>`` means a
tag ends at the FIRST '>', so a '>' inside an attribute value leaks the
remainder into visible text, and an unclosed '<a href=' with no '>' is not
a tag at all (it stays visible verbatim). These are deliberate,
documented, deterministic rules — the same ones C4's line-level cleaner
family applies at corpus scale — and this suite pins them so the Spark
expressions and the DuckDB oracle can never drift apart silently: every
case is asserted against hand-derived values AND replayed through the
oracle's SQL fragments on the same strings.
"""

from __future__ import annotations

import duckdb
import pytest

from amazon_climate_data_etl_spark.operators.textops import (
    _is_content_sql,
    _strip_sql,
    html_extract_stage,
)

CASES = [
    # (name, html, expected row dict)
    (
        "plain_kept_line",
        "<p>alpha beta gamma delta epsilon zeta.</p>",
        dict(n_lines=1, n_kept=1, n_tags=2, link_chars=0,
             clean="alpha beta gamma delta epsilon zeta."),
    ),
    (
        "short_line_dropped",
        "<p>tiny line.</p>",
        dict(n_lines=1, n_kept=0, n_tags=2, link_chars=0, clean=""),
    ),
    (
        "no_terminal_punct_dropped",
        "<p>alpha beta gamma delta epsilon zeta</p>",
        dict(n_lines=1, n_kept=0, n_tags=2, link_chars=0, clean=""),
    ),
    (
        "link_dense_dropped",
        '<p><a href="/x">alpha beta gamma delta epsilon.</a></p>',
        dict(n_lines=1, n_kept=0, n_tags=4, link_chars=31, clean=""),
    ),
    (
        "mild_link_kept",
        '<p><a href="/x">see</a> alpha beta gamma delta epsilon zeta eta.</p>',
        # anchor 3 chars, visible 44 chars: 3*10 <= 3*44 → kept
        dict(n_lines=1, n_kept=1, n_tags=4, link_chars=3,
             clean="see alpha beta gamma delta epsilon zeta eta."),
    ),
    (
        "nested_tags_stripped",
        "<div><p><b>alpha</b> beta gamma <i>delta</i> epsilon zeta.</p></div>",
        dict(n_lines=1, n_kept=1, n_tags=8, link_chars=0,
             clean="alpha beta gamma delta epsilon zeta."),
    ),
    (
        # '>' inside an attribute value ends the tag at the FIRST '>':
        # the rest of the attribute leaks into visible text (documented)
        "gt_in_attribute_leaks",
        '<p title="a>b">alpha beta gamma delta epsilon zeta.</p>',
        dict(n_lines=1, n_kept=1, n_tags=2, link_chars=0,
             clean='b">alpha beta gamma delta epsilon zeta.'),
    ),
    (
        # an unclosed tag (no '>') never matches <[^>]*>: it stays visible
        "unclosed_tag_visible",
        '<a href="/x alpha beta gamma delta epsilon zeta.',
        dict(n_lines=1, n_kept=1, n_tags=0, link_chars=0,
             clean='<a href="/x alpha beta gamma delta epsilon zeta.'),
    ),
    (
        # anchor regex needs a closing </a>; unterminated anchors count
        # tags but contribute no link chars
        "unterminated_anchor_no_link_chars",
        '<p><a href="/x">alpha beta gamma delta epsilon zeta.</p>',
        dict(n_lines=1, n_kept=1, n_tags=3, link_chars=0,
             clean="alpha beta gamma delta epsilon zeta."),
    ),
    (
        "empty_and_blank_lines",
        "<p>alpha beta gamma delta epsilon zeta.</p>\n\n<p></p>",
        dict(n_lines=3, n_kept=1, n_tags=4, link_chars=0,
             clean="alpha beta gamma delta epsilon zeta."),
    ),
    (
        "empty_doc",
        "",
        dict(n_lines=1, n_kept=0, n_tags=0, link_chars=0, clean=""),
    ),
]


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame(
        [(i, html) for i, (_, html, _) in enumerate(CASES)], "doc_id long, html string"
    )
    rows = {r.doc_id: r for r in html_extract_stage(df).collect()}
    return rows


@pytest.mark.parametrize("idx", range(len(CASES)), ids=[c[0] for c in CASES])
def test_extract_stage_hand_derived(extracted, idx):
    name, html, want = CASES[idx]
    r = extracted[idx]
    assert r.n_lines == want["n_lines"], name
    assert r.n_kept == want["n_kept"], name
    assert r.n_tags == want["n_tags"], name
    assert r.link_chars == want["link_chars"], name
    assert r.clean_chars == len(want["clean"]), name
    import hashlib

    assert r.clean_md5 == hashlib.md5(want["clean"].encode()).hexdigest(), name


@pytest.mark.parametrize("idx", range(len(CASES)), ids=[c[0] for c in CASES])
def test_oracle_fragments_agree_on_edges(idx):
    """Replay the oracle's per-line SQL fragments over the same edge
    strings: the DuckDB side must reach the same keep/drop verdicts and
    the same stripped text — fragment-level proof the two dialects can't
    drift on malformed markup (the parity suite only sees generated,
    well-formed markup)."""
    name, html, want = CASES[idx]
    conn = duckdb.connect()
    lines = html.split("\n")
    stripped = [
        conn.execute(
            f"SELECT {_strip_sql('l')} FROM (SELECT ? AS l)", [line]
        ).fetchone()[0]
        for line in lines
    ]
    keeps = [
        bool(
            conn.execute(
                f"SELECT {_is_content_sql('l')} FROM (SELECT ? AS l)", [line]
            ).fetchone()[0]
        )
        for line in lines
    ]
    assert sum(keeps) == want["n_kept"], name
    clean = "\n".join(s for s, k in zip(stripped, keeps) if k)
    assert clean == want["clean"], name
