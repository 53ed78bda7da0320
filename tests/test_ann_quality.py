"""ANN index quality gate: recall@k floors against the exact baseline.

``ann_recall_eval`` *reports* recall (and is oracle-checked for arithmetic
parity); this suite *gates* it, so an index regression — a lost hash table,
a dropped probe bucket, a broken centroid assignment — fails loudly instead
of silently shipping a lower number. Floors sit well under the measured
values (LSH 0.80–0.87 via 3 tables ∪ 1-bit multi-probe, IVF 0.93–1.0 at
2-probe, measured across sf0.001/0.01/0.1) but far above what a degraded
index produces (single-table LSH measured 0.13 on the same fixtures).
Floors were tightened 0.6/0.8 → 0.7/0.85 in round 5 once the multi-probe
tables had soaked a round (VERDICT r4 item 8), so a lost probe bucket or
table now fails even when the remaining index is merely "pretty good".
"""

from __future__ import annotations

import pytest

from amazon_climate_data_etl_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_ivfpq_topk,
    ann_pq_topk,
    ann_recall_eval,
)

_FLOORS = {"lsh": 0.7, "ivf": 0.85, "pq": 0.7, "ivfpq": 0.6}


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ann_recall_floors(spark, sf):
    got = {r["method"]: r["recall_at_k"] for r in ann_recall_eval(spark, sf).collect()}
    assert set(got) == set(_FLOORS)
    for method, floor in _FLOORS.items():
        assert got[method] >= floor, (
            f"{method} recall@k {got[method]} fell below the {floor} floor at {sf}"
        )


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_pq_recall_floor(spark, sf):
    """PQ ADC-shortlist + exact rerank against the brute-force truth.
    Measured 1.0 / 0.93 / 0.87 at sf0.001/0.01/0.1 with the 128-deep
    shortlist; floored at 0.7 so a broken codebook, a mis-sliced
    subspace, or a collapsed shortlist fails loudly while honest
    shortlist-miss noise does not."""
    bf = {(r["query_id"], r["cand_id"])
          for r in ann_bruteforce_topk(spark, sf).collect()}
    pq = {(r["query_id"], r["cand_id"])
          for r in ann_pq_topk(spark, sf).collect()}
    recall = len(bf & pq) / len(bf)
    assert recall >= 0.7, f"PQ recall@k {recall} fell below 0.7 at {sf}"


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ivfpq_recall_floor(spark, sf):
    """IVF-PQ composition against the brute-force truth. Measured
    0.93 / 0.87 at sf0.001/0.01 (2-probe pruning loses a little recall
    over plain PQ, as it should); floored at 0.6 — below honest
    probe-miss noise, far above a broken assignment or probe selection
    (a wrong cell map measured ~0.1)."""
    bf = {(r["query_id"], r["cand_id"])
          for r in ann_bruteforce_topk(spark, sf).collect()}
    iv = {(r["query_id"], r["cand_id"])
          for r in ann_ivfpq_topk(spark, sf).collect()}
    recall = len(bf & iv) / len(bf)
    assert recall >= 0.6, f"IVF-PQ recall@k {recall} fell below 0.6 at {sf}"


def test_spectrum_merge_preserves_predecessor_values(spark):
    """The r13 merge contract: embedding_spectrum_profile's cov frame
    must equal embedding_covariance row-for-row and its component frame
    must equal embedding_top_component — the merge shares one kernel
    pass but may not change a single value."""
    from amazon_climate_data_etl_spark.operators.similarity import (
        embedding_covariance,
        embedding_spectrum_profile,
        embedding_top_component,
    )

    sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    prof = embedding_spectrum_profile(spark, sf).collect()
    spark.catalog.clearCache()
    cov = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(spark, sf).collect()}
    spark.catalog.clearCache()
    comp = {
        r["k"]: (r["component_q"], r["component"])
        for r in embedding_top_component(spark, sf).collect()
    }
    got_cov = {(r.i, r.j): r.value for r in prof if r.frame == "cov"}
    got_comp = {r.i: (r.value_q, r.value) for r in prof if r.frame == "component"}
    assert got_cov == cov
    assert got_comp == comp
    assert all(r.value_q is None for r in prof if r.frame == "cov")
    assert all(r.j == -1 for r in prof if r.frame == "component")
