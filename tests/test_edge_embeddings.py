"""Adversarial embeddings parity: the similarity-family queries run against
a crafted vector table — zero vectors, empty and NULL embeddings, exact
duplicates and scaled copies (cosine-1.0 rank ties), duplicate IVF
centroids, components exactly 0.0 in the sign-bucket dims, tiny magnitudes —
and must match the DuckDB oracle bit-exactly.

The driver's synthetic embeddings are dense and well-behaved; cosine math
diverges precisely at degenerate norms (0/0 → NaN with engine-specific
comparison semantics) and at ties, so this suite pins the zero-vector
exclusion contract (similarity.py) and the tie-break order.
"""

from __future__ import annotations

import importlib.util
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_harness import TABLES, compare_frames, duckdb_conn, exact_float_mismatches

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry_mod)

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()

_SIM_QUERIES = [
    "ann_bruteforce_topk", "ann_lsh_topk", "ann_ivf_topk",
    "embedding_cosine_neardup", "semantic_lexical_neardup",
    "embedding_label_stats",
    # embedding_spectrum_profile (the r13 merge of embedding_covariance +
    # embedding_top_component) is NOT parity-run here: this fixture's |v|
    # up to 9 sits outside the documented quantization domain (|v| ≤ 3
    # keeps the exact long products under 2^63) — the fail-loud overflow
    # contract is pinned in test_gram_operators_fail_loud_out_of_domain
    # instead
    # recall vs the ACTUAL truth-set size: the zero-vector probe shrinks
    # the ground truth below |queries|*k here, the case the old constant
    # denominator mis-scored
    "ann_recall_eval",
    # clusters the degenerate vectors (L2 defined at the origin) but must
    # exclude them from the cosine dedup; exact duplicates / scaled
    # copies hit the cosine-1.0 tie-break
    "semantic_dedup_keep",
]

# (vec_id, embedding, label) — 8-d float32. vec_id < 5 are probes; nonzero
# vec_id < 16 become IVF centroids (three of them colinear: duplicate-cell
# tie-breaks).
_VECS = [
    (0, [1, 0, 0, 0, 0, 0, 0, 0], 0),            # probe; axis vector
    (1, [1, 0, 0, 0, 0, 0, 0, 0], 0),            # probe; EXACT duplicate of 0
    (2, [0, 0, 0, 0, 0, 0, 0, 0], 0),            # probe that is a ZERO vector
    (3, [-1, 0, 0, 0, 0, 0, 0, 0], 1),           # probe; exact negation of 0
    (4, [2.5, 0, 0, 0, 0, 0, 0, 0], 1),          # probe; scaled copy of 0
    (5, [1e-20] * 8, 1),                          # tiny but nonzero: kept
    (6, [0, 0, 0, 0, 1, 0, 0, 0], 2),            # all sign-bucket dims exactly 0.0
    (7, [0, 0, 0, 0, 0, 0, 0, 0], 2),            # zero vector in the corpus
    (8, [0.5, -0.5, 0.5, -0.5, 0.1, 0.2, 0.3, 0.4], 2),
    (9, [0.5, -0.5, 0.5, -0.5, 0.1, 0.2, 0.3, 0.5], 2),   # near-dup of 8
    (10, [-0.5, 0.5, -0.5, 0.5, -0.1, -0.2, -0.3, -0.4], 0),  # negation of 8
    (11, [], 0),                                  # EMPTY embedding array
    (12, None, 1),                                # NULL embedding
    (13, [0.6, -0.6, 0.6, -0.6, 0.12, 0.24, 0.36, 0.48], 2),  # 1.2 × vec 8
    (14, [1, 1, 1, 1, 1, 1, 1, 1], 0),
    (15, [1, 2, 3, 4, 5, 6, 7, 8], 1),
    (16, [-1e-8, 1, 1, 1, 1, 1, 1, 1], 2),       # sign flip on a tiny dim-1
    (17, [3, 1, 4, 1, 5, 9, 2, 6], 0),
    (18, [2, 7, 1, 8, 2, 8, 1, 8], 1),
    (19, [1, -1, 1, -1, 1, -1, 1, -1], 2),
]

_DEGENERATE = {2, 7, 11, 12}  # zero / empty / NULL: excluded by contract


@pytest.fixture(scope="module")
def edge_emb_dir(tmp_path_factory):
    """Testdata layout whose embeddings table is the edge vector set; other
    tables borrowed from sf0.001 (semantic_lexical joins doc_id=vec_id, so
    vec_ids stay within the sf0.001 documents id range)."""
    d = tmp_path_factory.mktemp("edge_embeddings")
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", d / f"{t}.parquet")
    table = pa.table(
        {
            "vec_id": pa.array([v[0] for v in _VECS], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in _VECS], pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in _VECS], pa.int32()),
        }
    )
    pq.write_table(table, d / "embeddings.parquet")
    return str(d)


@pytest.mark.parametrize("name", _SIM_QUERIES)
def test_edge_embeddings_parity(spark, edge_emb_dir, name):
    spark.catalog.clearCache()
    sdf = QUERIES[name](spark, edge_emb_dir).toPandas()
    with duckdb_conn(edge_emb_dir) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0


def test_edge_kmeans_parity_and_empty_clusters(spark, edge_emb_dir):
    """K-means on the edge set: duplicate seed vectors (1 ≡ 0, 7 ≡ 2 — both
    zero vectors) lose every distance tie to the lower cluster id, so
    round 1 provably produces EMPTY clusters — the keep-old-centroid
    branch must run identically in both engines for parity to hold.
    NULL/empty embeddings are excluded; zero vectors are clustered (L2 is
    defined at the origin, unlike cosine)."""
    from amazon_climate_data_etl_spark.operators import similarity as S

    spark.catalog.clearCache()
    # prove the empty-cluster branch is actually exercised: first-round
    # assignment against the seed centroids leaves 1 and 7 memberless
    vecs = S._km_quantized(spark, edge_emb_dir)
    seeds = [list(r.q) for r in vecs.orderBy("vec_id").limit(S._KM_K).collect()]
    first = {
        r["cluster_id"]
        for r in S._km_assign(vecs, seeds).select("cluster_id").distinct().collect()
    }
    assert 1 not in first and 7 not in first

    name = "kmeans_cluster_profile"
    sdf = QUERIES[name](spark, edge_emb_dir).toPandas()
    with duckdb_conn(edge_emb_dir) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0
    # every vector except the empty (11) and NULL (12) embeddings is
    # clustered exactly once; zero vectors ARE clustered
    assert int(sdf["n_vectors"].sum()) == len(_VECS) - 2


def test_edge_embeddings_fixture_semantics(spark, edge_emb_dir):
    """Pin the contract decisions themselves (not just parity)."""
    bf = QUERIES["ann_bruteforce_topk"](spark, edge_emb_dir).collect()
    # zero/empty/NULL vectors appear neither as probes nor as candidates
    assert not {r["query_id"] for r in bf} & _DEGENERATE
    assert not {r["cand_id"] for r in bf} & _DEGENERATE
    # probe 0: duplicates (1) and scaled copies (4) score exactly 1.0 and
    # tie-break toward the smaller cand_id
    top0 = sorted((r for r in bf if r["query_id"] == 0), key=lambda r: r["rank"])
    assert [(r["cand_id"], r["cosine"]) for r in top0[:2]] == [(1, 1.0), (4, 1.0)]
    # probe 3 (negation of 0) scores exactly -1.0 against 0/1
    cos3 = {r["cand_id"]: r["cosine"] for r in bf if r["query_id"] == 3}
    assert all(c != 1.0 or k not in (0, 1, 4) for k, c in cos3.items())

    # label stats still PROFILE the degenerate vectors (contract: excluded
    # from similarity, visible to profiling)
    stats = {r["label"]: r["n_vectors"] for r in
             QUERIES["embedding_label_stats"](spark, edge_emb_dir).collect()}
    assert stats == {0: 7, 1: 6, 2: 7}

    # near-dup: colinear pair (8, 13) is found at cosine exactly 1.0; the
    # sign-flipped twin (14, 16) is NOT a candidate (different LSH bucket)
    # even though its true cosine is ~0.93 — the documented recall trade
    nd = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in
          QUERIES["embedding_cosine_neardup"](spark, edge_emb_dir).collect()}
    assert nd[(8, 13)] == 1.0
    assert (14, 16) not in nd


def test_gram_operators_fail_loud_out_of_domain(spark, edge_emb_dir):
    """The integer-quantized Gram operators promise EXACT integer sums
    for |v| <= 3 (q <= 3e9, split products exact) and must FAIL LOUDLY —
    an overflow refusal, never a silently wrapped matrix — on embeddings
    outside that domain (this fixture carries components up to 9). Since
    round 8 the guard lives in the ``_gram_partials`` kernel (a Python
    worker error surfacing through Spark), so the pin is on the loud
    "overflow" message, not a JVM exception class."""
    import pytest as _pytest

    from amazon_climate_data_etl_spark.operators.similarity import (
        embedding_covariance,
        embedding_spectrum_profile,
        embedding_top_component,
    )

    for fn in (
        embedding_covariance,
        embedding_top_component,
        embedding_spectrum_profile,
    ):
        with _pytest.raises(Exception, match="overflow"):
            fn(spark, edge_emb_dir).collect()


# ---------------------------------------------------------------------------
# Degenerate ALL-near-duplicate corpus (r8 review item 2): k-means gives no
# max-cluster-size guarantee, and a mass-duplicate corpus — exactly the input
# SemDeDup exists for — lands Θ(N) vectors in ONE cluster. The exact-collapse
# pre-pass plus the SEM_CLUSTER_CAP sub-cell split must keep the verdicts
# hand-derivable, hash-exact vs the oracle, and the pair work linear.
# ---------------------------------------------------------------------------

_N_DEGEN = 2600  # > SEM_CLUSTER_CAP so the sub-cell split engages on reps


@pytest.fixture(scope="module")
def degen_emb_dir(tmp_path_factory):
    """2600 byte-identical copies of one direction plus a handful of
    distinct vectors: one k-means cluster swallows everything."""
    d = tmp_path_factory.mktemp("degen_embeddings")
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", d / f"{t}.parquet")
    base = [0.5, 0.25, -0.5, 0.125, 0.5, -0.25, 0.5, 0.125]
    vecs = [base] * _N_DEGEN
    vecs += [[float(i + 1), -1.0, 2.0, 0.5, -3.0, 1.5, -0.5, 2.5] for i in range(8)]
    table = pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(len(vecs))], pa.int32()),
        }
    )
    pq.write_table(table, d / "embeddings.parquet")
    return str(d)


def test_semantic_dedup_degenerate_collapse(spark, degen_emb_dir):
    """All 2600 identical copies collapse to ONE representative before the
    pair join (so the within-cluster join sees ≤ 9 representatives, not
    2600² pairs), and every copy's verdict is dup_of = 0."""
    spark.catalog.clearCache()
    out = QUERIES["semantic_dedup_keep"](spark, degen_emb_dir).toPandas()
    copies = out[out["vec_id"].between(1, _N_DEGEN - 1)]
    assert (copies["dup_of"] == 0).all()
    assert (~copies["keep"]).all()
    assert bool(out.loc[out["vec_id"] == 0, "keep"].iloc[0])


def test_semantic_dedup_degenerate_parity(spark, degen_emb_dir):
    spark.catalog.clearCache()
    sdf = QUERIES["semantic_dedup_keep"](spark, degen_emb_dir).toPandas()
    with duckdb_conn(degen_emb_dir) as conn:
        odf = conn.execute(ORACLE["semantic_dedup_keep"]).df()
    problems = compare_frames(sdf, odf, "semantic_dedup_keep")
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0


def test_semantic_dedup_subcell_cap_engages(spark, degen_emb_dir):
    """When representatives themselves exceed SEM_CLUSTER_CAP in one
    cluster, the deterministic vec_id-mod split bounds the per-key join
    fan-out. Pinned directly on the internal frame with a lowered cap so
    the property is tested without a 2000-rep fixture."""
    from amazon_climate_data_etl_spark.catalog import load_table
    from amazon_climate_data_etl_spark.operators import similarity as S

    spark.catalog.clearCache()
    from pyspark.sql import functions as F

    a = S._km_final_assign(spark, degen_emb_dir, k=None).select(
        "vec_id", "cluster_id"
    )
    nzv = S._nonzero(load_table(spark, degen_emb_dir, "embeddings"))
    grp = nzv.groupBy("embedding").agg(F.min("vec_id").alias("rep_id"))
    v = grp.select(F.col("rep_id").alias("vec_id")).join(a, "vec_id")
    sizes = v.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("csz"))
    cap = 4
    sub = v.join(sizes, "cluster_id").withColumn(
        "sub_id", F.col("vec_id") % F.ceil(F.col("csz") / F.lit(float(cap)))
    )
    per_cell = (
        sub.groupBy("cluster_id", "sub_id").count().agg(F.max("count")).collect()
    )[0][0]
    # mod-split cells stay within ~2× the cap for non-adversarial id sets
    assert per_cell <= 2 * cap


@pytest.fixture(scope="module")
def domain_boundary_emb_dir(tmp_path_factory):
    """Embeddings at the GRAM-DOMAIN BOUNDARY (|v| up to 3, incl. exact
    1.0 components): in-domain for embedding_spectrum_profile's documented
    contract (|v| ≤ 3, split products < 2^53), but fatal to any oracle
    that multiplies the 1e9-quantized components in narrow BIGINT/
    DECIMAL(18) arithmetic (1e9·1e9 overflows DuckDB's narrow multiply —
    the r13 review finding; generated-corpus fixtures never exceed 0.58,
    so only this fixture exercises the boundary)."""
    d = tmp_path_factory.mktemp("domain_boundary_emb")
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", d / f"{t}.parquet")
    vecs = [
        (0, [1.0, 0.0, 0.5, -1.0]),
        (1, [3.0, -3.0, 1.0, 2.0]),      # the documented |v| ≤ 3 edge
        (2, [0.25, 1.0, -0.125, 0.0]),
        (3, [2.5, 2.5, -2.5, 2.5]),
        (4, [1.0, 1.0, 1.0, 1.0]),
    ]
    table = pa.table(
        {
            "vec_id": pa.array([v for v, _ in vecs], pa.int64()),
            "embedding": pa.array([e for _, e in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(table, d / "embeddings.parquet")
    return str(d)


def test_spectrum_parity_at_domain_boundary(spark, domain_boundary_emb_dir):
    """embedding_spectrum_profile must hash-match its oracle on |v| up to
    the documented domain edge — both engines' exact-integer paths must
    survive q² products ≈ 9e18."""
    spark.catalog.clearCache()
    name = "embedding_spectrum_profile"
    sdf = QUERIES[name](spark, domain_boundary_emb_dir).toPandas()
    with duckdb_conn(domain_boundary_emb_dir) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0
