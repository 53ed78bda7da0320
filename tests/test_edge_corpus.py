"""Adversarial corpus parity: every documents-family query (textops, dedup,
curation) runs against a crafted edge-case corpus — empty and
whitespace-only texts, sub-shingle-length docs, unicode, exact duplicates,
pathological repetition — and must still match the DuckDB oracle bit-exactly.

The driver's synthetic corpus is well-behaved; engine divergence hides in
the degenerate paths (empty-array guards, regex splits on '', unicode code
points, zero-denominator ratios). This suite pins those semantics.
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

# documents-only query families (no events/embeddings/tpch dependencies)
_DOC_QUERIES = [
    # textops
    "lang_token_profile", "doc_quality_scores",
    "lang_id_confusion", "doc_fingerprint_profile", "doc_rolling_fingerprints",
    "doc_length_histogram", "top_terms", "doc_repetition_scores",
    "tfidf_top_terms", "split_assignment",
    "vocab_coverage", "bm25_search", "textrank_keywords",
    "token_triangle_census", "quality_weighted_sample", "pmi_collocations",
    "source_concentration_gini", "zipf_law_fit",
    "dedup_cluster_size_histogram",
    "html_boilerplate_extract", "bpe_tokenize_profile", "pii_scrub_docs",
    "crawl_e2e", "wat_metadata_profile", "wet_text_e2e",
    # dedup
    "exact_dedup", "minhash_lsh_pairs", "ngram_jaccard_pairs",
    "simhash_near_pairs", "dedup_components",
    "neardup_keep_corpus", "neardup_keep_best_quality", "incremental_dedup",
    "source_overlap_matrix",
    "duplicate_span_profile",
    # curation
    "doc_chunk_plan",
    "corpus_cdc_profile", "corpus_read_asof",
    "contamination_overlap", "pack_sequences", "stratified_sample_stats",
    "source_mixture_plan", "source_domain_divergence",
    "ngram_logprob_quality", "source_quota_cap",
    "corpus_filter_funnel", "url_domain_profile",
]

# a dedicated 20-token sentence (= duplicate_span_profile's extent window W)
# and a
# 20-token unique spacer, for the span-extent boundary cases below
_SPAN20 = " ".join(f"sp{i}" for i in range(20))
_GAP20 = " ".join(f"gp{i}" for i in range(20))

_EDGE_TEXTS = [
    "",                                   # empty
    "   ",                                # whitespace only
    "\t\n  \n",                           # mixed whitespace only
    "word",                               # single token (< shingle k)
    "two words",                          # two tokens (< shingle k)
    "a b c",                              # exactly shingle k tokens
    "  leading and trailing spaces  ",    # trim semantics
    "a a a a a a a a",                    # maximal token repetition
    "the the the and and of",             # stopword-only
    "café naïve 你好 мир αβγ",             # non-ASCII code points
    "İstanbul ΣΣ ΤΕΛΟΣ Straße\x0bVT",     # unicode casing traps + vertical tab
    "A\xa0B nbsp",                        # non-breaking space (trim trap)
    "the quick brown fox jumps over the lazy dog near the river bank",
    "the quick brown fox jumps over the lazy dog near the river bank",  # exact dup
    "one two three four five six seven eight nine ten " * 12,  # long doc
    "x" * 7,                              # just under rolling-hash window K=8
    "y" * 8,                              # exactly the rolling-hash window
    "an exact duplicate that crosses the incremental split boundary",  # 17
    "unique corpus-side filler document",                              # 18
    "an exact duplicate that crosses the incremental split boundary",  # 19:
    # doc_id % 5 == 4 puts this in incremental_dedup's DELTA slice, with
    # its exact twin (17) in the corpus — exercises the exact_dup verdict
    # ---- exact-substring span extents (duplicate_span_profile, W=20) ----
    _SPAN20,                                          # 20: exactly W tokens
    _SPAN20 + " " + _GAP20 + " " + _SPAN20,           # 21: two islands W
    #     apart in ONE doc (positions 0 and 40; 40 - 0 > W → they must NOT
    #     merge: n_spans=2, dup 40 of 60) — also a within-doc repeat, so
    #     the span is "duplicated" even before doc 20 is counted
    "pre1 pre2 pre3 " + _SPAN20 + " post1 post2",     # 22: span embedded
    #     mid-document (one maximal extent [3, 23) of 25 tokens)
    # ---- case-variant duplicate group (r10 advice): 23 and 25 share a
    # normalized fingerprint (same fp group, rep = 23) but differ in EVERY
    # token's casing, so their case-sensitive shingle sets are disjoint;
    # 24 (doc_id % 5 == 4 → incremental_dedup's DELTA) is a near-dup of
    # the LOWERCASE member 25 only. A fingerprint-keyed corpus collapse
    # would drop 25 and verdict 24 as 'new'; the byte-exact collapse
    # keeps 25's LSH identity and must verdict near_dup of 25.
    "Title Case Variant Sentence With Many Distinct Tokens Inside Here Today",  # 23
    "title case variant sentence with many distinct tokens inside here differs",  # 24
    "title case variant sentence with many distinct tokens inside here today",  # 25
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    """A full testdata layout whose documents table is the edge corpus;
    the other nine tables are borrowed from sf0.001 (the oracle harness
    registers views for all of them)."""
    d = tmp_path_factory.mktemp("edge_corpus")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", d / f"{t}.parquet")
    langs = ["en", "de", "fr", "es", "zh"]
    sources = ["src0", "src1", "src7", "src19"]
    rows = {
        "doc_id": list(range(len(_EDGE_TEXTS))),
        "text": _EDGE_TEXTS,
        "lang": [langs[i % len(langs)] for i in range(len(_EDGE_TEXTS))],
        "source": [sources[i % len(sources)] for i in range(len(_EDGE_TEXTS))],
        "n_chars": [len(t) for t in _EDGE_TEXTS],
    }
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(pa.table(rows, schema=schema), d / "documents.parquet")
    return str(d)


def test_duplicate_span_extent_merge_semantics(spark, edge_dir):
    """Hand-derivable span extents — parity alone proves only that both
    engines agree, not that the gaps-and-islands merge is RIGHT. Doc 20 is
    exactly one duplicated window; doc 21 carries the same span twice with
    a 20-token unique gap (islands at positions 0 and 40 — beyond the
    W-merge reach, so they must stay TWO extents); doc 22 embeds it
    mid-document; the periodic 120-token doc (14) self-duplicates every
    window into ONE full-coverage extent; the 13-token exact-dup pair
    (12, 13) is under W and must report zero windows."""
    rows = {
        r["doc_id"]: r
        for r in QUERIES["duplicate_span_profile"](spark, edge_dir).collect()
    }
    assert (rows[20]["n_spans"], rows[20]["dup_tokens"], rows[20]["n_tokens"]) == (1, 20, 20)
    assert rows[20]["span_dup_fraction"] == 1.0
    assert (rows[21]["n_spans"], rows[21]["dup_tokens"], rows[21]["max_span"]) == (2, 40, 20)
    assert rows[21]["n_tokens"] == 60
    assert (rows[22]["n_spans"], rows[22]["dup_tokens"], rows[22]["n_tokens"]) == (1, 20, 25)
    assert (rows[14]["n_spans"], rows[14]["span_dup_fraction"]) == (1, 1.0)
    assert (rows[12]["n_spans"], rows[12]["dup_tokens"]) == (0, 0)
    assert rows[13]["span_dup_fraction"] == 0.0


def test_incremental_case_variant_verdict(spark, edge_dir):
    """Pin the r10-advice fix: delta doc 24 is a near-dup of the
    LOWERCASE corpus member 25, not of its fp-group representative 23
    (whose case-sensitive shingles are disjoint from 24's). The
    byte-exact corpus collapse must keep 25 in the LSH probe — a
    fingerprint-keyed collapse would verdict 24 as 'new'."""
    rows = {
        r["doc_id"]: r
        for r in QUERIES["incremental_dedup"](spark, edge_dir).collect()
    }
    assert rows[24]["verdict"] == "near_dup"
    assert rows[24]["dup_of"] == 25
    # and the exact relation is still the NORMALIZED one: 19's byte-exact
    # twin (17) sits in the corpus → exact_dup, unchanged by the re-key
    assert rows[19]["verdict"] == "exact_dup" and rows[19]["dup_of"] == 17


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_edge_corpus_parity(spark, edge_dir, name):
    spark.catalog.clearCache()
    sdf = QUERIES[name](spark, edge_dir).toPandas()
    with duckdb_conn(edge_dir) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0


# ---------------------------------------------------------------------------
# Adversarial TEMPLATE corpus (r8 review item 1): ≥1k byte-identical copies
# of one document — the boilerplate/mirror-site shape that concentrates a
# 100 TB corpus into single LSH buckets. The exact-collapse pre-pass must
# keep the candidate-pair stream and the components edge set LINEAR in the
# copy count, and the whole dedup chain must still match the oracle.
# ---------------------------------------------------------------------------

_N_COPIES = 1200
_N_VARIANTS = 40
_N_UNIQUE = 200
_TEMPLATE = (
    "breaking news local weather update for the region with traffic and "
    "sports scores attached below the fold plus the usual subscription "
    "footer text that every mirror of this page carries verbatim"
)


def _template_texts() -> list[str]:
    texts = [_TEMPLATE] * _N_COPIES
    # near-identical but NOT byte-identical: one token differs, so each
    # variant has its own fingerprint yet shares most shingles (and, for
    # ~half of them deterministically, all four band signatures) with the
    # template representative
    texts += [_TEMPLATE.replace("sports", f"sports{i}") for i in range(_N_VARIANTS)]
    texts += [
        "unique filler document " + " ".join(f"u{i}w{j}" for j in range(30))
        for i in range(_N_UNIQUE)
    ]
    return texts


@pytest.fixture(scope="module")
def template_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("template_corpus")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", d / f"{t}.parquet")
    texts = _template_texts()
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    rows = {
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": [f"src{i % 4}" for i in range(len(texts))],
        "n_chars": [len(t) for t in texts],
    }
    pq.write_table(pa.table(rows, schema=schema), d / "documents.parquet")
    return str(d)


def test_template_corpus_pair_stream_bounded(spark, template_dir):
    """The 1200-copy group must contribute exactly ONE document (its
    representative, doc 0) to the LSH pair stream: no pair may touch the
    other 1199 copies, the variant family must still collide with the
    representative, and the whole stream must be bounded by the
    representative count — never by copies²."""
    spark.catalog.clearCache()
    pairs = QUERIES["minhash_lsh_pairs"](spark, template_dir).toPandas()
    collapsed = set(range(1, _N_COPIES))
    touching = pairs[
        pairs["doc_a"].isin(collapsed) | pairs["doc_b"].isin(collapsed)
    ]
    assert len(touching) == 0, touching.head()
    assert ((pairs["doc_a"] == 0) | (pairs["doc_b"] == 0)).any()
    n_reps = 1 + _N_VARIANTS + _N_UNIQUE
    assert len(pairs) <= n_reps * (n_reps - 1) // 2


def test_template_corpus_star_edges_linear(spark, template_dir):
    """The components consumer's edge set must be LINEAR: ≤ 1 exact edge
    per collapsed copy plus ≤ N_BANDS star edges per representative —
    never the ~copies²/2 ≈ 7·10⁵ pairs of the clique form."""
    from amazon_climate_data_etl_spark.catalog import load_table
    from amazon_climate_data_etl_spark.operators import dedup as DD

    spark.catalog.clearCache()
    d = load_table(spark, template_dir, "documents")
    reps = DD._rep_docs(d)
    star = DD._star_edges(DD._minhash_sigs(DD._shingle_frame(reps)))
    n_reps = reps.count()
    assert n_reps == 1 + _N_VARIANTS + _N_UNIQUE
    assert star.count() <= DD.N_BANDS * n_reps


def test_template_corpus_components_exact(spark, template_dir):
    """Every copy and every colliding variant lands in component 0 (the
    corpus minimum), exact copies included even though only the
    representative entered the LSH pipeline."""
    spark.catalog.clearCache()
    comp = QUERIES["dedup_components"](spark, template_dir).toPandas()
    lbl = dict(zip(comp["doc_id"], comp["component_id"]))
    assert all(lbl.get(i) == 0 for i in range(_N_COPIES))
    keep = QUERIES["neardup_keep_corpus"](spark, template_dir).toPandas()
    kept = keep[keep["keep"]]["doc_id"].tolist()
    # exactly one survivor from the template component
    assert 0 in kept and not any(i in kept for i in range(1, _N_COPIES))


_TEMPLATE_CHAIN = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "dedup_components",
    "neardup_keep_corpus",
    "neardup_keep_best_quality",
    "dedup_cluster_size_histogram",
    "incremental_dedup",
]


@pytest.mark.parametrize("name", _TEMPLATE_CHAIN)
def test_template_corpus_parity(spark, template_dir, name):
    spark.catalog.clearCache()
    sdf = QUERIES[name](spark, template_dir).toPandas()
    with duckdb_conn(template_dir) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0


# ---------------------------------------------------------------------------
# Adversarial NEAR-identical template family (r10 review item 1): 1k variants
# of one document, each differing by ONE trailing token — every variant is
# its own byte group (the exact collapse can't touch them) yet most share
# all band signatures, concentrating into single LSH buckets far larger than
# LSH_BUCKET_CAP. The pair-emitting queries must stay LINEAR in the family
# size via the sub-bucket split, and still match the (cap-mirrored) oracle.
# ---------------------------------------------------------------------------

_NEAR_N = 1000


def near_template_texts(n: int) -> list[str]:
    """n near-identical variants (one appended numbered token — ~1 changed
    shingle out of ~30, so band signatures mostly survive) + unique filler."""
    texts = [_TEMPLATE + f" variant{i}" for i in range(n)]
    texts += [
        "unique filler document " + " ".join(f"n{i}w{j}" for j in range(30))
        for i in range(100)
    ]
    return texts


def write_documents(d, texts) -> str:
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet"))
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    rows = {
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": [f"src{i % 4}" for i in range(len(texts))],
        "n_chars": [len(t) for t in texts],
    }
    pq.write_table(pa.table(rows, schema=schema), os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def near_template_dir(tmp_path_factory):
    return write_documents(
        str(tmp_path_factory.mktemp("near_template")), near_template_texts(_NEAR_N)
    )


def test_near_template_pair_stream_linear(spark, near_template_dir):
    """Per-bucket pair output must be bounded by B·CAP/2 per band — linear
    in the family size — never the ~B²/2 ≈ 5·10⁵ pairs of the uncapped
    join. (The family must also actually exercise the cap: at least one
    bucket larger than LSH_BUCKET_CAP.)"""
    from amazon_climate_data_etl_spark.catalog import load_table
    from amazon_climate_data_etl_spark.operators import dedup as DD

    spark.catalog.clearCache()
    d = load_table(spark, near_template_dir, "documents")
    long = DD._sig_long(DD._minhash_sigs(DD._shingle_frame(DD._rep_docs(d))))
    import pyspark.sql.functions as F

    sizes = long.groupBy("band", "sig").count().toPandas()
    assert sizes["count"].max() > DD.LSH_BUCKET_CAP  # the cap is exercised
    pairs = QUERIES["minhash_lsh_pairs"](spark, near_template_dir).toPandas()
    n_docs = _NEAR_N + 100
    assert len(pairs) <= DD.N_BANDS * n_docs * DD.LSH_BUCKET_CAP / 2
    assert len(pairs) > 0  # the family still surfaces candidates


@pytest.mark.parametrize("name", ["minhash_lsh_pairs", "ngram_jaccard_pairs"])
def test_near_template_parity(spark, near_template_dir, name):
    spark.catalog.clearCache()
    sdf = QUERIES[name](spark, near_template_dir).toPandas()
    with duckdb_conn(near_template_dir) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0
