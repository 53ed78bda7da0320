"""Seeded random-corpus parity sweep: engine vs DuckDB oracle on corpora
no one hand-designed.

The edge corpus (test_edge_corpus.py) pins KNOWN pathologies; this suite
generates corpora from a small vocabulary with seeded mutation operators —
byte-exact copies, case flips, whitespace edits, single-token
substitutions/deletions, unicode tokens, pathological repetition, empty
and sub-shingle docs — so duplicate groups, LSH buckets, and span repeats
arise in RANDOM combinations, and every documents-family query must still
match its oracle bit-exactly. A divergence here is exactly the class the
fixtures cannot anticipate (the r9/r10 advice items were all of this
shape: a collapse key, a tie frame, a casing assumption that only a
particular data coincidence exposes).

Deterministic by construction (fixed seeds, no live hypothesis driving a
SparkSession): failures replay exactly.
"""

from __future__ import annotations

import os
import random
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_harness import (
    TABLES,
    compare_frames,
    duckdb_conn,
    exact_float_mismatches,
)
from tests.test_edge_corpus import _DOC_QUERIES, ORACLE, QUERIES

# a small vocabulary forces shingle collisions and term-frequency ties;
# unicode entries exercise the casing/width traps the advice items hit;
# markup/PII-shaped tokens (r11) stress the html/bpe/pii queries through
# the REGISTERED parity path — '<' inside document text flows into the
# synthesized markup, and email/ip/phone look-alikes meet the staged
# scrub on top of the planted spans
_VOCAB = (
    [f"tok{i}" for i in range(40)]
    + ["the", "and", "of", "a", "in"]
    + ["café", "naïve", "Straße", "İstanbul", "ΣΙΓΜΑ", "мир", "你好"]
    + ["<p>", "</a", "a>b", "x@y.co", "10.0.0.1", "555-1234", "1.2.3.4.5"]
)

_WS = [" ", "  ", "\t", "\n"]


def _mutate(rng: random.Random, text: str) -> str:
    """One seeded mutation: the duplicate-adjacent shapes the dedup
    family must classify consistently with the oracle."""
    kind = rng.randrange(6)
    toks = text.split()
    if kind == 0:  # byte-exact copy
        return text
    if kind == 1:  # case flip of one token (normalized-fp dup, byte-distinct)
        if toks:
            i = rng.randrange(len(toks))
            toks[i] = toks[i].upper() if toks[i].islower() else toks[i].lower()
        return " ".join(toks)
    if kind == 2:  # whitespace edit (fp dup under whitespace normalization)
        return rng.choice(_WS).join(toks) + rng.choice(["", " ", "  "])
    if kind == 3:  # substitute one token (LSH near-dup)
        if toks:
            toks[rng.randrange(len(toks))] = rng.choice(_VOCAB)
        return " ".join(toks)
    if kind == 4:  # delete one token (near-dup, length change)
        if toks:
            del toks[rng.randrange(len(toks))]
        return " ".join(toks)
    # duplicate a window in place (span-repeat shapes)
    if len(toks) >= 4:
        i = rng.randrange(len(toks) - 3)
        toks[i:i] = toks[i : i + 4]
    return " ".join(toks)


def _gen_corpus(seed: int, n_docs: int) -> list[str]:
    rng = random.Random(seed)
    texts: list[str] = []
    for _ in range(n_docs):
        r = rng.random()
        if texts and r < 0.35:
            # mutate an earlier doc: builds duplicate clusters of every kind
            texts.append(_mutate(rng, rng.choice(texts)))
        elif r < 0.40:
            # degenerate shapes
            texts.append(
                rng.choice(
                    ["", " ", "\t\n", rng.choice(_VOCAB), "x y", "a b c"]
                )
            )
        elif r < 0.45:
            # pathological repetition (one token or one phrase)
            unit = " ".join(rng.choices(_VOCAB, k=rng.randrange(1, 4)))
            texts.append(" ".join([unit] * rng.randrange(2, 30)))
        else:
            n = rng.randrange(3, 45)
            texts.append(" ".join(rng.choices(_VOCAB, k=n)))
    return texts


def _write_corpus(dirpath: str, seed: int, n_docs: int) -> str:
    os.makedirs(dirpath, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                os.path.join(dirpath, f"{t}.parquet"),
            )
    texts = _gen_corpus(seed, n_docs)
    langs = ["en", "de", "fr", "es", "zh"]
    sources = ["src0", "src1", "src7", "src19"]
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
        "lang": [langs[i % len(langs)] for i in range(len(texts))],
        "source": [sources[i % len(sources)] for i in range(len(texts))],
        "n_chars": [len(t) for t in texts],
    }
    pq.write_table(pa.table(rows, schema=schema), os.path.join(dirpath, "documents.parquet"))
    return dirpath


@pytest.fixture(scope="module")
def fuzz_dir_a(tmp_path_factory):
    return _write_corpus(str(tmp_path_factory.mktemp("fuzz_a")), seed=20260816, n_docs=140)


@pytest.fixture(scope="module")
def fuzz_dir_b(tmp_path_factory):
    return _write_corpus(str(tmp_path_factory.mktemp("fuzz_b")), seed=4242, n_docs=90)


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_fuzz_corpus_parity(spark, fuzz_dir_a, name):
    spark.catalog.clearCache()
    sdf = QUERIES[name](spark, fuzz_dir_a).toPandas()
    with duckdb_conn(fuzz_dir_a) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0


# second seed for the duplicate-classification core only (the queries whose
# semantics hinge on which duplicate SHAPE the random mix produced)
_DUP_CORE = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_pairs",
    "dedup_components",
    "dedup_cluster_size_histogram",
    "neardup_keep_corpus",
    "neardup_keep_best_quality",
    "incremental_dedup",
    "duplicate_span_profile",
    "doc_fingerprint_profile",
]


@pytest.mark.parametrize("name", _DUP_CORE)
def test_fuzz_corpus_parity_seed2(spark, fuzz_dir_b, name):
    spark.catalog.clearCache()
    sdf = QUERIES[name](spark, fuzz_dir_b).toPandas()
    with duckdb_conn(fuzz_dir_b) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0
