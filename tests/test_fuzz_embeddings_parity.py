"""Seeded random embedding-corpus parity: tie-heavy vector sets vs the
oracle.

The edge-embeddings suite pins hand-picked degeneracies (zeros, NULLs,
negations, scaled copies); here vectors draw components from a small
dyadic set ({-2,-1,-0.5,0,0.5,1,2}, exact in float32) and the generator
injects exact duplicates, scaled copies, and negations at random, so
cosine TIES, shared sign-buckets, and duplicate IVF cells arise in
combinations nobody designed. Every similarity-family query in the
edge suite's parity list must still match its DuckDB oracle bit-exactly
(tie-breaks are deterministic by id in both engines — this is the suite
that would catch an ordering the fixtures happen not to reach).

Fixed seeds; failures replay exactly.
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
from tests.test_edge_embeddings import _SIM_QUERIES, ORACLE, QUERIES

_COMPONENTS = [-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0]
_D = 8


def _gen_vectors(seed: int, n: int) -> list[tuple]:
    rng = random.Random(seed)
    rows: list[tuple] = []
    for vid in range(n):
        r = rng.random()
        if rows and r < 0.15:
            # exact duplicate of an earlier vector (cosine-1.0 ties)
            src = rng.choice(rows)[1]
            rows.append((vid, list(src) if src is not None else None, rng.randrange(3)))
        elif rows and r < 0.22:
            # scaled copy (same direction, different magnitude)
            src = rng.choice(rows)[1]
            if src:
                rows.append((vid, [2.0 * x for x in src], rng.randrange(3)))
            else:
                rows.append((vid, src, rng.randrange(3)))
        elif rows and r < 0.28:
            # exact negation (cosine -1.0, opposite sign-buckets)
            src = rng.choice(rows)[1]
            if src:
                rows.append((vid, [-x for x in src], rng.randrange(3)))
            else:
                rows.append((vid, src, rng.randrange(3)))
        elif r < 0.33:
            # degenerate: zero vector / empty array / NULL
            rows.append(
                (vid, rng.choice([[0.0] * _D, [], None]), rng.randrange(3))
            )
        else:
            rows.append(
                (vid, [rng.choice(_COMPONENTS) for _ in range(_D)], rng.randrange(3))
            )
    return rows


def _write_embeddings(dirpath: str, seed: int, n: int) -> str:
    os.makedirs(dirpath, exist_ok=True)
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                os.path.join(dirpath, f"{t}.parquet"),
            )
    rows = _gen_vectors(seed, n)
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "embeddings.parquet"))
    return dirpath


@pytest.fixture(scope="module")
def fuzz_emb_a(tmp_path_factory):
    # vec_ids stay within the sf0.001 documents range (semantic_lexical
    # joins doc_id = vec_id), same constraint the edge fixture documents
    return _write_embeddings(str(tmp_path_factory.mktemp("fuzz_emb_a")), seed=20260816, n=70)


@pytest.fixture(scope="module")
def fuzz_emb_b(tmp_path_factory):
    return _write_embeddings(str(tmp_path_factory.mktemp("fuzz_emb_b")), seed=31337, n=48)


@pytest.mark.parametrize("name", _SIM_QUERIES)
def test_fuzz_embeddings_parity(spark, fuzz_emb_a, name):
    spark.catalog.clearCache()
    sdf = QUERIES[name](spark, fuzz_emb_a).toPandas()
    with duckdb_conn(fuzz_emb_a) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0


@pytest.mark.parametrize("name", _SIM_QUERIES)
def test_fuzz_embeddings_parity_seed2(spark, fuzz_emb_b, name):
    spark.catalog.clearCache()
    sdf = QUERIES[name](spark, fuzz_emb_b).toPandas()
    with duckdb_conn(fuzz_emb_b) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0
