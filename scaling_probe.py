#!/usr/bin/env python
"""Scaling evidence for the two heaviest families (dedup chain, ANN).

All per-round bench numbers are sf0.1; this probe materializes a 5×
corpus (sf0.5-equivalent documents + embeddings) and measures how
wall-time actually scales, pinning the banded-LSH/bucketed-join claim
("candidate work grows with pair density, not |corpus|²") with data.

The 5× corpus must scale the PAIR STRUCTURE honestly, not explode it:
naive row replication makes every replica a near-duplicate of its
original — pair counts would grow 25× and the probe would measure the
fixture, not the engine. Instead:

- documents: replica r > 0 suffixes every token with ``r<r>``, so
  replicas share no shingles — near-dup pair density grows 5×, like a
  real corpus 5× the size;
- embeddings: replica r rolls each vector's coordinates by r — an
  orthogonal transform (norms and intra-replica geometry preserved,
  cross-replica similarity decorrelated), so ANN bucket occupancy grows
  5× without synthetic exact-duplicate pileups.

Writes SCALING.json at the repo root:
    {"<query>": {"sf0.1_sec": t1, "sf0.5_sec": t5, "ratio": t5/t1}, ...}
Pass/fail bar (asserted): ratio < 5 for 5× data on every probed query.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SCALING_DIR", "/tmp/spark_graft_sf0.5")
REPLICAS = 5
QUERIES = tuple(
    q.strip()
    for q in os.environ.get(
        "SCALING_QUERIES",
        "minhash_lsh_pairs,ngram_jaccard_pairs,neardup_keep_corpus,"
        "duplicate_span_stats,duplicate_spans_exact,ann_lsh_topk,"
        "ann_ivf_topk,ann_pq_topk,ann_ivfpq_topk,textrank_keywords,"
        # round 8: the full recall panel (5 searches, one shared corpus),
        # the map-side Gram kernel, and the Lloyd loop — the reworked
        # kernels' scale claims, probed with data
        "token_triangle_census,ann_recall_eval,embedding_top_component,"
        "kmeans_cluster_profile,semantic_dedup_keep",
    ).split(",")
    if q.strip()
)


def build_corpus(
    base: str | None = None, work: str | None = None, replicas: int | None = None
) -> None:
    """Materialize the pair-structure-honest replica corpus (module
    docstring) — parameterized so the opt-in scaling pytest
    (tests/test_scaling.py) can build smaller epochs from sf0.01."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = base or BASE
    work = work or WORK
    replicas = replicas or REPLICAS
    os.makedirs(work, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT doc_id + r * 10000000 AS doc_id,
                 CASE WHEN r = 0 THEN text
                      ELSE regexp_replace(text, '([^ ]+)', '\\1r' || r, 'g')
                 END AS text,
                 lang, source,
                 length(CASE WHEN r = 0 THEN text
                             ELSE regexp_replace(text, '([^ ]+)', '\\1r' || r, 'g')
                        END) AS n_chars
          FROM read_parquet('{base}/documents.parquet'), range({replicas}) t(r)
        ) TO '{work}/documents.parquet' (FORMAT PARQUET)
        """
    )
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{base}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    mat = np.vstack(emb["embedding"].to_numpy())
    ids, labels, vecs = [], [], []
    for r in range(replicas):
        ids.append(emb["vec_id"].to_numpy() + r * 10000000)
        labels.append(emb["label"].to_numpy())
        vecs.append(np.roll(mat, r, axis=1))
    table = pa.table(
        {
            "vec_id": np.concatenate(ids),
            "embedding": pa.array(
                list(np.concatenate(vecs).astype(np.float32)),
                type=pa.list_(pa.float32()),
            ),
            "label": np.concatenate(labels).astype(np.int32),
        }
    )
    pq.write_table(table, f"{work}/embeddings.parquet")
    # the probed queries only read documents/embeddings, but load_table
    # may validate siblings — link the rest of the scale factor through
    for f in os.listdir(base):
        dst = os.path.join(work, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(base, f), dst)


def _run_child() -> None:
    """Measure the (single) query named by SCALING_QUERIES in THIS process
    and emit one machine-readable result line."""
    import importlib.util

    from amazon_climate_data_etl_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    queries = entry.queries()

    # a roomier heap than the 1g local default: the 5x corpus's explode
    # stages otherwise flirt with GCLocker allocation failures (observed:
    # ngram_jaccard_pairs child death). Ratio is heap-invariant — both
    # scales run in the SAME child — this only buys stability.
    spark = get_spark(
        app_name="scaling_probe_child",
        extra_conf={
            "spark.driver.memory": os.environ.get("SCALING_DRIVER_MEM", "8g")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: str, sf_dir: str) -> float:
        # two-pass GC quiesce (the r4 bench finding: broadcast/shuffle
        # cleanup is asynchronous and one System.gc() is not enough)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        spark.sparkContext._jvm.System.gc()
        fn = queries[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 3)

    for name in QUERIES:
        t1 = timed(name, BASE)
        t5 = timed(name, WORK)
        rec = {
            "query": name,
            "sf0.1_sec": t1,
            "sf0.5_sec": t5,
            "ratio": round(t5 / t1, 2),
        }
        print("##RESULT " + json.dumps(rec), flush=True)


def main() -> None:
    import subprocess

    build_corpus()
    # one SUBPROCESS per query: this probe measures how each query scales
    # with DATA, and process history is a confound — r6 measured
    # ann_ivf_topk at 2.7-2.9× when probed after the 5× dedup queries vs
    # a reproducible 1.9-2.0× in a fresh process, and spark.stop() does
    # NOT reset it (the py4j JVM outlives the session, so heap residue
    # carries over). bench.py keeps the shared-session sweep + isolated
    # pairs as the interference signal; here a per-query JVM (~10 s each)
    # buys the clean scaling number this artifact exists to pin.
    out: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        env = dict(os.environ, SCALING_QUERIES=name, SCALING_CHILD="1")
        # one retry: child JVMs occasionally die to transient allocation
        # failures (GCLocker) unrelated to the query under test
        for attempt in (1, 2):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
            )
            for line in r.stdout.splitlines():
                if line.startswith("##RESULT "):
                    rec = json.loads(line[len("##RESULT "):])
                    out[rec.pop("query")] = rec
            if name in out:
                break
            print(f"{name}: child attempt {attempt} failed (rc={r.returncode})",
                  flush=True)
        if name not in out:
            print(f"{name}: child failed\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}",
                  flush=True)
            sys.exit(1)
        print(name, out[name], flush=True)

    payload = {
        "data_ratio": float(REPLICAS),
        "bar": "ratio < 5 for 5x data (sub-quadratic)",
        "load_avg": [round(x, 2) for x in os.getloadavg()],
        "queries": out,
    }
    # subset runs (SCALING_QUERIES) are a diagnosis aid: print only, never
    # clobber the full-coverage artifact with a partial epoch
    if "SCALING_QUERIES" not in os.environ:
        with open(os.path.join(REPO, "SCALING.json"), "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    worst = max(v["ratio"] for v in out.values())
    print(json.dumps({"worst_ratio": worst, "pass": worst < REPLICAS}))
    if worst >= REPLICAS:
        sys.exit(1)


if __name__ == "__main__":
    if os.environ.get("SCALING_CHILD"):
        _run_child()
    else:
        main()
