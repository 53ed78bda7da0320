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

r11 adds a 10× epoch (sf1.0-equivalent; r14 widens it to the crawl
write-read round trips, whose 5× ratios were the table's worst and whose
file fan-out growth law — ceil(n_docs / CRAWL_RECORDS_PER_FILE) — only
engages past 32k docs) for the families whose scale
story carries the most weight — the dedup chain's label propagation
(``neardup_keep_corpus``) and the symmetric-delete fuzzy join
(``fuzzy_join_names``) — recorded as ``sf1.0_sec`` / ``ratio_10x`` on the
same entries, bar ratio_10x < 10. The fuzzy join's 10× customer table is
replica-suffixed with 5-repeated-letter blocks (``name bbbbb``), so
cross-replica names sit at Levenshtein ≥ 5: no cross-replica candidates
or pairs, pair structure grows exactly 10× — the same honesty argument
as the token-suffixed documents (naive row replication would make every
replica a distance-0 duplicate and measure the fixture, not the engine).
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
WORK10 = os.environ.get("SCALING_DIR_10X", "/tmp/spark_graft_sf1.0")
TENX_REPLICAS = 10
# r14 adds the crawl pair (the r13 table's worst 5× ratios, 1.97/1.88 —
# both dominated by the fixed-count segment write/read at bench scale;
# the 10× corpus crosses the CRAWL_RECORDS_PER_FILE growth threshold, so
# the epoch also exercises the corpus-derived file fan-out: 50k docs →
# 25 segments > the 16-file floor, per-task member counts stay bounded)
TENX_QUERIES = (
    "neardup_keep_corpus",
    "fuzzy_join_names",
    "crawl_e2e",
    "wat_metadata_profile",
)
QUERIES = tuple(
    q.strip()
    for q in os.environ.get(
        "SCALING_QUERIES",
        "minhash_lsh_pairs,ngram_jaccard_pairs,neardup_keep_corpus,"
        "duplicate_span_profile,ann_lsh_topk,"
        "ann_ivf_topk,ann_pq_topk,ann_ivfpq_topk,textrank_keywords,"
        # round 8: the full recall panel (5 searches, one shared corpus),
        # the map-side Gram kernel, and the Lloyd loop — the reworked
        # kernels' scale claims, probed with data
        "token_triangle_census,ann_recall_eval,embedding_spectrum_profile,"
        "kmeans_cluster_profile,semantic_dedup_keep,"
        # round 12: the crawl round trip (write + read + group-agg/join-back
        # dedup — linear in docs by design) and the URL rollup (map +
        # bounded-domain agg); round 13 adds the WAT sibling (write +
        # metadata-pushdown read + (source, lang) agg — same linear shape)
        "crawl_e2e,url_domain_profile,wat_metadata_profile",
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


def build_fuzzy_customer(
    base: str, work: str, replicas: int
) -> None:
    """Replica-scale the CUSTOMER table with honest fuzzy-pair structure:
    replica r > 0 appends ' ' + a 5-repeated letter block to every name
    (keys offset by r·10M). A common suffix within a replica preserves
    every intra-replica Levenshtein distance, and distinct 5-letter blocks
    put cross-replica names at distance ≥ 5 — outside both the ≤1 output
    predicate and the ≤2 shared-deletion-variant candidate horizon — so
    the fuzzy join's pair structure grows exactly ×replicas."""
    import duckdb

    os.makedirs(work, exist_ok=True)
    con = duckdb.connect()
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{base}/customer.parquet')"
        ).fetchall()
    ]
    others = ", ".join(c for c in cols if c not in ("c_custkey", "c_name"))
    con.execute(
        f"""
        COPY (
          SELECT c_custkey + r * 10000000 AS c_custkey,
                 CASE WHEN r = 0 THEN c_name
                      ELSE c_name || ' ' || repeat(chr(CAST(98 + r AS INTEGER)), 5)
                 END AS c_name{', ' + others if others else ''}
          FROM read_parquet('{base}/customer.parquet'), range({replicas}) t(r)
        ) TO '{work}/customer.parquet' (FORMAT PARQUET)
        """
    )


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

    work = os.environ.get("SCALING_WORK", WORK)
    for name in QUERIES:
        t1 = timed(name, BASE)
        t5 = timed(name, work)
        rec = {
            "query": name,
            "base_sec": t1,
            "work_sec": t5,
            "ratio": round(t5 / t1, 2),
        }
        print("##RESULT " + json.dumps(rec), flush=True)


def main() -> None:
    import subprocess

    # ambient load BEFORE any probe work: the end-of-run snapshot (also
    # recorded) mostly reads back the probe's own 32-core children — the
    # r11 close measured 0.04 ambient but 16.5 at exit
    ambient = [round(x, 2) for x in os.getloadavg()]

    build_corpus()
    # one SUBPROCESS per query: this probe measures how each query scales
    # with DATA, and process history is a confound — r6 measured
    # ann_ivf_topk at 2.7-2.9× when probed after the 5× dedup queries vs
    # a reproducible 1.9-2.0× in a fresh process, and spark.stop() does
    # NOT reset it (the py4j JVM outlives the session, so heap residue
    # carries over). bench.py keeps the shared-session sweep + isolated
    # pairs as the interference signal; here a per-query JVM (~10 s each)
    # buys the clean scaling number this artifact exists to pin.
    def run_child(name: str, work_dir: str | None = None) -> dict | None:
        env = dict(os.environ, SCALING_QUERIES=name, SCALING_CHILD="1")
        if work_dir:
            env["SCALING_WORK"] = work_dir
        # one retry: child JVMs occasionally die to transient allocation
        # failures (GCLocker) unrelated to the query under test
        r = None
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
                    if rec.pop("query") == name:
                        return rec
            print(f"{name}: child attempt {attempt} failed (rc={r.returncode})",
                  flush=True)
        print(f"{name}: child failed\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}",
              flush=True)
        return None

    out: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        rec = run_child(name)
        if rec is None:
            sys.exit(1)
        out[name] = {
            "sf0.1_sec": rec["base_sec"],
            "sf0.5_sec": rec["work_sec"],
            "ratio": rec["ratio"],
        }
        print(name, out[name], flush=True)

    # 10× epoch (r11): the two scale-story-critical families only — the
    # dedup chain's label propagation and the symmetric-delete fuzzy join.
    # build order matters: the honest customer table must exist BEFORE
    # build_corpus symlinks the remaining siblings through. Skipped in
    # SCALING_QUERIES subset-diagnosis runs (like the artifact write).
    tenx = () if "SCALING_QUERIES" in os.environ else TENX_QUERIES
    if tenx:
        build_fuzzy_customer(BASE, WORK10, TENX_REPLICAS)
        build_corpus(base=BASE, work=WORK10, replicas=TENX_REPLICAS)
    for name in tenx:
        rec = run_child(name, work_dir=WORK10)
        if rec is None:
            sys.exit(1)
        entry = out.setdefault(name, {"sf0.1_sec": rec["base_sec"]})
        entry["sf1.0_sec"] = rec["work_sec"]
        entry["ratio_10x"] = rec["ratio"]
        print(name, "10x", {k: entry[k] for k in ("sf1.0_sec", "ratio_10x")},
              flush=True)

    payload = {
        "data_ratio": float(REPLICAS),
        "bar": "ratio < 5 for 5x data (sub-quadratic)",
        "data_ratio_10x": float(TENX_REPLICAS),
        "bar_10x": (
            "ratio_10x < 10 for 10x data "
            "(dedup chain + fuzzy join + crawl trio)"
        ),
        "load_avg_ambient_at_start": ambient,
        "load_avg_at_exit": [round(x, 2) for x in os.getloadavg()],
        "queries": out,
    }
    # subset runs (SCALING_QUERIES) are a diagnosis aid: print only, never
    # clobber the full-coverage artifact with a partial epoch
    if "SCALING_QUERIES" not in os.environ:
        with open(os.path.join(REPO, "SCALING.json"), "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    worst = max(v["ratio"] for v in out.values() if "ratio" in v)
    worst10 = max(
        (v["ratio_10x"] for v in out.values() if "ratio_10x" in v), default=0.0
    )
    ok = worst < REPLICAS and worst10 < TENX_REPLICAS
    print(json.dumps({"worst_ratio": worst, "worst_ratio_10x": worst10,
                      "pass": ok}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    if os.environ.get("SCALING_CHILD"):
        _run_child()
    else:
        main()
