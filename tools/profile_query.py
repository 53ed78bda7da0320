#!/usr/bin/env python
"""Per-query profiler: runs one or more registered queries to completion
(noop sink, same methodology as bench.py) and prints the per-job / per-stage
wall breakdown from the status store, plus the formatted plan on request.

Usage:
    python tools/profile_query.py QUERY [QUERY ...] [--explain] [--repeat N]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

This is a measurement aid for the optimization rounds (guide §1): it
answers "where do this query's seconds go" — job count, per-job stage
shape, task counts, and which jobs are driver-latency floors (single-task
sub-50ms jobs) vs real compute.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from amazon_climate_data_etl_spark.session import get_spark  # noqa: E402


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(df):
    df.write.mode("overwrite").format("noop").save()


def _max_job_id(spark) -> int:
    store = spark.sparkContext._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    return max((jobs.apply(i).jobId() for i in range(jobs.size())), default=-1)


def _jobs_since(spark, watermark: int):
    store = spark.sparkContext._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    out = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if j.jobId() <= watermark:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        out.append(
            {
                "id": j.jobId(),
                "status": j.status().toString(),
                "tasks": j.numCompletedTasks(),
                "stages": j.stageIds().size(),
                "dur": dur,
                "desc": (j.description().get() if j.description().isDefined() else "")[:90],
            }
        )
    return sorted(out, key=lambda r: r["id"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    entry = _load_entry()
    qmap = entry.queries()
    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.queries:
        fn = qmap[name]
        # warm-up: codegen, broadcast, file listing
        _run(fn(spark, sf_dir))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.2)
        for rep in range(args.repeat):
            wm = _max_job_id(spark)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            _run(df)
            t_total = time.perf_counter() - t0
            jobs = _jobs_since(spark, wm)
            njobs = len(jobs)
            ntasks = sum(j["tasks"] for j in jobs)
            jsum = sum(j["dur"] or 0 for j in jobs)
            print(
                f"== {name} rep{rep}: total {t_total:.3f}s  build {t_build:.3f}s  "
                f"jobs {njobs}  tasks {ntasks}  sum(job dur) {jsum:.3f}s  "
                f"gap {t_total - jsum:.3f}s"
            )
            for j in jobs:
                print(
                    f"   job {j['id']:>5}  {j['dur'] if j['dur'] is not None else -1:6.3f}s  "
                    f"tasks {j['tasks']:>4}  stages {j['stages']}  {j['desc']}"
                )
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2)
        if args.explain:
            df = fn(spark, sf_dir)
            print(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))


if __name__ == "__main__":
    main()
