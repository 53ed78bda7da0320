#!/usr/bin/env python
"""Benchmark harness: times every registered query at one scale factor.

Prints exactly ONE JSON line:
    {"metric": "total_query_wall", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Env knobs (driver contract):
    SPARK_GRAFT_SF_DIR  parquet dir, default /root/testdata/sf0.1
    SPARK_GRAFT_CPUS    local[] core count, default 32
    BENCH_QUERIES       comma-separated subset (iteration aid)
    BENCH_REPEAT        timed repetitions per query, report MEDIAN (default 3;
                        every query also gets one untimed warm-up run first,
                        so round-over-round deltas are attributable signal,
                        not single-shot scheduler noise)
    BENCH_SWEEPS        full passes over the query set (default 1). With
                        N > 1 each query's reported number is the MIN of
                        its N sweep medians — min-of-medians is the
                        standard noise-floor estimator, and two identical-
                        tree sweeps on this box have differed by ±19 s
                        total (15%), wide enough to hide a real 10%
                        regression (r12 finding). Ambient load is recorded
                        at the START of each sweep (sweeps_ambient).
                        ROUND-CLOSE PROTOCOL (r13+): BENCH_SWEEPS=2 — the
                        default stays 1 so a single driver-budgeted run
                        keeps its historical wall shape.
    BENCH_COOLDOWN      seconds to sleep between queries after the cache
                        clear + GC (default 0)
    BENCH_ISOLATED      how many of the slowest queries to re-measure after
                        the sweep under quiesced conditions (default 5 for
                        full runs, 0 for BENCH_QUERIES subsets); the payload
                        records sweep-vs-isolated per query, so cross-query
                        interference is quantified instead of misread as a
                        regression
    BENCH_MOVER_PCT     additionally re-measure in isolation every query
                        whose sweep time moved more than this fraction vs
                        the previous round's committed BENCH_r*.json
                        (default 0.25; round-5 review item #2 — drift vs
                        regression must be separable from the artifact
                        alone). Set to 0 to disable.

Also writes the complete per-query timing set to ``BENCH_local.json`` at the
repo root (the driver records only the stdout tail, which truncates long
query maps). r15: the printed line carries ONLY the contract keys plus the
runs/sweeps/stat stamps; the isolated pairs, per-sweep maps, per-query COLD
walls (the untimed warm-up's wall — the honest single-shot cost of queries
whose operators persist intermediates), ambient context and the salted race
live in ``BENCH_local.json`` alone, keeping the stdout payload as small as
the contract allows so the driver can parse it (r14 verdict items 2 & 6;
nothing removed or renamed from the ``queries`` map).

Each query is executed to completion with a ``noop``-format write: the full
physical plan runs (scan → shuffle → agg/join) but no rows are shipped to
the driver, so timings reflect engine throughput, not driver materialization
— the honest proxy for cluster-scale behavior.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from amazon_climate_data_etl_spark.session import get_spark  # noqa: E402


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_to_completion(df) -> None:
    # noop sink: executes every stage, discards rows executor-side.
    df.write.mode("overwrite").format("noop").save()


def _quiesce(spark, cooldown: float) -> None:
    """Between-query hygiene: drop persisted frames the previous query may
    have left cached (memory pressure is the main cross-query interference
    channel — r4 saw a 1.8× phantom 'regression' from it), nudge the JVM
    to collect, and optionally cool down."""
    spark.catalog.clearCache()
    # two GC passes with a breath between them: broadcast/shuffle cleanup
    # is asynchronous, and a single System.gc() before the next query still
    # left a 36% sweep-vs-isolated delta on broadcast-heavy ANN queries
    spark.sparkContext._jvm.System.gc()
    time.sleep(max(cooldown, 0.15))
    spark.sparkContext._jvm.System.gc()


def _time_query(spark, fn, sf_dir: str, repeat: int) -> tuple[float, float]:
    """(median of timed reps, cold warm-up wall). The warm-up runs with no
    operator persists populated (the harness clears the cache between
    queries), so its wall is the honest COLD cost of a query whose
    operators ``persist()`` branch-point intermediates — the timed reps
    then serve those frames from cache (r14 verdict item 6: report both,
    so persisted and unpersisted queries stay comparable)."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm-up
    cold = time.perf_counter() - t0
    samples = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        _run_to_completion(fn(spark, sf_dir))
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3), round(cold, 3)


def _max_job_id(spark) -> int:
    """Newest job id in the status store (-1 when empty) — the watermark
    for _executed_work_since."""
    store = spark.sparkContext._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    n = jobs.size()
    return max((jobs.apply(i).jobId() for i in range(n)), default=-1)


def _executed_work_since(spark, min_job_id: int) -> tuple[int, int]:
    """(SUCCEEDED jobs, their completed tasks) with jobId > min_job_id —
    the load-independent measure of a plan's executed work (wall-clock on
    this box swings ±40% with ambient load; job/task deltas do not).
    Filtering by job id rather than differencing whole-store sums keeps
    the delta correct when the store evicts old jobs mid-measure
    (spark.ui.retainedJobs) — whole-store before/after differences went
    NEGATIVE once eviction kicked in late in a 145-query session. Only
    SUCCEEDED jobs count: jobsList(None) returns every status, and a
    still-RUNNING or FAILED straggler would otherwise inflate the delta
    with partial task counts."""
    store = spark.sparkContext._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    n = jobs.size()
    tot_j = tot_t = 0
    for i in range(n):
        j = jobs.apply(i)
        if j.jobId() > min_job_id and j.status().toString() == "SUCCEEDED":
            tot_j += 1
            tot_t += j.numCompletedTasks()
    return tot_j, tot_t


def main() -> None:
    # ambient load BEFORE any bench work: the end-of-run snapshot (also
    # recorded) mostly reads back the bench's own 32-core sweep — the r11
    # close measured 0.12 ambient but 13.2 at exit
    ambient = [round(x, 2) for x in os.getloadavg()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    repeat = max(1, int(os.environ.get("BENCH_REPEAT", "3")))

    entry = _load_entry()
    queries = entry.queries()
    subset = os.environ.get("BENCH_QUERIES")
    if subset:
        keep = {s.strip() for s in subset.split(",")}
        queries = {k: v for k, v in queries.items() if k in keep}

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query numbers measure the plan,
    # not first-touch class loading.
    if queries:
        _run_to_completion(next(iter(queries.values()))(spark, sf_dir))
    # Also warm the Python-worker boundary (daemon fork, pandas/numpy import,
    # --py-files package ship): otherwise the alphabetically-first pandas-UDF
    # query absorbs ~15 s of one-time pool startup that is not its plan cost.
    from amazon_climate_data_etl_spark.sources.multimodal import (
        extract_features,
        synthetic_media,
    )

    _run_to_completion(extract_features(synthetic_media(spark, n=32)))

    cooldown = float(os.environ.get("BENCH_COOLDOWN", "0"))
    n_sweeps = max(1, int(os.environ.get("BENCH_SWEEPS", "1")))
    sweep_maps: list[dict[str, float]] = []
    cold_maps: list[dict[str, float]] = []
    sweeps_ambient: list[list[float]] = []
    for _ in range(n_sweeps):
        # ambient at the START of each sweep: a sweep that began quiet but
        # aged into a noisy window is visible in the artifact
        sweeps_ambient.append([round(x, 2) for x in os.getloadavg()])
        tm: dict[str, float] = {}
        cm: dict[str, float] = {}
        for name in sorted(queries):
            _quiesce(spark, cooldown)
            # per-query warm-up (inside _time_query): populates codegen/
            # broadcast/file-listing caches so the timed runs measure
            # steady-state plan cost; its wall rides along as the COLD
            # number (r14 verdict item 6)
            tm[name], cm[name] = _time_query(
                spark, queries[name], sf_dir, repeat
            )
        sweep_maps.append(tm)
        cold_maps.append(cm)
    # per-query MIN across sweeps (min-of-medians): the noise-floor
    # estimator the round-close protocol commits (r12 review item 4)
    timings: dict[str, float] = {
        name: min(m[name] for m in sweep_maps) for name in sorted(queries)
    }
    colds: dict[str, float] = {
        name: min(m[name] for m in cold_maps) for name in sorted(queries)
    }

    # isolated re-measurement of the slowest queries: sweep medians can
    # misreport by ~2× under cross-query memory/GC pressure (r4 finding);
    # recording both numbers per round makes interference visible instead
    # of masquerading as a plan regression
    n_isolated = int(
        os.environ.get("BENCH_ISOLATED", "0" if subset else "5")
    )
    iso_names = set(sorted(timings, key=lambda k: -timings[k])[:n_isolated])

    # pinned watchlist (r7 review item 7; r8 item 3 added the two sweep
    # movers that shipped without an isolated pair, plus the recall panel
    # whose r9 target is an isolated number): queries with an unresolved
    # drift-vs-regression question always get an isolated pair until the
    # question is settled in a verdict
    if not subset:
        iso_names |= {
            "climate_annual",
            "source_domain_divergence",
            "simhash_near_pairs",
            "audio_energy_segments",
            "ann_recall_eval",
        } & set(timings)

    # round-over-round movers get an isolated number too, so every >X%
    # delta vs the previous committed artifact ships with its own
    # quiesced re-measurement — drift (isolated ≈ previous) and real
    # regressions (isolated ≈ sweep) separate from the artifact alone
    mover_pct = float(os.environ.get("BENCH_MOVER_PCT", "0.25"))
    prev: dict[str, float] = {}
    if mover_pct > 0 and not subset:
        import glob
        import re

        rounds = sorted(
            glob.glob(os.path.join(REPO, "BENCH_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
        )
        if rounds:
            try:
                with open(rounds[-1]) as f:
                    doc = json.load(f)
            except (OSError, ValueError):
                doc = {}
            # the driver artifact wraps the payload: per-query timings sit
            # in parsed.queries when the driver could parse the stdout
            # line, else only inside the truncated "tail" string — recover
            # them by name-matching against the registry (the cut-off
            # first pair and metadata keys fail the membership test)
            prev = dict((doc.get("parsed") or {}).get("queries") or {})
            if not prev:
                for m in re.finditer(
                    r'"([A-Za-z0-9_]+)": ([0-9][0-9.]*)', doc.get("tail", "")
                ):
                    if m.group(1) in queries:
                        prev[m.group(1)] = float(m.group(2))
        movers = {
            n
            for n, t in timings.items()
            if n in prev and prev[n] > 0 and abs(t / prev[n] - 1) > mover_pct
        }
        iso_names |= movers

    isolated: dict[str, dict[str, float]] = {}
    if iso_names:
        # fresh SparkContext for the isolated pass: the sweep leaves ~600
        # executed queries of status-store/listener/shuffle-file state in
        # the context, and isolated numbers taken in that aged context
        # read systematically ABOVE their own sweep medians (r10 finding:
        # 6.2 s end-of-sweep vs 3.4 s in-sweep for the same query —
        # backwards from the protocol's purpose). Stopping the context
        # drops that state while the JVM (and its JIT-compiled codegen)
        # survives, so the re-measure reflects the steady-state plan.
        spark.stop()
        spark = get_spark(app_name="bench-isolated")
        spark.sparkContext.setLogLevel("ERROR")
    for name in sorted(iso_names):
        _quiesce(spark, max(cooldown, 0.5))
        # 2 reps (after the warm-up inside _time_query): enough to spot a
        # 2x sweep artifact without doubling the harness wall-time
        watermark = _max_job_id(spark)
        iso, iso_cold = _time_query(spark, queries[name], sf_dir, min(repeat, 2))
        djobs, dtasks = _executed_work_since(spark, watermark)
        # executed work per single run (warm-up + min(repeat,2) timed runs
        # between the snapshots): the load-independent companion number —
        # a wall delta with UNCHANGED jobs/tasks is ambient drift, a wall
        # delta with a work delta is a plan change. The raw deltas + run
        # count ride along so the per-run numbers are auditable (the
        # warm-up's noop write can execute a different job count than a
        # timed run, so per-run is an average, not an exact per-plan count)
        runs = 1 + min(repeat, 2)
        isolated[name] = {
            "sweep": timings[name],
            "isolated": iso,
            "cold": iso_cold,
            "jobs": round(djobs / runs),
            "tasks": round(dtasks / runs),
            "jobs_raw": djobs,
            "tasks_raw": dtasks,
            "runs": runs,
        }
        if name in prev:
            isolated[name]["prev_round"] = prev[name]

    # salted-vs-naive skew race (round 7, VERDICT r6 item 2): a wall-clock
    # measurement is only attributable to the plans on a quiesced machine,
    # which is this harness's whole job — the pytest suite asserts the
    # STRUCTURAL salting contract (identical results + flat reducer
    # spread) and the timing evidence is recorded here instead of flaking
    # there. BENCH_SALTED=0 skips it.
    salted_race = None
    if not subset and os.environ.get("BENCH_SALTED", "1") != "0":
        from pyspark.sql import functions as F

        from amazon_climate_data_etl_spark.operators.joins import (
            adversarial_skew_frames,
            salted_equi_join,
        )

        fact, build = adversarial_skew_frames(spark)
        saved = {
            k: spark.conf.get(k)
            for k in (
                "spark.sql.adaptive.skewJoin.enabled",
                "spark.sql.autoBroadcastJoinThreshold",
            )
        }
        try:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            agg = lambda df: df.groupBy().agg(  # noqa: E731
                F.count(F.lit(1)).alias("n"), F.sum("w").alias("s")
            )
            naive = agg(fact.join(build, fact["k"] == build["bk"]))
            fast = agg(salted_equi_join(fact, build, "k", "bk", ("v",)))
            _quiesce(spark, max(cooldown, 0.5))
            t_naive, _ = _time_query(spark, lambda *_: naive, sf_dir, 3)
            _quiesce(spark, max(cooldown, 0.5))
            t_fast, _ = _time_query(spark, lambda *_: fast, sf_dir, 3)
            salted_race = {
                "naive": t_naive,
                "salted": t_fast,
                "speedup": round(t_naive / t_fast, 3) if t_fast else None,
            }
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    # The PRINTED line carries exactly the contract keys (+ the three
    # small methodology stamps): the driver captures only a bounded stdout
    # tail, and r10–r13's artifacts all failed driver-side parsing because
    # the isolated/ambient detail pushed the one-line payload past the
    # capture window (r14 verdict item 2). Everything else — isolated
    # pairs, per-sweep maps, cold walls, ambient context, the salted
    # race — rides ONLY in the durable BENCH_local.json. Nothing is
    # dropped from the artifact set; the printed line just stays as close
    # to parseable-from-a-tail as a 150-query map can be.
    payload = {
        "metric": "total_query_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": repeat,
        "sweeps": n_sweeps,
        "stat": "median" if n_sweeps == 1 else "min-of-medians",
    }
    durable = dict(payload)
    durable.update(
        {
            # per-sweep context: totals expose the sweep-to-sweep
            # environmental band the min collapses; ambient is sampled at
            # each sweep's start
            "sweep_totals": [round(sum(m.values()), 3) for m in sweep_maps],
            "sweeps_ambient": sweeps_ambient,
            # ambient contention context: observed ~45% total inflation
            # when the 5-min load average sat at ~5 on this 32-core box —
            # lets a round-over-round diff discount noisy windows instead
            # of misreading them
            "load_avg_ambient_at_start": ambient,
            "load_avg_at_exit": [round(x, 2) for x in os.getloadavg()],
            # COLD per query = the untimed warm-up's wall (min across
            # sweeps, like the medians): the honest single-shot cost for
            # queries whose operators persist() intermediates that the
            # timed reps then read back from cache (r14 verdict item 6 —
            # addition-only; the contract map above is unchanged)
            "queries_cold": dict(
                sorted(colds.items(), key=lambda kv: -kv[1])
            ),
        }
    )
    if isolated:
        durable["isolated"] = isolated
    if salted_race:
        durable["salted_race"] = salted_race
    # Persist the complete result in-repo (slowest first, so a truncated
    # human glance still sees the hot spots) so every round can diff all
    # queries. Subset runs (BENCH_QUERIES) skip the write — they must not
    # clobber the full-coverage artifact.
    if not subset:
        durable["queries"] = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])
        )
        if n_sweeps > 1:
            # full per-sweep maps ride in the durable artifact only:
            # every paired close is auditable query-by-query, not just
            # via the min
            durable["queries_per_sweep"] = sweep_maps
        with open(os.path.join(REPO, "BENCH_local.json"), "w") as f:
            json.dump(durable, f, indent=1)
            f.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
