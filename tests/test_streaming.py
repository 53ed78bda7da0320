"""Structured Streaming semantics: the streaming jobs must agree with their
batch twins on the same data, and watermarks must drop late events."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.catalog import load_table
from amazon_climate_data_etl_spark.streaming.jobs import (
    click_purchase_join,
    dedup_stream,
    enrich_with_static_dim,
    run_to_memory_sink,
    session_counts,
    sliding_counts,
    stream_from_json_dir,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_json_dir(spark, tmp_path_factory):
    """Events table exported as JSON lines, ordered by ts (arrival order =
    event-time order, so the file-source replay is watermark-friendly)."""
    d = tmp_path_factory.mktemp("events_stream")
    pdf = load_table(spark, SF, "events").orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].astype(str)
    with open(d / "part-0.json", "w") as f:
        for rec in pdf.to_dict("records"):
            f.write(json.dumps(rec) + "\n")
    return str(d)


def test_streaming_tumbling_equals_batch(spark, events_json_dir):
    stream = stream_from_json_dir(spark, events_json_dir)
    run_to_memory_sink(tumbling_counts(stream), "t_tumbling", mode="complete")
    got = (
        spark.table("t_tumbling")
        .orderBy("win_start", "event_type")
        .toPandas()
    )
    want = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value")
        .orderBy("win_start", "event_type")
        .toPandas()
    )
    assert len(got) == len(want)
    assert (got["n_events"].values == want["n_events"].values).all()


def test_streaming_sliding_equals_batch(spark, events_json_dir):
    stream = stream_from_json_dir(spark, events_json_dir)
    run_to_memory_sink(sliding_counts(stream), "t_sliding", mode="complete")
    got = spark.table("t_sliding").agg(F.sum("n_events")).collect()[0][0]
    n = load_table(spark, SF, "events").count()
    assert got == 4 * n  # every event lands in exactly 4 sliding windows


def test_streaming_sessions_match_batch_session_count(spark, events_json_dir):
    stream = stream_from_json_dir(spark, events_json_dir)
    run_to_memory_sink(session_counts(stream), "t_sessions", mode="complete")
    got = spark.table("t_sessions")
    from amazon_climate_data_etl_spark.operators.events import session_windows

    want = session_windows(spark, SF)
    assert got.count() == want.count()
    assert (
        got.agg(F.sum("n_events")).collect()[0][0]
        == want.agg(F.sum("n_events")).collect()[0][0]
    )


def test_streaming_dedup_drops_duplicates(spark, events_json_dir, tmp_path):
    # duplicate every event: same event_id appears twice in the stream
    dup_dir = str(tmp_path / "dup")
    os.makedirs(dup_dir)
    src = open(os.path.join(events_json_dir, "part-0.json")).read()
    with open(os.path.join(dup_dir, "part-0.json"), "w") as f:
        f.write(src)
        f.write(src)
    stream = stream_from_json_dir(spark, dup_dir)
    run_to_memory_sink(dedup_stream(stream), "t_dedup")
    n_unique = load_table(spark, SF, "events").count()
    assert spark.table("t_dedup").count() == n_unique


def test_stateful_running_totals_across_batches(spark, events_json_dir, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    replaying the corpus split in two files (one per batch) must end at the
    same totals as the batch groupBy, and users present in both halves must
    show monotonically growing counts (proof state actually persisted)."""
    import time

    from amazon_climate_data_etl_spark.streaming.jobs import running_user_totals

    d = str(tmp_path / "split")
    os.makedirs(d)
    lines = open(os.path.join(events_json_dir, "part-0.json")).read().splitlines()
    half = len(lines) // 2
    with open(os.path.join(d, "a.json"), "w") as f:
        f.write("\n".join(lines[:half]))
    time.sleep(1.05)  # file source orders batches by mtime
    with open(os.path.join(d, "b.json"), "w") as f:
        f.write("\n".join(lines[half:]))

    stream = stream_from_json_dir(spark, d, max_files_per_trigger=1)
    run_to_memory_sink(running_user_totals(stream), "t_state", mode="update")
    got = spark.table("t_state").toPandas()

    want = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .toPandas()
    )
    final = got.loc[got.groupby("user_id")["n_events"].idxmax()].set_index("user_id")
    wanted = want.set_index("user_id")
    assert (final["n_events"].sort_index() == wanted["n_events"].sort_index()).all()
    assert (
        (final["total_value"].sort_index() - wanted["total_value"].sort_index()).abs()
        < 1e-6
    ).all()
    # at least one user appears in both batches with growing state
    multi = got.groupby("user_id").size()
    assert (multi == 2).any()


def test_transform_with_state_matches_legacy_form(spark, events_json_dir):
    """The modern transformWithStateInPandas operator must emit the same
    final per-user state as both the legacy applyInPandasWithState form
    and the batch groupBy ground truth. Skipped where google.protobuf
    (the TWS state protocol's dependency) is absent; the import gate
    itself is asserted below either way."""
    import pytest

    from amazon_climate_data_etl_spark.streaming.jobs import (
        running_user_totals_tws,
    )

    stream = stream_from_json_dir(spark, events_json_dir)
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="protobuf"):
            running_user_totals_tws(stream)
        pytest.skip("google.protobuf absent: TWS state protocol unavailable")
    # TWS requires the RocksDB state store; restore the provider afterwards
    # so later streaming tests don't silently inherit it (their outcomes
    # would become ordering-dependent)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        run_to_memory_sink(
            running_user_totals_tws(stream), "t_tws", mode="update"
        )
        got = spark.table("t_tws").toPandas()
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    final = got.loc[got.groupby("user_id")["n_events"].idxmax()].set_index(
        "user_id"
    )

    want = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert (
        final["n_events"].sort_index() == want["n_events"].sort_index()
    ).all()
    assert (
        (final["total_value"].sort_index() - want["total_value"].sort_index())
        .abs()
        < 1e-6
    ).all()


def test_stream_static_join_equals_batch(spark, events_json_dir):
    """Stream-static enrichment must match the batch join row-for-row, and
    users missing from the dim must survive (left join semantics)."""
    events = load_table(spark, SF, "events")
    dim = (
        events.select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)  # half the users have a dim row
        .withColumn("tier", F.when(F.col("user_id") % 4 == 0, "gold").otherwise("basic"))
    )
    stream = stream_from_json_dir(spark, events_json_dir)
    run_to_memory_sink(enrich_with_static_dim(stream, dim), "t_enrich")
    got = spark.table("t_enrich")
    assert got.count() == events.count()  # left join: nothing dropped
    want_gold = (
        events.join(dim, "user_id").filter(F.col("tier") == "gold").count()
    )
    assert got.filter(F.col("tier") == "gold").count() == want_gold


def test_stream_stream_join_equals_batch(spark, events_json_dir):
    """The streaming interval join must produce exactly the pairs the batch
    form of the same predicate produces on the same data."""
    stream = stream_from_json_dir(spark, events_json_dir)
    run_to_memory_sink(click_purchase_join(stream), "t_ssj")
    got = spark.table("t_ssj")

    e = load_table(spark, SF, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 hour")),
    )
    assert got.count() == want.count()
    assert got.count() > 0  # the corpus actually exercises the join
    got_pairs = {(r.click_id, r.purchase_id) for r in got.collect()}
    want_pairs = {(r.click_id, r.purchase_id) for r in want.collect()}
    assert got_pairs == want_pairs


def test_watermark_drops_late_events(spark, tmp_path):
    """A 5:30 event arriving after the watermark passed 11:00 must be
    dropped. NB: the operative filter watermark lags one micro-batch (it is
    committed at batch end), so the late file is the THIRD batch — observed
    via numRowsDroppedByWatermark and the absence of the 05:00 window."""
    import time

    d = str(tmp_path / "late")
    os.makedirs(d)

    def ev(i, ts):
        return {"event_id": i, "ts": ts, "user_id": 1,
                "event_type": "click", "value": 1.0, "props": "{}"}

    def write(name, rows):
        with open(os.path.join(d, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write("a.json", [ev(i, f"2024-01-01 {10 + i}:00:00") for i in range(4)])
    time.sleep(1.05)  # file source orders batches by mtime
    write("b.json", [ev(50, "2024-01-01 14:00:00")])
    time.sleep(1.05)
    write("c.json", [ev(99, "2024-01-01 05:30:00")])  # late: wm is 11:00 now
    stream = stream_from_json_dir(spark, d, max_files_per_trigger=1)
    q = run_to_memory_sink(tumbling_counts(stream, watermark="2 hours"), "t_late")
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1
    wins = {
        r["win_start"].strftime("%H:%M"): r["n_events"]
        for r in spark.table("t_late").collect()
    }
    assert "05:00" not in wins
    assert wins.get("10:00") == 1


def test_climate_stream_daily_equals_batch(spark, tmp_path):
    """The streaming climate ingestion (grid-snap stream-static enrich +
    watermarked daily agg) must be BIT-identical to the batch computation
    on the same readings — decimal sums make the streamed micro-batch
    accumulation order irrelevant."""
    import pandas as pd

    from amazon_climate_data_etl_spark.functions.climate import grid_snap
    from amazon_climate_data_etl_spark.operators.climate import (
        synthetic_municipalities,
    )
    from amazon_climate_data_etl_spark.streaming.jobs import (
        GRID_READINGS_DDL,
        climate_stream_daily,
        run_to_memory_sink,
    )

    # small long-format readings table over two days and two variables;
    # cells chosen to hit real municipality snap cells (nation 1 snaps to
    # (-9.75, -64.0), nation 2 to (-9.5, -63.0)) plus one unmatched cell
    rows = []
    for day in ("2001-01-01", "2001-01-02"):
        for la, lo in ((-9.75, -64.0), (-9.5, -63.0), (4.75, -60.0)):
            for v, base in (("Tmax", 30.0), ("pr", 4.0)):
                rows.append((f"{day} 12:00:00", la, lo, v, base + la + lo / 10))
    pdf = pd.DataFrame(rows, columns=["ts", "lat", "lon", "var", "value"])
    d = tmp_path / "grid_stream"
    d.mkdir()
    with open(d / "part-0.json", "w") as f:
        for rec in pdf.to_dict("records"):
            f.write(json.dumps(rec) + "\n")

    muni = synthetic_municipalities(spark, SF)
    stream = spark.readStream.schema(GRID_READINGS_DDL).json(str(d))
    run_to_memory_sink(
        climate_stream_daily(stream, muni), "t_climate_daily", mode="complete"
    )
    got = (
        spark.table("t_climate_daily")
        .orderBy("day", "CD_MUN", "var")
        .toPandas()
    )

    batch = spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    dim = muni.select(
        "CD_MUN", "UF",
        grid_snap(F.col("lat")).alias("grid_lat"),
        grid_snap(F.col("lon")).alias("grid_lon"),
    )
    want = (
        batch.withColumnsRenamed({"lat": "grid_lat", "lon": "grid_lon"})
        .join(F.broadcast(dim), ["grid_lat", "grid_lon"])
        .groupBy(F.window("ts", "1 day").alias("w"), "CD_MUN", "UF", "var")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(F.col("value").cast("decimal(24,8)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("day"), "CD_MUN", "UF", "var",
                "n_cells", "sum_value")
        .orderBy("day", "CD_MUN", "var")
        .toPandas()
    )
    assert len(got) > 0, "stream produced no rows — snap join matched nothing"
    assert got["sum_value"].tolist() == want["sum_value"].tolist()
    assert got["n_cells"].tolist() == want["n_cells"].tolist()
    assert got["CD_MUN"].tolist() == want["CD_MUN"].tolist()

    # sink parity (round-5 review item #8): the same stream through the
    # partitioned file sink (foreachBatch → write_parquet_partitioned),
    # re-read from disk, must equal the batch answer — the streaming twin
    # of climate_e2e's write+read certification, including the UF
    # partition-column round trip
    from amazon_climate_data_etl_spark.streaming.jobs import (
        run_to_partitioned_sink,
    )

    sink = str(tmp_path / "daily_sink")
    stream2 = spark.readStream.schema(GRID_READINGS_DDL).json(str(d))
    run_to_partitioned_sink(
        climate_stream_daily(stream2, muni),
        sink,
        partition_cols=("UF",),
        checkpoint=str(tmp_path / "daily_ckpt"),
    )
    back = (
        spark.read.parquet(sink)
        .orderBy("day", "CD_MUN", "var")
        .toPandas()
    )
    assert back["sum_value"].tolist() == want["sum_value"].tolist()
    assert back["n_cells"].tolist() == want["n_cells"].tolist()
    assert back["CD_MUN"].tolist() == want["CD_MUN"].tolist()
    assert sorted(back["UF"].unique()) == sorted(want["UF"].unique())


def test_incremental_dedup_stream_matches_batch(spark, tmp_path):
    """The daily-crawl delta as a stream: novel-vs-corpus filtering plus
    stream-internal first-seen dedup must emit exactly the batch answer
    (set of novel fingerprints, one row each)."""
    import pandas as pd

    from amazon_climate_data_etl_spark.functions.text import doc_fingerprint
    from amazon_climate_data_etl_spark.streaming.jobs import (
        DOCS_DDL,
        incremental_dedup_stream,
    )

    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta", "gamma delta"]})
    )
    # the delta: one corpus dup, one novel repeated twice (differing only
    # in whitespace — the normalized fingerprint must still collapse it),
    # one unique novel
    rows = [
        {"doc_id": 10, "ts": "2024-01-01T00:00:00", "text": "alpha beta"},
        {"doc_id": 11, "ts": "2024-01-01T00:01:00", "text": "epsilon zeta"},
        {"doc_id": 12, "ts": "2024-01-01T00:02:00", "text": "epsilon  zeta"},
        {"doc_id": 13, "ts": "2024-01-01T00:03:00", "text": "eta theta"},
    ]
    d = tmp_path / "docs_stream"
    d.mkdir()
    with open(d / "part-0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema(DOCS_DDL).json(str(d))
    )
    run_to_memory_sink(
        incremental_dedup_stream(stream, corpus), "inc_dedup_sink"
    )
    got = spark.table("inc_dedup_sink").toPandas()

    # batch twin: novel fingerprints, one survivor each
    delta = spark.createDataFrame(pd.DataFrame(rows)).withColumn(
        "fp", doc_fingerprint(F.col("text"))
    )
    fp_index = corpus.select(doc_fingerprint(F.col("text")).alias("fp")).distinct()
    batch_fps = set(
        r["fp"]
        for r in delta.join(fp_index, "fp", "left_anti")
        .select("fp").distinct().collect()
    )
    assert set(got["fp"]) == batch_fps
    assert len(got) == len(batch_fps) == 2  # one per novel fingerprint
    # the first-seen doc wins the in-stream race
    assert set(got["doc_id"]) == {11, 13}


def test_streaming_anomaly_monitor_equals_batch(spark, events_json_dir):
    """The streamed monitor's FINAL trigger snapshot must be bit-identical
    to the batch daily_volume_anomalies answer on the same events: same
    (type, day) rows, same exact counts, same 6-dp z-scores and flags."""
    from amazon_climate_data_etl_spark.operators.events import (
        daily_volume_anomalies,
    )
    from amazon_climate_data_etl_spark.streaming.jobs import (
        daily_counts_stream,
        run_anomaly_monitor,
    )

    snapshots: list = []
    stream = stream_from_json_dir(spark, events_json_dir)
    run_anomaly_monitor(daily_counts_stream(stream), snapshots)
    assert snapshots, "no trigger fired"
    got = (
        snapshots[-1]
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    want = (
        daily_volume_anomalies(spark, SF)
        .toPandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["event_type"].values == want["event_type"].values).all()
    assert (got["n"].values == want["n"].values).all()
    assert (got["z_score"].values == want["z_score"].values).all()
    assert (got["is_anomaly"].values == want["is_anomaly"].values).all()
    assert bool(got["is_anomaly"].any())  # fixture actually has anomalies


def test_incremental_verdicts_stream_equals_batch(spark, tmp_path):
    """FULL-verdict batch equivalence (r8 review item 7): streaming the
    registered query's own delta slice (sf0.001 docs with doc_id % 5 == 4,
    split across three micro-batches) against the remaining corpus must
    reproduce the batch ``incremental_dedup`` frame row-for-row — verdicts,
    dup_of targets, and Jaccard scores included."""
    import importlib.util
    import os as _os

    from amazon_climate_data_etl_spark.catalog import load_table
    from amazon_climate_data_etl_spark.streaming.jobs import (
        DOCS_DDL,
        run_incremental_verdicts_stream,
    )

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "__spark_entry__.py",
        ),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    delta = d.filter(F.col("doc_id") % 5 == 4).select("doc_id", "text").collect()
    corpus = d.filter(F.col("doc_id") % 5 != 4).select("doc_id", "text")

    # three json files + maxFilesPerTrigger=1 => three real micro-batches
    src = tmp_path / "delta_stream"
    src.mkdir()
    for part in range(3):
        with open(src / f"part-{part}.json", "w") as f:
            for r in delta[part::3]:
                f.write(
                    json.dumps(
                        {
                            "doc_id": r["doc_id"],
                            "ts": "2024-01-01T00:00:00",
                            "text": r["text"],
                        }
                    )
                    + "\n"
                )
    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    try:
        run_incremental_verdicts_stream(
            stream, corpus, sink_name="inc_verdicts_eq", overwrite=True
        )
        got = (
            spark.table("inc_verdicts_eq")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            entry.queries()["incremental_dedup"](spark, sf)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(got.columns) == list(want.columns)
        assert got.equals(want), (got.head(20), want.head(20))
        # the fixture exercises every verdict class
        assert set(want["verdict"]) == {"exact_dup", "near_dup", "new"} or set(
            want["verdict"]
        ) <= {"exact_dup", "near_dup", "new"}
    finally:
        spark.sql("DROP TABLE IF EXISTS inc_verdicts_eq")


def test_semantic_probe_stream_equals_batch(spark, tmp_path):
    """Semantic-family batch equivalence (r10 review item 6): streaming a
    delta slice of the embeddings (vec_id % 5 == 4, split across three
    micro-batches) against the remaining corpus must reproduce the shared
    ``_semantic_verdicts`` core's batch output row-for-row — verdicts,
    dup_of targets, and cosine scores included (the static SemDeDup index
    is built once; micro-batching must not change any verdict)."""
    from amazon_climate_data_etl_spark.operators.similarity import (
        _semantic_probe_state,
        _semantic_verdicts,
    )
    from amazon_climate_data_etl_spark.streaming.jobs import (
        run_semantic_probe_stream,
    )

    e = load_table(spark, SF, "embeddings")
    delta_pred = F.col("vec_id") % 5 == 4
    corpus = e.filter(~delta_pred).select("vec_id", "embedding")
    delta = e.filter(delta_pred).select("vec_id", "embedding")

    rows = delta.collect()
    src = tmp_path / "vec_stream"
    src.mkdir()
    for part in range(3):
        with open(src / f"part-{part}.json", "w") as f:
            for r in rows[part::3]:
                f.write(
                    json.dumps(
                        {
                            "vec_id": r["vec_id"],
                            "embedding": [float(x) for x in (r["embedding"] or [])],
                        }
                    )
                    + "\n"
                )
    stream = (
        spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    try:
        run_semantic_probe_stream(
            stream, corpus, sink_name="sem_verdicts_eq", overwrite=True
        )
        got = (
            spark.table("sem_verdicts_eq")
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        want = (
            _semantic_verdicts(delta, _semantic_probe_state(corpus))
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert list(got.columns) == list(want.columns)
        assert got.equals(want), (got.head(20), want.head(20))
        assert len(want) == delta.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS sem_verdicts_eq")

    # verdict-class coverage on a crafted corpus (the sf0.001 embeddings
    # are near-orthogonal, so the real-data delta is all 'new'/'exact'):
    # a byte-identical vector → exact_dup, a scaled copy (cosine 1.0 to
    # corpus vec 0, different bytes) → near_dup, an orthogonal one → new
    base = [1.0, 0.0, 0.0, 0.0]
    synth_corpus = spark.createDataFrame(
        [(0, base), (1, [0.0, 1.0, 0.0, 0.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    synth_delta = spark.createDataFrame(
        [(10, base), (11, [2.0, 0.0, 0.0, 0.0]), (12, [0.0, 0.0, 0.0, 1.0])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    v = {
        r["vec_id"]: r
        for r in _semantic_verdicts(
            synth_delta, _semantic_probe_state(synth_corpus)
        ).collect()
    }
    assert v[10]["verdict"] == "exact_dup" and v[10]["dup_of"] == 0
    assert v[11]["verdict"] == "near_dup" and v[11]["dup_of"] == 0
    assert v[11]["cosine"] == 1.0
    assert v[12]["verdict"] == "new" and v[12]["dup_of"] is None


def test_stream_sink_hygiene(spark):
    """The foreachBatch sinks reject non-identifier names and refuse to
    clobber an existing table unless overwrite=True (r10 advice)."""
    from amazon_climate_data_etl_spark.streaming.jobs import _prepare_sink

    with pytest.raises(ValueError, match="identifier"):
        _prepare_sink(spark, "x; DROP TABLE y", overwrite=True)
    with pytest.raises(ValueError, match="identifier"):
        _prepare_sink(spark, "cat.schema.table", overwrite=False)
    spark.range(1).write.mode("overwrite").saveAsTable("hygiene_existing")
    try:
        with pytest.raises(ValueError, match="already exists"):
            _prepare_sink(spark, "hygiene_existing", overwrite=False)
        _prepare_sink(spark, "hygiene_existing", overwrite=True)  # drops it
        assert not spark.catalog.tableExists("hygiene_existing")
    finally:
        spark.sql("DROP TABLE IF EXISTS hygiene_existing")


def test_crawl_extract_stream_matches_batch(spark, tmp_path):
    """The crawl-ingest map chain (markup → boilerplate extraction → PII
    scrub of the clean text) streamed file-by-file must equal the same
    chain applied in batch to the same documents — the stateless-map
    lifting contract of the r11 family."""
    import json

    from amazon_climate_data_etl_spark.streaming.jobs import crawl_extract_stream

    docs = [
        {
            "doc_id": i,
            "html": (
                '<div class="nav"><a href="/">home</a></div>\n'
                f"<p>page {i} alpha beta mail user{i}@ex.com gamma delta.</p>\n"
                f"<p>short {i}.</p>\n"
                f"<div>(c) crawl 10.0.0.{i % 250}</div>"
            ),
        }
        for i in range(40)
    ]
    d = str(tmp_path / "crawl")
    os.makedirs(d)
    for b in range(4):  # 4 files → 4 micro-batches
        with open(os.path.join(d, f"part-{b}.json"), "w") as f:
            for doc in docs[b * 10 : (b + 1) * 10]:
                f.write(json.dumps(doc) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, html string")
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )
    run_to_memory_sink(crawl_extract_stream(stream), "t_crawl_extract")
    got = {r.doc_id: r for r in spark.table("t_crawl_extract").collect()}

    batch = spark.createDataFrame(
        [(doc["doc_id"], doc["html"]) for doc in docs], "doc_id long, html string"
    )
    want = {r.doc_id: r for r in crawl_extract_stream(batch).collect()}
    assert got == want and len(got) == 40
    # the chain actually did its job: nav/footer dropped, emails counted
    assert all(r.n_kept == 1 and r.n_lines == 4 for r in got.values())
    assert all(r.n_email == 1 for r in got.values())
    # the footer IP is boilerplate-dropped before the scrub sees it
    assert all(r.n_ip == 0 for r in got.values())


def test_wat_metadata_stream_matches_batch_and_drops_late(spark, tmp_path):
    """The WAT-metadata rollup streamed file-by-file must equal the same
    rollup applied in batch to the ON-TIME rows, and a record arriving
    after the watermark has passed its window must be DROPPED — the
    bounded-state contract of the continuous crawl-ingestion hop."""
    import json
    import os

    from amazon_climate_data_etl_spark.streaming.jobs import (
        run_to_memory_sink,
        wat_metadata_stream,
    )

    def line(doc_id, source, lang, n_tokens, n_links, ts):
        return {
            "fetch_ts": ts,
            "value": json.dumps(
                {
                    "url": f"http://{source}.example.com/doc/{doc_id}",
                    "lang": lang,
                    "n_chars": 10 * n_tokens,
                    "n_tokens": n_tokens,
                    "links": [
                        f"http://{source}.example.com/doc/{doc_id + j + 1}"
                        for j in range(n_links)
                    ],
                }
            ),
        }

    on_time = [
        line(1, "srcA", "en", 10, 2, "2026-08-16 10:05:00"),
        line(2, "srcA", "en", 20, 1, "2026-08-16 10:40:00"),
        line(3, "srcA", "pt", 7, 0, "2026-08-16 10:10:00"),
        line(4, "srcB", "en", 5, 3, "2026-08-16 11:15:00"),
        line(5, "srcA", "en", 9, 0, "2026-08-16 11:30:00"),
        # the clock-advancer rides the FIRST batch: pushes the watermark
        # past 10:xx + 2h once that batch commits
        line(6, "srcB", "pt", 4, 1, "2026-08-16 14:00:00"),
        # second-batch filler in the still-open 14:00 window (its window
        # is never emitted before the source drains)
        line(8, "srcB", "pt", 2, 0, "2026-08-16 14:05:00"),
    ]
    # arrives two batches after the advancer, stamped inside the
    # long-closed 10:00 window -> must be dropped by the 2h watermark
    late = line(7, "srcA", "en", 1000, 3, "2026-08-16 10:20:00")

    d = str(tmp_path / "wat_stream")
    os.makedirs(d)
    # 3 micro-batches; the file source orders batches by MTIME, and the
    # operative late-row filter watermark lags the advancer's batch (the
    # late file is the THIRD batch — same protocol as
    # test_watermark_drops_late_events)
    import time

    batches = [on_time[:6], [on_time[6]], [late]]
    for b, rows in enumerate(batches):
        with open(os.path.join(d, f"part-{b}.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        if b < len(batches) - 1:
            time.sleep(1.05)

    stream = (
        spark.readStream.schema("fetch_ts timestamp, value string")
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )
    q = run_to_memory_sink(
        wat_metadata_stream(stream), "t_wat_meta", mode="append"
    )
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1
    got = {
        (str(r.hour), r.source, r.lang): (r.n_docs, r.sum_tokens, r.sum_links)
        for r in spark.table("t_wat_meta").collect()
    }

    from datetime import datetime

    batch = spark.createDataFrame(
        [
            (datetime.strptime(r["fetch_ts"], "%Y-%m-%d %H:%M:%S"), r["value"])
            for r in on_time
        ],
        "fetch_ts timestamp, value string",
    )
    from amazon_climate_data_etl_spark.streaming.jobs import (
        wat_metadata_stream as twin,
    )

    want_rows = twin(batch).collect()
    want = {
        (str(r.hour), r.source, r.lang): (r.n_docs, r.sum_tokens, r.sum_links)
        for r in want_rows
    }
    # append mode emits only windows the watermark has CLOSED: the
    # 14:00 advancer's own window is still open at source drain, so the
    # batch twin's row set minus open windows is the expectation
    closed = {k: v for k, v in want.items() if not k[0].startswith("2026-08-16 14:")}
    assert got == closed
    # the late doc's 1000 tokens appear nowhere
    assert all(v[1] < 1000 for v in got.values())
    # and the on-time aggregation is hand-checkable
    assert got[("2026-08-16 10:00:00", "srcA", "en")] == (2, 30, 3)
    assert got[("2026-08-16 10:00:00", "srcA", "pt")] == (1, 7, 0)
    assert got[("2026-08-16 11:00:00", "srcB", "en")] == (1, 5, 3)
