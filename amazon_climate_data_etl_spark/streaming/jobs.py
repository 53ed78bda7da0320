"""Structured Streaming forms of the event operators (operators/events.py).

The reference has no streaming (SURVEY.md §2.9); this is the engine's
capability extension mapped onto Spark's native streaming model:
``readStream`` → event-time windows + watermarks → ``writeStream``. Each
job takes an already-constructed streaming DataFrame with the events schema
(event_id, ts, user_id, event_type, value, props), so sources are
pluggable: file source in tests, Kafka in production (same code — swap
``spark.readStream.format``).

Semantics notes (asserted in tests/test_streaming.py):
- Watermarks bound state: aggregates drop state for windows older than the
  watermark; late events beyond it are dropped — the knob that makes
  infinite streams finite-memory at 100 TB/day rates.
- ``dropDuplicatesWithinWatermark`` is the streaming twin of the batch
  event_dedup_first query.
- ``session_window`` is the native form of the batch lag+cumsum
  sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

DEFAULT_WATERMARK = "2 hours"


def stream_from_json_dir(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of JSON event lines (test/dev source; production
    swaps in Kafka with the same downstream plan).

    ``max_files_per_trigger=1`` replays file-by-file in separate
    micro-batches — needed to observe watermark advancement (the watermark
    only moves between batches)."""
    reader = spark.readStream.schema(EVENTS_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def tumbling_counts(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming twin of operators.events.tumbling_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming twin of operators.events.sliding_windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Native session windows (twin of the batch lag+cumsum form)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Watermarked exact-once dedup on event_id."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total, emitted once per micro-batch.

    This is the escape hatch for operators Spark's built-in streaming
    aggregates can't express (arbitrary per-key state machines). State is
    one tuple per user — bounded, spill-free; batches arrive Arrow-encoded
    so the Python hop is vectorized, not per-row. The same shape scales to
    e.g. per-document accumulating quality counters over a 100 TB/day feed:
    shuffle on the state key once, state store does the rest.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same per-user running totals on the MODERN arbitrary-state API
    (``transformWithStateInPandas``, Spark 4.x): a ``StatefulProcessor``
    with a typed ``ValueState`` handle replaces the
    ``applyInPandasWithState`` closure above. Same semantics, same Arrow
    vectorized batches, same one-shuffle-on-the-state-key shape — but the
    handle API adds what a production 100 TB/day feed needs: per-state
    TTLs, timers for expiry callbacks, and list/map state for richer
    per-key machines. ``test_streaming.py`` asserts both forms emit the
    identical final state (skipped where protobuf is absent).

    Environment gate: the TWS state protocol needs ``google.protobuf``
    (absent from this container — the operator crashes the state driver
    worker without it). Also requires the RocksDB state store provider.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf (the TWS "
            "state-server protocol); install protobuf to run this operator. "
            "The applyInPandasWithState form (running_user_totals) is the "
            "dependency-free equivalent."
        ) from e
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def enrich_with_static_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a (small) dimension
    table on user_id. The static side is broadcast per micro-batch — no
    stream state, no watermark needed (only stream-stream joins hold join
    state). This is the streaming form of the batch J3 dimension
    enrichment; at production rates the dim refreshes by swapping the
    DataFrame between restarts, or a Delta table picks up updates live."""
    return events.join(F.broadcast(dim), "user_id", "left")


def click_purchase_join(
    events: DataFrame,
    within: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Stream-stream interval join: purchases attributed to a preceding
    click by the same user within ``within``.

    Both sides carry watermarks AND the join condition bounds event-time
    distance — together they let Spark expire join state (a click's state
    can drop once the watermark passes click_ts + within). Without the
    interval bound the state store grows without limit; this is the
    canonical shape for attribution joins on unbounded streams."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, mode: str = "append"):
    """Drive a streaming query into an in-memory table until the source
    drains; returns the StreamingQuery (caller reads ``spark.table(name)``)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_to_partitioned_sink(
    stream_df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("UF",),
    checkpoint: str | None = None,
    output_mode: str = "complete",
):
    """Drive a streaming query into a PARTITIONED parquet sink via
    foreachBatch → ``sources.sinks.write_parquet_partitioned`` — the same
    write+read round trip ``climate_e2e`` certifies for batch, closed for
    streams (round-5 review item #8).

    ``complete`` output mode is the right default for a watermarked
    aggregate drained with availableNow: each micro-batch hands
    foreachBatch the FULL updated aggregate, and the overwrite write
    inside the sink helper leaves the final answer on disk when the
    source drains (append mode would withhold every window the watermark
    has not yet closed — on a bounded replay that is all of the most
    recent ones). High-cardinality fact streams should instead use append
    mode with a per-batch (non-overwrite) writer. Runs until the source
    drains; returns the StreamingQuery."""
    from amazon_climate_data_etl_spark.sources import sinks

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        sinks.write_parquet_partitioned(batch_df, path, tuple(partition_cols))

    w = (
        stream_df.writeStream.foreachBatch(_write)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.awaitTermination()
    return q


GRID_READINGS_DDL = "ts timestamp, lat double, lon double, var string, value double"


def climate_stream_daily(
    readings: DataFrame,
    municipalities: DataFrame,
    step: float = 0.25,
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming form of the reference's ingestion→daily-municipal step:
    long-format grid readings (ts, lat, lon, var, value) arrive as a
    stream, snap-join the (static, broadcast) municipality dimension —
    the J-NN grid-snap as a stream-static join, so no join state — then a
    watermarked 1-day tumbling aggregation per (municipality, variable).

    This is the shape a live BR-DWGD-style feed takes at 100 TB: the fact
    stream never shuffles for the enrich (broadcast dim), the only state
    is the windowed aggregate, and the watermark bounds it to ~2 days of
    open windows per (mun, var) key. Downstream (VPD, annual rollup) runs
    on the materialized daily table — VPD needs the 7-variable wide row,
    which is a batch pivot over the sink, not stream state. Sums go
    through exact decimals so the streamed result is bit-identical to the
    batch twin on the same data (asserted in tests)."""
    from amazon_climate_data_etl_spark.functions.climate import grid_snap

    dim = municipalities.select(
        "CD_MUN",
        "UF",
        grid_snap(F.col("lat"), step).alias("grid_lat"),
        grid_snap(F.col("lon"), step).alias("grid_lon"),
    )
    fact = readings.withColumnsRenamed({"lat": "grid_lat", "lon": "grid_lon"})
    return (
        fact.withWatermark("ts", watermark)
        .join(F.broadcast(dim), ["grid_lat", "grid_lon"])
        .groupBy(F.window("ts", "1 day").alias("w"), "CD_MUN", "UF", "var")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(F.col("value").cast("decimal(24,8)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("day"),
            "CD_MUN",
            "UF",
            "var",
            "n_cells",
            "sum_value",
        )
    )


def daily_counts_stream(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Watermarked per-(type, day) volume counts — the streaming state
    under the anomaly monitor: one windowed aggregate, state bounded to
    the watermark horizon per (type, day) key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.to_date("w.start").alias("day"), "n")
    )


def run_anomaly_monitor(counts_stream: DataFrame, snapshots: list) -> None:
    """Streaming twin of ``daily_volume_anomalies``: the windowed count
    aggregate is the ONLY stream state; the per-type moment re-aggregation
    and z-score flags are re-derived per trigger inside foreachBatch with
    the SAME factored expressions the batch operator uses
    (``anomaly_flags_from_daily``), on the full counts the complete-mode
    batch hands over. That split is the production monitor shape: cheap
    incremental state in the stream, model re-fit per trigger batch-side —
    Spark would otherwise reject the moments agg as a second stateful
    operator over an aggregated stream. Each trigger's flag table is
    appended to ``snapshots``; the last snapshot is the final answer and
    is asserted bit-equal to the batch operator in tests."""
    from amazon_climate_data_etl_spark.operators.events import (
        anomaly_flags_from_daily,
    )

    def sink(batch_df, _batch_id) -> None:
        snapshots.append(anomaly_flags_from_daily(batch_df).toPandas())

    q = (
        counts_stream.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


DOCS_DDL = "doc_id long, ts timestamp, text string"


def incremental_dedup_stream(
    new_docs: DataFrame,
    corpus: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming form of the batch ``incremental_dedup`` delta shape: a
    stream of newly crawled documents is deduplicated against the
    existing corpus AND against itself, emitting only first-seen novel
    documents.

    Plan: content fingerprint (normalized-text md5, the same expression
    the batch dedup family uses) → stream-static LEFT ANTI join against
    the corpus fingerprint index (static side; at scale a parquet/Delta
    fp table — the stream carries no join state because the static side
    is re-read per micro-batch) → ``dropDuplicatesWithinWatermark`` on
    the fingerprint for stream-internal dups, whose state the watermark
    bounds to the late-data horizon. Work per micro-batch is ∝ |delta|,
    never |corpus| — the same scaling contract as the batch twin, with
    state bounded by fp cardinality inside one watermark window."""
    from amazon_climate_data_etl_spark.functions.text import doc_fingerprint

    fp_index = corpus.select(doc_fingerprint(F.col("text")).alias("fp")).distinct()
    return (
        new_docs.withColumn("fp", doc_fingerprint(F.col("text")))
        .withWatermark("ts", watermark)
        .join(fp_index, "fp", "left_anti")
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "ts", "fp")
    )


def run_incremental_verdicts_stream(
    new_docs: DataFrame,
    corpus: DataFrame,
    sink_name: str = "inc_verdicts",
    overwrite: bool = False,
):
    """FULL-verdict streaming twin of the batch ``incremental_dedup``
    query: each micro-batch of newly crawled documents runs the SAME
    ``operators.dedup._incremental_verdicts`` core against the static
    corpus index — exact-fp probe, corpus-representative LSH probe,
    Jaccard verify, per-delta best match — appending one
    (doc_id, verdict, dup_of, jaccard) row per delta doc to a managed
    sink table. Returns the StreamingQuery (drained with availableNow).

    ``foreachBatch`` is the honest vehicle here, not a limitation
    workaround to hide: the verdict plan aggregates the stream side
    (per-doc MinHash signatures are a groupBy) and then joins — a shape
    Structured Streaming's incremental planner cannot run in append mode
    as one continuous query. foreachBatch gives each micro-batch the full
    batch planner against the static corpus, which is exactly the daily-
    crawl deployment shape: work per trigger ∝ |delta|, corpus state
    re-read (or Delta-cached) per batch, no stream state carried at all.
    The simpler always-incremental exact-stage twin
    (``incremental_dedup_stream`` above) remains the low-latency path;
    this one closes batch-equivalence for the three-way verdict family
    (asserted in tests/test_streaming.py)."""
    from amazon_climate_data_etl_spark.operators.dedup import (
        _incremental_verdicts,
    )

    spark = corpus.sparkSession

    def _per_batch(batch_df: DataFrame, _batch_id: int) -> None:
        out = _incremental_verdicts(
            batch_df.select("doc_id", "text"), corpus, persist=False
        )
        out.write.mode("append").saveAsTable(sink_name)

    _prepare_sink(spark, sink_name, overwrite)
    q = (
        new_docs.writeStream.foreachBatch(_per_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


_SINK_NAME_RE = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _prepare_sink(spark: SparkSession, sink_name: str, overwrite: bool) -> None:
    """Shared sink hygiene for the foreachBatch runners: the table name
    must be a plain unqualified identifier (it is string-interpolated
    into DDL — reject anything else loudly), and dropping an existing
    table is OPT-IN (``overwrite=True``), never an implicit side effect
    of starting a stream (r10 advice: the old unconditional DROP was
    destructive if pointed at an existing table)."""
    if not _SINK_NAME_RE.match(sink_name):
        raise ValueError(
            f"sink_name {sink_name!r} is not a plain identifier "
            "([A-Za-z_][A-Za-z0-9_]*)"
        )
    if overwrite:
        spark.sql(f"DROP TABLE IF EXISTS {sink_name}")
    elif spark.catalog.tableExists(sink_name):
        raise ValueError(
            f"sink table {sink_name!r} already exists; pass overwrite=True "
            "to replace it or choose a fresh name (appending a new stream "
            "into an old run's rows is almost never intended)"
        )


def run_semantic_probe_stream(
    new_vecs: DataFrame,
    corpus: DataFrame,
    sink_name: str = "sem_verdicts",
    overwrite: bool = False,
):
    """Streaming twin for the SEMANTIC dedup family: each micro-batch of
    newly embedded documents runs the shared
    ``operators.similarity._semantic_verdicts`` core — exact-embedding
    probe, Lloyd-centroid assignment, within-cluster cosine verify,
    per-delta best match — against a STATIC SemDeDup index built once at
    stream start (``_semantic_probe_state``: k·d driver-held integer
    centroids + the persisted normalized corpus keyed by cluster).
    Appends one (vec_id, verdict, dup_of, cosine) row per delta vector;
    returns the drained StreamingQuery (availableNow).

    foreachBatch for the same reason as ``run_incremental_verdicts_stream``:
    the verdict plan aggregates the stream side and joins — not an
    append-mode-incremental shape — and the daily-crawl deployment wants
    exactly this: index built once, per-trigger work ∝ |delta|·|cluster|,
    no stream state beyond the static index."""
    from amazon_climate_data_etl_spark.operators.similarity import (
        _semantic_probe_state,
        _semantic_verdicts,
    )

    spark = corpus.sparkSession
    state = _semantic_probe_state(corpus)

    def _per_batch(batch_df: DataFrame, _batch_id: int) -> None:
        out = _semantic_verdicts(batch_df.select("vec_id", "embedding"), state)
        out.write.mode("append").saveAsTable(sink_name)

    _prepare_sink(spark, sink_name, overwrite)
    q = (
        new_vecs.writeStream.foreachBatch(_per_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def crawl_extract_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of the crawl-ingest map chain (r11): markup →
    boilerplate extraction → PII scrub of the extracted clean text, as
    one continuous query over a (doc_id, html) stream — the Kafka→extract
    hop of a crawl pipeline. Every rule is a stateless pure map
    (textops.html_is_content / _html_strip / pii_scrub_columns), so the
    chain lifts to Structured Streaming unchanged: append mode, no
    watermark, no state store — per-record latency is one codegen pass.
    Batch equivalence is the correctness contract (test_streaming)."""
    from pyspark.sql import functions as F

    from amazon_climate_data_etl_spark.operators.textops import (
        _html_strip,
        html_is_content,
        pii_scrub_columns,
    )

    lines = F.split(F.col("html"), "\n")
    kept = F.filter(lines, html_is_content)
    mid = docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(F.transform(kept, _html_strip), "\n").alias("clean"),
    )
    counts, red = pii_scrub_columns(F.col("clean"))
    return mid.select(
        "doc_id",
        "n_lines",
        "n_kept",
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        F.md5(red).alias("scrubbed_md5"),
    )


def wat_metadata_stream(meta: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``wat_metadata_profile``'s rollup (r13): WAT
    metadata-JSON lines arrive as a (fetch_ts, value) stream — the
    continuous-ingestion hop of a crawl pipeline (Common Crawl WAT
    records off a queue) — are parsed with ``from_json`` against the
    batch query's schema, and roll up per 1-hour tumbling window ×
    (source, lang): doc counts and token/link sums.

    Scale shape: the parse + URL-identity recovery are stateless pure
    maps (one codegen pass per record); the ONLY state is the watermarked
    windowed aggregate, bounded to ~``watermark`` of open windows per
    (source, lang) key — the same state story as climate_stream_daily.
    All sums are exact integer arithmetic, so the streamed result is
    bit-identical to the same rollup applied in batch to the same rows
    (asserted in tests, late-data drop included)."""
    from amazon_climate_data_etl_spark.operators.textops import (
        CRAWL_URL_SOURCE_RE,
        _WAT_SCHEMA,
    )

    m = meta.select(
        "fetch_ts",
        F.from_json(F.col("value"), _WAT_SCHEMA).alias("m"),
    ).select(
        "fetch_ts",
        F.regexp_extract("m.url", CRAWL_URL_SOURCE_RE, 1).alias("source"),
        F.col("m.lang").alias("lang"),
        F.col("m.n_tokens").alias("n_tokens"),
        F.size("m.links").cast("long").alias("n_links"),
    )
    return (
        m.withWatermark("fetch_ts", watermark)
        .groupBy(F.window("fetch_ts", "1 hour").alias("w"), "source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum("n_links").alias("sum_links"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "source",
            "lang",
            "n_docs",
            "sum_tokens",
            "sum_links",
        )
    )
