"""Seeded random event-stream parity: tie-dense streams vs the oracle.

The edge-events suite (test_edge_events.py) pins HAND-PICKED ties and
boundaries; this one draws timestamps from a deliberately tiny pool (~28
instants across two days, several of them hour-aligned, session-gap-wide,
or 1 µs apart) over a handful of users, so equal-timestamp collisions,
same-(user,type,ts) duplicates, boundary-straddling sessions, and
empty/overfull as-of and range windows arise in RANDOM combinations.
Every events-family query must match its DuckDB oracle bit-exactly —
tie frames and window-inclusion rules are exactly where the round-9
advice item (forward as-of tie) lived.

Values are dyadic rationals (k/64) so no float-sum-order question can
masquerade as an engine divergence. Fixed seeds; failures replay.
"""

from __future__ import annotations

import os
import random
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_harness import (
    TABLES,
    compare_frames,
    duckdb_conn,
    exact_float_mismatches,
)
from tests.test_edge_events import _EVENT_QUERIES, ORACLE, QUERIES

_FUZZ_EVENT_QUERIES = _EVENT_QUERIES + [
    "latest_event_per_user",
    "daily_volume_anomalies",
]

_TYPES = ["view", "click", "purchase", "signup", "error"]
_PROPS = [
    "{}",
    '{"k": 5}',
    '{"k": -3}',
    '{"k": null}',
    '{"k": "abc"}',
    "not json",
    "",
    None,
    "[1, 2]",
    "{",
]


def _ts_pool() -> list[int]:
    """~28 instants chosen for maximal boundary traffic: hour-aligned,
    1 µs off the hour, exactly 30 min apart (the session-gap threshold),
    exactly 300 s apart (the range-join window), same-day clusters, and
    a midnight."""
    anchors = [
        "2024-03-01 09:00:00",
        "2024-03-01 09:00:00.000001",
        "2024-03-01 09:04:59.999999",
        "2024-03-01 09:05:00",        # +300 s from 09:00 (range W edge)
        "2024-03-01 09:30:00",        # +30 min (session-gap edge)
        "2024-03-01 09:30:00.000001",
        "2024-03-01 10:00:00",
        "2024-03-01 10:59:59.999999",
        "2024-03-01 11:00:00",
        "2024-03-01 11:30:00",
        "2024-03-01 12:00:00",
        "2024-03-02 00:00:00",        # midnight (pivot day boundary)
        "2024-03-02 00:30:00",
        "2024-03-02 01:00:00",
    ]
    pool = [pd.Timestamp(s).value for s in anchors]
    # a few derived instants: +1 s, +299 s, +1800 s off two anchors
    base = pd.Timestamp("2024-03-01 14:00:00").value
    for off_us in (0, 1, 299_000_000, 300_000_000, 1_800_000_000,
                   1_800_000_001, 3_600_000_000):
        pool.append(base + off_us * 1000)
    pool.append(pd.Timestamp("2024-03-05 10:00:00").value)
    return pool


def _gen_events(seed: int, n_events: int) -> list[tuple]:
    rng = random.Random(seed)
    pool = _ts_pool()
    rows = []
    for eid in range(1, n_events + 1):
        user = rng.randrange(1, 7)
        ts = rng.choice(pool)
        etype = rng.choice(_TYPES)
        value = rng.randrange(-64, 4096) / 64.0  # dyadic: exact in float64
        props = rng.choice(_PROPS)
        rows.append((eid, ts, user, etype, value, props))
    return rows


def _write_events(dirpath: str, seed: int, n_events: int) -> str:
    os.makedirs(dirpath, exist_ok=True)
    for t in TABLES:
        if t != "events":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                os.path.join(dirpath, f"{t}.parquet"),
            )
    rows = _gen_events(seed, n_events)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("ns")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))
    return dirpath


@pytest.fixture(scope="module")
def fuzz_events_a(tmp_path_factory):
    return _write_events(str(tmp_path_factory.mktemp("fuzz_ev_a")), seed=20260816, n_events=220)


@pytest.fixture(scope="module")
def fuzz_events_b(tmp_path_factory):
    return _write_events(str(tmp_path_factory.mktemp("fuzz_ev_b")), seed=777, n_events=120)


@pytest.mark.parametrize("name", _FUZZ_EVENT_QUERIES)
def test_fuzz_events_parity(spark, fuzz_events_a, name):
    spark.catalog.clearCache()
    sdf = QUERIES[name](spark, fuzz_events_a).toPandas()
    with duckdb_conn(fuzz_events_a) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0


# second seed for the tie-sensitive core (as-of directions, range windows,
# first-event dedup, sessions — the queries whose semantics ARE the ties)
_TIE_CORE = [
    "asof_join_events",
    "range_join_events",
    "event_dedup_first",
    "session_windows",
    "latest_event_per_user",
]


@pytest.mark.parametrize("name", _TIE_CORE)
def test_fuzz_events_parity_seed2(spark, fuzz_events_b, name):
    spark.catalog.clearCache()
    sdf = QUERIES[name](spark, fuzz_events_b).toPandas()
    with duckdb_conn(fuzz_events_b) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    assert exact_float_mismatches(sdf, odf) == 0
