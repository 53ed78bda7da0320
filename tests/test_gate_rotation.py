"""The driver-gate rotation rule (codified per the round-3 review) must
hold structurally: never-gated and changed-since-green queries lead, and no
query outside the window has an OLDER green row than one inside it — i.e.
rotation is oldest-first, so every query re-earns a driver row at least
every other round."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py"),
)
entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry)


def test_rotation_invariants():
    names = list(entry.queries())
    window = set(names[: entry.GATE_WINDOW])
    tail = [n for n in names[entry.GATE_WINDOW:]]
    green = entry.last_green_rounds()

    # 1. every never-gated query is in the window
    never = [n for n in names if n not in green]
    assert all(n in window for n in never), f"never-gated outside window: {never}"

    # 2. every ACTIVE changed-since-green query (no green row at or after
    # the recorded change round) is in the window
    active_changed = {
        n for n, rnd in entry.CHANGED_SINCE_GREEN.items()
        if green.get(n, 0) < rnd
    }
    assert active_changed <= window | set(never)

    # 3. no starvation: the tail's oldest green row is >= the window's
    # newest unchanged green row cohort boundary — equivalently, any query
    # left out is at least as fresh as every non-priority query kept in
    if tail:
        oldest_out = min(green.get(n, 0) for n in tail)
        in_window_regular = [
            n for n in window
            if n in green and n not in active_changed
        ]
        assert all(green[n] <= oldest_out for n in in_window_regular), (
            "a fresher query displaced a staler one from the gate window"
        )

    # 4. ordering is deterministic (two computations agree)
    assert names == list(entry.queries())

    # staleness budget (round-5 review item #7): at GATE_WINDOW slots per
    # round the steady-state re-attestation cycle is ceil(registry/window)
    # rounds; a driver row may be up to cycle+1 rounds old when it rotates
    # back in. Cap the cycle at 3 rounds — past that, either consolidate
    # queries or raise GATE_WINDOW with explicit sign-off (and update this
    # number in the __spark_entry__ docstring).
    MAX_CYCLE_ROUNDS = 3
    cycle = -(-len(names) // entry.GATE_WINDOW)  # ceil
    assert cycle <= MAX_CYCLE_ROUNDS, (
        f"registry has {len(names)} queries for a {entry.GATE_WINDOW}-slot "
        f"gate window: re-attestation cycle {cycle} rounds exceeds the "
        f"{MAX_CYCLE_ROUNDS}-round staleness budget. Consolidate queries "
        "or raise GATE_WINDOW deliberately."
    )

    # 5. the oracle map rotates identically (same leading order where
    # oracles exist)
    osql = list(entry.oracle_sql())
    filtered = [n for n in names if n in set(osql)]
    assert filtered == osql
