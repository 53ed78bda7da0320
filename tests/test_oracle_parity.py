"""Mirror of the driver's correctness gate: every ``queries()`` entry with an
``oracle_sql()`` twin must match DuckDB on row count + schema + values.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's exact scale.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from tests.oracle_harness import compare_frames, duckdb_conn, exact_float_mismatches

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and entry_mod)

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


def test_every_oracle_has_query():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    with duckdb_conn(sf_dir) as conn:
        odf = conn.execute(ORACLE[name]).df()
    problems = compare_frames(sdf, odf, name)
    assert not problems, "\n".join(problems)
    # Bit-exactness guard: the driver may hash floats exactly; our decimal-sum
    # strategy should make results identical, not merely close.
    assert exact_float_mismatches(sdf, odf) == 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns[0] == "l_returnflag"
