"""Exactness pins for the round-8 integer kernels in operators/similarity.

The Gram kernel (`_gram_partials`) claims bit-exact integer sums from
hi/lo-split float64 matmuls for any |q| ≤ _GRAM_QMAX and any partitioning
or chunking; the power-iteration kernel claims its Python half-up requant
is value-identical to Spark's CAST(double AS DECIMAL(8,0)). Oracle-parity
tests prove both on real data — these tests prove them on ADVERSARIAL
inputs: magnitudes at the exact domain boundary, sign mixes, ragged
dimensions, chunk-boundary row counts, and decimal half-ties.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.operators.similarity import (
    _GRAM_CHUNK,
    _GRAM_QMAX,
    _gram_partials,
)

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_gram(rows):
    """Arbitrary-precision ground truth for the kernel's three outputs."""
    S: dict[tuple[int, int], int] = {}
    sv: dict[int, int] = {}
    cnt: dict[int, int] = {}
    for r in rows:
        d = len(r)
        for k in range(d):
            sv[k] = sv.get(k, 0) + r[k]
            cnt[k] = cnt.get(k, 0) + 1
            for j in range(k, d):
                S[(k, j)] = S.get((k, j), 0) + r[k] * r[j]
    return S, sv, cnt


def _spark_gram(spark, rows, parts):
    df = spark.createDataFrame(
        [([int(v) for v in r],) for r in rows], "eq array<long>"
    ).repartition(parts)
    out = (
        _gram_partials(df, with_sums=True)
        .groupBy("i", "j")
        .agg(F.sum("s_ij").alias("s"))
        .collect()
    )
    S = {(r["i"], r["j"]): int(r["s"]) for r in out if r["j"] >= 0}
    sv = {r["i"]: int(r["s"]) for r in out if r["j"] == -1}
    cnt = {r["i"]: int(r["s"]) for r in out if r["j"] == -2}
    return S, sv, cnt


_component = st.one_of(
    st.integers(-_GRAM_QMAX, _GRAM_QMAX),
    st.sampled_from(
        [0, 1, -1, _GRAM_QMAX, -_GRAM_QMAX, _GRAM_QMAX - 1, 1 << 18, (1 << 18) - 1]
    ),
)
_rows = st.lists(
    st.lists(_component, min_size=0, max_size=5), min_size=1, max_size=12
)


@given(rows=_rows, parts=st.integers(1, 4))
@example(rows=[[_GRAM_QMAX, -_GRAM_QMAX], [-_GRAM_QMAX, _GRAM_QMAX]], parts=2)
@example(rows=[[(1 << 18) - 1, -(1 << 18)], [1, -1, 1]], parts=1)  # ragged d
@settings(**_SETTINGS)
def test_gram_partials_exact_vs_bigint_truth(spark, rows, parts):
    """Kernel sums (pairs, coordinates, counts) equal arbitrary-precision
    Python integer sums for any sign mix up to ±_GRAM_QMAX, any ragged
    dimension mix, and any partitioning — the associativity claim that
    lets DuckDB certify a numpy path."""
    S, sv, cnt = _spark_gram(spark, rows, parts)
    eS, esv, ecnt = _py_gram(rows)
    assert S == eS
    assert sv == esv
    assert cnt == ecnt


def test_gram_partials_exact_across_chunk_boundary(spark):
    """Cross-chunk accumulation: > _GRAM_CHUNK rows of boundary-magnitude
    components in ONE partition forces multiple split matmuls whose
    recombination must stay exact (the float64 partial bound R·6.9e10 <
    2^53 holds per chunk, not per partition)."""
    n = _GRAM_CHUNK + 1000
    # alternate signs so the true sums stay small while every chunk's
    # float64 partials run at full magnitude
    rows = [[_GRAM_QMAX if i % 2 == 0 else -_GRAM_QMAX, 7] for i in range(n)]
    S, sv, cnt = _spark_gram(spark, rows, 1)
    eS, esv, ecnt = _py_gram(rows)
    assert S == eS and sv == esv and cnt == ecnt


def test_gram_partials_overflow_guard_is_loud(spark):
    df = spark.createDataFrame([([_GRAM_QMAX + 1],)], "eq array<long>")
    with pytest.raises(Exception, match="overflow"):
        _gram_partials(df, with_sums=False).collect()


def test_normalized_keeps_norm_out_of_the_element_lambda(spark):
    """The once-per-row norm claim is an optimizer-shape property: the
    zip_with/array_repeat form keeps the norm aggregate a regular
    once-per-row argument, while CollapseProject substitutes a
    once-referenced norm column straight back into a transform lambda
    (re-evaluating the d-term aggregate PER ELEMENT — measured ~10×).
    Pin the optimized plan: the aggregate must appear inside
    array_repeat, never inside a lambdafunction body."""
    import re

    from amazon_climate_data_etl_spark.catalog import load_table
    from amazon_climate_data_etl_spark.operators.similarity import (
        _nonzero,
        _normalized,
    )

    n = _normalized(_nonzero(load_table(spark, "/root/testdata/sf0.001", "embeddings")))
    plan = n._jdf.queryExecution().optimizedPlan().toString()
    assert "array_repeat" in plan
    # every lambdafunction body must be free of embedded aggregates
    for body in re.findall(r"lambdafunction\((.*)", plan):
        assert "aggregate(" not in body, body


def test_km_assign_tie_break_and_domain_guard(spark):
    """The k-means assignment kernel must break exact distance ties
    toward the LOWEST cluster id (np.argmin first-minimum ≡ the round-≤7
    (dist, cluster_id) struct array_min) and refuse out-of-domain
    magnitudes loudly. Crafted ties: a point equidistant from two
    centroids, duplicate centroids, and a point exactly ON a centroid
    that is duplicated later in the list."""
    from amazon_climate_data_etl_spark.operators.similarity import (
        _KM_QMAX,
        _km_assign,
    )

    cents = [[0, 0], [4, 0], [0, 0], [2, 0]]  # cents[2] duplicates cents[0]
    vecs = spark.createDataFrame(
        [(0, [2, 0]), (1, [0, 0]), (2, [4, 0]), (3, [3, 0])],
        "vec_id long, q array<long>",
    )
    rows = {
        r["vec_id"]: (r["cluster_id"], r["dist"])
        for r in _km_assign(vecs, cents).collect()
    }
    # vec 0 sits ON cents[3] -> cluster 3 wins outright (dist 0 < 4)
    assert rows[0] == (3, 0)
    # vec 1 is ON cents[0] AND cents[2] -> lowest id wins
    assert rows[1] == (0, 0)
    assert rows[2] == (1, 0)
    # vec 3 equidistant (1) from cents[1] and cents[3] -> lowest id (1)
    assert rows[3] == (1, 1)

    with pytest.raises(Exception, match="overflow"):
        _km_assign(
            spark.createDataFrame(
                [(0, [_KM_QMAX + 1])], "vec_id long, q array<long>"
            ),
            [[0]],
        ).collect()
    with pytest.raises(ValueError, match="overflow"):
        _km_assign(vecs, [[_KM_QMAX + 1, 0]])


def test_power_requant_matches_spark_decimal_cast(spark):
    """The power kernel rounds w/wm·1e6 with
    Decimal(repr(x)).quantize(1, ROUND_HALF_UP); Spark rounds with
    CAST(double AS DECIMAL(8,0)) = BigDecimal.valueOf(x).setScale(0,
    HALF_UP). Both operate on the shortest round-tripping decimal of x,
    which never crosses a .5 boundary away from x's exact value — pin
    the identity on exact half-ties, tie neighbours, negatives, signed
    zero, and magnitude extremes of the requant domain."""
    xs: list[float] = [0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5]
    # exact representable half-ties and their one-ulp neighbours across
    # the |x| ≤ 1e6 requant range
    import math

    for k in (0, 1, 2, 9, 99, 12345, 999_999):
        for s in (1.0, -1.0):
            t = s * (k + 0.5)
            xs += [t, math.nextafter(t, 0.0), math.nextafter(t, s * 1e12)]
    # deterministic pseudo-random fill (seeded — no wall-clock state)
    import random

    rng = random.Random(20260815)
    xs += [rng.uniform(-1e6, 1e6) for _ in range(500)]

    pairs = (
        spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
        .select("i", F.col("x").cast("decimal(8,0)").cast("long").alias("y"))
        .collect()
    )
    spark_y = {r["i"]: r["y"] for r in pairs}
    one = Decimal(1)
    for i, x in enumerate(xs):
        py = int(Decimal(repr(x)).quantize(one, rounding=ROUND_HALF_UP))
        assert spark_y[i] == py, (x, spark_y[i], py)
