"""Checks for the queries registered WITHOUT a DuckDB oracle (rows-only at
the driver) plus shape/determinism pins that predate a query's oracle.
Since r13 the rows-only set is exactly one query — approx_distinct_users
(HLL ≠ DuckDB's exact distinct, by design)."""

from __future__ import annotations

from amazon_climate_data_etl_spark.operators.relational import approx_distinct_users
from amazon_climate_data_etl_spark.sources.multimodal import media_feature_summary


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = approx_distinct_users(spark, sf_dir).collect()
    assert rows, "no event types"
    for r in rows:
        # rsd=0.02 requested; allow generous 10% headroom at tiny scale
        assert abs(r.approx_users - r.exact_users) <= max(2, 0.1 * r.exact_users), r


def test_media_feature_summary_deterministic(spark, sf_dir):
    a = media_feature_summary(spark, sf_dir).collect()
    b = media_feature_summary(spark, sf_dir).collect()
    assert a == b
    kinds = {r.kind for r in a}
    assert kinds == {"image", "audio", "video"}
    assert sum(r.n_items for r in a) == 96
    # compressible payloads must score lower entropy than random ones
    assert all(0.0 < r.avg_entropy <= 1.0 for r in a)


def test_media_pipeline_profile_deterministic(spark, sf_dir):
    """Hash-checked at the driver since r13 (decode-sidecar oracle) —
    kept here as the shape/determinism pin that predates the oracle. The
    five stages and their cardinalities are pinned; the feature rows must
    carry the per-kind columns and the stage rows must not."""
    from amazon_climate_data_etl_spark.sources.multimodal import (
        media_pipeline_profile,
    )

    a = media_pipeline_profile(spark, sf_dir).collect()
    b = media_pipeline_profile(spark, sf_dir).collect()
    assert a == b
    stages = [r.stage for r in a]
    assert stages == [
        "features:audio", "features:image", "features:video",
        "frames", "resize",
    ]
    rows = {r.stage: r for r in a}
    assert all(
        rows[s].avg_entropy is not None and rows[s].n_unique is not None
        for s in stages[:3]
    )
    assert all(
        rows[s].avg_entropy is None and rows[s].n_unique is None
        for s in ("frames", "resize")
    )
    # flatMap cardinality law: frames = sum(duration//step + 1) > items
    assert rows["frames"].n_rows > rows["frames"].n_items
    assert rows["resize"].n_rows == rows["resize"].n_items


def test_approx_quantiles_value_error_bound(spark, sf_dir):
    """HDR-histogram sketch guarantee (round 7 — the query is now fully
    DuckDB-oracled, this asserts its ACCURACY contract): each reported
    quantile is the lower bound of the 2^-6-relative-width bucket holding
    the true ceil(q·n)-th value, so est ≤ v* ≤ est·(1 + 2^-6) + 1 cent."""
    import math

    from amazon_climate_data_etl_spark.catalog import load_table
    from amazon_climate_data_etl_spark.operators.relational import (
        _HDR_PREC,
        approx_quantiles_sketch,
    )

    rows = approx_quantiles_sketch(spark, sf_dir).collect()
    assert rows, "no return flags"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).toPandas()
    rel = 2.0 ** -_HDR_PREC
    for r in rows:
        vals = sorted(li[li.l_returnflag == r.l_returnflag].l_extendedprice)
        n = len(vals)
        assert n == r.n_rows
        for q, got in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            v_true = vals[math.ceil(q * n) - 1]
            assert got <= v_true + 1e-9, (r.l_returnflag, q, got, v_true)
            assert v_true <= got * (1 + rel) + 0.01 + 1e-9, (
                r.l_returnflag, q, got, v_true,
            )
