"""Checks for the queries registered WITHOUT a DuckDB oracle (rows-only at
the driver): they still get semantic assertions here, just not SQL twins."""

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
