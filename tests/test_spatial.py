"""Polygon zonal statistics: the ray-casting containment kernel and the
filter-and-refine join around it."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.operators.spatial import (
    point_in_polygon,
    point_in_polygon_sql,
    synthetic_polygons,
    zonal_stats_polygons,
)

# a concave "arrowhead" quadrilateral — concavity catches naive convex-only
# containment tests; no horizontal edges
_XS = [0.0, 2.0, 1.0, 2.0]
_YS = [0.1, 1.9, 0.9, -1.1]

# (px, py, inside) truth table, derived by hand: the concave notch at the
# right (around x≈1.6, y≈0.4) is OUTSIDE despite being inside the hull
_POINTS = [
    (0.5, 0.2, True),     # well inside the left wedge
    (1.0, 0.5, True),     # center body
    (1.8, 0.4, False),    # inside convex hull, inside the concave notch
    (-0.5, 0.0, False),   # left of everything
    (2.5, 0.0, False),    # right of everything
    (1.0, 1.5, False),    # above the upper edge
    (1.5, -0.5, True),    # lower lobe
]


def test_ray_cast_containment_spark(spark):
    pdf = pd.DataFrame(
        {"px": [p[0] for p in _POINTS], "py": [p[1] for p in _POINTS]}
    )
    df = (
        spark.createDataFrame(pdf)
        .withColumn("xs", F.array(*[F.lit(x) for x in _XS]))
        .withColumn("ys", F.array(*[F.lit(y) for y in _YS]))
        .withColumn(
            "inside",
            point_in_polygon(
                F.col("px"), F.col("py"), F.col("xs"), F.col("ys"), n_verts=4
            ),
        )
    )
    # order preservation on a tiny single-partition frame is fine here
    got = df.toPandas()["inside"].tolist()
    assert got == [p[2] for p in _POINTS]


def test_ray_cast_containment_duckdb_twin():
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {"px": [p[0] for p in _POINTS], "py": [p[1] for p in _POINTS]}
    )
    con.register("pts", pdf)
    xs = "[" + ", ".join(map(str, _XS)) + "]"
    ys = "[" + ", ".join(map(str, _YS)) + "]"
    expr = point_in_polygon_sql("px", "py", xs, ys, n_verts=4)
    got = [r[0] for r in con.execute(f"SELECT {expr} FROM pts").fetchall()]
    assert got == [p[2] for p in _POINTS]


def test_polygons_have_no_horizontal_edges(spark, sf_dir):
    """The guarded division in the ray cast relies on no polygon edge being
    horizontal; the synthetic pentagon generator must preserve that."""
    rows = synthetic_polygons(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        ys = list(r["ys"])
        for i in range(len(ys)):
            assert ys[i] != ys[(i + 1) % len(ys)]


def test_zonal_counts_bounded_by_bbox(spark, sf_dir):
    """Every contained cell must lie inside its polygon's bbox — i.e. the
    refine phase only ever discards, never adds."""
    out = zonal_stats_polygons(spark, sf_dir)
    polys = synthetic_polygons(spark, sf_dir).toPandas()
    got = out.toPandas().set_index("polygon_id")
    # bbox cell capacity on the 0.25-degree grid upper-bounds n_cells
    for pid, row in got.iterrows():
        p = polys[polys["polygon_id"] == pid].iloc[0]
        nx = int((p["xmax"] - p["xmin"]) / 0.25) + 2
        ny = int((p["ymax"] - p["ymin"]) / 0.25) + 2
        assert 0 < row["n_cells"] <= nx * ny
        assert row["val_min"] <= row["val_mean"] <= row["val_max"]
