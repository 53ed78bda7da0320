"""Polygon-accurate zonal statistics — the filter-and-refine spatial join.

The reference reduces municipality polygons to centroids and extracts the
nearest grid cell (process_climate_amazon_annual.py:163-167, 256-276);
SURVEY §1.2 scoped polygon zonal stats out as "needs Sedona". It does not:
the classic two-phase spatial join is expressible in pure Spark SQL —

1. **filter**: grid cells join the (broadcast) polygon table on a
   bounding-box range predicate — a BroadcastNestedLoopJoin, i.e. a pure
   map over the cell stream, no shuffle;
2. **refine**: surviving (cell, polygon) candidates run an exact
   even-odd ray-casting point-in-polygon test, written as an `aggregate`
   over the polygon's vertex arrays so it runs JVM-side inside codegen;
3. per-polygon aggregation of the contained cells' values.

At 100 TB of grid the shape holds: polygons are a broadcast dimension
(vertex arrays of a whole country's municipalities are a few MB), the fact
stream is mapped once, and the only shuffle is the final polygon-keyed
aggregate. A large×large polygon workload would bucketize both sides to a
grid-cell key first (the same candidates→verify pattern as grid_snap_join
and the LSH dedup family).

Cross-engine determinism: the ray-cast uses only +,-,*,/ and comparisons on
doubles — IEEE-identical in Spark and DuckDB when the expression trees
match, which the SQL twin mirrors term for term. The synthetic polygons are
pentagons (no horizontal edges, so the guarded division never sees a zero
denominator; vertices offset from the 0.25° grid so no cell sits exactly on
an edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.catalog import load_table
from amazon_climate_data_etl_spark.operators._portable import (
    davg_sql,
    stable_round,
)

N_VERTS = 5
# unit pentagon, counterclockwise; consecutive y's all distinct (no
# horizontal edges) and no vertex on the axes
_PENTAGON = ((0.93, 0.11), (0.31, 0.87), (-0.72, 0.53), (-0.81, -0.46), (0.23, -0.94))


def point_in_polygon(px, py, xs, ys, n_verts: int = N_VERTS):
    """Even-odd ray-casting containment test as a pure Column expression.

    Counts edges crossed by the horizontal ray from (px, py) to +inf; odd
    count = inside. The division is guarded by the crossing test (an edge
    with yi == yj never satisfies it), evaluated lazily by CASE in both
    engines."""

    def crossing(acc, i):
        j = (i % F.lit(n_verts)) + 1
        xi, yi = F.element_at(xs, i), F.element_at(ys, i)
        xj, yj = F.element_at(xs, j), F.element_at(ys, j)
        cross = (yi > py) != (yj > py)
        left = px < (xj - xi) * (py - yi) / (yj - yi) + xi
        return acc + F.when(cross, F.when(left, F.lit(1)).otherwise(F.lit(0))).otherwise(
            F.lit(0)
        )

    total = F.aggregate(F.sequence(F.lit(1), F.lit(n_verts)), F.lit(0), crossing)
    return total % 2 == 1


def point_in_polygon_sql(px: str, py: str, xs: str, ys: str, n_verts: int = N_VERTS) -> str:
    """DuckDB twin of ``point_in_polygon`` — identical arithmetic tree."""
    return (
        f"(list_sum(list_transform(range(1, {n_verts + 1}), i -> "
        f"CASE WHEN ({ys}[i] > {py}) <> ({ys}[(i % {n_verts}) + 1] > {py}) THEN "
        f"(CASE WHEN {px} < ({xs}[(i % {n_verts}) + 1] - {xs}[i]) * ({py} - {ys}[i]) "
        f"/ ({ys}[(i % {n_verts}) + 1] - {ys}[i]) + {xs}[i] THEN 1 ELSE 0 END) "
        f"ELSE 0 END)) % 2 = 1)"
    )


def synthetic_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic polygon dimension derived from ``nation``: one scaled,
    offset pentagon per nation over the same lat/lon domain the synthetic
    climate grid covers. Carries precomputed bbox columns for the filter
    phase (what a real polygon table stores alongside geometry)."""
    n = load_table(spark, sf_dir, "nation")
    s = F.lit(0.5) + (F.col("n_nationkey") % 3).cast("double") * F.lit(0.25)
    cx = (
        F.lit(-65.0)
        + (F.col("n_nationkey") * 4 % 21).cast("double") * F.lit(0.25)
        - F.lit(0.09)
    )
    cy = (
        F.lit(-10.0)
        + (F.col("n_nationkey") % 21).cast("double") * F.lit(0.25)
        + F.lit(0.07)
    )
    xs = F.array(*[cx + F.lit(dx) * s for dx, _ in _PENTAGON])
    ys = F.array(*[cy + F.lit(dy) * s for _, dy in _PENTAGON])
    return n.select(
        F.col("n_nationkey").alias("polygon_id"),
        F.col("n_name").alias("name"),
        xs.alias("xs"),
        ys.alias("ys"),
        F.array_min(xs).alias("xmin"),
        F.array_max(xs).alias("xmax"),
        F.array_min(ys).alias("ymin"),
        F.array_max(ys).alias("ymax"),
    )


def _grid_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell aggregated grid (the zonal-stats input): the same 0.25°
    synthetic domain the climate family derives from lineitem, reduced to
    one row per cell with a decimal-exact mean value."""
    li = load_table(spark, sf_dir, "lineitem")
    lat = (F.col("l_partkey") % 21).cast("double") * F.lit(0.25) - F.lit(10.0)
    lon = (F.col("l_suppkey") % 21).cast("double") * F.lit(0.25) - F.lit(65.0)
    val = F.lit(28.0) + (F.col("l_orderkey") % 80).cast("double") / F.lit(10.0)
    return (
        li.select(lat.alias("lat"), lon.alias("lon"), val.alias("val"))
        .groupBy("lat", "lon")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(18,4)")).cast("double")
                / F.count("val")
            ).alias("val")
        )
    )


def zonal_stats_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon-accurate zonal statistics over the synthetic grid.

    filter (bbox broadcast NL join) → refine (ray-cast containment) →
    per-polygon aggregate. Cells inside several overlapping polygons count
    toward each — the standard zonal-stats contract."""
    cells = _grid_cells(spark, sf_dir)
    polys = synthetic_polygons(spark, sf_dir)
    px, py = F.col("lon"), F.col("lat")
    cand = cells.join(
        F.broadcast(polys),
        (px >= F.col("xmin"))
        & (px <= F.col("xmax"))
        & (py >= F.col("ymin"))
        & (py <= F.col("ymax")),
    )
    hit = cand.filter(point_in_polygon(px, py, F.col("xs"), F.col("ys")))
    return (
        hit.groupBy("polygon_id", "name")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            stable_round(
                F.sum(F.col("val").cast("decimal(24,8)")).cast("double")
                / F.count("val"),
                2,
            ).alias("val_mean"),
            stable_round(F.min("val"), 2).alias("val_min"),
            stable_round(F.max("val"), 2).alias("val_max"),
        )
        .orderBy("polygon_id")
    )


_POLY_SQL = f"""
  SELECT n_nationkey AS polygon_id, n_name AS name,
         [{", ".join(f"(-65.0 + CAST(n_nationkey * 4 % 21 AS DOUBLE) * 0.25 - 0.09) + {dx} * (0.5 + CAST(n_nationkey % 3 AS DOUBLE) * 0.25)" for dx, _ in _PENTAGON)}] AS xs,
         [{", ".join(f"(-10.0 + CAST(n_nationkey % 21 AS DOUBLE) * 0.25 + 0.07) + {dy} * (0.5 + CAST(n_nationkey % 3 AS DOUBLE) * 0.25)" for _, dy in _PENTAGON)}] AS ys
  FROM nation
"""

_CELLS_SQL = f"""
  SELECT lat, lon, {davg_sql('val')} AS val
  FROM (
    SELECT CAST(l_partkey % 21 AS DOUBLE) * 0.25 - 10.0 AS lat,
           CAST(l_suppkey % 21 AS DOUBLE) * 0.25 - 65.0 AS lon,
           28.0 + CAST(l_orderkey % 80 AS DOUBLE) / 10.0 AS val
    FROM lineitem
  )
  GROUP BY lat, lon
"""

ZONAL_STATS_SQL = f"""
WITH polys AS ({_POLY_SQL}),
bboxed AS (
  SELECT polygon_id, name, xs, ys,
         list_min(xs) AS xmin, list_max(xs) AS xmax,
         list_min(ys) AS ymin, list_max(ys) AS ymax
  FROM polys
),
cells AS ({_CELLS_SQL}),
hit AS (
  SELECT p.polygon_id, p.name, c.val
  FROM cells c JOIN bboxed p
    ON c.lon >= p.xmin AND c.lon <= p.xmax
   AND c.lat >= p.ymin AND c.lat <= p.ymax
  WHERE {point_in_polygon_sql('c.lon', 'c.lat', 'xs', 'ys')}
)
SELECT polygon_id, name, count(*) AS n_cells,
       round(CAST(sum(CAST(val AS DECIMAL(24,8))) AS DOUBLE) / count(val), 2) AS val_mean,
       round(min(val), 2) AS val_min,
       round(max(val), 2) AS val_max
FROM hit
GROUP BY polygon_id, name
ORDER BY polygon_id
"""


QUERIES = {
    "zonal_stats_polygons": zonal_stats_polygons,
}

ORACLE = {
    "zonal_stats_polygons": ZONAL_STATS_SQL,
}
