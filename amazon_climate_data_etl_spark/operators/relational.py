"""Core relational operators (SURVEY.md §2.1–§2.8) as named queries.

Every reference dataflow operator — scans, IN/equality/range filters,
projections, hash aggregation with mixed agg dicts, count-distinct, min/max,
describe-style summaries, multi-key sorts, union-all, scalar functions
(compound math, date parts, rounding, substring, literal maps) — expressed
as stock DataFrame operations so Catalyst plans them (pushdown, pruning,
partial aggregation, broadcast selection; SURVEY.md §4).

Window functions and rollups are not in the reference (§2.5) but complete
the generic operator surface (§7 phase 4).

Reference citations per query are in the builder docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.catalog import load_table, rebalance_for_compute
from amazon_climate_data_etl_spark.operators._portable import (
    davg,
    davg_sql,
    dstddev,
    dstddev_sql,
    dsum,
    dsum_sql,
    stable_round,
    stable_round_sql,
)

# ---------------------------------------------------------------------------
# Aggregation spine: scan → filter → group → mixed aggs → round → sort.
# This is the reference's annual pipeline shape (A1/F2/F3/O1,
# process_climate_amazon_annual.py:345-357,500-506) on the lineitem fact.
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the engine's flagship query.

    Plan shape at scale: parquet scan with shipdate predicate pushed to
    row-group stats, 2-phase hash agg (map-side partial combine — the
    reference's manual per-municipality partials, A3, are automatic here),
    single shuffle on the 6-group key space, tiny result.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # exact decimal arithmetic from base columns: associative, so the sum is
    # order-independent and bit-identical across engines (_portable.py)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = price * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    charge = disc_price * (F.lit(1) + F.col("l_tax")).cast("decimal(8,4)")
    # the decimal partial-agg is the dominant per-row cost; spread an
    # under-split scan (single-row-group file) across cores first — no-op
    # on well-split 100 TB inputs (catalog.rebalance_for_compute)
    return (
        rebalance_for_compute(
            li.filter(F.col("l_shipdate") <= F.lit("2002-09-02")),
            # key chosen INSIDE q1's column set so the scan stays 7-column
            # pruned (test_q1_column_pruning); 2,500 distinct dates spread
            # 78x the partition count
            keys=("l_shipdate",),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            stable_round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            stable_round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
            stable_round(davg(F.col("l_quantity")), 2).alias("avg_qty"),
            stable_round(davg(F.col("l_extendedprice")), 2).alias("avg_price"),
            stable_round(davg(F.col("l_discount")), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))) AS DOUBLE), 2) AS sum_charge,
       round({davg_sql('l_quantity')}, 2) AS avg_qty,
       round({davg_sql('l_extendedprice')}, 2) AS avg_price,
       round({davg_sql('l_discount')}, 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2002-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def monthly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key calendar bucketing (A2/F2: monthly groupby,
    process_climate_amazon_monthly.py:312-327): orders revenue by (year, month)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        )
        .agg(
            stable_round(dsum(F.col("o_totalprice")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("year", "month")
    )


MONTHLY_AGG_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS year, CAST(month(o_orderdate) AS INT) AS month,
       round({dsum_sql('o_totalprice')}, 2) AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY 1, 2
ORDER BY year, month
"""


def rollup_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(year, month): the annual+monthly pipelines from ONE scan.

    The reference runs two full passes over the grids for annual vs monthly
    (two scripts); a rollup computes both granularities plus the grand total
    in a single shuffle (SURVEY.md §2.4 note, §7 phase 3).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            "o_totalprice",
        )
        .rollup("year", "month")
        .agg(
            stable_round(dsum(F.col("o_totalprice")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("year").asc_nulls_first(),
            F.col("month").asc_nulls_first(),
        )
    )


ROLLUP_SQL = f"""
SELECT year, month,
       round({dsum_sql('o_totalprice')}, 2) AS revenue,
       count(*) AS n_orders,
       GROUPING(year) * 2 + GROUPING(month) AS gid
FROM (SELECT CAST(year(o_orderdate) AS INT) AS year,
             CAST(month(o_orderdate) AS INT) AS month,
             o_totalprice
      FROM orders)
GROUP BY ROLLUP(year, month)
ORDER BY gid, year ASC NULLS FIRST, month ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Filters / projections (P1–P8) + scalar functions (F3–F6)
# ---------------------------------------------------------------------------


def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter (P1: the 7-state filter,
    process_climate_amazon_annual.py:155) + projection/reorder (P6)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
    )


FILTER_IN_SQL = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
ORDER BY c_custkey
"""


def filter_range_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive 2-D range predicate (P5: the lat/lon box clip,
    process_climate_amazon_annual.py:229-251) on events(value, ts).

    Both predicates reach the parquet scan as PushedFilters — the manual
    direction-aware slice logic in the reference is subsumed by pushdown.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("value").between(50.0, 150.0)
            & F.col("ts").between(F.lit("2024-01-05"), F.lit("2024-01-20"))
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


FILTER_BOX_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE value BETWEEN 50.0 AND 150.0
  AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
ORDER BY event_id
"""


def case_bucket_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function battery: substring on a cast key (F4), literal dict
    map (F5: the IBGE-prefix→UF map, process_climate_amazon_annual.py:146-152),
    CASE bucketing, rounding (F3)."""
    c = load_table(spark, sf_dir, "customer")
    seg_code = F.create_map(
        F.lit("BUILDING"), F.lit("B"),
        F.lit("MACHINERY"), F.lit("M"),
        F.lit("AUTOMOBILE"), F.lit("A"),
        F.lit("HOUSEHOLD"), F.lit("H"),
        F.lit("FURNITURE"), F.lit("F"),
    )
    return (
        c.select(
            "c_custkey",
            F.substring(F.col("c_custkey").cast("string"), 1, 2).alias("key_prefix"),
            seg_code[F.col("c_mktsegment")].alias("seg_code"),
            F.when(F.col("c_acctbal") < 0, F.lit("neg"))
            .when(F.col("c_acctbal") < 2500, F.lit("low"))
            .otherwise(F.lit("high"))
            .alias("bal_bucket"),
            stable_round(F.col("c_acctbal") / 1000.0, 2).alias("bal_k"),
        )
        .orderBy("c_custkey")
    )


CASE_BUCKET_SQL = """
SELECT c_custkey,
       substr(CAST(c_custkey AS VARCHAR), 1, 2) AS key_prefix,
       CASE c_mktsegment WHEN 'BUILDING' THEN 'B' WHEN 'MACHINERY' THEN 'M'
            WHEN 'AUTOMOBILE' THEN 'A' WHEN 'HOUSEHOLD' THEN 'H'
            WHEN 'FURNITURE' THEN 'F' END AS seg_code,
       CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 2500 THEN 'low'
            ELSE 'high' END AS bal_bucket,
       round(c_acctbal / 1000.0, 2) AS bal_k
FROM customer
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Simple aggregates / observability (A4–A7: the reference's end-of-run
# invariant prints, process_climate_amazon_annual.py:513-522)
# ---------------------------------------------------------------------------


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct + counts per group (A4/A6,
    split_by_state.py:64-71)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


DISTINCT_COUNTS_SQL = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def minmax_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max/count (A5/A6: year-range prints,
    process_climate_amazon_annual.py:513-515)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


MINMAX_SQL = """
SELECT min(l_shipdate) AS min_shipdate, max(l_shipdate) AS max_shipdate,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       count(*) AS n_rows
FROM lineitem
"""


def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-style summary (A7, process_climate_amazon_annual.py:522):
    count/mean/stddev/min/max per measure, as one row per measure.

    Quartiles are served by ``quantiles`` below; stddev uses the exact
    decimal-sum formulation for cross-engine determinism. The scan is
    projected to exactly the three measure columns BEFORE the keyed
    rebalance (r14): column pruning used to specialize each branch's
    subtree to its own 1-column scan, which made the three exchanges
    non-identical — three scans, three shuffles. Pinning the projection
    makes the exchange subtree identical across branches, so ReuseExchange
    now dedupes it: ONE scan + ONE (deterministic, keyed) shuffle feeds
    all three decimal-partial branches at full parallelism."""
    li = rebalance_for_compute(
        load_table(spark, sf_dir, "lineitem").select(
            "l_quantity", "l_extendedprice", "l_discount"
        ),
        keys=("l_quantity", "l_extendedprice", "l_discount"),
    )

    def stats(col: str):
        c = F.col(col)
        return [
            F.count(c).alias("count"),
            stable_round(davg(c), 2).alias("mean"),
            stable_round(dstddev(c), 2).alias("stddev"),
            stable_round(F.min(c), 2).alias("min"),
            stable_round(F.max(c), 2).alias("max"),
        ]

    rows = [
        li.agg(F.lit(col).alias("measure"), *stats(col))
        for col in ("l_quantity", "l_extendedprice", "l_discount")
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("measure")


SUMMARY_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{col}' AS measure, count({col}) AS count,
       round({davg_sql(col)}, 2) AS mean,
       round({dstddev_sql(col)}, 2) AS stddev,
       round(min({col}), 2) AS min, round(max({col}), 2) AS max
FROM lineitem"""
    for col in ("l_quantity", "l_extendedprice", "l_discount")
) + "\nORDER BY measure"


def quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (the quartile rows of describe(), A7). At 100 TB
    the scalable swap-in is approx_percentile; exact is used here because
    the oracle must match bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        stable_round(F.expr("percentile(l_quantity, 0.25)"), 2).alias("q25"),
        stable_round(F.expr("percentile(l_quantity, 0.5)"), 2).alias("q50"),
        stable_round(F.expr("percentile(l_quantity, 0.75)"), 2).alias("q75"),
    )


QUANTILES_SQL = """
SELECT round(quantile_cont(l_quantity, 0.25), 2) AS q25,
       round(quantile_cont(l_quantity, 0.5), 2) AS q50,
       round(quantile_cont(l_quantity, 0.75), 2) AS q75
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Sorts / top-k (O1/O2) and set ops (U1)
# ---------------------------------------------------------------------------


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tie-break. Spark plans this as
    TakeOrderedAndProject — per-partition top-k then a single-driver merge,
    no global sort shuffle; exactly what you want at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (O1: sort_values(['CD_MUN','year','month']),
    process_climate_amazon_monthly.py:458). Range-partitioned sort in Spark."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .filter(F.col("l_quantity") > 45)
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    )


MULTIKEY_SORT_SQL = """
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM lineitem
WHERE l_quantity > 45
ORDER BY l_shipdate, l_orderkey, l_linenumber
"""


def union_all_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all of heterogeneous filters (U1: pd.concat of per-municipality
    frames, process_climate_amazon_annual.py:491) — plus distinct projection."""
    p = load_table(spark, sf_dir, "part")
    cheap = p.filter(F.col("p_retailprice") < 950).select(
        "p_partkey", "p_brand", F.lit("cheap").alias("tier")
    )
    big = p.filter(F.col("p_size") >= 40).select(
        "p_partkey", "p_brand", F.lit("big").alias("tier")
    )
    return cheap.unionByName(big).distinct().orderBy("p_partkey", "tier")


UNION_SQL = """
SELECT DISTINCT * FROM (
  SELECT p_partkey, p_brand, 'cheap' AS tier FROM part WHERE p_retailprice < 950
  UNION ALL
  SELECT p_partkey, p_brand, 'big' AS tier FROM part WHERE p_size >= 40
)
ORDER BY p_partkey, tier
"""


# ---------------------------------------------------------------------------
# Window functions (SURVEY.md §2.5 — absent from the reference, required for
# the generic surface; the top-1-per-group form is also the general
# nearest-neighbor join fallback, §2 J-NN)
# ---------------------------------------------------------------------------


def window_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number() top-1-per-group: each customer's largest order."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    )


WINDOW_TOP1_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn = 1
ORDER BY o_custkey
"""


def window_frame_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window pair in ONE pass: lag() order-to-order revenue
    delta AND the rolling 3-order average (ROWS BETWEEN 2 PRECEDING) per
    customer. (Round-7 consolidation of ``window_lag_delta`` +
    ``window_rolling_avg`` — identical partition/order spec, so the two
    queries were one window exchange computed twice; merged they share a
    single shuffle on the customer key.)"""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(-2, 0)
    # exact decimal rolling sum / count for cross-engine determinism
    rolling_sum = (
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(wf).cast("double")
    )
    rolling_n = F.count(F.lit(1)).over(wf)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            stable_round(
                F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
            ).alias("delta_prev"),
            stable_round(rolling_sum / rolling_n, 2).alias("rolling_avg3"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


WINDOW_FRAME_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(o_totalprice - lag(o_totalprice) OVER w, 2) AS delta_prev,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER wf AS DOUBLE)
             / count(*) OVER wf, 2) AS rolling_avg3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def setop_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled set-op family over the same two sides (round-7 consolidation
    of ``intersect_custkeys`` + ``except_custkeys``): customers who placed
    BOTH an urgent and a finished order tagged ``both`` (INTERSECT), and
    urgent-order customers who never completed one tagged ``urgent_only``
    (EXCEPT — the relational complement of the P8 skip-and-report path).
    Completes the set-op family next to U1's union. Each branch lowers to
    a left-semi/anti hash join over deduplicated sides — one shuffle per
    side on the compared key; the branches are disjoint by construction so
    the union is append-only."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    both = urgent.intersect(finished).select(
        F.lit("both").alias("setop"), "o_custkey"
    )
    # subtract == EXCEPT DISTINCT (exceptAll is the bag-semantics variant)
    only = urgent.subtract(finished).select(
        F.lit("urgent_only").alias("setop"), "o_custkey"
    )
    return both.unionByName(only).orderBy("setop", "o_custkey")


SETOP_SQL = """
SELECT 'both' AS setop, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT 'urgent_only' AS setop, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
ORDER BY setop, o_custkey
"""


def left_join_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving unmatched build-side rows: every customer
    with their urgent-order count/spend, customers without urgent orders
    kept with zeros. The reference never needs outer joins (its J-NN lookup
    always matches a grid cell), but P8's skip-and-report semantics are the
    outer join's null path in disguise.

    Scale shape: aggregate orders FIRST (one shuffle on o_custkey with
    map-side partial combine), then join the small per-customer aggregate —
    never outer-join the raw fact and aggregate after, which would shuffle
    every order row through the join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            stable_round(dsum(F.col("o_totalprice")), 2).alias("spent"),
        )
    )
    return (
        c.join(per_cust, c["c_custkey"] == per_cust["o_custkey"], "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("cnt", F.lit(0)).alias("urgent_orders"),
            F.coalesce("spent", F.lit(0.0)).alias("urgent_spent"),
        )
        .orderBy("c_custkey")
    )


LEFT_JOIN_GAPS_SQL = f"""
SELECT c_custkey, c_mktsegment,
       coalesce(cnt, 0) AS urgent_orders,
       coalesce(spent, 0.0) AS urgent_spent
FROM customer LEFT JOIN (
  SELECT o_custkey, count(*) AS cnt,
         {stable_round_sql(dsum_sql('o_totalprice'), 2)} AS spent
  FROM orders WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
) ON c_custkey = o_custkey
ORDER BY c_custkey
"""


def full_outer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two per-customer aggregates (urgent vs finished
    order counts): rows survive from either side, missing side nulled to 0.
    Both inputs share their shuffle key, so after the two aggregations the
    join reuses the hash partitioning — one exchange per side total, and
    AQE can pick a shuffled-hash join since both sides are post-agg small."""
    o = load_table(spark, sf_dir, "orders")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("cust_u"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    finished = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("cust_f"))
        .agg(F.count(F.lit(1)).alias("n_finished"))
    )
    return (
        urgent.join(finished, urgent["cust_u"] == finished["cust_f"], "full_outer")
        .select(
            F.coalesce("cust_u", "cust_f").alias("o_custkey"),
            F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
            F.coalesce("n_finished", F.lit(0)).alias("n_finished"),
        )
        .orderBy("o_custkey")
    )


FULL_OUTER_SQL = """
SELECT coalesce(cust_u, cust_f) AS o_custkey,
       coalesce(n_urgent, 0) AS n_urgent,
       coalesce(n_finished, 0) AS n_finished
FROM (SELECT o_custkey AS cust_u, count(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1) u
FULL OUTER JOIN
     (SELECT o_custkey AS cust_f, count(*) AS n_finished
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) f
ON cust_u = cust_f
ORDER BY o_custkey
"""


def gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + fill-forward: daily revenue per priority on a
    dense calendar, missing days carried forward (the gap-filling /
    interpolation operator of a time-series engine; the reference's only
    calendar handling is its 2024 truncation, README.md:168).

    Plan: aggregate first (shuffle carries one row per (priority, day)),
    build the dense spine as sequence(min,max) exploded against the tiny
    dim, LEFT join aggregates onto the spine, then one fill-forward window
    per priority. The spine explode is map-side; at scale the window
    shuffles only the resampled series (days × dims), never raw orders."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderpriority", F.col("o_orderdate").alias("day")).agg(
        stable_round(dsum(F.col("o_totalprice")), 2).alias("rev")
    )
    span = o.agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    )
    spine = (
        o.select("o_orderpriority")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "o_orderpriority",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["o_orderpriority", "day"], "left")
        .select(
            "o_orderpriority",
            "day",
            F.col("rev").isNull().alias("is_filled"),
            F.coalesce(
                F.last("rev", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("rev_filled"),
        )
        .orderBy("o_orderpriority", "day")
    )


GAP_FILL_SQL = f"""
WITH daily AS (
  SELECT o_orderpriority, o_orderdate AS day,
         {stable_round_sql(dsum_sql('o_totalprice'), 2)} AS rev
  FROM orders GROUP BY 1, 2
),
span AS (SELECT min(o_orderdate) AS d0, max(o_orderdate) AS d1 FROM orders),
spine AS (
  SELECT p.o_orderpriority, CAST(gs.d AS DATE) AS day
  FROM (SELECT DISTINCT o_orderpriority FROM orders) p
  CROSS JOIN span
  CROSS JOIN LATERAL (SELECT unnest(generate_series(span.d0, span.d1, INTERVAL 1 DAY)) AS d) gs
)
SELECT s.o_orderpriority, s.day,
       (d.rev IS NULL) AS is_filled,
       coalesce(last_value(d.rev IGNORE NULLS) OVER (
           PARTITION BY s.o_orderpriority ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS rev_filled
FROM spine s LEFT JOIN daily d
  ON s.o_orderpriority = d.o_orderpriority AND s.day = d.day
ORDER BY s.o_orderpriority, s.day
"""


_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (the inverse of pivot_daily_activity, and the
    long-format half of the reference's J2 wide/long duality): lineitem's 4
    measure columns melt to (measure, value) rows, then aggregate per
    measure. ``unpivot`` is a map-only expand (Catalyst Expand node — no
    shuffle, no UDF); the only exchanges are the pre-Expand rebalance
    (fan-out parallelism for an under-split scan — no-op at 100 TB) and
    the 4-group aggregate."""
    li = rebalance_for_compute(
        # key inside the unpivot's pruned set (l_orderkey is projected away
        # by the final agg, so keying on it would widen the scan)
        load_table(spark, sf_dir, "lineitem"), keys=("l_extendedprice",)
    )
    long = li.unpivot(
        ids=["l_orderkey"],
        values=list(_UNPIVOT_MEASURES),
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            stable_round(dsum(F.col("value")), 2).alias("total"),
        )
        .orderBy("measure")
    )


UNPIVOT_SQL = f"""
SELECT measure, count(*) AS n_values,
       {stable_round_sql(dsum_sql('value'), 2)} AS total
FROM (
  {" UNION ALL ".join(f"SELECT l_orderkey, '{m}' AS measure, {m} AS value FROM lineitem" for m in _UNPIVOT_MEASURES)}
)
GROUP BY measure
ORDER BY measure
"""


def window_range_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-customer trailing-30-day order
    revenue. The frame is value-based (all orders within 30 days), not
    row-based — same-day peer rows aggregate together in both engines.
    Spark's rangeBetween needs a numeric sort key, so order time becomes
    days-since-epoch; at scale this is a single window shuffle on
    o_custkey, no self-join (the naive form is a range self-join that
    re-scans the fact per row)."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-30, 0)
    trailing = F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            stable_round(trailing, 2).alias("rev_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_RANGE_SQL = """
SELECT o_custkey, o_orderkey,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE), 2) AS rev_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, priority): all four grouping-set combinations of the
    orders roll — per cell, per status, per priority, grand total — in one
    shuffle (the expand is map-side; each row fans out 4× before the
    partial agg, not after)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderstatus", "o_orderpriority", "o_totalprice")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            stable_round(dsum(F.col("o_totalprice")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       round({dsum_sql('o_totalprice')}, 2) AS revenue,
       count(*) AS n_orders,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def salted_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-stage aggregation: lineitem grouped by
    l_returnflag — 3 distinct values over the whole fact, the canonical
    pathological skew key (every row of a 100 TB table lands on 3 reducers
    in the naive plan).

    Stage 1 salts the key with a deterministic hash of l_orderkey (64
    buckets) and computes partial sums per (key, salt) — map-side
    combinable, uniformly spread. Stage 2 re-aggregates the ≤ 3×64 partial
    rows. Decimal partials keep the two-stage sum bit-identical to the
    direct form, so the oracle is the PLAIN group-by: salting must be
    invisible in the result. (Spark's AQE skew handling covers joins, not
    aggregations — agg salting stays a hand pattern.)"""
    li = load_table(spark, sf_dir, "lineitem")
    salt = F.pmod(F.crc32(F.col("l_orderkey").cast("string")), F.lit(64))
    partial = (
        li.groupBy("l_returnflag", salt.alias("salt"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("p_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("p_price"),
            F.count(F.lit(1)).alias("p_n"),
        )
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("p_qty").cast("double").alias("sum_qty"),
            stable_round(
                F.sum("p_price").cast("double") / F.sum("p_n"), 2
            ).alias("avg_price"),
            F.sum("p_n").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


SALTED_AGG_SQL = f"""
SELECT l_returnflag,
       {dsum_sql('l_quantity')} AS sum_qty,
       round({davg_sql('l_extendedprice')}, 2) AS avg_price,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable variant of A4 (countDistinct, SURVEY.md §2.4): HyperLogLog++
    sketch via ``approx_count_distinct`` beside the exact count. At 100 TB
    the exact form shuffles every distinct key; the sketch is fixed-size
    per group and merges map-side. Registered WITHOUT a SQL oracle — HLL
    implementations differ across engines, so the driver records the
    rows-only check; the test suite bounds the sketch error vs exact."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        )
        .orderBy("event_type")
    )


# HDR-histogram quantile sketch precision: buckets are power-of-two
# octaves split into 2^_HDR_PREC sub-buckets, i.e. relative value width
# 2^-_HDR_PREC ≈ 1.6% — comparable to approx_percentile(accuracy=100)'s
# rank guarantee, but ORDER-INDEPENDENT (bucket counts merge additively).
_HDR_PREC = 6
_HDR_MAX_BIT = 50  # cents < 2^50 ≈ $11.3e12 per item — beyond any price


def _hdr_bucket_width_sql(cents: str) -> str:
    """CASE chain mapping an integer cents value to its bucket width
    2^(msb-PREC) — pure integer comparisons, bit-identical in Spark and
    DuckDB (the SAME SQL string runs in both engines)."""
    whens = "\n".join(
        f"  WHEN {cents} >= {1 << k} THEN {1 << (k - _HDR_PREC)}"
        for k in range(_HDR_MAX_BIT, _HDR_PREC, -1)
    )
    return f"(CASE\n{whens}\n  ELSE 1 END)"


def approx_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable variant of A7's percentiles (`quantiles`): a single-pass
    mergeable quantile sketch per return flag. At 100 TB exact percentiles
    materialize the full sorted column; a sketch is bounded-size per group
    and merges map-side.

    Round 7 replaced ``approx_percentile`` (Greenwald-Khanna) with an
    HDR-histogram sketch over exact integer cents: each value lands in a
    power-of-two octave split into 2^6 sub-buckets (bucket width ≤ 2^-6 of
    the value — pure integer arithmetic, no floats), and the quantile is
    the lower bound of the bucket where the cumulative count crosses
    ceil(q·n). GK's merge is ORDER-DEPENDENT (Spark's shuffle fetch order
    is not a contract — an exactness claim built on it would be flaky by
    construction), while histogram counts merge additively: any partition
    order, any merge tree, same bits. That upgrade turns the query from
    rows-only into a fully DuckDB-oracled one — the sketch state is
    |buckets| ≤ octaves·2^6 per group regardless of corpus size, the agg
    is map-side combined, and the guarantee is value-relative error
    ≤ 2^-6 at every quantile (asserted against the exact sorted data in
    tests/test_rows_only_queries.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    width = _hdr_bucket_width_sql("cents")
    b = li.selectExpr("l_returnflag", f"{cents} AS cents").selectExpr(
        "l_returnflag", f"cents - (cents % {width}) AS bucket_lo"
    )
    counts = b.groupBy("l_returnflag", "bucket_lo").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("bucket_lo")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = counts.select(
        "l_returnflag",
        "bucket_lo",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n_rows"),
    )

    def pick(q: float):
        target = F.ceil(F.lit(q) * F.col("n_rows").cast("double")).cast("long")
        return F.min(
            F.when(F.col("cum") >= target, F.col("bucket_lo"))
        ).cast("double") / F.lit(100.0)

    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.max("n_rows").alias("n_rows"),
            pick(0.5).alias("p50"),
            pick(0.9).alias("p90"),
            pick(0.99).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


APPROX_QUANTILES_SQL = f"""
WITH cents_t AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
),
b AS (
  SELECT l_returnflag,
         cents - (cents % {_hdr_bucket_width_sql('cents')}) AS bucket_lo
  FROM cents_t
),
counts AS (
  SELECT l_returnflag, bucket_lo, count(*) AS c
  FROM b GROUP BY l_returnflag, bucket_lo
),
cum AS (
  SELECT l_returnflag, bucket_lo,
         sum(c) OVER (PARTITION BY l_returnflag ORDER BY bucket_lo
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY l_returnflag) AS n_rows
  FROM counts
)
SELECT l_returnflag,
       CAST(max(n_rows) AS BIGINT) AS n_rows,
       CAST(min(CASE WHEN cum >= CAST(ceil(0.5 * CAST(n_rows AS DOUBLE)) AS BIGINT)
                     THEN bucket_lo END) AS DOUBLE) / 100.0 AS p50,
       CAST(min(CASE WHEN cum >= CAST(ceil(0.9 * CAST(n_rows AS DOUBLE)) AS BIGINT)
                     THEN bucket_lo END) AS DOUBLE) / 100.0 AS p90,
       CAST(min(CASE WHEN cum >= CAST(ceil(0.99 * CAST(n_rows AS DOUBLE)) AS BIGINT)
                     THEN bucket_lo END) AS DOUBLE) / 100.0 AS p99
FROM cum
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped forecast revenue: the purest pushdown query — every
    predicate (date range, discount band, quantity cap) reaches the
    parquet row-group stats, the scan reads 4 columns, and the whole plan
    is one map + one single-row partial→final agg. At 100 TB this is the
    query where scan pruning IS the runtime."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(8,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_round(F.sum(revenue).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q6_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 24
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo-revenue share: one month of lineitem joined
    to the part dimension (broadcast — the fact stream never shuffles),
    conditional revenue ratio. Both sums come out of ONE agg over the
    joined stream; the ratio is a single deterministic double division
    over exact-decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,4)")
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    share = (
        F.lit(100.0)
        * F.col("promo_rev").cast("double")
        / F.col("total_rev").cast("double")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01"))
            & (F.col("l_shipdate") < F.lit("1997-10-01"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).alias("promo_rev"),
            F.sum(revenue).alias("total_rev"),
        )
        .select(
            stable_round(share, 4).alias("promo_share_pct"),
            stable_round(F.col("promo_rev").cast("double"), 2).alias("promo_rev"),
            stable_round(F.col("total_rev").cast("double"), 2).alias("total_rev"),
        )
    )


Q14_SQL = """
WITH j AS (
  SELECT CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l_discount AS DECIMAL(8,4)) AS revenue,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
),
agg AS (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN revenue
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_rev,
         sum(revenue) AS total_rev
  FROM j
)
SELECT round(100.0 * CAST(promo_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 4)
         AS promo_share_pct,
       round(CAST(promo_rev AS DOUBLE), 2) AS promo_rev,
       round(CAST(total_rev AS DOUBLE), 2) AS total_rev
FROM agg
"""


_AUDIT_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def table_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the fact table's numeric measures — the
    expectations/constraint-audit primitive (null counts, exact distinct
    cardinalities, value ranges) every production pipeline runs before
    trusting a load (Deequ/Great-Expectations shape).

    Shape: ONE aggregation pass produces every metric — Spark plans the
    multiple exact count-distincts as a single Expand (row fan-out is
    |audited columns|, map-side combined before the one shuffle), and the
    wide single-row result unpivots to per-column rows with a map-only
    stack. No per-column scans: at 100 TB the table is read once however
    many columns are audited. Exact distincts are the point (the audit
    gates a load); the sketch-based profile for dashboards is
    ``approx_distinct_users``'s HLL shape. No pre-agg rebalance: the
    count-distinct Expand's first aggregation already hash-partitions on
    the distinct keys, so an extra fan-out shuffle measured as pure loss
    (cf. the q10 note in joins.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    aggs = [n.alias("n_rows")]
    for c in _AUDIT_COLS:
        aggs += [
            (n - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _AUDIT_COLS
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(_AUDIT_COLS)}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_val, max_val)"
        ),
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"
    ).orderBy("column_name")


_AUDIT_SQL_ARMS = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS DOUBLE) AS min_val,
       CAST(max({c}) AS DOUBLE) AS max_val
FROM lineitem"""
    for c in _AUDIT_COLS
)

TABLE_AUDIT_SQL = f"""
SELECT * FROM ({_AUDIT_SQL_ARMS})
ORDER BY column_name
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive-predicate revenue: OR-of-ANDs mixing
    columns from BOTH join sides — the optimizer pattern none of the other
    queries exercise. Catalyst extracts the per-table implications of the
    disjunction (p_size ∈ [1,50] and the brand/type union reach the part
    scan; l_quantity ∈ [1,30] reaches the lineitem scan) so both scans
    prune BEFORE the broadcast join, and the full disjunction evaluates as
    the join's residual condition — at 100 TB the difference between
    scanning three narrow slices and scanning everything."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,4)")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(16, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(31, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            stable_round(F.sum(revenue).cast("double"), 2).alias("revenue"),
        )
    )


Q19_SQL = """
SELECT count(*) AS n_items,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 16 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_type = 'PROMO' AND p_size BETWEEN 31 AND 50
       AND l_quantity BETWEEN 20 AND 30)
"""


def q22_lapsed_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped lapsed-customer report: a scalar-subquery
    threshold (broadcast 1-row cross join — the relational form of a
    driver-side constant, computed in-plan) composed with an anti-join
    (customers with no RECENT order) and a substring-derived grouping key.

    Scale: the scalar aggregate is one partial→final pass over customer;
    its single row broadcasts into the filter, so the threshold comparison
    is a map. The anti-join's build side (distinct custkeys of recent
    orders) broadcasts at fixture scale; at 100 TB it would flip to a
    custkey-partitioned shuffle anti-join — both correct, AQE picks."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pos_avg = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("1999-01-01")).select(
        "o_custkey"
    )
    return (
        c.crossJoin(F.broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            F.broadcast(recent),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.substring("c_name", 17, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            stable_round(dsum(F.col("c_acctbal")), 2).alias("total_bal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = f"""
WITH pos_avg AS (
  SELECT {davg_sql('c_acctbal')} AS avg_bal FROM customer WHERE c_acctbal > 0.0
)
SELECT substr(c_name, 17, 2) AS cntrycode,
       count(*) AS n_custs,
       round({dsum_sql('c_acctbal')}, 2) AS total_bal
FROM customer, pos_avg
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY cntrycode
ORDER BY cntrycode
"""




def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped order-priority checking: orders from one quarter
    that had at least one LATE shipment (the testdata carries no
    commit/receipt dates, so "late" is l_shipdate more than 60 days after
    the order date — the same EXISTS semantics on available columns),
    counted per priority.

    Shape: the Q4 classic — a LEFT SEMI join (EXISTS, no fan-out however
    many lineitems match) on the orderkey with the extra non-equi late
    predicate, then a tiny priority-keyed agg. The date filter reaches
    the orders scan; at 100 TB the semi-join shuffles on the uniform
    orderkey and the agg output is 5 rows."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped customer distribution: how many customers placed
    how many (non-urgent) orders — including the zero-order customers the
    LEFT OUTER join exists to keep (the original excludes special-request
    comments; the testdata carries no o_comment, so urgent orders stand
    in as the exclusion).

    Shape: left outer join on custkey (uniform key), count per customer,
    then the tiny distribution agg. The first agg is the only real
    shuffle; the second runs on |distinct counts| rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: revenue per supplier over one
    quarter, return the supplier(s) achieving the maximum (the view +
    scalar-subquery shape). Revenue aggregates through exact decimals, so
    the max-equality selection is bit-deterministic cross-engine — the
    trap in Q15 is float ties, and the decimal path removes it.

    Shape: one suppkey agg (map-side combined), a 1-row max broadcast
    back, and a broadcast supplier-dim join for the name."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,4)")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(revenue).alias("total_revenue"))
    mx = per_supp.agg(F.max("total_revenue").alias("mx"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            stable_round(F.col("total_revenue").cast("double"), 2).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(8,4))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       round(CAST(total_revenue AS DOUBLE), 2) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped small-quantity-order revenue: for one brand,
    revenue lost if orders below 20% of the part's average quantity were
    not taken. The correlated scalar subquery (per-part avg) becomes a
    partkey-keyed aggregate joined back to the fact.

    Portability note: the 20%-of-average threshold is evaluated as
    ``qty * cnt * 5 < sum_qty`` over exact decimals — algebraically
    identical, but free of the float-division near-ties that flip row
    membership between engines. Shape: the brand-filtered part dim
    broadcasts into the fact; the per-part avg shuffles on the uniform
    partkey; one global sum."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    fact = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    qty = F.col("l_quantity").cast("decimal(12,2)")
    per_part = fact.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    small = fact.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("pk")
    ).filter(qty * F.col("cnt") * F.lit(5) < F.col("sum_qty"))
    avg_yearly = F.col("total_price").cast("double") / F.lit(7.0)
    return small.agg(
        F.count(F.lit(1)).alias("n_small_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("total_price"),
    ).select(
        "n_small_items",
        stable_round(avg_yearly, 2).alias("avg_yearly"),
    )


Q17_SQL = """
WITH fact AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#4'
),
per_part AS (
  SELECT l_partkey AS pk,
         sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
         count(*) AS cnt
  FROM fact GROUP BY l_partkey
),
small AS (
  SELECT l_extendedprice
  FROM fact JOIN per_part ON l_partkey = pk
  WHERE CAST(l_quantity AS DECIMAL(12,2)) * cnt * 5 < sum_qty
)
SELECT count(*) AS n_small_items,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly
FROM small
"""


def q21_blocking_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped blocking-supplier analysis: in multi-supplier
    orders, which suppliers shipped LAST (held the order open)? The
    original's EXISTS/NOT-EXISTS pair over receipt dates becomes, on the
    available columns: per order, the distinct-supplier count and the max
    ship date; suppliers whose line hit that max in a ≥2-supplier order
    get a blocking mark; top 20 by count.

    Shape: one orderkey agg (distinct-supplier count via two-phase
    count-distinct + max), joined back to the fact on the uniform
    orderkey, per-supplier count, broadcast supplier-dim join, TakeOrdered
    top-k. Timestamp equality is exact — no float surface anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.max("l_shipdate").alias("max_ship"),
    )
    blocking = (
        li.join(F.broadcast(per_order), F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("n_supp") >= 2) & (F.col("l_shipdate") == F.col("max_ship")))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blocking.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey AS ok,
         count(DISTINCT l_suppkey) AS n_supp,
         max(l_shipdate) AS max_ship
  FROM lineitem GROUP BY l_orderkey
),
blocking AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN per_order ON l_orderkey = ok
  WHERE n_supp >= 2 AND l_shipdate = max_ship
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM blocking JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped shipping-priority audit: among lines shipped LATE
    (more than 60 days after order date) in one year, how many belonged
    to critical-priority orders vs the rest, per line status. The
    testdata carries no l_shipmode, so l_linestatus plays the grouping
    role; the SHAPE — orderkey equi-join with a non-equi lateness
    predicate, then a two-way CASE-gated count pair per group — is Q12's.

    Integer counters end-to-end; the date filter reaches the lineitem
    scan and the join shuffles both sides on the uniform orderkey."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped part/supplier relationship count: how many
    distinct suppliers have shipped each (brand, type, size) part class,
    excluding suppliers on the complaint list. The testdata carries no
    partsupp table, so the observed (partkey, suppkey) pairs in lineitem
    play its role, and the complaint list is suppliers with a NEGATIVE
    account balance (the original's LIKE '%Complaints%' comment filter);
    the SHAPE — distinct pair projection, NOT-IN anti-join on the
    supplier key, dim join, count-distinct per class, count-desc order —
    is Q16's.

    The anti-join side is a handful of rows and broadcasts; the pair
    distinct and the class agg are the two fact exchanges."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "BRAND_0")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    good = pairs.join(
        F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti"
    )
    return (
        good.join(F.broadcast(p), good.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'BRAND_0'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def window_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional ranking windows: percent_rank, cume_dist, and
    ntile(4) of each customer's balance within their market segment —
    the full rank-function family (row_number appears in the decile-edge
    thinning below) in ONE window pass. Merged r7 from the former
    ``window_cume_dist`` + ``window_ntile_quartiles`` pair (registry
    headroom, same consolidation wave as ``window_frame_profile``): all
    three functions share one window spec, so the merge costs nothing —
    they ride the same sort within the same exchange.

    percent_rank/cume_dist are exact rational values (rank arithmetic
    over counts); computed as doubles they are single divisions of exact
    integers — deterministic cross-engine; ntile is pure integer bucket
    arithmetic. One window shuffle on the segment key + output sort;
    returns one decile-edge row per segment per decile bucket to keep
    the gated output small and stable."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    scored = c.select(
        "c_mktsegment",
        "c_custkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    )
    # decile edges: the first customer at or past each 10% cume_dist step
    bucket = F.ceil(F.col("cd") * 10).cast("int")
    w2 = Window.partitionBy("c_mktsegment", "decile").orderBy(
        F.col("cd"), F.col("c_custkey")
    )
    return (
        scored.withColumn("decile", bucket)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            F.col("c_mktsegment").alias("segment"),
            "decile",
            "c_custkey",
            stable_round(F.col("pr"), 8).alias("percent_rank"),
            stable_round(F.col("cd"), 8).alias("cume_dist"),
            "quartile",
        )
        .orderBy("segment", "decile")
    )


WINDOW_RANK_SQL = """
WITH scored AS (
  SELECT c_mktsegment, c_custkey,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd,
         ntile(4) OVER w AS quartile
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
),
bucketed AS (
  SELECT c_mktsegment, c_custkey, pr, cd, quartile,
         CAST(ceil(cd * 10) AS INT) AS decile,
         row_number() OVER (PARTITION BY c_mktsegment, CAST(ceil(cd * 10) AS INT)
                            ORDER BY cd, c_custkey) AS rn
  FROM scored
)
SELECT c_mktsegment AS segment, decile, c_custkey,
       round(pr, 8) AS percent_rank,
       round(cd, 8) AS cume_dist,
       quartile
FROM bucketed WHERE rn = 1
ORDER BY segment, decile
"""


QUERIES = {
    "window_rank_profile": window_rank_profile,
    "q1_pricing_summary": q1_pricing_summary,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "table_quality_audit": table_quality_audit,
    "approx_distinct_users": approx_distinct_users,
    "approx_quantiles_sketch": approx_quantiles_sketch,
    "monthly_agg": monthly_agg,
    "rollup_year_month": rollup_year_month,
    "filter_in_list": filter_in_list,
    "filter_range_box": filter_range_box,
    "case_bucket_map": case_bucket_map,
    "distinct_counts": distinct_counts,
    "minmax_range": minmax_range,
    "summary_stats": summary_stats,
    "quantiles": quantiles,
    "topk_orders": topk_orders,
    "multikey_sort": multikey_sort,
    "union_all_parts": union_all_parts,
    "window_top1_per_group": window_top1_per_group,
    "window_frame_profile": window_frame_profile,
    "window_range_30d": window_range_30d,
    "cube_status_priority": cube_status_priority,
    "salted_group_agg": salted_group_agg,
    "setop_custkeys": setop_custkeys,
    "left_join_order_gaps": left_join_order_gaps,
    "full_outer_order_profile": full_outer_order_profile,
    "unpivot_lineitem_measures": unpivot_lineitem_measures,
    "gap_fill_daily_revenue": gap_fill_daily_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q4_priority_late_ship": q4_priority_late_ship,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q21_blocking_supplier": q21_blocking_supplier,
    "q22_lapsed_balances": q22_lapsed_balances,
    "q12_priority_by_linestatus": q12_priority_by_linestatus,
    "q16_supplier_part_counts": q16_supplier_part_counts,
}

ORACLE = {
    "approx_quantiles_sketch": APPROX_QUANTILES_SQL,
    "window_rank_profile": WINDOW_RANK_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q14_promo_revenue": Q14_SQL,
    "table_quality_audit": TABLE_AUDIT_SQL,
    "monthly_agg": MONTHLY_AGG_SQL,
    "rollup_year_month": ROLLUP_SQL,
    "filter_in_list": FILTER_IN_SQL,
    "filter_range_box": FILTER_BOX_SQL,
    "case_bucket_map": CASE_BUCKET_SQL,
    "distinct_counts": DISTINCT_COUNTS_SQL,
    "minmax_range": MINMAX_SQL,
    "summary_stats": SUMMARY_SQL,
    "quantiles": QUANTILES_SQL,
    "topk_orders": TOPK_SQL,
    "multikey_sort": MULTIKEY_SORT_SQL,
    "union_all_parts": UNION_SQL,
    "window_top1_per_group": WINDOW_TOP1_SQL,
    "window_frame_profile": WINDOW_FRAME_SQL,
    "window_range_30d": WINDOW_RANGE_SQL,
    "cube_status_priority": CUBE_SQL,
    "salted_group_agg": SALTED_AGG_SQL,
    "setop_custkeys": SETOP_SQL,
    "left_join_order_gaps": LEFT_JOIN_GAPS_SQL,
    "full_outer_order_profile": FULL_OUTER_SQL,
    "unpivot_lineitem_measures": UNPIVOT_SQL,
    "gap_fill_daily_revenue": GAP_FILL_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q4_priority_late_ship": Q4_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q21_blocking_supplier": Q21_SQL,
    "q12_priority_by_linestatus": Q12_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q22_lapsed_balances": Q22_SQL,
}
