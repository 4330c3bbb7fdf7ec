"""Relational query corpus Q01–Q28 (SURVEY.md §2.4), Spark-first.

Every query is expressed with the DataFrame API (never RDDs, never
Python UDFs) so Catalyst owns pushdown/pruning/join-planning, and has
a DuckDB oracle with identical column names and types:

- DuckDB SUM(integer) yields HUGEINT and LENGTH yields BIGINT — the
  oracles CAST to match Spark's output types.
- Double aggregates are ROUNDed on both sides (2 or 6 decimals per
  the declared corpus) so last-ulp accumulation-order differences
  can't flip the hash.
- Rank/row_number outputs are INT on both sides.
- Timestamps: session TZ is UTC (session.py) and DuckDB is naive, so
  values serialize identically.

Scale notes are inline per query: what shuffles, what broadcasts,
what is pushed down. The reference's own operators P1-P6/M1-M4 map
onto Q01-Q04 and Q24 (citations inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from archetype_spark.tables import load


def round_like_duckdb(col: F.Column, scale: int) -> F.Column:
    """ROUND(double, s) with DuckDB's semantics: half-away-from-zero on
    the scaled double (std::round(x*10^s)/10^s). Spark's F.round instead
    rounds the shortest decimal rendering of the double (BigDecimal
    HALF_UP), which disagrees at half-way boundaries — e.g.
    19570.815 * 100 = 1957081.49999… rounds down here, up in F.round.
    Mirroring the oracle exactly keeps per-row ROUND hash-stable.
    Same-cost codegen arithmetic: no UDF, stays whole-stage."""
    p = F.lit(float(10**scale))
    return F.floor(F.abs(col) * p + F.lit(0.5)) / p * F.when(col < 0, -1.0).otherwise(
        1.0
    )


# --------------------------------------------------------------- scans/filters
def q01_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan+filter+project (reference P1-P4/S1: querier.py:32-33,
    store.py:211-213). Filter and 3-column projection both reach the
    parquet scan (PushedFilters + ReadSchema) — no shuffle at all."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


def q02_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership (reference P1: querier.py:32 is_in)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


def q03_compound_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate with date range + BETWEEN (reference P3:
    store.py:242-244 string predicates). All four conjuncts push down."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


def q04_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized arithmetic projection — the MovementProcessor pattern
    (reference P4: tests/test_toy.py:16-21 with_columns). Pure
    whole-stage-codegen map work, shuffle-free."""
    li = load(spark, sf_dir, "lineitem")
    charge = round_like_duckdb(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
    ).alias("charge")
    return li.select("l_orderkey", "l_linenumber", charge).orderBy(
        "l_orderkey", "l_linenumber"
    )


# ---------------------------------------------------------------------- joins
def q05_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join. customer is the small side — broadcast it so the
    orders scan never shuffles; at 100 TB orders stays partition-local."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


def q06_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-way join. region/nation/customer are dims:
    broadcast them all so the only shuffle is the final groupBy on
    n_name (25 groups). The r_name filter is applied before the
    broadcast so the build side is minimal."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dim), o.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def q07_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + COUNT(col) null semantics: customers with no
    orders count 0."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
        .orderBy("c_custkey")
    )


def q08_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join; the filtered orders side is the probe.
    Semi joins never duplicate rows — cheaper than inner+distinct."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def q09_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def q10_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny dims (5 x 25 rows) — broadcast NLJ."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n)).orderBy("r_name", "n_name")


# --------------------------------------------------------------- aggregations
def q11_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate — partial (map-side) agg then a single-row final
    agg; the shuffle moves one row per partition."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


def q12_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (the flagship): pushed-down date filter, hash
    aggregate with map-side combine over ~6 groups — the shuffle is a
    few rows per partition regardless of input scale."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q13_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Spark expands to a two-stage aggregate
    (distinct on (status, custkey) then count); no driver collect."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("unique_customers"))
        .orderBy("o_orderstatus")
    )


def q14_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = filter over the aggregate output."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
        .orderBy("o_custkey")
    )


def q15_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set family — native Expand operator, one pass."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def q16_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + LIMIT — Catalyst fuses to TakeOrderedAndProject: each
    partition keeps its local top-10, driver merges 10 x partitions
    rows. No global sort ever materializes."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# ----------------------------------------------------------- scalar functions
def q17_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (reference delegates these to Daft's
    .str.* namespace, SURVEY §2.2)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").like("%0001%"))
        .select(
            "c_custkey",
            F.upper("c_name").alias("up"),
            F.length("c_name").alias("len"),
            F.substring("c_name", 1, 8).alias("pre"),
            F.replace(F.col("c_mktsegment"), F.lit("MACHINERY"), F.lit("MACH")).alias("seg"),
        )
        .orderBy("c_custkey")
    )


def q18_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mstart"),
    ).orderBy("o_orderkey")


def q19_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family. Spark CEIL/FLOOR return BIGINT; oracle
    casts to match."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("d"),
        F.ceil("l_quantity").alias("cq"),
        F.floor("l_extendedprice").alias("fp"),
        (F.col("l_quantity").cast("int") % 7).alias("m7"),
    ).orderBy("l_orderkey", "l_linenumber")


def q20_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF (reference P2 boolean logic generalized)."""
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket")
    )
    status2 = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
        "status2"
    )
    return o.select("o_orderkey", bucket, status2).orderBy("o_orderkey")


# -------------------------------------------------------------------- windows
def q21_ranking_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows. One shuffle on o_custkey serves both window
    specs (same partition key)."""
    o = load(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_rk = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_rn).alias("rn"),
        F.rank().over(w_rk).alias("rnk"),
    ).orderBy("o_custkey", "o_orderkey")


def q22_lag_lead_runsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows (lag/lead) + running-sum frame over the events
    table. Both specs share the (user_id | ts, event_id) partitioning,
    so Catalyst plans ONE shuffle + sort serving all three window
    functions — merging the former q22/q23 costs nothing at scale.
    The ordered frame accumulates sequentially — deterministic, so it
    matches the oracle bit-for-bit (rounded anyway for hash
    stability)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_v"),
        F.lead("value").over(w).alias("next_v"),
        F.round(F.sum("value").over(wf), 6).alias("run_sum"),
    ).orderBy("user_id", "event_id")


def q24_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state-per-entity — the reference's promised-but-missing M4
    core view (reference: store.py:18-20,215 only documents the
    intent). This exact window is the ECS engine's read path for
    'current world state' (core/store.py here)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    )


# -------------------------------------------------------------------- set ops
def q25_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL and UNION DISTINCT in one tagged result (merged former
    q25_union_all/q25_union_distinct so every oracle-gated query fits
    the driver's 50-entry CORRECTNESS window). The 'all' branch is a
    zero-shuffle concat; the 'distinct' branch shuffles on k."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    u_all = c.unionByName(s).select(F.lit("all").alias("mode"), "k")
    u_dis = (
        c.unionByName(s).distinct().select(F.lit("distinct").alias("mode"), "k")
    )
    return u_all.unionByName(u_dis).orderBy("mode", "k")


def q26_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / INTERSECT ALL / EXCEPT ALL in one tagged
    result (merged former q26_intersect, q26_except, and
    q56_set_ops_all). The ALL variants preserve multiplicity (bag
    semantics)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    inter = c.intersect(s).select(F.lit("intersect").alias("mode"), "k")
    exc = c.subtract(s).select(F.lit("except").alias("mode"), "k")
    inter_all = c.intersectAll(s).select(
        F.lit("intersect_all").alias("mode"), "k"
    )
    exc_all = c.exceptAll(s).select(F.lit("except_all").alias("mode"), "k")
    return (
        inter.unionByName(exc)
        .unionByName(inter_all)
        .unionByName(exc_all)
        .orderBy("mode", "k")
    )


# ------------------------------------------------------- reshaping / temporal
def q27_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/unnest with ordinality (dialect-divergent: Spark
    posexplode vs DuckDB generate_subscripts). val cast to double and
    rounded on both sides (float32 storage)."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "vec_id",
            "pos",
            F.round(F.col("v").cast("double"), 6).alias("val"),
        )
        .orderBy("vec_id", "pos")
    )


def q28_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour bucket via epoch arithmetic (dialect-divergent:
    unix_timestamp vs EPOCH). Map-side combine means the shuffle
    carries one row per (user, hour) per partition."""
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("bucket", F.floor(F.unix_timestamp("ts") / 3600))
        .groupBy("user_id", "bucket")
        .agg(
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id", "bucket")
    )


QUERIES = {
    "q01_scan_filter_project": q01_scan_filter_project,
    "q02_in_list": q02_in_list,
    "q03_compound_predicate": q03_compound_predicate,
    "q04_computed_columns": q04_computed_columns,
    "q05_inner_join": q05_inner_join,
    "q06_multiway_join": q06_multiway_join,
    "q07_left_join": q07_left_join,
    "q08_semi_join": q08_semi_join,
    "q09_anti_join": q09_anti_join,
    "q10_cross_join": q10_cross_join,
    "q11_global_agg": q11_global_agg,
    "q12_grouped_agg": q12_grouped_agg,
    "q13_count_distinct": q13_count_distinct,
    "q14_having": q14_having,
    "q15_rollup": q15_rollup,
    "q16_topk": q16_topk,
    "q17_string_fns": q17_string_fns,
    "q18_date_fns": q18_date_fns,
    "q19_math_fns": q19_math_fns,
    "q20_case_coalesce": q20_case_coalesce,
    "q21_ranking_window": q21_ranking_window,
    "q22_lag_lead_runsum": q22_lag_lead_runsum,
    "q24_latest_state": q24_latest_state,
    "q25_union": q25_union,
    "q26_set_ops": q26_set_ops,
    "q27_explode": q27_explode,
    "q28_time_bucket": q28_time_bucket,
}

ORACLES = {
    "q01_scan_filter_project": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem WHERE l_quantity > 30
        ORDER BY l_orderkey, l_linenumber
    """,
    "q02_in_list": """
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        ORDER BY o_orderkey
    """,
    "q03_compound_predicate": """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate < TIMESTAMP '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        ORDER BY l_orderkey, l_linenumber
    """,
    "q04_computed_columns": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charge
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    "q05_inner_join": """
        SELECT o.o_orderkey, c.c_name FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 100000 ORDER BY o.o_orderkey
    """,
    "q06_multiway_join": """
        SELECT n.n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name ORDER BY revenue DESC, n.n_name
    """,
    "q07_left_join": """
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
    "q08_semi_join": """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        ORDER BY c_custkey
    """,
    "q09_anti_join": """
        SELECT c_custkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey
    """,
    "q10_cross_join": """
        SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
        ORDER BY r.r_name, n.n_name
    """,
    "q11_global_agg": """
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
               ROUND(SUM(l_extendedprice), 2) AS total,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
        FROM lineitem
    """,
    "q12_grouped_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS count_order,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_discount), 6) AS avg_disc
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
    """,
    "q13_count_distinct": """
        SELECT o_orderstatus,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "q14_having": """
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n FROM orders
        GROUP BY o_custkey HAVING COUNT(*) >= 5 ORDER BY o_custkey
    """,
    "q15_rollup": """
        SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q16_topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "q17_string_fns": """
        SELECT c_custkey, UPPER(c_name) AS up,
               CAST(LENGTH(c_name) AS INT) AS len,
               SUBSTR(c_name, 1, 8) AS pre,
               REPLACE(c_mktsegment, 'MACHINERY', 'MACH') AS seg
        FROM customer WHERE c_name LIKE '%0001%' ORDER BY c_custkey
    """,
    "q18_date_fns": """
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mstart
        FROM orders ORDER BY o_orderkey
    """,
    "q19_math_fns": """
        SELECT l_orderkey, l_linenumber, ABS(l_discount - 0.05) AS d,
               CAST(CEIL(l_quantity) AS BIGINT) AS cq,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS fp,
               MOD(CAST(l_quantity AS INT), 7) AS m7
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    "q20_case_coalesce": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 150000 THEN 'big'
                    WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status2
        FROM orders ORDER BY o_orderkey
    """,
    "q21_ranking_window": """
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS INT) AS rn,
               CAST(RANK() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC) AS INT) AS rnk
        FROM orders ORDER BY o_custkey, o_orderkey
    """,
    "q22_lag_lead_runsum": """
        SELECT user_id, event_id,
               LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
               LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_v,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS run_sum
        FROM events ORDER BY user_id, event_id
    """,
    "q24_latest_state": """
        SELECT user_id, event_id, event_type, value FROM (
          SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
          FROM events e) t
        WHERE rn = 1 ORDER BY user_id
    """,
    "q25_union": """
        SELECT 'all' AS mode, k FROM (
          SELECT c_nationkey AS k FROM customer
          UNION ALL SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'distinct' AS mode, k FROM (
          SELECT c_nationkey AS k FROM customer
          UNION SELECT s_nationkey FROM supplier)
        ORDER BY mode, k
    """,
    "q26_set_ops": """
        SELECT 'intersect' AS mode, k FROM (
          SELECT c_nationkey AS k FROM customer
          INTERSECT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'except' AS mode, k FROM (
          SELECT c_nationkey AS k FROM customer
          EXCEPT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'intersect_all' AS mode, k FROM (
          SELECT c_nationkey AS k FROM customer
          INTERSECT ALL SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'except_all' AS mode, k FROM (
          SELECT c_nationkey AS k FROM customer
          EXCEPT ALL SELECT s_nationkey FROM supplier)
        ORDER BY mode, k
    """,
    "q27_explode": """
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
               ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS val
        FROM embeddings ORDER BY vec_id, pos
    """,
    "q28_time_bucket": """
        SELECT user_id, CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS bucket,
               ROUND(SUM(value), 6) AS sum_value, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, bucket ORDER BY user_id, bucket
    """,
}
