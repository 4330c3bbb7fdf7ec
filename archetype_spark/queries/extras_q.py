"""Additional [D]-surface queries (q53-q54), oracle-gated.

q53: CUBE — the remaining grouping-sets family member (ROLLUP is Q15);
Spark and DuckDB both expand natively.
q54: exact percentiles — `percentile` (exact interpolated) grouped by
return flag, matching DuckDB's quantile_cont. The approximate twin
(approx_percentile / percentile_approx) exists on both engines but
uses different sketches, so only the exact form is oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archetype_spark.tables import load


def q53_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q54_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("l_extendedprice", F.lit(0.99)), 6).alias(
                "price_p99"
            ),
        )
        .orderBy("l_returnflag")
    )


def q55_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt (Spark 3.4+ native) == DuckDB UNPIVOT."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_discount", "l_tax"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


def q56_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (intersectAll) — Q26 covers the DISTINCT
    forms; the ALL variants preserve multiplicity."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersectAll(s).orderBy("k")


QUERIES = {
    "q53_cube": q53_cube,
    "q54_percentiles": q54_percentiles,
    "q55_unpivot": q55_unpivot,
    "q56_set_ops_all": q56_set_ops_all,
}

ORACLES = {
    "q53_cube": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "q54_percentiles": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
               ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90,
               ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q55_unpivot": """
        SELECT l_orderkey, l_linenumber, metric, val
        FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
              FROM lineitem)
        UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
        ORDER BY l_orderkey, l_linenumber, metric
    """,
    "q56_set_ops_all": """
        SELECT c_nationkey AS k FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier
        ORDER BY k
    """,
}
