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


QUERIES = {"q53_cube": q53_cube, "q54_percentiles": q54_percentiles}

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
}
