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
    # p50/p90 share ONE percentile buffer via the array form (one
    # sorted counts-map per group instead of two — guide §1.2
    # per-task work); element_at unpacks after the aggregate.
    # Interpolated values are the same function, identical bits.
    pq = F.percentile("l_quantity", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        li.groupBy("l_returnflag")
        .agg(
            pq.alias("_pq"),
            F.round(F.percentile("l_extendedprice", F.lit(0.99)), 6).alias(
                "price_p99"
            ),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("_pq", 1), 6).alias("p50"),
            F.round(F.element_at("_pq", 2), 6).alias("p90"),
            "price_p99",
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


def q57_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline, oracle-gated: exact dedup
    (deterministic min-doc_id winner per text) -> quality gate ->
    language gate -> per-source corpus stats. The composition the
    north-star operators exist for, as ONE lazy plan: dedup window +
    quality projection + filters all happen in a single shuffle
    before the final per-source aggregate.

    The dedup window partitions by sha2(text, 256), NOT raw text: at
    100 TB the shuffle sort/compare key must be a 64-char hex digest
    (32-byte hash), not the full document body. The ORACLE keeps the
    raw-text key on purpose — it is the semantic ground truth the
    digest key must agree with (identical absent sha256 collisions,
    negligible below 2^128 docs), matching operators/dedup.hash_dedup."""
    from pyspark.sql import Window

    from archetype_spark.functions.text import quality_score, token_count

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    scored = deduped.withColumn("quality", quality_score("text")).withColumn(
        "n_tokens", token_count("text")
    )
    kept = scored.filter((F.col("quality") >= 0.5) & (F.col("lang") == "en"))
    # quality is a 6-decimal value; averaging it in floating point is
    # accumulation-order dependent and a group mean can land exactly on
    # a rounding boundary (observed: same query flipping 1 ulp between
    # runs under different task scheduling). Summing exact integer
    # micro-units makes the mean order-independent on both engines.
    micro = F.round(F.col("quality") * 1e6).cast("bigint")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum(micro) / (F.count(F.lit(1)) * F.lit(1e6)), 6
            ).alias("avg_quality"),
        )
        .orderBy("source")
    )


def q58_list_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List/concat aggregation ([D] agg_list/agg_concat row):
    per-region sorted nation-name list, exposed as a joined string —
    collect_list is order-nondeterministic across partitions, so
    sort_array before joining is what makes the result hashable."""
    n = load(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


def q59_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the one join flavor Q05-Q10 leave uncovered:
    per-nation customer and supplier counts side by side, keeping
    nations present on either side only."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            "nk",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nk")
    )


def q60_stats_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates + transcendental scalar functions:
    stddev_samp/var_samp (Welford-style on both engines) and
    sqrt/exp/ln inside the aggregate. Rounded to 6 so libm-vs-JVM
    last-ulp differences can't flip the hash."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.avg(F.sqrt("l_extendedprice")), 6).alias("avg_sqrt_price"),
            F.round(F.avg(F.log(F.col("l_extendedprice"))), 6).alias(
                "avg_ln_price"
            ),
            F.round(F.avg(F.exp(F.col("l_discount"))), 6).alias("avg_exp_disc"),
        )
        .orderBy("l_linestatus")
    )


QUERIES = {
    "q53_cube": q53_cube,
    "q54_percentiles": q54_percentiles,
    "q55_unpivot": q55_unpivot,
    "q57_training_pipeline": q57_training_pipeline,
    "q58_list_agg": q58_list_agg,
    "q59_full_outer_join": q59_full_outer_join,
    "q60_stats_math": q60_stats_math,
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
    # mirrors functions/text.quality_score exactly (same formula as the
    # q35 oracle), rounded to 6 BEFORE the gate like the Spark side
    "q57_training_pipeline": """
        WITH dedup AS (
          SELECT * FROM (
            SELECT d.*, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents d) t
          WHERE rn = 1
        ), m AS (
          SELECT doc_id, source, lang,
                 len(string_split(text, ' ')) AS nt,
                 CASE WHEN len(string_split(text, ' ')) > 0
                      THEN len(list_distinct(string_split(text, ' '))) * 1.0
                           / len(string_split(text, ' '))
                      ELSE 0.0 END AS ur,
                 CASE WHEN length(text) > 0
                      THEN length(regexp_replace(text, '[^.!?,;:]', '', 'g')) * 1.0
                           / length(text)
                      ELSE 0.0 END AS pr
          FROM dedup
        ), scored AS (
          SELECT source, lang, nt,
                 ROUND(0.5 * least(nt / 50.0, 1.0) + 0.4 * ur + 0.1 * (1.0 - pr), 6)
                   AS quality
          FROM m
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nt) AS BIGINT) AS total_tokens,
               ROUND(SUM(CAST(ROUND(quality * 1000000, 0) AS BIGINT))
                     / (COUNT(*) * 1000000.0), 6) AS avg_quality
        FROM scored
        WHERE quality >= 0.5 AND lang = 'en'
        GROUP BY source
        ORDER BY source
    """,
    "q58_list_agg": """
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
    """,
    "q59_full_outer_join": """
        WITH c AS (
          SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
          FROM customer GROUP BY c_nationkey
        ), s AS (
          SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
          FROM supplier GROUP BY s_nationkey
        )
        SELECT COALESCE(c.nk, s.nk) AS nk,
               COALESCE(n_cust, 0) AS n_cust,
               COALESCE(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
        ORDER BY nk
    """,
    "q60_stats_math": """
        SELECT l_linestatus,
               ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
               ROUND(var_samp(l_discount), 6) AS var_disc,
               ROUND(AVG(sqrt(l_extendedprice)), 6) AS avg_sqrt_price,
               ROUND(AVG(ln(l_extendedprice)), 6) AS avg_ln_price,
               ROUND(AVG(exp(l_discount)), 6) AS avg_exp_disc
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
}
