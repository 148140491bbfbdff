"""Sketch-based profiling — the 100 TB answer to the reference's EDA.

The reference profiled its data with exact COUNT/COUNT DISTINCT/MIN/MAX
HiveQL passes (CS346 Report.pdf p.6-7 §3.2-3.4). At 100 TB exact distinct
counts are a full shuffle of every key; sketches answer the same
questions in one streaming pass with bounded memory:

* ``approx_count_distinct`` — HyperLogLog++, mergeable across partitions;
* ``approx_percentile`` — quantile sketch for value distributions;
* ``hll_sketch_agg``/``hll_union_agg`` (Spark ≥3.5 datasketches) — the
  re-aggregatable form: per-partition/day sketches stored, unioned at
  query time instead of rescanning.

Estimates are engine-specific (HLL implementations differ), so these are
rows-only driver checks; the TESTS pin the estimates against exact counts
with the sketches' error bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def eda_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass sketch profile of lineitem: the reference's §3 EDA table,
    scale-ready. Output: one row per profiled dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct("l_partkey").alias("apx_parts"),
        F.approx_count_distinct("l_suppkey").alias("apx_suppliers"),
        F.approx_count_distinct("l_orderkey").alias("apx_orders"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99))").alias(
            "price_p50_p95_p99"
        ),
    )
    return agg


def daily_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counting: per-day HLL sketches of event
    users, then a union-merge for the period total WITHOUT rescanning —
    the pattern for incremental 100 TB rollups (store the binary sketch
    per partition, merge at query time)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    per_day = daily.select(
        "day", F.hll_sketch_estimate("sketch").alias("apx_users")
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("apx_users")
    ).select(F.lit(None).cast("date").alias("day"), "apx_users")
    return per_day.unionByName(total)
