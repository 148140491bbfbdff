"""Sketch estimates pinned against exact counts; salted aggregation
equivalence against the plain groupBy it replaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_hive_analysis_spark.operators.sketches import (
    daily_distinct_users_hll,
    eda_sketch_profile,
)
from hadoop_hive_analysis_spark.operators.skew import events_value_by_user_salted
from hadoop_hive_analysis_spark.sources.catalog import load_table


def test_sketch_profile_within_hll_error(spark, sf_dir):
    row = eda_sketch_profile(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_suppkey").alias("s"),
        F.countDistinct("l_orderkey").alias("o"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert row.n_rows == exact.n
    for apx, ex in [
        (row.apx_parts, exact.p),
        (row.apx_suppliers, exact.s),
        (row.apx_orders, exact.o),
    ]:
        assert abs(apx - ex) <= max(4, 0.1 * ex), (apx, ex)
    p50, p95, p99 = row.price_p50, row.price_p95, row.price_p99
    assert p50 <= p95 <= p99


def test_hll_rollup_total_within_error(spark, sf_dir):
    rows = daily_distinct_users_hll(spark, sf_dir).collect()
    total = [r for r in rows if r.day is None]
    assert len(total) == 1
    exact = (
        load_table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()[0]
        .n
    )
    assert total[0].n_exact_users == exact
    assert all(r.hll_within_bound for r in rows)
    # per-day sketches exist for every day present in the data
    n_days = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert len(rows) - 1 == n_days


def test_salted_sum_equals_plain_groupby(spark, sf_dir):
    salted = {
        r.user_id: r.sum_value
        for r in events_value_by_user_salted(spark, sf_dir).collect()
    }
    plain = {
        r.user_id: r.s
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")) / F.lit(100.0)).alias("s")
        )
        .collect()
    }
    assert salted == plain
