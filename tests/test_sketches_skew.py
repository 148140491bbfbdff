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


def test_hotkey_top3_skew_spreads(spark, sf_dir):
    """The derived key is genuinely skewed (hot key holds ≥80% of rows)
    and phase 1 spreads the hot key's sort over N_SALTS window partitions
    (a plain window would funnel it to one task)."""
    from hadoop_hive_analysis_spark.functions.hashing import h64
    from hadoop_hive_analysis_spark.operators.skew import (
        _SKEW_KEY,
        N_SALTS,
        events_top3_by_hotkey_salted,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.expr(_SKEW_KEY).alias("skew_key"), "event_id"
    )
    counts = {r.skew_key: r.n for r in ev.groupBy("skew_key").count().withColumnRenamed("count", "n").collect()}
    total = sum(counts.values())
    assert counts[-1] / total >= 0.8, counts[-1] / total
    salts = (
        ev.filter(F.col("skew_key") == -1)
        .select((h64(F.col("event_id").cast("string")) % F.lit(N_SALTS)).alias("s"))
        .distinct()
        .count()
    )
    assert salts == N_SALTS  # hot key spreads across every salt
    # result sanity: every key has ≤3 ranked rows, ranks are 1..3
    rows = events_top3_by_hotkey_salted(spark, sf_dir).collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r.skew_key, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3 for v in per_key.values())


def test_share_of_key_total_plan_avoids_window(spark, sf_dir):
    """The unbounded-window rewrite must broadcast the per-key totals and
    contain NO Window node — the fact rows never shuffle on the hot key."""
    from hadoop_hive_analysis_spark.operators.skew import events_share_of_key_total

    df = events_share_of_key_total(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    # shares within each key sum to ~1 (exact integer cents / exact total)
    sums = (
        df.groupBy("skew_key").agg(F.sum("value_share").alias("s")).collect()
    )
    assert sums and all(abs(r.s - 1.0) < 1e-9 for r in sums)
