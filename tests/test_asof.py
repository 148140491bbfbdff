"""Generic as-of operator: columnar (union+carry-forward) and pandas
(merge_asof) implementations must agree with each other and with the
oracle-checked events query."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_hive_analysis_spark.operators.asof import asof_join, asof_join_pandas
from hadoop_hive_analysis_spark.operators.events import events_asof_join
from hadoop_hive_analysis_spark.sources.catalog import load_table


def _sides(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return purchases, clicks


def test_generic_asof_matches_events_query(spark, sf_dir):
    purchases, clicks = _sides(spark, sf_dir)
    out = asof_join(
        purchases, clicks, on="ts", by="user_id", right_cols=["event_id", "ts"]
    )
    got = sorted(
        (r.event_id, r.user_id, r.event_id_right) for r in out.collect()
    )
    want = sorted(
        (r.purchase_id, r.user_id, r.click_id)
        for r in events_asof_join(spark, sf_dir).collect()
    )
    assert got == want


def test_pandas_asof_matches_columnar(spark, sf_dir):
    purchases, clicks = _sides(spark, sf_dir)
    kw = dict(on="ts", by="user_id", right_cols=["event_id", "ts"])
    col = sorted(
        (r.event_id, r.user_id, r.event_id_right)
        for r in asof_join(purchases, clicks, **kw).collect()
    )
    pdv = sorted(
        (r.event_id, r.user_id, int(r.event_id_right))
        for r in asof_join_pandas(purchases, clicks, **kw).collect()
    )
    assert col == pdv
