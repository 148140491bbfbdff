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


def test_robust_outliers_planted(spark, tmp_path):
    """Synthetic events with a known median/MAD and planted extremes:
    the Hampel screen must count exactly the planted rows, and the
    lower-median rank selection must handle an even-sized group."""
    import datetime
    import os

    import pandas as pd

    from hadoop_hive_analysis_spark.operators.events import (
        events_robust_outliers,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # type A (odd n=7): values 10,10,10,11,11,12,100 → med=11? sorted:
    # 10,10,10,11,11,12,100 rank(7+1)//2=4 → med=11; dev sorted:
    # 0,0,1,1,1,1,89 rank 4 → mad=1; outliers: dev*2>9 → dev>4.5 → 89 only
    for i, v in enumerate([10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 100.0]):
        rows.append((i, t0, 1, "A", v, "{}"))
    # type B (even n=6): 1,2,3,4,5,1000 → rank (6+1)//2=3 → med=3 (lower);
    # dev: 2,1,0,1,2,997 sorted 0,1,1,2,2,997 rank 3 → mad=1;
    # outliers: dev>4.5 → only 997
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0, 1000.0]):
        rows.append((100 + i, t0, 2, "B", v, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    got = {
        r.event_type: r
        for r in events_robust_outliers(spark, str(tmp_path)).collect()
    }
    a, b = got["A"], got["B"]
    assert (a.n, a.med, a.mad, a.n_outliers, a.max_abs_dev) == (7, 11.0, 1.0, 1, 89.0)
    assert (b.n, b.med, b.mad, b.n_outliers, b.max_abs_dev) == (6, 3.0, 1.0, 1, 997.0)
