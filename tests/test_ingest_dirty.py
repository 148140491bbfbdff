"""Ingest-semantics parity: the reference's three invalid-record classes
(CS346 Report.pdf p.2 Fig. 2 — empty attribute, unparsable numeric, missing
delimiters) must be dropped by PERMISSIVE parse + IS NOT NULL, with no
custom code (SURVEY.md §2.2 P7), and valid rows must aggregate exactly."""

from __future__ import annotations

import os
from decimal import Decimal

import pytest

from hadoop_hive_analysis_spark.plans.reference_queries import (
    q1a_sql,
    q1a_top_stores_by_profit,
    q2_store_profit_employees,
)
from hadoop_hive_analysis_spark.sources.csv import read_store, read_store_sales
from hadoop_hive_analysis_spark.sources.sinks import write_tab_text


def _sales_line(date_sk, store_sk, profit, item_sk=1, qty=2):
    """One 23-field pipe row; only the queried positions carry real values."""
    f = [""] * 23
    f[0] = str(date_sk)
    f[2] = str(item_sk)
    f[7] = str(store_sk)
    f[10] = str(qty)
    f[22] = str(profit)
    return "|".join(f)


def _store_line(store_sk, n_employees):
    f = [""] * 29
    f[0] = str(store_sk)
    f[6] = str(n_employees) if n_employees is not None else ""
    return "|".join(f)


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty")
    good = [
        _sales_line(2451000, 1, "10.50"),
        _sales_line(2451001, 1, "5.25"),
        _sales_line(2451002, 2, "-3.00"),
        _sales_line(2451003, 3, "100.00"),
        _sales_line(2449999, 1, "999.99"),  # outside date range → filtered
        _sales_line(2453000, 2, "999.99"),  # outside date range → filtered
    ]
    dirty = [
        _sales_line(2451000, "", "7.77"),  # class 1: empty key attribute
        _sales_line(2451000, 1, "abc"),  # class 2: unparsable numeric
        "2451000|x|y",  # class 3: missing delimiters / short row
        _sales_line("zzz", 1, "1.00"),  # unparsable date → NULL → range-dropped
    ]
    (d / "store_sales.dat").write_text("\n".join(good + dirty) + "\n")
    stores = [
        _store_line(1, 11),
        _store_line(2, 22),
        _store_line(3, None),  # NULL employees → excluded from Q2 output
        _store_line(4, 44),  # no sales → COALESCE(profit, 0) path
    ]
    (d / "store.dat").write_text("\n".join(stores) + "\n")
    return str(d / "store_sales.dat"), str(d / "store.dat")


def test_dirty_rows_become_nulls_not_errors(spark, fixture_paths):
    sales_path, _ = fixture_paths
    df = read_store_sales(spark, sales_path)
    assert df.count() == 10  # nothing crashes; all physical lines surface
    bad_key = df.filter("ss_store_sk IS NULL").count()
    assert bad_key == 2  # empty attribute + short row
    assert df.filter("ss_net_profit IS NULL").count() >= 2


def test_q1a_native_drops_dirty_and_sums_exactly(spark, fixture_paths):
    sales_path, _ = fixture_paths
    df = read_store_sales(spark, sales_path)
    out = q1a_top_stores_by_profit(df, 10, 2450000, 2452000)
    got = {r.ss_store_sk: r.net_profit for r in out.collect()}
    assert got == {
        1: Decimal("15.75"),
        2: Decimal("-3.00"),
        3: Decimal("100.00"),
    }
    # ordering: desc by profit
    assert [r.ss_store_sk for r in out.collect()] == [3, 1, 2]


def test_q1a_sql_dual_matches_dataframe(spark, fixture_paths):
    sales_path, _ = fixture_paths
    df = read_store_sales(spark, sales_path)
    df.createOrReplaceTempView("store_sales")
    via_sql = spark.sql(q1a_sql(10, 2450000, 2452000)).collect()
    via_df = q1a_top_stores_by_profit(df, 10, 2450000, 2452000).collect()
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_df]


def test_q2_native_rightouter_coalesce_and_null_exclusion(spark, fixture_paths):
    sales_path, store_path = fixture_paths
    sales = read_store_sales(spark, sales_path)
    store = read_store(spark, store_path)
    out = q2_store_profit_employees(sales, store, 10, 2450000, 2452000)
    rows = [(r.s_store_sk, r.net_profit, r.s_number_employees) for r in out.collect()]
    assert rows == [
        (1, Decimal("15.75"), 11),
        (2, Decimal("-3.00"), 22),
        # store 3 excluded: NULL employees (reference :152,:185)
        (4, Decimal("0.00"), 44),  # no sales → COALESCE → 0
    ]


def test_tab_text_sink_roundtrip(spark, fixture_paths, tmp_path):
    sales_path, _ = fixture_paths
    df = read_store_sales(spark, sales_path)
    out = q1a_top_stores_by_profit(df, 10, 2450000, 2452000)
    dest = str(tmp_path / "out")
    write_tab_text(out, dest)
    lines = []
    for fn in os.listdir(dest):
        if fn.startswith("part-"):
            with open(os.path.join(dest, fn)) as fh:
                lines += [l.rstrip("\n") for l in fh if l.strip()]
    assert sorted(lines) == sorted(["3\t100.00", "1\t15.75", "2\t-3.00"])


def test_all_native_sql_duals_match_dataframe(spark, fixture_paths):
    """Complete §3.4 duality on the native schema: all four reference
    queries produce identical results through SQL and DataFrame forms."""
    from hadoop_hive_analysis_spark.plans.reference_queries import (
        q1b_sql,
        q1b_top_items_by_quantity,
        q1c_sql,
        q1c_top_dates_by_profit,
        q2_sql,
    )

    sales_path, store_path = fixture_paths
    sales = read_store_sales(spark, sales_path)
    store = read_store(spark, store_path)
    sales.createOrReplaceTempView("store_sales")
    store.createOrReplaceTempView("store")

    for sql, df in [
        (q1b_sql(10, 2450000, 2452000), q1b_top_items_by_quantity(sales, 10, 2450000, 2452000)),
        (q1c_sql(10, 2450000, 2452000), q1c_top_dates_by_profit(sales, 10, 2450000, 2452000)),
        (q2_sql(10, 2450000, 2452000), q2_store_profit_employees(sales, store, 10, 2450000, 2452000)),
    ]:
        got_sql = [tuple(r) for r in spark.sql(sql).collect()]
        got_df = [tuple(r) for r in df.collect()]
        assert got_sql == got_df, sql


def test_generated_store_sales_parses_and_queries(spark, tmp_path):
    """The bench's native-schema generator must produce .dat text whose
    PERMISSIVE parse exhibits all three Fig.-2 dirty classes and whose
    q1a/q2 run end-to-end with exact-decimal aggregates."""
    from hadoop_hive_analysis_spark.sources.store_sales_gen import (
        DATE_HI,
        DATE_LO,
        N_STORES,
        generate_store_sales_dat,
    )

    n = 10_000
    generate_store_sales_dat(spark, str(tmp_path), n)
    sales = read_store_sales(spark, str(tmp_path / "store_sales.dat"))
    assert sales.count() == n  # every physical line surfaces
    # class 1+3 → NULL store key (50 empty-key + 50 short rows per 10k)
    assert sales.filter("ss_store_sk IS NULL").count() == 100
    # class 2 → NULL profit (50 unparsable) + 50 short rows
    assert sales.filter("ss_net_profit IS NULL").count() == 100

    out = q1a_top_stores_by_profit(sales, 10, DATE_LO, DATE_HI).collect()
    assert len(out) == 10
    assert all(r.ss_store_sk is not None and 0 <= r.ss_store_sk < N_STORES for r in out)
    profits = [r.net_profit for r in out]
    assert profits == sorted(profits, reverse=True)

    store = read_store(spark, str(tmp_path / "store.dat"))
    q2 = q2_store_profit_employees(sales, store, 65, DATE_LO, DATE_HI).collect()
    # every third store has NULL employees and is excluded
    assert 0 < len(q2) < N_STORES + 5
    assert all(r.s_number_employees is not None for r in q2)
    # stores beyond the sales key space surface via COALESCE(profit, 0)
    no_sales = [r for r in q2 if r.s_store_sk >= N_STORES]
    assert no_sales and all(r.net_profit == Decimal("0.00") for r in no_sales)


def test_observation_metrics_ride_the_query_job(spark, fixture_paths):
    """Dirty-row taxonomy counts come out of the SAME action that runs
    the query — Observation, not a second scan."""
    from hadoop_hive_analysis_spark.sources.metrics import (
        ingest_quality_report,
        with_ingest_observation,
    )

    sales_path, _ = fixture_paths
    df = read_store_sales(spark, sales_path)
    observed, obs = with_ingest_observation(
        df, ["ss_store_sk", "ss_net_profit", "ss_sold_date_sk"]
    )
    out = q1a_top_stores_by_profit(observed, 10, 2450000, 2452000)
    assert out.count() == 3  # the action the metrics ride on
    m = obs.get
    assert m["n_rows"] == 10
    assert m["null_ss_store_sk"] == 2  # empty attr + short row
    assert m["null_ss_net_profit"] >= 2  # unparsable numeric + short row
    assert m["null_ss_sold_date_sk"] == 1  # unparsable date

    report = ingest_quality_report(
        df, ["ss_store_sk", "ss_net_profit"]
    ).collect()[0]
    assert report.n_rows == 10 and report.null_ss_store_sk == 2
