"""EDA-style invariants of the driver fixtures (FIXTURES.md §4 analog):
the known cardinalities the queries' docstrings and thresholds rely on.
Mirrors the reference's invariant-based sanity checking
(CS346 Report.pdf p.6-7 §3.2-3.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_hive_analysis_spark.sources.catalog import load_table


def test_supplier_cardinality_is_analog_of_58_stores(spark, sf_dir):
    """The supplier dim plays the reference's 58-store dimension: tiny and
    broadcastable at every scale factor (10 rows at sf0.001, linear in
    sf)."""
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    assert load_table(spark, sf_dir, "supplier").count() == round(10 * sf / 0.001)


def test_q2_coalesce_path_is_exercised(spark, sf_dir):
    """The even-suppkey restriction guarantees odd suppliers hit the
    COALESCE branch — assert odd suppliers exist."""
    supp = load_table(spark, sf_dir, "supplier")
    assert supp.filter(F.col("s_suppkey") % 2 == 1).count() > 0


def test_documents_contain_planted_near_dups(spark, sf_dir):
    """dedup thresholds assume planted near-dups separate cleanly from
    background (measured ≈0.98 vs <0.1 Jaccard)."""
    from hadoop_hive_analysis_spark.operators.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir).collect()
    assert len(pairs) > 0
    assert all(r.jaccard >= 0.8 for r in pairs)
    assert max(r.jaccard for r in pairs) > 0.85


def test_documents_text_is_ascii(spark, sf_dir):
    """FRAME_SAMPLE_SQL's DuckDB twin slices text as VARCHAR (DuckDB has
    no BLOB-slice md5), which equals byte slicing only while the fixture
    text is pure ASCII — assert that equivalence precondition."""
    docs = load_table(spark, sf_dir, "documents")
    non_ascii = docs.filter(
        F.octet_length(F.col("text")) != F.length(F.col("text"))
    ).count()
    assert non_ascii == 0


def test_date_ranges_cover_fixture(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
    ).collect()[0]
    assert row.lo.year >= 1995 and row.hi.year <= 2001


def test_events_users_align_with_customers(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    max_user = ev.agg(F.max("user_id")).collect()[0][0]
    max_cust = cust.agg(F.max("c_custkey")).collect()[0][0]
    assert max_user <= max_cust
