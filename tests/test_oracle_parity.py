"""Driver-contract parity: every registered query with an oracle must
hash-match DuckDB on the same tables (exact values, order-insensitive)."""

from __future__ import annotations

import pytest

from hadoop_hive_analysis_spark.plans.registry import QUERIES

from .oracle import assert_matches_oracle

WITH_ORACLE = [n for n, s in QUERIES.items() if s.oracle]
ROWS_ONLY = [n for n, s in QUERIES.items() if not s.oracle]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    from .oracle import lint_spark_schema

    df = QUERIES[name].fn(spark, sf_dir)
    lint_spark_schema(df)  # the driver canonicalizes rows-only results too
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_staged_pipeline_equals_fused(spark, sf_dir, tmp_path):
    """Materialize-and-reuse staging must not change results."""
    from hadoop_hive_analysis_spark.plans.pipeline import (
        corpus_clean,
        corpus_clean_staged,
    )

    fused = sorted(tuple(r) for r in corpus_clean(spark, sf_dir).collect())
    staged = sorted(
        tuple(r)
        for r in corpus_clean_staged(spark, sf_dir, str(tmp_path / "stage")).collect()
    )
    assert fused == staged
