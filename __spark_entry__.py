"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of :mod:`hadoop_hive_analysis_spark.plans.registry` — the
engine's single source of truth for the query pack. Each registry entry
carries the DataFrame callable, its DuckDB oracle SQL (where expressible),
and the SURVEY.md §2 operator IDs it covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_hive_analysis_spark.plans.registry import oracle_sql_map, query_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1a analog: top-K suppliers by revenue) on sf0.001."""
    from hadoop_hive_analysis_spark.plans.testdata_queries import (
        q1a_top_suppliers_by_revenue,
    )

    return q1a_top_suppliers_by_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted keys → rows-only check."""
    return oracle_sql_map()
