"""Query plans: the reference query pack (native + testdata-analog forms),
extension queries, and the registry consumed by ``__spark_entry__.py``."""

from .registry import QUERIES, oracle_sql_map, query_map

__all__ = ["QUERIES", "oracle_sql_map", "query_map"]
