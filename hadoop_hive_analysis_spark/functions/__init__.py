"""Engine function library: portable hashing, text primitives, vector math.

Everything here is built from JVM-side ``pyspark.sql.functions`` (no Python
row-at-a-time UDFs in any hot path) and has a DuckDB-SQL twin for the
oracle, so extension operators stay hash-checkable.
"""
