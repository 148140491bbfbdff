"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark DataFrame result against the equivalent DuckDB SQL on the same
parquet tables and asserts row-count + column-name + order-insensitive
exact-value equality — the same shape as CORRECTNESS_r{N}.json, but strict
(exact float equality) so any nondeterminism is caught here first.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from hadoop_hive_analysis_spark.schemas import TESTDATA_TABLES


# Types that the driver's pandas-based canonicalizer mangles: DuckDB
# HUGEINT/DECIMAL land as float64/object and hash differently from Spark's
# bigint/double even when numerically equal (found the hard way in round 1).
# Every computed oracle column must carry an explicit CAST to a portable type.
_BANNED_ORACLE_TYPES = ("HUGEINT", "DECIMAL", "UHUGEINT")


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    types = {row[0]: row[1] for row in desc}
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    for name, typ in types.items():
        for banned in _BANNED_ORACLE_TYPES:
            assert banned not in typ.upper(), (
                f"oracle column {name!r} has non-portable type {typ}: the "
                f"driver hash distinguishes it from Spark's output — add an "
                f"explicit CAST (determinism contract)"
            )
    return cols, rows


def lint_spark_schema(spark_df):
    """Driver-contract lint: output schemas must be scalar + portable."""
    from pyspark.sql import types as T

    for f in spark_df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"column {f.name!r}: nested type {f.dataType} — driver canon crashes"
        assert not isinstance(f.dataType, T.DecimalType), (
            f"column {f.name!r}: DecimalType {f.dataType} hashes differently "
            f"from the oracle's double — cast to DOUBLE (determinism contract)"
        )


def _canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        return ("dec", str(v))  # strict: a Decimal never equals a float
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(float(v)))
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    return ("s", str(v))


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, approx: bool = False):
    lint_spark_schema(spark_df)
    o_cols, o_rows = run_oracle(sql, sf_dir)
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    assert sorted(s_cols) == sorted(o_cols), f"columns: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count: {len(s_rows)} vs {len(o_rows)}"
    sc, oc = canon_rows(s_cols, s_rows), canon_rows(o_cols, o_rows)
    if approx:
        _assert_approx(sc, oc)
    else:
        assert sc == oc, _diff(sc, oc)


def _assert_approx(sc, oc, rel=1e-9):
    assert len(sc) == len(oc)
    for a, b in zip(sc, oc):
        for x, y in zip(a, b):
            if x[0] == "f" == y[0] and x[1] != "nan" and y[1] != "nan":
                fx, fy = float(x[1]), float(y[1])
                assert math.isclose(fx, fy, rel_tol=rel, abs_tol=1e-9), (a, b)
            else:
                assert x == y, (a, b)


def _diff(sc, oc, n=5):
    only_s = [r for r in sc if r not in oc][:n]
    only_o = [r for r in oc if r not in sc][:n]
    return f"value mismatch; spark-only={only_s} oracle-only={only_o}"
