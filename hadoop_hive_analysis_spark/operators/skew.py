"""Skew-resilient aggregation: two-phase salted grouped sum.

AQE's skew-join splitting handles skewed JOINS automatically, but a
grouped aggregation whose key distribution is pathological (one hot key
receiving most rows) still funnels every hot-key row into one reduce
partition. Salting splits each key into ``n_salts`` sub-keys for a first
partial aggregation, then re-aggregates the (tiny) salted partials — the
hot key's rows spread across ``n_salts`` partitions.

Correctness is engine-checkable because SUM/COUNT are associative: the
salted result is definitionally equal to the plain groupBy (the oracle
runs the plain GROUP BY). Salt assignment uses the portable hash of a
row-unique column so both phases are deterministic.

At 100 TB: use for known-skewed dimensions (null-heavy keys, power-law
user ids). Cost: one extra (cheap) shuffle of pre-aggregated partials —
``n_salts × distinct_keys`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h64
from ..sources.catalog import load_table

N_SALTS = 8


def salted_grouped_sum(
    df: DataFrame,
    key: str,
    measure: Column,
    alias: str,
    salt_source: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """SUM(measure) GROUP BY key, executed as salted two-phase aggregation.

    ``salt_source``: any row-level column with high cardinality (e.g. the
    row's primary key); its hash mod n_salts spreads each group's rows.
    """
    salt = (h64(F.col(salt_source).cast("string")) % F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(F.col(key), measure.alias("__m"), salt)
        .groupBy(key, "__salt")
        .agg(F.sum("__m").alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(alias))


def events_value_by_user_salted(spark, sf_dir: str) -> DataFrame:
    """Per-user exact value totals via the salted path.

    The fixture's user_id is not actually skewed — the point is the
    oracle-checked equivalence: salted two-phase == plain GROUP BY.
    """
    ev = load_table(spark, sf_dir, "events")
    out = salted_grouped_sum(
        ev,
        "user_id",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)"),
        "sum_cents",
        salt_source="event_id",
    )
    return out.select(
        "user_id", (F.col("sum_cents") / F.lit(100.0)).alias("sum_value")
    )


EVENTS_SALTED_SQL = """
    SELECT user_id,
           SUM(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
    FROM events
    GROUP BY user_id
"""
