"""Hierarchical time rollups, pivot, and semi-structured extraction.

``events_hierarchical_rollup`` is the continuous-aggregate /
hypertable-rollup pattern: a fine-grained (hourly) aggregate is computed
once and the coarse (daily) answer RE-AGGREGATES the hourly partials
instead of rescanning raw events — valid because count/sum are
associative. At 100 TB the hourly table is materialized incrementally
(see streaming foreachBatch) and every coarser rollup reads it, never the
raw stream. The oracle computes daily directly from raw rows, proving the
two routes agree exactly.

``events_pivot_by_type`` re-shapes long→wide with the native pivot
operator (one aggregation pass); the oracle uses portable conditional
aggregation.

``events_props_extract`` parses the semi-structured ``props`` JSON column
JVM-side (``get_json_object``) — the schema-on-use path for ragged
payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

_VAL_CENTS = "CAST(round(value * 100, 0) AS BIGINT)"

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals computed FROM hourly partials (associative rollup)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.withColumn("hour", F.date_trunc("hour", "ts"))
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr(_VAL_CENTS)).alias("cents"),
        )
    )
    daily = (
        hourly.withColumn("day", F.to_date("hour"))
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("cents") / F.lit(100.0)).alias("sum_value"),
        )
    )
    return daily.select("day", "event_type", "n_events", "sum_value")


EVENTS_HIERARCHICAL_ROLLUP_SQL = f"""
    SELECT CAST(ts AS DATE) AS day, event_type,
           count(*) AS n_events,
           SUM({_VAL_CENTS}) / 100.0 AS sum_value
    FROM events
    GROUP BY 1, 2
"""


def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user table: one count column per event type (native
    ``pivot`` with explicit value list — never let pivot discover values
    at scale, that is a full extra pass)."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )
    return wide.select(
        "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in EVENT_TYPES]
    )


EVENTS_PIVOT_SQL = f"""
    SELECT user_id,
           {", ".join(
               f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
               for t in EVENT_TYPES
           )}
    FROM events
    GROUP BY user_id
"""


def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the ``props`` JSON column and
    aggregate on the extracted field — all JVM-side (`get_json_object`),
    no Python."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


EVENTS_PROPS_SQL = """
    SELECT event_type,
           count(*) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           min(k) AS min_k,
           max(k) AS max_k
    FROM (
        SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    WHERE k IS NOT NULL
    GROUP BY event_type
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the canonical events-warehouse report
    the pack lacked: users bucketed by FIRST-SEEN day (their cohort),
    counted as active per day-offset from that cohort day.

    Output: (cohort_epoch_day, day_offset, n_active_users) where
    ``n_active_users`` counts DISTINCT users of the cohort active
    exactly ``day_offset`` days after their first appearance. Days are
    exchanged as epoch days (bigint) — no cross-engine date-type
    coupling.

    Scale shape: first-seen is one shuffle on user_id (map-side partial
    min); the join back to events is on the SAME key, so it reuses the
    partitioning (co-partitioned, or broadcast while the user dimension
    fits); distinct (cohort, offset, user) then the final count are
    partial-agg-bounded. Nothing touches more than (user, day) pairs
    after the first projection.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_date(to_date(ts))").cast("long").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    return (
        ev.join(first, "user_id")
        .select(
            "cohort_d", (F.col("d") - F.col("cohort_d")).alias("day_offset"), "user_id"
        )
        .distinct()
        .groupBy("cohort_d", "day_offset")
        .agg(F.count("*").alias("n_active_users"))
        .select(
            F.col("cohort_d").alias("cohort_epoch_day"),
            "day_offset",
            "n_active_users",
        )
    )


EVENTS_COHORT_RETENTION_SQL = """
    WITH ev AS (
        SELECT user_id,
               CAST(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) AS BIGINT)
                   AS d
        FROM events
    ),
    first AS (SELECT user_id, min(d) AS cohort_d FROM ev GROUP BY user_id)
    SELECT cohort_d AS cohort_epoch_day,
           d - cohort_d AS day_offset,
           CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_active_users
    FROM ev JOIN first USING (user_id)
    GROUP BY 1, 2
"""


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: per (event_type, hour) open/high/low/close/volume over
    the event value — the financial/timeseries rollup (the "candlestick"
    continuous aggregate a hypertable engine ships natively).

    Open/close are the values of the earliest/latest event in the bar
    with an event_id tie-break. Scale shape: the whole bar is ONE
    partial->final aggregation — first/last are ``min(struct(ts_epoch,
    event_id, cents))`` / ``max(...)`` (lexicographic struct comparison
    on exactly the ordering key), so each map task contributes one
    candidate row per bar and the shuffle carries bars, not ticks —
    never a Window sort over the raw stream. The oracle states open/
    close in the conventional ranked-CTE form.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts").cast("long") - F.col("ts").cast("long") % 3600).alias(
            "hour_epoch"
        ),
        F.col("ts").cast("long").alias("ts_epoch"),
        "event_id",
        F.expr(_VAL_CENTS).alias("cents"),
    )
    bars = ev.groupBy("event_type", "hour_epoch").agg(
        F.min(F.struct("ts_epoch", "event_id", "cents")).alias("o"),
        F.max(F.struct("ts_epoch", "event_id", "cents")).alias("c"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count("*").alias("volume"),
        F.sum("cents").alias("sum_cents"),
    )
    cents2d = lambda c: (F.col(c).cast("double") / F.lit(100.0))  # noqa: E731
    return bars.select(
        "event_type",
        "hour_epoch",
        cents2d("o.cents").alias("open"),
        cents2d("hi").alias("high"),
        cents2d("lo").alias("low"),
        cents2d("c.cents").alias("close"),
        "volume",
        cents2d("sum_cents").alias("sum_value"),
    )


EVENTS_OHLC_SQL = f"""
    WITH ev AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS hour_epoch,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
               event_id, {_VAL_CENTS} AS cents
        FROM events
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY event_type, hour_epoch
                   ORDER BY ts_epoch, event_id
               ) AS rn_open,
               row_number() OVER (
                   PARTITION BY event_type, hour_epoch
                   ORDER BY ts_epoch DESC, event_id DESC
               ) AS rn_close
        FROM ev
    )
    SELECT event_type, hour_epoch,
           CAST(max(CASE WHEN rn_open = 1 THEN cents END) AS DOUBLE) / 100.0
               AS open,
           CAST(max(cents) AS DOUBLE) / 100.0 AS high,
           CAST(min(cents) AS DOUBLE) / 100.0 AS low,
           CAST(max(CASE WHEN rn_close = 1 THEN cents END) AS DOUBLE) / 100.0
               AS close,
           count(*) AS volume,
           CAST(sum(cents) AS DOUBLE) / 100.0 AS sum_value
    FROM ranked
    GROUP BY event_type, hour_epoch
"""
