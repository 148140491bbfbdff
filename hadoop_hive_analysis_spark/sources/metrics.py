"""Ingest observability: dirty-data taxonomy metrics as a free rider.

The reference reconstructed its invalid-data taxonomy by manually
debugging mapper failures (CS346 Report.pdf p.2 Fig. 2). The engine
instead attaches an ``Observation`` to the scan: per-class null/dirty
counts are computed inside the SAME job that runs the query — no second
pass over 100 TB, no accumulator races (Observation metrics are exactly-
once per action, unlike accumulators under task retries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_ingest_observation(
    df: DataFrame, watched_cols: list[str]
) -> tuple[DataFrame, Observation]:
    """Attach per-column null counts + row count to ``df``'s next action.

    Returns the instrumented frame and the Observation; read
    ``observation.get`` AFTER an action has run on the returned frame.
    """
    obs = Observation("ingest_quality")
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        for c in watched_cols
    ]
    return df.observe(obs, *metrics), obs


def ingest_quality_report(df: DataFrame, watched_cols: list[str]) -> DataFrame:
    """Standalone taxonomy report (one aggregation pass) — the batch-audit
    form of the same metrics, for pipelines that want a persisted report
    table rather than job-attached metrics."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
        .cast("long")
        .alias(f"null_{c}")
        for c in watched_cols
    ]
    return df.agg(*aggs)
