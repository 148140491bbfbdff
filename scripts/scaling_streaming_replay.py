#!/usr/bin/env python
"""Isolated scaling curves for the stateful streaming replay family
(judge r17 item 5): the replay batch-equivalence contracts are pinned
at fixture scale in tests/test_streaming.py and re-verified per-round
at sf1 by the sweep; this harness measures how the three heaviest
replays — merging session windows (events_session_replay), the
watermarked stream-stream inner join (events_stream_join_replay) and
the left-outer join with heartbeat eviction
(events_stream_left_join_replay), plus the tumbling-window twin for
continuity — scale at 1x/10x/50x event volume, recording wall, CPU
and MAX STATE ROWS per point.

The claim under test is watermark-bounded state: wall grows ≲ linearly
with volume and state rows track the data inside the watermark horizon
(sessions/clicks in flight), never total history. State rows come from
the StreamingQuery progress (stateOperators.numRowsTotal) via the
PROGRESS_SINK harness hook in streaming/events.py.

Corpus: disjoint-user copies (``scaling_cohort.build_scaled_events``)
— session and join structure replicates per copy, so the batch twin is
the ground truth at every scale and the session row count is exactly
linear.

Usage: python scripts/scaling_streaming_replay.py [multipliers...]
       default 1 10 50
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_cohort import build_scaled_events  # noqa: E402
from scaling_minhash import cpu_seconds  # noqa: E402


def _rows(df, cols):
    from collections import Counter

    return Counter(tuple(r[c] for c in cols) for r in df.select(cols).collect())


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 10, 50]

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.events import (
        ATTRIB_WINDOW_SEC,
        events_click_purchase_join,
        events_sessionize,
        events_tumbling_window,
    )
    from hadoop_hive_analysis_spark.session import (
        get_spark,
        release_cached_blocks,
    )
    from hadoop_hive_analysis_spark.sources.catalog import load_table
    from hadoop_hive_analysis_spark.streaming import events as se

    spark = get_spark(
        "hha-scaling-streaming", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def batch_left_join(spark, sf_dir):
        """Inline batch twin of streaming_click_purchase_left_join (the
        registry entry's oracle is SQL-only; the harness needs a Spark
        ground truth at scales DuckDB never sees)."""
        ev = load_table(spark, sf_dir, "events")
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        j = c.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts")
                + F.expr(f"INTERVAL {ATTRIB_WINDOW_SEC} SECONDS")
            ),
            "left",
        )
        return j.select(
            "click_id",
            "purchase_id",
            "user_id",
            (
                F.col("purchase_ts").cast("long")
                - F.col("click_ts").cast("long")
            ).alias("secs_to_purchase"),
        )

    def drain_session(spark, d):
        """events_session_replay's drain, run in-script so the source
        stream slices per part file (cross-batch merging state)."""
        table_dir = os.path.join(d, "events.parquet")
        first_part = sorted(
            f for f in os.listdir(table_dir) if f.endswith(".parquet")
        )[0]
        stream = se.read_events_stream(
            spark,
            table_dir,
            file_glob="part-*.parquet",
            footer_file=first_part,
        )
        ckpt = tempfile.mkdtemp(
            prefix=f"hha_replay_ckpt_{uuid.uuid4().hex[:8]}_"
        )
        try:
            return se.run_available_now(
                se.streaming_session_aggregates(stream),
                query_name=f"scale_session_{uuid.uuid4().hex[:6]}",
                checkpoint_dir=ckpt,
            )
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    def drain_join(spark, d):
        """events_stream_join_replay's composition over the scaled
        DIRECTORY layout (the registry fn streams the single-file
        testdata/sweep layout via the default glob; a directory of part
        files needs the explicit part glob + footer file, same as the
        session drain)."""
        table_dir = os.path.join(d, "events.parquet")
        first_part = sorted(
            f for f in os.listdir(table_dir) if f.endswith(".parquet")
        )[0]
        stream = se.read_events_stream(
            spark,
            table_dir,
            file_glob="part-*.parquet",
            footer_file=first_part,
        )
        ckpt = tempfile.mkdtemp(
            prefix=f"hha_replay_ckpt_{uuid.uuid4().hex[:8]}_"
        )
        try:
            return se.run_available_now(
                se.streaming_click_purchase_join(stream),
                query_name=f"scale_ssjoin_{uuid.uuid4().hex[:6]}",
                checkpoint_dir=ckpt,
                output_mode="append",
            )
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    def drain_tumbling(spark, d):
        table_dir = os.path.join(d, "events.parquet")
        first_part = sorted(
            f for f in os.listdir(table_dir) if f.endswith(".parquet")
        )[0]
        stream = se.read_events_stream(
            spark,
            table_dir,
            file_glob="part-*.parquet",
            footer_file=first_part,
        )
        ckpt = tempfile.mkdtemp(
            prefix=f"hha_replay_ckpt_{uuid.uuid4().hex[:8]}_"
        )
        try:
            return se.run_available_now(
                se.streaming_tumbling_counts(stream),
                query_name=f"scale_tumbling_{uuid.uuid4().hex[:6]}",
                checkpoint_dir=ckpt,
            )
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    SHAPES = [
        (
            "events_session_replay",
            drain_session,
            events_sessionize,
            ["user_id", "session_start_epoch", "n_events", "sum_value"],
        ),
        (
            "events_stream_join_replay",
            drain_join,
            events_click_purchase_join,
            ["click_id", "purchase_id", "user_id", "secs_to_purchase"],
        ),
        (
            "events_stream_left_join_replay",
            se.events_stream_left_join_replay,
            batch_left_join,
            ["click_id", "purchase_id", "user_id", "secs_to_purchase"],
        ),
        (
            "events_tumbling_replay",
            drain_tumbling,
            events_tumbling_window,
            ["window_start_epoch", "event_type", "n_events", "sum_value"],
        ),
    ]

    base: dict[str, dict] = {}
    for m in multipliers:
        d = build_scaled_events(spark, m)
        try:
            n_events = spark.read.parquet(
                os.path.join(d, "events.parquet")
            ).count()
            for name, stream_fn, batch_fn, cols in SHAPES:
                sink: list = []
                se.PROGRESS_SINK = sink
                try:
                    t0 = time.perf_counter()
                    c0 = cpu_seconds(spark)
                    got = stream_fn(spark, d)
                    g = _rows(got, cols)
                    wall = round(time.perf_counter() - t0, 3)
                    cpu = round(cpu_seconds(spark) - c0, 2)
                finally:
                    se.PROGRESS_SINK = None
                state_rows = max(
                    (
                        sum(
                            so.get("numRowsTotal", 0)
                            for so in (p.get("stateOperators") or [])
                        )
                        for p in sink
                    ),
                    default=0,
                )
                w = _rows(batch_fn(spark, d), cols)
                rows = sum(g.values())
                rec = {
                    "op": name,
                    "multiplier": m,
                    "events": n_events,
                    "rows": rows,
                    "stream_equals_batch": bool(g == w),
                    "wall_sec": wall,
                    "cpu_sec": cpu,
                    "state_rows_max": state_rows,
                    "microbatches": len(sink),
                }
                if m == multipliers[0]:
                    base[name] = rec
                else:
                    b = base[name]
                    rec["wall_x"] = round(wall / b["wall_sec"], 2)
                    rec["state_x"] = round(
                        state_rows / b["state_rows_max"], 2
                    ) if b["state_rows_max"] else None
                    if name == "events_tumbling_replay":
                        # (window, type) keys are shared across copies
                        rec["rows_constant"] = bool(rows == b["rows"])
                    elif name == "events_session_replay":
                        rec["rows_exactly_linear"] = bool(
                            rows * multipliers[0] == b["rows"] * m
                        )
                print(json.dumps(rec), flush=True)
                release_cached_blocks(spark)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
