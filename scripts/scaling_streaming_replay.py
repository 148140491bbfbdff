#!/usr/bin/env python
"""Streaming-equals-batch at 10× volume (SCALING.md): the replay
batch-equivalence contracts are pinned at fixture scale in
tests/test_streaming.py; this harness re-pins two of them on a
1M-event corpus and records the replay wall — the direct evidence that
the stateful streaming twins (merging session-window state, tumbling
windowed state) keep EXACT batch equality as state volume grows 10×.

Corpus: disjoint-user copies (``scaling_cohort.build_scaled_events``)
— session and window structure replicates per copy, so the batch twin
is the ground truth at every scale and its row count is exactly
linear (sessions) / constant-keyed with linear volumes (tumbling).

Usage: python scripts/scaling_streaming_replay.py [multipliers...]
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
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 10]

    from hadoop_hive_analysis_spark.operators.events import (
        events_sessionize,
        events_tumbling_window,
    )
    from hadoop_hive_analysis_spark.session import get_spark
    from hadoop_hive_analysis_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        streaming_session_aggregates,
        streaming_tumbling_counts,
    )

    spark = get_spark(
        "hha-scaling-streaming", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    SHAPES = [
        (
            "events_session_replay",
            streaming_session_aggregates,
            events_sessionize,
            ["user_id", "session_start_epoch", "n_events", "sum_value"],
        ),
        (
            "events_tumbling_replay",
            streaming_tumbling_counts,
            events_tumbling_window,
            ["window_start_epoch", "event_type", "n_events", "sum_value"],
        ),
    ]

    base_rows: dict[str, int] = {}
    for m in multipliers:
        d = build_scaled_events(spark, m)
        try:
            n_events = spark.read.parquet(
                os.path.join(d, "events.parquet")
            ).count()
            for name, stream_fn, batch_fn, cols in SHAPES:
                ckpt = tempfile.mkdtemp(
                    prefix=f"hha_replay_ckpt_{uuid.uuid4().hex[:8]}_"
                )
                try:
                    t0 = time.perf_counter()
                    c0 = cpu_seconds(spark)
                    # the scaled table is a DIRECTORY of part files (the
                    # production layout the stream docstring describes),
                    # so glob the parts — the drain then runs one
                    # microbatch per file, exercising cross-batch state
                    table_dir = os.path.join(d, "events.parquet")
                    first_part = sorted(
                        f
                        for f in os.listdir(table_dir)
                        if f.endswith(".parquet")
                    )[0]
                    stream = read_events_stream(
                        spark,
                        table_dir,
                        file_glob="part-*.parquet",
                        footer_file=first_part,
                    )
                    got = run_available_now(
                        stream_fn(stream),
                        query_name=f"scale_{name}_{m}x_{uuid.uuid4().hex[:6]}",
                        checkpoint_dir=ckpt,
                    )
                    want = batch_fn(spark, d)
                    g, w = _rows(got, cols), _rows(want, cols)
                    wall = round(time.perf_counter() - t0, 3)
                    cpu = round(cpu_seconds(spark) - c0, 2)
                finally:
                    shutil.rmtree(ckpt, ignore_errors=True)
                rows = sum(g.values())
                rec = {
                    "op": name,
                    "multiplier": m,
                    "events": n_events,
                    "rows": rows,
                    "stream_equals_batch": bool(g == w),
                    "wall_sec_stream_plus_compare": wall,
                    "cpu_sec": cpu,
                }
                if m == multipliers[0]:
                    base_rows[name] = rows
                if name == "events_tumbling_replay":
                    # (window, type) keys are shared across copies
                    rec["rows_constant"] = bool(rows == base_rows[name])
                else:
                    rec["rows_exactly_linear"] = bool(
                        rows * multipliers[0] == base_rows[name] * m
                    )
                print(json.dumps(rec), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
