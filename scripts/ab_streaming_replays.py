#!/usr/bin/env python
"""Interleaved A/B for the two streaming replays the r9 post-fix bench
refresh flagged at 1.29x vs-pack under a busy host (host_speed_factor
1.13): events_stream_join_replay and events_session_replay, with
events_tumbling_replay as the unflagged same-family control.

Each replay drains the full sf0.1 events stream through a fresh
checkpoint dir per invocation, so run-to-run variance is dominated by
micro-batch scheduling + checkpoint-dir I/O — exactly the noise class
the interleaving separates from a plan regression: a real regression
moves the flagged queries but NOT the control.

Usage: python scripts/ab_streaming_replays.py [rounds]
Prints one JSON line with per-query samples and best/median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hadoop_hive_analysis_spark.plans.registry import QUERIES
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark("hha-ab-replays")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf}/events.parquet").count()

    names = [
        "events_stream_join_replay",  # flagged
        "events_session_replay",  # flagged
        "events_tumbling_replay",  # control
    ]
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for n in names:
            t0 = time.perf_counter()
            QUERIES[n].fn(spark, sf).write.format("noop").mode("overwrite").save()
            samples[n].append(round(time.perf_counter() - t0, 3))
    out = {
        "metric": "streaming_replay_ab",
        "sf_dir": sf,
        "samples": samples,
        "best": {n: min(s) for n, s in samples.items()},
        "median": {n: round(statistics.median(s), 3) for n, s in samples.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
