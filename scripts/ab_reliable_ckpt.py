#!/usr/bin/env python
"""Measured tradeoff for the localCheckpoint fault-tolerance cliff
(judge r19 item 7, guide §5).

Every multi-consumer operator truncates lineage with non-eager
``localCheckpoint`` — blocks live in executor storage with NO lineage to
recompute them, so on a real cluster an executor loss kills the job. The
deploy-time alternative is RELIABLE ``checkpoint()`` into a checkpoint
dir (HDFS/object store): survives executor loss, costs a write+read
round trip per checkpointed frame.

This harness measures that cost at 10x fixture scale by running the
checkpoint-heavy queries twice in one JVM — once as shipped
(localCheckpoint) and once with ``DataFrame.localCheckpoint``
transparently rewritten to ``checkpoint(eager=...)`` — so SCALING.md can
state the position with numbers instead of hand-waving.

Usage: python scripts/ab_reliable_ckpt.py <scaled_sf_dir> [cycles]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

QS = ["dedup_minhash_lsh", "dedup_collapse", "span_scrub"]


def main() -> None:
    sf_dir = sys.argv[1]
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql.classic.dataframe import DataFrame as _DF

    from hadoop_hive_analysis_spark.plans.registry import QUERIES
    from hadoop_hive_analysis_spark.session import get_spark, release_cached_blocks

    spark = get_spark(
        "ab-reliable-ckpt", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ckpt_dir = tempfile.mkdtemp(prefix="hha_reliable_ckpt_")
    spark.sparkContext.setCheckpointDir(ckpt_dir)

    _orig = _DF.localCheckpoint

    def _reliable(self, eager=True, storageLevel=None):  # noqa: N803
        # Reliable checkpoint has no storageLevel knob — the frame goes
        # to the checkpoint dir as files; eagerness semantics match.
        return self.checkpoint(eager=eager)

    for q in QS:  # warm both paths
        QUERIES[q].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_cached_blocks(spark)

    res: dict[tuple, list] = {}
    for cyc in range(cycles):
        for tag in ("local", "reliable") if cyc % 2 == 0 else ("reliable", "local"):
            _DF.localCheckpoint = _reliable if tag == "reliable" else _orig
            try:
                for q in QS:
                    t0 = time.perf_counter()
                    QUERIES[q].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    res.setdefault((q, tag), []).append(
                        round(time.perf_counter() - t0, 3)
                    )
                    release_cached_blocks(spark)
            finally:
                _DF.localCheckpoint = _orig
        print(f"cycle {cyc} done", flush=True)
    for q in QS:
        lo = sorted(res[(q, "local")])
        re_ = sorted(res[(q, "reliable")])
        print(
            f"QUERY {q:22s} local med={lo[len(lo) // 2]:.3f} "
            f"reliable med={re_[len(re_) // 2]:.3f} "
            f"ratio={re_[len(re_) // 2] / lo[len(lo) // 2]:.3f} "
            f"local={lo} reliable={re_}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
