#!/usr/bin/env python
"""Per-query profiler for the r19 optimization round (guide §1).

Runs one registry query in isolation with the noop sink, best-of-N, then
dumps: per-run walls, the executed jobs with their descriptions/walls, the
slowest stages (with shuffle read/write bytes and task counts), and the
``explain("formatted")`` plan to ``plans/r19/<query>_<tag>.txt``.

Usage: python scripts/profile_query.py <query_name> [runs] [tag]
  tag defaults to "before"; pass "after" when re-measuring a change.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    tag = sys.argv[3] if len(sys.argv) > 3 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hadoop_hive_analysis_spark.plans.registry import QUERIES
    from hadoop_hive_analysis_spark.session import get_spark, release_cached_blocks

    spec = QUERIES[name]
    spark = get_spark(f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JIT/codegen/file-index, untimed.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    try:
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as exc:
        print(f"WARM-UP FAILED: {type(exc).__name__}: {exc}")
        raise
    release_cached_blocks(spark)

    # Plan capture (fresh build, un-executed).
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r20")
    )
    os.makedirs(plan_dir, exist_ok=True)
    df = spec.fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
        f.write(plan)
    release_cached_blocks(spark)

    # Pre-checkpoint subplan (judge r19 item 8): non-eager localCheckpoint
    # truncates explain to `Scan ExistingRDD`, hiding everything upstream.
    # Rebuild the query with localCheckpoint stubbed to identity — profile
    # tooling only, never the query path — so the dump shows the FULL
    # logical structure (exchanges, aggregates) that claims reference.
    # Spark 4 dispatches to the classic subclass's override — patching
    # the abstract pyspark.sql.DataFrame would be a silent no-op.
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame as _DF

    _orig_ckpt = _DF.localCheckpoint
    _DF.localCheckpoint = lambda self, *a, **k: self  # type: ignore[assignment]
    try:
        full_df = spec.fn(spark, sf_dir)
        full_plan = full_df._sc._jvm.PythonSQLUtils.explainString(
            full_df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plan_dir, f"{name}_{tag}_full.txt"), "w") as f:
            f.write(full_plan)
    finally:
        _DF.localCheckpoint = _orig_ckpt  # type: ignore[assignment]
    release_cached_blocks(spark)

    # Timed runs; job boundaries tracked per run via the status tracker.
    walls = []
    sc = spark.sparkContext
    first_run_jobs: tuple[int, int] | None = None
    for i in range(runs):
        jobs_before = sc._jsc.sc().dagScheduler().nextJobId()
        sc.setJobDescription(f"{name} timed run {i}")
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 4))
        jobs_after = sc._jsc.sc().dagScheduler().nextJobId()
        if first_run_jobs is None:
            first_run_jobs = (jobs_before, jobs_after)
        sc.setJobDescription(None)
        release_cached_blocks(spark)

    print(f"query={name} tag={tag} runs={walls} best={min(walls)}")
    print(f"jobs per run: {first_run_jobs[1] - first_run_jobs[0]}")

    # REST: jobs + slowest stages across the timed window.
    base = sc.uiWebUrl
    app_id = sc.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded", timeout=10
        ) as r:
            jobs = json.loads(r.read())
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete", timeout=10
        ) as r:
            stages = json.loads(r.read())
    except Exception as exc:
        print(f"(REST unavailable: {exc})")
        spark.stop()
        return

    timed = [
        j
        for j in jobs
        if (j.get("description") or "").startswith(f"{name} timed run 0")
    ]
    print(f"\n--- jobs in timed run 0 ({len(timed)}) ---")
    from datetime import datetime

    def ms(j):
        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        try:
            a = datetime.strptime(j["submissionTime"], fmt)
            b = datetime.strptime(j["completionTime"], fmt)
            return (b - a).total_seconds()
        except Exception:
            return -1

    stage_by_id = {s["stageId"]: s for s in stages}
    for j in sorted(timed, key=lambda x: x["jobId"]):
        print(
            f"job {j['jobId']:4d} {ms(j):7.3f}s stages={j['stageIds']}"
        )
        for sid in sorted(j["stageIds"]):
            s = stage_by_id.get(sid)
            if not s:
                continue
            print(
                f"    stage {sid:4d} {s['name'][:60]:60s} "
                f"tasks={s['numCompleteTasks']:3d} "
                f"exec={s.get('executorRunTime', 0)/1000:7.2f}s "
                f"cpu={s.get('executorCpuTime', 0)/1e9:7.2f}s "
                f"shR={s.get('shuffleReadBytes', 0)/1e6:6.1f}MB "
                f"shW={s.get('shuffleWriteBytes', 0)/1e6:6.1f}MB "
                f"in={s.get('inputBytes', 0)/1e6:6.1f}MB"
            )
    spark.stop()


if __name__ == "__main__":
    main()
