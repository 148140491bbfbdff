#!/usr/bin/env python
"""Measured scale-up for the four r10-returning flagship shapes
(SCALING.md): as-of join, bucketed campaign range join, HLL daily
rollup, and the quantile sketch. Each had a design row; this adds the
wall numbers the other families already carry.

Events ops grow by disjoint-user copies
(``scaling_cohort.build_scaled_events``): timestamps untouched, user
populations disjoint, so —

- events_asof_join: output rows scale EXACTLY ×m (per-copy match
  structure identical);
- events_campaign_range_join: campaign keys are shared across copies →
  row count constant while per-campaign event counts scale EXACTLY ×m;
- daily_distinct_users_hll: 31 day rows constant, exact distinct
  scales EXACTLY ×m, and the within-bound boolean must hold at every
  scale (the sketch is re-judged against the scaled truth).

price_quantiles_sketch grows by replicating lineitem ×m: the exact
discrete percentile rank floor(p·(mn−1))+1 maps to the same original
value except at ±1-rank boundaries (floor arithmetic — p99 shifts by
one neighbor at 10×, measured 5e-6 relative), so the invariant is
p-values within 0.01% of base, sketch_ok TRUE at every scale, and
group counts exactly linear.

Usage: python scripts/scaling_flagships.py [multipliers...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_cohort import build_scaled_events  # noqa: E402
from scaling_minhash import BASE_SF_DIR, cpu_seconds  # noqa: E402


def build_scaled_lineitem(spark, multiplier: int) -> str:
    d = tempfile.mkdtemp(prefix=f"hha_scale_lineitem_{multiplier}x_")
    li = spark.read.parquet(os.path.join(BASE_SF_DIR, "lineitem.parquet"))
    parts = [li] * multiplier
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    union.repartition(max(8, 4 * multiplier)).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet")
    )
    return d


def timed(spark, fn, d, runs=2):
    # df is captured alongside best so the returned frame is the one the
    # reported wall/cpu measured (ADVICE r10: it was the LAST run's frame,
    # and cpu was unbound for runs < 1).
    best, cpu, df = 9e9, 0.0, None
    for _ in range(max(1, runs)):
        t0 = time.perf_counter()
        c0 = cpu_seconds(spark)
        cand = fn(spark, d)
        cand.write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        if w < best:
            best, cpu, df = w, cpu_seconds(spark) - c0, cand
    return df, round(best, 3), round(cpu, 2)


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 10]

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.events import (
        events_asof_join,
        events_campaign_range_join,
    )
    from hadoop_hive_analysis_spark.operators.sketches import (
        daily_distinct_users_hll,
        price_quantiles_sketch,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    heap = os.environ.get("HHA_SCALE_HEAP", "8g")
    spark = get_spark(
        "hha-scaling-flagships", extra_conf={"spark.driver.memory": heap}
    )
    spark.sparkContext.setLogLevel("ERROR")

    base: dict[str, dict] = {}
    for m in multipliers:
        de = build_scaled_events(spark, m)
        dl = build_scaled_lineitem(spark, m)
        try:
            n_events = spark.read.parquet(
                os.path.join(de, "events.parquet")
            ).count()

            df, w, c = timed(spark, events_asof_join, de)
            rows = df.count()
            rec = {"op": "events_asof_join", "multiplier": m,
                   "events": n_events, "rows": rows,
                   "wall_sec": w, "cpu_sec": c}
            if m == multipliers[0]:
                base["asof"] = rec
            rec["rows_exactly_linear"] = bool(
                rows * base["asof"]["multiplier"]
                == base["asof"]["rows"] * m
            )
            print(json.dumps(rec), flush=True)

            df, w, c = timed(spark, events_campaign_range_join, de)
            camp = df.agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n_events").alias("tot"),
            ).first()
            rec = {"op": "events_campaign_range_join", "multiplier": m,
                   "events": n_events, "rows": int(camp["rows"]),
                   "matched_events": int(camp["tot"]),
                   "wall_sec": w, "cpu_sec": c}
            if m == multipliers[0]:
                base["range"] = rec
            rec["rows_constant"] = bool(camp["rows"] == base["range"]["rows"])
            rec["volumes_exactly_linear"] = bool(
                camp["tot"] * base["range"]["multiplier"]
                == base["range"]["matched_events"] * m
            )
            print(json.dumps(rec), flush=True)

            df, w, c = timed(spark, daily_distinct_users_hll, de)
            cols = df.columns
            exact_col = next(
                c2 for c2 in cols if "exact" in c2 or "distinct" in c2
            )
            bound_col = next(c2 for c2 in cols if "within" in c2 or "bound" in c2)
            agg = df.agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(exact_col).alias("exact_total"),
                F.min(F.col(bound_col).cast("int")).alias("all_within"),
            ).first()
            rec = {"op": "daily_distinct_users_hll", "multiplier": m,
                   "events": n_events, "rows": int(agg["rows"]),
                   "exact_total": int(agg["exact_total"]),
                   "sketch_within_bound_all_days": bool(agg["all_within"] == 1),
                   "wall_sec": w, "cpu_sec": c}
            if m == multipliers[0]:
                base["hll"] = rec
            rec["distinct_exactly_linear"] = bool(
                agg["exact_total"] * base["hll"]["multiplier"]
                == base["hll"]["exact_total"] * m
            )
            print(json.dumps(rec), flush=True)

            df, w, c = timed(spark, price_quantiles_sketch, dl)
            collected = df.collect()
            # the group count column n scales exactly with replication;
            # the quantile VALUES and the sketch-ok booleans must be
            # IDENTICAL (discrete quantiles of a replicated multiset)
            quant = {
                r["flag"]: (r["p50"], r["p90"], r["p99"]) for r in collected
            }
            all_ok = all(r["sketch_ok"] for r in collected)
            ns = {r["flag"]: r["n"] for r in collected}
            rec = {"op": "price_quantiles_sketch", "multiplier": m,
                   "lineitem_rows": spark.read.parquet(
                       os.path.join(dl, "lineitem.parquet")).count(),
                   "rows": len(quant), "wall_sec": w, "cpu_sec": c,
                   "sketch_ok_all_groups": bool(all_ok)}
            if m == multipliers[0]:
                base["sketch"] = rec
                base["sketch_quant"] = quant
                base["sketch_ns"] = ns
            rec["quantiles_within_1e4_of_base"] = bool(
                all(
                    abs(v - b) <= 1e-4 * abs(b)
                    for k in quant
                    for v, b in zip(quant[k], base["sketch_quant"][k])
                )
            )
            rec["group_counts_exactly_linear"] = bool(
                all(
                    ns[k] * base["sketch"]["multiplier"]
                    == base["sketch_ns"][k] * m
                    for k in ns
                )
            )
            print(json.dumps(rec), flush=True)
        finally:
            shutil.rmtree(de, ignore_errors=True)
            shutil.rmtree(dl, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
