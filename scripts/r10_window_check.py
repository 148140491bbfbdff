#!/usr/bin/env python
"""r10 rotation validation: compare the physical-signature union of the
NEW (r10) driver window against the r9 window, so the rotation commit
can state exactly which plan shapes the swap preserved, gained, or
dropped. Reuses rotation_plan.signature (sf0.001 executed plans,
harness entries tagged statically).

Usage: python scripts/r10_window_check.py [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.rotation_plan import signature  # noqa: E402


def main() -> None:
    from hadoop_hive_analysis_spark.plans.registry import (
        _R10_DEMOTE,
        _R10_PROMOTE,
        QUERIES,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark("hha-r10-window-check")
    spark.sparkContext.setLogLevel("ERROR")

    new_window = {n for n, s in QUERIES.items() if s.driver}
    # reconstruct the r9 window by inverting the r10 overlay
    old_window = (new_window - set(_R10_PROMOTE)) | set(_R10_DEMOTE)

    sigs: dict[str, set[str]] = {}
    for n in sorted(new_window | old_window):
        sigs[n] = signature(n, QUERIES[n], spark)

    def union(ws):
        u: set[str] = set()
        for n in ws:
            u |= sigs[n]
        return {k for k in u if not k.startswith("error:")}

    u_old, u_new = union(old_window), union(new_window)
    out = {
        "r9_window": len(old_window),
        "r10_window": len(new_window),
        "shapes_preserved": sorted(u_old & u_new),
        "shapes_gained": sorted(u_new - u_old),
        "shapes_lost": sorted(u_old - u_new),
        "errors": {
            n: sorted(s)
            for n, s in sigs.items()
            if any(k.startswith("error:") for k in s)
        },
    }
    print(json.dumps(out, indent=1))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
