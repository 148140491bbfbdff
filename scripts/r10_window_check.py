#!/usr/bin/env python
"""Rotation-window validation: compare the physical-signature union of
the CURRENT driver window against the pre-rotation window (the current
window with the newest round's overlay inverted), so the rotation
commit can state exactly which plan shapes the swap preserved, gained,
or dropped. Reuses rotation_plan.signature (sf0.001 executed plans,
harness entries tagged statically).

Usage: python scripts/r10_window_check.py [--round N] [--json out.json]
(--round defaults to the newest _R{N}_PROMOTE overlay in registry.py)

Simulate mode (pre-staging validation, added r12): pass a plan file
with the NEXT round's candidate swap and the check runs against the
hypothetical window WITHOUT editing registry.py — so a staged rotation
can be shape-validated before any code changes:

    python scripts/r10_window_check.py --simulate plan.json [--json out]

where plan.json is {"round": N, "promote": [names...],
"demote": [names...]}. The tool validates the plan's membership
(promotes must be rested, demotes must be scored) and reports the same
preserved/gained/lost union diff, with old = the CURRENT window and
new = the SIMULATED one.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.rotation_plan import signature  # noqa: E402


def main() -> None:
    import re

    from hadoop_hive_analysis_spark.plans import registry
    from hadoop_hive_analysis_spark.plans.registry import QUERIES
    from hadoop_hive_analysis_spark.session import get_spark

    simulate = None
    if "--simulate" in sys.argv:
        with open(sys.argv[sys.argv.index("--simulate") + 1]) as f:
            simulate = json.load(f)

    if simulate is not None:
        n = simulate.get("round", 0)
        promote = list(simulate["promote"])
        demote = list(simulate["demote"])
        current = {n2 for n2, s in QUERIES.items() if s.driver}
        bad_p = [x for x in promote if x not in QUERIES or x in current]
        bad_d = [x for x in demote if x not in current]
        if bad_p or bad_d:
            raise SystemExit(
                f"plan invalid: promotes not rested/unknown {bad_p}; "
                f"demotes not scored {bad_d}"
            )
        # Balance validation (ADVICE r12): a plan with duplicates,
        # promote/demote overlap, or unequal counts would simulate a
        # window that drifts off the slot cap yet still diff clean.
        dup_p = len(promote) != len(set(promote))
        dup_d = len(demote) != len(set(demote))
        overlap = set(promote) & set(demote)
        if dup_p or dup_d or overlap:
            raise SystemExit(
                f"plan invalid: duplicate promotes={dup_p} "
                f"duplicate demotes={dup_d} overlap={sorted(overlap)}"
            )
        old_window = current
        new_window = (current - set(demote)) | set(promote)
        if len(new_window) != len(old_window):
            raise SystemExit(
                f"plan invalid: window size drifts "
                f"{len(old_window)} -> {len(new_window)}"
            )
    else:
        if "--round" in sys.argv:
            n = int(sys.argv[sys.argv.index("--round") + 1])
        else:  # newest overlay wins
            n = max(
                int(m.group(1))
                for name in dir(registry)
                if (m := re.fullmatch(r"_R(\d+)_PROMOTE", name))
            )
        promote = getattr(registry, f"_R{n}_PROMOTE")
        demote = getattr(registry, f"_R{n}_DEMOTE")
        new_window = {n2 for n2, s in QUERIES.items() if s.driver}
        # reconstruct the pre-rotation window by inverting the overlay
        old_window = (new_window - set(promote)) | set(demote)

    spark = get_spark("hha-window-check")
    spark.sparkContext.setLogLevel("ERROR")

    sigs: dict[str, set[str]] = {}
    for name in sorted(new_window | old_window):
        sigs[name] = signature(name, QUERIES[name], spark)

    def union(ws):
        u: set[str] = set()
        for name in ws:
            u |= sigs[name]
        return {k for k in u if not k.startswith("error:")}

    u_old, u_new = union(old_window), union(new_window)
    out = {
        "round": n,
        "simulated": simulate is not None,
        "prev_window": len(old_window),
        "new_window": len(new_window),
        "shapes_preserved": sorted(u_old & u_new),
        "shapes_gained": sorted(u_new - u_old),
        "shapes_lost": sorted(u_old - u_new),
        "errors": {
            name: sorted(s)
            for name, s in sigs.items()
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
