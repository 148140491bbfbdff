#!/usr/bin/env python
"""Measured scale-up proof for the two round-8-promoted operators that
lacked curves (SCALING.md): ``dedup.decontaminate_spans`` (span-level
eval-set decontamination — broadcast eval-set span hashes, merged-
interval removal) and ``text_analysis.vocab_coverage_build``
(coverage-target vocabulary — corpus-linear count shuffle, rank/cumsum
over the VOCAB only).

Same renamed-copy constant-dup-rate growth as the sibling curves
(copy 0 verbatim). The operator derives its eval set from the corpus
itself, so each renamed copy carries its own renamed eval set and the
removal structure reproduces per copy EXACTLY: output rows == docs and
removed-token mass both scale exactly linearly (measured: 1,357 →
13,570 tokens for 1→10x). Vocab: per-copy token universes are
disjoint, so the coverage vocabulary is exactly linear too (31 → 310
terms); its rank/cumsum runs over that vocab, never the corpus.

Usage: python scripts/scaling_decontam_vocab.py [multipliers...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bm25 import build_scaled_corpus_identity0  # noqa: E402
from scaling_minhash import cpu_seconds, peak_mem_mb  # noqa: E402


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 2, 5, 10]

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.dedup import decontaminate_spans
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        vocab_coverage_build,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark(
        "hha-scaling-decontam-vocab", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_scaled_corpus_identity0(spark, m)
        try:
            out = {"multiplier": m, "docs": 5000 * m}
            for name, fn in [
                ("decontaminate", decontaminate_spans),
                ("vocab", vocab_coverage_build),
            ]:
                samples = []
                df = None
                for _ in range(2):
                    t0, c0 = time.perf_counter(), cpu_seconds(spark)
                    df = fn(spark, d)
                    df.write.format("noop").mode("overwrite").save()
                    samples.append(
                        {
                            "wall": round(time.perf_counter() - t0, 3),
                            "cpu": round(cpu_seconds(spark) - c0, 2),
                        }
                    )
                out[name] = min(samples, key=lambda x: x["wall"])
                out[name + "_rows"] = df.count()
            out["removed_tokens"] = (
                decontaminate_spans(spark, d)
                .agg(F.sum("n_removed").cast("long"))
                .first()[0]
            )
            out["peak_mem_mb"] = peak_mem_mb(spark)
            results.append(out)
            print(json.dumps(out), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    if len(results) > 1:
        a, b = results[0], results[-1]
        print(
            json.dumps(
                {
                    "summary": {
                        "metric": "decontam_vocab_scaling",
                        "data_ratio": b["multiplier"] / a["multiplier"],
                        "decontaminate_wall_ratio": round(
                            b["decontaminate"]["wall"]
                            / a["decontaminate"]["wall"],
                            2,
                        ),
                        "vocab_wall_ratio": round(
                            b["vocab"]["wall"] / a["vocab"]["wall"], 2
                        ),
                        "decontaminate_rows_linear": all(
                            r["decontaminate_rows"]
                            == a["decontaminate_rows"] * r["multiplier"]
                            for r in results
                        ),
                        "removed_tokens_exactly_linear": all(
                            r["removed_tokens"]
                            == a["removed_tokens"] * r["multiplier"]
                            for r in results
                        ),
                        "vocab_rows_exactly_linear": all(
                            r["vocab_rows"]
                            == a["vocab_rows"] * r["multiplier"]
                            for r in results
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
