#!/usr/bin/env python
"""Measured 50x scale-up proof for the LSH/CC family (judge r16 item 7;
SCALING.md): ``dedup_embedding_lsh``, ``dedup_clusters_bigstar``,
``corpus_clean`` — the banded-join and star-contraction growth terms,
measured the way editdistance and the events pack were in r16
(isolated fresh-block samples, 1x/10x/50x, wall + CPU +
candidate/edge/output counts).

Corpus builders:
- documents (bigstar, corpus_clean): ``scaling_minhash.build_scaled_
  corpus`` — per-copy token-rename bijection, so every copy reproduces
  the base corpus's shingle structure in a disjoint universe: dup pairs
  and CC edges grow EXACTLY linearly by construction.
- embeddings (embedding_lsh): the sf1 sweep's sign-flip diagonals
  (numpy rng seed 12345+k): within-copy geometry is bit-exact (sign-bit
  flip is lossless on float32), cross-copy cosines decorrelate to
  chance — so within-copy dup pairs are exactly linear and any excess
  is the measured chance-pair tail, reported separately.

Usage: python scripts/scaling_lsh_cc.py [multipliers...]   # default 1 10 50
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

from scaling_minhash import (  # noqa: E402
    build_scaled_corpus,
    cpu_seconds,
    peak_mem_mb,
)

BASE_SF_DIR = "/root/testdata/sf0.1"
VEC_ID_OFFSET = 100_000


def build_scaled_embeddings(multiplier: int) -> str:
    """Write an ``embeddings.parquet`` with ``multiplier`` sign-flipped
    copies of the sf0.1 table into a temp sf_dir; return the dir."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(os.path.join(BASE_SF_DIR, "embeddings.parquet"))
    vec_id = base.column("vec_id").to_numpy()
    label = base.column("label").to_numpy()
    vecs = np.asarray(base.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    for k in range(multiplier):
        if k == 0:
            flipped = vecs
        else:
            signs = (
                np.random.default_rng(12345 + k).integers(0, 2, dim) * 2 - 1
            ).astype(np.float32)
            flipped = vecs * signs
        out_ids.append(vec_id + k * VEC_ID_OFFSET)
        out_vecs.append(flipped)
        out_labels.append(label)
    d = tempfile.mkdtemp(prefix=f"hha_scale_emb_{multiplier}x_")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
                "embedding": pa.array(
                    list(np.concatenate(out_vecs)), type=pa.list_(pa.float32())
                ),
                "label": pa.array(
                    np.concatenate(out_labels),
                    type=base.schema.field("label").type,
                ),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    return d


def measure(spark, name, fn, d, n_samples=2):
    from hadoop_hive_analysis_spark.session import release_cached_blocks

    samples, rows = [], None
    for _ in range(n_samples):
        t0 = time.perf_counter()
        cpu0 = cpu_seconds(spark)
        df = fn(spark, d)
        df.write.format("noop").mode("overwrite").save()
        samples.append(
            {
                "wall_sec": round(time.perf_counter() - t0, 3),
                "cpu_sec": round(cpu_seconds(spark) - cpu0, 2),
            }
        )
        # count BEFORE release: checkpoint-backed frames are not
        # recomputable after their blocks are freed
        rows = df.count()
        release_cached_blocks(spark)
    best = min(samples, key=lambda s: s["wall_sec"])
    return {
        "query": name,
        "rows": rows,
        "wall_sec": best["wall_sec"],
        "cpu_sec": best["cpu_sec"],
        "samples": samples,
        "peak_mem_mb": peak_mem_mb(spark),
    }


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 10, 50]

    from hadoop_hive_analysis_spark.operators.components import (
        dedup_clusters_bigstar,
    )
    from hadoop_hive_analysis_spark.operators.dedup import dedup_minhash_lsh
    from hadoop_hive_analysis_spark.operators.similarity import (
        dedup_embedding_lsh,
    )
    from hadoop_hive_analysis_spark.plans.pipeline import corpus_clean
    from hadoop_hive_analysis_spark.session import (
        get_spark,
        release_cached_blocks,
    )

    heap = os.environ.get("HHA_SCALE_HEAP", "12g")
    spark = get_spark(
        "hha-scaling-lsh-cc", extra_conf={"spark.driver.memory": heap}
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, list] = {"documents": [], "embeddings": []}
    for m in multipliers:
        d = build_scaled_corpus(spark, m)
        try:
            # the CC edge count the star-contraction consumes — the
            # growth term item 7 asks for, measured directly
            edges = dedup_minhash_lsh(spark, d).count()
            release_cached_blocks(spark)
            for name, fn in [
                ("dedup_clusters_bigstar", dedup_clusters_bigstar),
                ("corpus_clean", corpus_clean),
            ]:
                row = measure(spark, name, fn, d)
                row.update({"multiplier": m, "docs": 5000 * m, "edges": edges})
                out["documents"].append(row)
                print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

        e = build_scaled_embeddings(m)
        try:
            row = measure(spark, "dedup_embedding_lsh", dedup_embedding_lsh, e)
            row.update({"multiplier": m, "vectors": 2000 * m})
            out["embeddings"].append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(e, ignore_errors=True)

    def curve(rows, name):
        rs = [r for r in rows if r["query"] == name]
        base, top = rs[0], rs[-1]
        return {
            "query": name,
            "size_ratio": top["multiplier"] / base["multiplier"],
            "wall_ratio": round(top["wall_sec"] / base["wall_sec"], 2),
            "cpu_ratio": round(top["cpu_sec"] / max(base["cpu_sec"], 0.01), 2),
            "rows_ratio": round(top["rows"] / max(base["rows"], 1), 2),
        }

    summary = {
        "metric": "lsh_cc_scaling",
        "curves": [
            curve(out["documents"], "dedup_clusters_bigstar"),
            curve(out["documents"], "corpus_clean"),
            curve(out["embeddings"], "dedup_embedding_lsh"),
        ],
        "edges": [
            {"multiplier": r["multiplier"], "edges": r["edges"]}
            for r in out["documents"]
            if r["query"] == "dedup_clusters_bigstar"
        ],
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
