"""Similarity-search quality checks: float/pandas path agreement and
approximate-variant recall floors against the exact baseline."""

from __future__ import annotations

from hadoop_hive_analysis_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_cosine_topk_float,
    ann_ivf_topk,
    ann_lsh_topk,
    dedup_embedding_cosine,
    dedup_embedding_lsh,
    embedding_knn_pandas,
)


def _neighbors(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_pandas_knn_matches_codegen_cosine(spark, sf_dir):
    a = _neighbors(ann_cosine_topk_float(spark, sf_dir))
    b = _neighbors(embedding_knn_pandas(spark, sf_dir))
    assert a == b


def test_mips_and_cosine_mostly_agree(spark, sf_dir):
    """Near-equal-norm gaussian embeddings: inner-product and cosine
    rankings should overlap heavily (sanity of the quantized MIPS)."""
    mips = _neighbors(ann_bruteforce_topk(spark, sf_dir))
    cos = _neighbors(ann_cosine_topk_float(spark, sf_dir))
    overlap = sum(len(mips[q] & cos[q]) for q in mips) / sum(
        len(mips[q]) for q in mips
    )
    assert overlap >= 0.5, overlap


def test_approximate_variants_recall_floor(spark, sf_dir):
    """LSH and IVF prune candidates; their hits must come FROM the probed
    subset but anything they do return must match brute force ranking
    within the probed candidates — here we assert a recall floor."""
    exact = _neighbors(ann_bruteforce_topk(spark, sf_dir))
    for approx_fn, floor in ((ann_lsh_topk, 0.35), (ann_ivf_topk, 0.6)):
        approx = _neighbors(approx_fn(spark, sf_dir))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(exact[q]) for q in exact)
        assert hits / total >= floor, (approx_fn.__name__, hits / total)


def test_lsh_topk_plans_equi_join(spark, sf_dir):
    """The multi-probe candidate join must be a hash equi-join on the
    bucket column — a bit_count(xor)<=r predicate would plan as
    BroadcastNestedLoopJoin and enumerate every corpus×query pair."""
    plan = (
        ann_lsh_topk(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dedup_embedding_lsh_bucketed_recall(spark, sf_dir):
    """Banded LSH near-dup: precision 1.0 by construction (exact integer
    predicate within bands — every returned pair is in the all-pairs
    set), recall bounded below. The fixture is LSH's worst case (its
    near-dups sit at cos 0.40-0.51, near the background p99.9 of 0.38);
    expected recall ≈1-(1-p^4)^8 ≈ 0.75 at cos 0.4."""
    exact = {(r.va, r.vb): r.dot_q for r in dedup_embedding_cosine(spark, sf_dir).collect()}
    got = {(r.va, r.vb): r.dot_q for r in dedup_embedding_lsh(spark, sf_dir).collect()}
    assert set(got) <= set(exact)  # precision 1.0
    assert all(exact[p] == d for p, d in got.items())  # identical exact dots
    if exact:
        assert len(got) / len(exact) >= 0.6, (len(got), len(exact))


def test_dedup_embedding_lsh_plan_is_bucketed(spark, sf_dir):
    """No all-pairs shape: the verify runs per band bucket
    (FlatMapGroupsInPandas after a hash partition on band_key), never a
    nested-loop or cartesian pair enumeration."""
    plan = (
        dedup_embedding_lsh(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "hashpartitioning(band_key" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
