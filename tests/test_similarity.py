"""Similarity-search quality checks: float/pandas path agreement and
approximate-variant recall floors against the exact baseline."""

from __future__ import annotations

from hadoop_hive_analysis_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_cosine_topk_float,
    ann_ivf_topk,
    ann_lsh_topk,
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
    for approx_fn, floor in ((ann_lsh_topk, 0.2), (ann_ivf_topk, 0.6)):
        approx = _neighbors(approx_fn(spark, sf_dir))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(exact[q]) for q in exact)
        assert hits / total >= floor, (approx_fn.__name__, hits / total)
