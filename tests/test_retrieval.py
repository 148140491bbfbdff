"""BM25 retrieval: planted-relevance ranking + fixed-point contract.

Oracle hash-parity is covered by the registry sweep in
test_oracle_parity.py; these tests pin the RANKING semantics the hash
alone doesn't explain: term-stuffed docs rank first, rare terms outweigh
common ones, and the fixed-point score tracks real-valued BM25.
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest


def _write_docs(spark, tmp, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).coalesce(2).write.parquet(
        os.path.join(tmp, "documents.parquet")
    )


def test_bm25_planted_relevance(spark, tmp_path):
    """A corpus with one doc dense in both probe terms, one doc with a
    single occurrence, and filler docs: the dense doc must rank 1 for
    that query, and docs without any term must not appear."""
    from hadoop_hive_analysis_spark.operators import retrieval

    filler = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(0, "spark join spark join spark join " + filler)]
    rows.append((1, "spark " + filler))
    rows += [(i, filler) for i in range(2, 40)]
    _write_docs(spark, str(tmp_path), rows)
    got = retrieval.doc_bm25_search(spark, str(tmp_path)).collect()
    q1 = sorted(
        [r for r in got if r.qid == 1], key=lambda r: r.rank
    )
    assert q1, "query 1 (spark join) found nothing"
    assert q1[0].doc_id == 0 and q1[0].n_terms_matched == 2
    assert {r.doc_id for r in q1} <= {0, 1}
    # every other probe query has no matching docs in this corpus
    assert {r.qid for r in got} == {1}


def test_bm25_rare_term_outranks_common(spark, tmp_path):
    """idf weighting: with 'hash' corpus-common and 'scan' rare, a doc
    containing only the rare term must outscore a doc containing only
    the common term at equal tf and length (query 4: 'hash table scan')."""
    from hadoop_hive_analysis_spark.operators import retrieval

    pad = "alpha beta gamma delta epsilon zeta eta"
    rows = [(0, "scan " + pad), (1, "hash " + pad)]
    rows += [(i, "hash " + pad) for i in range(2, 30)]  # make 'hash' common
    _write_docs(spark, str(tmp_path), rows)
    got = {
        r.doc_id: r.score_fp
        for r in retrieval.doc_bm25_search(spark, str(tmp_path)).collect()
        if r.qid == 4
    }
    assert got[0] > got[1]


def test_fixed_point_score_tracks_real_bm25(spark, sf_dir):
    """For every emitted row, the fixed-point score must match the
    real-valued BM25 (same statistics, Lucene idf) within the documented
    2^-19-per-factor quantization bound."""
    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.functions.text import tokens
    from hadoop_hive_analysis_spark.operators import retrieval
    from hadoop_hive_analysis_spark.sources.catalog import load_table

    got = retrieval.doc_bm25_search(spark, sf_dir).collect()
    assert got, "fixture corpus matched no probe query"

    ex = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens("text")).alias("tok"))
        .cache()
    )
    dl = {r.doc_id: r.n for r in ex.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    n_docs, s = len(dl), sum(dl.values())
    terms = {t for _, q in retrieval.BM25_QUERIES for t in q.split()}
    tf_rows = (
        ex.filter(F.col("tok").isin(list(terms)))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .collect()
    )
    tf = {(r.doc_id, r.tok): r.tf for r in tf_rows}
    df = {}
    for (_, t), _v in tf.items():
        df[t] = df.get(t, 0) + 1

    def real_score(qid, doc_id):
        sc = 0.0
        for t in dict.fromkeys(dict(retrieval.BM25_QUERIES)[qid].split()):
            f = tf.get((doc_id, t))
            if not f:
                continue
            idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            denom = f + 1.2 * (1 - 0.75 + 0.75 * dl[doc_id] * n_docs / s)
            sc += idf * f * 2.2 / denom
        return sc

    for r in got:
        expect = real_score(r.qid, r.doc_id)
        assert r.score == pytest.approx(expect, rel=2 ** -18, abs=2 ** -18), (
            r.qid,
            r.doc_id,
        )


def test_hybrid_rrf_fuses_both_modalities(spark, tmp_path):
    """A document that is top-ranked lexically AND by vector similarity
    fuses with BOTH contributions and wins; one-list candidates carry a
    single contribution; the fused score is the exact integer RRF sum
    recomputable from the emitted ranks."""
    import pandas as pd

    from hadoop_hive_analysis_spark.operators.retrieval import (
        RRF_FP,
        RRF_K,
        doc_hybrid_search_rrf,
    )

    d = tmp_path / "hybrid"
    d.mkdir()
    texts = {i: "filler words nothing relevant here at all" for i in range(10)}
    texts[7] = "spark join spark join spark join"   # lexical winner, qid 1
    texts[8] = "spark appears once among other words"
    pd.DataFrame(
        [(i, t, "en", "src", len(t)) for i, t in texts.items()],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(d / "documents.parquet"))

    dim = 8
    def vec(hot, scale):
        v = [0.0] * dim
        v[hot] = scale
        return v
    vecs = {i: vec(i % dim, 0.1) for i in range(10)}
    vecs[1] = vec(0, 1.0)     # the qid-1 probe direction
    vecs[7] = vec(0, 2.0)     # strongest along the probe -> vector #1
    vecs[9] = vec(0, 1.5)     # vector-only candidate (no lexical match)
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(range(10), pa.int64()),
            "embedding": pa.array(
                [vecs[i] for i in range(10)], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * 10, pa.int32()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))

    out = [
        r
        for r in doc_hybrid_search_rrf(spark, str(d)).collect()
        if r["qid"] == 1
    ]
    by_doc = {r["doc_id"]: r for r in out}
    # doc 7: both-list winner with exact two-sided RRF sum
    top = min(out, key=lambda r: r["rank"])
    assert top["doc_id"] == 7
    assert top["lex_rank"] is not None and top["vec_rank"] is not None
    assert (
        top["rrf_fp"]
        == RRF_FP // (RRF_K + top["lex_rank"]) + RRF_FP // (RRF_K + top["vec_rank"])
    )
    # doc 9: vector-only — single contribution, still fused into the list
    assert by_doc[9]["lex_rank"] is None
    assert by_doc[9]["rrf_fp"] == RRF_FP // (RRF_K + by_doc[9]["vec_rank"])
    # every emitted score is the recomputable exact sum
    for r in out:
        want = 0
        if r["lex_rank"] is not None:
            want += RRF_FP // (RRF_K + r["lex_rank"])
        if r["vec_rank"] is not None:
            want += RRF_FP // (RRF_K + r["vec_rank"])
        assert r["rrf_fp"] == want
