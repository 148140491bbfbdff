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
