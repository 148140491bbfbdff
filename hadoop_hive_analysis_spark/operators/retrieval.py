"""Ranked keyword retrieval over the ``documents`` table — BM25 top-K.

The missing member of the text stack: the dedup/similarity pack answers
"which documents resemble EACH OTHER"; retrieval answers "which documents
match THIS QUERY" — the lookup a training-data pipeline runs to audit
what the corpus contains for a probe set (and the scoring function every
contamination/attribution investigation starts from).

Determinism design (the driver hash needs bit-identical floats across
Spark and DuckDB, and float SUMS are partition-order-dependent): all
corpus statistics — tf, df, doc length dl, corpus length S = Σdl, doc
count N — stay exact int64. With k1 = 1.2 and b = 0.75 the BM25
tf-saturation factor is the exact rational

    tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/S))
        = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)

so it is computed as ONE int64 integer division after scaling by 2^20
(``ratio_fp``) — no floats at all. The idf factor needs a logarithm
(irreducibly transcendental), so it is quantized ONCE PER DISTINCT df:
``idf_fp = floor(ln((2N+2)/(2df+1)) · 2^20)`` (the Lucene form
ln(1 + (N−df+½)/(df+½)), always positive). ``ln`` is not an
IEEE correctly-rounded op, but a cross-engine flip of this floor needs
``ln(x)·2^20`` within ~2^20·ulp ≈ 3e-9 of an integer — negligible over
the handful of distinct df values a query set touches. Everything
downstream of the two fixed-point factors is exact int64 (products,
order-free sums); the emitted ``score`` is one IEEE division by 2^40.

Score quantization error vs real-valued BM25 is < 2^-19 relative per
factor — ranking-irrelevant, and the CONTRACT is the fixed-point
function itself (the oracle recomputes it identically).

int64 headroom: ``2^20·22·tf·S`` requires tf·S < 4e14 — comfortable for
a per-shard S in the tens of billions of tokens; a 100 TB deployment
shards the corpus (per-shard BM25 statistics are standard — Elasticsearch
scores per shard the same way) or drops the fixed-point scale to 2^10.

Scale shape: the corpus is tokenized ONCE (localCheckpoint) feeding both
dl and tf; query terms are a broadcast dimension so tf computation is a
broadcast semi-join + one partial-aggregated shuffle on (doc, term); df
reuses tf (no second corpus pass); the final top-K is a per-query
``row_number`` over |queries| tiny partitions — never a global sort of
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.catalog import load_table

# Probe query set: fixed module constants so the Spark plan and the
# oracle SQL embed the same literals (same rule as minhash_params).
BM25_QUERIES: list[tuple[int, str]] = [
    (1, "spark join"),
    (2, "window agg stream"),
    (3, "customer order line"),
    (4, "hash table scan"),
    (5, "slow query"),
    (6, "merge sort batch"),
]
BM25_TOPK = 5
# Fixed-point scale for both quantized factors (score denominator 2^40).
BM25_FP = 1 << 20


def _query_terms() -> list[tuple[int, str]]:
    out = []
    for qid, text in BM25_QUERIES:
        for term in dict.fromkeys(text.split()):  # distinct, order-stable
            out.append((qid, term))
    return out


def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``BM25_TOPK`` documents per probe query under fixed-point
    BM25 (k1 = 1.2, b = 0.75, idf = ln(1 + (N−df+½)/(df+½))).

    Output: (qid, doc_id, rank, n_terms_matched, score_fp, score) —
    ``score_fp`` is the exact int64 fixed-point score (the ranking key,
    hash-stable by construction); ``score`` is its 2^-40-scaled double
    for human consumption (one IEEE division of exact inputs).
    """
    d = load_table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).localCheckpoint(eager=False)

    dl = ex.groupBy("doc_id").agg(F.count("*").alias("dl"))
    totals = dl.agg(
        F.sum("dl").cast("long").alias("s"), F.count("*").alias("n")
    )
    qterms = spark.createDataFrame(_query_terms(), "qid int, tok string")
    terms = qterms.select("tok").distinct()

    tf = (
        ex.join(F.broadcast(terms), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("tok").agg(F.count("*").alias("df"))

    scored = (
        tf.join(F.broadcast(dft), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "idf_fp",
            F.floor(
                F.log(
                    (2 * F.col("n") + 2).cast("double")
                    / (2 * F.col("df") + 1).cast("double")
                )
                * F.lit(float(BM25_FP))
            ).cast("long"),
        )
        .withColumn(
            "ratio_fp",
            F.expr(
                f"CAST({BM25_FP} AS BIGINT) * 22 * tf * s "
                f"DIV (10 * tf * s + 3 * s + 9 * dl * n)"
            ),
        )
    )
    per_query = (
        scored.join(F.broadcast(qterms), "tok")
        .groupBy("qid", "doc_id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.sum(F.col("idf_fp") * F.col("ratio_fp")).alias("score_fp"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score_fp").desc(), F.col("doc_id").asc()
    )
    return (
        per_query.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "qid",
            "doc_id",
            "rank",
            "n_terms_matched",
            "score_fp",
            (F.col("score_fp").cast("double") / F.lit(float(1 << 40))).alias(
                "score"
            ),
        )
    )


def _bm25_sql() -> str:
    qvals = ", ".join(f"({qid}, '{t}')" for qid, t in _query_terms())
    return rf"""
    WITH ex AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM ex GROUP BY doc_id),
    tot AS (SELECT CAST(sum(dl) AS BIGINT) AS s, count(*) AS n FROM dl),
    qt(qid, tok) AS (VALUES {qvals}),
    terms AS (SELECT DISTINCT tok FROM qt),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf
        FROM ex JOIN terms USING (tok)
        GROUP BY doc_id, tok
    ),
    dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT tf.doc_id, tf.tok, tf.tf, dft.df, dl.dl, tot.s, tot.n,
               CAST(floor(ln(CAST(2 * tot.n + 2 AS DOUBLE)
                             / CAST(2 * dft.df + 1 AS DOUBLE))
                          * {float(BM25_FP)}) AS BIGINT) AS idf_fp,
               (CAST({BM25_FP} AS BIGINT) * 22 * tf.tf * tot.s)
                   // (10 * tf.tf * tot.s + 3 * tot.s + 9 * dl.dl * tot.n)
                   AS ratio_fp
        FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id) CROSS JOIN tot
    ),
    per_query AS (
        SELECT qt.qid, scored.doc_id,
               count(*) AS n_terms_matched,
               CAST(sum(idf_fp * ratio_fp) AS BIGINT) AS score_fp
        FROM scored JOIN qt USING (tok)
        GROUP BY qt.qid, scored.doc_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY qid ORDER BY score_fp DESC, doc_id
               ) AS rank
        FROM per_query
    )
    SELECT qid, doc_id, rank,
           CAST(n_terms_matched AS BIGINT) AS n_terms_matched,
           score_fp,
           CAST(score_fp AS DOUBLE) / {float(1 << 40)} AS score
    FROM ranked
    WHERE rank <= {BM25_TOPK}
"""


DOC_BM25_SQL = _bm25_sql()
