"""Behavior tests for the Gopher-style repetition filter.

The driver fixtures contain no repetitive boilerplate (all 500 docs pass),
so the drop branches are proven here on constructed documents, with the
DuckDB twin run over the same rows — both the decision AND the shares must
agree cross-engine on adversarial inputs, not just on the clean corpus.
"""

from __future__ import annotations

import duckdb

from hadoop_hive_analysis_spark.operators.text_analysis import (
    DOC_REPETITION_SQL,
    doc_repetition_filter,
)

DOCS = [
    # one token repeated: top_unigram_share 1.0 -> drop
    (1, " ".join(["spam"] * 50)),
    # diverse text: every share small -> keep
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # alternating pair: unigram share 0.5, bigram share ~1/2 -> drop
    (3, " ".join(["ab", "cd"] * 30)),
    # moderate head word just over the 0.30 line (3/8) -> drop
    (4, "the cat sat on the mat the dog"),
    # single token: bigram share NULL, unigram share 1.0 -> drop
    (5, "lonely"),
    # boilerplate bigram loop: distinct unigrams but one dominant bigram
    (6, " ".join(["click here now"] * 20)),
]


def _write_fixture(spark, tmp_path):
    sf_dir = str(tmp_path)
    rows = [(i, t, "en", "unit", len(t)) for i, t in DOCS]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_drop_branches_and_cross_engine_parity(spark, tmp_path):
    sf_dir = _write_fixture(spark, tmp_path)
    got = {r["doc_id"]: r.asDict() for r in doc_repetition_filter(spark, sf_dir).collect()}

    assert {i: got[i]["keep"] for i in sorted(got)} == {
        1: False,
        2: True,
        3: False,
        4: False,
        5: False,
        6: False,
    }
    assert got[1]["top_unigram_share"] == 1.0
    assert got[5]["top_bigram_share"] is None  # <2 tokens
    assert got[3]["dup_token_frac"] > 0.9
    # doc 6: unigram share is a harmless 1/3 of each word, the bigram
    # signal is what catches the loop
    assert got[6]["top_unigram_share"] <= 0.34
    assert got[6]["top_bigram_share"] > 0.18

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(DOC_REPETITION_SQL).fetchall())
    con.close()
    spark_rows = sorted(
        tuple(r)
        for r in doc_repetition_filter(spark, sf_dir).collect()
    )
    assert spark_rows == want


def test_source_drift_planted(spark, tmp_path):
    """Planted drift: a source drawn from a disjoint vocabulary has
    TV distance near 1 (bounded by the corpus-share overlap), a source
    with the corpus-average distribution has TV near 0, and TV is
    always within [0, 1]."""
    import os

    import pandas as pd

    from hadoop_hive_analysis_spark.operators.text_analysis import (
        source_token_drift,
    )

    base = "alpha beta gamma delta " * 10
    rows = [(i, base.strip(), "en", "typical", len(base)) for i in range(40)]
    rows += [
        (100 + i, ("weird" + str(i % 3) + " ") * 40, "en", "offdist", 240)
        for i in range(10)
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    spark.createDataFrame(pdf).coalesce(2).write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {
        r.source: r for r in source_token_drift(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"typical", "offdist"}
    for r in got.values():
        assert 0.0 <= r.tv <= 1.0
    # disjoint vocabulary: TV = corpus share of the OTHER source's mass
    assert got["offdist"].tv > 0.7
    # the majority source barely moves from the corpus distribution
    assert got["typical"].tv < 0.25
    assert got["offdist"].tv > 3 * got["typical"].tv


def test_quality_classifier_weight_derivation(spark, tmp_path):
    """The frozen hashed-feature model must be reproducible from NOTHING
    but md5: recompute the per-token weight in pure Python (hashlib) and
    check the exact fixed-point logit, the empty-doc edge, and that
    repeated tokens scale the logit linearly."""
    import hashlib
    import os

    import pandas as pd

    from hadoop_hive_analysis_spark.operators.text_analysis import (
        CLS_BUCKETS,
        CLS_W_RANGE,
        doc_quality_classifier,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def weight(tok: str) -> int:
        b = h60(tok) % CLS_BUCKETS
        return h60(f"w:{b}") % (2 * CLS_W_RANGE + 1) - CLS_W_RANGE

    texts = {
        1: "alpha beta gamma",
        2: "alpha alpha alpha alpha",
        3: "",
        4: "  spaced   out  ",  # empty split artifacts must be filtered
    }
    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values()),
         "lang": ["en"] * 4, "source": ["t"] * 4,
         "n_chars": [len(v) for v in texts.values()]}
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {
        r.doc_id: r
        for r in doc_quality_classifier(spark, str(tmp_path)).collect()
    }
    assert got[1].logit_fp == sum(weight(t) for t in ["alpha", "beta", "gamma"])
    assert got[1].n_tokens == 3
    assert got[2].logit_fp == 4 * weight("alpha")
    assert got[2].keep == (got[2].logit_fp >= 0)
    assert (got[3].n_tokens, got[3].logit_fp, got[3].mean_token_score) == (
        0, 0, None,
    )
    assert got[4].n_tokens == 2
    assert got[4].logit_fp == weight("spaced") + weight("out")


def test_novelty_and_saturation_on_constructed_corpus(spark, tmp_path):
    """Constructed arrival order: doc 1 is all-novel, doc 2 repeats doc
    1 verbatim (novelty 0), doc 3 is half-new; the saturation curve
    over 4 docs in 2 cohorts flags the exact-dup in the later cohort."""
    import os

    import pandas as pd

    from hadoop_hive_analysis_spark.operators.text_analysis import (
        corpus_dedup_saturation,
        doc_ngram_novelty,
    )

    a = "alpha beta gamma delta epsilon zeta"
    half = "alpha beta gamma delta nu xi omicron pi"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [a, a, half, "totally fresh words here"],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [len(a), len(a), len(half), 24],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    nov = {
        r.doc_id: r for r in doc_ngram_novelty(spark, str(tmp_path)).collect()
    }
    assert nov[1].novelty_ppm == 1_000_000
    assert nov[2].novelty_ppm == 0  # verbatim repeat of doc 1
    # doc 3: shingles 1-2 ("alpha beta gamma", "beta gamma delta") seen
    # in doc 1; the rest (4 of 6) are new
    assert nov[3].n_novel == 4 and nov[3].n_shingles == 6
    assert nov[4].novelty_ppm == 1_000_000
    sat = {
        r.bucket: r
        for r in corpus_dedup_saturation(spark, str(tmp_path)).collect()
    }
    # ids 1..4 into 20 range-slices: doc 2 (the exact dup) lands in an
    # early-but-not-first bucket; total dups == 1
    assert sum(r.n_dups for r in sat.values()) == 1
    assert sum(r.n_docs for r in sat.values()) == 4
