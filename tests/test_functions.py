"""Unit tests for the function library: portable hashing and text
primitives checked against straightforward Python references."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hadoop_hive_analysis_spark.functions.hashing import (
    MERSENNE_31,
    h31,
    h64,
    minhash_params,
)
from hadoop_hive_analysis_spark.functions.text import (
    count_occurrences,
    tokens,
    with_shingles,
)


def _py_h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_h64_matches_python_md5(spark):
    words = ["", "a", "hello world", "héllo", "中文 text", "a|b\tc"]
    df = spark.createDataFrame([(w,) for w in words], ["s"])
    got = {r.s: r.h for r in df.select("s", h64("s").alias("h")).collect()}
    assert got == {w: _py_h64(w) for w in words}


def test_h31_range_and_consistency(spark):
    df = spark.createDataFrame([(str(i),) for i in range(100)], ["s"])
    rows = df.select("s", h31("s").alias("h")).collect()
    for r in rows:
        assert 0 <= r.h < MERSENNE_31
        assert r.h == _py_h64(r.s) % MERSENNE_31


def test_minhash_params_deterministic_and_valid():
    a = minhash_params(16)
    b = minhash_params(16)
    assert a == b
    assert len(set(a)) == 16
    for ai, bi in a:
        assert 1 <= ai < MERSENNE_31
        assert 0 <= bi < MERSENNE_31


def test_count_occurrences_matches_python(spark):
    cases = [("the cat the dog the", " the "), ("aaaa", "aa"), ("", "x")]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["t"])
    for text, needle in cases:
        got = (
            df.filter(F.col("t") == text)
            .select(count_occurrences("t", needle).alias("n"))
            .collect()
        )
        if got:
            # length-difference trick counts overlapping-free replacement
            want = (len(text) - len(text.replace(needle, ""))) // len(needle)
            assert got[0].n == want, (text, needle)


def test_shingles_match_python(spark):
    text = "a b c d e"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = sorted(
        r.shingle for r in with_shingles(df, "text", 3).select("shingle").collect()
    )
    toks = text.split()
    want = sorted({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
    assert got == want


def test_short_docs_produce_no_shingles(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "x")], ["doc_id", "text"])
    assert with_shingles(df, "text", 3).count() == 0


def test_tokens_split_on_any_whitespace(spark):
    df = spark.createDataFrame([("a  b\tc",)], ["t"])
    assert df.select(tokens("t").alias("tk")).collect()[0].tk == ["a", "b", "c"]
