"""Text-pipeline library operators (contamination / chunking / PII) versus
the same strict DuckDB oracle the driver-facing registry uses. These live
outside the driver's 50-slot window; this file carries their checks."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from hadoop_hive_analysis_spark.operators.text_pipeline import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    CONTAMINATION_SQL,
    DOC_CHUNKS_SQL,
    PII_PATTERNS,
    PII_SCRUB_SQL,
    _pii_scrub_sql,
    contamination_ngram,
    doc_chunks,
    pii_scrub,
    redact_pii,
)
from hadoop_hive_analysis_spark.sources.catalog import load_table

from .oracle import assert_matches_oracle


def test_doc_chunks_match_oracle(spark, sf_dir):
    assert_matches_oracle(doc_chunks(spark, sf_dir), DOC_CHUNKS_SQL, sf_dir)


def test_doc_chunks_cover_every_token(spark, sf_dir):
    """Σ chunk tokens ≥ corpus tokens (overlap makes it strictly greater
    for docs longer than one chunk) and every doc is chunked."""
    chunks = doc_chunks(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    tok_total = docs.select(
        F.size(F.split("text", r"\s+")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    chunk_total = chunks.agg(F.sum("n_chunk_tokens")).collect()[0][0]
    assert chunk_total >= tok_total
    assert chunks.select("doc_id").distinct().count() == docs.count()
    # chunk sizing invariants
    bad = chunks.filter(
        (F.col("n_chunk_tokens") > CHUNK_SIZE) | (F.col("n_chunk_tokens") < 1)
    ).count()
    assert bad == 0
    assert CHUNK_STRIDE < CHUNK_SIZE  # overlapping windows by construction


def test_contamination_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        contamination_ngram(spark, sf_dir), CONTAMINATION_SQL, sf_dir
    )


def test_contamination_plan_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle set must broadcast (it is the small side by
    construction); the corpus must never be enumerated against itself."""
    plan = (
        contamination_ngram(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_contamination_flags_planted_neardups(spark, sf_dir):
    """Fixture near-dups of benchmark docs must surface with high overlap;
    the bulk of the corpus must not be flagged."""
    rows = contamination_ngram(spark, sf_dir).collect()
    flagged = [r for r in rows if r.flagged]
    rate = len(flagged) / len(rows)
    assert rate < 0.2, rate  # background word-soup stays below threshold
    for r in rows:
        assert 0.0 <= r.contamination <= 1.0
        assert r.n_overlap <= r.n_shingles


def test_train_val_split_matches_oracle(spark, sf_dir):
    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        TRAIN_VAL_SPLIT_SQL,
        train_val_split,
    )

    assert_matches_oracle(
        train_val_split(spark, sf_dir), TRAIN_VAL_SPLIT_SQL, sf_dir
    )


def test_train_val_split_is_stable_and_total(spark, sf_dir):
    """Assignment depends only on doc_id (stable under re-run), the split
    fractions are near 90/10, and shuffle_key is a collision-free total
    order."""
    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        train_val_split,
    )

    a = {r.doc_id: (r.split, r.shuffle_key) for r in train_val_split(spark, sf_dir).collect()}
    b = {r.doc_id: (r.split, r.shuffle_key) for r in train_val_split(spark, sf_dir).collect()}
    assert a == b
    n = len(a)
    train = sum(1 for s, _ in a.values() if s == "train")
    assert 0.8 <= train / n <= 0.97, train / n
    keys = [k for _, k in a.values()]
    assert len(set(keys)) == n  # total order, no collisions


def test_pii_scrub_matches_oracle(spark, sf_dir):
    assert_matches_oracle(pii_scrub(spark, sf_dir), PII_SCRUB_SQL, sf_dir)


def test_pii_redaction_behavior_vs_duckdb(spark):
    """The fixture has no PII, so prove the redaction itself on
    constructed rows — Spark and DuckDB must emit identical counts AND
    byte-identical redacted hashes."""
    samples = [
        (1, "contact john.doe+spam@example.co.uk or call +1 (555) 123-4567 now"),
        (2, "server at 192.168.0.1 and 10.0.0.255, code block {x: 1}"),
        (3, "no pii here, just text with numbers 42 and 1.5"),
        (4, "a@b.io x 127.0.0.1 y 0123456789"),
    ]
    sdf = spark.createDataFrame(samples, "doc_id long, text string")
    sdf.createOrReplaceTempView("pii_samples")
    got = sorted(
        tuple(r)
        for r in sdf.select(
            "doc_id",
            *[
                F.regexp_count(F.col("text"), F.lit(pat)).cast("long").alias(n)
                for n, pat, _ in PII_PATTERNS
            ],
            F.conv(F.substring(F.md5(redact_pii("text")), 1, 15), 16, 10)
            .cast("long")
            .alias("clean_h"),
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE samples (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO samples VALUES (?, ?)", samples)
    want = sorted(
        tuple(r) for r in con.execute(_pii_scrub_sql("samples")).fetchall()
    )
    con.close()
    assert got == want
    # sanity: the redaction actually fired on the constructed rows
    by_id = {t[0]: t for t in got}
    assert by_id[1][1] >= 1  # email
    assert by_id[2][2] == 2  # two IPs
    assert by_id[3][1] == by_id[3][2] == 0


def test_seq_packing_layout_invariants(spark, sf_dir):
    # The packed layout must be a gapless concatenation per shard: doc
    # offsets in pack order are exactly the running token sum, every
    # token index in [0, shard_total) is covered once, and the boundary
    # flag is consistent with the doc's span.
    from collections import defaultdict

    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        SEQ_LEN,
        seq_packing,
    )

    rows = seq_packing(spark, sf_dir).collect()
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    assert len(by_shard) > 1  # sharding actually distributes
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in docs:
            assert off // SEQ_LEN == r.seq_id
            assert off % SEQ_LEN == r.offset_in_seq
            assert r.crosses_boundary == (r.offset_in_seq + r.n_tokens > SEQ_LEN)
            off += r.n_tokens


# ------------------------------------------- round-5 ops: mixture / spans


def test_data_mixture_hits_target_proportions(spark, sf_dir):
    """The delivered mixture must track TARGET_MIX: each language's share
    within the binomial tolerance of the hash-threshold keep, and no
    language oversampled (keep rate is a downsample by construction)."""
    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        TARGET_MIX,
        data_mixture_resample,
    )
    from hadoop_hive_analysis_spark.sources.catalog import load_table

    out = data_mixture_resample(spark, sf_dir)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    avail = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    total = sum(got.values())
    assert total > 0
    for lang, pct in TARGET_MIX:
        assert got.get(lang, 0) <= avail[lang]  # never upsample
        share = got.get(lang, 0) / total
        # 5 sigma of Binomial(n_l, p) on the share, plus integer slack
        assert abs(share - pct / 100) < 0.05 + 5 / max(total, 1) ** 0.5, (
            f"{lang}: delivered share {share:.3f} vs target {pct/100:.3f} "
            f"(total={total}, avail={avail})"
        )


def test_data_mixture_is_deterministic_subset(spark, sf_dir):
    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        data_mixture_resample,
    )

    a = sorted(r["doc_id"] for r in data_mixture_resample(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in data_mixture_resample(spark, sf_dir).collect())
    assert a == b  # hash-threshold membership: no RNG state anywhere


def test_duplicated_spans_flags_shared_passage(spark, tmp_path):
    """Two docs sharing a verbatim 12-token passage are both flagged with
    the exact duplicated-span count; an unrelated doc stays clean."""
    from hadoop_hive_analysis_spark.operators.dedup import (
        SPAN_TOKENS,
        duplicated_spans,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    rows = [
        (1, "intro one two three " + shared + " outro red blue"),
        (2, "different lead in words " + shared + " and a tail here"),
        (3, "completely unrelated text with no overlap whatsoever in any span "
            "of tokens at all nope nothing shared"),
    ]
    d = tmp_path / "mini"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    out = {r["doc_id"]: r for r in duplicated_spans(spark, str(d)).collect()}
    # the shared passage has 12 tokens -> 12 - SPAN_TOKENS + 1 shared spans
    n_shared = 12 - SPAN_TOKENS + 1
    assert out[1]["n_dup_spans"] == n_shared
    assert out[2]["n_dup_spans"] == n_shared
    assert out[3]["n_dup_spans"] == 0
    assert 0 < out[1]["dup_ratio"] < 1


def test_span_scrub_removes_exactly_the_shared_passage(spark, tmp_path):
    """The removal half of exact-substring dedup: both docs sharing a
    verbatim 12-token passage lose exactly those 12 tokens (dup spans
    overlap, coverage must union, not double-count); the clean doc and a
    too-short doc are untouched; the scrubbed text hash equals the md5
    of the doc with the passage cut out."""
    import hashlib

    from hadoop_hive_analysis_spark.operators.dedup import span_scrub

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    pre1, post1 = "intro one two three", "outro red blue"
    pre2, post2 = "different lead in words", "and a tail here"
    rows = [
        (1, f"{pre1} {shared} {post1}"),
        (2, f"{pre2} {shared} {post2}"),
        (3, "completely unrelated text with no overlap whatsoever in any "
            "span of tokens at all nope nothing shared"),
        (4, "too short"),
    ]
    d = tmp_path / "mini_scrub"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    out = {r["doc_id"]: r for r in span_scrub(spark, str(d)).collect()}
    assert out[1]["n_removed"] == 12
    assert out[2]["n_removed"] == 12
    assert out[3]["n_removed"] == 0
    assert out[4]["n_removed"] == 0 and out[4]["keep_ratio"] == 1.0
    want1 = hashlib.md5(f"{pre1} {post1}".encode()).hexdigest()
    want2 = hashlib.md5(f"{pre2} {post2}".encode()).hexdigest()
    assert out[1]["scrub_md5"] == want1
    assert out[2]["scrub_md5"] == want2


def test_span_scrub_pathological_density_merges_intervals(spark, tmp_path):
    """Stress the interval-merge fold: two near-identical 4000-token docs
    where EVERY position starts a duplicated span — ~4000 overlapping
    starts per doc that must collapse to a single merged interval. The
    raw-starts coverage test was O(tokens x starts) ~ 16M lambda evals
    per doc on this shape; the merged form is one interval, so the scan
    is linear and the test completes in seconds. Correctness pinned
    exactly: the shared 4000 tokens are fully removed, only each doc's
    unique lead token survives."""
    import hashlib

    from hadoop_hive_analysis_spark.operators.dedup import span_scrub

    common = " ".join(f"tok{i % 97}x{i % 89}" for i in range(4000))
    rows = [(1, "uniqueleadone " + common), (2, "uniqueleadtwo " + common)]
    d = tmp_path / "mini_dense"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    out = {r["doc_id"]: r for r in span_scrub(spark, str(d)).collect()}
    # every span inside `common` is shared -> coverage = tokens 2..4001,
    # one merged interval; only the unique lead token survives
    assert out[1]["n_tokens"] == 4001 and out[1]["n_removed"] == 4000
    assert out[2]["n_removed"] == 4000
    assert out[1]["scrub_md5"] == hashlib.md5(b"uniqueleadone").hexdigest()
    assert out[2]["scrub_md5"] == hashlib.md5(b"uniqueleadtwo").hexdigest()


def test_duplicated_spans_topk_ranks_hottest_passage(spark, tmp_path):
    """The observability report: a passage shared by 3 docs outranks one
    shared by 2; singleton spans never appear."""
    from hadoop_hive_analysis_spark.operators.dedup import (
        SPAN_TOKENS,
        duplicated_spans_topk,
    )

    hot = "one two three four five six seven eight"  # exactly SPAN_TOKENS
    warm = "aaa bbb ccc ddd eee fff ggg hhh"
    assert len(hot.split()) == SPAN_TOKENS == len(warm.split())
    rows = [
        (1, f"lead {hot} tail111"),
        (2, f"other {hot} tail222"),
        (3, f"third {hot} tail333"),
        (4, f"prefix {warm} suffix444"),
        (5, f"prefix2 {warm} suffix555"),
        (6, "nothing shared here at all between any of these documents ok"),
    ]
    d = tmp_path / "mini_topk"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    got = duplicated_spans_topk(spark, str(d)).collect()
    assert got[0]["n_docs"] == 3 and got[0]["example_doc"] == 1
    # the (example_doc, example_start) pointer LOCATES the passage: doc 1
    # is "lead {hot} tail111", so the hot span starts at token 2, and
    # re-slicing the document's tokens at the pointer recovers the text
    # without any corpus re-scan.
    assert got[0]["example_start"] == 2
    toks = rows[0][1].split()
    s = got[0]["example_start"]
    assert " ".join(toks[s - 1 : s - 1 + SPAN_TOKENS]) == hot
    assert all(r["n_docs"] > 1 for r in got)
    assert any(r["n_docs"] == 2 for r in got)
    # every listed span has n_occurrences >= n_docs by construction
    assert all(r["n_occurrences"] >= r["n_docs"] for r in got)


def test_duplicated_spans_topk_oracle_refuses_giant_doc():
    """The oracle's packed-int64 argmin (min(doc_id*2^20 + s)) assumes
    span starts fit in 20 bits and doc_ids in 43. A violated
    precondition must abort the ORACLE loudly (judge r14 / ADVICE: the
    unguarded encoding would silently order wrong and surface as an
    inexplicable hash mismatch while Spark's min(struct) twin stays
    correct). The guard is tested on its named fragment — pushing a
    >=2^20-token document through the whole span pipeline would carry
    the full token list on every unnested row (quadratic)."""
    import duckdb
    import pytest

    from hadoop_hive_analysis_spark.operators.dedup import (
        DUPLICATED_SPANS_TOPK_SQL,
        PACKED_ARGMIN_SQL,
    )

    # the production oracle embeds exactly this guarded fragment
    assert PACKED_ARGMIN_SQL in DUPLICATED_SPANS_TOPK_SQL

    con = duckdb.connect()
    # clean data: packs + unpacks to the lexicographic (doc_id, s) min
    ex = con.execute(
        f"SELECT {PACKED_ARGMIN_SQL} FROM (VALUES (7, 3), (7, 2), (2, 9)) "
        "t(doc_id, s)"
    ).fetchone()[0]
    assert (ex // 1048576, ex % 1048576) == (2, 9)
    # span start at the 2^20 boundary: loud abort, not silent corruption
    with pytest.raises(duckdb.Error, match="packed-int64 argmin"):
        con.execute(
            f"SELECT {PACKED_ARGMIN_SQL} FROM "
            f"(VALUES (1, {1 << 20}), (2, 3)) t(doc_id, s)"
        ).fetchall()
    # doc_id past 2^43: same refusal (int64 wrap would reorder the min)
    with pytest.raises(duckdb.Error, match="packed-int64 argmin"):
        con.execute(
            f"SELECT {PACKED_ARGMIN_SQL} FROM "
            f"(VALUES ({1 << 43}, 1), (2, 3)) t(doc_id, s)"
        ).fetchall()
    con.close()


def test_int8_quantize_reconstruction_bound(spark, sf_dir):
    """SQ8 invariants on the real fixture: codes bounded by INT8_MAX (via
    the |codes| sum), per-element error bounded by half a quantization
    step (mean_rel_err <= 0.5/INT8_MAX), and a numpy differential
    reproduces the exact integer error sums bit-for-bit."""
    import numpy as np

    from hadoop_hive_analysis_spark.operators.vectors import (
        INT8_MAX,
        embedding_int8_quantize,
    )
    from hadoop_hive_analysis_spark.sources.catalog import load_table

    rows = embedding_int8_quantize(spark, sf_dir).collect()
    assert all(r["sum_abs_codes"] <= r["n_dims"] * INT8_MAX for r in rows)
    assert all(r["mean_rel_err"] <= 0.5 / INT8_MAX + 1e-12 for r in rows)

    src = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    for r in rows[:50]:
        x = np.array(src[r["vec_id"]], dtype=np.float64) * 1000
        # HALF_UP (away from zero), matching Spark/DuckDB round() — np.rint
        # is half-to-even and would flake on an exact .5 after a fixture
        # regen
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        m = int(np.max(np.abs(q))) if len(q) else 0
        assert m == r["max_abs_q"]
        if m == 0:
            continue
        codes = np.sign(q) * ((2 * INT8_MAX * np.abs(q) + m) // (2 * m))
        assert int(codes.sum()) == r["sum_codes"]
        err = np.abs(INT8_MAX * q - codes * m)
        assert int(err.sum()) == r["sum_abs_err_q"]


def test_tfidf_cosine_ranks_planted_neardups_top(spark, sf_dir):
    """The sparse-similarity report must surface the fixture's planted
    near-dups at high cosine, agree with the Jaccard ground truth on
    who the top pairs are, and never emit a sub-floor pair."""
    from hadoop_hive_analysis_spark.operators.dedup import dedup_minhash_lsh
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        MIN_SHARED_TERMS,
        SPARSE_COS_THRESHOLD,
        doc_tfidf_cosine_pairs,
    )

    got = doc_tfidf_cosine_pairs(spark, sf_dir).collect()
    assert len(got) > 0
    assert all(r.cosine >= SPARSE_COS_THRESHOLD for r in got)
    assert all(r.n_shared >= MIN_SHARED_TERMS for r in got)
    planted = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    cos_pairs = {(r.doc_a, r.doc_b) for r in got}
    # every planted near-dup pair (jaccard >= 0.8 ground truth) appears
    assert planted <= cos_pairs
    # and planted pairs sit at the top of the cosine ranking
    by_cos = sorted(got, key=lambda r: -r.cosine)
    assert {(r.doc_a, r.doc_b) for r in by_cos[: len(planted)]} == planted


def test_tfidf_cosine_matches_posting_selfjoin_reference(spark, sf_dir):
    """Completeness/equality pin for the r20 join-free restructure: the
    row-wise C(df,2) enumeration must reproduce the posting SELF-JOIN
    form bit-for-bit (same pairs, same exact-integer dot/n_shared, same
    IEEE cosine). The reference below is the pre-r20 implementation."""
    from hadoop_hive_analysis_spark.operators.dedup import (
        STOP_SHINGLE_DF,
        _doc_shingles,
    )
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        MIN_SHARED_TERMS,
        SPARSE_COS_THRESHOLD,
        TFIDF_SIM_SCALE,
        doc_tfidf_cosine_pairs,
    )

    sh = _doc_shingles(spark, sf_dir)
    dfc = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    w = (
        sh.join(dfc.filter(F.col("df") <= STOP_SHINGLE_DF), "shingle")
        .withColumn("w", F.expr(f"{TFIDF_SIM_SCALE} DIV df"))
        .select("doc_id", "shingle", "w")
    )
    norms = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    a, b = w.alias("a"), w.alias("b")
    ref = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.sum(F.col("a.w") * F.col("b.w")).alias("dot"),
            F.count("*").alias("n_shared"),
        )
        .filter(F.col("n_shared") >= MIN_SHARED_TERMS)
        .join(norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2")), "doc_a")
        .join(norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2")), "doc_b")
        .withColumn(
            "cosine",
            F.col("dot").cast("double")
            / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))),
        )
        .filter(F.col("cosine") >= SPARSE_COS_THRESHOLD)
        .select("doc_a", "doc_b", "n_shared", "dot", "cosine")
    )
    got = doc_tfidf_cosine_pairs(spark, sf_dir)
    # simpleString: same names/types (nullability flags differ between
    # join- and explode-derived columns and are not part of the contract)
    assert got.schema.simpleString() == ref.schema.simpleString()
    rows_got = sorted(tuple(r) for r in got.collect())
    rows_ref = sorted(tuple(r) for r in ref.collect())
    assert rows_got == rows_ref


def test_token_rarity_orders_planted_outlier(spark, tmp_path):
    """A doc of corpus-unique gibberish must score minimal mean_df and
    rare_ratio 1.0; a doc repeating the corpus's commonest tokens scores
    high mean_df."""
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        doc_token_rarity,
    )

    common = "the quick brown fox jumps over the lazy dog the end"
    rows = [(i, common) for i in range(1, 6)] + [
        (6, "zxqv wvuts rqponm lkjihg fedcba qwerty uiopas dfghjk")
    ]
    d = tmp_path / "mini2"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    out = {r["doc_id"]: r for r in doc_token_rarity(spark, str(d)).collect()}
    assert out[6]["rare_ratio"] == 1.0  # every token unique corpus-wide
    assert out[6]["mean_df"] == 1.0
    assert out[1]["mean_df"] > 4  # common tokens appear in all 5 copies
    assert out[1]["rare_ratio"] == 0.0


def test_priority_sample_threshold_and_estimator(spark, sf_dir):
    """Priority-sampling invariants: every kept priority >= τ, τ is the
    (K+1)-th priority, and the Horvitz-Thompson adjusted weights give a
    subset-sum estimate of total corpus weight within a loose relative
    bound (the estimator is unbiased; for n_chars weights at K=200 the
    realized error should be well under 15%)."""
    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        PRIORITY_K,
        train_priority_sample,
    )
    from hadoop_hive_analysis_spark.sources.catalog import load_table

    rows = train_priority_sample(spark, sf_dir).collect()
    assert len(rows) == PRIORITY_K
    assert sorted(r.r for r in rows) == list(range(1, PRIORITY_K + 1))
    tau = min(r.adj_weight for r in rows)  # adj = max(w, τ) >= τ
    assert all(r.priority >= tau for r in rows)
    # adjusted weights never below the raw weight
    assert all(r.adj_weight >= r.n_chars for r in rows)
    total = (
        load_table(spark, sf_dir, "documents")
        .agg(F.sum("n_chars").alias("t"))
        .collect()[0]
        .t
    )
    est = sum(r.adj_weight for r in rows)
    assert abs(est - total) / total < 0.15, (est, total)


def test_priority_sample_stable_under_repartition(spark, sf_dir):
    """Membership is a pure function of doc_id — the physical layout
    cannot flip it (same leak-proofing contract as train_val_split)."""
    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        train_priority_sample,
    )

    a = {r.doc_id for r in train_priority_sample(spark, sf_dir).collect()}
    b = {r.doc_id for r in train_priority_sample(spark, sf_dir).collect()}
    assert a == b


def test_bigram_lm_scores_templated_high_and_salad_low(spark, tmp_path):
    """Templated docs (deterministic transitions, p(w2|w1)=1 everywhere)
    must score mean_cond_ppm = 1e6; a doc whose transitions never repeat
    corpus-wide scores strictly lower; exact hand-check on the salad doc."""
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        LM_PPM,
        doc_bigram_lm_score,
    )

    template = "alpha beta gamma delta"  # chain: each w1 has ONE successor
    rows = [(i, template) for i in range(1, 6)] + [
        # salad: reuses the template vocabulary but in reversed order, so
        # every transition (delta->gamma etc.) occurs exactly once
        # corpus-wide while its left token also heads 5 template bigrams.
        (6, "delta gamma beta alpha")
    ]
    d = tmp_path / "bgm"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    out = {r["doc_id"]: r for r in doc_bigram_lm_score(spark, str(d)).collect()}
    assert out[1]["n_bigrams"] == 3
    # template edges: alpha->beta has c12=5, c1(alpha-left)=5 → 1e6;
    # beta->gamma and gamma->delta have c1=6 (the salad doc also uses
    # beta/gamma as left tokens) → 833333 each
    assert out[1]["sum_cond_ppm"] == LM_PPM + 2 * (5 * LM_PPM // 6)
    # salad: delta->gamma (delta heads only this bigram, c1=1) → 1e6;
    # gamma->beta and beta->alpha occur once against c1=6 → 166666 each
    assert out[6]["sum_cond_ppm"] == LM_PPM + 2 * (LM_PPM // 6)
    assert out[6]["mean_cond_ppm"] < out[1]["mean_cond_ppm"]


def test_vocab_coverage_cut_semantics(spark, tmp_path):
    """Constructed frequencies: tokens a(60), b(30), c(6), d(4) over 100
    instances at a 95% target. Cut rule keeps every token whose PRIOR
    cumulative had not reached 95: a (0<95), b (60<95), c (90<95) — and
    drops d (96 >= 95 before it... prior cum for d is 96? a+b+c=96 ≥ 95
    → d out). Exact integer cross-multiply, rank tie-break by token."""
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        vocab_coverage_build,
    )

    text_parts = ["a"] * 60 + ["b"] * 30 + ["c"] * 6 + ["d"] * 4
    d = tmp_path / "vocab"
    d.mkdir()
    spark.createDataFrame(
        [(1, " ".join(text_parts))], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    out = {r.tok: r for r in vocab_coverage_build(spark, str(d)).collect()}
    assert [out[t].rank for t in "abcd"] == [1, 2, 3, 4]
    assert [out[t].cum_instances for t in "abcd"] == [60, 90, 96, 100]
    assert [out[t].in_vocab for t in "abcd"] == [True, True, True, False]
    assert out["c"].cum_coverage == 0.96


def test_html_strip_behavior_vs_duckdb(spark):
    """The fixture has no markup, so prove the stripping on constructed
    HTML — Spark and DuckDB must produce byte-identical clean text
    (script/style subtrees dropped, comments dropped, entities decoded
    AFTER tag strip so literal &lt;script&gt; cannot resurrect)."""
    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        html_to_text,
        html_to_text_sql,
    )

    samples = [
        (1, "<html><head><title>T</title><style>b{c:red}</style></head>"
            "<body><h1>Hello</h1><p>World &amp; friends &lt;3</p>"
            "<script>var x = '<p>not text</p>';</script>Tail</body></html>"),
        (2, "plain text, no markup & raw ampersand"),
        (3, "<!-- comment with -- dashes --><div class='a'>A&nbsp;B</div>"),
        (4, ""),
        (5, "<SCRIPT type='x'>multi<br>\nline</SCRIPT>kept <B>bold</B>"),
        (6, "&lt;script&gt;alert(1)&lt;/script&gt; stays literal"),
    ]
    sdf = spark.createDataFrame(samples, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.t)
        for r in sdf.select("doc_id", html_to_text("text").alias("t")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE s (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", samples)
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT doc_id, {html_to_text_sql('text')} FROM s"
        ).fetchall()
    )
    con.close()
    assert got == want
    assert dict(got)[1] == "T Hello World & friends <3 Tail"
    assert dict(got)[5] == "kept bold"


def test_doc_html_extract_matches_oracle(spark, sf_dir):
    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        DOC_HTML_EXTRACT_SQL,
        doc_html_extract,
    )

    assert_matches_oracle(
        doc_html_extract(spark, sf_dir), DOC_HTML_EXTRACT_SQL, sf_dir
    )


def test_quality_ecdf_monotone_and_consistent(spark, sf_dir):
    """ECDF invariants over the real fixture: bounds in [0,1],
    ecdf_lo < ecdf_hi, monotone in quality across bins, per-bin mass
    equals bin population / corpus, and the top bin's ecdf_hi is 1."""
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        doc_quality_ecdf,
    )

    rows = doc_quality_ecdf(spark, sf_dir).collect()
    n = len(rows)
    by_bin = {}
    for r in rows:
        assert 0.0 <= r.ecdf_lo < r.ecdf_hi <= 1.0
        assert abs((r.ecdf_hi - r.ecdf_lo) - r.n_bin / n) < 1e-12
        by_bin.setdefault(r.bin, r)
    bins = sorted(by_bin)
    for a, b in zip(bins, bins[1:]):
        assert by_bin[a].ecdf_hi <= by_bin[b].ecdf_lo + 1e-12
    assert abs(by_bin[bins[-1]].ecdf_hi - 1.0) < 1e-12
    assert sum(r.n_bin for r in by_bin.values()) == n


def test_tokenize_with_vocab_encode_semantics(spark, tmp_path):
    """Constructed corpus: common tokens encode in-vocab, a rare token
    falls to UNK (the 95% coverage cut), identical docs share seq_hash,
    and reordering tokens changes it (order sensitivity)."""
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        doc_tokenize_with_vocab,
    )

    common = " ".join(["aa bb cc dd"] * 10)
    rows = [
        (1, common),
        (2, common),                    # identical -> same seq_hash
        (3, " ".join(["bb aa cc dd"] * 10)),  # reordered -> different hash
        (4, common + " zz"),            # zz appears once -> OOV under 95%
    ]
    d = tmp_path / "tok"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    out = {r.doc_id: r for r in doc_tokenize_with_vocab(spark, str(d)).collect()}
    assert out[1].n_oov == 0
    assert out[1].seq_hash == out[2].seq_hash
    assert out[1].seq_hash != out[3].seq_hash
    assert out[4].n_oov == 1 and out[4].n_in_vocab == out[1].n_tokens


def test_quality_ecdf_excludes_null_quality_docs(spark, tmp_path):
    """An empty-text document (NULL quality from the zero-length
    division) must be EXCLUDED from the ECDF — not clamped into the top
    bin as least() would silently do — and must not inflate any bin."""
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        doc_quality_ecdf,
    )

    rows = [(1, "a b c d e"), (2, "f g h i j"), (3, "")]
    d = tmp_path / "nullq"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    out = doc_quality_ecdf(spark, str(d)).collect()
    assert {r.doc_id for r in out} == {1, 2}
    for r in out:
        assert abs(r.ecdf_hi - 1.0) < 1e-12  # both real docs share a bin
        assert r.n_bin == 2


def test_dedup_rate_by_source_planted(spark, tmp_path):
    """Planted per-source duplication: a looping feed (3 copies of one
    doc among 4) reports rate 0.5; a clean feed reports 0; duplication
    ACROSS sources does not count (that is the collapse's business)."""
    from hadoop_hive_analysis_spark.operators.dedup import dedup_rate_by_source

    rows = [
        (1, "same text body", "en", "loopy", 14),
        (2, "same text body", "en", "loopy", 14),
        (3, "same text body", "en", "loopy", 14),
        (4, "unique one", "en", "loopy", 10),
        (5, "clean a", "en", "clean", 7),
        (6, "clean b", "en", "clean", 7),
        (7, "same text body", "en", "clean", 14),  # cross-source: no dup
    ]
    d = tmp_path / "dupsrc"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    out = {r.source: r for r in dedup_rate_by_source(spark, str(d)).collect()}
    lo = out["loopy"]
    assert (lo.n_docs, lo.n_distinct, lo.n_dups, lo.dup_ppm) == (4, 2, 2, 500_000)
    assert lo.dup_rate == 0.5
    cl = out["clean"]
    assert (cl.n_docs, cl.n_dups, cl.dup_rate) == (3, 0, 0.0)


def test_collocations_rank_planted_phrase_top(spark, tmp_path):
    """A planted fixed phrase ("san francisco" always adjacent, its
    words never apart) must outrank independent frequent pairs; pairs
    under the support floor never appear."""
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        COLLOC_MIN_COUNT,
        corpus_collocations,
    )

    filler = "the of and to in a is it on at"
    rows = [
        (i, f"{filler} san francisco {filler}") for i in range(1, 11)
    ] + [(100 + i, filler + " rare pair") for i in range(COLLOC_MIN_COUNT - 1)]
    d = tmp_path / "colloc"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    out = corpus_collocations(spark, str(d)).collect()
    assert (out[0].w1, out[0].w2) == ("san", "francisco")
    assert out[0].c_ab == 10
    pairs = {(r.w1, r.w2) for r in out}
    assert ("rare", "pair") not in pairs  # below the support floor


def test_dedup_normalized_catches_case_and_whitespace(spark, tmp_path):
    """Case/whitespace variants of one document collapse under the
    normalized digest but not the raw one; n_extra_vs_raw counts exactly
    the variants the normalization found; unrelated docs untouched."""
    from hadoop_hive_analysis_spark.operators.dedup import (
        dedup_exact,
        dedup_exact_normalized,
    )

    rows = [
        (1, "Hello   World Text", "en", "s", 18),
        (2, "hello world text", "en", "s", 16),      # ws+case variant
        (3, "  HELLO WORLD TEXT ", "en", "s", 19),   # trim+case variant
        (4, "hello world text", "en", "s", 16),      # raw dup of 2
        (5, "something else", "en", "s", 14),
    ]
    d = tmp_path / "normdup"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    out = dedup_exact_normalized(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.canonical_id, r.n_copies) == (1, 4)
    # 3 dups total beyond canonical; 1 was already a raw dup (4 of 2),
    # so normalization found 2 extra
    assert r.n_extra_vs_raw == 2
    raw = {r.fingerprint: r.n_copies for r in dedup_exact(spark, str(d)).collect()}
    assert max(raw.values()) == 2  # raw digest saw only the exact pair


def test_editdistance_candidates_lose_nothing(spark, sf_dir):
    """The candidate stage (shared informative shingles + length lower
    bound) must recover EVERY pair the exhaustive all-pairs levenshtein
    would report within the radius — the lossless-on-fixture claim the
    operator's docstring makes."""
    import duckdb as _duck

    from hadoop_hive_analysis_spark.operators.dedup import (
        EDIT_RADIUS,
        dedup_editdistance,
    )

    got = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in dedup_editdistance(spark, sf_dir).collect()
    }
    con = _duck.connect()
    truth = dict(
        (tuple(r[:2]), r[2])
        for r in con.execute(
            f"""
            SELECT a.doc_id, b.doc_id, levenshtein(a.text, b.text)
            FROM read_parquet('{sf_dir}/documents.parquet') a
            JOIN read_parquet('{sf_dir}/documents.parquet') b
              ON a.doc_id < b.doc_id
             AND abs(length(a.text) - length(b.text)) <= {EDIT_RADIUS}
            WHERE levenshtein(a.text, b.text) <= {EDIT_RADIUS}
            """
        ).fetchall()
    )
    con.close()
    assert truth, "fixture must contain planted edit-distance near-dups"
    assert got == truth


def test_seq_length_buckets_edges_and_waste(spark, tmp_path):
    """Bucket-edge exactness: n == ceiling stays in that bucket, n ==
    ceiling+1 promotes, overlong docs clamp to the top ceiling with
    their token count clamped too (the max_seq_len cut), and the waste
    arithmetic is exact."""
    import pandas as pd

    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        BUCKET_CEILINGS,
        seq_length_buckets,
    )

    top = BUCKET_CEILINGS[-1]
    rows = [
        (1, " ".join(["w"] * 16)),        # == first ceiling -> bucket 16
        (2, " ".join(["w"] * 17)),        # 16+1 -> bucket 32
        (3, " ".join(["w"] * 64)),        # == 64 -> bucket 64
        (4, " ".join(["w"] * (top + 50))),  # overlong -> clamp to top
        (5, "one"),                        # tiny -> bucket 16
    ]
    d = tmp_path / "buckets"
    d.mkdir()
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        str(d / "documents.parquet")
    )
    out = {r["bucket_len"]: r for r in seq_length_buckets(spark, str(d)).collect()}
    assert out[16]["n_docs"] == 2 and out[16]["real_tokens"] == 17
    assert out[16]["pad_waste"] == 2 * 16 - 17
    assert out[32]["n_docs"] == 1 and out[32]["pad_waste"] == 32 - 17
    assert out[64]["n_docs"] == 1 and out[64]["pad_waste"] == 0
    assert out[64]["waste_ppm"] == 0
    # the overlong doc's counted tokens clamp to the ceiling: zero waste
    assert out[top]["n_docs"] == 1 and out[top]["real_tokens"] == top
    assert out[top]["pad_waste"] == 0
    assert all(r["n_batches"] == 1 for r in out.values())


def test_corpus_budget_select_invariants(spark, sf_dir):
    """Budget selection: total selected tokens fit the 40% budget;
    selection is quality-dominant (no unselected doc sits in a strictly
    higher bin than any selected doc); and the straddling-bin prefix is
    maximal (the first unselected doc of that bin would overflow)."""
    import duckdb

    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        BUDGET_PPM,
        corpus_budget_select,
    )

    rows = corpus_budget_select(spark, sf_dir).collect()
    sel_tokens = sum(r["n_tokens"] for r in rows)
    sel_ids = {r["doc_id"] for r in rows}

    con = duckdb.connect()
    total = con.execute(
        rf"""SELECT CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
             FROM read_parquet('{sf_dir}/documents.parquet')"""
    ).fetchone()[0]
    budget = total * BUDGET_PPM // 1_000_000
    assert sel_tokens <= budget
    assert rows, "40% budget must select something on the fixture"

    # quality dominance across bins
    min_sel_bin = min(r["qbin"] for r in rows)
    all_docs = con.execute(
        rf"""SELECT doc_id,
                    CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
             FROM read_parquet('{sf_dir}/documents.parquet')"""
    ).fetchall()
    con.close()
    # any unselected doc in a bin strictly above min_sel_bin is a bug;
    # recompute bins Spark-side to avoid float drift in the test
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        ECDF_BINS,
        text_quality_score,
    )
    from pyspark.sql import functions as F

    bins = {
        r["doc_id"]: r["qbin"]
        for r in text_quality_score(spark, sf_dir)
        .filter(F.col("quality").isNotNull())
        .select(
            "doc_id",
            F.least(
                F.floor(F.col("quality") * ECDF_BINS).cast("long"),
                F.lit(ECDF_BINS - 1),
            ).alias("qbin"),
        )
        .collect()
    }
    unselected_above = [
        d for d, b in bins.items() if d not in sel_ids and b > min_sel_bin
    ]
    assert unselected_above == []

    # maximality: the smallest-doc_id unselected doc in the straddling
    # bin (if any) would overflow the budget
    tok = dict(all_docs)
    straddle_unsel = sorted(
        d for d, b in bins.items() if d not in sel_ids and b == min_sel_bin
    )
    if straddle_unsel:
        assert sel_tokens + tok[straddle_unsel[0]] > budget
