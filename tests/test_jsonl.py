"""JSONL ingest: explicit-schema PERMISSIVE parse with quarantine —
the same dirty-data classes the pipe-CSV ingest pins (Fig. 2), in the
format LLM corpora actually arrive in."""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import functions as F

from hadoop_hive_analysis_spark.sources.catalog import load_table
from hadoop_hive_analysis_spark.sources.jsonl import (
    jsonl_to_parquet,
    read_documents_jsonl,
    write_jsonl,
)


def test_jsonl_roundtrip_exact(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_documents_jsonl(spark, out)
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0


def test_jsonl_gzip_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    out = str(tmp_path / "docs_gz")
    write_jsonl(docs, out, compression="gzip")
    assert glob.glob(f"{out}/*.json.gz"), "gzip codec not applied"
    assert read_documents_jsonl(spark, out).count() == 100


def _write_dirty(tmp_path) -> str:
    """Three Fig.-2 dirty classes: syntactically corrupt line, wrong-type
    field, missing fields — plus two clean lines."""
    lines = [
        json.dumps({"doc_id": 1, "text": "good one", "lang": "en",
                    "source": "s1", "n_chars": 8}),
        '{"doc_id": 2, "text": "truncated...',              # corrupt JSON
        json.dumps({"doc_id": "not_a_number", "text": "bad id type",
                    "lang": "en", "source": "s1", "n_chars": 11}),
        json.dumps({"doc_id": 4, "text": "missing fields ok"}),
        json.dumps({"doc_id": 5, "text": "good two", "lang": "de",
                    "source": "s2", "n_chars": 8}),
    ]
    p = str(tmp_path / "dirty")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_jsonl_dirty_classes_quarantined_not_fatal(spark, tmp_path):
    p = _write_dirty(tmp_path)
    kept = read_documents_jsonl(spark, p)
    # Spark PERMISSIVE semantics, empirically pinned: a syntactically
    # corrupt line AND a type-mismatched record are BOTH flagged in the
    # quarantine column (the latter with its parseable fields retained
    # and the bad field nulled); missing fields are plain NULLs with NO
    # flag. The default reader drops every flagged record — the P7
    # invalid-record-drop contract of the pipe ingest.
    assert {r.doc_id for r in kept.collect()} == {1, 4, 5}
    assert kept.filter(F.col("doc_id").isNull()).count() == 0
    audit = read_documents_jsonl(spark, p, keep_corrupt=True)
    corrupt = sorted(
        audit.filter(F.col("_corrupt_record").isNotNull()).collect(),
        key=lambda r: r._corrupt_record,
    )
    assert len(corrupt) == 2
    assert corrupt[0]._corrupt_record.startswith('{"doc_id": "not_a_number"')
    assert corrupt[0].text == "bad id type" and corrupt[0].doc_id is None
    assert corrupt[1]._corrupt_record.startswith('{"doc_id": 2')


def test_jsonl_to_parquet_with_dead_letter(spark, tmp_path):
    src = _write_dirty(tmp_path)
    dst = str(tmp_path / "clean_parquet")
    dl = str(tmp_path / "dead_letter")
    n_clean, n_corrupt = jsonl_to_parquet(spark, src, dst, dead_letter=dl)
    assert (n_clean, n_corrupt) == (3, 2)
    assert spark.read.parquet(dst).count() == 3
    dead = ""
    for part in glob.glob(f"{dl}/part-*"):
        with open(part) as f:
            dead += f.read()
    assert '{"doc_id": 2' in dead and '"not_a_number"' in dead


def test_jsonl_feeds_the_operator_stack(spark, sf_dir, tmp_path):
    """A JSONL-landed corpus must run the registered operators
    unchanged: convert, then run token stats on the parquet copy and
    match the original table's result."""
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        text_token_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    j = str(tmp_path / "j")
    write_jsonl(docs, j)
    dst_dir = str(tmp_path / "sfdir")
    os.makedirs(dst_dir)
    jsonl_to_parquet(spark, j, os.path.join(dst_dir, "documents.parquet"))
    a = sorted(tuple(r) for r in text_token_stats(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in text_token_stats(spark, dst_dir).collect())
    assert a == b
