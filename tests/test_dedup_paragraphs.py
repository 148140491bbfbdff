"""Paragraph-level exact dedup (RefinedWeb/MassiveText granularity).

The fixture corpus has no blank-line paragraphs, so these planted
corpora carry the dup/scrub signal (the dHash precedent): duplicated
paragraphs across and within documents, canonical-first retention,
trim normalization, and the all-paragraphs-removed edge.
"""

from __future__ import annotations

import hashlib


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_ROWS = [
    (1, "para one text\n\n\nshared boiler plate\n\npara two"),
    (2, "other intro\n\nshared boiler plate\n\nmore stuff"),
    (3, "shared boiler plate"),
    (4, "  padded  \n\n padded "),
    (5, "unique solo"),
]


def _write(spark, tmp_path):
    # single-file parquet (pandas/pyarrow), matching the driver fixture
    # layout so BOTH Spark and the DuckDB oracle can read the same path
    import pandas as pd

    d = tmp_path / "paras"
    d.mkdir()
    pd.DataFrame(_ROWS, columns=["doc_id", "text"]).to_parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_dedup_paragraphs_planted(spark, tmp_path):
    """Cross-doc and within-doc duplicated paragraphs are counted per
    instance; the canonical (min (doc_id, idx)) instance is never
    removable; \n{2,} splitting and trim normalization apply."""
    from hadoop_hive_analysis_spark.operators.dedup import dedup_paragraphs

    sf = _write(spark, tmp_path)
    out = {r["doc_id"]: r for r in dedup_paragraphs(spark, sf).collect()}
    assert (out[1]["n_paras"], out[1]["n_dup_paras"], out[1]["n_removable"]) == (3, 1, 0)
    assert (out[2]["n_paras"], out[2]["n_dup_paras"], out[2]["n_removable"]) == (3, 1, 1)
    assert (out[3]["n_paras"], out[3]["n_dup_paras"], out[3]["n_removable"]) == (1, 1, 1)
    # doc 4: "  padded  " and " padded " trim to the same paragraph —
    # a within-doc duplicate; the idx-0 instance is canonical
    assert (out[4]["n_paras"], out[4]["n_dup_paras"], out[4]["n_removable"]) == (2, 2, 1)
    assert (out[5]["n_paras"], out[5]["n_dup_paras"]) == (1, 0)
    assert out[4]["dup_ppm"] == 1_000_000
    assert out[1]["dup_ppm"] == 333_333


def test_paragraph_scrub_planted(spark, tmp_path):
    """Scrub keeps exactly the canonical instance of each duplicated
    paragraph, re-assembles with one blank line, and hashes the result
    identically to the reference reassembly (including the empty
    all-removed document)."""
    from hadoop_hive_analysis_spark.operators.dedup import paragraph_scrub

    sf = _write(spark, tmp_path)
    out = {r["doc_id"]: r for r in paragraph_scrub(spark, sf).collect()}
    want = {
        1: "para one text\n\nshared boiler plate\n\npara two",
        2: "other intro\n\nmore stuff",
        3: "",
        4: "padded",
        5: "unique solo",
    }
    for doc_id, clean in want.items():
        assert out[doc_id]["clean_h64"] == _h64(clean), doc_id
        assert out[doc_id]["clean_chars"] == len(clean)
    assert (out[1]["n_kept"], out[1]["n_removed"]) == (3, 0)
    assert (out[2]["n_kept"], out[2]["n_removed"]) == (2, 1)
    assert (out[3]["n_kept"], out[3]["n_removed"]) == (0, 1)
    assert (out[4]["n_kept"], out[4]["n_removed"]) == (1, 1)


def test_paragraph_ops_oracle_parity_on_planted(spark, tmp_path):
    """Both engines agree byte-for-byte on a corpus that actually HAS
    duplicated paragraphs (the fixture run only proves the clean-corpus
    path)."""
    from hadoop_hive_analysis_spark.operators.dedup import (
        DEDUP_PARAGRAPHS_SQL,
        PARAGRAPH_SCRUB_SQL,
        dedup_paragraphs,
        paragraph_scrub,
    )

    from .oracle import assert_matches_oracle

    sf = _write(spark, tmp_path)
    # the oracle helper registers a view per fixture table — point the
    # unused ones at the (tiny) sf0.001 fixtures so binding succeeds
    import shutil

    from .conftest import SF_DIR
    from hadoop_hive_analysis_spark.schemas import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        if t != "documents":
            src = f"{SF_DIR}/{t}.parquet"
            dst = f"{sf}/{t}.parquet"
            (shutil.copytree if __import__("os").path.isdir(src) else shutil.copy)(
                src, dst
            )
    assert_matches_oracle(dedup_paragraphs(spark, sf), DEDUP_PARAGRAPHS_SQL, sf)
    assert_matches_oracle(paragraph_scrub(spark, sf), PARAGRAPH_SCRUB_SQL, sf)
