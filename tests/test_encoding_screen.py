"""Encoding/script QA screen — planted-corpus detection signal.

The fixture corpus is pure ASCII (clean path only), so these corpora
plant the artifacts the screen exists to catch: U+FFFD replacement
chars, C0/C1 control residue, classic UTF-8-as-Latin-1 mojibake, and
non-Latin scripts — and pin byte-identical Spark/DuckDB agreement on
them.
"""

from __future__ import annotations

_ROWS = [
    (1, "perfectly clean ascii text with words and 123 digits"),
    (2, "broken � here and � there"),  # replacement chars
    (3, "control\x01residue\x9cafter double decode"),  # C0 + C1
    (4, "cafÃ© and â€œquotedâ€"),  # mojibake: Ã©, â€œ, â€
    (5, "привет мир"),  # Cyrillic
    (6, "中文文本 日本語のテスト"),  # CJK incl. kana
    (7, "مرحبا بالعالم"),  # Arabic
    (8, "12345 67890 !!!"),  # no script at all -> 'other'
    (9, "naïve café résumé"),  # legit accented Latin, NOT mojibake
]


def _write(tmp_path):
    import pandas as pd

    d = tmp_path / "enc"
    d.mkdir()
    pd.DataFrame(_ROWS, columns=["doc_id", "text"]).to_parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_encoding_screen_detects_planted_artifacts(spark, tmp_path):
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        text_encoding_screen,
    )

    sf = _write(tmp_path)
    out = {r["doc_id"]: r for r in text_encoding_screen(spark, sf).collect()}

    assert out[1]["clean"] and out[1]["dominant_script"] == "latin"
    assert out[1]["ascii_ppm"] == 1_000_000

    assert out[2]["n_replacement"] == 2 and not out[2]["clean"]
    assert out[3]["n_ctrl"] == 2 and not out[3]["clean"]

    # doc 4: 'Ã©' + 'â€œ' + 'â€' (the '' closer is a C1 control,
    # counted by n_ctrl, and 'â€' matches the mojibake prefix twice)
    assert out[4]["n_mojibake"] >= 2 and not out[4]["clean"]

    assert out[5]["dominant_script"] == "cyrillic"
    assert out[5]["n_cyrillic"] == len("приветмир")
    assert out[6]["dominant_script"] == "cjk"
    assert out[7]["dominant_script"] == "arabic"
    assert out[8]["dominant_script"] == "other"

    # accented Latin must NOT be flagged as mojibake ('Ã' itself absent)
    assert out[9]["clean"] and out[9]["dominant_script"] == "latin"
    assert out[9]["n_mojibake"] == 0
    assert 0 < out[9]["ascii_ppm"] < 1_000_000


def test_encoding_screen_oracle_parity_on_planted(spark, tmp_path):
    """Java regex and RE2 must count every planted artifact class
    identically — the \\x{hhhh} escape set is the shared dialect."""
    import shutil

    from hadoop_hive_analysis_spark.operators.text_analysis import (
        TEXT_ENCODING_SCREEN_SQL,
        text_encoding_screen,
    )
    from hadoop_hive_analysis_spark.schemas import TESTDATA_TABLES

    from .conftest import SF_DIR
    from .oracle import assert_matches_oracle

    sf = _write(tmp_path)
    for t in TESTDATA_TABLES:
        if t != "documents":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{sf}/{t}.parquet")
    assert_matches_oracle(
        text_encoding_screen(spark, sf), TEXT_ENCODING_SCREEN_SQL, sf
    )
