"""Source/sink coverage: compressed tab-text sink (SURVEY §2.1 S6),
partitioned parquet sink, and catalog registration (S7)."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from hadoop_hive_analysis_spark.sources.catalog import load_table, register_views
from hadoop_hive_analysis_spark.sources.sinks import write_parquet, write_tab_text


def test_gzip_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    dest = str(tmp_path / "gz")
    write_tab_text(df, dest, compression="gzip")
    lines = []
    for fn in os.listdir(dest):
        if fn.startswith("part-"):
            assert fn.endswith(".gz")
            with gzip.open(os.path.join(dest, fn), "rt") as fh:
                lines += [l.rstrip("\n") for l in fh if l.strip()]
    assert sorted(lines) == ["1\ta", "2\tb"]


def test_partitioned_parquet_sink_prunes(spark, sf_dir, tmp_path):
    """Partitioned layout → date-range scans touch only matching dirs —
    the 100 TB layout for the fact table."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    dest = str(tmp_path / "part")
    write_parquet(li, dest, partition_by=["ship_year"])
    years = {d for d in os.listdir(dest) if d.startswith("ship_year=")}
    assert len(years) >= 3
    back = spark.read.parquet(dest).filter(F.col("ship_year") == 1996)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(ship_year" in plan
    assert back.count() == li.filter(F.year("l_shipdate") == 1996).count()


def test_register_views_exposes_all_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0].n > 0


def test_ddl_catalog_tables_match_loader(spark, sf_dir):
    """CREATE TABLE ... USING parquet LOCATION must expose the same data
    as load_table — including the events nanos→micros view conversion."""
    from hadoop_hive_analysis_spark.sources.catalog import (
        EXT_DB,
        register_external_tables,
    )

    register_external_tables(spark, sf_dir)
    for t in ("lineitem", "supplier"):
        assert (
            spark.sql(f"SELECT count(*) AS n FROM {EXT_DB}.{t}").collect()[0].n
            == load_table(spark, sf_dir, t).count()
        )
    via_view = spark.sql(
        f"SELECT event_id, ts FROM {EXT_DB}.events ORDER BY event_id LIMIT 5"
    ).collect()
    via_loader = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts")
        .orderBy("event_id")
        .limit(5)
        .collect()
    )
    assert via_view == via_loader


def test_orc_roundtrip_pushdown_and_pruning(spark, sf_dir, tmp_path):
    """ORC sink/scan: values roundtrip exactly (timestamps included),
    partitioned layout prunes at planning time, and a filter over an
    unpartitioned ORC table reaches the scan as a pushed filter."""
    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.sources.catalog import load_table
    from hadoop_hive_analysis_spark.sources.sinks import read_orc, write_orc

    ev = load_table(spark, sf_dir, "events")
    p = str(tmp_path / "events_orc")
    write_orc(ev, p)
    back = read_orc(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))

    # pushed filter visible in the scan node
    plan = (
        back.filter(F.col("event_type") == "click")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "event_type" in plan.split("PushedFilters")[1][:120]

    # partitioned layout prunes directories
    pp = str(tmp_path / "events_orc_bytype")
    write_orc(ev.withColumn("et", F.col("event_type")), pp, partition_by=["et"])
    pruned = spark.read.orc(pp).filter(F.col("et") == "click")
    files = {
        r.f.split("et=")[1].split("/")[0]
        for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files == {"click"}


def test_schema_evolution_mixed_generation_read(spark, tmp_path):
    """A 100 TB lake accretes columns across ingest generations. The
    declared-schema read must tolerate a directory mixing an OLD
    generation (written before a column existed) with a new one: the
    missing column surfaces as NULL on old rows, is populated on new
    rows, and filter pushdown on a shared column still works. Pins the
    contract _read_with_declared relies on Spark for — if a Spark
    upgrade turns this into a hard error, this canary names it."""
    import pandas as pd

    from hadoop_hive_analysis_spark.sources.catalog import load_table

    d = tmp_path / "evolved"
    (d / "documents.parquet").mkdir(parents=True)
    # generation 1: before n_chars existed
    pd.DataFrame(
        {"doc_id": [1, 2], "text": ["old alpha", "old beta"],
         "lang": ["en", "en"], "source": ["gen1", "gen1"]}
    ).to_parquet(str(d / "documents.parquet" / "part-gen1.parquet"))
    # generation 2: full current schema
    pd.DataFrame(
        {"doc_id": [3], "text": ["new gamma"], "lang": ["de"],
         "source": ["gen2"], "n_chars": [9]}
    ).to_parquet(str(d / "documents.parquet" / "part-gen2.parquet"))

    out = {r["doc_id"]: r for r in load_table(spark, str(d), "documents").collect()}
    assert len(out) == 3
    assert out[1]["n_chars"] is None and out[2]["n_chars"] is None
    assert out[3]["n_chars"] == 9
    # pushdown on a column both generations share still returns both
    got = (
        load_table(spark, str(d), "documents")
        .filter("source = 'gen1'")
        .count()
    )
    assert got == 2


def test_orc_roundtrip_and_operator_parity(spark, sf_dir, tmp_path):
    """ORC as an interchange format: the documents table written as ORC
    and read back must be byte-identical, and an operator run over an
    ORC-landed corpus (converted to the parquet layout the engine
    standardizes on) must hash-match the parquet-native run — the same
    'land once, run columnar' migration contract as jsonl_to_parquet."""
    from hadoop_hive_analysis_spark.operators.text_analysis import (
        text_token_stats,
    )
    from hadoop_hive_analysis_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    orc_dir = str(tmp_path / "docs_orc")
    docs.write.orc(orc_dir)

    back = spark.read.orc(orc_dir)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in docs.collect()
    )

    # land the ORC corpus into the engine's parquet layout and run an op
    landed = tmp_path / "landed"
    landed.mkdir()
    back.coalesce(1).write.parquet(str(landed / "documents.parquet"))
    got = sorted(
        tuple(r) for r in text_token_stats(spark, str(landed)).collect()
    )
    want = sorted(tuple(r) for r in text_token_stats(spark, sf_dir).collect())
    assert got == want


def test_every_operator_module_imports_standalone():
    """Import-order canary: every operator module must import cleanly as
    the FIRST import of the package (regression: an eager module-level
    SQL builder in text_pipeline re-entered partially-initialized
    text_analysis through dedup's init — visible only from one import
    order, which pytest's registry-first collection masked)."""
    import subprocess
    import sys

    mods = [
        "text_pipeline", "retrieval", "components", "bpe", "similarity",
        "events", "multimodal", "vectors", "dedup", "text_analysis",
        "core", "rollups", "skew", "sketches", "asof",
    ]
    for m in mods:
        r = subprocess.run(
            [sys.executable, "-c",
             f"import hadoop_hive_analysis_spark.operators.{m}"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, f"{m}: {r.stderr[-500:]}"


def test_expectations_report_counts_planted_violations(spark, tmp_path):
    """Each rule catches exactly its planted violation class; clean rows
    pass everything; ppm arithmetic is exact."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_hive_analysis_spark.operators.events import (
        events_expectations_report,
    )

    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # clean
        (1, ts, 10, "view", 1.0, '{"k":1}'),
        (2, ts, 11, "click", 0.0, None),
        # violations, one class each
        (None, ts, 12, "view", 1.0, None),          # event_id null
        (4, None, 13, "purchase", 1.0, None),       # ts null
        (5, ts, -7, "view", 1.0, None),             # negative user
        (6, ts, 14, "weird_type", 1.0, None),       # out of domain
        (7, ts, 15, "view", -2.5, None),            # negative value
        (8, ts, 16, "view", 1.0, "not json"),       # malformed props
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    d = tmp_path / "expect"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    out = {r["rule"]: r for r in events_expectations_report(spark, str(d)).collect()}
    want = {
        "event_id_not_null": 1,
        "ts_not_null": 1,
        "user_id_positive": 1,
        "type_in_domain": 1,
        "value_non_negative": 1,
        "props_json_or_null": 1,
    }
    for rule, n in want.items():
        assert out[rule]["n_violations"] == n, rule
        assert out[rule]["n_rows"] == 8
        assert out[rule]["violation_ppm"] == n * 1_000_000 // 8
        assert out[rule]["passed"] is False
