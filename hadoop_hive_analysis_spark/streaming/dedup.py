"""Streaming ingest dedup — the streaming face of the batch dedup pack.

A training-data pipeline at 100 TB ingests continuously; duplicates
arrive two ways, and each maps to a different Structured Streaming
operator with a different state bound:

* **Content duplicates** (same text from different crawls/sources):
  :func:`streaming_dedup_digests` keys state on the md5 content digest
  with ``dropDuplicates`` — the streaming twin of the batch
  ``dedup_exact`` (``operators/dedup.py``). State is one (small) digest
  row per distinct document, so it grows with corpus cardinality, not
  stream length; for truly unbounded streams, periodically snapshot the
  digest set to parquet and start a fresh query seeded by a stream-static
  anti-join against the snapshot.
* **Retransmissions** (at-least-once sources re-delivering recent rows):
  :func:`streaming_dedup_within_watermark` keys state on the record id
  with ``dropDuplicatesWithinWatermark`` — state is evicted as the
  watermark passes, so it is bounded by (arrival rate × watermark
  horizon) regardless of stream length. This is the exactly-once ingest
  front door; the digest dedup above runs after it.

Both drain under ``Trigger.AvailableNow`` in tests and reproduce the
batch semantics exactly (Kappa guarantee, like ``streaming/events.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_SCHEMAS
from .events import WATERMARK


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (a directory being
    appended to by the crawler; swap for Kafka with the same plan).
    Unlike events (nanos-timestamp workaround), the batch schema is
    directly streamable."""
    return (
        spark.readStream.schema(TESTDATA_SCHEMAS["documents"])
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def streaming_dedup_digests(docs: DataFrame) -> DataFrame:
    """First-seen exact content dedup: emit each distinct content digest
    once, with the doc that introduced it.

    Output is append-mode (a digest row is final the moment it first
    appears). Which duplicate arrives first is an arrival-order fact of
    the stream, so only (digest, n_chars)-level columns are deterministic
    under replay; tests compare the digest set against batch
    ``dedup_exact``.
    """
    return docs.select(
        F.md5("text").alias("digest"), "doc_id", "n_chars"
    ).dropDuplicates(["digest"])


def streaming_dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Retransmission dedup keyed on event_id, state bounded by the
    watermark horizon — duplicates delivered within ``WATERMARK`` of the
    first copy are dropped; state for older ids is evicted instead of
    accumulating forever (the property plain streaming ``dropDuplicates``
    lacks)."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


DOCUMENTS_DEDUP_REPLAY_SQL = """
    SELECT DISTINCT md5(text) AS digest, n_chars FROM documents
"""


def documents_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-ready replay: drain the documents table as a finite stream
    through :func:`streaming_dedup_digests` and return the DETERMINISTIC
    projection of the result — the distinct digest set (+ ``n_chars``,
    which is functionally dependent on the text). ``doc_id`` is dropped:
    which duplicate arrives first is an arrival-order fact of the stream,
    not a property of the data, so it is excluded from the hashed
    contract (same reasoning the docstring above records).

    Oracle: ``SELECT DISTINCT md5(text), n_chars`` — streaming first-seen
    dedup and batch DISTINCT must agree exactly on the surviving set.
    """
    import atexit
    import shutil
    import tempfile
    import uuid

    from .events import run_available_now

    tag = uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix=f"hha_docdedup_ckpt_{tag}_")
    atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
    out = run_available_now(
        streaming_dedup_digests(read_documents_stream(spark, sf_dir)),
        query_name=f"docdedup_replay_{tag}",
        checkpoint_dir=ckpt,
        output_mode="append",
    )
    return out.select("digest", "n_chars")


def snapshot_digests(docs: DataFrame) -> DataFrame:
    """The periodic state snapshot: distinct content digests of the
    corpus so far, written to parquet by a maintenance job. One small row
    per distinct document — the compact form of the streaming query's
    dropDuplicates state."""
    return docs.select(F.md5("text").alias("digest")).distinct()


def streaming_dedup_against_snapshot(
    docs_stream: DataFrame, snapshot: DataFrame
) -> DataFrame:
    """Content dedup for UNBOUNDED streams: the docstring's snapshot
    pattern made concrete. Plain streaming ``dropDuplicates`` state grows
    with corpus cardinality forever; instead, a periodic maintenance job
    persists :func:`snapshot_digests` and the ingest query restarts as

        new-arrivals stream
          -> stream-static LEFT ANTI join against the snapshot
             (duplicates of HISTORY dropped with zero streaming state --
             the static side is just a table, broadcast or shuffled by
             Catalyst like any batch join)
          -> dropDuplicates on digest
             (duplicates WITHIN the new window; state resets to empty at
             each restart, so it is bounded by the snapshot period's
             arrival volume, not corpus history)

    Exactly the rollup/compaction idea applied to dedup state: stream
    state holds only the current window; everything older lives in
    storage in mergeable form.
    """
    return (
        docs_stream.withColumn("digest", F.md5("text"))
        .join(snapshot, "digest", "left_anti")
        .dropDuplicates(["digest"])
    )
