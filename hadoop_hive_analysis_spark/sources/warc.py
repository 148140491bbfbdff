"""WARC ingestion — Common Crawl's archive format, the canonical raw
source of an LLM text corpus — as a Spark 4 Python DataSource.

Why a Python data source and not mapInPandas over binaryFile: the
DataSource API gives the format a real reader contract — schema,
partition planning (one partition per archive, because ``.warc.gz``
members are not split-safe at arbitrary offsets), and
``spark.read.format("warc")`` ergonomics — while the parsing itself
stays stdlib (WARC/1.0 header block + Content-Length-framed payload,
RFC-style CRLF framing; gzip handled transparently per file).

Scale shape: Common Crawl ships ~1 GB .warc.gz archives by the
hundred-thousand; file-per-partition is exactly the right granularity
(the archive IS the split unit), and the reader streams records — no
archive is ever materialized whole. Malformed records quarantine into
``warc_type='__error__'`` rows carrying the reason, per this engine's
dirty-input convention (CS346 Report Fig. 2 classes; see
``sources/csv.py`` and ``sources/jsonl.py``).

The DataSource class is constructed inside a factory so cloudpickle
ships it BY VALUE — executor workers never import this package (the
same self-containment rule every mapInPandas closure here follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_no long, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary, error string"
)


def make_warc_datasource():
    """Build the WarcDataSource class (local scope → pickled by value)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class WarcFilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class WarcReader(DataSourceReader):
        def __init__(self, options):
            self.options = options

        def partitions(self):
            # One partition per archive: .warc.gz members are not
            # split-safe mid-file, and CC archives are ~1 GB by design.
            import glob
            import os

            path = self.options.get("path")
            if path is None:
                raise ValueError("warc source requires a path")
            if os.path.isdir(path):
                files = sorted(
                    glob.glob(os.path.join(path, "*.warc"))
                    + glob.glob(os.path.join(path, "*.warc.gz"))
                )
            else:
                files = sorted(glob.glob(path)) or [path]
            # Canonicalize ONCE, on the driver: identity must not depend
            # on how the user spelled the path, and resolving on the
            # executors instead would make it depend on each worker's
            # symlink/mount topology (automounted corpora).
            return [WarcFilePartition(os.path.realpath(f)) for f in files]

        def read(self, partition):
            import gzip
            import io
            import zlib

            path = partition.path
            # partition.path is already driver-canonicalized (see
            # partitions()); executors use it VERBATIM — a per-worker
            # realpath here would make doc identity depend on each
            # host's symlink/mount topology (automounted corpora).
            base = path
            opener = gzip.open if path.endswith(".gz") else open
            try:
                yield from self._records(opener, path, base, io)
            except (EOFError, OSError, gzip.BadGzipFile, zlib.error) as ex:
                # gzip-level corruption (member cut mid-stream, bad CRC)
                # surfaces from ANY read call — quarantine the archive
                # as an error row instead of failing the task: one bad
                # archive among 100k must not poison the job.
                yield (
                    base, -1, "__error__", None, None, None, None, None,
                    f"archive-level read error: {str(ex)[:150]}",
                )

        def _records(self, opener, path, base, io):
            with opener(path, "rb") as raw:
                stream = io.BufferedReader(raw)
                rec_no = 0
                while True:
                    # skip inter-record blank lines
                    line = stream.readline()
                    if not line:
                        return
                    if line.strip() == b"":
                        continue
                    if not line.startswith(b"WARC/"):
                        yield (
                            base, rec_no, "__error__", None, None, None,
                            None, None,
                            f"expected WARC/ version line, got {line[:40]!r}",
                        )
                        return  # framing lost — stop this archive
                    headers = {}
                    ok = True
                    while True:
                        h = stream.readline()
                        if not h:
                            ok = False
                            err = "truncated header block"
                            break
                        if h.strip() == b"":
                            break
                        if b":" not in h:
                            ok = False
                            err = f"malformed header line {h[:40]!r}"
                            break
                        k, v = h.split(b":", 1)
                        headers[k.strip().lower()] = v.strip()
                    if ok and b"content-length" not in headers:
                        ok, err = False, "missing Content-Length"
                    if not ok:
                        yield (
                            base, rec_no, "__error__", None, None, None,
                            None, None, err,
                        )
                        return
                    try:
                        n = int(headers[b"content-length"])
                    except ValueError:
                        yield (
                            base, rec_no, "__error__", None, None, None,
                            None, None,
                            f"bad Content-Length "
                            f"{headers[b'content-length'][:20]!r}",
                        )
                        return
                    payload = stream.read(n)
                    if len(payload) != n:
                        yield (
                            base, rec_no, "__error__", None, None, None,
                            None, None,
                            f"truncated payload: want {n}, got {len(payload)}",
                        )
                        return

                    def dec(key):
                        v = headers.get(key)
                        return v.decode("utf-8", "replace") if v is not None else None

                    yield (
                        base,
                        rec_no,
                        dec(b"warc-type"),
                        dec(b"warc-target-uri"),
                        dec(b"warc-date"),
                        dec(b"content-type"),
                        n,
                        payload,
                        None,
                    )
                    rec_no += 1

    class WarcDataSource(DataSource):
        @classmethod
        def name(cls):
            return "warc"

        def schema(self):
            return WARC_SCHEMA

        def reader(self, schema):
            return WarcReader(self.options)

    return WarcDataSource


def register_warc_source(spark: SparkSession) -> None:
    spark.dataSource.register(make_warc_datasource())


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.format("warc")`` over a file, glob, or directory."""
    register_warc_source(spark)
    return spark.read.format("warc").option("path", path).load()


# HTTP-message body extraction over the decoded payload column `_txt`:
# strip the status line + header block at the first blank line when the
# record is an HTTP message by Content-Type or by status-line sniff.
# The blank line is the EARLIEST of CRLFCRLF (RFC 9112) and bare LFLF
# (sloppy servers) — fixed CRLF-first precedence would mis-split an
# LF-framed header block whose *body* contains "\r\n\r\n" later on.
# (A pure-CRLF message contains no bare "\n\n" at all, so the lf=0 arm
# of the comparison selects the CRLF split there.) The sniff
# requires a real status line (HTTP/x[.y] SP 3-digit status), not just a
# "HTTP/" prefix, so bare-body records that legitimately start with
# "HTTP/" are left intact. Pure codegen (locate + substring + rlike).
_HTTP_BODY_CASE = """
    CASE WHEN (content_type LIKE '%application/http%'
               OR _txt RLIKE '^HTTP/[.0-9]+ [0-9]{3}')
         THEN CASE
             WHEN locate('\r\n\r\n', _txt) > 0
                  AND (locate('\n\n', _txt) = 0
                       OR locate('\r\n\r\n', _txt) <= locate('\n\n', _txt))
                 THEN substring(_txt, locate('\r\n\r\n', _txt) + 4)
             WHEN locate('\n\n', _txt) > 0
                 THEN substring(_txt, locate('\n\n', _txt) + 2)
             ELSE _txt END
         ELSE _txt END
"""


def warc_to_documents(spark: SparkSession, path: str) -> DataFrame:
    """Landing projection: response records → the engine's documents
    shape (doc_id from a stable hash of (file, record), text decoded
    permissively, source = archive name). The one-time conversion runs
    once per archive and everything downstream is columnar — the same
    landing discipline as ``jsonl_to_parquet``.

    A real WARC ``response`` record's payload is a full HTTP message
    (status line + headers + CRLFCRLF + body), not the bare body — on
    actual Common Crawl archives the headers would otherwise leak into
    ``text``. When the record's Content-Type says ``application/http``
    or the decoded payload starts with ``HTTP/``, the header block is
    stripped at the first blank line (CRLF framing per RFC 9112, with a
    bare-LF fallback for sloppy servers). Pure codegen — locate +
    substring, no Python in the path."""
    from pyspark.sql import functions as F

    w = read_warc(spark, path)
    body = _HTTP_BODY_CASE
    return (
        w.filter(F.col("warc_type") == "response")
        .withColumn("_txt", F.decode(F.col("payload"), "UTF-8"))
        .select(
            F.xxhash64("warc_file", "record_no").alias("doc_id"),
            F.expr(body).alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.col("warc_file").alias("source"),
            F.length(F.expr(body)).cast("long").alias("n_chars"),
        )
    )


# ------------------------------------------- end-to-end ingest round trip

# per-session archive cache for warc_corpus_roundtrip, keyed by
# (sf_dir, documents-file mtime+size): a regenerated fixture within one
# session invalidates the cache instead of silently reusing a stale
# archive (ADVICE r9); the isdir re-check below handles external /tmp
# pruning.
_ROUNDTRIP_DIRS: dict[tuple, str] = {}


def _roundtrip_cache_key(sf_dir: str) -> tuple:
    import os

    doc = os.path.join(sf_dir, "documents.parquet")
    try:
        if os.path.isdir(doc):
            # Directory-style table: the directory's own stat does NOT
            # change when a part file is rewritten in place under the
            # same name (ADVICE r10), so fold the part files' stats into
            # the key instead of the directory's. Walk RECURSIVELY
            # (ADVICE r11): a hive-partitioned layout rewrites part
            # files inside key=value subdirectories.
            mtime, size = 0, 0
            for root, _dirs, files in os.walk(doc, followlinks=False):
                for fname in files:
                    # A dangling symlink or a file removed mid-walk
                    # (e.g. Spark pruning .crc/_temporary while we key)
                    # must not abort the key computation (ADVICE r12) —
                    # skip it; the surviving files still key the cache.
                    try:
                        st = os.stat(os.path.join(root, fname))
                    except OSError:
                        continue
                    mtime = max(mtime, st.st_mtime_ns)
                    size += st.st_size
            return (sf_dir, mtime, size)
        st = os.stat(doc)
        return (sf_dir, st.st_mtime_ns, st.st_size)
    except OSError:  # genuinely missing: fall back to path-only key
        return (sf_dir, None, None)


def write_corpus_as_warc(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Render the ``documents`` table as HTTP-framed WARC archives — one
    archive per partition (the archive IS the split unit, mirroring how
    Common Crawl ships), written DISTRIBUTED via mapPartitionsWithIndex
    (one of the rare justified RDD uses: per-partition imperative file
    IO). Every document becomes a ``response`` record whose payload is a
    full HTTP message wrapping the text in non-trivial HTML (a script
    subtree + body), and whose WARC-Target-URI carries the doc_id so the
    ingest side can recover identity without trusting file layout. Even
    partitions write plain ``.warc``, odd partitions ``.warc.gz``, so a
    round trip exercises both codecs. Returns the number of records
    written. Closure is stdlib-only (self-containment rule)."""
    import os

    from ..sources.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if docs.rdd.getNumPartitions() < 2:
        # tiny fixtures land in one partition — force two so every
        # round trip exercises both codecs (even→plain, odd→gzip)
        docs = docs.repartition(2)

    def write_part(idx, rows):
        import gzip
        import io
        import os

        buf = io.BytesIO()
        n = 0
        for row in rows:
            # head carries a script subtree (stripped as a SUBTREE, not
            # just tags) but no text content — title text would survive
            # stripping and break byte parity with the unwrapped text
            html = (
                "<html><head>"
                "<script>var tracking = 1;</script></head>\n<body>\n"
                + (row.text or "")
                + "\n</body></html>"
            ).encode("utf-8")
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                b"charset=utf-8\r\n\r\n" + html
            )
            buf.write(
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: http://corpus/{row.doc_id}\r\n".encode()
                + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
                b"Content-Type: application/http; msgtype=response\r\n"
                + f"Content-Length: {len(http)}\r\n".encode()
                + b"\r\n" + http + b"\r\n\r\n"
            )
            n += 1
        if n:
            data = buf.getvalue()
            if idx % 2:
                path = os.path.join(out_dir, f"part-{idx:05d}.warc.gz")
                with gzip.open(path, "wb") as f:
                    f.write(data)
            else:
                path = os.path.join(out_dir, f"part-{idx:05d}.warc")
                with open(path, "wb") as f:
                    f.write(data)
        yield n

    return sum(docs.rdd.mapPartitionsWithIndex(write_part).collect())


def warc_ingest_documents(spark: SparkSession, path: str) -> DataFrame:
    """The full Common Crawl-shaped ingest: WARC DataSource scan →
    response filter → HTTP header-block strip → HTML boilerplate strip →
    documents projection, with doc_id recovered from the corpus
    Target-URI scheme (falling back to the (file, record) hash for
    foreign archives). One declarative plan, zero Python in the
    transform path — the DataSource yields rows, everything after is
    codegen."""
    from pyspark.sql import functions as F

    from ..operators.text_pipeline import html_to_text

    w = read_warc(spark, path)
    return (
        w.filter(F.col("warc_type") == "response")
        .withColumn("_txt", F.decode(F.col("payload"), "UTF-8"))
        .withColumn("_body", F.expr(_HTTP_BODY_CASE))
        .select(
            F.coalesce(
                F.regexp_extract("target_uri", r"^http://corpus/(-?\d+)$", 1)
                .try_cast("long"),
                F.xxhash64("warc_file", "record_no"),
            ).alias("doc_id"),
            html_to_text("_body").alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.col("warc_file").alias("source"),
            F.length(html_to_text("_body")).cast("long").alias("n_chars"),
        )
    )


def warc_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query proving the ingest story END TO END rather than
    per stage: documents → HTTP-framed HTML-wrapped WARC archives
    (distributed write, plain + gzip) → DataSource scan → HTTP strip →
    HTML strip → per-doc (doc_id, n_clean_chars, text_h). The DuckDB
    oracle computes the same projection DIRECTLY from the documents
    table (html_to_text of the raw text — the wrap must round-trip to
    exactly what stripping the unwrapped text yields, so every byte of
    framing, codec, and strip logic is on the hash path).

    Archives land in a per-session temp dir CACHED by (sf_dir, documents
    fixture mtime+size) — the dir
    must outlive this lazy DataFrame, but repeated invocations in one
    long-lived session (bench reruns, plan inspection) must not
    accumulate full corpus copies in /tmp. The archive content is a
    pure function of the sf_dir's documents table, so reuse is safe."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..functions.hashing import h64

    key = _roundtrip_cache_key(sf_dir)
    out = _ROUNDTRIP_DIRS.get(key)
    if out is None or not os.path.isdir(out):
        out = tempfile.mkdtemp(prefix="hha_warc_roundtrip_")
        write_corpus_as_warc(spark, sf_dir, out)
        _ROUNDTRIP_DIRS[key] = out
    ing = warc_ingest_documents(spark, out)
    return ing.select(
        "doc_id",
        F.length("text").cast("long").alias("n_clean_chars"),
        h64("text").alias("text_h"),
    )


def _warc_roundtrip_sql() -> str:
    from ..functions.hashing import h64_sql
    from ..operators.text_pipeline import html_to_text_sql

    clean = html_to_text_sql("text")
    return f"""
    SELECT doc_id,
           CAST(length({clean}) AS BIGINT) AS n_clean_chars,
           {h64_sql(clean)} AS text_h
    FROM documents
"""


WARC_ROUNDTRIP_SQL = _warc_roundtrip_sql()
