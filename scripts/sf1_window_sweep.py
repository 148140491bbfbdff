#!/usr/bin/env python
"""Full-window correctness sweep at sf1 (10x the sf0.1 fixture) —
judge r12 item 5: the driver's oracle gate runs at sf0.01, so
scale-dependent drift (df-cap boundary effects, decimal accumulation,
tie plateaus that only appear at cardinality) is invisible to it. This
sweep runs EVERY driver-visible registry entry on a 10x fixture with
the DuckDB oracle side-by-side and the same canonical value compare
the pre-flip sweep uses (bare_window_sweep._canon).

The sf1 fixture is derived deterministically from /root/testdata/sf0.1
(never modified — TESTDATA.md forbids regeneration) by 10 key-shifted
copies, following TPC-H's scaling model:

- region/nation stay FIXED (as in TPC-H at every scale factor);
- customer/supplier/part/orders/lineitem/events scale 10x with
  disjoint key offsets applied consistently to primary AND foreign
  keys, so referential structure and per-key cardinalities are
  preserved (runtimes scale linearly, join fan-outs don't explode);
- documents: copy k rewrites every whitespace token t -> t||'q{k}'
  (the scaling_minhash shingle-bijection trick): each copy reproduces
  the base corpus's near-dup structure in a disjoint shingle universe,
  so pair counts grow EXACTLY linearly instead of quadratically across
  identical copies — and the df-cap / posting-list shapes stay
  realistic;
- embeddings: copy k multiplies the vector by a deterministic per-copy
  ±1 diagonal (numpy rng, fixed seed 12345+k). A sign-flip diagonal is
  an orthogonal transform, so within-copy geometry is BIT-exact
  (flipping a float32's sign bit is lossless) while cross-copy cosines
  are decorrelated to chance. NOTE: decorrelation does NOT make the
  cos>=0.4 dedup graph 10 disjoint copies — cross-copy CHANCE pairs
  (the ~3.2-sigma tail of 64-dim cosines, over 90x the within-copy
  pair chances) percolate the 20k vectors into one giant component, a
  real property of low-threshold similarity graphs at scale (a cyclic
  rotation behaved the same). The two transitive-collapse queries
  therefore use the python union-find oracle (PY_ORACLES below); the
  pair GENERATORS stay DuckDB-checked verbatim.

Both engines read the SAME derived parquet, so the comparison is a
pure engine differential at 10x cardinality.

Usage:
    python scripts/sf1_window_sweep.py [names...]   # default: all 50
Env: HHA_SF1_DIR (default /tmp/hha_sf1), HHA_SCALE_HEAP (default 12g).
DuckDB oracle results are cached under $HHA_SF1_DIR/oracle_cache keyed
by (sql text, fixture bytes) — see the cache block above main(); the
Spark side always executes.
Writes SF1_SWEEP_r16.json next to the repo root (bump per round); exit code = failures.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bare_window_sweep import TABLES, _canon  # noqa: E402

SRC = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get("HHA_SF1_DIR", "/tmp/hha_sf1")
COPIES = 10

# key offsets: each strictly larger than the base table's key range
OFF = {
    "custkey": 100_000,
    "suppkey": 10_000,
    "partkey": 100_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}

_SCALE_SQL = {
    "customer": f"""
        SELECT c_custkey + k*{OFF['custkey']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM base, range({COPIES}) t(k)""",
    "supplier": f"""
        SELECT s_suppkey + k*{OFF['suppkey']} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM base, range({COPIES}) t(k)""",
    "part": f"""
        SELECT p_partkey + k*{OFF['partkey']} AS p_partkey, p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM base, range({COPIES}) t(k)""",
    "orders": f"""
        SELECT o_orderkey + k*{OFF['orderkey']} AS o_orderkey,
               o_custkey + k*{OFF['custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM base, range({COPIES}) t(k)""",
    "lineitem": f"""
        SELECT l_orderkey + k*{OFF['orderkey']} AS l_orderkey,
               l_partkey + k*{OFF['partkey']} AS l_partkey,
               l_suppkey + k*{OFF['suppkey']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM base, range({COPIES}) t(k)""",
    "events": f"""
        SELECT event_id + k*{OFF['event_id']} AS event_id, ts,
               user_id + k*{OFF['user_id']} AS user_id,
               event_type, value, props
        FROM base, range({COPIES}) t(k)""",
    "documents": f"""
        SELECT doc_id + k*{OFF['doc_id']} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE array_to_string(list_transform(
                        str_split(text, ' '),
                        x -> x || 'q' || k::VARCHAR), ' ')
               END AS text,
               lang, source,
               CASE WHEN k = 0 THEN n_chars
                    ELSE length(array_to_string(list_transform(
                        str_split(text, ' '),
                        x -> x || 'q' || k::VARCHAR), ' '))
               END AS n_chars
        FROM base, range({COPIES}) t(k)""",
}


def _build_embeddings(dst: str) -> None:
    """Sign-flip scaling for the embeddings table (see module docstring
    for why a rotation is NOT sufficient here). Done in numpy/pyarrow:
    per-element list surgery is awkward in SQL, and the table is tiny
    (20k rows of DIM floats)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = base.column("vec_id").to_numpy()
    label = base.column("label").to_numpy()
    vecs = np.asarray(base.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    for k in range(COPIES):
        if k == 0:
            flipped = vecs
        else:
            signs = (
                np.random.default_rng(12345 + k).integers(0, 2, dim) * 2 - 1
            ).astype(np.float32)
            flipped = vecs * signs  # float32 * (+-1): exact sign-bit flip
        out_ids.append(vec_id + k * OFF["vec_id"])
        out_vecs.append(flipped)
        out_labels.append(label)
    emb_type = pa.list_(pa.float32())
    table = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            "embedding": pa.array(
                list(np.concatenate(out_vecs)), type=emb_type
            ),
            "label": pa.array(
                np.concatenate(out_labels), type=base.schema.field("label").type
            ),
        }
    )
    pq.write_table(table, dst)


def _src_stamp(t: str) -> str:
    """Identity of the source fixture file: a regenerated sf0.1 (same
    row count, different content — the warc-cache ADVICE class) must
    invalidate the derived table, so key on mtime+size, not counts."""
    st = os.stat(os.path.join(SRC, f"{t}.parquet"))
    return f"{st.st_mtime_ns}:{st.st_size}"


def build_fixture(con) -> None:
    os.makedirs(SF1_DIR, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(SF1_DIR, f"{t}.parquet")
        stamp = os.path.join(SF1_DIR, f"{t}.src_stamp")
        base_n = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        want = base_n if t in ("region", "nation") else base_n * COPIES
        if os.path.exists(dst) and os.path.exists(stamp):
            have = con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')"
            ).fetchone()[0]
            with open(stamp) as f:
                fresh = f.read() == _src_stamp(t)
            if have == want and fresh:
                print(json.dumps({"fixture": t, "rows": have, "cached": True}),
                      flush=True)
                continue
        if t == "embeddings":
            _build_embeddings(dst)
        else:
            sel = _SCALE_SQL.get(t, "SELECT * FROM base")
            con.execute(f"CREATE OR REPLACE VIEW base AS SELECT * FROM "
                        f"read_parquet('{SRC}/{t}.parquet')")
            con.execute(f"COPY ({sel}) TO '{dst}' (FORMAT parquet)")
        with open(stamp, "w") as f:
            f.write(_src_stamp(t))
        print(json.dumps({"fixture": t, "rows": want, "cached": False}),
              flush=True)
    con.execute("DROP VIEW IF EXISTS base")


def _union_find_losers(edges) -> set:
    """Independent reference CC: min-id representative per component,
    losers = every non-representative node. Path-halving union-find —
    O(E α(N)), vs the registry oracle's recursive-CTE closure which
    materializes sum(|component|²) rows."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x for x in parent if find(x) != x}


def _py_oracle_semantic_collapse(con):
    from hadoop_hive_analysis_spark.operators.similarity import (
        DEDUP_EMBEDDING_LSH_SQL,
    )

    pairs = con.execute(DEDUP_EMBEDDING_LSH_SQL).fetchall()
    losers = _union_find_losers((a, b) for a, b, *_ in pairs)
    rows = con.execute(
        "SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings"
    ).fetchall()
    return ["vec_id", "label"], [r for r in rows if r[0] not in losers]


def _py_oracle_ensemble_collapse(con):
    from hadoop_hive_analysis_spark.operators.dedup import (
        DEDUP_MINHASH_LSH_SQL,
    )
    from hadoop_hive_analysis_spark.operators.similarity import (
        DEDUP_EMBEDDING_LSH_SQL,
    )

    edges = [
        (a, b)
        for a, b, *_ in con.execute(DEDUP_MINHASH_LSH_SQL).fetchall()
    ] + [
        (a, b)
        for a, b, *_ in con.execute(DEDUP_EMBEDDING_LSH_SQL).fetchall()
    ]
    losers = _union_find_losers(edges)
    rows = con.execute(
        "SELECT doc_id, lang, source, n_chars FROM documents"
    ).fetchall()
    return (
        ["doc_id", "lang", "source", "n_chars"],
        [r for r in rows if r[0] not in losers],
    )


# The two transitive-collapse queries keep their pair generators
# oracle-checked verbatim (dedup_embedding_lsh / the minhash CTE run in
# DuckDB), but the registry's recursive-CTE closure is infeasible at
# sf1: under the cos>=0.4 dedup threshold the 10x pair graph PERCOLATES
# (cross-copy chance pairs at 90x the within-copy pair chances chain all
# 20k vectors into one component; closure = sum s^2 ~= 400M rows — a
# first run was killed after 25 min in that CTE). Percolation at scale
# is a real property of low-threshold similarity graphs — it's exactly
# why the ENGINE uses star-contraction CC instead of closure. At sf1
# these two queries are checked against an independent python
# union-find differential on the SAME DuckDB-computed edge lists.
PY_ORACLES = {
    "dedup_semantic_collapse": _py_oracle_semantic_collapse,
    "dedup_ensemble_collapse": _py_oracle_ensemble_collapse,
}


# --- DuckDB-oracle result cache (r15) -------------------------------
# Oracle results are a pure function of (oracle SQL text, fixture
# bytes), and some are brutally expensive at sf1 by design — the r15
# sweep measured dedup_semantic_guardrail's oracle at 4097 s (the
# engine's star-contraction answer takes 22 s; grinding the oracle is
# the COST of checking it, not of running it). Caching the canonical
# Counter keyed by sha256(sql) + the derived fixture's file stats makes
# repeat sweeps on an unchanged fixture pay each oracle once per round
# cycle instead of once per run. A cache row never masks an engine
# regression: only the ORACLE side is cached, the Spark side always
# executes, and any fixture or SQL change rotates the key. Results
# carry "oracle_cached": true so an artifact's ~0 s oracle_wall is
# self-explaining. Wipe ``$SF1_DIR/oracle_cache`` to force a recompute.
def _fixture_stamp() -> str:
    import hashlib

    h = hashlib.sha256()
    for t in sorted(TABLES):
        st = os.stat(os.path.join(SF1_DIR, f"{t}.parquet"))
        h.update(f"{t}:{st.st_mtime_ns}:{st.st_size};".encode())
    return h.hexdigest()[:16]


def _canon_src() -> str:
    """Cached Counters embed _canon's OUTPUT, so its source travels
    INSIDE the payload and is validated on load: editing _canon turns
    every stale row into a miss instead of a spurious MISMATCH against
    old-canon oracle tuples. In the payload rather than the filename so
    a canon edit recomputes in place instead of orphaning old files."""
    import inspect

    return inspect.getsource(_canon)


def _oracle_cache_path(name: str, sql: str, stamp: str) -> str:
    import hashlib

    d = os.path.join(SF1_DIR, "oracle_cache")
    os.makedirs(d, exist_ok=True)
    sig = hashlib.sha256(sql.encode()).hexdigest()[:16]
    return os.path.join(d, f"{name}.{stamp}.{sig}.pkl")


def _oracle_cache_load(path: str):
    import pickle

    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
    except (OSError, pickle.PickleError, EOFError):
        return None
    if not isinstance(payload, dict) or payload.get("canon") != _canon_src():
        return None  # stale canon (or pre-v2 row): recompute in place
    return payload["ocols"], payload["o"]


def _oracle_cache_store(path: str, payload) -> None:
    import pickle

    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)  # atomic publish, concurrent-sweep safe
    except Exception:
        # Best-effort by contract: a store failure (OSError OR a
        # PicklingError from an exotic _canon value) must never abort a
        # sweep whose expensive oracle already succeeded.
        try:
            os.unlink(tmp)
        except OSError:
            pass


THIS_ROUND = 18  # keep in sync with the output filename below

# Output-row threshold above which a query's sweep wall is split into
# engine (noop sink) + compare (collect/Counter) halves — judge r17
# item 4 generalized the hand-curated two-entry set to every big-output
# row: above ~10k rows the driver-side canonicalization visibly
# pollutes the wall (doc_tfidf_topterms at sf1: 250k rows, ~9.3 s sweep
# wall with the collect-based compare inside it).
ENGINE_WALL_ROW_THRESHOLD = 10_000

# Hand-pinned engine-walled entries: kept even when rotation rests them
# (judge r16 item 6) so the wall-vs-compare split evidence never drops
# out of the artifact. The threshold rule below extends the same split
# to every row whose output size crosses ENGINE_WALL_ROW_THRESHOLD.
ENGINE_WALL_QUERIES = {"events_rolling_stats", "events_share_of_key_total"}

# Replay/harness entries execute their engine work (the stream drain /
# archive round trip) INSIDE spec.fn and return a materialized memory
# table — so their split drains once and reuses the frame, never
# re-running the stream for the compare half.
_REPLAY_PAT = re.compile(r"replay|roundtrip")


def _engine_wall_names() -> set[str]:
    """Every query whose most recent prior-sweep output row count
    exceeds ENGINE_WALL_ROW_THRESHOLD, plus the hand-pinned set. Names
    with no prior artifact data fall back to the post-collect split in
    the main loop (their first sweep measures rows, the split engages
    the same run)."""
    import glob
    import re

    out = set(ENGINE_WALL_QUERIES)
    seen: set[str] = set()
    candidates = []
    for p in glob.glob(os.path.join(REPO, "SF1_SWEEP_r*.json")):
        m = re.search(r"SF1_SWEEP_r(\d+)\.json$", p)
        if m and int(m.group(1)) < THIS_ROUND:
            candidates.append((int(m.group(1)), p))
    for _, path in sorted(candidates, reverse=True):  # newest first wins
        try:
            with open(path) as f:
                prior = json.load(f)
        except (OSError, ValueError):
            continue
        for name, r in (prior.get("results") or {}).items():
            if name in seen:
                continue
            seen.add(name)
            if isinstance(r.get("rows"), int) and (
                r["rows"] > ENGINE_WALL_ROW_THRESHOLD
            ):
                out.add(name)
    return out


def _host_speed_factor(results: dict) -> float | None:
    """Median per-query spark-wall ratio vs the newest PRIOR-ROUND sweep
    artifact (judge r15 item 3) — the same calibration bench.py computes
    against BENCH_r*.json, so sweep walls are round-comparable without
    prose adjudication. The r15 sweep ran on a host the judge measured
    at 1.39x the r14 common-query median; this field makes that number
    part of the artifact. The current round's own artifact is excluded:
    a same-round re-run must keep comparing against the previous round,
    not against its own first attempt (the self-referencing-sidecar trap
    the bench flagger documents). Best-effort: no prior, no field."""
    import glob
    import re

    candidates = []
    for p in glob.glob(os.path.join(REPO, "SF1_SWEEP_r*.json")):
        m = re.search(r"SF1_SWEEP_r(\d+)\.json$", p)
        if m and int(m.group(1)) < THIS_ROUND:
            candidates.append((int(m.group(1)), p))
    ratios: list[float] = []
    for _, path in sorted(candidates, reverse=True):
        try:
            with open(path) as f:
                prior = json.load(f)
        except (OSError, ValueError):
            continue
        for name, r in results.items():
            pr = (prior.get("results") or {}).get(name) or {}
            before, now = pr.get("wall"), r.get("wall")
            if (
                isinstance(before, (int, float)) and before > 0
                and isinstance(now, (int, float)) and now > 0
            ):
                ratios.append(now / before)
        if len(ratios) >= 5:
            # Newest prior wins once it yields a STABLE median. Breaking
            # on the first prior with >=1 common query could return None
            # right after a heavy rotation (r16 swapped 20/50 slots) —
            # exactly when cross-round comparability matters most — even
            # though an older artifact has enough common names (advisor
            # r16). Ratios accumulate newest-first, so an older prior
            # only tops up when the newest lacks overlap.
            break
    if len(ratios) < 5:  # too few common names for a stable median
        return None
    return round(sorted(ratios)[len(ratios) // 2], 2)


def main() -> int:
    import duckdb

    from hadoop_hive_analysis_spark.plans.registry import QUERIES
    from hadoop_hive_analysis_spark.session import get_spark

    con = duckdb.connect()
    build_fixture(con)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF1_DIR}/{t}.parquet')"
        )

    from hadoop_hive_analysis_spark.session import release_cached_blocks

    heap = os.environ.get("HHA_SCALE_HEAP", "12g")
    spark = get_spark(
        "hha-sf1-window-sweep", extra_conf={"spark.driver.memory": heap}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warm-up (r18, the bench.py rationale applied here): the
    # FIRST query to touch an executor path pays its one-time costs —
    # codegen JIT, file index, and above all the Python/Arrow worker
    # pool spin-up for mapInPandas kernels. Measured: dedup_embedding_lsh
    # first-run 13.5 s vs 3.9 s warmed; the r18 rotation demoted the ANN
    # entries that used to absorb this early in the pack, which surfaced
    # as a phantom ~2x "regression" on the two LSH rows. Touch the fact
    # table and spin the worker pool once, then release.
    spark.read.parquet(f"{SF1_DIR}/lineitem.parquet").count()
    spark.range(100_000).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    release_cached_blocks(spark)

    # Validate explicit names (the bare_window_sweep.py fix, mirrored —
    # ADVICE r13): a typo'd or rested name must fail loudly, never yield
    # a vacuous '0 failures of 0'. Named rested entries ARE resolvable
    # (targeted at-scale reruns of pytest-parity rows are legitimate);
    # unknown names abort.
    only = set(sys.argv[1:])
    unknown = sorted(n for n in only if n not in QUERIES)
    if unknown:
        raise SystemExit(f"unknown registry entries: {unknown}")
    names = [n for n, s in QUERIES.items()
             if (n in only if only else s.driver)]
    if not only:
        # The engine-walled big-output class stays in the sweep even
        # when rotation rests its members (judge r16 item 6): their
        # wall-vs-compare split is the artifact's evidence that sweep
        # walls measure the engine, and a rotation must not silently
        # drop it.
        names += [n for n in sorted(ENGINE_WALL_QUERIES) if n not in names]
    engine_wall_names = _engine_wall_names()
    results: dict[str, dict] = {}
    failures: list[str] = []
    fixture_stamp = _fixture_stamp()
    for name in names:
        spec = QUERIES[name]
        # Large-output queries (judge r16 item 6): the comparator's
        # collect() + Counter canonicalization of ~1M rows dominated
        # their sweep walls (events_rolling_stats: 20.8 s sweep vs
        # 0.55 s engine) — so for the row-level-output entries the
        # recorded ``wall`` is a separate noop-sink execution (full
        # plan, nothing serialized to the driver: the ENGINE wall) and
        # the collect-based compare runs after it, reported as
        # ``compare_wall``. The compare itself stays the exact Python
        # Counter over _canon: an engine-side SQL value-hash was
        # prototyped and REJECTED as unsound for double columns — Spark
        # canonicalizes double→decimal via the shortest decimal repr
        # while DuckDB scales the raw binary expansion, so
        # CAST(1e13 AS DECIMAL(38,12)) renders '…000000' vs
        # '…000905969664' (pinned in tests/test_sweep_comparator.py);
        # both queries hash bit-identical doubles only through the
        # repr-normalizing Python canon.
        # The two transitive collapses PERCOLATE at 10x (the sweep's
        # own r13 finding) and since r14 their default form refuses a
        # percolated graph (PercolatedGraphError). The sweep verifies
        # the blind collapse MACHINERY against the union-find oracle,
        # so it opts out of the policy guard explicitly.
        def _build(_spec=spec, _name=name):
            if _name in PY_ORACLES:
                return _spec.fn(spark, SF1_DIR, require_clean=False)
            return _spec.fn(spark, SF1_DIR)

        engine_walled = name in engine_wall_names
        is_replay = bool(_REPLAY_PAT.search(name))
        engine_wall = None
        sdf = None
        if engine_walled:
            t0 = time.perf_counter()
            try:
                if is_replay:
                    # drain ONCE: the returned memory-sink table is
                    # already materialized, so the compare below
                    # re-reads it without re-running the stream — and a
                    # memory sink is not checkpoint-backed, so holding
                    # the frame across the split is release-safe
                    sdf = _build()
                    sdf.write.format("noop").mode("overwrite").save()
                else:
                    _build().write.format("noop").mode("overwrite").save()
            except Exception as ex:
                failures.append(name)
                results[name] = {
                    "status": "spark-error",
                    "error": f"{type(ex).__name__}: {str(ex)[:200]}",
                }
                print(f"ERR  {name}: {results[name]['error']}", flush=True)
                release_cached_blocks(spark)
                continue
            engine_wall = round(time.perf_counter() - t0, 2)
            if not is_replay:
                # normal queries re-execute their plan for the compare,
                # so the release is safe; a replay must keep its memory
                # table (and has no lingering checkpoint frame of its
                # own past the drain)
                release_cached_blocks(spark)
        t0 = time.perf_counter()
        try:
            if sdf is None:
                sdf = _build()
            srows = sdf.collect()
            cols = sorted(sdf.columns)
            s = Counter(tuple(_canon(r[c]) for c in cols) for r in srows)
        except Exception as ex:
            failures.append(name)
            results[name] = {"status": "spark-error",
                             "error": f"{type(ex).__name__}: {str(ex)[:200]}"}
            print(f"ERR  {name}: {results[name]['error']}", flush=True)
            release_cached_blocks(spark)  # a failed query must not leak
            continue
        if engine_walled:
            wall, compare_wall = engine_wall, round(
                time.perf_counter() - t0, 2
            )
        else:
            wall, compare_wall = round(time.perf_counter() - t0, 2), None
            if len(srows) > ENGINE_WALL_ROW_THRESHOLD and not is_replay:
                # first sweep of a big-output entry with no prior
                # artifact row count: engage the same split post-hoc
                # (later rounds pre-declare it via _engine_wall_names)
                release_cached_blocks(spark)
                t2 = time.perf_counter()
                try:
                    _build().write.format("noop").mode("overwrite").save()
                    compare_wall = wall
                    wall = round(time.perf_counter() - t2, 2)
                except Exception:
                    pass  # keep the unsplit wall rather than fail the row
        # Deterministic BlockManager release between queries (judge r15
        # item 2): non-eager localCheckpoint blocks from earlier queries
        # otherwise accumulate in the shared JVM and inflate later walls
        # 6-10x vs isolated (r15: dedup_embedding_lsh 42 s in-pack vs
        # 3.3-3.8 s fresh-JVM). Outside the wall window by construction.
        release_cached_blocks(spark)
        if name in PY_ORACLES:
            t1 = time.perf_counter()
            ocols, orows = PY_ORACLES[name](con)
            idx = sorted(range(len(ocols)), key=lambda i: ocols[i])
            o = Counter(
                tuple(_canon(row[i]) for i in idx) for row in orows
            )
            owall = round(time.perf_counter() - t1, 2)
            ok = s == o and cols == sorted(ocols)
            results[name] = {
                "status": "match" if ok else "MISMATCH",
                "oracle": "python union-find differential "
                          "(registry closure CTE infeasible: graph "
                          "percolates at sf1 — see PY_ORACLES comment)",
                "rows": sum(s.values()),
                "wall": wall,
                "oracle_wall": owall,
            }
            if compare_wall is not None:
                results[name]["compare_wall"] = compare_wall
            if not ok:
                failures.append(name)
                results[name]["why"] = (
                    "cols" if cols != sorted(ocols)
                    else f"values ({sum(s.values())} vs {sum(o.values())})"
                )
                print(f"FAIL {name}: {results[name]['why']}", flush=True)
            else:
                print(f"ok   {name}: {sum(s.values())} rows "
                      f"({wall}s spark / {owall}s py-oracle)", flush=True)
            continue
        if spec.oracle is None:
            results[name] = {"status": "rows-only",
                             "rows": sum(s.values()), "wall": wall}
            if compare_wall is not None:
                results[name]["compare_wall"] = compare_wall
            print(f"rows {name}: {sum(s.values())} rows ({wall}s, rows-only)",
                  flush=True)
            continue
        t1 = time.perf_counter()
        cpath = _oracle_cache_path(name, spec.oracle, fixture_stamp)
        cached = _oracle_cache_load(cpath)
        if cached is not None:
            ocols, o = cached
        else:
            try:
                odf = con.execute(spec.oracle).fetch_df()
                ocols = sorted(odf.columns)
                o = Counter(
                    tuple(_canon(v) for v in row)
                    for row in odf[ocols].itertuples(index=False, name=None)
                )
            except Exception as ex:
                failures.append(name)
                results[name] = {"status": "oracle-error",
                                 "error": f"{type(ex).__name__}: {str(ex)[:200]}"}
                print(f"ORACLE-ERR {name}: {results[name]['error']}", flush=True)
                continue
            _oracle_cache_store(
                cpath, {"canon": _canon_src(), "ocols": ocols, "o": o}
            )
        owall = round(time.perf_counter() - t1, 2)
        ok = s == o and cols == ocols
        results[name] = {
            "status": "match" if ok else "MISMATCH",
            "rows": sum(s.values()),
            "wall": wall,
            "oracle_wall": owall,
        }
        if compare_wall is not None:
            results[name]["compare_wall"] = compare_wall
        if cached is not None:
            results[name]["oracle_cached"] = True
        if not ok:
            failures.append(name)
            results[name]["why"] = (
                "cols" if cols != ocols
                else f"values ({sum(s.values())} vs {sum(o.values())} rows)"
            )
            print(f"FAIL {name}: {results[name]['why']}", flush=True)
        else:
            print(f"ok   {name}: {sum(s.values())} rows "
                  f"({wall}s spark / {owall}s duckdb)", flush=True)

    out = {
        "sf": "sf1 (10x sf0.1, derived — see scripts/sf1_window_sweep.py)",
        "fixture_dir": SF1_DIR,
        "window": len(names),
        "failures": failures,
        "results": results,
    }
    factor = _host_speed_factor(results)
    if factor is not None:
        out["host_speed_factor"] = factor
    if not only:  # partial reruns must not overwrite the full artifact
        with open(
            os.path.join(REPO, f"SF1_SWEEP_r{THIS_ROUND}.json"), "w"
        ) as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(f"\n{len(failures)} failures of {len(names)}", flush=True)
    if failures:
        print("failed:", failures, flush=True)
    spark.stop()
    return len(failures)


if __name__ == "__main__":
    raise SystemExit(main())
