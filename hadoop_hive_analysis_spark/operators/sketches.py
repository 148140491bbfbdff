"""Sketch-based profiling — the 100 TB answer to the reference's EDA.

The reference profiled its data with exact COUNT/COUNT DISTINCT/MIN/MAX
HiveQL passes (CS346 Report.pdf p.6-7 §3.2-3.4). At 100 TB exact distinct
counts are a full shuffle of every key; sketches answer the same
questions in one streaming pass with bounded memory:

* ``approx_count_distinct`` — HyperLogLog++, mergeable across partitions;
* ``approx_percentile`` — quantile sketch for value distributions;
* ``hll_sketch_agg``/``hll_union_agg`` (Spark ≥3.5 datasketches) — the
  re-aggregatable form: per-partition/day sketches stored, unioned at
  query time instead of rescanning.

Estimates are engine-specific (HLL implementations differ), so these are
rows-only driver checks; the TESTS pin the estimates against exact counts
with the sketches' error bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def eda_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass sketch profile of lineitem: the reference's §3 EDA table,
    scale-ready.

    Output schema is all-scalar by contract: the driver's canonicalizer
    hashes values column-wise and array cells don't hash, so the single
    quantile sketch is computed once (one ``approx_percentile(…, array)``
    aggregate) and its elements projected to three scalar columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct("l_partkey").alias("apx_parts"),
        F.approx_count_distinct("l_suppkey").alias("apx_suppliers"),
        F.approx_count_distinct("l_orderkey").alias("apx_orders"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99))").alias(
            "pcts"
        ),
    )
    return agg.select(
        "n_rows",
        "apx_parts",
        "apx_suppliers",
        "apx_orders",
        "min_shipdate",
        "max_shipdate",
        F.col("pcts")[0].alias("price_p50"),
        F.col("pcts")[1].alias("price_p95"),
        F.col("pcts")[2].alias("price_p99"),
    )


# HLL++ default lgConfigK=12 → relative std error ≈ 1.04/sqrt(4096) ≈ 1.6%;
# 5% is a ≈3σ acceptance bound, and small daily cardinalities sit in the
# sketch's exact sparse mode anyway.
HLL_REL_BOUND = 0.05


def daily_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counting: per-day HLL sketches of event
    users, then a union-merge for the period total WITHOUT rescanning —
    the pattern for incremental 100 TB rollups (store the binary sketch
    per partition, merge at query time).

    Driver-checkable contract: HLL estimates are engine-specific, so the
    hashed output carries the EXACT distinct count plus a boolean that the
    sketch estimate lands within ``HLL_REL_BOUND`` of it — the oracle
    asserts TRUE, so a drifting sketch fails the hash, not just a test.
    (The exact count exists only to judge the sketch; a production rollup
    would store/merge the sketches alone.)
    """
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))

    def within(est: Column, exact: Column) -> Column:
        return F.abs(est.cast("double") - exact) <= exact * F.lit(HLL_REL_BOUND)

    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").cast("bigint").alias("n_exact_users"),
    )
    per_day = daily.select(
        "day",
        "n_exact_users",
        within(F.hll_sketch_estimate("sketch"), F.col("n_exact_users")).alias(
            "hll_within_bound"
        ),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("apx_total")
    )
    total = (
        ev.agg(F.countDistinct("user_id").cast("bigint").alias("n_exact_users"))
        .crossJoin(merged)
        .select(
            F.lit(None).cast("date").alias("day"),
            "n_exact_users",
            # empty events → apx_total NULL → within() NULL, but the
            # oracle's literal TRUE must still match: vacuously in bound
            F.coalesce(
                within(F.col("apx_total"), F.col("n_exact_users")),
                F.lit(True),
            ).alias("hll_within_bound"),
        )
    )
    return per_day.unionByName(total)


DAILY_DISTINCT_USERS_HLL_SQL = """
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users,
           TRUE AS hll_within_bound
    FROM events
    GROUP BY 1
    UNION ALL
    SELECT CAST(NULL AS DATE) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users,
           TRUE AS hll_within_bound
    FROM events
"""


# ------------------------------------------------ quantile sketch (KLL-style)

QUANTILE_PS = (0.5, 0.9, 0.99)
PCTL_ACC = 1000  # approx_percentile accuracy ⇒ rank error ≤ n/PCTL_ACC
# acceptance bound: 3x the sketch's guaranteed rank error, floor of 3 rows
# so tiny groups (where 3x n/1000 rounds to 0) still have slack for ties.
_BOUND = f"greatest(CAST(3 AS BIGINT), (n * 3) DIV {PCTL_ACC})"


def price_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group value-distribution profile via a quantile sketch, hash-
    checkable like the HLL row: exact discrete percentiles (rank
    ``floor(p·(n-1))+1`` in cents) plus a boolean that the sketch's
    answer lands within 3x its guaranteed rank error of the target rank.

    ``approx_percentile`` (Greenwald-Khanna) is the 100 TB path: one
    streaming pass, mergeable partials, no per-group sort. The EXACT side
    (window sort per group) exists only to judge the sketch — the same
    contract as :func:`daily_distinct_users_hll`, where countDistinct
    judges the HLL. Rank check uses the tie-safe interval
    ``[count(<v)+1, count(<=v)]``: a returned value's admissible ranks
    must intersect ``target ± bound`` — exact integer arithmetic, no
    float tolerance in the hashed output.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    ps = ", ".join(str(p) for p in QUANTILE_PS)
    stats = li.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.expr(f"approx_percentile(cents, array({ps}), {PCTL_ACC})").alias("pa"),
    )
    ranked = li.join(F.broadcast(stats), "flag")
    checks = ranked.groupBy("flag").agg(
        *[
            F.sum((F.col("cents") < F.col("pa")[i]).cast("long")).alias(f"lt_{i}")
            for i in range(len(QUANTILE_PS))
        ],
        *[
            F.sum((F.col("cents") <= F.col("pa")[i]).cast("long")).alias(f"le_{i}")
            for i in range(len(QUANTILE_PS))
        ],
    )

    def k_of(p: float) -> str:
        return f"CAST(floor({p} * (n - 1)) AS BIGINT) + 1"

    w = Window.partitionBy("flag").orderBy("cents")
    exact = (
        li.join(F.broadcast(stats.select("flag", "n")), "flag")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.expr(" OR ".join(f"rn = {k_of(p)}" for p in QUANTILE_PS)))
        .groupBy("flag", "n")
        .agg(
            *[
                F.max(
                    F.expr(f"CASE WHEN rn = {k_of(p)} THEN cents END")
                ).alias(f"e_{i}")
                for i, p in enumerate(QUANTILE_PS)
            ]
        )
    )
    ok = " AND ".join(
        f"(lt_{i} + 1 <= {k_of(p)} + {_BOUND} AND le_{i} >= {k_of(p)} - {_BOUND})"
        for i, p in enumerate(QUANTILE_PS)
    )
    return (
        exact.join(checks, "flag")
        .select(
            "flag",
            "n",
            (F.col("e_0") / F.lit(100.0)).alias("p50"),
            (F.col("e_1") / F.lit(100.0)).alias("p90"),
            (F.col("e_2") / F.lit(100.0)).alias("p99"),
            F.expr(ok).alias("sketch_ok"),
        )
        .orderBy("flag")
    )


def _quantiles_sql() -> str:
    exacts = ", ".join(
        f"CAST(max(CASE WHEN r.rn = CAST(floor({p} * (n.n - 1)) AS BIGINT) + 1 "
        f"THEN r.cents END) AS DOUBLE) / 100 AS p{int(p * 100)}"
        for p in QUANTILE_PS
    )
    return f"""
        WITH c AS (
            SELECT l_returnflag AS flag,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
            FROM lineitem
        ),
        n AS (SELECT flag, count(*) AS n FROM c GROUP BY flag),
        r AS (
            SELECT flag, cents,
                   row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn
            FROM c
        )
        SELECT n.flag, n.n, {exacts}, TRUE AS sketch_ok
        FROM r JOIN n ON r.flag = n.flag
        GROUP BY n.flag, n.n
        ORDER BY 1
    """


PRICE_QUANTILES_SQL = _quantiles_sql()


# ------------------------------------------- Misra-Gries heavy hitters

# Counters kept per partition summary. The candidate-superset guarantee
# (Misra-Gries 1982; mergeable form Agarwal et al., PODS 2012) is: any
# token whose PARTITION count exceeds n_i/(MG_K+1) survives that
# partition's summary, so any token whose GLOBAL count exceeds
# n/(MG_K+1) survives in at least one partition (pigeonhole). The
# report threshold 1/HH_PHI_DEN must therefore be >= 1/(MG_K+1).
MG_K = 64
HH_PHI_DEN = 50  # report tokens with share > 1/50 = 2% of the corpus
assert HH_PHI_DEN <= MG_K + 1, "MG candidate set would not cover threshold"


def _mg_merge_batch(counts: dict, vc) -> dict:
    """Merge one Arrow batch's exact value_counts into a running
    Misra-Gries summary, then compress back to ``MG_K`` counters by
    subtracting the (MG_K+1)-th largest count (the mergeable-summaries
    compress step: decrement-all is the classic MG step applied in
    bulk; error stays <= n_seen/(MG_K+1))."""
    for tok, c in vc.items():
        counts[tok] = counts.get(tok, 0) + int(c)
    if len(counts) > MG_K:
        import numpy as np

        kth = np.partition(
            np.fromiter(counts.values(), dtype="int64"), -(MG_K + 1)
        )[-(MG_K + 1)]
        counts = {t: c - kth for t, c in counts.items() if c > kth}
    return counts


def doc_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus heavy hitters (tokens with > 1/HH_PHI_DEN share) via
    a two-phase Misra-Gries candidate pass — the bounded-memory answer
    to "what are the hot tokens" when the distinct-token universe is too
    large for a plain groupBy's hash tables at 100 TB.

    Phase 1 streams each partition once through an ``MG_K``-counter
    Misra-Gries summary (Arrow ``mapInPandas``; per batch an exact
    vectorized ``value_counts`` is folded into the summary and
    compressed — no per-row Python). Each partition emits at most
    ``MG_K`` candidate tokens, so the candidate set is tiny and
    broadcast. Phase 2 recounts ONLY the candidates exactly (broadcast
    semi-join, then one partial-aggregated shuffle bounded by
    |candidates|) and applies the exact integer threshold
    ``cnt * HH_PHI_DEN > n``. Because the MG guarantee makes the
    candidate set a superset of the true heavy hitters and phase 2 is
    exact, the OUTPUT is exactly the true heavy-hitter set — fully
    SQL-expressible, so the oracle is a plain GROUP BY ... HAVING.

    Scale shape: corpus tokenized twice (candidate pass + recount;
    both map-side only until the |candidates|-bounded final agg —
    at 100 TB that is two streaming scans and a kilobyte-scale
    shuffle, vs. a full distinct-token shuffle for the naive plan).
    ``share`` is one IEEE division of exact int64s — bit-identical
    across engines.
    """
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    ex = d.select(F.explode(tokens("text")).alias("tok")).localCheckpoint(
        eager=False
    )

    # The closure must be SELF-CONTAINED (executors can't import this
    # package when the driver runs from a foreign cwd — cloudpickle
    # pickles module functions by reference); the logic is duplicated
    # from _mg_merge_batch and pinned identical by
    # test_mg_closure_matches_module.
    mg_k = MG_K

    def mg_candidates(batches):
        import numpy as np
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for tok, c in pdf["tok"].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
            if len(counts) > mg_k:
                kth = np.partition(
                    np.fromiter(counts.values(), dtype="int64"), -(mg_k + 1)
                )[-(mg_k + 1)]
                counts = {t: c - kth for t, c in counts.items() if c > kth}
        yield pd.DataFrame({"tok": list(counts.keys())})

    cand = ex.mapInPandas(mg_candidates, "tok string").distinct()
    totals = ex.agg(F.count("*").alias("n"))
    return (
        ex.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") * HH_PHI_DEN > F.col("n"))
        .select(
            "tok",
            "cnt",
            "n",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias(
                "share"
            ),
        )
    )


DOC_HEAVY_HITTERS_SQL = rf"""
    WITH ex AS (
        SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM ex),
    c AS (SELECT tok, count(*) AS cnt FROM ex GROUP BY tok)
    SELECT tok,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(n AS BIGINT) AS n,
           CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS share
    FROM c, tot
    WHERE cnt * {HH_PHI_DEN} > n
"""
