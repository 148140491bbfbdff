"""Core relational operators — the reference's full §2 inventory, Spark-first.

Each function is a thin, composable wrapper over the DataFrame API. The point
is NOT abstraction for its own sake: it pins down the exact semantics the
reference implements (inclusive date bounds, null-key drops, right-outer
coalesce, deterministic top-K) so queries compose from audited pieces, and it
documents the physical plan each piece should produce at scale.

Physical notes (verified via ``.explain("formatted")``, see tests):
* ``project`` + ``date_range_filter`` reach the parquet scan as
  ``PushedFilters`` / pruned ``ReadSchema`` — the Catalyst equivalent of the
  reference's in-mapper projection/predicate
  (``Query 1a/TopKNetProfitDriver.java:61-68``).
* ``grouped_sum`` plans as partial→final ``HashAggregateExec`` — the
  combiner the reference registers by hand (``…Driver.java:214``) is always
  on in Spark.
* ``top_k`` plans as ``TakeOrderedAndProject``: per-partition heap top-K
  merged on the driver — strictly better than the reference's
  single-reducer funnel (``…Driver.java:239``) and safe at any partition
  count because only K·partitions rows move.
* ``right_outer_join_coalesce`` lets Catalyst pick the join strategy; with a
  dimension side under the broadcast threshold it becomes
  ``BroadcastHashJoin`` — the map-side join the reference's authors wanted
  but never built (``CS346 Report.pdf p.12``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """P1-P4: explicit projection → Catalyst column pruning.

    Reference: positional field extraction in every mapper
    (``Query 1a/TopKNetProfitDriver.java:67-68``).
    """
    return df.select(*cols)


def date_range_filter(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """P5: inclusive range predicate ``lo <= col <= hi``.

    Reference: ``saleDate >= startDate && saleDate <= endDate`` with bounds
    injected at runtime (``Query 1a/TopKNetProfitDriver.java:48-49,66``);
    HiveQL ``WHERE ss_sold_date_sk >= … AND <= …``. Pushed down to the scan;
    on a date-partitioned table this also prunes partitions.
    """
    c = F.col(col)
    return df.filter((c >= F.lit(lo)) & (c <= F.lit(hi)))


def not_null(df: DataFrame, *cols: str) -> DataFrame:
    """P6/P7: drop rows with NULL in any of ``cols``.

    Reference: empty-string checks + drop-on-exception
    (``Query 1a/TopKNetProfitDriver.java:66,73``); HiveQL ``IS NOT NULL``.
    With PERMISSIVE ingest (sources.csv) malformed fields arrive as NULL, so
    this single filter reproduces the whole Fig. 2 invalid-data taxonomy.
    """
    out = df
    for c in cols:
        out = out.filter(F.col(c).isNotNull())
    return out


def grouped_sum(
    df: DataFrame,
    key: str | Sequence[str],
    measure: str | Column,
    alias: str,
) -> DataFrame:
    """A1/A2 (+A3 automatic): ``SUM(measure) GROUP BY key``.

    Reference: sum reducer + combiner registration
    (``Query 1a/TopKNetProfitDriver.java:84-101,214``). Spark always splits
    the aggregation into map-side partial + post-shuffle final, so the
    33,800× map-output reduction the combiner bought is the default here.
    """
    keys = [key] if isinstance(key, str) else list(key)
    measure_col = F.col(measure) if isinstance(measure, str) else measure
    return df.groupBy(*keys).agg(F.sum(measure_col).alias(alias))


def top_k(
    df: DataFrame,
    order: Sequence[Column],
    k: int,
) -> DataFrame:
    """T1-T4: global top-K — ``orderBy(order).limit(k)``.

    Reference: two whole MR jobs (mapper-local truncation + single-reducer
    stream sort, ``Query 1a/TopKNetProfitDriver.java:108-198``) collapse
    into one ``TakeOrderedAndProject`` operator. Callers pass a FULL
    deterministic ordering (measure plus a unique tie-break key) because the
    reference's HashMap-iteration ties are arbitrary (SURVEY.md §2.5) and
    reproducible engines should not be.
    """
    return df.orderBy(*order).limit(k)


def right_outer_join_coalesce(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    coalesce_col: str,
    fill,
    *,
    broadcast_left: bool = False,
) -> DataFrame:
    """J1 + F1: right-outer equi-join with NULL→fill on the left measure.

    Reference: three-job reduce-side join with tagged values
    (``Query 2/TopKStoreProfitEmployeesDriver.java:111-194``) and HiveQL
    ``a RIGHT OUTER JOIN b ON … `` + ``COALESCE(a.net_profit, 0)``
    (``Software Documentation.pdf p.5``). Rows with a NULL right-side join
    key survive (right-outer); missing left measures are coalesced to
    ``fill``.

    Scale note: Spark can only build the hash table on the NON-preserved
    side, which for a right-outer join is the LEFT — broadcasting the
    preserved dimension side is rejected (verified: HintErrorLogger drops
    the hint). In this workload the left side is a post-aggregation frame
    (one row per group key, e.g. 58 stores / ~52k items), so
    ``broadcast_left=True`` is the correct 100 TB plan: no shuffle of
    either input after the aggregation, BroadcastHashJoin picked. If the
    left were ever too large, Catalyst falls back to sort-merge.
    """
    lft = F.broadcast(left) if broadcast_left else left
    joined = lft.join(right, on, "right_outer")
    return joined.withColumn(coalesce_col, F.coalesce(F.col(coalesce_col), F.lit(fill)))
