"""Deterministic generator for reference-native ``store_sales.dat`` /
``store.dat`` pipe-delimited files at arbitrary row counts.

The reference benchmarks its 4 queries against TPC-DS-shaped .dat text
(~115 M fact rows on 6 containers — BASELINE.md). The driver testdata is
TPC-H-ish parquet, so BASELINE comparisons so far matched workload shape
but not schema/format. This generator closes that gap: it emits the same
23-field / 29-field pipe layout the reference mappers index positionally
(``Query 1a/TopKNetProfitDriver.java:62,67-68``), including the three
Fig.-2 invalid-record classes (CS346 Report.pdf p.2) at a fixed rate so
PERMISSIVE-mode ingest is exercised, not just clean parse.

Spark-native generation: ``spark.range`` + hash-derived columns +
``format_string`` — fully parallel, no driver-side row loop, so making
a 1 GB (or 1 TB) fixture is just a bigger range.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Query-window constants mirrored by the bench section.
N_STORES = 60  # reference EDA: 58 stores (CS346 Report.pdf p.6)
N_ITEMS = 18_000
DATE_LO = 2_451_000
DATE_HI = 2_452_000
N_DATES = 1_400  # spans [DATE_LO - 200, DATE_LO + 1200): part outside window


def generate_store_sales_dat(
    spark: SparkSession, out_dir: str, n_rows: int
) -> None:
    """Write ``{out_dir}/store_sales.dat`` (directory of pipe-text parts)
    and ``{out_dir}/store.dat``. Deterministic in ``n_rows``.

    Dirty-row classes (ids mod 1000): 0-4 → empty store key (class 1),
    5-9 → unparsable profit (class 2), 10-14 → short row / missing
    delimiters (class 3); ~1.5% dirty overall, like real warehouse text.
    """
    h = F.abs(F.xxhash64(F.col("id")))
    date_sk = (F.lit(DATE_LO - 200) + h % N_DATES).cast("string")
    item_sk = (h % N_ITEMS).cast("string")
    store_sk = (h % N_STORES).cast("string")
    qty = (F.lit(1) + h % 100).cast("string")
    # profit in [-50.00, 149.99], always 2 decimals; integer-cents derived
    profit_cents = (h % 20_000).cast("long") - F.lit(5_000)
    profit = F.format_string(
        "%s%d.%02d",
        F.when(profit_cents < 0, F.lit("-")).otherwise(F.lit("")),
        (F.abs(profit_cents) / 100).cast("long"),
        F.abs(profit_cents) % 100,
    )

    mod = F.col("id") % 1000
    store_sk = F.when(mod.between(0, 4), F.lit("")).otherwise(store_sk)
    profit = F.when(mod.between(5, 9), F.lit("not-a-number")).otherwise(profit)

    # 23 fields: 0=date_sk, 2=item_sk, 7=store_sk, 10=quantity, 22=profit
    full_line = F.concat_ws(
        "|",
        date_sk, F.lit(""), item_sk, F.lit(""), F.lit(""), F.lit(""),
        F.lit(""), store_sk, F.lit(""), F.lit(""), qty,
        *[F.lit("") for _ in range(11)], profit,
    )
    line = F.when(
        mod.between(10, 14), F.concat_ws("|", date_sk, F.lit("x"), F.lit("y"))
    ).otherwise(full_line)

    (
        spark.range(n_rows)
        .select(line.alias("value"))
        .write.mode("overwrite")
        .text(os.path.join(out_dir, "store_sales.dat"))
    )

    # store: 29 fields, 0=s_store_sk, 6=s_number_employees. Five stores
    # beyond the sales key space (no sales → COALESCE path) and every
    # third store NULL employees (excluded from Q2 output).
    sh = F.abs(F.xxhash64(F.col("id")))
    emp = F.when(F.col("id") % 3 == 2, F.lit("")).otherwise(
        (F.lit(50) + sh % 500).cast("string")
    )
    store_line = F.concat_ws(
        "|",
        F.col("id").cast("string"), F.lit(""), F.lit(""), F.lit(""),
        F.lit(""), F.lit(""), emp,
        *[F.lit("") for _ in range(22)],
    )
    (
        spark.range(N_STORES + 5)
        .coalesce(1)
        .select(store_line.alias("value"))
        .write.mode("overwrite")
        .text(os.path.join(out_dir, "store.dat"))
    )


def cached_store_sales_dir(spark: SparkSession, n_rows: int) -> str:
    """Generate once per (temp dir, n_rows), publish by atomic rename —
    same absent-or-complete contract as ``catalog.events_partitioned_path``."""
    import shutil
    import tempfile

    final = os.path.join(tempfile.gettempdir(), f"hha_store_sales_{n_rows}")
    marker = os.path.join(final, "store_sales.dat", "_SUCCESS")
    if os.path.exists(marker):
        return final
    build = tempfile.mkdtemp(prefix=f"hha_store_sales_build_{n_rows}_")
    generate_store_sales_dat(spark, build, n_rows)
    try:
        os.rename(build, final)
    except OSError:
        shutil.rmtree(build, ignore_errors=True)
    return final
