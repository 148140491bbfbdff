"""Explicit StructType schemas (schema-on-read, no inference in production).

Mirrors the reference's Hive external-table DDL (``Software Documentation.pdf
p.6-7``): ``store_sales`` (23 cols) and ``store`` (29 cols). Decisions per
SURVEY.md §1.2: money is ``DecimalType(7,2)`` (the DDL ground truth — avoids
float-sum drift at 100 TB), surrogate keys are ``LongType``, char/varchar
are ``StringType``.

Also declares the driver-testdata schemas (TESTDATA.md) so reads never fall
back to inference on hot paths.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


_MONEY = DecimalType(7, 2)

# store_sales: 23 pipe-delimited columns, Software Documentation.pdf p.6;
# positional indices are what the reference mappers use
# (Query 1a/TopKNetProfitDriver.java:62,67-68).
STORE_SALES = _st(
    ("ss_sold_date_sk", LongType()),
    ("ss_sold_time_sk", LongType()),
    ("ss_item_sk", LongType()),
    ("ss_customer_sk", LongType()),
    ("ss_cdemo_sk", LongType()),
    ("ss_hdemo_sk", LongType()),
    ("ss_addr_sk", LongType()),
    ("ss_store_sk", LongType()),
    ("ss_promo_sk", LongType()),
    ("ss_ticket_number", LongType()),
    ("ss_quantity", IntegerType()),
    ("ss_wholesale_cost", _MONEY),
    ("ss_list_price", _MONEY),
    ("ss_sales_price", _MONEY),
    ("ss_ext_discount_amt", _MONEY),
    ("ss_ext_sales_price", _MONEY),
    ("ss_ext_wholesale_cost", _MONEY),
    ("ss_ext_list_price", _MONEY),
    ("ss_ext_tax", _MONEY),
    ("ss_coupon_amt", _MONEY),
    ("ss_net_paid", _MONEY),
    ("ss_net_paid_inc_tax", _MONEY),
    ("ss_net_profit", _MONEY),
)

# store: 29 pipe-delimited columns, Software Documentation.pdf p.7; only
# idx 0 (s_store_sk) and idx 6 (s_number_employees) are queried
# (Query 2/TopKStoreProfitEmployeesDriver.java:149-153).
STORE = _st(
    ("s_store_sk", LongType()),
    ("s_store_id", StringType()),
    ("s_rec_start_date", DateType()),
    ("s_rec_end_date", DateType()),
    ("s_closed_date_sk", LongType()),
    ("s_store_name", StringType()),
    ("s_number_employees", IntegerType()),
    ("s_floor_space", IntegerType()),
    ("s_hours", StringType()),
    ("s_manager", StringType()),
    ("s_market_id", IntegerType()),
    ("s_geography_class", StringType()),
    ("s_market_desc", StringType()),
    ("s_market_manager", StringType()),
    ("s_division_id", IntegerType()),
    ("s_division_name", StringType()),
    ("s_company_id", IntegerType()),
    ("s_company_name", StringType()),
    ("s_street_number", StringType()),
    ("s_street_name", StringType()),
    ("s_street_type", StringType()),
    ("s_suite_number", StringType()),
    ("s_city", StringType()),
    ("s_county", StringType()),
    ("s_state", StringType()),
    ("s_zip", StringType()),
    ("s_country", StringType()),
    ("s_gmt_offset", DecimalType(5, 2)),
    ("s_tax_percentage", DecimalType(5, 2)),
)

# Driver testdata schemas (TESTDATA.md) — parquet carries these natively;
# declared so code can reference/validate without inference.
TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _st(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _st(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _st(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _st(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    "events": _st(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _st(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _st(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
