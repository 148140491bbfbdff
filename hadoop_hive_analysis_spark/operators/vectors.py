"""Vector aggregation over the ``embeddings`` table: per-group centroids
in exact quantized-integer space.

The missing op class in the similarity pack: everything else there
compares vectors pairwise; this AGGREGATES them element-wise — the
building block for per-source corpus centroids, cluster quality
monitoring, and the M-step of a distributed k-means (compose with the
IVF cell-assignment equi-join for a fully-declarative Lloyd iteration).

Scale shape: Spark has no element-wise array-sum aggregate, and
collecting vectors per group is unbounded. The scalable form is
``posexplode`` + ``groupBy(group, dim)``: the map-side partial aggregate
collapses each partition to at most |groups| × DIM rows BEFORE the
exchange, so the shuffle carries group cardinality × dimension — not the
corpus — no matter how many vectors stream through. One shuffle, pure
whole-stage codegen, no Python.

Determinism: sums run on the same round(x·1000) int64 quantization the
ANN operators use (`similarity._QUANT`) — exact under any partitioning
and add-order; the mean is a single int/int division, bit-identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .similarity import _QUANT, _QUANT_SQL


def embedding_group_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid: (label, dim, n_vecs, sum_q, mean_q) with
    ``sum_q`` the exact quantized component sum and ``mean_q`` its mean.

    Scalar output rows (one per group × dimension) rather than a packed
    array: exact-hashable, re-aggregatable (sum_q/n merge across shards),
    and the shape a monitoring table stores anyway.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.expr(_QUANT).alias("q")
    )
    expl = emb.select("label", F.posexplode("q").alias("dim", "v"))
    return (
        expl.groupBy("label", "dim")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("v").alias("sum_q"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("dim").cast("long").alias("dim"),
            "n_vecs",
            "sum_q",
            (F.col("sum_q") / F.col("n_vecs")).alias("mean_q"),
        )
    )


EMBEDDING_GROUP_CENTROID_SQL = f"""
    WITH q AS (
        SELECT label, {_QUANT_SQL} AS qv FROM embeddings
    ),
    e AS (
        SELECT label,
               unnest(generate_series(0, len(qv) - 1)) AS dim,
               unnest(qv) AS v
        FROM q
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(dim AS BIGINT) AS dim,
           count(*) AS n_vecs,
           CAST(sum(v) AS BIGINT) AS sum_q,
           CAST(sum(v) AS DOUBLE) / count(*) AS mean_q
    FROM e
    GROUP BY label, dim
"""
