"""Portable deterministic hashing — identical values in Spark and DuckDB.

Spark's native ``xxhash64``/``hash`` have no DuckDB twin, so oracle-checked
operators use an md5-derived 60-bit hash instead: take the first 15 hex
chars of md5 (60 bits, always positive in int64) and parse as base-16.
Verified bit-identical across engines including UTF-8 inputs.

At 100 TB this is still the right shape: md5 is JVM-side, vectorizable by
codegen, and cheap relative to shuffle; swap to ``xxhash64`` via
``fast=True`` when oracle parity is not required (pure-Spark pipelines).

MinHash machinery: universal-hash family h_j(x) = (a_j * x + b_j) mod P
over the 31-bit reduction of the base hash; all arithmetic stays in int64
(a_j, x < 2^31 → product < 2^62), so Spark and DuckDB agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: modulus for the universal hash family.
MERSENNE_31 = 2_147_483_647


def h64(col: Column | str, *, fast: bool = False) -> Column:
    """60-bit deterministic hash of a string column (portable to DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    if fast:
        return F.xxhash64(c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h64_sql(expr: str) -> str:
    """DuckDB twin of :func:`h64`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def h31(col: Column | str) -> Column:
    """31-bit reduction used as MinHash input domain."""
    return h64(col) % MERSENNE_31


def h31_sql(expr: str) -> str:
    return f"({h64_sql(expr)} % {MERSENNE_31})"


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs via a fixed LCG — NO runtime RNG, so
    the Spark plan and the oracle SQL embed the same constants."""
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 1_103_515_245 + 12_345) % (1 << 31)
        a = (state % (MERSENNE_31 - 1)) + 1  # a in [1, P-1]
        state = (state * 1_103_515_245 + 12_345) % (1 << 31)
        b = state % MERSENNE_31  # b in [0, P-1]
        params.append((a, b))
    return params


def minhash_expr(hash31: Column, a: int, b: int) -> Column:
    """h_j(x) = (a*x + b) mod P — int64-safe by construction."""
    return (hash31 * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_31)


def minhash_sql(hash31_expr: str, a: int, b: int) -> str:
    return f"(({hash31_expr} * {a} + {b}) % {MERSENNE_31})"
