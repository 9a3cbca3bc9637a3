"""Deterministic, engine-portable hashing expressions.

The dedup/fingerprint operators need hash functions that produce the
SAME value in Spark (for the engine) and in ANSI SQL (for the DuckDB
oracle). Built-in hashes differ across engines (Spark xxhash64 vs DuckDB
murmur), so we define hashes from pure integer arithmetic, which is
exact and identical everywhere:

- ``char_hash``: polynomial rolling hash over characters,
  acc = (acc*31 + ascii(c)) mod 2^30 — a distributed-friendly
  re-expression of the classic Java/Karp-Rabin string hash.
- ``affine_hash_family``: h_i(x) = (a_i * x + b_i) mod P with
  P = 2^31 - 1 (Mersenne prime) and Knuth-multiplier-derived a_i — the
  standard MinHash construction (Broder 1997).

All arithmetic stays within int64 for ANY bigint input (acc < 2^30;
a_i < 2^31 and the affine input is reduced mod P before the multiply,
so products stay < 2^62), so Spark BIGINT and DuckDB BIGINT behave
identically — these expressions run inside whole-stage codegen, no
UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CHAR_MOD = 1 << 30
MERSENNE_P = (1 << 31) - 1
KNUTH = 2654435761  # 2^32 / golden ratio

# Gram-fold modulus for the span-dedup posting hashes: the LARGEST prime
# M with 31*M + CHAR_MOD < 2^63, so one fold step (acc*31 + x with
# acc < M, x < CHAR_MOD) never overflows int64 in either engine. 58-bit
# space (vs CHAR_MOD's 30): at 10^12 grams the expected number of
# colliding PAIRS is n^2/2M ~ 1.7e6 over the whole corpus — collisions
# perturb df counts by at most that many postings instead of saturating
# the space, as a 2^30 fold would at ~10^5 grams.
GRAM_MOD = 297528130186484927


def char_hash(col: str | Column) -> Column:
    """Spark: polynomial char hash of a string column (BIGINT < 2^30)."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(codes, F.lit(0).cast("bigint"), lambda acc, x: (acc * 31 + x) % CHAR_MOD)


def char_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`char_hash` (same value, same input string)."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(a, x) -> (a*31 + x) % {CHAR_MOD})"
    )


def affine_hash(x: Column, i: Column) -> Column:
    """Spark: i-th member of the MinHash affine family applied to x.

    x is reduced mod P FIRST: a < 2^31 and (x % P) < 2^31 keep the
    product < 2^62, int64-safe for ANY bigint input — billion-scale
    shifted ids overflowed the raw a*x under ANSI mode (found by the
    sf1 driver-sim leg). For x < P (every driver testdata id) the
    reduction is the identity, so hash values are unchanged."""
    a = (1 + i * KNUTH) % MERSENNE_P
    b = (7 + i * 40503) % MERSENNE_P
    return (a * (x % MERSENNE_P) + b) % MERSENNE_P


def affine_hash_sql(x_expr: str, i_expr: str) -> str:
    return (
        f"((((1 + {i_expr}*{KNUTH}) % {MERSENNE_P}) * (({x_expr}) % {MERSENNE_P})"
        f" + ((7 + {i_expr}*40503) % {MERSENNE_P})) % {MERSENNE_P})"
    )
