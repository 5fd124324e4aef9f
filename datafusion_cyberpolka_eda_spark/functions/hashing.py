"""Cross-engine deterministic hashing (portable twin of xxhash64).

The scale-path operators hash with `F.xxhash64` — fastest JVM-side option,
but DuckDB has no xxhash64, so xxhash64-based queries can only get
rows-only driver checks. This module provides a *portable* 60-bit hash both
engines compute identically, so the approximate algorithms themselves
(MinHash signatures, SimHash fingerprints, band buckets) can be
hash-checked end-to-end against the DuckDB oracle:

    Spark :  conv(substr(md5(x), 1, 15), 16, 10)::bigint
    DuckDB:  ('0x' || substr(md5(x), 1, 15))::BIGINT

15 hex chars = 60 bits, always non-negative, well inside signed-long range
(no ANSI overflow, no sign mismatch between the engines' casts). md5 is
~5-10x slower than xxhash64 per call — production dedup should keep
xxhash64; the portable family exists to *verify the algorithm*, which is
exactly what the oracle gate needs.

Per-permutation MinHash re-hashing additionally avoids md5-per-permutation
cost with a universal hash family over the Mersenne prime 2^31-1:
h_i(x) = (a_i * (x mod P) + b_i) mod P — pure 64-bit arithmetic, identical
in both engines, products bounded by 2^62.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2147483647  # 2^31 - 1


def md5_hash64(col: str | Column) -> Column:
    """Portable 60-bit hash of a string column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_hash64_sql(expr: str) -> str:
    """The DuckDB expression computing exactly `md5_hash64(expr)`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def perm_constants(num_hashes: int, seed: int = 4242) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the universal hash family
    h_i(x) = (a_i * x + b_i) mod 2^31-1, shared between the Spark
    expressions and the generated oracle SQL."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
        for _ in range(num_hashes)
    ]


def perm_hash(h: Column, a: int, b: int) -> Column:
    """Spark expression for h_i(x); input must already be reduced mod P."""
    return (F.lit(a).cast("long") * h + F.lit(b)) % F.lit(MERSENNE31).cast("long")
