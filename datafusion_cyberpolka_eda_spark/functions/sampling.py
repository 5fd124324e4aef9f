"""Key-stable deterministic sampling (operator B6).

The reference samples with `hash(col, seed) % 100 < pct` so that
independently sampled tables still join consistently on the key
(ref: eda_workspace/public_eda_pipeline.py:42-43; used with pct in
{12, 20, 30} at lines 332, 336, 418, 425, 472, 479, 487, 604, 608).

Spark equivalent: `pmod(xxhash64(col, seed), 100) < pct`. Semantically (not
bitwise) equivalent — Polars' hash != xxhash64, so *which* keys land in the
sample differs, but the properties that matter are preserved: deterministic,
key-stable across tables, pushdown-friendly (a plain filter under the scan),
and proportion ~pct%.

At 100 TB this is the right shape: no shuffle, no sort, evaluated inside the
scan stage; the filter prunes rows before any join/agg sees them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SEED = 42


def hash_sample_expr(col: str | Column, pct: float, seed: int = DEFAULT_SEED) -> Column:
    """Boolean membership expression: xxhash64(key, seed) % 100 < pct."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(100)) < F.lit(pct)


def hash_sample(df: DataFrame, col: str, pct: float, seed: int = DEFAULT_SEED) -> DataFrame:
    """Key-stable ~pct% sample. pct >= 100 returns df unchanged (full data —
    on a cluster the reference's memory-bound sampling is often unnecessary)."""
    if pct >= 100:
        return df
    return df.filter(hash_sample_expr(col, pct, seed))


def key_mod_sample(df: DataFrame, col: str, pct: int, modulus: int = 100) -> DataFrame:
    """Sampling by modulo on the key itself (no hash). Used where a
    cross-engine-reproducible sample is required (e.g. DuckDB oracle tests;
    SURVEY.md §5.3 — hash functions differ across engines, key arithmetic
    doesn't). Only appropriate for keys without modular bias."""
    return df.filter(F.pmod(F.col(col), F.lit(modulus)) < F.lit(pct))


def stratified_key_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    seed: int = DEFAULT_SEED,
    portable: bool = False,
) -> DataFrame:
    """Per-stratum key-stable sampling — the language/source rebalancing
    move of a training-data pipeline (downsample the dominant stratum,
    keep the rest): each row passes iff hash(key) % 100 < rate(stratum).

    Same scale shape as hash_sample: a pure map-side filter under the
    scan, no shuffle, key-stable so independently sampled tables still
    join. ``portable=True`` uses key-mod arithmetic instead of xxhash64
    (cross-engine reproducible, for oracle checks; hash is the production
    default — key-mod inherits any modular bias in the key)."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    bucket = (
        F.pmod(F.col(key_col), F.lit(100))
        if portable
        else F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(100))
    )
    return df.filter(bucket < rate)


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    portable: bool = True,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    draw a deterministic uniform u per key, race with exponential key
    -ln(u)/w, keep the k smallest. P(selected) is proportional-to-size
    without replacement; the race key is map-side arithmetic under the
    scan and the top-k is a TakeOrdered reduction — no full sort.

    ``portable=True`` derives u from the md5 hash (cross-engine
    reproducible, the oracle path); ``portable=False`` uses xxhash64
    (production: ~5-10x faster per row). Returns (key, race) rows."""
    from datafusion_cyberpolka_eda_spark.functions.hashing import md5_hash64

    key = F.col(key_col).cast("string")
    h = (
        md5_hash64(key)
        if portable
        else F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(2**60))
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**60))
    race = -F.log(u) / F.col(weight_col)
    # zero/negative weights mean zero selection probability — without
    # this filter w=0 yields NULL race (sorted FIRST) or a
    # DIVIDE_BY_ZERO under ANSI, and w<0 outranks every valid row
    return (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(key_col), race.alias("race"))
        .orderBy("race", key_col)
        .limit(k)
    )
