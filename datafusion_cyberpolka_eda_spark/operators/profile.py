"""Data profiling: counts, null rates, distinct counts, cardinality,
unseen categories, missingness bands.

Covers SURVEY.md §2 families D1, D3, D6, D8, D9 and C6. The key
Spark-specific engineering is *chunked wide aggregation*: the reference
computes null rates over 2,241 columns in a single Polars pass (ref:
public_eda_pipeline.py:235-240); a single Spark `agg` with thousands of
expressions breaks whole-stage codegen, so we batch columns (~400/agg) and
union the melted results. Each batch is still one distributed pass with
map-side partial aggregation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chunks(xs: list[str], size: int) -> list[list[str]]:
    return [xs[i : i + size] for i in range(0, len(xs), size)]


def null_rates(df: DataFrame, cols: list[str] | None = None, chunk_size: int = 400) -> DataFrame:
    """Per-column null rate, returned long-form (column, null_rate).

    Operator D3 (ref: public_eda_pipeline.py:235-254 — `is_null().mean()`
    per column). One agg pass per chunk; melt via stack().
    """
    cols = cols if cols is not None else df.columns
    out: list[DataFrame] = []
    for batch in _chunks(cols, chunk_size):
        agg = df.agg(
            *[F.avg(F.col(c).isNull().cast("double")).alias(c) for c in batch]
        )
        stack_args = ", ".join(f"'{c}', `{c}`" for c in batch)
        out.append(
            agg.selectExpr(
                f"stack({len(batch)}, {stack_args}) as (column, null_rate)"
            )
        )
    return reduce(lambda a, b: a.unionByName(b), out)


def missingness_bands(
    null_rate_df: DataFrame,
    bands: list[tuple[str, float, float]] | None = None,
    rate_col: str = "null_rate",
) -> DataFrame:
    """Band counts over a null-rate profile (operator D6; ref:
    public_eda_pipeline.py:269-280). One conditional-agg pass."""
    if bands is None:
        bands = [
            ("gt_99", 0.99, 1.01),
            ("p95_99", 0.95, 0.99),
            ("p50_95", 0.50, 0.95),
            ("p10_50", 0.10, 0.50),
            ("p0_10", 1e-12, 0.10),
            ("zero", -1.0, 1e-12),
        ]
    aggs = [
        F.sum(
            ((F.col(rate_col) > F.lit(lo)) & (F.col(rate_col) <= F.lit(hi))).cast("long")
        ).alias(name)
        for name, lo, hi in bands
    ]
    return null_rate_df.agg(*aggs)


def distinct_counts(df: DataFrame, cols: list[str], exact: bool = True) -> DataFrame:
    """Per-column distinct count, long-form (column, n_distinct).

    Operator D8 (ref: public_eda_pipeline.py:372-381 — per-cat-feature
    `n_unique` on train and test). ``exact=False`` switches to HLL
    `approx_count_distinct` — the 100 TB path where exactness isn't needed.
    Exact multi-column countDistinct in one agg triggers an expand (one
    shuffle per distinct col); for few columns that's fine, for very wide
    profiling prefer approximate.
    """
    fn = F.countDistinct if exact else F.approx_count_distinct
    agg = df.agg(*[fn(F.col(c)).alias(c) for c in cols])
    stack_args = ", ".join(f"'{c}', cast(`{c}` as bigint)" for c in cols)
    return agg.selectExpr(f"stack({len(cols)}, {stack_args}) as (column, n_distinct)")


def stacked_values(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-form (feature, value) rows for all ``cols`` in one pass via
    stack(); nulls dropped per-feature (mirrors per-column drop_nulls).
    Values are cast to string — injective for the integer-coded
    categoricals this profiles, so distinct counts are unchanged."""
    stack_args = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    return df.selectExpr(
        f"stack({len(cols)}, {stack_args}) as (feature, value)"
    ).filter(F.col("value").isNotNull())


def cardinality_unseen_profile(
    train: DataFrame, test: DataFrame, cols: list[str]
) -> DataFrame:
    """Per-feature cardinality + unseen-category stats for ALL columns in
    a constant number of distributed passes (operators D8 + C6 batched;
    ref: public_eda_pipeline.py:369-405 loops Python sets per feature).

    Returns (feature, train_nunique, test_nunique, unseen_unique_categories,
    unseen_rate_test_rows). A per-feature loop costs 4 full-table jobs per
    column — O(features) scans; stacking makes it: two distinct passes
    (map-side-combined, shuffle = distinct pairs only), one anti-join of
    those small distinct sets, and one left join of stacked test rows
    against the train set for the row-weighted rate. Scale-invariant in
    the number of profiled columns."""
    tr = stacked_values(train, cols).distinct().localCheckpoint(eager=True)
    te = stacked_values(test, cols).distinct().localCheckpoint(eager=True)
    tr_card = tr.groupBy("feature").agg(F.count(F.lit(1)).alias("train_nunique"))
    te_card = te.groupBy("feature").agg(F.count(F.lit(1)).alias("test_nunique"))
    unseen = (
        te.join(tr, ["feature", "value"], "left_anti")
        .groupBy("feature")
        .agg(F.count(F.lit(1)).alias("unseen_unique_categories"))
    )
    rate = (
        stacked_values(test, cols)
        .join(tr.withColumn("__seen", F.lit(1)), ["feature", "value"], "left")
        .groupBy("feature")
        .agg(
            F.avg(F.col("__seen").isNull().cast("double")).alias(
                "unseen_rate_test_rows"
            )
        )
    )
    out = (
        tr_card.join(te_card, "feature", "full")
        .join(unseen, "feature", "full")
        .join(rate, "feature", "full")
        .na.fill({"train_nunique": 0, "test_nunique": 0, "unseen_unique_categories": 0})
        .na.fill({"unseen_rate_test_rows": 0.0})
    )
    return out


def unseen_categories(train: DataFrame, test: DataFrame, col: str) -> DataFrame:
    """Distinct values of ``col`` present in test but absent from train
    (operator C6; ref: public_eda_pipeline.py:383-397 does this with Python
    sets — the idiomatic distributed form is a left-anti join on distincts).
    """
    t = test.select(col).na.drop().distinct()
    tr = train.select(col).na.drop().distinct()
    return t.join(tr, on=col, how="left_anti")


def unseen_rate_rows(train: DataFrame, test: DataFrame, col: str) -> DataFrame:
    """Row-weighted unseen rate (ref line 396): share of *test rows* whose
    category was never seen in train. Left join + null-mean, one shuffle."""
    tr = train.select(col).na.drop().distinct().withColumn("__seen", F.lit(1))
    joined = test.select(col).na.drop().join(tr, on=col, how="left")
    return joined.agg(
        F.avg(F.col("__seen").isNull().cast("double")).alias("unseen_rate"),
        F.count(F.lit(1)).alias("n_rows"),
    )
