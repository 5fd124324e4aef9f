"""Relational operators: horizontal sums, grouped top-k, deciles, unions.

Covers SURVEY.md §2 families B8 (row-wise sums), C7 (vertical union),
G1-G4 (sorts / top-k / grouped top-k / ntile). All pure built-in
`pyspark.sql.functions` — whole-stage-codegen'd, no Python on the hot path.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def horizontal_sum(cols: list[str | Column], wide_threshold: int = 64) -> Column:
    """Row-wise sum across columns (operator B8; ref:
    public_eda_pipeline.py:283-290 `pl.sum_horizontal`).

    For few columns a flat `+` chain stays in codegen. Beyond
    ``wide_threshold`` columns (the reference sums 2,241 null-indicators in
    one go) a flat chain blows up the expression tree / codegen method size,
    so we switch to `aggregate(array(...), ...)` which evaluates as a loop
    over one array expression.
    """
    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(exprs) <= wide_threshold:
        return reduce(add, exprs)
    return F.aggregate(
        F.array(*[e.cast("double") for e in exprs]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def horizontal_not_null_count(cols: list[str], wide_threshold: int = 64) -> Column:
    """Count of non-null values per row across ``cols`` (the reference's
    `filled_extra_count`, ref: public_eda_pipeline.py:286-290)."""
    ind = [F.col(c).isNotNull().cast("int") for c in cols]
    return horizontal_sum(ind, wide_threshold=wide_threshold).cast("long")


def grouped_topk(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group via row_number window (operator G3; ref:
    public_eda_pipeline.py:535-536 `groupby().head(10)`).

    pandas `head(k)` breaks ties by input order, which is not reproducible
    in a distributed engine — callers must provide ``tiebreak_cols`` for
    determinism. Scales as a single shuffle on ``partition_cols``; no global
    sort.
    """
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    for t in tiebreak_cols or []:
        order.append(F.col(t).asc())
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ntile_bucket(
    df: DataFrame,
    value_col: str,
    n: int = 10,
    bucket_col: str = "bucket",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Equal-frequency bucketing (operator E11/G4; ref qcut at
    public_eda_pipeline.py:306-307). ntile over a global order.

    NOTE: a global-order window is a single-partition sort — fine for the
    reference's driver-scale decile tables, but at 100 TB callers should
    prefer `approx_quantile_buckets` (cutpoint-based, fully parallel).
    """
    order = [F.col(value_col).asc()] + [F.col(t).asc() for t in (tiebreak_cols or [])]
    w = Window.orderBy(*order)
    return df.withColumn(bucket_col, F.ntile(n).over(w))


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    n: int = 10,
    bucket_col: str = "bucket",
    relative_error: float = 0.0001,
) -> DataFrame:
    """Scale path for deciles: compute (approximate) quantile cutpoints in
    one pass, then assign buckets with a broadcast-free `when` chain.
    No global sort; survives 100x scale-up where `ntile_bucket` cannot."""
    probs = [i / n for i in range(1, n)]
    cuts = df.approxQuantile(value_col, probs, relative_error)
    # deduplicate cutpoints (qcut duplicates='drop' analog, ref line 307)
    uniq: list[float] = []
    for c in cuts:
        if not uniq or c > uniq[-1]:
            uniq.append(c)
    expr = F.lit(1)
    for i, c in enumerate(uniq):
        expr = F.when(F.col(value_col) > F.lit(c), F.lit(i + 2)).otherwise(expr)
    return df.withColumn(bucket_col, expr.cast("int"))


def union_stack(dfs: list[DataFrame], label_col: str | None = None, labels: list[str] | None = None) -> DataFrame:
    """Vertical union by name (operator C7; ref pd.concat at
    public_eda_pipeline.py:262, 431), optionally tagging each input with a
    label column (the adversarial is_test label pattern, ref lines 431-435).
    """
    if label_col is not None:
        assert labels is not None and len(labels) == len(dfs)
        dfs = [d.withColumn(label_col, F.lit(lab)) for d, lab in zip(dfs, labels)]
    return reduce(lambda a, b: a.unionByName(b), dfs)
