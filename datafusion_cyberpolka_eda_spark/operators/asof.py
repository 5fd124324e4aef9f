"""As-of (point-in-time) and range joins — operators Spark lacks natively
(SURVEY.md §2 notes the reference has none either; these are the canonical
"custom operator as a composition of DataFrame ops" cases from the
north-star brief).

as-of join: for every left row, attach the latest right row with
right_ts <= left_ts within the same key. Implemented as union + ordered
window with last_value(ignoreNulls) — ONE shuffle on the key, no range
explosion, no per-group Python. This is the scale-correct formulation:
the alternative `pd.merge_asof` inside applyInPandas materializes whole
groups in Python; the union-window form streams through Tungsten.

range join: equi-key + interval predicate. Spark evaluates it as an
equi-join with a post-filter (fine when the equi key is selective); for
non-selective keys at 100 TB, bucketize the time axis and equi-join on
(key, bucket) with adjacent-bucket duplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (latest right at-or-before each left row).

    Contract: ``on`` + ``ts_col`` exist on both sides; ``payload_cols``
    exist on the right and do not collide with left columns. Output: all
    left columns + ``<payload>{suffix}`` + ``<ts_col>{suffix}`` (null when
    no prior right row exists). Ties at equal ts: the right row sorts
    before the left row (inclusive <=), with no further intra-right
    ordering guarantee — supply distinct timestamps per key for full
    determinism.
    """
    lt = left.withColumn("__side", F.lit(1))
    for c in payload_cols:
        lt = lt.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    rt = right.select(*on, ts_col, *payload_cols).withColumn("__side", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    right_ts = F.when(F.col("__side") == 0, F.col(ts_col))
    out = u
    for c in payload_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    out = out.withColumn(
        f"{ts_col}{suffix}", F.last(right_ts, ignorenulls=True).over(w)
    )
    return out.filter(F.col("__side") == 1).drop("__side", *payload_cols)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """For each left row, count right rows with the same key whose
    timestamp falls in (left_ts, left_ts + window_seconds]. Equi-join on
    the key + interval post-filter; see module docstring for the
    bucketized variant at non-selective keys."""
    r = right.select(*on, F.col(right_ts).alias("__rts"))
    in_window = (F.unix_micros(F.col("__rts")) > F.unix_micros(F.col(left_ts))) & (
        F.unix_micros(F.col("__rts"))
        <= F.unix_micros(F.col(left_ts)) + window_seconds * 1_000_000
    )
    # left join on the key only, then count matches via conditional agg —
    # filtering on the range predicate would drop left rows whose matches
    # all fall outside the window (they must count 0, not disappear)
    joined = left.join(r, on=on, how="left")
    return joined.groupBy(*left.columns).agg(
        F.sum(F.when(in_window, 1).otherwise(0).cast("long")).alias("n_in_window")
    )
