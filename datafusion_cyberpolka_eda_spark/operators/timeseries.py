"""Time-series regularization: resample to a fixed grid, fill gaps,
carry-forward (LOCF) and linearly interpolate.

The reference engine has no time-series resampler; this extends the J
family (event-time operators, SURVEY.md §2-J) with the batch shape every
metrics/feature pipeline needs: turn irregular events into a dense
per-key grid so downstream window features (rolling means, lags) see
uniform steps.

Scale design (100 TB): the grid is generated per key with
``sequence(min_bucket, max_bucket, step)`` — an executor-side expression,
no driver loop, no cross join against a calendar table. Everything after
the grid explode is one left join on (key, bucket) plus two windows
partitioned by key, so the work shards by key with no global shuffle
barrier beyond those. Grids are bounded per key (span/step rows), so a
key's partition stays O(its own span), and skewed keys can be salted the
same way any window partition is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_grid(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    agg: Column | None = None,
    bucket_unit: str | None = None,
) -> DataFrame:
    """Aggregate to (key, bucket) then densify: one row per key per step
    between that key's first and last observed bucket. Missing buckets
    carry a null value. ``bucket_unit`` is the date_trunc granularity and
    defaults to the unit of ``step`` (e.g. step "1 day" truncates to
    day) — it must not be finer than the step or grid points would miss
    observed buckets. Returns (key, bucket, v)."""
    parts = step.split()
    if bucket_unit is None and not (len(parts) == 2 and parts[0] == "1"):
        # anything but a single '1 <unit>' step ('6 hours', '1 hour 30
        # minutes', ...) with default truncation would generate a grid
        # that misses observed buckets (silent data loss on the left
        # join) — such steps need an explicit coarser anchor
        raise ValueError(
            f"step {step!r} needs an explicit bucket_unit: the default "
            "(the step's unit) is finer than the step itself"
        )
    unit = bucket_unit or parts[-1].rstrip("s")
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    obs = (
        df.groupBy(F.col(key_col).alias("key"), bucket)
        .agg((agg if agg is not None else F.avg(value_col)).alias("v"))
    )
    grid = (
        obs.groupBy("key")
        .agg(F.min("bucket").alias("h0"), F.max("bucket").alias("h1"))
        .select(
            "key",
            F.explode(
                F.expr(f"sequence(h0, h1, interval {step})")
            ).alias("bucket"),
        )
    )
    return grid.join(obs, ["key", "bucket"], "left")


def gap_fill(dense: DataFrame, key: str = "key", bucket: str = "bucket",
             v: str = "v") -> DataFrame:
    """Add LOCF and linear-interpolation columns to a densified grid.

    - ``v_locf``: last observed value at or before the bucket.
    - ``v_interp``: observed value where present, else the linear
      interpolation between the surrounding observed anchors (the grid
      spans min..max observed buckets, so interior nulls always have
      both anchors).
    """
    back = Window.partitionBy(key).orderBy(bucket).rowsBetween(
        Window.unboundedPreceding, 0
    )
    fwd = Window.partitionBy(key).orderBy(bucket).rowsBetween(
        0, Window.unboundedFollowing
    )
    vc = F.col(v)
    anchor_ts = F.when(vc.isNotNull(), F.col(bucket))
    prev_v = F.last(vc, ignorenulls=True).over(back)
    prev_t = F.last(anchor_ts, ignorenulls=True).over(back)
    next_v = F.first(vc, ignorenulls=True).over(fwd)
    next_t = F.first(anchor_ts, ignorenulls=True).over(fwd)
    span = next_t.cast("long") - prev_t.cast("long")
    frac = (F.col(bucket).cast("long") - prev_t.cast("long")) / span
    return dense.select(
        key,
        bucket,
        vc.alias(v),
        prev_v.alias("v_locf"),
        F.when(vc.isNotNull(), vc)
        .otherwise(prev_v + (next_v - prev_v) * frac)
        .alias("v_interp"),
    )
