"""Schema-on-read catalog: a directory of Parquet files + naming conventions.

Mirrors the reference's catalog model — no declared schemas; columns are
discovered from Parquet footers and classified by name convention
(ref: eda_workspace/public_eda_pipeline.py:62-70 — `customer_id` join key,
`num_feature_*` / `cat_feature_*` prefixes, `target_<family>_<idx>`).
Spark's `spark.read.parquet(...).columns` reads footers only, so schema
introspection stays metadata-cheap at 100 TB (operator A2 in SURVEY.md §2).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Driver-provided TPC-H-ish testdata tables (TESTDATA.md / FIXTURES.md §B).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy Parquet scan (operator A1). One scan per query is fine — column
    pruning + predicate pushdown mean Catalyst reads only what the plan
    needs; callers cache hot tables explicitly when reused across actions.

    The events table's `ts` physical type varies by data generation
    (TIMESTAMP(NANOS) → long under nanosAsLong, or tz-less micros → Spark
    TIMESTAMP_NTZ); `normalize_event_ts` rebuilds a plain UTC TIMESTAMP
    either way so every downstream operator (unix_micros, window,
    watermark) sees one well-known type that matches DuckDB's naive-epoch
    semantics.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # event-time queries emit date_format strings; pin UTC so results
        # match the (UTC-naive) oracle even under a non-UTC driver session
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Coerce the events timestamp to plain TIMESTAMP (UTC session):
    - nanos-as-long (legacy TIMESTAMP(NANOS) files): exact integer div to
      micros — data is micro-resolution, truncation is lossless;
    - TIMESTAMP_NTZ (tz-less parquet micros): cast under the pinned UTC
      session timezone, i.e. naive wall-clock == UTC instant, exactly how
      DuckDB treats the same file."""
    dt = dict(df.dtypes).get(ts_col)
    if dt == "bigint":
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow input so per-row-expensive
    expressions (simhash, shingling, vector math) use every core.

    Parquet parallelism comes from file splits: a table small enough to be
    one split arrives as ONE partition, which serializes the whole operator
    on a single thread no matter how many executors exist (measured: warm
    simhash over sf0.1 documents took 5.6 s on 1 partition, sub-second
    spread over 32). At real scale inputs arrive with thousands of splits
    and this is a no-op; the guard keeps it from *reducing* parallelism or
    adding a shuffle where one isn't needed.
    """
    spark = df.sparkSession
    target = min_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


@dataclass
class EdaColumns:
    """Name-convention classification of an EDA-shaped table's columns
    (ref: public_eda_pipeline.py:69-70, 52-55)."""

    key: str = "customer_id"
    num_features: list[str] = field(default_factory=list)
    cat_features: list[str] = field(default_factory=list)
    targets: list[str] = field(default_factory=list)
    other: list[str] = field(default_factory=list)

    @property
    def features(self) -> list[str]:
        return self.num_features + self.cat_features


def classify_columns(columns: list[str], key: str = "customer_id") -> EdaColumns:
    """Split columns into num/cat features and targets by prefix convention."""
    out = EdaColumns(key=key)
    for c in columns:
        if c == key:
            continue
        elif c.startswith("num_feature_"):
            out.num_features.append(c)
        elif c.startswith("cat_feature_"):
            out.cat_features.append(c)
        elif c.startswith("target_"):
            out.targets.append(c)
        else:
            out.other.append(c)
    return out


def target_family(target_name: str) -> str:
    """`target_9_6` -> `9` (ref: public_eda_pipeline.py:52-55)."""
    parts = target_name.split("_")
    return parts[1] if len(parts) >= 3 else target_name
