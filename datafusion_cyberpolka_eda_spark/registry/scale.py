"""Scale-path techniques as first-class, oracle-checked queries.

SURVEY.md §4.4 lists the Spark-specific physical concerns the single-node
reference never faces (shuffle strategy, partition layout, skew). This
module makes each one a concrete, correctness-gated operator so the
techniques themselves are regression-tested, not just described:

- a7: partitionBy parquet sink + partition-pruned scan (the 100 TB layout:
  a filter on the partition column must prune directories, not scan them);
- c8: bucketed writes on the join key -> co-located join with NO shuffle
  exchange on either side (the §4.4 "bucket them on write" prescription);
- c9: two-phase salted aggregation for skewed keys — identical results to
  the direct groupBy, proven by the oracle hash match.

All sinks write distributed (one file per task) under the repo-local
scratch dir, the same layout a cluster job gives on object storage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.registry import _dec_sum, register
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch"
)


def _tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")


@register(
    "a7_partitioned_pruning",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
)
def a7_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-pruned source.

    Writes orders partitioned by o_orderpriority (the layout a 100 TB
    deployment uses for its coarse filter column), then reads back with a
    filter on that column: the scan must resolve it against directory
    names only (PartitionFilters in the plan; tools/plan_audit.py asserts
    no data-column pushdown is needed for it). The oracle aggregates the
    unpartitioned original, so layout round-trip loss breaks the match.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    path = os.path.join(_SCRATCH, f"{_tag(sf_dir)}_orders_by_priority")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dec_sum(F.col("o_totalprice"), "decimal(18,2)").alias("total_price"),
    )


@register(
    "c8_bucketed_colocated_join",
    """
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def c8_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-on-write co-located join (SURVEY.md §4.4 shuffle strategy).

    Both sides are written bucketed + sorted on the join key with the same
    bucket count, so the subsequent join needs NO shuffle exchange on
    either side — at 100 TB this converts every repeated customer-key join
    from a full network shuffle into a local merge per bucket.
    tools/plan_audit.py asserts the joined plan contains no Exchange.
    The oracle runs the plain join on the originals: bucketing must be a
    pure physical-layout change with zero semantic drift.
    """
    tag = _tag(sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    names = {}
    for name, df, key in (
        ("orders", orders, "o_custkey"),
        ("customer", customer, "c_custkey"),
    ):
        tbl = f"bkt_{name}_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(_SCRATCH, tbl))
            .saveAsTable(tbl)
        )
        names[name] = tbl
    o = spark.table(names["orders"])
    c = spark.table(names["customer"])
    # force the sort-merge path: at test SF the customer side fits the
    # broadcast threshold, which would hide the bucketed no-shuffle plan
    # this query exists to exercise (at 100 TB neither side broadcasts)
    joined = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dec_sum(F.col("o_totalprice"), "decimal(18,2)").alias("total_price"),
    )


@register(
    "c9_salted_skew_agg",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def c9_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for pathologically skewed keys.

    l_returnflag has 3 distinct values — a direct groupBy at 100 TB lands
    each key on ONE reducer (3 tasks own the whole shuffle). Phase 1 salts
    the key with pmod(xxhash64(row-key), 64) so partial aggregates spread
    over 3*64 reducers; phase 2 merges the 192 partials. Decimal sums make
    the two-phase result bit-identical to the direct groupBy (the oracle),
    so the rewrite is proven semantics-preserving. (Spark's own partial
    hash agg already map-side-combines; explicit salting is the pattern
    for when the *final* agg state per key is itself huge — collect_set,
    exact distinct — and is exercised here on plain sums for the oracle.)
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    salted = li.withColumn(
        "salt",
        F.pmod(
            F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber"), F.lit(7)),
            F.lit(64),
        ),
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pq"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("pp"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").cast("bigint").alias("n_rows"),
        F.sum("pq").cast("double").alias("sum_qty"),
        F.sum("pp").cast("double").alias("sum_price"),
    )
