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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.registry import _dec_sum, register, small_df
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


@register(
    "c12_salted_skew_join",
    """
    WITH dim AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS prio_total
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MAX(d.prio_total) AS prio_total,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders o JOIN dim d ON o.o_orderpriority = d.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
)
def c12_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted JOIN for hot keys — the join-side twin of c9's salted agg.

    The fact side joins a per-priority rollup on o_orderpriority: 5
    distinct values, so a shuffled join hashes the entire fact table onto
    5 reducers. Salting: replicate the dim side across 64 salt values
    (explode — viable whenever the hot-key side is replicable), give each
    fact row a deterministic salt from its row identity, and join on
    (key, salt) — 5*64 balanced partitions instead of 5 hot ones. Decimal
    sums make the salted plan's result bit-identical to the direct join,
    which is the oracle, proving the rewrite semantics-preserving.

    At real scale: AQE's skew-join splitting automates this for sort-merge
    joins it can observe, and a truly small dim should broadcast instead;
    explicit salting remains the tool when the dim exceeds broadcast
    thresholds but hot keys would still serialize reducers (classic:
    joining a power-law fact to a mid-size entity table)."""
    n_salt = 64
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    dim = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("prio_total")
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(n_salt)]))
    )
    fact_salted = orders.withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey", F.lit(11)), F.lit(n_salt)).cast("int")
    )
    joined = fact_salted.join(dim_salted, ["o_orderpriority", "salt"])
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.max("prio_total").alias("prio_total"),
        _dec_sum(F.col("o_totalprice"), "decimal(18,2)").alias("sum_price"),
    )


@register(
    "c10_bloom_join_prefilter",
    """
    WITH cut AS (
      SELECT percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS c FROM orders
    ),
    w AS (SELECT o_orderkey FROM orders WHERE o_totalprice >= (SELECT c FROM cut))
    SELECT CAST(COUNT(*) AS BIGINT) AS true_semi_count,
           TRUE AS bloom_keeps_all_matches,
           TRUE AS bloom_fp_rate_below_5pct
    FROM lineitem l JOIN w ON l.l_orderkey = w.o_orderkey
    """,
)
def c10_bloom_join_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pre-filtering — the 100 TB shuffle-reduction
    technique: build a Bloom filter over a selective dimension side (the
    top-1%-price "whale" orders), ship it to the fact side as a ONE-ROW
    BROADCAST RELATION, filter the fact table BEFORE any shuffle, then
    run the real join on the survivors. Built entirely from public
    expressions (xxhash64 K-way hashing, bit_or word aggregation,
    map_from_entries densification — `bloom_filter_agg`/`might_contain`
    are internal-only in this build and not SQL-resolvable, and PySpark 4
    removed df.stat.bloomFilter): the build is one map-side-combined agg
    over the keys, the densified word array never touches the driver
    (round 2 collected it and inlined a literal array — a 20-200 MB
    expression-tree literal at 10^7-10^8 keys; now it rides Spark's
    torrent broadcast like any dim table), and the probe is whole-stage-
    codegen bit tests against the joined array column. bit-OR is
    order-independent so the result is partition-deterministic. The only
    driver scalars are the percentile cutoff and the key COUNT for
    sizing (two 8-byte values — the documented driver-matrix boundary).
    The oracle pins the exact semi-join count plus two contracts: no
    false negatives (guaranteed by construction, asserted anyway) and
    observed false-positive rate under 5% (sized 16 bits/key, K=5 ->
    ~0.1% theoretical). Catalyst's runtime row-level filtering does this
    automatically where it can see through; the explicit form covers
    sources and custom operators it can't. Sizing at 1e8 keys: SCALE.md
    "Bloom sketch sizing"."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = orders.agg(F.expr("percentile(o_totalprice, 0.99)")).collect()[0][0]
    whales = orders.filter(F.col("o_totalprice") >= F.lit(cut)).select("o_orderkey")
    n_keys = whales.count()
    n_words = max((16 * n_keys + 63) // 64, 2)
    m_bits = 64 * n_words
    n_hash = 5

    hashes = [
        F.pmod(F.xxhash64("o_orderkey", F.lit(j)), F.lit(m_bits)) for j in range(n_hash)
    ]
    words = (
        whales.select(F.explode(F.array(*hashes)).alias("idx"))
        .selectExpr(
            "CAST(idx DIV 64 AS INT) AS word",
            "shiftleft(CAST(1 AS BIGINT), CAST(idx % 64 AS INT)) AS mask",
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask) AS mask"))
    )
    # densify sparse (word, mask) pairs into one array<long> row JVM-side
    bf_row = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("_wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(int(n_words - 1))),
            lambda w: F.coalesce(
                F.element_at(F.col("_wm"), w), F.lit(0).cast("long")
            ),
        ).alias("__bf")
    )

    keys = li.select("l_orderkey").join(F.broadcast(bf_row))
    for j in range(n_hash):
        keys = keys.withColumn(
            f"__i{j}", F.pmod(F.xxhash64("l_orderkey", F.lit(j)), F.lit(m_bits))
        )
    probe = " AND ".join(
        f"((element_at(__bf, CAST(__i{j} DIV 64 AS INT) + 1) "
        f">> CAST(__i{j} % 64 AS INT)) & 1) = 1"
        for j in range(n_hash)
    )
    # one pass over the fact keys: bloom verdict per row + true membership
    # (broadcast left join) -> row counts AND distinct-key contingency in a
    # single aggregation job (a count per statistic was 2x the wall time)
    tagged = (
        keys.withColumn("__hit", F.expr(probe).cast("int"))
        .join(
            F.broadcast(whales.withColumn("__member", F.lit(1))),
            keys.l_orderkey == whales.o_orderkey,
            "left",
        )
        .select(
            "l_orderkey", "__hit", F.coalesce("__member", F.lit(0)).alias("__member")
        )
    )
    # key-level rollup first (multiple countDistinct in one agg would
    # trigger Catalyst's Expand — the d8b lesson), then one scalar agg
    per_key = tagged.groupBy("l_orderkey").agg(
        F.max("__hit").alias("hit"),
        F.max("__member").alias("member"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    r = per_key.agg(
        F.sum(F.col("member") * F.col("n_rows")).alias("true_rows"),
        F.sum(F.col("member") * (1 - F.col("hit")) * F.col("n_rows")).alias(
            "missed_rows"
        ),
        F.sum("hit").alias("d_pre"),
        F.sum("member").alias("d_true"),
        F.count(F.lit(1)).alias("d_all"),
    ).collect()[0]
    # fp rate = false positives / probed NON-members (the textbook fpp
    # definition) — dividing by survivors would make the metric collapse
    # whenever the member set is small relative to the key universe
    non_members = max(int(r["d_all"]) - int(r["d_true"]), 1)
    fp_rate = (int(r["d_pre"]) - int(r["d_true"])) / non_members
    return small_df(
        spark,
        [(int(r["true_rows"]), int(r["missed_rows"] or 0) == 0, fp_rate < 0.05)],
        "true_semi_count bigint, bloom_keeps_all_matches boolean, "
        "bloom_fp_rate_below_5pct boolean",
    )


@register(
    "a10_sharded_export",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
             AS content_checksum,
           TRUE AS files_respect_cap,
           TRUE AS shard_ranges_disjoint
    FROM documents
    """,
)
def a10_sharded_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export — the sink side of a training-data pipeline:
    range-shard the corpus on doc_id (repartitionByRange + in-partition
    sort), cap rows per output file (maxRecordsPerFile), so consumers get
    bounded, globally ordered, binary-searchable shards. Verified on
    read-back: (1) content survives bit-exact — count, char sum, and an
    md5-prefix checksum DuckDB recomputes from the source table; (2) no
    file exceeds the cap; (3) per-file doc_id ranges are pairwise
    disjoint (the property that makes range access O(1) files). At 100 TB
    this is one range-shuffle write; the layout checks run over the
    per-FILE stats table (thousands of rows), not row data."""
    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_SCRATCH, f"{_tag(sf_dir)}_doc_shards")
    cap = 500
    (
        docs.repartitionByRange(8, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", cap)
        .parquet(path)
    )
    back = spark.read.parquet(path)
    content = back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10)
            .cast("bigint")
        ).cast("bigint").alias("content_checksum"),
    )
    # per-file layout stats: tiny table (n_files rows); the ordering window
    # over it is bounded by file count, not data size. The _metadata.file_path
    # hidden column (not input_file_name(), which returns '' under
    # DataSourceV2 readers and would collapse all files into one pseudo-file)
    fstats = back.select("*", "_metadata.file_path").groupBy(
        F.col("file_path").alias("f")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    )
    w = Window.orderBy("lo")
    layout = fstats.withColumn("prev_hi", F.lag("hi").over(w)).agg(
        F.max("n_rows").alias("max_rows"),
        F.min(
            F.when(F.col("prev_hi").isNull(), True).otherwise(
                F.col("prev_hi") < F.col("lo")
            ).cast("int")
        ).alias("disjoint"),
    )
    return content.join(F.broadcast(layout)).select(
        "n_docs",
        "total_chars",
        "content_checksum",
        (F.col("max_rows") <= cap).alias("files_respect_cap"),
        (F.col("disjoint") == 1).alias("shard_ranges_disjoint"),
    )


@register(
    "b15_stratified_sample",
    """
    WITH s AS (
      SELECT lang,
             CASE WHEN lang = 'en' THEN 10 ELSE 30 END AS quota,
             doc_id % 100 AS bucket
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN bucket < quota THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           ROUND(CAST(SUM(CASE WHEN bucket < quota THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS sample_rate
    FROM s GROUP BY lang
    """,
)
def b15_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified per-language quota sampling (training-data rebalancing:
    downsample the dominant language, keep the rest). The sampler is a
    pure map-side filter under the scan — no shuffle, key-stable so
    independently sampled tables still join (functions/sampling.
    stratified_key_sample). The portable key-mod variant is used here so
    DuckDB replays membership exactly; production uses the xxhash64
    bucket (same plan shape). Output compares per-stratum totals vs
    sampled counts."""
    from datafusion_cyberpolka_eda_spark.functions.sampling import (
        stratified_key_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_key_sample(
        docs, "doc_id", "lang", rates={"en": 10}, default_rate=30, portable=True
    ).groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
    totals = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    out = totals.join(sampled, "lang", "left").select(
        "lang",
        "n_total",
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        F.round(
            F.coalesce("n_sampled", F.lit(0)).cast("double") / F.col("n_total"), 6
        ).alias("sample_rate"),
    )
    return out


@register(
    "b16_group_reservoir",
    """
    WITH h AS (
      SELECT lang, doc_id, n_chars,
             (doc_id * 2654435761) % 4294967296 AS hkey
      FROM documents
    )
    SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM (SELECT lang, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY hkey, doc_id) AS rk
          FROM h)
    WHERE rk <= 20
    """,
)
def b16_group_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-group deterministic sampling — the fixed-budget cousin
    of stratified rate sampling (b15): keep exactly 20 docs per language,
    chosen by rank of a Knuth multiplicative hash of the key. Same
    guarantees as a seeded reservoir (uniform-ish, stable under
    reordering, reproducible across engines — the hash is plain integer
    arithmetic both engines replay bitwise) but expressible as one
    grouped top-k: a single shuffle on the group key, per-partition heaps
    via row_number, no RNG state. Production note: for very hot groups,
    pre-filter `hkey < threshold` (a map-side cut keeping ~2k candidates)
    before the window — same answer, bounded sort."""
    from datafusion_cyberpolka_eda_spark.operators.relational import grouped_topk

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars",
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)).alias("hkey"),
    )
    out = grouped_topk(
        docs, ["lang"], "hkey", k=20, ascending=True, tiebreak_cols=["doc_id"]
    )
    return out.select("lang", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))


@register(
    "e10b_approx_quantile_bound",
    """
    WITH q AS (
      SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
             percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99
      FROM orders
    )
    SELECT ROUND(p50, 6) AS exact_p50, ROUND(p99, 6) AS exact_p99,
           TRUE AS approx_within_rank_eps
    FROM q
    """,
)
def e10b_approx_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB quantile path (operator E10's scale variant):
    approxQuantile (Greenwald-Khanna, bounded memory, single pass) next
    to the exact percentile, asserting the estimate's RANK error is
    within the requested epsilon (0.005) — checked as the theorem states
    it: some rank of the returned element (they span [count_lt+1,
    count_le]) must lie within eps*n (+1 slack for floor conventions) of
    the target rank. The r9 bitwise A/B audit showed the previous check
    (approx value between the exact (p+-eps)-quantile VALUES) could flip
    under permuted partitioning: GK's merge order changes which element
    is returned, and interpolated percentile values make a tighter
    interval than the rank guarantee actually promises. The rank form
    holds for ANY layout by the GK bound. The oracle pins the exact
    values and the bound boolean. Exact percentile needs a full
    sort/collect per group — GK is what survives at scale."""
    o = load_table(spark, sf_dir, "orders")
    eps = 0.005
    exact = o.agg(
        F.expr("percentile(o_totalprice, array(0.5, 0.99))").alias("q")
    ).collect()[0]["q"]
    p50, p99 = [float(x) for x in exact]
    a50, a99 = o.approxQuantile("o_totalprice", [0.5, 0.99], eps)
    cnt = o.agg(
        F.count("o_totalprice").alias("n"),
        F.sum((F.col("o_totalprice") < a50).cast("long")).alias("lt50"),
        F.sum((F.col("o_totalprice") <= a50).cast("long")).alias("le50"),
        F.sum((F.col("o_totalprice") < a99).cast("long")).alias("lt99"),
        F.sum((F.col("o_totalprice") <= a99).cast("long")).alias("le99"),
    ).collect()[0]

    def rank_ok(p: float, lt: int, le: int, n: int) -> bool:
        return le >= p * n - eps * n - 1 and lt + 1 <= p * n + eps * n + 1

    ok = rank_ok(0.5, cnt["lt50"], cnt["le50"], cnt["n"]) and rank_ok(
        0.99, cnt["lt99"], cnt["le99"], cnt["n"]
    )
    out = small_df(
        spark,
        [(p50, p99, ok)],
        "exact_p50 double, exact_p99 double, approx_within_rank_eps boolean",
    )
    return out.select(
        F.round("exact_p50", 6).alias("exact_p50"),
        F.round("exact_p99", 6).alias("exact_p99"),
        "approx_within_rank_eps",
    )


# ---------------------------------------------------------------------------
# d17: Count-Min-Sketch heavy hitters (portable universal-hash family)
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 256
_CMS_SEED = 1717
_CMS_P = 2147483647  # Mersenne 2^31-1 (functions/hashing universal family)


def _cms_params() -> list[tuple[int, int]]:
    from datafusion_cyberpolka_eda_spark.functions.hashing import perm_constants

    return perm_constants(_CMS_DEPTH, seed=_CMS_SEED)


def _cms_oracle() -> str:
    rows = ",".join(
        f"({d}, {a}, {b})" for d, (a, b) in enumerate(_cms_params())
    )
    hash_sql = (
        "((p.a * ({key} % 2147483647) + p.b) % 2147483647) % " + str(_CMS_WIDTH)
    )
    return f"""
    WITH p(depth, a, b) AS (VALUES {rows}),
    tot AS (SELECT COUNT(*) AS n FROM events),
    bkt AS (
      SELECT p.depth, {hash_sql.format(key="e.user_id")} AS bucket,
             COUNT(*) AS cnt
      FROM events e CROSS JOIN p GROUP BY 1, 2
    ),
    cand AS (
      SELECT user_id, COUNT(*) AS true_count
      FROM events WHERE user_id < 20 GROUP BY user_id
    ),
    est AS (
      SELECT c.user_id, c.true_count, MIN(b.cnt) AS est_count
      FROM cand c CROSS JOIN p
      JOIN bkt b ON b.depth = p.depth
                AND b.bucket = {hash_sql.format(key="c.user_id")}
      GROUP BY 1, 2
    )
    SELECT est.user_id,
           CAST(est_count AS BIGINT) AS est_count,
           CAST(true_count AS BIGINT) AS true_count,
           est_count >= true_count AS est_ge_true,
           est_count <= true_count
             + ((2 * (SELECT n FROM tot) + {_CMS_WIDTH - 1}) // {_CMS_WIDTH})
             AS within_2eps_bound
    FROM est
    """


@register("d17_heavy_hitters_cms", _cms_oracle())
def d17_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch frequency estimation — THE mergeable fixed-size
    sketch for heavy hitters over unbounded key domains (alongside HLL
    d8b, GK e10b, Bloom c10). depth x width = 4 x 256 counters built in
    ONE pass: each row contributes to 4 (depth, bucket) cells via the
    portable universal-hash family (functions/hashing — identical
    arithmetic in DuckDB, so the oracle replays the ENTIRE sketch:
    counters, point estimates, min-over-depths, and both CMS guarantees).
    Point queries for the 20 benchmark keys join the 1024-row broadcast
    sketch; checked properties: est >= true (CMS never undercounts) and
    est <= true + 2N/w (the eps-bound at double the standard eps for
    min-of-4 safety; empirically est == true here since N/w keeps bucket
    collisions sparse).

    100 TB design: the sketch aggregation carries only depth*width
    groups, so the shuffle after map-side combine is ~1024 rows per
    partition regardless of input size; sketches merge by counter
    addition (streaming/multi-day rollups just re-aggregate); point
    lookups are a broadcast join. No per-key state ever materializes —
    that is the whole point vs an exact groupBy at 10^9+ distinct keys."""
    e = load_table(spark, sf_dir, "events")
    params = _cms_params()
    P, W = _CMS_P, _CMS_WIDTH

    def buckets(key_col):
        x = F.pmod(key_col.cast("long"), F.lit(P))
        return [
            F.pmod(F.lit(a).cast("long") * x + F.lit(b), F.lit(P)) % W
            for a, b in params
        ]

    pairs = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("depth"), bkt.alias("bucket")
            )
            for d, bkt in enumerate(buckets(F.col("user_id")))
        ]
    )
    sketch = (
        e.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cand = (
        e.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    cpairs = cand.select(
        "user_id",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("depth"),
                        bkt.alias("bucket"),
                    )
                    for d, bkt in enumerate(buckets(F.col("user_id")))
                ]
            )
        ).alias("p"),
    ).select(
        "user_id", "true_count",
        F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket"),
    )
    est = (
        cpairs.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    total = e.agg(F.count(F.lit(1)).alias("n"))
    return (
        est.join(F.broadcast(total))
        .select(
            "user_id",
            F.col("est_count").cast("bigint").alias("est_count"),
            F.col("true_count").cast("bigint").alias("true_count"),
            (F.col("est_count") >= F.col("true_count")).alias("est_ge_true"),
            (
                F.col("est_count")
                <= F.col("true_count")
                + F.expr(f"(2 * n + {W - 1}) div {W}")
            ).alias("within_2eps_bound"),
        )
    )


@register(
    "b17_weighted_sample",
    """
    WITH s AS (
      SELECT o_orderkey,
             -ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
                       AS DOUBLE) + 0.5) / 1152921504606846976.0)
               / o_totalprice AS race
      FROM orders
    )
    SELECT o_orderkey, ROUND(race, 6) AS race_key
    FROM s ORDER BY race, o_orderkey LIMIT 200
    """,
)
def b17_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES;
    extends B6/b15 to probability-proportional-to-size — the training-mix
    move when rows carry importance weights): each row draws a
    deterministic uniform from the portable md5 hash of its key and races
    with exponential key -ln(u)/w; the k smallest keys are the sample.
    Map-side key computation under the scan + TakeOrdered top-k — no full
    sort, no shuffle beyond the k-row reduction; the draw is key-stable
    and replayed exactly by the oracle (race emitted at 6 dp; ln agrees
    across engines to the last ulp or two, far inside the rounding)."""
    from datafusion_cyberpolka_eda_spark.functions.sampling import (
        weighted_sample_topk,
    )

    o = load_table(spark, sf_dir, "orders")
    return weighted_sample_topk(
        o, "o_orderkey", "o_totalprice", k=200, portable=True
    ).select("o_orderkey", F.round("race", 6).alias("race_key"))


@register(
    "a11_small_file_compaction",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
             AS content_checksum,
           CAST(24 AS BIGINT) AS n_files_before,
           TRUE AS file_count_reduced,
           TRUE AS rows_preserved
    FROM documents
    """,
)
def a11_small_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (the lakehouse OPTIMIZE loop; sink-side twin
    of a10): a fragmented layout (24 deliberately tiny files) is compacted
    to ceil(total_bytes / target_file_bytes) files via coalesce — the
    file-count math runs over per-FILE metadata (_metadata.file_size on
    distinct paths), never row data, and coalesce avoids a shuffle
    entirely (partition concatenation, the right move when output count
    only shrinks). Verified on read-back: md5-prefix content checksum
    survives both hops (computed as a cross-engine SUM the oracle replays
    from the source table) and the file count strictly drops. At 100 TB
    the same job runs per partition-directory with target_file_bytes =
    128 MB -- the compaction unit stays a metadata decision + one
    narrow write."""
    docs = load_table(spark, sf_dir, "documents")
    small_path = os.path.join(_SCRATCH, f"{_tag(sf_dir)}_frag_docs")
    compact_path = os.path.join(_SCRATCH, f"{_tag(sf_dir)}_compact_docs")
    docs.repartition(24).write.mode("overwrite").parquet(small_path)

    back = spark.read.parquet(small_path)
    checksum = F.sum(
        F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10)
        .cast("bigint")
    ).cast("bigint")
    fmeta = (
        back.select("_metadata.file_path", "_metadata.file_size")
        .groupBy("file_path")
        .agg(F.first("file_size").alias("fbytes"))
        .agg(F.count(F.lit(1)).alias("n_before"), F.sum("fbytes").alias("total_bytes"))
        .collect()[0]
    )
    target_file_bytes = 4 * 1024 * 1024
    k = min(int(fmeta["n_before"]), max(1, -(-int(fmeta["total_bytes"]) // target_file_bytes)))
    back.coalesce(k).write.mode("overwrite").parquet(compact_path)

    back2 = spark.read.parquet(compact_path)
    before = back.agg(
        F.count(F.lit(1)).alias("n_docs"), checksum.alias("cs_before")
    )
    after = back2.agg(
        checksum.alias("cs_after"),
        F.countDistinct("_metadata.file_path").alias("n_after"),
    )
    return before.join(F.broadcast(after)).select(
        "n_docs",
        F.col("cs_before").alias("content_checksum"),
        F.lit(fmeta["n_before"]).cast("bigint").alias("n_files_before"),
        (F.col("n_after") < F.lit(fmeta["n_before"])).alias("file_count_reduced"),
        (F.col("cs_after") == F.col("cs_before")).alias("rows_preserved"),
    )


def _z_terms_sql(rp: str, rs: str, bits: int = 8) -> str:
    """DuckDB expression interleaving the low ``bits`` bits of two integer
    expressions into a Z-value (Morton code) — generated so the Spark
    column and the oracle SQL come from the same bit layout."""
    return " + ".join(
        f"((({rp} >> {i}) & 1) << {2 * i}) + ((({rs} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )


def _z_value_col(rp, rs, bits: int = 8):
    """Spark column computing exactly _z_terms_sql(rp, rs)."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(rp, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(rs, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


@register(
    "a12_zorder_layout",
    f"""
    WITH b AS (
      SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
             MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
      FROM lineitem
    ), q AS (
      SELECT ((l_partkey - pmin) * 256) // (pmax - pmin + 1) AS rp,
             ((l_suppkey - smin) * 256) // (smax - smin + 1) AS rs,
             l_partkey, l_suppkey, pmin, pmax, smin, smax
      FROM lineitem CROSS JOIN b
    ), z AS (
      SELECT ({_z_terms_sql('rp', 'rs')}) AS zval,
             l_partkey, l_suppkey, pmin, pmax, smin, smax
      FROM q
    )
    SELECT zval // 4096 AS file_id,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS part_lo, MAX(l_partkey) AS part_hi,
           MIN(l_suppkey) AS supp_lo, MAX(l_suppkey) AS supp_hi,
           CAST(MAX(l_partkey) - MIN(l_partkey) AS DOUBLE)
             / CAST(MIN(pmax) - MIN(pmin) + 1 AS DOUBLE) AS part_extent,
           CAST(MAX(l_suppkey) - MIN(l_suppkey) AS DOUBLE)
             / CAST(MIN(smax) - MIN(smin) + 1 AS DOUBLE) AS supp_extent
    FROM z GROUP BY 1
    """,
)
def a12_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering for multi-dimensional data
    skipping — the Delta/Iceberg OPTIMIZE ZORDER move, as pure
    expressions: quantize each dimension to 8-bit ranks with exact
    integer arithmetic, interleave the bits into a Z-value (generated
    identically for Spark and the oracle by _z_terms_sql), and range the
    rows into 16 files by Z prefix — a map-side computation (no window,
    no shuffle until the final per-file stats agg). The emitted per-file
    min/max extents ARE the parquet footer stats a reader would prune on;
    a file pins the top 2 bits of BOTH dims, so each extent is ~1/4 of
    the key range (vs ~1 for a single-dim sort's non-sorted dim) — that
    bound is asserted in tests. At 100 TB: repartitionByRange(zval) +
    sortWithinPartitions(zval) before the write; the quantization bounds
    come from a first metadata-cheap pass exactly as here."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    b = li.agg(
        F.min("l_partkey").alias("pmin"), F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"), F.max("l_suppkey").alias("smax"),
    )
    j = li.join(F.broadcast(b))
    rp = F.expr("CAST(((l_partkey - pmin) * 256) DIV (pmax - pmin + 1) AS BIGINT)")
    rs = F.expr("CAST(((l_suppkey - smin) * 256) DIV (smax - smin + 1) AS BIGINT)")
    z = _z_value_col(rp, rs)
    prange = (F.min("pmax") - F.min("pmin") + 1).cast("double")
    srange = (F.min("smax") - F.min("smin") + 1).cast("double")
    return (
        j.withColumn("zval", z)
        .groupBy((F.col("zval") / 4096).cast("bigint").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("part_lo"), F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"), F.max("l_suppkey").alias("supp_hi"),
            ((F.max("l_partkey") - F.min("l_partkey")).cast("double") / prange)
            .alias("part_extent"),
            ((F.max("l_suppkey") - F.min("l_suppkey")).cast("double") / srange)
            .alias("supp_extent"),
        )
    )
