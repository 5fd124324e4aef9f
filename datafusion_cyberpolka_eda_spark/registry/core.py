"""Core relational queries: scans, projections, null ops, sampling, joins,
aggregations, sorts/top-k (SURVEY.md §2 families A-D, G)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.functions.sampling import key_mod_sample
from datafusion_cyberpolka_eda_spark.operators import relational
from datafusion_cyberpolka_eda_spark.registry import _dec_sum, register
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# A/D. Scans, counts, wide aggregation (flagship)
# ---------------------------------------------------------------------------


@register(
    "d2_wide_agg_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d2_wide_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship wide aggregation (operator D2; the reference's 41-target
    one-pass sum, ref: public_eda_pipeline.py:87-92, re-expressed as the
    classic pricing-summary shape). Single hash agg, map-side partial."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "decimal(18,2)").alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "decimal(18,2)").alias("sum_base_price"),
            _dec_sum(disc_price, "decimal(24,4)").alias("sum_disc_price"),
            _dec_sum(charge, "decimal(30,6)").alias("sum_charge"),
            (_dec_sum(F.col("l_quantity"), "decimal(18,2)") / F.count(F.lit(1))).alias("avg_qty"),
            (_dec_sum(F.col("l_extendedprice"), "decimal(18,2)") / F.count(F.lit(1))).alias("avg_price"),
            (_dec_sum(F.col("l_discount"), "decimal(18,2)") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "d1_count_rows",
    """
    SELECT 'lineitem' AS tbl, COUNT(*) AS n FROM lineitem
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    """,
)
def d1_count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row counts (operator D1; ref lines 76-85). Parquet metadata-only."""
    parts = []
    for t in ("lineitem", "orders", "customer"):
        parts.append(
            load_table(spark, sf_dir, t).agg(
                F.lit(t).alias("tbl"), F.count(F.lit(1)).alias("n")
            )
        )
    return relational.union_stack(parts)


@register(
    "b1_b2_project_cast_filter",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS qty,
           l_extendedprice,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    WHERE l_returnflag = 'A' AND l_quantity < 10
    """,
)
def b1_b2_project_cast_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + alias + narrow casts + filter (operators B1/B2; ref
    select/cast sites e.g. lines 88-89, 121). Filter + pruning push to the
    parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_returnflag") == "A") & (F.col("l_quantity") < 10)).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_extendedprice",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )


@register(
    "b3_b4_null_ops",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(NULLIF(l_discount, 0.0) IS NULL AS BIGINT)) AS BIGINT) AS n_zero_disc,
           CAST(SUM(CAST(COALESCE(NULLIF(l_discount, 0.0), -1.0) AS DECIMAL(10,2))) AS DOUBLE) AS filled_sum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def b3_b4_null_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null predicates + null fill (operators B3/B4/B5; ref is_null at lines
    237-251, fill_null(-1) at 412). Testdata has no nulls, so nulls are
    manufactured with NULLIF — semantics identical."""
    li = load_table(spark, sf_dir, "lineitem")
    nulled = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(nulled.isNull().cast("bigint")).alias("n_zero_disc"),
        _dec_sum(F.coalesce(nulled, F.lit(-1.0)), "decimal(10,2)").alias("filled_sum"),
    )


@register(
    "b6_key_stable_sample",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_custkey % 100 < 20
    GROUP BY o_orderstatus
    """,
)
def b6_key_stable_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-stable deterministic sampling (operator B6; ref hash_expr lines
    42-43). The library sampler uses xxhash64 (functions/sampling.py); this
    oracle-checked variant samples by key arithmetic because Polars/DuckDB/
    Spark hashes differ (SURVEY.md §5.3) — same shape: a pushdown-friendly
    filter, ~20% of keys, stable across tables."""
    o = load_table(spark, sf_dir, "orders")
    return (
        key_mod_sample(o, "o_custkey", 20)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("o_totalprice"), "decimal(18,2)").alias("total"),
        )
    )


@register(
    "b7_b8_horizontal_sum",
    """
    WITH f AS (
      SELECT CAST(l_discount > 0.05 AS INT) + CAST(l_tax >= 0.04 AS INT)
             + CAST(l_returnflag = 'A' AS INT) AS score
      FROM lineitem
    )
    SELECT score, COUNT(*) AS n FROM f GROUP BY score
    """,
)
def b7_b8_horizontal_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean derivation + row-wise horizontal sum + value_counts
    (operators B7/B8/D5; ref sum_horizontal lines 283-290, value_counts
    histogram lines 126-135)."""
    li = load_table(spark, sf_dir, "lineitem")
    flags = [
        (F.col("l_discount") > 0.05).cast("int"),
        (F.col("l_tax") >= 0.04).cast("int"),
        (F.col("l_returnflag") == "A").cast("int"),
    ]
    return (
        li.select(relational.horizontal_sum(flags).alias("score"))
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "b9_string_split",
    """
    SELECT split_part(o_orderpriority, '-', 1) AS prio_code, COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def b9_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String split + element extraction (operator B9; ref target_family
    split, lines 52-55)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(F.split(F.col("o_orderpriority"), "-").getItem(0).alias("prio_code"))
        .groupBy("prio_code")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "b10_b11_prefix_conditional",
    """
    SELECT CASE WHEN c_mktsegment LIKE 'A%' THEN 'a_segment' ELSE 'other' END AS seg_class,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer GROUP BY 1
    """,
)
def b10_b11_prefix_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String prefix test + conditional column (operators B10/B11; ref
    startswith classification lines 69-70, np.where at 260)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            F.when(F.col("c_mktsegment").startswith("A"), F.lit("a_segment"))
            .otherwise(F.lit("other"))
            .alias("seg_class"),
            "c_acctbal",
        )
        .groupBy("seg_class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("c_acctbal"), "decimal(18,2)").alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# C. Joins
# ---------------------------------------------------------------------------


@register(
    "c1_join_revenue_by_region",
    """
    SELECT r_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM region
    JOIN nation   ON r_regionkey = n_regionkey
    JOIN customer ON n_nationkey = c_nationkey
    JOIN orders   ON c_custkey = o_custkey
    GROUP BY r_name
    """,
)
def c1_join_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way inner equi-join (operators C1/C3; ref customer_id joins at
    lines 291-295, 470-491). Dimension tables broadcast explicitly — at
    100 TB the fact side never shuffles for these joins."""
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "decimal(18,2)").alias("total"),
        )
    )


@register(
    "c2_presampled_join",
    """
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (SELECT * FROM orders WHERE o_custkey % 100 < 30) o
    JOIN (SELECT * FROM customer WHERE c_custkey % 100 < 30) c
      ON o.o_custkey = c.c_custkey
    """,
)
def c2_presampled_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join of two independently key-stable-sampled tables (operator C2; ref
    lines 330-340) — correct only because sampling is key-stable, so the 30%
    samples align on the join key. Sampling filters sit below the join."""
    o = key_mod_sample(load_table(spark, sf_dir, "orders"), "o_custkey", 30)
    c = key_mod_sample(load_table(spark, sf_dir, "customer"), "c_custkey", 30)
    return o.join(c, o.o_custkey == c.c_custkey).agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(F.col("o_totalprice"), "decimal(18,2)").alias("total"),
    )


@register(
    "c6_anti_join_unseen",
    """
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey FROM supplier
    """,
)
def c6_anti_join_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unseen-category detection as a left-anti join on distincts (operator
    C6; ref set-difference lines 383-397). customer nations unseen among
    suppliers."""
    from datafusion_cyberpolka_eda_spark.operators.profile import unseen_categories

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return unseen_categories(train=supp, test=cust, col="nationkey")


@register(
    "c6b_semi_join",
    """
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def c6b_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (set membership without duplication)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "c7_union_stack",
    """
    WITH u AS (
      SELECT 'customer' AS src, c_acctbal AS bal FROM customer
      UNION ALL
      SELECT 'supplier' AS src, s_acctbal AS bal FROM supplier
    )
    SELECT src, COUNT(*) AS n,
           CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           MIN(bal) AS min_bal, MAX(bal) AS max_bal
    FROM u GROUP BY src
    """,
)
def c7_union_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertical union with source labels (operator C7; ref pd.concat at
    lines 262, 431 — the adversarial train/test stack pattern)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_acctbal").alias("bal"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_acctbal").alias("bal"))
    u = relational.union_stack([cust, supp], "src", ["customer", "supplier"])
    return u.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(F.col("bal"), "decimal(18,2)").alias("total_bal"),
        F.min("bal").alias("min_bal"),
        F.max("bal").alias("max_bal"),
    )


@register(
    "c13_order_revenue_topk",
    """
    SELECT l.l_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def c13_order_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic shipping-priority analytics pipeline (TPC-H Q3 shape):
    selective dim filter -> broadcast customer into orders -> fact join ->
    decimal revenue agg -> top-10. Composes C1/C3 joins, D2 decimal sums
    and G2 top-k in one plan: filters push to all three scans, the
    customer side broadcasts, the limit plans as TakeOrderedAndProject
    (no global sort). Revenue rounds through DECIMAL(24,4) exactly as d2
    does, so the hash compare is float-drift-proof; ties break on
    l_orderkey."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # broadcast ONLY the dim side: orders stays shuffled (it's a fact
    # table at scale); the orders-lineitem join is AQE's choice (SMJ at
    # 100 TB, auto-BHJ when the filtered orders side shrinks enough)
    filtered_orders = o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
    return (
        li.join(filtered_orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _dec_sum(rev, "decimal(24,4)").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue",
            "n_lines",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# D. Aggregations
# ---------------------------------------------------------------------------


@register(
    "d4_group_stats",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def d4_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by count/mean/min/max (operators D4/D7; ref family stats lines
    106-116, decile profile 308-318)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (_dec_sum(F.col("o_totalprice"), "decimal(18,2)") / F.count(F.lit(1))).alias(
            "avg_price"
        ),
    )


@register(
    "d5_value_counts",
    """
    WITH c AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
    SELECT n_orders, COUNT(*) AS n_customers FROM c GROUP BY n_orders
    """,
)
def d5_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of a derived count (operator D5; ref opened-targets
    histogram lines 126-135). Two chained hash aggs."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "d6_band_counts",
    """
    SELECT CAST(SUM(CAST(o_totalprice > 400000 AS BIGINT)) AS BIGINT) AS gt_400k,
           CAST(SUM(CAST(o_totalprice > 200000 AND o_totalprice <= 400000 AS BIGINT)) AS BIGINT) AS b_200_400k,
           CAST(SUM(CAST(o_totalprice > 100000 AND o_totalprice <= 200000 AS BIGINT)) AS BIGINT) AS b_100_200k,
           CAST(SUM(CAST(o_totalprice <= 100000 AS BIGINT)) AS BIGINT) AS le_100k
    FROM orders
    """,
)
def d6_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional band counts in one pass (operator D6; ref missingness
    bands lines 269-280)."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.agg(
        F.sum((p > 400000).cast("bigint")).alias("gt_400k"),
        F.sum(((p > 200000) & (p <= 400000)).cast("bigint")).alias("b_200_400k"),
        F.sum(((p > 100000) & (p <= 200000)).cast("bigint")).alias("b_100_200k"),
        F.sum((p <= 100000).cast("bigint")).alias("le_100k"),
    )


@register(
    "d8_distinct_counts",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_flags
    FROM lineitem
    """,
)
def d8_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (operator D8; ref n_unique lines 372-381).
    The 100 TB path swaps in approx_count_distinct (profile.distinct_counts
    exact=False)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )


@register(
    "d9_distinct_values",
    "SELECT DISTINCT o_orderstatus FROM orders",
)
def d9_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct values, kept distributed (operator D9; ref unique() lines
    383-388)."""
    return load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()


@register(
    "d13_group_mode",
    """
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority ASC) AS rn
      FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS dominant_priority, n
    FROM ranked WHERE rn = 1
    """,
)
def d13_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic group-wise mode (operator D13; ref dominant family per
    cluster lines 220-226). Mode implemented as count + row_number with an
    explicit tiebreak (value asc) — F.mode's tie choice is unspecified."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("dominant_priority"), "n"
        )
    )


# ---------------------------------------------------------------------------
# G. Sorts / top-k / grouped top-k
# ---------------------------------------------------------------------------


@register(
    "g1_g2_topk_global",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def g1_g2_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (operators G1/G2; ref sort_values().head() e.g.
    lines 168-173). Spark plans TakeOrderedAndProject — no full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register(
    "g3_grouped_topk",
    """
    SELECT p_brand, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      FROM part
    ) t WHERE rn <= 3
    """,
)
def g3_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via row_number window (operator G3; ref grouped head()
    lines 535-536, 588-594, 668). Deterministic tiebreak on p_partkey —
    pandas breaks ties by input order, which doesn't distribute."""
    p = load_table(spark, sf_dir, "part")
    return relational.grouped_topk(
        p.select("p_brand", "p_partkey", "p_retailprice"),
        partition_cols=["p_brand"],
        order_col="p_retailprice",
        k=3,
        tiebreak_cols=["p_partkey"],
    )
