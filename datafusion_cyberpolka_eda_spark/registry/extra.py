"""Additional operator coverage: set operations (SURVEY.md §2 family H),
isin filters (B12), rollup/grouping-set aggregation, pivot, text quality
scoring and the oracle-checked language-ID argmax."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.functions import text as T
from datafusion_cyberpolka_eda_spark.registry import _dec_sum, _round_cols, register, small_df
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table, spread


@register(
    "h1_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def h1_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (family H): nations present among both customers
    and suppliers. Distinct semantics on both engines."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "h2_except_all",
    """
    SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
    """,
)
def h2_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL — bag semantics, preserves
    multiplicity)."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("prio"))
    p = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_orderpriority").alias("prio"))
    return f.exceptAll(p)


@register(
    "b12_isin_filter",
    """
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7)
    GROUP BY c_mktsegment
    """,
)
def b12_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isin membership filter (operator B12; ref line 590). Pushed to the
    parquet scan as an In filter."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_nationkey").isin(1, 3, 5, 7))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("c_acctbal"), "decimal(18,2)").alias("total_bal"),
        )
    )


@register(
    "d14_rollup",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def d14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup aggregation (status -> status+priority -> grand
    total) — beyond the reference's flat aggs; one pass with grouping
    sets. NULL group markers normalized to 'ALL' for hash comparison."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("o_totalprice"), "decimal(18,2)").alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "g5_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def g5_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide reshape) with explicit pivot values — compiles to the
    same conditional-aggregate plan as the oracle's CASE WHEN form."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )
    return p.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@register(
    "l5b_quality_scores",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(CAST(LENGTH(text) - LENGTH(REPLACE(REPLACE(text, '.', ''), ',', '')) AS DOUBLE)
                     / GREATEST(LENGTH(text), 1)), 6) AS avg_punct_ratio,
           ROUND(AVG(CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' '))), 6) AS avg_chars_per_token,
           CAST(SUM(CAST(len(string_split(text, ' ')) >= 20 AS BIGINT)) AS BIGINT) AS n_docs_ge_20_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS total_bpeish_tokens
    FROM documents GROUP BY source
    """,
)
def l5b_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality-score components per source: punctuation ratio,
    chars-per-token, length threshold counts — the filters a training-data
    pipeline applies before ingestion."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    ntok = T.token_count("text")
    punct = (
        F.length("text")
        - F.length(F.replace(F.replace(F.col("text"), F.lit("."), F.lit("")), F.lit(","), F.lit("")))
    ).cast("double") / F.greatest(F.length("text"), F.lit(1))
    out = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(punct).alias("avg_punct_ratio"),
        F.avg(F.length("text").cast("double") / ntok).alias("avg_chars_per_token"),
        F.sum((ntok >= 20).cast("bigint")).alias("n_docs_ge_20_tokens"),
        F.sum(T.regex_token_count("text", r"[A-Za-z0-9]+|[^A-Za-z0-9 ]").cast("bigint")).alias(
            "total_bpeish_tokens"
        ),
    )
    return _round_cols(out, ["avg_punct_ratio", "avg_chars_per_token"])


def _lang_id_oracle() -> str:
    score = {
        code: (
            "len(list_intersect(string_split(text, ' '), ["
            + ", ".join(f"'{w}'" for w in T.LANG_MARKERS[code])
            + "]))"
        )
        for code in sorted(T.LANG_MARKERS)
    }
    g = "GREATEST(" + ", ".join(score.values()) + ")"
    cases = " ".join(
        f"WHEN {score[code]} = __g THEN '{code}'" for code in sorted(T.LANG_MARKERS)
    )
    return f"""
    WITH scored AS (
      SELECT lang, {g} AS __g, text FROM documents
    )
    SELECT lang,
           CASE WHEN __g = 0 THEN 'und' {cases} END AS predicted,
           COUNT(*) AS n
    FROM scored GROUP BY 1, 2
    """


@register("l6c_lang_id_argmax", _lang_id_oracle())
def l6c_lang_id_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic, oracle-checked: argmax of per-language marker
    scores with alphabetical tiebreak ('und' when nothing matches) — the
    Spark argmax fold and the SQL GREATEST/CASE chain must agree exactly."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("lang", T.lang_id("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "j4_asof_join",
    """
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           c.value AS click_value_asof,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def j4_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (an operator Spark lacks natively): for each
    purchase, the user's latest at-or-before click. Implemented as
    union + ordered window (operators/asof.py) — one shuffle on user_id,
    no range explosion; DuckDB's native ASOF JOIN is the oracle."""
    from datafusion_cyberpolka_eda_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(purchases, clicks, on=["user_id"], ts_col="ts", payload_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("value_asof").alias("click_value_asof"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss").alias("click_ts_asof"),
    )


@register(
    "j5_range_join",
    """
    SELECT p.event_id, p.user_id,
           CAST(COUNT(c.ts) FILTER (WHERE c.ts > p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR) AS BIGINT) AS n_in_window
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') c
      ON p.user_id = c.user_id
    GROUP BY p.event_id, p.user_id
    """,
)
def j5_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (key equality + time interval): views within 1h after
    each purchase. Equi-join + conditional count; the bucketized variant
    for non-selective keys is documented in operators/asof.py."""
    from datafusion_cyberpolka_eda_spark.operators.asof import range_join_count

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = range_join_count(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        window_seconds=3600,
    )
    return out.select("event_id", "user_id", "n_in_window")


@register(
    "d15_cube",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def d15_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all grouping-set combinations in one pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("l_quantity"), "decimal(18,2)").alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "c5_left_join",
    """
    SELECT c.c_custkey,
           c.c_mktsegment,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(COALESCE(o.o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def c5_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched rows (operator C5; ref metadata
    merge at lines 573-582) — customers without orders appear with zero
    counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _dec_sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), "decimal(18,2)").alias(
                "total_spent"
            ),
        )
    )


@register(
    "d12_group_median",
    """
    SELECT o_orderpriority,
           ROUND(median(o_totalprice), 6) AS median_price,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def d12_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by with exact median + nunique (operators D10-D12; ref whale
    candidate rollup lines 656-665 uses median lift). Both engines
    interpolate the even-count median; rounded to 6 dp."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 6).alias("median_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "c11_merge_upsert",
    """
    WITH updates AS (
      SELECT c_custkey AS key, c_acctbal + 100.0 AS new_bal FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 50.0 FROM customer WHERE c_custkey % 97 = 0
    ),
    merged AS (
      SELECT COALESCE(u.key, c.c_custkey) AS key,
             COALESCE(c.c_mktsegment, 'NEW') AS segment,
             COALESCE(u.new_bal, c.c_acctbal) AS bal
      FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.key
    )
    SELECT segment, COUNT(*) AS n,
           CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM merged GROUP BY segment
    """,
)
def c11_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 merge/upsert over plain parquet (no MERGE INTO without a v2
    catalog): snapshot FULL OUTER JOIN updates on the key, COALESCE picks
    updated values, unmatched update rows become inserts. One shuffle on
    the key; at 100 TB bucket both sides on the key (c8) so the nightly
    merge never reshuffles the snapshot. Update arithmetic is the same
    IEEE add on both engines; sums go through DECIMAL."""
    c = load_table(spark, sf_dir, "customer")
    updates = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .select(F.col("c_custkey").alias("key"), (F.col("c_acctbal") + 100.0).alias("new_bal"))
        .unionByName(
            c.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).alias("key"), F.lit(50.0).alias("new_bal")
            )
        )
    )
    merged = (
        c.join(updates, c.c_custkey == updates.key, "full_outer")
        .select(
            F.coalesce(updates.key, c.c_custkey).alias("key"),
            F.coalesce(c.c_mktsegment, F.lit("NEW")).alias("segment"),
            F.coalesce(updates.new_bal, c.c_acctbal).alias("bal"),
        )
    )
    return merged.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(F.col("bal"), "decimal(18,2)").alias("total_bal"),
    )


@register(
    "c14_scd2_history",
    """
    WITH updates AS (
      SELECT s_suppkey AS key, s_acctbal + 250.0 AS new_bal
      FROM supplier WHERE s_suppkey % 7 = 0
    ),
    history AS (
      SELECT s.s_suppkey AS key, s.s_nationkey AS nationkey,
             s.s_acctbal AS bal, 1 AS version,
             (u.key IS NULL) AS is_current
      FROM supplier s LEFT JOIN updates u ON s.s_suppkey = u.key
      UNION ALL
      SELECT u.key, s.s_nationkey, u.new_bal, 2 AS version, TRUE
      FROM updates u JOIN supplier s ON s.s_suppkey = u.key
    )
    SELECT nationkey, version, is_current,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM history GROUP BY nationkey, version, is_current
    """,
)
def c14_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history tracking — the history-preserving twin of c11's
    SCD-1 overwrite: an update batch CLOSES the matched current rows
    (is_current=false, their version stays) and APPENDS new current
    versions, so every past value stays queryable ("as of version N").
    Left join marks closed rows, union appends the new versions; one
    shuffle on the key, append-only writes — the layout that works on
    immutable object storage at 100 TB (no in-place mutation). Versions
    are explicit integers, not wall-clock, so the whole history is
    deterministic and the oracle replays it exactly."""
    s = load_table(spark, sf_dir, "supplier")
    updates = s.filter(F.col("s_suppkey") % 7 == 0).select(
        F.col("s_suppkey").alias("key"),
        (F.col("s_acctbal") + 250.0).alias("new_bal"),
    )
    closed = (
        s.join(updates, s.s_suppkey == updates.key, "left")
        .select(
            F.col("s_suppkey").alias("key"),
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_acctbal").alias("bal"),
            F.lit(1).alias("version"),
            F.col("key").isNull().alias("is_current"),
        )
    )
    appended = (
        updates.join(s, s.s_suppkey == updates.key)
        .select(
            "key",
            F.col("s_nationkey").alias("nationkey"),
            F.col("new_bal").alias("bal"),
            F.lit(2).alias("version"),
            F.lit(True).alias("is_current"),
        )
    )
    history = closed.unionByName(appended)
    return history.groupBy("nationkey", "version", "is_current").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        _dec_sum(F.col("bal"), "decimal(18,2)").alias("total_bal"),
    )


@register(
    "l15_fuzzy_name_pairs",
    """
    WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 300)
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM p a JOIN p b ON a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def l15_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching (entity-resolution primitive): near-identical
    part names within edit distance 3, via the built-in JVM levenshtein.
    Brute-force pairs on a keyed slice here; at 100 TB generate candidates
    first (SimHash/MinHash buckets, l3/l4) and reserve edit distance for
    in-bucket verification — levenshtein is O(len^2) per pair and must
    never meet an unbucketed cross join."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 300)
        .select("p_partkey", "p_name")
    )
    a = p.select(F.col("p_partkey").alias("id_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("id_b"), F.col("p_name").alias("name_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("id_a", "id_b", "name_a", "name_b", "edit_dist")
    )


def _pagerank_oracle(iters: int = 10, d: float = 0.85) -> str:
    """Unrolled-CTE PageRank: DuckDB's recursive CTEs can't aggregate in
    the recursive part, so fixed iterations unroll to a chained CTE list
    — same fixed-point arithmetic as the Spark loop."""
    base = """
    WITH e AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst, CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    ow AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),
    en AS (SELECT e.src, e.dst, e.w / ow.ow AS wn FROM e JOIN ow ON e.src = ow.src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nation),
    r0 AS (SELECT n_nationkey AS id, 1.0 / (SELECT n FROM nn) AS r FROM nation)"""
    steps = []
    for i in range(1, iters + 1):
        # SUM(... ORDER BY src): pin the float accumulation order so both
        # engines add contributions in identical sequence — bit-identical
        # ranks every superstep, making the final ROUND(r, 6) hash compare
        # immune to summation-order drift (the Spark side folds a
        # src-sorted array the same way)
        steps.append(f"""
    r{i} AS (
      SELECT nt.n_nationkey AS id,
             0.15 / (SELECT n FROM nn)
             + {d} * COALESCE(SUM(p.r * en.wn ORDER BY en.src), 0.0) AS r
      FROM nation nt
      LEFT JOIN en ON en.dst = nt.n_nationkey
      LEFT JOIN r{i - 1} p ON p.id = en.src
      GROUP BY nt.n_nationkey
    )""")
    return (
        base + "," + ",".join(steps)
        + f"\n    SELECT id AS nationkey, ROUND(r, 6) AS pagerank FROM r{iters}"
    )


@register("p1_pagerank_trade_graph", _pagerank_oracle())
def p1_pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph analytics (no graph ops exist in the reference —
    engine-completeness extension alongside l11's connected components):
    weighted PageRank over the supplier-nation -> customer-nation trade
    graph (edge weight = lineitem count), damping 0.85, 10 fixed
    iterations. Spark side is the scale shape — ranks as a DataFrame,
    one join + groupBy per superstep, lineage cut per iteration (exactly
    how PageRank runs on billions of edges); the graph build is the
    expensive part (three fact-dimension joins) and runs once. The
    DuckDB oracle unrolls the same ten supersteps as chained CTEs, so
    the iterative computation is hash-checked end-to-end."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ow = e.groupBy("src").agg(F.sum("w").alias("ow"))
    # the collapsed graph is O(nations^2) rows — collapse to ONE partition
    # before the supersteps so each iteration is single-task instead of
    # shuffling 25 rows across 32 partitions (this is the driver-matrix
    # boundary pattern: distribute the build, keep the tiny iterate local)
    en = (
        e.join(ow, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("wn"))
        .repartition(1)
        # lazy: materialized at the final collect (partitions cached
        # during that job). Note stacked lazy cuts in one action only
        # FINALIZE the topmost marked RDD under the default
        # spark.checkpoint.checkpointAllMarkedAncestors=false — ancestors
        # stay persisted-but-unfinalized, which is harmless for
        # correctness but means no dedicated job runs here (r12 advice).
        .localCheckpoint(eager=False)
    )
    nodes = nation.select(F.col("n_nationkey").alias("id")).coalesce(1)
    n = nodes.count()
    ranks = nodes.select("id", F.lit(1.0 / n).alias("r")).localCheckpoint(eager=False)
    for it in range(10):
        # fold contributions in src order (array_sort on the struct sorts
        # by src first): float addition order is pinned, so ranks are
        # bit-identical to the oracle's SUM(... ORDER BY src) — rounding
        # at the end can never disagree between engines
        contrib = (
            en.join(ranks, en.src == ranks.id)
            .groupBy("dst")
            .agg(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("src").alias("s"),
                                (F.col("r") * F.col("wn")).alias("v"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["v"],
                ).alias("c")
            )
        )
        ranks = nodes.join(contrib, nodes.id == contrib.dst, "left").select(
            "id",
            (F.lit(0.15 / n) + 0.85 * F.coalesce(F.col("c"), F.lit(0.0))).alias("r"),
        )
        # cut lineage every 3rd superstep, not every one: each eager
        # checkpoint is a scheduled job (~0.3 s floor locally); a 3-deep
        # superstep lineage is still tiny while 10 jobs become 4
        if it % 3 == 2:
            # lazy: the next cut (or the final collect) materializes the
            # 3-superstep chain in one scheduled job instead of a
            # dedicated checkpoint job per cut
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("id").alias("nationkey"), F.round("r", 6).alias("pagerank"))


@register(
    "d19_grouping_sets",
    """
    SELECT COALESCE(o_orderstatus, '__all__') AS status,
           COALESCE(o_orderpriority, '__all__') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def d19_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form completing the
    multi-level aggregation trio (d14 ROLLUP, d15 CUBE): two independent
    one-dimension breakdowns plus the grand total in ONE pass (Spark
    expands the sets into a single Expand + hash-agg, not three scans).
    Neither grouping column is nullable in the data, so the COALESCE
    '__all__' labels are unambiguous. At 100 TB this is the idiom for
    dashboard rollups that would otherwise re-scan per dimension."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__d19_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '__all__') AS status,
               COALESCE(o_orderpriority, '__all__') AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM __d19_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def _l21_oracle() -> str:
    """Funnel oracle sharing the lang-ID score construction with
    _lang_id_oracle (same LANG_MARKERS source of truth)."""
    score = {
        code: (
            "len(list_intersect(string_split(text, ' '), ["
            + ", ".join(f"'{w}'" for w in T.LANG_MARKERS[code])
            + "]))"
        )
        for code in sorted(T.LANG_MARKERS)
    }
    g = "GREATEST(" + ", ".join(score.values()) + ")"
    cases = " ".join(
        f"WHEN {score[code]} = __g THEN '{code}'" for code in sorted(T.LANG_MARKERS)
    )
    return f"""
    WITH s0 AS (
      SELECT lang, text,
             len(string_split(text, ' ')) AS ntok,
             CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' '))
               AS cpt,
             {g} AS __g
      FROM documents
    ),
    f AS (
      SELECT lang, ntok, cpt,
             CASE WHEN __g = 0 THEN 'und' {cases} END AS predicted
      FROM s0
    ),
    staged AS (
      SELECT lang,
             CASE
               WHEN ntok < 30 OR ntok > 400 THEN 'fail_length'
               WHEN cpt < 3.0 OR cpt > 9.0 THEN 'fail_chars_per_token'
               WHEN predicted != lang THEN 'fail_lang_id'
               ELSE 'kept'
             END AS stage
      FROM f
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN stage = 'fail_length' THEN 1 ELSE 0 END) AS BIGINT) AS fail_length,
           CAST(SUM(CASE WHEN stage = 'fail_chars_per_token' THEN 1 ELSE 0 END) AS BIGINT) AS fail_chars_per_token,
           CAST(SUM(CASE WHEN stage = 'fail_lang_id' THEN 1 ELSE 0 END) AS BIGINT) AS fail_lang_id,
           CAST(SUM(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS kept_rate
    FROM staged GROUP BY lang
    """


@register("l21_quality_filter_funnel", _l21_oracle())
def l21_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter FUNNEL — the per-stage attrition report a
    training-data ingestion pipeline publishes: each doc is attributed to
    the FIRST filter it fails (length band -> chars-per-token band ->
    lang-ID agreement), survivors counted per language with the kept
    rate. Composes the oracle-proven text primitives (token_count,
    lang_id) into the sequential CASE the ops teams actually read; all
    map-side expressions + one groupBy — at 100 TB the funnel costs one
    corpus pass, and the same staged CASE is how you A/B a filter change
    before burning a full re-ingest."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    ntok = T.token_count("text")
    cpt = F.length("text").cast("double") / ntok
    predicted = T.lang_id("text")
    stage = (
        F.when((ntok < 30) | (ntok > 400), "fail_length")
        .when((cpt < 3.0) | (cpt > 9.0), "fail_chars_per_token")
        .when(predicted != F.col("lang"), "fail_lang_id")
        .otherwise("kept")
    )
    out = (
        docs.select("lang", stage.alias("stage"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("stage") == "fail_length").cast("bigint")).alias(
                "fail_length"
            ),
            F.sum(
                (F.col("stage") == "fail_chars_per_token").cast("bigint")
            ).alias("fail_chars_per_token"),
            F.sum((F.col("stage") == "fail_lang_id").cast("bigint")).alias(
                "fail_lang_id"
            ),
            F.sum((F.col("stage") == "kept").cast("bigint")).alias("n_kept"),
            F.round(
                F.sum((F.col("stage") == "kept").cast("int")) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("kept_rate"),
        )
    )
    return out


@register(
    "c15_cdc_apply",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 100 < 90
    ), ch AS (
      SELECT o_orderkey AS k, 'D' AS op, 1 AS seq,
             CAST(NULL AS DOUBLE) AS price, CAST(NULL AS VARCHAR) AS status
      FROM orders WHERE o_orderkey % 100 < 10
      UNION ALL
      SELECT o_orderkey, 'U', 1, o_totalprice + 50.0, o_orderstatus
      FROM orders WHERE o_orderkey % 100 BETWEEN 10 AND 29
      UNION ALL
      SELECT o_orderkey, 'U', 2, o_totalprice + 100.0, o_orderstatus
      FROM orders WHERE o_orderkey % 100 BETWEEN 10 AND 29
      UNION ALL
      SELECT o_orderkey, 'I', 1, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 100 >= 90
    ), latest AS (
      SELECT k, op, price, status FROM ch
      QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC, op DESC) = 1
    ), final AS (
      SELECT COALESCE(l.price, b.o_totalprice) AS price,
             COALESCE(l.status, b.o_orderstatus) AS status
      FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.k
      WHERE COALESCE(l.op, 'K') <> 'D'
    )
    SELECT status AS o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM final GROUP BY 1
    """,
)
def c15_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge-apply (operators/cdc.py; completes the C-family merge trio
    with c11 SCD-1 and c14 SCD-2): a synthetic multi-version change feed —
    deletes for keys %100<10, two update versions (latest wins) for
    %100 in [10,30), inserts for %100>=90 against a 90% base snapshot —
    is compacted by a key-window and applied with one full-outer join.
    The oracle replays feed, compaction (QUALIFY) and apply; money totals
    go through DECIMAL sums."""
    from datafusion_cyberpolka_eda_spark.operators.cdc import cdc_apply, cdc_compact

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    m = F.pmod("o_orderkey", F.lit(100))
    base = o.filter(m < 90)
    price, status = F.col("o_totalprice"), F.col("o_orderstatus")
    ch = (
        o.filter(m < 10).select(
            F.col("o_orderkey").alias("k"), F.lit("D").alias("op"),
            F.lit(1).alias("seq"),
            F.lit(None).cast("double").alias("price"),
            F.lit(None).cast("string").alias("status"),
        )
        .unionByName(o.filter((m >= 10) & (m < 30)).select(
            F.col("o_orderkey").alias("k"), F.lit("U").alias("op"),
            F.lit(1).alias("seq"), (price + 50.0).alias("price"),
            status.alias("status"),
        ))
        .unionByName(o.filter((m >= 10) & (m < 30)).select(
            F.col("o_orderkey").alias("k"), F.lit("U").alias("op"),
            F.lit(2).alias("seq"), (price + 100.0).alias("price"),
            status.alias("status"),
        ))
        .unionByName(o.filter(m >= 90).select(
            F.col("o_orderkey").alias("k"), F.lit("I").alias("op"),
            F.lit(1).alias("seq"), price.alias("price"),
            status.alias("status"),
        ))
    )
    applied = cdc_apply(
        base.withColumnRenamed("o_orderkey", "k")
            .withColumnRenamed("o_totalprice", "price")
            .withColumnRenamed("o_orderstatus", "status"),
        cdc_compact(ch, "k", "seq"),
        "k",
        ["price", "status"],
    )
    return applied.groupBy(F.col("status").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        _dec_sum(F.col("price"), "decimal(18,2)").alias("total_price"),
    )


@register(
    "d18_data_quality_checks",
    """
    WITH o AS (SELECT COUNT(*) AS n FROM orders),
    checks AS (
      SELECT 'orders.o_orderkey.not_null' AS check_name,
             (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS n_violations
      UNION ALL
      SELECT 'orders.o_orderkey.unique',
             (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders)
      UNION ALL
      SELECT 'orders.o_totalprice.positive',
             (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
      UNION ALL
      SELECT 'orders.o_orderstatus.in_domain',
             (SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P'))
      UNION ALL
      SELECT 'orders.o_custkey.ref_customer',
             (SELECT COUNT(*) FROM orders
              WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      UNION ALL
      SELECT 'lineitem.l_orderkey.ref_orders',
             (SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
    )
    SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM checks
    """,
)
def d18_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite (deequ-lite — the validation gate a
    production table runs before publish): not-null, uniqueness, range,
    domain membership, and two referential-integrity checks, each
    emitting an exact violation count + pass flag. Column-local checks
    fold into ONE wide aggregate pass over each table (not one scan per
    check); referential checks are left-anti joins (broadcast when the
    key side fits, shuffle otherwise). At 100 TB the wide-agg shape is
    what keeps a 50-constraint suite at 1-2 scans total."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    wide = o.agg(
        F.sum(F.col("o_orderkey").isNull().cast("bigint")).alias("nn"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("uq"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias("pos"),
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("bigint")).alias("dom"),
    ).collect()[0]
    ref1 = o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti").count()
    ref2 = li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti").count()
    rows = [
        ("orders.o_orderkey.not_null", int(wide["nn"])),
        ("orders.o_orderkey.unique", int(wide["uq"])),
        ("orders.o_totalprice.positive", int(wide["pos"])),
        ("orders.o_orderstatus.in_domain", int(wide["dom"])),
        ("orders.o_custkey.ref_customer", int(ref1)),
        ("lineitem.l_orderkey.ref_orders", int(ref2)),
    ]
    return small_df(
        spark,
        [(n, v, v == 0) for n, v in rows],
        "check_name string, n_violations bigint, passed boolean",
    )


@register(
    "p2_triangle_count",
    """
    WITH e0 AS MATERIALIZED (
      -- MATERIALIZED matters: und is referenced 3x in the triangle join
      -- and tri twice in the final select; without it DuckDB re-evaluates
      -- the 4-way-join CTE per reference (measured 179-332 s vs ~20 s)
      SELECT DISTINCT s.s_nationkey AS a, c.c_nationkey AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
    ), und AS MATERIALIZED (
      SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM e0
    ), tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM und e1
      JOIN und e2 ON e2.u = e1.v
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT COUNT(*) FROM und) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_triangles,
           CAST(COALESCE(SUM(x + y + z), 0) AS BIGINT)
             AS triangle_vertex_checksum
    FROM tri
    """,
)
def p2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the undirected trade graph (graph family,
    alongside l11 components and p1 PageRank): edges canonicalized to
    u < v, triangles enumerated with the standard ordered two-join
    (x < y < z — each triangle found exactly once). Scale shape: the
    graph build distributes (fact-dim joins, distinct), the triangle
    join runs on the collapsed edge list; at web scale add degree-based
    orientation (join low-degree side first) — the ordering filter here
    is exactly that pattern's skeleton. Exact integer outputs."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("a"), F.col("c_nationkey").alias("b"))
        .distinct()
    )
    und = (
        e0.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        ).distinct()
    ).localCheckpoint(eager=True)
    e1 = und.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = und.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = und.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    cnt_e = und.agg(F.count(F.lit(1)).alias("n_edges"))
    cnt_t = tri.agg(
        F.count(F.lit(1)).alias("n_triangles"),
        F.coalesce(F.sum(F.col("x") + F.col("y") + F.col("z")), F.lit(0))
        .cast("bigint").alias("triangle_vertex_checksum"),
    )
    return cnt_e.join(F.broadcast(cnt_t))
