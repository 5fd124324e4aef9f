"""Statistics queries (SURVEY.md §2 family E): moments-engine correlations,
the feature x target screen, point-biserial, rank-based AUC, exact
quantiles, ntile deciles, whale uplift, pair lift, standardization moments,
Fisher exact (rows-only — no SQL equivalent).

Float policy: all statistical outputs are rounded to 6 dp on BOTH engines
(cross-engine agreement is ~1e-12, so 6 dp rounding yields identical
doubles; see registry/__init__ docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.operators import stats as S
from datafusion_cyberpolka_eda_spark.registry import _dec_sum, _round_cols, register, small_df
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table

_LI_NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _pairs(cols: list[str]) -> list[tuple[str, str]]:
    return [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]


@register(
    "e1_corr_matrix",
    "\nUNION ALL\n".join(
        f"SELECT '{a}' AS x, '{b}' AS y, ROUND(corr({a}, {b}), 6) + 0 AS corr"
        " FROM lineitem"
        for a, b in _pairs(_LI_NUM)
    ),
)
def e1_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix via the single-pass distributed moments
    engine (operator E1; ref y_df.corr() lines 140-141). The pair
    arithmetic runs on the driver over tiny moment matrices — the pattern
    that scales to 100 TB (distribute moments, never the pair loop)."""
    li = load_table(spark, sf_dir, "lineitem")
    corr = S.corr_matrix(li, _LI_NUM)
    rows = [(a, b, float(corr.loc[a, b])) for a, b in _pairs(_LI_NUM)]
    df = small_df(spark, rows, "x string, y string, corr double")
    return _round_cols(df, ["corr"])


@register(
    "e9b_indicator_auc_closed_form",
    """
    WITH t AS (
      SELECT CAST(l_returnflag = 'R' AS INT) AS ind,
             CAST(l_linestatus = 'F' AS INT) AS pos
      FROM lineitem
    )
    SELECT ROUND(0.5 + (CAST(SUM(ind * pos) AS DOUBLE) / SUM(pos)
                        - CAST(SUM(ind * (1 - pos)) AS DOUBLE)
                          / (COUNT(*) - SUM(pos))) / 2, 6) AS auc,
           TRUE AS matches_rank_auc
    FROM t
    """,
)
def e9b_indicator_auc_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-indicator AUC via the closed form
    AUC = 0.5 + (P(ind|pos) - P(ind|neg)) / 2 (operator E9; ref missing-
    indicator screen, public_eda_pipeline.py:321-364): for a 0/1 score
    the full Mann-Whitney rank AUC collapses to one conditional-
    probability pass — the pipeline screens 300 (feature, target) pairs
    with ONE aggregation instead of 300 rank jobs. Cross-validated in
    place: the same AUC is also computed through the generic rank path
    (auc_by_rank) and the equality ships as a checked column."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("int").alias("ind"),
        (F.col("l_linestatus") == "F").cast("int").alias("pos"),
    )
    r = li.agg(
        F.sum(F.col("ind") * F.col("pos")).alias("ip"),
        F.sum("pos").alias("p"),
        F.sum(F.col("ind") * (1 - F.col("pos"))).alias("in_"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    closed = 0.5 + (r["ip"] / r["p"] - r["in_"] / (r["n"] - r["p"])) / 2
    rank = S.auc_by_rank(li, "pos", "ind").collect()[0]["auc"]
    df = small_df(
        spark,
        [(closed, abs(closed - rank) < 1e-12)],
        "auc double, matches_rank_auc boolean",
    )
    return _round_cols(df, ["auc"])


@register(
    "e17_upper_triangle_mean",
    f"""
    WITH c AS (
      {" UNION ALL ".join(
        f"SELECT ABS(corr({a}, {b})) AS a FROM lineitem"
        for a, b in _pairs(_LI_NUM)
      )}
    )
    SELECT ROUND(AVG(a), 6) AS mean_abs_upper_triangle,
           CAST({len(_pairs(_LI_NUM))} AS BIGINT) AS n_pairs
    FROM c
    """,
)
def e17_upper_triangle_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle mean |corr| — the cluster-cohesion scalar (operator
    E17; ref cluster summary avg_abs_corr_inside,
    public_eda_pipeline.py:196-230), computed the pipeline's way: the
    moments engine produces the full matrix in one distributed pass, the
    triangle mean is driver-side numpy over the tiny matrix."""
    import numpy as np

    li = load_table(spark, sf_dir, "lineitem")
    corr = S.corr_matrix(li, _LI_NUM)
    m = corr.to_numpy(dtype=float)
    iu = np.triu_indices(len(_LI_NUM), k=1)
    rows = [(float(np.abs(m[iu]).mean()), len(iu[0]))]
    df = small_df(spark, rows, "mean_abs_upper_triangle double, n_pairs bigint")
    return _round_cols(df, ["mean_abs_upper_triangle"])


_SCREEN_YS = {
    "flag_a": "CAST(l_returnflag = 'A' AS INT)",
    "flag_f": "CAST(l_linestatus = 'F' AS INT)",
}


@register(
    "e5_feature_target_screen",
    "\nUNION ALL\n".join(
        f"SELECT '{x}' AS feature, '{yname}' AS target,"
        f" ROUND(corr({x}, {yexpr}), 6) + 0 AS pearson_corr,"
        f" ROUND(ABS(corr({x}, {yexpr})), 6) AS abs_corr FROM lineitem"
        for x in _LI_NUM
        for yname, yexpr in _SCREEN_YS.items()
    ),
)
def e5_feature_target_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide feature x target correlation screen (operator E5; ref
    standardized X^T Y at lines 494-533): num features vs derived binary
    targets, one chunked moments pass, corr assembled on the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select(
        *_LI_NUM,
        (F.col("l_returnflag") == "A").cast("int").alias("flag_a"),
        (F.col("l_linestatus") == "F").cast("int").alias("flag_f"),
    )
    m = S.cross_moments(df, _LI_NUM, list(_SCREEN_YS))
    corr = S.corr_from_moments(m)
    rows = [
        (x, y, float(corr.loc[x, y]), abs(float(corr.loc[x, y])))
        for x in _LI_NUM
        for y in _SCREEN_YS
    ]
    df = small_df(
        spark, rows, "feature string, target string, pearson_corr double, abs_corr double"
    )
    return _round_cols(df, ["pearson_corr", "abs_corr"])


@register(
    "e6_point_biserial",
    """
    SELECT ROUND(corr(CAST(o_orderstatus = 'F' AS INT), o_totalprice), 6) + 0 AS r,
           ROUND(corr(CAST(o_orderstatus = 'F' AS INT), o_totalprice)
                 * SQRT((COUNT(*) - 2)
                        / (1 - POW(corr(CAST(o_orderstatus = 'F' AS INT), o_totalprice), 2))),
                 6) + 0 AS t_stat,
           COUNT(*) AS n
    FROM orders
    """,
)
def e6_point_biserial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-biserial correlation + t statistic (operator E6; ref
    pointbiserialr line 303 — identical to Pearson with a binary variable).
    The p-value (pure-Python incomplete beta, stats.t_sf) is covered by
    unit tests; r and t are oracle-checked here."""
    o = load_table(spark, sf_dir, "orders")
    y = (F.col("o_orderstatus") == "F").cast("int")
    r = F.corr(y, F.col("o_totalprice"))
    n = F.count(F.lit(1))
    t = r * F.sqrt((n - F.lit(2)) / (1 - F.pow(r, F.lit(2))))
    return o.agg(
        F.round(r, 6).alias("r"), F.round(t, 6).alias("t_stat"), n.alias("n")
    )


@register(
    "e7_auc_by_rank",
    """
    WITH d AS (
      SELECT CAST(o_orderstatus = 'F' AS INT) AS y, o_totalprice AS s FROM orders
    ), g AS (
      SELECT s, CAST(SUM(y) AS DOUBLE) AS pos, CAST(SUM(1 - y) AS DOUBLE) AS neg
      FROM d GROUP BY s
    ), c AS (
      SELECT pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg_below
      FROM g
    )
    SELECT ROUND(SUM(pos * (cum_neg_below + 0.5 * neg)) / (SUM(pos) * SUM(neg)), 6) AS auc
    FROM c
    """,
)
def e7_auc_by_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware Mann-Whitney ROC AUC, fully distributed (operator
    E7; ref _safe_auc lines 33-39). Aggregates to distinct scores first so
    the ordering window runs over compressed data, not raw rows."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        (F.col("o_orderstatus") == "F").cast("int").alias("label"),
        F.col("o_totalprice").alias("score"),
    )
    return S.auc_by_rank(d, "label", "score").select(F.round("auc", 6).alias("auc"))


@register(
    "e10_exact_quantiles",
    """
    SELECT 0.5 AS p, ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6) AS value FROM orders
    UNION ALL
    SELECT 0.9, ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 6) FROM orders
    UNION ALL
    SELECT 0.99, ROUND(percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice), 6) FROM orders
    """,
)
def e10_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (operator E10; ref np.nanquantile
    line 622). The 100 TB path is approxQuantile; exact matches the
    reference and the oracle."""
    o = load_table(spark, sf_dir, "orders")
    probs = [0.5, 0.9, 0.99]
    vals = S.exact_quantiles(o, "o_totalprice", probs)
    df = small_df(spark, list(zip(probs, vals)), "p double, value double")
    return _round_cols(df, ["value"])


@register(
    "e11_ntile_deciles",
    """
    WITH d AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile, COUNT(*) AS n,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM d GROUP BY decile
    """,
)
def e11_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile profile (operators E11/G4/D7; ref qcut +
    decile table lines 306-318). Deterministic tiebreak on the key. For
    100 TB use relational.quantile_buckets (cutpoint-based, no global
    sort)."""
    from datafusion_cyberpolka_eda_spark.operators.relational import ntile_bucket

    o = load_table(spark, sf_dir, "orders")
    d = ntile_bucket(
        o.select("o_totalprice", "o_orderkey"),
        "o_totalprice",
        10,
        bucket_col="decile",
        tiebreak_cols=["o_orderkey"],
    )
    d = d.withColumn("decile", F.col("decile").cast("bigint"))
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (_dec_sum(F.col("o_totalprice"), "decimal(18,2)") / F.count(F.lit(1))).alias(
            "avg_price"
        ),
    )


@register(
    "e12_whale_uplift",
    """
    WITH cut AS (
      SELECT percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS c FROM orders
    ), f AS (
      SELECT CAST(o_totalprice >= (SELECT c FROM cut) AS INT) AS top,
             CAST(o_orderstatus = 'F' AS INT) AS y
      FROM orders
    )
    SELECT CAST(SUM(top) AS BIGINT) AS top_n,
           CAST(SUM(top * y) AS BIGINT) AS top_pos,
           CAST(SUM(1 - top) AS BIGINT) AS rest_n,
           CAST(SUM((1 - top) * y) AS BIGINT) AS rest_pos,
           ROUND(CAST(SUM(top * y) AS DOUBLE) / SUM(top), 6) AS top1_rate,
           ROUND(CAST(SUM((1 - top) * y) AS DOUBLE) / SUM(1 - top), 6) AS rest99_rate,
           ROUND((CAST(SUM(top * y) AS DOUBLE) / SUM(top))
                 / (CAST(SUM((1 - top) * y) AS DOUBLE) / SUM(1 - top)), 6) AS lift
    FROM f
    """,
)
def e12_whale_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1%-tail uplift contingency (operator E12; ref whale stage lines
    617-650): p99 cut in one pass, 2x2 contingency in a second conditional
    agg, lift arithmetic inline."""
    o = load_table(spark, sf_dir, "orders")
    cut = S.exact_quantiles(o, "o_totalprice", [0.99])[0]
    top = (F.col("o_totalprice") >= F.lit(cut)).cast("int")
    y = (F.col("o_orderstatus") == "F").cast("int")
    d = o.select(top.alias("top"), y.alias("y"))
    t, yv = F.col("top"), F.col("y")
    return d.agg(
        F.sum(t.cast("bigint")).alias("top_n"),
        F.sum((t * yv).cast("bigint")).alias("top_pos"),
        F.sum((1 - t).cast("bigint")).alias("rest_n"),
        F.sum(((1 - t) * yv).cast("bigint")).alias("rest_pos"),
        F.round(F.sum(t * yv).cast("double") / F.sum(t), 6).alias("top1_rate"),
        F.round(F.sum((1 - t) * yv).cast("double") / F.sum(1 - t), 6).alias(
            "rest99_rate"
        ),
        F.round(
            (F.sum(t * yv).cast("double") / F.sum(t))
            / (F.sum((1 - t) * yv).cast("double") / F.sum(1 - t)),
            6,
        ).alias("lift"),
    )


_E13_WHALE_ORACLE = """
    WITH cut AS (
      SELECT percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS c FROM orders
    ),
    f AS (
      SELECT CAST(o_totalprice >= (SELECT c FROM cut) AS INT) AS top,
             CAST(o_orderstatus = 'F' AS INT) AS y_f,
             CAST(o_orderpriority = '1-URGENT' AS INT) AS y_u
      FROM orders
    ),
    ct AS (
      SELECT 'is_f' AS target,
             SUM(top)::BIGINT AS top_n, SUM(top * y_f)::BIGINT AS top_pos,
             SUM(1 - top)::BIGINT AS rest_n, SUM((1 - top) * y_f)::BIGINT AS rest_pos
      FROM f
      UNION ALL
      SELECT 'is_urgent',
             SUM(top)::BIGINT, SUM(top * y_u)::BIGINT,
             SUM(1 - top)::BIGINT, SUM((1 - top) * y_u)::BIGINT
      FROM f
    ),
    ok AS (
      SELECT * FROM ct WHERE top_n >= 10 AND rest_n >= 100 AND rest_pos > 0
    ),
    ks AS (
      SELECT unnest(generate_series(0,
        (SELECT COALESCE(MAX(LEAST(top_n, top_pos + rest_pos)), 0) FROM ok))) AS k
    ),
    terms AS (
      SELECT ok.target, ks.k,
             (lgamma(top_n + 1) - lgamma(k + 1) - lgamma(top_n - k + 1))
           + (lgamma(rest_n + 1) - lgamma(top_pos + rest_pos - k + 1)
              - lgamma(rest_n - (top_pos + rest_pos - k) + 1))
           - (lgamma(top_n + rest_n + 1) - lgamma(top_pos + rest_pos + 1)
              - lgamma(top_n + rest_n - top_pos - rest_pos + 1)) AS lt
      FROM ok JOIN ks
        ON ks.k BETWEEN ok.top_pos AND LEAST(ok.top_n, ok.top_pos + ok.rest_pos)
      WHERE ok.top_pos + ok.rest_pos - ks.k <= ok.rest_n
    )
    SELECT 'o_totalprice' AS feature, ok.target, top_n, top_pos, rest_n, rest_pos,
           ROUND(CAST(top_pos AS DOUBLE) / top_n, 6) AS top1_rate,
           ROUND(CAST(rest_pos AS DOUBLE) / rest_n, 6) AS rest99_rate,
           ROUND((CAST(top_pos AS DOUBLE) / top_n)
                 / (CAST(rest_pos AS DOUBLE) / rest_n), 6) AS lift,
           ROUND(LEAST((SELECT SUM(exp(lt)) FROM terms t WHERE t.target = ok.target), 1.0), 6)
             AS pvalue
    FROM ok
"""


@register("e13_fisher_whale", _E13_WHALE_ORACLE)
def e13_fisher_whale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whale screen with Fisher exact p-values (operators E12+E13; ref
    fisher_exact line 641). Contingencies are computed distributed
    (whale_scan); the hypergeometric tail is exact driver-side arithmetic
    (pure Python — scipy unavailable). Oracle-checked since round 5: the
    DuckDB twin replays the exact-percentile cutoff, the 2x2
    contingencies, the top>=10/rest>=100/rest_pos>0 guards, AND the
    one-sided hypergeometric tail itself via lgamma + generate_series
    (the e13b formulation) — so the full whale-screen path, p-values
    included, is value-hash-checked, closing the last rows-only stats
    entry. Both engines call the same libm lgamma and the 6dp round
    absorbs term-order effects."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        "o_totalprice",
        (F.col("o_orderstatus") == "F").cast("int").alias("is_f"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("is_urgent"),
    )
    pdf = S.whale_scan(
        d,
        features=["o_totalprice"],
        targets=["is_f", "is_urgent"],
        quantile=0.99,
        min_top=10,
        min_rest=100,
    )
    df = small_df(
        spark,
        list(pdf.itertuples(index=False, name=None)),
        "feature string, target string, top_n bigint, top_pos bigint,"
        " rest_n bigint, rest_pos bigint, top1_rate double,"
        " rest99_rate double, lift double, pvalue double",
    )
    return _round_cols(df, ["top1_rate", "rest99_rate", "lift", "pvalue"], 6)


_FISHER_GROUPED_ORACLE = """
    WITH cut AS (
      SELECT percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS c FROM orders
    ),
    f AS (
      SELECT o_orderpriority AS prio,
             CAST(o_totalprice >= (SELECT c FROM cut) AS INT) AS top,
             CAST(o_orderstatus = 'F' AS INT) AS y
      FROM orders
    ),
    ct AS (
      SELECT prio,
             SUM(top * y)::BIGINT AS a, SUM(top * (1 - y))::BIGINT AS b,
             SUM((1 - top) * y)::BIGINT AS c, SUM((1 - top) * (1 - y))::BIGINT AS d
      FROM f GROUP BY prio
    ),
    ks AS (
      SELECT unnest(generate_series(0, (SELECT MAX(LEAST(a + b, a + c)) FROM ct))) AS k
    ),
    terms AS (
      SELECT ct.prio, ks.k,
             (lgamma(a+b+1) - lgamma(k+1) - lgamma(a+b-k+1))
           + (lgamma(c+d+1) - lgamma(a+c-k+1) - lgamma(c+d-(a+c-k)+1))
           - (lgamma(a+b+c+d+1) - lgamma(a+c+1) - lgamma(b+d+1)) AS lt
      FROM ct JOIN ks ON ks.k BETWEEN ct.a AND LEAST(ct.a + ct.b, ct.a + ct.c)
      WHERE ct.a + ct.c - ks.k <= ct.c + ct.d
    )
    SELECT ct.prio, a, b, c, d,
           ROUND(LEAST((SELECT SUM(exp(lt)) FROM terms t WHERE t.prio = ct.prio), 1.0), 6) AS fisher_p
    FROM ct
"""


@register("e13b_fisher_exact_grouped", _FISHER_GROUPED_ORACLE)
def e13b_fisher_exact_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher exact test, oracle-checked (operator E13): per-priority 2x2
    contingency (global p99 price tail x status) computed distributed, the
    one-sided hypergeometric tail computed driver-side with log-gamma
    arithmetic. The DuckDB oracle recomputes the same tail via lgamma +
    generate_series — both engines call the same libm lgamma and sum terms
    in ascending-k order, so the 6-dp-rounded p-values match exactly. This
    removes the 'exact test has no SQL twin' gap of e13 (which remains the
    full whale-scan path)."""
    o = load_table(spark, sf_dir, "orders")
    cut = S.exact_quantiles(o, "o_totalprice", [0.99])[0]
    top = (F.col("o_totalprice") >= F.lit(cut)).cast("long")
    y = (F.col("o_orderstatus") == "F").cast("long")
    t, yv = F.col("top"), F.col("y")
    ct = (
        o.select(F.col("o_orderpriority").alias("prio"), top.alias("top"), y.alias("y"))
        .groupBy("prio")
        .agg(
            F.sum(t * yv).alias("a"),
            F.sum(t * (1 - yv)).alias("b"),
            F.sum((1 - t) * yv).alias("c"),
            F.sum((1 - t) * (1 - yv)).alias("d"),
        )
    )
    rows = ct.collect()
    out = small_df(
        spark,
        [
            (r["prio"], r["a"], r["b"], r["c"], r["d"],
             S.fisher_exact_greater(r["a"], r["b"], r["c"], r["d"]))
            for r in rows
        ],
        "prio string, a bigint, b bigint, c bigint, d bigint, fisher_p double",
    )
    return _round_cols(out, ["fisher_p"])


_FLAGS = {
    "flag_a": "CAST(l_returnflag = 'A' AS INT)",
    "flag_f": "CAST(l_linestatus = 'F' AS INT)",
    "flag_disc": "CAST(l_discount > 0.05 AS INT)",
}


@register(
    "e2_e4_pair_lift",
    "\nUNION ALL\n".join(
        f"""SELECT '{a}' AS target_a, '{b}' AS target_b,
           ROUND(corr({ea}, {eb}), 6) + 0 AS corr,
           CAST(SUM({ea} * {eb}) AS BIGINT) AS co_count,
           ROUND(CAST(SUM({ea} * {eb}) AS DOUBLE) / COUNT(*), 6) AS co_rate,
           ROUND((CAST(SUM({ea}) AS DOUBLE) / COUNT(*)) * (CAST(SUM({eb}) AS DOUBLE) / COUNT(*)), 6) AS expected_rate,
           ROUND((CAST(SUM({ea} * {eb}) AS DOUBLE) / COUNT(*))
                 / ((CAST(SUM({ea}) AS DOUBLE) / COUNT(*)) * (CAST(SUM({eb}) AS DOUBLE) / COUNT(*))), 6) AS pair_lift
           FROM lineitem"""
        for (a, ea), (b, eb) in [
            (("flag_a", _FLAGS["flag_a"]), ("flag_f", _FLAGS["flag_f"])),
            (("flag_a", _FLAGS["flag_a"]), ("flag_disc", _FLAGS["flag_disc"])),
            (("flag_f", _FLAGS["flag_f"]), ("flag_disc", _FLAGS["flag_disc"])),
        ]
    ),
)
def e2_e4_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary co-occurrence / lift / corr table (operators E2-E4; ref
    gramian + pair loop lines 143-166). For 0/1 columns the moments
    engine's sum_xy IS the co-occurrence count — one pass, pair table on
    the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        (F.col("l_returnflag") == "A").cast("int").alias("flag_a"),
        (F.col("l_linestatus") == "F").cast("int").alias("flag_f"),
        (F.col("l_discount") > 0.05).cast("int").alias("flag_disc"),
    )
    pdf = S.pair_stats(d, ["flag_a", "flag_f", "flag_disc"])
    pdf = pdf.rename(columns={"expected_independent_rate": "expected_rate"})
    df = small_df(
        spark,
        list(
            pdf[
                [
                    "target_a",
                    "target_b",
                    "corr",
                    "co_count",
                    "co_rate",
                    "expected_rate",
                    "pair_lift",
                ]
            ].itertuples(index=False, name=None)
        ),
        "target_a string, target_b string, corr double, co_count bigint,"
        " co_rate double, expected_rate double, pair_lift double",
    )
    return _round_cols(df, ["corr", "co_rate", "expected_rate", "pair_lift"])


def _quant_moment_sql(c: str) -> str:
    """Oracle twin of the quantized-moment computation below: the
    lineitem numerics are <=2-dp decimals, so ROUND(x*100) is an exact
    integer per row, SUM is exact (DuckDB HUGEINT / Spark decimal), and
    mean/var reduce to the IDENTICAL correctly-rounded IEEE op sequence
    on exact inputs — no order-dependent float summation anywhere (the
    r9 bitwise A/B audit caught l_discount's 6-dp mean sitting on a
    rounding boundary at sf0.01 under permuted partitioning)."""
    q = f"CAST(ROUND({c} * 100) AS BIGINT)"
    m = f"CAST(SUM({q}) AS DOUBLE) / COUNT({c}) / 100.0"
    v = f"CAST(SUM({q} * {q}) AS DOUBLE) / COUNT({c}) / 10000.0 - ({m}) * ({m})"
    return (
        f"ROUND({m}, 6) + 0 AS mean,"
        f" ROUND(SQRT(GREATEST({v}, 0.0)), 6) + 0 AS std_pop"
    )


@register(
    "e15_e16_standardize_moments",
    "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, {_quant_moment_sql(c)} FROM lineitem"
        for c in _LI_NUM
    ),
)
def e15_e16_standardize_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-std standardization moments (operators E15/E16; ref
    ddof=0 standardization lines 501-508 — matches exactly, unlike Spark's
    StandardScaler which uses sample std). Moments run on 100x-quantized
    exact integer sums (decimal accumulators, overflow-proof at any row
    count) so the 6-dp rounded outputs are partitioning- AND
    engine-deterministic — see _quant_moment_sql."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _LI_NUM:
        q = F.round(F.col(c).cast("double") * 100).cast("long")
        aggs += [
            F.count(F.col(c)).alias(f"n_{c}"),
            F.sum(q.cast("decimal(38,0)")).alias(f"s_{c}"),
            F.sum((q * q).cast("decimal(38,0)")).alias(f"ss_{c}"),
        ]
    m = li.agg(*aggs).collect()[0]
    rows = []
    for c in _LI_NUM:
        n = m[f"n_{c}"]
        s, ss = float(m[f"s_{c}"]), float(m[f"ss_{c}"])
        mean = s / n / 100.0
        var = ss / n / 10000.0 - mean * mean
        rows.append((c, mean, max(var, 0.0) ** 0.5 + 0.0))
    df = small_df(spark, rows, "column_name string, mean double, std_pop double")
    return _round_cols(df, ["mean", "std_pop"])


def _profile_oracle() -> str:
    parts = []
    for c in _LI_NUM:
        d = f"CAST({c} AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS column_name, COUNT({c}) AS n,"
            f" CAST(SUM(CAST({c} IS NULL AS BIGINT)) AS BIGINT) AS n_nulls,"
            f" {_quant_moment_sql(c)},"
            f" MIN({d}) AS min_val, MAX({d}) AS max_val FROM lineitem"
        )
    return "\nUNION ALL\n".join(parts)


@register("d16_numeric_profile", _profile_oracle())
def d16_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.summary()/describe analog as one exact pass: count, null count,
    mean, population std, min, max for every numeric column — the first
    query an EDA run fires at a new table. One chunkable agg (state is
    O(columns), never O(rows)) then a JVM-side stack() unpivot to the
    long (column, stats) shape; no per-column jobs, no driver row data."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _LI_NUM:
        d = F.col(c).cast("double")
        # quantized exact integer sums (see _quant_moment_sql): the 6-dp
        # mean/std round identically under any partitioning and engine
        q = F.round(d * 100).cast("long")
        aggs += [
            F.count(F.col(c)).alias(f"cnt_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nul_{c}"),
            F.sum(q.cast("decimal(38,0)")).alias(f"s_{c}"),
            F.sum((q * q).cast("decimal(38,0)")).alias(f"ss_{c}"),
            F.min(d).alias(f"min_{c}"),
            F.max(d).alias(f"max_{c}"),
        ]
    wide = li.agg(*aggs)
    moment_cols = []
    for c in _LI_NUM:
        mean_raw = (
            F.col(f"s_{c}").cast("double") / F.col(f"cnt_{c}") / F.lit(100.0)
        )
        var_raw = (
            F.col(f"ss_{c}").cast("double") / F.col(f"cnt_{c}") / F.lit(10000.0)
            - mean_raw * mean_raw
        )
        moment_cols += [
            F.round(mean_raw, 6).alias(f"avg_{c}"),
            F.round(F.sqrt(F.greatest(var_raw, F.lit(0.0))), 6).alias(f"std_{c}"),
        ]
    wide = wide.select("*", *moment_cols)
    stack_args = ", ".join(
        f"'{c}', cnt_{c}, nul_{c}, avg_{c}, std_{c}, min_{c}, max_{c}"
        for c in _LI_NUM
    )
    return wide.selectExpr(
        f"stack({len(_LI_NUM)}, {stack_args})"
        " AS (column_name, n, n_nulls, mean, std_pop, min_val, max_val)"
    )


@register(
    "d3_null_rate_profile",
    """
    WITH src AS (
      SELECT NULLIF(l_discount, 0.0) AS disc_nz,
             NULLIF(l_tax, 0.0) AS tax_nz,
             NULLIF(l_returnflag, 'N') AS flag_nn
      FROM lineitem
    )
    SELECT 'disc_nz' AS column_name, ROUND(AVG(CAST(disc_nz IS NULL AS INT)), 6) AS null_rate FROM src
    UNION ALL
    SELECT 'tax_nz', ROUND(AVG(CAST(tax_nz IS NULL AS INT)), 6) FROM src
    UNION ALL
    SELECT 'flag_nn', ROUND(AVG(CAST(flag_nn IS NULL AS INT)), 6) FROM src
    """,
)
def d3_null_rate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide null-rate profile, chunked agg + melt (operator D3; ref
    2,241-column is_null().mean() pass, lines 235-254). Nulls manufactured
    with NULLIF since testdata is dense."""
    from datafusion_cyberpolka_eda_spark.operators.profile import null_rates

    li = load_table(spark, sf_dir, "lineitem")
    src = li.select(
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_nz"),
        F.nullif(F.col("l_tax"), F.lit(0.0)).alias("tax_nz"),
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_nn"),
    )
    nr = null_rates(src, ["disc_nz", "tax_nz", "flag_nn"])
    return nr.select(
        F.col("column").alias("column_name"), F.round("null_rate", 6).alias("null_rate")
    )


@register(
    "e18_chi2_independence",
    """
    WITH o AS (
      SELECT event_type, CAST(value > 50.0 AS INT) AS hi, COUNT(*) AS obs
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT o.event_type, o.hi, o.obs,
             SUM(o.obs) OVER (PARTITION BY o.event_type) AS row_total,
             SUM(o.obs) OVER (PARTITION BY o.hi) AS col_total,
             SUM(o.obs) OVER () AS n
      FROM o
    ),
    cells AS (
      SELECT (obs - row_total * col_total / CAST(n AS DOUBLE))
             * (obs - row_total * col_total / CAST(n AS DOUBLE))
             / (row_total * col_total / CAST(n AS DOUBLE)) AS contrib,
             row_total, col_total, n
      FROM m
    )
    SELECT ROUND(SUM(contrib), 6) AS chi2_statistic,
           CAST(4 AS BIGINT) AS dof,
           SUM(contrib) > 9.487729036781154 AS reject_independence_5pct
    FROM cells
    """,
)
def e18_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen (family E extension): event_type
    (5 categories) vs a fixed high-value indicator. The large-count
    complement to the Fisher exact family (e13, exact but factorial-cost
    — chi-square is what screens millions of contingency cells at scale):
    one groupBy builds the observed table, expected counts come from the
    margins, statistic = sum (O-E)^2/E, decision at the dof=4 / 5%
    critical value (9.48773) so no p-value machinery is needed in either
    engine. Counts are exact integers and both engines evaluate the same
    double formula, so the rounded statistic and the decision boolean
    hash-match. At 100 TB: the observed table is |categories| x 2 rows
    after one map-side-combined shuffle; everything after is
    constant-size."""
    e = load_table(spark, sf_dir, "events")
    obs = (
        e.select("event_type", (F.col("value") > 50.0).cast("int").alias("hi"))
        .groupBy("event_type", "hi")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("hi")
    wn = Window.partitionBy()
    m = (
        obs.withColumn("row_total", F.sum("obs").over(wr))
        .withColumn("col_total", F.sum("obs").over(wc))
        .withColumn("n", F.sum("obs").over(wn))
    )
    exp = F.col("row_total") * F.col("col_total") / F.col("n").cast("double")
    contrib = (F.col("obs") - exp) * (F.col("obs") - exp) / exp
    crit_5pct_dof4 = 9.487729036781154
    return m.select(contrib.alias("contrib")).agg(
        F.round(F.sum("contrib"), 6).alias("chi2_statistic"),
        F.lit(4).cast("bigint").alias("dof"),
        (F.sum("contrib") > crit_5pct_dof4).alias("reject_independence_5pct"),
    )


@register(
    "e20_winsorize",
    """
    WITH q AS (
      SELECT c_mktsegment,
             quantile_disc(c_acctbal, 0.05) AS lo,
             quantile_disc(c_acctbal, 0.95) AS hi
      FROM customer GROUP BY 1
    )
    SELECT c.c_mktsegment, COUNT(*) AS n,
           COUNT(*) FILTER (WHERE c_acctbal < lo) AS n_clipped_low,
           COUNT(*) FILTER (WHERE c_acctbal > hi) AS n_clipped_high,
           MIN(lo) AS p05, MIN(hi) AS p95,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_before,
           CAST(SUM(CAST(LEAST(GREATEST(c_acctbal, lo), hi) AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS mean_after
    FROM customer c JOIN q USING (c_mktsegment)
    GROUP BY 1
    """,
)
def e20_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (outlier clipping at p5/p95 — the robust
    preprocessing twin of E15/E16): pass 1 computes per-segment DISCRETE
    percentiles (actual data values — no interpolation, so the bounds are
    bitwise-portable), broadcast back; pass 2 clips and aggregates with
    DECIMAL sums. Two scans + one broadcast join; the bounds table is
    |groups| rows at any scale."""
    c = load_table(spark, sf_dir, "customer")
    q = c.groupBy("c_mktsegment").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY c_acctbal)").alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY c_acctbal)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi"))
    dec = lambda col: F.sum(col.cast("decimal(18,2)")).cast("double")  # noqa: E731
    return (
        c.join(F.broadcast(q), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("c_acctbal") < F.col("lo"), 1)).alias("n_clipped_low"),
            F.count(F.when(F.col("c_acctbal") > F.col("hi"), 1)).alias("n_clipped_high"),
            F.min("lo").alias("p05"),
            F.min("hi").alias("p95"),
            (dec(F.col("c_acctbal")) / F.count(F.lit(1))).alias("mean_before"),
            (dec(clipped) / F.count(F.lit(1))).alias("mean_after"),
        )
    )


@register(
    "e21_mad_outliers",
    """
    WITH med AS (
      SELECT c_mktsegment, quantile_disc(c_acctbal, 0.5) AS med
      FROM customer GROUP BY 1
    ), dev AS (
      SELECT c.c_mktsegment, c_acctbal, med, ABS(c_acctbal - med) AS adev
      FROM customer c JOIN med USING (c_mktsegment)
    ), mad AS (
      SELECT c_mktsegment, quantile_disc(adev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.c_mktsegment, COUNT(*) AS n,
           MIN(d.med) AS median_bal, MIN(m.mad) AS mad,
           COUNT(*) FILTER (WHERE adev > 3 * 1.4826 * m.mad) AS n_outliers,
           CAST(COUNT(*) FILTER (WHERE adev > 3 * 1.4826 * m.mad) AS DOUBLE)
             / COUNT(*) AS outlier_rate
    FROM dev d JOIN mad m USING (c_mktsegment)
    GROUP BY 1
    """,
)
def e21_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen via median absolute deviation (complements
    e20's percentile clip with the estimator that tolerates 50%
    contamination): pass 1 per-group discrete median, pass 2 discrete
    median of absolute deviations, pass 3 counts |x - med| > 3 sigma-hat
    (MAD * 1.4826). Discrete percentiles keep every intermediate an
    actual data value or an exact difference — bitwise portable, no
    rounding anywhere. Three scans, two broadcast joins of |groups|-row
    tables."""
    c = load_table(spark, sf_dir, "customer")
    med = c.groupBy("c_mktsegment").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)").alias("med")
    )
    dev = c.join(F.broadcast(med), "c_mktsegment").withColumn(
        "adev", F.abs(F.col("c_acctbal") - F.col("med"))
    )
    mad = dev.groupBy("c_mktsegment").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    out = F.col("adev") > F.lit(3) * F.lit(1.4826) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("median_bal"),
            F.min("mad").alias("mad"),
            F.count(F.when(out, 1)).alias("n_outliers"),
            (F.count(F.when(out, 1)).cast("double") / F.count(F.lit(1)))
            .alias("outlier_rate"),
        )
    )


@register(
    "e22_group_regression",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sxy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
    FROM m
    """,
)
def e22_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (price ~ quantity) by the
    closed-form moment route the corr engine uses (E1/E5 family): all
    four moment sums are EXACT integer aggregations (quantities are
    integral; prices aggregate in cents), cast to double only at the
    final slope/intercept arithmetic — identical operands, identical
    IEEE ops, bitwise-equal results with no rounding. One map-side
    partial-agg pass, |groups| result rows; the same shape Spark's
    built-in regr_slope would take, minus its float accumulation
    order-dependence (which would need 6dp rounding to compare)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("pc"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").cast("double").alias("sx"),
        (F.sum("pc").cast("double") / 100).alias("sy"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("sxx"),
        (F.sum(F.col("q") * F.col("pc")).cast("double") / 100).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )


@register(
    "e24_ab_test_proportions",
    """
    WITH u AS (
      SELECT user_id % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ), s AS (
      SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
      FROM u
    )
    SELECT n0, n1, c0, c1,
           CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS rate0,
           CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS rate1,
           (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
           / NULLIF(sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                  * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                  * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 0.0) AS z_stat
    FROM s
    """,
)
def e24_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test (pooled z — the experimentation-platform
    primitive; complements e13 Fisher for large counts): variant by user
    hash, conversion = any purchase, z from exact integer counts with
    the oracle's exact expression tree — identical IEEE operand order,
    bitwise-equal z, no rounding. One per-user rollup + one 4-way
    conditional agg; scales as a single groupBy + scalar pass."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    ).withColumn("variant", F.pmod("user_id", F.lit(2)))
    s = u.agg(
        F.sum((F.col("variant") == 0).cast("bigint")).alias("n0"),
        F.sum((F.col("variant") == 1).cast("bigint")).alias("n1"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)).cast("bigint").alias("c0"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)).cast("bigint").alias("c1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    rate0, rate1 = d("c0") / d("n0"), d("c1") / d("n1")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    # NULLIF guard: a degenerate experiment (p pooled = 0 or 1) has no
    # defined z; both engines emit NULL instead of raising on the 0 denom
    z = (rate1 - rate0) / F.nullif(
        F.sqrt(
            pooled
            * (F.lit(1.0) - pooled)
            * (F.lit(1.0) / d("n0") + F.lit(1.0) / d("n1"))
        ),
        F.lit(0.0),
    )
    return s.select(
        "n0", "n1", "c0", "c1",
        rate0.alias("rate0"), rate1.alias("rate1"), z.alias("z_stat"),
    )


_BH_Q = 0.25

_BH_ORACLE = f"""
    WITH pv AS (
      SELECT prio, fisher_p AS p FROM ({_FISHER_GROUPED_ORACLE}) fq
    ),
    r AS (
      SELECT prio, p,
             CAST(ROW_NUMBER() OVER (ORDER BY p, prio) AS BIGINT) AS rnk,
             COUNT(*) OVER () AS m
      FROM pv
    ),
    f AS (
      SELECT *, MAX(CASE WHEN p <= rnk * {_BH_Q} / m THEN rnk END) OVER () AS max_ok
      FROM r
    )
    SELECT prio, p AS fisher_p, rnk AS p_rank,
           LEAST(1.0, MIN(p * m / rnk) OVER
             (ORDER BY rnk ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             AS bh_adjusted_p,
           rnk <= COALESCE(max_ok, 0) AS rejected
    FROM f
"""


@register("e25_bh_fdr", _BH_ORACLE)
def e25_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction (the multiple-testing control a
    screening pipeline needs once it runs E6/E13 over hundreds of
    features): step-up rule at q=0.25 over the e13b per-priority Fisher
    p-values, plus the standard adjusted p (running minimum of p*m/rank
    from the worst rank down). Implemented as windows over the p-value
    table — the global ordering window is over the TEST FAMILY (m rows,
    thousands at most), never row data. Ranks order by (p, prio) so ties
    are deterministic; p enters pre-rounded at 6dp on both engines, so
    every downstream comparison and adjusted value is bitwise equal."""
    pv = e13b_fisher_exact_grouped(spark, sf_dir).select(
        "prio", F.col("fisher_p").alias("p")
    )
    w_all = Window.orderBy("p", "prio").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = pv.select(
        "prio",
        "p",
        F.row_number().over(Window.orderBy("p", "prio")).cast("bigint").alias("rnk"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    ok_rank = F.when(
        F.col("p") <= F.col("rnk") * F.lit(_BH_Q) / F.col("m"), F.col("rnk")
    )
    f = r.withColumn("max_ok", F.max(ok_rank).over(w_all))
    w_tail = Window.orderBy("rnk").rowsBetween(0, Window.unboundedFollowing)
    return f.select(
        "prio",
        F.col("p").alias("fisher_p"),
        F.col("rnk").alias("p_rank"),
        F.least(
            F.lit(1.0),
            F.min(F.col("p") * F.col("m") / F.col("rnk")).over(w_tail),
        ).alias("bh_adjusted_p"),
        (F.col("rnk") <= F.coalesce(F.col("max_ok"), F.lit(0))).alias("rejected"),
    )


@register(
    "e27_ks_shift_test",
    """
    WITH s AS (
      SELECT o_totalprice AS v, CAST(o_orderstatus = 'F' AS INT) AS grp
      FROM orders WHERE o_orderstatus IN ('F', 'O')
    ), n AS (
      SELECT SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n0
      FROM s
    ), d AS (
      SELECT v,
             SUM(grp) AS c1,
             SUM(1 - grp) AS c0
      FROM s GROUP BY v
    ), e AS (
      SELECT v,
             SUM(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             SUM(c0) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0
      FROM d
    )
    SELECT CAST((SELECT n1 FROM n) AS BIGINT) AS n_f,
           CAST((SELECT n0 FROM n) AS BIGINT) AS n_o,
           ROUND((SELECT MAX(ABS(CAST(cum1 AS DOUBLE) / (SELECT n1 FROM n)
                    - CAST(cum0 AS DOUBLE) / (SELECT n0 FROM n))) FROM e), 6)
             AS ks_d
    """,
)
def e27_ks_shift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D — the nonparametric distribution-
    shift screen that complements the F1 adversarial classifier: D is the
    max ECDF gap between F-status and O-status order prices, computed
    exactly by compressing to distinct values first (like e7's AUC) and
    running ONE cumulative window over the distinct-value table. Counts
    are exact integers; the ECDF ratios divide identical operands, and D
    rounds at 6dp on both engines. At scale, bucket the cumulative
    window exactly as auc_by_rank does (the distinct-value table is the
    small side; a price domain with 10^9 distinct values would reuse the
    two-pass bucketed prefix sum)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "O")
    )
    s = o.select(
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderstatus") == "F").cast("int").alias("grp"),
    )
    n = s.agg(
        F.sum("grp").alias("n1"), F.sum(1 - F.col("grp")).alias("n0")
    )
    d = s.groupBy("v").agg(
        F.sum("grp").alias("c1"), F.sum(1 - F.col("grp")).alias("c0")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    e = d.select(
        "v",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c0").over(w).alias("cum0"),
    )
    ks = (
        e.join(F.broadcast(n))
        .select(
            F.abs(
                F.col("cum1").cast("double") / F.col("n1")
                - F.col("cum0").cast("double") / F.col("n0")
            ).alias("gap")
        )
        .agg(F.max("gap").alias("ks"))
    )
    return (
        n.join(F.broadcast(ks))
        .select(
            F.col("n1").cast("bigint").alias("n_f"),
            F.col("n0").cast("bigint").alias("n_o"),
            F.round("ks", 6).alias("ks_d"),
        )
    )


@register(
    "e28_gini_concentration",
    """
    WITH r AS (
      SELECT c_mktsegment,
             CAST(c_acctbal AS DECIMAL(18,2)) AS x,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS i,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           CAST(MIN(n) AS BIGINT) AS n,
           CAST(SUM(x) AS DOUBLE) AS total_bal,
           ROUND(2.0 * CAST(SUM(i * x) AS DOUBLE)
                   / (MIN(n) * CAST(SUM(x) AS DOUBLE))
                 - (MIN(n) + 1.0) / MIN(n), 6) + 0 AS gini
    FROM r GROUP BY 1
    """,
)
def e28_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration per segment (the inequality/whale-dominance
    metric next to E12's uplift): the exact sorted-rank formula
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over positive balances. Rank
    i*x products and totals accumulate in DECIMAL (exact, order-proof);
    only the final ratio is float, rounded at 6dp on both engines. One
    partitioned rank window + one groupBy — the same two-shuffle budget
    as any grouped analytic; no global ordering."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_mktsegment").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    x = F.col("c_acctbal").cast("decimal(18,2)")
    r = c.select(
        "c_mktsegment",
        x.alias("x"),
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("c_mktsegment").agg(
        F.min("n").cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("total_bal"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("x")).cast("double")
            / (F.min("n") * F.sum("x").cast("double"))
            - (F.min("n") + F.lit(1.0)) / F.min("n"),
            6,
        ).alias("gini"),
    )
