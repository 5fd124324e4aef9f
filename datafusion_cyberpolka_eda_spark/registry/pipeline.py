"""pipeline_summary: the flagship EDA pipeline as a driver-checked query.

The full reference-parity pipeline (pipeline/eda.py — all 29 artifacts +
summary.json, mirroring ref:eda_workspace/public_eda_pipeline.py:691-715)
was previously proven only by pytest. This entry runs the COMPLETE
pipeline over a small committed fixture (fixtures/eda_small, deterministic
seed-7 parquet, 6000 train / 2000 test rows; seed 7 chosen because its
test split carries real unseen categories — seed 42 drew zero, which
made the unseen metrics vacuously checked) and returns the
SQL-recomputable summary.json scalars as (metric, value) rows; the DuckDB
oracle recomputes every one of them from the same fixture parquet files
with read_parquet — so the headline deliverable is value-hash-checked by
the external driver, not just by the test suite.

Scalars that are fundamentally non-SQL (adversarial GBT AUC, silhouette,
cluster shares, Fisher-gated whale pairs) stay covered by the exact-value
pytest asserts in tests/test_eda_pipeline.py and are not emitted here.

The run uses pct=100 sampling knobs so every count the oracle recomputes
is sample-free (hash_sample's xxhash64 has no DuckDB twin), and a 2-tree
GBT so the non-checked adversarial stage stays cheap.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from datafusion_cyberpolka_eda_spark.registry import (
    _REPO_ROOT,
    _round_cols,
    register,
    small_df,
)

FIXTURE_DIR = _REPO_ROOT / "fixtures" / "eda_small"

# One full pipeline run per process, shared by pipeline_summary and
# pipeline_artifacts (the run is ~15 s; the two entries check disjoint
# slices of the same output). The artifact dir lives for the process so
# the CSV FILES — not an in-memory recomputation — are what gets checked.
_RUN_CACHE: dict[str, tuple[dict, str]] = {}

_TARGETS = [
    "target_1_1", "target_1_2", "target_2_1", "target_2_2", "target_3_1",
    "target_5_1", "target_5_2", "target_3_2", "target_3_3", "target_10_1",
]
_ANTAGONIST = "target_10_1"
_OPEN_TARGETS = [t for t in _TARGETS if t != _ANTAGONIST]
_EXTRA_COLS = [f"num_feature_{100 + i}" for i in range(1, 51)]
_CAT_COLS = [f"cat_feature_{i}" for i in range(1, 9)]

# summary.json keys emitted here (order = output order before the driver's
# name-sort); everything below is recomputed independently by the oracle.
_METRICS = [
    "rows_train", "rows_test", "n_targets", "n_features_main",
    "n_features_extra", "targets_lt_1pct", "targets_lt_01pct",
    "targets_lt_50", "min_positive_count", "target_10_1_negative_share",
    "target_10_1_mean_corr", "filled_extra_count_auc",
    "filled_extra_count_pointbiserial", "cat_features_with_unseen_in_test",
    "max_unseen_rate_test_rows", "screen_sample_rows",
]


def _oracle() -> str:
    tt = f"read_parquet('{FIXTURE_DIR}/train_target.parquet')"
    tm = f"read_parquet('{FIXTURE_DIR}/train_main_features.parquet')"
    te = f"read_parquet('{FIXTURE_DIR}/test_main_features.parquet')"
    tx = f"read_parquet('{FIXTURE_DIR}/train_extra_features.parquet')"
    prev_union = "\n      UNION ALL ".join(
        f"SELECT '{t}' AS name, CAST(SUM({t}) AS BIGINT) AS pos FROM {tt}"
        for t in _TARGETS
    )
    corr_union = "\n      UNION ALL ".join(
        f"SELECT corr({_ANTAGONIST}, {t}) AS c FROM {tt}"
        for t in _OPEN_TARGETS
    )
    filled = " + ".join(f"CAST({c} IS NOT NULL AS INT)" for c in _EXTRA_COLS)
    any_open = " + ".join(_OPEN_TARGETS)
    unseen_union = "\n      UNION ALL ".join(
        f"""SELECT
          (SELECT COUNT(DISTINCT {c}) FROM {te}
           WHERE {c} NOT IN (SELECT DISTINCT {c} FROM {tm})) AS cnt,
          (SELECT CAST(COUNT(*) AS DOUBLE) FROM {te}
           WHERE {c} NOT IN (SELECT DISTINCT {c} FROM {tm}))
            / (SELECT COUNT(*) FROM {te}) AS rate"""
        for c in _CAT_COLS
    )
    return f"""
    WITH prev AS (
      {prev_union}
    ),
    corrs AS (
      {corr_union}
    ),
    fc AS (
      SELECT {filled} AS fcv,
             CAST(({any_open}) > 0 AS INT) AS y
      FROM {tx} x JOIN {tt} t USING (customer_id)
    ),
    aucg AS (
      SELECT fcv, CAST(SUM(y) AS DOUBLE) AS pos, CAST(SUM(1 - y) AS DOUBLE) AS neg
      FROM fc GROUP BY fcv
    ),
    aucc AS (
      SELECT pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY fcv
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg_below
      FROM aucg
    ),
    auc AS (
      SELECT SUM(pos * (cum_neg_below + 0.5 * neg)) / (SUM(pos) * SUM(neg)) AS v
      FROM aucc
    ),
    unseen AS (
      {unseen_union}
    ),
    n AS (
      SELECT (SELECT COUNT(*) FROM {tm}) AS n_train,
             (SELECT COUNT(*) FROM {te}) AS n_test
    )
    SELECT metric, ROUND(value, 6) + 0 AS value FROM (
      SELECT 'rows_train' AS metric, (SELECT CAST(n_train AS DOUBLE) FROM n) AS value
      UNION ALL SELECT 'rows_test', (SELECT CAST(n_test AS DOUBLE) FROM n)
      UNION ALL SELECT 'n_targets',
        (SELECT COUNT(*) - 1 FROM (DESCRIBE SELECT * FROM {tt}))
      UNION ALL SELECT 'n_features_main',
        (SELECT COUNT(*) - 1 FROM (DESCRIBE SELECT * FROM {tm}))
      UNION ALL SELECT 'n_features_extra',
        (SELECT COUNT(*) - 1 FROM (DESCRIBE SELECT * FROM {tx}))
      UNION ALL SELECT 'targets_lt_1pct',
        (SELECT COUNT(*) FROM prev WHERE CAST(pos AS DOUBLE) / (SELECT n_train FROM n) < 0.01)
      UNION ALL SELECT 'targets_lt_01pct',
        (SELECT COUNT(*) FROM prev WHERE CAST(pos AS DOUBLE) / (SELECT n_train FROM n) < 0.001)
      UNION ALL SELECT 'targets_lt_50',
        (SELECT COUNT(*) FROM prev WHERE pos < 50)
      UNION ALL SELECT 'min_positive_count', (SELECT MIN(pos) FROM prev)
      UNION ALL SELECT 'target_10_1_negative_share',
        (SELECT AVG(CAST(c < 0 AS INT)) FROM corrs)
      UNION ALL SELECT 'target_10_1_mean_corr', (SELECT AVG(c) FROM corrs)
      UNION ALL SELECT 'filled_extra_count_auc', (SELECT v FROM auc)
      UNION ALL SELECT 'filled_extra_count_pointbiserial',
        (SELECT corr(y, fcv) FROM fc)
      UNION ALL SELECT 'cat_features_with_unseen_in_test',
        (SELECT COUNT(*) FROM unseen WHERE cnt > 0)
      UNION ALL SELECT 'max_unseen_rate_test_rows', (SELECT MAX(rate) FROM unseen)
      UNION ALL SELECT 'screen_sample_rows',
        (SELECT CAST(n_train AS DOUBLE) FROM n)
    ) m
    """


@register("pipeline_summary", _oracle())
def pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the COMPLETE EDA pipeline (scan -> 29 artifacts -> summary.json,
    ref:public_eda_pipeline.py end-to-end) on the committed seed-7 fixture
    and emit the SQL-recomputable summary scalars. Ignores sf_dir: the
    pipeline's input schema (main/extra/target feature tables) is its own,
    not the TPC-H-ish driver tables. pct=100 sampling knobs make every
    emitted count sample-free; a 2-tree GBT keeps the (non-emitted)
    adversarial stage cheap. Excluded from bench.py timing — the pipeline's
    perf artifact is the separately-tracked 750k-row end-to-end run
    (BASELINE.md)."""
    summary, _tables = _run_fixture_pipeline(spark)
    rows = [(k, float(summary[k])) for k in _METRICS]
    return _round_cols(small_df(spark, rows, "metric string, value double"), ["value"])


def _run_fixture_pipeline(spark: SparkSession) -> tuple[dict, str]:
    """Run the COMPLETE pipeline on the committed fixture once per process
    and return (summary, tables_dir). The temp output dir is kept until
    process exit so pipeline_artifacts reads the artifact CSVs the
    pipeline actually wrote."""
    if "run" in _RUN_CACHE:
        return _RUN_CACHE["run"]
    from datafusion_cyberpolka_eda_spark.pipeline.eda import EdaConfig, run_pipeline
    from datafusion_cyberpolka_eda_spark.pipeline.fixtures import generate_eda_fixture

    if not (FIXTURE_DIR / "train_target.parquet").exists():
        # bare checkout: regenerate the identical fixture (deterministic)
        generate_eda_fixture(str(FIXTURE_DIR), n_train=6000, n_test=2000, seed=7)
    cfg = EdaConfig(
        whale_sample_pct=100,  # 6000 rows: top-1% tail = 60 >= min_top 50
        screen_sample_pct=100,
        min_co_count_lift=20,  # ref's 100 is tuned to 750k rows
        adv_max_iter=2,
        adv_max_depth=3,
    )
    out_dir = tempfile.mkdtemp(prefix="pipeline_fixture_")
    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    summary = run_pipeline(spark, str(FIXTURE_DIR), out_dir, cfg)
    _RUN_CACHE["run"] = (summary, os.path.join(out_dir, "public_tables"))
    return _RUN_CACHE["run"]


# ---- pipeline_artifacts: hash-check ARTIFACT TABLES, not just scalars ----
# Five artifact CSVs (r5 verdict hardening item 4; whale + linear screen
# added per r6 verdict task 8 — they exercise E5/E12/E13 end-to-end
# THROUGH the pipeline, not just as standalone operators):
#   target_stats.csv              (ref:public_eda_pipeline.py:104)
#   target_pair_stats.csv         (ref:public_eda_pipeline.py:166)
#   extra_missingness_summary.csv (ref:public_eda_pipeline.py:264)
#   feature_target_linear_corr.csv (ref:public_eda_pipeline.py:463-594)
#   whale_signals.csv             (ref:public_eda_pipeline.py:598-669)
# emitted long-form (artifact, row_key, metric, value) from the files the
# pipeline wrote; DuckDB recomputes every value from the fixture parquet.
#
# NULL convention (advisor r6): a NaN pair/correlation metric crosses as
# an explicit NULL row on BOTH sides — the oracle builds its long forms
# with per-metric UNION ALLs (NULL-preserving), never UNPIVOT (which
# silently drops NULL values and would desync row counts the first time
# a regenerated fixture produces a NaN). The linear-screen table is the
# one exception BY THE PIPELINE'S OWN RULE: it drops non-finite corr
# rows before writing the CSV, so the oracle filters them identically.

_PAIR_METRICS = [
    "corr", "co_count", "co_rate", "expected_independent_rate", "pair_lift",
]
_NUM_MAIN = [f"num_feature_{i}" for i in range(1, 21)]
_SCREEN_FEATS = _NUM_MAIN + _CAT_COLS + _EXTRA_COLS
_LINEAR_METRICS = ["pearson_corr", "abs_corr", "null_rate"]
_WHALE_METRICS = ["top1_rate", "rest99_rate", "lift", "pvalue"]


def _artifacts_oracle() -> str:
    tt = f"read_parquet('{FIXTURE_DIR}/train_target.parquet')"
    tx = f"read_parquet('{FIXTURE_DIR}/train_extra_features.parquet')"
    stats_union = "\n      UNION ALL ".join(
        f"""SELECT 'target_stats' AS artifact, '{t}' AS row_key,
              'positive_count' AS metric, CAST(SUM({t}) AS DOUBLE) AS value
            FROM {tt}
            UNION ALL
            SELECT 'target_stats', '{t}', 'positive_rate',
              CAST(SUM({t}) AS DOUBLE) / COUNT(*)
            FROM {tt}"""
        for t in _TARGETS
    )
    pair_union = "\n      UNION ALL ".join(
        f"""SELECT '{ta}|{tb}' AS row_key,
              corr({ta}, {tb}) AS corr,
              CAST(SUM({ta} * {tb}) AS DOUBLE) AS co_count,
              CAST(SUM({ta} * {tb}) AS DOUBLE) / COUNT(*) AS co_rate,
              (CAST(SUM({ta}) AS DOUBLE) / COUNT(*))
                * (CAST(SUM({tb}) AS DOUBLE) / COUNT(*))
                AS expected_independent_rate,
              CASE WHEN SUM({ta}) > 0 AND SUM({tb}) > 0
                THEN (CAST(SUM({ta} * {tb}) AS DOUBLE) / COUNT(*))
                     / ((CAST(SUM({ta}) AS DOUBLE) / COUNT(*))
                        * (CAST(SUM({tb}) AS DOUBLE) / COUNT(*)))
                END AS pair_lift
            FROM {tt}"""
        for i, ta in enumerate(_TARGETS)
        for tb in _TARGETS[i + 1:]
    )
    miss_union = "\n      UNION ALL ".join(
        f"""SELECT 'extra_missingness' AS artifact, '{c}' AS row_key,
              'null_rate' AS metric,
              AVG(CAST({c} IS NULL AS INT)) AS value
            FROM {tx}"""
        for c in _EXTRA_COLS
    )
    # NULL-preserving long form (advisor r6): one UNION ALL per metric so
    # a NULL pair stat survives to a row instead of vanishing in UNPIVOT
    pairs_long = "\n      UNION ALL ".join(
        f"SELECT 'target_pair_stats' AS artifact, row_key, '{m}' AS metric, "
        f"{m} AS value FROM pairs"
        for m in _PAIR_METRICS
    )
    return f"""
    WITH pairs AS (
      {pair_union}
    ),
    {_screen_oracle_ctes()}
    -- + 0 normalizes -0.0 -> +0.0: DuckDB ROUND keeps the sign of a tiny
    -- negative (2 pearson_corr cells at sf0.01), Spark F.round drops it;
    -- ==-equal but hash-different under the driver's byte compare.
    SELECT artifact, row_key, metric, ROUND(value, 6) + 0 AS value FROM (
      {stats_union}
      UNION ALL {pairs_long}
      UNION ALL {miss_union}
      UNION ALL SELECT * FROM lin_long
      UNION ALL SELECT * FROM wh_long
    ) allrows
    """


def _screen_oracle_ctes() -> str:
    """CTEs recomputing feature_target_linear_corr.csv (mean-imputed
    Pearson screen over the full-sample 3-way join — pct=100 in the
    fixture config, so no sampling enters) and whale_signals.csv (exact
    p99 cutoffs, null-aware 2x2 contingencies, lgamma hypergeometric
    tail — the e13 oracle formulation — lift>=2 & p<0.05 significance
    filter) from the fixture parquet. Long-form outputs `lin_long` /
    `wh_long` ready for the final union."""
    tt = f"read_parquet('{FIXTURE_DIR}/train_target.parquet')"
    tm = f"read_parquet('{FIXTURE_DIR}/train_main_features.parquet')"
    tx = f"read_parquet('{FIXTURE_DIR}/train_extra_features.parquet')"
    main_cast = ", ".join(
        f"CAST(m.{c} AS DOUBLE) AS {c}" for c in _NUM_MAIN + _CAT_COLS
    )
    extra_cast = ", ".join(f"CAST(x.{c} AS DOUBLE) AS {c}" for c in _EXTRA_COLS)
    tgt_cast = ", ".join(f"CAST(t.{c} AS DOUBLE) AS {c}" for c in _TARGETS)
    means = ", ".join(f"AVG({c}) AS m_{c}" for c in _SCREEN_FEATS)
    imputed = ", ".join(f"COALESCE({c}, m_{c}) AS {c}" for c in _SCREEN_FEATS)
    feats_list = ", ".join(_SCREEN_FEATS)
    tgts_list = ", ".join(_TARGETS)
    null_rate_main = ", ".join(
        f"AVG(CAST({c} IS NULL AS INT)) AS {c}" for c in _NUM_MAIN + _CAT_COLS
    )
    null_rate_extra = ", ".join(
        f"AVG(CAST({c} IS NULL AS INT)) AS {c}" for c in _EXTRA_COLS
    )
    num_cast = ", ".join(f"CAST({c} AS DOUBLE) AS {c}" for c in _NUM_MAIN)
    num_list = ", ".join(_NUM_MAIN)
    wh_long = "\n      UNION ALL ".join(
        f"SELECT 'whale_signals' AS artifact, target || '|' || feature AS "
        f"row_key, '{m}' AS metric, {m} AS value FROM whsig"
        for m in _WHALE_METRICS
    )
    return f"""
    sc AS MATERIALIZED (
      SELECT m.customer_id, {main_cast}, {extra_cast}, {tgt_cast}
      FROM {tm} m JOIN {tx} x USING (customer_id) JOIN {tt} t USING (customer_id)
    ),
    mu AS (SELECT {means} FROM sc),
    sci AS MATERIALIZED (
      SELECT customer_id, {imputed} FROM sc CROSS JOIN mu
    ),
    fl AS (
      SELECT customer_id, fname, fval FROM sci
      UNPIVOT (fval FOR fname IN ({feats_list}))
    ),
    tlg AS (
      SELECT customer_id, tname, tval FROM sc
      UNPIVOT (tval FOR tname IN ({tgts_list}))
    ),
    lin AS (
      SELECT tname, fname, corr(fval, tval) AS c
      FROM fl JOIN tlg USING (customer_id)
      GROUP BY 1, 2
    ),
    nrm AS (SELECT {null_rate_main} FROM {tm}),
    nrx AS (SELECT {null_rate_extra} FROM {tx}),
    nr AS (
      SELECT fname, null_rate FROM nrm
      UNPIVOT (null_rate FOR fname IN ({", ".join(_NUM_MAIN + _CAT_COLS)}))
      UNION ALL
      SELECT fname, null_rate FROM nrx
      UNPIVOT (null_rate FOR fname IN ({", ".join(_EXTRA_COLS)}))
    ),
    linf AS (SELECT * FROM lin WHERE c IS NOT NULL AND isfinite(c)),
    lin_long AS (
      SELECT 'feature_target_linear_corr' AS artifact,
             tname || '|' || fname AS row_key,
             'pearson_corr' AS metric, c AS value FROM linf
      UNION ALL
      SELECT 'feature_target_linear_corr', tname || '|' || fname,
             'abs_corr', ABS(c) FROM linf
      UNION ALL
      SELECT 'feature_target_linear_corr', l.tname || '|' || l.fname,
             'null_rate', nr.null_rate
      FROM linf l JOIN nr ON nr.fname = l.fname
    ),
    nlw AS (
      SELECT customer_id, fname, fval
      FROM (SELECT customer_id, {num_cast} FROM {tm})
      UNPIVOT (fval FOR fname IN ({num_list}))
    ),
    cuts AS (
      SELECT fname, percentile_cont(0.99) WITHIN GROUP (ORDER BY fval) AS c
      FROM nlw GROUP BY fname
    ),
    rare AS (SELECT tname FROM tlg GROUP BY tname HAVING AVG(tval) < 0.005),
    ctw AS (
      SELECT n.fname AS feature, t.tname AS target,
             CAST(SUM(CASE WHEN n.fval >= c.c THEN 1 ELSE 0 END) AS BIGINT)
               AS top_n,
             CAST(SUM(CASE WHEN n.fval >= c.c THEN t.tval ELSE 0 END) AS BIGINT)
               AS top_pos,
             CAST(SUM(CASE WHEN n.fval < c.c THEN 1 ELSE 0 END) AS BIGINT)
               AS rest_n,
             CAST(SUM(CASE WHEN n.fval < c.c THEN t.tval ELSE 0 END) AS BIGINT)
               AS rest_pos
      FROM nlw n
      JOIN cuts c USING (fname)
      JOIN tlg t USING (customer_id)
      JOIN rare r ON r.tname = t.tname
      GROUP BY 1, 2
    ),
    okw AS (
      SELECT * FROM ctw WHERE top_n >= 50 AND rest_n >= 1000 AND rest_pos > 0
    ),
    ksw AS (
      SELECT unnest(generate_series(0,
        (SELECT COALESCE(MAX(LEAST(top_n, top_pos + rest_pos)), 0) FROM okw)
      )) AS k
    ),
    termsw AS (
      SELECT o.feature, o.target, ksw.k,
             (lgamma(top_n + 1) - lgamma(k + 1) - lgamma(top_n - k + 1))
           + (lgamma(rest_n + 1) - lgamma(top_pos + rest_pos - k + 1)
              - lgamma(rest_n - (top_pos + rest_pos - k) + 1))
           - (lgamma(top_n + rest_n + 1) - lgamma(top_pos + rest_pos + 1)
              - lgamma(top_n + rest_n - top_pos - rest_pos + 1)) AS lt
      FROM okw o JOIN ksw
        ON ksw.k BETWEEN o.top_pos AND LEAST(o.top_n, o.top_pos + o.rest_pos)
      WHERE o.top_pos + o.rest_pos - ksw.k <= o.rest_n
    ),
    whp AS (
      SELECT o.feature, o.target,
             CAST(o.top_pos AS DOUBLE) / o.top_n AS top1_rate,
             CAST(o.rest_pos AS DOUBLE) / o.rest_n AS rest99_rate,
             (CAST(o.top_pos AS DOUBLE) / o.top_n)
               / (CAST(o.rest_pos AS DOUBLE) / o.rest_n) AS lift,
             LEAST((SELECT SUM(exp(lt)) FROM termsw t
                    WHERE t.feature = o.feature AND t.target = o.target),
                   1.0) AS pvalue
      FROM okw o
    ),
    whsig AS (SELECT * FROM whp WHERE lift >= 2.0 AND pvalue < 0.05),
    wh_long AS (
      {wh_long}
    )"""


@register("pipeline_artifacts", _artifacts_oracle())
def pipeline_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-check the EDA pipeline's artifact TABLES (not just summary
    scalars): read back target_stats.csv, target_pair_stats.csv,
    extra_missingness_summary.csv, feature_target_linear_corr.csv and
    whale_signals.csv exactly as the pipeline wrote them (CSV round-trip
    preserves doubles via shortest-repr) and emit them long-form; the
    DuckDB oracle recomputes all 2643 values independently from the
    fixture parquet (prevalence sums, pairwise Pearson/phi, co-occurrence
    lifts, per-column null rates, the full mean-imputed 78-feature x
    10-target linear screen, and the whale stage end-to-end: exact p99
    cutoffs, null-aware contingencies, lgamma Fisher tails, the
    lift/p-value significance filter). This closes the gap between
    "operator green" (E5/E12/E13 standalone) and "pipeline-composed
    green". Shares the per-process pipeline run with pipeline_summary;
    like it, excluded from bench timing (the perf artifact is the
    750k-row run in BASELINE.md)."""
    import pandas as pd

    _summary, tables = _run_fixture_pipeline(spark)
    rows: list[tuple] = []
    ts = pd.read_csv(os.path.join(tables, "target_stats.csv"))
    for r in ts.itertuples():
        rows.append(("target_stats", r.target, "positive_count",
                     float(r.positive_count)))
        rows.append(("target_stats", r.target, "positive_rate",
                     float(r.positive_rate)))
    ps = pd.read_csv(os.path.join(tables, "target_pair_stats.csv"))
    for r in ps.itertuples():
        key = f"{r.target_a}|{r.target_b}"
        for m in _PAIR_METRICS:
            v = getattr(r, m)
            rows.append(("target_pair_stats", key, m,
                         None if pd.isna(v) else float(v)))
    ms = pd.read_csv(os.path.join(tables, "extra_missingness_summary.csv"))
    for r in ms.itertuples():
        rows.append(("extra_missingness", r.feature, "null_rate",
                     float(r.null_rate)))
    lc = pd.read_csv(os.path.join(tables, "feature_target_linear_corr.csv"))
    for r in lc.itertuples():
        key = f"{r.target}|{r.feature}"
        for m in _LINEAR_METRICS:
            v = getattr(r, m)
            rows.append(("feature_target_linear_corr", key, m,
                         None if pd.isna(v) else float(v)))
    ws = pd.read_csv(os.path.join(tables, "whale_signals.csv"))
    for r in ws.itertuples():
        key = f"{r.target}|{r.feature}"
        for m in _WHALE_METRICS:
            v = getattr(r, m)
            rows.append(("whale_signals", key, m,
                         None if pd.isna(v) else float(v)))
    df = small_df(
        spark, rows, "artifact string, row_key string, metric string, value double"
    )
    return _round_cols(df, ["value"])
