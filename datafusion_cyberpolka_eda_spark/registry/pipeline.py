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
    SELECT metric, ROUND(value, 6) AS value FROM (
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
# Three representative artifact CSVs (the r5 verdict's hardening item 4):
#   target_stats.csv            (ref:public_eda_pipeline.py:104)
#   target_pair_stats.csv       (ref:public_eda_pipeline.py:166)
#   extra_missingness_summary.csv (ref:public_eda_pipeline.py:264)
# emitted long-form (artifact, row_key, metric, value) from the files the
# pipeline wrote; DuckDB recomputes every value from the fixture parquet.

_PAIR_METRICS = [
    "corr", "co_count", "co_rate", "expected_independent_rate", "pair_lift",
]


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
    return f"""
    WITH pairs AS (
      {pair_union}
    ),
    pairs_long AS (
      SELECT 'target_pair_stats' AS artifact, row_key, metric, value
      FROM pairs
      UNPIVOT (value FOR metric IN ({', '.join(_PAIR_METRICS)}))
    )
    SELECT artifact, row_key, metric, ROUND(value, 6) AS value FROM (
      {stats_union}
      UNION ALL SELECT * FROM pairs_long
      UNION ALL {miss_union}
    ) allrows
    """


@register("pipeline_artifacts", _artifacts_oracle())
def pipeline_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-check the EDA pipeline's artifact TABLES (not just summary
    scalars): read back target_stats.csv, target_pair_stats.csv and
    extra_missingness_summary.csv exactly as the pipeline wrote them
    (CSV round-trip preserves doubles via shortest-repr) and emit them
    long-form; the DuckDB oracle recomputes all 295 values independently
    from the fixture parquet (prevalence sums, pairwise Pearson/phi,
    co-occurrence lifts, per-column null rates). Shares the per-process
    pipeline run with pipeline_summary; like it, excluded from bench
    timing (the perf artifact is the 750k-row run in BASELINE.md)."""
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
    df = small_df(
        spark, rows, "artifact string, row_key string, metric string, value double"
    )
    return _round_cols(df, ["value"])
