"""Query registry: every implemented operator exposed as a (Spark callable,
DuckDB oracle SQL) pair over the driver testdata (TESTDATA.md tables).

Naming: `<survey-operator-id>_<description>` so the judge can line entries
up against SURVEY.md §2's inventory.

Cross-engine float determinism rules (SURVEY.md §5.3):
- raw column passthrough and pure IEEE scalar arithmetic (+,-,*,/ on the
  same parquet doubles) are bitwise identical across engines — no rounding;
- money aggregations cast to DECIMAL before SUM (exact integer arithmetic in
  both engines, associativity-proof), then cast the final scalar to double;
- statistical outputs whose accumulation order genuinely differs (corr,
  avg-of-many, AUC) are rounded to 6 dp on BOTH sides — engines agree to
  ~1e-12, so 6 dp rounding yields identical doubles.
"""

from __future__ import annotations

import json
import math
import re
from collections.abc import Callable
from pathlib import Path

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.functions.sampling import key_mod_sample
from datafusion_cyberpolka_eda_spark.operators import relational
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def _dec_sum(col: F.Column, prec: str = "decimal(24,4)") -> F.Column:
    """Exact associativity-proof sum of a money-like double column."""
    return F.sum(col.cast(prec)).cast("double")


def small_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Tiny driver-assembled result table as a SQL VALUES literal.

    `createDataFrame` ships rows through the Python→JVM RDD serialization
    path: ~0.3 s warm and ~2 s on first use per session — pure overhead
    for the dozens-of-rows tables the stats engine assembles on the driver
    (pair loops, moment summaries, contingencies). A VALUES clause parses
    JVM-side in ~0.06 s. Literals are emitted with round-trip precision
    (Python float repr), so values are bit-identical to the RDD path.

    `schema` is the same "name type, ..." string createDataFrame takes
    (primitive types only — no parens/decimals)."""
    if "(" in schema:
        raise ValueError(
            "small_df handles primitive types only (no decimal(p,s)/parens); "
            f"got schema {schema!r}"
        )
    fields = [tuple(p.strip().rsplit(" ", 1)) for p in schema.split(",")]
    ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    for name, typ in fields:
        if not ident.match(name) or not ident.match(typ):
            raise ValueError(f"small_df: invalid field spec {(name, typ)!r}")
    if not rows:
        return spark.createDataFrame([], schema)

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, (bool, np.bool_)):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (float, np.floating)):
            v = float(v)
            if math.isnan(v):
                return "CAST('NaN' AS DOUBLE)"
            if math.isinf(v):
                return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
            if v == 0.0 and math.copysign(1.0, v) < 0:
                # repr(-0.0) = '-0.0' parses as negate(DECIMAL 0.0) -> +0.0;
                # route through a string cast to keep the sign bit
                return "CAST('-0.0' AS DOUBLE)"
            return repr(v)  # shortest round-trip double literal
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"

    values = ",".join("(" + ",".join(lit(v) for v in row) + ")" for row in rows)
    anon = ",".join(f"c{i}" for i in range(len(fields)))
    cols = ",".join(
        f"CAST(c{i} AS {t}) AS {n}" for i, (n, t) in enumerate(fields)
    )
    return spark.sql(f"SELECT {cols} FROM (VALUES {values}) AS t({anon})")


def _round_cols(df: DataFrame, cols: list[str], scale: int = 6) -> DataFrame:
    """Round float columns with Spark's HALF_UP (= DuckDB ROUND, half away
    from zero). Never use Python round()/pandas .round() on oracle-compared
    values — those are banker's rounding and diverge on exact ties."""
    return df.select(
        *[
            F.round(F.col(c), scale).alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )



_REPO_ROOT = Path(__file__).resolve().parents[2]

# Query groups self-register on import (order defines display order).
from datafusion_cyberpolka_eda_spark.registry import core  # noqa: E402,F401
from datafusion_cyberpolka_eda_spark.registry import stats  # noqa: E402,F401
from datafusion_cyberpolka_eda_spark.registry import events  # noqa: E402,F401
from datafusion_cyberpolka_eda_spark.registry import llm  # noqa: E402,F401
from datafusion_cyberpolka_eda_spark.registry import extra  # noqa: E402,F401
from datafusion_cyberpolka_eda_spark.registry import formats  # noqa: E402,F401
from datafusion_cyberpolka_eda_spark.registry import scale  # noqa: E402,F401
from datafusion_cyberpolka_eda_spark.registry import analytic  # noqa: E402,F401
from datafusion_cyberpolka_eda_spark.registry import udf  # noqa: E402,F401
from datafusion_cyberpolka_eda_spark.registry import pipeline  # noqa: E402,F401

# Fallback swept-name set, used only when no CORRECTNESS_r*.json artifact
# is readable (e.g. the registry imported from a bare checkout without the
# committed driver artifacts). The live source of truth is
# load_swept_names() below, which derives the set from the artifacts so no
# hand edit is needed per round.
_SWEPT_FALLBACK = frozenset({
    # rounds 1-2 (CORRECTNESS_r01/r02)
    'b10_b11_prefix_conditional', 'b1_b2_project_cast_filter', 'b3_b4_null_ops', 'b6_key_stable_sample',
    'b7_b8_horizontal_sum', 'b9_string_split', 'c13_order_revenue_topk', 'c1_join_revenue_by_region',
    'c2_presampled_join', 'c6_anti_join_unseen', 'c6b_semi_join', 'c7_union_stack',
    'd13_group_mode', 'd16_numeric_profile', 'd1_count_rows', 'd2_wide_agg_pricing',
    'd3_null_rate_profile', 'd4_group_stats', 'd5_value_counts', 'd6_band_counts',
    'd8_distinct_counts', 'd9_distinct_values', 'e10_exact_quantiles', 'e11_ntile_deciles',
    'e12_whale_uplift', 'e13_fisher_whale', 'e13b_fisher_exact_grouped', 'e15_e16_standardize_moments',
    'e1_corr_matrix', 'e2_e4_pair_lift', 'e5_feature_target_screen', 'e6_point_biserial',
    'e7_auc_by_rank', 'g1_g2_topk_global', 'g3_grouped_topk', 'i1_json_extract',
    'j1_tumbling_window', 'j2_streaming_tumbling_window', 'j3_sessionize', 'j6_stateful_stream_rollup',
    'j8_watermark_append', 'j9_stream_dedup_watermark', 'l17_normalized_text_dedup', 'l1_dedup_exact',
    'l2_ngram_jaccard_pairs', 'l3_minhash_lsh_pairs', 'l4_simhash_fingerprints', 'l5_text_stats',
    'l6_marker_hits', 'l6b_lang_id_confusion',
    # round 3 (CORRECTNESS_r03)
    'l16_embedding_quantize_int8', 'l7_cosine_topk', 'l10_embedding_neardup', 'l9_multimodal_features',
    'l8c_ann_recall_bound', 'l8d_ann_lsh_portable', 'l3c_minhash_banded_portable', 'l4c_simhash_portable',
    'l12_vocab_topk', 'l13_tfidf_topk', 'l14_label_centroid_norms', 'l11_neardup_components',
    'h1_intersect', 'h2_except_all', 'b12_isin_filter', 'd14_rollup',
    'g5_pivot', 'l5b_quality_scores', 'l6c_lang_id_argmax', 'j4_asof_join',
    'j5_range_join', 'd15_cube', 'c5_left_join', 'd12_group_median',
    'c11_merge_upsert', 'c14_scd2_history', 'l15_fuzzy_name_pairs', 'p1_pagerank_trade_graph',
    'a5_csv_roundtrip', 'a8_orc_roundtrip', 'a6_json_roundtrip', 'a9_python_datasource',
    'a7_partitioned_pruning', 'c8_bucketed_colocated_join', 'c9_salted_skew_agg', 'c12_salted_skew_join',
    'c10_bloom_join_prefilter', 'e10b_approx_quantile_bound', 'g6_window_frames', 'g7_lag_lead',
    'j7_sliding_window', 'i2_datetime_functions', 'i3_array_lambda_ops', 'h3_subqueries',
    'd8b_approx_distinct_bound', 'k1_python_udtf', 'k2_pandas_udf_scalar', 'k4_arrow_batch_map',
    'e9b_indicator_auc_closed_form', 'e17_upper_triangle_mean',
})


def load_swept_names(artifact_dir: str | Path | None = None) -> tuple[set[str], int]:
    """Derive the already-driver-checked query-name set from the committed
    CORRECTNESS_r*.json artifacts (every key in an artifact was run by the
    external sweep that round). Returns (names, n_artifacts); n_artifacts
    doubles as the round index that drives the re-check tail rotation.
    Falls back to the frozen round-1-4 constant when no artifact is
    readable, so a bare checkout still orders sensibly."""
    root = Path(artifact_dir) if artifact_dir is not None else _REPO_ROOT
    names: set[str] = set()
    n_artifacts = 0
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(data, dict) and data:
            n_artifacts += 1
            names.update(k for k in data if isinstance(k, str))
    if n_artifacts == 0:
        return set(_SWEPT_FALLBACK), 0
    return names, n_artifacts


def load_latest_rows(artifact_dir: str | Path | None = None) -> dict[str, dict]:
    """name -> its row in the HIGHEST-round CORRECTNESS artifact that
    contains it (artifacts sort lexically by round number)."""
    root = Path(artifact_dir) if artifact_dir is not None else _REPO_ROOT
    latest: dict[str, dict] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            latest.update(
                {k: v for k, v in data.items() if isinstance(v, dict)}
            )
    return latest


def load_latest_round(artifact_dir: str | Path | None = None) -> dict[str, int]:
    """name -> round number of the HIGHEST-round CORRECTNESS artifact that
    contains it — the staleness signal driving the sweep-order tail."""
    root = Path(artifact_dir) if artifact_dir is not None else _REPO_ROOT
    out: dict[str, int] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        m = re.search(r"CORRECTNESS_r(\d+)", f.name)
        rn = int(m.group(1)) if m else 0
        if isinstance(data, dict):
            for k in data:
                if isinstance(k, str):
                    out[k] = rn
    return out


def plan_sweep_order(
    has_oracle: dict[str, bool], swept: set[str], staleness: dict[str, int]
) -> list[str]:
    """Pure ordering rule (unit-testable without Spark): never-swept
    oracle-bearing names first (strongest value-hash signal), never-swept
    rows-only names next, then the previously-swept block ordered
    STALEST-FIRST (lowest latest-check round, registration order as the
    deterministic tie-break) so the driver's bounded ~50-slot sweep window
    always re-checks the names whose last external verification is oldest.
    Replaces the r3-r5 fixed-stride rotation, under which 69 names entered
    round 6 with a 3+-round-old latest check (r5 verdict task 3)."""
    reg_pos = {n: i for i, n in enumerate(has_oracle)}
    fresh_oracle = [n for n, o in has_oracle.items() if n not in swept and o]
    fresh_rows = [n for n, o in has_oracle.items() if n not in swept and not o]
    swept_block = sorted(
        (n for n, o in has_oracle.items() if n in swept and o),
        key=lambda n: (staleness.get(n, 0), reg_pos[n]),
    )
    # already-swept rows-only entries (no oracle by design, each with an
    # oracle-green twin + pytest coverage) sort dead last: the sweep window
    # then contains only value-hash-checkable rows
    swept_rows = [n for n, o in has_oracle.items() if n in swept and not o]
    return fresh_oracle + fresh_rows + swept_block + swept_rows


def _sweep_rotate() -> None:
    swept, _n_artifacts = load_swept_names()
    latest = load_latest_rows()
    has_oracle = {k: v[1] is not None for k, v in _REGISTRY.items()}
    # Re-promote to fresh any oracle-bearing name whose LATEST external
    # check wasn't hash-green (a rows-only entry that since gained an
    # oracle, or a failed row): it must lead the next sweep window.
    promoted = (
        {
            nm
            for nm in swept
            if has_oracle.get(nm) and latest.get(nm, {}).get("hash_match") is not True
        }
        if latest
        else set()  # fallback constant: no row data to judge against
    )
    order = plan_sweep_order(
        has_oracle,
        swept - promoted,
        load_latest_round(),
    )
    reordered = {k: _REGISTRY[k] for k in order}
    _REGISTRY.clear()
    _REGISTRY.update(reordered)


_sweep_rotate()
