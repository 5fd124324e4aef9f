"""ML-backed operators (SURVEY.md §2 family F).

- F1 adversarial train/test-shift classifier: the reference trains CatBoost
  on a hash-sampled train=0/test=1 stack and reads validation AUC
  (ref: public_eda_pipeline.py:410-459). Spark-first: pyspark.ml
  GBTClassifier + BinaryClassificationEvaluator; stratified split via
  sampleBy. Exact AUC won't reproduce across GBM implementations — the
  behavioral contract is AUC ~ 0.5 on shift-free data (ref report 0.5007).
- F2/F3 agglomerative clustering + silhouette over a precomputed distance
  matrix: driver-scale ops on tiny (n_targets x n_targets) matrices
  (ref lines 183-209). sklearn/scipy are unavailable here, so both are
  implemented in plain numpy (average linkage, standard definitions). The
  distance matrix itself comes from the distributed moments engine.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.functions.litexpr import sql_long_array
from datafusion_cyberpolka_eda_spark.functions.sampling import hash_sample
from datafusion_cyberpolka_eda_spark.operators.relational import union_stack


def adversarial_shift_auc(
    df_a: DataFrame,
    df_b: DataFrame,
    feature_cols: list[str],
    key_col: str | None = None,
    sample_pct: float = 20,
    seed: int = 42,
    max_iter: int = 40,
    max_depth: int = 6,
    step_size: float = 0.08,
    feature_subset_strategy: str = "sqrt",
) -> float:
    """Train a GBT to distinguish df_a (label 0) from df_b (label 1); return
    holdout AUC. AUC ~ 0.5 => no covariate shift between the two tables.

    Scale notes: sampling happens below the union (pushdown filter); the
    assembled vector keeps only ``feature_cols``; training data is the only
    thing that grows with sample_pct. Split-finding evaluates only a sqrt
    subset of features per node by default — the same idea as CatBoost's
    rsm feature subsampling; shift-detection power comes from many trees,
    not exhaustive per-node feature scans (measured ~2x on the fit; the
    behavioral contract — AUC~0.5 shift-free, >>0.5 under injected shift —
    is test-locked either way).
    """
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    def prep(df: DataFrame) -> DataFrame:
        if key_col is not None and sample_pct < 100:
            df = hash_sample(df, key_col, sample_pct, seed)
        keep = [key_col] if key_col is not None else []
        return df.select(
            *keep, *[F.col(c).cast("double").alias(c) for c in feature_cols]
        ).na.fill(-1.0, feature_cols)

    stacked = union_stack([prep(df_a), prep(df_b)], "label", [0, 1]).withColumn(
        "label", F.col("label").cast("double")
    )
    # 75/25 holdout (ref train_test_split, lines 437-443). With a key
    # column the split is a deterministic hash filter — no extra shuffle,
    # reproducible under retries; per-row bernoulli either way, matching
    # sampleBy's distribution. exceptAll would cost a full-width shuffle.
    if key_col is not None:
        bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + 7)), F.lit(100))
        train = stacked.filter(bucket < 75).drop(key_col)
        test = stacked.filter(bucket >= 75).drop(key_col)
    else:
        train = stacked.stat.sampleBy("label", {0.0: 0.75, 1.0: 0.75}, seed=seed)
        test = stacked.exceptAll(train)

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    gbt = GBTClassifier(
        labelCol="label",
        featuresCol="features",
        maxIter=max_iter,
        maxDepth=max_depth,
        stepSize=step_size,
        seed=seed,
        featureSubsetStrategy=feature_subset_strategy,
    )
    model = gbt.fit(assembler.transform(train))
    pred = model.transform(assembler.transform(test))
    ev = BinaryClassificationEvaluator(labelCol="label", metricName="areaUnderROC")
    return float(ev.evaluate(pred))


def agglomerative_average(dist: np.ndarray, k: int) -> np.ndarray:
    """Average-linkage agglomerative clustering over a precomputed distance
    matrix (operator F2; ref AgglomerativeClustering lines 187-194).
    Naive O(n^3) — inputs are tiny driver-side matrices (41x41). Returns
    integer labels 0..k-1, numbered by first-member order for determinism.
    """
    n = dist.shape[0]
    clusters: dict[int, list[int]] = {i: [i] for i in range(n)}
    d = dist.astype(float).copy()
    np.fill_diagonal(d, np.inf)
    active = {i: i for i in range(n)}  # cluster id -> row index in d
    cd = {(i, j): d[i, j] for i in range(n) for j in range(i + 1, n)}

    next_id = n
    while len(clusters) > k:
        (a, b), _ = min(cd.items(), key=lambda kv: (kv[1], kv[0]))
        merged = clusters.pop(a) + clusters.pop(b)
        new_dists = {}
        for c, members in clusters.items():
            tot = 0.0
            for i in merged:
                for j in members:
                    tot += dist[i, j]
            new_dists[c] = tot / (len(merged) * len(members))
        cd = {
            key: v
            for key, v in cd.items()
            if a not in key and b not in key
        }
        for c, v in new_dists.items():
            cd[(min(c, next_id), max(c, next_id))] = v
        clusters[next_id] = merged
        next_id += 1

    labels = np.empty(n, dtype=int)
    ordered = sorted(clusters.values(), key=lambda ms: min(ms))
    for lab, members in enumerate(ordered):
        for i in members:
            labels[i] = lab
    return labels


def silhouette_precomputed(dist: np.ndarray, labels: np.ndarray) -> float:
    """Mean silhouette coefficient over a precomputed distance matrix
    (operator F3; ref silhouette_score(metric='precomputed'), line 195).
    Standard definition: s_i = (b_i - a_i) / max(a_i, b_i); singleton
    clusters get s_i = 0."""
    n = len(labels)
    uniq = np.unique(labels)
    if len(uniq) < 2:
        return float("nan")
    s = np.zeros(n)
    for i in range(n):
        own = labels == labels[i]
        n_own = own.sum()
        if n_own <= 1:
            s[i] = 0.0
            continue
        a = dist[i, own].sum() / (n_own - 1)
        b = np.inf
        for c in uniq:
            if c == labels[i]:
                continue
            mask = labels == c
            b = min(b, dist[i, mask].mean())
        s[i] = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
    return float(s.mean())


# ---- distributed integer-quantized logistic-regression trainer
# (l64, r9 verdict task 1) ----

LOGREG_PSCALE = 1_000_000  # probability/weight scale: p and w ride at 1e6


def logreg_train_supersteps(
    feats: DataFrame,
    dim: int,
    iters: int,
    lr_div: int,
    precond: list[int],
    w_init: list[int] | None = None,
) -> list[int]:
    """TRUE distributed logistic-regression training — the l59 superstep
    discipline applied to gradient descent (r9 verdict task 1), the
    model-based quality-filter trainer a DCLM/FineWeb-style pipeline
    needs:

      model   : hard-sigmoid logistic unit p = clamp(1/2 + z/4, 0, 1)
                with z = w . x — piecewise-LINEAR, so at the quantized
                scale every step is p_q = clamp(S/2 + floor(z_q/4), 0, S)
                in exact integer arithmetic (z_q/4 is a power-of-two
                division: exact in IEEE, identical in both engines; exp
                would be neither);
      grad    : g[j] = sum over rows of (p_q - y*S) * x[j] — exact int64
                sums, order-independent under any partitioning;
      update  : w[j] -= floor(float(g[j]) / (n * lr_div * precond[j])) —
                float-first division matching the oracle's
                CAST(g AS DOUBLE) / CAST(divisor AS DOUBLE), one
                correctly-rounded IEEE op per component; ``precond`` is
                a fixed power-of-two diagonal preconditioner absorbing
                the feature-scale imbalance a single global lr cannot.

    ``feats`` must have columns (id, y, x array<long> of ``dim``
    components, feature 0 = the bias 1). Weights start at zero, or at
    ``w_init`` (quantized ints at LOGREG_PSCALE) for WARM-START
    continue-training — the incremental model-update shape (l71): a
    day-2 increment fine-tunes the persisted day-1 model without
    replaying day-1 gradients. Returns the final quantized weights
    (ints at LOGREG_PSCALE).

    Scale shape: per superstep, ONE map pass over the rows (w enters as
    literal expressions — no join, the _lloyd_dists pattern) + one
    groupBy whose output is ``dim`` rows — communication O(dim)
    regardless of corpus size, the driver only ever holds dim integers.
    |g| <= n * S * max|x| must stay below 2^53 for the exact division
    (n <= ~4e9 rows at the test feature ranges — assert upstream at
    extreme scale). Ref anchor: similarity.py lloyd_kmeans_q (superstep
    discipline), registry/llm.py l60 (planting recipe)."""
    import math

    n = feats.count()
    if len(precond) != dim:
        raise ValueError(f"precond has {len(precond)} entries, dim={dim}")
    if w_init is not None and len(w_init) != dim:
        raise ValueError(f"w_init has {len(w_init)} entries, dim={dim}")
    w = [int(c) for c in w_init] if w_init is not None else [0] * dim
    s = LOGREG_PSCALE
    for _ in range(iters):
        z = F.aggregate(
            F.zip_with(
                "x",
                # one parsed literal array (litexpr): dim fewer py4j
                # round-trips per superstep plan build, same values
                F.expr(sql_long_array(w)),
                lambda xv, wv: xv * wv,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        p = F.least(
            F.greatest(
                F.lit(s // 2).cast("long")
                + F.floor(z / F.lit(4.0)).cast("long"),
                F.lit(0).cast("long"),
            ),
            F.lit(s).cast("long"),
        )
        e = p - F.col("y").cast("long") * F.lit(s).cast("long")
        rows = (
            feats.select(e.alias("e"), "x")
            .select("e", F.posexplode("x").alias("j", "v"))
            .groupBy("j")
            .agg(F.sum(F.col("e") * F.col("v")).alias("g"))
            .collect()
        )
        g = {r["j"]: r["g"] for r in rows}
        w = [
            w[j] - math.floor(float(g[j]) / float(n * lr_div * precond[j]))
            for j in range(dim)
        ]
    return w


def logreg_score_q(feats: DataFrame, w: list[int]) -> DataFrame:
    """(id, y, flagged): score rows against trained quantized weights —
    flagged iff z_q >= 0 (p >= 1/2). Map-side only, weights as
    literals."""
    z = F.aggregate(
        F.zip_with(
            "x",
            F.expr(sql_long_array(w)),
            lambda xv, wv: xv * wv,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return feats.select("id", "y", (z >= 0).alias("flagged"))
