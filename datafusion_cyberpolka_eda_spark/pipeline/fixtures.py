"""Synthetic EDA fixture generator (FIXTURES.md §A): scaled-down mirrors of
the reference's archive/*.parquet inputs with the statistical properties
every pipeline stage needs to produce non-degenerate output:

- main features: numeric (spread null rates, heavy tails) + integer-coded
  categoricals (one high-cardinality; >=2 features whose test split has
  unseen categories at ~1e-3 row rate)
- extra features: null-rate bands from >99% to <10%, with missingness driven
  by a latent 'activity' variable that also drives targets (so the
  filled-count AUC is meaningfully > 0.5, ref summary 0.652)
- targets: prevalences 0.2%..30% across >=4 families; an antagonist target
  (never co-occurs, negatively correlated with the rest — the target_10_1
  pattern); a strongly lifted same-family pair (target_5_1/5_2 pattern);
  >=3 rare targets with whale-tail enrichment in specific num features
- no train/test covariate shift in main features (adversarial AUC ~ 0.5);
  optional shift injection to assert AUC >> 0.5

Deterministic for a given seed; written as parquet via pyarrow.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

N_NUM_MAIN = 20
N_CAT_MAIN = 8
N_EXTRA = 50

TARGETS = [
    # (name, base_prevalence, kind)
    ("target_1_1", 0.30, "common"),
    ("target_1_2", 0.10, "common"),
    ("target_2_1", 0.05, "common"),
    ("target_2_2", 0.02, "common"),
    ("target_3_1", 0.008, "mid"),
    ("target_5_1", 0.01, "pair_a"),
    ("target_5_2", 0.01, "pair_b"),
    ("target_3_2", 0.004, "rare"),  # whale-enriched via num_feature_1
    ("target_3_3", 0.004, "rare"),  # whale-enriched via num_feature_2
    ("target_10_1", 0.25, "antagonist"),
]

UNSEEN_CAT_FEATURES = {"cat_feature_1": [901, 902], "cat_feature_2": [77]}


def _gen_main(rng: np.random.Generator, n: int, activity: np.ndarray, test: bool) -> pd.DataFrame:
    cols: dict[str, np.ndarray] = {}
    for i in range(1, N_NUM_MAIN + 1):
        base = rng.lognormal(mean=1.0 + 0.1 * i, sigma=1.0, size=n)
        if i <= 5:
            base = base + activity * (2.0 + i)  # activity-linked signal
        null_rate = (i % 5) * 0.1  # 0, .1, .2, .3, .4 spread
        vals = base.astype(np.float64)
        mask = rng.random(n) < null_rate
        vals[mask] = np.nan
        cols[f"num_feature_{i}"] = vals
    for i in range(1, N_CAT_MAIN + 1):
        if i == 3:  # high-cardinality
            card = 500
        else:
            card = 3 + (i % 4)
        codes = rng.integers(0, card, size=n)
        if test and f"cat_feature_{i}" in UNSEEN_CAT_FEATURES:
            # inject unseen codes at ~1e-3 row rate
            unseen_codes = UNSEEN_CAT_FEATURES[f"cat_feature_{i}"]
            hit = rng.random(n) < 1.2e-3
            codes = np.where(
                hit, rng.choice(unseen_codes, size=n), codes
            )
        cols[f"cat_feature_{i}"] = codes.astype(np.int32)
    return pd.DataFrame(cols)


def _gen_extra(rng: np.random.Generator, n: int, activity: np.ndarray) -> pd.DataFrame:
    cols: dict[str, np.ndarray] = {}
    # null-rate bands: indices spread across >99%, 95-99, 50-95, 10-50, <=10
    for i in range(1, N_EXTRA + 1):
        if i <= 5:
            base_rate = 0.995
        elif i <= 12:
            base_rate = 0.96
        elif i <= 25:
            base_rate = 0.70
        elif i <= 40:
            base_rate = 0.30
        else:
            base_rate = 0.05
        # activity lowers missingness (drives filled-count signal)
        p_null = np.clip(base_rate - 0.25 * activity, 0.0, 1.0)
        vals = rng.normal(loc=i, scale=2.0, size=n)
        vals[rng.random(n) < p_null] = np.nan
        cols[f"num_feature_{100 + i}"] = vals
    return pd.DataFrame(cols)


def _gen_targets(rng: np.random.Generator, n: int, activity: np.ndarray, main: pd.DataFrame) -> pd.DataFrame:
    cols: dict[str, np.ndarray] = {}
    anti = None
    for name, prev, kind in TARGETS:
        if kind == "antagonist":
            continue  # built last from the union of the others
        p = np.clip(prev * (0.4 + 1.2 * activity), 0.0, 0.97)
        y = (rng.random(n) < p).astype(np.int8)
        if kind == "pair_b":
            # strong co-occurrence with pair_a (lift >> 1, corr ~ 0.5)
            y = np.where(
                cols["target_5_1"] == 1,
                (rng.random(n) < 0.5).astype(np.int8),
                (rng.random(n) < 0.002).astype(np.int8),
            )
        if kind == "rare":
            # whale enrichment: elevated rate in the top tail of a num feature
            feat = "num_feature_1" if name == "target_3_2" else "num_feature_2"
            x = main[feat].to_numpy()
            cut = np.nanquantile(x, 0.99)
            in_tail = np.nan_to_num(x, nan=-np.inf) >= cut
            p2 = np.where(in_tail, 0.12, prev * 0.8)
            y = (rng.random(n) < p2).astype(np.int8)
        cols[name] = y
    opened_any = np.maximum.reduce(list(cols.values()))
    # antagonist: fires only when nothing else did -> zero co-occurrence,
    # negative correlation with every other target
    anti_p = np.where(opened_any == 1, 0.0, 0.40)
    anti = (rng.random(n) < anti_p).astype(np.int8)
    cols["target_10_1"] = anti
    return pd.DataFrame(cols)


def generate_eda_fixture(
    out_dir: str,
    n_train: int = 12000,
    n_test: int = 4000,
    seed: int = 42,
    inject_shift: bool = False,
) -> dict[str, str]:
    """Write the four EDA tables as parquet; returns {table: path}."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    act_train = rng.beta(2, 5, size=n_train)
    act_test = rng.beta(2, 5, size=n_test)

    train_main = _gen_main(rng, n_train, act_train, test=False)
    test_main = _gen_main(rng, n_test, act_test, test=True)
    if inject_shift:
        test_main["num_feature_1"] = test_main["num_feature_1"] * 1.8 + 5.0
    train_extra = _gen_extra(rng, n_train, act_train)
    train_target = _gen_targets(rng, n_train, act_train, train_main)

    train_ids = np.arange(n_train, dtype=np.int64)
    test_ids = np.arange(1_000_000, 1_000_000 + n_test, dtype=np.int64)
    train_main.insert(0, "customer_id", train_ids)
    test_main.insert(0, "customer_id", test_ids)
    train_extra.insert(0, "customer_id", train_ids)
    train_target.insert(0, "customer_id", train_ids)

    paths = {}
    for name, df in [
        ("train_main_features", train_main),
        ("test_main_features", test_main),
        ("train_extra_features", train_extra),
        ("train_target", train_target),
    ]:
        p = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(p, index=False)
        paths[name] = p
    return paths
