"""Unit tests for driver-side statistical primitives (no SQL oracle):
Fisher exact, Student-t p-values, agglomerative clustering, silhouette.
Expected values precomputed with scipy/sklearn 1.x (not available in this
environment, so constants are pinned here)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from datafusion_cyberpolka_eda_spark.operators.ml import (
    agglomerative_average,
    silhouette_precomputed,
)
from datafusion_cyberpolka_eda_spark.operators.stats import (
    fisher_exact_greater,
    t_sf,
)


class TestFisherExact:
    # references computed with exact rational arithmetic (fractions.Fraction
    # + math.comb hypergeometric tail — an independent implementation path
    # from the lgamma-based production code)
    CASES = [
        ((8, 2, 1, 5), 0.024475524475524476),
        ((1, 9, 11, 3), 0.9999663480953022),
        ((5, 0, 1, 4), 0.023809523809523808),
        ((10, 10, 10, 10), 0.6238144327180454),
        ((0, 5, 5, 0), 1.0),
        ((100, 50, 50, 100), 5.691176803398959e-09),
    ]

    @pytest.mark.parametrize("table,expected", CASES)
    def test_matches_scipy(self, table, expected):
        a, b, c, d = table
        assert fisher_exact_greater(a, b, c, d) == pytest.approx(expected, rel=1e-9)

    def test_large_counts_stable(self):
        # log-gamma formulation must not overflow at cluster-scale counts
        p = fisher_exact_greater(1_000_000, 9_000_000, 900_000, 9_100_000)
        assert 0.0 <= p <= 1.0


class TestTSF:
    # references from high-resolution Simpson integration of the t density
    # (independent of the production betainc continued fraction)
    CASES = [
        (2.0, 10, 0.07338803477074006),
        (1.96, 1000, 0.05027318495575253),
        (0.5, 5, 0.6382988716409265),
        (10.0, 3, 0.0021283990584121787),
    ]

    @pytest.mark.parametrize("t,dof,expected", CASES)
    def test_matches_scipy(self, t, dof, expected):
        assert t_sf(t, dof) == pytest.approx(expected, rel=1e-9)


class TestAgglomerative:
    def test_two_clear_clusters(self):
        # two groups of points on a line: {0, 1, 2} and {10, 11, 12}
        pts = np.array([0.0, 1.0, 2.0, 10.0, 11.0, 12.0])
        dist = np.abs(pts[:, None] - pts[None, :])
        labels = agglomerative_average(dist, k=2)
        assert len(set(labels[:3])) == 1
        assert len(set(labels[3:])) == 1
        assert labels[0] != labels[3]
        # labels numbered by first-member order
        assert labels[0] == 0 and labels[3] == 1

    def test_k_equals_n(self):
        dist = np.array([[0.0, 1.0], [1.0, 0.0]])
        labels = agglomerative_average(dist, k=2)
        assert sorted(labels) == [0, 1]

    def test_average_linkage_chains_less_than_single(self):
        # three points: average linkage merges the tight pair first
        pts = np.array([0.0, 1.0, 2.5, 10.0])
        dist = np.abs(pts[:, None] - pts[None, :])
        labels = agglomerative_average(dist, k=2)
        assert labels[0] == labels[1] == labels[2]
        assert labels[3] != labels[0]


class TestSilhouette:
    def test_perfect_separation(self):
        pts = np.array([0.0, 0.1, 10.0, 10.1])
        dist = np.abs(pts[:, None] - pts[None, :])
        labels = np.array([0, 0, 1, 1])
        s = silhouette_precomputed(dist, labels)
        assert s > 0.95

    def test_hand_computed_reference(self):
        # points [0,1,3] vs [9,10,12]; per-point s_i = 1 - a_i/b_i worked
        # out by hand from the standard definition:
        # mean(25/31, 23.5/28, 14.5/22, 17/23, 21.5/26, 24.5/32)
        pts = np.array([0.0, 1.0, 3.0, 9.0, 10.0, 12.0])
        dist = np.abs(pts[:, None] - pts[None, :])
        labels = np.array([0, 0, 0, 1, 1, 1])
        expected = (25 / 31 + 23.5 / 28 + 14.5 / 22 + 17 / 23 + 21.5 / 26 + 24.5 / 32) / 6
        s = silhouette_precomputed(dist, labels)
        assert s == pytest.approx(expected, rel=1e-12)

    def test_single_cluster_nan(self):
        dist = np.zeros((3, 3))
        assert math.isnan(silhouette_precomputed(dist, np.zeros(3, dtype=int)))
