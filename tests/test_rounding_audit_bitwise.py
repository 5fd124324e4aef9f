"""The local verify gates must be BITWISE on floats (r8 verdict task 2).

The r8 driver red was a -0.0/+0.0 divergence: DuckDB ROUND preserves the
sign of a tiny negative, Spark F.round (BigDecimal HALF_UP) drops it; the
values are ==-equal but byte/hash-different under the driver's value hash,
so a sign-blind local comparator shipped the same red twice. These tests
pin the sign-sensitivity of every local comparator so the class cannot
return.
"""

from __future__ import annotations

import math
import os
import struct
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rounding_audit import _CANON_NAN, _fix, canon_pdf  # noqa: E402


class TestFixBitwise:
    def test_negative_zero_differs(self):
        assert _fix(-0.0) != _fix(0.0)
        assert _fix(-0.0) == struct.pack("<d", -0.0)

    def test_nan_canonicalized(self):
        # any NaN payload maps to the one canonical quiet NaN
        weird_nan = struct.unpack("<d", struct.pack("<Q", 0x7FF8DEADBEEF0001))[0]
        assert math.isnan(weird_nan)
        assert _fix(weird_nan) == _CANON_NAN == _fix(float("nan"))

    def test_ordinary_floats_roundtrip(self):
        for v in (1.5, -1.5, 1e-300, math.pi):
            assert _fix(v) == struct.pack("<d", v)

    def test_nested_containers(self):
        assert _fix([-0.0]) != _fix([0.0])
        assert _fix({"k": -0.0}) != _fix({"k": 0.0})


class TestCanonPdf:
    def test_sign_of_zero_detected(self):
        a, _ = canon_pdf(pd.DataFrame({"v": [-0.0]}))
        b, _ = canon_pdf(pd.DataFrame({"v": [0.0]}))
        assert a != b

    def test_numpy_unboxing_matches_python(self):
        a, _ = canon_pdf(pd.DataFrame({"v": np.array([0.25], dtype=np.float64)}))
        b, _ = canon_pdf(pd.DataFrame({"v": [0.25]}))
        assert a == b

    def test_array_column_unboxed(self):
        pdf = pd.DataFrame({"v": [np.array([1.0, -0.0])]})
        a, _ = canon_pdf(pdf)
        b, _ = canon_pdf(pd.DataFrame({"v": [[1.0, 0.0]]}))
        assert a != b  # -0.0 inside an array column still detected

    def test_columns_name_sorted(self):
        _, cols = canon_pdf(pd.DataFrame({"b": [1], "a": [2]}))
        assert cols == ["a", "b"]

    def test_none_and_bytes_sortable(self):
        # repr-keyed sort must not raise on None-vs-bytes columns
        rows, _ = canon_pdf(pd.DataFrame({"v": [None, "x", None]}))
        assert len(rows) == 3

    def test_duckdb_round_sign_normalization(self):
        """The oracle-side fix itself: ROUND keeps -0.0, ROUND()+0 drops it."""
        import duckdb

        r = duckdb.sql("SELECT ROUND(-1e-9, 6) AS raw, ROUND(-1e-9, 6) + 0 AS fixed").df()
        raw = float(r["raw"].iloc[0])
        fixed = float(r["fixed"].iloc[0])
        assert raw == 0.0 and math.copysign(1.0, raw) < 0  # -0.0, the trap
        assert struct.pack("<d", fixed) == struct.pack("<d", 0.0)


class TestDriverDryrunComparator:
    """Mirror of the inline comparator in tools/driver_dryrun.py."""

    @staticmethod
    def _bitwise_equal(a: np.ndarray, b: np.ndarray) -> bool:
        af = a.astype(np.float64).copy()
        bf = b.astype(np.float64).copy()
        af[np.isnan(af)] = np.float64("nan")
        bf[np.isnan(bf)] = np.float64("nan")
        return af.tobytes() == bf.tobytes()

    def test_negative_zero_caught(self):
        assert not self._bitwise_equal(np.array([-0.0]), np.array([0.0]))

    def test_nan_payloads_equal(self):
        weird = struct.unpack("<d", struct.pack("<Q", 0x7FF8000000000BAD))[0]
        assert self._bitwise_equal(np.array([weird]), np.array([float("nan")]))

    def test_equal_values_pass(self):
        v = np.array([1.0, -2.5, 0.0, float("inf")])
        assert self._bitwise_equal(v, v.copy())
