"""Unit tests for registry.small_df — the VALUES-literal constructor every
driver-assembled result table now goes through. Round-trip fidelity here
is what keeps the oracle value-hash comparisons honest."""

from __future__ import annotations

import math

import numpy as np
import pytest

from datafusion_cyberpolka_eda_spark.registry import small_df

SCHEMA = "name string, x double, k bigint, ok boolean"


def test_round_trip_exact_doubles(spark):
    vals = [0.1, 1 / 3, 1e-17, -2.5, 123456789.987654321, 5.0]
    rows = [(f"r{i}", v, i, True) for i, v in enumerate(vals)]
    got = {r["name"]: r for r in small_df(spark, rows, SCHEMA).collect()}
    for i, v in enumerate(vals):
        assert got[f"r{i}"]["x"] == v  # bit-identical, not approx
        assert got[f"r{i}"]["k"] == i


def test_nan_inf_null(spark):
    rows = [
        ("nan", float("nan"), 1, True),
        ("pinf", float("inf"), 2, False),
        ("ninf", float("-inf"), 3, True),
        ("null", None, None, None),
    ]
    got = {r["name"]: r for r in small_df(spark, rows, SCHEMA).collect()}
    assert math.isnan(got["nan"]["x"])
    assert got["pinf"]["x"] == float("inf")
    assert got["ninf"]["x"] == float("-inf")
    assert got["null"]["x"] is None
    assert got["null"]["k"] is None
    assert got["null"]["ok"] is None


def test_string_escaping(spark):
    tricky = ["it's", 'quo"te', "back\\slash", "co,mma", "pa(ren)", "%s"]
    rows = [(s, 0.0, i, True) for i, s in enumerate(tricky)]
    names = {r["name"] for r in small_df(spark, rows, SCHEMA).collect()}
    assert names == set(tricky)


def test_numpy_scalars(spark):
    rows = [("np", np.float64(0.25), np.int64(7), np.bool_(True))]
    r = small_df(spark, rows, SCHEMA).collect()[0]
    assert r["x"] == 0.25 and r["k"] == 7 and r["ok"] is True


def test_empty_rows_falls_back(spark):
    df = small_df(spark, [], SCHEMA)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["name", "x", "k", "ok"]


def test_schema_types_enforced(spark):
    df = small_df(spark, [("a", 1.5, 2, False)], SCHEMA)
    assert [str(f.dataType) for f in df.schema.fields] == [
        "StringType()", "DoubleType()", "LongType()", "BooleanType()",
    ]


def test_parenthesized_types_rejected(spark):
    with pytest.raises(ValueError):
        small_df(spark, [(1,)], "d decimal(18,2)")


def test_bad_identifiers_rejected(spark):
    with pytest.raises(ValueError):
        small_df(spark, [(1,)], "bad-name bigint")
    with pytest.raises(ValueError):
        small_df(spark, [(1,)], "x bigint; drop")


def test_negative_zero_keeps_sign_bit(spark):
    rows = [("nz", -0.0, 1, True), ("pz", 0.0, 2, True)]
    got = {r["name"]: r for r in small_df(spark, rows, SCHEMA).collect()}
    assert math.copysign(1.0, got["nz"]["x"]) < 0  # -0.0, not +0.0
    assert math.copysign(1.0, got["pz"]["x"]) > 0


class TestSweepRotation:
    """Guards the round-3 verdict's #1 defect class: the driver sweeps
    only the first ~50 queries() entries, so never-swept queries must
    lead the ordering and must fit inside the window."""

    def test_fresh_entries_lead_and_fit_window(self):
        import __spark_entry__ as entrymod
        from datafusion_cyberpolka_eda_spark.registry import _SWEPT_PRIOR_ROUNDS

        names = list(entrymod.queries())
        oracles = entrymod.oracle_sql()
        fresh = [n for n in names if n not in _SWEPT_PRIOR_ROUNDS]
        # every fresh entry must be inside the ~50-entry sweep window
        assert len(fresh) <= 50, (
            f"{len(fresh)} never-swept queries exceed the sweep window; "
            "move older names into _SWEPT_PRIOR_ROUNDS or defer additions"
        )
        # fresh entries must occupy the FRONT of the ordering
        assert names[: len(fresh)] == fresh, (
            "never-swept queries must lead queries() order"
        )
        # oracle-bearing fresh entries come before rows-only fresh ones
        kinds = [oracles.get(n) is not None for n in fresh]
        assert kinds == sorted(kinds, reverse=True), (
            "fresh oracle-bearing entries must precede rows-only entries"
        )
