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
    """Guards the round-3/r4 verdict's #1 defect class: the driver sweeps
    only the first ~50 queries() entries, so never-swept queries must
    lead the ordering, must fit inside the window — and (round 5) the
    swept set must be DERIVED from CORRECTNESS_r*.json, never hand-kept."""

    def test_fresh_entries_lead_and_fit_window(self):
        import __spark_entry__ as entrymod
        from datafusion_cyberpolka_eda_spark.registry import (
            load_latest_rows,
            load_swept_names,
        )

        swept, _ = load_swept_names()
        latest = load_latest_rows()
        names = list(entrymod.queries())
        oracles = entrymod.oracle_sql()
        # "fresh" = never externally checked, or checked but not
        # hash-green while an oracle now exists (the promotion rule)
        fresh = [
            n
            for n in names
            if n not in swept
            or (
                latest
                and oracles.get(n) is not None
                and latest.get(n, {}).get("hash_match") is not True
            )
        ]
        # every fresh entry must be inside the ~50-entry sweep window
        assert len(fresh) <= 50, (
            f"{len(fresh)} never-swept queries exceed the sweep window; "
            "defer additions or split across rounds"
        )
        # fresh entries must occupy the FRONT of the ordering
        assert names[: len(fresh)] == sorted(
            names[: len(fresh)], key=fresh.index
        ) and set(names[: len(fresh)]) == set(fresh), (
            "fresh/promoted queries must lead queries() order"
        )
        # oracle-bearing fresh entries come before rows-only fresh ones
        kinds = [oracles.get(n) is not None for n in names[: len(fresh)]]
        assert kinds == sorted(kinds, reverse=True), (
            "fresh oracle-bearing entries must precede rows-only entries"
        )

    def test_swept_set_derived_from_artifacts(self, tmp_path):
        import json

        from datafusion_cyberpolka_eda_spark.registry import load_swept_names

        row = {"rows_match": True, "err": None}
        (tmp_path / "CORRECTNESS_r01.json").write_text(
            json.dumps({"q_a": row, "q_b": row})
        )
        (tmp_path / "CORRECTNESS_r02.json").write_text(
            json.dumps({"q_b": row, "q_c": row})
        )
        (tmp_path / "CORRECTNESS_r03.json").write_text("not json {")  # skipped
        names, n = load_swept_names(tmp_path)
        assert names == {"q_a", "q_b", "q_c"}
        assert n == 2  # unreadable artifact doesn't advance the rotation

    def test_swept_set_falls_back_without_artifacts(self, tmp_path):
        from datafusion_cyberpolka_eda_spark.registry import (
            _SWEPT_FALLBACK,
            load_swept_names,
        )

        names, n = load_swept_names(tmp_path)  # empty dir
        assert n == 0
        assert names == set(_SWEPT_FALLBACK)

    def test_rows_only_swept_sort_last_and_promotion(self):
        """The live registry must (a) keep rows-only already-swept entries
        out of the 50-slot window and (b) re-promote names whose latest
        external check wasn't hash-green but that now carry an oracle."""
        from datafusion_cyberpolka_eda_spark.registry import (
            _REGISTRY,
            load_latest_rows,
        )

        order = list(_REGISTRY)
        assert [n for n in order[:50] if _REGISTRY[n][1] is None] == []
        latest = load_latest_rows()
        if latest:  # committed artifacts present
            promoted = [
                n
                for n in order
                if _REGISTRY[n][1] is not None
                and latest.get(n, {}).get("hash_match") is not True
            ]
            # every promoted name sits inside the sweep window
            assert all(order.index(p) < 50 for p in promoted)

    def test_plan_sweep_order_stalest_first(self):
        from datafusion_cyberpolka_eda_spark.registry import plan_sweep_order

        has_oracle = {
            "new_rows_only": False,
            "old1": True,
            "new_oracle": True,
            "old2": True,
            "old3": True,
            "old_rows_only": False,
        }
        swept = {"old1", "old2", "old3", "old_rows_only"}
        # old2 last checked r1, old3 r2, old1 r5: stalest leads the tail
        stale = {"old1": 5, "old2": 1, "old3": 2}
        order = plan_sweep_order(has_oracle, swept, stale)
        assert order == [
            "new_oracle", "new_rows_only", "old2", "old3", "old1",
            "old_rows_only",
        ]
        # a name missing from the staleness map counts as never-checked
        # (round 0) and therefore leads the swept block
        order2 = plan_sweep_order(has_oracle, swept, {"old1": 5, "old3": 2})
        assert order2[2] == "old2"
        # empty staleness (bare checkout, no artifacts): registration
        # order preserved deterministically
        order3 = plan_sweep_order(has_oracle, swept, {})
        assert order3[2:5] == ["old1", "old2", "old3"]

    def test_load_latest_round(self, tmp_path):
        import json

        from datafusion_cyberpolka_eda_spark.registry import load_latest_round

        row = {"rows_match": True, "err": None}
        (tmp_path / "CORRECTNESS_r01.json").write_text(
            json.dumps({"q_a": row, "q_b": row})
        )
        (tmp_path / "CORRECTNESS_r03.json").write_text(
            json.dumps({"q_b": row, "q_c": row})
        )
        assert load_latest_round(tmp_path) == {"q_a": 1, "q_b": 3, "q_c": 3}

    def test_live_swept_tail_is_stalest_first(self):
        """The live registry's swept oracle-bearing block must be ordered
        by ascending latest-check round — the guarantee the r5 verdict's
        freshness task asked for (no name silently ages out of re-check)."""
        from datafusion_cyberpolka_eda_spark.registry import (
            _REGISTRY,
            load_latest_round,
            load_latest_rows,
            load_swept_names,
        )

        swept, _ = load_swept_names()
        if not swept:
            return
        latest_round = load_latest_round()
        latest = load_latest_rows()
        promoted = {
            nm
            for nm in swept
            if _REGISTRY.get(nm, (None, None))[1] is not None
            and latest.get(nm, {}).get("hash_match") is not True
        }
        tail_rounds = [
            latest_round.get(n, 0)
            for n in _REGISTRY
            if n in swept - promoted and _REGISTRY[n][1] is not None
        ]
        assert tail_rounds == sorted(tail_rounds)


class TestSweepOrderProperties:
    """Property-based invariants for plan_sweep_order — the ordering is
    what the external driver consumes, so a subtle regression here
    silently reduces verification coverage for every future round."""

    def test_invariants_hold_for_arbitrary_inputs(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from datafusion_cyberpolka_eda_spark.registry import plan_sweep_order

        names = st.lists(
            st.text(alphabet="abcdefgh", min_size=1, max_size=6),
            min_size=0, max_size=25, unique=True,
        )

        @settings(max_examples=200, deadline=None)
        @given(
            names=names,
            oracle_bits=st.lists(st.booleans(), min_size=25, max_size=25),
            swept_bits=st.lists(st.booleans(), min_size=25, max_size=25),
            rounds=st.lists(st.integers(0, 9), min_size=25, max_size=25),
        )
        def check(names, oracle_bits, swept_bits, rounds):
            has_oracle = {n: oracle_bits[i] for i, n in enumerate(names)}
            swept = {n for i, n in enumerate(names) if swept_bits[i]}
            stale = {n: rounds[i] for i, n in enumerate(names) if swept_bits[i]}
            order = plan_sweep_order(has_oracle, swept, stale)
            # permutation of the input, nothing lost or invented
            assert sorted(order) == sorted(names)
            # block structure: fresh-oracle, fresh-rows, swept-oracle,
            # swept-rows — verify by classifying each position
            def cls(n):
                if n not in swept:
                    return 0 if has_oracle[n] else 1
                return 2 if has_oracle[n] else 3
            kinds = [cls(n) for n in order]
            assert kinds == sorted(kinds)
            # swept oracle block is stalest-first
            tail = [n for n in order if cls(n) == 2]
            tr = [stale.get(n, 0) for n in tail]
            assert tr == sorted(tr)

        check()


class TestBenchStdoutBudget:
    """bench.py's one-line JSON is the driver's BENCH_r{N} artifact and
    the driver records only the ~2000-char stdout tail — a line that
    overruns loses the headline metrics (observed in round 1). Pin the
    trimming behavior without needing Spark."""

    def _out(self, n_queries):
        return {
            "metric": "total_query_wall_seconds",
            "value": 123.4,
            "unit": "sec",
            "floor_sec": 0.1,
            "net_value": 100.0,
            "n_queries": n_queries,
            "reps": 3,
            "run_spread_sec": 40.0,
            "oracle_total_sec": 60.0,
            "ratio_net": 1.3,
            "detail": "BENCH_DETAIL.json",
            "core_ops": {"minhash_banded_pairs": 1.2, "simhash_near_pairs": 1.1},
            "queries": {
                f"very_long_query_name_number_{i:04d}": round(10.0 - i * 0.01, 2)
                for i in range(n_queries)
            },
            "sf": 0.1,
        }

    def test_line_fits_budget_and_keeps_headline(self):
        import json as _json

        from bench import STDOUT_BUDGET, build_stdout_line

        out = self._out(400)
        line = build_stdout_line(out)
        assert len(line) <= STDOUT_BUDGET
        d = _json.loads(line)
        for k in ("value", "net_value", "ratio_net", "core_ops",
                  "run_spread_sec", "n_queries"):
            assert k in d
        # slowest entries survive, fastest were dropped
        kept = list(d["queries"])
        assert kept[0] == "very_long_query_name_number_0000"
        assert len(kept) < 400

    def test_small_payload_untrimmed(self):
        import json as _json

        from bench import build_stdout_line

        out = self._out(3)
        line = build_stdout_line(out)
        assert len(_json.loads(line)["queries"]) == 3
