"""Property-based tests for the round-4 operator batch: CDC apply,
time-series gap fill, weighted sampling, and Z-order locality must agree
with straightforward pure-Python references on arbitrary inputs, not
just the fixed testdata. Few examples, one Spark job per example."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_KEYS = st.integers(min_value=0, max_value=9)
_OPS = st.sampled_from(["I", "U", "D"])
_CHANGES = st.lists(
    st.tuples(_KEYS, _OPS, st.integers(min_value=0, max_value=5),
              st.floats(min_value=-100, max_value=100, allow_nan=False)),
    min_size=0, max_size=25,
)


class TestCdcProperty:
    @given(changes=_CHANGES)
    @settings(**_SETTINGS)
    def test_matches_pure_python_replay(self, spark, changes):
        from datafusion_cyberpolka_eda_spark.operators.cdc import (
            cdc_apply,
            cdc_compact,
        )

        base_rows = [(k, float(k * 10)) for k in range(5)]  # keys 0-4 exist
        base = spark.createDataFrame(base_rows, "k bigint, v double")
        if changes:
            ch = spark.createDataFrame(
                [(k, op, seq, v) for k, op, seq, v in changes],
                "k bigint, op string, seq int, v double",
            )
        else:
            ch = spark.createDataFrame([], "k bigint, op string, seq int, v double")
        got = {
            r["k"]: r["v"]
            for r in cdc_apply(base, cdc_compact(ch, "k", "seq"), "k", ["v"]).collect()
        }

        # reference: latest change per key by the TOTAL (seq, op, payload)
        # desc order — same deterministic tiebreak as cdc_compact, so
        # exact (key, seq, op) duplicates with different payloads resolve
        # identically on both sides
        latest: dict[int, tuple] = {}
        for k, op, seq, v in changes:
            cur = latest.get(k)
            if cur is None or (seq, op, v) > cur:
                latest[k] = (seq, op, v)
        expect = dict(base_rows)
        for k, (_, op, v) in latest.items():
            if op == "D":
                expect.pop(k, None)
            else:
                expect[k] = v
        assert got == expect


class TestGapFillProperty:
    @given(
        obs=st.lists(
            st.tuples(st.integers(min_value=0, max_value=30),
                      st.floats(min_value=-50, max_value=50, allow_nan=False)),
            min_size=1, max_size=12, unique_by=lambda t: t[0],
        )
    )
    @settings(**_SETTINGS)
    def test_grid_locf_interp_invariants(self, spark, obs):
        from datafusion_cyberpolka_eda_spark.operators.timeseries import (
            gap_fill,
            resample_grid,
        )

        rows = [
            (1, f"2024-02-01 {h:02d}:30:00", float(v)) for h, v in obs if h < 24
        ] or [(1, "2024-02-01 00:30:00", 1.0)]
        df = spark.createDataFrame(rows, "k bigint, ts string, value double").select(
            "k", F.to_timestamp("ts").alias("ts"), "value"
        )
        out = gap_fill(resample_grid(df, "k", "ts", "value")).orderBy("bucket").collect()
        hours = sorted({int(r[1].split(" ")[1][:2]) for r in [(None, t, v) for _, t, v in rows]})
        # dense grid between min and max observed hour
        assert [r["bucket"].hour for r in out] == list(range(hours[0], hours[-1] + 1))
        by_hour = {int(t.split(" ")[1][:2]): v for _, t, v in rows}
        anchors = sorted(by_hour)
        for r in out:
            h = r["bucket"].hour
            if h in by_hour:  # observed rows pass through
                assert r["v"] == by_hour[h] == r["v_interp"] == r["v_locf"]
            else:
                prev = max(a for a in anchors if a < h)
                nxt = min(a for a in anchors if a > h)
                assert r["v_locf"] == by_hour[prev]
                expect = by_hour[prev] + (by_hour[nxt] - by_hour[prev]) * (
                    (h - prev) / (nxt - prev)
                )
                assert math.isclose(r["v_interp"], expect, rel_tol=1e-9, abs_tol=1e-9)


class TestWeightedSampleStatistics:
    def test_inclusion_tracks_weight_ratio(self, spark):
        """With total heavy mass == total light mass, a large sample
        should split roughly evenly between the two strata even though
        light items outnumber heavy 100:1."""
        from datafusion_cyberpolka_eda_spark.functions.sampling import (
            weighted_sample_topk,
        )

        n_heavy, n_light, w_heavy = 50, 5000, 100.0
        df = spark.range(0, n_heavy + n_light).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < n_heavy, w_heavy).otherwise(1.0).alias("w"),
        )
        sel = [r["k"] for r in weighted_sample_topk(df, "k", "w", k=1000).collect()]
        heavy = sum(1 for k in sel if k < n_heavy)
        # heavy items are ~50 of 1000 picks max; all 50 should be in
        # (each heavy item's inclusion probability is ~100x a light one's)
        assert heavy >= 45


def test_cdc_compact_orders_unorderable_payloads_via_json(spark):
    """A map-typed payload column must not break the total tiebreak
    (maps are unorderable in Spark; the window sorts their JSON text)."""
    from datafusion_cyberpolka_eda_spark.operators.cdc import cdc_compact

    df = spark.createDataFrame(
        [
            (1, "U", 5, {"x": "b"}),
            (1, "U", 5, {"x": "a"}),  # exact (key, seq, op) duplicate
            (2, "I", 1, {"y": "z"}),
        ],
        "k bigint, op string, seq int, props map<string,string>",
    )
    out = {r["k"]: r["props"] for r in cdc_compact(df, "k", "seq").collect()}
    assert out[1] == {"x": "b"}  # json desc: {"x":"b"} > {"x":"a"}
    assert out[2] == {"y": "z"}
