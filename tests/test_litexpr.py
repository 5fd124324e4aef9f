"""functions.litexpr: the one-expr literal renderers must be BIT-identical
to the F.array(*[F.lit(...)]) forms they replaced (r13 optimization — the
old forms cost k*dim py4j round-trips per plan build)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.functions import litexpr as LX


EDGE_DOUBLES = [
    0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 1e-300, -1e-300, 1e300,
    1.7976931348623157e308, 5e-324, 2.2250738585072014e-308,
    0.30000000000000004, 1 / 3, -7.234561234987e-5,
]


def test_sql_double_roundtrips_bitwise(spark):
    import struct

    vals = EDGE_DOUBLES + [random.Random(7).uniform(-1e6, 1e6) for _ in range(50)]
    row = spark.range(1).select(
        *[F.expr(LX.sql_double(x)).alias(f"c{i}") for i, x in enumerate(vals)]
    ).first()
    for i, x in enumerate(vals):
        got = row[f"c{i}"]
        assert struct.pack("<d", got) == struct.pack("<d", x), (x, got)


def test_sql_long_edges(spark):
    vals = [0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    row = spark.range(1).select(
        *[F.expr(LX.sql_long(v)).alias(f"c{i}") for i, v in enumerate(vals)]
    ).first()
    for i, v in enumerate(vals):
        assert row[f"c{i}"] == v


def test_dots_literal_matches_old_form(spark):
    rng = random.Random(13)
    dim, k, n = 16, 5, 40
    mat = [[rng.uniform(-2, 2) for _ in range(dim)] for _ in range(k)]
    df = spark.createDataFrame(
        [(i, [rng.uniform(-2, 2) for _ in range(dim)]) for i in range(n)],
        "id bigint, unit_arr array<double>",
    )

    def dot_old(vec):
        arr = F.array(*[F.lit(float(x)) for x in vec])
        return F.aggregate(
            F.zip_with(F.col("unit_arr"), arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    old = df.select(
        "id", F.array(*[dot_old(c) for c in mat]).alias("d")
    ).orderBy("id").collect()
    new = df.select(
        "id", LX.dots_literal("unit_arr", mat).alias("d")
    ).orderBy("id").collect()
    import struct

    for a, b in zip(old, new):
        assert a["id"] == b["id"]
        for x, y in zip(a["d"], b["d"]):
            assert struct.pack("<d", x) == struct.pack("<d", y)


def test_sqdists_literal_matches_old_form(spark):
    rng = random.Random(29)
    dim, k, n = 12, 4, 30
    # LLOYD_QSCALE-magnitude components (|x| ~ 2^20): (x-c)^2 summed over
    # dim stays far inside int64, matching the real quantized range
    mat = [[rng.randint(-(2**20), 2**20) for _ in range(dim)] for _ in range(k)]
    df = spark.createDataFrame(
        [(i, [rng.randint(-(2**20), 2**20) for _ in range(dim)]) for i in range(n)],
        "id bigint, q array<bigint>",
    )
    old = df.select(
        "id",
        F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        "q",
                        F.array(*[F.lit(int(c)).cast("long") for c in cq]),
                        lambda x, c: (x - c) * (x - c),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                )
                for cq in mat
            ]
        ).alias("d"),
    ).orderBy("id").collect()
    new = df.select(
        "id", LX.sqdists_literal_q("q", mat).alias("d")
    ).orderBy("id").collect()
    assert [tuple(r["d"]) for r in old] == [tuple(r["d"]) for r in new]


def test_dot_literal_matches_old_form(spark):
    rng = random.Random(31)
    dim, n = 24, 25
    vec = [rng.uniform(-1, 1) for _ in range(dim)]
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)],
        "id bigint, unit_arr array<double>",
    )
    arr = F.array(*[F.lit(float(x)) for x in vec])
    old = df.select(
        "id",
        F.aggregate(
            F.zip_with(F.col("unit_arr"), arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("d"),
    ).orderBy("id").collect()
    new = df.select(
        "id", LX.dot_literal("unit_arr", vec).alias("d")
    ).orderBy("id").collect()
    import struct

    assert [struct.pack("<d", r["d"]) for r in old] == [
        struct.pack("<d", r["d"]) for r in new
    ]


def test_wdot_literal_matches_old_form(spark):
    rng = random.Random(37)
    dim, n = 10, 20
    w = [rng.randint(-(2**30), 2**30) for _ in range(dim)]
    df = spark.createDataFrame(
        [(i, [rng.randint(-(2**20), 2**20) for _ in range(dim)]) for i in range(n)],
        "id bigint, x array<bigint>",
    )
    old = df.select(
        "id",
        F.aggregate(
            F.zip_with(
                "x",
                F.array(*[F.lit(int(c)).cast("long") for c in w]),
                lambda xv, wv: xv * wv,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("z"),
    ).orderBy("id").collect()
    new = df.select("id", LX.wdot_literal_q("x", w).alias("z")).orderBy(
        "id"
    ).collect()
    assert [r["z"] for r in old] == [r["z"] for r in new]
