"""Local mirror of the driver's correctness gate: every queries() entry with
an oracle_sql() twin must match DuckDB on row count, sorted column names, and
exact values (we hold ourselves to exact equality — stricter than any
tolerance the driver might apply)."""

from __future__ import annotations

import math
import struct

import pandas as pd
import pytest

import __spark_entry__ as entrymod

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def _assert_equal(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    s, o = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), (
        f"{name}: column mismatch {list(s.columns)} vs {list(o.columns)}"
    )
    # The driver's value-hash is typed: DuckDB HUGEINT surfacing as float64
    # where Spark yields int64 fails the hash even when values are equal
    # (round-1 root cause of 7 hash_match failures). Hold dtypes identical.
    dtype_diff = {
        c: (str(s[c].dtype), str(o[c].dtype))
        for c in s.columns
        if s[c].dtype != o[c].dtype
    }
    assert not dtype_diff, f"{name}: dtype mismatch spark-vs-oracle {dtype_diff}"
    assert len(s) == len(o), f"{name}: row count {len(s)} vs {len(o)}"
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                # BITWISE, not ==: the driver's value hash is byte-sensitive
                # and -0.0 == 0.0 is True — a sign-of-zero divergence (DuckDB
                # ROUND preserves the sign of a tiny negative, Spark F.round
                # drops it) shipped twice because this compare was sign-blind
                # (r8 verdict task 2).
                assert struct.pack("<d", a) == struct.pack("<d", b), (
                    f"{name}.{c}[{i}]: {a!r} != {b!r} bitwise (diff {a - b!r})"
                )
            else:
                assert a == b, f"{name}.{c}[{i}]: {a!r} != {b!r}"


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = _QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    sql = _ORACLES.get(name)
    if sql is None:
        # rows-only contract: must run and return a stable schema
        assert spark_pdf.shape[0] >= 0
        assert len(spark_pdf.columns) > 0
        return
    oracle_pdf = duck.sql(sql).df()
    _assert_equal(spark_pdf, oracle_pdf, name)
