"""Streaming quality routing (j16): every document must land in exactly
one sink, the accumulated sinks must reproduce the batch classification,
and each routing rule must actually fire (including reject_short, which
real corpora at test scale may never trigger)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.sources.catalog import load_table
from datafusion_cyberpolka_eda_spark.streaming.documents import (
    QUALITY_SINKS,
    quality_sink_col,
    stream_quality_routing,
)


class TestRoutingRules:
    def test_each_rule_fires_and_priority_order(self, spark, tmp_path):
        """Toy corpus with one doc per class, plus a doc that is BOTH
        short and repetitive — priority must route it to reject_short."""
        rows = [
            (1, "en", "a b c d e f g h i j"),            # accept
            (2, "en", "x y"),                            # reject_short
            (3, "de", " ".join(["dup"] * 20)),           # reject_repetitive
            (4, "en", "z z z"),                          # short AND repetitive
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
        got = {
            r["doc_id"]: r["sink"]
            for r in docs.select("doc_id", quality_sink_col().alias("sink")).collect()
        }
        assert got == {
            1: "accept",
            2: "reject_short",
            3: "reject_repetitive",
            4: "reject_short",
        }

        rollup = stream_quality_routing(spark, docs, str(tmp_path / "s"), n_files=2)
        agg = {(r["sink"], r["lang"]): (r["n_docs"], r["n_tokens"]) for r in rollup.collect()}
        assert agg == {
            ("accept", "en"): (1, 10),
            ("reject_short", "en"): (2, 5),
            ("reject_repetitive", "de"): (1, 20),
        }

    def test_every_doc_routed_exactly_once(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, sf_dir, "documents")
        rollup = stream_quality_routing(
            spark, docs, str(tmp_path / "scratch"), n_files=3
        )
        assert rollup.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
        sinks = {r["sink"] for r in rollup.select("sink").distinct().collect()}
        assert sinks <= set(QUALITY_SINKS)

    def test_matches_batch_classification(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, sf_dir, "documents")
        streamed = {
            (r["sink"], r["lang"]): (r["n_docs"], r["n_tokens"])
            for r in stream_quality_routing(
                spark, docs, str(tmp_path / "scratch"), n_files=3
            ).collect()
        }
        batch = {
            (r["sink"], r["lang"]): (r["n_docs"], r["n_tokens"])
            for r in docs.select(
                "lang",
                F.size(F.split(F.col("text"), " ")).cast("bigint").alias("nt"),
                quality_sink_col().alias("sink"),
            )
            .groupBy("sink", "lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("nt").alias("n_tokens"),
            )
            .collect()
        }
        assert streamed == batch


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
