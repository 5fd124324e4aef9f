"""Streaming incremental dedup (j15): the epoch-at-a-time foreachBatch
path must (a) reproduce exactly the batch incremental answer
(incremental_minhash_pairs over the same store + increment), (b) emit
each unordered pair exactly once (the earlier doc is already in the
store when the later epoch arrives), and (c) find cross-epoch new-new
pairs — the case a single-batch run never exercises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.operators import dedup as D
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table
from datafusion_cyberpolka_eda_spark.streaming.documents import (
    stream_incremental_dedup,
)


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): (r["est_jaccard"], r["kind"])
        for r in df.collect()
    }


class TestBatchEquivalence:
    def test_matches_batch_incremental(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, sf_dir, "documents")
        max_id = docs.agg(F.max("doc_id")).collect()[0][0]
        cutoff = int(0.8 * (max_id + 1))
        store_path = str(tmp_path / "store.parquet")
        D.minhash_signatures_portable(
            docs.filter(F.col("doc_id") < cutoff), "doc_id", "text",
            n=3, num_hashes=32, bands=8,
        ).write.parquet(store_path)
        inc = docs.filter(F.col("doc_id") >= cutoff)

        streamed = stream_incremental_dedup(
            spark, inc, store_path, str(tmp_path / "scratch"), cutoff
        )
        want = _pairs(
            D.incremental_minhash_pairs(
                D.minhash_signatures_portable(
                    inc, "doc_id", "text", n=3, num_hashes=32, bands=8
                ),
                spark.read.parquet(store_path),
                num_hashes=32,
                est_threshold=0.45,
            ).select(
                "id_a", "id_b",
                F.round("est_jaccard", 6).alias("est_jaccard"), "kind",
            )
        )
        got = _pairs(streamed)
        assert got == want
        assert want, "fixture should produce at least one incremental pair"

    def test_no_duplicate_pairs(self, spark, sf_dir, tmp_path):
        """The rollup does NOT dedupe — once-only emission must hold in
        the raw appended pair files."""
        docs = load_table(spark, sf_dir, "documents")
        max_id = docs.agg(F.max("doc_id")).collect()[0][0]
        cutoff = int(0.8 * (max_id + 1))
        store_path = str(tmp_path / "store.parquet")
        D.minhash_signatures_portable(
            docs.filter(F.col("doc_id") < cutoff), "doc_id", "text",
            n=3, num_hashes=32, bands=8,
        ).write.parquet(store_path)
        out = stream_incremental_dedup(
            spark,
            docs.filter(F.col("doc_id") >= cutoff),
            store_path,
            str(tmp_path / "scratch"),
            cutoff,
        )
        assert out.count() == out.select("id_a", "id_b").distinct().count()


class TestCrossEpoch:
    def test_cross_epoch_new_new_found_once(self, spark, tmp_path):
        """Two identical new docs land in DIFFERENT epochs (range fan-out
        on doc_id); their pair must be found by the later epoch via the
        appended store, exactly once, and the rollup must re-derive its
        kind as new_new (the epoch-local join tags it new_old)."""
        body = "the quick brown fox jumps over the lazy dog again and again"
        store_docs = spark.createDataFrame(
            [(0, "completely unrelated old corpus text nothing alike here")],
            "doc_id bigint, text string",
        )
        inc = spark.createDataFrame(
            [(10, body), (20, body)], "doc_id bigint, text string"
        )
        store_path = str(tmp_path / "store.parquet")
        D.minhash_signatures_portable(
            store_docs, "doc_id", "text", n=3, num_hashes=32, bands=8
        ).write.parquet(store_path)

        out = stream_incremental_dedup(
            spark, inc, store_path, str(tmp_path / "scratch"),
            cutoff=5, n_files=2,
        ).collect()
        got = {(r["id_a"], r["id_b"]): r["kind"] for r in out}
        assert got == {(10, 20): "new_new"}
        assert len(out) == 1  # found once, by the later epoch


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
