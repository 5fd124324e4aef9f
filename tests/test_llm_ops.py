"""LLM-pipeline operator tests: approximate methods validated against their
exact counterparts, streaming vs batch equivalence, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.operators import dedup as D
from datafusion_cyberpolka_eda_spark.operators import similarity as SIM
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"  # 500 docs/embeddings — enough near-dup signal


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


class TestDedup:
    def test_exact_dedup_deterministic_representative(self, spark):
        import pandas as pd

        df = spark.createDataFrame(
            pd.DataFrame({"id": [3, 1, 2, 10], "text": ["a", "a", "a", "b"]})
        )
        kept = D.exact_dedup(df, keys=["text"], order_cols=["id"])
        rows = {r["text"]: r["id"] for r in kept.collect()}
        assert rows == {"a": 1, "b": 10}

    def test_minhash_recall_vs_exact(self, docs):
        """LSH candidates must recover the high-similarity exact pairs:
        every exact pair with jaccard >= 0.5 should appear among MinHash
        candidates at distance threshold 0.5 (8 tables)."""
        exact = {
            (r["id_a"], r["id_b"])
            for r in D.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=0.5
            ).collect()
        }
        assert exact, "fixture should contain near-duplicate docs"
        approx = {
            (r["id_a"], r["id_b"])
            for r in D.minhash_lsh_pairs(
                docs, "doc_id", "text", n=3, jaccard_distance_threshold=0.5
            ).collect()
        }
        missed = exact - approx
        assert not missed, f"LSH missed high-sim pairs: {missed}"

    def test_simhash_similar_docs_close(self, spark, docs):
        """Near-identical texts must land within small hamming distance."""
        from datafusion_cyberpolka_eda_spark.functions.text import hamming64, simhash

        import pandas as pd

        pdf = pd.DataFrame(
            {
                "id": [1, 2, 3],
                "text": [
                    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                    "alpha beta gamma delta epsilon zeta eta theta iota lambda",
                    "one two three four five six seven eight nine ten",
                ],
            }
        )
        df = spark.createDataFrame(pdf).select("id", simhash("text").alias("h"))
        h = {r["id"]: r["h"] for r in df.collect()}
        near = spark.range(1).select(
            hamming64(F.lit(h[1]), F.lit(h[2])).alias("near"),
            hamming64(F.lit(h[1]), F.lit(h[3])).alias("far"),
        ).collect()[0]
        assert near["near"] < near["far"]
        assert near["near"] <= 16

    def test_embedding_neardup_symmetric_threshold(self, emb):
        pairs = D.embedding_cosine_pairs(
            emb.filter(F.col("vec_id") < 100), "vec_id", "embedding", threshold=0.3
        ).collect()
        for r in pairs:
            assert r["id_a"] < r["id_b"]
            assert r["cosine"] >= 0.3

    def test_embedding_neardup_bucketed_vs_brute_force(self, emb):
        """The bucketed (fixed-quantizer, multi-probe) near-dup path must be
        a strict subset of brute force (precision 1.0 — every emitted pair
        truly clears the threshold) with high recall at 4-of-8 probes."""
        sub = emb.filter(F.col("vec_id") % 5 == 0)
        brute = {
            (r["id_a"], r["id_b"])
            for r in D.embedding_cosine_pairs(
                sub, "vec_id", "embedding", threshold=0.25
            ).collect()
        }
        bucketed = {
            (r["id_a"], r["id_b"])
            for r in D.embedding_neardup_bucketed(
                sub, "vec_id", "embedding", threshold=0.25, n_centroids=8, n_probe=4
            ).collect()
        }
        assert bucketed <= brute
        assert len(bucketed & brute) / max(len(brute), 1) >= 0.9


class TestSimilarity:
    def test_ann_recall_vs_exact_topk(self, emb):
        """LSH ANN top-5 for one query must overlap the exact top-5."""
        exact = {
            r["candidate_id"]
            for r in SIM.cosine_topk(
                emb.filter(F.col("vec_id") == 0), emb, "vec_id", "embedding", k=5
            ).collect()
        }
        model, transformed = SIM.ann_lsh_model(emb, "vec_id", "embedding")
        q = transformed.filter(F.col("id") == 0).head()
        ann = {
            r["id"]
            for r in model.approxNearestNeighbors(transformed, q["features"], 6)
            .filter(F.col("id") != 0)
            .collect()
        }
        # random-projection LSH is approximate: require >= 3/5 overlap
        assert len(exact & ann) >= 3

    def test_unit_sphere_l2_cosine_monotone(self, emb):
        """On normalized vectors d^2 = 2 - 2cos — check the identity used
        to back cosine ANN with a euclidean LSH."""
        rows = SIM.cosine_topk(
            emb.filter(F.col("vec_id") == 1), emb, "vec_id", "embedding", k=3,
            round_scale=None,
        ).collect()
        model, transformed = SIM.ann_lsh_model(emb, "vec_id", "embedding")
        import numpy as np

        vecs = {r["id"]: np.array(r["unit_arr"]) for r in transformed.filter(
            F.col("id").isin([1] + [r["candidate_id"] for r in rows])
        ).collect()}
        for r in rows:
            d2 = float(((vecs[1] - vecs[r["candidate_id"]]) ** 2).sum())
            assert d2 == pytest.approx(2 - 2 * r["cosine"], abs=1e-9)


class TestStreamingBatchEquivalence:
    def test_stream_equals_batch(self, spark):
        from datafusion_cyberpolka_eda_spark.streaming.events import (
            stream_tumbling_window_agg,
            tumbling_window_agg,
        )

        batch = tumbling_window_agg(load_table(spark, SF, "events")).collect()
        stream = stream_tumbling_window_agg(spark, f"{SF}/events.parquet").collect()
        key = lambda r: (r["window_start"], r["event_type"])
        assert sorted(map(lambda r: r.asDict(), batch), key=lambda d: (d["window_start"], d["event_type"])) == sorted(
            map(lambda r: r.asDict(), stream), key=lambda d: (d["window_start"], d["event_type"])
        )


class TestMultimodal:
    def test_feature_extraction_plumbing(self, spark, docs):
        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            documents_as_assets,
            extract_features,
        )

        feats = extract_features(documents_as_assets(docs.limit(50)))
        rows = feats.collect()
        assert len(rows) == 50
        for r in rows[:5]:
            assert r["feat_dim"] == 8
            assert all(0.0 <= v < 1.0 for v in r["feature_head"])
            assert len(r["checksum"]) == 16
        # determinism: same payload -> same features
        again = {r["asset_id"]: r["checksum"] for r in feats.collect()}
        first = {r["asset_id"]: r["checksum"] for r in rows}
        assert again == first

    def test_real_codec_path_raises(self, spark, docs):
        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            documents_as_assets,
            extract_features,
        )
        from py4j.protocol import Py4JJavaError

        feats = extract_features(documents_as_assets(docs.limit(1)), real_codecs=True)
        with pytest.raises(Exception):
            feats.collect()


class TestIvfAnn:
    def test_ivf_recall_vs_exact(self, emb):
        from datafusion_cyberpolka_eda_spark.operators.similarity import ann_ivf_topk

        exact = {
            r["candidate_id"]
            for r in SIM.cosine_topk(
                emb.filter(F.col("vec_id") == 0), emb, "vec_id", "embedding", k=5
            ).collect()
        }
        ivf = {
            r["neighbor_id"]
            for r in ann_ivf_topk(emb, "vec_id", "embedding", query_id=0, k=5).collect()
        }
        # probing 4/16 cells: require >= 2/5 overlap with the exact answer
        assert len(exact & ivf) >= 2


class TestFixedLshAnn:
    def test_lsh_recall_vs_exact(self, emb):
        exact = {
            r["candidate_id"]
            for r in SIM.cosine_topk(
                emb.filter(F.col("vec_id") == 0), emb, "vec_id", "embedding", k=5
            ).collect()
        }
        lsh = {
            r["neighbor_id"]
            for r in SIM.ann_lsh_fixed_topk_multi(
                emb, "vec_id", "embedding", query_ids=[0], k=5
            ).collect()
        }
        # 4 bands of 4 bits: near neighbors collide on >= 1 band with
        # high probability; require >= 2/5 overlap with the exact answer
        assert len(exact & lsh) >= 2

    def test_lsh_deterministic_across_runs(self, emb):
        a = SIM.ann_lsh_fixed_topk_multi(
            emb, "vec_id", "embedding", query_ids=[0, 1], k=3
        ).collect()
        b = SIM.ann_lsh_fixed_topk_multi(
            emb.repartition(7), "vec_id", "embedding", query_ids=[0, 1], k=3
        ).collect()
        key = lambda rows: sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in rows)
        assert key(a) == key(b)

    def test_bad_band_split_rejected(self, emb):
        with pytest.raises(ValueError):
            SIM.ann_lsh_fixed_topk_multi(
                emb, "vec_id", "embedding", query_ids=[0], n_planes=16, n_bands=5
            )


class TestSequencePacking:
    def test_greedy_semantics(self, spark):
        from datafusion_cyberpolka_eda_spark.operators.packing import (
            pack_greedy_by_shard,
        )

        # one shard (n_shards=1): sizes 100,100,100 -> bins [0,0],[1];
        # oversized 999 sits alone; following 50 starts a fresh bin
        rows = [(0, 100), (1, 100), (2, 100), (3, 999), (4, 50)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = pack_greedy_by_shard(df, "doc_id", "n_tokens", cap=256, n_shards=1)
        got = {r["bin_id"]: (r["n_docs"], r["total_tokens"], r["within_cap"])
               for r in out.collect()}
        assert got == {0: (2, 200, True), 1: (1, 100, True),
                       2: (1, 999, True), 3: (1, 50, True)}

    def test_cap_respected_and_deterministic(self, spark, docs):
        from datafusion_cyberpolka_eda_spark.operators.packing import (
            pack_greedy_by_shard,
        )
        from datafusion_cyberpolka_eda_spark.functions import text as T

        d = docs.select("doc_id", T.token_count("text").alias("n_tokens"))
        a = pack_greedy_by_shard(d, "doc_id", "n_tokens", cap=256).collect()
        b = pack_greedy_by_shard(
            d.repartition(13), "doc_id", "n_tokens", cap=256
        ).collect()
        assert all(r["within_cap"] for r in a)
        key = lambda rows: sorted((r["shard"], r["bin_id"], r["n_docs"], r["total_tokens"]) for r in rows)
        assert key(a) == key(b)


class TestBandedMinhash:
    def test_recall_and_estimate_vs_exact(self, docs):
        exact = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=0.6
            ).collect()
        }
        assert exact
        banded = {
            (r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in D.minhash_banded_pairs(
                docs, "doc_id", "text", n=3, est_threshold=0.4
            ).collect()
        }
        missed = set(exact) - set(banded)
        assert not missed, f"banded minhash missed high-sim pairs: {missed}"
        # estimator quality: |est - exact| < 0.25 on recovered pairs
        for pair, j in exact.items():
            assert abs(banded[pair] - j) < 0.25, (pair, j, banded[pair])

    def test_deterministic_across_runs(self, docs):
        run = lambda: sorted(
            map(tuple, D.minhash_banded_pairs(docs, "doc_id", "text").collect())
        )
        assert run() == run()


class TestSimhashNearPairs:
    def test_finds_planted_near_duplicate(self, spark):
        import pandas as pd

        base = "the quick brown fox jumps over the lazy dog again and again today"
        pdf = pd.DataFrame(
            {
                "id": [1, 2, 3],
                "text": [
                    base,
                    base.replace("today", "tomorrow"),  # one-token edit
                    "completely different words about spark query engines here",
                ],
            }
        )
        df = spark.createDataFrame(pdf)
        pairs = D.simhash_near_pairs(df, "id", "text", max_hamming=16).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in found
        assert (1, 3) not in found and (2, 3) not in found

    def test_no_band_false_negatives(self, docs):
        """Every pair the banded path reports must verify, and candidates
        within budget found by brute force must all be reported."""
        sample = docs.limit(120)
        banded = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in D.simhash_near_pairs(sample, "doc_id", "text", max_hamming=20).collect()
        }
        from datafusion_cyberpolka_eda_spark.functions.text import simhash

        import itertools

        fps = {
            r["doc_id"]: r["fp"]
            for r in sample.select("doc_id", simhash("text").alias("fp")).collect()
        }
        brute = {
            (a, b): bin(fps[a] ^ fps[b]).count("1")
            for a, b in itertools.combinations(sorted(fps), 2)
            if bin(fps[a] ^ fps[b]).count("1") <= 20
        }
        assert banded == brute


class TestConnectedComponents:
    def test_chain_and_clique_components(self, spark):
        """A 6-node chain (diameter 5 — forces several HashMin rounds), a
        triangle, and an isolated pair must resolve to min-id components."""
        import pandas as pd

        edges = spark.createDataFrame(
            pd.DataFrame(
                {
                    # chain 10-11-12-13-14-15, triangle 20-21-22, pair 30-31
                    "id_a": [10, 11, 12, 13, 14, 20, 21, 20, 30],
                    "id_b": [11, 12, 13, 14, 15, 21, 22, 22, 31],
                }
            )
        )
        comps = {
            r["id"]: r["comp"]
            for r in D.connected_components(edges, "id_a", "id_b").collect()
        }
        assert comps == {
            10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
            20: 20, 21: 20, 22: 20,
            30: 30, 31: 30,
        }

    def test_long_path_converges_within_log_rounds(self, spark):
        """A 200-node path (diameter 199) must resolve well inside the
        default max_iter=25 — the component-rendezvous step makes
        convergence O(log n) rounds, not O(diameter). Plain HashMin
        stalled on exactly this shape (a 431-node audio near-dup
        component at sf0.1, r10); ids are descending so the min label
        has to travel the full path length."""
        import pandas as pd

        n = 200
        edges = spark.createDataFrame(
            pd.DataFrame(
                {
                    # path n, n-1, ..., 1, 0: min id at the far end
                    "id_a": list(range(n, 0, -1)),
                    "id_b": list(range(n - 1, -1, -1)),
                }
            )
        )
        comps = {
            r["id"]: r["comp"]
            for r in D.connected_components(edges, "id_a", "id_b").collect()
        }
        assert comps == {i: 0 for i in range(n + 1)}

    def test_edge_order_invariance(self, spark):
        """Reversed/duplicated edges change nothing (undirected semantics)."""
        import pandas as pd

        edges = spark.createDataFrame(
            pd.DataFrame({"id_a": [5, 2, 2, 1], "id_b": [2, 5, 1, 2]})
        )
        comps = {
            r["id"]: r["comp"]
            for r in D.connected_components(edges, "id_a", "id_b").collect()
        }
        assert comps == {1: 1, 2: 1, 5: 1}


class TestPortableHashFamily:
    """The portable md5/universal-hash family (functions/hashing.py) must
    agree with an independent pure-Python mirror — the same property the
    DuckDB oracle checks cross-engine, pinned here at the function level."""

    def test_md5_hash64_matches_python(self, spark):
        import hashlib

        from datafusion_cyberpolka_eda_spark.functions.hashing import md5_hash64

        words = ["", "a", "hello world", "日本語", "x" * 500]
        df = spark.createDataFrame([(w,) for w in words], "w string")
        got = {r["w"]: r["h"] for r in df.select("w", md5_hash64("w").alias("h")).collect()}
        for w in words:
            expect = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
            assert got[w] == expect, w

    def test_perm_constants_deterministic_and_bounded(self):
        from datafusion_cyberpolka_eda_spark.functions.hashing import (
            MERSENNE31,
            perm_constants,
        )

        c1, c2 = perm_constants(32), perm_constants(32)
        assert c1 == c2
        assert len(set(c1)) == 32
        for a, b in c1:
            assert 1 <= a < MERSENNE31 and 0 <= b < MERSENNE31

    def test_portable_minhash_recall_vs_exact(self, docs):
        exact = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=0.6
            ).collect()
        }
        assert exact
        banded = {
            (r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in D.minhash_banded_pairs_portable(
                docs, "doc_id", "text", n=3, est_threshold=0.3
            ).collect()
        }
        missed = set(exact) - set(banded)
        assert not missed, f"portable minhash missed high-sim pairs: {missed}"
        for pair, j in exact.items():
            # 32 hashes -> coarser estimator than the 64-hash xxhash64 twin
            assert abs(banded[pair] - j) < 0.35, (pair, j, banded[pair])

    def test_portable_simhash_matches_python(self, spark):
        import hashlib

        from datafusion_cyberpolka_eda_spark.functions.hashing import md5_hash64
        from datafusion_cyberpolka_eda_spark.functions.text import simhash

        def py_simhash(text: str, n_bits: int = 60) -> int:
            toks = text.split(" ")
            out = 0
            for j in range(n_bits):
                c = sum(
                    1
                    if (int(hashlib.md5(t.encode()).hexdigest()[:15], 16) >> j) & 1
                    else -1
                    for t in toks
                )
                if c > 0:
                    out |= 1 << j
            return out

        texts = ["one two three four", "a b a b a", "solo"]
        df = spark.createDataFrame([(t,) for t in texts], "t string")
        got = {
            r["t"]: r["sh"]
            for r in df.select(
                "t", simhash("t", hash_fn=md5_hash64, n_bits=60).alias("sh")
            ).collect()
        }
        for t in texts:
            assert got[t] == py_simhash(t), t


class TestClusterCheckpoint:
    """connected_components(checkpoint_dir=...) must produce identical
    components through reliable checkpoint() cuts — the cluster deploy
    path (executor-local checkpoint blocks die with their executor; the
    r5 verdict asked for this docstring promise to become code)."""

    def test_checkpoint_dir_same_components_and_writes_files(
        self, spark, tmp_path
    ):
        import pandas as pd

        edges = spark.createDataFrame(
            pd.DataFrame(
                {
                    "id_a": [10, 11, 12, 13, 14, 20, 21, 20, 30],
                    "id_b": [11, 12, 13, 14, 15, 21, 22, 22, 31],
                }
            )
        )
        ckpt = str(tmp_path / "cc_ckpt")
        comps = {
            r["id"]: r["comp"]
            for r in D.connected_components(
                edges, "id_a", "id_b", checkpoint_dir=ckpt
            ).collect()
        }
        assert comps == {
            10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
            20: 20, 21: 20, 22: 20,
            30: 30, 31: 30,
        }
        # reliable checkpoints actually landed in the requested dir
        import pathlib

        files = list(pathlib.Path(ckpt).rglob("*"))
        assert any(f.is_file() for f in files), (
            "checkpoint_dir produced no checkpoint files — the cut is "
            "still executor-local"
        )


class TestAdaptiveCentroidGuard:
    """Regression guard for the r5 scale fix: the sqrt-n centroid rule
    (fixed cell counts made in-bucket candidates quadratic — SCALE.md
    measured 239 s vs ~14 s at 16x) must stay the DEFAULT on both the
    embedding near-dup path and the trained-IVF path."""

    def test_sqrt_n_monotone_within_floor_cap(self):
        from datafusion_cyberpolka_eda_spark.operators.similarity import (
            adaptive_n_centroids,
        )

        ns = [0, 1, 10, 64, 100, 5000, 10_000, 1_000_000, 10**10]
        got = [adaptive_n_centroids(n) for n in ns]
        assert got == sorted(got), "must be monotone in n_rows"
        import math

        for n, g in zip(ns, got):
            assert g == max(8, min(65536, int(round(math.sqrt(max(n, 1))))))
        # floor and cap bind
        assert adaptive_n_centroids(0) == 8
        assert adaptive_n_centroids(10**12) == 65536
        assert adaptive_n_centroids(10_000, cap=50) == 50

    def test_neardup_default_path_calls_adaptive(self, spark, sf_dir, monkeypatch):
        """embedding_neardup_bucketed(n_centroids=None) must consult
        adaptive_n_centroids — a future hardcoded-cell refactor fails here."""
        from datafusion_cyberpolka_eda_spark.operators import similarity as S

        calls = []
        orig = S.adaptive_n_centroids
        monkeypatch.setattr(
            S,
            "adaptive_n_centroids",
            lambda n, **kw: calls.append(n) or orig(n, **kw),
        )
        emb = load_table(spark, sf_dir, "embeddings").limit(200)
        D.embedding_neardup_bucketed(emb, "vec_id", "embedding", threshold=0.99).collect()
        assert calls, "default path no longer calls adaptive_n_centroids"
        assert calls[0] == 200

    def test_ivf_default_path_calls_adaptive(self, spark, sf_dir, monkeypatch):
        """ann_ivf_sampled_topk_multi(n_centroids=None) likewise."""
        from datafusion_cyberpolka_eda_spark.operators import similarity as S

        calls = []
        orig = S.adaptive_n_centroids
        monkeypatch.setattr(
            S,
            "adaptive_n_centroids",
            lambda n, **kw: calls.append(n) or orig(n, **kw),
        )
        emb = load_table(spark, sf_dir, "embeddings").limit(200)
        S.ann_ivf_sampled_topk_multi(
            emb, "vec_id", "embedding", query_ids=[1, 2], k=3
        ).collect()
        assert calls, "default path no longer calls adaptive_n_centroids"


class TestDegenerateInputs:
    """A production pipeline feeds these operators arbitrary corpus
    slices — an empty filter result or a single-document partition must
    yield empty/identity outputs, never a crash (no .head() on nothing,
    no divide-by-zero, no un-guarded collect()[0])."""

    def _empty_docs(self, spark):
        return spark.createDataFrame(
            [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )

    def test_minhash_banded_pairs_empty(self, spark):
        out = D.minhash_banded_pairs(
            self._empty_docs(spark), "doc_id", "text", n=3
        )
        assert out.count() == 0

    def test_simhash_near_pairs_empty(self, spark):
        out = D.simhash_near_pairs(
            self._empty_docs(spark), "doc_id", "text", max_hamming=6
        )
        assert out.count() == 0

    def test_ngram_jaccard_pairs_empty_and_single(self, spark):
        empty = self._empty_docs(spark)
        assert D.ngram_jaccard_pairs(empty, "doc_id", "text", n=3).count() == 0
        one = spark.createDataFrame(
            [(1, "a b c d e", "en", "s", 9)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        # one doc: no pairs, not an error
        assert D.ngram_jaccard_pairs(one, "doc_id", "text", n=3).count() == 0

    def test_connected_components_empty_edges(self, spark):
        edges = spark.createDataFrame([], "id_a bigint, id_b bigint")
        assert D.connected_components(edges, "id_a", "id_b").count() == 0

    def test_verify_pairs_empty_candidates(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d", "en", "s", 7), (2, "a b c e", "en", "s", 7)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
        out = D.verify_pairs_exact_jaccard(
            docs, pairs, "doc_id", "text", n=3, threshold=0.0
        )
        assert out.count() == 0


class TestGateTruthMemoFingerprint:
    """The l3/l3b/l4b gate-truth memo key includes a data fingerprint:
    regenerating testdata at the same path mid-session must invalidate the
    checkpointed truth, never serve it stale (r6 verdict nit)."""

    def _write_docs(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [
                (1, "a b c d e", "en", "s", 9),
                (2, "a b c d e", "en", "s", 9),
                (3, "x y z w q", "en", "s", 9),
            ],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        docs.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )

    def test_touch_invalidates_memo(self, spark, tmp_path):
        import os

        from datafusion_cyberpolka_eda_spark.registry import llm as L

        self._write_docs(spark, tmp_path)
        base1 = L._dedup_gate_base(spark, str(tmp_path))
        assert L._dedup_gate_base(spark, str(tmp_path)) is base1  # memo hit
        # regenerated-at-same-path stand-in: bump mtime of every data file
        for r, _dirs, files in os.walk(tmp_path / "documents.parquet"):
            for f in files:
                p = os.path.join(r, f)
                st = os.stat(p)
                os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        base2 = L._dedup_gate_base(spark, str(tmp_path))
        assert base2 is not base1  # fingerprint changed -> truth rebuilt

    def test_fingerprint_changes_on_size_and_missing(self, spark, tmp_path):
        from datafusion_cyberpolka_eda_spark.registry.llm import _docs_fingerprint

        assert _docs_fingerprint(str(tmp_path)) == "missing"
        self._write_docs(spark, tmp_path)
        fp1 = _docs_fingerprint(str(tmp_path))
        assert fp1 not in ("missing", "empty")
        self._write_docs(spark, tmp_path)  # rewrite: mtime (and maybe size) moves
        assert _docs_fingerprint(str(tmp_path)) != fp1


class TestIvfPq:
    """IVF-PQ composed index (r6 verdict task 4): per-cell-scaled int8
    residual codes must bound the per-component dequantization error at
    the scalar-quantization half-step, and serving from codes alone must
    track exact cosine closely enough for the recall gate."""

    @pytest.fixture(scope="class")
    def built(self, spark, emb):
        unit = SIM.unit_vec_df(emb, "vec_id", "embedding")
        centers = SIM.train_centroids_on_sample(unit, 8, 512)
        index, scales = SIM.ivf_pq_index(unit, centers)
        return unit, centers, index, scales

    def test_codes_are_int8_one_per_component(self, built):
        from pyspark.sql.types import ByteType

        unit, _centers, index, _scales = built
        assert isinstance(index.schema["qcodes"].dataType.elementType, ByteType)
        bad = index.filter(
            F.size("qcodes") != F.size("unit_arr")
        ).count()
        assert bad == 0

    def test_dequant_error_within_half_step(self, built):
        import numpy as np

        _unit, centers, index, scales = built
        smap = {int(r["cell"]): float(r["scale"]) for r in scales.collect()}
        rows = index.limit(100).collect()
        for r in rows:
            c = np.asarray(centers[r["cell"]])
            resid = np.asarray(r["unit_arr"]) - c
            s = smap[r["cell"]]
            dequant = np.asarray(r["qcodes"], dtype=float) / s
            assert np.max(np.abs(dequant - resid)) <= 0.5 / s + 1e-9

    def test_approx_cosine_tracks_exact(self, built, emb):
        """Serving score = dot(q, centroid) + dot(q, dequant residual):
        must match the exact cosine within the accumulated quantization
        error (loose 0.05 bound; measured ~1e-3)."""
        import numpy as np

        unit, centers, index, scales = built
        ann = SIM.ann_ivf_pq_topk_multi(
            emb, "vec_id", "embedding", query_ids=[0, 1, 2], k=5,
            n_probe=4, prebuilt=(index, centers, scales),
        ).collect()
        uvecs = {
            r["id"]: np.asarray(r["unit_arr"])
            for r in unit.filter(F.col("id") < 600).collect()
        }
        checked = 0
        for r in ann:
            q, n = r["query_id"], r["neighbor_id"]
            if q in uvecs and n in uvecs:
                exact = float(uvecs[q] @ uvecs[n])
                assert abs(r["approx_cosine"] - exact) <= 0.05
                checked += 1
        assert checked > 0

    def test_l8e_gate_row(self, spark, sf_dir):
        from datafusion_cyberpolka_eda_spark.registry.llm import l8e_ann_ivf_pq

        row = l8e_ann_ivf_pq(spark, sf_dir).collect()[0]
        assert row["mean_recall_at_5_ge_60pct"] is True
        assert row["pq_bytes_le_quarter_f32"] is True


class TestIvfPqIncremental:
    """Frozen-quantizer incremental index growth (l8f): re-adding indexed
    vectors must replay the store exactly; out-of-range increment
    residuals must clamp to the int8 range."""

    def test_day1_replay_exact(self, spark, emb):
        unit = SIM.unit_vec_df(emb, "vec_id", "embedding")
        centers = SIM.train_centroids_on_sample(unit, 8, 512)
        index, scales = SIM.ivf_pq_index(unit, centers)
        replay = SIM.ivf_pq_add(unit, centers, scales)
        cols = ["id", "cell", "qcodes"]
        a, b = index.select(*cols), replay.select(*cols)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_out_of_range_residual_clamps(self, spark):
        import numpy as np

        # 3 tight day-1 vectors around e1 -> tiny residual max -> huge
        # scale; a day-2 vector far from the centroid must clamp, not wrap
        base = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(1, 4)]
        day1 = spark.createDataFrame(base, "vec_id bigint, embedding array<double>")
        unit1 = SIM.unit_vec_df(day1, "vec_id", "embedding")
        centers = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]])
        _index, scales = SIM.ivf_pq_index(unit1, centers)
        far = spark.createDataFrame(
            [(9, [0.5, 0.85, 0.0, 0.0])], "vec_id bigint, embedding array<double>"
        )
        row = SIM.ivf_pq_add(
            SIM.unit_vec_df(far, "vec_id", "embedding"), centers, scales
        ).collect()[0]
        assert max(abs(c) for c in row["qcodes"]) == 127  # clamped, in-range

    def test_l8f_gate_row(self, spark, sf_dir):
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l8f_ann_ivf_pq_incremental,
        )

        row = l8f_ann_ivf_pq_incremental(spark, sf_dir).collect()[0]
        assert row["day1_replay_identical"] is True
        assert row["union_recall_at_5_ge_60pct"] is True


class TestIvfPqTakedown:
    """Index takedown (l8g): deleting vectors from a frozen-quantizer
    IVF-PQ index by anti-join must equal a from-scratch rebuild over the
    remaining vectors, and serving must neither return ghosts nor lose
    recall for survivors."""

    def test_delete_equals_rebuild_toy(self, spark, emb):
        from pyspark.sql import functions as F

        unit = SIM.unit_vec_df(emb, "vec_id", "embedding")
        centers = SIM.train_centroids_on_sample(unit, 8, 512)
        index, scales = SIM.ivf_pq_index(unit, centers)
        removed = emb.filter(F.col("vec_id") % 5 == 0).select(
            F.col("vec_id").alias("id")
        )
        deleted = index.join(F.broadcast(removed), "id", "left_anti")
        rebuilt = SIM.ivf_pq_add(
            SIM.unit_vec_df(
                emb.join(
                    F.broadcast(removed.withColumnRenamed("id", "vec_id")),
                    "vec_id", "left_anti",
                ),
                "vec_id", "embedding",
            ),
            centers, scales,
        )
        cols = ["id", "cell", "qcodes"]
        a, b = deleted.select(*cols), rebuilt.select(*cols)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_l8g_gate_row(self, spark, sf_dir):
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l8g_ann_ivf_pq_takedown,
        )

        row = l8g_ann_ivf_pq_takedown(spark, sf_dir).collect()[0]
        assert row["n_removed"] > 0
        assert row["delete_equals_rebuild"] is True
        assert row["no_removed_in_topk"] is True
        assert row["recall_after_delete_ge_60pct"] is True


class TestPpmCodec:
    """Real stdlib PPM codec (r7 verdict task 6): roundtrip, header
    tokenizer edge cases, malformed-payload rejection, and the
    real_codecs=True extract_features path actually decoding."""

    def test_roundtrip_with_comments_and_whitespace(self):
        import numpy as np

        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
        )

        raw = bytes([(7 * i) % 256 for i in range(5 * 4 * 3)])
        w, h, arr = decode_ppm(encode_ppm(5, 4, raw, comment="x # y"))
        assert (w, h) == (5, 4)
        assert arr.shape == (4, 5, 3)
        assert arr.tobytes() == raw
        # hand-built header: multi-whitespace + comment between tokens
        hand = b"P6\n# c1\n  5\t4 # trailing\n# c2\n255\n" + raw
        w2, h2, arr2 = decode_ppm(hand)
        assert (w2, h2, arr2.tobytes()) == (5, 4, raw)

    def test_malformed_payloads_raise(self):
        import pytest as _pytest

        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
        )

        raw = bytes(2 * 2 * 3)
        good = encode_ppm(2, 2, raw)
        with _pytest.raises(ValueError):
            decode_ppm(b"P5" + good[2:])  # wrong magic
        with _pytest.raises(ValueError):
            decode_ppm(good[:-1])  # truncated raster
        with _pytest.raises(ValueError):
            decode_ppm(b"P6\n2 2\n65535\n" + raw * 2)  # 16-bit maxval

    def test_real_codecs_path_decodes_ppm(self, spark, sf_dir):
        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            extract_features,
            make_ppm_assets,
        )
        from datafusion_cyberpolka_eda_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents").limit(10)
        assets = make_ppm_assets(docs).select(
            "asset_id",
            "modality",
            "payload",
            F.struct(
                F.col("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        )
        rows = extract_features(assets, real_codecs=True).collect()
        assert len(rows) == 10
        for r in rows:
            # feat_dim is the decoded pixel count — matches the generator
            d = r["asset_id"]
            assert r["feat_dim"] == (4 + d % 5) * (3 + d % 4) * 3
            # first feature = first decoded byte / 255 = (d*2654435761)%256/255
            assert abs(
                r["feature_head"][0] - ((d * 2654435761) % 256) / 255.0
            ) < 1e-12


class TestWavResizeCodecs:
    def test_wav_roundtrip_and_validation(self):
        import numpy as np
        import pytest as _pytest

        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        s = ((np.arange(257) * 16807 + 11 * 48271) % 65536 - 32768).astype(
            np.int64
        )
        fr, got = decode_wav(encode_wav(s, framerate=8000))
        assert fr == 8000
        assert (got == s).all()
        # stereo payload rejected by the mono-PCM validator
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(b"\x00\x00" * 8)
        with _pytest.raises(ValueError):
            decode_wav(buf.getvalue())

    def test_resize_nearest_neighbor_grid(self):
        """Hand-checkable 4x4 -> 2x2: source rows (0,2), cols (0,2)."""
        import numpy as np

        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
        )

        arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        w, h, back = decode_ppm(encode_ppm(4, 4, arr.tobytes()))
        rr = (np.arange(2, dtype=np.int64) * h) // 2
        cc = (np.arange(2, dtype=np.int64) * w) // 2
        small = back[rr][:, cc]
        expect = arr[[0, 2]][:, [0, 2]]
        assert (small == expect).all()


class TestImagePhashNearDup:
    """r9: perceptual image near-dup — aHash over real decoded rasters +
    the shared pigeonhole band join."""

    def test_gray_twin_fingerprint_equal_by_construction(self):
        """Rotating (r,g,b)->(g,b,r) per pixel preserves gray exactly, so
        the aHash of the rotated raster MUST equal the base's — the
        structural recall guarantee (no data-pinned recall boolean)."""
        import numpy as np

        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
        )

        rng = np.arange(6 * 5 * 3, dtype=np.int64)
        v = ((7 * 2654435761 + rng * 40503) % 256).astype(np.uint8)
        twin = np.roll(v.reshape(-1, 3), -1, axis=1).reshape(-1)
        _, _, a = decode_ppm(encode_ppm(6, 5, v.tobytes()))
        _, _, b = decode_ppm(encode_ppm(6, 5, twin.tobytes()))
        assert (a.astype(np.int64).sum(2) == b.astype(np.int64).sum(2)).all()

    def test_planted_gray_recall_is_total(self, spark, docs):
        """Every doc_id % 5 == 0 must surface as a planted_gray pair at
        hamming 0 — recall 1.0 against the planted ground truth."""
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l58_image_phash_neardup,
        )

        out = l58_image_phash_neardup(spark, SF).toPandas()
        planted = out[out["kind"] == "planted_gray"]
        expected = {
            r["doc_id"]
            for r in docs.filter(F.col("doc_id") % 5 == 0).collect()
        }
        assert set(planted["id_a"]) == expected
        assert (planted["hamming"] == 0).all()

    def test_banded_pairs_equal_bruteforce(self, spark, docs):
        """Pigeonhole completeness: the banded join finds exactly the
        pairs an exhaustive all-pairs hamming scan finds."""
        from datafusion_cyberpolka_eda_spark.operators.dedup import (
            fingerprint_near_pairs,
        )
        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            ahash63_fingerprints,
            make_ppm_neardup_assets,
        )

        fps = ahash63_fingerprints(
            make_ppm_neardup_assets(docs.limit(80))
        ).toPandas()
        got = {
            (r["id_a"], r["id_b"])
            for r in fingerprint_near_pairs(
                spark.createDataFrame(fps), max_hamming=3
            ).collect()
        }
        import itertools

        want = set()
        for (ia, fa), (ib, fb) in itertools.combinations(
            sorted(zip(fps["id"], fps["fp"])), 2
        ):
            if bin(int(fa) ^ int(fb)).count("1") <= 3:
                want.add((ia, ib))
        assert got == want


class TestDistributedLloyd:
    """r9: distributed Lloyd k-means supersteps (integer-exact)."""

    def test_matches_numpy_replay_exactly(self, spark, emb):
        """The distributed loop must equal a driver-side numpy replay of
        the same integer algorithm BIT-FOR-BIT — the exactness gate that
        a sampled float trainer cannot offer."""
        import math

        import numpy as np

        got_cent, got_stats = SIM.lloyd_kmeans_distributed(
            emb, "vec_id", "embedding", k=8, iters=3
        )
        rows = emb.select("vec_id", "embedding").collect()
        ids = np.array([r["vec_id"] for r in rows])
        x = np.array([r["embedding"] for r in rows], dtype=np.float64)
        q = np.floor(x * 100000.0).astype(np.int64)
        # portable md5 rank init
        import hashlib

        h = np.array(
            [int(hashlib.md5(str(int(i)).encode()).hexdigest()[:15], 16) for i in ids]
        )
        order = np.lexsort((ids, h))
        cent = q[order[:8]].astype(np.int64).copy()
        for _ in range(3):
            d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(2)
            a = d.argmin(1)  # ties -> smallest index, same as the plan
            for j in range(8):
                m = q[a == j]
                if len(m):
                    cent[j] = [
                        math.floor(s / len(m)) for s in m.sum(0, dtype=np.int64)
                    ]
        assert [list(map(int, c)) for c in cent] == got_cent
        d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(2)
        a, dmin = d.argmin(1), d.min(1)
        want = {
            int(j): (int((a == j).sum()), int(dmin[a == j].sum()))
            for j in set(a.tolist())
        }
        got = {
            r["cluster"]: (r["n_members"], r["inertia_q"])
            for r in got_stats.collect()
        }
        assert got == want

    def test_inertia_improves_on_init(self, spark, emb):
        """Lloyd property: trained centroids fit no worse than the raw
        seed vectors they started from."""
        cent3, stats3 = SIM.lloyd_kmeans_distributed(
            emb, "vec_id", "embedding", k=8, iters=3
        )
        cent0, stats0 = SIM.lloyd_kmeans_distributed(
            emb, "vec_id", "embedding", k=8, iters=0
        )
        i3 = sum(r["inertia_q"] for r in stats3.collect())
        i0 = sum(r["inertia_q"] for r in stats0.collect())
        assert i3 < i0

    def test_wires_into_ivf_pq_index(self, spark, emb):
        """lloyd_centroids_unit output is a drop-in `centers` for
        ivf_pq_index: every vector lands in a cell and codes stay int8."""
        cent, _ = SIM.lloyd_kmeans_distributed(
            emb, "vec_id", "embedding", k=8, iters=3
        )
        centers = SIM.lloyd_centroids_unit(cent)
        unit = SIM.unit_vec_df(emb, "vec_id", "embedding")
        index, scales = SIM.ivf_pq_index(unit, centers)
        n = emb.count()
        assert index.count() == n
        cells = {r["cell"] for r in index.select("cell").distinct().collect()}
        assert cells <= set(range(8)) and len(cells) > 1


class TestSemanticDecontamination:
    """r9: embedding-space contamination screen (l60)."""

    def test_planted_recall_total_and_clean_unflagged(self, spark):
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l60_semantic_decontamination,
        )

        out = l60_semantic_decontamination(spark, SF).toPandas()
        # every planted paraphrase caught (cosine ~ 1 - 1e-5 >> 0.98)
        assert out["n_planted_caught"].sum() == out["n_planted"].sum() > 0
        # reversed clean vectors never cross the threshold at this data:
        # all contamination flags come from the planted family
        assert out["n_contaminated"].sum() == out["n_planted_caught"].sum()
        # eval split covers both families
        assert out["n_eval"].sum() > out["n_planted"].sum()


class TestImageDedupPipeline:
    """r9: end-to-end image dedup (l61) — composition invariants."""

    def test_planted_twins_never_survive(self, spark):
        """Twin asset ids are base + 2^23/2^24, so the min-id survivor of
        any planted cluster is always the ORIGINAL asset — the curation
        guarantee the pipeline exists for."""
        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            GRAY_TWIN_OFFSET,
            PERTURB_TWIN_OFFSET,
        )
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l61_image_dedup_pipeline,
        )

        out = l61_image_dedup_pipeline(spark, SF).toPandas()
        twins = out[out["asset_id"] >= GRAY_TWIN_OFFSET]
        assert len(twins) > 0
        assert not twins["is_survivor"].any()
        # every gray twin clusters with (at least) its base image
        gray = out[
            (out["asset_id"] >= GRAY_TWIN_OFFSET)
            & (out["asset_id"] < PERTURB_TWIN_OFFSET)
        ]
        assert (
            gray["canonical_id"] <= gray["asset_id"] - GRAY_TWIN_OFFSET
        ).all()


class TestAudioFingerprintNearDup:
    """r9: audio energy-fingerprint near-dup (l62)."""

    def test_planted_swap_recall_is_total(self, spark, docs):
        """Every doc_id % 3 == 0 must surface as a planted_swap pair at
        hamming 0 — the energy-preserving permutation guarantees equal
        fingerprints structurally."""
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l62_audio_fingerprint_neardup,
        )

        out = l62_audio_fingerprint_neardup(spark, SF).toPandas()
        swap = out[out["kind"] == "planted_swap"]
        expected = {
            r["doc_id"]
            for r in docs.filter(F.col("doc_id") % 3 == 0).collect()
        }
        assert set(swap["id_a"]) == expected
        assert (swap["hamming"] == 0).all()

    def test_swap_twin_payload_differs(self):
        """The twin must be byte-different (else it tests nothing)."""
        import numpy as np

        from datafusion_cyberpolka_eda_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        d, n = 6, 106
        k = np.arange(n, dtype=np.int64)
        s = (d * 48271 + k * 16807) % 65536 - 32768
        partner = k ^ 1
        same = (partner < n) & ((k * 63) // n == (partner * 63) // n)
        twin = np.where(same, s[np.minimum(partner, n - 1)], s)
        assert (twin != s).any()
        _, back = decode_wav(encode_wav(twin))
        assert (back == twin).all()


class TestQualityClassifier:
    """r10: distributed integer-quantized logistic-regression trainer."""

    def test_matches_python_replay_exactly(self, spark, docs):
        """The superstep trainer must equal a driver-side pure-Python
        replay of the same integer algorithm BIT-FOR-BIT — the l59
        exactness discipline applied to gradient descent."""
        import math

        from datafusion_cyberpolka_eda_spark.operators import ml as ML
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            QC_CENTER,
            QC_ITERS,
            QC_LR_DIV,
            QC_PRECOND,
            QC_TWIN_OFFSET,
            _qc_x,
        )

        base = docs.select(
            F.col("doc_id").alias("id"),
            F.lit(0).alias("y"),
            _qc_x(F.col("text")).alias("x"),
        )
        toks = F.split(F.col("text"), " ")
        ctext = F.array_join(
            F.array_repeat(F.element_at(toks, 1), F.size(toks)), " "
        )
        corrupt = docs.filter(F.col("doc_id") % 7 == 2).select(
            (F.col("doc_id") + F.lit(QC_TWIN_OFFSET)).alias("id"),
            F.lit(1).alias("y"),
            _qc_x(ctext).alias("x"),
        )
        feats = base.unionByName(corrupt).localCheckpoint(eager=True)
        got_w = ML.logreg_train_supersteps(
            feats, dim=4, iters=QC_ITERS, lr_div=QC_LR_DIV, precond=QC_PRECOND
        )

        # pure-Python replay: features from raw text, exact integer GD
        rows = docs.select("doc_id", "text").collect()
        X, Y = [], []
        for r in rows:
            w_ = r["text"].split(" ")
            nt, nd, ln = len(w_), len(set(w_)), len(r["text"])
            X.append(
                (
                    1,
                    nt,
                    math.floor(float(nd * 1000) / nt) - QC_CENTER,
                    math.floor(float((ln - nt + 1) * 100) / nt),
                )
            )
            Y.append(0)
            if r["doc_id"] % 7 == 2:
                X.append(
                    (
                        1,
                        nt,
                        math.floor(1000.0 / nt) - QC_CENTER,
                        100 * len(w_[0]),
                    )
                )
                Y.append(1)
        S = ML.LOGREG_PSCALE
        n = len(X)
        w = [0, 0, 0, 0]
        for _ in range(QC_ITERS):
            g = [0, 0, 0, 0]
            for x, y in zip(X, Y):
                z = sum(w[j] * x[j] for j in range(4))
                p = min(max(S // 2 + math.floor(z / 4.0), 0), S)
                e = p - y * S
                for j in range(4):
                    g[j] += e * x[j]
            w = [
                w[j]
                - math.floor(float(g[j]) / float(n * QC_LR_DIV * QC_PRECOND[j]))
                for j in range(4)
            ]
        assert got_w == w

    def test_planted_recall_and_precision_perfect_at_test_sf(
        self, spark
    ):
        """MEASURED gate (not pinned in the entry itself): at the test
        SFs the trained boundary separates the planted repetition twins
        perfectly — every corrupt row flagged, zero clean rows lost."""
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l64_quality_classifier,
        )

        agg = (
            l64_quality_classifier(spark, SF)
            .agg(
                F.sum("n_corrupt").alias("c"),
                F.sum("n_caught").alias("k"),
                F.sum("n_false_pos").alias("fp"),
            )
            .collect()[0]
        )
        assert agg["c"] > 0
        assert agg["k"] == agg["c"]
        assert agg["fp"] == 0


class TestIncrementalClassifierUpdate:
    """r10: warm-start continue-training from the day-1 weight registry
    (l71) — checkpoint/resume exactness, store reuse, no-day-1-rescan."""

    @staticmethod
    def _labeled_rows(docs, pred):
        """Pure-Python labeled feature rows for docs matching pred."""
        import math

        from datafusion_cyberpolka_eda_spark.registry.llm import QC_CENTER

        rows = []
        for r in docs.select("doc_id", "text").collect():
            if not pred(r["doc_id"]):
                continue
            w_ = r["text"].split(" ")
            nt, nd, ln = len(w_), len(set(w_)), len(r["text"])
            rows.append(
                (
                    (
                        1,
                        nt,
                        math.floor(float(nd * 1000) / nt) - QC_CENTER,
                        math.floor(float((ln - nt + 1) * 100) / nt),
                    ),
                    0,
                )
            )
            if r["doc_id"] % 7 == 2:
                rows.append(
                    (
                        (
                            1,
                            nt,
                            math.floor(1000.0 / nt) - QC_CENTER,
                            100 * len(w_[0]),
                        ),
                        1,
                    )
                )
        return rows

    @staticmethod
    def _replay_gd(rows, iters, w):
        import math

        from datafusion_cyberpolka_eda_spark.operators import ml as ML
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            QC_LR_DIV,
            QC_PRECOND,
        )

        S = ML.LOGREG_PSCALE
        n = len(rows)
        w = list(w)
        for _ in range(iters):
            g = [0, 0, 0, 0]
            for x, y in rows:
                z = sum(w[j] * x[j] for j in range(4))
                p = min(max(S // 2 + math.floor(z / 4.0), 0), S)
                e = p - y * S
                for j in range(4):
                    g[j] += e * x[j]
            w = [
                w[j]
                - math.floor(
                    float(g[j]) / float(n * QC_LR_DIV * QC_PRECOND[j])
                )
                for j in range(4)
            ]
        return w

    def test_two_phase_matches_python_replay_exactly(self, spark, docs):
        """Day-1 checkpoint + day-2 warm-start resume must equal the
        pure-Python replay of the same two-phase integer trajectory
        BIT-FOR-BIT — the l64 exactness discipline extended across the
        registry handoff."""
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            QC_CONT_ITERS,
            QC_DAY1_ITERS,
            l71_incremental_classifier_update,
        )

        max_id = docs.agg(F.max("doc_id")).collect()[0][0]
        cutoff = int(0.8 * (max_id + 1))
        wa = self._replay_gd(
            self._labeled_rows(docs, lambda i: i < cutoff),
            QC_DAY1_ITERS,
            [0, 0, 0, 0],
        )
        wb = self._replay_gd(
            self._labeled_rows(docs, lambda i: i >= cutoff),
            QC_CONT_ITERS,
            wa,
        )
        row = l71_incremental_classifier_update(spark, SF).collect()[0]
        got_a = [row["w1_bias"], row["w1_ntok"], row["w1_ttr"], row["w1_awl"]]
        got_b = [row["w2_bias"], row["w2_ntok"], row["w2_ttr"], row["w2_awl"]]
        assert got_a == wa
        assert got_b == wb
        assert got_a != got_b, (
            "the continuation must genuinely move the checkpoint — a "
            "saturated day-1 model would make the warm-start untestable"
        )

    def test_warm_start_trainer_contract(self, spark):
        """iters=0 returns w_init unchanged; zeros w_init equals the
        cold-start path step for step."""
        import pandas as pd

        from datafusion_cyberpolka_eda_spark.operators import ml as ML

        feats = spark.createDataFrame(
            pd.DataFrame(
                {
                    "id": [1, 2, 3, 4],
                    "y": [0, 0, 1, 1],
                    "x": [[1, 5, 0, 2], [1, 7, 1, 3], [1, 6, 9, 8], [1, 9, 9, 9]],
                }
            )
        )
        w0 = [11, -22, 33, -44]
        assert (
            ML.logreg_train_supersteps(
                feats, dim=4, iters=0, lr_div=4, precond=[1, 1, 1, 1],
                w_init=w0,
            )
            == w0
        )
        cold = ML.logreg_train_supersteps(
            feats, dim=4, iters=3, lr_div=4, precond=[1, 1, 1, 1]
        )
        warm = ML.logreg_train_supersteps(
            feats, dim=4, iters=3, lr_div=4, precond=[1, 1, 1, 1],
            w_init=[0, 0, 0, 0],
        )
        assert cold == warm

    def test_registry_store_reused_across_calls(self, spark, monkeypatch):
        """The second l71 call must read the persisted day-1 weights, not
        retrain: the trainer is replaced with a bomb after warm-up and
        only the continue-phase call (w_init set) may fire."""
        from datafusion_cyberpolka_eda_spark.operators import ml as ML
        from datafusion_cyberpolka_eda_spark.registry import llm as L

        L._qc_incr_store(spark, SF)  # warm the registry

        real = ML.logreg_train_supersteps

        def guarded(feats, dim, iters, lr_div, precond, w_init=None):
            assert w_init is not None, (
                "day-1 (cold-start) training ran again despite the "
                "persisted weight registry"
            )
            return real(
                feats, dim, iters, lr_div, precond, w_init=w_init
            )

        monkeypatch.setattr(ML, "logreg_train_supersteps", guarded)
        out = L.l71_incremental_classifier_update(spark, SF)
        assert out.count() > 0

    def test_increment_featurization_is_predicate_pushed(
        self, spark, tmp_path
    ):
        """Every documents scan in the day-2 featurization plan must
        carry the pushed increment predicate — day-1 text is never
        re-featurized (the l31/l66 no-rescan discipline)."""
        import io
        import os
        import shutil
        from contextlib import redirect_stdout

        from datafusion_cyberpolka_eda_spark.registry.llm import (
            _qc_train_feats,
        )

        # read a COPY of the parquet: the module fixture caches the
        # catalog's documents DataFrame, and Spark substitutes cached
        # subtrees by plan match, which would replace the scan (and its
        # pushed filters) with the cache's unfiltered original plan
        src = f"{SF}/documents.parquet"
        dst = str(tmp_path / "documents.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
        docs = spark.read.parquet(dst)
        max_id = docs.agg(F.max("doc_id")).collect()[0][0]
        cutoff = int(0.8 * (max_id + 1))
        feats = _qc_train_feats(
            docs.filter(F.col("doc_id") >= cutoff), checkpoint=False
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            feats.explain(mode="formatted")
        plan = buf.getvalue()
        blocks = [b for b in plan.split("\n\n") if "documents.parquet" in b]
        assert blocks, "expected documents scans in the featurization plan"
        for b in blocks:
            assert f"GreaterThanOrEqual(doc_id,{cutoff})" in b, (
                "documents scan without the pushed increment filter — "
                "day-1 text would be re-featurized:\n" + b
            )

    def test_measured_gate_on_increment(self, spark):
        """MEASURED (not pinned): the continued model catches every
        planted twin in the increment with zero clean-row loss."""
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l71_incremental_classifier_update,
        )

        agg = (
            l71_incremental_classifier_update(spark, SF)
            .agg(
                F.sum("n_corrupt").alias("c"),
                F.sum("n_caught").alias("k"),
                F.sum("n_false_pos").alias("fp"),
            )
            .collect()[0]
        )
        assert agg["c"] > 0
        assert agg["k"] == agg["c"]
        assert agg["fp"] == 0


class TestDsirSelection:
    """r10: DSIR-style hashed-bigram importance selection (l72)."""

    def test_selection_enriches_target_distribution(self, spark):
        """MEASURED: the top-20 selected docs must be enriched in the
        target slice (doc_id % 11 == 3) far beyond its 1/11 base rate —
        the property the importance weighting exists to deliver."""
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l72_dsir_selection,
        )

        rows = l72_dsir_selection(spark, SF).collect()
        assert len(rows) == 20
        frac = sum(1 for r in rows if r["doc_id"] % 11 == 3) / len(rows)
        assert frac > 3 / 11, (
            f"target fraction {frac:.2f} in the selection head is not "
            "enriched over the 1/11 base rate"
        )

    def test_short_docs_yield_no_bigrams(self, spark):
        """A single-token doc has no bigram features and must simply be
        absent from the scored set (not crash, not score 0)."""
        import pandas as pd

        from datafusion_cyberpolka_eda_spark.functions.hashing import (
            md5_hash64,
        )
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            DSIR_BUCKETS,
        )

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "text": ["solo", "two words"]})
        )
        toks = F.split(F.col("text"), " ")
        n = F.size(toks)
        bigrams = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        bg = df.select("doc_id", F.explode(bigrams).alias("bg")).select(
            "doc_id",
            F.pmod(md5_hash64("bg"), F.lit(DSIR_BUCKETS).cast("long")).alias(
                "bkt"
            ),
        )
        got = {r["doc_id"] for r in bg.collect()}
        assert got == {2}

    def test_incremental_dsir_store_memo_and_frozen_scoring(self, spark):
        """l73: the second call must reuse the persisted frozen scorer
        (same cutoff/path), and increment scoring must equal manually
        replaying the frozen table against the increment."""
        from datafusion_cyberpolka_eda_spark.registry import llm as L

        first = L._dsir_store(spark, SF)
        second = L._dsir_store(spark, SF)
        assert first == second
        got = {
            (r["doc_id"], r["dsir_weight"])
            for r in L.l73_incremental_dsir(spark, SF).collect()
        }
        assert len(got) == 10
        # every selected doc is from the increment
        cutoff = first[0]
        assert all(i >= cutoff for i, _ in got)

    def test_incremental_dsir_scan_is_predicate_pushed(
        self, spark, tmp_path
    ):
        """l73: the increment featurization scan must carry the pushed
        doc_id >= cutoff filter — day-1 text is never re-exploded."""
        import io
        import os
        import shutil
        from contextlib import redirect_stdout

        from datafusion_cyberpolka_eda_spark.registry.llm import (
            _dsir_bigram_buckets,
        )

        src = f"{SF}/documents.parquet"
        dst = str(tmp_path / "documents.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
        docs = spark.read.parquet(dst)
        max_id = docs.agg(F.max("doc_id")).collect()[0][0]
        cutoff = int(0.8 * (max_id + 1))
        bg = _dsir_bigram_buckets(docs.filter(F.col("doc_id") >= cutoff))
        buf = io.StringIO()
        with redirect_stdout(buf):
            bg.explain(mode="formatted")
        plan = buf.getvalue()
        blocks = [b for b in plan.split("\n\n") if "documents.parquet" in b]
        assert blocks, "expected documents scans in the featurizer plan"
        for b in blocks:
            assert f"GreaterThanOrEqual(doc_id,{cutoff})" in b, (
                "documents scan without the pushed increment filter:\n" + b
            )


class TestDupSpanScrub:
    """r10: duplicated-span scrub (l74) — canonical-keep semantics."""

    def test_canonical_doc_keeps_span_others_lose_it(self, spark):
        """Three docs share one 8-gram: the min-id doc keeps every
        token; the other two lose exactly the 8 covered positions."""
        import pandas as pd

        from datafusion_cyberpolka_eda_spark.functions.hashing import (
            md5_hash64,
        )
        from datafusion_cyberpolka_eda_spark.functions import text as T
        from datafusion_cyberpolka_eda_spark.registry.llm import DUP_SCRUB_K

        k = DUP_SCRUB_K
        span = " ".join(f"s{i}" for i in range(k))
        pdf = pd.DataFrame(
            {
                "doc_id": [5, 2, 9],
                "source": ["a", "a", "b"],
                "text": [
                    f"x1 x2 {span} x3",   # non-canonical: loses the span
                    f"y1 {span}",          # canonical (min doc_id): keeps all
                    f"{span}",             # non-canonical: loses everything
                ],
            }
        )
        docs = spark.createDataFrame(pdf)
        tok = docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tk")
        )
        g = docs.select(
            "doc_id",
            F.posexplode(T.shingles("text", k)).alias("gpos", "gram"),
        )
        dup = (
            g.groupBy("gram")
            .agg(
                F.countDistinct("doc_id").alias("nd"),
                F.min("doc_id").alias("canon"),
            )
            .filter(F.col("nd") >= 2)
            .select("gram", "canon")
        )
        rem = (
            g.join(dup, "gram")
            .filter(F.col("doc_id") != F.col("canon"))
            .select(
                "doc_id",
                F.explode(
                    F.sequence(F.col("gpos"), F.col("gpos") + F.lit(k - 1))
                ).alias("pos"),
            )
            .distinct()
        )
        kept = tok.join(rem, ["doc_id", "pos"], "anti")
        kept_by_doc = {}
        for r in kept.collect():
            kept_by_doc.setdefault(r["doc_id"], set()).add(
                (r["pos"], r["tk"])
            )
        # doc 2 (canonical) keeps all k+1 tokens
        assert len(kept_by_doc[2]) == k + 1
        # doc 5 keeps only x1 x2 x3 (positions 0,1,k+2)
        assert kept_by_doc[5] == {(0, "x1"), (1, "x2"), (k + 2, "x3")}
        # doc 9 loses everything
        assert 9 not in kept_by_doc
        _ = md5_hash64  # checksum covered by the registry oracle


class TestClassifierPrCurve:
    """r10: threshold sweep of the trained quality classifier (l75)."""

    def test_curve_is_monotone_and_ships_the_right_point(self, spark):
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l75_classifier_pr_curve,
        )

        rows = sorted(
            l75_classifier_pr_curve(spark, SF).collect(),
            key=lambda r: r["thr"],
        )
        # flagged count and recall are non-increasing in the threshold
        for a, b in zip(rows, rows[1:]):
            assert a["n_flagged"] >= b["n_flagged"]
            assert a["recall_q"] >= b["recall_q"]
        # every row's confusion counts are consistent
        for r in rows:
            assert r["tp"] + r["fp"] == r["n_flagged"]
            assert r["tp"] + r["fn"] == rows[0]["tp"] + rows[0]["fn"]
        # the shipped operating point (z >= 0, the l70/j21 gate) is
        # perfect on the planted set at the test SF
        at0 = next(r for r in rows if r["thr"] == 0)
        assert at0["precision_q"] == 1.0
        assert at0["recall_q"] == 1.0
        # and the sweep actually exposes a tradeoff somewhere
        assert any(r["precision_q"] < 1.0 for r in rows)
        assert any(r["recall_q"] < 1.0 for r in rows)


class TestSemdedupTakedown:
    """r10: SemDeDup takedown (l76) — removal must resurrect exactly the
    vectors it un-shadows, matching a from-scratch re-run."""

    def test_matches_from_scratch_keep_over_present_set(self, spark):
        from datafusion_cyberpolka_eda_spark.registry.llm_similarity import (
            _semdedup_members_near,
            l76_semdedup_takedown,
        )

        members, near = _semdedup_members_near(spark, SF)
        mrows = members.collect()
        pairs = [(r["id_a"], r["id_b"]) for r in near.collect()]
        kept = {r["vec_id"] for r in mrows if r["is_kept"]}
        all_ids = {r["vec_id"] for r in mrows}
        removed = {v for v in kept if v % 13 == 5}
        assert removed, "fixture must produce takedown requests"
        # from-scratch referent: keep rule over corpus minus requests
        # with frozen clusters — prune iff a smaller PRESENT in-ball
        # neighbor exists
        present = all_ids - removed
        has_present_nb = {
            b for a, b in pairs if a not in removed and b in present
        }
        want_kept_after = present - has_present_nb
        out = l76_semdedup_takedown(spark, SF).collect()
        assert sum(r["n_removed"] for r in out) == len(removed)
        assert sum(r["n_kept_after"] for r in out) == len(want_kept_after)
        # resurrected = newly kept rows that were pruned before
        want_resur = want_kept_after - kept
        assert sum(r["n_resurrected"] for r in out) == len(want_resur)
        assert sum(r["resurrected_id_sum"] for r in out) == sum(want_resur)
        assert want_resur, (
            "fixture should exercise resurrection — otherwise the "
            "survivorship subtlety is untested"
        )

class TestIncrementalDupSpanScrub:
    """r10: incremental dup-span scrub (l77) — store sufficiency,
    day-1 immutability, pushed increment scans."""

    def test_incremental_scrub_store_memo_and_merge_semantics(
        self, spark
    ):
        """l77: the store is built once (memo); a day-2 re-crawl of a
        day-1 passage is scrubbed from day-2 while day-1 keeps canonical
        ownership (canon < cutoff for store-hit grams)."""
        from datafusion_cyberpolka_eda_spark.registry import llm as L

        first = L._dup_scrub_store(spark, SF)
        second = L._dup_scrub_store(spark, SF)
        assert first == second
        out = L.l77_incremental_dup_span_scrub(spark, SF)
        rows = out.collect()
        cutoff = first[0]
        # rollup covers exactly the increment docs
        n_inc = (
            load_table(spark, SF, "documents")
            .filter(F.col("doc_id") >= cutoff)
            .count()
        )
        assert sum(r["n_docs"] for r in rows) == n_inc
        # the scrub does real work at the test SF
        assert sum(r["removed_tokens"] for r in rows) > 0

    def test_incremental_scrub_scan_is_predicate_pushed(
        self, spark, tmp_path
    ):
        """l77: increment token/gram scans carry the pushed cutoff."""
        import io
        import os
        import shutil
        from contextlib import redirect_stdout

        from datafusion_cyberpolka_eda_spark.functions import text as T
        from datafusion_cyberpolka_eda_spark.registry.llm import DUP_SCRUB_K

        src = f"{SF}/documents.parquet"
        dst = str(tmp_path / "documents.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
        docs = spark.read.parquet(dst)
        max_id = docs.agg(F.max("doc_id")).collect()[0][0]
        cutoff = int(0.8 * (max_id + 1))
        g2 = docs.filter(F.col("doc_id") >= cutoff).select(
            "doc_id",
            F.posexplode(T.shingles("text", DUP_SCRUB_K)).alias(
                "gpos", "gram"
            ),
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            g2.explain(mode="formatted")
        plan = buf.getvalue()
        blocks = [b for b in plan.split("\n\n") if "documents.parquet" in b]
        assert blocks
        for b in blocks:
            assert f"GreaterThanOrEqual(doc_id,{cutoff})" in b, (
                "increment gram scan without the pushed filter:\n" + b
            )


class TestAdaptiveSemdedupKnn:
    """r11 verdict task 1: the production adaptive-quantizer paths for
    SemDeDup and the batch k-NN join (the frozen l65/l68 twins stay the
    oracle anchors; these tests pin the operators' semantics)."""

    def test_semdedup_prunes_exact_copies_min_id_survives(self, emb):
        """Exact-copy twins (cosine 1.0) must always be pruned — identical
        vectors produce identical cell dots, so base and twin share a
        cluster structurally — and the SMALLER id must be the survivor."""
        base = emb.select(
            F.col("vec_id").alias("id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
        )
        twins = base.filter(F.col("id") % 9 == 4).select(
            (F.col("id") + F.lit(1 << 23)).alias("id"), "vec"
        )
        allv = base.unionByName(twins)
        members = {
            r["id"]: r
            for r in SIM.semdedup(allv, "id", "vec", tau=0.999).collect()
        }
        n_twins = sum(1 for i in members if i >= (1 << 23))
        assert n_twins > 0
        for i, r in members.items():
            if i >= (1 << 23):
                assert not r["is_kept"], f"exact-copy twin {i} survived"
                assert members[i - (1 << 23)]["cluster"] == r["cluster"]
        # every input row is accounted for exactly once
        assert len(members) == allv.count()

    def test_semdedup_keeps_everything_when_nothing_is_near(self, emb):
        """tau above every non-planted pair cosine -> zero pruning (the
        bench embeddings' max off-diagonal cosine is far below 0.999)."""
        sub = emb.filter(F.col("vec_id") < 100)
        members = SIM.semdedup(sub, "vec_id", "embedding", tau=0.999)
        assert members.filter(~F.col("is_kept")).count() == 0
        assert members.count() == 100

    def test_semdedup_default_calls_adaptive(self, emb, monkeypatch):
        """semdedup(n_clusters=None) must consult adaptive_n_centroids —
        a future pinned-k refactor (the l65 judge flag) fails here."""
        calls = []
        orig = SIM.adaptive_n_centroids
        monkeypatch.setattr(
            SIM,
            "adaptive_n_centroids",
            lambda n, **kw: calls.append(n) or orig(n, **kw),
        )
        sub = emb.filter(F.col("vec_id") < 200)
        SIM.semdedup(sub, "vec_id", "embedding", tau=0.999).collect()
        assert calls and calls[0] == 200

    def test_knn_join_default_calls_adaptive(self, emb, monkeypatch):
        calls = []
        orig = SIM.adaptive_n_centroids
        monkeypatch.setattr(
            SIM,
            "adaptive_n_centroids",
            lambda n, **kw: calls.append(n) or orig(n, **kw),
        )
        sub = emb.filter(F.col("vec_id") < 200)
        SIM.knn_join(sub, "vec_id", "embedding", k=3).collect()
        assert calls and calls[0] == 200

    def test_knn_join_full_probe_equals_exact(self, emb):
        """Probing EVERY cell makes the candidate set all-pairs, so the
        adaptive join must reproduce the exact brute-force top-k
        (same rounded cosine, same (cosine DESC, id ASC) tiebreak)."""
        sub = emb.filter(F.col("vec_id") < 120)
        kc = 8
        ann = SIM.knn_join(
            sub, "vec_id", "embedding", k=3, n_centroids=kc, n_probe=kc
        )
        got = {}
        for r in ann.collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["neighbor_id"])
            )
        exact = SIM.cosine_topk(
            sub, sub, id_col="vec_id", vec_col="embedding", k=3
        )
        want = {}
        for r in exact.collect():
            want.setdefault(r["query_id"], []).append(
                (r["rank"], r["candidate_id"])
            )
        assert set(got) == set(want)
        for q in want:
            assert sorted(got[q]) == sorted(want[q]), f"query {q} mismatch"

    def test_knn_join_rank_contract(self, emb):
        """Ranks are 1..k per query with no duplicate neighbors."""
        sub = emb.filter(F.col("vec_id") < 150)
        rows = SIM.knn_join(sub, "vec_id", "embedding", k=5).collect()
        per_q: dict[int, list] = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r)
        for q, rs in per_q.items():
            ranks = sorted(r["rank"] for r in rs)
            assert ranks == list(range(1, len(rs) + 1))
            assert len({r["neighbor_id"] for r in rs}) == len(rs)
            assert q not in {r["neighbor_id"] for r in rs}

    def test_ivf_partition_shared_substrate(self, emb):
        """ivf_partition output feeds both operators via prebuilt= and
        must agree with the non-prebuilt path (same quantizer, same
        deterministic trainer)."""
        sub = emb.filter(F.col("vec_id") < 200)
        unit, cells, k = SIM.ivf_partition(
            sub, "vec_id", "embedding", n_centroids=12, n_probe=1
        )
        assert k == 12
        direct = SIM.semdedup(
            sub, "vec_id", "embedding", tau=0.999, n_clusters=12
        )
        via = SIM.semdedup(
            sub, "vec_id", "embedding", tau=0.999, prebuilt=(unit, cells)
        )
        assert sorted(map(tuple, direct.collect())) == sorted(
            map(tuple, via.collect())
        )


class TestCrossmodalDedup:
    """l78: LAION-shape paired-document dedup — text-OR-image edge union."""

    def test_planted_twins_removed_and_modality_attribution(self, spark, sf_dir):
        from datafusion_cyberpolka_eda_spark.registry.llm_multimodal import (
            l78_crossmodal_dedup,
        )

        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        n_gray = docs.filter(F.col("doc_id") % 5 == 0).count()
        n_pert = docs.filter(F.col("doc_id") % 5 == 3).count()
        rows = l78_crossmodal_dedup(spark, sf_dir).collect()
        # corpus = base docs + both twin families, all attributed to source
        assert sum(r["n_docs"] for r in rows) == n_docs + n_gray + n_pert
        # every twin has a structural edge to its smaller-id base, so the
        # min-id rule removes at least every twin
        assert sum(r["n_removed"] for r in rows) >= n_gray + n_pert
        # gray twins: fingerprint-equal image + signature-less caption ->
        # their base pair is reachable ONLY through the image modality
        assert sum(r["n_pairs_image_only"] for r in rows) >= n_gray
        # perturbed twins: verbatim caption -> text edge structural (the
        # image edge may or may not also fire, so text_only + both)
        assert (
            sum(r["n_pairs_text_only"] + r["n_pairs_both"] for r in rows)
            >= n_pert
        )


class TestDomainMixture:
    """l79: unsupervised domains (Lloyd clusters) -> temperature mixture
    -> enacted hash-ranked selection."""

    def test_budgets_shares_and_selection_consistency(self, spark, sf_dir):
        from datafusion_cyberpolka_eda_spark.registry.llm_similarity import (
            l79_domain_mixture,
        )

        rows = l79_domain_mixture(spark, sf_dir).collect()
        assert rows, "at least one non-empty cluster"
        nd = sum(r["n_docs"] for r in rows)
        # floor-rounding drops at most one doc per cluster from the budget
        assert nd - len(rows) <= sum(r["n_budget"] for r in rows) <= nd
        shares = sum(r["sampled_share"] for r in rows)
        assert abs(shares - 1.0) < 1e-4
        for r in rows:
            # the enacted pick fills the budget up to cluster size
            assert r["n_selected"] == min(r["n_budget"], r["n_docs"])
            assert r["n_selected"] <= r["n_docs"]
            assert r["epochs"] > 0
        # tau=0.5 temperature: the smallest cluster is up-weighted, the
        # largest down-weighted (strict when shares differ)
        lo = min(rows, key=lambda r: r["tokens"])
        hi = max(rows, key=lambda r: r["tokens"])
        if lo["tokens"] < hi["tokens"]:
            assert lo["sampled_share"] >= lo["raw_share"]
            assert hi["sampled_share"] <= hi["raw_share"]


class TestModelSelectionTakedown:
    """l80/l81: right-to-be-forgotten over the r10 model + selection
    stores — frozen estimators, removed docs' derived rows dropped."""

    def test_classifier_takedown_drops_docs_and_twins_keeps_weights(
        self, spark, sf_dir
    ):
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            QC_TWIN_OFFSET,
            _qc_incr_store,
            l80_classifier_takedown,
        )

        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        n_surv_base = docs.filter(F.col("doc_id") % 3 != 1).count()
        n_surv_twin = docs.filter(
            (F.col("doc_id") % 7 == 2) & (F.col("doc_id") % 3 != 1)
        ).count()
        n_twin = docs.filter(F.col("doc_id") % 7 == 2).count()
        assert n_twin > n_surv_twin, "feed must intersect the twin slice"
        rows = l80_classifier_takedown(spark, sf_dir).collect()
        # every surviving base doc + surviving twin contributes exactly once
        assert sum(r["n_rows"] for r in rows) == n_surv_base + n_surv_twin
        assert sum(r["n_corrupt"] for r in rows) == n_surv_twin
        assert sum(r["n_rows"] for r in rows) < n_docs + n_twin
        # the weight registry is FROZEN: output weights == stored weights
        _c, path = _qc_incr_store(spark, sf_dir)
        stored = {
            r["j"]: r["v"] for r in spark.read.parquet(path).collect()
        }
        for r in rows:
            assert (r["w_bias"], r["w_ntok"], r["w_ttr"], r["w_awl"]) == (
                stored[0], stored[1], stored[2], stored[3],
            )

    def test_dsir_takedown_head_and_resurrection(self, spark, sf_dir):
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            l73_incremental_dsir,
            l81_dsir_takedown,
        )

        post = l81_dsir_takedown(spark, sf_dir).collect()
        assert len(post) == 10
        assert all(r["doc_id"] % 7 != 3 for r in post), "removed doc in head"
        pre_ids = {
            r["doc_id"] for r in l73_incremental_dsir(spark, sf_dir).collect()
        }
        for r in post:
            # resurrected == entered the head only because a removed doc
            # vacated a slot == absent from the pre-takedown head
            assert r["resurrected"] == (r["doc_id"] not in pre_ids)


class TestAdaptiveIncrementalSemdedup:
    """l69b: the adaptive-store fix for the 61.9x pinned-k growth row."""

    def test_gate_booleans_and_store_adaptivity(self, spark, sf_dir, monkeypatch):
        from datafusion_cyberpolka_eda_spark.registry import llm_similarity as LS

        # fresh store per test run so the adaptive-rule call is observable
        LS._SEMDEDUP_ADAPT_STORE_CACHE.clear()
        calls = []
        orig = SIM.adaptive_n_centroids
        monkeypatch.setattr(
            SIM,
            "adaptive_n_centroids",
            lambda n, **kw: calls.append(n) or orig(n, **kw),
        )
        rows = LS.l69b_incremental_semdedup_adaptive(spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        assert calls and calls[0] == r["n_day1"], (
            "store build no longer consults adaptive_n_centroids on day-1"
        )
        assert r["n_twins"] > 0
        assert r["twin_recall_ge_095"]
        assert r["day1_never_pruned"]
        assert r["cand_ratio_le_02"]
        assert r["cand_balance_le_3"]
        LS._SEMDEDUP_ADAPT_STORE_CACHE.clear()
