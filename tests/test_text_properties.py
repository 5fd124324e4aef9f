"""Property-based tests (hypothesis): the JVM-side text expressions in
functions/text.py must agree with straightforward pure-Python references
on arbitrary corpora — not just the fixed testdata. Each property runs a
FEW hypothesis examples, and each example is ONE Spark job over the whole
generated corpus (row-per-text), keeping wall time bounded."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.functions import text as T

# words over a small alphabet, salted with real marker words so lang_id's
# argmax/tiebreak logic actually fires
_WORDS = st.sampled_from(
    ["the", "and", "der", "die", "le", "la", "el", "que", "aa", "bb", "cc",
     "zz", "x1", "", "punct!", "a,b"]
)
_TEXTS = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_TEXTS, min_size=1, max_size=30)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _run(spark, texts, col):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r["v"] for r in df.select(col.alias("v")).collect()]


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_token_count_matches_python(spark, corpus):
    got = _run(spark, corpus, T.token_count("text"))
    assert got == [len(t.split(" ")) for t in corpus]


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_shingles_match_python(spark, corpus):
    n = 3
    got = _run(spark, corpus, T.shingles("text", n))
    for t, sh in zip(corpus, got):
        toks = t.split(" ")
        want = [" ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))]
        assert sh == want


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_marker_hits_matches_python(spark, corpus):
    markers = T.LANG_MARKERS["en"]
    got = _run(spark, corpus, T.marker_hits("text", markers))
    assert got == [len(set(t.split(" ")) & set(markers)) for t in corpus]


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_lang_id_matches_python(spark, corpus):
    got = _run(spark, corpus, T.lang_id("text"))

    def ref(t: str) -> str:
        toks = set(t.split(" "))
        best, best_score = "und", 0
        for code in sorted(T.LANG_MARKERS):
            score = len(toks & set(T.LANG_MARKERS[code]))
            if score > best_score:
                best, best_score = code, score
        return best

    assert got == [ref(t) for t in corpus]


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_fingerprints_deterministic_and_order_sensitive(spark, corpus):
    a = _run(spark, corpus, T.doc_fingerprint("text"))
    b = _run(spark, corpus, T.doc_fingerprint("text"))
    assert a == b  # two separate jobs, identical fingerprints
    s = _run(spark, corpus, T.simhash("text"))
    assert all(v is not None and v >= 0 for v in s)  # 63-bit => non-negative
    # identical texts must collide (fingerprint is a pure function)
    seen: dict[str, int] = {}
    for t, fp in zip(corpus, a):
        if t in seen:
            assert seen[t] == fp
        seen[t] = fp


@given(keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                     max_size=50, unique=True))
@settings(**_SETTINGS)
def test_hash_sample_key_stable_and_monotonic(spark, keys):
    """B6 contract: membership depends only on (key, seed) — so two tables
    sharing keys sample consistently — and pct=10 members are a subset of
    pct=20 members (monotonic in pct)."""
    from datafusion_cyberpolka_eda_spark.functions.sampling import hash_sample

    df1 = spark.createDataFrame([(k, "t1") for k in keys], "k long, src string")
    df2 = spark.createDataFrame([(k, "t2") for k in keys], "k long, src string")
    take = lambda df, pct: {r["k"] for r in hash_sample(df, "k", pct).collect()}  # noqa: E731
    assert take(df1, 10) == take(df2, 10)
    assert take(df1, 10) <= take(df1, 20)
    assert take(df1, 100) == set(keys)


class TestBigramLmScore:
    def test_hand_computed_tiny_corpus(self, spark):
        """l42's scorer on 'a b a b' + 'a a': counts N=6, c(a)=4, c(b)=2,
        c(a b)=2, c(b a)=1, c(a a)=1 — per-doc NLLs verified by hand."""
        import math

        from datafusion_cyberpolka_eda_spark.registry.llm import bigram_doc_nll

        docs = spark.createDataFrame(
            [(1, "en", "a b a b"), (2, "en", "a a")],
            "doc_id bigint, lang string, text string",
        )
        got = {
            r["doc_id"]: (r["doc_nll"], r["n_bigrams"])
            for r in bigram_doc_nll(docs).collect()
        }
        p_ab = 0.75 * 2 / 4 + 0.25 * 2 / 6
        p_ba = 0.75 * 1 / 2 + 0.25 * 4 / 6
        p_aa = 0.75 * 1 / 4 + 0.25 * 4 / 6
        want1 = (-math.log(p_ab) * 2 - math.log(p_ba)) / 3
        want2 = -math.log(p_aa)
        assert got[1][1] == 3 and got[2][1] == 1
        assert abs(got[1][0] - want1) < 1e-12
        assert abs(got[2][0] - want2) < 1e-12

    def test_single_token_doc_emits_no_row(self, spark):
        from datafusion_cyberpolka_eda_spark.registry.llm import bigram_doc_nll

        docs = spark.createDataFrame(
            [(1, "en", "solo"), (2, "en", "two tokens")],
            "doc_id bigint, lang string, text string",
        )
        got = {r["doc_id"] for r in bigram_doc_nll(docs).collect()}
        assert got == {2}


class TestDupSpanCoverage:
    def test_union_of_overlapping_spans(self, spark):
        """Two docs sharing a 9-token prefix have exactly two duplicated
        8-grams whose spans overlap on positions 1..8 — covered must be
        the UNION (9 positions), not the sum (16)."""
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            dup_span_doc_coverage,
        )

        shared = "a b c d e f g h i"
        docs = spark.createDataFrame(
            [
                (1, "en", shared + " j k l"),
                (2, "en", shared + " z1 z2 z3"),
                (3, "en", "p q r s t u v w x y"),
            ],
            "doc_id bigint, lang string, text string",
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["covered"])
            for r in dup_span_doc_coverage(docs).collect()
        }
        assert got == {1: (12, 9), 2: (12, 9), 3: (10, 0)}

    def test_within_doc_repeats_not_counted(self, spark):
        """A gram repeated inside ONE doc is not a cross-doc duplicate —
        the distinct-doc count must gate it out."""
        from datafusion_cyberpolka_eda_spark.registry.llm import (
            dup_span_doc_coverage,
        )

        rep = "a b c d e f g h " * 2  # same 8-gram twice in one doc
        docs = spark.createDataFrame(
            [(1, "en", rep.strip()), (2, "en", "q r s t u v w x y z")],
            "doc_id bigint, lang string, text string",
        )
        got = {
            r["doc_id"]: r["covered"]
            for r in dup_span_doc_coverage(docs).collect()
        }
        assert got == {1: 0, 2: 0}
