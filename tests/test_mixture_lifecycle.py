"""Incremental + takedown domain mixture (l79c/l79d): the merged-
aggregate re-balance must be bit-identical to the naive rank rule over
the merged (or post-removal) corpus, the only day-1 membership rows
read are boundary buckets (pushed filter), and the aggregate-delta
machinery handles every budget edge case."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.functions.hashing import md5_hash64
from datafusion_cyberpolka_eda_spark.operators import similarity as SIM
from datafusion_cyberpolka_eda_spark.registry.llm_similarity import (
    _L79B_BUCKET_SHIFT,
    _enacted_mixture_totals,
    _mixture_budgets,
    _mixture_store,
    l79c_domain_mixture_incremental,
    l79d_domain_mixture_takedown,
)
from datafusion_cyberpolka_eda_spark.functions import text as T
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table


def _keyed_membership(spark, sf_dir, cent, cutoff):
    """Frozen-centroid assignment + token counts + rank keys for ALL
    docs with embeddings — the naive-recompute substrate."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = emb.select(
        F.col("vec_id").alias("id"),
        F.transform(
            "embedding", lambda x: F.floor(x * F.lit(100000.0)).cast("long")
        ).alias("q"),
    )
    return (
        SIM.lloyd_assign_q(q, cent)
        .select(
            F.col("id").alias("doc_id"),
            F.col("cluster").cast("bigint").alias("cluster"),
        )
        .join(
            docs.select(
                "doc_id", T.token_count("text").cast("bigint").alias("nt")
            ),
            "doc_id",
        )
        .withColumn("rkey", md5_hash64(F.col("doc_id").cast("string")))
    )


def _naive_selection(m, bud):
    """The direct rank rule: first n_budget rows per cluster by
    (rkey, doc_id) — per-cluster (n_selected, sel_id_sum)."""
    rk = F.row_number().over(
        Window.partitionBy("cluster").orderBy("rkey", "doc_id")
    )
    return (
        m.withColumn("rk", rk)
        .join(F.broadcast(bud.select("cluster", "n_budget")), "cluster")
        .filter(F.col("rk") <= F.col("n_budget"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_selected"),
            F.sum("doc_id").cast("bigint").alias("sel_id_sum"),
        )
    )


def _totals(df, cols=("cluster", "n_selected", "sel_id_sum")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestMixtureLifecycleEquivalence:
    def test_incremental_equals_naive_rank(self, spark, sf_dir):
        """l79c's store-side two-phase totals == the direct rank rule
        over the merged corpus with the same frozen assignment."""
        cutoff, cent, _rows, _aggs = _mixture_store(spark, sf_dir)
        got = l79c_domain_mixture_incremental(spark, sf_dir)
        m = _keyed_membership(spark, sf_dir, cent, cutoff).localCheckpoint(
            eager=True
        )
        bud = _mixture_budgets(
            m.withColumn(
                "bucket",
                F.shiftright(F.col("rkey"), _L79B_BUCKET_SHIFT).cast("int"),
            )
            .groupBy("cluster", "bucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("nt").cast("bigint").alias("tokens"),
                F.sum("doc_id").cast("bigint").alias("id_sum"),
            )
        )
        want = _naive_selection(m, bud)
        assert _totals(got) == _totals(want)
        # increment attribution: per-cluster new-doc counts must sum to
        # the increment size
        n_new = sum(r["n_new_docs"] for r in got.collect())
        assert n_new == m.filter(F.col("doc_id") >= cutoff).count()

    def test_takedown_equals_naive_over_remaining(self, spark, sf_dir):
        """l79d's post-removal totals == the direct rank rule over the
        REMAINING day-1 corpus (thresholds shifted, slots resurrected)."""
        cutoff, cent, _rows, _aggs = _mixture_store(spark, sf_dir)
        got = l79d_domain_mixture_takedown(spark, sf_dir)
        m_all = _keyed_membership(spark, sf_dir, cent, cutoff).filter(
            F.col("doc_id") < cutoff
        )
        m = m_all.filter(F.col("doc_id") % 7 != 3).localCheckpoint(eager=True)
        bud = _mixture_budgets(
            m.withColumn(
                "bucket",
                F.shiftright(F.col("rkey"), _L79B_BUCKET_SHIFT).cast("int"),
            )
            .groupBy("cluster", "bucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("nt").cast("bigint").alias("tokens"),
                F.sum("doc_id").cast("bigint").alias("id_sum"),
            )
        )
        want = _naive_selection(m, bud)
        assert _totals(got) == _totals(want)
        # removal accounting: per-cluster n_removed sums to the request
        n_rm = sum(r["n_removed"] for r in got.collect())
        assert n_rm == m_all.filter(F.col("doc_id") % 7 == 3).count()
        # no removed doc can be selected: the remaining corpus is what
        # the totals rank over, so selected <= remaining per cluster
        for r in got.collect():
            assert r["n_selected"] <= r["n_docs"]

    def test_boundary_read_carries_pushed_filter(self, spark, sf_dir):
        """The only day-1 membership read in the day-2 path is the
        boundary-bucket slice, and it reaches the parquet scan as a
        pushed (cluster, bucket) filter."""
        _cutoff, _cent, rows_path, _aggs = _mixture_store(spark, sf_dir)
        cond = (F.col("cluster") == 3) & (F.col("bucket") == 1234)
        plan = (
            spark.read.parquet(rows_path)
            .filter(cond)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters" in plan
        assert "EqualTo(cluster,3)" in plan
        assert "EqualTo(bucket,1234)" in plan

    def test_store_memoized(self, spark, sf_dir):
        a = _mixture_store(spark, sf_dir)
        b = _mixture_store(spark, sf_dir)
        assert a is b


class TestEnactedTotalsEdgeCases:
    """Synthetic store: 2 clusters x known buckets; budgets swept over
    every edge (0, 1, exact bucket boundary, n, > n) must reproduce
    the naive rank rule bit-for-bit through the aggregate path."""

    @pytest.fixture(scope="class")
    def store(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("mixstore")
        rows = (
            spark.range(0, 400)
            .select(
                F.col("id").alias("doc_id"),
                (F.col("id") % 2).cast("bigint").alias("cluster"),
                F.lit(5).cast("bigint").alias("nt"),
            )
            .withColumn("rkey", md5_hash64(F.col("doc_id").cast("string")))
            .withColumn(
                "bucket",
                F.shiftright(F.col("rkey"), _L79B_BUCKET_SHIFT).cast("int"),
            )
            .localCheckpoint(eager=True)
        )
        rows_path = str(root / "rows.parquet")
        rows.write.parquet(rows_path)
        aggs = rows.groupBy("cluster", "bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("nt").cast("bigint").alias("tokens"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        ).localCheckpoint(eager=True)
        return rows, rows_path, aggs

    def test_budget_edges_match_naive(self, spark, store):
        rows, rows_path, aggs = store
        # an exact per-cluster bucket-boundary cumulative count, so one
        # sweep case lands budget == cum (no boundary bucket at all)
        wcum = (
            Window.partitionBy("cluster")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        first_cum = (
            aggs.withColumn("cum", F.sum("n").over(wcum))
            .groupBy("cluster")
            .agg(F.min("cum").alias("c"))
            .collect()
        )
        exact = {int(r["cluster"]): int(r["c"]) for r in first_cum}
        n_per = {
            int(r["cluster"]): int(r["n"])
            for r in aggs.groupBy("cluster")
            .agg(F.sum("n").alias("n"))
            .collect()
        }
        for budget_of in (
            lambda c: 0,
            lambda c: 1,
            lambda c: exact[c],          # budget == a bucket's cum
            lambda c: exact[c] + 1,      # boundary = next bucket, need 1
            lambda c: n_per[c],          # take everything
            lambda c: n_per[c] + 50,     # budget exceeds rows
        ):
            bud = spark.createDataFrame(
                [(c, budget_of(c)) for c in sorted(n_per)],
                "cluster bigint, n_budget bigint",
            )
            got = _enacted_mixture_totals(
                spark, aggs, bud, rows_path, None, None
            )
            want = bud.select("cluster").join(
                _naive_selection(rows, bud), "cluster", "left"
            ).select(
                "cluster",
                F.coalesce("n_selected", F.lit(0)).alias("n_selected"),
                F.coalesce("sel_id_sum", F.lit(0)).alias("sel_id_sum"),
            )
            assert _totals(got) == _totals(want)

    def test_increment_and_exclusion_paths(self, spark, store):
        """Increment rows merge into the boundary rank; excluded ids
        drop out of the day-1 boundary read — both against naive."""
        rows, rows_path, aggs = store
        inc = (
            spark.range(400, 500)
            .select(
                F.col("id").alias("doc_id"),
                (F.col("id") % 2).cast("bigint").alias("cluster"),
                F.lit(5).cast("bigint").alias("nt"),
            )
            .withColumn("rkey", md5_hash64(F.col("doc_id").cast("string")))
            .withColumn(
                "bucket",
                F.shiftright(F.col("rkey"), _L79B_BUCKET_SHIFT).cast("int"),
            )
            .localCheckpoint(eager=True)
        )
        inc_aggs = inc.groupBy("cluster", "bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("nt").cast("bigint").alias("tokens"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        merged = (
            aggs.unionByName(inc_aggs)
            .groupBy("cluster", "bucket")
            .agg(
                F.sum("n").cast("bigint").alias("n"),
                F.sum("tokens").cast("bigint").alias("tokens"),
                F.sum("id_sum").cast("bigint").alias("id_sum"),
            )
        )
        bud = spark.createDataFrame(
            [(0, 117), (1, 64)], "cluster bigint, n_budget bigint"
        )
        got = _enacted_mixture_totals(
            spark, merged, bud, rows_path, inc, None
        )
        want = _naive_selection(rows.unionByName(inc), bud)
        assert _totals(got) == _totals(want)

        # exclusion: remove ids % 11 == 0 from the day-1 side
        rm = rows.filter(F.col("doc_id") % 11 == 0).select("doc_id")
        neg = rows.join(F.broadcast(rm), "doc_id").groupBy(
            "cluster", "bucket"
        ).agg(
            (-F.count(F.lit(1))).cast("bigint").alias("n"),
            (-F.sum("nt")).cast("bigint").alias("tokens"),
            (-F.sum("doc_id")).cast("bigint").alias("id_sum"),
        )
        merged_rm = (
            aggs.unionByName(neg)
            .groupBy("cluster", "bucket")
            .agg(
                F.sum("n").cast("bigint").alias("n"),
                F.sum("tokens").cast("bigint").alias("tokens"),
                F.sum("id_sum").cast("bigint").alias("id_sum"),
            )
            .filter(F.col("n") > 0)
        )
        got_rm = _enacted_mixture_totals(
            spark, merged_rm, bud, rows_path, None, rm
        )
        remaining = rows.join(F.broadcast(rm), "doc_id", "left_anti")
        want_rm = _naive_selection(remaining, bud)
        assert _totals(got_rm) == _totals(want_rm)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
