"""Empirical scale smoke for the L family (dedup / similarity): run the
production-path queries at 1x, 4x and 16x the sf0.1 documents/embeddings
tables and record wall time + output sizes, demonstrating sub-quadratic
growth (candidates track near-pair density, not n^2).

Replication preserves the thing that matters — per-replica near-pair
structure — while preventing artificial cross-replica duplicates:

- documents: replica k bijectively renames every token with an `r<k>`
  prefix. Within a replica, Jaccard/MinHash/SimHash relationships are
  EXACTLY those of the original corpus (hash families are token-value
  dependent but the candidate/true-pair densities are statistically
  unchanged); across replicas, token sets are disjoint so no new near
  pairs appear. True near-dup pairs therefore grow linearly in n by
  construction, and a correctly sub-quadratic pipeline's candidates and
  runtime should track that, not n^2.
- embeddings: replica k rotates each vector by k positions. Rotation is
  an isometry (norms and within-replica cosines exactly preserved);
  cross-replica cosines decorrelate, so near-dup density again grows
  linearly.

Usage: python tools/scale_smoke.py [--factors 1,4,16]
Appends nothing; prints a markdown table to paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

QUERIES = [
    # name -> why it's in the smoke
    "l1_dedup_exact",          # one shuffle on key: linear
    "l3b_minhash_banded",      # banded MinHash: candidates ~ near-pair density
    "l4b_simhash_near_pairs",  # hamming<=k pigeonhole bands
    "l4_simhash_fingerprints", # linear fingerprint map + (since r6) the
    #   gate's identical-text self-join: shuffle keyed on text, group sizes
    #   are duplicate multiplicities — stays linear while dup density does
    "l11_neardup_components",  # iterative HashMin CC over near-dup graph
    "l10_embedding_neardup",   # bucketed quantizer; NOTE: its 0.25 threshold
    #   sits at ~2 sigma of dim-64 random-cosine noise (1/sqrt(64)=0.125), so
    #   ~2% of ALL pairs are TRUE near-pairs and output is inherently ~n^2 —
    #   the strict-threshold entry below isolates the algorithm's scaling
    "l7_cosine_topk",          # exact top-k, fixed query side: linear scan
    "l23_dedup_pipeline",      # END-TO-END: banded candidates -> bounded
    #   verify -> components -> summary; true near pairs grow linearly by
    #   construction, so the whole pipeline should track that, not n^2
    "l20_contamination_screen",  # broadcast semi-join decontamination:
    #   token renaming keeps grams per-replica, so the benchmark gram set
    #   and the contaminated-doc count both grow linearly; runtime should
    #   track the (linear) explode+probe, never pair formation
]


def _neardup_strict(spark, sf_dir: str):
    """Same bucketed operator as l10 but at threshold 0.6 (~5 sigma of the
    random-cosine noise floor), the sparse-true-pair regime bucketed
    near-dup is built for — exercising the operator's DEFAULT adaptive
    sqrt-n centroid count (since round 5 the rule lives in the code:
    similarity.adaptive_n_centroids), which keeps per-cell size (and so
    candidate volume per row) constant as data grows. A fixed centroid
    count is quadratic by construction: measured 239 s at 16x with 8
    cells vs ~linear with sqrt-scaled cells."""
    from datafusion_cyberpolka_eda_spark.operators.dedup import (
        embedding_neardup_bucketed,
    )
    from datafusion_cyberpolka_eda_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_bucketed(
        emb, "vec_id", "embedding", threshold=0.6, n_probe=2
    )


def _ivf_adaptive(spark, sf_dir: str):
    """Trained-quantizer IVF ANN at the DEFAULT adaptive sqrt-n centroid
    count (l8b's operator; l8b itself pins the fixed 16/8 config its
    external recall gate was verified on). Probe cost per query tracks
    n_probe/n_centroids of the corpus; with both scaled ~sqrt(n) the scan
    per query grows ~sqrt(n) per cell x constant cells — sub-linear —
    while candidate verification stays bounded per cell."""
    from datafusion_cyberpolka_eda_spark.operators.similarity import (
        ann_ivf_sampled_topk_multi,
    )
    from datafusion_cyberpolka_eda_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ivf_sampled_topk_multi(
        emb, "vec_id", "embedding", query_ids=[0, 1, 2, 3, 4], k=5
    )


CUSTOM = {
    "l10_bucketed_strict_t0.6": _neardup_strict,
    "l8b_ivf_adaptive": _ivf_adaptive,
}


def build_scaled(
    spark, src_dir: str, out_dir: str, factor: int,
    offset: int = 10_000_000,
) -> None:
    """``offset`` is the per-replica id stride. The 10M default keeps
    replica key-spaces visually distinct; the r10-family growth harness
    (sf_amortization --growth) passes a DENSE offset instead so scaled
    ids stay below the 2^23 planted-twin domain guards of the
    quality/SemDeDup entries."""
    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    dim = len(embs.select("embedding").head()["embedding"])

    # replica-overlap guard (r11 advice): with a dense offset (the growth
    # harness passes 10k) a bigger source SF can have max ids >= offset,
    # silently overlapping replica id ranges — duplicate doc_id/vec_id
    # rows that corrupt every growth measurement. Fail loudly instead.
    max_doc = docs.agg(F.max("doc_id")).head()[0]
    max_vec = embs.agg(F.max("vec_id")).head()[0]
    if factor > 1 and (max_doc >= offset or max_vec >= offset):
        raise ValueError(
            f"build_scaled: replica id ranges would overlap — max doc_id "
            f"{max_doc} / max vec_id {max_vec} must be < offset {offset}; "
            f"raise offset (source {src_dir} is too big for this stride)"
        )

    doc_parts = []
    emb_parts = []
    for k in range(factor):
        off = k * offset
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(embs)
            continue
        prefixed = F.array_join(
            F.transform(F.split("text", " "), lambda w: F.concat(F.lit(f"r{k}"), w)),
            " ",
        )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(off)).alias("doc_id"),
                prefixed.alias("text"),
                "lang",
                "source",
                F.length(prefixed).cast("long").alias("n_chars"),
            )
        )
        rot = k % dim
        rotated = F.concat(
            F.slice("embedding", rot + 1, dim - rot), F.slice("embedding", 1, rot)
        )
        if k > 0 and rot == 0:
            # rotation alone is the identity when k is a multiple of dim —
            # flip the sign so no replica duplicates the original vectors
            # (which would inflate near-pair counts and break the
            # linear-growth measurement)
            rotated = F.transform(rotated, lambda x: -x)
        emb_parts.append(
            embs.select(
                (F.col("vec_id") + F.lit(off)).alias("vec_id"),
                rotated.alias("embedding"),
                "label",
            )
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    d.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    e.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of QUERIES/CUSTOM names")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    from datafusion_cyberpolka_eda_spark import get_spark
    from datafusion_cyberpolka_eda_spark.registry import queries

    spark = get_spark(app_name="scale_smoke")
    qs = queries()
    # warm the JVM + python workers once so factor-1 isn't penalized
    qs["l1_dedup_exact"](spark, args.src).collect()

    results: dict[int, dict[str, tuple[float, int]]] = {}
    ndocs: dict[int, int] = {}
    for factor in factors:
        work = tempfile.mkdtemp(prefix=f"scale_{factor}x_")
        try:
            build_scaled(spark, args.src, work, factor)
            ndocs[factor] = spark.read.parquet(
                os.path.join(work, "documents.parquet")
            ).count()
            results[factor] = {}
            runnables = [(n, qs[n]) for n in QUERIES] + list(CUSTOM.items())
            if args.queries:
                keep = set(args.queries.split(","))
                runnables = [(n, f) for n, f in runnables if n in keep]
            for name, fn in runnables:
                best, n = float("inf"), 0
                for _ in range(2):  # best-of-2: damp GC/scheduler noise
                    t0 = time.perf_counter()
                    n = len(fn(spark, work).collect())
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                results[factor][name] = (best, n)
                print(
                    f"  {factor}x {name}: {best:.2f}s, {n} rows", file=sys.stderr
                )
        finally:
            shutil.rmtree(work, ignore_errors=True)

    base = factors[0]
    print(f"\n| query | " + " | ".join(
        f"{f}x sec / rows" for f in factors
    ) + f" | time ratio {factors[-1]}x/{base}x | rows ratio |")
    print("|---|" + "---|" * (len(factors) + 2))
    names = QUERIES + list(CUSTOM)
    if args.queries:
        keep = set(args.queries.split(","))
        names = [n for n in names if n in keep]
    for name in names:
        cells = " | ".join(
            f"{results[f][name][0]:.2f} / {results[f][name][1]}" for f in factors
        )
        t_ratio = results[factors[-1]][name][0] / max(results[base][name][0], 1e-9)
        r0, r1 = results[base][name][1], results[factors[-1]][name][1]
        r_ratio = (r1 / r0) if r0 else float("nan")
        print(f"| {name} | {cells} | {t_ratio:.1f}x | {r_ratio:.1f}x |")
    print(
        f"\nrows: " + ", ".join(f"{f}x = {ndocs[f]} docs" for f in factors)
        + f"; data scale {factors[-1]//base}x -> quadratic would be "
        + f"{(factors[-1]//base)**2}x pairs/time."
    )


if __name__ == "__main__":
    main()
