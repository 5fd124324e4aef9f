"""Sequence packing — greedy binning of documents into token-capped
training sequences (north-star extension, SURVEY.md §2 family L).

Packing is inherently sequential (each placement depends on the running
total), so it cannot be a pure DataFrame expression; the scalable shape is
per-SHARD sequential packing: shard deterministically (key mod — not the
range partitioner, whose sampled boundaries are nondeterministic), then
greedy-pack each shard independently inside one `applyInPandas` call.
Shards pack in parallel across executors; the only cross-row dependency
lives within a shard. That is exactly how production training-data
pipelines pack at scale — global packing order is sacrificed (bin counts
differ from a single-threaded pack by at most one partial bin per shard)
for embarrassing parallelism.

Determinism: shard id and in-shard order are pure key arithmetic, the
greedy rule is exact integer comparison — a SQL engine can replay the
whole thing with a recursive CTE (the l19 oracle does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy_by_shard(
    df: DataFrame,
    id_col: str,
    size_col: str,
    cap: int,
    n_shards: int = 8,
) -> DataFrame:
    """Greedy sequence packing: within each shard (``id % n_shards``),
    walk items in ``id`` order and start a new bin whenever adding the
    next item would exceed ``cap`` tokens — unless the bin is empty (an
    oversized item sits alone in its own bin rather than looping forever).

    Returns one row per (shard, bin): shard, bin_id, n_docs,
    total_tokens, within_cap (true unless the bin is a single oversized
    item). Arrow-batched via applyInPandas; the Python loop is O(rows)
    per shard and runs shard-parallel."""
    import pandas as pd

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        bins: list[int] = []
        run, b = 0, 0
        for t in pdf["_sz"]:
            t = int(t)
            if run > 0 and run + t > cap:
                b += 1
                run = 0
            run += t
            bins.append(b)
        pdf = pdf.assign(bin_id=bins)
        out = (
            pdf.groupby("bin_id", as_index=False)
            .agg(shard=("_shard", "first"), n_docs=("_id", "size"),
                 total_tokens=("_sz", "sum"))
        )
        out["within_cap"] = (out["total_tokens"] <= cap) | (out["n_docs"] == 1)
        return out[["shard", "bin_id", "n_docs", "total_tokens", "within_cap"]]

    prepared = df.select(
        F.col(id_col).alias("_id"),
        F.col(size_col).cast("long").alias("_sz"),
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("_shard"),
    )
    return prepared.groupBy("_shard").applyInPandas(
        _pack,
        schema="shard long, bin_id long, n_docs long, total_tokens long, "
        "within_cap boolean",
    )
