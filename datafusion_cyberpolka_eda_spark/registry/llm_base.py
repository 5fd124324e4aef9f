"""Shared substrate for the L-family registry modules: data fingerprints (store-memo invalidation keys) and the document gram hashing both the batch and incremental decontamination screens use."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.functions import text as T
from datafusion_cyberpolka_eda_spark.operators import dedup as D
from datafusion_cyberpolka_eda_spark.operators import similarity as SIM
from datafusion_cyberpolka_eda_spark.registry import _round_cols, register, small_df
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table, spread



def _table_fingerprint(sf_dir: str, table: str) -> str:
    """Cheap change detector for a testdata table backing memoized gate
    truth: max mtime (ns) + total byte size over the parquet file or
    directory. Regenerated testdata at the same path changes either."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(path):
            stats = [
                os.stat(os.path.join(r, f))
                for r, _dirs, files in os.walk(path)
                for f in files
            ]
        else:
            stats = [os.stat(path)]
    except OSError:
        return "missing"
    if not stats:
        return "empty"
    return f"{max(s.st_mtime_ns for s in stats)}:{sum(s.st_size for s in stats)}"


def _docs_fingerprint(sf_dir: str) -> str:
    return _table_fingerprint(sf_dir, "documents")


def _doc_gram_hashes(docs: DataFrame, n: int = 5) -> DataFrame:
    """(doc_id, lang, source, h) — one row per word n-gram, h the portable
    60-bit md5 gram hash (functions/hashing) the DuckDB oracles replay.
    Shared by the full-corpus screen (l20) and the incremental screen
    (l32) so both sides hash identically by construction. Explode +
    hash are map-side; no shuffle is introduced here."""
    from datafusion_cyberpolka_eda_spark.functions.hashing import md5_hash64

    d = docs.select(
        "doc_id",
        "lang",
        "source",
        F.split(F.lower(F.col("text")), " ").alias("_toks"),
    )
    gram_expr = (
        f"case when size(_toks) >= {n} then "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> array_join(slice(_toks, i, {n}), ' ')) "
        "else array() end"
    )
    return d.select(
        "doc_id", "lang", "source",
        F.explode(F.expr(gram_expr)).alias("gram"),
    ).select("doc_id", "lang", "source", md5_hash64("gram").alias("h"))
