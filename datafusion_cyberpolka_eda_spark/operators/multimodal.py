"""Multimodal column plumbing (north-star extension, SURVEY.md §2 family
L): image/audio/video payloads travel as opaque `binary` columns alongside a
typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched `mapInPandas` operators.

The actual media codecs are NOT available in this container, so the decode
step is stubbed (deterministic fake features, or NotImplementedError for
the real-codec path) — but the Spark-side plumbing is real and tested:
schema, partition-parallel batch iteration, UDF signatures, batch shapes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# payload + typed metadata — the multimodal column convention
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "asset_id long, modality string, byte_len long, checksum string, "
    "feat_dim int, feature_head array<double>"
)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as binary payloads so the
    multimodal path has real data to flow through (the testdata ships no
    media; payload bytes are payload bytes)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+featurizer: derive `dim`
    floats from a sha256 of the payload. Stable across runs/machines."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(assets: DataFrame, real_codecs: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas: per-partition batch iterator, vectorized pandas in/out.
    ``real_codecs=True`` is the production path — unavailable here.

    The input is spread across partitions first: mapInPandas parallelism
    == input partitions, and a one-split local file would otherwise run
    the whole extraction through a single Python worker."""
    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    assets = spread(assets)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_codecs:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg/torchaudio) are not installed in "
                    "this container; the deterministic stub covers the plumbing"
                )
            payloads = pdf["payload"]
            feats = payloads.map(lambda b: _fake_decode_features(bytes(b)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                    ),
                    "feat_dim": [len(f) for f in feats],
                    "feature_head": feats,
                }
            )

    return assets.mapInPandas(op, schema=FEATURE_SCHEMA)
