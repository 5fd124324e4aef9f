"""Multimodal column plumbing (north-star extension, SURVEY.md §2 family
L): image/audio/video payloads travel as opaque `binary` columns alongside a
typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched `mapInPandas` operators.

PPM (P6) decodes FOR REAL — encode_ppm/decode_ppm below are a complete
pure-stdlib netpbm codec, oracle-verified end-to-end by the l9b entry.
Other media codecs (JPEG/ffmpeg/torchaudio) are not in this container, so
those formats keep the deterministic sha256 stub (or NotImplementedError
on the real-codec path); the Spark-side plumbing — schema, partition-
parallel batch iteration, UDF signatures, batch shapes — is identical
either way and fully tested.
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
                # PPM decodes for real (pure-stdlib parser below); every
                # other format still needs codecs this container lacks
                mimes = set(pdf["meta"].map(lambda m: m["mime"] if m else None))
                if mimes - {PPM_MIME}:
                    raise NotImplementedError(
                        "only image/x-portable-pixmap decodes without "
                        "external codecs (PIL/ffmpeg/torchaudio are not "
                        "installed); got " + repr(sorted(mimes - {PPM_MIME}))
                    )
                rows = []
                for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                    w, h, arr = decode_ppm(bytes(payload))
                    flat = arr.reshape(-1).astype("float64") / 255.0
                    head = flat[:8].tolist()
                    head += [0.0] * (8 - len(head))
                    rows.append((aid, w * h * 3, head))
                yield pd.DataFrame(
                    {
                        "asset_id": [r[0] for r in rows],
                        "modality": pdf["modality"],
                        "byte_len": pdf["payload"].map(len).astype("int64"),
                        "checksum": pdf["payload"].map(
                            lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                        ),
                        "feat_dim": [r[1] for r in rows],
                        "feature_head": [r[2] for r in rows],
                    }
                )
                continue
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


# ---- real PPM (P6) codec — pure stdlib, no external media libs ----

PPM_MIME = "image/x-portable-pixmap"


def encode_ppm(width: int, height: int, rgb_bytes: bytes, comment: str = "") -> bytes:
    """Binary PPM (P6) encoder: header (magic, optional comment line,
    dimensions, maxval) + raw interleaved RGB rows. Pure stdlib."""
    if len(rgb_bytes) != width * height * 3:
        raise ValueError("rgb payload length != width*height*3")
    c = f"# {comment}\n" if comment else ""
    return f"P6\n{c}{width} {height}\n255\n".encode("ascii") + rgb_bytes


def decode_ppm(payload: bytes):
    """REAL binary-PPM (P6) decoder, pure stdlib + numpy (r7 verdict
    task 6 — the env-gate is gone for this format): tokenizes the header
    per the netpbm spec (arbitrary whitespace between tokens, '#'
    comment lines anywhere in the header), validates magic/maxval,
    and returns (width, height, uint8 ndarray [height, width, 3]).
    Raises ValueError on malformed or truncated payloads."""
    w, h, arr, _off = decode_ppm_at(payload, 0)
    return w, h, arr


def synth_pixel_expr_doc(doc_id: int, k):
    """The closed-form synthetic pixel generator shared with the DuckDB
    oracle: byte k of doc `doc_id`'s raster is
    (doc_id * 2654435761 + k * 40503) % 256 — a pure function of
    (doc_id, k), so SQL can recompute every pixel with generate_series
    and no decoder. Magnitudes stay far below 2^63."""
    return (doc_id * 2654435761 + k * 40503) % 256


def make_ppm_assets(docs: DataFrame) -> DataFrame:
    """Synthesize a REAL binary PPM payload per document (the testdata
    ships no media): width = 4 + doc_id%5, height = 3 + doc_id%4, raster
    bytes from synth_pixel_expr_doc. The encoder emits a '#' comment
    line so the decoder's comment handling is exercised on every asset.
    Arrow-batched, map-side only; payload stays a binary column in the
    ASSET_SCHEMA convention."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 5, 3 + d % 4
                k = np.arange(w * h * 3, dtype=np.int64)
                v = ((d * 2654435761 + k * 40503) % 256).astype(np.uint8)
                payloads.append(
                    encode_ppm(w, h, v.tobytes(), comment=f"synthetic {d}")
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "modality": "image",
                    "payload": payloads,
                    "mime": PPM_MIME,
                }
            )

    return spread(docs.select("doc_id")).mapInPandas(
        op,
        schema="asset_id long, modality string, payload binary, mime string",
    )


PPM_STATS_SCHEMA = (
    "asset_id long, width bigint, height bigint, n_pix_bytes bigint, "
    "pix_sum bigint, pix_weighted bigint, r_sum bigint, g_sum bigint, "
    "b_sum bigint"
)


def decode_ppm_stats(assets: DataFrame) -> DataFrame:
    """Decode every PPM payload with the REAL parser and emit exact
    integer raster statistics: total/weighted pixel checksums (the
    weighted sum catches any header-offset or byte-order misparse) and
    per-channel sums. All int64 — order-independent, oracle-exact.
    Arrow-batched mapInPandas; at 100 TB this is the decode+stats pass
    of an image-corpus QA job (payloads never shuffle, one Python
    worker per partition, O(batch) memory)."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, arr = decode_ppm(bytes(payload))
                flat = arr.reshape(-1).astype(np.int64)
                k1 = np.arange(1, flat.size + 1, dtype=np.int64)
                ch = arr.reshape(-1, 3).astype(np.int64)
                rows.append(
                    (
                        int(aid), w, h, flat.size,
                        int(flat.sum()), int((k1 * flat).sum()),
                        int(ch[:, 0].sum()), int(ch[:, 1].sum()),
                        int(ch[:, 2].sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_pix_bytes",
                    "pix_sum", "pix_weighted", "r_sum", "g_sum", "b_sum",
                ],
            )

    return spread(assets).mapInPandas(op, schema=PPM_STATS_SCHEMA)


def decode_ppm_at(payload: bytes, offset: int):
    """Decode one P6 image starting at ``offset`` inside a multi-image
    payload; returns (width, height, ndarray, next_offset). This is the
    container-walking primitive frame-sampling needs — decode_ppm is the
    single-image special case."""
    import numpy as np

    view = payload[offset:]
    if view[:2] != b"P6":
        raise ValueError(f"not a binary PPM at offset {offset}")
    i, vals = 2, []
    n = len(view)
    while len(vals) < 3:
        while i < n and view[i : i + 1].isspace():
            i += 1
        if i < n and view[i : i + 1] == b"#":
            while i < n and view[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not view[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(view[i:j]))
        i = j
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval} (8-bit only)")
    i += 1
    data = view[i : i + w * h * 3]
    if len(data) != w * h * 3:
        raise ValueError("truncated PPM raster")
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    return w, h, arr, offset + i + w * h * 3


def make_ppm_video_assets(docs: DataFrame) -> DataFrame:
    """Synthesize a multi-frame 'video' per document: 2 + doc_id%3 PPM
    frames concatenated back-to-back (the simplest real container: each
    frame is a complete self-delimiting P6 image). Frame j's raster byte
    k is (doc_id*2654435761 + j*7919 + k*40503) % 256 — closed-form, so
    the oracle recomputes sampled-frame statistics with no decoder."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, n_frames = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, f = 4 + d % 5, 3 + d % 4, 2 + d % 3
                k = np.arange(w * h * 3, dtype=np.int64)
                frames = []
                for j in range(f):
                    v = (
                        (d * 2654435761 + j * 7919 + k * 40503) % 256
                    ).astype(np.uint8)
                    frames.append(
                        encode_ppm(w, h, v.tobytes(), comment=f"frame {j}")
                    )
                payloads.append(b"".join(frames))
                n_frames.append(f)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "modality": "video",
                    "payload": payloads,
                    "n_frames": n_frames,
                }
            )

    return spread(docs.select("doc_id")).mapInPandas(
        op,
        schema="asset_id long, modality string, payload binary, n_frames int",
    )


FRAME_STATS_SCHEMA = (
    "asset_id long, n_frames bigint, n_sampled bigint, width bigint, "
    "height bigint, sampled_pix_sum bigint, sampled_weighted bigint"
)


def sample_frame_stats(assets: DataFrame, stride: int = 2) -> DataFrame:
    """Frame-sampling over multi-frame binary payloads: walk the
    container with the REAL parser (decode_ppm_at advances a byte
    offset frame by frame), keep every ``stride``-th frame, and emit
    exact int64 raster checksums over the sampled frames only. Note the
    walk DECODES every frame header to find the next offset but only
    accumulates stats for sampled frames — exactly how frame-sampling
    over a real codec works (parse cheap, feature-extract expensive).
    Arrow-batched map-side pass; payloads never shuffle."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                off, j = 0, 0
                n_sampled = pix = wgt = 0
                width = height = 0
                while off < len(b):
                    w, h, arr, off = decode_ppm_at(b, off)
                    width, height = w, h
                    if j % stride == 0:
                        flat = arr.reshape(-1).astype(np.int64)
                        k1 = np.arange(1, flat.size + 1, dtype=np.int64)
                        n_sampled += 1
                        pix += int(flat.sum())
                        wgt += int((k1 * flat).sum())
                    j += 1
                rows.append((int(aid), j, n_sampled, width, height, pix, wgt))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_frames", "n_sampled", "width", "height",
                    "sampled_pix_sum", "sampled_weighted",
                ],
            )

    return spread(assets).mapInPandas(op, schema=FRAME_STATS_SCHEMA)


# ---- real WAV (PCM) codec — stdlib `wave` module, no external libs ----

WAV_MIME = "audio/x-wav"


def encode_wav(samples_int16, framerate: int = 16000) -> bytes:
    """Mono 16-bit PCM WAV encoder via the stdlib `wave` module (a REAL
    RIFF container writer, not a stub)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(np.asarray(samples_int16, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """REAL WAV decoder (stdlib `wave`): parses the RIFF/fmt/data chunks,
    validates mono 16-bit PCM, returns (framerate, int16 ndarray).
    Raises on compressed/multi-channel/other-width payloads."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"expected mono 16-bit PCM, got {w.getnchannels()}ch "
                f"{w.getsampwidth() * 8}-bit"
            )
        n = w.getnframes()
        data = w.readframes(n)
    arr = np.frombuffer(data, dtype="<i2").astype(np.int64)
    if arr.size != n:
        raise ValueError("truncated PCM data chunk")
    return w.getframerate(), arr


def make_wav_assets(docs: DataFrame) -> DataFrame:
    """Synthesize a REAL mono 16-bit PCM WAV per document: 100 + doc_id%50
    samples, sample k = ((doc_id*48271 + k*16807) % 65536) - 32768 — a
    closed form the oracle replays with generate_series, no decoder."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = np.arange(100 + d % 50, dtype=np.int64)
                s = (d * 48271 + k * 16807) % 65536 - 32768
                payloads.append(encode_wav(s))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "modality": "audio",
                    "payload": payloads,
                    "mime": WAV_MIME,
                }
            )

    return spread(docs.select("doc_id")).mapInPandas(
        op,
        schema="asset_id long, modality string, payload binary, mime string",
    )


WAV_STATS_SCHEMA = (
    "asset_id long, framerate bigint, n_samples bigint, sample_sum bigint, "
    "sample_weighted bigint, sample_min bigint, sample_max bigint"
)


def decode_wav_stats(assets: DataFrame) -> DataFrame:
    """Decode every WAV payload with the REAL stdlib parser and emit
    exact int64 PCM statistics (position-weighted sum breaks on any
    chunk-offset or byte-order misparse). Arrow-batched map-side pass."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                fr, s = decode_wav(bytes(payload))
                k1 = np.arange(1, s.size + 1, dtype=np.int64)
                rows.append(
                    (
                        int(aid), fr, s.size, int(s.sum()),
                        int((k1 * s).sum()), int(s.min()), int(s.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "framerate", "n_samples", "sample_sum",
                    "sample_weighted", "sample_min", "sample_max",
                ],
            )

    return spread(assets).mapInPandas(op, schema=WAV_STATS_SCHEMA)


RESIZE_STATS_SCHEMA = (
    "asset_id long, in_w bigint, in_h bigint, out_w bigint, out_h bigint, "
    "out_pix_sum bigint, out_weighted bigint"
)


def resize_ppm_stats(
    assets: DataFrame, out_w: int = 3, out_h: int = 2
) -> DataFrame:
    """Nearest-neighbor image RESIZE over decoded PPM payloads — the
    remaining stubbed verb of the multimodal family (decode /
    feature-extract / resize / frame-sample), now real: decode with the
    real parser, pick source pixel (r*in_h // out_h, c*in_w // out_w)
    for every target cell (pure integer arithmetic — exact, and
    closed-form replayable by the oracle), emit exact int64 checksums of
    the resized raster. Arrow-batched map-side pass; at 100 TB this is
    the thumbnail/normalization stage before vision featurization."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, arr = decode_ppm(bytes(payload))
                rr = (np.arange(out_h, dtype=np.int64) * h) // out_h
                cc = (np.arange(out_w, dtype=np.int64) * w) // out_w
                small = arr[rr][:, cc].astype(np.int64)  # (out_h, out_w, 3)
                flat = small.reshape(-1)
                k1 = np.arange(1, flat.size + 1, dtype=np.int64)
                rows.append(
                    (
                        int(aid), w, h, out_w, out_h,
                        int(flat.sum()), int((k1 * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "in_w", "in_h", "out_w", "out_h",
                    "out_pix_sum", "out_weighted",
                ],
            )

    return spread(assets).mapInPandas(op, schema=RESIZE_STATS_SCHEMA)


# ---- perceptual (average-hash) image fingerprints (r8 verdict task 3) ----

# planted-twin id offsets: far above any doc_id at test scale factors,
# and arithmetic on them recovers the twin kind in both engines
GRAY_TWIN_OFFSET = 1 << 23  # channel-rotated twin: bytes differ, gray equal
PERTURB_TWIN_OFFSET = 1 << 24  # byte-0 perturbed twin: gray differs slightly

N_AHASH_BITS = 63  # signed-long-safe, same convention as text SimHash


def make_ppm_neardup_assets(docs: DataFrame) -> DataFrame:
    """make_ppm_assets plus PLANTED near-duplicate twins, the image
    counterpart of the seeded near-dup pairs the text dedup oracles use:

      - every doc gets its base image (synth_pixel_expr_doc raster);
      - doc_id % 5 == 0 additionally gets a GRAY-PRESERVING twin
        (asset_id = doc_id + GRAY_TWIN_OFFSET): each pixel's channels
        rotated (r,g,b) -> (g,b,r). The payload bytes differ — exact/
        byte-level dedup (l1) misses it — but per-pixel gray r+g+b is
        IDENTICAL, so its average-hash fingerprint equals the base's by
        construction (hamming 0, recall structurally 1.0);
      - doc_id % 5 == 3 additionally gets a PERTURBED twin
        (asset_id = doc_id + PERTURB_TWIN_OFFSET): raster byte 0 bumped
        by +3 mod 256 — a small visual change that flips only the hash
        bits whose sampled pixel or mean-threshold margin it crosses,
        exercising the nonzero-hamming band paths.

    Everything is a pure function of doc_id, so the DuckDB oracle
    replays every pixel, fingerprint, and pair relationally with no
    codec. Map-side only; payloads never shuffle."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if not (0 <= d < GRAY_TWIN_OFFSET):
                    raise ValueError(
                        f"doc_id {d} outside [0, {GRAY_TWIN_OFFSET}): twin "
                        "asset ids (doc_id + 2^23/2^24) would collide with "
                        "other docs' ids and corrupt the kind classification"
                    )
                w, h = 4 + d % 5, 3 + d % 4
                k = np.arange(w * h * 3, dtype=np.int64)
                v = ((d * 2654435761 + k * 40503) % 256).astype(np.uint8)
                ids.append(d)
                payloads.append(encode_ppm(w, h, v.tobytes(), comment=f"synthetic {d}"))
                if d % 5 == 0:
                    twin = np.roll(v.reshape(-1, 3), -1, axis=1).reshape(-1)
                    ids.append(d + GRAY_TWIN_OFFSET)
                    payloads.append(
                        encode_ppm(w, h, twin.tobytes(), comment=f"gray twin {d}")
                    )
                if d % 5 == 3:
                    twin = v.copy()
                    twin[0] = (int(twin[0]) + 3) % 256
                    ids.append(d + PERTURB_TWIN_OFFSET)
                    payloads.append(
                        encode_ppm(w, h, twin.tobytes(), comment=f"perturbed twin {d}")
                    )
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "modality": "image",
                    "payload": payloads,
                    "mime": PPM_MIME,
                }
            )

    return spread(docs.select("doc_id")).mapInPandas(
        op,
        schema="asset_id long, modality string, payload binary, mime string",
    )


def ahash63_fingerprints(assets: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprints over REAL decoded
    rasters — decode_ppm composed with integer-exact hashing, nothing
    float anywhere:

      gray(y, x)  = r + g + b                     (int, 0..765)
      sample k    = gray[(i*h)//8, (j*w)//8]      (nearest-neighbor 8x8
                    grid, i = k//8, j = k%8 — the l9e resize kernel)
      bit k       = 1 iff sample_k * (w*h) > sum(gray)   (integer cross-
                    multiplication: exact "above the mean" with no
                    division, so the DuckDB oracle replays it bit-for-bit)
      fp          = sum(bit_k << k) over k = 0..62 (63 bits, signed-long
                    safe — same convention as the text SimHash)

    Output (id, fp) feeds fingerprint_near_pairs (dedup.py) — the same
    pigeonhole band join that powers text SimHash dedup. Arrow-batched
    mapInPandas; at 100 TB this is one decode+hash map pass (payloads
    never shuffle) and the band join's shuffle carries 16 bytes/row."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, arr = decode_ppm(bytes(payload))
                gray = arr.astype(np.int64).sum(axis=2)  # (h, w)
                total = int(gray.sum())
                n = w * h
                k = np.arange(N_AHASH_BITS, dtype=np.int64)
                py = ((k // 8) * h) // 8
                px = ((k % 8) * w) // 8
                bits = (gray[py, px] * n > total).astype(np.int64)
                fp = int((bits << k).sum())
                rows.append((int(aid), fp))
            yield pd.DataFrame(rows, columns=["id", "fp"])

    return spread(assets).mapInPandas(op, schema="id long, fp long")


# ---- audio energy fingerprints (the l58 pattern on WAV assets) ----

AUDIO_SWAP_TWIN_OFFSET = 1 << 23  # in-frame pair-swapped twin: energy equal
AUDIO_ZERO_TWIN_OFFSET = 1 << 24  # sample-0 zeroed twin: frame-0 energy shifts


def make_wav_neardup_assets(docs: DataFrame) -> DataFrame:
    """make_wav_assets plus PLANTED near-duplicate twins:

      - every doc gets its base WAV (the l9d closed-form samples);
      - doc_id % 3 == 0 additionally gets an ENERGY-PRESERVING twin
        (asset_id = doc_id + AUDIO_SWAP_TWIN_OFFSET): adjacent sample
        pairs (2j, 2j+1) are swapped wherever both land in the same
        fingerprint frame — the payload bytes differ, but every frame's
        energy is IDENTICAL (a permutation within the frame), so its
        energy fingerprint equals the base's by construction;
      - doc_id % 3 == 1 additionally gets a PERTURBED twin
        (asset_id = doc_id + AUDIO_ZERO_TWIN_OFFSET): sample 0 zeroed —
        frame 0's energy (and the global mean) shift, flipping only the
        bits whose margin the shift crosses.

    Pure functions of doc_id end-to-end; the oracle replays every
    sample, frame energy, fingerprint, and pair relationally."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if not (0 <= d < AUDIO_SWAP_TWIN_OFFSET):
                    raise ValueError(
                        f"doc_id {d} outside [0, {AUDIO_SWAP_TWIN_OFFSET}): "
                        "twin asset ids (doc_id + 2^23/2^24) would collide "
                        "with other docs' ids and corrupt the kind "
                        "classification"
                    )
                n = 100 + d % 50
                k = np.arange(n, dtype=np.int64)
                s = (d * 48271 + k * 16807) % 65536 - 32768
                ids.append(d)
                payloads.append(encode_wav(s))
                if d % 3 == 0:
                    partner = k ^ 1  # (2j, 2j+1) mutual partners
                    same_frame = (partner < n) & (
                        (k * 63) // n == (partner * 63) // n
                    )
                    twin = np.where(same_frame, s[np.minimum(partner, n - 1)], s)
                    ids.append(d + AUDIO_SWAP_TWIN_OFFSET)
                    payloads.append(encode_wav(twin))
                if d % 3 == 1:
                    twin = s.copy()
                    twin[0] = 0
                    ids.append(d + AUDIO_ZERO_TWIN_OFFSET)
                    payloads.append(encode_wav(twin))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "modality": "audio",
                    "payload": payloads,
                    "mime": WAV_MIME,
                }
            )

    return spread(docs.select("doc_id")).mapInPandas(
        op,
        schema="asset_id long, modality string, payload binary, mime string",
    )


def wav_energy_fingerprints(assets: DataFrame) -> DataFrame:
    """63-bit audio energy fingerprints over REAL decoded PCM — the
    audio sibling of ahash63_fingerprints, all integer math:

      frame(i) = (i * 63) // n_samples          (63 contiguous frames)
      e_k      = sum of x^2 over frame k        (exact int64)
      bit k    = 1 iff e_k * n > total * len_k  (energy above the mean
                 per-sample energy, cross-multiplied — no division)
      fp       = sum(bit_k << k)

    Output (id, fp) feeds fingerprint_near_pairs — the same pigeonhole
    band join as text SimHash and image aHash. One decode+hash map pass;
    payloads never shuffle."""
    import numpy as np

    from datafusion_cyberpolka_eda_spark.sources.catalog import spread

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _fr, x = decode_wav(bytes(payload))
                n = x.size
                frame = (np.arange(n, dtype=np.int64) * 63) // n
                e = np.zeros(63, dtype=np.int64)
                np.add.at(e, frame, x * x)
                lenk = np.bincount(frame, minlength=63).astype(np.int64)
                total = int(e.sum())
                k = np.arange(63, dtype=np.int64)
                bits = (e * n > total * lenk).astype(np.int64)
                fp = int((bits << k).sum())
                rows.append((int(aid), fp))
            yield pd.DataFrame(rows, columns=["id", "fp"])

    return spread(assets).mapInPandas(op, schema="id long, fp long")
