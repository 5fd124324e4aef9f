"""L-family multimodal entries: PPM/WAV codec demos, perceptual image/audio fingerprint dedup (l58/l61/l62/l63) and the incremental fingerprint stores (l66/l67). Split from llm.py (r10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.functions import text as T
from datafusion_cyberpolka_eda_spark.operators import dedup as D
from datafusion_cyberpolka_eda_spark.operators import similarity as SIM
from datafusion_cyberpolka_eda_spark.registry import _round_cols, register, small_df
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table, spread
from datafusion_cyberpolka_eda_spark.registry.llm_base import (  # noqa: F401
    _docs_fingerprint,
)



_MULTIMODAL_ORACLE = """
    WITH f AS (
      SELECT doc_id,
             strlen(text) AS byte_len,
             substr(sha256(text), 1, 16) AS checksum,
             ('0x' || substr(sha256(text), 1, 8))::BIGINT / 4294967296.0 AS feat0
      FROM documents
    )
    SELECT 'text' AS modality,
           COUNT(*) AS n_assets,
           CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
           CAST(COUNT(DISTINCT checksum) AS BIGINT) AS n_distinct_payloads,
           ROUND(AVG(feat0), 6) AS avg_feat0
    FROM f
"""


@register("l9_multimodal_features", _MULTIMODAL_ORACLE)
def l9_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing: payload bytes + typed metadata
    struct -> Arrow-batched mapInPandas feature extraction (decode step is
    a deterministic stub; codecs aren't in this container). Returns a
    per-modality rollup of the extracted features.

    Oracle-checked: the stub featurizer is sha256-based, and DuckDB's
    sha256 over the same UTF-8 text reproduces byte lengths, checksums,
    and the leading feature value exactly — so the mapInPandas plumbing
    (batch iteration, binary payload transport, schema) is verified
    end-to-end against SQL, not just for stability."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        documents_as_assets,
        extract_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(documents_as_assets(docs))
    return feats.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("byte_len").alias("total_bytes"),
        F.countDistinct("checksum").alias("n_distinct_payloads"),
        F.round(F.avg(F.element_at("feature_head", 1)), 6).alias("avg_feat0"),
    )


# ---- real PPM decode over synthetic binary assets (l9b) ----


@register(
    "l9b_multimodal_ppm_decode",
    """
    WITH d AS (
      SELECT doc_id,
             CAST(4 + doc_id % 5 AS BIGINT) AS w,
             CAST(3 + doc_id % 4 AS BIGINT) AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, k,
             (doc_id * 2654435761 + k * 40503) % 256 AS v
      FROM d,
           LATERAL (SELECT unnest(generate_series(0, w * h * 3 - 1)) AS k) s
    )
    SELECT doc_id AS asset_id,
           MAX(w) AS width,
           MAX(h) AS height,
           COUNT(*) AS n_pix_bytes,
           CAST(SUM(v) AS BIGINT) AS pix_sum,
           CAST(SUM((k + 1) * v) AS BIGINT) AS pix_weighted,
           CAST(SUM(CASE WHEN k % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS r_sum,
           CAST(SUM(CASE WHEN k % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS g_sum,
           CAST(SUM(CASE WHEN k % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS b_sum
    FROM px GROUP BY doc_id
    """,
)
def l9b_multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, stdlib-only (r7 verdict task 6 — the
    NotImplementedError env-gate is gone for this format): every document
    gets a genuine binary PPM (P6) payload synthesized from a closed-form
    pixel generator (byte k = (doc_id*2654435761 + k*40503) % 256, with a
    '#' comment line in every header), and the REAL netpbm parser
    (operators/multimodal.decode_ppm: whitespace/comment tokenizer, magic
    + maxval validation, raster bounds check) decodes it back to pixels.
    The emitted per-asset statistics are exact int64 raster checksums —
    the position-weighted sum breaks on ANY header-offset, byte-order, or
    dimension misparse — and the DuckDB oracle recomputes them straight
    from the generator's closed form with generate_series, no decoder:
    encoder -> parser -> stats is verified end-to-end, value-exact.

    Scale shape: encode and decode are both Arrow-batched map-side passes
    (payloads never shuffle); the stats output is one row per asset. At
    100 TB this is the decode+QA pass of an image corpus, with PPM
    standing in for JPEG et al. (same plumbing; codec swaps in).
    Ref parity: north-star multimodal extension (SURVEY §2 L)."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        decode_ppm_stats,
        make_ppm_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_ppm_stats(make_ppm_assets(docs))


# ---- frame-sampled video decode (l9c) ----


@register(
    "l9c_multimodal_frame_sample",
    """
    WITH d AS (
      SELECT doc_id,
             CAST(4 + doc_id % 5 AS BIGINT) AS w,
             CAST(3 + doc_id % 4 AS BIGINT) AS h,
             CAST(2 + doc_id % 3 AS BIGINT) AS f
      FROM documents
    ),
    fr AS (
      SELECT doc_id, w, h, f, j
      FROM d, LATERAL (SELECT unnest(generate_series(0, f - 1)) AS j) s
    ),
    px AS (
      SELECT doc_id, w, h, f, j, k,
             (doc_id * 2654435761 + j * 7919 + k * 40503) % 256 AS v
      FROM fr,
           LATERAL (SELECT unnest(generate_series(0, w * h * 3 - 1)) AS k) s
      WHERE j % 2 = 0
    )
    SELECT doc_id AS asset_id,
           MAX(f) AS n_frames,
           COUNT(DISTINCT j) AS n_sampled,
           MAX(w) AS width,
           MAX(h) AS height,
           CAST(SUM(v) AS BIGINT) AS sampled_pix_sum,
           CAST(SUM((k + 1) * v) AS BIGINT) AS sampled_weighted
    FROM px GROUP BY doc_id
    """,
)
def l9c_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over multi-frame binary assets — the video half of
    the multimodal family, done with the REAL parser: every document gets
    a genuine multi-image container (2 + doc_id%3 complete P6 frames
    concatenated; each frame self-delimiting), and sample_frame_stats
    WALKS the container byte-exactly (decode_ppm_at advances the offset
    frame by frame), keeps every 2nd frame, and emits exact int64 raster
    checksums over the sampled frames only — parse-every / featurize-some,
    the actual shape of video frame-sampling over real codecs. The DuckDB
    oracle recomputes the sampled statistics straight from the closed-form
    generator (two nested generate_series, j % 2 = 0), so the container
    walk, frame boundaries, and stride selection are all value-checked.

    Scale shape: one Arrow-batched map-side pass, payloads never shuffle,
    per-asset state is O(frame). Ref parity: north-star multimodal
    extension (SURVEY §2 L; frame-sample was the listed stub)."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        make_ppm_video_assets,
        sample_frame_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = sample_frame_stats(make_ppm_video_assets(docs), stride=2)
    return stats.select(
        "asset_id", "n_frames", "n_sampled", "width", "height",
        "sampled_pix_sum", "sampled_weighted",
    )


# ---- real WAV decode (l9d) and nearest-neighbor resize (l9e) ----


@register(
    "l9d_multimodal_wav_decode",
    """
    WITH d AS (
      SELECT doc_id, CAST(100 + doc_id % 50 AS BIGINT) AS n FROM documents
    ),
    sm AS (
      SELECT doc_id, n, k,
             (doc_id * 48271 + k * 16807) % 65536 - 32768 AS s
      FROM d, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS k) t
    )
    SELECT doc_id AS asset_id,
           CAST(16000 AS BIGINT) AS framerate,
           COUNT(*) AS n_samples,
           CAST(SUM(s) AS BIGINT) AS sample_sum,
           CAST(SUM((k + 1) * s) AS BIGINT) AS sample_weighted,
           CAST(MIN(s) AS BIGINT) AS sample_min,
           CAST(MAX(s) AS BIGINT) AS sample_max
    FROM sm GROUP BY doc_id
    """,
)
def l9d_multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode — the stdlib `wave` module is a genuine RIFF
    container codec, so the audio modality needs no stub at all: every
    document gets a real mono 16-bit PCM WAV (100 + doc_id%50 samples
    from the closed form ((doc_id*48271 + k*16807) % 65536) - 32768),
    and decode_wav parses the RIFF/fmt/data chunks back, validating
    channel count and sample width. The emitted exact int64 PCM
    statistics (position-weighted sum breaks on any chunk-offset or
    byte-order misparse; min/max pin the value range incl. negatives)
    are recomputed by the DuckDB oracle straight from the generator —
    encoder -> RIFF parser -> stats verified value-exact.

    Scale shape: encode and decode are Arrow-batched map-side passes;
    payloads never shuffle. With PPM (l9b), multi-frame containers
    (l9c), and WAV here, all three listed media modalities decode for
    real. Ref parity: north-star multimodal extension (SURVEY §2 L)."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        decode_wav_stats,
        make_wav_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_wav_stats(make_wav_assets(docs))


@register(
    "l9e_multimodal_resize",
    """
    WITH d AS (
      SELECT doc_id,
             CAST(4 + doc_id % 5 AS BIGINT) AS w,
             CAST(3 + doc_id % 4 AS BIGINT) AS h
      FROM documents
    ),
    cell AS (
      SELECT doc_id, w, h, r, c, ch,
             ((r * h // 2) * w + (c * w // 3)) * 3 + ch AS k
      FROM d,
           LATERAL (SELECT unnest(generate_series(0, 1)) AS r) t1,
           LATERAL (SELECT unnest(generate_series(0, 2)) AS c) t2,
           LATERAL (SELECT unnest(generate_series(0, 2)) AS ch) t3
    ),
    px AS (
      SELECT doc_id, w, h, r, c, ch,
             (doc_id * 2654435761 + k * 40503) % 256 AS v
      FROM cell
    )
    SELECT doc_id AS asset_id,
           MAX(w) AS in_w, MAX(h) AS in_h,
           CAST(3 AS BIGINT) AS out_w, CAST(2 AS BIGINT) AS out_h,
           CAST(SUM(v) AS BIGINT) AS out_pix_sum,
           CAST(SUM(((r * 3 + c) * 3 + ch + 1) * v) AS BIGINT)
             AS out_weighted
    FROM px GROUP BY doc_id
    """,
)
def l9e_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE — the last verb of the multimodal family (decode /
    feature-extract / resize / frame-sample) made real: decode each
    synthetic PPM with the real parser, nearest-neighbor downscale to
    3x2 (source pixel (r*in_h // out_h, c*in_w // out_w) — pure integer
    arithmetic, so the resampling grid is EXACT and the DuckDB oracle
    replays it in closed form: target cell -> source raster index k ->
    generator byte), and emit exact int64 checksums of the resized
    raster (the position-weighted sum breaks on any grid-mapping or
    channel-order error).

    Scale shape: one Arrow-batched map-side pass (decode + fancy-index
    slice per image — the thumbnail/normalization stage before vision
    featurization at 100 TB); payloads never shuffle. Ref parity:
    north-star multimodal extension (SURVEY §2 L)."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        make_ppm_assets,
        resize_ppm_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return resize_ppm_stats(make_ppm_assets(docs), out_w=3, out_h=2)


# ---- perceptual image near-dup dedup (l58, r8 verdict task 3) ----

# shared CTE body: closed-form pixels -> integer aHash fingerprints for
# the base+twins asset family; used by l58 (pairs) and l61 (pipeline)
_L58_CTES = """d AS (
      SELECT doc_id AS src, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents
    ),
    -- base image per doc + planted twins: gray-preserving channel
    -- rotation (variant 1 — per-pixel r+g+b is unchanged, so its gray
    -- below is the SAME expression as the base's) and a byte-0 +3%256
    -- perturbation (variant 2 — pixel 0's gray shifts by the wrapped
    -- delta). Offsets 2^23 / 2^24 match the Spark constants.
    a AS (
      SELECT src, src AS aid, w, h, 0 AS variant FROM d
      UNION ALL
      SELECT src, src + 8388608, w, h, 1 FROM d WHERE src % 5 = 0
      UNION ALL
      SELECT src, src + 16777216, w, h, 2 FROM d WHERE src % 5 = 3
    ),
    px AS (
      SELECT a.aid, p.i AS pidx,
             ((a.src * 2654435761 + (p.i * 3 + 0) * 40503) % 256)
             + ((a.src * 2654435761 + (p.i * 3 + 1) * 40503) % 256)
             + ((a.src * 2654435761 + (p.i * 3 + 2) * 40503) % 256)
             + CASE WHEN a.variant = 2 AND p.i = 0
                    THEN ((a.src * 2654435761) % 256 + 3) % 256
                         - (a.src * 2654435761) % 256
                    ELSE 0 END AS gray
      FROM a, LATERAL (
        SELECT unnest(generate_series(0, a.w * a.h - 1)) AS i
      ) p
    ),
    tot AS (SELECT aid, SUM(gray) AS total, COUNT(*) AS n FROM px GROUP BY aid),
    -- aHash bit k: nearest-neighbor 8x8 sample vs the integer mean,
    -- as a cross-multiplication (sample * n_pix > total) — no division
    bits AS (
      SELECT a.aid, ks.k,
             CASE WHEN g.gray * t.n > t.total THEN 1 ELSE 0 END AS bit
      FROM a
      JOIN tot t ON t.aid = a.aid,
      LATERAL (SELECT unnest(generate_series(0, 62)) AS k) ks
      JOIN px g ON g.aid = a.aid
        AND g.pidx = (((ks.k // 8) * a.h) // 8) * a.w + (((ks.k % 8) * a.w) // 8)
    ),
    fp AS (
      SELECT aid, SUM(bit * (CAST(1 AS BIGINT) << k)) AS fp
      FROM bits GROUP BY aid
    )"""

_L58_ORACLE = (
    "WITH "
    + _L58_CTES
    + """
    SELECT pa.aid AS id_a, pb.aid AS id_b,
           CAST(bit_count(xor(pa.fp, pb.fp)) AS BIGINT) AS hamming,
           CASE WHEN pb.aid - pa.aid = 8388608 THEN 'planted_gray'
                WHEN pb.aid - pa.aid = 16777216 THEN 'planted_perturbed'
                ELSE 'organic' END AS kind
    FROM fp pa JOIN fp pb ON pa.aid < pb.aid
    WHERE bit_count(xor(pa.fp, pb.fp)) <= 3
"""
)


@register("l58_image_phash_neardup", _L58_ORACLE)
def l58_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL image near-dup dedup (r8 verdict task 3): the r8 real
    PPM decoder composed with the banded-hamming machinery that powers
    text SimHash dedup — the first thing an image-corpus pipeline needs
    after decode. Pipeline: synthesize per-doc images + PLANTED twins
    (gray-preserving channel rotation = byte-different but perceptually
    identical, hamming 0 by construction; byte-0 perturbation =
    slightly-different raster exercising nonzero hamming), decode every
    payload with the REAL netpbm parser, average-hash each raster with
    integer-exact math (8x8 nearest-neighbor sample vs the integer mean
    via cross-multiplication — no float anywhere), then find all pairs
    within hamming <= 3 via the pigeonhole band join
    (fingerprint_near_pairs — 4 bands over 63 bits, never O(n^2)).

    The oracle replays pixels, fingerprints, and pairs relationally from
    the closed-form generator (the l9b pattern) and brute-forces the
    pair join — exactness gate AND completeness gate in one: the banded
    Spark plan must find every pair the exhaustive oracle finds. Planted
    gray twins are recall-guaranteed structurally (their fingerprints
    are equal by construction, not by luck), avoiding the data-pinned
    recall-boolean trap flagged on l8h.

    Scale shape: decode+hash is one map pass (payloads never shuffle);
    the band join shuffles 16-byte fingerprint rows; verification is
    map-side bit_count(xor) before any distinct. 100 TB-safe.
    Ref parity: SURVEY §2 L multimodal + dedup families."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        GRAY_TWIN_OFFSET,
        N_AHASH_BITS,
        PERTURB_TWIN_OFFSET,
        ahash63_fingerprints,
        make_ppm_neardup_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    assets = make_ppm_neardup_assets(docs)
    fps = ahash63_fingerprints(assets).localCheckpoint(eager=True)
    pairs = D.fingerprint_near_pairs(fps, max_hamming=3, n_bits=N_AHASH_BITS)
    delta = F.col("id_b") - F.col("id_a")
    return pairs.select(
        "id_a",
        "id_b",
        F.col("hamming").cast("bigint").alias("hamming"),
        F.when(delta == GRAY_TWIN_OFFSET, "planted_gray")
        .when(delta == PERTURB_TWIN_OFFSET, "planted_perturbed")
        .otherwise("organic")
        .alias("kind"),
    )


# ---- image dedup pipeline end-to-end (l61) ----

_L61_ORACLE = (
    "WITH RECURSIVE "
    + _L58_CTES
    + """,
    pairs AS (
      SELECT pa.aid AS id_a, pb.aid AS id_b
      FROM fp pa JOIN fp pb ON pa.aid < pb.aid
      WHERE bit_count(xor(pa.fp, pb.fp)) <= 3
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id
    ),
    comp AS (SELECT id AS asset_id, MIN(r) AS canonical_id FROM reach
             GROUP BY id)
    SELECT c.asset_id, c.canonical_id, cs.cluster_size,
           c.asset_id = c.canonical_id AS is_survivor
    FROM comp c
    JOIN (SELECT canonical_id, COUNT(*) AS cluster_size
          FROM comp GROUP BY canonical_id) cs USING (canonical_id)
    """
)


@register("l61_image_dedup_pipeline", _L61_ORACLE)
def l61_image_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END perceptual image dedup — the image counterpart of the
    text pipeline (l23): decode -> aHash fingerprints -> banded hamming
    pairs (l58's stages) -> HashMin connected components -> survivor
    pick (min asset_id per cluster). This is the job an image-corpus
    curation pipeline actually runs: the output maps every clustered
    asset to its canonical survivor, ready for an anti-join drop of the
    non-survivors. The oracle replays fingerprints closed-form,
    brute-forces the pair scan, and resolves the transitive closure with
    a recursive CTE — the iterative Spark component loop is hash-checked
    end-to-end, not rows-only (the l11 discipline).

    Scale shape: decode+hash map pass, band join on 16-byte rows,
    HashMin label propagation = iterative join+groupBy-min with lineage
    cuts (no driver-side graph); survivor pick is one aggregate. Cluster
    sizes here are small (twins + organic near-dups), the HashMin
    worst case (a giant component) is bounded by max_iter with the
    same skew notes as l11. Ref parity: SURVEY §2 L dedup family."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        N_AHASH_BITS,
        ahash63_fingerprints,
        make_ppm_neardup_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    fps = ahash63_fingerprints(make_ppm_neardup_assets(docs)).localCheckpoint(
        eager=True
    )
    pairs = D.fingerprint_near_pairs(fps, max_hamming=3, n_bits=N_AHASH_BITS)
    comps = D.connected_components(pairs, "id_a", "id_b")
    sizes = comps.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comps.select(
            F.col("id").alias("asset_id"), F.col("comp").alias("canonical_id")
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("comp", "canonical_id")),
            "canonical_id",
        )
        .select(
            "asset_id",
            "canonical_id",
            "cluster_size",
            (F.col("asset_id") == F.col("canonical_id")).alias("is_survivor"),
        )
    )


# ---- audio energy-fingerprint near-dup (l62) ----

# shared CTE body: closed-form PCM samples -> integer frame-energy
# fingerprints for the base+twins asset family; used by l62 (pairs)
# and l63 (pipeline) — the _L58_CTES convention for audio
_L62_CTES = """d AS (SELECT doc_id AS src, 100 + doc_id % 50 AS n FROM documents),
    a AS (
      SELECT src, src AS aid, n, 0 AS variant FROM d
      UNION ALL
      SELECT src, src + 8388608, n, 1 FROM d WHERE src % 3 = 0
      UNION ALL
      SELECT src, src + 16777216, n, 2 FROM d WHERE src % 3 = 1
    ),
    -- sample i of each asset: base closed form; variant 1 swaps the
    -- (2j, 2j+1) partner wherever both land in the same frame (an
    -- energy-preserving permutation); variant 2 zeroes sample 0
    s AS (
      SELECT a.aid, a.n, p.i,
        CASE
          WHEN a.variant = 2 AND p.i = 0 THEN 0
          WHEN a.variant = 1
               AND (CASE WHEN p.i % 2 = 0 THEN p.i + 1 ELSE p.i - 1 END) < a.n
               AND ((p.i * 63) // a.n) =
                   (((CASE WHEN p.i % 2 = 0 THEN p.i + 1 ELSE p.i - 1 END)
                     * 63) // a.n)
          THEN ((a.src * 48271
                 + (CASE WHEN p.i % 2 = 0 THEN p.i + 1 ELSE p.i - 1 END)
                   * 16807) % 65536) - 32768
          ELSE ((a.src * 48271 + p.i * 16807) % 65536) - 32768
        END AS x
      FROM a, LATERAL (SELECT unnest(generate_series(0, a.n - 1)) AS i) p
    ),
    f AS (SELECT aid, (i * 63) // n AS k, SUM(x * x) AS e, COUNT(*) AS c
          FROM s GROUP BY aid, (i * 63) // n),
    t AS (SELECT aid, SUM(e) AS total, SUM(c) AS n FROM f GROUP BY aid),
    bits AS (
      SELECT f.aid, f.k,
             CASE WHEN f.e * t.n > t.total * f.c THEN 1 ELSE 0 END AS bit
      FROM f JOIN t USING (aid)
    ),
    fp AS (
      SELECT aid, SUM(bit * (CAST(1 AS BIGINT) << k)) AS fp
      FROM bits GROUP BY aid
    )"""

_L62_ORACLE = (
    "WITH "
    + _L62_CTES
    + """
    SELECT pa.aid AS id_a, pb.aid AS id_b,
           CAST(bit_count(xor(pa.fp, pb.fp)) AS BIGINT) AS hamming,
           CASE WHEN pb.aid - pa.aid = 8388608 THEN 'planted_swap'
                WHEN pb.aid - pa.aid = 16777216 THEN 'planted_zeroed'
                ELSE 'organic' END AS kind
    FROM fp pa JOIN fp pb ON pa.aid < pb.aid
    WHERE bit_count(xor(pa.fp, pb.fp)) <= 3
"""
)


@register("l62_audio_fingerprint_neardup", _L62_ORACLE)
def l62_audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL audio near-dup dedup — the WAV sibling of l58: decode
    every payload with the REAL stdlib RIFF parser, fingerprint each
    clip with 63 integer frame-energy bits (energy above the per-sample
    mean, cross-multiplied — no float anywhere), and find all pairs
    within hamming <= 3 through the shared pigeonhole band join.
    Planted energy-preserving twins (in-frame sample-pair swaps) are
    byte-different but fingerprint-equal BY CONSTRUCTION — the
    structural-recall discipline from l58 — and zeroed-sample twins
    exercise the nonzero-hamming paths. The oracle replays samples,
    frame energies, fingerprints, and an exhaustive pair scan from the
    closed-form generator: the banded plan is checked for completeness
    as well as exactness.

    Scale shape: identical to l58 — one decode+hash map pass, a
    16-byte-row band join, map-side xor verification. With image
    (l58), audio (l62), and text (l4b) all feeding
    fingerprint_near_pairs, one banding engine serves every modality.
    Ref parity: SURVEY §2 L multimodal + dedup families."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        AUDIO_SWAP_TWIN_OFFSET,
        AUDIO_ZERO_TWIN_OFFSET,
        make_wav_neardup_assets,
        wav_energy_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    fps = wav_energy_fingerprints(make_wav_neardup_assets(docs)).localCheckpoint(
        eager=True
    )
    pairs = D.fingerprint_near_pairs(fps, max_hamming=3, n_bits=63)
    delta = F.col("id_b") - F.col("id_a")
    return pairs.select(
        "id_a",
        "id_b",
        F.col("hamming").cast("bigint").alias("hamming"),
        F.when(delta == AUDIO_SWAP_TWIN_OFFSET, "planted_swap")
        .when(delta == AUDIO_ZERO_TWIN_OFFSET, "planted_zeroed")
        .otherwise("organic")
        .alias("kind"),
    )


# ---- audio dedup pipeline end-to-end (l63, r9 verdict task 4a) ----

_L63_ORACLE = (
    "WITH RECURSIVE "
    + _L62_CTES
    + """,
    pairs AS (
      SELECT pa.aid AS id_a, pb.aid AS id_b
      FROM fp pa JOIN fp pb ON pa.aid < pb.aid
      WHERE bit_count(xor(pa.fp, pb.fp)) <= 3
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id
    ),
    comp AS (SELECT id AS asset_id, MIN(r) AS canonical_id FROM reach
             GROUP BY id)
    SELECT c.asset_id, c.canonical_id, cs.cluster_size,
           c.asset_id = c.canonical_id AS is_survivor
    FROM comp c
    JOIN (SELECT canonical_id, COUNT(*) AS cluster_size
          FROM comp GROUP BY canonical_id) cs USING (canonical_id)
    """
)


@register("l63_audio_dedup_pipeline", _L63_ORACLE)
def l63_audio_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END audio dedup — the WAV counterpart of the image
    pipeline (l61) and the text pipeline (l23): decode -> frame-energy
    fingerprints -> banded hamming pairs (l62's stages) -> HashMin
    connected components -> survivor pick (min asset_id per cluster).
    Output maps every clustered clip to its canonical survivor, ready
    for an anti-join drop of the non-survivors. The oracle replays
    samples/fingerprints closed-form, brute-forces the pair scan, and
    resolves the transitive closure with a recursive CTE — the
    iterative Spark component loop is hash-checked end-to-end (the
    l61/l11 discipline).

    Scale shape: identical to l61 — decode+hash map pass (payloads
    never shuffle), band join on 16-byte rows, HashMin label
    propagation with lineage cuts, one aggregate for the survivor
    pick. With l23 (text), l61 (image), and this entry, every modality
    has the same three-stage dedup pipeline on the one shared banding
    engine. Ref parity: SURVEY §2 L dedup + multimodal families."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        make_wav_neardup_assets,
        wav_energy_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    fps = wav_energy_fingerprints(make_wav_neardup_assets(docs)).localCheckpoint(
        eager=True
    )
    pairs = D.fingerprint_near_pairs(fps, max_hamming=3, n_bits=63)
    comps = D.connected_components(pairs, "id_a", "id_b")
    sizes = comps.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comps.select(
            F.col("id").alias("asset_id"), F.col("comp").alias("canonical_id")
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("comp", "canonical_id")),
            "canonical_id",
        )
        .select(
            "asset_id",
            "canonical_id",
            "cluster_size",
            (F.col("asset_id") == F.col("canonical_id")).alias("is_survivor"),
        )
    )


# ---- cross-modal paired-document dedup (l78, r11 verdict task 3) ----


def _l78_edges_ctes() -> str:
    """Shared closed-form replay of BOTH cross-modal edge generators:
    the paired corpus (docs2 — base + gray + perturbed twins), the
    portable banded-MinHash caption pairs (mh_pairs), the l58 aHash
    image pairs (ipairs), and their tagged union (alledges). Composed
    by l78 (full-corpus CC report), l78b (incremental >= 1-new pairs)
    and l78c (day-1 takedown) so the three lifecycle entries replay ONE
    edge definition."""
    from datafusion_cyberpolka_eda_spark.operators.dedup import (
        minhash_banded_portable_oracle_ctes,
    )

    mh = minhash_banded_portable_oracle_ctes(doc_rel="docs2")
    return (
        """docs2 AS MATERIALIZED (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 8388608, 'imgtwin', source FROM documents
      WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 16777216, text, source FROM documents
      WHERE doc_id % 5 = 3
    ),
    """
        + mh
        + ",\n    "
        + _L58_CTES
        + """,
    ipairs AS (
      SELECT pa.aid AS id_a, pb.aid AS id_b
      FROM fp pa JOIN fp pb ON pa.aid < pb.aid
      WHERE bit_count(xor(pa.fp, pb.fp)) <= 3
    ),
    alledges AS MATERIALIZED (
      SELECT COALESCE(t.id_a, i.id_a) AS id_a,
             COALESCE(t.id_b, i.id_b) AS id_b,
             t.id_a IS NOT NULL AS is_text,
             i.id_a IS NOT NULL AS is_image
      FROM mh_pairs t FULL OUTER JOIN ipairs i
        ON t.id_a = i.id_a AND t.id_b = i.id_b
    )"""
    )


def _l78_oracle() -> str:
    return (
        "\n    WITH RECURSIVE "
        + _l78_edges_ctes()
        + """,
    und AS (SELECT id_a AS a, id_b AS b FROM alledges
            UNION SELECT id_b, id_a FROM alledges),
    reach(id, r) AS (
      SELECT a, a FROM und
      UNION
      SELECT e.b, r.r FROM reach r JOIN und e ON e.a = r.id
    ),
    comp AS (SELECT id, MIN(r) AS cmp FROM reach GROUP BY id),
    removed AS (SELECT id FROM comp WHERE id != cmp),
    nd AS (SELECT source, COUNT(*) AS n_docs FROM docs2 GROUP BY source),
    nr AS (SELECT d.source, COUNT(*) AS n_removed
           FROM removed r JOIN docs2 d ON d.doc_id = r.id
           GROUP BY d.source),
    pe AS (
      SELECT d.source,
             SUM(CASE WHEN e.is_text AND NOT e.is_image THEN 1 ELSE 0 END)
               AS n_pairs_text_only,
             SUM(CASE WHEN e.is_image AND NOT e.is_text THEN 1 ELSE 0 END)
               AS n_pairs_image_only,
             SUM(CASE WHEN e.is_text AND e.is_image THEN 1 ELSE 0 END)
               AS n_pairs_both
      FROM alledges e
      JOIN documents d ON d.doc_id =
        CASE WHEN e.id_a >= 16777216 THEN e.id_a - 16777216
             WHEN e.id_a >= 8388608 THEN e.id_a - 8388608
             ELSE e.id_a END
      GROUP BY d.source
    )
    SELECT nd.source,
           CAST(nd.n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(nr.n_removed, 0) AS BIGINT) AS n_removed,
           CAST(COALESCE(pe.n_pairs_text_only, 0) AS BIGINT)
             AS n_pairs_text_only,
           CAST(COALESCE(pe.n_pairs_image_only, 0) AS BIGINT)
             AS n_pairs_image_only,
           CAST(COALESCE(pe.n_pairs_both, 0) AS BIGINT) AS n_pairs_both
    FROM nd LEFT JOIN nr ON nr.source = nd.source
            LEFT JOIN pe ON pe.source = nd.source
    """
    )


def _paired_corpus(docs: DataFrame) -> DataFrame:
    """The l78 paired-document corpus over ``docs``: every base doc plus
    its planted twins — gray (doc_id % 5 == 0, +2^23: rotated image,
    1-token caption) and perturbed (doc_id % 5 == 3, +2^24: perturbed
    image, verbatim caption). Twin ids line up with the asset ids
    make_ppm_neardup_assets emits, so one id = one (text, image) pair.
    Shared by l78 (full corpus) and the l78b/l78c stores (day slices)."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        GRAY_TWIN_OFFSET,
        PERTURB_TWIN_OFFSET,
    )

    base = docs.select("doc_id", "text", "source")
    gray = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(GRAY_TWIN_OFFSET)).alias("doc_id"),
        F.lit("imgtwin").alias("text"),
        "source",
    )
    pert = docs.filter(F.col("doc_id") % 5 == 3).select(
        (F.col("doc_id") + F.lit(PERTURB_TWIN_OFFSET)).alias("doc_id"),
        "text",
        "source",
    )
    return base.unionByName(gray).unionByName(pert)


@register("l78_crossmodal_dedup", _l78_oracle())
def l78_crossmodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-MODAL paired-document dedup — the LAION shape (r11 verdict
    task 3), the one dedup composition the modality matrix lacked: each
    document is a (text, image) PAIR, and two documents are duplicates
    if their TEXTS are near-dups OR their IMAGES are near-dups; the
    edge union feeds one connected-components pass and a min-id
    survivor rule.

    Corpus: every document carries its text and its closed-form PPM
    image (the l58 asset family), plus two planted twin kinds that
    make each modality's contribution structural, not lucky:
      - gray twins (doc_id % 5 == 0, +2^23): channel-rotated image
        (fingerprint EQUAL by construction) + a 1-token caption (no
        3-gram, so no MinHash signature) -> reachable ONLY through the
        image edge ("same picture, new caption");
      - perturbed twins (doc_id % 5 == 3, +2^24): byte-0-perturbed
        image (hamming may exceed the band radius) + the base caption
        VERBATIM (identical signature, structural band collision) ->
        guaranteed reachable through the text edge ("re-encoded
        picture, same caption").

    Edges: portable banded MinHash pairs over the paired captions
    (l3c's fully-replayable recipe, now over the extended corpus) UNION
    aHash banded-hamming pairs over the images (l58's recipe); a full
    outer join tags each edge text-only / image-only / both. Components
    are the iterative HashMin loop; the report rolls up PER SOURCE how
    many paired docs were removed and which modality the edges came
    from — what a LAION-scale curation run reports to its operators.

    The oracle replays BOTH edge generators closed-form (MinHash
    signatures/bands/estimates; pixels/fingerprints/hamming) and
    resolves the closure with a recursive CTE (the l61/l63 discipline)
    — every count here is hash-checked end-to-end.

    Scale shape: both edge generators are banded equi-joins (audited:
    no all-pairs anywhere); the union is a pair-keyed full outer join;
    components are the bounded HashMin rounds with lineage cuts; the
    rollup is one aggregate. Ref parity: SURVEY §2 L dedup +
    multimodal families; Schuhmann et al. 2021 (LAION) for the shape.
    Ref anchor: registry l3c/l58/l61/l63, operators/dedup.py
    connected_components."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        GRAY_TWIN_OFFSET,
        N_AHASH_BITS,
        PERTURB_TWIN_OFFSET,
        ahash63_fingerprints,
        make_ppm_neardup_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = _paired_corpus(docs).localCheckpoint(eager=False)  # sig build materializes it
    tpairs = D.minhash_banded_pairs_portable(
        corpus, "doc_id", "text", n=3, num_hashes=32, bands=8,
        est_threshold=0.45,
    ).select("id_a", "id_b", F.lit(True).alias("is_text"))
    fps = ahash63_fingerprints(make_ppm_neardup_assets(docs)).localCheckpoint(
        eager=True
    )
    ipairs = D.fingerprint_near_pairs(
        fps, max_hamming=3, n_bits=N_AHASH_BITS
    ).select("id_a", "id_b", F.lit(True).alias("is_image"))
    edges = (
        tpairs.join(ipairs, ["id_a", "id_b"], "full_outer")
        .select(
            "id_a",
            "id_b",
            F.coalesce("is_text", F.lit(False)).alias("is_text"),
            F.coalesce("is_image", F.lit(False)).alias("is_image"),
        )
        .localCheckpoint(eager=False)  # CC's first convergence job materializes it
    )
    comps = D.connected_components(
        edges.select("id_a", "id_b"), "id_a", "id_b"
    )
    removed = comps.filter(F.col("id") != F.col("comp")).select("id")
    nd = corpus.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    nr = (
        removed.join(corpus.select(F.col("doc_id").alias("id"), "source"), "id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_removed"))
    )
    base_of = (
        F.when(
            F.col("id_a") >= PERTURB_TWIN_OFFSET,
            F.col("id_a") - PERTURB_TWIN_OFFSET,
        )
        .when(
            F.col("id_a") >= GRAY_TWIN_OFFSET,
            F.col("id_a") - GRAY_TWIN_OFFSET,
        )
        .otherwise(F.col("id_a"))
    )
    pe = (
        edges.withColumn("base_id", base_of)
        .join(
            docs.select(F.col("doc_id").alias("base_id"), "source"),
            "base_id",
        )
        .groupBy("source")
        .agg(
            F.sum((F.col("is_text") & ~F.col("is_image")).cast("int"))
            .cast("bigint")
            .alias("n_pairs_text_only"),
            F.sum((F.col("is_image") & ~F.col("is_text")).cast("int"))
            .cast("bigint")
            .alias("n_pairs_image_only"),
            F.sum((F.col("is_text") & F.col("is_image")).cast("int"))
            .cast("bigint")
            .alias("n_pairs_both"),
        )
    )
    return (
        nd.join(nr, "source", "left")
        .join(pe, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias("n_removed"),
            F.coalesce("n_pairs_text_only", F.lit(0))
            .cast("bigint")
            .alias("n_pairs_text_only"),
            F.coalesce("n_pairs_image_only", F.lit(0))
            .cast("bigint")
            .alias("n_pairs_image_only"),
            F.coalesce("n_pairs_both", F.lit(0))
            .cast("bigint")
            .alias("n_pairs_both"),
        )
    )


# ---- incremental multimodal fingerprint stores (l66/l67, r9 verdict
# task 3): the l31 persisted-store pattern over the l58/l62
# fingerprints. (session, sf_dir, modality, data fingerprint) ->
# (cutoff, persisted parquet path).
_MM_FP_STORE_CACHE: dict[str, tuple[int, str]] = {}


def _mm_fp_store(
    spark: SparkSession, sf_dir: str, modality: str
) -> tuple[int, str]:
    """Build ONCE per (session, data, modality) the persisted day-1
    fingerprint store — (id, fp) rows for every asset whose SOURCE doc
    sits below the 80% cutoff, decoded and hashed exactly once and
    written to parquet the way a daily asset-ingest job persists them.
    Day-2 calls read the store back instead of re-decoding old
    payloads — the entire point of the incremental shape. Memoized with
    the same data fingerprint as the other stores so in-session
    testdata regeneration invalidates it."""
    key = (
        f"{spark.sparkContext.applicationId}:{sf_dir}:{modality}:"
        f"{_docs_fingerprint(sf_dir)}"
    )
    if key in _MM_FP_STORE_CACHE:
        return _MM_FP_STORE_CACHE[key]
    import atexit
    import os
    import shutil
    import tempfile

    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        ahash63_fingerprints,
        make_ppm_neardup_assets,
        make_wav_neardup_assets,
        wav_energy_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    cutoff = int(0.8 * (max_id + 1))
    day1 = docs.filter(F.col("doc_id") < cutoff)
    if modality == "image":
        fps = ahash63_fingerprints(make_ppm_neardup_assets(day1))
    elif modality == "audio":
        fps = wav_energy_fingerprints(make_wav_neardup_assets(day1))
    else:
        raise ValueError(f"unknown modality {modality!r}")
    out = tempfile.mkdtemp(prefix=f"{modality}_fp_store_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    path = os.path.join(out, "store.parquet")
    fps.write.mode("overwrite").parquet(path)
    _MM_FP_STORE_CACHE[key] = (cutoff, path)
    return _MM_FP_STORE_CACHE[key]


def _mm_incremental_oracle(ctes: str) -> str:
    """Full-corpus closed-form fingerprint replay + exhaustive pair
    scan RESTRICTED to pairs with >= 1 new asset — the l31 oracle shape
    over a fingerprint CTE family (_L58_CTES or _L62_CTES). An asset is
    new iff its SOURCE doc id (asset_id mod 2^23 — twin offsets are
    2^23 and 2^24, both = 0 mod 2^23) is at or above the 80% cutoff."""
    return (
        "WITH "
        + ctes
        + """,
    cut AS (
      SELECT CAST(FLOOR(0.8 * (MAX(doc_id) + 1)) AS BIGINT) AS c
      FROM documents
    )
    SELECT pa.aid AS id_a, pb.aid AS id_b,
           CAST(bit_count(xor(pa.fp, pb.fp)) AS BIGINT) AS hamming,
           CASE WHEN pa.aid % 8388608 >= (SELECT c FROM cut)
                 AND pb.aid % 8388608 >= (SELECT c FROM cut)
                THEN 'new_new' ELSE 'new_old' END AS kind
    FROM fp pa JOIN fp pb ON pa.aid < pb.aid
    WHERE bit_count(xor(pa.fp, pb.fp)) <= 3
      AND (pa.aid % 8388608 >= (SELECT c FROM cut)
           OR pb.aid % 8388608 >= (SELECT c FROM cut))
    """
    )


@register("l66_incremental_image_neardup", _mm_incremental_oracle(_L58_CTES))
def l66_incremental_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental perceptual image dedup — the l31 daily-pipeline shape
    over the l58 aHash fingerprints (r9 verdict task 3): day-1 assets
    (source doc below the 80% cutoff) have their fingerprints PERSISTED
    to parquet (built once per session — _mm_fp_store); the day-2
    increment decodes and hashes ONLY its own payloads (the doc_id >=
    cutoff predicate is pushed into the documents scan; a no-day-1-
    decode plan test pins this), band-joins increment vs
    store+increment, and emits every near-dup pair involving >= 1 new
    asset, tagged new_new/new_old.

    Because a fingerprint is a pure per-asset function, the result
    equals the full-corpus banded pair set restricted to >= 1 new id —
    exactly what the oracle computes (closed-form pixel/fingerprint
    replay + exhaustive pair scan + cutoff classification), so the
    incremental path is value-hash-checked against the from-scratch
    semantics it must preserve, completeness included.

    Scale shape: store grows by |increment| rows/day, no old payload is
    ever re-decoded, and the band join's shuffle carries 16-byte rows
    (bucket the store by band key at 100 TB). Text (l31), image (this),
    and audio (l67) increments now all ride the same store discipline.
    Ref parity: SURVEY §2 L dedup + multimodal families."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        N_AHASH_BITS,
        ahash63_fingerprints,
        make_ppm_neardup_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    cutoff, store_path = _mm_fp_store(spark, sf_dir, "image")
    store = spark.read.parquet(store_path)
    new_docs = docs.filter(F.col("doc_id") >= cutoff)
    new_fps = ahash63_fingerprints(
        make_ppm_neardup_assets(new_docs)
    ).localCheckpoint(eager=True)
    pairs = D.incremental_fingerprint_pairs(
        new_fps, store, max_hamming=3, n_bits=N_AHASH_BITS
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"), "kind"
    )


@register("l67_incremental_audio_neardup", _mm_incremental_oracle(_L62_CTES))
def l67_incremental_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental audio dedup — the l66 store discipline over the l62
    frame-energy fingerprints: day-1 clip fingerprints persisted once,
    the day-2 increment decodes only its own WAV payloads and band-joins
    against store+increment. Same oracle shape (full closed-form replay
    restricted to >= 1-new pairs); same scale story. See l66."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        make_wav_neardup_assets,
        wav_energy_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    cutoff, store_path = _mm_fp_store(spark, sf_dir, "audio")
    store = spark.read.parquet(store_path)
    new_docs = docs.filter(F.col("doc_id") >= cutoff)
    new_fps = wav_energy_fingerprints(
        make_wav_neardup_assets(new_docs)
    ).localCheckpoint(eager=True)
    pairs = D.incremental_fingerprint_pairs(
        new_fps, store, max_hamming=3, n_bits=63
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"), "kind"
    )


# ---- cross-modal incremental + takedown (l78b/l78c, r12 verdict
# task 5): the l31/l66 persisted-store discipline and the l38 takedown
# discipline composed across BOTH modalities of the l78 paired corpus —
# completing the modality x lifecycle matrix (batch l78 / incremental
# l78b / takedown l78c). ----

# (session, sf_dir, data fingerprint) -> (cutoff, persisted sig path)
_XM_TEXT_STORE_CACHE: dict[str, tuple[int, str]] = {}
# (session, sf_dir, data fingerprint) -> persisted day-1 label path
_XM_CC_CACHE: dict[str, str] = {}


def _xm_text_store(spark: SparkSession, sf_dir: str) -> tuple[int, str]:
    """Day-1 PAIRED-CORPUS caption signature store, built once per
    (session, data): minhash_signatures_portable rows (l78's n=3 /
    32 hashes / 8 bands recipe) for every paired doc whose BASE id sits
    below the 80% cutoff — base captions AND their gray/perturbed twin
    captions, since a day-1 re-crawl twin is day-1 content. Persisted
    to parquet like the l31 store; the image half of the combined store
    is _mm_fp_store('image'), shared with l66 (same cutoff formula, so
    the two halves slice the same day)."""
    key = (
        f"{spark.sparkContext.applicationId}:{sf_dir}:xmtext:"
        f"{_docs_fingerprint(sf_dir)}"
    )
    if key in _XM_TEXT_STORE_CACHE:
        return _XM_TEXT_STORE_CACHE[key]
    import atexit
    import os
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    cutoff = int(0.8 * (max_id + 1))
    day1 = _paired_corpus(docs.filter(F.col("doc_id") < cutoff))
    sigs = D.minhash_signatures_portable(
        day1, "doc_id", "text", n=3, num_hashes=32, bands=8
    )
    out = tempfile.mkdtemp(prefix="xm_text_store_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    path = os.path.join(out, "store.parquet")
    sigs.write.mode("overwrite").parquet(path)
    _XM_TEXT_STORE_CACHE[key] = (cutoff, path)
    return _XM_TEXT_STORE_CACHE[key]


def _xm_union_edges(tpairs: DataFrame, ipairs: DataFrame) -> DataFrame:
    """Tagged union of the two modality edge sets on (id_a, id_b) —
    the l78 alledges shape: a pair is an edge if its TEXTS or its
    IMAGES are near-dups."""
    return (
        tpairs.select("id_a", "id_b", F.lit(True).alias("is_text"))
        .join(
            ipairs.select("id_a", "id_b", F.lit(True).alias("is_image")),
            ["id_a", "id_b"],
            "full_outer",
        )
        .select(
            "id_a",
            "id_b",
            F.coalesce("is_text", F.lit(False)).alias("is_text"),
            F.coalesce("is_image", F.lit(False)).alias("is_image"),
        )
    )


def _xm_cc_store(spark: SparkSession, sf_dir: str) -> str:
    """Day-1 cross-modal component-label store: union edges from the
    persisted caption-signature and image-fingerprint stores (no text
    re-shingled, no pixel re-decoded), resolved once with the iterative
    HashMin loop and persisted — the l33 label-store pattern over the
    l78 edge union."""
    key = (
        f"{spark.sparkContext.applicationId}:{sf_dir}:xmcc:"
        f"{_docs_fingerprint(sf_dir)}"
    )
    if key in _XM_CC_CACHE:
        return _XM_CC_CACHE[key]
    import atexit
    import os
    import shutil
    import tempfile

    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        N_AHASH_BITS,
    )

    _cutoff, sig_path = _xm_text_store(spark, sf_dir)
    _icutoff, fp_path = _mm_fp_store(spark, sf_dir, "image")
    tpairs = D.banded_pairs_from_signatures(
        spark.read.parquet(sig_path), num_hashes=32, est_threshold=0.45
    ).select("id_a", "id_b")
    ipairs = D.fingerprint_near_pairs(
        spark.read.parquet(fp_path), max_hamming=3, n_bits=N_AHASH_BITS
    ).select("id_a", "id_b")
    edges = tpairs.unionByName(ipairs).distinct()
    labels = D.connected_components(edges, "id_a", "id_b")
    out = tempfile.mkdtemp(prefix="xm_cc_store_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    path = os.path.join(out, "labels.parquet")
    labels.write.mode("overwrite").parquet(path)
    _XM_CC_CACHE[key] = path
    return _XM_CC_CACHE[key]


def _l78b_oracle() -> str:
    return (
        "\n    WITH "
        + _l78_edges_ctes()
        + """,
    cut AS (
      SELECT CAST(FLOOR(0.8 * (MAX(doc_id) + 1)) AS BIGINT) AS c
      FROM documents
    )
    SELECT id_a, id_b, is_text, is_image,
           CASE WHEN id_a % 8388608 >= (SELECT c FROM cut)
                 AND id_b % 8388608 >= (SELECT c FROM cut)
                THEN 'new_new' ELSE 'new_old' END AS kind
    FROM alledges
    WHERE id_a % 8388608 >= (SELECT c FROM cut)
       OR id_b % 8388608 >= (SELECT c FROM cut)
    """
    )


@register("l78b_crossmodal_incremental", _l78b_oracle())
def l78b_crossmodal_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL cross-modal paired-document dedup — the daily
    re-crawl shape of l78 (r12 verdict task 5): day-1 paired docs (base
    id below the 80% cutoff, twins included) live only in the two
    persisted stores — caption MinHash signatures (_xm_text_store) and
    image aHash fingerprints (_mm_fp_store, shared with l66). The
    day-2 increment shingles and decodes ONLY its own payloads (the
    doc_id >= cutoff predicate is pushed into the documents scan; a
    plan test pins the no-day-1-rescan shape), band-joins each modality
    increment-vs-store+increment, and unions the edges with
    text/image tags — every near-dup PAIR edge involving >= 1 new
    paired doc, kind-tagged new_new/new_old by BASE id (twin offsets
    are 0 mod 2^23, so a day-1 re-crawl twin counts as day-1 content).

    Because signatures and fingerprints are pure per-item functions,
    the result equals l78's full-corpus tagged edge union restricted to
    >= 1-new pairs — exactly what the oracle computes (both closed-form
    edge replays + cutoff classification), so the incremental path is
    value-hash-checked against the from-scratch semantics, completeness
    included.

    Scale shape: both stores grow by |increment| rows/day; no old text
    is re-shingled and no old pixel re-decoded; shuffle volume tracks
    increment band rows + colliding store rows (persist both stores
    bucketed by band key at 100 TB). Ref anchor: registry l78 (batch
    twin), l31/l66 (the single-modality store discipline);
    SURVEY §2 L dedup + multimodal families."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        N_AHASH_BITS,
        ahash63_fingerprints,
        make_ppm_neardup_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    cutoff, sig_path = _xm_text_store(spark, sf_dir)
    icutoff, fp_path = _mm_fp_store(spark, sf_dir, "image")
    if icutoff != cutoff:
        raise ValueError(
            f"store cutoffs diverged: text {cutoff} vs image {icutoff}"
        )
    new_docs = docs.filter(F.col("doc_id") >= cutoff)
    new_corpus = _paired_corpus(new_docs).localCheckpoint(eager=False)
    new_sigs = D.minhash_signatures_portable(
        new_corpus, "doc_id", "text", n=3, num_hashes=32, bands=8
    ).localCheckpoint(eager=False)
    tpairs = D.incremental_minhash_pairs(
        new_sigs, spark.read.parquet(sig_path),
        num_hashes=32, est_threshold=0.45,
    ).select("id_a", "id_b")
    new_fps = ahash63_fingerprints(
        make_ppm_neardup_assets(new_docs)
    ).localCheckpoint(eager=True)
    ipairs = D.incremental_fingerprint_pairs(
        new_fps, spark.read.parquet(fp_path),
        max_hamming=3, n_bits=N_AHASH_BITS,
    ).select("id_a", "id_b")
    base_mod = F.lit(8388608)  # 2^23: both twin offsets are 0 mod this
    return _xm_union_edges(tpairs, ipairs).withColumn(
        "kind",
        F.when(
            (F.col("id_a") % base_mod >= cutoff)
            & (F.col("id_b") % base_mod >= cutoff),
            F.lit("new_new"),
        ).otherwise(F.lit("new_old")),
    )


def _l78c_oracle() -> str:
    return (
        "\n    WITH RECURSIVE "
        + _l78_edges_ctes()
        + """,
    cut AS (
      SELECT CAST(FLOOR(0.8 * (MAX(doc_id) + 1)) AS BIGINT) AS c
      FROM documents
    ),
    opairs AS MATERIALIZED (
      SELECT id_a, id_b FROM alledges
      WHERE id_a % 8388608 < (SELECT c FROM cut)
        AND id_b % 8388608 < (SELECT c FROM cut)
    ),
    oedges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM opairs
               UNION SELECT id_b, id_a FROM opairs),
    oreach(id, r) AS (
      SELECT a, a FROM oedges
      UNION
      SELECT e.b, o.r FROM oreach o JOIN oedges e ON e.a = o.id
    ),
    olab AS MATERIALIZED (SELECT id, MIN(r) AS comp FROM oreach GROUP BY id),
    removed AS MATERIALIZED (
      SELECT id FROM olab WHERE (id % 8388608) % 7 = 3
    ),
    aff AS (SELECT DISTINCT comp FROM olab WHERE (id % 8388608) % 7 = 3),
    members AS MATERIALIZED (
      SELECT o.id, o.comp FROM olab o JOIN aff a ON a.comp = o.comp),
    remaining AS MATERIALIZED (
      SELECT m.id, m.comp FROM members m
      WHERE m.id NOT IN (SELECT id FROM removed)
    ),
    rpairs AS (
      SELECT p.id_a, p.id_b FROM opairs p
      JOIN remaining ra ON ra.id = p.id_a
      JOIN remaining rb ON rb.id = p.id_b
    ),
    redges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM rpairs
               UNION SELECT id_b, id_a FROM rpairs),
    rreach(id, r) AS (
      SELECT a, a FROM redges
      UNION
      SELECT e.b, x.r FROM rreach x JOIN redges e ON e.a = x.id
    ),
    rlab AS MATERIALIZED (SELECT id, MIN(r) AS comp FROM rreach GROUP BY id),
    surv AS MATERIALIZED (
      SELECT m.id, m.comp AS old_comp, COALESCE(r.comp, m.id) AS new_comp
      FROM remaining m LEFT JOIN rlab r ON r.id = m.id
    ),
    sizes AS (SELECT new_comp, COUNT(*) AS n FROM surv GROUP BY new_comp)
    SELECT s.id AS pair_id, s.old_comp AS old_component,
           s.new_comp AS new_component,
           CASE WHEN s.new_comp <> s.old_comp THEN 'relabeled'
                ELSE 'unchanged' END AS status,
           z.n AS new_cluster_size
    FROM surv s JOIN sizes z ON z.new_comp = s.new_comp
    UNION ALL
    SELECT m.id, m.comp, NULL, 'removed', NULL
    FROM members m JOIN removed r ON r.id = m.id
    """
    )


@register("l78c_crossmodal_takedown", _l78c_oracle())
def l78c_crossmodal_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAKEDOWN over the cross-modal paired-document store — the DELETE
    half of the l78 lifecycle (r12 verdict task 5; l78b is the INSERT
    half): a takedown request for a SOURCE page removes the paired doc
    AND every twin derived from it (base id % 7 == 3 over the clustered
    day-1 members — twin rows follow their base via the mod-2^23 rule,
    the 'remove the page and all derived assets' semantics). Every
    cross-modal cluster that contained a removed pair is re-derived
    over its remaining members via dedup.takedown_components, with the
    edge rebuild slicing BOTH persisted stores — caption signatures
    (banded_pairs_from_signatures) UNION image fingerprints
    (fingerprint_near_pairs) — so no old caption is re-shingled and no
    old pixel re-decoded. Deletion can split clusters through EITHER
    modality (removing the only text bridge leaves image-only
    components, and vice versa); survivors carry relabeled/unchanged
    statuses and removed pairs emit tombstones.

    The oracle replays from scratch: both closed-form edge generators,
    day-1 restricted CC, drop the removed set, re-run CC over the
    remaining members of affected components — the incremental path
    must reproduce from-scratch delete semantics exactly, statuses and
    sizes included.

    Scale shape: cost tracks |request| + |affected components|, never
    |corpus| — the l38 discipline over the union edge set. Ref anchor:
    registry l38 (single-modality takedown), l78/l78b;
    dedup.takedown_components."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        N_AHASH_BITS,
    )

    _cutoff, sig_path = _xm_text_store(spark, sf_dir)
    _icutoff, fp_path = _mm_fp_store(spark, sf_dir, "image")
    labels_path = _xm_cc_store(spark, sf_dir)
    sig_store = spark.read.parquet(sig_path)
    fp_store = spark.read.parquet(fp_path)
    labels = spark.read.parquet(labels_path)
    removed = labels.filter(
        (F.col("id") % F.lit(8388608)) % 7 == 3
    ).select("id")

    def edges_fn(remaining: DataFrame) -> DataFrame:
        rs = remaining.select("id")
        tsub = sig_store.join(F.broadcast(rs), "id", "semi")
        tp = D.banded_pairs_from_signatures(
            tsub, num_hashes=32, est_threshold=0.45
        ).select("id_a", "id_b")
        fsub = fp_store.join(F.broadcast(rs), "id", "semi")
        ip = D.fingerprint_near_pairs(
            fsub, max_hamming=3, n_bits=N_AHASH_BITS
        ).select("id_a", "id_b")
        return tp.unionByName(ip).distinct()

    delta = D.takedown_components(labels, removed, edges_fn)
    sizes = (
        delta.filter(F.col("comp").isNotNull())
        .groupBy("comp")
        .agg(F.count(F.lit(1)).alias("new_cluster_size"))
    )
    return delta.join(F.broadcast(sizes), "comp", "left").select(
        F.col("id").alias("pair_id"),
        F.col("old_comp").alias("old_component"),
        F.col("comp").alias("new_component"),
        F.when(F.col("comp").isNull(), F.lit("removed"))
        .when(F.col("comp") != F.col("old_comp"), F.lit("relabeled"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "new_cluster_size",
    )
