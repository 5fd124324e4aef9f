"""CSV / JSON source+sink round-trips (SURVEY.md §2 family A extension).

The reference's only file format is Parquet in, CSV out
(ref: eda_workspace/public_eda_pipeline.py:29-30 scan_parquet; CSV sinks at
lines 104-669). A complete engine needs the CSV/JSON *source* direction
too, so each query here writes a table out through the format under test
and reads it back with an explicit schema before aggregating — the oracle
runs the same aggregation on the original parquet, so any round-trip
corruption (quoting, nulls, type coercion, float formatting) breaks the
hash match.

Sinks write distributed (one file per partition) under the repo-local
scratch dir — the same layout a real cluster job would produce on object
storage; no coalesce(1) anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.registry import _dec_sum, register
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


def _scratch_path(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_SCRATCH, f"{tag}_{name}")


@register(
    "a5_csv_roundtrip",
    """
    SELECT r.r_name AS region,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n.n_name) AS first_nation
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def a5_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source (operator A5 + the missing source direction):
    write nation as headered CSV, read it back with the original schema
    (quoted commas and all), broadcast-join region, aggregate. The oracle
    aggregates the parquet originals, so the round-trip must be lossless."""
    nation = load_table(spark, sf_dir, "nation")
    path = _scratch_path(sf_dir, "csv_nation")
    nation.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(nation.schema).option("header", True).csv(path)
    region = load_table(spark, sf_dir, "region")
    return (
        back.join(F.broadcast(region), back.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
    )


@register(
    "a8_orc_roundtrip",
    """
    SELECT l_returnflag,
           strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def a8_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source (the third columnar format after Parquet; common
    in Hive-era lakes a migrating user still reads). Timestamps included
    deliberately — ORC stores them natively, so the micros survive where
    JSON would truncate. Oracle aggregates the parquet originals."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_returnflag", "l_shipdate"
    )
    path = _scratch_path(sf_dir, "orc_lineitem")
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy(
        "l_returnflag", F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(F.col("l_extendedprice"), "decimal(18,2)").alias("total_price"),
    )


@register(
    "a6_json_roundtrip",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def a6_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source: filter orders, write as JSON, read back
    with an explicit schema, aggregate with exact decimal sums. Doubles
    survive the text round-trip because Spark prints them shortest-exact
    (Jackson) and reparses bitwise-equal; timestamps are deliberately
    excluded — default JSON timestamp format truncates micros to millis."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    slim = orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    path = _scratch_path(sf_dir, "json_orders")
    slim.write.mode("overwrite").json(path)
    back = spark.read.schema(slim.schema).json(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dec_sum(F.col("o_totalprice"), "decimal(18,2)").alias("total_price"),
    )


@register(
    "a9_python_datasource",
    """
    WITH src AS (
      SELECT i AS id,
             (i * i) % 1000003 AS sq,
             'g' || CAST(i % 7 AS VARCHAR) AS grp
      FROM generate_series(0, 9999) s(i)
    )
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(sq) AS BIGINT) AS sum_sq,
           CAST(MAX(id) AS BIGINT) AS max_id
    FROM src GROUP BY grp
    """,
)
def a9_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Spark 4 Python DataSource API: a
    deterministic generator source with REAL partition planning — the
    reader declares 4 InputPartitions, each produced independently on an
    executor (the same contract a custom REST/queue/tensor-store
    connector implements; Arrow-batched rows, no driver materialization).
    The oracle replays the generator arithmetic with generate_series, so
    partitioning must not duplicate or drop a single row."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    N, PARTS = 10_000, 4

    class DetRangeReader(DataSourceReader):
        def partitions(self):
            step = N // PARTS
            return [
                InputPartition((p * step, N if p == PARTS - 1 else (p + 1) * step))
                for p in range(PARTS)
            ]

        def read(self, partition):
            start, end = partition.value
            for i in range(start, end):
                yield (i, (i * i) % 1000003, f"g{i % 7}")

    class DetRangeSource(DataSource):
        @classmethod
        def name(cls):
            return "detrange"

        def schema(self):
            return "id bigint, sq bigint, grp string"

        def reader(self, schema):
            return DetRangeReader()

    spark.dataSource.register(DetRangeSource)
    src = spark.read.format("detrange").load()
    return src.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sq").cast("bigint").alias("sum_sq"),
        F.max("id").cast("bigint").alias("max_id"),
    )


@register(
    "a13_schema_evolution",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS merged_has_quality_col,
           CAST(SUM(CAST(doc_id % 2 = 0 AS BIGINT)) AS BIGINT) AS n_quality_nulls,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars % 7 ELSE 0 END) AS BIGINT)
             AS quality_mod_sum
    FROM documents
    """,
)
def a13_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (the lakehouse reality that columns get
    added over time): batch 1 writes (doc_id, lang, n_chars); batch 2
    adds a `quality` column; a mergeSchema read unifies them — old rows
    surface NULL quality, new rows keep values, and the union schema is
    verified structurally (column presence) plus by exact integer
    aggregates the oracle recomputes from the source table. At 100 TB
    mergeSchema costs one footer read per file subset — pin the merged
    schema in a catalog once it stabilizes rather than re-inferring
    per job."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    p1 = _scratch_path(sf_dir, "evo_batch1")
    p2 = _scratch_path(sf_dir, "evo_batch2")
    even = F.pmod("doc_id", F.lit(2)) == 0
    docs.filter(even).write.mode("overwrite").parquet(p1)
    (
        docs.filter(~even)
        .withColumn("quality", F.pmod("n_chars", F.lit(7)).cast("double"))
        .write.mode("overwrite")
        .parquet(p2)
    )
    merged = spark.read.option("mergeSchema", "true").parquet(p1, p2)
    has_quality = "quality" in merged.columns
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(has_quality).alias("merged_has_quality_col"),
        F.sum(F.col("quality").isNull().cast("bigint")).alias("n_quality_nulls"),
        F.coalesce(F.sum("quality"), F.lit(0)).cast("bigint").alias("quality_mod_sum"),
    )


@register(
    "a14_malformed_csv_handling",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_total,
           CAST(SUM(CAST(o_orderkey % 10 = 7 AS BIGINT)) AS BIGINT) AS n_corrupt,
           CAST(SUM(CAST(o_orderkey % 10 <> 7 AS BIGINT)) AS BIGINT)
             AS n_dropmalformed_rows,
           CAST(SUM(CASE WHEN o_orderkey % 10 <> 7
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
             AS good_price_sum
    FROM orders
    """,
)
def a14_malformed_csv_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling on CSV ingest (every real corpus has bad
    rows): a CSV staged with a deterministic 10% corruption (price field
    'N/A' plus a stray extra field, i.e. structurally malformed) is read
    twice — PERMISSIVE with columnNameOfCorruptRecord
    (bad rows surface with the raw line captured, good fields null) and
    DROPMALFORMED (bad rows vanish). Corrupt counts, surviving counts,
    and the decimal sum of clean prices are all recomputed by the oracle
    from the source table. Double->string->double round-trips exactly
    (Java toString guarantees re-parse identity), so the clean-row sum
    is bit-exact. At 100 TB PERMISSIVE + a corrupt-record sink is the
    quarantine pattern; DROPMALFORMED is the lossy fast path."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = _scratch_path(sf_dir, "malformed_csv")
    bad = F.pmod("o_orderkey", F.lit(10)) == 7
    line = F.concat_ws(
        ",",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.when(bad, F.lit("N/A,XTRA")).otherwise(
            F.col("o_totalprice").cast("string")
        ),
    )
    o.select(line.alias("value")).write.mode("overwrite").text(path)

    schema = (
        "o_orderkey bigint, o_orderstatus string, o_totalprice double,"
        " _corrupt string"
    )
    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    # DROPMALFORMED engages per-field conversion failures only when the
    # corrupt-record column is declared in the schema (otherwise Spark
    # null-fills bad fields silently and keeps the row) — same schema as
    # the PERMISSIVE read, observed behavior on Spark 4.1
    dropm = (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    # a bare COUNT(*) over CSV prunes every column, the parser never
    # attempts field conversion, and DROPMALFORMED drops nothing — the
    # documented columnPruning interaction; disable pruning so the drop
    # semantics actually apply to the count
    prev = spark.conf.get("spark.sql.csv.parser.columnPruning.enabled", "true")
    spark.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    try:
        n_drop = dropm.count()
    finally:
        spark.conf.set("spark.sql.csv.parser.columnPruning.enabled", prev)
    stats = perm.agg(
        F.count(F.lit(1)).alias("n_rows_total"),
        F.sum(F.col("_corrupt").isNotNull().cast("bigint")).alias("n_corrupt"),
        _dec_sum(
            F.when(F.col("_corrupt").isNull(), F.col("o_totalprice")),
            "decimal(18,2)",
        ).alias("good_price_sum"),
    )
    return stats.select(
        "n_rows_total",
        "n_corrupt",
        F.lit(n_drop).cast("bigint").alias("n_dropmalformed_rows"),
        "good_price_sum",
    )


@register(
    "a15_streaming_python_datasource",
    """
    WITH src AS (
      SELECT i AS id,
             (i * i) % 1000003 AS sq,
             'g' || CAST(i % 7 AS VARCHAR) AS grp
      FROM generate_series(0, 9999) s(i)
    )
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(sq) AS BIGINT) AS sum_sq,
           CAST(MAX(id) AS BIGINT) AS max_id
    FROM src GROUP BY grp
    """,
)
def a15_streaming_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING connector via the Spark 4 Python DataSource API
    (the stream twin of a9): a SimpleDataSourceStreamReader serves the
    same deterministic generator in offset-tracked micro-batches —
    initialOffset / read(start) -> (rows, nextOffset) /
    readBetweenOffsets for replay, exactly the contract a custom
    queue/CDC-feed connector implements. Drained to a complete-mode
    memory sink; the batch oracle replays the generator, so the offset
    protocol must deliver every row exactly once across micro-batches."""
    import uuid as _uuid

    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    N, BATCH = 10_000, 5_000

    def rows(a: int, b: int):
        return iter([(j, (j * j) % 1000003, f"g{j % 7}") for j in range(a, b)])

    class StreamRangeReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            i = start["i"]
            end = min(i + BATCH, N)
            return rows(i, end), {"i": end}

        def readBetweenOffsets(self, start, end):
            return rows(start["i"], end["i"])

    class DetRangeStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "detrangestream"

        def schema(self):
            return "id bigint, sq bigint, grp string"

        def simpleStreamReader(self, schema):
            return StreamRangeReader()

    spark.dataSource.register(DetRangeStreamSource)
    src = spark.readStream.format("detrangestream").load()
    agg = src.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sq").cast("bigint").alias("sum_sq"),
        F.max("id").cast("bigint").alias("max_id"),
    )
    from datafusion_cyberpolka_eda_spark.streaming.events import (
        scoped_state_partitions,
    )

    name = f"pyds_stream_{_uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    out = spark.table(name).localCheckpoint(eager=True)
    # drop the uniquely-named memory-sink view (j14's helper does the
    # same): leaving it would leak one catalog entry per bench rep — the
    # session-drift mode BASELINE.md documents
    spark.catalog.dropTempView(name)
    return out
