"""Python UDF/UDTF surface (SURVEY.md §2 family K). The reference defines
no UDFs (everything is built-in expressions + driver Python) and so does
this engine's hot path — but a complete engine exposes the full Python
extension surface, so each flavor is implemented once, oracle-checked,
and labeled with its cost model:

- UDTF (table function, row -> rows): lateral-joined generator — Python
  row-at-a-time; use for genuinely tabular expansion logic that built-in
  explode/inline can't express.
- pandas UDF (scalar, Arrow-batched): the acceptable Python scalar path —
  vectorized in/out, ~10-100x the row-wise UDF.
- row-wise Python UDF: the slow path, kept ONLY as surface coverage; the
  docstring is the warning label.

Every query here is also expressible with built-in functions (that's what
the DuckDB oracle proves) — which is exactly the point: the UDF surface
is verified against the declarative twin, and the declarative form is
what production code should use.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_cyberpolka_eda_spark.registry import register
from datafusion_cyberpolka_eda_spark.sources.catalog import load_table, spread


@register(
    "k1_python_udtf",
    """
    WITH w AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_tokens,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens
    FROM w WHERE token != '' GROUP BY lang
    """,
)
def k1_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): a tokenizer generator
    lateral-joined against documents, rolled up per language. Python
    row-at-a-time — fine for low-volume expansion, wrong for the 100 TB
    hot path (the built-in explode twin is the oracle and the production
    form). Parallelism = input partitions (spread() first)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string")
    class Tokenize:
        def eval(self, text: str):
            for t in (text or "").split(" "):
                if t:
                    yield (t,)

    spark.udtf.register("tokenize_udtf", Tokenize)
    spread(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "k1_documents"
    )
    return spark.sql(
        """
        SELECT d.lang,
               COUNT(*) AS n_tokens,
               COUNT(DISTINCT t.token) AS n_distinct_tokens
        FROM k1_documents d, LATERAL tokenize_udtf(d.text) t
        GROUP BY d.lang
        """
    )


@register(
    "k2_pandas_udf_scalar",
    """
    SELECT source,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_utf8_bytes,
           CAST(MAX(strlen(text)) AS BIGINT) AS max_utf8_bytes
    FROM documents GROUP BY source
    """,
)
def k2_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-batched, vectorized): UTF-8 byte length
    per document, aggregated per source. The Arrow transfer + pandas
    vectorization makes this the acceptable Python scalar path; the
    oracle's strlen() is the built-in twin that the production plan
    should (and elsewhere does) use."""

    @F.pandas_udf("long")
    def utf8_len(s: pd.Series) -> pd.Series:
        return s.str.encode("utf-8").str.len().astype("int64")

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("source").agg(
        F.sum(utf8_len("text")).alias("total_utf8_bytes"),
        F.max(utf8_len("text")).alias("max_utf8_bytes"),
    )


@register(
    "k4_arrow_batch_map",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars >= 200 AS BIGINT)) AS BIGINT) AS n_long_docs,
           CAST(SUM(n_chars % 97) AS BIGINT) AS checksum_mod97
    FROM documents GROUP BY source
    """,
)
def k4_arrow_batch_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (pyarrow RecordBatch in/out — zero pandas conversion):
    the lowest-overhead Python batch surface, the shape for Python logic
    over columnar payloads (tokenizers, codecs) where even the pandas
    crossing costs. Computes per-doc flags/checksums with pyarrow compute
    kernels, then aggregates with built-ins; the oracle replays the
    arithmetic declaratively. Partition-parallel, no shuffle in the map."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def flags(batches):
        for b in batches:
            n = b.column("n_chars")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("source"),
                    pc.cast(pc.greater_equal(n, 200), pa.int64()),
                    pc.cast(
                        pc.subtract(
                            n, pc.multiply(pc.divide(n, 97), 97)
                        ),  # integer n % 97 via pyarrow integer div
                        pa.int64(),
                    ),
                ],
                ["source", "is_long", "mod97"],
            )

    docs = spread(load_table(spark, sf_dir, "documents")).select("source", "n_chars")
    mapped = docs.mapInArrow(flags, "source string, is_long long, mod97 long")
    return mapped.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("is_long").cast("bigint").alias("n_long_docs"),
        F.sum("mod97").cast("bigint").alias("checksum_mod97"),
    )


@register(
    "k3_python_udf_rowwise",
    """
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '[aeiou]'))) AS BIGINT) AS total_vowels
    FROM documents GROUP BY lang
    """,
)
def k3_python_udf_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — THE SLOW PATH (one Python call per row,
    pickled row transfer, no vectorization; ~10-100x slower than the
    pandas UDF and ~infinitely slower than the regexp built-in the oracle
    uses). Exists as surface coverage with this warning label; never put
    this shape on a 100 TB hot path."""

    @F.udf("long")
    def vowel_count(s: str) -> int:
        return sum(1 for ch in (s or "") if ch in "aeiou")

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.sum(vowel_count("text")).alias("total_vowels")
    )


@register(
    "k5_pandas_grouped_agg",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100 AS wavg_price
    FROM lineitem GROUP BY 1
    """,
)
def k5_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas grouped-agg UDF (Series -> scalar, Arrow-batched — the
    custom-UDAF surface): quantity-weighted average price per return
    flag. Inputs are pre-converted to exact integers JVM-side (price
    cents, integral quantities) so the Python aggregation is int64
    arithmetic — order-independent, bitwise-reproducible by the SQL twin
    (a float UDAF would drift from SQL SUM by accumulation order). Scale
    caveat vs a built-in agg: grouped-agg pandas UDFs do NOT partial-
    aggregate — every raw group row shuffles to one task (AggregateInPandas
    has no map-side combine), so group cardinality x group size both land
    on the exchange; keep it off hot paths with huge groups (the built-in
    twin shape is k5's SQL)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg_cents(pc: pd.Series, q: pd.Series) -> float:
        num = int((pc * q).sum())
        den = int(q.sum())
        return float(num) / float(den) / 100

    # Spark disallows mixing a grouped-agg pandas UDF with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row
    # count is a second pandas UDAF.
    @pandas_udf("long")
    def pd_count(q: pd.Series) -> int:
        return len(q)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("pc"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    return li.groupBy("l_returnflag").agg(
        pd_count("q").alias("n"),
        wavg_cents("pc", "q").alias("wavg_price"),
    )


@register(
    "k6_polymorphic_udtf",
    """
    WITH t AS (
      SELECT lang,
             string_split(text, ' ')[1] AS tok0,
             string_split(text, ' ')[2] AS tok1,
             string_split(text, ' ')[3] AS tok2
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT tok0) AS BIGINT) AS d_tok0,
           CAST(COUNT(DISTINCT tok2) AS BIGINT) AS d_tok2
    FROM t GROUP BY 1
    """,
)
def k6_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 `analyze()`): the output schema —
    one column per leading token — is computed at PLAN time from the
    literal width argument, the mechanism behind schema-flexible
    connectors and parsers. The lateral join + rollup is verified against
    the built-in split-indexing twin. Same cost label as k1: Python
    row-at-a-time, surface coverage — production form is the oracle's
    expression."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            width = int(n.value)
            schema = StructType()
            for i in range(width):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            toks = (text or "").split(" ")
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    spark.udtf.register("first_tokens_udtf", udtf(FirstTokens))
    spread(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "k6_documents"
    )
    return spark.sql(
        """
        SELECT lang, COUNT(*) AS n_docs,
               COUNT(DISTINCT t.tok0) AS d_tok0,
               COUNT(DISTINCT t.tok2) AS d_tok2
        FROM k6_documents, LATERAL first_tokens_udtf(text, 3) t
        GROUP BY lang
        """
    )
