"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference EDA engine (Lambdaderta/datafusion_cyberpolka_eda,
surveyed in SURVEY.md) plus LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, built-in `pyspark.sql.functions` on the hot path, Pandas UDFs only
where built-ins genuinely can't express the semantics. Designed for
multi-executor scale (partition-aware joins, chunked wide aggregations,
single-pass moment engines) even though tests run on local[N].
"""

from datafusion_cyberpolka_eda_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
