from datafusion_cyberpolka_eda_spark.sources.catalog import (
    TESTDATA_TABLES,
    classify_columns,
    load_table,
    load_tables,
)

__all__ = ["TESTDATA_TABLES", "classify_columns", "load_table", "load_tables"]
