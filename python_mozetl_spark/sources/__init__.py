from python_mozetl_spark.sources.parquet import (  # noqa: F401
    ensure_columns,
    read_json_pings,
    read_partitioned,
    read_table,
)
