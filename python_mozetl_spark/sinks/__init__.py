from python_mozetl_spark.sinks.writers import (  # noqa: F401
    write_json_artifact,
    write_partitioned_json,
    write_partitioned_parquet,
    write_zorder_parquet,
    zorder_key,
)
