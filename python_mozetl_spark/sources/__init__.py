from python_mozetl_spark.sources.parquet import (  # noqa: F401
    ensure_columns,
    read_json_pings,
    read_partitioned,
    read_table,
)
from python_mozetl_spark.sources.side_input import (  # noqa: F401
    side_input_from_json,
)
