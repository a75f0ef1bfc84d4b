from python_mozetl_spark.sinks.writers import (  # noqa: F401
    compact_parquet,
    foreach_partition_sink,
    write_bucketed_table,
    write_csv_export,
    write_json_artifact,
    write_parquet_with_stats,
    write_partitioned_json,
    write_partitioned_parquet,
    write_zorder_parquet,
    zorder_key,
)
from python_mozetl_spark.sinks.alerts import (  # noqa: F401
    alert_on_change_flags,
    build_alert_email,
    dated_values_from_artifact,
    deliver_alert,
    most_recent_change,
    render_change_report,
)
