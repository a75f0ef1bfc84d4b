from python_mozetl_spark.streaming.rollup import (  # noqa: F401
    daily_rollup_stream,
    session_window_stream,
)
