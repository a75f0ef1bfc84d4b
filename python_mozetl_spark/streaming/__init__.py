from python_mozetl_spark.streaming.rollup import (  # noqa: F401
    daily_rollup_stream,
    dedup_stream,
    session_window_stream,
    sliding_rollup_stream,
)
from python_mozetl_spark.streaming.joins import (  # noqa: F401
    enrich_stream,
    interval_join_stream,
)
from python_mozetl_spark.streaming.stateful import (  # noqa: F401
    batch_decayed_totals,
    batch_running_totals,
    decayed_totals_stream,
    running_totals_stream,
)
from python_mozetl_spark.streaming.funnel import (  # noqa: F401
    funnel_depth_stream,
)
from python_mozetl_spark.streaming.sink import (  # noqa: F401
    idempotent_merge_batch,
    merge_stream_to_parquet,
)
from python_mozetl_spark.streaming.sketch import (  # noqa: F401
    batch_histogram_quantiles,
    cm_sketch_stream,
    histogram_quantiles_stream,
    mg_heavy_hitters_stream,
)
from python_mozetl_spark.streaming.anomaly import (  # noqa: F401
    zscore_anomalies_stream,
)
