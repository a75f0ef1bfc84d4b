from python_mozetl_spark.operators.aggregate import (  # noqa: F401
    AggSpec,
    conditional_count,
    conditional_sum,
    first_by,
    last_by,
    wide_agg,
)
from python_mozetl_spark.operators.asof import asof_join  # noqa: F401
from python_mozetl_spark.operators.merge import (  # noqa: F401
    merge_upsert,
    scd2_history,
    snapshot_diff,
    state_durations,
)
from python_mozetl_spark.operators.metrics import (  # noqa: F401
    chi_squared,
    proportion_ci,
    psi_drift,
)
from python_mozetl_spark.operators.expectations import (  # noqa: F401
    AcceptedValues,
    InRange,
    NotNull,
    RefIntegrity,
    Unique,
    run_expectations,
)
from python_mozetl_spark.operators.convert import (  # noqa: F401
    ColumnSpec,
    FrameConfig,
    convert_frame,
)
from python_mozetl_spark.operators.collapse import (  # noqa: F401
    collapse_small_groups,
    normalize_shares,
    top_n_groups,
)
from python_mozetl_spark.operators.explode import (  # noqa: F401
    explode_entries,
    explode_map,
    explode_with_default,
    self_fanout,
)
from python_mozetl_spark.operators.pivot import pivot_agg  # noqa: F401
from python_mozetl_spark.operators.sample import (  # noqa: F401
    capped_random_per_key,
    mod_sample,
    stratified_sample,
    weighted_sample,
)
from python_mozetl_spark.operators.sessionize import (  # noqa: F401
    session_attribution,
    sessionize,
)
from python_mozetl_spark.operators.bloom import (  # noqa: F401
    bloom_build,
    bloom_contains,
    bloom_semi_join,
)
from python_mozetl_spark.operators.encode import (  # noqa: F401
    frequency_encode,
    hash_features,
    loo_target_encode,
)
from python_mozetl_spark.operators.timeseries import (  # noqa: F401
    funnel_counts,
    gapfill_daily,
    new_user_growth,
    retention_cohorts,
    rolling_zscore_anomalies,
)
from python_mozetl_spark.operators.incremental import (  # noqa: F401
    agg_state,
    finalize_agg_state,
    merge_agg_states,
)
from python_mozetl_spark.operators.linkage import blocked_link_pairs  # noqa: F401
from python_mozetl_spark.operators.skew import salted_join  # noqa: F401
from python_mozetl_spark.operators.windows import (  # noqa: F401
    latest_per_key,
    running_agg,
    top_n_per_group,
    with_group_count,
)
