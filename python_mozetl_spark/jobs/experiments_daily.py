"""Experiments-daily rollup.

Re-expresses mozetl/experimentsdaily/rollup.py:10-27: the clients_daily
aggregate table applied with the 3-part key (experiment_id, client_id,
activity_date) after filtering one excluded experiment.  The reference
itself proves the two rollups are one parameterized operator
(EXPERIMENT_FIELD_AGGREGATORS reuses FIELD_AGGREGATORS,
mozetl/clientsdaily/fields.py:216-218); here that parameterization is
explicit — same AggSpec, different keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.jobs.clients_daily import (
    default_agg_spec,
    run_clients_daily,
)

EXCLUDED_EXPERIMENTS = ("pref-flip-screenshots-release-1369150",)


def run_experiments_daily(
    experiments_summary: DataFrame,
    excluded: Sequence[str] = EXCLUDED_EXPERIMENTS,
) -> DataFrame:
    """Per (experiment_id, client_id, activity_date) wide rollup —
    the clients_daily pipeline (search extraction included) with the
    experiment key prepended."""
    df = experiments_summary.where(~F.col("experiment_id").isin(list(excluded)))
    spec = default_agg_spec(keys=("experiment_id", "client_id", "activity_date"))
    return run_clients_daily(df, spec)
