"""Reference-job parity layer.

Thin compositions of the operator library reproducing the semantics of
the reference's ETL jobs (SURVEY.md §3) — not ports of their code.
Each module documents the reference entry point it mirrors
(file:line into /root/reference) and which operators it composes.
"""

from python_mozetl_spark.jobs.clients_daily import (  # noqa: F401
    clients_daily_oracle_sql,
    extract_search_counts,
    full_agg_spec,
    run_clients_daily,
)
from python_mozetl_spark.jobs.search_aggregates import (  # noqa: F401
    add_derived_columns,
    explode_search_counts,
    run_search_aggregates,
    run_search_clients_daily,
)
