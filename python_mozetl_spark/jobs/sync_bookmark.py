"""sync bookmark validation: the SQL-string surface.

Mirrors mozetl/sync/bookmark_validation.py:23-101 — temp view + raw
Spark SQL with ``LATERAL VIEW`` / ``LATERAL VIEW OUTER explode``, then
two aggregate views.  Kept as SQL deliberately: it demonstrates the
engine's second API surface (SURVEY.md §3.4); everything else in this
repo uses the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PROBLEMS_SQL = """
SELECT s.app_build_id, s.app_version, s.app_display_version, s.app_channel,
       s.uid, s.device_id, s.submission_date_s3, s.when AS when_ts,
       e.name AS engine_name, e.status AS engine_status,
       e.validation.checked AS validation_checked,
       p.name AS problem_name, p.count AS problem_count
FROM sync_summary s
LATERAL VIEW explode(s.engines) AS e
LATERAL VIEW OUTER explode(e.validation.problems) AS p
WHERE s.failure_reason IS NULL
  AND e.name IN ('bookmarks', 'bookmarks-buffered')
"""

TOTALS_SQL = """
SELECT submission_date_s3,
       count(DISTINCT uid) AS distinct_uids,
       count(DISTINCT uid, device_id, when_ts) AS total_bookmark_validations,
       sum(CASE WHEN problem_name IS NOT NULL THEN problem_count ELSE 0 END)
         AS total_problems
FROM bookmark_validation_problems
GROUP BY submission_date_s3
"""


def run_bookmark_validation(
    spark: SparkSession, sync_summary: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Returns (per-problem rows, per-day totals)."""
    sync_summary.createOrReplaceTempView("sync_summary")
    problems = spark.sql(PROBLEMS_SQL)
    problems.createOrReplaceTempView("bookmark_validation_problems")
    totals = spark.sql(TOTALS_SQL)
    return problems, totals
