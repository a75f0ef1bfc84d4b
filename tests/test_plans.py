"""Physical-plan assertions: the optimizations we rely on at 100 TB
must actually appear in the plan — pushdown reaching the parquet scan,
small dims broadcast, bucketed joins shuffle-free.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from python_mozetl_spark.plans.queries import _PINGS_PATH

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_and_projection_reach_parquet_scan(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.where(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _formatted_plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan
    # column pruning: the scan reads only the 2 projected columns
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in schema_line and "l_quantity" in schema_line
    assert "l_extendedprice" not in schema_line


def test_small_dimension_join_is_broadcast(spark):
    from python_mozetl_spark.plans.queries import REGISTRY

    df = REGISTRY["regional_revenue"].build(spark, SF_DIR)
    plan = _formatted_plan(df)
    assert "BroadcastHashJoin" in plan


def test_wide_agg_is_partial_then_final_hashagg(spark):
    from python_mozetl_spark.plans.queries import REGISTRY

    df = REGISTRY["pricing_summary"].build(spark, SF_DIR)
    plan = _formatted_plan(df)
    # two HashAggregate levels around one Exchange = map-side partials
    assert plan.count("HashAggregate") >= 2
    agg_ex = [l.strip() for l in plan.splitlines()
              if l.strip().startswith(("+- HashAggregate", "+- Exchange",
                                       "HashAggregate", "Exchange"))]
    assert any("Exchange" in l for l in agg_ex)


def test_bucketed_join_has_no_shuffle(spark):
    from python_mozetl_spark.sinks.writers import write_bucketed_table

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    with tempfile.TemporaryDirectory() as d:
        try:
            write_bucketed_table(
                orders, "t_orders_b", ["o_orderkey"], 4,
                sort_by=["o_orderkey"], path=os.path.join(d, "o"),
            )
            write_bucketed_table(
                li, "t_lineitem_b", ["l_orderkey"], 4,
                sort_by=["l_orderkey"], path=os.path.join(d, "l"),
            )
            with_buckets = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                j = spark.table("t_orders_b").join(
                    spark.table("t_lineitem_b"),
                    F.col("o_orderkey") == F.col("l_orderkey"),
                )
                plan = _formatted_plan(j)
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", with_buckets
                )
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: bucketing IS the shuffle
            assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
        finally:
            spark.sql("DROP TABLE IF EXISTS t_orders_b")
            spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_json_source_prunes_fields_and_pushes_filter(spark):
    """The schema-ful JSON source must read a declared schema (no
    inference pass) and let Catalyst prune unused fields at parse
    time — ReadSchema carries only what the query touches."""
    from python_mozetl_spark.sources import read_json_pings

    pings = read_json_pings(
        spark,
        _PINGS_PATH,
        "event_id bigint, ts_us bigint, "
        "meta struct<user_id: bigint, event_type: string>, "
        "value double, props string",
    )
    q = pings.where(F.col("event_id") > 100).select("event_id", F.col("meta.user_id"))
    plan = _formatted_plan(q)
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "event_id" in schema_line and "meta" in schema_line
    assert "props" not in schema_line and "ts_us" not in schema_line
    assert "PushedFilters" in plan


def test_lsh_band_exchange_appears_once_statically(spark):
    """The bounded bucket pairing must hang every consumer off ONE band
    exchange subtree: the expensive signature pipeline (tokenize + md5)
    appears once per scan in the minhash plan — the scan count is the
    signature-subtree consumers (small + 2 grid sides) plus the two
    shingle verify joins, and regressing it means the guard rail
    started recomputing sketches."""
    from python_mozetl_spark.ext.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = minhash_lsh_pairs(docs, "doc_id", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()  # simple format
    assert plan.count("FileScan parquet") <= 5
    # the md5-based signature expression must not be inlined per-band:
    # staged projections keep one conv(md5(...)) per scan of the subtree
    assert plan.count("md5") <= plan.count("FileScan parquet")


def test_shuffle_shards_single_exchange(spark):
    """The pre-training shard shuffle must cost exactly ONE exchange
    (hash on shard) + per-shard sort — no global sort, no second
    shuffle for the position rank."""
    from python_mozetl_spark.ext.mixing import shuffle_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    df = shuffle_shards(docs, "doc_id", 8)
    # simple format: formatted explain lists every node twice (tree +
    # details), which double-counts occurrence assertions
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()  # no global sort


def test_pii_scrub_is_single_scan_single_agg(spark):
    """The PII redaction rollup must stay one scan -> codegen'd regexp
    projection -> partial+final hash agg: no joins, no extra scans, no
    Python."""
    from python_mozetl_spark.plans.queries import REGISTRY

    df = REGISTRY["event_pii_scrub"].build(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()  # simple format
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_funnel_stream_shuffles_once_on_user(spark):
    """The funnel's cap window (user, step) and per-user collect both
    reuse ONE explicit hash(user) exchange — the filtered event stream
    must not shuffle twice."""
    from python_mozetl_spark.plans.queries import REGISTRY

    qe = REGISTRY["event_funnel"].build(spark, SF_DIR)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    hash_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l
    ]
    user_exchanges = [l for l in hash_exchanges if "user_id" in l]
    assert len(user_exchanges) == 1, plan
    # and the one exchange carries ONLY the user key (not (user, step))
    assert "__step" not in user_exchanges[0]


def test_token_entropy_is_exchange_free(spark):
    """Within-row entropy adds NO exchange beyond the local-fixture
    spread: sort + fold happen per row."""
    from python_mozetl_spark.ext.quality import token_entropy

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _formatted_plan(token_entropy(d, "doc_id", "text"))
    assert "Exchange" not in plan, plan


def test_clients_daily_rollup_two_agg_exchanges_and_broadcast_rejoin(spark):
    """The flagship wide rollup's 100 TB shape: ONE partial+final
    hash-agg pair carries all ~100 aggregates (exchange on the
    (client, day) key), the per-document search frame is its own
    partial+final pair on document_id, and the rejoin of the (small)
    search totals must not shuffle the main stream a second time."""
    from python_mozetl_spark.plans.queries import REGISTRY

    df = REGISTRY["clients_daily_rollup"].build(spark, SF_DIR)
    plan = _formatted_plan(df)
    # partial+final pairs for both aggs: >= 4 HashAggregate nodes
    assert plan.count("HashAggregate") >= 4
    # hash exchanges: one per agg (document_id, client/day) and at most
    # one more for the rejoin side — the main stream never shuffles twice
    n_hash_ex = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_ex <= 3, plan


def test_bucketed_topk_is_single_exchange(spark):
    """In-kernel ranking means the whole ANN operator is the bucket
    shuffle + one applyInPandas — no second window exchange."""
    from python_mozetl_spark.plans.queries import REGISTRY

    df = REGISTRY["embedding_bucket_topk"].build(spark, SF_DIR)
    plan = _formatted_plan(df)
    assert plan.count(") Exchange") == 1, plan  # node headers, not tree refs
    assert "Window" not in plan


def test_csv_dim_join_is_broadcast(spark):
    from python_mozetl_spark.plans.queries import REGISTRY

    df = REGISTRY["csv_dim_weighted_orders"].build(spark, SF_DIR)
    plan = _formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    # the fact side aggregates with map-side partials after the join
    assert plan.count("HashAggregate") >= 2


def test_quantile_sketch_single_raw_stream_exchange(spark):
    """The quantile sketch's raw stream crosses ONE hash exchange (the
    (group, bucket) agg pair); the cumsum/read-out windows run on the
    bucket-sized frame behind it."""
    from python_mozetl_spark.plans.queries import REGISTRY

    df = REGISTRY["price_quantile_sketch"].build(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    # partial+final hash agg on (returnflag, bucket) = one exchange of
    # the lineitem stream; everything after operates on bucket rows
    lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    raw = [l for l in lines if "bucket_lo" in l and "cnt" not in l]
    assert len(raw) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_key_is_pure_projection(spark):
    """The Morton key is row-local integer algebra: no exchange beyond
    the scan spread, no Python, no join."""
    from python_mozetl_spark.plans.queries import REGISTRY

    df = REGISTRY["part_zorder_keys"].build(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_blocked_linkage_single_block_exchange(spark):
    """Record linkage shuffles the record stream ONCE on the block key
    (window count + collect_list reuse it); the levenshtein verify is
    post-explode, never a second shuffle of the records."""
    from python_mozetl_spark.plans.queries import REGISTRY

    df = REGISTRY["part_name_links"].build(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    block_exchanges = [
        l
        for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "__block" in l
    ]
    # the window-count pass and the small/big branch aggs all hang off
    # block-key partitionings; the RECORD stream itself feeds exactly
    # one of them (the others re-shuffle the already-bucket-sized frame)
    assert 1 <= len(block_exchanges) <= 3, plan
    assert plan.count("FileScan parquet") <= 3


def test_kmv_overlap_one_raw_exchange_then_array_algebra(spark):
    """The KMV overlap query shuffles the event stream on the group key
    once (dedup + top-k window); the pair join runs on k-length arrays
    with no further event-stream exchange."""
    from python_mozetl_spark.plans.queries import REGISTRY

    df = REGISTRY["event_type_user_overlap"].build(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") <= 2  # sketch subtree per join side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_prune_filters_scan_side_no_fact_exchange(spark):
    """The bloom membership test must be a codegen Filter directly on
    the fact scan (ahead of any exchange), and the exact verify must
    broadcast the dim keys — the fact stream crosses ZERO exchanges."""
    from pyspark.sql import functions as F

    from python_mozetl_spark.operators.bloom import bloom_semi_join

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    dim = spark.read.parquet(f"{SF_DIR}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    plan = (
        bloom_semi_join(o, "o_custkey", dim, "c_custkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin LeftSemi" in plan.replace("\n", " ") or (
        "LeftSemi" in plan and "BroadcastExchange" in plan
    )
    assert "SortMergeJoin" not in plan
    # only the tiny dim-key dedup shuffles; the fact side never does
    assert plan.count("Exchange hashpartitioning") == 1
    assert "md5" in plan  # the membership test made it into the plan


def test_loo_encoding_broadcasts_not_window(spark):
    """LOO target encoding must be agg + broadcast join back — never a
    Window over the low-cardinality category (the skew trap)."""
    from python_mozetl_spark.operators.encode import loo_target_encode

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plan = (
        loo_target_encode(o, "o_orderpriority", "o_totalprice")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_session_attribution_single_key_exchange(spark):
    """The session window and the per-session aggregate must share ONE
    hash(user) exchange: hashpartitioning(user_id) satisfies the
    (user_id, session_id) clustering, so no second shuffle."""
    from python_mozetl_spark.operators.sessionize import session_attribution

    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "event_type", "value",
        F_to_ts_events(spark, f"{SF_DIR}/events.parquet"),
    )
    out = session_attribution(
        e, ["user_id"], "ts", "event_type", "value", "purchase",
        gap_seconds=1800, tiebreak="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def F_to_ts_events(spark, path):
    """events.parquet carries TIMESTAMP(NANOS); mirror plans.queries.t's
    nanos->micros conversion for plan tests that bypass the registry."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        return F.expr(
            "CAST(timestamp_micros(ts DIV 1000) AS timestamp_ntz)"
        ).alias("ts")
    return F.col("ts")


def test_bpe_pair_counts_vocab_sized_exchanges(spark):
    """BPE pair counting: one corpus word agg + one vocab-sized pair
    agg — exactly two hash exchanges, no joins."""
    from pyspark.sql import functions as F

    from python_mozetl_spark.ext.vocab import (
        initial_symbols,
        pair_counts,
        word_freqs,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wf = word_freqs(d).select(initial_symbols("word").alias("syms"), "freq")
    plan = pair_counts(wf)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_round7_late_operators_plan_shapes(spark):
    """The scale claims the round-7 late operators make must appear in
    their physical plans: no cartesian products, no ntile-style global
    sort windows, top-k as TakeOrdered, 1-row sides broadcast."""
    from python_mozetl_spark.plans.queries import REGISTRY

    lift = _formatted_plan(REGISTRY["part_pair_lift"].build(spark, SF_DIR))
    assert "CartesianProduct" not in lift  # basket join is keyed; n broadcast

    deciles = _formatted_plan(
        REGISTRY["customer_revenue_deciles"].build(spark, SF_DIR)
    )
    assert "Window" not in deciles  # quantile_bin replaces ntile: no window
    assert "CartesianProduct" not in deciles

    rfm = _formatted_plan(REGISTRY["customer_rfm_segments"].build(spark, SF_DIR))
    assert "Window" not in rfm and "CartesianProduct" not in rfm

    zscore = _formatted_plan(
        REGISTRY["embedding_zscore_outliers"].build(spark, SF_DIR)
    )
    assert "TakeOrderedAndProject" in zscore  # global top-k, not a sort
    assert "CartesianProduct" not in zscore

    decay = _formatted_plan(REGISTRY["user_decayed_value"].build(spark, SF_DIR))
    assert "Window" not in decay  # one keyed hash agg, ref broadcast
    assert "CartesianProduct" not in decay

    ts = _formatted_plan(REGISTRY["event_theil_sen_trend"].build(spark, SF_DIR))
    assert "CartesianProduct" not in ts  # pair join keyed on the series key

    kl = _formatted_plan(REGISTRY["doc_split_kl"].build(spark, SF_DIR))
    assert "CartesianProduct" not in kl


# ----------------------------------------------------------------------
# Round-8 task 4: the SCALE.md §6b scan-count sweep as a standing gate.
# Every registry plan is budgeted: total Scan nodes (parquet +
# ExistingRDD staging reads) and, stricter, parquet scans PER BASE
# TABLE — the round-7 token_triangles regression (an un-staged edge
# list multiplying to 90 corpus scans through a join tree) must be
# structurally impossible, not a manual-audit habit.
# Budgets are the measured round-8 counts; lowering one is progress,
# raising one requires a staging argument in SCALE.md §6b.
# ----------------------------------------------------------------------

_SCAN_TOTAL_DEFAULT = 6
_SCAN_TOTAL_EXCEPTIONS = {
    "doc_minhash_estimates": 7,   # sketch panel fans over staged sigs
    "token_pagerank": 7,          # iterative ranks vs materialized matrix
    "taar_donor_scores": 8,       # donor pool joined per score component
    "taar_lr_curves": 8,
    "token_triangles": 9,         # staged wedge join (was 90 pre-staging)
    "doc_incremental_lsh": 10,    # old + delta corpus, banded both sides
    "embedding_semantic_dedup": 11,   # Lloyd iterations + pair stage
    "embedding_semantic_dedup_hi": 11,
}
_SCAN_PER_TABLE_DEFAULT = 4
_SCAN_PER_TABLE_EXCEPTIONS = {
    "orders_upsert_merge": 5,        # base + two CDC snapshots, diffed
    # embedding_semantic_dedup(_hi) dropped 7 -> 0 parquet re-scans in
    # round 8: lloyd_clusters stages its prepared vector frame (§6b)
    "taar_donor_scores": 8,          # customer is a broadcast-sized dim
    "taar_lr_curves": 8,
}
_BASE_TABLES = ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings")


def test_registry_scan_budgets(spark):
    import re

    from python_mozetl_spark.plans.queries import REGISTRY

    over = []
    for name, q in REGISTRY.items():
        if q.side_effect:
            # build() RUNS a streaming job into a temp dir — a plan-
            # shape sweep must not pay (or leak) a real run per
            # inspection; these queries' plans are the operator
            # modules', covered by their own streaming tests
            continue
        plan = _formatted_plan(q.build(spark, SF_DIR))
        total = len(re.findall(r"^\(\d+\) Scan ", plan, re.M))
        budget = _SCAN_TOTAL_EXCEPTIONS.get(name, _SCAN_TOTAL_DEFAULT)
        if total > budget:
            over.append(f"{name}: {total} Scan nodes > budget {budget}")
        tb = _SCAN_PER_TABLE_EXCEPTIONS.get(name, _SCAN_PER_TABLE_DEFAULT)
        for table in _BASE_TABLES:
            n = len(re.findall(rf"{table}\.parquet", plan))
            if n > tb:
                over.append(
                    f"{name}: {n} scans of {table}.parquet > budget {tb}"
                )
    assert not over, (
        "scan budget exceeded — an un-staged multi-consumer subtree "
        "(stage it with localCheckpoint / a persisted table, SCALE.md "
        "§6b):\n" + "\n".join(over)
    )
