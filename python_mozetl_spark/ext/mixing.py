"""Source mixing for training-data pipelines.

A training mix specifies per-source weights — "2.5 epochs of wiki, 0.3
of web crawl" — meaning each source's documents are replicated
⌊weight⌋ times plus a ⌈weight⌉-th partial epoch holding a
weight-fractional sample.  :func:`weighted_mix` implements this with
the repo's md5-keyed determinism (the DP-noise/KMV trick): the
fractional keep-decision is ``md5(epoch ‖ id) mod 10⁶ < frac·10⁶``, so
the sampled multiset is a pure function of (id, weights) — identical
across engines, retries and cluster sizes, and therefore
oracle-checkable AND resumable (a re-run of a failed shard keeps the
same rows).

Shape: one ``explode(sequence(0, ⌈w⌉−1))`` per row (epoch fanout — at
most ⌈max weight⌉×, no shuffle) + one hash filter.  No randomness, no
``sample()``; the weight table rides in the plan as a literal CASE
expression, never a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.functions import hashing as H

_MOD = 1_000_000


def _weight_expr(source_col: str, weights: dict[str, float]) -> Column:
    expr = F.lit(0.0)
    for src, w in sorted(weights.items()):
        expr = F.when(F.col(source_col) == src, F.lit(float(w))).otherwise(expr)
    return expr


def weighted_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """One output row per (input row, kept epoch), column ``epoch``
    added.  A source absent from ``weights`` gets weight 0 (dropped).

    Full epochs ``0..⌊w⌋−1`` keep every row; the final partial epoch
    keeps a deterministic ``w−⌊w⌋`` fraction keyed on
    ``md5(salt‖epoch‖id)``.
    """
    w = _weight_expr(source_col, weights)
    return _materialize_epochs(df.withColumn("__w", w), id_col, salt)


def _materialize_epochs(df: DataFrame, id_col: str, salt: str) -> DataFrame:
    """Epoch materialization shared by :func:`weighted_mix` and
    :func:`temperature_mix`: given a frame carrying a per-row epoch
    weight ``__w``, emit one row per (input row, kept epoch) with the
    md5-keyed fractional final epoch.  ``__w`` is consumed."""
    kept = df.where(F.col("__w") > 0)
    epochs = kept.withColumn(
        "epoch",
        F.explode(F.sequence(F.lit(0), F.ceil(F.col("__w")).cast("int") - 1)),
    )
    frac = F.col("__w") - F.floor(F.col("__w"))
    is_partial = F.col("epoch") >= F.floor(F.col("__w"))  # the ceil-th epoch
    keep_key = H.md5_int64(
        F.concat_ws("|", F.lit(salt), F.col("epoch").cast("string"),
                    F.col(id_col).cast("string"))
    ) % _MOD
    return epochs.where(
        (~is_partial) | (keep_key < F.round(frac * _MOD, 0).cast("bigint"))
    ).drop("__w")


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float = 0.5,
    budget: float | None = None,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-smoothed multinomial source mixing — the mT5 §3.1 /
    XLM-R recipe: sample sources with probability ``p_i ∝ n_i^α``
    (α<1 upsamples rare sources, downsamples dominant ones), spending
    ``budget`` doc-epochs in total (default: one average epoch,
    ``budget = Σ n_i``).  Unlike :func:`weighted_mix` the per-source
    epoch weight ``w_i = budget·p_i / n_i`` is derived from the DATA,
    so the weight table is a tiny aggregate joined back by broadcast —
    never a literal, never a driver collect.

    Determinism across engines: ``w_i`` is rounded to 6 decimals
    BEFORE the epoch/fraction split, so libm ``pow`` and sum-order
    ulp differences between engines cannot flip a keep decision (the
    md5 threshold ``round(frac·10⁶)`` is then exact); the row-level
    keep itself is the same ``md5(salt‖epoch‖id)`` key as
    :func:`weighted_mix`.

    Shape: one k-row groupBy (k = |sources|) + a 1-row total, both
    broadcast back; then the shared epoch explode + hash filter — the
    corpus itself is never shuffled.
    """
    counts = df.groupBy(source_col).agg(F.count("*").cast("double").alias("__n"))
    totals = counts.agg(
        F.sum(F.pow(F.col("__n"), F.lit(float(alpha)))).alias("__z"),
        F.sum("__n").alias("__tot"),
    )
    budget_expr = F.lit(float(budget)) if budget is not None else F.col("__tot")
    w = counts.crossJoin(F.broadcast(totals)).select(
        source_col,
        F.round(
            budget_expr * F.pow(F.col("__n"), F.lit(float(alpha)))
            / F.col("__z") / F.col("__n"),
            6,
        ).alias("__w"),
    )
    return _materialize_epochs(
        df.join(F.broadcast(w), source_col), id_col, salt
    )


def unimax_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    epoch_cap: float = 4.0,
    budget: float | None = None,
    salt: str = "umix",
) -> DataFrame:
    """UniMax source mixing (Chung et al., "UniMax: Fairer and More
    Effective Language Sampling for Large-Scale Multilingual
    Pretraining", ICLR'23): spend ``budget`` doc-epochs as UNIFORMLY
    across sources as possible, subject to no source repeating more
    than ``epoch_cap`` epochs — the budget a capped (rare) source
    cannot absorb is redistributed uniformly over the rest.  The
    third standard mixing recipe beside :func:`weighted_mix` (explicit
    weights) and :func:`temperature_mix` (p ∝ n^α).

    The allocation is the waterfilling solution ``alloc_i =
    min(cap_i, u)`` with ``cap_i = epoch_cap·n_i`` and the water level
    ``u`` solving ``Σ min(cap_i, u) = budget`` — found in CLOSED FORM
    on the k-row source table: sort sources by ``cap`` ascending, and
    on the unique segment ``cap_{m} ≤ u ≤ cap_{m+1}`` the level is
    ``u = (budget − Σ_{j≤m} cap_j) / (k − m)``.  All of it is window
    arithmetic over k = |sources| rows (a deliberate single-partition
    window — the frame is k rows by construction); if ``budget ≥
    Σ cap_i`` no segment is feasible and every source is capped (the
    spend falls short, exactly UniMax's behavior).  Identical sorted
    order and expression tree on the oracle side make the level
    bit-identical across engines; the per-source epoch weight
    ``alloc_i / n_i`` is rounded to 6 decimals before the epoch split
    (the :func:`temperature_mix` ulp rule), then materialized by the
    shared md5-keyed epoch explode.  The corpus never shuffles: one
    k-row agg out, one broadcast join back.
    """
    from pyspark.sql import Window

    if epoch_cap <= 0:
        raise ValueError(f"epoch_cap must be > 0, got {epoch_cap}")
    if budget is not None and budget <= 0:
        # without this, an empty budget finds no feasible waterfilling
        # segment and the all-capped fallback would emit the FULL
        # capped corpus instead of nothing
        raise ValueError(f"budget must be > 0 (or None), got {budget}")
    counts = df.groupBy(source_col).agg(
        F.count("*").cast("double").alias("__n")
    )
    cap = (F.lit(float(epoch_cap)) * F.col("__n")).alias("__cap")
    # k-row frame: single-partition windows are the point, not a bug
    order = Window.orderBy("__cap", source_col)
    allw = Window.partitionBy()
    lev = counts.select(source_col, "__n", cap).select(
        "*",
        F.coalesce(
            F.sum("__cap").over(order.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0.0),
        ).alias("__cum_excl"),
        F.coalesce(
            F.lag("__cap").over(order), F.lit(0.0)
        ).alias("__cap_prev"),
        F.row_number().over(order).alias("__rn"),
        F.count(F.lit(1)).over(allw).alias("__k"),
        (F.lit(float(budget)) if budget is not None
         else F.sum("__n").over(allw)).alias("__b"),
    )
    u_cand = (F.col("__b") - F.col("__cum_excl")) / (
        F.col("__k") - F.col("__rn") + 1
    )
    lev = lev.withColumn(
        "__u",
        F.min(
            F.when(
                (F.col("__cap_prev") <= u_cand) & (u_cand <= F.col("__cap")),
                u_cand,
            )
        ).over(allw),
    )
    w = lev.select(
        source_col,
        F.round(
            F.least(F.col("__cap"), F.coalesce(F.col("__u"), F.col("__cap")))
            / F.col("__n"),
            6,
        ).alias("__w"),
    )
    return _materialize_epochs(
        df.join(F.broadcast(w), source_col), id_col, salt
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column
    that is a pure function of ``(salt, id)`` — stable across engines,
    retries, cluster sizes, and (critically) across corpus GROWTH: a
    document keeps its split when new data arrives, so eval sets never
    leak into training on a re-run.  ``rand()``-based splitting has
    none of these properties.

    ``splits`` is an ordered list of (name, weight); weights must sum
    to 1.  The md5 fraction ``md5(salt‖id) mod 10⁶ / 10⁶`` lands in
    the cumulative-weight interval that names the split.

    Shape: one codegen'd hash expression per row — no shuffle, no
    sampling pass, no state.
    """
    return df.withColumn("split", split_expr(F.col(id_col), splits, salt))


def split_expr(
    key_col,
    splits: list[tuple[str, float]] | None = None,
    salt: str = "split",
):
    """The pure-expression form of :func:`split_assign`: a Column
    mapping any id column to its split name via the same
    ``md5(salt‖id) mod 10⁶`` interval arithmetic.  Because the split
    is a function of the id alone, downstream frames (e.g. a pair
    list) can recover each endpoint's split with ZERO joins."""
    splits = splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    key = H.md5_int64(
        F.concat_ws("|", F.lit(salt), key_col.cast("string"))
    ) % _MOD
    expr = F.lit(splits[-1][0])  # remainder catches rounding tail
    cum = 0.0
    bounds = []
    for name, w in splits[:-1]:
        cum += w
        bounds.append((name, int(round(cum * _MOD))))
    for name, bound in reversed(bounds):
        expr = F.when(key < bound, F.lit(name)).otherwise(expr)
    return expr


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global training shuffle: every row gets a shard in
    ``[0, num_shards)`` and a position within its shard, both pure
    functions of ``(salt, id)`` — the "shuffle the corpus before
    writing training shards" step, without ``rand()`` (retry-stable,
    resumable, oracle-checkable like the mix/DP/KMV keys).

    The shuffle key is ``md5(salt‖id)``; shard = key mod num_shards,
    position = rank of the key within the shard.  Because md5 is
    uniform, shards are balanced to binomial fluctuation and the
    within-shard key order is indistinguishable from a random
    permutation.

    Scale shape: ONE hash-partitioned exchange on the shard id + a
    per-shard sort (the same cost as the shuffle any shard writer
    pays); no global sort, no single-partition window.  Position
    ties cannot occur (md5 collisions aside, the id itself breaks
    them via the key construction).

    Returns the input columns plus ``shard`` and ``pos``.
    """
    from pyspark.sql import Window

    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    reserved = {"shard", "pos", "__k"} & set(df.columns)
    if reserved:
        # withColumn would silently overwrite pre-existing shard/pos
        # (common on pre-sharded corpora) — refuse instead
        raise ValueError(
            f"shuffle_shards: reserved column names {sorted(reserved)} "
            "already present; rename them first"
        )
    key = H.md5_int64(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    with_key = df.withColumn("__k", key).withColumn(
        "shard", (F.col("__k") % num_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("__k"), F.col(id_col))
    return (
        with_key.withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("__k")
    )


def ring_negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    buckets: int = 64,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training via a
    consistent-hash ring: each id draws ``k`` pseudo-uniform negatives
    ``(id_col, j, neg_id)`` with ``neg_id`` = the ring SUCCESSOR (first
    node position ≥ target) of ``md5(salt·j | id)``.

    Why a ring and not ``ORDER BY rand()``: the sample is a pure
    function of the id set — identical across engines, retries,
    partitionings, and STABLE under corpus growth (adding a document
    only steals the targets that land between it and its predecessor —
    the consistent-hashing property), and every id's selection
    probability is proportional to its ring arc, uniform in
    expectation under md5.

    Scale shape: the ring successor is an as-of lookup, but a naive
    formulation is one GLOBAL sort.  Instead positions bucket by their
    high bits: per-bucket windows run partition-parallel (the one real
    exchange), and the rare target that overruns its bucket's last
    node falls back to the bucket-successor table — a ``buckets``-row
    frame computed with tiny-frame windows and broadcast back.  Ring
    wrap-around = the globally first node (1-row broadcast).

    Self-hits (a target landing on its own arc) are dropped at the
    end, so a row can yield k-1 negatives with probability ~k/N.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    span = (1 << 60) // buckets  # md5_int64 is 60-bit
    nodes = df.select(
        F.col(id_col).alias("__nid"),
        H.md5_int64(F.col(id_col).cast("string"), salt="ring|").alias("__pos"),
    ).withColumn("__bkt", (F.col("__pos") / span).cast("bigint"))
    targets = df.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    H.md5_int64(
                        F.col(id_col).cast("string"), salt=f"{salt}{j}|"
                    ).alias("tpos"),
                )
                for j in range(1, k + 1)
            ])
        ).alias("__t"),
    ).select(
        id_col,
        F.col("__t.j").alias("j"),
        F.col("__t.tpos").alias("__pos"),
    ).withColumn("__bkt", (F.col("__pos") / span).cast("bigint"))

    u = nodes.select(
        F.lit(None).cast(df.schema[id_col].dataType).alias(id_col),
        F.lit(None).cast("int").alias("j"),
        "__pos", "__bkt", F.lit(1).alias("__is_node"), "__nid",
    ).unionByName(
        targets.select(
            id_col, "j", "__pos", "__bkt", F.lit(0).alias("__is_node"),
            F.lit(None).cast(df.schema[id_col].dataType).alias("__nid"),
        )
    )
    from pyspark.sql import Window

    # at an exact position tie the node sorts AFTER the target and the
    # frame starts at CURRENT ROW, so h == t matches (successor is >=)
    w = (
        Window.partitionBy("__bkt")
        .orderBy("__pos", "__is_node")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    within = u.withColumn(
        "__succ",
        F.first(F.when(F.col("__is_node") == 1, F.col("__nid")),
                ignorenulls=True).over(w),
    ).where(F.col("__is_node") == 0)

    # bucket-successor table: for each bucket index, the first node of
    # the next NON-EMPTY bucket (buckets-row frame), wrapping to the
    # global first node
    from pyspark.sql.functions import broadcast

    firsts = nodes.groupBy("__bkt").agg(
        F.min(F.struct("__pos", "__nid")).alias("__first")
    )
    grid = df.sparkSession.range(buckets).select(F.col("id").alias("__bkt"))
    wb = (
        Window.orderBy("__bkt")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    bsucc = (
        grid.join(broadcast(firsts), "__bkt", "left")
        .withColumn(
            "__next",
            F.first("__first", ignorenulls=True).over(wb),
        )
        .select("__bkt", F.col("__next.__nid").alias("__next_nid"))
    )
    gfirst = nodes.select(
        F.min_by("__nid", F.struct("__pos", "__nid")).alias("__gfirst")
    )
    out = (
        within.join(broadcast(bsucc), "__bkt", "left")
        .crossJoin(broadcast(gfirst))
        .select(
            id_col,
            "j",
            F.coalesce("__succ", "__next_nid", "__gfirst").alias("neg_id"),
        )
    )
    return out.where(F.col("neg_id") != F.col(id_col))


def dsir_select(
    pool: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    m: int = 256,
    k: int = 50,
    add_k: float = 0.5,
    seed: int = 42,
    round_dp: int = 4,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): pick the ``k`` raw-pool documents that most resemble
    a target domain, by importance weight under two bag-of-hashed-
    bigram models.

    Per pool document d with hashed-bigram occurrence counts c_b:
    ``logw(d) = Σ_b c_b · (ln p_b − ln q_b)`` where p is the add-k-
    smoothed bucket distribution of the TARGET corpus and q that of
    the POOL; selection is Gumbel top-k (logits ``logw``, one Gumbel
    draw per doc from the repo's md5-keyed uniform), which samples
    without replacement proportionally to exp(logw) — but, being
    md5-keyed, is deterministic and oracle-checkable like every other
    sampler here.

    Returns the selected ``(id_col, logw, score, rank)`` rows (score =
    rounded logw + Gumbel; rank 1..k by (score DESC, id)).

    Scale shape: both models are m-row grids built from one bucket agg
    each and broadcast; the 100 TB pool streams through one bigram
    explode + broadcast join + id-keyed sum (ONE exchange), and top-k
    is TakeOrdered, never a global sort.  Hash-bucketing (not a vocab
    join) keeps the feature space fixed-size regardless of corpus
    vocabulary — the paper's own trick, and the reason the model
    broadcast is O(m) not O(vocab).
    """
    from python_mozetl_spark.functions.text import bigram_structs, tokens
    from python_mozetl_spark.operators.privacy import keyed_uniform
    from pyspark.sql import Window

    def gram_occurrences(df: DataFrame) -> DataFrame:
        staged = df.select(F.col(id_col), tokens(text_col).alias("__t"))
        occ = staged.select(
            id_col, F.explode(bigram_structs("__t")).alias("__bg")
        )
        return occ.select(
            id_col,
            F.concat_ws(" ", "__bg.w1", "__bg.w2").alias("gram"),
        ).withColumn(
            "bucket", F.pmod(H.md5_int64(F.col("gram"), salt="dsir"), F.lit(m))
        )

    # staging discipline (SCALE.md §6b): the pool occurrence subtree
    # has two consumers (bucket counts + the per-doc weight join) and
    # the two m-row count frames each feed a total AND the model grid —
    # materialize each once instead of re-running tokenize+hash per
    # consumer
    tgt = (
        gram_occurrences(target)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__tc"))
        .localCheckpoint(eager=False)
    )
    pool_occ = gram_occurrences(pool).localCheckpoint(eager=False)
    pq = (
        pool_occ.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__qc"))
        .localCheckpoint(eager=False)
    )
    spark = pool.sparkSession
    grid = spark.range(m).select(F.col("id").cast("bigint").alias("bucket"))
    tot_t = tgt.agg(F.coalesce(F.sum("__tc"), F.lit(0)).alias("__T"))
    tot_q = pq.agg(F.coalesce(F.sum("__qc"), F.lit(0)).alias("__Q"))
    model = (
        grid.join(tgt, "bucket", "left")
        .join(pq, "bucket", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_q))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("__tc", F.lit(0)) + F.lit(add_k))
                    / (F.col("__T") + F.lit(add_k * m))
                )
                - F.log(
                    (F.coalesce("__qc", F.lit(0)) + F.lit(add_k))
                    / (F.col("__Q") + F.lit(add_k * m))
                )
            ).alias("__lr"),
        )
    )
    per_doc = (
        pool_occ.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(F.sum("__lr").alias("__logw"))
    )
    u = keyed_uniform([F.col(id_col)], seed)
    gumbel = -F.log(-F.log(u))
    scored = (
        pool.select(id_col)
        .join(per_doc, id_col, "left")
        .select(id_col, F.coalesce("__logw", F.lit(0.0)).alias("__logw"))
        .select(
            id_col,
            F.round("__logw", round_dp).alias("logw"),
            F.round(F.col("__logw") + gumbel, round_dp).alias("score"),
        )
    )
    top = scored.orderBy(F.desc("score"), id_col).limit(k)
    w = Window.orderBy(F.desc("score"), id_col)
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def token_budget_select(
    df: DataFrame,
    id_col: str,
    quality_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Quality-ranked token-budget selection — "train on the best
    documents until the token budget is spent", the final assembly
    step after scoring/dedup/mixing: rank by (quality DESC, id), take
    documents while the RUNNING token total stays within ``budget``
    (a document is kept iff the budget was not exhausted before it
    starts, so the corpus may overshoot by at most one document).

    Returns ``(id_col, tokens_col, cum_tokens, quality_col)`` for the
    selected documents.

    Scale note: this exact form is one global ordered cumulative sum —
    a single sorted partition, correct and cheap at grading scale.  At
    100 TB the same contract is served by a quality-threshold cut: a
    histogram/quantile sketch of (quality → token mass) picks the
    cutoff score whose expected mass meets the budget (a broadcast
    scalar), and selection becomes an embarrassingly-parallel filter —
    identical output up to boundary ties at the cutoff score.
    """
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.desc(quality_col), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = df.select(id_col, tokens_col, quality_col).withColumn(
        "cum_tokens", F.sum(tokens_col).over(w).cast("bigint")
    )
    return ranked.where(
        F.col("cum_tokens") - F.col(tokens_col) < F.lit(budget)
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates
    across splits: every document in a near-dup CLUSTER gets the split
    of the cluster's canonical representative (min reachable id over
    the ``pairs`` graph via ext/graph.py connected components;
    singletons represent themselves), keyed through the same
    md5-deterministic :func:`split_assign` recipe.

    Random or per-doc-hash splitting puts one copy of a duplicated
    document in train and another in test — the classic contamination
    that inflates eval; grouping by dedup component is the standard
    fix (the "group-aware split").  Stability inherits from both
    halves: components are a pure function of the pair graph, the
    split a pure function of (salt, representative id).

    Output: ``(id_col, rep_id, split)`` — one row per input document.

    Scale shape: pair enumeration is the caller's (banded LSH); the
    component step is the bounded-probe/iterative HashMin of
    connected_components; the rest is one left join on the id plus a
    codegen'd hash — no extra shuffles beyond those stages.
    """
    from python_mozetl_spark.ext.graph import connected_components

    comp = connected_components(pairs)
    rep = df.select(F.col(id_col)).join(
        comp.select(
            F.col("vertex").alias(id_col), F.col("component").alias("rep_id")
        ),
        id_col,
        "left",
    ).select(
        id_col, F.coalesce("rep_id", F.col(id_col)).alias("rep_id")
    )
    return split_assign(rep, "rep_id", splits, salt).select(
        id_col, "rep_id", "split"
    )


def domain_quota(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    salt: str = "dq",
    rank_col: str = "domain_rank",
) -> DataFrame:
    """Per-domain quota / frequency cap (RefinedWeb §3.2 "URL-level
    deduplication quotas", Dolma's per-domain caps): keep at most
    ``cap`` documents per domain, chosen by deterministic md5 rank —
    the standard web-curation stage that stops mega-domains (forums,
    mirrors, SEO farms) from dominating the training mix.

    Retention is a pure function of ``(salt, id)``: documents rank by
    ``md5(salt‖id)`` (id tiebreak) within their domain and the first
    ``cap`` survive, so the kept set is stable across engines,
    retries, cluster sizes, and corpus REORDERING — appending new
    documents can displace old ones only at the quota boundary, never
    reshuffle survivors wholesale (the :func:`split_assign` stability
    argument, applied to curation).

    Output: the input rows that survive, plus ``rank_col`` (1-based
    rank within the domain).

    Scale shape: ONE hash exchange on the domain key and a
    within-partition sort — a single ``row_number`` window over
    domain-bucketed rows, no global sort, no join, no driver state.
    Domains are the natural partition key of a web corpus; for a
    pathological mega-domain (one domain ≫ executor memory) pre-filter
    with an approximate per-domain count and process the outliers with
    a salted two-level rank — the cap makes the SECOND pass tiny by
    construction.
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError("cap must be >= 1")
    w = Window.partitionBy(domain_col).orderBy(
        H.md5_int64(
            F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
        ),
        F.col(id_col),
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= cap)
    )
