"""Positional inverted-index construction and phrase search over the
``documents`` table.

The index is the classic IR shape — ``(term, doc, position)`` posting
rows — expressed as one staged tokenize + ``posexplode``, so building
it is a single scan and every downstream consumer (term statistics,
phrase queries, boolean retrieval) is hash aggregation / co-partitioned
joins on keys Catalyst already shuffles minimally.

Scale shapes (100 TB corpus):

- :func:`positional_postings` shuffles nothing by itself — it is a
  narrow explode; materialize it partitioned (or bucketed) by ``term``
  when serving many queries, by ``doc`` when feeding per-doc stats.
- :func:`index_terms` is one (term, doc) agg then one term agg — the
  second reuses the first's hash partitioning prefix-free (term is the
  leading key of neither; it is a fresh shuffle on term, unavoidable
  and O(vocab) output).
- :func:`phrase_search` filters postings to the phrase's terms BEFORE
  any join (predicate on the scan; selectivity |phrase|/|vocab|), then
  chains adjacency joins on ``(doc, pos)`` — each join side is the
  tiny filtered slice, never the full index.

No counterpart in the reference (it has no IR layer); built to the
standard textbook shape (Manning et al., *Introduction to Information
Retrieval*, ch. 2 positional postings).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.functions.text import tokens


def positional_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Posting rows ``(term, id_col, pos)`` with 0-based token
    positions — the positional inverted index in row form."""
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    return toks.select(
        id_col, F.posexplode("__toks").alias("pos", "term")
    ).select("term", id_col, "pos")


def index_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Term-level index statistics: ``(term, df_count, tf_total,
    top_tf)`` — document frequency, total occurrences, and the largest
    single-document term frequency."""
    post = positional_postings(df, id_col, text_col)
    tf = post.groupBy("term", id_col).agg(F.count("*").cast("bigint").alias("tf"))
    return tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df_count"),
        F.sum("tf").cast("bigint").alias("tf_total"),
        F.max("tf").cast("bigint").alias("top_tf"),
    )


def phrase_search(
    df: DataFrame, id_col: str, text_col: str, phrase: Sequence[str]
) -> DataFrame:
    """Documents containing ``phrase`` as CONSECUTIVE tokens, with the
    number of distinct match positions: ``(id_col, n_matches)``.

    Position-intersection over the inverted index: postings are
    filtered to the phrase's terms first (the filter reaches the
    explode input — a scan predicate at index-serving time), then each
    subsequent term joins on ``(doc, pos == first_pos + offset)``.
    Equivalent to the within-row :func:`phrase_match` scan, which is
    the better shape when no index is materialized; pytest pins the
    two equal.
    """
    if not phrase:
        raise ValueError("phrase must have at least one term")
    post = positional_postings(df, id_col, text_col).where(
        F.col("term").isin(list(phrase))
    )
    matched = (
        post.where(F.col("term") == phrase[0])
        .select(id_col, F.col("pos").alias("__p0"))
    )
    for k, term in enumerate(phrase[1:], start=1):
        nxt = post.where(F.col("term") == term).select(
            id_col, (F.col("pos") - k).alias("__p0")
        )
        matched = matched.join(nxt, [id_col, "__p0"])
    return matched.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_matches")
    )


def phrase_match(
    df: DataFrame, id_col: str, text_col: str, phrase: Sequence[str]
) -> DataFrame:
    """Index-free twin of :func:`phrase_search`: one within-row scan
    per document (zero shuffles before the trivial output), counting
    start positions where all phrase terms match consecutively."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    k = len(phrase)
    staged = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    n = F.size("__toks")
    # sequence(1, 0) would generate DESCENDING [1, 0]; guard short docs
    starts = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.array().cast("array<int>")
    )
    hit = lambda i: F.forall(  # noqa: E731
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.element_at(
            F.col("__toks"), (i + j).cast("int")
        ).eqNullSafe(
            F.element_at(F.array(*[F.lit(w) for w in phrase]), (j + 1).cast("int"))
        ),
    )
    counted = staged.select(
        id_col,
        F.size(F.filter(starts, hit)).cast("bigint").alias("n_matches"),
    )
    return counted.where(F.col("n_matches") > 0)


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Okapi BM25 top-k retrieval over the inverted index:
    ``(id_col, score)`` for the ``k`` best-scoring documents.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    with the standard "+1" idf (Robertson/Spärck Jones, as used by
    Lucene): idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Scale shape (100 TB corpus, |query| terms):

    - postings are filtered to the query's terms BEFORE any agg/join —
      the predicate reaches the tokenize scan, so the whole query
      touches |query|/|vocab| of the index;
    - corpus stats (N, Σ|d|) are one tiny global agg broadcast by
      crossJoin — avgdl is computed as one exact-integer division
      (sum/count), so it is bit-identical cross-engine;
    - per-term df counts are |query|-rows, broadcast;
    - doc lengths join the filtered tf slice on id (co-partitioned),
      never the full corpus;
    - ordering totals on (rounded score DESC, id) so the k-boundary
      cannot flip between engines.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    # doc lengths AND the postings explode both read the tokenize
    # subtree — materialize it once (minhash staging discipline,
    # SCALE.md §6b) instead of re-tokenizing the corpus per consumer
    toks = toks.localCheckpoint(eager=False)
    doclen = toks.select(id_col, F.size("__toks").cast("bigint").alias("__dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__dl").cast("bigint").alias("__sumdl"),
    )
    post = toks.select(
        id_col, F.explode("__toks").alias("term")
    ).where(F.col("term").isin(list(query_terms)))
    tf = post.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("__tf")
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("__df"))
    from pyspark.sql.functions import broadcast

    scored = (
        tf.join(broadcast(dfc), "term")
        .join(doclen, id_col)
        .crossJoin(broadcast(stats))
    )
    n, dfq = F.col("__n").cast("double"), F.col("__df").cast("double")
    # ln(1 + z) spelled literally (not log1p) so Spark and the DuckDB
    # oracle evaluate the identical floating-point expression tree.
    idf = F.log(F.lit(1.0) + (n - dfq + 0.5) / (dfq + 0.5))
    avgdl = F.col("__sumdl").cast("double") / n
    tfq = F.col("__tf").cast("double")
    denom = tfq + k1 * (1.0 - b + b * F.col("__dl").cast("double") / avgdl)
    term_score = idf * tfq * (k1 + 1.0) / denom
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum(term_score), round_to).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str,
    k: int = 60,
    topk: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher SIGIR'09) of
    several retrieval rankings — the standard hybrid-search combiner
    (BM25 lexical + embedding-cosine semantic being the modern RAG
    pairing): ``rrf(d) = Σ_lists 1 / (k + rank_list(d))`` over the
    lists that retrieved ``d``; documents in several lists rise, rank
    positions (not incomparable raw scores) carry the signal.

    Each input frame must hold ``(id_col, rank)`` with rank 1-based.
    Returns ``(id_col, rrf_score, n_lists)`` ordered by
    (score DESC, id) — with ``topk``, limited to the fusion top-k.

    Scale shape: inputs are top-N lists (bounded by their own
    retrieval k, NOT corpus-sized), so the union + one id-keyed agg is
    trivially cheap; the expensive work stays inside the upstream
    retrievers, which keep their own scale contracts.  Deterministic
    and oracle-checkable: the per-list contribution is an exact double
    from integer rank, summed per id and rounded once.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    tagged = [
        r.select(F.col(id_col), F.col("rank").cast("bigint").alias("rank"))
        for r in rankings
    ]
    unioned = tagged[0]
    for r in tagged[1:]:
        unioned = unioned.unionByName(r)
    out = (
        unioned.groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("rank").cast("double"))),
                round_dp,
            ).alias("rrf_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), id_col)
    )
    return out.limit(topk) if topk else out


def _tfidf_prefix_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    broadcast_df_table: bool,
    stage: bool,
    precision: int,
):
    """Shared head of :func:`tfidf_cosine_pairs` and
    :func:`tfidf_candidate_stats`: the staged unit-weight postings
    table and the 100%-recall prefix-filter candidate pair frame —
    one definition keeps the measured observable (candidate counts)
    structurally identical to what the pair query actually joins.

    The pair semantics: all document pairs with TF-IDF **weighted cosine** similarity ≥
    ``threshold`` — the weighted all-pairs similarity-search problem
    (Bayardo, Ma & Srikant, WWW'07), the cosine complement of the
    unweighted-Jaccard :func:`ext.dedup.ngram_jaccard_pairs`.

    Weights: ``tf * (ln((N+1)/(df+1)) + 1)`` (smoothed idf, N = total
    input rows), L2-normalized per document, so cosine = dot product.

    Candidate generation is 100%-recall prefix filtering under a
    global rarest-first term order (df ASC, term): with unit vectors,
    if every shared term of a pair lies in the region of ``a`` where
    the remaining suffix norm is < t, then by Cauchy-Schwarz
    ``dot ≤ ||a_suffix|| · ||b|| < t`` — so the globally-smallest
    shared term of any qualifying pair lies inside ``a``'s PREFIX (the
    minimal head whose exclusive squared-mass cumsum ≤ 1 - t², plus a
    1e-9 float-slack), and by symmetry inside ``b``'s prefix too
    (prefixes are heads of one global order).  Joining prefix postings
    against PREFIX postings with ``id_a < id_b`` therefore misses
    nothing; an exact per-term dot-product join verifies candidates,
    and the output equals brute force.

    Plan shape, sized for 100 TB: one tokenize explode → (id, term)
    hash agg; an O(vocab) term-df agg (broadcast back when
    ``broadcast_df_table`` — flip it off on a billion-term corpus to
    shuffle-join on the term instead, the bigram_perplexity switch);
    ONE id-partitioned exchange serves both the L2 norm and the
    prefix-order window; the candidate join carries only
    ``(id, term, u)`` rows — never whole documents; the verify joins
    are id-keyed on the deduped candidate pairs.  Prefix sizes shrink
    as t grows (head mass ≤ 1 - t²), and rare terms — the ones
    prefixes keep — have short postings by construction, which is
    exactly what bounds the candidate volume (common terms sit at the
    suffix end and never enter the join).
    """
    from pyspark.sql import Window

    staged = df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__t"))
    tf = (
        staged.select("__id", F.explode("__t").alias("__tok"))
        .groupBy("__id", "__tok")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    n_docs = df.groupBy().agg(F.count(F.lit(1)).cast("double").alias("__n"))
    dft = tf.groupBy("__tok").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    if broadcast_df_table:
        dft = F.broadcast(dft)
    w = (
        tf.join(dft, "__tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__id",
            "__tok",
            "__df",
            (
                F.col("__tf")
                * (F.log((F.col("__n") + 1) / (F.col("__df") + 1)) + 1)
            ).alias("__w"),
        )
    )
    by_id = Window.partitionBy("__id")
    order = Window.partitionBy("__id").orderBy("__df", "__tok")
    # per-doc maxweight and L1 norm of the UNIT vector ride the same
    # by_id exchange as the L2 norm (one Window exec, three aggregates)
    # — they feed the PPJoin-style length filter below: for any pair,
    # dot = Σ u_a(t)·u_b(t) ≤ maxw(a)·Σ u_b(t) ≤ maxw(a)·l1(b)
    # (Bayardo WWW'07 §3's minsize bound in unit-vector form).
    norm = F.sqrt(F.sum(F.col("__w") * F.col("__w")).over(by_id))
    u = w.select(
        "__id",
        "__tok",
        "__df",
        (F.col("__w") / norm).alias("__u"),
        (F.max("__w").over(by_id) / norm).alias("__maxw"),
        (F.sum("__w").over(by_id) / norm).alias("__l1"),
    )
    postings = u.select(
        "__id",
        "__tok",
        "__df",
        "__u",
        "__maxw",
        "__l1",
        F.coalesce(
            F.sum(F.col("__u") * F.col("__u")).over(
                order.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ).alias("__cum_excl"),
        # exclusive L1 cumsum in the same order (the same Window exec
        # as __cum_excl) — yields the suffix L1 mass after any term,
        # feeding the maxw·suffix-L1 arm of the positional bound
        F.coalesce(
            F.sum(F.col("__u")).over(
                order.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ).alias("__cum_l1_excl"),
    )
    # THREE consumers (prefix side, full join side, verify) — the
    # minhash staging discipline (SCALE.md §6b); at cluster scale
    # persist the postings table instead.  ``stage=False`` keeps the
    # full lineage visible (plan tests only — it re-runs the tokenize
    # subtree per consumer).
    if stage:
        postings = postings.localCheckpoint(eager=False)
    # the OUTPUT filter accepts the ROUNDED cosine >= threshold, so a
    # pair with true cosine in [threshold - 5*10^-precision, threshold)
    # can round in — the prefix bound must guarantee recall down to
    # that rounding half-ulp, not just to the unrounded threshold
    t_eff = max(threshold - 5.0 * 10.0 ** (-precision), 0.0)
    prefix = postings.where(
        F.col("__cum_excl") <= F.lit(1.0 - t_eff * t_eff + 1e-9)
    )
    # prefix x PREFIX join, not prefix x full postings — still 100%
    # recall: for any pair with dot >= t, take the globally-SMALLEST
    # shared term s*.  If s* fell outside a's prefix, every shared
    # term would sit in a's suffix and dot <= ||a_suffix||*||b|| < t
    # (Cauchy-Schwarz); symmetrically for b — so s* lies in BOTH
    # prefixes (prefixes are heads of the same global order).  Common
    # terms (long postings) now sit outside the join on BOTH sides,
    # where the one-sided form paid |prefix posting| x |full posting|
    # on every mid-df term.  Measured on the Heaps x10 fixture
    # (SCALE_CURVE r09): candidates 5.49M -> 4.09M and x10/x1 wall
    # ratio 6.8 -> 4.5; the candidate GROWTH exponent (~N^1.26 on a
    # Heaps/Zipf df distribution, tracked per round via
    # tfidf_candidate_stats) comes from prefix-term posting lengths
    # themselves and would need PPJoin-style positional/length
    # filters to reduce further.
    # positional upper bound (Bayardo WWW'07 §4 flavor, round-10
    # TIGHTENED form): a qualifying pair's GLOBALLY-SMALLEST shared
    # term s* contributes EXACTLY u_a(s*)·u_b(s*) to the dot, and
    # every OTHER shared term lies strictly after s* in both suffixes,
    # so dot ≤ u_a·u_b + ||a_{>s*}||·||b_{>s*}|| =
    # u_a·u_b + sqrt(1−ca−u_a²)·sqrt(1−cb−u_b²) — strictly tighter
    # than the round-9 sqrt((1−ca)(1−cb)) bound (2-D Cauchy-Schwarz:
    # sqrt((u_a²+ra)(u_b²+rb)) ≥ u_a·u_b + sqrt(ra·rb)), which it
    # therefore subsumes.  Any matched row where the bound < t cannot
    # BE s* of a qualifying pair; the s* row of a qualifying pair
    # always survives (bound ≥ dot ≥ t ≥ t_eff).
    #
    # PPJoin-style LENGTH filter (round 10): dot ≤ maxw(a)·l1(b) and
    # ≤ maxw(b)·l1(a) unconditionally (no s* hypothesis needed), so
    # BOTH inequalities must clear t_eff for ANY row of a qualifying
    # pair — on unit vectors this is a genuine length filter: for
    # near-uniform weights maxw≈1/√m, l1≈√m, so it demands
    # m_b ≳ t²·m_a — pairs of very different effective lengths drop
    # out before the dedup exchange.  Measured on the Heaps/Zipf
    # fixtures at t=0.9 (SCALE_CURVE r10, both round-10 filters
    # together): candidates x1 130k→103.6k (−20%), x10 2.41M→1.74M
    # (−28%), x30 9.76M→6.78M (−30%), output unchanged — per-decade
    # candidate ratio 18.6×→16.8×, growth exponent N^1.268→N^1.225.
    # The residual exponent is the collision rate of rare prefix
    # terms across unrelated salad docs — a property of the df
    # distribution the 100%-recall prefix cannot shrink further
    # without an exact-overlap count, which prefix matches alone
    # cannot supply.
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.__tok") == F.col("b.__tok"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (
                F.col("a.__maxw") * F.col("b.__l1")
                >= F.lit(t_eff - 1e-9)
            )
            & (
                F.col("b.__maxw") * F.col("a.__l1")
                >= F.lit(t_eff - 1e-9)
            )
            & (
                F.col("a.__u") * F.col("b.__u")
                + F.least(
                    # 2-D Cauchy-Schwarz on the post-s* suffixes
                    F.sqrt(
                        F.greatest(
                            F.lit(1.0)
                            - F.col("a.__cum_excl")
                            - F.col("a.__u") * F.col("a.__u"),
                            F.lit(0.0),
                        )
                        * F.greatest(
                            F.lit(1.0)
                            - F.col("b.__cum_excl")
                            - F.col("b.__u") * F.col("b.__u"),
                            F.lit(0.0),
                        )
                    ),
                    # maxw × the partner's post-s* suffix L1 (both
                    # directions) — tighter than Cauchy-Schwarz when
                    # the two suffix lengths differ, which is exactly
                    # the deep-prefix × shallow-prefix match shape
                    F.col("a.__maxw")
                    * F.greatest(
                        F.col("b.__l1")
                        - F.col("b.__cum_l1_excl")
                        - F.col("b.__u"),
                        F.lit(0.0),
                    ),
                    F.col("b.__maxw")
                    * F.greatest(
                        F.col("a.__l1")
                        - F.col("a.__cum_l1_excl")
                        - F.col("a.__u"),
                        F.lit(0.0),
                    ),
                )
                >= F.lit(t_eff - 1e-9)
            ),
        )
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return postings, cand


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    *,
    broadcast_df_table: bool = True,
    stage: bool = True,
    precision: int = 6,
    verify_keys: str = "xxhash64",
    verify_attach: str = "auto",
    verify_broadcast_budget_bytes: int = 512 << 20,
    verify_slabs: int = 2,
    verify_max_slabs: int = 8,
) -> DataFrame:
    """All document pairs with TF-IDF weighted cosine similarity >=
    ``threshold`` (Bayardo, Ma & Srikant, WWW'07) — candidate
    construction and its recall argument in
    :func:`_tfidf_prefix_candidates`; an exact per-doc-map dot product
    verifies candidates, so the output equals brute force.

    ``verify_keys`` (round 11, the verify-tier counterpart of the
    dedup ``hash_fn`` digest seam): the verify maps' key
    representation.  ``"xxhash64"`` (default) keys the per-doc weight
    map by ``xxhash64(term)`` — the ``map_zip_with`` key-union merge
    then compares 8-byte longs instead of variable-length strings,
    which is where the verify tier's wall actually lives once
    candidates are map-attached (SCALE_CURVE_r11
    ``tfidf_stage_profile`` attribution; the L2AP candidate-cut
    attempt recorded alongside it measured the candidate COUNT
    irreducible at t=0.9, so the constant is the lever — interleaved
    x30 A/B in SCALE_CURVE_r11.json ``tfidf_verify_keys_ab``).
    ``"token"`` keys by the term string (the pre-r11 shape, kept for
    debuggability — keys stay readable).  Unlike winnow's md5, the
    key never reaches the OUTPUT, so the hashed default is
    oracle-safe: the dot product is exact unless two DISTINCT terms
    of one candidate pair's vocab union collide in 64 bits
    (P ≈ |union|²/2⁶⁵ ≈ 1e-15 per pair, silently INFLATING the dot —
    a within-doc collision instead fails LOUDLY under Spark's default
    duplicate-map-key policy rather than corrupting).  Two further
    risk notes (round 12, ADVICE): switching key representation also
    switches the dot-product FOLD ORDER (maps sort by hash, not
    token), so a true cosine sitting exactly on a 6dp rounding
    boundary can land one 6dp ulp apart between the two modes — the
    seam pytest therefore pins pair-set equality exactly but cosines
    only to one ulp.  Neither mode is run-to-run nondeterministic;
    the fold order is a pure function of the maps in both.

    Verify shape (rewritten round 9 after the x30 decade point): the
    old verify exploded every candidate against side-a's full posting
    list before an equi-join on (id_b, term) — O(candidates x doc
    length) shuffled rows, ~700M at 150k docs, and a measured
    Py4JJavaError at x30.  Now each doc's unit weights fold ONCE into
    a sorted token→weight map (one groupBy over postings), the two
    id-keyed joins attach two ~doc-length maps per candidate pair, and
    the dot product is a within-row fold over
    ``map_zip_with(__ma, __mb, (k,x,y) -> x*y)`` — the engine's
    key-union zip is O(|a|+|b|) per pair (a per-entry
    ``try_element_at`` probe of the larger map measured 5x slower:
    each lookup is a linear key scan, O(|a|·|b|) total).  No per-term
    shuffle rows exist at all; same discipline as
    ``_verify_jaccard_pairs``: arrays never ride the candidate
    exchange, and the fold order is a pure function of the two maps
    (sorted keys of ``a``, then ``b``-only keys), so the rounded
    cosine is run-deterministic.

    ``verify_attach`` (round 12, the verify-tier WALL fix): HOW the
    two per-doc maps reach the candidate pairs.  The r11 stage profile
    attributed ~70% of the x30 wall to this attach, and the L2AP
    candidate-cut probe proved the candidate COUNT irreducible at
    t=0.9 (SCALE.md §6g″) — but the cost was never the maps
    themselves, it was MOVING them: two shuffled joins exchange the
    candidate×map rows (each pair row carries a ~doc-sized map through
    a sort/shuffle), while the docvec table itself is only
    corpus-vocabulary-sized — |docs| rows ≈ the POSTING count in
    entries, orders of magnitude smaller than candidates × doc-length.
    ``"broadcast"`` ships docvec to every task once and streams the
    candidate pairs through two broadcast hash joins — the whole
    verify tier (attach + zip + threshold) runs shuffle-free in the
    same stage that deduplicates the candidates.  ``"slab"`` (round 13, the MIDDLE
    regime): hash-partition docvec into ``verify_slabs`` budget-sized
    slabs and attach via B² lazy union branches, each joining one
    (a-slab, b-slab) pair of broadcasts — per-task hash-join build
    memory stays bounded at two slabs regardless of docvec size (the
    under-budget broadcast mode's own bound) while the verify tier
    still runs shuffle-free; Catalyst's ReuseExchange collapses the
    B² branch references to 2B distinct broadcast builds, and the
    slim candidate frame (staged) absorbs the B² scans.  Why it
    exists: the measured over-budget penalty is ~2× (order-balanced
    x100 medians: shuffled attach 219.2 s vs forced-broadcast
    108.3 s; an earlier load-confounded single-rep read parity and
    was overturned — the r12 x30 ABBA read the same 2×, SCALE.md
    §6j).  ``"shuffle"`` keeps
    the id-keyed sort-merge attach — the truly-massive shape where
    even ``verify_max_slabs × budget`` cannot hold the map table.
    ``"auto"`` (default) measures
    the staged postings frame (the action shares the localCheckpoint
    every later consumer reuses) and picks the first regime that
    fits: broadcast iff the estimated serialized map size fits
    ``verify_broadcast_budget_bytes``, else slab with
    ``B = ceil(est / budget)`` while ``B ≤ verify_max_slabs``, else
    shuffle.  The size estimate: with
    hashed keys ``rows × 32 B`` (deliberately pessimistic for
    an 8-byte-key/8-byte-double entry plus array+offset overhead);
    with ``verify_keys="token"`` the keys are variable-length strings
    where a flat 32 B/entry could under-estimate — and ``F.broadcast``
    is a hard hint — so the gate instead MEASURES total key length in
    the same one-pass aggregate and charges
    ``rows × 24 B + key_chars × 4 B`` (4 B/char is pessimistic vs
    UTF-8; round-13 ADVICE closure).  The measurement is only free when ``stage=True`` (the gate action
    then triggers the one localCheckpoint materialization every later
    consumer reuses); with ``stage=False`` there is no shared
    materialization to piggyback on, so ``auto`` skips the measurement
    and takes the scale-safe ``shuffle`` attach directly (round-13
    ADVICE closure — the old comment claimed a lineage sharing that
    unstaged plans cannot provide).  The mode is pure physical
    strategy: the output is bit-identical across all four
    (pytest-pinned)."""
    if verify_keys not in ("token", "xxhash64"):
        raise ValueError(
            f"verify_keys must be 'token' or 'xxhash64', got {verify_keys!r}"
        )
    if verify_attach not in ("auto", "broadcast", "slab", "shuffle"):
        raise ValueError(
            "verify_attach must be 'auto', 'broadcast', 'slab' or "
            f"'shuffle', got {verify_attach!r}"
        )
    if verify_attach == "slab" and int(verify_slabs) < 2:
        raise ValueError(
            f"verify_slabs must be >= 2 for 'slab', got {verify_slabs!r}"
        )
    postings, cand = _tfidf_prefix_candidates(
        df, id_col, text_col, threshold, broadcast_df_table, stage, precision
    )
    if verify_attach == "auto":
        if not stage:
            # no localCheckpoint to share: any gate aggregate would
            # re-run the tokenize/prefix subtree once extra on raw
            # lineage, so unstaged callers get the scale-safe mode
            # without measuring (docstring; round-13 ADVICE)
            verify_attach = "shuffle"
        else:
            # one cheap aggregate on the staged postings — it triggers
            # the localCheckpoint materialization every downstream
            # consumer (candidate join, docvec build) reuses, so the
            # action costs the postings build ONCE rather than adding
            # a run.  Hashed keys: 32 B/entry flat.  Token keys:
            # variable-length strings, so measure the actual key chars
            # in the same pass (docstring has the calibration).
            if verify_keys == "token":
                n, key_chars = postings.agg(
                    F.count(F.lit(1)), F.sum(F.length("__tok"))
                ).first()
                est = n * 24 + int(key_chars or 0) * 4
            else:
                est = postings.count() * 32
            if est <= verify_broadcast_budget_bytes:
                verify_attach = "broadcast"
            else:
                # middle regime (round 13): docvec over budget but
                # within verify_max_slabs budget-sized slabs — slab
                # the attach (measured ~2x over the shuffled attach
                # at the first post-flip decade, SCALE.md §6j)
                n_slabs = -(-est // verify_broadcast_budget_bytes)
                if n_slabs <= int(verify_max_slabs):
                    verify_attach, verify_slabs = "slab", n_slabs
                else:
                    verify_attach = "shuffle"
    key = (
        F.col("__tok")
        if verify_keys == "token"
        else F.xxhash64("__tok").alias("__tok")
    )
    docvec = postings.groupBy("__id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(key, "__u")))
        ).alias("__m")
    )
    if stage:
        # two consumers (a side, b side) behind different exchanges
        # (shuffle mode) or two broadcast builds (broadcast mode)
        docvec = docvec.localCheckpoint(eager=False)
    side_a = docvec.select(
        F.col("__id").alias("id_a"), F.col("__m").alias("__ma")
    )
    side_b = docvec.select(
        F.col("__id").alias("id_b"), F.col("__m").alias("__mb")
    )
    if verify_attach == "broadcast":
        side_a, side_b = F.broadcast(side_a), F.broadcast(side_b)
        pairs = cand.join(side_a, "id_a").join(side_b, "id_b")
    elif verify_attach == "slab":
        # middle regime: B budget-sized docvec slabs, B² lazy union
        # branches each joining ONE (a-slab, b-slab) pair of
        # broadcasts.  Per-task hash-join build memory is bounded at
        # two slabs (≈ the under-budget broadcast mode's bound) no
        # matter how large docvec grows; Catalyst's ReuseExchange
        # collapses the B² branch references to 2B distinct broadcast
        # builds.  The candidate frame is scanned B² times, so stage
        # it — it is slim (two ids per row), unlike the attached
        # frames the shuffled mode sorts.
        B = int(verify_slabs)
        if stage:
            cand = cand.localCheckpoint(eager=False)
        sa = F.pmod(F.xxhash64(F.col("id_a")), F.lit(B))
        sb = F.pmod(F.xxhash64(F.col("id_b")), F.lit(B))
        slab_id = F.pmod(F.xxhash64(F.col("__id")), F.lit(B))
        branches = []
        for i in range(B):
            slab_a = F.broadcast(
                docvec.where(slab_id == i).select(
                    F.col("__id").alias("id_a"), F.col("__m").alias("__ma")
                )
            )
            for j in range(B):
                slab_b = F.broadcast(
                    docvec.where(slab_id == j).select(
                        F.col("__id").alias("id_b"),
                        F.col("__m").alias("__mb"),
                    )
                )
                branches.append(
                    cand.where((sa == i) & (sb == j))
                    .join(slab_a, "id_a")
                    .join(slab_b, "id_b")
                )
        pairs = branches[0]
        for br in branches[1:]:
            pairs = pairs.unionByName(br)
    else:
        pairs = cand.join(side_a, "id_a").join(side_b, "id_b")
    dot = F.expr(
        """
        aggregate(
          map_values(map_zip_with(__ma, __mb, (k, x, y) -> x * y)),
          CAST(0.0 AS DOUBLE),
          (acc, v) -> acc + coalesce(v, CAST(0.0 AS DOUBLE))
        )
        """
    )
    dots = pairs.select(
        "id_a", "id_b", F.round(dot, precision).alias("cosine")
    )
    return dots.where(F.col("cosine") >= threshold)


def tfidf_candidate_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    *,
    broadcast_df_table: bool = True,
    stage: bool = True,
    precision: int = 6,
) -> DataFrame:
    """1-row observable over the prefix-filter candidate stage:
    ``(n_docs, n_candidates)``.  The scale diagnostic for the
    steepest curve in the dedup family (SCALE_CURVE r08: wall-time
    x10 ratio 6.01): candidate volume is the quantity that decides
    whether the operator bends quadratic on a given df distribution —
    wall time only shows the symptom.  Counts the EXACT frame
    :func:`tfidf_cosine_pairs` verifies (shared construction), at the
    cost of the candidate join only — the verify joins never run."""
    postings, cand = _tfidf_prefix_candidates(
        df, id_col, text_col, threshold, broadcast_df_table, stage, precision
    )
    n_docs = postings.select("__id").distinct().count()
    return cand.groupBy().agg(
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
    )
