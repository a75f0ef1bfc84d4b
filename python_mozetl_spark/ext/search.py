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
