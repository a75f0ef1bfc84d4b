"""BPE vocabulary induction over a document corpus.

Byte-pair-encoding tokenizer *training* (Sennrich et al., ACL 2016):
count adjacent symbol pairs over the word vocabulary weighted by word
frequency, merge the most frequent pair, repeat.  The reference has a
BPE-ish token *counter* only (mirrored in functions/text.py:bpe_tokens);
vocabulary induction is the missing training half, added here because a
pretraining data pipeline ultimately feeds a tokenizer.

Spark-first shape — the key scale observation is that every BPE
iteration is vocabulary-sized, not corpus-sized:

- :func:`word_freqs` is the ONLY corpus-wide pass (one explode + one
  hash agg with map-side partials).  At 100 TB this is the same shape
  as vocab_heavy_hitters; its output is |vocab| rows (power-law
  bounded, millions not billions).
- every merge iteration (:func:`pair_counts` + argmax +
  :func:`apply_merge`) runs over the |vocab| frame: one explode of
  per-word adjacent pairs, one hash agg, and a single-row argmax
  collect (bounded by construction).  The merge application is a
  within-row left fold (``aggregate``) — zero shuffles.
- the learned merge table is driver-sized (n_merges rows) and is the
  artifact a tokenizer ships; applying it to the corpus is
  embarrassingly parallel.

Cross-engine determinism: counts are exact integers; the argmax
tiebreak is (count DESC, a, b) — total order, so the learned merge
sequence is bit-stable across engines, retries, and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.functions.text import tokens

#: End-of-word marker appended as a final symbol (standard BPE, so
#: merges never cross word boundaries and word-final units are
#: distinguishable).
EOW = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word vocabulary with frequencies: ``(word, freq)``.

    The single corpus-wide pass of BPE training — everything after
    operates on this |vocab|-sized frame.
    """
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def initial_symbols(word_col: str = "word") -> Column:
    """Character symbol sequence for a word, with the ``</w>`` marker
    appended: ``'the'`` → ``['t','h','e','</w>']``.  Pure SQL-expression
    (dynamic ``substring`` over a ``sequence``), no UDF."""
    return F.expr(
        f"concat(transform(sequence(1, length({word_col})), "
        f"i -> substring({word_col}, i, 1)), array('{EOW}'))"
    )


def pair_counts(syms_df: DataFrame, syms_col: str = "syms",
                freq_col: str = "freq") -> DataFrame:
    """Adjacent-pair counts over symbol sequences, weighted by word
    frequency: ``(a, b, pair_count)``.

    Each within-word occurrence contributes ``freq``; a word of n
    symbols emits n-1 pair positions.  One explode (|vocab| × avg
    word length rows) + one hash agg — vocabulary-sized, never
    corpus-sized.
    """
    pairs = syms_df.select(
        F.col(freq_col).alias("__freq"),
        # guard single-symbol words (a fully-merged word after a few
        # bpe iterations): sequence(1, 0) generates DESCENDING [1, 0]
        # in Spark, which would index past the array
        F.explode(
            F.expr(
                f"CASE WHEN size({syms_col}) >= 2 THEN "
                f"transform(sequence(1, size({syms_col}) - 1), "
                f"i -> named_struct("
                f"'a', element_at({syms_col}, i), "
                f"'b', element_at({syms_col}, i + 1))) "
                f"ELSE cast(array() as array<struct<a:string,b:string>>) END"
            )
        ).alias("__p"),
    )
    return pairs.groupBy(
        F.col("__p.a").alias("a"), F.col("__p.b").alias("b")
    ).agg(F.sum("__freq").cast("bigint").alias("pair_count"))


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Merge every left-to-right non-overlapping adjacent ``(a, b)``
    into the single symbol ``a||b`` — one within-row left fold
    (``aggregate``), zero shuffles.

    The fold appends each symbol unless the accumulator ends with an
    ``a`` and the incoming symbol is ``b``, in which case the tail is
    replaced by ``a||b``.  This matches the standard left-to-right
    non-overlapping semantics (merge ('a','a') on 'aaaa' →
    ['aa','aa']): a freshly merged token can never itself be a
    mergeable ``a``, because ``a||b == a`` would require an empty
    ``b``.
    """
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges: ``[(a, b, pair_count), ...]`` in
    merge order.

    Driver loop over vocabulary-sized Spark jobs; the only collects
    are the 1-row argmax per iteration (bounded by construction).
    ``localCheckpoint`` every few merges truncates the fold-over-fold
    lineage exactly like ext/graph.py's iterative operators.
    """
    wf = word_freqs(df, text_col).select(
        initial_symbols("word").alias("syms"), "freq"
    )
    wf = wf.localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            pair_counts(wf)
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["pair_count"])
        if c < 2:  # nothing left worth merging
            break
        merges.append((a, b, c))
        wf = wf.select(apply_merge(F.col("syms"), a, b).alias("syms"), "freq")
        if (i + 1) % checkpoint_every == 0:
            wf = wf.localCheckpoint()
    return merges


def encode_word(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Driver-side reference encoder (tests / spot checks): apply the
    learned merge sequence to one word.  The distributed twin is
    chaining :func:`apply_merge` columns."""
    syms = list(word) + [EOW]
    for a, b, _ in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str, int]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge sequence to a corpus — the train→apply
    half of BPE tokenization: adds ``out_col`` with each document's
    token sequence.

    Zero shuffles: tokenize and every merge are within-row expression
    folds, so encoding rides the scan — the embarrassingly-parallel
    shape corpus tokenization must have at 100 TB.  The merge table is
    a plan literal (driver-sized, the artifact :func:`bpe_learn`
    ships).

    The document is folded as ONE flat symbol sequence (chars with a
    ``</w>`` after each word) rather than a nested per-word fold —
    Spark cannot bind a lambda HOF inside another lambda, and the flat
    form is EQUIVALENT for any :func:`bpe_learn` output: a learned
    merge's left element can never contain ``</w>`` (pairs are counted
    within words, where ``</w>`` is always final), so no fold ever
    merges across a word boundary.  pytest pins equality with the
    sequential :func:`encode_word` per word.
    """
    doc_syms = F.flatten(
        F.transform(
            tokens(text_col),
            lambda w: F.concat(_char_syms(w), F.array(F.lit(EOW))),
        )
    )
    staged = df.withColumn(out_col, doc_syms)
    for a, b, _ in merges:
        if EOW in a:
            raise ValueError(
                f"merge left element {a!r} contains the end-of-word marker "
                "— not a bpe_learn output; the flat fold would be unsound"
            )
        staged = staged.withColumn(out_col, apply_merge(F.col(out_col), a, b))
    return staged


def _char_syms(w: Column) -> Column:
    """Character array of a string column via a zero-width split —
    usable inside higher-order lambdas where the ``F.expr`` dynamic
    ``substring``-over-``sequence`` form cannot reference the lambda
    variable."""
    # Java regex: split between every pair of chars.  Spark's split
    # uses limit=-1 and KEEPS the trailing empty element the zero-width
    # match at end-of-string produces — remove it (real chars are
    # never empty).
    return F.array_remove(F.split(w, "(?!^)"), "")
