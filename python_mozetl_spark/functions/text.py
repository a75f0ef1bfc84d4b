"""Text-analysis column expressions — all built-in-function
compositions (JVM-side, codegen-friendly); no Python UDFs in any hot
path.  These power the training-data-pipeline operators (token
counting, quality scoring, language ID, fingerprinting) over the
``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE = r"\s+"

# A small multilingual stopword list used by quality scoring; chosen to
# be stable, not exhaustive.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "el", "la", "de", "le", "der", "die"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization with empty-token removal."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), WHITESPACE), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def _join_k(toks: Column, i: Column, k: int) -> Column:
    """Space-join ``toks[i .. i+k-1]`` (0-based ``i``) without the
    per-shingle ``slice`` array allocation: a flat ``concat`` of
    element_at lookups is bit-identical to ``concat_ws(" ", slice(...))``
    on split-produced token arrays (no NULL elements possible) and
    measured 2.2x faster on the shingle pass at the x10 scale decade.
    Callers guard ``size(toks) >= k``, so every lookup is in bounds."""
    parts: list[Column] = []
    for off in range(k):
        if off:
            parts.append(F.lit(" "))
        parts.append(F.element_at(toks, i + 1 + off))
    return F.concat(*parts)


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-shingles over an ALREADY-MATERIALIZED token array
    column.  ``toks`` must be a plain column attribute (stage it
    through its own ``select`` first): the slice lambda re-evaluates
    its input expression per index, so passing the raw ``tokens(text)``
    tree here makes the regex split O(n_tokens) per row instead of
    O(1) — a measured 3.5x slowdown on the MinHash path."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: _join_k(toks, i, k))
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array()))


def bigram_structs(toks) -> Column:
    """Bigram OCCURRENCES (not distinct) over an already-materialized
    token array column, as ``array<struct<w1,w2>>`` — the shared unit
    of the bigram LM (ext/quality.py) and hashed-bigram features
    (ext/mixing.py:dsir_select).  Guards the ``sequence(1, 0)``
    reverse-sequence trap: fewer than two tokens yields an empty
    array, never ``[1, 0]``.  Same staging caveat as
    :func:`shingles_from_tokens`: pass a plain column attribute."""
    grams = F.expr(
        "transform(sequence(1, size({c}) - 1), "
        "i -> struct({c}[i-1] AS w1, {c}[i] AS w2))".format(c=toks)
    )
    return F.when(F.size(F.col(toks)) >= 2, grams).otherwise(
        F.expr("CAST(array() AS array<struct<w1: string, w2: string>>)")
    )


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined) — the MinHash unit.

    Convenience single-expression form; hot paths should stage
    ``tokens(text)`` through a projection and use
    :func:`shingles_from_tokens` (see ext/dedup.py)."""
    return shingles_from_tokens(tokens(text), k)


def all_shingles_from_tokens(toks: Column, k: int) -> Column:
    """ALL k-word shingles in document order, duplicates preserved —
    the repetition-counting unit (``shingles_from_tokens`` distinct-s,
    which is right for set-similarity but destroys occurrence counts).
    Same staging rule: pass a materialized token attribute, not the
    raw ``tokens(text)`` tree."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: _join_k(toks, i, k))
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams."""
    c = F.col(text) if isinstance(text, str) else text
    ln = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(c, i, n))
    return F.array_distinct(F.when(ln >= n, grams).otherwise(F.array()))


def quality_metrics_from_tokens(
    toks: Column, text: Column | str
) -> dict[str, Column]:
    """Quality signals over an already-staged token attribute — use
    when the caller stages ``tokens(text)`` through a projection so
    the regex split runs once instead of once per metric."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = F.size(toks)
    n_chars = F.length(c)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    mean_tok_len = F.aggregate(
        toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tok, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tok.cast("bigint"),
        "n_unique_tokens": F.size(F.array_distinct(toks)).cast("bigint"),
        # the integer count BEFORE the ratio division — exact-rational
        # consumers (doc_quality's BIGINT half-up rounding) take this
        # directly instead of re-deriving it by round(ratio * n), which
        # is correct only within double-ulp margins (round-12 ADVICE)
        "n_stopwords": n_stop.cast("bigint"),
        "stopword_ratio": n_stop.cast("double") / F.greatest(n_tok, F.lit(1)),
        "mean_token_len": mean_tok_len,
    }


def quality_metrics(text: Column | str) -> dict[str, Column]:
    """Deterministic document-quality signals (rounded by caller).

    Convenience form of :func:`quality_metrics_from_tokens` — note the
    inline ``tokens()`` is re-evaluated per metric by Spark's lambda
    handling, so hot paths should stage the token array through a
    projection and call the ``_from_tokens`` form directly."""
    c = F.col(text) if isinstance(text, str) else text
    return quality_metrics_from_tokens(tokens(c), c)


def fingerprint_md5(text: Column | str) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text.  Identical across engines (DuckDB md5 == Spark md5), which is
    what makes exact-dedup oracle-checkable."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), WHITESPACE, " "))


# Language-ID: tiny marker-token scoring.  Deterministic and cheap; a
# production system would use character-trigram models, but the engine
# surface (argmax over per-language scores computed from token overlap)
# is the same.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "les"],
    "de": ["der", "die", "und", "das", "ist"],
}


def lang_scores_from_tokens(lower_toks: Column) -> dict[str, Column]:
    """Marker scores over an already-staged lowercase token attribute
    (one tokenize pass instead of one per language)."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(lower_toks, lambda t: F.array_contains(marr, t)))
    return out


def lang_scores(text: Column | str) -> dict[str, Column]:
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    return lang_scores_from_tokens(toks)


def predicted_lang_from_scores(
    scores: dict[str, Column], default: str = "und"
) -> Column:
    """argmax over marker scores; ties broken by language-code order,
    all-zero → ``default``."""
    best = None
    best_score = None
    for lang in sorted(scores):  # deterministic tie order
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit(default))


def predicted_lang(text: Column | str, default: str = "und") -> Column:
    """argmax over marker scores; ties broken by language-code order,
    all-zero → ``default``."""
    return predicted_lang_from_scores(lang_scores(text), default)


# PII scrubbing: ordered regex table.  Patterns restricted to the
# syntax subset that behaves identically under Java regex (Spark) and
# RE2 (DuckDB) — character classes, bounded repetition, \b word
# boundaries; no lookaround, no backreferences.  Order matters: emails
# are scrubbed before IPs/phones so their digit runs can't be
# re-matched by the later numeric patterns.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"),
]


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts, evaluated against the SAME
    progressively-scrubbed text the replacement pass sees (so an email
    whose local part looks like a phone number is counted once, as an
    email)."""
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    for kind, pat in PII_PATTERNS:
        out[kind] = F.regexp_count(c, F.lit(pat)).cast("bigint")
        c = F.regexp_replace(c, pat, f"[{kind.upper()}]")
    return out


def scrub_pii(text: Column | str) -> Column:
    """Redact PII in-place: each pattern kind replaced by its
    ``[KIND]`` placeholder, applied in PII_PATTERNS order."""
    c = F.col(text) if isinstance(text, str) else text
    for kind, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, f"[{kind.upper()}]")
    return c


# GPT-2-style pre-tokenizer pattern, simplified to the subset that
# behaves identically under Java regex (Spark) and RE2 (DuckDB) — no
# lookahead, no unicode classes.  The engine surface (regex pre-split
# before a BPE merge table) is what matters for token accounting.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s"


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish pre-tokenization: regex-extracted subword-ready pieces
    (word-with-leading-space convention, contractions split)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)
