"""Synthesize the scale-decade fixtures for the dedup/similarity core.

The driver testdata tops out at sf0.1 (5k documents / 2k embeddings) —
enough for correctness, not for scale-shape evidence.  And its corpus
is word salad over a 31-word vocabulary, which makes PAIR VOLUME
inherently quadratic in corpus size (every doc shares shingles with
every doc — at 10x, LSH buckets hold 10x members and the true
candidate set grows 100x regardless of algorithm).  Real web corpora
don't do that: vocabulary grows with the corpus (Heaps' law,
V ~ k * N^beta, beta ~ 0.5-0.7), so shingle collisions across
UNRELATED documents stay rare and candidate volume tracks the genuine
duplicate rate.

This generator therefore keeps the sf0.1 SHAPE (uniform word salad,
7-87 words/doc, 5 langs, 20 sources) but draws from a Heaps-scaled
vocabulary ``V = 12 * N^0.7`` (x1: ~4.7k words for 5k docs; x10:
~23.5k words for 50k docs) with a CONSTANT near-dup rate:

- 4% of docs are a 2-word mutation of an earlier doc (shingle overlap
  stays high, so MinHash/winnow/TF-IDF genuinely find them),
- 0.2% are exact copies,

so true pair volume grows ~linearly and any super-linear runtime in
the x10/x1 ratio is the operator's own fanout, not the corpus.

embeddings (0.4 vectors per doc, 64-dim, as at sf0.1): 10 Gaussian
clusters plus 5% epsilon-duplicates (a copy of an earlier vector +
tiny noise) for SemDeDup.

Deterministic (numpy RandomState(42)); writes
``scalefix/x1`` (5k docs / 2k vecs) and ``scalefix/x10`` (50k / 20k)
under the repo root.  Usage: ``python tools/make_scale_fixture.py``.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_documents(n: int, rng: np.random.RandomState) -> pa.Table:
    langs = ["en", "zh", "de", "fr", "es"]
    n_sources = 20
    vocab_size = int(12 * n ** 0.7)  # Heaps' law, beta=0.7
    vocab = [f"w{i}" for i in range(vocab_size)]
    # mildly Zipf token frequencies (natural-language shape): word
    # ranks draw with p ~ 1/(rank+50)^0.8.  A UNIFORM vocabulary is
    # the worst case for TF-IDF prefix filtering (every token has the
    # same mid-range df, so no prefix is ever rare) and measured
    # quadratic candidate volume that no real corpus exhibits; the
    # skew restores the df variance the WWW'07 bound exploits while
    # keeping the hottest token under ~1% so shingle buckets stay
    # bounded.
    w = 1.0 / (np.arange(vocab_size) + 50.0) ** 0.8
    cdf = np.cumsum(w / w.sum())
    cdf[-1] = 1.0  # float cumsum can end below 1.0; a draw in
    # (cdf[-1], 1) would searchsorted to vocab_size -> IndexError
    texts: list[str] = []
    for i in range(n):
        r = rng.rand()
        if i > 10 and r < 0.002:  # exact duplicate of an earlier doc
            texts.append(texts[rng.randint(0, i)])
            continue
        if i > 10 and r < 0.042:  # near-dup: swap exactly 2 words
            base = texts[rng.randint(0, i)].split(" ")
            for _ in range(2):
                base[rng.randint(0, len(base))] = vocab[
                    int(np.searchsorted(cdf, rng.rand()))
                ]
            texts.append(" ".join(base))
            continue
        n_words = rng.randint(7, 88)
        idx = np.searchsorted(cdf, rng.rand(n_words))
        texts.append(" ".join(vocab[j] for j in idx))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [langs[j] for j in rng.randint(0, len(langs), size=n)]
            ),
            "source": pa.array(
                [f"src{j}" for j in rng.randint(0, n_sources, size=n)]
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def make_embeddings(m: int, rng: np.random.RandomState) -> pa.Table:
    dim, n_clusters = 64, 10
    centers = rng.randn(n_clusters, dim) * 0.5
    labels = rng.randint(0, n_clusters, size=m)
    vecs = centers[labels] + rng.randn(m, dim) * 0.12
    for i in range(20, m):  # epsilon-duplicates for SemDeDup
        if rng.rand() < 0.05:
            j = rng.randint(0, i)
            vecs[i] = vecs[j] + rng.randn(dim) * 0.004
            labels[i] = labels[j]
    return pa.table(
        {
            "vec_id": pa.array(range(m), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def main() -> None:
    # x30 (150k docs / 60k vecs) is opt-in: ``--x30`` — the third
    # decade point for the steepest curves (tfidf candidates), ~2 min
    # to generate and several minutes per operator to run.  x100
    # (500k docs / 200k vecs, ``--x100``) is the fourth point: ~7 min
    # to generate, run ONLY the steepest operators on it
    # (scale_curve.py --x100 does exactly that, single-rep).
    scales = [("x1", 5_000), ("x10", 50_000)]
    if "--x30" in sys.argv[1:]:
        scales.append(("x30", 150_000))
    if "--x100" in sys.argv[1:]:
        scales.append(("x100", 500_000))
    # x300 (1.5M docs, ``--x300``) is the FIFTH decade point (round
    # 12): documents ONLY — it exists to extend the winnow/minhash
    # curve on the xxhash64 production path past the r10 md5-spill
    # wall, and the embedding operators have their own envelope at
    # x100; skipping the 600k-vector table saves most of the
    # generation and all of the disk it would never exercise.
    if "--x300" in sys.argv[1:]:
        scales.append(("x300", 1_500_000))
    # x1000 (5M docs, ``--x1000``) is the SIXTH decade PROBE point
    # (round 13): documents only.  It exists for the anchor-arity
    # gate decision — the r13 observable curves cross at ~4.0M docs
    # (SCALE_CURVE_r13 ``winnow_gate_probe``), so 5M is the first
    # generatable decade where the gate should flip to composite
    # anchors.  A full arity-2 winnow RUN at this size (~24B composite
    # rows) is out of single-box scope; the gate decision is the
    # measurable.
    if "--x1000" in sys.argv[1:]:
        scales.append(("x1000", 5_000_000))
    for name, n_docs in scales:
        out = os.path.join(ROOT, "scalefix", name)
        os.makedirs(out, exist_ok=True)
        rng = np.random.RandomState(42)  # same stream per scale
        docs = make_documents(n_docs, rng)
        pq.write_table(docs, os.path.join(out, "documents.parquet"))
        if name in ("x300", "x1000"):
            print(f"{name}: {docs.num_rows} docs (documents only) -> {out}")
            continue
        emb = make_embeddings(int(n_docs * 0.4), rng)
        pq.write_table(emb, os.path.join(out, "embeddings.parquet"))
        print(f"{name}: {docs.num_rows} docs, {emb.num_rows} vecs -> {out}")


if __name__ == "__main__":
    sys.exit(main())
