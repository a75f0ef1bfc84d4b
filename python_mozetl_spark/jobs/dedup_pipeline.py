"""End-to-end corpus cleaning: the dedup pipeline a training-data prep
runs before tokenization, composed from the engine's own tiers in the
cost order the dedup module prescribes (ext/dedup.py module doc):

1. exact dedup (md5 fingerprint groupBy) — removes bit-identical
   copies first, shrinking the near-dup candidate space;
2. MinHash LSH + exact-Jaccard verify over the exact-survivors;
3. connected components over the near-dup pair graph — transitive
   closure, one canonical (min-id) doc per duplicate class.

Output: one row per input doc — ``(doc_id, status, canonical_id)``
with status ∈ {kept, exact_dup, near_dup}.  ``canonical_id`` is one
hop: an exact duplicate points at its fingerprint keeper, a near-dup
at its cluster representative (chasing keeper→cluster chains is a
policy choice left to the caller; the one-hop form is what the oracle
mirrors).  The kept set is ``status = 'kept'``; everything is a
DataFrame until the sink, so the pipeline inherits every scale guard
rail of its parts (bounded LSH buckets, staged signatures, bounded
component rounds).

No reference counterpart — this is SURVEY §2 extension territory (the
reference has no dedup at all); it exists so "switch your prep
pipeline to this engine" is a one-call story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.ext.dedup import exact_duplicates, minhash_lsh_pairs
from python_mozetl_spark.ext.graph import connected_components


def clean_corpus(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, status, canonical_id) for every input document.

    ``signatures``: optional precomputed
    :func:`~python_mozetl_spark.ext.dedup.minhash_signature_table`
    over (a superset of) ``documents`` — the LSH stage then reuses it
    (restricted to the exact-dedup keepers) instead of re-running the
    corpus signature pass.
    """
    ex = exact_duplicates(documents, id_col, text_col)
    keepers = ex.where(F.col(id_col) == F.col("keeper_id")).select(id_col)
    kept_docs = documents.join(keepers, id_col)
    pairs = minhash_lsh_pairs(
        kept_docs, id_col, text_col,
        threshold=threshold, num_hashes=num_hashes, bands=bands,
        signatures=signatures,
    )
    comp = connected_components(pairs).withColumnRenamed("vertex", id_col)
    is_exact_dup = F.col(id_col) != F.col("keeper_id")
    in_cluster = F.col("component").isNotNull()
    return (
        ex.select(id_col, "keeper_id")
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.when(is_exact_dup, F.lit("exact_dup"))
            .when(in_cluster & (F.col("component") != F.col(id_col)), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            # no cast: keeper_id/component/id all carry the input id
            # type, so canonical_id keeps it too (a bigint cast would
            # silently null every row for string document ids)
            F.when(is_exact_dup, F.col("keeper_id"))
            .when(in_cluster, F.col("component"))
            .otherwise(F.col(id_col))
            .alias("canonical_id"),
        )
    )
