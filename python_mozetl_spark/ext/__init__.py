from python_mozetl_spark.ext.dedup import (  # noqa: F401
    incremental_lsh_pairs,
    bounded_bucket_pairs,
    duplicated_span_coverage,
    cross_corpus_lsh_filter,
    cut_duplicated_spans,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signature_table,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
    winnow_fingerprints,
)
from python_mozetl_spark.ext.graph import (  # noqa: F401
    connected_components,
    pagerank,
)
from python_mozetl_spark.ext.mixing import (  # noqa: F401
    domain_quota,
    ring_negative_samples,
    shuffle_shards,
    split_assign,
    weighted_mix,
)
from python_mozetl_spark.ext.packing import (  # noqa: F401
    length_bucketed_batches,
    pack_sequences,
    sliding_window_chunks,
)
from python_mozetl_spark.ext.quality import (  # noqa: F401
    decontaminate,
    ngram_occurrence_stats,
    repetition_stats,
    tfidf_top_terms,
    token_entropy,
    unigram_logprob,
)
from python_mozetl_spark.ext.search import (  # noqa: F401
    bm25_topk,
    index_terms,
    phrase_match,
    phrase_search,
    positional_postings,
)
from python_mozetl_spark.ext.similarity import (  # noqa: F401
    brute_force_topk,
    kcenter_coreset,
    lloyd_clusters,
    bucketed_topk,
    cosine_topk_pandas,
    quantized_topk,
)
from python_mozetl_spark.ext.vocab import (  # noqa: F401
    bpe_encode,
    bpe_learn,
    pair_counts,
    word_freqs,
)
from python_mozetl_spark.ext.sketches import (  # noqa: F401
    cm_estimate,
    cm_sketch,
    heavy_hitters,
    histogram_quantiles,
    kmv_overlap,
    log_histogram,
    merge_histograms,
    hll_distinct,
    hll_merge,
    kmv_distinct,
    mg_candidates,
)
