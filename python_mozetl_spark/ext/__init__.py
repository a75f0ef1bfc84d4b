from python_mozetl_spark.ext.dedup import (  # noqa: F401
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_near_pairs,
    simhash_signatures,
)
from python_mozetl_spark.ext.similarity import (  # noqa: F401
    brute_force_topk,
    bucketed_topk,
    cosine_topk_pandas,
)
from python_mozetl_spark.ext.sketches import (  # noqa: F401
    hll_distinct,
    hll_merge,
    kmv_distinct,
)
