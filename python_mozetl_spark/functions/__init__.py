from python_mozetl_spark.functions.hashing import md5_int64, minhash_exprs  # noqa: F401
from python_mozetl_spark.functions.text import (  # noqa: F401
    char_ngrams,
    fingerprint_md5,
    quality_metrics,
    tokens,
    word_shingles,
)
from python_mozetl_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
