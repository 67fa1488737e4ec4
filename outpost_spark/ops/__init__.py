from outpost_spark.ops.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signature,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    simhash,
    ngram_set,
    ngram_jaccard_pairs,
)
from outpost_spark.ops.similarity import (  # noqa: F401
    cosine_expr,
    cosine_topk,
    sign_lsh_bucket,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)
from outpost_spark.ops.text import (  # noqa: F401
    token_stats,
    quality_score,
    language_id,
    fingerprint,
)
