from outpost_spark.ops.dedup import (  # noqa: F401
    connected_components,
    dedup_keep_canonical,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    ngram_set,
    simhash,
)
from outpost_spark.ops.pipeline import curate_corpus  # noqa: F401
from outpost_spark.ops.sampling import (  # noqa: F401
    hash_fraction,
    hash_sample,
    hash_split,
    stratified_quota,
)
from outpost_spark.ops.similarity import (  # noqa: F401
    assign_ivf_expr,
    assign_ivf_pandas,
    cosine_expr,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    sign_lsh_bucket,
    train_centroids_kmeans,
)
from outpost_spark.ops.text import (  # noqa: F401
    fingerprint,
    language_id,
    length_histogram,
    length_percentiles,
    pii_redact,
    quality_score,
    repetition_stats,
    token_stats,
    top_tokens,
)
