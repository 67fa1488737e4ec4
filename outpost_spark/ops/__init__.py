from outpost_spark.ops.dedup import (  # noqa: F401
    connected_components,
    dedup_keep_canonical,
    dedup_paragraphs,
    dedup_substrings,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_cross_pairs,
    minhash_dedup_pairs,
    minhash_signature,
    ngram_contamination,
    ngram_jaccard_pairs,
    ngram_set,
    simhash,
    simhash_pairs,
)
from outpost_spark.ops.pipeline import (  # noqa: F401
    curate_corpus,
    curate_corpus_v3,
    curate_corpus_v5,
)
from outpost_spark.ops.skew import salted_count_distinct  # noqa: F401
from outpost_spark.ops.packing import pack_sequences, pack_stats  # noqa: F401
from outpost_spark.ops.joins import asof_join, range_join  # noqa: F401
from outpost_spark.ops.sampling import (  # noqa: F401
    hash_fraction,
    hash_sample,
    hash_split,
    sample_temperature_mix,
    shard_manifest,
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
    embedding_near_dup_pairs_ivf,
    ivf_assign_bulk,
    knn_join,
    knn_join_brute,
    knn_join_bulk,
    pq_decode_expr,
    pq_encode,
    pq_topk,
    pq_train,
    quantize_embeddings,
    semantic_dedup,
    semantic_dedup_bulk,
    sign_lsh_bucket,
    train_centroids_kmeans,
)
from outpost_spark.ops.text import (  # noqa: F401
    approx_top_tokens,
    c4_filters,
    chunk_documents,
    fingerprint,
    fix_mojibake,
    gopher_quality,
    language_id,
    length_histogram,
    length_percentiles,
    mojibake_stats,
    ngram_repetition_stats,
    pii_redact,
    quality_score,
    repetition_stats,
    token_stats,
    top_tokens,
)
from outpost_spark.ops.lm import (  # noqa: F401
    bigram_lm_score,
    perplexity_gate,
    train_bigram_counts,
)
