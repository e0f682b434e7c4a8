from big_data_analysis_of_twitter_emoji_usage_spark.operators.dedup import (  # noqa: F401
    build_minhash_store,
    connected_components,
    dedup_against_reference,
    doc_shingle_arrays,
    doc_shingles,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_pairs,
    near_dup_pairs_against_store,
    near_dup_pairs_cross,
    simhash_fingerprints,
)
from big_data_analysis_of_twitter_emoji_usage_spark.operators.multimodal import (  # noqa: F401
    attach_binary_payload,
    binary_metadata,
    decode_batch,
)
from big_data_analysis_of_twitter_emoji_usage_spark.operators.relational import (  # noqa: F401
    asof_join,
    sessionize,
)
from big_data_analysis_of_twitter_emoji_usage_spark.operators.similarity import (  # noqa: F401
    build_ivf_index,
    cosine,
    cosine_knn_bruteforce,
    cosine_knn_ivf,
    cosine_knn_ivf_probe,
    cosine_knn_join,
    cosine_knn_join_ivf,
    cosine_knn_join_ivf_probe,
    cosine_knn_sign_lsh,
    cosine_with_norms,
    embedding_near_dup_pairs,
    sign_bucket,
)
from big_data_analysis_of_twitter_emoji_usage_spark.operators.text_analysis import (  # noqa: F401
    bpe_token_stats,
    doc_fingerprints,
    language_id,
    quality_scores,
    token_stats,
)
