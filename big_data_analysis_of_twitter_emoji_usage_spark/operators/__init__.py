from big_data_analysis_of_twitter_emoji_usage_spark.operators.dedup import (  # noqa: F401
    exact_duplicates,
    doc_shingles,
    minhash_signatures,
    lsh_candidate_pairs,
    near_dup_pairs,
    simhash_fingerprints,
)
from big_data_analysis_of_twitter_emoji_usage_spark.operators.similarity import (  # noqa: F401
    cosine_knn_bruteforce,
    cosine_knn_sign_lsh,
)
from big_data_analysis_of_twitter_emoji_usage_spark.operators.text_analysis import (  # noqa: F401
    language_id,
    quality_scores,
    token_stats,
    doc_fingerprints,
)
