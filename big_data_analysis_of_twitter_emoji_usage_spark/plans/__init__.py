from big_data_analysis_of_twitter_emoji_usage_spark.plans.queries import (  # noqa: F401
    token_counts,
    token_by_dimension,
    global_token_counts,
    top_emojis,
    emoji_by_dimension,
    emoji_word_counts,
    historical_top_emojis,
)
