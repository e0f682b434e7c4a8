from big_data_analysis_of_twitter_emoji_usage_spark.streaming.jobs import (  # noqa: F401
    run_stream_to_memory,
    sessionize_stream,
    stream_near_dedup_minhash,
    stream_query,
    windowed_event_counts,
)
