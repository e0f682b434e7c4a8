from big_data_analysis_of_twitter_emoji_usage_spark.sources.readers import (  # noqa: F401
    read_tweets,
    stream_tweets,
)
from big_data_analysis_of_twitter_emoji_usage_spark.sources.ingest import (  # noqa: F401
    RollingJsonlWriter,
    replay_as_stream_dir,
)
