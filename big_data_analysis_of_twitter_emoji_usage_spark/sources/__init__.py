from big_data_analysis_of_twitter_emoji_usage_spark.sources.readers import (  # noqa: F401
    read_tweets,
    stream_tweets,
)
from big_data_analysis_of_twitter_emoji_usage_spark.sources.ingest import (  # noqa: F401
    RollingJsonlWriter,
    replay_as_stream_dir,
)
from big_data_analysis_of_twitter_emoji_usage_spark.sources.writers import (  # noqa: F401
    compact_parquet_dir,
    compact_partitioned_parquet,
    write_bucketed_table,
    write_jsonl,
    write_parquet_clustered,
    write_parquet_partitioned,
)
