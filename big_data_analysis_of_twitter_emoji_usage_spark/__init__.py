"""PySpark-native analytics engine with the query and data-processing
capabilities of christian-palko/Big-Data-Analysis-of-Twitter-Emoji-Usage.

The reference is a seven-module Scala/Spark-2.4 suite answering seven
Twitter-emoji analytics questions (batch + Structured Streaming). This
package re-expresses every capability Spark-first on PySpark 4:

- ``core``              session factory tuned for large-cluster defaults
- ``schemas``           declared StructType schemas for the six tweet shapes
- ``functions.emoji``   the emoji-extraction kernel (reference q1:97-113)
- ``functions.text``    word tokenizer, language-ID, quality, fingerprints
- ``functions.vectors`` cosine/dot-product column expressions
- ``sources``           batch/stream readers + the rolling-JSONL ingester
- ``operators``         dedup (exact/MinHash/SimHash/Jaccard), ANN search,
                        multimodal binary-column plumbing
- ``plans``             the seven reference question builders + relational
                        extensions (joins/windows the reference lacks)
- ``streaming``         the same builders on unbounded sources
"""

__version__ = "0.1.0"

from big_data_analysis_of_twitter_emoji_usage_spark.core import get_spark  # noqa: F401
