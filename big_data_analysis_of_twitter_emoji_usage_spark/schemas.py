"""Declared StructType schemas for the six tweet shapes the reference reads.

The reference infers every schema (`spark.read.json(dir)` — q1:93, and
`readStream.schema(staticDf.schema)` borrowing a batch inference pass —
q2:96-97). Inference over 100 TB of JSON is a full extra scan, so the
engine declares the schemas (SURVEY §1.3); inference survives only as the
dev utility ``infer_tweet_schema``.

Shapes (SURVEY §1.2, FIXTURES.md §A): which Twitter v2 query string the
ingester used determines which expansions exist.
"""

from __future__ import annotations

from pyspark.sql import types as T

# q1/q2/q3 — base sample stream; only data.text is accessed (q1:102).
TWEETS_BASE = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("text", T.StringType()),
                ]
            ),
        )
    ]
)

# q4 — ?tweet.fields=entities&expansions=entities.mentions.username
# (`data.entities.mentions.username` pulled up as array<string>, q4:110;
# top-level `includes` null-guarded, q4:111).
TWEETS_MENTIONS = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("text", T.StringType()),
                    T.StructField(
                        "entities",
                        T.StructType(
                            [
                                T.StructField(
                                    "mentions",
                                    T.ArrayType(
                                        T.StructType(
                                            [T.StructField("username", T.StringType())]
                                        )
                                    ),
                                )
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "includes",
            T.StructType(
                [
                    T.StructField(
                        "users",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.StringType()),
                                    T.StructField("username", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)

# q5 — ?tweet.fields=context_annotations (`data.context_annotations.
# domain.name` -> array<string>, q5:99).
TWEETS_CATEGORIES = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("text", T.StringType()),
                    T.StructField(
                        "context_annotations",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "domain",
                                        T.StructType(
                                            [
                                                T.StructField("id", T.StringType()),
                                                T.StructField("name", T.StringType()),
                                            ]
                                        ),
                                    )
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)

# q6 — ?tweet.fields=geo&expansions=geo.place_id&place.fields=country
# (`includes.places.country` -> array<string>, q6:109).
TWEETS_GEO = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("text", T.StringType()),
                    T.StructField(
                        "geo",
                        T.StructType([T.StructField("place_id", T.StringType())]),
                    ),
                ]
            ),
        ),
        T.StructField(
            "includes",
            T.StructType(
                [
                    T.StructField(
                        "places",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.StringType()),
                                    T.StructField("country", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)

# q7 — historical rehydrated 2006-2009 set: top-level full_text (q7:73).
TWEETS_2006 = T.StructType(
    [
        T.StructField("full_text", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("id", T.LongType()),
    ]
)

# q7 — archive-team 2015 dump: top-level text (q7:96).
TWEETS_2015 = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("id", T.LongType()),
    ]
)

TWEET_SHAPES = {
    "base": TWEETS_BASE,
    "mentions": TWEETS_MENTIONS,
    "categories": TWEETS_CATEGORIES,
    "geo": TWEETS_GEO,
    "2006": TWEETS_2006,
    "2015": TWEETS_2015,
}


def infer_tweet_schema(spark, path: str) -> T.StructType:
    """Dev utility: the reference's inference idiom (q1:93). Not for prod —
    it costs a full scan of the directory."""
    return spark.read.json(path).schema
