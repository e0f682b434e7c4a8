"""The seven reference questions end-to-end over tweet-shaped fixtures
(SURVEY §5.4): each question's DataFrame chain on its own tweet shape,
with invariants hand-checkable from the fixture construction.
"""

import pytest
from pyspark.sql import functions as F

from big_data_analysis_of_twitter_emoji_usage_spark.functions.emoji import extract_emojis
from big_data_analysis_of_twitter_emoji_usage_spark.plans.queries import (
    emoji_by_dimension,
    emoji_word_counts,
    historical_top_emojis,
    token_by_dimension,
    top_emojis,
)
from big_data_analysis_of_twitter_emoji_usage_spark.schemas import (
    TWEETS_2006,
    TWEETS_2015,
    TWEETS_BASE,
    TWEETS_CATEGORIES,
    TWEETS_GEO,
    TWEETS_MENTIONS,
)
from tests.tweet_fixtures import (
    tweets_2006,
    tweets_2015,
    tweets_base,
    tweets_categories,
    tweets_geo,
    tweets_mentions,
)


def df_of(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def base_df(spark):
    return df_of(spark, tweets_base(400), TWEETS_BASE).cache()


def test_q1_most_popular(spark, base_df):
    out = top_emojis(base_df).collect()
    assert len(out) > 0
    counts = [r.Count for r in out]
    assert counts == sorted(counts, reverse=True)
    # tiebreak: equal counts ordered by emoji ascending (q1:112)
    for a, b in zip(out, out[1:]):
        if a.Count == b.Count:
            assert a.Emoji < b.Emoji


def test_q1_least_popular_is_reverse_metric(spark, base_df):
    desc = {(r.Emoji, r.Count) for r in top_emojis(base_df).collect()}
    asc = {(r.Emoji, r.Count) for r in top_emojis(base_df, ascending=True).collect()}
    assert desc == asc  # same table, opposite presentation order


def test_q1_rlike_param_lookup(spark, base_df):
    one = top_emojis(base_df, emoji_rlike="\U0001f600").collect()
    assert len(one) == 1 and one[0].Emoji == "\U0001f600"
    # regex semantics, not equality: '.' matches every token (q1:204)
    dot = top_emojis(base_df, emoji_rlike=".").collect()
    assert len(dot) == len(top_emojis(base_df).collect())


def test_q2_is_q1_on_stream():
    # covered by tests/test_streaming_equivalence.py::test_batch_stream_equivalence_q1
    pass


def test_q3_counts_and_ratio(spark, base_df):
    row = emoji_word_counts(base_df).collect()[0]
    assert row["Emoji Count"] > 0 and row["Word Count"] > 0
    assert row.Ratio == pytest.approx(row["Emoji Count"] / row["Word Count"])


def test_q4_emoji_by_mentioned_user(spark):
    df = df_of(spark, tweets_mentions(400), TWEETS_MENTIONS)
    out = emoji_by_dimension(df, "username")
    rows = out.collect()
    assert rows and set(out.columns) == {"Username", "Emoji", "Count"}
    usernames = {r.Username for r in rows}
    assert usernames <= {"alice", "bob", "carol", "dave", "erin", "frank"}


def test_q4_double_explode_cross_product(spark):
    # 1 tweet, 2 mentions, 3 emoji -> exactly 6 (user, emoji) rows (G3)
    rows = [{
        "data": {
            "id": "0",
            "text": "\U0001f600 \U0001f601 \U0001f64f",
            "entities": {"mentions": [{"username": "a"}, {"username": "b"}]},
        },
        "includes": {"users": [{"id": "0", "username": "a"}]},
    }]
    df = df_of(spark, rows, TWEETS_MENTIONS)
    out = emoji_by_dimension(df, "username").collect()
    assert sum(r.Count for r in out) == 6
    assert {(r.Username, r.Emoji) for r in out} == {
        (u, e) for u in "ab" for e in ["\U0001f600", "\U0001f601", "\U0001f64f"]
    }


def test_q4_null_includes_guard(spark):
    rows = [
        {"data": {"id": "0", "text": "\U0001f600",
                  "entities": {"mentions": [{"username": "a"}]}},
         "includes": None},  # must be dropped (q4:111)
        {"data": {"id": "1", "text": "\U0001f600",
                  "entities": {"mentions": [{"username": "b"}]}},
         "includes": {"users": [{"id": "1", "username": "b"}]}},
    ]
    out = emoji_by_dimension(df_of(spark, rows, TWEETS_MENTIONS), "username").collect()
    assert [(r.Username, r.Count) for r in out] == [("b", 1)]


def test_q5_emoji_by_category(spark):
    df = df_of(spark, tweets_categories(400), TWEETS_CATEGORIES)
    out = emoji_by_dimension(df, "category").collect()
    assert out and {r.Name for r in out} <= {
        "Musician", "Person", "Sports", "TV Shows", "Politician"
    }


def test_q6_emoji_by_country_variants(spark):
    df = df_of(spark, tweets_geo(400), TWEETS_GEO).cache()
    full = emoji_by_dimension(df, "country")
    assert full.collect()
    # include-one: rlike on the dimension (q6:168)
    only = emoji_by_dimension(df, "country", include_rlike="^Japan$")
    assert {r.Country for r in only.collect()} == {"Japan"}
    # exclude-one: negated contains (q6:219)
    excl = emoji_by_dimension(df, "country", exclude_contains="United")
    assert "United States" not in {r.Country for r in excl.collect()}


def test_q7_historical_field_variants(spark):
    old = df_of(spark, tweets_2006(300), TWEETS_2006)
    new = df_of(spark, tweets_2015(300), TWEETS_2015)
    # 2006-2009 texts carry only ASCII emoticons -> zero in-range emoji
    assert historical_top_emojis(old, "full_text").collect() == []
    assert len(historical_top_emojis(new, "text").collect()) > 0


def test_case_insensitive_count_resolution(spark, base_df):
    """q1:111-112 depends on spark.sql.caseSensitive=false: ordering by
    'Count' must resolve against the aggregate however it was cased."""
    out = (
        base_df.select(F.explode(extract_emojis(F.col("data.text"))).alias("Emoji"))
        .groupBy("Emoji")
        .count()
        .orderBy(F.desc("Count"), "Emoji")  # 'Count' vs actual 'count'
        .collect()
    )
    assert out and out[0]["count"] == max(r["count"] for r in out)
