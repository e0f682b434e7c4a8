"""Unit coverage for similarity primitives — in particular the
sign_bucket dimensionality contract (VERDICT r2 #4): multi-table LSH
reads dims [t*bits, (t+1)*bits), so a vector shorter than offset+bits
must error loudly instead of silently collapsing into one null-derived
degenerate bucket."""

import pytest
from pyspark.sql import functions as F

from big_data_analysis_of_twitter_emoji_usage_spark.operators.similarity import sign_bucket


@pytest.fixture()
def vecs(spark):
    return spark.createDataFrame(
        [(1, [1.0, -1.0, 2.0, -0.5])], ["id", "v"]
    )


def test_sign_bucket_in_range(vecs):
    got = vecs.select(
        sign_bucket(F.col("v"), bits=3).alias("b"),
        sign_bucket(F.col("v"), bits=2, offset=2).alias("b2"),
    ).collect()[0]
    assert got["b"] == "101"
    assert got["b2"] == "10"


def test_sign_bucket_short_vector_errors(vecs):
    with pytest.raises(Exception, match="fewer than"):
        vecs.select(
            sign_bucket(F.col("v"), bits=3, offset=2).alias("b")
        ).collect()


def test_lsh_hyperplanes_rejects_nnz_over_dim():
    from big_data_analysis_of_twitter_emoji_usage_spark.operators.similarity import lsh_hyperplanes

    with pytest.raises(ValueError, match="nnz=9 > dim=8"):
        lsh_hyperplanes(bits=2, tables=2, dim=8, nnz=9)
