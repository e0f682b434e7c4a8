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


def test_hyperplane_expression_and_udf_sigs_bit_identical(spark, sf_dir):
    """The two signature implementations — the portable JVM expression
    (hyperplane_bucket, a left-deep Add tree summed in schedule order)
    and the Arrow-batched numpy path (_hyperplane_sigs_udf, accumulated
    over term slots in the same order) — must emit bit-identical bucket
    strings: this is the contract that lets the DuckDB oracle's unrolled
    SQL mirror the vectorized plan. IEEE doubles added in one fixed
    order agree everywhere; any reordering in either path breaks this
    on near-orthogonal vectors."""
    from pyspark.sql import functions as F

    from big_data_analysis_of_twitter_emoji_usage_spark.core import load_table
    from big_data_analysis_of_twitter_emoji_usage_spark.operators.similarity import (
        _as_double,
        _hyperplane_sigs_udf,
        hyperplane_bucket,
        lsh_hyperplanes,
    )

    bits, tables, dim = 5, 4, 64
    planes = lsh_hyperplanes(bits, tables, dim)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("_v")
    )
    expr_sigs = emb.select(
        "vec_id",
        *[
            hyperplane_bucket(F.col("_v"), planes[t], dim).alias(f"s{t}")
            for t in range(tables)
        ],
    )
    udf_sigs = emb.select(
        "vec_id", _hyperplane_sigs_udf(planes, dim)(F.col("_v")).alias("arr")
    ).select(
        "vec_id", *[F.col("arr")[t].alias(f"s{t}") for t in range(tables)]
    )
    a = sorted(map(tuple, expr_sigs.collect()))
    b = sorted(map(tuple, udf_sigs.collect()))
    assert len(a) > 0
    assert a == b
