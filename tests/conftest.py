import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_analysis_of_twitter_emoji_usage_spark.core import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    spark = get_spark(
        app_name="big_data_analysis_of_twitter_emoji_usage_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            # static conf: managed-table tests (bucketing) need a
            # session-scoped scratch warehouse
            "spark.sql.warehouse.dir": str(
                tmp_path_factory.mktemp("spark_warehouse")
            ),
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
