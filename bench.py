#!/usr/bin/env python
"""Benchmark harness: run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is executed to completion with a noop write (sorts and all —
no collect, nothing driver-side). Timing includes full plan execution;
session/JVM startup is excluded (it is amortized noise at cluster scale).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_analysis_of_twitter_emoji_usage_spark.core import get_spark  # noqa: E402
from big_data_analysis_of_twitter_emoji_usage_spark.plans.catalog import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="big_data_analysis_of_twitter_emoji_usage_spark-bench")

    # Warm the JVM/codegen path once with the cheapest query so the first
    # measured query doesn't pay one-time initialization.
    QUERIES["q7_events_early"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 4)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
