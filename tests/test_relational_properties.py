"""Property-based tests (hypothesis) for relational operators whose
newest semantics have no DuckDB oracle entry: asof_join's tolerance
bound is checked against pandas.merge_asof — an independent,
widely-trusted as-of implementation — on randomized key/timestamp
layouts (duplicate keys, empty sides, matches exactly AT the bound)."""

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import given, settings, strategies as st

from big_data_analysis_of_twitter_emoji_usage_spark.operators.relational import asof_join

BASE = datetime(2024, 1, 1)

# seconds offsets over a couple of hours; small key space forces
# duplicate keys and interleaved timelines
left_rows = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 7200)),
    min_size=1, max_size=12,
)
right_rows = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 7200)),
    min_size=0, max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(left_rows, right_rows, st.sampled_from([None, 60, 600]))
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows, tol):
    # unique right timestamps per key: merge_asof's tie policy among
    # duplicate (key, ts) right rows differs from the engine's
    # documented max-first-payload tiebreak, which is oracle-pinned
    # separately — dedupe so this test isolates the tolerance bound
    rrows = list({(k, s): None for k, s in rrows}.keys())
    left = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), i) for i, (k, s) in enumerate(lrows)],
        "k long, lts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), f"p{k}-{s}") for k, s in rrows],
        "k long, rts timestamp, payload string",
    ) if rrows else spark.createDataFrame(
        [], "k long, rts timestamp, payload string"
    )
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_payload=["payload"], tolerance=tol,
    )
    got = {r["lid"]: r["payload"] for r in out.collect()}

    lpdf = pd.DataFrame(
        [(k, pd.Timestamp(BASE + timedelta(seconds=s)), i)
         for i, (k, s) in enumerate(lrows)],
        columns=["k", "ts", "lid"],
    ).sort_values(["ts", "lid"])
    rpdf = pd.DataFrame(
        {
            "k": pd.Series([k for k, _ in rrows], dtype="int64"),
            "ts": pd.Series(
                [pd.Timestamp(BASE + timedelta(seconds=s)) for _, s in rrows],
                dtype="datetime64[ns]",
            ),
            "payload": pd.Series(
                [f"p{k}-{s}" for k, s in rrows], dtype=object
            ),
        }
    ).sort_values(["ts", "payload"])
    merged = pd.merge_asof(
        lpdf, rpdf, on="ts", by="k", direction="backward",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    want = {
        int(r.lid): (None if pd.isna(r.payload) else r.payload)
        for r in merged.itertuples()
    }
    assert got == want
