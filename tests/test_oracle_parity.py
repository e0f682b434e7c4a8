"""Differential harness mirroring the driver's correctness gate: run every
catalog query on Spark AND its DuckDB oracle over the same parquet tables,
compare schema (column names) + row count + order-insensitive values.

Runs at sf0.001 for speed (the driver uses sf0.01).
"""

import math

import duckdb
import pytest

from big_data_analysis_of_twitter_emoji_usage_spark.plans.catalog import ORACLE_SQL, QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def canon(cols, rows):
    """Order-insensitive canonical form: sort columns by name, round
    floats, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = 0.0 if v == 0 else round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(map(repr, out))


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    assert name in QUERIES, f"oracle {name} has no spark query"
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLE_SQL[name])
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(map(str.lower, s_cols)) == sorted(map(str.lower, d_cols)), (
        f"{name}: column mismatch {s_cols} vs {d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    cs, cd = canon(s_cols, s_rows), canon(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(cs, cd) if a != b
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


# Genuinely non-SQL-expressible ops: custom stateful streaming (per-key
# mutable state with custom emit logic). Their correctness is asserted
# against batch equivalents in dedicated tests instead of the oracle.
ROWS_ONLY_ALLOWED = {"stream_sessionize_events"}


def test_every_query_has_oracle_or_reason():
    rows_only = set(QUERIES) - set(ORACLE_SQL)
    assert rows_only == ROWS_ONLY_ALLOWED, f"rows-only queries: {rows_only}"
