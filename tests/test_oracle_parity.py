"""Differential harness mirroring the driver's correctness gate: run every
catalog query on Spark AND its DuckDB oracle over the same parquet tables,
compare schema (column names) + row count + order-insensitive values.

Runs at sf0.001 for speed (the driver uses sf0.01).
"""

import math

import duckdb
import pytest

from pyspark.sql.types import ArrayType, MapType, StructType

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
    floats, sort rows. Column order is CASE-INSENSITIVE (index as the
    tiebreak): the name assertion below tolerates casing differences
    between the engines ('Username' vs 'username'), and a case-SENSITIVE
    sort would then zip values column-against-wrong-column — ASCII
    uppercase sorts before all lowercase (review find). The tiebreak
    among same-lowercase duplicates is the EXACT name (then index), so
    case-variant duplicate columns emitted in different orders by the
    two engines ('ID','id' vs 'id','ID') still zip name-against-same-
    name; only identical duplicate names stay position-ambiguous."""
    order = sorted(
        range(len(cols)), key=lambda i: (cols[i].lower(), cols[i], i)
    )
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
    # Driver constraint discovered in r3: the external gate's pandas
    # canonicalization cannot hash array/map/struct columns (it crashed
    # on inverted_index's postings). No oracle query may emit one —
    # reshape with posexplode/concat_ws instead.
    nested = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, (
        f"{name}: nested-typed output columns {nested} would crash the "
        "driver's canonicalization; emit scalar columns"
    )
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


# Since r4 every catalog query is oracle-paired: the two former rows-only
# entries (custom stateful streaming sessionize, sketch percentiles) were
# made self-verifying — the in-plan check booleans are what the driver
# hashes, with the oracle pinning them true.
ROWS_ONLY_ALLOWED = set()


def test_approx_percentiles_within_tolerance(spark, sf_dir, duck):
    """The raw sketch percentiles can't hash-match an oracle (they return
    a data sample, not an interpolated value), but each must land inside a
    ±2-percentile bracket of the exact distribution. The catalog query now
    runs this bracket check in-plan and emits booleans; this test keeps a
    raw-value variant of the same assertion against DuckDB's exact
    quantiles, so the tolerance itself stays independently pinned."""
    from pyspark.sql import functions as F

    from big_data_analysis_of_twitter_emoji_usage_spark.core import load_events

    sketch = (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            *[
                F.expr(f"approx_percentile(value, {q}, 10000)").alias(
                    f"p{int(q * 100)}"
                )
                for q in (0.5, 0.9, 0.99)
            ]
        )
    )
    approx = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in sketch.collect()
    }
    quantiles = (0.5, 0.9, 0.99)
    brackets = {}
    for etype in approx:
        brackets[etype] = [
            duck.sql(
                "SELECT quantile_cont(value, {lo}), quantile_cont(value, {hi})"
                " FROM events WHERE event_type = '{t}'".format(
                    lo=max(q - 0.02, 0.0), hi=min(q + 0.02, 1.0), t=etype
                )
            ).fetchone()
            for q in quantiles
        ]
    for etype, vals in approx.items():
        for (a, (lo, hi)), q in zip(zip(vals, brackets[etype]), quantiles):
            assert lo - 1e-6 <= a <= hi + 1e-6, (
                f"{etype} p{int(q*100)}: approx {a} outside [{lo}, {hi}]"
            )


def test_every_query_has_oracle_or_reason():
    rows_only = set(QUERIES) - set(ORACLE_SQL)
    assert rows_only == ROWS_ONLY_ALLOWED, f"rows-only queries: {rows_only}"
