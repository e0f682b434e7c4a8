"""Property-based tests (hypothesis) for safety/shaping operators:
randomized inputs checked against independent Python models —
the redaction-completeness and dedup-set laws the fixed fixtures can't
sample broadly.
"""

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from big_data_analysis_of_twitter_emoji_usage_spark.operators.safety import (
    decontaminate,
    pii_redact,
    pii_scan,
)
from big_data_analysis_of_twitter_emoji_usage_spark.operators.shaping import (
    hash_sample,
)

words = st.text(alphabet="abcXYZ09._+-@", min_size=1, max_size=8)
emails = st.builds(
    lambda a, b: f"{a}@{b}.com",
    st.text(alphabet="abc09._", min_size=1, max_size=6).filter(
        lambda s: s.strip("._")
    ),
    st.text(alphabet="abc09", min_size=1, max_size=6),
)
phones = st.builds(
    lambda cc, a, b, c: f"+{cc}-{a:03d}-{b:03d}-{c:04d}",
    st.integers(1, 99), st.integers(0, 999), st.integers(0, 999),
    st.integers(0, 9999),
)
ssns = st.builds(
    lambda a, b, c: f"{a:03d}-{b:02d}-{c:04d}",
    st.integers(0, 999), st.integers(0, 99), st.integers(0, 9999),
)
ips = st.builds(
    lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
    *[st.integers(0, 255)] * 4,
)
digit_runs = st.text(alphabet="0123456789.-", min_size=1, max_size=12)
piece = st.one_of(words, emails, phones, ssns, ips, digit_runs)
pii_texts = st.lists(piece, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(st.lists(pii_texts, min_size=1, max_size=6))
def test_redaction_is_complete(spark, batch):
    """Scanning redacted text finds zero PII of any class — placeholders
    contain no digits, so no replacement can manufacture a new match."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    redone = pii_scan(
        pii_redact(df).select("doc_id", F.col("redacted").alias("text"))
    )
    assert all(r["n_pii"] == 0 for r in redone.collect())


@settings(max_examples=25, deadline=None)
@given(st.lists(pii_texts, min_size=1, max_size=6))
def test_redaction_count_matches_scan(spark, batch):
    """n_redactions equals the pre-redaction per-class scan total."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    scans = {r["doc_id"]: r["n_pii"] for r in pii_scan(df).collect()}
    reds = {r["doc_id"]: r["n_redactions"] for r in pii_redact(df).collect()}
    assert scans == reds


vocab = [f"w{i}" for i in range(12)]
docs = st.lists(st.sampled_from(vocab), min_size=0, max_size=12).map(
    " ".join
)


@settings(max_examples=20, deadline=None)
@given(st.lists(docs, min_size=1, max_size=6), st.lists(docs, max_size=3))
def test_decontaminate_matches_set_model(spark, corpus, bench):
    """decontaminate(n=3) agrees with a Python set model: per doc, the
    count of its DISTINCT word 3-grams present in the benchmark's 3-gram
    set; docs under 3 tokens are excluded."""
    def grams(t):
        # split(" ") keeps empty tokens — mirror Spark's F.split exactly
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    bench_set = set().union(*[grams(t) for t in bench]) if bench else set()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [(t,) for t in bench] or [("",)], "text string"
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_contaminated_ngrams"])
        for r in decontaminate(df, bdf, n=3).collect()
    }
    want = {
        i: (len(grams(t)), len(grams(t) & bench_set))
        for i, t in enumerate(corpus)
        if len(t.split(" ")) >= 3
    }
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(0, 10**9), min_size=1, max_size=30, unique=True),
    st.sampled_from(["1000", "4000", "8000", "c000", "ffff"]),
)
def test_hash_sample_matches_python_md5(spark, ids, thr):
    """The deterministic-sampling claim, checked against Python's md5:
    kept ids are exactly those whose digest prefix sorts below the
    threshold — independent of partitioning or engine."""
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"] for r in hash_sample(df, thr).collect()}
    want = {
        i for i in ids
        if hashlib.md5(str(i).encode()).hexdigest()[:4] < thr
    }
    assert got == want


# --- behavioral analytics laws -------------------------------------------

import datetime as _dt

from big_data_analysis_of_twitter_emoji_usage_spark.operators.relational import funnel

_T0 = _dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),                      # user
        st.integers(0, 10_000),                 # seconds offset
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=40,
)


def _model_funnel(rows, steps):
    by_user = {}
    for u, s, t in rows:
        by_user.setdefault(u, []).append((s, t))
    reached = [0] * len(steps)
    for u, evs in by_user.items():
        bound = None
        for k, step in enumerate(steps):
            cand = [
                s for s, t in evs
                if t == step and (bound is None or s >= bound)
            ]
            if not cand:
                break
            bound = min(cand)
            reached[k] += 1
    return len(by_user), reached


@settings(max_examples=20, deadline=None)
@given(events_strategy)
def test_funnel_matches_model(spark, rows):
    """funnel() equals an independent per-user simulation of the
    chained min-timestamp semantics (>= bound, simultaneous allowed)."""
    steps = ["view", "click", "purchase"]
    df = spark.createDataFrame(
        [(u, _T0 + _dt.timedelta(seconds=s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )
    got = funnel(df, steps).collect()[0]
    n_users, reached = _model_funnel(rows, steps)
    assert got["n_users"] == n_users
    assert [got[f"n_step{i+1}"] for i in range(3)] == reached
