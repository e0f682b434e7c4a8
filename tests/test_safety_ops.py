"""Semantic unit tests for operators.safety — hand-computed small
inputs pinning behaviors the DuckDB oracle can't isolate (exact
redacted strings, per-class overlap rules, shard permutation laws)."""

import pytest
from pyspark.sql import functions as F

from big_data_analysis_of_twitter_emoji_usage_spark.operators.safety import (
    decontaminate,
    pii_redact,
    pii_scan,
    repetition_scores,
)
from big_data_analysis_of_twitter_emoji_usage_spark.operators.shaping import (
    mix_sources,
    shuffle_shards,
)


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pii_scan_counts_per_class(spark):
    df = docs_df(spark, [
        "mail a@b.com and c.d+x@e-f.org end",          # 2 emails
        "call +1-555-123-4567 or +44-202-555-0123",     # 2 phones
        "ssn 123-45-6789 ip 10.0.255.1",                # 1 ssn, 1 ipv4
        "clean text only",
    ])
    rows = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert (rows[0]["n_email"], rows[0]["n_pii"]) == (2, 2)
    assert (rows[1]["n_phone"], rows[1]["n_pii"]) == (2, 2)
    assert (rows[2]["n_ssn"], rows[2]["n_ipv4"], rows[2]["n_pii"]) == (1, 1, 2)
    assert rows[3]["n_pii"] == 0


def test_pii_phone_not_double_counted_as_ssn(spark):
    df = docs_df(spark, ["num +1-555-123-4567 ok"])
    r = pii_scan(df).collect()[0]
    assert r["n_phone"] == 1 and r["n_ssn"] == 0


def test_pii_redact_exact_output(spark):
    df = docs_df(spark, ["hi a@b.com ssn 123-45-6789 at 10.1.2.3 done"])
    r = pii_redact(df).collect()[0]
    assert r["redacted"] == "hi <EMAIL> ssn <SSN> at <IPV4> done"
    assert r["n_redactions"] == 3


def test_decontaminate_flags_exact_ngram_overlap(spark):
    words = [f"w{i}" for i in range(20)]
    bench_text = " ".join(words)
    # doc1 shares a 13-gram window with bench; doc2 shuffles word order
    overlap = " ".join(words[2:15]) + " zz yy xx"
    disjoint = " ".join(reversed(words))
    df = docs_df(spark, [bench_text, overlap, disjoint])
    bench = df.filter(F.col("doc_id") == 0).select("text")
    out = {r["doc_id"]: r for r in decontaminate(df, bench).collect()}
    assert out[0]["contaminated"] and out[1]["contaminated"]
    assert not out[2]["contaminated"]
    assert out[1]["n_contaminated_ngrams"] == 1


def test_decontaminate_short_docs_excluded(spark):
    df = docs_df(spark, ["only five words right here now", " ".join(
        f"w{i}" for i in range(15)
    )])
    out = decontaminate(df, df.limit(0)).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_decontaminate_array_guard_switches_to_join(spark):
    """The r8 quadratic guard: an over-limit benchmark requested with
    strategy='array' must warn and auto-switch to the join strategy,
    with identical output rows (the two strategies are semantically
    equal by construction — this pins that the switch path really runs
    the join shape on the same inputs)."""
    words = [f"w{i}" for i in range(40)]
    df = docs_df(
        spark,
        [" ".join(words), " ".join(words[5:25]), " ".join(reversed(words))],
    )
    bench = df.filter(F.col("doc_id") == 0).select("text")
    # bench has 40-13+1 = 28 distinct 13-grams > limit of 5.
    with pytest.warns(RuntimeWarning, match="array_bench_limit"):
        switched = decontaminate(
            df, bench, strategy="array", array_bench_limit=5
        )
    joined = decontaminate(df, bench, strategy="join")
    assert sorted(map(tuple, switched.collect())) == sorted(
        map(tuple, joined.collect())
    )
    # under the limit, the array shape runs without warning
    small = decontaminate(df, bench, strategy="array", array_bench_limit=100)
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, joined.collect())
    )


def test_decontaminate_guard_probes_distinct_grams_not_rows(spark):
    """The guard's probe is the DISTINCT benchmark gram count — the
    collect_set broadcast size that actually drives the array
    strategy's per-row cost. A duplicate-heavy benchmark (many docs
    sharing the same 13-grams) whose raw exploded rows exceed the
    limit but whose distinct set does not must NOT trip the guard
    (review find: a false trip is a hard ValueError on a streaming
    corpus)."""
    import warnings

    words = [f"w{i}" for i in range(15)]  # 15-13+1 = 3 distinct grams
    # 10 identical benchmark docs: 30 exploded gram rows, 3 distinct.
    bench = docs_df(spark, [" ".join(words)] * 10).select("text")
    df = docs_df(spark, [" ".join(words), "unrelated " * 14])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails
        out = decontaminate(df, bench, strategy="array", array_bench_limit=5)
    rows = {r["doc_id"]: r["contaminated"] for r in out.collect()}
    assert rows[0] is True and rows[1] is False


def test_decontaminate_array_guard_raises_on_streaming_corpus(spark, tmp_path):
    """With a STREAMING corpus the array→join auto-switch is impossible
    (append mode rules out the join strategy's per-doc aggregation), so
    an over-limit benchmark must raise at plan build, not silently run
    the quadratic probe."""
    words = [f"w{i}" for i in range(40)]
    bench = docs_df(spark, [" ".join(words)]).select("text")
    static = docs_df(spark, [" ".join(words[3:20])])
    p = str(tmp_path / "docs")
    static.write.parquet(p)
    stream = spark.readStream.schema(static.schema).parquet(p)
    with pytest.raises(ValueError, match="streaming"):
        decontaminate(stream, bench, strategy="array", array_bench_limit=5)


def test_training_pipeline_array_guard_switches_to_join(spark):
    from big_data_analysis_of_twitter_emoji_usage_spark.operators.text_analysis import (
        training_data_pipeline,
    )

    words = [f"w{i}" for i in range(40)]
    rows = [
        (0, " ".join(words), "web"),
        (1, " ".join(words[5:30]), "web"),
        (2, " ".join(f"x{i}" for i in range(30)), "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = df.filter(F.col("doc_id") == 0).select("text")
    with pytest.warns(RuntimeWarning, match="array_bench_limit"):
        switched = training_data_pipeline(
            df, bench, decontam_strategy="array", array_bench_limit=5
        )
    joined = training_data_pipeline(df, bench, decontam_strategy="join")
    assert sorted(map(tuple, switched.collect())) == sorted(
        map(tuple, joined.collect())
    )


def test_repetition_thresholds(spark):
    df = docs_df(spark, [
        "a a a a a a a a a b",            # dup_word_frac 0.8 -> flag
        "one two three four five six",    # all distinct -> keep
    ])
    out = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert out[0]["label"] == "flag" and out[0]["top_word_frac"] == 0.9
    assert out[1]["label"] == "keep" and out[1]["dup_2gram_frac"] == 0.0


def test_mix_sources_rates_and_default_drop(spark):
    df = spark.createDataFrame(
        [(i, "keep_all" if i % 2 else "tail") for i in range(200)],
        "doc_id long, source string",
    )
    kept = mix_sources(df, {"keep_all": "ffff"}).collect()
    # 'ffff' keeps (md5 prefix < 'ffff' — all but a 1/65536 sliver);
    # unlisted 'tail' drops entirely
    assert {r["source"] for r in kept} == {"keep_all"}
    assert len(kept) >= 99


def test_shuffle_shards_is_a_permutation(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    out = shuffle_shards(df, n_shards=8).collect()
    assert len(out) == 500
    assert {r["shard"] for r in out} == set(range(8))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))  # dense 0..k-1
    # deterministic across invocations
    again = shuffle_shards(df, n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_chunk_documents_skips_redundant_trailing_chunk(spark):
    """A final window start that adds no tokens beyond the previous
    chunk's coverage (s > 0 with s + overlap >= n) must not be emitted
    — it is a strict subset of the previous chunk, duplicated training
    content (review find)."""
    from big_data_analysis_of_twitter_emoji_usage_spark.operators.shaping import chunk_documents

    toks16 = " ".join(f"t{i}" for i in range(16))   # old: chunk1 = 1 token
    toks21 = " ".join(f"t{i}" for i in range(21))   # chunk1 adds 1 new token
    df = spark.createDataFrame(
        [(1, toks16), (2, toks21)], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=20, overlap=5)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_chunk_tokens"] == 16
    assert len(by_doc[2]) == 2
    c1 = next(r for r in by_doc[2] if r["chunk_idx"] == 1)
    assert c1["n_chunk_tokens"] == 6  # tokens 16..21: 1 new + 5 overlap


def test_decontaminate_rejects_streaming_benchmark(spark, tmp_path):
    """r9 (review find): a streaming bench_df must raise a targeted
    error up front — the benchmark side is aggregated and broadcast
    under every strategy — not die inside the array guard's count
    probe with an opaque streaming AnalysisException."""
    corpus = docs_df(spark, ["a b c"])
    static = docs_df(spark, ["a b c"]).select("text")
    p = str(tmp_path / "bench")
    static.write.parquet(p)
    bench_stream = spark.readStream.schema(static.schema).parquet(p)
    for strategy in ("array", "join"):
        with pytest.raises(ValueError, match="bench_df is a streaming"):
            decontaminate(corpus, bench_stream, strategy=strategy)
