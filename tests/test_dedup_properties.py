"""Property-based tests (hypothesis) for the MinHash-LSH near-dup
pipeline: random tiny-vocabulary corpora checked against an exact
Python shingle-set model. Pins the operator's two structural laws —
emitted pairs are EXACTLY verified (soundness is structural, not
probabilistic) and identical shingle sets always collide (identical
signatures agree on every band). Candidate-stage encoding bugs that
the exact-verify stage masks (e.g. the r8 concat_ws null-skip, whose
extra ''-bucket candidates still verified to correct jaccards) are
pinned by the targeted unit test in test_dedup_ops instead."""

from hypothesis import given, settings, strategies as st

from big_data_analysis_of_twitter_emoji_usage_spark.operators.dedup import near_dup_pairs

K = 3
THRESHOLD = 0.3

# six-word vocabulary so random docs genuinely share shingles
vocab = st.sampled_from(["red", "blue", "green", "cat", "dog", "sun"])
doc_texts = st.lists(vocab, min_size=0, max_size=10).map(" ".join)


def _shingle_set(text: str) -> set:
    toks = text.split(" ")
    if len(toks) < K:
        return set()
    return {" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)}


@settings(max_examples=10, deadline=None)
@given(st.lists(doc_texts, min_size=2, max_size=6))
def test_near_dup_pairs_sound_and_complete_on_identicals(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in near_dup_pairs(df, k=K, threshold=THRESHOLD).collect()
    }
    sets = {i: _shingle_set(t) for i, t in enumerate(texts)}

    # soundness: every emitted pair's jaccard is the exact model value
    # and clears the threshold; empty-shingle docs never appear
    for (a, b), j in out.items():
        sa, sb = sets[a], sets[b]
        assert sa and sb, f"empty-shingle doc emitted in pair {(a, b)}"
        exact = len(sa & sb) / len(sa | sb)
        assert exact >= THRESHOLD
        assert abs(j - exact) < 1e-6

    # completeness on identicals: equal non-empty shingle sets produce
    # identical signatures, which agree on every band — the pair MUST
    # be emitted (no LSH luck involved)
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[a] == sets[b]:
                assert (a, b) in out, f"identical docs {(a, b)} not paired"
