"""Text-analysis operators for training-data pipelines (SURVEY §7.7).

Language-ID, quality scoring, corpus token statistics, and document
fingerprinting — each a single declarative plan over a text column:
scan → tokenize (higher-order array fns) → one aggregate. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from big_data_analysis_of_twitter_emoji_usage_spark.core import explode_nonempty

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Real pipelines plug in fastText-style models via mapInPandas (see
# operators/multimodal.py for the pandas plumbing pattern); the heuristic
# here is the built-in, fully-distributed baseline.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "de", "et", "un", "est", "que"],
}
LANG_ORDER = ["en", "de", "es", "fr"]  # deterministic tiebreak order


def _tokens(text_col: str):
    return F.split(F.col(text_col), " ")


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-ratio language ID: score each language as the fraction of
    tokens in its stopword list; predict the argmax, 'und' (undetermined)
    when every score is zero.

    Returns (doc_id, <lang>_score..., pred_lang). One narrow projection —
    no shuffle at all; this runs at scan speed on 100 TB.
    """
    toks = _tokens(text_col)
    n = F.size(toks).cast("double")
    scores = {
        lang: F.round(
            F.size(F.filter(toks, lambda t: t.isin(*words))) / n, 6
        ).alias(f"{lang}_score")
        for lang, words in STOPWORDS.items()
    }
    out = df.select(F.col(id_col), *scores.values())
    best = F.greatest(*[F.col(f"{lang}_score") for lang in LANG_ORDER])
    pred = F.when(best <= 0, "und")
    for lang in LANG_ORDER:  # first max in LANG_ORDER wins ties
        pred = pred.when(F.col(f"{lang}_score") == best, lang)
    return out.select(
        id_col, *[f"{lang}_score" for lang in LANG_ORDER], pred.alias("pred_lang")
    )


def quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality heuristics: token count, distinct ratio, mean
    token length, alphabetic ratio, stopword ratio, and a keep/flag label.

    Mirrors the usual pre-training quality filters (length bounds,
    repetition, symbol density). Pure projection — no shuffle.
    """
    toks = _tokens(text_col)
    n = F.size(toks).cast("double")
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$")))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*all_stop)))
    n_distinct = F.size(F.array_distinct(toks))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(n_distinct / n, 6).alias("distinct_ratio"),
        F.round(
            (F.length(F.col(text_col)) - (n - 1)) / n, 6
        ).alias("mean_token_len"),
        F.round(n_alpha / n, 6).alias("alpha_ratio"),
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        F.when(
            (F.size(toks) >= 10) & (n_distinct / n >= 0.2), "keep"
        ).otherwise("flag").alias("label"),
    )


def token_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus token statistics per group: documents, total tokens,
    distinct tokens, mean tokens/doc.

    Two-level aggregate: explode → group. The explode multiplies rows by
    ~tokens/doc, but partial aggregation collapses them map-side before
    the single shuffle on the (low-cardinality) group key.
    """
    tok = df.select(
        F.col(group_col), F.col(id_col), F.explode(_tokens(text_col)).alias("w")
    )
    return (
        tok.groupBy(group_col)
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("w").alias("n_distinct_tokens"),
            F.round(F.count(F.lit(1)) / F.countDistinct(id_col), 6).alias(
                "tokens_per_doc"
            ),
        )
        .orderBy(group_col)
    )


# GPT-2-style pre-tokenizer, restricted to the Java∩RE2 regex subset
# (no lookarounds, no unicode property classes) so the identical pattern
# runs in Spark and the DuckDB oracle: contractions, space-prefixed
# letter runs, digit runs, symbol runs.
BPE_ISH_RE = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+"


def bpe_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting both ways: whitespace tokens and BPE-ish
    pre-tokenizer matches (``regexp_extract_all``), plus their ratio —
    the standard "how many LLM tokens is this corpus" estimator.
    Pure projection; runs at scan speed.
    """
    ws = F.size(_tokens(text_col))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0))
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
        F.round(bpe / ws.cast("double"), 6).alias("bpe_per_ws"),
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 100,
    min_count: int = 1,
) -> DataFrame:
    """Frequency-ranked vocabulary (tokenizer prep): the ``vocab_size``
    most frequent whitespace tokens with contiguous ids assigned by
    (count desc, token) rank.

    Plan: explode → one hash-agg shuffle (partial map-side) →
    ``orderBy().limit()`` = TakeOrderedAndProject (per-partition heaps,
    never a global sort of the token distribution) → id assignment via a
    rank window that only ever sees the already-limited ``vocab_size``
    rows, so its single-partition execution is O(vocab), not O(corpus).
    Returns (token_id, token, cnt).
    """
    counts = (
        df.select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), "token")
        .limit(vocab_size)
    )
    w = Window.orderBy(F.desc("cnt"), "token")
    return counts.select(
        (F.row_number().over(w) - 1).cast("long").alias("token_id"),
        "token",
        "cnt",
    )


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    min_distinct_ratio: float = 0.2,
    keep_langs: list[str] | None = None,
) -> DataFrame:
    """The training-data curation pipeline composed END-TO-END in one
    plan: exact dedup → quality gate → language ID → curated corpus.

    Scale shape — exactly ONE shuffle for the whole pipeline:

    - Exact-dedup keeper selection is a ``row_number`` window partitioned
      by content (smallest id wins), NOT a groupBy + join-back: the
      window needs the same hash-by-text shuffle the groupBy would, but
      skips the second corpus-wide join shuffle entirely.
    - The quality gate and stopword language-ID are pure projections on
      the survivors (same expressions as ``quality_scores`` /
      ``language_id``), fused by Catalyst into the post-shuffle stage.

    Returns (doc_id, pred_lang, n_tokens, distinct_ratio) for documents
    that are their duplicate-group keeper, pass the quality thresholds,
    and (optionally) classify into ``keep_langs``.
    """
    w = Window.partitionBy(text_col).orderBy(id_col)
    keepers = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    toks = _tokens(text_col)
    n = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks))
    scores = {
        lang: F.round(F.size(F.filter(toks, lambda t: t.isin(*words))) / n, 6)
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, "und")
    for lang in LANG_ORDER:  # first max in LANG_ORDER wins ties
        pred = pred.when(scores[lang] == best, lang)
    out = keepers.filter(
        (F.size(toks) >= min_tokens) & ((n_distinct / n) >= min_distinct_ratio)
    ).select(
        F.col(id_col),
        pred.alias("pred_lang"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(n_distinct / n, 6).alias("distinct_ratio"),
    )
    if keep_langs:
        out = out.filter(F.col("pred_lang").isin(*keep_langs))
    return out.orderBy(id_col)


def doc_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Winnowing-style fingerprint: the minimum md5 over the document's
    k-word shingles. Equal fingerprints ⇒ the documents share their
    lexicographically-smallest shingle hash — a cheap containment signal.
    Returns (doc_id, fingerprint). Computed as ``array_min`` over the
    per-doc shingle array — a pure projection with no shuffle; the plan
    is a single scan stage at any data size.
    """
    from big_data_analysis_of_twitter_emoji_usage_spark.operators.dedup import (
        doc_shingle_arrays,
    )

    return doc_shingle_arrays(df, text_col, id_col, k).select(
        F.col(id_col),
        F.array_min(F.transform("shingles", F.md5)).alias("fingerprint"),
    )


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """Top-k word n-grams across the corpus — the base statistic under
    n-gram LMs, contamination n-gram indexes, and collocation mining.

    The n-gram expansion is a pure projection: n shifted ``slice`` views
    of the token array folded together with ``zip_with`` (all JVM
    higher-order functions, no UDF), then one hash-aggregate on the
    n-gram string. Top-k plans as TakeOrderedAndProject — per-partition
    heaps, never a global sort. Documents shorter than n contribute an
    empty array and vanish at the explode.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.split(F.col(text_col), " ")
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, i + 1, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "ngram")
        .limit(top_k)
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Per-document unigram cross-entropy — the classic cheap proxy for
    model-based quality scoring (docs far from the corpus distribution
    score high): ``xent = -mean(log2 p(token))`` with
    ``p = count/N`` for the top-``vocab_size`` tokens and a 0.5/N
    out-of-vocabulary floor.

    Same scale shape as ``tfidf_top_terms``: ONE corpus-wide aggregate
    (token counts, map-side partials), capped to a single broadcast map
    row; scoring is then a per-row ``aggregate`` fold over the token
    array — the corpus never shuffles, and the broadcast stays bounded
    at any corpus size.
    """
    toks = F.split(F.col(text_col), " ")
    counts = (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # N from per-doc sizes, not sum(counts.c): the latter would replan
    # the token-keyed aggregate a second time — this is a row-level
    # projection + single global sum (map-side partials, no token shuffle).
    total = df.select(F.size(toks).alias("_k")).agg(
        F.sum("_k").cast("double").alias("_n")
    )
    vocab = (
        counts.orderBy(F.desc("c"), "tok")
        .limit(vocab_size)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("tok", F.col("c").cast("double")))
            ).alias("_vocab")
        )
    )
    nll = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        - F.log2(F.coalesce(F.element_at("_vocab", t), F.lit(0.5)) / F.col("_n")),
    )
    return (
        df.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.size(toks).cast("long").alias("n_tokens"),
            F.round(nll / F.size(toks), 6).alias("xent"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    vocab_size: int = 500,
) -> DataFrame:
    """Top-k TF-IDF keywords per document (smoothed:
    ``tf * (ln((N+1)/(df+1)) + 1)``), with the corpus side kept at scan
    speed.

    Scale shape — the corpus NEVER shuffles on doc or term:

    - Document frequencies need one aggregation: explode the per-doc
      DISTINCT term arrays and hash-agg by term (map-side partials make
      the exchange vocabulary-sized, not corpus-sized).
    - The top-``vocab_size`` terms (by df desc, term — deterministic)
      collapse to a single ``map_from_entries`` row, broadcast alongside
      a 1-row corpus count. Terms outside the capped vocab score with
      df=0 (max idf) — the documented approximation that bounds the
      broadcast at any corpus size.
    - Per-document tf, scoring, and top-k selection are higher-order
      array expressions (nested filter counts, struct-sort, slice) — a
      pure projection; the per-doc sort sees ≤ distinct-terms elements,
      never a window over the corpus.

    Returns (doc_id, rank, term, tf, tfidf).
    """
    toks = F.split(F.col(text_col), " ")
    dw = df.select(F.explode(F.array_distinct(toks)).alias("term"))
    vocab = (
        dw.groupBy("term")
        .agg(F.count(F.lit(1)).alias("dfc"))
        .orderBy(F.desc("dfc"), "term")
        .limit(vocab_size)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "dfc"))
            ).alias("_vocab")
        )
    )
    ndocs = df.agg(F.count(F.lit(1)).alias("_n"))
    idf = lambda dfc: (  # noqa: E731
        F.log((F.col("_n") + 1) / (dfc + 1)) + 1
    )
    entries = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            (
                -F.round(
                    F.size(F.filter(toks, lambda x: x == t))
                    * idf(F.coalesce(F.element_at("_vocab", t), F.lit(0))),
                    6,
                )
            ).alias("ns"),
            t.alias("term"),
            F.size(F.filter(toks, lambda x: x == t)).alias("tf"),
        ),
    )
    top = F.slice(F.array_sort(entries), 1, k)
    return df.crossJoin(F.broadcast(vocab)).crossJoin(
        F.broadcast(ndocs)
    ).select(
        F.col(id_col), F.posexplode(top).alias("_p", "_e")
    ).select(
        id_col,
        (F.col("_p") + 1).cast("long").alias("rank"),
        F.col("_e.term").alias("term"),
        F.col("_e.tf").cast("long").alias("tf"),
        (-F.col("_e.ns")).alias("tfidf"),
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 20,
) -> DataFrame:
    """Capped inverted index: for every term, its document frequency
    and the first ``max_postings`` doc ids (ascending) that contain it
    — the search-engine counterpart of ``build_vocab``.

    Plan: explode per-doc DISTINCT terms (so a doc posts once per
    term), then ONE hash aggregation building both the count and the
    posting array. The posting list is ``slice(array_sort(
    collect_list(id)))`` — deterministic output for the oracle, and
    bounded: the cap is applied inside the same aggregation's
    projection, so no unbounded per-term state ever leaves the
    aggregation. (A production index shards hot terms; the cap is the
    single-array analog and keeps worst-case row width O(max_postings).)

    Returns (term, df_count, postings) sorted by term.
    """
    return (
        df.select(
            F.col(id_col),
            F.explode(F.array_distinct(_tokens(text_col))).alias("term"),
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df_count"),
            F.slice(
                F.array_sort(F.collect_list(id_col)), 1, max_postings
            ).alias("postings"),
        )
        .orderBy("term")
    )


def training_data_pipeline(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    weights_hex4: dict[str, str] | None = None,
    n_shards: int = 16,
    min_tokens: int = 10,
    min_distinct_ratio: float = 0.2,
    ngram: int = 13,
    decontam_strategy: str = "join",
    array_bench_limit: int = 20_000,
) -> DataFrame:
    """The COMPLETE pre-training data pipeline composed into one plan:
    exact-dedup keeper → quality gate → benchmark decontamination →
    weighted source mixing → deterministic shard shuffle.

    Two strategy choices for the decontamination stage, semantics
    identical (same surviving rows):

    - ``decontam_strategy='join'`` (default, the scale path): the
      corpus's 13-gram hashes probe the **broadcast** benchmark hash
      table via an exploded left-semi join; the contaminated doc-id
      set (tiny — it is the overlap, not the corpus) anti-joins the
      kept corpus. Cost: corpus_ngrams × O(1) probe. The r7 100×
      decade measured WHY this is the default: the array variant ran
      32× slower per 10× data once the benchmark grew with the corpus
      (140 s at 500k docs vs ~8 s for this path — SCALE.md).
    - ``decontam_strategy='array'``: the fully-fused shape — ONE
      broadcast ``collect_set`` row probed with ``arrays_overlap``,
      keeping the whole pipeline at exactly TWO shuffles (keeper
      window's hash-by-content exchange + shard window's
      hash-by-shard exchange; plan-test pinned). Spark rebuilds the
      probe hash set per corpus row, so cost is
      corpus_rows × |bench| — only right for a small, fixed benchmark
      suite (≲1e3 n-grams), where the shuffle-free plan wins.

    Mixing is a ``create_map`` threshold filter; quality metrics are
    array expressions — both fuse into the adjacent stages under
    either strategy.

    Returns (doc_id, source, n_tokens, shard, pos) — the shuffled,
    curated corpus a tokenizer would consume, ordered by (shard, pos).
    """
    from big_data_analysis_of_twitter_emoji_usage_spark.operators.shaping import (
        mix_sources,
        shuffle_shards,
    )

    toks = F.split(F.col(text_col), " ")

    # 1+2. quality gate, THEN keeper dedup (r13, guide §2.3/§1.2 —
    # stage order swapped from keeper-then-quality): the quality
    # predicate is a pure function of ``text_col``, so every row of a
    # content group passes or fails TOGETHER — filtering before the
    # window keeps the keeper's winner (smallest id of each surviving
    # group) identical while the window's full-text exchange now
    # carries only quality-surviving rows.
    n = F.size(toks).cast("double")
    qual = df.filter(
        (F.size(toks) >= min_tokens)
        & ((F.size(F.array_distinct(toks)) / n) >= min_distinct_ratio)
    )
    w = Window.partitionBy(text_col).orderBy(id_col)
    keep = (
        qual.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 3. decontamination: any shared word n-gram with the benchmark
    def grams(c):
        t = F.split(F.col(c), " ")
        return F.when(
            F.size(t) >= ngram,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (ngram - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, ngram))),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    # explode_nonempty on both gram explodes (the sibling decontaminate
    # does the same): inner explode lets InferFiltersFromGenerate clone
    # the md5 13-gram transform into a pre-Generate Filter that
    # re-evaluates it per row — the measured 10x constant (core.py).
    # Bench side is provably non-empty (>= ngram token filter); corpus
    # side's null rows from short docs drop at the equality semi-join.
    bench_grams = bench_df.filter(
        F.size(F.split(F.col(text_col), " ")) >= ngram
    ).select(explode_nonempty(grams(text_col)).alias("_h"))
    if decontam_strategy == "array":
        # The API-layer quadratic guard, shared with
        # safety.decontaminate (one probe implementation — distinct
        # gram count, the collect_set cost driver): the fused
        # arrays_overlap probe pays O(|bench|) per corpus row, so a
        # benchmark past the limit auto-switches to the join strategy
        # — the measured 32x-per-decade failure shape.
        import warnings

        from big_data_analysis_of_twitter_emoji_usage_spark.operators.safety import (
            bench_grams_exceed_limit,
        )

        if bench_grams_exceed_limit(bench_grams, array_bench_limit):
            warnings.warn(
                "training_data_pipeline: benchmark exceeds "
                f"array_bench_limit={array_bench_limit} n-grams; switching "
                "decontam_strategy to 'join' (the array probe goes "
                "quadratic when the benchmark grows with the corpus — "
                "SCALE.md 'Second decade').",
                RuntimeWarning,
                stacklevel=2,
            )
            decontam_strategy = "join"
    if decontam_strategy == "array":
        bench = bench_grams.agg(F.collect_set("_h").alias("_bench"))
        keep = (
            keep.crossJoin(F.broadcast(bench))
            .filter(~F.arrays_overlap(grams(text_col), F.col("_bench")))
            .drop("_bench")
        )
    else:
        # contaminated ids: exploded corpus grams left-semi the
        # broadcast benchmark hash table (O(1) probe per gram, built
        # once per task), distinct over the doc id — only overlap HITS
        # reach the exchange, one id row each.
        #
        # r13 (guide §1.2: don't compute things twice): the grams are
        # exploded from ``qual`` (quality-gated, PRE-keeper), not from
        # ``keep`` — Catalyst plans no exchange reuse here, so deriving
        # the id set from ``keep`` re-ran the keeper window's whole
        # subtree (second corpus scan + full-text exchange + sort +
        # window; plan-verified, 0 ReusedExchange). Equivalent by a
        # superset argument: ``keep`` ⊆ ``qual`` row-for-row with
        # unique ids, so for every keeper row the gram set — hence its
        # membership in the contaminated id set — is unchanged, and
        # extra ids from dropped duplicates simply never match the
        # anti-join's left side. Cost trade: grams are also computed
        # for the duplicate rows the keeper would have dropped —
        # bounded by the corpus's duplication rate, where the removed
        # subtree cost a full corpus shuffle regardless.
        contaminated = (
            qual.select(id_col, explode_nonempty(grams(text_col)).alias("_g"))
            .join(
                F.broadcast(bench_grams),
                F.col("_g") == F.col("_h"),
                "left_semi",
            )
            .select(id_col)
            .distinct()
        )
        keep = keep.join(contaminated, id_col, "left_anti")

    # 4. weighted mixing (drop unlisted sources when weights given)
    if weights_hex4:
        keep = mix_sources(keep, weights_hex4, source_col, id_col)

    # 5. deterministic shard shuffle
    out = shuffle_shards(keep, n_shards, id_col)
    return out.select(
        F.col(id_col),
        F.col(source_col),
        F.size(toks).cast("long").alias("n_tokens"),
        "shard",
        "pos",
    ).orderBy("shard", "pos")
