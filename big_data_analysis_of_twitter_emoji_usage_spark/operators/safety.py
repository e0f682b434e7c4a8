"""Data-safety operators for training pipelines: PII detection /
redaction, benchmark decontamination, and intra-document repetition
filters (Gopher-style).

The reference has no safety surface (its corpus is public tweets);
these are the §7-extension operators every pre-training pipeline runs
before (and after) curation. Design rules:

- **Regexes live in the Java∩RE2 subset** (no lookarounds, no unicode
  property classes) so the *identical* pattern string runs in Spark's
  Java regex engine and the DuckDB (RE2) oracle — the same discipline
  as ``text_analysis.BPE_ISH_RE``.
- **Per-document ops are pure projections** — PII counts, redaction,
  and repetition scores never shuffle; they run at scan speed on
  100 TB.
- **Decontamination broadcasts the benchmark, never the corpus**: the
  benchmark n-gram set (the small side — 1e5..1e7 n-grams for every
  published eval suite) is aggregated to one array row and broadcast;
  the corpus side stays a zero-shuffle projection + array_intersect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from big_data_analysis_of_twitter_emoji_usage_spark.core import explode_nonempty

# ---------------------------------------------------------------------------
# PII patterns (Java∩RE2-portable). Each deliberately simple and anchored
# on structure, not context — the distributed baseline; model-based NER
# plugs in via mapInPandas (see operators/multimodal.py for the plumbing).
# ---------------------------------------------------------------------------
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — the common-subset email shape
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # +CC-AAA-EEE-NNNN international-ish phone
    "phone": r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
    # 3-2-4 SSN (cannot match inside the phone shape: group widths differ)
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    # dotted-quad IPv4 (no octet-range check — structural detector)
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}
# Redaction must run email first (its local part could otherwise be
# clipped by an earlier digit-pattern replacement); the rest are
# mutually exclusive by structure.
PII_REDACT_ORDER = ["email", "phone", "ssn", "ipv4"]


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts, one column per pattern class plus a
    total. ``regexp_extract_all`` → ``size`` per class — a pure
    projection, no shuffle, whole-stage codegen end to end.

    Returns (doc_id, n_email, n_phone, n_ssn, n_ipv4, n_pii).
    """
    counts = {
        name: F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
        ).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    }
    out = df.select(F.col(id_col), *counts.values())
    total = sum(
        (F.col(f"n_{n}") for n in PII_PATTERNS), F.lit(0).cast("long")
    )
    return out.select(
        id_col, *[f"n_{n}" for n in PII_PATTERNS], total.alias("n_pii")
    )


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Replace every PII match with a typed placeholder
    (``<EMAIL>``/``<PHONE>``/``<SSN>``/``<IPV4>``) and count the
    redactions. A chain of four ``regexp_replace`` calls — still one
    projection, no shuffle; Catalyst fuses the chain into one codegen
    stage.

    ``n_redactions`` counts each class's matches on the ORIGINAL text
    independently (same numbers as ``pii_scan`` — the two stay
    reconcilable by construction). A PII shape nested inside another
    match (an IPv4 inside an email local-part) is therefore counted
    even though the replacement chain emits a single placeholder for
    the outer match: n_redactions is "PII instances detected", an
    upper bound on placeholders inserted, not a placeholder count.

    Returns (doc_id, n_redactions, redacted).
    """
    redacted = F.col(text_col)
    for name in PII_REDACT_ORDER:
        redacted = F.regexp_replace(
            redacted, PII_PATTERNS[name], f"<{name.upper()}>"
        )
    total = sum(
        (
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(p), 0))
            for p in PII_PATTERNS.values()
        ),
        F.lit(0),
    )
    return df.select(
        F.col(id_col),
        total.cast("long").alias("n_redactions"),
        redacted.alias("redacted"),
    )


def bench_grams_exceed_limit(bench_grams: DataFrame, limit: int) -> bool:
    """True iff the benchmark's DISTINCT n-gram count exceeds ``limit``.

    The array strategy's real cost driver is the size of the
    ``collect_set`` broadcast probed per corpus row — the DISTINCT gram
    count — not raw exploded rows: a duplicate-heavy benchmark (many
    docs sharing boilerplate grams) can have 10× more rows than set
    elements and must not falsely trip the guard (on a streaming
    corpus a false trip is a hard error). ``limit(k+1)`` caps the
    probe; the distinct shuffle is bounded by the benchmark side,
    never the corpus. Shared by ``decontaminate`` and
    ``text_analysis.training_data_pipeline`` so the probe semantics
    cannot drift between them."""
    return bench_grams.select("_h").distinct().limit(limit + 1).count() > limit


def decontaminate(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    strategy: str = "join",
    array_bench_limit: int = 20_000,
) -> DataFrame:
    """Benchmark decontamination by exact n-gram overlap (the standard
    13-gram rule): flag every corpus document sharing ≥1 word n-gram
    with the benchmark corpus.

    Both sides md5-hash their n-grams map-side (``transform`` +
    ``concat_ws`` over token slices — compact fixed-width keys). Two
    probe strategies, both broadcasting ONLY the benchmark:

    - ``strategy='join'`` (default, the scale path): explode the
      corpus n-grams and LEFT-join the **broadcast** benchmark hash
      table, then count per doc. The broadcast hash table is built
      once per task and probed O(1) per n-gram; partial aggregation
      collapses the exploded rows map-side, so the single exchange
      carries one counter row per document. Cost: corpus_ngrams × O(1).
    - ``strategy='array'``: collapse the benchmark to one
      ``collect_set`` row, cross-join it, probe with
      ``array_intersect``. ZERO corpus exchanges — but Spark rebuilds
      the intersect hash set per corpus row, so cost is
      corpus_rows × |bench|. Measured 10× blowup at |bench|≈9e4
      (SCALE.md); only right when the benchmark list is tiny (≲1e3
      n-grams) and the shuffle-free plan matters more than the probe.

    ``array_bench_limit`` (r8) guards the quadratic regime at the API
    layer: requesting ``strategy='array'`` first bounds the benchmark
    with a cheap ``distinct().limit(k+1).count()`` probe (the distinct
    gram count is the collect_set cost driver; never a full count of a
    large suite), and a benchmark past the limit AUTO-SWITCHES to the
    join strategy with a ``RuntimeWarning`` — the r7 decade sweep
    measured the unguarded shape going 32× per 10× data once the
    benchmark grew with the corpus (140 s vs ~8 s at 500k docs;
    SCALE.md "Second decade"). When the CORPUS side is a streaming
    DataFrame the switch is impossible (the join strategy's per-doc
    aggregation would need stateful output), so an oversized benchmark
    raises, pointing at ``streaming.jobs.stream_decontaminate_join``
    (r9) — the foreachBatch variant that runs the join strategy per
    micro-batch — instead of silently degrading the stream.

    Laziness caveat (like ``dedup.connected_components``' eager
    checkpoint): with ``strategy='array'`` merely BUILDING this
    DataFrame runs the bounded benchmark-count probe as a Spark job —
    plan construction is not free for that strategy. The default join
    strategy stays fully lazy. The benchmark side itself must be a
    STATIC DataFrame under either strategy (both shapes aggregate and
    broadcast it); a streaming ``bench_df`` raises up front rather
    than dying inside the probe with an opaque streaming-count
    AnalysisException.

    Documents with fewer than ``n`` tokens have no n-grams and are
    excluded (they cannot be contaminated under this rule).

    Returns (doc_id, n_ngrams, n_contaminated_ngrams, contaminated).
    """
    import warnings

    if bench_df.isStreaming:
        raise ValueError(
            "decontaminate: bench_df is a streaming DataFrame — the "
            "benchmark side is aggregated and broadcast under every "
            "strategy, so it must be static. Materialize the benchmark "
            "suite to a batch table first."
        )

    def ngram_hashes(c):
        # total expression: short docs yield an EMPTY array rather than
        # relying on the upstream filter (optimizers may evaluate the
        # projection on pre-filter rows, and sequence(1, k<1) would
        # generate a descending range and crash slice())
        toks = F.split(F.col(c), " ")
        starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        return F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(
                    starts,
                    lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    docs = df.filter(F.size(F.split(F.col(text_col), " ")) >= n).select(
        F.col(id_col), ngram_hashes(text_col).alias("_sh")
    )
    # explode_nonempty on both sides: the >= n token filters guarantee
    # at least one n-gram per surviving row, and inner explode would
    # trigger InferFiltersFromGenerate's clone of the whole md5 n-gram
    # expression into a pre-Generate Filter (measured 10x, core.py).
    bench_grams = (
        bench_df.filter(F.size(F.split(F.col(text_col), " ")) >= n)
        .select(explode_nonempty(ngram_hashes(text_col)).alias("_h"))
    )
    if strategy == "array":
        if bench_grams_exceed_limit(bench_grams, array_bench_limit):
            if df.isStreaming:
                raise ValueError(
                    "decontaminate(strategy='array'): benchmark exceeds "
                    f"array_bench_limit={array_bench_limit} n-grams and the "
                    "corpus is streaming, so the O(|bench|)-per-row probe "
                    "cannot be auto-switched to the join strategy "
                    "(stateless append mode rules out per-doc aggregation). "
                    "Bound the benchmark suite, or use "
                    "streaming.jobs.stream_decontaminate_join — the "
                    "foreachBatch variant that runs strategy='join' per "
                    "micro-batch with idempotent per-batch output."
                )
            warnings.warn(
                "decontaminate: benchmark exceeds array_bench_limit="
                f"{array_bench_limit} n-grams — the array probe's "
                "corpus_rows x |bench| cost goes quadratic when the "
                "benchmark grows with the corpus (measured 32x per 10x "
                "data, SCALE.md); switching to strategy='join'.",
                RuntimeWarning,
                stacklevel=2,
            )
            strategy = "join"
    if strategy == "array":
        bench = bench_grams.agg(F.collect_set("_h").alias("_bench"))
        hits = F.size(F.array_intersect("_sh", "_bench"))
        return docs.crossJoin(F.broadcast(bench)).select(
            id_col,
            F.size("_sh").cast("long").alias("n_ngrams"),
            hits.cast("long").alias("n_contaminated_ngrams"),
            (hits > 0).alias("contaminated"),
        )
    bench = bench_grams.distinct().withColumnRenamed("_h", "_bh")
    grams = docs.select(F.col(id_col), explode_nonempty("_sh").alias("_h"))
    return (
        grams.join(F.broadcast(bench), grams["_h"] == bench["_bh"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("_bh").alias("n_contaminated_ngrams"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_contaminated_ngrams",
            (F.col("n_contaminated_ngrams") > 0).alias("contaminated"),
        )
    )


def repetition_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_word_frac: float = 0.6,
    max_dup_2gram_frac: float = 0.4,
) -> DataFrame:
    """Gopher-style intra-document repetition filters: fraction of
    duplicated words, most-frequent-word share, and fraction of
    duplicated 2-grams, plus a keep/flag label at the given thresholds.

    All computed with higher-order array functions inside one
    projection — no explode, no shuffle. The top-word share does an
    O(distinct × total) nested ``filter`` per document; documents are
    KB-scale so this stays cheap, and nothing leaves the scan stage.
    (An O(n log n) run-length fold over the sorted array was measured
    at 10× data and was NOT faster — the nested count is not the
    scaling cost; see SCALE.md.)

    Returns (doc_id, dup_word_frac, top_word_frac, dup_2gram_frac,
    label).
    """
    toks = F.split(F.col(text_col), " ")
    nd = F.size(F.array_distinct(toks))
    n = F.size(toks).cast("double")
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    grams2 = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    n2 = F.size(grams2).cast("double")
    nd2 = F.size(F.array_distinct(grams2))
    dup_w = F.round(1 - nd / n, 6)
    dup_2 = F.round(1 - nd2 / n2, 6)
    return df.filter(F.size(toks) >= 2).select(
        F.col(id_col),
        dup_w.alias("dup_word_frac"),
        F.round(top / n, 6).alias("top_word_frac"),
        dup_2.alias("dup_2gram_frac"),
        F.when(
            (dup_w <= max_dup_word_frac) & (dup_2 <= max_dup_2gram_frac),
            "keep",
        ).otherwise("flag").alias("label"),
    )
