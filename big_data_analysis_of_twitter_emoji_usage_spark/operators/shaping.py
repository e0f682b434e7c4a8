"""Data-shaping operators for LLM training pipelines: deterministic
sampling, document chunking, and sequence packing.

The reference has no sampling/chunking surface (its corpus fits one
machine); these are the §7-extension operators a 100 TB pre-training
pipeline runs between curation and tokenization. Design rules shared by
all four:

- **Determinism over randomness**: every "random" choice is an md5-hash
  order or threshold, so (a) reruns are reproducible across cluster
  sizes and partitionings — a property `df.sample`'s per-partition RNG
  does NOT have — and (b) each operator is bit-for-bit checkable against
  the DuckDB oracle.
- **No global ordering**: anything that needs an order (packing
  cumsums, per-group ranks) partitions first (shard / group key) so no
  single task ever sees the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_sample(
    df: DataFrame, rate_hex4: str, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose
    ``md5(id)``'s leading 4 hex digits sort below ``rate_hex4``
    (e.g. ``'4000'`` ≈ 25%). Fixed-width lowercase hex compares
    lexicographically as numerically, in Spark and any SQL engine.

    Pure projection + filter — pushed to the scan, zero shuffle. Unlike
    ``df.sample`` the kept set is a function of the DATA, not of the
    partitioning: stable across cluster sizes, reruns, and engines.
    """
    digest = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    return df.filter(digest < F.lit(rate_hex4))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    per_group: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``per_group`` rows per group (fewer if the group is
    smaller), chosen by md5-hash order — a deterministic uniform draw.

    One shuffle on the group key; Spark executes the rank filter with a
    map-side WindowGroupLimit (per-partition top-k before the exchange),
    so the shuffle carries at most ``per_group`` rows per (partition,
    group), not the whole corpus.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= per_group)
        .drop("_rk")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 20,
    overlap: int = 5,
) -> DataFrame:
    """Split each document into overlapping token windows (the RAG /
    context-window prep step): chunks of ``chunk_tokens`` whitespace
    tokens starting every ``chunk_tokens - overlap`` tokens.

    Built entirely from higher-order array functions (sequence →
    slice) + one explode — a pure map-side generator, no Python and no
    shuffle; a document's chunk count is ~n/step (a final window that
    would only repeat the previous chunk's tokens is skipped), so
    output size scales with the corpus, not with a driver loop.
    Returns (doc_id, chunk_idx, n_chunk_tokens, chunk_text).
    """
    assert 0 <= overlap < chunk_tokens
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # last start bound: a start s > 0 with s + overlap >= n would add
    # NO tokens beyond the previous chunk's coverage (which ends at
    # s - step + chunk_tokens = s + overlap) — a fully-redundant
    # sub-overlap fragment duplicating training content. Standard
    # chunkers emit s only when it contributes new tokens: s = 0 or
    # s < n - overlap, hence the inclusive bound n - overlap - 1.
    starts = F.sequence(
        F.lit(0), F.greatest(n - (overlap + 1), F.lit(0)), F.lit(step)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / step).cast("long").alias("idx"),
            F.slice(toks, s + 1, chunk_tokens).alias("toks"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).select(
        id_col,
        F.col("_c.idx").alias("chunk_idx"),
        F.size("_c.toks").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", "_c.toks").alias("chunk_text"),
    )


def mix_sources(
    df: DataFrame,
    weights_hex4: dict[str, str],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_hex4: str = "0000",
) -> DataFrame:
    """Weighted domain mixing: down-sample each source to its target
    rate (the "mixture weights" step between curation and
    tokenization). Rates are 4-hex-digit md5 thresholds per source —
    ``'ffff'`` ≈ keep all, ``'8000'`` ≈ 50%, ``'2000'`` ≈ 12.5% — the
    same deterministic device as ``hash_sample``, so the kept set is a
    function of the data alone.

    The per-source threshold is a ``create_map`` literal probed with
    ``element_at`` — JVM-side, no UDF, no join; the whole operator is a
    filter fused into the scan. Sources absent from ``weights_hex4``
    fall back to ``default_hex4`` (drop, by default).
    """
    thr_map = F.create_map(
        *[F.lit(x) for kv in weights_hex4.items() for x in kv]
    )
    thr = F.coalesce(
        F.element_at(thr_map, F.col(source_col)), F.lit(default_hex4)
    )
    digest = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    return df.filter(digest < thr)


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into training shards: every row
    gets a (shard, pos) such that reading shards in order of pos yields
    an md5-permuted order of the corpus — the "shuffle the dataset
    before training" step, reproducible across cluster sizes.

    Shard assignment is multiplicative-hash modular arithmetic (Knuth
    constant) — portable integer math, no hex decoding — and the
    in-shard position is a ``row_number`` ordered by ``md5(id)``. ONE
    shuffle (the window's hash partition by shard); each task orders
    only corpus/n_shards rows, so no global sort ever materializes.

    The id is reduced mod 2^31 BEFORE the multiply (r7): a raw 64-bit
    id times the 32-bit Knuth constant overflows long for ids above
    ~3.5e9 — ANSI mode raises, non-ANSI silently wraps engine-specially
    — and production corpora (snowflake-style ids) live well above
    that. (2^31-1) * 2654435761 stays under 2^63; the reduction only
    folds ids ≥ 2^31 onto the same 31-bit keyspace, which changes
    nothing about shard balance. Found by the r7 10× scale run, whose
    replica ids sit at 9e9 (SCALE.md).

    Returns input columns + (shard, pos).
    """
    shard = F.pmod(
        F.pmod(F.col(id_col), F.lit(2147483648)) * F.lit(2654435761),
        F.lit(n_shards),
    )
    w = Window.partitionBy("shard").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("shard", shard.cast("long"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_tokens: int = 512,
    n_shards: int = 32,
) -> DataFrame:
    """Greedy contiguous sequence packing: assign documents to
    fixed-token-budget training batches.

    Documents are sharded by ``id % n_shards`` (shards pack
    independently — the property that keeps this scalable: the cumsum
    window partitions by shard, so no task ever orders the whole
    corpus), ordered deterministically by id within the shard, and a
    running token total assigns each doc to batch
    ``floor(exclusive_cumsum / target_tokens)`` — the standard
    first-fit-in-order approximation used by pre-training loaders.
    Returns (doc_id, shard, batch_id, n_tokens, batch_fill) where
    batch_fill is the running total *through* this doc.
    """
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("long")
    base = df.select(
        F.col(id_col), shard.alias("shard"), n_tok.alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill = F.sum("n_tokens").over(w)
    return base.select(
        id_col,
        "shard",
        F.floor((fill - F.col("n_tokens")) / target_tokens).alias("batch_id"),
        "n_tokens",
        fill.alias("batch_fill"),
    )
