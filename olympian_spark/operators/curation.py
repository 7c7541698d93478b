"""Corpus-curation operators for LLM training-data pipelines.

Three operations every web-scale curation pipeline runs between raw
documents and training shards, all expressed as pure DataFrame
expressions / one bounded window shuffle so they hold at 100 TB:

* :func:`with_repetition_stats` — Gopher-style intra-document repetition
  signals (duplicate-word fraction, most-frequent-2-gram fraction; see
  Rae et al., "Scaling Language Models: Methods, Analysis & Insights
  from Training Gopher", arXiv:2112.11446 §A.2's repetition filters).
  Per-row higher-order-function compute, zero shuffles.
* :func:`stratified_sample` — deterministic per-stratum downsampling
  (data mixing): each stratum keeps an exact-rate hash slice of its
  rows. Pure filter, zero shuffles, reproducible across runs/engines.
* :func:`pack_sequences` — concat-and-chunk sequence packing: documents
  are concatenated in deterministic order within hash shards and split
  into fixed token-budget packs (the standard LLM pretraining batch
  layout). One shuffle on the shard key; shard count = output shard
  count, so parallelism is caller-controlled and skew-free by
  construction (multiplicative hash sharding).

Everything is JVM-side (codegen) and SQL-oracle checkable; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative constant (2^32 / phi); the pre-reduction by a
# large prime keeps id * KNUTH inside int64 for ANY int64 id — DuckDB
# raises on BIGINT overflow and Spark wraps, so staying in range is what
# keeps the two engines (and any future ANSI-mode Spark) bit-identical.
_KNUTH = 2654435761
_PRE_MOD = 1_000_000_007  # prime > any per-stratum resolution we use
_RATE_MOD = 1_000_000  # keep-rate resolution: 1e-6


def _hash_unit(id_col: Column) -> Column:
    """Deterministic uniform-ish value in [0, _RATE_MOD) from an id.

    ``pmod(pmod(id, P) * KNUTH, 1e6)``: overflow-safe (product ≤
    (P-1)·KNUTH ≈ 2.66e18 < 2^63), engine-portable (both `%` usages see
    non-negative operands), and decorrelated from arithmetic id patterns
    by the multiplicative constant.
    """
    return F.pmod(F.pmod(id_col, F.lit(_PRE_MOD)) * F.lit(_KNUTH), F.lit(_RATE_MOD))


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition signals (Gopher-style quality filters).

    Adds, per row:

    * ``n_words`` / ``n_distinct_words`` — whitespace words and their
      distinct count;
    * ``dup_word_frac_x1e6`` — floor(1e6 · (1 − distinct/total)), 0 for
      empty documents;
    * ``n_2grams`` / ``top_2gram_count`` — adjacent word 2-grams and the
      multiplicity of the most frequent one;
    * ``top_2gram_frac_x1e6`` — floor(1e6 · top/total), 0 when < 2 words.

    The top-2-gram count is the longest equal run of the *sorted* 2-gram
    array, computed with a single ``aggregate`` fold — O(n log n) per
    row, fully inside codegen, no explode and therefore no shuffle: at
    100 TB this runs at scan speed. Fractions are exported as floored
    integers so DuckDB and Spark hash identically (both evaluate the
    same IEEE double division).
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    norm = F.trim(F.regexp_replace(txt, r"\s+", " "))
    ws = F.when(F.length(norm) == F.lit(0), F.expr("CAST(array() AS ARRAY<STRING>)")).otherwise(
        F.split(norm, " ")
    )
    out = df.withColumn("_ws", ws)
    n_words = F.size("_ws").cast("long")
    n_distinct = F.size(F.array_distinct("_ws")).cast("long")
    grams = F.when(
        F.size("_ws") >= 2,
        F.expr("transform(sequence(0, size(_ws) - 2), i -> concat(_ws[i], ' ', _ws[i + 1]))"),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    out = out.withColumn("_grams", grams)
    # longest equal run over the sorted gram array = max multiplicity
    top = F.expr(
        """
        aggregate(
          array_sort(_grams),
          named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
          (acc, x) -> named_struct(
            'prev', x,
            'run',  IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L),
            'best', GREATEST(acc.best,
                             IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L))),
          acc -> acc.best)
        """
    )
    n_grams = F.size("_grams").cast("long")
    dup_frac = F.when(
        n_words > 0,
        F.floor((n_words - n_distinct).cast("double") / n_words.cast("double") * F.lit(1e6)),
    ).otherwise(F.lit(0))
    top_frac = F.when(
        n_grams > 0, F.floor(top.cast("double") / n_grams.cast("double") * F.lit(1e6))
    ).otherwise(F.lit(0))
    return (
        out.withColumn("n_words", n_words)
        .withColumn("n_distinct_words", n_distinct)
        .withColumn("dup_word_frac_x1e6", dup_frac.cast("long"))
        .withColumn("n_2grams", n_grams)
        .withColumn("top_2gram_count", F.when(n_grams > 0, top).otherwise(F.lit(0)).cast("long"))
        .withColumn("top_2gram_frac_x1e6", top_frac.cast("long"))
        .drop("_ws", "_grams")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (data mixing).

    Keeps a row iff ``hash_unit(id) < rate[stratum] * 1e6`` — every run,
    every engine, and every re-partitioning selects the SAME rows, which
    is what makes ablation datasets reproducible. Rates are quantized to
    1e-6. Pure filter: Catalyst pushes it into the scan, no shuffle, no
    RNG state, and adding a stratum later never changes which rows the
    existing strata keep (the hash ignores the stratum).
    """
    h = _hash_unit(F.col(id_col))
    threshold: Column = F.lit(int(round(default_rate * _RATE_MOD)))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == F.lit(stratum), F.lit(int(round(rate * _RATE_MOD)))
        ).otherwise(threshold)
    return df.where(h < threshold)


def pack_sequences(
    df: DataFrame,
    token_col: str = "ws_tokens",
    budget: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing into fixed token budgets.

    Documents are hash-assigned to ``n_shards`` shards, concatenated in
    ``id_col`` order within each shard, and the resulting token stream is
    cut every ``budget`` tokens — the standard pretraining pack layout
    (documents may straddle pack boundaries). Adds:

    * ``shard`` — multiplicative-hash shard id;
    * ``pack_id`` — pack containing the document's FIRST token;
    * ``pack_offset`` — token offset of the document inside that pack;
    * ``n_packs_spanned`` — how many packs the document crosses (0 for
      empty documents).

    Scale shape: ONE shuffle keyed on ``shard`` (uniform by hashing), a
    per-shard sort for the running sum, nothing else. In production
    ``n_shards`` is the output shard count, so the window partitions are
    exactly the units of work a 1000-executor cluster wants. The running
    sum is a window cumulative — map-side nothing to combine, but the
    sort is the deterministic-order requirement itself, not overhead.
    """
    tokens = F.col(token_col).cast("long")
    shard = F.pmod(_hash_unit(F.col(id_col)), F.lit(n_shards)).cast("int")
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = (F.sum(tokens).over(w) - tokens).cast("long")
    out = out.withColumn("_start", offset)
    pack_id = F.floor(F.col("_start") / F.lit(budget)).cast("long")
    last_pack = F.floor((F.col("_start") + tokens - 1) / F.lit(budget)).cast("long")
    spans = F.when(tokens > 0, last_pack - pack_id + 1).otherwise(F.lit(0)).cast("long")
    return (
        out.withColumn("pack_id", pack_id)
        .withColumn("pack_offset", F.pmod(F.col("_start"), F.lit(budget)).cast("long"))
        .withColumn("n_packs_spanned", spans)
        .drop("_start")
    )


def leakage_safe_split(
    df: DataFrame,
    test_frac: float = 0.1,
    key_col: str = "fingerprint",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/test split that never separates duplicate documents.

    Naive per-document hash splits leak: two byte-identical (or
    same-fingerprint) documents can land one in train, one in test, and
    the eval is contaminated. Here every duplicate group (rows sharing
    ``key_col``, e.g. the exact-dedup fingerprint) is assigned WHOLE:
    the group representative is ``min(id_col)`` within the group, and
    the split is decided by the representative's hash — so membership is
    deterministic, engine-portable, and a document's split never changes
    when more duplicates of it arrive.

    Adds ``rep_id`` (the group representative) and ``split``
    ('train'/'test'). Scale shape: ONE hash shuffle on ``key_col`` for
    the min-window; fingerprint groups are content-hash-sized (tiny,
    unskewed), so the window never sees a hot partition the way a
    popularity key would.
    """
    w = Window.partitionBy(key_col)
    rep = F.min(F.col(id_col)).over(w)
    threshold = int(round(test_frac * _RATE_MOD))
    split = F.when(_hash_unit(rep) < F.lit(threshold), F.lit("test")).otherwise(
        F.lit("train")
    )
    return df.withColumn("rep_id", rep.cast("long")).withColumn("split", split)


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word n-gram with a benchmark/eval set (the published recipe — e.g.
    GPT-3's 13-gram eval-overlap filter, Brown et al. arXiv:2005.14165
    App. C — is exactly this shape with n=13).

    Output: one row per training document — ``(id_col, n_bench_shingles,
    contaminated)`` where ``n_bench_shingles`` counts DISTINCT benchmark
    n-grams found in the document.

    Scale shape: the benchmark side is small by definition (eval sets are
    thousands of documents, not billions), so its distinct shingle set is
    BROADCAST and the training corpus is matched map-side — the 100 TB
    side is never shuffled; only the (tiny) hit set aggregates. Per-doc
    shingles are deduplicated row-locally (``array_distinct``) before the
    explode so in-document repetition never inflates the exchange.
    """

    def shingle_arr(df: DataFrame) -> Column:
        toks = F.filter(
            F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
            lambda x: x != F.lit(""),
        )
        return F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                )
            ),
        ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))

    bench_sh = (
        benchmark.select(F.explode(shingle_arr(benchmark)).alias("shingle"))
        .distinct()
    )
    train_sh = train.select(
        F.col(id_col), F.explode(shingle_arr(train)).alias("shingle")
    )
    hits = (
        train_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bench_shingles"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bench_shingles"), F.lit(0)).cast("long").alias("n_bench_shingles"),
            (F.coalesce(F.col("n_bench_shingles"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# PII patterns: a deliberately conservative, engine-portable subset
# (character classes + bounded quantifiers only — identical semantics in
# Spark's Java regex and DuckDB's RE2): emails, dotted-quad IPv4, and
# NANP-style phone numbers.
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
}


def mask_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII spans from a text column (the scrub step every
    published curation pipeline runs before training).

    Replaces emails, IPv4 addresses and phone numbers with typed
    placeholders (``<EMAIL>``, ``<IPV4>``, ``<PHONE>``) and counts each
    kind. Adds ``masked_text`` plus ``n_<kind>`` columns. Order matters
    and is fixed (email first — an email must not have its dotted host
    half-eaten by the IP pass). Pure JVM regexp expressions: runs at
    scan speed, no shuffle, no UDF, trivially restartable — the operator
    every 100 TB scrub wants.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    masked = txt
    for kind, pat in _PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(txt, F.lit(pat)).cast("long")
        )
        masked = F.regexp_replace(masked, pat, f"<{kind.upper()}>")
    return out.withColumn("masked_text", masked)


def mixing_rates(
    df: DataFrame,
    targets: dict[str, float],
    stratum_col: str = "source",
) -> DataFrame:
    """Solve per-stratum keep rates that realize a target mixture.

    Given target proportions (summing to 1) over ``stratum_col``, the
    largest dataset honouring them without upsampling is bounded by the
    scarcest stratum: ``total = min_s(n_s / target_s)``, and every
    stratum then keeps ``rate_s = target_s * total / n_s`` (the binding
    stratum keeps everything). Strata absent from ``targets`` get rate 0.

    Output: one row per stratum — ``(stratum, n_docs, rate_x1e6,
    expected_kept)`` with the rate floored to the 1e-6 grid
    :func:`stratified_sample` consumes, so the two compose into the
    standard two-pass mixing job: count → solve → deterministic sample.

    Scale shape: ONE count aggregate over the corpus (map-side combined,
    |strata| rows out); the solve itself is arithmetic on that tiny
    aggregate — expressed relationally (cross-join the 1-row min) so it
    stays in the plan, no driver collect.
    """
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tgt = F.lit(None).cast("double")
    for s, t in sorted(targets.items()):
        tgt = F.when(F.col("stratum") == F.lit(s), F.lit(float(t))).otherwise(tgt)
    counts = counts.withColumn("target", tgt)
    # binding constraint: the scarcest stratum relative to its target.
    # A global window over the (<= |strata|-row) aggregate keeps this to
    # ONE corpus scan — a cross-joined re-aggregate would scan twice.
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = counts.withColumn(
        "total_max",
        F.min(
            F.when(F.col("target").isNotNull(), F.col("n_docs") / F.col("target"))
        ).over(w),
    )
    rate = F.when(
        F.col("target").isNotNull(),
        F.least(
            F.lit(1.0), F.col("target") * F.col("total_max") / F.col("n_docs")
        ),
    ).otherwise(F.lit(0.0))
    rate_x1e6 = F.floor(rate * F.lit(_RATE_MOD)).cast("long")
    return out.select(
        "stratum",
        F.col("n_docs").cast("long").alias("n_docs"),
        rate_x1e6.alias("rate_x1e6"),
        F.floor(rate_x1e6 * F.col("n_docs") / F.lit(_RATE_MOD)).cast("long").alias("expected_kept"),
    )


def importance_sample(
    df: DataFrame,
    rate_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-ROW sampling: keep a row with probability
    ``rate_col`` (a column in [0, 1] — typically a quality score), decided
    by the same overflow-safe hash as :func:`stratified_sample`, so the
    kept set is reproducible across runs, engines and repartitionings.
    The importance-sampling gate quality-weighted corpus ablations use:
    higher-quality documents survive proportionally more often, with zero
    RNG state and a pure pushed-to-scan filter.
    """
    threshold = F.least(
        F.lit(_RATE_MOD).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor(F.col(rate_col).cast("double") * _RATE_MOD).cast("long"),
        ),
    )
    return df.where(_hash_unit(F.col(id_col)) < threshold)


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    ascending: bool = False,
    n_partitions: int | None = None,
) -> DataFrame:
    """Global curriculum rank (0-based) by ``score_col`` — the ordering
    pass of curriculum training (easy/high-quality documents first).

    The naive ``row_number() OVER (ORDER BY score)`` collapses the WHOLE
    corpus into one task; this is the scale-correct two-pass global rank:

    1. ``repartitionByRange`` on (score, id) — Spark samples range
       boundaries, so partitions are contiguous score slabs;
    2. per-partition counts (tiny aggregate) → broadcast cumulative
       offsets;
    3. per-partition ``row_number`` (bounded window) + its slab's offset.

    Deterministic total order: ties broken by ``id_col``. Output: input
    plus ``curriculum_rank``.
    """
    n_parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    score = F.col(score_col)
    idc = F.col(id_col)
    order = (
        [score.asc(), idc.asc()] if ascending else [score.desc(), idc.asc()]
    )
    parted = df.repartitionByRange(n_parts, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    # persisted: range partitioning SAMPLES boundaries, so a re-evaluation
    # could draw different slabs than the ones the offsets were counted on
    parted = parted.persist()
    # offsets: one row per partition — collect is bounded by n_partitions
    counts = {
        r["_pid"]: r["n"]
        for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "_pid INT, _off LONG",
    )
    w = Window.partitionBy("_pid").orderBy(*order)
    return (
        parted.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "curriculum_rank",
            (F.row_number().over(w) - 1 + F.col("_off")).cast("long"),
        )
        .drop("_pid", "_off")
    )
