"""End-to-end corpus curation plan: the job a training-data team runs.

Chains the curation operators in the order every published pipeline uses
(scrub → quality gates → exact dedup → near-dedup → decontaminate → mix
→ pack) and reports per-stage row counts, so ablations can see exactly
where documents die.

Stage order matters and is deliberate:

1. PII scrub FIRST — nothing downstream (fingerprints, shingles) may see
   raw PII, or two documents differing only in an email address dedup
   apart.
2. quality + repetition gates — cheap per-row expressions; shedding junk
   early shrinks every later shuffle.
3. exact dedup (fingerprint keep-first) before near-dedup — the near-dup
   candidate join should never pay for byte-identical copies.
4. MinHash near-dedup — drop the higher-id side of each verified pair.
5. benchmark decontamination — after dedup (one representative to check
   per content), before mixing (contamination must not distort rates).
6. mixing (optional): solve per-stratum rates against target proportions,
   then the deterministic stratified sample.
7. sequence packing — the final layout pass.

Every stage is one of the repo's tested operators; this module only
composes them and counts. Counts force one action per stage on a cached
frame — the metrics ARE the job's manifest entry, mirroring how
refresh.py records per-partition lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olympian_spark.operators.curation import (
    decontaminate,
    mask_pii,
    mixing_rates,
    pack_sequences,
    stratified_sample,
    with_repetition_stats,
)
from olympian_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from olympian_spark.operators.textstats import (
    with_fingerprint,
    with_quality_score,
    with_token_counts,
)


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    embeddings: DataFrame | None = None,
    embedding_dim: int | None = None,
    semantic_threshold: float = 0.95,
    semantic_n_lists: int | None = None,
    targets: dict[str, float] | None = None,
    stratum_col: str = "lang",
    quality_min_x1e6: int = 400_000,
    dup_word_max_x1e6: int = 900_000,
    near_dup_threshold: float = 0.8,
    budget: int = 2048,
    n_shards: int = 8,
    test_frac: float | None = None,
) -> tuple[DataFrame, dict]:
    """Run the full curation pipeline over a documents frame.

    Returns ``(packed, metrics)``: the final packed frame (original
    columns + masked_text + stats + shard/pack columns) and a metrics
    dict of per-stage surviving row counts.
    """
    metrics: dict[str, int] = {}

    # 1. scrub, then carry the masked text forward as THE text
    scrubbed = (
        mask_pii(docs)
        .drop("text")
        .withColumnRenamed("masked_text", "text")
    )
    cur = with_repetition_stats(with_quality_score(with_token_counts(scrubbed)))
    cur = cur.cache()
    metrics["input"] = cur.count()

    # 2. quality + repetition gates
    cur = cur.where(
        (F.col("quality_x1e6") >= quality_min_x1e6)
        & (F.col("dup_word_frac_x1e6") <= dup_word_max_x1e6)
    ).cache()
    metrics["after_quality"] = cur.count()

    # 3. exact dedup: keep each fingerprint's min doc_id
    keep = exact_dedup(cur).select(F.col("keep_doc_id").alias("doc_id"))
    cur = with_fingerprint(cur).join(keep, "doc_id").cache()
    metrics["after_exact_dedup"] = cur.count()

    # 4. near-dedup: drop the higher-id member of each verified pair
    pairs = minhash_lsh_pairs(cur, threshold=near_dup_threshold)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    cur = cur.join(losers, "doc_id", "left_anti").cache()
    metrics["after_near_dedup"] = cur.count()

    # 4b. semantic dedup (SemDeDup) when an embeddings frame is wired in:
    # k-means cells + in-cluster cosine, whole pipeline drops is_dup rows
    if embeddings is not None:
        from olympian_spark.operators.similarity import semantic_dedup

        if embedding_dim is None:
            raise ValueError("embedding_dim required with embeddings")
        n_lists = semantic_n_lists or max(2, min(64, embeddings.count() // 8))
        verdict = semantic_dedup(
            embeddings,
            dim=embedding_dim,
            threshold=semantic_threshold,
            n_lists=n_lists,
        ).withColumnRenamed("vec_id", "doc_id")
        cur = cur.join(
            verdict.where(~F.col("is_dup")).select("doc_id"), "doc_id"
        ).cache()
        metrics["after_semantic_dedup"] = cur.count()

    # 5. decontamination against the benchmark set
    if benchmark is not None:
        flags = decontaminate(cur, benchmark)
        cur = (
            cur.join(flags.where(~F.col("contaminated")).select("doc_id"), "doc_id")
            .cache()
        )
        metrics["after_decontaminate"] = cur.count()

    # 6. data mixing: solve rates, then the deterministic sample
    if targets is not None:
        rates = {
            r["stratum"]: r["rate_x1e6"] / 1e6
            for r in mixing_rates(cur, targets, stratum_col=stratum_col).collect()
            if r["rate_x1e6"] > 0
        }
        cur = stratified_sample(cur, rates, stratum_col=stratum_col).cache()
        metrics["after_mixing"] = cur.count()

    # 6b. leakage-safe train/test split, keyed on the exact-dedup
    # fingerprint computed in stage 3 — duplicate content can never
    # straddle train/test (and the column ships with the shards)
    if test_frac is not None:
        from olympian_spark.operators.curation import leakage_safe_split

        cur = leakage_safe_split(cur, test_frac=test_frac).cache()
        metrics["n_test"] = cur.where(F.col("split") == "test").count()

    # 7. pack into fixed token budgets
    packed = pack_sequences(cur, token_col="ws_tokens", budget=budget, n_shards=n_shards)
    metrics["packs"] = (
        packed.select("shard", "pack_id").distinct().count()
    )
    return packed, metrics


def curate_to_catalog(
    cat,
    table: str,
    docs: DataFrame,
    **kwargs,
) -> tuple[dict, dict]:
    """Run :func:`curate_corpus` and commit the packed shards as a catalog
    table, with the per-stage survival metrics recorded IN the manifest
    snapshot — curation gets the same lineage story as the tier refresh
    (every snapshot answers "what did this job read, keep, and drop").

    Shards are the partition column, so downstream training readers get
    one directory per shard and snapshot isolation / time travel /
    retention / compaction for free. Returns (snapshot_record, metrics).
    """
    packed, metrics = curate_corpus(docs, **kwargs)
    snap = cat.overwrite_partitions(
        table,
        packed.withColumn("shard", F.col("shard").cast("string")),
        partition_col="shard",
        extra_meta={"curation_metrics": metrics},
    )
    return snap, metrics
