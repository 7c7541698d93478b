"""End-to-end curation plan: stage composition, metrics monotonicity,
and stage-specific kills on a corpus engineered to exercise every gate."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olympian_spark.plans.curate import curate_corpus  # noqa: E402


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 40 good docs, distinct content, two langs
    for i in range(40):
        lang = "en" if i % 2 == 0 else "es"
        body = " ".join(f"t{i}x{j}" for j in range(60))
        rows.append((i, f"the and of to is {body}", lang))
    # exact duplicates of docs 0..4 (higher ids -> dropped by keep-first)
    for i in range(5):
        lang = "en" if i % 2 == 0 else "es"
        body = " ".join(f"t{i}x{j}" for j in range(60))
        rows.append((100 + i, f"the and of to is {body}", lang))
    # near-duplicate of doc 6 (one token changed)
    body6 = " ".join(f"t6x{j}" for j in range(60))
    rows.append((200, "the and of to is " + body6.replace("t6x42", "zzz", 1), "en"))
    # junk: too repetitive
    rows.append((300, "spam " * 80, "en"))
    # junk: low quality (all punctuation)
    rows.append((301, "!!! ??? ### $$$ %%%" * 20, "en"))
    # PII dup: same text as doc 1 except an email -> must dedup away
    body1 = " ".join(f"t1x{j}" for j in range(60))
    rows.append((302, f"the and of to is {body1} contact me@x.io", "es"))
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")


def test_curate_corpus_stages(spark, corpus):
    bench = corpus.limit(0)  # empty benchmark: decontaminate must be a no-op
    packed, m = curate_corpus(
        corpus,
        benchmark=bench,
        targets={"en": 0.5, "es": 0.5},
        quality_min_x1e6=400_000,
        dup_word_max_x1e6=500_000,
        budget=128,
        n_shards=2,
    )
    assert m["input"] == 49
    # gates kill 300 (repetition) and 301 (quality)
    assert m["after_quality"] == 47
    # keep-first exact dedup kills 100..104; PII scrub makes 302 a byte-dup
    # of doc 1 EXCEPT the <EMAIL> tail -> near-dup, not exact-dup
    assert m["after_exact_dedup"] == 42
    # near-dedup kills 200 (one-token change) and 302 (email tail)
    assert m["after_near_dedup"] == 40
    assert m["after_decontaminate"] == 40
    assert m["after_mixing"] <= 40
    out = packed.toPandas()
    assert len(out) == m["after_mixing"]
    assert set(out["shard"].unique()) <= {0, 1}
    assert (out["n_packs_spanned"] >= 1).all()
    assert m["packs"] == len(out[["shard", "pack_id"]].drop_duplicates())
    # survivors keep their provenance columns
    for col in ("doc_id", "text", "lang", "fingerprint", "ws_tokens", "quality_x1e6"):
        assert col in out.columns
    # no dropped doc made it through
    assert not ({100, 101, 102, 103, 104, 200, 300, 301, 302} & set(out["doc_id"]))


def test_curate_corpus_minimal_args(spark, corpus):
    packed, m = curate_corpus(corpus, dup_word_max_x1e6=500_000)
    assert "after_mixing" not in m and "after_decontaminate" not in m
    assert m["after_near_dedup"] == packed.count()


def test_curate_to_catalog_manifest_metrics(spark, corpus, tmp_path):
    from olympian_spark.sources.catalog import ParquetManifestCatalog
    from olympian_spark.plans.curate import curate_to_catalog

    cat = ParquetManifestCatalog(spark, str(tmp_path / "cur"))
    snap, m = curate_to_catalog(
        cat, "shards", corpus, dup_word_max_x1e6=500_000, budget=128, n_shards=2
    )
    assert snap["op"] == "overwrite_partitions"
    assert snap["curation_metrics"] == m
    back = cat.read("shards")
    assert back.count() == m["after_near_dedup"]
    assert set(int(r["shard"]) for r in back.select("shard").distinct().collect()) <= {0, 1}
    # manifest survives reload (metrics are part of the committed record)
    reloaded = cat.current_snapshot("shards")
    assert reloaded["curation_metrics"]["input"] == 49


def test_curate_corpus_semantic_stage(spark, corpus):
    """Wiring an embeddings frame adds the SemDeDup stage: docs whose
    embeddings are near-identical collapse to the min-id representative."""
    import numpy as np

    rng = np.random.default_rng(9)
    ids = [r.doc_id for r in corpus.select("doc_id").collect()]
    base = {i: rng.normal(0, 1, 16) for i in ids}
    # docs 8 and 10 share (nearly) doc 6's embedding -> semantic dups
    base[8] = base[6] + rng.normal(0, 1e-4, 16)
    base[10] = base[6] + rng.normal(0, 1e-4, 16)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in ids],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    packed, m = curate_corpus(
        corpus,
        embeddings=emb,
        embedding_dim=16,
        semantic_threshold=0.99,
        dup_word_max_x1e6=500_000,
    )
    assert "after_semantic_dedup" in m
    assert m["after_semantic_dedup"] <= m["after_near_dedup"] - 2
    out_ids = {r.doc_id for r in packed.select("doc_id").collect()}
    assert 6 in out_ids and 8 not in out_ids and 10 not in out_ids


def test_curate_corpus_split_column(spark, corpus):
    packed, m = curate_corpus(
        corpus, dup_word_max_x1e6=500_000, test_frac=0.3, n_shards=2
    )
    out = packed.toPandas()
    assert "split" in out.columns and "rep_id" in out.columns
    assert set(out["split"].unique()) <= {"train", "test"}
    assert m["n_test"] == (out["split"] == "test").sum()
    # survivors are already exact-deduped, so every rep is itself
    assert (out["rep_id"] == out["doc_id"]).all()
