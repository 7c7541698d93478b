"""Unit tests for operators/curation.py: repetition stats, stratified
sampling, sequence packing."""

import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olympian_spark.operators.curation import (  # noqa: E402
    _KNUTH,
    _PRE_MOD,
    _RATE_MOD,
    pack_sequences,
    stratified_sample,
    with_repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_repetition_edge_cases(spark):
    rows = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "one"),
        (4, "a a a a"),
        (5, "x y x y x"),
        (6, "all words here are distinct tokens"),
    ]
    out = {
        r["doc_id"]: r
        for r in with_repetition_stats(_docs(spark, rows)).collect()
    }
    for d in (0, 1, 2):
        assert out[d]["n_words"] == 0
        assert out[d]["dup_word_frac_x1e6"] == 0
        assert out[d]["n_2grams"] == 0
        assert out[d]["top_2gram_count"] == 0
        assert out[d]["top_2gram_frac_x1e6"] == 0
    assert out[3]["n_words"] == 1 and out[3]["n_2grams"] == 0
    # "a a a a": 4 words 1 distinct -> dup 3/4; 3 grams all "a a" -> top 3/3
    assert out[4]["n_words"] == 4
    assert out[4]["n_distinct_words"] == 1
    assert out[4]["dup_word_frac_x1e6"] == 750000
    assert out[4]["n_2grams"] == 3
    assert out[4]["top_2gram_count"] == 3
    assert out[4]["top_2gram_frac_x1e6"] == 1000000
    # "x y x y x": grams [x y, y x, x y, y x] -> top 2 of 4
    assert out[5]["top_2gram_count"] == 2
    assert out[5]["n_2grams"] == 4
    assert out[5]["top_2gram_frac_x1e6"] == 500000
    assert out[6]["dup_word_frac_x1e6"] == 0
    assert out[6]["top_2gram_count"] == 1


def test_repetition_matches_python_counter(spark):
    """Property: the aggregate-fold top-2-gram equals a Python Counter on
    pseudo-random word-salad docs."""
    import random

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(50)
    ]
    got = {
        r["doc_id"]: r for r in with_repetition_stats(_docs(spark, rows)).collect()
    }
    for i, text in rows:
        words = text.split() if text.strip() else []
        grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        assert got[i]["n_words"] == len(words)
        assert got[i]["n_distinct_words"] == len(set(words))
        assert got[i]["n_2grams"] == len(grams)
        top = max(Counter(grams).values()) if grams else 0
        assert got[i]["top_2gram_count"] == top


def test_stratified_sample_exact_and_partition_invariant(spark):
    df = spark.range(0, 5000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'es' ELSE 'zz' END AS lang",
    )
    rates = {"en": 0.5, "es": 0.25}
    kept = stratified_sample(df, rates, default_rate=0.1)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # reference computation
    exp = []
    for i in range(5000):
        lang = "en" if i % 3 == 0 else ("es" if i % 3 == 1 else "zz")
        h = (i % _PRE_MOD) * _KNUTH % _RATE_MOD
        thr = {"en": 500000, "es": 250000}.get(lang, 100000)
        if h < thr:
            exp.append(i)
    assert ids == exp
    # partition-invariance: repartitioned input keeps the SAME rows
    ids2 = sorted(
        r["doc_id"] for r in stratified_sample(df.repartition(13), rates, default_rate=0.1).collect()
    )
    assert ids2 == ids
    # approximate rate sanity (binomial tolerance)
    n_en = sum(1 for i in ids if i % 3 == 0)
    assert abs(n_en / (5000 / 3) - 0.5) < 0.05


def test_pack_sequences_contract(spark):
    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 400) for i in range(200)] + [(200, 0)],
        "doc_id BIGINT, ws_tokens BIGINT",
    )
    out = pack_sequences(df, budget=512, n_shards=4).collect()
    assert len(out) == 201
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        start = 0
        for r in rows:
            assert r["pack_id"] == start // 512
            assert r["pack_offset"] == start % 512
            if r["ws_tokens"] == 0:
                assert r["n_packs_spanned"] == 0
            else:
                last = (start + r["ws_tokens"] - 1) // 512
                assert r["n_packs_spanned"] == last - r["pack_id"] + 1
            start += r["ws_tokens"]
    # every pack except each shard's last is exactly full: total tokens
    # before any doc is a running sum, so coverage is contiguous
    for shard, rows in by_shard.items():
        total = sum(r["ws_tokens"] for r in rows)
        max_pack = max((r["pack_id"] for r in rows), default=0)
        assert total >= max_pack * 512  # last pack starts within the stream


def test_pack_sequences_plan_single_shuffle(spark):
    df = spark.range(1000).selectExpr("id AS doc_id", "id % 50 AS ws_tokens")
    plan = pack_sequences(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_vocab_topk_determinism_and_ties(spark):
    from olympian_spark.operators.textstats import vocab_topk

    rows = [
        (0, "b a b c a b"),
        (1, "a c d D d"),
        (2, None),
        (3, "   "),
    ]
    out = [(r["token"], r["n"]) for r in vocab_topk(_docs(spark, rows), k=3).collect()]
    # counts: a=3 b=3 c=2 d=3 (lowercased) -> top3 by (n desc, token asc): a,b,d
    assert out == [("a", 3), ("b", 3), ("d", 3)]
    full = {r["token"]: r["n"] for r in vocab_topk(_docs(spark, rows), k=10).collect()}
    assert full == {"a": 3, "b": 3, "d": 3, "c": 2}


def test_leakage_split_groups_never_straddle(spark):
    from olympian_spark.operators.curation import leakage_safe_split
    from olympian_spark.operators.textstats import with_fingerprint

    # 300 docs over 100 distinct texts -> triples of exact duplicates
    rows = [(i, f"doc body number {i % 100}") for i in range(300)]
    out = leakage_safe_split(
        with_fingerprint(_docs(spark, rows)), test_frac=0.3
    ).collect()
    by_fp = {}
    for r in out:
        by_fp.setdefault(r["fingerprint"], set()).add(r["split"])
        assert r["rep_id"] == min(i for i in range(300) if i % 100 == r["rep_id"] % 100)
    assert all(len(s) == 1 for s in by_fp.values())  # whole-group assignment
    n_test_groups = sum(
        1 for fp, s in by_fp.items() if s == {"test"}
    )
    assert 10 <= n_test_groups <= 50  # ~30 of 100, binomial slack


def test_decontaminate_flags_and_plan(spark):
    from olympian_spark.operators.curation import decontaminate

    bench = _docs(spark, [(0, "alpha beta gamma delta")])
    train = _docs(
        spark,
        [
            (10, "x alpha beta gamma y"),        # shares "alpha beta gamma"
            (11, "beta gamma delta"),             # shares "beta gamma delta"
            (12, "alpha beta x gamma delta"),     # no full 3-gram shared
            (13, "alpha beta gamma delta"),       # shares two 3-grams
            (14, ""),
            (15, None),
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(train, bench, n=3).collect()}
    assert len(out) == 6
    assert out[10]["contaminated"] and out[10]["n_bench_shingles"] == 1
    assert out[11]["contaminated"] and out[11]["n_bench_shingles"] == 1
    assert not out[12]["contaminated"] and out[12]["n_bench_shingles"] == 0
    assert out[13]["n_bench_shingles"] == 2
    assert not out[14]["contaminated"] and not out[15]["contaminated"]
    # the 100-TB side must never shuffle for the match: benchmark broadcast
    plan = decontaminate(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_mask_pii_spans_and_counts(spark):
    from olympian_spark.operators.curation import mask_pii

    rows = [
        (0, "mail a.b+c@test.co.uk then 10.0.0.1 and 555-123-4567"),
        (1, None),
        (2, "two mails x@y.io z@w.dev and ip 1.2.3.4 again 5.6.7.8"),
        (3, "not-a-phone 12-345-6789 not-an-ip 1.2.3 half@mail"),
    ]
    out = {r["doc_id"]: r for r in mask_pii(_docs(spark, rows)).collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_ipv4"] == 1 and out[0]["n_phone"] == 1
    assert out[0]["masked_text"] == "mail <EMAIL> then <IPV4> and <PHONE>"
    assert out[1]["masked_text"] == "" and out[1]["n_email"] == 0
    assert out[2]["n_email"] == 2 and out[2]["n_ipv4"] == 2
    assert out[2]["masked_text"] == "two mails <EMAIL> <EMAIL> and ip <IPV4> again <IPV4>"
    assert out[3]["n_email"] == 0 and out[3]["n_ipv4"] == 0 and out[3]["n_phone"] == 0
    assert out[3]["masked_text"] == rows[3][1]


def test_mixing_rates_binding_constraint(spark):
    from olympian_spark.operators.curation import mixing_rates, stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i < 600 else ("b" if i < 700 else "c")) for i in range(1000)],
        "doc_id BIGINT, source STRING",
    )
    # n: a=600 b=100 c=300; targets a=.5 b=.25 c=.25
    # binding: b (100/.25=400) -> total 400 -> kept a=200 b=100 c=100
    out = {r["stratum"]: r for r in mixing_rates(df, {"a": 0.5, "b": 0.25, "c": 0.25}).collect()}
    assert out["a"]["rate_x1e6"] == 333333 and out["a"]["expected_kept"] == 199
    assert out["b"]["rate_x1e6"] == 1000000 and out["b"]["expected_kept"] == 100
    assert out["c"]["rate_x1e6"] == 333333 and out["c"]["expected_kept"] == 99
    # untargeted strata get rate 0
    out2 = mixing_rates(df, {"a": 1.0}).collect()
    assert {r["stratum"]: r["rate_x1e6"] for r in out2} == {
        "a": 1000000, "b": 0, "c": 0,
    }
    # composes with stratified_sample: realized counts near expectations
    rates = {r["stratum"]: r["rate_x1e6"] / 1e6
             for r in mixing_rates(df, {"a": 0.5, "b": 0.25, "c": 0.25}).collect()}
    kept = stratified_sample(df, rates, stratum_col="source").groupBy("source").count().collect()
    realized = {r["source"]: r["count"] for r in kept}
    assert realized["b"] == 100
    assert abs(realized["a"] - 200) < 40 and abs(realized["c"] - 100) < 30


def test_unigram_logprob_values_and_oov_floor(spark):
    import math

    from olympian_spark.operators.textstats import unigram_logprob

    rows = [(0, "a a b"), (1, "b c"), (2, ""), (3, None)]
    # corpus tokens: a a b b c -> p(a)=2/5 p(b)=2/5 p(c)=1/5
    out = {r["doc_id"]: r for r in unigram_logprob(_docs(spark, rows)).collect()}
    lp = lambda p: math.floor(math.log(p) * 1e6)
    assert out[0]["n_tokens"] == 3
    assert out[0]["sum_lp_x1e6"] == 2 * lp(2 / 5) + lp(2 / 5)
    assert out[0]["mean_nll_x1e6"] == math.floor(
        -(3 * lp(2 / 5)) / 3
    )
    assert out[1]["sum_lp_x1e6"] == lp(2 / 5) + lp(1 / 5)
    assert out[2]["n_tokens"] == 0 and out[2]["mean_nll_x1e6"] == 0
    assert out[3]["n_tokens"] == 0
    # rarer docs score higher NLL (the filter's ordering property)
    assert out[1]["mean_nll_x1e6"] > out[0]["mean_nll_x1e6"]
    # max_vocab=2 keeps a,b (count desc, token asc); c scores the OOV floor
    out2 = {
        r["doc_id"]: r
        for r in unigram_logprob(_docs(spark, rows), max_vocab=2, oov_alpha=0.5).collect()
    }
    assert out2[1]["sum_lp_x1e6"] == lp(2 / 5) + lp(0.5 / 5)


def test_cluster_aware_split_composition(spark):
    """leakage_safe_split generalizes beyond exact fingerprints: keyed on
    near-dup connected components, whole near-duplicate CLUSTERS land in
    one split (the contamination-proof train/test recipe)."""
    from pyspark.sql import functions as F

    from olympian_spark.operators.curation import leakage_safe_split
    from olympian_spark.operators.dedup import connected_components, ngram_jaccard_pairs

    # 10 clusters of 3 near-identical docs (one token varies mid-body)
    rows = []
    for c in range(10):
        base = [f"c{c}w{j}" for j in range(30)]
        for k in range(3):
            body = list(base)
            body[15] = f"var{k}"
            rows.append((c * 10 + k, " ".join(body)))
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    pairs = ngram_jaccard_pairs(df, threshold=0.7, max_doc_freq=None)
    comp = connected_components(pairs).selectExpr("node AS doc_id", "component")
    keyed = df.join(comp, "doc_id", "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col("doc_id"))
    )
    out = leakage_safe_split(
        keyed, test_frac=0.4, key_col="component", id_col="doc_id"
    ).collect()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert len(out) == 30
    assert all(len(s) == 1 for s in by_comp.values())
    assert len(by_comp) == 10  # the 3-doc clusters were recovered


def test_repetition_hypothesis_arbitrary_text(spark):
    """Hypothesis: repetition stats match a Python reference on arbitrary
    text (tabs, newlines, unicode, repeated runs) — pins the \\s+
    normalization and the fold against whitespace edge cases."""
    from collections import Counter as C

    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab \t\n\rué中")), max_size=40
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=20, deadline=None)
    @given(texts)
    def check(batch):
        rows = [(i, t) for i, t in enumerate(batch)]
        got = {
            r["doc_id"]: r
            for r in with_repetition_stats(_docs(spark, rows)).collect()
        }
        for i, t in rows:
            words = t.split()
            grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
            r = got[i]
            assert r["n_words"] == len(words)
            assert r["n_distinct_words"] == len(set(words))
            assert r["n_2grams"] == len(grams)
            assert r["top_2gram_count"] == (max(C(grams).values()) if grams else 0)

    check()


def test_importance_sample_exact_and_monotone(spark):
    from pyspark.sql import functions as F

    from olympian_spark.operators.curation import importance_sample

    df = spark.range(10_000).selectExpr(
        "id AS doc_id",
        "CAST(CASE WHEN id % 4 = 0 THEN 0.9 WHEN id % 4 = 1 THEN 0.5"
        "     WHEN id % 4 = 2 THEN 0.1 ELSE 0.0 END AS DOUBLE) AS q",
    )
    kept = importance_sample(df, "q").collect()
    ids = {r["doc_id"] for r in kept}
    # reference: identical integer arithmetic
    exp = set()
    for i in range(10_000):
        rate = [0.9, 0.5, 0.1, 0.0][i % 4]
        if (i % _PRE_MOD) * _KNUTH % _RATE_MOD < int(rate * _RATE_MOD):
            exp.add(i)
    assert ids == exp
    # zero-rate rows never survive; survival is monotone in the rate
    assert not any(i % 4 == 3 for i in ids)
    frac = lambda m: sum(1 for i in ids if i % 4 == m) / 2500
    assert frac(0) > frac(1) > frac(2) > 0
    # out-of-range rates clamp instead of misbehaving
    clamped = importance_sample(
        df.withColumn("q", F.lit(2.0)), "q"
    ).count()
    assert clamped == 10_000


def test_unigram_logprob_grouped_models(spark):
    import math

    from olympian_spark.operators.textstats import unigram_logprob

    rows = [
        (0, "a a b", "en"),
        (1, "a", "fr"),
        (2, "c c", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")
    out = {
        r["doc_id"]: r
        for r in unigram_logprob(df, group_col="lang").collect()
    }
    lp = lambda p: math.floor(math.log(p) * 1e6)
    # en model: tokens a a b -> p(a)=2/3 p(b)=1/3
    assert out[0]["sum_lp_x1e6"] == 2 * lp(2 / 3) + lp(1 / 3)
    # fr model: tokens a c c -> p(a)=1/3 p(c)=2/3 (doc 1 scored on FR stats)
    assert out[1]["sum_lp_x1e6"] == lp(1 / 3)
    assert out[2]["sum_lp_x1e6"] == 2 * lp(2 / 3)
    # grouped OOV floor: per-group total
    out2 = {
        r["doc_id"]: r
        for r in unigram_logprob(df, group_col="lang", max_vocab=1, oov_alpha=0.5).collect()
    }
    # fr keeps only 'c' (count 2); 'a' scores ln(0.5/3)
    assert out2[1]["sum_lp_x1e6"] == lp(0.5 / 3)


def test_curriculum_order_global_rank(spark):
    from pyspark.sql import functions as F

    from olympian_spark.operators.curation import curriculum_order

    df = spark.range(5000).selectExpr(
        "id AS doc_id", "CAST(pmod(id * 37, 101) AS DOUBLE) AS q"
    )
    out = curriculum_order(df, "q", n_partitions=7).collect()
    assert len(out) == 5000
    # rank is a permutation of 0..n-1
    ranks = sorted(r["curriculum_rank"] for r in out)
    assert ranks == list(range(5000))
    # matches the single-partition reference order (score desc, id asc)
    ref = sorted(((-r["q"], r["doc_id"]) for r in out))
    by_rank = {r["curriculum_rank"]: (-r["q"], r["doc_id"]) for r in out}
    for i, key in enumerate(ref):
        assert by_rank[i] == key
    # no single-partition exchange in the plan
    plan = curriculum_order(df, "q", n_partitions=7)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # ascending mode
    asc = curriculum_order(df, "q", ascending=True, n_partitions=7).collect()
    first = min(asc, key=lambda r: r["curriculum_rank"])
    assert first["q"] == min(r["q"] for r in asc)


def test_bigram_logprob_values(spark):
    import math

    from olympian_spark.operators.textstats import bigram_logprob

    rows = [(0, "a b a b"), (1, "a b c"), (2, "x"), (3, None)]
    # transitions: doc0: (a b),(b a),(a b); doc1: (a b),(b c)
    # counts: "a b"=3, "b a"=1, "b c"=1; prefixes: a*=3+1? no: prefix a -> "a b"x3; prefix b -> "b a"+"b c"=2
    out = {r["doc_id"]: r for r in bigram_logprob(_docs(spark, rows)).collect()}
    lp = lambda c, p: math.floor(math.log(c / p) * 1e6)
    assert out[0]["n_transitions"] == 3
    assert out[0]["sum_lp_x1e6"] == 2 * lp(3, 3) + lp(1, 2)  # a-b certain, b-a 1/2
    assert out[1]["sum_lp_x1e6"] == lp(3, 3) + lp(1, 2)
    assert out[2]["n_transitions"] == 0 and out[2]["mean_nll_x1e6"] == 0
    assert out[3]["n_transitions"] == 0
    # scrambled text scores worse than the dominant transition pattern
    assert out[1]["mean_nll_x1e6"] > out[0]["mean_nll_x1e6"] - 1
