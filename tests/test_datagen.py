"""Deterministic synthetic transcripts: shape, skew, reproducibility."""

import numpy as np
import pyarrow.compute as pc

from olympian_spark.datagen import gen_transcripts


def test_shape_and_determinism():
    t1 = gen_transcripts(n_turns=20_000, n_convs=100, seed=42)
    t2 = gen_transcripts(n_turns=20_000, n_convs=100, seed=42)
    assert t1.equals(t2)
    assert t1.num_rows == 20_000
    assert t1.column_names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_hot_conv_skew():
    t = gen_transcripts(n_turns=50_000, n_convs=200, seed=42)
    counts = t.group_by("conv_id").aggregate([("conv_id", "count")])
    top = max(counts.column("conv_id_count").to_pylist())
    assert top >= 0.18 * 50_000  # hot conversation holds ~20%


def test_monotone_ts_and_contiguous_turns():
    t = gen_transcripts(n_turns=5_000, n_convs=50, seed=1)
    df = t.to_pandas()
    for _, g in df.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert (g.turn_idx.values == np.arange(len(g))).all()
        assert (np.diff(g.ts.values.astype("int64")) >= 0).all()


def test_empty_texts_present():
    t = gen_transcripts(n_turns=10_000, n_convs=50, seed=42)
    n_empty = pc.sum(pc.equal(t.column("text"), "").cast("int64")).as_py()
    assert n_empty > 0
