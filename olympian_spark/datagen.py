"""Deterministic synthetic transcripts generator.

Produces the input_hint table shape
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` at arbitrary scale, seeded — no external data, reproducible
across processes (numpy Generator with a fixed seed).

Realism levers that matter for the engine:
- **heavy-tailed conversation sizes** with one hot conversation holding
  ~20% of all turns (exercises skew salting / AQE),
- **irregular gaps** incl. multi-period gaps (NULL spine slots) and
  duplicate-second bursts,
- roles/tools drawn from fixed small vocabularies; empty texts included
  (bytewise text-equality invariant must cover "").

Pure numpy + pyarrow (no Spark needed) so tests and bench can generate
inputs cheaply at any scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["bash", "read", "edit", "search", "none"])
WORDS = np.array(
    "the quick brown fox jumps over lazy dog spark shuffle rollup spine gap "
    "tier block window flag check conv turn latency tool agent text stream".split()
)
EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z, unix seconds


def gen_transcripts(
    n_turns: int = 100_000,
    n_convs: int = 500,
    seed: int = 42,
    hot_conv_share: float = 0.20,
    span_days: float = 30.0,
) -> pa.Table:
    rng = np.random.default_rng(seed)

    # conversation sizes: one hot conv + zipf tail, normalized to n_turns
    hot = int(n_turns * hot_conv_share)
    rest = n_turns - hot
    w = rng.zipf(1.5, size=n_convs - 1).astype(np.float64)
    sizes = np.maximum(1, np.round(w / w.sum() * rest)).astype(np.int64)
    # fix rounding drift on the largest tail conv
    drift = rest - sizes.sum()
    sizes[np.argmax(sizes)] += drift
    if sizes[np.argmax(sizes)] < 1:
        raise ValueError("n_turns too small for n_convs")
    sizes = np.concatenate([[hot], sizes])

    conv_ids = []
    turn_idx = []
    ts = []
    span_s = span_days * 86400.0
    for c, size in enumerate(sizes):
        size = int(size)
        start = EPOCH_2024 + rng.uniform(0.0, span_s * 0.25)
        # gap mixture: bursts (0s), normal (1..120s), long (1..6h)
        kind = rng.choice(3, size=size, p=[0.05, 0.90, 0.05])
        gaps = np.where(
            kind == 0,
            0.0,
            np.where(
                kind == 1,
                rng.uniform(1.0, 120.0, size=size),
                rng.uniform(3600.0, 6 * 3600.0, size=size),
            ),
        )
        gaps[0] = 0.0
        t = start + np.cumsum(gaps)
        conv_ids.append(np.full(size, f"conv_{c:06d}"))
        turn_idx.append(np.arange(size, dtype=np.int32))
        ts.append(t)

    conv_id = np.concatenate(conv_ids)
    turn_idx = np.concatenate(turn_idx)
    ts = np.concatenate(ts)
    n = conv_id.size

    role = ROLES[rng.choice(4, size=n, p=[0.42, 0.42, 0.06, 0.10])]
    tool_raw = TOOLS[rng.choice(5, size=n)]
    tool = np.where((role == "tool") | (rng.random(n) < 0.15), tool_raw, None)

    # texts: 0..24 words; ~2% empty
    n_words = rng.integers(0, 25, size=n)
    n_words[rng.random(n) < 0.02] = 0
    flat = rng.choice(WORDS, size=int(n_words.sum()))
    texts = []
    pos = 0
    for k in n_words:
        texts.append(" ".join(flat[pos : pos + k]))
        pos += k

    table = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool.tolist(), pa.string()),
            "ts": pa.array((ts * 1e6).astype(np.int64), pa.timestamp("us", tz="UTC")),
        }
    )
    return table


def write_transcripts(
    path: str, row_group_size: int = 131_072, n_files: int = 1, **kwargs
) -> str:
    """Write transcripts parquet.

    ``n_files > 1`` writes a directory of part files — a single large file
    caps Spark's scan parallelism at ceil(bytes / maxPartitionBytes) and
    gates the whole first stage; real tables always arrive as many files.
    """
    table = gen_transcripts(**kwargs)
    if n_files <= 1:
        pq.write_table(table, path, row_group_size=row_group_size)
        return path
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    step = -(-n // n_files)
    for i in range(n_files):
        sl = table.slice(i * step, step)
        if sl.num_rows:
            pq.write_table(
                sl, os.path.join(path, f"part-{i:05d}.parquet"),
                row_group_size=row_group_size,
            )
    return path
