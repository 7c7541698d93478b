"""Streaming exact deduplication for continuously-arriving documents.

The batch pipeline dedups with a fingerprint groupBy
(operators/dedup.exact_dedup); on a stream the same contract — keep the
first document per content fingerprint, drop later arrivals, across
micro-batch boundaries — is exactly what Structured Streaming's stateful
``dropDuplicates`` family provides, so this wrapper stays thin and lets
the engine manage the keyed state store (RocksDB-spillable on a real
cluster, checkpointed, restart-safe).

Scale note: plain ``dropDuplicates`` keeps one state entry per distinct
fingerprint FOREVER — fine for bounded key universes, wrong for an
unbounded 100 TB/day document firehose. For that, pass ``event_time_col``
+ ``watermark``: the operator switches to
``dropDuplicatesWithinWatermark``, which evicts state older than the
watermark (duplicates separated by more than the watermark are then both
kept — the documented trade; cross-day exact dedup belongs to the batch
refresh, which is how the tier pipeline treats every non-decomposable
recompute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from olympian_spark.operators.textstats import with_fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    event_time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first document per content fingerprint across micro-batches.

    Input: a streaming DataFrame with a ``text`` column. Output: the input
    plus ``fingerprint``, with later same-fingerprint arrivals dropped.
    "First" within a single micro-batch is whichever row the engine
    retains — cross-batch, state guarantees earlier batches win.
    """
    s = with_fingerprint(stream)
    if event_time_col is not None:
        return s.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return s.dropDuplicates(["fingerprint"])
