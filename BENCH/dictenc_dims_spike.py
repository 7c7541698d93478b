"""role/tool/event_type dictionary-encoding spike (round-4 backlog item).

Two measurements, same session, best-of-N interleaved:

A) dimension-rollup stage: groupBy(bucket, role|tool) over a persisted
   narrow frame with (a) string dims vs (b) tinyint-encoded dims decoded
   after the aggregate. This is the only stage of the 64M scaling workload
   that touches the dim strings (map-side partials mean the shuffle moves
   (bucket x dim) rows either way — the spike measures hash-agg keying
   cost, not shuffle bytes).

B) events->transcripts ordering exchange: the 5-char event_type crossing
   the stage-1 wire as string vs tinyint (role/tool CASE evaluated
   post-shuffle from the code either way).

    python BENCH/dictenc_dims_spike.py [--turns 16000000] [--cores 32] [--reps 3]

Prints one JSON line; record the adopt/reject decision in docs/PLANS.md
(adopt only if >1.05x, per round-3 verdict methodology).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=16_000_000)
    ap.add_argument("--convs", type=int, default=16_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from olympian_spark.datagen import write_transcripts
    from olympian_spark.operators.rollup import rollup_by_dimension
    from olympian_spark.session import get_spark

    path = os.path.join(
        REPO, "_work", "scale",
        f"transcripts_{args.turns}_{args.convs}_h0.02_multi",
    )
    if not os.path.exists(path):
        write_transcripts(path, n_turns=args.turns, n_convs=args.convs,
                          seed=42, hot_conv_share=0.02, n_files=64)

    spark = get_spark(app_name="dictenc_dims_spike", cores=args.cores)
    spark.range(1000).selectExpr("sum(id)").collect()

    t = spark.read.parquet(path)
    pre_str = t.select(
        "conv_id", "ts", "role", "tool",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("float").alias("text_len"),
    ).persist()
    pre_str.count()

    # tinyint dims: deterministic code assignment via a broadcastable map
    role_map = {r: i for i, r in enumerate(["user", "assistant", "system", "tool"])}
    tool_map = {"bash": 0, "search": 1}
    rcode = F.coalesce(
        *[F.when(F.col("role") == k, F.lit(v)) for k, v in role_map.items()]
    ).cast("tinyint")
    tcode = F.coalesce(
        *[F.when(F.col("tool") == k, F.lit(v)) for k, v in tool_map.items()]
    ).cast("tinyint")
    pre_int = t.select(
        "conv_id", "ts", rcode.alias("role"), tcode.alias("tool"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("float").alias("text_len"),
    ).persist()
    pre_int.count()

    def dims(frame):
        n = 0
        for d in ("role", "tool"):
            n += rollup_by_dimension(frame, d, "hour").count()
        return n

    best = {"str": None, "int": None}
    for _ in range(args.reps):
        for name, frame in (("str", pre_str), ("int", pre_int)):
            t0 = time.time()
            dims(frame)
            w = time.time() - t0
            if best[name] is None or w < best[name]:
                best[name] = w

    # B) events-path ordering exchange with event_type as string vs tinyint
    ev_best = {"str": None, "int": None}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").persist()
    ev.count()
    from pyspark.sql import Window

    et_code = F.coalesce(
        *[
            F.when(F.col("event_type") == k, F.lit(v))
            for v, k in enumerate(["view", "click", "purchase", "signup", "error"])
        ]
    ).cast("tinyint")
    for _ in range(args.reps):
        for name in ("str", "int"):
            pre = ev.select(
                F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("conv_id"),
                "ts", "event_id",
                (F.col("event_type") if name == "str" else et_code).alias("et"),
                "props", "value",
            )
            w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
            out = pre.select(
                "conv_id",
                (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
                "et", "props", "value", "ts",
            )
            t0 = time.time()
            out.count()
            wsec = time.time() - t0
            if ev_best[name] is None or wsec < ev_best[name]:
                ev_best[name] = wsec

    out = {
        "turns": args.turns,
        "cores": args.cores,
        "dims_wall_s": {k: round(v, 3) for k, v in best.items()},
        "dims_speedup_int_over_str": round(best["str"] / best["int"], 3),
        "events_wall_s": {k: round(v, 3) for k, v in ev_best.items()},
        "events_speedup_int_over_str": round(ev_best["str"] / ev_best["int"], 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
