"""Cluster-size scaling proxy (north rule: >= 0.8 efficiency from N to 4N).

No real cluster exists in this sandbox, so per driver instruction the same
job runs at two parallelism levels — local[8] and local[32] — on the SAME
deterministic input (seeded datagen), one subprocess (one JVM) per level.

    python BENCH/scaling_run.py [--turns 2000000] [--convs 4000]

Writes BENCH/scaling_results.json and prints a summary. The workload is the
full tier pipeline (QC flags -> 1m/1h/1d cascade with blocks + exact p95),
timed after session warm-up; throughput = turns / pipeline wall.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from olympian_spark.session import get_spark
from olympian_spark.plans.pipeline import build_tiers, QcParams

cores = int(sys.argv[1])
path = sys.argv[2]
spark = get_spark(app_name=f"scaling_{{cores}}", cores=cores)
# warm the JVM AND the python-worker cohort so the timed region measures the
# engine, not process startup
spark.range(1000).selectExpr("sum(id)").collect()
wdf = spark.range(5000).selectExpr("cast(id as string) k", "id v").repartition(2 * cores, "k")
wdf.groupBy("k").applyInPandas(lambda p: p.head(1), "k string, v long").count()
t = spark.read.parquet(path)
n = t.count()
t0 = time.time()
tiers = build_tiers(t, QcParams(dip_high=300.0, dip_max=1200.0), persist=True)
counts = {{k: tiers[k].count() for k in
          ("tier_1m", "tier_1h", "tier_1d", "rollup_role_1h", "rollup_tool_1h")}}
wall = time.time() - t0
print(json.dumps({{"cores": cores, "n_turns": n, "wall_s": round(wall, 2),
                  "turns_per_sec": round(n / wall, 1), "counts": counts}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4_000_000)
    ap.add_argument("--convs", type=int, default=8_000)
    # the serial unit of a per-conversation ordered window is one
    # conversation; the scaling study bounds the largest conversation at a
    # realistic ~2% of rows (the pathological 20%-hot case is covered by the
    # salting/AQE skew tests, not the scaling criterion)
    ap.add_argument("--hot-share", type=float, default=0.02)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--levels", type=int, nargs="+", default=[8, 32])
    ap.add_argument(
        "--out", default="scaling_results.json",
        help="result filename under BENCH/ (so alternate pairings don't "
        "overwrite the headline 8-vs-32 record)",
    )
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from olympian_spark.datagen import write_transcripts

    work = os.path.join(REPO, "_work", "scale")
    os.makedirs(work, exist_ok=True)
    path = os.path.join(
        work, f"transcripts_{args.turns}_{args.convs}_h{args.hot_share}_multi"
    )
    if not os.path.exists(path):
        print(f"generating {args.turns} turns...", file=sys.stderr)
        write_transcripts(path, n_turns=args.turns, n_convs=args.convs, seed=42,
                          hot_conv_share=args.hot_share, n_files=64)

    child = os.path.join(work, "child.py")
    with open(child, "w") as f:
        f.write(CHILD.format(repo=REPO))

    # interleave levels (8,32,8,32,...) rather than running each level's
    # reps back-to-back: this VM shows multi-minute CPU-steal EPISODES
    # (up to 4x slowdown); interleaving gives every level a shot at the
    # calm windows, and best-of-N per level then compares like with like
    best: dict[int, dict] = {}
    for rep in range(args.repeats):
        for cores in args.levels:
            print(f"running local[{cores}] rep {rep}...", file=sys.stderr)
            out = subprocess.run(
                [sys.executable, child, str(cores), path],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            print(line, file=sys.stderr)
            if cores not in best or r["wall_s"] < best[cores]["wall_s"]:
                best[cores] = r
    results = [best[c] for c in args.levels]

    base, top = results[0], results[-1]
    ratio = top["cores"] / base["cores"]
    eff = (top["turns_per_sec"] / base["turns_per_sec"]) / ratio
    summary = {
        "input_turns": args.turns,
        "levels": results,
        "speedup": round(top["turns_per_sec"] / base["turns_per_sec"], 3),
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    with open(os.path.join(HERE, args.out), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
