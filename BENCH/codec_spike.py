"""Shuffle-compression codec spike: lz4 (default) vs zstd at local[32].

The engine is memory-bandwidth-bound on this VM (BASELINE.md R2.3) and
shuffle files live on tmpfs, so shuffle bytes are pure memory traffic:
a denser codec moves fewer bytes over the shared bus at extra CPU cost.
Whether that trades profitably at 32 busy threads is an empirical
question — this script answers it on the 64M-turn scaling input.

    python BENCH/codec_spike.py [--turns 64000000] [--convs 32000] [--cores 32]

Interleaved best-of-2 per codec; prints one JSON summary line.
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
import json, sys, time
sys.path.insert(0, {repo!r})
from olympian_spark.session import get_spark
from olympian_spark.plans.pipeline import build_tiers, QcParams

cores, codec, path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(app_name=f"codec_{{codec}}", cores=cores,
                  extra_conf={{"spark.io.compression.codec": codec}})
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
print(json.dumps({{"codec": codec, "cores": cores, "wall_s": round(wall, 2),
                  "turns_per_sec": round(n / wall, 1), "counts": counts}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=64_000_000)
    ap.add_argument("--convs", type=int, default=32_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--codecs", nargs="+", default=["lz4", "zstd"])
    args = ap.parse_args()

    path = os.path.join(
        REPO, "_work", "scale",
        f"transcripts_{args.turns}_{args.convs}_h0.02_multi",
    )
    assert os.path.isdir(path), f"input missing: {path} (run scaling_run.py first)"
    child = os.path.join(REPO, "_work", "codec_child.py")
    with open(child, "w") as f:
        f.write(CHILD.format(repo=REPO))

    best: dict[str, dict] = {}
    for rep in range(args.repeats):
        for codec in args.codecs:
            print(f"running {codec} rep {rep}...", file=sys.stderr)
            out = subprocess.run(
                [sys.executable, child, str(args.cores), codec, path],
                capture_output=True, text=True, check=True,
            )
            r = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
            print(json.dumps(r), file=sys.stderr)
            if codec not in best or r["wall_s"] < best[codec]["wall_s"]:
                best[codec] = r
    base = best[args.codecs[0]]
    summary = {
        "input_turns": args.turns,
        "cores": args.cores,
        "best": best,
        "ratios_vs_" + args.codecs[0]: {
            c: round(base["wall_s"] / best[c]["wall_s"], 3) for c in args.codecs
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
