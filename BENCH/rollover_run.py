"""Locate the thread-count throughput rollover on this box.

Round-5 scaling refreshes showed local[16] (379k turns/s) BEATING every
local[32] run ever recorded (331-341k): adding 16 threads to the same
memory bus REMOVES throughput. This study adds the intermediate point —
16/24/32 threads, interleaved best-of-2 on the identical 64M input — to
locate where the rollover happens, sharpening the bus-ceiling evidence
behind the north-rule discussion in BASELINE.md.

OUTCOME (recorded in BASELINE.md R5.4): both executions landed in
sustained degraded-steal windows and could not locate the rollover;
within those windows the ordering inverted (32 > 24 >= 16), which is
itself evidence that cross-window thread-count comparisons are unsafe
on this VM. Kept for re-running if the box ever goes quiet.

    python BENCH/rollover_run.py [--turns 64000000] [--convs 32000]

Writes BENCH/scaling_results_rollover.json. Reuses scaling_run.CHILD so
the timed region is identical to every other pairing on record.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from scaling_run import CHILD  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=64_000_000)
    ap.add_argument("--convs", type=int, default=32_000)
    ap.add_argument("--hot-share", type=float, default=0.02)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--levels", type=int, nargs="+", default=[16, 24, 32])
    args = ap.parse_args()

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

    best: dict[int, dict] = {}
    runs: list[dict] = []
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
            runs.append(r)
            if cores not in best or r["wall_s"] < best[cores]["wall_s"]:
                best[cores] = r

    summary = {
        "input_turns": args.turns,
        "levels": [best[c] for c in args.levels],
        "all_runs": [
            {k: r[k] for k in ("cores", "wall_s", "turns_per_sec")} for r in runs
        ],
        "per_core_best": {
            c: round(best[c]["turns_per_sec"] / c, 1) for c in args.levels
        },
    }
    with open(os.path.join(HERE, "scaling_results_rollover.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
