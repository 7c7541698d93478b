"""Per-stage 8-vs-32-core attribution of the 64M-turn pipeline (round-5
VERDICT #5).

The 8→32 scaling-efficiency analysis so far rests on end-to-end curves
("the memory bus"); this run makes it per-stage: the same tier-pipeline
workload as BENCH/scaling_run.py executes at local[8] and local[32] with
the Spark event log enabled, and the parent parses per-task metrics out of
the log into a per-stage table — wall, summed task time, JVM CPU time,
GC, shuffle read/write volume and fetch wait — so the efficiency loss is
attributed to concrete stages instead of inferred.

    python BENCH/stage_attrib_run.py [--turns 64000000] [--levels 8 32]

Writes BENCH/stage_attrib.json and prints a markdown table for
BENCH/BASELINE.md. Stages are grouped across levels by their data
signature (input MB, shuffle-read MB, shuffle-write MB are level-invariant
for identical inputs); AQE sub-stages with one signature aggregate.
"""

from __future__ import annotations

import argparse
import glob
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
evdir = sys.argv[3]
os.makedirs(evdir, exist_ok=True)
spark = get_spark(app_name=f"attrib_{{cores}}", cores=cores, extra_conf={{
    "spark.eventLog.enabled": "true",
    "spark.eventLog.compress": "false",
    "spark.eventLog.dir": "file://" + evdir,
}})
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
# marker: stages submitted before this wall-clock belong to warmup
print(json.dumps({{"cores": cores, "n_turns": n, "wall_s": round(wall, 2),
                  "turns_per_sec": round(n / wall, 1), "t_start_ms": int(t0 * 1000),
                  "counts": counts}}))
spark.stop()
"""


def parse_eventlog(path: str, t_start_ms: int) -> list[dict]:
    """Aggregate task metrics per stage from a Spark JSON event log,
    keeping only stages submitted after the timed region began."""
    # Spark 4 event logs may be a rolling directory (eventlog_v2_*/events_*)
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "events_*")))
    else:
        files = [path]
    stages: dict[int, dict] = {}
    for fp in files:
        _parse_file(fp, stages, t_start_ms)
    return [s for s in stages.values() if "wall_s" in s]


def _parse_file(path: str, stages: dict, t_start_ms: int) -> None:
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            typ = ev.get("Event")
            if typ == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                if sub is None or sub < t_start_ms:
                    stages.pop(sid, None)
                    continue
                s = stages.setdefault(sid, _zero())
                s["name"] = si["Stage Name"].split(" at ")[0]
                s["wall_s"] = (si["Completion Time"] - sub) / 1e3
            elif typ == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics")
                if not tm:
                    continue
                s = stages.setdefault(sid, _zero())
                s["task_s"] += tm.get("Executor Run Time", 0) / 1e3
                s["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                s["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
                s["deser_s"] += tm.get("Executor Deserialize Time", 0) / 1e3
                s["input_mb"] += tm.get("Input Metrics", {}).get("Bytes Read", 0) / 1e6
                srm = tm.get("Shuffle Read Metrics", {})
                s["sh_read_mb"] += (
                    srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)
                ) / 1e6
                s["fetch_wait_s"] += srm.get("Fetch Wait Time", 0) / 1e3
                swm = tm.get("Shuffle Write Metrics", {})
                s["sh_write_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
                s["sh_write_s"] += swm.get("Shuffle Write Time", 0) / 1e9
                s["n_tasks"] += 1


def _zero() -> dict:
    return dict(
        task_s=0.0, cpu_s=0.0, gc_s=0.0, deser_s=0.0, input_mb=0.0,
        sh_read_mb=0.0, fetch_wait_s=0.0, sh_write_mb=0.0, sh_write_s=0.0,
        n_tasks=0,
    )


def signature(s: dict) -> str:
    """Level-invariant stage identity: same input data -> same byte
    volumes regardless of parallelism. Quantized to absorb metric noise."""

    def q(x):
        return 0 if x < 1 else int(round(x / max(50, x * 0.2)) * max(50, x * 0.2))

    kind = (
        "scan" if s["input_mb"] > 1 and s["sh_read_mb"] < 1
        else "exchange" if s["sh_read_mb"] > 1 and s["sh_write_mb"] > 1
        else "reduce" if s["sh_read_mb"] > 1
        else "local"
    )
    return f"{s['name']}|{kind}|in{q(s['input_mb'])}|r{q(s['sh_read_mb'])}|w{q(s['sh_write_mb'])}"


def group(stages: list[dict]) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for s in stages:
        key = signature(s)
        g = out.setdefault(key, _zero() | {"wall_s": 0.0, "name": s["name"]})
        for k, v in s.items():
            if isinstance(v, (int, float)):
                g[k] = g.get(k, 0) + v
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=64_000_000)
    ap.add_argument("--convs", type=int, default=32_000)
    ap.add_argument("--levels", type=int, nargs="+", default=[8, 32])
    args = ap.parse_args()

    path = os.path.join(
        REPO, "_work", "scale", f"transcripts_{args.turns}_{args.convs}_h0.02_multi"
    )
    if not os.path.exists(path):
        sys.path.insert(0, REPO)
        from olympian_spark.datagen import write_transcripts

        print(f"generating {args.turns} turns...", file=sys.stderr)
        write_transcripts(path, n_turns=args.turns, n_convs=args.convs, seed=42,
                          hot_conv_share=0.02, n_files=64)

    child = os.path.join(REPO, "_work", "attrib_child.py")
    with open(child, "w") as f:
        f.write(CHILD.format(repo=REPO))

    results = {}
    for cores in args.levels:
        evdir = os.path.join(REPO, "_work", f"eventlog_{cores}")
        import shutil

        shutil.rmtree(evdir, ignore_errors=True)
        p = subprocess.run(
            [sys.executable, child, str(cores), path, evdir],
            capture_output=True, text=True,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        meta = json.loads(line)
        print(f"local[{cores}]: {meta['wall_s']}s "
              f"{meta['turns_per_sec']} turns/s", file=sys.stderr)
        logs = sorted(glob.glob(os.path.join(evdir, "*")))
        stages = parse_eventlog(logs[-1], meta["t_start_ms"])
        results[cores] = {"meta": meta, "groups": group(stages)}

    lo, hi = args.levels[0], args.levels[-1]
    keys = sorted(
        set(results[lo]["groups"]) | set(results[hi]["groups"]),
        key=lambda k: -(results[hi]["groups"].get(k, {}).get("wall_s", 0)),
    )
    rows = []
    print(f"\n| stage (sig) | wall@{lo} | wall@{hi} | {lo}c task/cpu/gc s | "
          f"{hi}c task/cpu/gc s | shuffle r/w MB | {lo}->{hi} wall ratio |")
    print("|---|---|---|---|---|---|---|")
    for k in keys:
        a = results[lo]["groups"].get(k)
        b = results[hi]["groups"].get(k)
        if not a or not b or (a["wall_s"] < 0.5 and b["wall_s"] < 0.5):
            continue
        ratio = a["wall_s"] / b["wall_s"] if b["wall_s"] else float("nan")
        rows.append({"sig": k, "lo": a, "hi": b, "wall_ratio": round(ratio, 2)})
        print(
            f"| {k.split('|')[0][:28]} ({'|'.join(k.split('|')[1:2])}) "
            f"| {a['wall_s']:.1f} | {b['wall_s']:.1f} "
            f"| {a['task_s']:.0f}/{a['cpu_s']:.0f}/{a['gc_s']:.1f} "
            f"| {b['task_s']:.0f}/{b['cpu_s']:.0f}/{b['gc_s']:.1f} "
            f"| {b['sh_read_mb']:.0f}/{b['sh_write_mb']:.0f} "
            f"| {ratio:.2f} |"
        )
    out = {
        "levels": {str(c): results[c]["meta"] for c in args.levels},
        "stages": rows,
    }
    with open(os.path.join(HERE, "stage_attrib.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\nwritten BENCH/stage_attrib.json", file=sys.stderr)


if __name__ == "__main__":
    main()
