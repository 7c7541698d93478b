"""Benchmark harness.

Runs the engine's headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints exactly ONE
JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., ...extras}

Headline set:
- pipeline_tiers: the full engine path — transcripts mapping, QC flags,
  1m/1h/1d tier cascade with f32 measures + exact p95 + Gorilla blocks
  (reported also as turns/sec, the north-rule metric)
- representative relational operators from queries(): rollups, spine
  gap-fill + LOCF, QC-filtered rollup, top-k, sessionization

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
BENCH/scaling_run.py (subprocess per parallelism level — one JVM each);
results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from olympian_spark.plans.pipeline import QcParams, build_tiers
    from olympian_spark.session import get_spark
    from olympian_spark.sources.transcripts import transcripts_from_events

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="olympian_spark_bench", cores=cores)
    # warm the JVM + python workers so per-query times measure the engine,
    # not process startup
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # --- headline: full tier pipeline (turns/sec) ---
    t = transcripts_from_events(spark, sf_dir)
    n_turns = t.count()

    def run_pipeline() -> None:
        # heap persist, not localCheckpoint: tmpfs checkpoint serialization
        # burns 40-58% SYSTEM time at 32 threads (measured round 2) and
        # capped the pipeline at ~130k turns/s vs ~204k with heap persist
        tiers = build_tiers(t, QcParams(dip_high=60.0, dip_max=1800.0), persist=True)
        for k in ("tier_1m", "tier_1h", "tier_1d", "rollup_role_1h", "rollup_tool_1h"):
            tiers[k].count()


    timed("pipeline_tiers", run_pipeline)

    # --- representative relational operators ---
    qs = entrymod.queries()
    for name in (
        "q03_step_flags",
        "q06_spine_gapfill_hourly",
        "q07_locf_hourly",
        "q08_rollup_1m",
        "q09_rollup_1h_from_1m_partials",
        "q13_qc_filtered_rollup_1h",
        "q15_top_gaps",
        "q16_sessionize",
        "q19_salted_agg_equivalence",
    ):
        timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # engine-native kernels
    timed("q24_gorilla_roundtrip", lambda: qs["q24_gorilla_roundtrip"](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cores": cores,
        "n_turns": n_turns,
        "pipeline_turns_per_sec": round(n_turns / timings["pipeline_tiers"], 1),
    }
    # N-vs-4N scaling evidence rides along COMPACTLY: the driver's tail
    # capture is bounded, so the final line must stay short (round-3
    # BENCH_r03.json came back `parsed: null` when the full multi-session
    # records were inlined). Full detail stays in BENCH/scaling_results*.json
    # and BENCH/BASELINE.md; here each pairing is summarized to
    # {cores: turns_per_sec} + efficiency.
    import glob as _glob

    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")

    def _summ(path: str) -> dict:
        with open(path) as f:
            d = json.load(f)
        s = {
            "input_turns": d["input_turns"],
            "tps": {str(lv["cores"]): lv["turns_per_sec"] for lv in d["levels"]},
        }
        # multi-level studies (e.g. the 16/24/32 rollover probe) have no
        # single N-vs-4N pairing, hence no efficiency scalar — summarize
        # what exists instead of crashing the whole bench after the fact
        if "scaling_efficiency" in d:
            s["efficiency"] = d["scaling_efficiency"]
        return s

    scaling_path = os.path.join(bench_dir, "scaling_results.json")
    if os.path.exists(scaling_path):
        out["scaling"] = _summ(scaling_path)
    for p in sorted(_glob.glob(os.path.join(bench_dir, "scaling_results_*.json"))):
        out.setdefault("scaling_more", {})[os.path.basename(p)[16:-5]] = _summ(p)
    # degrade gracefully under the driver-tail line budget: the timed work
    # is already done — never crash the whole run over summary size. Drop
    # the optional scaling_more entries (oldest first), then scaling,
    # before giving up; the full detail always stays in BENCH/*.json.
    def _fits():
        return len(json.dumps(out, separators=(",", ":"))) < 2000

    while not _fits() and out.get("scaling_more"):
        out["scaling_more"].pop(next(iter(out["scaling_more"])))
        if not out["scaling_more"]:
            del out["scaling_more"]
    if not _fits():
        out.pop("scaling", None)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
