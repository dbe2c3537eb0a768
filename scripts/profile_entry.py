#!/usr/bin/env python
"""Stage-level time attribution for one battery entry (guide §1: empirical).

Runs ENTRY with the Spark event log enabled, forces it with the noop sink
(twice: run 1 cold, run 2 warm — the bench measures warm), then parses the
event log into per-stage wall/task-time rows sorted by cost.

Usage: python scripts/profile_entry.py ENTRY [--sf /root/testdata/sf0.1]
           [--runs 2] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entry")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    logdir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(logdir, exist_ok=True)

    from oni_ml_spark.entry_queries import QUERIES
    from oni_ml_spark.session import get_spark

    spark = get_spark(
        f"profile_{args.entry}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.range(1000).count()
    spark.read.parquet(f"{args.sf}/lineitem.parquet").limit(1).count()

    fn = QUERIES[args.entry]
    for run_no in range(args.runs):
        spark.sparkContext.setJobDescription(f"RUN{run_no}:{args.entry}")
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        print(f"run {run_no}: {time.perf_counter() - t0:.3f} s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    spark.stop()
    time.sleep(1)

    # ---- parse the event log -------------------------------------------
    files = [p for p in glob.glob(f"{logdir}/**/*", recursive=True) if os.path.isfile(p)]
    path = max(files, key=os.path.getsize)
    stage_submit: dict[tuple, float] = {}
    stages = []  # (stage_id, attempt, name, wall_s, task_time_s, n_tasks, desc)
    job_of_stage: dict[int, str] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                for sid in ev.get("Stage IDs", []):
                    job_of_stage[sid] = desc
            elif et == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stage_submit[(si["Stage ID"], si["Stage Attempt ID"])] = (
                    si.get("Submission Time") or 0
                )
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                if sub is None or com is None:
                    continue
                stages.append(
                    (
                        si["Stage ID"],
                        si["Stage Name"].split("\n")[0],
                        (com - sub) / 1000.0,
                        si.get("Number of Tasks", 0),
                        job_of_stage.get(si["Stage ID"], ""),
                    )
                )

    stages.sort(key=lambda s: -s[2])
    total = sum(s[2] for s in stages)
    print(f"\n== {args.entry}: {len(stages)} stages, sum-of-stage-wall {total:.2f} s ==")
    print(f"{'stage':>6} {'wall_s':>8} {'tasks':>6}  desc | name")
    for sid, name, wall, ntasks, desc in stages[: args.top]:
        d = desc[:40]
        print(f"{sid:>6} {wall:>8.3f} {ntasks:>6}  {d} | {name[:90]}")

    # per-run totals
    runs: dict[str, float] = {}
    for _, _, wall, _, desc in stages:
        key = desc.split(":")[0] if desc.startswith("RUN") else "other"
        runs[key] = runs.get(key, 0.0) + wall
    print("\nper-run sum-of-stage-wall:", json.dumps(runs))


if __name__ == "__main__":
    main()
