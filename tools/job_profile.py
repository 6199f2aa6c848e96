#!/usr/bin/env python3
"""Per-job time attribution for one gate: runs the gate like bench.py
(suite-style warmup at sf0.001, then timed reps at the target sf) with
the Spark UI enabled, and dumps every job the timed rep ran — duration,
description, stage count — from the UI REST API.

Usage: python3 tools/job_profile.py <gate> [sf_dir] [reps]

This is an ATTRIBUTION tool (guide §1.1 empirical loop), not a ranking
harness: absolute numbers here are ad-hoc-session numbers (SURVEY §9 —
only the bench harness ranks variants); the *relative* split across a
gate's jobs is what it exists to show.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    gate = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import __spark_entry__ as entry_mod
    from leann_rs_spark.session import get_spark

    spark = get_spark(
        app_name=f"job-profile-{gate}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    fn = entry_mod.queries()[gate]

    # warmup: smoke sf once (codegen/JIT), then one untimed target run
    try:
        fn(spark, "/root/testdata/sf0.001").count()
    except Exception as exc:
        print(f"# warmup failed: {exc}", file=sys.stderr)
    spark.catalog.clearCache()
    prewarm = getattr(entry_mod, "prewarm", None)
    if prewarm is not None:
        try:
            prewarm(spark, sf_dir)
        except Exception as exc:
            print(f"# prewarm failed: {exc}", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4050/api/v1/applications/{app_id}"

    def jobs_after(first_id: int) -> list[dict]:
        with urllib.request.urlopen(f"{base}/jobs?status=succeeded") as r:
            jobs = json.load(r)
        return [j for j in jobs if j["jobId"] >= first_id]

    best, best_jobs = None, None
    for rep in range(reps):
        with urllib.request.urlopen(f"{base}/jobs") as r:
            seen = json.load(r)
        first_id = max((j["jobId"] for j in seen), default=-1) + 1
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        print(f"# rep {rep}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        if best is None or dt < best:
            best = dt
            best_jobs = jobs_after(first_id)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    print(f"\n=== {gate}: best rep {best:.3f}s, {len(best_jobs)} jobs ===")
    tot = 0.0
    for j in sorted(best_jobs, key=lambda j: j["jobId"]):
        sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        done = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        # sub-second from the GMT strings' milliseconds
        ms0 = float(j["submissionTime"][20:23]) / 1000
        ms1 = float(j["completionTime"][20:23]) / 1000
        dur = (time.mktime(done) + ms1) - (time.mktime(sub) + ms0)
        tot += dur
        desc = (j.get("description") or j["name"])[:110]
        print(
            f"job {j['jobId']:>4} {dur:7.3f}s stages={len(j['stageIds'])}"
            f" tasks={j['numTasks']:>5}  {desc}"
        )
    print(f"sum of job durations: {tot:.3f}s (wall {best:.3f}s)")


if __name__ == "__main__":
    main()
