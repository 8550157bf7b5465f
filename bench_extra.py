"""Optimization-round measurement harness (guide §1) — NOT the driver
bench. bench.py stays frozen; this file exists so plan/stage evidence
can be gathered per query without touching the measured contract.

Usage:
  python bench_extra.py <query_name> [--plan-out FILE] [--runs N]
  python bench_extra.py --list

Runs ONE bench query (from bench.bench_queries()) in this process on
local[$SPARK_GRAFT_CPUS] against $SPARK_GRAFT_SF_DIR, with the Spark UI
enabled, and reports:
  - .explain("formatted") written to --plan-out (plans/r06 evidence)
  - wall time per run (run 1 = cold, run 2+ = steady state), using the
    SAME action as the frozen bench (.count()) so numbers are
    comparable, plus an optional noop-sink run (--noop) that computes
    every column
  - the top stages by executor run time from the UI REST API, so the
    expensive exchange/join/agg is identifiable without guessing.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _rest(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def top_stages(port: int, n: int = 12):
    apps = _rest(port, "applications")
    app_id = apps[0]["id"]
    stages = _rest(port, f"applications/{app_id}/stages?status=complete")
    stages.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
    out = []
    for s in stages[:n]:
        out.append(
            {
                "stageId": s["stageId"],
                "attempt": s["attemptId"],
                "name": s["name"].split("\n")[0][:100],
                "tasks": s["numCompleteTasks"],
                "executorRunTime_s": round(s["executorRunTime"] / 1000, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "shuffleRead_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuffleWrite_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "spill_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
            }
        )
    return out


def main():
    from bench import bench_queries

    qs = bench_queries()
    if "--list" in sys.argv:
        print("\n".join(qs))
        return
    name = sys.argv[1]
    plan_out = None
    if "--plan-out" in sys.argv:
        plan_out = sys.argv[sys.argv.index("--plan-out") + 1]
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 2
    use_noop = "--noop" in sys.argv

    from sparksimjoin.cache import release_all
    from sparksimjoin.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    port = int(os.environ.get("BENCH_EXTRA_UI_PORT", "4055"))
    spark = get_spark(
        app_name=f"bench-extra-{name}",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(port)},
    )
    # absorb first-job init, same as the frozen bench child
    from pyspark.sql import functions as _F

    spark.range(1_000_000).repartition(cores).groupBy(_F.col("id") % 7).count().count()

    if plan_out:
        df = qs[name](spark, sf_dir)
        Path(plan_out).parent.mkdir(parents=True, exist_ok=True)
        with open(plan_out, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        release_all()

    times = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
            n = -1
        else:
            n = df.count()
        times.append(round(time.time() - t0, 3))
        release_all()
    print(json.dumps({"query": name, "rows": n, "times": times}))
    for s in top_stages(port):
        print(json.dumps(s))


if __name__ == "__main__":
    main()
