"""Attribute scaling loss: run the north-rule pipeline at one core
count with the Spark event log enabled, then decompose each stage's task
time into CPU / GC / shuffle-write / fetch-wait / unaccounted stall.

The 2v8 scaling rows in BENCH/BASELINE.md record WHAT the efficiency
is; this script answers WHY a leg underscales — if summed task
executorCpuTime is flat across legs but executorRunTime grows, the
extra threads are stalling, and the metric deltas say on what.

Usage: python scripts/profile_scaling.py <cores> [n_conv]
Prints one JSON line per stage plus a totals line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from sparksimjoin.fixtures import make_transcripts, expanded_vocab
from sparksimjoin.pipeline import PipelineConfig, run_pipeline
from sparksimjoin.session import get_spark

cores = {cores}
n_conv = {n_conv}
spark = get_spark(app_name="scaleprof", cores=cores, shuffle_partitions=cores,
                  extra_conf={{"spark.eventLog.enabled": "true",
                              "spark.eventLog.compress": "false",
                              "spark.eventLog.rolling.enabled": "false",
                              "spark.eventLog.dir": {evdir!r}}})
tpdf, _ = make_transcripts(n_conv=n_conv, seed=42, vocab=expanded_vocab(2000))
tdf = spark.createDataFrame(tpdf).repartition(cores).cache()
n_turns = tdf.count()
with tempfile.TemporaryDirectory() as wd:
    t0 = time.time()
    clusters = run_pipeline(spark, tdf, wd, PipelineConfig(threshold=0.6))
    n = clusters.count()
    dt = time.time() - t0
print(json.dumps({{"cores": cores, "n_turns": n_turns, "clusters": n,
                  "sec": round(dt, 2)}}))
spark.stop()
"""

# TaskMetrics keys in the event-log JSON (ms unless noted)
_KEYS = {
    "run_ms": ("Executor Run Time",),
    "cpu_ms": ("Executor CPU Time",),  # nanoseconds
    "gc_ms": ("JVM GC Time",),
    "deser_ms": ("Executor Deserialize Time",),
    "ser_ms": ("Result Serialization Time",),
}


def _event_lines(path: Path):
    # Spark 4 rolling event logs are DIRECTORIES
    # (eventlog_v2_<app>/events_1_<app>...); single-file logs still occur
    # with rolling disabled
    files = sorted(path.glob("events_*")) if path.is_dir() else [path]
    for fp in files:
        if fp.suffix in (".zstd", ".lz4", ".snappy"):
            # Spark compresses rolling event logs with the codec in
            # spark.eventLog.compression.codec (zstd default);
            # pyarrow's input_stream handles streaming frames
            import io

            import pyarrow as pa

            with pa.input_stream(str(fp), compression=fp.suffix[1:]) as raw:
                yield from io.TextIOWrapper(raw, encoding="utf-8")
        else:
            with open(fp) as f:
                yield from f


def parse_eventlog(path: Path) -> list[dict]:
    stages: dict[int, dict] = {}
    agg: dict[int, defaultdict] = {}
    for line in _event_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                # the callsite Stage Name is useless for SQL plans
                # ("withThreadLocalCaptured..."); the RDD scope names
                # carry the physical operators this stage executes
                scopes: list[str] = []
                for rdd in si.get("RDD Info", []):
                    sc = rdd.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except json.JSONDecodeError:
                            nm = ""
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stages[sid] = {
                    "stage": sid,
                    "name": " ".join(reversed(scopes))[:120]
                    or si["Stage Name"].split("\n")[0][:60],
                    "tasks": si["Number of Tasks"],
                    "wall_s": round(
                        (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                        / 1000.0, 2),
                }
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                a = agg.setdefault(sid, defaultdict(float))
                a["run_ms"] += m.get("Executor Run Time", 0)
                a["cpu_ms"] += m.get("Executor CPU Time", 0) / 1e6
                a["gc_ms"] += m.get("JVM GC Time", 0)
                a["deser_ms"] += m.get("Executor Deserialize Time", 0)
                a["ser_ms"] += m.get("Result Serialization Time", 0)
                a["max_task_run_ms"] = max(
                    a["max_task_run_ms"], m.get("Executor Run Time", 0)
                )
                sw = m.get("Shuffle Write Metrics") or {}
                a["shufw_ms"] += sw.get("Shuffle Write Time", 0) / 1e6  # ns
                a["shufw_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                a["shufw_rec"] += sw.get("Shuffle Records Written", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                a["fetch_ms"] += sr.get("Fetch Wait Time", 0)
                a["shufr_mb"] += (sr.get("Local Bytes Read", 0)
                                  + sr.get("Remote Bytes Read", 0)) / 1e6
                a["shufr_rec"] += sr.get("Total Records Read", 0)
                # sort/agg spill: per-task execution memory shrinks as
                # parallelism grows (shared pool / n concurrent tasks),
                # so a stage can run in-memory at 2 cores and spill at
                # 8+ — the fallback burns CPU, not wait time
                a["spill_mem_mb"] += m.get("Memory Bytes Spilled", 0) / 1e6
                a["spill_disk_mb"] += m.get("Disk Bytes Spilled", 0) / 1e6
                a["peak_mem_mb"] = max(
                    a["peak_mem_mb"],
                    m.get("Peak Execution Memory", 0) / 1e6,
                )
                inp = m.get("Input Metrics") or {}
                a["in_mb"] += inp.get("Bytes Read", 0) / 1e6
                out = m.get("Output Metrics") or {}
                a["out_mb"] += out.get("Bytes Written", 0) / 1e6
    rows = []
    for sid, meta in sorted(stages.items()):
        a = agg.get(sid, {})
        row = dict(meta)
        for k in ("run_ms", "cpu_ms", "gc_ms", "deser_ms", "ser_ms",
                  "shufw_ms", "fetch_ms"):
            row[k.replace("_ms", "_s")] = round(a.get(k, 0.0) / 1000.0, 2)
        for k in ("shufw_mb", "shufr_mb", "in_mb", "out_mb"):
            row[k] = round(a.get(k, 0.0), 1)
        for k in ("shufw_rec", "shufr_rec"):
            row[k] = int(a.get(k, 0))
        row["max_task_s"] = round(a.get("max_task_run_ms", 0.0) / 1000.0, 2)
        for k in ("spill_mem_mb", "spill_disk_mb", "peak_mem_mb"):
            row[k] = round(a.get(k, 0.0), 1)
        # stall = task clock not accounted by CPU or GC: I/O waits,
        # lock contention, scheduler preemption, page faults
        row["stall_s"] = round(row["run_s"] - row["cpu_s"] - row["gc_s"], 2)
        rows.append(row)
    return rows


def main():
    cores = int(sys.argv[1])
    n_conv = int(sys.argv[2]) if len(sys.argv) > 2 else 24000
    with tempfile.TemporaryDirectory() as evdir:
        code = CHILD.format(repo=str(REPO), cores=cores, n_conv=n_conv, evdir=evdir)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, env=dict(os.environ), check=True)
        summary = out.stdout.strip().splitlines()[-1]
        print("RUN:", summary, flush=True)
        logs = sorted(Path(evdir).glob("*"), key=lambda p: p.stat().st_mtime)
        rows = parse_eventlog(logs[-1]) if logs else []
    sys.path.insert(0, str(REPO / "scripts"))
    from bench_membw import measure as membw_measure

    print("MEMBW_POST_GBPS:", membw_measure(cores), flush=True)
    tot = defaultdict(float)
    for r in rows:
        if r["run_s"] >= 1.0:  # drop sub-second scheduler noise stages
            print(json.dumps(r))
        for k in ("wall_s", "run_s", "cpu_s", "gc_s", "shufw_s", "fetch_s",
                  "stall_s", "shufw_mb", "in_mb", "out_mb"):
            tot[k] += r.get(k, 0.0)
    print("TOTALS:", json.dumps({k: round(v, 1) for k, v in tot.items()}))


if __name__ == "__main__":
    main()
