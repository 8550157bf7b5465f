"""Scaling-efficiency evidence (BASELINE.md: no real cluster in the
sandbox, so the N->4N-executor criterion is proxied by running the
IDENTICAL pipeline job at local[8] and local[32] on identical input;
efficiency = (throughput@32 / throughput@8) / 4).

Each measurement runs in a fresh subprocess (fresh JVM) so the two
runs cannot share executors, caches, or shuffle state. Results are
appended to BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [n_conv]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from sparksimjoin.fixtures import make_transcripts, expanded_vocab
from sparksimjoin.pipeline import PipelineConfig, run_pipeline
from sparksimjoin.checkpoint import CheckpointManager
from sparksimjoin.session import get_spark

cores = {cores}
n_conv = {n_conv}
spark = get_spark(app_name="scalebench", cores=cores, shuffle_partitions=cores)
tpdf, _ = make_transcripts(n_conv=n_conv, seed=42, vocab=expanded_vocab(2000))
tdf = spark.createDataFrame(tpdf).repartition(cores).cache()
n_turns = tdf.count()
with tempfile.TemporaryDirectory() as wd:
    t0 = time.time()
    clusters = run_pipeline(spark, tdf, wd, PipelineConfig(threshold=0.6))
    n = clusters.count()
    dt = time.time() - t0
    ckpt = CheckpointManager(spark, wd)
    n_cand = ckpt.manifest("candidates")["rows"]
    stages = {{m["stage"]: m["wall_time_sec"] for m in ckpt.all_manifests()}}
print(json.dumps({{"cores": cores, "n_conv": n_conv, "n_turns": n_turns,
                  "sec": round(dt, 2), "candidates": n_cand,
                  "cand_per_sec": round(n_cand / dt, 1),
                  "turns_per_sec": round(n_turns / dt, 1),
                  "stages": stages}}))
"""


def run(cores: int, n_conv: int) -> dict:
    code = CHILD.format(repo=str(REPO), cores=cores, n_conv=n_conv)
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, check=True
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    r8 = run(8, n_conv)
    print("local[8]:", r8)
    r32 = run(32, n_conv)
    print("local[32]:", r32)
    eff = (r32["cand_per_sec"] / r8["cand_per_sec"]) / 4
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = REPO / "BENCH" / "BASELINE.md"
    md.parent.mkdir(exist_ok=True)
    new_file = not md.exists()
    with md.open("a") as f:
        if new_file:
            f.write(
                "# BENCH/BASELINE — measured numbers\n\n"
                "Scaling-efficiency proxy per BASELINE.md: identical pipeline job\n"
                "(synthetic transcripts, seed 42) at local[8] vs local[32], fresh\n"
                "JVM each, efficiency = (throughput@32 / throughput@8) / 4.\n\n"
                "| when (UTC) | convs | turns | candidates | local[8] sec | local[32] sec "
                "| pairs/s @8 | pairs/s @32 | efficiency |\n"
                "|---|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {stamp} | {n_conv} | {r8['n_turns']} | {r8['candidates']} "
            f"| {r8['sec']} | {r32['sec']} | {r8['cand_per_sec']} "
            f"| {r32['cand_per_sec']} | {eff:.3f} |\n"
        )
    print(f"efficiency (8->32 cores, /4): {eff:.3f}  -> appended to {md}")


if __name__ == "__main__":
    main()
