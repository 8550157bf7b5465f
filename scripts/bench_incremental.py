"""Incremental-vs-full linkage wall-clock at a size where data costs
dominate fixed per-stage costs (the bench.py default of 6k convs is
fixed-cost-bound: ~9 checkpointed stages x ~3-5s floor each).

Legs (fresh JVM each, same synthetic transcripts corpus):
  full : run_pipeline over all n_conv conversations (timed)
  inc  : run_pipeline over the first 90% (untimed prerequisite),
         then run_incremental of the last 10% (timed)

Usage: python scripts/bench_incremental.py [n_conv] [cores]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from sparksimjoin.fixtures import make_transcripts, expanded_vocab
from sparksimjoin.pipeline import PipelineConfig, run_pipeline
from sparksimjoin.incremental import run_incremental
from sparksimjoin.checkpoint import CheckpointManager
from sparksimjoin.session import get_spark
from pyspark.sql import functions as F

cores = {cores}
spark = get_spark(app_name="inc-bench", cores=cores, shuffle_partitions=cores)
spark.range(1_000_000).repartition(cores).groupBy(F.col("id") % 7).count().count()
tpdf, _ = make_transcripts(n_conv={n_conv}, seed=42, vocab=expanded_vocab(2000))
tdf = spark.createDataFrame(tpdf).repartition(cores).cache(); tdf.count()
cfg = PipelineConfig(threshold=0.6)
mode = {mode!r}
wd = tempfile.mkdtemp()
if mode == "full":
    t0 = time.time()
    run_pipeline(spark, tdf, wd, cfg).count()
    sec = round(time.time() - t0, 2)
    cand = CheckpointManager(spark, wd).manifest("candidates")["rows"]
else:
    cut = "conv%08d" % int({n_conv} * 0.9)
    base_df = tdf.where(F.col("conv_id") < cut)
    batch_df = tdf.where(F.col("conv_id") >= cut).cache(); batch_df.count()
    run_pipeline(spark, base_df, wd + "/base", cfg)
    t0 = time.time()
    run_incremental(spark, batch_df, wd + "/base", wd + "/inc", cfg).count()
    sec = round(time.time() - t0, 2)
    cand = CheckpointManager(spark, wd + "/inc").manifest("candidates")["rows"]
print("RESULT", json.dumps({{"mode": mode, "sec": sec, "cand": int(cand)}}))
"""


def leg(mode: str, n_conv: int, cores: int) -> dict:
    code = CHILD.format(repo=str(REPO), cores=cores, n_conv=n_conv, mode=mode)
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stderr[-2000:], file=sys.stderr)
        raise SystemExit(1)
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("RESULT")][-1]
    return json.loads(line.split(" ", 1)[1])


def main():
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    full = leg("full", n_conv, cores)
    inc = leg("inc", n_conv, cores)
    out = {
        "n_conv": n_conv, "cores": cores,
        "full_sec": full["sec"], "full_cand": full["cand"],
        "inc_sec": inc["sec"], "inc_cand": inc["cand"],
        "speedup": round(full["sec"] / inc["sec"], 2),
        "cand_ratio": round(inc["cand"] / full["cand"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
