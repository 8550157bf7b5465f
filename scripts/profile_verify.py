"""Isolate the verify (scored) stage's thread-scaling anomaly.

The full-pipeline event-log profiles (scripts/profile_scaling.py) show
the scored stage's summed executor CPU TIME — not stall, not GC, not
fetch — inflating ~7x from local[2] to local[8] on the SAME 9.7M
candidate pairs (2026-08-18, BENCH/BASELINE.md). That is per-row CPU
cost growing with thread count, which no partitioning theory explains;
candidates are balanced (max task == wall) and both token joins
broadcast.

This script pins the stage down: prepare ONE candidates+tokens
checkpoint, then re-run ONLY verify_pairs at several core counts, each
in a fresh JVM with event logging, and print the per-stage CPU / spill
/ peak-memory decomposition using profile_scaling.parse_eventlog (which
captures Memory/Disk Bytes Spilled and Peak Execution Memory).

Usage: python scripts/profile_verify.py [n_conv] [cores ...]
Default: 12000 convs at 2, 8 cores.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

PREP = r"""
import sys, time
sys.path.insert(0, {repo!r})
from sparksimjoin.fixtures import make_transcripts, expanded_vocab
from sparksimjoin.pipeline import PipelineConfig, run_pipeline
from sparksimjoin.session import get_spark

spark = get_spark(app_name="verifprep", cores=8, shuffle_partitions=8)
tpdf, _ = make_transcripts(n_conv={n_conv}, seed=42, vocab=expanded_vocab(2000))
tdf = spark.createDataFrame(tpdf).repartition(8).cache()
tdf.count()
run_pipeline(spark, tdf, {wd!r}, PipelineConfig(threshold=0.6)).count()
spark.stop()
"""

LEG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from sparksimjoin.session import get_spark
from sparksimjoin.joins.core import verify_pairs

cores = {cores}
spark = get_spark(app_name="verifleg", cores=cores, shuffle_partitions=cores,
                  extra_conf={{"spark.eventLog.enabled": "true",
                              "spark.eventLog.compress": "false",
                              "spark.eventLog.rolling.enabled": "false",
                              "spark.eventLog.dir": {evdir!r}}})
from sparksimjoin.joins.core import ensure_iid

cand = spark.read.parquet({wd!r} + "/candidates")
# the tokens checkpoint predates the iid funnel's column; re-derive it
# exactly as the pipeline's scored stage does (window over hash bucket)
tokens = ensure_iid(spark.read.parquet({wd!r} + "/tokens"))
n_cand = cand.count()
t0 = time.time()
scored = verify_pairs(cand, tokens, tokens, "JACCARD", 0.6, self_join=True,
                      id_space="iid", keep_iids=True)
n = scored.count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "n_cand": n_cand, "matches": n,
                  "verify_sec": round(dt, 2)}}))
spark.stop()
"""


def main() -> None:
    args = sys.argv[1:]
    n_conv = int(args[0]) if args else 12000
    core_list = [int(c) for c in args[1:]] or [2, 8]
    sys.path.insert(0, str(REPO / "scripts"))
    from bench_membw import measure as membw_measure
    from profile_scaling import parse_eventlog

    with tempfile.TemporaryDirectory() as wd:
        subprocess.run(
            [sys.executable, "-c", PREP.format(repo=str(REPO), n_conv=n_conv, wd=wd)],
            capture_output=True, text=True, check=True, env=dict(os.environ),
        )
        for cores in core_list:
            print(f"MEMBW_PRE[{cores}]:", round(membw_measure(cores), 1), flush=True)
            with tempfile.TemporaryDirectory() as evdir:
                code = LEG.format(repo=str(REPO), cores=cores, wd=wd, evdir=evdir)
                out = subprocess.run([sys.executable, "-c", code],
                                     capture_output=True, text=True, check=True,
                                     env=dict(os.environ))
                print("RUN:", out.stdout.strip().splitlines()[-1], flush=True)
                logs = sorted(Path(evdir).glob("*"), key=lambda p: p.stat().st_mtime)
                for r in parse_eventlog(logs[-1]) if logs else []:
                    if r["run_s"] >= 1.0:
                        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
