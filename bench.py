"""Benchmark harness (driver-run per round; also usable locally).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf", plus pipeline throughput extras}.

The record-linkage pipeline bench generates deterministic synthetic
transcripts (fixtures.make_transcripts — no external data) and runs
blocking + scoring + clustering end-to-end; its throughput is
reported as candidate pairs/sec (the driver metric the PPJoin
literature says dominates cost — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from sparksimjoin.fixtures import make_transcripts  # noqa: E402
from sparksimjoin.pipeline import PipelineConfig, run_pipeline  # noqa: E402
from sparksimjoin.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "jaccard_doc",
    "cosine_doc",
    "edit_part",
    "jaccard_qgram_part",
    "overlap_doc",
    "minhash_dedup_doc",
    "ann_topk",
    "cc_clusters_doc",
    "text_stats_doc",
]

N_CONV_BENCH = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "6000"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark(app_name="sparksimjoin-bench", cores=cores,
                      shuffle_partitions=cores)

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    # pipeline bench on synthetic transcripts
    t0 = time.time()
    tpdf, _ = make_transcripts(n_conv=N_CONV_BENCH, seed=42)
    gen_sec = time.time() - t0
    tdf = spark.createDataFrame(tpdf).repartition(cores).cache()
    n_turns = tdf.count()
    with tempfile.TemporaryDirectory() as wd:
        t0 = time.time()
        clusters = run_pipeline(spark, tdf, wd, PipelineConfig(threshold=0.6))
        n_clusters = clusters.count()
        pipe_sec = round(time.time() - t0, 3)
        from sparksimjoin.checkpoint import CheckpointManager

        n_cand = CheckpointManager(spark, wd).manifest("candidates")["rows"]
    timings["pipeline_transcripts"] = pipe_sec
    print(
        f"# pipeline: {n_turns} turns, {n_cand} candidates, "
        f"{n_clusters} cluster rows in {pipe_sec}s (gen {gen_sec:.1f}s)",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pipeline_turns": n_turns,
        "pipeline_candidate_pairs": int(n_cand),
        "candidate_pairs_per_sec": round(n_cand / pipe_sec, 1) if pipe_sec else None,
        "cores": cores,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
