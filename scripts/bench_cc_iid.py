"""A/B the clusters stage's id width: iid-space (8-byte long) vs
string-space (conv_id) connected components over the SAME scored
edge set, same host window.

Method: run the full pipeline once. Then, per arm, clone the workdir
with everything up to `scored` complete, delete clusters + cc_round*,
and re-run — only the clusters stage executes, so the rerun wall IS
the stage time. Arm B additionally rewrites the cloned scored
checkpoint WITHOUT the surrogate columns (the pre-iid layout the
stage still supports for resume compat) to force string CC. Arms are
interleaved A,B,A,B and the min per arm reported (this box's DRAM
ceiling drifts between windows; BENCH/BASELINE.md round-4 notes).

Usage: python scripts/bench_cc_iid.py [n_conv] [cores]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sparksimjoin.checkpoint import CheckpointManager  # noqa: E402
from sparksimjoin.fixtures import expanded_vocab, make_transcripts  # noqa: E402
from sparksimjoin.pipeline import PipelineConfig, run_pipeline  # noqa: E402
from sparksimjoin.session import get_spark  # noqa: E402


def stage_bytes(root: str, prefix: str) -> int:
    return sum(
        f.stat().st_size
        for p in Path(root).glob(f"{prefix}*")
        for f in p.rglob("*")
        if f.is_file()
    )


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(app_name="cc-iid-ab", cores=cores, shuffle_partitions=cores)
    tpdf, _ = make_transcripts(n_conv=n_conv, seed=42, vocab=expanded_vocab(2000))
    tdf = spark.createDataFrame(tpdf).repartition(cores).cache()
    tdf.count()
    # durable CC rounds back on: this script MEASURES their bytes
    cfg = PipelineConfig(threshold=0.6, cc_round_artifacts=True)

    base = tempfile.mkdtemp(prefix="cc_ab_base_")
    t0 = time.time()
    run_pipeline(spark, tdf, base, cfg)
    total = round(time.time() - t0, 2)
    n_edges = CheckpointManager(spark, base).manifest("scored")["rows"]

    def clone(strip_iids: bool) -> str:
        wd = tempfile.mkdtemp(prefix="cc_ab_arm_")
        shutil.rmtree(wd)
        shutil.copytree(base, wd)
        for p in Path(wd).glob("cc_round*"):
            shutil.rmtree(p)
        shutil.rmtree(wd + "/clusters")
        if strip_iids:
            ck = CheckpointManager(spark, wd)
            scored = ck.read("scored").select("l_id", "r_id", "_sim_score")
            tmp_out = wd + "/__scored_rewrite"
            scored.write.mode("overwrite").parquet(tmp_out)
            shutil.rmtree(wd + "/scored")
            shutil.move(tmp_out, wd + "/scored")
        return wd

    results: dict[str, list[float]] = {"iid": [], "string": []}
    rows_by_arm: dict[str, list] = {}
    ckpt_bytes: dict[str, int] = {}
    for _ in range(2):
        for arm, strip in (("iid", False), ("string", True)):
            wd = clone(strip)
            t1 = time.time()
            out = run_pipeline(spark, tdf, wd, cfg)
            rows = sorted((r["conv_id"], r["component"]) for r in out.collect())
            results[arm].append(round(time.time() - t1, 2))
            rows_by_arm[arm] = rows
            ckpt_bytes[arm] = stage_bytes(wd, "cc_round")
            shutil.rmtree(wd)

    assert rows_by_arm["iid"] == rows_by_arm["string"], "arms diverged"
    iid_s, str_s = min(results["iid"]), min(results["string"])
    print(json.dumps({
        "n_conv": n_conv, "cores": cores, "scored_edges": n_edges,
        "pipeline_total_sec": total,
        "cc_stage_iid_sec": iid_s, "cc_stage_string_sec": str_s,
        "cc_stage_attempts": results,
        "cc_speedup": round(str_s / iid_s, 2) if iid_s else None,
        "cc_round_ckpt_bytes_iid": ckpt_bytes["iid"],
        "cc_round_ckpt_bytes_string": ckpt_bytes["string"],
        "outputs_identical": True,
    }))
    shutil.rmtree(base)


if __name__ == "__main__":
    main()
