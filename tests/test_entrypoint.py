"""jobs/run_pipeline.py argument surface, run in-process (the real
spark-submit drive is scripts/drive_cluster_resume.py + the verify
recipe; this covers the arg wiring cheaply in CI)."""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from sparksimjoin.fixtures import make_transcripts


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "run_pipeline_job",
        Path(__file__).resolve().parent.parent / "jobs" / "run_pipeline.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_eval_gold_flag_prints_metrics(spark, tmp_path, capsys):
    pdf, ents = make_transcripts(n_conv=120, seed=42)
    inp = str(tmp_path / "transcripts.parquet")
    gold = str(tmp_path / "entities.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), inp,
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    ents.to_parquet(gold)

    _load_entry().main([
        "--input", inp, "--workdir", str(tmp_path / "ckpt"),
        "--output", str(tmp_path / "clusters"), "--threshold", "0.6",
        "--eval-gold", gold,
    ])
    out = capsys.readouterr().out
    metrics = [json.loads(ln) for ln in out.splitlines() if "linkage_eval" in ln]
    assert len(metrics) == 1
    ev = metrics[0]["linkage_eval"]
    assert ev["n_ids"] == 120
    assert ev["f1"] == 1.0 and ev["precision"] == 1.0 and ev["recall"] == 1.0
    assert (tmp_path / "clusters").exists()
