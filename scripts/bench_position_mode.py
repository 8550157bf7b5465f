"""Position-bound mode A/B: run the transcripts candidate pipeline
with BOTH modes at two thresholds and append the numbers to
BENCH/BASELINE.md.

METHODOLOGY CAUTION (learned the hard way, see BENCH/BASELINE.md
round-4 retraction entry): this script times cand+verify composed
in-process, cells run minutes apart — on this shared host a
co-tenant burst hitting one cell and not another INVERTED the
verdict once (it picked aggregate; quiet-host full-pipeline A/B
shows occurrence wins every cell 1.3-3.8x). Trust only runs whose
cells were taken back-to-back in a quiet window (/proc/loadavg
< ~1 before AND after), and corroborate with the full pipeline via
PipelineConfig(position_mode=...) before changing any default.

Usage: python scripts/bench_position_mode.py [n_conv] [cores]
"""

from __future__ import annotations

import json
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from sparksimjoin.fixtures import make_transcripts, expanded_vocab
from sparksimjoin.session import get_spark
from sparksimjoin.pipeline import prepare_records
from sparksimjoin.joins.core import (
    build_token_ranks, order_tokens, prefix_explode, candidate_pairs,
    build_salt_map, resolve_salt_cap, verify_pairs,
)
from pyspark.sql import functions as F

spark = get_spark(app_name="posmode", cores={cores}, shuffle_partitions={cores})
spark.range(1_000_000).repartition({cores}).groupBy(F.col("id") % 7).count().count()
tpdf, _ = make_transcripts(n_conv={n_conv}, seed=42, vocab=expanded_vocab(2000))
tdf = spark.createDataFrame(tpdf).repartition({cores}).cache(); tdf.count()
records = prepare_records(tdf)
from sparksimjoin.tokenizers import WhitespaceTokenizer
tok = WhitespaceTokenizer().with_return_set(True)
tok_df = records.select(F.col("conv_id").alias("id"), F.length("doc").alias("strlen"),
                        tok.spark_expr(F.col("doc")).alias("toks")).where(F.col("doc").isNotNull())
ranks = build_token_ranks([tok_df]).cache(); ranks.count()
tokens = order_tokens(tok_df, ranks).cache(); tokens.count()
t = {threshold}
ex_l = prefix_explode(tokens, "l", "JACCARD", t)
ex_r = prefix_explode(tokens, "r", "JACCARD", t)
freq = tokens.select(F.explode("tokens").alias("token")).groupBy("token").agg(F.count("*").alias("cnt"))
salt_map = build_salt_map(freq, resolve_salt_cap(None), key_col="token").cache(); salt_map.count()
t0 = time.time()
cand = candidate_pairs(ex_l, ex_r, "JACCARD", t, self_join=True,
                       salt_map=salt_map, position_mode={mode!r}).cache()
n_cand = cand.count()
t_cand = time.time() - t0
t1 = time.time()
n_match = verify_pairs(cand, tokens, tokens, "JACCARD", t).count()
t_total = t_cand + (time.time() - t1)
print("RESULT", n_cand, n_match, round(t_cand, 2), round(t_total, 2))
"""


def run(n_conv: int, cores: int, threshold: float, mode: str):
    code = CHILD.format(repo=str(REPO), cores=cores, n_conv=n_conv,
                        threshold=threshold, mode=mode)
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"posmode bench failed ({threshold}, {mode})")
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("RESULT")][-1]
    _, n_cand, n_match, t_cand, t_total = line.split()
    return {"mode": mode, "threshold": threshold, "candidates": int(n_cand),
            "matches": int(n_match), "cand_sec": float(t_cand),
            "cand_plus_verify_sec": float(t_total)}


def main():
    sys.path.insert(0, str(REPO))
    from sparksimjoin.joins.core import resolve_position_mode

    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rows = []
    for t in (0.6, 0.8):
        for mode in ("occurrence", "aggregate"):
            r = run(n_conv, cores, t, mode)
            r["heuristic_pick"] = resolve_position_mode("JACCARD", t)
            rows.append(r)
            print(json.dumps(r), flush=True)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    with (REPO / "BENCH" / "BASELINE.md").open("a") as f:
        f.write(f"- position-mode crossover ({stamp}, {n_conv} convs, "
                f"local[{cores}], fresh JVM per cell, cand+verify sec):\n")
        for r in rows:
            pick = " <- heuristic" if r["heuristic_pick"] == r["mode"] else ""
            f.write(f"  - t={r['threshold']} {r['mode']}: "
                    f"{r['candidates']} cands, {r['cand_plus_verify_sec']}s{pick}\n")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
