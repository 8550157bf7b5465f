"""spark-submit entrypoint (north_rule: ``spark-submit --py-files
sparksimjoin.zip jobs/run_pipeline.py``).

Reads a transcripts table (parquet/CSV/TSV/JSON-lines path by suffix,
or an Iceberg table name; sparksimjoin/io.py coerces all of them to
the canonical transcript schema with an explicit schema — never
inferSchema's extra data pass), runs the blocking -> scoring ->
clustering pipeline with checkpoints under --workdir, writes clusters
to --output (parquet/csv/json), and prints the stage manifests
(per-partition lineage + counters).

Packaging:
  cd /root/repo && zip -r sparksimjoin.zip sparksimjoin
  spark-submit --py-files sparksimjoin.zip jobs/run_pipeline.py \
      --input /path/transcripts.parquet --workdir /path/ckpt \
      --output /path/clusters --threshold 0.7

Incremental batches (--base): link ONLY the new batch against the
completed run at --base, checkpointing under --workdir (which then
serves as the next batch's --base):
  spark-submit ... jobs/run_pipeline.py \
      --input /path/batch42.parquet --base /path/ckpt \
      --workdir /path/ckpt_b42 --output /path/clusters --threshold 0.7
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from sparksimjoin.checkpoint import CheckpointManager
from sparksimjoin.pipeline import PipelineConfig, run_pipeline
from sparksimjoin.tokenizers import QgramTokenizer, WhitespaceTokenizer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input", required=True,
        help="transcripts path (parquet/csv/tsv/json-lines by suffix) or iceberg table",
    )
    ap.add_argument(
        "--input-format", default=None,
        choices=["parquet", "csv", "json", "table"],
        help="override suffix-based format inference (sparksimjoin/io.py)",
    )
    ap.add_argument(
        "--output-format", default=None, choices=["parquet", "csv", "json"],
        help="clusters output format (default: inferred from --output suffix, parquet otherwise)",
    )
    ap.add_argument("--workdir", required=True, help="checkpoint root")
    ap.add_argument("--output", required=True, help="clusters output path")
    ap.add_argument(
        "--base", default=None,
        help="completed base run's checkpoint root: incremental mode — link "
        "--input as a NEW batch against it (sparksimjoin/incremental.py)",
    )
    ap.add_argument("--measure", default="JACCARD")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--tokenizer", default="whitespace", choices=["whitespace", "qgram2", "qgram3"])
    ap.add_argument("--salt-cap", type=int, default=10_000)
    ap.add_argument(
        "--estimate", action="store_true",
        help="pre-flight only: print the exact blocking-cost predictors "
        "(candidate meetings, prefix shuffle volume, hot-token count) for "
        "this input/measure/threshold as one JSON line and exit WITHOUT "
        "running the pipeline — size or re-threshold a 100 TB job before "
        "paying for it (sparksimjoin/estimate.py)",
    )
    ap.add_argument(
        "--audit", action="store_true",
        help="also checkpoint an `audit` stage: per-component size, "
        "intra-cluster edge support, density, and weakest/mean "
        "similarity (sparksimjoin/audit.py) — the bad-transitive-merge "
        "review queue; readable at <workdir>/audit. With --base the "
        "audit walks the chain's scored checkpoints for the complete "
        "edge set (cluster_audit_chain)",
    )
    ap.add_argument(
        "--refine-threshold", type=float, default=None,
        help="threshold-tightening cluster refinement (sparksimjoin/"
        "clustering.py::refine_clusters): re-cluster suspect clusters "
        "over their intra-cluster edges at this TIGHTER threshold, "
        "checkpointed as `clusters_refined` and written to --output in "
        "place of the base clusters. Requires at least one of "
        "--refine-max-size / --refine-min-density; not available with "
        "--base (an incremental head's scored checkpoint holds only the "
        "batch's edges — refine the full run instead)",
    )
    ap.add_argument("--refine-max-size", type=int, default=None,
                    help="clusters larger than this are suspect")
    ap.add_argument("--refine-min-density", type=float, default=None,
                    help="clusters with intra-edge density below this are suspect")
    ap.add_argument(
        "--time-window", type=float, default=None, metavar="SECONDS",
        help="temporal blocking: only pair conversations whose start "
        "timestamps (min ts) lie within this many seconds of each "
        "other — retries/double-submits cluster in time; far-apart "
        "near-identical text is usually boilerplate, not identity")
    ap.add_argument(
        "--eval-gold", default=None,
        help="optional gold cluster assignment (parquet with columns "
        "conv_id, entity_id): after clustering, print pairwise "
        "precision/recall/F1 of the run's clusters against it as one "
        "JSON line (sparksimjoin/evaluation.py — contingency-table "
        "identity, no pair materialization, so the check is linear in "
        "conversations even when clusters are huge)",
    )
    ap.add_argument(
        "--checkpoint-format", default="parquet", choices=["parquet", "iceberg"],
        help="iceberg needs --packages org.apache.iceberg:iceberg-spark-runtime-* "
        "and a spark.sql.catalog.<name>; --workdir is then a catalog namespace",
    )
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("sparksimjoin-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tok = {
        "whitespace": WhitespaceTokenizer(),
        "qgram2": QgramTokenizer(qval=2),
        "qgram3": QgramTokenizer(qval=3),
    }[args.tokenizer]
    if args.refine_threshold is not None and args.base:
        ap.error("--refine-threshold is not available with --base "
                 "(the incremental head's scored checkpoint holds only "
                 "the batch's edges)")
    cfg = PipelineConfig(
        measure=args.measure, threshold=args.threshold, tokenizer=tok,
        salt_cap=args.salt_cap, audit=args.audit,
        refine_threshold=args.refine_threshold,
        refine_max_size=args.refine_max_size,
        refine_min_density=args.refine_min_density,
        time_window_seconds=args.time_window,
    )
    from sparksimjoin.io import read_transcripts, write_output

    transcripts = read_transcripts(spark, args.input, fmt=args.input_format)
    if args.estimate:
        from sparksimjoin.estimate import estimate_join_cost
        from sparksimjoin.pipeline import prepare_records

        recs = prepare_records(transcripts)
        row = estimate_join_cost(
            recs, recs, "conv_id", "conv_id", "doc", "doc",
            cfg.tokenizer, cfg.measure, cfg.threshold,
            self_join=True, salt_cap=args.salt_cap,
        ).collect()[0]
        print(json.dumps(row.asDict()))
        return
    if args.base:
        from sparksimjoin.incremental import run_incremental

        clusters = run_incremental(spark, transcripts, args.base, args.workdir, cfg,
                                   checkpoint_format=args.checkpoint_format)
    else:
        clusters = run_pipeline(spark, transcripts, args.workdir, cfg,
                                checkpoint_format=args.checkpoint_format)
    write_output(clusters, args.output, fmt=args.output_format)
    for m in CheckpointManager(spark, args.workdir, fmt=args.checkpoint_format).all_manifests():
        print(json.dumps(m), file=sys.stderr)
    if args.eval_gold:
        from sparksimjoin.evaluation import clustering_pairwise_metrics

        gold = spark.read.parquet(args.eval_gold)
        row = clustering_pairwise_metrics(
            clusters, gold, id_col="conv_id",
            pred_cluster_col="component", gold_cluster_col="entity_id",
        ).collect()[0]
        print(json.dumps({"linkage_eval": row.asDict()}))
    print(f"clusters written to {args.output}")


if __name__ == "__main__":
    main()
