"""ANN at production embedding widths (round-5 verdict item 3): all
prior ANN evidence is dim 64; the in-kernel matmul's bytes/flops scale
with dim. Drive LSH + IVF at n x dim-768 (default 100k x 768),
recording vec/s and recall@10 against brute force on a sampled query
subset, to confirm no per-batch memory cliff in _partial_topk /
coarse-grouping.

Usage: python scripts/bench_ann_dim.py [n] [dim]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sparksimjoin.ann import brute_force_topk, ivf_topk, lsh_topk  # noqa: E402
from sparksimjoin.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    k = 10
    spark = get_spark(cores=32, shuffle_partitions=32)
    spark.range(1_000_000).repartition(32).groupBy(F.col("id") % 7).count().count()

    # clustered corpus (the ANN regime), generated distributed:
    # 256 deterministic centers + per-vector noise, all from xxhash64
    n_centers = 256
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (
                # center component (hash of (center, d)) + noise
                (F.pmod(F.xxhash64(F.pmod(F.col("id"), F.lit(n_centers)), F.lit(d)),
                        F.lit(2_000_000)) / 1_000_000.0 - 1.0)
                + 0.15 * (F.pmod(F.xxhash64(F.col("id"), F.lit(d + 10_000)),
                                 F.lit(2_000_000)) / 1_000_000.0 - 1.0)
            ).alias(f"_{d}")
            for d in range(dim)
        ]).alias("embedding"),
    ).cache()
    df.count()

    import resource

    results = {}
    for name, fn in [
        ("lsh", lambda d: lsh_topk(d, "vec_id", "embedding", k=k,
                                   n_planes=10, n_tables=4)),
        ("ivf", lambda d: ivf_topk(d, "vec_id", "embedding", k=k,
                                   n_cells=64, n_probe=8, kmeans_iters=2)),
    ]:
        t0 = time.time()
        out = fn(df)
        cnt = out.count()
        dt = time.time() - t0
        results[name] = (dt, cnt)
        print(f"{name}: {dt:.1f}s, {cnt} result rows, "
              f"{n / dt:,.0f} vec/s, peak driver RSS "
              f"{resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6:.2f} GB",
            flush=True)

    # recall@10 vs brute force: exact top-k over the FULL corpus for a
    # 1k-query sample (brute_force_topk's `queries` parameter), the
    # approximate answers filtered to the same queries
    sample = df.where(F.col("vec_id") % (n // 1000) == 0).cache()
    sample.count()
    bf = brute_force_topk(df, "vec_id", "embedding", k=k, queries=sample)
    qs = {r["vec_id"] for r in sample.select("vec_id").collect()}
    approx_lsh = lsh_topk(df, "vec_id", "embedding", k=k,
                          n_planes=10, n_tables=4).where(
        F.col("query_id").isin(qs))
    approx_ivf = ivf_topk(df, "vec_id", "embedding", k=k,
                          n_cells=64, n_probe=8, kmeans_iters=2).where(
        F.col("query_id").isin(qs))

    def sets(d):
        out = {}
        for r in d.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out
    ex = sets(bf)
    for nm, ap in [("lsh", approx_lsh), ("ivf", approx_ivf)]:
        a = sets(ap)
        hits = sum(len(v & a.get(q, set())) for q, v in ex.items())
        tot = sum(len(v) for v in ex.values())
        print(f"recall@{k} {nm}: {hits / tot:.3f}")


if __name__ == "__main__":
    main()
