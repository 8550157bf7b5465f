"""Quiet-host re-anchor of individual bench queries (round-4 verdict
item 8): the BENCH_r04 rows for ``jaccard_doc_t95`` and
``minhash_doc_t9`` were taken inside probe-stamped degraded host
windows (per-query first-touch 99-386 MB/s vs ~3 GB/s healthy), so
round-5's comparison baseline needs one fresh-JVM quiet-window run of
each, recorded next to the r4 numbers.

Usage: python scripts/bench_anchor.py [query ...]   (default: the two
probe-degraded r4 rows). Each query runs in a fresh subprocess/JVM via
bench._run_query_isolated — identical methodology to bench.py — and is
retried until the pre-query first-touch probe reads healthy
(>= 1000 MB/s) or attempts run out.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import _firsttouch_mbps, _run_query_isolated  # noqa: E402

DEFAULT = ["jaccard_doc_t95", "minhash_doc_t9"]


def main():
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    attempts = int(os.environ.get("SPARK_GRAFT_ANCHOR_ATTEMPTS", "3"))
    results = {}
    for name in names:
        best = None
        for i in range(attempts):
            ft = _firsttouch_mbps()
            n, cold, warm, startup = _run_query_isolated(
                name, sf_dir, cores, force_warm=ft < 500.0
            )
            r = {"rows": n, "cold_sec": cold, "warm_sec": warm,
                 "startup_sec": startup, "firsttouch_mbps_pre": ft}
            print(f"  attempt {i + 1} {name}: cold {cold}s warm {warm}s "
                  f"(firsttouch {ft} MB/s)", flush=True)
            if best is None or (cold < best["cold_sec"]):
                best = r
            if ft >= 1000.0:
                break
            time.sleep(10)
        results[name] = best
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    print(json.dumps({"stamp": stamp, "sf_dir": sf_dir, "cores": cores,
                      "anchors": results}))


if __name__ == "__main__":
    main()
