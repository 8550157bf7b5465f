"""Salting win as a measured number (round-3 verdict item 4): run the
adversarial-skew bench query (bench._q_overlap_coeff_zipf — full-token
blocking over a Zipf corpus with one token in ~50% of records) twice
in fresh JVMs: salted (AUTO_SALT_CAP default) vs effectively unsalted
(salt_cap=10**9: no token exceeds the cap, so the hot posting list
stays one join cell / one straggler task). Appends both to
BENCH/BASELINE.md.

Usage: python scripts/bench_skew.py [cores]
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
from sparksimjoin.session import get_spark
from bench import _q_overlap_coeff_zipf
spark = get_spark(app_name="skewbench", cores={cores}, shuffle_partitions={cores})
from pyspark.sql import functions as _F
spark.range(1_000_000).repartition({cores}).groupBy(_F.col("id") % 7).count().count()
t0 = time.time()
n = _q_overlap_coeff_zipf(spark, None, salt_cap={salt_cap}).count()
print("RESULT", n, round(time.time() - t0, 2))
"""


def run(cores: int, salt_cap) -> tuple[int, float]:
    code = CHILD.format(repo=str(REPO), cores=cores, salt_cap=salt_cap or "None")
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stderr[-2000:], file=sys.stderr)
        raise RuntimeError("skew bench failed")
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("RESULT")][-1]
    _, n, sec = line.split()
    return int(n), float(sec)


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_s, t_salted = run(cores, None)
    n_u, t_unsalted = run(cores, 10**9)
    assert n_s == n_u, (n_s, n_u)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    line = (
        f"- skew contrast ({stamp}, local[{cores}], fresh JVM each): "
        f"overlap_coeff_zipf_skew salted={t_salted}s vs "
        f"unsalted(salt_cap=1e9)={t_unsalted}s "
        f"({t_unsalted / t_salted:.2f}x), {n_s} pairs both\n"
    )
    with (REPO / "BENCH" / "BASELINE.md").open("a") as f:
        f.write(line)
    print(json.dumps({"pairs": n_s, "salted_sec": t_salted,
                      "unsalted_sec": t_unsalted,
                      "speedup": round(t_unsalted / t_salted, 2)}))


if __name__ == "__main__":
    main()
