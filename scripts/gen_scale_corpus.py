"""Generate the deterministic scale-proof corpora used by the round-5
BENCH/BASELINE.md rows (80k / 250k conversations, seed 42, vocab =
max(2000, n_conv // 12) — constant lexical density, the same family
as the 24k/2000 bench point). Writing once and pointing
SPARK_GRAFT_SCALE_INPUT at the parquet gives every scaling leg
byte-identical input and keeps generation cost out of the timing:

    python scripts/gen_scale_corpus.py 80000 250000
    SPARK_GRAFT_SCALE_INPUT=/tmp/scale10/transcripts_250000.parquet \
        python scripts/bench_scaling.py 250000 2 8

Timestamps are coerced to microseconds — Spark's parquet reader
rejects pyarrow's default TIMESTAMP(NANOS) (PARQUET_TYPE_ILLEGAL).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sparksimjoin.fixtures import expanded_vocab, make_transcripts  # noqa: E402

OUT = Path("/tmp/scale10")


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [80_000, 250_000]
    OUT.mkdir(parents=True, exist_ok=True)
    for n in sizes:
        t0 = time.time()
        pdf, ents = make_transcripts(
            n_conv=n, seed=42, vocab=expanded_vocab(max(2000, n // 12))
        )
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            OUT / f"transcripts_{n}.parquet",
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        ents.to_parquet(OUT / f"entities_{n}.parquet")
        print(
            f"{n} convs: {len(pdf)} turns -> {OUT}/transcripts_{n}.parquet "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
