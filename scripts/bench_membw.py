"""Memory-bandwidth probe: threaded numpy STREAM-style 'add' kernel
(a[:] = b + c, 2 reads + 1 write, arrays far above L3) at several
thread counts. numpy releases the GIL on large array ops, so N python
threads stream N arrays concurrently — the aggregate GB/s measures
the box's effective DRAM bandwidth ceiling at that concurrency.

Purpose (round-3 verdict, 'What's wrong #1'): the scaling-efficiency
gate is proxied on one box. 32 worker threads in ONE JVM share ONE
memory controller, so a memory-bound stage cannot speed up 4x from
8->32 threads no matter how well the engine parallelizes — a penalty
a real 4x-EXECUTOR cluster does not have (4x machines = 4x DRAM).
This probe turns that claim from assertion into measurement: if the
probe's own 8->32 scaling matches the pipeline's 8->32 scaling, the
sub-linear pipeline ratio is the box's ceiling, not the engine's.

Usage: python scripts/bench_membw.py [threads ...]   (default 2 4 8 16 32)
Prints one JSON line: {"kernel": "stream_add", "mib_per_thread": ...,
"gbps": {"2": ..., "8": ...}, ...}
"""

from __future__ import annotations

import json
import sys
import threading
import time

import numpy as np

MIB = 1 << 20
ARRAY_MIB = 64  # per array, per thread: 3 x 64 MiB >> any L3
DURATION_S = 2.0


def _worker(stop: threading.Event, barrier: threading.Barrier, counts: list,
            idx: int, n: int) -> None:
    a = np.zeros(n)
    b = np.random.default_rng(idx).random(n)
    c = np.random.default_rng(idx + 1000).random(n)
    np.add(b, c, out=a)  # warm-up / page-fault the arrays
    barrier.wait()
    iters = 0
    while not stop.is_set():
        np.add(b, c, out=a)
        iters += 1
    counts[idx] = iters


def measure(threads: int, duration_s: float = DURATION_S,
            array_mib: int = ARRAY_MIB) -> float:
    """Aggregate streamed GB/s across ``threads`` concurrent add
    kernels (3 x array_mib MiB traffic per iteration per thread)."""
    n = array_mib * MIB // 8
    stop = threading.Event()
    barrier = threading.Barrier(threads + 1)
    counts = [0] * threads
    ts = [
        threading.Thread(target=_worker, args=(stop, barrier, counts, i, n))
        for i in range(threads)
    ]
    for t in ts:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    time.sleep(duration_s)
    stop.set()
    for t in ts:
        t.join()
    elapsed = time.perf_counter() - t0
    total_bytes = sum(counts) * 3 * n * 8
    return total_bytes / elapsed / 1e9


def probe(thread_counts: list[int]) -> dict:
    out = {
        "kernel": "stream_add",
        "array_mib_per_thread": ARRAY_MIB,
        "duration_s": DURATION_S,
        "gbps": {},
    }
    for tc in thread_counts:
        out["gbps"][str(tc)] = round(measure(tc), 1)
    g = out["gbps"]
    if "8" in g and "32" in g:
        out["scaling_8_to_32"] = round(g["32"] / g["8"], 3)
        out["efficiency_8_to_32"] = round(g["32"] / g["8"] / 4, 3)
    return out


if __name__ == "__main__":
    tcs = [int(x) for x in sys.argv[1:]] or [2, 4, 8, 16, 32]
    print(json.dumps(probe(tcs)))


def firsttouch_mbps(mib: int = 128) -> float:
    """MB/s of a first-touch fill over freshly mapped pages. On a
    host that is oversubscribing memory (demand-faulting guest pages
    to disk) this collapses ~1000x — from GB/s to single-digit MB/s —
    while the warm-page stream probe above can still look normal.
    The decisive discriminator for the round-4 'poisoned verify'
    investigation (BENCH/BASELINE.md)."""
    import numpy as np

    a = np.empty(mib * MIB // 8, dtype=np.float64)
    t0 = time.perf_counter()
    a.fill(1.0)
    return round(mib / (time.perf_counter() - t0), 1)
