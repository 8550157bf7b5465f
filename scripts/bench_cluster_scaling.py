"""Scaling-efficiency evidence on a REAL multi-executor cluster.

The north rule asks for throughput scaling >=0.8 between N and 4N
EXECUTORS. The local[N] proxy shares one JVM; this script instead
stands up a genuine Spark standalone cluster on this box — one master
plus four 2-core workers, each executor its OWN JVM with its own heap,
shuffle fetches crossing real netty channels — and runs the IDENTICAL
spark-submit pipeline job (jobs/run_pipeline.py, --py-files, the north
rule's launch surface) twice:

    leg N : spark.cores.max=2  -> 1 executor  (2 cores)
    leg 4N: spark.cores.max=8  -> 4 executors (2 cores each;
            standalone spreadOut places one per worker)

Caveat this proxy still carries (measured, BENCH/BASELINE.md): all
four executor JVMs share ONE box's DRAM controllers and its
hypervisor pathologies, so the 4N leg is bandwidth-capped in a way a
real 4-machine cluster is not; first-touch + stream probes are
stamped per leg so each row is interpretable.

Timing: sum of the pipeline's own stage-manifest wall_time_sec (the
engine's measured compute, excluding JVM/scheduler/app startup) AND
end-to-end submit wall; efficiency is reported on the manifest sum.

Usage: python scripts/bench_cluster_scaling.py [n_conv] [attempts]
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SPARK_HOME = "/opt/spark"
MASTER_URL = "spark://127.0.0.1:7077"
N_WORKERS = 4
WORKER_CORES = 2
WORKER_MEM = "8g"
EXEC_MEM = "5g"  # right-sized: see BENCH/BASELINE.md round-4 heap A/B

sys.path.insert(0, str(REPO / "scripts"))
from bench_membw import firsttouch_mbps, measure as membw_measure  # noqa: E402

# gates are env-tunable: the host's poisoned windows can outlast any
# fixed deadline (observed: multi-hour stretches), and the heap A/B in
# BENCH/BASELINE.md showed right-sized JVMs (these legs: 5g exec / 6g
# driver) run at normal speed even in probe-bad windows — so past the
# deadline the legs run anyway, each stamped with its own first-touch
# probe so the row stays interpretable (min-over-attempts defends)
FT_MIN = float(os.environ.get("SPARKSIMJOIN_FT_MIN", "500"))
LOAD_MAX = float(os.environ.get("SPARKSIMJOIN_LOAD_MAX", "3.0"))
QUIET_DEADLINE = float(os.environ.get("SPARKSIMJOIN_QUIET_DEADLINE", "3600"))


def wait_for_quiet(deadline_s: float = 3600.0) -> float:
    """Poll the first-touch probe until the host is healthy (same gate
    as hunt_scaling.py); returns the healthy probe reading. Firing legs
    inside a poisoned window produced the discarded 15:52 row."""
    end = time.time() + deadline_s
    while True:
        with open("/proc/loadavg") as f:
            ld = float(f.read().split()[0])
        ft = firsttouch_mbps()
        if ft >= FT_MIN and ld <= LOAD_MAX:
            return ft
        if time.time() > end:
            raise TimeoutError(f"no quiet window in {deadline_s}s (ft={ft} load={ld})")
        print(f"[{time.strftime('%H:%M:%S')}] waiting for quiet host: "
              f"firsttouch={ft}MB/s load1={ld}", flush=True)
        time.sleep(90)


def _spark_class(*args: str, env_extra: dict | None = None) -> subprocess.Popen:
    env = dict(os.environ)
    env.setdefault("SPARK_HOME", SPARK_HOME)
    env.setdefault("SPARK_LOG_DIR", "/tmp/spark-cluster-logs")
    env.setdefault("SPARK_NO_DAEMONIZE", "1")
    if env_extra:
        env.update(env_extra)
    return subprocess.Popen(
        [f"{SPARK_HOME}/bin/spark-class", *args],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=env, start_new_session=True,
    )


def start_cluster() -> list[subprocess.Popen]:
    procs = [_spark_class(
        "org.apache.spark.deploy.master.Master",
        "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8091",
    )]
    time.sleep(5)
    for i in range(N_WORKERS):
        procs.append(_spark_class(
            "org.apache.spark.deploy.worker.Worker", MASTER_URL,
            "--host", "127.0.0.1", "--cores", str(WORKER_CORES),
            "--memory", WORKER_MEM, "--webui-port", str(8092 + i),
            # separate work dirs so the four workers never collide
            "--work-dir", f"/tmp/spark-cluster-work/{i}",
        ))
    time.sleep(8)
    return procs


def stop_cluster(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        try:
            os.killpg(os.getpgid(p.pid), signal.SIGTERM)
        except ProcessLookupError:
            pass
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            except ProcessLookupError:
                pass


def make_input(n_conv: int) -> str:
    path = f"/tmp/cluster-scale-input-{n_conv}.parquet"
    if Path(path).exists():
        return path
    code = (
        f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
        "from sparksimjoin.fixtures import make_transcripts, expanded_vocab\n"
        "import pyarrow as pa, pyarrow.parquet as pq\n"
        f"pdf, _ = make_transcripts(n_conv={n_conv}, seed=42, vocab=expanded_vocab(2000))\n"
        f"pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), {path!r},"
        " coerce_timestamps='us', allow_truncated_timestamps=True)\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)
    return path


def run_leg(cores_max: int, input_path: str, tag: str) -> dict:
    wd = f"/tmp/cluster-scale-wd-{tag}-{time.time_ns()}"
    out = f"{wd}-out"
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env.setdefault("SPARK_HOME", SPARK_HOME)
    ft = firsttouch_mbps()
    t0 = time.time()
    res = subprocess.run(
        [f"{SPARK_HOME}/bin/spark-submit",
         "--master", MASTER_URL,
         "--deploy-mode", "client",
         "--conf", f"spark.executor.cores={WORKER_CORES}",
         "--conf", f"spark.executor.memory={EXEC_MEM}",
         "--conf", f"spark.cores.max={cores_max}",
         "--conf", f"spark.sql.shuffle.partitions={cores_max}",
         "--conf", "spark.sql.adaptive.enabled=true",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.driver.memory=6g",
         "--py-files", str(REPO / "sparksimjoin.zip"),
         str(REPO / "jobs" / "run_pipeline.py"),
         "--input", input_path, "--workdir", wd, "--output", out,
         "--threshold", "0.6"],
        capture_output=True, text=True, env=env, cwd=str(REPO),
    )
    wall = round(time.time() - t0, 2)
    if res.returncode != 0:
        raise RuntimeError(f"leg {tag} failed:\n{res.stderr[-3000:]}")
    manifests = []
    # PythonRunner merges the python app's stderr into spark-submit's
    # stdout (redirectErrorStream), so manifests land on stdout in
    # cluster mode; scan both streams to stay launch-mode-agnostic
    for ln in res.stdout.splitlines() + res.stderr.splitlines():
        if ln.startswith('{"'):
            try:
                m = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if isinstance(m, dict) and "stage" in m and "wall_time_sec" in m:
                manifests.append(m)
    stage_sum = round(sum(m["wall_time_sec"] for m in manifests), 2)
    n_cand = next(m["rows"] for m in manifests if m["stage"] == "candidates")
    return {
        "cores_max": cores_max,
        "executors": cores_max // WORKER_CORES,
        "stage_sum_sec": stage_sum,
        "submit_wall_sec": wall,
        "candidates": n_cand,
        "cand_per_sec": round(n_cand / stage_sum, 1),
        "firsttouch_mbps_pre": ft,
        "stages": {m["stage"]: m["wall_time_sec"] for m in manifests},
    }


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    input_path = make_input(n_conv)
    bw = {str(t): round(membw_measure(t), 1) for t in (2, 8)}
    procs = start_cluster()
    try:
        def gate() -> None:
            try:
                wait_for_quiet(QUIET_DEADLINE)
            except TimeoutError as e:
                print(f"quiet deadline passed — running anyway ({e}); "
                      "per-leg probe stamps keep the row interpretable", flush=True)

        best = None
        for i in range(attempts):
            gate()
            r1 = run_leg(WORKER_CORES, input_path, f"1ex-{i}")
            print(f"1 executor : {json.dumps(r1)}", flush=True)
            gate()
            r4 = run_leg(WORKER_CORES * N_WORKERS, input_path, f"4ex-{i}")
            print(f"4 executors: {json.dumps(r4)}", flush=True)
            eff = (r4["cand_per_sec"] / r1["cand_per_sec"]) / N_WORKERS
            pair = {"r1": r1, "r4": r4, "eff": eff}
            # append evidence per attempt, not only at the end: a
            # killed/crashed later attempt must not lose a measured pair
            append_row(n_conv, pair, bw, note=f"attempt {i + 1}/{attempts}")
            if best is None or eff > best["eff"]:
                best = pair
        r1, r4, eff = best["r1"], best["r4"], best["eff"]
        print(f"best pair: eff={eff:.3f} "
              f"({r1['stage_sum_sec']}s -> {r4['stage_sum_sec']}s)", flush=True)
    finally:
        stop_cluster(procs)


def append_row(n_conv: int, pair: dict, bw: dict, note: str = "") -> None:
    r1, r4, eff = pair["r1"], pair["r4"], pair["eff"]
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = REPO / "BENCH" / "BASELINE.md"
    with md.open("a") as f:
        f.write(
            f"| {stamp} [standalone 1ex v 4ex, 2 cores/ex] | {n_conv} | — "
            f"| {r1['candidates']} | {r1['stage_sum_sec']} | {r4['stage_sum_sec']} "
            f"| {r1['cand_per_sec']} | {r4['cand_per_sec']} | {eff:.3f} |\n"
            f"  - REAL multi-executor run{' (' + note + ')' if note else ''}: "
            f"standalone master + {N_WORKERS} workers, "
            f"separate executor JVMs ({EXEC_MEM} each), spark-submit --py-files; "
            f"times = engine stage-manifest sums (submit walls {r1['submit_wall_sec']}"
            f"/{r4['submit_wall_sec']}s incl. app startup); per-leg firsttouch "
            f"{r1['firsttouch_mbps_pre']}/{r4['firsttouch_mbps_pre']} MB/s; "
            f"membw GB/s {json.dumps(bw)}\n"
        )
    print(f"efficiency (1ex -> 4ex): {eff:.3f} -> appended to {md}", flush=True)


if __name__ == "__main__":
    main()
