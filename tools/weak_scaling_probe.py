"""Weak-scaling (throughput) variant of the executor-faithful campaign:
4 CONCURRENT worker JVMs each run the FULL validation engine over the
FULL table — 4× the executors process 4× the data. This is the shape a
10^12-doc cluster job actually has (data grows with the cluster; the
per-executor share stays far past the fixed-overhead amortization
knee), so throughput efficiency here = t1 / t4_wall directly:
aggregate rows/sec at 4N divided by 4× the rows/sec at N.

The strong-scaling variant (multi_jvm_scaling.py, quarter shards)
divides a FIXED input by 4, which at this fixture size pushes each
worker's wall down to where the engine's fixed per-run stage overhead
(Python worker pools, stage scheduling, codegen) is a material
fraction — that knee is documented in BENCH.md; this probe removes the
shard-size confound while keeping the interference measurement
(4 JVMs genuinely compete for the host).

Usage: python tools/weak_scaling_probe.py [multi_reps] [single_reps]
(reuses /dev/shm/scaling_pages.parquet)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = "/dev/shm/scaling_pages.parquet"
SHARDS = "/dev/shm/scaling_shards"
N_WORKERS = 4

SNIP = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from anomalydetector_spark.session import get_spark
from anomalydetector_spark import datagen
from anomalydetector_spark.engine import ValidationConfig, run_validation
spark = get_spark("weak_probe", cores=2)
pages = spark.read.parquet({path!r})
domains = datagen.domains_dim(spark)
def run():
    t0 = time.perf_counter()
    res = run_validation(pages, domains, ValidationConfig())
    res.verdicts.collect()
    res.violations.write.format("noop").mode("overwrite").save()
    res.drift_verdicts.collect()
    dt = time.perf_counter() - t0
    res.unpersist()
    return dt
run()  # steady-state warmup
ready, go = {ready!r}, {go!r}
if ready:
    open(ready, "w").close()
    while not os.path.exists(go):
        time.sleep(0.1)
print("RESULT " + json.dumps({{"sec": round(run(), 2)}}))
"""


def spawn(ready: str = "", go: str = "") -> subprocess.Popen:
    code = SNIP.format(repo=REPO, path=PAGES, ready=ready, go=go)
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def result_of(p: subprocess.Popen) -> float:
    out, _ = p.communicate()
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["sec"]
    raise RuntimeError(f"no RESULT line in: {out[-500:]}")


def main() -> None:
    multi_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    single_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    os.makedirs(SHARDS, exist_ok=True)
    single, multi = [], []
    for i in range(single_reps):
        t = result_of(spawn())
        single.append(t)
        print(f"single rep {i}: {t}s", flush=True)
    for i in range(multi_reps):
        go = f"{SHARDS}/wgo-{i}"
        readies = [f"{SHARDS}/wready-{i}-{s}" for s in range(N_WORKERS)]
        for p in readies + [go]:
            if os.path.exists(p):
                os.remove(p)
        procs = [spawn(ready=readies[s], go=go) for s in range(N_WORKERS)]
        while not all(os.path.exists(r) for r in readies):
            time.sleep(0.2)
        open(go, "w").close()
        times = [result_of(p) for p in procs]
        multi.append(max(times))
        print(f"weak rep {i} 4-JVM full-table: {times} → wall {max(times)}s",
              flush=True)
    if single:
        t1 = min(single)
        t4 = min(multi)
        print(f"weak-scaling throughput efficiency t1/t4 = {t1 / t4:.2f} "
              f"(t1={t1}s, t4={t4}s)")
    else:
        print(f"multi walls: {multi}")


if __name__ == "__main__":
    main()
