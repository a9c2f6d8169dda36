"""Executor-faithful scaling evidence: N vs 4N SEPARATE JVMs.

``scaling_bench.py`` scales threads inside ONE JVM (local[N] vs
local[4N]) — that measures scale-UP, where 4N threads share one heap, one
GC, one allocator, one parquet-decode path. A real cluster scales OUT:
each executor is its own JVM with private lanes. Measured here:

* config N:  1 worker JVM (local[2]) processes the full input,
* config 4N: 4 worker JVMs (local[2] each) process disjoint quarter-
  shards of the same files CONCURRENTLY; wall = slowest shard.

Each worker runs the full validation engine on its shard — the map-dominant
work an executor would own. The cross-shard merge this omits is the
windows × partitions × stats rollup (a few KB per shard), which the
checkpoint-manifest/verdict layer merges in O(tiny); at 10^12 docs the
shard work is >99.9% of the job, so per-shard wall is the honest proxy.

Usage: python tools/multi_jvm_scaling.py [reps]
(expects the pages table at /dev/shm/scaling_pages.parquet — run
scaling_bench.py first or SPARK_GRAFT_SKIP_PREP=1 reuse)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = "/dev/shm/scaling_pages.parquet"
SHARDS = "/dev/shm/scaling_shards"
N_SHARDS = 4
CORES_PER_WORKER = 2

SNIP = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from anomalydetector_spark.session import get_spark
from anomalydetector_spark import datagen
from anomalydetector_spark.engine import ValidationConfig, run_validation
spark = get_spark("mjs", cores={cores})
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
# barrier: announce readiness, wait for the coordinator's GO — so every
# worker's TIMED run executes while all workers are in the same phase
# (otherwise one worker's warmup overlaps another's measurement)
ready, go = {ready!r}, {go!r}
if ready:
    open(ready, "w").close()
    while not os.path.exists(go):
        time.sleep(0.1)
print("RESULT " + json.dumps({{"sec": round(run(), 2)}}))
"""


def make_shards() -> None:
    files = sorted(glob.glob(f"{PAGES}/part-*.parquet"))
    if not files:
        raise SystemExit(f"no pages table at {PAGES}")
    for i in range(N_SHARDS):
        d = f"{SHARDS}/{i}"
        os.makedirs(d, exist_ok=True)
        for old in glob.glob(f"{d}/*.parquet"):
            os.remove(old)
        for f in files[i::N_SHARDS]:
            os.link(f, f"{d}/{os.path.basename(f)}")


def spawn(path: str, ready: str = "", go: str = "") -> subprocess.Popen:
    return subprocess.Popen(
        [
            sys.executable,
            "-c",
            SNIP.format(
                repo=REPO, cores=CORES_PER_WORKER, path=path, ready=ready, go=go
            ),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def result_of(proc: subprocess.Popen) -> float:
    out, _ = proc.communicate(timeout=3600)
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["sec"]
    raise RuntimeError("worker produced no RESULT")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if len(sys.argv) > 2:
        rows = int(sys.argv[2])
    else:
        # count from the parquet footers — trusting a default here once
        # mislabeled a 64M-row campaign's docs/sec as 16M
        import pyarrow.parquet as pq

        rows = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(f"{PAGES}/part-*.parquet")
        )
    make_shards()

    single, multi = [], []
    for i in range(reps):
        # N: one worker JVM, full input
        t = result_of(spawn(PAGES))
        single.append(t)
        print(f"rep {i} 1-JVM full input: {t}s", flush=True)
        # 4N: four concurrent worker JVMs, quarter shards; a file barrier
        # aligns the timed runs (all workers warm, then measure together)
        go = f"{SHARDS}/go-{i}"
        readies = [f"{SHARDS}/ready-{i}-{s}" for s in range(N_SHARDS)]
        for p in readies + [go]:
            if os.path.exists(p):
                os.remove(p)
        procs = [
            spawn(f"{SHARDS}/{s}", ready=readies[s], go=go)
            for s in range(N_SHARDS)
        ]
        while not all(os.path.exists(r) for r in readies):
            time.sleep(0.2)
        open(go, "w").close()
        times = [result_of(p) for p in procs]
        multi.append(max(times))
        print(f"rep {i} 4-JVM shards: {times} → wall {max(times)}s", flush=True)

    t1, t4 = min(single), min(multi)
    speedup = t1 / t4
    eff = speedup / N_SHARDS
    print(f"speedup {speedup:.2f}x, efficiency {eff:.2f}")

    section = f"""
## Executor-faithful variant: N vs 4N separate JVMs

`local[N]` vs `local[4N]` inside one JVM measures scale-UP (shared heap,
GC, allocator, decode lanes) and tops out near 0.65 on this host even
though pure-CPU work scales at ~0.95+ (measured microbenchmarks). A real
cluster scales OUT — so this variant runs {N_SHARDS} CONCURRENT worker
JVMs (local[{CORES_PER_WORKER}] each) over disjoint quarter-shards
against 1 identical worker JVM over the full input; each worker executes
the complete validation engine on its shard (the map-dominant work an
executor owns; the omitted cross-shard rollup is KBs per shard).

| config | wall sec (best of {reps}) | docs/sec ({rows/1e6:.0f}M rows) |
|---|---|---|
| 1 worker JVM (N) | {t1:.1f} | {rows / t1:,.0f} |
| {N_SHARDS} worker JVMs (4N) | {t4:.1f} | {rows / t4:,.0f} |

**speedup {speedup:.2f}× → scaling efficiency {eff:.2f}** (target ≥ 0.8)

All runs (sec): single={json.dumps(single)} multi-wall={json.dumps(multi)}

Reproduce: `python tools/multi_jvm_scaling.py {reps}`
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(section)
    print("appended to BENCH.md")


if __name__ == "__main__":
    main()
