"""Host-ceiling control for the executor-faithful campaign: the SAME
1-JVM-vs-4-JVM protocol as multi_jvm_scaling.py but the per-worker job
is a bare parquet scan + row count — ZERO engine code. If the
decode-only job shows the same sub-linear 4-JVM ratio as the full
engine, the ceiling is the host (shared tmpfs/memory bandwidth across
concurrently-provisioned JVMs), not engine serialization.

Usage: python tools/decode_scaling_probe.py [reps]
(reuses /dev/shm/scaling_pages.parquet + shards from multi_jvm_scaling)
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
N_SHARDS = 4

SNIP = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from anomalydetector_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("decode_probe", cores=2)
df = spark.read.parquet({path!r})
def run():
    t0 = time.perf_counter()
    # touch every column so the scan decodes the full row, like the
    # engine's first pass would
    df.select(F.sum(F.length("text")), F.sum(F.length("url")),
              F.count("warc_ts"), F.count("lang")).collect()
    return time.perf_counter() - t0
run()  # warm
ready, go = {ready!r}, {go!r}
if ready:
    open(ready, "w").close()
    while not os.path.exists(go):
        time.sleep(0.1)
print("RESULT " + json.dumps({{"sec": round(run(), 2)}}))
"""


def spawn(path: str, ready: str = "", go: str = "") -> subprocess.Popen:
    code = SNIP.format(repo=REPO, path=path, ready=ready, go=go)
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    single, multi = [], []
    for i in range(reps):
        t = result_of(spawn(PAGES))
        single.append(t)
        print(f"rep {i} 1-JVM decode full: {t}s", flush=True)
        go = f"{SHARDS}/dgo-{i}"
        readies = [f"{SHARDS}/dready-{i}-{s}" for s in range(N_SHARDS)]
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
        print(f"rep {i} 4-JVM decode shards: {times} → wall {max(times)}s",
              flush=True)
    t1, t4 = min(single), min(multi)
    print(f"decode-only speedup {t1 / t4:.2f}x, "
          f"efficiency {t1 / t4 / N_SHARDS:.2f}")


if __name__ == "__main__":
    main()
