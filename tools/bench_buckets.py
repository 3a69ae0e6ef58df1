"""Micro-bench for the r5 dedup verify-lane re-plan (VERDICT r4 item 1):
at ≥100k occupied LSH buckets the verify stage must schedule P Ray group
callbacks (the hash-partition count), never one per bucket.

Generates synthetic embeddings sized to occupy >100k (table, bucket)
LSH keys, runs ``embedding_lsh_pairs_ds``, and reports the occupied
bucket count, the partition count (= the exact upper bound on verify
callbacks — ``groupby('__p')`` over P distinct codes cannot create more
groups), and wall time.  Owns its Ray session (scripts may).

Usage: python tools/bench_buckets.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kgforge.functions.dedup import embedding_lsh_pairs_ds

    rng = np.random.RandomState(11)
    dim, planes = 64, 16           # 4 tables × 2^16 keys → sparse buckets
    mat = rng.standard_normal((n, dim))
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array(mat.tolist(),
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl).repartition(32).materialize()

    # occupied-bucket census (the OLD plan's Ray-callback count)
    planes_mat = np.random.RandomState(42).standard_normal(
        (4, dim, planes))
    occupied = set()
    for t in range(4):
        key = ((mat @ planes_mat[t]) > 0).astype(np.uint64)
        key = (key << np.arange(planes, dtype=np.uint64)).sum(axis=1)
        occupied.update((int(t) << 60 | int(k)) for k in key)

    t0 = time.time()
    pairs = embedding_lsh_pairs_ds(ds, tau=0.99, n_tables=4,
                                   planes_per_table=planes, dim=dim)
    n_pairs = pairs.count()
    sec = round(time.time() - t0, 2)
    print(json.dumps({
        "metric": "lsh_verify_callbacks",
        "n_vectors": n,
        "occupied_buckets": len(occupied),
        "verify_partitions": 64,
        "old_plan_callbacks": len(occupied),
        "new_plan_callbacks_max": 64,
        "n_pairs": n_pairs,
        "wall_sec": sec}))
    ray.shutdown()


if __name__ == "__main__":
    main()
