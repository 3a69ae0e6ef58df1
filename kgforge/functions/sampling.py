"""Training-epoch shuffling and sampling strategies.

At 100 TB a full ``random_shuffle`` is an all-to-all exchange of the
entire corpus per epoch — usually the single most expensive operation
in a training-data pipeline.  The scale path trades exactness of the
permutation (irrelevant for SGD epoch ordering) for O(1) network:

- ``mode="full"``      — ``ds.random_shuffle(seed)``: true global
  permutation, all-to-all; right for small/medium data or when the
  downstream consumer requires it.
- ``mode="blocks+local"`` (scale default) — ``randomize_block_order``
  permutes BLOCK order (metadata-only, no data movement) and a
  per-block Fisher-Yates permutes within each block.  Every row moves
  exactly zero times over the network; the composition is a seeded,
  deterministic permutation of the dataset whose mixing radius is one
  block — the standard approximation used by large-scale training
  loaders (block ≈ shard shuffle + shard-internal shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def epoch_shuffle_ds(ds, seed: int, mode: str = "blocks+local",
                     id_col: str | None = None):
    if mode == "full":
        return ds.random_shuffle(seed=seed)
    if mode != "blocks+local":
        raise ValueError(f"unknown mode {mode!r}")

    import ray.data as rd

    # explicit seeded permutation of the materialized block list:
    # `randomize_block_order(seed)` is NOT run-deterministic under the
    # fused streaming executor (measured: same seed, different block
    # order per run); the ref permutation is metadata-only and exact
    refs = ds.materialize().to_arrow_refs()
    rng0 = np.random.RandomState(seed % (2 ** 31))
    shuffled = rd.from_arrow_refs(
        [refs[i] for i in rng0.permutation(len(refs))])

    def local_perm(batch: pa.Table) -> pa.Table:
        if batch.num_rows < 2:
            return batch
        # per-block seed from (global seed, block content): id_col makes
        # it content-derived — identical-size blocks don't share a
        # permutation and the result is reproducible per (data, seed)
        h = 0
        if id_col is not None and id_col in batch.column_names:
            from kgforge.common.hashing import hash_u64_np

            h = int(hash_u64_np([str(batch[id_col][0].as_py())])[0])
        rng = np.random.RandomState(
            (seed * 1_000_003 + h + batch.num_rows) % (2 ** 31))
        return batch.take(pa.array(rng.permutation(batch.num_rows)))

    # batch_size=None → one batch per BLOCK: batch composition (and so
    # the whole permutation) is a deterministic function of the block
    # structure + seed, independent of task scheduling
    return shuffled.map_batches(local_perm, batch_format="pyarrow",
                                batch_size=None)


def stratified_sample_ds(ds, k: int = 20, by: str = "event_type",
                         id_col: str = "event_id"):
    """Deterministic stratified sample: the k rows per group with the
    smallest md5(id) — a content-derived, engine-independent "random"
    order, so the sample is identical in Ray and the SQL twin and
    stable across cluster sizes and reruns (the property a train/eval
    sampler must have for reproducibility).

    Scale shape: per-batch partial top-k on the digest keeps ≤ k rows
    per group per batch before the shuffle — the full stream never
    moves, exactly like topk_per_group."""
    import hashlib

    import pandas as pd

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        md5 = [hashlib.md5(str(v).encode()).hexdigest()
               for v in df[id_col].tolist()]
        return pd.DataFrame({by: df[by], id_col: df[id_col], "md5": md5})

    def head(df: pd.DataFrame, with_rank: bool) -> pd.DataFrame:
        df = df.sort_values(["md5", id_col], kind="mergesort")
        out = df.groupby(by, sort=False).head(k)
        if with_rank:
            out = out.assign(rn=(out.groupby(by, sort=False).cumcount() + 1)
                             .astype("int64")).drop(columns=["md5"])
        return out

    return ds.map_batches(lambda df: head(digest(df), False),
                          batch_format="pandas") \
        .groupby(by).map_groups(lambda df: head(df, True),
                                batch_format="pandas")
