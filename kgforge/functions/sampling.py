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
    moves, exactly like topk_per_group — and the final cut is keyed by
    HASH PARTITION of the group (P Ray callbacks, never one per group;
    ``head()`` ranks every group in a partition vectorized)."""
    import pandas as pd

    from kgforge.common.hashing import md5_hex_arr
    from kgforge.functions.joins import _part_codes

    num_partitions = 64

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        md5 = md5_hex_arr(df[id_col].astype("int64").astype(str)
                          .to_numpy()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({by: df[by], id_col: df[id_col], "md5": md5})

    def head(df: pd.DataFrame, with_rank: bool) -> pd.DataFrame:
        df = df.sort_values(["md5", id_col], kind="mergesort")
        out = df.groupby(by, sort=False).head(k)
        if with_rank:
            out = out.assign(rn=(out.groupby(by, sort=False).cumcount() + 1)
                             .astype("int64")).drop(columns=["md5"])
        return out

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = head(digest(df), False)
        return out.assign(__p=_part_codes(
            pa.array(out[by].astype(str).to_numpy()), num_partitions))

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("__p").map_groups(
            lambda df: head(df.drop(columns="__p"), True),
            batch_format="pandas")


def mixture_apportion(weights: dict[str, float], k: int) -> dict[str, int]:
    """Largest-remainder apportionment of ``k`` rows across sources:
    exact, deterministic (remainder desc, source asc tie-break), sums
    to ``k``.  Data-independent — both the engine and a SQL twin can
    bake the resulting counts as constants."""
    total = float(sum(weights.values()))
    quota = {s: k * w / total for s, w in weights.items()}
    base = {s: int(quota[s]) for s in weights}
    left = k - sum(base.values())
    order = sorted(weights, key=lambda s: (-(quota[s] - base[s]), s))
    for s in order[:left]:
        base[s] += 1
    return base


def mixture_sample_ds(ds, weights: dict[str, float], k: int = 60,
                      by: str = "source", id_col: str = "doc_id",
                      num_partitions: int = 64):
    """Deterministic corpus-mixing sampler — the LLM training-data
    "data mixture" op (Pile/Dolma-style source proportions): ``k``
    rows apportioned across sources by ``weights`` (largest-remainder,
    exact), each source contributing its first ``n_s`` rows in
    content-hash order (md5 of the id — the engine-independent
    pseudo-random order every sampler here uses), so the mixture is
    identical across cluster sizes, reruns and engines.

    Scale shape: sources outside the mixture are dropped at the map;
    each batch keeps ≤ n_s rows per source before the shuffle (partial
    top-k on the digest), and the final cut is keyed by HASH PARTITION
    of the source (P Ray callbacks; a partition ranks all its sources
    in one vectorized pass) — the corpus never moves."""
    import pandas as pd

    from kgforge.common.hashing import md5_hex_arr
    from kgforge.functions.joins import _part_codes

    ns = mixture_apportion(weights, k)

    def head(df: pd.DataFrame, final: bool) -> pd.DataFrame:
        df = df.sort_values(["md5", id_col], kind="mergesort")
        out = df[df.groupby(by, sort=False).cumcount()
                 < df[by].map(ns).to_numpy()]
        if final:
            out = out.drop(columns=["md5"])
        return out

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[by].isin(ns)]
        md5 = md5_hex_arr(df[id_col].astype("int64").astype(str)
                          .to_numpy()).to_numpy(zero_copy_only=False)
        out = head(pd.DataFrame({by: df[by], id_col: df[id_col],
                                 "md5": md5}), False)
        return out.assign(__p=_part_codes(
            pa.array(out[by].astype(str).to_numpy()), num_partitions))

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("__p").map_groups(
            lambda df: head(df.drop(columns="__p"), True),
            batch_format="pandas")


def weighted_sample_ds(ds, k: int = 50, weight_col: str = "n_chars",
                       id_col: str = "doc_id", num_partitions: int = 64):
    """Deterministic weighted systematic sample of ~``k`` rows:
    rows are laid on a line in content-hash order (md5-u64 of the id —
    a fixed pseudo-random permutation shared verbatim with the SQL
    twin), each occupying a segment of length = its integer weight;
    a row is picked when its segment crosses one of the k equally
    spaced thresholds of the total weight W.  Every pick is pure
    integer arithmetic (``cum*k//W`` transitions), so the sample is
    exact, partitioning-independent, and value-verifiable — the
    classic systematic/“stochastic universe” sampler, inclusion
    probability ∝ weight (a row heavier than W/k is included once).

    Scale shape: one pass for per-partition weight sums (a
    ``num_partitions``-row table to the driver), a prefix scan over
    that tiny table, then a partition-local cumsum + threshold pick —
    the corpus itself never shuffles: partitions are the TOP bits of
    the hash, so hash order is (partition, local) order."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import md5_u64_arr

    shift = np.uint64(64 - int(np.log2(num_partitions)))
    if 1 << (64 - int(shift)) != num_partitions:
        raise ValueError("num_partitions must be a power of two")

    def compact(b: pa.Table) -> pa.Table:
        h = md5_u64_arr(pc.cast(b[id_col], pa.string()))
        return pa.table({
            id_col: b[id_col],
            "__w": pa.array(b[weight_col].combine_chunks()
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "__h": pa.array(h, pa.uint64()),
            "__p": pa.array((h >> shift).astype(np.int32))})

    base = ds.map_batches(compact, batch_format="pyarrow").materialize()

    def psum(b: pa.Table) -> pa.Table:
        g = b.group_by(["__p"], use_threads=False).aggregate(
            [("__w", "sum")])
        return pa.table({"__p": g["__p"], "s": g["__w_sum"]})

    parts = base.map_batches(psum, batch_format="pyarrow").to_pandas()
    sums = np.zeros(num_partitions, dtype=np.int64)
    if len(parts):
        agg = parts.groupby("__p")["s"].sum()
        sums[agg.index.to_numpy()] = agg.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    total = int(sums.sum())
    if total == 0:
        return base.map_batches(
            lambda b: pa.table({id_col: b[id_col].slice(0, 0),
                                weight_col: pa.array([], pa.int64())}),
            batch_format="pyarrow")

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(t, sort_keys=[("__h", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        w = t["__w"].combine_chunks().to_numpy(zero_copy_only=False)
        off = int(offsets[int(t["__p"][0].as_py())]) if t.num_rows else 0
        cum = np.cumsum(w) + off
        hit = (cum * k) // total > ((cum - w) * k) // total
        sel = pa.array(np.flatnonzero(hit))
        return pa.table({id_col: t[id_col].take(sel),
                         weight_col: pa.array(w[hit], pa.int64())})

    return base.groupby("__p").map_groups(pick, batch_format="pyarrow")


# Poisson(1) CDF thresholds on the u64 grid: T[k] = floor(P(X<=k)·2⁶⁴)
# (50-digit Decimal, pinned as literals so the SQL twin can inline the
# SAME integers — weight w = #{k : u >= T[k]} = the Poisson(1) inverse
# CDF of u/2⁶⁴, capped at len(T)).
POISSON1_U64_THRESHOLDS = (
    6786177901268885274, 13572355802537770549, 16965444753172213186,
    18096474403383694065, 18379231815936564285, 18435783298447138329,
    18445208545532234003, 18446555009401533385, 18446723317385195808)


def poisson_bootstrap_ds(ds, value_col: str = "o_totalprice",
                         key_col: str = "o_orderkey",
                         b_reps: int = 32) -> "pa.Table":
    """Poisson bootstrap of the mean — THE web-scale bootstrap
    (resampling weights are iid Poisson(1), so no replicate ever
    needs a global sample): replicate ``b`` weighs row ``r`` by the
    Poisson(1) inverse CDF of the md5-derived uniform
    ``u = h64(key ‖ 0x1f ‖ b)``, fully deterministic on the same
    first-16-hex-chars grid as the ``hash_split`` lane.  Reports the
    full-data mean and the min/max replicate means (with B = 32 these
    ARE the 2.5 % / 97.5 % order statistics) in exact integer
    micro-cents: every sum is integral and the only division is the
    final floored ``·10⁶ // n``.

    Scale shape: one streaming pass; each batch emits B per-replicate
    (Σ w·cents, Σ w) partial rows (B-bounded, never row-bounded), the
    only exchange is the B-row groupby, and the order statistics fold
    on the driver over B rows."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import hash_u64_np, round_away

    thr = np.array(POISSON1_U64_THRESHOLDS, dtype=np.uint64)

    def partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b[value_col].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        keys = pc.cast(b[key_col], pa.string()).combine_chunks()
        reps, swc, sw = [], [], []
        for rep in range(b_reps):
            ks = pc.binary_join_element_wise(
                keys, pa.scalar(str(rep)), "\x1f")
            u = hash_u64_np(ks)
            w = np.searchsorted(thr, u, side="right").astype(np.int64)
            reps.append(rep)
            swc.append(int((w * cents).sum()))
            sw.append(int(w.sum()))
        return pa.table({
            "rep": pa.array(reps, pa.int64()),
            "swc": pa.array(swc, pa.int64()),
            "sw": pa.array(sw, pa.int64()),
            "sc": pa.array([int(cents.sum())] + [0] * (b_reps - 1),
                           pa.int64()),
            "nr": pa.array([len(cents)] + [0] * (b_reps - 1),
                           pa.int64())})

    agg = ds.select_columns([key_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("rep").aggregate(
            Sum("swc", alias_name="swc"),
            Sum("sw", alias_name="sw"),
            Sum("sc", alias_name="sc"),
            Sum("nr", alias_name="nr")).to_pandas()

    means = sorted(int(r.swc) * 1_000_000 // int(r.sw)
                   for r in agg.itertuples() if int(r.sw) > 0)
    full = int(agg["sc"].sum()) * 1_000_000 // int(agg["nr"].sum())
    return pa.table({
        "b_reps": pa.array([len(means)], pa.int64()),
        "mean_micro": pa.array([full], pa.int64()),
        "boot_lo_micro": pa.array([means[0]], pa.int64()),
        "boot_hi_micro": pa.array([means[-1]], pa.int64())})
