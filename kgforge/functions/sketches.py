"""Mergeable streaming sketches — the scale path where the exact
operators' state would explode.

The engine's exact operators cover bounded domains: `group_quantiles_ds`
shuffles (group × distinct-cents) count rows, `vocab_topk` /
`doc_frequency` shuffle distinct terms.  At 10¹² rows with high-
cardinality domains (doubles that never repeat, open vocabularies)
those count tables approach the data size — the classic fix is a
mergeable sketch per block, merged up a tree, with a provable error
bound instead of a provable shuffle.

Both sketches here are DETERMINISTIC (no RNG): results are a pure
function of (data, parameters) — the repo-wide reproducibility
contract — at the cost of the textbook versions' unbiasedness (the
bias is inside the same worst-case error bound, which the tests
measure).

- **Misra–Gries heavy hitters** (`heavy_hitters_ds`): per-batch exact
  counts compacted to ≤ capacity entries; summaries merge by counter
  addition + re-compaction.  Guarantee: every item with true count
  > decremented-total is present, and ``est ≤ true ≤ est + err`` where
  ``err`` is the tracked decrement total.  With distinct keys ≤
  capacity the sketch degenerates to EXACT counting (err = 0) — which
  makes the driver query SQL-verifiable on the fixture corpus while
  the pytest exercises the lossy regime.
- **KLL-style quantile sketch** (`quantile_sketch_ds`): per-level
  buffers; a full level sorts and keeps alternate elements at double
  weight.  Deterministic compaction (always the even ranks) keeps the
  standard O(n/k · log(n/k)) rank-error envelope, measured in tests.

Scale shape shared by both: one map pass emits per-block summaries
(≤ capacity rows each), merged on the driver — driver state is
O(blocks × capacity), never O(rows); swap the driver fold for a
tree-reduce `map_batches` cascade when block count itself explodes
(same merge function, documented here as the contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters
# ---------------------------------------------------------------------------

def _mg_compact(tokens: np.ndarray, counts: np.ndarray,
                capacity: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Keep ≤ capacity entries: subtract the (capacity+1)-th largest
    count from all, drop non-positive.  Returns the decrement applied
    (the per-item error this step introduces)."""
    if len(tokens) <= capacity:
        return tokens, counts, 0
    kth = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1]
    keep = counts > kth
    return tokens[keep], counts[keep] - kth, int(kth)


def heavy_hitters_ds(ds, text_col: str = "text", capacity: int = 4096,
                     top: int = 10):
    """Approximate most-frequent whitespace tokens →
    ``(token, est, err)`` with ``est ≤ true ≤ est + err``; exact
    (``err = 0``) whenever the distinct-token count stays ≤ capacity.
    Per-batch summaries are ≤ capacity rows regardless of batch size;
    the driver fold holds one summary."""
    def summarize(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in b[text_col].to_pylist():
            toks.extend((t or "").split())
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "dec": pa.array([], pa.int64())})
        uniq, cnt = np.unique(np.asarray(toks, dtype=object),
                              return_counts=True)
        uniq, cnt, dec = _mg_compact(uniq, cnt.astype(np.int64), capacity)
        decs = np.zeros(len(uniq), dtype=np.int64)
        if len(decs):
            decs[0] = dec          # carry this block's decrement total
        return pa.table({"token": pa.array(list(uniq), pa.string()),
                         "c": pa.array(cnt, pa.int64()),
                         "dec": pa.array(decs, pa.int64())})

    parts = ds.map_batches(summarize, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({"token": pa.array([], pa.string()),
                         "est": pa.array([], pa.int64()),
                         "err": pa.array([], pa.int64())})
    total_dec = int(parts["dec"].sum())
    merged = parts.groupby("token", as_index=False)["c"].sum()
    tokens = merged["token"].to_numpy(dtype=object)
    counts = merged["c"].to_numpy(dtype=np.int64)
    tokens, counts, dec = _mg_compact(tokens, counts, capacity)
    total_dec += dec
    order = np.lexsort((tokens, -counts))[:top]
    return pa.table({
        "token": pa.array(list(tokens[order]), pa.string()),
        "est": pa.array(counts[order], pa.int64()),
        "err": pa.array(np.full(len(order), total_dec), pa.int64())})


# ---------------------------------------------------------------------------
# KLL-style quantile sketch
# ---------------------------------------------------------------------------

def _kll_add(levels: list[np.ndarray], values: np.ndarray, k: int) -> None:
    """Feed values into level 0 and compact full levels upward:
    a level holding > k items sorts and promotes its even ranks (every
    element at the next level weighs 2× more)."""
    levels[0] = np.concatenate([levels[0], values])
    lv = 0
    while len(levels[lv]) > k:
        buf = np.sort(levels[lv])
        promoted = buf[::2]
        levels[lv] = buf[:0]
        if lv + 1 == len(levels):
            levels.append(promoted)
        else:
            levels[lv + 1] = np.concatenate([levels[lv + 1], promoted])
        lv += 1


def _kll_quantiles(levels: list[np.ndarray], qs) -> list[float]:
    vals = np.concatenate([l for l in levels if len(l)]) \
        if any(len(l) for l in levels) else np.zeros(0)
    if not len(vals):
        return [float("nan")] * len(qs)
    wts = np.concatenate([np.full(len(l), 1 << i, dtype=np.int64)
                          for i, l in enumerate(levels) if len(l)])
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    n = cum[-1]
    out = []
    for q in qs:
        target = int(np.floor((n - 1) * q)) + 1
        out.append(float(vals[np.searchsorted(cum, target)]))
    return out


def quantile_sketch_ds(ds, value_col: str = "value", k: int = 256,
                       qs=(0.5, 0.9, 0.99)):
    """Approximate quantiles of a numeric column → one row per q:
    ``(q_pct, approx)``.  Each block ships a ≤ O(k·log) sketch (its
    levels flattened to (level, value) rows); the driver re-feeds them
    into one sketch, replaying each level at its weight.  Rank error
    is the KLL O(n/k·log) envelope — measured ≤ ~2% at k=256 in the
    tests; the exact-histogram `group_quantiles_ds` remains the right
    operator when the value domain is bounded."""
    def summarize(b: pa.Table) -> pa.Table:
        v = b[value_col].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        levels: list[np.ndarray] = [np.zeros(0)]
        _kll_add(levels, v, k)
        lv = np.concatenate([np.full(len(l), i, dtype=np.int32)
                             for i, l in enumerate(levels)])
        return pa.table({"lv": pa.array(lv),
                         "v": pa.array(np.concatenate(levels))})

    parts = ds.map_batches(summarize, batch_format="pyarrow").to_pandas()
    levels: list[np.ndarray] = [np.zeros(0)]
    if not parts.empty:
        # replay each level's items at weight 2^level: feeding an item
        # of weight w into level log2(w) reproduces the merge exactly
        for lv in sorted(parts["lv"].unique()):
            while len(levels) <= lv:
                levels.append(np.zeros(0))
            vals = parts[parts["lv"] == lv]["v"].to_numpy()
            levels[lv] = np.concatenate([levels[lv], vals])
            i = lv
            while len(levels[i]) > k:
                buf = np.sort(levels[i])
                promoted = buf[::2]
                levels[i] = buf[:0]
                if i + 1 == len(levels):
                    levels.append(promoted)
                else:
                    levels[i + 1] = np.concatenate(
                        [levels[i + 1], promoted])
                i += 1
    approx = _kll_quantiles(levels, qs)
    return pa.table({
        "q_pct": pa.array([int(q * 100) for q in qs], pa.int64()),
        "approx": pa.array(approx, pa.float64())})


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------

_HLL_P = 12                       # 4096 registers, ~1.6% std error
_HLL_M = 1 << _HLL_P


def _hll_partial(keys: pa.Array, values: pa.Array) -> pa.Table:
    """Per-batch HLL register partials: (key, register, rho) with the
    per-(key, register) MAX already taken — at most (keys × 4096) rows
    leave a block regardless of row count.  The value hash is the
    engine's DuckDB-md5 u64 (deterministic across workers/runs), so
    the sketch — like every operator here — is a pure function of the
    data."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import md5_u64_arr

    h = md5_u64_arr(pc.cast(values, pa.string()))
    reg = (h >> np.uint64(64 - _HLL_P)).astype(np.int32)
    suffix = h & np.uint64((1 << (64 - _HLL_P)) - 1)
    # rho = leading zeros of the (64-p)-bit suffix + 1; frexp gives the
    # exact exponent for any integer < 2^53 (suffix is 52-bit at p=12)
    _, e = np.frexp(suffix.astype(np.float64))
    rho = np.where(suffix == 0, 64 - _HLL_P + 1,
                   64 - _HLL_P - e + 1).astype(np.int32)
    t = pa.table({"k": keys, "reg": pa.array(reg),
                  "rho": pa.array(rho)})
    g = t.group_by(["k", "reg"], use_threads=False).aggregate(
        [("rho", "max")])
    return pa.table({"k": g["k"], "reg": g["reg"], "rho": g["rho_max"]})


def hll_distinct_ds(ds, key_col: str, value_col: str):
    """Approximate per-key COUNT(DISTINCT value) via a mergeable
    HyperLogLog sketch (Flajolet et al.) — the documented scale path
    past the engine's exact two-phase distinct (`hourly_distinct_users`
    shuffles one row per DISTINCT (key, value); at 10⁹ open-domain
    values that IS the data, while the sketch shuffles ≤ 4096 register
    rows per key at any cardinality).

    Plan: per-block register partials (max-per-(key, register) inside
    the block) → one groupby max over (key, register) → per-key
    estimate from the 4096-row register table.  Registers merge by
    MAX, so the sketch is order- and partition-independent —
    bit-identical across cluster sizes.  Estimator: standard HLL with
    the small-range linear-counting correction (E ≤ 2.5m with empty
    registers → m·ln(m/V)); the estimate is floored to int64 so the
    output carries no float-hash risk.  Error bound 1.04/√4096 ≈ 1.6%
    std, measured in tests against the exact count."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    def partial(b: pa.Table) -> pa.Table:
        return _hll_partial(b[key_col], b[value_col])

    regs = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["k", "reg"]).aggregate(Max("rho", alias_name="rho"))

    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)

    def estimate(t: pa.Table) -> pa.Table:
        t = t.sort_by([("k", "ascending")])
        codes = t["k"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        rho = t["rho"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if len(codes) == 0:
            return pa.table({key_col: t["k"],
                             "n_distinct_est": pa.array([], pa.int64())})
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
        nreg = np.diff(np.concatenate([starts, [len(codes)]]))
        inv_sum = np.add.reduceat(np.power(2.0, -rho), starts)
        # empty registers contribute 2^0 = 1 each
        zeros = (_HLL_M - nreg).astype(np.float64)
        est = alpha * _HLL_M * _HLL_M / (inv_sum + zeros)
        # small-range correction: linear counting while any register
        # is empty and the raw estimate is below 2.5m
        lc_mask = (zeros > 0) & (est <= 2.5 * _HLL_M)
        with np.errstate(divide="ignore"):
            lc = _HLL_M * np.log(_HLL_M / np.maximum(zeros, 1e-300))
        est = np.where(lc_mask, lc, est)
        return pa.table({
            key_col: t["k"].take(pa.array(starts)),
            "n_distinct_est": pa.array(np.floor(est).astype(np.int64)),
        })

    # the register table is ≤ keys × 4096 rows — re-keying it is a
    # shuffle of that sketch table, never of the stream; one final
    # map_batches(batch_size=None) per block keeps estimate vectorized
    from kgforge.functions.joins import _part_codes

    def add_p(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b["k"], 64)))

    return regs.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(
            lambda t: estimate(t.drop_columns(["__p"])),
            batch_format="pyarrow")
