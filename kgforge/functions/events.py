"""Event-stream operators over an ``events``-shaped table
(event_id, ts:timestamp, user_id, event_type, value, props).

Covers the windowed-aggregate / stateful-sessionization operator
class: tumbling windows are a pure groupby on a truncated-timestamp
key (zero extra state); every per-key ordered operator (sessionize,
as-of/range joins, lag/rolling/cumulative windows, quantiles, mode,
top-k, sequences) shuffles ONCE by ``hash(key) % P`` and merges every
key of a partition in one vectorized pass over the sorted run layout —
P Ray callbacks total, never one per key (10⁸ users → 64 tasks, not
10⁸ group callbacks).  Single-shuffle plans keyed to survive 1000×
data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HOUR_FMT = "%Y-%m-%d %H:00:00"


def hourly_agg_ds(ds):
    """Tumbling 1-hour window per event_type → (event_type, hour,
    n_events, sum_value_cents).  Partial per-batch pre-aggregation
    before the groupby keeps shuffle rows at (types × hours) per batch.
    Values are rounded to integer cents per ROW and summed as int64 —
    exact and summation-order-independent (float sums differ at
    rounding boundaries between engines)."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hour=df["ts"].dt.strftime(HOUR_FMT),
                       cents=round_away(df["value"] * 100, 0)
                       .astype("int64"))
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("event_id", "size"), sum_value_cents=("cents", "sum"))
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby(["event_type", "hour"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_cents", alias_name="sum_value_cents"))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "event_type": b["event_type"], "hour": b["hour"],
            "n_events": pc.cast(b["n_events"], pa.int64()),
            "sum_value_cents": pc.cast(b["sum_value_cents"], pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def sessionize_ds(ds, gap_minutes: int = 30, by: str = "user_id",
                  on: str = "ts", num_partitions: int = 64):
    """Per-user session counting: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``.  → (user_id,
    n_sessions, n_events).

    Scale shape: ONE hash partition by user (``num_partitions`` Ray
    callbacks, never one per key); inside a partition the break scan
    is a single vectorized pass over ALL users at once (user-change OR
    gap both break) and per-user counts are ``np.add.reduceat``
    segment sums."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import _part_codes

    gap_us = np.int64(gap_minutes) * np.int64(60_000_000)

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        on_np = t["__on"].combine_chunks().to_numpy(zero_copy_only=False)
        ubrk = _run_breaks(t[by].combine_chunks(),
                           np.zeros(n, dtype=np.int32))
        sbrk = ubrk.copy()
        if n > 1:
            sbrk[1:] |= np.diff(on_np) > gap_us
        starts = np.flatnonzero(ubrk)
        runlens = np.diff(np.concatenate([starts, [n]]))
        n_sess = np.add.reduceat(sbrk.astype(np.int64), starts) \
            if len(starts) else np.zeros(0, dtype=np.int64)
        return pa.table({
            by: t[by].take(pa.array(starts)),
            "n_sessions": pa.array(n_sess),
            "n_events": pa.array(runlens.astype(np.int64)),
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow")


def _on_key(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Sort/window key for the ``on`` column: timestamps become epoch
    int64 (µs) so searchsorted and window arithmetic stay numeric.
    Any timestamp unit is normalized to µs first — a ``timestamp[s]``
    column cast straight to int64 would yield seconds and silently
    break every µs-denominated window/gap constant."""
    import pyarrow.compute as pc

    if pa.types.is_timestamp(col.type):
        return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    return col


def _tag_union(left_ds, right_ds, by, on, left_keep, right_keep):
    """Align both sides to one schema (own columns + typed nulls for
    the other side's, types resolved from the OTHER dataset) and union.
    Arrow end-to-end so int64/timestamp columns never take a pandas
    float/ns round-trip."""
    l_schema = left_ds.schema().base_schema
    r_schema = right_ds.schema().base_schema

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {by: b[by], "__on": _on_key(b[on]),
                "__side": pa.array(np.zeros(n, dtype=np.int8))}
        for c in left_keep:
            cols["l_" + c] = b[c]
        for c in right_keep:
            cols["r_" + c] = pa.nulls(n, r_schema.field(c).type)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {by: b[by], "__on": _on_key(b[on]),
                "__side": pa.array(np.ones(n, dtype=np.int8))}
        for c in left_keep:
            cols["l_" + c] = pa.nulls(n, l_schema.field(c).type)
        for c in right_keep:
            cols["r_" + c] = b[c]
        return pa.table(cols)

    return left_ds.map_batches(tag_left, batch_format="pyarrow") \
        .union(right_ds.map_batches(tag_right, batch_format="pyarrow"))


def _key_stats(unioned, by):
    """Per-key ``(n rows, min __on, max __on)`` over the unioned table.

    Per-block vectorized combiner (one output row per key per block),
    partials merged on the driver — only hot keys matter and the
    partial set is blocks × keys-per-block.  At web scale swap the
    exact pass for a uniform-sample pre-pass: a key hot enough to
    matter (≥ millions of rows) is visible in any 1e-3 sample."""
    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"k": b[by], "o": b["__on"]})
        return t.group_by(["k"], use_threads=False).aggregate(
            [("o", "count"), ("o", "min"), ("o", "max")])

    parts = unioned.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return parts
    return parts.groupby("k").agg(n=("o_count", "sum"), mn=("o_min", "min"),
                                  mx=("o_max", "max"))


def _hot_plan(stats, hot_threshold, salt_target, min_width):
    """Keys above ``hot_threshold`` rows → ``{key: (mn, width, nb)}``:
    the key's ``__on`` range is cut into ``nb`` coarse sub-ranges of
    ``width`` (≥ ``min_width``) so no merge task sees more than
    ~``salt_target`` rows of one key."""
    hot = {}
    if stats is None or len(stats) == 0:
        return hot
    for k, row in stats[stats["n"] > hot_threshold].iterrows():
        span = int(row["mx"]) - int(row["mn"]) + 1
        nb = max(2, -(-int(row["n"]) // salt_target))
        width = max(min_width, -(-span // nb))
        nb = max(1, -(-span // width))
        if nb >= 2:
            hot[k] = (int(row["mn"]), width, nb)
    return hot


def _add_salt(unioned, by, hot, replicate_right=False):
    """Append ``__salt`` (coarse ``__on``-range bucket for hot keys,
    0 otherwise).  With ``replicate_right`` each hot right row is also
    emitted into the NEXT bucket, so a window of up to ``width`` µs
    reaching back from any left row is fully covered in its own task."""
    def fn(b: pa.Table) -> pa.Table:
        n = b.num_rows
        meta = pd.Series(b[by].to_pandas()).map(hot)
        hotmask = meta.notna().to_numpy()
        salt = np.zeros(n, dtype=np.int32)
        if hotmask.any():
            on = b["__on"].to_numpy(zero_copy_only=False)
            mn = np.fromiter((m[0] for m in meta[hotmask]), np.int64,
                             int(hotmask.sum()))
            w = np.fromiter((m[1] for m in meta[hotmask]), np.int64,
                            int(hotmask.sum()))
            nb = np.fromiter((m[2] for m in meta[hotmask]), np.int64,
                             int(hotmask.sum()))
            s = np.clip((on[hotmask] - mn) // w, 0, nb - 1)
            salt[hotmask] = s
            out = b.append_column("__salt", pa.array(salt, pa.int32()))
            if replicate_right:
                side = b["__side"].to_numpy(zero_copy_only=False)
                dup = np.zeros(n, dtype=bool)
                dup[hotmask] = s + 1 < nb
                dup &= side == 1
                if dup.any():
                    didx = np.flatnonzero(dup)
                    dups = b.take(pa.array(didx)).append_column(
                        "__salt", pa.array(salt[didx] + 1, pa.int32()))
                    out = pa.concat_tables([out, dups])
            return out
        return b.append_column("__salt", pa.array(salt, pa.int32()))

    return unioned.map_batches(fn, batch_format="pyarrow")


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _salted_pcodes(key_col, salt: np.ndarray,
                   num_partitions: int) -> np.ndarray:
    """Partition id from ``(key, salt)``: the key's stable 64-bit hash
    remixed with the salt bucket, so a hot key's on-range buckets land
    on DIFFERENT partitions (``hash(key) % P`` alone would collapse
    all of a hot key's buckets back onto one task)."""
    arr = key_col.combine_chunks() \
        if isinstance(key_col, pa.ChunkedArray) else key_col
    if pa.types.is_integer(arr.type):
        x = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        from kgforge.common.hashing import hash_u64_np

        x = hash_u64_np([v if v is not None else ""
                         for v in arr.to_pylist()])
    x = _splitmix64(x ^ (salt.astype(np.uint64) * _GOLD))
    return (x % np.uint64(num_partitions)).astype(np.int32)


def _run_breaks(keys: pa.ChunkedArray, salt: np.ndarray) -> np.ndarray:
    """True at each row starting a new ``(key, salt)`` run in a sorted
    table (null-safe key compare: null==null stays one run)."""
    import pyarrow.compute as pc

    n = len(salt)
    brk = np.ones(n, dtype=bool)
    if n > 1:
        a, b = keys.slice(1), keys.slice(0, n - 1)
        neq = pc.fill_null(pc.not_equal(a, b), False) \
            .to_numpy(zero_copy_only=False)
        nullmix = pc.xor(pc.is_null(a), pc.is_null(b)) \
            .to_numpy(zero_copy_only=False)
        brk[1:] = neq | nullmix | (salt[1:] != salt[:-1])
    return brk


def _carry_sentinels(unioned, by, hot, tie):
    """Sentinel right rows that fold the as-of boundary carry INTO the
    salted shuffle (replacing the former driver-dict broadcast): for
    each hot ``(key, salt s >= 1)``, the right row with the max
    ``(__on, tie)`` among that key's EARLIER salt buckets, re-labeled
    ``__salt = s`` so the merge task sees it as an ordinary (earliest)
    right row.  Two bounded stages: a per-block (key, bucket) argmax
    combiner (<= one row per hot (key, bucket) per block), then one
    tiny per-key groupby over hot keys only (few by definition) whose
    emission is a vectorized prefix pick — salt is a monotone function
    of ``__on``, so the best row among buckets < s is simply the LAST
    candidate with salt < s in (salt, on, tie) order."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        side = b["__side"].to_numpy(zero_copy_only=False)
        meta = pd.Series(b[by].to_pandas()).map(hot)
        mask = (side == 1) & meta.notna().to_numpy()
        idxs = np.flatnonzero(mask)
        if idxs.size == 0:
            return b.slice(0, 0).append_column(
                "__salt", pa.array([], pa.int32()))
        t = b.take(pa.array(idxs))
        on = t["__on"].to_numpy(zero_copy_only=False)
        sub = meta.iloc[idxs]
        mn = np.fromiter((m[0] for m in sub), np.int64, idxs.size)
        w = np.fromiter((m[1] for m in sub), np.int64, idxs.size)
        nb = np.fromiter((m[2] for m in sub), np.int64, idxs.size)
        s = np.clip((on - mn) // w, 0, nb - 1).astype(np.int32)
        t = t.append_column("__salt", pa.array(s, pa.int32()))
        idx2 = pc.sort_indices(t, sort_keys=[
            (by, "ascending"), ("__salt", "ascending"),
            ("__on", "descending"), ("r_" + tie, "descending")])
        t = t.take(idx2)
        salt_np = t["__salt"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            _run_breaks(t[by].combine_chunks(), salt_np))
        return t.take(pa.array(starts))

    cands = unioned.map_batches(partial, batch_format="pyarrow")

    def emit(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = t[by][0].as_py()
        nb = int(hot[key][2])
        idx = pc.sort_indices(t, sort_keys=[
            ("__salt", "ascending"), ("__on", "ascending"),
            ("r_" + tie, "ascending")])
        t = t.take(idx)
        salts = t["__salt"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tgt = np.arange(1, nb, dtype=np.int64)
        j = np.searchsorted(salts, tgt) - 1  # last candidate, salt < s
        ok = j >= 0
        if not ok.any():
            return t.slice(0, 0)
        out = t.take(pa.array(j[ok]))
        pos = out.schema.get_field_index("__salt")
        return out.set_column(
            pos, "__salt", pa.array(tgt[ok].astype(np.int32),
                                    pa.int32()))

    return cands.groupby(by).map_groups(emit, batch_format="pyarrow")


def asof_join_ds(left_ds, right_ds, by: str = "user_id", on: str = "ts",
                 left_cols: tuple = ("event_id",),
                 right_cols: tuple = ("event_id", "ts"),
                 tie_break: str | None = None,
                 hot_threshold: int | None = 1_000_000,
                 salt_target: int = 250_000,
                 num_partitions: int = 64):
    """As-of join (SURVEY §2.4): each left row matched to the single
    right row with the greatest ``on`` <= the left's ``on`` within the
    same ``by`` key (backward, inclusive — DuckDB ``ASOF JOIN``
    semantics); ties on ``on`` broken by the greatest ``tie_break``
    column (default: first of ``right_cols``) so the result is
    deterministic regardless of block order — the SQL twin must encode
    the same rule.  Left rows with no prior right row keep typed nulls
    (the merge is Arrow end-to-end: no pandas float/ns round-trip).

    Scale contract: the merge runs per HASH PARTITION of ``(key,
    salt)`` — ``num_partitions`` Ray callbacks total, never one per
    key (10⁸ users → 64 tasks, not 10⁸ group callbacks) — and matches
    ALL keys in a partition in one vectorized pass: sort by (key,
    salt, on, rights-before-lefts, tie), forward-fill the latest
    right-row index with ``np.maximum.accumulate``, invalidate fills
    that crossed a run boundary.  Keys with more than
    ``hot_threshold`` rows are pre-split into coarse ``on``-range
    buckets of ~``salt_target`` rows (``__salt``), and the one
    boundary row each bucket needs from earlier buckets rides the
    same shuffle as a sentinel right row (``_carry_sentinels`` — no
    driver-held carry state), so one power user with 10⁸ events lands
    on ~400 tasks, not one.  The stats pass itself is gated on the
    total row count (<= ``hot_threshold`` rows → no key can be hot →
    stream straight to the merge, no materialize); pass
    ``hot_threshold=None`` to skip the count probe too."""
    left_keep = list(left_cols)
    right_keep = list(right_cols)
    tie = tie_break or right_keep[0]
    unioned = _tag_union(left_ds, right_ds, by, on, left_keep, right_keep)

    hot: dict = {}
    if hot_threshold is not None:
        # one materialize (feeds the merge either way — the sub-
        # threshold gate must not cost an extra executed count() pass
        # on transformed inputs); count() on materialized blocks is
        # metadata-only, and below the threshold no key can be hot so
        # the stats pass is skipped entirely
        unioned = unioned.materialize()
        if unioned.count() > hot_threshold:
            hot = _hot_plan(_key_stats(unioned, by), hot_threshold,
                            salt_target, min_width=1)
    salted = _add_salt(unioned, by, hot)
    if hot:
        salted = salted.union(_carry_sentinels(unioned, by, hot, tie))

    def add_p(b: pa.Table) -> pa.Table:
        salt = b["__salt"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.append_column("__p", pa.array(
            _salted_pcodes(b[by], salt, num_partitions), pa.int32()))

    def merge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        idx = pc.sort_indices(t, sort_keys=[
            (by, "ascending"), ("__salt", "ascending"),
            ("__on", "ascending"), ("__side", "descending"),
            ("r_" + tie, "ascending")])
        t = t.take(idx)
        side = t["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        salt = t["__salt"].combine_chunks().to_numpy(zero_copy_only=False)
        run_id = np.cumsum(_run_breaks(t[by].combine_chunks(), salt)) - 1
        # ffill of the latest right row index across the whole
        # partition; a fill that crossed into a different (key, salt)
        # run is a non-match
        last = np.maximum.accumulate(np.where(side == 1, np.arange(n), -1))
        lpos = np.flatnonzero(side == 0)
        lr = last[lpos]
        have = (lr >= 0) & (run_id[np.maximum(lr, 0)] == run_id[lpos])
        la = pa.array(lpos)
        cols = {by: pc.take(t[by], la)}
        for c in left_keep:
            cols["l_" + c] = pc.take(t["l_" + c], la)
        take_r = pa.array(np.where(have, lr, 0), type=pa.int64(),
                          mask=~have)
        for c in right_keep:
            cols["r_" + c] = pc.take(t["r_" + c], take_r)
        return pa.table(cols)

    return salted.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(merge, batch_format="pyarrow")


def range_window_count_ds(left_ds, right_ds, by: str = "user_id",
                          on: str = "ts", window_us: int = 3_600_000_000,
                          left_id: str = "event_id",
                          hot_threshold: int | None = 1_000_000,
                          salt_target: int = 250_000,
                          num_partitions: int = 64):
    """Range join + aggregate (SURVEY §2.4): for each left row, count
    right rows of the same key with ``on`` in ``[left.on - window,
    left.on)`` (strictly before).  Output id column stays Arrow int64
    (no pandas float upcast).

    Scale contract: hash-partitioned by ``(key, salt)`` —
    ``num_partitions`` Ray callbacks, not one per key — with ONE
    vectorized rank-merge per partition: the rights and BOTH window
    bounds of every left row are lexsorted together by (run, value,
    query-before-right), and each bound's strictly-below right count
    falls out of one cumulative sum (the merge-rank trick; the
    per-run base cancels in the hi−lo difference, so no per-key
    searchsorted loop exists at any altitude).  Hot keys are
    pre-split into ``on``-range buckets of width >= ``window_us``
    and each hot right row is replicated into the next bucket, so
    every left row's window is fully covered inside its own task —
    no cross-task stitch.  The stats pass is gated on total rows >
    ``hot_threshold`` (below it no key can be hot; ``None`` skips
    the count probe too)."""
    unioned = _tag_union(left_ds, right_ds, by, on, [left_id], [])
    hot: dict = {}
    if hot_threshold is not None:
        # same materialize-then-gate shape as asof_join_ds
        unioned = unioned.materialize()
        if unioned.count() > hot_threshold:
            hot = _hot_plan(_key_stats(unioned, by), hot_threshold,
                            salt_target, min_width=int(window_us))
    salted = _add_salt(unioned, by, hot, replicate_right=True)

    def add_p(b: pa.Table) -> pa.Table:
        salt = b["__salt"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.append_column("__p", pa.array(
            _salted_pcodes(b[by], salt, num_partitions), pa.int32()))

    def merge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        idx = pc.sort_indices(t, sort_keys=[
            (by, "ascending"), ("__salt", "ascending")])
        t = t.take(idx)
        side = t["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        salt = t["__salt"].combine_chunks().to_numpy(zero_copy_only=False)
        run_id = np.cumsum(_run_breaks(t[by].combine_chunks(), salt)) - 1
        on_np = t["__on"].combine_chunks().to_numpy(zero_copy_only=False)
        lpos = np.flatnonzero(side == 0)
        rpos = np.flatnonzero(side == 1)
        nl, nr = lpos.size, rpos.size
        l_on = on_np[lpos]
        vals = np.concatenate([on_np[rpos], l_on, l_on - window_us])
        kinds = np.concatenate([np.ones(nr, np.int8),
                                np.zeros(2 * nl, np.int8)])
        runs = np.concatenate([run_id[rpos], run_id[lpos],
                               run_id[lpos]])
        order = np.lexsort((kinds, vals, runs))
        is_r = kinds[order] == 1
        rb = np.cumsum(is_r) - is_r        # rights strictly before
        pos = np.empty(order.size, np.int64)
        pos[order] = np.arange(order.size)
        hi = rb[pos[nr:nr + nl]]
        lo = rb[pos[nr + nl:]]
        la = pa.array(lpos)
        return pa.table({
            by: pc.take(t[by], la),
            left_id: pc.take(t["l_" + left_id], la),
            "n_in_window": pa.array((hi - lo).astype(np.int64))})

    return salted.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(merge, batch_format="pyarrow")


def sliding_window_counts_ds(ds, window_hours: int = 3,
                             on: str = "ts", type_col: str = "event_type"):
    """Sliding window counts: events per ``(event_type, window)`` for a
    ``window_hours``-hour window ending at each hour bucket.

    Zero-extra-shuffle plan: per-batch (type, hour) partial counts
    (combiner), each partial FANS OUT to the ``window_hours`` window
    ends it contributes to (rows multiply by W before the shuffle, but
    only (types × hours × W) combiner rows shuffle — never events),
    then one small groupby-sum.  Windows with zero events are absent
    (same as the SQL twin)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    hour_us = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        hours = pc.cast(_on_key(b[on]), pa.int64())
        h = pc.divide(hours, hour_us)  # floor for non-negative epochs
        t = pa.table({type_col: b[type_col], "h": h})
        g = t.group_by([type_col, "h"], use_threads=False) \
            .aggregate([([], "count_all")])
        n = g.num_rows
        reps = np.repeat(np.arange(n), window_hours)
        offs = np.tile(np.arange(window_hours, dtype=np.int64), n)
        base = g["h"].to_numpy(zero_copy_only=False)
        return pa.table({
            type_col: pc.take(g[type_col], pa.array(reps)),
            "window_end_hour": pa.array(base[reps] + offs, pa.int64()),
            "n": pc.take(g["count_all"].cast(pa.int64()), pa.array(reps)),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([type_col, "window_end_hour"]) \
        .aggregate(Sum("n", alias_name="n_events"))


def topk_per_group_ds(ds, k: int = 3, by: str = "user_id",
                      order_col: str = "value", id_col: str = "event_id",
                      num_partitions: int = 64):
    """Top-k rows per group by (value desc, id asc) — the window
    ``row_number() <= k`` pattern, partial-top-k'd before the shuffle.

    Scale shape: each batch keeps at most k rows per group it sees, so
    the groupby moves ≤ k × (groups × batches) rows — never the event
    stream.  The order key is integer cents (per-row half-away round,
    like every money sum here) so the rank boundary is exact and the
    SQL twin orders by the identical integer."""
    from kgforge.common.hashing import round_away

    def topk(df: pd.DataFrame, with_rank: bool) -> pd.DataFrame:
        df = df.sort_values(["value_cents", id_col],
                            ascending=[False, True], kind="mergesort")
        out = df.groupby(by, sort=False).head(k)
        if with_rank:
            out = out.assign(rn=(out.groupby(by, sort=False).cumcount() + 1)
                             .astype("int64"))
        return out

    from kgforge.functions.joins import _part_codes

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            by: df[by].astype("int64"),
            id_col: df[id_col].astype("int64"),
            "value_cents": round_away(df[order_col] * 100, 0).astype("int64"),
        })
        out = topk(df, with_rank=False)
        # final stage is keyed by HASH PARTITION, not by raw key —
        # P Ray callbacks, not one per group; topk() already ranks
        # every group in a partition vectorized (pandas groupby.head)
        out = out.assign(__p=_part_codes(
            pa.array(out[by].to_numpy()), num_partitions))
        return out

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("__p") \
        .map_groups(lambda df: topk(df.drop(columns="__p"),
                                    with_rank=True),
                    batch_format="pandas")


def event_deltas_ds(ds, by: str = "user_id", on: str = "ts",
                    id_col: str = "event_id",
                    num_partitions: int = 64):
    """Per-event gap (µs) to the same user's previous event — the
    ``lag() OVER (PARTITION BY user ORDER BY ts, id)`` window.  NULL
    (Arrow-typed int64 null, no NaN round-trip) for each user's first
    event.  One shuffle keyed by HASH PARTITION of the user id
    (``num_partitions`` Ray callbacks, never one per user); inside a
    partition the lag is one global ``np.diff`` with the first row of
    every user run masked null — all users at once, no per-key
    Python."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({id_col: b[id_col], by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        us = t["__on"].combine_chunks().to_numpy(zero_copy_only=False)
        vals = np.zeros(n, dtype=np.int64)
        if n > 1:
            vals[1:] = np.diff(us)
        mask = _run_breaks(t[by].combine_chunks(),
                           np.zeros(n, dtype=np.int32))
        return pa.table({
            id_col: t[id_col], by: t[by],
            "delta_us": pa.array(vals, pa.int64(), mask=mask),
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow")


def group_quantiles_ds(ds, qs=(0.5, 0.9), by: str = "event_type",
                       value_col: str = "value",
                       num_partitions: int = 64):
    """Exact per-group quantiles via a distributed value histogram.

    Per-batch (group, cents) count partials → ONE shuffle keyed by
    HASH PARTITION of the group (``num_partitions`` Ray callbacks,
    never one per group) → per-partition merge + cumulative scan over
    ALL groups at once: duplicate (group, cents) partials collapse in
    one arrow group_by, and every group's rank row falls out of a
    single ``searchsorted`` into the partition-global cumsum (run
    bases cancel, so no per-group Python).  The shuffle carries
    (groups × distinct cents × batches) count rows, never events —
    exact quantiles cost one small exchange at any scale, no global
    sort, no sampling sketch.  Quantile rule (encoded identically in
    the SQL twin): the sorted element at index floor((n-1)·q)."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import _part_codes

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            by: df[by],
            "cents": round_away(df[value_col] * 100, 0).astype("int64"),
        }).groupby([by, "cents"], as_index=False).size() \
          .rename(columns={"size": "n"})
        out = out.assign(__p=_part_codes(
            pa.array(out[by].to_numpy()), num_partitions))
        return out

    counts = ds.map_batches(partial, batch_format="pandas")

    def pick(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__p"]) \
            .group_by([by, "cents"], use_threads=False) \
            .aggregate([("n", "sum")])
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("cents", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        cents = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        n_arr = t["n_sum"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        brk = _run_breaks(t[by].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        starts = np.flatnonzero(brk)
        csum = np.cumsum(n_arr)
        base = csum[starts] - n_arr[starts]      # exclusive run prefix
        ntot = np.add.reduceat(n_arr, starts) \
            if len(starts) else np.zeros(0, dtype=np.int64)
        cols = {by: t[by].take(pa.array(starts))}
        for q in qs:
            idxq = np.floor((ntot - 1) * q).astype(np.int64)
            pos = np.searchsorted(csum, base + idxq + 1)
            cols[f"p{int(q * 100)}_cents"] = pa.array(cents[pos],
                                                      pa.int64())
        cols["n_events"] = pa.array(ntot)
        return pa.table(cols)

    return counts.groupby("__p").map_groups(pick, batch_format="pyarrow")


def cumulative_sum_ds(ds, by: str = "user_id", on: str = "ts",
                      id_col: str = "event_id", value_col: str = "value",
                      hot_threshold: int = 1_000_000,
                      salt_target: int = 500_000,
                      num_partitions: int = 64):
    """Per-user running total — the ``sum() OVER (PARTITION BY user
    ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`` window.  Values are
    per-row integer cents so the running sum is exact and
    order-independent within the engine's float handling.

    Scale shape: one shuffle keyed by HASH PARTITION of ``(key,
    salt)`` (``num_partitions`` Ray callbacks, never one per user);
    per partition the scan is ONE global cumsum with per-run bases
    subtracted — all users at once, no per-key Python.  A key above
    ``hot_threshold`` rows is auto-split into coarse ``on``-range salt
    buckets (same plan machinery as :func:`asof_join_ds`) and scanned
    as a distributed two-phase prefix sum: per-bucket local cumsum +
    a broadcast per-bucket offset table (per-block combiner → driver
    prefix scan over the tiny (hot keys × buckets) set).  Bucket cuts
    are by ``__on`` value, so equal timestamps never straddle buckets
    and the (on, id) order is exactly the per-bucket concatenation.
    The stats pass is gated on a dataset row count: at or below
    ``hot_threshold`` rows no key can be hot and the stream goes
    straight to the merge."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import round_away

    def compact(b: pa.Table) -> pa.Table:
        return pa.table({
            by: b[by], "__on": _on_key(b[on]), id_col: b[id_col],
            "cents": pa.array(round_away(
                b[value_col].combine_chunks()
                .to_numpy(zero_copy_only=False) * 100, 0)
                .astype(np.int64)),
        })

    base = ds.map_batches(compact, batch_format="pyarrow")
    hot: dict = {}
    if ds.count() > hot_threshold:
        base = base.materialize()
        hot = _hot_plan(_key_stats(base, by), hot_threshold,
                        salt_target, min_width=1)
    salted = _add_salt(base, by, hot)

    offs: dict = {}
    if hot:
        # per-bucket cent sums of hot keys only: per-block combiner →
        # driver prefix scan; |hot keys| × nb rows, never the stream
        def bucket_partial(b: pa.Table) -> pa.Table:
            meta = pd.Series(b[by].to_pandas()).map(hot)
            hotmask = meta.notna().to_numpy()
            if not hotmask.any():
                return pa.table({"k": b[by].slice(0, 0),
                                 "s": pa.array([], pa.int32()),
                                 "c": pa.array([], pa.int64())})
            on_np = b["__on"].to_numpy(zero_copy_only=False)[hotmask]
            mn = np.fromiter((m[0] for m in meta[hotmask]), np.int64)
            w = np.fromiter((m[1] for m in meta[hotmask]), np.int64)
            nb = np.fromiter((m[2] for m in meta[hotmask]), np.int64)
            st = np.clip((on_np - mn) // w, 0, nb - 1).astype(np.int32)
            t = pa.table({
                "k": pa.array(b[by].combine_chunks()
                              .to_numpy(zero_copy_only=False)[hotmask]),
                "s": pa.array(st),
                "c": pa.array(b["cents"].combine_chunks()
                              .to_numpy(zero_copy_only=False)[hotmask]),
            })
            g = t.group_by(["k", "s"], use_threads=False) \
                .aggregate([("c", "sum")])
            return pa.table({"k": g["k"], "s": g["s"], "c": g["c_sum"]})

        parts = base.map_batches(bucket_partial,
                                 batch_format="pyarrow").to_pandas()
        if len(parts):
            sums = parts.groupby(["k", "s"])["c"].sum()
            for k, grp in sums.groupby(level=0):
                run = 0
                for (_, sv), c in grp.sort_index().items():
                    offs[(k, int(sv))] = run
                    run += int(c)
    hot_keys = {k for (k, _) in offs}

    def add_p(b: pa.Table) -> pa.Table:
        salt = b["__salt"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.append_column("__p", pa.array(
            _salted_pcodes(b[by], salt, num_partitions), pa.int32()))

    def scan(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__salt", "ascending"),
                                            ("__on", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        cents = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        salt = t["__salt"].combine_chunks().to_numpy(zero_copy_only=False)
        brk = _run_breaks(t[by].combine_chunks(), salt)
        starts = np.flatnonzero(brk)
        runlens = np.diff(np.concatenate([starts, [n]]))
        csum = np.cumsum(cents)
        base_off = csum[starts] - cents[starts]   # exclusive run prefix
        add = np.zeros(len(starts), dtype=np.int64)
        if offs:      # hot-key runs pick up their bucket's global base
            skeys = t[by].take(pa.array(starts)).to_pandas()
            for i in np.flatnonzero(skeys.isin(hot_keys).to_numpy()):
                add[i] = offs.get((skeys.iloc[i], int(salt[starts[i]])), 0)
        cum = csum - np.repeat(base_off - add, runlens) \
            if n else np.zeros(0, dtype=np.int64)
        return pa.table({
            id_col: t[id_col], by: t[by],
            "cum_cents": pa.array(cum.astype(np.int64), pa.int64()),
        })

    return salted.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(scan, batch_format="pyarrow")


def rolling_sum_ds(ds, window: int = 3, by: str = "user_id",
                   on: str = "ts", id_col: str = "event_id",
                   value_col: str = "value", num_partitions: int = 64):
    """Per-user rolling aggregate over the last ``window`` events —
    the ``ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW`` window.  Emits
    the integer window sum and the in-window row count (exact; a
    rolling *mean* is their float ratio and rounds differently per
    engine, so the integers are the contract).

    Scale shape: one shuffle keyed by HASH PARTITION of the user
    (``num_partitions`` Ray callbacks, never one per user); per
    partition the window is one global prefix-sum difference with the
    window lower bound clamped to each user run's start — all users
    at once, no per-key Python."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({
            id_col: b[id_col], by: b[by],
            "__on": pc.cast(_on_key(b[on]), pa.int64()),
            "cents": pa.array(round_away(
                b[value_col].combine_chunks()
                .to_numpy(zero_copy_only=False) * 100, 0)
                .astype(np.int64)),
        })
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def roll(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        cents = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        brk = _run_breaks(t[by].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        starts = np.flatnonzero(brk)
        runlens = np.diff(np.concatenate([starts, [n]]))
        run_start = np.repeat(starts, runlens) \
            if n else np.zeros(0, dtype=np.int64)
        cum = np.concatenate([[0], np.cumsum(cents)])
        lo = np.maximum(np.arange(n) - window + 1, run_start)
        return pa.table({
            id_col: t[id_col], by: t[by],
            "win_sum_cents": pa.array(cum[1:] - cum[lo], pa.int64()),
            "win_n": pa.array((np.arange(n) - lo + 1).astype(np.int64)),
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(roll, batch_format="pyarrow")


def pivot_hourly_ds(ds, type_col: str = "event_type", on: str = "ts"):
    """Pivot: one row per event_type, 24 hour-of-day count columns
    (h00..h23) — the conditional-aggregation reshape.  Per-batch
    combiner counts (type × hour-of-day) so the shuffle carries at
    most 24 rows per type per batch; the pivot itself touches only
    the tiny aggregated table."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    hour_us = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        hours = pc.cast(_on_key(b[on]), pa.int64())
        hod = pc.subtract(pc.divide(hours, hour_us),
                          pc.multiply(pc.divide(pc.divide(hours, hour_us),
                                                24), 24))
        t = pa.table({type_col: b[type_col], "hod": hod})
        g = t.group_by([type_col, "hod"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({type_col: g[type_col], "hod": g["hod"],
                         "n": g["count_all"].cast(pa.int64())})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([type_col, "hod"]).aggregate(Sum("n", alias_name="n"))

    from kgforge.functions.joins import _part_codes

    def add_p(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b[type_col], 64)))

    # final reshape keyed by HASH PARTITION (P callbacks, not one per
    # type); the (runs × 24) matrix fill is one fancy-index assignment
    def pivot(t: pa.Table) -> pa.Table:
        t = t.sort_by([(type_col, "ascending")])
        codes = t[type_col].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        hod = t["hod"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1]) \
            if len(codes) else np.zeros(0, dtype=np.int64)
        run_of = np.cumsum(np.isin(np.arange(len(codes)), starts)) - 1 \
            if len(codes) else np.zeros(0, dtype=np.int64)
        mat = np.zeros((len(starts), 24), dtype=np.int64)
        mat[run_of, hod] = n
        cols = {type_col: t[type_col].take(pa.array(starts))}
        for h in range(24):
            cols[f"h{h:02d}"] = pa.array(mat[:, h])
        return pa.table(cols)

    return counts.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(
            lambda t: pivot(t.drop_columns(["__p"])),
            batch_format="pyarrow")


# Broadcast interval-join small side: (lo_cents inclusive, hi_cents
# exclusive, tier).  A stand-in for any static banding table (pricing
# tiers, IP→geo ranges); the driver SQL twin joins the same VALUES.
TIER_TABLE = (
    (-(2 ** 62), 2500, "low"),
    (2500, 7500, "mid"),
    (7500, 2 ** 62, "high"),
)


def tier_lookup_ds(ds, id_col: str = "event_id", value_col: str = "value"):
    """Broadcast interval join: map each event's value to its tier row
    in a small static band table.  The small side is a module constant
    here; at scale it is ``ray.put`` once and read per task — never
    shuffled.  Lookup is one ``searchsorted`` over the band bounds per
    batch (the bands are non-overlapping and sorted, the general
    broadcast-range-join fast path)."""
    from kgforge.common.hashing import round_away

    los = np.array([t[0] for t in TIER_TABLE], dtype=np.int64)
    names = np.array([t[2] for t in TIER_TABLE])

    def lookup(t: pa.Table) -> pa.Table:
        cents = round_away(
            t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
            * 100, 0).astype(np.int64)
        code = np.searchsorted(los, cents, side="right") - 1
        return pa.table({
            id_col: t[id_col],
            "value_cents": pa.array(cents, pa.int64()),
            "tier": pa.array(names[code], pa.string()),
        })

    return ds.map_batches(lookup, batch_format="pyarrow")


def json_field_stats_ds(ds, json_col: str = "props", field: str = "k",
                        by: str = "event_type"):
    """Semi-structured payload extraction + grouped aggregate: pull an
    integer ``field`` out of a JSON-string column with ONE vectorized
    regex kernel per batch (``pc.extract_regex`` — no per-row
    json.loads), then count/sum/min/max per ``by`` key.  Rows where
    the field is absent are dropped (the twin filters the same way).

    Scale shape: combiner-before-shuffle — each batch collapses to at
    most |distinct by-keys| partial rows via an Arrow group_by, so the
    exchange carries key-cardinality rows, never events.  The regex
    (`"field":\\s*(-?\\d+)`) is spelled identically in the SQL twin's
    ``regexp_extract``, so parity is by construction rather than by a
    shared JSON parser."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    pat = f'"{field}":\\s*(?P<v>-?\\d+)'

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            pc.fill_null(b[json_col], "").combine_chunks(), pattern=pat)
        vals = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        mask = pc.is_valid(ex)
        t = pa.table({by: pc.filter(b[by].combine_chunks(), mask),
                      "v": pc.filter(vals, mask)})
        g = t.group_by(by, use_threads=False).aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")])
        return pa.table({
            by: g[by],
            "n": pc.cast(g["v_count"], pa.int64()),
            f"sum_{field}": pc.cast(g["v_sum"], pa.int64()),
            f"min_{field}": pc.cast(g["v_min"], pa.int64()),
            f"max_{field}": pc.cast(g["v_max"], pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(by).aggregate(
            Sum("n", alias_name="n"),
            Sum(f"sum_{field}", alias_name=f"sum_{field}"),
            Min(f"min_{field}", alias_name=f"min_{field}"),
            Max(f"max_{field}", alias_name=f"max_{field}"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            by: b[by],
            "n": pc.cast(b["n"], pa.int64()),
            f"sum_{field}": pc.cast(b[f"sum_{field}"], pa.int64()),
            f"min_{field}": pc.cast(b[f"min_{field}"], pa.int64()),
            f"max_{field}": pc.cast(b[f"max_{field}"], pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


def group_regression_ds(ds, by: str = "event_type",
                        json_col: str = "props", field: str = "k",
                        y_col: str = "value"):
    """Grouped EXACT least-squares slope: per key, the OLS slope of
    y-cents on an integer x extracted from a JSON payload, reported as
    the exact integer pair ``slope_num = n·Σxy − Σx·Σy`` /
    ``slope_den = n·Σx² − (Σx)²`` plus ``slope_ppm`` (scaled integer
    quotient, truncated toward zero — DuckDB ``//`` semantics, NOT
    Python floor).  No float enters until the caller divides.

    Scale shape: one pass of per-batch integer moment partials
    (n, Σx, Σy, Σxy, Σx²) per key — five int64 sums, combiner before
    the key-cardinality exchange.  The final quotient runs over the
    AGGREGATED table (≤ |keys| rows) in exact Python ints, so
    ``slope_num · 1e6`` cannot overflow int64 mid-stream; int64 moment
    partials themselves bound the domain (document/x·y ranges) — swap
    the partials to object-dtype Python ints for 128-bit inputs."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    pat = f'"{field}":\\s*(?P<v>-?\\d+)'

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            pc.fill_null(b[json_col], "").combine_chunks(), pattern=pat)
        xv = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        mask = pc.is_valid(ex)
        x = pc.filter(xv, mask).to_numpy(zero_copy_only=False)
        y = round_away(
            pc.filter(b[y_col].combine_chunks(), mask)
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        t = pa.table({
            by: pc.filter(b[by].combine_chunks(), mask),
            "n": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxy": pa.array(x * y), "sxx": pa.array(x * x)})
        return t.group_by(by, use_threads=False).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")])

    agg = ds.map_batches(
        lambda b: partial(b).rename_columns(
            [by, "n", "sx", "sy", "sxy", "sxx"]),
        batch_format="pyarrow") \
        .groupby(by).aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_pylist()
        sx = b["sx"].to_pylist()
        sy = b["sy"].to_pylist()
        sxy = b["sxy"].to_pylist()
        sxx = b["sxx"].to_pylist()
        num, den, ppm = [], [], []
        for i in range(len(n)):
            nu = n[i] * sxy[i] - sx[i] * sy[i]     # exact Python ints
            de = n[i] * sxx[i] - sx[i] * sx[i]
            num.append(nu)
            den.append(de)
            if de == 0:
                ppm.append(0)
            else:
                q = abs(nu) * 1_000_000 // abs(de)  # truncate-to-zero
                ppm.append(q if (nu >= 0) == (de >= 0) else -q)
        return pa.table({
            by: b[by],
            "n": pc.cast(b["n"], pa.int64()),
            "slope_num": pa.array(num, pa.int64()),
            "slope_den": pa.array(den, pa.int64()),
            "slope_ppm": pa.array(ppm, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def topk_paths_ds(ds, k: int = 10, steps: int = 3,
                  by: str = "user_id", on: str = "ts",
                  id_col: str = "event_id",
                  type_col: str = "event_type", sep: str = ">",
                  num_partitions: int = 64) -> pa.Table:
    """Funnel discovery: the ``k`` most common first-``steps``
    event-type paths across users (deterministic ``(on, id)`` order
    within a user; ties in the final cut broken by path ascending —
    the same rule spelled in the SQL twin's ``ORDER BY n_users DESC,
    path``).  Users with fewer than ``steps`` events contribute their
    shorter path, like the twin's ``rn <= steps`` filter.

    Scale shape: ONE user-hash shuffle (same partitioned-merge
    contract as ``event_sequences_ds``); inside each partition every
    user's prefix is sliced with run-offset index math and joined in
    one ``pc.binary_join`` C call, then collapsed to (path, count)
    partials — so the exchange out of the merge carries at most
    |distinct paths| ≤ |event types|^steps rows per partition.  The
    final cut folds block-level top-k partials on the driver
    (≤ k × blocks rows)."""
    import pyarrow.compute as pc
    import ray

    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64()),
                      id_col: b[id_col], type_col: b[type_col]})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def paths(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        brk = _run_breaks(t[by].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        starts = np.flatnonzero(brk)
        runlen = np.diff(np.concatenate([starts, [n]]))
        take_n = np.minimum(runlen, steps)
        # gather each user's first take_n rows
        tot = int(take_n.sum())
        base = np.repeat(starts, take_n)
        within = np.arange(tot) - np.repeat(
            np.concatenate([[0], np.cumsum(take_n)[:-1]]), take_n)
        types = t[type_col].combine_chunks() \
            .take(pa.array(base + within))
        offsets = np.concatenate(
            [[0], np.cumsum(take_n)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         types)
        p = pa.table({"path": pc.binary_join(lists, sep)})
        g = p.group_by(["path"], use_threads=False) \
            .aggregate([("path", "count")])
        return g.rename_columns(["path", "n_users"])

    from ray.data.aggregate import Sum

    summed = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(paths, batch_format="pyarrow") \
        .groupby("path").aggregate(Sum("n_users", alias_name="n_users"))

    def block_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[("n_users", "descending"),
                                            ("path", "ascending")])
        return b.take(idx[:k])

    parts = [t for t in ray.get(
        summed.map_batches(block_topk, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_columns]
    flat = pa.concat_tables(parts) if parts else pa.table({
        "path": pa.array([], pa.string()),
        "n_users": pa.array([], pa.int64())})
    idx = pc.sort_indices(flat, sort_keys=[("n_users", "descending"),
                                           ("path", "ascending")])
    out = flat.take(idx[:k])
    return pa.table({"path": out["path"],
                     "n_users": pc.cast(out["n_users"], pa.int64())})


def rank_transform_ds(ds, value_col: str = "value",
                      id_col: str = "event_id"):
    """Exact global rank normalization of a numeric column — for each
    row, ``rank_lt`` = number of rows with a STRICTLY smaller value
    and ``pct_ppm = rank_lt * 1_000_000 // (n - 1)`` (percent_rank in
    exact integer ppm) — the quantile/rank feature transform used to
    make heavy-tailed signals comparable before thresholding, with no
    float in sight until the caller divides.

    Scale shape: no global sort — per-batch (cents → count) partials,
    one groupby over DISTINCT values (domain-bounded: the histogram is
    ≤ |value domain| rows regardless of corpus size; an unbounded
    domain should go through the KLL sketch lane instead), a tiny
    driver cumsum, then ONE broadcast (`ray.put`) of the sorted
    (values, rank_lt) arrays and a searchsorted map pass.  Rows move
    zero times."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def counts_partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b[value_col].combine_chunks().to_numpy(zero_copy_only=False)
            * 100, 0).astype(np.int64)
        t = pa.table({"vc": pa.array(cents, pa.int64())})
        g = t.group_by(["vc"], use_threads=False).aggregate(
            [("vc", "count")])
        return pa.table({"vc": g["vc"],
                         "cnt": pc.cast(g["vc_count"], pa.int64())})

    hist = ds.map_batches(counts_partial, batch_format="pyarrow") \
        .groupby("vc").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    hist = hist.sort_values("vc")
    vals = hist["vc"].to_numpy(dtype=np.int64)
    cnts = hist["cnt"].to_numpy(dtype=np.int64)
    n = int(cnts.sum())
    rank_lt = np.concatenate([[0], np.cumsum(cnts)[:-1]]) \
        if len(cnts) else np.empty(0, np.int64)
    denom = max(n - 1, 1)
    ref = ray.put((vals, rank_lt))

    def apply(b: pa.Table) -> pa.Table:
        v, r = ray.get(ref)
        cents = round_away(
            b[value_col].combine_chunks().to_numpy(zero_copy_only=False)
            * 100, 0).astype(np.int64)
        rk = r[np.searchsorted(v, cents)]
        return pa.table({
            id_col: b[id_col],
            "value_cents": pa.array(cents, pa.int64()),
            "rank_lt": pa.array(rk, pa.int64()),
            "pct_ppm": pa.array(rk * 1_000_000 // denom, pa.int64())})

    return ds.map_batches(apply, batch_format="pyarrow")


def hourly_distinct_users_ds(ds, type_col: str = "event_type",
                             on: str = "ts", user_col: str = "user_id"):
    """Exact distinct-count per window — ``count(DISTINCT user)`` per
    (event_type, hour) — as the standard two-phase plan: per-batch
    dedup of (type, hour, user) triples, one groupby on the TRIPLE
    (each user row moves once, hot windows spread across reducers by
    user), then a count per (type, hour).  No HLL sketch needed for
    exactness; the shuffle carries distinct triples, never events."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    hour_us = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        hours = pc.cast(_on_key(b[on]), pa.int64())
        t = pa.table({type_col: b[type_col],
                      "hour": pc.divide(hours, hour_us),
                      user_col: b[user_col]})
        g = t.group_by([type_col, "hour", user_col], use_threads=False) \
            .aggregate([])
        return g

    distinct = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([type_col, "hour", user_col]) \
        .aggregate(Count(alias_name="__c"))

    def strip(b: pa.Table) -> pa.Table:
        return b.select([type_col, "hour"])

    return distinct.map_batches(strip, batch_format="pyarrow") \
        .groupby([type_col, "hour"]) \
        .aggregate(Count(alias_name="n_users"))


ROLLUP_ALL = "<all>"


def rollup_hourly_ds(ds, type_col: str = "event_type", on: str = "ts",
                     value_col: str = "value"):
    """GROUP BY ROLLUP(event_type, hour-of-day): leaf rows plus
    per-type subtotals plus the grand total, absent dimensions marked
    ``<all>`` (a marker string, not NULL — null group keys canonize
    differently per engine).  The event stream feeds ONE combiner +
    groupby at the leaf grain; both rollup levels re-aggregate the
    tiny (types × 24) result on a single task — subtotal derivation
    never touches the stream."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    hour_us = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        hours = pc.cast(_on_key(b[on]), pa.int64())
        h = pc.divide(hours, hour_us)
        hod = pc.subtract(h, pc.multiply(pc.divide(h, 24), 24))
        cents = round_away(
            b[value_col].combine_chunks().to_numpy(zero_copy_only=False)
            * 100, 0).astype(np.int64)
        t = pa.table({type_col: b[type_col], "hod": hod,
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "c": pa.array(cents)})
        g = t.group_by([type_col, "hod"], use_threads=False) \
            .aggregate([("n", "sum"), ("c", "sum")])
        return pa.table({type_col: g[type_col], "hod": g["hod"],
                         "n": g["n_sum"], "c": g["c_sum"]})

    leaf = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([type_col, "hod"]) \
        .aggregate(Sum("n", alias_name="n"), Sum("c", alias_name="c"))

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"n": "int64", "c": "int64"})
        lv0 = pd.DataFrame({
            type_col: df[type_col], "hod": df["hod"].astype(int).astype(str),
            "n_events": df["n"], "sum_cents": df["c"]})
        sub = df.groupby(type_col, as_index=False).agg(
            n_events=("n", "sum"), sum_cents=("c", "sum"))
        lv1 = sub.assign(hod=ROLLUP_ALL)[
            [type_col, "hod", "n_events", "sum_cents"]]
        lv2 = pd.DataFrame({
            type_col: [ROLLUP_ALL], "hod": [ROLLUP_ALL],
            "n_events": [df["n"].sum()], "sum_cents": [df["c"].sum()]})
        out = pd.concat([lv0, lv1, lv2], ignore_index=True)
        return out.astype({"n_events": "int64", "sum_cents": "int64"})

    return leaf.repartition(1).map_batches(rollup, batch_format="pandas",
                                           batch_size=None)


def cube_hourly_ds(ds, type_col: str = "event_type", on: str = "ts",
                   value_col: str = "value"):
    """GROUP BY CUBE(event_type, hour-of-day): leaf rows + BOTH
    one-dimension subtotals + the grand total (ROLLUP's sibling with
    the hod-only marginal added), absent dimensions marked ``<all>``.
    Same scale shape as :func:`rollup_hourly_ds`: the event stream
    feeds ONE combiner + groupby at the leaf grain; all three subtotal
    levels re-aggregate the tiny (types × 24) table on a single task —
    subtotal derivation never touches the stream."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    hour_us = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        hours = pc.cast(_on_key(b[on]), pa.int64())
        h = pc.divide(hours, hour_us)
        hod = pc.subtract(h, pc.multiply(pc.divide(h, 24), 24))
        cents = round_away(
            b[value_col].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        t = pa.table({type_col: b[type_col], "hod": hod,
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "c": pa.array(cents)})
        g = t.group_by([type_col, "hod"], use_threads=False) \
            .aggregate([("n", "sum"), ("c", "sum")])
        return pa.table({type_col: g[type_col], "hod": g["hod"],
                         "n": g["n_sum"], "c": g["c_sum"]})

    leaf = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([type_col, "hod"]) \
        .aggregate(Sum("n", alias_name="n"), Sum("c", alias_name="c"))

    def cube(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"n": "int64", "c": "int64"})
        lv0 = pd.DataFrame({
            type_col: df[type_col], "hod": df["hod"].astype(int).astype(str),
            "n_events": df["n"], "sum_cents": df["c"]})
        by_type = df.groupby(type_col, as_index=False).agg(
            n_events=("n", "sum"), sum_cents=("c", "sum")) \
            .assign(hod=ROLLUP_ALL)[
                [type_col, "hod", "n_events", "sum_cents"]]
        by_hod = df.groupby("hod", as_index=False).agg(
            n_events=("n", "sum"), sum_cents=("c", "sum"))
        by_hod = pd.DataFrame({
            type_col: ROLLUP_ALL, "hod": by_hod["hod"].astype(int)
            .astype(str), "n_events": by_hod["n_events"],
            "sum_cents": by_hod["sum_cents"]})
        grand = pd.DataFrame({
            type_col: [ROLLUP_ALL], "hod": [ROLLUP_ALL],
            "n_events": [df["n"].sum()], "sum_cents": [df["c"].sum()]})
        out = pd.concat([lv0, by_type, by_hod, grand],
                        ignore_index=True)
        return out.astype({"n_events": "int64", "sum_cents": "int64"})

    return leaf.repartition(1).map_batches(cube, batch_format="pandas",
                                           batch_size=None)


def funnel_counts_ds(ds, steps=("view", "click", "purchase"),
                     by: str = "user_id", type_col: str = "event_type",
                     on: str = "ts", num_partitions: int = 64):
    """Ordered-funnel analysis: for each step i, how many users
    performed step i at-or-after their earliest completion of steps
    0..i-1 (first-touch semantics, ``>=`` on the timestamp) →
    (step_idx, step, n_users).

    One keyed shuffle: events hash-partition by user; per partition
    the per-user step times are ``np.minimum.reduceat`` segment
    reductions over masked epoch-µs values — no per-user Python —
    and only per-partition step counters leave the shuffle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    steps = tuple(steps)
    big = np.int64(2**62)

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            by: b[by],
            type_col: b[type_col],
            "__on": pc.cast(_on_key(b[on]), pa.int64()),
            "__p": pa.array(_part_codes(b[by], num_partitions)),
        })

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.sort_by([(by, "ascending")])
        users = t[by].combine_chunks().to_numpy(zero_copy_only=False)
        if len(users) == 0:
            starts = np.zeros(0, dtype=np.int64)
        else:
            starts = np.concatenate(
                [[0], np.flatnonzero(users[1:] != users[:-1]) + 1])
        ts = t["__on"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        etype = t[type_col].combine_chunks()
        seg_lens = np.diff(np.concatenate([starts, [len(users)]]))
        prev = np.zeros(len(starts), dtype=np.int64)   # -inf sentinel 0
        counts = []
        for s in steps:
            mask = pc.equal(etype, s).to_numpy(zero_copy_only=False)
            prev_row = np.repeat(prev, seg_lens)
            val = np.where(mask & (ts >= prev_row), ts, big)
            tmin = (np.minimum.reduceat(val, starts)
                    if len(starts) else np.zeros(0, dtype=np.int64))
            counts.append(int((tmin < big).sum()))
            prev = tmin
        return pa.table({
            "step_idx": pa.array(np.arange(len(steps), dtype=np.int64)),
            "step": pa.array(list(steps), pa.string()),
            "n_users": pa.array(counts, pa.int64()),
        })

    parts = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow")
    return parts.groupby(["step_idx", "step"]) \
        .aggregate(Sum("n_users", alias_name="n_users"))


def cohort_retention_ds(ds, user_col: str = "user_id", ts_col: str = "ts",
                        num_partitions: int = 64):
    """Cohort retention matrix: users grouped by their first-activity
    day, counted on each subsequent day they were active →
    ``(cohort_day, day_offset, n_users)``.

    One user-keyed all-to-all: per-batch distinct ``(user, day)``
    combine, hash-partition by user (all of a user's days co-locate,
    so the first day and every offset are partition-local), vectorized
    run-length math per partition, then a final sum over the tiny
    (cohorts × offsets) cell table.  Distinct-user counts are exact —
    each user's rows live in exactly one partition, so per-partition
    cell counts never double-count."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    _US_PER_DAY = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        d = pc.floor_temporal(b[ts_col], unit="day")
        t = pa.table({user_col: b[user_col], "d": d})
        t = t.group_by([user_col, "d"], use_threads=False).aggregate([])
        uid = t[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "__p", pa.array((uid % num_partitions).astype(np.int32)))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.group_by([user_col, "d"], use_threads=False).aggregate([])
        t = t.sort_by([(user_col, "ascending"), ("d", "ascending")])
        uid = t[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        if len(uid) == 0:
            return pa.table({
                "cohort_day": pa.array([], pa.timestamp("us")),
                "day_offset": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64())})
        dv = t["d"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1])
        runlen = np.diff(np.concatenate([starts, [len(uid)]]))
        first = np.repeat(dv[starts], runlen)
        cells = pa.table({
            "cohort_day": pc.cast(pa.array(first, pa.int64()),
                                  pa.timestamp("us")),
            "day_offset": pa.array((dv - first) // _US_PER_DAY,
                                   pa.int64())})
        g = cells.group_by(["cohort_day", "day_offset"],
                           use_threads=False).aggregate([([], "count_all")])
        return pa.table({"cohort_day": g["cohort_day"],
                         "day_offset": g["day_offset"],
                         "n_users": pc.cast(g["count_all"], pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow") \
        .groupby(["cohort_day", "day_offset"]).aggregate(
            Sum("n_users", alias_name="n_users"))


def latest_event_ds(ds, by: str = "user_id", on: str = "ts",
                    tie: str = "event_id", num_partitions: int = 64):
    """Latest-wins snapshot (CDC upsert materialization): one row per
    key — the event with the maximum ``(on, tie)``.  The ``tie``
    column makes the pick deterministic under equal timestamps (the
    same rule the SQL twin encodes).

    Scale plan: per-batch combine first (sort the batch by
    ``(key, on desc, tie desc)``, keep the first row of each key run
    — at most one candidate per key per batch leaves the map), then
    one hash partition by key and the identical vectorized reduction
    per partition.  The shuffle moves candidates, never the raw
    stream."""
    import pyarrow.compute as pc

    def reduce_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        idx = pc.sort_indices(b, sort_keys=[(by, "ascending"),
                                            (on, "descending"),
                                            (tie, "descending")])
        b = b.take(idx)
        k = b[by].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
        return b.take(pa.array(starts))

    def tag(b: pa.Table) -> pa.Table:
        b = reduce_batch(b)
        k = b[by].combine_chunks().to_numpy(zero_copy_only=False)
        return b.append_column(
            "__p", pa.array((k % num_partitions).astype(np.int32)))

    def per_partition(t: pa.Table) -> pa.Table:
        return reduce_batch(t.drop_columns(["__p"]))

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow")

def session_intervals_ds(ds, gap_minutes: int = 30, by: str = "user_id",
                         on: str = "ts", tie: str = "event_id",
                         num_partitions: int = 64):
    """Per-user session INTERVALS (vs :func:`sessionize_ds`'s counts):
    one row per session with ``(user, sess ordinal, start_us, end_us,
    n_events)``.  A session breaks when the gap to the previous event
    of the same user exceeds ``gap_minutes``; event order under equal
    timestamps is fixed by ``tie`` so the split is deterministic (the
    SQL twin orders by the same ``(on, tie)``).

    One hash partition by user; the break scan inside a partition is a
    single vectorized pass over ALL users at once (user-change OR gap
    both break), no per-user Python."""
    import pyarrow.compute as pc

    from kgforge.functions.indexing import _segment_arange
    from kgforge.functions.joins import _part_codes

    gap_us = np.int64(gap_minutes) * np.int64(60_000_000)

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64()),
                      "__tie": b[tie]})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending"),
                                            ("__tie", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        u = t[by].combine_chunks()
        on_np = t["__on"].combine_chunks().to_numpy(zero_copy_only=False)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            same = pc.equal(u.slice(1), u.slice(0, n - 1)) \
                .to_numpy(zero_copy_only=False)
            brk[1:] = ~same | (np.diff(on_np) > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]])
        su = u.take(pa.array(starts))
        # sessions are sorted by user → within-user ordinal from runs
        ucodes = su.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        ufirst = np.concatenate(
            [[0], np.flatnonzero(ucodes[1:] != ucodes[:-1]) + 1]) \
            if len(ucodes) else np.zeros(0, dtype=np.int64)
        ulens = np.diff(np.concatenate([ufirst, [len(ucodes)]])) \
            if len(ucodes) else np.zeros(0, dtype=np.int64)
        return pa.table({
            by: su,
            "sess": pa.array(_segment_arange(ulens) + 1),
            "start_us": pa.array(on_np[starts]),
            "end_us": pa.array(on_np[ends - 1]),
            "n_events": pa.array((ends - starts).astype(np.int64)),
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow")


def interval_overlap_pairs_ds(iv_ds, by: str = "user_id",
                              sess: str = "sess",
                              start_col: str = "start_us",
                              end_col: str = "end_us"):
    """Interval-overlap SELF-join: every pair of intervals (a, b) with
    ``start_a <= end_b AND start_b <= end_a``, pair ordered
    ``(user, sess)``-lexicographically, with the exact overlap length.

    Banded plan (the classic time-bucket interval join): bucket width
    = global max interval duration + 1, so every interval spans at
    most TWO buckets; each interval is replicated to the buckets its
    span touches and a pair is counted only in the start bucket of its
    LATER-starting member (the earlier member overlaps that bucket by
    definition → both are present there, and the pair is attributed
    exactly once).  Within a bucket the candidate check is a chunked
    mask matrix over start-sorted rows, with the earlier-member side
    pruned per chunk to rows still open at the chunk's first start
    (``en_i >= st[j0]``) — so a hot bucket costs candidate-rows ×
    chunk, not k² (many co-located sessions share a bucket when one
    long interval sets the global width).  The interval table is the
    compacted session summary (orders of magnitude smaller than the
    event stream), so the single ``max`` pre-pass and the ≤2×
    replication are cheap."""
    import pyarrow.compute as pc

    iv = iv_ds.materialize()          # session summaries, not events

    def dur(b: pa.Table) -> pa.Table:
        d = pc.subtract(b[end_col], b[start_col])
        return pa.table({"d": pc.cast(d, pa.int64())})

    max_dur = iv.map_batches(dur, batch_format="pyarrow").max("d")
    if max_dur is None:               # empty interval set → empty result
        import ray.data as rd

        sch = iv.schema().base_schema
        return rd.from_arrow(pa.table({
            "user_a": pa.array([], sch.field(by).type),
            "sess_a": pa.array([], sch.field(sess).type),
            "user_b": pa.array([], sch.field(by).type),
            "sess_b": pa.array([], sch.field(sess).type),
            "overlap_us": pa.array([], pa.int64()),
        }))
    width = np.int64(int(max_dur) + 1)

    def replicate(b: pa.Table) -> pa.Table:
        st = b[start_col].combine_chunks().to_numpy(zero_copy_only=False)
        en = b[end_col].combine_chunks().to_numpy(zero_copy_only=False)
        b0 = st // width
        b1 = en // width
        reps = (b1 - b0 + 1).astype(np.int64)      # 1 or 2
        ridx = np.repeat(np.arange(len(st)), reps)
        bucket = np.repeat(b0, reps) + _iv_seg_arange(reps)
        out = b.take(pa.array(ridx))
        return out.append_column("bucket", pa.array(bucket))

    def pairs_of(t: pa.Table) -> pa.Table:
        bucket = int(t["bucket"][0].as_py())
        idx = pc.sort_indices(t, sort_keys=[(start_col, "ascending"),
                                            (by, "ascending"),
                                            (sess, "ascending")])
        t = t.take(idx)
        st = t[start_col].combine_chunks().to_numpy(zero_copy_only=False)
        en = t[end_col].combine_chunks().to_numpy(zero_copy_only=False)
        k = len(st)
        a_idx, b_idx = [], []
        chunk = 1024
        for j0 in range(0, k, chunk):
            j1 = min(j0 + chunk, k)
            # later member must START in this bucket (dedup rule)
            own = (st[j0:j1] // width) == bucket
            # earlier-member prune: st is sorted ascending, so only
            # rows i < j1 still open at st[j0] can pair with this chunk
            cand = np.flatnonzero(en[:j1] >= st[j0])
            if cand.size == 0:
                continue
            # candidates i < j in start order with end_i >= start_j
            m = (en[cand, None] >= st[None, j0:j1]) & own[None, :]
            tri = cand[:, None] < np.arange(j0, j1)[None, :]
            ii, jj = np.nonzero(m & tri)
            a_idx.append(cand[ii])
            b_idx.append(jj + j0)
        ai = np.concatenate(a_idx) if a_idx else np.zeros(0, np.int64)
        bi = np.concatenate(b_idx) if b_idx else np.zeros(0, np.int64)
        ov = np.minimum(en[ai], en[bi]) - np.maximum(st[ai], st[bi])
        ua, sa = t[by].take(pa.array(ai)), t[sess].take(pa.array(ai))
        ub, sb = t[by].take(pa.array(bi)), t[sess].take(pa.array(bi))
        # canonical pair order: (user, sess) of a < of b
        uan = ua.combine_chunks().to_numpy(zero_copy_only=False)
        ubn = ub.combine_chunks().to_numpy(zero_copy_only=False)
        san = sa.combine_chunks().to_numpy(zero_copy_only=False)
        sbn = sb.combine_chunks().to_numpy(zero_copy_only=False)
        swap = (uan > ubn) | ((uan == ubn) & (san > sbn))
        return pa.table({
            "user_a": pa.array(np.where(swap, ubn, uan)),
            "sess_a": pa.array(np.where(swap, sbn, san)),
            "user_b": pa.array(np.where(swap, uan, ubn)),
            "sess_b": pa.array(np.where(swap, san, sbn)),
            "overlap_us": pa.array(ov.astype(np.int64)),
        })

    return iv.map_batches(replicate, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs_of, batch_format="pyarrow")


def _iv_seg_arange(lens: np.ndarray) -> np.ndarray:
    tot = int(lens.sum())
    if tot == 0:
        return np.zeros(0, dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    return np.arange(tot, dtype=np.int64) - np.repeat(off, lens)


def hour_gaps_ds(ds, type_col: str = "event_type", on: str = "ts"):
    """Coverage-gap detection: for every event type, the epoch-hours
    BETWEEN its first and last active hour that saw zero events.
    Two-phase: per-batch distinct (type, hour) pairs (the only rows
    that shuffle), then one group per type computes
    ``setdiff(arange(min, max+1), present)`` vectorized.  Parallelism
    is the type cardinality — gaps are a per-series property, and each
    series' distinct-hour set is tiny (hours, not events)."""
    import pyarrow.compute as pc

    hour_us = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        hours = pc.divide(pc.cast(_on_key(b[on]), pa.int64()), hour_us)
        t = pa.table({type_col: b[type_col], "hour": hours})
        return t.group_by([type_col, "hour"], use_threads=False) \
            .aggregate([])

    from kgforge.functions.joins import _part_codes

    def add_p(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b[type_col], 64)))

    # final keyed by HASH PARTITION — P Ray callbacks; the per-series
    # setdiff loops IN-PROCESS over the partition's type runs (each a
    # tiny distinct-hours array), not one Ray task per series
    def gaps(t: pa.Table) -> pa.Table:
        t = t.sort_by([(type_col, "ascending"), ("hour", "ascending")])
        codes = t[type_col].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        hours = t["hour"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1]) \
            if len(codes) else np.zeros(0, dtype=np.int64)
        ends = np.concatenate([starts[1:], [len(codes)]]) \
            if len(codes) else np.zeros(0, dtype=np.int64)
        miss, owner = [], []
        for i in range(len(starts)):
            h = np.unique(hours[starts[i]:ends[i]])
            m = np.setdiff1d(np.arange(h[0], h[-1] + 1), h,
                             assume_unique=True)
            miss.append(m)
            owner.append(np.full(len(m), starts[i], dtype=np.int64))
        mv = np.concatenate(miss) if miss else np.zeros(0, np.int64)
        ov = np.concatenate(owner) if owner else np.zeros(0, np.int64)
        return pa.table({
            type_col: t[type_col].take(pa.array(ov)),
            "missing_hour": pa.array(mv.astype(np.int64)),
        })

    import ray.data as rd

    out_schema = pa.schema([(type_col, pa.string()),
                            ("missing_hour", pa.int64())])

    grouped = ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(
            lambda t: gaps(t.drop_columns(["__p"])),
            batch_format="pyarrow")
    # a gap-free input yields only 0-row blocks, which the groupby
    # internals emit COLUMN-LESS (and map stages skip empty blocks, so
    # they can't be coerced in-stream); union one typed empty block so
    # to_pandas()/write keep the contract schema even when empty
    return grouped.union(rd.from_arrow(out_schema.empty_table()))


def mode_per_key_ds(ds, key_col: str, val_col: str,
                    num_partitions: int = 64):
    """Exact per-key MODE with a deterministic tie rule (highest count,
    then smallest value).  Per-batch (key, value) count partials →
    one groupby on the pair (hot keys spread across reducers by value)
    → per-key argmax over the tiny (key × distinct-values) table.
    The stream never shuffles — only pair partials do."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b[key_col], val_col: b[val_col]})
        g = t.group_by([key_col, val_col], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({key_col: g[key_col], val_col: g[val_col],
                         "n": pc.cast(g["count_all"], pa.int64())})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([key_col, val_col]).aggregate(Sum("n", alias_name="n"))

    def argmax(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(key_col, "ascending"),
                                            ("n", "descending"),
                                            (val_col, "ascending")])
        t = t.take(idx)
        k = t[key_col].combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table({key_col: k, "mode": t[val_col],
                             "n": pc.cast(t["n"], pa.int64())})
        neq = pc.not_equal(k.slice(1), k.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        starts = pa.array(np.concatenate([[0], np.flatnonzero(neq) + 1]))
        t = t.take(starts)
        return pa.table({key_col: t[key_col], "mode": t[val_col],
                         "n": pc.cast(t["n"], pa.int64())})

    from kgforge.functions.joins import _part_codes

    def add_p(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b[key_col], num_partitions)))

    # the counts table is (keys × values) — re-keying it by HASH
    # PARTITION of the key is a shuffle of that small table, not of
    # the stream, and costs P callbacks, not one per key (argmax is
    # already vectorized across every key run in a partition)
    return counts.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(
            lambda t: argmax(t.drop_columns(["__p"])),
            batch_format="pyarrow")

def point_in_interval_ds(points_ds, iv_ds, by: str = "user_id",
                         on: str = "ts", point_id: str = "event_id",
                         sess: str = "sess",
                         start_col: str = "start_us",
                         end_col: str = "end_us"):
    """Point-in-interval join: label each point with the covering
    interval's id (typed-null when no interval of the same key covers
    it).  Composed from the as-of join — the covering interval is
    exactly the latest interval STARTING at or before the point
    (intervals of one key don't overlap), post-filtered by
    ``end >= point`` — so it inherits the as-of operator's whole scale
    contract (keyed salting, boundary carry, Arrow-typed nulls) for
    free.  Output: (key, point id, sess)."""
    import pyarrow.compute as pc

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({by: b[by], on: b[start_col],
                         sess: b[sess], end_col: b[end_col]})

    right = iv_ds.map_batches(prep, batch_format="pyarrow")
    j = asof_join_ds(points_ds, right, by=by, on=on,
                     left_cols=(point_id, on),
                     right_cols=(sess, end_col), tie_break=sess)

    def finish(b: pa.Table) -> pa.Table:
        pt = pc.cast(_on_key(b["l_" + on]), pa.int64())
        covered = pc.fill_null(
            pc.less_equal(pt, b["r_" + end_col]), False)
        lab = pc.if_else(covered, b["r_" + sess],
                         pa.nulls(b.num_rows,
                                  b["r_" + sess].type))
        return pa.table({by: b[by], point_id: b["l_" + point_id],
                         sess: lab})

    return j.map_batches(finish, batch_format="pyarrow")

def group_outliers_ds(ds, q: float = 0.99, by: str = "event_type",
                      value_col: str = "value", id_col: str = "event_id"):
    """Per-group outlier detection: rows whose value exceeds their own
    group's exact ``q``-quantile (same histogram plan + quantile rule
    as :func:`group_quantiles_ds`).  The threshold table is one row
    per group — a broadcast small side by construction — so the second
    pass is a pure map filter; the stream shuffles only (group, cents)
    histogram partials.  → (id, group, cents, p_cents)."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import round_away

    qkey = f"p{int(q * 100)}_cents"
    thr = {r[by]: r[qkey]
           for r in group_quantiles_ds(ds, qs=(q,), by=by,
                                       value_col=value_col).take_all()}

    def flag(b: pa.Table) -> pa.Table:
        cents = round_away(
            b[value_col].combine_chunks().to_numpy(zero_copy_only=False)
            * 100, 0).astype(np.int64)
        # threshold lookup once per DISTINCT group, fanned back out
        # over dictionary codes — no per-row Python
        enc = b[by].combine_chunks().dictionary_encode()
        per_code = np.array([thr.get(v, np.iinfo(np.int64).max)
                             for v in enc.dictionary.to_pylist()],
                            dtype=np.int64)
        lim = per_code[enc.indices.to_numpy(zero_copy_only=False)] \
            if len(per_code) else np.zeros(0, dtype=np.int64)
        keep = cents > lim
        ki = pa.array(np.flatnonzero(keep))
        return pa.table({
            id_col: b[id_col].take(ki),
            by: b[by].take(ki),
            "cents": pa.array(cents[keep]),
            qkey: pa.array(lim[keep]),
        })

    return ds.map_batches(flag, batch_format="pyarrow")

def group_corr_ds(ds, by: str = "event_type", x_col: str = "value",
                  y_expr: str = "hour_of_day"):
    """Per-group Pearson correlation (and sample covariance) between
    the value (integer cents) and the hour-of-day — the statistical
    aggregate family (SQL ``corr`` / ``covar_samp``), made value-exact:
    per-batch partials accumulate the five cross-moments as EXACT
    int64 sums (n, Σx, Σy, Σxy, Σx², Σy²), one tiny groupby sums them,
    and the final r/cov are computed from the exact integers with one
    fixed IEEE op order — the SQL twin spells out the identical
    formula over the identical integer sums, so the doubles match
    bit-for-bit (DuckDB's own ``corr()`` uses a different running
    recurrence and would not).

    Scale note: the int64 moments bound the supported domain to
    ``n · max(x)² < 2⁶³`` per group (fine for cents-scale values at
    10¹² rows; larger domains shard the moment into (hi, lo) pairs —
    not needed here)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    hour_us = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        x = round_away(
            b[x_col].combine_chunks().to_numpy(zero_copy_only=False)
            * 100, 0).astype(np.int64)
        h = pc.divide(pc.cast(_on_key(b["ts"]), pa.int64()), hour_us)
        y = pc.subtract(h, pc.multiply(pc.divide(h, 24), 24)) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({by: b[by], "n": pa.array(np.ones(len(x), np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxy": pa.array(x * y), "sxx": pa.array(x * x),
                      "syy": pa.array(y * y)})
        g = t.group_by([by], use_threads=False).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])
        return pa.table({by: g[by], **{c: g[f"{c}_sum"] for c in
                                       ("n", "sx", "sy", "sxy", "sxx",
                                        "syy")}})

    sums = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(by).aggregate(
            *[Sum(c, alias_name=c)
              for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])

    def finish(b: pa.Table) -> pa.Table:
        f = {c: b[c].combine_chunks().to_numpy(zero_copy_only=False)
             .astype(np.float64)
             for c in ("n", "sx", "sy", "sxy", "sxx", "syy")}
        cov_n = f["n"] * f["sxy"] - f["sx"] * f["sy"]
        vx = f["n"] * f["sxx"] - f["sx"] * f["sx"]
        vy = f["n"] * f["syy"] - f["sy"] * f["sy"]
        r = cov_n / (np.sqrt(vx) * np.sqrt(vy))
        covar = cov_n / (f["n"] * (f["n"] - 1.0))
        return pa.table({by: b[by],
                         "n": pc.cast(b["n"], pa.int64()),
                         "corr_r": pa.array(r),
                         "covar_samp": pa.array(covar)})

    return sums.map_batches(finish, batch_format="pyarrow")


def window_rank_ds(ds, by: str = "user_id", order_col: str = "value",
                   id_col: str = "event_id", num_partitions: int = 64):
    """The general SQL window-rank family in one pass: per key,
    ``row_number`` / ``rank`` / ``dense_rank`` over ``(cents DESC
    [, id])`` plus ``lag(cents)`` — the four ranking windows a
    feature-engineering pipeline reaches for.

    Plan: ONE shuffle keyed by HASH PARTITION of the key
    (``num_partitions`` Ray callbacks, never one per key).  Inside a
    partition every key is ranked at once — one sort by
    ``(key, cents desc, id)``, then pure index math over the key-run
    starts: row_number = position − run start; rank = start of the
    current equal-value run − key-run start; dense_rank = cumulative
    value-change count rebased per key run; lag = a shift with
    key-run firsts masked to a typed Arrow null.  No per-key Python
    anywhere; the order key is integer cents so rank boundaries are
    exact and the SQL twin orders by the identical integer."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        vc = round_away(
            b[order_col].combine_chunks().to_numpy(zero_copy_only=False)
            * 100, 0).astype(np.int64)
        t = pa.table({id_col: b[id_col], by: b[by],
                      "vc": pa.array(vc, pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("vc", "descending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             by: pa.array([], pa.int64()),
                             "rn": pa.array([], pa.int64()),
                             "rnk": pa.array([], pa.int64()),
                             "drnk": pa.array([], pa.int64()),
                             "prev_cents": pa.array([], pa.int64())})
        vc = t["vc"].combine_chunks().to_numpy(zero_copy_only=False)
        kbrk = _run_breaks(t[by].combine_chunks(),
                           np.zeros(n, dtype=np.int32))
        vbrk = kbrk.copy()
        vbrk[1:] |= vc[1:] != vc[:-1]
        pos = np.arange(n, dtype=np.int64)
        # start index of the enclosing key run / equal-value run
        kstart = np.maximum.accumulate(np.where(kbrk, pos, 0))
        vstart = np.maximum.accumulate(np.where(vbrk, pos, 0))
        rn = pos - kstart + 1
        rnk = vstart - kstart + 1
        vcum = np.cumsum(vbrk.astype(np.int64))
        drnk = vcum - vcum[kstart] + 1
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = vc[:-1]
        prev[0] = 0
        return pa.table({
            id_col: t[id_col], by: t[by],
            "rn": pa.array(rn), "rnk": pa.array(rnk),
            "drnk": pa.array(drnk),
            "prev_cents": pa.array(prev, pa.int64(), mask=kbrk),
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow")


def event_sequences_ds(ds, by: str = "user_id", on: str = "ts",
                       id_col: str = "event_id",
                       type_col: str = "event_type", sep: str = ">",
                       num_partitions: int = 64):
    """Per-user ordered behavior sequence — the training-data
    "behavior sequence" builder: each user's events sorted by
    ``(on, id)`` (the id tie-break makes equal-timestamp order
    deterministic) and their types joined into one string, plus the
    event count.  Equivalent to
    ``string_agg(event_type, sep ORDER BY ts, event_id) GROUP BY user``.

    ONE shuffle keyed by HASH PARTITION of the user (``num_partitions``
    Ray callbacks, never one per user); inside a partition every
    user's join happens at once — the sorted type column is wrapped as
    a ListArray over per-user run offsets and joined with one
    ``pc.binary_join`` C call.  A pathological single user holding a
    cluster-sized event history would pin one task — the same
    documented hot-key contract as ``asof_join_ds``; sequences that
    long are not useful training rows, so callers cap upstream."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64()),
                      id_col: b[id_col], type_col: b[type_col]})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def seq(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        brk = _run_breaks(t[by].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        starts = np.flatnonzero(brk)
        offsets = np.concatenate([starts, [n]]).astype(np.int32)
        types = t[type_col].combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         types)
        return pa.table({
            by: t[by].take(pa.array(starts)),
            "seq": pc.binary_join(lists, sep),
            "n_events": pa.array(
                np.diff(np.concatenate([starts, [n]])).astype(np.int64)),
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(seq, batch_format="pyarrow")


def event_transitions_ds(ds, by: str = "user_id", on: str = "ts",
                         id_col: str = "event_id",
                         type_col: str = "event_type",
                         num_partitions: int = 64) -> pa.Table:
    """First-order Markov transition matrix of event types: counts of
    consecutive (prev → next) pairs within each user's deterministic
    ``(on, id)`` order, plus the exact integer transition probability
    ``p_ppm = n × 10⁶ // Σ n(prev, ·)``.  Returns the collected
    |types|²-row matrix as a typed Arrow table.

    Scale shape: ONE user-hash shuffle (the partitioned-merge
    contract); inside a partition the pair stream is two shifted
    views of the sorted type column with user-run breaks masked out —
    all users at once — collapsed to (prev, next) partials before the
    tiny pair-keyed sum.  The ppm division happens on the collected
    matrix (≤ |types|² rows on the driver)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64()),
                      id_col: b[id_col], type_col: b[type_col]})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        empty = pa.table({"prev_type": pa.array([], pa.string()),
                          "next_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        n = t.num_rows
        if n < 2:
            return empty
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        users = t[by].combine_chunks()
        same_user = pc.equal(users.slice(1), users.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        types = t[type_col].combine_chunks()
        pairs = pa.table({"prev_type": types.slice(0, n - 1),
                          "next_type": types.slice(1)}) \
            .filter(pa.array(same_user))
        if pairs.num_rows == 0:
            return empty
        g = pairs.group_by(["prev_type", "next_type"],
                           use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"prev_type": g["prev_type"],
                         "next_type": g["next_type"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    summed = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby(["prev_type", "next_type"]) \
        .aggregate(Sum("n", alias_name="n"))
    tabs = [t for t in ray.get(summed.to_arrow_refs())
            if t.num_columns]
    if not tabs:
        return pa.table({"prev_type": pa.array([], pa.string()),
                         "next_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "p_ppm": pa.array([], pa.int64())})
    m = pa.concat_tables(tabs).to_pandas()
    tot = m.groupby("prev_type")["n"].transform("sum").to_numpy(np.int64)
    nn = m["n"].to_numpy(np.int64)
    return pa.table({
        "prev_type": pa.array(m["prev_type"], pa.string()),
        "next_type": pa.array(m["next_type"], pa.string()),
        "n": pa.array(nn),
        "p_ppm": pa.array(nn * 1_000_000 // tot)})


def time_weighted_avg_ds(ds, by: str = "user_id", on: str = "ts",
                         id_col: str = "event_id",
                         value_col: str = "value",
                         num_partitions: int = 64):
    """Per-key time-weighted average of a cents-scaled signal
    (trapezoidal rule over the deterministic ``(on, id)`` order) in
    EXACT integer math: ``twa_cents = Σ (cᵢ + cᵢ₊₁)(tᵢ₊₁ − tᵢ) //
    (2 (t_last − t_first))``.  Keys with < 2 events (or zero elapsed
    time) are excluded — same rule in the SQL twin.  The metering /
    billing aggregate (average concurrent load, average balance).

    Scale shape: one key-hash partitioned merge; inside a partition
    the trapezoid terms are one shifted-view product over ALL keys
    with run breaks masked, reduced per key by ``np.add.reduceat`` —
    no per-key Python, values positive-bounded so the int64 budget is
    cents × µs × run (≲ 10¹⁶ per key-year)."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        v = b[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64()),
                      id_col: b[id_col],
                      "c": pa.array(round_away(v * 100, 0)
                                    .astype(np.int64))})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        empty = pa.table({by: pa.array([], t.schema.field(by).type),
                          "twa_cents": pa.array([], pa.int64())})
        n = t.num_rows
        if n < 2:
            return empty
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        keys = t[by].combine_chunks()
        same = pc.equal(keys.slice(1), keys.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        ts = t["__on"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        term = (c[1:] + c[:-1]) * (ts[1:] - ts[:-1])
        term = np.where(same, term, 0)
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
        ends = np.concatenate([starts[1:], [n]])
        # per-key trapezoid sum over the n-1 term array
        csum = np.concatenate([[0], np.cumsum(term)])
        num = csum[ends - 1] - csum[starts]
        den = 2 * (ts[ends - 1] - ts[starts])
        keep = den > 0
        ki = pa.array(starts[keep])
        return pa.table({by: keys.take(ki),
                         "twa_cents": pa.array(num[keep] // den[keep])})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow")


def group_share_ds(ds, by: str, value_col: str, id_col: str,
                   num_partitions: int = 64):
    """Within-group share of a cents-scaled value in exact integer
    ppm — the ``100 × v / SUM(v) OVER (PARTITION BY key)`` window
    without a window engine: one key-hash partitioned merge; per
    partition the group totals are one ``np.add.reduceat`` over run
    offsets, repeated back onto rows for the ppm division.  Output
    (id, key, cents, share_ppm); zero-total groups emit share 0."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        v = b[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({id_col: b[id_col], by: b[by],
                      "cents": pa.array(round_away(v * 100, 0)
                                        .astype(np.int64))})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             by: pa.array([], t.schema.field(by).type),
                             "cents": pa.array([], pa.int64()),
                             "share_ppm": pa.array([], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        keys = t[by].combine_chunks()
        if n > 1:
            neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)) \
                .to_numpy(zero_copy_only=False)
            starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        else:
            starts = np.zeros(1, dtype=np.int64)
        lens = np.diff(np.concatenate([starts, [n]]))
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        tot = np.repeat(np.add.reduceat(c, starts), lens)
        share = np.where(tot != 0, c * 1_000_000 // np.where(tot == 0,
                                                             1, tot), 0)
        return pa.table({id_col: t[id_col], by: keys,
                         "cents": t["cents"],
                         "share_ppm": pa.array(share)})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow")


def trimmed_mean_ds(ds, by: str = "event_type", value_col: str = "value",
                    lo_decile: int = 1, hi_decile: int = 8) -> pa.Table:
    """Robust per-group mean: drop each group's tail deciles by the
    EXACT integer rank rule (keep rows with ``rank_lt × 10 // n`` in
    [lo, hi]; rank_lt = strictly-smaller count, ties share a bucket)
    and return ``(group, n_kept, trimmed_mean_cents)`` with the mean
    as a truncating integer quotient — the outlier-robust signal
    statistic, bit-stable across engines.

    Scale shape: per-group VALUE HISTOGRAMS (distinct cents — domain-
    bounded) through one keyed sum; per-group cumsum on the collected
    histogram gives both the decile bounds and the kept-range sums
    directly — rows never move, and no second pass is needed (sum of
    kept values = Σ value × count over the kept histogram slice)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def hist_partial(b: pa.Table) -> pa.Table:
        v = b[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({by: b[by],
                      "c": pa.array(round_away(v * 100, 0)
                                    .astype(np.int64)),
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by([by, "c"], use_threads=False).aggregate(
            [("n", "sum")])
        return g.rename_columns([by, "c", "n"])

    hist = ds.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby([by, "c"]).aggregate(Sum("n", alias_name="n"))
    tabs = [t for t in ray.get(hist.to_arrow_refs()) if t.num_columns]
    if not tabs:
        return pa.table({by: pa.array([], pa.string()),
                         "n_kept": pa.array([], pa.int64()),
                         "trimmed_mean_cents": pa.array([], pa.int64())})
    h = pa.concat_tables(tabs).to_pandas() \
        .sort_values([by, "c"]).reset_index(drop=True)
    out_g, out_n, out_m = [], [], []
    for key, grp in h.groupby(by, sort=True):
        c = grp["c"].to_numpy(np.int64)
        n = grp["n"].to_numpy(np.int64)
        tot = int(n.sum())
        rank_lt = np.concatenate([[0], np.cumsum(n)[:-1]])
        dec = rank_lt * 10 // tot
        keep = (dec >= lo_decile) & (dec <= hi_decile)
        kn = int(n[keep].sum())
        if kn == 0:
            continue
        ks = int((c[keep] * n[keep]).sum())
        q = abs(ks) // kn          # truncate toward zero (DuckDB //)
        out_g.append(key)
        out_n.append(kn)
        out_m.append(q if ks >= 0 else -q)
    return pa.table({by: pa.array(out_g, pa.string()),
                     "n_kept": pa.array(out_n, pa.int64()),
                     "trimmed_mean_cents": pa.array(out_m, pa.int64())})


def gini_by_type_ds(ds, by: str = "event_type",
                    value_col: str = "value") -> pa.Table:
    """Per-group Gini concentration of positive values, exact integer
    ppm: over ascending cents ``G = (2·Σ i·x_i − (n+1)·Σx) · 10⁶ //
    (n·Σx)`` with row_number ranks (tied cents carry identical values,
    so any within-tie order yields the same Σ i·x_i — deterministic
    without a tie-break column).

    Scale shape: per-group VALUE HISTOGRAMS (distinct cents —
    domain-bounded) through one keyed sum; the rank-weighted sum comes
    from the histogram cumsum (the run of n_c ranks at value c
    contributes ``c·(n_c·cum_prev + n_c(n_c+1)/2)``) — rows never
    move.  Final quotient in Python ints (2·ric·10⁶ can exceed int64;
    DuckDB's HUGEINT sums need the same headroom)."""
    import ray
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def hist_partial(b: pa.Table) -> pa.Table:
        v = b[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        keep = v > 0
        t = pa.table({by: b[by].combine_chunks().filter(pa.array(keep)),
                      "c": pa.array(round_away(v[keep] * 100, 0)
                                    .astype(np.int64)),
                      "n": pa.array(np.ones(int(keep.sum()), np.int64))})
        g = t.group_by([by, "c"], use_threads=False).aggregate(
            [("n", "sum")])
        return g.rename_columns([by, "c", "n"])

    hist = ds.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby([by, "c"]).aggregate(Sum("n", alias_name="n"))
    tabs = [t for t in ray.get(hist.to_arrow_refs()) if t.num_columns]
    empty = pa.table({by: pa.array([], pa.string()),
                      "n": pa.array([], pa.int64()),
                      "gini_ppm": pa.array([], pa.int64())})
    if not tabs:
        return empty
    h = pa.concat_tables(tabs).to_pandas() \
        .sort_values([by, "c"]).reset_index(drop=True)
    out_g, out_n, out_p = [], [], []
    for key, grp in h.groupby(by, sort=True):
        c = grp["c"].tolist()
        n = grp["n"].tolist()
        tot = ric = 0
        cum = 0                      # ranks already assigned
        for ci, ni in zip(c, n):
            ric += ci * (ni * cum + ni * (ni + 1) // 2)
            tot += ci * ni
            cum += ni
        if tot == 0:
            continue
        out_g.append(key)
        out_n.append(cum)
        out_p.append((2 * ric - (cum + 1) * tot) * 1_000_000
                     // (cum * tot))
    return pa.table({by: pa.array(out_g, pa.string()),
                     "n": pa.array(out_n, pa.int64()),
                     "gini_ppm": pa.array(out_p, pa.int64())})


def fano_by_type_ds(ds, by: str = "event_type", on: str = "ts") -> pa.Table:
    """Burstiness (Fano factor) per event type: variance-to-mean ratio
    of hourly event counts over the type's ACTIVE hours, exact integer
    ppm ``(H·Σk² − n²) · 10⁶ // (n·H)`` (numerator ≥ 0 by
    Cauchy–Schwarz, so floor == truncate).

    Scale shape: per-batch (type, hour) count partials → ONE keyed sum
    (≤ types × hours rows — time-bounded, not event-bounded) → per-type
    moment partials fold through a second tiny keyed sum; the final
    quotient runs on the collected ≤|types|-row table in Python ints
    (10⁶-scaled products exceed int64 headroom at 10¹² events)."""
    import ray
    from ray.data.aggregate import Sum

    hour_us = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        ts = b[on].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = pa.table({by: b[by], "h": pa.array(ts // hour_us),
                      "k": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by([by, "h"], use_threads=False).aggregate(
            [("k", "sum")])
        return g.rename_columns([by, "h", "k"])

    def moments(b: pa.Table) -> pa.Table:
        k = b["k"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({by: b[by], "hours": pa.array(
            np.ones(b.num_rows, np.int64)),
            "n": pa.array(k), "kk": pa.array(k * k)})
        g = t.group_by(by, use_threads=False).aggregate(
            [("hours", "sum"), ("n", "sum"), ("kk", "sum")])
        return g.rename_columns([by, "hours", "n", "kk"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "h"]).aggregate(Sum("k", alias_name="k")) \
        .map_batches(moments, batch_format="pyarrow") \
        .groupby(by).aggregate(Sum("hours", alias_name="hours"),
                               Sum("n", alias_name="n"),
                               Sum("kk", alias_name="kk"))
    tabs = [t for t in ray.get(agg.to_arrow_refs()) if t.num_columns]
    if not tabs:
        return pa.table({by: pa.array([], pa.string()),
                         "hours": pa.array([], pa.int64()),
                         "fano_ppm": pa.array([], pa.int64())})
    m = pa.concat_tables(tabs).to_pandas().sort_values(by)
    fano = [(int(h) * int(kk) - int(n) * int(n)) * 1_000_000
            // (int(n) * int(h))
            for h, n, kk in zip(m["hours"], m["n"], m["kk"])]
    return pa.table({by: pa.array(m[by].tolist(), pa.string()),
                     "hours": pa.array(m["hours"].tolist(), pa.int64()),
                     "fano_ppm": pa.array(fano, pa.int64())})


def key_gap_dist_ds(ds, by: str = "user_id", on: str = "ts",
                    tie: str = "event_id",
                    unit_us: int = 86_400_000_000,
                    num_partitions: int = 64):
    """Inter-arrival gap distribution: for every key, the unit-floored
    gaps between consecutive records (lag-window shape), histogrammed
    globally — reorder cadence over orders, revisit cadence over
    events.  Gap = ``floor(on/unit) − floor(prev_on/unit)`` (DuckDB
    ``date_diff`` semantics: boundary crossings, not elapsed time).

    Scale shape: ONE shuffle by ``hash(key) % P``; each partition
    sorts (key, on, tie) once and diffs adjacent same-key rows
    vectorized, emitting (gap, n) HISTOGRAM partials — the global
    keyed sum moves gap-domain rows, never records."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    MIX = np.uint64(0x9E3779B97F4A7C15)
    P = np.uint64(num_partitions)

    def tag(b: pa.Table) -> pa.Table:
        k = b[by].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            p = (((k * MIX) >> np.uint64(32)) % P).astype(np.int32)
        return pa.table({"__p": pa.array(p), by: b[by],
                         "__on": b[on].combine_chunks()
                         .cast(pa.int64()),
                         "__tie": b[tie]})

    empty = pa.table({"gap_days": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            (by, "ascending"), ("__on", "ascending"),
            ("__tie", "ascending")])
        t = t.take(idx)
        if t.num_rows < 2:
            return empty
        k = t[by].combine_chunks().to_numpy(zero_copy_only=False)
        day = t["__on"].combine_chunks().to_numpy(
            zero_copy_only=False) // unit_us
        same = k[1:] == k[:-1]
        gaps = (day[1:] - day[:-1])[same]
        if not len(gaps):
            return empty
        vc = pa.array(gaps).value_counts()
        return pa.table({"gap_days": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("gap_days").aggregate(Sum("n", alias_name="n")) \
        .sort("gap_days")


def mad_outliers_ds(ds, by: str = "event_type", value_col: str = "value",
                    num_partitions: int = 64):
    """Robust per-group outlier census via the Median Absolute
    Deviation, ENTIRELY in exact integers: per group,
    ``med2 = x_lo + x_hi`` (the two central order statistics — 2× the
    median, so even counts stay integral), per-row deviation
    ``d = |2·x − med2|`` and ``mad4 = d_lo + d_hi`` (4× the MAD);
    a row is an outlier iff ``2·d > 3·mad4`` ⇔ |x − med| > 3·MAD.

    Scale shape: the same VALUE-HISTOGRAM exchange as
    :func:`group_quantiles_ds` — per-batch (group, cents, n) count
    partials, ONE shuffle keyed hash(group) % P, and the whole
    median → deviation-histogram → MAD → outlier-count chain runs
    inside each partition as vectorized passes over ALL groups at
    once (rank picks are ``searchsorted`` into the partition cumsum;
    the deviation histogram is a relabel + re-sort of the value
    histogram, never of events).  The shuffle carries distinct
    (group, cents) counts — events never move."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import _part_codes

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            by: df[by],
            "cents": round_away(df[value_col] * 100, 0).astype("int64"),
        }).groupby([by, "cents"], as_index=False).size() \
          .rename(columns={"size": "n"})
        return out.assign(__p=_part_codes(
            pa.array(out[by].to_numpy()), num_partitions))

    counts = ds.map_batches(partial, batch_format="pandas")

    def _central_pair(vals: np.ndarray, n_arr: np.ndarray,
                      starts: np.ndarray) -> tuple[np.ndarray, ...]:
        """Per run of a (group, value)-sorted histogram: the sum of
        the order statistics at indices (n−1)//2 and n//2, plus the
        run totals — one cumsum + two searchsorteds for all groups."""
        csum = np.cumsum(n_arr)
        base = csum[starts] - n_arr[starts]
        ntot = np.add.reduceat(n_arr, starts)
        lo = np.searchsorted(csum, base + (ntot - 1) // 2 + 1)
        hi = np.searchsorted(csum, base + ntot // 2 + 1)
        return vals[lo] + vals[hi], ntot

    def analyze(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__p"]) \
            .group_by([by, "cents"], use_threads=False) \
            .aggregate([("n", "sum")])
        if t.num_rows == 0:
            return pa.table({by: pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64()),
                             "med2_cents": pa.array([], pa.int64()),
                             "mad4_cents": pa.array([], pa.int64()),
                             "n_outliers": pa.array([], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("cents", "ascending")])
        t = t.take(idx)
        cents = t["cents"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_arr = t["n_sum"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        brk = _run_breaks(t[by].combine_chunks(),
                          np.zeros(t.num_rows, dtype=np.int32))
        starts = np.flatnonzero(brk)
        run_of = np.cumsum(brk) - 1
        med2, ntot = _central_pair(cents, n_arr, starts)

        # deviation histogram: relabel each (group, cents) bucket to
        # (group, |2·cents − med2|) and re-sort — two cents values may
        # collapse onto one deviation, which the rank math absorbs
        # because csum only needs sorted order, not distinctness
        d = np.abs(2 * cents - med2[run_of])
        order = np.lexsort((d, run_of))
        mad4, _ = _central_pair(
            d[order], n_arr[order],
            np.flatnonzero(np.concatenate(
                [[True], run_of[order][1:] != run_of[order][:-1]])))
        out_mask = 2 * d > 3 * mad4[run_of]
        n_out = np.add.reduceat(np.where(out_mask, n_arr, 0), starts)
        return pa.table({
            by: t[by].take(pa.array(starts)),
            "n_events": pa.array(ntot),
            "med2_cents": pa.array(med2),
            "mad4_cents": pa.array(mad4),
            "n_outliers": pa.array(n_out)})

    return counts.groupby("__p").map_groups(analyze,
                                            batch_format="pyarrow")


def session_length_dist_ds(ds, gap_minutes: int = 30,
                           by: str = "user_id", on: str = "ts",
                           num_partitions: int = 64):
    """Histogram of session lengths (events per session, 30-minute
    inactivity rule) → (session_len, n_sessions).

    Scale shape: the :func:`sessionize_ds` partition pass — ONE
    hash(user) % P shuffle, vectorized break scan over all users at
    once — but emitting a per-partition length HISTOGRAM (session
    lengths via diff over session starts, then one ``np.unique``);
    the final keyed sum sees ≤ distinct-lengths × P rows.  Length
    ties at equal timestamps are order-free: permuting equal ``on``
    values leaves the consecutive-gap sequence unchanged, so both
    engines land on identical histograms."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    gap_us = np.int64(gap_minutes) * np.int64(60_000_000)

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return pa.table({"session_len": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        on_np = t["__on"].combine_chunks().to_numpy(zero_copy_only=False)
        sbrk = _run_breaks(t[by].combine_chunks(),
                           np.zeros(n, dtype=np.int32))
        if n > 1:
            sbrk[1:] |= np.diff(on_np) > gap_us
        s_starts = np.flatnonzero(sbrk)
        lens = np.diff(np.concatenate([s_starts, [n]])).astype(np.int64)
        uniq, cnt = np.unique(lens, return_counts=True)
        return pa.table({"session_len": pa.array(uniq),
                         "n": pa.array(cnt.astype(np.int64))})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("session_len").aggregate(Sum("n", alias_name="n_sessions"))


def first_touch_ds(ds, conv_type: str = "purchase",
                   window_us: int = 7 * 86_400_000_000,
                   by: str = "user_id", on: str = "ts",
                   type_col: str = "event_type",
                   id_col: str = "event_id",
                   num_partitions: int = 64):
    """First-touch attribution: for every conversion event
    (``conv_type``), the type of the user's EARLIEST event inside the
    lookback window ``[conv.on − window, conv)`` — "before" is the
    total order (ts, id), so equal-timestamp ties are deterministic —
    aggregated to (first_touch, n_conversions); conversions with no
    prior touch report ``(direct)``.

    Scale shape: ONE hash(user) % P shuffle of (user, ts, id, type)
    plus one synthetic QUERY row per conversion (value = ts − window).
    Inside a partition a single lexsort merges queries and events;
    the count of events before each query (one cumsum) IS the
    window-start rank, and the k-th query of a run pairs with the
    k-th conversion event (subtracting a constant preserves the
    (ts, id) order) — no per-key searchsorted loop at any altitude.
    Per-partition (type, n) partials reach the final keyed sum."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    win = np.int64(window_us)

    def tag(b: pa.Table) -> pa.Table:
        onv = pc.cast(_on_key(b[on]), pa.int64())
        ev = pa.table({by: b[by], "__v": onv,
                       "__id": pc.cast(b[id_col], pa.int64()),
                       "__ty": b[type_col],
                       "__side": pa.array(
                           np.ones(b.num_rows, np.int8))})
        conv = pc.equal(b[type_col], conv_type)
        q = ev.filter(conv)
        q = pa.table({by: q[by],
                      "__v": pc.subtract(q["__v"], pa.scalar(
                          int(win), pa.int64())),
                      "__id": q["__id"], "__ty": q["__ty"],
                      "__side": pa.array(
                          np.zeros(q.num_rows, np.int8))})
        t = pa.concat_tables([ev, q])
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def merge(t: pa.Table) -> pa.Table:
        empty = pa.table({"first_touch": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        n = t.num_rows
        if n == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[
            (by, "ascending"), ("__v", "ascending"),
            ("__side", "ascending"), ("__id", "ascending")])
        t = t.take(idx)
        side = t["__side"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        ty = t["__ty"].combine_chunks()
        is_evt = side == 1
        evt_cum = np.cumsum(is_evt.astype(np.int64))
        brk = _run_breaks(t[by].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        run_of = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        # events strictly before each run's first row
        base = (evt_cum - is_evt.astype(np.int64))[starts]
        qpos = np.flatnonzero(side == 0)
        if len(qpos) == 0:
            return empty
        lo_rel = evt_cum[qpos] - base[run_of[qpos]]
        # conversion events, in merged order — k-th query of a run
        # pairs with the k-th conversion event of the same run
        is_conv = pc.and_(pc.equal(t["__ty"], conv_type),
                          pa.array(is_evt)).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cpos = np.flatnonzero(is_conv)
        i_rel = (evt_cum[cpos] - 1) - base[run_of[cpos]]
        epos = np.flatnonzero(is_evt)
        have = lo_rel < i_rel
        touch_idx = epos[base[run_of[qpos[have]]] + lo_rel[have]]
        touch = ty.take(pa.array(touch_idx)).to_pylist()
        names = touch + ["(direct)"] * int((~have).sum())
        g = pa.table({"first_touch": pa.array(names, pa.string()),
                      "n": pa.array(np.ones(len(names), np.int64))}) \
            .group_by(["first_touch"], use_threads=False) \
            .aggregate([("n", "sum")])
        return pa.table({"first_touch": g["first_touch"],
                         "n": g["n_sum"]})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(merge, batch_format="pyarrow") \
        .groupby("first_touch").aggregate(
            Sum("n", alias_name="n_conversions"))


def scd_intervals_ds(ds, by: str = "user_id", on: str = "ts",
                     value_col: str = "value",
                     id_col: str = "event_id",
                     num_partitions: int = 64):
    """SCD-type-2 validity intervals from an event stream: each event
    opens an interval ``[ts, next_ts)`` holding its value (exact
    cents); the user's latest event stays open (Arrow-typed NULL end,
    no NaN round-trip).  The ``lead() OVER (PARTITION BY user ORDER BY
    ts, id)`` window as one hash-partition shuffle
    (``num_partitions`` callbacks, never one per user) + a global
    shifted-copy pass with run-break masking — all users at once, no
    per-key Python."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        cents = round_away(
            b[value_col].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        t = pa.table({id_col: b[id_col], by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64()),
                      "cents": pa.array(cents)})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        us = t["__on"].combine_chunks().to_numpy(zero_copy_only=False)
        lead = np.zeros(n, dtype=np.int64)
        if n > 1:
            lead[:-1] = us[1:]
        brk = _run_breaks(t[by].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        last = np.concatenate([brk[1:], [True]]) if n else brk
        return pa.table({
            by: t[by],
            "start_us": pa.array(us, pa.int64()),
            "end_us": pa.array(lead, pa.int64(), mask=last),
            "value_cents": t["cents"],
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow")


def markov_stationary_ds(ds, iters: int = 4, by: str = "user_id",
                         on: str = "ts", id_col: str = "event_id",
                         type_col: str = "event_type",
                         num_partitions: int = 64) -> pa.Table:
    """Integer-deterministic power iteration toward the stationary
    distribution of the first-order event-type Markov chain: start
    every type at 10⁶ micro-units and apply ``w'(j) = Σ_i w(i) ·
    n(i,j) // tot(i)`` with PER-EDGE floor division ``iters`` times —
    order-free, so both engines land on identical int64s (mass at
    dead-end types simply stalls, mirroring the SQL twin's LEFT
    JOIN).  Scale shape: the only big-data pass is
    :func:`event_transitions_ds`'s one user-hash shuffle; the
    iteration runs on the collected |types|²-row matrix plus the
    distinct-type list (both type-vocabulary-bounded)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    mat = event_transitions_ds(ds, by=by, on=on, id_col=id_col,
                               type_col=type_col,
                               num_partitions=num_partitions)
    types = sorted(
        r[type_col] for r in
        ds.map_batches(
            lambda b: pa.table(
                {type_col: b[type_col].combine_chunks().unique()}),
            batch_format="pyarrow")
        .groupby(type_col).aggregate(Count(alias_name="__c"))
        .take_all())

    prev = mat["prev_type"].to_pylist()
    nxt = mat["next_type"].to_pylist()
    n = mat["n"].to_pylist()
    tot: dict[str, int] = {}
    for p, c in zip(prev, n):
        tot[p] = tot.get(p, 0) + int(c)
    w = {t: 1_000_000 for t in types}
    for _ in range(iters):
        nw = {t: 0 for t in types}
        for p, x, c in zip(prev, nxt, n):
            nw[x] += w[p] * int(c) // tot[p]
        # dead-end types (no outgoing row) keep their mass
        for t in types:
            if t not in tot:
                nw[t] += w[t]
        w = nw
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "weight": pa.array([w[t] for t in types], pa.int64())})


def late_events_ds(ds, by: str = "user_id", on: str = "ts",
                   id_col: str = "event_id",
                   num_partitions: int = 64):
    """Out-of-order-arrival report (the streaming watermark QA): per
    user, how many events arrived late — arrival order is ``id`` asc,
    and an event is late when its ``ts`` is below the running max of
    the user's earlier arrivals (``max(ts) OVER (... ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)``).  One user-hash shuffle; inside a
    partition the segmented running max is a log₂(n)-pass vectorized
    doubling scan over ALL users at once (no per-key Python, no
    per-run offset arithmetic that could overflow on epoch-µs
    values), then one ``reduceat`` per user run."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({id_col: b[id_col], by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        us = t["__on"].combine_chunks().to_numpy(zero_copy_only=False)
        brk = _run_breaks(t[by].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        starts = np.flatnonzero(brk)
        lens = np.diff(np.concatenate([starts, [n]]))
        seg_start = np.repeat(starts, lens)
        cm = us.copy()
        pos = np.arange(n, dtype=np.int64)
        shift = 1
        while shift < n:
            can = pos - shift >= seg_start
            src = np.where(can, cm[np.maximum(pos - shift, 0)],
                           np.int64(-(2 ** 62)))
            cm = np.maximum(cm, src)
            shift <<= 1
        prev = np.concatenate([[np.int64(0)], cm[:-1]]) if n else cm
        late = (~brk) & (us < prev)
        n_late = np.add.reduceat(late.astype(np.int64), starts) \
            if n else np.zeros(0, np.int64)
        return pa.table({
            by: t[by].take(pa.array(starts)),
            "n_events": pa.array(lens.astype(np.int64)),
            "n_late": pa.array(n_late)})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow")


def window_funnel_ds(ds, steps=("view", "click", "purchase"),
                     window_us: int = 6 * 3_600_000_000,
                     by: str = "user_id", type_col: str = "event_type",
                     on: str = "ts", num_partitions: int = 64):
    """Windowed funnel (the ClickHouse ``windowFunnel`` shape): per
    level k, how many users completed steps 0..k-1 on STRICTLY
    increasing timestamps with the whole chain inside ``window_us`` of
    its first step (counts are cumulative — level k counts users whose
    max level ≥ k).  Greedy earliest-next from every step-0 event is
    exact: for a fixed start, the earliest valid successor dominates
    any later choice.

    One user-hash shuffle; per partition each step's events form one
    (user, ts)-sorted structured array and every chain extension is
    ONE vectorized ``np.searchsorted`` of all live starts against the
    next step's array — no per-user or per-event Python.  Only
    per-partition level counters leave the shuffle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    steps = tuple(steps)
    K = len(steps)

    def tag(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[type_col],
                        value_set=pa.array(steps, pa.string()))
        t = pa.table({by: b[by].filter(mask),
                      type_col: b[type_col].filter(mask),
                      "__on": pc.cast(_on_key(b[on].filter(mask)),
                                      pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending")])
        t = t.take(idx)
        ucodes = t[by].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        us = t["__on"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = t[type_col].to_pylist()
        sarrs = []
        for s in steps:
            m = np.array([x == s for x in ty], dtype=bool)
            a = np.empty(int(m.sum()), dtype=[("u", "<i8"),
                                              ("t", "<i8")])
            a["u"], a["t"] = ucodes[m], us[m]
            sarrs.append(a)
        # live starts: one record per step-0 event
        live = sarrs[0].copy()
        start_t = live["t"].copy()
        # level >= 1 users = users with any step-0 event
        reached = [np.unique(live["u"])]
        for k in range(1, K):
            nxt = sarrs[k]
            if len(live) == 0 or len(nxt) == 0:
                reached.extend([np.zeros(0, np.int64)] * (K - k))
                break
            pos = np.searchsorted(nxt, live, side="right")
            ok = pos < len(nxt)
            posc = np.minimum(pos, len(nxt) - 1)
            ok &= nxt["u"][posc] == live["u"]
            ok &= nxt["t"][posc] - start_t <= window_us
            live = nxt[posc[ok]].copy()
            start_t = start_t[ok]
            reached.append(np.unique(live["u"]))
        out_lvl, out_n = [], []
        for k, users in enumerate(reached, start=1):
            out_lvl.append(k)
            out_n.append(len(users))
        return pa.table({
            "level": pa.array(out_lvl, pa.int64()),
            "n_users": pa.array(out_n, pa.int64())})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("level").aggregate(Sum("n_users",
                                        alias_name="n_users"))


def peak_concurrency_ds(ds, gap_minutes: int = 30,
                        by: str = "user_id", on: str = "ts",
                        num_partitions: int = 64) -> pa.Table:
    """Peak number of simultaneously-active user sessions (inclusive
    [start, end] intervals from the shared ``gap_minutes``
    sessionization) plus the earliest microsecond at which the peak
    is reached and the total session count — one exact-integer row
    ``(peak, peak_t_us, n_sessions)``.

    Plan: (1) session intervals form in user-hash partitions (the
    :func:`sessionize_ds` break scan, but emitting (start, end) per
    session); (2) ±1 boundary deltas collapse per distinct
    microsecond (ends-first net-delta convention — identical running
    MAX, no transient peaks) in one small groupby; (3) the global
    running max is the classic two-phase scan: Ray ``sort`` on t
    range-partitions the boundary stream, each batch folds
    (sum, max-prefix, argmax-t) partials, and the driver combines
    P ordered partials — never the boundary stream itself."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import _part_codes
    from ray.data.aggregate import Sum

    gap_us = np.int64(gap_minutes) * np.int64(60_000_000)

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "__on": pc.cast(_on_key(b[on]), pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def intervals(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("__on", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        empty = pa.table({"st": pa.array([], pa.int64()),
                          "en": pa.array([], pa.int64())})
        if n == 0:
            return empty
        on_np = t["__on"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        sbrk = _run_breaks(t[by].combine_chunks(),
                           np.zeros(n, dtype=np.int32))
        if n > 1:
            sbrk[1:] |= np.diff(on_np) > gap_us
        starts = np.flatnonzero(sbrk)
        ends = np.concatenate([starts[1:] - 1, [n - 1]])
        return pa.table({"st": pa.array(on_np[starts]),
                         "en": pa.array(on_np[ends])})

    iv = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(intervals, batch_format="pyarrow") \
        .materialize()
    n_sessions = iv.count()
    if n_sessions == 0:
        return pa.table({"peak": pa.array([0], pa.int64()),
                         "peak_t_us": pa.array([0], pa.int64()),
                         "n_sessions": pa.array([0], pa.int64())})

    def deltas(b: pa.Table) -> pa.Table:
        st = b["st"].combine_chunks().to_numpy(zero_copy_only=False)
        en = b["en"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({
            "t": pa.array(np.concatenate([st, en + 1])),
            "d": pa.array(np.concatenate(
                [np.ones(len(st), np.int64),
                 -np.ones(len(en), np.int64)]))})
        g = t.group_by("t", use_threads=False).aggregate([("d", "sum")])
        return pa.table({"t": g["t"], "d": g["d_sum"]})

    net = iv.map_batches(deltas, batch_format="pyarrow") \
        .groupby("t").aggregate(Sum("d", alias_name="d"))

    def partial(b: pa.Table) -> pa.Table:
        t = b["t"].combine_chunks().to_numpy(zero_copy_only=False)
        d = b["d"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(t) == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("first_t", "s", "m", "tm")})
        pre = np.cumsum(d)
        am = int(np.argmax(pre))               # first max
        return pa.table({
            "first_t": pa.array([int(t[0])], pa.int64()),
            "s": pa.array([int(d.sum())], pa.int64()),
            "m": pa.array([int(pre[am])], pa.int64()),
            "tm": pa.array([int(t[am])], pa.int64())})

    parts = net.sort("t") \
        .map_batches(partial, batch_format="pyarrow").to_pandas() \
        .sort_values("first_t")
    run = 0
    peak = None
    peak_t = 0
    for r in parts.itertuples():
        cand = run + int(r.m)
        if peak is None or cand > peak:
            peak, peak_t = cand, int(r.tm)
        run += int(r.s)
    return pa.table({
        "peak": pa.array([int(peak)], pa.int64()),
        "peak_t_us": pa.array([peak_t], pa.int64()),
        "n_sessions": pa.array([int(n_sessions)], pa.int64())})


def removal_effect_ds(ds, conv_type: str = "purchase", steps: int = 6,
                      by: str = "user_id", on: str = "ts",
                      id_col: str = "event_id",
                      type_col: str = "event_type",
                      num_partitions: int = 64) -> pa.Table:
    """Markov removal-effect attribution (Anderl et al. 2016): model
    each user's journey (truncated at the first ``conv_type``) as a
    first-order Markov chain with a virtual ``__START__`` state and an
    implicit journey-``__END__`` absorber, then score every channel by
    how much ``steps``-hop conversion mass disappears when the channel
    becomes a black hole (transitions into it are lost; no
    renormalization — the standard removal semantics).  All mass
    arithmetic is integer micro-units with per-edge floor division, so
    both engines land on identical int64s.  Output per non-conversion
    channel: ``(channel, p_full_micro, p_removed_micro,
    removal_micro)``.

    Scale shape: ONE user-hash shuffle builds the journeys; inside a
    partition truncation + transition extraction is fully vectorized
    over all users at once (dictionary codes, prefix-sum conversion
    counts, adjacent-pair masks) and only (prev, next, n) partial
    counts leave — the global matrix is |types|²-bounded, and the
    removal sweep is a driver-side loop over a tiny integer matrix."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from kgforge.functions.joins import _part_codes

    START, END = "__START__", "__END__"

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by], type_col: b[type_col],
                      "__on": pc.cast(_on_key(b[on]), pa.int64()),
                      id_col: b[id_col]})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            (by, "ascending"), ("__on", "ascending"),
            (id_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if not n:
            return empty
        te = t[type_col].combine_chunks().dictionary_encode()
        names = te.dictionary.to_pylist()
        codes = te.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        brk = _run_breaks(t[by].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        starts = np.flatnonzero(brk)
        seg = np.repeat(starts,
                        np.diff(np.concatenate([starts, [n]])))
        conv_code = names.index(conv_type) if conv_type in names else -1
        pref = np.concatenate([[0], np.cumsum(codes == conv_code)])
        keep = (pref[:-1] - pref[seg]) == 0   # prefix up to 1st conv
        # adjacent kept pairs within a user = real transitions
        pair = keep[:-1] & keep[1:] & ~brk[1:] if n > 1 \
            else np.zeros(0, dtype=bool)
        a_codes = codes[:-1][pair]
        b_codes = codes[1:][pair]
        # per-user journey start / end rows (kept set is a run prefix)
        last = np.zeros(n, dtype=bool)
        last[np.concatenate([starts[1:] - 1, [n - 1]])] = True
        end_row = keep & (last | np.concatenate(
            [~keep[1:] | brk[1:], [True]])[:n])
        S, E = len(names), len(names) + 1    # START / END codes
        a_all = np.concatenate([a_codes,
                                np.full(len(starts), S, np.int64),
                                codes[end_row]])
        b_all = np.concatenate([b_codes, codes[starts],
                                np.full(int(end_row.sum()), E,
                                        np.int64)])
        key = a_all * (len(names) + 2) + b_all
        uk, cnt = np.unique(key, return_counts=True)
        lut = names + [START, END]
        return pa.table({
            "a": pa.array([lut[int(k) // (len(names) + 2)]
                           for k in uk], pa.string()),
            "b": pa.array([lut[int(k) % (len(names) + 2)]
                           for k in uk], pa.string()),
            "n": pa.array(cnt.astype(np.int64))})

    mat = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()

    types = sorted(
        r[type_col] for r in
        ds.map_batches(
            lambda b: pa.table(
                {type_col: b[type_col].combine_chunks().unique()}),
            batch_format="pyarrow")
        .groupby(type_col).aggregate(Count(alias_name="__c"))
        .take_all())

    tot: dict[str, int] = {}
    adj: dict[str, list] = {}
    for a, b, c in zip(mat["a"], mat["b"], mat["n"]):
        tot[a] = tot.get(a, 0) + int(c)
        adj.setdefault(a, []).append((b, int(c)))

    def absorbed(excl: str | None) -> int:
        v = {START: 1_000_000}
        got = 0
        for _ in range(steps):
            nv: dict[str, int] = {}
            for a, mass in v.items():
                for b, c in adj.get(a, ()):
                    m = mass * c // tot[a]
                    if b == conv_type:
                        got += m
                    elif b != END and b != excl:
                        nv[b] = nv.get(b, 0) + m
            v = nv
        return got

    p_full = absorbed(None)
    chans = [t for t in types if t != conv_type]
    p_rem = [absorbed(x) for x in chans]
    return pa.table({
        "channel": pa.array(chans, pa.string()),
        "p_full_micro": pa.array([p_full] * len(chans), pa.int64()),
        "p_removed_micro": pa.array(p_rem, pa.int64()),
        "removal_micro": pa.array([p_full - p for p in p_rem],
                                  pa.int64())})


def position_attribution_ds(ds, conv_type: str = "purchase",
                            by: str = "user_id", on: str = "ts",
                            id_col: str = "event_id",
                            type_col: str = "event_type",
                            num_partitions: int = 64):
    """U-shaped (position-based) attribution: each CONVERTING user's
    pre-conversion touches credit 40% to the first, 40% to the last,
    and 20% split over the middles (single touch → 100%, two touches
    → 50/50), in integer micro-credits with floor division (middles
    get ``200000 // (cnt−2)`` each; no remainder redistribution — the
    SQL twin floors identically).  Complements
    :func:`first_touch` / :func:`removal_effect_ds` with the third
    classic multi-touch rule.  Output: ``(channel, credit_micro,
    n_touches)``.

    Scale shape: one user-hash shuffle; per partition the
    pre-first-conversion prefix, per-user positions and credits are
    all vectorized run arithmetic, and only |channels|-bounded
    (channel, credit, touches) partials leave."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by], type_col: b[type_col],
                      "__on": pc.cast(_on_key(b[on]), pa.int64()),
                      id_col: b[id_col]})
        return t.append_column(
            "__p", pa.array(_part_codes(t[by], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            (by, "ascending"), ("__on", "ascending"),
            (id_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        empty = pa.table({"channel": pa.array([], pa.string()),
                          "credit": pa.array([], pa.int64()),
                          "touches": pa.array([], pa.int64())})
        if not n:
            return empty
        te = t[type_col].combine_chunks().dictionary_encode()
        names = te.dictionary.to_pylist()
        codes = te.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if conv_type not in names:
            return empty
        conv_code = names.index(conv_type)
        brk = _run_breaks(t[by].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        starts = np.flatnonzero(brk)
        lens = np.diff(np.concatenate([starts, [n]]))
        seg = np.repeat(starts, lens)
        isconv = codes == conv_code
        pref = np.concatenate([[0], np.cumsum(isconv)])
        # credited = strictly before the user's first conversion, and
        # the user must convert at all
        run_convs = np.repeat(pref[starts + lens] - pref[starts], lens)
        credited = ((pref[:-1] - pref[seg]) == 0) & ~isconv \
            & (run_convs > 0)
        if not credited.any():
            return empty
        pos = np.arange(n, dtype=np.int64) - seg + 1     # 1-based rn
        # cnt per run = credited touches (a run prefix) per user
        cred_i = np.add.reduceat(credited.astype(np.int64), starts)
        cnt = np.repeat(cred_i, lens)
        rn, ct = pos[credited], cnt[credited]
        credit = np.where(
            ct == 1, 1_000_000,
            np.where(ct == 2, 500_000,
                     np.where((rn == 1) | (rn == ct), 400_000,
                              200_000 // np.maximum(ct - 2, 1))))
        ch = codes[credited]
        sums = np.bincount(ch, weights=credit.astype(np.float64),
                           minlength=len(names)).astype(np.int64)
        cnts = np.bincount(ch, minlength=len(names)).astype(np.int64)
        nz = np.flatnonzero(cnts)
        return pa.table({
            "channel": pa.array([names[i] for i in nz], pa.string()),
            "credit": pa.array(sums[nz]),
            "touches": pa.array(cnts[nz])})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("channel").aggregate(
            Sum("credit", alias_name="credit_micro"),
            Sum("touches", alias_name="n_touches"))


def kaplan_meier_ds(ds, by: str = "o_custkey", on: str = "o_orderdate",
                    tie: str = "o_orderkey",
                    unit_us: int = 86_400_000_000,
                    num_partitions: int = 64):
    """Kaplan–Meier survival curve over keyed inter-arrival gaps with
    right-censoring at the global horizon (the classic churn /
    reorder-lifetime estimator): every consecutive same-key pair
    contributes an UNCENSORED duration ``floor(on/unit) −
    floor(prev/unit)`` and every key additionally contributes ONE
    CENSORED duration ``horizon_day − last_day`` (the still-open
    interval — keys with a single record contribute only that).  For
    each distinct uncensored duration t: ``n_risk`` = durations ≥ t
    (both kinds), ``n_events`` = uncensored durations == t, and the
    product-limit estimate in EXACT integer micro-units via the
    recurrence ``S_t = S_prev · (n_risk − n_events) // n_risk``
    (S_0 = 1,000,000) — the same all-integer fold the SQL twin runs
    as a recursive CTE, so both sides agree bit-for-bit.

    Scale shape: one metadata-cheap max() pass pins the horizon, then
    the key_gap_dist exchange — ONE shuffle by ``hash(key) % P``,
    per-partition sort + vectorized adjacent diff emitting
    (duration, censored, n) HISTOGRAM partials; the global keyed sum
    and the driver recurrence see only duration-domain rows (day
    grain: bounded by the calendar span), never records."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    MIX = np.uint64(0x9E3779B97F4A7C15)
    P = np.uint64(num_partitions)

    def day_max(b: pa.Table) -> pa.Table:
        d = b[on].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False) // unit_us
        return pa.table({"d": pa.array([int(d.max())] if len(d)
                                       else [], pa.int64())})

    hor = int(ds.map_batches(day_max, batch_format="pyarrow")
              .max("d"))

    def tag(b: pa.Table) -> pa.Table:
        k = b[by].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            p = (((k * MIX) >> np.uint64(32)) % P).astype(np.int32)
        return pa.table({"__p": pa.array(p), by: b[by],
                         "__on": b[on].combine_chunks()
                         .cast(pa.int64()),
                         "__tie": b[tie]})

    empty = pa.table({"dur": pa.array([], pa.int64()),
                      "all_n": pa.array([], pa.int64()),
                      "d_n": pa.array([], pa.int64())})

    def per_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[
            (by, "ascending"), ("__on", "ascending"),
            ("__tie", "ascending")])
        t = t.take(idx)
        k = t[by].combine_chunks().to_numpy(zero_copy_only=False)
        day = t["__on"].combine_chunks().to_numpy(
            zero_copy_only=False) // unit_us
        same = k[1:] == k[:-1]
        gaps = (day[1:] - day[:-1])[same]
        last = np.ones(len(k), dtype=bool)
        last[:-1] = ~same                       # last record of each key
        cens = hor - day[last]
        durs = np.concatenate([gaps, cens])
        is_ev = np.zeros(len(durs), dtype=np.int64)
        is_ev[: len(gaps)] = 1
        order = np.argsort(durs, kind="stable")
        durs, is_ev = durs[order], is_ev[order]
        uniq, starts = np.unique(durs, return_index=True)
        all_n = np.diff(np.append(starts, len(durs)))
        d_n = np.add.reduceat(is_ev, starts)
        return pa.table({"dur": pa.array(uniq.astype(np.int64)),
                         "all_n": pa.array(all_n.astype(np.int64)),
                         "d_n": pa.array(d_n.astype(np.int64))})

    agg = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("dur").aggregate(
            Sum("all_n", alias_name="all_n"),
            Sum("d_n", alias_name="d_n")).to_pandas() \
        .sort_values("dur").reset_index(drop=True)

    total = int(agg["all_n"].sum())
    cum_before = np.concatenate(
        [[0], np.cumsum(agg["all_n"].to_numpy())[:-1]])
    n_risk = total - cum_before
    ev = agg["d_n"].to_numpy() > 0
    out_t, out_r, out_d, out_s = [], [], [], []
    s = 1_000_000
    for t, r, d in zip(agg["dur"].to_numpy()[ev],
                       n_risk[ev].astype(int),
                       agg["d_n"].to_numpy()[ev].astype(int)):
        s = s * (r - d) // r
        out_t.append(int(t)); out_r.append(r)
        out_d.append(d); out_s.append(s)
    return pa.table({
        "gap_days": pa.array(out_t, pa.int64()),
        "n_risk": pa.array(out_r, pa.int64()),
        "n_events": pa.array(out_d, pa.int64()),
        "survival_micro": pa.array(out_s, pa.int64())})


def session_entry_exit_ds(ds, by: str = "user_id", on: str = "ts",
                          tie: str = "event_id",
                          type_col: str = "event_type",
                          gap_us: int = 1_800_000_000,
                          num_partitions: int = 64):
    """Entry/exit-page census over 30-minute-gap sessions — the
    classic landing→exit flow table: per (entry_type, exit_type) the
    session count and how many were bounces (single-event sessions).
    Shares the session rule with the sessionize family (break when
    the same-key gap exceeds ``gap_us``; order = (on, tie)).

    Scale shape: ONE shuffle by ``hash(key) % P``; each partition
    sorts once, cuts session runs vectorized (key-change OR gap
    break), reads entry/exit types at run offsets and emits
    (entry, exit, bounce) COUNT partials — the global exchange moves
    type²-bounded cells, never events."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    MIX = np.uint64(0x9E3779B97F4A7C15)
    P = np.uint64(num_partitions)

    def tag(b: pa.Table) -> pa.Table:
        k = b[by].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            p = (((k * MIX) >> np.uint64(32)) % P).astype(np.int32)
        return pa.table({"__p": pa.array(p), by: b[by],
                         "__on": b[on].combine_chunks()
                         .cast(pa.int64()),
                         "__tie": b[tie], type_col: b[type_col]})

    empty = pa.table({"entry_type": pa.array([], pa.string()),
                      "exit_type": pa.array([], pa.string()),
                      "n_sessions": pa.array([], pa.int64()),
                      "n_bounce": pa.array([], pa.int64())})

    def per_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[
            (by, "ascending"), ("__on", "ascending"),
            ("__tie", "ascending")])
        t = t.take(idx)
        k = t[by].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["__on"].combine_chunks().to_numpy(
            zero_copy_only=False)
        brk = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            brk[1:] = (k[1:] != k[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(k)) - 1
        n = ends - starts + 1
        et = t[type_col].combine_chunks()
        entry = et.take(pa.array(starts))
        exit_ = et.take(pa.array(ends))
        g = pa.table({"entry_type": entry, "exit_type": exit_,
                      "n_sessions": pa.array(
                          np.ones(len(starts), np.int64)),
                      "n_bounce": pa.array(
                          (n == 1).astype(np.int64))}) \
            .group_by(["entry_type", "exit_type"],
                      use_threads=False).aggregate(
            [("n_sessions", "sum"), ("n_bounce", "sum")])
        return g.rename_columns(["entry_type", "exit_type",
                                 "n_sessions", "n_bounce"])

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby(["entry_type", "exit_type"]).aggregate(
            Sum("n_sessions", alias_name="n_sessions"),
            Sum("n_bounce", alias_name="n_bounce"))


def interval_coverage_ds(ds, by: str = "user_id", on: str = "ts",
                         dur_col: str = "value",
                         dur_scale_us: int = 60_000_000,
                         num_partitions: int = 64):
    """Per-key interval-UNION coverage census (the classic interval
    union / utilization operator): each event opens the interval
    ``[ts, ts + floor(dur·scale)]`` (negative durations clamp to 0)
    and per key we compute the union length of all its intervals, the
    span ``max_end − min_start`` and a utilization decile ``union·10
    // span`` (a key whose intervals tile its whole span lands in
    decile 10, one with sparse blips in decile 0); output is the
    bounded census (decile, n_keys, sum_union_us, sum_span_us),
    decile ASC.  All arithmetic is exact int64 microseconds.

    Scale plan: ONE ``hash(key) % P`` exchange of (key, start, end)
    triples; inside a partition the union is the textbook sweep —
    sort by (key, start, end), segmented running-max of ends (cummax
    over ends offset by ``rank(key)·range`` so resets cost no per-key
    loop), ``covered = Σ max(0, end − max(start, prev_cummax))`` —
    then an 11-row-bounded decile fold, so the final groupby moves
    ``P × 11`` rows regardless of key count."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        s = pc.cast(pc.cast(b[on], pa.timestamp("us")), pa.int64())
        d = pc.max_element_wise(
            pc.cast(pc.floor(pc.multiply(
                pc.cast(b[dur_col], pa.float64()),
                float(dur_scale_us))), pa.int64()),
            pa.scalar(0, pa.int64()))
        t = pa.table({"k": b[by], "s": s, "e": pc.add(s, d)})
        return t.append_column(
            "__p", pa.array(_part_codes(t["k"], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        empty = pa.table({"decile": pa.array([], pa.int64()),
                          "n_keys": pa.array([], pa.int64()),
                          "sum_union_us": pa.array([], pa.int64()),
                          "sum_span_us": pa.array([], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("k", "ascending"),
                                            ("s", "ascending"),
                                            ("e", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return empty
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        e = t["e"].combine_chunks().to_numpy(zero_copy_only=False)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(brk)
        seg = np.cumsum(brk) - 1              # 0-based key rank
        # segmented cummax of ends: offset each key's values into its
        # own disjoint band, cummax once, shift back (range-bounded so
        # rank·band stays far inside int64)
        base = int(s.min())
        band = int(e.max()) - base + 1
        # rank·band must stay inside int64: when a partition holds
        # more keys than one band-pass allows, sweep in key-aligned
        # slices (outer loop ∝ total_keys · band / 2⁶², ~1 in practice)
        keys_per_pass = max(1, (2 ** 62) // band)
        cm = np.empty(n, dtype=np.int64)
        for first_seg in range(0, int(seg[-1]) + 1, keys_per_pass):
            lo = starts[first_seg]
            hi = starts[first_seg + keys_per_pass] \
                if first_seg + keys_per_pass <= len(starts) - 1 else n
            sg = seg[lo:hi] - seg[lo]
            cm[lo:hi] = np.maximum.accumulate(
                e[lo:hi] - base + sg * band) - sg * band
        prev = np.empty(n, dtype=np.int64)
        prev[0] = np.iinfo(np.int64).min
        if n > 1:
            prev[1:] = cm[:-1] + base
            prev[starts] = np.iinfo(np.int64).min
        covered = np.maximum(e - np.maximum(s, prev), 0)
        union = np.add.reduceat(covered, starts)
        span = np.maximum.reduceat(e, starts) \
            - np.minimum.reduceat(s, starts)
        dec = np.where(span > 0,
                       np.minimum(union * 10 // np.maximum(span, 1),
                                  10), 10)
        g = pa.table({"decile": pa.array(dec, pa.int64()),
                      "n_keys": pa.array(
                          np.ones(len(dec), np.int64)),
                      "sum_union_us": pa.array(union, pa.int64()),
                      "sum_span_us": pa.array(span, pa.int64())}) \
            .group_by(["decile"], use_threads=False).aggregate(
            [("n_keys", "sum"), ("sum_union_us", "sum"),
             ("sum_span_us", "sum")])
        return g.rename_columns(["decile", "n_keys", "sum_union_us",
                                 "sum_span_us"])

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("decile").aggregate(
            Sum("n_keys", alias_name="n_keys"),
            Sum("sum_union_us", alias_name="sum_union_us"),
            Sum("sum_span_us", alias_name="sum_span_us")) \
        .sort("decile")
