"""General large–large equi-joins as a single key shuffle.

The engine's other join shapes (broadcast canon lookup, semi/anti via
``pc.is_in`` value sets, as-of / range merges) all assume one small or
pre-sorted side.  This module covers the remaining class: BOTH sides
are large, so each must move exactly once, keyed by the join column —
the classic cogroup (shuffle-hash-join) plan:

    tag side → union → groupby(hash(key) % P) → vectorized merge

The shuffle key is a HASH PARTITION, not the raw key: a
``groupby(key).map_groups`` plan pays one Python callback per
distinct key (150k keys → 150k calls — measured 5.2s on a join whose
data fits in one block), whereas P≈4×CPUs partition groups amortize
the callback and let the within-partition merge run as pure numpy
index arithmetic over ALL keys at once.  Skew note: a single key
hashes to one partition, so a key with millions of rows on BOTH sides
(cartesian blow-up) needs upstream salting as in
``events.asof_join_ds``; every key-unique-on-one-side join (fact⋈dim,
the overwhelmingly common case) is linear per partition.

``cogroup_ds`` exposes a per-key callback API (the right altitude for
join+aggregate fusion when the per-key logic is irreducibly custom);
``shuffle_join_ds`` emits inner / left-outer joined rows with no
per-key Python at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _part_codes(arr: pa.ChunkedArray | pa.Array,
                num_partitions: int) -> np.ndarray:
    """Stable partition id per row: splitmix64 mix for integer keys,
    blake2b-8 (``hash_u64_np``) for strings — deterministic across
    workers and runs, well-mixed so sequential ids spread evenly."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        x = arr.to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return (x % np.uint64(num_partitions)).astype(np.int32)
    from kgforge.common.hashing import hash_u64_np

    h = hash_u64_np([s if s is not None else "" for s in arr.to_pylist()])
    return (h % np.uint64(num_partitions)).astype(np.int32)


def _tag(t: pa.Table, key, side: int, own: set[str],
         all_types: list[tuple[str, pa.DataType]],
         num_partitions: int) -> pa.Table:
    """One side of the union, in the CANONICAL column order (__p, __k,
    __side, every payload column of both sides) so the two
    ``map_batches`` outputs union cleanly.  The absent side's columns
    are typed Arrow nulls — a pandas object/NaN round-trip here would
    corrupt the driver hash."""
    n = t.num_rows
    cols: dict[str, object] = {
        "__p": pa.array(_part_codes(key, num_partitions)),
        "__k": key,
        "__side": pa.array(np.full(n, side, dtype=np.int8)),
    }
    for name, typ in all_types:
        cols[name] = t[name] if name in own else pa.nulls(n, typ)
    return pa.table(cols)


def _union_tagged(left_ds, right_ds, on_left, on_right,
                  left_cols, right_cols, num_partitions,
                  left_schema: pa.Schema | None = None,
                  right_schema: pa.Schema | None = None):
    """``left_schema`` / ``right_schema``: optional payload-type hints.
    ``Dataset.schema()`` on a LAZY dataset triggers (partial) plan
    execution — an iterative caller chaining cogroups (PageRank's
    per-iteration ranks) re-executes its growing lineage once per
    schema probe without them."""
    dup = set(left_cols) & set(right_cols)
    if dup:
        raise ValueError(f"payload column name collision: {sorted(dup)}")
    # payload-free sides need no type lookup — skip the schema() probe
    # entirely (it executes part of a lazy plan)
    empty = pa.schema([])
    l_schema = left_schema or (empty if not left_cols
                               else left_ds.schema().base_schema)
    r_schema = right_schema or (empty if not right_cols
                                else right_ds.schema().base_schema)
    l_types = [(c, l_schema.field(c).type) for c in left_cols]
    r_types = [(c, r_schema.field(c).type) for c in right_cols]
    all_types = l_types + r_types

    def tag_left(t: pa.Table) -> pa.Table:
        return _tag(t, t[on_left], 0, set(left_cols), all_types,
                    num_partitions)

    def tag_right(t: pa.Table) -> pa.Table:
        return _tag(t, t[on_right], 1, set(right_cols), all_types,
                    num_partitions)

    return (left_ds.map_batches(tag_left, batch_format="pyarrow")
            .union(right_ds.map_batches(tag_right,
                                        batch_format="pyarrow")))


def _sorted_runs(t: pa.Table):
    """Sort one partition by (key, side) and return the per-key run
    layout: (sorted table, key start offsets, left count and right
    count per key) — all numpy, no per-key Python."""
    import pyarrow.compute as pc

    idx = pc.sort_indices(t, sort_keys=[("__k", "ascending"),
                                        ("__side", "ascending")])
    t = t.take(idx)
    keys = t["__k"].combine_chunks()
    side = t["__side"].combine_chunks().to_numpy(zero_copy_only=False)
    n = t.num_rows
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return t, z, z, z
    # run boundaries over the sorted key column (arrow compare on the
    # typed array — no Python objects)
    neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
    starts = np.concatenate(
        [[0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1])
    ends = np.concatenate([starts[1:], [n]])
    # side is 0/1 and sorted within each run → right count = sum
    cs = np.concatenate([[0], np.cumsum(side, dtype=np.int64)])
    nr = cs[ends] - cs[starts]
    nl = (ends - starts) - nr
    return t, starts, nl, nr


def cogroup_ds(left_ds, right_ds, on_left: str, on_right: str,
               fn, left_cols: list[str], right_cols: list[str],
               num_partitions: int = 64):
    """Cogroup both datasets by key and apply ``fn(key_scalar,
    left_tbl, right_tbl) -> pa.Table`` once per key, looped IN-PROCESS
    over each hash partition (P Ray groups total, not one per key).
    ``left_cols`` / ``right_cols`` name the payload columns to carry
    (key excluded) — prune to what ``fn`` reads, the columns ARE the
    shuffle."""
    unioned = _union_tagged(left_ds, right_ds, on_left, on_right,
                            left_cols, right_cols, num_partitions)

    def per_partition(t: pa.Table) -> pa.Table:
        t, starts, nl, nr = _sorted_runs(t)
        lt_all = t.select(["__k"] + left_cols)
        rt_all = t.select(right_cols)
        out, schema = [], None
        for i in range(len(starts)):
            s = int(starts[i])
            lt = lt_all.slice(s, int(nl[i]))
            rt = rt_all.slice(s + int(nl[i]), int(nr[i]))
            r = fn(t["__k"][s], lt, rt)
            schema = r.schema
            if r.num_rows:
                out.append(r)
        if not out:
            # every group has ≥1 key, so fn ran and fixed the schema
            return schema.empty_table()
        return pa.concat_tables(out)

    return unioned.groupby("__p").map_groups(per_partition,
                                             batch_format="pyarrow")


def cogroup_partition_ds(left_ds, right_ds, on_left: str, on_right: str,
                         fn, left_cols: list[str], right_cols: list[str],
                         num_partitions: int = 64,
                         left_schema: pa.Schema | None = None,
                         right_schema: pa.Schema | None = None):
    """Partition-level cogroup: ``fn(sorted_tbl, starts, nl, nr) ->
    pa.Table`` receives one whole hash partition sorted by (key, side)
    plus its per-key run layout — key i's left rows are
    ``sorted_tbl[starts[i] : starts[i]+nl[i]]``, right rows the next
    ``nr[i]``.  The fastest altitude for join+aggregate fusion: the
    callback reduces ALL keys with segment ops (``np.add.reduceat``
    over ``starts``) and ships one row per key out of the single
    shuffle — no per-key Python, no follow-up re-shuffle."""
    unioned = _union_tagged(left_ds, right_ds, on_left, on_right,
                            left_cols, right_cols, num_partitions,
                            left_schema=left_schema,
                            right_schema=right_schema)

    def per_partition(t: pa.Table) -> pa.Table:
        return fn(*_sorted_runs(t))

    return unioned.groupby("__p").map_groups(per_partition,
                                             batch_format="pyarrow")


def shuffle_join_ds(left_ds, right_ds, on_left: str, on_right: str,
                    left_cols: list[str], right_cols: list[str],
                    how: str = "inner", num_partitions: int = 64):
    """Row-emitting equi-join (inner / left / right / full outer).
    Output columns: ``on_left`` + left payload + right payload; the
    absent side's payload is typed-null on outer misses.  The
    within-partition merge is pure index arithmetic across all keys at
    once (repeat/modulo over run layouts) — zero per-key Python.  Per
    key the output is the cartesian (|L_k| × |R_k|) — see the module
    salting note."""
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"how={how!r}: inner/left/right/full supported")
    dup = set(left_cols) & set(right_cols)
    if dup:
        raise ValueError(f"payload column name collision: {sorted(dup)}")
    l_schema = left_ds.schema().base_schema
    l_types = [(c, l_schema.field(c).type) for c in left_cols]
    r_schema = right_ds.schema().base_schema
    r_types = [(c, r_schema.field(c).type) for c in right_cols]

    def per_partition(t: pa.Table) -> pa.Table:
        t, starts, nl, nr = _sorted_runs(t)

        def build(lidx: np.ndarray | None,
                  ridx: np.ndarray | None) -> pa.Table:
            # key comes from whichever side is present
            kidx = pa.array(lidx if lidx is not None else ridx)
            cols = {on_left: t["__k"].take(kidx)}
            if lidx is None:
                cols.update({c: pa.nulls(len(kidx), typ)
                             for c, typ in l_types})
            else:
                li = pa.array(lidx)
                cols.update({c: t[c].take(li) for c in left_cols})
            if ridx is None:
                cols.update({c: pa.nulls(len(kidx), typ)
                             for c, typ in r_types})
            else:
                ri = pa.array(ridx)
                cols.update({c: t[c].take(ri) for c in right_cols})
            return pa.table(cols)

        # matched keys: emit the per-key cartesian via flat index math
        m = nl * nr
        total = int(m.sum())
        parts = []
        if total:
            kofs = np.repeat(np.arange(len(m)), m)
            j = np.arange(total) - np.repeat(
                np.concatenate([[0], np.cumsum(m)[:-1]]), m)
            lidx = starts[kofs] + j // np.maximum(nr[kofs], 1)
            ridx = starts[kofs] + nl[kofs] + j % np.maximum(nr[kofs], 1)
            parts.append(build(lidx, ridx))
        if how in ("left", "full"):
            miss = np.flatnonzero((nr == 0) & (nl > 0))
            if len(miss):
                lidx = np.concatenate(
                    [np.arange(starts[i], starts[i] + nl[i])
                     for i in miss])
                parts.append(build(lidx, None))
        if how in ("right", "full"):
            miss = np.flatnonzero((nl == 0) & (nr > 0))
            if len(miss):
                ridx = np.concatenate(
                    [np.arange(starts[i] + nl[i],
                               starts[i] + nl[i] + nr[i])
                     for i in miss])
                parts.append(build(None, ridx))
        if not parts:
            return build(np.zeros(0, dtype=np.int64),
                         np.zeros(0, dtype=np.int64))
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    unioned = _union_tagged(left_ds, right_ds, on_left, on_right,
                            left_cols, right_cols, num_partitions)
    return unioned.groupby("__p").map_groups(per_partition,
                                             batch_format="pyarrow")

def set_op_ds(left_ds, right_ds, on_left: str, on_right: str,
              op: str = "intersect", num_partitions: int = 64):
    """Distributed INTERSECT / EXCEPT over DISTINCT keys (the SQL set
    operators).  Both sides are deduped per batch first, so only
    distinct keys enter the single hash-partitioned cogroup; the
    per-partition pick is one vectorized mask over the key-run layout
    (left-present & right-present, or left-present & right-absent).
    Output column is named ``on_left``."""
    if op not in ("intersect", "except"):
        raise ValueError(f"op={op!r}: intersect/except supported")

    def distinct(col):
        def f(b: pa.Table) -> pa.Table:
            return b.select([col]).group_by([col], use_threads=False) \
                .aggregate([])
        return f

    l = left_ds.map_batches(distinct(on_left), batch_format="pyarrow")
    r = right_ds.map_batches(distinct(on_right), batch_format="pyarrow")

    def pick(t: pa.Table, starts, nl, nr) -> pa.Table:
        if op == "intersect":
            sel = (nl > 0) & (nr > 0)
        else:
            sel = (nl > 0) & (nr == 0)
        idx = starts[np.flatnonzero(sel)]
        return pa.table({on_left: t["__k"].take(pa.array(idx))})

    return cogroup_partition_ds(l, r, on_left, on_right, pick, [], [],
                                num_partitions=num_partitions)

def orphan_audit_ds(child_ds, child_key: str, parent_ds,
                    parent_key: str, num_partitions: int = 64):
    """Referential-integrity audit for one FK relation: per hash
    partition, one partial row ``(n_rows, n_keys, orphan_rows,
    orphan_keys)`` counting child rows/keys whose key has no parent.
    The caller sums the ≤ P partials (a tiny driver fold).

    Scale shape: child rows collapse to per-batch ``(key, cnt)``
    partials and the parent to distinct keys before the ONE cogroup
    exchange — the shuffle carries key-cardinality rows of both
    sides, never child rows; the per-partition audit is pure cumsum
    index math over the run layout."""
    def child_partial(b: pa.Table) -> pa.Table:
        g = b.select([child_key]).group_by([child_key],
                                           use_threads=False) \
            .aggregate([(child_key, "count")])
        return g.rename_columns([child_key, "cnt"])

    def parent_distinct(b: pa.Table) -> pa.Table:
        return b.select([parent_key]).group_by([parent_key],
                                               use_threads=False) \
            .aggregate([])

    c = child_ds.map_batches(child_partial, batch_format="pyarrow")
    p = parent_ds.map_batches(parent_distinct, batch_format="pyarrow")

    def audit(t: pa.Table, starts, nl, nr) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            z = pa.array([0], pa.int64())
            return pa.table({"n_rows": z, "n_keys": z,
                             "orphan_rows": z, "orphan_keys": z})
        cnt = pc.fill_null(t["cnt"].combine_chunks(), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(cnt)])
        ends = np.concatenate([starts[1:], [t.num_rows]])
        per_run = cum[ends] - cum[starts]      # right rows add zeros
        child = nl > 0
        orphan = child & (nr == 0)
        return pa.table({
            "n_rows": pa.array([int(per_run[child].sum())], pa.int64()),
            "n_keys": pa.array([int(child.sum())], pa.int64()),
            "orphan_rows": pa.array([int(per_run[orphan].sum())],
                                    pa.int64()),
            "orphan_keys": pa.array([int(orphan.sum())], pa.int64())})

    return cogroup_partition_ds(c, p, child_key, parent_key, audit,
                                ["cnt"], [],
                                num_partitions=num_partitions)


def table_diff_ds(left_ds, right_ds, on_left: str, on_right: str,
                  left_cols: list[str], right_cols: list[str],
                  num_partitions: int = 64):
    """Snapshot diff keyed by a (pre-composed) key column: one row per
    key that differs between the two tables, with status ``added``
    (right only), ``removed`` (left only) or ``changed`` (both present
    but the payload differs; multi-row keys compare as sorted
    multisets).  Output: key + ``status`` + the right side's payload
    (typed-null for ``removed``).  ``left_cols`` / ``right_cols`` must
    align positionally (same arity and types) and must not collide by
    name — rename one side first when diffing same-schema tables.

    Single hash cogroup.  Unique-key runs (the dominant regime for
    deduped snapshot tables) are compared fully vectorized — one
    ``pc.equal`` per payload column over all common keys at once; only
    keys with duplicate rows fall back to a per-key multiset compare.
    Only differing keys leave the shuffle — the natural verification /
    regression primitive for nightly KG rebuilds (is the delta-merged
    graph identical to the batch build, and if not, where?)."""
    if len(left_cols) != len(right_cols):
        raise ValueError("left_cols and right_cols must align")
    import pyarrow.compute as pc

    r_schema = right_ds.schema().base_schema
    r_types = [(c, r_schema.field(c).type) for c in right_cols]

    def emit(t, key_idx: pa.Array, row_idx: pa.Array | None,
             status: str) -> pa.Table:
        n = len(key_idx)
        cols = {on_left: t["__k"].take(key_idx),
                "status": pa.array([status] * n, pa.string())}
        for rc, typ in r_types:
            cols[rc] = (pa.nulls(n, typ) if row_idx is None
                        else t[rc].take(row_idx))
        return pa.table(cols)

    def per_partition(t: pa.Table, starts, nl, nr) -> pa.Table:
        parts = []
        added = np.flatnonzero((nl == 0) & (nr > 0))
        if len(added):
            fi = pa.array(starts[added])
            parts.append(emit(t, fi, fi, "added"))
        removed = np.flatnonzero((nl > 0) & (nr == 0))
        if len(removed):
            parts.append(emit(t, pa.array(starts[removed]), None,
                              "removed"))
        # --- changed: unique-key fast path, all keys at once -------
        uniq = np.flatnonzero((nl == 1) & (nr == 1))
        if len(uniq):
            li = pa.array(starts[uniq])
            ri = pa.array(starts[uniq] + 1)
            neq = np.zeros(len(uniq), dtype=bool)
            for lc, (rc, _) in zip(left_cols, r_types):
                eq = pc.equal(t[lc].take(li), t[rc].take(ri))
                # null==null counts as equal; null vs value as changed
                ln = pc.is_null(t[lc].take(li))
                rn = pc.is_null(t[rc].take(ri))
                eq = pc.or_kleene(eq, pc.and_(ln, rn))
                neq |= ~pc.fill_null(eq, False) \
                    .to_numpy(zero_copy_only=False)
            hit = np.flatnonzero(neq)
            if len(hit):
                parts.append(emit(t, pa.array(starts[uniq][hit]),
                                  pa.array(starts[uniq][hit] + 1),
                                  "changed"))
        # --- multi-row keys: per-key sorted-multiset compare (rare —
        # a deduped snapshot has unique keys; documented fallback) ---
        multi = np.flatnonzero((nl > 0) & (nr > 0)
                               & ((nl > 1) | (nr > 1)))
        sort_keys = [(rc, "ascending") for rc, _ in r_types]
        for i in multi:
            s0 = int(starts[i])
            if nl[i] != nr[i]:
                differs = True
            else:
                ls = t.slice(s0, int(nl[i])).select(left_cols) \
                    .rename_columns([rc for rc, _ in r_types]) \
                    .sort_by(sort_keys)
                rs = t.slice(s0 + int(nl[i]), int(nr[i])) \
                    .select(right_cols).sort_by(sort_keys)
                differs = not ls.equals(rs)
            if differs:
                fi = pa.array([s0 + int(nl[i])])
                parts.append(emit(t, pa.array([s0]), fi, "changed"))
        if not parts:
            return emit(t, pa.array([], pa.int64()), None, "removed") \
                .slice(0, 0)
        return pa.concat_tables(parts)

    return cogroup_partition_ds(left_ds, right_ds, on_left, on_right,
                                per_partition, left_cols, right_cols,
                                num_partitions=num_partitions)


def _bloom_positions(keys: np.ndarray, m_bits: int, n_hashes: int):
    """Double-hashed bloom bit positions for uint64 keys →
    (n_hashes, len(keys)) uint64 array of bit indices."""
    x = keys.astype(np.uint64)
    h1 = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h1 = (h1 ^ (h1 >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h1 ^= h1 >> np.uint64(31)
    h2 = (x ^ np.uint64(0x9E3779B97F4A7C15)) \
        * np.uint64(0xC2B2AE3D27D4EB4F)
    h2 ^= h2 >> np.uint64(29)
    h2 |= np.uint64(1)  # odd → full-period stride
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def _key_u64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    if pa.types.is_integer(arr.type):
        return arr.to_numpy(zero_copy_only=False).astype(np.uint64)
    from kgforge.common.hashing import hash_u64_np

    return hash_u64_np([s if s is not None else ""
                        for s in arr.to_pylist()])


def bloom_semi_join_ds(left_ds, right_ds, on_left: str, on_right: str,
                       left_cols: list[str], m_bits: int = 1 << 20,
                       n_hashes: int = 4, fanin: int = 32,
                       num_partitions: int = 64):
    """Exact semi-join through a bloom pre-filter — the scale lane for
    a right side whose DISTINCT key set is too large to broadcast as
    an exact value set (``pc.is_in``): the bloom bitmap is a FIXED
    ``m_bits/8`` bytes (default 128 KB) regardless of key count.

    Three stages, all documented-bounded:
    1. build — each right block ORs its keys into a local bitmap
       (vectorized ``np.bitwise_or.at``); block bitmaps tree-reduce
       through ``fanin`` OR groups, the driver ORs the final ``fanin``
       rows and ``ray.put``s one bitmap.
    2. filter — a pure map over the left side tests all ``n_hashes``
       positions vectorized; only bloom survivors (true matches +
       ~``(1-e^{-kn/m})^k`` false positives) continue.
    3. verify — survivors meet the right side's per-batch-distinct
       keys in ONE hash cogroup and false positives drop, so the
       result is EXACT; the shuffle carries only survivors, not the
       left table.
    """
    import pyarrow.compute as pc
    import ray

    n_words = m_bits // 64

    def build(b: pa.Table) -> pa.Table:
        pos = _bloom_positions(_key_u64(b[on_right]), m_bits, n_hashes)
        words = np.zeros(n_words, dtype=np.uint64)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).ravel(),
                         np.uint64(1) << (pos.ravel() & np.uint64(63)))
        g = int(_key_u64(b[on_right])[:1].sum() % fanin) \
            if b.num_rows else 0
        return pa.table({"__g": pa.array([g], pa.int32()),
                         "bits": pa.array([words.tobytes()],
                                          pa.large_binary())})

    def or_group(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, dtype=np.uint64)
        for buf in t["bits"].to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
        return pa.table({"__g": t["__g"].slice(0, 1),
                         "bits": pa.array([acc.tobytes()],
                                          pa.large_binary())})

    partials = right_ds.map_batches(build, batch_format="pyarrow") \
        .groupby("__g").map_groups(or_group, batch_format="pyarrow")
    final = np.zeros(n_words, dtype=np.uint64)
    for row in partials.take_all():
        final |= np.frombuffer(row["bits"], dtype=np.uint64)
    bits_ref = ray.put(final)

    def bloom_filter(b: pa.Table) -> pa.Table:
        words = ray.get(bits_ref)
        pos = _bloom_positions(_key_u64(b[on_left]), m_bits, n_hashes)
        hit = np.ones(b.num_rows, dtype=bool)
        for i in range(n_hashes):
            hit &= (words[(pos[i] >> np.uint64(6)).astype(np.int64)]
                    >> (pos[i] & np.uint64(63))) & np.uint64(1) != 0
        return b.select([on_left] + left_cols) \
            .filter(pa.array(hit))

    survivors = left_ds.map_batches(bloom_filter, batch_format="pyarrow")

    def right_distinct(b: pa.Table) -> pa.Table:
        u = pc.unique(b[on_right].combine_chunks())
        return pa.table({on_right: u})

    rkeys = right_ds.map_batches(right_distinct, batch_format="pyarrow")

    def verify(t, starts, nl, nr):
        total = nl + nr
        row_key = np.repeat(np.arange(len(nl)), total)
        pos = np.arange(len(row_key))
        in_left = pos < (starts + nl)[row_key]
        mask = ((nl > 0) & (nr > 0))[row_key] & in_left
        idx = pa.array(np.flatnonzero(mask))
        cols = {on_left: t["__k"].take(idx)}
        for c in left_cols:
            cols[c] = t[c].take(idx)
        return pa.table(cols)

    # schema hints from the INPUT datasets (metadata-cheap for reads)
    # — probing the lazy survivors/rkeys outputs would execute plans;
    # pandas-block inputs (tests) carry no Arrow schema → let the
    # cogroup probe those itself
    lsch = left_ds.schema().base_schema
    rsch = right_ds.schema().base_schema
    left_schema = right_schema = None
    if isinstance(lsch, pa.Schema):
        left_schema = pa.schema([lsch.field(c)
                                 for c in [on_left] + left_cols])
    if isinstance(rsch, pa.Schema):
        right_schema = pa.schema([rsch.field(on_right)])
    return cogroup_partition_ds(
        survivors, rkeys, on_left, on_right, verify, left_cols, [],
        num_partitions=num_partitions, left_schema=left_schema,
        right_schema=right_schema)


def count_distribution_ds(parent_ds, parent_key: str, child_ds,
                          child_key: str, num_partitions: int = 64):
    """TPC-H Q13 shape: the distribution of child-row counts per
    parent key, INCLUDING zero-child parents (the LEFT JOIN +
    GROUP BY count + re-GROUP BY shape).  Returns per-partition
    partial histograms ``(c_count, freq)`` — at most
    ``num_partitions × max_count`` tiny rows; the caller folds them
    (driver or one small groupby).

    Scale shape: child rows collapse to per-batch ``(key, cnt)``
    partials and the parent to distinct keys before the ONE cogroup
    exchange — the shuffle carries key-cardinality rows, never child
    rows; per partition the per-key totals are one cumsum over the
    run layout and the histogram one ``np.unique``.  Orphan children
    (key with no parent) are excluded, exactly as the LEFT JOIN
    from the parent side does."""
    import pyarrow.compute as pc

    def child_partial(b: pa.Table) -> pa.Table:
        g = b.select([child_key]).group_by([child_key],
                                           use_threads=False) \
            .aggregate([(child_key, "count")])
        return g.rename_columns([child_key, "cnt"])

    def parent_distinct(b: pa.Table) -> pa.Table:
        return b.select([parent_key]).group_by([parent_key],
                                               use_threads=False) \
            .aggregate([])

    c = child_ds.map_batches(child_partial, batch_format="pyarrow")
    p = parent_ds.map_batches(parent_distinct, batch_format="pyarrow")

    def hist(t: pa.Table, starts, nl, nr) -> pa.Table:
        empty = pa.table({"c_count": pa.array([], pa.int64()),
                          "freq": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        cnt = pc.fill_null(t["cnt"].combine_chunks(), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(cnt)])
        ends = np.concatenate([starts[1:], [t.num_rows]])
        per_key = cum[ends] - cum[starts]
        vals = per_key[nr > 0]          # parent present (zero counts in)
        if len(vals) == 0:
            return empty
        uniq, freq = np.unique(vals, return_counts=True)
        return pa.table({"c_count": pa.array(uniq),
                         "freq": pa.array(freq.astype(np.int64))})

    return cogroup_partition_ds(c, p, child_key, parent_key, hist,
                                ["cnt"], [],
                                num_partitions=num_partitions)


def dormant_above_avg_ds(parent_ds, parent_key: str, group_col: str,
                         cents_col: str, child_ds, child_key: str,
                         num_partitions: int = 64):
    """TPC-H Q22 shape: parents whose value exceeds the GLOBAL mean
    of positive values and that have NO child rows, aggregated per
    ``group_col`` → per-partition partials ``(group, numcust,
    tot_cents)``; the caller folds ≤ P × groups tiny rows.

    The above-average filter is EXACT integer math: a parent
    qualifies iff ``cents × n_pos > sum_pos_cents`` (cross-multiplied
    mean compare — no float division on either engine).  The mean's
    (sum, count) come from per-batch partials folded on the driver
    (two scalars); the no-child test is ONE cogroup against the
    child side's distinct keys, fused with the per-group partial
    aggregate so only group-cardinality rows leave the shuffle."""
    import pyarrow.compute as pc

    # pass 1: global (sum, count) of positive cents — tiny fold
    def pos_partial(b: pa.Table) -> pa.Table:
        v = b[cents_col]
        pos = pc.filter(v, pc.greater(v, 0))
        return pa.table({
            "s": pa.array([pc.sum(pos).as_py() or 0], pa.int64()),
            "n": pa.array([len(pos)], pa.int64())})

    parts = parent_ds.map_batches(pos_partial,
                                  batch_format="pyarrow").to_pandas()
    s_pos, n_pos = int(parts["s"].sum()), int(parts["n"].sum())

    def candidates(b: pa.Table) -> pa.Table:
        v = pc.cast(b[cents_col], pa.int64())
        keep = pc.greater(pc.multiply(v, pa.scalar(n_pos, pa.int64())),
                          pa.scalar(s_pos, pa.int64()))
        return b.select([parent_key, group_col, cents_col]) \
            .filter(pc.fill_null(keep, False))

    cand = parent_ds.map_batches(candidates, batch_format="pyarrow")

    def child_distinct(b: pa.Table) -> pa.Table:
        return pa.table({child_key:
                         pc.unique(b[child_key].combine_chunks())})

    kids = child_ds.map_batches(child_distinct, batch_format="pyarrow")

    def agg(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep_key = np.flatnonzero((nl > 0) & (nr == 0))
        if len(keep_key) == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "numcust": pa.array([], pa.int64()),
                             "tot_cents": pa.array([], pa.int64())})
        idx = pa.array(starts[keep_key])     # parents are key-unique
        g = pa.table({group_col: t[group_col].take(idx),
                      "c": t[cents_col].take(idx)}) \
            .group_by([group_col], use_threads=False) \
            .aggregate([("c", "sum"), ("c", "count")])
        return pa.table({group_col: g[group_col],
                         "numcust": pc.cast(g["c_count"], pa.int64()),
                         "tot_cents": pc.cast(g["c_sum"], pa.int64())})

    return cogroup_partition_ds(cand, kids, parent_key, child_key,
                                agg, [group_col, cents_col], [],
                                num_partitions=num_partitions)
