"""General large–large equi-joins as a single key shuffle.

The engine's other join shapes (broadcast canon lookup, semi/anti via
``pc.is_in`` value sets, as-of / range merges) all assume one small or
pre-sorted side.  This module covers the remaining class: BOTH sides
are large, so each must move exactly once, keyed by the join column —
the classic cogroup (shuffle-hash-join) plan:

    tag side → union → groupby(key) → per-key (left rows, right rows)

``cogroup_ds`` exposes the raw per-key callback (the right altitude
for join+aggregate fusion: aggregate inside the key task and ship one
row per key, never the joined cartesian).  ``shuffle_join_ds`` builds
inner/left equi-join row output on top of it.

Scale contract: per-key work is O(|L_k|·|R_k|) only if the callback
materializes the cartesian; a skewed key with millions of rows BOTH
sides needs the same salting treatment as ``events.asof_join_ds``
(split one side by hash, replicate the other) — not implemented here
because every key-unique-on-one-side join (fact⋈dim, fact⋈fact on a
key unique in one table, the overwhelmingly common case) is linear
per key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tag(t: pa.Table, key, side: int, own: set[str],
         all_types: list[tuple[str, pa.DataType]]) -> pa.Table:
    """One side of the union, in the CANONICAL column order (__k,
    __side, every payload column of both sides) so the two
    ``map_batches`` outputs union cleanly.  The absent side's columns
    are typed Arrow nulls — a pandas object/NaN round-trip here would
    corrupt the driver hash."""
    n = t.num_rows
    cols: dict[str, object] = {"__k": key, "__side": pa.array(
        np.full(n, side, dtype=np.int8))}
    for name, typ in all_types:
        cols[name] = t[name] if name in own else pa.nulls(n, typ)
    return pa.table(cols)


def cogroup_ds(left_ds, right_ds, on_left: str, on_right: str,
               fn, left_cols: list[str], right_cols: list[str]):
    """Cogroup both datasets by key and apply ``fn(key_scalar,
    left_tbl, right_tbl) -> pa.Table`` once per key inside the shuffle
    task.  ``left_cols`` / ``right_cols`` name the payload columns to
    carry (key excluded) — prune to what ``fn`` reads, the columns ARE
    the shuffle."""
    dup = set(left_cols) & set(right_cols)
    if dup:
        raise ValueError(f"payload column name collision: {sorted(dup)}")
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = [(c, l_schema.base_schema.field(c).type) for c in left_cols]
    r_types = [(c, r_schema.base_schema.field(c).type) for c in right_cols]

    all_types = l_types + r_types

    def tag_left(t: pa.Table) -> pa.Table:
        return _tag(t, t[on_left], 0, set(left_cols), all_types)

    def tag_right(t: pa.Table) -> pa.Table:
        return _tag(t, t[on_right], 1, set(right_cols), all_types)

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow") \
        .union(right_ds.map_batches(tag_right, batch_format="pyarrow"))

    def per_key(t: pa.Table) -> pa.Table:
        side = t["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        lt = t.select(["__k"] + [c for c, _ in l_types]).take(pa.array(li))
        rt = t.select([c for c, _ in r_types]).take(pa.array(ri))
        return fn(t["__k"][0] if t.num_rows else None, lt, rt)

    return unioned.groupby("__k").map_groups(per_key, batch_format="pyarrow")


def shuffle_join_ds(left_ds, right_ds, on_left: str, on_right: str,
                    left_cols: list[str], right_cols: list[str],
                    how: str = "inner"):
    """Row-emitting equi-join (inner or left outer).  Output columns:
    ``on_left`` + left payload + right payload; right payload is
    typed-null on left-outer misses.  Per key the output is the
    cartesian (|L_k| × |R_k|) — see the module salting note."""
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: only inner/left supported")

    def join_key(key, lt: pa.Table, rt: pa.Table) -> pa.Table:
        nl, nr = lt.num_rows, rt.num_rows
        empty = {on_left: lt["__k"].slice(0, 0),
                 **{c: lt[c].slice(0, 0) for c in left_cols},
                 **{c: rt[c].slice(0, 0) for c in right_cols}}
        if nl == 0 or (nr == 0 and how == "inner"):
            return pa.table(empty)
        if nr == 0:  # left outer miss: one row per left, right nulls
            return pa.table({
                on_left: lt["__k"],
                **{c: lt[c] for c in left_cols},
                **{c: pa.nulls(nl, rt.schema.field(c).type)
                   for c in right_cols}})
        reps = pa.array(np.repeat(np.arange(nl), nr))
        tile = pa.array(np.tile(np.arange(nr), nl))
        return pa.table({
            on_left: lt["__k"].take(reps),
            **{c: lt[c].take(reps) for c in left_cols},
            **{c: rt[c].take(tile) for c in right_cols}})

    return cogroup_ds(left_ds, right_ds, on_left, on_right, join_key,
                      left_cols, right_cols)
