"""Event-stream operators over an ``events``-shaped table
(event_id, ts:timestamp, user_id, event_type, value, props).

Covers the windowed-aggregate / stateful-sessionization operator
class: tumbling windows are a pure groupby on a truncated-timestamp
key (zero extra state); sessionization needs per-user ordered state →
``groupby(user_id).map_groups`` with a vectorized gap scan.  Both are
single-shuffle plans keyed to survive 1000× data (the key spaces are
(type × hours) and user_id respectively).
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


def sessionize_ds(ds, gap_minutes: int = 30):
    """Per-user session counting: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``.  → (user_id,
    n_sessions, n_events)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions_of(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].sort_values().to_numpy()
        n_events = len(ts)
        if n_events == 0:
            return pd.DataFrame({"user_id": [], "n_sessions": [],
                                 "n_events": []})
        breaks = int((np.diff(ts) > gap).sum())
        return pd.DataFrame({"user_id": [df["user_id"].iloc[0]],
                             "n_sessions": [breaks + 1],
                             "n_events": [n_events]})

    return ds.groupby("user_id").map_groups(sessions_of,
                                            batch_format="pandas")


def _on_key(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Sort/window key for the ``on`` column: timestamps become epoch
    int64 (µs) so searchsorted and window arithmetic stay numeric."""
    import pyarrow.compute as pc

    if pa.types.is_timestamp(col.type):
        return pc.cast(col, pa.int64())
    return col


def asof_join_ds(left_ds, right_ds, by: str = "user_id", on: str = "ts",
                 left_cols: tuple = ("event_id",),
                 right_cols: tuple = ("event_id", "ts")):
    """As-of join (SURVEY §2.4): each left row matched to the single
    right row with the greatest ``on`` ≤ the left's ``on`` within the
    same ``by`` key (backward, inclusive — DuckDB ``ASOF JOIN``
    semantics); left rows with no prior right row keep nulls.

    Ray-Data composition, no custom tasks: both sides are aligned to
    one schema (missing columns null), unioned, and ONE
    ``groupby(by).map_groups`` does a vectorized sorted ``searchsorted``
    merge per key.  Partitioning assumption (documented contract): one
    key's rows fit in a task — at web scale, pre-split hot keys by a
    coarse ``on``-range salt and stitch the boundary row per sub-range
    (the boundary fix needs only each sub-range's last right row).
    """
    left_keep = list(left_cols)
    right_keep = list(right_cols)
    # align schemas: build each side with its own columns + typed nulls
    # for the other side's (types resolved from the OTHER dataset)
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

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow") \
        .union(right_ds.map_batches(tag_right, batch_format="pyarrow"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        lmask = df["__side"].to_numpy() == 0
        left = df[lmask]
        right = df[~lmask].sort_values("__on", kind="mergesort")
        if len(left) == 0:
            return left.drop(columns=["__side", "__on"]).iloc[0:0]
        if len(right) == 0:
            out = left.drop(columns=["__side"]).copy()
            for c in right_keep:
                out["r_" + c] = None
            return out.drop(columns=["__on"])
        r_on = right["__on"].to_numpy()
        idx = np.searchsorted(r_on, left["__on"].to_numpy(),
                              side="right") - 1
        out = left.drop(columns=["__side"]).copy()
        for c in right_keep:
            col = right["r_" + c].to_numpy()
            vals = np.where(idx >= 0, col[np.maximum(idx, 0)], None)
            out["r_" + c] = vals
        return out.drop(columns=["__on"])

    return unioned.groupby(by).map_groups(merge, batch_format="pandas")


def range_window_count_ds(left_ds, right_ds, by: str = "user_id",
                          on: str = "ts", window_us: int = 3_600_000_000,
                          left_id: str = "event_id"):
    """Range join + aggregate (SURVEY §2.4): for each left row, count
    right rows of the same key with ``on`` in ``[left.on - window,
    left.on)`` (strictly before).  Same union + per-key sorted-merge
    shape as :func:`asof_join_ds`; the per-left work is two
    ``searchsorted`` probes, so a key's cost is O((l + r) log r)."""
    l_schema = left_ds.schema().base_schema

    def tag_left(b: pa.Table) -> pa.Table:
        return pa.table({by: b[by], "__on": _on_key(b[on]),
                         "__side": pa.array(
                             np.zeros(b.num_rows, dtype=np.int8)),
                         "l_id": b[left_id]})

    def tag_right(b: pa.Table) -> pa.Table:
        return pa.table({by: b[by], "__on": _on_key(b[on]),
                         "__side": pa.array(
                             np.ones(b.num_rows, dtype=np.int8)),
                         "l_id": pa.nulls(b.num_rows,
                                          l_schema.field(left_id).type)})

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow") \
        .union(right_ds.map_batches(tag_right, batch_format="pyarrow"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        lmask = df["__side"].to_numpy() == 0
        left = df[lmask]
        if len(left) == 0:
            return pd.DataFrame({by: pd.Series([], dtype=df[by].dtype),
                                 left_id: pd.Series([], dtype="int64"),
                                 "n_in_window": pd.Series([], dtype="int64")})
        r_on = np.sort(df[~lmask]["__on"].to_numpy())
        l_on = left["__on"].to_numpy()
        hi = np.searchsorted(r_on, l_on, side="left")      # strictly <
        lo = np.searchsorted(r_on, l_on - window_us, side="left")
        return pd.DataFrame({by: left[by].to_numpy(),
                             left_id: left["l_id"].to_numpy(),
                             "n_in_window": (hi - lo).astype("int64")})

    return unioned.groupby(by).map_groups(merge, batch_format="pandas")


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
