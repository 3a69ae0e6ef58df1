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
