"""Order-statistics relational operators with reduce-style plans.

Home for operators whose distributed shape is "small local summary →
tiny global merge" rather than a keyed shuffle: the local summary is
algebraic (a superset of / partial for the global answer), so each
block contributes a bounded candidate set and the merge touches only
candidates, never the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _skyline_table(t: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """2-D skyline (minimize ``x_col``, maximize ``y_col``) of one
    table, fully vectorized: sort by (x asc, y desc), then a row
    survives iff it carries its x-group's max y AND that max strictly
    beats the running max over all strictly-cheaper groups.  Exact
    dominance semantics: ties on BOTH criteria are mutually
    non-dominating and all survive; integer columns only (the engine's
    money/cents convention — no float compares)."""
    idx = pc.sort_indices(t, sort_keys=[(x_col, "ascending"),
                                        (y_col, "descending")])
    t = t.take(idx)
    x = t[x_col].combine_chunks().to_numpy(zero_copy_only=False)
    y = t[y_col].combine_chunks().to_numpy(zero_copy_only=False)
    n = len(x)
    if n == 0:
        return t
    newx = np.concatenate([[True], x[1:] != x[:-1]])
    gid = np.cumsum(newx) - 1
    ymax = y[np.flatnonzero(newx)]        # first of each group = max y
    prev = np.concatenate([[np.iinfo(np.int64).min],
                           np.maximum.accumulate(ymax)[:-1]])
    keep = (y == ymax[gid]) & (ymax[gid] > prev[gid])
    return t.filter(pa.array(keep))


def skyline_ds(ds, x_col: str, y_col: str, keep_cols: list[str]):
    """Distributed Pareto frontier: rows not dominated on (``x_col``
    min, ``y_col`` max).  Output columns: ``keep_cols`` + the two
    criteria.

    Scale shape: the skyline operator is algebraic —
    ``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` — so each
    block reduces to its local frontier first (bounded by the number
    of distinct x values in the block, typically ≪ rows) and only
    those candidates move; the global pass merges candidates in ONE
    single-block task (``repartition(1)`` over candidate rows, never
    the corpus).  No all-pairs dominance test on either side."""
    cols = [*keep_cols, x_col, y_col]

    def local(b: pa.Table) -> pa.Table:
        return _skyline_table(b.select(cols), x_col, y_col)

    cands = ds.map_batches(local, batch_format="pyarrow")
    return cands.repartition(1).map_batches(
        lambda b: _skyline_table(b, x_col, y_col),
        batch_format="pyarrow", batch_size=None)


def rfm_segments_ds(orders_ds, cust_col: str = "o_custkey",
                    ts_col: str = "o_orderdate",
                    price_col: str = "o_totalprice",
                    buckets: int = 4) -> pa.Table:
    """RFM segmentation: per customer recency (last-order day),
    frequency (order count) and monetary (whole dollars, cents summed
    first), each bucketed by the EXACT integer rank rule
    ``q = rank_lt × buckets // n`` (rank over customers,
    strictly-smaller count, ties share a bucket — ``rank() - 1`` in
    the SQL twin); → the collected ≤ buckets³-row segment census
    ``(r_q, f_q, m_q, n_customers)``.

    Scale shape: one customer-keyed aggregate (per-batch combined
    partials first); the three bucket boundaries come from per-metric
    VALUE HISTOGRAMS — distinct days / counts / dollars, all
    domain-bounded, shipped as (metric, value) partials through one
    keyed sum, cumsum'd on the driver and broadcast (``ray.put``) for
    a searchsorted bucket pass; the census folds per-batch partials.
    Customer rows move exactly once (the metric aggregate)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Max, Sum

    from kgforge.common.hashing import round_away
    from kgforge.functions.events import _on_key

    day_us = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        price = b[price_col].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * 100, 0).astype(np.int64)
        t = pa.table({cust_col: b[cust_col],
                      "cnt": pa.array(np.ones(b.num_rows, np.int64)),
                      "cents": pa.array(cents),
                      "ts": pc.cast(_on_key(b[ts_col]), pa.int64())})
        g = t.group_by([cust_col], use_threads=False).aggregate(
            [("cnt", "sum"), ("cents", "sum"), ("ts", "max")])
        return g.rename_columns([cust_col, "cnt", "cents", "ts"])

    def finish(b: pa.Table) -> pa.Table:
        cents = b["cents"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b["ts"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "f": pc.cast(b["cnt"], pa.int64()),
            "m": pa.array(cents // 100),
            "r": pa.array(ts // day_us)})

    metrics = orders_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(cust_col).aggregate(
            Sum("cnt", alias_name="cnt"),
            Sum("cents", alias_name="cents"),
            Max("ts", alias_name="ts")) \
        .map_batches(finish, batch_format="pyarrow").materialize()

    def hist_partial(b: pa.Table) -> pa.Table:
        parts = []
        for i, c in enumerate(("r", "f", "m")):
            g = b.select([c]).group_by([c], use_threads=False) \
                .aggregate([([], "count_all")])
            parts.append(pa.table({
                "metric": pa.array(np.full(g.num_rows, i, np.int32)),
                "v": g[c],
                "cnt": pc.cast(g["count_all"], pa.int64())}))
        return pa.concat_tables(parts)

    hist = metrics.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby(["metric", "v"]).aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    lut = {}
    n = 0
    for i in range(3):
        h = hist[hist["metric"] == i].sort_values("v")
        vals = h["v"].to_numpy(np.int64)
        cnts = h["cnt"].to_numpy(np.int64)
        n = int(cnts.sum())
        rank_lt = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        lut[i] = (vals, rank_lt * buckets // n)
    ref = ray.put(lut)

    def census(b: pa.Table, _ref=ref) -> pa.Table:
        l = ray.get(_ref)
        qs = []
        for i, c in enumerate(("r", "f", "m")):
            v = b[c].combine_chunks().to_numpy(zero_copy_only=False)
            vals, q = l[i]
            qs.append(q[np.searchsorted(vals, v)])
        t = pa.table({"r_q": pa.array(qs[0]), "f_q": pa.array(qs[1]),
                      "m_q": pa.array(qs[2])})
        g = t.group_by(["r_q", "f_q", "m_q"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"r_q": g["r_q"], "f_q": g["f_q"],
                         "m_q": g["m_q"],
                         "n_customers": pc.cast(g["count_all"],
                                                pa.int64())})

    parts = [t for t in ray.get(
        metrics.map_batches(census, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_columns]
    if not parts:
        return pa.table({"r_q": pa.array([], pa.int64()),
                         "f_q": pa.array([], pa.int64()),
                         "m_q": pa.array([], pa.int64()),
                         "n_customers": pa.array([], pa.int64())})
    flat = pa.concat_tables(parts).to_pandas()
    g = flat.groupby(["r_q", "f_q", "m_q"], as_index=False).sum()
    return pa.table({
        "r_q": pa.array(g["r_q"].to_numpy(np.int64)),
        "f_q": pa.array(g["f_q"].to_numpy(np.int64)),
        "m_q": pa.array(g["m_q"].to_numpy(np.int64)),
        "n_customers": pa.array(g["n_customers"].to_numpy(np.int64))})
