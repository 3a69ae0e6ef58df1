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
