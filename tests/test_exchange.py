"""Direct tests for the destination-coalesced range exchange
(kgforge/stages/exchange.py): bounds-metadata roundtrip, empty blocks,
single-bucket path, and value parity vs a pandas oracle on skewed keys.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from kgforge.stages.exchange import (_merge_bucket, _split_block,
                                     arrow_string_keys,
                                     range_exchange_merge)


def _keys(batch: pa.Table) -> np.ndarray:
    return arrow_string_keys(batch["k"], 48)


def _merge_sum(tbl: pa.Table) -> pa.Table:
    g = tbl.group_by(["k"], use_threads=False).aggregate([("v", "sum")])
    g = g.rename_columns(["k", "v"])
    return g.sort_by([("k", "ascending")])


def _mk(keys: list[str], vals: list[int]) -> pa.Table:
    return pa.table({"k": pa.array(keys, pa.string()),
                     "v": pa.array(vals, pa.int64())})


def test_split_block_bounds_metadata_roundtrip():
    """Split returns per-GROUP tables whose b"bounds" metadata slices
    back into exactly the per-bucket row sets."""
    tbl = _mk([f"k{i:02d}" for i in range(20)], list(range(20)))
    splits = np.asarray([b"k05", b"k10", b"k15"], dtype="S48")  # 4 buckets
    group_bounds = np.asarray([0, 2, 4], dtype=np.int64)        # 2 groups
    outs = _split_block(splits, _keys, 4, group_bounds, tbl)
    assert len(outs) == 2
    total = 0
    for g, out in enumerate(outs):
        b = np.frombuffer(out.schema.metadata[b"bounds"], dtype=np.int64)
        assert b[0] == 0 and b[-1] == out.num_rows
        assert np.all(np.diff(b) >= 0)
        total += out.num_rows
    assert total == 20
    # bucket 2 = keys k10..k14 → group 1, local index 0
    b = np.frombuffer(outs[1].schema.metadata[b"bounds"], dtype=np.int64)
    rows = outs[1].slice(b[0], b[1] - b[0])
    assert sorted(rows["k"].to_pylist()) == [f"k{i}" for i in range(10, 15)]


def test_merge_bucket_selects_only_its_slice():
    tbl1 = _mk(["a", "b", "c"], [1, 2, 3])
    tbl2 = _mk(["a", "c", "c"], [10, 20, 30])
    splits = np.asarray([b"b"], dtype="S48")    # 2 buckets: <"b", ≥"b"
    gb = np.asarray([0, 2], dtype=np.int64)     # 1 group of 2 buckets
    p1 = _split_block(splits, _keys, 2, gb, tbl1)
    p2 = _split_block(splits, _keys, 2, gb, tbl2)
    m0 = _merge_bucket(_merge_sum, 0, p1, p2)
    m1 = _merge_bucket(_merge_sum, 1, p1, p2)
    assert dict(zip(m0["k"].to_pylist(), m0["v"].to_pylist())) == \
        {"a": 11}
    assert dict(zip(m1["k"].to_pylist(), m1["v"].to_pylist())) == \
        {"b": 2, "c": 53}


def test_split_block_empty_input_has_valid_bounds():
    tbl = _mk([], [])
    splits = np.asarray([b"m"], dtype="S48")
    gb = np.asarray([0, 1, 2], dtype=np.int64)
    outs = _split_block(splits, _keys, 2, gb, tbl)
    for out in outs:
        b = np.frombuffer(out.schema.metadata[b"bounds"], dtype=np.int64)
        assert out.num_rows == 0 and b[-1] == 0
    # merging the empties still yields merge_fn's schema
    m = _merge_bucket(_merge_sum, 0, *outs[:1])
    assert m.num_rows == 0 and m.column_names == ["k", "v"]


@pytest.mark.parametrize("num_buckets", [1, 3, 16])
def test_range_exchange_matches_pandas_oracle(ray_session, num_buckets):
    """End-to-end exchange on skewed keys == pandas groupby-sum, and
    the output is globally sorted.  num_buckets spans the single-group,
    groups<buckets and groups==buckets regimes on the 4-CPU session."""
    import ray.data as rd

    # local defs: cloudpickle serializes closures by value — a
    # module-level fn from a test file can't be imported by workers
    def keys_fn(batch: pa.Table) -> np.ndarray:
        return arrow_string_keys(batch["k"], 48)

    def merge_fn(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by(["k"], use_threads=False).aggregate([("v", "sum")])
        g = g.rename_columns(["k", "v"])
        return g.sort_by([("k", "ascending")])

    rng = np.random.default_rng(7)
    n = 5000
    # hot key 'hot' takes ~40% of rows (skew); rest uniform
    ks = np.where(rng.random(n) < 0.4, "hot",
                  np.char.add("k", rng.integers(0, 200, n).astype(str)))
    vs = rng.integers(0, 100, n)
    tbl = _mk(list(ks), [int(v) for v in vs])
    ds = rd.from_arrow(tbl).repartition(8).materialize()

    out = range_exchange_merge(ds, key_of=keys_fn, merge_fn=merge_fn,
                               num_buckets=num_buckets)
    got = out.to_pandas()
    assert list(got["k"]) == sorted(got["k"])          # globally sorted
    import pandas as pd

    want = pd.DataFrame({"k": ks, "v": vs}).groupby("k", as_index=False)[
        "v"].sum().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
