"""Cogroup / shuffle equi-join (kgforge.functions.joins)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _sides(rd):
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 4], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d"], pa.string()),
    })).repartition(2)
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 2, 2, 3], pa.int64()),
        "rv": pa.array([10, 20, 21, 30], pa.int64()),
    })).repartition(2)
    return left, right


def test_shuffle_join_inner(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import shuffle_join_ds

    left, right = _sides(rd)
    out = shuffle_join_ds(left, right, "k", "rk", ["lv"], ["rv"]) \
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    # k=1: 2 left x 1 right; k=2: 1 x 2; k=3/4 dropped
    assert out.k.tolist() == [1, 1, 2, 2]
    assert out.lv.tolist() == ["a", "b", "c", "c"]
    assert out.rv.tolist() == [10, 10, 20, 21]


def test_shuffle_join_left_outer(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import shuffle_join_ds

    left, right = _sides(rd)
    out = shuffle_join_ds(left, right, "k", "rk", ["lv"], ["rv"],
                          how="left").to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    assert len(out) == 5  # 4 matches + the k=4 miss
    miss = out[out.k == 4]
    assert miss.lv.tolist() == ["d"] and miss.rv.isna().all()
    # typed null: rv stays numeric, not object
    assert out.rv.dtype.kind in "if"


def test_shuffle_join_right_outer(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import shuffle_join_ds

    left, right = _sides(rd)
    out = shuffle_join_ds(left, right, "k", "rk", ["lv"], ["rv"],
                          how="right").to_pandas() \
        .sort_values(["k", "rv"]).reset_index(drop=True)
    # matches as inner, plus right-only k=3 with null left payload
    assert out.k.tolist() == [1, 1, 2, 2, 3]
    assert out.rv.tolist() == [10, 10, 20, 21, 30]
    assert out.lv.tolist()[:4] == ["a", "b", "c", "c"]
    assert out.lv.isna().tolist() == [False] * 4 + [True]


def test_shuffle_join_full_outer(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import shuffle_join_ds

    left, right = _sides(rd)
    out = shuffle_join_ds(left, right, "k", "rk", ["lv"], ["rv"],
                          how="full").to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    # inner matches + left-only k=4 + right-only k=3
    assert sorted(out.k.tolist()) == [1, 1, 2, 2, 3, 4]
    assert out[out.k == 3].rv.tolist() == [30]
    assert out[out.k == 3].lv.isna().all()
    assert out[out.k == 4].rv.isna().all()
    assert out[out.k == 4].lv.tolist() == ["d"]


def test_cogroup_aggregate_fusion(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import cogroup_ds

    left, right = _sides(rd)

    def per_key(key, lt, rt):
        return pa.table({
            "k": pa.array([key.as_py()], pa.int64()),
            "nl": pa.array([lt.num_rows], pa.int64()),
            "sum_rv": pa.array(
                [int(np.nan_to_num(rt["rv"].combine_chunks()
                     .to_numpy(zero_copy_only=False)).sum())
                 if rt.num_rows else 0], pa.int64()),
        })

    out = cogroup_ds(left, right, "k", "rk", per_key, ["lv"], ["rv"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out.k.tolist() == [1, 2, 3, 4]
    assert out.nl.tolist() == [2, 1, 0, 1]
    assert out.sum_rv.tolist() == [10, 41, 30, 0]


def test_join_name_collision_raises(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import shuffle_join_ds

    left, right = _sides(rd)
    with pytest.raises(ValueError, match="collision"):
        shuffle_join_ds(left, right, "k", "rk", ["lv"], ["lv"])


def test_cogroup_partition_vectorized(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import cogroup_partition_ds

    left, right = _sides(rd)

    def fn(t, starts, nl, nr):
        # per-key left-count / right-sum in one segment pass
        rv = np.nan_to_num(
            t["rv"].to_pandas().to_numpy(dtype="float64")).astype(np.int64)
        sums = np.add.reduceat(rv, starts) if len(starts) else rv[:0]
        return pa.table({
            "k": t["__k"].take(pa.array(starts)),
            "nl": pa.array(nl, pa.int64()),
            "sum_rv": pa.array(sums, pa.int64()),
        })

    out = cogroup_partition_ds(left, right, "k", "rk", fn, ["lv"], ["rv"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out.k.tolist() == [1, 2, 3, 4]
    assert out.nl.tolist() == [2, 1, 0, 1]
    assert out.sum_rv.tolist() == [10, 41, 30, 0]

def test_table_diff_statuses(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import table_diff_ds

    left = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c", "m", "m"], pa.string()),
        "v_old": pa.array([1, 2, 3, 7, 8], pa.int64()),
    })).repartition(2)
    right = rd.from_arrow(pa.table({
        # a unchanged, b changed, c missing (removed), d new (added),
        # m is a multi-row key with a differing multiset
        "k": pa.array(["a", "b", "d", "m", "m"], pa.string()),
        "v": pa.array([1, 20, 4, 7, 9], pa.int64()),
    })).repartition(2)
    out = table_diff_ds(left, right, "k", "k", ["v_old"], ["v"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    got = {(r.k, r.status) for r in out.itertuples(index=False)}
    assert got == {("b", "changed"), ("c", "removed"), ("d", "added"),
                   ("m", "changed")}
    assert out[out.k == "d"]["v"].iloc[0] == 4
    assert pd.isna(out[out.k == "c"]["v"].iloc[0])


def test_table_diff_multiset_equal_keys_silent(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import table_diff_ds

    # same multiset in different row order → NOT a diff
    left = rd.from_arrow(pa.table({
        "k": pa.array(["x", "x"], pa.string()),
        "v_old": pa.array([5, 6], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(["x", "x"], pa.string()),
        "v": pa.array([6, 5], pa.int64()),
    }))
    out = table_diff_ds(left, right, "k", "k", ["v_old"], ["v"])
    assert out.count() == 0


def test_count_distribution_includes_zero(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import count_distribution_ds

    parents = rd.from_arrow(pa.table({
        "p": pa.array([1, 2, 3, 4], pa.int64())})).repartition(2)
    # p=1 has 3 children, p=2 has 1, p=3/4 none; orphan child k=9
    children = rd.from_arrow(pa.table({
        "c": pa.array([1, 1, 1, 2, 9], pa.int64())})).repartition(2)
    parts = count_distribution_ds(parents, "p", children, "c") \
        .to_pandas()
    dist = parts.groupby("c_count")["freq"].sum().to_dict()
    assert dist == {0: 2, 1: 1, 3: 1}


def test_dormant_above_avg_exact_threshold(ray_session):
    import ray.data as rd

    from kgforge.functions.joins import dormant_above_avg_ds

    # positive balances: 100, 200, 300, 250 → mean 212.5; the strict
    # integer compare keeps 300 and 250; negatives never qualify
    parents = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "seg": pa.array(["A", "A", "B", "B", "A"], pa.string()),
        "cents": pa.array([100, 200, 300, -50, 250], pa.int64()),
    })).repartition(2)
    # id=3 has a child → excluded; id=5 has none → kept
    children = rd.from_arrow(pa.table({
        "k": pa.array([3, 3, 1], pa.int64())})).repartition(2)
    parts = dormant_above_avg_ds(parents, "id", "seg", "cents",
                                 children, "k").to_pandas()
    g = parts.groupby("seg").sum()
    assert g.loc["A", "numcust"] == 1
    assert g.loc["A", "tot_cents"] == 250
    assert "B" not in g.index
