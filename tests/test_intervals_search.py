"""Tests for the session-interval / interval-overlap-join family,
set operators, per-key mode, coverage gaps, and the conjunctive
search + PMI collocation operators — each vs a brute-force oracle."""

import numpy as np
import pyarrow as pa
import pytest

from kgforge.functions import events as E
from kgforge.functions import indexing as X
from kgforge.functions import joins as J

US = 1_000_000
MIN = 60 * US


def _events_tbl(rows):
    """rows: (event_id, user_id, ts_us)"""
    eid, uid, ts = zip(*rows)
    return pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(list(ts), pa.timestamp("us")),
    })


@pytest.fixture(scope="module")
def interval_events(ray_session):
    import ray.data as rd

    rows = []
    eid = 0
    # user 1: two sessions — [0, 10min] (3 events), then a 45-min gap
    for m in (0, 5, 10):
        rows.append((eid, 1, m * MIN)); eid += 1
    rows.append((eid, 1, 55 * MIN)); eid += 1
    # user 2: one session overlapping user 1's first [7min, 12min]
    for m in (7, 12):
        rows.append((eid, 2, m * MIN)); eid += 1
    # user 3: isolated much later, no overlap
    rows.append((eid, 3, 600 * MIN)); eid += 1
    # user 4: same-timestamp events as user 1's session start
    rows.append((eid, 4, 0)); eid += 1
    return rd.from_arrow(_events_tbl(rows)).repartition(3)


def test_session_intervals(interval_events):
    iv = E.session_intervals_ds(interval_events, gap_minutes=30) \
        .to_pandas().sort_values(["user_id", "sess"]).reset_index(drop=True)
    got = list(iv.itertuples(index=False, name=None))
    assert got == [
        (1, 1, 0, 10 * MIN, 3),
        (1, 2, 55 * MIN, 55 * MIN, 1),
        (2, 1, 7 * MIN, 12 * MIN, 2),
        (3, 1, 600 * MIN, 600 * MIN, 1),
        (4, 1, 0, 0, 1),
    ]


def test_interval_overlap_matches_bruteforce(interval_events):
    iv_ds = E.session_intervals_ds(interval_events, gap_minutes=30)
    got = E.interval_overlap_pairs_ds(iv_ds).to_pandas()
    got_set = {tuple(r) for r in got.itertuples(index=False, name=None)}

    iv = iv_ds.to_pandas().sort_values(["user_id", "sess"]) \
        .to_dict("records")
    want = set()
    for i in range(len(iv)):
        for j in range(i + 1, len(iv)):
            a, b = iv[i], iv[j]
            if a["start_us"] <= b["end_us"] and b["start_us"] <= a["end_us"]:
                want.add((a["user_id"], a["sess"], b["user_id"], b["sess"],
                          min(a["end_us"], b["end_us"])
                          - max(a["start_us"], b["start_us"])))
    assert got_set == want
    # the known overlaps: u1s1×u2s1 (3 min) and u1s1×u4s1 (instant)
    assert (1, 1, 2, 1, 3 * MIN) in got_set
    assert (1, 1, 4, 1, 0) in got_set
    assert len(got_set) == 2


def test_hour_gaps(ray_session):
    import ray.data as rd

    hour = 3600 * US
    rows = [(0, 1, 0), (1, 1, 1 * hour), (2, 1, 4 * hour),  # miss h2, h3
            (3, 2, 10 * hour)]
    tbl = _events_tbl(rows).append_column(
        "event_type", pa.array(["a", "a", "a", "b"]))
    out = E.hour_gaps_ds(rd.from_arrow(tbl).repartition(2)).to_pandas()
    got = sorted(map(tuple, out.values.tolist()))
    assert got == [("a", 2), ("a", 3)]


def test_mode_per_key_tie_breaks_to_smallest_value(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "v": pa.array(["b", "b", "a", "a", "z", "y"], pa.string()),
    })
    out = E.mode_per_key_ds(rd.from_arrow(tbl).repartition(3), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out.itertuples(index=False, name=None)) == [
        (1, "a", 2),     # tie 2-2 → smallest value
        (2, "y", 1),     # tie 1-1 → smallest value
    ]


def test_set_ops(ray_session):
    import ray.data as rd

    l = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 3, 5],
                                              pa.int64())})).repartition(2)
    r = rd.from_arrow(pa.table({"j": pa.array([2, 3, 3, 4],
                                              pa.int64())})).repartition(2)
    inter = sorted(J.set_op_ds(l, r, "k", "j", "intersect")
                   .to_pandas()["k"])
    exc = sorted(J.set_op_ds(l, r, "k", "j", "except").to_pandas()["k"])
    assert inter == [2, 3]
    assert exc == [1, 5]
    with pytest.raises(ValueError):
        J.set_op_ds(l, r, "k", "j", "union")


@pytest.fixture(scope="module")
def search_docs(ray_session):
    import ray.data as rd

    texts = [
        "key table sort key key",          # all 3, score 5
        "key table sort",                  # all 3, score 3
        "key table table",                 # missing sort
        "sort sort sort",                  # missing key/table
        "",
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)


def test_term_search_requires_all_terms(search_docs):
    out = X.term_search_ds(search_docs, ["key", "table", "sort"], k=10) \
        .to_pandas()
    assert list(out.itertuples(index=False, name=None)) == [
        (0, 5), (1, 3)]


def test_pmi_topk_matches_bruteforce(search_docs):
    out = X.pmi_topk_ds(search_docs, k=50, min_count=1).to_pandas()

    texts = ["key table sort key key", "key table sort",
             "key table table", "sort sort sort", ""]
    from collections import Counter
    uni, bi = Counter(), Counter()
    for t in texts:
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    total = sum(uni.values())
    want = {}
    for (w1, w2), n_ab in bi.items():
        lift = np.float64(n_ab) * np.float64(total) / (
            np.float64(uni[w1]) * np.float64(uni[w2]))
        want[(w1, w2)] = (n_ab, uni[w1], uni[w2],
                          float(np.round(lift, 4)))
    got = {(r.w1, r.w2): (r.n_ab, r.n_a, r.n_b, r.lift)
           for r in out.itertuples(index=False)}
    assert got == want
    # ranking is (lift desc, w1, w2)
    ranks = [(-r.lift, r.w1, r.w2) for r in out.itertuples(index=False)]
    assert ranks == sorted(ranks)


def test_point_in_interval_uncovered_is_null(ray_session):
    import pandas as pd
    import ray.data as rd

    # intervals: user 1 [10, 20] (sess 1); points at 5 (before), 15
    # (inside), 25 (after); user 2 has no interval at all
    iv = rd.from_arrow(pa.table({
        "user_id": pa.array([1], pa.int64()),
        "sess": pa.array([1], pa.int64()),
        "start_us": pa.array([10], pa.int64()),
        "end_us": pa.array([20], pa.int64()),
    }))
    pts = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_id": pa.array([100, 101, 102, 103], pa.int64()),
        "ts": pa.array([5, 15, 25, 15], pa.int64()),
    }))
    out = E.point_in_interval_ds(pts, iv).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert pd.isna(out.loc[0, "sess"])          # before the interval
    assert out.loc[1, "sess"] == 1              # covered
    assert pd.isna(out.loc[2, "sess"])          # after end (asof hit,
    assert pd.isna(out.loc[3, "sess"])          # filtered) / no key


def test_value_deciles_ties_share_bucket(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import value_deciles_ds

    # 10 rows: value 7 appears 5× → all five get the same label
    vals = [1, 2, 3, 7, 7, 7, 7, 7, 9, 10]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "n_chars": pa.array(vals, pa.int64()),
    })).repartition(3)
    out = value_deciles_ds(ds).to_pandas().sort_values("doc_id")
    got = dict(zip(out.n_chars, out.decile))
    # rank-1 per value: 1→0, 2→1, 3→2, 7→3, 9→8, 10→9
    assert got == {1: 0, 2: 1, 3: 2, 7: 3, 9: 8, 10: 9}
    assert set(out[out.n_chars == 7]["decile"]) == {3}


def test_group_outliers_vs_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0, 100, 400), 2)
    groups = np.where(np.arange(400) % 2 == 0, "a", "b")
    tbl = pa.table({
        "event_id": pa.array(np.arange(400), pa.int64()),
        "event_type": pa.array(groups.tolist(), pa.string()),
        "value": pa.array(vals, pa.float64()),
    })
    out = E.group_outliers_ds(rd.from_arrow(tbl).repartition(4), q=0.9) \
        .to_pandas()

    cents = np.round(vals * 100).astype(np.int64)
    want = set()
    for g in ("a", "b"):
        m = groups == g
        srt = np.sort(cents[m])
        thr = srt[int(np.floor((m.sum() - 1) * 0.9))]
        want |= {(i, g, c, thr) for i, c in
                 zip(np.flatnonzero(m), cents[m]) if c > thr}
    got = {tuple(r) for r in out.itertuples(index=False, name=None)}
    assert got == want and len(got) > 0


def test_profile_columns(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import profile_columns_ds

    tbl = pa.table({
        "k": pa.array([3, 1, 2, None, 2], pa.int64()),
        "s": pa.array(["b", None, "a", "a", None], pa.string()),
    })
    out = profile_columns_ds(rd.from_arrow(tbl).repartition(3),
                             ["k", "s"]).to_pandas()
    k = out[out["column"] == "k"].iloc[0]
    assert (k.n_rows, k.n_null, k.n_distinct) == (5, 1, 3)
    assert (k.min_val, k.max_val) == ("1", "3")   # numeric order
    s = out[out["column"] == "s"].iloc[0]
    assert (s.n_rows, s.n_null, s.n_distinct) == (5, 2, 2)
    assert (s.min_val, s.max_val) == ("a", "b")


def test_ego_edges_matches_bfs(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import ego_edges_ds

    # a - b - c - d - e chain plus triangle a-b-f; seed defaults to 'a'
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("a", "f"), ("b", "f")]
    tbl = pa.table({
        "subj": pa.array([p[0] for p in pairs], pa.string()),
        "obj": pa.array([p[1] for p in pairs], pa.string()),
    })
    out = ego_edges_ds(rd.from_arrow(tbl).repartition(2), hops=2,
                       num_partitions=4).to_pandas()
    got = {tuple(r) for r in out.itertuples(index=False, name=None)}
    # 2 hops from a: {a, b, f, c}; induced edges among them
    assert got == {("a", "b"), ("a", "f"), ("b", "f"), ("b", "c")}

    # paths agree: force the broadcast lane to spill to the
    # distributed cogroup lane mid-expansion (threshold of 1 spills
    # after the first hop) and at hop zero (threshold 0)
    for cap in (0, 1):
        spilled = ego_edges_ds(rd.from_arrow(tbl).repartition(2),
                               hops=2, num_partitions=4,
                               driver_max_members=cap).to_pandas()
        assert {tuple(r) for r in
                spilled.itertuples(index=False, name=None)} == got


def test_group_corr_matches_numpy(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 300
    vals = np.round(rng.uniform(0, 50, n), 2)
    ts = pa.array((rng.integers(0, 96, n) * 3_600_000_000).tolist(),
                  pa.timestamp("us"))
    tbl = pa.table({
        "event_type": pa.array(["a" if i % 2 else "b"
                                for i in range(n)], pa.string()),
        "ts": ts,
        "value": pa.array(vals, pa.float64()),
    })
    out = E.group_corr_ds(rd.from_arrow(tbl).repartition(4)) \
        .to_pandas().set_index("event_type")

    cents = np.round(vals * 100).astype(np.int64)
    hod = (np.asarray(ts.cast(pa.int64())) // 3_600_000_000) % 24
    for g in ("a", "b"):
        m = np.array(["a" if i % 2 else "b" for i in range(n)]) == g
        want_r = np.corrcoef(cents[m], hod[m])[0, 1]
        want_cov = np.cov(cents[m], hod[m], ddof=1)[0, 1]
        assert abs(out.loc[g, "corr_r"] - want_r) < 1e-9
        assert abs(out.loc[g, "covar_samp"] - want_cov) < 1e-6
        assert out.loc[g, "n"] == int(m.sum())


def test_edit_distance_pairs_matches_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from kgforge.functions.dedup import edit_distance_pairs_ds

    def ed(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    vals = ["cat", "cut", "cast", "cats", "dog", "dig", "dg", "xy",
            "yx", "abc", "abc", "ab", "a", "", "b", "Customer#1",
            "Customer#2", "Customer#12", "kitten", "sitten", "sittin",
            "日本", "日木", "日"]
    tbl = pa.table({"c_name": pa.array(vals, pa.string())})
    out = edit_distance_pairs_ds(
        rd.from_arrow(tbl).repartition(3), "c_name",
        num_partitions=8).to_pandas()
    got = {tuple(r) for r in out.itertuples(index=False, name=None)}
    want = {(a, b) for a, b in
            itertools.combinations(sorted(set(vals)), 2)
            if ed(a, b) == 1}
    assert got == want


def test_pack_chunks_layout_invariant_and_exact(ray_session):
    import hashlib

    import ray.data as rd

    from kgforge.functions.indexing import pack_chunks_ds

    rng = np.random.default_rng(5)
    n = 120
    toks = rng.integers(1, 64, n).astype(np.int64)
    tbl = pa.table({
        "doc_id": pa.array((np.arange(n) // 3).tolist(), pa.int64()),
        "chunk_idx": pa.array((np.arange(n) % 3).tolist(), pa.int64()),
        "n_tokens": pa.array(toks),
    })
    outs = []
    for parts in (2, 7):
        out = pack_chunks_ds(rd.from_arrow(tbl).repartition(parts),
                             capacity=100, num_partitions=8) \
            .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
            .reset_index(drop=True)
        outs.append(out)
    assert outs[0].equals(outs[1])          # layout-invariant

    # brute force: hash order, exclusive prefix // capacity
    def h(d, c):
        return int(hashlib.md5(f"{d}#{c}".encode()).hexdigest()[:16], 16)

    rows = sorted(
        ((h(d, c), d, c, t) for d, c, t in
         zip(tbl["doc_id"].to_pylist(), tbl["chunk_idx"].to_pylist(),
             toks.tolist())))
    off = 0
    want = {}
    for _, d, c, t in rows:
        want[(d, c)] = (off // 100, off % 100)
        off += t
    got = {(r.doc_id, r.chunk_idx): (r.bin, r.bin_offset)
           for r in outs[0].itertuples(index=False)}
    assert got == want


def test_negative_samples_are_nonedges_and_deterministic(ray_session):
    import hashlib

    import ray.data as rd

    from kgforge.functions.graph import negative_samples_ds

    pairs = [("a", "r1", "b"), ("b", "r1", "c"), ("c", "r2", "d"),
             ("d", "r1", "e"), ("a", "r2", "c")]
    tbl = pa.table({
        "subj": pa.array([p[0] for p in pairs], pa.string()),
        "pred": pa.array([p[1] for p in pairs], pa.string()),
        "obj": pa.array([p[2] for p in pairs], pa.string()),
    })
    outs = []
    for parts in (1, 3):
        out = negative_samples_ds(rd.from_arrow(tbl).repartition(parts),
                                  num_partitions=4) \
            .to_pandas().sort_values(["subj", "pred", "neg_obj"]) \
            .reset_index(drop=True)
        outs.append(out)
    assert outs[0].equals(outs[1])                  # layout-invariant

    adj = set()
    for s, _, o in pairs:
        adj |= {(s, o), (o, s)}
    nodes = sorted({x for s, _, o in pairs for x in (s, o)})
    want = set()
    for s, r, o in pairs:
        h = int(hashlib.md5(f"{s}#{r}#{o}".encode()).hexdigest()[:16],
                16)
        neg = nodes[h % len(nodes)]
        if neg != o and (s, neg) not in adj:
            want.add((s, r, neg))
    got = {tuple(x) for x in outs[0].itertuples(index=False, name=None)}
    assert got == want
    for s, _, neg in got:
        assert (s, neg) not in adj
