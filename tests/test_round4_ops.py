"""Round-4 operators: HLL distinct sketch, BPE pre-tokenizer stats,
token-rarity scores — each against an independent brute-force oracle."""

import re

import numpy as np
import pyarrow as pa


def test_hll_distinct_accuracy_and_determinism(ray_session):
    """HLL estimate within the 4096-register error envelope of the
    exact distinct count, and bit-identical across layouts (registers
    merge by max → partition-independent)."""
    import ray.data as rd

    from kgforge.functions.sketches import hll_distinct_ds

    rng = np.random.RandomState(5)
    # three keys with very different cardinalities
    keys, vals = [], []
    for key, card, n in (("a", 37, 2_000), ("b", 5_000, 20_000),
                         ("c", 1, 50)):
        keys += [key] * n
        vals += rng.randint(0, card, n).tolist()
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.int64())})
    exact = {}
    for key in ("a", "b", "c"):
        m = np.array(keys) == key
        exact[key] = len(set(np.array(vals)[m].tolist()))

    out1 = hll_distinct_ds(rd.from_arrow(t).repartition(7),
                           "k", "v").to_pandas().set_index("k")
    out2 = hll_distinct_ds(rd.from_arrow(t).repartition(2),
                           "k", "v").to_pandas().set_index("k")
    # layout invariance: same registers whatever the block structure
    assert out1.sort_index().equals(out2.sort_index())
    for key in ("a", "b", "c"):
        est = int(out1.loc[key, "n_distinct_est"])
        # 5 sigma of the 1.04/sqrt(4096) ≈ 1.6% envelope, floor of 2
        tol = max(2, int(0.09 * exact[key]))
        assert abs(est - exact[key]) <= tol, (key, est, exact[key])


def test_bpe_token_stats_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import bpe_token_stats

    texts = ["hello world 42!", "a1b2c3", "   ", "", "x--y..z 007",
             "CamelCase And UPPER 12.5% (ok)"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = rd.from_arrow(t).map_batches(
        bpe_token_stats, batch_format="pyarrow").to_pandas() \
        .set_index("doc_id")
    for i, s in enumerate(texts):
        a = len(re.findall(r"[A-Za-z]+", s))
        d = len(re.findall(r"[0-9]+", s))
        o = len(re.findall(r"[^A-Za-z0-9\s]+", s))
        assert out.loc[i, "n_alpha_runs"] == a
        assert out.loc[i, "n_num_runs"] == d
        assert out.loc[i, "n_other_runs"] == o
        assert out.loc[i, "n_bpe_tokens"] == a + d + o


def test_doc_rarity_bruteforce(ray_session):
    import collections

    import ray.data as rd

    from kgforge.functions.indexing import doc_rarity_ds

    texts = ["the cat sat", "the the dog", "rare unique words here",
             "the cat again"]
    toks = [t.split() for t in texts]
    corpus = collections.Counter(w for ws in toks for w in ws)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = doc_rarity_ds(rd.from_arrow(t).repartition(3)).to_pandas() \
        .set_index("doc_id")
    for i, ws in enumerate(toks):
        cts = [corpus[w] for w in ws]
        assert out.loc[i, "n_tokens"] == len(ws)
        assert out.loc[i, "sum_ct"] == sum(cts)
        assert out.loc[i, "min_ct"] == min(cts)
        assert out.loc[i, "mean_ct"] == float(sum(cts)) / len(ws)


def test_semantic_dup_matches_within_cluster_exact(ray_session):
    """SemDeDup blocking: the reported pairs are EXACTLY the pairs of
    same-cluster vectors with cosine >= tau (brute-force oracle over
    the same deterministic assignment), and the result is
    layout-invariant."""
    import ray.data as rd

    from kgforge.functions.clustering import _assign, _kmeans_fit
    from kgforge.functions.dedup import semantic_dup_pairs_ds

    rng = np.random.RandomState(9)
    base = rng.standard_normal((40, 16))
    # 10 near-dups: tiny perturbations of the first 10 rows
    dups = base[:10] + 0.01 * rng.standard_normal((10, 16))
    mat = np.vstack([base, dups])
    ids = np.arange(len(mat), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(mat.tolist(),
                                        pa.list_(pa.float64()))})
    ds1 = rd.from_arrow(t).repartition(5)
    out1 = semantic_dup_pairs_ds(ds1, k=4, tau=0.9,
                                 vec_col="embedding").to_pandas()
    out2 = semantic_dup_pairs_ds(rd.from_arrow(t).repartition(2),
                                 k=4, tau=0.9,
                                 vec_col="embedding").to_pandas()

    def norm(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert norm(out1).equals(norm(out2))          # layout-invariant

    cents = _kmeans_fit(rd.from_arrow(t), 4, 5, "embedding", "vec_id")
    a = _assign(mat, cents)
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = unit @ unit.T
    expect = {(int(i), int(j))
              for i in range(len(mat)) for j in range(i + 1, len(mat))
              if a[i] == a[j] and sims[i, j] >= 0.9}
    got = {(int(r.id_a), int(r.id_b)) for _, r in out1.iterrows()}
    assert got == expect and len(expect) >= 10


def test_cube_hourly_levels(ray_session):
    """CUBE = leaf + both marginals + grand total, all consistent."""
    import datetime as dt

    import ray.data as rd

    from kgforge.functions.events import cube_hourly_ds

    base = dt.datetime(2024, 1, 1)
    rows = [{"event_type": "a", "ts": base.replace(hour=1), "value": 1.0},
            {"event_type": "a", "ts": base.replace(hour=2), "value": 2.0},
            {"event_type": "b", "ts": base.replace(hour=1), "value": 3.0}]
    out = cube_hourly_ds(rd.from_items(rows)).to_pandas()
    gr = out[(out.event_type == "<all>") & (out.hod == "<all>")]
    assert int(gr.n_events.iloc[0]) == 3
    assert int(gr.sum_cents.iloc[0]) == 600
    # hod marginal: hour 1 over both types
    h1 = out[(out.event_type == "<all>") & (out.hod == "1")]
    assert int(h1.n_events.iloc[0]) == 2 and int(h1.sum_cents.iloc[0]) == 400
    # type marginal
    ta = out[(out.event_type == "a") & (out.hod == "<all>")]
    assert int(ta.n_events.iloc[0]) == 2 and int(ta.sum_cents.iloc[0]) == 300
    assert len(out) == 2 + 3 + 2 + 1   # leaves + ... (3 leaves, 2 type, 2 hod, 1 grand)


def test_window_rank_matches_pandas(ray_session):
    """row_number/rank/dense_rank/lag per key vs a pandas window
    oracle, with deliberate value ties inside and across keys."""
    import pandas as pd
    import ray.data as rd

    from kgforge.functions.events import window_rank_ds

    rng = np.random.RandomState(11)
    n = 4_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 60, n).astype(np.int64),
        # coarse grid => plenty of exact ties per user
        "value": rng.randint(0, 25, n) / 4.0,
    })
    out = window_rank_ds(rd.from_pandas(df).repartition(9),
                         num_partitions=8).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    ref = df.assign(vc=np.round(df.value * 100).astype(np.int64)) \
        .sort_values(["user_id", "vc", "event_id"],
                     ascending=[True, False, True], kind="mergesort")
    g = ref.groupby("user_id", sort=False)
    ref = ref.assign(
        rn=(g.cumcount() + 1).astype("int64"),
        rnk=g["vc"].rank(method="min", ascending=False).astype("int64"),
        drnk=g["vc"].rank(method="dense", ascending=False).astype("int64"),
        prev_cents=g["vc"].shift(1),
    ).sort_values("event_id").reset_index(drop=True)

    assert (out.rn.to_numpy() == ref.rn.to_numpy()).all()
    assert (out.rnk.to_numpy() == ref.rnk.to_numpy()).all()
    assert (out.drnk.to_numpy() == ref.drnk.to_numpy()).all()
    got_prev = out.prev_cents.to_numpy(dtype=float, na_value=np.nan)
    want_prev = ref.prev_cents.to_numpy(dtype=float, na_value=np.nan)
    assert ((got_prev == want_prev) | (np.isnan(got_prev)
                                       & np.isnan(want_prev))).all()


def test_mixture_sample_apportion_and_layout_invariance(ray_session):
    """Largest-remainder apportionment sums to k and is exact for
    round shares; the sampled set is identical across block layouts
    (content-hash order, not scheduling order)."""
    import pandas as pd
    import ray.data as rd

    from kgforge.functions.sampling import (
        mixture_apportion, mixture_sample_ds,
    )

    assert mixture_apportion({"a": 1, "b": 1, "c": 1}, 10) \
        == {"a": 4, "b": 3, "c": 3}
    ns = mixture_apportion({"w": 0.5, "x": 0.25, "y": 0.15, "z": 0.1}, 40)
    assert sum(ns.values()) == 40 and ns == {"w": 20, "x": 10,
                                             "y": 6, "z": 4}

    df = pd.DataFrame({
        "doc_id": np.arange(900, dtype=np.int64),
        "source": [f"s{i % 3}" for i in range(900)],
    })
    w = {"s0": 2.0, "s1": 1.0}  # s2 excluded from the mixture
    a = mixture_sample_ds(rd.from_pandas(df).repartition(11), w, k=30) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = mixture_sample_ds(rd.from_pandas(df).repartition(2), w, k=30) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    counts = a.source.value_counts().to_dict()
    assert counts == {"s0": 20, "s1": 10}
    assert not (a.source == "s2").any()


def test_bloom_semi_join_exact_under_false_positives(ray_session):
    """With a deliberately tiny bitmap (high fp rate) the bloom
    pre-filter passes extra keys, but the verify cogroup drops every
    false positive — result identical to an exact semi-join; string
    keys exercise the blake2b key path."""
    import pandas as pd
    import ray.data as rd

    from kgforge.functions.joins import (
        _bloom_positions, _key_u64, bloom_semi_join_ds,
    )

    left = pd.DataFrame({"k": np.arange(2_000, dtype=np.int64),
                         "payload": [f"v{i}" for i in range(2_000)]})
    right = pd.DataFrame({"rk": np.arange(0, 2_000, 40,
                                          dtype=np.int64)})  # 50 keys
    m_bits = 256  # ~50 keys × 4 hashes in 256 bits → many fps
    # confirm the bloom alone WOULD over-select (the lane is real)
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    posr = _bloom_positions(right.rk.to_numpy().astype(np.uint64),
                            m_bits, 4)
    np.bitwise_or.at(words, (posr >> np.uint64(6)).ravel(),
                     np.uint64(1) << (posr.ravel() & np.uint64(63)))
    posl = _bloom_positions(left.k.to_numpy().astype(np.uint64),
                            m_bits, 4)
    hit = np.ones(len(left), dtype=bool)
    for i in range(4):
        hit &= (words[(posl[i] >> np.uint64(6)).astype(np.int64)]
                >> (posl[i] & np.uint64(63))) & np.uint64(1) != 0
    assert hit.sum() > 50  # false positives exist at this size

    out = bloom_semi_join_ds(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        "k", "rk", ["payload"], m_bits=m_bits, n_hashes=4) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = left[left.k.isin(right.rk)].reset_index(drop=True)
    assert out.k.tolist() == want.k.tolist()
    assert out.payload.tolist() == want.payload.tolist()

    # string keys → blake2b path
    sleft = pd.DataFrame({"k": [f"id{i}" for i in range(300)]})
    sright = pd.DataFrame({"rk": [f"id{i}" for i in range(0, 300, 7)]})
    sout = bloom_semi_join_ds(rd.from_pandas(sleft),
                              rd.from_pandas(sright), "k", "rk", []) \
        .to_pandas()
    assert sorted(sout.k.tolist()) == sorted(sright.rk.tolist())


def test_cross_source_contamination_matrix(ray_session):
    """Pair cells equal a brute-force distinct-8-gram intersection per
    source pair; totals equal per-source distinct counts; result is
    layout-invariant (hash-partitioned fold, order fixed by the final
    lexsort)."""
    import ray.data as rd

    from kgforge.functions.dedup import cross_source_contamination_ds

    span = "w1 w2 w3 w4 w5 w6 w7 w8"
    texts = [
        ("A", f"a0 {span} a1 a2"),        # A shares span with B and C
        ("B", f"{span} b0 b1 b2 b3"),
        ("C", f"c0 c1 {span}"),
        ("C", "u0 u1 u2 u3 u4 u5 u6 u7 u8"),  # C-only grams
        ("D", "short doc"),               # < 8 tokens → no grams
    ]
    tbl = pa.table({"source": pa.array([s for s, _ in texts]),
                    "text": pa.array([t for _, t in texts])})

    def grams(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 8]) for i in range(len(w) - 7)}

    per_src = {}
    for s, t in texts:
        per_src.setdefault(s, set()).update(grams(t))

    for nparts in (1, 4):
        out = cross_source_contamination_ds(
            rd.from_arrow(tbl).repartition(nparts), n=8).to_pandas()
        want_pairs = {}
        for a in per_src:
            for b in per_src:
                if a < b and per_src[a] & per_src[b]:
                    want_pairs[(a, b)] = len(per_src[a] & per_src[b])
        got = {(r.src_a, r.src_b): r.shared_ngrams
               for r in out.itertuples()}
        assert got == want_pairs
        for r in out.itertuples():
            assert r.ngrams_a == len(per_src[r.src_a])
            assert r.ngrams_b == len(per_src[r.src_b])
        # sorted by (src_a, src_b)
        assert out[["src_a", "src_b"]].values.tolist() == \
            sorted(out[["src_a", "src_b"]].values.tolist())


def test_type_token_ratio_exact(ray_session):
    """n_types is an exact distinct count (no hash stand-in) and the
    ppm ratio uses floor integer division; empty text yields the
    single empty token (split(' ') semantics, n_tokens=1)."""
    import ray.data as rd

    from kgforge.functions.textstats import type_token_ratio_ds

    texts = ["a b a b a", "x y z", "", "q q q q", None]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = type_token_ratio_ds(rd.from_arrow(tbl).repartition(2)) \
        .to_pandas().set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        toks = (t or "").split(" ")
        assert out.loc[i, "n_tokens"] == len(toks)
        assert out.loc[i, "n_types"] == len(set(toks))
        assert out.loc[i, "ttr_ppm"] == \
            len(set(toks)) * 1_000_000 // len(toks)


def test_json_field_stats_matches_json_loads(ray_session):
    """Regex extraction agrees with a real JSON parse on well-formed
    payloads; rows without the field are dropped; partials merge
    across partitions (Sum/Min/Max are layout-invariant)."""
    import json

    import ray.data as rd

    from kgforge.functions.events import json_field_stats_ds

    props = [json.dumps({"k": v}) for v in (-5, 0, 7, 7, 123)] + \
        ['{"other": 1}', None]
    types = ["a", "a", "b", "b", "b", "a", "b"]
    tbl = pa.table({"event_type": pa.array(types, pa.string()),
                    "props": pa.array(props, pa.string())})
    for nparts in (1, 3):
        out = json_field_stats_ds(rd.from_arrow(tbl).repartition(nparts)) \
            .to_pandas().set_index("event_type").sort_index()
        want = {}
        for t, p in zip(types, props):
            if p is None:
                continue
            d = json.loads(p)
            if "k" in d:
                want.setdefault(t, []).append(d["k"])
        assert set(out.index) == set(want)
        for t, vs in want.items():
            assert out.loc[t, "n"] == len(vs)
            assert out.loc[t, "sum_k"] == sum(vs)
            assert out.loc[t, "min_k"] == min(vs)
            assert out.loc[t, "max_k"] == max(vs)


def test_rank_transform_exact_and_layout_invariant(ray_session):
    """rank_lt equals the brute-force strict-smaller count (ties share
    a rank) and the broadcast histogram plan is partition-independent."""
    import ray.data as rd

    from kgforge.functions.events import rank_transform_ds

    rng = np.random.RandomState(11)
    vals = np.round(rng.uniform(0, 50, 400), 2)
    vals[::7] = vals[0]                       # force ties
    tbl = pa.table({"event_id": pa.array(range(400), pa.int64()),
                    "value": pa.array(vals, pa.float64())})
    cents = np.round(vals * 100).astype(np.int64)
    want_rank = np.array([(cents < c).sum() for c in cents])
    for nparts in (1, 5):
        out = rank_transform_ds(rd.from_arrow(tbl).repartition(nparts)) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        assert (out.rank_lt.to_numpy() == want_rank).all()
        assert (out.value_cents.to_numpy() == cents).all()
        assert (out.pct_ppm.to_numpy() ==
                want_rank * 1_000_000 // 399).all()


def test_setsim_join_exact_vs_bruteforce(ray_session):
    """Prefix-filtered join returns EXACTLY the brute-force Jaccard-
    threshold pairs with exact inter/union, across layouts and at a
    threshold low enough that prefixes are short (stress pruning)."""
    import ray.data as rd

    from kgforge.functions.dedup import setsim_join_ds

    rng = np.random.RandomState(3)
    vocab = [f"t{i}" for i in range(50)]
    base = [vocab[i] for i in rng.randint(0, 50, 40)]
    texts = []
    for i in range(12):
        words = list(base)
        for _ in range(rng.randint(0, 25)):     # mutate
            words[rng.randint(0, 40)] = vocab[rng.randint(0, 50)]
        texts.append(" ".join(words))
    texts.append(" ".join(vocab[i] for i in rng.randint(0, 50, 6)))

    def grams(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 8]) for i in range(len(w) - 7)}

    gs = [grams(t) for t in texts]
    tau = 200_000
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            it = len(gs[i] & gs[j])
            un = len(gs[i] | gs[j])
            if un and it * 1_000_000 >= tau * un:
                want[(i, j)] = (it, un)

    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    for nparts in (1, 4):
        out = setsim_join_ds(rd.from_arrow(tbl).repartition(nparts),
                             n=8, tau_ppm=tau).to_pandas()
        got = {(r.doc_a, r.doc_b): (r.inter, r.un)
               for r in out.itertuples()}
        assert got == want
        for r in out.itertuples():
            assert r.jacc_ppm == r.inter * 1_000_000 // r.un


def test_group_regression_exact_slope(ray_session):
    """Moment partials merge across layouts; slope num/den equal the
    textbook integers; ppm uses truncate-toward-zero (DuckDB //)."""
    import json

    import ray.data as rd

    from kgforge.functions.events import group_regression_ds

    rng = np.random.RandomState(7)
    xs = rng.randint(-20, 100, 300)
    # y correlates negatively for group a, positively for b
    types = np.where(np.arange(300) % 2 == 0, "a", "b")
    y = np.where(types == "a", 50.0 - 0.8 * xs, 3.0 + 1.3 * xs) \
        + rng.uniform(-1, 1, 300)
    tbl = pa.table({
        "event_type": pa.array(types.tolist(), pa.string()),
        "props": pa.array([json.dumps({"k": int(v)}) for v in xs]),
        "value": pa.array(np.round(y, 2), pa.float64())})
    for nparts in (1, 4):
        out = group_regression_ds(rd.from_arrow(tbl)
                                  .repartition(nparts)) \
            .to_pandas().set_index("event_type").sort_index()
        for t in ("a", "b"):
            m = types == t
            xi = xs[m].astype(object)          # exact Python ints
            yi = np.round(np.round(y[m], 2) * 100).astype(np.int64) \
                .astype(object)
            n = int(m.sum())
            nu = n * int((xi * yi).sum()) - int(xi.sum()) * int(yi.sum())
            de = n * int((xi * xi).sum()) - int(xi.sum()) ** 2
            assert out.loc[t, "slope_num"] == nu
            assert out.loc[t, "slope_den"] == de
            q = abs(nu) * 1_000_000 // abs(de)
            assert out.loc[t, "slope_ppm"] == \
                (q if (nu >= 0) == (de >= 0) else -q)
            assert (out.loc[t, "slope_ppm"] < 0) == (t == "a")


def test_orphan_audit_counts(ray_session):
    """Partial rows sum to the brute-force orphan row/key counts,
    independent of layout."""
    import ray.data as rd

    from kgforge.functions.joins import orphan_audit_ds

    child = pa.table({"fk": pa.array(
        [1, 1, 2, 3, 3, 3, 9, 9, 7], pa.int64())})
    parent = pa.table({"pk": pa.array([1, 2, 3, 4], pa.int64())})
    for nparts in (1, 3):
        part = orphan_audit_ds(
            rd.from_arrow(child).repartition(nparts), "fk",
            rd.from_arrow(parent).repartition(2), "pk").to_pandas()
        assert part["n_rows"].sum() == 9
        assert part["n_keys"].sum() == 5
        assert part["orphan_rows"].sum() == 3   # 9,9,7
        assert part["orphan_keys"].sum() == 2   # {9, 7}


def test_topk_paths_prefix_and_ties(ray_session):
    """Prefix truncation at `steps`, shorter-history users included,
    count-desc/path-asc tie order, layout-invariant."""
    import ray.data as rd

    ts = pa.array(np.arange(12, dtype="int64") * 1_000_000,
                  pa.timestamp("us"))
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 5],
                            pa.int64()),
        "ts": ts,
        "event_id": pa.array(range(12), pa.int64()),
        "event_type": pa.array(["a", "b", "c", "d",   # u1: a>b>c
                                "a", "b", "c",        # u2: a>b>c
                                "x", "y", "z",        # u3: x>y>z
                                "a",                  # u4: a
                                "a"], pa.string())})  # u5: a
    from kgforge.functions.events import topk_paths_ds

    for nparts in (1, 4):
        out = topk_paths_ds(rd.from_arrow(tbl).repartition(nparts),
                            k=3, steps=3).to_pandas()
        assert out.path.tolist() == ["a", "a>b>c", "x>y>z"]
        assert out.n_users.tolist() == [2, 2, 1]


def test_skyline_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.relational import skyline_ds

    rng = np.random.RandomState(7)
    x = rng.randint(0, 40, 300).astype(np.int64)
    y = rng.randint(0, 40, 300).astype(np.int64)
    ids = np.arange(300, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(x), "y": pa.array(y)})) \
        .repartition(5)
    got = skyline_ds(ds, "x", "y", ["id"]).to_pandas() \
        .sort_values("id")["id"].tolist()
    # brute-force dominance
    keep = []
    for i in range(300):
        dom = ((x <= x[i]) & (y >= y[i])
               & ((x < x[i]) | (y > y[i]))).any()
        if not dom:
            keep.append(int(ids[i]))
    assert got == keep


def test_dedup_representatives_argmax(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.dedup import dedup_representatives_ds

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        # docs 1/2/3 normalize to the same content; 3 is largest
        "text": pa.array(["a b!", "A  b", "a B?!", "c", "c"],
                         pa.string()),
        "n_chars": pa.array([4, 4, 5, 1, 1], pa.int64()),
    })).repartition(3)
    out = dedup_representatives_ds(ds).to_pandas() \
        .sort_values("rep_id").reset_index(drop=True)
    assert out.rep_id.tolist() == [3, 4]      # ties → smallest id
    assert out.n_dups.tolist() == [3, 2]
    assert out.rep_chars.tolist() == [5, 1]


def test_source_dup_report_partials(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.dedup import source_dup_report_ds

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["x", "X!", "y", "y", "z"], pa.string()),
        "source": pa.array(["s1", "s1", "s1", "s2", "s2"],
                           pa.string()),
    })).repartition(3)
    parts = source_dup_report_ds(ds).to_pandas()
    g = parts.groupby("source").sum()
    assert g.loc["s1", "n_docs"] == 3
    assert g.loc["s1", "n_distinct"] == 2     # x ≡ X! after norm
    assert g.loc["s2", "n_docs"] == 2
    assert g.loc["s2", "n_distinct"] == 2


def test_cooccur_pairs_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.graph import cooccur_pairs_ds

    ds = rd.from_arrow(pa.table({
        "g": pa.array([1, 1, 1, 2, 2, 3, 3, 3], pa.int64()),
        # g1: {10,20,30}; g2: {10,20} (dup 10 ignored); g3: {10,20}
        "it": pa.array([10, 20, 30, 10, 20, 10, 10, 20], pa.int64()),
    })).repartition(3)
    out = cooccur_pairs_ds(ds, ["g"], "it").to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    got = {(r.a, r.b): r.n_groups for r in out.itertuples()}
    assert got == {(10, 20): 3, (10, 30): 1, (20, 30): 1}


def test_kcore_peels_tail(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.graph import kcore_ds

    # triangle a-b-c plus a tail c-d-e: 2-core = the triangle
    edges = rd.from_arrow(pa.table({
        "subj": pa.array(["a", "b", "c", "c", "d"], pa.string()),
        "obj": pa.array(["b", "c", "a", "d", "e"], pa.string()),
    })).repartition(2)
    out = kcore_ds(edges, k=2, rounds=8).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert out.node.tolist() == ["a", "b", "c"]
    assert out.degree.tolist() == [2, 2, 2]


def test_event_transitions_matrix(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.events import event_transitions_ds

    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([10, 20, 30, 10, 20], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "a", "b"], pa.string()),
    })).repartition(3)
    out = event_transitions_ds(ds).to_pandas() \
        .sort_values(["prev_type", "next_type"]).reset_index(drop=True)
    # u1: a→b, b→a; u2: a→b  ⇒ (a,b)=2 of 2 a-starts, (b,a)=1 of 1
    assert out.prev_type.tolist() == ["a", "b"]
    assert out.next_type.tolist() == ["b", "a"]
    assert out.n.tolist() == [2, 1]
    assert out.p_ppm.tolist() == [1_000_000, 1_000_000]


def test_rfm_segments_rank_rule(ray_session):
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.relational import rfm_segments_ds

    # 4 customers with strictly increasing f/m/r → one per quartile
    base = dt.datetime(2000, 1, 1)
    rows = []
    for c in range(4):
        for j in range(c + 1):          # f = 1..4
            rows.append((c, base + dt.timedelta(days=c), 100.0 * (c + 1)))
    ds = rd.from_arrow(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[1] for r in rows],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    })).repartition(3)
    out = rfm_segments_ds(ds).to_pandas() \
        .sort_values("r_q").reset_index(drop=True)
    assert out.r_q.tolist() == [0, 1, 2, 3]
    assert out.f_q.tolist() == [0, 1, 2, 3]
    assert out.m_q.tolist() == [0, 1, 2, 3]
    assert out.n_customers.tolist() == [1, 1, 1, 1]


def test_compression_ratio_flags_repetition(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.textstats import compression_ratio_ds

    import zlib
    rep = "spam ham " * 200
    nat = "the quick brown fox jumps over a lazy dog near the bank " \
          "while seventeen violet engines hum quietly beyond " * 20
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([rep, nat], pa.string())}))
    out = compression_ratio_ds(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # deterministic golden: identical zlib call on the driver
    exp = [len(zlib.compress(t.encode(), 6)) * 1_000_000 // len(t.encode())
           for t in (rep, nat)]
    assert out.ratio_ppm.tolist() == exp
    assert out.ratio_ppm[0] < out.ratio_ppm[1]   # repetition compresses


def test_next_token_topk_rank_rule(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.indexing import next_token_topk_ds

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["a b", "a b", "a c", "a d", "b a"],
                         pa.string())})).repartition(3)
    out = next_token_topk_ds(ds, k=2).to_pandas() \
        .sort_values(["prev", "next"]).reset_index(drop=True)
    # a→b:2, a→c:1, a→d:1 (tie → c wins rank 2); b→a:1
    got = {(r.prev, r.next): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "a"): 1}


def test_time_weighted_avg_trapezoid(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.events import time_weighted_avg_ds

    # u1: 100¢ for 10µs then 300¢ for 10µs → twa = (200*10+400*10)/40
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 10, 20, 5], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "value": pa.array([1.0, 3.0, 1.0, 9.0], pa.float64()),
    })).repartition(2)
    out = time_weighted_avg_ds(ds).to_pandas()
    assert out.user_id.tolist() == [1]        # u2 has one event
    assert out.twa_cents.tolist() == [(400 * 10 + 400 * 10) // 40]


def test_assortativity_star_is_disassortative(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.graph import assortativity_ds

    # star: hub h connected to 3 leaves → pairs mix deg 3 with deg 1
    edges = rd.from_arrow(pa.table({
        "subj": pa.array(["h", "h", "h"], pa.string()),
        "obj": pa.array(["a", "b", "c"], pa.string()),
    })).repartition(2)
    out = assortativity_ds(edges).to_pandas()
    # directed pairs: (3,1)x3 and (1,3)x3 → perfect anti-correlation
    assert out.n_pairs.tolist() == [6]
    assert out.num.tolist()[0] < 0
    assert out.slope_ppm.tolist() == [-1_000_000]


def test_edge_jaccard_vs_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.graph import edge_jaccard_ds

    rng = np.random.RandomState(11)
    edges = set()
    nodes = [f"n{i:02d}" for i in range(12)]
    while len(edges) < 25:
        a, b = rng.choice(12, 2, replace=False)
        edges.add((nodes[min(a, b)], nodes[max(a, b)]))
    el = sorted(edges)
    ds = rd.from_arrow(pa.table({
        "subj": pa.array([e[0] for e in el], pa.string()),
        "obj": pa.array([e[1] for e in el], pa.string()),
    })).repartition(3)
    out = edge_jaccard_ds(ds).to_pandas()
    got = {(r.a, r.b): (r.cn, r.jac_ppm) for r in out.itertuples()}
    nbrs = {n: set() for n in nodes}
    for a, b in el:
        nbrs[a].add(b)
        nbrs[b].add(a)
    exp = {}
    for a, b in el:
        cn = len(nbrs[a] & nbrs[b])
        exp[(a, b)] = (cn, cn * 1_000_000
                       // (len(nbrs[a]) + len(nbrs[b]) - cn))
    assert got == exp


def test_oov_rate_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.textstats import oov_rate_ds

    # vocab_k=2 → vocab {a, b} (counts 3, 2); source s2 has 1 OOV of 3
    ds = rd.from_arrow(pa.table({
        "text": pa.array(["a a b", "a b z", "q"], pa.string()),
        "source": pa.array(["s1", "s2", "s2"], pa.string()),
    })).repartition(2)
    out = oov_rate_ds(ds, vocab_k=2).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    assert out.total.tolist() == [3, 4]
    assert out.oov.tolist() == [0, 2]          # z and q
    assert out.oov_ppm.tolist() == [0, 500_000]


def test_group_share_ppm(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.events import group_share_ds

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "id": pa.array([10, 11, 12], pa.int64()),
        "v": pa.array([1.0, 3.0, 5.0], pa.float64()),
    })).repartition(2)
    out = group_share_ds(ds, by="k", value_col="v", id_col="id") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert out.share_ppm.tolist() == [250_000, 750_000, 1_000_000]


def test_incremental_dedup_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.dedup import incremental_dedup_ds

    old = rd.from_arrow(pa.table({
        "text": pa.array(["alpha", "beta"], pa.string()),
        "source": pa.array(["s", "s"], pa.string())})).repartition(2)
    new = rd.from_arrow(pa.table({
        # ALPHA! normalizes to alpha (dup); gamma is novel
        "text": pa.array(["ALPHA!", "gamma"], pa.string()),
        "source": pa.array(["s1", "s1"], pa.string())})).repartition(2)
    parts = incremental_dedup_ds(old, new).to_pandas()
    g = parts.groupby("source").sum()
    assert g.loc["s1", "n_new"] == 2
    assert g.loc["s1", "n_dup"] == 1


def test_trimmed_mean_decile_rule(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.events import trimmed_mean_ds

    # group "a": 10 distinct values 1.00..10.00 → deciles 0..9; keep
    # ranks 1..8 → cents 200..900, mean 550.  group "n": sorted cents
    # -500,-68,-33 → deciles 0,3,6; keep -68,-33 → sum -101, kn=2 →
    # truncate toward zero = -50 (floor would give -51).
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 10 + ["n"] * 3, pa.string()),
        "value": pa.array([float(i) for i in range(1, 11)]
                          + [-5.00, -0.33, -0.68], pa.float64()),
    })).repartition(3)
    out = trimmed_mean_ds(ds).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert out.event_type.tolist() == ["a", "n"]
    assert out.n_kept.tolist() == [8, 2]
    assert out.trimmed_mean_cents.tolist() == [550, -50]


def test_gini_by_type_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.events import gini_by_type_ds

    # "a": four equal values → perfectly even → 0 ppm.  "b": cents
    # (1, 3) → ric=7, tot=4, n=2 → (14-12)·1e6//8 = 250000.  Zero and
    # negative values are excluded on both engines.
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 4 + ["b", "b", "b", "b"],
                               pa.string()),
        "value": pa.array([1.0, 1.0, 1.0, 1.0,
                           0.01, 0.03, 0.0, -5.0], pa.float64()),
    })).repartition(2)
    out = gini_by_type_ds(ds).to_pandas()
    assert out.event_type.tolist() == ["a", "b"]
    assert out.n.tolist() == [4, 2]
    assert out.gini_ppm.tolist() == [0, 250_000]


def test_fano_by_type_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.events import fano_by_type_ds

    hour = 3_600_000_000
    # "x": hourly counts (2,2) → Fano 0.  "y": (1,3) → (2·10−16)·1e6
    # //(4·2) = 500000.
    ts = [0, 1, hour, hour + 1,               # x: 2 + 2
          0, hour, hour + 1, hour + 2]        # y: 1 + 3
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["x"] * 4 + ["y"] * 4, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })).repartition(3)
    out = fano_by_type_ds(ds).to_pandas()
    assert out.event_type.tolist() == ["x", "y"]
    assert out.hours.tolist() == [2, 2]
    assert out.fano_ppm.tolist() == [0, 500_000]


def test_token_novelty_first_occurrence(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.textstats import token_novelty_ds

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b", "b c", "c"], pa.string()),
    })).repartition(3)
    out = token_novelty_ds(ds).to_pandas()
    # a,b first in doc 1; c first in doc 2; doc 3 contributes nothing
    assert out.doc_id.tolist() == [1, 2]
    assert out.novel_terms.tolist() == [2, 1]


def _write_tpch_mini(tmp_path):
    import datetime as dt
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(1995, 1, 1)
    day = dt.timedelta(days=1)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 11, 10, 11], pa.int64()),
        "o_totalprice": pa.array([111.51, 20.0, 30.0, 40.0],
                                 pa.float64()),
        "o_orderdate": pa.array([t0, t0, t0, t0], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 4, 4], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 3, 2, 3, 2], pa.int64()),
        "l_quantity": pa.array([200.0, 150.0, 60.0, 40.0, 10.0,
                                5.0, 5.0], pa.float64()),
        # order 1: supp1 late, supp2 on time → sole-late, multi-supp
        # order 2: both late → excluded; order 3: single-supp late →
        # excluded; order 4: nobody late
        "l_shipdate": pa.array([t0 + 100 * day, t0 + 10 * day,
                                t0 + 95 * day, t0 + 95 * day,
                                t0 + 200 * day, t0 + day, t0 + day],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11, 12, 13], pa.int64()),
        "c_name": pa.array(["Cust#10", "Cust#11", "Cust#12",
                            "Cust#13"], pa.string()),
        "c_nationkey": pa.array([0, 0, 0, 1], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["Supp#1", "Supp#2", "Supp#3"],
                           pa.string()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
    }), str(tmp_path / "nation.parquet"))
    return str(tmp_path)


def test_large_orders_q18(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_large_orders

    out = q_large_orders(_write_tpch_mini(tmp_path)).to_pandas()
    assert out.o_orderkey.tolist() == [1]      # 350 > 300, others ≤ 100
    assert out.total_qty.tolist() == [350]
    assert out.c_name.tolist() == ["Cust#10"]
    assert out.price_cents.tolist() == [11151]


def test_waiting_suppliers_q21(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_waiting_suppliers

    out = q_waiting_suppliers(_write_tpch_mini(tmp_path)).to_pandas()
    assert out.s_suppkey.tolist() == [1]
    assert out.s_name.tolist() == ["Supp#1"]
    assert out.numwait.tolist() == [1]


def test_pareto_share_cut(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_pareto_share

    out = q_pareto_share(_write_tpch_mini(tmp_path)).to_pandas()
    # nation 0 only (cust 13 has no orders): cust10 = 11151+3000,
    # cust11 = 2000+4000 → top1 = 14151 of 20151 → 2·cum ≥ tot at 1
    assert out.n_name.tolist() == ["ALPHA"]
    assert out.n_top.tolist() == [1]
    assert out.n_customers.tolist() == [2]
    assert out.share_ppm.tolist() == [14151 * 1_000_000 // 20151]


def test_cross_source_dups_pairs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.dedup import cross_source_dups_ds

    ds = rd.from_arrow(pa.table({
        # "hello" digest in s1+s2+s3 (via normalization), "x y" in
        # s1+s2, "unique" only once
        "text": pa.array(["Hello!", "hello", "  hello ", "x y",
                          "X  Y!", "unique"], pa.string()),
        "source": pa.array(["s1", "s2", "s3", "s1", "s2", "s3"],
                           pa.string()),
    })).repartition(3)
    out = cross_source_dups_ds(ds).to_pandas()
    got = {(a, b): int(n) for a, b, n in
           zip(out.src_a, out.src_b, out.n)}
    assert got == {("s1", "s2"): 2, ("s1", "s3"): 1, ("s2", "s3"): 1}


def test_vocab_growth_deciles(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.textstats import vocab_growth_ds

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 5, 9], pa.int64()),
        "text": pa.array(["a b", "a c", "d"], pa.string()),
    })).repartition(2)
    out = vocab_growth_ds(ds).to_pandas()
    assert out.decile.tolist() == [0, 5, 9]
    assert out.new_terms.tolist() == [2, 1, 1]
    assert out.cum_terms.tolist() == [2, 3, 4]


def test_key_gap_dist_day_boundaries(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.events import key_gap_dist_ds

    day = 86_400_000_000
    hr = 3_600_000_000
    # user 1: 23:00 day0 → 01:00 day1 (gap 1 despite 2h elapsed) →
    # day3 (gap 2); user 2: one event → no gap
    ts = [23 * hr, day + hr, 3 * day, 5 * day]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
    })).repartition(2)
    out = key_gap_dist_ds(ds).to_pandas()
    assert out.gap_days.tolist() == [1, 2]
    assert out.n.tolist() == [1, 1]


def _write_tpch_mini2(tmp_path):
    """Mini fixture for the Q7/Q8/Q14/Q17/Q20 shapes: two parts
    (PROMO/ECONOMY), suppliers in NATION_1 and NATION_3, customers in
    the AMERICA region, lineitems with price/discount/partkey."""
    import datetime as dt
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["AMERICA", "EUROPE"], pa.string()),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2", "NATION_3"],
                           pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", "ECONOMY"], pa.string()),
        "p_brand": pa.array(["Brand#A", "Brand#B"], pa.string()),
        "p_retailprice": pa.array([10.0, 20.0], pa.float64()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([0, 2], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_nationkey": pa.array([1, 0], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 11], pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1995, 6, 1),
                                 dt.datetime(1996, 6, 1)],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 1], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2], pa.int64()),
        "l_quantity": pa.array([10.0, 1.0, 39.0, 10.0], pa.float64()),
        "l_extendedprice": pa.array([100.0, 50.0, 200.0, 80.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0, 0.5, 0.25, 0.0], pa.float64()),
        "l_shipdate": pa.array([dt.datetime(1995, 2, 1),
                                dt.datetime(1995, 3, 1),
                                dt.datetime(1996, 2, 1),
                                dt.datetime(1996, 3, 1)],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_promo_share_q14(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_promo_share

    out = q_promo_share(_write_tpch_mini2(tmp_path)).to_pandas()
    assert out.ym.tolist() == [199502, 199503, 199602, 199603]
    assert out.promo_cents.tolist() == [10000, 0, 0, 8000]
    assert out.total_cents.tolist() == [10000, 2500, 15000, 8000]
    assert out.promo_ppm.tolist() == [1_000_000, 0, 0, 1_000_000]


def test_small_qty_revenue_q17(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_small_qty_revenue

    out = q_small_qty_revenue(_write_tpch_mini2(tmp_path)).to_pandas()
    # part1: qty 10,10 → 5·10·2 = 100 ≥ 20 (none); part2: qty 1
    # passes (5·1·2 = 10 < 40), qty 39 fails → Brand#B, undiscounted
    # extendedprice 50.00 = 5000 cents
    assert out.p_brand.tolist() == ["Brand#B"]
    assert out.rev_cents.tolist() == [5000]
    assert out.n_lines.tolist() == [1]


def test_dominant_supplier_q20(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_dominant_supplier

    out = q_dominant_supplier(_write_tpch_mini2(tmp_path)).to_pandas()
    # part2: supp1 ships 39/40 (975000 ppm); part1: 10/20 tie →
    # smaller suppkey wins (supp2 and supp1 both 10 → supp1)
    assert out.l_partkey.tolist() == [2, 1]
    assert out.l_suppkey.tolist() == [1, 1]
    assert out.share_ppm.tolist() == [975000, 500000]


def test_volume_shipping_q7(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_volume_shipping

    out = q_volume_shipping(_write_tpch_mini2(tmp_path)).to_pandas()
    # only line 1 links NATION_1 supplier → NATION_2 customer; line 3
    # is NATION_1 → NATION_1 (dropped), supp2 is NATION_3 (pruned)
    assert out.supp_nation.tolist() == ["NATION_1"]
    assert out.cust_nation.tolist() == ["NATION_2"]
    assert out.l_year.tolist() == [1995]
    assert out.rev_cents.tolist() == [10000]


def test_market_share_q8(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_market_share

    out = q_market_share(_write_tpch_mini2(tmp_path)).to_pandas()
    # ECONOMY lines: (order1, supp2=NATION_3, 2500) and (order2,
    # supp1, 15000); both customers are AMERICA
    assert out.o_year.tolist() == [1995, 1996]
    assert out.nation_cents.tolist() == [2500, 0]
    assert out.total_cents.tolist() == [2500, 15000]
    assert out.share_ppm.tolist() == [1_000_000, 0]


def test_mad_outliers_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.events import mad_outliers_ds

    # group A: values 1..9 plus a wild 100 → med2 = 5+6 = 11,
    # deviations |2v−11| = 9,7,5,3,1,1,3,5,7,189 sorted →
    # 1,1,3,3,5,5,7,7,9,189; mad4 = 5+5 = 10; outlier iff 2d > 30
    # → only 189 (the 100) qualifies.  group B: single value.
    vals = [float(v) for v in range(1, 10)] + [100.0, 7.0]
    types = ["A"] * 10 + ["B"]
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
    })).repartition(3)
    out = mad_outliers_ds(ds, num_partitions=4).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert out.event_type.tolist() == ["A", "B"]
    assert out.n_events.tolist() == [10, 1]
    assert out.med2_cents.tolist() == [1100, 1400]
    assert out.mad4_cents.tolist() == [1000, 0]
    assert out.n_outliers.tolist() == [1, 0]


def test_late_priority_q4(ray_session, tmp_path):
    import datetime as dt
    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_late_priority

    t0 = dt.datetime(1995, 1, 1)
    day = dt.timedelta(days=1)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([t0, t0, t0], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "1-URGENT"],
                                    pa.string()),
    }), str(tmp_path / "orders.parquet"))
    # order 1: one line late (61d); order 2: all ≤ 60d; order 3: late
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_shipdate": pa.array([t0 + 5 * day, t0 + 61 * day,
                                t0 + 60 * day, t0 + 100 * day],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_late_priority(str(tmp_path)).to_pandas()
    assert out.o_orderpriority.tolist() == ["1-URGENT"]
    assert out.n_orders.tolist() == [2]


def test_fertility_by_lang_exact(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import fertility_by_lang_ds

    # en: "hi there 42!" → ws 3, bpe = 3 alpha ("hi","there") wait:
    # alpha runs: hi, there = 2; num runs: 42 = 1; other: ! = 1 → 4
    t = pa.table({
        "text": pa.array(["hi there 42!", "a b", "x1"], pa.string()),
        "lang": pa.array(["en", "en", "fr"], pa.string()),
    })
    out = fertility_by_lang_ds(rd.from_arrow(t).repartition(2)) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    # en: ws = 3+2 = 5, bpe = (2+1+1) + 2 = 6 → 1_200_000 ppm
    # fr: ws = 1, bpe = 2 ("x","1") → 2_000_000 ppm
    assert out.lang.tolist() == ["en", "fr"]
    assert out.n_docs.tolist() == [2, 1]
    assert out.ws_tokens.tolist() == [5, 1]
    assert out.bpe_tokens.tolist() == [6, 2]
    assert out.fertility_ppm.tolist() == [1_200_000, 2_000_000]


def test_session_length_dist_gap_rule(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.events import session_length_dist_ds

    m = 60_000_000
    # user 1: events at 0, 10m, 50m (gap 40m > 30m → sessions of 2,1);
    # user 2: one event → session of 1
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 10 * m, 50 * m, 0], pa.timestamp("us")),
    })).repartition(2)
    out = session_length_dist_ds(ds, num_partitions=4).to_pandas() \
        .sort_values("session_len").reset_index(drop=True)
    assert out.session_len.tolist() == [1, 2]
    assert out.n_sessions.tolist() == [2, 1]


def test_nation_profit_q9(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_nation_profit

    out = q_nation_profit(_write_tpch_mini2(tmp_path)).to_pandas()
    # per line: disc_cents − qty · retail_cents // 10 →
    # r1 10000−1000=9000 (N1, 1995); r2 2500−200=2300 (N3, 1995);
    # r3 15000−7800=7200 (N1, 1996); r4 8000−1000=7000 (N3, 1996)
    assert out.n_name.tolist() == ["NATION_1", "NATION_1",
                                   "NATION_3", "NATION_3"]
    assert out.o_year.tolist() == [1995, 1996, 1995, 1996]
    assert out.profit_cents.tolist() == [9000, 7200, 2300, 7000]


def test_first_touch_attribution(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgforge.functions.events import first_touch_ds

    d = 86_400_000_000
    rows = {
        # user 1: view → click → purchase (touch = view);
        # second purchase 10d later, window starts at 3d → only
        # itself inside → (direct)
        "user_id": pa.array([1, 1, 1, 1, 2, 3, 3], pa.int64()),
        "ts": pa.array([0, d, 2 * d, 10 * d, 0, 5 * d, 5 * d],
                       pa.timestamp("us")),
        "event_id": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int64()),
        # user 2: lone purchase → (direct); user 3: click and
        # purchase at the SAME ts — smaller event_id is "before"
        "event_type": pa.array(["view", "click", "purchase",
                                "purchase", "purchase", "click",
                                "purchase"], pa.string()),
    }
    out = first_touch_ds(rd.from_arrow(pa.table(rows)).repartition(3),
                         num_partitions=4).to_pandas() \
        .sort_values("first_touch").reset_index(drop=True)
    assert out.first_touch.tolist() == ["(direct)", "click", "view"]
    assert out.n_conversions.tolist() == [2, 1, 1]


def test_winnow_pairs_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from kgforge.common.hashing import md5_u64_arr
    from kgforge.functions.dedup import winnow_pairs_ds

    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "a quick brown fox jumps over the lazy dog tomorrow",
        "completely different words with no overlap at all here",
        "the quick brown fox jumps over the lazy dog today",
    ]
    n, w = 4, 4

    def fingerprints(s):
        ws = s.split(" ")
        grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
        if len(grams) < w:
            return set()
        h = md5_u64_arr(grams)
        sel = set()
        for ws0 in range(len(h) - w + 1):
            win = h[ws0:ws0 + w]
            mn = win.min()
            # rightmost minimal
            sel.add(ws0 + max(i for i in range(w) if win[i] == mn))
        return {int(h[i]) for i in sel}

    fps = [fingerprints(t) for t in texts]
    expect = {}
    for i, j in itertools.combinations(range(len(texts)), 2):
        sh = len(fps[i] & fps[j])
        if sh >= 2:
            expect[(i, j)] = sh

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    out = winnow_pairs_ds(ds, num_partitions=4).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)): int(r.n_shared)
           for r in out.itertuples()}
    assert got == expect
    # identical docs 0 and 3 share ALL their fingerprints
    assert (0, 3) in got and got[(0, 3)] == len(fps[0])


def test_ship_latency_dist(ray_session, tmp_path):
    import datetime as dt
    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_ship_latency_dist

    t0 = dt.datetime(1995, 1, 1)
    day = dt.timedelta(days=1)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([t0, t0 + 10 * day],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([t0 + day, t0 + day, t0 + 5 * day,
                                t0 + 12 * day], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_ship_latency_dist(str(tmp_path)).to_pandas() \
        .sort_values("gap_days").reset_index(drop=True)
    assert out.gap_days.tolist() == [1, 2, 5]
    assert out.n_lines.tolist() == [2, 1, 1]


def test_stitch_pairs_seam(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_stitch_pairs

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        # doc1's last 4 tokens == doc2's first 4 → stitch (1, 2);
        # doc3 shares nothing
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta",
            "gamma delta epsilon zeta eta theta",
            "one two three four five six",
        ], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    out = q_stitch_pairs(str(tmp_path)).to_pandas()
    assert list(zip(out.doc_a, out.doc_b)) == [(1, 2)]


def test_bfs_levels_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import bfs_levels_ds

    # a-b-c-d-e chain, f-g island, a-h spur; seeds (2 smallest) = a, b
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("f", "g"), ("a", "h")]
    tbl = pa.table({
        "subj": pa.array([p[0] for p in pairs], pa.string()),
        "obj": pa.array([p[1] for p in pairs], pa.string()),
    })
    want = {"a": 0, "b": 0, "c": 1, "h": 1, "d": 2, "e": 3}
    out = bfs_levels_ds(rd.from_arrow(tbl).repartition(2), n_seeds=2,
                        max_hops=3, num_partitions=4).to_pandas()
    assert dict(zip(out.node, out.dist)) == want

    # max_hops cuts the frontier: e (dist 3) drops at max_hops=2
    out2 = bfs_levels_ds(rd.from_arrow(tbl).repartition(2), n_seeds=2,
                         max_hops=2, num_partitions=4).to_pandas()
    assert dict(zip(out2.node, out2.dist)) == {
        k: v for k, v in want.items() if v <= 2}

    # paths agree: spill to the distributed lane at hop zero and
    # mid-expansion
    for cap in (0, 3):
        sp = bfs_levels_ds(rd.from_arrow(tbl).repartition(2), n_seeds=2,
                           max_hops=3, num_partitions=4,
                           driver_max_members=cap).to_pandas()
        assert dict(zip(sp.node, sp.dist)) == want


def test_band_revenue_q19(ray_session, tmp_path):
    import datetime as dt
    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_band_revenue

    pq2.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#1",
                             "Brand#9"], pa.string()),
        "p_size": pa.array([3, 8, 40, 3], pa.int32()),
    }), str(tmp_path / "part.parquet"))
    pq2.write_table(pa.table({
        # part1: brand1/size3, qty 5 in [1,11]  -> kept (100.00)
        # part2: brand2/size8, qty 15 in [10,20] -> kept (50.00 @ 50%)
        # part3: brand1 but size 40 > 5          -> dropped
        # part4: brand9 not in bands             -> dropped
        # part1 again, qty 20 outside [1,11]     -> dropped
        "l_orderkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 4, 1], pa.int64()),
        "l_quantity": pa.array([5.0, 15.0, 5.0, 5.0, 20.0],
                               pa.float64()),
        "l_extendedprice": pa.array([100.0, 50.0, 10.0, 10.0, 10.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0, 0.5, 0.0, 0.0, 0.0],
                               pa.float64()),
        "l_shipdate": pa.array([dt.datetime(1995, 1, 1)] * 5,
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_band_revenue(str(tmp_path)).to_pandas()
    assert out.revenue_cents.tolist() == [10000 + 2500]


def test_zipf_slope_bruteforce(ray_session, tmp_path):
    import math

    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_zipf_slope

    # frequencies: the=4, of=2, cat/dog/fish=1 → 5 ranks
    texts = ["the of the cat", "the dog of", "the fish"]
    pq2.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    out = q_zipf_slope(str(tmp_path)).to_pandas()

    freqs = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    ordered = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [int(math.floor(math.log(r) * 1e6 + 0.5))
          for r in range(1, len(ordered) + 1)]
    ys = [int(math.floor(math.log(n) * 1e6 + 0.5))
          for _, n in ordered]
    k = len(xs)
    num = k * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = k * sum(x * x for x in xs) - sum(xs) ** 2
    want = (-1 if (num < 0) != (den < 0) else 1) \
        * (abs(num * 1_000_000) // abs(den))
    assert out.n_ranks.tolist() == [5]
    assert out.slope_ppm.tolist() == [want]
    assert want < 0  # frequencies decay with rank


def test_bigram_lm_score(ray_session):
    import math

    import ray.data as rd

    from kgforge.common.hashing import round_away
    from kgforge.functions.textstats import bigram_lm_score_ds

    # bigram counts: ab=3 (2 from "abab", 1 from "ab"), ba=1, ac=1,
    # 中文=1, 文中=1; prefix totals: a·=4, b·=1, 中·=1, 文·=1.
    # "x" (single char) has no bigrams → no output row.
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["abab", "ab", "中文中", "x", "ac"],
                         pa.string()),
    })
    out = bigram_lm_score_ds(rd.from_arrow(docs).repartition(2)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    def lp(c, tot):
        return int(round_away(math.log(c / tot) * 1e6, 0))

    want = {
        1: (3, lp(3, 4) + lp(1, 1) + lp(3, 4)),   # ab, ba, ab
        2: (1, lp(3, 4)),                          # ab
        3: (2, lp(1, 1) + lp(1, 1)),               # 中文, 文中
        5: (1, lp(1, 4)),                          # ac
    }
    got = {int(r.doc_id): (int(r.n_bigrams), int(r.logprob_micro))
           for r in out.itertuples()}
    assert got == want


def test_knn_graph_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.simsearch import knn_graph_ds, _unit

    rng = np.random.default_rng(7)
    n, d, k = 40, 8, 3
    vecs = rng.normal(size=(n, d))
    ids = np.arange(100, 100 + n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    out = knn_graph_ds(rd.from_arrow(tbl).repartition(3), k=k,
                       n_blocks=3, num_partitions=4).to_pandas()

    U = _unit(np.array(
        pa.table(tbl)["embedding"].to_pylist(), dtype=np.float64))
    S = U @ U.T
    np.fill_diagonal(S, -np.inf)
    want = {}
    for qi in range(n):
        order = np.lexsort((ids, -S[qi]))[:k]
        for r, ci in enumerate(order, start=1):
            want[(int(ids[qi]), int(ids[ci]))] = r
    got = {(int(r.query_id), int(r.neighbor_id)): int(r.rank)
           for r in out.itertuples()}
    assert got == want
    assert len(out) == n * k


def test_forecast_revenue_q6(ray_session, tmp_path):
    import datetime as dt
    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_forecast_revenue

    pq2.write_table(pa.table({
        # kept: 1996, disc .05, qty 10 -> 100.00 * .05 = 5.00
        # dropped: wrong year / disc .10 / qty 30
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_quantity": pa.array([10.0, 10.0, 10.0, 30.0], pa.float64()),
        "l_extendedprice": pa.array([100.0] * 4, pa.float64()),
        "l_discount": pa.array([0.05, 0.05, 0.10, 0.05], pa.float64()),
        "l_shipdate": pa.array([dt.datetime(1996, 5, 1),
                                dt.datetime(1995, 5, 1),
                                dt.datetime(1996, 5, 1),
                                dt.datetime(1996, 5, 1)],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_forecast_revenue(str(tmp_path)).to_pandas()
    assert out.revenue_cents.tolist() == [500]


def test_returns_revenue_q10(ray_session, tmp_path):
    import datetime as dt
    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_returns_revenue

    pq2.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 80.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.5, 0.0], pa.float64()),
        "l_returnflag": pa.array(["R", "R", "N"], pa.string()),
    }), str(tmp_path / "lineitem.parquet"))
    pq2.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 11], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq2.write_table(pa.table({
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_name": pa.array(["Customer#10", "Customer#11"], pa.string()),
        "c_nationkey": pa.array([0, 1], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq2.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["NATION_A", "NATION_B"], pa.string()),
    }), str(tmp_path / "nation.parquet"))
    out = pa.table(q_returns_revenue(str(tmp_path))).to_pandas()
    # only customer 10 has returned lines: 100.00 + 25.00
    assert out.c_custkey.tolist() == [10]
    assert out.c_name.tolist() == ["Customer#10"]
    assert out.n_name.tolist() == ["NATION_A"]
    assert out.rev_cents.tolist() == [12500]


def test_reading_ease_integer_formula(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import reading_ease_ds

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["The cat sat. On a mat!", "zzz 中文"],
                         pa.string()),
    })
    out = reading_ease_ds(rd.from_arrow(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc1: 6 words, 2 sentences, vowel groups: e,a,a,O,a,a = 6
    assert out.loc[0, ["n_words", "n_sentences",
                       "n_vowel_groups"]].tolist() == [6, 2, 6]
    wps = 6 * 1_000_000 // 2
    spw = 6 * 1_000_000 // 6
    assert out.loc[0, "flesch_milli"] == \
        206835 - 1015 * wps // 1_000_000 - 84600 * spw // 1_000_000
    # doc2: no sentence punct (min 1), no vowels
    assert out.loc[1, ["n_words", "n_sentences",
                       "n_vowel_groups"]].tolist() == [2, 0, 0]
    assert out.loc[1, "flesch_milli"] == \
        206835 - 1015 * (2 * 1_000_000 // 1) // 1_000_000


def test_random_walks_deterministic_rule(ray_session):
    import hashlib

    import ray.data as rd

    from kgforge.functions.graph import random_walks_ds

    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    tbl = pa.table({
        "subj": pa.array([p[0] for p in pairs], pa.string()),
        "obj": pa.array([p[1] for p in pairs], pa.string()),
    })
    W, L = 2, 3
    out = random_walks_ds(rd.from_arrow(tbl).repartition(2),
                          walks_per_node=W, walk_len=L,
                          num_partitions=4).to_pandas()

    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    adj = {k: sorted(v) for k, v in adj.items()}

    def nxt(cur, w, s):
        h = int(hashlib.md5(f"{cur}|{w}|{s}".encode())
                .hexdigest()[:16], 16)
        return adj[cur][h % len(adj[cur])]

    want = set()
    for start in adj:
        for w in range(W):
            cur = start
            want.add((start, w, 0, cur))
            for s in range(1, L + 1):
                cur = nxt(cur, w, s)
                want.add((start, w, s, cur))
    got = {(r.start, int(r.w), int(r.step), r.node)
           for r in out.itertuples()}
    assert got == want
    assert len(out) == len(adj) * W * (L + 1)


def test_kg_pred_card_counts(ray_session, tmp_path):
    # build a tiny sf-shaped documents table through the dict lane is
    # heavyweight; unit-test the aggregation shape directly instead
    import ray.data as rd
    from ray.data.aggregate import Count

    edges = pa.table({
        "subj": pa.array(["a", "a", "b", "a"], pa.string()),
        "pred": pa.array(["p", "p", "p", "q"], pa.string()),
        "obj": pa.array(["x", "y", "x", "x"], pa.string()),
    })
    # mirror q_kg_pred_card's reductions on a fixed table
    ds = rd.from_arrow(edges)

    def npairs(col):
        def partial(b):
            return pa.table({"pred": b["pred"], "e": b[col]}) \
                .group_by(["pred", "e"], use_threads=False).aggregate([])
        return ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(["pred", "e"]).aggregate(Count(alias_name="c")) \
            .groupby("pred").aggregate(Count(alias_name="n")) \
            .to_pandas().set_index("pred")["n"].to_dict()

    assert npairs("subj") == {"p": 2, "q": 1}
    assert npairs("obj") == {"p": 2, "q": 1}


def test_scd_intervals_lead_window(ray_session):
    import datetime as dt

    import ray.data as rd

    from kgforge.functions.events import scd_intervals_ds

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "u1", t0, 1.0),
        (2, "u1", dt.datetime(2024, 1, 2), 2.5),
        (3, "u2", t0, 9.99),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    import pandas as pd

    out = scd_intervals_ds(rd.from_arrow(tbl).repartition(2)) \
        .to_pandas().sort_values(["user_id", "start_us"]) \
        .reset_index(drop=True)
    day = 86_400_000_000
    e0 = int(t0.timestamp() * 1e6)
    assert out.user_id.tolist() == ["u1", "u1", "u2"]
    assert out.start_us.tolist() == [e0, e0 + day, e0]
    assert out.end_us.tolist()[0] == e0 + day
    assert pd.isna(out.end_us.tolist()[1]) and pd.isna(
        out.end_us.tolist()[2])
    assert out.value_cents.tolist() == [100, 250, 999]


def test_coverage_topk_prefix(ray_session, tmp_path):
    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_coverage_topk

    pq2.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a a a b b c", "a d"], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    out = q_coverage_topk(str(tmp_path)).to_pandas()
    # total 8; top tokens a=4, b=2, c=1, d=1 — all k >= vocab cover 8
    assert out.total.tolist() == [8, 8, 8]
    assert out.covered.tolist() == [8, 8, 8]
    assert out.coverage_ppm.tolist() == [1_000_000] * 3


def test_dow_profile_epoch_rule(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_dow_profile

    pq2.write_table(pa.table({
        # 1970-01-01 = Thursday (dow 4 in DuckDB's Sunday=0 scheme)
        "ts": pa.array([dt.datetime(1970, 1, 1, 5),
                        dt.datetime(1970, 1, 4, 23),
                        dt.datetime(1970, 1, 4, 23)],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 3.005], pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = q_dow_profile(str(tmp_path)).to_pandas() \
        .sort_values(["dow", "hour"]).reset_index(drop=True)
    assert out[["dow", "hour"]].values.tolist() == [[0, 23], [4, 5]]
    assert out.n_events.tolist() == [2, 1]
    assert out.sum_value_cents.tolist() == [200 + 301, 100]


def test_markov_stationary_floor_rule(ray_session):
    import datetime as dt

    import ray.data as rd

    from kgforge.functions.events import markov_stationary_ds

    # u1: a -> b -> a ; u2: a -> c ; type d is isolated (dead end,
    # no user pairs) and keeps its mass
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "u1", "a"), (2, "u1", "b"), (3, "u1", "a"),
        (4, "u2", "a"), (5, "u2", "c"), (6, "u3", "d"),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([t0.replace(hour=9 + i) for i in
                        range(len(rows))], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    out = markov_stationary_ds(rd.from_arrow(tbl).repartition(2),
                               iters=1).to_pandas()
    w = dict(zip(out.event_type, out.weight))
    # transitions: a->b (1), a->c (1), b->a (1); tot(a)=2, tot(b)=1
    # one iter from 1e6 each: a gets b's 1e6; b gets 1e6*1//2; c gets
    # 1e6*1//2; d (dead end) keeps 1e6; c,d have no outgoing rows
    # BUT c also keeps its mass (dead end) → 500000 + 1000000
    assert w == {"a": 1_000_000, "b": 500_000,
                 "c": 1_500_000, "d": 1_000_000}


def test_open_orders_curve_deltas(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_open_orders_curve

    pq2.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1970, 1, 1),
                                 dt.datetime(1970, 1, 3)],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq2.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([dt.datetime(1970, 1, 2),
                                dt.datetime(1970, 1, 5),
                                dt.datetime(1970, 1, 4)],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_open_orders_curve(str(tmp_path)).to_pandas()
    # order1 open day0..day5 (close=max ship day4+1... ship 1/5=day4);
    # order2 open day2..day4 (ship 1/4=day3, close day4)
    assert dict(zip(out.day, out.open_orders)) == {
        0: 1, 2: 2, 4: 1, 5: 0}


def test_late_events_running_max(ray_session):
    import datetime as dt

    import ray.data as rd

    from kgforge.functions.events import late_events_ds

    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    rows = [  # u1 arrivals: ts 10, 12, 11 (late), 12 (not < max)
        (1, "u1", t(10)), (2, "u1", t(12)), (3, "u1", t(11)),
        (4, "u1", t(12)), (5, "u2", t(9)),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    out = late_events_ds(rd.from_arrow(tbl).repartition(2)) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    assert out.user_id.tolist() == ["u1", "u2"]
    assert out.n_events.tolist() == [4, 1]
    assert out.n_late.tolist() == [1, 0]


def test_top_terms_per_source_cut(ray_session, tmp_path):
    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_top_terms_per_source

    pq2.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": pa.array(["s1", "s1", "s2"], pa.string()),
        "text": pa.array(["a a b c d e f", "a b", "x"], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    out = q_top_terms_per_source(str(tmp_path)).to_pandas() \
        .sort_values(["source", "rk"]).reset_index(drop=True)
    s1 = out[out.source == "s1"]
    # a=3, b=2 then ties broken token-asc: c, d, e (f cut at k=5)
    assert s1.token.tolist() == ["a", "b", "c", "d", "e"]
    assert s1.n.tolist() == [3, 2, 1, 1, 1]
    assert s1.rk.tolist() == [1, 2, 3, 4, 5]
    assert out[out.source == "s2"].token.tolist() == ["x"]


def test_hourly_delta_lag(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_hourly_delta

    ts = ([dt.datetime(2024, 1, 1, 0)] * 3
          + [dt.datetime(2024, 1, 1, 1)] * 1
          + [dt.datetime(2024, 1, 1, 3)] * 4)
    pq2.write_table(pa.table({
        "event_type": pa.array(["t"] * 8, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_hourly_delta(str(tmp_path)).to_pandas() \
        .sort_values("hour_idx").reset_index(drop=True)
    assert out.n.tolist() == [3, 1, 4]
    # first hour deltas from 0; gap hour (2) skipped by the grain rule
    assert out.delta.tolist() == [3, -2, 3]


def test_typed_paths_census_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import typed_paths_ds

    # a(P)-b(L), b(L)-c(P), a(P)-d(O): typed wedges around b and a
    rows = [("a", "b", "P", "L"), ("b", "c", "L", "P"),
            ("a", "d", "P", "O")]
    tbl = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "obj": pa.array([r[1] for r in rows], pa.string()),
        "subj_type": pa.array([r[2] for r in rows], pa.string()),
        "obj_type": pa.array([r[3] for r in rows], pa.string()),
        "pred": pa.array(["rel"] * len(rows), pa.string()),
    })
    out = typed_paths_ds(rd.from_arrow(tbl).repartition(2),
                         num_partitions=4).to_pandas()
    got = {(r.type_a, r.type_mid, r.type_b): int(r.n_paths)
           for r in out.itertuples()}

    adj = {}
    ty = {"a": "P", "b": "L", "c": "P", "d": "O"}
    for s, d, _, _ in rows:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    want = {}
    for m, nbrs in adj.items():
        for x in nbrs:
            for y in nbrs:
                if x != y:
                    k = (ty[x], ty[m], ty[y])
                    want[k] = want.get(k, 0) + 1
    assert got == want


def test_embedding_drift_parity(ray_session):
    import ray.data as rd

    from kgforge.functions.clustering import embedding_drift_ds

    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [0.0, 2.0], [3.0, 0.0], [0.0, 4.0]],
            pa.list_(pa.float32())),
    })
    out = pa.table(embedding_drift_ds(
        rd.from_arrow(tbl).repartition(2))).to_pandas() \
        .sort_values("dim").reset_index(drop=True)
    # even ids (0, 2): dim0 sums 4e6, dim1 0; odd (1, 3): dim0 0,
    # dim1 6e6; means over n=2 each
    assert out.sum_even_micro.tolist() == [4_000_000, 0]
    assert out.sum_odd_micro.tolist() == [0, 6_000_000]
    assert out.drift_micro.tolist() == [2_000_000.0, -3_000_000.0]


def test_window_funnel_levels(ray_session):
    import datetime as dt

    import ray.data as rd

    from kgforge.functions.events import window_funnel_ds

    t0 = dt.datetime(2024, 1, 1)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1: view 0 -> click 10 -> purchase 20 (all within 30 min)
        ("u1", "view", at(0)), ("u1", "click", at(10)),
        ("u1", "purchase", at(20)),
        # u2: view 0 -> click 10, purchase at 50 (outside window
        # from the view) -> level 2
        ("u2", "view", at(0)), ("u2", "click", at(10)),
        ("u2", "purchase", at(50)),
        # u3: click before view only -> level 1
        ("u3", "click", at(0)), ("u3", "view", at(5)),
        # u4: no view -> not counted at any level
        ("u4", "purchase", at(0)),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.string()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    out = window_funnel_ds(
        rd.from_arrow(tbl).repartition(2),
        window_us=30 * 60_000_000).to_pandas() \
        .sort_values("level").reset_index(drop=True)
    assert out.level.tolist() == [1, 2, 3]
    assert out.n_users.tolist() == [3, 2, 1]


def test_compose_edges_horn_rule(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import compose_edges_ds

    rows = [("p1", "works_at", "o1"), ("p2", "works_at", "o1"),
            ("o1", "located_in", "l1"), ("o1", "located_in", "l2"),
            ("p3", "works_at", "o2"),          # o2 has no location
            ("p1", "visited", "l9")]           # other pred ignored
    tbl = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
    })
    out = compose_edges_ds(rd.from_arrow(tbl).repartition(2),
                           "works_at", "located_in", "based_in",
                           num_partitions=4).to_pandas()
    got = {(r.subj, r.pred, r.obj) for r in out.itertuples()}
    assert got == {("p1", "based_in", "l1"), ("p1", "based_in", "l2"),
                   ("p2", "based_in", "l1"), ("p2", "based_in", "l2")}


def test_kg_reciprocity_shape(ray_session, tmp_path):
    import ray.data as rd
    from ray.data.aggregate import Max, Sum  # noqa: F401

    # direct unit test of the canonical-pair fold via the query's
    # building blocks: symmetric pred p (a<->b), asymmetric q (a->b)
    from kgforge.pipelines import driver_queries as dq

    edges = pa.table({
        "subj": pa.array(["a", "b", "a", "c"], pa.string()),
        "pred": pa.array(["p", "p", "q", "q"], pa.string()),
        "obj": pa.array(["b", "a", "b", "c"], pa.string()),
        "subj_type": pa.array(["X"] * 4, pa.string()),
        "obj_type": pa.array(["X"] * 4, pa.string()),
    })
    old = dq._DICT_FLAGSHIP_CACHE.get("__recip_test__")
    dq._DICT_FLAGSHIP_CACHE["__recip_test__"] = {
        "edges": rd.from_arrow(edges).repartition(2)}
    try:
        out = pa.table(dq.q_kg_reciprocity("__recip_test__")) \
            .to_pandas().sort_values("pred").reset_index(drop=True)
    finally:
        if old is None:
            dq._DICT_FLAGSHIP_CACHE.pop("__recip_test__", None)
        else:
            dq._DICT_FLAGSHIP_CACHE["__recip_test__"] = old
    # self-loop (c,q,c) dropped; p: 2 edges both reciprocal; q: 1 edge
    assert out.pred.tolist() == ["p", "q"]
    assert out.n_edges.tolist() == [2, 1]
    assert out.n_reciprocal.tolist() == [2, 0]
    assert out.reciprocity_ppm.tolist() == [1_000_000, 0]


def test_user_entropy_integer_grid(ray_session, tmp_path):
    import datetime as dt
    import math

    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_user_entropy

    # u1: 2×a, 2×b (max entropy for 2 types); u2: 4×a (zero entropy)
    types = ["a", "b", "a", "b", "a", "a", "a", "a"]
    users = [1, 1, 1, 1, 2, 2, 2, 2]
    pq2.write_table(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "ts": pa.array([dt.datetime(2024, 1, 1)] * 8,
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = pa.table(q_user_entropy(str(tmp_path))).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)

    def L(x):
        return int(math.floor(math.log(x) * 1e6 + 0.5))

    assert out.n_events.tolist() == [4, 4]
    assert out.entropy_micro.tolist() == [
        (4 * L(4) - (2 * L(2) + 2 * L(2))) // 4,   # = ln 2 micro
        (4 * L(4) - 4 * L(4)) // 4,                 # = 0
    ]
    assert out.entropy_micro.tolist()[0] == 693147


def test_dau_stickiness_months(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_dau_stickiness

    # Jan: users 1,2 across two days; Feb: user 1 only, one day
    rows = [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 1)),
            (1, dt.datetime(2024, 1, 2)), (1, dt.datetime(2024, 2, 1)),
            (1, dt.datetime(2024, 1, 1, 5))]  # same day dup
    pq2.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = pa.table(q_dau_stickiness(str(tmp_path))).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    assert out.dau.tolist() == [2, 1, 1]
    assert out.mau.tolist() == [2, 2, 1]
    assert out.stickiness_ppm.tolist() == [1_000_000, 500_000,
                                           1_000_000]


def test_burst_score_window(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_burst_score

    t0 = dt.datetime(2024, 1, 1)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    # u1: events at 0, 5, 9, 30 min → best 10-min trailing window = 3
    # u2: two events at the same instant → 2
    rows = [(1, at(0)), (1, at(5)), (1, at(9)), (1, at(30)),
            (2, at(0)), (2, at(0))]
    pq2.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_burst_score(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out.max_burst.tolist() == [3, 2]


def test_reorder_gap_median(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_reorder_gap

    d = dt.datetime
    rows = [(1, d(2024, 1, 1)), (1, d(2024, 1, 3)), (1, d(2024, 1, 10)),
            (1, d(2024, 1, 12)),   # gaps 2, 7, 2 → median (rank 1) = 2
            (2, d(2024, 1, 1)),    # single order → no gaps, no row
            (3, d(2024, 1, 1)), (3, d(2024, 1, 6))]  # gap 5
    pq2.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[1] for r in rows],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = q_reorder_gap(str(tmp_path)).to_pandas() \
        .sort_values("o_custkey").reset_index(drop=True)
    assert out.o_custkey.tolist() == [1, 3]
    assert out.n_gaps.tolist() == [3, 1]
    assert out.median_gap_days.tolist() == [2, 5]


def test_supplier_reliability_late_rule(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_supplier_reliability

    d = dt.datetime
    pq2.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([d(2024, 1, 1), d(2024, 1, 1)],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq2.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8], pa.int64()),
        # gaps: 30 (on time), 100 (late), 91 (late — strict >90)
        "l_shipdate": pa.array([d(2024, 1, 31), d(2024, 4, 10),
                                d(2024, 4, 1)], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = pa.table(q_supplier_reliability(str(tmp_path))).to_pandas() \
        .sort_values("l_suppkey").reset_index(drop=True)
    assert out.n_lines.tolist() == [2, 1]
    assert out.n_late.tolist() == [1, 1]
    assert out.late_ppm.tolist() == [500_000, 1_000_000]


def test_quarter_yoy_value_join(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq2

    from kgforge.pipelines.driver_queries import q_quarter_yoy

    d = dt.datetime
    pq2.write_table(pa.table({
        "o_orderdate": pa.array([d(2023, 2, 1), d(2024, 3, 1),
                                 d(2024, 7, 1)], pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 150.0, 70.0], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = pa.table(q_quarter_yoy(str(tmp_path))).to_pandas() \
        .sort_values(["year", "quarter"]).reset_index(drop=True)
    assert out[["year", "quarter"]].values.tolist() == [
        [2023, 1], [2024, 1], [2024, 3]]
    # 2024Q1 deltas vs 2023Q1; 2024Q3 has no prior-year quarter
    assert out.yoy_delta_cents.tolist() == [10000, 5000, 7000]
