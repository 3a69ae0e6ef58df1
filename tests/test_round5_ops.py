"""Round-5 operators: exact substring-window dedup family (Lee et al.
2022 fingerprint-join formulation), Jaccard-coefficient link
prediction, and dimension-truncation recall — each against an
independent brute-force oracle."""

import numpy as np
import pyarrow as pa


def _win_set(t: str, L: int) -> set:
    t = t or ""
    if len(t) <= L:
        return {t}
    return {t[i:i + L] for i in range(len(t) - L + 1)}


def test_substring_dup_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.dedup import substring_dup_pairs_ds

    rng = np.random.RandomState(3)
    words = [f"w{i:02d}" for i in range(12)]
    texts = []
    for i in range(40):
        base = " ".join(words[rng.randint(12)] for _ in range(15))
        texts.append(base)
        if i % 4 == 0:                       # planted shared spans
            texts.append(base[:30] + " zz " + base[30:])
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    L = 10
    got = substring_dup_pairs_ds(
        rd.from_arrow(tbl).repartition(4), L=L, max_df=64).to_pandas()
    got_map = {(a, b): n for a, b, n in
               zip(got.id_a, got.id_b, got.n_shared)}

    sets = [_win_set(t, L) for t in texts]
    df: dict = {}
    for s in sets:
        for w in s:
            df[w] = df.get(w, 0) + 1
    want: dict = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            shared = {w for w in sets[a] & sets[b] if 2 <= df[w] <= 64}
            if shared:
                want[(a, b)] = len(shared)
    assert got_map == want
    assert want                               # non-trivial


def test_substring_dup_max_df_drops_boilerplate(ray_session):
    import ray.data as rd

    from kgforge.functions.dedup import substring_dup_pairs_ds

    # one 10-char window shared by ALL docs → dropped at max_df=3
    texts = [f"BOILERPLAT unique tail {i}" for i in range(6)]
    tbl = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                    "text": pa.array(texts)})
    got = substring_dup_pairs_ds(rd.from_arrow(tbl).repartition(2),
                                 L=10, max_df=3).to_pandas()
    assert len(got) == 0


def test_dup_span_fraction_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.dedup import dup_span_fraction_ds

    texts = ["aaaaabbbbbccccc", "aaaaabbbbbddddd", "zzzzzyyyyyxxxxx",
             "", "ab"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    L = 8
    got = dup_span_fraction_ds(rd.from_arrow(tbl).repartition(2),
                               L=L).to_pandas().set_index("doc_id")

    sets = [_win_set(t, L) for t in texts]
    df: dict = {}
    for s in sets:
        for w in s:
            df[w] = df.get(w, 0) + 1
    for i, s in enumerate(sets):
        n_dup = sum(1 for w in s if df[w] >= 2)
        assert got.loc[i, "n_win"] == len(s)
        assert got.loc[i, "n_dup"] == n_dup
        assert abs(got.loc[i, "dup_frac"] - n_dup / len(s)) < 5e-5


def test_jaccard_link_pred_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import jaccard_link_pred_ds

    # path + hub graph: hand-checkable neighborhoods
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "h"),
             ("b", "h"), ("c", "h"), ("e", "h"), ("d", "e")]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    got = jaccard_link_pred_ds(rd.from_arrow(tbl).repartition(3),
                               k=50).to_pandas()

    # brute force
    nbr: dict = {}
    for s, d in edges:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    adj = {tuple(sorted(e)) for e in edges}
    want = []
    nodes = sorted(nbr)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in adj:
                continue
            cn = len(nbr[a] & nbr[b])
            if cn == 0:
                continue
            score = cn * 1_000_000 // (len(nbr[a]) + len(nbr[b]) - cn)
            want.append((a, b, score))
    want.sort(key=lambda t: (-t[2], t[0], t[1]))
    got_rows = [(r.a, r.b, r.jac_score) for r in got.itertuples()]
    assert got_rows == want[:50]
    assert got_rows                           # non-trivial


def test_dim_truncate_recall_full_dim_is_one(ray_session):
    """Truncating to the FULL dimensionality must reproduce the exact
    top-k → recall 1.0 for every query; a 2-dim truncation of
    64-dim noise should lose neighbors (sanity that the metric
    measures something)."""
    import ray.data as rd

    from kgforge.functions.simsearch import dim_truncate_recall_ds

    rng = np.random.RandomState(7)
    mat = rng.standard_normal((60, 64))
    tbl = pa.table({"vec_id": pa.array(range(60), pa.int64()),
                    "embedding": pa.array(mat.tolist(),
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl).repartition(4)
    full = dim_truncate_recall_ds(ds, [0, 1, 2], d_trunc=64,
                                  k=5).to_pandas()
    assert (full.recall == 1.0).all() and len(full) == 3
    low = dim_truncate_recall_ds(ds, [0, 1, 2], d_trunc=2,
                                 k=5).to_pandas()
    assert (low.recall <= 1.0).all() and (low.n_hit <= 5).all()
    assert low.recall.mean() < 1.0
