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


def test_gopher_rules_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import (GOPHER_STOPWORDS,
                                             gopher_rules_ds)

    texts = [
        "the cat sat on a mat " * 10,          # trailing space → '' word
        "short doc",                           # fails length
        "zz " * 40 + "zz",                     # fails uniq + stop
        "the quick brown fox jumps over a lazy dog and runs to town "
        * 3,
        "supercalifragilistic words only here " * 8,  # long words
    ]
    src = ["s1", "s1", "s2", "s2", "s2"]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "source": pa.array(src),
                    "text": pa.array([t.strip() if i != 0 else t
                                      for i, t in enumerate(texts)])})
    got = gopher_rules_ds(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas().set_index("source").sort_index()

    import collections
    agg = collections.defaultdict(lambda: [0] * 6)
    for s, t in zip(src, tbl["text"].to_pylist()):
        ws = t.split(" ")
        nw = len(ws)
        swl = sum(len(w) for w in ws)
        nstop = sum(1 for w in ws if w in GOPHER_STOPWORDS)
        nuniq = len(set(ws))
        f_len = 0 if 20 <= nw <= 1000 else 1
        f_wl = 0 if 3 * nw <= swl <= 5 * nw else 1
        f_stop = 0 if nstop * 100 >= 2 * nw else 1
        f_uniq = 0 if nuniq * 100 >= 35 * nw else 1
        row = agg[s]
        row[0] += 1
        row[1] += f_len
        row[2] += f_wl
        row[3] += f_stop
        row[4] += f_uniq
        row[5] += 1 if f_len + f_wl + f_stop + f_uniq == 0 else 0
    for s in ("s1", "s2"):
        want = agg[s]
        assert got.loc[s].tolist() == want, (s, got.loc[s].tolist(), want)


def test_personalized_pagerank_seeds_hold_the_mass(ray_session):
    """Seeded PPR: seed nodes keep the teleport mass; nodes unreachable
    from the seeds end at rank 0; plain pagerank unchanged by the
    seeds=None default."""
    import ray.data as rd

    from kgforge.functions.graph import pagerank_ds, personalized_pagerank_ds

    edges = [("a", "b"), ("b", "c"), ("x", "y")]   # {a,b,c} ∪ {x,y}
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    ds = rd.from_arrow(tbl).repartition(2)
    # seeds = 1 lexicographically smallest node = 'a'
    got = {r["node"]: r["rank"] for r in
           personalized_pagerank_ds(ds, n_seeds=1, iters=3).take_all()}
    assert got["a"] == 150_000                     # pure teleport
    assert got["b"] > 0 and got["c"] > 0           # reachable from a
    assert got["x"] == 0 and got["y"] == 0         # unreachable, no seed

    # brute-force the integer recurrence
    nodes = ["a", "b", "c", "x", "y"]
    out = {"a": ["b"], "b": ["c"], "x": ["y"]}
    r = {n: (1_000_000 if n == "a" else 0) for n in nodes}
    for _ in range(3):
        nxt = {}
        for v in nodes:
            insum = sum(r[u] // max(len(out.get(u, [])), 1)
                        for u in nodes if v in out.get(u, []))
            nxt[v] = (150_000 if v == "a" else 0) + (85 * insum) // 100
        r = nxt
    assert got == r

    plain = {x["node"]: x["rank"] for x in
             pagerank_ds(ds, iters=2).take_all()}
    assert all(v > 0 for v in plain.values())
