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


def test_adamic_adar_matches_bruteforce(ray_session):
    import math

    import ray.data as rd

    from kgforge.functions.graph import adamic_adar_ds

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "h"),
             ("b", "h"), ("c", "h"), ("e", "h"), ("d", "e")]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    got = adamic_adar_ds(rd.from_arrow(tbl).repartition(3),
                         k=50).to_pandas()

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
            shared = nbr[a] & nbr[b]
            if not shared:
                continue
            score = sum(1_000_000 // (1 + int(math.log2(len(nbr[z]))))
                        for z in shared)
            want.append((a, b, score))
    want.sort(key=lambda t: (-t[2], t[0], t[1]))
    got_rows = [(r.a, r.b, r.aa_score) for r in got.itertuples()]
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


def test_hourly_autocorr_matches_bruteforce(ray_session, tmp_path):
    """Exact-integer lag-k autocovariance blocks vs a dense numpy
    brute force on a gappy synthetic hourly series."""
    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_hourly_autocorr

    rng = np.random.RandomState(3)
    # 300 events over ~40 hours with deliberate gaps
    hours = np.sort(rng.choice(np.arange(0, 40), size=300, replace=True))
    hours = hours[~np.isin(hours, [7, 8, 21])]          # gap hours
    base = 1_700_000_000_000_000                        # epoch us
    ts = base + hours * 3_600_000_000 + rng.randint(
        0, 3_600_000_000, size=len(hours))
    tbl = pa.table({
        "event_id": pa.array(np.arange(len(ts)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(len(ts), dtype=np.int64)),
        "event_type": pa.array(["x"] * len(ts)),
        "value": pa.array(np.zeros(len(ts))),
        "props": pa.array(["{}"] * len(ts))})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = q_hourly_autocorr(str(tmp_path)).sort_values("lag")

    h_idx = (ts // 3_600_000_000).astype(np.int64)
    mn, mx = h_idx.min(), h_idx.max()
    dense = np.bincount(h_idx - mn, minlength=mx - mn + 1).astype(np.int64)
    for _, r in got.iterrows():
        k = int(r.lag)
        assert r.n_terms == len(dense) - k
        assert r.sum_x == dense[:-k].sum()
        assert r.sum_y == dense[k:].sum()
        assert r.sum_xy == np.dot(dense[:-k], dense[k:])
    assert len(got) == 6 and got.sum_xy.sum() > 0


def test_cusum_changepoint_finds_planted_shift(ray_session, tmp_path):
    """A series that jumps from ~2/hour to ~10/hour at hour 20 must
    put the CUSUM argmax at the shift; values re-checked against a
    dense integer brute force."""
    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_cusum_changepoint

    rng = np.random.RandomState(5)
    counts = np.concatenate([rng.poisson(2, 20), rng.poisson(10, 20)])
    hours = np.repeat(np.arange(40), counts)
    base = 1_700_000_000_000_000
    ts = base + hours * 3_600_000_000 + 17
    n_ev = len(ts)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n_ev, dtype=np.int64)),
        "event_type": pa.array(["shift"] * n_ev),
        "value": pa.array(np.zeros(n_ev)),
        "props": pa.array(["{}"] * n_ev)})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = q_cusum_changepoint(str(tmp_path))
    assert list(got.event_type) == ["shift"]

    h_idx = (ts // 3_600_000_000).astype(np.int64)
    mn, mx = h_idx.min(), h_idx.max()
    dense = np.bincount(h_idx - mn, minlength=mx - mn + 1).astype(np.int64)
    n = len(dense)
    s = np.cumsum(dense)
    dev = np.abs(n * s - np.arange(1, n + 1) * s[-1])[:-1]
    t_star = int(np.argmax(dev))
    assert int(got.cp_hour.iloc[0]) == int(mn + t_star)
    assert int(got.cusum_stat.iloc[0]) == int(dev[t_star])
    # the argmax sits near the planted shift
    assert abs(t_star - 19) <= 2


def test_c4_rules_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import c4_rules_ds

    texts = [
        "one. two. three. clean doc with plenty of words here ok",
        "no terminal punctuation at all in this one honestly",   # sent
        "short. code {x}. block. here with some words more",     # brace
        "Lorem Ipsum dolor. sit amet. consectetur adipiscing.",  # lorem
        "a. b. c.\nd\ne\nf",                                     # linewords
    ]
    src = ["s1", "s1", "s2", "s2", "s2"]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "source": pa.array(src),
                    "text": pa.array(texts)})
    got = c4_rules_ds(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas().set_index("source").sort_index()

    want: dict = {}
    for s, t in zip(src, texts):
        r = want.setdefault(s, dict(n_docs=0, fail_sent=0, fail_brace=0,
                                    fail_lorem=0, fail_linewords=0,
                                    n_pass=0))
        f_sent = int(t.count(".") < 3)
        f_brace = int("{" in t or "}" in t)
        f_lorem = int("lorem ipsum" in t.lower())
        n_lines = t.count("\n") + 1
        n_words = t.count(" ") + 1
        f_lw = int(n_words < 5 * n_lines)
        r["n_docs"] += 1
        r["fail_sent"] += f_sent
        r["fail_brace"] += f_brace
        r["fail_lorem"] += f_lorem
        r["fail_linewords"] += f_lw
        r["n_pass"] += int(f_sent + f_brace + f_lorem + f_lw == 0)
    for s, r in want.items():
        for k, v in r.items():
            assert got.loc[s, k] == v, (s, k)
    # every rule fires at least once across the fixture
    assert got.fail_sent.sum() >= 1 and got.fail_brace.sum() >= 1
    assert got.fail_lorem.sum() >= 1 and got.fail_linewords.sum() >= 1


def test_rich_club_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import rich_club_ds

    # hub-heavy graph: clique on {a,b,c,d} plus pendant leaves
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
             ("b", "d"), ("c", "d"), ("a", "x"), ("a", "y"),
             ("b", "z"), ("e", "f")]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    got = rich_club_ds(rd.from_arrow(tbl).repartition(3),
                       thresholds=(0, 1, 2, 3, 4)).to_pandas()

    nbr: dict = {}
    for s, d in edges:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    deg = {n: len(v) for n, v in nbr.items()}
    und = {tuple(sorted(e)) for e in edges}
    for _, r in got.iterrows():
        k = int(r.k)
        club = {n for n, d in deg.items() if d > k}
        e_k = sum(1 for a, b in und if a in club and b in club)
        assert r.n_nodes == len(club), k
        assert r.n_edges == e_k, k
        want_rc = (2 * e_k * 1_000_000 // (len(club) * (len(club) - 1))
                   if len(club) >= 2 else 0)
        assert r.rc_ppm == want_rc, k
    # the clique core must read denser than the whole graph
    rc = got.set_index("k").rc_ppm
    assert rc.loc[3] >= rc.loc[0] and rc.loc[3] == 1_000_000


def test_ewma_hourly_flags_planted_spike(ray_session, tmp_path):
    """A flat ~3/hour series with one 40-event spike hour must put
    the max EWMA surprise at the spike; values re-checked against
    the integer recurrence brute force."""
    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_ewma_hourly

    rng = np.random.RandomState(11)
    counts = rng.poisson(3, 50)
    counts[33] = 40                            # planted spike
    hours = np.repeat(np.arange(50), counts)
    base = 1_700_000_000_000_000
    ts = base + hours * 3_600_000_000 + 99
    n_ev = len(ts)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n_ev, dtype=np.int64)),
        "event_type": pa.array(["flat"] * n_ev),
        "value": pa.array(np.zeros(n_ev)),
        "props": pa.array(["{}"] * n_ev)})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = q_ewma_hourly(str(tmp_path))
    assert list(got.event_type) == ["flat"]

    h_idx = (ts // 3_600_000_000).astype(np.int64)
    mn, mx = h_idx.min(), h_idx.max()
    dense = np.bincount(h_idx - mn, minlength=mx - mn + 1).astype(np.int64)
    S = 1_000_000
    s = int(dense[0]) * S
    best_dev, best_pos = -1, -1
    for t in range(1, len(dense)):
        dev = abs(int(dense[t]) * S - s)
        if dev > best_dev:
            best_dev, best_pos = dev, t + 1
        s = (3 * s + int(dense[t]) * S) // 4
    assert int(got.ewma_last.iloc[0]) == s
    assert int(got.anom_dev.iloc[0]) == best_dev
    assert int(got.anom_hour.iloc[0]) == int(mn + best_pos - 1)
    # the spike hour is the anomaly
    assert int(got.anom_hour.iloc[0]) == int(mn + 33)


def test_harmonic_matches_bruteforce(ray_session):
    from collections import deque

    import ray.data as rd

    from kgforge.functions.graph import harmonic_ds

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("a", "f"), ("f", "g"), ("x", "y")]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    got = harmonic_ds(rd.from_arrow(tbl).repartition(3),
                      n_seeds=3, max_hops=3).to_pandas() \
        .set_index("seed").sort_index()

    nbr: dict = {}
    for s, d in edges:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    seeds = sorted(nbr)[:3]
    assert list(got.index) == seeds
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            cur = q.popleft()
            if dist[cur] >= 3:
                continue
            for v in nbr[cur]:
                if v not in dist:
                    dist[v] = dist[cur] + 1
                    q.append(v)
        ds = [d for d in dist.values() if d >= 1]
        assert got.loc[s, "n_reached"] == len(ds)
        assert got.loc[s, "h_units"] == sum(1_000_000 // d for d in ds)
        assert got.loc[s, "ecc"] == max(ds)


def test_weighted_pagerank_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import weighted_pagerank_ds

    edges = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
             ("c", "a", 5), ("d", "a", 1), ("a", "b", 2)]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges]),
                    "support": pa.array([e[2] for e in edges],
                                        pa.int64())})
    got = {r.node: r.rank for r in weighted_pagerank_ds(
        rd.from_arrow(tbl).repartition(3), iters=3).to_pandas()
        .itertuples()}

    w: dict = {}
    for s, d, x in edges:
        w[(s, d)] = w.get((s, d), 0) + x
    nodes = sorted({n for e in w for n in e})
    W = {u: sum(x for (s, _), x in w.items() if s == u) for u in nodes}
    r = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        nxt = {}
        for v in nodes:
            insum = sum((r[u] * x) // W[u]
                        for (u, d), x in w.items() if d == v)
            nxt[v] = 150_000 + (85 * insum) // 100
        r = nxt
    assert got == r


def test_ktruss_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import ktruss_ds

    # two triangles sharing an edge (4-truss core) + a pendant path
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"),
             ("b", "d"), ("c", "d"), ("d", "e"), ("e", "f")]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    got = ktruss_ds(rd.from_arrow(tbl).repartition(3),
                    k=4, rounds=3).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)

    # brute-force peel
    E = {tuple(sorted(e)) for e in edges}
    for _ in range(3):
        nbr: dict = {}
        for a, b in E:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        keep = {(a, b) for a, b in E if len(nbr[a] & nbr[b]) >= 2}
        if keep == E:
            break
        E = keep
    nbr = {}
    for a, b in E:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    want = sorted((a, b, len(nbr[a] & nbr[b])) for a, b in E)
    assert [(r.a, r.b, r.support) for r in got.itertuples()] == want
    # the K4 survives, the pendant path does not
    assert len(want) == 6 and all(s == 2 for *_, s in want)


def test_ktruss_empty_result(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import ktruss_ds

    tbl = pa.table({"subj": pa.array(["a", "b"]),
                    "obj": pa.array(["b", "c"])})
    got = ktruss_ds(rd.from_arrow(tbl), k=4, rounds=2).to_pandas()
    assert len(got) == 0


def test_source_similarity_matches_bruteforce(ray_session):
    from collections import Counter

    import ray.data as rd

    from kgforge.functions.indexing import source_similarity_ds

    texts = ["cat dog cat", "dog mouse", "cat cat cat", "bird",
             "dog dog bird"]
    src = ["s1", "s1", "s2", "s3", "s3"]
    tbl = pa.table({"source": pa.array(src), "text": pa.array(texts)})
    got = source_similarity_ds(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas().sort_values(["src_a", "src_b"]) \
        .reset_index(drop=True)

    tf: dict = {}
    for s, t in zip(src, texts):
        tf.setdefault(s, Counter()).update(t.split())
    srcs = sorted(tf)
    want = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            dot = sum(tf[a][w] * tf[b][w] for w in tf[a] if w in tf[b])
            if dot == 0:
                continue                       # inner-join semantics
            na2 = sum(v * v for v in tf[a].values())
            nb2 = sum(v * v for v in tf[b].values())
            want.append((a, b, dot, na2, nb2))
    got_rows = [(r.src_a, r.src_b, r.dot, r.na2, r.nb2)
                for r in got.itertuples()]
    assert got_rows == want
    assert len(want) >= 2


def _sigma_bruteforce(edges, seeds, max_hops):
    from collections import deque

    nbr: dict = {}
    for s, d in edges:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    dist = {s: 0 for s in seeds}
    cnt = {s: 1 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        acc: dict = {}
        for u in frontier:
            for v in nbr.get(u, ()):
                if v not in dist:
                    acc[v] = acc.get(v, 0) + cnt[u]
        frontier = set(acc)
        for v, c in acc.items():
            dist[v] = h
            cnt[v] = c
        if not frontier:
            break
    return {n: (dist[n], cnt[n]) for n in dist}


def test_path_counts_matches_bruteforce_both_lanes(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import path_counts_ds

    # diamond (2 shortest paths) + chain + a second component
    edges = [("a", "b1"), ("a", "b2"), ("b1", "c"), ("b2", "c"),
             ("c", "d"), ("d", "e"), ("a", "x"), ("p", "q")]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    ds = rd.from_arrow(tbl).repartition(3)
    want = _sigma_bruteforce(edges, sorted(
        {n for e in edges for n in e})[:1], 4)

    for dmax in (2_000_000, 0):       # broadcast lane / forced spill
        got = {r.node: (r.dist, r.paths)
               for r in path_counts_ds(
                   ds, n_seeds=1, max_hops=4,
                   driver_max_members=dmax).to_pandas().itertuples()}
        assert got == want, dmax
    # the diamond's far corner sees 2 shortest paths
    assert want["c"] == (2, 2)


def test_char_bigram_stats_matches_bruteforce(ray_session):
    from collections import Counter

    import ray.data as rd

    from kgforge.functions.textstats import char_bigram_stats_ds

    texts = ["abcab", "", "x", "héllo wörld", "aaaa"]
    src = ["s1", "s1", "s2", "s2", "s3"]
    tbl = pa.table({"source": pa.array(src), "text": pa.array(texts)})
    got = char_bigram_stats_ds(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas().set_index("source").sort_index()

    want: dict = {}
    for s, t in zip(src, texts):
        cnt = want.setdefault(s, Counter())
        cnt.update(t[i:i + 2] for i in range(len(t) - 1))
    for s, cnt in want.items():
        if not cnt:
            assert s not in got.index      # empty groups drop out
            continue
        assert got.loc[s, "n_bigrams"] == sum(cnt.values())
        assert got.loc[s, "distinct_bigrams"] == len(cnt)
        assert got.loc[s, "coll"] == sum(v * v for v in cnt.values())
    # unicode doc contributed codepoint bigrams (é ll etc.)
    assert got.loc["s2", "n_bigrams"] == len("x") - 1 + len("héllo wörld") - 1


def test_decayed_counts_planted_decay(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_decayed_counts

    # type "old" all 25 days before max (weight 0), "new" at max day
    base = 1_700_000_000_000_000
    day = 86_400_000_000
    ts = np.array([base, base, base + 25 * day, base + 25 * day,
                   base + 24 * day])
    types = ["old", "old", "new", "new", "new"]
    n_ev = len(ts)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n_ev, dtype=np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(np.zeros(n_ev)),
        "props": pa.array(["{}"] * n_ev)})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = q_decayed_counts(str(tmp_path)).set_index("event_type")
    assert got.loc["old", "n_events"] == 2
    assert got.loc["old", "decayed_units"] == 0          # age 25 >= 20
    assert got.loc["new", "n_events"] == 3
    # 2 events at age 0 (1e6 each) + 1 at age 1 (5e5)
    assert got.loc["new", "decayed_units"] == 2_500_000


def test_betweenness_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import betweenness_ds

    edges = [("a", "b1"), ("a", "b2"), ("b1", "c"), ("b2", "c"),
             ("c", "d"), ("d", "e")]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    got = {r.node: (r.dist, r.paths, r.dep_units)
           for r in betweenness_ds(rd.from_arrow(tbl).repartition(3),
                                   n_seeds=1, max_hops=4)
           .to_pandas().itertuples()}

    # brute-force integer Brandes from seed "a"
    nbr: dict = {}
    for s, d in edges:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    dist = {"a": 0}
    cnt = {"a": 1}
    frontier = {"a"}
    dag = []
    for h in range(1, 5):
        lvl_edges = [(u, v) for u in sorted(frontier)
                     for v in sorted(nbr[u]) if v not in dist]
        dag.append(lvl_edges)
        acc: dict = {}
        for u, v in lvl_edges:
            acc[v] = acc.get(v, 0) + cnt[u]
        frontier = set(acc)
        for v, c in acc.items():
            dist[v] = h
            cnt[v] = c
    dep = {n: 0 for n in dist}
    for h in range(len(dag), 0, -1):
        for u, v in dag[h - 1]:
            dep[u] += cnt[u] * (1_000_000 + dep[v]) // cnt[v]
    want = {n: (dist[n], cnt[n], dep[n]) for n in dist}
    assert got == want
    # the bridge c-d dominates: c carries both paths onward
    assert got["c"][2] > got["b1"][2]


def test_modularity_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import (label_prop_communities_ds,
                                         modularity_ds)

    # two triangles joined by one bridge
    edges = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    ds = rd.from_arrow(tbl).repartition(3)
    got = modularity_ds(ds, rounds=2).to_pandas().iloc[0]

    labs = {r["node"]: r["community"]
            for r in label_prop_communities_ds(ds, rounds=2)
            .take_all()}
    und = {tuple(sorted(e)) for e in edges}
    m = len(und)
    deg: dict = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    dc: dict = {}
    for n, d in deg.items():
        dc[labs[n]] = dc.get(labs[n], 0) + d
    intra = sum(1 for a, b in und if labs[a] == labs[b])
    sum_dc2 = sum(v * v for v in dc.values())
    q_num = 4 * m * intra - sum_dc2
    q = abs(q_num) * 1_000_000 // (4 * m * m)
    assert got["m"] == m
    assert got["n_comms"] == len(dc)
    assert got["intra_edges"] == intra
    assert got["sum_dc2"] == sum_dc2
    assert got["q_ppm"] == (q if q_num >= 0 else -q)


def test_diameter_est_double_sweep(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import diameter_est_ds

    # path graph a-b-c-d-e: sweep from a finds e (ecc 4), sweep from
    # e confirms diameter 4
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    got = diameter_est_ds(rd.from_arrow(tbl).repartition(2),
                          max_hops=6).to_pandas().iloc[0]
    assert got["seed"] == "a"
    assert got["far_node"] == "e"
    assert got["ecc1"] == 4
    assert got["diameter_lb"] == 4


def test_type_affinity_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_type_affinity

    users = [1, 1, 1, 2, 2, 3, 3, 3, 4]
    types = ["x", "y", "x", "y", "z", "x", "y", "z", "x"]
    n_ev = len(users)
    base = 1_700_000_000_000_000
    tbl = pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(np.full(n_ev, base), pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(np.zeros(n_ev)),
        "props": pa.array(["{}"] * n_ev)})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = q_type_affinity(str(tmp_path)).sort_values(
        ["type_a", "type_b"]).reset_index(drop=True)

    sets: dict = {}
    for u, t in zip(users, types):
        sets.setdefault(t, set()).add(u)
    ts = sorted(sets)
    want = []
    for i, a in enumerate(ts):
        for b in ts[i + 1:]:
            both = len(sets[a] & sets[b])
            if both == 0:
                continue
            want.append((a, b, both, len(sets[a]), len(sets[b])))
    got_rows = [(r.type_a, r.type_b, r.users_both, r.users_a,
                 r.users_b) for r in got.itertuples()]
    assert got_rows == want


def test_jsonl_and_csv_sources_round_trip(ray_session, tmp_path):
    """JSONL documents and CSV events normalize to the parquet
    schemas and feed existing operators unchanged."""
    import json

    from kgforge.functions.textstats import c4_rules_ds
    from kgforge.sources.textio import (read_documents_jsonl,
                                        read_events_csv)

    jl = tmp_path / "docs.jsonl"
    with open(jl, "w") as f:
        for i, (s, t) in enumerate([("s1", "one. two. three. ok text"),
                                    ("s1", None),
                                    ("s2", "short {code}")]):
            f.write(json.dumps({"doc_id": i, "source": s,
                                "text": t}) + "\n")
    docs = read_documents_jsonl(str(jl))
    tbl = docs.to_pandas().sort_values("doc_id")
    assert list(tbl.doc_id) == [0, 1, 2]
    assert tbl.text.iloc[1] == ""              # null -> ''
    # the census operator runs on the JSONL-sourced dataset directly
    census = c4_rules_ds(read_documents_jsonl(str(jl))).to_pandas()
    assert census.n_docs.sum() == 3

    cs = tmp_path / "events.csv"
    with open(cs, "w") as f:
        f.write("event_id,ts,user_id,event_type,value,props\n")
        f.write('0,2024-01-01 00:00:07,1,click,1.5,"{}"\n')
        f.write('1,2024-01-01 01:00:07,2,view,0.5,"{}"\n')
    ev = read_events_csv(str(cs)).to_pandas().sort_values("event_id")
    assert str(ev.ts.dtype).startswith("datetime64")
    assert list(ev.event_type) == ["click", "view"]
    assert list(ev.user_id) == [1, 2]


def test_peak_concurrency_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.events import peak_concurrency_ds

    # three users; sessions engineered to overlap 3-way once
    m = 60_000_000
    ev = [(1, 0), (1, 10 * m),          # u1: [0, 10m]
          (2, 5 * m), (2, 12 * m),      # u2: [5m, 12m]
          (3, 9 * m),                   # u3: [9m, 9m]
          (1, 120 * m),                 # u1 second session
          ]
    tbl = pa.table({
        "user_id": pa.array([e[0] for e in ev], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + e[1] for e in ev],
                       pa.timestamp("us"))})
    got = peak_concurrency_ds(rd.from_arrow(tbl).repartition(3),
                              gap_minutes=30).to_pandas().iloc[0]
    # 3-way overlap at t=9m (u1+u2+u3); 4 sessions total
    assert got["peak"] == 3
    assert got["peak_t_us"] == 1_700_000_000_000_000 + 9 * m
    assert got["n_sessions"] == 4
