"""Round-5 session-D operators: Broder containment near-dup pairs,
DSIR importance weights, greedy k-center coreset selection, and the
directed bow-tie census — each against an independent brute-force
oracle."""

import numpy as np
import pyarrow as pa


def _shingles(t: str, n: int = 5) -> set:
    t = t or ""
    if not t:
        return set()
    if len(t) < n:
        return {t}
    return {t[i:i + n] for i in range(len(t) - n + 1)}


def test_containment_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.dedup import containment_blocked_pairs_ds

    rng = np.random.RandomState(11)
    base = ("the quick brown fox jumps over the lazy dog while "
            "seventy zebras graze beside the quiet river bank")
    texts = []
    for i in range(60):
        r = rng.randint(4)
        if r == 0:                       # short doc quoted whole in base
            j = rng.randint(len(base) - 20)
            texts.append(base[j:j + 20])
        elif r == 1:                     # the long doc itself
            texts.append(base)
        elif r == 2:                     # unrelated noise
            texts.append("".join(rng.choice(list("abcdefgh "), 40)))
        else:                            # near-copy of base
            texts.append(base[: rng.randint(30, len(base))])
    src = ["s%d" % (i % 2) for i in range(60)]
    ids = np.arange(60, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "source": pa.array(src),
        "text": pa.array(texts)}))
    got = containment_blocked_pairs_ds(
        ds, block_cols=("source",), theta=0.3).to_pandas()
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    exp = []
    sh = [_shingles(t) for t in texts]
    for a in range(60):
        for b in range(a + 1, 60):
            if src[a] != src[b]:
                continue
            inter = len(sh[a] & sh[b])
            den = min(len(sh[a]), len(sh[b]))
            c = inter / den if den else 1.0
            if c >= 0.3:
                exp.append((a, b, round(c, 4)))
    assert len(got) == len(exp) > 0
    for (ea, eb, ec), (_, row) in zip(exp, got.iterrows()):
        assert (row["id_a"], row["id_b"]) == (ea, eb)
        assert abs(row["containment"] - ec) < 1e-9
    # asymmetry check: at least one pair must be a short-in-long
    # subset whose Jaccard would NOT clear the same threshold
    asym = [(a, b) for a, b, _ in exp
            if len(sh[a] & sh[b]) / max(
                1, len(sh[a] | sh[b])) < 0.3]
    assert asym, "fixture lost its asymmetric containment pairs"


def test_dsir_weights_matches_bruteforce(ray_session):
    import hashlib
    import math

    import ray.data as rd

    from kgforge.functions.textstats import dsir_weights_ds

    rng = np.random.RandomState(7)
    tgt_vocab = ["alpha", "beta", "gamma", "delta"]
    raw_vocab = ["uno", "dos", "tres", "quatro", "cinco"]
    rows = []
    for i in range(50):
        is_en = i % 2 == 0
        vocab = tgt_vocab if is_en else raw_vocab
        n = rng.randint(0, 12)     # includes empty docs
        rows.append((i, "en" if is_en else "es",
                     " ".join(vocab[rng.randint(len(vocab))]
                              for _ in range(n))))
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "lang": pa.array([r[1] for r in rows]),
                    "text": pa.array([r[2] for r in rows])})
    got = dsir_weights_ds(rd.from_arrow(tbl), target_lang="en") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    B = 8192

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:16], 16) % B

    def L(x):
        v = math.log(x) * 1e6
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    c_all, c_tgt = {}, {}
    for _, lang, text in rows:
        for t in text.split():
            b = bucket(t)
            c_all[b] = c_all.get(b, 0) + 1
            if lang == "en":
                c_tgt[b] = c_tgt.get(b, 0) + 1
    n_all, n_tgt = sum(c_all.values()), sum(c_tgt.values())
    for did, lang, text in rows:
        toks = text.split()
        w = sum((L(c_tgt.get(bucket(t), 0) + 1) - L(n_tgt + B))
                - (L(c_all.get(bucket(t), 0) + 1) - L(n_all + B))
                for t in toks)
        r = got.iloc[did]
        assert r["n_tokens"] == len(toks)
        assert r["weight_micro"] == w, (did, r["weight_micro"], w)
    # the planted signal: target-vocab docs score strictly higher
    en_w = got[got.doc_id % 2 == 0].query("n_tokens > 0")["weight_micro"]
    es_w = got[got.doc_id % 2 == 1].query("n_tokens > 0")["weight_micro"]
    assert en_w.min() > es_w.max()


def test_kcenter_select_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.simsearch import kcenter_select_ds

    rng = np.random.RandomState(3)
    # three well-separated clusters + duplicates of the seed point
    cents = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0],
                      [-4.0, 3.0, -2.0]])
    pts = np.concatenate([
        cents[rng.randint(3, size=40)] + rng.randn(40, 3) * 0.01])
    pts[7] = pts[0]                       # exact duplicate of an early id
    ids = np.arange(40, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, p)) for p in pts],
                              pa.list_(pa.float32()))})
    k = 6
    got = kcenter_select_ds(rd.from_arrow(tbl), k=k).to_pandas()

    # brute force over the same quantization (the table stores
    # float32, so quantize the float32-rounded values like the engine)
    f32 = pts.astype(np.float32).astype(np.float64)
    q = np.floor(np.abs(f32 * 1e6) + 0.5) * np.sign(f32)
    q = q.astype(np.int64)
    sel = [0]
    dist = [0]
    for _ in range(1, k):
        dmin = np.min(
            [((q - q[s][None, :]) ** 2).sum(1) for s in sel], axis=0)
        cand = [i for i in range(40) if i not in sel]
        best = max(cand, key=lambda i: (dmin[i], -i))
        sel.append(best)
        dist.append(int(dmin[best]))
    assert list(got["vec_id"]) == sel
    assert list(got["dist_micro2"]) == dist
    assert list(got["step"]) == list(range(1, k + 1))
    # sanity: the three clusters are covered by the first three picks
    lab = np.argmin(((pts[:, None, :] - cents[None]) ** 2).sum(-1), 1)
    assert len(set(lab[sel[:3]])) == 3


def test_kg_bowtie_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import bowtie_ds

    # planted bow-tie: cycle {a0,a1,a2} is the seed's SCC ('a0' is the
    # smallest node), i* feed in, o* flow out, x* are disconnected
    edges = [("i1", "a0"), ("i2", "i1"), ("a0", "a1"), ("a1", "a2"),
             ("a2", "a0"), ("a1", "o1"), ("o1", "o2"), ("x1", "x2")]
    tbl = pa.table({
        "subj": pa.array([e[0] for e in edges]),
        "pred": pa.array(["r"] * len(edges)),
        "obj": pa.array([e[1] for e in edges])})

    def brute(max_hops):
        nodes = sorted({n for e in edges for n in e})
        seed = nodes[0]
        adj, radj = {}, {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
            radj.setdefault(d, set()).add(s)

        def reach(start, g, hops):
            seen, frontier = {start}, {start}
            for _ in range(hops):
                frontier = {y for x in frontier
                            for y in g.get(x, ())} - seen
                seen |= frontier
            return seen

        f, b = reach(seed, adj, max_hops), reach(seed, radj, max_hops)
        out = {}
        for n in nodes:
            cls = ("scc" if n in f and n in b else
                   "out" if n in f else "in" if n in b else "other")
            out[cls] = out.get(cls, 0) + 1
        return out

    for dmm in (2_000_000, 1):      # broadcast lane, forced spill lane
        got = bowtie_ds(rd.from_arrow(tbl), max_hops=6,
                        driver_max_members=dmm).to_pandas()
        got_d = dict(zip(got["cls"], got["n_nodes"]))
        assert got_d == brute(6), (dmm, got_d)
    # tighter horizon cuts the far-out node into OTHER
    got1 = bowtie_ds(rd.from_arrow(tbl), max_hops=1).to_pandas()
    assert dict(zip(got1["cls"], got1["n_nodes"])) == brute(1)


def test_removal_effect_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.events import removal_effect_ds

    # planted journeys: 'ad' is the sole gateway to conversion,
    # 'blog' never leads anywhere, 'spam' appears only AFTER the
    # conversion (so truncation must erase it from the chain)
    journeys = (
        [["ad", "buy"]] * 6 +
        [["ad", "ad", "buy", "spam"]] * 3 +
        [["blog"]] * 4 +
        [["blog", "blog"]] * 2 +
        [["ad"]] * 5
    )
    users, types, ts = [], [], []
    for u, j in enumerate(journeys):
        for i, ev in enumerate(j):
            users.append(u)
            types.append(ev)
            ts.append(u * 1_000_000 + i)
    n = len(users)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.asarray(ts, np.int64), pa.timestamp("us")),
        "user_id": pa.array(np.asarray(users, np.int64)),
        "event_type": pa.array(types)})
    H = 6
    got = removal_effect_ds(rd.from_arrow(tbl), conv_type="buy",
                            steps=H).to_pandas()
    got = got.sort_values("channel").reset_index(drop=True)

    # brute force: rebuild the truncated chain + integer propagation
    tr, tot = {}, {}
    for j in journeys:
        cut = j[:j.index("buy") + 1] if "buy" in j else j
        seq = ["__START__"] + cut + (
            ["__END__"] if cut[-1] != "buy" else ["__END__"])
        # NOTE: engine emits an __END__ row for EVERY journey's last
        # kept state (including 'buy'); it is never propagated from
        for a, b in zip(seq[:-1], seq[1:]):
            tr[(a, b)] = tr.get((a, b), 0) + 1
            tot[a] = tot.get(a, 0) + 1

    def absorbed(excl):
        v = {"__START__": 1_000_000}
        won = 0
        for _ in range(H):
            nv = {}
            for a, m in v.items():
                for (aa, b), c in tr.items():
                    if aa != a:
                        continue
                    x = m * c // tot[a]
                    if b == "buy":
                        won += x
                    elif b not in ("__END__", excl):
                        nv[b] = nv.get(b, 0) + x
            v = nv
        return won

    p_full = absorbed(None)
    exp = {ch: absorbed(ch) for ch in ("ad", "blog", "spam")}
    assert list(got["channel"]) == ["ad", "blog", "spam"]
    for _, r in got.iterrows():
        assert r["p_full_micro"] == p_full
        assert r["p_removed_micro"] == exp[r["channel"]]
        assert r["removal_micro"] == p_full - exp[r["channel"]]
    # the planted structure: removing the gateway kills ALL conversion,
    # removing the dead-end blog channel costs nothing
    assert exp["ad"] == 0 and p_full > 0
    assert exp["blog"] == p_full
    # 'spam' only occurs post-conversion: truncation erases it
    assert exp["spam"] == p_full


def test_position_attribution_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.events import position_attribution_ds

    # journeys exercising cnt = 1, 2, 3, 5, a non-converter, and a
    # user who converts on their very first event (no credit at all)
    journeys = [
        ["ad", "buy"],                                   # cnt=1 → 100%
        ["ad", "blog", "buy"],                           # cnt=2 → 50/50
        ["ad", "mail", "blog", "buy"],                   # cnt=3 → U
        ["blog", "ad", "mail", "ad", "blog", "buy"],     # cnt=5 → U
        ["ad", "blog", "mail"],                          # never converts
        ["buy", "ad", "blog"],                           # conv first
    ]
    users, types, ts = [], [], []
    for u, j in enumerate(journeys):
        for i, ev in enumerate(j):
            users.append(u)
            types.append(ev)
            ts.append(u * 1_000_000 + i)
    n = len(users)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.asarray(ts, np.int64), pa.timestamp("us")),
        "user_id": pa.array(np.asarray(users, np.int64)),
        "event_type": pa.array(types)})
    got = position_attribution_ds(
        rd.from_arrow(tbl), conv_type="buy").to_pandas()
    got = got.sort_values("channel").reset_index(drop=True)

    exp_credit: dict = {}
    exp_touch: dict = {}
    for j in journeys:
        if "buy" not in j:
            continue
        pre = j[:j.index("buy")]
        cnt = len(pre)
        for rn, ch in enumerate(pre, start=1):
            c = (1_000_000 if cnt == 1 else
                 500_000 if cnt == 2 else
                 400_000 if rn in (1, cnt) else
                 200_000 // (cnt - 2))
            exp_credit[ch] = exp_credit.get(ch, 0) + c
            exp_touch[ch] = exp_touch.get(ch, 0) + 1
    assert list(got["channel"]) == sorted(exp_credit)
    for _, r in got.iterrows():
        assert r["credit_micro"] == exp_credit[r["channel"]]
        assert r["n_touches"] == exp_touch[r["channel"]]


def test_hub_knockout_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import hub_knockout_ds

    # star through hub 'h' bridging two cliques + a separate pair;
    # knocking out the hub (k=1) must split the giant component
    edges = [("h", "a1"), ("h", "a2"), ("h", "b1"), ("h", "b2"),
             ("a1", "a2"), ("b1", "b2"), ("c1", "c2")]
    tbl = pa.table({
        "subj": pa.array([e[0] for e in edges]),
        "pred": pa.array(["r"] * len(edges)),
        "obj": pa.array([e[1] for e in edges])})
    got = hub_knockout_ds(rd.from_arrow(tbl), k=1).to_pandas()
    got = got.set_index("phase")

    def census(eds):
        nodes = sorted({n for e in eds for n in e})
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in eds:
            parent[find(a)] = find(b)
        comps = {}
        for n in nodes:
            comps.setdefault(find(n), []).append(n)
        pairs = {tuple(sorted(e)) for e in eds}
        return (len(nodes), len(pairs), len(comps),
                max(len(v) for v in comps.values()) if comps else 0)

    pre = census(edges)
    post = census([e for e in edges if "h" not in e])
    for phase, exp in (("pre", pre), ("post", post)):
        r = got.loc[phase]
        assert (r["n_nodes"], r["n_pairs"], r["n_components"],
                r["largest"]) == exp, (phase, dict(r))
    # the attack signature: one giant component shatters
    assert got.loc["pre", "n_components"] == 2
    assert got.loc["post", "n_components"] == 3
    assert got.loc["post", "largest"] < got.loc["pre", "largest"]


def test_orc_and_feather_sources_round_trip(ray_session, tmp_path):
    from pyarrow import feather as pf
    from pyarrow import orc as porc

    from kgforge.functions.textstats import token_stats
    from kgforge.sources.textio import (read_documents_feather,
                                        read_documents_orc)

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": pa.array(["s0", "s1", "s0"]),
        "text": pa.array(["hello world", "", "a b c d"]),
        "lang": pa.array(["en", "en", "es"])})
    od = tmp_path / "orc"
    fd = tmp_path / "feather"
    od.mkdir()
    fd.mkdir()
    porc.write_table(tbl.slice(0, 2), str(od / "part0.orc"))
    porc.write_table(tbl.slice(2), str(od / "part1.orc"))
    pf.write_feather(tbl.slice(0, 1), str(fd / "part0.feather"))
    pf.write_feather(tbl.slice(1), str(fd / "part1.feather"))

    for reader, root in ((read_documents_orc, od),
                         (read_documents_feather, fd)):
        ds = reader(str(root), columns=["doc_id", "text"])
        got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(got.columns) == ["doc_id", "text"]
        assert list(got["doc_id"]) == [1, 2, 3]
        assert list(got["text"]) == ["hello world", "", "a b c d"]
        # downstream operator runs unchanged on the ingested table
        stats = ds.map_batches(token_stats, batch_format="pyarrow") \
            .to_pandas().sort_values("doc_id")
        assert list(stats["n_tokens"]) == [2, 0, 4]


def test_densification_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import densification_ds

    # 10 docs; edges planted so arrivals cluster early and repeat
    # later (repeats must NOT count again), one brand-new late edge
    trip = [
        ("a", "b", 0), ("b", "c", 0),        # decile 0: 2 edges, 3 nodes
        ("a", "b", 3),                        # repeat — no new arrival
        ("c", "d", 5),                        # decile 5: 1 edge, 1 node
        ("e", "f", 9), ("a", "f", 9),         # decile 9
    ]
    tbl = pa.table({
        "subj": pa.array([t[0] for t in trip]),
        "pred": pa.array(["rel"] * len(trip)),
        "obj": pa.array([t[1] for t in trip]),
        "doc_id": pa.array(["dict-%08d" % t[2] for t in trip])})
    got = densification_ds(rd.from_arrow(tbl), n_docs=10).to_pandas()

    e_first, n_first = {}, {}
    for s, d, num in trip:
        e_first[(s, d)] = min(e_first.get((s, d), num), num)
    for (s, d), num in e_first.items():
        for n in (s, d):
            n_first[n] = min(n_first.get(n, num), num)
    e_new = [0] * 10
    n_new = [0] * 10
    for num in e_first.values():
        e_new[min(num * 10 // 10, 9)] += 1
    for num in n_first.values():
        n_new[min(num * 10 // 10, 9)] += 1
    assert list(got["new_edges"]) == e_new
    assert list(got["new_nodes"]) == n_new
    assert list(got["cum_edges"]) == list(np.cumsum(e_new))
    assert list(got["cum_nodes"]) == list(np.cumsum(n_new))
    assert list(got["decile"]) == list(range(10))


def test_triad_census_matches_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from kgforge.functions.graph import triad_census_ds

    rng = np.random.RandomState(17)
    nodes = ["n%02d" % i for i in range(12)]
    eset = set()
    # plant one clean FFL and one clean cycle, then random edges
    eset |= {("n00", "n01"), ("n01", "n02"), ("n00", "n02")}   # FFL
    eset |= {("n03", "n04"), ("n04", "n05"), ("n05", "n03")}   # cycle
    while len(eset) < 40:
        a, b = rng.choice(12, 2, replace=False)
        eset.add((nodes[a], nodes[b]))
    edges = sorted(eset)
    tbl = pa.table({
        "subj": pa.array([e[0] for e in edges]),
        "pred": pa.array(["r"] * len(edges)),
        "obj": pa.array([e[1] for e in edges])})
    got = triad_census_ds(rd.from_arrow(tbl)).to_pandas()
    got_d = dict(zip(got["motif"], got["n"]))

    ffl = cyc = 0
    for a, b, c in itertools.permutations(nodes, 3):
        if (a, b) in eset and (b, c) in eset:
            if (a, c) in eset:
                ffl += 1
            if (c, a) in eset:
                cyc += 1
    assert got_d == {"ffl": ffl, "cycle": cyc // 3}
    assert got_d["ffl"] >= 1 and got_d["cycle"] >= 1


def test_source_length_w1_matches_scipy_style_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import source_length_w1_ds

    rng = np.random.RandomState(23)
    rows = []
    # s0 short docs, s1 long docs (planted shift), s2 mixed
    for i in range(90):
        src = "s%d" % (i % 3)
        n = {"s0": rng.randint(1, 5), "s1": rng.randint(8, 15),
             "s2": rng.randint(1, 15)}[src]
        rows.append((src, " ".join(["w"] * n)))
    rows.append(("s0", ""))              # zero-token doc
    tbl = pa.table({"source": pa.array([r[0] for r in rows]),
                    "text": pa.array([r[1] for r in rows])})
    got = source_length_w1_ds(rd.from_arrow(tbl)).to_pandas()

    lens = {}
    for src, text in rows:
        lens.setdefault(src, []).append(len(text.split()))

    def w1(xs, ys):
        # exact integer cross-multiplied CDF area over the union grid
        dom = sorted(set(xs) | set(ys))
        na, nb = len(xs), len(ys)
        num = 0
        for k in range(len(dom) - 1):
            fa = sum(1 for x in xs if x <= dom[k])
            fb = sum(1 for y in ys if y <= dom[k])
            num += abs(fa * nb - fb * na) * (dom[k + 1] - dom[k])
        return num * 1_000_000 // (na * nb)

    for _, r in got.iterrows():
        exp = w1(lens[r["source_a"]], lens[r["source_b"]])
        assert r["w1_micro"] == exp, (r["source_a"], r["source_b"])
        assert r["n_a"] == len(lens[r["source_a"]])
    gd = {(r["source_a"], r["source_b"]): r["w1_micro"]
          for _, r in got.iterrows()}
    # planted shift: the short-vs-long pair dominates
    assert gd[("s0", "s1")] == max(gd.values()) > 0


def test_benford_digits_matches_bruteforce(ray_session, tmp_path):
    import math

    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_benford_digits

    rng = np.random.RandomState(31)
    # log-uniform prices follow Benford closely; add exact edge cents
    prices = list(np.exp(rng.uniform(0, 10, 400)))
    prices += [0.01, 9.99, 100.00, 0.0]
    n = len(prices)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(np.zeros(n, np.int64)),
        "o_orderstatus": pa.array(["O"] * n),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array(np.zeros(n, np.int64),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n)}),
        str(tmp_path / "orders.parquet"))
    got = q_benford_digits(str(tmp_path)).to_pandas()

    def lead(p):
        c = abs(int(math.floor(abs(p * 100) + 0.5)))
        if c == 0:
            return 1
        while c >= 10:
            c //= 10
        return c

    obs = [0] * 10
    for p in prices:
        obs[lead(p)] += 1
    tot = sum(obs[1:])

    def L(x):
        v = math.log(x) * 1e6
        return int(math.floor(v + 0.5))

    for _, r in got.iterrows():
        d = int(r["digit"])
        assert r["observed"] == obs[d]
        exp = tot * (L(d + 1) - L(d)) // L(10)
        assert r["expected"] == exp
        assert r["abs_dev"] == abs(obs[d] - exp)
    # log-uniform fixture: digit 1 dominates, near-monotone decay
    o = list(got.sort_values("digit")["observed"])
    assert o[0] == max(o)


def test_dsir_topk_is_the_sorted_head(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import (q_dsir_topk,
                                                  q_dsir_weights)

    rng = np.random.RandomState(41)
    vocab = ["alpha", "beta", "uno", "dos", "tres"]
    rows = [(i, "en" if i % 2 == 0 else "es",
             " ".join(vocab[rng.randint(5)]
                      for _ in range(rng.randint(1, 9))))
            for i in range(150)]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows]),
        "source": pa.array(["s"] * 150),
        "text": pa.array([r[2] for r in rows]),
        "n_chars": pa.array([len(r[2]) for r in rows], pa.int64())}),
        str(tmp_path / "documents.parquet"))
    allw = q_dsir_weights(str(tmp_path)).to_pandas()
    top = q_dsir_topk(str(tmp_path)).to_pandas()
    exp = allw.sort_values(["weight_micro", "doc_id"],
                           ascending=[False, True]).head(100)
    assert list(top["doc_id"]) == list(exp["doc_id"])
    assert list(top["weight_micro"]) == list(exp["weight_micro"])
