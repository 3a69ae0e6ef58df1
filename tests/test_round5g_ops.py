"""Round-5 session-G operators: per-key interval-union coverage,
item-item cosine CF neighbors, widest (max-bottleneck) paths and the
declared-vs-predicted language confusion matrix — each against an
independent brute-force oracle."""

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _union_len(intervals):
    """Brute-force interval union length via sorted merge."""
    out = 0
    cur_s = cur_e = None
    for s, e in sorted(intervals):
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                out += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        out += cur_e - cur_s
    return out


def test_interval_coverage_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_interval_coverage

    rng = np.random.RandomState(7)
    rows = []
    for u in range(30):
        t = int(rng.randint(0, 10**9))
        for _ in range(int(rng.randint(1, 12))):
            t += int(rng.randint(0, 7200) * 1_000_000)
            # durations in "value minutes", incl. overlapping + zero
            rows.append((u, t, float(rng.choice(
                [0.0, 0.5, 5.0, 60.0, 240.0]))))
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64())}),
        str(tmp_path / "events.parquet"))

    got = q_interval_coverage(str(tmp_path)).to_pandas()

    per = {}
    for u, t, v in rows:
        d = max(int(np.floor(v * 60_000_000)), 0)
        per.setdefault(u, []).append((t, t + d))
    census = {}
    for ivs in per.values():
        u_len = _union_len(ivs)
        span = max(e for _, e in ivs) - min(s for s, _ in ivs)
        dec = min(u_len * 10 // span, 10) if span > 0 else 10
        n, su, ss = census.get(dec, (0, 0, 0))
        census[dec] = (n + 1, su + u_len, ss + span)
    assert list(got["decile"]) == sorted(census)
    for _, row in got.iterrows():
        n, su, ss = census[row["decile"]]
        assert (row["n_keys"], row["sum_union_us"],
                row["sum_span_us"]) == (n, su, ss)


def test_interval_coverage_partition_invariance(ray_session,
                                                tmp_path):
    """The decile census must not depend on block layout."""
    from kgforge.functions.events import interval_coverage_ds
    import ray.data as rd

    rng = np.random.RandomState(3)
    n = 400
    tbl = pa.table({
        "user_id": pa.array(rng.randint(0, 40, n), pa.int64()),
        "ts": pa.array(rng.randint(0, 10**7, n).astype(np.int64)
                       * 1_000_000).cast(pa.timestamp("us")),
        "value": pa.array(rng.uniform(0, 100, n), pa.float64())})
    a = interval_coverage_ds(rd.from_arrow(tbl)).to_pandas()
    b = interval_coverage_ds(
        rd.from_arrow(tbl).repartition(7)).to_pandas()
    assert a.equals(b)


def test_item_cf_topk_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_item_cf_topk

    rng = np.random.RandomState(11)
    rows = []
    for ok in range(120):
        for pk in rng.choice(25, size=rng.randint(1, 6),
                             replace=False):
            rows.append((ok, int(pk) + 100))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64())}),
        str(tmp_path / "lineitem.parquet"))

    got = q_item_cf_topk(str(tmp_path)).to_pandas()

    baskets = {}
    for ok, pk in rows:
        baskets.setdefault(ok, set()).add(pk)
    marg = {}
    from collections import Counter
    co = Counter()
    for parts in baskets.values():
        for p in parts:
            marg[p] = marg.get(p, 0) + 1
        for a, b in itertools.combinations(sorted(parts), 2):
            co[(a, b)] += 1
    anchors = sorted(marg, key=lambda p: (-marg[p], p))[:20]
    exp = []
    for p in sorted(anchors):
        nbrs = []
        for (a, b), n in co.items():
            if a == p:
                nbrs.append((b, n))
            elif b == p:
                nbrs.append((a, n))
        scored = sorted(
            ((nb, n, n * n * 1_000_000 // (marg[p] * marg[nb]))
             for nb, n in nbrs),
            key=lambda t: (-t[2], t[0]))[:5]
        for rk, (nb, n, c2) in enumerate(scored, 1):
            exp.append((p, nb, n, c2, rk))
    assert len(got) == len(exp)
    for (_, row), e in zip(got.iterrows(), exp):
        assert (row["part"], row["nbr"], row["n_co"],
                row["cos2_ppm"], row["rnk"]) == e


def test_widest_paths_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import widest_paths_ds

    rng = np.random.RandomState(5)
    edges = {}
    while len(edges) < 40:
        a, b = rng.randint(0, 15, 2)
        if a != b:
            k = (f"n{min(a, b):02d}", f"n{max(a, b):02d}")
            edges.setdefault(k, int(rng.randint(1, 9)))
    tbl = pa.table({
        "a": pa.array([k[0] for k in edges]),
        "b": pa.array([k[1] for k in edges]),
        "n_sents": pa.array(list(edges.values()), pa.int64())})

    got = widest_paths_ds(rd.from_arrow(tbl).repartition(3),
                          n_seeds=3, max_hops=4).to_pandas()

    nodes = sorted({n for k in edges for n in k})
    seeds = nodes[:3]
    INF = 1 << 40
    width = {s: INF for s in seeds}
    adj = {}
    for (a, b), w in edges.items():
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    for _ in range(4):
        snap = dict(width)
        for u, wu in snap.items():
            for v, w in adj.get(u, []):
                cand = min(wu, w)
                if cand > width.get(v, 0):
                    width[v] = cand
    exp = {n: w for n, w in width.items() if n not in seeds}
    assert list(got["node"]) == sorted(exp)
    for _, row in got.iterrows():
        assert row["width"] == exp[row["node"]]


def test_lang_confusion_shares_sum(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_lang_confusion

    texts = ["the cat of the house and more", "der hund und die katze",
             "el gato la casa los perros", "zzz qqq", "the el la of"]
    langs = ["en", "en", "es", "de", "es"]
    pq.write_table(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(texts))]),
        "text": pa.array(texts), "lang": pa.array(langs)}),
        str(tmp_path / "documents.parquet"))

    got = q_lang_confusion(str(tmp_path)).to_pandas()

    # brute force: replicate the fixed-precedence argmax
    import re
    def pred(t):
        en = len(re.findall(r"\b(the|of|and)\b", t))
        de = len(re.findall(r"\b(der|die|und)\b", t))
        es = len(re.findall(r"\b(el|la|los)\b", t))
        if en >= de and en >= es and en > 0:
            return "en"
        if de >= es and de > 0:
            return "de"
        return "es" if es > 0 else "unk"

    from collections import Counter
    cm = Counter((l, pred(t)) for l, t in zip(langs, texts))
    tot = Counter()
    for (l, _), n in cm.items():
        tot[l] += n
    assert len(got) == len(cm)
    for _, row in got.iterrows():
        key = (row["lang"], row["pred_lang"])
        assert row["n_docs"] == cm[key]
        assert row["share_ppm"] == \
            cm[key] * 1_000_000 // tot[row["lang"]]


def test_bipartite_butterflies_matches_bruteforce(ray_session,
                                                  tmp_path):
    from kgforge.pipelines.driver_queries import \
        q_bipartite_butterflies

    rng = np.random.RandomState(17)
    rows = []
    for p in range(30):
        for s in rng.choice(12, size=rng.randint(1, 5),
                            replace=False):
            rows.append((p, int(s)))
    rows += rows[:10]          # duplicates must not double-count
    pq.write_table(pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64())}),
        str(tmp_path / "lineitem.parquet"))

    got = q_bipartite_butterflies(str(tmp_path)).to_pandas()

    adj = sorted(set(rows))
    by_p = {}
    for p, s in adj:
        by_p.setdefault(p, set()).add(s)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in by_p.values())
    from collections import Counter
    co = Counter()
    for v in by_p.values():
        for a, b in itertools.combinations(sorted(v), 2):
            co[(a, b)] += 1
    bf = sum(n * (n - 1) // 2 for n in co.values())
    row = got.iloc[0]
    assert (row["n_parts"], row["n_suppliers"], row["n_adj"],
            row["n_wedges"], row["n_butterflies"]) == \
        (len(by_p), len({s for _, s in adj}), len(adj), wedges, bf)


def test_knn_purity_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_knn_purity

    rng = np.random.RandomState(29)
    n, d = 60, 8
    centers = rng.normal(0, 5, (3, d))
    labels = rng.randint(0, 3, n)
    vecs = centers[labels] + rng.normal(0, 1, (n, d))
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int64))}),
        str(tmp_path / "embeddings.parquet"))

    got = q_knn_purity(str(tmp_path)).to_pandas()

    vf = np.array([np.asarray(v, np.float32) for v in
                   [list(map(float, r)) for r in vecs]],
                  dtype=np.float64)
    un = vf / np.linalg.norm(vf, axis=1, keepdims=True)
    sims = un @ un.T
    census = {}
    for q in range(n):
        s = sims[q].copy()
        s[q] = -np.inf
        best = np.lexsort((np.arange(n), -s))[0]
        lq = labels[q]
        c = census.get(lq, [0, 0])
        c[0] += 1
        c[1] += int(labels[best] == lq)
        census[lq] = c
    assert list(got["label"]) == sorted(census)
    for _, row in got.iterrows():
        nq, ok = census[row["label"]]
        assert (row["n_queries"], row["n_correct"],
                row["purity_ppm"]) == (nq, ok,
                                       ok * 1_000_000 // nq)


def test_psi_value_drift_matches_bruteforce(ray_session, tmp_path):
    import math

    from kgforge.pipelines.driver_queries import q_psi_value_drift

    rng = np.random.RandomState(41)
    n = 600
    et = rng.choice(["view", "click"], n)
    val = np.where(et == "view", rng.uniform(0, 500, n),
                   rng.uniform(0, 200, n))
    # odd half of "click" drifts upward → nonzero PSI
    eid = np.arange(n)
    val = np.where((et == "click") & (eid % 2 == 1), val + 150, val)
    pq.write_table(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "event_type": pa.array(et.tolist()),
        "value": pa.array(val, pa.float64())}),
        str(tmp_path / "events.parquet"))

    got = q_psi_value_drift(str(tmp_path)).to_pandas()

    def L(v):
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    exp = {}
    for t in ("click", "view"):
        m = et == t
        ev = val[m & (eid % 2 == 0)]
        ov = val[m & (eid % 2 == 1)]
        acc = 0
        for b in range(10):
            ce = int(((ev // 50).clip(max=9) == b).sum())
            co = int(((ov // 50).clip(max=9) == b).sum())
            if ce > 0 and co > 0:
                p = ce * 1_000_000 // len(ev)
                q = co * 1_000_000 // len(ov)
                if p > 0 and q > 0:
                    acc += (p - q) * (L(p) - L(q))
        exp[t] = (len(ev), len(ov), acc // 1_000_000)
    assert list(got["event_type"]) == sorted(exp)
    for _, row in got.iterrows():
        assert (row["n_even"], row["n_odd"], row["psi_micro"]) == \
            exp[row["event_type"]]
    assert got.set_index("event_type").loc["click", "psi_micro"] > 0


def test_mutual_reach_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import mutual_reach_ds

    rng = np.random.RandomState(13)
    edges = set()
    while len(edges) < 70:
        a, b = rng.randint(0, 20, 2)
        if a != b:
            edges.add((f"n{a:02d}", f"n{b:02d}"))
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})

    got = mutual_reach_ds(rd.from_arrow(tbl).repartition(3),
                          n_seeds=3, max_hops=4).to_pandas()

    nodes = sorted({n for e in edges for n in e})
    seeds = nodes[:3]
    fadj, badj = {}, {}
    for a, b in edges:
        fadj.setdefault(a, set()).add(b)
        badj.setdefault(b, set()).add(a)

    def reach(s, adj, hops):
        vis, fr = {s}, {s}
        for _ in range(hops):
            nxt = set()
            for u in fr:
                nxt |= adj.get(u, set())
            fr = nxt - vis
            vis |= fr
        return vis

    exp = []
    for s in seeds:
        both = (reach(s, fadj, 4) & reach(s, badj, 4)) - {s}
        exp.extend((s, n) for n in sorted(both))
    assert exp, "fixture must exercise nonempty mutual sets"
    assert list(map(tuple, got.values)) == exp


def test_markov_absorption_matches_bruteforce(ray_session,
                                              tmp_path):
    from kgforge.pipelines.driver_queries import q_markov_absorption

    rng = np.random.RandomState(19)
    rows = []
    eid = 0
    for u in range(40):
        for _ in range(15):
            rows.append((u, eid * 1_000_000, eid, str(rng.choice(
                ["view", "click", "cart", "purchase"]))))
            eid += 1
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows])}),
        str(tmp_path / "events.parquet"))

    got = q_markov_absorption(str(tmp_path)).to_pandas()

    from collections import Counter
    c = Counter()
    by_u = {}
    for u, t, e, et in rows:
        by_u.setdefault(u, []).append((t, e, et))
    for seq in by_u.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq[:-1], seq[1:]):
            c[(a, b)] += 1
    states = sorted({s for k in c for s in k})
    rs = {s: sum(n for (a, _), n in c.items() if a == s)
          for s in states}
    p = {s: 1_000_000 if s == "purchase" else 0 for s in states}
    for _ in range(4):
        p = {s: 1_000_000 if s == "purchase" else
             (sum(c.get((s, t), 0) * p[t] for t in states)
              // rs[s] if rs.get(s) else 0)
             for s in states}
    assert list(got["event_type"]) == states
    for _, row in got.iterrows():
        assert row["reach_ppm"] == p[row["event_type"]]
    # absorbing state pinned, others strictly inside (0, 1)
    gp = dict(zip(got["event_type"], got["reach_ppm"]))
    assert gp["purchase"] == 1_000_000
    assert all(0 < v < 1_000_000 for s, v in gp.items()
               if s != "purchase")


def test_ipf_allocation_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_ipf_allocation

    rng = np.random.RandomState(23)
    n_cust, n_orders = 25, 400
    nat = rng.randint(0, 5, n_cust)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_nationkey": pa.array(nat.astype(np.int64))}),
        str(tmp_path / "customer.parquet"))
    ck = rng.randint(0, n_cust, n_orders)
    yr = rng.randint(0, 3, n_orders)
    price = np.round(rng.uniform(10, 500, n_orders), 2)
    dates = (np.datetime64("2021-01-15") +
             (yr * 365).astype("timedelta64[D]"))
    pq.write_table(pa.table({
        "o_custkey": pa.array(ck.astype(np.int64)),
        "o_orderdate": pa.array(dates),
        "o_totalprice": pa.array(price, pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = q_ipf_allocation(str(tmp_path)).to_pandas()

    cells = {}
    for k, y, pr in zip(ck, yr, price):
        key = (int(nat[k]), 2021 + int(y))
        cells[key] = cells.get(key, 0) + int(round(pr * 100))
    tot = sum(cells.values())
    nks = sorted({k for k, _ in cells})
    yys = sorted({y for _, y in cells})
    t_row, t_col = tot // len(nks), tot // len(yys)
    rsum = {k: sum(v for (a, _), v in cells.items() if a == k)
            for k in nks}
    v1 = {key: v * t_row // max(rsum[key[0]], 1)
          for key, v in cells.items()}
    csum = {y: sum(v for (_, b), v in v1.items() if b == y)
            for y in yys}
    v2 = {key: v * t_col // max(csum[key[1]], 1)
          for key, v in v1.items()}
    assert len(got) == len(cells)
    for _, row in got.iterrows():
        key = (row["nationkey"], row["o_year"])
        assert row["cents_raw"] == cells[key]
        assert row["cents_raked"] == v2[key]
    # raking moved row sums toward the uniform target
    raked_rows = got.groupby("nationkey")["cents_raked"].sum()
    assert (abs(raked_rows - t_row) <= abs(
        got.groupby("nationkey")["cents_raw"].sum() - t_row)).all()


def test_golden_record_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_golden_record

    texts = ["TEMPLATE-A: hello world x", "TEMPLATE-A: hello there",
             "TEMPLATE-B: one", "TEMPLATE-B: two", "TEMPLATE-B: 3",
             "unique text entirely"]
    srcs = ["web", "api", "web", "web", "feed", "web"]
    langs = ["en", "de", "en", "en", "en", "es"]
    pq.write_table(pa.table({
        "doc_id": pa.array([10, 3, 7, 5, 9, 1], pa.int64()),
        "text": pa.array(texts), "source": pa.array(srcs),
        "lang": pa.array(langs)}),
        str(tmp_path / "documents.parquet"))

    got = q_golden_record(str(tmp_path)).to_pandas()

    fam = {}
    for did, t, s, l in zip([10, 3, 7, 5, 9, 1], texts, srcs, langs):
        fam.setdefault(t[:16], []).append((did, s, l))
    exp = []
    for k in sorted(fam):
        mem = fam[k]
        if len(mem) < 2:
            continue
        exp.append((k, min(m[0] for m in mem), len(mem),
                    len({m[1] for m in mem}),
                    min(m[1] for m in mem),
                    len({m[2] for m in mem}),
                    min(m[2] for m in mem)))
    assert len(got) == len(exp)
    for (_, row), e in zip(got.iterrows(), exp):
        assert (row["block_key"], row["keep_id"], row["n_members"],
                row["n_sources"], row["canon_source"],
                row["n_langs"], row["canon_lang"]) == e


def test_golden_record_empty_is_typed(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_golden_record

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["abcdefghijklmnopq", "zyxwvutsrqponmlk"]),
        "source": pa.array(["a", "b"]),
        "lang": pa.array(["en", "en"])}),
        str(tmp_path / "documents.parquet"))
    got = q_golden_record(str(tmp_path))
    assert got.num_rows == 0
    assert got.schema.field("keep_id").type == pa.int64()


def test_triplet_margin_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_triplet_margin

    rng = np.random.RandomState(31)
    n, d = 80, 6
    centers = rng.normal(0, 4, (4, d))
    labels = rng.randint(0, 4, n)
    vecs = centers[labels] + rng.normal(0, 1.5, (n, d))
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int64))}),
        str(tmp_path / "embeddings.parquet"))

    got = q_triplet_margin(str(tmp_path)).to_pandas()

    vf = np.array([np.asarray(np.array(v, np.float32), np.float64)
                   for v in vecs])
    labs = sorted(set(labels.tolist()))
    first = {l: int(np.flatnonzero(labels == l).min()) for l in labs}

    def cyc(l):
        big = [x for x in labs if x > l]
        return big[0] if big else labs[0]

    def cos(a, b):
        return float(vf[a] @ vf[b] /
                     (np.linalg.norm(vf[a]) * np.linalg.norm(vf[b])))

    census = {}
    for a in range(min(n, 500)):
        same = np.flatnonzero((labels == labels[a]) &
                              (np.arange(n) > a))
        if not len(same):
            continue
        pos, neg = int(same.min()), first[cyc(int(labels[a]))]
        nq, v = census.get(int(labels[a]), (0, 0))
        census[int(labels[a])] = (nq + 1,
                                  v + (cos(a, pos) <= cos(a, neg)))
    assert list(got["label"]) == sorted(census)
    for _, row in got.iterrows():
        nq, v = census[row["label"]]
        assert (row["n_triplets"], row["n_violations"],
                row["viol_ppm"]) == (nq, v, v * 1_000_000 // nq)


def test_quantile_norm_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_quantile_norm

    rng = np.random.RandomState(37)
    n = 300
    srcs = rng.choice(["a", "b", "c"], n)
    nc = rng.randint(5, 500, n)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array(srcs.tolist()),
        "n_chars": pa.array(nc.astype(np.int64))}),
        str(tmp_path / "documents.parquet"))

    got = q_quantile_norm(str(tmp_path)).to_pandas()

    order = np.lexsort((np.arange(n), nc))
    gsorted = nc[order]
    gq = {d: int(gsorted[(n - 1) * (2 * d + 1) // 20])
          for d in range(10)}
    exp = {}
    for s in ("a", "b", "c"):
        m = np.flatnonzero(srcs == s)
        so = m[np.lexsort((m, nc[m]))]
        cnt = len(so)
        for rn, i in enumerate(so):
            dec = rn * 10 // cnt
            k = (s, dec)
            nn, sc = exp.get(k, (0, 0))
            exp[k] = (nn + 1, sc + int(nc[i]))
    assert len(got) == len(exp)
    for _, row in got.iterrows():
        k = (row["source"], row["decile"])
        nn, sc = exp[k]
        assert (row["n_docs"], row["sum_chars"],
                row["global_q_chars"]) == (nn, sc, gq[row["decile"]])


def test_isotonic_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import \
        q_isotonic_return_rate

    rng = np.random.RandomState(43)
    n = 1500
    disc = rng.randint(0, 8, n) / 100.0
    # non-monotone raw rates so PAVA must actually pool
    p_ret = np.where(disc * 100 % 3 == 0, 0.4, 0.1)
    ret = rng.uniform(0, 1, n) < p_ret
    pq.write_table(pa.table({
        "l_discount": pa.array(disc, pa.float64()),
        "l_returnflag": pa.array(
            np.where(ret, "R", "N").tolist())}),
        str(tmp_path / "lineitem.parquet"))

    got = q_isotonic_return_rate(str(tmp_path)).to_pandas()

    lev = sorted({int(round(d * 100)) for d in disc})
    nn = {d: 0 for d in lev}
    rr = {d: 0 for d in lev}
    for d, r in zip(disc, ret):
        k = int(round(d * 100))
        nn[k] += 1
        rr[k] += int(r)
    L = len(lev)

    def rate(j, k):
        return sum(rr[lev[x]] for x in range(j, k + 1)) \
            * 1_000_000 // sum(nn[lev[x]] for x in range(j, k + 1))

    iso = [max(min(rate(j, k) for k in range(i, L))
               for j in range(i + 1)) for i in range(L)]
    assert list(got["discount_cents"]) == lev
    assert list(got["iso_ppm"]) == iso
    v = got["iso_ppm"].to_numpy()
    assert (np.diff(v) >= 0).all()
    assert not (np.diff(got["raw_ppm"].to_numpy()) >= 0).all()


def test_leadlag_recovers_planted_lag(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_leadlag_xcorr

    rng = np.random.RandomState(47)
    rows = []
    base = 1_600_000_000_000_000
    for h in range(120):
        nv = int(rng.poisson(20) + (30 if h % 24 == 9 else 0))
        npu = int(rng.poisson(5) + (25 if (h - 3) % 24 == 9 else 0))
        for _ in range(nv):
            rows.append((base + h * 3_600_000_000, "view"))
        for _ in range(npu):
            rows.append((base + h * 3_600_000_000, "purchase"))
    pq.write_table(pa.table({
        "ts": pa.array(np.array([r[0] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows])}),
        str(tmp_path / "events.parquet"))

    got = q_leadlag_xcorr(str(tmp_path)).to_pandas()
    assert len(got) == 25
    assert got["is_best"].sum() == 1
    best = int(got.loc[got["is_best"] == 1, "lag_hours"].iloc[0])
    assert best == 3          # purchases trail views by 3 hours


def test_l_diversity_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_l_diversity

    rng = np.random.RandomState(53)
    n = 500
    pr = rng.choice(["1-URGENT", "2-HIGH", "3-NORMAL"], n)
    yr = rng.randint(0, 2, n)
    # diversity varies by priority: urgent groups see 1 status
    st = np.where(pr == "1-URGENT", "F",
                  rng.choice(["F", "O", "P"], n))
    dates = (np.datetime64("2020-06-01") +
             (yr * 365).astype("timedelta64[D]"))
    pq.write_table(pa.table({
        "o_orderpriority": pa.array(pr.tolist()),
        "o_orderdate": pa.array(dates),
        "o_orderstatus": pa.array(st.tolist())}),
        str(tmp_path / "orders.parquet"))

    got = q_l_diversity(str(tmp_path)).to_pandas()

    per = {}
    for p, y, s in zip(pr, yr, st):
        per.setdefault((p, 2020 + y), set()).add(s)
    cnt = {}
    for p, y, s in zip(pr, yr, st):
        cnt[(p, 2020 + y)] = cnt.get((p, 2020 + y), 0) + 1
    census = {}
    for k, ss in per.items():
        g, r = census.get(len(ss), (0, 0))
        census[len(ss)] = (g + 1, r + cnt[k])
    assert list(got["l_distinct"]) == sorted(census)
    for _, row in got.iterrows():
        g, r = census[row["l_distinct"]]
        assert (row["n_groups"], row["n_rows"]) == (g, r)
    assert len(got) > 1


def test_calendar_gapfill_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_calendar_gapfill

    rng = np.random.RandomState(59)
    n_cust = 20
    nat = rng.randint(0, 4, n_cust)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_nationkey": pa.array(nat.astype(np.int64))}),
        str(tmp_path / "customer.parquet"))
    ck = rng.randint(0, n_cust, 300)
    day = rng.choice(np.sort(rng.choice(400, 60, replace=False)),
                     300)
    dates = (np.datetime64("2019-01-01") +
             day.astype("timedelta64[D]"))
    pq.write_table(pa.table({
        "o_custkey": pa.array(ck.astype(np.int64)),
        "o_orderdate": pa.array(dates)}),
        str(tmp_path / "orders.parquet"))

    got = q_calendar_gapfill(str(tmp_path)).to_pandas()

    from collections import Counter
    per = {}
    for c, d in zip(ck, day):
        per.setdefault(int(nat[c]), Counter())[int(d)] += 1
    assert list(got["nationkey"]) == sorted(per)
    for _, row in got.iterrows():
        cnt = per[row["nationkey"]]
        days = sorted(cnt)
        span = days[-1] - days[0] + 1
        gaps = max((b - a - 1 for a, b in zip(days, days[1:])),
                   default=0)
        assert (row["n_days_active"], row["n_days_span"],
                row["n_days_zero"], row["longest_zero_streak"],
                row["max_daily"]) == \
            (len(days), span, span - len(days), gaps,
             max(cnt.values()))


def test_robust_scaler_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import \
        q_robust_scaler_params

    rng = np.random.RandomState(61)
    n, d = 200, 64
    vecs = rng.normal(0, 2, (n, d)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))

    got = q_robust_scaler_params(str(tmp_path)).to_pandas()
    assert list(got["dim"]) == list(range(1, 65))
    micro = np.floor(vecs.astype(np.float64) * 1_000_000
                     + 0.5).astype(np.int64)
    for _, row in got.iterrows():
        vv = np.sort(micro[:, row["dim"] - 1])
        assert row["p05_micro"] == vv[(n - 1) * 5 // 100]
        assert row["p50_micro"] == vv[(n - 1) * 50 // 100]
        assert row["p95_micro"] == vv[(n - 1) * 95 // 100]


def test_substitute_ladder_matches_bruteforce(ray_session,
                                              tmp_path):
    from kgforge.pipelines.driver_queries import q_substitute_ladder

    rng = np.random.RandomState(67)
    n = 120
    brand = rng.choice(["B1", "B2", "B3"], n)
    price = np.round(rng.uniform(1, 100, n), 2)
    price[5] = price[9]          # tie inside a brand
    brand[9] = brand[5]
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_brand": pa.array(brand.tolist()),
        "p_retailprice": pa.array(price, pa.float64())}),
        str(tmp_path / "part.parquet"))

    got = q_substitute_ladder(str(tmp_path)).to_pandas()

    exp = {}
    for b in set(brand.tolist()):
        m = np.flatnonzero(brand == b)
        cents = np.round(price[m] * 100).astype(np.int64)
        order = m[np.lexsort((m, cents[np.argsort(m).argsort()]))]
        ladder = sorted(zip(np.round(price[m] * 100)
                            .astype(np.int64), m))
        for (c1, k1), (c0, k0) in zip(ladder[1:], ladder[:-1]):
            exp[k1] = (k0, c1, c0, c0 * 1_000_000 // max(c1, 1))
    assert list(got["p_partkey"]) == sorted(exp)
    for _, row in got.iterrows():
        k0, c1, c0, rt = exp[row["p_partkey"]]
        assert (row["sub_partkey"], row["price_cents"],
                row["sub_price_cents"], row["ratio_ppm"]) == \
            (k0, c1, c0, rt)


def test_cross_entropy_matrix_matches_bruteforce(ray_session,
                                                 tmp_path):
    import math

    from kgforge.pipelines.driver_queries import \
        q_cross_entropy_matrix

    rng = np.random.RandomState(71)
    vocab_a = ["apple", "banana", "cherry", "date"]
    vocab_b = ["alpha", "beta", "gamma", "banana"]
    texts, srcs = [], []
    for i in range(30):
        v = vocab_a if i % 2 == 0 else vocab_b
        texts.append(" ".join(rng.choice(v, rng.randint(3, 12))))
        srcs.append("sa" if i % 2 == 0 else "sb")
    pq.write_table(pa.table({
        "source": pa.array(srcs), "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"))

    got = q_cross_entropy_matrix(str(tmp_path)).to_pandas()

    from collections import Counter
    cnt = {s: Counter() for s in ("sa", "sb")}
    for s, t in zip(srcs, texts):
        ws = t.split()
        for a, b in zip(ws[:-1], ws[1:]):
            cnt[s][(a, b)] += 1
    V = len(set().union(*[set(c) for c in cnt.values()]))
    N = {s: sum(c.values()) for s, c in cnt.items()}

    def L(v):
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    assert len(got) == 4
    for _, row in got.iterrows():
        ms, es = row["model_source"], row["eval_source"]
        acc = sum(ct * L(cnt[ms][bg] + 1)
                  for bg, ct in cnt[es].items())
        assert row["n_bigrams"] == N[es]
        assert row["xent_micro"] == L(N[ms] + V) - acc // N[es]
    # transfer must cost more than self-entropy
    m = got.set_index(["model_source", "eval_source"])["xent_micro"]
    assert m[("sa", "sb")] > m[("sb", "sb")]
    assert m[("sb", "sa")] > m[("sa", "sa")]


def test_conformal_coverage_matches_bruteforce(ray_session,
                                               tmp_path):
    from kgforge.pipelines.driver_queries import \
        q_conformal_coverage

    rng = np.random.RandomState(73)
    rows = []
    for nk in range(3):
        for ym_i in range(40):          # > 12 months → forecastable
            y, m = 2018 + ym_i // 12, ym_i % 12 + 1
            for _ in range(rng.randint(1, 4)):
                rows.append((nk * 7, np.datetime64(
                    f"{y}-{m:02d}-15"),
                    float(np.round(rng.uniform(50, 900), 2))))
    cust = pa.table({
        "c_custkey": pa.array([0, 7, 14], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2], pa.int64())})
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["ALGERIA", "BRAZIL", "CANADA"])}),
        str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(np.array([r[1] for r in rows],
                                         dtype="datetime64[us]")),
        "o_totalprice": pa.array([r[2] for r in rows],
                                 pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = q_conformal_coverage(str(tmp_path)).to_pandas()

    import collections
    rev = collections.defaultdict(int)
    for ck, d, p in rows:
        ym = int(str(d)[:4]) * 100 + int(str(d)[5:7])
        rev[(ck // 7, ym)] += int(round(p * 100))
    names = {0: "ALGERIA", 1: "BRAZIL", 2: "CANADA"}
    exp = {}
    for nk in range(3):
        series = {ym: c for (k, ym), c in rev.items() if k == nk}
        res = [(ym, abs(c - series[ym - 100]))
               for ym, c in sorted(series.items())
               if ym - 100 in series]
        n = len(res)
        n_cal = (n + 1) // 2
        n_test = n - n_cal
        cal = sorted(r for _, r in res[:n_cal])
        qhat = cal[(n_cal - 1) * 90 // 100]
        cov = sum(r <= qhat for _, r in res[n_cal:])
        exp[names[nk]] = (n_cal, n_test, qhat,
                          cov * 1_000_000 // n_test)
    assert list(got["n_name"]) == sorted(exp)
    for _, row in got.iterrows():
        assert (row["n_cal"], row["n_test"], row["qhat_cents"],
                row["coverage_ppm"]) == exp[row["n_name"]]


def test_next_event_ndcg_matches_bruteforce(ray_session, tmp_path):
    import math

    from kgforge.pipelines.driver_queries import q_next_event_ndcg

    rng = np.random.RandomState(79)
    rows = []
    eid = 0
    for u in range(30):
        for _ in range(20):
            rows.append((u, eid * 1_000_000, eid, str(rng.choice(
                ["view", "click", "cart", "purchase"],
                p=[0.5, 0.3, 0.1, 0.1]))))
            eid += 1
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows])}),
        str(tmp_path / "events.parquet"))

    got = q_next_event_ndcg(str(tmp_path)).to_pandas()

    from collections import Counter
    tr, ev = Counter(), Counter()
    by_u = {}
    for u, t, e, et in rows:
        by_u.setdefault(u, []).append((t, e, et))
    for u, seq in by_u.items():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq[:-1], seq[1:]):
            (tr if u % 2 == 0 else ev)[(a, b)] += 1
    rank = {}
    for prev in {a for a, _ in tr}:
        ordered = sorted(((-n, b) for (a, b), n in tr.items()
                          if a == prev))
        for r, (_, b) in enumerate(ordered[:3], 1):
            rank[(prev, b)] = r
    g = {r: 10**12 // round(math.log2(r + 1) * 1_000_000)
         for r in (1, 2, 3)}
    exp = {}
    for (a, b), n in ev.items():
        r = rank.get((a, b))
        ne, h1, gain = exp.get(a, (0, 0, 0))
        exp[a] = (ne + n, h1 + (n if r == 1 else 0),
                  gain + (n * g[r] if r else 0))
    assert list(got["prev_type"]) == sorted(exp)
    for _, row in got.iterrows():
        ne, h1, gain = exp[row["prev_type"]]
        assert (row["n_eval"], row["n_hit1"],
                row["ndcg_ppm"]) == (ne, h1, gain // ne)
