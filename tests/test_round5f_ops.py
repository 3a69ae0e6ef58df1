"""Round-5 session-F operators: average-neighbor-degree curve,
Theil–Sen nation trends, Kendall-tau rank stability, exact Spearman
over bounded domains, k-anonymity census and train/test split
leakage — each against an independent brute-force oracle."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_neighbor_degree_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import neighbor_degree_ds

    rng = np.random.RandomState(11)
    edges = set()
    while len(edges) < 60:
        a, b = rng.randint(0, 18, 2)
        if a != b:
            edges.add((f"n{a}", f"n{b}"))
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    got = neighbor_degree_ds(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas()

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(s) for n, s in adj.items()}
    by_k = {}
    for n, s in adj.items():
        k = deg[n]
        cnt, sd = by_k.get(k, (0, 0))
        by_k[k] = (cnt + 1, sd + sum(deg[m] for m in s))
    assert list(got["degree"]) == sorted(by_k)
    for _, row in got.iterrows():
        n_nodes, sd = by_k[row["degree"]]
        n_pairs = n_nodes * int(row["degree"])
        assert row["n_nodes"] == n_nodes
        assert row["n_pairs"] == n_pairs
        assert row["sum_nbr_deg"] == sd
        assert row["knn_micro"] == sd * 1_000_000 // n_pairs


def _write_nation_dims(tmp_path, n_nations=3):
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(n_nations, dtype=np.int32)),
        "n_name": pa.array([f"NATION{i:02d}"
                            for i in range(n_nations)]),
        "n_regionkey": pa.array(np.zeros(n_nations, np.int32))}),
        str(tmp_path / "nation.parquet"))


def test_theil_sen_nation_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_theil_sen_nation

    rng = np.random.RandomState(5)
    n_cust = 30
    cust_nation = rng.randint(0, 3, n_cust)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_nationkey": pa.array(cust_nation.astype(np.int32))}),
        str(tmp_path / "customer.parquet"))
    _write_nation_dims(tmp_path)

    # planted: nation 0 trends up, nation 2 trends down
    rows = []
    for i in range(400):
        ck = int(rng.randint(0, n_cust))
        nk = cust_nation[ck]
        mo = int(rng.randint(0, 18))
        base = 1000.0 + (50.0 * mo if nk == 0
                         else -40.0 * mo if nk == 2 else 0.0)
        price = round(base + rng.uniform(0, 200), 2)
        rows.append((ck, np.datetime64("1994-01-01", "us")
                     + np.timedelta64(mo, "M").astype("timedelta64[us]")
                     + np.timedelta64(int(rng.randint(0, 25)), "D")
                     .astype("timedelta64[us]"), price))
    pq.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[1] for r in rows],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows],
                                 pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = q_theil_sen_nation(str(tmp_path)).to_pandas()

    # brute force
    cells = {}
    for ck, ts, price in rows:
        d = ts.astype("datetime64[M]").astype(int) + 1970 * 12
        key = (int(cust_nation[ck]), int(d))
        cells[key] = cells.get(key, 0) + int(round(price * 100))
    exp = {}
    for nk in range(3):
        ms = sorted((ym, c) for (k, ym), c in cells.items()
                    if k == nk)
        if len(ms) < 2:
            continue
        slopes = []
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                dy = ms[j][1] - ms[i][1]
                dx = ms[j][0] - ms[i][0]
                q = abs(dy) * 1_000_000 // dx
                slopes.append(q if dy >= 0 else -q)
        slopes.sort()
        k = len(slopes)
        exp[f"NATION{nk:02d}"] = (
            len(ms), k, slopes[(k + 1) // 2 - 1] + slopes[k // 2])
    assert list(got["n_name"]) == sorted(exp)
    for _, row in got.iterrows():
        m, k, med2 = exp[row["n_name"]]
        assert (row["n_months"], row["n_pairs"],
                row["slope_med2"]) == (m, k, med2)
    # the planted trends have the right signs
    g = dict(zip(got["n_name"], got["slope_med2"]))
    assert g["NATION00"] > 0 > g["NATION02"]


def test_rank_stability_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_rank_stability

    rng = np.random.RandomState(9)
    rows = []
    # planted reversal: supplier s climbs with s early, falls late
    for s in range(12):
        for _ in range(6):
            early = rng.rand() < 0.5
            base = (100.0 * (s + 1) if early
                    else 100.0 * (12 - s))
            rows.append((s,
                         np.datetime64("1993-06-01", "us") if early
                         else np.datetime64("1996-06-01", "us"),
                         round(base + rng.uniform(0, 30), 2),
                         round(rng.choice([0.0, 0.05, 0.1]), 2)))
    pq.write_table(pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_shipdate": pa.array([r[1] for r in rows],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([r[2] for r in rows],
                                    pa.float64()),
        "l_discount": pa.array([r[3] for r in rows], pa.float64())}),
        str(tmp_path / "lineitem.parquet"))

    got = q_rank_stability(str(tmp_path)).to_pandas().iloc[0]

    def cents(p, d):
        x = p * (1 - d) * 100
        return int(np.floor(x + 0.5)) if x >= 0 else int(
            np.ceil(x - 0.5))

    ra, rb = {}, {}
    for s, ts, p, d in rows:
        tgt = ra if ts < np.datetime64("1995-01-01", "us") else rb
        tgt[s] = tgt.get(s, 0) + cents(p, d)
    sks = sorted(set(ra) | set(rb),
                 key=lambda s: (-(ra.get(s, 0) + rb.get(s, 0)), s))[:50]
    ka = {s: i for i, s in enumerate(
        sorted(sks, key=lambda s: (-ra.get(s, 0), s)), 1)}
    kb = {s: i for i, s in enumerate(
        sorted(sks, key=lambda s: (-rb.get(s, 0), s)), 1)}
    conc = disc = 0
    for i in range(len(sks)):
        for j in range(i + 1, len(sks)):
            v = ((ka[sks[i]] - ka[sks[j]])
                 * (kb[sks[i]] - kb[sks[j]]))
            conc += v > 0
            disc += v < 0
    np_ = len(sks) * (len(sks) - 1) // 2
    d = conc - disc
    tau = abs(d) * 1_000_000 // np_
    if d < 0:
        tau = -tau
    assert (got["n_items"], got["n_pairs"], got["n_concordant"],
            got["n_discordant"], got["tau_ppm"]) \
        == (len(sks), np_, conc, disc, tau)
    assert got["tau_ppm"] < 0   # the planted reversal dominates


def test_spearman_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import (
        q_spearman_qty_discount,
    )

    rng = np.random.RandomState(3)
    n = 500
    qty = rng.randint(1, 51, n)
    # planted monotone link: discount grows with quantity + noise
    disc = np.clip((qty // 10 + rng.randint(-1, 2, n)), 0, 10) / 100.0
    pq.write_table(pa.table({
        "l_quantity": pa.array(qty.astype(np.float64)),
        "l_discount": pa.array(disc)}),
        str(tmp_path / "lineitem.parquet"))

    got = q_spearman_qty_discount(str(tmp_path)).iloc[0]

    def avg_ranks(v):
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v), dtype=np.float64)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            r[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return r

    rx = avg_ranks(qty.astype(np.int64))
    ry = avg_ranks(np.rint(disc * 100).astype(np.int64))
    exp = np.corrcoef(rx, ry)[0, 1]
    assert got["n"] == n
    assert abs(got["rho"] - exp) < 2e-6
    assert got["rho"] > 0.5   # the planted link is visible


def test_k_anonymity_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_k_anonymity

    rng = np.random.RandomState(2)
    nk = rng.randint(0, 4, 300).astype(np.int32)
    seg = np.array(["A", "B"])[rng.randint(0, 2, 300)]
    # planted singleton class
    nk = np.append(nk, np.int32(9))
    seg = np.append(seg, "Z")
    pq.write_table(pa.table({
        "c_nationkey": pa.array(nk),
        "c_mktsegment": pa.array(seg)}),
        str(tmp_path / "customer.parquet"))

    got = q_k_anonymity(str(tmp_path)).to_pandas().iloc[0]

    from collections import Counter
    cls = Counter(zip(nk.tolist(), seg.tolist()))
    cs = np.array(sorted(cls.values()))
    assert got["n_rows"] == 301
    assert got["n_classes"] == len(cs)
    assert got["min_class"] == 1 and got["max_class"] == cs.max()
    assert got["n_classes_lt5"] == int((cs < 5).sum())
    assert got["n_rows_lt5"] == int(cs[cs < 5].sum())
    assert got["n_classes_lt50"] == int((cs < 50).sum())
    assert got["n_rows_lt50"] == int(cs[cs < 50].sum())


def test_split_leakage_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_split_leakage

    rng = np.random.RandomState(8)
    texts, ids = [], []
    base = ["the quick fox", "lazy dogs sleep", "hello world",
            "data pipeline", "graph engine"]
    for i in range(200):
        t = base[rng.randint(0, len(base))]
        if rng.rand() < 0.5:   # normalization-equivalent variants
            t = t.upper() + "!!"
        texts.append(t + ("" if rng.rand() < 0.7
                          else f" extra {rng.randint(0, 30)}"))
        ids.append(i)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.array(ids, np.int64)),
        "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"))

    got = q_split_leakage(str(tmp_path)).to_pandas().iloc[0]

    import re
    def norm(t):
        return re.sub(r" +", " ",
                      re.sub(r"[^a-z0-9 ]+", "", t.lower())).strip()

    cls = {}
    for i, t in zip(ids, texts):
        bucket = int(hashlib.md5(str(i).encode())
                     .hexdigest()[:8], 16) % 100
        h = hashlib.md5(norm(t).encode()).hexdigest()
        nt, nv = cls.get(h, (0, 0))
        cls[h] = (nt + (bucket < 80), nv + (bucket >= 80))
    n_train = sum(v[0] for v in cls.values())
    n_test = sum(v[1] for v in cls.values())
    leaked = sum(v[1] for v in cls.values() if v[0] > 0 and v[1] > 0)
    shared = sum(1 for v in cls.values() if v[0] > 0 and v[1] > 0)
    assert (got["n_train"], got["n_test"], got["n_leaked_test"],
            got["n_shared_classes"]) \
        == (n_train, n_test, leaked, shared)
    assert got["leak_ppm"] == leaked * 1_000_000 // n_test
    assert leaked > 0   # the planted dup families cross the split


def test_cohort_ltv_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_cohort_ltv

    rng = np.random.RandomState(6)
    rows = []
    for _ in range(300):
        ck = int(rng.randint(0, 40))
        mo = int(rng.randint(0, 12))
        price = round(float(rng.uniform(50, 500)), 2)
        ts = (np.datetime64("1995-01-01", "us")
              + np.timedelta64(mo, "M").astype("timedelta64[us]")
              + np.timedelta64(int(rng.randint(0, 25)), "D")
              .astype("timedelta64[us]"))
        rows.append((ck, ts, price))
    pq.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[1] for r in rows],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows],
                                 pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = q_cohort_ltv(str(tmp_path)).to_pandas()

    ym_of = {}
    for ck, ts, price in rows:
        ym = int(ts.astype("datetime64[M]").astype(int)) + 1970 * 12
        ym_of.setdefault(ck, []).append((ym, int(round(price * 100))))
    cohort_of = {ck: min(v[0] for v in lst)
                 for ck, lst in ym_of.items()}
    cells, ncust = {}, {}
    for ck, lst in ym_of.items():
        co = cohort_of[ck]
        ncust[co] = ncust.get(co, 0) + 1
        for ym, cents in lst:
            key = (co, ym - co)
            cells[key] = cells.get(key, 0) + cents
    exp, cum = [], {}
    for (co, k) in sorted(cells):
        cum[co] = cum.get(co, 0) + cells[(co, k)]
        exp.append((co // 12, co % 12 + 1, k, ncust[co],
                    cells[(co, k)], cum[co]))
    assert len(got) == len(exp)
    for (_, row), e in zip(got.iterrows(), exp):
        assert (row["cohort_year"], row["cohort_month"],
                row["months_since"], row["n_custs"],
                row["rev_cents"], row["cum_cents"]) == e
    # cumulative is monotone within every cohort
    for _, grp in got.groupby(["cohort_year", "cohort_month"]):
        assert grp["cum_cents"].is_monotonic_increasing


def test_filter_funnel_matches_bruteforce(ray_session, tmp_path):
    import re
    from kgforge.pipelines.driver_queries import q_filter_funnel

    rng = np.random.RandomState(4)
    vocab = ["the", "a", "of", "to", "and", "in", "is", "fox",
             "dog", "run", "walk", "tree", "house", "sky", "word"]
    texts, langs = [], []
    for i in range(150):
        n_w = int(rng.randint(5, 60))     # some fail the 20-word gate
        texts.append(" ".join(rng.choice(vocab, n_w)))
        langs.append("en" if rng.rand() < 0.7 else "fr")
    # planted duplicate pair engineered to pass every quality gate:
    # 24 words, mean word length 94/24 ≈ 3.9, 2 stopwords, all unique
    long_ok = " ".join(["the", "and"]
                       + [f"wd{i:02d}" for i in range(22)])
    texts += [long_ok, long_ok + "!!"]
    langs += ["en", "en"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts), "lang": pa.array(langs)}),
        str(tmp_path / "documents.parquet"))

    got = q_filter_funnel(str(tmp_path)).to_pandas()

    def norm(t):
        return re.sub(r" +", " ",
                      re.sub(r"[^a-z0-9 ]+", "", t.lower())).strip()

    stop = {"the", "a", "of", "to", "and", "in", "is"}
    n = len(texts)
    q_flags = []
    for t in texts:
        ws = t.split(" ")
        nw, swl = len(ws), sum(len(w) for w in ws)
        nstop = sum(w in stop for w in ws)
        nuniq = len(set(ws))
        q_flags.append(20 <= nw <= 1000 and 3 * nw <= swl <= 5 * nw
                       and nstop * 100 >= 2 * nw
                       and nuniq * 100 >= 35 * nw)
    q = sum(q_flags)
    ql_flags = [f and la == "en" for f, la in zip(q_flags, langs)]
    ql = sum(ql_flags)
    u = len({hashlib.md5(norm(t).encode()).hexdigest()
             for t, f in zip(texts, ql_flags) if f})
    assert list(got["n_docs"]) == [n, q, ql, u]
    assert list(got["n_dropped"]) == [0, n - q, q - ql, ql - u]
    assert u < ql            # the planted dup pair collapses
    assert list(got["gate"]) == ["all", "quality", "quality+lang",
                                 "unique"]


def test_token_burstiness_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_token_burstiness

    rng = np.random.RandomState(12)
    texts = []
    for i in range(80):
        words = list(rng.choice(["alpha", "beta", "gamma", "delta"],
                                rng.randint(3, 10)))
        if i % 8 == 0:          # planted bursty token: clumps hard
            words += ["burst"] * int(rng.randint(5, 15))
        texts.append(" ".join(words))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"))

    got = q_token_burstiness(str(tmp_path)).to_pandas()

    from collections import Counter
    n = len(texts)
    per_doc = [Counter(t.split()) for t in texts]
    stats = {}
    for cnt in per_doc:
        for w, c in cnt.items():
            df, tot, sq = stats.get(w, (0, 0, 0))
            stats[w] = (df + 1, tot + c, sq + c * c)
    top = sorted(stats.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    assert len(got) == len(top)
    for (_, row), (w, (df, tot, sq)) in zip(got.iterrows(), top):
        vmr = (n * sq - tot * tot) * 1_000_000 // (n * tot)
        assert (row["token"], row["n_docs"], row["n_occurrences"],
                row["sum_sq"], row["vmr_micro"]) == (w, df, tot, sq,
                                                     vmr)
    by_tok = dict(zip(got["token"], got["vmr_micro"]))
    # the planted clumping token is far burstier than the background
    assert by_tok["burst"] > 3 * max(
        v for t, v in by_tok.items() if t != "burst")


def test_type_dow_mi_matches_bruteforce(ray_session, tmp_path):
    import math
    from kgforge.pipelines.driver_queries import q_type_dow_mi

    rng = np.random.RandomState(13)
    n = 600
    day_us = 86_400_000_000
    # planted dependence: type 'wk' only on two weekdays
    types, days = [], []
    for _ in range(n):
        if rng.rand() < 0.4:
            types.append("wk")
            days.append(int(rng.choice([2, 3])))
        else:
            types.append(str(rng.choice(["a", "b"])))
            days.append(int(rng.randint(0, 7)))
    ts = [(d + 7 * int(rng.randint(0, 50))) * day_us
          + int(rng.randint(0, day_us)) for d in days]
    pq.write_table(pa.table({
        "event_type": pa.array(types),
        "ts": pa.array(np.array(ts, np.int64)).cast(
            pa.timestamp("us"))}),
        str(tmp_path / "events.parquet"))

    got = q_type_dow_mi(str(tmp_path)).to_pandas().iloc[0]

    from collections import Counter
    dows = [(t // day_us + 4) % 7 for t in ts]
    cells = Counter(zip(types, dows))
    row = Counter(types)
    col = Counter(dows)

    def L(v):
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    s = sum(c * (L(c) + L(n) - L(row[t]) - L(col[d]))
            for (t, d), c in cells.items())
    mi = abs(s) // n
    if s < 0:
        mi = -mi
    assert (got["n_events"], got["n_types"], got["n_dows"],
            got["mi_micro"]) == (n, len(row), len(col), mi)
    assert got["mi_micro"] > 100_000   # planted dependence visible


def test_fd_audit_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_fd_audit

    rng = np.random.RandomState(14)
    # part: plant a TRUE FD p_brand -> p_type and a violated one
    brands = [f"B{i}" for i in rng.randint(0, 5, 120)]
    types = [f"T{b[1:]}" for b in brands]          # brand determines
    names = [f"N{i}" for i in rng.randint(0, 10, 120)]
    sizes = rng.randint(1, 6, 120).astype(np.int32)
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(120, dtype=np.int64)),
        "p_name": pa.array(names), "p_brand": pa.array(brands),
        "p_type": pa.array(types), "p_size": pa.array(sizes)}),
        str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array(rng.randint(0, 20, 200)
                              .astype(np.int64)),
        "o_orderpriority": pa.array(
            [f"P{i}" for i in rng.randint(0, 3, 200)])}),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "user_id": pa.array(rng.randint(0, 8, 150).astype(np.int64)),
        "event_type": pa.array(
            [f"e{i}" for i in rng.randint(0, 4, 150)])}),
        str(tmp_path / "events.parquet"))

    got = q_fd_audit(str(tmp_path)).to_pandas()

    def stats(pairs):
        from collections import defaultdict
        m = defaultdict(set)
        for a, b in pairs:
            m[str(a)].add(str(b))
        n_lhs = len(m)
        n_pairs = sum(len(v) for v in m.values())
        viol = sum(1 for v in m.values() if len(v) > 1)
        mx = max(len(v) for v in m.values())
        return (n_lhs, n_pairs, viol, mx,
                (n_lhs - viol) * 1_000_000 // n_lhs)

    exp = {
        "part.p_brand->p_type": stats(zip(brands, types)),
        "part.p_name->p_brand": stats(zip(names, brands)),
        "part.p_type->p_size": stats(zip(types, sizes)),
    }
    by_fd = {r["fd"]: r for _, r in got.iterrows()}
    # exact checks for the three planted part candidates
    for fd in ("part.p_brand->p_type", "part.p_name->p_brand",
               "part.p_type->p_size"):
        r = by_fd[fd]
        assert (r["n_lhs"], r["n_pairs"], r["n_violating_lhs"],
                r["max_rhs_per_lhs"], r["fd_ppm"]) == exp[fd]
    # the planted TRUE FD holds exactly
    assert by_fd["part.p_brand->p_type"]["fd_ppm"] == 1_000_000
    assert by_fd["part.p_brand->p_type"]["n_violating_lhs"] == 0
    # the random candidates are (overwhelmingly) violated
    assert by_fd["part.p_name->p_brand"]["fd_ppm"] < 1_000_000
    assert len(got) == 5 and list(got["fd"]) == sorted(got["fd"])


def test_markov_order2_gain_matches_bruteforce(ray_session,
                                               tmp_path):
    import math
    from kgforge.pipelines.driver_queries import q_markov_order2_gain

    rng = np.random.RandomState(15)
    # planted order-2 process: next = 'z' iff prev2 == prev1
    rows = []
    eid = 0
    for u in range(10):
        seq = [str(rng.choice(["a", "b"]))]
        for _ in range(40):
            if len(seq) >= 2 and seq[-1] == seq[-2]:
                seq.append("z")
            else:
                seq.append(str(rng.choice(["a", "b"])))
        for i, et in enumerate(seq):
            rows.append((u, i * 1_000_000, eid, et))
            eid += 1
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows])}),
        str(tmp_path / "events.parquet"))

    got = q_markov_order2_gain(str(tmp_path)).to_pandas().iloc[0]

    from collections import Counter
    triples = Counter()
    by_u = {}
    for u, ts, _, et in rows:
        by_u.setdefault(u, []).append(et)
    for seq in by_u.values():
        for i in range(2, len(seq)):
            triples[(seq[i - 2], seq[i - 1], seq[i])] += 1

    def L(v):
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    def cond_h(key):
        ctx, out = Counter(), Counter()
        for (p2, p1, nx), c in triples.items():
            k = key(p2, p1)
            ctx[k] += c
            out[(k, nx)] += c
        return (sum(t * L(t) for t in ctx.values())
                - sum(c * L(c) for c in out.values()))

    n = sum(triples.values())

    def div(s):
        q = abs(s) // n
        return q if s >= 0 else -q

    h1 = div(cond_h(lambda p2, p1: p1))
    h2 = div(cond_h(lambda p2, p1: (p2, p1)))
    assert (got["n_triples"], got["h1_micro"], got["h2_micro"],
            got["gain_micro"]) == (n, h1, h2, h1 - h2)
    # order-2 memory is planted: knowing prev2 kills most entropy
    assert got["gain_micro"] > 100_000


def test_label_centroid_dist_matches_bruteforce(ray_session,
                                                tmp_path):
    from kgforge.pipelines.driver_queries import q_label_centroid_dist

    rng = np.random.RandomState(16)
    d, per = 64, 40
    # planted geometry: label 2 sits far from labels 0 and 1
    centers = {0: np.zeros(d), 1: np.zeros(d) + 0.05,
               2: np.zeros(d) + 2.0}
    vecs, labels = [], []
    for lab, c in centers.items():
        for _ in range(per):
            vecs.append((c + rng.normal(0, 0.01, d))
                        .astype(np.float32))
            labels.append(lab)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(np.array(labels, np.int32))}),
        str(tmp_path / "embeddings.parquet"))

    got = q_label_centroid_dist(str(tmp_path)).to_pandas()

    def rnd(x):
        return int(np.floor(x + 0.5)) if x >= 0 else int(
            np.ceil(x - 0.5))

    sums = {lab: np.zeros(d, dtype=object) for lab in centers}
    ns = {lab: 0 for lab in centers}
    for v, lab in zip(vecs, labels):
        qv = np.array([rnd(float(x) * 1_000_000) for x in v],
                      dtype=object)
        sums[lab] = sums[lab] + qv
        ns[lab] += 1
    exp = []
    labs = sorted(centers)
    for i, a in enumerate(labs):
        for b in labs[i + 1:]:
            na, nb = ns[a], ns[b]
            d2 = int(sum((int(sa) * nb - int(sb) * na) ** 2
                         for sa, sb in zip(sums[a], sums[b])))
            exp.append((a, b, na, nb, d2 // (na * na * nb * nb)))
    assert len(got) == 3
    for (_, row), e in zip(got.iterrows(), exp):
        assert (row["label_a"], row["label_b"], row["n_a"],
                row["n_b"], row["dist2_micro2"]) == e
    by = {(r["label_a"], r["label_b"]): r["dist2_micro2"]
          for _, r in got.iterrows()}
    assert by[(0, 2)] > 100 * by[(0, 1)]   # planted geometry


def test_hapax_share_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_hapax_share

    rng = np.random.RandomState(17)
    texts, srcs = [], []
    for i in range(100):
        src = f"s{i % 3}"
        words = list(rng.choice(["aa", "bb", "cc", "dd"],
                                rng.randint(3, 8)))
        if src == "s2":           # planted hapax-heavy source
            words.append(f"rare{i}")
        texts.append(" ".join(words))
        srcs.append(src)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(100, dtype=np.int64)),
        "text": pa.array(texts), "source": pa.array(srcs)}),
        str(tmp_path / "documents.parquet"))

    got = q_hapax_share(str(tmp_path)).to_pandas()

    from collections import Counter
    per_src = {}
    for t, s in zip(texts, srcs):
        per_src.setdefault(s, Counter()).update(t.split())
    assert list(got["source"]) == sorted(per_src)
    for _, row in got.iterrows():
        cnt = per_src[row["source"]]
        tok = sum(cnt.values())
        typ = len(cnt)
        hap = sum(1 for c in cnt.values() if c == 1)
        assert (row["n_tokens"], row["n_types"], row["n_hapax"],
                row["hapax_ppm"]) == (tok, typ, hap,
                                      hap * 1_000_000 // typ)
    by = dict(zip(got["source"], got["hapax_ppm"]))
    assert by["s2"] > by["s0"] and by["s2"] > by["s1"]


def test_price_index_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_price_index

    rng = np.random.RandomState(18)
    rows = []
    for _ in range(400):
        yr = int(rng.randint(1994, 1998))
        qty = float(rng.randint(1, 40))
        # planted inflation: unit price grows 10%/year
        unit = 100.0 * (1.1 ** (yr - 1994)) + rng.uniform(0, 5)
        rows.append((np.datetime64(f"{yr}-06-15", "us"),
                     round(unit * qty, 2), qty))
    pq.write_table(pa.table({
        "l_shipdate": pa.array([r[0] for r in rows],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([r[1] for r in rows],
                                    pa.float64()),
        "l_quantity": pa.array([r[2] for r in rows], pa.float64())}),
        str(tmp_path / "lineitem.parquet"))

    got = q_price_index(str(tmp_path)).to_pandas()

    by = {}
    for ts, price, qty in rows:
        yr = int(str(ts)[:4])
        c, q = by.get(yr, (0, 0))
        by[yr] = (c + int(np.floor(price * 100 + 0.5)),
                  q + int(round(qty)))
    exp = []
    for y in sorted(by):
        if y - 1 not in by:
            continue
        c, q = by[y]
        pc_, pq_ = by[y - 1]
        exp.append((y, c, q, pc_, pq_,
                    c * pq_ * 1_000_000 // (q * pc_)))
    assert len(got) == len(exp)
    for (_, row), e in zip(got.iterrows(), exp):
        assert (row["year"], row["rev_cents"], row["qty_units"],
                row["prev_rev_cents"], row["prev_qty_units"],
                row["uvi_ppm"]) == e
    # planted ~10% inflation shows in every YoY index
    assert (got["uvi_ppm"] > 1_040_000).all()


def test_text_entropy_rate_matches_bruteforce(ray_session,
                                              tmp_path):
    import math
    from kgforge.pipelines.driver_queries import q_text_entropy_rate

    rng = np.random.RandomState(19)
    texts, srcs = [], []
    for i in range(90):
        src = f"s{i % 2}"
        if src == "s0":        # deterministic cycle: fully redundant
            words = ["a", "b", "c"] * 6
        else:                  # iid tokens: near-zero redundancy
            words = list(rng.choice(["a", "b", "c", "d"], 18))
        texts.append(" ".join(words))
        srcs.append(src)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts), "source": pa.array(srcs)}),
        str(tmp_path / "documents.parquet"))

    got = q_text_entropy_rate(str(tmp_path)).to_pandas()

    from collections import Counter
    joint = {}
    for t, s in zip(texts, srcs):
        ws = t.split()
        joint.setdefault(s, Counter()).update(zip(ws[:-1], ws[1:]))

    def L(v):
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    def div(s, n):
        q = abs(s) // n
        return q if s >= 0 else -q

    assert list(got["source"]) == sorted(joint)
    for _, row in got.iterrows():
        cnt = joint[row["source"]]
        n = sum(cnt.values())
        ctx, marg = Counter(), Counter()
        for (w1, w2), c in cnt.items():
            ctx[w1] += c
            marg[w2] += c
        h1 = div(n * L(n) - sum(m * L(m) for m in marg.values()), n)
        h2 = div(sum(t * L(t) for t in ctx.values())
                 - sum(c * L(c) for c in cnt.values()),
                 n)
        assert (row["n_bigrams"], row["h1_micro"], row["h2_micro"],
                row["redundancy_micro"]) == (n, h1, h2, h1 - h2)
    by = {r["source"]: r for _, r in got.iterrows()}
    # the deterministic cycle is fully predictable given prev
    assert by["s0"]["h2_micro"] == 0
    assert by["s0"]["redundancy_micro"] > 1_000_000
    assert by["s1"]["redundancy_micro"] < 200_000


def test_eigencentrality_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import eigencentrality_ds

    rng = np.random.RandomState(21)
    edges = set()
    # planted hub: node h touches everything
    for i in range(14):
        edges.add(("hub", f"n{i}"))
    while len(edges) < 45:
        a, b = rng.randint(0, 14, 2)
        if a != b:
            edges.add((f"n{a}", f"n{b}"))
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    got = eigencentrality_ds(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas()

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    x = {n: 1_000_000 for n in adj}
    for _ in range(3):
        y = {v: sum(x[u] for u in nbrs) for v, nbrs in adj.items()}
        m = max(y.values())
        x = {v: r * 1_000_000 // m for v, r in y.items()}
    exp = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(got) == min(20, len(exp))
    for (_, row), (n, r) in zip(got.iterrows(), exp):
        assert (row["node"], row["score_micro"]) == (n, r)
    assert got.iloc[0]["node"] == "hub"
    assert got.iloc[0]["score_micro"] == 1_000_000


def test_local_bridges_matches_bruteforce(ray_session, tmp_path):
    import ray.data as rd

    from kgforge.functions.graph import edge_jaccard_ds

    # two triangles joined by one bridge edge: exactly 1 local bridge
    edges = [("a", "b"), ("b", "c"), ("c", "a"),
             ("x", "y"), ("y", "z"), ("z", "x"),
             ("a", "x")]
    tbl = pa.table({"subj": pa.array([e[0] for e in edges]),
                    "obj": pa.array([e[1] for e in edges])})
    ej = edge_jaccard_ds(rd.from_arrow(tbl)).to_pandas()
    n = len(ej)
    nb = int((ej["cn"] == 0).sum())
    assert n == 7 and nb == 1          # only a–x spans the parts
    bridge = ej[ej["cn"] == 0].iloc[0]
    assert {bridge["a"], bridge["b"]} == {"a", "x"}


def test_basket_triples_matches_bruteforce(ray_session, tmp_path):
    import itertools
    from kgforge.pipelines.driver_queries import q_basket_triples

    rng = np.random.RandomState(22)
    rows = []
    for ok in range(80):
        parts = rng.choice(30, rng.randint(2, 8), replace=False)
        for pk in parts:
            rows.append((ok, int(pk)))
        if ok % 4 == 0:           # planted frequent triple
            for pk in (101, 102, 103):
                rows.append((ok, pk))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64())}),
        str(tmp_path / "lineitem.parquet"))

    got = q_basket_triples(str(tmp_path)).to_pandas()

    from collections import Counter
    baskets = {}
    for ok, pk in rows:
        baskets.setdefault(ok, set()).add(pk)
    cnt = Counter()
    for parts in baskets.values():
        for tr in itertools.combinations(sorted(parts), 3):
            cnt[tr] += 1
    exp = sorted(cnt.items(),
                 key=lambda kv: (-kv[1],) + kv[0])[:20]
    assert len(got) == len(exp)
    for (_, row), ((a, b, c), n) in zip(got.iterrows(), exp):
        assert (row["a"], row["b"], row["c"],
                row["n_orders"]) == (a, b, c, n)
    assert (got.iloc[0]["a"], got.iloc[0]["b"],
            got.iloc[0]["c"]) == (101, 102, 103)


def test_dwell_time_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_dwell_time

    rng = np.random.RandomState(23)
    rows = []
    eid = 0
    for u in range(12):
        t = 0
        for _ in range(20):
            # mix of in-session gaps and session breaks
            t += int(rng.choice([5_000_000, 60_000_000,
                                 3_600_000_000]))
            rows.append((u, t, eid,
                         str(rng.choice(["view", "click", "buy"]))))
            eid += 1
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows])}),
        str(tmp_path / "events.parquet"))

    got = q_dwell_time(str(tmp_path)).to_pandas()

    agg = {}
    by_u = {}
    for u, t, e, et in rows:
        by_u.setdefault(u, []).append((t, e, et))
    for seq in by_u.values():
        seq.sort()
        for (t, _, et), (nt, _, _) in zip(seq[:-1], seq[1:]):
            if nt - t <= 1_800_000_000:
                n, s = agg.get(et, (0, 0))
                agg[et] = (n + 1, s + (nt - t))
    assert list(got["event_type"]) == sorted(agg)
    for _, row in got.iterrows():
        n, s = agg[row["event_type"]]
        assert (row["n_dwells"], row["sum_dwell_us"],
                row["mean_dwell_us"]) == (n, s, s // n)
