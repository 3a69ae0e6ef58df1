"""Round-5 session-E operators: Kaplan–Meier survival over keyed
gaps, pairwise Mann–Whitney rank tests, temperature-scaled mixture
weights, and seasonal-naive forecast backtests — each against an
independent brute-force oracle."""

import numpy as np
import pyarrow as pa


def _km_bruteforce(durs, events):
    """Reference product-limit fold: durs int array, events bool."""
    order = np.argsort(durs, kind="stable")
    durs, events = durs[order], events[order]
    out = []
    s = 1_000_000
    for t in np.unique(durs[events]):
        r = int((durs >= t).sum())
        d = int(((durs == t) & events).sum())
        s = s * (r - d) // r
        out.append((int(t), r, d, s))
    return out


def test_kaplan_meier_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.events import kaplan_meier_ds

    rng = np.random.RandomState(7)
    n_keys, rows = 40, 400
    keys = rng.randint(0, n_keys, rows).astype(np.int64)
    day_us = 86_400_000_000
    ts = (rng.randint(0, 900, rows).astype(np.int64) * day_us
          + rng.randint(0, day_us, rows).astype(np.int64))
    tie = np.arange(rows, dtype=np.int64)
    tbl = pa.table({
        "k": pa.array(keys),
        "t": pa.array(ts).cast(pa.timestamp("us")),
        "id": pa.array(tie)})
    got = kaplan_meier_ds(rd.from_arrow(tbl), by="k", on="t",
                          tie="id").to_pandas()

    # brute force: per-key sorted gaps (uncensored) + horizon tail
    day = ts // day_us
    hor = int(day.max())
    durs, ev = [], []
    for k in np.unique(keys):
        m = keys == k
        order = np.lexsort((tie[m], ts[m]))
        d = day[m][order]
        durs.extend((d[1:] - d[:-1]).tolist())
        ev.extend([True] * (len(d) - 1))
        durs.append(hor - int(d[-1]))
        ev.append(False)
    exp = _km_bruteforce(np.asarray(durs), np.asarray(ev))

    assert len(got) == len(exp) > 0
    for (t, r, d, s), (_, row) in zip(exp, got.iterrows()):
        assert (row["gap_days"], row["n_risk"],
                row["n_events"], row["survival_micro"]) == (t, r, d, s)
    # survival must be non-increasing and end strictly below start
    sm = got["survival_micro"].to_numpy()
    assert (np.diff(sm) <= 0).all() and sm[-1] < 1_000_000


def test_mannwhitney_u_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import mannwhitney_u_ds

    rng = np.random.RandomState(3)
    srcs = (["alpha"] * 50) + (["beta"] * 70) + (["gamma"] * 30)
    vals = np.concatenate([
        rng.randint(10, 40, 50),
        rng.randint(25, 60, 70),
        rng.randint(10, 60, 30)]).astype(np.int64)
    tbl = pa.table({"source": pa.array(srcs), "n_chars": pa.array(vals)})
    got = mannwhitney_u_ds(rd.from_arrow(tbl)).to_pandas() \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)

    names = ["alpha", "beta", "gamma"]
    samp = {g: vals[np.array(srcs) == g] for g in names}
    k = 0
    for i, ga in enumerate(names):
        for gb in names[i + 1:]:
            a, b = samp[ga], samp[gb]
            u2 = int(2 * (a[:, None] > b[None, :]).sum()
                     + (a[:, None] == b[None, :]).sum())
            row = got.iloc[k]
            assert (row["source_a"], row["source_b"]) == (ga, gb)
            assert row["n_a"] == len(a) and row["n_b"] == len(b)
            assert row["u2"] == u2
            assert row["cles_micro"] == u2 * 1_000_000 // (
                2 * len(a) * len(b))
            k += 1
    assert k == 3
    # beta stochastically dominates alpha in this fixture
    ab = got[(got.source_a == "alpha") & (got.source_b == "beta")]
    assert int(ab["cles_micro"].iloc[0]) < 500_000


def test_temperature_mix_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import temperature_mix_ds

    rng = np.random.RandomState(5)
    srcs = rng.choice(["w", "x", "y", "z"], 200)
    chars = rng.randint(50, 5000, 200).astype(np.int64)
    tbl = pa.table({"source": pa.array(srcs.tolist()),
                    "n_chars": pa.array(chars)})
    got = temperature_mix_ds(rd.from_arrow(tbl), tau=0.7).to_pandas()

    tot = {g: int(chars[srcs == g].sum()) for g in "wxyz"}
    import math
    w = {g: math.floor(abs(tot[g]) ** 0.7 + 0.5) for g in "wxyz"}
    s = sum(w.values())
    assert list(got["source"]) == list("wxyz")
    for _, row in got.iterrows():
        g = row["source"]
        assert row["chars"] == tot[g]
        assert row["w_pow"] == w[g]
        assert row["weight_micro"] == w[g] * 1_000_000 // s
    # tau < 1 upweights the smallest slice vs its raw share
    small = min(tot, key=tot.get)
    raw_micro = tot[small] * 1_000_000 // sum(tot.values())
    assert int(got[got.source == small]["weight_micro"].iloc[0]) \
        > raw_micro


def test_forecast_backtest_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_forecast_backtest

    rng = np.random.RandomState(9)
    n_orders, n_cust = 600, 30
    ck = rng.randint(1, n_cust + 1, n_orders).astype(np.int64)
    day_us = 86_400_000_000
    # ~3 years of dates starting 1995-01-01 (epoch day 9131)
    ts = ((9131 + rng.randint(0, 1095, n_orders).astype(np.int64))
          * day_us)
    price = np.round(rng.uniform(10, 9000, n_orders), 2)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
        "o_custkey": pa.array(ck),
        "o_orderdate": pa.array(ts).cast(pa.timestamp("us")),
        "o_totalprice": pa.array(price)}),
        str(tmp_path / "orders.parquet"))
    nk = (np.arange(1, n_cust + 1, dtype=np.int64) % 4).astype(np.int32)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, n_cust + 1,
                                        dtype=np.int64)),
        "c_nationkey": pa.array(nk)}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(4, dtype=np.int32)),
        "n_name": pa.array([f"N{i}" for i in range(4)])}),
        str(tmp_path / "nation.parquet"))

    got = q_forecast_backtest(str(tmp_path)).to_pandas()

    # brute force
    import collections
    rev = collections.defaultdict(lambda: collections.defaultdict(int))
    days = ts // day_us
    import datetime
    for i in range(n_orders):
        d = datetime.date(1970, 1, 1) + datetime.timedelta(
            days=int(days[i]))
        ym = d.year * 100 + d.month
        nat = int(nk[(ck[i] - 1)])
        rev[nat][ym] += int(np.floor(price[i] * 100 + 0.5))
    exp = {}
    for nat, m in rev.items():
        es = e1 = cnt = 0
        for ym, c in sorted(m.items()):
            prev = ym - 1 if ym % 100 != 1 else ym - 89
            if prev in m and (ym - 100) in m:
                cnt += 1
                es += abs(c - m[ym - 100])
                e1 += abs(c - m[prev])
        if cnt:
            exp[f"N{nat}"] = (cnt, es, e1,
                              es * 1_000_000 // e1 if e1 else 0)
    assert list(got["n_name"]) == sorted(exp)
    for _, row in got.iterrows():
        cnt, es, e1, mase = exp[row["n_name"]]
        assert (row["n_months"], row["sum_err_seasonal"],
                row["sum_err_naive"], row["mase_micro"]) \
            == (cnt, es, e1, mase)


def test_trigram_backoff_matches_bruteforce(ray_session):
    import math

    import ray.data as rd

    from kgforge.functions.textstats import trigram_backoff_ds

    rng = np.random.RandomState(13)
    alphabet = list("abcdef ")
    texts, langs = [], []
    for i in range(80):
        k = rng.randint(0, 30)
        texts.append("".join(rng.choice(alphabet, k)))
        langs.append("L%d" % (i % 2))
    ids = np.arange(80, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids),
                    "lang": pa.array(langs),
                    "text": pa.array(texts)})
    got = trigram_backoff_ds(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("lang").reset_index(drop=True)

    def L(x):
        return math.floor(abs(math.log(x) * 1e6) + 0.5) \
            * (1 if math.log(x) >= 0 else -1)

    def grams(t, n):
        return [t[i:i + n] for i in range(len(t) - n + 1)]

    import collections
    c1 = collections.Counter()
    c2 = collections.Counter()
    c3 = collections.Counter()
    for i in range(0, 80, 2):
        c1.update(grams(texts[i], 1))
        c2.update(grams(texts[i], 2))
        c3.update(grams(texts[i], 3))
    N = sum(c1.values())
    L4 = L(0.4)  # ln(0.4) < 0 -> round-away on the negative side
    assert L4 == -916291
    exp = {}
    for i in range(1, 80, 2):
        lang = langs[i]
        st = exp.setdefault(lang, [0, 0, 0, [0, 0, 0, 0]])
        gs = grams(texts[i], 3)
        if not gs:
            continue
        st[0] += 1
        st[1] += len(gs)
        for g in gs:
            if g in c3:
                st[2] += L(c3[g]) - L(c2[g[:2]])
                st[3][0] += 1
            elif g[1:] in c2:
                st[2] += L4 + L(c2[g[1:]]) - L(c1[g[1]])
                st[3][1] += 1
            elif g[2] in c1:
                st[2] += 2 * L4 + L(c1[g[2]]) - L(N)
                st[3][2] += 1
            else:
                st[2] += 2 * L4 - L(N)
                st[3][3] += 1
    exp = {k: v for k, v in exp.items() if v[1] > 0}
    assert list(got["lang"]) == sorted(exp)
    for _, row in got.iterrows():
        nd, nt, sm, lv = exp[row["lang"]]
        assert (row["n_docs"], row["n_trigrams"],
                row["score_micro"]) == (nd, nt, sm)
        assert [row["n_tri"], row["n_bi"], row["n_uni"],
                row["n_oov"]] == lv
    # the fixture must actually exercise at least one backoff level
    assert int(got["n_bi"].sum() + got["n_uni"].sum()
               + got["n_oov"].sum()) > 0


def test_linkpred_auc_matches_bruteforce(ray_session):
    import hashlib

    import ray.data as rd

    from kgforge.functions.graph import linkpred_auc_ds

    rng = np.random.RandomState(17)
    nodes = ["n%02d" % i for i in range(30)]
    edges = set()
    while len(edges) < 120:
        a, b = rng.choice(30, 2, replace=False)
        edges.add((nodes[min(a, b)], nodes[max(a, b)]))
    el = sorted(edges)
    tbl = pa.table({"subj": pa.array([a for a, _ in el]),
                    "obj": pa.array([b for _, b in el])})
    got = linkpred_auc_ds(rd.from_arrow(tbl)).to_pandas().iloc[0]

    def h(a, b):
        return int(hashlib.md5(
            f"{a}\x1f{b}".encode()).hexdigest()[:8], 16)

    test = {e for e in edges if h(*e) % 5 == 0}
    train = edges - test
    adj = {}
    for a, b in train:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # candidates: non-adjacent (in train) pairs with >= 1 common nbr
    cand = {}
    ns = sorted(adj)
    for i, a in enumerate(ns):
        for b in ns[i + 1:]:
            if b in adj[a]:
                continue
            cn = len(adj[a] & adj[b])
            if cn:
                cand[(a, b)] = cn
    pos_scores = [cand.get(e, 0) for e in test]
    neg_scores = [v for k, v in cand.items() if k not in test]
    u2 = sum(2 * int(p > n) + int(p == n)
             for p in pos_scores for n in neg_scores)
    assert got["n_pos"] == len(pos_scores)
    assert got["n_neg"] == len(neg_scores)
    assert got["n_pos_zero"] == sum(1 for p in pos_scores if p == 0)
    assert got["u2"] == u2
    assert got["auc_micro"] == u2 * 1_000_000 // (
        2 * len(pos_scores) * len(neg_scores))
    # fixture sanity: split non-trivial, AUC informative
    assert len(test) > 2 and len(neg_scores) > 10


def test_ks_test_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import ks_test_ds

    rng = np.random.RandomState(21)
    srcs = (["p"] * 60) + (["q"] * 40)
    vals = np.concatenate([rng.randint(0, 50, 60),
                           rng.randint(20, 70, 40)]).astype(np.int64)
    tbl = pa.table({"source": pa.array(srcs), "n_chars": pa.array(vals)})
    got = ks_test_ds(rd.from_arrow(tbl)).to_pandas().iloc[0]

    a = np.sort(vals[:60])
    b = np.sort(vals[60:])
    dom = np.unique(vals)
    fa = np.searchsorted(a, dom, side="right")
    fb = np.searchsorted(b, dom, side="right")
    ks = int(np.abs(fa * 40 - fb * 60).max())
    assert (got["source_a"], got["source_b"]) == ("p", "q")
    assert (got["n_a"], got["n_b"]) == (60, 40)
    assert got["ks_scaled"] == ks
    assert got["ks_micro"] == ks * 1_000_000 // (60 * 40)
    # shifted fixture must register a real gap
    assert got["ks_micro"] > 100_000


def _bpe_reference(word_counts, n_merges):
    """Pure-Python Sennrich BPE on a word-frequency dict."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = \
                    pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((step, l, r, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_merges_matches_reference(ray_session):
    import collections

    import ray.data as rd

    from kgforge.functions.indexing import bpe_merges_ds

    rng = np.random.RandomState(23)
    base_words = ["lower", "lowest", "newer", "newest", "wider",
                  "low", "new", "aaaa", "aaab", "banana"]
    texts = []
    for _ in range(50):
        k = rng.randint(2, 12)
        texts.append(" ".join(rng.choice(base_words, k)))
    tbl = pa.table({"text": pa.array(texts)})
    got = bpe_merges_ds(rd.from_arrow(tbl), n_merges=6).to_pandas()

    wc = collections.Counter(
        w for t in texts for w in t.split())
    exp = _bpe_reference(wc, 6)
    assert len(got) == len(exp) == 6
    for (st, l, r, c), (_, row) in zip(exp, got.iterrows()):
        assert (row["step"], row["left"], row["right"],
                row["pair_count"]) == (st, l, r, c)
    # the 'aaaa'/'aaab' runs force the overlapping-match greedy rule:
    # the (a, a) merge must be learned, and applying it to 'aaaa'
    # keeps every other match -> ('aa','aa'), never ('aa','a','a')
    assert ("a", "a") in {(l, r) for _, l, r, _ in exp}


def test_poisson_bootstrap_matches_bruteforce(ray_session):
    import hashlib

    import ray.data as rd

    from kgforge.functions.sampling import (POISSON1_U64_THRESHOLDS,
                                            poisson_bootstrap_ds)

    rng = np.random.RandomState(29)
    n = 300
    keys = np.arange(1000, 1000 + n, dtype=np.int64)
    vals = np.round(rng.uniform(5, 500, n), 2)
    tbl = pa.table({"o_orderkey": pa.array(keys),
                    "o_totalprice": pa.array(vals)})
    got = poisson_bootstrap_ds(
        rd.from_arrow(tbl), b_reps=16).to_pandas().iloc[0]

    cents = np.floor(vals * 100 + 0.5).astype(np.int64)
    means = []
    for rep in range(16):
        swc = sw = 0
        for k, c in zip(keys, cents):
            u = int(hashlib.md5(
                f"{k}\x1f{rep}".encode()).hexdigest()[:16], 16)
            w = sum(1 for t in POISSON1_U64_THRESHOLDS if u >= t)
            swc += w * int(c)
            sw += w
        if sw:
            means.append(swc * 1_000_000 // sw)
    means.sort()
    full = int(cents.sum()) * 1_000_000 // n
    assert got["b_reps"] == len(means)
    assert got["mean_micro"] == full
    assert got["boot_lo_micro"] == means[0]
    assert got["boot_hi_micro"] == means[-1]
    # CI must bracket the full mean and be non-degenerate
    assert means[0] < full < means[-1]


def test_embedding_cov_matches_bruteforce(ray_session):
    import math

    import ray.data as rd

    from kgforge.functions.clustering import embedding_cov_ds

    rng = np.random.RandomState(31)
    n, d = 150, 6
    base = rng.uniform(-1, 1, (n, d)).astype(np.float32)
    base[:, 3] = base[:, 1] * 0.9 + 0.05 * base[:, 3]  # planted corr
    tbl = pa.table({"embedding": pa.array(
        [row.tolist() for row in base],
        pa.list_(pa.float32()))})
    got = embedding_cov_ds(rd.from_arrow(tbl), k=5).to_pandas()

    q = np.floor(np.abs(base.astype(np.float64) * 1e6) + 0.5) \
        .astype(np.int64) * np.sign(base).astype(np.int64)
    S = q.T.astype(object) @ q.astype(object)
    s = q.sum(axis=0).astype(object)
    rows = []
    for i in range(d):
        for j in range(i + 1, d):
            cv = int(n * S[i, j] - s[i] * s[j])
            rows.append((abs(cv), i, j, cv))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    var = {i: int(n * S[i, i] - s[i] ** 2) for i in range(d)}
    den = n * (n - 1)
    assert len(got) == 5
    for (a, i, j, cv), (_, row) in zip(rows[:5], got.iterrows()):
        assert (row["dim_i"], row["dim_j"]) == (i, j)
        assert row["cov_pico"] == (1 if cv >= 0 else -1) * (
            abs(cv) // den)
        c = cv / math.sqrt(float(var[i]) * float(var[j])) * 1e6
        exp_corr = int(math.floor(abs(c) + 0.5)) * (
            1 if c >= 0 else -1)
        assert row["corr_micro"] == exp_corr
    # the planted (1, 3) correlation must rank first
    assert (got.iloc[0]["dim_i"], got.iloc[0]["dim_j"]) == (1, 3)
    assert abs(got.iloc[0]["corr_micro"]) > 800_000


def test_anova_month_matches_bruteforce(ray_session, tmp_path):
    from fractions import Fraction

    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_anova_month

    rng = np.random.RandomState(37)
    n_orders, n_cust = 500, 20
    ck = rng.randint(1, n_cust + 1, n_orders).astype(np.int64)
    day_us = 86_400_000_000
    ts = ((8401 + rng.randint(0, 1000, n_orders).astype(np.int64))
          * day_us)
    price = np.round(rng.uniform(10, 2000, n_orders), 2)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
        "o_custkey": pa.array(ck),
        "o_orderdate": pa.array(ts).cast(pa.timestamp("us")),
        "o_totalprice": pa.array(price)}),
        str(tmp_path / "orders.parquet"))
    nk = (np.arange(1, n_cust + 1, dtype=np.int64) % 3).astype(np.int32)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, n_cust + 1,
                                        dtype=np.int64)),
        "c_nationkey": pa.array(nk)}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(3, dtype=np.int32)),
        "n_name": pa.array([f"N{i}" for i in range(3)])}),
        str(tmp_path / "nation.parquet"))

    got = q_anova_month(str(tmp_path)).to_pandas()

    import collections
    import datetime
    rev = collections.defaultdict(lambda: collections.defaultdict(int))
    days = ts // day_us
    for i in range(n_orders):
        d = datetime.date(1970, 1, 1) + datetime.timedelta(
            days=int(days[i]))
        rev[int(nk[ck[i] - 1])][d.year * 100 + d.month] += \
            int(np.floor(price[i] * 100 + 0.5))
    exp = {}
    for nat, m in rev.items():
        xs = list(m.items())
        n = len(xs)
        mu = Fraction(sum(c for _, c in xs), n)
        sst = sum((Fraction(c) - mu) ** 2 for _, c in xs)
        gs = collections.defaultdict(list)
        for ym, c in xs:
            gs[ym % 100].append(c)
        ssb = sum(len(v) * (Fraction(sum(v), len(v)) - mu) ** 2
                  for v in gs.values())
        if n >= 2 and sst:
            exp[f"N{nat}"] = (n, int(1_000_000 * ssb / sst))
    assert list(got["n_name"]) == sorted(exp)
    for _, row in got.iterrows():
        n, eta = exp[row["n_name"]]
        assert (row["n_months"], row["eta2_micro"]) == (n, eta)
    # eta2 is a proportion of variance
    assert ((got["eta2_micro"] >= 0)
            & (got["eta2_micro"] <= 1_000_000)).all()


def test_kg_degree_zipf_matches_numpy_ols(ray_session):
    from kgforge.pipelines.driver_queries import (q_kg_degree_dist,
                                                  q_kg_degree_zipf)

    sf = "/root/testdata/sf0.001"
    got = q_kg_degree_zipf(sf).to_pandas().iloc[0]
    dist = q_kg_degree_dist(sf).to_pandas()
    dist = dist[dist["degree"] > 0]
    x = np.log(dist["degree"].to_numpy(float))
    y = np.log(dist["n_nodes"].to_numpy(float))
    slope = np.polyfit(x, y, 1)[0]
    assert got["n_degrees"] == len(dist)
    # integer-grid OLS vs float OLS agree to ~1e-3 (grid quantization)
    assert abs(got["slope_micro"] / 1e6 - slope) < 2e-3
    # entity graphs are heavy-tailed: slope decisively negative
    assert got["slope_micro"] < -300_000


def test_token_shift_matches_bruteforce(ray_session, tmp_path):
    import collections

    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_token_shift

    rng = np.random.RandomState(41)
    words = ["apple", "pear", "plum", "kiwi", "fig"]
    texts, ids = [], []
    for i in range(120):
        # plant drift: 'apple' dominates even docs, 'fig' odd ones
        bias = ["apple"] * 3 if i % 2 == 0 else ["fig"] * 3
        k = rng.randint(3, 10)
        texts.append(" ".join(list(rng.choice(words, k)) + bias))
        ids.append(i)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.array(ids, np.int64)),
        "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"))

    got = q_token_shift(str(tmp_path)).to_pandas()

    ce, co = collections.Counter(), collections.Counter()
    for i, t in zip(ids, texts):
        (ce if i % 2 == 0 else co).update(t.split())
    ne, no = sum(ce.values()), sum(co.values())
    rows = sorted(
        ((abs(ce[t] * no - co[t] * ne), t, ce[t], co[t])
         for t in set(ce) | set(co)),
        key=lambda r: (-r[0], r[1]))[:20]
    assert len(got) == min(20, len(rows))
    for (sh, tok, e, o), (_, row) in zip(rows, got.iterrows()):
        assert (row["token"], row["n_even"], row["n_odd"],
                row["shift_scaled"]) == (tok, e, o, sh)
    # the planted movers rank first and second
    assert set(got["token"].head(2)) == {"apple", "fig"}


def test_partition_skew_matches_bruteforce(ray_session, tmp_path):
    import hashlib

    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_partition_skew

    rng = np.random.RandomState(43)
    # hot-key fixture: user 7 owns a third of the stream
    users = np.concatenate([
        rng.randint(0, 200, 400), np.full(200, 7)]).astype(np.int64)
    pq.write_table(pa.table({"user_id": pa.array(users)}),
                   str(tmp_path / "events.parquet"))
    got = q_partition_skew(str(tmp_path)).to_pandas().iloc[0]

    import collections
    cnt = collections.Counter(
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 64
        for u in users)
    ns = sorted(cnt.values())
    k = len(ns)
    med2 = ns[(k + 1) // 2 - 1] + ns[k // 2]
    assert got["n_partitions"] == k
    assert got["min_rows"] == ns[0]
    assert got["med2_rows"] == med2
    assert got["max_rows"] == ns[-1]
    assert got["skew_micro"] == 2 * ns[-1] * 1_000_000 // med2
    # the planted hot key must register as real skew
    assert got["skew_micro"] > 2_000_000


def test_seasonal_anomaly_finds_planted_spike(ray_session, tmp_path):
    import collections

    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_seasonal_anomaly

    rng = np.random.RandomState(47)
    hr_us = 3_600_000_000
    ts = []
    # steady diurnal load over 21 days + one planted spike hour
    for day in range(21):
        for hod in range(24):
            base = 5 + (3 if 8 <= hod <= 18 else 0)
            eh = day * 24 + hod
            n = base + int(rng.randint(0, 2))
            if day == 10 and hod == 3:
                n += 200  # the anomaly
            ts.extend([eh * hr_us + int(o) for o in
                       rng.randint(0, hr_us, n)])
    pq.write_table(pa.table({
        "ts": pa.array(np.array(ts, np.int64)).cast(
            pa.timestamp("us"))}),
        str(tmp_path / "events.parquet"))
    got = q_seasonal_anomaly(str(tmp_path)).to_pandas()

    cnt = collections.Counter(t // hr_us for t in ts)
    ng = collections.Counter()
    sg = collections.Counter()
    for eh, c in cnt.items():
        k = ((eh // 24) + 4) % 7 * 24 + eh % 24
        ng[k] += 1
        sg[k] += c
    rows = sorted(
        ((abs(c * ng[((eh // 24) + 4) % 7 * 24 + eh % 24]
              - sg[((eh // 24) + 4) % 7 * 24 + eh % 24]) * 1_000_000
          // ng[((eh // 24) + 4) % 7 * 24 + eh % 24], eh, c)
         for eh, c in cnt.items()),
        key=lambda r: (-r[0], r[1]))[:20]
    assert len(got) == 20
    for (r, eh, c), (_, row) in zip(rows, got.iterrows()):
        assert (row["eh"], row["n_events"],
                row["resid_micro"]) == (eh, c, r)
    # the planted spike hour ranks first
    assert got.iloc[0]["eh"] == 10 * 24 + 3


def test_rrf_fusion_matches_bruteforce(ray_session, tmp_path):
    import collections

    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import (SEARCH_TERMS,
                                                  q_bm25_topk,
                                                  q_rrf_fusion,
                                                  q_term_search)
    import pandas as pd

    rng = np.random.RandomState(53)
    fill = ["alpha", "beta", "gamma", "delta"]
    texts, ids = [], []
    for i in range(60):
        k = rng.randint(5, 25)
        toks = list(rng.choice(fill, k))
        # seed varying mixes of the query terms
        for t in SEARCH_TERMS:
            toks += [t] * int(rng.randint(0, 4))
        rng.shuffle(toks)
        texts.append(" ".join(toks))
        ids.append(i)
    tbl = pa.table({
        "doc_id": pa.array(np.array(ids, np.int64)),
        "text": pa.array(texts),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     np.int64))})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = q_rrf_fusion(str(tmp_path)).to_pandas()

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    bm = _pd(q_bm25_topk(str(tmp_path))).sort_values(
        ["score", "doc_id"], ascending=[False, True])
    ts = _pd(q_term_search(str(tmp_path))).sort_values(
        ["score", "doc_id"], ascending=[False, True])
    rb = {int(d): i + 1 for i, d in enumerate(bm["doc_id"])}
    rt = {int(d): i + 1 for i, d in enumerate(ts["doc_id"])}
    exp = sorted(
        ((-((1_000_000 // (60 + rb[d]) if d in rb else 0)
            + (1_000_000 // (60 + rt[d]) if d in rt else 0)), d)
         for d in set(rb) | set(rt)))[:10]
    assert len(got) == len(exp)
    for (neg_s, d), (_, row) in zip(exp, got.iterrows()):
        assert (row["doc_id"], row["rrf_scaled"]) == (d, -neg_s)
        assert row["rank_bm25"] == rb.get(d, 0)
        assert row["rank_ts"] == rt.get(d, 0)
    # fusion must honor both rankers: a doc in only one list cannot
    # outrank one near the top of both
    both = got[(got.rank_bm25 > 0) & (got.rank_ts > 0)]
    assert len(both) > 0


def test_source_scorecard_matches_bruteforce(ray_session, tmp_path):
    import collections
    import re

    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_source_scorecard

    texts = [
        ("web", "the cat sat of the mat and data"),
        ("web", "duplicate body here"),
        ("wiki", "duplicate body here"),          # cross-source dup
        ("wiki", "der hund und die katze und der ball"),
        ("web", "el gato y la casa los dias"),
        ("wiki", "unique text with no stopwords whatsoever"),
        ("web", "duplicate body here"),           # triple
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "source": pa.array([s for s, _ in texts]),
        "text": pa.array([t for _, t in texts])}),
        str(tmp_path / "documents.parquet"))
    got = q_source_scorecard(str(tmp_path)).to_pandas() \
        .set_index("source")

    exp = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    body_count = collections.Counter(t for _, t in texts)
    for s, t in texts:
        e = exp[s]
        e[0] += 1
        e[1] += len(t)
        e[2] += len(re.findall(r"\S+", t))
        e[3] += len(re.findall(r"\b(?:the|a|of|and|data)\b", t))
        n_en = len(re.findall(r"\b(?:the|of|and)\b", t))
        n_de = len(re.findall(r"\b(?:der|die|und)\b", t))
        n_es = len(re.findall(r"\b(?:el|la|los)\b", t))
        e[4] += int(n_en >= n_de and n_en >= n_es and n_en > 0)
        e[5] += int(body_count[t] >= 2)
    assert sorted(got.index) == sorted(exp)
    for s, e in exp.items():
        row = got.loc[s]
        assert [row["n_docs"], row["n_chars"], row["n_tokens"],
                row["n_stopwords"], row["n_en_docs"],
                row["dup_docs"]] == e
    # the cross-source duplicate must be visible on BOTH sides
    assert got.loc["web"]["dup_docs"] == 2
    assert got.loc["wiki"]["dup_docs"] == 1


def test_transition_entropy_matches_bruteforce(ray_session, tmp_path):
    import collections
    import math

    import pyarrow.parquet as pq

    from kgforge.pipelines.driver_queries import q_transition_entropy

    rng = np.random.RandomState(59)
    n = 500
    users = rng.randint(0, 40, n).astype(np.int64)
    # 'click' is near-deterministic (-> view), 'buy' is high-entropy
    types = rng.choice(["click", "view", "buy"], n,
                       p=[0.5, 0.3, 0.2]).tolist()
    ts = np.sort(rng.randint(0, 10**12, n).astype(np.int64))
    eid = np.arange(n, dtype=np.int64)
    pq.write_table(pa.table({
        "user_id": pa.array(users), "event_id": pa.array(eid),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(types)}),
        str(tmp_path / "events.parquet"))
    got = q_transition_entropy(str(tmp_path)).to_pandas() \
        .set_index("prev_type")

    seq = collections.defaultdict(list)
    order = np.lexsort((eid, ts))
    for i in order:
        seq[int(users[i])].append(types[i])
    cnt = collections.defaultdict(collections.Counter)
    for evs in seq.values():
        for a, b in zip(evs, evs[1:]):
            cnt[a][b] += 1

    def L(v):
        return int(math.floor(math.log(v) * 1e6 + 0.5))

    assert sorted(got.index) == sorted(cnt)
    for prev, c in cnt.items():
        t = sum(c.values())
        h = (t * L(t) - sum(v * L(v) for v in c.values())) // t
        row = got.loc[prev]
        assert (row["n_transitions"], row["n_successors"],
                row["entropy_micro"]) == (t, len(c), h)
    # entropy bounded by ln(k)
    for prev, c in cnt.items():
        assert got.loc[prev]["entropy_micro"] <= L(len(c)) + 1


def test_session_entry_exit_matches_bruteforce(ray_session):
    import collections

    import ray.data as rd

    from kgforge.functions.events import session_entry_exit_ds

    rng = np.random.RandomState(61)
    n = 400
    users = rng.randint(0, 30, n).astype(np.int64)
    # cluster times so real multi-event sessions AND bounces form
    ts = np.sort(rng.choice(
        np.arange(0, 3 * 10**12, 10**9), n).astype(np.int64))
    types = rng.choice(["home", "search", "cart"], n).tolist()
    eid = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "user_id": pa.array(users), "event_id": pa.array(eid),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(types)})
    got = session_entry_exit_ds(rd.from_arrow(tbl)).to_pandas() \
        .sort_values(["entry_type", "exit_type"]) \
        .reset_index(drop=True)

    gap = 1_800_000_000
    per_user = collections.defaultdict(list)
    order = np.lexsort((eid, ts, users))
    for i in order:
        per_user[int(users[i])].append((int(ts[i]), types[i]))
    cells = collections.Counter()
    bounce = collections.Counter()
    for evs in per_user.values():
        sess = [[evs[0]]]
        for prev, cur in zip(evs, evs[1:]):
            if cur[0] - prev[0] > gap:
                sess.append([])
            sess[-1].append(cur)
        for s in sess:
            key = (s[0][1], s[-1][1])
            cells[key] += 1
            if len(s) == 1:
                bounce[key] += 1
    assert len(got) == len(cells)
    for (en, ex), c in sorted(cells.items()):
        row = got[(got.entry_type == en) & (got.exit_type == ex)]
        assert int(row["n_sessions"].iloc[0]) == c
        assert int(row["n_bounce"].iloc[0]) == bounce[(en, ex)]
    # fixture must contain both bounces and multi-event sessions
    assert got["n_bounce"].sum() > 0
    assert (got["n_sessions"].sum() - got["n_bounce"].sum()) > 0
