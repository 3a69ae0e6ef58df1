"""Round-5 session-C operators: sorted-neighborhood dedup blocking,
per-source char-distribution KL, ordered first-touch conversion lag,
and hourly-traffic max drawdown — each against an independent
brute-force oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, users, types, ts_us):
    n = len(users)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.asarray(ts_us, dtype=np.int64),
                       pa.timestamp("us")),
        "user_id": pa.array(np.asarray(users, dtype=np.int64)),
        "event_type": pa.array(list(types)),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n)})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return tbl


def test_snm_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.dedup import snm_pairs_ds

    rng = np.random.RandomState(5)
    # texts engineered to exercise: shared prefixes (key ties), empty
    # strings, and multiple first-codepoint partitions
    stems = ["alpha doc about graphs", "alpha doc about graphs!",
             "beta record", "beta record", "zulu outlier", "",
             "gamma text body", "alpha doc ZZZ"]
    texts = [stems[rng.randint(len(stems))] + (" " * rng.randint(3))
             for _ in range(80)]
    ids = np.arange(80, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)})) \
        .repartition(7)
    w = 4
    got = snm_pairs_ds(ds, window=w).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    # brute force: python string sort IS codepoint order
    keys = [t[:24] for t in texts]
    order = sorted(range(80), key=lambda i: (keys[i], ids[i]))
    rn = {order[r]: r for r in range(80)}
    want = []
    for a in range(80):
        for b in range(80):
            d = rn[b] - rn[a]
            if 1 <= d <= w:
                want.append((ids[a], ids[b], d,
                             1 if keys[a] == keys[b] else 0))
    want.sort()
    got_rows = [(r.doc_a, r.doc_b, r.dist, r.key_match)
                for r in got.itertuples()]
    assert got_rows == want


def test_source_char_kl_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.common.hashing import round_away
    from kgforge.functions.textstats import source_char_kl_ds

    rng = np.random.RandomState(13)
    alphabets = {"s1": "abcde ", "s2": "abxyz ", "s3": "a"}
    srcs, texts = [], []
    for _ in range(120):
        s = ("s1", "s2", "s3")[rng.randint(3)]
        a = alphabets[s]
        texts.append("".join(a[rng.randint(len(a))]
                             for _ in range(rng.randint(1, 40))))
        srcs.append(s)
    ds = rd.from_arrow(pa.table({"source": pa.array(srcs),
                                 "text": pa.array(texts)})) \
        .repartition(6)
    got = source_char_kl_ds(ds).to_pandas() \
        .set_index("source").sort_index()

    def L(x):
        return int(round_away(np.log(x) * 1_000_000, 0))

    glob: dict = {}
    per: dict = {}
    for s, t in zip(srcs, texts):
        d = per.setdefault(s, {})
        for ch in t:
            glob[ch] = glob.get(ch, 0) + 1
            d[ch] = d.get(ch, 0) + 1
    big_n = sum(glob.values())
    for s, d in per.items():
        n = sum(d.values())
        x = sum(c * (L(glob[ch]) - L(c)) for ch, c in d.items())
        kl = L(big_n) - L(n) - x // n
        row = got.loc[s]
        assert row["n_chars"] == n
        assert row["distinct_chars"] == len(d)
        assert row["kl_micro"] == kl


def test_conversion_lag_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_conversion_lag

    rng = np.random.RandomState(21)
    n = 400
    users = rng.randint(0, 40, n)
    types = [("click", "view", "buy", "ship")[i] for i in
             rng.randint(0, 4, n)]
    base = 1_700_000_000_000_000
    ts = base + rng.randint(0, 10_000, n).astype(np.int64) * 1_000_000
    _write_events(tmp_path, users, types, ts)

    got = q_conversion_lag(str(tmp_path)).to_pandas() \
        .set_index(["type_a", "type_b"]).sort_index()

    first: dict = {}
    for u, t, s in zip(users, types, ts):
        k = (int(u), t)
        first[k] = min(first.get(k, s), int(s))
    agg: dict = {}
    for (u, ta), fa in first.items():
        for (u2, tb), fb in first.items():
            if u2 == u and fb > fa:
                lag = fb - fa
                c = agg.setdefault((ta, tb), [0, 0, 0])
                c[0] += 1
                c[1] += lag
                c[2] = max(c[2], lag)
    assert len(got) == len(agg)
    for (ta, tb), (cnt, tot, mx) in agg.items():
        row = got.loc[(ta, tb)]
        assert row["n_users"] == cnt
        assert row["total_lag_us"] == tot
        assert row["max_lag_us"] == mx


def test_max_drawdown_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_max_drawdown

    rng = np.random.RandomState(8)
    n = 600
    users = rng.randint(0, 10, n)
    types = [("click", "view")[i % 2] for i in range(n)]
    base_h = 490_000                    # hours since epoch
    # spiky series: peak then trough to force a non-zero drawdown
    hours = base_h + rng.randint(0, 48, n)
    ts = hours.astype(np.int64) * 3_600_000_000 \
        + rng.randint(0, 3600, n).astype(np.int64) * 1_000_000
    _write_events(tmp_path, users, types, ts)

    got = q_max_drawdown(str(tmp_path)).set_index("event_type")

    df = pd.DataFrame({"t": types, "h": ts // 3_600_000_000})
    for t, g in df.groupby("t"):
        hist = g.groupby("h").size().sort_index()
        c = hist.to_numpy(dtype=np.int64)
        peak = np.maximum.accumulate(c)
        dd = peak - c
        row = got.loc[t]
        assert row["max_drawdown"] == int(dd.max())
        assert row["dd_hour"] == int(hist.index[int(np.argmax(dd))])
        assert row["n_hours"] == len(c)


def test_prune_torn_fragments(tmp_path):
    """A torn write-attempt orphan (PAR1 header, truncated footer) is
    deleted; complete fragments survive and are returned."""
    from kgforge.common.parquet_io import (prune_torn_fragments,
                                           valid_parquet_footer)

    good = tmp_path / "a" / "good.parquet"
    good.parent.mkdir()
    pq.write_table(pa.table({"x": pa.array([1, 2], pa.int64())}),
                   str(good))
    full = good.read_bytes()
    torn = tmp_path / "a" / "torn.parquet"
    torn.write_bytes(full[: len(full) // 2])     # killed mid-write
    tiny = tmp_path / "tiny.parquet"
    tiny.write_bytes(b"PAR1")
    other = tmp_path / "notes.txt"
    other.write_text("keep me")

    assert valid_parquet_footer(str(good))
    assert not valid_parquet_footer(str(torn))
    kept = prune_torn_fragments(str(tmp_path))
    assert kept == [str(good.relative_to(tmp_path))]
    assert not torn.exists() and not tiny.exists()
    assert other.exists()
    assert pq.read_table(str(good)).num_rows == 2


def test_customer_gini_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_customer_gini

    rng = np.random.RandomState(17)
    n_cust, n_ord = 60, 400
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_nationkey": pa.array(
            rng.randint(0, 3, n_cust).astype(np.int64)),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(3, dtype=np.int64)),
        "n_name": pa.array(["ALGERIA", "BRAZIL", "CANADA"]),
    }), str(tmp_path / "nation.parquet"))
    ck = rng.randint(0, n_cust, n_ord).astype(np.int64)
    price = np.round(rng.uniform(10, 9000, n_ord), 2)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(ck),
        "o_totalprice": pa.array(price),
    }), str(tmp_path / "orders.parquet"))

    got = q_customer_gini(str(tmp_path)).to_pandas() \
        .set_index("n_name").sort_index()

    cents = np.floor(np.abs(price * 100) + 0.5).astype(np.int64)
    per_cust: dict = {}
    for c, v in zip(ck, cents):
        per_cust[int(c)] = per_cust.get(int(c), 0) + int(v)
    nat = {0: "ALGERIA", 1: "BRAZIL", 2: "CANADA"}
    nk = pq.read_table(str(tmp_path / "customer.parquet")) \
        .to_pandas().set_index("c_custkey")["c_nationkey"]
    by_nat: dict = {}
    for c, v in per_cust.items():
        by_nat.setdefault(nat[int(nk[c])], []).append(v)
    for name, xs in by_nat.items():
        xs = sorted(xs)
        n, s0 = len(xs), sum(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        gini = (2 * s1 - (n + 1) * s0) * 1_000_000 // (n * s0)
        row = got.loc[name]
        assert row["gini_ppm"] == gini
        assert row["n_customers"] == n
        assert row["total_cents"] == s0


def test_lang_source_pmi_matches_bruteforce(ray_session, tmp_path):
    from kgforge.common.hashing import round_away
    from kgforge.pipelines.driver_queries import q_lang_source_pmi

    rng = np.random.RandomState(3)
    n = 300
    langs = [("en", "de", "fr")[i] for i in rng.randint(0, 3, n)]
    srcs = [("web", "wiki")[i] for i in rng.randint(0, 2, n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["x"] * n),
        "lang": pa.array(langs), "source": pa.array(srcs),
        "n_chars": pa.array(np.ones(n, np.int64)),
    }), str(tmp_path / "documents.parquet"))

    got = q_lang_source_pmi(str(tmp_path)).to_pandas() \
        .set_index(["lang", "source"]).sort_index()

    def L(x):
        return int(round_away(np.log(x) * 1_000_000, 0))

    cells: dict = {}
    for lg, s in zip(langs, srcs):
        cells[(lg, s)] = cells.get((lg, s), 0) + 1
    rows: dict = {}
    cols: dict = {}
    for (lg, s), c in cells.items():
        rows[lg] = rows.get(lg, 0) + c
        cols[s] = cols.get(s, 0) + c
    assert len(got) == len(cells)
    for (lg, s), c in cells.items():
        pmi = L(c) + L(n) - L(rows[lg]) - L(cols[s])
        row = got.loc[(lg, s)]
        assert row["n"] == c
        assert row["pmi_micro"] == pmi


def test_min_cost_supplier_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_min_cost_supplier

    rng = np.random.RandomState(29)
    n = 500
    pk = rng.randint(1, 40, n).astype(np.int64)
    sk = rng.randint(1, 12, n).astype(np.int64)
    price = np.round(rng.uniform(10, 5000, n), 2)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "l_partkey": pa.array(pk), "l_suppkey": pa.array(sk),
        "l_linenumber": pa.array(np.arange(n, dtype=np.int64)),
        "l_quantity": pa.array(np.ones(n)),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(np.full(n, 1_600_000_000_000_000),
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(1, 12, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(1, 12)]),
        "s_nationkey": pa.array(np.zeros(11, np.int64)),
        "s_acctbal": pa.array(np.zeros(11)),
    }), str(tmp_path / "supplier.parquet"))

    got = q_min_cost_supplier(str(tmp_path)).to_pandas() \
        .set_index("p_partkey").sort_index()

    cents = np.floor(np.abs(price * 100) + 0.5).astype(np.int64)
    best: dict = {}
    nsup: dict = {}
    for p, s, c in zip(pk, sk, cents):
        k = (int(p), int(s))
        nsup.setdefault(int(p), set()).add(int(s))
        cur = best.get(int(p))
        cand = (int(c), int(s))
        if cur is None or cand < cur:
            best[int(p)] = cand
    assert len(got) == len(best)
    for p, (c, s) in best.items():
        row = got.loc[p]
        assert row["s_suppkey"] == s
        assert row["min_cents"] == c
        assert row["n_suppliers"] == len(nsup[p])
        assert row["s_name"] == f"Supplier#{s:09d}"


def test_source_token_entropy_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.common.hashing import round_away
    from kgforge.functions.textstats import source_token_entropy_ds

    rng = np.random.RandomState(31)
    vocab = ["the", "alpha", "beta", "gamma", "zip", "q"]
    srcs, texts = [], []
    for _ in range(100):
        s = ("a", "b", "c")[rng.randint(3)]
        words = [vocab[rng.randint(len(vocab))]
                 for _ in range(rng.randint(1, 25))]
        srcs.append(s)
        texts.append("  ".join(words) + " ")    # multi-space + trail
    ds = rd.from_arrow(pa.table({"source": pa.array(srcs),
                                 "text": pa.array(texts)})) \
        .repartition(6)
    got = source_token_entropy_ds(ds).to_pandas() \
        .set_index("source").sort_index()

    def L(x):
        return int(round_away(np.log(x) * 1_000_000, 0))

    per: dict = {}
    for s, t in zip(srcs, texts):
        d = per.setdefault(s, {})
        for w in t.split():
            d[w] = d.get(w, 0) + 1
    for s, d in per.items():
        n = sum(d.values())
        clc = sum(c * L(c) for c in d.values())
        ent = (n * L(n) - clc) // n
        row = got.loc[s]
        assert row["n_tokens"] == n
        assert row["distinct_tokens"] == len(d)
        assert row["entropy_micro"] == ent
