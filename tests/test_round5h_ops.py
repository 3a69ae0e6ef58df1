"""Round-5 session-H operators: Kruskal–Wallis H, exact-integer
squared Cramér's V and the G-test of independence — each against an
independent brute-force oracle with a planted effect."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_lineitem(tmp_path, flags, qtys):
    pq.write_table(pa.table({
        "l_returnflag": pa.array(flags, pa.string()),
        "l_quantity": pa.array([float(q) for q in qtys],
                               pa.float64())}),
        str(tmp_path / "lineitem.parquet"))


def _write_events(tmp_path, hours, types):
    # one event per (hour, type) draw, all on distinct days
    ts = [(i * 86_400 + h * 3_600) * 1_000_000
          for i, h in enumerate(hours)]
    pq.write_table(pa.table({
        "ts": pa.array(np.array(ts, np.int64)).cast(pa.timestamp("us")),
        "event_type": pa.array(types, pa.string())}),
        str(tmp_path / "events.parquet"))


def test_kruskal_wallis_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_kruskal_wallis

    rng = np.random.RandomState(11)
    flags, qtys = [], []
    for f, shift in (("A", 0), ("N", 3), ("R", 8)):   # planted shift
        for _ in range(120):
            flags.append(f)
            qtys.append(int(rng.randint(1, 20)) + shift)
    _write_lineitem(tmp_path, flags, qtys)

    got = q_kruskal_wallis(str(tmp_path)).to_pandas() \
        .set_index("l_returnflag")

    # brute force: per-row average ranks, not a value histogram
    v = np.array(qtys, np.int64)
    order = np.argsort(v, kind="stable")
    ranks2 = np.empty(len(v), np.int64)          # 2 × average rank
    i = 0
    sv = v[order]
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks2[order[i:j]] = (i + 1) + j          # 2·avg of i+1..j
        i = j
    n_tot = len(v)
    fa = np.array(flags)
    h = 0
    for f in ("A", "N", "R"):
        s2 = int(ranks2[fa == f].sum())
        ng = int((fa == f).sum())
        assert int(got.loc[f, "rank_sum_x2"]) == s2
        assert int(got.loc[f, "n_group"]) == ng
        term = (3_000_000 * s2 * s2) // (ng * n_tot * (n_tot + 1))
        assert int(got.loc[f, "term_micro"]) == term
        h += term
    h -= 3 * (n_tot + 1) * 1_000_000
    assert (got["h_micro"] == h).all()
    _, counts = np.unique(v, return_counts=True)
    assert int(got["tie_sum"].iloc[0]) == sum(
        int(c) ** 3 - int(c) for c in counts)
    # planted location shift ⇒ decisively significant H (χ²₂ ~ 5.99)
    assert h > 50 * 1_000_000


def test_cramers_v_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_cramers_v

    rng = np.random.RandomState(5)
    hours, types = [], []
    for _ in range(600):
        t = str(rng.choice(["click", "view", "buy"]))
        # planted association: buys cluster at hour 20
        h = 20 if (t == "buy" and rng.rand() < 0.9) \
            else int(rng.randint(0, 24))
        hours.append(h)
        types.append(t)
    _write_events(tmp_path, hours, types)

    got = q_cramers_v(str(tmp_path)).to_pandas().iloc[0]

    cells: dict = {}
    for h, t in zip(hours, types):
        cells[(t, h)] = cells.get((t, h), 0) + 1
    n = len(hours)
    row: dict = {}
    col: dict = {}
    for (t, h), c in cells.items():
        row[t] = row.get(t, 0) + c
        col[h] = col.get(h, 0) + c
    chi2 = sum((1_000_000 * (c * n - row[t] * col[h]) ** 2)
               // (row[t] * col[h] * n)
               for (t, h), c in cells.items())
    assert int(got["chi2_micro"]) == chi2
    assert int(got["v2_micro"]) == chi2 // (n * (min(len(row),
                                                     len(col)) - 1))
    assert int(got["df"]) == (len(row) - 1) * (len(col) - 1)
    assert int(got["v2_micro"]) > 100_000    # planted association


def test_g_test_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_g_test

    rng = np.random.RandomState(9)
    hours = [int(rng.randint(0, 6)) for _ in range(400)]
    types = [("night" if h < 3 else "day") if rng.rand() < 0.8
             else str(rng.choice(["night", "day"]))
             for h in hours]
    _write_events(tmp_path, hours, types)

    got = q_g_test(str(tmp_path)).to_pandas().iloc[0]

    def L(x):
        return int(math.floor(math.log(x) * 1_000_000 + 0.5))

    cells: dict = {}
    for h, t in zip(hours, types):
        cells[(t, h)] = cells.get((t, h), 0) + 1
    n = len(hours)
    row: dict = {}
    col: dict = {}
    for (t, h), c in cells.items():
        row[t] = row.get(t, 0) + c
        col[h] = col.get(h, 0) + c
    s = sum(c * (L(c) + L(n) - L(row[t]) - L(col[h]))
            for (t, h), c in cells.items())
    assert int(got["g_micro"]) == 2 * s
    assert int(got["n_events"]) == n
    assert int(got["df"]) == (len(row) - 1) * (len(col) - 1)
    # planted hour→type dependence ⇒ strongly positive G
    assert 2 * s > 10_000_000


def test_welch_t_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_welch_t

    rng = np.random.RandomState(3)
    segs, bals = [], []
    for s, mu, sd in (("BUILDING", 500.0, 100.0),
                      ("MACHINERY", 560.0, 300.0),
                      ("FURNITURE", 0.0, 1.0)):      # must be ignored
        for _ in range(80):
            segs.append(s)
            bals.append(round(float(rng.normal(mu, sd)), 2))
    pq.write_table(pa.table({
        "c_mktsegment": pa.array(segs, pa.string()),
        "c_acctbal": pa.array(bals, pa.float64())}),
        str(tmp_path / "customer.parquet"))

    got = q_welch_t(str(tmp_path)).to_pandas().iloc[0]

    def stats(seg):
        c = [int(round(b * 100)) for s, b in zip(segs, bals)
             if s == seg]
        return len(c), sum(c), sum(x * x for x in c)

    n1, s1, q1 = stats("BUILDING")
    n2, s2, q2 = stats("MACHINERY")
    assert (int(got["n_a"]), int(got["n_b"])) == (n1, n2)
    # independent float brute force within rounding distance
    import numpy as _np

    a = _np.array([b for s, b in zip(segs, bals) if s == "BUILDING"])
    b_ = _np.array([b for s, b in zip(segs, bals)
                    if s == "MACHINERY"])
    se2 = a.var(ddof=1) / n1 + b_.var(ddof=1) / n2
    t2_ref = (a.mean() - b_.mean()) ** 2 / se2
    df_ref = se2 ** 2 / ((a.var(ddof=1) / n1) ** 2 / (n1 - 1)
                         + (b_.var(ddof=1) / n2) ** 2 / (n2 - 1))
    assert abs(float(got["t2"]) - t2_ref) < 1e-4 * max(t2_ref, 1)
    assert abs(float(got["df_w"]) - df_ref) < 0.02
    assert abs(float(got["mean_a"]) - a.mean()) < 0.01


def test_runs_test_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_runs_test

    rng = np.random.RandomState(17)
    # planted trend: first half low, second half high -> few runs
    days, prices = [], []
    for d in range(60):
        base = 100.0 if d < 30 else 500.0
        for _ in range(int(rng.randint(1, 4))):
            days.append(d)
            prices.append(round(base + float(rng.rand() * 10), 2))
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            np.array([d * 86_400_000_000 for d in days], np.int64))
            .cast(pa.timestamp("us")),
        "o_totalprice": pa.array(prices, pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = q_runs_test(str(tmp_path)).to_pandas().iloc[0]

    daily = {}
    for d, p in zip(days, prices):
        daily[d] = daily.get(d, 0) + int(round(p * 100))
    cents = [daily[d] for d in sorted(daily)]
    med = sorted(cents)[(len(cents) - 1) // 2]
    ab = [c > med for c in cents]
    runs = 1 + sum(1 for i in range(1, len(ab)) if ab[i] != ab[i - 1])
    n1, n2 = sum(ab), len(ab) - sum(ab)
    assert int(got["runs"]) == runs
    assert int(got["n_above"]) == n1
    assert int(got["n_below"]) == n2
    assert int(got["mu_micro"]) == 1_000_000 + 2_000_000 * n1 * n2 \
        // (n1 + n2)
    # planted trend: far fewer runs than expected under independence
    assert runs * 1_000_000 < int(got["mu_micro"]) // 2


def test_theil_nation_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_theil_nation

    rng = np.random.RandomState(23)
    # nation 0: equal revenues (theil ~ 0); nation 1: one whale
    cust_nation = {}
    rows = []
    ck = 1
    for nk, revs in ((0, [200.0] * 10),
                     (1, [10.0] * 9 + [5000.0])):
        for r in revs:
            cust_nation[ck] = nk
            n_orders = int(rng.randint(1, 4))
            split = np.full(n_orders, r / n_orders)
            for s in split:
                rows.append((ck, round(float(s), 2)))
            ck += 1
    pq.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64())}),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array(sorted(cust_nation), pa.int64()),
        "c_nationkey": pa.array(
            [cust_nation[k] for k in sorted(cust_nation)],
            pa.int32())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["EQUALIA", "WHALELAND"], pa.string())}),
        str(tmp_path / "nation.parquet"))

    got = q_theil_nation(str(tmp_path)).to_pandas() \
        .set_index("n_name")

    def L(v):
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    percust = {}
    for ck_, p in rows:
        percust[ck_] = percust.get(ck_, 0) + int(round(p * 100))
    n_tot, x_tot = len(percust), sum(percust.values())
    for name, nk in (("EQUALIA", 0), ("WHALELAND", 1)):
        xs = [x for c, x in percust.items() if cust_nation[c] == nk]
        ng, xg = len(xs), sum(xs)
        w = sum(x * L(x) for x in xs)
        v = w + xg * (L(ng) - L(xg))
        within = v // xg if v >= 0 else -((-v) // xg)
        assert int(got.loc[name, "theil_within_micro"]) == within
        assert int(got.loc[name, "n_cust"]) == ng
        assert int(got.loc[name, "rev_cents"]) == xg
        assert int(got.loc[name, "between_term"]) == xg * (
            L(xg) + L(n_tot) - L(x_tot) - L(ng))
    # planted whale: unequal nation far above the equal one
    assert int(got.loc["WHALELAND", "theil_within_micro"]) > \
        1_000_000
    assert abs(int(got.loc["EQUALIA", "theil_within_micro"])) < 1_000


def test_abc_parts_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_abc_parts

    rng = np.random.RandomState(29)
    pks, exts, discs = [], [], []
    for pk in range(1, 61):
        # planted whale parts: a few parts carry most revenue
        scale = 5000.0 if pk <= 3 else 10.0
        for _ in range(int(rng.randint(1, 5))):
            pks.append(pk)
            exts.append(round(scale * (1 + float(rng.rand())), 2))
            discs.append(round(float(rng.randint(0, 10)) / 100, 2))
    pq.write_table(pa.table({
        "l_partkey": pa.array(pks, pa.int64()),
        "l_extendedprice": pa.array(exts, pa.float64()),
        "l_discount": pa.array(discs, pa.float64())}),
        str(tmp_path / "lineitem.parquet"))

    got = q_abc_parts(str(tmp_path)).to_pandas().set_index("abc_class")

    rev = {}
    for pk, e, d in zip(pks, exts, discs):
        c = int(np.floor(abs(e * (1.0 - d) * 100) + 0.5))
        rev[pk] = rev.get(pk, 0) + c
    items = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(rev.values())
    cum, census = 0, {}
    for pk, c in items:
        cum += c
        cls = "A" if cum * 100 <= 80 * tot else \
            ("B" if cum * 100 <= 95 * tot else "C")
        n, s = census.get(cls, (0, 0))
        census[cls] = (n + 1, s + c)
    for cls, (n, s) in census.items():
        assert int(got.loc[cls, "n_parts"]) == n
        assert int(got.loc[cls, "rev_cents"]) == s
        assert int(got.loc[cls, "share_ppm"]) == s * 1_000_000 // tot
    # planted whales: class A is a small fraction of the parts
    assert census["A"][0] <= 5 and census["C"][0] > 10


def test_price_elasticity_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_price_elasticity

    rng = np.random.RandomState(31)
    # planted elasticity: qty = (price/1000)^-2 exactly on the grid
    pks, exts, qtys, brands = [], [], [], []
    part_rows = []
    for pk in range(1, 21):
        brand = "ELASTIC" if pk <= 10 else "FLAT"
        part_rows.append((pk, brand))
        for _ in range(12):
            unit = float(rng.choice([10.0, 20.0, 40.0]))
            q = (40.0 / unit) ** 2 if brand == "ELASTIC" \
                else float(rng.randint(1, 8))
            pks.append(pk)
            qtys.append(q)
            exts.append(round(unit * q, 6))
            brands.append(brand)
    pq.write_table(pa.table({
        "l_partkey": pa.array(pks, pa.int64()),
        "l_extendedprice": pa.array(exts, pa.float64()),
        "l_quantity": pa.array(qtys, pa.float64())}),
        str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([r[0] for r in part_rows], pa.int64()),
        "p_brand": pa.array([r[1] for r in part_rows], pa.string())}),
        str(tmp_path / "part.parquet"))

    got = q_price_elasticity(str(tmp_path)).to_pandas() \
        .set_index("p_brand")

    # brute force on the same millinat grid
    mo = {}
    for pk, e, q, br in zip(pks, exts, qtys, brands):
        unit = int(np.floor(abs(e * 100.0 / q) + 0.5))
        x = int(math.floor(math.log(unit) * 1_000 + 0.5))
        y = int(math.floor(
            math.log(int(np.floor(q + 0.5))) * 1_000 + 0.5))
        n, sx, sy, sxy, sxx = mo.get(br, (0, 0, 0, 0, 0))
        mo[br] = (n + 1, sx + x, sy + y, sxy + x * y, sxx + x * x)
    for br, (n, sx, sy, sxy, sxx) in mo.items():
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            assert br not in got.index
            continue
        slope = float(got.loc[br, "elasticity"])
        assert abs(slope - num / den) < 1e-5
        assert int(got.loc[br, "n_rows"]) == n
    # planted power law: ELASTIC slope ~ -2, FLAT ~ 0
    assert abs(float(got.loc["ELASTIC", "elasticity"]) + 2.0) < 0.05
    assert abs(float(got.loc["FLAT", "elasticity"])) < 0.5


def test_embedding_pca_var_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_embedding_pca_var

    rng = np.random.RandomState(41)
    # planted rank-1 structure along dim 2 of 8
    d, n = 8, 120
    base = rng.randn(n, d) * 0.02
    base[:, 2] += rng.randn(n) * 0.9
    vecs = [[round(float(x), 6) for x in row] for row in base]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))

    got = q_embedding_pca_var(str(tmp_path)).to_pandas().iloc[0]

    # brute force: same integer pipeline, independently coded
    q = np.floor(np.abs(np.array(
        [np.array(v, np.float64) for v in pq.read_table(
            str(tmp_path / "embeddings.parquet"))["embedding"]
         .to_pylist()])) * 1_000_000 + 0.5).astype(np.int64)
    sign = np.sign([np.array(v, np.float64) for v in pq.read_table(
        str(tmp_path / "embeddings.parquet"))["embedding"]
        .to_pylist()]).astype(np.int64)
    q = q * sign
    S = (q.T @ q).tolist()
    s = q.sum(axis=0).tolist()
    C = [[n * S[i][j] - s[i] * s[j] for j in range(d)]
         for i in range(d)]

    def sdiv(a, b):
        return a // b if a >= 0 else -((-a) // b)

    def step(v):
        y = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in y)
        return y, [sdiv(x * 1_000_000, m) for x in y]

    v = [1_000_000] * d
    _, v = step(v)
    _, v2 = step(v)
    y3, _ = step(v2)
    num = sum(v2[i] * y3[i] for i in range(d))
    den = sum(x * x for x in v2)
    trace = sum(C[i][i] for i in range(d))
    assert int(got["lambda_micro2"]) == (num // den) // (n * (n - 1))
    assert int(got["trace_micro2"]) == trace // (n * (n - 1))
    assert int(got["top_share_ppm"]) == (num // den) * 1_000_000 \
        // trace
    assert int(got["dom_dim"]) == 2           # planted direction
    assert int(got["top_share_ppm"]) > 900_000  # near-rank-1 cloud


def _write_docs(tmp_path, sources, texts):
    pq.write_table(pa.table({
        "source": pa.array(sources, pa.string()),
        "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))


def test_token_simpson_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_token_simpson

    _write_docs(tmp_path,
                ["boiler", "boiler", "rich", "rich"],
                ["spam spam spam spam eggs",
                 "spam spam ham",
                 "alpha beta gamma delta",
                 "epsilon zeta eta theta"])

    got = q_token_simpson(str(tmp_path)).to_pandas() \
        .set_index("source")

    for src in ("boiler", "rich"):
        cnt = {}
        for s, txt in zip(["boiler", "boiler", "rich", "rich"],
                          ["spam spam spam spam eggs",
                           "spam spam ham",
                           "alpha beta gamma delta",
                           "epsilon zeta eta theta"]):
            if s != src:
                continue
            for w in txt.split():
                cnt[w] = cnt.get(w, 0) + 1
        t = sum(cnt.values())
        rep = sum(c * (c - 1) for c in cnt.values())
        assert int(got.loc[src, "n_tokens"]) == t
        assert int(got.loc[src, "n_types"]) == len(cnt)
        assert int(got.loc[src, "simpson_ppb"]) == \
            rep * 1_000_000_000 // (t * (t - 1))
    assert int(got.loc["boiler", "simpson_ppb"]) > \
        int(got.loc["rich", "simpson_ppb"]) + 100_000_000


def test_source_jsd_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_source_jsd

    srcs = ["same1", "same2", "far"]
    texts = {"same1": "a b c a b c a b",
             "same2": "a b c a b c b a",
             "far": "x y z w x y z w"}
    _write_docs(tmp_path, srcs, [texts[s] for s in srcs])

    got = q_source_jsd(str(tmp_path)).to_pandas()
    got = got.set_index(["src_a", "src_b"])

    def L(x):
        return int(math.floor(math.log(x) * 1_000_000 + 0.5))

    def counts(s):
        d = {}
        for w in texts[s].split():
            d[w] = d.get(w, 0) + 1
        return d

    def sdiv(a, b):
        return a // b if a >= 0 else -((-a) // b)

    import itertools

    for x, y in itertools.combinations(sorted(srcs), 2):
        ca, cb = counts(x), counts(y)
        A, B = sum(ca.values()), sum(cb.values())
        sa = sb = 0
        for w in set(ca) | set(cb):
            a, b = ca.get(w, 0), cb.get(w, 0)
            mix = a * B + b * A
            if a > 0:
                sa += a * (L(2 * a * B) - L(mix))
            if b > 0:
                sb += b * (L(2 * b * A) - L(mix))
        jsd = sdiv(sa, 2 * A) + sdiv(sb, 2 * B)
        assert int(got.loc[(x, y), "jsd_micro"]) == jsd
        assert int(got.loc[(x, y), "tok_a"]) == A
    # identical-vocab pair near 0; disjoint pair near ln2 (693147)
    assert abs(int(got.loc[("same1", "same2"), "jsd_micro"])) < 20_000
    assert int(got.loc[("far", "same1"), "jsd_micro"]) > 650_000


def test_daily_dispersion_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_daily_dispersion

    rng = np.random.RandomState(13)
    days, types = [], []
    for d in range(30):
        # steady: ~3/day every day; bursty: 30 on two days only
        for _ in range(3):
            days.append(d)
            types.append("steady")
    for d in (5, 20):
        for _ in range(30):
            days.append(d)
            types.append("bursty")
    ts = [(d * 86_400 + int(rng.randint(0, 86_400))) * 1_000_000
          for d in days]
    pq.write_table(pa.table({
        "ts": pa.array(np.array(ts, np.int64)).cast(pa.timestamp("us")),
        "event_type": pa.array(types, pa.string())}),
        str(tmp_path / "events.parquet"))

    got = q_daily_dispersion(str(tmp_path)).to_pandas() \
        .set_index("event_type")

    span = max(days) - min(days) + 1
    for et in ("steady", "bursty"):
        cnt = {}
        for d, t in zip(days, types):
            if t == et:
                cnt[d] = cnt.get(d, 0) + 1
        s = sum(cnt.values())
        q = sum(c * c for c in cnt.values())
        vmr = (span * q - s * s) * 1_000_000 // ((span - 1) * s)
        assert int(got.loc[et, "vmr_ppm"]) == vmr
        assert int(got.loc[et, "n_days_active"]) == len(cnt)
        assert int(got.loc[et, "day_span"]) == span
    assert int(got.loc["bursty", "vmr_ppm"]) > 10_000_000
    assert int(got.loc["steady", "vmr_ppm"]) < 2_000_000


def test_gap_cv2_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_gap_cv2

    rng = np.random.RandomState(19)
    rows = []  # (user, ts_us, type)
    eid = 0
    for u in range(10):
        t = int(rng.randint(0, 1000)) * 1_000_000
        for _ in range(20):
            # metronome: exactly 60s; bursty: 1s or 1000s
            if u < 5:
                t += 60 * 1_000_000
                rows.append((u, t, "metronome"))
            else:
                t += int(rng.choice([1, 1000])) * 1_000_000
                rows.append((u, t, "bursty"))
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string())}),
        str(tmp_path / "events.parquet"))

    got = q_gap_cv2(str(tmp_path)).to_pandas().set_index("event_type")

    per_user: dict = {}
    for i, (u, t, et) in enumerate(rows):
        per_user.setdefault(u, []).append((t, i, et))
    acc: dict = {}
    for u, evs in per_user.items():
        evs.sort()
        for (t1, _, et1), (t2, _, _) in zip(evs, evs[1:]):
            g = (t2 - t1) // 1_000_000
            n, s, q = acc.get(et1, (0, 0, 0))
            acc[et1] = (n + 1, s + g, q + g * g)
    for et, (n, s, q) in acc.items():
        cv2 = n * (n * q - s * s) * 1_000_000 // ((n - 1) * s * s)
        assert int(got.loc[et, "cv2_ppm"]) == cv2
        assert int(got.loc[et, "n_gaps"]) == n
        assert int(got.loc[et, "sum_gap_s"]) == s
    assert int(got.loc["metronome", "cv2_ppm"]) == 0
    assert int(got.loc["bursty", "cv2_ppm"]) > 500_000


def test_streak_lengths_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_streak_lengths

    rng = np.random.RandomState(37)
    rows = []
    expected: dict = {}
    for u in range(40):
        days = sorted(set(int(x) for x in
                          rng.choice(30, rng.randint(1, 15),
                                     replace=False)))
        best = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        expected[best] = expected.get(best, 0) + 1
        for d in days:
            # several events per active day
            for _ in range(int(rng.randint(1, 4))):
                rows.append((u, (d * 86_400
                                 + int(rng.randint(0, 86_400)))
                             * 1_000_000))
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us"))}),
        str(tmp_path / "events.parquet"))

    got = q_streak_lengths(str(tmp_path)).to_pandas()
    got = dict(zip(got["streak"].astype(int),
                   got["n_users"].astype(int)))
    assert got == expected


def test_length_jarque_bera_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_length_jarque_bera

    rng = np.random.RandomState(43)
    # log-normal lengths => JB small; add a planted heavy tail
    lens = np.concatenate([
        np.exp(rng.normal(7, 0.5, 300)).astype(np.int64) + 1,
        np.full(30, 2_000_000, np.int64)])          # planted outliers
    pq.write_table(pa.table({
        "n_chars": pa.array(lens, pa.int64())}),
        str(tmp_path / "documents.parquet"))

    got = q_length_jarque_bera(str(tmp_path)).to_pandas().iloc[0]

    x = [int(math.floor(math.log(v) * 1_000 + 0.5)) for v in lens]
    n = len(x)
    s1, s2 = sum(x), sum(v * v for v in x)
    s3 = sum(v ** 3 for v in x)
    s4 = sum(v ** 4 for v in x)
    a = n * s2 - s1 * s1
    b = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    c = n ** 3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 \
        - 3 * s1 ** 4
    assert int(got["n_docs"]) == n
    assert int(got["mu_millinats"]) == s1 // n
    skew = float(b) / math.sqrt(float(a) ** 3)
    kurt = float(c) / float(a) ** 2
    assert abs(float(got["skew_g1"]) - skew) < 1e-5
    assert abs(float(got["kurt_g2"]) - kurt) < 1e-5
    jb = n / 6.0 * (skew ** 2 + (kurt - 3) ** 2 / 4)
    assert abs(float(got["jb"]) - jb) < max(1e-3 * jb, 1e-3)
    assert float(got["jb"]) > 100.0     # planted tail kills normality


def test_user_lifespan_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_user_lifespan

    rng = np.random.RandomState(47)
    rows = []
    expected: dict = {}
    for u in range(50):
        first = int(rng.randint(0, 50))
        span = int(rng.randint(0, 120))
        days = [first, first + span] + [
            first + int(rng.randint(0, span + 1))
            for _ in range(int(rng.randint(0, 5)))]
        for d in days:
            rows.append((u, (d * 86_400 + u) * 1_000_000))
        bk = min(span // 7, 12)
        n, s = expected.get(bk, (0, 0))
        expected[bk] = (n + 1, s + span)
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us"))}),
        str(tmp_path / "events.parquet"))

    got = q_user_lifespan(str(tmp_path)).to_pandas()
    got_d = {int(r["week_bucket"]): (int(r["n_users"]),
                                     int(r["sum_span_days"]))
             for _, r in got.iterrows()}
    assert got_d == expected


def test_nbinom_fit_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_nbinom_fit

    rng = np.random.RandomState(53)
    # overdispersed counts: a few superusers
    counts = [1] * 30 + [3] * 20 + [50, 80, 120]
    rows = []
    for u, c in enumerate(counts):
        for i in range(c):
            rows.append((u, (u * 10_000 + i) * 1_000_000))
    rng.shuffle(rows)
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us"))}),
        str(tmp_path / "events.parquet"))

    got = q_nbinom_fit(str(tmp_path)).to_pandas().iloc[0]

    n = len(counts)
    s, q = sum(counts), sum(c * c for c in counts)
    v_num = n * q - s * s
    od = v_num - s * (n - 1)
    assert int(got["n_users"]) == n
    assert int(got["n_events"]) == s
    assert int(got["mean_ppm"]) == s * 1_000_000 // n
    assert int(got["var_x_nn1"]) == v_num
    assert int(got["r_micro"]) == s * s * (n - 1) * 1_000_000 \
        // (n * od)
    assert int(got["p_ppm"]) == s * (n - 1) * 1_000_000 // v_num
    # overdispersed: r small (heterogeneous), p well below 1
    assert int(got["r_micro"]) < 1_000_000


def test_weekly_churn_markov_matches_bruteforce(ray_session,
                                                tmp_path):
    from kgforge.pipelines.driver_queries import q_weekly_churn_markov

    rng = np.random.RandomState(59)
    active: dict = {}
    rows = []
    for u in range(30):
        wks = sorted(set(int(x) for x in
                         rng.choice(20, rng.randint(1, 12),
                                    replace=False)))
        active[u] = set(wks)
        for w in wks:
            for _ in range(int(rng.randint(1, 3))):
                rows.append((u, (w * 7 * 86_400
                                 + int(rng.randint(0, 600_000)))
                             * 1_000_000))
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us"))}),
        str(tmp_path / "events.parquet"))

    got = q_weekly_churn_markov(str(tmp_path)).to_pandas().iloc[0]

    wmin = min(min(s) for s in active.values())
    wmax = max(max(s) for s in active.values())
    n = {"00": 0, "01": 0, "10": 0, "11": 0}
    for s in active.values():
        for w in range(wmin, wmax):
            key = f"{int(w in s)}{int(w + 1 in s)}"
            n[key] += 1
    assert int(got["n00"]) == n["00"]
    assert int(got["n01"]) == n["01"]
    assert int(got["n10"]) == n["10"]
    assert int(got["n11"]) == n["11"]
    assert int(got["week_span"]) == wmax - wmin + 1
    assert int(got["p10_ppm"]) == n["10"] * 1_000_000 \
        // (n["11"] + n["10"])
    assert int(got["p01_ppm"]) == n["01"] * 1_000_000 \
        // (n["00"] + n["01"])


def test_gap_autocorr_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_gap_autocorr

    rng = np.random.RandomState(61)
    rows = []
    for u in range(8):
        t = 0
        # alternating short/long gaps => strong NEGATIVE lag-1 corr
        for i in range(30):
            t += (5 if i % 2 == 0 else 500) * 1_000_000
            rows.append((u, t, "alternator"))
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string())}),
        str(tmp_path / "events.parquet"))

    got = q_gap_autocorr(str(tmp_path)).to_pandas() \
        .set_index("event_type")

    mo = [0] * 6
    per_user: dict = {}
    for u, t, _ in rows:
        per_user.setdefault(u, []).append(t)
    for ts in per_user.values():
        ts.sort()
        gaps = [(b - a) // 1_000_000 for a, b in zip(ts, ts[1:])]
        for x, y in zip(gaps, gaps[1:]):
            mo[0] += 1
            mo[1] += x
            mo[2] += y
            mo[3] += x * y
            mo[4] += x * x
            mo[5] += y * y
    n, sx, sy, sxy, sxx, syy = mo
    r1 = (n * sxy - sx * sy) / math.sqrt(
        float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    assert int(got.loc["alternator", "n_pairs"]) == n
    assert abs(float(got.loc["alternator", "autocorr_r1"]) - r1) \
        < 1e-5
    assert float(got.loc["alternator", "autocorr_r1"]) < -0.9


def test_vocab_chao1_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_vocab_chao1

    # planted: half the types are hapax => chao1 well above observed
    text_a = " ".join(["common"] * 20
                      + [f"rare{i}" for i in range(10)]
                      + ["twice", "twice", "double", "double"])
    text_b = "a a a b b c"
    _write_docs(tmp_path, ["richsrc", "poorsrc"], [text_a, text_b])

    got = q_vocab_chao1(str(tmp_path)).to_pandas().set_index("source")

    for src, txt in (("richsrc", text_a), ("poorsrc", text_b)):
        cnt = {}
        for w in txt.split():
            cnt[w] = cnt.get(w, 0) + 1
        s = len(cnt)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        t = sum(cnt.values())
        assert int(got.loc[src, "n_types"]) == s
        assert int(got.loc[src, "f1"]) == f1
        assert int(got.loc[src, "f2"]) == f2
        assert int(got.loc[src, "chao1_est"]) == \
            s + f1 * (f1 - 1) // (2 * (f2 + 1))
        assert int(got.loc[src, "coverage_ppm"]) == \
            (t - f1) * 1_000_000 // t
    assert int(got.loc["richsrc", "chao1_est"]) > \
        int(got.loc["richsrc", "n_types"])


def test_pii_census_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_pii_census

    docs = [
        ("leaky", "contact me at jane.doe@example.com today"),
        ("leaky", "call +1 555-123-4567 or 9876543210 now"),
        ("leaky", "nothing sensitive here"),
        ("clean", "plain text only"),
        ("clean", "more plain text"),
    ]
    _write_docs(tmp_path, [d[0] for d in docs], [d[1] for d in docs])

    got = q_pii_census(str(tmp_path)).to_pandas().set_index("source")

    assert int(got.loc["leaky", "n_docs"]) == 3
    assert int(got.loc["leaky", "n_email"]) == 1
    assert int(got.loc["leaky", "n_phone"]) == 1
    assert int(got.loc["leaky", "n_long_id"]) == 1
    assert int(got.loc["leaky", "email_ppm"]) == 1_000_000 // 3
    assert int(got.loc["clean", "n_email"]) == 0
    assert int(got.loc["clean", "n_phone"]) == 0
    assert int(got.loc["clean", "n_long_id"]) == 0


def test_linear_attribution_matches_bruteforce(ray_session,
                                               tmp_path):
    from kgforge.pipelines.driver_queries import q_linear_attribution

    D = 86_400_000_000
    rows = [
        # user 1: 2 touches then purchase -> 500000 each
        (1, 1 * D, "click"), (1, 2 * D, "view"),
        (1, 3 * D, "purchase"),
        # user 2: 3 touches in window, 1 outside (8 days before)
        (2, 0 * D, "click"),
        (2, 5 * D, "click"), (2, 6 * D, "view"),
        (2, 7 * D, "signup"), (2, 8 * D, "purchase"),
        # user 3: purchase with no touches -> unattributed
        (3, 4 * D, "purchase"),
    ]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string())}),
        str(tmp_path / "events.parquet"))

    got = q_linear_attribution(str(tmp_path)).to_pandas() \
        .set_index("event_type")

    # u1: click+view @500000 each; u2: k=3 -> 333333 each
    assert int(got.loc["click", "touches"]) == 2
    assert int(got.loc["click", "credit_micro"]) == 500_000 + 333_333
    assert int(got.loc["view", "touches"]) == 2
    assert int(got.loc["view", "credit_micro"]) == 500_000 + 333_333
    assert int(got.loc["signup", "touches"]) == 1
    assert int(got.loc["signup", "credit_micro"]) == 333_333
    assert int(got["n_conversions"].iloc[0]) == 3
    assert int(got["n_attributed"].iloc[0]) == 2


def test_doc_prefix_dup_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_doc_prefix_dup

    boiler = "COPYRIGHT NOTICE: all rights reserved by the scraper"
    srcs, texts = [], []
    for i in range(7):
        srcs.append("s")
        texts.append(boiler + f" unique tail {i}")
    for i in range(25):
        srcs.append("s")
        texts.append(f"unique doc number {i} with its own start")
    _write_docs(tmp_path, srcs, texts)

    got = q_doc_prefix_dup(str(tmp_path)).to_pandas()

    assert got.iloc[0]["prefix"] == boiler[:48]
    assert int(got.iloc[0]["n_docs"]) == 7
    assert len(got) == 20
    assert (got["n_docs"].to_numpy()[1:]
            <= got["n_docs"].to_numpy()[:-1]).all()


def test_mann_kendall_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_mann_kendall

    rng = np.random.RandomState(67)
    days, prices = [], []
    for d in range(80):
        # planted monotone trend with noise and ties
        base = 100 + d * 10
        for _ in range(int(rng.randint(1, 3))):
            days.append(d)
            prices.append(float(base + int(rng.randint(0, 3))))
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            np.array([d * 86_400_000_000 for d in days], np.int64))
            .cast(pa.timestamp("us")),
        "o_totalprice": pa.array(prices, pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = q_mann_kendall(str(tmp_path)).to_pandas().iloc[0]

    daily = {}
    for d, p in zip(days, prices):
        daily[d] = daily.get(d, 0) + int(round(p * 100))
    c = [daily[d] for d in sorted(daily)]
    n = len(c)
    s = sum((cj > ci) - (cj < ci)
            for i, ci in enumerate(c) for cj in c[i + 1:])
    ties: dict = {}
    for v in c:
        ties[v] = ties.get(v, 0) + 1
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    assert int(got["s_stat"]) == s
    assert int(got["var_x18"]) == var18
    assert int(got["n_days"]) == n
    z = (s - 1) / math.sqrt(var18 / 18.0)
    assert abs(float(got["z"]) - z) < 1e-3
    assert float(got["z"]) > 3.0        # planted trend is decisive


def test_mixed_script_census_matches_bruteforce(ray_session,
                                                tmp_path):
    from kgforge.pipelines.driver_queries import q_mixed_script_census

    docs = [("web", "hello world"),
            ("web", "hello 世界 mixed line"),
            ("web", "纯中文文本"),
            ("clean", "only ascii here")]
    _write_docs(tmp_path, [d[0] for d in docs], [d[1] for d in docs])

    got = q_mixed_script_census(str(tmp_path)).to_pandas() \
        .set_index("source")

    assert int(got.loc["web", "n_docs"]) == 3
    assert int(got.loc["web", "n_latin"]) == 2
    assert int(got.loc["web", "n_han"]) == 2
    assert int(got.loc["web", "n_mixed"]) == 1
    assert int(got.loc["web", "mixed_ppm"]) == 1_000_000 // 3
    assert int(got.loc["clean", "n_han"]) == 0


def test_twonn_id_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_twonn_id

    rng = np.random.RandomState(71)
    # planted 2-manifold embedded in 8-d (last 6 dims zero) + 1 dup
    n, d = 60, 8
    pts = np.zeros((n, d))
    pts[:, :2] = rng.rand(n, 2)
    pts[n - 1] = pts[0]                      # exact duplicate pair
    vecs = [[round(float(x), 6) for x in row] for row in pts]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))

    got = q_twonn_id(str(tmp_path)).to_pandas().iloc[0]

    # brute force on the identical integer grid
    raw = [np.array(v, np.float64) for v in pq.read_table(
        str(tmp_path / "embeddings.parquet"))["embedding"]
        .to_pylist()]
    q = np.array([np.sign(v) * np.floor(np.abs(v) * 1_000_000 + 0.5)
                  for v in raw]).astype(np.int64)
    lsum = n_eff = n_dup = 0
    for i in range(n):
        d2 = ((q - q[i]) ** 2).sum(axis=1)
        order = sorted((int(d2[j]), j) for j in range(n) if j != i)
        d1, d2_ = order[0][0], order[1][0]
        if d1 == 0:
            n_dup += 1
            continue
        n_eff += 1
        lsum += (int(math.floor(math.log(d2_) * 1_000_000 + 0.5))
                 - int(math.floor(math.log(d1) * 1_000_000 + 0.5)))
    assert int(got["n_eff"]) == n_eff
    assert int(got["n_dup"]) == n_dup == 2
    assert int(got["lsum_micro"]) == lsum
    assert int(got["id_micro"]) == 2 * n_eff * 10 ** 12 // lsum
    # planted 2-manifold: estimate lands near 2
    assert 1_300_000 < int(got["id_micro"]) < 3_000_000


def test_funnel_step_latency_matches_bruteforce(ray_session,
                                                tmp_path):
    from kgforge.pipelines.driver_queries import q_funnel_step_latency

    rng = np.random.RandomState(73)
    rows = []
    deltas = {"view->click": [], "click->purchase": []}
    for u in range(40):
        t0 = int(rng.randint(0, 10**6)) * 1_000_000
        tv = t0
        rows.append((u, tv, "view"))
        if rng.rand() < 0.8:
            tc = tv + int(rng.randint(1, 5000)) * 60_000_000 \
                + int(rng.randint(0, 60_000_000))
            rows.append((u, tc, "click"))
            deltas["view->click"].append((tc - tv) // 60_000_000)
            if rng.rand() < 0.6:
                tp = tc + int(rng.randint(1, 2000)) * 60_000_000
                rows.append((u, tp, "purchase"))
                deltas["click->purchase"].append(
                    (tp - tc) // 60_000_000)
        # noise: duplicate later views must not matter (firsts only)
        rows.append((u, tv + 10**12, "view"))
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string())}),
        str(tmp_path / "events.parquet"))

    got = q_funnel_step_latency(str(tmp_path)).to_pandas() \
        .set_index("step")

    for step, ds in deltas.items():
        ds = sorted(ds)
        n = len(ds)
        assert int(got.loc[step, "n_users"]) == n
        assert int(got.loc[step, "median_min"]) == ds[(n + 1) // 2 - 1]
        assert int(got.loc[step, "p90_min"]) == \
            ds[(9 * n + 10) // 10 - 1]


def test_ctx_window_census_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_ctx_window_census

    docs = [
        ("small", "one two three"),
        ("small", " ".join(["w"] * 600)),          # >= 512
        ("big", " ".join(["w"] * 1500)),           # >= 1024
        ("big", " ".join(["w"] * 5000)),           # >= 4096
    ]
    _write_docs(tmp_path, [d[0] for d in docs], [d[1] for d in docs])

    got = q_ctx_window_census(str(tmp_path)).to_pandas() \
        .set_index("source")

    assert int(got.loc["small", "n_docs"]) == 2
    assert int(got.loc["small", "n_tokens"]) == 603
    assert int(got.loc["small", "docs_ge_512"]) == 1
    assert int(got.loc["small", "tokens_over_512"]) == 600
    assert int(got.loc["big", "docs_ge_1024"]) == 2
    assert int(got.loc["big", "docs_ge_2048"]) == 1
    assert int(got.loc["big", "docs_ge_4096"]) == 1
    assert int(got.loc["big", "docs_ge_8192"]) == 0
    assert int(got.loc["big", "tokens_over_512"]) == 6500


def test_hill_tail_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_hill_tail

    rng = np.random.RandomState(79)
    # planted Pareto(alpha=2) tail over 300 customers
    rows = []
    revs = {}
    for ck in range(1, 301):
        r = round(float(100.0 * (1.0 - rng.rand()) ** (-1 / 2.0)), 2)
        revs[ck] = int(round(r * 100))
        rows.append((ck, r))
    pq.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[1] for r in rows],
                                 pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = q_hill_tail(str(tmp_path)).to_pandas().iloc[0]

    def L(v):
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    top = sorted(revs.items(), key=lambda kv: (-kv[1], kv[0]))[:101]
    xs = [c for _, c in top]
    denom = sum(L(x) - L(xs[100]) for x in xs[:100])
    assert int(got["x_threshold_cents"]) == xs[100]
    assert int(got["denom_micro"]) == denom
    assert int(got["alpha_micro"]) == 100 * 10 ** 12 // denom
    # planted alpha = 2 (Hill is noisy at k=100: wide band)
    assert 1_200_000 < int(got["alpha_micro"]) < 3_200_000


def test_gumbel_maxima_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_gumbel_maxima

    rng = np.random.RandomState(83)
    days, prices = [], []
    for d in range(140):                      # 20 weeks
        for _ in range(int(rng.randint(1, 4))):
            days.append(d)
            prices.append(round(float(rng.gumbel(1000, 120)), 2))
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            np.array([d * 86_400_000_000 for d in days], np.int64))
            .cast(pa.timestamp("us")),
        "o_totalprice": pa.array(prices, pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = q_gumbel_maxima(str(tmp_path)).to_pandas().iloc[0]

    daily = {}
    for d, p in zip(days, prices):
        daily[d] = daily.get(d, 0) + int(round(p * 100))
    weekly = {}
    for d, c in daily.items():
        weekly[d // 7] = max(weekly.get(d // 7, 0), c)
    xs = list(weekly.values())
    n, s = len(xs), sum(xs)
    q = sum(x * x for x in xs)
    v = n * q - s * s
    beta = math.sqrt(6.0 * float(v) / float(n * (n - 1))) / math.pi
    mu = float(s) / float(n) - 0.5772156649015329 * beta
    assert int(got["n_weeks"]) == n
    assert int(got["max_cents"]) == max(xs)
    assert abs(float(got["beta"]) - beta) < 1e-3
    assert abs(float(got["mu"]) - mu) < 1e-3


def test_split3_census_matches_bruteforce(ray_session, tmp_path):
    import hashlib

    from kgforge.pipelines.driver_queries import q_split3_census

    rng = np.random.RandomState(89)
    ids = list(range(1, 400))
    langs = [str(rng.choice(["en", "zh", "de"])) for _ in ids]
    chars = [int(rng.randint(10, 5000)) for _ in ids]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(langs, pa.string()),
        "n_chars": pa.array(chars, pa.int64())}),
        str(tmp_path / "documents.parquet"))

    got = q_split3_census(str(tmp_path)).to_pandas()
    got_d = {(r["split"], r["lang"]): (int(r["n_docs"]),
                                       int(r["n_chars"]))
             for _, r in got.iterrows()}

    exp: dict = {}
    for i, lg, ch in zip(ids, langs, chars):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) \
            % 100
        sp = "train" if b < 80 else ("val" if b < 90 else "test")
        n, c = exp.get((sp, lg), (0, 0))
        exp[(sp, lg)] = (n + 1, c + ch)
    assert got_d == exp
    # all three splits materialized
    assert {s for s, _ in got_d} == {"train", "val", "test"}


def test_log_rank_test_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_log_rank_test

    rng = np.random.RandomState(97)
    rows, eid = [], 0
    users = []  # (grp, dur)
    for u in range(120):
        first = "click" if u % 2 == 0 else "view"
        t0 = int(rng.randint(0, 10**6)) * 1_000_000
        # planted: clicks return much sooner than views
        dur_days = int(rng.randint(0, 5)) if first == "click" \
            else int(rng.randint(5, 30))
        rows.append((eid, u, t0, first))
        eid += 1
        rows.append((eid, u, t0 + dur_days * 86_400_000_000
                     + 1_000_000, "purchase"))
        eid += 1
        users.append((first, dur_days))
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[2] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string())}),
        str(tmp_path / "events.parquet"))

    got = q_log_rank_test(str(tmp_path)).to_pandas().iloc[0]

    h1: dict = {}
    h2: dict = {}
    for g, d in users:
        (h1 if g == "click" else h2)[d] = \
            (h1 if g == "click" else h2).get(d, 0) + 1
    n1, n2 = sum(h1.values()), sum(h2.values())
    o1s = e1s = vs = 0
    for d in sorted(set(h1) | set(h2)):
        o1, o2 = h1.get(d, 0), h2.get(d, 0)
        o, nn = o1 + o2, n1 + n2
        o1s += o1
        e1s += n1 * o * 1_000_000 // nn
        if nn > 1:
            vs += n1 * n2 * o * (nn - o) * 1_000_000 \
                // (nn * nn * (nn - 1))
        n1 -= o1
        n2 -= o2
    diff = o1s * 1_000_000 - e1s
    assert int(got["o1"]) == o1s
    assert int(got["e1_micro"]) == e1s
    assert int(got["var_micro"]) == vs
    assert int(got["z2_micro"]) == diff * diff // vs
    # planted separation is decisive (chi2_1 > 30)
    assert int(got["z2_micro"]) > 30_000_000


def test_quant_error_curve_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_quant_error_curve

    rng = np.random.RandomState(101)
    n, d = 50, 6
    vecs = [[round(float(x), 6) for x in rng.uniform(-1, 1, d)]
            for _ in range(n)]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))

    got = q_quant_error_curve(str(tmp_path)).to_pandas() \
        .set_index("bits")

    raw = [np.array(v, np.float64) for v in pq.read_table(
        str(tmp_path / "embeddings.parquet"))["embedding"]
        .to_pylist()]
    flat = np.concatenate(raw)

    def ra(x):
        return np.sign(x) * np.floor(np.abs(x) + 0.5)

    q = ra(flat * 1_000_000).astype(np.int64)
    for bits in (2, 4, 6, 8):
        lv = (1 << bits) - 1
        code = np.clip(ra((q + 1_000_000).astype(np.float64) * lv
                          / 2_000_000), 0, lv).astype(np.int64)
        recon = ra(code.astype(np.float64) * 2_000_000
                   / lv).astype(np.int64) - 1_000_000
        sse = int(((q - recon) ** 2).sum())
        assert int(got.loc[bits, "sse_micro2"]) == sse
        assert int(got.loc[bits, "mse_micro2"]) == sse // len(q)
    # monotone: more bits, less error
    e = got["sse_micro2"].to_numpy()
    assert (e[1:] < e[:-1]).all()


def test_fisher_ratio_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_fisher_ratio

    rng = np.random.RandomState(103)
    n, d = 90, 6
    labels = np.array([i % 3 for i in range(n)], np.int32)
    pts = rng.randn(n, d) * 0.05
    pts[labels == 1, 0] += 2.0        # planted separation on dim 0
    pts[labels == 2, 1] += 2.0
    vecs = [[round(float(x), 6) for x in row] for row in pts]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}),
        str(tmp_path / "embeddings.parquet"))

    got = q_fisher_ratio(str(tmp_path)).to_pandas().iloc[0]

    raw = [np.array(v, np.float64) for v in pq.read_table(
        str(tmp_path / "embeddings.parquet"))["embedding"]
        .to_pylist()]
    q = np.array([np.sign(v) * np.floor(np.abs(v) * 1_000_000 + 0.5)
                  for v in raw]).astype(np.int64)
    s_tot = q.sum(axis=0)
    sw = sb = 0
    for lv in (0, 1, 2):
        m = labels == lv
        qs = q[m]
        n_c = int(m.sum())
        s_c = qs.sum(axis=0)
        q_c = int((qs * qs).sum())
        sw += (q_c * n_c - int((s_c * s_c).sum())) // n_c
        sb += sum((int(a) * n - int(g) * n_c) ** 2
                  for a, g in zip(s_c, s_tot)) // (n_c * n * n)
    assert int(got["sw_micro2"]) == sw
    assert int(got["sb_micro2"]) == sb
    assert int(got["fisher_micro"]) == sb * 1_000_000 // sw
    # planted separation: between-scatter dominates within-scatter
    assert int(got["fisher_micro"]) > 10_000_000


def test_round_price_bias_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_round_price_bias

    prices = [10.00, 25.00, 3.50, 7.99, 8.99, 12.34, 99.99, 5.00]
    pq.write_table(pa.table({
        "o_totalprice": pa.array(prices, pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = q_round_price_bias(str(tmp_path)).to_pandas() \
        .set_index("ending")

    assert int(got.loc["00", "n_orders"]) == 3
    assert int(got.loc["50", "n_orders"]) == 1
    assert int(got.loc["99", "n_orders"]) == 3
    assert int(got.loc["other", "n_orders"]) == 1
    assert int(got.loc["00", "share_ppm"]) == 3 * 1_000_000 // 8


def test_price_dispersion_topk_matches_bruteforce(ray_session,
                                                  tmp_path):
    from kgforge.pipelines.driver_queries import (
        q_price_dispersion_topk,
    )

    rng = np.random.RandomState(107)
    pks, exts, qtys = [], [], []
    units = {}
    for pk in range(1, 40):
        # part 1 has a planted 10x price outlier
        base = 50.0
        for i in range(8):
            u = base * (10.0 if (pk == 1 and i == 0) else 1.0) \
                * (1 + 0.01 * float(rng.rand()))
            q = float(rng.randint(1, 5))
            pks.append(pk)
            qtys.append(q)
            exts.append(round(u * q, 2))
            units.setdefault(pk, []).append(
                int(np.floor(abs(exts[-1] * 100.0 / q) + 0.5)))
    pq.write_table(pa.table({
        "l_partkey": pa.array(pks, pa.int64()),
        "l_extendedprice": pa.array(exts, pa.float64()),
        "l_quantity": pa.array(qtys, pa.float64())}),
        str(tmp_path / "lineitem.parquet"))

    got = q_price_dispersion_topk(str(tmp_path)).to_pandas()

    exp = []
    for pk, us in units.items():
        n, s = len(us), sum(us)
        q = sum(u * u for u in us)
        if n >= 5:
            exp.append((n * (n * q - s * s) * 1_000_000
                        // ((n - 1) * s * s), -pk, pk, n))
    exp.sort(key=lambda x: (-x[0], x[2]))
    assert int(got.iloc[0]["l_partkey"]) == 1     # planted outlier
    for i in range(min(20, len(exp))):
        assert int(got.iloc[i]["l_partkey"]) == exp[i][2]
        assert int(got.iloc[i]["cv2_ppm"]) == exp[i][0]
        assert int(got.iloc[i]["n_lines"]) == exp[i][3]


def test_nonascii_census_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_nonascii_census

    docs = [("ascii", "plain text 123"),
            ("noisy", "café naïve 日本"),
            ("noisy", "pure ascii here")]
    _write_docs(tmp_path, [d[0] for d in docs], [d[1] for d in docs])

    got = q_nonascii_census(str(tmp_path)).to_pandas() \
        .set_index("source")

    for src in ("ascii", "noisy"):
        txts = [t for s, t in docs if s == src]
        ch = sum(len(t) for t in txts)
        na = sum(1 for t in txts for c in t
                 if not (0x20 <= ord(c) <= 0x7E))
        assert int(got.loc[src, "n_chars"]) == ch
        assert int(got.loc[src, "n_nonascii"]) == na
        assert int(got.loc[src, "nonascii_ppm"]) == \
            na * 1_000_000 // ch
    assert int(got.loc["ascii", "n_nonascii"]) == 0


def test_discount_lift_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_discount_lift

    rng = np.random.RandomState(109)
    rows = []
    for _ in range(200):
        d = float(rng.choice([0.0, 0.05, 0.10]))
        # planted lift: bigger discount, bigger qty
        q = float(rng.randint(1, 10)) + d * 100
        e = round(q * 50.0, 2)
        rows.append((d, q, e))
    pq.write_table(pa.table({
        "l_discount": pa.array([r[0] for r in rows], pa.float64()),
        "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in rows],
                                    pa.float64())}),
        str(tmp_path / "lineitem.parquet"))

    got = q_discount_lift(str(tmp_path)).to_pandas() \
        .set_index("discount_band")

    acc: dict = {}
    for d, q, e in rows:
        band = int(round(d * 100))
        rev = int(np.floor(abs(e * (1.0 - d) * 100) + 0.5))
        n, sq, r = acc.get(band, (0, 0, 0))
        acc[band] = (n + 1, sq + int(round(q)), r + rev)
    tot = sum(v[2] for v in acc.values())
    for band, (n, sq, r) in acc.items():
        assert int(got.loc[band, "n_lines"]) == n
        assert int(got.loc[band, "mean_qty_ppm"]) == \
            sq * 1_000_000 // n
        assert int(got.loc[band, "rev_cents"]) == r
        assert int(got.loc[band, "rev_share_ppm"]) == \
            r * 1_000_000 // tot
    assert int(got.loc[10, "mean_qty_ppm"]) > \
        int(got.loc[0, "mean_qty_ppm"]) + 8_000_000


def test_vocab_overlap_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_vocab_overlap

    texts = {"a": "x y z shared words here",
             "b": "x y z shared other tokens",
             "c": "totally different vocabulary set"}
    srcs = sorted(texts)
    _write_docs(tmp_path, srcs, [texts[s] for s in srcs])

    got = q_vocab_overlap(str(tmp_path)).to_pandas() \
        .set_index(["src_a", "src_b"])

    import itertools

    sets = {s: set(t.split()) for s, t in texts.items()}
    for x, y in itertools.combinations(srcs, 2):
        inter = len(sets[x] & sets[y])
        mn = min(len(sets[x]), len(sets[y]))
        assert int(got.loc[(x, y), "n_common"]) == inter
        assert int(got.loc[(x, y), "types_a"]) == len(sets[x])
        assert int(got.loc[(x, y), "overlap_ppm"]) == \
            inter * 1_000_000 // mn
    assert int(got.loc[("a", "c"), "n_common"]) == 0
    assert int(got.loc[("a", "b"), "overlap_ppm"]) > 600_000


def test_dup_cluster_sources_matches_bruteforce(ray_session,
                                                tmp_path):
    from kgforge.pipelines.driver_queries import q_dup_cluster_sources

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    docs = [
        # cluster 1: 3 near-dups across 2 sources
        ("s1", base + " v1"), ("s1", base + " v2"),
        ("s2", base + " v3"),
        # cluster 2: 2 near-dups in one source
        ("s3", "completely different shared text block alpha beta "
               "gamma delta epsilon zeta eta theta iota kappa x"),
        ("s3", "completely different shared text block alpha beta "
               "gamma delta epsilon zeta eta theta iota kappa y"),
        # singletons (no pairs)
        ("s1", "unique text one with nothing in common at all here"),
        ("s2", "another disjoint document about entirely other "
               "things"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "source": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array([d[1] for d in docs], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = q_dup_cluster_sources(str(tmp_path)).to_pandas() \
        .set_index("n_sources")

    # cluster 1 spans 2 sources (3 docs); cluster 2 spans 1 (2 docs)
    assert int(got.loc[2, "n_clusters"]) == 1
    assert int(got.loc[2, "n_docs"]) == 3
    assert int(got.loc[1, "n_clusters"]) == 1
    assert int(got.loc[1, "n_docs"]) == 2


def test_type_hour_jsd_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_type_hour_jsd

    rng = np.random.RandomState(113)
    hours, types = [], []
    for _ in range(400):
        r = rng.rand()
        if r < 0.4:
            types.append("night_a")
            hours.append(int(rng.randint(0, 4)))
        elif r < 0.8:
            types.append("night_b")
            hours.append(int(rng.randint(0, 4)))
        else:
            types.append("day")
            hours.append(int(rng.randint(10, 18)))
    _write_events(tmp_path, hours, types)

    got = q_type_hour_jsd(str(tmp_path)).to_pandas() \
        .set_index(["type_a", "type_b"])

    def L(x):
        return int(math.floor(math.log(x) * 1_000_000 + 0.5))

    def sdiv(a, b):
        return a // b if a >= 0 else -((-a) // b)

    import itertools

    prof: dict = {}
    for h, t in zip(hours, types):
        prof.setdefault(t, {})[h] = prof.setdefault(t, {}).get(h,
                                                               0) + 1
    for x, y in itertools.combinations(sorted(prof), 2):
        A = sum(prof[x].values())
        B = sum(prof[y].values())
        sa = sb = 0
        for h in set(prof[x]) | set(prof[y]):
            a = prof[x].get(h, 0)
            b = prof[y].get(h, 0)
            mix = a * B + b * A
            if a:
                sa += a * (L(2 * a * B) - L(mix))
            if b:
                sb += b * (L(2 * b * A) - L(mix))
        assert int(got.loc[(x, y), "jsd_micro"]) == \
            sdiv(sa, 2 * A) + sdiv(sb, 2 * B)
    # same rhythm ≈ 0; disjoint rhythms ≈ ln 2
    assert abs(int(got.loc[("night_a", "night_b"),
                           "jsd_micro"])) < 30_000
    assert int(got.loc[("day", "night_a"), "jsd_micro"]) > 650_000


def test_dedup_threshold_curve_matches_bruteforce(ray_session,
                                                  tmp_path):
    from kgforge.pipelines.driver_queries import (
        q_dedup_threshold_curve,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau")
    docs = [
        ("s", base),            # near-identical SAME-LENGTH pair
        ("s", base[:-1] + "u"),
        ("s", base[: len(base) // 2]
         + " totally different second half of the document here"),
        ("s", "unrelated text with nothing shared at all among any"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "source": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array([d[1] for d in docs], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = q_dedup_threshold_curve(str(tmp_path)).to_pandas() \
        .set_index("threshold_pct")

    # monotone non-increasing in threshold; top pair survives 80%
    ns = [int(got.loc[t, "n_pairs"]) for t in (20, 40, 60, 80)]
    assert ns[0] >= ns[1] >= ns[2] >= ns[3]
    assert ns[3] >= 1


def test_lang_script_check_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_lang_script_check

    rows = [("zh", "这是中文文本"), ("zh", "mislabeled ascii only"),
            ("en", "plain english"), ("en", "english with 汉字 mixed")]
    pq.write_table(pa.table({
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = q_lang_script_check(str(tmp_path)).to_pandas() \
        .set_index("lang")

    assert int(got.loc["zh", "n_docs"]) == 2
    assert int(got.loc["zh", "n_with_han"]) == 1
    assert int(got.loc["zh", "han_ppm"]) == 500_000
    assert int(got.loc["en", "n_with_han"]) == 1


def test_order_width_dist_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_order_width_dist

    rng = np.random.RandomState(127)
    oks = []
    expected: dict = {}
    for ok in range(1, 60):
        w = int(rng.randint(1, 8))
        expected[w] = expected.get(w, 0) + 1
        oks.extend([ok] * w)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(oks, pa.int64())}),
        str(tmp_path / "lineitem.parquet"))

    got = q_order_width_dist(str(tmp_path)).to_pandas()
    got_d = dict(zip(got["n_lines"].astype(int),
                     got["n_orders"].astype(int)))
    assert got_d == expected


def test_customer_rev_deciles_matches_bruteforce(ray_session,
                                                 tmp_path):
    from kgforge.pipelines.driver_queries import q_customer_rev_deciles

    rng = np.random.RandomState(131)
    rows = []
    rev = {}
    for ck in range(1, 74):          # 73 customers: uneven deciles
        for _ in range(int(rng.randint(1, 4))):
            p = round(float(rng.uniform(10, 5000)), 2)
            rows.append((ck, p))
            rev[ck] = rev.get(ck, 0) + int(round(p * 100))
    pq.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[1] for r in rows],
                                 pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = q_customer_rev_deciles(str(tmp_path)).to_pandas() \
        .set_index("decile")

    order = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(order)
    tot = sum(rev.values())
    exp: dict = {}
    for rank, (_, c) in enumerate(order):
        d = rank * 10 // n
        en, es = exp.get(d, (0, 0))
        exp[d] = (en + 1, es + c)
    for d, (en, es) in exp.items():
        assert int(got.loc[d, "n_customers"]) == en
        assert int(got.loc[d, "rev_cents"]) == es
        assert int(got.loc[d, "share_ppm"]) == es * 1_000_000 // tot
    # whale curve: top decile out-earns bottom decile
    assert int(got.loc[0, "rev_cents"]) > int(got.loc[9, "rev_cents"])


def test_supplier_debt_census_matches_bruteforce(ray_session,
                                                 tmp_path):
    from kgforge.pipelines.driver_queries import q_supplier_debt_census

    bals = [(0, 100.50), (0, -20.25), (0, -5.00), (1, 999.99)]
    pq.write_table(pa.table({
        "s_nationkey": pa.array([b[0] for b in bals], pa.int32()),
        "s_acctbal": pa.array([b[1] for b in bals], pa.float64())}),
        str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["DEBTLAND", "RICHLAND"], pa.string())}),
        str(tmp_path / "nation.parquet"))

    got = q_supplier_debt_census(str(tmp_path)).to_pandas() \
        .set_index("n_name")

    assert int(got.loc["DEBTLAND", "n_suppliers"]) == 3
    assert int(got.loc["DEBTLAND", "n_negative"]) == 2
    assert int(got.loc["DEBTLAND", "negative_ppm"]) == \
        2 * 1_000_000 // 3
    assert int(got.loc["DEBTLAND", "debt_cents"]) == 2025 + 500
    assert int(got.loc["RICHLAND", "n_negative"]) == 0


def test_knn_mutual_and_indegree_match_bruteforce(ray_session,
                                                  tmp_path):
    from kgforge.pipelines.driver_queries import (
        q_knn_indegree_dist, q_knn_mutual_rate,
    )

    rng = np.random.RandomState(137)
    n, d = 40, 8
    pts = rng.randn(n, d)
    vecs = [[round(float(x), 6) for x in row] for row in pts]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))

    mut = q_knn_mutual_rate(str(tmp_path)).to_pandas().iloc[0]
    deg = q_knn_indegree_dist(str(tmp_path)).to_pandas()

    # brute-force cosine kNN on the read-back float32 values
    raw = np.array([np.array(v, np.float64) for v in pq.read_table(
        str(tmp_path / "embeddings.parquet"))["embedding"]
        .to_pylist()])
    U = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    S = U @ U.T
    np.fill_diagonal(S, -np.inf)
    edges = set()
    for i in range(n):
        order = sorted(range(n), key=lambda j: (-S[i, j], j))[:3]
        for j in order:
            edges.add((i, j))
    mutual = sum(1 for (a, b) in edges if (b, a) in edges)
    assert int(mut["n_edges"]) == len(edges)
    assert int(mut["n_mutual"]) == mutual
    assert int(mut["mutual_ppm"]) == mutual * 1_000_000 // len(edges)
    indeg: dict = {}
    for _, b in edges:
        indeg[b] = indeg.get(b, 0) + 1
    hist: dict = {}
    for i in range(n):
        k = indeg.get(i, 0)
        hist[k] = hist.get(k, 0) + 1
    hist = {k: v for k, v in hist.items() if v > 0}
    got_d = dict(zip(deg["indegree"].astype(int),
                     deg["n_points"].astype(int)))
    assert got_d == hist


def test_order_status_mix_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_order_status_mix

    rng = np.random.RandomState(139)
    rows = []
    for _ in range(300):
        yr = int(rng.choice([1995, 1996]))
        st = str(rng.choice(["O", "F", "P"]))
        day = (yr - 1970) * 365 + int(rng.randint(0, 360))
        rows.append((day * 86_400_000_000, st))
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            np.array([r[0] for r in rows], np.int64))
            .cast(pa.timestamp("us")),
        "o_orderstatus": pa.array([r[1] for r in rows],
                                  pa.string())}),
        str(tmp_path / "orders.parquet"))

    got = q_order_status_mix(str(tmp_path)).to_pandas()

    import datetime

    exp: dict = {}
    ytot: dict = {}
    for us, st in rows:
        yr = datetime.datetime.utcfromtimestamp(us // 10**6).year
        exp[(yr, st)] = exp.get((yr, st), 0) + 1
        ytot[yr] = ytot.get(yr, 0) + 1
    got_d = {(int(r["order_year"]), r["o_orderstatus"]):
             (int(r["n_orders"]), int(r["share_ppm"]))
             for _, r in got.iterrows()}
    for (yr, st), n in exp.items():
        assert got_d[(yr, st)] == (n, n * 1_000_000 // ytot[yr])


def test_part_type_price_premium_matches_bruteforce(ray_session,
                                                    tmp_path):
    from kgforge.pipelines.driver_queries import (
        q_part_type_price_premium,
    )

    rows = [("luxury", 1000.00)] * 5 + [("budget", 10.00)] * 15
    pq.write_table(pa.table({
        "p_type": pa.array([r[0] for r in rows], pa.string()),
        "p_retailprice": pa.array([r[1] for r in rows],
                                  pa.float64())}),
        str(tmp_path / "part.parquet"))

    got = q_part_type_price_premium(str(tmp_path)).to_pandas() \
        .set_index("p_type")

    n_tot, s_tot = 20, 5 * 100000 + 15 * 1000
    for pt, s, n in (("luxury", 500000, 5), ("budget", 15000, 15)):
        num = s * n_tot - s_tot * n
        prem = (num * 1_000_000) // (s_tot * n) if num >= 0 else \
            -((-num * 1_000_000) // (s_tot * n))
        assert int(got.loc[pt, "premium_ppm"]) == prem
        assert int(got.loc[pt, "sum_cents"]) == s
    assert int(got.loc["luxury", "premium_ppm"]) > 2_000_000
    assert int(got.loc["budget", "premium_ppm"]) < -900_000


def test_error_rate_hourly_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_error_rate_hourly

    # planted: hour 3 is the deploy hour with 50% errors
    hours, types = [], []
    for h in (3, 3, 3, 3, 10, 10, 10, 10):
        for i in range(10):
            hours.append(h)
            types.append("error" if (h == 3 and i < 5) else "view")
    _write_events(tmp_path, hours, types)

    got = q_error_rate_hourly(str(tmp_path)).to_pandas() \
        .set_index("hour")

    assert int(got.loc[3, "n_events"]) == 40
    assert int(got.loc[3, "n_errors"]) == 20
    assert int(got.loc[3, "error_ppm"]) == 500_000
    assert int(got.loc[10, "n_errors"]) == 0


def test_empty_doc_census_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_empty_doc_census

    docs = [("dirty", ""), ("dirty", "   \t\n "), ("dirty", "tiny"),
            ("dirty", "this one is long enough to pass the gate ok"),
            ("clean", "a perfectly reasonable document body here")]
    _write_docs(tmp_path, [d[0] for d in docs], [d[1] for d in docs])

    got = q_empty_doc_census(str(tmp_path)).to_pandas() \
        .set_index("source")

    assert int(got.loc["dirty", "n_docs"]) == 4
    assert int(got.loc["dirty", "n_empty"]) == 2
    assert int(got.loc["dirty", "n_tiny"]) == 1
    assert int(got.loc["dirty", "bad_ppm"]) == 3 * 1_000_000 // 4
    assert int(got.loc["clean", "n_empty"]) == 0
    assert int(got.loc["clean", "bad_ppm"]) == 0
