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
