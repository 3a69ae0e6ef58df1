"""Round-5 session-B operators: BM25 retrieval, global-threshold
part selection, chi-squared independence cells, exact integer-moment
correlation, and bounded-domain weighted median — each against an
independent brute-force oracle."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_bm25_topk_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.indexing import bm25_topk_ds

    rng = np.random.RandomState(7)
    vocab = ["alpha", "beta", "gamma", "delta", "key", "sort", "table"]
    texts, dls = [], []
    for _ in range(60):
        n = rng.randint(3, 30)
        words = [vocab[rng.randint(len(vocab))] for _ in range(n)]
        t = " ".join(words)
        texts.append(t)
        dls.append(len(t))
    tbl = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                    "text": pa.array(texts),
                    "n_chars": pa.array(dls, pa.int64())})
    terms = ("key", "table", "sort")
    n_docs, sum_dl = 60, sum(dls)
    got = bm25_topk_ds(rd.from_arrow(tbl).repartition(5), terms,
                       n_docs=n_docs, sum_dl=sum_dl, k=10)

    # brute force, identical formula in identical slot order
    k1, b = 1.2, 0.75
    avgdl = float(sum_dl) / float(n_docs)
    slots = sorted(set(terms))
    tfs = [{t: doc.split().count(t) for t in slots} for doc in texts]
    dfs = {t: sum(1 for tf in tfs if tf[t] > 0) for t in slots}
    rows = []
    for i, doc in enumerate(texts):
        s, nt = 0.0, 0
        for t in slots:
            tf = float(tfs[i][t])
            if tf == 0:
                s = s + 0.0
                continue
            idf = math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5)
                           + 1.0)
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * dls[i] / avgdl))
            nt += 1
        if nt:
            rows.append((i, round(s, 4), nt))
    rows.sort(key=lambda r: (-r[1], r[0]))
    exp = rows[:10]
    got_rows = list(zip(got["doc_id"], got["score"], got["n_terms"]))
    assert len(got_rows) == len(exp)
    for (gd, gs, gn), (ed, es, en) in zip(got_rows, exp):
        assert gd == ed and gn == en
        assert abs(gs - es) < 1e-9


def _write_lineitem(tmp_path, n=400, seed=11):
    rng = np.random.RandomState(seed)
    tbl = pa.table({
        "l_orderkey": pa.array(rng.randint(1, 50, n).astype(np.int64)),
        "l_partkey": pa.array(rng.randint(1, 20, n).astype(np.int64)),
        "l_suppkey": pa.array(rng.randint(1, 10, n).astype(np.int64)),
        "l_linenumber": pa.array(np.arange(n, dtype=np.int64)),
        "l_quantity": pa.array(rng.randint(1, 50, n).astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(10, 5000, n), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n), 2)),
        "l_returnflag": pa.array(
            [("A", "N", "R")[i % 3] for i in range(n)]),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(
            np.full(n, 1_600_000_000_000_000), pa.timestamp("us")),
    })
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    return tbl


def test_important_parts_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_important_parts

    tbl = _write_lineitem(tmp_path)
    got = q_important_parts(str(tmp_path))

    cents = np.round(tbl["l_extendedprice"].to_numpy() * 100) \
        .astype(np.int64)
    parts = tbl["l_partkey"].to_numpy()
    pv = pd.DataFrame({"p": parts, "v": cents}).groupby("p")["v"] \
        .sum()
    total, n_parts = int(pv.sum()), len(pv)
    exp = {int(p): int(v) for p, v in pv.items()
           if int(v) * 2 * n_parts > 3 * total}
    assert {int(p): int(v) for p, v in
            zip(got["p_partkey"], got["value_cents"])} == exp
    assert len(exp) > 0


def test_numeric_corr_matches_numpy(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_numeric_corr

    tbl = _write_lineitem(tmp_path, n=600, seed=5)
    got = q_numeric_corr(str(tmp_path)).set_index(["col_a", "col_b"])

    q = np.rint(tbl["l_quantity"].to_numpy()).astype(np.int64)
    e = np.round(tbl["l_extendedprice"].to_numpy() * 100) \
        .astype(np.int64)
    d = np.round(tbl["l_discount"].to_numpy() * 100).astype(np.int64)
    t = np.round(tbl["l_tax"].to_numpy() * 100).astype(np.int64)
    vs = {"quantity": q, "extendedprice": e, "discount": d, "tax": t}
    names = list(vs)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            exp = np.corrcoef(vs[a].astype(np.float64),
                              vs[b].astype(np.float64))[0, 1]
            assert abs(got.loc[(a, b), "corr"] - exp) < 1e-5
            assert got.loc[(a, b), "n"] == len(q)


def test_weighted_median_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_weighted_median

    tbl = _write_lineitem(tmp_path, n=500, seed=3)
    got = q_weighted_median(str(tmp_path)).set_index("l_returnflag")

    q = np.rint(tbl["l_quantity"].to_numpy()).astype(np.int64)
    w = np.round(tbl["l_extendedprice"].to_numpy() * 100) \
        .astype(np.int64)
    f = tbl["l_returnflag"].to_pylist()
    df = pd.DataFrame({"f": f, "q": q, "w": w})
    for flag, g in df.groupby("f"):
        hist = g.groupby("q")["w"].sum().sort_index()
        cw = hist.cumsum()
        tot = int(cw.iloc[-1])
        med = int(hist.index[np.argmax(2 * cw.to_numpy() >= tot)])
        assert got.loc[flag, "median_qty"] == med
        assert got.loc[flag, "total_weight"] == tot


def test_type_hour_chi2_matches_bruteforce(ray_session, tmp_path):
    from kgforge.pipelines.driver_queries import q_type_hour_chi2

    rng = np.random.RandomState(9)
    n = 300
    base = 1_699_920_000_000_000        # 19675 * 86400 s — midnight UTC
    hours = rng.randint(0, 4, n)
    ts = base + hours * 3_600_000_000
    types = [("click", "view")[i % 2] for i in range(n)]
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n)})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = q_type_hour_chi2(str(tmp_path)) \
        .set_index(["event_type", "hour"])

    df = pd.DataFrame({"t": types, "h": hours % 24})
    cells = df.groupby(["t", "h"]).size()
    rm = df.groupby("t").size()
    cm = df.groupby("h").size()
    for (t, h), o in cells.items():
        e = rm[t] * cm[h] / float(n)
        chi = (o - e) ** 2 / e
        row = got.loc[(t, int(h))]
        assert row["observed"] == o
        assert row["row_total"] == rm[t] and row["col_total"] == cm[h]
        assert abs(row["chi2_cell"] - chi) < 1e-6
