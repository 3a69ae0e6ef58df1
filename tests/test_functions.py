"""Unit tests for the training-data ops (kgforge.functions.*):
dedup correctness vs brute force, similarity-search exactness, text
stats vs straightforward recomputation, multimodal plumbing."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from kgforge.functions import dedup as D
from kgforge.functions import simsearch as S
from kgforge.functions import textstats as T


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",          # exact dup
        "The quick brown fox jumps over the lazy dog!",         # norm dup
        "the quick brown fox leaps over the lazy dog",          # near dup
        "completely different content about data pipelines",
        "another unrelated document with its own words",
        "",                                                      # empty
    ]
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(["s0"] * len(texts), pa.string()),
    })
    return rd.from_arrow(tbl).repartition(3)


def test_exact_dedup(docs_ds):
    out = D.exact_dedup_ds(docs_ds).to_pandas()
    dup = out[out.n_dups > 1]
    assert len(dup) == 1
    assert dup.iloc[0].n_dups == 2 and dup.iloc[0].keep_id == 0


def test_normalized_dedup(docs_ds):
    out = D.normalized_dedup_ds(docs_ds).to_pandas()
    dup = out[out.n_dups > 1]
    # rows 0, 1, 2 normalize to the same text
    assert len(dup) == 1 and dup.iloc[0].n_dups == 3


def test_normalize_text_semantics():
    assert D.normalize_text("  The  QUICK, fox!  ") == "the quick fox"
    assert D.normalize_text("") == ""


def test_minhash_pairs_finds_near_dups(docs_ds):
    pairs = D.minhash_dedup_pairs_ds(docs_ds, theta=0.5).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (0, 1) in got            # exact dup certainly collides
    # near-dup (0,3): single-word change at shingle_n=5 keeps most
    # shingles — estimated jaccard should clear 0.5
    assert (0, 3) in got or (1, 3) in got


def test_simhash_exact_dups_zero_distance(docs_ds):
    pairs = D.simhash_pairs_ds(docs_ds, max_hamming=3).to_pandas()
    z = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]
    assert len(z) == 1 and z.iloc[0].hamming == 0


def test_jaccard_blocked_matches_bruteforce(docs_ds):
    out = D.jaccard_blocked_pairs_ds(
        docs_ds, block_cols=("source",), theta=0.2).to_pandas()
    texts = {r["doc_id"]: r["text"] for r in docs_ds.take_all()}

    def sh(t):
        return ({t[i:i + 5] for i in range(len(t) - 4)} if len(t) >= 5
                else ({t} if t else set()))

    for _, row in out.iterrows():
        sa, sb = sh(texts[row.id_a]), sh(texts[row.id_b])
        expect = len(sa & sb) / len(sa | sb)
        assert abs(row.jaccard - expect) < 1e-3


def test_simhash64_deterministic():
    a = D.simhash64("hello world foo bar")
    assert a == D.simhash64("hello world foo bar")
    assert a != D.simhash64("entirely different words here")


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(7)
    base = rng.standard_normal((40, 16))
    # near-duplicates: 0/1 and 2/3 (cross-label), 0/4 (same label 0)
    base[1] = base[0] + rng.standard_normal(16) * 0.01
    base[3] = base[2] + rng.standard_normal(16) * 0.01
    base[4] = base[0] + rng.standard_normal(16) * 0.01
    tbl = pa.table({
        "vec_id": pa.array(list(range(40)), pa.int64()),
        "label": pa.array([i % 4 for i in range(40)], pa.int32()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(tbl).repartition(4), base


def test_embedding_blocked_pairs(emb_ds):
    ds, base = emb_ds
    out = D.embedding_dup_pairs_ds(ds, tau=0.99).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(out.id_a, out.id_b)}
    # only same-label pairs are visible to the blocked variant:
    # (0, 4) share label 0; cross-label near-dups (0,1), (2,3) are not
    assert (0, 4) in got
    u = base / np.linalg.norm(base, axis=1, keepdims=True)
    for a, b in got:
        assert float(u[a] @ u[b]) >= 0.99 - 1e-9


def test_embedding_lsh_finds_near_dups(emb_ds):
    ds, base = emb_ds
    out = D.embedding_lsh_pairs_ds(ds, tau=0.99, dim=16).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(out.id_a, out.id_b)}
    assert (0, 1) in got and (2, 3) in got


def test_knn_brute_matches_numpy(emb_ds):
    ds, base = emb_ds
    out = S.knn_brute_ds(ds, query_ids=[0, 5], k=3).to_pandas()
    u = base / np.linalg.norm(base, axis=1, keepdims=True)
    for q in (0, 5):
        sims = u @ u[q]
        sims[q] = -np.inf
        expect = list(np.argsort(-sims)[:3])
        got = list(out[out.query_id == q].sort_values("rank").neighbor_id)
        assert got == expect


def test_knn_ivf_reasonable_recall(emb_ds):
    ds, base = emb_ds
    exact = S.knn_brute_ds(ds, query_ids=[0], k=3).to_pandas()
    approx = S.knn_ivf_ds(ds, query_ids=[0], k=3, n_centroids=4,
                          nprobe=4, sample_n=40).to_pandas()
    # nprobe == n_centroids → searches everything → exact
    assert list(approx.neighbor_id) == list(exact.neighbor_id)


def test_token_stats_counts(docs_ds):
    out = T.token_stats_ds(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[0].n_tokens == 9
    assert out.loc[6].n_tokens == 0
    assert out.loc[2].n_punct == 1          # the "!"


def test_fingerprint_matches_hashlib(docs_ds):
    out = T.fingerprint_ds(docs_ds).to_pandas().set_index("doc_id")
    texts = {r["doc_id"]: r["text"] for r in docs_ds.take_all()}
    for d, t in texts.items():
        assert out.loc[d].fp_md5 == hashlib.md5(t.encode()).hexdigest()
    # rolling hash: deterministic + content-sensitive
    assert out.loc[0].fp_rolling == out.loc[1].fp_rolling
    assert out.loc[0].fp_rolling != out.loc[4].fp_rolling


def test_lang_id_heuristic(docs_ds):
    out = T.lang_id_ds(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[0].pred_lang == "en"     # has "the"
    assert out.loc[6].pred_lang == "unk"    # empty


def test_media_decoder_plumbing(ray_session):
    import ray.data as rd

    from kgforge.functions.multimodal import (
        FrameSampler, MediaDecoder, fake_decode_meta, media_features_ds,
    )

    spans = pa.table({
        "doc_id": pa.array(["d1", "d1", "d2"], pa.string()),
        "span_idx": pa.array([0, 1, 0], pa.int32()),
        "kind": pa.array(["text", "image", "video"], pa.string()),
        "media_ref": pa.array(["", "media://image/000001",
                               "media://video/000002"], pa.string()),
    })
    ds = rd.from_arrow(spans)
    feats = media_features_ds(ds).to_pandas()
    assert len(feats) == 2                       # text span dropped
    img = feats[feats.kind == "image"].iloc[0]
    assert (img.width, img.height) == (256 + 20 % 64, 144 + 20 % 32)
    frames = ds.map_batches(FrameSampler, batch_format="pyarrow",
                            concurrency=1).to_pandas()
    dur = fake_decode_meta("video", "media://video/000002")[2]
    assert len(frames) == dur // 1000
    # real mode is an explicit stub
    dec = MediaDecoder(mode="real")
    with pytest.raises(NotImplementedError):
        dec(spans)


def test_sessionize(ray_session):
    import datetime as dt

    import ray.data as rd

    base = dt.datetime(2024, 1, 1)
    rows = [{"user_id": 1, "ts": base},
            {"user_id": 1, "ts": base + dt.timedelta(minutes=10)},
            {"user_id": 1, "ts": base + dt.timedelta(minutes=90)},
            {"user_id": 2, "ts": base}]
    from kgforge.functions.events import sessionize_ds

    out = sessionize_ds(rd.from_items(rows)).to_pandas() \
        .set_index("user_id")
    assert out.loc[1].n_sessions == 2 and out.loc[1].n_events == 3
    assert out.loc[2].n_sessions == 1


def test_alias_small_side_paths_agree(ray_session, hmm_model):
    """driver vs shuffle paths canonicalize identically: the shuffle
    map is the pair-involved subset of the driver map, and missing keys
    fall back to identity canon in CanonLookup — so canon() over every
    surface must agree between the two."""
    import ray.data as rd

    from kgforge.oracle.corpus import generate_interleaved_docs
    from kgforge.oracle.pipeline import mentions_of, tag_docs
    from kgforge.stages.linking import CanonLookup, build_alias_map

    docs = generate_interleaved_docs(80, seed=42)
    ment = mentions_of(tag_docs(hmm_model, docs))
    t1 = rd.from_items(ment).repartition(4)
    a = build_alias_map(t1, small_side="driver")
    b = build_alias_map(t1, small_side="shuffle")
    assert len(a) > 0 and len(b) > 0
    # shuffle map ⊆ driver map with equal values
    for k, v in b.items():
        assert a[k] == v, k
    # identical canonicalization over every surface the driver map saw
    ca, cb = CanonLookup(alias_map=a), CanonLookup(alias_map=b)
    for etype, surface in a:
        assert ca.canon(etype, surface) == cb.canon(etype, surface)
    # every non-identity driver entry is pair-involved → present in b
    for k, v in a.items():
        if v[1] != k[1]:
            assert k in b, k


def test_canon_lookup_shuffle_matches_broadcast(ray_session, hmm_model):
    """L2 broadcast dict vs the key-shuffle join fallback (the path for
    an alias map too big to broadcast): identical rows, including
    surfaces absent from the map (identity canon) and hot surfaces
    split across salts."""
    import pandas as pd
    import ray.data as rd

    from kgforge.oracle.corpus import generate_interleaved_docs
    from kgforge.oracle.pipeline import mentions_of, tag_docs
    from kgforge.stages.linking import (
        CanonLookup, build_alias_map, canon_lookup_shuffle_ds,
    )

    docs = generate_interleaved_docs(80, seed=42)
    ment = mentions_of(tag_docs(hmm_model, docs))
    t1 = rd.from_items(ment).repartition(4).materialize()
    am = build_alias_map(t1, small_side="driver")
    assert len(am) > 0

    import ray

    bcast = t1.map_batches(
        CanonLookup, fn_constructor_kwargs={"alias_map": am},
        batch_format="pyarrow", concurrency=2).to_pandas()
    shuf = canon_lookup_shuffle_ds(t1, alias_map=am,
                                   salt_buckets=4).to_pandas()

    cols = sorted(bcast.columns)
    assert cols == sorted(shuf.columns)

    def norm(df):
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(bcast), norm(shuf))


def test_round_away_matches_duckdb_property():
    """round_away == DuckDB round() on random doubles INCLUDING exact
    binary midpoints (the values where numpy bankers' rounding
    diverges) — the whole oracle-SQL contract leans on this."""
    import duckdb
    import numpy as np

    from kgforge.common.hashing import round_away

    rng = np.random.RandomState(11)
    vals = list(rng.uniform(-1e5, 1e5, 200))
    # exact midpoints at 2 and 4 decimals (power-of-two fractions)
    vals += [185 / 32, -185 / 32, 0.125, -0.125, 58375.125, 2.675,
             0.5, -0.5, 1.005, 12.345]
    con = duckdb.connect()
    for nd in (0, 2, 4):
        got = [float(round_away(v, nd)) for v in vals]
        exp = [con.execute(f"SELECT round(CAST(? AS DOUBLE), {nd})",
                           [v]).fetchone()[0] for v in vals]
        assert got == exp, (nd, [(v, g, e) for v, g, e
                                 in zip(vals, got, exp) if g != e][:5])


def test_minhash_pair_set_invariant_to_bucketization(ray_session):
    """The LSH bucket modulus is only a partitioning key: any bucket
    count must yield the identical verified pair set."""
    import ray.data as rd

    rng = np.random.RandomState(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    texts = []
    for i in range(60):
        base = [words[rng.randint(10)] for _ in range(12)]
        texts.append(" ".join(base))
        if i % 3 == 0:                      # near-dup variant
            mut = list(base)
            mut[rng.randint(12)] = words[rng.randint(10)]
            texts.append(" ".join(mut))
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(4)
    sets = []
    for nb in (1, 7, 64, 1024):
        pairs = D.minhash_dedup_pairs_ds(ds, theta=0.5,
                                         num_buckets=nb).to_pandas()
        sets.append({(a, b, j) for a, b, j in
                     zip(pairs.id_a, pairs.id_b, pairs.jaccard)})
    assert sets[0] == sets[1] == sets[2] == sets[3]
    assert sets[0]                           # non-trivial


def test_simhash_vectorized_verify_matches_bruteforce(ray_session):
    """Chunked-popcount verify == brute-force candidate pairs (all
    pairs sharing >= 1 sub-key with Hamming <= 3)."""
    import ray.data as rd

    rng = np.random.RandomState(11)
    words = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(80):
        base = [words[rng.randint(30)] for _ in range(15)]
        texts.append(" ".join(base))
        if i % 4 == 0:
            mut = list(base)
            mut[rng.randint(15)] = words[rng.randint(30)]
            texts.append(" ".join(mut))
    ids = list(range(len(texts)))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    pairs = D.simhash_pairs_ds(
        rd.from_arrow(tbl).repartition(3)).to_pandas()
    got = {(a, b): h for a, b, h in
           zip(pairs.id_a, pairs.id_b, pairs.hamming)}

    sh = [D.simhash64(t) for t in texts]
    exp = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            shares = any(((sh[x] >> (16 * k)) & 0xFFFF)
                         == ((sh[y] >> (16 * k)) & 0xFFFF)
                         for k in range(4))
            d = bin(sh[x] ^ sh[y]).count("1")
            if shares and d <= 3:
                exp[(x, y)] = d
    assert got == exp and exp


def test_knn_ivf_indexed_matches_scan_variant(emb_ds, tmp_path):
    """Persisted-IVF path == in-flight scan path (same codebook seed →
    same probes → identical candidates), and full-probe == brute."""
    ds, base = emb_ds
    root = str(tmp_path / "ivf")
    S.ivf_build(ds, root, n_centroids=4, sample_n=40)
    for nprobe in (1, 2, 4):
        idx = S.knn_ivf_indexed_ds(root, [0, 5], k=3,
                                   nprobe=nprobe).to_pandas()
        scan = S.knn_ivf_ds(ds, [0, 5], k=3, n_centroids=4,
                            nprobe=nprobe, sample_n=40).to_pandas()
        assert idx.values.tolist() == scan.values.tolist()
    exact = S.knn_brute_ds(ds, query_ids=[0, 5], k=3).to_pandas()
    full = S.knn_ivf_indexed_ds(root, [0, 5], k=3, nprobe=4).to_pandas()
    assert full.values.tolist() == exact.values.tolist()


def test_asof_and_range_join_ops(ray_session):
    """As-of join (backward inclusive) + range-window count vs a
    straightforward per-key loop on random event streams."""
    import ray.data as rd

    from kgforge.functions.events import asof_join_ds, range_window_count_ds

    rng = np.random.RandomState(3)
    n = 300
    users = rng.randint(0, 6, n)
    ts = np.sort(rng.randint(0, 10_000, n)).astype(np.int64)
    side = rng.random(n) < 0.5
    ids = np.arange(n, dtype=np.int64)
    mk = lambda m: rd.from_arrow(pa.table({  # noqa: E731
        "event_id": pa.array(ids[m]), "ts": pa.array(ts[m]),
        "user_id": pa.array(users[m], pa.int64())})).repartition(3)
    left_ds, right_ds = mk(side), mk(~side)

    out = asof_join_ds(left_ds, right_ds).to_pandas() \
        .set_index("l_event_id")
    rw = range_window_count_ds(left_ds, right_ds, window_us=1000) \
        .to_pandas().set_index("event_id")
    for i in ids[side]:
        u, t = users[i], ts[i]
        prior = [j for j in ids[~side] if users[j] == u and ts[j] <= t]
        expect = max(prior, key=lambda j: (ts[j],), default=None)
        got = out.loc[i, "r_event_id"]
        if expect is None:
            assert got is None or (isinstance(got, float) and np.isnan(got))
        else:
            # ties on ts: any max-ts right row is a valid as-of match
            assert ts[int(got)] == ts[expect] and users[int(got)] == u
        n_win = sum(1 for j in ids[~side]
                    if users[j] == u and t - 1000 <= ts[j] < t)
        assert int(rw.loc[i, "n_in_window"]) == n_win


def test_asof_range_join_hot_key_salted(ray_session):
    """Hot-key contract (SURVEY §2.4): a key above hot_threshold is
    pre-split into coarse on-range buckets, with the as-of boundary row
    carried across buckets (incl. over EMPTY middle buckets) and range
    right rows replicated one bucket forward — results must equal the
    unsalted single-task merge exactly, and the hot key must actually
    land on several merge tasks."""
    import pandas as pd
    import ray.data as rd

    from kgforge.functions import events as E

    rng = np.random.RandomState(7)
    # hot user 0: rows clustered at both ends of the time axis so the
    # middle salt buckets are empty; cold users 1-3
    n_hot = 12_000
    ts_hot = np.concatenate([
        rng.randint(0, 50_000, n_hot // 2),
        rng.randint(900_000, 1_000_000, n_hot // 2)]).astype(np.int64)
    ts_cold = rng.randint(0, 1_000_000, 600).astype(np.int64)
    ts = np.concatenate([ts_hot, ts_cold])
    users = np.concatenate([np.zeros(n_hot, np.int64),
                            rng.randint(1, 4, 600).astype(np.int64)])
    n = ts.size
    ids = np.arange(n, dtype=np.int64)
    ts[n_hot // 4] = ts[n_hot // 4 + 1]  # duplicate ts → tie-break path
    side = rng.random(n) < 0.5

    def mk(m):
        return rd.from_arrow(pa.table({
            "event_id": pa.array(ids[m]), "ts": pa.array(ts[m]),
            "user_id": pa.array(users[m], pa.int64())})).repartition(4)

    left_ds, right_ds = mk(side), mk(~side)

    def norm(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    salted = E.asof_join_ds(left_ds, right_ds, hot_threshold=1_000,
                            salt_target=800).to_pandas()
    plain = E.asof_join_ds(left_ds, right_ds,
                           hot_threshold=None).to_pandas()
    pd.testing.assert_frame_equal(norm(salted), norm(plain))

    rs = E.range_window_count_ds(left_ds, right_ds, window_us=10_000,
                                 hot_threshold=1_000,
                                 salt_target=800).to_pandas()
    rp = E.range_window_count_ds(left_ds, right_ds, window_us=10_000,
                                 hot_threshold=None).to_pandas()
    pd.testing.assert_frame_equal(norm(rs), norm(rp))

    # the hot key must be split across ≥2 merge tasks
    unioned = E._tag_union(left_ds, right_ds, "user_id", "ts",
                           ["event_id"], ["event_id", "ts"]).materialize()
    hot = E._hot_plan(E._key_stats(unioned, "user_id"), 1_000, 800, 1)
    assert 0 in hot and hot[0][2] >= 2
    assert not any(k in hot for k in (1, 2, 3))
    salts = E._add_salt(unioned, "user_id", hot).to_pandas()
    assert salts.loc[salts.user_id == 0, "__salt"].nunique() >= 2
    assert (salts.loc[salts.user_id != 0, "__salt"] == 0).all()


def test_dup_clusters_and_hash_split(ray_session):
    """Connected components transitivity + deterministic split."""
    import ray.data as rd

    pairs = pa.table({"id_a": pa.array([1, 2, 10, 11], pa.int64()),
                      "id_b": pa.array([2, 3, 11, 12], pa.int64())})
    out = D.dup_clusters_ds(rd.from_arrow(pairs)).to_pandas() \
        .set_index("doc_id")
    assert out.loc[[1, 2, 3], "cluster_id"].tolist() == [1, 1, 1]
    assert out.loc[[10, 11, 12], "cluster_id"].tolist() == [10, 10, 10]

    import hashlib
    docs = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    sp = D.hash_split_ds(rd.from_arrow(docs)).to_pandas() \
        .set_index("doc_id")
    for i in (0, 7, 199):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        assert sp.loc[i, "bucket"] == b
        assert sp.loc[i, "split"] == ("train" if b < 80 else "test")


def test_dup_clusters_paths_agree(ray_session):
    """Driver union-find vs distributed min-label propagation on a
    random graph with chains (nontrivial diameter), stars, singleton
    pairs and a big component — identical labels from both paths."""
    import ray.data as rd

    rng = np.random.RandomState(11)
    edges = []
    # chain 0..9 (diameter 9 → several propagation rounds)
    edges += [(i, i + 1) for i in range(9)]
    # star centered at 100
    edges += [(100, 100 + i) for i in range(1, 15)]
    # random blob over 200..260
    for _ in range(120):
        a, b = rng.randint(200, 260, 2)
        if a != b:
            edges.append((int(min(a, b)), int(max(a, b))))
    # isolated pair
    edges.append((500, 501))
    tbl = pa.table({"id_a": pa.array([a for a, _ in edges], pa.int64()),
                    "id_b": pa.array([b for _, b in edges], pa.int64())})
    ds = rd.from_arrow(tbl).repartition(5)

    drv = D.dup_clusters_ds(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    dist = D.dup_clusters_ds(ds, driver_max_pairs=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(drv, dist)
    # chain collapses to min label 0
    assert (dist.set_index("doc_id").loc[range(10), "cluster_id"]
            == 0).all()


def test_epoch_shuffle_modes(ray_session):
    """blocks+local epoch shuffle: a true permutation (set-equal),
    deterministic per seed, different across seeds; full mode defers
    to random_shuffle."""
    import ray.data as rd

    from kgforge.functions.sampling import epoch_shuffle_ds

    tbl = pa.table({"doc_id": pa.array(range(500), pa.int64())})
    ds = rd.from_arrow(tbl).repartition(8)
    a1 = [r["doc_id"] for r in
          epoch_shuffle_ds(ds, seed=1, id_col="doc_id").take_all()]
    a2 = [r["doc_id"] for r in
          epoch_shuffle_ds(ds, seed=1, id_col="doc_id").take_all()]
    b = [r["doc_id"] for r in
         epoch_shuffle_ds(ds, seed=2, id_col="doc_id").take_all()]
    assert sorted(a1) == list(range(500))
    assert a1 == a2                      # deterministic per seed
    assert a1 != b                       # seed changes the order
    assert a1 != list(range(500))        # actually shuffled
    f = [r["doc_id"] for r in
         epoch_shuffle_ds(ds, seed=3, mode="full").take_all()]
    assert sorted(f) == list(range(500)) and f != list(range(500))


def test_sliding_window_counts(ray_session):
    """3-hour sliding window == sum of the 3 hour buckets ending at
    each window end."""
    import pandas as pd
    import ray.data as rd

    from kgforge.functions.events import sliding_window_counts_ds

    ts = pd.to_datetime([
        "2024-01-01 00:10", "2024-01-01 00:50",      # h0: 2
        "2024-01-01 01:30",                          # h1: 1
        "2024-01-01 03:30",                          # h3: 1
    ])
    tbl = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                    "event_type": pa.array(["c"] * 4)})
    out = sliding_window_counts_ds(rd.from_arrow(tbl).repartition(2)) \
        .to_pandas().set_index("window_end_hour")
    h0 = int(ts[0].value // 1000) // 3_600_000_000
    # window ending h0 = {h0}=2; h1 = {h0,h1}=3; h2 = {h0,h1}=3;
    # h3 = {h1,h3}=2; h4 = {h3}=1; h5 = {h3}=1
    assert out.loc[h0].n_events == 2
    assert out.loc[h0 + 1].n_events == 3
    assert out.loc[h0 + 2].n_events == 3
    assert out.loc[h0 + 3].n_events == 2
    assert out.loc[h0 + 5].n_events == 1


def test_redact_and_decontaminate(ray_session):
    import ray.data as rd

    texts = [
        "contact bob@example.com or call 555-123 4567 now",
        "the spark engine holds a secret table",
        "clean document with a hash value table inside",
        "",
    ]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(tbl).repartition(2)

    red = T.redact_ds(ds).to_pandas().sort_values("doc_id")
    assert red.n_redact.tolist() == [2, 2, 0, 0]
    expect0 = "contact [REDACTED] or call [REDACTED] now"
    assert red.clean_md5.iloc[0] == hashlib.md5(
        expect0.encode()).hexdigest()
    # untouched doc keeps its original digest
    assert red.clean_md5.iloc[2] == hashlib.md5(
        texts[2].encode()).hexdigest()

    dec = T.decontaminate_ds(ds).to_pandas().sort_values("doc_id")
    assert dec.n_contam.tolist() == [0, 0, 1, 0]
    assert dec.contaminated.tolist() == [0, 0, 1, 0]


def test_repetition_ratio(ray_session):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["a a a b", ""], pa.string())})
    out = T.repetition_ratio_ds(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id")
    assert out.n_tokens.tolist() == [4, 0]
    assert out.n_distinct.tolist() == [2, 0]
    assert out.top_n.tolist() == [3, 0]
    # empty doc: 1 - 0/max(0,1) = 1.0 (filtered as junk) in BOTH engines
    assert out.dup_ratio.tolist() == [0.5, 1.0]
    assert out.top_frac.tolist() == [0.75, 0.0]


def test_doc_frequency(docs_ds):
    out = T.doc_frequency_ds(docs_ds, k=3).to_pandas()
    # docs 0-3 share {brown,fox,lazy,over,quick,the} (df=4 each; "dog"
    # is df=3 because doc 2 tokenizes as "dog!"); deterministic
    # (df desc, term asc) tie-break picks the first three
    assert out.term.tolist() == ["brown", "fox", "lazy"]
    assert out.df.tolist() == [4, 4, 4]
    assert list(out.columns) == ["term", "df"]


def _events_fixture_ds(rd):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = {
        "event_id": pa.array(list(range(8)), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2, 2], pa.int64()),
        "ts": pa.array([base + dt.timedelta(seconds=s)
                        for s in [0, 10, 10, 40, 5, 5, 25, 100]],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 5.0, 5.0, 2.0, 9.0, 3.0, 7.0, 8.0],
                          pa.float64()),
    }
    return rd.from_arrow(pa.table(rows)).repartition(3)


def test_topk_per_group(ray_session):
    import ray.data as rd

    from kgforge.functions.events import topk_per_group_ds

    out = topk_per_group_ds(_events_fixture_ds(rd), k=2).to_pandas() \
        .sort_values(["user_id", "rn"]).reset_index(drop=True)
    # user 1: values 5.0 (ids 1,2 tie -> lower id first), user 2: 9,8
    assert out[out.user_id == 1].event_id.tolist() == [1, 2]
    assert out[out.user_id == 2].event_id.tolist() == [4, 7]
    assert out[out.user_id == 2].value_cents.tolist() == [900, 800]
    assert out.rn.tolist() == [1, 2, 1, 2]


def test_event_deltas(ray_session):
    import ray.data as rd

    from kgforge.functions.events import event_deltas_ds

    out = event_deltas_ds(_events_fixture_ds(rd)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    d = out.delta_us.tolist()
    # user 1: first null, then 10s, 0s (ts tie), 30s
    assert np.isnan(d[0]) and d[1:4] == [10e6, 0.0, 30e6]
    # user 2: first null (tie broken by event_id), 0, 20s, 75s
    assert np.isnan(d[4]) and d[5:8] == [0.0, 20e6, 75e6]


def test_group_quantiles(ray_session):
    import ray.data as rd

    from kgforge.functions.events import group_quantiles_ds

    tbl = pa.table({
        "event_type": pa.array(["a"] * 5 + ["b"] * 2, pa.string()),
        "value": pa.array([0.10, 0.20, 0.30, 0.40, 0.50, 1.0, 2.0],
                          pa.float64()),
    })
    out = group_quantiles_ds(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    # a: sorted cents [10..50], p50 idx floor(4*.5)=2 -> 30,
    #    p90 idx floor(4*.9)=3 -> 40; b: [100,200] -> 100, 100
    assert out.p50_cents.tolist() == [30, 100]
    assert out.p90_cents.tolist() == [40, 100]
    assert out.n_events.tolist() == [5, 2]


def test_cumulative_and_rolling_sum(ray_session):
    import ray.data as rd

    from kgforge.functions.events import cumulative_sum_ds, rolling_sum_ds

    ds = _events_fixture_ds(rd)
    cum = cumulative_sum_ds(ds).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    # user 1 values 1,5,5,2 -> cents 100,600,1100,1300
    assert cum[cum.user_id == 1].cum_cents.tolist() == [100, 600, 1100, 1300]
    # user 2 order by (ts,id): 9,3,7,8 -> 900,1200,1900,2700
    assert cum[cum.user_id == 2].cum_cents.tolist() == [900, 1200, 1900, 2700]

    roll = rolling_sum_ds(ds, window=3).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    assert roll[roll.user_id == 1].win_sum_cents.tolist() == \
        [100, 600, 1100, 1200]
    assert roll[roll.user_id == 1].win_n.tolist() == [1, 2, 3, 3]
    assert roll[roll.user_id == 2].win_sum_cents.tolist() == \
        [900, 1200, 1900, 1800]


def test_pivot_hourly(ray_session):
    import datetime as dt

    import ray.data as rd

    from kgforge.functions.events import pivot_hourly_ds

    base = dt.datetime(2024, 1, 1)  # midnight UTC
    tbl = pa.table({
        "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
        "ts": pa.array([base, base + dt.timedelta(hours=1),
                        base + dt.timedelta(hours=1, minutes=30),
                        base + dt.timedelta(days=1)], pa.timestamp("us")),
    })
    out = pivot_hourly_ds(rd.from_arrow(tbl).repartition(2)).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert out.h00.tolist() == [1, 1]  # day-1 midnight folds to h00
    assert out.h01.tolist() == [2, 0]
    assert out.h05.tolist() == [0, 0]
    assert list(out.columns) == ["event_type"] + [f"h{h:02d}"
                                                 for h in range(24)]


def test_tier_lookup(ray_session):
    import ray.data as rd

    from kgforge.functions.events import tier_lookup_ds

    tbl = pa.table({"event_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "value": pa.array([1.0, 25.0, 74.99, 99.0],
                                      pa.float64())})
    out = tier_lookup_ds(rd.from_arrow(tbl).repartition(2)).to_pandas() \
        .sort_values("event_id")
    # bands are [lo, hi): 2500 cents is already "mid", 7499 still "mid"
    assert out.tier.tolist() == ["low", "mid", "mid", "high"]
    assert out.value_cents.tolist() == [100, 2500, 7499, 9900]


def test_stratified_sample(ray_session):
    import hashlib as hl

    import ray.data as rd

    from kgforge.functions.sampling import stratified_sample_ds

    ids = list(range(40))
    tbl = pa.table({
        "event_type": pa.array(["x" if i % 2 else "y" for i in ids]),
        "event_id": pa.array(ids, pa.int64()),
    })
    out = stratified_sample_ds(rd.from_arrow(tbl).repartition(4), k=5) \
        .to_pandas().sort_values(["event_type", "rn"])
    assert out.groupby("event_type").size().tolist() == [5, 5]
    # matches the md5-order oracle rule exactly
    for g, grp in out.groupby("event_type"):
        pool = [i for i in ids if ("x" if i % 2 else "y") == g]
        expect = sorted(pool, key=lambda i: (hl.md5(str(i).encode())
                                             .hexdigest(), i))[:5]
        assert grp.sort_values("rn").event_id.tolist() == expect


def test_cumulative_sum_hot_key_salted(ray_session):
    import datetime as dt

    import ray.data as rd

    rng = np.random.RandomState(7)
    n = 12_000
    base = dt.datetime(2024, 1, 1)
    # one hot user holds 90% of events; duplicated timestamps included
    user = np.where(rng.rand(n) < 0.9, 1, rng.randint(2, 6, n)).astype(
        np.int64)
    secs = np.sort(rng.randint(0, 500_000, n))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(user),
        "ts": pa.array([base + dt.timedelta(seconds=int(s)) for s in secs],
                       pa.timestamp("us")),
        "value": pa.array(rng.rand(n) * 50, pa.float64()),
    })
    ds = rd.from_arrow(tbl).repartition(8)

    from kgforge.functions.events import _hot_plan, _key_stats, \
        cumulative_sum_ds

    cold = cumulative_sum_ds(ds, hot_threshold=10 ** 9).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    hot = cumulative_sum_ds(ds, hot_threshold=1000, salt_target=500) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert hot.cum_cents.tolist() == cold.cum_cents.tolist()
    assert (hot.user_id == cold.user_id).all()

    # the plan really split the hot key into many buckets
    from kgforge.functions.events import _on_key  # noqa: F401

    compact = ds.map_batches(
        lambda b: pa.table({"user_id": b["user_id"],
                            "__on": b["ts"].cast(pa.int64())}),
        batch_format="pyarrow")
    plan = _hot_plan(_key_stats(compact, "user_id"), 1000, 500, 1)
    assert 1 in plan and plan[1][2] >= 10


def test_build_alias_ds_matches_shuffle_map(ray_session, hmm_model):
    """Fully distributed alias resolution (min-label propagation with
    the election encoded in the label) must reproduce the shuffle
    path's driver union-find exactly: same key set (pair-involved
    surfaces), same canon_id/canon_surface per key."""
    import ray.data as rd

    from kgforge.oracle.corpus import generate_interleaved_docs
    from kgforge.oracle.pipeline import mentions_of, tag_docs
    from kgforge.stages.linking import build_alias_ds, build_alias_map

    docs = generate_interleaved_docs(80, seed=42)
    ment = mentions_of(tag_docs(hmm_model, docs))
    t1 = rd.from_items(ment).repartition(4).materialize()

    expect = build_alias_map(t1, small_side="shuffle")
    assert len(expect) > 0
    alias_ds = build_alias_ds(t1).materialize()
    got = alias_ds.to_pandas()
    got_map = {(r.etype, r.surface): (r.canon_id, r.canon_surface)
               for r in got.itertuples()}
    assert got_map == expect

    # end-to-end no-broadcast lane: alias Dataset → key-shuffle lookup
    # must equal the broadcast CanonLookup over the same map
    import pandas as pd

    from kgforge.stages.linking import CanonLookup, canon_lookup_shuffle_ds

    bcast = t1.map_batches(
        CanonLookup, fn_constructor_kwargs={"alias_map": expect},
        batch_format="pyarrow", concurrency=2).to_pandas()
    shuf = canon_lookup_shuffle_ds(t1, alias_ds=alias_ds,
                                   salt_buckets=4).to_pandas()
    cols = sorted(bcast.columns)
    pd.testing.assert_frame_equal(
        bcast[cols].sort_values(cols).reset_index(drop=True),
        shuf[cols].sort_values(cols).reset_index(drop=True))


def _typed_events_ds(rd):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return rd.from_arrow(pa.table({
        "event_type": pa.array(["a", "a", "a", "b", "b", "a", "b", "a"]),
        "user_id": pa.array([1, 1, 2, 1, 2, 3, 2, 1], pa.int64()),
        "ts": pa.array([base + dt.timedelta(minutes=m)
                        for m in [0, 10, 20, 30, 70, 80, 90, 100]],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
                          pa.float64()),
    })).repartition(3)


def test_hourly_distinct_users(ray_session):
    import ray.data as rd

    from kgforge.functions.events import hourly_distinct_users_ds

    out = hourly_distinct_users_ds(_typed_events_ds(rd)).to_pandas() \
        .sort_values(["event_type", "hour"]).reset_index(drop=True)
    # hour 0: a→{1,1,2}=2 users, b→{1}; hour 1: a→{3,1}=2, b→{2,2}=1
    assert out.n_users.tolist() == [2, 2, 1, 1]


def test_rollup_hourly(ray_session):
    import ray.data as rd

    from kgforge.functions.events import rollup_hourly_ds

    ds = _typed_events_ds(rd)
    out = rollup_hourly_ds(ds).to_pandas()
    total = out[(out.event_type == "<all>") & (out.hod == "<all>")]
    assert total.n_events.iloc[0] == 8
    leaf = out[(out.event_type != "<all>") & (out.hod != "<all>")]
    sub = out[(out.event_type != "<all>") & (out.hod == "<all>")]
    assert leaf.n_events.sum() == 8 == sub.n_events.sum()
    # per-type subtotal equals the sum of its leaves, cents included
    for t, grp in leaf.groupby("event_type"):
        row = sub[sub.event_type == t]
        assert row.n_events.iloc[0] == grp.n_events.sum()
        assert row.sum_cents.iloc[0] == grp.sum_cents.sum()


def test_dup_ngram_stats_flags_shared_spans(ray_session):
    import ray.data as rd

    shared = "a b c d e f g h"            # one shared 8-gram span
    texts = [
        f"x0 x1 {shared} y0 y1",          # doc 0: shares the span
        f"z0 {shared} z1 z2 z3",          # doc 1: shares the span
        "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9",  # doc 2: unique 8-grams
        "short doc",                      # doc 3: < 8 tokens -> no row
        f"{shared} {shared}",             # doc 4: span twice + bridges
    ]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = D.dup_ngram_stats_ds(rd.from_arrow(tbl).repartition(3), n=8) \
        .to_pandas().set_index("doc_id").sort_index()
    assert 3 not in out.index
    # doc 0: 5 positions total ("x0 x1"+8+2 = 12 toks -> 5 ngrams),
    # exactly one (the shared span) duplicated
    assert out.loc[0, "total_ngrams"] == 5
    assert out.loc[0, "dup_ngrams"] == 1
    assert out.loc[1, "dup_ngrams"] == 1
    assert out.loc[2, "dup_ngrams"] == 0
    # doc 4: 16 tokens -> 9 positions; the shared 8-gram occurs at
    # positions 0 and 8 (2 duplicated positions, dup across docs)
    assert out.loc[4, "total_ngrams"] == 9
    assert out.loc[4, "dup_ngrams"] == 2


def test_common_neighbors_ranks_nonadjacent_pairs(ray_session):
    import ray.data as rd

    from kgforge.functions.graph import common_neighbors_ds

    # a-c, b-c, a-d, b-d: a and b share {c, d} but are not adjacent;
    # c and d share {a, b} but are not adjacent; plus edge c-d makes
    # (c, d) adjacent so only (a, b) survives with cn=2.
    edges = pa.table({
        "subj": pa.array(["a", "b", "a", "b", "c"], pa.string()),
        "obj": pa.array(["c", "c", "d", "d", "d"], pa.string())})
    out = common_neighbors_ds(rd.from_arrow(edges).repartition(2), k=5) \
        .to_pandas()
    assert list(out.itertuples(index=False, name=None)) == [
        ("a", "b", 2)]


def test_cohort_retention_matrix(ray_session):
    import datetime as dt

    import ray.data as rd

    from kgforge.functions.events import cohort_retention_ds

    day = dt.datetime(2024, 1, 1)

    def at(d, h):
        return day + dt.timedelta(days=d, hours=h)

    # u1 joins day 0, active days 0,1,3 (two events on day 1);
    # u2 joins day 0, active day 0 only; u3 joins day 1, active 1,3
    rows = [(1, at(0, 2)), (1, at(1, 3)), (1, at(1, 9)), (1, at(3, 1)),
            (2, at(0, 5)),
            (3, at(1, 1)), (3, at(3, 23))]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))})
    out = cohort_retention_ds(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas().sort_values(["cohort_day", "day_offset"])
    got = [(r.cohort_day.day - 1, int(r.day_offset), int(r.n_users))
           for r in out.itertuples()]
    assert got == [(0, 0, 2), (0, 1, 1), (0, 3, 1),
                   (1, 0, 1), (1, 2, 1)]


def test_latest_event_tie_break(ray_session):
    import datetime as dt

    import ray.data as rd

    from kgforge.functions.events import latest_event_ds

    t0 = dt.datetime(2024, 1, 1)
    # user 1: strict latest ts; user 2: two events at the SAME ts →
    # the higher event_id must win deterministically
    tbl = pa.table({
        "event_id": pa.array([10, 11, 20, 21], pa.int64()),
        "ts": pa.array([t0, t0 + dt.timedelta(hours=1), t0, t0],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "c", "d"], pa.string())})
    out = latest_event_ds(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas().sort_values("user_id")
    assert list(out.event_id) == [11, 21]
    assert list(out.event_type) == ["b", "d"]


def test_weighted_sample_exact_and_layout_invariant(ray_session):
    import ray.data as rd

    from kgforge.functions.sampling import weighted_sample_ds

    # one row holds >1/2 the total weight -> always sampled; results
    # identical across block layouts (pure function of data)
    n = 40
    w = [10] * n
    w[7] = 1000
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "n_chars": pa.array(w, pa.int64())})
    outs = []
    for parts in (1, 8):
        out = weighted_sample_ds(rd.from_arrow(tbl).repartition(parts),
                                 k=5).to_pandas().sort_values("doc_id")
        outs.append(list(out.doc_id))
        assert 7 in outs[-1]
        # heavy row crosses multiple thresholds but is included once
        assert len(outs[-1]) == len(set(outs[-1])) <= 5
    assert outs[0] == outs[1]


def test_misra_gries_bounds_and_exact_regime(ray_session):
    import ray.data as rd

    from kgforge.functions.sketches import heavy_hitters_ds

    # lossy regime: 2000 distinct rare tokens + 3 heavy ones, capacity 64
    texts, true = [], {}
    for i in range(2000):
        texts.append(f"rare{i:04d}")
        true[f"rare{i:04d}"] = 1
    for tok, n in (("alpha", 900), ("beta", 500), ("gamma", 300)):
        texts.extend([tok] * n)
        true[tok] = n
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    out = heavy_hitters_ds(rd.from_arrow(tbl).repartition(4),
                           capacity=64, top=5).to_pandas()
    got = dict(zip(out.token, out.est))
    err = int(out.err.iloc[0])
    assert {"alpha", "beta", "gamma"} <= set(got)
    for tok in ("alpha", "beta", "gamma"):
        assert got[tok] <= true[tok] <= got[tok] + err

    # exact regime: distinct <= capacity -> err == 0, counts exact
    out2 = heavy_hitters_ds(rd.from_arrow(tbl).repartition(4),
                            capacity=4096, top=3).to_pandas()
    assert list(out2.err) == [0, 0, 0]
    assert dict(zip(out2.token, out2.est)) == {
        "alpha": 900, "beta": 500, "gamma": 300}


def test_kll_quantile_rank_error(ray_session):
    import ray.data as rd

    from kgforge.functions.sketches import quantile_sketch_ds

    rng = np.random.RandomState(7)
    vals = rng.lognormal(0, 2, size=50_000)
    tbl = pa.table({"value": pa.array(vals, pa.float64())})
    out = quantile_sketch_ds(rd.from_arrow(tbl).repartition(8),
                             k=256).to_pandas()
    sv = np.sort(vals)
    for q_pct, approx in zip(out.q_pct, out.approx):
        rank = np.searchsorted(sv, approx) / len(sv)
        assert abs(rank - q_pct / 100) < 0.03, (q_pct, rank)


def test_event_sequences(ray_session):
    import ray.data as rd

    from kgforge.functions.events import event_sequences_ds

    letters = "abcdefgh"
    t = _events_fixture_ds(rd).map_batches(
        lambda b: b.append_column(
            "event_type",
            pa.array([letters[i] for i in b["event_id"].to_pylist()],
                     pa.string())),
        batch_format="pyarrow")
    out = event_sequences_ds(t).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    # user 1 ts order 0,10,10,40 — the ts tie (ids 1,2) breaks by id
    assert out.seq.tolist() == ["a>b>c>d", "e>f>g>h"]
    assert out.n_events.tolist() == [4, 4]
    assert list(out.columns) == ["user_id", "seq", "n_events"]


def test_budget_select_boundary_ties(ray_session):
    import ray.data as rd

    from kgforge.functions.textstats import budget_select_ds

    # all docs score 0 (no stopwords) -> the ENTIRE corpus is the
    # boundary group; prefix must follow doc_id order exactly
    texts = ["x " * n for n in (4, 4, 4, 4)]  # 4 tokens each, total 16
    t = pa.table({"doc_id": pa.array([3, 1, 2, 0], pa.int64()),
                  "text": pa.array([texts[i] for i in (3, 1, 2, 0)],
                                   pa.string())})
    out = budget_select_ds(rd.from_arrow(t).repartition(3)) \
        .to_pandas().sort_values("doc_id")
    # budget = 8 tokens -> doc_ids 0 and 1 only (doc_id-asc prefix)
    assert out.doc_id.tolist() == [0, 1]

    # budget covers everything -> all rows kept
    out2 = budget_select_ds(rd.from_arrow(t), budget_num=1,
                            budget_den=1).to_pandas()
    assert len(out2) == 4
    assert list(out2.columns) == ["doc_id", "score", "n_tokens"]

    # empty corpus -> empty result (no rows ever reach a batch, so
    # there is no schema to assert beyond zero length)
    e = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    assert budget_select_ds(rd.from_arrow(e)).count() == 0
