"""kmeans_ds / quantize_embeddings_ds: paths-agree with the local
reference, determinism across block layouts, and quantize roundtrip
bounds."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _emb_table(n=120, d=16, seed=9):
    rng = np.random.default_rng(seed)
    # three separated blobs so clustering is non-trivial
    centers = rng.normal(0, 5, size=(3, d))
    mat = np.concatenate([
        rng.normal(0, 1, size=(n // 3, d)) + centers[i] for i in range(3)
    ]).astype(np.float32)
    ids = np.arange(len(mat), dtype=np.int64)
    return pa.table({"vec_id": pa.array(ids),
                     "embedding": pa.array([r for r in mat.tolist()],
                                           pa.list_(pa.float32()))})


class TestKMeans:
    def test_distributed_matches_local_and_block_layout(self, ray_session):
        import ray.data as rd

        from kgforge.functions.clustering import kmeans_ds, kmeans_local

        tbl = _emb_table()
        loc = kmeans_local(tbl, k=4, iters=4)
        for parts in (2, 7):
            ds = rd.from_arrow(tbl).repartition(parts)
            dist = {r["vec_id"]: r["cluster"]
                    for r in kmeans_ds(ds, k=4, iters=4).take_all()}
            assert dist == loc
        # the blobs should be separated: ≥ 3 non-trivial clusters
        assert len(set(loc.values())) >= 3

    def test_lsh_recall_counts(self, ray_session):
        import ray.data as rd

        from kgforge.functions.dedup import (embedding_lsh_pairs_ds,
                                             lsh_recall_ds)

        tbl = _emb_table(n=90, d=64, seed=21)
        ds = rd.from_arrow(tbl).repartition(4)
        out = lsh_recall_ds(ds, tau=0.3)
        n_exact = out["n_exact"][0].as_py()
        n_hit = out["n_hit"][0].as_py()
        n_lsh = out["n_lsh"][0].as_py()
        # brute-force ground truth
        mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
        unit = mat / np.linalg.norm(mat, axis=1)[:, None]
        sims = unit @ unit.T
        iu, ju = np.triu_indices(len(mat), k=1)
        want_exact = int((sims[iu, ju] >= 0.3).sum())
        assert n_exact == want_exact
        lsh_pairs = {(r["id_a"], r["id_b"]) for r in
                     embedding_lsh_pairs_ds(ds, tau=0.3).take_all()}
        assert n_lsh == len(lsh_pairs)
        exact_pairs = {(int(a), int(b)) for a, b, s in
                       zip(iu, ju, sims[iu, ju]) if s >= 0.3}
        assert n_hit == len(exact_pairs & lsh_pairs)
        assert 0 <= n_hit <= n_exact

    def test_quantize_matches_formula_and_bounds(self, ray_session):
        import ray.data as rd

        from kgforge.functions.clustering import quantize_embeddings_ds

        tbl = _emb_table(n=60, d=8, seed=3)
        ds = rd.from_arrow(tbl).repartition(5)
        rows = {r["vec_id"]: r["codes"]
                for r in quantize_embeddings_ds(ds).take_all()}
        mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
        lo, hi = mat.min(axis=0), mat.max(axis=0)
        span = np.where(hi > lo, hi - lo, 1.0)
        want = np.clip(np.floor((mat - lo) * 255.0 / span + 0.5),
                       0, 255).astype(np.int64)
        want[:, hi <= lo] = 0
        for i, vid in enumerate(tbl["vec_id"].to_pylist()):
            got = np.fromstring(rows[vid], dtype=np.int64, sep=",")
            assert (got == want[i]).all()
            assert got.min() >= 0 and got.max() <= 255


def test_embedding_stats(ray_session):
    import ray.data as rd

    from kgforge.functions.clustering import embedding_stats_ds

    rng = np.random.default_rng(11)
    vecs = rng.uniform(-1, 1, (50, 4)).astype(np.float32)
    tbl = pa.table({"embedding": pa.array(
        [v.tolist() for v in vecs],
        pa.list_(pa.float32()))})
    out = embedding_stats_ds(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas().sort_values("dim").reset_index(drop=True)
    micro = np.round(vecs.astype(np.float64) * 1e6).astype(np.int64)
    for d in range(4):
        r = out.iloc[d]
        assert r.n == 50
        assert r.sum_micro == micro[:, d].sum()
        assert r.min_micro == micro[:, d].min()
        assert r.max_micro == micro[:, d].max()
        assert r.mean_micro == float(micro[:, d].sum()) / 50.0
