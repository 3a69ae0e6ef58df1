"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_brute_ds` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch computes a vectorized
  ``(B×d) @ (d×Q)`` partial top-k, and a final tiny merge keeps the
  global top-k per query.  The partial-top-k-inside-``map_batches``
  is the combiner that makes this a near-zero-shuffle plan: only
  ``num_batches × Q × k`` candidate rows leave the map stage.
- :func:`ivf_build` + :func:`knn_ivf_indexed_ds` — the scale path: a
  PERSISTED inverted file (one Parquet partition per centroid, built
  once) lets each query run read only its ``nprobe`` probed
  partitions — O(N·nprobe/C) I/O.  At 10⁹+ vectors the brute plan
  reads everything per query set; the index amortizes assignment and
  prunes the read itself.
- :func:`knn_ivf_ds` — index-less IVF variant (codebook + assignment
  in-flight); kept for one-shot queries where building the index
  wouldn't amortize.  Identical results to the indexed path for the
  same codebook seed (tested).

All cosine math in float64 for DuckDB-oracle parity
(``list_cosine_similarity`` on ``DOUBLE[]``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _take_rows_by_id(ds, id_col: str, ids) -> list[dict]:
    """Pruned fetch of a known-small id set (pushdown-style filter via
    ``pc.is_in`` per batch; only matching rows reach the driver)."""
    import pyarrow.compute as pc

    value_set = pa.array(list(ids), pa.int64())
    rows = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=value_set)),
        batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    return rows


class _BruteScorer:
    """Actor: holds the broadcast unit-normalized query matrix."""

    def __init__(self, queries_ref, vec_col: str, id_col: str, k: int):
        import ray

        q = ray.get(queries_ref)
        self.q_ids = q["ids"]                       # [Q]
        self.q_unit = q["unit"]                     # [Q, d]
        self.vec_col, self.id_col, self.k = vec_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist())
        mat = np.array(batch[self.vec_col].to_pylist(), dtype=np.float64)
        sims = _unit(mat) @ self.q_unit.T           # [B, Q]
        # self-match exclusion: a query never reports itself
        self_mask = ids[:, None] == self.q_ids[None, :]
        sims[self_mask] = -np.inf
        k = min(self.k, sims.shape[0])
        # deterministic per-batch candidates: sim desc, neighbor_id asc
        # tie-break (matches the oracle's ORDER BY sim DESC, neighbor_id;
        # bare argpartition keeps an arbitrary member of a k-boundary tie)
        q_idx = np.repeat(np.arange(sims.shape[1]), k)
        n_idx = np.empty(sims.shape[1] * k, dtype=np.int64)
        for q in range(sims.shape[1]):
            order = np.lexsort((ids, -sims[:, q]))[:k]
            n_idx[q * k:(q + 1) * k] = order
        return pa.table({
            "query_id": pa.array(self.q_ids[q_idx], pa.int64()),
            "neighbor_id": pa.array(ids[n_idx], pa.int64()),
            "cos_sim": pa.array(sims[n_idx, q_idx], pa.float64()),
        })


def knn_brute_ds(ds, query_ids, vec_col: str = "embedding",
                 id_col: str = "vec_id", k: int = 5) -> pa.Table:
    """Exact top-k cosine neighbors for each query id.

    Returns a small arrow table (query_id, neighbor_id, rank) — the
    global merge of per-batch partial top-ks is Q×k-sized, done on the
    driver (the one place a driver-side reduce is correct: the result
    is the small side).
    """
    import ray

    query_ids = np.asarray(sorted(query_ids), dtype=np.int64)
    q_rows = _take_rows_by_id(ds, id_col, query_ids)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    queries_ref = ray.put({"ids": np.array([r[id_col] for r in q_rows],
                                           dtype=np.int64),
                           "unit": _unit(q_mat)})

    partials = ds.map_batches(
        _BruteScorer,
        fn_constructor_kwargs={"queries_ref": queries_ref,
                               "vec_col": vec_col, "id_col": id_col, "k": k},
        batch_format="pyarrow", concurrency=(1, 8)).take_all()

    return _merge_topk(partials, k)


def _merge_topk(partial_rows: list[dict], k: int) -> pa.Table:
    by_q: dict[int, list] = {}
    for r in partial_rows:
        by_q.setdefault(int(r["query_id"]), []).append(
            (float(r["cos_sim"]), int(r["neighbor_id"])))
    q_out, n_out, r_out = [], [], []
    for q in sorted(by_q):
        # deterministic: sim desc, neighbor_id asc tie-break
        cand = sorted(by_q[q], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (_, nid) in enumerate(cand, start=1):
            q_out.append(q)
            n_out.append(nid)
            r_out.append(rank)
    return pa.table({"query_id": pa.array(q_out, pa.int64()),
                     "neighbor_id": pa.array(n_out, pa.int64()),
                     "rank": pa.array(r_out, pa.int64())})


# ---------------------------------------------------------------------------
# IVF approximate search
# ---------------------------------------------------------------------------

def _kmeans_lite(sample: np.ndarray, n_centroids: int, n_iter: int = 8,
                 seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd iterations on a bounded sample."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)),
                     replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(n_iter):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            pts = sample[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
    return cent


def _sq_dists(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Squared L2 via the expanded form |v|² - 2v·c + |c|² — the same
    arithmetic shape the DuckDB oracle uses (list_dot_product terms),
    so centroid argmin assignments agree between engines."""
    vv = (mat * mat).sum(axis=1)
    cc = (cent * cent).sum(axis=1)
    return vv[:, None] - 2.0 * (mat @ cent.T) + cc[None, :]


def ivf_build(ds, index_root: str, vec_col: str = "embedding",
              id_col: str = "vec_id", n_centroids: int = 16,
              sample_n: int = 2048, seed: int = 42,
              codebook_ids=None) -> np.ndarray:
    """Build a PERSISTED inverted file: assign every vector to its
    nearest centroid once and write one Parquet partition per centroid
    (``centroid=<c>/`` dirs via ``write_parquet(partition_cols)``),
    plus the codebook (``centroids.npz``).

    This is the amortized-scan step the index-less variant lacked:
    after the one-time build, a query run READS only its ``nprobe``
    probed partitions — O(N·nprobe/C) I/O instead of re-scanning and
    re-assigning all N vectors per query set."""
    import os

    if codebook_ids is not None:
        # deterministic, SQL-reproducible codebook: the vectors of a
        # fixed id set (no Lloyd) — the IVF structure (partitioned
        # inverted file + pruned probes) is identical; codebook choice
        # is a policy knob
        rows = _take_rows_by_id(ds, id_col, sorted(codebook_ids))
        cent = np.array([r[vec_col] for r in rows], dtype=np.float64)
    else:
        sample_rows = ds.limit(sample_n).take_all()
        sample = np.array([r[vec_col] for r in sample_rows],
                          dtype=np.float64)
        cent = _kmeans_lite(sample, n_centroids, seed=seed)
    import ray

    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        a = _sq_dists(mat, c).argmin(axis=1).astype(np.int64)
        # cent_id rides inside the data files (hive partition cols are
        # stripped on write and not restored when reading subdir paths)
        return batch.append_column("centroid", pa.array(a)) \
                    .append_column("cent_id", pa.array(a))

    from kgforge.common.parquet_io import prune_torn_fragments

    os.makedirs(index_root, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(index_root, partition_cols=["centroid"])
    prune_torn_fragments(index_root)   # drop dead write attempts' residue
    np.savez(os.path.join(index_root, "centroids.npz"), cent=cent)
    return cent


def knn_ivf_indexed_ds(index_root: str, query_ids,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       k: int = 5, nprobe: int = 4) -> pa.Table:
    """Top-k over a persisted IVF index: only the union of the
    queries' ``nprobe`` nearest partitions is READ (directory-pruned
    ``read_parquet``); scoring inside each batch masks per query."""
    import os

    import ray
    import ray.data as rd

    cent = np.load(os.path.join(index_root, "centroids.npz"))["cent"]
    query_ids = np.asarray(sorted(query_ids), dtype=np.int64)
    # query vectors live in their own partitions — pruned fetch needs
    # only the partitions the query ids hash... we don't know which, so
    # fetch by id across the index (still a pruned column read)
    full = rd.read_parquet(index_root, file_extensions=["parquet"],
                           columns=[id_col, vec_col])
    q_rows = _take_rows_by_id(full, id_col, query_ids)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    qd = _sq_dists(q_mat, cent)
    # deterministic probe order: distance asc, centroid index asc
    probe = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]
    needed = sorted(set(probe.reshape(-1).tolist()))
    paths = [os.path.join(index_root, f"centroid={c}") for c in needed
             if os.path.isdir(os.path.join(index_root, f"centroid={c}"))]
    if not paths:
        return _merge_topk([], k)

    state_ref = ray.put({
        "ids": np.array([r[id_col] for r in q_rows], dtype=np.int64),
        "unit": _unit(q_mat), "probe": probe})

    class IndexedScorer:
        def __init__(self):
            st = ray.get(state_ref)
            self.q_ids, self.q_unit = st["ids"], st["unit"]
            self.probe = st["probe"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist())
            cents = batch["cent_id"].to_numpy(zero_copy_only=False)
            mat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
            unit = _unit(mat)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.q_ids)):
                mask = np.isin(cents, self.probe[qi])
                mask &= ids != self.q_ids[qi]
                if not mask.any():
                    continue
                sims = unit[mask] @ self.q_unit[qi]
                cand_ids = ids[mask]
                kk = min(len(sims), 64)
                top = np.lexsort((cand_ids, -sims))[:kk]
                out_q.extend([self.q_ids[qi]] * kk)
                out_n.extend(cand_ids[top].tolist())
                out_s.extend(sims[top].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "neighbor_id": pa.array(out_n, pa.int64()),
                             "cos_sim": pa.array(out_s, pa.float64())})

    probed = rd.read_parquet(paths, file_extensions=["parquet"],
                             columns=[id_col, vec_col, "cent_id"])
    partials = probed.map_batches(IndexedScorer, batch_format="pyarrow",
                                  concurrency=(1, 8)).take_all()
    return _merge_topk(partials, k)


def knn_ivf_ds(ds, query_ids, vec_col: str = "embedding",
               id_col: str = "vec_id", k: int = 5, n_centroids: int = 16,
               nprobe: int = 4, sample_n: int = 2048,
               seed: int = 42) -> pa.Table:
    """IVF top-k: codebook from a bounded deterministic sample, search
    only batches' vectors assigned to each query's ``nprobe`` nearest
    centroids.  Approximate — recall depends on nprobe/n_centroids."""
    import ray

    sample_rows = ds.limit(sample_n).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    cent = _kmeans_lite(sample, n_centroids, seed=seed)

    query_ids = np.asarray(sorted(query_ids), dtype=np.int64)
    q_rows = _take_rows_by_id(ds, id_col, query_ids)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    qd = _sq_dists(q_mat, cent)
    probe = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]

    state_ref = ray.put({
        "ids": np.array([r[id_col] for r in q_rows], dtype=np.int64),
        "unit": _unit(q_mat), "cent": cent, "probe": probe})

    class IvfScorer:
        def __init__(self):
            st = ray.get(state_ref)
            self.q_ids, self.q_unit = st["ids"], st["unit"]
            self.cent, self.probe = st["cent"], st["probe"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist())
            mat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
            assign = _sq_dists(mat, self.cent).argmin(axis=1)   # [B]
            unit = _unit(mat)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.q_ids)):
                mask = np.isin(assign, self.probe[qi])
                mask &= ids != self.q_ids[qi]
                if not mask.any():
                    continue
                sims = unit[mask] @ self.q_unit[qi]
                cand_ids = ids[mask]
                kk = min(len(sims), 64)
                top = np.lexsort((cand_ids, -sims))[:kk]  # deterministic
                out_q.extend([self.q_ids[qi]] * kk)
                out_n.extend(cand_ids[top].tolist())
                out_s.extend(sims[top].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "neighbor_id": pa.array(out_n, pa.int64()),
                             "cos_sim": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(IvfScorer, batch_format="pyarrow",
                              concurrency=(1, 8)).take_all()
    return _merge_topk(partials, k)


def knn_classify_ds(ds, query_ids, vec_col: str = "embedding",
                    id_col: str = "vec_id", label_col: str = "label",
                    k: int = 5) -> pa.Table:
    """k-NN majority-vote classification: for each query id, the most
    common label among its ``k`` exact cosine neighbors (vote ties →
    smallest label) → (query_id, pred_label, votes).

    Scale shape: rides :func:`knn_brute_ds` (per-batch partial top-k
    against the broadcast query matrix, Q×k driver merge); neighbor
    labels come back through ONE key-pruned read of the label column
    — the corpus is scanned once for scoring and never shuffled."""
    import pyarrow.dataset as pds

    knn = knn_brute_ds(ds, query_ids, vec_col=vec_col,
                       id_col=id_col, k=k)
    nbr = sorted({int(x) for x in knn["neighbor_id"].to_pylist()})
    lab_rows = _take_rows_by_id(
        ds.select_columns([id_col, label_col]), id_col,
        np.asarray(nbr, dtype=np.int64))
    lab = {int(r[id_col]): int(r[label_col]) for r in lab_rows}
    q_out, l_out, v_out = [], [], []
    qs = knn["query_id"].to_numpy()
    ns = knn["neighbor_id"].to_numpy()
    for q in sorted(set(qs.tolist())):
        votes: dict[int, int] = {}
        for nid in ns[qs == q]:
            labv = lab[int(nid)]
            votes[labv] = votes.get(labv, 0) + 1
        best = sorted(votes.items(), key=lambda t: (-t[1], t[0]))[0]
        q_out.append(int(q))
        l_out.append(best[0])
        v_out.append(best[1])
    return pa.table({"query_id": pa.array(q_out, pa.int64()),
                     "pred_label": pa.array(l_out, pa.int64()),
                     "votes": pa.array(v_out, pa.int64())})


def dim_truncate_recall_ds(ds, query_ids, d_trunc: int = 16,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id", k: int = 10) -> pa.Table:
    """Matryoshka-style dimension-truncation evaluation: recall@k of
    cosine top-k computed on the FIRST ``d_trunc`` dims against the
    full-dim exact top-k → one row per query ``(query_id, n_hit,
    recall)``.  The scale rationale: a cheap truncated first-pass
    search (d_trunc ≪ d means d/d_trunc × less matmul + I/O) is only
    admissible if its measured recall holds — this operator measures
    it on the production search path itself.

    Scale shape: two :func:`knn_brute_ds` passes (broadcast query
    matrix, per-batch partial top-k, Q×k driver merge each); the
    driver-side set intersection is Q×k-bounded — the one place a
    driver reduce is correct."""
    def truncate(b: pa.Table) -> pa.Table:
        mat = _list_mat(b[vec_col])[:, :d_trunc]
        return pa.table({
            id_col: b[id_col],
            vec_col: pa.array(mat.tolist(), pa.list_(pa.float64()))})

    full = knn_brute_ds(ds, query_ids, vec_col=vec_col,
                        id_col=id_col, k=k)
    trunc = knn_brute_ds(
        ds.select_columns([id_col, vec_col]).map_batches(
            truncate, batch_format="pyarrow"),
        query_ids, vec_col=vec_col, id_col=id_col, k=k)

    by_q_full: dict[int, set] = {}
    for q, nid in zip(full["query_id"].to_pylist(),
                      full["neighbor_id"].to_pylist()):
        by_q_full.setdefault(int(q), set()).add(int(nid))
    by_q_tr: dict[int, set] = {}
    for q, nid in zip(trunc["query_id"].to_pylist(),
                      trunc["neighbor_id"].to_pylist()):
        by_q_tr.setdefault(int(q), set()).add(int(nid))
    from kgforge.common.hashing import round_away

    q_out = sorted(by_q_full)
    hits = [len(by_q_full[q] & by_q_tr.get(q, set())) for q in q_out]
    return pa.table({
        "query_id": pa.array(q_out, pa.int64()),
        "n_hit": pa.array(hits, pa.int64()),
        "recall": pa.array(
            [float(round_away(h / k, 4)) for h in hits], pa.float64())})


def _list_mat(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Fixed-width ``list<float>`` column → (n, d) float64 matrix —
    one flatten, no per-row Python."""
    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = ca.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    n = len(ca)
    return flat.reshape(n, len(flat) // n) if n else flat.reshape(0, 0)


def knn_graph_ds(ds, k: int = 3, n_blocks: int = 4,
                 num_partitions: int = 32, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
    """Exact cosine kNN GRAPH (every vector's top-k neighbors — the
    mutual-kNN substrate for graph clustering / dedup), as the classic
    blocked self-join: rows hash into ``n_blocks`` blocks by id, each
    row is replicated to the ``n_blocks`` block-PAIR buckets its block
    touches, and every unordered pair of vectors meets in exactly one
    bucket — shuffle volume is n·B rows, per-bucket compute n²/B²
    matmuls, and only ``n·B·k`` candidate rows leave the bucket stage
    (partial top-k is the combiner).  The final merge hash-partitions
    candidates by query id (``num_partitions`` callbacks, never one
    per key) and takes each query's global top-k with one lexsort +
    run-offset cut.  Bucket count is a knob: B ~ sqrt(cluster tasks)
    balances replication against per-bucket memory.  For 10⁹+ vectors
    use the IVF index (:func:`knn_ivf_indexed_ds`) — this operator is
    the exact baseline it is validated against."""
    B = int(n_blocks)

    def replicate(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ids = b[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(n, dtype=np.int64), B)
        t = np.tile(np.arange(B, dtype=np.int64), n)
        bi = (ids % B).astype(np.int64)[rep]
        lo, hi = np.minimum(bi, t), np.maximum(bi, t)
        out = b.take(pa.array(rep))
        return out.append_column("__b", pa.array(lo * B + hi))

    def cross(t: pa.Table) -> pa.Table:
        bucket = int(t["__b"][0].as_py())
        i, j = bucket // B, bucket % B
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")  # id-asc tie-break base
        ids = ids[order]
        U = _unit(_list_mat(t[vec_col])[order])
        blk = ids % B
        outs = []

        def topk(q_ids, q_mat, c_ids, c_mat, drop_self):
            if len(q_ids) == 0 or len(c_ids) == 0:
                return
            S = q_mat @ c_mat.T
            if drop_self:
                S[q_ids[:, None] == c_ids[None, :]] = -np.inf
            kk = min(k, S.shape[1])
            # stable argsort on -S keeps candidate-id-asc tie order
            top = np.argsort(-S, axis=1, kind="stable")[:, :kk]
            qi = np.repeat(np.arange(len(q_ids)), kk)
            ci = top.ravel()
            sims = S[qi, ci]
            keep = np.isfinite(sims)
            outs.append(pa.table({
                "query_id": pa.array(q_ids[qi][keep]),
                "neighbor_id": pa.array(c_ids[ci][keep]),
                "sim": pa.array(sims[keep], pa.float64())}))

        if i == j:
            topk(ids, U, ids, U, drop_self=True)
        else:
            a, b_ = blk == i, blk == j
            topk(ids[a], U[a], ids[b_], U[b_], drop_self=False)
            topk(ids[b_], U[b_], ids[a], U[a], drop_self=False)
        if not outs:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.concat_tables(outs)

    def tag(b: pa.Table) -> pa.Table:
        q = b["query_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return b.append_column(
            "__p", pa.array((q % num_partitions).astype(np.int64)))

    def merge(t: pa.Table) -> pa.Table:
        q = t["query_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        nb = t["neighbor_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        s = t["sim"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, -s, q))
        q, nb = q[order], nb[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(q[1:] != q[:-1]) + 1]) \
            if len(q) else np.zeros(0, np.int64)
        within = np.arange(len(q)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(q)]])))
        keep = within < k
        return pa.table({
            "query_id": pa.array(q[keep]),
            "neighbor_id": pa.array(nb[keep]),
            "rank": pa.array((within[keep] + 1).astype(np.int64))})

    return ds.map_batches(replicate, batch_format="pyarrow") \
        .groupby("__b").map_groups(cross, batch_format="pyarrow") \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(merge, batch_format="pyarrow")


def kcenter_select_ds(ds, k: int = 8, vec_col: str = "embedding",
                      id_col: str = "vec_id"):
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-first
    traversal; the coreset strategy of Sener & Savarese, ICLR 2018):
    seed with the smallest ``id_col``, then ``k−1`` times add the point
    maximizing its distance to the selected set (ties → smallest id).
    Output: ``(step, vec_id, dist_micro2)`` — the squared L2 distance
    (in micro-unit² space) of each pick to the set at selection time
    (0 for the seed).

    Determinism: vectors are quantized to ``round(x·10⁶)`` int64 per
    element FIRST, so distances are exact integers — no float
    summation-order risk between numpy and the SQL twin (the argmax
    tiebreak is therefore exact too).

    Scale shape: ``k`` streaming passes (greedy k-center is inherently
    iterative), each a pure ``map_batches`` computing min-distance to
    the ≤k broadcast centers (one (B×d−c)² pass per center) and
    emitting ONE candidate row per batch (per-batch argmax combiner) —
    only num_batches rows reach the driver per pass; the corpus never
    shuffles and never materializes."""
    import ray
    from ray.data.aggregate import Min

    from kgforge.common.hashing import round_away

    def _quant(col) -> np.ndarray:
        return round_away(_list_mat(col) * 1_000_000, 0).astype(np.int64)

    # seed = row with the smallest id (tiny aggregate + pruned fetch)
    seed_id = ds.select_columns([id_col]).aggregate(
        Min(id_col))[f"min({id_col})"]
    seed_row = _take_rows_by_id(ds, id_col, [seed_id])[0]
    seed_vec = round_away(
        np.asarray(seed_row[vec_col], dtype=np.float64) * 1_000_000,
        0).astype(np.int64)

    sel_ids = [int(seed_id)]
    sel_vecs = [seed_vec]
    sel_dist = [0]

    for _ in range(1, k):
        centers = np.stack(sel_vecs)           # (c, d) int64
        taken = np.asarray(sorted(sel_ids), dtype=np.int64)
        centers_ref = ray.put((centers, taken))

        def far_candidate(b: pa.Table) -> pa.Table:
            cents, done = ray.get(centers_ref)
            empty = pa.table({id_col: pa.array([], pa.int64()),
                              "dm": pa.array([], pa.int64()),
                              "vec": pa.array([], pa.list_(pa.int64()))})
            ids = b[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            live = ~np.isin(ids, done)
            if not live.any():
                return empty
            ids = ids[live]
            q = _quant(b[vec_col])[live]       # (n, d) int64
            dmin = np.full(len(ids), np.iinfo(np.int64).max,
                           dtype=np.int64)
            for c in cents:
                diff = q - c[None, :]
                np.minimum(dmin, np.einsum("ij,ij->i", diff, diff),
                           out=dmin)
            # argmax by (dmin desc, id asc)
            best = np.lexsort((ids, -dmin))[0]
            return pa.table({
                id_col: pa.array([ids[best]], pa.int64()),
                "dm": pa.array([int(dmin[best])], pa.int64()),
                "vec": pa.array([q[best].tolist()],
                                pa.list_(pa.int64()))})

        cand = ds.select_columns([id_col, vec_col]) \
            .map_batches(far_candidate, batch_format="pyarrow") \
            .to_pandas()
        if not len(cand):
            break                              # k exceeds corpus size
        order = np.lexsort((cand[id_col].to_numpy(np.int64),
                            -cand["dm"].to_numpy(np.int64)))[0]
        row = cand.iloc[order]
        sel_ids.append(int(row[id_col]))
        sel_vecs.append(np.asarray(row["vec"], dtype=np.int64))
        sel_dist.append(int(row["dm"]))

    return pa.table({
        "step": pa.array(np.arange(1, len(sel_ids) + 1,
                                   dtype=np.int64)),
        id_col: pa.array(sel_ids, pa.int64()),
        "dist_micro2": pa.array(sel_dist, pa.int64())})
