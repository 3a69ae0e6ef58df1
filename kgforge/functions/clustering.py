"""Embedding clustering and compression.

- :func:`kmeans_ds` — distributed Lloyd's k-means over the
  ``list<float>`` embedding column.  Deterministic BY CONSTRUCTION
  across cluster sizes and block orders: centroid accumulation uses
  scaled-int64 sums (each float32 coordinate is quantized once to
  2⁻²⁴ units, so partial sums commute exactly — no float summation-
  order drift), init is the k lowest-id vectors, and assignment ties
  break to the lowest cluster index.  Per iteration the shuffle is
  ``num_batches × k`` partial rows — the map stage is the combiner.
- :func:`quantize_embeddings_ds` — global per-dimension min/max int8
  scalar quantization (the standard vector-store compression).  Two
  passes: a 2×d-row min/max reduce, then a broadcast vectorized map.
  Every arithmetic op is IEEE-correctly-rounded (sub/mul/div/floor),
  so the codes are bit-identical to the DuckDB oracle.

Both ship only tiny per-batch partials to the driver (k×d scaled ints
/ 2×d floats per batch) — the embedding stream itself never leaves
the map stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

Q_SCALE = float(1 << 24)   # float32 → int64 accumulation units


def _batch_mat(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.float64)


def _init_centroids(ds, k: int, vec_col: str, id_col: str) -> np.ndarray:
    """Embeddings of the k smallest ids (deterministic seed choice):
    per-batch partial top-k keeps the candidate set tiny."""
    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:k]
        return b.take(pa.array(order))

    cand = ds.map_batches(partial, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: r[id_col])
    return np.array([r[vec_col] for r in cand[:k]], dtype=np.float64)


def _assign(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin ties → lowest c
    d2 = (-2.0 * mat @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1)


def _kmeans_fit(ds, k: int = 8, iters: int = 5,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> np.ndarray:
    """Lloyd's k-means fit → centroid matrix [k, d] (deterministic —
    see module docstring; an empty cluster keeps its previous
    centroid).  Shared by :func:`kmeans_ds` and the SemDeDup-style
    semantic blocking in ``functions/dedup.py``."""
    import ray

    centroids = _init_centroids(ds, k, vec_col, id_col)
    d = centroids.shape[1]
    assign = _assign

    for _ in range(iters):
        # broadcast via ray.put: tasks read the centroid matrix zero-
        # copy from the object store (no per-batch reserialization);
        # plain tasks, not an actor pool — per-iteration pool spin-up
        # costs more than the stateless ray.get it would amortize
        cents_ref = ray.put(centroids)

        def partial(b: pa.Table, ref=cents_ref) -> pa.Table:
            cents = ray.get(ref)
            mat = _batch_mat(b, vec_col)
            a = assign(mat, cents)
            q = np.floor(mat * Q_SCALE + 0.5).astype(np.int64)
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, a, q)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "cnt": pa.array(cnt),
                "sums": pa.array(sums.tolist(), pa.list_(pa.int64())),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k, d), dtype=np.int64)
        cnt = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["sums"], dtype=np.int64)
            cnt[r["cluster"]] += r["cnt"]
        nz = cnt > 0
        centroids = centroids.copy()
        centroids[nz] = (sums[nz] / cnt[nz, None]) / Q_SCALE
    return centroids


def kmeans_ds(ds, k: int = 8, iters: int = 5,
              vec_col: str = "embedding", id_col: str = "vec_id"):
    """Lloyd's k-means; returns (vec_id, cluster) assignments after
    ``iters`` iterations."""
    import ray

    centroids = _kmeans_fit(ds, k, iters, vec_col, id_col)
    final_ref = ray.put(centroids)

    def final_assign(b: pa.Table) -> pa.Table:
        cents = ray.get(final_ref)
        mat = _batch_mat(b, vec_col)
        a = _assign(mat, cents)
        return pa.table({
            id_col: b[id_col],
            "cluster": pa.array(a.astype(np.int64)),
        })

    return ds.map_batches(final_assign, batch_format="pyarrow")


def kmeans_local(tbl: pa.Table, k: int = 8, iters: int = 5,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
    """Single-process reference implementation (paths-agree tests)."""
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    mat = np.array(tbl[vec_col].to_pylist(), dtype=np.float64)
    cents = mat[np.argsort(ids, kind="stable")[:k]]
    q = np.floor(mat * Q_SCALE + 0.5).astype(np.int64)
    for _ in range(iters):
        d2 = (-2.0 * mat @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        a = np.argmin(d2, axis=1)
        sums = np.zeros((k, mat.shape[1]), dtype=np.int64)
        np.add.at(sums, a, q)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        nz = cnt > 0
        cents = cents.copy()
        cents[nz] = (sums[nz] / cnt[nz, None]) / Q_SCALE
    d2 = (-2.0 * mat @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return {int(i): int(c) for i, c in zip(ids, np.argmin(d2, axis=1))}


def quantize_embeddings_ds(ds, vec_col: str = "embedding",
                           id_col: str = "vec_id"):
    """Per-dimension min/max int8 quantization →
    (vec_id, codes) with codes the comma-joined 0..255 levels:
    ``code = floor((v - lo_j) * 255 / (hi_j - lo_j) + 0.5)``
    (0 when the dimension is constant)."""
    def minmax(b: pa.Table) -> pa.Table:
        mat = _batch_mat(b, vec_col)
        return pa.table({
            "lo": pa.array([mat.min(axis=0)], pa.list_(pa.float64())),
            "hi": pa.array([mat.max(axis=0)], pa.list_(pa.float64())),
        })

    parts = ds.map_batches(minmax, batch_format="pyarrow").take_all()
    lo = np.min([r["lo"] for r in parts], axis=0)
    hi = np.max([r["hi"] for r in parts], axis=0)
    import ray

    mm_ref = ray.put((lo, hi))

    def quant(b: pa.Table) -> pa.Table:
        lo2, hi2 = ray.get(mm_ref)
        span = hi2 - lo2
        ok = span > 0
        span = np.where(ok, span, 1.0)
        mat = _batch_mat(b, vec_col)
        codes = np.floor((mat - lo2) * 255.0 / span + 0.5)
        codes = np.clip(codes, 0, 255).astype(np.int64)
        codes[:, ~ok] = 0
        n, d = codes.shape
        flat = pa.array(codes.reshape(-1))
        la = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
            flat.cast(pa.string()))
        import pyarrow.compute as pc

        return pa.table({
            id_col: b[id_col],
            "codes": pc.binary_join(la, ","),
        })

    return ds.map_batches(quant, batch_format="pyarrow")

def embedding_stats_ds(ds, vec_col: str = "embedding",
                       scale: int = 1_000_000):
    """Per-dimension feature statistics over an embedding column —
    n, sum/mean, min, max in integer MICRO-units (value × ``scale``,
    rounded half-away like the rest of the engine's cents convention).
    Integer accumulation makes every stat summation-order-free and the
    mean (one exact-int → double cast + one division) bit-identical to
    the SQL twin.

    Scale shape: one combiner per batch reduces its vectors to d rows
    (``np.add.at`` / ``minimum.at`` segment ops over the flattened
    ListArray — no per-vector Python), one groupby over the d-row
    partials.  The stream never shuffles."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        col = b[vec_col].combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        par = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        lens = np.bincount(par, minlength=b.num_rows).astype(np.int64)
        dims = (np.arange(len(flat), dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]])
                            .astype(np.int64), lens))
        micro = round_away(flat * scale, 0).astype(np.int64)
        d = int(dims.max()) + 1 if len(dims) else 0
        n = np.bincount(dims, minlength=d).astype(np.int64)
        s = np.zeros(d, dtype=np.int64)
        np.add.at(s, dims, micro)
        lo = np.full(d, np.iinfo(np.int64).max, dtype=np.int64)
        hi = np.full(d, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(lo, dims, micro)
        np.maximum.at(hi, dims, micro)
        return pa.table({"dim": pa.array(np.arange(d, dtype=np.int64)),
                         "n": pa.array(n), "s": pa.array(s),
                         "lo": pa.array(lo), "hi": pa.array(hi)})

    sums = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("dim").aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="sum_micro"),
            Min("lo", alias_name="min_micro"),
            Max("hi", alias_name="max_micro"))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s = b["sum_micro"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "dim": b["dim"], "n": pc.cast(b["n"], pa.int64()),
            "sum_micro": pc.cast(b["sum_micro"], pa.int64()),
            "mean_micro": pa.array(s / n),
            "min_micro": pc.cast(b["min_micro"], pa.int64()),
            "max_micro": pc.cast(b["max_micro"], pa.int64()),
        })

    return sums.map_batches(finish, batch_format="pyarrow")


def embedding_drift_ds(ds, vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       scale: int = 1_000_000):
    """Per-dimension distribution drift between the two id-parity
    halves of an embedding table (the shard-vs-shard / old-vs-new
    ingest QA: a dimension whose mean moved is a featurization bug or
    a data-mix shift).  Same integer micro-unit convention as
    :func:`embedding_stats_ds`; the drift column is one exact-int →
    double cast + two divisions, bit-identical to the SQL twin.

    Scale shape: one combiner per batch reduces to 2·d rows (parity ×
    dim), one groupby over those partials — the stream never
    shuffles."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        col = b[vec_col].combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        par = pc.list_parent_indices(col) \
            .to_numpy(zero_copy_only=False)
        ids = b[id_col].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        lens = np.bincount(par, minlength=b.num_rows).astype(np.int64)
        dims = (np.arange(len(flat), dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]])
                            .astype(np.int64), lens))
        parity = (ids % 2)[par].astype(np.int64)
        micro = round_away(flat * scale, 0).astype(np.int64)
        d = int(dims.max()) + 1 if len(dims) else 0
        key = parity * d + dims
        n = np.bincount(key, minlength=2 * d).astype(np.int64)
        s = np.zeros(2 * d, dtype=np.int64)
        np.add.at(s, key, micro)
        return pa.table({
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), 2)),
            "parity": pa.array(np.repeat([0, 1], d).astype(np.int64)),
            "n": pa.array(np.concatenate([n[:d], n[d:]])),
            "s": pa.array(np.concatenate([s[:d], s[d:]]))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["dim", "parity"]).aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s")) \
        .to_pandas().sort_values(["dim", "parity"])

    piv = agg.pivot(index="dim", columns="parity", values=["n", "s"]) \
        .fillna(0).astype(np.int64)
    dims = piv.index.to_numpy().astype(np.int64)
    ne = piv[("n", 0)].to_numpy()
    no = piv[("n", 1)].to_numpy()
    se = piv[("s", 0)].to_numpy()
    so = piv[("s", 1)].to_numpy()
    mean_e = se.astype(np.float64) / np.maximum(ne, 1)
    mean_o = so.astype(np.float64) / np.maximum(no, 1)
    return pa.table({
        "dim": pa.array(dims),
        "n_even": pa.array(ne), "n_odd": pa.array(no),
        "sum_even_micro": pa.array(se), "sum_odd_micro": pa.array(so),
        "drift_micro": pa.array(mean_e - mean_o, pa.float64())})


def embedding_cov_ds(ds, vec_col: str = "embedding", k: int = 20,
                     scale: int = 1_000_000) -> pa.Table:
    """Top-``k`` most-covarying dimension pairs of the embedding
    cloud — the redundancy / feature-collapse census (strongly
    covarying dimensions mean wasted capacity; the precursor to a
    whitening decision).  Vectors quantize to the shared micro grid
    and every accumulation is integral: per-batch partials are the
    exact Gram ``S = Qᵀ Q``, the dimension sums and the row count;
    the driver folds them in Python ints (no overflow at any row
    count) and ranks pairs by ``|cov_scaled| = |n·S_ij − s_i·s_j|``
    (count-scaled covariance, exact).  Reported per pair:
    ``cov_pico = cov_scaled // (n·(n−1))`` (micro² units) and
    ``corr_micro`` via one IEEE-exact double cast + sqrt + divide
    sequence mirrored verbatim by the SQL twin.

    Scale shape: one streaming pass; each batch ships ONE d×d int64
    partial (d²-bounded, never row-bounded; the in-batch matmul is
    int64-safe for |q| ≤ 10⁶ up to ~9M rows per batch); the fold and
    the k-row ranking run on the driver."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        col = b[vec_col].combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        par = pc.list_parent_indices(col) \
            .to_numpy(zero_copy_only=False)
        n = b.num_rows
        lens = np.bincount(par, minlength=n).astype(np.int64)
        d = int(lens.max()) if n else 0
        q = round_away(flat * scale, 0).astype(np.int64) \
            .reshape(n, d)
        gram = q.T @ q
        # self-describing tagged cells (batches may be re-concatenated
        # downstream): [0, d²) gram, [d², d²+d) dim sums, d²+d count,
        # -1 the dimension itself (folded with max, not sum)
        cells = np.concatenate([
            np.arange(d * d + d + 1, dtype=np.int64), [-1]])
        vals = np.concatenate([
            gram.reshape(-1), q.sum(axis=0), [np.int64(n)],
            [np.int64(d)]])
        return pa.table({"cell": pa.array(cells),
                         "v": pa.array(vals.astype(np.int64))})

    parts = ds.select_columns([vec_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .iter_batches(batch_format="pyarrow")

    acc, d = {}, 0
    for p in parts:
        for c, v in zip(p["cell"].to_numpy(zero_copy_only=False),
                        p["v"].to_numpy(zero_copy_only=False)):
            c, v = int(c), int(v)
            if c == -1:
                d = max(d, v)
            else:
                acc[c] = acc.get(c, 0) + v

    S = {c: v for c, v in acc.items() if c < d * d}
    s_sum = {i: acc.get(d * d + i, 0) for i in range(d)}
    n_tot = acc.get(d * d + d, 0)
    var = {i: n_tot * S.get(i * d + i, 0) - s_sum.get(i, 0) ** 2
           for i in range(d)}
    rows = []
    for i in range(d):
        for j in range(i + 1, d):
            cov = n_tot * S.get(i * d + j, 0) \
                - s_sum.get(i, 0) * s_sum.get(j, 0)
            rows.append((abs(cov), i, j, cov))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    rows = rows[:k]
    den = n_tot * (n_tot - 1)
    corr = [int(round_away(
        float(cv) / np.sqrt(float(var[i]) * float(var[j]))
        * 1_000_000, 0)) if var[i] and var[j] else 0
        for _, i, j, cv in rows]
    # sign-magnitude division: DuckDB // truncates toward zero on
    # negatives while Python floors — abs() makes them agree
    pico = [(1 if cv >= 0 else -1) * (abs(cv) // den)
            for _, _, _, cv in rows]
    return pa.table({
        "dim_i": pa.array([r[1] for r in rows], pa.int64()),
        "dim_j": pa.array([r[2] for r in rows], pa.int64()),
        "cov_pico": pa.array(pico, pa.int64()),
        "corr_micro": pa.array(corr, pa.int64())})
