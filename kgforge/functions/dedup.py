"""Document deduplication at training-data scale.

Five families, each a streaming Ray Data composition (no full
materialization; the only wide steps are hash-keyed groupbys):

- **Exact**   — md5 content hash → ``groupby(hash)`` keep min-id +
  count.  At 100 TB the groupby key is the 16-byte digest, never the
  text, so the shuffle moves only (hash, id) pairs.
- **Normalized exact** — same after lowercase + punctuation strip.
- **MinHash + LSH** — char-shingle → 128-perm minhash → 16 bands →
  ``groupby(band, band_hash)`` → candidate pairs kept when the
  *signature-estimated* Jaccard (fraction of agreeing minhash slots)
  is ≥ θ inside the group.  The classic
  shingle→minhash→band→bucket-groupby plan: only signatures shuffle.
  For exact shingle-Jaccard verification use the blocked n-gram
  Jaccard family below (:func:`jaccard_blocked_pairs_ds`).
- **SimHash** — 64-bit token-weighted simhash, split into 4×16-bit
  sub-keys; documents sharing any sub-key are candidates (Hamming ≤ 3
  guarantee by pigeonhole); verified by full simhash Hamming distance.
- **n-gram Jaccard (blocked)** — exact Jaccard over 5-char shingles
  within deterministic blocks ``(source, n_tokens)``; the
  SQL-verifiable ground-truth variant (same blocking expressible in
  DuckDB), used as the oracle-checked member of the family.
- **Embedding cosine** — exact near-dup pairs within ``label`` blocks
  (numpy matmul per group) + an LSH-bucketed variant for the unblocked
  case (random-hyperplane 16-bit buckets).

Pair outputs are canonicalized ``id_a < id_b`` and deduplicated, so
results are set-comparable.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgforge.common.hashing import round_away
from kgforge.oracle.minhash import MinHasher

SHINGLE_N = 5          # char n-grams for document near-dup
DEFAULT_THETA = 0.80   # verified-Jaccard threshold


def _partitioned_block_verify(ds, key_cols, verify_fn,
                              empty: pa.Table | None = None,
                              num_partitions: int = 64):
    """Per-block verification re-planned onto HASH PARTITIONS of the
    block key: ``num_partitions`` Ray group callbacks total (never one
    per block — LSH bucket / cluster / block-key cardinality is O(n)
    at web scale), with the per-block verify looping IN-PROCESS over
    the sorted block runs of each partition.  Same physical shape as
    ``stages/linking.py::_block_pairs_ds`` (r4 VERDICT item 1).

    ``verify_fn`` receives one block's rows (a table slice WITHOUT the
    key columns' guarantee of presence — slices keep all columns) and
    returns its pair table; ``empty`` pins the output schema when a
    partition yields nothing.
    """
    from kgforge.functions.graph import _multi_key_codes

    key_cols = list(key_cols)

    def add_p(b: pa.Table) -> pa.Table:
        return b.append_column("__p", pa.array(
            _multi_key_codes(b, key_cols, num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__p"])
        n = t.num_rows
        if n == 0:
            return empty if empty is not None else verify_fn(t.slice(0, 0))
        t = t.take(pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in key_cols]))
        brk = np.zeros(n, dtype=bool)
        brk[0] = True
        for c in key_cols:
            arr = t[c].combine_chunks()
            if pa.types.is_integer(arr.type):
                codes = arr.to_numpy(zero_copy_only=False)
            else:
                codes = pc.fill_null(arr.dictionary_encode().indices,
                                     -1).to_numpy(zero_copy_only=False)
            brk[1:] |= codes[1:] != codes[:-1]
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]])
        parts = []
        for i in range(len(starts)):
            r = verify_fn(t.slice(int(starts[i]),
                                  int(ends[i] - starts[i])))
            if r.num_rows:
                parts.append(r)
        if parts:
            return pa.concat_tables(parts)
        return empty if empty is not None else verify_fn(t.slice(0, 0))

    return ds.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact / normalized-exact
# ---------------------------------------------------------------------------

def _md5_col(texts) -> pa.Array:
    """md5 hex per text — one DuckDB C call per batch (see
    ``hashing.md5_hex_arr``), not a per-row hashlib loop."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import md5_hex_arr

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        return md5_hex_arr(pc.fill_null(texts, ""))
    return md5_hex_arr(pa.array([t or "" for t in texts], pa.string()))


def exact_dedup_ds(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (content_hash, doc_id=min id in group, n_dups).  One groupby
    on the digest; ``n_dups > 1`` rows are the duplicate clusters."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: pa.table({"content_hash": _md5_col(b[text_col]),
                            id_col: b[id_col]}),
        batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups"))


_NORM_RE = re.compile(r"[^a-z0-9 ]+")


def normalize_text(t: str) -> str:
    """lowercase + drop non-[a-z0-9 ] + collapse whitespace — shared
    verbatim with the SQL oracle."""
    return re.sub(r" +", " ", _NORM_RE.sub("", (t or "").lower())).strip()


def normalized_dedup_ds(ds, text_col: str = "text", id_col: str = "doc_id"):
    from ray.data.aggregate import Count, Min

    def norm_hash(b: pa.Table) -> pa.Table:
        texts = [normalize_text(t) for t in b[text_col].to_pylist()]
        return pa.table({"content_hash": _md5_col(texts), id_col: b[id_col]})

    return ds.map_batches(norm_hash, batch_format="pyarrow") \
        .groupby("content_hash").aggregate(
            Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups"))


# ---------------------------------------------------------------------------
# shingling (shared by minhash / jaccard paths)
# ---------------------------------------------------------------------------

_POLY_BASE = np.uint64(1099511628211)          # FNV prime


def doc_shingles(text: str, n: int = SHINGLE_N) -> np.ndarray:
    """Distinct hashed char n-gram shingles of a document (uint64).

    Vectorized polynomial hash over a sliding codepoint window (one
    UTF-32 pass + one matmul) — the per-gram blake2b loop cost ~3-5s
    per 5k documents.  Hash family choice only affects minhash
    estimates, not any oracle-checked output."""
    t = text or ""
    if not t:
        return np.empty(0, dtype=np.uint64)
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.uint64)
    if len(codes) < n:
        win = codes[None, :]
        k = len(codes)
    else:
        win = np.lib.stride_tricks.sliding_window_view(codes, n)
        k = n
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = 1
        if k > 1:
            np.multiply.accumulate(
                np.full(k - 1, _POLY_BASE, dtype=np.uint64),
                out=powers[1:])
        h = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
        # final avalanche (splitmix64-ish) to decorrelate low bits
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return np.unique(h)


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

class _MinhashSigner:
    """Stateful band-signer: per-actor MinHasher init (SURVEY §2.3 A4).

    Emits 16 band rows per doc carrying the full 128-perm signature as
    a 1 KiB binary blob — the shuffle moves signatures, never document
    text, so candidate verification needs no second read of the corpus.
    """

    def __init__(self, text_col: str, id_col: str, shingle_n: int):
        self.hasher = MinHasher()
        self.text_col, self.id_col, self.n = text_col, id_col, shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        sets = [doc_shingles(t, self.n) for t in texts]
        sigs = self.hasher.signatures(sets)           # [n, 128] u64
        bands = self.hasher.band_hashes(sigs)         # [n, 16]
        nb = self.hasher.num_bands
        n = len(ids)
        sig_bytes = [sigs[i].tobytes() for i in range(n)]
        return pa.table({
            "band": pa.array(np.tile(np.arange(nb, dtype=np.int32), n)),
            "band_hash": pa.array(bands.reshape(-1), pa.uint64()),
            self.id_col: pa.array(np.repeat(np.asarray(ids), nb)),
            "sig": pa.array(
                [sig_bytes[i] for i in range(n) for _ in range(nb)],
                pa.binary()),
        })


def minhash_dedup_pairs_ds(ds, text_col: str = "text",
                           id_col: str = "doc_id",
                           theta: float = DEFAULT_THETA,
                           shingle_n: int = SHINGLE_N,
                           num_buckets: int | None = None):
    """Near-duplicate pairs via MinHash banding, verified by signature
    similarity (estimated Jaccard = fraction of equal permutations).

    Scale shape: only (band, band_hash, id, sig) rows shuffle.  An
    exact-Jaccard confirmation pass, when required, re-reads just the
    candidate doc_ids from the source with a pruned read — the
    SQL-verifiable exact variant is :func:`jaccard_blocked_pairs_ds`.

    ``num_buckets`` is ONLY a partitioning knob (verification still
    groups by exact ``(band, band_hash)`` inside each bucket, so the
    pair set is invariant to it — tested).  Default scales with the
    cluster (4 × CPUs, min 64): a fixed modulus caps the verify
    stage's parallelism AND lets per-group size grow with the corpus.
    """
    if num_buckets is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 16)) \
            if ray.is_initialized() else 16
        num_buckets = max(64, 4 * cpus)

    signed = ds.map_batches(
        _MinhashSigner,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col,
                               "shingle_n": shingle_n},
        batch_format="pyarrow", concurrency=(1, 8))

    def verify_one(g: pa.Table) -> pa.Table:
        """One exact (band, band_hash) bucket → pairs whose
        signature-estimated Jaccard clears theta.  Outputs ride
        ``take`` on the input id column so the id type follows the
        caller's schema even for 0-row results."""
        ids = g[id_col].to_pylist()
        first: dict = {}
        for row, i in enumerate(ids):
            if i not in first:
                first[i] = row
        members = sorted(first.items())
        a_idx: list[int] = []
        b_idx: list[int] = []
        j_out: list[float] = []
        if len(members) > 1:
            sig_blobs = g["sig"].to_pylist()
            sigs = np.stack([np.frombuffer(sig_blobs[r], dtype=np.uint64)
                             for _, r in members])
            for x in range(len(members)):
                eq = (sigs[x + 1:] == sigs[x]).mean(axis=1)
                for off in np.nonzero(eq >= theta)[0]:
                    a_idx.append(members[x][1])
                    b_idx.append(members[x + 1 + off][1])
                    j_out.append(round(float(eq[off]), 4))
        idc = g[id_col].combine_chunks()
        return pa.table({"id_a": idc.take(pa.array(a_idx, pa.int64())),
                         "id_b": idc.take(pa.array(b_idx, pa.int64())),
                         "jaccard": pa.array(j_out, pa.float64())})

    pairs = _partitioned_block_verify(
        signed, ["band", "band_hash"], verify_one,
        num_partitions=num_buckets)
    # same pair can surface from several bands → dedup
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("jaccard", alias_name="jaccard"))


# ---------------------------------------------------------------------------
# blocked exact n-gram Jaccard (SQL-verifiable ground truth)
# ---------------------------------------------------------------------------

def _doc_shingle_voids(text: str, n: int) -> np.ndarray:
    """Distinct char-``n``-gram shingles of one doc as SORTED fixed-width
    void values (raw UTF-32 codepoint windows — exact string identity,
    no hash collisions).  Strings shorter than ``n`` become one
    whole-string shingle padded with 0xFFFFFFFF (not a valid codepoint,
    so a padded short doc can never collide with a real n-gram);
    empty → no shingles, mirroring ``_string_shingle_set``."""
    t = text or ""
    if not t:
        return np.empty(0, dtype=np.dtype((np.void, 4 * n)))
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    if len(codes) < n:
        win = np.full((1, n), 0xFFFFFFFF, dtype=np.uint32)
        win[0, :len(codes)] = codes
    else:
        win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(codes, n))
    return np.unique(win.view(np.dtype((np.void, 4 * n))).ravel())


def jaccard_blocked_pairs_ds(ds, block_cols=("source",),
                             text_col: str = "text", id_col: str = "doc_id",
                             theta: float = 0.5, shingle_n: int = SHINGLE_N,
                             num_partitions: int = 64,
                             metric: str = "jaccard"):
    """Exact shingle-Jaccard pairs within deterministic blocks — the
    oracle-checked member of the dedup family (same blocks + shingles
    expressible in DuckDB SQL).

    ``metric="containment"`` switches the score to Broder containment
    ``|A∩B| / min(|A|, |B|)`` (output column ``containment``) — the
    asymmetric subset-duplication detector (a short doc quoted whole
    inside a long one scores 1.0 where Jaccard stays near 0): the
    RefinedWeb/Lee-et-al. near-dup criterion for quote/boilerplate
    absorption.  Same blocks, same shingle stream, same SQL
    expressibility (``least(ca.n, cb.n)`` denominator).

    r5 re-plan (VERDICT r4 items 1+2): blocks ride HASH PARTITIONS of
    the block key (P Ray callbacks, not one per block), and the
    per-block verify is fully vectorized — per-doc distinct shingles
    via one UTF-32 void view + ``np.unique``, then ALL pairwise
    intersection counts at once by co-occurrence accumulation over the
    gram-sorted stream (``np.add.at`` on a k×k int32 matrix; the former
    plan ran an O(k²) Python loop of Python-set intersections —
    12.5M set ops for one 5k-doc block)."""
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    out_col = metric

    def pairs_of(group: pa.Table) -> pa.Table:
        k = group.num_rows
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          out_col: pa.array([], pa.float64())})
        if k < 2:
            return empty
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        texts = group[text_col].to_pylist()
        texts = [texts[i] for i in order]
        grams: list[np.ndarray] = []
        owner: list[np.ndarray] = []
        m = np.zeros(k, dtype=np.int64)
        for x, t in enumerate(texts):
            vu = _doc_shingle_voids(t, shingle_n)
            m[x] = len(vu)
            if len(vu):
                grams.append(vu)
                owner.append(np.full(len(vu), x, dtype=np.int64))
        counts = np.zeros((k, k), dtype=np.int32)
        if grams:
            flat = np.concatenate(grams)
            own = np.concatenate(owner)
            gid = np.unique(flat, return_inverse=True)[1]
            o2 = np.lexsort((own, gid))
            g, d = gid[o2], own[o2]
            # within each gram run docs are ascending and distinct, so
            # offset-t neighbors with equal gram give d_lo < d_hi pairs;
            # once no run reaches length t+1 no larger offset can either
            t_off = 1
            while t_off < len(g):
                same = g[t_off:] == g[:-t_off]
                if not same.any():
                    break
                np.add.at(counts, (d[:-t_off][same], d[t_off:][same]), 1)
                t_off += 1
        iu, ju = np.triu_indices(k, k=1)
        inter = counts[iu, ju].astype(np.float64)
        if metric == "containment":
            den = np.minimum(m[iu], m[ju]).astype(np.float64)
        else:
            den = (m[iu] + m[ju]).astype(np.float64) - inter
        j = np.where(den > 0, inter / np.maximum(den, 1.0), 1.0)
        mask = j >= theta
        if not mask.any():
            return empty
        return pa.table({
            "id_a": pa.array(ids[iu[mask]], pa.int64()),
            "id_b": pa.array(ids[ju[mask]], pa.int64()),
            out_col: pa.array(round_away(j[mask], 4), pa.float64())})

    pruned = ds.select_columns(
        list(dict.fromkeys(list(block_cols) + [id_col, text_col])))
    return _partitioned_block_verify(pruned, list(block_cols), pairs_of,
                                     num_partitions=num_partitions)


def containment_blocked_pairs_ds(ds, block_cols=("source",),
                                 text_col: str = "text",
                                 id_col: str = "doc_id",
                                 theta: float = 0.5,
                                 shingle_n: int = SHINGLE_N,
                                 num_partitions: int = 64):
    """Broder containment pairs ``|A∩B| / min(|A|,|B|) ≥ θ`` within
    deterministic blocks — see :func:`jaccard_blocked_pairs_ds`
    (``metric="containment"``)."""
    return jaccard_blocked_pairs_ds(
        ds, block_cols=block_cols, text_col=text_col, id_col=id_col,
        theta=theta, shingle_n=shingle_n,
        num_partitions=num_partitions, metric="containment")


def _string_shingle_set(text: str, n: int) -> set:
    t = text or ""
    if len(t) < n:
        return {t} if t else set()
    return {t[i:i + n] for i in range(len(t) - n + 1)}


# ---------------------------------------------------------------------------
# exact substring-window dedup (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — fingerprint-join formulation of
# the suffix-array substring dedup: two docs are substring-dups iff they
# share an exact L-char window, and every shared window at every offset
# is caught because BOTH sides slide stride-1)
# ---------------------------------------------------------------------------

_WINDOW_L = 25          # chars per exact-match window
_WINDOW_MAX_DF = 128    # windows in more docs are boilerplate → dropped


def _window_rows(batch: pa.Table, text_col: str, id_col: str,
                 L: int) -> pa.Table:
    """Per-doc DISTINCT L-char windows → (h, id) rows; ONE batched
    DuckDB md5 call hashes every window of the batch (the u64 stands
    in for the window string — same md5 family the SQL twin joins on,
    so cross-engine equality holds by construction).  Docs shorter
    than L contribute their whole text as one window (mirroring the
    twin's ``substring(text, 1, L)`` under ``i ≤ max(len-L+1, 1)``)."""
    from kgforge.common.hashing import md5_u64_arr

    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    wins: list[str] = []
    out_id: list = []
    for did, t in zip(ids, texts):
        t = t or ""
        w = sorted({t[i:i + L] for i in range(len(t) - L + 1)}) \
            if len(t) > L else [t]
        wins.extend(w)
        out_id.extend([did] * len(w))
    if not wins:
        return pa.table({"h": pa.array([], pa.uint64()),
                         id_col: batch[id_col].slice(0, 0)})
    return pa.table({"h": pa.array(md5_u64_arr(wins), pa.uint64()),
                     id_col: pa.array(out_id,
                                      batch.schema.field(id_col).type)})


def substring_dup_pairs_ds(ds, text_col: str = "text",
                           id_col: str = "doc_id", L: int = _WINDOW_L,
                           max_df: int = _WINDOW_MAX_DF,
                           num_partitions: int = 64):
    """Exact substring-dup pairs: ``(id_a, id_b, n_shared)`` = number
    of DISTINCT L-char windows the two docs share, windows seen in
    more than ``max_df`` docs dropped as boilerplate (the SQL twin
    mirrors the cap, so the output is value-exact).

    Scale shape: only (window-md5, id) rows shuffle — never text; the
    pair stage rides hash partitions of the window hash (P callbacks),
    window-run pairs accumulate via offset-``t`` vectorized passes and
    combine per partition before ONE (id_a, id_b)-keyed sum."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    rows = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _window_rows(b, text_col, id_col, L),
        batch_format="pyarrow")

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__p", pa.array(
            _part_codes(b["h"], num_partitions)))

    def pair_partials(t: pa.Table) -> pa.Table:
        """One hash partition: every window's full df is local here.
        Pairs for all window runs at once — docs within a run are
        id-sorted and distinct, so offset-``t`` neighbours with equal
        window give id_a < id_b."""
        t = t.drop_columns(["__p"])
        empty = pa.table({"id_a": t[id_col].slice(0, 0),
                          "id_b": t[id_col].slice(0, 0),
                          "n_shared": pa.array([], pa.int64())})
        n = t.num_rows
        if n < 2:
            return empty
        t = t.sort_by([("h", "ascending"), (id_col, "ascending")])
        hv = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        brk = np.ones(n, dtype=bool)
        brk[1:] = hv[1:] != hv[:-1]
        run_id = np.cumsum(brk) - 1
        runlen = np.bincount(run_id)
        keep = (runlen[run_id] >= 2) & (runlen[run_id] <= max_df)
        if not keep.any():
            return empty
        g = run_id[keep]
        kidx = np.flatnonzero(keep)
        a_parts, b_parts = [], []
        t_off = 1
        while t_off < len(g):
            same = g[t_off:] == g[:-t_off]
            if not same.any():
                break
            a_parts.append(kidx[:-t_off][same])
            b_parts.append(kidx[t_off:][same])
            t_off += 1
        if not a_parts:
            return empty
        idc = t[id_col].combine_chunks()
        pairs = pa.table({
            "id_a": idc.take(pa.array(np.concatenate(a_parts))),
            "id_b": idc.take(pa.array(np.concatenate(b_parts)))})
        gg = pairs.group_by(["id_a", "id_b"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"id_a": gg["id_a"], "id_b": gg["id_b"],
                         "n_shared": pc.cast(gg["count_all"],
                                             pa.int64())})

    return rows.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(pair_partials, batch_format="pyarrow") \
        .groupby(["id_a", "id_b"]).aggregate(
            Sum("n_shared", alias_name="n_shared"))


def dup_span_fraction_ds(ds, text_col: str = "text",
                         id_col: str = "doc_id", L: int = _WINDOW_L,
                         num_partitions: int = 64):
    """Per-doc duplicated-span census (the Lee-et-al "how much of the
    corpus is duplicated text" metric): for each doc, ``n_win`` =
    distinct L-char windows, ``n_dup`` = those appearing in ≥ 2 docs,
    ``dup_frac`` = n_dup / n_win (round-away 4dp).  Window df is exact
    inside its hash partition; only (doc, 0/1) rows come back."""
    from ray.data.aggregate import Count, Sum

    from kgforge.functions.joins import _part_codes

    rows = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _window_rows(b, text_col, id_col, L),
        batch_format="pyarrow")

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__p", pa.array(
            _part_codes(b["h"], num_partitions)))

    def mark_dup(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__p"])
        n = t.num_rows
        if n == 0:
            return pa.table({id_col: t[id_col],
                             "dup": pa.array([], pa.int64())})
        t = t.sort_by([("h", "ascending")])
        hv = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        brk = np.ones(n, dtype=bool)
        brk[1:] = hv[1:] != hv[:-1]
        run_id = np.cumsum(brk) - 1
        dup = (np.bincount(run_id)[run_id] >= 2).astype(np.int64)
        return pa.table({id_col: t[id_col],
                         "dup": pa.array(dup, pa.int64())})

    per_doc = rows.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(mark_dup, batch_format="pyarrow") \
        .groupby(id_col).aggregate(Count(alias_name="n_win"),
                                   Sum("dup", alias_name="n_dup"))

    def finish(b: pa.Table) -> pa.Table:
        nw = b["n_win"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nd = b["n_dup"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            id_col: b[id_col],
            "n_win": pc.cast(b["n_win"], pa.int64()),
            "n_dup": pc.cast(b["n_dup"], pa.int64()),
            "dup_frac": pa.array(
                round_away(nd / np.maximum(nw, 1.0), 4), pa.float64())})

    return per_doc.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------

def _md5_u64(token: str) -> int:
    """Token hash = high 64 bits of md5 (first 16 hex chars) — chosen
    over blake2b so DuckDB (`md5(tok)`) reproduces the whole simhash
    family exactly, making ``simhash_pairs`` value-verifiable."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:16], 16)


def simhash64(text: str) -> int:
    """64-bit simhash over whitespace tokens (unweighted, duplicates
    counted; strict-majority bit vote)."""
    toks = (text or "").split()
    if not toks:
        return 0
    hashes = np.array([_md5_u64(t) for t in toks], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) &
            np.uint64(1)).astype(np.int64)
    maj = (bits.sum(axis=0) * 2 > len(toks)).astype(np.uint64)
    return int((maj << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def simhash_pairs_ds(ds, text_col: str = "text", id_col: str = "doc_id",
                     max_hamming: int = 3, max_block: int = 4096):
    """Candidate generation by 4×16-bit sub-key banding (pigeonhole: any
    pair with Hamming ≤ 3 over 64 bits shares ≥ 1 of 4 sub-keys),
    verified by exact Hamming distance (vectorized chunked popcount —
    no per-pair Python).

    ``max_block`` guards the O(k²) verify against a degenerate sub-key
    bucket (a bucket beyond it is truncated deterministically by sorted
    id; >4096 docs sharing a 16-bit sub-key means the sub-key carries
    no near-dup signal — same guard the linking stage uses)."""
    def sign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sh = np.array([simhash64(t) for t in batch[text_col].to_pylist()],
                      dtype=np.uint64)
        n = len(ids)
        subs = np.stack([(sh >> np.uint64(16 * k)) & np.uint64(0xFFFF)
                         for k in range(4)], axis=1)   # [n, 4]
        return pa.table({
            "sub": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
            "sub_key": pa.array(subs.reshape(-1), pa.uint64()),
            id_col: pa.array(np.repeat(np.asarray(ids), 4)),
            "simhash": pa.array(np.repeat(sh, 4), pa.uint64()),
        })

    def verify(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist())
        sh = group["simhash"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        k = len(ids)
        if k > max_block:
            import logging

            logging.getLogger(__name__).warning(
                "simhash bucket truncated: %d docs share one 16-bit "
                "sub-key (cap %d); pairs among the dropped tail are "
                "not reported (the oracle SQL mirrors this cap)",
                k, max_block)
            ids, sh = ids[:max_block], sh[:max_block]
            k = max_block
        a_out, b_out, d_out = [], [], []
        for s in range(0, k, 512):
            e = min(k, s + 512)
            x = sh[s:e, None] ^ sh[None, :]           # [r, k] u64
            bits = np.unpackbits(
                x.view(np.uint8).reshape(e - s, k, 8), axis=2)
            ham = bits.sum(axis=2, dtype=np.int64)    # [r, k]
            ri, ci = np.nonzero(ham <= max_hamming)
            keep = ci > (ri + s)                      # upper triangle only
            a_out.append(ids[ri[keep] + s])
            b_out.append(ids[ci[keep]])
            d_out.append(ham[ri[keep], ci[keep]])
        return pa.table({
            "id_a": pa.array(np.concatenate(a_out) if a_out else []),
            "id_b": pa.array(np.concatenate(b_out) if b_out else []),
            "hamming": pa.array(
                np.concatenate(d_out) if d_out else [], pa.int64())})

    from ray.data.aggregate import Min

    from kgforge.functions.joins import _part_codes

    def add_p(b: pa.Table) -> pa.Table:
        sub = b["sub"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        key = b["sub_key"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        combo = pa.array((sub << np.uint64(16)) | key, pa.uint64())
        return b.append_column("__p", pa.array(
            _part_codes(combo, 64)))

    def verify_partition(t: pa.Table) -> pa.Table:
        """All (sub, sub_key) buckets of one hash partition — P Ray
        callbacks total (the raw banding key space is 4×2¹⁶ groups);
        the O(k²) popcount verify loops IN-PROCESS over bucket runs."""
        t = t.sort_by([("sub", "ascending"), ("sub_key", "ascending")])
        sub = t["sub"].combine_chunks().to_numpy(zero_copy_only=False)
        key = t["sub_key"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        n = t.num_rows
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (sub[1:] != sub[:-1]) | (key[1:] != key[:-1])
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]])
        parts = []
        for i in range(len(starts)):
            g = t.slice(int(starts[i]), int(ends[i] - starts[i]))
            r = verify(g)
            if r.num_rows:
                parts.append(r)
        if not parts:
            return verify(t.slice(0, 0))
        return pa.concat_tables(parts)

    signed = ds.map_batches(sign, batch_format="pyarrow")
    pairs = signed.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(
            lambda t: verify_partition(t.drop_columns(["__p"])),
            batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

_EMPTY_COS_PAIRS = pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})


def _cosine_pairs_of(group: pa.Table, id_col: str, vec_col: str,
                     tau: float) -> pa.Table:
    """One block → exact cosine pairs ≥ tau (one matmul, id-sorted so
    the output is layout-invariant)."""
    if group.num_rows < 2:
        return _EMPTY_COS_PAIRS
    ids = np.asarray(group[id_col].to_pylist())
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.array(group[vec_col].to_pylist(), dtype=np.float64)[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    sims = unit @ unit.T
    iu, ju = np.triu_indices(len(ids), k=1)
    mask = sims[iu, ju] >= tau
    return pa.table({
        "id_a": pa.array(ids[iu[mask]], pa.int64()),
        "id_b": pa.array(ids[ju[mask]], pa.int64()),
        "cos_sim": pa.array(round_away(sims[iu, ju][mask], 4),
                            pa.float64()),
    })


def embedding_dup_pairs_ds(ds, block_col: str = "label",
                           vec_col: str = "embedding",
                           id_col: str = "vec_id", tau: float = 0.99,
                           num_partitions: int = 64):
    """Exact cosine-similar pairs within blocks (numpy matmul per
    block, blocks riding hash partitions of ``block_col`` — P Ray
    callbacks, not one per block value; VERDICT r4 item 1).
    ``block_col=None`` variant at scale: LSH hyperplane bucketing
    (see :func:`embedding_lsh_pairs_ds`)."""
    pruned = ds.select_columns(
        list(dict.fromkeys([block_col, id_col, vec_col])))
    return _partitioned_block_verify(
        pruned, [block_col],
        lambda g: _cosine_pairs_of(g, id_col, vec_col, tau),
        empty=_EMPTY_COS_PAIRS, num_partitions=num_partitions)


def embedding_lsh_pairs_ds(ds, vec_col: str = "embedding",
                           id_col: str = "vec_id", tau: float = 0.99,
                           n_tables: int = 4, planes_per_table: int = 8,
                           dim: int = 64, seed: int = 42):
    """Multi-table random-hyperplane LSH → exact cosine verify per
    bucket (classic (L, k) LSH: each of ``n_tables`` tables hashes a
    vector with ``planes_per_table`` hyperplane signs; a pair is a
    candidate if it collides in ANY table — recall at similarity s is
    1-(1-p^k)^L with p = 1 - acos(s)/π).

    The scale path for unblocked embedding dedup: only (table, bucket,
    id, vector) rows shuffle — L rows per vector, never O(n²).
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, dim, planes_per_table))

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        n = mat.shape[0]
        tabs, keys, ids, vecs = [], [], [], []
        id_list = batch[id_col].to_pylist()
        vec_list = batch[vec_col].to_pylist()
        for t in range(n_tables):
            proj = (mat @ planes[t]) > 0
            key = (proj.astype(np.uint64) <<
                   np.arange(planes_per_table, dtype=np.uint64)).sum(axis=1)
            tabs.extend([t] * n)
            keys.extend(key.tolist())
            ids.extend(id_list)
            vecs.extend(vec_list)
        out = pa.table({
            id_col: pa.array(ids, batch.schema.field(id_col).type),
            vec_col: pa.array(vecs, batch.schema.field(vec_col).type),
            "bucket": pa.array(
                [t << 60 | k for t, k in zip(tabs, keys)], pa.uint64()),
        })
        return out

    from ray.data.aggregate import Max

    pairs = _partitioned_block_verify(
        ds.map_batches(bucketize, batch_format="pyarrow"), ["bucket"],
        lambda g: _cosine_pairs_of(g, id_col, vec_col, tau),
        empty=_EMPTY_COS_PAIRS)
    # a pair may collide in several tables → dedup
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("cos_sim", alias_name="cos_sim"))


def semantic_dup_pairs_ds(ds, k: int = 8, iters: int = 5,
                          tau: float = 0.99,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id"):
    """SemDeDup-style semantic near-dedup (Abbas et al., 2023):
    deterministic k-means buckets the embedding space, then EXACT
    cosine pairs are verified only WITHIN each cluster — the candidate
    verify drops from O(n²) to Σ_c k_c² with a LEARNED blocking key
    (``embedding_dup_pairs_ds`` needs a label column; this needs
    nothing but the vectors).  Pairs straddling a centroid boundary
    are missed by design — the SemDeDup trade; raise ``k`` with corpus
    size (k ≈ n / target-cluster-size) to keep per-cluster cost flat.

    Scale shape: centroids fit via the engine's integer-deterministic
    k-means (broadcast matrix, int64-summed partials), ONE tagging map
    (vector + cluster id), one cluster-keyed verify (k groups, each a
    vectorized matmul).  Rows-only driver entry: the blocking depends
    on the iterative centroids (SQL-inexpressible); within-cluster
    equivalence to the exact operator and layout-invariance are
    pytest-bounded."""
    import ray

    from kgforge.functions.clustering import (_assign, _batch_mat,
                                              _kmeans_fit)

    cents = _kmeans_fit(ds, k, iters, vec_col, id_col)
    ref = ray.put(cents)

    def tag(b: pa.Table) -> pa.Table:
        mat = _batch_mat(b, vec_col)
        a = _assign(mat, ray.get(ref))
        return pa.table({id_col: b[id_col], vec_col: b[vec_col],
                         "cluster": pa.array(a.astype(np.int64))})

    return _partitioned_block_verify(
        ds.map_batches(tag, batch_format="pyarrow"), ["cluster"],
        lambda g: _cosine_pairs_of(g, id_col, vec_col, tau),
        empty=_EMPTY_COS_PAIRS, num_partitions=min(64, k))


# ---------------------------------------------------------------------------
# near-dup clusters (connected components) + deterministic hash split
# ---------------------------------------------------------------------------

def propagate_min_labels(labels, edges, id_type, label_type=None,
                         max_rounds: int = 64):
    """Distributed min-label propagation to fixpoint: each round every
    node's label becomes the min of its own and its neighbors' labels
    — one union + two keyed groupbys per round, nothing collected to
    the driver.  Rounds ≈ component diameter; labels only ever
    decrease, so a checksum over all labels is a sound fixpoint test
    (int labels sum; string labels use a stable content hash).

    ``labels`` is the initial ``(node, label)`` dataset (label can be
    any totally-ordered Arrow type — an int id for plain connected
    components, or a composite sort-key string that encodes an
    election rule so the component minimum IS the elected winner);
    ``edges`` is the symmetric ``(src, dst)`` dataset.  Returns the
    fixpoint ``(node, label)`` dataset."""
    import logging

    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    label_type = label_type or id_type

    def _checksum(lab_ds) -> int:
        if pa.types.is_string(label_type):
            def h(b: pa.Table) -> pa.Table:
                from kgforge.common.hashing import hash_u64_np

                v = hash_u64_np(b["label"].to_pylist()).astype(np.int64)
                return pa.table({"h": pa.array(v)})

            return lab_ds.map_batches(h, batch_format="pyarrow") \
                .aggregate(Sum("h", alias_name="s"))["s"]
        return lab_ds.aggregate(Sum("label", alias_name="s"))["s"]

    from kgforge.functions.indexing import _segment_arange
    from kgforge.functions.joins import cogroup_partition_ds

    labels = labels.materialize()
    edges = edges.materialize()
    lab_schema = pa.schema([("node", id_type), ("label", label_type)])
    edge_schema = pa.schema([("src", id_type), ("dst", id_type)])

    def round_msgs(t: pa.Table, starts, nl, nr) -> pa.Table:
        """One hash partition of (labels cogrouped with edges by src):
        every node forwards its current label to itself and to each of
        its edge targets — pure run-offset index math over ALL nodes in
        the partition at once (the former plan scheduled one Ray group
        callback PER NODE per round)."""
        has = nl > 0                     # labels are unique per node
        sidx = pa.array(starts[has])
        parts = [pa.table({"node": t["__k"].take(sidx),
                           "label": t["label"].take(sidx)})]
        eruns = np.flatnonzero(has & (nr > 0))
        if eruns.size:
            rep = nr[eruns]
            lab_idx = np.repeat(starts[eruns], rep)
            dst_idx = np.repeat(starts[eruns] + nl[eruns], rep) \
                + _segment_arange(rep)
            parts.append(pa.table({
                "node": t["dst"].take(pa.array(dst_idx)),
                "label": t["label"].take(pa.array(lab_idx))}))
        return pa.concat_tables(parts)

    checksum = _checksum(labels)
    for _ in range(max_rounds):
        msgs = cogroup_partition_ds(
            labels, edges, "node", "src", round_msgs,
            ["label"], ["dst"],
            left_schema=lab_schema, right_schema=edge_schema)
        labels = msgs \
            .groupby("node").aggregate(Min("label", alias_name="label")) \
            .materialize()
        new_sum = _checksum(labels)
        if new_sum == checksum:
            break
        checksum = new_sum
    else:
        logging.getLogger(__name__).warning(
            "min-label propagation hit max_rounds=%d before "
            "fixpoint; labels may span a component diameter larger "
            "than the round budget", max_rounds)
    return labels


def _dup_clusters_propagate(edges, id_type, max_rounds: int = 64):
    """Connected components over symmetric ``(src, dst)`` edges via
    :func:`propagate_min_labels` with each node's own id as its
    initial label — the fixpoint label is the component minimum."""
    from ray.data.aggregate import Min

    def init_labels(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["src"], "label": b["src"]})

    labels = edges.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("label", alias_name="label"))
    labels = propagate_min_labels(labels, edges, id_type,
                                  max_rounds=max_rounds)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["node"], "cluster_id": b["label"]})

    return labels.map_batches(finish, batch_format="pyarrow")


def dup_clusters_ds(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                    driver_max_pairs: int = 5_000_000):
    """Connected components over a near-dup pair set → one
    ``(doc_id, cluster_id)`` row per doc that appears in ≥ 1 pair;
    ``cluster_id`` = the component's minimum doc id (the canonical
    keeper under keep-first dedup policy).

    Path selection (same auto pattern as ``build_alias_map``): the
    PAIR set is usually the small side (pairs ≪ corpus by construction
    of any blocked/LSH candidate generator), so up to
    ``driver_max_pairs`` the union-find runs on the driver over
    collected pairs.  Beyond it, :func:`_dup_clusters_propagate` runs
    iterative min-label propagation fully distributed (integer ids
    required — ours are int64 doc ids).  Both paths produce identical
    labels (paths-agree tested).
    """
    import ray
    import ray.data as rd

    from kgforge.oracle.linking import UnionFind

    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs > driver_max_pairs:
        def sym(b: pa.Table) -> pa.Table:
            return pa.concat_tables([
                pa.table({"src": b[id_a], "dst": b[id_b]}),
                pa.table({"src": b[id_b], "dst": b[id_a]})])

        edges = pairs_ds.map_batches(sym, batch_format="pyarrow")
        id_type = pairs_ds.schema().base_schema.field(id_a).type
        return _dup_clusters_propagate(edges, id_type)

    tables = [t for t in ray.get(pairs_ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64())}))
    pairs = pa.concat_tables([t.select([id_a, id_b]) for t in tables])
    ids = pc.unique(pa.chunked_array([pairs[id_a].combine_chunks(),
                                      pairs[id_b].combine_chunks()]))
    ids = sorted(ids.to_pylist())
    idx = {v: i for i, v in enumerate(ids)}
    uf = UnionFind(len(ids))
    for a, b in sorted(zip(pairs[id_a].to_pylist(),
                           pairs[id_b].to_pylist())):
        uf.union(idx[a], idx[b])
    roots: dict[int, int] = {}
    cluster = []
    for v in ids:
        r = uf.find(idx[v])
        if r not in roots:
            roots[r] = v            # ids sorted → first member is min
        cluster.append(roots[r])
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "cluster_id": pa.array(cluster, pa.int64())}))


def lsh_recall_ds(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                  tau: float = 0.3, num_partitions: int = 32):
    """Candidate-generator QUALITY metric: recall of the hyperplane-LSH
    pair generator against exact all-pairs ground truth at the same
    ``tau`` → one row (n_exact, n_lsh, n_hit, recall).

    The ground truth is an O(n²) all-pairs cosine — an EVALUATION
    operator: at corpus scale you run it on a hash-sample (see
    ``hash_split_ds``) exactly as ANN recall is benchmarked anywhere;
    the LSH side under test is the production scale path.  The pair
    sets meet in a hash-partitioned cogroup (no driver-side set
    arithmetic); only three counters come back."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import cogroup_partition_ds

    def const_block(b: pa.Table) -> pa.Table:
        return b.append_column("__blk",
                               pa.array(np.zeros(b.num_rows, np.int8)))

    exact = embedding_dup_pairs_ds(
        ds.map_batches(const_block, batch_format="pyarrow"),
        block_col="__blk", vec_col=vec_col, id_col=id_col, tau=tau)
    lsh = embedding_lsh_pairs_ds(ds, vec_col=vec_col, id_col=id_col,
                                 tau=tau)

    def key_of(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(b["id_a"], pa.string()),
            pc.cast(b["id_b"], pa.string()), ",")
        return pa.table({"pair": k})

    ek = exact.map_batches(key_of, batch_format="pyarrow")
    lk = lsh.map_batches(key_of, batch_format="pyarrow")

    def count_hits(t: pa.Table, starts, nl, nr) -> pa.Table:
        n_exact = int((nl > 0).sum())
        n_hit = int(((nl > 0) & (nr > 0)).sum())
        # right side is already distinct pairs → its row total IS
        # n_lsh, counted here so the LSH generator runs exactly once
        return pa.table({"n_exact": pa.array([n_exact], pa.int64()),
                         "n_hit": pa.array([n_hit], pa.int64()),
                         "n_lsh": pa.array([int(nr.sum())], pa.int64())})

    parts = cogroup_partition_ds(ek, lk, "pair", "pair", count_hits,
                                 [], [], num_partitions=num_partitions) \
        .materialize()
    n_exact = parts.sum("n_exact") or 0
    n_hit = parts.sum("n_hit") or 0
    n_lsh = parts.sum("n_lsh") or 0
    recall = (round_away(np.array([n_hit / n_exact]), 4)[0]
              if n_exact else 0.0)
    return pa.table({
        "n_exact": pa.array([int(n_exact)], pa.int64()),
        "n_lsh": pa.array([int(n_lsh)], pa.int64()),
        "n_hit": pa.array([int(n_hit)], pa.int64()),
        "recall": pa.array([float(recall)], pa.float64()),
    })


def hash_split_ds(ds, id_col: str = "doc_id", train_pct: int = 80):
    """Deterministic hash-based train/test assignment: split by
    ``md5(str(doc_id))`` so membership is stable across runs, engines
    and cluster sizes (the standard leakage-safe split for training
    corpora; content- or time-based splits drift as the corpus grows).
    Pure map — no shuffle, no state."""
    import pyarrow.compute as pc

    from kgforge.common.hashing import md5_u64_arr

    def assign(batch: pa.Table) -> pa.Table:
        buckets = (md5_u64_arr(pc.cast(batch[id_col], pa.string()),
                               nhex=8) % np.uint64(100)).astype(np.int64)
        split = np.where(buckets < train_pct, "train", "test")
        return pa.table({
            id_col: batch[id_col],
            "bucket": pa.array(buckets, pa.int64()),
            "split": pa.array(split, pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact duplicate-n-gram spans (substring-level dedup signal)
# ---------------------------------------------------------------------------

def _avalanche_u64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates polynomial-hash low bits."""
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def dup_ngram_stats_ds(ds, text_col: str = "text", id_col: str = "doc_id",
                       n: int = 8, num_partitions: int = 64):
    """Per-document duplicated-substring statistics à la *Deduplicating
    Training Data Makes Language Models Better* (Lee et al., 2022),
    at word-n-gram granularity: for every document with ≥ n tokens,
    ``dup_ngrams`` = how many of its n-gram positions carry an n-gram
    that also occurs in AT LEAST ONE OTHER document, and
    ``total_ngrams`` = its n-gram position count.  ``dup_ngrams /
    total_ngrams`` is the trainable-duplication fraction used to gate
    corpus pruning.

    Scale plan: the corpus never travels — stage 1 emits one
    ``(u64 ngram hash, doc_id, pos_count)`` row per DISTINCT n-gram
    per doc (hashing is one md5 per distinct token per batch + a
    vectorized sliding-window polynomial, no per-position Python);
    stage 2 hash-partitions by the n-gram hash and flags runs seen in
    ≥ 2 docs with run-length index math; stage 3 is a doc-keyed sum.
    Two all-to-all moves, both over fixed-width integer triples.

    Tokenization is ``text.split(" ")`` — shared verbatim with the SQL
    oracle's ``string_split(text, ' ')``.  The u64 hash stands in for
    the n-gram string on the wire; at 10¹²-doc scale swap in a 128-bit
    digest to keep the collision budget (the oracle groups by the
    actual string, so a collision would surface as a value mismatch).
    """
    from ray.data.aggregate import Sum

    powers = np.empty(n, dtype=np.uint64)
    powers[0] = 1
    if n > 1:
        with np.errstate(over="ignore"):
            np.multiply.accumulate(
                np.full(n - 1, _POLY_BASE, dtype=np.uint64),
                out=powers[1:])

    empty_sign = pa.table({
        "h": pa.array([], pa.uint64()),
        id_col: pa.array([], pa.int64()),
        "pos_count": pa.array([], pa.int64())})

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        toks = [(t or "").split(" ")
                for t in batch[text_col].to_pylist()]
        flat = [w for ws in toks for w in ws]
        if not flat:
            return empty_sign
        uniq, inv = np.unique(np.asarray(flat, dtype=object),
                              return_inverse=True)
        uh = np.array([_md5_u64(w) for w in uniq], dtype=np.uint64)
        th = uh[inv]
        hs, cs, lens = [], [], []
        off = 0
        for ws in toks:
            m = len(ws)
            if m >= n:
                win = np.lib.stride_tricks.sliding_window_view(
                    th[off:off + m], n)
                with np.errstate(over="ignore"):
                    h = _avalanche_u64(
                        (win * powers[None, :]).sum(axis=1,
                                                    dtype=np.uint64))
                hu, cnt = np.unique(h, return_counts=True)
                hs.append(hu)
                cs.append(cnt.astype(np.int64))
                lens.append(len(hu))
            else:
                lens.append(0)
            off += m
        if not hs:
            return empty_sign
        return pa.table({
            "h": pa.array(np.concatenate(hs), pa.uint64()),
            id_col: pa.array(np.repeat(np.asarray(ids, dtype=np.int64),
                                       np.asarray(lens, dtype=np.int64))),
            "pos_count": pa.array(np.concatenate(cs), pa.int64())})

    def tag(b: pa.Table) -> pa.Table:
        p = (b["h"].combine_chunks().to_numpy(zero_copy_only=False)
             % np.uint64(num_partitions)).astype(np.int32)
        return b.append_column("__p", pa.array(p))

    def flag(t: pa.Table) -> pa.Table:
        t = t.sort_by([("h", "ascending")])
        hv = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(hv) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dup_ngrams": pa.array([], pa.int64()),
                             "total_ngrams": pa.array([], pa.int64())})
        starts = np.concatenate(
            [[0], np.flatnonzero(hv[1:] != hv[:-1]) + 1])
        runlen = np.diff(np.concatenate([starts, [len(hv)]]))
        dup = np.repeat(runlen >= 2, runlen)
        cnt = t["pos_count"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col],
            "dup_ngrams": pa.array(np.where(dup, cnt, 0), pa.int64()),
            "total_ngrams": pa.array(cnt, pa.int64())})

    signed = ds.map_batches(sign, batch_format="pyarrow")
    flagged = signed.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(flag, batch_format="pyarrow")
    return flagged.groupby(id_col).aggregate(
        Sum("dup_ngrams", alias_name="dup_ngrams"),
        Sum("total_ngrams", alias_name="total_ngrams"))


def cross_source_contamination_ds(ds, text_col: str = "text",
                                  group_col: str = "source",
                                  n: int = 8,
                                  num_partitions: int = 64) -> pa.Table:
    """Cross-source n-gram contamination matrix: for every unordered
    pair of distinct sources (src_a < src_b), the number of DISTINCT
    word-``n``-grams that occur in at least one document of EACH — the
    pairwise-overlap census run before mixing corpora (a leaked eval
    set, a mirrored crawl, or boilerplate shared between two dumps all
    surface as an outlier cell).  Output columns ``(src_a, src_b,
    shared_ngrams, ngrams_a, ngrams_b)`` where ``ngrams_x`` is source
    x's distinct-n-gram count, so Jaccard/containment are one division
    away.

    Scale plan: the corpus never travels — stage 1 emits one ``(u64
    n-gram hash, source)`` row per distinct n-gram per source PER
    BATCH (token hashing is one DuckDB md5 C-call per batch plus a
    vectorized sliding-window polynomial); stage 2 hash-partitions by
    the n-gram hash, dedups ``(h, source)`` with run-length index
    math, and folds each h-run's k sources into C(k,2) pair partials
    vectorized BY RUN LENGTH (one reshape + triu_indices per distinct
    k ≤ |sources|, never a per-n-gram Python loop); stage 3 is a
    groupby-sum over ≤ |sources|² keys.  Per-source totals ride the
    same exchange as (src, src) self rows.  The final pivot collects
    ≤ |sources|² + |sources| rows to the driver — the matrix itself,
    which is the contract: this operator targets source-level
    taxonomies (tens..thousands of sources), not per-document keys.

    Tokenization is ``text.split(" ")``, verbatim the SQL twin's
    ``string_split(text, ' ')``; the u64 hash stands in for the n-gram
    string on the wire (same collision contract as
    ``dup_ngram_stats_ds``).
    """
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import md5_u64_arr

    powers = np.empty(n, dtype=np.uint64)
    powers[0] = 1
    if n > 1:
        with np.errstate(over="ignore"):
            np.multiply.accumulate(
                np.full(n - 1, _POLY_BASE, dtype=np.uint64),
                out=powers[1:])

    empty_sign = pa.table({
        "h": pa.array([], pa.uint64()),
        "src": pa.array([], pa.string())})

    def sign(batch: pa.Table) -> pa.Table:
        srcs = batch[group_col].to_pylist()
        toks = [(t or "").split(" ")
                for t in batch[text_col].to_pylist()]
        flat = [w for ws in toks for w in ws]
        if not flat:
            return empty_sign
        uniq, inv = np.unique(np.asarray(flat, dtype=object),
                              return_inverse=True)
        th = md5_u64_arr(pa.array(uniq.tolist(), pa.string()))[inv]
        hs, out_src = [], []
        off = 0
        for ws, src in zip(toks, srcs):
            m = len(ws)
            if m >= n:
                win = np.lib.stride_tricks.sliding_window_view(
                    th[off:off + m], n)
                with np.errstate(over="ignore"):
                    h = _avalanche_u64(
                        (win * powers[None, :]).sum(axis=1,
                                                    dtype=np.uint64))
                hu = np.unique(h)
                hs.append(hu)
                out_src.extend([src] * len(hu))
            off += m
        if not hs:
            return empty_sign
        t = pa.table({"h": pa.array(np.concatenate(hs), pa.uint64()),
                      "src": pa.array(out_src, pa.string())})
        # batch-level dedup: same (h, src) may recur across docs
        return t.group_by(["h", "src"]).aggregate([]) \
            .select(["h", "src"])

    def tag(b: pa.Table) -> pa.Table:
        p = (b["h"].combine_chunks().to_numpy(zero_copy_only=False)
             % np.uint64(num_partitions)).astype(np.int32)
        return b.append_column("__p", pa.array(p))

    empty_pairs = pa.table({
        "src_a": pa.array([], pa.string()),
        "src_b": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        t = t.select(["h", "src"]) \
            .group_by(["h", "src"]).aggregate([]) \
            .sort_by([("h", "ascending"), ("src", "ascending")])
        hv = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(hv) == 0:
            return empty_pairs
        src_names, codes = np.unique(
            np.asarray(t["src"].to_pylist(), dtype=object),
            return_inverse=True)
        starts = np.concatenate(
            [[0], np.flatnonzero(hv[1:] != hv[:-1]) + 1])
        runlen = np.diff(np.concatenate([starts, [len(hv)]]))
        s = len(src_names)
        # self rows: each (h, src) adds 1 to src's distinct total
        self_cnt = np.bincount(codes, minlength=s).astype(np.int64)
        a_parts = [np.arange(s, dtype=np.int64)]
        b_parts = [np.arange(s, dtype=np.int64)]
        c_parts = [self_cnt]
        # pair rows, vectorized per distinct run length k
        for k in np.unique(runlen):
            if k < 2:
                continue
            runs = starts[runlen == k]
            idx = runs[:, None] + np.arange(k)[None, :]
            mat = codes[idx]                       # (m, k) sorted rows
            ii, jj = np.triu_indices(int(k), 1)
            a = mat[:, ii].ravel()
            b = mat[:, jj].ravel()
            key, cnt = np.unique(a * s + b, return_counts=True)
            a_parts.append((key // s).astype(np.int64))
            b_parts.append((key % s).astype(np.int64))
            c_parts.append(cnt.astype(np.int64))
        a_all = np.concatenate(a_parts)
        b_all = np.concatenate(b_parts)
        c_all = np.concatenate(c_parts)
        keep = c_all > 0
        names = pa.array(src_names.tolist(), pa.string())
        return pa.table({
            "src_a": pc.take(names, pa.array(a_all[keep])),
            "src_b": pc.take(names, pa.array(b_all[keep])),
            "cnt": pa.array(c_all[keep], pa.int64())})

    summed = ds.map_batches(sign, batch_format="pyarrow") \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(fold, batch_format="pyarrow") \
        .groupby(["src_a", "src_b"]).aggregate(
            Sum("cnt", alias_name="cnt"))

    import ray

    tabs = [t for t in ray.get(summed.to_arrow_refs()) if t.num_columns]
    flat = pa.concat_tables(tabs) if tabs else pa.table({
        "src_a": pa.array([], pa.string()),
        "src_b": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64())})
    sa = np.asarray(flat["src_a"].to_pylist(), dtype=object)
    sb = np.asarray(flat["src_b"].to_pylist(), dtype=object)
    cv = np.asarray(flat["cnt"].to_pylist(), dtype=np.int64) \
        if flat.num_rows else np.empty(0, dtype=np.int64)
    totals = {a: int(c) for a, b, c in zip(sa, sb, cv) if a == b}
    mask = sa != sb
    order = np.lexsort((sb[mask], sa[mask])) if mask.any() else []
    pa_, pb_, pc_ = sa[mask][order], sb[mask][order], cv[mask][order]
    return pa.table({
        "src_a": pa.array(pa_.tolist(), pa.string()),
        "src_b": pa.array(pb_.tolist(), pa.string()),
        "shared_ngrams": pa.array(pc_, pa.int64()),
        "ngrams_a": pa.array([totals[x] for x in pa_], pa.int64()),
        "ngrams_b": pa.array([totals[x] for x in pb_], pa.int64())})


def setsim_join_ds(ds, text_col: str = "text", id_col: str = "doc_id",
                   n: int = 8, tau_ppm: int = 300_000,
                   num_partitions: int = 64):
    """EXACT set-similarity self-join (Bayardo et al. "Scaling Up All
    Pairs" / PPJoin prefix filtering): all document pairs whose
    word-``n``-gram SETS have Jaccard ≥ ``tau_ppm``/1e6, with exact
    integer intersection/union — the verification-grade complement to
    the probabilistic minhash/simhash lanes.  Output ``(doc_a, doc_b,
    inter, un, jacc_ppm)``, doc_a < doc_b.

    Prefix-filter completeness: order every doc's grams by a GLOBAL
    (df, hash) rare-first order and keep the first
    ``p = m - ceil(tau*m) + 1`` as its prefix.  If J(A,B) ≥ tau then
    the smallest shared gram c has < ceil(tau*m_A) non-shared grams of
    A before it, so c sits inside BOTH prefixes and the pair surfaces
    in c's bucket — no qualifying pair is pruned.

    Scale shape: text never travels.  (1) one map emits per-doc
    DISTINCT gram-hash rows (doc, h, m); (2) df attaches in an h-hash
    partition (df is global there by construction); (3) a doc-hash
    partition sorts each doc's run by (df, h) and flags prefixes —
    materialized once, consumed three times; (4) candidates form in
    PREFIX-gram buckets (rare grams → small buckets), pair partials
    vectorized per run length, then dedup in a pair-hash partition;
    (5) verification expands each candidate by its two signatures via
    two doc-keyed cogroups and counts (pair, h) rows seen on both
    sides with one np.unique per partition — no per-pair Python loop.
    Every exchange carries (doc, distinct-gram-hash) rows or
    candidate-pair rows; the u64 gram hash stands in for the gram
    string (same collision contract as ``dup_ngram_stats_ds``)."""
    from kgforge.common.hashing import md5_u64_arr
    from kgforge.functions.joins import _part_codes

    powers = np.empty(n, dtype=np.uint64)
    powers[0] = 1
    if n > 1:
        with np.errstate(over="ignore"):
            np.multiply.accumulate(
                np.full(n - 1, _POLY_BASE, dtype=np.uint64),
                out=powers[1:])

    empty_sign = pa.table({
        id_col: pa.array([], pa.int64()),
        "h": pa.array([], pa.uint64()),
        "m": pa.array([], pa.int64())})

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        toks = [(t or "").split(" ")
                for t in batch[text_col].to_pylist()]
        flat = [w for ws in toks for w in ws]
        if not flat:
            return empty_sign
        uniq, inv = np.unique(np.asarray(flat, dtype=object),
                              return_inverse=True)
        th = md5_u64_arr(pa.array(uniq.tolist(), pa.string()))[inv]
        out_id, out_h, out_m = [], [], []
        off = 0
        for did, ws in zip(ids, toks):
            mm = len(ws)
            if mm >= n:
                win = np.lib.stride_tricks.sliding_window_view(
                    th[off:off + mm], n)
                with np.errstate(over="ignore"):
                    h = _avalanche_u64(
                        (win * powers[None, :]).sum(axis=1,
                                                    dtype=np.uint64))
                hu = np.unique(h)
                out_h.append(hu)
                out_id.append(np.full(len(hu), did, dtype=np.int64))
                out_m.append(np.full(len(hu), len(hu), dtype=np.int64))
            off += mm
        if not out_h:
            return empty_sign
        return pa.table({
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "h": pa.array(np.concatenate(out_h), pa.uint64()),
            "m": pa.array(np.concatenate(out_m), pa.int64())})

    def tag_h(b: pa.Table) -> pa.Table:
        p = (b["h"].combine_chunks().to_numpy(zero_copy_only=False)
             % np.uint64(num_partitions)).astype(np.int32)
        return b.append_column("__p", pa.array(p))

    def attach_df(t: pa.Table) -> pa.Table:
        t = t.sort_by([("h", "ascending")])
        hv = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(hv) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "h": pa.array([], pa.uint64()),
                             "m": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        starts = np.concatenate(
            [[0], np.flatnonzero(hv[1:] != hv[:-1]) + 1])
        runlen = np.diff(np.concatenate([starts, [len(hv)]]))
        df = np.repeat(runlen, runlen).astype(np.int64)
        return pa.table({id_col: t[id_col], "h": t["h"],
                         "m": t["m"], "df": pa.array(df, pa.int64())})

    def tag_doc(b: pa.Table) -> pa.Table:
        b = b.drop_columns(["__p"]) if "__p" in b.column_names else b
        return b.append_column("__p", pa.array(
            _part_codes(b[id_col], num_partitions)))

    def flag_prefix(t: pa.Table) -> pa.Table:
        t = t.sort_by([(id_col, "ascending"), ("df", "ascending"),
                       ("h", "ascending")])
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "h": pa.array([], pa.uint64()),
                             "m": pa.array([], pa.int64()),
                             "pref": pa.array([], pa.bool_())})
        m = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [[0], np.flatnonzero(ids[1:] != ids[:-1]) + 1])
        runlen = np.diff(np.concatenate([starts, [len(ids)]]))
        pos = np.arange(len(ids)) - np.repeat(starts, runlen)
        need = (tau_ppm * m + 999_999) // 1_000_000    # ceil(tau*m)
        pref = pos < (m - need + 1)
        return pa.table({id_col: t[id_col], "h": t["h"], "m": t["m"],
                         "pref": pa.array(pref, pa.bool_())})

    sig = ds.map_batches(sign, batch_format="pyarrow") \
        .map_batches(tag_h, batch_format="pyarrow") \
        .groupby("__p").map_groups(attach_df, batch_format="pyarrow") \
        .map_batches(tag_doc, batch_format="pyarrow") \
        .groupby("__p").map_groups(flag_prefix, batch_format="pyarrow") \
        .materialize()          # consumed 3×: candidates + both sides

    empty_cand = pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
        "m_a": pa.array([], pa.int64()), "m_b": pa.array([], pa.int64())})

    def bucket_pairs(t: pa.Table) -> pa.Table:
        t = t.sort_by([("h", "ascending"), (id_col, "ascending")])
        hv = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(hv) == 0:
            return empty_cand
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        m = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [[0], np.flatnonzero(hv[1:] != hv[:-1]) + 1])
        runlen = np.diff(np.concatenate([starts, [len(hv)]]))
        outs = []
        for k in np.unique(runlen):
            if k < 2:
                continue
            runs = starts[runlen == k]
            idx = runs[:, None] + np.arange(k)[None, :]
            ii, jj = np.triu_indices(int(k), 1)
            outs.append((ids[idx][:, ii].ravel(), ids[idx][:, jj].ravel(),
                         m[idx][:, ii].ravel(), m[idx][:, jj].ravel()))
        if not outs:
            return empty_cand
        a = np.concatenate([o[0] for o in outs])
        b = np.concatenate([o[1] for o in outs])
        ma = np.concatenate([o[2] for o in outs])
        mb = np.concatenate([o[3] for o in outs])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "m_a": pa.array(ma, pa.int64()),
                         "m_b": pa.array(mb, pa.int64())})

    def tag_pair(b: pa.Table) -> pa.Table:
        a = b["a"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        bb = b["b"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        key = _avalanche_u64(a * np.uint64(0x9E3779B97F4A7C15) + bb)
        return b.append_column("__p", pa.array(
            (key % np.uint64(num_partitions)).astype(np.int32)))

    def dedup_pairs(t: pa.Table) -> pa.Table:
        t = t.sort_by([("a", "ascending"), ("b", "ascending")])
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return empty_cand
        keep = np.concatenate(
            [[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        return t.select(["a", "b", "m_a", "m_b"]) \
            .take(pa.array(np.flatnonzero(keep)))

    cands = sig.map_batches(
            lambda b: b.filter(b["pref"].combine_chunks()),
            batch_format="pyarrow") \
        .map_batches(tag_h, batch_format="pyarrow") \
        .groupby("__p").map_groups(bucket_pairs, batch_format="pyarrow") \
        .map_batches(tag_pair, batch_format="pyarrow") \
        .groupby("__p").map_groups(dedup_pairs, batch_format="pyarrow") \
        .materialize()          # consumed 3×: two expansions + meta

    def expand_side(side_col: str):
        """Cogroup candidates (keyed by ``side_col``) with signatures
        (keyed by doc) and emit one (a, b, h) row per signature gram
        of that side — pure index math, no per-pair loop."""
        def tag_c(b: pa.Table) -> pa.Table:
            return pa.table({
                "a": b["a"], "b": b["b"],
                "d": b[side_col],
                "h": pa.nulls(b.num_rows, pa.uint64()),
                "s": pa.array(np.zeros(b.num_rows, np.int8)),
                "__p": pa.array(_part_codes(b[side_col],
                                            num_partitions))})

        def tag_s(b: pa.Table) -> pa.Table:
            z = pa.nulls(b.num_rows, pa.int64())
            return pa.table({
                "a": z, "b": z, "d": b[id_col], "h": b["h"],
                "s": pa.array(np.ones(b.num_rows, np.int8)),
                "__p": pa.array(_part_codes(b[id_col],
                                            num_partitions))})

        def emit(t: pa.Table) -> pa.Table:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
            empty = pa.table({
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "h": pa.array([], pa.uint64())})
            ci = np.flatnonzero(s == 0)
            si = np.flatnonzero(s == 1)
            if ci.size == 0 or si.size == 0:
                return empty
            # fill_null BEFORE to_numpy: a nullable u64/i64 column
            # otherwise converts to float64 and loses hash precision
            hs = pc.fill_null(t["h"].combine_chunks(), 0) \
                .to_numpy(zero_copy_only=False)
            order = np.argsort(d[si], kind="stable")
            sd, sh = d[si][order], hs[si][order]
            starts = np.concatenate(
                [[0], np.flatnonzero(sd[1:] != sd[:-1]) + 1])
            run_doc = sd[starts]
            runlen = np.diff(np.concatenate([starts, [len(sd)]]))
            j = np.searchsorted(run_doc, d[ci])
            ok = (j < len(run_doc)) & (run_doc[np.minimum(
                j, len(run_doc) - 1)] == d[ci])
            ci, j = ci[ok], j[ok]
            L = runlen[j]
            tot = int(L.sum())
            if tot == 0:
                return empty
            base = np.repeat(starts[j], L)
            cum = np.concatenate([[0], np.cumsum(L)[:-1]])
            within = np.arange(tot) - np.repeat(cum, L)
            gather = base + within
            av = pc.fill_null(t["a"].combine_chunks(), 0) \
                .to_numpy(zero_copy_only=False)
            bv = pc.fill_null(t["b"].combine_chunks(), 0) \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "a": pa.array(np.repeat(av[ci], L).astype(np.int64)),
                "b": pa.array(np.repeat(bv[ci], L).astype(np.int64)),
                "h": pa.array(sh[gather], pa.uint64())})

        return cands.map_batches(tag_c, batch_format="pyarrow") \
            .union(sig.map_batches(tag_s, batch_format="pyarrow")) \
            .groupby("__p").map_groups(emit, batch_format="pyarrow")

    def tag_meta(b: pa.Table) -> pa.Table:
        t = tag_pair(b)
        return pa.table({
            "a": t["a"], "b": t["b"],
            "h": pa.nulls(t.num_rows, pa.uint64()),
            "m_a": t["m_a"], "m_b": t["m_b"], "__p": t["__p"]})

    def tag_exp(b: pa.Table) -> pa.Table:
        t = tag_pair(b)
        z = pa.nulls(t.num_rows, pa.int64())
        return pa.table({"a": t["a"], "b": t["b"], "h": t["h"],
                         "m_a": z, "m_b": z, "__p": t["__p"]})

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "un": pa.array([], pa.int64()),
            "jacc_ppm": pa.array([], pa.int64())})
        is_meta = t["m_a"].combine_chunks().is_valid() \
            .to_numpy(zero_copy_only=False)
        meta = np.flatnonzero(is_meta)
        if meta.size == 0:
            return empty
        a = pc.fill_null(t["a"].combine_chunks(), 0) \
            .to_numpy(zero_copy_only=False)
        b = pc.fill_null(t["b"].combine_chunks(), 0) \
            .to_numpy(zero_copy_only=False)
        exp = np.flatnonzero(~is_meta)
        # inter per pair: each (a, b, h) row appears once per side of
        # the expansion, so a count of 2 means the gram is shared
        if exp.size:
            hs = pc.fill_null(t["h"].combine_chunks(), 0) \
                .to_numpy(zero_copy_only=False)[exp] \
                .view(np.int64)
            key = np.stack([a[exp], b[exp], hs], axis=1)
            ukey, cnt = np.unique(key, axis=0, return_counts=True)
            shared = ukey[cnt == 2][:, :2]
            if shared.shape[0]:
                pkey, pcnt = np.unique(shared, axis=0,
                                       return_counts=True)
            else:
                pkey = np.empty((0, 2), np.int64)
                pcnt = np.empty(0, np.int64)
        else:
            pkey = np.empty((0, 2), np.int64)
            pcnt = np.empty(0, np.int64)
        am, bm = a[meta], b[meta]
        mam = pc.fill_null(t["m_a"].combine_chunks(), 0) \
            .to_numpy(zero_copy_only=False)[meta].astype(np.int64)
        mbm = pc.fill_null(t["m_b"].combine_chunks(), 0) \
            .to_numpy(zero_copy_only=False)[meta].astype(np.int64)
        inter = np.zeros(meta.size, np.int64)
        if pkey.shape[0]:
            # vectorized (a, b) match: shared pairs are a subset of
            # the deduped meta pairs, so unique-row codes line up
            allp = np.concatenate(
                [np.stack([am, bm], axis=1), pkey], axis=0)
            _, inv = np.unique(allp, axis=0, return_inverse=True)
            mcode, scode = inv[:meta.size], inv[meta.size:]
            order = np.argsort(mcode)
            pos = np.searchsorted(mcode[order], scode)
            inter[order[pos]] = pcnt
        un = mam + mbm - inter
        keep = inter * 1_000_000 >= tau_ppm * un
        if not keep.any():
            return empty
        jacc = inter[keep] * 1_000_000 // un[keep]
        return pa.table({
            "doc_a": pa.array(am[keep], pa.int64()),
            "doc_b": pa.array(bm[keep], pa.int64()),
            "inter": pa.array(inter[keep], pa.int64()),
            "un": pa.array(un[keep], pa.int64()),
            "jacc_ppm": pa.array(jacc, pa.int64())})

    return cands.map_batches(tag_meta, batch_format="pyarrow") \
        .union(expand_side("a").map_batches(tag_exp,
                                            batch_format="pyarrow")) \
        .union(expand_side("b").map_batches(tag_exp,
                                            batch_format="pyarrow")) \
        .groupby("__p").map_groups(verify, batch_format="pyarrow")


def edit_distance_pairs_ds(ds, col: str = "c_name",
                           num_partitions: int = 64):
    """All DISTINCT-value pairs at Levenshtein distance exactly 1 —
    typo/near-key detection via FastSS deletion-neighborhood blocking
    (Bocek et al.): ed(a, b) ≤ 1 ⟺ D1(a) ∩ D1(b) ≠ ∅ where D1(x) is
    x plus every single-character deletion of x.  Output (a, b),
    a < b.

    Scale shape: variants are generated ARROW-VECTORIZED (one
    slice+concat pass per character position over the whole distinct
    batch, ~max-length passes total, no per-string Python); only
    (variant, value) rows shuffle — |value| × (len+1) of the DISTINCT
    values, never corpus rows.  Candidate pairs surface per variant
    run, dedup on the pair key, and the exact ed==1 verify is one
    vectorized common-prefix/suffix scan (a deletion-neighborhood
    false positive like xy~yx has prefix+suffix < required and dies
    there).  The SQL twin is the O(V²) brute-force cross join with
    ``levenshtein()`` — an independent method, same pair set."""
    from ray.data.aggregate import Count

    def distinct_vals(b: pa.Table) -> pa.Table:
        return b.select([col]).group_by([col], use_threads=False) \
            .aggregate([])

    vals = ds.map_batches(distinct_vals, batch_format="pyarrow") \
        .groupby(col).aggregate(Count(alias_name="__c")) \
        .map_batches(lambda b: b.select([col]), batch_format="pyarrow")

    def variants(b: pa.Table) -> pa.Table:
        v = b[col].combine_chunks()
        lens = pc.utf8_length(v).to_numpy(zero_copy_only=False)
        max_len = int(lens.max()) if len(lens) else 0
        parts = [pa.table({"variant": v, col: v})]   # identity
        for i in range(max_len):
            has = pa.array(lens > i)
            sub = v.filter(has)
            cut = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(sub, 0, i),
                pc.utf8_slice_codeunits(sub, i + 1, 2_147_483_647), "")
            parts.append(pa.table({"variant": cut, col: sub}))
        out = pa.concat_tables(parts)
        return out.group_by(["variant", col], use_threads=False) \
            .aggregate([])

    def add_part(b: pa.Table) -> pa.Table:
        from kgforge.functions.joins import _part_codes

        return b.append_column(
            "__p", pa.array(_part_codes(b["variant"], num_partitions)))

    def candidates(t: pa.Table) -> pa.Table:
        t = t.sort_by([("variant", "ascending"), (col, "ascending")])
        var = t["variant"].combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        neq = pc.not_equal(var.slice(1), var.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        lens = np.diff(np.concatenate([starts, [n]]))
        # pairs within each variant run (flat index math)
        m = lens * (lens - 1) // 2
        tot = int(m.sum())
        if tot == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        run = np.repeat(np.arange(len(lens)), m)
        w = np.arange(tot) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        k = lens[run]
        # enumerate (i, j) i<j within run from the flat offset w
        i = (np.ceil((2 * k - 1 - np.sqrt((2 * k - 1) ** 2 - 8 * w))
                     / 2) - 1).astype(np.int64)
        i = np.clip(i, 0, k - 2)
        # row i's pairs start at flat offset i*k - i*(i+1)//2
        j = w - (i * k - i * (i + 1) // 2) + i + 1
        # guard: float sqrt edge → repair any row whose (i, j) does
        # not reconstruct its flat offset exactly
        w_check = i * k - i * (i + 1) // 2 + (j - i - 1)
        bad = (j <= i) | (j >= k) | (i < 0) | (w_check != w)
        if bad.any():
            for x in np.flatnonzero(bad):
                ww, kk = int(w[x]), int(k[x])
                ii = 0
                while ww >= kk - 1 - ii:
                    ww -= kk - 1 - ii
                    ii += 1
                i[x], j[x] = ii, ii + 1 + ww
        vi = t[col].take(pa.array(starts[run] + i))
        vj = t[col].take(pa.array(starts[run] + j))
        lt = pc.less(vi, vj)
        g = pa.table({"a": pc.if_else(lt, vi, vj),
                      "b": pc.if_else(lt, vj, vi)})
        return g.group_by(["a", "b"], use_threads=False).aggregate([])

    pairs = vals.map_batches(variants, batch_format="pyarrow") \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("__p").map_groups(candidates, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Count(alias_name="__c"))

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        a = np.array(t["a"].to_pylist())
        b = np.array(t["b"].to_pylist())
        la = np.char.str_len(a)
        lb = np.char.str_len(b)
        # orient: s = shorter, g = longer
        swap = la > lb
        s = np.where(swap, b, a)
        g = np.where(swap, a, b)
        ls, lg = np.minimum(la, lb), np.maximum(la, lb)
        W = int(lg.max())
        sm = s.astype(f"U{W}").view(np.uint32).reshape(len(s), -1)[:, :W]
        gm = g.astype(f"U{W}").view(np.uint32).reshape(len(g), -1)[:, :W]
        posm = np.arange(W)[None, :]
        eqp = (sm == gm) | (posm >= ls[:, None])
        # common prefix: first in-range position where they differ
        pref = np.where(eqp.all(axis=1), ls, np.argmin(eqp, axis=1))
        # right-aligned suffix compare
        idx_s = ls[:, None] - 1 - posm
        idx_g = lg[:, None] - 1 - posm
        valid = idx_s >= 0
        eqs = np.zeros_like(eqp)
        rows = np.repeat(np.arange(len(s)), W).reshape(len(s), W)
        eqs[valid] = sm[rows[valid], idx_s[valid]] \
            == gm[rows[valid], idx_g[valid]]
        suff = np.where((eqs | ~valid).all(axis=1), ls,
                        np.argmin(eqs | ~valid, axis=1))
        same_len = ls == lg
        ok = np.where(same_len,
                      (pref + suff >= ls - 1) & (pref < ls),
                      (lg - ls == 1) & (pref + suff >= ls))
        ki = pa.array(np.flatnonzero(ok))
        return pa.table({"a": t["a"].take(ki), "b": t["b"].take(ki)})

    return pairs.map_batches(verify, batch_format="pyarrow")


def dedup_representatives_ds(ds, text_col: str = "text",
                             id_col: str = "doc_id",
                             size_col: str = "n_chars",
                             num_partitions: int = 64):
    """Canonical-document selection — the "keep best, drop rest" half
    of a dedup pass: per normalized-content cluster, the LARGEST
    document wins (``size_col`` desc, ties → smallest id), emitted
    with the cluster size → (content_hash, rep_id, rep_chars,
    n_dups).

    Scale shape: only (digest, id, size) triples shuffle (one
    digest-hash partition exchange, text never moves); the
    per-partition argmax is one vectorized sort + run-boundary mask —
    no per-cluster Python, no global sort."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import _part_codes

    def norm_hash(b: pa.Table) -> pa.Table:
        texts = [normalize_text(t) for t in b[text_col].to_pylist()]
        t = pa.table({"content_hash": _md5_col(texts),
                      id_col: b[id_col],
                      size_col: pc.cast(b[size_col], pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t["content_hash"],
                                        num_partitions)))

    def pick(t: pa.Table) -> pa.Table:
        t = t.sort_by([("content_hash", "ascending"),
                       (size_col, "descending"),
                       (id_col, "ascending")])
        h = t["content_hash"].combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table({"content_hash": pa.array([], pa.string()),
                             "rep_id": pa.array([], pa.int64()),
                             "rep_chars": pa.array([], pa.int64()),
                             "n_dups": pa.array([], pa.int64())})
        neq = pc.not_equal(h.slice(1), h.slice(0, n - 1))
        starts = np.concatenate(
            [[0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1])
        lens = np.diff(np.concatenate([starts, [n]]))
        idx = pa.array(starts)
        return pa.table({"content_hash": h.take(idx),
                         "rep_id": t[id_col].take(idx),
                         "rep_chars": t[size_col].take(idx),
                         "n_dups": pa.array(lens.astype(np.int64))})

    return ds.map_batches(norm_hash, batch_format="pyarrow") \
        .groupby("__p").map_groups(pick, batch_format="pyarrow")


def source_dup_report_ds(ds, text_col: str = "text",
                         group_col: str = "source",
                         num_partitions: int = 64):
    """Per-source duplication census → per-partition partials
    ``(source, n_docs, n_distinct)``; the caller folds ≤ P × sources
    tiny rows and derives ``dup_ppm = (n_docs − n_distinct) × 10⁶ //
    n_docs`` in exact integer math.

    Scale shape: doc counts come from per-batch partials (zero
    shuffle); distinct normalized digests per source shuffle as
    per-batch-distinct (digest, source) pairs keyed by DIGEST hash —
    each digest's rows co-locate, so the per-partition distinct is
    exact and the corpus text never moves."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import _part_codes

    def pairs(b: pa.Table) -> pa.Table:
        texts = [normalize_text(t) for t in b[text_col].to_pylist()]
        t = pa.table({"d": _md5_col(texts), group_col: b[group_col]})
        g = t.group_by(["d", group_col], use_threads=False).aggregate([])
        n = t.group_by([group_col], use_threads=False).aggregate(
            [("d", "count")]).rename_columns([group_col, "n_docs"])
        g = g.append_column(
            "__p", pa.array(_part_codes(g["d"], num_partitions)))
        # docs partial rides along partition -1 (never a digest slot)
        n = pa.table({
            "d": pa.nulls(n.num_rows, pa.string()),
            group_col: n[group_col],
            "__p": pa.array(np.full(n.num_rows, -1, dtype=np.int32)),
            "n_docs": n["n_docs"]})
        g = g.append_column("n_docs",
                            pa.nulls(g.num_rows, pa.int64()))
        return pa.concat_tables([g.select(["d", group_col, "__p",
                                           "n_docs"]), n])

    def fold(t: pa.Table) -> pa.Table:
        doc_rows = t.filter(pc.equal(t["__p"], -1))
        if doc_rows.num_rows:
            g = doc_rows.group_by([group_col], use_threads=False) \
                .aggregate([("n_docs", "sum")])
            return pa.table({group_col: g[group_col],
                             "n_docs": pc.cast(g["n_docs_sum"],
                                               pa.int64()),
                             "n_distinct": pa.array(
                                 np.zeros(g.num_rows, dtype=np.int64))})
        dd = t.select(["d", group_col]).group_by(
            ["d", group_col], use_threads=False).aggregate([])
        g = dd.group_by([group_col], use_threads=False) \
            .aggregate([("d", "count")])
        return pa.table({group_col: g[group_col],
                         "n_docs": pa.array(
                             np.zeros(g.num_rows, dtype=np.int64)),
                         "n_distinct": pc.cast(g["d_count"],
                                               pa.int64())})

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__p").map_groups(fold, batch_format="pyarrow")


def source_provenance_ds(ds, text_col: str = "text",
                         group_col: str = "source",
                         num_partitions: int = 64):
    """Cross-source provenance bitmap: per normalized-content digest,
    the OR of source bits (bit = the source's rank in the sorted
    distinct-source list) and the distinct-source count → one row per
    digest ``(content_hash, src_mask, n_sources)``.  The multi-way
    set-membership view a mixing pipeline uses to see WHERE each
    duplicated document lives (union/intersect across N sources in
    one pass, not C(N,2) pairwise joins).

    Scale shape: the source taxonomy (small by construction) is
    collected once and broadcast as a bit LUT; only per-batch-distinct
    (digest, bit) pairs shuffle, keyed by digest hash; the
    per-partition OR/count is one sort + ``np.bitwise_or.reduceat``."""
    import pyarrow.compute as pc
    import ray

    from kgforge.functions.joins import _part_codes

    # taxonomy discovery: per-batch DISTINCT before the collect, so
    # only batch-distinct source names reach the driver
    uniq = ds.map_batches(
        lambda b: pa.table({group_col: pc.unique(
            b[group_col].combine_chunks())}),
        batch_format="pyarrow")
    srcs = sorted(set().union(*[
        set(t[group_col].to_pylist())
        for t in ray.get(uniq.to_arrow_refs())]))
    if len(srcs) > 63:
        raise ValueError("source taxonomy exceeds the 63-bit mask")
    lut = {s: np.int64(1) << i for i, s in enumerate(srcs)}
    ref = ray.put(lut)

    def pairs(b: pa.Table, _ref=ref) -> pa.Table:
        bits = ray.get(_ref)
        texts = [normalize_text(t) for t in b[text_col].to_pylist()]
        t = pa.table({
            "content_hash": _md5_col(texts),
            "b": pa.array(np.array([bits[s] for s in
                                    b[group_col].to_pylist()],
                                   dtype=np.int64))})
        g = t.group_by(["content_hash", "b"],
                       use_threads=False).aggregate([])
        return g.append_column(
            "__p", pa.array(_part_codes(g["content_hash"],
                                        num_partitions)))

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"content_hash": pa.array([], pa.string()),
                             "src_mask": pa.array([], pa.int64()),
                             "n_sources": pa.array([], pa.int64())})
        t = t.sort_by([("content_hash", "ascending"),
                       ("b", "ascending")])
        h = t["content_hash"].combine_chunks()
        n = t.num_rows
        neq = pc.not_equal(h.slice(1), h.slice(0, n - 1))
        starts = np.concatenate(
            [[0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1])
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        # distinct (digest, bit) rows per batch may repeat ACROSS
        # batches — dedupe runs first
        keepmask = np.concatenate(
            [[True], (b[1:] != b[:-1])
             | neq.to_numpy(zero_copy_only=False)])
        bd = b[keepmask]
        # recompute run layout over the deduped rows
        hid = np.cumsum(np.concatenate(
            [[0], neq.to_numpy(zero_copy_only=False)]))[keepmask]
        starts_d = np.concatenate(
            [[0], np.flatnonzero(hid[1:] != hid[:-1]) + 1])
        lens_d = np.diff(np.concatenate([starts_d, [len(bd)]]))
        mask = np.bitwise_or.reduceat(bd, starts_d)
        return pa.table({
            "content_hash": h.take(pa.array(starts)),
            "src_mask": pa.array(mask.astype(np.int64)),
            "n_sources": pa.array(lens_d.astype(np.int64))})

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__p").map_groups(fold, batch_format="pyarrow")


def incremental_dedup_ds(old_ds, new_ds, text_col: str = "text",
                         id_col: str = "doc_id",
                         group_col: str = "source",
                         num_partitions: int = 64):
    """Dedup-on-ingest: per group of the NEW batch, how many incoming
    documents collide with the EXISTING corpus by normalized digest →
    (group, n_new, n_dup) partials (≤ P × groups rows; caller folds).
    The CDC-shaped dedup every streaming ingestion runs before
    appending to a training corpus.

    Scale shape: the existing corpus collapses to per-batch-distinct
    digests (at 10¹² docs this side is the stored digest index, read
    not recomputed); ONE digest-keyed cogroup against the new batch's
    (digest, group) rows; per-partition membership is the run-layout
    mask — no broadcast of the big side, text never shuffles."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import cogroup_partition_ds

    def new_rows(b: pa.Table) -> pa.Table:
        texts = [normalize_text(t) for t in b[text_col].to_pylist()]
        return pa.table({"d": _md5_col(texts), group_col: b[group_col]})

    def old_digests(b: pa.Table) -> pa.Table:
        texts = [normalize_text(t) for t in b[text_col].to_pylist()]
        return pa.table({"d": pc.unique(_md5_col(texts))})

    nd = new_ds.map_batches(new_rows, batch_format="pyarrow")
    od = old_ds.map_batches(old_digests, batch_format="pyarrow")

    def audit(t: pa.Table, starts, nl, nr) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n_new": pa.array([], pa.int64()),
                             "n_dup": pa.array([], pa.int64())})
        run_of = np.repeat(np.arange(len(nl)), nl)
        li = np.repeat(starts, nl) + (
            np.arange(int(nl.sum())) - np.repeat(
                np.concatenate([[0], np.cumsum(nl)[:-1]]), nl))
        dup = (nr[run_of] > 0).astype(np.int64)
        g = pa.table({group_col: t[group_col].take(pa.array(li)),
                      "one": pa.array(np.ones(len(li), np.int64)),
                      "dup": pa.array(dup)}) \
            .group_by([group_col], use_threads=False) \
            .aggregate([("one", "sum"), ("dup", "sum")])
        return pa.table({group_col: g[group_col],
                         "n_new": pc.cast(g["one_sum"], pa.int64()),
                         "n_dup": pc.cast(g["dup_sum"], pa.int64())})

    return cogroup_partition_ds(nd, od, "d", "d", audit,
                                [group_col], [],
                                num_partitions=num_partitions)


def cross_source_dups_ds(ds, text_col: str = "text",
                         source_col: str = "source",
                         num_partitions: int = 64) -> pa.Table:
    """Cross-source contamination matrix: for every unordered source
    pair (a < b), how many distinct normalized digests occur in BOTH
    sources — the census that catches eval-set text leaking into a
    training source (and vice versa) BEFORE mixing corpora.

    Scale shape: per-batch DISTINCT (digest, source) partials shuffle
    ONCE by md5-u64 % P (same md5 as the SQL twin, batch C kernel);
    each partition re-distincts, sorts by (digest, source) and expands
    per-digest source pairs over the run layout (≤ |sources|² offset
    passes, vectorized across digests); (src_a, src_b, n) partials are
    sources²-bounded, so the final fold is a driver-side concat —
    never a corpus shuffle, never a broadcast."""
    import pyarrow.compute as pc
    import ray

    from kgforge.common.hashing import md5_hex_arr, md5_u64_arr

    P = np.uint64(num_partitions)

    def partial(b: pa.Table) -> pa.Table:
        texts = pa.array([normalize_text(t)
                          for t in b[text_col].to_pylist()], pa.string())
        part = (md5_u64_arr(texts) % P).astype(np.int32)
        t = pa.table({"__p": pa.array(part), "h": md5_hex_arr(texts),
                      "s": b[source_col]})
        return t.group_by(["__p", "h", "s"], use_threads=False) \
            .aggregate([])

    empty = pa.table({"src_a": pa.array([], pa.string()),
                      "src_b": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.group_by(["h", "s"], use_threads=False).aggregate([])
        idx = pc.sort_indices(t, sort_keys=[("h", "ascending"),
                                            ("s", "ascending")])
        t = t.take(idx)
        h = t["h"].combine_chunks()
        if len(h) < 2:
            return empty
        same = np.concatenate([[False], pc.equal(
            h.slice(1), h.slice(0, len(h) - 1))
            .to_numpy(zero_copy_only=False)])
        starts = np.flatnonzero(~same)
        lens = np.diff(np.append(starts, len(h)))
        src = t["s"]
        cols_a, cols_b = [], []
        for i in range(int(lens.max())):
            for j in range(i + 1, int(lens.max())):
                m = lens > j
                if not m.any():
                    continue
                cols_a.append(src.take(pa.array(starts[m] + i))
                              .combine_chunks())
                cols_b.append(src.take(pa.array(starts[m] + j))
                              .combine_chunks())
        if not cols_a:
            return empty
        pt = pa.table({"src_a": pa.concat_arrays(cols_a),
                       "src_b": pa.concat_arrays(cols_b),
                       "n": pa.array(np.ones(
                           sum(len(a) for a in cols_a), np.int64))})
        g = pt.group_by(["src_a", "src_b"], use_threads=False) \
            .aggregate([("n", "sum")])
        return g.rename_columns(["src_a", "src_b", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow")
    tabs = [t for t in ray.get(parts.to_arrow_refs())
            if t.num_columns and t.num_rows]
    if not tabs:
        return empty
    g = pa.concat_tables(tabs) \
        .group_by(["src_a", "src_b"], use_threads=False) \
        .aggregate([("n", "sum")]).rename_columns(["src_a", "src_b", "n"])
    idx = pc.sort_indices(g, sort_keys=[("src_a", "ascending"),
                                        ("src_b", "ascending")])
    return g.take(idx)


def winnow_pairs_ds(ds, text_col: str = "text", id_col: str = "doc_id",
                    n: int = 4, w: int = 4, min_shared: int = 2,
                    max_docs_per_fp: int = 64,
                    num_partitions: int = 64):
    """Winnowing fingerprint near-dup pairs (Schleimer–Wilkerson–Aiken
    2003, the MOSS algorithm), word-``n``-gram granularity: each doc
    keeps, from every window of ``w`` consecutive n-gram hashes, the
    RIGHTMOST minimal hash; doc pairs sharing ≥ ``min_shared``
    distinct selected fingerprints are reported with their shared
    count.  Winnowing guarantees any shared run of ≥ ``w + n − 1``
    tokens yields at least one shared fingerprint while storing only
    ~2/(w+1) of the grams.

    Scale plan: the corpus never travels — stage 1 builds n-gram
    strings with ONE ``pc.binary_join_element_wise`` C call over
    shifted zero-copy slices, hashes them through the DuckDB md5
    kernel (``md5_u64_arr``: the exact u64 the SQL twin computes, so
    SELECTION agrees across engines), and picks window minima with a
    ``sliding_window_view`` reversed argmin (rightmost tie) — no
    per-position Python; stage 2 hash-partitions the distinct
    ``(h, doc)`` fingerprints by h (every doc of an h co-locates),
    drops boilerplate hashes shared by > ``max_docs_per_fp`` docs
    (cap mirrored VERBATIM in the oracle's HAVING), and expands each
    run's C(k,2) pairs with flat index math; stage 3 sums pair
    partials and applies the ``min_shared`` floor."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import md5_u64_arr

    empty_fp = pa.table({"h": pa.array([], pa.uint64()),
                         id_col: pa.array([], pa.int64())})

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        toks = [(t or "").split(" ")
                for t in batch[text_col].to_pylist()]
        lens = np.array([len(ws) for ws in toks], dtype=np.int64)
        flat = pa.array([x for ws in toks for x in ws], pa.string())
        N = len(flat)
        if N < n:
            return empty_fp
        doc_of = np.repeat(np.arange(len(lens)), lens)
        # n-gram strings at every flat position (one C call over
        # zero-copy slices); valid iff the gram stays in one doc
        parts = [flat.slice(i, N - n + 1) for i in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        h = md5_u64_arr(grams)
        gvalid = doc_of[: N - n + 1] == doc_of[n - 1:]
        # windows of w consecutive grams; valid iff first and last
        # gram are valid grams of the same doc (middles follow)
        if len(h) < w:
            return empty_fp
        view = np.lib.stride_tricks.sliding_window_view(h, w)
        rel = (w - 1) - np.argmin(view[:, ::-1], axis=1)
        wvalid = (gvalid[: len(h) - w + 1] & gvalid[w - 1:]
                  & (doc_of[: len(h) - w + 1]
                     == doc_of[w - 1: len(h)]))
        ws_idx = np.flatnonzero(wvalid)
        if not len(ws_idx):
            return empty_fp
        sel = ws_idx + rel[ws_idx]
        t = pa.table({
            "h": pa.array(h[sel], pa.uint64()),
            id_col: pa.array(doc_of[sel].astype(np.int64))})
        ids_np = np.asarray(ids, dtype=np.int64)
        g = t.group_by(["h", id_col], use_threads=False).aggregate([])
        return pa.table({
            "h": g["h"],
            id_col: pa.array(ids_np[g[id_col].combine_chunks()
                                    .to_numpy(zero_copy_only=False)])})

    def tag(b: pa.Table) -> pa.Table:
        p = (b["h"].combine_chunks().to_numpy(zero_copy_only=False)
             % np.uint64(num_partitions)).astype(np.int32)
        return b.append_column("__p", pa.array(p))

    empty_pairs = pa.table({"doc_a": pa.array([], pa.int64()),
                            "doc_b": pa.array([], pa.int64()),
                            "n": pa.array([], pa.int64())})

    def expand(t: pa.Table) -> pa.Table:
        # distinct (h, doc) then C(k,2) per h-run, 2 <= k <= cap
        t = t.select(["h", id_col]) \
            .group_by(["h", id_col], use_threads=False).aggregate([]) \
            .sort_by([("h", "ascending"), (id_col, "ascending")])
        hv = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        if not len(hv):
            return empty_pairs
        dv = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [[0], np.flatnonzero(hv[1:] != hv[:-1]) + 1]).astype(np.int64)
        lens = np.diff(np.concatenate([starts, [len(hv)]])) \
            .astype(np.int64)
        keep = (lens >= 2) & (lens <= max_docs_per_fp)
        starts, lens = starts[keep], lens[keep]
        m = lens * lens
        tot = int(m.sum())
        if tot == 0:
            return empty_pairs
        kofs = np.repeat(np.arange(len(m)), m)
        j = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        j1, j2 = j // lens[kofs], j % lens[kofs]
        kp = j1 < j2
        a = dv[starts[kofs[kp]] + j1[kp]]
        b = dv[starts[kofs[kp]] + j2[kp]]
        g = pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b),
                      "n": pa.array(np.ones(len(a), np.int64))}) \
            .group_by(["doc_a", "doc_b"], use_threads=False) \
            .aggregate([("n", "sum")])
        return pa.table({"doc_a": g["doc_a"], "doc_b": g["doc_b"],
                         "n": g["n_sum"]})

    summed = ds.map_batches(sign, batch_format="pyarrow") \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(expand, batch_format="pyarrow") \
        .groupby(["doc_a", "doc_b"]) \
        .aggregate(Sum("n", alias_name="n_shared"))

    def floor_filter(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["n_shared"],
                                         int(min_shared)))

    return summed.map_batches(floor_filter, batch_format="pyarrow")


def snm_pairs_ds(ds, text_col: str = "text", id_col: str = "doc_id",
                 key_chars: int = 24, window: int = 4,
                 num_partitions: int = 64):
    """Sorted-neighborhood dedup blocking (Hernandez & Stolfo 1995):
    order records by a sort key (the first ``key_chars`` codepoints of
    the text) and emit every candidate pair within ``window`` rank
    positions — the classic entity-resolution alternative to
    minhash/LSH blocking when near-duplicates share a prefix.  Output:
    ``(doc_a, doc_b, dist, key_match)`` with ``dist`` the rank
    distance (1..window) and ``key_match`` = 1 when the two sort keys
    are identical.

    Scale shape — three slim passes, the corpus text never shuffles:

    1. a per-batch ``(first_codepoint, count)`` combiner reduce gives
       the driver an alphabet-bounded histogram; its prefix sums are
       the global rank offsets of the codepoint-ordered partitions
       (UTF-8 bytewise order == codepoint order, so partition order ≡
       key order — the ``pack_chunks`` offset machinery on a range
       key instead of a hash key);
    2. each codepoint partition sorts locally by ``(key, id)`` and
       adds its offset → exact global row numbers ``rn``, emitting
       only ``(rn, id, key)`` rows;
    3. every row lands in overlap buckets ``rn // window`` and
       ``rn // window - 1`` (bucket k spans ranks [k·w, (k+2)·w), so
       any pair within ``window`` co-locates in exactly the bucket
       owning its LEFT member); buckets hash into ``num_partitions``
       groups where a run-offset pass emits the pairs — ≤ 2·w rows
       per bucket, callbacks ∝ partitions, never ∝ buckets.
    """
    from ray.data.aggregate import Sum

    w = int(window)

    def cp_hist(b: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(
            pc.fill_null(b[text_col], ""), 0, key_chars)
        first = pc.utf8_slice_codeunits(key, 0, 1).combine_chunks()
        docs = first.to_pylist()
        cp0 = np.array([ord(s[0]) if s else -1 for s in docs],
                       dtype=np.int64)
        t = pa.table({"cp0": pa.array(cp0)})
        g = t.group_by(["cp0"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"cp0": g["cp0"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    base = ds.select_columns([id_col, text_col]).materialize()
    hist = base.map_batches(cp_hist, batch_format="pyarrow") \
        .groupby("cp0").aggregate(Sum("c", alias_name="c")) \
        .to_pandas().sort_values("cp0")
    cps = hist["cp0"].to_numpy(dtype=np.int64)          # sorted
    counts = hist["c"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def keyed(b: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(
            pc.fill_null(b[text_col], ""), 0, key_chars)
        first = pc.utf8_slice_codeunits(key, 0, 1).combine_chunks()
        docs = first.to_pylist()
        cp0 = np.array([ord(s[0]) if s else -1 for s in docs],
                       dtype=np.int64)
        part = np.searchsorted(cps, cp0)
        return pa.table({id_col: b[id_col], "__key": key,
                         "__p": pa.array(part.astype(np.int32))})

    def rank(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("__key", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        off = int(offsets[int(t["__p"][0].as_py())]) if t.num_rows else 0
        rn = np.arange(t.num_rows, dtype=np.int64) + off
        return pa.table({id_col: t[id_col], "__key": t["__key"],
                         "rn": pa.array(rn)})

    ranked = base.map_batches(keyed, batch_format="pyarrow") \
        .groupby("__p").map_groups(rank, batch_format="pyarrow")

    def overlap(b: pa.Table) -> pa.Table:
        rn = b["rn"].combine_chunks().to_numpy(zero_copy_only=False)
        bkt = np.concatenate([rn // w, rn // w - 1])
        keep = bkt >= 0
        idx = pa.array(np.concatenate([np.arange(len(rn))] * 2)[keep])
        return pa.table({
            id_col: b[id_col].take(idx),
            "__key": b["__key"].take(idx),
            "rn": pa.array(np.concatenate([rn, rn])[keep]),
            "bkt": pa.array(bkt[keep]),
            "__p": pa.array((bkt[keep] % num_partitions)
                            .astype(np.int32))})

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
            "key_match": pa.array([], pa.int64())})
        t = t.sort_by([("bkt", "ascending"), ("rn", "ascending")])
        bk = t["bkt"].combine_chunks().to_numpy(zero_copy_only=False)
        rn = t["rn"].combine_chunks().to_numpy(zero_copy_only=False)
        if not len(bk):
            return empty
        starts = np.concatenate(
            [[0], np.flatnonzero(bk[1:] != bk[:-1]) + 1]).astype(np.int64)
        lens = np.diff(np.concatenate([starts, [len(bk)]])) \
            .astype(np.int64)
        outs_a, outs_b = [], []
        for k in np.unique(lens):
            if k < 2:
                continue
            runs = starts[lens == k]
            ii, jj = np.triu_indices(int(k), 1)
            ai = (runs[:, None] + ii[None, :]).ravel()
            bi = (runs[:, None] + jj[None, :]).ravel()
            outs_a.append(ai)
            outs_b.append(bi)
        if not outs_a:
            return empty
        ai = np.concatenate(outs_a)
        bi = np.concatenate(outs_b)
        d = rn[bi] - rn[ai]
        own = (rn[ai] // w) == bk[ai]       # left member owns the pair
        keep = (d >= 1) & (d <= w) & own
        ai, bi = ai[keep], bi[keep]
        if not len(ai):
            return empty
        ids = t[id_col].combine_chunks()
        keys = t["__key"].combine_chunks()
        km = pc.equal(keys.take(pa.array(ai)), keys.take(pa.array(bi)))
        return pa.table({
            "doc_a": ids.take(pa.array(ai)),
            "doc_b": ids.take(pa.array(bi)),
            "dist": pa.array(d[keep]),
            "key_match": pc.cast(km, pa.int64())})

    return ranked.map_batches(overlap, batch_format="pyarrow") \
        .groupby("__p").map_groups(pairs, batch_format="pyarrow")
