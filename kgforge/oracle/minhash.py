"""MinHash signatures + LSH banding, from scratch (numpy universal
hashing; no ``datasketch`` in the sandbox — SURVEY §0.3).

Used for entity-surface blocking in the KG pipeline (SURVEY §2.4 L1)
and for document near-dedup (``kgforge.functions.dedup``).  Parameters
frozen in FIXTURES.md §D: 128 permutations = 16 bands × 8 rows,
seed=42.  Hash family: multiply-shift ``h_i(x) = ((a_i·x + b_i) mod
2^64) >> 32`` with odd random ``a_i`` — 2-universal, exact and fully
vectorized in uint64 (numpy unsigned arithmetic wraps mod 2^64).
"""

from __future__ import annotations

import numpy as np

from kgforge.common.hashing import hash_u64_np

NUM_PERM = 128
NUM_BANDS = 16
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
SEED = 42
_EMPTY_SLOT = np.uint64(0xFFFFFFFF)   # > any 32-bit hash value


class MinHasher:
    """Seeded multiply-shift MinHash.  Cheap state → the Ray stages
    lazily build one instance per worker process (SURVEY §2.3 A4)."""

    def __init__(self, num_perm: int = NUM_PERM, seed: int = SEED,
                 num_bands: int = NUM_BANDS):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands
        lo = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)
        hi = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)
        self.a = ((hi << np.uint64(32)) | lo) | np.uint64(1)      # odd
        lo_b = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)
        hi_b = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)
        self.b = (hi_b << np.uint64(32)) | lo_b

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """MinHash signature ``uint64[num_perm]`` of a shingle-hash set."""
        if len(shingle_hashes) == 0:
            return np.full(self.num_perm, _EMPTY_SLOT, dtype=np.uint64)
        x = shingle_hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (self.a[:, None] * x[None, :] + self.b[:, None]) >> np.uint64(32)
        return h.min(axis=1)

    def signatures(self, shingle_sets: list[np.ndarray],
                   chunk: int = 200_000) -> np.ndarray:
        """Batch signatures → ``uint64[n, num_perm]``.

        Vectorized across documents: hash the concatenated shingle
        stream once per chunk and reduce per-document with
        ``np.minimum.reduceat`` — a per-document Python loop cost ~10s
        per 5k long documents."""
        n = len(shingle_sets)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        out = np.full((n, self.num_perm), _EMPTY_SLOT, dtype=np.uint64)
        lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
        start_doc = 0
        while start_doc < n:
            end_doc = start_doc
            total = 0
            while end_doc < n and (total == 0 or
                                   total + lens[end_doc] <= chunk):
                total += int(lens[end_doc])
                end_doc += 1
            nonempty = [i for i in range(start_doc, end_doc) if lens[i]]
            if nonempty:
                x = np.concatenate([shingle_sets[i] for i in nonempty]) \
                    .astype(np.uint64)
                bounds = np.concatenate(
                    [[0], np.cumsum(lens[nonempty])[:-1]])
                with np.errstate(over="ignore"):
                    h = (self.a[:, None] * x[None, :] +
                         self.b[:, None]) >> np.uint64(32)
                mins = np.minimum.reduceat(h, bounds, axis=1)   # [P, d]
                out[np.asarray(nonempty)] = mins.T
            start_doc = end_doc
        return out

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """Signature(s) → per-band u64 bucket keys.

        ``sig``: ``[num_perm]`` or ``[n, num_perm]`` →
        ``[num_bands]`` / ``[n, num_bands]``.  Order-sensitive FNV-style
        mix of each band's rows, vectorized.
        """
        single = sig.ndim == 1
        s = sig[None, :] if single else sig
        n = s.shape[0]
        bands = s.reshape(n, self.num_bands, self.rows_per_band)
        h = np.full((n, self.num_bands), np.uint64(0xCBF29CE484222325))
        fnv = np.uint64(0x100000001B3)
        with np.errstate(over="ignore"):
            for r in range(self.rows_per_band):
                h = (h ^ bands[:, :, r]) * fnv
        return h[0] if single else h


def shingles(text: str, n: int = 2) -> np.ndarray:
    """Char n-gram shingle hashes of a string (n=2 for entity surfaces).

    Strings shorter than ``n`` hash as a single whole-string shingle so
    short aliases (北大) still produce a signature.
    """
    if len(text) < n:
        grams = [text] if text else []
    else:
        grams = [text[i: i + n] for i in range(len(text) - n + 1)]
    return np.unique(hash_u64_np(grams))


def jaccard(a, b) -> float:
    """Exact Jaccard of two shingle-hash collections."""
    sa, sb = set(np.asarray(a).tolist()), set(np.asarray(b).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash estimate of Jaccard similarity."""
    return float(np.mean(sig_a == sig_b))
