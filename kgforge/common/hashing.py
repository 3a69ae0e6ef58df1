"""Stable 64-bit hashing used across the engine.

Python's builtin ``hash`` is salted per-process (PYTHONHASHSEED) and is
therefore unusable for anything that must agree across Ray workers,
across runs, or between the oracle and the pipeline (partition ids,
salting, minhash shingles, invariant checksums).  Everything here is
deterministic across processes and platforms.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = (1 << 64) - 1


def round_away(x, ndigits: int):
    """Round-half-away-from-zero, matching DuckDB/C ``round()`` —
    Python/numpy bankers' rounding diverges on exact binary midpoints
    (e.g. 185/32 = 5.78125), which breaks oracle value-hash parity.
    Accepts a float or a numpy array."""
    f = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def hash_u64_bytes(data: bytes) -> int:
    """Stable u64 of raw bytes (blake2b-8)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def hash_u64(text: str, *, seed: int = 0) -> int:
    """Stable u64 of a unicode string (optionally seeded)."""
    h = hashlib.blake2b(digest_size=8, key=seed.to_bytes(8, "little") if seed else b"")
    h.update(text.encode("utf-8"))
    return int.from_bytes(h.digest(), "little")


_HASH_NP_CUTOVER = 64   # below this, per-element hashlib beats a DuckDB call


def hash_u64_np(strings, *, seed: int = 0) -> np.ndarray:
    """Stable u64 per string: high 64 bits of ``md5(prefix ‖ s)`` where
    the prefix encodes ``seed`` (empty for seed=0).

    Large batches run in ONE C-level call through DuckDB's vectorized
    md5 kernel (the same kernel the SQL twins use); small batches take
    a hashlib loop producing IDENTICAL values.  Formerly a per-element
    blake2b loop — an O(rows) Python-call tax on mention-volume paths
    (minhash shingle signing, string partition codes).  No
    oracle-checked output depends on the hash VALUES (callers use this
    for partition ids, salts, per-block seeds and minhash shingles),
    so the blake2b→md5 family change is observable only in rows-only
    lanes, whose invariance tests are value-free by design.
    """
    import pyarrow as pa

    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    pre = f"{seed}\x1f" if seed else ""
    is_arrow = isinstance(strings, (pa.Array, pa.ChunkedArray))
    if not is_arrow and (
            n < _HASH_NP_CUTOVER
            or not all(isinstance(s, str) for s in strings)):
        out = np.empty(n, dtype=np.uint64)
        pb = pre.encode("utf-8")
        for i, s in enumerate(strings):
            data = pb + (s.encode("utf-8") if isinstance(s, str)
                         else bytes(s))
            out[i] = int(hashlib.md5(data).hexdigest()[:16], 16)
        return out
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = strings if isinstance(strings, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(strings), pa.string())
    if pre:
        arr = pc.binary_join_element_wise(pa.scalar(pre), arr, "")
    return md5_u64_arr(arr)


_DUCK_CON = None


def _duck():
    """Process-local DuckDB connection backing the vectorized md5
    kernels.  One per worker process (Ray tasks/actors don't share
    module globals); DuckDB projections preserve insertion order, so
    results align row-for-row with the input array."""
    global _DUCK_CON
    if _DUCK_CON is None:
        import duckdb

        _DUCK_CON = duckdb.connect()
    return _DUCK_CON


def _as_string_array(values):
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values
    else:
        arr = pa.array(list(values), pa.string())
    if not (pa.types.is_string(arr.type)
            or pa.types.is_large_string(arr.type)):
        arr = pc.cast(arr, pa.string())
    return arr


def md5_hex_arr(values):
    """md5 hex digests of a batch of strings in ONE C-level call via
    DuckDB's vectorized md5 kernel — the identical kernel the SQL
    twins call, so cross-engine parity holds by construction (a
    per-row ``hashlib`` loop costs O(rows) Python calls on
    corpus-size paths).  NULL hashes to NULL; ``pc.fill_null`` first
    for empty-string semantics.  → pa.ChunkedArray<string>."""
    import pyarrow as pa

    t = pa.table({"s": _as_string_array(values)})
    con = _duck()
    con.register("__md5_in", t)
    try:
        out = con.execute("SELECT md5(s) AS h FROM __md5_in").arrow()
    finally:
        con.unregister("__md5_in")
    return out["h"].combine_chunks()


def md5_u64_arr(values, nhex: int = 16) -> np.ndarray:
    """``int(md5(x).hexdigest()[:nhex], 16)`` as uint64 — the exact
    value of the SQL twins' ``CAST(concat('0x', substr(md5(x),1,nhex))
    AS UBIGINT)`` — computed batch-at-a-time through DuckDB instead of
    a per-row hashlib loop."""
    import pyarrow as pa

    t = pa.table({"s": _as_string_array(values)})
    con = _duck()
    con.register("__md5_in", t)
    try:
        out = con.execute(
            f"SELECT CAST(concat('0x', substr(md5(s), 1, {int(nhex)})) "
            "AS UBIGINT) AS h FROM __md5_in").arrow()
    finally:
        con.unregister("__md5_in")
    return out["h"].combine_chunks().to_numpy(zero_copy_only=False) \
        .astype(np.uint64)


def stable_partition_id(doc_id: str, num_partitions: int) -> int:
    """Partition assignment for checkpoint/lineage (SURVEY §4, T5)."""
    return hash_u64(doc_id) % num_partitions


def span_sequence_hash(kinds, texts, media_refs) -> int:
    """Order-sensitive u64 over a doc's span sequence ``(kind, text,
    media_ref)`` — invariant I1 (BASELINE.json:15).  Separators chosen
    outside the data alphabet to prevent concatenation collisions.
    """
    h = hashlib.blake2b(digest_size=8)
    for k, t, m in zip(kinds, texts, media_refs):
        h.update((k or "").encode("utf-8"))
        h.update(b"\x1f")
        h.update((t or "").encode("utf-8"))
        h.update(b"\x1f")
        h.update((m or "").encode("utf-8"))
        h.update(b"\x1e")
    return int.from_bytes(h.digest(), "little")
