"""Distributed entity linking / canonicalization (SURVEY §2.4 L1/L2,
§2.5 G4; BASELINE.json:6 "minhash-blocked candidate generation plus a
groupby-aggregate alias-resolution shuffle ... salted-key
repartitioning before the canonicalization groupby").

Stages over a T1 mention dataset:

1. **Salted support counts** — per-batch partial aggregation of
   ``(etype, surface) → n`` (one row per key per batch — this combiner
   is what keeps hot surfaces from concentrating rows), then ONE
   ``groupby(etype, surface, salt)`` shuffle where ``salt =
   blake2b64(surface) % S``.  The ≤S partial rows per surface are
   merged on the driver while building the broadcast support dict
   (distinct surfaces ≪ mentions — the documented small-side
   assumption, SURVEY §2.4 L2).
2. **Blocking** — distinct surfaces → ``flat`` blocking-key rows
   (16 minhash band buckets + 1 first-char block, identical keys to the
   oracle via :func:`kgforge.oracle.linking.blocking_keys`) →
   ``groupby(etype, block_kind, block_key).map_groups`` emits verified
   candidate pairs (``accept_pair``).  Blocks larger than
   ``max_block`` keep only the ``max_block`` highest-support surfaces
   (a giant block is non-discriminative; the first-char path for hot
   prefixes like 中 is the skew hazard at web scale — the cap bounds
   the O(block²) verify).
3. **Union-find + election** on the driver over the (small) accepted
   pair list — :func:`kgforge.oracle.linking.resolve_from_pairs`, the
   exact oracle semantics → alias map, broadcast with ``ray.put``.
4. :class:`CanonLookup` — broadcast-hash-join: adds ``canon_id`` /
   ``canon_surface`` to mention batches (no shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kgforge.common.hashing import hash_u64_np
from kgforge.oracle.linking import (
    accept_pair_cached, blocking_keys, canon_id_of, resolve_from_pairs,
)
from kgforge.oracle.minhash import MinHasher

DEFAULT_SALT_BUCKETS = 16
from kgforge.oracle.linking import DEFAULT_MAX_BLOCK  # single source
assert DEFAULT_MAX_BLOCK == 512  # contract pin: oracle+engine share the cap


def make_partial_surface_counts(salt_buckets: int = DEFAULT_SALT_BUCKETS):
    def partial_surface_counts(batch: pa.Table) -> pa.Table:
        # vectorized combiner (arrow group_by): one row per distinct
        # (etype, surface) per batch — this is what keeps hot surfaces
        # from concentrating on one reducer
        g = batch.select(["etype", "surface"]) \
            .group_by(["etype", "surface"], use_threads=False) \
            .aggregate([([], "count_all")])
        surfaces = g["surface"].to_pylist()
        salts = (hash_u64_np(surfaces, seed=7) %
                 np.uint64(salt_buckets)).astype(np.int32) if surfaces else \
            np.array([], dtype=np.int32)
        return pa.table({
            "etype": g["etype"],
            "surface": g["surface"],
            "salt": pa.array(salts, pa.int32()),
            "n": g["count_all"].cast(pa.int64()),
        })

    return partial_surface_counts


def surface_support(mentions_ds, salt_buckets: int = DEFAULT_SALT_BUCKETS):
    """T1 ds → Dataset of ``(etype, surface, n)`` after the salted
    canonicalization groupby (still distributed; small)."""
    from ray.data.aggregate import Sum

    partial = mentions_ds.map_batches(
        make_partial_surface_counts(salt_buckets), batch_format="pyarrow")
    return partial.groupby(["etype", "surface", "salt"]).aggregate(
        Sum("n", alias_name="n"))


def verify_block_pairs(rows: list[tuple[str, int, str]],
                       max_block: int) -> list[tuple[str, str, str]]:
    """One blocking bucket → accepted ``(etype, surf_a, surf_b)`` pairs.

    ``rows``: (surface, support, etype).  Caps oversized blocks to the
    ``max_block`` highest-support surfaces (a giant block is
    non-discriminative; bounds the O(k²) verify).  Shingles each
    surface ONCE per block — recomputing hashes per pair dominated
    wall time.  Shared by the distributed groupby path and the
    driver-side small-side path (identical pair sets by construction).
    """
    from kgforge.oracle.minhash import shingles

    rows = sorted(rows, key=lambda r: (-r[1], r[0]))
    if len(rows) > max_block:
        rows = rows[:max_block]
    sets = [set(shingles(r[0]).tolist()) for r in rows]
    out: list[tuple[str, str, str]] = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            sa, sb = rows[i][0], rows[j][0]
            if sa == sb:
                continue
            lo, hi = (i, j) if sa < sb else (j, i)
            if accept_pair_cached(rows[lo][0], rows[hi][0],
                                  sets[lo], sets[hi]):
                out.append((rows[i][2], rows[lo][0], rows[hi][0]))
    return out


def _make_pair_fn(max_block: int):
    def emit_pairs(group: pa.Table) -> pa.Table:
        rows = list(zip(group["surface"].to_pylist(),
                        group["n"].to_pylist(),
                        group["etype"].to_pylist()))
        nof = {s: int(n) for s, n, _ in rows}
        t_col, a_col, b_col, na_col, nb_col = [], [], [], [], []
        for etype, a, b in verify_block_pairs(rows, max_block):
            t_col.append(etype)
            a_col.append(a)
            b_col.append(b)
            na_col.append(nof[a])
            nb_col.append(nof[b])
        return pa.table({"etype": pa.array(t_col, pa.string()),
                         "surf_a": pa.array(a_col, pa.string()),
                         "surf_b": pa.array(b_col, pa.string()),
                         "n_a": pa.array(na_col, pa.int64()),
                         "n_b": pa.array(nb_col, pa.int64())})

    return emit_pairs


def _block_pairs_ds(keys_ds, max_block: int, num_partitions: int = 64):
    """Candidate-pair emission keyed by HASH PARTITION of the block key
    (``num_partitions`` Ray callbacks, never one per block — block
    cardinality tracks the surface vocabulary, 10⁸⁺ at web scale).
    Inside a partition the per-block verify loops IN-PROCESS over the
    sorted block runs; the verify itself (shingle Jaccard per
    candidate pair) is inherently per-pair work either way."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import _part_codes

    pair_fn = _make_pair_fn(max_block)

    def add_p(b: pa.Table) -> pa.Table:
        kind_key = pc.binary_join_element_wise(
            b["etype"], b["block_kind"],
            pc.cast(b["block_key"], pa.string()), _SEP)
        return b.append_column(
            "__p", pa.array(_part_codes(kind_key, num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("etype", "ascending"), ("block_kind", "ascending"),
            ("block_key", "ascending"), ("surface", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        ek = t["etype"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        bk = t["block_kind"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        kk = t["block_key"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (ek[1:] != ek[:-1]) | (bk[1:] != bk[:-1]) \
                | (kk[1:] != kk[:-1])
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]])
        parts = []
        for i in range(len(starts)):
            g = t.slice(int(starts[i]), int(ends[i] - starts[i]))
            r = pair_fn(g)
            if r.num_rows:
                parts.append(r)
        if not parts:
            return pair_fn(t.slice(0, 0))
        return pa.concat_tables(parts)

    return keys_ds.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow")


def make_blocking_keys_fn():
    hasher_holder: list[MinHasher] = []

    def emit_blocking_keys(batch: pa.Table) -> pa.Table:
        if not hasher_holder:            # lazy per-worker init (A4)
            hasher_holder.append(MinHasher())
        hasher = hasher_holder[0]
        out = {"etype": [], "block_kind": [], "block_key": [],
               "surface": [], "n": []}
        for etype, surface, n in zip(batch["etype"].to_pylist(),
                                     batch["surface"].to_pylist(),
                                     batch["n"].to_pylist()):
            for kind, key in blocking_keys(surface, hasher):
                out["etype"].append(etype)
                out["block_kind"].append(kind)
                out["block_key"].append(key)
                out["surface"].append(surface)
                out["n"].append(n)
        return pa.table({
            "etype": pa.array(out["etype"], pa.string()),
            "block_kind": pa.array(out["block_kind"], pa.string()),
            "block_key": pa.array(out["block_key"], pa.uint64()),
            "surface": pa.array(out["surface"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
        })

    return emit_blocking_keys


def build_alias_map(mentions_ds, salt_buckets: int = DEFAULT_SALT_BUCKETS,
                    max_block: int = DEFAULT_MAX_BLOCK,
                    small_side: str = "auto",
                    driver_partial_rows_max: int = 1_000_000
                    ) -> dict[tuple[str, str], tuple[str, str]]:
    """Full alias resolution → driver-side alias dict.

    The returned dict is the broadcast small side (``ray.put`` it once;
    lookups read it per worker); surfaces absent from it canonicalize
    to themselves (:meth:`CanonLookup.canon` fallback), so the dict
    only ever needs the surfaces that participate in an accepted pair.

    ``small_side="auto"`` (default) picks per input size:

    - **driver**: while the per-batch combiner's partial-count rows fit
      a driver merge (≤ ``driver_partial_rows_max``), the driver merges
      them vectorized (arrow ``group_by``) and runs blocking + capped
      pair verification locally — the fast path for broadcast-sized
      distinct-surface sets.
    - **shuffle** (the web-scale path, open vocabulary): everything
      stays distributed — salted ``groupby(etype, surface, salt)``
      (the combiner bounds rows/surface at #batches; the salt splits a
      hot surface's partials across reducers), a tiny merge groupby,
      blocking-key fan-out, and the block-keyed pair-verify groupby.
      ONLY accepted pairs (plus their two support counts) ship to the
      driver union-find — never per-surface rows.

    Both paths share :func:`verify_block_pairs`, and canonicalization
    results agree (tested); the shuffle map is the pair-involved subset
    of the driver map.
    """
    import ray

    partial = mentions_ds.map_batches(
        make_partial_surface_counts(salt_buckets),
        batch_format="pyarrow").materialize()
    if small_side == "auto":
        small_side = ("driver" if partial.count() <= driver_partial_rows_max
                      else "shuffle")

    if small_side == "driver":
        tables = [t for t in ray.get(partial.to_arrow_refs())
                  if t.num_rows and "etype" in t.column_names]
        if not tables:
            return {}
        merged = pa.concat_tables(tables) \
            .group_by(["etype", "surface"], use_threads=False) \
            .aggregate([("n", "sum")])
        support = {(e, s): int(n) for e, s, n in zip(
            merged["etype"].to_pylist(), merged["surface"].to_pylist(),
            merged["n_sum"].to_pylist())}
        if not support:
            return {}
        pairs = _pairs_driver(support, max_block)
        return resolve_from_pairs(support, sorted(pairs))

    # ---- distributed scale path -----------------------------------------
    from ray.data.aggregate import Sum

    salted = partial.groupby(["etype", "surface", "salt"]).aggregate(
        Sum("n", alias_name="n"))
    distinct = salted.groupby(["etype", "surface"]).aggregate(
        Sum("n", alias_name="n"))
    keys_ds = distinct.map_batches(make_blocking_keys_fn(),
                                   batch_format="pyarrow")
    pairs_ds = _block_pairs_ds(keys_ds, max_block)
    pair_support: dict[tuple[str, str], int] = {}
    pairs: set = set()
    for ref in pairs_ds.to_arrow_refs():
        tbl = ray.get(ref)
        if tbl.num_rows == 0 or "etype" not in tbl.column_names:
            continue
        for e, a, b, na, nb in zip(tbl["etype"].to_pylist(),
                                   tbl["surf_a"].to_pylist(),
                                   tbl["surf_b"].to_pylist(),
                                   tbl["n_a"].to_pylist(),
                                   tbl["n_b"].to_pylist()):
            pairs.add(((e, a), (e, b)))
            pair_support[(e, a)] = int(na)
            pair_support[(e, b)] = int(nb)
    if not pairs:
        return {}
    return resolve_from_pairs(pair_support, sorted(pairs))


_SEP = "\x1f"
_SUPPORT_W = 19  # zero-pad width for 2**63-scale support counts


def _encode_vote(n: np.ndarray, surface) -> list[str]:
    """Election-encoded label: lexicographic MIN over these strings ==
    (max support, then lexicographically smallest surface) — the exact
    :func:`resolve_from_pairs` canon rule, expressed so min-label
    propagation elects the canon while finding the component."""
    # python ints: 10**19 - 1 overflows int64 (numpy would wrap and
    # scramble the ordering)
    top = 10 ** _SUPPORT_W - 1
    return ["%019d%s%s" % (top - int(i), _SEP, s)
            for i, s in zip(np.asarray(n, dtype=np.int64), surface)]


def build_alias_ds(mentions_ds, salt_buckets: int = DEFAULT_SALT_BUCKETS,
                   max_block: int = DEFAULT_MAX_BLOCK,
                   max_rounds: int = 64):
    """Fully distributed alias resolution: NOTHING ships to the driver
    — not even the accepted pairs (:func:`build_alias_map`'s shuffle
    path still union-finds collected pairs on the driver).  The
    union-find + canon election is replaced by min-label propagation
    (:func:`kgforge.functions.dedup.propagate_min_labels`) over the
    accepted-pair graph with the election rule ENCODED IN THE LABEL:
    each node starts as ``(inverted support, surface)`` so the
    component's minimum label IS its (max-support, lex-smallest)
    canon.  Returns the alias table as a Dataset ``(etype, surface,
    canon_id, canon_surface)`` with rows only for pair-involved
    surfaces (absent surfaces self-canonicalize downstream) — feed it
    to :func:`canon_lookup_shuffle_ds` ``alias_ds=`` for the
    end-to-end no-broadcast path.  Paths-agree tested against
    :func:`build_alias_map`."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    from kgforge.functions.dedup import propagate_min_labels

    partial = mentions_ds.map_batches(
        make_partial_surface_counts(salt_buckets), batch_format="pyarrow")
    salted = partial.groupby(["etype", "surface", "salt"]).aggregate(
        Sum("n", alias_name="n"))
    distinct = salted.groupby(["etype", "surface"]).aggregate(
        Sum("n", alias_name="n"))
    keys_ds = distinct.map_batches(make_blocking_keys_fn(),
                                   batch_format="pyarrow")
    pairs = _block_pairs_ds(keys_ds, max_block).materialize()

    def to_edges(b: pa.Table) -> pa.Table:
        et = b["etype"].to_pylist()
        sa = b["surf_a"].to_pylist()
        sb = b["surf_b"].to_pylist()
        a = [e + _SEP + s for e, s in zip(et, sa)]
        bb = [e + _SEP + s for e, s in zip(et, sb)]
        return pa.table({"src": pa.array(a + bb, pa.string()),
                         "dst": pa.array(bb + a, pa.string())})

    def to_labels(b: pa.Table) -> pa.Table:
        et = b["etype"].to_pylist()
        sa = b["surf_a"].to_pylist()
        sb = b["surf_b"].to_pylist()
        nodes = [e + _SEP + s for e, s in zip(et + et, sa + sb)]
        votes = _encode_vote(
            np.concatenate([np.asarray(b["n_a"].to_pylist(), np.int64),
                            np.asarray(b["n_b"].to_pylist(), np.int64)])
            if b.num_rows else np.zeros(0, np.int64), sa + sb)
        return pa.table({"node": pa.array(nodes, pa.string()),
                         "label": pa.array(votes, pa.string())})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")
    labels = pairs.map_batches(to_labels, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("label", alias_name="label"))
    fixed = propagate_min_labels(labels, edges, pa.string(),
                                 max_rounds=max_rounds)

    def decode(b: pa.Table) -> pa.Table:
        node = pc.split_pattern(b["node"], pattern=_SEP, max_splits=1)
        etype = pc.list_element(node, 0)
        surface = pc.list_element(node, 1)
        canon = pc.list_element(
            pc.split_pattern(b["label"], pattern=_SEP, max_splits=1), 1)
        cids = [canon_id_of(e, s) for e, s in
                zip(etype.to_pylist(), canon.to_pylist())]
        return pa.table({
            "etype": etype, "surface": surface,
            "canon_id": pa.array(cids, pa.string()),
            "canon_surface": canon,
        })

    return fixed.map_batches(decode, batch_format="pyarrow")


def _pairs_driver(support: dict[tuple[str, str], int], max_block: int
                  ) -> set[tuple[tuple[str, str], tuple[str, str]]]:
    """Driver-side blocking + verification (same keys/caps as the
    distributed path)."""
    hasher = MinHasher()
    buckets: dict[tuple, list[tuple[str, int, str]]] = {}
    for (etype, surface), n in support.items():
        for kind, key in blocking_keys(surface, hasher):
            buckets.setdefault((etype, kind, key), []).append(
                (surface, n, etype))
    pairs: set = set()
    for rows in buckets.values():
        for etype, a, b in verify_block_pairs(rows, max_block):
            pairs.add(((etype, a), (etype, b)))
    return pairs


def make_canon_lookup_fn(alias_ref):
    """Stateless task variant of :class:`CanonLookup` (broadcast map
    resolved once per worker via the shared cache — no actor pool)."""
    from kgforge.stages.triples import alias_from_ref

    def lookup(batch: pa.Table) -> pa.Table:
        return CanonLookup(alias_map=alias_from_ref(alias_ref))(batch)

    return lookup


class CanonLookup:
    """L2 broadcast lookup actor: mention/sentence batches gain
    ``canon_id`` / ``canon_surface`` columns."""

    def __init__(self, alias_ref=None, alias_map=None):
        if alias_ref is not None:
            import ray

            self.alias: dict = ray.get(alias_ref)
        else:
            self.alias = alias_map or {}

    def canon(self, etype: str, surface: str) -> tuple[str, str]:
        got = self.alias.get((etype, surface))
        if got is None:
            return canon_id_of(etype, surface), surface
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized broadcast-hash-join: dictionary-encode the
        # (etype, surface) key, resolve once per DISTINCT code, then
        # one zero-copy take fans the result back out — no per-row
        # Python objects on the flagship hot path
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            pc.cast(batch["etype"], pa.string()), batch["surface"],
            "\x00")
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = key.dictionary_encode()
        ids, surfs = [], []
        for k in enc.dictionary.to_pylist():
            e, _, s = k.partition("\x00")
            ci, cs = self.canon(e, s)
            ids.append(ci)
            surfs.append(cs)
        idx = enc.indices
        return batch.append_column(
            "canon_id", pc.take(pa.array(ids, pa.string()), idx)) \
            .append_column(
            "canon_surface", pc.take(pa.array(surfs, pa.string()), idx))


def canon_lookup_shuffle_ds(mentions_ds, alias_map: dict | None = None,
                            alias_ds=None, salt_buckets: int = 16,
                            num_partitions: int = 64):
    """L2 fallback for an alias map too large to broadcast: apply
    canonicalization as a key-shuffle join instead of a per-worker
    dict.  Mentions and alias rows are union-tagged and ONE
    ``groupby(etype, surface, salt)`` co-locates each mention with its
    (replicated) alias row; absent surfaces canonicalize to themselves,
    same as :meth:`CanonLookup.canon`.  Output rows/columns are
    identical to :class:`CanonLookup` (paths-agree tested).

    Skew: the canon result is CONSTANT per surface, so a hot surface
    can be split freely — mentions take ``salt = hash64(doc_id) %
    salt_buckets`` and each alias row is replicated to every salt
    (alias rows ≪ mentions; the replication is the classic
    broadcast-fragment join, just expressed inside the shuffle)."""
    import ray.data as rd

    m_schema = mentions_ds.schema().base_schema
    mention_cols = list(m_schema.names)

    if alias_ds is None:
        am = alias_map or {}
        alias_ds = rd.from_arrow(pa.table({
            "etype": pa.array([e for e, _ in am], pa.string()),
            "surface": pa.array([s for _, s in am], pa.string()),
            "canon_id": pa.array([v[0] for v in am.values()], pa.string()),
            "canon_surface": pa.array([v[1] for v in am.values()],
                                      pa.string()),
        }))

    def tag_m(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: b[c] for c in mention_cols}
        cols["__salt"] = pa.array(
            (hash_u64_np(b["doc_id"].to_pylist(), seed=3) %
             np.uint64(salt_buckets)).astype(np.int32))
        cols["__canon_id"] = pa.nulls(n, pa.string())
        cols["__canon_surface"] = pa.nulls(n, pa.string())
        cols["__is_alias"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def tag_a(b: pa.Table) -> pa.Table:
        n = b.num_rows
        reps = pa.array(np.repeat(np.arange(n), salt_buckets))
        cols = {}
        for c in mention_cols:
            if c in ("etype", "surface"):
                cols[c] = b[c].take(reps)
            else:
                cols[c] = pa.nulls(n * salt_buckets, m_schema.field(c).type)
        cols["__salt"] = pa.array(
            np.tile(np.arange(salt_buckets, dtype=np.int32), n))
        cols["__canon_id"] = b["canon_id"].take(reps)
        cols["__canon_surface"] = b["canon_surface"].take(reps)
        cols["__is_alias"] = pa.array(np.ones(n * salt_buckets, np.int8))
        return pa.table(cols)

    unioned = mentions_ds.map_batches(tag_m, batch_format="pyarrow") \
        .union(alias_ds.map_batches(tag_a, batch_format="pyarrow"))
    drop = ["__salt", "__canon_id", "__canon_surface", "__is_alias"]

    def add_p(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from kgforge.functions.joins import _part_codes

        key = pc.binary_join_element_wise(
            b["etype"], b["surface"],
            pc.cast(b["__salt"], pa.string()), "\x1f")
        return b.append_column(
            "__p", pa.array(_part_codes(key, num_partitions)))

    def resolve(t: pa.Table) -> pa.Table:
        """One hash partition: every (etype, surface, salt) run at
        once — alias rows sort FIRST in their run, so the run's canon
        is its first row when an alias is present; absent surfaces
        self-canonicalize (identity canon for the run, computed only
        for runs that need it)."""
        import pyarrow.compute as pc

        t = t.drop_columns(["__p"])
        idx = pc.sort_indices(t, sort_keys=[
            ("etype", "ascending"), ("surface", "ascending"),
            ("__salt", "ascending"), ("__is_alias", "descending")])
        t = t.take(idx)
        n = t.num_rows
        is_a = t["__is_alias"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        ec = t["etype"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        sc = t["surface"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        salt = t["__salt"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (ec[1:] != ec[:-1]) | (sc[1:] != sc[:-1]) \
                | (salt[1:] != salt[:-1])
        starts = np.flatnonzero(brk)
        run_of = np.cumsum(brk) - 1
        has_alias = is_a[starts] == 1
        cid = t["__canon_id"].take(pa.array(starts)).to_pylist()
        cs = t["__canon_surface"].take(pa.array(starts)).to_pylist()
        if not np.all(has_alias):
            ets = t["etype"].take(pa.array(starts)).to_pylist()
            surs = t["surface"].take(pa.array(starts)).to_pylist()
            for i in np.flatnonzero(~has_alias):
                cid[i] = canon_id_of(ets[i], surs[i])
                cs[i] = surs[i]
        midx = np.flatnonzero(is_a == 0)
        m = t.take(pa.array(midx)).drop_columns(drop)
        cid_arr = pa.array(cid, pa.string()).take(
            pa.array(run_of[midx]))
        cs_arr = pa.array(cs, pa.string()).take(
            pa.array(run_of[midx]))
        return m.append_column("canon_id", cid_arr) \
            .append_column("canon_surface", cs_arr)

    return unioned.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(resolve, batch_format="pyarrow")
