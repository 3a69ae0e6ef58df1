"""Entity linking / canonicalization semantics (single-process oracle).

Not present in the reference (it stops at NER); mandated by the north
rule (BASELINE.json:6: "entity-linking/canonicalization stage using
minhash-blocked candidate generation plus a groupby-aggregate
alias-resolution shuffle").  The distributed pipeline
(:mod:`kgforge.stages.linking`) must reproduce this exactly:

1. distinct ``(etype, surface)`` pairs + support counts (mention
   counts), with the surface's *dominant* predicted type — linking never
   merges across entity types (keeps 北京/LOC apart from 北京大学/ORG),
2. blocking keys per surface: the 16 MinHash-LSH band buckets over
   char-2-gram shingles (near-duplicate path) ∪ one deterministic
   first-char block (abbreviation path — catches 北大 ⊂ 北京大学 which
   shares no bigram with its long form).  In the distributed pipeline
   both key kinds feed ONE ``groupby(etype, block_kind, block_key)``
   shuffle.  At web scale first-char blocks of hot prefixes (中, 国…)
   are the skew hazard → salted-key repartition (SURVEY §4 P3),
3. verify candidate pairs: exact shingle Jaccard ≥ ``JACCARD_THETA``
   OR the abbreviation rule (short ≥ 2 chars, proper subsequence of the
   long form, same first char),
4. union-find over accepted pairs → clusters (global transitivity,
   including across blocks),
5. canonical surface per cluster = max support, tie → lexicographic
   smallest; ``canon_id = "e" + blake2b64(etype|canon_surface)`` hex.
"""

from __future__ import annotations

import hashlib

from kgforge.oracle.minhash import MinHasher, shingles

JACCARD_THETA = 0.7


def canon_id_of(etype: str, surface: str) -> str:
    h = hashlib.blake2b((etype + "|" + surface).encode("utf-8"), digest_size=8)
    return "e" + h.hexdigest()


class UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:           # deterministic: smaller index wins
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def blocking_keys(surface: str, hasher: MinHasher) -> list[tuple[str, int]]:
    """All ``(block_kind, block_key)`` keys for one surface: 16 minhash
    band buckets + 1 first-char block.  Shared by oracle and the Ray
    groupby stage — identical keys ⇒ identical candidate sets."""
    keys: list[tuple[str, int]] = []
    sig = hasher.signature(shingles(surface))
    for band_id, bh in enumerate(hasher.band_hashes(sig)):
        keys.append((f"mh{band_id}", int(bh)))
    if surface:
        keys.append(("fc", ord(surface[0])))
    return keys


def _is_subsequence(short: str, long_: str) -> bool:
    it = iter(long_)
    return all(ch in it for ch in short)


def accept_pair_cached(a: str, b: str, sa: set, sb: set,
                       theta: float = JACCARD_THETA) -> bool:
    """Verification rule with precomputed shingle-hash sets — computing
    shingles per *pair* is O(block² · len) blake2b calls and dominated
    the alias-resolution wall time; callers must hash each surface once
    per block and pass the sets in."""
    if sa and sb:
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= theta:
            return True
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    return (len(short) >= 2 and len(long_) > len(short)
            and short[0] == long_[0] and _is_subsequence(short, long_))


def accept_pair(a: str, b: str, theta: float = JACCARD_THETA) -> bool:
    """Verification rule applied to every blocked candidate pair
    (same entity type, distinct surfaces)."""
    return accept_pair_cached(a, b, set(shingles(a).tolist()),
                              set(shingles(b).tolist()), theta)


# Per-block candidate cap — the SINGLE source of truth shared with the
# distributed pair emission (stages/linking.py imports it): a block
# larger than this keeps only its ``max_block`` highest-support
# surfaces (order: support desc, then surface asc).  A giant block is
# non-discriminative and the cap bounds the O(k²) verify; mirroring it
# here keeps oracle and engine bit-identical at ANY corpus scale (an
# uncapped oracle diverges the moment one blocking bucket outgrows the
# cap — first observed at sf0.1, where same-vocabulary word-salad
# surfaces shingle-collide into one bucket).
DEFAULT_MAX_BLOCK = 512


def candidate_pairs(surfaces: list[str], hasher: MinHasher | None = None,
                    supports: list[int] | None = None,
                    max_block: int | None = None) -> list[tuple[int, int]]:
    """Blocked candidate index pairs (surfaces assumed same-type,
    distinct, sorted by the caller for deterministic order).  With
    ``supports`` + ``max_block``, each blocking bucket is truncated to
    the ``max_block`` highest-support members using the identical
    (-support, surface) order as the engine's ``verify_block_pairs``."""
    hasher = hasher or MinHasher()
    buckets: dict[tuple[str, int], list[int]] = {}
    for i, s in enumerate(surfaces):
        for key in blocking_keys(s, hasher):
            buckets.setdefault(key, []).append(i)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        if (max_block is not None and supports is not None
                and len(members) > max_block):
            members = sorted(
                members,
                key=lambda i: (-supports[i], surfaces[i]))[:max_block]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                pairs.add((min(i, j), max(i, j)))
    return sorted(pairs)


def resolve_aliases(surface_support: dict[tuple[str, str], int],
                    hasher: MinHasher | None = None,
                    theta: float = JACCARD_THETA,
                    max_block: int = DEFAULT_MAX_BLOCK
                    ) -> dict[tuple[str, str], tuple[str, str]]:
    """``(etype, surface) → (canon_id, canon_surface)`` for every input.

    Deterministic: types and surfaces processed in sorted order;
    canonical pick = (max support, then lexicographically smallest).
    Blocking buckets are capped at ``max_block`` (same contract and
    identical truncation order as the distributed pair emission).
    """
    hasher = hasher or MinHasher()
    out: dict[tuple[str, str], tuple[str, str]] = {}
    by_type: dict[str, list[str]] = {}
    for (etype, surface) in sorted(surface_support):
        by_type.setdefault(etype, []).append(surface)
    for etype, surfaces in sorted(by_type.items()):
        idx = {s: i for i, s in enumerate(surfaces)}
        sets = [set(shingles(s).tolist()) for s in surfaces]
        supports = [surface_support[(etype, s)] for s in surfaces]
        uf = UnionFind(len(surfaces))
        for i, j in candidate_pairs(surfaces, hasher,
                                    supports=supports,
                                    max_block=max_block):
            if accept_pair_cached(surfaces[i], surfaces[j],
                                  sets[i], sets[j], theta):
                uf.union(i, j)
        clusters: dict[int, list[str]] = {}
        for s in surfaces:
            clusters.setdefault(uf.find(idx[s]), []).append(s)
        for members in clusters.values():
            canon = min(members,
                        key=lambda s: (-surface_support[(etype, s)], s))
            cid = canon_id_of(etype, canon)
            for s in members:
                out[(etype, s)] = (cid, canon)
    return out


def resolve_from_pairs(surface_support: dict[tuple[str, str], int],
                       accepted_pairs: "np.ndarray | list[tuple[tuple[str, str], tuple[str, str]]]",
                       ) -> dict[tuple[str, str], tuple[str, str]]:
    """Union-find + canonical election from an externally computed
    accepted-pair list (the Ray groupby stage feeds this).  Pair
    elements are ``(etype, surface)`` keys present in
    ``surface_support``."""
    keys = sorted(surface_support)
    idx = {k: i for i, k in enumerate(keys)}
    uf = UnionFind(len(keys))
    for a, b in accepted_pairs:
        uf.union(idx[a], idx[b])
    clusters: dict[int, list[tuple[str, str]]] = {}
    for k in keys:
        clusters.setdefault(uf.find(idx[k]), []).append(k)
    out: dict[tuple[str, str], tuple[str, str]] = {}
    for members in clusters.values():
        canon = min(members, key=lambda k: (-surface_support[k], k[1]))
        cid = canon_id_of(canon[0], canon[1])
        for k in members:
            out[k] = (cid, canon[1])
    return out
