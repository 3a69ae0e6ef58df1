"""Round-5 session-D operators: Broder containment near-dup pairs,
DSIR importance weights, and greedy k-center coreset selection — each
against an independent brute-force oracle."""

import numpy as np
import pyarrow as pa


def _shingles(t: str, n: int = 5) -> set:
    t = t or ""
    if not t:
        return set()
    if len(t) < n:
        return {t}
    return {t[i:i + n] for i in range(len(t) - n + 1)}


def test_containment_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from kgforge.functions.dedup import containment_blocked_pairs_ds

    rng = np.random.RandomState(11)
    base = ("the quick brown fox jumps over the lazy dog while "
            "seventy zebras graze beside the quiet river bank")
    texts = []
    for i in range(60):
        r = rng.randint(4)
        if r == 0:                       # short doc quoted whole in base
            j = rng.randint(len(base) - 20)
            texts.append(base[j:j + 20])
        elif r == 1:                     # the long doc itself
            texts.append(base)
        elif r == 2:                     # unrelated noise
            texts.append("".join(rng.choice(list("abcdefgh "), 40)))
        else:                            # near-copy of base
            texts.append(base[: rng.randint(30, len(base))])
    src = ["s%d" % (i % 2) for i in range(60)]
    ids = np.arange(60, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "source": pa.array(src),
        "text": pa.array(texts)}))
    got = containment_blocked_pairs_ds(
        ds, block_cols=("source",), theta=0.3).to_pandas()
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    exp = []
    sh = [_shingles(t) for t in texts]
    for a in range(60):
        for b in range(a + 1, 60):
            if src[a] != src[b]:
                continue
            inter = len(sh[a] & sh[b])
            den = min(len(sh[a]), len(sh[b]))
            c = inter / den if den else 1.0
            if c >= 0.3:
                exp.append((a, b, round(c, 4)))
    assert len(got) == len(exp) > 0
    for (ea, eb, ec), (_, row) in zip(exp, got.iterrows()):
        assert (row["id_a"], row["id_b"]) == (ea, eb)
        assert abs(row["containment"] - ec) < 1e-9
    # asymmetry check: at least one pair must be a short-in-long
    # subset whose Jaccard would NOT clear the same threshold
    asym = [(a, b) for a, b, _ in exp
            if len(sh[a] & sh[b]) / max(
                1, len(sh[a] | sh[b])) < 0.3]
    assert asym, "fixture lost its asymmetric containment pairs"
