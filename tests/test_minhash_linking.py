"""MinHash / LSH blocking / alias resolution (SURVEY §2.4 L1, §2.5 G4)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from kgforge.oracle.linking import (
    accept_pair, canon_id_of, resolve_aliases, resolve_from_pairs,
)
from kgforge.oracle.minhash import (
    MinHasher, estimate_jaccard, jaccard, shingles,
)


def test_signature_deterministic():
    h1, h2 = MinHasher(), MinHasher()
    s = shingles("北京大学")
    assert np.array_equal(h1.signature(s), h2.signature(s))
    assert np.array_equal(h1.band_hashes(h1.signature(s)),
                          h2.band_hashes(h2.signature(s)))


@settings(max_examples=30)
@given(st.integers(0, 1000))
def test_jaccard_estimate_close(seed):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 1 << 62, size=200).astype(np.uint64)
    keep = rng.rand(200) < 0.7
    a = base
    b = np.concatenate([base[keep],
                        rng.randint(0, 1 << 62, size=30).astype(np.uint64)])
    true_j = jaccard(a, b)
    h = MinHasher()
    est = estimate_jaccard(h.signature(a), h.signature(b))
    assert abs(est - true_j) < 0.2  # 128 perms → s.e. ≈ 0.044


def test_identical_strings_share_all_bands():
    h = MinHasher()
    ba = h.band_hashes(h.signature(shingles("阿里巴巴集团")))
    bb = h.band_hashes(h.signature(shingles("阿里巴巴集团")))
    assert np.array_equal(ba, bb)


def test_alias_fixture_pairs_merge():
    support = {("ORG", s): 10 for s in
               ["北京大学", "北大", "清华大学", "清华", "华为", "华为技术有限公司",
                "腾讯", "腾讯科技", "阿里巴巴", "阿里巴巴集团", "复旦大学",
                "中国银行", "工商银行", "南京大学"]}
    support[("ORG", "华为")] = 100  # higher support → canonical
    canon = resolve_aliases(support)
    assert canon[("ORG", "北大")] == canon[("ORG", "北京大学")]
    assert canon[("ORG", "清华")] == canon[("ORG", "清华大学")]
    assert canon[("ORG", "华为技术有限公司")] == canon[("ORG", "华为")]
    assert canon[("ORG", "华为")][1] == "华为"  # max-support election
    # distinct universities must NOT merge
    assert canon[("ORG", "北京大学")] != canon[("ORG", "南京大学")]
    assert canon[("ORG", "复旦大学")] != canon[("ORG", "清华大学")]
    assert canon[("ORG", "中国银行")] != canon[("ORG", "工商银行")]


def test_no_cross_type_merge():
    support = {("LOC", "北京"): 50, ("ORG", "北京大学"): 10}
    canon = resolve_aliases(support)
    assert canon[("LOC", "北京")] != canon[("ORG", "北京大学")]


def test_resolution_deterministic():
    support = {("ORG", s): n for n, s in enumerate(
        ["华为", "华为技术有限公司", "腾讯", "腾讯科技", "北大", "北京大学"])}
    a = resolve_aliases(support)
    b = resolve_aliases(dict(reversed(list(support.items()))))
    assert a == b


def test_resolve_from_pairs_matches_resolve_aliases():
    """The Ray stage path (external accepted pairs) must equal the
    oracle path when fed the same pairs."""
    support = {("ORG", s): 5 for s in
               ["华为", "华为技术有限公司", "腾讯", "腾讯科技", "中国移动"]}
    canon = resolve_aliases(support)
    keys = sorted(support)
    pairs = []
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            a, b = keys[i], keys[j]
            if a[0] == b[0] and accept_pair(a[1], b[1]):
                pairs.append((a, b))
    assert resolve_from_pairs(support, pairs) == canon


def test_accept_pair_rules():
    assert accept_pair("北大", "北京大学")          # abbreviation subsequence
    assert accept_pair("华为", "华为技术有限公司")
    assert not accept_pair("北京大学", "南京大学")   # J=0.5 < 0.7
    assert not accept_pair("北京", "南京")
    assert not accept_pair("张强", "王强")


def test_canon_id_stable():
    assert canon_id_of("ORG", "华为") == canon_id_of("ORG", "华为")
    assert canon_id_of("ORG", "华为") != canon_id_of("LOC", "华为")
