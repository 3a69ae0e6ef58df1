"""Hypothesis property tests for the round-2 vectorized paths:
byte sort keys vs the straightforward encoding, sentence split
reconstruction, and the vectorized triple extractor vs the oracle rule
loop on adversarial mention sets (overlaps, touching spans, empties)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# text alphabet stressing the key paths: ASCII, CJK (3-byte UTF-8),
# an astral char (4-byte), terminators, control chars, NUL-adjacent
_ALPHA = "ab 清华大学。！？；\x01\x02z𝄞"
_texts = st.text(alphabet=_ALPHA, max_size=80)


@given(st.lists(_texts, max_size=40))
@settings(max_examples=200, deadline=None)
def test_arrow_string_keys_matches_reference(strs):
    from kgforge.stages.exchange import arrow_string_keys

    got = arrow_string_keys(pa.array(strs, pa.string()), 48)
    exp = np.array([s.encode("utf-8")[:48] for s in strs], dtype="S48")
    assert got.tolist() == exp.tolist()


@given(st.lists(_texts, min_size=3, max_size=30), st.integers(0, 10 ** 6))
@settings(max_examples=100, deadline=None)
def test_arrow_string_keys_on_sliced_chunked(strs, seed):
    from kgforge.stages.exchange import arrow_string_keys

    arr = pa.chunked_array([pa.array(strs[:2]), pa.array(strs[2:])])
    lo = seed % len(strs)
    sl = arr.combine_chunks().slice(lo, max(1, len(strs) - lo))
    got = arrow_string_keys(sl, 48)
    exp = np.array([s.encode("utf-8")[:48] for s in
                    sl.to_pylist()], dtype="S48")
    assert got.tolist() == exp.tolist()


@given(_texts)
@settings(max_examples=300, deadline=None)
def test_split_sentences_reconstruction(text):
    from kgforge.oracle.segment import split_sentences

    parts = split_sentences(text)
    assert "".join(p for _, p in parts) == text
    pos = 0
    for off, sent in parts:
        assert off == pos and sent
        pos += len(sent)
        # a terminator may only appear as the last char of a sentence
        assert not any(c in "。！？；" for c in sent[:-1])


_mention = st.tuples(st.sampled_from(["PER", "LOC", "ORG"]),
                     st.integers(0, 20), st.integers(1, 6))


@given(st.lists(st.tuples(_texts, st.lists(_mention, max_size=5)),
                max_size=8))
@settings(max_examples=150, deadline=None)
def test_triple_extractor_property_vs_oracle(rows):
    """Vectorized TripleExtractor == oracle loop for arbitrary
    (possibly overlapping / touching / out-of-range-clipped) mention
    sets, empty alias map."""
    from collections import Counter

    from kgforge.oracle.triples import Mention, extract_triples
    from kgforge.stages.mentions import MENTION_STRUCT
    from kgforge.stages.triples import TripleExtractor

    recs = []
    per_row_ms = []
    for i, (text, raw) in enumerate(rows):
        text = text or "x"
        ms = []
        for etype, s, ln in raw:
            s = min(s, len(text) - 1)
            e = min(s + ln, len(text))
            ms.append({"etype": etype, "ment_start": s, "ment_end": e,
                       "surface": text[s:e]})
        recs.append({"doc_id": f"d{i:03d}", "span_idx": 0, "sent_idx": 0,
                     "sent_text": text, "pid": i % 4, "mentions": ms})
        per_row_ms.append([Mention(m["etype"], m["ment_start"],
                                   m["ment_end"], m["surface"])
                           for m in ms])
    batch = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in recs], pa.string()),
        "span_idx": pa.array([0] * len(recs), pa.int32()),
        "sent_idx": pa.array([0] * len(recs), pa.int32()),
        "sent_text": pa.array([r["sent_text"] for r in recs], pa.string()),
        "pid": pa.array([r["pid"] for r in recs], pa.int32()),
        "mentions": pa.array([r["mentions"] for r in recs],
                             pa.list_(MENTION_STRUCT)),
    })
    got = Counter(tuple(sorted(r.items())) for r in
                  TripleExtractor(alias_map={})(batch).to_pylist())
    exp: Counter = Counter()
    for r, ms in zip(recs, per_row_ms):
        for t in extract_triples(r["sent_text"], ms, {}, r["doc_id"],
                                 0, 0):
            t["pid"] = r["pid"]
            exp[tuple(sorted(t.items()))] += 1
    assert got == exp


@given(st.lists(st.text(alphabet="ab 清\t\nxyz", max_size=60),
                max_size=12),
       st.integers(1, 8), st.integers(1, 8))
@settings(max_examples=150, deadline=None)
def test_chunk_batch_matches_reference(texts, chunk, stride):
    """chunk_batch == straightforward Python token slicing for any
    (chunk, stride) and any whitespace-messy input."""
    from kgforge.functions.indexing import chunk_batch

    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = chunk_batch(b, chunk, stride)
    got = [(r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
           for r in out.to_pylist()]
    exp = []
    for i, text in enumerate(texts):
        toks = text.split()
        j = 0
        while j * stride < len(toks):
            w = toks[j * stride:j * stride + chunk]
            exp.append((i, j, " ".join(w), len(w)))
            j += 1
    assert got == exp
