"""BIO/BIOES codec + entity extraction (SURVEY §2.2 M4/M5)."""

import random

from hypothesis import given, strategies as st

from kgforge.oracle.labels import (
    BIO_TAGS, bio_to_bioes, bioes_to_bio, extract_entities,
)


def _random_bio(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    tags, open_type = [], None
    for _ in range(n):
        r = rng.random()
        if open_type and r < 0.4:
            tags.append("I-" + open_type)
        elif r < 0.7:
            open_type = rng.choice(["PER", "LOC", "ORG"])
            tags.append("B-" + open_type)
        else:
            tags.append("O")
            open_type = None
    return tags


@given(st.integers(0, 10_000), st.integers(0, 40))
def test_bio_bioes_roundtrip(seed, n):
    tags = _random_bio(seed, n)
    assert bioes_to_bio(bio_to_bioes(tags)) == tags


@given(st.integers(0, 10_000), st.integers(0, 40))
def test_entities_invariant_under_scheme(seed, n):
    tags = _random_bio(seed, n)
    assert extract_entities(tags) == extract_entities(bio_to_bioes(tags))


def test_extract_basic():
    tags = ["B-PER", "I-PER", "O", "B-ORG", "I-ORG", "I-ORG"]
    assert extract_entities(tags) == [("PER", 0, 2), ("ORG", 3, 6)]


def test_extract_tolerant_illegal_I_start():
    # I- with no open entity starts a new one (start-new convention)
    assert extract_entities(["O", "I-LOC", "I-LOC", "O"]) == [("LOC", 1, 3)]
    # type switch inside a run starts a new entity
    assert extract_entities(["B-PER", "I-ORG"]) == [("PER", 0, 1), ("ORG", 1, 2)]


def test_extract_adjacent_B():
    assert extract_entities(["B-PER", "B-PER"]) == [("PER", 0, 1), ("PER", 1, 2)]


def test_bioes_single_and_end():
    assert bio_to_bioes(["B-LOC"]) == ["S-LOC"]
    assert bio_to_bioes(["B-LOC", "I-LOC"]) == ["B-LOC", "E-LOC"]
    assert extract_entities(["S-PER", "O", "B-ORG", "E-ORG"]) == \
        [("PER", 0, 1), ("ORG", 2, 4)]


def test_tag_order_stable():
    assert BIO_TAGS[0] == "O" and len(BIO_TAGS) == 7


def test_bioes_hmm_end_to_end(ray_session):
    """Reference capability: training + decoding under the BIOES scheme
    flows through the same pipeline stages and yields the same entity
    set as the BIO lane (the scheme is carried by the model artifact)."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.oracle import hmm as H
    from kgforge.oracle.corpus import Sentence, generate_corpus
    from kgforge.oracle.labels import BIOES_TAGS, bio_to_bioes
    from kgforge.oracle.vocab import build_vocab, count_chars
    from kgforge.stages.mentions import attach_mentions
    from kgforge.stages.tagger import HmmTagger

    train = generate_corpus(400, seed=42)
    vocab = build_vocab(count_chars(train))
    bio_model = H.fit(train, vocab)
    bioes_train = [Sentence(s.chars, bio_to_bioes(s.tags)) for s in train]
    bioes_model = H.fit(bioes_train, vocab, tags=BIOES_TAGS)

    test = generate_corpus(80, seed=5)
    tbl = pa.table({"sent_text": pa.array([s.text for s in test])})

    def run(model):
        import tempfile

        p = tempfile.mktemp(suffix=".npz")
        model.save(p)
        rows = rd.from_arrow(tbl).map_batches(
            HmmTagger, fn_constructor_kwargs={"model_path": p},
            batch_format="pyarrow", concurrency=1) \
            .map_batches(attach_mentions, batch_format="pyarrow").take_all()
        return [tuple((m["etype"], m["ment_start"], m["ment_end"])
                      for m in r["mentions"]) for r in rows]

    bio_ments = run(bio_model)
    bioes_ments = run(bioes_model)
    # same sentences, same training data → overwhelmingly equal spans
    agree = sum(a == b for a, b in zip(bio_ments, bioes_ments))
    assert agree >= int(0.9 * len(bio_ments))
    # and the BIOES model really emits BIOES tags
    from kgforge.oracle.labels import extract_entities

    tags = H.decode_texts(bioes_model, [test[0].text])[0]
    assert any(t.startswith(("E-", "S-")) for t in tags if t != "O")
    assert extract_entities(tags)


def test_vectorized_attach_matches_oracle_property():
    """Vectorized M4 == oracle extract_entities on random (including
    illegal) BIO/BIOES tag sequences."""
    import random

    import pyarrow as pa

    from kgforge.oracle.labels import BIOES_TAGS, extract_entities
    from kgforge.stages.mentions import attach_mentions

    rng = random.Random(1234)
    all_tags = list(BIOES_TAGS)
    sents = []
    for _ in range(300):
        L = rng.randint(0, 12)
        sents.append([rng.choice(all_tags) for _ in range(L)])
    texts = ["x" * len(t) for t in sents]
    batch = pa.table({
        "sent_text": pa.array(texts, pa.string()),
        "tags": pa.array(sents, pa.list_(pa.string())),
    })
    out = attach_mentions(batch)["mentions"].to_pylist()
    for tags, ments in zip(sents, out):
        expect = [(e, s, t) for e, s, t in extract_entities(tags)]
        got = [(m["etype"], m["ment_start"], m["ment_end"]) for m in ments]
        assert got == expect, (tags, got, expect)
