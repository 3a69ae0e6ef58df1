"""Dictionary-tagger KG lane: gold recovery (exhaustive per-slot +
random full combinations), SQL-oracle corpus parity, and the e2e
flagship run with DictTagger in the Tagger-protocol slot."""

import random

import pyarrow as pa
import pytest

from kgforge.oracle.corpus import _SLOT_TYPES, TEMPLATES
from kgforge.oracle.labels import extract_entities
from kgforge.sources.dictcorpus import (
    dict_gazetteers, render_dict_sentence,
)
from kgforge.stages.dict_tagger import DictTagger


def _render_manual(template, fills):
    """Render a template with explicit slot surfaces → (text, gold)."""
    parts, ents, pos, k = [], [], 0, 0
    for seg in template:
        if seg in _SLOT_TYPES:
            s = fills[k]
            ents.append((seg, pos, pos + len(s)))
            parts.append(s)
            pos += len(s)
            k += 1
        else:
            parts.append(seg)
            pos += len(seg)
    return "".join(parts), ents


def _slots(template):
    return [seg for seg in template if seg in _SLOT_TYPES]


@pytest.fixture(scope="module")
def tagger():
    return DictTagger()


def test_exhaustive_per_slot_gold_recovery(tagger):
    """Every gazetteer surface in every slot of every template (other
    slots at index 0) must be recovered exactly — guards the
    no-spurious-match property the SQL oracle's positional gold
    construction relies on."""
    gaz = dict_gazetteers()
    texts, golds = [], []
    for template in TEMPLATES:
        slots = _slots(template)
        for k, etype in enumerate(slots):
            for s in gaz[etype]:
                fills = [gaz[e][0] for e in slots]
                fills[k] = s
                text, gold = _render_manual(template, fills)
                texts.append(text)
                golds.append(gold)
    tag_rows = tagger.decode(texts)
    for text, tags, gold in zip(texts, tag_rows, golds):
        assert sorted(extract_entities(tags)) == sorted(gold), text


def test_random_full_combinations_gold_recovery(tagger):
    """2000 random full slot combinations across all templates."""
    gaz = dict_gazetteers()
    rng = random.Random(7)
    texts, golds = [], []
    for _ in range(2000):
        template = rng.choice(TEMPLATES)
        fills = [rng.choice(gaz[e]) for e in _slots(template)]
        text, gold = _render_manual(template, fills)
        texts.append(text)
        golds.append(gold)
    for text, tags, gold in zip(texts, tagger.decode(texts), golds):
        assert sorted(extract_entities(tags)) == sorted(gold), text


def test_derived_corpus_gold_recovery(tagger):
    """The doc_id-derived corpus (what the driver queries actually
    run on): tagger output == positional gold for 2000 sentences."""
    gaz = dict_gazetteers()
    texts, golds = [], []
    for d in range(1000):
        for j in (0, 1):
            text, gold = render_dict_sentence(d, j, gaz)
            texts.append(text)
            golds.append([(e, s, t) for e, s, t, _ in gold])
    for text, tags, gold in zip(texts, tagger.decode(texts), golds):
        assert sorted(extract_entities(tags)) == sorted(gold), text


def test_sql_corpus_parity():
    """DuckDB prelude CTEs reproduce the Python renderer exactly
    (sentences + mention offsets) over a doc_id range."""
    duckdb = pytest.importorskip("duckdb")
    from kgforge.pipelines import dict_oracle

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS "
                "SELECT unnest(range(0, 300)) AS doc_id")
    gaz = dict_gazetteers()
    sql = (dict_oracle.corpus_prelude()
           + "\nSELECT d, j, sent_text, sent_offset FROM sents")
    for d, j, text, off in con.execute(sql).fetchall():
        exp_text, _ = render_dict_sentence(d, j, gaz)
        exp_off = 0 if j == 0 else len(render_dict_sentence(d, 0, gaz)[0])
        assert (text, off) == (exp_text, exp_off)
    sqlm = (dict_oracle.corpus_prelude()
            + "\nSELECT d, j, ms, me, surface, etype FROM ments")
    got: dict = {}
    for d, j, ms, me, s, e in con.execute(sqlm).fetchall():
        got.setdefault((d, j), []).append((e, ms, me, s))
    for d in range(300):
        for j in (0, 1):
            _, ents = render_dict_sentence(d, j, gaz)
            assert sorted(got.get((d, j), [])) == sorted(ents)


def test_dict_flagship_e2e(ray_session, tmp_path):
    """Full pipeline with DictTagger: T0 → explode/split → tag →
    mentions → triples → dedup edges; mentions equal the positional
    gold and edges equal the oracle rule engine's dedup output."""
    import ray.data as rd

    from kgforge.oracle.triples import (
        Mention, dedup_triples, extract_triples,
    )
    from kgforge.pipelines.flagship import run_flagship
    from kgforge.sources.dictcorpus import derive_dict_t0_batch

    n = 120
    docs_tbl = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    t0 = rd.from_arrow(derive_dict_t0_batch(docs_tbl)).repartition(4)
    res = run_flagship(t0_ds=t0, model_path="",
                       ckpt_root=str(tmp_path / "ckpt"),
                       tagger_cls=DictTagger, use_alias=False)

    gaz = dict_gazetteers()
    gold_triples = []
    gold_mentions = set()
    for d in range(n):
        off = 0
        for j in (0, 1):
            text, ents = render_dict_sentence(d, j, gaz)
            ms = [Mention(e, s, t, sf) for e, s, t, sf in ents]
            gold_triples.extend(extract_triples(
                text, ms, {}, f"dict-{d:08d}", 0, j))
            for e, s, t, sf in ents:
                gold_mentions.add((f"dict-{d:08d}", j, off, s, t, sf, e))
            off += len(text)

    got_m = {(r["doc_id"], r["sent_idx"], r["offset"], r["ment_start"],
              r["ment_end"], r["surface"], r["etype"])
             for r in res["mentions"].take_all()}
    assert got_m == gold_mentions

    gold_edges = dedup_triples(gold_triples)
    got_e = sorted(
        ((r["subj"], r["pred"], r["obj"], r["subj_type"], r["obj_type"],
          r["support"], r["first_doc"]) for r in res["edges"].take_all()))
    exp_e = sorted(
        ((r["subj"], r["pred"], r["obj"], r["subj_type"], r["obj_type"],
          r["support"], r["first_doc"]) for r in gold_edges))
    assert got_e == exp_e


def test_mention_dedup_two_tagger_union(ray_session):
    """D2: HMM-tagged ∪ dict-tagged mentions over the same sentences
    dedup to one row per span, keeping the max-score row (tagger name
    tie-break), via the range-exchange op."""
    import ray.data as rd

    from kgforge.stages.mentions import dedup_mentions_ds

    rows = []
    gaz = dict_gazetteers()
    for d in range(40):
        for j in (0, 1):
            text, ents = render_dict_sentence(d, j, gaz)
            for e, s, t, sf in ents:
                for tagger, score in (("hmm", 0.6), ("dict", 1.0)):
                    rows.append({
                        "doc_id": f"dict-{d:08d}", "span_idx": 0,
                        "sent_idx": j, "offset": 0, "ment_start": s,
                        "ment_end": t, "surface": sf, "etype": e,
                        "tagger": tagger, "score": score, "pid": d % 8})
    n_spans = len(rows) // 2
    out = dedup_mentions_ds(
        rd.from_items(rows).repartition(4)).to_pandas()
    assert len(out) == n_spans
    assert (out.tagger == "dict").all()          # max score wins
    # deterministic tie-break: equal scores -> lexicographic tagger
    tie = [dict(r, score=1.0) for r in rows]
    out2 = dedup_mentions_ds(rd.from_items(tie).repartition(4)).to_pandas()
    assert len(out2) == n_spans and (out2.tagger == "dict").all()
