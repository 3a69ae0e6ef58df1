"""Deterministic synthetic Chinese-NER corpus + interleaved-doc generator.

Stands in for the reference's MSRA-style training/test distribution
(``REF?:data/train.txt`` / ``test.txt`` — char-per-line ``字 TAG``,
blank-line sentence breaks; SURVEY.md §1.1 S1, FIXTURES.md §A).  All
randomness is ``random.Random(seed)`` — identical output on every
machine and run.

Also generates the T0 interleaved text+media document table of
``BASELINE.json:15`` (FIXTURES.md §B): ``doc_id:string,
spans:list<struct<kind,text,media_ref,offset>>``.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Gazetteers (closed, frozen — FIXTURES.md §A).  Alias pairs (北京大学/北大,
# 清华大学/清华, ...) deliberately share prefixes to exercise minhash blocking.
# ---------------------------------------------------------------------------

_SURNAMES = list("王李张刘陈杨赵黄周吴徐孙胡朱高林何郭马罗")
_GIVEN = [
    "伟", "芳", "娜", "敏", "静", "丽", "强", "磊", "军", "洋",
    "勇", "艳", "杰", "娟", "涛", "明", "超", "秀英", "建华", "文博",
    "思远", "雨桐", "子轩", "欣怡", "浩然", "志强", "国平", "海燕", "春梅", "冬梅",
]

LOC_GAZETTEER = [
    "北京", "上海", "广州", "深圳", "杭州", "南京", "武汉", "成都", "重庆", "西安",
    "天津", "苏州", "长沙", "沈阳", "青岛", "大连", "厦门", "福州", "济南", "合肥",
    "郑州", "昆明", "南昌", "贵阳", "兰州", "太原", "石家庄", "哈尔滨", "长春", "南宁",
    "海口", "乌鲁木齐", "拉萨", "银川", "西宁", "湖南", "湖北", "广东", "浙江", "江苏",
]

ORG_GAZETTEER = [
    "北京大学", "北大", "清华大学", "清华", "复旦大学", "浙江大学", "南京大学", "武汉大学",
    "中山大学", "四川大学", "华为", "华为技术有限公司", "阿里巴巴", "阿里巴巴集团", "腾讯",
    "腾讯科技", "百度", "京东", "小米", "字节跳动", "美团", "网易", "联想", "中国银行",
    "工商银行", "建设银行", "农业银行", "招商银行", "中国移动", "中国联通", "中国电信",
    "国家电网", "中国石油", "中国石化", "中国科学院", "社会科学院", "新华社", "人民日报",
    "中央电视台", "商务印书馆",
]

# Known alias clusters (ground truth for linking tests only; the engine
# must *discover* these via minhash + Jaccard, never read this list).
KNOWN_ALIASES = [
    ("北京大学", "北大"),
    ("清华大学", "清华"),
    ("华为技术有限公司", "华为"),
    ("阿里巴巴集团", "阿里巴巴"),
    ("腾讯科技", "腾讯"),
]


def per_gazetteer(n: int = 60, seed: int = 42) -> list[str]:
    """~60 deterministic PER surface forms (surname × given)."""
    rng = random.Random(seed * 7 + 1)
    names: list[str] = []
    seen: set[str] = set()
    while len(names) < n:
        nm = rng.choice(_SURNAMES) + rng.choice(_GIVEN)
        if nm not in seen:
            seen.add(nm)
            names.append(nm)
    return names


# ---------------------------------------------------------------------------
# Sentence templates.  Each template is a list of segments; a segment is
# either a literal string (tagged O) or a slot type "PER"/"LOC"/"ORG".
# Connectives align with the triple rules in kgforge/oracle/triples.py —
# the golden triples are a deterministic function of these templates.
# ---------------------------------------------------------------------------

TEMPLATES: list[list[str]] = [
    ["PER", "在", "ORG", "工作。"],
    ["PER", "任职于", "ORG", "。"],
    ["ORG", "位于", "LOC", "。"],
    ["PER", "出生于", "LOC", "。"],
    ["PER", "访问了", "LOC", "。"],
    ["ORG", "与", "ORG", "达成合作。"],
    ["PER", "和", "PER", "是同事。"],
    ["今天天气很好。"],
    ["股市行情平稳。"],
    ["LOC", "的", "ORG", "发布了新产品。"],
    ["PER", "在", "LOC", "的", "ORG", "工作。"],
    ["据报道，", "ORG", "将在", "LOC", "设立分部。"],
    ["PER", "毕业于", "ORG", "。"],
]

_SLOT_TYPES = {"PER", "LOC", "ORG"}


@dataclass
class Sentence:
    """One labeled sentence: aligned chars/tags + typed entity segments."""

    chars: list[str]
    tags: list[str]
    entities: list[tuple[str, int, int, str]] = field(default_factory=list)
    # entities: (etype, start, end_exclusive, surface) in char offsets

    @property
    def text(self) -> str:
        return "".join(self.chars)


def _render(template: list[str], rng: random.Random, gaz: dict[str, list[str]],
            hot_org: str | None = None) -> Sentence:
    chars: list[str] = []
    tags: list[str] = []
    ents: list[tuple[str, int, int, str]] = []
    for seg in template:
        if seg in _SLOT_TYPES:
            if seg == "ORG" and hot_org is not None:
                surface = hot_org
                hot_org = None  # only substitute the first ORG slot
            else:
                surface = rng.choice(gaz[seg])
            start = len(chars)
            for i, ch in enumerate(surface):
                chars.append(ch)
                tags.append(("B-" if i == 0 else "I-") + seg)
            ents.append((seg, start, len(chars), surface))
        else:
            for ch in seg:
                chars.append(ch)
                tags.append("O")
    return Sentence(chars, tags, ents)


def make_gazetteers(seed: int = 42) -> dict[str, list[str]]:
    return {"PER": per_gazetteer(60, seed), "LOC": list(LOC_GAZETTEER),
            "ORG": list(ORG_GAZETTEER)}


# ~20% of entity sentences mention one hot ORG — exercises salted-key
# repartition before the canonicalization groupby (SURVEY §4 P3).
HOT_ORG = "华为"


def generate_corpus(n_sentences: int, seed: int = 42) -> list[Sentence]:
    """Deterministic labeled corpus (FIXTURES.md §A)."""
    rng = random.Random(seed)
    gaz = make_gazetteers(seed)
    out: list[Sentence] = []
    for _ in range(n_sentences):
        template = rng.choice(TEMPLATES)
        hot = HOT_ORG if rng.random() < 0.20 else None
        out.append(_render(template, rng, gaz, hot_org=hot))
    return out


def corpus_to_conll(sentences: list[Sentence]) -> str:
    """Serialize to the reference's char-per-line format
    (``字<space>TAG``, blank line between sentences)."""
    blocks = ["\n".join(f"{c} {t}" for c, t in zip(s.chars, s.tags)) for s in sentences]
    return "\n\n".join(blocks) + "\n"


def parse_conll(text: str) -> list[Sentence]:
    """Inverse of :func:`corpus_to_conll` (oracle-side S1 reader)."""
    sents: list[Sentence] = []
    for block in text.split("\n\n"):
        block = block.strip("\n")
        if not block:
            continue
        chars, tags = [], []
        for line in block.splitlines():
            if not line.strip():
                continue
            ch, tag = line.rsplit(" ", 1)
            chars.append(ch)
            tags.append(tag)
        sents.append(Sentence(chars, tags))
    return sents


# ---------------------------------------------------------------------------
# T0 interleaved-document generator (FIXTURES.md §B; BASELINE.json:15)
# ---------------------------------------------------------------------------

def generate_interleaved_docs(n_docs: int, seed: int = 42,
                              sentences: list[Sentence] | None = None
                              ) -> list[dict]:
    """Deterministic T0 rows: ``{doc_id, spans:[{kind,text,media_ref,offset}]}``.

    Edge cases built in (FIXTURES.md §B): media-only docs, empty-text
    spans, duplicate sentences across docs (→ dedup), hot-entity docs,
    and (for n_docs ≥ 100) one very wide doc.
    """
    rng = random.Random(seed + 1)
    if sentences is None:
        sentences = generate_corpus(max(200, n_docs // 2), seed=seed)
    texts = [s.text for s in sentences]
    docs: list[dict] = []
    for d in range(n_docs):
        doc_id = f"doc-{d:08d}"
        spans: list[dict] = []
        offset = 0
        if d % 97 == 13:           # media-only doc
            n_spans = rng.randint(1, 3)
            kinds = ["media"] * n_spans
        elif d % 97 == 29:         # doc with an empty text span
            kinds = ["text", "empty", "text"]
        elif n_docs >= 100 and d == 7:   # very wide doc
            kinds = ["text"] * 400
        else:
            n_spans = rng.randint(1, 12)
            kinds = ["text" if rng.random() < 0.7 else "media" for _ in range(n_spans)]
        for k in kinds:
            if k == "text" or k == "empty":
                if k == "empty":
                    text = ""
                elif rng.random() < 0.15:     # duplicated sentence across docs
                    text = texts[rng.randint(0, min(49, len(texts) - 1))]
                else:
                    text = "".join(rng.choice(texts)
                                   for _ in range(rng.randint(1, 3)))
                spans.append({"kind": "text", "text": text,
                              "media_ref": "", "offset": offset})
                offset += len(text)
            else:
                kind = rng.choice(["image", "audio"])
                ref = f"media://{kind}/{rng.randint(0, 999999):06d}"
                spans.append({"kind": kind, "text": "",
                              "media_ref": ref, "offset": offset})
        docs.append({"doc_id": doc_id, "spans": spans})
    return docs
