"""BIO / BIOES label schemes and tag-sequence → entity extraction.

Reference expectation: ``REF?:`` label-scheme utility + entity
extraction in the eval module (SURVEY.md §2.2 M4/M5; BASELINE.json:6
pins "BIO/BIOES label schemes").  Decoding is *tolerant*: an ``I-X``
after ``O`` or after a different type starts a new entity (the common
convention in this repo family; re-verify per SURVEY §0.1 — this is the
single constant most likely to shift P/R against the real reference).
"""

from __future__ import annotations

ENTITY_TYPES = ("PER", "LOC", "ORG")

# Canonical BIO tag order — O first, then B/I per type.  Tag ids used by
# the HMM and the CRF both index into this list.
BIO_TAGS: tuple[str, ...] = ("O",) + tuple(
    p + t for t in ENTITY_TYPES for p in ("B-", "I-")
)
BIO_TAG_TO_ID = {t: i for i, t in enumerate(BIO_TAGS)}

BIOES_TAGS: tuple[str, ...] = ("O",) + tuple(
    p + t for t in ENTITY_TYPES for p in ("B-", "I-", "E-", "S-")
)


def bio_to_bioes(tags: list[str]) -> list[str]:
    """BIO → BIOES relabel (B alone → S; trailing I → E)."""
    out = list(tags)
    n = len(tags)
    for i, tag in enumerate(tags):
        if tag == "O":
            continue
        prefix, etype = tag.split("-", 1)
        nxt = tags[i + 1] if i + 1 < n else "O"
        continues = nxt == "I-" + etype
        if prefix == "B":
            out[i] = ("B-" if continues else "S-") + etype
        elif prefix == "I":
            out[i] = ("I-" if continues else "E-") + etype
    return out


def bioes_to_bio(tags: list[str]) -> list[str]:
    """BIOES → BIO relabel (S→B, E→I)."""
    out = []
    for tag in tags:
        if tag == "O":
            out.append(tag)
            continue
        prefix, etype = tag.split("-", 1)
        out.append({"S": "B-", "E": "I-", "B": "B-", "I": "I-"}[prefix] + etype)
    return out


def extract_entities(tags: list[str]) -> list[tuple[str, int, int]]:
    """Tag sequence → ``[(etype, start, end_exclusive)]``.

    Accepts BIO or BIOES.  Tolerant: ``I-X``/``E-X`` with no open
    entity of type X opens a new one (start-new convention).
    """
    ents: list[tuple[str, int, int]] = []
    cur_type: str | None = None
    cur_start = 0
    for i, tag in enumerate(tags):
        if tag == "O":
            if cur_type is not None:
                ents.append((cur_type, cur_start, i))
                cur_type = None
            continue
        prefix, etype = tag.split("-", 1)
        if prefix in ("B", "S") or cur_type != etype:
            if cur_type is not None:
                ents.append((cur_type, cur_start, i))
            cur_type, cur_start = etype, i
        if prefix in ("E", "S"):
            ents.append((cur_type, cur_start, i + 1))
            cur_type = None
    if cur_type is not None:
        ents.append((cur_type, cur_start, len(tags)))
    return ents
