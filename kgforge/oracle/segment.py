"""Sentence segmentation shared by oracle and distributed pipeline
(SURVEY §2.2 M7).  Must be byte-identical in both paths — conformance
depends on identical sentence boundaries."""

from __future__ import annotations

_TERMINATORS = "。！？；"


def split_sentences(text: str) -> list[tuple[int, str]]:
    """Split on Chinese sentence terminators, delimiter kept attached.

    Returns ``[(char_offset_in_text, sentence)]``; empty input → [].
    """
    out: list[tuple[int, str]] = []
    start = 0
    for i, ch in enumerate(text):
        if ch in _TERMINATORS:
            out.append((start, text[start: i + 1]))
            start = i + 1
    if start < len(text):
        out.append((start, text[start:]))
    return out
