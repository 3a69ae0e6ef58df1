"""Char-level vocabulary (``REF?:`` vocab module; SURVEY §2.2 M2, §2.6 O1).

char → id by descending training-corpus frequency, ties broken by
codepoint ascending (deterministic); reserved ids ``PAD=0``, ``UNK=1``.
"""

from __future__ import annotations

from collections import Counter

PAD_ID = 0
UNK_ID = 1
RESERVED = ("<PAD>", "<UNK>")


def build_vocab(char_counts: Counter | dict[str, int]) -> dict[str, int]:
    """Frequency-ordered char → id map (ids start after reserved)."""
    ordered = sorted(char_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {tok: i for i, tok in enumerate(RESERVED)}
    for i, (ch, _) in enumerate(ordered):
        vocab[ch] = i + len(RESERVED)
    return vocab


def count_chars(sentences) -> Counter:
    c: Counter = Counter()
    for s in sentences:
        c.update(s.chars)
    return c


def encode(chars: list[str], vocab: dict[str, int]) -> list[int]:
    return [vocab.get(ch, UNK_ID) for ch in chars]
