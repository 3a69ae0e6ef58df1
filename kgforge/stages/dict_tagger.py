"""Dictionary (gazetteer) tagger — the deterministic, SQL-verifiable
member of the ``Tagger`` protocol (SURVEY §2.10).

Greedy leftmost-longest matching over a closed surface dictionary:
scan left to right; at the first position where any dictionary surface
matches, take the longest such surface, emit ``B-X I-X…`` and continue
after it.  Implemented as one compiled regex alternation sorted
longest-first (``re`` picks the leftmost start and, among alternatives
at that start, the first listed — longest-first ordering makes that
the longest match), so the per-batch work is C-speed regex scanning
plus a numpy scatter into the tag-code matrix.

Same actor-pool slot as :class:`kgforge.stages.tagger.HmmTagger`:
``__init__`` compiles the automaton once per actor, ``__call__`` tags a
batch.  ``model_path`` is accepted (and ignored) for protocol parity —
the dictionary IS the model and is frozen in
:mod:`kgforge.sources.dictcorpus`.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from kgforge.sources.dictcorpus import dict_gazetteers


class DictTagger:
    TEXT_COL = "sent_text"

    def __init__(self, model_path: str | None = None,
                 gazetteers: dict[str, list[str]] | None = None):
        gaz = gazetteers or dict_gazetteers()
        self.etype_of: dict[str, str] = {}
        for etype, surfaces in gaz.items():
            for s in surfaces:
                self.etype_of[s] = etype
        ordered = sorted(self.etype_of, key=lambda s: (-len(s), s))
        self._rx = re.compile("|".join(re.escape(s) for s in ordered))
        # tag vocabulary: O + B-/I- per etype (stable order)
        etypes = sorted(gaz)
        self.tags: list[str] = ["O"]
        self._b_code: dict[str, int] = {}
        self._i_code: dict[str, int] = {}
        for e in etypes:
            self._b_code[e] = len(self.tags)
            self.tags.append(f"B-{e}")
            self._i_code[e] = len(self.tags)
            self.tags.append(f"I-{e}")

    def decode_column(self, texts: list[str]) -> pa.Array:
        """Batch decode → ``list<dictionary<int8, string>>`` (same
        zero-object layout as the HMM tagger's output column)."""
        if not texts:
            return pa.array([], type=pa.list_(
                pa.dictionary(pa.int8(), pa.string())))
        lengths = np.array([len(t) for t in texts], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
        flat = np.zeros(int(offsets[-1]), dtype=np.int8)
        rx = self._rx
        for i, text in enumerate(texts):
            base = int(offsets[i])
            for m in rx.finditer(text):
                etype = self.etype_of[m.group(0)]
                s, e = m.start(), m.end()
                flat[base + s] = self._b_code[etype]
                if e - s > 1:
                    flat[base + s + 1: base + e] = self._i_code[etype]
        dict_arr = pa.DictionaryArray.from_arrays(
            pa.array(flat), pa.array(self.tags, pa.string()))
        return pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), pa.int32()), dict_arr)

    def decode(self, texts: list[str]) -> list[list[str]]:
        col = self.decode_column(texts)
        return [[t for t in row] for row in col.to_pylist()]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.TEXT_COL].to_pylist()
        tags_col = self.decode_column(texts)
        if "tags" in batch.column_names:
            batch = batch.drop_columns(["tags"])
        return batch.append_column("tags", tags_col)
