"""Deterministic dictionary-lane corpus derived from the driver's
``documents`` table (doc_id only) by pure modular arithmetic — the
SQL-verifiable twin of the fixture corpus generator.

Why this exists: the flagship KG lane is model-based (HMM / BiLSTM),
so the driver can only rows-check it.  This module gives the KG lane a
*value-exact* DuckDB oracle: every doc renders two template sentences
whose template/slot choices are ``(doc_id * a + b) % n`` — arithmetic
DuckDB reproduces verbatim (``kgforge.pipelines.dict_oracle`` generates
the matching SQL from the same TEMPLATES/gazetteer constants).  The
Ray side then runs the REAL pipeline (explode → sentence split →
dictionary tagger → mentions → triples → dedup) and must land on the
constructed gold exactly.

Shared formulas (must match dict_oracle's SQL 1:1):

- template of sentence ``j`` of doc ``d``: ``(d * (1 + 2j) + 5j) % 13``
- surface of slot ``k``:   ``(d * (3 + 2k + 5j) + 11k + 7j) % len(gaz)``
"""

from __future__ import annotations

import pyarrow as pa

from kgforge.oracle.corpus import _SLOT_TYPES, TEMPLATES, make_gazetteers
from kgforge.sources.interleaved import T0_SCHEMA

N_TPL = len(TEMPLATES)
SENTS_PER_DOC = 2


def tpl_index(doc_id: int, j: int) -> int:
    return (doc_id * (1 + 2 * j) + 5 * j) % N_TPL


def slot_index(doc_id: int, j: int, k: int, n: int) -> int:
    return (doc_id * (3 + 2 * k + 5 * j) + 11 * k + 7 * j) % n


_GAZ_CACHE: dict = {}


def dict_gazetteers() -> dict[str, list[str]]:
    """The frozen seed-42 gazetteers (same surfaces the fixture corpus
    uses; deterministic, cached per process)."""
    if "gaz" not in _GAZ_CACHE:
        _GAZ_CACHE["gaz"] = make_gazetteers(seed=42)
    return _GAZ_CACHE["gaz"]


def render_dict_sentence(doc_id: int, j: int,
                         gaz: dict[str, list[str]] | None = None
                         ) -> tuple[str, list[tuple[str, int, int, str]]]:
    """Sentence ``j`` of doc ``doc_id``: (text, gold entities).

    Entities are ``(etype, start, end_exclusive, surface)`` in
    sentence-local char offsets — the positional ground truth the
    dictionary tagger must recover and the SQL oracle reconstructs."""
    gaz = gaz or dict_gazetteers()
    template = TEMPLATES[tpl_index(doc_id, j)]
    parts: list[str] = []
    ents: list[tuple[str, int, int, str]] = []
    pos = 0
    k = 0
    for seg in template:
        if seg in _SLOT_TYPES:
            surfaces = gaz[seg]
            s = surfaces[slot_index(doc_id, j, k, len(surfaces))]
            ents.append((seg, pos, pos + len(s), s))
            parts.append(s)
            pos += len(s)
            k += 1
        else:
            parts.append(seg)
            pos += len(seg)
    return "".join(parts), ents


def derive_dict_t0_batch(batch: pa.Table) -> pa.Table:
    """documents rows → T0 rows: one text span holding the doc's two
    rendered sentences (every template ends with a terminator, so the
    pipeline's sentence splitter recovers them exactly)."""
    gaz = dict_gazetteers()
    rows = []
    for d in batch["doc_id"].to_pylist():
        t0, _ = render_dict_sentence(d, 0, gaz)
        t1, _ = render_dict_sentence(d, 1, gaz)
        rows.append({
            "doc_id": f"dict-{d:08d}",
            "spans": [{"kind": "text", "text": t0 + t1,
                       "media_ref": "", "offset": 0}],
        })
    return pa.Table.from_pylist(rows, schema=T0_SCHEMA)


def derive_dict_t0_ds(sf_dir: str, num_blocks: int = 64):
    """Lazy T0 Dataset from ``{sf_dir}/documents.parquet`` (doc_id-only
    pruned read, repartitioned so downstream stages fan out — the
    source is a single file)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"],
                           override_num_blocks=num_blocks)
    return docs.map_batches(derive_dict_t0_batch, batch_format="pyarrow")
