"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on
``/root/testdata/sf0.001`` (interleaved T0 docs per BASELINE.json:15,
unioned with the deterministic T0 derivation of the driver's
``documents`` table) and returns the edge table.

``queries()`` / ``oracle_sql()`` expose every operator family from
SURVEY.md §2 plus the training-data ops (dedup, similarity search,
text analysis, multimodal plumbing, event windows) — see
``kgforge/pipelines/driver_queries.py`` for the implementations and
the column-name/rounding conventions shared with the SQL twins.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or anywhere in ``kgforge``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001; returns the deduped, sorted edge
    table (subj, pred, obj, support, first_doc)."""
    from kgforge.pipelines.driver_queries import _flagship_for

    return _flagship_for(SF0001)["edges"]


def queries() -> dict[str, Callable[[str], Any]]:
    from kgforge.pipelines.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kgforge.pipelines.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
