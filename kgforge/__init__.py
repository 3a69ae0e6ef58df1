"""kgforge — a Ray-Data-native knowledge-graph-construction engine.

From-scratch build with the query/data-processing capabilities of the
reference (``boyshen/NER``-style Chinese sequence tagging → KG triples),
re-expressed Ray-Data-first per ``SURVEY.md``.  The reference repo was
unavailable at build time (SURVEY.md §0); reference semantics are pinned
by the pure-numpy conformance oracle in :mod:`kgforge.oracle` instead,
with ``REF?:`` expectation tags in docstrings marking where real
``file:line`` citations should be substituted once the reference mounts.

Layout
------
- ``kgforge.common``    — stable hashing, constants, small shared utils
- ``kgforge.oracle``    — single-process numpy reference semantics
  (corpus generator, HMM fit+Viterbi, BIO/BIOES, entity extraction,
  minhash linking, triple rules, per-type P/R/F1)
- ``kgforge.sources``   — readers/writers (CoNLL, interleaved T0,
  graph tables, checkpoints)
- ``kgforge.stages``    — Ray Data map_batches / groupby stages
- ``kgforge.functions`` — training-data ops over generic document /
  embedding tables (dedup, similarity search, text analysis, multimodal)
- ``kgforge.pipelines`` — end-to-end flagship pipeline + resume runner

No module in this package calls ``ray.init`` / ``ray.shutdown``; only
``bench.py`` and the test fixture own a Ray session (driver contract,
``__ray_entry__.py``).
"""

__version__ = "0.1.0"
