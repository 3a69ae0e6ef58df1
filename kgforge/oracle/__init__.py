"""Pure single-process numpy reference semantics (no Ray imports).

This package plays the role of the absent reference repo
(``/root/reference`` was empty — SURVEY.md §0): it pins the exact
semantics the distributed pipeline must reproduce — HMM fit + Viterbi
decode, BIO/BIOES label codec, entity extraction, minhash-blocked
entity linking, pattern triple extraction, MSRA-style per-entity
P/R/F1.  Goldens under ``tests/golden/`` are frozen from this package.

``REF?:`` tags in docstrings mark the expected reference loci to be
re-verified per SURVEY.md §0.1 when the reference mounts.
"""
