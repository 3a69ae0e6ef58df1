"""Flagship end-to-end KG-construction pipeline (SURVEY §3.2).

    read T0 (lance-layout / parquet, 8×CPU blocks)  [streaming source]
      └─ M6+M7+L3 explode spans → sentences        ┐ ONE fused operator
      └─ A1 tagger (task fn + per-worker model     │ (tasks); actor pool
         cache; actor pool via tagger_cls/mode)    │ when state is
      └─ M4 attach mentions (vectorized)           │ expensive (BiLSTM,
      └─ write-through CHECKPOINT "sentences"      ┘ GPU)
      └─ T1 explode → materialize (in-memory fan-out)
      └─ G4 alias resolution: per-batch combine → driver small-side
         merge + blocked verify (salted-groupby path retained)
      └─ ray.put alias map → TripleExtractor       [broadcast + tasks]
      └─ write-through CHECKPOINT "triples"
      └─ D1+O2 range-exchange dedup+sort → edges   [ONE custom exchange]
      └─ G5 range-exchange node finalize           [ONE custom exchange]
      └─ S4 write graph tables + lineage
      └─ M10 I1 verification lanes (optional): passthrough hash +
         output-side sentence reconstruction

Checkpoints are the resume points: any stage whose ``_SUCCESS`` exists
is skipped on a restart with the same ``ckpt_root`` (CheckpointManager
docstring has the atomicity story); downstream consumers stream from
the materialized blocks, the Parquet exists for resume.

Never calls ``ray.init`` (driver contract).
"""

from __future__ import annotations

import os

from kgforge.sources.graph import build_nodes_ds, write_graph_table
from kgforge.sources.interleaved import read_interleaved
from kgforge.stages.checkpoint import CheckpointManager
from kgforge.stages.explode import make_explode_spans
from kgforge.stages.linking import build_alias_map, make_canon_lookup_fn
from kgforge.stages.mentions import attach_mentions, explode_mentions
from kgforge.stages.tagger import HmmTagger, make_hmm_tagger_fn
from kgforge.stages.triples import dedup_triples_ds, make_triple_extract_fn


def run_flagship(t0_path: str | None = None, t0_ds=None, *,
                 model_path: str, ckpt_root: str,
                 num_partitions: int = 32,
                 tagger_concurrency: int | tuple | None = None,
                 tagger_batch_size: int = 1024,
                 tagger_mode: str = "tasks",
                 tagger_cls=None,
                 tagger_num_gpus: float = 0,
                 read_blocks: int | None = None,
                 out_dir: str | None = None,
                 use_alias: bool = True,
                 verify_i1: bool = False) -> dict:
    """Run (or resume) the flagship pipeline.  Returns dataset handles +
    summary counts; writes node/edge tables under ``out_dir`` if given.

    ``read_blocks``: block count for the T0 read (default 8× cluster
    CPUs).  A block is the per-task unit of every downstream map stage —
    too few or uneven blocks puts a straggler on the critical path
    (measured 2× on the tagger stage at 32 CPUs).
    """
    import time

    import ray

    ckpt = CheckpointManager(ckpt_root, num_partitions)
    timings: dict[str, float] = {}
    _t = time.monotonic()

    def _mark(name: str) -> None:
        nonlocal _t
        now = time.monotonic()
        timings[name] = round(now - _t, 3)
        _t = now

    def t0():
        if t0_ds is not None:
            return t0_ds
        nb = read_blocks
        if nb is None:
            nb = int(8 * ray.cluster_resources().get("CPU", 8))
        return read_interleaved(t0_path, override_num_blocks=nb)

    # ---- stage 1: sentences (explode → tag → mentions) -------------------
    if ckpt.is_complete("sentences"):
        sentences = ckpt.read_stage("sentences")
    else:
        sents = t0().map_batches(make_explode_spans(num_partitions),
                                 batch_format="pyarrow")
        if tagger_mode == "actors" or tagger_cls is not None:
            conc = tagger_concurrency
            if conc is None:
                # autoscaling pool capped below the cluster CPU count: a
                # fixed pool equal to all CPUs starves upstream all-to-all
                # tasks (repartition) of workers → scheduling deadlock
                cpus = int(ray.cluster_resources().get("CPU", 8))
                conc = (1, max(1, cpus - 1))
            # expensive-per-worker state (BiLSTM weights, GPU): class
            # UDF actor pool, setup once per actor in __init__.  Any
            # Tagger-protocol class plugs in via ``tagger_cls``
            # (SURVEY §2.10); ``tagger_num_gpus`` reserves GPU slices
            # per actor (e.g. 0.25 → 4 taggers share a device) — the
            # model's .to("cuda") in __init__ is the only other change
            # a GPU tagger needs.
            cls = tagger_cls or HmmTagger
            gpu_kw = {"num_gpus": tagger_num_gpus} if tagger_num_gpus \
                else {}
            tagged = sents.map_batches(
                cls, fn_constructor_kwargs={"model_path": model_path},
                batch_format="pyarrow", batch_size=tagger_batch_size,
                concurrency=conc, num_cpus=1, **gpu_kw)
        else:
            # cheap state (HMM .npz): stateless fn + per-worker model
            # cache — fuses read→explode→tag→mentions→checkpoint into
            # one operator, no pool spin-up
            tagged = sents.map_batches(
                make_hmm_tagger_fn(model_path), batch_format="pyarrow",
                batch_size=tagger_batch_size)
        with_mentions = tagged.map_batches(attach_mentions,
                                           batch_format="pyarrow")
        from kgforge.stages.mentions import sentence_stage_schema

        sentences = ckpt.write_stage("sentences", with_mentions,
                                     checksum_cols=["doc_id", "span_idx",
                                                    "sent_idx", "sent_text"],
                                     schema=sentence_stage_schema())
    _mark("sentences")

    # ---- stage 2: T1 mentions (in-memory fan-out point; derived from
    # the 'sentences' checkpoint in one cheap pass, so it is NOT its own
    # disk checkpoint — resume recomputes it from 'sentences') ----------
    mentions = sentences.map_batches(explode_mentions,
                                     batch_format="pyarrow").materialize()
    _mark("mentions")

    # ---- stage 3: alias resolution (G4) ---------------------------------
    # use_alias=False: canonicalization is identity (the dictionary lane
    # needs SQL-reproducible surfaces; alias discovery is minhash-based)
    alias_map = build_alias_map(mentions) if use_alias else {}
    alias_ref = ray.put(alias_map)
    _mark("alias")

    # ---- stage 4: triples (T3) ------------------------------------------
    if ckpt.is_complete("triples"):
        triples = ckpt.read_stage("triples")
    else:
        t3 = sentences.map_batches(make_triple_extract_fn(alias_ref),
                                   batch_format="pyarrow")
        from kgforge.stages.triples import TRIPLE_SCHEMA

        triples = ckpt.write_stage(
            "triples", t3, checksum_cols=["subj", "pred", "obj", "doc_id"],
            schema=TRIPLE_SCHEMA)
    _mark("triples")

    # ---- stage 5: dedup + sort → edges; nodes ---------------------------
    edges = dedup_triples_ds(triples)
    _mark("edges_exchange")
    linked = mentions.map_batches(make_canon_lookup_fn(alias_ref),
                                  batch_format="pyarrow")
    nodes = build_nodes_ds(linked)
    _mark("nodes_build")

    result = {"sentences": sentences, "mentions": mentions,
              "triples": triples, "edges": edges, "nodes": nodes,
              "alias_map": alias_map, "ckpt": ckpt, "timings": timings}

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        result["edges_path"] = write_graph_table(edges, out_dir, "edges")
        _mark("edges_write")
        result["nodes_path"] = write_graph_table(nodes, out_dir, "nodes")
        _mark("nodes_write")
        # re-read the written tables so downstream consumers stream from
        # disk instead of re-running the dedup shuffle
        import ray.data as rd

        result["edges"] = rd.read_parquet(result["edges_path"],
                                          file_extensions=["parquet"])
        result["nodes"] = rd.read_parquet(result["nodes_path"],
                                          file_extensions=["parquet"])
        _mark("graph_reread")

    if verify_i1:
        from kgforge.stages.invariant import (
            verify_invariant_output, verify_sentence_reconstruction,
        )

        # REAL output side: per-doc span-sequence hash of the input vs
        # the sequence rebuilt from the pipeline's own 'sentences'
        # output (+ media passthrough) — a sentence dropped, edited or
        # reordered anywhere in explode → tag → checkpoint flips this
        result["i1_violations"] = verify_invariant_output(t0(), sentences)
        # per-span evidence: every text span's full text is
        # reconstructible from the pipeline's own sentence rows
        result["i1_span_violations"] = \
            verify_sentence_reconstruction(t0(), sentences)

    return result
