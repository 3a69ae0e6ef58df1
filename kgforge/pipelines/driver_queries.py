"""Driver-contract query registry: every entry in ``QUERIES`` is a
callable ``(sf_dir) -> Dataset | pa.Table | pd.DataFrame``; entries
with a matching key in ``ORACLE_SQL`` are verified value-exactly by
the driver against DuckDB over the same parquet tables (tables
``region nation customer supplier part orders lineitem events
documents embeddings`` pre-registered).  Keys absent from
``ORACLE_SQL`` get a rows-only check (model-based / approximate ops).

Column names and rounding are shared verbatim between each Ray
implementation and its SQL twin — the driver's compare sorts columns
by name and hashes values.

Never calls ``ray.init`` (driver contract).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgforge.functions import dedup as F_dedup
from kgforge.functions import events as F_events
from kgforge.functions import indexing as F_indexing
from kgforge.functions import joins as F_joins
from kgforge.functions import simsearch as F_sim
from kgforge.functions import textstats as F_text
from kgforge.functions.multimodal import FrameSampler, media_features_ds
from kgforge.sources.derive import derive_t0_ds, explode_t0_ds


def _r2(col):
    return pc.round(col, ndigits=2, round_mode="half_towards_infinity")


def _attach_right(t, starts, nl, nr, left_cols, right_col, out_names):
    """Inner-join gather for a unique right side inside a
    ``cogroup_partition_ds`` callback: left rows of runs with both
    sides present, each annotated with the run's (single) right value
    — one repeat/flatnonzero pass, no per-key Python."""
    total = nl + nr
    row_key = np.repeat(np.arange(len(nl)), total)
    pos = np.arange(len(row_key))
    in_left = pos < (starts + nl)[row_key]
    mask = ((nl > 0) & (nr > 0))[row_key] & in_left
    lidx = np.flatnonzero(mask)
    ridx = (starts + nl)[row_key][lidx]
    cols = {name: t[c].take(pa.array(lidx))
            for c, name in zip(left_cols, out_names)}
    cols[right_col[1]] = t[right_col[0]].take(pa.array(ridx))
    return pa.table(cols)


def _read(sf_dir: str, table: str, columns=None, row_filter=None):
    """Column- AND row-pruned parquet read: ``row_filter`` is a
    ``pyarrow.dataset`` expression pushed into the scan, so row groups
    whose statistics exclude the predicate never leave storage and
    non-matching rows never materialize into blocks."""
    import ray.data as rd

    kw = {"columns": columns}
    if row_filter is not None:
        kw["filter"] = row_filter
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", **kw)


# ---------------------------------------------------------------------------
# KG lane over the derived T0 table (SQL-verifiable plumbing)
# ---------------------------------------------------------------------------

def q_explode_spans(sf_dir: str):
    return explode_t0_ds(derive_t0_ds(sf_dir))


def q_media_features(sf_dir: str):
    spans = explode_t0_ds(derive_t0_ds(sf_dir))
    return media_features_ds(spans, mode="fake")


def q_frame_sample(sf_dir: str):
    spans = explode_t0_ds(derive_t0_ds(sf_dir))
    return spans.map_batches(FrameSampler, batch_format="pyarrow",
                             concurrency=(1, 4))


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------

def q_token_stats(sf_dir: str):
    return F_text.token_stats_ds(_read(sf_dir, "documents",
                                       ["doc_id", "text"]))


def q_type_token_ratio(sf_dir: str):
    return F_text.type_token_ratio_ds(_read(sf_dir, "documents",
                                            ["doc_id", "text"]))


def q_json_field_stats(sf_dir: str):
    return F_events.json_field_stats_ds(
        _read(sf_dir, "events", ["event_type", "props"]))


def q_topk_paths(sf_dir: str):
    return F_events.topk_paths_ds(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"]),
        k=10, steps=3)


def q_ref_integrity(sf_dir: str):
    """Cross-table referential-integrity report: one row per FK
    relation with child-row/key and orphan counts.  Each relation is
    one `orphan_audit_ds` cogroup over key-cardinality partials; the
    final fold sums ≤ P partial rows per relation on the driver (a
    4×P-row collect)."""
    from kgforge.functions.joins import orphan_audit_ds

    rels = [
        ("customer.nationkey->nation",
         _read(sf_dir, "customer", ["c_nationkey"]), "c_nationkey",
         _read(sf_dir, "nation", ["n_nationkey"]), "n_nationkey"),
        ("events.user_id->customer",
         _read(sf_dir, "events", ["user_id"]), "user_id",
         _read(sf_dir, "customer", ["c_custkey"]), "c_custkey"),
        ("lineitem.orderkey->orders",
         _read(sf_dir, "lineitem", ["l_orderkey"]), "l_orderkey",
         _read(sf_dir, "orders", ["o_orderkey"]), "o_orderkey"),
        ("orders.custkey->customer",
         _read(sf_dir, "orders", ["o_custkey"]), "o_custkey",
         _read(sf_dir, "customer", ["c_custkey"]), "c_custkey"),
    ]
    names, rows, orows, okeys = [], [], [], []
    for name, child, ck, parent, pk in rels:
        part = orphan_audit_ds(child, ck, parent, pk).to_pandas()
        names.append(name)
        rows.append(int(part["n_rows"].sum()))
        orows.append(int(part["orphan_rows"].sum()))
        okeys.append(int(part["orphan_keys"].sum()))
    return pa.table({
        "relation": pa.array(names, pa.string()),
        "n_rows": pa.array(rows, pa.int64()),
        "orphan_rows": pa.array(orows, pa.int64()),
        "orphan_keys": pa.array(okeys, pa.int64())})


def q_group_regression(sf_dir: str):
    return F_events.group_regression_ds(
        _read(sf_dir, "events", ["event_type", "props", "value"]))


def q_part_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size)
    over parts that survive two predicates, minus a supplier
    blacklist.  Composition of standalone operators: per-batch
    distinct combiner + one pair-keyed distinct exchange (distinct
    (part, supp) pairs move, never lineitem rows), predicates pushed
    into the part scan, one hash-partition equi-join, a BROADCAST
    anti-filter (the blacklist is predicate-bounded and collected
    once, `ray.put` + searchsorted per batch — no shuffle), then a
    key-cardinality distinct + count."""
    import pyarrow.dataset as pads
    import ray
    from ray.data.aggregate import Count

    from kgforge.functions.joins import shuffle_join_ds

    from kgforge.functions.graph import _lr_indices
    from kgforge.functions.joins import cogroup_partition_ds

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pre_distinct(b: pa.Table) -> pa.Table:
        return b.group_by(["l_partkey", "l_suppkey"],
                          use_threads=False).aggregate([])

    pairs = li.map_batches(pre_distinct, batch_format="pyarrow")

    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"],
                 row_filter=((pads.field("p_brand") != "Brand#13") &
                             (pads.field("p_type") != "PROMO")))

    black = np.sort(_read(sf_dir, "supplier", ["s_suppkey"],
                          row_filter=pads.field("s_acctbal") < 1000.0)
                    .to_pandas()["s_suppkey"].to_numpy(dtype=np.int64))
    ref = ray.put(black)

    empty = pa.table({"p_brand": pa.array([], pa.string()),
                      "p_type": pa.array([], pa.string()),
                      "p_size": pa.array([], pa.int64()),
                      "l_suppkey": pa.array([], pa.int64())})

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        # the partkey exchange already co-locates every (part, supp)
        # pair, so the global pair-distinct that used to be its OWN
        # all-to-all completes here, fused with the join and the
        # broadcast blacklist anti-filter
        keep_run = (nl > 0) & (nr > 0)
        if not keep_run.any():
            return empty
        lidx, _ = _lr_indices(starts, nl, nr)
        run_of_left = np.repeat(np.arange(len(starts)), nl)
        supp = t["l_suppkey"].take(pa.array(lidx)).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        kmask = keep_run[run_of_left]
        code = run_of_left[kmask].astype(np.int64) * (1 << 32) \
            + supp[kmask]
        uniq = np.unique(code)
        runs, supps = uniq >> 32, uniq & ((1 << 32) - 1)
        bl = ray.get(ref)
        if len(bl):
            j = np.searchsorted(bl, supps)
            hit = (j < len(bl)) & (bl[np.minimum(j, len(bl) - 1)]
                                   == supps)
            runs, supps = runs[~hit], supps[~hit]
        ridx = pa.array((starts + nl)[runs])
        return pa.table({
            "p_brand": t["p_brand"].take(ridx),
            "p_type": t["p_type"].take(ridx),
            "p_size": t["p_size"].take(ridx).combine_chunks()
            .cast(pa.int64()),
            "l_suppkey": pa.array(supps.astype(np.int64))})

    joined = cogroup_partition_ds(
        pairs, part, "l_partkey", "p_partkey", fuse,
        ["l_suppkey"], ["p_brand", "p_type", "p_size"],
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_suppkey", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_brand", pa.string()),
                                ("p_type", pa.string()),
                                ("p_size", pa.int32())]))

    def pre_distinct2(b: pa.Table) -> pa.Table:
        return b.group_by(["p_brand", "p_type", "p_size",
                           "l_suppkey"], use_threads=False) \
            .aggregate([])

    dist = joined.map_batches(pre_distinct2, batch_format="pyarrow") \
        .groupby(["p_brand", "p_type", "p_size", "l_suppkey"]) \
        .aggregate(Count(alias_name="__c")) \
        .map_batches(lambda b: b.select(["p_brand", "p_type", "p_size"]),
                     batch_format="pyarrow")
    out = dist.groupby(["p_brand", "p_type", "p_size"]) \
        .aggregate(Count(alias_name="supplier_cnt"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": b["p_brand"], "p_type": b["p_type"],
            "p_size": pc.cast(b["p_size"], pa.int64()),
            "supplier_cnt": pc.cast(b["supplier_cnt"], pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


def q_rank_transform(sf_dir: str):
    return F_events.rank_transform_ds(
        _read(sf_dir, "events", ["event_id", "value"]))


def q_quality_score(sf_dir: str):
    return F_text.quality_score_ds(_read(sf_dir, "documents",
                                         ["doc_id", "text"]))


def q_gopher_rules(sf_dir: str):
    """Gopher-style quality-filter census per source: integer-exact
    rule fail counts + all-rules pass count."""
    return F_text.gopher_rules_ds(
        _read(sf_dir, "documents", ["doc_id", "source", "text"]))


def q_c4_rules(sf_dir: str):
    """C4-style quality-filter census per source (Raffel et al. 2020
    heuristics, doc-level form): integer/substring-exact rule fail
    counts + all-rules pass count — the sibling of ``gopher_rules``."""
    return F_text.c4_rules_ds(
        _read(sf_dir, "documents", ["doc_id", "source", "text"]))


def q_char_bigram_stats(sf_dir: str):
    """Byte-bigram collision moments per source (Rényi-2 entropy
    building blocks) — see
    :func:`kgforge.functions.textstats.char_bigram_stats_ds`."""
    return F_text.char_bigram_stats_ds(
        _read(sf_dir, "documents", ["source", "text"]))


def q_source_similarity(sf_dir: str):
    """Pairwise corpus-similarity moments between sources: exact
    integer TF-vector dot products + squared norms (cosine left to
    the consumer — no float sqrt in the hash path)."""
    from kgforge.functions.indexing import source_similarity_ds

    return source_similarity_ds(
        _read(sf_dir, "documents", ["source", "text"]))


def q_lang_id(sf_dir: str):
    return F_text.lang_id_ds(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_fingerprint(sf_dir: str):
    ds = F_text.fingerprint_ds(_read(sf_dir, "documents", ["doc_id", "text"]))
    return ds.select_columns(["doc_id", "fp_md5"])


def q_redact(sf_dir: str):
    return F_text.redact_ds(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_repetition_ratio(sf_dir: str):
    return F_text.repetition_ratio_ds(_read(sf_dir, "documents",
                                            ["doc_id", "text"]))


def q_decontaminate(sf_dir: str):
    return F_text.decontaminate_ds(_read(sf_dir, "documents",
                                         ["doc_id", "text"]))


def q_doc_frequency(sf_dir: str):
    return F_text.doc_frequency_ds(_read(sf_dir, "documents",
                                         ["doc_id", "text"]))


def q_percentile_filter(sf_dir: str):
    return F_text.percentile_filter_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]), q=0.9) \
        .select_columns(["doc_id", "n_tokens"])


def q_data_prep(sf_dir: str):
    """The composed LLM training-data prep pipeline — exact dedup
    (keep min id per content hash, digest-only first shuffle) →
    cogroup semi-join of survivors → exact-median length filter →
    context-window chunking (32/24) → leakage-safe hash split — each
    stage one of the engine's standalone operators, value-checked
    end-to-end against one composed SQL twin."""
    from kgforge.functions.dedup import exact_dedup_ds
    from kgforge.functions.indexing import chunk_docs_ds
    from kgforge.functions.joins import shuffle_join_ds

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    keepers = exact_dedup_ds(docs).select_columns(["keep_id"])
    # materialize the seam: percentile_filter consumes `kept` once for
    # its exact-median threshold and the chunker consumes it again —
    # unmaterialized, Ray re-executes the dedup+join lineage per
    # consumption (measured 29.8s lazy vs 7.5s with the seam pinned)
    kept = shuffle_join_ds(docs, keepers, "doc_id", "keep_id",
                           ["text"], [], how="inner").materialize()
    filtered = F_text.percentile_filter_ds(kept, q=0.5)
    chunks = chunk_docs_ds(filtered.select_columns(["doc_id", "text"]),
                           chunk=32, stride=24)

    def add_split(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from kgforge.common.hashing import md5_u64_arr

        buckets = md5_u64_arr(pc.cast(b["doc_id"], pa.string()),
                              nhex=8) % np.uint64(100)
        split = np.where(buckets < 80, "train", "test")
        return b.append_column("split", pa.array(split, pa.string()))

    return chunks.map_batches(add_split, batch_format="pyarrow")


def q_chunk_docs(sf_dir: str):
    from kgforge.functions.indexing import chunk_docs_ds

    return chunk_docs_ds(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_inverted_index(sf_dir: str):
    from kgforge.functions.indexing import inverted_index_ds

    return inverted_index_ds(_read(sf_dir, "documents",
                                   ["doc_id", "text"]))


def q_tfidf_topk(sf_dir: str):
    from kgforge.functions.indexing import tfidf_topk_ds

    return tfidf_topk_ds(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_bigram_topk(sf_dir: str):
    from kgforge.functions.indexing import bigram_topk_ds

    return bigram_topk_ds(_read(sf_dir, "documents", ["doc_id", "text"]))


# ---------------------------------------------------------------------------
# Deduplication family
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    return F_dedup.exact_dedup_ds(_read(sf_dir, "documents",
                                        ["doc_id", "text"]))


def q_dup_ngrams(sf_dir: str):
    return F_dedup.dup_ngram_stats_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]), n=8)


def q_source_contamination(sf_dir: str):
    return F_dedup.cross_source_contamination_ds(
        _read(sf_dir, "documents", ["source", "text"]), n=8)


def q_setsim_join(sf_dir: str):
    return F_dedup.setsim_join_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        n=8, tau_ppm=300_000)


def q_dedup_normalized(sf_dir: str):
    return F_dedup.normalized_dedup_ds(_read(sf_dir, "documents",
                                             ["doc_id", "text"]))


def q_jaccard_pairs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def add_bucket(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False)
        return b.append_column(
            "len_bucket", pa.array((lens % 16).astype(np.int64)))

    return F_dedup.jaccard_blocked_pairs_ds(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        block_cols=("source", "len_bucket"), theta=0.2)


def q_containment_pairs(sf_dir: str):
    """Broder containment near-dup pairs within ``source`` blocks —
    :func:`kgforge.functions.dedup.containment_blocked_pairs_ds`
    (asymmetric subset-duplication: quote/boilerplate absorption the
    symmetric Jaccard criterion misses)."""
    return F_dedup.containment_blocked_pairs_ds(
        _read(sf_dir, "documents", ["doc_id", "source", "text"]),
        block_cols=("source",), theta=0.3)


def q_minhash_pairs(sf_dir: str):
    # single-file read = one block = one actor; spread the signer
    return F_dedup.minhash_dedup_pairs_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]).repartition(32),
        theta=0.5)


def q_simhash_pairs(sf_dir: str):
    return F_dedup.simhash_pairs_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]).repartition(32),
        max_hamming=3)


def q_embedding_dup_pairs(sf_dir: str):
    return F_dedup.embedding_dup_pairs_ds(
        _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"]),
        tau=0.3)


def q_embedding_lsh_pairs(sf_dir: str):
    return F_dedup.embedding_lsh_pairs_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .repartition(16), tau=0.3)


def q_substring_dup_pairs(sf_dir: str):
    """Lee-et-al exact substring dedup: docs sharing ≥ 1 exact 25-char
    window, scored by distinct shared windows (boilerplate df-capped,
    mirrored in the twin)."""
    return F_dedup.substring_dup_pairs_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]).repartition(16))


def q_dup_span_fraction(sf_dir: str):
    """Per-doc duplicated-span census: fraction of a doc's distinct
    25-char windows that appear in ≥ 2 docs."""
    return F_dedup.dup_span_fraction_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]).repartition(16))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

KNN_QUERY_IDS = list(range(8))
KNN_K = 5


def q_knn_brute(sf_dir: str):
    return F_sim.knn_brute_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .repartition(16), KNN_QUERY_IDS, k=KNN_K)


_IVF_INDEX_CACHE: dict = {}


def q_knn_ivf(sf_dir: str):
    """IVF over a PERSISTED inverted file: partitions are built once
    per sf_dir (one Parquet dir per centroid), then each query run
    reads only the probed partitions.  The driver variant uses the
    deterministic fixed-id codebook (vectors of vec_id < 16), which a
    DuckDB oracle reproduces value-exactly — kmeans codebooks are a
    drop-in (`ivf_build(..., codebook_ids=None)`)."""
    root = _IVF_INDEX_CACHE.get(sf_dir)
    if root is None:
        root = tempfile.mkdtemp(prefix="kgforge_ivf_")
        F_sim.ivf_build(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"])
            .repartition(16), root, codebook_ids=range(16))
        _IVF_INDEX_CACHE[sf_dir] = root
    return F_sim.knn_ivf_indexed_ds(root, KNN_QUERY_IDS, k=KNN_K,
                                    nprobe=4)


# ---------------------------------------------------------------------------
# Event-stream operators
# ---------------------------------------------------------------------------

def q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means (rows-only: iterative model fitting
    is not SQL-expressible; determinism + paths-agree covered by
    tests/test_graph_indexing.py and test_clustering)."""
    from kgforge.functions.clustering import kmeans_ds

    return kmeans_ds(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                     k=8, iters=5)


def q_quantize_embeddings(sf_dir: str):
    from kgforge.functions.clustering import quantize_embeddings_ds

    return quantize_embeddings_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]))


def q_funnel_counts(sf_dir: str):
    return F_events.funnel_counts_ds(
        _read(sf_dir, "events", ["user_id", "event_type", "ts"]))


def q_dim_truncate_recall(sf_dir: str):
    """Matryoshka truncation evaluation: recall@10 of first-16-dim
    cosine top-k against full 64-dim exact top-k, per query."""
    return F_sim.dim_truncate_recall_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .repartition(16), KNN_QUERY_IDS, d_trunc=16, k=10)


def q_lsh_recall(sf_dir: str):
    """ANN-quality metric: recall of the LSH pair generator vs exact
    all-pairs ground truth at the same threshold."""
    return F_dedup.lsh_recall_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .repartition(16), tau=0.3)


def q_events_hourly(sf_dir: str):
    return F_events.hourly_agg_ds(_read(sf_dir, "events"))


def q_sessionize(sf_dir: str):
    return F_events.sessionize_ds(_read(sf_dir, "events",
                                        ["user_id", "ts"]))


def q_heavy_hitters(sf_dir: str):
    """Misra–Gries top tokens.  On the fixture corpus the distinct
    vocabulary fits the sketch capacity, so the summary is EXACT
    (err=0) and the SQL twin checks it value-exactly; the lossy
    regime's est ≤ true ≤ est+err bound is pytest-measured."""
    from kgforge.functions.sketches import heavy_hitters_ds

    return heavy_hitters_ds(_read(sf_dir, "documents", ["text"]),
                            capacity=4096, top=10)


def q_quantile_sketch(sf_dir: str):
    from kgforge.functions.sketches import quantile_sketch_ds

    return quantile_sketch_ds(_read(sf_dir, "events", ["value"]), k=256)


def q_weighted_sample(sf_dir: str):
    from kgforge.functions.sampling import weighted_sample_ds

    return weighted_sample_ds(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]), k=50)


def q_latest_event(sf_dir: str):
    return F_events.latest_event_ds(_read(
        sf_dir, "events",
        ["event_id", "ts", "user_id", "event_type", "value"]))


def q_budget_select(sf_dir: str):
    return F_text.budget_select_ds(_read(sf_dir, "documents",
                                         ["doc_id", "text"]))


def q_event_sequences(sf_dir: str):
    return F_events.event_sequences_ds(_read(
        sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]))


def q_cohort_retention(sf_dir: str):
    return F_events.cohort_retention_ds(_read(sf_dir, "events",
                                              ["user_id", "ts"]))


def q_topk_per_group(sf_dir: str):
    return F_events.topk_per_group_ds(
        _read(sf_dir, "events", ["user_id", "event_id", "value"]))


def q_event_deltas(sf_dir: str):
    return F_events.event_deltas_ds(
        _read(sf_dir, "events", ["user_id", "event_id", "ts"]))


def q_group_quantiles(sf_dir: str):
    return F_events.group_quantiles_ds(
        _read(sf_dir, "events", ["event_type", "value"]))


def q_cumulative_sum(sf_dir: str):
    return F_events.cumulative_sum_ds(
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"]))


def q_rolling_sum(sf_dir: str):
    return F_events.rolling_sum_ds(
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"]))


def q_pivot_hourly(sf_dir: str):
    return F_events.pivot_hourly_ds(
        _read(sf_dir, "events", ["event_type", "ts"]))


def q_tier_lookup(sf_dir: str):
    return F_events.tier_lookup_ds(
        _read(sf_dir, "events", ["event_id", "value"]))


def q_stratified_sample(sf_dir: str):
    from kgforge.functions.sampling import stratified_sample_ds

    return stratified_sample_ds(
        _read(sf_dir, "events", ["event_type", "event_id"]))


MIXTURE_WEIGHTS = {"src0": 4.0, "src1": 3.0, "src2": 2.0, "src3": 1.0}
MIXTURE_K = 60


def q_mixture_sample(sf_dir: str):
    from kgforge.functions.sampling import mixture_sample_ds

    return mixture_sample_ds(
        _read(sf_dir, "documents", ["doc_id", "source"]),
        weights=MIXTURE_WEIGHTS, k=MIXTURE_K)


def q_hourly_distinct_users(sf_dir: str):
    return F_events.hourly_distinct_users_ds(
        _read(sf_dir, "events", ["event_type", "ts", "user_id"]))


def q_rollup_hourly(sf_dir: str):
    return F_events.rollup_hourly_ds(
        _read(sf_dir, "events", ["event_type", "ts", "value"]))


def q_orders_customer_join(sf_dir: str):
    """Large-large shuffle equi-join (cogroup; neither side broadcast):
    every order row joined to its customer row."""
    from kgforge.functions.joins import shuffle_join_ds

    return shuffle_join_ds(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]),
        on_left="o_custkey", on_right="c_custkey",
        left_cols=["o_orderkey"], right_cols=["c_name", "c_mktsegment"])


def q_user_customer_full_join(sf_dir: str):
    """Full-outer shuffle join with misses on BOTH sides: per-user
    event counts (users 0–149) against a customer-key slice
    (145–160: keys 145–149 match, 150–160 are right-only, users
    0–144 are left-only).
    Nulls are coalesced to sentinels so the output is typed-stable
    through every engine's null round-trip."""
    from ray.data.aggregate import Count

    from kgforge.functions.joins import shuffle_join_ds

    import pyarrow.dataset as pds

    users = _read(sf_dir, "events", ["user_id"]) \
        .groupby("user_id").aggregate(Count(alias_name="n_events"))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"],
                 row_filter=(pds.field("c_custkey") >= 145)
                 & (pds.field("c_custkey") <= 160))

    joined = shuffle_join_ds(
        users, cust,
        on_left="user_id", on_right="c_custkey",
        left_cols=["n_events"], right_cols=["c_name"], how="full")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "n_events": pc.fill_null(b["n_events"], 0),
            "c_name": pc.fill_null(b["c_name"], ""),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def q_priority_revenue(sf_dir: str):
    """Join+aggregate over the vectorized cogroup join: lineitem
    revenue is pre-summed per order INSIDE each batch (combiner —
    ~one row per order reaches the join, never the raw stream), the
    partials join orders on the hash-partitioned merge, then per-order
    partials collapse before the 5-row priority rollup.  Revenue is
    per-row integer cents, exact."""
    from ray.data.aggregate import Count, Sum

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def rev_partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * (1.0 - disc) * 100, 0).astype(np.int64)
        t = pa.table({"k": b["l_orderkey"], "c": pa.array(cents)})
        g = t.group_by(["k"], use_threads=False).aggregate([("c", "sum")])
        return pa.table({"l_orderkey": g["k"], "rev_cents": g["c_sum"]})

    rev = lineitem.map_batches(rev_partial, batch_format="pyarrow")

    def per_partition(t: pa.Table, starts, nl, nr) -> pa.Table:
        # segment-sum the left partials per key; right row carries the
        # priority; inner semantics: a key needs both sides
        cents = pc.fill_null(t["rev_cents"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (nl > 0) & (nr > 0)
        if not keep.any():
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "rev": pa.array([], pa.int64())})
        sums = np.add.reduceat(cents, starts)[keep]
        pr_idx = (starts + nl)[keep]  # first right row of each key
        return pa.table({
            "o_orderpriority": t["o_orderpriority"].take(pa.array(pr_idx)),
            "rev": pa.array(sums, pa.int64()),
        })

    per_order = cogroup_partition_ds(
        rev, orders, "l_orderkey", "o_orderkey", per_partition,
        ["rev_cents"], ["o_orderpriority"])
    return per_order.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders"),
        Sum("rev", alias_name="revenue_cents"))


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — the canonical 3-table large-large join:
    BUILDING customers ⨝ pre-cutoff orders ⨝ post-cutoff lineitem,
    top-10 orders by revenue.  Scale plan: both joins are single
    hash-partition cogroups (no broadcast — the segment-filtered
    customer side is still ~1/5 of all customers at 100 TB); lineitem
    revenue is combined to ~one row per order inside each batch before
    its shuffle; the final top-10 sees at most 10 rows per block."""
    import datetime as _dt

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    import pyarrow.dataset as pds

    cut = _dt.datetime(1998, 7, 1)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"],
                 row_filter=pds.field("c_mktsegment") == "BUILDING")

    def building(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": b["c_custkey"],
                         "__one": pa.array(
                             np.ones(b.num_rows, dtype=np.int8))})

    cust_b = cust.map_batches(building, batch_format="pyarrow")

    orders_f = _read(sf_dir, "orders",
                     ["o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"],
                     row_filter=pds.field("o_orderdate") < cut)

    def semi(t: pa.Table, starts, nl, nr) -> pa.Table:
        # keep left (order) rows of keys that have ≥1 right (customer)
        # row — vectorized row mask over the sorted run layout
        total = nl + nr
        row_key = np.repeat(np.arange(len(nl)), total)
        pos = np.arange(len(row_key))
        in_left = pos < (starts + nl)[row_key]
        mask = ((nl > 0) & (nr > 0))[row_key] & in_left
        idx = pa.array(np.flatnonzero(mask))
        return pa.table({"o_orderkey": t["o_orderkey"].take(idx),
                         "o_orderdate": t["o_orderdate"].take(idx),
                         "o_orderpriority": t["o_orderpriority"].take(idx)})

    # schema hints: cogroup's Dataset.schema() probe on a LAZY input
    # executes (part of) its plan; these inputs' schemas are static
    orders_b = cogroup_partition_ds(
        orders_f, cust_b, "o_custkey", "c_custkey", semi,
        ["o_orderkey", "o_orderdate", "o_orderpriority"], ["__one"],
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64()),
                               ("o_orderdate", pa.timestamp("us")),
                               ("o_orderpriority", pa.string())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("__one", pa.int8())]))

    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_extendedprice", "l_discount",
                      "l_shipdate"],
                     row_filter=pds.field("l_shipdate") > cut)

    def rev_partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * (1.0 - disc) * 100, 0).astype(np.int64)
        t = pa.table({"k": b["l_orderkey"], "c": pa.array(cents)})
        g = t.group_by(["k"], use_threads=False).aggregate([("c", "sum")])
        return pa.table({"l_orderkey": g["k"], "rev_cents": g["c_sum"]})

    rev = lineitem.map_batches(rev_partial, batch_format="pyarrow")

    def fin(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep = (nl > 0) & (nr > 0)
        if not keep.any():
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "revenue_cents": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string())})
        cents = pc.fill_null(t["rev_cents"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.add.reduceat(cents, starts)[keep]
        ridx = pa.array((starts + nl)[keep])
        return pa.table({
            "o_orderkey": t["__k"].take(ridx),
            "revenue_cents": pa.array(sums, pa.int64()),
            "o_orderdate": t["o_orderdate"].take(ridx),
            "o_orderpriority": t["o_orderpriority"].take(ridx)})

    joined = cogroup_partition_ds(
        rev, orders_b, "l_orderkey", "o_orderkey", fin,
        ["rev_cents"], ["o_orderdate", "o_orderpriority"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("rev_cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderpriority", pa.string())]))

    def partial_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= 10:
            return b
        neg = pc.negate(b["revenue_cents"]).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        keys = b["o_orderkey"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, neg))
        return b.take(pa.array(order[:10]))

    return joined.map_batches(partial_topk, batch_format="pyarrow") \
        .sort(["revenue_cents", "o_orderkey"],
              descending=[True, False]).limit(10)


def q_regional_revenue(sf_dir: str):
    """TPC-H Q5 shape — the 6-table join with the correlated
    ``s_nationkey = c_nationkey`` condition: revenue per ASIA nation
    from local suppliers in one order-date year.  Scale plan:
    nation/region (≤ 25 rows) ride a driver LUT; customer, orders and
    supplier joins are hash-partition cogroups (customer and supplier
    are SF-proportional — no broadcast); lineitem is combined to
    (orderkey, suppkey) partials inside each batch before its shuffle,
    and each later cogroup re-combines so at most
    (suppliers × nations) rows reach the final groupby."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq
    import datetime as _dt

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    asia_key = {k for k, r in zip(region["r_regionkey"].to_pylist(),
                                  region["r_name"].to_pylist())
                if r == "ASIA"}
    asia_nations = [k for k, r in zip(nation["n_nationkey"].to_pylist(),
                                      nation["n_regionkey"].to_pylist())
                    if r in asia_key]
    n_name = dict(zip(nation["n_nationkey"].to_pylist(),
                      nation["n_name"].to_pylist()))

    lo, hi = _dt.datetime(1997, 1, 1), _dt.datetime(1998, 1, 1)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"],
                 row_filter=pds.field("c_nationkey").isin(asia_nations))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"],
                   row_filter=(pds.field("o_orderdate") >= lo)
                   & (pds.field("o_orderdate") < hi))

    def order_nat(t, starts, nl, nr):
        return _attach_right(t, starts, nl, nr, ["o_orderkey"],
                             ("c_nationkey", "c_nat"), ["o_orderkey"])

    orders_nat = cogroup_partition_ds(
        orders, cust, "o_custkey", "c_custkey", order_nat,
        ["o_orderkey"], ["c_nationkey"],
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_nationkey", pa.int32())]))

    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * (1.0 - disc) * 100, 0).astype(np.int64)
        t = pa.table({"k": b["l_orderkey"], "s": b["l_suppkey"],
                      "c": pa.array(cents)})
        g = t.group_by(["k", "s"], use_threads=False) \
            .aggregate([("c", "sum")])
        return pa.table({"l_orderkey": g["k"], "l_suppkey": g["s"],
                         "cents": g["c_sum"]})

    li = lineitem.map_batches(li_partial, batch_format="pyarrow")

    def li_nat(t, starts, nl, nr):
        out = _attach_right(t, starts, nl, nr, ["l_suppkey", "cents"],
                            ("c_nat", "c_nat"), ["l_suppkey", "cents"])
        g = out.group_by(["l_suppkey", "c_nat"], use_threads=False) \
            .aggregate([("cents", "sum")])
        return pa.table({"l_suppkey": g["l_suppkey"], "c_nat": g["c_nat"],
                         "cents": g["cents_sum"]})

    li_n = cogroup_partition_ds(
        li, orders_nat, "l_orderkey", "o_orderkey", li_nat,
        ["l_suppkey", "cents"], ["c_nat"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("c_nat", pa.int32())]))

    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def local_only(t, starts, nl, nr):
        out = _attach_right(t, starts, nl, nr, ["c_nat", "cents"],
                            ("s_nationkey", "s_nat"), ["c_nat", "cents"])
        out = out.filter(pc.equal(out["c_nat"],
                                  pc.cast(out["s_nat"], pa.int32())))
        g = out.group_by(["c_nat"], use_threads=False) \
            .aggregate([("cents", "sum")])
        return pa.table({"c_nat": g["c_nat"], "cents": g["cents_sum"]})

    per_nat = cogroup_partition_ds(
        li_n, supplier, "l_suppkey", "s_suppkey", local_only,
        ["c_nat", "cents"], ["s_nationkey"],
        left_schema=pa.schema([("l_suppkey", pa.int64()),
                               ("c_nat", pa.int32()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("s_nationkey", pa.int32())]))

    # ≤ one row per (partition, nation) reaches the driver
    acc: dict[int, int] = {}
    for row in per_nat.take_all():
        acc[int(row["c_nat"])] = acc.get(int(row["c_nat"]), 0) \
            + int(row["cents"])
    order = sorted(acc, key=lambda k: (-acc[k], n_name[k]))
    return pa.table({
        "n_name": pa.array([n_name[k] for k in order], pa.string()),
        "revenue_cents": pa.array([acc[k] for k in order], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Relational coverage (groupby / join / sort / union / distinct)
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style: per-batch pandas partial aggregation (combiner)
    → small groupby Sum — the shuffle carries (flags × batches) rows,
    not the lineitem table."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    from kgforge.common.hashing import round_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-ROW rounding to integer cents, then int64 sums: exact and
        # order-independent — float sums round-trip differently between
        # engines at rounding boundaries (summation order)
        df = df.assign(
            qty=df.l_quantity.astype("int64"),
            base_cents=round_away(df.l_extendedprice * 100, 0)
            .astype("int64"),
            disc_cents=round_away(
                df.l_extendedprice * (1 - df.l_discount) * 100, 0)
            .astype("int64"))
        return df.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_cents=("base_cents", "sum"),
            sum_disc_cents=("disc_cents", "sum"),
            count_order=("qty", "size"))

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("count_order", alias_name="count_order"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": pc.cast(b["sum_qty"], pa.int64()),
            "sum_base_cents": pc.cast(b["sum_base_cents"], pa.int64()),
            "sum_disc_cents": pc.cast(b["sum_disc_cents"], pa.int64()),
            "count_order": pc.cast(b["count_order"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_top_customers(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from kgforge.common.hashing import round_away

    def to_cents(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100, 0)
        return pa.table({"o_custkey": b["o_custkey"],
                         "cents": pa.array(cents.astype(np.int64))})

    agg = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(to_cents, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(
            Sum("cents", alias_name="total_cents"),
            Count(alias_name="n_orders"))
    top = agg.sort(["total_cents", "o_custkey"],
                   descending=[True, False]).limit(10)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "total_cents": pc.cast(b["total_cents"], pa.int64()),
            "n_orders": pc.cast(b["n_orders"], pa.int64()),
        })

    return top.map_batches(finish, batch_format="pyarrow")


def q_customer_nation_region(sf_dir: str):
    """Broadcast-hash-join (small side ray.put once) + partial-count
    groupby — the L2 join pattern over driver tables."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rmap = dict(zip(region["r_regionkey"].to_pylist(),
                    region["r_name"].to_pylist()))
    # dense LUT arrays indexed by nationkey → vectorized pc.take join
    nk = nation["n_nationkey"].to_pylist()
    size = max(nk) + 1
    n_names = [""] * size
    r_names = [""] * size
    for k, nn, nr in zip(nk, nation["n_name"].to_pylist(),
                         nation["n_regionkey"].to_pylist()):
        n_names[k] = nn
        r_names[k] = rmap[nr]
    lut_ref = ray.put({"n": pa.array(n_names, pa.string()),
                       "r": pa.array(r_names, pa.string())})

    class JoinCount:
        def __init__(self):
            self.lut = ray.get(lut_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["c_nationkey"]
            joined = pa.table({
                "r_name": pc.take(self.lut["r"], keys),
                "n_name": pc.take(self.lut["n"], keys),
            })
            g = joined.group_by(["r_name", "n_name"], use_threads=False) \
                .aggregate([([], "count_all")])
            return pa.table({
                "r_name": g["r_name"], "n_name": g["n_name"],
                "n_customers": g["count_all"].cast(pa.int64()),
            })

    return _read(sf_dir, "customer", ["c_nationkey"]) \
        .map_batches(JoinCount, batch_format="pyarrow",
                     concurrency=(1, 4)) \
        .groupby(["r_name", "n_name"]).aggregate(
            Sum("n_customers", alias_name="n_customers"))


def q_filter_project(sf_dir: str):
    import pyarrow.dataset as pds

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount"],
               row_filter=pds.field("l_quantity") > 30)

    def fp(b: pa.Table) -> pa.Table:
        revenue = _r2(pc.multiply(
            b["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), b["l_discount"])))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_linenumber": b["l_linenumber"],
                         "revenue": revenue})

    return ds.map_batches(fp, batch_format="pyarrow")


def q_union_nations(sf_dir: str):
    from ray.data.aggregate import Count

    cust = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda b: pa.table({"nationkey": b["c_nationkey"]}),
        batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda b: pa.table({"nationkey": b["s_nationkey"]}),
        batch_format="pyarrow")
    return cust.union(supp).groupby("nationkey").aggregate(
        Count(alias_name="n"))


def q_distinct_users(sf_dir: str):
    """count(DISTINCT) as a two-phase groupby (SURVEY §2.5 G5)."""
    from ray.data.aggregate import Count

    pairs = _read(sf_dir, "events", ["event_type", "user_id"]) \
        .groupby(["event_type", "user_id"]).aggregate(Count(alias_name="c"))
    return pairs.groupby("event_type").aggregate(
        Count(alias_name="n_users")) \
        .map_batches(lambda b: pa.table({
            "event_type": b["event_type"],
            "n_users": pc.cast(b["n_users"], pa.int64())}),
            batch_format="pyarrow")


def q_part_minmax(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min

    agg = _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"]) \
        .groupby("p_brand").aggregate(
            Min("p_size", alias_name="min_size"),
            Max("p_size", alias_name="max_size"),
            Max("p_retailprice", alias_name="max_price"),
            Count(alias_name="n_parts"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": b["p_brand"],
            "min_size": pc.cast(b["min_size"], pa.int64()),
            "max_size": pc.cast(b["max_size"], pa.int64()),
            "max_price": _r2(b["max_price"]),
            "n_parts": pc.cast(b["n_parts"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_vocab_topk(sf_dir: str):
    """Token-frequency top-k: vectorized per-batch combiner → groupby
    Sum → global sort + limit (O1/O3 vocab pattern over driver text)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        # vectorized combiner: split→flatten→value_counts, all arrow
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    counts = _read(sf_dir, "documents", ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n"))
    return counts.sort(["n", "token"], descending=[True, False]).limit(20)


def _orderkey_value_set_ref(sf_dir: str):
    """Distinct ``l_orderkey`` values as ONE broadcast Arrow array.

    Distributed distinct: per-batch ``pc.unique`` combiners shrink each
    block to its distinct keys before anything leaves the map stage;
    the driver unions the already-small partials once and broadcasts
    the result via ``ray.put``.  Broadcast semi/anti-join is the right plan while the
    DISTINCT key set (≈ |orders|, far smaller than |lineitem|) fits in
    worker memory; past that threshold the scale path is to
    hash-partition both sides on the key (``kgforge.stages.exchange``)
    and semi-join per bucket — no full-table driver set, ever."""
    import ray

    partials = _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        lambda b: pa.table({"k": pc.unique(b["l_orderkey"])}),
        batch_format="pyarrow")
    tables = ray.get(partials.to_arrow_refs())
    vs = pc.unique(pa.concat_tables(tables)["k"].combine_chunks())
    return ray.put(vs)


def q_semi_join(sf_dir: str):
    """Orders that HAVE lineitems: broadcast semi-join via vectorized
    ``pc.is_in`` against the distinct-key value set (C-speed hash
    probe, no per-row Python membership)."""
    import ray

    ref = _orderkey_value_set_ref(sf_dir)

    def keep(b: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        return b.filter(pc.is_in(b["o_orderkey"], value_set=vs))

    return _read(sf_dir, "orders", ["o_orderkey"]) \
        .map_batches(keep, batch_format="pyarrow")


def q_bloom_semi_join(sf_dir: str):
    """Customers that have events, through the bloom-pre-filter semi
    lane (fixed-size bitmap broadcast + survivor-only exact verify) —
    the documented path when the right side's distinct keys outgrow a
    broadcast value set."""
    from kgforge.functions.joins import bloom_semi_join_ds

    return bloom_semi_join_ds(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        _read(sf_dir, "events", ["user_id"]),
        "c_custkey", "user_id", ["c_name"])


def q_anti_join(sf_dir: str):
    """Orders WITHOUT lineitems (broadcast anti-join, ``pc.is_in``
    inverted)."""
    import ray

    ref = _orderkey_value_set_ref(sf_dir)

    def drop(b: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        return b.filter(pc.invert(pc.is_in(b["o_orderkey"], value_set=vs)))

    return _read(sf_dir, "orders", ["o_orderkey"]) \
        .map_batches(drop, batch_format="pyarrow")


def q_shuffle_sample(sf_dir: str):
    """Seeded epoch shuffle + take (full mode here; the zero-network
    blocks+local scale variant is
    :func:`kgforge.functions.sampling.epoch_shuffle_ds`)."""
    from kgforge.functions.sampling import epoch_shuffle_ds

    ds = _read(sf_dir, "documents", ["doc_id"])
    return epoch_shuffle_ds(ds, seed=42, mode="full").limit(100)


def q_events_props(sf_dir: str):
    """Scalar extraction from the JSON-ish props column (regex both
    sides — no JSON engine dependency): event_id, k_value."""
    def extract(b: pa.Table) -> pa.Table:
        ks = pc.extract_regex(b["props"], pattern=r'"k": (?P<k>\d+)')
        kvals = pc.struct_field(ks, [0])
        return pa.table({
            "event_id": b["event_id"],
            "k_value": pc.cast(kvals, pa.int64()),
        })

    return _read(sf_dir, "events", ["event_id", "props"]) \
        .map_batches(extract, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Flagship KG pipeline on interleaved docs (model-based → rows-only)
# ---------------------------------------------------------------------------

_FLAGSHIP_CACHE: dict = {}


def _prefix_derived_ids(b: pa.Table) -> pa.Table:
    """Disambiguate the derived documents-table lane from the
    generated interleaved corpus before the union: both used
    ``doc-%08d`` ids, and a (doc_id, span_idx, sent_idx) collision
    merges mentions of two DIFFERENT documents in any per-sentence
    grouping (found via the kg_prf gate: cross-doc co_occurs
    artifacts)."""
    i = b.column_names.index("doc_id")
    return b.set_column(i, "doc_id", pc.binary_join_element_wise(
        pa.scalar("drv-"), b["doc_id"], ""))


def _flagship_for(sf_dir: str) -> dict:
    """Run (once per process per sf_dir) the flagship KG pipeline on a
    deterministic interleaved-doc table sized to the sf tier, unioned
    with the T0 derivation of the driver's documents table (media
    passthrough + invariant lane exercise both input shapes)."""
    if sf_dir in _FLAGSHIP_CACHE:
        return _FLAGSHIP_CACHE[sf_dir]
    import pyarrow.parquet as pq

    from kgforge.oracle.corpus import generate_interleaved_docs
    from kgforge.oracle.pipeline import train_hmm
    from kgforge.pipelines.flagship import run_flagship
    from kgforge.sources.interleaved import read_interleaved, write_interleaved

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = generate_interleaved_docs(n_docs, seed=42)
    root0 = tempfile.mkdtemp(prefix="kgforge_t0_")
    # fragmented layout → many blocks → the tagger actor pool actually
    # fans out (a single from_arrow block would serialize the pipeline)
    write_interleaved(docs, root0, rows_per_fragment=max(64, n_docs // 32))
    t0 = read_interleaved(root0).union(
        derive_t0_ds(sf_dir).map_batches(_prefix_derived_ids,
                                         batch_format="pyarrow"))

    root = tempfile.mkdtemp(prefix="kgforge_driver_")
    model_path = f"{root}/hmm.npz"
    train_hmm(n_train=800, seed=42).save(model_path)
    res = run_flagship(t0_ds=t0, model_path=model_path,
                       ckpt_root=f"{root}/ckpt", out_dir=f"{root}/graph",
                       verify_i1=False)
    _FLAGSHIP_CACHE[sf_dir] = res
    return res


_BILSTM_CACHE: dict = {}


def q_kg_mentions_bilstm(sf_dir: str):
    """A2 lane: BiLSTM-CRF actor-pool tagger over the fixture corpus
    (sized to the sf tier) → T1 mention rows.  Model-based → rows-only
    driver check; exactness vs the oracle is covered by pytest."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from kgforge.oracle import bilstm_crf as bc
    from kgforge.oracle.corpus import generate_corpus
    from kgforge.oracle.vocab import build_vocab, count_chars
    from kgforge.stages.mentions import attach_mentions, explode_mentions
    from kgforge.stages.tagger import BiLstmCrfTagger

    if "model_path" not in _BILSTM_CACHE:
        train = generate_corpus(600, seed=42)
        model = bc.fit(train, build_vocab(count_chars(train)), epochs=10)
        path = tempfile.mktemp(suffix=".npz", prefix="kgforge_bilstm_")
        model.save(path)
        _BILSTM_CACHE["model_path"] = path
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    sents = generate_corpus(min(4 * n, 20000), seed=123)
    tbl = pa.table({
        "doc_id": pa.array([f"sent-{i:06d}" for i in range(len(sents))]),
        "span_idx": pa.array([0] * len(sents), pa.int32()),
        "sent_idx": pa.array([0] * len(sents), pa.int32()),
        "span_offset": pa.array([0] * len(sents), pa.int32()),
        "sent_offset": pa.array([0] * len(sents), pa.int32()),
        "sent_text": pa.array([s.text for s in sents], pa.string()),
        "pid": pa.array([i % 32 for i in range(len(sents))], pa.int32()),
    })
    ds = rd.from_arrow(tbl).repartition(16)
    return ds.map_batches(
        BiLstmCrfTagger,
        fn_constructor_kwargs={"model_path": _BILSTM_CACHE["model_path"]},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 8),
        num_cpus=1) \
        .map_batches(attach_mentions, batch_format="pyarrow") \
        .map_batches(explode_mentions, batch_format="pyarrow")


def q_kg_edges(sf_dir: str):
    return _flagship_for(sf_dir)["edges"]


def q_kg_nodes(sf_dir: str):
    return _flagship_for(sf_dir)["nodes"]


def q_kg_mentions(sf_dir: str):
    return _flagship_for(sf_dir)["mentions"]


def q_kg_triples(sf_dir: str):
    return _flagship_for(sf_dir)["triples"]


# ---------------------------------------------------------------------------
# Dictionary-tagger KG lane (SQL-verifiable end-to-end; SURVEY §2 A1/D1
# value gate — kgforge/pipelines/dict_oracle.py generates the twins)
# ---------------------------------------------------------------------------

_DICT_FLAGSHIP_CACHE: dict = {}


def _dict_flagship_for(sf_dir: str) -> dict:
    """Run (once per process per sf_dir) the REAL flagship pipeline —
    explode → sentence split → dictionary tagger (actor pool) →
    mentions → triples → range-exchange dedup — over the
    arithmetic-derived dict corpus, alias resolution off (identity
    canonicalization keeps the lane SQL-exact)."""
    if sf_dir in _DICT_FLAGSHIP_CACHE:
        return _DICT_FLAGSHIP_CACHE[sf_dir]
    from kgforge.pipelines.flagship import run_flagship
    from kgforge.sources.dictcorpus import derive_dict_t0_ds
    from kgforge.stages.dict_tagger import DictTagger

    root = tempfile.mkdtemp(prefix="kgforge_dict_")
    res = run_flagship(t0_ds=derive_dict_t0_ds(sf_dir), model_path="",
                       ckpt_root=f"{root}/ckpt", tagger_cls=DictTagger,
                       use_alias=False, out_dir=f"{root}/graph",
                       verify_i1=False)
    _DICT_FLAGSHIP_CACHE[sf_dir] = res
    return res


def q_kg_mentions_dict(sf_dir: str):
    return _dict_flagship_for(sf_dir)["mentions"].select_columns(
        ["doc_id", "span_idx", "sent_idx", "offset",
         "ment_start", "ment_end", "surface", "etype"])


def q_kg_triples_dict(sf_dir: str):
    return _dict_flagship_for(sf_dir)["triples"].select_columns(
        ["subj", "pred", "obj", "subj_type", "obj_type",
         "doc_id", "span_idx", "sent_idx", "support"])


def q_kg_edges_dict(sf_dir: str):
    return _dict_flagship_for(sf_dir)["edges"]


def q_kg_edges_incremental(sf_dir: str):
    """Incremental KG build: triples split by doc parity, each half
    dedup'd into its own edge table (two independent 'runs'), the two
    edge tables merged with the SAME range-exchange operator
    (``combine_triples_in_batch`` is edge-shape aware: support sums,
    first_doc mins — merge of partial builds ≡ one-shot batch build,
    checked against the identical SQL oracle as ``kg_edges_dict``).
    This is the production incremental path: a nightly delta corpus
    becomes a delta edge table, merged into the base in one exchange
    without re-reading the base corpus."""
    from kgforge.stages.triples import dedup_triples_ds

    trip = _dict_flagship_for(sf_dir)["triples"]

    def half(parity: int):
        def f(b: pa.Table) -> pa.Table:
            num = pc.cast(pc.utf8_slice_codeunits(b["doc_id"], 5, 50),
                          pa.int64())
            return b.filter(pc.equal(pc.bit_wise_and(num, 1), parity))
        return trip.map_batches(f, batch_format="pyarrow")

    e0 = dedup_triples_ds(half(0))
    e1 = dedup_triples_ds(half(1))
    return dedup_triples_ds(e0.union(e1))


def q_kg_nodes_dict(sf_dir: str):
    return _dict_flagship_for(sf_dir)["nodes"].select_columns(
        ["surface", "etype", "n_mentions", "n_docs"])


def q_mention_dedup(sf_dir: str):
    """D2 mention dedup across taggers, driver-value-checked: the
    dict-lane mentions are duplicated under two synthetic tagger rows
    with deterministic arithmetic scores, then
    :func:`kgforge.stages.mentions.dedup_mentions_ds` keeps the best
    row per span (score desc, tagger asc) through the range exchange —
    the same op the HMM∪BiLSTM union path uses."""
    import numpy as np

    from kgforge.stages.mentions import dedup_mentions_ds

    ments = _dict_flagship_for(sf_dir)["mentions"]

    def duplicate(b: pa.Table) -> pa.Table:
        d = pc.cast(pc.utf8_slice_codeunits(b["doc_id"], 5, 13),
                    pa.int64()).to_numpy(zero_copy_only=False)
        ms = b["ment_start"].to_numpy(zero_copy_only=False)
        me = b["ment_end"].to_numpy(zero_copy_only=False)
        ti = b.column_names.index("tagger")
        si = b.column_names.index("score")
        a = b.set_column(ti, "tagger",
                         pa.array(["hmm"] * b.num_rows)) \
             .set_column(si, "score",
                         pa.array((d * 7 + ms) % 100 / 100.0))
        c = b.set_column(ti, "tagger",
                         pa.array(["bilstm"] * b.num_rows)) \
             .set_column(si, "score",
                         pa.array((d * 11 + me) % 100 / 100.0))
        return pa.concat_tables([a, c])

    dup = ments.map_batches(duplicate, batch_format="pyarrow")
    return dedup_mentions_ds(dup).select_columns(
        ["doc_id", "sent_idx", "ment_start", "ment_end",
         "surface", "etype", "tagger", "score"])


# ---------------------------------------------------------------------------
# Graph analytics over the materialized KG edges (dict lane, SQL-exact)
# ---------------------------------------------------------------------------

def _entity_edges_for(sf_dir: str):
    """The entity–entity projection of the dict-lane edge table (the
    doc→surface ``mentions`` edges are provenance, not graph
    structure)."""
    edges = _dict_flagship_for(sf_dir)["edges"]

    def proj(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b["pred"], "mentions"))
        return pa.table({"subj": b["subj"].filter(keep),
                         "obj": b["obj"].filter(keep)})

    return edges.map_batches(proj, batch_format="pyarrow")


def q_kg_degree(sf_dir: str):
    from kgforge.functions.graph import degree_ds

    return degree_ds(_entity_edges_for(sf_dir))


def q_kg_pagerank(sf_dir: str):
    from kgforge.functions.graph import pagerank_ds

    return pagerank_ds(_entity_edges_for(sf_dir), iters=3)


def q_kg_two_hop(sf_dir: str):
    from kgforge.functions.graph import two_hop_count_ds

    return two_hop_count_ds(_entity_edges_for(sf_dir))


def q_kg_sssp(sf_dir: str):
    from kgforge.functions.graph import bfs_levels_ds

    return bfs_levels_ds(_entity_edges_for(sf_dir), n_seeds=5,
                         max_hops=4)


def q_bilstm_mix_prf(sf_dir: str):
    """Held-out P/R of the DISTRIBUTED (parameter-mixing) BiLSTM-CRF
    trainer — rows-only by nature (model training; no SQL twin).
    Proves the distributed trainer end-to-end inside the driver
    contract: shards train in parallel Ray tasks, averaged weights
    decode the held-out corpus."""
    import ray.data as rd

    from kgforge.oracle import bilstm_crf as B
    from kgforge.oracle.corpus import generate_corpus
    from kgforge.oracle.labels import extract_entities
    from kgforge.oracle.vocab import build_vocab, count_chars
    from kgforge.stages.tagger import train_bilstm_distributed

    train = generate_corpus(400, seed=42)
    vocab = build_vocab(count_chars(train))
    model = train_bilstm_distributed(train, vocab, shards=4,
                                     rounds=3, epochs_per_round=2)
    test = generate_corpus(150, seed=99)
    pred = B.decode_texts(model, [s.text for s in test])
    gold_n = pred_n = hit = 0
    for s, p in zip(test, pred):
        g, q = set(extract_entities(s.tags)), set(extract_entities(p))
        gold_n += len(g)
        pred_n += len(q)
        hit += len(g & q)
    return rd.from_arrow(pa.table({
        "gold": pa.array([gold_n], pa.int64()),
        "pred": pa.array([pred_n], pa.int64()),
        "hit": pa.array([hit], pa.int64()),
        "precision_ppm": pa.array(
            [hit * 1_000_000 // max(pred_n, 1)], pa.int64()),
        "recall_ppm": pa.array(
            [hit * 1_000_000 // max(gold_n, 1)], pa.int64())}))


def q_window_funnel(sf_dir: str):
    """Windowed funnel levels (ClickHouse windowFunnel shape) — see
    :func:`kgforge.functions.events.window_funnel_ds`."""
    from kgforge.functions.events import window_funnel_ds

    return window_funnel_ds(
        _read(sf_dir, "events", ["user_id", "event_type", "ts"]),
        steps=("view", "click", "purchase"),
        window_us=6 * 3_600_000_000)


def q_embedding_drift(sf_dir: str):
    """Per-dim parity-half drift QA — see
    :func:`kgforge.functions.clustering.embedding_drift_ds`."""
    from kgforge.functions.clustering import embedding_drift_ds

    return embedding_drift_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]))


def q_supplier_reliability(sf_dir: str):
    """Late-shipment rate per supplier (lines shipped > 90 days after
    the order date), exact integer ppm — the vendor scorecard.  One
    orderkey-hash cogroup attaches the order date; the per-supplier
    reduce rides the groupby; only (orderkey, suppkey, day) triples
    shuffle."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import cogroup_partition_ds

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    def lday(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["l_shipdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "sday": pa.array(us // 86_400_000_000)})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def oday(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["o_orderdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "oday": pa.array(us // 86_400_000_000)})

    def attach(t, starts, nl, nr):
        return _attach_right(t, starts, nl, nr,
                             ["l_suppkey", "sday"], ("oday", "oday"),
                             ["l_suppkey", "sday"])

    lo = cogroup_partition_ds(
        li.map_batches(lday, batch_format="pyarrow"),
        orders.map_batches(oday, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", attach,
        ["l_suppkey", "sday"], ["oday"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("sday", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("oday", pa.int64())]))

    def late(b: pa.Table) -> pa.Table:
        sd = b["sday"].combine_chunks().to_numpy(zero_copy_only=False)
        od = b["oday"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({"l_suppkey": b["l_suppkey"],
                      "one": pa.array(np.ones(len(sd), np.int64)),
                      "lt": pa.array((sd - od > 90).astype(np.int64))})
        g = t.group_by("l_suppkey", use_threads=False).aggregate(
            [("one", "sum"), ("lt", "sum")])
        return pa.table({"l_suppkey": g["l_suppkey"],
                         "n": g["one_sum"], "l": g["lt_sum"]})

    agg = lo.map_batches(late, batch_format="pyarrow") \
        .groupby("l_suppkey").aggregate(
            Sum("n", alias_name="n_lines"),
            Sum("l", alias_name="n_late")).to_pandas()
    n = agg["n_lines"].to_numpy().astype(np.int64)
    lt = agg["n_late"].to_numpy().astype(np.int64)
    return pa.table({
        "l_suppkey": pa.array(agg["l_suppkey"].astype(np.int64)),
        "n_lines": pa.array(n), "n_late": pa.array(lt),
        "late_ppm": pa.array(lt * 1_000_000 // n)})


def q_quarter_yoy(sf_dir: str):
    """Quarterly revenue with year-over-year delta (cents, exact).
    The quarter grain is calendar-bounded, so the YoY join is a
    driver-side shift over ≤ a-few-dozen rows; the only big-data pass
    is the combiner-first cents reduce."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["o_orderdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        months = (us // 86_400_000_000).astype("datetime64[D]") \
            .astype("datetime64[M]").astype(np.int64)
        q = (months + 1970 * 12) // 3    # absolute quarter index
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        t = pa.table({"q": pa.array(q), "c": pa.array(cents)})
        g = t.group_by("q", use_threads=False).aggregate(
            [("c", "sum")])
        return pa.table({"q": g["q"], "c": g["c_sum"]})

    agg = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("q").aggregate(Sum("c", alias_name="rev_cents")) \
        .to_pandas().sort_values("q")
    qs = agg["q"].to_numpy().astype(np.int64)
    rev = agg["rev_cents"].to_numpy().astype(np.int64)
    prev = dict(zip(qs, rev))
    yoy = np.array([rev[i] - prev.get(qs[i] - 4, 0)
                    for i in range(len(qs))], dtype=np.int64)
    return pa.table({
        "year": pa.array(qs // 4), "quarter": pa.array(qs % 4 + 1),
        "rev_cents": pa.array(rev), "yoy_delta_cents": pa.array(yoy)})


def q_reorder_gap(sf_dir: str):
    """Median repeat-purchase interval (days) per customer with ≥ 2
    orders — the replenishment-cycle signal.  Median uses the
    engine's exact floor((n−1)/2) rank rule.  One customer-hash
    shuffle; per partition the gaps are one global diff with run
    breaks masked, the per-run median ONE gather at
    run_start + (len−1)//2 of the (run, gap)-sorted array — no
    per-customer Python."""
    from kgforge.functions.events import _run_breaks
    from kgforge.functions.joins import _part_codes

    def tag(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["o_orderdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"o_custkey": b["o_custkey"],
                      "day": pa.array(us // 86_400_000_000)})
        return t.append_column(
            "__p", pa.array(_part_codes(t["o_custkey"], 64)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("o_custkey", "ascending"), ("day", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        brk = _run_breaks(t["o_custkey"].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        gaps = np.zeros(n, dtype=np.int64)
        if n > 1:
            gaps[1:] = np.diff(day)
        keep = ~brk                       # gap rows only
        cust = t["o_custkey"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        gc, gg = cust[keep], gaps[keep]
        if len(gc) == 0:
            return pa.table({
                "o_custkey": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "median_gap_days": pa.array([], pa.int64())})
        order = np.lexsort((gg, gc))
        gc, gg = gc[order], gg[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(gc[1:] != gc[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [len(gc)]]))
        med = gg[starts + (lens - 1) // 2]
        return pa.table({
            "o_custkey": pa.array(gc[starts]),
            "n_gaps": pa.array(lens.astype(np.int64)),
            "median_gap_days": pa.array(med)})

    return _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow")


def q_returns_trend(sf_dir: str):
    """Monthly return-rate trend: per ship month, line count and the
    returned-flag share in exact ppm (the quality-regression monitor).
    Pure combiner + calendar-bounded fold — zero corpus shuffle."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["l_shipdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        ym = (us // 86_400_000_000).astype("datetime64[D]") \
            .astype("datetime64[M]").astype(np.int64) + 1970 * 12
        r = pc.equal(b["l_returnflag"], "R").to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = pa.table({"ym": pa.array(ym),
                      "one": pa.array(np.ones(len(r), np.int64)),
                      "r": pa.array(r)})
        g = t.group_by("ym", use_threads=False).aggregate(
            [("one", "sum"), ("r", "sum")])
        return pa.table({"ym": g["ym"], "n": g["one_sum"],
                         "r": g["r_sum"]})

    agg = _read(sf_dir, "lineitem", ["l_shipdate", "l_returnflag"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("ym").aggregate(
            Sum("n", alias_name="n_lines"),
            Sum("r", alias_name="n_returned")).to_pandas()
    ym = agg["ym"].to_numpy().astype(np.int64)
    n = agg["n_lines"].to_numpy().astype(np.int64)
    r = agg["n_returned"].to_numpy().astype(np.int64)
    return pa.table({
        "year": pa.array(ym // 12), "month": pa.array(ym % 12 + 1),
        "n_lines": pa.array(n), "n_returned": pa.array(r),
        "return_ppm": pa.array(r * 1_000_000 // n)})


def q_kg_mean_dist(sf_dir: str):
    """Mean BFS hop distance from the deterministic seed set (the
    small-world / connectivity health number): one row (n_reached,
    sum_dist, mean_dist_milli) over the kg_sssp levels — integer
    milli to stay hash-exact."""
    import ray.data as rd

    from kgforge.functions.graph import bfs_levels_ds

    lv = bfs_levels_ds(_entity_edges_for(sf_dir), n_seeds=5,
                       max_hops=4).to_pandas()
    n = len(lv)
    sd = int(lv["dist"].sum()) if n else 0
    return rd.from_arrow(pa.table({
        "n_reached": pa.array([n], pa.int64()),
        "sum_dist": pa.array([sd], pa.int64()),
        "mean_dist_milli": pa.array(
            [sd * 1000 // max(n, 1)], pa.int64())}))


def q_basket_size_dist(sf_dir: str):
    """Order-size histogram: how many orders have k lineitems (the
    basket-size distribution, Q13's sibling at line grain).  Combiner
    per batch, per-order sum, k-grain fold — counts shuffle, never
    lines."""
    from ray.data.aggregate import Count, Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["l_orderkey"]).group_by(
            "l_orderkey", use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "n": g["count_all"].cast(pa.int64())})

    return _read(sf_dir, "lineitem", ["l_orderkey"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("n", alias_name="k")) \
        .groupby("k").aggregate(Count(alias_name="n_orders"))


def q_kg_type_conflicts(sf_dir: str):
    """Entity-type disambiguation QA: per surface, the number of
    distinct entity types it was observed under plus the min/max type
    (n_types > 1 rows are gazetteer collisions / tagging noise — the
    clean dict corpus scores 1 everywhere, which the twin verifies
    value-exactly).  Per-batch (surface, etype) partial distincts →
    one keyed reduce → surface-grain fold; only distinct pairs
    shuffle."""
    from ray.data.aggregate import Count, Max, Min

    ments = _dict_flagship_for(sf_dir)["mentions"]

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({"surface": b["surface"],
                         "etype": b["etype"]}) \
            .group_by(["surface", "etype"],
                      use_threads=False).aggregate([])

    return ments.map_batches(partial, batch_format="pyarrow") \
        .groupby(["surface", "etype"]) \
        .aggregate(Count(alias_name="__c")) \
        .map_batches(lambda b: b.select(["surface", "etype"]),
                     batch_format="pyarrow") \
        .groupby("surface").aggregate(
            Count(alias_name="n_types"),
            Min("etype", alias_name="type_min"),
            Max("etype", alias_name="type_max"))


def q_burst_score(sf_dir: str):
    """Burstiness QA per user: the max number of events falling in any
    trailing 10-minute window (rate-limiter / bot signal).  One
    user-hash shuffle; per partition the window counts for ALL events
    are two structured-array searchsorteds (window start and
    equal-ts-inclusive end) and the per-user max is one reduceat —
    no per-user Python."""
    from ray.data.aggregate import Max

    from kgforge.functions.joins import _part_codes

    W = 600_000_000  # 10 min in µs

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b["user_id"],
                      "__on": pc.cast(
                          pc.cast(b["ts"], pa.timestamp("us")),
                          pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t["user_id"], 64)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                            ("__on", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        u = t["user_id"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["__on"].combine_chunks().to_numpy(zero_copy_only=False)
        rec = np.empty(n, dtype=[("u", "<i8"), ("t", "<i8")])
        rec["u"], rec["t"] = u, ts
        qlo = rec.copy()
        qlo["t"] = ts - W
        lo = np.searchsorted(rec, qlo, side="left")
        hi = np.searchsorted(rec, rec, side="right")
        cnt = (hi - lo).astype(np.int64)
        starts = np.concatenate(
            [[0], np.flatnonzero(u[1:] != u[:-1]) + 1]) \
            if n else np.zeros(0, np.int64)
        mx = np.maximum.reduceat(cnt, starts) if n else cnt
        return pa.table({
            "user_id": t["user_id"].take(pa.array(starts)),
            "max_burst": pa.array(mx)})

    return _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("user_id").aggregate(Max("max_burst",
                                          alias_name="max_burst"))


def q_dau_stickiness(sf_dir: str):
    """DAU / MAU stickiness per day (the product-analytics engagement
    ratio), exact integer ppm.  Two pair-distinct reduces — (day,
    user) and (month, user) — shuffle distinct pairs, never events;
    the month MAU table is calendar-bounded and broadcast-joined on
    the driver."""
    from ray.data.aggregate import Count

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        t = pa.table({"day": pa.array(day), "user_id": b["user_id"]})
        return t.group_by(["day", "user_id"],
                          use_threads=False).aggregate([])

    dau = ev.map_batches(pairs, batch_format="pyarrow") \
        .groupby(["day", "user_id"]).aggregate(Count(alias_name="c")) \
        .map_batches(lambda b: b.select(["day", "user_id"]),
                     batch_format="pyarrow") \
        .groupby("day").aggregate(Count(alias_name="dau")) \
        .to_pandas().sort_values("day")

    def mpairs(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # calendar month id = year*12 + (month-1), via epoch day →
        # the SQL twin uses year()/month(); match with a datetime64
        # roundtrip (exact: both engines read the same timestamps)
        days = (us // 86_400_000_000).astype("datetime64[D]")
        months = days.astype("datetime64[M]").astype(np.int64)
        t = pa.table({"month": pa.array(months),
                      "user_id": b["user_id"]})
        return t.group_by(["month", "user_id"],
                          use_threads=False).aggregate([])

    mau = ev.map_batches(mpairs, batch_format="pyarrow") \
        .groupby(["month", "user_id"]) \
        .aggregate(Count(alias_name="c")) \
        .map_batches(lambda b: b.select(["month", "user_id"]),
                     batch_format="pyarrow") \
        .groupby("month").aggregate(Count(alias_name="mau")) \
        .to_pandas()
    mau_of = dict(zip(mau["month"].astype(np.int64),
                      mau["mau"].astype(np.int64)))

    days = dau["day"].to_numpy().astype(np.int64)
    months = days.astype("datetime64[D]").astype("datetime64[M]") \
        .astype(np.int64)
    dv = dau["dau"].to_numpy().astype(np.int64)
    mv = np.array([mau_of[m] for m in months], dtype=np.int64)
    return pa.table({
        "day": pa.array(days), "dau": pa.array(dv),
        "mau": pa.array(mv),
        "stickiness_ppm": pa.array(dv * 1_000_000 // mv)})


def q_user_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type mix, exact integer
    micro-nats: with L(x) = round(ln(x)·1e6), entropy_micro =
    (n·L(n) − Σ_t c_t·L(c_t)) // n — all-integer once the shared
    L grid is fixed, so both engines agree bit-for-bit (numerator
    non-negative by concavity, // == floor).  The diversity signal
    for bot/script detection.  One (user, type) count reduce, then a
    user-grain fold — cells shuffle, never events."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "event_type": b["event_type"]}) \
            .group_by(["user_id", "event_type"],
                      use_threads=False).aggregate(
            [([], "count_all")]).rename_columns(
            ["user_id", "event_type", "c"])

    cells = _read(sf_dir, "events", ["user_id", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["user_id", "event_type"]).aggregate(
            Sum("c", alias_name="c"))

    def fold(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lc = round_away(np.log(c) * 1_000_000, 0).astype(np.int64)
        return pa.table({"user_id": b["user_id"],
                         "c": pa.array(c),
                         "clc": pa.array(c * lc)})

    agg = cells.map_batches(fold, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Sum("c", alias_name="n_events"),
            Sum("clc", alias_name="sum_clc")).to_pandas()
    n = agg["n_events"].to_numpy().astype(np.int64)
    ln_n = round_away(np.log(n) * 1_000_000, 0).astype(np.int64)
    ent = (n * ln_n - agg["sum_clc"].to_numpy().astype(np.int64)) // n
    return pa.table({
        "user_id": pa.Array.from_pandas(agg["user_id"]),
        "n_events": pa.array(n),
        "entropy_micro": pa.array(ent.astype(np.int64))})


def q_media_census(sf_dir: str):
    """Media-span census over the interleaved T0 table: per kind, the
    span/doc/distinct-ref counts (the ingest dashboard row before any
    decode work is scheduled).  Per-batch (kind, doc/ref) partial
    distincts → kind-grain reduces; spans never shuffle raw."""
    from ray.data.aggregate import Count, Sum

    spans = explode_t0_ds(derive_t0_ds(sf_dir))

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.invert(pc.equal(b["kind"], "text")))
        t = pa.table({"kind": f["kind"], "doc_id": f["doc_id"],
                      "media_ref": f["media_ref"]})
        g = t.group_by(["kind", "doc_id", "media_ref"],
                       use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"kind": g["kind"], "doc_id": g["doc_id"],
                         "media_ref": g["media_ref"],
                         "n": g["count_all"].cast(pa.int64())})

    fine = spans.map_batches(partial, batch_format="pyarrow") \
        .groupby(["kind", "doc_id", "media_ref"]) \
        .aggregate(Sum("n", alias_name="n")).materialize()

    def docs_partial(b: pa.Table) -> pa.Table:
        return b.select(["kind", "doc_id"]).group_by(
            ["kind", "doc_id"], use_threads=False).aggregate([])

    n_docs = fine.map_batches(docs_partial, batch_format="pyarrow") \
        .groupby(["kind", "doc_id"]).aggregate(Count(alias_name="c")) \
        .groupby("kind").aggregate(Count(alias_name="n_docs")) \
        .to_pandas().set_index("kind")["n_docs"]

    def refs_partial(b: pa.Table) -> pa.Table:
        return b.select(["kind", "media_ref"]).group_by(
            ["kind", "media_ref"], use_threads=False).aggregate([])

    n_refs = fine.map_batches(refs_partial, batch_format="pyarrow") \
        .groupby(["kind", "media_ref"]) \
        .aggregate(Count(alias_name="c")) \
        .groupby("kind").aggregate(Count(alias_name="n_refs")) \
        .to_pandas().set_index("kind")["n_refs"]

    n_spans = fine.groupby("kind") \
        .aggregate(Sum("n", alias_name="n_spans")).to_pandas() \
        .set_index("kind")["n_spans"]
    kinds = sorted(n_spans.index)
    return pa.table({
        "kind": pa.array(kinds, pa.string()),
        "n_spans": pa.array([int(n_spans[k]) for k in kinds],
                            pa.int64()),
        "n_docs": pa.array([int(n_docs[k]) for k in kinds],
                           pa.int64()),
        "n_refs": pa.array([int(n_refs[k]) for k in kinds],
                           pa.int64())})


def q_kg_reciprocity(sf_dir: str):
    """Per-predicate reciprocity QA: how many directed edges have
    their reverse under the same predicate (symmetric predicates —
    colleague_of, partner_of — should score high; functional ones
    near zero; anything in between is extraction noise).  One groupby
    on the canonical (pred, lo, hi) pair key with direction-flag
    maxes, one pred-grain fold — shuffles carry distinct pairs."""
    from ray.data.aggregate import Max, Sum

    edges = _dict_flagship_for(sf_dir)["edges"]

    def canon(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.invert(pc.equal(b["pred"], "mentions")),
                       pc.invert(pc.equal(b["subj"], b["obj"])))
        f = b.filter(keep)
        lt = pc.less(f["subj"], f["obj"])
        lo = pc.if_else(lt, f["subj"], f["obj"])
        hi = pc.if_else(lt, f["obj"], f["subj"])
        fwd = pc.cast(lt, pa.int64())
        return pa.table({
            "pred": f["pred"], "lo": lo, "hi": hi,
            "d1": fwd,
            "d2": pc.subtract(pa.scalar(1, pa.int64()), fwd)})

    pairs = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby(["pred", "lo", "hi"]) \
        .aggregate(Max("d1", alias_name="d1"),
                   Max("d2", alias_name="d2"))

    def fold(b: pa.Table) -> pa.Table:
        d1 = b["d1"].combine_chunks().to_numpy(zero_copy_only=False)
        d2 = b["d2"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "pred": b["pred"],
            "n": pa.array(d1 + d2),
            "recip": pa.array(((d1 & d2) * 2).astype(np.int64))})

    agg = pairs.map_batches(fold, batch_format="pyarrow") \
        .groupby("pred").aggregate(
            Sum("n", alias_name="n_edges"),
            Sum("recip", alias_name="n_reciprocal")).to_pandas()
    ne = agg["n_edges"].to_numpy().astype(np.int64)
    nr = agg["n_reciprocal"].to_numpy().astype(np.int64)
    return pa.table({
        "pred": pa.array(agg["pred"], pa.string()),
        "n_edges": pa.array(ne), "n_reciprocal": pa.array(nr),
        "reciprocity_ppm": pa.array(
            nr * 1_000_000 // np.maximum(ne, 1))})


def q_kg_inferred(sf_dir: str):
    """Horn-rule inference: works_at(x, y) ∧ located_in(y, z) →
    based_in(x, z) — see
    :func:`kgforge.functions.graph.compose_edges_ds`."""
    from kgforge.functions.graph import compose_edges_ds

    return compose_edges_ds(_dict_flagship_for(sf_dir)["edges"],
                            "works_at", "located_in", "based_in")


def q_kg_entity_span(sf_dir: str):
    """Entity lifespan over the corpus: per surface, first/last doc id
    and distinct-doc support — the churn signal for incremental KG
    maintenance (short-lived surfaces are extraction noise).  One
    groupby over per-batch (surface, doc) partial distincts."""
    from ray.data.aggregate import Count, Max, Min

    ments = _dict_flagship_for(sf_dir)["mentions"]

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({"surface": b["surface"],
                         "doc_id": b["doc_id"]}) \
            .group_by(["surface", "doc_id"],
                      use_threads=False).aggregate([])

    return ments.map_batches(partial, batch_format="pyarrow") \
        .groupby(["surface", "doc_id"]) \
        .aggregate(Count(alias_name="__c")) \
        .map_batches(lambda b: b.select(["surface", "doc_id"]),
                     batch_format="pyarrow") \
        .groupby("surface").aggregate(
            Min("doc_id", alias_name="first_doc"),
            Max("doc_id", alias_name="last_doc"),
            Count(alias_name="n_docs"))


def q_kg_entity_density(sf_dir: str):
    """Per-doc entity density (mentions per char, exact ppm) — the
    doc-level KG yield signal: low-density docs are candidates for
    dropping from the extraction corpus.  Per-doc chars and mention
    counts are combiner-first reduces; the final join is one hash
    cogroup emitting one row per doc (left-outer: docs with zero
    mentions keep a row)."""
    from ray.data.aggregate import Count, Sum

    from kgforge.functions.joins import cogroup_partition_ds

    res = _dict_flagship_for(sf_dir)

    def chars(b: pa.Table) -> pa.Table:
        t = pa.table({"doc_id": b["doc_id"],
                      "c": pc.cast(pc.utf8_length(b["sent_text"]),
                                   pa.int64())})
        g = t.group_by("doc_id", use_threads=False).aggregate(
            [("c", "sum")])
        return pa.table({"doc_id": g["doc_id"], "c": g["c_sum"]})

    nch = res["sentences"].map_batches(chars, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("c", alias_name="n_chars"))
    nm = res["mentions"].map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Count(alias_name="n_mentions"))

    def fuse(t, starts, nl, nr):
        # left = chars (one row per doc), right = mention counts
        has_l = nl > 0
        lpos = starts[has_l]
        c = t["n_chars"].take(pa.array(lpos)).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        m = np.zeros(len(lpos), dtype=np.int64)
        has_r = (nr > 0)[has_l]
        rpos = (starts + nl)[has_l][has_r]
        m[has_r] = t["n_mentions"].take(pa.array(rpos)) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["__k"].take(pa.array(lpos)),
            "n_mentions": pa.array(m),
            "n_chars": pa.array(c),
            "density_ppm": pa.array(m * 1_000_000 // np.maximum(c, 1))})

    return cogroup_partition_ds(
        nch, nm, "doc_id", "doc_id", fuse, ["n_chars"],
        ["n_mentions"],
        left_schema=pa.schema([("doc_id", pa.string()),
                               ("n_chars", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.string()),
                                ("n_mentions", pa.int64())]))


def q_kg_typed_paths(sf_dir: str):
    """Typed 2-path wedge census — see
    :func:`kgforge.functions.graph.typed_paths_ds`."""
    from kgforge.functions.graph import typed_paths_ds

    edges = _dict_flagship_for(sf_dir)["edges"]

    def ents(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.equal(b["pred"], "mentions")))

    return typed_paths_ds(
        edges.map_batches(ents, batch_format="pyarrow"))


def q_kg_pred_card(sf_dir: str):
    """Per-predicate cardinality QA report over the deduped edge
    table: edge count, distinct subjects/objects, subject fanout ppm.
    Scale plan: three combiner-first reductions (per-batch partial
    distinct, shuffles carry (pred, endpoint) pairs — never edges
    twice), folded on the driver at predicate grain (bounded by the
    rule vocabulary, a few dozen rows)."""
    from ray.data.aggregate import Count

    edges = _dict_flagship_for(sf_dir)["edges"]

    def npairs(col: str):
        def partial(b: pa.Table) -> pa.Table:
            return pa.table({"pred": b["pred"], "e": b[col]}) \
                .group_by(["pred", "e"], use_threads=False).aggregate([])
        return edges.map_batches(partial, batch_format="pyarrow") \
            .groupby(["pred", "e"]).aggregate(Count(alias_name="__c")) \
            .groupby("pred").aggregate(Count(alias_name="n")) \
            .to_pandas().set_index("pred")["n"]

    n_edges = edges.groupby("pred") \
        .aggregate(Count(alias_name="n")).to_pandas() \
        .set_index("pred")["n"]
    n_subj, n_obj = npairs("subj"), npairs("obj")
    preds = sorted(n_edges.index)
    ne = np.array([n_edges[p] for p in preds], np.int64)
    ns = np.array([n_subj[p] for p in preds], np.int64)
    return pa.table({
        "pred": pa.array(preds, pa.string()),
        "n_edges": pa.array(ne),
        "n_subj": pa.array(ns),
        "n_obj": pa.array([n_obj[p] for p in preds], pa.int64()),
        "fanout_ppm": pa.array(ne * 1_000_000 // ns)})


def q_kg_walks(sf_dir: str):
    from kgforge.functions.graph import random_walks_ds

    return random_walks_ds(_entity_edges_for(sf_dir),
                           walks_per_node=2, walk_len=3)


def q_kg_triangles(sf_dir: str):
    from kgforge.functions.graph import triangle_count_ds

    return triangle_count_ds(_entity_edges_for(sf_dir))


def q_kg_components(sf_dir: str):
    from kgforge.functions.graph import components_ds

    return components_ds(_entity_edges_for(sf_dir))


def q_kg_link_pred(sf_dir: str):
    from kgforge.functions.graph import common_neighbors_ds

    return common_neighbors_ds(_entity_edges_for(sf_dir), k=20)


def q_kg_clustering(sf_dir: str):
    from kgforge.functions.graph import clustering_coeff_ds

    return clustering_coeff_ds(_entity_edges_for(sf_dir))


def q_kg_ra_linkpred(sf_dir: str):
    from kgforge.functions.graph import ra_link_pred_ds

    return ra_link_pred_ds(_entity_edges_for(sf_dir), k=20)


def q_kg_jaccard_linkpred(sf_dir: str):
    """Jaccard-coefficient link prediction in integer micro-units —
    the neighborhood-overlap member of the linkpred family (CN and RA
    are the other two)."""
    from kgforge.functions.graph import jaccard_link_pred_ds

    return jaccard_link_pred_ds(_entity_edges_for(sf_dir), k=20)


def q_kg_aa_linkpred(sf_dir: str):
    """Discrete Adamic–Adar link prediction (weight 10⁶ //
    (1 + floor(log2 deg)), bit-exact in both engines) — completes the
    linkpred family alongside CN, RA and Jaccard."""
    from kgforge.functions.graph import adamic_adar_ds

    return adamic_adar_ds(_entity_edges_for(sf_dir), k=20)


def q_kg_ambiguity(sf_dir: str):
    """Surface-form ambiguity census: per surface the mention count,
    distinct type count, majority type (count DESC, type ASC) and
    its share in integer ppm — the linking-difficulty signal.
    Scale plan: per-batch (surface, etype) count partials → one
    keyed groupby → a surface-hash partition pass folds each
    surface's run vectorized (sort + run offsets, no per-surface
    callback)."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    ments = _dict_flagship_for(sf_dir)["mentions"] \
        .select_columns(["surface", "etype"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["surface", "etype"],
                       use_threads=False).aggregate([([], "count_all")])
        return pa.table({"surface": g["surface"], "etype": g["etype"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    tc = ments.map_batches(partial, batch_format="pyarrow") \
        .groupby(["surface", "etype"]).aggregate(Sum("c", alias_name="c"))

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__p", pa.array(
            _part_codes(b["surface"], 32)))

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "surface": pa.array([], pa.string()),
            "n_mentions": pa.array([], pa.int64()),
            "n_types": pa.array([], pa.int64()),
            "top_type": pa.array([], pa.string()),
            "top_share_ppm": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = pc.sort_indices(pa.table({
            "s": t["surface"], "negc": pa.array(-c),
            "e": t["etype"]}),
            sort_keys=[("s", "ascending"), ("negc", "ascending"),
                       ("e", "ascending")])
        o = order.to_numpy(zero_copy_only=False)
        t = t.take(pa.array(o))
        s = t["surface"].combine_chunks()
        c = c[o]
        codes = s.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
        runlen = np.diff(np.concatenate([starts, [len(codes)]]))
        n = np.add.reduceat(c, starts)
        return pa.table({
            "surface": s.take(pa.array(starts)),
            "n_mentions": pa.array(n),
            "n_types": pa.array(runlen.astype(np.int64)),
            "top_type": t["etype"].take(pa.array(starts)),
            "top_share_ppm": pa.array(c[starts] * 1_000_000 // n)})

    return tc.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(fold, batch_format="pyarrow")


def q_kg_diameter(sf_dir: str):
    """Double-sweep diameter lower bound of the entity graph."""
    from kgforge.functions.graph import diameter_est_ds

    return diameter_est_ds(_entity_edges_for(sf_dir), max_hops=6)


def q_kg_modularity(sf_dir: str):
    """Newman modularity of the deterministic LPA partition — one
    exact-integer summary row."""
    from kgforge.functions.graph import modularity_ds

    return modularity_ds(_entity_edges_for(sf_dir), rounds=2)


def q_kg_betweenness(sf_dir: str):
    """Seed-set betweenness dependencies (integer Brandes) within 4
    hops of the 4 smallest seeds — (node, dist, paths, dep_units)."""
    from kgforge.functions.graph import betweenness_ds

    return betweenness_ds(_entity_edges_for(sf_dir), n_seeds=4,
                          max_hops=4)


def q_kg_path_counts(sf_dir: str):
    """Shortest-path counts (exact σ) from the 4 smallest seeds
    within 4 hops — (node, dist, paths), pure integers."""
    from kgforge.functions.graph import path_counts_ds

    return path_counts_ds(_entity_edges_for(sf_dir), n_seeds=4,
                          max_hops=4)


def q_kg_ktruss(sf_dir: str):
    """Bounded-round 4-truss peeling of the entity graph — surviving
    edges with their within-subgraph triangle support."""
    from kgforge.functions.graph import ktruss_ds

    return ktruss_ds(_entity_edges_for(sf_dir), k=4, rounds=3)


def q_kg_wpagerank(sf_dir: str):
    """Weighted PageRank over the entity graph — mass splits along
    out edges proportionally to edge support (summed across
    predicates), integer micro-unit ranks."""
    from kgforge.functions.graph import weighted_pagerank_ds

    edges = _dict_flagship_for(sf_dir)["edges"]

    def proj(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b["pred"], "mentions"))
        return pa.table({"subj": b["subj"].filter(keep),
                         "obj": b["obj"].filter(keep),
                         "support": b["support"].filter(keep)})

    return weighted_pagerank_ds(
        edges.map_batches(proj, batch_format="pyarrow"), iters=3)


def q_kg_harmonic(sf_dir: str):
    """Per-seed bounded-radius harmonic centrality + eccentricity
    (4 smallest seeds, 4 hops) — integer micro-unit harmonic sums."""
    from kgforge.functions.graph import harmonic_ds

    return harmonic_ds(_entity_edges_for(sf_dir), n_seeds=4, max_hops=4)


def q_kg_richclub(sf_dir: str):
    """Rich-club coefficient curve over the entity graph — density of
    the subgraph induced by nodes above each degree threshold, in
    exact integer ppm."""
    from kgforge.functions.graph import rich_club_ds

    return rich_club_ds(_entity_edges_for(sf_dir))


def q_kg_ppr(sf_dir: str):
    """Personalized PageRank (teleport mass on the 4 lexicographically
    smallest nodes), integer micro-unit ranks."""
    from kgforge.functions.graph import personalized_pagerank_ds

    return personalized_pagerank_ds(_entity_edges_for(sf_dir),
                                    n_seeds=4, iters=3)


def q_kg_katz(sf_dir: str):
    from kgforge.functions.graph import katz_ds

    return katz_ds(_entity_edges_for(sf_dir), iters=3)


def q_kg_communities(sf_dir: str):
    from kgforge.functions.graph import label_prop_communities_ds

    return label_prop_communities_ds(_entity_edges_for(sf_dir),
                                     rounds=2)


def q_kg_hits(sf_dir: str):
    from kgforge.functions.graph import hits_ds

    return hits_ds(_entity_edges_for(sf_dir), iters=2)


def q_kg_comp_sizes(sf_dir: str):
    """Component size distribution — two node-bounded keyed counts
    over the distributed components output."""
    from ray.data.aggregate import Count

    from kgforge.functions.graph import components_ds

    comp = components_ds(_entity_edges_for(sf_dir))
    sizes = comp.groupby("component").aggregate(
        Count(alias_name="size_nodes"))

    def strip(b: pa.Table) -> pa.Table:
        return pa.table({"size_nodes": pc.cast(b["size_nodes"],
                                               pa.int64())})

    return sizes.map_batches(strip, batch_format="pyarrow") \
        .groupby("size_nodes").aggregate(
            Count(alias_name="n_components"))


def q_kg_negatives(sf_dir: str):
    from kgforge.functions.graph import negative_samples_ds

    edges = _dict_flagship_for(sf_dir)["edges"]

    def proj(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b["pred"], "mentions"))
        return pa.table({"subj": b["subj"].filter(keep),
                         "pred": b["pred"].filter(keep),
                         "obj": b["obj"].filter(keep)})

    return negative_samples_ds(edges.map_batches(proj,
                                                 batch_format="pyarrow"))


def q_kg_health(sf_dir: str):
    """One-row graph-quality gate over the entity graph — node/edge
    counts, exact degree quantiles (the engine's floor((n-1)q) rule),
    mean degree (exact-int → double, one division), component count
    and largest-component size.  Pure composition of the graph
    operators; every input to the final row is an already-tiny
    aggregate (degree histogram = distinct degrees, component sizes =
    n_components rows)."""
    import numpy as np

    from kgforge.functions.graph import components_ds, degree_ds
    from ray.data.aggregate import Count, Max

    edges = _entity_edges_for(sf_dir)
    deg = degree_ds(edges).materialize()

    hist = {}
    for r in deg.map_batches(
            lambda b: b.select(["degree"]),
            batch_format="pyarrow").groupby("degree") \
            .aggregate(Count(alias_name="c")).take_all():
        hist[int(r["degree"])] = hist.get(int(r["degree"]), 0) \
            + int(r["c"])
    degs = np.array(sorted(hist), dtype=np.int64)
    cnts = np.array([hist[d] for d in degs], dtype=np.int64)
    cum = np.cumsum(cnts)
    n_nodes = int(cum[-1]) if len(cum) else 0
    sum_deg = int((degs * cnts).sum())
    if n_nodes == 0:  # empty graph: all-zero health row, no div-by-0
        return pa.table({
            "n_nodes": pa.array([0], pa.int64()),
            "n_edges": pa.array([0], pa.int64()),
            "mean_degree": pa.array([0.0], pa.float64()),
            "p50_degree": pa.array([0], pa.int64()),
            "p90_degree": pa.array([0], pa.int64()),
            "n_components": pa.array([0], pa.int64()),
            "max_component": pa.array([0], pa.int64()),
        })

    def q_at(q: float) -> int:
        idx = int(np.floor((n_nodes - 1) * q))
        return int(degs[int(np.searchsorted(cum, idx + 1))])

    sizes = components_ds(edges).groupby("component") \
        .aggregate(Count(alias_name="size")).materialize()
    n_comp = sizes.count()
    max_comp = int(sizes.max("size") or 0)

    return pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([sum_deg // 2], pa.int64()),
        "mean_degree": pa.array([float(sum_deg) / float(n_nodes)],
                                pa.float64()),
        "p50_degree": pa.array([q_at(0.5)], pa.int64()),
        "p90_degree": pa.array([q_at(0.9)], pa.int64()),
        "n_components": pa.array([n_comp], pa.int64()),
        "max_component": pa.array([max_comp], pa.int64()),
    })


def q_kg_ego(sf_dir: str):
    from kgforge.functions.graph import ego_edges_ds

    return ego_edges_ds(_entity_edges_for(sf_dir), hops=2)


def q_event_type_corr(sf_dir: str):
    return F_events.group_corr_ds(
        _read(sf_dir, "events", ["event_type", "ts", "value"]))


def q_pack_chunks(sf_dir: str):
    from kgforge.functions.indexing import chunk_docs_ds, pack_chunks_ds

    chunks = chunk_docs_ds(_read(sf_dir, "documents",
                                 ["doc_id", "text"]))
    return pack_chunks_ds(chunks, capacity=512)


def q_typo_pairs(sf_dir: str):
    """FastSS deletion-neighborhood blocking vs the SQL twin's O(V²)
    levenshtein cross join — same ed==1 pair set, independent method."""
    return F_dedup.edit_distance_pairs_ds(
        _read(sf_dir, "customer", ["c_name"]), col="c_name")


def q_embedding_stats(sf_dir: str):
    from kgforge.functions.clustering import embedding_stats_ds

    return embedding_stats_ds(_read(sf_dir, "embeddings", ["embedding"]))


def q_asof_join(sf_dir: str):
    """As-of join: each purchase event matched to the user's most
    recent click at-or-before it (backward inclusive, DuckDB ASOF
    semantics).  Timestamps surface as epoch-µs int64 for engine-
    neutral comparison."""
    from kgforge.functions.events import asof_join_ds

    import pyarrow.dataset as pds

    cols = ["event_id", "ts", "user_id", "event_type"]
    purchases = _read(sf_dir, "events", cols,
                      row_filter=pds.field("event_type") == "purchase")
    clicks = _read(sf_dir, "events", cols,
                   row_filter=pds.field("event_type") == "click")
    out = asof_join_ds(purchases, clicks, by="user_id", on="ts",
                       left_cols=("event_id",),
                       right_cols=("event_id", "ts"),
                       tie_break="event_id")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "purchase_event": b["l_event_id"],
            "click_event": b["r_event_id"].cast(pa.int64()),
            "click_ts_us": b["r_ts"].cast(pa.timestamp("us"))
                                    .cast(pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def q_range_join(sf_dir: str):
    """Range join + aggregate: per purchase, how many clicks by the
    same user in the hour strictly before it."""
    from kgforge.functions.events import range_window_count_ds

    import pyarrow.dataset as pds

    cols = ["event_id", "ts", "user_id", "event_type"]
    purchases = _read(sf_dir, "events", cols,
                      row_filter=pds.field("event_type") == "purchase")
    clicks = _read(sf_dir, "events", cols,
                   row_filter=pds.field("event_type") == "click")
    return range_window_count_ds(purchases, clicks, by="user_id",
                                 on="ts", window_us=3_600_000_000,
                                 left_id="event_id")


def _embedding_lsh_oracle_sql(n_tables: int = 4, planes_per_table: int = 8,
                              dim: int = 64, seed: int = 42,
                              tau: float = 0.3) -> str:
    """DuckDB twin of :func:`kgforge.functions.dedup
    .embedding_lsh_pairs_ds`: the seeded hyperplane matrix is inlined
    as float64 literals (repr round-trips exactly), bucket keys are
    sign-bit sums via ``list_dot_product``, and candidate pairs are
    verified with ``list_cosine_similarity`` on DOUBLE[]."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, dim, planes_per_table))
    table_keys = []
    for t in range(n_tables):
        bits = []
        for j in range(planes_per_table):
            vec = ", ".join(repr(float(x)) for x in planes[t, :, j])
            bits.append(f"(CASE WHEN list_dot_product(e, [{vec}]) > 0.0 "
                        f"THEN {1 << j} ELSE 0 END)")
        table_keys.append(" + ".join(bits))
    buckets = " UNION ALL ".join(
        f"SELECT vec_id, e, {t} AS tab, ({table_keys[t]}) AS bkey FROM v"
        for t in range(n_tables))
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    b AS ({buckets}),
    pr AS (SELECT b1.vec_id AS id_a, b2.vec_id AS id_b,
                  list_cosine_similarity(b1.e, b2.e) AS cs
           FROM b b1 JOIN b b2
             ON b1.tab = b2.tab AND b1.bkey = b2.bkey
            AND b1.vec_id < b2.vec_id)
    SELECT DISTINCT id_a, id_b, round(cs, 4) AS cos_sim
    FROM pr WHERE cs >= {tau}
    """


def q_dup_clusters(sf_dir: str):
    """Connected components over the blocked-Jaccard near-dup pairs →
    (doc_id, cluster_id = component min)."""
    return F_dedup.dup_clusters_ds(q_jaccard_pairs(sf_dir))


def q_hash_split(sf_dir: str):
    """Deterministic md5 hash-based train/test split of documents."""
    return F_dedup.hash_split_ds(
        _read(sf_dir, "documents", ["doc_id"]), train_pct=80)


def q_kg_invariant(sf_dir: str):
    """I1 north-rule invariant, driver-value-checked: per-row
    span-sequence equality (kind, text, media_ref, order) through the
    dict-lane flagship — input-vs-passthrough hash compare AND
    output-side sentence reconstruction (every text span rebuilt from
    the pipeline's own sentence rows).  The oracle is the REQUIRED
    value: zero violations; any span mutation/drop/reorder anywhere in
    explode → tag → checkpoint shows up as a nonzero count and fails
    the compare."""
    from kgforge.sources.dictcorpus import derive_dict_t0_ds
    from kgforge.stages.invariant import (
        verify_invariant_output, verify_sentence_reconstruction,
    )

    res = _dict_flagship_for(sf_dir)
    t0 = derive_dict_t0_ds(sf_dir)
    v1 = verify_invariant_output(t0, res["sentences"])
    v2 = verify_sentence_reconstruction(t0, res["sentences"])
    return pa.table({
        "i1_violations": pa.array([v1], pa.int64()),
        "i1_span_violations": pa.array([v2], pa.int64()),
    })


def q_sliding_window(sf_dir: str):
    """3-hour sliding window counts per event type (window ends at
    each hour bucket)."""
    return F_events.sliding_window_counts_ds(
        _read(sf_dir, "events", ["ts", "event_type"]), window_hours=3)


def q_kg_prf(sf_dir: str):
    """North-star gate, driver-value-checked: triple precision/recall
    of the DISTRIBUTED flagship (HMM lane) vs the single-process
    oracle pipeline on the identical input — the BASELINE.json
    criterion is P/R ≥ 0.95; the engine's contract is exact agreement,
    so the oracle row is the required value (1.0, 1.0).  Any
    divergence anywhere in explode → tag → link → extract → dedup
    drops P or R below 1.0 and fails the compare."""
    import pyarrow.parquet as pq

    from kgforge.oracle.corpus import generate_interleaved_docs
    from kgforge.oracle.pipeline import run_oracle, train_hmm
    from kgforge.oracle.triples import triple_prf
    from kgforge.sources.derive import derive_t0_batch

    res = _flagship_for(sf_dir)
    edges = res["edges"].select_columns(["subj", "pred", "obj"]) \
        .to_pandas()
    pred_rows = edges.to_dict("records")

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet") \
        .metadata.num_rows
    docs = generate_interleaved_docs(n_docs, seed=42)
    derived = _prefix_derived_ids(derive_t0_batch(
        pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]))).to_pylist()
    oracle = run_oracle(docs + derived, train_hmm(n_train=800, seed=42))
    prf = triple_prf(pred_rows, oracle["edges"])
    return pa.table({
        "precision": pa.array([float(prf["precision"])], pa.float64()),
        "recall": pa.array([float(prf["recall"])], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Session intervals / interval-overlap join / coverage gaps / mode
# ---------------------------------------------------------------------------

def q_session_overlap(sf_dir: str):
    """Banded interval-overlap self-join over per-user session
    intervals: every cross-session pair whose time spans intersect."""
    iv = F_events.session_intervals_ds(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]))
    return F_events.interval_overlap_pairs_ds(iv)


def q_hour_gaps(sf_dir: str):
    """Gap list is a tiny summary (≤ series × hours rows), collected
    into one typed Arrow table: a gap-FREE corpus yields only 0-row
    blocks, which Ray's groupby internals emit column-less and
    ``Dataset.to_pandas`` then drops the schema — the typed collect
    keeps the contract columns even when empty."""
    import ray

    ds = F_events.hour_gaps_ds(
        _read(sf_dir, "events", ["event_type", "ts"]))
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    return pa.concat_tables(tabs) if tabs else pa.table({
        "event_type": pa.array([], pa.string()),
        "missing_hour": pa.array([], pa.int64())})


def q_hourly_mode(sf_dir: str):
    import pyarrow.compute as pc

    def hour_key(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.timestamp("us")).cast(pa.int64())
        return pa.table({"hour": pc.divide(us, 3_600_000_000),
                         "event_type": b["event_type"]})

    return F_events.mode_per_key_ds(
        _read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(hour_key, batch_format="pyarrow"),
        "hour", "event_type")


def _user_hours(sf_dir: str, event_type: str):
    """Distinct packed (user, hour) keys of one event type."""
    import pyarrow.compute as pc

    import pyarrow.dataset as pds

    def pack(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.timestamp("us")).cast(pa.int64())
        h = pc.divide(us, 3_600_000_000)
        return pa.table({"uh": pc.add(pc.multiply(b["user_id"],
                                                  10_000_000), h)})

    return _read(sf_dir, "events", ["user_id", "ts", "event_type"],
                 row_filter=pds.field("event_type") == event_type) \
        .map_batches(pack, batch_format="pyarrow")


def q_hours_intersect(sf_dir: str):
    """(user, hour) cells active for BOTH purchase and click — the
    distributed INTERSECT set operator."""
    return F_joins.set_op_ds(_user_hours(sf_dir, "purchase"),
                             _user_hours(sf_dir, "click"), "uh", "uh",
                             op="intersect")


def q_hours_except(sf_dir: str):
    return F_joins.set_op_ds(_user_hours(sf_dir, "purchase"),
                             _user_hours(sf_dir, "click"), "uh", "uh",
                             op="except")


def q_kg_edges_diff(sf_dir: str):
    """Snapshot diff between the even-docs-only KG edge build (the
    'base' run) and the full batch build: which edges appeared, which
    gained support.  The nightly-rebuild verification primitive — run
    it between a delta-merged graph and a batch rebuild and an empty
    result proves them identical, a non-empty one names the keys."""
    from kgforge.stages.triples import dedup_triples_ds

    res = _dict_flagship_for(sf_dir)
    trip, full = res["triples"], res["edges"]

    def even_docs(b: pa.Table) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(b["doc_id"], 5, 50),
                      pa.int64())
        return b.filter(pc.equal(pc.bit_wise_and(num, 1), 0))

    half = dedup_triples_ds(trip.map_batches(even_docs,
                                             batch_format="pyarrow"))

    def key_support(out_name: str):
        def f(b: pa.Table) -> pa.Table:
            k = pc.binary_join_element_wise(b["subj"], b["pred"],
                                            b["obj"], "\x1f")
            return pa.table({"edge_key": k,
                             out_name: pc.cast(b["support"],
                                               pa.int64())})
        return f

    return F_joins.table_diff_ds(
        half.map_batches(key_support("support_old"),
                         batch_format="pyarrow"),
        full.map_batches(key_support("support"), batch_format="pyarrow"),
        "edge_key", "edge_key", ["support_old"], ["support"])


def q_event_sessions(sf_dir: str):
    """Point-in-interval join: label every event with its session
    ordinal (intervals derived from the same stream, so coverage is
    total — the operator itself handles uncovered points with typed
    nulls, unit-tested)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    iv = F_events.session_intervals_ds(ev)
    return F_events.point_in_interval_ds(ev, iv)


def q_length_deciles(sf_dir: str):
    return F_text.value_deciles_ds(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]))


def q_value_outliers(sf_dir: str):
    return F_events.group_outliers_ds(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        q=0.99)


PROFILE_COLUMNS = ("event_id", "event_type", "user_id", "props")


def q_profile_events(sf_dir: str):
    return F_text.profile_columns_ds(
        _read(sf_dir, "events", list(PROFILE_COLUMNS)),
        list(PROFILE_COLUMNS))


SEARCH_TERMS = ("key", "table", "sort")


def q_term_search(sf_dir: str):
    return F_indexing.term_search_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        list(SEARCH_TERMS), k=20)


def q_pmi_topk(sf_dir: str):
    return F_indexing.pmi_topk_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        k=25, min_count=5)


# ---------------------------------------------------------------------------
# Registry + oracle SQL
# ---------------------------------------------------------------------------

def q_bpe_token_stats(sf_dir: str):
    """BPE-pre-tokenizer run counts (letters/digits/symbol runs) —
    the LLM token-cost proxy; identical RE2 patterns both engines."""
    from kgforge.functions.textstats import bpe_token_stats

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        bpe_token_stats, batch_format="pyarrow")


def q_doc_rarity(sf_dir: str):
    """Token-rarity quality scores (corpus-count aggregates per doc,
    exact ints + one division)."""
    from kgforge.functions.indexing import doc_rarity_ds

    return doc_rarity_ds(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_hll_distinct(sf_dir: str):
    """Approximate distinct users per event type via the mergeable
    HyperLogLog sketch (rows-only: no SQL twin can reproduce the
    md5-register estimator; accuracy vs the exact count is pytest-
    bounded and the estimate is deterministic)."""
    from kgforge.functions.sketches import hll_distinct_ds

    return hll_distinct_ds(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        key_col="event_type", value_col="user_id")


def q_semantic_dup(sf_dir: str):
    """SemDeDup-style semantic near-dedup: k-means blocking + exact
    within-cluster cosine verify (rows-only: learned blocking is
    SQL-inexpressible; bounds pytest-checked)."""
    from kgforge.functions.dedup import semantic_dup_pairs_ds

    return semantic_dup_pairs_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=8, tau=0.3)


def q_cube_hourly(sf_dir: str):
    return F_events.cube_hourly_ds(
        _read(sf_dir, "events", ["event_type", "ts", "value"]))


def q_window_rank(sf_dir: str):
    return F_events.window_rank_ds(
        _read(sf_dir, "events", ["event_id", "user_id", "value"]))


def q_basket_pairs(sf_dir: str):
    """Market-basket mining: top-25 part pairs by co-order count
    (ties → (a, b) ascending, spelled identically in the SQL twin).
    One composite-key exchange of distinct (order, part) pairs + a
    pair-keyed partial sum; the final cut folds block-level top-k
    partials on the driver."""
    import ray
    from kgforge.functions.graph import cooccur_pairs_ds

    k = 25
    pairs = cooccur_pairs_ds(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        ["l_orderkey"], "l_partkey")

    def block_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[("n_groups", "descending"),
                                            ("a", "ascending"),
                                            ("b", "ascending")])
        return b.take(idx[:k])

    parts = [t for t in ray.get(
        pairs.map_batches(block_topk, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_columns]
    flat = pa.concat_tables(parts) if parts else pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
        "n_groups": pa.array([], pa.int64())})
    idx = pc.sort_indices(flat, sort_keys=[("n_groups", "descending"),
                                           ("a", "ascending"),
                                           ("b", "ascending")])
    out = flat.take(idx[:k])
    return pa.table({"a": out["a"], "b": out["b"],
                     "n_orders": pc.cast(out["n_groups"], pa.int64())})


def q_kg_cooccur(sf_dir: str):
    """Entity co-mention graph from the dict-tagger KG lane: surface
    pairs co-occurring in a sentence, counted over sentences — the
    co-occurrence edge builder KG pipelines use alongside the rule
    extractor."""
    from kgforge.functions.graph import cooccur_pairs_ds

    ments = _dict_flagship_for(sf_dir)["mentions"].select_columns(
        ["doc_id", "sent_idx", "surface"])
    pairs = cooccur_pairs_ds(ments, ["doc_id", "sent_idx"], "surface")
    return pairs.map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"],
                            "n_sents": pc.cast(b["n_groups"],
                                               pa.int64())}),
        batch_format="pyarrow")


def q_kg_kcore(sf_dir: str):
    """Bounded-round k-core of the entity graph (k=3, 8 peels)."""
    from kgforge.functions.graph import kcore_ds

    return kcore_ds(_entity_edges_for(sf_dir), k=3, rounds=8)


def q_event_transitions(sf_dir: str):
    return F_events.event_transitions_ds(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"]))


def q_rfm_segments(sf_dir: str):
    from kgforge.functions.relational import rfm_segments_ds

    return rfm_segments_ds(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderdate", "o_totalprice"]))


def q_source_provenance(sf_dir: str):
    return F_dedup.source_provenance_ds(
        _read(sf_dir, "documents", ["text", "source"]))


def q_kg_degree_dist(sf_dir: str):
    """Degree-distribution histogram of the entity graph (the
    power-law tail check): per-batch (degree, count) partials folded
    on the driver — ≤ blocks × distinct-degree tiny rows move."""
    from kgforge.functions.graph import degree_ds

    deg = degree_ds(_entity_edges_for(sf_dir))

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["degree"]).group_by(["degree"],
                                          use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"degree": g["degree"],
                         "n_nodes": pc.cast(g["count_all"],
                                            pa.int64())})

    parts = deg.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    g = parts.groupby("degree", as_index=False)["n_nodes"].sum()
    return pa.table({
        "degree": pa.array(g["degree"].to_numpy(np.int64)),
        "n_nodes": pa.array(g["n_nodes"].to_numpy(np.int64))})


def q_compression_ratio(sf_dir: str):
    return F_text.compression_ratio_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]))


def q_next_token_topk(sf_dir: str):
    from kgforge.functions.indexing import next_token_topk_ds

    return next_token_topk_ds(
        _read(sf_dir, "documents", ["text"]))


def q_time_weighted_avg(sf_dir: str):
    return F_events.time_weighted_avg_ds(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "value"]))


def q_knn_classify(sf_dir: str):
    return F_sim.knn_classify_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
        .repartition(16), KNN_QUERY_IDS, k=KNN_K)


def q_kg_assortativity(sf_dir: str):
    from kgforge.functions.graph import assortativity_ds

    return assortativity_ds(_entity_edges_for(sf_dir))


def q_kg_edge_jaccard(sf_dir: str):
    from kgforge.functions.graph import edge_jaccard_ds

    return edge_jaccard_ds(_entity_edges_for(sf_dir))


def q_oov_rate(sf_dir: str):
    return F_text.oov_rate_ds(
        _read(sf_dir, "documents", ["text", "source"]))


def q_order_share(sf_dir: str):
    return F_events.group_share_ds(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderkey", "o_totalprice"]),
        by="o_custkey", value_col="o_totalprice",
        id_col="o_orderkey")


def q_dedup_incremental(sf_dir: str):
    """Ingest-dedup: the 20% newest docs (doc_id % 10 >= 8) checked
    against the 80% existing corpus by normalized digest."""
    import ray

    def split(which):
        def f(b: pa.Table) -> pa.Table:
            mod = pc.subtract(b["doc_id"],
                              pc.multiply(pc.divide(b["doc_id"], 10),
                                          10))
            m = pc.less(mod, 8)
            keep = m if which == "old" else pc.invert(m)
            return b.filter(keep)
        return f

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    old = docs.map_batches(split("old"), batch_format="pyarrow")
    new = docs.map_batches(split("new"), batch_format="pyarrow")
    parts = F_dedup.incremental_dedup_ds(old, new).to_pandas()
    g = parts.groupby("source", as_index=False).sum()
    return pa.table({
        "source": pa.array(g["source"], pa.string()),
        "n_new": pa.array(g["n_new"].to_numpy(np.int64)),
        "n_dup": pa.array(g["n_dup"].to_numpy(np.int64))})


def q_kg_lift(sf_dir: str):
    """Entity co-mention lift: n_ab × N × 10⁶ // (n_a × n_b) over
    sentence-distinct mention sets — the association-strength signal
    separating template co-occurrence from real affinity.  Pair and
    per-entity counts are both VOCABULARY-BOUNDED (gazetteer-sized),
    so the final integer-lift join happens on the collected tables;
    the distributed parts are the cooccur exchange and one
    surface-keyed distinct-count."""
    import ray
    from ray.data.aggregate import Sum
    from kgforge.functions.graph import cooccur_pairs_ds

    ments = _dict_flagship_for(sf_dir)["mentions"].select_columns(
        ["doc_id", "sent_idx", "surface"])
    pairs = cooccur_pairs_ds(ments, ["doc_id", "sent_idx"],
                             "surface").to_pandas()

    def sent_partial(b: pa.Table) -> pa.Table:
        g = b.select(["doc_id", "sent_idx", "surface"]).group_by(
            ["doc_id", "sent_idx", "surface"],
            use_threads=False).aggregate([])
        return g

    distinct = ments.map_batches(sent_partial, batch_format="pyarrow") \
        .groupby(["doc_id", "sent_idx", "surface"]).count() \
        .select_columns(["doc_id", "sent_idx", "surface"]) \
        .materialize()
    ec = {}
    sents = set()
    for t in ray.get(distinct.to_arrow_refs()):
        if not t.num_columns:
            continue
        for d, j, s in zip(t["doc_id"].to_pylist(),
                           t["sent_idx"].to_pylist(),
                           t["surface"].to_pylist()):
            ec[s] = ec.get(s, 0) + 1
            sents.add((d, j))
    n_total = len(sents)
    a = pairs["a"].tolist()
    b = pairs["b"].tolist()
    nab = pairs["n_groups"].to_numpy(np.int64)
    lift = [int(nab[i]) * n_total * 1_000_000
            // (ec[a[i]] * ec[b[i]]) for i in range(len(a))]
    return pa.table({
        "a": pa.array(a, pa.string()), "b": pa.array(b, pa.string()),
        "n_ab": pa.array(nab),
        "lift_ppm": pa.array(np.array(lift, dtype=np.int64))})


def q_trimmed_mean(sf_dir: str):
    return F_events.trimmed_mean_ds(
        _read(sf_dir, "events", ["event_type", "value"]))


def q_gini_by_type(sf_dir: str):
    return F_events.gini_by_type_ds(
        _read(sf_dir, "events", ["event_type", "value"]))


def q_fano_by_type(sf_dir: str):
    return F_events.fano_by_type_ds(
        _read(sf_dir, "events", ["event_type", "ts"]))


def q_token_novelty(sf_dir: str):
    return F_text.token_novelty_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]))


def q_cross_source_dups(sf_dir: str):
    return F_dedup.cross_source_dups_ds(
        _read(sf_dir, "documents", ["text", "source"]))


def q_vocab_growth(sf_dir: str):
    return F_text.vocab_growth_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]))


def q_order_gap_dist(sf_dir: str):
    return F_events.key_gap_dist_ds(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderdate", "o_orderkey"]),
        by="o_custkey", on="o_orderdate", tie="o_orderkey")


def q_large_orders(sf_dir: str):
    """TPC-H Q18 shape — orders whose total lineitem quantity exceeds
    300, top-20 by (qty desc, orderkey asc), customer name attached
    AFTER the top-k cut (≤20 keys → row-pruned dimension read).

    Scale shape: (orderkey, qty) per-batch integer partials → ONE
    orderkey cogroup against orders fuses the HAVING filter and the
    column attach (``np.add.reduceat`` over the run layout); ≤20-row
    block-level top-k partials fold on the driver — the corpus
    shuffles once, by orderkey."""
    from kgforge.functions.joins import cogroup_partition_ds

    from kgforge.common.hashing import round_away

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partial(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"k": b["l_orderkey"],
                      "q": pa.array(np.rint(q).astype(np.int64))})
        g = t.group_by(["k"], use_threads=False).aggregate([("q", "sum")])
        return pa.table({"l_orderkey": g["k"], "qty": g["q_sum"]})

    qty = li.map_batches(qty_partial, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                      "o_custkey": pa.array([], pa.int64()),
                      "total_qty": pa.array([], pa.int64()),
                      "price_cents": pa.array([], pa.int64())})

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        q = pc.fill_null(t["qty"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.add.reduceat(q, starts)
        keep = (sums > 300) & (nl > 0) & (nr > 0)
        if not keep.any():
            return empty
        ridx = pa.array((starts + nl)[keep])   # the single orders row
        price = round_away(
            t["o_totalprice"].take(ridx).combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        return pa.table({"o_orderkey": t["__k"].take(ridx),
                         "o_custkey": t["o_custkey"].take(ridx),
                         "total_qty": pa.array(sums[keep]),
                         "price_cents": pa.array(price)})

    big = cogroup_partition_ds(
        qty, orders, "l_orderkey", "o_orderkey", fuse,
        ["qty"], ["o_custkey", "o_totalprice"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("qty", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_totalprice", pa.float64())]))

    def partial_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= 20:
            return b
        ok = b["o_orderkey"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        tq = b["total_qty"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -tq))[:20]
        return b.take(pa.array(order))

    top = big.map_batches(partial_topk, batch_format="pyarrow") \
        .to_pandas()
    if not len(top):
        return pa.table({"c_name": pa.array([], pa.string()),
                         "o_orderkey": pa.array([], pa.int64()),
                         "total_qty": pa.array([], pa.int64()),
                         "price_cents": pa.array([], pa.int64())})
    top = top.sort_values(["total_qty", "o_orderkey"],
                          ascending=[False, True]).head(20)
    import pyarrow.dataset as pds
    keys = [int(k) for k in top["o_custkey"].unique()]
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"],
                 row_filter=pds.field("c_custkey").isin(keys)).to_pandas()
    m = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    return pa.table({
        "c_name": pa.array(m["c_name"], pa.string()),
        "o_orderkey": pa.array(m["o_orderkey"].to_numpy(np.int64)),
        "total_qty": pa.array(m["total_qty"].to_numpy(np.int64)),
        "price_cents": pa.array(m["price_cents"].to_numpy(np.int64))})


def q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape — suppliers that were the SOLE late shipper on
    a multi-supplier order (late = shipped > 90 days after the order
    date), top-10 by wait count.

    Scale shape: ONE orderkey cogroup joins lineitem to orders; the
    per-partition callback reduces every order vectorized (arrow
    group_by to per-(order, supplier) late flags, run-length reduceat
    for the sole-late test) and emits (suppkey, cnt) partials; the
    global count is a supplier-bounded keyed sum, names attached
    row-pruned after the driver-side top-10 cut."""
    from kgforge.functions.joins import cogroup_partition_ds

    LATE_US = np.int64(90 * 86_400_000_000)
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    empty = pa.table({"l_suppkey": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        ok = (nl > 0) & (nr > 0)
        if not ok.any():
            return empty
        ridx = (starts + nl)[ok]
        od = t["o_orderdate"].take(pa.array(ridx)).combine_chunks() \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        lstarts, lcounts = starts[ok], nl[ok]
        tot = int(lcounts.sum())
        base = np.repeat(lstarts, lcounts)
        run0 = np.concatenate([[0], np.cumsum(lcounts)[:-1]])
        idx = base + (np.arange(tot) - np.repeat(run0, lcounts))
        key_of = np.repeat(np.arange(len(lcounts)), lcounts)
        ship = t["l_shipdate"].take(pa.array(idx)).combine_chunks() \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        supp = t["l_suppkey"].take(pa.array(idx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        late = (ship > od[key_of] + LATE_US).astype(np.int64)
        g = pa.table({"k": pa.array(key_of), "s": pa.array(supp),
                      "lt": pa.array(late)}) \
            .group_by(["k", "s"], use_threads=False) \
            .aggregate([("lt", "max")])
        gk = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        gs = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        gl = g["lt_max"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(gk, kind="stable")
        gk, gs, gl = gk[order], gs[order], gl[order]
        rs = np.flatnonzero(np.concatenate([[True], gk[1:] != gk[:-1]]))
        n_supp = np.diff(np.concatenate([rs, [len(gk)]]))
        n_late = np.add.reduceat(gl, rs)
        good = (n_supp >= 2) & (n_late == 1)
        pick = np.repeat(good, n_supp) & (gl == 1)
        if not pick.any():
            return empty
        win = gs[pick]
        vc = pa.array(win).value_counts()
        return pa.table({"l_suppkey": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    counts = cogroup_partition_ds(
        li, orders, "l_orderkey", "o_orderkey", fuse,
        ["l_suppkey", "l_shipdate"], ["o_orderdate"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]))
    from ray.data.aggregate import Sum
    agg = counts.groupby("l_suppkey") \
        .aggregate(Sum("cnt", alias_name="numwait")).to_pandas()
    out_schema = pa.schema([("s_suppkey", pa.int64()),
                            ("s_name", pa.string()),
                            ("numwait", pa.int64())])
    if not len(agg):
        return out_schema.empty_table()
    agg = agg.sort_values(["numwait", "l_suppkey"],
                          ascending=[False, True]).head(10)
    import pyarrow.dataset as pds
    keys = [int(k) for k in agg["l_suppkey"]]
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"],
                row_filter=pds.field("s_suppkey").isin(keys)).to_pandas()
    m = agg.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    return pa.table({
        "s_suppkey": pa.array(m["s_suppkey"].to_numpy(np.int64)),
        "s_name": pa.array(m["s_name"], pa.string()),
        "numwait": pa.array(m["numwait"].to_numpy(np.int64))})


def q_pareto_share(sf_dir: str):
    """Revenue concentration per nation: the smallest number of
    customers covering ≥50% of the nation's order revenue, plus the
    exact ppm share at the cut — the curation-budget concentration
    curve in one row per nation.

    Scale shape: (custkey, cents) per-batch partials → one custkey
    keyed sum fused into the customer cogroup (attaches nationkey);
    the per-nation sorted cumsum runs inside |nation| dimension-
    bounded groups (each a single vectorized numpy pass over its
    customers); names attached row-pruned to the 25-row result."""
    from kgforge.functions.joins import cogroup_partition_ds

    from kgforge.common.hashing import round_away

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def rev_partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        g = pa.table({"k": b["o_custkey"], "c": pa.array(cents)}) \
            .group_by(["k"], use_threads=False).aggregate([("c", "sum")])
        return pa.table({"o_custkey": g["k"], "cents": g["c_sum"]})

    rev = orders.map_batches(rev_partial, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep = (nl > 0) & (nr > 0)
        if not keep.any():
            return pa.table({"nk": pa.array([], pa.int64()),
                             "ck": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        c = pc.fill_null(t["cents"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.add.reduceat(c, starts)[keep]
        ridx = pa.array((starts + nl)[keep])
        return pa.table({"nk": t["c_nationkey"].take(ridx),
                         "ck": t["__k"].take(ridx),
                         "cents": pa.array(sums)})

    per_cust = cogroup_partition_ds(
        rev, cust, "o_custkey", "c_custkey", fuse,
        ["cents"], ["c_nationkey"],
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_nationkey", pa.int64())]))

    def per_nation(t: pa.Table) -> pa.Table:
        nk = int(t["nk"][0].as_py())
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((k, -c))
        cum = np.cumsum(c[order])
        tot = int(cum[-1])
        cut = int(np.searchsorted(cum, (tot + 1) // 2))  # 2·cum ≥ tot
        share = int(cum[cut]) * 1_000_000 // tot
        return pa.table({"nk": pa.array([nk], pa.int64()),
                         "n_top": pa.array([cut + 1], pa.int64()),
                         "share_ppm": pa.array([share], pa.int64()),
                         "n_customers": pa.array([len(c)], pa.int64())})

    res = per_cust.groupby("nk").map_groups(
        per_nation, batch_format="pyarrow").to_pandas()
    out_schema = pa.schema([("n_name", pa.string()),
                            ("n_top", pa.int64()),
                            ("share_ppm", pa.int64()),
                            ("n_customers", pa.int64())])
    if not len(res):
        return out_schema.empty_table()
    import pyarrow.dataset as pds
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"],
                row_filter=pds.field("n_nationkey")
                .isin([int(k) for k in res["nk"]])).to_pandas()
    m = res.merge(nat, left_on="nk", right_on="n_nationkey") \
        .sort_values("n_name")
    return pa.table({
        "n_name": pa.array(m["n_name"], pa.string()),
        "n_top": pa.array(m["n_top"].to_numpy(np.int64)),
        "share_ppm": pa.array(m["share_ppm"].to_numpy(np.int64)),
        "n_customers": pa.array(m["n_customers"].to_numpy(np.int64))})


def q_dedup_representatives(sf_dir: str):
    return F_dedup.dedup_representatives_ds(
        _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]))


def q_source_dup_report(sf_dir: str):
    """Per-source duplication census; the engine's partials (≤ P ×
    sources rows) fold on the driver and the dup rate is exact
    integer ppm."""
    parts = F_dedup.source_dup_report_ds(
        _read(sf_dir, "documents", ["text", "source"])).to_pandas()
    g = parts.groupby("source", as_index=False).sum()
    nd = g["n_docs"].to_numpy(np.int64)
    nu = g["n_distinct"].to_numpy(np.int64)
    return pa.table({
        "source": pa.array(g["source"], pa.string()),
        "n_docs": pa.array(nd),
        "n_distinct": pa.array(nu),
        "dup_ppm": pa.array((nd - nu) * 1_000_000 // nd)})


def q_skyline_parts(sf_dir: str):
    """Pareto frontier of parts on (retail price min, size max) —
    block-local frontiers (bounded candidates) merged in one
    single-block task; the corpus never shuffles."""
    from kgforge.common.hashing import round_away
    from kgforge.functions.relational import skyline_ds

    def cents(b: pa.Table) -> pa.Table:
        price = b["p_retailprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "p_partkey": b["p_partkey"],
            "price_cents": pa.array(
                round_away(price * 100, 0).astype(np.int64)),
            "p_size": pc.cast(b["p_size"], pa.int64())})

    parts = _read(sf_dir, "part",
                  ["p_partkey", "p_retailprice", "p_size"]) \
        .map_batches(cents, batch_format="pyarrow")
    return skyline_ds(parts, "price_cents", "p_size", ["p_partkey"])


def q_order_count_dist(sf_dir: str):
    """TPC-H Q13 shape — distribution of orders-per-customer including
    zero-order customers.  One cogroup over (custkey, cnt) partials vs
    distinct custkeys; the per-partition histograms (≤ P × max_count
    tiny rows) fold on the driver."""
    from kgforge.functions.joins import count_distribution_ds

    parts = count_distribution_ds(
        _read(sf_dir, "customer", ["c_custkey"]), "c_custkey",
        _read(sf_dir, "orders", ["o_custkey"]), "o_custkey").to_pandas()
    g = parts.groupby("c_count", as_index=False)["freq"].sum()
    return pa.table({
        "c_count": pa.array(g["c_count"].to_numpy(np.int64)),
        "custdist": pa.array(g["freq"].to_numpy(np.int64))})


def q_dormant_customers(sf_dir: str):
    """TPC-H Q22 shape — per market segment, the count and total
    balance of customers above the global positive-balance mean with
    no RECENT order (none since 2001-01-01 — this corpus has no
    fully order-less customer).  Exact integer math:
    ``cents × n_pos > sum_pos`` on both engines; one cogroup against
    distinct recent-order custkeys, the date predicate pushed into
    the orders scan."""
    import datetime as _dt
    import pyarrow.dataset as pds
    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import dormant_above_avg_ds

    def cents(b: pa.Table) -> pa.Table:
        bal = b["c_acctbal"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_mktsegment": b["c_mktsegment"],
            "bal_cents": pa.array(
                round_away(bal * 100, 0).astype(np.int64))})

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_acctbal"]) \
        .map_batches(cents, batch_format="pyarrow")
    import ray

    recent = _read(
        sf_dir, "orders", ["o_custkey"],
        row_filter=pds.field("o_orderdate")
        >= _dt.datetime(2001, 1, 1))
    ds = dormant_above_avg_ds(
        cust, "c_custkey", "c_mktsegment", "bal_cents",
        recent, "o_custkey")
    # tiny partials (≤ P × segments rows) — typed collect so an
    # all-empty result keeps the contract columns (hour_gaps
    # precedent: Ray's groupby emits column-less 0-row blocks)
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    if not tabs:
        return pa.table({"c_mktsegment": pa.array([], pa.string()),
                         "numcust": pa.array([], pa.int64()),
                         "tot_cents": pa.array([], pa.int64())})
    parts = pa.concat_tables(tabs).to_pandas()
    g = parts.groupby("c_mktsegment", as_index=False).sum()
    return pa.table({
        "c_mktsegment": pa.array(g["c_mktsegment"], pa.string()),
        "numcust": pa.array(g["numcust"].to_numpy(np.int64)),
        "tot_cents": pa.array(g["tot_cents"].to_numpy(np.int64))})


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — supplier(s) with the maximum revenue in one
    quarter, ties all kept.  Per-batch (suppkey, cents) partials →
    one supplier-cardinality groupby, materialized once (it is
    consumed twice: max + filter); the winners (a handful of rows)
    come to the driver and the supplier dimension is read back
    row-pruned by key."""
    import datetime as _dt
    import pyarrow.dataset as pds
    import pyarrow.compute as pc
    from kgforge.common.hashing import round_away

    lo, hi = _dt.datetime(1998, 1, 1), _dt.datetime(1998, 4, 1)
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"],
               row_filter=(pds.field("l_shipdate") >= lo)
               & (pds.field("l_shipdate") < hi))

    def partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * (1.0 - disc) * 100, 0) \
            .astype(np.int64)
        g = pa.table({"s": b["l_suppkey"], "c": pa.array(cents)}) \
            .group_by(["s"], use_threads=False).aggregate([("c", "sum")])
        return pa.table({"l_suppkey": g["s"], "cents": g["c_sum"]})

    rev = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_suppkey").sum("cents").materialize()
    best = rev.max("sum(cents)")
    top = rev.filter(lambda r: r["sum(cents)"] == best).to_pandas()
    keys = [int(k) for k in top["l_suppkey"]]
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"],
                row_filter=pds.field("s_suppkey").isin(keys)) \
        .to_pandas()
    merged = sup.merge(top, left_on="s_suppkey", right_on="l_suppkey")
    return pa.table({
        "s_suppkey": pa.array(merged["s_suppkey"].to_numpy(np.int64)),
        "s_name": pa.array(merged["s_name"], pa.string()),
        "total_cents": pa.array(
            merged["sum(cents)"].to_numpy(np.int64))})


def q_promo_share(sf_dir: str):
    """TPC-H Q14 shape — monthly share of revenue from PROMO-type
    parts, exact integer ppm.  Scale plan: lineitem is combined to
    (partkey, ship-month, cents) partials inside each batch, ONE
    partkey cogroup against the part dimension attaches the promo
    flag and reduces to per-partition (month, promo, total) partials
    — ≤ months×partitions rows fold on the driver; the corpus
    shuffles once, by partkey."""
    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice",
                "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * (1.0 - disc) * 100, 0) \
            .astype(np.int64)
        ym = pc.add(pc.multiply(pc.cast(pc.year(b["l_shipdate"]),
                                        pa.int64()), 100),
                    pc.cast(pc.month(b["l_shipdate"]), pa.int64()))
        g = pa.table({"k": b["l_partkey"], "ym": ym,
                      "c": pa.array(cents)}) \
            .group_by(["k", "ym"], use_threads=False) \
            .aggregate([("c", "sum")])
        return pa.table({"l_partkey": g["k"], "ym": g["ym"],
                         "cents": g["c_sum"]})

    lp = li.map_batches(li_partial, batch_format="pyarrow")
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        from kgforge.functions.graph import _lr_indices

        lidx, _ = _lr_indices(starts, nl, nr)
        # each left row's run must have a right row (inner join);
        # right side is unique per key → the run's single part row
        run_of = np.repeat(np.arange(len(nl)), nl)
        ok = nr[run_of] > 0
        lidx = lidx[ok]
        ridx = (starts + nl)[run_of][ok]
        promo = pc.equal(t["p_type"].take(pa.array(ridx)), "PROMO") \
            .combine_chunks().to_numpy(zero_copy_only=False)
        ym = t["ym"].take(pa.array(lidx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cents"].take(pa.array(lidx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        g = pa.table({"ym": pa.array(ym),
                      "p": pa.array(np.where(promo, c, 0)),
                      "t": pa.array(c)}) \
            .group_by(["ym"], use_threads=False) \
            .aggregate([("p", "sum"), ("t", "sum")])
        return pa.table({"ym": g["ym"], "promo_cents": g["p_sum"],
                         "total_cents": g["t_sum"]})

    parts = cogroup_partition_ds(
        lp, part, "l_partkey", "p_partkey", fuse,
        ["ym", "cents"], ["p_type"],
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("ym", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_type", pa.string())])).to_pandas()
    out_schema = pa.schema([("ym", pa.int64()),
                            ("promo_cents", pa.int64()),
                            ("total_cents", pa.int64()),
                            ("promo_ppm", pa.int64())])
    if not len(parts):
        return out_schema.empty_table()
    g = parts.groupby("ym", as_index=False).sum().sort_values("ym")
    p = g["promo_cents"].to_numpy(np.int64)
    tot = g["total_cents"].to_numpy(np.int64)
    return pa.table({"ym": pa.array(g["ym"].to_numpy(np.int64)),
                     "promo_cents": pa.array(p),
                     "total_cents": pa.array(tot),
                     "promo_ppm": pa.array(p * 1_000_000 // tot)})


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — revenue locked in 'small' orders: lineitems
    whose quantity is below 20% of their part's average quantity,
    summed per brand (exact integer predicate ``5·qty·cnt < Σqty`` —
    no float average).  Scale plan: lineitem rows shuffle ONCE keyed
    by partkey (row granularity is inherent to the below-average
    predicate); the cogroup callback computes each part's Σqty/count
    with one ``np.add.reduceat``, applies the mask, and reduces to
    per-partition (brand, cents, lines) partials — ≤ brands×partitions
    rows fold on the driver."""
    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def li_proj(b: pa.Table) -> pa.Table:
        qty = np.rint(b["l_quantity"].combine_chunks()
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        cents = round_away(
            b["l_extendedprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        return pa.table({"l_partkey": b["l_partkey"],
                         "qty": pa.array(qty),
                         "cents": pa.array(cents)})

    rows = li.map_batches(li_proj, batch_format="pyarrow")
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        q = pc.fill_null(t["qty"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        c = pc.fill_null(t["cents"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        from kgforge.functions.graph import _lr_indices

        sums = np.add.reduceat(q, starts) if len(starts) else \
            np.zeros(0, np.int64)
        run_of = np.repeat(np.arange(len(nl)), nl)
        lidx, _ = _lr_indices(starts, nl, nr)
        has_part = nr[run_of] > 0
        small = q[lidx] * 5 * nl[run_of] < sums[run_of]
        keep = has_part & small
        lidx = lidx[keep]
        ridx = (starts + nl)[run_of][keep]
        brand = t["p_brand"].take(pa.array(ridx))
        g = pa.table({"b": brand, "c": pa.array(c[lidx]),
                      "n": pa.array(np.ones(len(lidx), np.int64))}) \
            .group_by(["b"], use_threads=False) \
            .aggregate([("c", "sum"), ("n", "sum")])
        return pa.table({"p_brand": g["b"], "rev_cents": g["c_sum"],
                         "n_lines": g["n_sum"]})

    parts = cogroup_partition_ds(
        rows, part, "l_partkey", "p_partkey", fuse,
        ["qty", "cents"], ["p_brand"],
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("qty", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_brand", pa.string())])).to_pandas()
    out_schema = pa.schema([("p_brand", pa.string()),
                            ("rev_cents", pa.int64()),
                            ("n_lines", pa.int64())])
    if not len(parts):
        return out_schema.empty_table()
    g = parts.groupby("p_brand", as_index=False).sum() \
        .sort_values("p_brand")
    return pa.table({
        "p_brand": pa.array(g["p_brand"], pa.string()),
        "rev_cents": pa.array(g["rev_cents"].to_numpy(np.int64)),
        "n_lines": pa.array(g["n_lines"].to_numpy(np.int64))})


def q_nation_hhi(sf_dir: str):
    """Supplier-concentration Herfindahl index per supplying nation:
    shares of shipped quantity per supplier in integer ppm (floored),
    ``hhi = Σ share_ppm² // 10⁶`` — exact in both engines (10 000 =
    monopoly... in the HHI·10⁴ scale this formula lands on ppm²/10⁶
    micro-units).  Scale plan: one combiner-first (supplier, qty)
    reduce (supplier-table-bounded output), then the dimension-LUT
    driver fold every TPC-H-shape query here uses."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        qty = np.rint(b["l_quantity"].combine_chunks()
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        g = pa.table({"s": b["l_suppkey"], "q": pa.array(qty)}) \
            .group_by(["s"], use_threads=False) \
            .aggregate([("q", "sum")])
        return pa.table({"s": g["s"], "q": g["q_sum"]})

    sq = _read(sf_dir, "lineitem", ["l_suppkey", "l_quantity"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("s").aggregate(Sum("q", alias_name="q")).to_pandas()

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]) \
        .to_pandas()
    sq = sq.merge(supp, left_on="s", right_on="s_suppkey") \
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    rows = []
    for name, g in sq.groupby("n_name", sort=True):
        q = g["q"].to_numpy(dtype=np.int64)
        t = int(q.sum())
        share = q * 1_000_000 // t
        rows.append({"n_name": name,
                     "n_suppliers": int(len(q)),
                     "total_qty": t,
                     "hhi": int((share * share).sum() // 1_000_000)})
    return pd.DataFrame(rows)


def q_dominant_supplier(sf_dir: str):
    """TPC-H Q20-adapted supply-concentration report — each part's
    leading supplier (max shipped quantity, ties → smaller suppkey)
    with its exact integer-ppm share of the part's total, parts with
    ≥ 2 shippers, top-100 by (share desc, partkey).  Scale plan:
    per-batch (partkey, suppkey, qty) integer partials → ONE partkey
    hash cogroup whose callback finishes the (part, supp) sums
    in-partition (co-located by construction), picks each part's
    max-qty supplier with a vectorized lexsort (ties → smaller
    suppkey), and emits a ≤100-row partial top-k; the driver folds
    ≤ 100×partitions rows."""
    from kgforge.functions.joins import _part_codes

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        qty = np.rint(b["l_quantity"].combine_chunks()
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        g = pa.table({"p": b["l_partkey"], "s": b["l_suppkey"],
                      "q": pa.array(qty)}) \
            .group_by(["p", "s"], use_threads=False) \
            .aggregate([("q", "sum")])
        out = pa.table({"l_partkey": g["p"], "l_suppkey": g["s"],
                        "qty": g["q_sum"]})
        return out.append_column(
            "__p", pa.array(_part_codes(out["l_partkey"], 64)))

    ps = li.map_batches(partial, batch_format="pyarrow")

    def per_partition(t: pa.Table) -> pa.Table:
        empty = pa.table({"l_partkey": pa.array([], pa.int64()),
                          "l_suppkey": pa.array([], pa.int64()),
                          "share_ppm": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.select(["l_partkey", "l_suppkey", "qty"]) \
            .group_by(["l_partkey", "l_suppkey"], use_threads=False) \
            .aggregate([("qty", "sum")])
        p = g["l_partkey"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = g["l_suppkey"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        q = g["qty_sum"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, -q, p))      # per part: qty↓, suppkey↑
        p, s, q = p[order], s[order], q[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(p[1:] != p[:-1]) + 1]).astype(np.int64)
        cnt = np.diff(np.concatenate([starts, [len(p)]]))
        tot = np.add.reduceat(q, starts)
        best = q[starts]
        keep = cnt >= 2
        if not keep.any():
            return empty
        share = best[keep] * 1_000_000 // tot[keep]
        pk, sk = p[starts[keep]], s[starts[keep]]
        cut = np.lexsort((pk, -share))[:100]
        return pa.table({"l_partkey": pa.array(pk[cut]),
                         "l_suppkey": pa.array(sk[cut]),
                         "share_ppm": pa.array(share[cut])})

    parts = ps.groupby("__p").map_groups(
        per_partition, batch_format="pyarrow").to_pandas()
    out_schema = pa.schema([("l_partkey", pa.int64()),
                            ("l_suppkey", pa.int64()),
                            ("share_ppm", pa.int64())])
    if not len(parts):
        return out_schema.empty_table()
    top = parts.sort_values(["share_ppm", "l_partkey"],
                            ascending=[False, True]).head(100)
    return pa.table({
        "l_partkey": pa.array(top["l_partkey"].to_numpy(np.int64)),
        "l_suppkey": pa.array(top["l_suppkey"].to_numpy(np.int64)),
        "share_ppm": pa.array(top["share_ppm"].to_numpy(np.int64))})


def q_ship_latency_dist(sf_dir: str):
    """Order-to-ship latency distribution — day-gap histogram between
    each lineitem's shipdate and its order's orderdate (fulfilment
    SLA census).  Scale plan: per-batch (orderkey, shipdate-day)
    COUNT partials collapse duplicate days early; ONE orderkey
    cogroup attaches the orderdate and reduces to per-partition
    (gap_days, n) histogram partials — ≤ gaps×P rows reach the final
    keyed sum; lineitem shuffles once."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import cogroup_partition_ds

    day_us = 86_400_000_000
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(b["l_shipdate"], pa.int64()),
                      pa.scalar(day_us, pa.int64()))
        g = pa.table({"k": b["l_orderkey"], "d": d,
                      "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["k", "d"], use_threads=False) \
            .aggregate([("n", "sum")])
        return pa.table({"l_orderkey": g["k"], "sday": g["d"],
                         "n": g["n_sum"]})

    lp = li.map_batches(partial, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def o_proj(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "oday": pc.divide(
                             pc.cast(b["o_orderdate"], pa.int64()),
                             pa.scalar(day_us, pa.int64()))})

    op = orders.map_batches(o_proj, batch_format="pyarrow")

    def fuse(t, starts, nl, nr):
        out = _attach_right(t, starts, nl, nr, ["sday", "n"],
                            ("oday", "oday"), ["sday", "n"])
        gap = pc.subtract(out["sday"], out["oday"])
        g = pa.table({"gap_days": gap, "n": out["n"]}) \
            .group_by(["gap_days"], use_threads=False) \
            .aggregate([("n", "sum")])
        return pa.table({"gap_days": g["gap_days"], "n": g["n_sum"]})

    return cogroup_partition_ds(
        lp, op, "l_orderkey", "o_orderkey", fuse,
        ["sday", "n"], ["oday"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("sday", pa.int64()),
                               ("n", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("oday", pa.int64())])) \
        .groupby("gap_days").aggregate(Sum("n", alias_name="n_lines"))


def q_top_terms_per_source(sf_dir: str):
    """Top-5 tokens per source (the per-corpus vocabulary snapshot):
    per-batch (source, token) count partials → one pair-keyed sum →
    one source-hash partition with a vectorized run-offset top-k cut
    (``num_partitions`` callbacks, never one per source) — the
    knn-merge pattern on a text key."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        src = b["source"].take(
            pa.array(np.repeat(np.arange(len(lens)), lens)))
        t = pa.table({"source": src,
                      "token": pc.list_flatten(toks)})
        t = t.filter(pc.not_equal(t["token"], ""))
        return t.group_by(["source", "token"],
                          use_threads=False).aggregate(
            [([], "count_all")]).rename_columns(
            ["source", "token", "n"])

    counts = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "token"]).aggregate(
            Sum("n", alias_name="n"))

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b["source"], 16)))

    def cut(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("source", "ascending"), ("n", "descending"),
            ("token", "ascending")])
        t = t.take(idx)
        codes = t["source"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1]) \
            if len(codes) else np.zeros(0, np.int64)
        lens = np.diff(np.concatenate([starts, [len(codes)]]))
        within = np.arange(len(codes)) - np.repeat(starts, lens)
        keep = within < 5
        return pa.table({
            "source": t["source"].filter(pa.array(keep)),
            "token": t["token"].filter(pa.array(keep)),
            "n": t["n"].filter(pa.array(keep)),
            "rk": pa.array((within[keep] + 1).astype(np.int64))})

    return counts.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(cut, batch_format="pyarrow")


def q_hourly_delta(sf_dir: str):
    """Hour-over-hour event-count derivative per type (gaps skipped,
    first observed hour deltas from zero — documented grain).  The
    hourly reduce is combiner-first; the lag pass is one type-hash
    partition with a global diff + run-break mask."""
    from ray.data.aggregate import Sum

    from kgforge.functions.events import _run_breaks
    from kgforge.functions.joins import _part_codes

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b["event_type"],
                      "hour_idx": pa.array(us // 3_600_000_000)})
        return t.group_by(["event_type", "hour_idx"],
                          use_threads=False).aggregate(
            [([], "count_all")]).rename_columns(
            ["event_type", "hour_idx", "n"])

    hourly = _read(sf_dir, "events", ["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour_idx"]).aggregate(
            Sum("n", alias_name="n"))

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b["event_type"], 16)))

    def lagdiff(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("event_type", "ascending"), ("hour_idx", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        v = t["n"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        brk = _run_breaks(t["event_type"].combine_chunks(),
                          np.zeros(n, dtype=np.int32))
        prev = np.concatenate([[np.int64(0)], v[:-1]]) if n else v
        prev[brk] = 0
        return pa.table({
            "event_type": t["event_type"],
            "hour_idx": t["hour_idx"], "n": pa.array(v),
            "delta": pa.array(v - prev)})

    return hourly.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(lagdiff, batch_format="pyarrow")


def q_hourly_autocorr(sf_dir: str, max_lag: int = 6):
    """Lag-k autocovariance building blocks of the GLOBAL hourly
    event-count series (missing hours count 0), k = 1..max_lag —
    the seasonality probe for event streams.  Every output is an
    exact integer (`sum_xy = Σ_h c_h·c_{h+k}` plus the window sums
    and term count), so the autocovariance/autocorrelation any
    consumer derives is reproducible bit-exactly and the SQL twin
    hashes identically.

    Scale plan: combiner-first hourly reduce (per-batch group_by →
    one small groupby; the reduce OUTPUT is calendar-bounded — ~10⁵
    hour rows per decade even at 100 TB of events), then the lag
    pass folds on the driver over that bounded vector with one
    np.dot per lag — the same bounded-driver-fold contract as
    ``open_orders_curve``."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"h": pa.array(us // 3_600_000_000)})
        return t.group_by("h", use_threads=False).aggregate(
            [([], "count_all")]).rename_columns(["h", "n"])

    hourly = _read(sf_dir, "events", ["ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("h").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    hs = hourly["h"].to_numpy(dtype=np.int64)
    cs = hourly["n"].to_numpy(dtype=np.int64)
    mn, mx = int(hs.min()), int(hs.max())
    dense = np.zeros(mx - mn + 1, dtype=np.int64)
    dense[hs - mn] = cs
    rows = []
    for k in range(1, max_lag + 1):
        rows.append({
            "lag": k,
            "n_terms": len(dense) - k,
            "sum_x": int(dense[:-k].sum()),
            "sum_y": int(dense[k:].sum()),
            "sum_xy": int(np.dot(dense[:-k], dense[k:]))})
    return pd.DataFrame(rows)


def q_cusum_changepoint(sf_dir: str):
    """CUSUM changepoint per event type over the dense global hourly
    axis: the hour t* maximizing ``|n·S_t − pos_t·S_n|`` (S = running
    sum of hourly counts, missing hours 0; ties → earliest hour).
    This is the classic mean-shift CUSUM statistic with the ``/n``
    normalization cleared to keep every value an exact integer —
    engine and SQL twin hash bit-identically.

    Scale plan: combiner-first (type, hour) reduce whose OUTPUT is
    types × calendar bounded, then one vectorized driver fold (dense
    per-type cumsum + argmax) over that bounded table — the same
    contract as ``open_orders_curve`` / ``hourly_autocorr``."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b["event_type"],
                      "h": pa.array(us // 3_600_000_000)})
        return t.group_by(["event_type", "h"],
                          use_threads=False).aggregate(
            [([], "count_all")]).rename_columns(["event_type", "h", "n"])

    hourly = _read(sf_dir, "events", ["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "h"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    mn, mx = int(hourly["h"].min()), int(hourly["h"].max())
    n = mx - mn + 1
    rows = []
    for etype, g in hourly.groupby("event_type", sort=True):
        dense = np.zeros(n, dtype=np.int64)
        dense[g["h"].to_numpy(dtype=np.int64) - mn] = \
            g["n"].to_numpy(dtype=np.int64)
        s = np.cumsum(dense)
        pos = np.arange(1, n + 1, dtype=np.int64)
        dev = np.abs(n * s - pos * s[-1])[:-1]   # last point is always 0
        t_star = int(np.argmax(dev))             # first max = earliest
        rows.append({"event_type": etype,
                     "cp_hour": mn + t_star,
                     "cusum_stat": int(dev[t_star])})
    return pd.DataFrame(rows)


def q_ewma_hourly(sf_dir: str):
    """Fixed-point EWMA anomaly detector per event type over the
    dense global hourly axis (missing hours 0, micro-unit scale
    S = 10⁶, α = 1/4 as the always-nonnegative recurrence
    ``s_t = (3·s_{t-1} + c_t·S) // 4`` so floor == truncate in both
    engines): reports the final smoothed level ``ewma_last`` and the
    largest surprise ``anom_dev = max_t |c_t·S − s_{t-1}|`` with its
    hour (earliest tie).  Sequential by definition — the SQL twin is
    a per-type recursive CTE over the same dense axis.

    Scale plan: combiner-first (type, hour) reduce whose OUTPUT is
    types × calendar bounded, then one bounded driver fold — the
    ``open_orders_curve`` / ``cusum_changepoint`` contract."""
    from ray.data.aggregate import Sum

    S = 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b["event_type"],
                      "h": pa.array(us // 3_600_000_000)})
        return t.group_by(["event_type", "h"],
                          use_threads=False).aggregate(
            [([], "count_all")]).rename_columns(["event_type", "h", "n"])

    hourly = _read(sf_dir, "events", ["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "h"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    mn, mx = int(hourly["h"].min()), int(hourly["h"].max())
    n = mx - mn + 1
    rows = []
    for etype, g in hourly.groupby("event_type", sort=True):
        dense = np.zeros(n, dtype=np.int64)
        dense[g["h"].to_numpy(dtype=np.int64) - mn] = \
            g["n"].to_numpy(dtype=np.int64)
        s = int(dense[0]) * S
        best_dev, best_pos = -1, -1           # SQL twin's sentinels
        for t in range(1, n):
            dev = abs(int(dense[t]) * S - s)
            if dev > best_dev:                # strict > keeps earliest
                best_dev, best_pos = dev, t + 1   # 1-indexed like SQL
            s = (3 * s + int(dense[t]) * S) // 4
        rows.append({"event_type": etype, "ewma_last": s,
                     "anom_hour": mn + best_pos - 1,
                     "anom_dev": best_dev})
    return pd.DataFrame(rows)


def q_peak_concurrency(sf_dir: str):
    """Peak simultaneous user sessions (30-min gap sessionization) +
    the earliest microsecond the peak is reached — see
    :func:`kgforge.functions.events.peak_concurrency_ds`."""
    from kgforge.functions.events import peak_concurrency_ds

    return peak_concurrency_ds(
        _read(sf_dir, "events", ["user_id", "ts"]))


def q_type_affinity(sf_dir: str):
    """Co-engagement matrix between event types: for every type pair
    (a < b) the exact distinct-user overlap ``(type_a, type_b,
    users_both, users_a, users_b)`` — the audience-similarity /
    cross-sell signal.  Combiner-first distinct (user, type) reduce,
    then user-hash partitions emit per-user type pairs (types are
    low-cardinality, so each user contributes ≤ T² bounded rows)
    into one tiny final groupby; the raw event stream never
    re-shuffles."""
    from ray.data.aggregate import Count, Sum

    from kgforge.functions.joins import _part_codes

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"u": b["user_id"], "t": b["event_type"]})
        return t.group_by(["u", "t"], use_threads=False).aggregate([])

    ut = _read(sf_dir, "events", ["user_id", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["u", "t"]).aggregate(Count(alias_name="__c")) \
        .materialize()

    per_type = {r["t"]: r["n"] for r in
                ut.groupby("t").aggregate(Count(alias_name="n"))
                .take_all()}                       # T rows

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["u"], "t": b["t"],
                         "__p": pa.array(_part_codes(b["u"], 32))})

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], pa.string()),
                          "type_b": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        t = t.sort_by([("u", "ascending"), ("t", "ascending")])
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return empty
        tv = t["t"].combine_chunks()
        starts = np.concatenate(
            [[0], np.flatnonzero(u[1:] != u[:-1]) + 1])
        runlen = np.diff(np.concatenate([starts, [len(u)]]))
        outs = []
        for k in np.unique(runlen):
            if k < 2:
                continue
            runs = starts[runlen == k]
            idx = runs[:, None] + np.arange(k)[None, :]
            ii, jj = np.triu_indices(int(k), 1)
            outs.append((idx[:, ii].ravel(), idx[:, jj].ravel()))
        if not outs:
            return empty
        ai = np.concatenate([o[0] for o in outs])
        bi = np.concatenate([o[1] for o in outs])
        part = pa.table({"type_a": tv.take(pa.array(ai)),
                         "type_b": tv.take(pa.array(bi)),
                         "c": pa.array(np.ones(len(ai), np.int64))})
        g = part.group_by(["type_a", "type_b"],
                          use_threads=False).aggregate([("c", "sum")])
        return pa.table({"type_a": g["type_a"],
                         "type_b": g["type_b"], "c": g["c_sum"]})

    both = ut.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(pairs, batch_format="pyarrow") \
        .groupby(["type_a", "type_b"]) \
        .aggregate(Sum("c", alias_name="users_both")).to_pandas()
    both["users_a"] = both["type_a"].map(per_type).astype(np.int64)
    both["users_b"] = both["type_b"].map(per_type).astype(np.int64)
    return both


def q_decayed_counts(sf_dir: str):
    """Exponentially time-decayed event counts per type: each event
    weighs ``10⁶ // 2^age_days`` micro-units (age relative to the
    corpus's max day; 0 beyond 19 days — the weight underflows the
    micro-unit scale), summed per type next to the raw count.  The
    freshness-weighted popularity signal, exact in both engines
    (power-of-two halving = integer shift, no float decay).

    Scale plan: one combiner-first (type, day) reduce (calendar ×
    types bounded output), then a bounded driver fold — the
    ``cusum_changepoint`` contract."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b["event_type"],
                      "day": pa.array(us // 86_400_000_000)})
        return t.group_by(["event_type", "day"],
                          use_threads=False).aggregate(
            [([], "count_all")]).rename_columns(
            ["event_type", "day", "n"])

    daily = _read(sf_dir, "events", ["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "day"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    mx = int(daily["day"].max())
    rows = []
    for etype, g in daily.groupby("event_type", sort=True):
        age = mx - g["day"].to_numpy(dtype=np.int64)
        c = g["n"].to_numpy(dtype=np.int64)
        w = np.where(age < 20, 1_000_000 // (1 << np.minimum(age, 19)),
                     0).astype(np.int64)
        rows.append({"event_type": etype,
                     "n_events": int(c.sum()),
                     "decayed_units": int((c * w).sum())})
    return pd.DataFrame(rows)


def q_late_events(sf_dir: str):
    """Out-of-order arrival QA per user — see
    :func:`kgforge.functions.events.late_events_ds`."""
    from kgforge.functions.events import late_events_ds

    return late_events_ds(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]))


def q_open_orders_curve(sf_dir: str):
    """Order-backlog concurrency curve: for every day where the count
    changes, the number of orders opened (orderdate) but not yet fully
    shipped (last lineitem shipdate) — the classic interval-stabbing
    +1/−1 delta scan.  Scale plan: per-order close day is a combiner-
    first max reduce, open/close deltas collapse to day grain
    (calendar-bounded) before the only small shuffle, and the running
    sum folds on the driver over ≤ a-few-thousand day rows."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import cogroup_partition_ds

    def ship_day(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["l_shipdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"l_orderkey": b["l_orderkey"],
                      "sday": pa.array(us // 86_400_000_000)})
        g = t.group_by("l_orderkey", use_threads=False) \
            .aggregate([("sday", "max")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "sday": g["sday_max"]})

    # per-batch partial maxima go STRAIGHT into the cogroup — the
    # cogroup already groups by orderkey, so the final max folds in
    # its callback (one shuffle total, not groupby + cogroup)
    close = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]) \
        .map_batches(ship_day, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def open_delta(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["o_orderdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"day": pa.array(us // 86_400_000_000)})
        g = t.group_by("day", use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"day": g["day"],
                         "delta": g["count_all"].cast(pa.int64())})

    def close_delta(t, starts, nl, nr):
        # left = per-batch partial maxima (≥1 row per order), right =
        # orders: semi-join + per-run max fold in one reduceat pass
        keep = (nl > 0) & (nr > 0)
        if not keep.any():
            return pa.table({"sday": pa.array([], pa.int64())})
        sd = t["sday"].combine_chunks().to_numpy(zero_copy_only=False)
        # vectorized gather of the kept runs' LEFT rows (right rows
        # sit after the left ones inside each run)
        kstarts, klens = starts[keep], nl[keep]
        seg = np.concatenate([[0], np.cumsum(klens)[:-1]])
        within = np.arange(int(klens.sum()), dtype=np.int64) \
            - np.repeat(seg, klens)
        lidx = np.repeat(kstarts, klens) + within
        mx = np.maximum.reduceat(sd[lidx], seg)
        return pa.table({"sday": pa.array(mx.astype(np.int64))})

    closed = cogroup_partition_ds(
        close, orders.map_batches(
            lambda b: b.select(["o_orderkey"]),
            batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", close_delta, ["sday"], [],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("sday", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64())]))

    def neg_delta(b: pa.Table) -> pa.Table:
        d = b["sday"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({"day": pa.array(d + 1)})
        g = t.group_by("day", use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"day": g["day"],
                         "delta": pc.multiply(
                             g["count_all"].cast(pa.int64()),
                             pa.scalar(-1, pa.int64()))})

    deltas = orders.map_batches(open_delta, batch_format="pyarrow") \
        .union(closed.map_batches(neg_delta, batch_format="pyarrow")) \
        .groupby("day").aggregate(Sum("delta", alias_name="delta")) \
        .to_pandas().sort_values("day")

    days = deltas["day"].to_numpy().astype(np.int64)
    run = np.cumsum(deltas["delta"].to_numpy().astype(np.int64))
    return rd.from_arrow(pa.table({
        "day": pa.array(days), "open_orders": pa.array(run)}))


def q_markov_stationary(sf_dir: str):
    """Stationary distribution of the event-type Markov chain — see
    :func:`kgforge.functions.events.markov_stationary_ds`."""
    from kgforge.functions.events import markov_stationary_ds

    return markov_stationary_ds(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"]), iters=4)


def _markov_stationary_sql(iters: int = 4) -> str:
    """Unrolled twin of ``markov_stationary_ds`` (same per-edge floor
    rule; dead-end types keep their mass via the EXISTS branch)."""
    sql = """
WITH o AS (SELECT user_id, event_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
           FROM events),
c AS (SELECT event_type AS prev_type, nxt AS next_type,
             CAST(count(*) AS BIGINT) AS n
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
      FROM c GROUP BY 1),
ty AS (SELECT DISTINCT event_type AS ty FROM events),
p0 AS (SELECT ty, CAST(1000000 AS BIGINT) AS w FROM ty)"""
    for s in range(1, iters + 1):
        sql += f""",
p{s} AS (SELECT tyl.ty,
        CAST(coalesce((SELECT sum(pp.w * c.n // t.tot)
                       FROM p{s - 1} pp
                       JOIN c ON c.prev_type = pp.ty
                       JOIN t ON t.prev_type = pp.ty
                       WHERE c.next_type = tyl.ty), 0)
             + CASE WHEN EXISTS (SELECT 1 FROM t
                                 WHERE t.prev_type = tyl.ty)
                    THEN 0
                    ELSE (SELECT w FROM p{s - 1} x
                          WHERE x.ty = tyl.ty) END
             AS BIGINT) AS w
    FROM ty tyl)"""
    return sql + f"""
SELECT ty AS event_type, w AS weight FROM p{iters}
"""


def q_kg_type_matrix(sf_dir: str):
    """Entity-type adjacency matrix: deduped-edge counts per
    (subj_type, obj_type), ``mentions`` provenance edges excluded —
    the one-page KG composition report.  One groupby at type grain
    (bounded by the type vocabulary)."""
    from ray.data.aggregate import Count

    edges = _dict_flagship_for(sf_dir)["edges"]

    def proj(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b["pred"], "mentions"))
        return pa.table({"subj_type": b["subj_type"].filter(keep),
                         "obj_type": b["obj_type"].filter(keep)})

    return edges.map_batches(proj, batch_format="pyarrow") \
        .groupby(["subj_type", "obj_type"]) \
        .aggregate(Count(alias_name="n_edges"))


def q_dow_profile(sf_dir: str):
    """Weekly seasonality profile: event count + exact value cents per
    (day-of-week, hour) cell — a 168-row reduce with the per-batch
    combiner doing the heavy lifting (cells, never events, shuffle)."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        days = us // 86_400_000_000
        dow = (days + 4) % 7          # epoch day 0 = Thursday; Sun = 0
        hour = us // 3_600_000_000 % 24
        cents = round_away(
            b["value"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        t = pa.table({"dow": pa.array(dow), "hour": pa.array(hour),
                      "cents": pa.array(cents)})
        g = t.group_by(["dow", "hour"], use_threads=False).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return pa.table({"dow": g["dow"], "hour": g["hour"],
                         "c": g["cents_sum"],
                         "n": g["cents_count"].cast(pa.int64())})

    return _read(sf_dir, "events", ["ts", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["dow", "hour"]) \
        .aggregate(Sum("n", alias_name="n_events"),
                   Sum("c", alias_name="sum_value_cents"))


def q_coverage_topk(sf_dir: str):
    """Tokenizer-vocabulary coverage curve: the share of ALL token
    occurrences covered by the top-{100, 1000, 10000} tokens (the
    make-or-buy signal for vocab size), exact integer ppm.  Scale
    plan: the count shuffle is the vocab combiner plan (distinct
    tokens only), the corpus total is one streaming sum, and only the
    10k-row head reaches the driver for the prefix fold."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    counts = _read(sf_dir, "documents", ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n")) \
        .materialize()
    total = int(counts.sum("n") or 0)
    ks = (100, 1000, 10000)
    head = counts.sort(["n", "token"], descending=[True, False]) \
        .limit(max(ks)).to_pandas()["n"].to_numpy()
    cum = np.cumsum(head)
    covered = [int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
               for k in ks]
    return rd.from_arrow(pa.table({
        "k": pa.array(ks, pa.int64()),
        "covered": pa.array(covered, pa.int64()),
        "total": pa.array([total] * len(ks), pa.int64()),
        "coverage_ppm": pa.array(
            [c * 1_000_000 // max(total, 1) for c in covered],
            pa.int64())}))


def q_scd_intervals(sf_dir: str):
    """SCD2 validity intervals per user — see
    :func:`kgforge.functions.events.scd_intervals_ds`."""
    from kgforge.functions.events import scd_intervals_ds

    return scd_intervals_ds(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]))


def q_reading_ease(sf_dir: str):
    """Integer Flesch-style readability per doc — see
    :func:`kgforge.functions.textstats.reading_ease_ds`."""
    return F_text.reading_ease_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]))


def q_returns_revenue(sf_dir: str):
    """TPC-H Q10 shape — top-20 customers by revenue lost to returned
    lines, with customer and nation names.  Scale plan: lineitem is
    returnflag-pruned at the scan, ONE hash cogroup attaches the order
    owner, the per-customer reduce rides the groupby, and only the
    20-row cut touches the driver — the name/nation decoration is an
    id-pruned dimension fetch on that bounded result, never a join of
    the big side."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"],
               row_filter=pds.field("l_returnflag") == "R")

    def to_cents(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * (1.0 - disc) * 100, 0) \
            .astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "cents": pa.array(cents)})

    lp = li.map_batches(to_cents, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def attach(t, starts, nl, nr):
        return _attach_right(t, starts, nl, nr, ["cents"],
                             ("o_custkey", "o_custkey"), ["cents"])

    top = cogroup_partition_ds(
        lp, orders, "l_orderkey", "o_orderkey", attach,
        ["cents"], ["o_custkey"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())])) \
        .groupby("o_custkey").aggregate(Sum("cents",
                                            alias_name="rev_cents")) \
        .sort(["rev_cents", "o_custkey"],
              descending=[True, False]).limit(20).to_pandas()

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=pds.field("c_custkey").isin(
            top["o_custkey"].tolist())).to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey") \
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey") \
        .sort_values(["rev_cents", "c_custkey"],
                     ascending=[False, True])
    return pa.table({
        "c_custkey": pa.array(out["c_custkey"], pa.int64()),
        "c_name": pa.array(out["c_name"], pa.string()),
        "n_name": pa.array(out["n_name"], pa.string()),
        "rev_cents": pa.array(out["rev_cents"], pa.int64())})


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — revenue delta from a hypothetical discount
    change: one-year ship window, a discount band, a quantity cap,
    ``sum(extendedprice * discount)`` in exact cents.  Scale plan: ALL
    three predicates push into the parquet scan (row groups outside
    the year/band never leave storage), the map emits one partial-sum
    row per batch, and the only reduction is the tiny fold — zero
    shuffle at any size."""
    import datetime as dt

    import pyarrow.dataset as pds
    import ray.data as rd

    from kgforge.common.hashing import round_away

    f = ((pds.field("l_shipdate") >= dt.datetime(1996, 1, 1))
         & (pds.field("l_shipdate") < dt.datetime(1997, 1, 1))
         & (pds.field("l_discount") >= 0.05)
         & (pds.field("l_discount") <= 0.07)
         & (pds.field("l_quantity") < 24))
    li = _read(sf_dir, "lineitem",
               ["l_extendedprice", "l_discount"], row_filter=f)

    def partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * disc * 100, 0).astype(np.int64)
        return pa.table({"c": pa.array([int(cents.sum())], pa.int64())})

    total = li.map_batches(partial, batch_format="pyarrow").sum("c")
    return rd.from_arrow(pa.table({
        "revenue_cents": pa.array([int(total or 0)], pa.int64())}))


def q_knn_graph(sf_dir: str):
    """Exact cosine kNN graph via the blocked self-join — see
    :func:`kgforge.functions.simsearch.knn_graph_ds`."""
    return F_sim.knn_graph_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .repartition(8), k=3, n_blocks=4)


def q_lm_perplexity(sf_dir: str):
    """Per-doc char-bigram LM quality score (perplexity-filter shape)
    — see :func:`kgforge.functions.textstats.bigram_lm_score_ds`."""
    return F_text.bigram_lm_score_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]))


def q_zipf_slope(sf_dir: str):
    """Zipf's-law fit: OLS slope of ln(frequency) vs ln(rank) over the
    top-1000 corpus tokens, in exact integer ppm (a healthy natural
    corpus sits near -1.0; template/spam corpora flatten).  Scale
    plan: the token-count shuffle is the vocab_topk combiner plan
    (per-batch value_counts partials, distinct tokens only); the
    top-1000 cut is the only driver collection (bounded by
    construction) and the regression runs in arbitrary-precision
    Python ints over ``round(ln(x) * 1e6)`` coordinates — the same
    scaled-log grid the SQL twin computes, both engines calling the
    platform libm on identical integer inputs.  Division truncates
    toward zero, matching DuckDB ``//``."""
    import math

    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    top = _read(sf_dir, "documents", ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n")) \
        .sort(["n", "token"], descending=[True, False]).limit(1000) \
        .to_pandas()

    def slog(v: int) -> int:
        # round-half-away-from-zero of ln(v) * 1e6 (ln(v) >= 0 here)
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    xs = [slog(r) for r in range(1, len(top) + 1)]
    ys = [slog(int(v)) for v in top["n"]]
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = k * sxy - sx * sy, k * sxx - sx * sx
    if den == 0:
        ppm = 0
    else:
        scaled = num * 1_000_000
        sign = -1 if (scaled < 0) != (den < 0) else 1
        ppm = sign * (abs(scaled) // abs(den))
    return rd.from_arrow(pa.table({
        "n_ranks": pa.array([k], pa.int64()),
        "slope_ppm": pa.array([ppm], pa.int64())}))


# (brand, size_lo, size_hi, qty_lo, qty_hi) — shared verbatim with the
# SQL twin so the disjunction can never drift between engines
Q19_BANDS = (("Brand#1", 1, 5, 1, 11),
             ("Brand#2", 1, 10, 10, 20),
             ("Brand#3", 1, 15, 20, 30))


def q_band_revenue(sf_dir: str):
    """TPC-H Q19 shape — revenue from lineitems matching ANY of three
    disjunctive (brand, size-range, quantity-range) bands, exact
    integer cents.  Scale plan: part is brand-pruned AT THE SCAN (row
    groups outside the three brands never leave storage) and the
    surviving (partkey, brand, size) triple — a few % of an
    already-small dimension table — is broadcast once via ``ray.put``;
    the lineitem pass is one streaming ``searchsorted`` probe + band
    mask per batch, emitting one partial-sum row per batch.  No
    shuffle at any size: the only reduction is the ≤1-row-per-batch
    partial fold."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from kgforge.common.hashing import round_away

    brands = [b[0] for b in Q19_BANDS]
    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand",
                                           "p_size"],
        filters=pds.field("p_brand").isin(brands))
    pk = part["p_partkey"].to_numpy()
    order = np.argsort(pk, kind="stable")
    pk = pk[order]
    bcode = np.searchsorted(
        np.array(brands), part["p_brand"].to_numpy(zero_copy_only=False)
    )[order].astype(np.int64)
    psize = part["p_size"].to_numpy().astype(np.int64)[order]
    side = ray.put((pk, bcode, psize))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])

    def partial(b: pa.Table, _s=side) -> pa.Table:
        pk_s, bc_s, sz_s = ray.get(_s)
        lpk = b["l_partkey"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        if len(pk_s) == 0:
            pos_c = np.zeros(len(lpk), np.int64)
            found = np.zeros(len(lpk), bool)
        else:
            pos_c = np.minimum(np.searchsorted(pk_s, lpk),
                               len(pk_s) - 1)
            found = pk_s[pos_c] == lpk
        qty = b["l_quantity"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        keep = np.zeros(len(lpk), dtype=bool)
        for i, (_, slo, shi, qlo, qhi) in enumerate(Q19_BANDS):
            keep |= (found & (bc_s[pos_c] == i)
                     & (sz_s[pos_c] >= slo) & (sz_s[pos_c] <= shi)
                     & (qty >= qlo) & (qty <= qhi))
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * (1.0 - disc) * 100, 0) \
            .astype(np.int64)
        return pa.table({"c": pa.array([int(cents[keep].sum())],
                                       pa.int64())})

    total = li.map_batches(partial, batch_format="pyarrow").sum("c")
    return rd.from_arrow(pa.table({
        "revenue_cents": pa.array([int(total or 0)], pa.int64())}))


def q_stitch_pairs(sf_dir: str):
    """Boundary-stitch detection: document pairs where A's LAST 4
    whitespace tokens equal B's FIRST 4 (a doc split across shards
    leaves exactly this seam — a chunking/ingest debugging census).
    Scale plan: per-doc head and tail md5-u64 digests (two string
    joins + the DuckDB md5 kernel per batch), ONE digest-keyed
    cogroup where tails meet heads; pairs expand with run index math
    inside the partition.  Self-stitches (A = B) are dropped; the
    corpus never shuffles, only (digest, id) rows."""
    from kgforge.common.hashing import md5_u64_arr
    from kgforge.functions.joins import cogroup_partition_ds

    k = 4
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def digest(b: pa.Table, side: str, out_col: str) -> pa.Table:
        ids = b["doc_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [(t or "").split(" ")
                for t in b["text"].to_pylist()]
        keep = np.array([len(ws) >= k for ws in toks], dtype=bool)
        if not keep.any():
            return pa.table({"h": pa.array([], pa.uint64()),
                             out_col: pa.array([], pa.int64())})
        seg = [" ".join(ws[-k:] if side == "tail" else ws[:k])
               for ws, kp in zip(toks, keep) if kp]
        return pa.table({"h": pa.array(md5_u64_arr(seg), pa.uint64()),
                         out_col: pa.array(ids[keep])})

    tails = docs.map_batches(lambda b: digest(b, "tail", "doc_a"),
                             batch_format="pyarrow")
    heads = docs.map_batches(lambda b: digest(b, "head", "doc_b"),
                             batch_format="pyarrow")

    def pair(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep = (nl > 0) & (nr > 0)
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        if not keep.any():
            return empty
        # cross product per run: tail docs × head docs
        av = pc.fill_null(t["doc_a"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        bv = pc.fill_null(t["doc_b"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        m = nl[keep] * nr[keep]
        tot = int(m.sum())
        kofs = np.repeat(np.arange(len(m)), m)
        j = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        j1 = j // nr[keep][kofs]
        j2 = j % nr[keep][kofs]
        ls = starts[keep]
        rs = (starts + nl)[keep]
        a = av[ls[kofs] + j1]
        b = bv[rs[kofs] + j2]
        ok = a != b
        return pa.table({"doc_a": pa.array(a[ok]),
                         "doc_b": pa.array(b[ok])}) \
            .group_by(["doc_a", "doc_b"], use_threads=False) \
            .aggregate([]).select(["doc_a", "doc_b"])

    res = cogroup_partition_ds(
        tails, heads, "h", "h", pair, ["doc_a"], ["doc_b"],
        left_schema=pa.schema([("h", pa.uint64()),
                               ("doc_a", pa.int64())]),
        right_schema=pa.schema([("h", pa.uint64()),
                                ("doc_b", pa.int64())])).to_pandas()
    # typed collect: a seam census is pair-bounded by construction,
    # and an all-empty Dataset would lose its schema (hour_gaps
    # precedent)
    out_schema = pa.schema([("doc_a", pa.int64()),
                            ("doc_b", pa.int64())])
    if not len(res):
        return out_schema.empty_table()
    return pa.table({
        "doc_a": pa.array(res["doc_a"].to_numpy(np.int64)),
        "doc_b": pa.array(res["doc_b"].to_numpy(np.int64))})


def q_winnow_pairs(sf_dir: str):
    return F_dedup.winnow_pairs_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]))


def q_first_touch(sf_dir: str):
    return F_events.first_touch_ds(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"]))


def q_nation_profit(sf_dir: str):
    """TPC-H Q9 shape — profit per (supplier nation, order year) with
    supply cost proxied at 10% of the part's retail price (no
    partsupp table in this corpus):
    ``profit = disc_cents − qty · retail_cents // 10`` per line,
    exact integers end-to-end.  Scale plan: three cogroups each
    keyed on a different join key (partkey → suppkey → orderkey),
    each attaching one dimension column and re-combining so the
    stream shrinks monotonically; per-partition (nation, year)
    partials — ≤ 25×years rows each — fold on the driver."""
    import pyarrow.parquet as pq

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    n_name = dict(zip(nation["n_nationkey"].to_pylist(),
                      nation["n_name"].to_pylist()))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"])

    def li_proj(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        qty = np.rint(b["l_quantity"].combine_chunks()
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        cents = round_away(price * (1.0 - disc) * 100, 0) \
            .astype(np.int64)
        return pa.table({"l_partkey": b["l_partkey"],
                         "l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "qty": pa.array(qty),
                         "disc_cents": pa.array(cents)})

    lp = li.map_batches(li_proj, batch_format="pyarrow")
    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])

    def attach_cost(t, starts, nl, nr):
        out = _attach_right(
            t, starts, nl, nr,
            ["l_orderkey", "l_suppkey", "qty", "disc_cents"],
            ("p_retailprice", "retail"),
            ["l_orderkey", "l_suppkey", "qty", "disc_cents"])
        retail = round_away(
            out["retail"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        qty = out["qty"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        dc = out["disc_cents"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        profit = dc - qty * retail // 10
        return pa.table({"l_orderkey": out["l_orderkey"],
                         "l_suppkey": out["l_suppkey"],
                         "profit": pa.array(profit)})

    li_c = cogroup_partition_ds(
        lp, part, "l_partkey", "p_partkey", attach_cost,
        ["l_orderkey", "l_suppkey", "qty", "disc_cents"],
        ["p_retailprice"],
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("qty", pa.int64()),
                               ("disc_cents", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_retailprice", pa.float64())]))

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def attach_nat(t, starts, nl, nr):
        out = _attach_right(t, starts, nl, nr,
                            ["l_orderkey", "profit"],
                            ("s_nationkey", "s_nat"),
                            ["l_orderkey", "profit"])
        g = out.group_by(["l_orderkey", "s_nat"], use_threads=False) \
            .aggregate([("profit", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "s_nat": pc.cast(g["s_nat"], pa.int32()),
                         "profit": g["profit_sum"]})

    li_n = cogroup_partition_ds(
        li_c, sup, "l_suppkey", "s_suppkey", attach_nat,
        ["l_orderkey", "profit"], ["s_nationkey"],
        left_schema=pa.schema([("l_suppkey", pa.int64()),
                               ("l_orderkey", pa.int64()),
                               ("profit", pa.int64())]),
        right_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("s_nationkey", pa.int32())]))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def o_proj(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "yr": pc.cast(pc.year(b["o_orderdate"]),
                                       pa.int64())})

    op = orders.map_batches(o_proj, batch_format="pyarrow")

    def fuse(t, starts, nl, nr):
        out = _attach_right(t, starts, nl, nr, ["s_nat", "profit"],
                            ("yr", "yr"), ["s_nat", "profit"])
        g = out.group_by(["s_nat", "yr"], use_threads=False) \
            .aggregate([("profit", "sum")])
        return pa.table({"s_nat": pc.cast(g["s_nat"], pa.int32()),
                         "yr": g["yr"], "profit": g["profit_sum"]})

    parts = cogroup_partition_ds(
        li_n, op, "l_orderkey", "o_orderkey", fuse,
        ["s_nat", "profit"], ["yr"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("s_nat", pa.int32()),
                               ("profit", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("yr", pa.int64())])).to_pandas()
    out_schema = pa.schema([("n_name", pa.string()),
                            ("o_year", pa.int64()),
                            ("profit_cents", pa.int64())])
    if not len(parts):
        return out_schema.empty_table()
    g = parts.groupby(["s_nat", "yr"], as_index=False).sum()
    g["n_name"] = [n_name[int(k)] for k in g["s_nat"]]
    g = g.sort_values(["n_name", "yr"])
    return pa.table({
        "n_name": pa.array(g["n_name"], pa.string()),
        "o_year": pa.array(g["yr"].to_numpy(np.int64)),
        "profit_cents": pa.array(g["profit"].to_numpy(np.int64))})


def q_fertility_by_lang(sf_dir: str):
    return F_text.fertility_by_lang_ds(
        _read(sf_dir, "documents", ["text", "lang"]))


def q_session_length_dist(sf_dir: str):
    return F_events.session_length_dist_ds(
        _read(sf_dir, "events", ["user_id", "ts"]))


def q_late_priority(sf_dir: str):
    """TPC-H Q4 shape — EXISTS semantics: orders with at least one
    lineitem shipped > 60 days after the order date, counted per
    priority.  Scale plan: the EXISTS collapses to a per-order MAX
    shipdate — per-batch (orderkey, max) partials → ONE orderkey
    cogroup against orders where a segment max + one compare decide
    the predicate and the count reduces to per-partition
    (priority, n) partials — ≤ 5×P rows fold on the driver."""
    from kgforge.functions.joins import cogroup_partition_ds

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"k": b["l_orderkey"],
                      "s": pc.cast(b["l_shipdate"], pa.int64())})
        g = t.group_by(["k"], use_threads=False).aggregate([("s", "max")])
        return pa.table({"l_orderkey": g["k"], "maxship": g["s_max"]})

    mx = li.map_batches(partial, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_proj(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "odate": pc.cast(b["o_orderdate"], pa.int64()),
                         "o_orderpriority": b["o_orderpriority"]})

    op = orders.map_batches(o_proj, batch_format="pyarrow")
    sixty_days_us = 60 * 86_400 * 1_000_000

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        sent = np.int64(-(2 ** 62))
        s = pc.fill_null(t["maxship"], int(sent)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        maxs = np.maximum.reduceat(s, starts)       # right rows = sentinel
        keep = (nl > 0) & (nr > 0)
        if not keep.any():
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ridx = (starts + nl)[keep]
        odate = t["odate"].take(pa.array(ridx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        late = maxs[keep] > odate + sixty_days_us
        pri = t["o_orderpriority"].take(pa.array(ridx[late]))
        g = pa.table({"p": pri,
                      "n": pa.array(np.ones(int(late.sum()), np.int64))}) \
            .group_by(["p"], use_threads=False).aggregate([("n", "sum")])
        return pa.table({"o_orderpriority": g["p"], "n": g["n_sum"]})

    parts = cogroup_partition_ds(
        mx, op, "l_orderkey", "o_orderkey", fuse,
        ["maxship"], ["odate", "o_orderpriority"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("maxship", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("odate", pa.int64()),
                                ("o_orderpriority", pa.string())])) \
        .to_pandas()
    out_schema = pa.schema([("o_orderpriority", pa.string()),
                            ("n_orders", pa.int64())])
    if not len(parts):
        return out_schema.empty_table()
    g = parts.groupby("o_orderpriority", as_index=False).sum() \
        .sort_values("o_orderpriority")
    return pa.table({
        "o_orderpriority": pa.array(g["o_orderpriority"], pa.string()),
        "n_orders": pa.array(g["n"].to_numpy(np.int64))})


def q_mad_outliers(sf_dir: str):
    return F_events.mad_outliers_ds(
        _read(sf_dir, "events", ["event_type", "value"]))


def q_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape — bilateral trade volume: revenue shipped
    between NATION_1 and NATION_2 (either direction) per ship-year.
    Scale plan: nation rides a driver LUT; supplier and customer are
    read row-pruned to the two nations; lineitem projects to
    (orderkey, suppkey, year, cents) and its FIRST cogroup (by
    suppkey, vs the pruned supplier side) drops ~23/25 of the corpus
    before the second cogroup by orderkey attaches the customer
    nation; per-partition (s_nat, c_nat, year) partials — ≤ 2×2×years
    rows each — fold on the driver."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    n_key = dict(zip(nation["n_name"].to_pylist(),
                     nation["n_nationkey"].to_pylist()))
    pair = [n_key["NATION_1"], n_key["NATION_2"]]
    n_name = {v: k for k, v in n_key.items()}

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"],
                row_filter=pds.field("s_nationkey").isin(pair))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"],
                 row_filter=pds.field("c_nationkey").isin(pair))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def order_nat(t, starts, nl, nr):
        return _attach_right(t, starts, nl, nr, ["o_orderkey"],
                             ("c_nationkey", "c_nat"), ["o_orderkey"])

    orders_nat = cogroup_partition_ds(
        orders, cust, "o_custkey", "c_custkey", order_nat,
        ["o_orderkey"], ["c_nationkey"],
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_nationkey", pa.int32())]))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount"])

    def li_proj(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * (1.0 - disc) * 100, 0) \
            .astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "yr": pc.cast(pc.year(b["l_shipdate"]),
                                       pa.int64()),
                         "cents": pa.array(cents)})

    lp = li.map_batches(li_proj, batch_format="pyarrow")

    def li_snat(t, starts, nl, nr):
        return _attach_right(
            t, starts, nl, nr, ["l_orderkey", "yr", "cents"],
            ("s_nationkey", "s_nat"), ["l_orderkey", "yr", "cents"])

    li_n = cogroup_partition_ds(
        lp, sup, "l_suppkey", "s_suppkey", li_snat,
        ["l_orderkey", "yr", "cents"], ["s_nationkey"],
        left_schema=pa.schema([("l_suppkey", pa.int64()),
                               ("l_orderkey", pa.int64()),
                               ("yr", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("s_nationkey", pa.int32())]))

    def fuse(t, starts, nl, nr):
        out = _attach_right(t, starts, nl, nr,
                            ["yr", "cents", "s_nat"],
                            ("c_nat", "c_nat"),
                            ["yr", "cents", "s_nat"])
        out = out.filter(pc.invert(pc.equal(
            pc.cast(out["s_nat"], pa.int32()),
            pc.cast(out["c_nat"], pa.int32()))))
        g = out.group_by(["s_nat", "c_nat", "yr"], use_threads=False) \
            .aggregate([("cents", "sum")])
        return pa.table({"s_nat": pc.cast(g["s_nat"], pa.int32()),
                         "c_nat": pc.cast(g["c_nat"], pa.int32()),
                         "yr": g["yr"],
                         "cents": g["cents_sum"]})

    parts = cogroup_partition_ds(
        li_n, orders_nat, "l_orderkey", "o_orderkey", fuse,
        ["yr", "cents", "s_nat"], ["c_nat"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("yr", pa.int64()),
                               ("cents", pa.int64()),
                               ("s_nat", pa.int32())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("c_nat", pa.int32())])).to_pandas()
    out_schema = pa.schema([("supp_nation", pa.string()),
                            ("cust_nation", pa.string()),
                            ("l_year", pa.int64()),
                            ("rev_cents", pa.int64())])
    if not len(parts):
        return out_schema.empty_table()
    g = parts.groupby(["s_nat", "c_nat", "yr"], as_index=False).sum()
    g["supp_nation"] = [n_name[int(k)] for k in g["s_nat"]]
    g["cust_nation"] = [n_name[int(k)] for k in g["c_nat"]]
    g = g.sort_values(["supp_nation", "cust_nation", "yr"])
    return pa.table({
        "supp_nation": pa.array(g["supp_nation"], pa.string()),
        "cust_nation": pa.array(g["cust_nation"], pa.string()),
        "l_year": pa.array(g["yr"].to_numpy(np.int64)),
        "rev_cents": pa.array(g["cents"].to_numpy(np.int64))})


def q_market_share(sf_dir: str):
    """TPC-H Q8 shape — NATION_3's supplier share of the AMERICA
    ECONOMY-part market per order-year, exact integer ppm.  Scale
    plan: part is read row-pruned to the one type and lineitem's
    FIRST cogroup (by partkey) keeps only those lines; the second
    cogroup attaches the supplier nation; orders are cogrouped with
    AMERICA-pruned customers, and the third cogroup reduces to
    per-partition (year, nation_cents, total_cents) partials —
    ≤ years rows each — folded on the driver."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    amer_key = {k for k, r in zip(region["r_regionkey"].to_pylist(),
                                  region["r_name"].to_pylist())
                if r == "AMERICA"}
    amer_nations = [k for k, r in zip(nation["n_nationkey"].to_pylist(),
                                      nation["n_regionkey"].to_pylist())
                    if r in amer_key]
    target = dict(zip(nation["n_name"].to_pylist(),
                      nation["n_nationkey"].to_pylist()))["NATION_3"]

    part = _read(sf_dir, "part", ["p_partkey"],
                 row_filter=pds.field("p_type") == "ECONOMY")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"])

    def li_proj(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * (1.0 - disc) * 100, 0) \
            .astype(np.int64)
        return pa.table({"l_partkey": b["l_partkey"],
                         "l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "cents": pa.array(cents)})

    lp = li.map_batches(li_proj, batch_format="pyarrow")

    def keep_econ(t, starts, nl, nr):
        return _attach_right(
            t, starts, nl, nr, ["l_orderkey", "l_suppkey", "cents"],
            ("__k", "pk"), ["l_orderkey", "l_suppkey", "cents"]) \
            .select(["l_orderkey", "l_suppkey", "cents"])

    li_e = cogroup_partition_ds(
        lp, part, "l_partkey", "p_partkey", keep_econ,
        ["l_orderkey", "l_suppkey", "cents"], [],
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64())]))

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def li_snat(t, starts, nl, nr):
        return _attach_right(
            t, starts, nl, nr, ["l_orderkey", "cents"],
            ("s_nationkey", "s_nat"), ["l_orderkey", "cents"])

    li_s = cogroup_partition_ds(
        li_e, sup, "l_suppkey", "s_suppkey", li_snat,
        ["l_orderkey", "cents"], ["s_nationkey"],
        left_schema=pa.schema([("l_suppkey", pa.int64()),
                               ("l_orderkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("s_nationkey", pa.int32())]))

    cust = _read(sf_dir, "customer", ["c_custkey"],
                 row_filter=pds.field("c_nationkey").isin(amer_nations))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def o_proj(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"],
                         "yr": pc.cast(pc.year(b["o_orderdate"]),
                                       pa.int64())})

    op = orders.map_batches(o_proj, batch_format="pyarrow")

    def keep_amer(t, starts, nl, nr):
        return _attach_right(
            t, starts, nl, nr, ["o_orderkey", "yr"],
            ("__k", "ck"), ["o_orderkey", "yr"]) \
            .select(["o_orderkey", "yr"])

    orders_a = cogroup_partition_ds(
        op, cust, "o_custkey", "c_custkey", keep_amer,
        ["o_orderkey", "yr"], [],
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("o_orderkey", pa.int64()),
                               ("yr", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64())]))

    def fuse(t, starts, nl, nr):
        out = _attach_right(t, starts, nl, nr, ["cents", "s_nat"],
                            ("yr", "yr"), ["cents", "s_nat"])
        c = out["cents"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        is_t = pc.equal(pc.cast(out["s_nat"], pa.int64()),
                        int(target)).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        g = pa.table({"yr": out["yr"],
                      "n": pa.array(np.where(is_t, c, 0)),
                      "t": pa.array(c)}) \
            .group_by(["yr"], use_threads=False) \
            .aggregate([("n", "sum"), ("t", "sum")])
        return pa.table({"yr": g["yr"], "nation_cents": g["n_sum"],
                         "total_cents": g["t_sum"]})

    parts = cogroup_partition_ds(
        li_s, orders_a, "l_orderkey", "o_orderkey", fuse,
        ["cents", "s_nat"], ["yr"],
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("cents", pa.int64()),
                               ("s_nat", pa.int32())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("yr", pa.int64())])).to_pandas()
    out_schema = pa.schema([("o_year", pa.int64()),
                            ("nation_cents", pa.int64()),
                            ("total_cents", pa.int64()),
                            ("share_ppm", pa.int64())])
    if not len(parts):
        return out_schema.empty_table()
    g = parts.groupby("yr", as_index=False).sum().sort_values("yr")
    n = g["nation_cents"].to_numpy(np.int64)
    tot = g["total_cents"].to_numpy(np.int64)
    return pa.table({"o_year": pa.array(g["yr"].to_numpy(np.int64)),
                     "nation_cents": pa.array(n),
                     "total_cents": pa.array(tot),
                     "share_ppm": pa.array(n * 1_000_000 // tot)})




# ---------------------------------------------------------------------------
# Round-5 session additions: BM25 retrieval + three TPC-H-adapted shapes
# ---------------------------------------------------------------------------

def q_bm25_topk(sf_dir: str):
    """Okapi BM25 top-20 docs for the shared 3-term query set.  N and
    Σdl come from a column-pruned metadata read; the match pass ships
    only fixed tf slots for matched docs (corpus text never leaves the
    scan); ranking folds per-batch top-k partials on the driver."""
    from kgforge.functions.indexing import bm25_topk_ds

    meta = _read(sf_dir, "documents", ["n_chars"])
    n_docs = meta.count()
    sum_dl = int(_read(sf_dir, "documents", ["n_chars"]).sum("n_chars"))
    return bm25_topk_ds(
        _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]),
        terms=SEARCH_TERMS, n_docs=n_docs, sum_dl=sum_dl)


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape: parts whose exact-cents revenue exceeds a
    fixed fraction (1/2000) of GLOBAL revenue — the global-threshold
    broadcast pattern.  Scale plan: per-batch (part, cents) combiner
    partials -> one part-keyed Sum groupby (part-table-bounded), the
    global total folded from that bounded result on the driver; the
    lineitem stream is never collected."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cents = round_away(price * 100, 0).astype(np.int64)
        t = pa.table({"p": b["l_partkey"], "c": pa.array(cents)})
        g = t.group_by(["p"], use_threads=False).aggregate(
            [("c", "sum")])
        return pa.table({"p": g["p"], "c": g["c_sum"]})

    pv = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("p").aggregate(Sum("c", alias_name="v")).to_pandas()
    total = sum(int(x) for x in pv["v"])
    # threshold scales with the part count (1.5x the average part
    # value, as an exact integer cross-multiply) so the selection
    # stays a stable fraction at any corpus size
    n_parts = len(pv)
    out = pv[pv["v"].to_numpy(dtype=np.int64) * 2 * n_parts
             > 3 * total]
    return pd.DataFrame({
        "p_partkey": out["p"].to_numpy(dtype=np.int64),
        "value_cents": out["v"].to_numpy(dtype=np.int64)})


def q_type_hour_chi2(sf_dir: str):
    """Chi-squared independence census between event type and
    hour-of-day: one row per contingency cell with the exact integer
    observed count, the exact integer margins, and the cell's chi2
    contribution ``(o - e)^2 / e`` (e = row·col/n in double, rounded
    to 6) — per-cell rows instead of a global float total, so no
    cross-cell float summation order can diverge between engines.
    Scale plan: per-batch (type, hour) combiner partials -> one
    types×24-bounded groupby; margins fold from that bounded table on
    the driver."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].combine_chunks()
        hour = pc.hour(ts)
        t = pa.table({"event_type": b["event_type"], "hour": hour,
                      "one": pa.array(np.ones(b.num_rows,
                                              dtype=np.int64))})
        g = t.group_by(["event_type", "hour"],
                       use_threads=False).aggregate([("one", "sum")])
        return pa.table({"event_type": g["event_type"],
                         "hour": pc.cast(g["hour"], pa.int64()),
                         "n": g["one_sum"]})

    cells = _read(sf_dir, "events", ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    n_tot = int(cells["n"].sum())
    row_m = cells.groupby("event_type")["n"].sum().to_dict()
    col_m = cells.groupby("hour")["n"].sum().to_dict()
    o = cells["n"].to_numpy(dtype=np.int64).astype(np.float64)
    rm = cells["event_type"].map(row_m).to_numpy(dtype=np.int64) \
        .astype(np.float64)
    cm = cells["hour"].map(col_m).to_numpy(dtype=np.int64) \
        .astype(np.float64)
    from kgforge.common.hashing import round_away

    e = rm * cm / float(n_tot)
    chi = (o - e) * (o - e) / e
    out = pd.DataFrame({
        "event_type": cells["event_type"],
        "hour": cells["hour"].to_numpy(dtype=np.int64),
        "observed": cells["n"].to_numpy(dtype=np.int64),
        "row_total": rm.astype(np.int64),
        "col_total": cm.astype(np.int64),
        "chi2_cell": round_away(chi, 6)})
    return out


_CORR_VARS = ("quantity", "extendedprice", "discount", "tax")


def q_numeric_corr(sf_dir: str):
    """Exact Pearson correlation matrix over the four lineitem
    measures, from integer moments: every Σx, Σx², Σxy is an exact
    int64 per 8192-row batch and an exact arbitrary-precision Python
    int on the driver fold, so the final double derives from the SAME
    integers as the SQL twin's HUGEINT moments — bit-identical
    before the shared round(·, 6).  Scale plan: one streaming pass,
    15 int64 partials per batch, driver folds blocks×15 ints."""
    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        q = np.rint(b["l_quantity"].combine_chunks()
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        e = round_away(b["l_extendedprice"].combine_chunks()
                       .to_numpy(zero_copy_only=False) * 100,
                       0).astype(np.int64)
        d = round_away(b["l_discount"].combine_chunks()
                       .to_numpy(zero_copy_only=False) * 100,
                       0).astype(np.int64)
        t = round_away(b["l_tax"].combine_chunks()
                       .to_numpy(zero_copy_only=False) * 100,
                       0).astype(np.int64)
        v = {"q": q, "e": e, "d": d, "t": t}
        cols = {"n": pa.array([len(q)], pa.int64())}
        names = ("q", "e", "d", "t")
        for a in names:
            cols[f"s_{a}"] = pa.array([int(v[a].sum())], pa.int64())
        for i, a in enumerate(names):
            for bn in names[i:]:
                cols[f"s_{a}{bn}"] = pa.array(
                    [int((v[a] * v[bn]).sum())], pa.int64())
        return pa.table(cols)

    parts = _read(sf_dir, "lineitem",
                  ["l_quantity", "l_extendedprice", "l_discount",
                   "l_tax"]) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=8192).to_pandas()
    # arbitrary-precision fold: a pandas int64 sum of the
    # per-batch second-moment partials overflows at sf>=0.1
    tot = {c: sum(int(x) for x in parts[c]) for c in parts.columns}

    names = ("q", "e", "d", "t")
    n = tot["n"]
    rows = []
    for i, a in enumerate(names):
        for bn in names[i + 1:]:
            num = n * tot[f"s_{a}{bn}"] - tot[f"s_{a}"] * tot[f"s_{bn}"]
            dx = n * tot[f"s_{a}{a}"] - tot[f"s_{a}"] ** 2
            dy = n * tot[f"s_{bn}{bn}"] - tot[f"s_{bn}"] ** 2
            corr = float(np.float64(float(num))
                         / np.sqrt(np.float64(float(dx))
                                   * np.float64(float(dy))))
            rows.append({
                "col_a": _CORR_VARS[names.index(a)],
                "col_b": _CORR_VARS[names.index(bn)],
                "n": n,
                "corr": float(np.round(np.float64(corr), 6))})
    df = pd.DataFrame(rows)
    df["n"] = df["n"].astype(np.int64)
    return df


def q_weighted_median(sf_dir: str):
    """Exact weighted median of quantity per returnflag, weighted by
    exact-cents revenue: smallest q with 2·cumweight ≥ total (lower
    weighted median).  Scale plan: the value domain is bounded
    (1..50), so per-batch (flag, qty, w) combiner partials collapse
    to a ≤ flags×50-row groupby — the classic histogram-median that
    replaces a full sort at any corpus size."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        q = np.rint(b["l_quantity"].combine_chunks()
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        w = round_away(b["l_extendedprice"].combine_chunks()
                       .to_numpy(zero_copy_only=False) * 100,
                       0).astype(np.int64)
        t = pa.table({"f": b["l_returnflag"], "q": pa.array(q),
                      "w": pa.array(w)})
        g = t.group_by(["f", "q"], use_threads=False).aggregate(
            [("w", "sum")])
        return pa.table({"f": g["f"], "q": g["q"], "w": g["w_sum"]})

    hist = _read(sf_dir, "lineitem",
                 ["l_returnflag", "l_quantity", "l_extendedprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["f", "q"]).aggregate(Sum("w", alias_name="w")) \
        .to_pandas()                      # flags × |qty domain| rows
    rows = []
    for f, g in hist.groupby("f", sort=True):
        g = g.sort_values("q")
        w = g["w"].to_numpy(dtype=np.int64)
        cw = np.cumsum(w)
        tot = int(cw[-1])
        idx = int(np.argmax(2 * cw >= tot))
        rows.append({"l_returnflag": f,
                     "median_qty": int(g["q"].iloc[idx]),
                     "total_weight": tot})
    df = pd.DataFrame(rows)
    df["median_qty"] = df["median_qty"].astype(np.int64)
    df["total_weight"] = df["total_weight"].astype(np.int64)
    return df


def q_conversion_lag(sf_dir: str):
    """Ordered first-touch conversion latency between event types:
    for every type pair (a, b) the users whose FIRST ``a`` strictly
    precedes their FIRST ``b``, with total and max first-to-first lag
    in exact microseconds — the directional funnel-latency companion
    to ``type_affinity``'s unordered overlap.

    Scale shape: combiner-first (user, type) min-ts reduce (cells
    shuffle, never events), then user-hash partitions emit the ≤ T²
    ordered pairs per user via one ts-sorted run pass into a tiny
    (type_a, type_b) groupby."""
    from ray.data.aggregate import Max, Min, Sum

    from kgforge.functions.joins import _part_codes

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        t = pa.table({"u": b["user_id"], "t": b["event_type"],
                      "ft": us})
        g = t.group_by(["u", "t"], use_threads=False).aggregate(
            [("ft", "min")])
        return pa.table({"u": g["u"], "t": g["t"], "ft": g["ft_min"]})

    firsts = _read(sf_dir, "events", ["user_id", "event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["u", "t"]).aggregate(Min("ft", alias_name="ft"))

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["u"], "t": b["t"], "ft": b["ft"],
                         "__p": pa.array(_part_codes(b["u"], 32))})

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], pa.string()),
                          "type_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64()),
                          "m": pa.array([], pa.int64())})
        t = t.sort_by([("u", "ascending"), ("ft", "ascending"),
                       ("t", "ascending")])
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return empty
        ft = t["ft"].combine_chunks().to_numpy(zero_copy_only=False)
        tv = t["t"].combine_chunks()
        starts = np.concatenate(
            [[0], np.flatnonzero(u[1:] != u[:-1]) + 1])
        runlen = np.diff(np.concatenate([starts, [len(u)]]))
        outs = []
        for k in np.unique(runlen):
            if k < 2:
                continue
            runs = starts[runlen == k]
            ii, jj = np.triu_indices(int(k), 1)
            outs.append(((runs[:, None] + ii[None, :]).ravel(),
                         (runs[:, None] + jj[None, :]).ravel()))
        if not outs:
            return empty
        ai = np.concatenate([o[0] for o in outs])
        bi = np.concatenate([o[1] for o in outs])
        lag = ft[bi] - ft[ai]
        keep = lag > 0                       # strict: ties excluded
        ai, bi, lag = ai[keep], bi[keep], lag[keep]
        if not len(ai):
            return empty
        part = pa.table({"type_a": tv.take(pa.array(ai)),
                         "type_b": tv.take(pa.array(bi)),
                         "n": pa.array(np.ones(len(ai), np.int64)),
                         "s": pa.array(lag), "m": pa.array(lag)})
        g = part.group_by(["type_a", "type_b"],
                          use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum"), ("m", "max")])
        return pa.table({"type_a": g["type_a"],
                         "type_b": g["type_b"], "n": g["n_sum"],
                         "s": g["s_sum"], "m": g["m_max"]})

    return firsts.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(pairs, batch_format="pyarrow") \
        .groupby(["type_a", "type_b"]).aggregate(
            Sum("n", alias_name="n_users"),
            Sum("s", alias_name="total_lag_us"),
            Max("m", alias_name="max_lag_us"))


def q_max_drawdown(sf_dir: str):
    """Max drawdown of each event type's hourly traffic: the largest
    drop from a prior peak in the per-hour event-count series
    (observed-hour grain, the ``hourly_delta`` contract) plus the
    earliest hour it is realized — the load-regression / outage
    signal.  Combiner-first (type, hour) reduce (calendar-bounded
    output), then one vectorized running-max pass per type on the
    driver."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b["event_type"],
                      "h": pa.array(us // 3_600_000_000)})
        return t.group_by(["event_type", "h"],
                          use_threads=False).aggregate(
            [([], "count_all")]).rename_columns(
            ["event_type", "h", "n"])

    hourly = _read(sf_dir, "events", ["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "h"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()

    rows = []
    for etype, g in hourly.groupby("event_type", sort=True):
        g = g.sort_values("h")
        c = g["n"].to_numpy(dtype=np.int64)
        peak = np.maximum.accumulate(c)
        dd = peak - c
        best = int(dd.max())
        pos = int(np.argmax(dd))             # earliest (first) max
        rows.append({"event_type": etype, "max_drawdown": best,
                     "dd_hour": int(g["h"].to_numpy()[pos]),
                     "n_hours": len(c)})
    df = pd.DataFrame(rows)
    for c in ("max_drawdown", "dd_hour", "n_hours"):
        df[c] = df[c].astype(np.int64)
    return df


def q_snm_pairs(sf_dir: str):
    """Sorted-neighborhood dedup blocking over the documents table —
    see :func:`kgforge.functions.dedup.snm_pairs_ds`."""
    return F_dedup.snm_pairs_ds(_read(sf_dir, "documents",
                                      ["doc_id", "text"]))


def q_source_char_kl(sf_dir: str):
    """Per-source char-distribution KL divergence vs the corpus — see
    :func:`kgforge.functions.textstats.source_char_kl_ds`."""
    return F_text.source_char_kl_ds(
        _read(sf_dir, "documents", ["source", "text"]))


def q_customer_gini(sf_dir: str):
    """Per-nation Gini coefficient of customer order revenue in exact
    ppm: with per-customer cents ``x`` sorted ascending and ranks
    ``i = 1..n``, ``gini_ppm = (2·Σi·x − (n+1)·Σx)·10⁶ // (n·Σx)``
    (tie order cancels — equal values contribute the same Σi·x under
    any permutation).  The revenue-inequality companion to
    ``pareto_share``.

    Scale shape: (custkey, cents) combiner partials → custkey cogroup
    attaches nationkey → the sorted-rank moment runs inside |nation|
    dimension-bounded groups; Σi·x folds in arbitrary-precision
    Python ints (an int64 dot overflows near n ≈ 10⁶ customers per
    nation — the ``numeric_corr`` precedent), n·Σx stays HUGEINT-safe
    in the SQL twin."""
    from kgforge.functions.joins import cogroup_partition_ds

    from kgforge.common.hashing import round_away

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def rev_partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        g = pa.table({"k": b["o_custkey"], "c": pa.array(cents)}) \
            .group_by(["k"], use_threads=False).aggregate([("c", "sum")])
        return pa.table({"o_custkey": g["k"], "cents": g["c_sum"]})

    rev = orders.map_batches(rev_partial, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep = (nl > 0) & (nr > 0)
        if not keep.any():
            return pa.table({"nk": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        c = pc.fill_null(t["cents"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.add.reduceat(c, starts)[keep]
        ridx = pa.array((starts + nl)[keep])
        return pa.table({"nk": t["c_nationkey"].take(ridx),
                         "cents": pa.array(sums)})

    per_cust = cogroup_partition_ds(
        rev, cust, "o_custkey", "c_custkey", fuse,
        ["cents"], ["c_nationkey"],
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_nationkey", pa.int64())]))

    def per_nation(t: pa.Table) -> pa.Table:
        nk = int(t["nk"][0].as_py())
        c = np.sort(t["cents"].combine_chunks()
                    .to_numpy(zero_copy_only=False).astype(np.int64))
        n = len(c)
        s0 = int(c.sum())
        # arbitrary-precision rank moment (see docstring)
        s1 = int(np.dot(np.arange(1, n + 1, dtype=object),
                        c.astype(object)))
        gini = (2 * s1 - (n + 1) * s0) * 1_000_000 // (n * s0)
        return pa.table({"nk": pa.array([nk], pa.int64()),
                         "gini_ppm": pa.array([gini], pa.int64()),
                         "n_customers": pa.array([n], pa.int64()),
                         "total_cents": pa.array([s0], pa.int64())})

    res = per_cust.groupby("nk").map_groups(
        per_nation, batch_format="pyarrow").to_pandas()
    out_schema = pa.schema([("n_name", pa.string()),
                            ("gini_ppm", pa.int64()),
                            ("n_customers", pa.int64()),
                            ("total_cents", pa.int64())])
    if not len(res):
        return out_schema.empty_table()
    import pyarrow.dataset as pds
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"],
                row_filter=pds.field("n_nationkey")
                .isin([int(k) for k in res["nk"]])).to_pandas()
    m = res.merge(nat, left_on="nk", right_on="n_nationkey") \
        .sort_values("n_name")
    return pa.table({
        "n_name": pa.array(m["n_name"], pa.string()),
        "gini_ppm": pa.array(m["gini_ppm"].to_numpy(np.int64)),
        "n_customers": pa.array(m["n_customers"].to_numpy(np.int64)),
        "total_cents": pa.array(m["total_cents"].to_numpy(np.int64))})


def q_lang_source_pmi(sf_dir: str):
    """Pointwise mutual information between document language and
    source per (lang, source) cell in exact integer micro-nats:
    ``pmi_micro = L(c) + L(N) − L(row) − L(col)`` on the shared log
    grid — the corpus-composition dependence census (which sources
    over/under-represent which languages).

    Scale shape: one (lang, source) combiner reduce — the shuffle
    carries langs×sources-bounded cells; marginals and the grid fold
    run on the driver over that bounded table."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({"lang": b["lang"], "source": b["source"]}) \
            .group_by(["lang", "source"], use_threads=False) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["lang", "source", "c"])

    cells = _read(sf_dir, "documents", ["lang", "source"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "source"]) \
        .aggregate(Sum("c", alias_name="c")).to_pandas()

    def L(x):
        return round_away(np.log(x) * 1_000_000, 0).astype(np.int64)

    c = cells["c"].to_numpy(dtype=np.int64)
    big_n = int(c.sum())
    row = cells.groupby("lang")["c"].transform("sum") \
        .to_numpy(dtype=np.int64)
    col = cells.groupby("source")["c"].transform("sum") \
        .to_numpy(dtype=np.int64)
    pmi = L(c) + int(L(np.array([big_n]))[0]) - L(row) - L(col)
    return pa.table({
        "lang": pa.Array.from_pandas(cells["lang"]),
        "source": pa.Array.from_pandas(cells["source"]),
        "n": pa.array(c),
        "pmi_micro": pa.array(pmi.astype(np.int64))})


def q_min_cost_supplier(sf_dir: str):
    """TPC-H Q2-adapted (no partsupp table in this corpus): for every
    part, the supplier observed shipping it at the lowest exact-cents
    line price (ties → smallest suppkey), plus how many distinct
    suppliers ship the part — the procurement-routing table.

    Scale shape: (part, supp) min-cents combiner reduce (supply-pair
    bounded cells, lineitem never re-shuffles), then part-hash
    partitions pick each part's argmin with one sorted run pass;
    supplier names attach from the dimension LUT on the driver-bounded
    result."""
    from ray.data.aggregate import Min

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import _part_codes

    def partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["l_extendedprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        g = pa.table({"pk": b["l_partkey"], "sk": b["l_suppkey"],
                      "c": pa.array(cents)}) \
            .group_by(["pk", "sk"], use_threads=False) \
            .aggregate([("c", "min")])
        return pa.table({"pk": g["pk"], "sk": g["sk"],
                         "c": g["c_min"]})

    pairs = _read(sf_dir, "lineitem",
                  ["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["pk", "sk"]).aggregate(Min("c", alias_name="c"))

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__p",
                               pa.array(_part_codes(b["pk"], 32)))

    def argmin(t: pa.Table) -> pa.Table:
        t = t.sort_by([("pk", "ascending"), ("c", "ascending"),
                       ("sk", "ascending")])
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        if not len(pk):
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "s_suppkey": pa.array([], pa.int64()),
                             "min_cents": pa.array([], pa.int64()),
                             "n_suppliers": pa.array([], pa.int64())})
        starts = np.concatenate(
            [[0], np.flatnonzero(pk[1:] != pk[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [len(pk)]]))
        idx = pa.array(starts)
        return pa.table({"p_partkey": t["pk"].take(idx),
                         "s_suppkey": t["sk"].take(idx),
                         "min_cents": t["c"].take(idx),
                         "n_suppliers": pa.array(
                             lens.astype(np.int64))})

    res = pairs.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(argmin, batch_format="pyarrow") \
        .to_pandas()
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]) \
        .to_pandas()
    m = res.merge(sup, on="s_suppkey")
    return pa.table({
        "p_partkey": pa.array(m["p_partkey"].to_numpy(np.int64)),
        "s_suppkey": pa.array(m["s_suppkey"].to_numpy(np.int64)),
        "s_name": pa.array(m["s_name"], pa.string()),
        "min_cents": pa.array(m["min_cents"].to_numpy(np.int64)),
        "n_suppliers": pa.array(m["n_suppliers"].to_numpy(np.int64))})


def q_source_token_entropy(sf_dir: str):
    """Per-source whitespace-token Shannon entropy — see
    :func:`kgforge.functions.textstats.source_token_entropy_ds`."""
    return F_text.source_token_entropy_ds(
        _read(sf_dir, "documents", ["source", "text"]))


def q_kg_triads(sf_dir: str):
    """Directed triad-motif census (feed-forward vs cycle) — see
    :func:`kgforge.functions.graph.triad_census_ds`."""
    from kgforge.functions.graph import triad_census_ds

    return triad_census_ds(_entity_edges_for(sf_dir))


def q_kg_densification(sf_dir: str):
    """Densification-law census (edge/node arrival deciles) — see
    :func:`kgforge.functions.graph.densification_ds`."""
    from kgforge.functions.graph import densification_ds

    trip = _dict_flagship_for(sf_dir)["triples"]

    def drop_mentions(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.equal(b["pred"], "mentions")))

    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    return densification_ds(
        trip.map_batches(drop_mentions, batch_format="pyarrow"),
        n_docs=n_docs)


def q_kg_robustness(sf_dir: str):
    """Hub-knockout attack-tolerance census — see
    :func:`kgforge.functions.graph.hub_knockout_ds`."""
    from kgforge.functions.graph import hub_knockout_ds

    return hub_knockout_ds(_entity_edges_for(sf_dir), k=5)


def q_position_attribution(sf_dir: str):
    """U-shaped position-based multi-touch attribution — see
    :func:`kgforge.functions.events.position_attribution_ds`."""
    from kgforge.functions.events import position_attribution_ds

    return position_attribution_ds(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"]),
        conv_type="purchase")


def q_removal_effect(sf_dir: str):
    """Markov removal-effect channel attribution — see
    :func:`kgforge.functions.events.removal_effect_ds`."""
    from kgforge.functions.events import removal_effect_ds

    return removal_effect_ds(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"]),
        conv_type="purchase", steps=6)


def _removal_effect_sql(conv: str = "purchase", steps: int = 6) -> str:
    """Channel-parallel unrolled twin of ``removal_effect_ds``: the
    propagation carries a ``ch`` column (one lane per removable
    channel plus ``__FULL__``), exclusion is ``c.b <> v.ch``, and the
    per-edge integer floor rule matches the engine exactly."""
    sql = f"""
WITH seq AS (SELECT user_id, event_type, ts, event_id,
                    coalesce(sum(CASE WHEN event_type = '{conv}'
                                      THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS prior_conv
             FROM events),
kept AS (SELECT user_id, event_type, ts, event_id
         FROM seq WHERE prior_conv = 0),
o AS (SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM kept),
tr AS (SELECT event_type AS a, coalesce(nxt, '__END__') AS b FROM o
       UNION ALL
       SELECT '__START__', event_type FROM o WHERE rn = 1),
c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM tr GROUP BY 1, 2),
t AS (SELECT a, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
ty AS (SELECT DISTINCT event_type AS ty FROM events
       WHERE event_type <> '{conv}'),
chs AS (SELECT ty AS ch FROM ty UNION ALL SELECT '__FULL__'),
v0 AS (SELECT ch, '__START__' AS st, CAST(1000000 AS BIGINT) AS m
       FROM chs)"""
    for s in range(1, steps + 1):
        sql += f""",
g{s} AS (SELECT v.ch, CAST(sum(v.m * c.n // t.tot) AS BIGINT) AS g
         FROM v{s - 1} v JOIN c ON c.a = v.st JOIN t ON t.a = v.st
         WHERE c.b = '{conv}' GROUP BY 1),
v{s} AS (SELECT v.ch, c.b AS st,
                CAST(sum(v.m * c.n // t.tot) AS BIGINT) AS m
         FROM v{s - 1} v JOIN c ON c.a = v.st JOIN t ON t.a = v.st
         WHERE c.b <> '{conv}' AND c.b <> '__END__' AND c.b <> v.ch
         GROUP BY 1, 2)"""
    gs = " UNION ALL ".join(f"SELECT ch, g FROM g{s}"
                            for s in range(1, steps + 1))
    return sql + f""",
gs AS ({gs}),
ptab AS (SELECT chs.ch, CAST(coalesce(sum(gs.g), 0) AS BIGINT) AS p
         FROM chs LEFT JOIN gs ON gs.ch = chs.ch GROUP BY 1)
SELECT ch AS channel,
       (SELECT p FROM ptab WHERE ch = '__FULL__') AS p_full_micro,
       p AS p_removed_micro,
       (SELECT p FROM ptab WHERE ch = '__FULL__') - p AS removal_micro
FROM ptab WHERE ch <> '__FULL__'
"""


def q_kg_bowtie(sf_dir: str):
    """Hop-bounded bow-tie census (SCC / IN / OUT / OTHER from the
    smallest node) of the directed entity graph — see
    :func:`kgforge.functions.graph.bowtie_ds`."""
    from kgforge.functions.graph import bowtie_ds

    return bowtie_ds(_entity_edges_for(sf_dir), max_hops=6)


def q_kcenter_select(sf_dir: str):
    """Greedy k-center coreset (farthest-first traversal) over the
    embeddings table — see
    :func:`kgforge.functions.simsearch.kcenter_select_ds`."""
    from kgforge.functions.simsearch import kcenter_select_ds

    return kcenter_select_ds(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), k=8)


def _kcenter_sql(k: int = 8) -> str:
    """Unrolled farthest-first traversal twin: step i picks the max
    min-distance row of d_{i-1} (ties → smallest vec_id), d_i folds the
    new center in via ``least``.  Distances are exact integers over the
    same ``round(x·10⁶)`` quantization the engine uses — no float
    summation-order risk in the compare."""
    def dist(a: str, b: str) -> str:
        # fixed 64-dim embeddings table (generate_series rejects
        # lateral column bounds like len(qv))
        return (f"(SELECT CAST(sum(({a}.qv[g.i] - {b}.qv[g.i]) * "
                f"({a}.qv[g.i] - {b}.qv[g.i])) AS BIGINT) "
                f"FROM generate_series(1, 64) g(i))")

    parts = [
        "WITH q AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) "
        "AS qv FROM embeddings)",
        ", s1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1)",
        f", d1 AS (SELECT q.vec_id, q.qv, {dist('q', 's1')} AS dm "
        "FROM q, s1 WHERE q.vec_id <> s1.vec_id)"]
    for i in range(2, k + 1):
        parts.append(f", s{i} AS (SELECT vec_id, qv, dm FROM d{i - 1} "
                     "ORDER BY dm DESC, vec_id LIMIT 1)")
        if i < k:
            parts.append(
                f", d{i} AS (SELECT d.vec_id, d.qv, "
                f"least(d.dm, {dist('d', f's{i}')}) AS dm "
                f"FROM d{i - 1} d, s{i} "
                f"WHERE d.vec_id <> s{i}.vec_id)")
    sel = ["SELECT CAST(1 AS BIGINT) AS step, vec_id, "
           "CAST(0 AS BIGINT) AS dist_micro2 FROM s1"]
    for i in range(2, k + 1):
        sel.append(f"SELECT CAST({i} AS BIGINT), vec_id, "
                   f"CAST(dm AS BIGINT) FROM s{i}")
    return "\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


def q_dsir_topk(sf_dir: str):
    """DSIR selection: the 100 highest-importance docs by
    (weight desc, doc_id asc) — the resampling step of the DSIR
    pipeline as a per-batch partial-top-k + driver merge (only
    num_batches × k candidate rows leave the scoring map)."""
    scored = F_text.dsir_weights_ds(
        _read(sf_dir, "documents", ["doc_id", "lang", "text"]),
        target_lang="en")
    k = 100

    def partial(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[
            ("weight_micro", "descending"), ("doc_id", "ascending")])
        return b.take(idx[:k])

    cand = scored.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    cand = cand.sort_values(["weight_micro", "doc_id"],
                            ascending=[False, True]).head(k)
    return pa.table({
        "doc_id": pa.array(cand["doc_id"].to_numpy(np.int64)),
        "n_tokens": pa.array(cand["n_tokens"].to_numpy(np.int64)),
        "weight_micro": pa.array(
            cand["weight_micro"].to_numpy(np.int64))})


def q_benford_digits(sf_dir: str):
    """Benford first-digit census of order totals (the classic
    anomaly/fraud screen): observed count per leading digit plus the
    Benford-law expectation in exact integer micro-units
    (``E_d = n·(L(d+1)−L(d)) // L(10)`` on the shared log grid) and
    the absolute deviation.  One pure map + 9-cell groupby; the
    expectation folds on the driver."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def digits(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        cents = np.abs(cents)
        d = cents.copy()
        d[d == 0] = 1
        while (d >= 10).any():
            big = d >= 10
            d[big] //= 10
        h = np.bincount(d, minlength=10)[1:10].astype(np.int64)
        return pa.table({
            "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
            "observed": pa.array(h)})

    obs = ds.map_batches(digits, batch_format="pyarrow") \
        .groupby("digit").aggregate(
            Sum("observed", alias_name="observed")).to_pandas() \
        .set_index("digit")["observed"]
    o = np.array([int(obs.get(d, 0)) for d in range(1, 10)], np.int64)
    n = int(o.sum())

    def L(x: float) -> int:
        return int(round_away(np.log(x) * 1_000_000, 0))

    exp = np.array([n * (L(d + 1) - L(d)) // L(10)
                    for d in range(1, 10)], dtype=np.int64)
    return pa.table({
        "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
        "observed": pa.array(o),
        "expected": pa.array(exp),
        "abs_dev": pa.array(np.abs(o - exp).astype(np.int64))})


def q_source_length_w1(sf_dir: str):
    """Pairwise Wasserstein-1 between per-source length
    distributions — see
    :func:`kgforge.functions.textstats.source_length_w1_ds`."""
    return F_text.source_length_w1_ds(
        _read(sf_dir, "documents", ["source", "text"]))


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights vs the ``lang='en'`` target slice — see
    :func:`kgforge.functions.textstats.dsir_weights_ds`."""
    return F_text.dsir_weights_ds(
        _read(sf_dir, "documents", ["doc_id", "lang", "text"]),
        target_lang="en")


def q_kaplan_meier(sf_dir: str):
    """Kaplan–Meier reorder-lifetime curve over customer order gaps,
    right-censored at the horizon — see
    :func:`kgforge.functions.events.kaplan_meier_ds`."""
    return F_events.kaplan_meier_ds(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderdate", "o_orderkey"]),
        by="o_custkey", on="o_orderdate", tie="o_orderkey")


def q_mannwhitney_u(sf_dir: str):
    """Pairwise Mann–Whitney rank-sum shift test between per-source
    doc-length distributions — see
    :func:`kgforge.functions.textstats.mannwhitney_u_ds`."""
    return F_text.mannwhitney_u_ds(
        _read(sf_dir, "documents", ["source", "n_chars"]),
        value_col="n_chars", by="source")


def q_temperature_mix(sf_dir: str):
    """Temperature-scaled (τ=0.7) per-source sampling weights over
    char budgets — see
    :func:`kgforge.functions.textstats.temperature_mix_ds`."""
    return F_text.temperature_mix_ds(
        _read(sf_dir, "documents", ["source", "n_chars"]), tau=0.7)


def _nation_month_cells(sf_dir: str):
    """(nation key, yyyymm, revenue cents) cells — ONE custkey cogroup
    of orders against customer emitting bounded (nation, month, cents)
    partials, shared by the monthly-series queries
    (``forecast_backtest``, ``anova_month``)."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    empty = pa.table({"nk": pa.array([], pa.int64()),
                      "ym": pa.array([], pa.int64()),
                      "cents": pa.array([], pa.int64())})

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        n = t.num_rows
        keep_run = (nl > 0) & (nr > 0)
        if not keep_run.any():
            return empty
        is_left = np.zeros(n, dtype=bool)
        for s, a in zip(starts[keep_run], nl[keep_run]):
            is_left[s:s + a] = True
        nk_run = t["c_nationkey"].take(
            pa.array((starts + nl)[keep_run])).combine_chunks() \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        nk = np.repeat(nk_run, nl[keep_run])
        od = t["o_orderdate"].filter(pa.array(is_left)) \
            .combine_chunks()
        ym = (pc.year(od).cast(pa.int64()).to_numpy(
                  zero_copy_only=False) * 100
              + pc.month(od).cast(pa.int64()).to_numpy(
                  zero_copy_only=False))
        cents = round_away(
            t["o_totalprice"].filter(pa.array(is_left))
            .combine_chunks().to_numpy(zero_copy_only=False) * 100,
            0).astype(np.int64)
        code = nk * 1_000_000 + ym
        uniq, inv = np.unique(code, return_inverse=True)
        sums = np.bincount(inv, weights=cents.astype(np.float64)) \
            .astype(np.int64)
        return pa.table({"nk": pa.array(uniq // 1_000_000),
                         "ym": pa.array(uniq % 1_000_000),
                         "cents": pa.array(sums)})

    return cogroup_partition_ds(
        orders, cust, "o_custkey", "c_custkey", fuse,
        ["o_orderdate", "o_totalprice"], ["c_nationkey"],
        left_schema=pa.schema([
            ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_totalprice", pa.float64())]),
        right_schema=pa.schema([
            ("c_custkey", pa.int64()),
            ("c_nationkey", pa.int32())])) \
        .groupby(["nk", "ym"]).aggregate(
            Sum("cents", alias_name="cents")).to_pandas()


def _nation_name_lut(sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    return dict(zip(
        nation["n_nationkey"].to_numpy(zero_copy_only=False),
        nation["n_name"].to_pylist()))


def q_forecast_backtest(sf_dir: str):
    """Seasonal-naive forecast backtest per nation: predict month m's
    order revenue with month m−12, benchmark against the naive lag-1
    predictor, report the MASE ratio in exact integer micro-units
    (MASE < 1e6 ⇔ seasonality beats persistence).  Scale plan: the
    shared :func:`_nation_month_cells` cogroup; the lag algebra folds
    on the driver over nations × months bounded cells (nation names
    ride a ≤25-row LUT)."""
    cells = _nation_month_cells(sf_dir)
    name_of = _nation_name_lut(sf_dir)

    out = {}
    for nk, grp in cells.groupby("nk"):
        rev = {int(r.ym): int(r.cents) for r in grp.itertuples()}
        es = e1 = nm = 0
        for ym, c in sorted(rev.items()):
            prev = ym - 1 if ym % 100 != 1 else ym - 89
            seas = ym - 100
            if prev in rev and seas in rev:
                nm += 1
                es += abs(c - rev[seas])
                e1 += abs(c - rev[prev])
        if nm:
            out[name_of[int(nk)]] = (
                nm, es, e1, es * 1_000_000 // e1 if e1 else 0)
    names = sorted(out)
    return pa.table({
        "n_name": pa.array(names, pa.string()),
        "n_months": pa.array([out[n][0] for n in names], pa.int64()),
        "sum_err_seasonal": pa.array([out[n][1] for n in names],
                                     pa.int64()),
        "sum_err_naive": pa.array([out[n][2] for n in names],
                                  pa.int64()),
        "mase_micro": pa.array([out[n][3] for n in names],
                               pa.int64())})


def q_trigram_backoff(sf_dir: str):
    """Char-trigram stupid-backoff LM scored on the odd-doc_id
    held-out split, per-lang backoff-level census — see
    :func:`kgforge.functions.textstats.trigram_backoff_ds`."""
    return F_text.trigram_backoff_ds(
        _read(sf_dir, "documents", ["doc_id", "lang", "text"]))


def q_kg_auc(sf_dir: str):
    """Held-out AUC of common-neighbor link prediction over the
    entity graph — see
    :func:`kgforge.functions.graph.linkpred_auc_ds`."""
    from kgforge.functions.graph import linkpred_auc_ds

    return linkpred_auc_ds(_entity_edges_for(sf_dir))


def q_ks_test(sf_dir: str):
    """Pairwise two-sample Kolmogorov–Smirnov shift statistic between
    per-source doc-length distributions — see
    :func:`kgforge.functions.textstats.ks_test_ds`."""
    return F_text.ks_test_ds(
        _read(sf_dir, "documents", ["source", "n_chars"]),
        value_col="n_chars", by="source")


def q_bpe_merges(sf_dir: str):
    """First 8 learned BPE merge rules over the corpus word dict —
    iterative by nature, rows-only lane (the pure-Python reference
    BPE in the unit test is the oracle); see
    :func:`kgforge.functions.indexing.bpe_merges_ds`."""
    from kgforge.functions.indexing import bpe_merges_ds

    return bpe_merges_ds(_read(sf_dir, "documents", ["text"]),
                         n_merges=8)


def q_poisson_bootstrap(sf_dir: str):
    """Deterministic Poisson-bootstrap CI for the mean order value —
    see :func:`kgforge.functions.sampling.poisson_bootstrap_ds`."""
    from kgforge.functions.sampling import poisson_bootstrap_ds

    return poisson_bootstrap_ds(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]))


def q_embedding_cov(sf_dir: str):
    """Top-20 most-covarying embedding dimension pairs (redundancy /
    collapse census) — see
    :func:`kgforge.functions.clustering.embedding_cov_ds`."""
    from kgforge.functions.clustering import embedding_cov_ds

    return embedding_cov_ds(
        _read(sf_dir, "embeddings", ["embedding"]), k=20)


def q_anova_month(sf_dir: str):
    """Seasonality strength per nation: one-way ANOVA of the monthly
    revenue series grouped by month-of-year, reported as
    ``eta2_micro = floor(10⁶·SSB/SST)`` in EXACT integer arithmetic —
    clearing denominators with ``Π n_g`` (≤ 7¹² fits the twin's
    HUGEINT; the engine folds Python ints) makes
    ``eta² = (N·Σ_g S_g²·(Π/n_g) − S²·Π) / (Π·(N·Σx² − S²))`` a pure
    integer ratio both engines floor identically.  Scale plan: the
    shared :func:`_nation_month_cells` cogroup; the ANOVA folds on
    the driver over nations × months bounded cells."""
    cells = _nation_month_cells(sf_dir)
    name_of = _nation_name_lut(sf_dir)

    out = {}
    for nk, grp in cells.groupby("nk"):
        xs = [(int(r.ym) % 100, int(r.cents))
              for r in grp.itertuples()]
        n = len(xs)
        if n < 2:
            continue
        s = sum(c for _, c in xs)
        sx2 = sum(c * c for _, c in xs)
        sst_n = n * sx2 - s * s
        if sst_n == 0:
            continue
        groups = {}
        for moy, c in xs:
            ng, sg = groups.get(moy, (0, 0))
            groups[moy] = (ng + 1, sg + c)
        prod = 1
        for ng, _ in groups.values():
            prod *= ng
        ssb_num = n * sum(sg * sg * (prod // ng)
                          for ng, sg in groups.values()) \
            - s * s * prod
        out[name_of[int(nk)]] = (
            n, 1_000_000 * ssb_num // (prod * sst_n))
    names = sorted(out)
    return pa.table({
        "n_name": pa.array(names, pa.string()),
        "n_months": pa.array([out[n][0] for n in names], pa.int64()),
        "eta2_micro": pa.array([out[n][1] for n in names],
                               pa.int64())})


def q_kg_degree_zipf(sf_dir: str):
    """Scale-free exponent check: OLS slope of ln(n_nodes) vs
    ln(degree) over the entity graph's degree distribution, exact
    integer ppm on the shared ``round(ln·1e6)`` grid (a power-law
    graph sits near −2…−3; a random graph curves away).  Reuses the
    kg_degree_dist histogram fold (≤ distinct-degree rows move) and
    the zipf_slope regression: Python-int sums, division truncating
    toward zero to match DuckDB ``//``."""
    import math

    dist = q_kg_degree_dist(sf_dir).to_pandas()
    dist = dist[dist["degree"] > 0]

    def slog(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    xs = [slog(int(d)) for d in dist["degree"]]
    ys = [slog(int(v)) for v in dist["n_nodes"]]
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    det = k * sxx - sx * sx
    num = (k * sxy - sx * sy) * 1_000_000
    slope = (abs(num) // det) * (1 if num >= 0 else -1) if det else 0
    return pa.table({
        "n_degrees": pa.array([k], pa.int64()),
        "slope_micro": pa.array([slope], pa.int64())})


def q_token_shift(sf_dir: str):
    """Top-20 corpus-drift tokens between the even/odd doc_id halves
    (the A/B vocabulary-shift census): per token the exact
    cross-multiplied rate shift ``|c_e·N_o − c_o·N_e|`` (no division,
    so class imbalance never biases the rank), ties → token ASC.
    Scale plan: per-batch (token, half) count partials → ONE
    vocab-bounded groupby (materialized once, reused for the N_e/N_o
    fold and the scoring pass); per-block partial top-20 so the
    driver merge sees blocks × 20 rows."""
    import ray
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks()
        toks = pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        half = pc.bit_wise_and(ids.take(par), 1)
        t = pa.table({"token": flat,
                      "e": pc.cast(pc.equal(half, 0), pa.int64()),
                      "o": pc.cast(pc.equal(half, 1), pa.int64())})
        g = t.group_by(["token"], use_threads=False).aggregate(
            [("e", "sum"), ("o", "sum")])
        return pa.table({"token": g["token"], "e": g["e_sum"],
                         "o": g["o_sum"]})

    cells = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(
            Sum("e", alias_name="e"),
            Sum("o", alias_name="o")).materialize()

    n_e = int(cells.sum("e") or 0)
    n_o = int(cells.sum("o") or 0)

    def score_topk(b: pa.Table) -> pa.Table:
        e = b["e"].combine_chunks().to_numpy(zero_copy_only=False)
        o = b["o"].combine_chunks().to_numpy(zero_copy_only=False)
        shift = np.abs(e * n_o - o * n_e)
        t = pa.table({"token": b["token"],
                      "n_even": pa.array(e),
                      "n_odd": pa.array(o),
                      "shift_scaled": pa.array(shift)})
        if t.num_rows <= 20:
            return t
        order = np.lexsort(
            (np.asarray(t["token"].to_pylist()), -shift))
        return t.take(pa.array(order[:20]))

    top = cells.map_batches(score_topk, batch_format="pyarrow") \
        .to_pandas()
    top = top.sort_values(["shift_scaled", "token"],
                          ascending=[False, True]).head(20)
    return pa.table({
        "token": pa.array(top["token"].tolist(), pa.string()),
        "n_even": pa.array(top["n_even"].to_numpy(np.int64)),
        "n_odd": pa.array(top["n_odd"].to_numpy(np.int64)),
        "shift_scaled": pa.array(
            top["shift_scaled"].to_numpy(np.int64))})


def q_partition_skew(sf_dir: str):
    """Shuffle-skew advisor: hash-partition the event stream by
    ``user_id`` on the md5 first-8-hex grid (the engine's shared
    partition convention) into 64 buckets and report the imbalance a
    real exchange would see — min/median/max bucket rows and
    ``skew_micro = 2·max·10⁶ // med2`` (med2 = the two central order
    stats summed, so even counts stay integral; 1e6 ⇔ perfectly
    balanced).  The go/no-go signal before keying a wide operation on
    a candidate column.  Scale plan: per-batch 64-cell bincount
    partials, one 64-row exchange, driver fold."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import hash_u64_np

    P = 64

    def partial(b: pa.Table) -> pa.Table:
        keys = pc.cast(b["user_id"], pa.string()).combine_chunks()
        h = hash_u64_np(keys)
        p = ((h >> np.uint64(32)) % np.uint64(P)).astype(np.int64)
        cnt = np.bincount(p, minlength=P).astype(np.int64)
        return pa.table({"p": pa.array(np.arange(P, dtype=np.int64)),
                         "n": pa.array(cnt)})

    cells = _read(sf_dir, "events", ["user_id"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("p").aggregate(Sum("n", alias_name="n")).to_pandas()

    ns = sorted(int(x) for x in cells["n"] if int(x) > 0)
    k = len(ns)
    med2 = ns[(k + 1) // 2 - 1] + ns[k // 2]
    return pa.table({
        "n_partitions": pa.array([k], pa.int64()),
        "min_rows": pa.array([ns[0]], pa.int64()),
        "med2_rows": pa.array([med2], pa.int64()),
        "max_rows": pa.array([ns[-1]], pa.int64()),
        "skew_micro": pa.array([2 * ns[-1] * 1_000_000 // med2],
                               pa.int64())})


def q_seasonal_anomaly(sf_dir: str):
    """Seasonally-adjusted traffic anomalies: the top-20 hours whose
    event count deviates most from their (day-of-week, hour-of-day)
    profile mean, ``resid_micro = |c·n_g − S_g|·10⁶ // n_g`` exact
    (cross-multiplied, so the profile mean is never a float), ties →
    hour ASC.  Day-of-week from the integer epoch-hour grid
    (``((eh // 24) + 4) % 7``, 1970-01-01 = Thursday) so both engines
    share one calendar rule.  Scale plan: per-batch hourly count
    partials → one calendar-bounded groupby → driver fold (the same
    dense-hourly contract as the EWMA/autocorr lanes)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        eh = (b["ts"].combine_chunks().cast(pa.int64())
              .to_numpy(zero_copy_only=False) // 3_600_000_000)
        uniq, counts = np.unique(eh, return_counts=True)
        return pa.table({"eh": pa.array(uniq.astype(np.int64)),
                         "c": pa.array(counts.astype(np.int64))})

    cells = _read(sf_dir, "events", ["ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("eh").aggregate(Sum("c", alias_name="c")) \
        .to_pandas()

    eh = cells["eh"].to_numpy(np.int64)
    c = cells["c"].to_numpy(np.int64)
    key = ((eh // 24) + 4) % 7 * 24 + eh % 24
    ng = np.zeros(7 * 24, np.int64)
    sg = np.zeros(7 * 24, np.int64)
    np.add.at(ng, key, 1)
    np.add.at(sg, key, c)
    resid = np.abs(c * ng[key] - sg[key]) * 1_000_000 // ng[key]
    order = np.lexsort((eh, -resid))[:20]
    return pa.table({
        "eh": pa.array(eh[order]),
        "n_events": pa.array(c[order]),
        "resid_micro": pa.array(resid[order])})


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of the two retrieval rankers on the
    shared 3-term query — the standard hybrid-search combiner:
    ``rrf_scaled(d) = Σ_r 10⁶ // (60 + rank_r(d))`` over the BM25
    top-20 and the conjunctive term-frequency top-20 (docs absent
    from a list contribute 0; floor division keeps every score an
    exact integer).  Top-10 by (rrf DESC, doc_id ASC) with both
    source ranks attached (0 = absent).  Scale plan: pure composition
    — both rankers already fold k-bounded results; the fusion is a
    40-row driver merge."""
    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    bm = _pd(q_bm25_topk(sf_dir)) \
        .sort_values(["score", "doc_id"], ascending=[False, True]) \
        .reset_index(drop=True)
    ts = _pd(q_term_search(sf_dir)) \
        .sort_values(["score", "doc_id"], ascending=[False, True]) \
        .reset_index(drop=True)
    r_bm = {int(d): i + 1 for i, d in enumerate(bm["doc_id"])}
    r_ts = {int(d): i + 1 for i, d in enumerate(ts["doc_id"])}
    rows = []
    for d in set(r_bm) | set(r_ts):
        rb, rt = r_bm.get(d, 0), r_ts.get(d, 0)
        s = (1_000_000 // (60 + rb) if rb else 0) \
            + (1_000_000 // (60 + rt) if rt else 0)
        rows.append((s, d, rb, rt))
    rows.sort(key=lambda r: (-r[0], r[1]))
    rows = rows[:10]
    return pa.table({
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "rrf_scaled": pa.array([r[0] for r in rows], pa.int64()),
        "rank_bm25": pa.array([r[2] for r in rows], pa.int64()),
        "rank_ts": pa.array([r[3] for r in rows], pa.int64())})


def q_source_scorecard(sf_dir: str):
    """Per-source corpus scorecard — the one-stop ingest dashboard
    row: doc/char/token/stopword totals, English share (the shared
    lang_id precedence rule), and the exact-duplicate doc count
    (docs whose md5 digest appears ≥2 times ANYWHERE in the corpus —
    cross-source copies count).  All integers.  Scale plan: one pure
    map + |sources|-row groupby for the text stats; the dup census
    ships only (digest, source, n) cells through a digest-keyed
    groupby and a hash(digest) % P fold (digests co-located, so the
    ≥2 test is partition-local) — text never shuffles."""
    from ray.data.aggregate import Sum

    from kgforge.functions.dedup import _md5_col
    from kgforge.functions.joins import _part_codes
    from kgforge.functions.textstats import (STOPWORDS, TOKEN_RE,
                                             _count_re)

    def stats_partial(b: pa.Table) -> pa.Table:
        text = b["text"]
        nt = pc.cast(_count_re(text, TOKEN_RE), pa.int64())
        ns = pc.cast(_count_re(
            text, r"\b(" + "|".join(STOPWORDS) + r")\b"), pa.int64())
        nc = pc.cast(pc.utf8_length(pc.fill_null(text, "")),
                     pa.int64())
        n_en = _count_re(text, r"\b(the|of|and)\b") \
            .to_numpy(zero_copy_only=False)
        n_de = _count_re(text, r"\b(der|die|und)\b") \
            .to_numpy(zero_copy_only=False)
        n_es = _count_re(text, r"\b(el|la|los)\b") \
            .to_numpy(zero_copy_only=False)
        is_en = ((n_en >= n_de) & (n_en >= n_es) & (n_en > 0)) \
            .astype(np.int64)
        t = pa.table({"source": b["source"], "n_docs": pa.array(
            np.ones(b.num_rows, np.int64)),
            "n_chars": nc, "n_tokens": nt, "n_stopwords": ns,
            "n_en_docs": pa.array(is_en)})
        g = t.group_by(["source"], use_threads=False).aggregate(
            [(c, "sum") for c in ["n_docs", "n_chars", "n_tokens",
                                  "n_stopwords", "n_en_docs"]])
        return g.rename_columns(
            ["source", "n_docs", "n_chars", "n_tokens",
             "n_stopwords", "n_en_docs"])

    stats = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(stats_partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_stopwords", alias_name="n_stopwords"),
            Sum("n_en_docs", alias_name="n_en_docs")).to_pandas()

    def digest_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"h": _md5_col(b["text"]), "source": b["source"]})
        g = t.group_by(["h", "source"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"h": g["h"], "source": g["source"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__p", pa.array(_part_codes(b["h"], 32)))

    def dup_fold(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("h", "ascending")])
        t = t.take(idx)
        h = t["h"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        if not len(h):
            return pa.table({"source": pa.array([], pa.string()),
                             "dup_docs": pa.array([], pa.int64())})
        starts = np.concatenate(
            [[0], np.flatnonzero(h[1:] != h[:-1]) + 1])
        tot = np.add.reduceat(n, starts)
        run_of = np.cumsum(np.isin(np.arange(len(h)), starts)) - 1
        dup = np.where(tot[run_of] >= 2, n, 0)
        g = pa.table({"source": t["source"],
                      "dup_docs": pa.array(dup.astype(np.int64))}) \
            .group_by(["source"], use_threads=False).aggregate(
            [("dup_docs", "sum")])
        return pa.table({"source": g["source"],
                         "dup_docs": g["dup_docs_sum"]})

    dups = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(digest_partial, batch_format="pyarrow") \
        .groupby(["h", "source"]).aggregate(Sum("n", alias_name="n")) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(dup_fold, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("dup_docs", alias_name="dup_docs")).to_pandas()

    m = stats.merge(dups, on="source", how="left").fillna(0) \
        .sort_values("source").reset_index(drop=True)
    return pa.table({
        "source": pa.array(m["source"].tolist(), pa.string()),
        "n_docs": pa.array(m["n_docs"].to_numpy(np.int64)),
        "n_chars": pa.array(m["n_chars"].to_numpy(np.int64)),
        "n_tokens": pa.array(m["n_tokens"].to_numpy(np.int64)),
        "n_stopwords": pa.array(m["n_stopwords"].to_numpy(np.int64)),
        "n_en_docs": pa.array(m["n_en_docs"].to_numpy(np.int64)),
        "dup_docs": pa.array(m["dup_docs"].to_numpy(np.int64))})


def q_transition_entropy(sf_dir: str):
    """Conditional next-event entropy per predecessor state — the
    predictability census completing the Markov family (transitions →
    stationary → entropy): with the shared ``L(x) = round(ln(x)·1e6)``
    grid, ``H(next|prev) = (T·L(T) − Σ c·L(c)) // T`` exact-integer
    over the per-prev transition counts.  Scale plan: rides the
    event_transitions exchange (type²-bounded cells), entropy folds
    on the driver."""
    import math

    cells = q_event_transitions(sf_dir).to_pandas()

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    out = {}
    for prev, grp in cells.groupby("prev_type"):
        ns = [int(x) for x in grp["n"]]
        t = sum(ns)
        out[prev] = (t, len(ns),
                     (t * L(t) - sum(c * L(c) for c in ns)) // t)
    names = sorted(out)
    return pa.table({
        "prev_type": pa.array(names, pa.string()),
        "n_transitions": pa.array([out[p][0] for p in names],
                                  pa.int64()),
        "n_successors": pa.array([out[p][1] for p in names],
                                 pa.int64()),
        "entropy_micro": pa.array([out[p][2] for p in names],
                                  pa.int64())})


def q_session_entry_exit(sf_dir: str):
    """Landing→exit flow table with bounce counts over 30-min-gap
    sessions — see
    :func:`kgforge.functions.events.session_entry_exit_ds`."""
    return F_events.session_entry_exit_ds(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"]))


def q_kg_neighbor_degree(sf_dir: str):
    """Average-neighbor-degree curve knn(k) of the entity graph — see
    :func:`kgforge.functions.graph.neighbor_degree_ds`."""
    from kgforge.functions.graph import neighbor_degree_ds

    return neighbor_degree_ds(_entity_edges_for(sf_dir))


def q_theil_sen_nation(sf_dir: str):
    """Per-nation Theil–Sen trend of monthly order revenue: the
    median of all pairwise month-to-month slopes — the robust trend
    estimator an OLS fit (``group_regression``) can't give when a
    few promo months spike.  Slope per (i < j) month pair is the
    sign-magnitude truncating integer
    ``sign(Δcents) · |Δcents|·10⁶ // Δmonth``; the median uses the
    med2 convention (sum of the two middle order stats — 2× the
    median at odd pair counts), so every value is an exact integer.
    Rows: (n_name, n_months, n_pairs, slope_med2), n_name ASC;
    nations with < 2 active months are dropped.

    Scale plan: orders partial-aggregate per batch to (custkey, ym,
    cents) combiner rows, ONE custkey-hash cogroup attaches the
    nation key (the only corpus-scale exchange), then a
    nations×months-bounded groupby; the O(months²) pair loop runs on
    the driver over ≤ 25×84 cells in exact Python ints (Δcents×10⁶
    overflows int64 past ~$92 B/month)."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import cogroup_partition_ds

    def o_partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["o_orderdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        ym = (us // 86_400_000_000).astype("datetime64[D]") \
            .astype("datetime64[M]").astype(np.int64) + 1970 * 12
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        t = pa.table({"ck": b["o_custkey"], "ym": pa.array(ym),
                      "c": pa.array(cents)})
        g = t.group_by(["ck", "ym"], use_threads=False).aggregate(
            [("c", "sum")])
        return pa.table({"ck": g["ck"], "ym": g["ym"], "c": g["c_sum"]})

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(o_partial, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(
            lambda b: pa.table({
                "ck": b["c_custkey"],
                "dg": pc.cast(b["c_nationkey"], pa.int64())}),
            batch_format="pyarrow")

    def attach_nk(t: pa.Table, starts, nl, nr) -> pa.Table:
        joined = _attach_right(t, starts, nl, nr, ["ym", "c"],
                               ("dg", "nk"), ["ym", "c"])
        g = joined.group_by(["nk", "ym"], use_threads=False) \
            .aggregate([("c", "sum")])
        return pa.table({"nk": g["nk"], "ym": g["ym"], "c": g["c_sum"]})

    cells = cogroup_partition_ds(
        orders, cust, "ck", "ck", attach_nk, ["ym", "c"], ["dg"],
        left_schema=pa.schema([("ck", pa.int64()), ("ym", pa.int64()),
                               ("c", pa.int64())]),
        right_schema=pa.schema([("ck", pa.int64()),
                                ("dg", pa.int64())])) \
        .groupby(["nk", "ym"]).aggregate(Sum("c", alias_name="cents")) \
        .to_pandas()

    names = {int(r["n_nationkey"]): r["n_name"]
             for _, r in _read(sf_dir, "nation",
                               ["n_nationkey", "n_name"])
             .to_pandas().iterrows()}
    rows = []
    for nk, grp in cells.groupby("nk"):
        grp = grp.sort_values("ym")
        ym = [int(v) for v in grp["ym"]]
        cv = [int(v) for v in grp["cents"]]
        m = len(ym)
        if m < 2:
            continue
        slopes = []
        for i in range(m):
            for j in range(i + 1, m):
                dy, dx = cv[j] - cv[i], ym[j] - ym[i]
                q = abs(dy) * 1_000_000 // dx
                slopes.append(q if dy >= 0 else -q)
        slopes.sort()
        k = len(slopes)
        med2 = slopes[(k + 1) // 2 - 1] + slopes[k // 2]
        rows.append((names[int(nk)], m, k, med2))
    rows.sort()
    return pa.table({
        "n_name": pa.array([r[0] for r in rows], pa.string()),
        "n_months": pa.array([r[1] for r in rows], pa.int64()),
        "n_pairs": pa.array([r[2] for r in rows], pa.int64()),
        "slope_med2": pa.array([r[3] for r in rows], pa.int64())})


def q_rank_stability(sf_dir: str):
    """Kendall-tau rank stability of the top-50 suppliers (by total
    discounted revenue, ties → suppkey ASC) between the early period
    (ship date < 1995-01-01) and the late period — the
    leaderboard-churn monitor.  Ranks within the club are total
    orders (revenue DESC, suppkey ASC), so no tau tie terms;
    ``tau_ppm = sign(C−D) · |C−D|·10⁶ // n_pairs`` (truncate toward
    zero, DuckDB // semantics).  One row: (n_items, n_pairs,
    n_concordant, n_discordant, tau_ppm).

    Scale plan: one streaming pass over lineitem with per-batch
    (suppkey, early/late cents) combiner partials; the groupby output
    is supplier-bounded (a dimension), and the O(50²) pair census
    runs on the driver."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    cut_us = int(np.datetime64("1995-01-01", "us").astype(np.int64))

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["l_shipdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        cents = round_away(
            b["l_extendedprice"].combine_chunks()
            .to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].combine_chunks()
               .to_numpy(zero_copy_only=False)) * 100,
            0).astype(np.int64)
        early = us < cut_us
        t = pa.table({"sk": b["l_suppkey"],
                      "a": pa.array(np.where(early, cents, 0)),
                      "b": pa.array(np.where(early, 0, cents))})
        g = t.group_by(["sk"], use_threads=False).aggregate(
            [("a", "sum"), ("b", "sum")])
        return pa.table({"sk": g["sk"], "a": g["a_sum"],
                         "b": g["b_sum"]})

    sup = _read(sf_dir, "lineitem",
                ["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("sk").aggregate(Sum("a", alias_name="ra"),
                                 Sum("b", alias_name="rb")) \
        .to_pandas()
    sup["tot"] = sup["ra"] + sup["rb"]
    top = sup.sort_values(["tot", "sk"],
                          ascending=[False, True]).head(50)
    ra = top.sort_values(["ra", "sk"], ascending=[False, True])
    ka = {int(s): i for i, s in enumerate(ra["sk"], 1)}
    rb = top.sort_values(["rb", "sk"], ascending=[False, True])
    kb = {int(s): i for i, s in enumerate(rb["sk"], 1)}
    sks = [int(s) for s in top["sk"]]
    conc = disc = 0
    for i in range(len(sks)):
        for j in range(i + 1, len(sks)):
            s = ((ka[sks[i]] - ka[sks[j]])
                 * (kb[sks[i]] - kb[sks[j]]))
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    n_pairs = len(sks) * (len(sks) - 1) // 2
    d = conc - disc
    tau = (abs(d) * 1_000_000 // n_pairs if n_pairs else 0)
    if d < 0:
        tau = -tau
    return pa.table({
        "n_items": pa.array([len(sks)], pa.int64()),
        "n_pairs": pa.array([n_pairs], pa.int64()),
        "n_concordant": pa.array([conc], pa.int64()),
        "n_discordant": pa.array([disc], pa.int64()),
        "tau_ppm": pa.array([tau], pa.int64())})


def q_spearman_qty_discount(sf_dir: str):
    """Spearman rank correlation between lineitem quantity and
    discount — the monotone-association check Pearson
    (``numeric_corr``) misses under nonlinear pricing curves.  Both
    columns have bounded integer domains (quantity 1..50, discount
    0..10 pp), so the EXACT tie-corrected rho folds from the ≤ 50×11
    joint histogram: doubled average ranks ``r2(v) = 2·cb + c + 1``
    stay integers, the moment sums are arbitrary-precision Python
    ints (Σc·r² passes int64 near 600 M rows), and the final double
    derives from the same integers as the SQL twin's HUGEINTs —
    bit-identical before the shared round(·, 6).  One row: (n, rho).

    Scale plan: one streaming pass, per-batch joint-histogram
    combiner partials, one ≤ 550-cell groupby — no sort, no global
    rank pass."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        q = np.rint(b["l_quantity"].combine_chunks()
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        d = round_away(b["l_discount"].combine_chunks()
                       .to_numpy(zero_copy_only=False) * 100,
                       0).astype(np.int64)
        t = pa.table({"q": pa.array(q), "d": pa.array(d),
                      "one": pa.array(np.ones(len(q), np.int64))})
        g = t.group_by(["q", "d"], use_threads=False).aggregate(
            [("one", "sum")])
        return pa.table({"q": g["q"], "d": g["d"], "c": g["one_sum"]})

    cells = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["q", "d"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()

    qv = cells["q"].to_numpy(np.int64)
    dv = cells["d"].to_numpy(np.int64)
    cv = [int(x) for x in cells["c"]]

    def rank2(vals):
        tot = {}
        for v, c in zip(vals, cv):
            tot[int(v)] = tot.get(int(v), 0) + c
        r2, cb = {}, 0
        for v in sorted(tot):
            r2[v] = 2 * cb + tot[v] + 1
            cb += tot[v]
        return r2

    rq, rd = rank2(qv), rank2(dv)
    n = sx = sy = sxx = syy = sxy = 0
    for q, d, c in zip(qv, dv, cv):
        x, y = rq[int(q)], rd[int(d)]
        n += c
        sx += c * x
        sy += c * y
        sxx += c * x * x
        syy += c * y * y
        sxy += c * x * y
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    rho = float(np.float64(float(num))
                / np.sqrt(np.float64(float(dx))
                          * np.float64(float(dy))))
    return pd.DataFrame({
        "n": pd.Series([n], dtype=np.int64),
        "rho": [float(np.round(np.float64(rho), 6))]})


def q_k_anonymity(sf_dir: str):
    """k-anonymity census of the customer table under the
    quasi-identifier (nation, market segment) — the re-identification
    risk scan a privacy review runs before releasing training data:
    equivalence-class count, the smallest class, and how many classes
    / rows sit below k = 5 and k = 50.  One row, exact integers.

    Scale plan: per-batch QI-histogram combiner partials collapse to
    a ≤ nations×segments groupby; the driver folds bounded cells —
    the table itself never shuffles."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"nk": pc.cast(b["c_nationkey"], pa.int64()),
                      "seg": b["c_mktsegment"],
                      "one": pa.array(
                          np.ones(b.num_rows, np.int64))})
        g = t.group_by(["nk", "seg"], use_threads=False).aggregate(
            [("one", "sum")])
        return pa.table({"nk": g["nk"], "seg": g["seg"],
                         "c": g["one_sum"]})

    cells = _read(sf_dir, "customer",
                  ["c_nationkey", "c_mktsegment"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["nk", "seg"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    c = cells["c"].to_numpy(np.int64)
    return pa.table({
        "n_rows": pa.array([int(c.sum())], pa.int64()),
        "n_classes": pa.array([len(c)], pa.int64()),
        "min_class": pa.array([int(c.min()) if len(c) else 0],
                              pa.int64()),
        "max_class": pa.array([int(c.max()) if len(c) else 0],
                              pa.int64()),
        "n_classes_lt5": pa.array([int((c < 5).sum())], pa.int64()),
        "n_rows_lt5": pa.array([int(c[c < 5].sum())], pa.int64()),
        "n_classes_lt50": pa.array([int((c < 50).sum())], pa.int64()),
        "n_rows_lt50": pa.array([int(c[c < 50].sum())], pa.int64())})


def q_split_leakage(sf_dir: str):
    """Train/test contamination check of the deterministic md5 doc
    split (``hash_split``'s 80/20 rule) against normalized-exact
    duplicate content (``dedup_normalized``'s digest): test documents
    whose normalized text also appears in train are leaked — the
    eval-integrity gate every corpus release needs.  One row:
    (n_train, n_test, n_leaked_test, leak_ppm, n_shared_classes).

    Scale plan: one digest-keyed groupby of (train, test) count
    partials — only (digest, 2 ints) rows shuffle, never text; the
    class stream folds through per-batch scalar partials, so no
    digest-cardinality collection anywhere."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import md5_u64_arr
    from kgforge.functions.dedup import _md5_col, normalize_text

    def digest_split(b: pa.Table) -> pa.Table:
        texts = [normalize_text(t) for t in b["text"].to_pylist()]
        buckets = (md5_u64_arr(pc.cast(b["doc_id"], pa.string()),
                               nhex=8) % np.uint64(100)) \
            .astype(np.int64)
        tr = (buckets < 80).astype(np.int64)
        t = pa.table({"h": _md5_col(texts), "tr": pa.array(tr),
                      "te": pa.array(1 - tr)})
        g = t.group_by(["h"], use_threads=False).aggregate(
            [("tr", "sum"), ("te", "sum")])
        return pa.table({"h": g["h"], "tr": g["tr_sum"],
                         "te": g["te_sum"]})

    classes = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(digest_split, batch_format="pyarrow") \
        .groupby("h").aggregate(Sum("tr", alias_name="nt"),
                                Sum("te", alias_name="nv"))

    def fold(b: pa.Table) -> pa.Table:
        nt = b["nt"].combine_chunks().to_numpy(zero_copy_only=False)
        nv = b["nv"].combine_chunks().to_numpy(zero_copy_only=False)
        shared = (nt > 0) & (nv > 0)
        return pa.table({
            "n_train": pa.array([int(nt.sum())], pa.int64()),
            "n_test": pa.array([int(nv.sum())], pa.int64()),
            "n_leaked_test": pa.array([int(nv[shared].sum())],
                                      pa.int64()),
            "n_shared_classes": pa.array([int(shared.sum())],
                                         pa.int64())})

    parts = classes.map_batches(fold, batch_format="pyarrow") \
        .to_pandas()
    n_train = int(parts["n_train"].sum())
    n_test = int(parts["n_test"].sum())
    leaked = int(parts["n_leaked_test"].sum())
    return pa.table({
        "n_train": pa.array([n_train], pa.int64()),
        "n_test": pa.array([n_test], pa.int64()),
        "n_leaked_test": pa.array([leaked], pa.int64()),
        "leak_ppm": pa.array(
            [leaked * 1_000_000 // n_test if n_test else 0],
            pa.int64()),
        "n_shared_classes": pa.array(
            [int(parts["n_shared_classes"].sum())], pa.int64())})


def q_cohort_ltv(sf_dir: str):
    """Customer-lifetime-value table: cohort = month of a customer's
    FIRST order; per (cohort, months-since-first) the exact cents
    revenue plus the running cumulative — the acquisition-quality
    curve marketing reads next to ``cohort_retention``.  Rows ordered
    (cohort_year, cohort_month, months_since).

    Scale plan: orders partial-combine per batch to (custkey, ym,
    cents) rows, then ONE custkey-hash partition; inside a partition
    the cohort (= min ym per customer) falls out of the (ck, ym) sort
    as the run head — no separate firsts pass, no self-join.  The
    global exchange after it is calendar²-bounded (cohort × offset
    cells)."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import _part_codes

    P = 64

    def o_partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["o_orderdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        ym = (us // 86_400_000_000).astype("datetime64[D]") \
            .astype("datetime64[M]").astype(np.int64) + 1970 * 12
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        t = pa.table({"ck": b["o_custkey"], "ym": pa.array(ym),
                      "c": pa.array(cents)})
        g = t.group_by(["ck", "ym"], use_threads=False).aggregate(
            [("c", "sum")])
        out = pa.table({"ck": g["ck"], "ym": g["ym"],
                        "c": g["c_sum"]})
        return out.append_column(
            "__p", pa.array(_part_codes(out["ck"], P)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("ck", "ascending"),
                                            ("ym", "ascending")])
        t = t.take(idx)
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        ym = t["ym"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(ck)
        if n == 0:
            return pa.table({"cohort": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64()),
                             "nc": pa.array([], pa.int64())})
        brk = np.ones(n, dtype=bool)
        brk[1:] = ck[1:] != ck[:-1]
        starts = np.flatnonzero(brk)
        runlens = np.diff(np.concatenate([starts, [n]]))
        cohort = np.repeat(ym[starts], runlens)
        k = ym - cohort
        nc = np.zeros(n, dtype=np.int64)
        nc[starts] = 1          # one customer per run, at its k=0 cell
        g = pa.table({"cohort": pa.array(cohort), "k": pa.array(k),
                      "rev": pa.array(c), "nc": pa.array(nc)}) \
            .group_by(["cohort", "k"], use_threads=False) \
            .aggregate([("rev", "sum"), ("nc", "sum")])
        return pa.table({"cohort": g["cohort"], "k": g["k"],
                         "rev": g["rev_sum"], "nc": g["nc_sum"]})

    cells = _read(sf_dir, "orders",
                  ["o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(o_partial, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby(["cohort", "k"]).aggregate(
            Sum("rev", alias_name="rev"),
            Sum("nc", alias_name="nc")).to_pandas()

    cells = cells.sort_values(["cohort", "k"])
    n_custs = {int(co): int(g.loc[g["k"] == 0, "nc"].sum())
               for co, g in cells.groupby("cohort")}
    cum, out = {}, []
    for _, r in cells.iterrows():
        co, k, rev = int(r["cohort"]), int(r["k"]), int(r["rev"])
        cum[co] = cum.get(co, 0) + rev
        out.append((co // 12, co % 12 + 1, k, n_custs[co], rev,
                    cum[co]))
    return pa.table({
        "cohort_year": pa.array([r[0] for r in out], pa.int64()),
        "cohort_month": pa.array([r[1] for r in out], pa.int64()),
        "months_since": pa.array([r[2] for r in out], pa.int64()),
        "n_custs": pa.array([r[3] for r in out], pa.int64()),
        "rev_cents": pa.array([r[4] for r in out], pa.int64()),
        "cum_cents": pa.array([r[5] for r in out], pa.int64())})


def q_filter_funnel(sf_dir: str):
    """Data-prep filter-funnel observability: how many documents
    survive each successive corpus gate — ALL → Gopher quality rules
    (the ``gopher_rules`` census' 4 rules) → + lang = 'en' → + one
    representative per normalized-exact-dup class
    (``dedup_normalized``'s digest).  Rows: (stage, gate, n_docs,
    n_dropped) — the one-glance answer to "where did my corpus go?".

    Scale plan: one streaming pass computes the integer-exact rule
    flags and the digest per batch, partial-combining to (digest, n,
    q, ql) rows; ONE digest-keyed groupby (digests only — text never
    shuffles), then scalar per-batch folds — the distinct count is
    Σ(ql > 0), so no digest-cardinality collection anywhere."""
    from ray.data.aggregate import Sum

    from kgforge.functions.dedup import _md5_col, normalize_text
    from kgforge.functions.textstats import (
        GOPHER_MAX_MWL, GOPHER_MAX_WORDS, GOPHER_MIN_MWL,
        GOPHER_MIN_WORDS, GOPHER_STOP_PCT, GOPHER_STOPWORDS,
        GOPHER_UNIQ_PCT,
    )

    stop_set = pa.array(list(GOPHER_STOPWORDS), pa.string())

    def partial(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b["text"], "")
        n = len(text)
        n_spaces = pc.count_substring(text, pattern=" ") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = n_spaces + 1
        sum_wl = pc.utf8_length(text) \
            .to_numpy(zero_copy_only=False).astype(np.int64) - n_spaces
        words = pc.split_pattern(text, pattern=" ")
        lens = pc.list_value_length(words) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(words).combine_chunks()
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) \
            .astype(np.int64)
        stop_flags = pc.is_in(flat, value_set=stop_set) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_stop = np.add.reduceat(stop_flags, starts) if len(flat) \
            else np.zeros(n, dtype=np.int64)
        codes = flat.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        span = int(codes.max()) + 1 if len(codes) else 1
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        uniq_keys = np.unique(doc_of * span + codes)
        n_uniq = np.bincount(uniq_keys // span, minlength=n) \
            .astype(np.int64)
        q = ((n_words >= GOPHER_MIN_WORDS)
             & (n_words <= GOPHER_MAX_WORDS)
             & (sum_wl >= GOPHER_MIN_MWL * n_words)
             & (sum_wl <= GOPHER_MAX_MWL * n_words)
             & (n_stop * 100 >= GOPHER_STOP_PCT * n_words)
             & (n_uniq * 100 >= GOPHER_UNIQ_PCT * n_words)) \
            .astype(np.int64)
        en = pc.fill_null(pc.equal(b["lang"], "en"), False) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [normalize_text(t)
                 for t in b["text"].to_pylist()]
        t = pa.table({"h": _md5_col(texts),
                      "n": pa.array(np.ones(n, np.int64)),
                      "q": pa.array(q), "ql": pa.array(q * en)})
        g = t.group_by(["h"], use_threads=False).aggregate(
            [("n", "sum"), ("q", "sum"), ("ql", "sum")])
        return pa.table({"h": g["h"], "n": g["n_sum"],
                         "q": g["q_sum"], "ql": g["ql_sum"]})

    classes = _read(sf_dir, "documents", ["text", "lang"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("h").aggregate(Sum("n", alias_name="n"),
                                Sum("q", alias_name="q"),
                                Sum("ql", alias_name="ql"))

    def fold(b: pa.Table) -> pa.Table:
        ql = b["ql"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([int(pc.sum(b["n"]).as_py() or 0)],
                          pa.int64()),
            "q": pa.array([int(pc.sum(b["q"]).as_py() or 0)],
                          pa.int64()),
            "ql": pa.array([int(ql.sum())], pa.int64()),
            "u": pa.array([int((ql > 0).sum())], pa.int64())})

    parts = classes.map_batches(fold, batch_format="pyarrow") \
        .to_pandas()
    n, q = int(parts["n"].sum()), int(parts["q"].sum())
    ql, u = int(parts["ql"].sum()), int(parts["u"].sum())
    stages = [(0, "all", n, 0), (1, "quality", q, n - q),
              (2, "quality+lang", ql, q - ql),
              (3, "unique", u, ql - u)]
    return pa.table({
        "stage": pa.array([s[0] for s in stages], pa.int64()),
        "gate": pa.array([s[1] for s in stages], pa.string()),
        "n_docs": pa.array([s[2] for s in stages], pa.int64()),
        "n_dropped": pa.array([s[3] for s in stages], pa.int64())})


def q_token_burstiness(sf_dir: str):
    """Church–Gale burstiness of the 20 highest-document-frequency
    tokens: variance-to-mean ratio of the per-document count (zeros
    included) — content words clump (VMR ≫ 1), function words spread
    (VMR ≈ 1); the signal a naive TF filter misses.  With N docs,
    per-token total ``tot`` and per-doc-count square sum ``sq``,
    ``vmr_micro = (N·sq − tot²)·10⁶ // (N·tot)`` — nonnegative by
    Cauchy–Schwarz, so floor == truncate and both engines hash
    bit-identically.  Rows ordered (n_docs DESC, token ASC).

    Scale plan: per-batch (doc, token)-count partials collapse to one
    vocab-bounded token groupby; per-block partial top-20 so the
    driver merge sees blocks×20 rows; the VMR fold runs in exact
    Python ints (N·sq overflows int64 past ~10⁹ doc-occurrences)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        g = pa.table({"d": par, "w": flat}) \
            .group_by(["d", "w"], use_threads=False) \
            .aggregate([([], "count_all")])
        c = pc.cast(g["count_all"], pa.int64())
        t = pa.table({"token": g["w"],
                      "df": pa.array(np.ones(len(c), np.int64)),
                      "tot": c, "sq": pc.multiply(c, c)})
        g2 = t.group_by(["token"], use_threads=False).aggregate(
            [("df", "sum"), ("tot", "sum"), ("sq", "sum")])
        return pa.table({"token": g2["token"], "df": g2["df_sum"],
                         "tot": g2["tot_sum"], "sq": g2["sq_sum"]})

    cells = _read(sf_dir, "documents", ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("df", alias_name="df"),
                                    Sum("tot", alias_name="tot"),
                                    Sum("sq", alias_name="sq"))

    def topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= 20:
            return b
        df = b["df"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort(
            (np.asarray(b["token"].to_pylist()), -df))
        return b.take(pa.array(order[:20]))

    top = cells.map_batches(topk, batch_format="pyarrow").to_pandas()
    top = top.sort_values(["df", "token"],
                          ascending=[False, True]).head(20)
    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    rows = []
    for _, r in top.iterrows():
        tot, sq = int(r["tot"]), int(r["sq"])
        vmr = (n_docs * sq - tot * tot) * 1_000_000 // (n_docs * tot)
        rows.append((r["token"], int(r["df"]), tot, sq, vmr))
    return pa.table({
        "token": pa.array([r[0] for r in rows], pa.string()),
        "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        "n_occurrences": pa.array([r[2] for r in rows], pa.int64()),
        "sum_sq": pa.array([r[3] for r in rows], pa.int64()),
        "vmr_micro": pa.array([r[4] for r in rows], pa.int64())})


def q_type_dow_mi(sf_dir: str):
    """Mutual information between event type and day-of-week on the
    shared ``L(x) = round(ln(x)·10⁶)`` grid — the single-number
    dependence census next to ``type_hour_chi2``'s test statistic:
    ``mi_micro = sign·(|Σ n·(L(n)+L(N)−L(row)−L(col))| // N)``
    (sign-magnitude: MI ≥ 0 analytically but the rounded grid can dip
    a near-zero sum below 0; truncation toward zero matches DuckDB).
    One row: (n_events, n_types, n_dows, mi_micro).

    Scale plan: per-batch (type, dow) histogram partials → one
    type×7-bounded groupby; the L-grid fold runs on the driver."""
    import math

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        dow = ((b["ts"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000 + 4)
               % 7)
        t = pa.table({"et": b["event_type"],
                      "dow": pa.array(dow.astype(np.int64)),
                      "one": pa.array(np.ones(len(dow), np.int64))})
        g = t.group_by(["et", "dow"], use_threads=False).aggregate(
            [("one", "sum")])
        return pa.table({"et": g["et"], "dow": g["dow"],
                         "n": g["one_sum"]})

    cells = _read(sf_dir, "events", ["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["et", "dow"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    n_tot = int(cells["n"].sum())
    row = cells.groupby("et")["n"].sum().to_dict()
    col = cells.groupby("dow")["n"].sum().to_dict()
    ln_t = L(n_tot)
    s = 0
    for _, r in cells.iterrows():
        n = int(r["n"])
        s += n * (L(n) + ln_t - L(int(row[r["et"]]))
                  - L(int(col[r["dow"]])))
    mi = abs(s) // n_tot
    if s < 0:
        mi = -mi
    return pa.table({
        "n_events": pa.array([n_tot], pa.int64()),
        "n_types": pa.array([len(row)], pa.int64()),
        "n_dows": pa.array([len(col)], pa.int64()),
        "mi_micro": pa.array([mi], pa.int64())})


_FD_CANDIDATES = (
    ("part", "p_brand", "p_type"),
    ("part", "p_name", "p_brand"),
    ("part", "p_type", "p_size"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("events", "user_id", "event_type"),
)


def q_fd_audit(sf_dir: str):
    """Functional-dependency audit over a fixed candidate list — the
    schema-inference / data-contract check (does X determine Y?): per
    candidate ``lhs → rhs`` the distinct-lhs count, distinct-pair
    count, how many lhs values violate the FD (> 1 rhs), the worst
    fan-out, and ``fd_ppm`` = share of lhs values that hold it.  Rows
    ordered by the fd label.

    Scale plan: per candidate, per-batch partial-distinct (lhs, rhs)
    pairs → ONE pair groupby (distinct pairs only shuffle, never the
    table) → per-batch per-lhs counts → one lhs groupby → scalar
    folds.  Values are strings/ints cast to string so one output
    schema fits every candidate."""
    from ray.data.aggregate import Count, Sum

    out = []
    for table, lhs, rhs in _FD_CANDIDATES:
        def dpair(b: pa.Table, lhs=lhs, rhs=rhs) -> pa.Table:
            t = pa.table({"l": pc.cast(b[lhs], pa.string()),
                          "r": pc.cast(b[rhs], pa.string())})
            return t.group_by(["l", "r"],
                              use_threads=False).aggregate([])

        pairs = _read(sf_dir, table, [lhs, rhs]) \
            .map_batches(dpair, batch_format="pyarrow") \
            .groupby(["l", "r"]).aggregate(Count(alias_name="__c"))

        def per_lhs(b: pa.Table) -> pa.Table:
            g = b.select(["l"]).group_by(["l"], use_threads=False) \
                .aggregate([([], "count_all")])
            return pa.table({"l": g["l"],
                             "c": pc.cast(g["count_all"],
                                          pa.int64())})

        stats = pairs.map_batches(per_lhs, batch_format="pyarrow") \
            .groupby("l").aggregate(Sum("c", alias_name="c"))

        def fold(b: pa.Table) -> pa.Table:
            c = b["c"].combine_chunks() \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "n_lhs": pa.array([len(c)], pa.int64()),
                "n_pairs": pa.array([int(c.sum())], pa.int64()),
                "viol": pa.array([int((c > 1).sum())], pa.int64()),
                "maxc": pa.array([int(c.max()) if len(c) else 0],
                                 pa.int64())})

        p = stats.map_batches(fold, batch_format="pyarrow") \
            .to_pandas()
        n_lhs = int(p["n_lhs"].sum())
        out.append((f"{table}.{lhs}->{rhs}", n_lhs,
                    int(p["n_pairs"].sum()), int(p["viol"].sum()),
                    int(p["maxc"].max()) if len(p) else 0))
    out.sort()
    return pa.table({
        "fd": pa.array([r[0] for r in out], pa.string()),
        "n_lhs": pa.array([r[1] for r in out], pa.int64()),
        "n_pairs": pa.array([r[2] for r in out], pa.int64()),
        "n_violating_lhs": pa.array([r[3] for r in out], pa.int64()),
        "max_rhs_per_lhs": pa.array([r[4] for r in out], pa.int64()),
        "fd_ppm": pa.array(
            [(r[1] - r[3]) * 1_000_000 // r[1] if r[1] else 0
             for r in out], pa.int64())})


def q_markov_order2_gain(sf_dir: str):
    """Second-order memory gain of the per-user event process on the
    shared ``L(x) = round(ln(x)·10⁶)`` grid: over all positions with
    TWO predecessors, ``h1 = H(next | prev)``, ``h2 = H(next | prev2,
    prev1)`` and ``gain = h1 − h2`` — near zero ⇒ the first-order
    Markov family (``event_transitions`` → ``markov_stationary`` →
    ``transition_entropy``) already captures the dynamics.  Each H is
    sign-magnitude ``Σ_ctx (t·L(t) − Σ c·L(c)) // N`` (exact
    integers; truncation toward zero matches DuckDB).  One row:
    (n_triples, h1_micro, h2_micro, gain_micro).

    Scale plan: ONE user-hash partition; inside a partition the
    (prev2, prev1, next) triple stream is a vectorized shift over the
    (user, ts, id) sort; everything after is a type³-bounded cell
    exchange + driver fold."""
    import math

    from ray.data.aggregate import Sum
    from kgforge.functions.joins import _part_codes

    P = 64

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({"u": b["user_id"],
                      "ts": pc.cast(pc.cast(b["ts"],
                                            pa.timestamp("us")),
                                    pa.int64()),
                      "eid": b["event_id"], "et": b["event_type"]})
        return t.append_column("__p",
                               pa.array(_part_codes(t["u"], P)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"),
                                            ("ts", "ascending"),
                                            ("eid", "ascending")])
        t = t.take(idx)
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        et = t["et"].combine_chunks()
        n = len(u)
        if n < 3:
            return pa.table({"p2": pa.array([], pa.string()),
                             "p1": pa.array([], pa.string()),
                             "nx": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ok = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        pos = np.flatnonzero(ok) + 2
        g = pa.table({
            "p2": et.take(pa.array(pos - 2)),
            "p1": et.take(pa.array(pos - 1)),
            "nx": et.take(pa.array(pos)),
            "one": pa.array(np.ones(len(pos), np.int64))}) \
            .group_by(["p2", "p1", "nx"], use_threads=False) \
            .aggregate([("one", "sum")])
        return pa.table({"p2": g["p2"], "p1": g["p1"],
                         "nx": g["nx"], "n": g["one_sum"]})

    cells = _read(sf_dir, "events",
                  ["user_id", "ts", "event_id", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby(["p2", "p1", "nx"]).aggregate(
            Sum("n", alias_name="n")).to_pandas()

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    def cond_entropy(ctx_cols):
        ctx_tot = cells.groupby(ctx_cols)["n"].sum()
        out_tot = cells.groupby(ctx_cols + ["nx"])["n"].sum()
        s = sum(int(t) * L(int(t)) for t in ctx_tot)
        s -= sum(int(c) * L(int(c)) for c in out_tot)
        return s

    n_tot = int(cells["n"].sum())
    if n_tot == 0:
        h1 = h2 = 0
    else:
        def div(s):
            q = abs(s) // n_tot
            return q if s >= 0 else -q
        h1 = div(cond_entropy(["p1"]))
        h2 = div(cond_entropy(["p2", "p1"]))
    return pa.table({
        "n_triples": pa.array([n_tot], pa.int64()),
        "h1_micro": pa.array([h1], pa.int64()),
        "h2_micro": pa.array([h2], pa.int64()),
        "gain_micro": pa.array([h1 - h2], pa.int64())})


def q_label_centroid_dist(sf_dir: str):
    """Pairwise squared distance between per-label embedding
    centroids on the shared micro grid — the class-separation census
    (collapsed centroids ⇒ the labels are not linearly separable;
    read next to ``embedding_drift`` / ``kmeans_clusters``).
    ``dist2_micro2(a, b) = Σ_i (s_ia·n_b − s_ib·n_a)² //
    (n_a²·n_b²)`` — exact integers from per-label dimension sums, so
    both engines hash bit-identically.  Rows ordered (label_a,
    label_b), a < b.

    Scale plan: one streaming pass; each batch ships labels×(d+1)
    partial rows (dim −1 carries the count), ONE bounded groupby;
    the pairwise fold runs on the driver in Python ints (the cross
    term passes int64 at ~3k rows/label and int128 near 10⁶ — the
    SQL twin's HUGEINT bound; the Ray side is arbitrary
    precision)."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        flat = round_away(
            pc.list_flatten(col).to_numpy(zero_copy_only=False)
            .astype(np.float64) * 1_000_000, 0).astype(np.int64)
        par = pc.list_parent_indices(col) \
            .to_numpy(zero_copy_only=False)
        lab = pc.cast(b["label"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        lens = np.bincount(par, minlength=b.num_rows)
        d = int(lens[0]) if len(lens) else 0
        dim = np.concatenate(
            [np.arange(d, dtype=np.int64)] * b.num_rows) \
            if b.num_rows else np.zeros(0, np.int64)
        t = pa.table({"label": pa.array(np.repeat(lab, lens)),
                      "dim": pa.array(dim), "s": pa.array(flat)})
        g = t.group_by(["label", "dim"], use_threads=False) \
            .aggregate([("s", "sum")])
        cnt = pa.table({
            "label": pa.array(lab),
            "dim": pa.array(np.full(len(lab), -1, np.int64)),
            "s": pa.array(np.ones(len(lab), np.int64))}) \
            .group_by(["label", "dim"], use_threads=False) \
            .aggregate([("s", "sum")])
        return pa.concat_tables([
            pa.table({"label": g["label"], "dim": g["dim"],
                      "s": g["s_sum"]}),
            pa.table({"label": cnt["label"], "dim": cnt["dim"],
                      "s": cnt["s_sum"]})])

    cells = _read(sf_dir, "embeddings", ["embedding", "label"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["label", "dim"]).aggregate(Sum("s", alias_name="s")) \
        .to_pandas()

    ns = {int(r["label"]): int(r["s"])
          for _, r in cells[cells["dim"] == -1].iterrows()}
    sums = {}
    for _, r in cells[cells["dim"] >= 0].iterrows():
        sums.setdefault(int(r["label"]), {})[int(r["dim"])] = \
            int(r["s"])
    labels = sorted(ns)
    rows = []
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            na, nb = ns[a], ns[b]
            d2 = sum((sums[a].get(k, 0) * nb
                      - sums[b].get(k, 0) * na) ** 2
                     for k in set(sums[a]) | set(sums[b]))
            rows.append((a, b, na, nb, d2 // (na * na * nb * nb)))
    return pa.table({
        "label_a": pa.array([r[0] for r in rows], pa.int64()),
        "label_b": pa.array([r[1] for r in rows], pa.int64()),
        "n_a": pa.array([r[2] for r in rows], pa.int64()),
        "n_b": pa.array([r[3] for r in rows], pa.int64()),
        "dist2_micro2": pa.array([r[4] for r in rows], pa.int64())})


def q_hapax_share(sf_dir: str):
    """Per-source hapax-legomena share: token total, type count and
    the share of types occurring exactly once within the source —
    the lexical-richness / scrape-noise number next to
    ``vocab_growth`` (a hapax spike usually means OCR junk or ID
    strings).  ``hapax_ppm = n_hapax·10⁶ // n_types``.  Rows ordered
    by source.

    Scale plan: per-batch (source, token) count partials → ONE
    vocab-bounded groupby → per-batch per-source scalar partials →
    one tiny source groupby; the corpus never shuffles."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        src = b["source"].take(par)
        g = pa.table({"source": src, "w": flat}) \
            .group_by(["source", "w"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "w": g["w"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    vocab = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "w"]).aggregate(Sum("c", alias_name="c"))

    def fold(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({"source": b["source"],
                      "tok": pa.array(c),
                      "typ": pa.array(np.ones(len(c), np.int64)),
                      "hap": pa.array((c == 1).astype(np.int64))})
        g = t.group_by(["source"], use_threads=False).aggregate(
            [("tok", "sum"), ("typ", "sum"), ("hap", "sum")])
        return pa.table({"source": g["source"], "tok": g["tok_sum"],
                         "typ": g["typ_sum"], "hap": g["hap_sum"]})

    agg = vocab.map_batches(fold, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("tok", alias_name="n_tokens"),
            Sum("typ", alias_name="n_types"),
            Sum("hap", alias_name="n_hapax")).to_pandas()
    agg = agg.sort_values("source")
    return pa.table({
        "source": pa.array(agg["source"].tolist(), pa.string()),
        "n_tokens": pa.array(agg["n_tokens"].to_numpy(np.int64)),
        "n_types": pa.array(agg["n_types"].to_numpy(np.int64)),
        "n_hapax": pa.array(agg["n_hapax"].to_numpy(np.int64)),
        "hapax_ppm": pa.array(
            agg["n_hapax"].to_numpy(np.int64) * 1_000_000
            // agg["n_types"].to_numpy(np.int64))})


def q_price_index(sf_dir: str):
    """Year-over-year unit-value price index of shipped lineitems:
    ``uvi_ppm(y) = (cents_y·qty_{y−1}·10⁶) // (qty_y·cents_{y−1})``
    — the price/mix-drift monitor (a UVI jump with flat volumes means
    the catalogue, not the demand, moved).  Exact integers; rows =
    years with a predecessor, ordered by year.

    Scale plan: one streaming pass of per-batch (year, cents, qty)
    combiner partials → a years-bounded groupby; the index folds on
    the driver in Python ints (cents·qty crosses int64 near
    $10¹⁰ × 10⁹ units)."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["l_shipdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        yr = ((us // 86_400_000_000).astype("datetime64[D]")
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        cents = round_away(
            b["l_extendedprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        qty = np.rint(b["l_quantity"].combine_chunks()
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.table({"yr": pa.array(yr), "c": pa.array(cents),
                      "q": pa.array(qty)})
        g = t.group_by("yr", use_threads=False).aggregate(
            [("c", "sum"), ("q", "sum")])
        return pa.table({"yr": g["yr"], "c": g["c_sum"],
                         "q": g["q_sum"]})

    years = _read(sf_dir, "lineitem",
                  ["l_shipdate", "l_extendedprice", "l_quantity"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("yr").aggregate(Sum("c", alias_name="c"),
                                 Sum("q", alias_name="q")) \
        .to_pandas().sort_values("yr")
    by = {int(r["yr"]): (int(r["c"]), int(r["q"]))
          for _, r in years.iterrows()}
    rows = []
    for y in sorted(by):
        if y - 1 not in by:
            continue
        c, q = by[y]
        pc_, pq_ = by[y - 1]
        rows.append((y, c, q, pc_, pq_,
                     c * pq_ * 1_000_000 // (q * pc_)))
    return pa.table({
        "year": pa.array([r[0] for r in rows], pa.int64()),
        "rev_cents": pa.array([r[1] for r in rows], pa.int64()),
        "qty_units": pa.array([r[2] for r in rows], pa.int64()),
        "prev_rev_cents": pa.array([r[3] for r in rows], pa.int64()),
        "prev_qty_units": pa.array([r[4] for r in rows], pa.int64()),
        "uvi_ppm": pa.array([r[5] for r in rows], pa.int64())})


def q_text_entropy_rate(sf_dir: str):
    """Per-source bigram entropy rate on the shared
    ``L(x) = round(ln(x)·10⁶)`` grid: over each source's in-document
    consecutive token pairs, the unconditional next-token entropy
    ``h1``, the conditional ``h2 = H(next | prev)`` and the
    first-order redundancy ``h1 − h2`` — the compressibility /
    repetitiveness census next to ``compression_ratio`` (which zlib
    makes un-SQL-able; this one is value-exact).  Sign-magnitude
    integer division throughout.  Rows ordered by source.

    Scale plan: (source, w1, w2) count partials → one distinct-bigram
    groupby; the context and marginal totals are two further
    distinct-unigram groupbys of the CELL stream (already ≤ distinct
    bigrams, never the corpus); every entropy sum folds through
    per-batch scalar partials — no vocabulary collection anywhere."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        par = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "") \
            .to_numpy(zero_copy_only=False)
        # consecutive same-doc nonempty pairs — empties only appear at
        # split boundaries, so adjacency matches the SQL extract list
        ok = ((par[1:] == par[:-1]) & nonempty[1:] & nonempty[:-1]) \
            if len(par) > 1 else np.zeros(0, dtype=bool)
        idx = np.flatnonzero(ok) + 1
        g = pa.table({
            "source": b["source"].combine_chunks()
            .take(pa.array(par[idx])),
            "w1": flat.take(pa.array(idx - 1)),
            "w2": flat.take(pa.array(idx))}) \
            .group_by(["source", "w1", "w2"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "w1": g["w1"],
                         "w2": g["w2"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    cells = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "w1", "w2"]) \
        .aggregate(Sum("c", alias_name="c")).materialize()

    def _lsum(ds, key_cols, val):
        """per-source Σ v·L(v) + Σ v via scalar per-batch partials."""
        def fold(b: pa.Table) -> pa.Table:
            v = b[val].combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            lv = np.floor(np.log(v) * 1_000_000 + 0.5).astype(np.int64)
            t = pa.table({"source": b["source"],
                          "s": pa.array(v * lv), "n": pa.array(v)})
            g = t.group_by(["source"], use_threads=False).aggregate(
                [("s", "sum"), ("n", "sum")])
            return pa.table({"source": g["source"], "s": g["s_sum"],
                             "n": g["n_sum"]})
        return ds.map_batches(fold, batch_format="pyarrow") \
            .groupby("source").aggregate(
                Sum("s", alias_name="s"), Sum("n", alias_name="n")) \
            .to_pandas()

    joint = _lsum(cells, None, "c")

    def margin(col):
        def proj(b: pa.Table) -> pa.Table:
            g = b.select(["source", col, "c"]) \
                .group_by(["source", col], use_threads=False) \
                .aggregate([("c", "sum")])
            return pa.table({"source": g["source"], col: g[col],
                             "t": g["c_sum"]})
        return cells.map_batches(proj, batch_format="pyarrow") \
            .groupby(["source", col]).aggregate(
                Sum("t", alias_name="t"))

    ctx = _lsum(margin("w1"), None, "t")
    marg = _lsum(margin("w2"), None, "t")

    import math

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    js = {r["source"]: (int(r["s"]), int(r["n"]))
          for _, r in joint.iterrows()}
    cs = {r["source"]: int(r["s"]) for _, r in ctx.iterrows()}
    ms = {r["source"]: int(r["s"]) for _, r in marg.iterrows()}

    def div(s, n):
        q = abs(s) // n
        return q if s >= 0 else -q

    rows = []
    for src in sorted(js):
        sj, n = js[src]
        h1 = div(n * L(n) - ms[src], n)
        h2 = div(cs[src] - sj, n)
        rows.append((src, n, h1, h2, h1 - h2))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "n_bigrams": pa.array([r[1] for r in rows], pa.int64()),
        "h1_micro": pa.array([r[2] for r in rows], pa.int64()),
        "h2_micro": pa.array([r[3] for r in rows], pa.int64()),
        "redundancy_micro": pa.array([r[4] for r in rows],
                                     pa.int64())})


def q_kg_local_bridges(sf_dir: str):
    """Local-bridge census of the entity graph: edges whose endpoints
    share NO common neighbor (span > 2 — removing one lengthens the
    a↔b path to ≥ 3) are the weak ties that hold communities together
    (Granovetter); their share plus the mean edge-Jaccard gives the
    one-row cohesion summary of the ``kg_edge_jaccard`` table.
    (n_edges, n_local_bridges, bridge_ppm, mean_jac_ppm) — exact
    integers.

    Scale plan: rides :func:`edge_jaccard_ds` (wedge partials, cn=0
    edges kept) and folds scalar per-batch partials — nothing new
    shuffles."""
    from kgforge.functions.graph import edge_jaccard_ds

    ej = edge_jaccard_ds(_entity_edges_for(sf_dir))

    def fold(b: pa.Table) -> pa.Table:
        cn = b["cn"].combine_chunks().to_numpy(zero_copy_only=False)
        jac = b["jac_ppm"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(cn)], pa.int64()),
            "nb": pa.array([int((cn == 0).sum())], pa.int64()),
            "sj": pa.array([int(jac.sum())], pa.int64())})

    p = ej.map_batches(fold, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    nb = int(p["nb"].sum())
    sj = int(p["sj"].sum())
    return pa.table({
        "n_edges": pa.array([n], pa.int64()),
        "n_local_bridges": pa.array([nb], pa.int64()),
        "bridge_ppm": pa.array([nb * 1_000_000 // n if n else 0],
                               pa.int64()),
        "mean_jac_ppm": pa.array([sj // n if n else 0], pa.int64())})


def q_kg_eigencentrality(sf_dir: str):
    """Top-20 entity eigenvector centrality — see
    :func:`kgforge.functions.graph.eigencentrality_ds`."""
    from kgforge.functions.graph import eigencentrality_ds

    return eigencentrality_ds(_entity_edges_for(sf_dir))


_BASKET_CAP = 64     # deterministic per-basket part cap, both engines


def q_basket_triples(sf_dir: str):
    """Market-basket mining, Apriori step 3: top-20 part TRIPLES by
    co-order count (ties → (a, b, c) ascending) — the 3-itemset lift
    base ``basket_pairs`` can't give.  Baskets wider than
    ``_BASKET_CAP`` distinct parts keep their first cap parts in part
    order (deterministic, spelled identically in the SQL twin) so one
    pathological mega-basket can't emit O(k³) rows at web scale.

    Scale plan: per-batch distinct (order, part) partials → ONE
    orderkey-hash partition; per-partition run offsets emit each
    basket's C(k,3) combinations with a cached index template per k,
    partial-counting triples before the (a, b, c) groupby; per-block
    top-20 partials fold on the driver."""
    import itertools

    import ray
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    P, k_out = 64, 20

    def dpart(b: pa.Table) -> pa.Table:
        g = pa.table({"ok": b["l_orderkey"], "pk": b["l_partkey"]}) \
            .group_by(["ok", "pk"], use_threads=False).aggregate([])
        return g.append_column("__p",
                               pa.array(_part_codes(g["ok"], P)))

    combo_cache: dict[int, np.ndarray] = {}

    def combos(k: int) -> np.ndarray:
        if k not in combo_cache:
            combo_cache[k] = np.array(
                list(itertools.combinations(range(k), 3)),
                dtype=np.int64)
        return combo_cache[k]

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.group_by(["ok", "pk"], use_threads=False).aggregate([])
        idx = pc.sort_indices(t, sort_keys=[("ok", "ascending"),
                                            ("pk", "ascending")])
        t = t.take(idx)
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(ok)
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        brk = np.ones(n, dtype=bool)
        brk[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(brk)
        lens = np.minimum(np.diff(np.concatenate([starts, [n]])),
                          _BASKET_CAP)
        outs = []
        # one vectorized emission per DISTINCT basket size (≤ cap
        # values), not one Python iteration per basket
        for ln in np.unique(lens):
            ln = int(ln)
            if ln < 3:
                continue
            s_k = starts[lens == ln]
            ix = (combos(ln)[None, :, :]
                  + s_k[:, None, None]).reshape(-1, 3)
            outs.append(np.stack([pk[ix[:, 0]], pk[ix[:, 1]],
                                  pk[ix[:, 2]]], axis=1))
        if not outs:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        m = np.concatenate(outs)
        g = pa.table({"a": pa.array(m[:, 0]), "b": pa.array(m[:, 1]),
                      "c": pa.array(m[:, 2])}) \
            .group_by(["a", "b", "c"], use_threads=False) \
            .aggregate([([], "count_all")])
        a = g["a"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        b2 = g["b"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        c2 = g["c"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (a * np.uint64(0x9E3779B97F4A7C15)
                 ^ b2 * np.uint64(0xBF58476D1CE4E5B9)
                 ^ c2 * np.uint64(0x94D049BB133111EB))
            h = (h ^ (h >> np.uint64(30))) \
                * np.uint64(0xBF58476D1CE4E5B9)
        return pa.table({"a": g["a"], "b": g["b"], "c": g["c"],
                         "n": pc.cast(g["count_all"], pa.int64()),
                         "__q": pa.array(
                             (h % np.uint64(P)).astype(np.int32))})

    # a triple's orderkey partitions can differ, so partials merge on
    # hash(triple) % P — 64 single-int groups instead of a global
    # 3-column sort (measured 19.4s → ~1s at sf0.1 for 1.6M triples)
    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["a", "b", "c"], use_threads=False) \
            .aggregate([("n", "sum")])
        out = pa.table({"a": g["a"], "b": g["b"], "c": g["c"],
                        "n_orders": g["n_sum"]})
        idx = pc.sort_indices(
            out, sort_keys=[("n_orders", "descending"),
                            ("a", "ascending"), ("b", "ascending"),
                            ("c", "ascending")])
        return out.take(idx[:k_out])

    trip = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(dpart, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("__q").map_groups(merge, batch_format="pyarrow")

    parts = [t for t in ray.get(trip.to_arrow_refs())
             if t.num_columns]
    flat = pa.concat_tables(parts) if parts else pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
        "c": pa.array([], pa.int64()),
        "n_orders": pa.array([], pa.int64())})
    idx = pc.sort_indices(
        flat, sort_keys=[("n_orders", "descending"),
                         ("a", "ascending"), ("b", "ascending"),
                         ("c", "ascending")])
    out = flat.take(idx[:k_out])
    return pa.table({"a": out["a"], "b": out["b"], "c": out["c"],
                     "n_orders": pc.cast(out["n_orders"],
                                         pa.int64())})


def q_dwell_time(sf_dir: str):
    """Per-event-type dwell time: mean microseconds until the SAME
    user's next event when it arrives within the 30-minute session
    window — the engagement metric sessionize's counts don't expose
    (which screens do users linger on?).  (event_type, n_dwells,
    sum_dwell_us, mean_dwell_us) exact integers, type ASC.

    Scale plan: ONE user-hash partition (sessionize's lane); inside
    a partition the successor gap is a vectorized shift over the
    (user, ts, id) sort; per-batch type-bounded partials fold through
    one tiny groupby."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    P = 64
    gap_us = 1_800_000_000

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({"u": b["user_id"],
                      "t": pc.cast(pc.cast(b["ts"],
                                           pa.timestamp("us")),
                                   pa.int64()),
                      "eid": b["event_id"], "et": b["event_type"]})
        return t.append_column("__p",
                               pa.array(_part_codes(t["u"], P)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"),
                                            ("t", "ascending"),
                                            ("eid", "ascending")])
        t = t.take(idx)
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(u)
        if n < 2:
            return pa.table({"et": pa.array([], pa.string()),
                             "nd": pa.array([], pa.int64()),
                             "sd": pa.array([], pa.int64())})
        gap = ts[1:] - ts[:-1]
        ok = (u[1:] == u[:-1]) & (gap <= gap_us)
        idx0 = np.flatnonzero(ok)
        g = pa.table({"et": t["et"].combine_chunks()
                      .take(pa.array(idx0)),
                      "nd": pa.array(np.ones(len(idx0), np.int64)),
                      "sd": pa.array(gap[idx0])}) \
            .group_by(["et"], use_threads=False).aggregate(
            [("nd", "sum"), ("sd", "sum")])
        return pa.table({"et": g["et"], "nd": g["nd_sum"],
                         "sd": g["sd_sum"]})

    agg = _read(sf_dir, "events",
                ["user_id", "ts", "event_id", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("et").aggregate(Sum("nd", alias_name="n_dwells"),
                                 Sum("sd", alias_name="sum_dwell_us")) \
        .to_pandas().sort_values("et")
    nd = agg["n_dwells"].to_numpy(np.int64)
    sd = agg["sum_dwell_us"].to_numpy(np.int64)
    return pa.table({
        "event_type": pa.array(agg["et"].tolist(), pa.string()),
        "n_dwells": pa.array(nd),
        "sum_dwell_us": pa.array(sd),
        "mean_dwell_us": pa.array(sd // nd)})


QUERIES = {
    "basket_triples": q_basket_triples,
    "dwell_time": q_dwell_time,
    "kg_eigencentrality": q_kg_eigencentrality,
    "kg_local_bridges": q_kg_local_bridges,
    "price_index": q_price_index,
    "text_entropy_rate": q_text_entropy_rate,
    "label_centroid_dist": q_label_centroid_dist,
    "hapax_share": q_hapax_share,
    "fd_audit": q_fd_audit,
    "markov_order2_gain": q_markov_order2_gain,
    "token_burstiness": q_token_burstiness,
    "type_dow_mi": q_type_dow_mi,
    "cohort_ltv": q_cohort_ltv,
    "filter_funnel": q_filter_funnel,
    "kg_neighbor_degree": q_kg_neighbor_degree,
    "theil_sen_nation": q_theil_sen_nation,
    "rank_stability": q_rank_stability,
    "spearman_qty_discount": q_spearman_qty_discount,
    "k_anonymity": q_k_anonymity,
    "split_leakage": q_split_leakage,
    "session_entry_exit": q_session_entry_exit,
    "transition_entropy": q_transition_entropy,
    "source_scorecard": q_source_scorecard,
    "rrf_fusion": q_rrf_fusion,
    "seasonal_anomaly": q_seasonal_anomaly,
    "partition_skew": q_partition_skew,
    "token_shift": q_token_shift,
    "kg_degree_zipf": q_kg_degree_zipf,
    "anova_month": q_anova_month,
    "embedding_cov": q_embedding_cov,
    "poisson_bootstrap": q_poisson_bootstrap,
    "bpe_merges": q_bpe_merges,
    "ks_test": q_ks_test,
    "kg_auc": q_kg_auc,
    "trigram_backoff": q_trigram_backoff,
    "forecast_backtest": q_forecast_backtest,
    "temperature_mix": q_temperature_mix,
    "mannwhitney_u": q_mannwhitney_u,
    "kaplan_meier": q_kaplan_meier,
    "dsir_topk": q_dsir_topk,
    "benford_digits": q_benford_digits,
    "source_length_w1": q_source_length_w1,
    "kg_triads": q_kg_triads,
    "kg_densification": q_kg_densification,
    "kg_robustness": q_kg_robustness,
    "position_attribution": q_position_attribution,
    "removal_effect": q_removal_effect,
    "kg_bowtie": q_kg_bowtie,
    "kcenter_select": q_kcenter_select,
    "dsir_weights": q_dsir_weights,
    "customer_gini": q_customer_gini,
    "lang_source_pmi": q_lang_source_pmi,
    "min_cost_supplier": q_min_cost_supplier,
    "source_token_entropy": q_source_token_entropy,
    "snm_pairs": q_snm_pairs,
    "source_char_kl": q_source_char_kl,
    "conversion_lag": q_conversion_lag,
    "max_drawdown": q_max_drawdown,
    "bm25_topk": q_bm25_topk,
    "important_parts": q_important_parts,
    "type_hour_chi2": q_type_hour_chi2,
    "numeric_corr": q_numeric_corr,
    "weighted_median": q_weighted_median,
    "explode_spans": q_explode_spans,
    "order_count_dist": q_order_count_dist,
    "skyline_parts": q_skyline_parts,
    "dedup_representatives": q_dedup_representatives,
    "basket_pairs": q_basket_pairs,
    "kg_cooccur": q_kg_cooccur,
    "kg_kcore": q_kg_kcore,
    "event_transitions": q_event_transitions,
    "rfm_segments": q_rfm_segments,
    "source_provenance": q_source_provenance,
    "kg_degree_dist": q_kg_degree_dist,
    "compression_ratio": q_compression_ratio,
    "next_token_topk": q_next_token_topk,
    "time_weighted_avg": q_time_weighted_avg,
    "knn_classify": q_knn_classify,
    "kg_assortativity": q_kg_assortativity,
    "kg_edge_jaccard": q_kg_edge_jaccard,
    "oov_rate": q_oov_rate,
    "order_share": q_order_share,
    "dedup_incremental": q_dedup_incremental,
    "kg_lift": q_kg_lift,
    "trimmed_mean": q_trimmed_mean,
    "gini_by_type": q_gini_by_type,
    "fano_by_type": q_fano_by_type,
    "token_novelty": q_token_novelty,
    "promo_share": q_promo_share,
    "volume_shipping": q_volume_shipping,
    "market_share": q_market_share,
    "mad_outliers": q_mad_outliers,
    "late_priority": q_late_priority,
    "fertility_by_lang": q_fertility_by_lang,
    "session_length_dist": q_session_length_dist,
    "nation_profit": q_nation_profit,
    "first_touch": q_first_touch,
    "winnow_pairs": q_winnow_pairs,
    "ship_latency_dist": q_ship_latency_dist,
    "stitch_pairs": q_stitch_pairs,
    "small_qty_revenue": q_small_qty_revenue,
    "dominant_supplier": q_dominant_supplier,
    "large_orders": q_large_orders,
    "waiting_suppliers": q_waiting_suppliers,
    "pareto_share": q_pareto_share,
    "cross_source_dups": q_cross_source_dups,
    "vocab_growth": q_vocab_growth,
    "order_gap_dist": q_order_gap_dist,
    "source_dup_report": q_source_dup_report,
    "dormant_customers": q_dormant_customers,
    "top_supplier": q_top_supplier,
    "media_features": q_media_features,
    "frame_sample": q_frame_sample,
    "token_stats": q_token_stats,
    "type_token_ratio": q_type_token_ratio,
    "json_field_stats": q_json_field_stats,
    "rank_transform": q_rank_transform,
    "part_supplier_counts": q_part_supplier_counts,
    "group_regression": q_group_regression,
    "ref_integrity": q_ref_integrity,
    "topk_paths": q_topk_paths,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "decontaminate": q_decontaminate,
    "doc_frequency": q_doc_frequency,
    "percentile_filter": q_percentile_filter,
    "data_prep": q_data_prep,
    "chunk_docs": q_chunk_docs,
    "inverted_index": q_inverted_index,
    "tfidf_topk": q_tfidf_topk,
    "bigram_topk": q_bigram_topk,
    "redact": q_redact,
    "repetition_ratio": q_repetition_ratio,
    "topk_per_group": q_topk_per_group,
    "event_deltas": q_event_deltas,
    "group_quantiles": q_group_quantiles,
    "cumulative_sum": q_cumulative_sum,
    "rolling_sum": q_rolling_sum,
    "pivot_hourly": q_pivot_hourly,
    "tier_lookup": q_tier_lookup,
    "stratified_sample": q_stratified_sample,
    "mixture_sample": q_mixture_sample,
    "orders_customer_join": q_orders_customer_join,
    "user_customer_full_join": q_user_customer_full_join,
    "priority_revenue": q_priority_revenue,
    "hourly_distinct_users": q_hourly_distinct_users,
    "rollup_hourly": q_rollup_hourly,
    "cube_hourly": q_cube_hourly,
    "window_rank": q_window_rank,
    "dedup_exact": q_dedup_exact,
    "dedup_normalized": q_dedup_normalized,
    "jaccard_pairs": q_jaccard_pairs,
    "containment_pairs": q_containment_pairs,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "embedding_lsh_pairs": q_embedding_lsh_pairs,
    "substring_dup_pairs": q_substring_dup_pairs,
    "dup_span_fraction": q_dup_span_fraction,
    "dim_truncate_recall": q_dim_truncate_recall,
    "knn_brute": q_knn_brute,
    "knn_ivf": q_knn_ivf,
    "kmeans_clusters": q_kmeans_clusters,
    "quantize_embeddings": q_quantize_embeddings,
    "lsh_recall": q_lsh_recall,
    "funnel_counts": q_funnel_counts,
    "events_hourly": q_events_hourly,
    "sessionize": q_sessionize,
    "pricing_summary": q_pricing_summary,
    "top_customers": q_top_customers,
    "customer_nation_region": q_customer_nation_region,
    "filter_project": q_filter_project,
    "union_nations": q_union_nations,
    "distinct_users": q_distinct_users,
    "part_minmax": q_part_minmax,
    "vocab_topk": q_vocab_topk,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "bloom_semi_join": q_bloom_semi_join,
    "events_props": q_events_props,
    "shuffle_sample": q_shuffle_sample,
    "kg_mentions_bilstm": q_kg_mentions_bilstm,
    "kg_edges": q_kg_edges,
    "kg_nodes": q_kg_nodes,
    "kg_mentions": q_kg_mentions,
    "kg_triples": q_kg_triples,
    "kg_mentions_dict": q_kg_mentions_dict,
    "kg_triples_dict": q_kg_triples_dict,
    "kg_edges_dict": q_kg_edges_dict,
    "kg_nodes_dict": q_kg_nodes_dict,
    "mention_dedup": q_mention_dedup,
    "kg_degree": q_kg_degree,
    "kg_pagerank": q_kg_pagerank,
    "kg_two_hop": q_kg_two_hop,
    "kg_triangles": q_kg_triangles,
    "kg_components": q_kg_components,
    "kg_link_pred": q_kg_link_pred,
    "kg_clustering": q_kg_clustering,
    "kg_ra_linkpred": q_kg_ra_linkpred,
    "kg_jaccard_linkpred": q_kg_jaccard_linkpred,
    "kg_aa_linkpred": q_kg_aa_linkpred,
    "kg_richclub": q_kg_richclub,
    "kg_harmonic": q_kg_harmonic,
    "kg_wpagerank": q_kg_wpagerank,
    "kg_ktruss": q_kg_ktruss,
    "kg_path_counts": q_kg_path_counts,
    "kg_betweenness": q_kg_betweenness,
    "kg_modularity": q_kg_modularity,
    "kg_diameter": q_kg_diameter,
    "kg_ambiguity": q_kg_ambiguity,
    "kg_ppr": q_kg_ppr,
    "gopher_rules": q_gopher_rules,
    "c4_rules": q_c4_rules,
    "source_similarity": q_source_similarity,
    "kg_hits": q_kg_hits,
    "kg_comp_sizes": q_kg_comp_sizes,
    "kg_communities": q_kg_communities,
    "kg_katz": q_kg_katz,
    "kg_sssp": q_kg_sssp,
    "kg_walks": q_kg_walks,
    "kg_pred_card": q_kg_pred_card,
    "kg_typed_paths": q_kg_typed_paths,
    "kg_entity_density": q_kg_entity_density,
    "kg_entity_span": q_kg_entity_span,
    "kg_inferred": q_kg_inferred,
    "kg_reciprocity": q_kg_reciprocity,
    "media_census": q_media_census,
    "user_entropy": q_user_entropy,
    "dau_stickiness": q_dau_stickiness,
    "burst_score": q_burst_score,
    "kg_type_conflicts": q_kg_type_conflicts,
    "reorder_gap": q_reorder_gap,
    "supplier_reliability": q_supplier_reliability,
    "quarter_yoy": q_quarter_yoy,
    "kg_mean_dist": q_kg_mean_dist,
    "basket_size_dist": q_basket_size_dist,
    "returns_trend": q_returns_trend,
    "embedding_drift": q_embedding_drift,
    "window_funnel": q_window_funnel,
    "bilstm_mix_prf": q_bilstm_mix_prf,
    "band_revenue": q_band_revenue,
    "zipf_slope": q_zipf_slope,
    "lm_perplexity": q_lm_perplexity,
    "knn_graph": q_knn_graph,
    "forecast_revenue": q_forecast_revenue,
    "returns_revenue": q_returns_revenue,
    "reading_ease": q_reading_ease,
    "scd_intervals": q_scd_intervals,
    "coverage_topk": q_coverage_topk,
    "kg_type_matrix": q_kg_type_matrix,
    "dow_profile": q_dow_profile,
    "markov_stationary": q_markov_stationary,
    "open_orders_curve": q_open_orders_curve,
    "late_events": q_late_events,
    "top_terms_per_source": q_top_terms_per_source,
    "hourly_delta": q_hourly_delta,
    "hourly_autocorr": q_hourly_autocorr,
    "cusum_changepoint": q_cusum_changepoint,
    "ewma_hourly": q_ewma_hourly,
    "decayed_counts": q_decayed_counts,
    "type_affinity": q_type_affinity,
    "nation_hhi": q_nation_hhi,
    "peak_concurrency": q_peak_concurrency,
    "char_bigram_stats": q_char_bigram_stats,
    "dup_ngrams": q_dup_ngrams,
    "source_contamination": q_source_contamination,
    "setsim_join": q_setsim_join,
    "shipping_priority": q_shipping_priority,
    "regional_revenue": q_regional_revenue,
    "cohort_retention": q_cohort_retention,
    "kg_edges_incremental": q_kg_edges_incremental,
    "latest_event": q_latest_event,
    "weighted_sample": q_weighted_sample,
    "heavy_hitters": q_heavy_hitters,
    "quantile_sketch": q_quantile_sketch,
    "hll_distinct": q_hll_distinct,
    "semantic_dup": q_semantic_dup,
    "bpe_token_stats": q_bpe_token_stats,
    "doc_rarity": q_doc_rarity,
    "kg_edges_diff": q_kg_edges_diff,
    "event_sessions": q_event_sessions,
    "length_deciles": q_length_deciles,
    "value_outliers": q_value_outliers,
    "profile_events": q_profile_events,
    "kg_ego": q_kg_ego,
    "event_type_corr": q_event_type_corr,
    "embedding_stats": q_embedding_stats,
    "typo_pairs": q_typo_pairs,
    "pack_chunks": q_pack_chunks,
    "kg_negatives": q_kg_negatives,
    "kg_health": q_kg_health,
    "event_sequences": q_event_sequences,
    "budget_select": q_budget_select,
    "session_overlap": q_session_overlap,
    "hour_gaps": q_hour_gaps,
    "hourly_mode": q_hourly_mode,
    "hours_intersect": q_hours_intersect,
    "hours_except": q_hours_except,
    "term_search": q_term_search,
    "pmi_topk": q_pmi_topk,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "dup_clusters": q_dup_clusters,
    "hash_split": q_hash_split,
    "kg_invariant": q_kg_invariant,
    "sliding_window": q_sliding_window,
    "kg_prf": q_kg_prf,
}

_KIND_CASE = ("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
              "ELSE 'video' END")
_MEDIA_REF = (f"'media://' || {_KIND_CASE} || '/' || "
              "printf('%06d', doc_id % 1000000)")

ORACLE_SQL = {
    "explode_spans": f"""
        SELECT printf('doc-%08d', doc_id) AS doc_id, 0 AS span_idx,
               'text' AS kind, text, '' AS media_ref, 0 AS "offset"
        FROM documents
        UNION ALL
        SELECT printf('doc-%08d', doc_id), 1, {_KIND_CASE}, '',
               {_MEDIA_REF}, length(text)
        FROM documents
    """,
    "media_features": f"""
        WITH m AS (SELECT doc_id, {_KIND_CASE} AS kind,
                          {_MEDIA_REF} AS media_ref FROM documents)
        SELECT printf('doc-%08d', doc_id) AS doc_id, 1 AS span_idx, kind,
               media_ref,
               CAST(256 + length(media_ref) % 64 AS BIGINT) AS width,
               CAST(144 + length(media_ref) % 32 AS BIGINT) AS height,
               CAST(CASE WHEN kind IN ('audio','video')
                    THEN 1000 * (1 + length(media_ref) % 30)
                    ELSE 0 END AS BIGINT) AS duration_ms,
               CAST(CASE WHEN kind = 'video'
                    THEN (1000 * (1 + length(media_ref) % 30)) // 40
                    ELSE 1 END AS BIGINT) AS n_frames
        FROM m
    """,
    "frame_sample": f"""
        WITH v AS (SELECT doc_id, {_MEDIA_REF} AS media_ref,
                          1000 * (1 + length({_MEDIA_REF}) % 30) AS dur
                   FROM documents WHERE doc_id % 3 = 2)
        SELECT printf('doc-%08d', doc_id) AS doc_id, 1 AS span_idx,
               media_ref, CAST(g.ts // 1000 AS BIGINT) AS frame_idx,
               CAST(g.ts AS BIGINT) AS ts_ms
        FROM v, generate_series(0, 29000, 1000) g(ts)
        WHERE g.ts < dur
    """,
    "token_stats": r"""
        SELECT doc_id,
               CAST(array_length(regexp_extract_all(text, '\S+')) AS BIGINT)
                   AS n_tokens,
               CAST(array_length(regexp_extract_all(text, '[^a-zA-Z0-9\s]'))
                   AS BIGINT) AS n_punct,
               CAST(array_length(regexp_extract_all(text, '[0-9]')) AS BIGINT)
                   AS n_digits,
               CAST(array_length(regexp_extract_all(text, '[A-Z]')) AS BIGINT)
                   AS n_upper,
               CAST(length(text) AS BIGINT) AS n_chars_m
        FROM documents
    """,
    "quality_score": r"""
        WITH c AS (
          SELECT doc_id,
                 array_length(regexp_extract_all(text, '\S+')) AS nt,
                 array_length(regexp_extract_all(
                     text, '\b(the|a|of|and|data)\b')) AS ns,
                 length(text) AS nc
          FROM documents)
        SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
               CAST(ns AS BIGINT) AS n_stopwords,
               round(CAST(nc AS DOUBLE) / greatest(nt, 1), 4)
                   AS mean_token_len,
               round(CAST(ns AS DOUBLE) / greatest(nt, 1), 4)
                   AS stopword_ratio
        FROM c
    """,
    "lang_id": r"""
        WITH c AS (
          SELECT doc_id,
                 array_length(regexp_extract_all(text, '\b(the|of|and)\b'))
                     AS n_en,
                 array_length(regexp_extract_all(text, '\b(der|die|und)\b'))
                     AS n_de,
                 array_length(regexp_extract_all(text, '\b(el|la|los)\b'))
                     AS n_es
          FROM documents)
        SELECT doc_id,
               CASE WHEN n_en >= n_de AND n_en >= n_es AND n_en > 0 THEN 'en'
                    WHEN n_de >= n_es AND n_de > 0 THEN 'de'
                    WHEN n_es > 0 THEN 'es' ELSE 'unk' END AS pred_lang,
               CAST(n_en AS BIGINT) AS n_en, CAST(n_de AS BIGINT) AS n_de,
               CAST(n_es AS BIGINT) AS n_es
        FROM c
    """,
    "fingerprint": """
        SELECT doc_id, md5(text) AS fp_md5 FROM documents
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_dups
        FROM documents GROUP BY 1
    """,
    "dedup_normalized": """
        SELECT md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]+', '', 'g'),
                   ' +', ' ', 'g'))) AS content_hash,
               min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
        FROM documents GROUP BY 1
    """,
    "jaccard_pairs": """
        WITH d AS (SELECT doc_id, source, length(text) % 16 AS len_bucket,
                          text
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id, source, len_bucket,
                      substring(text, g.i, 5) AS s
               FROM d, generate_series(1, 4096) g(i)
               WHERE g.i <= greatest(length(text) - 4, 1)),
        counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
                  FROM sh a JOIN sh b
                    ON a.source = b.source AND a.len_bucket = b.len_bucket
                   AND a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT ia AS id_a, ib AS id_b,
               round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 4) AS jaccard
        FROM inter
        JOIN counts ca ON ca.doc_id = ia
        JOIN counts cb ON cb.doc_id = ib
        WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2
    """,
    "containment_pairs": """
        WITH sh AS (SELECT DISTINCT doc_id, source,
                           substring(text, g.i, 5) AS s
                    FROM documents, generate_series(1, 4096) g(i)
                    WHERE g.i <= greatest(length(text) - 4, 1)),
        counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
                  FROM sh a JOIN sh b
                    ON a.source = b.source AND a.s = b.s
                   AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT ia AS id_a, ib AS id_b,
               round(CAST(i AS DOUBLE) / least(ca.n, cb.n), 4)
                   AS containment
        FROM inter
        JOIN counts ca ON ca.doc_id = ia
        JOIN counts cb ON cb.doc_id = ib
        WHERE CAST(i AS DOUBLE) / least(ca.n, cb.n) >= 0.3
    """,
    "gopher_rules": """
        WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
                   FROM documents),
        m AS (SELECT doc_id, source, len(ws) AS nw,
                     (SELECT coalesce(sum(length(x.w)), 0)
                      FROM unnest(ws) x(w)) AS swl,
                     (SELECT count(*) FROM unnest(ws) x(w)
                      WHERE x.w IN ('the','a','of','to','and','in','is'))
                         AS nstop,
                     (SELECT count(DISTINCT x.w) FROM unnest(ws) x(w))
                         AS nuniq
              FROM w),
        f AS (SELECT source,
                     CASE WHEN nw BETWEEN 20 AND 1000
                          THEN 0 ELSE 1 END AS f_len,
                     CASE WHEN swl >= 3 * nw AND swl <= 5 * nw
                          THEN 0 ELSE 1 END AS f_wl,
                     CASE WHEN nstop * 100 >= 2 * nw
                          THEN 0 ELSE 1 END AS f_stop,
                     CASE WHEN nuniq * 100 >= 35 * nw
                          THEN 0 ELSE 1 END AS f_uniq
              FROM m)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(f_len) AS BIGINT) AS fail_len,
               CAST(sum(f_wl) AS BIGINT) AS fail_wordlen,
               CAST(sum(f_stop) AS BIGINT) AS fail_stop,
               CAST(sum(f_uniq) AS BIGINT) AS fail_uniq,
               CAST(sum(CASE WHEN f_len + f_wl + f_stop + f_uniq = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        FROM f GROUP BY 1
    """,
    "c4_rules": """
        WITH m AS (SELECT source,
                          length(coalesce(text, ''))
                          - length(replace(coalesce(text, ''), '.', ''))
                              AS nper,
                          CASE WHEN contains(coalesce(text, ''), '{')
                                 OR contains(coalesce(text, ''), '}')
                               THEN 1 ELSE 0 END AS f_brace,
                          CASE WHEN contains(lower(coalesce(text, '')),
                                             'lorem ipsum')
                               THEN 1 ELSE 0 END AS f_lorem,
                          length(coalesce(text, ''))
                          - length(replace(coalesce(text, ''),
                                           chr(10), '')) + 1 AS nlines,
                          length(coalesce(text, ''))
                          - length(replace(coalesce(text, ''),
                                           ' ', '')) + 1 AS nw
                   FROM documents),
        f AS (SELECT source,
                     CASE WHEN nper >= 3 THEN 0 ELSE 1 END AS f_sent,
                     f_brace, f_lorem,
                     CASE WHEN nw >= 5 * nlines THEN 0 ELSE 1 END AS f_lw
              FROM m)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(f_sent) AS BIGINT) AS fail_sent,
               CAST(sum(f_brace) AS BIGINT) AS fail_brace,
               CAST(sum(f_lorem) AS BIGINT) AS fail_lorem,
               CAST(sum(f_lw) AS BIGINT) AS fail_linewords,
               CAST(sum(CASE WHEN f_sent + f_brace + f_lorem + f_lw = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        FROM f GROUP BY 1
    """,
    "source_similarity": r"""
        WITH tf AS (SELECT source,
                           unnest(regexp_extract_all(
                               coalesce(text, ''), '\S+')) AS w
                    FROM documents),
        cnt AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
                FROM tf GROUP BY 1, 2),
        dots AS (SELECT a.source AS src_a, b.source AS src_b,
                        CAST(sum(a.c * b.c) AS BIGINT) AS dot
                 FROM cnt a JOIN cnt b
                   ON a.w = b.w AND a.source < b.source
                 GROUP BY 1, 2),
        norms AS (SELECT source, CAST(sum(c * c) AS BIGINT) AS n2
                  FROM cnt GROUP BY 1)
        SELECT d.src_a, d.src_b, d.dot,
               na.n2 AS na2, nb.n2 AS nb2
        FROM dots d
        JOIN norms na ON na.source = d.src_a
        JOIN norms nb ON nb.source = d.src_b
    """,
    "substring_dup_pairs": """
        WITH w AS (SELECT DISTINCT doc_id, substring(text, g.i, 25) AS s
                   FROM documents, generate_series(1, 1024) g(i)
                   WHERE g.i <= greatest(length(text) - 24, 1)),
        good AS (SELECT s FROM w GROUP BY s
                 HAVING count(*) BETWEEN 2 AND 128)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
        WHERE a.s IN (SELECT s FROM good)
        GROUP BY 1, 2
    """,
    "dup_span_fraction": """
        WITH w AS (SELECT DISTINCT doc_id, substring(text, g.i, 25) AS s
                   FROM documents, generate_series(1, 1024) g(i)
                   WHERE g.i <= greatest(length(text) - 24, 1)),
        df AS (SELECT s, count(*) AS c FROM w GROUP BY 1)
        SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_win,
               CAST(sum(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup,
               round(sum(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS dup_frac
        FROM w JOIN df USING (s)
        GROUP BY 1
    """,
    "dim_truncate_recall": """
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < 8),
        sf AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             q.qe) AS sim
               FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        rf AS (SELECT query_id, neighbor_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id)
                          AS rk
               FROM sf),
        st AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                      list_cosine_similarity(
                          (CAST(e.embedding AS DOUBLE[]))[1:16],
                          (q.qe)[1:16]) AS sim
               FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        rt AS (SELECT query_id, neighbor_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id)
                          AS rk
               FROM st),
        hit AS (SELECT f.query_id, count(*) AS n
                FROM (SELECT * FROM rf WHERE rk <= 10) f
                JOIN (SELECT * FROM rt WHERE rk <= 10) t
                  ON f.query_id = t.query_id
                 AND f.neighbor_id = t.neighbor_id
                GROUP BY 1)
        SELECT q.query_id, CAST(coalesce(hit.n, 0) AS BIGINT) AS n_hit,
               round(coalesce(hit.n, 0) / 10.0, 4) AS recall
        FROM q LEFT JOIN hit ON hit.query_id = q.query_id
    """,
    "embedding_dup_pairs": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4)
                   AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.3
    """,
    "knn_brute": """
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < 8),
        s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            q.qe) AS sim
              FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id)
                         AS "rank"
              FROM s)
        SELECT query_id, neighbor_id, CAST("rank" AS BIGINT) AS "rank"
        FROM r WHERE "rank" <= 5
    """,
    "events_hourly": """
        SELECT event_type, strftime(ts, '%Y-%m-%d %H:00:00') AS hour,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events GROUP BY 1, 2
    """,
    "sessionize": """
        WITH o AS (SELECT user_id, ts,
                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                              AS prev
                   FROM events)
        SELECT user_id,
               CAST(1 + sum(CASE WHEN prev IS NOT NULL
                                  AND ts - prev > INTERVAL 30 MINUTE
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
               CAST(count(*) AS BIGINT) AS n_events
        FROM o GROUP BY 1
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                                   0) AS BIGINT)) AS BIGINT)
                   AS sum_disc_cents,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem GROUP BY 1, 2
    """,
    "top_customers": """
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS total_cents,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
        ORDER BY total_cents DESC, o_custkey LIMIT 10
    """,
    "customer_nation_region": """
        SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2
    """,
    "filter_project": """
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 2) AS revenue
        FROM lineitem WHERE l_quantity > 30
    """,
    "union_nations": """
        SELECT nationkey, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT c_nationkey AS nationkey FROM customer
              UNION ALL SELECT s_nationkey FROM supplier)
        GROUP BY 1
    """,
    "distinct_users": """
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1
    """,
    "part_minmax": """
        SELECT p_brand, CAST(min(p_size) AS BIGINT) AS min_size,
               CAST(max(p_size) AS BIGINT) AS max_size,
               round(max(p_retailprice), 2) AS max_price,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1
    """,
    "semi_join": """
        SELECT o_orderkey FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
    """,
    "anti_join": """
        SELECT o_orderkey FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
    """,
    "events_props": r"""
        SELECT event_id,
               CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
                   AS k_value
        FROM events
    """,
    "vocab_topk": r"""
        WITH toks AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS token
                      FROM documents),
        c AS (SELECT token, CAST(count(*) AS BIGINT) AS n
              FROM toks GROUP BY 1)
        SELECT token, n FROM c ORDER BY n DESC, token LIMIT 20
    """,
}

# Generated from the same pattern constant the Ray side scans
# (kgforge/functions/textstats.py CONTAM_NGRAMS) so the two engines
# can't drift; '' escaping per dict_oracle convention.
_contam_sum = " + ".join(
    "CASE WHEN contains(text, '%s') THEN 1 ELSE 0 END"
    % p.replace("'", "''") for p in F_text.CONTAM_NGRAMS)
ORACLE_SQL["decontaminate"] = f"""
    SELECT doc_id, CAST({_contam_sum} AS BIGINT) AS n_contam,
           CAST(CASE WHEN {_contam_sum} > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS contaminated
    FROM documents
"""
# Redaction oracle generated from the same pattern constants the Ray
# side scans/replaces (textstats.REDACT_PATTERNS): counts on the
# original text, nested regexp_replace in the same order.
_redact_count = " + ".join(
    "array_length(regexp_extract_all(text, '%s'))"
    % p.replace("'", "''") for _, p in F_text.REDACT_PATTERNS)
_redact_clean = "text"
for _, _pat in F_text.REDACT_PATTERNS:
    _redact_clean = ("regexp_replace(%s, '%s', '%s', 'g')"
                     % (_redact_clean, _pat.replace("'", "''"),
                        F_text.REDACT_TOKEN))
ORACLE_SQL["redact"] = f"""
    SELECT doc_id, CAST({_redact_count} AS BIGINT) AS n_redact,
           md5({_redact_clean}) AS clean_md5
    FROM documents
"""
ORACLE_SQL["repetition_ratio"] = r"""
    WITH toks AS (SELECT doc_id,
                         unnest(regexp_extract_all(text, '\S+')) AS term
                  FROM documents),
    tc AS (SELECT doc_id, term, count(*) AS c FROM toks
           GROUP BY doc_id, term),
    agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(max(c) AS BIGINT) AS top_n
            FROM tc GROUP BY doc_id)
    SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
           coalesce(n_distinct, 0) AS n_distinct,
           coalesce(top_n, 0) AS top_n,
           round(1 - CAST(coalesce(n_distinct, 0) AS DOUBLE)
                 / greatest(coalesce(n_tokens, 0), 1), 4) AS dup_ratio,
           round(CAST(coalesce(top_n, 0) AS DOUBLE)
                 / greatest(coalesce(n_tokens, 0), 1), 4) AS top_frac
    FROM documents d LEFT JOIN agg USING (doc_id)
"""
ORACLE_SQL["topk_per_group"] = """
    WITH v AS (SELECT user_id, event_id,
                      CAST(round(value * 100) AS BIGINT) AS value_cents
               FROM events),
    r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY value_cents DESC, event_id) AS rn
          FROM v)
    SELECT user_id, event_id, value_cents, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= 3
"""
ORACLE_SQL["event_deltas"] = """
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
    FROM events
"""
ORACLE_SQL["group_quantiles"] = """
    WITH v AS (SELECT event_type,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events),
    r AS (SELECT event_type, cents,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY cents) - 1 AS i,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM v)
    SELECT event_type,
           max(CASE WHEN i = CAST(floor((n - 1) * 0.5) AS BIGINT)
               THEN cents END) AS p50_cents,
           max(CASE WHEN i = CAST(floor((n - 1) * 0.9) AS BIGINT)
               THEN cents END) AS p90_cents,
           CAST(max(n) AS BIGINT) AS n_events
    FROM r GROUP BY event_type
"""
ORACLE_SQL["cumulative_sum"] = """
    WITH v AS (SELECT event_id, user_id, ts,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT event_id, user_id,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_cents
    FROM v
"""
ORACLE_SQL["rolling_sum"] = """
    WITH v AS (SELECT event_id, user_id, ts,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT event_id, user_id,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS win_sum_cents,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS win_n
    FROM v
"""
ORACLE_SQL["pivot_hourly"] = "SELECT event_type, " + ", ".join(
    "CAST(count(*) FILTER (WHERE extract(hour FROM ts) = %d) AS BIGINT)"
    " AS h%02d" % (h, h) for h in range(24)) + " FROM events GROUP BY event_type"
ORACLE_SQL["tier_lookup"] = """
    WITH t(lo, hi, tier) AS (VALUES {bands}),
    v AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
          FROM events)
    SELECT event_id, cents AS value_cents, tier
    FROM v JOIN t ON cents >= lo AND cents < hi
""".format(bands=", ".join("(%d, %d, '%s')" % b
                           for b in F_events.TIER_TABLE))
ORACLE_SQL["hourly_distinct_users"] = """
    SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type, hour
"""
ORACLE_SQL["rollup_hourly"] = """
    WITH v AS (SELECT event_type,
                      CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT)
                          AS hod,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(CAST(hod AS VARCHAR), '<all>') AS hod,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM v GROUP BY ROLLUP (event_type, hod)
"""
ORACLE_SQL["orders_customer_join"] = """
    SELECT o_custkey, o_orderkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
"""
ORACLE_SQL["user_customer_full_join"] = """
    SELECT coalesce(e.user_id, c.c_custkey) AS user_id,
           coalesce(e.n_events, 0) AS n_events,
           coalesce(c.c_name, '') AS c_name
    FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY user_id) e
    FULL JOIN (SELECT c_custkey, c_name FROM customer
               WHERE c_custkey BETWEEN 145 AND 160) c
      ON e.user_id = c.c_custkey
"""
ORACLE_SQL["priority_revenue"] = """
    WITH r AS (SELECT l_orderkey,
                      CAST(sum(CAST(round(l_extendedprice
                                          * (1 - l_discount) * 100)
                               AS BIGINT)) AS BIGINT) AS rev
               FROM lineitem GROUP BY l_orderkey)
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(rev) AS BIGINT) AS revenue_cents
    FROM orders JOIN r ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
"""
ORACLE_SQL["stratified_sample"] = """
    WITH r AS (SELECT event_type, event_id,
                      row_number() OVER (
                          PARTITION BY event_type
                          ORDER BY md5(CAST(event_id AS VARCHAR)),
                                   event_id) AS rn
               FROM events)
    SELECT event_type, event_id, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= 20
"""
ORACLE_SQL["doc_frequency"] = r"""
    WITH toks AS (SELECT DISTINCT doc_id,
                         unnest(regexp_extract_all(text, '\S+')) AS term
                  FROM documents)
    SELECT term, CAST(count(*) AS BIGINT) AS df
    FROM toks GROUP BY term ORDER BY df DESC, term LIMIT 25
"""
ORACLE_SQL["quantize_embeddings"] = r"""
    WITH dims AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                         generate_subscripts(embedding, 1) AS j
                  FROM embeddings),
    mm AS (SELECT j, min(v) AS lo, max(v) AS hi FROM dims GROUP BY j),
    q AS (SELECT vec_id, j,
                 CASE WHEN hi > lo
                      THEN CAST(least(greatest(
                               floor((v - lo) * 255.0 / (hi - lo) + 0.5),
                               0), 255) AS BIGINT)
                      ELSE 0 END AS code
          FROM dims JOIN mm USING (j))
    SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY j)
               AS codes
    FROM q GROUP BY vec_id
"""
ORACLE_SQL["percentile_filter"] = r"""
    WITH t AS (SELECT doc_id,
                      CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                          AS n_tokens
               FROM documents),
    r AS (SELECT n_tokens,
                 row_number() OVER (ORDER BY n_tokens) - 1 AS i,
                 count(*) OVER () AS n
          FROM t),
    thr AS (SELECT max(CASE WHEN i = CAST(floor((n - 1) * 0.9) AS BIGINT)
                            THEN n_tokens END) AS v
            FROM r)
    SELECT doc_id, n_tokens FROM t
    WHERE n_tokens >= (SELECT v FROM thr)
"""
ORACLE_SQL["data_prep"] = r"""
    WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
                  GROUP BY md5(text)),
    d AS (SELECT doc_id, text FROM documents
          WHERE doc_id IN (SELECT doc_id FROM keep)),
    t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM d),
    r AS (SELECT len(tl) AS n,
                 row_number() OVER (ORDER BY len(tl)) - 1 AS i,
                 count(*) OVER () AS cnt
          FROM t),
    thr AS (SELECT max(CASE WHEN i = CAST(floor((cnt - 1) * 0.5)
                                          AS BIGINT)
                            THEN n END) AS v
            FROM r),
    f AS (SELECT * FROM t WHERE len(tl) >= (SELECT v FROM thr)),
    e AS (SELECT doc_id, tl, unnest(range(0, (len(tl)-1)//24 + 1)) AS i
          FROM f WHERE len(tl) > 0)
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           array_to_string(tl[i*24+1 : least(i*24+32, len(tl))], ' ')
               AS chunk_text,
           CAST(least(i*24+32, len(tl)) - i*24 AS BIGINT) AS n_tokens,
           CASE WHEN CAST(concat('0x',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS UBIGINT) % 100 < 80 THEN 'train' ELSE 'test' END
               AS split
    FROM e
"""
ORACLE_SQL["chunk_docs"] = r"""
    WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tl
               FROM documents),
    e AS (SELECT doc_id, tl, unnest(range(0, (len(tl)-1)//48 + 1)) AS i
          FROM t WHERE len(tl) > 0)
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           array_to_string(tl[i*48+1 : least(i*48+64, len(tl))], ' ')
               AS chunk_text,
           CAST(least(i*48+64, len(tl)) - i*48 AS BIGINT) AS n_tokens
    FROM e
"""
ORACLE_SQL["inverted_index"] = r"""
    WITH toks AS (SELECT doc_id,
                         unnest(regexp_extract_all(text, '\S+')) AS term
                  FROM documents),
    p AS (SELECT DISTINCT term, doc_id FROM toks)
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings
    FROM p GROUP BY term HAVING count(*) >= 2
"""
ORACLE_SQL["bigram_topk"] = r"""
    WITH t AS (SELECT regexp_extract_all(text, '\S+') AS tl
               FROM documents),
    b AS (SELECT unnest(tl[1:len(tl)-1]) || ' ' || unnest(tl[2:len(tl)])
              AS bigram
          FROM t WHERE len(tl) >= 2)
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY bigram ORDER BY n DESC, bigram LIMIT 25
"""
ORACLE_SQL["tfidf_topk"] = r"""
    WITH toks AS (SELECT doc_id,
                         unnest(regexp_extract_all(text, '\S+')) AS term
                  FROM documents),
    tfq AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
            FROM tfq GROUP BY term),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents)
    SELECT doc_id, term, tf, df,
           round(CAST(tf AS DOUBLE)
                 * ((SELECT nd FROM nn) / CAST(df AS DOUBLE)), 4) AS score
    FROM tfq JOIN dfq USING (term)
    QUALIFY row_number() OVER (
        PARTITION BY doc_id
        ORDER BY CAST(tf AS DOUBLE)
                 * ((SELECT nd FROM nn) / CAST(df AS DOUBLE)) DESC,
                 term) <= 5
"""

# dict-lane oracles are generated from the same template/gazetteer/rule
# constants the Ray side uses (kgforge/pipelines/dict_oracle.py)
from kgforge.pipelines import dict_oracle as _dict_oracle  # noqa: E402

ORACLE_SQL["kg_mentions_dict"] = _dict_oracle.mentions_sql()
ORACLE_SQL["kg_triples_dict"] = _dict_oracle.triples_sql()
ORACLE_SQL["kg_edges_dict"] = _dict_oracle.edges_sql()
# incremental merge must equal the one-shot batch build bit-for-bit
ORACLE_SQL["kg_edges_incremental"] = _dict_oracle.edges_sql()
ORACLE_SQL["kg_nodes_dict"] = _dict_oracle.nodes_sql()
ORACLE_SQL["kg_degree"] = _dict_oracle.degree_sql()
ORACLE_SQL["kg_pagerank"] = _dict_oracle.pagerank_sql(iters=3)
ORACLE_SQL["kg_two_hop"] = _dict_oracle.two_hop_sql()
ORACLE_SQL["kg_triangles"] = _dict_oracle.triangles_sql()
ORACLE_SQL["kg_components"] = _dict_oracle.components_sql()
ORACLE_SQL["kg_link_pred"] = _dict_oracle.common_neighbors_sql(k=20)
ORACLE_SQL["kg_clustering"] = _dict_oracle.clustering_coeff_sql()
ORACLE_SQL["kg_ra_linkpred"] = _dict_oracle.ra_link_pred_sql(k=20)
ORACLE_SQL["kg_jaccard_linkpred"] = _dict_oracle.jaccard_link_pred_sql(k=20)
ORACLE_SQL["kg_aa_linkpred"] = _dict_oracle.adamic_adar_sql(k=20)
ORACLE_SQL["kg_richclub"] = _dict_oracle.rich_club_sql()
ORACLE_SQL["kg_harmonic"] = _dict_oracle.harmonic_sql(n_seeds=4,
                                                      max_hops=4)
ORACLE_SQL["kg_wpagerank"] = _dict_oracle.weighted_pagerank_sql(iters=3)
ORACLE_SQL["kg_ktruss"] = _dict_oracle.ktruss_sql(k=4, rounds=3)
ORACLE_SQL["kg_path_counts"] = _dict_oracle.path_counts_sql(n_seeds=4,
                                                            max_hops=4)
ORACLE_SQL["kg_betweenness"] = _dict_oracle.betweenness_sql(n_seeds=4,
                                                            max_hops=4)
ORACLE_SQL["kg_modularity"] = _dict_oracle.modularity_sql(rounds=2)
ORACLE_SQL["kg_diameter"] = _dict_oracle.diameter_est_sql(max_hops=6)
ORACLE_SQL["kg_ambiguity"] = _dict_oracle.ambiguity_sql()
ORACLE_SQL["kg_ppr"] = _dict_oracle.ppr_sql(iters=3, n_seeds=4)
ORACLE_SQL["kg_hits"] = _dict_oracle.hits_sql(iters=2)
ORACLE_SQL["kg_comp_sizes"] = _dict_oracle.comp_sizes_sql()
ORACLE_SQL["kg_communities"] = _dict_oracle.communities_sql(rounds=2)
ORACLE_SQL["kg_katz"] = _dict_oracle.katz_sql(iters=3)
ORACLE_SQL["kg_sssp"] = _dict_oracle.bfs_levels_sql(n_seeds=5,
                                                    max_hops=4)
ORACLE_SQL["kg_walks"] = _dict_oracle.random_walks_sql(
    walks_per_node=2, walk_len=3)
ORACLE_SQL["kg_pred_card"] = _dict_oracle.pred_card_sql()
ORACLE_SQL["kg_typed_paths"] = _dict_oracle.typed_paths_sql()
ORACLE_SQL["kg_entity_density"] = _dict_oracle.entity_density_sql()
ORACLE_SQL["kg_entity_span"] = _dict_oracle.entity_span_sql()
ORACLE_SQL["kg_inferred"] = _dict_oracle.inferred_sql()
ORACLE_SQL["kg_reciprocity"] = _dict_oracle.reciprocity_sql()
ORACLE_SQL["kg_type_conflicts"] = _dict_oracle.type_conflicts_sql()
ORACLE_SQL["returns_trend"] = """
WITH m AS (SELECT year(l_shipdate) AS y, month(l_shipdate) AS mo,
                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
           FROM lineitem)
SELECT CAST(y AS BIGINT) AS year, CAST(mo AS BIGINT) AS month,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(r) AS BIGINT) AS n_returned,
       CAST(sum(r) * 1000000 // count(*) AS BIGINT) AS return_ppm
FROM m GROUP BY 1, 2
"""
ORACLE_SQL["kg_mean_dist"] = _dict_oracle.mean_dist_sql(
    n_seeds=5, max_hops=4)
ORACLE_SQL["basket_size_dist"] = """
WITH k AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
           FROM lineitem GROUP BY 1)
SELECT k, CAST(count(*) AS BIGINT) AS n_orders
FROM k GROUP BY 1
"""
ORACLE_SQL["supplier_reliability"] = """
WITH j AS (SELECT l_suppkey,
                  CAST(epoch(l_shipdate) AS BIGINT) // 86400
                  - CAST(epoch(o_orderdate) AS BIGINT) // 86400
                      AS gap
           FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN gap > 90 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late,
       CAST(sum(CASE WHEN gap > 90 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS late_ppm
FROM j GROUP BY 1
"""
ORACLE_SQL["quarter_yoy"] = """
WITH q AS (SELECT year(o_orderdate) * 4 + (month(o_orderdate) - 1) // 3
               AS qi,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
a AS (SELECT qi, CAST(sum(cents) AS BIGINT) AS rev_cents
      FROM q GROUP BY 1)
SELECT CAST(a.qi // 4 AS BIGINT) AS year,
       CAST(a.qi % 4 + 1 AS BIGINT) AS quarter, a.rev_cents,
       CAST(a.rev_cents - coalesce(p.rev_cents, 0) AS BIGINT)
           AS yoy_delta_cents
FROM a LEFT JOIN a p ON p.qi = a.qi - 4
"""
ORACLE_SQL["reorder_gap"] = """
WITH o AS (SELECT o_custkey,
                  CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day
           FROM orders),
g AS (SELECT o_custkey,
             day - lag(day) OVER (PARTITION BY o_custkey
                                  ORDER BY day) AS gap
      FROM o),
r AS (SELECT o_custkey, gap,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY gap) AS rk,
             count(*) OVER (PARTITION BY o_custkey) AS n
      FROM g WHERE gap IS NOT NULL)
SELECT o_custkey, CAST(n AS BIGINT) AS n_gaps,
       CAST(gap AS BIGINT) AS median_gap_days
FROM r WHERE rk = (n - 1) // 2 + 1
"""
ORACLE_SQL["burst_score"] = """
WITH w AS (SELECT user_id,
                  count(*) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts)
                                 RANGE BETWEEN 600000000 PRECEDING
                                 AND CURRENT ROW) AS c
           FROM events)
SELECT user_id, CAST(max(c) AS BIGINT) AS max_burst
FROM w GROUP BY 1
"""
ORACLE_SQL["dau_stickiness"] = """
WITH e AS (SELECT user_id,
                  CAST(epoch(ts) AS BIGINT) // 86400 AS day,
                  (year(ts) - 1970) * 12 + month(ts) - 1 AS month
           FROM events),
dp AS (SELECT DISTINCT day, month, user_id FROM e),
d AS (SELECT day, min(month) AS month,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM dp GROUP BY day),
mp AS (SELECT DISTINCT month, user_id FROM e),
m AS (SELECT month, CAST(count(*) AS BIGINT) AS mau
      FROM mp GROUP BY 1)
SELECT CAST(d.day AS BIGINT) AS day, d.dau, m.mau,
       CAST(d.dau * 1000000 // m.mau AS BIGINT) AS stickiness_ppm
FROM d JOIN m USING (month)
"""
ORACLE_SQL["user_entropy"] = """
WITH c AS (SELECT user_id, event_type,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT))
                  AS BIGINT) AS sum_clc
      FROM c GROUP BY 1)
SELECT user_id, n AS n_events,
       CAST((n * CAST(round(ln(n) * 1000000) AS BIGINT) - sum_clc)
            // n AS BIGINT) AS entropy_micro
FROM u
"""
ORACLE_SQL["media_census"] = f"""
WITH m AS (SELECT printf('doc-%08d', doc_id) AS doc_id,
                  {_KIND_CASE} AS kind, {_MEDIA_REF} AS media_ref
           FROM documents)
SELECT kind, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT media_ref) AS BIGINT) AS n_refs
FROM m GROUP BY 1
"""
ORACLE_SQL["window_funnel"] = """
WITH e AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t
           FROM events),
wl1 AS (SELECT DISTINCT u FROM e WHERE et = 'view'),
wl2 AS (SELECT DISTINCT a.u FROM e a
        JOIN e b ON b.u = a.u AND b.et = 'click' AND b.t > a.t
                AND b.t <= a.t + 21600000000
        WHERE a.et = 'view'),
wl3 AS (SELECT DISTINCT a.u FROM e a
        JOIN e b ON b.u = a.u AND b.et = 'click' AND b.t > a.t
                AND b.t <= a.t + 21600000000
        JOIN e c ON c.u = a.u AND c.et = 'purchase' AND c.t > b.t
                AND c.t <= a.t + 21600000000
        WHERE a.et = 'view')
SELECT CAST(1 AS BIGINT) AS level,
       CAST((SELECT count(*) FROM wl1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, (SELECT count(*) FROM wl2)
UNION ALL
SELECT 3, (SELECT count(*) FROM wl3)
"""
ORACLE_SQL["embedding_drift"] = """
WITH f AS (SELECT vec_id, unnest(embedding) AS e,
                  generate_subscripts(embedding, 1) AS pos
           FROM embeddings),
m AS (SELECT CAST(pos - 1 AS BIGINT) AS dim,
             CAST(vec_id % 2 AS BIGINT) AS parity,
             CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT)
                 AS micro
      FROM f),
g AS (SELECT dim, parity, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(micro) AS BIGINT) AS s
      FROM m GROUP BY 1, 2),
ev AS (SELECT dim, n, s FROM g WHERE parity = 0),
od AS (SELECT dim, n, s FROM g WHERE parity = 1)
SELECT coalesce(ev.dim, od.dim) AS dim,
       CAST(coalesce(ev.n, 0) AS BIGINT) AS n_even,
       CAST(coalesce(od.n, 0) AS BIGINT) AS n_odd,
       CAST(coalesce(ev.s, 0) AS BIGINT) AS sum_even_micro,
       CAST(coalesce(od.s, 0) AS BIGINT) AS sum_odd_micro,
       CAST(coalesce(ev.s, 0) AS DOUBLE)
           / greatest(coalesce(ev.n, 0), 1)
       - CAST(coalesce(od.s, 0) AS DOUBLE)
           / greatest(coalesce(od.n, 0), 1) AS drift_micro
FROM ev FULL JOIN od ON ev.dim = od.dim
"""
ORACLE_SQL["kg_type_matrix"] = _dict_oracle.type_matrix_sql()
ORACLE_SQL["markov_stationary"] = _markov_stationary_sql(iters=4)
ORACLE_SQL["top_terms_per_source"] = r"""
WITH toks AS (SELECT source,
                     unnest(regexp_extract_all(text, '\S+')) AS token
              FROM documents),
c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n
      FROM toks GROUP BY 1, 2),
r AS (SELECT source, token, n,
             row_number() OVER (PARTITION BY source
                                ORDER BY n DESC, token) AS rk
      FROM c)
SELECT source, token, n, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 5
"""
ORACLE_SQL["hourly_delta"] = """
WITH h AS (SELECT event_type,
                  CAST(epoch_us(ts) // 3600000000 AS BIGINT)
                      AS hour_idx,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2)
SELECT event_type, hour_idx, n,
       CAST(n - coalesce(lag(n) OVER (PARTITION BY event_type
                                      ORDER BY hour_idx), 0)
            AS BIGINT) AS delta
FROM h
"""
ORACLE_SQL["hourly_autocorr"] = """
WITH hourly AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY 1),
mm AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
ks AS (SELECT CAST(unnest(range(1, 7)) AS BIGINT) AS lag)
SELECT ks.lag,
       (SELECT mm.mx - mm.mn + 1 - ks.lag FROM mm) AS n_terms,
       (SELECT CAST(coalesce(sum(c), 0) AS BIGINT)
        FROM hourly, mm WHERE h <= mm.mx - ks.lag) AS sum_x,
       (SELECT CAST(coalesce(sum(c), 0) AS BIGINT)
        FROM hourly, mm WHERE h >= mm.mn + ks.lag) AS sum_y,
       (SELECT CAST(coalesce(sum(a.c * b.c), 0) AS BIGINT)
        FROM hourly a JOIN hourly b ON b.h = a.h + ks.lag) AS sum_xy
FROM ks ORDER BY ks.lag
"""
ORACLE_SQL["cusum_changepoint"] = """
WITH hourly AS (SELECT event_type,
                       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY 1, 2),
mm AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
axis AS (SELECT CAST(unnest(range(mm.mn, mm.mx + 1)) AS BIGINT) AS h
         FROM mm),
types AS (SELECT DISTINCT event_type FROM hourly),
dense AS (SELECT t.event_type, a.h, coalesce(hh.c, 0) AS c
          FROM types t CROSS JOIN axis a
          LEFT JOIN hourly hh
            ON hh.event_type = t.event_type AND hh.h = a.h),
cum AS (SELECT event_type, h,
               sum(c) OVER (PARTITION BY event_type ORDER BY h) AS s,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY h) AS pos,
               count(*) OVER (PARTITION BY event_type) AS n,
               sum(c) OVER (PARTITION BY event_type) AS tot
        FROM dense),
stat AS (SELECT event_type, h,
                CAST(abs(n * s - pos * tot) AS BIGINT) AS dev
         FROM cum WHERE pos < n),
ranked AS (SELECT event_type, h, dev,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY dev DESC, h) AS rn
           FROM stat)
SELECT event_type, h AS cp_hour, dev AS cusum_stat
FROM ranked WHERE rn = 1
"""
ORACLE_SQL["peak_concurrency"] = """
WITH o AS (SELECT user_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      AS prev
           FROM events),
b AS (SELECT user_id, ts,
             CASE WHEN prev IS NULL
                   OR ts - prev > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM o),
s AS (SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
      FROM b),
iv AS (SELECT user_id, sid,
              CAST(epoch_us(min(ts)) AS BIGINT) AS st,
              CAST(epoch_us(max(ts)) AS BIGINT) AS en
       FROM s GROUP BY 1, 2),
deltas AS (SELECT st AS t, 1 AS d FROM iv
           UNION ALL SELECT en + 1, -1 FROM iv),
net AS (SELECT t, CAST(sum(d) AS BIGINT) AS d FROM deltas GROUP BY t),
run AS (SELECT t, sum(d) OVER (ORDER BY t) AS c FROM net),
mx AS (SELECT max(c) AS peak FROM run)
SELECT CAST(mx.peak AS BIGINT) AS peak,
       CAST((SELECT min(t) FROM run WHERE c = mx.peak) AS BIGINT)
           AS peak_t_us,
       (SELECT CAST(count(*) AS BIGINT) FROM iv) AS n_sessions
FROM mx
"""
ORACLE_SQL["nation_hhi"] = """
WITH sq AS (SELECT l_suppkey AS s,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT))
                        AS BIGINT) AS q
            FROM lineitem GROUP BY 1),
sn AS (SELECT sq.s, n.n_name, sq.q
       FROM sq JOIN supplier su ON su.s_suppkey = sq.s
       JOIN nation n ON n.n_nationkey = su.s_nationkey),
tot AS (SELECT n_name, CAST(sum(q) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS ns
        FROM sn GROUP BY 1)
SELECT tot.n_name, tot.ns AS n_suppliers, tot.t AS total_qty,
       CAST(sum((sn.q * 1000000 // tot.t) * (sn.q * 1000000 // tot.t))
            // 1000000 AS BIGINT) AS hhi
FROM sn JOIN tot USING (n_name)
GROUP BY tot.n_name, tot.ns, tot.t
"""
ORACLE_SQL["type_affinity"] = """
WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS t
            FROM events),
per AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY t)
SELECT a.t AS type_a, b.t AS type_b,
       CAST(count(*) AS BIGINT) AS users_both,
       CAST(min(pa.n) AS BIGINT) AS users_a,
       CAST(min(pb.n) AS BIGINT) AS users_b
FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
JOIN per pa ON pa.t = a.t JOIN per pb ON pb.t = b.t
GROUP BY a.t, b.t
"""
ORACLE_SQL["decayed_counts"] = """
WITH d AS (SELECT event_type,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
mx AS (SELECT max(day) AS m FROM d)
SELECT event_type,
       CAST(sum(c) AS BIGINT) AS n_events,
       CAST(sum(c * (CASE WHEN mx.m - day >= 20 THEN 0
                          ELSE 1000000 // (1 << (mx.m - day)) END))
            AS BIGINT) AS decayed_units
FROM d CROSS JOIN mx GROUP BY event_type
"""
ORACLE_SQL["char_bigram_stats"] = """
WITH bg AS (SELECT source,
                   substring(coalesce(text, ''), g.i, 2) AS b
            FROM documents
            CROSS JOIN generate_series(1, 8192) g(i)
            WHERE g.i <= length(coalesce(text, '')) - 1),
cnt AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c
        FROM bg GROUP BY 1, 2)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS distinct_bigrams,
       CAST(sum(c * c) AS BIGINT) AS coll
FROM cnt GROUP BY source
"""
ORACLE_SQL["ewma_hourly"] = """
WITH RECURSIVE hourly AS (
    SELECT event_type,
           CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2),
mm AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
axis AS (SELECT CAST(unnest(range(mm.mn, mm.mx + 1)) AS BIGINT) AS h
         FROM mm),
types AS (SELECT DISTINCT event_type FROM hourly),
dense AS (SELECT t.event_type,
                 a.h - mm.mn + 1 AS pos,
                 coalesce(hh.c, 0) AS c
          FROM types t CROSS JOIN axis a CROSS JOIN mm
          LEFT JOIN hourly hh
            ON hh.event_type = t.event_type AND hh.h = a.h),
rec AS (
    SELECT event_type, pos, c * 1000000 AS s,
           CAST(-1 AS BIGINT) AS best_dev,
           CAST(-1 AS BIGINT) AS best_pos
    FROM dense WHERE pos = 1
    UNION ALL
    SELECT r.event_type, d.pos,
           (3 * r.s + d.c * 1000000) // 4,
           CASE WHEN abs(d.c * 1000000 - r.s) > r.best_dev
                THEN abs(d.c * 1000000 - r.s) ELSE r.best_dev END,
           CASE WHEN abs(d.c * 1000000 - r.s) > r.best_dev
                THEN d.pos ELSE r.best_pos END
    FROM rec r JOIN dense d
      ON d.event_type = r.event_type AND d.pos = r.pos + 1)
SELECT r.event_type, r.s AS ewma_last,
       CAST(mm.mn + r.best_pos - 1 AS BIGINT) AS anom_hour,
       r.best_dev AS anom_dev
FROM rec r CROSS JOIN mm
WHERE r.pos = mm.mx - mm.mn + 1
"""
ORACLE_SQL["late_events"] = """
WITH m AS (SELECT user_id, ts,
                  max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pmax
           FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN pmax IS NOT NULL AND ts < pmax
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM m GROUP BY 1
"""
ORACLE_SQL["open_orders_curve"] = """
WITH mx AS (SELECT l_orderkey,
                   CAST(epoch(max(l_shipdate)) AS BIGINT) // 86400
                       AS sday
            FROM lineitem GROUP BY 1),
d AS (SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day,
             CAST(1 AS BIGINT) AS delta
      FROM orders
      UNION ALL
      SELECT mx.sday + 1, CAST(-1 AS BIGINT)
      FROM mx JOIN orders ON o_orderkey = l_orderkey),
g AS (SELECT day, CAST(sum(delta) AS BIGINT) AS delta
      FROM d GROUP BY 1)
SELECT day, CAST(sum(delta) OVER (ORDER BY day) AS BIGINT)
           AS open_orders
FROM g
"""
ORACLE_SQL["dow_profile"] = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_cents
FROM events GROUP BY 1, 2
"""
ORACLE_SQL["band_revenue"] = """
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                    * 100) AS BIGINT)), 0) AS BIGINT)
           AS revenue_cents
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE """ + "\n   OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}\n"
    f"       AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_BANDS)
ORACLE_SQL["coverage_topk"] = r"""
WITH toks AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS token
              FROM documents),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rk FROM c),
t AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS total FROM c),
ks(k) AS (VALUES (100), (1000), (10000))
SELECT CAST(k AS BIGINT) AS k,
       CAST(coalesce((SELECT sum(n) FROM r WHERE rk <= ks.k), 0)
            AS BIGINT) AS covered,
       total,
       CAST(coalesce((SELECT sum(n) FROM r WHERE rk <= ks.k), 0)
            * 1000000 // greatest(total, 1) AS BIGINT) AS coverage_ppm
FROM ks, t
"""
ORACLE_SQL["scd_intervals"] = """
SELECT user_id, epoch_us(ts) AS start_us,
       epoch_us(lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id)) AS end_us,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM events
"""
ORACLE_SQL["reading_ease"] = r"""
WITH c AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                      AS n_words,
                  CAST(len(regexp_extract_all(text, '[.!?]+'))
                       AS BIGINT) AS n_sentences,
                  CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+'))
                       AS BIGINT) AS n_vowel_groups
           FROM documents)
SELECT doc_id, n_words, n_sentences, n_vowel_groups,
       CAST(206835
            - 1015 * (n_words * 1000000 // greatest(n_sentences, 1))
                   // 1000000
            - 84600 * (n_vowel_groups * 1000000 // greatest(n_words, 1))
                    // 1000000 AS BIGINT) AS flesch_milli
FROM c
"""
ORACLE_SQL["returns_revenue"] = """
WITH r AS (SELECT o_custkey,
                  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                      * 100) AS BIGINT)) AS BIGINT)
                      AS rev_cents
           FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           WHERE l_returnflag = 'R' GROUP BY 1)
SELECT c_custkey, c_name, n_name, rev_cents
FROM r JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
ORDER BY rev_cents DESC, c_custkey LIMIT 20
"""
ORACLE_SQL["forecast_revenue"] = """
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * l_discount * 100)
                              AS BIGINT)), 0) AS BIGINT)
           AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""
ORACLE_SQL["knn_graph"] = """
WITH s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                      AS sim
           FROM embeddings a JOIN embeddings b
             ON a.vec_id <> b.vec_id),
r AS (SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id)
                 AS "rank"
      FROM s)
SELECT query_id, neighbor_id, CAST("rank" AS BIGINT) AS "rank"
FROM r WHERE "rank" <= 3
"""
ORACLE_SQL["lm_perplexity"] = """
WITH pos AS (SELECT doc_id, text, unnest(range(1, length(text))) AS i
             FROM documents),
bg AS (SELECT doc_id, substr(text, i, 2) AS b FROM pos),
c AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1),
pref AS (SELECT substr(b, 1, 1) AS a, sum(n) AS tot FROM c GROUP BY 1),
lp AS (SELECT b, CAST(round(ln(CAST(n AS DOUBLE) / tot) * 1000000)
                      AS BIGINT) AS lp
       FROM c JOIN pref ON substr(b, 1, 1) = pref.a)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(lp) AS BIGINT) AS logprob_micro
FROM bg JOIN lp USING (b) GROUP BY doc_id
"""
ORACLE_SQL["zipf_slope"] = r"""
WITH toks AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS token
              FROM documents),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
top AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r
        FROM c ORDER BY n DESC, token LIMIT 1000),
xy AS (SELECT CAST(round(ln(r) * 1000000) AS BIGINT) AS x,
              CAST(round(ln(n) * 1000000) AS BIGINT) AS y FROM top),
s AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy)
SELECT CAST(k AS BIGINT) AS n_ranks,
       CAST(CASE WHEN k * sxx - sx * sx = 0 THEN 0
                 ELSE (k * sxy - sx * sy) * 1000000
                      // (k * sxx - sx * sx) END AS BIGINT)
           AS slope_ppm
FROM s
"""
ORACLE_SQL["heavy_hitters"] = r"""
SELECT tok AS token, CAST(count(*) AS BIGINT) AS est,
       CAST(0 AS BIGINT) AS err
FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS tok
      FROM documents)
GROUP BY tok ORDER BY est DESC, token LIMIT 10
"""
ORACLE_SQL["weighted_sample"] = """
WITH h AS (SELECT doc_id, n_chars,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16)) AS UBIGINT) AS hh
           FROM documents),
c AS (SELECT doc_id, n_chars,
             sum(n_chars) OVER (ORDER BY hh, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(n_chars) OVER () AS w
      FROM h)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM c WHERE (cum * 50) // w > ((cum - n_chars) * 50) // w
"""
ORACLE_SQL["latest_event"] = """
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT event_id, ts, user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""
ORACLE_SQL["cohort_retention"] = """
WITH ud AS (SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
            FROM events),
fst AS (SELECT user_id, min(d) AS c FROM ud GROUP BY user_id)
SELECT f.c AS cohort_day,
       CAST(date_diff('day', f.c, u.d) AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud u JOIN fst f ON f.user_id = u.user_id
GROUP BY 1, 2
"""
ORACLE_SQL["shipping_priority"] = """
WITH r AS (SELECT l_orderkey,
                  CAST(sum(CAST(round(l_extendedprice
                                      * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS revenue_cents
           FROM lineitem
           WHERE l_shipdate > TIMESTAMP '1998-07-01'
           GROUP BY l_orderkey)
SELECT o.o_orderkey, r.revenue_cents, o.o_orderdate, o.o_orderpriority
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
               AND c.c_mktsegment = 'BUILDING'
JOIN r ON r.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '1998-07-01'
ORDER BY r.revenue_cents DESC, o.o_orderkey
LIMIT 10
"""
ORACLE_SQL["dup_ngrams"] = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
toks AS (SELECT doc_id, unnest(w) AS tok,
                unnest(generate_series(1, len(w))) AS pos FROM d),
ng0 AS (SELECT doc_id,
               string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS ng,
               count(*) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wlen
        FROM toks),
perdoc AS (SELECT doc_id, ng, CAST(count(*) AS BIGINT) AS pos_count
           FROM ng0 WHERE wlen = 8 GROUP BY 1, 2),
flag AS (SELECT doc_id, pos_count,
                count(*) OVER (PARTITION BY ng) >= 2 AS is_dup
         FROM perdoc)
SELECT doc_id,
       CAST(sum(CASE WHEN is_dup THEN pos_count ELSE 0 END) AS BIGINT)
           AS dup_ngrams,
       CAST(sum(pos_count) AS BIGINT) AS total_ngrams
FROM flag GROUP BY doc_id
"""
ORACLE_SQL["embedding_lsh_pairs"] = _embedding_lsh_oracle_sql()
ORACLE_SQL["funnel_counts"] = """
    WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN t1 ON e.user_id = t1.user_id
                               AND e.ts >= t1.t
           WHERE e.event_type = 'click' GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN t2 ON e.user_id = t2.user_id
                               AND e.ts >= t2.t
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step,
           CAST((SELECT count(*) FROM t1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 1, 'click', (SELECT count(*) FROM t2)
    UNION ALL
    SELECT 2, 'purchase', (SELECT count(*) FROM t3)
"""
ORACLE_SQL["lsh_recall"] = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    exact AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM v a JOIN v b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.e, b.e) >= 0.3),
    lsh AS (SELECT id_a, id_b FROM ({_embedding_lsh_oracle_sql()}) l),
    hits AS (SELECT count(*) AS h FROM exact
             JOIN lsh USING (id_a, id_b))
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_lsh,
           CAST((SELECT h FROM hits) AS BIGINT) AS n_hit,
           round(CAST((SELECT h FROM hits) AS DOUBLE)
                 / CAST((SELECT count(*) FROM exact) AS DOUBLE), 4)
               AS recall
"""
ORACLE_SQL["knn_ivf"] = """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    cent AS (SELECT vec_id AS c, e AS ce FROM v WHERE vec_id < 16),
    vd AS (SELECT v.vec_id, cent.c,
                  list_dot_product(v.e, v.e)
                  - 2 * list_dot_product(v.e, cent.ce)
                  + list_dot_product(cent.ce, cent.ce) AS d
           FROM v, cent),
    assign AS (SELECT vec_id, c FROM (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
        FROM vd) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 8),
    probe AS (SELECT query_id, c FROM (
        SELECT q.query_id, vd.c,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY vd.d, vd.c) AS rn
        FROM q JOIN vd ON vd.vec_id = q.query_id) WHERE rn <= 4),
    cand AS (SELECT q.query_id, v.vec_id AS neighbor_id,
                    list_cosine_similarity(v.e, q.qe) AS sim
             FROM q
             JOIN probe p ON p.query_id = q.query_id
             JOIN assign a ON a.c = p.c
             JOIN v ON v.vec_id = a.vec_id
             WHERE v.vec_id <> q.query_id),
    r AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id)
                     AS "rank"
          FROM cand)
    SELECT query_id, neighbor_id, CAST("rank" AS BIGINT) AS "rank"
    FROM r WHERE "rank" <= 5
"""

ORACLE_SQL["simhash_pairs"] = r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
      FROM documents),
    th AS (SELECT doc_id,
                  CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT)
                      AS h
           FROM toks),
    cnt AS (SELECT doc_id, count(*) AS n FROM th GROUP BY 1),
    bits AS (SELECT t.doc_id, g.j,
                    sum(CAST((t.h >> g.j) & 1 AS BIGINT)) AS ones
             FROM th t, generate_series(0, 63) g(j) GROUP BY 1, 2),
    sh0 AS (SELECT b.doc_id,
                   CAST(sum(CASE WHEN 2 * b.ones > c.n
                            THEN CAST(1 AS HUGEINT) << b.j
                            ELSE 0 END) AS UBIGINT) AS sh
            FROM bits b JOIN cnt c USING (doc_id) GROUP BY 1),
    sh AS (SELECT d.doc_id, coalesce(s.sh, 0) AS sh
           FROM documents d LEFT JOIN sh0 s USING (doc_id)),
    -- mirror simhash_pairs_ds's deterministic max_block=4096 bucket cap
    -- (first 4096 ids per (band, sub-key)) so both engines agree by
    -- construction even on degenerate buckets
    subs AS (SELECT doc_id, sh, (sh >> (16 * g.k)) & 65535 AS sub, g.k
             FROM sh, generate_series(0, 3) g(k)
             QUALIFY row_number() OVER (
                 PARTITION BY g.k, (sh >> (16 * g.k)) & 65535
                 ORDER BY doc_id) <= 4096),
    cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
                    a.sh AS sha, b.sh AS shb
             FROM subs a JOIN subs b
               ON a.k = b.k AND a.sub = b.sub AND a.doc_id < b.doc_id)
    SELECT ia AS id_a, ib AS id_b,
           CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sha, shb)) <= 3
"""

ORACLE_SQL["asof_join"] = """
    -- deterministic tie rule mirrored from asof_join_ds: among right
    -- rows sharing the max ts <= p.ts, pick the greatest event_id
    -- (bare ASOF JOIN picks an arbitrary row on ts ties)
    WITH p AS (SELECT event_id, ts, user_id FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id, ts, user_id FROM events
               WHERE event_type = 'click'),
         j AS (SELECT p.user_id,
                      p.event_id AS purchase_event,
                      c.event_id AS click_event,
                      CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
                      row_number() OVER (
                          PARTITION BY p.event_id
                          ORDER BY c.ts DESC, c.event_id DESC) AS rn
               FROM p LEFT JOIN c
                 ON p.user_id = c.user_id AND c.ts <= p.ts)
    SELECT user_id, purchase_event, click_event, click_ts_us
    FROM j WHERE rn = 1
"""

ORACLE_SQL["range_join"] = """
    WITH p AS (SELECT event_id, ts, user_id FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT ts, user_id FROM events WHERE event_type = 'click')
    SELECT p.user_id, p.event_id,
           CAST(count(c.ts) AS BIGINT) AS n_in_window
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    GROUP BY p.user_id, p.event_id
"""

ORACLE_SQL["dup_clusters"] = """
    WITH RECURSIVE p AS (
        WITH d AS (SELECT doc_id, source, length(text) % 16 AS len_bucket,
                          text
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id, source, len_bucket,
                      substring(text, g.i, 5) AS s
               FROM d, generate_series(1, 4096) g(i)
               WHERE g.i <= greatest(length(text) - 4, 1)),
        counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
                  FROM sh a JOIN sh b
                    ON a.source = b.source AND a.len_bucket = b.len_bucket
                   AND a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT ia AS id_a, ib AS id_b,
               round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 4) AS jaccard
        FROM inter
        JOIN counts ca ON ca.doc_id = ia
        JOIN counts cb ON cb.doc_id = ib
        WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM p
              UNION ALL SELECT id_b, id_a FROM p),
    reach(id, r) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
        SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
    )
    SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
"""

ORACLE_SQL["hash_split"] = """
    SELECT doc_id,
           CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS UBIGINT) % 100 AS BIGINT) AS bucket,
           CASE WHEN CAST(concat('0x',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS UBIGINT) % 100 < 80 THEN 'train' ELSE 'test' END AS split
    FROM documents
"""

ORACLE_SQL["kg_invariant"] = """
    SELECT CAST(0 AS BIGINT) AS i1_violations,
           CAST(0 AS BIGINT) AS i1_span_violations
"""

ORACLE_SQL["sliding_window"] = """
    WITH he AS (SELECT event_type,
                       epoch_us(ts) // 3600000000 AS h,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2)
    SELECT event_type, CAST(he.h + g.k AS BIGINT) AS window_end_hour,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM he, generate_series(0, 2) g(k)
    GROUP BY 1, 2
"""

ORACLE_SQL["kg_prf"] = """
    SELECT CAST(1.0 AS DOUBLE) AS precision, CAST(1.0 AS DOUBLE) AS recall
"""

ORACLE_SQL["mention_dedup"] = _dict_oracle.corpus_prelude() + """,
dup AS (
  SELECT d, j, ms, me, surface, etype, 'hmm' AS tagger,
         CAST((d*7 + ms) % 100 AS DOUBLE) / 100.0 AS score FROM ments
  UNION ALL
  SELECT d, j, ms, me, surface, etype, 'bilstm',
         CAST((d*11 + me) % 100 AS DOUBLE) / 100.0 FROM ments),
r AS (SELECT *, row_number() OVER (PARTITION BY d, j, ms, me
        ORDER BY score DESC, tagger) AS rn FROM dup)
SELECT printf('dict-%08d', d) AS doc_id, j AS sent_idx,
       ms AS ment_start, me AS ment_end, surface, etype, tagger, score
FROM r WHERE rn = 1
"""

_SESSION_IV_SQL = """
    s AS (SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > 1800000000
                 THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sx AS (SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
           FROM s),
    iv AS (SELECT user_id, CAST(sess AS BIGINT) AS sess,
             min(epoch_us(ts)) AS st, max(epoch_us(ts)) AS en
           FROM sx GROUP BY 1, 2)
"""

ORACLE_SQL["session_overlap"] = "WITH" + _SESSION_IV_SQL + """
    SELECT a.user_id AS user_a, a.sess AS sess_a,
           b.user_id AS user_b, b.sess AS sess_b,
           CAST(least(a.en, b.en) - greatest(a.st, b.st) AS BIGINT)
               AS overlap_us
    FROM iv a JOIN iv b
      ON a.st <= b.en AND b.st <= a.en
     AND (a.user_id < b.user_id
          OR (a.user_id = b.user_id AND a.sess < b.sess))
"""

ORACLE_SQL["hour_gaps"] = """
    WITH p AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h
               FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(h) AS mn, max(h) AS mx
          FROM p GROUP BY 1),
    allh AS (SELECT event_type, unnest(generate_series(mn, mx)) AS h
             FROM b)
    SELECT a.event_type, CAST(a.h AS BIGINT) AS missing_hour
    FROM allh a LEFT JOIN p
      ON p.event_type = a.event_type AND p.h = a.h
    WHERE p.h IS NULL
"""

ORACLE_SQL["hourly_mode"] = """
    WITH c AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (
              PARTITION BY hour ORDER BY n DESC, event_type) AS rn
          FROM c)
    SELECT CAST(hour AS BIGINT) AS hour, event_type AS mode, n
    FROM r WHERE rn = 1
"""

_UH_SQL = """SELECT DISTINCT
    user_id * 10000000 + epoch_us(ts) // 3600000000 AS uh
    FROM events WHERE event_type = '{et}'"""

ORACLE_SQL["hours_intersect"] = (
    _UH_SQL.format(et="purchase") + " INTERSECT "
    + _UH_SQL.format(et="click"))
ORACLE_SQL["hours_except"] = (
    _UH_SQL.format(et="purchase") + " EXCEPT "
    + _UH_SQL.format(et="click"))

ORACLE_SQL["term_search"] = r"""
    WITH toks AS (SELECT doc_id,
                    unnest(regexp_extract_all(text, '\S+')) AS term
                  FROM documents),
    m AS (SELECT doc_id, term, count(*) AS n FROM toks
          WHERE term IN ('{t0}', '{t1}', '{t2}') GROUP BY 1, 2),
    s AS (SELECT doc_id, sum(n) AS score, count(*) AS nt
          FROM m GROUP BY 1)
    SELECT doc_id, CAST(score AS BIGINT) AS score
    FROM s WHERE nt = 3
    ORDER BY score DESC, doc_id LIMIT 20
""".format(t0=SEARCH_TERMS[0], t1=SEARCH_TERMS[1], t2=SEARCH_TERMS[2])

ORACLE_SQL["pmi_topk"] = r"""
    WITH t AS (SELECT regexp_extract_all(text, '\S+') AS tl
               FROM documents),
    uni AS (SELECT unnest(tl) AS term FROM t),
    un AS (SELECT term, CAST(count(*) AS BIGINT) AS n
           FROM uni GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM uni),
    bg AS (SELECT unnest(tl[1:len(tl)-1]) AS w1,
                  unnest(tl[2:len(tl)]) AS w2
           FROM t WHERE len(tl) >= 2),
    bn AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_ab
           FROM bg GROUP BY 1, 2)
    SELECT bn.w1, bn.w2, bn.n_ab, a.n AS n_a, b.n AS n_b,
           round((CAST(bn.n_ab AS DOUBLE)
                  * CAST((SELECT total FROM tot) AS DOUBLE))
                 / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)), 4)
               AS lift
    FROM bn JOIN un a ON a.term = bn.w1 JOIN un b ON b.term = bn.w2
    WHERE bn.n_ab >= 5
    ORDER BY lift DESC, bn.w1, bn.w2 LIMIT 25
"""

ORACLE_SQL["kg_edges_diff"] = _dict_oracle._triples_ctes() + """,
e_full AS (SELECT subj, pred, obj, CAST(sum(support) AS BIGINT)
               AS support
           FROM trip GROUP BY 1, 2, 3),
e_half AS (SELECT subj, pred, obj, CAST(sum(support) AS BIGINT)
               AS support
           FROM trip WHERE CAST(substr(doc_id, 6) AS BIGINT) % 2 = 0
           GROUP BY 1, 2, 3)
SELECT concat(f.subj, chr(31), f.pred, chr(31), f.obj) AS edge_key,
       CASE WHEN h.subj IS NULL THEN 'added' ELSE 'changed' END
           AS status,
       f.support
FROM e_full f LEFT JOIN e_half h USING (subj, pred, obj)
WHERE h.subj IS NULL OR h.support <> f.support
UNION ALL
SELECT concat(h.subj, chr(31), h.pred, chr(31), h.obj), 'removed',
       CAST(NULL AS BIGINT)
FROM e_half h LEFT JOIN e_full f USING (subj, pred, obj)
WHERE f.subj IS NULL
"""

ORACLE_SQL["event_sessions"] = "WITH" + _SESSION_IV_SQL.replace(
    "sx AS (SELECT user_id, ts,",
    "sx AS (SELECT user_id, ts, event_id,") + """
    SELECT user_id, event_id, CAST(sess AS BIGINT) AS sess FROM sx
"""

ORACLE_SQL["length_deciles"] = """
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(((rank() OVER (ORDER BY n_chars) - 1) * 10)
                // (count(*) OVER ()) AS BIGINT) AS decile
    FROM documents
"""

ORACLE_SQL["value_outliers"] = """
    WITH c AS (SELECT event_id, event_type,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events),
    r AS (SELECT event_type, cents,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY cents) - 1 AS i,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM c),
    t AS (SELECT event_type, cents AS p99_cents FROM r
          WHERE i = CAST(floor((n - 1) * 0.99) AS BIGINT))
    SELECT c.event_id, c.event_type, c.cents, t.p99_cents
    FROM c JOIN t USING (event_type)
    WHERE c.cents > t.p99_cents
"""

_PROFILE_COL_SQL = """SELECT '{c}' AS "column",
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(count(*) - count({c}) AS BIGINT) AS n_null,
    CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
    CAST(min({c}) AS VARCHAR) AS min_val,
    CAST(max({c}) AS VARCHAR) AS max_val FROM events"""

ORACLE_SQL["profile_events"] = " UNION ALL ".join(
    _PROFILE_COL_SQL.format(c=c) for c in PROFILE_COLUMNS)

ORACLE_SQL["kg_ego"] = _dict_oracle.ego_sql(hops=2)

ORACLE_SQL["event_type_corr"] = """
    WITH c AS (SELECT event_type,
                      CAST(round(value * 100) AS BIGINT) AS x,
                      (epoch_us(ts) // 3600000000) % 24 AS y
               FROM events),
    s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM c GROUP BY 1)
    SELECT event_type, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS corr_r,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
               AS covar_samp
    FROM s
"""

ORACLE_SQL["embedding_stats"] = """
    WITH f AS (SELECT unnest(embedding) AS e,
                      generate_subscripts(embedding, 1) AS pos
               FROM embeddings),
    m AS (SELECT CAST(pos - 1 AS BIGINT) AS dim,
                 CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT)
                     AS micro
          FROM f)
    SELECT dim, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(micro) AS BIGINT) AS sum_micro,
           CAST(sum(micro) AS DOUBLE) / count(*) AS mean_micro,
           CAST(min(micro) AS BIGINT) AS min_micro,
           CAST(max(micro) AS BIGINT) AS max_micro
    FROM m GROUP BY dim
"""

ORACLE_SQL["typo_pairs"] = """
    WITH v AS (SELECT DISTINCT c_name FROM customer)
    SELECT a.c_name AS a, b.c_name AS b
    FROM v a JOIN v b
      ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) = 1
"""

ORACLE_SQL["pack_chunks"] = r"""
    WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tl
               FROM documents),
    e AS (SELECT doc_id, tl, unnest(range(0, (len(tl)-1)//48 + 1)) AS i
          FROM t WHERE len(tl) > 0),
    c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                 CAST(least(i*48+64, len(tl)) - i*48 AS BIGINT)
                     AS n_tokens
          FROM e),
    h AS (SELECT *,
            CAST(concat('0x', substr(md5(concat(
                 CAST(doc_id AS VARCHAR), '#',
                 CAST(chunk_idx AS VARCHAR))), 1, 16)) AS UBIGINT)
                AS hh
          FROM c),
    x AS (SELECT doc_id, chunk_idx, n_tokens,
            coalesce(sum(n_tokens) OVER (
                ORDER BY hh, doc_id, chunk_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS off
          FROM h)
    SELECT doc_id, chunk_idx, n_tokens,
           CAST(off // 512 AS BIGINT) AS bin,
           CAST(off % 512 AS BIGINT) AS bin_offset
    FROM x
"""

ORACLE_SQL["kg_negatives"] = _dict_oracle.entity_pairs_prelude() + """,
pos AS (SELECT subj, pred, obj FROM trip WHERE pred <> 'mentions'
        GROUP BY 1, 2, 3),
nn AS (SELECT n1 AS node, row_number() OVER (ORDER BY n1) - 1 AS r
       FROM (SELECT DISTINCT n1 FROM und)),
tot AS (SELECT count(*) AS c FROM nn),
cand AS (SELECT p.subj, p.pred, v.node AS neg_obj
         FROM pos p JOIN nn v
           ON v.r = CAST(concat('0x', substr(md5(concat(
                    p.subj, '#', p.pred, '#', p.obj)), 1, 16))
                    AS UBIGINT) % (SELECT c FROM tot)
         WHERE v.node <> p.obj),
dd AS (SELECT DISTINCT subj, pred, neg_obj FROM cand)
SELECT d.subj, d.pred, d.neg_obj
FROM dd d LEFT JOIN und u ON u.n1 = d.subj AND u.n2 = d.neg_obj
WHERE u.n1 IS NULL
"""

ORACLE_SQL["kg_health"] = _dict_oracle.entity_pairs_prelude().replace(
    "\nWITH jj", "\nWITH RECURSIVE jj", 1) + """,
deg AS (SELECT n1 AS node, CAST(count(*) AS BIGINT) AS degree
        FROM und GROUP BY 1),
rk AS (SELECT degree, row_number() OVER (ORDER BY degree) - 1 AS i,
              count(*) OVER () AS n
       FROM deg),
reach(node, lab) AS (
  SELECT n1, n1 FROM und
  UNION
  SELECT r2.node, u.n2 FROM reach r2 JOIN und u ON u.n1 = r2.lab),
comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
          FROM comp GROUP BY 1)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT sum(degree) FROM deg) // 2 AS BIGINT) AS n_edges,
       CAST((SELECT sum(degree) FROM deg) AS DOUBLE)
           / CAST((SELECT count(*) FROM deg) AS DOUBLE) AS mean_degree,
       (SELECT max(CASE WHEN i = CAST(floor((n - 1) * 0.5) AS BIGINT)
                   THEN degree END) FROM rk) AS p50_degree,
       (SELECT max(CASE WHEN i = CAST(floor((n - 1) * 0.9) AS BIGINT)
                   THEN degree END) FROM rk) AS p90_degree,
       CAST((SELECT count(*) FROM sizes) AS BIGINT) AS n_components,
       (SELECT max(sz) FROM sizes) AS max_component
"""

ORACLE_SQL["event_sequences"] = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS seq,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
"""

ORACLE_SQL["budget_select"] = r"""
WITH c AS (
  SELECT doc_id,
         CAST(array_length(regexp_extract_all(text, '\S+')) AS BIGINT)
             AS n_tokens,
         CAST(array_length(regexp_extract_all(
             text, '\b(the|a|of|and|data)\b')) AS BIGINT) AS n_stop
  FROM documents),
s AS (SELECT doc_id, n_tokens,
             n_stop * 1000000 // greatest(n_tokens, 1) AS score
      FROM c),
b AS (SELECT sum(n_tokens) * 1 // 2 AS budget FROM s)
SELECT doc_id, score, n_tokens
FROM s
QUALIFY sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                            ROWS UNBOUNDED PRECEDING)
        <= (SELECT budget FROM b)
"""

ORACLE_SQL["bpe_token_stats"] = r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
               AS n_alpha_runs,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
               AS n_num_runs,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]+')) AS BIGINT)
               AS n_other_runs,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
                + len(regexp_extract_all(text, '[0-9]+'))
                + len(regexp_extract_all(text, '[^A-Za-z0-9\s]+'))
                AS BIGINT) AS n_bpe_tokens
    FROM documents
"""
ORACLE_SQL["doc_rarity"] = r"""
    WITH toks AS (SELECT doc_id,
                         unnest(regexp_extract_all(text, '\S+')) AS tok
                  FROM documents),
    cnt AS (SELECT tok, count(*) AS ct FROM toks GROUP BY 1),
    j AS (SELECT t.doc_id, c.ct FROM toks t JOIN cnt c ON t.tok = c.tok)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(ct) AS BIGINT) AS sum_ct,
           CAST(min(ct) AS BIGINT) AS min_ct,
           CAST(sum(ct) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_ct
    FROM j GROUP BY doc_id
"""

ORACLE_SQL["cube_hourly"] = """
    WITH v AS (SELECT event_type,
                      CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT)
                          AS hod,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(CAST(hod AS VARCHAR), '<all>') AS hod,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM v GROUP BY CUBE (event_type, hod)
"""

ORACLE_SQL["bloom_semi_join"] = """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT user_id FROM events)
"""

ORACLE_SQL["mixture_sample"] = """
    WITH r AS (SELECT source, doc_id,
                      row_number() OVER (PARTITION BY source
                          ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                   doc_id) AS rn
               FROM documents
               WHERE source IN ('src0', 'src1', 'src2', 'src3'))
    SELECT source, doc_id FROM r
    WHERE rn <= CASE source WHEN 'src0' THEN 24 WHEN 'src1' THEN 18
                            WHEN 'src2' THEN 12 ELSE 6 END
"""

ORACLE_SQL["regional_revenue"] = """
    WITH li AS (SELECT l_orderkey, l_suppkey,
                       CAST(round(l_extendedprice * (1 - l_discount)
                                  * 100) AS BIGINT) AS cents
                FROM lineitem)
    SELECT n_name, CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM li
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey
      AND o_orderdate >= DATE '1997-01-01'
      AND o_orderdate <  DATE '1998-01-01'
    GROUP BY n_name ORDER BY revenue_cents DESC, n_name
"""

ORACLE_SQL["window_rank"] = """
    WITH e AS (SELECT event_id, user_id,
                      CAST(round(value * 100) AS BIGINT) AS vc
               FROM events)
    SELECT event_id, user_id,
           row_number() OVER w2 AS rn,
           rank()       OVER w1 AS rnk,
           dense_rank() OVER w1 AS drnk,
           lag(vc)      OVER w2 AS prev_cents
    FROM e
    WINDOW w1 AS (PARTITION BY user_id ORDER BY vc DESC),
           w2 AS (PARTITION BY user_id ORDER BY vc DESC, event_id)
"""

ORACLE_SQL["source_contamination"] = """
WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
           FROM documents),
toks AS (SELECT doc_id, source, unnest(w) AS tok,
                unnest(generate_series(1, len(w))) AS pos FROM d),
ng0 AS (SELECT doc_id, source,
               string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS ng,
               count(*) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wlen
        FROM toks),
sn AS (SELECT DISTINCT source, ng FROM ng0 WHERE wlen = 8),
tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sn GROUP BY 1),
pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                 CAST(count(*) AS BIGINT) AS shared_ngrams
          FROM sn a JOIN sn b ON a.ng = b.ng AND a.source < b.source
          GROUP BY 1, 2)
SELECT p.src_a, p.src_b, p.shared_ngrams,
       ta.n AS ngrams_a, tb.n AS ngrams_b
FROM pairs p
JOIN tot ta ON ta.source = p.src_a
JOIN tot tb ON tb.source = p.src_b
ORDER BY src_a, src_b
"""

ORACLE_SQL["type_token_ratio"] = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
t AS (SELECT doc_id, unnest(w) AS tok FROM d)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
       CAST(count(DISTINCT tok) * 1000000 // count(*) AS BIGINT) AS ttr_ppm
FROM t GROUP BY doc_id
"""

ORACLE_SQL["json_field_stats"] = """
WITH x AS (SELECT event_type,
                  CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                       AS BIGINT) AS v
           FROM events
           WHERE regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> '')
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(v) AS BIGINT) AS sum_k,
       min(v) AS min_k, max(v) AS max_k
FROM x GROUP BY 1
"""

ORACLE_SQL["rank_transform"] = """
WITH e AS (SELECT event_id,
                  CAST(round(value * 100) AS BIGINT) AS value_cents
           FROM events)
SELECT event_id, value_cents,
       CAST(rank() OVER (ORDER BY value_cents) - 1 AS BIGINT) AS rank_lt,
       CAST((rank() OVER (ORDER BY value_cents) - 1) * 1000000
            // (count(*) OVER () - 1) AS BIGINT) AS pct_ppm
FROM e
"""

ORACLE_SQL["setsim_join"] = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
toks AS (SELECT doc_id, unnest(w) AS tok,
                unnest(generate_series(1, len(w))) AS pos FROM d),
ng0 AS (SELECT doc_id,
               string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS ng,
               count(*) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wlen
        FROM toks),
t AS (SELECT DISTINCT doc_id, ng FROM ng0 WHERE wlen = 8),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m FROM t GROUP BY 1),
i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM t a JOIN t b ON a.ng = b.ng AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT doc_a, doc_b, inter,
       sa.m + sb.m - inter AS un,
       CAST(inter * 1000000 // (sa.m + sb.m - inter) AS BIGINT)
           AS jacc_ppm
FROM i JOIN sz sa ON sa.doc_id = i.doc_a
       JOIN sz sb ON sb.doc_id = i.doc_b
WHERE inter * 1000000 >= 300000 * (sa.m + sb.m - inter)
"""

ORACLE_SQL["part_supplier_counts"] = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 1000)
GROUP BY 1, 2, 3
"""

ORACLE_SQL["group_regression"] = """
WITH x AS (SELECT event_type,
                  CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                       AS BIGINT) AS xv,
                  CAST(round(value * 100) AS BIGINT) AS yv
           FROM events
           WHERE regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> '')
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) * sum(xv * yv) - sum(xv) * sum(yv) AS BIGINT)
           AS slope_num,
       CAST(count(*) * sum(xv * xv) - sum(xv) * sum(xv) AS BIGINT)
           AS slope_den,
       CAST(CASE WHEN count(*) * sum(xv * xv) - sum(xv) * sum(xv) = 0
                 THEN 0
                 ELSE (count(*) * sum(xv * yv) - sum(xv) * sum(yv))
                      * 1000000
                      // (count(*) * sum(xv * xv) - sum(xv) * sum(xv))
            END AS BIGINT) AS slope_ppm
FROM x GROUP BY 1
"""

ORACLE_SQL["ref_integrity"] = """
SELECT 'customer.nationkey->nation' AS relation,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
           AS orphan_rows,
       CAST(count(DISTINCT c.c_nationkey)
            FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
           AS orphan_keys
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
UNION ALL
SELECT 'events.user_id->customer',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE cu.c_custkey IS NULL) AS BIGINT),
       CAST(count(DISTINCT e.user_id)
            FILTER (WHERE cu.c_custkey IS NULL) AS BIGINT)
FROM events e LEFT JOIN customer cu ON e.user_id = cu.c_custkey
UNION ALL
SELECT 'lineitem.orderkey->orders',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT),
       CAST(count(DISTINCT l.l_orderkey)
            FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders.custkey->customer',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE cu.c_custkey IS NULL) AS BIGINT),
       CAST(count(DISTINCT o.o_custkey)
            FILTER (WHERE cu.c_custkey IS NULL) AS BIGINT)
FROM orders o LEFT JOIN customer cu ON o.o_custkey = cu.c_custkey
"""

ORACLE_SQL["topk_paths"] = """
WITH r AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id)
SELECT path, CAST(count(*) AS BIGINT) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path
LIMIT 10
"""

ORACLE_SQL["order_count_dist"] = """
    WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                GROUP BY c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count ORDER BY c_count
"""

ORACLE_SQL["dormant_customers"] = """
    WITH c AS (SELECT c_custkey, c_mktsegment,
                      CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
               FROM customer),
         t AS (SELECT sum(bal_cents) AS s, count(*) AS n
               FROM c WHERE bal_cents > 0)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(bal_cents) AS BIGINT) AS tot_cents
    FROM c, t
    WHERE bal_cents * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

ORACLE_SQL["top_supplier"] = """
    WITH rev AS (SELECT l_suppkey,
                        CAST(sum(CAST(round(l_extendedprice
                                            * (1 - l_discount) * 100)
                                      AS BIGINT)) AS BIGINT)
                            AS total_cents
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                   AND l_shipdate <  TIMESTAMP '1998-04-01'
                 GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_cents
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_cents = (SELECT max(total_cents) FROM rev)
    ORDER BY s_suppkey
"""

ORACLE_SQL["skyline_parts"] = """
    WITH p AS (SELECT p_partkey,
                      CAST(round(p_retailprice * 100) AS BIGINT)
                          AS price_cents,
                      CAST(p_size AS BIGINT) AS p_size
               FROM part),
         g AS (SELECT price_cents, max(p_size) AS ymax
               FROM p GROUP BY price_cents),
         gg AS (SELECT price_cents, ymax,
                       max(ymax) OVER (ORDER BY price_cents
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS prevmax
                FROM g)
    SELECT a.p_partkey, a.price_cents, a.p_size
    FROM p a JOIN gg ON a.price_cents = gg.price_cents
    WHERE a.p_size = gg.ymax
      AND (gg.prevmax IS NULL OR gg.ymax > gg.prevmax)
    ORDER BY a.price_cents, a.p_partkey
"""

ORACLE_SQL["dedup_representatives"] = """
    WITH h AS (SELECT md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]+', '', 'g'),
                   ' +', ' ', 'g'))) AS content_hash,
                      doc_id, CAST(n_chars AS BIGINT) AS n_chars
               FROM documents),
         r AS (SELECT content_hash, doc_id, n_chars,
                      row_number() OVER (PARTITION BY content_hash
                                         ORDER BY n_chars DESC, doc_id)
                          AS rn,
                      count(*) OVER (PARTITION BY content_hash) AS n_dups
               FROM h)
    SELECT content_hash, doc_id AS rep_id, n_chars AS rep_chars,
           CAST(n_dups AS BIGINT) AS n_dups
    FROM r WHERE rn = 1 ORDER BY content_hash
"""

ORACLE_SQL["source_dup_report"] = """
    WITH h AS (SELECT source, md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]+', '', 'g'),
                   ' +', ' ', 'g'))) AS d
               FROM documents)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT d) AS BIGINT) AS n_distinct,
           CAST((count(*) - count(DISTINCT d)) * 1000000
                // count(*) AS BIGINT) AS dup_ppm
    FROM h GROUP BY source ORDER BY source
"""

ORACLE_SQL["kg_cooccur"] = _dict_oracle.cooccur_sql()

ORACLE_SQL["basket_pairs"] = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (SELECT a.l_partkey AS a, b.l_partkey AS b,
                       CAST(count(*) AS BIGINT) AS n_orders
                FROM li a JOIN li b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2)
    SELECT a, b, n_orders FROM pr
    ORDER BY n_orders DESC, a, b LIMIT 25
"""

ORACLE_SQL["kg_kcore"] = _dict_oracle.kcore_sql(k=3, rounds=8)

ORACLE_SQL["event_transitions"] = """
    WITH o AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                          AS nxt
               FROM events),
         c AS (SELECT event_type AS prev_type, nxt AS next_type,
                      CAST(count(*) AS BIGINT) AS n
               FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.prev_type, c.next_type, c.n,
           CAST(c.n * 1000000 // t.tot AS BIGINT) AS p_ppm
    FROM c JOIN t ON c.prev_type = t.prev_type
    ORDER BY c.prev_type, c.next_type
"""

ORACLE_SQL["rfm_segments"] = """
    WITH mm AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS f,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           // 100 AS m,
                       CAST(epoch(max(o_orderdate)) AS BIGINT)
                           // 86400 AS r
                FROM orders GROUP BY o_custkey),
         nn AS (SELECT count(*) AS n FROM mm),
         q AS (SELECT ((rank() OVER (ORDER BY r) - 1) * 4) // nn.n
                          AS r_q,
                      ((rank() OVER (ORDER BY f) - 1) * 4) // nn.n
                          AS f_q,
                      ((rank() OVER (ORDER BY m) - 1) * 4) // nn.n
                          AS m_q
               FROM mm, nn)
    SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

ORACLE_SQL["source_provenance"] = """
    WITH s AS (SELECT source,
                      row_number() OVER (ORDER BY source) - 1 AS bit
               FROM (SELECT DISTINCT source FROM documents)),
         h AS (SELECT md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]+', '', 'g'),
                   ' +', ' ', 'g'))) AS content_hash, source
               FROM documents),
         j AS (SELECT DISTINCT content_hash,
                      CAST(1 AS BIGINT) << s.bit AS b
               FROM h JOIN s USING (source))
    SELECT content_hash, CAST(bit_or(b) AS BIGINT) AS src_mask,
           CAST(count(*) AS BIGINT) AS n_sources
    FROM j GROUP BY content_hash ORDER BY content_hash
"""

ORACLE_SQL["kg_degree_dist"] = (
    "SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes FROM ("
    + _dict_oracle.degree_sql()
    + ") GROUP BY degree ORDER BY degree")

ORACLE_SQL["next_token_topk"] = """
    WITH toks AS (SELECT doc_id, g.i AS pos,
                         string_split(text, ' ')[g.i] AS w,
                         len(string_split(text, ' ')) AS m
                  FROM documents,
                       generate_series(1, 4096) g(i)
                  WHERE g.i <= len(string_split(text, ' '))),
         bg AS (SELECT a.w AS prev, b.w AS "next",
                       CAST(count(*) AS BIGINT) AS n
                FROM toks a JOIN toks b
                  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                GROUP BY 1, 2),
         r AS (SELECT prev, "next", n,
                      row_number() OVER (PARTITION BY prev
                                         ORDER BY n DESC, "next")
                          AS rn
               FROM bg)
    SELECT prev, "next", n FROM r WHERE rn <= 3
    ORDER BY prev, n DESC, "next"
"""

ORACLE_SQL["time_weighted_avg"] = """
    WITH o AS (SELECT user_id, event_id, ts,
                      CAST(round(value * 100) AS BIGINT) AS c,
                      lead(ts) OVER w AS nts,
                      lead(CAST(round(value * 100) AS BIGINT)) OVER w
                          AS nc
               FROM events
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY ts, event_id)),
         s AS (SELECT user_id,
                      sum((c + nc) * (epoch_us(nts) - epoch_us(ts)))
                          AS num,
                      2 * (epoch_us(max(ts)) - epoch_us(min(ts)))
                          AS den
               FROM o GROUP BY user_id)
    SELECT user_id, CAST(num // den AS BIGINT) AS twa_cents
    FROM s WHERE den > 0 ORDER BY user_id
"""

ORACLE_SQL["knn_classify"] = """
    WITH q AS (SELECT vec_id AS query_id,
                      CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 8),
         s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                      list_cosine_similarity(
                          CAST(e.embedding AS DOUBLE[]), q.qe) AS sim
               FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         r AS (SELECT query_id, neighbor_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id)
                          AS rnk
               FROM s),
         v AS (SELECT r.query_id, CAST(e.label AS BIGINT) AS label,
                      CAST(count(*) AS BIGINT) AS n
               FROM r JOIN embeddings e ON e.vec_id = r.neighbor_id
               WHERE r.rnk <= 5 GROUP BY 1, 2),
         w AS (SELECT query_id, label, n,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY n DESC, label) AS rn
               FROM v)
    SELECT query_id, label AS pred_label, n AS votes
    FROM w WHERE rn = 1 ORDER BY query_id
"""

ORACLE_SQL["kg_assortativity"] = _dict_oracle.assortativity_sql()

ORACLE_SQL["kg_edge_jaccard"] = _dict_oracle.edge_jaccard_sql()

ORACLE_SQL["oov_rate"] = """
    WITH toks AS (SELECT source,
                         unnest(regexp_extract_all(text, '\\S+'))
                             AS token
                  FROM documents),
         c AS (SELECT token, count(*) AS n FROM toks GROUP BY 1),
         v AS (SELECT token FROM c ORDER BY n DESC, token LIMIT 20),
         s AS (SELECT source, CAST(count(*) AS BIGINT) AS total,
                      CAST(sum(CASE WHEN token IN
                                    (SELECT token FROM v)
                                    THEN 0 ELSE 1 END) AS BIGINT)
                          AS oov
               FROM toks GROUP BY source)
    SELECT source, total, oov,
           CAST(oov * 1000000 // total AS BIGINT) AS oov_ppm
    FROM s ORDER BY source
"""

ORACLE_SQL["order_share"] = """
    WITH o AS (SELECT o_orderkey, o_custkey,
                      CAST(round(o_totalprice * 100) AS BIGINT)
                          AS cents
               FROM orders),
         s AS (SELECT o_orderkey, o_custkey, cents,
                      sum(cents) OVER (PARTITION BY o_custkey) AS tot
               FROM o)
    SELECT o_orderkey, o_custkey, cents,
           CAST(CASE WHEN tot = 0 THEN 0
                     ELSE cents * 1000000 // tot END AS BIGINT)
               AS share_ppm
    FROM s ORDER BY o_orderkey
"""

ORACLE_SQL["dedup_incremental"] = """
    WITH norm AS (SELECT doc_id, source, md5(trim(regexp_replace(
                      regexp_replace(lower(text), '[^a-z0-9 ]+', '',
                                     'g'),
                      ' +', ' ', 'g'))) AS d
                  FROM documents),
         old AS (SELECT DISTINCT d FROM norm WHERE doc_id % 10 < 8),
         nw AS (SELECT source, d FROM norm WHERE doc_id % 10 >= 8)
    SELECT source, CAST(count(*) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN d IN (SELECT d FROM old)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
    FROM nw GROUP BY source ORDER BY source
"""

ORACLE_SQL["kg_lift"] = _dict_oracle.lift_sql()

ORACLE_SQL["trimmed_mean"] = """
    WITH o AS (SELECT event_type,
                      CAST(round(value * 100) AS BIGINT) AS c
               FROM events),
         r AS (SELECT event_type, c,
                      (rank() OVER (PARTITION BY event_type
                                    ORDER BY c) - 1) * 10
                      // (count(*) OVER (PARTITION BY event_type))
                          AS dec
               FROM o)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(c) // count(*) AS BIGINT) AS trimmed_mean_cents
    FROM r WHERE dec BETWEEN 1 AND 8
    GROUP BY event_type ORDER BY event_type
"""

ORACLE_SQL["gini_by_type"] = """
    WITH o AS (SELECT event_type,
                      CAST(round(value * 100) AS BIGINT) AS c
               FROM events WHERE value > 0),
         r AS (SELECT event_type, c,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY c) AS i
               FROM o),
         s AS (SELECT event_type, count(*) AS n, sum(c) AS tot,
                      sum(i * c) AS ric
               FROM r GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST((2 * ric - (n + 1) * tot) * 1000000
                // (n * tot) AS BIGINT) AS gini_ppm
    FROM s WHERE tot > 0 ORDER BY event_type
"""

ORACLE_SQL["fano_by_type"] = """
    WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                      count(*) AS k
               FROM events GROUP BY 1, 2),
         s AS (SELECT event_type, count(*) AS hours, sum(k) AS n,
                      sum(k * k) AS kk
               FROM h GROUP BY event_type)
    SELECT event_type, CAST(hours AS BIGINT) AS hours,
           CAST((hours * kk - n * n) * 1000000
                // (n * hours) AS BIGINT) AS fano_ppm
    FROM s ORDER BY event_type
"""

ORACLE_SQL["token_novelty"] = r"""
    WITH toks AS (SELECT doc_id,
                         unnest(regexp_extract_all(text, '\S+')) AS term
                  FROM documents),
         first AS (SELECT term, min(doc_id) AS doc_id
                   FROM toks GROUP BY term)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS novel_terms
    FROM first GROUP BY doc_id ORDER BY doc_id
"""

ORACLE_SQL["large_orders"] = """
    WITH t AS (SELECT l_orderkey,
                      CAST(sum(l_quantity) AS BIGINT) AS total_qty
               FROM lineitem GROUP BY 1
               HAVING sum(l_quantity) > 300)
    SELECT c.c_name, o.o_orderkey, t.total_qty,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
    FROM t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY t.total_qty DESC, o.o_orderkey LIMIT 20
"""

ORACLE_SQL["waiting_suppliers"] = """
    WITH l AS (SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
                      CASE WHEN l.l_shipdate >
                                o.o_orderdate + INTERVAL 90 DAY
                           THEN 1 ELSE 0 END AS late
               FROM lineitem l
               JOIN orders o ON o.o_orderkey = l.l_orderkey),
         s AS (SELECT ok, sk, max(late) AS late FROM l GROUP BY ok, sk),
         o2 AS (SELECT ok, count(*) AS n_supp, sum(late) AS n_late
                FROM s GROUP BY ok),
         w AS (SELECT s.sk FROM s JOIN o2 USING (ok)
               WHERE o2.n_supp >= 2 AND o2.n_late = 1 AND s.late = 1),
         c AS (SELECT sk, CAST(count(*) AS BIGINT) AS numwait
               FROM w GROUP BY sk)
    SELECT c.sk AS s_suppkey, sup.s_name, c.numwait
    FROM c JOIN supplier sup ON sup.s_suppkey = c.sk
    ORDER BY c.numwait DESC, c.sk LIMIT 10
"""

ORACLE_SQL["pareto_share"] = """
    WITH r AS (SELECT o_custkey AS ck,
                      sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS cents
               FROM orders GROUP BY 1),
         j AS (SELECT c.c_nationkey AS nk, r.ck, r.cents
               FROM r JOIN customer c ON c.c_custkey = r.ck),
         w AS (SELECT nk, cents,
                      sum(cents) OVER (PARTITION BY nk
                                       ORDER BY cents DESC, ck
                                       ROWS UNBOUNDED PRECEDING) AS cum,
                      sum(cents) OVER (PARTITION BY nk) AS tot
               FROM j),
         k AS (SELECT nk,
                      CAST(1 + count(*) FILTER (2 * cum < tot)
                           AS BIGINT) AS n_top,
                      CAST(min(cum) FILTER (2 * cum >= tot) * 1000000
                           // max(tot) AS BIGINT) AS share_ppm,
                      CAST(count(*) AS BIGINT) AS n_customers
               FROM w GROUP BY nk)
    SELECT n.n_name, k.n_top, k.share_ppm, k.n_customers
    FROM k JOIN nation n ON n.n_nationkey = k.nk
    ORDER BY n.n_name
"""

ORACLE_SQL["cross_source_dups"] = """
    WITH d AS (SELECT DISTINCT
                      md5(trim(regexp_replace(regexp_replace(
                          lower(text), '[^a-z0-9 ]+', '', 'g'),
                          ' +', ' ', 'g'))) AS h,
                      source
               FROM documents)
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(count(*) AS BIGINT) AS n
    FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["vocab_growth"] = r"""
    WITH toks AS (SELECT doc_id,
                         unnest(regexp_extract_all(text, '\S+')) AS term
                  FROM documents),
         first AS (SELECT term, min(doc_id) AS d
                   FROM toks GROUP BY term),
         mx AS (SELECT max(doc_id) AS m FROM documents),
         b AS (SELECT d * 10 // (m + 1) AS decile FROM first, mx)
    SELECT decile, CAST(count(*) AS BIGINT) AS new_terms,
           CAST(sum(count(*)) OVER (ORDER BY decile) AS BIGINT)
               AS cum_terms
    FROM b GROUP BY decile ORDER BY decile
"""

ORACLE_SQL["order_gap_dist"] = """
    WITH g AS (SELECT date_diff('day',
                          lag(o_orderdate) OVER (
                              PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey),
                          o_orderdate) AS gap_days
               FROM orders)
    SELECT gap_days, CAST(count(*) AS BIGINT) AS n
    FROM g WHERE gap_days IS NOT NULL
    GROUP BY gap_days ORDER BY gap_days
"""

ORACLE_SQL["promo_share"] = """
    WITH li AS (SELECT year(l_shipdate) * 100 + month(l_shipdate)
                           AS ym,
                       CAST(round(l_extendedprice * (1 - l_discount)
                                  * 100) AS BIGINT) AS cents,
                       l_partkey
                FROM lineitem),
         m AS (SELECT ym,
                      CAST(sum(CASE WHEN p_type = 'PROMO'
                               THEN cents ELSE 0 END) AS BIGINT)
                          AS promo_cents,
                      CAST(sum(cents) AS BIGINT) AS total_cents
               FROM li JOIN part ON l_partkey = p_partkey
               GROUP BY ym)
    SELECT ym, promo_cents, total_cents,
           promo_cents * 1000000 // total_cents AS promo_ppm
    FROM m ORDER BY ym
"""

ORACLE_SQL["small_qty_revenue"] = """
    WITH li AS (SELECT l_partkey,
                       CAST(round(l_quantity) AS BIGINT) AS qty,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                           AS cents
                FROM lineitem),
         w AS (SELECT l_partkey, qty, cents,
                      sum(qty) OVER (PARTITION BY l_partkey) AS sq,
                      count(*) OVER (PARTITION BY l_partkey) AS cnt
               FROM li)
    SELECT p_brand, CAST(sum(cents) AS BIGINT) AS rev_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM w JOIN part ON l_partkey = p_partkey
    WHERE qty * 5 * cnt < sq
    GROUP BY p_brand ORDER BY p_brand
"""

ORACLE_SQL["dominant_supplier"] = """
    WITH ps AS (SELECT l_partkey, l_suppkey,
                       CAST(sum(CAST(round(l_quantity) AS BIGINT))
                            AS BIGINT) AS q
                FROM lineitem GROUP BY 1, 2),
         t AS (SELECT l_partkey, l_suppkey, q,
                      CAST(sum(q) OVER (PARTITION BY l_partkey)
                           AS BIGINT) AS tot,
                      count(*) OVER (PARTITION BY l_partkey) AS ns,
                      row_number() OVER (PARTITION BY l_partkey
                                         ORDER BY q DESC, l_suppkey)
                          AS rn
               FROM ps)
    SELECT l_partkey, l_suppkey, q * 1000000 // tot AS share_ppm
    FROM t WHERE rn = 1 AND ns >= 2
    ORDER BY share_ppm DESC, l_partkey LIMIT 100
"""

ORACLE_SQL["volume_shipping"] = """
    WITH li AS (SELECT l_orderkey, l_suppkey,
                       year(l_shipdate) AS l_year,
                       CAST(round(l_extendedprice * (1 - l_discount)
                                  * 100) AS BIGINT) AS cents
                FROM lineitem)
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(l_year AS BIGINT) AS l_year,
           CAST(sum(cents) AS BIGINT) AS rev_cents
    FROM li
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

ORACLE_SQL["market_share"] = """
    WITH li AS (SELECT l_orderkey, l_partkey, l_suppkey,
                       CAST(round(l_extendedprice * (1 - l_discount)
                                  * 100) AS BIGINT) AS cents
                FROM lineitem),
         t AS (SELECT year(o_orderdate) AS o_year,
                      CAST(sum(CASE WHEN s_nationkey =
                               (SELECT n_nationkey FROM nation
                                WHERE n_name = 'NATION_3')
                               THEN cents ELSE 0 END) AS BIGINT)
                          AS nation_cents,
                      CAST(sum(cents) AS BIGINT) AS total_cents
               FROM li
               JOIN part     ON l_partkey = p_partkey
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN orders   ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation   ON c_nationkey = n_nationkey
               JOIN region   ON n_regionkey = r_regionkey
               WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
               GROUP BY 1)
    SELECT CAST(o_year AS BIGINT) AS o_year, nation_cents, total_cents,
           nation_cents * 1000000 // total_cents AS share_ppm
    FROM t ORDER BY o_year
"""

ORACLE_SQL["mad_outliers"] = """
    WITH e AS (SELECT event_type,
                      CAST(round(value * 100) AS BIGINT) AS c
               FROM events),
         s AS (SELECT event_type, c,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY c) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM e),
         med AS (SELECT event_type,
                        CAST(sum(c * (CAST(rn = (n + 1) // 2 AS BIGINT)
                                 + CAST(rn = n // 2 + 1 AS BIGINT)))
                             AS BIGINT) AS med2,
                        CAST(max(n) AS BIGINT) AS n_events
                 FROM s GROUP BY event_type),
         d AS (SELECT e.event_type, abs(2 * e.c - m.med2) AS dv
               FROM e JOIN med m ON e.event_type = m.event_type),
         dr AS (SELECT event_type, dv,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY dv) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM d),
         mad AS (SELECT event_type,
                        CAST(sum(dv * (CAST(rn = (n + 1) // 2 AS BIGINT)
                                  + CAST(rn = n // 2 + 1 AS BIGINT)))
                             AS BIGINT) AS mad4
                 FROM dr GROUP BY event_type)
    SELECT d.event_type,
           CAST(max(m.n_events) AS BIGINT) AS n_events,
           CAST(max(m.med2) AS BIGINT) AS med2_cents,
           CAST(max(x.mad4) AS BIGINT) AS mad4_cents,
           CAST(sum(CASE WHEN 2 * d.dv > 3 * x.mad4
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d
    JOIN med m ON d.event_type = m.event_type
    JOIN mad x ON d.event_type = x.event_type
    GROUP BY d.event_type ORDER BY d.event_type
"""

ORACLE_SQL["late_priority"] = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["fertility_by_lang"] = r"""
    WITH d AS (SELECT lang,
                      CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
                           + len(regexp_extract_all(text, '[0-9]+'))
                           + len(regexp_extract_all(text,
                                                    '[^A-Za-z0-9\s]+'))
                           AS BIGINT) AS bpe,
                      CAST(len(regexp_extract_all(text, '\S+'))
                           AS BIGINT) AS ws
               FROM documents)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
           CAST(sum(bpe) AS BIGINT) * 1000000
               // greatest(CAST(sum(ws) AS BIGINT), 1) AS fertility_ppm
    FROM d GROUP BY lang ORDER BY lang
"""

ORACLE_SQL["session_length_dist"] = """
    WITH o AS (SELECT user_id, ts,
                      CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS brk
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (SELECT user_id,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
               FROM o),
         l AS (SELECT CAST(count(*) AS BIGINT) AS session_len
               FROM s GROUP BY user_id, sid)
    SELECT session_len, CAST(count(*) AS BIGINT) AS n_sessions
    FROM l GROUP BY session_len ORDER BY session_len
"""

ORACLE_SQL["nation_profit"] = """
    WITH li AS (SELECT l_orderkey, l_suppkey,
                       CAST(round(l_extendedprice * (1 - l_discount)
                                  * 100) AS BIGINT)
                       - CAST(round(l_quantity) AS BIGINT)
                         * CAST(round(p_retailprice * 100) AS BIGINT)
                         // 10 AS profit
                FROM lineitem JOIN part ON l_partkey = p_partkey)
    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(profit) AS BIGINT) AS profit_cents
    FROM li
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["first_touch"] = """
    WITH c AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'purchase'),
         t AS (SELECT c.event_id AS cid, e.event_type,
                      row_number() OVER (PARTITION BY c.event_id
                                         ORDER BY e.ts, e.event_id)
                          AS rn
               FROM c JOIN events e ON e.user_id = c.user_id
                AND e.ts >= c.ts - INTERVAL 7 DAY
                AND (e.ts < c.ts OR (e.ts = c.ts
                                     AND e.event_id < c.event_id))),
         ft AS (SELECT cid, event_type FROM t WHERE rn = 1),
         a AS (SELECT coalesce(ft.event_type, '(direct)') AS first_touch
               FROM c LEFT JOIN ft ON ft.cid = c.event_id)
    SELECT first_touch, CAST(count(*) AS BIGINT) AS n_conversions
    FROM a GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["winnow_pairs"] = """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
         toks AS (SELECT doc_id, unnest(w) AS tok,
                         unnest(generate_series(1, len(w))) AS pos
                  FROM d),
         ng0 AS (SELECT doc_id, pos,
                        string_agg(tok, ' ') OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                                     AND 3 FOLLOWING) AS ng,
                        count(*) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                                     AND 3 FOLLOWING) AS wlen
                 FROM toks),
         g AS (SELECT doc_id, pos,
                      CAST(concat('0x', substr(md5(ng), 1, 16))
                           AS UBIGINT) AS h
               FROM ng0 WHERE wlen = 4),
         mx AS (SELECT doc_id, max(pos) AS np FROM g GROUP BY 1),
         win AS (SELECT g.doc_id, s.pos AS ws, g.pos, g.h
                 FROM g JOIN g s ON s.doc_id = g.doc_id
                  AND g.pos BETWEEN s.pos AND s.pos + 3
                 JOIN mx ON mx.doc_id = g.doc_id
                  AND s.pos + 3 <= mx.np),
         wmin AS (SELECT doc_id, ws, min(h) AS mh
                  FROM win GROUP BY 1, 2),
         sel AS (SELECT w.doc_id, max(w.pos) AS spos
                 FROM win w JOIN wmin m ON m.doc_id = w.doc_id
                  AND m.ws = w.ws AND w.h = m.mh
                 GROUP BY w.doc_id, w.ws),
         fp AS (SELECT DISTINCT s.doc_id, g.h
                FROM sel s JOIN g ON g.doc_id = s.doc_id
                 AND g.pos = s.spos),
         ok AS (SELECT h FROM fp GROUP BY h
                HAVING count(*) BETWEEN 2 AND 64),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(count(*) AS BIGINT) AS n_shared
                FROM fp a
                JOIN fp b ON b.h = a.h AND a.doc_id < b.doc_id
                JOIN ok ON ok.h = a.h
                GROUP BY 1, 2)
    SELECT doc_a, doc_b, n_shared FROM pr WHERE n_shared >= 2
    ORDER BY doc_a, doc_b
"""

ORACLE_SQL["ship_latency_dist"] = """
    SELECT date_diff('day', o_orderdate, l_shipdate) AS gap_days,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["stitch_pairs"] = """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
         e AS (SELECT doc_id, w, len(w) AS n FROM d
               WHERE len(w) >= 4),
         t AS (SELECT doc_id AS doc_a,
                      CAST(concat('0x', substr(md5(
                          array_to_string(w[n - 3 : n], ' ')), 1, 16))
                           AS UBIGINT) AS h
               FROM e),
         hh AS (SELECT doc_id AS doc_b,
                       CAST(concat('0x', substr(md5(
                           array_to_string(w[1 : 4], ' ')), 1, 16))
                            AS UBIGINT) AS h
                FROM e)
    SELECT DISTINCT t.doc_a, hh.doc_b
    FROM t JOIN hh ON hh.h = t.h AND t.doc_a <> hh.doc_b
    ORDER BY doc_a, doc_b
"""

ORACLE_SQL["bm25_topk"] = r"""
    WITH tfq AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                 FROM (SELECT doc_id,
                              unnest(regexp_extract_all(text, '\S+'))
                                  AS term
                       FROM documents)
                 WHERE term IN ('{t0}', '{t1}', '{t2}')
                 GROUP BY 1, 2),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
            FROM tfq GROUP BY 1),
    st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(sum(n_chars) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE) AS avgdl
           FROM documents),
    comp AS (SELECT t.doc_id, t.term,
                    ln((st.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                    * (CAST(t.tf AS DOUBLE) * 2.2)
                    / (CAST(t.tf AS DOUBLE)
                       + 1.2 * (0.25
                                + 0.75 * CAST(d.n_chars AS DOUBLE)
                                       / st.avgdl)) AS c
             FROM tfq t
             JOIN dfq USING (term)
             JOIN documents d USING (doc_id)
             CROSS JOIN st),
    sc AS (SELECT doc_id,
                  coalesce(max(CASE WHEN term = '{s0}' THEN c END), 0.0)
                + coalesce(max(CASE WHEN term = '{s1}' THEN c END), 0.0)
                + coalesce(max(CASE WHEN term = '{s2}' THEN c END), 0.0)
                      AS s,
                  CAST(count(*) AS BIGINT) AS n_terms
           FROM comp GROUP BY doc_id)
    SELECT doc_id, round(s, 4) AS score, n_terms
    FROM sc
    ORDER BY round(s, 4) DESC, doc_id
    LIMIT 20
"""
_BM25_SLOTS = sorted(set(SEARCH_TERMS))
ORACLE_SQL["bm25_topk"] = ORACLE_SQL["bm25_topk"].format(
    t0=SEARCH_TERMS[0], t1=SEARCH_TERMS[1], t2=SEARCH_TERMS[2],
    s0=_BM25_SLOTS[0], s1=_BM25_SLOTS[1], s2=_BM25_SLOTS[2])

ORACLE_SQL["important_parts"] = """
    WITH pv AS (SELECT l_partkey,
                       CAST(sum(CAST(round(l_extendedprice * 100)
                                     AS BIGINT)) AS BIGINT) AS v
                FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(v) AS HUGEINT) AS tot,
                 CAST(count(*) AS HUGEINT) AS np FROM pv)
    SELECT l_partkey AS p_partkey, v AS value_cents
    FROM pv, t WHERE CAST(v AS HUGEINT) * 2 * np > 3 * tot
"""

ORACLE_SQL["type_hour_chi2"] = """
    WITH cells AS (SELECT event_type,
                          CAST(hour(ts) AS BIGINT) AS hour,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
    rm AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS r
           FROM cells GROUP BY 1),
    cm AS (SELECT hour, CAST(sum(n) AS BIGINT) AS c
           FROM cells GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS nt FROM cells)
    SELECT cells.event_type, cells.hour, cells.n AS observed,
           rm.r AS row_total, cm.c AS col_total,
           round((CAST(cells.n AS DOUBLE)
                  - CAST(rm.r AS DOUBLE) * CAST(cm.c AS DOUBLE) / t.nt)
                 * (CAST(cells.n AS DOUBLE)
                    - CAST(rm.r AS DOUBLE) * CAST(cm.c AS DOUBLE)
                      / t.nt)
                 / (CAST(rm.r AS DOUBLE) * CAST(cm.c AS DOUBLE) / t.nt),
                 6) AS chi2_cell
    FROM cells JOIN rm USING (event_type) JOIN cm USING (hour)
    CROSS JOIN t
"""

ORACLE_SQL["numeric_corr"] = """
    WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                      CAST(round(l_extendedprice * 100) AS BIGINT) AS e,
                      CAST(round(l_discount * 100) AS BIGINT) AS d,
                      CAST(round(l_tax * 100) AS BIGINT) AS t
               FROM lineitem),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(CAST(q AS HUGEINT)) AS sq,
                 sum(CAST(e AS HUGEINT)) AS se,
                 sum(CAST(d AS HUGEINT)) AS sd,
                 sum(CAST(t AS HUGEINT)) AS st,
                 sum(CAST(q AS HUGEINT) * q) AS sqq,
                 sum(CAST(e AS HUGEINT) * e) AS see,
                 sum(CAST(d AS HUGEINT) * d) AS sdd,
                 sum(CAST(t AS HUGEINT) * t) AS stt,
                 sum(CAST(q AS HUGEINT) * e) AS sqe,
                 sum(CAST(q AS HUGEINT) * d) AS sqd,
                 sum(CAST(q AS HUGEINT) * t) AS sqt,
                 sum(CAST(e AS HUGEINT) * d) AS sed,
                 sum(CAST(e AS HUGEINT) * t) AS set_,
                 sum(CAST(d AS HUGEINT) * t) AS sdt
          FROM b)
    SELECT 'quantity' AS col_a, 'extendedprice' AS col_b,
           CAST(n AS BIGINT) AS n,
           round(CAST(n * sqe - sq * se AS DOUBLE)
                 / sqrt(CAST(n * sqq - sq * sq AS DOUBLE)
                        * CAST(n * see - se * se AS DOUBLE)), 6) AS corr
    FROM m
    UNION ALL
    SELECT 'quantity', 'discount', CAST(n AS BIGINT),
           round(CAST(n * sqd - sq * sd AS DOUBLE)
                 / sqrt(CAST(n * sqq - sq * sq AS DOUBLE)
                        * CAST(n * sdd - sd * sd AS DOUBLE)), 6)
    FROM m
    UNION ALL
    SELECT 'quantity', 'tax', CAST(n AS BIGINT),
           round(CAST(n * sqt - sq * st AS DOUBLE)
                 / sqrt(CAST(n * sqq - sq * sq AS DOUBLE)
                        * CAST(n * stt - st * st AS DOUBLE)), 6)
    FROM m
    UNION ALL
    SELECT 'extendedprice', 'discount', CAST(n AS BIGINT),
           round(CAST(n * sed - se * sd AS DOUBLE)
                 / sqrt(CAST(n * see - se * se AS DOUBLE)
                        * CAST(n * sdd - sd * sd AS DOUBLE)), 6)
    FROM m
    UNION ALL
    SELECT 'extendedprice', 'tax', CAST(n AS BIGINT),
           round(CAST(n * set_ - se * st AS DOUBLE)
                 / sqrt(CAST(n * see - se * se AS DOUBLE)
                        * CAST(n * stt - st * st AS DOUBLE)), 6)
    FROM m
    UNION ALL
    SELECT 'discount', 'tax', CAST(n AS BIGINT),
           round(CAST(n * sdt - sd * st AS DOUBLE)
                 / sqrt(CAST(n * sdd - sd * sd AS DOUBLE)
                        * CAST(n * stt - st * st AS DOUBLE)), 6)
    FROM m
"""

ORACLE_SQL["weighted_median"] = """
    WITH w AS (SELECT l_returnflag AS f,
                      CAST(round(l_quantity) AS BIGINT) AS q,
                      CAST(sum(CAST(round(l_extendedprice * 100)
                                    AS BIGINT)) AS BIGINT) AS w
               FROM lineitem GROUP BY 1, 2),
    c AS (SELECT f, q, w,
                 CAST(sum(w) OVER (PARTITION BY f ORDER BY q)
                      AS BIGINT) AS cw,
                 CAST(sum(w) OVER (PARTITION BY f) AS BIGINT) AS tw
          FROM w)
    SELECT f AS l_returnflag, CAST(min(q) AS BIGINT) AS median_qty,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cw >= tw GROUP BY f
"""

ORACLE_SQL["snm_pairs"] = """
WITH k AS (SELECT doc_id,
                  substring(coalesce(text, ''), 1, 24) AS key
           FROM documents),
r AS (SELECT doc_id, key,
             row_number() OVER (ORDER BY key, doc_id) - 1 AS rn
      FROM k)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rn - a.rn AS BIGINT) AS dist,
       CAST(CASE WHEN a.key = b.key THEN 1 ELSE 0 END AS BIGINT)
           AS key_match
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4
"""

ORACLE_SQL["source_char_kl"] = """
WITH ch AS (SELECT source,
                   substring(coalesce(text, ''), g.i, 1) AS c
            FROM documents CROSS JOIN generate_series(1, 8192) g(i)
            WHERE g.i <= length(coalesce(text, ''))),
cnt AS (SELECT source, c, CAST(count(*) AS BIGINT) AS n
        FROM ch GROUP BY 1, 2),
gt AS (SELECT c, CAST(sum(n) AS BIGINT) AS gn FROM cnt GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cnt),
per AS (SELECT source, CAST(sum(cnt.n) AS BIGINT) AS n_chars,
               CAST(count(*) AS BIGINT) AS distinct_chars,
               CAST(sum(cnt.n *
                        (CAST(round(ln(gt.gn) * 1000000) AS BIGINT)
                         - CAST(round(ln(cnt.n) * 1000000) AS BIGINT)))
                    AS BIGINT) AS x
        FROM cnt JOIN gt USING (c) GROUP BY source)
SELECT per.source, per.n_chars, per.distinct_chars,
       CAST(CAST(round(ln(tot.nn) * 1000000) AS BIGINT)
            - CAST(round(ln(per.n_chars) * 1000000) AS BIGINT)
            - per.x // per.n_chars AS BIGINT) AS kl_micro
FROM per CROSS JOIN tot
"""

ORACLE_SQL["conversion_lag"] = """
WITH f AS (SELECT user_id, event_type, min(ts) AS ft
           FROM events GROUP BY 1, 2)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(epoch_us(b.ft) - epoch_us(a.ft)) AS BIGINT)
           AS total_lag_us,
       CAST(max(epoch_us(b.ft) - epoch_us(a.ft)) AS BIGINT)
           AS max_lag_us
FROM f a JOIN f b ON a.user_id = b.user_id AND a.ft < b.ft
GROUP BY 1, 2
"""

ORACLE_SQL["max_drawdown"] = """
WITH hourly AS (SELECT event_type,
                       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY 1, 2),
rm AS (SELECT event_type, h, c,
              max(c) OVER (PARTITION BY event_type ORDER BY h)
                  AS peak
       FROM hourly),
dd AS (SELECT event_type, h, CAST(peak - c AS BIGINT) AS dd FROM rm),
mx AS (SELECT event_type, max(dd) AS max_drawdown,
              CAST(count(*) AS BIGINT) AS n_hours
       FROM dd GROUP BY 1)
SELECT mx.event_type, CAST(mx.max_drawdown AS BIGINT) AS max_drawdown,
       CAST(min(dd.h) AS BIGINT) AS dd_hour, mx.n_hours
FROM mx JOIN dd ON dd.event_type = mx.event_type
                AND dd.dd = mx.max_drawdown
GROUP BY 1, 2, 4
"""

ORACLE_SQL["customer_gini"] = """
WITH r AS (SELECT o_custkey AS ck,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS cents
           FROM orders GROUP BY 1),
j AS (SELECT c.c_nationkey AS nk, r.ck, r.cents
      FROM r JOIN customer c ON c.c_custkey = r.ck),
w AS (SELECT nk, cents,
             row_number() OVER (PARTITION BY nk
                                ORDER BY cents, ck) AS i
      FROM j),
g AS (SELECT nk, sum(cents * i) AS s1, sum(cents) AS s0,
             CAST(count(*) AS BIGINT) AS n
      FROM w GROUP BY nk)
SELECT nt.n_name,
       CAST((2 * g.s1 - (g.n + 1) * g.s0) * 1000000
            // (g.n * g.s0) AS BIGINT) AS gini_ppm,
       g.n AS n_customers, CAST(g.s0 AS BIGINT) AS total_cents
FROM g JOIN nation nt ON nt.n_nationkey = g.nk
"""

ORACLE_SQL["lang_source_pmi"] = """
WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
r AS (SELECT lang, CAST(sum(c) AS BIGINT) AS rn FROM c GROUP BY 1),
s AS (SELECT source, CAST(sum(c) AS BIGINT) AS cn FROM c GROUP BY 1),
t AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM c)
SELECT c.lang, c.source, c.c AS n,
       CAST(CAST(round(ln(c.c) * 1000000) AS BIGINT)
            + CAST(round(ln(t.nn) * 1000000) AS BIGINT)
            - CAST(round(ln(r.rn) * 1000000) AS BIGINT)
            - CAST(round(ln(s.cn) * 1000000) AS BIGINT)
            AS BIGINT) AS pmi_micro
FROM c JOIN r USING (lang) JOIN s USING (source) CROSS JOIN t
"""

ORACLE_SQL["min_cost_supplier"] = """
WITH p AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                  min(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS c
           FROM lineitem GROUP BY 1, 2),
w AS (SELECT pk, sk, c,
             row_number() OVER (PARTITION BY pk
                                ORDER BY c, sk) AS rn,
             CAST(count(*) OVER (PARTITION BY pk) AS BIGINT)
                 AS n_suppliers
      FROM p)
SELECT w.pk AS p_partkey, w.sk AS s_suppkey, s.s_name,
       w.c AS min_cents, w.n_suppliers
FROM w JOIN supplier s ON s.s_suppkey = w.sk
WHERE w.rn = 1
"""

ORACLE_SQL["kcenter_select"] = _kcenter_sql(8)

ORACLE_SQL["kg_bowtie"] = _dict_oracle.bowtie_sql(max_hops=6)

ORACLE_SQL["kg_robustness"] = _dict_oracle.hub_knockout_sql(k=5)

ORACLE_SQL["kg_densification"] = _dict_oracle.densification_sql()

ORACLE_SQL["kg_triads"] = _dict_oracle.triad_census_sql()

ORACLE_SQL["removal_effect"] = _removal_effect_sql("purchase", 6)

ORACLE_SQL["position_attribution"] = r"""
WITH seq AS (SELECT user_id, event_type, ts, event_id,
                    coalesce(sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS prior_conv
             FROM events),
pre AS (SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM seq
        WHERE prior_conv = 0 AND event_type <> 'purchase'
          AND user_id IN (SELECT DISTINCT user_id FROM events
                          WHERE event_type = 'purchase')),
cn AS (SELECT user_id, max(rn) AS cnt FROM pre GROUP BY 1),
cr AS (SELECT p.event_type AS channel,
              CASE WHEN c.cnt = 1 THEN 1000000
                   WHEN c.cnt = 2 THEN 500000
                   WHEN p.rn = 1 OR p.rn = c.cnt THEN 400000
                   ELSE 200000 // (c.cnt - 2) END AS credit
       FROM pre p JOIN cn c USING (user_id))
SELECT channel, CAST(sum(credit) AS BIGINT) AS credit_micro,
       CAST(count(*) AS BIGINT) AS n_touches
FROM cr GROUP BY 1
"""

ORACLE_SQL["benford_digits"] = r"""
WITH o AS (SELECT CAST(substr(CAST(CAST(abs(round(o_totalprice * 100))
                                   AS BIGINT) AS VARCHAR), 1, 1)
                       AS BIGINT) AS d
           FROM orders),
h AS (SELECT greatest(d, 1) AS digit,
             CAST(count(*) AS BIGINT) AS observed
      FROM o GROUP BY 1),
dig AS (SELECT unnest(generate_series(1, 9)) AS digit),
tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM h),
j AS (SELECT CAST(dig.digit AS BIGINT) AS digit,
             CAST(coalesce(h.observed, 0) AS BIGINT) AS observed,
             CAST(tot.n * (CAST(round(ln(dig.digit + 1) * 1000000)
                                AS BIGINT)
                           - CAST(round(ln(dig.digit) * 1000000)
                                  AS BIGINT))
                  // CAST(round(ln(10) * 1000000) AS BIGINT)
                  AS BIGINT) AS expected
     FROM dig LEFT JOIN h ON h.digit = dig.digit, tot)
SELECT digit, observed, expected,
       CAST(abs(observed - expected) AS BIGINT) AS abs_dev
FROM j
"""

ORACLE_SQL["source_length_w1"] = r"""
WITH h AS (SELECT source,
                  CAST(len(regexp_extract_all(coalesce(text, ''),
                                              '\S+')) AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
dom AS (SELECT DISTINCT v FROM h),
grid AS (SELECT s.source, d.v
         FROM (SELECT DISTINCT source FROM h) s, dom d),
F AS (SELECT g.source, g.v,
             sum(coalesce(h.c, 0)) OVER (PARTITION BY g.source
                                         ORDER BY g.v) AS f,
             lead(g.v) OVER (PARTITION BY g.source ORDER BY g.v)
                 - g.v AS gap
      FROM grid g LEFT JOIN h ON h.source = g.source AND h.v = g.v)
SELECT a.source AS source_a, b.source AS source_b,
       na.n AS n_a, nb.n AS n_b,
       CAST(coalesce(sum(CASE WHEN a.gap IS NULL THEN 0
                              ELSE abs(a.f * nb.n - b.f * na.n)
                                   * a.gap END), 0)
            * 1000000 // (na.n * nb.n) AS BIGINT) AS w1_micro
FROM F a JOIN F b ON a.v = b.v AND a.source < b.source
JOIN n na ON na.source = a.source
JOIN n nb ON nb.source = b.source
GROUP BY 1, 2, 3, 4
"""

ORACLE_SQL["dsir_weights"] = r"""
WITH toks AS (SELECT doc_id, lang,
                     unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) AS term
              FROM documents),
b AS (SELECT doc_id, lang,
             CAST(CAST(concat('0x', substr(md5(term), 1, 16))
                       AS UBIGINT) % 8192 AS BIGINT) AS bucket
      FROM toks),
cells AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_all,
                 CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                      AS BIGINT) AS c_tgt
          FROM b GROUP BY 1),
tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_all,
               CAST(sum(c_tgt) AS BIGINT) AS n_tgt FROM cells),
lam AS (SELECT bucket,
               (CAST(round(ln(c_tgt + 1) * 1000000) AS BIGINT)
                - CAST(round(ln(n_tgt + 8192) * 1000000) AS BIGINT))
             - (CAST(round(ln(c_all + 1) * 1000000) AS BIGINT)
                - CAST(round(ln(n_all + 8192) * 1000000) AS BIGINT))
                   AS lam
        FROM cells, tot),
per_doc AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(l.lam) AS BIGINT) AS w
            FROM b JOIN lam l USING (bucket) GROUP BY 1)
SELECT d.doc_id,
       coalesce(p.n_tokens, 0) AS n_tokens,
       coalesce(p.w, 0) AS weight_micro
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""

ORACLE_SQL["dsir_topk"] = ORACLE_SQL["dsir_weights"].rstrip() + "\nORDER BY weight_micro DESC, d.doc_id LIMIT 100\n"

ORACLE_SQL["source_token_entropy"] = r"""
WITH toks AS (SELECT source,
                     unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) AS term
              FROM documents),
c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2),
u AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS d,
             CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT))
                  AS BIGINT) AS sum_clc
      FROM c GROUP BY 1)
SELECT source, n AS n_tokens, d AS distinct_tokens,
       CAST((n * CAST(round(ln(n) * 1000000) AS BIGINT) - sum_clc)
            // n AS BIGINT) AS entropy_micro
FROM u
"""

ORACLE_SQL["kaplan_meier"] = """
WITH RECURSIVE h AS (SELECT max(o_orderdate) AS hz FROM orders),
lagd AS (SELECT o_custkey,
                date_diff('day',
                          lag(o_orderdate) OVER (
                              PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey),
                          o_orderdate) AS gap,
                row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC)
                    AS rn_last,
                o_orderdate
         FROM orders),
durs AS (SELECT CAST(gap AS BIGINT) AS dur, FALSE AS cens
         FROM lagd WHERE gap IS NOT NULL
         UNION ALL
         SELECT CAST(date_diff('day', o_orderdate, h.hz) AS BIGINT),
                TRUE
         FROM lagd, h WHERE rn_last = 1),
agg AS (SELECT dur, CAST(count(*) AS BIGINT) AS all_n,
               CAST(count(*) FILTER (WHERE NOT cens) AS BIGINT) AS d
        FROM durs GROUP BY 1),
tot AS (SELECT CAST(sum(all_n) AS BIGINT) AS n FROM agg),
ev AS (SELECT dur, d,
              CAST((SELECT n FROM tot)
                   - coalesce(sum(all_n) OVER (
                         ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS r
       FROM agg),
evf AS (SELECT dur, d, r,
               row_number() OVER (ORDER BY dur) AS rn
        FROM ev WHERE d > 0),
km AS (SELECT rn, dur, r, d,
              CAST(1000000 * (r - d) // r AS BIGINT) AS s
       FROM evf WHERE rn = 1
       UNION ALL
       SELECT e.rn, e.dur, e.r, e.d,
              CAST(km.s * (e.r - e.d) // e.r AS BIGINT)
       FROM km JOIN evf e ON e.rn = km.rn + 1)
SELECT dur AS gap_days, r AS n_risk, d AS n_events,
       s AS survival_micro
FROM km
"""

ORACLE_SQL["mannwhitney_u"] = """
WITH c AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
s AS (SELECT source, CAST(sum(n) AS BIGINT) AS n FROM c GROUP BY 1),
p AS (SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb
      FROM s a JOIN s b ON a.source < b.source),
dom AS (SELECT DISTINCT v FROM c),
grid AS (SELECT p.sa, p.sb, p.na, p.nb, d.v,
                coalesce(ca.n, 0) AS cav, coalesce(cb.n, 0) AS cbv
         FROM p CROSS JOIN dom d
         LEFT JOIN c ca ON ca.source = p.sa AND ca.v = d.v
         LEFT JOIN c cb ON cb.source = p.sb AND cb.v = d.v),
w AS (SELECT sa, sb, na, nb, cav, cbv,
             coalesce(sum(cbv) OVER (
                 PARTITION BY sa, sb ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cumb
      FROM grid)
SELECT sa AS source_a, sb AS source_b, na AS n_a, nb AS n_b,
       CAST(sum(2 * cav * cumb + cav * cbv) AS BIGINT) AS u2,
       CAST(sum(2 * cav * cumb + cav * cbv) * 1000000
            // (2 * na * nb) AS BIGINT) AS cles_micro
FROM w GROUP BY 1, 2, 3, 4
"""

ORACLE_SQL["temperature_mix"] = """
WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
           FROM documents GROUP BY 1),
w AS (SELECT source, chars,
             CAST(round(pow(chars, 0.7)) AS BIGINT) AS w_pow
      FROM s),
t AS (SELECT CAST(sum(w_pow) AS BIGINT) AS tot FROM w)
SELECT source, chars, w_pow,
       CAST(w_pow * 1000000 // (SELECT tot FROM t) AS BIGINT)
           AS weight_micro
FROM w
"""

ORACLE_SQL["forecast_backtest"] = """
WITH r AS (SELECT c_nationkey AS nk,
                  CAST(year(o_orderdate) * 100 + month(o_orderdate)
                       AS BIGINT) AS ym,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
b AS (SELECT cur.nk,
             CAST(abs(cur.cents - s.cents) AS BIGINT) AS err_s,
             CAST(abs(cur.cents - p.cents) AS BIGINT) AS err_1
      FROM r cur
      JOIN r s ON s.nk = cur.nk AND s.ym = cur.ym - 100
      JOIN r p ON p.nk = cur.nk
              AND p.ym = CASE WHEN cur.ym % 100 = 1
                              THEN cur.ym - 89 ELSE cur.ym - 1 END)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_months,
       CAST(sum(err_s) AS BIGINT) AS sum_err_seasonal,
       CAST(sum(err_1) AS BIGINT) AS sum_err_naive,
       CAST(CASE WHEN sum(err_1) = 0 THEN 0
                 ELSE sum(err_s) * 1000000 // sum(err_1) END
            AS BIGINT) AS mase_micro
FROM b JOIN nation ON n_nationkey = nk
GROUP BY 1
"""

ORACLE_SQL["trigram_backoff"] = """
WITH tr AS (SELECT doc_id, lang, coalesce(text, '') AS t
            FROM documents),
c3 AS (SELECT substr(t, CAST(i AS INT), 3) AS g,
              CAST(count(*) AS BIGINT) AS c
       FROM (SELECT t, unnest(range(1, length(t) - 1)) AS i
             FROM tr WHERE doc_id % 2 = 0)
       GROUP BY 1),
c2 AS (SELECT substr(t, CAST(i AS INT), 2) AS g,
              CAST(count(*) AS BIGINT) AS c
       FROM (SELECT t, unnest(range(1, length(t))) AS i
             FROM tr WHERE doc_id % 2 = 0)
       GROUP BY 1),
c1 AS (SELECT substr(t, CAST(i AS INT), 1) AS g,
              CAST(count(*) AS BIGINT) AS c
       FROM (SELECT t, unnest(range(1, length(t) + 1)) AS i
             FROM tr WHERE doc_id % 2 = 0)
       GROUP BY 1),
n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c1),
sc AS (SELECT lang, doc_id, substr(t, CAST(i AS INT), 3) AS g
       FROM (SELECT lang, doc_id, t,
                    unnest(range(1, length(t) - 1)) AS i
             FROM tr WHERE doc_id % 2 = 1)),
j AS (SELECT sc.lang, sc.doc_id,
             c3.c AS c123, b12.c AS c12, b23.c AS c23,
             u2.c AS cw2, u3.c AS cw3
      FROM sc
      LEFT JOIN c3 ON c3.g = sc.g
      LEFT JOIN c2 b12 ON b12.g = substr(sc.g, 1, 2)
      LEFT JOIN c2 b23 ON b23.g = substr(sc.g, 2, 2)
      LEFT JOIN c1 u2 ON u2.g = substr(sc.g, 2, 1)
      LEFT JOIN c1 u3 ON u3.g = substr(sc.g, 3, 1)),
s AS (SELECT lang, doc_id,
             CASE WHEN c123 IS NOT NULL THEN 0
                  WHEN c23 IS NOT NULL THEN 1
                  WHEN cw3 IS NOT NULL THEN 2 ELSE 3 END AS lev,
             CASE WHEN c123 IS NOT NULL THEN
                      CAST(round(ln(c123) * 1000000) AS BIGINT)
                      - CAST(round(ln(c12) * 1000000) AS BIGINT)
                  WHEN c23 IS NOT NULL THEN
                      CAST(round(ln(0.4) * 1000000) AS BIGINT)
                      + CAST(round(ln(c23) * 1000000) AS BIGINT)
                      - CAST(round(ln(cw2) * 1000000) AS BIGINT)
                  WHEN cw3 IS NOT NULL THEN
                      2 * CAST(round(ln(0.4) * 1000000) AS BIGINT)
                      + CAST(round(ln(cw3) * 1000000) AS BIGINT)
                      - CAST(round(ln((SELECT n FROM n)) * 1000000)
                             AS BIGINT)
                  ELSE 2 * CAST(round(ln(0.4) * 1000000) AS BIGINT)
                      - CAST(round(ln((SELECT n FROM n)) * 1000000)
                             AS BIGINT)
             END AS sm
      FROM j)
SELECT lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(sm) AS BIGINT) AS score_micro,
       CAST(count(*) FILTER (WHERE lev = 0) AS BIGINT) AS n_tri,
       CAST(count(*) FILTER (WHERE lev = 1) AS BIGINT) AS n_bi,
       CAST(count(*) FILTER (WHERE lev = 2) AS BIGINT) AS n_uni,
       CAST(count(*) FILTER (WHERE lev = 3) AS BIGINT) AS n_oov
FROM s GROUP BY 1
"""

ORACLE_SQL["kg_auc"] = _dict_oracle.linkpred_auc_sql()

ORACLE_SQL["ks_test"] = """
WITH c AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
s AS (SELECT source, CAST(sum(n) AS BIGINT) AS n FROM c GROUP BY 1),
p AS (SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb
      FROM s a JOIN s b ON a.source < b.source),
dom AS (SELECT DISTINCT v FROM c),
grid AS (SELECT p.sa, p.sb, p.na, p.nb, d.v,
                coalesce(ca.n, 0) AS cav, coalesce(cb.n, 0) AS cbv
         FROM p CROSS JOIN dom d
         LEFT JOIN c ca ON ca.source = p.sa AND ca.v = d.v
         LEFT JOIN c cb ON cb.source = p.sb AND cb.v = d.v),
w AS (SELECT sa, sb, na, nb,
             sum(cav) OVER (PARTITION BY sa, sb ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cuma,
             sum(cbv) OVER (PARTITION BY sa, sb ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cumb
      FROM grid)
SELECT sa AS source_a, sb AS source_b, na AS n_a, nb AS n_b,
       CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS ks_scaled,
       CAST(max(abs(cuma * nb - cumb * na)) * 1000000
            // (na * nb) AS BIGINT) AS ks_micro
FROM w GROUP BY 1, 2, 3, 4
"""

ORACLE_SQL["poisson_bootstrap"] = """
WITH reps AS (SELECT unnest(range(0, 32)) AS rep),
h AS (SELECT rep,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)
                  || chr(31) || CAST(rep AS VARCHAR)), 1, 16))
                  AS UBIGINT) AS u
      FROM orders, reps),
w AS (SELECT rep, cents, CASE WHEN u < CAST('6786177901268885274' AS UBIGINT) THEN 0 WHEN u < CAST('13572355802537770549' AS UBIGINT) THEN 1 WHEN u < CAST('16965444753172213186' AS UBIGINT) THEN 2 WHEN u < CAST('18096474403383694065' AS UBIGINT) THEN 3 WHEN u < CAST('18379231815936564285' AS UBIGINT) THEN 4 WHEN u < CAST('18435783298447138329' AS UBIGINT) THEN 5 WHEN u < CAST('18445208545532234003' AS UBIGINT) THEN 6 WHEN u < CAST('18446555009401533385' AS UBIGINT) THEN 7 WHEN u < CAST('18446723317385195808' AS UBIGINT) THEN 8 ELSE 9 END AS w FROM h),
m AS (SELECT rep, CAST(sum(w * cents) AS BIGINT) AS swc,
             CAST(sum(w) AS BIGINT) AS sw
      FROM w GROUP BY 1),
mm AS (SELECT rep, swc * 1000000 // sw AS mean_micro
       FROM m WHERE sw > 0),
f AS (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) * 1000000 // count(*) AS full_micro
      FROM orders)
SELECT CAST(count(*) AS BIGINT) AS b_reps,
       CAST((SELECT full_micro FROM f) AS BIGINT) AS mean_micro,
       CAST(min(mean_micro) AS BIGINT) AS boot_lo_micro,
       CAST(max(mean_micro) AS BIGINT) AS boot_hi_micro
FROM mm
"""

ORACLE_SQL["embedding_cov"] = """
WITH q AS (SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000)
                         AS BIGINT)) AS qv
           FROM embeddings),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
s AS (SELECT g.i AS i, CAST(sum(qv[g.i]) AS BIGINT) AS s
      FROM q, generate_series(1, 64) g(i) GROUP BY 1),
sii AS (SELECT g.i AS i,
               CAST(sum(qv[g.i] * qv[g.i]) AS HUGEINT) AS sii
        FROM q, generate_series(1, 64) g(i) GROUP BY 1),
var AS (SELECT i,
               (SELECT n FROM nn) * sii - CAST(s.s AS HUGEINT) * s.s
                   AS v
        FROM sii JOIN s USING (i)),
g2 AS (SELECT gi.i AS i, gj.j AS j
       FROM generate_series(1, 64) gi(i),
            generate_series(1, 64) gj(j)
       WHERE gi.i < gj.j),
sij AS (SELECT g2.i, g2.j,
               CAST(sum(qv[g2.i] * qv[g2.j]) AS HUGEINT) AS sij
        FROM q, g2 GROUP BY 1, 2),
cov AS (SELECT sij.i, sij.j,
               (SELECT n FROM nn) * sij.sij
                   - CAST(sa.s AS HUGEINT) * sb.s AS cv
        FROM sij JOIN s sa ON sa.i = sij.i
        JOIN s sb ON sb.i = sij.j),
top AS (SELECT i, j, cv FROM cov
        ORDER BY abs(cv) DESC, i, j LIMIT 20)
SELECT CAST(top.i - 1 AS BIGINT) AS dim_i,
       CAST(top.j - 1 AS BIGINT) AS dim_j,
       CAST(CASE WHEN cv < 0 THEN
                -(abs(cv) // ((SELECT n FROM nn)
                              * ((SELECT n FROM nn) - 1)))
            ELSE cv // ((SELECT n FROM nn)
                        * ((SELECT n FROM nn) - 1)) END
            AS BIGINT) AS cov_pico,
       CAST(CASE WHEN va.v = 0 OR vb.v = 0 THEN 0
            ELSE round(CAST(cv AS DOUBLE)
                       / sqrt(CAST(va.v AS DOUBLE)
                              * CAST(vb.v AS DOUBLE)) * 1000000)
            END AS BIGINT) AS corr_micro
FROM top JOIN var va ON va.i = top.i JOIN var vb ON vb.i = top.j
"""

ORACLE_SQL["anova_month"] = """
WITH r AS (SELECT c_nationkey AS nk,
                  CAST(year(o_orderdate) * 100 + month(o_orderdate)
                       AS BIGINT) AS ym,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
g AS (SELECT nk, ym % 100 AS moy,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(cents) AS HUGEINT) AS sg
      FROM r GROUP BY 1, 2),
t AS (SELECT nk, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS s,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT)
                 AS sx2
      FROM r GROUP BY 1),
p AS (SELECT nk, CAST(product(ng) AS HUGEINT) AS pp
      FROM g GROUP BY 1),
b AS (SELECT g.nk,
             CAST(sum(g.sg * g.sg * (p.pp // g.ng)) AS HUGEINT)
                 AS sb
      FROM g JOIN p USING (nk) GROUP BY 1)
SELECT n_name, t.n AS n_months,
       CAST((1000000 * (t.n * b.sb - t.s * t.s * p.pp))
            // (p.pp * (t.n * t.sx2 - t.s * t.s)) AS BIGINT)
           AS eta2_micro
FROM t JOIN b ON b.nk = t.nk JOIN p ON p.nk = t.nk
JOIN nation ON n_nationkey = t.nk
WHERE t.n >= 2 AND t.n * t.sx2 - t.s * t.s <> 0
"""

ORACLE_SQL["kg_degree_zipf"] = (
    "WITH dd AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes "
    "FROM (" + _dict_oracle.degree_sql() + ") GROUP BY degree),\n"
    """xy AS (SELECT CAST(round(ln(degree) * 1000000) AS BIGINT) AS x,
             CAST(round(ln(n_nodes) * 1000000) AS BIGINT) AS y
      FROM dd WHERE degree > 0),
s AS (SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM xy)
SELECT k AS n_degrees,
       CAST(CASE WHEN k * sxx - sx * sx = 0 THEN 0
                 WHEN (k * sxy - sx * sy) < 0 THEN
                     -((abs(k * sxy - sx * sy) * 1000000)
                       // (k * sxx - sx * sx))
                 ELSE ((k * sxy - sx * sy) * 1000000)
                       // (k * sxx - sx * sx) END
            AS BIGINT) AS slope_micro
FROM s
""")

ORACLE_SQL["token_shift"] = r"""
WITH t AS (SELECT doc_id % 2 AS half,
                  unnest(regexp_extract_all(coalesce(text, ''),
                                            '\S+')) AS tok
           FROM documents),
c AS (SELECT tok,
             CAST(count(*) FILTER (WHERE half = 0) AS BIGINT) AS ce,
             CAST(count(*) FILTER (WHERE half = 1) AS BIGINT) AS co
      FROM t GROUP BY 1),
n AS (SELECT CAST(sum(ce) AS BIGINT) AS ne,
             CAST(sum(co) AS BIGINT) AS no
      FROM c)
SELECT tok AS token, ce AS n_even, co AS n_odd,
       CAST(abs(ce * (SELECT no FROM n)
                - co * (SELECT ne FROM n)) AS BIGINT) AS shift_scaled
FROM c ORDER BY shift_scaled DESC, token LIMIT 20
"""

ORACLE_SQL["partition_skew"] = """
WITH h AS (SELECT CAST(CAST(concat('0x',
               substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
               AS UBIGINT) % 64 AS BIGINT) AS p
           FROM events),
c AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY 1),
o AS (SELECT n, row_number() OVER (ORDER BY n) AS rn,
             count(*) OVER () AS k
      FROM c WHERE n > 0)
SELECT CAST(max(k) AS BIGINT) AS n_partitions,
       CAST(min(n) AS BIGINT) AS min_rows,
       CAST(sum(CASE WHEN rn = (k + 1) // 2 THEN n ELSE 0 END)
            + sum(CASE WHEN rn = k // 2 + 1 THEN n ELSE 0 END)
            AS BIGINT) AS med2_rows,
       CAST(max(n) AS BIGINT) AS max_rows,
       CAST(2 * max(n) * 1000000
            // (sum(CASE WHEN rn = (k + 1) // 2 THEN n ELSE 0 END)
                + sum(CASE WHEN rn = k // 2 + 1 THEN n ELSE 0 END))
            AS BIGINT) AS skew_micro
FROM o
"""

ORACLE_SQL["seasonal_anomaly"] = """
WITH h AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS eh,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
g AS (SELECT ((eh // 24) + 4) % 7 * 24 + eh % 24 AS k,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(c) AS BIGINT) AS sg
      FROM h GROUP BY 1)
SELECT eh, c AS n_events,
       CAST(abs(c * ng - sg) * 1000000 // ng AS BIGINT)
           AS resid_micro
FROM h JOIN g ON ((h.eh // 24) + 4) % 7 * 24 + h.eh % 24 = g.k
ORDER BY resid_micro DESC, eh LIMIT 20
"""

ORACLE_SQL["rrf_fusion"] = """
WITH bm AS (SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id)
                       AS r
            FROM (""" + ORACLE_SQL["bm25_topk"] + """)),
ts AS (SELECT doc_id,
              row_number() OVER (ORDER BY score DESC, doc_id) AS r
       FROM (""" + ORACLE_SQL["term_search"] + """)),
u AS (SELECT coalesce(bm.doc_id, ts.doc_id) AS doc_id,
             coalesce(bm.r, 0) AS rb, coalesce(ts.r, 0) AS rt
      FROM bm FULL OUTER JOIN ts ON bm.doc_id = ts.doc_id)
SELECT doc_id,
       CAST(CASE WHEN rb > 0 THEN 1000000 // (60 + rb) ELSE 0 END
            + CASE WHEN rt > 0 THEN 1000000 // (60 + rt) ELSE 0 END
            AS BIGINT) AS rrf_scaled,
       CAST(rb AS BIGINT) AS rank_bm25,
       CAST(rt AS BIGINT) AS rank_ts
FROM u
ORDER BY rrf_scaled DESC, doc_id LIMIT 10
"""

ORACLE_SQL["source_scorecard"] = r"""
WITH s AS (SELECT source,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(length(coalesce(text, ''))) AS BIGINT)
                      AS n_chars,
                  CAST(sum(length(regexp_extract_all(
                      coalesce(text, ''), '\S+'))) AS BIGINT)
                      AS n_tokens,
                  CAST(sum(length(regexp_extract_all(coalesce(text,
                      ''), '\b(the|a|of|and|data)\b'))) AS BIGINT)
                      AS n_stopwords,
                  CAST(sum(CASE WHEN
                      length(regexp_extract_all(coalesce(text, ''),
                             '\b(the|of|and)\b'))
                      >= length(regexp_extract_all(coalesce(text,
                             ''), '\b(der|die|und)\b'))
                      AND length(regexp_extract_all(coalesce(text,
                             ''), '\b(the|of|and)\b'))
                      >= length(regexp_extract_all(coalesce(text,
                             ''), '\b(el|la|los)\b'))
                      AND length(regexp_extract_all(coalesce(text,
                             ''), '\b(the|of|and)\b')) > 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_en_docs
           FROM documents GROUP BY 1),
hc AS (SELECT md5(coalesce(text, '')) AS h, source,
              CAST(count(*) AS BIGINT) AS n
       FROM documents GROUP BY 1, 2),
ht AS (SELECT h, CAST(sum(n) AS BIGINT) AS tot FROM hc GROUP BY 1),
d AS (SELECT hc.source,
             CAST(sum(CASE WHEN ht.tot >= 2 THEN hc.n ELSE 0 END)
                  AS BIGINT) AS dup_docs
      FROM hc JOIN ht USING (h) GROUP BY 1)
SELECT s.source, s.n_docs, s.n_chars, s.n_tokens, s.n_stopwords,
       s.n_en_docs, coalesce(d.dup_docs, 0) AS dup_docs
FROM s LEFT JOIN d ON d.source = s.source
"""

ORACLE_SQL["transition_entropy"] = """
WITH o AS (SELECT user_id, event_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                      AS nxt
           FROM events),
c AS (SELECT event_type AS prev_type, nxt AS next_type,
             CAST(count(*) AS BIGINT) AS n
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
u AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n * CAST(round(ln(n) * 1000000) AS BIGINT))
                  AS BIGINT) AS sum_clc
      FROM c GROUP BY 1)
SELECT prev_type, t AS n_transitions, k AS n_successors,
       CAST((t * CAST(round(ln(t) * 1000000) AS BIGINT) - sum_clc)
            // t AS BIGINT) AS entropy_micro
FROM u
"""

ORACLE_SQL["session_entry_exit"] = """
WITH s AS (SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > 1800000000
                  THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sx AS (SELECT user_id, ts, event_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess
       FROM s),
r AS (SELECT user_id, sess, event_type,
        row_number() OVER (PARTITION BY user_id, sess
                           ORDER BY ts, event_id) AS rn,
        count(*) OVER (PARTITION BY user_id, sess) AS n
      FROM sx),
e AS (SELECT user_id, sess,
        max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
        max(CASE WHEN rn = n THEN event_type END) AS exit_type,
        max(n) AS n
      FROM r GROUP BY 1, 2)
SELECT entry_type, exit_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_bounce
FROM e GROUP BY 1, 2
"""

ORACLE_SQL["kg_neighbor_degree"] = _dict_oracle.neighbor_degree_sql()

ORACLE_SQL["theil_sen_nation"] = """
WITH m AS (SELECT c_nationkey AS nk,
                  year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
p AS (SELECT a.nk,
             CAST(CASE WHEN b.cents >= a.cents
                  THEN CAST(b.cents - a.cents AS HUGEINT) * 1000000
                       // (b.ym - a.ym)
                  ELSE -(CAST(a.cents - b.cents AS HUGEINT) * 1000000
                         // (b.ym - a.ym)) END AS BIGINT) AS s
      FROM m a JOIN m b ON a.nk = b.nk AND b.ym > a.ym),
r AS (SELECT nk, s, row_number() OVER (PARTITION BY nk ORDER BY s)
                        AS rn,
             count(*) OVER (PARTITION BY nk) AS k
      FROM p),
mm AS (SELECT nk, CAST(max(k) AS BIGINT) AS n_pairs,
              CAST(sum(CASE WHEN rn = (k + 1) // 2 THEN s ELSE 0 END)
                   + sum(CASE WHEN rn = k // 2 + 1 THEN s ELSE 0 END)
                   AS BIGINT) AS slope_med2
       FROM r GROUP BY nk),
cnt AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_months
        FROM m GROUP BY nk)
SELECT n_name, cnt.n_months, mm.n_pairs, mm.slope_med2
FROM mm JOIN cnt ON cnt.nk = mm.nk
JOIN nation ON n_nationkey = mm.nk
ORDER BY n_name
"""

ORACLE_SQL["rank_stability"] = """
WITH r AS (SELECT l_suppkey AS sk,
                  CAST(sum(CASE WHEN l_shipdate
                                     < TIMESTAMP '1995-01-01'
                           THEN CAST(round(l_extendedprice
                                     * (1 - l_discount) * 100)
                                     AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS ra,
                  CAST(sum(CASE WHEN l_shipdate
                                     >= TIMESTAMP '1995-01-01'
                           THEN CAST(round(l_extendedprice
                                     * (1 - l_discount) * 100)
                                     AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS rb
           FROM lineitem GROUP BY 1),
top AS (SELECT sk, ra, rb
        FROM (SELECT sk, ra, rb,
                     row_number() OVER (ORDER BY ra + rb DESC, sk)
                         AS rt
              FROM r)
        WHERE rt <= 50),
rk AS (SELECT sk,
              row_number() OVER (ORDER BY ra DESC, sk) AS ka,
              row_number() OVER (ORDER BY rb DESC, sk) AS kb
       FROM top),
p AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(count(*) FILTER (WHERE (a.ka - b.ka)
                                         * (a.kb - b.kb) > 0)
                  AS BIGINT) AS conc,
             CAST(count(*) FILTER (WHERE (a.ka - b.ka)
                                         * (a.kb - b.kb) < 0)
                  AS BIGINT) AS disc
      FROM rk a JOIN rk b ON a.sk < b.sk),
ni AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM rk)
SELECT ni.n_items, p.n_pairs, p.conc AS n_concordant,
       p.disc AS n_discordant,
       CAST(CASE WHEN p.n_pairs = 0 THEN 0
                 WHEN p.conc >= p.disc
                 THEN (p.conc - p.disc) * 1000000 // p.n_pairs
                 ELSE -((p.disc - p.conc) * 1000000 // p.n_pairs)
            END AS BIGINT) AS tau_ppm
FROM ni, p
"""

ORACLE_SQL["spearman_qty_discount"] = """
WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                  CAST(round(l_discount * 100) AS BIGINT) AS d
           FROM lineitem),
h AS (SELECT q, d, CAST(count(*) AS HUGEINT) AS c
      FROM b GROUP BY 1, 2),
qt AS (SELECT q, sum(c) AS cq FROM h GROUP BY 1),
qr AS (SELECT q, 2 * (sum(cq) OVER (ORDER BY q
                      ROWS UNBOUNDED PRECEDING) - cq) + cq + 1 AS r2
       FROM qt),
dt AS (SELECT d, sum(c) AS cd FROM h GROUP BY 1),
dr AS (SELECT d, 2 * (sum(cd) OVER (ORDER BY d
                      ROWS UNBOUNDED PRECEDING) - cd) + cd + 1 AS r2
       FROM dt),
m AS (SELECT sum(c) AS n,
             sum(c * qr.r2) AS sx, sum(c * dr.r2) AS sy,
             sum(c * qr.r2 * qr.r2) AS sxx,
             sum(c * dr.r2 * dr.r2) AS syy,
             sum(c * qr.r2 * dr.r2) AS sxy
      FROM h JOIN qr ON qr.q = h.q JOIN dr ON dr.d = h.d)
SELECT CAST(n AS BIGINT) AS n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho
FROM m
"""

ORACLE_SQL["k_anonymity"] = """
WITH c AS (SELECT c_nationkey, c_mktsegment,
                  CAST(count(*) AS BIGINT) AS n
           FROM customer GROUP BY 1, 2)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(n) AS BIGINT) AS min_class,
       CAST(max(n) AS BIGINT) AS max_class,
       CAST(count(*) FILTER (WHERE n < 5) AS BIGINT)
           AS n_classes_lt5,
       CAST(coalesce(sum(n) FILTER (WHERE n < 5), 0) AS BIGINT)
           AS n_rows_lt5,
       CAST(count(*) FILTER (WHERE n < 50) AS BIGINT)
           AS n_classes_lt50,
       CAST(coalesce(sum(n) FILTER (WHERE n < 50), 0) AS BIGINT)
           AS n_rows_lt50
FROM c
"""

ORACLE_SQL["split_leakage"] = """
WITH s AS (SELECT md5(trim(regexp_replace(regexp_replace(
                      lower(text), '[^a-z0-9 ]+', '', 'g'),
                      ' +', ' ', 'g'))) AS h,
                  CASE WHEN CAST(concat('0x',
                            substr(md5(CAST(doc_id AS VARCHAR)),
                                   1, 8))
                       AS UBIGINT) % 100 < 80
                       THEN 1 ELSE 0 END AS tr
           FROM documents),
c AS (SELECT h, CAST(sum(tr) AS BIGINT) AS nt,
             CAST(count(*) - sum(tr) AS BIGINT) AS nv
      FROM s GROUP BY 1)
SELECT CAST(sum(nt) AS BIGINT) AS n_train,
       CAST(sum(nv) AS BIGINT) AS n_test,
       CAST(coalesce(sum(nv) FILTER (WHERE nt > 0 AND nv > 0), 0)
            AS BIGINT) AS n_leaked_test,
       CAST(CASE WHEN sum(nv) = 0 THEN 0
                 ELSE coalesce(sum(nv) FILTER (WHERE nt > 0
                                               AND nv > 0), 0)
                      * 1000000 // sum(nv) END AS BIGINT)
           AS leak_ppm,
       CAST(count(*) FILTER (WHERE nt > 0 AND nv > 0) AS BIGINT)
           AS n_shared_classes
FROM c
"""

ORACLE_SQL["cohort_ltv"] = """
WITH o AS (SELECT o_custkey AS ck,
                  year(o_orderdate) * 12 + month(o_orderdate) - 1
                      AS ym,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
f AS (SELECT ck, min(ym) AS cohort FROM o GROUP BY 1),
cells AS (SELECT f.cohort, o.ym - f.cohort AS k,
                 CAST(sum(o.cents) AS BIGINT) AS rev
          FROM o JOIN f ON f.ck = o.ck GROUP BY 1, 2),
nc AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_custs
       FROM f GROUP BY 1)
SELECT CAST(cells.cohort // 12 AS BIGINT) AS cohort_year,
       CAST(cells.cohort % 12 + 1 AS BIGINT) AS cohort_month,
       CAST(cells.k AS BIGINT) AS months_since,
       nc.n_custs,
       cells.rev AS rev_cents,
       CAST(sum(cells.rev) OVER (PARTITION BY cells.cohort
                                 ORDER BY cells.k
                                 ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_cents
FROM cells JOIN nc ON nc.cohort = cells.cohort
ORDER BY cohort_year, cohort_month, months_since
"""

ORACLE_SQL["filter_funnel"] = """
WITH w AS (SELECT string_split(text, ' ') AS ws, lang, text
           FROM documents),
m AS (SELECT lang, text, len(ws) AS nw,
             (SELECT coalesce(sum(length(x.w)), 0)
              FROM unnest(ws) x(w)) AS swl,
             (SELECT count(*) FROM unnest(ws) x(w)
              WHERE x.w IN ('the','a','of','to','and','in','is'))
                 AS nstop,
             (SELECT count(DISTINCT x.w) FROM unnest(ws) x(w))
                 AS nuniq
      FROM w),
fl AS (SELECT CASE WHEN nw BETWEEN 20 AND 1000
                    AND swl >= 3 * nw AND swl <= 5 * nw
                    AND nstop * 100 >= 2 * nw
                    AND nuniq * 100 >= 35 * nw
                   THEN 1 ELSE 0 END AS q,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en,
              md5(trim(regexp_replace(regexp_replace(
                  lower(coalesce(text, '')), '[^a-z0-9 ]+', '', 'g'),
                  ' +', ' ', 'g'))) AS h
       FROM m),
c AS (SELECT h, count(*) AS n, sum(q) AS q, sum(q * en) AS ql
      FROM fl GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(q) AS BIGINT) AS q,
             CAST(sum(ql) AS BIGINT) AS ql,
             CAST(count(*) FILTER (WHERE ql > 0) AS BIGINT) AS u
      FROM c)
SELECT CAST(0 AS BIGINT) AS stage, 'all' AS gate, n AS n_docs,
       CAST(0 AS BIGINT) AS n_dropped FROM t
UNION ALL SELECT 1, 'quality', q, n - q FROM t
UNION ALL SELECT 2, 'quality+lang', ql, q - ql FROM t
UNION ALL SELECT 3, 'unique', u, ql - u FROM t
"""

ORACLE_SQL["token_burstiness"] = r"""
WITH toks AS (SELECT doc_id,
                     unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) AS w
              FROM documents),
pc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
       FROM toks GROUP BY 1, 2),
s AS (SELECT w, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS tot,
             sum(CAST(c AS HUGEINT) * c) AS sq
      FROM pc GROUP BY 1),
nd AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM documents),
top AS (SELECT * FROM s ORDER BY df DESC, w LIMIT 20)
SELECT w AS token, df AS n_docs, tot AS n_occurrences,
       CAST(sq AS BIGINT) AS sum_sq,
       CAST(((SELECT n FROM nd) * sq
             - CAST(tot AS HUGEINT) * tot) * 1000000
            // ((SELECT n FROM nd) * tot) AS BIGINT) AS vmr_micro
FROM top ORDER BY n_docs DESC, token
"""

ORACLE_SQL["type_dow_mi"] = """
WITH c AS (SELECT event_type,
                  CAST((epoch_us(ts) // 86400000000 + 4) % 7
                       AS BIGINT) AS dow,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS rn
      FROM c GROUP BY 1),
k AS (SELECT dow, CAST(sum(n) AS BIGINT) AS cn FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tn FROM c),
terms AS (SELECT c.n
                 * (CAST(floor(ln(c.n) * 1000000 + 0.5) AS BIGINT)
                    + (SELECT CAST(floor(ln(tn) * 1000000 + 0.5)
                                   AS BIGINT) FROM t)
                    - CAST(floor(ln(r.rn) * 1000000 + 0.5) AS BIGINT)
                    - CAST(floor(ln(k.cn) * 1000000 + 0.5) AS BIGINT))
                     AS v
          FROM c JOIN r USING (event_type) JOIN k USING (dow))
SELECT (SELECT tn FROM t) AS n_events,
       (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_types,
       (SELECT CAST(count(*) AS BIGINT) FROM k) AS n_dows,
       CAST(CASE WHEN sum(v) >= 0
                 THEN sum(v) // (SELECT tn FROM t)
                 ELSE -((-sum(v)) // (SELECT tn FROM t)) END
            AS BIGINT) AS mi_micro
FROM terms
"""


def _fd_sql_one(table: str, lhs: str, rhs: str) -> str:
    return f"""
SELECT '{table}.{lhs}->{rhs}' AS fd,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(c) AS BIGINT) AS n_pairs,
       CAST(count(*) FILTER (WHERE c > 1) AS BIGINT)
           AS n_violating_lhs,
       CAST(max(c) AS BIGINT) AS max_rhs_per_lhs,
       CAST((count(*) - count(*) FILTER (WHERE c > 1)) * 1000000
            // count(*) AS BIGINT) AS fd_ppm
FROM (SELECT l, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT DISTINCT CAST({lhs} AS VARCHAR) AS l,
                            CAST({rhs} AS VARCHAR) AS r
            FROM {table})
      GROUP BY l)
"""


ORACLE_SQL["fd_audit"] = " UNION ALL ".join(
    _fd_sql_one(*c) for c in _FD_CANDIDATES) + " ORDER BY fd"

ORACLE_SQL["markov_order2_gain"] = """
WITH s AS (SELECT event_type AS nx,
                  lag(event_type, 1) OVER w AS p1,
                  lag(event_type, 2) OVER w AS p2
           FROM events
           WINDOW w AS (PARTITION BY user_id
                        ORDER BY ts, event_id)),
c AS (SELECT p2, p1, nx, CAST(count(*) AS BIGINT) AS n
      FROM s WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
n AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
lg AS (SELECT
    (SELECT sum(t * CAST(floor(ln(t) * 1000000 + 0.5) AS BIGINT))
     FROM (SELECT CAST(sum(n) AS BIGINT) AS t FROM c GROUP BY p1))
    - (SELECT sum(t * CAST(floor(ln(t) * 1000000 + 0.5) AS BIGINT))
       FROM (SELECT CAST(sum(n) AS BIGINT) AS t
             FROM c GROUP BY p1, nx)) AS s1,
    (SELECT sum(t * CAST(floor(ln(t) * 1000000 + 0.5) AS BIGINT))
     FROM (SELECT CAST(sum(n) AS BIGINT) AS t
           FROM c GROUP BY p2, p1))
    - (SELECT sum(t * CAST(floor(ln(t) * 1000000 + 0.5) AS BIGINT))
       FROM (SELECT CAST(sum(n) AS BIGINT) AS t
             FROM c GROUP BY p2, p1, nx)) AS s2)
SELECT n.nt AS n_triples,
       CAST(CASE WHEN s1 >= 0 THEN s1 // nt
                 ELSE -((-s1) // nt) END AS BIGINT) AS h1_micro,
       CAST(CASE WHEN s2 >= 0 THEN s2 // nt
                 ELSE -((-s2) // nt) END AS BIGINT) AS h2_micro,
       CAST(CASE WHEN s1 >= 0 THEN s1 // nt
                 ELSE -((-s1) // nt) END
            - CASE WHEN s2 >= 0 THEN s2 // nt
                   ELSE -((-s2) // nt) END AS BIGINT) AS gain_micro
FROM lg, n
"""

ORACLE_SQL["label_centroid_dist"] = """
WITH q AS (SELECT CAST(label AS BIGINT) AS label,
                  list_transform(embedding,
                      x -> CAST(round(CAST(x AS DOUBLE) * 1000000)
                                AS BIGINT)) AS qv
           FROM embeddings),
n AS (SELECT label, CAST(count(*) AS BIGINT) AS n
      FROM q GROUP BY 1),
s AS (SELECT label, g.i AS i, CAST(sum(qv[g.i]) AS BIGINT) AS s
      FROM q, generate_series(1, 64) g(i) GROUP BY 1, 2),
p AS (SELECT a.label AS la, b.label AS lb, a.n AS na, b.n AS nb
      FROM n a JOIN n b ON a.label < b.label),
num AS (SELECT p.la, p.lb, p.na, p.nb,
               sum((CAST(sa.s AS HUGEINT) * p.nb
                    - CAST(sb.s AS HUGEINT) * p.na)
                   * (CAST(sa.s AS HUGEINT) * p.nb
                      - CAST(sb.s AS HUGEINT) * p.na)) AS d2
        FROM p JOIN s sa ON sa.label = p.la
        JOIN s sb ON sb.label = p.lb AND sb.i = sa.i
        GROUP BY 1, 2, 3, 4)
SELECT la AS label_a, lb AS label_b, na AS n_a, nb AS n_b,
       CAST(d2 // (CAST(na AS HUGEINT) * na * nb * nb) AS BIGINT)
           AS dist2_micro2
FROM num ORDER BY label_a, label_b
"""

ORACLE_SQL["hapax_share"] = r"""
WITH toks AS (SELECT source,
                     unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) AS w
              FROM documents),
v AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
       CAST(count(*) FILTER (WHERE c = 1) * 1000000 // count(*)
            AS BIGINT) AS hapax_ppm
FROM v GROUP BY 1 ORDER BY source
"""

ORACLE_SQL["price_index"] = """
WITH y AS (SELECT year(l_shipdate) AS yr,
                  CAST(sum(CAST(round(l_extendedprice * 100)
                                AS BIGINT)) AS BIGINT) AS c,
                  CAST(sum(CAST(round(l_quantity) AS BIGINT))
                       AS BIGINT) AS q
           FROM lineitem GROUP BY 1)
SELECT CAST(a.yr AS BIGINT) AS year, a.c AS rev_cents,
       a.q AS qty_units, b.c AS prev_rev_cents,
       b.q AS prev_qty_units,
       CAST(CAST(a.c AS HUGEINT) * b.q * 1000000
            // (CAST(a.q AS HUGEINT) * b.c) AS BIGINT) AS uvi_ppm
FROM y a JOIN y b ON b.yr = a.yr - 1 ORDER BY year
"""

ORACLE_SQL["text_entropy_rate"] = r"""
WITH t AS (SELECT source, regexp_extract_all(coalesce(text, ''),
                                             '\S+') AS tl
           FROM documents),
bg AS (SELECT source, unnest(tl[1:len(tl) - 1]) AS w1,
              unnest(tl[2:len(tl)]) AS w2
       FROM t WHERE len(tl) >= 2),
j AS (SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c
      FROM bg GROUP BY 1, 2, 3),
js AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
              CAST(sum(c * CAST(floor(ln(c) * 1000000 + 0.5)
                               AS BIGINT)) AS BIGINT) AS sj
       FROM j GROUP BY 1),
cx AS (SELECT source, w1, CAST(sum(c) AS BIGINT) AS t
       FROM j GROUP BY 1, 2),
cs AS (SELECT source,
              CAST(sum(t * CAST(floor(ln(t) * 1000000 + 0.5)
                               AS BIGINT)) AS BIGINT) AS sc
       FROM cx GROUP BY 1),
mg AS (SELECT source, w2, CAST(sum(c) AS BIGINT) AS m
       FROM j GROUP BY 1, 2),
ms AS (SELECT source,
              CAST(sum(m * CAST(floor(ln(m) * 1000000 + 0.5)
                               AS BIGINT)) AS BIGINT) AS sm
       FROM mg GROUP BY 1)
SELECT js.source, js.n AS n_bigrams,
       CAST(CASE WHEN js.n * CAST(floor(ln(js.n) * 1000000 + 0.5)
                             AS BIGINT) - ms.sm >= 0
                 THEN (js.n * CAST(floor(ln(js.n) * 1000000 + 0.5)
                                   AS BIGINT) - ms.sm) // js.n
                 ELSE -((ms.sm - js.n
                         * CAST(floor(ln(js.n) * 1000000 + 0.5)
                                AS BIGINT)) // js.n) END AS BIGINT)
           AS h1_micro,
       CAST(CASE WHEN cs.sc - js.sj >= 0
                 THEN (cs.sc - js.sj) // js.n
                 ELSE -((js.sj - cs.sc) // js.n) END AS BIGINT)
           AS h2_micro,
       CAST(CASE WHEN js.n * CAST(floor(ln(js.n) * 1000000 + 0.5)
                             AS BIGINT) - ms.sm >= 0
                 THEN (js.n * CAST(floor(ln(js.n) * 1000000 + 0.5)
                                   AS BIGINT) - ms.sm) // js.n
                 ELSE -((ms.sm - js.n
                         * CAST(floor(ln(js.n) * 1000000 + 0.5)
                                AS BIGINT)) // js.n) END
            - CASE WHEN cs.sc - js.sj >= 0
                   THEN (cs.sc - js.sj) // js.n
                   ELSE -((js.sj - cs.sc) // js.n) END AS BIGINT)
           AS redundancy_micro
FROM js JOIN cs USING (source) JOIN ms USING (source)
ORDER BY source
"""

ORACLE_SQL["kg_local_bridges"] = """
WITH ej AS (""" + _dict_oracle.edge_jaccard_sql() + """)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(count(*) FILTER (WHERE cn = 0) AS BIGINT)
           AS n_local_bridges,
       CAST(count(*) FILTER (WHERE cn = 0) * 1000000 // count(*)
            AS BIGINT) AS bridge_ppm,
       CAST(sum(jac_ppm) // count(*) AS BIGINT) AS mean_jac_ppm
FROM ej
"""

ORACLE_SQL["kg_eigencentrality"] = _dict_oracle.eigencentrality_sql()

ORACLE_SQL["basket_triples"] = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
cap AS (SELECT l_orderkey, l_partkey
        FROM (SELECT l_orderkey, l_partkey,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY l_partkey) AS rn
              FROM li)
        WHERE rn <= {_BASKET_CAP}),
tr AS (SELECT a.l_partkey AS a, b.l_partkey AS b, c.l_partkey AS c,
              CAST(count(*) AS BIGINT) AS n_orders
       FROM cap a JOIN cap b
         ON a.l_orderkey = b.l_orderkey
        AND a.l_partkey < b.l_partkey
       JOIN cap c
         ON b.l_orderkey = c.l_orderkey
        AND b.l_partkey < c.l_partkey
       GROUP BY 1, 2, 3)
SELECT a, b, c, n_orders FROM tr
ORDER BY n_orders DESC, a, b, c LIMIT 20
"""

ORACLE_SQL["dwell_time"] = """
WITH s AS (SELECT event_type, epoch_us(ts) AS t,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                      AS nt
           FROM events)
SELECT event_type,
       CAST(count(*) FILTER (WHERE nt IS NOT NULL
                             AND nt - t <= 1800000000) AS BIGINT)
           AS n_dwells,
       CAST(coalesce(sum(nt - t) FILTER (
                WHERE nt IS NOT NULL AND nt - t <= 1800000000), 0)
            AS BIGINT) AS sum_dwell_us,
       CAST(coalesce(sum(nt - t) FILTER (
                WHERE nt IS NOT NULL AND nt - t <= 1800000000), 0)
            // count(*) FILTER (WHERE nt IS NOT NULL
                                AND nt - t <= 1800000000)
            AS BIGINT) AS mean_dwell_us
FROM s GROUP BY 1 ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# round-5 session-G operators
# ---------------------------------------------------------------------------

def q_interval_coverage(sf_dir: str):
    """Per-user interval-UNION coverage census (events as
    ``[ts, ts + value minutes]`` intervals) — see
    :func:`kgforge.functions.events.interval_coverage_ds`."""
    from kgforge.functions.events import interval_coverage_ds

    return interval_coverage_ds(
        _read(sf_dir, "events", ["user_id", "ts", "value"]))


def q_item_cf_topk(sf_dir: str):
    """Item-item collaborative-filtering neighbors: exact integer
    cosine² (ppm: ``n_ab²·10⁶ // (n_a·n_b)``) between parts over
    order-basket co-occurrence, top-5 neighbors for each of the 20
    most-ordered parts (count DESC, part ASC) — the
    neighborhood-based recommender primitive on top of the basket
    pair engine.  (part, nbr, n_co, cos2_ppm, rnk), part ASC, rnk.

    Scale plan: distinct (order, part) via one pair-hash exchange
    (fd_audit's shape), pair counts via the market-basket
    ``cooccur_pairs_ds`` exchange; part marginals are a
    dimension-bounded LUT broadcast once (parts are a catalog
    dimension, not corpus-scale); anchors and the final top-5 fold
    are per-batch bounded partials — no extra all-to-all."""
    import ray
    from ray.data.aggregate import Count, Sum

    from kgforge.functions.graph import cooccur_pairs_ds

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def dpair(b: pa.Table) -> pa.Table:
        return b.group_by(["l_orderkey", "l_partkey"],
                          use_threads=False).aggregate([])

    dp = li.map_batches(dpair, batch_format="pyarrow") \
        .groupby(["l_orderkey", "l_partkey"]) \
        .aggregate(Count(alias_name="__c"))

    def per_part(b: pa.Table) -> pa.Table:
        g = b.select(["l_partkey"]).group_by(
            ["l_partkey"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"p": g["l_partkey"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    marg = dp.map_batches(per_part, batch_format="pyarrow") \
        .groupby("p").aggregate(Sum("c", alias_name="c"))

    # part marginals: dimension-bounded LUT (catalog cardinality)
    mp = marg.to_pandas()
    c_of = dict(zip(mp["p"].astype(int), mp["c"].astype(int)))
    anchors = sorted(c_of.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    anchor_set = {p for p, _ in anchors}
    aarr = pa.array(sorted(anchor_set), pa.int64())
    cref = ray.put((np.array(sorted(c_of), dtype=np.int64),
                    np.array([c_of[k] for k in sorted(c_of)],
                             dtype=np.int64)))

    pairs = cooccur_pairs_ds(li, ["l_orderkey"], "l_partkey")

    def score(b: pa.Table, _c=cref) -> pa.Table:
        keys, cs = ray.get(_c)
        a = pc.cast(b["a"], pa.int64())
        bb = pc.cast(b["b"], pa.int64())
        n = pc.cast(b["n_groups"], pa.int64())
        part = pa.concat_arrays([a.combine_chunks(),
                                 bb.combine_chunks()])
        nbr = pa.concat_arrays([bb.combine_chunks(),
                                a.combine_chunks()])
        nn = pa.concat_arrays([n.combine_chunks()] * 2)
        m = pc.is_in(part, value_set=aarr)
        part, nbr, nn = (part.filter(m), nbr.filter(m), nn.filter(m))
        pv = part.to_numpy(zero_copy_only=False)
        nv = nbr.to_numpy(zero_copy_only=False)
        co = nn.to_numpy(zero_copy_only=False)
        ca = cs[np.searchsorted(keys, pv)]
        cb = cs[np.searchsorted(keys, nv)]
        cos2 = co * co * 1_000_000 // (ca * cb)
        # bounded partial: top-5 per anchor part inside the batch
        t = pa.table({"part": pa.array(pv), "nbr": pa.array(nv),
                      "n_co": pa.array(co), "cos2_ppm": pa.array(cos2)})
        idx = pc.sort_indices(t, sort_keys=[
            ("part", "ascending"), ("cos2_ppm", "descending"),
            ("nbr", "ascending")])
        t = t.take(idx)
        ptv = t["part"].combine_chunks().to_numpy(zero_copy_only=False)
        brk = np.ones(len(ptv), dtype=bool)
        if len(ptv) > 1:
            brk[1:] = ptv[1:] != ptv[:-1]
        pos = np.arange(len(ptv)) - np.repeat(
            np.flatnonzero(brk), np.diff(np.append(
                np.flatnonzero(brk), len(ptv))))
        return t.filter(pa.array(pos < 5))

    rows = []
    for part in pairs.map_batches(score, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        rows.extend(zip(part["part"].to_pylist(),
                        part["nbr"].to_pylist(),
                        part["n_co"].to_pylist(),
                        part["cos2_ppm"].to_pylist()))
    rows.sort(key=lambda r: (r[0], -r[3], r[1]))
    out, seen, rk = [], None, 0
    for p, nb, co, c2 in rows:
        rk = rk + 1 if p == seen else 1
        seen = p
        if rk <= 5:
            out.append((p, nb, co, c2, rk))
    return pa.table({
        "part": pa.array([r[0] for r in out], pa.int64()),
        "nbr": pa.array([r[1] for r in out], pa.int64()),
        "n_co": pa.array([r[2] for r in out], pa.int64()),
        "cos2_ppm": pa.array([r[3] for r in out], pa.int64()),
        "rnk": pa.array([r[4] for r in out], pa.int64())})


def q_kg_widest_path(sf_dir: str):
    """Widest-path (max-bottleneck) widths from the 4 smallest nodes
    over the weighted sentence co-mention graph — see
    :func:`kgforge.functions.graph.widest_paths_ds`."""
    from kgforge.functions.graph import cooccur_pairs_ds, \
        widest_paths_ds

    ments = _dict_flagship_for(sf_dir)["mentions"].select_columns(
        ["doc_id", "sent_idx", "surface"])
    pairs = cooccur_pairs_ds(ments, ["doc_id", "sent_idx"], "surface")
    return widest_paths_ds(pairs, n_seeds=4, max_hops=4,
                           w_col="n_groups")


def q_lang_confusion(sf_dir: str):
    """Declared-vs-predicted language confusion matrix over the
    function-word lang-ID heuristic: (lang, pred_lang, n_docs,
    share_ppm of the declared language's docs), lang/pred ASC — the
    QA table that says WHERE the classifier disagrees with the
    catalog metadata, not just how often.

    Scale plan: the lang-ID pure map plus one (lang, pred)-bounded
    groupby; the share denominator folds on the driver over the
    ≤ |langs|² matrix."""
    from ray.data.aggregate import Count

    from kgforge.functions.textstats import lang_id

    def tag(b: pa.Table) -> pa.Table:
        p = lang_id(b, "text", "doc_id")
        return pa.table({"lang": b["lang"],
                         "pred_lang": p["pred_lang"]})

    m = _read(sf_dir, "documents", ["doc_id", "text", "lang"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby(["lang", "pred_lang"]) \
        .aggregate(Count(alias_name="n_docs")) \
        .to_pandas().sort_values(["lang", "pred_lang"])
    tot = m.groupby("lang")["n_docs"].transform("sum")
    m["share_ppm"] = (m["n_docs"].astype(np.int64) * 1_000_000
                      // tot.astype(np.int64))
    return pa.table({
        "lang": pa.array(m["lang"].tolist(), pa.string()),
        "pred_lang": pa.array(m["pred_lang"].tolist(), pa.string()),
        "n_docs": pa.array(m["n_docs"].to_numpy(np.int64)),
        "share_ppm": pa.array(m["share_ppm"].to_numpy(np.int64))})


QUERIES["interval_coverage"] = q_interval_coverage
QUERIES["item_cf_topk"] = q_item_cf_topk
QUERIES["kg_widest_path"] = q_kg_widest_path
QUERIES["lang_confusion"] = q_lang_confusion

ORACLE_SQL["interval_coverage"] = """
WITH iv AS (SELECT user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS s,
                   CAST(epoch_us(ts) AS BIGINT)
                   + greatest(CAST(floor(value * 60000000) AS BIGINT),
                              0) AS e
            FROM events),
o AS (SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pm
      FROM iv),
per AS (SELECT user_id,
               CAST(sum(greatest(e - greatest(s,
                        coalesce(pm, -9223372036854775807)), 0))
                    AS BIGINT) AS u,
               CAST(max(e) - min(s) AS BIGINT) AS span
        FROM o GROUP BY 1)
SELECT CAST(CASE WHEN span > 0 THEN least(u * 10 // span, 10)
            ELSE 10 END AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(u) AS BIGINT) AS sum_union_us,
       CAST(sum(span) AS BIGINT) AS sum_span_us
FROM per GROUP BY 1 ORDER BY decile
"""

ORACLE_SQL["item_cf_topk"] = """
WITH bp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
marg AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM bp GROUP BY 1),
anchors AS (SELECT p, c FROM marg ORDER BY c DESC, p LIMIT 20),
pairs AS (SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS n
          FROM bp a JOIN bp b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2),
dir AS (SELECT pa AS part, pb AS nbr, n FROM pairs
        UNION ALL SELECT pb, pa, n FROM pairs),
sc AS (SELECT d.part, d.nbr, d.n AS n_co,
              d.n * d.n * 1000000 // (am.c * m.c) AS cos2_ppm
       FROM dir d JOIN anchors am ON am.p = d.part
       JOIN marg m ON m.p = d.nbr),
rk AS (SELECT *, row_number() OVER (PARTITION BY part
                 ORDER BY cos2_ppm DESC, nbr) AS rnk FROM sc)
SELECT CAST(part AS BIGINT) AS part, CAST(nbr AS BIGINT) AS nbr,
       n_co, CAST(cos2_ppm AS BIGINT) AS cos2_ppm,
       CAST(rnk AS BIGINT) AS rnk
FROM rk WHERE rnk <= 5 ORDER BY part, rnk
"""

ORACLE_SQL["kg_widest_path"] = _dict_oracle.widest_sql(n_seeds=4,
                                                       max_hops=4)

ORACLE_SQL["lang_confusion"] = r"""
WITH c AS (SELECT lang,
                  array_length(regexp_extract_all(text,
                      '\b(the|of|and)\b')) AS n_en,
                  array_length(regexp_extract_all(text,
                      '\b(der|die|und)\b')) AS n_de,
                  array_length(regexp_extract_all(text,
                      '\b(el|la|los)\b')) AS n_es
           FROM documents),
p AS (SELECT lang,
             CASE WHEN n_en >= n_de AND n_en >= n_es AND n_en > 0
                  THEN 'en'
                  WHEN n_de >= n_es AND n_de > 0 THEN 'de'
                  WHEN n_es > 0 THEN 'es' ELSE 'unk' END AS pred_lang
      FROM c),
m AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM p GROUP BY 1, 2)
SELECT lang, pred_lang, n_docs,
       CAST(n_docs * 1000000 //
            sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)
           AS share_ppm
FROM m ORDER BY lang, pred_lang
"""


def q_bipartite_butterflies(sf_dir: str):
    """Butterfly (4-cycle) census of the part–supplier bipartite
    graph — THE bipartite cohesion statistic (Sanei-Mehri et al.,
    KDD'18): wedges = Σ_p C(suppliers(p), 2), butterflies =
    Σ_{supplier pairs} C(shared_parts, 2).  One row: (n_parts,
    n_suppliers, n_adj, n_wedges, n_butterflies).

    Scale plan: distinct (part, supp) via one pair exchange; wedge
    counts are per-part bounded partials; supplier-pair shared-part
    counts ride the market-basket ``cooccur_pairs_ds`` exchange
    (quadratic only in suppliers-per-part, the bounded catalog
    fan-out); every fold after that is scalar."""
    from ray.data.aggregate import Count, Sum

    from kgforge.functions.graph import cooccur_pairs_ds

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def dpair(b: pa.Table) -> pa.Table:
        return b.group_by(["l_partkey", "l_suppkey"],
                          use_threads=False).aggregate([])

    dp = li.map_batches(dpair, batch_format="pyarrow") \
        .groupby(["l_partkey", "l_suppkey"]) \
        .aggregate(Count(alias_name="__c"))

    def per_part(b: pa.Table) -> pa.Table:
        g = b.select(["l_partkey"]).group_by(
            ["l_partkey"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"p": g["l_partkey"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    # a part's rows may straddle groupby output blocks → per-part
    # counts need their own keyed sum before the wedge fold
    def wedge_fold(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "n_parts": pa.array([len(c)], pa.int64()),
            "n_adj": pa.array([int(c.sum())], pa.int64()),
            "wedges": pa.array([int((c * (c - 1) // 2).sum())],
                               pa.int64())})

    pp = dp.map_batches(per_part, batch_format="pyarrow") \
        .groupby("p").aggregate(Sum("c", alias_name="c")) \
        .map_batches(wedge_fold, batch_format="pyarrow").to_pandas()

    def supp_partial(b: pa.Table) -> pa.Table:
        u = b["l_suppkey"].combine_chunks().unique()
        return pa.table({"s": u})

    ns = dp.map_batches(supp_partial, batch_format="pyarrow") \
        .groupby("s").aggregate(Count(alias_name="__c")) \
        .count()

    pairs = cooccur_pairs_ds(li, ["l_partkey"], "l_suppkey")

    def bf_partial(b: pa.Table) -> pa.Table:
        n = pc.cast(b["n_groups"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"bf": pa.array(
            [int((n * (n - 1) // 2).sum())], pa.int64())})

    bf = pairs.map_batches(bf_partial, batch_format="pyarrow") \
        .to_pandas()
    return pa.table({
        "n_parts": pa.array([int(pp["n_parts"].sum())], pa.int64()),
        "n_suppliers": pa.array([int(ns)], pa.int64()),
        "n_adj": pa.array([int(pp["n_adj"].sum())], pa.int64()),
        "n_wedges": pa.array([int(pp["wedges"].sum())], pa.int64()),
        "n_butterflies": pa.array([int(bf["bf"].sum())], pa.int64())})


def q_knn_purity(sf_dir: str):
    """Leave-one-out 1-NN label purity per label over the embedding
    table (queries = the 1000 smallest vec_ids, neighbors = the full
    corpus): the cheap clusterability probe before anyone trains a
    classifier.  (label, n_queries, n_correct, purity_ppm), label ASC.

    Scale plan: rides :func:`kgforge.functions.simsearch.knn_brute_ds`
    (broadcast query matrix, per-batch partial top-k, Q×k driver
    merge); the label attach is an ``is_in``-pruned stream over the
    bounded involved-id set, never a corpus join."""
    import pyarrow.dataset as pds

    from kgforge.functions.simsearch import knn_brute_ds

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qids = [r["vec_id"] for r in
            _read(sf_dir, "embeddings", ["vec_id"],
                  row_filter=(pds.field("vec_id") < 1000))
            .take_all()]
    nn = knn_brute_ds(emb, qids, k=1).to_pandas()

    involved = pa.array(sorted({*nn["query_id"].tolist(),
                                *nn["neighbor_id"].tolist()}),
                        pa.int64())

    def lab(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["vec_id"], value_set=involved)
        return b.filter(m)

    lt = _read(sf_dir, "embeddings", ["vec_id", "label"]) \
        .map_batches(lab, batch_format="pyarrow").to_pandas()
    label_of = dict(zip(lt["vec_id"].astype(int),
                        lt["label"].astype(int)))
    census: dict = {}
    for q, nb in zip(nn["query_id"].astype(int),
                     nn["neighbor_id"].astype(int)):
        lq = label_of[q]
        n, ok = census.get(lq, (0, 0))
        census[lq] = (n + 1, ok + (label_of[nb] == lq))
    ks = sorted(census)
    return pa.table({
        "label": pa.array(ks, pa.int64()),
        "n_queries": pa.array([census[k][0] for k in ks], pa.int64()),
        "n_correct": pa.array([census[k][1] for k in ks], pa.int64()),
        "purity_ppm": pa.array(
            [census[k][1] * 1_000_000 // census[k][0] for k in ks],
            pa.int64())})


def q_psi_value_drift(sf_dir: str):
    """Population-Stability-Index drift of the event value
    distribution between the even/odd ``event_id`` parity halves,
    per event type over 10 fixed-width value bins ([0,50) … [450,∞)):
    ``psi_micro = Σ_bins (p_ppm − q_ppm)·(L(p_ppm) − L(q_ppm)) //
    10⁶`` on the shared ``L(x) = round(ln(x)·10⁶)`` grid, bins where
    either half is empty skipped (the exact-integer form of the
    ε-padded industry PSI).  (event_type, n_even, n_odd, psi_micro),
    type ASC.

    Scale plan: one (type × bin × parity)-bounded pre-aggregated
    groupby; the PSI fold is a ≤ types×10-row driver pass."""
    import math

    from ray.data.aggregate import Sum

    def tag(b: pa.Table) -> pa.Table:
        v = pc.cast(b["value"], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        bins = np.minimum((v // 50.0).astype(np.int64), 9)
        par = pc.cast(b["event_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False) % 2
        t = pa.table({"et": b["event_type"],
                      "bin": pa.array(bins),
                      "par": pa.array(par),
                      "n": pa.array(np.ones(len(v), np.int64))})
        g = t.group_by(["et", "bin", "par"],
                       use_threads=False).aggregate([("n", "sum")])
        return pa.table({"et": g["et"], "bin": g["bin"],
                         "par": g["par"], "n": g["n_sum"]})

    cells = _read(sf_dir, "events", ["event_id", "event_type",
                                     "value"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby(["et", "bin", "par"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    per: dict = {}
    for _, r in cells.iterrows():
        et, b_, p_, n = r["et"], int(r["bin"]), int(r["par"]), \
            int(r["n"])
        d = per.setdefault(et, {})
        d[(b_, p_)] = n
    out = []
    for et in sorted(per):
        d = per[et]
        n_even = sum(v for (b_, p_), v in d.items() if p_ == 0)
        n_odd = sum(v for (b_, p_), v in d.items() if p_ == 1)
        acc = 0
        for b_ in range(10):
            ce, co = d.get((b_, 0), 0), d.get((b_, 1), 0)
            if ce > 0 and co > 0:
                p_ppm = ce * 1_000_000 // n_even
                q_ppm = co * 1_000_000 // n_odd
                if p_ppm > 0 and q_ppm > 0:
                    acc += (p_ppm - q_ppm) * (L(p_ppm) - L(q_ppm))
        out.append((et, n_even, n_odd, acc // 1_000_000))
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "n_even": pa.array([r[1] for r in out], pa.int64()),
        "n_odd": pa.array([r[2] for r in out], pa.int64()),
        "psi_micro": pa.array([r[3] for r in out], pa.int64())})


QUERIES["bipartite_butterflies"] = q_bipartite_butterflies
QUERIES["knn_purity"] = q_knn_purity
QUERIES["psi_value_drift"] = q_psi_value_drift

ORACLE_SQL["bipartite_butterflies"] = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
            FROM lineitem),
wp AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM ps GROUP BY 1),
spairs AS (SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS n
           FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
           GROUP BY 1, 2)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM wp) AS n_parts,
       (SELECT CAST(count(DISTINCT s) AS BIGINT) FROM ps)
           AS n_suppliers,
       (SELECT CAST(count(*) AS BIGINT) FROM ps) AS n_adj,
       (SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT)
        FROM wp) AS n_wedges,
       (SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT)
        FROM spairs) AS n_butterflies
"""

ORACLE_SQL["knn_purity"] = """
WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                  CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 1000),
s AS (SELECT q.vec_id AS qid, q.label AS qlab, e.vec_id AS nid,
             CAST(e.label AS BIGINT) AS nlab,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    q.qe) AS sim
      FROM embeddings e, q WHERE e.vec_id <> q.vec_id),
r AS (SELECT qid, qlab, nlab,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sim DESC, nid) AS rk
      FROM s)
SELECT qlab AS label,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(count(*) FILTER (WHERE nlab = qlab) AS BIGINT)
           AS n_correct,
       CAST(count(*) FILTER (WHERE nlab = qlab) * 1000000 // count(*)
            AS BIGINT) AS purity_ppm
FROM r WHERE rk = 1 GROUP BY 1 ORDER BY label
"""

ORACLE_SQL["psi_value_drift"] = """
WITH c AS (SELECT event_type AS et,
                  least(CAST(floor(value / 50) AS BIGINT), 9) AS bin,
                  CAST(event_id % 2 AS BIGINT) AS par,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2, 3),
tot AS (SELECT et,
               CAST(coalesce(sum(n) FILTER (WHERE par = 0), 0)
                    AS BIGINT) AS n_even,
               CAST(coalesce(sum(n) FILTER (WHERE par = 1), 0)
                    AS BIGINT) AS n_odd
        FROM c GROUP BY 1),
cells AS (SELECT e.et, e.bin,
                 e.n * 1000000 // t.n_even AS p_ppm,
                 o.n * 1000000 // t.n_odd AS q_ppm
          FROM c e JOIN c o ON o.et = e.et AND o.bin = e.bin
                           AND e.par = 0 AND o.par = 1
          JOIN tot t ON t.et = e.et),
terms AS (SELECT et,
                 (p_ppm - q_ppm) *
                 (CAST(floor(ln(p_ppm) * 1000000 + 0.5) AS BIGINT)
                  - CAST(floor(ln(q_ppm) * 1000000 + 0.5) AS BIGINT))
                     AS term
          FROM cells WHERE p_ppm > 0 AND q_ppm > 0)
SELECT t.et AS event_type, t.n_even, t.n_odd,
       CAST(coalesce(sum(term), 0) // 1000000 AS BIGINT) AS psi_micro
FROM tot t LEFT JOIN terms x ON x.et = t.et
GROUP BY 1, 2, 3 ORDER BY event_type
"""


def q_kg_scc_seeds(sf_dir: str):
    """Bounded-hop SCC membership of the 4 smallest entity nodes over
    the DIRECTED entity graph — see
    :func:`kgforge.functions.graph.mutual_reach_ds`."""
    from kgforge.functions.graph import mutual_reach_ds

    return mutual_reach_ds(_entity_edges_for(sf_dir), n_seeds=4,
                           max_hops=4)


def q_markov_absorption(sf_dir: str):
    """K-step absorption probability into the ``purchase`` state of
    the per-user event-type Markov chain: ``p_K(s)`` = probability a
    chain at state s reaches purchase within K=4 steps (purchase
    absorbing), exact integer ppm with floor at every multiply —
    the conversion-potential score per current state.  (event_type,
    reach_ppm), type ASC.

    Scale plan: transition counts ride the
    :func:`kgforge.functions.events.event_transitions_ds` exchange
    (type²-bounded); the K iterations fold on the ≤|types|² driver
    matrix."""
    tm = q_event_transitions(sf_dir).to_pandas()

    c: dict = {}
    rs: dict = {}
    states = set()
    for _, r in tm.iterrows():
        c[(r["prev_type"], r["next_type"])] = int(r["n"])
        rs[r["prev_type"]] = rs.get(r["prev_type"], 0) + int(r["n"])
        states.add(r["prev_type"])
        states.add(r["next_type"])
    ks = sorted(states)
    p = {s: 1_000_000 if s == "purchase" else 0 for s in ks}
    for _ in range(4):
        p = {s: 1_000_000 if s == "purchase" else
             (sum(c.get((s, t), 0) * p[t] for t in ks) // rs[s]
              if rs.get(s) else 0)
             for s in ks}
    return pa.table({
        "event_type": pa.array(ks, pa.string()),
        "reach_ppm": pa.array([p[s] for s in ks], pa.int64())})


def q_ipf_allocation(sf_dir: str):
    """Two-round iterative proportional fitting (raking) of the
    (customer nation × order year) revenue-cents matrix onto uniform
    row/column targets — the survey-statistics / data-harmonization
    allocation operator, exact integers (floor at each scale).
    (nationkey, o_year, cents_raw, cents_raked), nation/year ASC.

    Scale plan: per-batch (custkey, year) revenue partials → one
    keyed sum, one shuffle join to the customer dimension, one
    (nation × year)-bounded groupby; both IPF rounds fold on the
    ≤ 25×years driver matrix."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import shuffle_join_ds

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({
            "ck": b["o_custkey"],
            "y": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                pc.cast(b["o_totalprice"], pa.float64()), 100.0)),
                pa.int64())})
        g = t.group_by(["ck", "y"], use_threads=False) \
            .aggregate([("cents", "sum")])
        return pa.table({"ck": g["ck"], "y": g["y"],
                         "cents": g["cents_sum"]})

    per_cy = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby(["ck", "y"]).aggregate(Sum("cents",
                                            alias_name="cents"))

    joined = shuffle_join_ds(
        per_cy, _read(sf_dir, "customer",
                      ["c_custkey", "c_nationkey"]),
        on_left="ck", on_right="c_custkey",
        left_cols=["y", "cents"], right_cols=["c_nationkey"])

    def cell(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_nationkey", "y"],
                       use_threads=False).aggregate([("cents",
                                                      "sum")])
        return pa.table({"nk": g["c_nationkey"], "y": g["y"],
                         "cents": g["cents_sum"]})

    x0 = joined.map_batches(cell, batch_format="pyarrow") \
        .groupby(["nk", "y"]).aggregate(Sum("cents",
                                            alias_name="cents")) \
        .to_pandas()

    nk = x0["nk"].to_numpy(np.int64)
    yy = x0["y"].to_numpy(np.int64)
    v0 = x0["cents"].to_numpy(np.int64)
    tot = int(v0.sum())
    t_row = tot // len(np.unique(nk))
    t_col = tot // len(np.unique(yy))
    # python-int arithmetic: cents × target products overflow int64
    row_sum = {k: int(v0[nk == k].sum()) for k in np.unique(nk)}
    v1 = np.array([int(v) * t_row // max(row_sum[k], 1)
                   for v, k in zip(v0, nk)], dtype=np.int64)
    col_sum = {k: int(v1[yy == k].sum()) for k in np.unique(yy)}
    v2 = np.array([int(v) * t_col // max(col_sum[k], 1)
                   for v, k in zip(v1, yy)], dtype=np.int64)
    order = np.lexsort((yy, nk))
    return pa.table({
        "nationkey": pa.array(nk[order], pa.int64()),
        "o_year": pa.array(yy[order], pa.int64()),
        "cents_raw": pa.array(v0[order], pa.int64()),
        "cents_raked": pa.array(v2[order], pa.int64())})


QUERIES["kg_scc_seeds"] = q_kg_scc_seeds
QUERIES["markov_absorption"] = q_markov_absorption
QUERIES["ipf_allocation"] = q_ipf_allocation

ORACLE_SQL["kg_scc_seeds"] = _dict_oracle.mutual_reach_sql(
    n_seeds=4, max_hops=4)

_MABS_STEP = """,
mp{next} AS (SELECT st.et,
            CAST(CASE WHEN st.et = 'purchase' THEN 1000000
                 ELSE coalesce(
                     (SELECT sum(c.n * p.p) FROM mc c
                      JOIN mp{prev} p ON p.et = c.nxt
                      WHERE c.et = st.et), 0)
                 // coalesce((SELECT rs FROM mr
                              WHERE mr.et = st.et), 1)
                 END AS BIGINT) AS p
     FROM mst st)"""

ORACLE_SQL["markov_absorption"] = """
WITH s AS (SELECT event_type AS et,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                      AS nxt
           FROM events),
mc AS (SELECT et, nxt, CAST(count(*) AS BIGINT) AS n
       FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
mr AS (SELECT et, CAST(sum(n) AS BIGINT) AS rs FROM mc GROUP BY 1),
mst AS (SELECT DISTINCT et FROM (
          SELECT et FROM mc UNION ALL SELECT nxt FROM mc)),
mp0 AS (SELECT et, CAST(CASE WHEN et = 'purchase' THEN 1000000
                        ELSE 0 END AS BIGINT) AS p
        FROM mst)""" + "".join(
    _MABS_STEP.format(prev=i, next=i + 1) for i in range(4)) + """
SELECT et AS event_type, p AS reach_ppm FROM mp4 ORDER BY event_type
"""

ORACLE_SQL["ipf_allocation"] = """
WITH j AS (SELECT c_nationkey AS nk,
                  CAST(year(o_orderdate) AS BIGINT) AS y,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT)
                      AS cents
           FROM orders JOIN customer ON c_custkey = o_custkey),
x0 AS (SELECT nk, y, CAST(sum(cents) AS BIGINT) AS v
       FROM j GROUP BY 1, 2),
t AS (SELECT CAST(sum(v) AS BIGINT) AS tot,
             CAST(count(DISTINCT nk) AS BIGINT) AS nr,
             CAST(count(DISTINCT y) AS BIGINT) AS nc
      FROM x0),
x1 AS (SELECT nk, y, v,
              CAST(v AS HUGEINT) * (SELECT tot // nr FROM t)
              // greatest(sum(v) OVER (PARTITION BY nk), 1) AS v1
       FROM x0),
x2 AS (SELECT nk, y, v, v1,
              CAST(v1 AS HUGEINT) * (SELECT tot // nc FROM t)
              // greatest(sum(v1) OVER (PARTITION BY y), 1) AS v2
       FROM x1)
SELECT CAST(nk AS BIGINT) AS nationkey, y AS o_year,
       v AS cents_raw, CAST(v2 AS BIGINT) AS cents_raked
FROM x2 ORDER BY nationkey, o_year
"""


def q_golden_record(sf_dir: str):
    """Survivorship / golden-record merge over prefix-16 blocked
    record families (MDM blocking on the first 16 characters, the
    template-family key): for every block with ≥ 2 members, the
    surviving id (min doc_id) plus field-level merge rules — distinct
    source count, canonical source (min), distinct lang count,
    canonical lang (min).  (block_key, keep_id, n_members,
    n_sources, canon_source, n_langs, canon_lang), key ASC.

    Scale plan: ONE block-keyed exchange of (key, id, source, lang)
    rows (full text never shuffles); per-block merges are vectorized
    arrow group_by aggregates; output schema is pinned so the
    zero-duplicate case still types."""
    def block(b: pa.Table) -> pa.Table:
        return pa.table({
            "block_key": pc.utf8_slice_codeunits(b["text"], 0, 16),
            "doc_id": b["doc_id"], "source": b["source"],
            "lang": b["lang"]})

    rows = _read(sf_dir, "documents",
                 ["doc_id", "text", "source", "lang"]) \
        .map_batches(block, batch_format="pyarrow")

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["block_key"], use_threads=False) \
            .aggregate([("doc_id", "min"), ("doc_id", "count"),
                        ("source", "count_distinct"),
                        ("source", "min"),
                        ("lang", "count_distinct"), ("lang", "min")])
        g = g.filter(pc.greater(g["doc_id_count"], 1))
        return pa.table({
            "block_key": g["block_key"],
            "keep_id": g["doc_id_min"],
            "n_members": pc.cast(g["doc_id_count"], pa.int64()),
            "n_sources": pc.cast(g["source_count_distinct"],
                                 pa.int64()),
            "canon_source": g["source_min"],
            "n_langs": pc.cast(g["lang_count_distinct"], pa.int64()),
            "canon_lang": g["lang_min"]})

    out = rows.groupby("block_key") \
        .map_groups(merge, batch_format="pyarrow") \
        .sort("block_key").to_pandas()
    return pa.table({
        "block_key": pa.array(out.get("block_key", []), pa.string()),
        "keep_id": pa.array(out.get("keep_id", []), pa.int64()),
        "n_members": pa.array(out.get("n_members", []), pa.int64()),
        "n_sources": pa.array(out.get("n_sources", []), pa.int64()),
        "canon_source": pa.array(out.get("canon_source", []),
                                 pa.string()),
        "n_langs": pa.array(out.get("n_langs", []), pa.int64()),
        "canon_lang": pa.array(out.get("canon_lang", []),
                               pa.string())})


def q_triplet_margin(sf_dir: str):
    """Triplet-margin QA census of the embedding space: for every
    anchor (vec_id < 500) with a same-label successor, pos = the
    next same-label id, neg = the first id of the cyclically next
    EXISTING label; a violation is cos(a, pos) ≤ cos(a, neg).
    (label, n_triplets, n_violations, viol_ppm), label ASC — the
    metric-learning sanity check (do labels beat a fixed impostor?).

    Scale plan: pos ids ride ONE label-hash exchange (sorted shift,
    no pairs); negs are an L-bounded first-id table; the cosine
    fold touches only the ≤ 3×|anchors| gathered vectors."""
    from ray.data.aggregate import Min

    from kgforge.functions.joins import _part_codes

    P = 32

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({"vec_id": b["vec_id"],
                      "label": pc.cast(b["label"], pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t["label"], P)))

    def succ(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("label", "ascending"),
                                            ("vec_id", "ascending")])
        t = t.take(idx)
        lab = t["label"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        vid = t["vec_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        n = len(lab)
        if n == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "pos_id": pa.array([], pa.int64())})
        ok = np.zeros(n, dtype=bool)
        if n > 1:
            ok[:-1] = lab[1:] == lab[:-1]
        keep = ok & (vid < 500)
        return pa.table({
            "vec_id": pa.array(vid[keep], pa.int64()),
            "label": pa.array(lab[keep], pa.int64()),
            "pos_id": pa.array(np.roll(vid, -1)[keep], pa.int64())})

    ids = _read(sf_dir, "embeddings", ["vec_id", "label"])
    trip = ids.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(succ, batch_format="pyarrow") \
        .to_pandas()

    firsts = ids.map_batches(tag, batch_format="pyarrow") \
        .groupby("label").aggregate(Min("vec_id",
                                        alias_name="first_id")) \
        .to_pandas()
    labs = sorted(firsts["label"].astype(int))
    first_of = dict(zip(firsts["label"].astype(int),
                        firsts["first_id"].astype(int)))

    def cyc_next(lab: int) -> int:
        bigger = [l for l in labs if l > lab]
        return bigger[0] if bigger else labs[0]

    trip = trip.sort_values("vec_id")
    neg_ids = [first_of[cyc_next(int(l))] for l in trip["label"]]

    need = sorted({*trip["vec_id"].astype(int),
                   *trip["pos_id"].astype(int), *neg_ids})
    need_arr = pa.array(need, pa.int64())

    def gather(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["vec_id"], value_set=need_arr))

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .map_batches(gather, batch_format="pyarrow").to_pandas()
    vec_of = {int(i): np.asarray(e, dtype=np.float64)
              for i, e in zip(emb["vec_id"], emb["embedding"])}

    def cos(a, b):
        return float(np.dot(a, b) /
                     (np.linalg.norm(a) * np.linalg.norm(b)))

    census: dict = {}
    for (_, r), nid in zip(trip.iterrows(), neg_ids):
        a = vec_of[int(r["vec_id"])]
        sp = cos(a, vec_of[int(r["pos_id"])])
        sn = cos(a, vec_of[nid])
        n, v = census.get(int(r["label"]), (0, 0))
        census[int(r["label"])] = (n + 1, v + (sp <= sn))
    ks = sorted(census)
    return pa.table({
        "label": pa.array(ks, pa.int64()),
        "n_triplets": pa.array([census[k][0] for k in ks],
                               pa.int64()),
        "n_violations": pa.array([census[k][1] for k in ks],
                                 pa.int64()),
        "viol_ppm": pa.array(
            [census[k][1] * 1_000_000 // census[k][0] for k in ks],
            pa.int64())})


def q_quantile_norm(sf_dir: str):
    """Quantile-normalization mapping census: each document's
    within-SOURCE length-rank decile ``(rn−1)·10 // cnt`` paired
    with the GLOBAL decile-midpoint length it would be mapped to
    (exact quantile rule ``value at floor((N−1)·(2d+1)/20)`` of the
    (n_chars, doc_id) order) — the cross-source distribution
    harmonization step.  (source, decile, n_docs, sum_chars,
    global_q_chars), source/decile ASC.

    Scale plan: global midpoints come from a (value, count)
    HISTOGRAM fold (distinct lengths, never rows); ranks ride ONE
    source-hash exchange with a vectorized per-run row_number."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    P = 32

    hist = _read(sf_dir, "documents", ["n_chars"]) \
        .map_batches(
            lambda b: b.group_by(["n_chars"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["n_chars", "n"]),
            batch_format="pyarrow") \
        .groupby("n_chars").aggregate(Sum("n", alias_name="n")) \
        .to_pandas().sort_values("n_chars")
    vals = hist["n_chars"].to_numpy(np.int64)
    cnts = hist["n"].to_numpy(np.int64)
    N = int(cnts.sum())
    cum = np.cumsum(cnts)
    gq = {d: int(vals[np.searchsorted(
        cum, (N - 1) * (2 * d + 1) // 20 + 1)]) for d in range(10)}

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b["source"],
                      "nc": pc.cast(b["n_chars"], pa.int64()),
                      "doc_id": b["doc_id"]})
        return t.append_column(
            "__p", pa.array(_part_codes(t["source"], P)))

    def census(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("source", "ascending"), ("nc", "ascending"),
            ("doc_id", "ascending")])
        t = t.take(idx)
        src = t["source"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        nc = t["nc"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(src)
        if n == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "decile": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "sum_chars": pa.array([], pa.int64())})
        brk = np.ones(n, dtype=bool)
        brk[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, n))
        rn = np.arange(n) - np.repeat(starts, lens)
        cnt = np.repeat(lens, lens)
        dec = rn * 10 // cnt
        g = pa.table({"source": t["source"],
                      "decile": pa.array(dec.astype(np.int64)),
                      "n_docs": pa.array(np.ones(n, np.int64)),
                      "sum_chars": pa.array(nc)}) \
            .group_by(["source", "decile"],
                      use_threads=False).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")])
        return g.rename_columns(["source", "decile", "n_docs",
                                 "sum_chars"])

    agg = _read(sf_dir, "documents", ["doc_id", "source",
                                      "n_chars"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(census, batch_format="pyarrow") \
        .groupby(["source", "decile"]).aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars")) \
        .to_pandas().sort_values(["source", "decile"])
    return pa.table({
        "source": pa.array(agg["source"].tolist(), pa.string()),
        "decile": pa.array(agg["decile"].to_numpy(np.int64)),
        "n_docs": pa.array(agg["n_docs"].to_numpy(np.int64)),
        "sum_chars": pa.array(agg["sum_chars"].to_numpy(np.int64)),
        "global_q_chars": pa.array(
            [gq[int(d)] for d in agg["decile"]], pa.int64())})


QUERIES["golden_record"] = q_golden_record
QUERIES["triplet_margin"] = q_triplet_margin
QUERIES["quantile_norm"] = q_quantile_norm

ORACLE_SQL["golden_record"] = """
WITH g AS (SELECT substring(text, 1, 16) AS block_key,
                  CAST(min(doc_id) AS BIGINT) AS keep_id,
                  CAST(count(*) AS BIGINT) AS n_members,
                  CAST(count(DISTINCT source) AS BIGINT)
                      AS n_sources,
                  min(source) AS canon_source,
                  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                  min(lang) AS canon_lang
           FROM documents GROUP BY 1)
SELECT * FROM g WHERE n_members > 1 ORDER BY block_key
"""

ORACLE_SQL["triplet_margin"] = """
WITH a AS (SELECT vec_id, CAST(label AS BIGINT) AS lab,
                  CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
anch AS (SELECT * FROM a WHERE vec_id < 500),
pos AS (SELECT an.vec_id, an.lab, min(o.vec_id) AS pid
        FROM anch an JOIN a o ON o.lab = an.lab
                             AND o.vec_id > an.vec_id
        GROUP BY 1, 2),
labs AS (SELECT lab, CAST(min(vec_id) AS BIGINT) AS fid
         FROM a GROUP BY 1),
trip AS (SELECT p.vec_id, p.lab, p.pid,
                (SELECT fid FROM labs
                 WHERE lab = coalesce(
                     (SELECT min(l2.lab) FROM labs l2
                      WHERE l2.lab > p.lab),
                     (SELECT min(l3.lab) FROM labs l3))) AS nid
         FROM pos p),
sc AS (SELECT t.lab,
              CASE WHEN list_cosine_similarity(pe.e, ae.e) <=
                        list_cosine_similarity(ne.e, ae.e)
                   THEN 1 ELSE 0 END AS viol
       FROM trip t
       JOIN a ae ON ae.vec_id = t.vec_id
       JOIN a pe ON pe.vec_id = t.pid
       JOIN a ne ON ne.vec_id = t.nid)
SELECT lab AS label, CAST(count(*) AS BIGINT) AS n_triplets,
       CAST(sum(viol) AS BIGINT) AS n_violations,
       CAST(sum(viol) * 1000000 // count(*) AS BIGINT) AS viol_ppm
FROM sc GROUP BY 1 ORDER BY label
"""

ORACLE_SQL["quantile_norm"] = """
WITH d AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS nc
           FROM documents),
g AS (SELECT nc, row_number() OVER (ORDER BY nc, doc_id) AS rn
      FROM d),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
gq AS (SELECT dd.d,
              (SELECT nc FROM g
               WHERE rn = 1 + ((SELECT n FROM nn) - 1)
                     * (2 * dd.d + 1) // 20) AS qv
       FROM generate_series(0, 9) dd(d)),
s AS (SELECT source, nc,
             (row_number() OVER (PARTITION BY source
                                 ORDER BY nc, doc_id) - 1) * 10
             // count(*) OVER (PARTITION BY source) AS dec
      FROM d),
sc AS (SELECT source, CAST(dec AS BIGINT) AS decile,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(nc) AS BIGINT) AS sum_chars
       FROM s GROUP BY 1, 2)
SELECT source, decile, n_docs, sum_chars,
       (SELECT CAST(qv AS BIGINT) FROM gq WHERE gq.d = sc.decile)
           AS global_q_chars
FROM sc ORDER BY source, decile
"""


def q_isotonic_return_rate(sf_dir: str):
    """Isotonic (monotone non-decreasing) calibration of the return
    rate as a function of discount level, via the exact max–min
    closed form of PAVA on the shared micro grid: ``iso[i] =
    max_{j≤i} min_{k≥i} rate_micro(j..k)`` with ``rate_micro(j..k)
    = Σret·10⁶ // Σn`` (floored pool averages — the quantized
    isotonic fit both engines define identically).  (discount_cents,
    n, n_returned, raw_ppm, iso_ppm), discount ASC.

    Scale plan: ONE (discount-level)-bounded pre-aggregated groupby
    (11 cells); the O(levels³) closed form folds on the driver."""
    from ray.data.aggregate import Sum

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({
            "d": pc.cast(pc.round(pc.multiply(
                pc.cast(b["l_discount"], pa.float64()), 100.0)),
                pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "r": pc.cast(pc.equal(b["l_returnflag"], "R"),
                         pa.int64())})
        g = t.group_by(["d"], use_threads=False).aggregate(
            [("n", "sum"), ("r", "sum")])
        return pa.table({"d": g["d"], "n": g["n_sum"],
                         "r": g["r_sum"]})

    lv = _read(sf_dir, "lineitem", ["l_discount", "l_returnflag"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("d").aggregate(Sum("n", alias_name="n"),
                                Sum("r", alias_name="r")) \
        .to_pandas().sort_values("d")
    d = lv["d"].to_numpy(np.int64)
    n = lv["n"].to_numpy(np.int64)
    r = lv["r"].to_numpy(np.int64)
    L = len(d)
    cn = np.concatenate([[0], np.cumsum(n)])
    cr = np.concatenate([[0], np.cumsum(r)])

    def rate(j, k):           # pool average over levels j..k, micro
        return int(cr[k + 1] - cr[j]) * 1_000_000 \
            // int(cn[k + 1] - cn[j])

    iso = [max(min(rate(j, k) for k in range(i, L))
               for j in range(i + 1))
           for i in range(L)]
    return pa.table({
        "discount_cents": pa.array(d, pa.int64()),
        "n": pa.array(n, pa.int64()),
        "n_returned": pa.array(r, pa.int64()),
        "raw_ppm": pa.array(r * 1_000_000 // n, pa.int64()),
        "iso_ppm": pa.array(iso, pa.int64())})


def q_leadlag_xcorr(sf_dir: str):
    """Lead–lag finder between the hourly ``view`` and ``purchase``
    count series: for every lag in [−12, 12] hours the exact-integer
    centered cross-score ``L·Σ a(h)·b(h+lag) − Σa·Σb`` over the
    overlap window (missing hours count 0, L = span − |lag|), plus
    the argmax flag — does purchasing trail browsing, and by how
    many hours?  (lag_hours, score, n_overlap_hours, is_best),
    lag ASC; best = max score, tie → smallest lag.

    Scale plan: per-batch (hour, type) partials → one hours-bounded
    groupby; the 25-lag scan folds on the driver series."""
    from ray.data.aggregate import Sum

    ta, tb = "view", "purchase"

    def tag(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"],
                     value_set=pa.array([ta, tb]))
        sub = b.filter(m)
        t = pa.table({
            "h": pc.cast(pc.floor(pc.divide(pc.cast(pc.cast(
                sub["ts"], pa.timestamp("us")), pa.int64()),
                3_600_000_000.0)), pa.int64()),
            "et": sub["event_type"],
            "n": pa.array(np.ones(sub.num_rows, np.int64))})
        g = t.group_by(["h", "et"], use_threads=False) \
            .aggregate([("n", "sum")])
        return pa.table({"h": g["h"], "et": g["et"],
                         "n": g["n_sum"]})

    hh = _read(sf_dir, "events", ["ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby(["h", "et"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    hmin, hmax = int(hh["h"].min()), int(hh["h"].max())
    H = hmax - hmin + 1
    a = np.zeros(H, dtype=np.int64)
    b_ = np.zeros(H, dtype=np.int64)
    for _, row in hh.iterrows():
        (a if row["et"] == ta else b_)[int(row["h"]) - hmin] += \
            int(row["n"])
    out = []
    for lag in range(-12, 13):
        Lw = H - abs(lag)
        if Lw <= 0:
            out.append((lag, 0, 0))
            continue
        if lag >= 0:
            av, bv = a[:H - lag], b_[lag:]
        else:
            av, bv = a[-lag:], b_[:H + lag]
        score = Lw * int(np.dot(av, bv)) \
            - int(av.sum()) * int(bv.sum())
        out.append((lag, score, Lw))
    best = max(out, key=lambda t: (t[1], -t[0]))[0]
    return pa.table({
        "lag_hours": pa.array([o[0] for o in out], pa.int64()),
        "score": pa.array([o[1] for o in out], pa.int64()),
        "n_overlap_hours": pa.array([o[2] for o in out],
                                    pa.int64()),
        "is_best": pa.array([int(o[0] == best) for o in out],
                            pa.int64())})


def q_l_diversity(sf_dir: str):
    """l-diversity census of the orders table under the
    quasi-identifier (order priority, order year) with sensitive
    attribute order status: per group l = distinct sensitive values;
    output the census by l — how many QI groups (and rows) are
    protected at each diversity level.  (l_distinct, n_groups,
    n_rows), l ASC — k_anonymity's sibling audit.

    Scale plan: (prio × year × status)-bounded pre-aggregated
    groupby, then two driver-bounded folds."""
    from ray.data.aggregate import Sum

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({
            "pr": b["o_orderpriority"],
            "y": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            "st": b["o_orderstatus"],
            "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["pr", "y", "st"], use_threads=False) \
            .aggregate([("n", "sum")])
        return pa.table({"pr": g["pr"], "y": g["y"], "st": g["st"],
                         "n": g["n_sum"]})

    cells = _read(sf_dir, "orders",
                  ["o_orderpriority", "o_orderdate",
                   "o_orderstatus"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby(["pr", "y", "st"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    per: dict = {}
    for _, row in cells.iterrows():
        k = (row["pr"], int(row["y"]))
        l_, nr = per.get(k, (0, 0))
        per[k] = (l_ + 1, nr + int(row["n"]))
    census: dict = {}
    for l_, nr in per.values():
        g, rr = census.get(l_, (0, 0))
        census[l_] = (g + 1, rr + nr)
    ks = sorted(census)
    return pa.table({
        "l_distinct": pa.array(ks, pa.int64()),
        "n_groups": pa.array([census[k][0] for k in ks], pa.int64()),
        "n_rows": pa.array([census[k][1] for k in ks], pa.int64())})


QUERIES["isotonic_return_rate"] = q_isotonic_return_rate
QUERIES["leadlag_xcorr"] = q_leadlag_xcorr
QUERIES["l_diversity"] = q_l_diversity

ORACLE_SQL["isotonic_return_rate"] = """
WITH lv AS (SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS d,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) FILTER (WHERE l_returnflag = 'R')
                        AS BIGINT) AS r
            FROM lineitem GROUP BY 1),
rk AS (SELECT d, n, r, row_number() OVER (ORDER BY d) AS i,
              count(*) OVER () AS L
       FROM lv),
cum AS (SELECT i, d, n, r,
               sum(n) OVER (ORDER BY i) AS cn,
               sum(r) OVER (ORDER BY i) AS cr
        FROM rk),
pools AS (SELECT j.i AS j, k.i AS k,
                 (k.cr - j.cr + j.r) * 1000000
                 // (k.cn - j.cn + j.n) AS rate
          FROM cum j JOIN cum k ON k.i >= j.i),
inner_min AS (SELECT c.i, p.j,
                     min(p.rate) FILTER (WHERE p.k >= c.i) AS mn
              FROM cum c JOIN pools p ON p.j <= c.i
              GROUP BY 1, 2),
iso AS (SELECT i, max(mn) AS iso_rate FROM inner_min
        WHERE mn IS NOT NULL GROUP BY 1)
SELECT c.d AS discount_cents, c.n, c.r AS n_returned,
       CAST(c.r * 1000000 // c.n AS BIGINT) AS raw_ppm,
       CAST(iso.iso_rate AS BIGINT) AS iso_ppm
FROM cum c JOIN iso ON iso.i = c.i ORDER BY discount_cents
"""

ORACLE_SQL["leadlag_xcorr"] = """
WITH e AS (SELECT CAST(floor(epoch_us(ts) / 3600000000.0)
                       AS BIGINT) AS h,
                  event_type AS et, CAST(count(*) AS BIGINT) AS n
           FROM events WHERE event_type IN ('view', 'purchase')
           GROUP BY 1, 2),
bnd AS (SELECT min(h) AS hmin, max(h) AS hmax,
               max(h) - min(h) + 1 AS hspan
        FROM e),
lags AS (SELECT g.lag FROM generate_series(-12, 12) g(lag)),
prod AS (SELECT l.lag,
                coalesce(sum(av.n * bv.n), 0) AS sab
         FROM lags l
         LEFT JOIN e av ON av.et = 'view'
         LEFT JOIN e bv ON bv.et = 'purchase'
                        AND bv.h = av.h + l.lag
         GROUP BY 1),
sums AS (SELECT l.lag,
                (SELECT coalesce(sum(n), 0) FROM e, bnd
                 WHERE et = 'view'
                   AND h >= hmin + greatest(-l.lag, 0)
                   AND h <= hmax - greatest(l.lag, 0)) AS sa,
                (SELECT coalesce(sum(n), 0) FROM e, bnd
                 WHERE et = 'purchase'
                   AND h >= hmin + greatest(l.lag, 0)
                   AND h <= hmax - greatest(-l.lag, 0)) AS sb
         FROM lags l),
sc AS (SELECT l.lag,
              CAST(CASE WHEN (SELECT hspan FROM bnd)
                             - abs(l.lag) <= 0 THEN 0
                   ELSE ((SELECT hspan FROM bnd) - abs(l.lag))
                        * p.sab - s.sa * s.sb END AS BIGINT)
                  AS score,
              CAST(greatest((SELECT hspan FROM bnd) - abs(l.lag), 0)
                   AS BIGINT) AS n_overlap_hours
       FROM lags l JOIN prod p ON p.lag = l.lag
       JOIN sums s ON s.lag = l.lag),
best AS (SELECT lag FROM sc
         ORDER BY score DESC, lag LIMIT 1)
SELECT lag AS lag_hours, score, n_overlap_hours,
       CAST(CASE WHEN lag = (SELECT lag FROM best)
            THEN 1 ELSE 0 END AS BIGINT) AS is_best
FROM sc ORDER BY lag_hours
"""

ORACLE_SQL["l_diversity"] = """
WITH g AS (SELECT o_orderpriority AS pr,
                  CAST(year(o_orderdate) AS BIGINT) AS y,
                  CAST(count(DISTINCT o_orderstatus) AS BIGINT)
                      AS l,
                  CAST(count(*) AS BIGINT) AS nr
           FROM orders GROUP BY 1, 2)
SELECT l AS l_distinct, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(nr) AS BIGINT) AS n_rows
FROM g GROUP BY 1 ORDER BY l_distinct
"""


def q_calendar_gapfill(sf_dir: str):
    """Calendar-densification census of daily order activity per
    customer nation: over each nation's [first, last] order-day span,
    the active-day count, implicit zero-filled day count, the longest
    zero-day streak and the busiest day's order count — the gap-fill
    / zero-densification ETL step expressed as a census (the dense
    series itself never materializes).  (nationkey, n_days_active,
    n_days_span, n_days_zero, longest_zero_streak, max_daily),
    nation ASC.

    Scale plan: per-batch (custkey, day) partials → one keyed sum,
    one shuffle join to the customer dimension, one (nation ×
    day)-bounded groupby, then a nation-hash partitioned vectorized
    diff fold — zero days are arithmetic (span − active, max gap −
    1), never rows."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes, shuffle_join_ds

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({
            "ck": b["o_custkey"],
            "day": pc.cast(pc.floor(pc.divide(pc.cast(pc.cast(
                b["o_orderdate"], pa.timestamp("us")), pa.int64()),
                86_400_000_000.0)), pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["ck", "day"], use_threads=False) \
            .aggregate([("n", "sum")])
        return pa.table({"ck": g["ck"], "day": g["day"],
                         "n": g["n_sum"]})

    per_cd = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby(["ck", "day"]).aggregate(Sum("n", alias_name="n"))

    joined = shuffle_join_ds(
        per_cd, _read(sf_dir, "customer",
                      ["c_custkey", "c_nationkey"]),
        on_left="ck", on_right="c_custkey",
        left_cols=["day", "n"], right_cols=["c_nationkey"])

    def cell(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_nationkey", "day"],
                       use_threads=False).aggregate([("n", "sum")])
        t = pa.table({"nk": g["c_nationkey"], "day": g["day"],
                      "n": g["n_sum"]})
        return t.append_column(
            "__p", pa.array(_part_codes(t["nk"], 16)))

    def fold(t: pa.Table) -> pa.Table:
        # a (nation, day) cell may straddle blocks → re-sum first
        g = t.group_by(["nk", "day"], use_threads=False) \
            .aggregate([("n", "sum")])
        g = g.sort_by([("nk", "ascending"), ("day", "ascending")])
        nk = g["nk"].combine_chunks().to_numpy(zero_copy_only=False)
        dy = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        n = len(nk)
        if n == 0:
            return pa.table({
                "nationkey": pa.array([], pa.int64()),
                "n_days_active": pa.array([], pa.int64()),
                "n_days_span": pa.array([], pa.int64()),
                "n_days_zero": pa.array([], pa.int64()),
                "longest_zero_streak": pa.array([], pa.int64()),
                "max_daily": pa.array([], pa.int64())})
        brk = np.ones(n, dtype=bool)
        brk[1:] = nk[1:] != nk[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n) - 1
        active = ends - starts + 1
        span = dy[ends] - dy[starts] + 1
        gaps = np.zeros(n, dtype=np.int64)
        if n > 1:
            gaps[1:] = dy[1:] - dy[:-1] - 1
            gaps[starts] = 0
        longest = np.maximum.reduceat(gaps, starts)
        maxd = np.maximum.reduceat(nn, starts)
        return pa.table({
            "nationkey": pa.array(nk[starts], pa.int64()),
            "n_days_active": pa.array(active, pa.int64()),
            "n_days_span": pa.array(span, pa.int64()),
            "n_days_zero": pa.array(span - active, pa.int64()),
            "longest_zero_streak": pa.array(longest, pa.int64()),
            "max_daily": pa.array(maxd, pa.int64())})

    return joined.map_batches(cell, batch_format="pyarrow") \
        .groupby("__p").map_groups(fold, batch_format="pyarrow") \
        .sort("nationkey")


def q_robust_scaler_params(sf_dir: str):
    """Robust-scaler fit over the embedding table: per dimension the
    exact p05/p50/p95 of the micro-rounded values (order statistic
    at ``floor((N−1)·q)``) — the clipping/scaling parameters an ML
    feature pipeline freezes before training.  (dim, p05_micro,
    p50_micro, p95_micro), dim ASC.

    Scale plan: the explode shuffles (dim, micro) PAIRS partitioned
    by dim (exactly 64 groups, so callback count is dims-bounded);
    each partition sorts its own dimension once.  At corpus scales
    where a dimension's values outgrow a partition, the same
    interface runs on the KLL sketch lane
    (:mod:`kgforge.functions.sketches`) — documented trade."""
    def explode(b: pa.Table) -> pa.Table:
        m = np.stack([np.asarray(e, dtype=np.float64)
                      for e in b["embedding"].to_pylist()])
        n, d = m.shape
        micro = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        return pa.table({
            "dim": pa.array(np.tile(np.arange(1, d + 1), n),
                            pa.int64()),
            "v": pa.array(micro.reshape(-1), pa.int64())})

    def stats(t: pa.Table) -> pa.Table:
        dim = t["dim"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        out = []
        for d in np.unique(dim):
            vv = np.sort(v[dim == d])
            N = len(vv)
            out.append((int(d),
                        int(vv[(N - 1) * 5 // 100]),
                        int(vv[(N - 1) * 50 // 100]),
                        int(vv[(N - 1) * 95 // 100])))
        return pa.table({
            "dim": pa.array([o[0] for o in out], pa.int64()),
            "p05_micro": pa.array([o[1] for o in out], pa.int64()),
            "p50_micro": pa.array([o[2] for o in out], pa.int64()),
            "p95_micro": pa.array([o[3] for o in out], pa.int64())})

    return _read(sf_dir, "embeddings", ["embedding"]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("dim").map_groups(stats, batch_format="pyarrow") \
        .sort("dim")


def q_substitute_ladder(sf_dir: str):
    """Price-ladder substitution map: for every part, the next
    CHEAPER part of the same brand (price ties broken by part key)
    and the substitute's price ratio in ppm — the assortative
    "trade-down" lookup merchandising runs after any price change.
    (p_partkey, sub_partkey, price_cents, sub_price_cents,
    ratio_ppm), part ASC; brand-cheapest parts have no row.

    Scale plan: ONE brand-hash exchange; inside a partition the
    ladder is a vectorized shift over the (brand, price, key) sort —
    no pairs, no self-join."""
    from kgforge.functions.joins import _part_codes

    P = 32

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({
            "brand": b["p_brand"], "pk": b["p_partkey"],
            "cents": pc.cast(pc.round(pc.multiply(
                pc.cast(b["p_retailprice"], pa.float64()), 100.0)),
                pa.int64())})
        return t.append_column(
            "__p", pa.array(_part_codes(t["brand"], P)))

    def ladder(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("brand", "ascending"), ("cents", "ascending"),
            ("pk", "ascending")])
        t = t.take(idx)
        br = t["brand"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        ct = t["cents"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        n = len(br)
        if n < 2:
            return pa.table({
                "p_partkey": pa.array([], pa.int64()),
                "sub_partkey": pa.array([], pa.int64()),
                "price_cents": pa.array([], pa.int64()),
                "sub_price_cents": pa.array([], pa.int64()),
                "ratio_ppm": pa.array([], pa.int64())})
        ok = np.zeros(n, dtype=bool)
        ok[1:] = br[1:] == br[:-1]
        keep = np.flatnonzero(ok)
        sub = keep - 1
        return pa.table({
            "p_partkey": pa.array(pk[keep], pa.int64()),
            "sub_partkey": pa.array(pk[sub], pa.int64()),
            "price_cents": pa.array(ct[keep], pa.int64()),
            "sub_price_cents": pa.array(ct[sub], pa.int64()),
            "ratio_ppm": pa.array(
                ct[sub] * 1_000_000 // np.maximum(ct[keep], 1),
                pa.int64())})

    return _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_retailprice"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(ladder, batch_format="pyarrow") \
        .sort("p_partkey")


QUERIES["calendar_gapfill"] = q_calendar_gapfill
QUERIES["robust_scaler_params"] = q_robust_scaler_params
QUERIES["substitute_ladder"] = q_substitute_ladder

ORACLE_SQL["calendar_gapfill"] = """
WITH nd AS (SELECT c_nationkey AS nk,
                   CAST(floor(epoch_us(CAST(o_orderdate AS
                        TIMESTAMP)) / 86400000000.0) AS BIGINT)
                       AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders JOIN customer ON c_custkey = o_custkey
            GROUP BY 1, 2),
w AS (SELECT nk, day, n,
             lag(day) OVER (PARTITION BY nk ORDER BY day) AS pd
      FROM nd)
SELECT CAST(nk AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_days_active,
       CAST(max(day) - min(day) + 1 AS BIGINT) AS n_days_span,
       CAST(max(day) - min(day) + 1 - count(*) AS BIGINT)
           AS n_days_zero,
       CAST(coalesce(max(day - pd - 1), 0) AS BIGINT)
           AS longest_zero_streak,
       CAST(max(n) AS BIGINT) AS max_daily
FROM w GROUP BY 1 ORDER BY nationkey
"""

ORACLE_SQL["robust_scaler_params"] = """
WITH x AS (SELECT g.i AS dim,
                  CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                             * 1000000 + 0.5) AS BIGINT) AS v
           FROM embeddings, generate_series(1, 64) g(i)),
r AS (SELECT dim, v,
             row_number() OVER (PARTITION BY dim ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY dim) AS n
      FROM x)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(max(CASE WHEN rn = 1 + (n - 1) * 5 // 100 THEN v END)
            AS BIGINT) AS p05_micro,
       CAST(max(CASE WHEN rn = 1 + (n - 1) * 50 // 100 THEN v END)
            AS BIGINT) AS p50_micro,
       CAST(max(CASE WHEN rn = 1 + (n - 1) * 95 // 100 THEN v END)
            AS BIGINT) AS p95_micro
FROM r GROUP BY dim ORDER BY dim
"""

ORACLE_SQL["substitute_ladder"] = """
WITH p AS (SELECT p_partkey AS pk, p_brand AS brand,
                  CAST(round(p_retailprice * 100, 0) AS BIGINT)
                      AS cents
           FROM part),
w AS (SELECT pk, brand, cents,
             lag(pk) OVER (PARTITION BY brand
                           ORDER BY cents, pk) AS spk,
             lag(cents) OVER (PARTITION BY brand
                              ORDER BY cents, pk) AS sc
      FROM p)
SELECT CAST(pk AS BIGINT) AS p_partkey,
       CAST(spk AS BIGINT) AS sub_partkey,
       cents AS price_cents, CAST(sc AS BIGINT) AS sub_price_cents,
       CAST(sc * 1000000 // greatest(cents, 1) AS BIGINT)
           AS ratio_ppm
FROM w WHERE spk IS NOT NULL ORDER BY p_partkey
"""


def q_cross_entropy_matrix(sf_dir: str):
    """Cross-source domain-shift matrix: add-1-smoothed word-bigram
    cross-entropy of every source's text under every OTHER source's
    bigram LM, on the shared ``L(x)=round(ln x·10⁶)`` grid:
    ``xent(model s, eval t) = L(N_s + V) − Σ_b c_t(b)·L(c_s(b)+1)
    // N_t`` (V = global distinct-bigram vocabulary; only bigrams
    seen in BOTH sources contribute to the sum, exactly as the
    algebra implies).  (model_source, eval_source, n_bigrams,
    xent_micro), model/eval ASC — the "which corpus transfers to
    which" table.

    Scale plan: per-source bigram counts ride one (source, bigram)
    groupby; the S×S fold is a bigram-hash partitioned run-pair
    exchange (k² per bigram run, k ≤ |sources|) so no count table
    is ever broadcast or collected; V and N_s are bounded
    partials."""
    import math

    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    P = 64

    def bigrams(b: pa.Table) -> pa.Table:
        src_out, w1_out, w2_out = [], [], []
        for s, txt in zip(b["source"].to_pylist(),
                          b["text"].to_pylist()):
            ws = (txt or "").split()
            if len(ws) >= 2:
                src_out.extend([s] * (len(ws) - 1))
                w1_out.extend(ws[:-1])
                w2_out.extend(ws[1:])
        t = pa.table({"source": pa.array(src_out, pa.string()),
                      "w1": pa.array(w1_out, pa.string()),
                      "w2": pa.array(w2_out, pa.string()),
                      "c": pa.array(
                          np.ones(len(src_out), np.int64))})
        g = t.group_by(["source", "w1", "w2"],
                       use_threads=False).aggregate([("c", "sum")])
        return pa.table({"source": g["source"], "w1": g["w1"],
                         "w2": g["w2"], "c": g["c_sum"]})

    counts = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(bigrams, batch_format="pyarrow") \
        .groupby(["source", "w1", "w2"]) \
        .aggregate(Sum("c", alias_name="c")).materialize()

    def tag(b: pa.Table) -> pa.Table:
        code = pc.binary_join_element_wise(b["w1"], b["w2"], "\x1f")
        return b.append_column("__p",
                               pa.array(_part_codes(code, P)))

    def xent_partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"ms": pa.array([], pa.string()),
                          "es": pa.array([], pa.string()),
                          "acc": pa.array([], pa.int64()),
                          "nbg": pa.array([], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[
            ("w1", "ascending"), ("w2", "ascending"),
            ("source", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return empty
        w1 = t["w1"].combine_chunks().to_numpy(zero_copy_only=False)
        w2 = t["w2"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (w1[1:] != w1[:-1]) | (w2[1:] != w2[:-1])
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, n))
        m = lens * lens
        tot = int(m.sum())
        kofs = np.repeat(np.arange(len(m)), m)
        j = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        j1 = starts[kofs] + j // lens[kofs]    # model row
        j2 = starts[kofs] + j % lens[kofs]     # eval row
        lc = np.floor(np.log(c.astype(np.float64) + 1.0)
                      * 1_000_000 + 0.5).astype(np.int64)
        part = pa.table({
            "ms": t["source"].take(pa.array(j1)),
            "es": t["source"].take(pa.array(j2)),
            "acc": pa.array(c[j2] * lc[j1], pa.int64()),
            "nbg": pa.array(np.zeros(tot, np.int64))})
        g = part.group_by(["ms", "es"], use_threads=False) \
            .aggregate([("acc", "sum")])
        out = pa.table({"ms": g["ms"], "es": g["es"],
                        "acc": g["acc_sum"],
                        "nbg": pa.array(
                            np.zeros(len(g), np.int64))})
        # one V-partial row per partition (distinct bigram runs)
        vrow = pa.table({"ms": pa.array(["\x00V"], pa.string()),
                         "es": pa.array(["\x00V"], pa.string()),
                         "acc": pa.array([0], pa.int64()),
                         "nbg": pa.array([len(starts)], pa.int64())})
        return pa.concat_tables([out, vrow])

    folded = counts.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(xent_partials,
                                   batch_format="pyarrow") \
        .groupby(["ms", "es"]).aggregate(
            Sum("acc", alias_name="acc"),
            Sum("nbg", alias_name="nbg")).to_pandas()

    def nsum(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"], use_threads=False) \
            .aggregate([("c", "sum")])
        return pa.table({"source": g["source"], "n": g["c_sum"]})

    ns = counts.map_batches(nsum, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    n_of = dict(zip(ns["source"], ns["n"].astype(int)))
    V = int(folded.loc[folded["ms"] == "\x00V", "nbg"].sum())
    acc_of = {(r["ms"], r["es"]): int(r["acc"])
              for _, r in folded.iterrows() if r["ms"] != "\x00V"}

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    srcs = sorted(n_of)
    rows = [(s, t2, n_of[t2],
             L(n_of[s] + V) - acc_of.get((s, t2), 0) // n_of[t2])
            for s in srcs for t2 in srcs]
    return pa.table({
        "model_source": pa.array([r[0] for r in rows], pa.string()),
        "eval_source": pa.array([r[1] for r in rows], pa.string()),
        "n_bigrams": pa.array([r[2] for r in rows], pa.int64()),
        "xent_micro": pa.array([r[3] for r in rows], pa.int64())})


def q_conformal_coverage(sf_dir: str):
    """Split-conformal interval check for the seasonal-naive monthly
    revenue forecast per nation: residuals |rev(m) − rev(m−12)| on
    the FIRST half of forecastable months calibrate ``qhat`` (exact
    p90 order statistic), the second half measures empirical
    coverage of ``±qhat`` — did the 90% interval hold out of
    sample?  (n_name, n_cal, n_test, qhat_cents, coverage_ppm),
    name ASC; nations without a test month are dropped.

    Scale plan: rides the shared ``_nation_month_cells`` cogroup;
    the split + order statistic fold on nations × months bounded
    cells."""
    cells = _nation_month_cells(sf_dir)
    name_of = _nation_name_lut(sf_dir)

    out = {}
    for nk, grp in cells.groupby("nk"):
        rev = {int(r.ym): int(r.cents) for r in grp.itertuples()}
        res = [(ym, abs(c - rev[ym - 100]))
               for ym, c in sorted(rev.items()) if ym - 100 in rev]
        n = len(res)
        n_cal = (n + 1) // 2
        n_test = n - n_cal
        if n_test == 0:
            continue
        cal = sorted(r for _, r in res[:n_cal])
        qhat = cal[(n_cal - 1) * 90 // 100]
        cov = sum(r <= qhat for _, r in res[n_cal:])
        out[name_of[int(nk)]] = (
            n_cal, n_test, qhat, cov * 1_000_000 // n_test)
    names = sorted(out)
    return pa.table({
        "n_name": pa.array(names, pa.string()),
        "n_cal": pa.array([out[n][0] for n in names], pa.int64()),
        "n_test": pa.array([out[n][1] for n in names], pa.int64()),
        "qhat_cents": pa.array([out[n][2] for n in names],
                               pa.int64()),
        "coverage_ppm": pa.array([out[n][3] for n in names],
                                 pa.int64())})


def q_next_event_ndcg(sf_dir: str):
    """Ranking-metric evaluation of the next-event predictor: train
    per-state top-3 next-type rankings on EVEN user ids (count DESC,
    type ASC), score hit@1 and NDCG@3 on ODD users' transitions with
    the fixed integer gain table ``g(r) = 10¹² // round(log2(r+1)
    ·10⁶)`` (g(1)=10⁶ ⇒ NDCG is already ppm-normalized).
    (prev_type, n_eval, n_hit1, ndcg_ppm), type ASC.

    Scale plan: two type²-bounded transition exchanges (one per
    split) via the event_transitions partition plan; the rank join
    and metric fold run on the driver matrix."""
    import math

    from kgforge.functions.events import event_transitions_ds

    def half(par: int):
        def flt(b: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(
                pc.cast(b["user_id"], pa.int64()),
                pa.scalar(1, pa.int64())), pa.scalar(par, pa.int64()))
            return b.filter(m)

        return _read(sf_dir, "events",
                     ["user_id", "ts", "event_id", "event_type"]) \
            .map_batches(flt, batch_format="pyarrow")

    train = event_transitions_ds(half(0)).to_pandas()
    ev = event_transitions_ds(half(1)).to_pandas()

    rank_of: dict = {}
    for prev, grp in train.groupby("prev_type"):
        ordered = sorted(zip(-grp["n"].astype(int),
                             grp["next_type"]))
        for r, (_, nxt) in enumerate(ordered[:3], start=1):
            rank_of[(prev, nxt)] = r

    g = {1: 10**12 // round(math.log2(2) * 1_000_000),
         2: 10**12 // round(math.log2(3) * 1_000_000),
         3: 10**12 // round(math.log2(4) * 1_000_000)}
    census: dict = {}
    for _, row in ev.iterrows():
        prev, nxt, n = row["prev_type"], row["next_type"], \
            int(row["n"])
        r = rank_of.get((prev, nxt))
        ne, h1, gain = census.get(prev, (0, 0, 0))
        census[prev] = (ne + n, h1 + (n if r == 1 else 0),
                        gain + (n * g[r] if r else 0))
    ks = sorted(census)
    return pa.table({
        "prev_type": pa.array(ks, pa.string()),
        "n_eval": pa.array([census[k][0] for k in ks], pa.int64()),
        "n_hit1": pa.array([census[k][1] for k in ks], pa.int64()),
        "ndcg_ppm": pa.array(
            [census[k][2] // census[k][0] for k in ks], pa.int64())})


QUERIES["cross_entropy_matrix"] = q_cross_entropy_matrix
QUERIES["conformal_coverage"] = q_conformal_coverage
QUERIES["next_event_ndcg"] = q_next_event_ndcg

ORACLE_SQL["cross_entropy_matrix"] = r"""
WITH t0 AS (SELECT source, regexp_extract_all(coalesce(text, ''),
                                              '\S+') AS tl
            FROM documents),
bg AS (SELECT source, unnest(tl[1:len(tl) - 1]) AS w1,
              unnest(tl[2:len(tl)]) AS w2
       FROM t0 WHERE len(tl) >= 2),
j AS (SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c
      FROM bg GROUP BY 1, 2, 3),
ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM j
       GROUP BY 1),
vv AS (SELECT CAST(count(*) AS BIGINT) AS nv
       FROM (SELECT DISTINCT w1, w2 FROM j)),
acc AS (SELECT s.source AS ms, t.source AS es,
               CAST(sum(t.c * CAST(floor(ln(s.c + 1) * 1000000
                                          + 0.5) AS BIGINT))
                    AS BIGINT) AS a
        FROM j t JOIN j s ON s.w1 = t.w1 AND s.w2 = t.w2
        GROUP BY 1, 2)
SELECT a2.source AS model_source, b2.source AS eval_source,
       b2.n AS n_bigrams,
       CAST(CAST(floor(ln(a2.n + (SELECT nv FROM vv)) * 1000000
                       + 0.5) AS BIGINT)
            - coalesce(acc.a, 0) // b2.n AS BIGINT) AS xent_micro
FROM ns a2 CROSS JOIN ns b2
LEFT JOIN acc ON acc.ms = a2.source AND acc.es = b2.source
ORDER BY model_source, eval_source
"""

ORACLE_SQL["conformal_coverage"] = """
WITH r AS (SELECT c_nationkey AS nk,
                  CAST(year(o_orderdate) * 100 + month(o_orderdate)
                       AS BIGINT) AS ym,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
res AS (SELECT cur.nk, cur.ym,
               CAST(abs(cur.cents - s.cents) AS BIGINT) AS e
        FROM r cur JOIN r s ON s.nk = cur.nk
                           AND s.ym = cur.ym - 100),
w AS (SELECT nk, ym, e,
             row_number() OVER (PARTITION BY nk ORDER BY ym) AS rn,
             count(*) OVER (PARTITION BY nk) AS n
      FROM res),
split_ AS (SELECT nk, ym, e, rn, n, (n + 1) // 2 AS n_cal
           FROM w),
calr AS (SELECT nk, e,
                row_number() OVER (PARTITION BY nk ORDER BY e)
                    AS er,
                count(*) OVER (PARTITION BY nk) AS nc
         FROM split_ WHERE rn <= n_cal),
q AS (SELECT nk, max(CASE WHEN er = 1 + (nc - 1) * 90 // 100
                          THEN e END) AS qhat,
             max(nc) AS n_cal
      FROM calr GROUP BY nk),
tst AS (SELECT s.nk,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(count(*) FILTER (WHERE s.e <= q.qhat)
                    AS BIGINT) AS cov
        FROM split_ s JOIN q ON q.nk = s.nk
        WHERE s.rn > s.n_cal GROUP BY 1)
SELECT n_name, CAST(q.n_cal AS BIGINT) AS n_cal, t.n_test,
       CAST(q.qhat AS BIGINT) AS qhat_cents,
       CAST(t.cov * 1000000 // t.n_test AS BIGINT) AS coverage_ppm
FROM tst t JOIN q ON q.nk = t.nk
JOIN nation ON n_nationkey = t.nk
ORDER BY n_name
"""

ORACLE_SQL["next_event_ndcg"] = """
WITH s AS (SELECT user_id, event_type AS prev,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                      AS nxt
           FROM events),
tr AS (SELECT prev, nxt, CAST(count(*) AS BIGINT) AS n
       FROM s WHERE nxt IS NOT NULL AND user_id % 2 = 0
       GROUP BY 1, 2),
rk AS (SELECT prev, nxt,
              row_number() OVER (PARTITION BY prev
                                 ORDER BY n DESC, nxt) AS r
       FROM tr),
ev AS (SELECT prev, nxt, CAST(count(*) AS BIGINT) AS n
       FROM s WHERE nxt IS NOT NULL AND user_id % 2 = 1
       GROUP BY 1, 2),
sc AS (SELECT ev.prev, ev.n,
              CASE WHEN rk.r = 1 THEN ev.n ELSE 0 END AS h1,
              CASE WHEN rk.r = 1
                       THEN ev.n * (1000000000000 // 1000000)
                   WHEN rk.r = 2
                       THEN ev.n * (1000000000000 // 1584963)
                   WHEN rk.r = 3
                       THEN ev.n * (1000000000000 // 2000000)
                   ELSE 0 END AS gain
       FROM ev LEFT JOIN rk ON rk.prev = ev.prev
                           AND rk.nxt = ev.nxt AND rk.r <= 3)
SELECT prev AS prev_type, CAST(sum(n) AS BIGINT) AS n_eval,
       CAST(sum(h1) AS BIGINT) AS n_hit1,
       CAST(sum(gain) // sum(n) AS BIGINT) AS ndcg_ppm
FROM sc GROUP BY 1 ORDER BY prev_type
"""


# ---------------------------------------------------------------------------
# round-5 session H: rank / contingency test statistics on exact grids
# ---------------------------------------------------------------------------

def q_kruskal_wallis(sf_dir: str):
    """Kruskal–Wallis H census of quantity across return flags — the
    nonparametric ANOVA next to ``anova_month``'s eta²: one row per
    group with its exact doubled rank sum (ties → average ranks, so
    2·rank is always an integer), the per-group H term on the micro
    grid (``term = 3·10⁶·S_g² // (n_g·N·(N+1))`` with S_g = 2·R_g —
    all-positive integer division both engines truncate identically),
    the shared ``h_micro = Σterm − 3(N+1)·10⁶`` and the exact tie-
    correction numerator ``Σ(t³−t)``.

    Scale plan: quantity is a bounded integer domain (1..50), so
    per-batch (flag, qty) combiner partials collapse into one
    flags×50-bounded groupby; ranks, H and ties fold on the driver
    over ≤150 cells — the lineitem stream never shuffles."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = np.rint(b["l_quantity"].combine_chunks()
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.table({"f": b["l_returnflag"], "v": pa.array(v),
                      "one": pa.array(np.ones(len(v), np.int64))})
        g = t.group_by(["f", "v"], use_threads=False).aggregate(
            [("one", "sum")])
        return pa.table({"f": g["f"], "v": g["v"], "n": g["one_sum"]})

    cells = _read(sf_dir, "lineitem",
                  ["l_returnflag", "l_quantity"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["f", "v"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()

    tv = cells.groupby("v")["n"].sum().sort_index()
    cum_before, acc = {}, 0
    for v, t in tv.items():
        cum_before[int(v)] = acc
        acc += int(t)
    n_tot = acc
    r2_of = {int(v): 2 * cum_before[int(v)] + int(t) + 1
             for v, t in tv.items()}
    groups: dict = {}
    for _, r in cells.iterrows():
        n = int(r["n"])
        ng, s2 = groups.get(r["f"], (0, 0))
        groups[r["f"]] = (ng + n, s2 + n * r2_of[int(r["v"])])
    terms = {f: (3_000_000 * s2 * s2) // (ng * n_tot * (n_tot + 1))
             for f, (ng, s2) in groups.items()}
    h_micro = sum(terms.values()) - 3 * (n_tot + 1) * 1_000_000
    tie_sum = sum(int(t) ** 3 - int(t) for t in tv)
    fs = sorted(groups)
    return pa.table({
        "l_returnflag": pa.array(fs, pa.string()),
        "n_group": pa.array([groups[f][0] for f in fs], pa.int64()),
        "rank_sum_x2": pa.array([groups[f][1] for f in fs],
                                pa.int64()),
        "term_micro": pa.array([terms[f] for f in fs], pa.int64()),
        "h_micro": pa.array([h_micro] * len(fs), pa.int64()),
        "tie_sum": pa.array([tie_sum] * len(fs), pa.int64())})


def q_cramers_v(sf_dir: str):
    """Exact-integer squared Cramér's V between event type and
    hour-of-day — the normalized effect size next to
    ``type_hour_chi2``'s per-cell census: one row carrying
    ``chi2_micro = Σ 10⁶·(O·N − r·c)² // (r·c·N)`` (per-cell
    all-positive integer division, identical truncation in both
    engines — no float E, no cross-cell float summation) and
    ``v2_micro = chi2_micro // (N·(min(R,C)−1))``; the sqrt stays off
    the contract so the value is exact.

    Scale plan: same types×24-bounded combiner partials as the chi2
    census; the integer fold runs on the driver over ≤ R·C cells."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.hour(b["ts"].combine_chunks())
        t = pa.table({"et": b["event_type"], "h": hour,
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["et", "h"], use_threads=False).aggregate(
            [("one", "sum")])
        return pa.table({"et": g["et"],
                         "h": pc.cast(g["h"], pa.int64()),
                         "n": g["one_sum"]})

    cells = _read(sf_dir, "events", ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["et", "h"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    n_tot = int(cells["n"].sum())
    row = cells.groupby("et")["n"].sum().to_dict()
    col = cells.groupby("h")["n"].sum().to_dict()
    chi2 = 0
    for _, r in cells.iterrows():
        o, rm, cm = int(r["n"]), int(row[r["et"]]), int(col[r["h"]])
        chi2 += (1_000_000 * (o * n_tot - rm * cm) ** 2) \
            // (rm * cm * n_tot)
    k = min(len(row), len(col)) - 1
    return pa.table({
        "n_events": pa.array([n_tot], pa.int64()),
        "n_types": pa.array([len(row)], pa.int64()),
        "n_hours": pa.array([len(col)], pa.int64()),
        "df": pa.array([(len(row) - 1) * (len(col) - 1)], pa.int64()),
        "chi2_micro": pa.array([chi2], pa.int64()),
        "v2_micro": pa.array([chi2 // (n_tot * k)], pa.int64())})


def q_g_test(sf_dir: str):
    """G-test (log-likelihood-ratio) of independence between event
    type and hour-of-day on the shared ``L(x)=⌊ln(x)·10⁶+½⌋`` grid:
    ``g_micro = 2·Σ n·(L(n)+L(N)−L(r)−L(c))`` — a pure integer sum
    with NO division at all, so both engines agree bit-for-bit (the
    rounded grid can dip a near-zero G negative; reported as-is).
    Complements ``cramers_v``'s Pearson chi2 with the
    information-theoretic variant (G = 2N·MI in nats).

    Scale plan: same types×24-bounded combiner partials; integer
    fold on the driver."""
    import math

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.hour(b["ts"].combine_chunks())
        t = pa.table({"et": b["event_type"], "h": hour,
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["et", "h"], use_threads=False).aggregate(
            [("one", "sum")])
        return pa.table({"et": g["et"],
                         "h": pc.cast(g["h"], pa.int64()),
                         "n": g["one_sum"]})

    cells = _read(sf_dir, "events", ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["et", "h"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    n_tot = int(cells["n"].sum())
    row = cells.groupby("et")["n"].sum().to_dict()
    col = cells.groupby("h")["n"].sum().to_dict()
    ln_t = L(n_tot)
    s = 0
    for _, r in cells.iterrows():
        n = int(r["n"])
        s += n * (L(n) + ln_t - L(int(row[r["et"]]))
                  - L(int(col[r["h"]])))
    return pa.table({
        "n_events": pa.array([n_tot], pa.int64()),
        "df": pa.array([(len(row) - 1) * (len(col) - 1)], pa.int64()),
        "g_micro": pa.array([2 * s], pa.int64())})


QUERIES["kruskal_wallis"] = q_kruskal_wallis
QUERIES["cramers_v"] = q_cramers_v
QUERIES["g_test"] = q_g_test

ORACLE_SQL["kruskal_wallis"] = """
WITH q AS (SELECT l_returnflag AS f,
                  CAST(round(l_quantity) AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1, 2),
tv AS (SELECT v, CAST(sum(n) AS BIGINT) AS t FROM q GROUP BY 1),
cumv AS (SELECT v, t,
                CAST(sum(t) OVER (ORDER BY v) - t AS BIGINT) AS cb
         FROM tv),
r AS (SELECT q.f, q.n, (2 * c.cb + c.t + 1) AS r2
      FROM q JOIN cumv c USING (v)),
sg AS (SELECT f, CAST(sum(n) AS HUGEINT) AS ng,
              sum(CAST(n AS HUGEINT) * r2) AS s2
       FROM r GROUP BY 1),
nt AS (SELECT CAST(sum(t) AS HUGEINT) AS n FROM tv),
ts AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tie FROM tv),
terms AS (SELECT f, ng, s2,
                 (3000000 * s2 * s2)
                     // (ng * (SELECT n FROM nt)
                         * ((SELECT n FROM nt) + 1)) AS term
          FROM sg),
h AS (SELECT sum(term)
             - 3 * ((SELECT n FROM nt) + 1) * 1000000 AS hm
      FROM terms)
SELECT f AS l_returnflag, CAST(ng AS BIGINT) AS n_group,
       CAST(s2 AS BIGINT) AS rank_sum_x2,
       CAST(term AS BIGINT) AS term_micro,
       CAST((SELECT hm FROM h) AS BIGINT) AS h_micro,
       CAST((SELECT tie FROM ts) AS BIGINT) AS tie_sum
FROM terms ORDER BY l_returnflag
"""

ORACLE_SQL["cramers_v"] = """
WITH c AS (SELECT event_type AS et,
                  CAST(hour(ts) AS BIGINT) AS h,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT et, CAST(sum(n) AS BIGINT) AS rn FROM c GROUP BY 1),
k AS (SELECT h, CAST(sum(n) AS BIGINT) AS cn FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n) AS HUGEINT) AS tn,
             CAST(count(DISTINCT et) AS HUGEINT) AS nr,
             CAST(count(DISTINCT h) AS HUGEINT) AS nc
      FROM c),
terms AS (SELECT (1000000 * (CAST(c.n AS HUGEINT) * (SELECT tn FROM t)
                             - CAST(r.rn AS HUGEINT) * k.cn)
                          * (CAST(c.n AS HUGEINT) * (SELECT tn FROM t)
                             - CAST(r.rn AS HUGEINT) * k.cn))
                 // (CAST(r.rn AS HUGEINT) * k.cn
                     * (SELECT tn FROM t)) AS v
          FROM c JOIN r USING (et) JOIN k USING (h))
SELECT CAST((SELECT tn FROM t) AS BIGINT) AS n_events,
       CAST((SELECT nr FROM t) AS BIGINT) AS n_types,
       CAST((SELECT nc FROM t) AS BIGINT) AS n_hours,
       CAST(((SELECT nr FROM t) - 1) * ((SELECT nc FROM t) - 1)
            AS BIGINT) AS df,
       CAST(sum(v) AS BIGINT) AS chi2_micro,
       CAST(sum(v) // ((SELECT tn FROM t)
                       * (CASE WHEN (SELECT nr FROM t)
                                    < (SELECT nc FROM t)
                               THEN (SELECT nr FROM t)
                               ELSE (SELECT nc FROM t) END - 1))
            AS BIGINT) AS v2_micro
FROM terms
"""

ORACLE_SQL["g_test"] = """
WITH c AS (SELECT event_type AS et,
                  CAST(hour(ts) AS BIGINT) AS h,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT et, CAST(sum(n) AS BIGINT) AS rn FROM c GROUP BY 1),
k AS (SELECT h, CAST(sum(n) AS BIGINT) AS cn FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
             CAST(count(DISTINCT et) AS BIGINT) AS nr,
             CAST(count(DISTINCT h) AS BIGINT) AS nc
      FROM c),
terms AS (SELECT CAST(c.n AS HUGEINT)
                 * (CAST(floor(ln(c.n) * 1000000 + 0.5) AS BIGINT)
                    + (SELECT CAST(floor(ln(tn) * 1000000 + 0.5)
                                   AS BIGINT) FROM t)
                    - CAST(floor(ln(r.rn) * 1000000 + 0.5) AS BIGINT)
                    - CAST(floor(ln(k.cn) * 1000000 + 0.5) AS BIGINT))
                     AS v
          FROM c JOIN r USING (et) JOIN k USING (h))
SELECT (SELECT tn FROM t) AS n_events,
       CAST(((SELECT nr FROM t) - 1) * ((SELECT nc FROM t) - 1)
            AS BIGINT) AS df,
       CAST(2 * sum(v) AS BIGINT) AS g_micro
FROM terms
"""


def q_welch_t(sf_dir: str):
    """Welch's unequal-variance t-test between the BUILDING and
    MACHINERY segments' account balances, reported as t² and the
    Welch–Satterthwaite df — every input to the two doubles is an
    exact integer (cents sums / squared-cents sums), so both engines
    derive the SAME doubles from the SAME integers before the shared
    round (t² avoids the sqrt; df uses the closed rational form
    ``D²/(A1²/(n1−1)+A2²/(n2−1))`` with A_i the cleared-denominator
    variance terms).

    Scale plan: per-batch (segment, n, Σcents, Σcents²) int64
    partials → a 2-row bounded collect; the exact fold runs on the
    driver in Python ints (the cents² totals overflow int64 at sf≥1,
    like ``numeric_corr``)."""
    import pyarrow.dataset as pds

    SEG_A, SEG_B = "BUILDING", "MACHINERY"

    def partial(b: pa.Table) -> pa.Table:
        from kgforge.common.hashing import round_away

        cents = round_away(
            b["c_acctbal"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        seg = b["c_mktsegment"].to_pylist()
        out = {"seg": [], "n": [], "s": [], "q": []}
        segs = np.asarray(seg)
        for s in (SEG_A, SEG_B):
            m = segs == s
            if m.any():
                c = cents[m]
                out["seg"].append(s)
                out["n"].append(int(m.sum()))
                out["s"].append(int(c.sum()))
                out["q"].append(int((c * c).sum()))
        return pa.table({"seg": pa.array(out["seg"], pa.string()),
                         "n": pa.array(out["n"], pa.int64()),
                         "s": pa.array(out["s"], pa.int64()),
                         "q": pa.array(out["q"], pa.int64())})

    parts = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"],
                  row_filter=pds.field("c_mktsegment").isin(
                      [SEG_A, SEG_B])) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=8192).to_pandas()
    tot = {s: [0, 0, 0] for s in (SEG_A, SEG_B)}
    for _, r in parts.iterrows():
        t = tot[r["seg"]]
        t[0] += int(r["n"])
        t[1] += int(r["s"])
        t[2] += int(r["q"])
    (n1, s1, q1), (n2, s2, q2) = tot[SEG_A], tot[SEG_B]
    num = s1 * n2 - s2 * n1
    a1 = (n1 * q1 - s1 * s1) * n2 * n2 * (n2 - 1)
    a2 = (n2 * q2 - s2 * s2) * n1 * n1 * (n1 - 1)
    d = a1 + a2
    from kgforge.common.hashing import round_away

    t2 = float(round_away(
        float(num) * float(num) * float((n1 - 1) * (n2 - 1))
        / float(d), 6))
    df = float(round_away(
        float(d) * float(d)
        / (float(a1) * float(a1) / (n1 - 1)
           + float(a2) * float(a2) / (n2 - 1)), 2))
    mean_a = float(round_away(float(s1) / (100 * n1), 2))
    mean_b = float(round_away(float(s2) / (100 * n2), 2))
    return pa.table({
        "seg_a": pa.array([SEG_A], pa.string()),
        "seg_b": pa.array([SEG_B], pa.string()),
        "n_a": pa.array([n1], pa.int64()),
        "n_b": pa.array([n2], pa.int64()),
        "mean_a": pa.array([mean_a], pa.float64()),
        "mean_b": pa.array([mean_b], pa.float64()),
        "t2": pa.array([t2], pa.float64()),
        "df_w": pa.array([df], pa.float64())})


def q_runs_test(sf_dir: str):
    """Wald–Wolfowitz runs test of daily order revenue against its
    lower median: the number of above/below runs over the calendar
    plus the exact expected-runs micro value
    ``mu_micro = 10⁶ + 2·10⁶·n₁·n₂ // (n₁+n₂)`` — a randomness /
    autocorrelation smell test for the revenue series (trending
    markets produce far fewer runs than independence predicts).

    Scale plan: per-batch (day, cents) combiner partials → one
    calendar-bounded groupby; the median, the sign sequence and the
    run count fold on the driver over ≤ |days| rows."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from kgforge.common.hashing import round_away

        day = (b["o_orderdate"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000)
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        g = pa.table({"day": pa.array(day), "c": pa.array(cents)}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("c", "sum")])
        return pa.table({"day": g["day"], "cents": g["c_sum"]})

    days = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("cents", alias_name="cents")) \
        .to_pandas().sort_values("day")
    cents = days["cents"].to_numpy(dtype=np.int64)
    n_days = len(cents)
    med = int(np.sort(cents)[(n_days - 1) // 2])   # lower median
    above = cents > med
    n1 = int(above.sum())
    n2 = n_days - n1
    runs = 1 + int((above[1:] != above[:-1]).sum()) if n_days else 0
    mu_micro = 1_000_000 + 2_000_000 * n1 * n2 // (n1 + n2)
    return pa.table({
        "n_days": pa.array([n_days], pa.int64()),
        "n_above": pa.array([n1], pa.int64()),
        "n_below": pa.array([n2], pa.int64()),
        "runs": pa.array([runs], pa.int64()),
        "mu_micro": pa.array([mu_micro], pa.int64())})


def q_theil_nation(sf_dir: str):
    """Theil-T inequality decomposition of customer order revenue by
    nation on the shared ``L(x)=⌊ln(x)·10⁶+½⌋`` grid: per nation the
    within-nation Theil index
    ``(Σx·L(x) + X_g·(L(n_g)−L(X_g))) // X_g`` (sign-magnitude) and
    the nation's exact between-group numerator term
    ``X_g·(L(X_g)+L(N)−L(X)−L(n_g))`` — the additive decomposition
    T = T_between + Σ share_g·T_g that Gini cannot offer.

    Scale plan: (custkey, cents) combiner partials → ONE custkey
    cogroup attaching nationkey (pareto_share's fuse) → per-batch
    per-nation (n, Σx, Σx·L(x)) partials → nations×batches bounded
    collect; Python-int driver fold (Σx·L(x) overflows int64 at
    sf≥1)."""
    from kgforge.functions.joins import cogroup_partition_ds

    from kgforge.common.hashing import round_away

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def rev_partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        g = pa.table({"k": b["o_custkey"], "c": pa.array(cents)}) \
            .group_by(["k"], use_threads=False).aggregate([("c", "sum")])
        return pa.table({"o_custkey": g["k"], "cents": g["c_sum"]})

    rev = orders.map_batches(rev_partial, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep = (nl > 0) & (nr > 0)
        if not keep.any():
            return pa.table({"nk": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        c = pc.fill_null(t["cents"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.add.reduceat(c, starts)[keep]
        ridx = pa.array((starts + nl)[keep])
        return pa.table({
            "nk": pc.cast(t["c_nationkey"].take(ridx), pa.int64()),
            "x": pa.array(sums)})

    per_cust = cogroup_partition_ds(
        rev, cust, "o_custkey", "c_custkey", fuse,
        ["cents"], ["c_nationkey"],
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_nationkey", pa.int32())]))

    def nation_partial(b: pa.Table) -> pa.Table:
        nk = b["nk"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        lx = np.floor(np.log(x.astype(np.float64)) * 1_000_000
                      + 0.5).astype(np.int64)
        t = pa.table({"nk": b["nk"],
                      "one": pa.array(np.ones(len(x), np.int64)),
                      "x": pa.array(x), "w": pa.array(x * lx)})
        g = t.group_by(["nk"], use_threads=False).aggregate(
            [("one", "sum"), ("x", "sum"), ("w", "sum")])
        return pa.table({"nk": g["nk"], "n": g["one_sum"],
                         "x": g["x_sum"], "w": g["w_sum"]})

    parts = per_cust.map_batches(nation_partial,
                                 batch_format="pyarrow",
                                 batch_size=2048).to_pandas()
    agg: dict = {}
    for _, r in parts.iterrows():
        n, x, w = agg.get(int(r["nk"]), (0, 0, 0))
        agg[int(r["nk"])] = (n + int(r["n"]), x + int(r["x"]),
                             w + int(r["w"]))

    import math

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    def sdiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    n_tot = sum(v[0] for v in agg.values())
    x_tot = sum(v[1] for v in agg.values())
    name_of = _nation_name_lut(sf_dir)
    rows = sorted((name_of[nk], n, x, w) for nk, (n, x, w)
                  in agg.items())
    within = [sdiv(w + x * (L(n) - L(x)), x) for _, n, x, w in rows]
    between = [x * (L(x) + L(n_tot) - L(x_tot) - L(n))
               for _, n, x, _ in rows]
    return pa.table({
        "n_name": pa.array([r[0] for r in rows], pa.string()),
        "n_cust": pa.array([r[1] for r in rows], pa.int64()),
        "rev_cents": pa.array([r[2] for r in rows], pa.int64()),
        "theil_within_micro": pa.array(within, pa.int64()),
        "between_term": pa.array(between, pa.int64())})


QUERIES["welch_t"] = q_welch_t
QUERIES["runs_test"] = q_runs_test
QUERIES["theil_nation"] = q_theil_nation

ORACLE_SQL["welch_t"] = """
WITH b AS (SELECT c_mktsegment AS seg,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer
           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
m AS (SELECT seg, CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(cents AS HUGEINT)) AS s,
             sum(CAST(cents AS HUGEINT) * cents) AS q
      FROM b GROUP BY 1),
w AS (SELECT (SELECT n FROM m WHERE seg = 'BUILDING') AS n1,
             (SELECT s FROM m WHERE seg = 'BUILDING') AS s1,
             (SELECT q FROM m WHERE seg = 'BUILDING') AS q1,
             (SELECT n FROM m WHERE seg = 'MACHINERY') AS n2,
             (SELECT s FROM m WHERE seg = 'MACHINERY') AS s2,
             (SELECT q FROM m WHERE seg = 'MACHINERY') AS q2),
z AS (SELECT n1, n2, s1, s2,
             s1 * n2 - s2 * n1 AS num,
             (n1 * q1 - s1 * s1) * n2 * n2 * (n2 - 1) AS a1,
             (n2 * q2 - s2 * s2) * n1 * n1 * (n1 - 1) AS a2
      FROM w)
SELECT 'BUILDING' AS seg_a, 'MACHINERY' AS seg_b,
       CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
       round(CAST(s1 AS DOUBLE) / CAST(100 * n1 AS DOUBLE), 2)
           AS mean_a,
       round(CAST(s2 AS DOUBLE) / CAST(100 * n2 AS DOUBLE), 2)
           AS mean_b,
       round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
             * CAST((n1 - 1) * (n2 - 1) AS DOUBLE)
             / CAST(a1 + a2 AS DOUBLE), 6) AS t2,
       round(CAST(a1 + a2 AS DOUBLE) * CAST(a1 + a2 AS DOUBLE)
             / (CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE)
                / CAST(n1 - 1 AS DOUBLE)
                + CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)
                  / CAST(n2 - 1 AS DOUBLE)), 2) AS df_w
FROM z
"""

ORACLE_SQL["runs_test"] = """
WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000
                       AS BIGINT) AS day,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders GROUP BY 1),
med AS (SELECT cents AS m
        FROM (SELECT cents,
                     row_number() OVER (ORDER BY cents) AS rn,
                     count(*) OVER () AS n
              FROM d)
        WHERE rn = (n + 1) // 2),
s AS (SELECT day, CASE WHEN cents > (SELECT m FROM med)
                       THEN 1 ELSE 0 END AS ab
      FROM d),
r AS (SELECT ab, lag(ab) OVER (ORDER BY day) AS pab FROM s),
c AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(ab) AS BIGINT) AS n1
      FROM s)
SELECT c.n_days, c.n1 AS n_above,
       c.n_days - c.n1 AS n_below,
       (SELECT CAST(1 + count(*) FILTER (WHERE pab IS NOT NULL
                                           AND ab <> pab)
                    AS BIGINT) FROM r) AS runs,
       1000000 + 2000000 * c.n1 * (c.n_days - c.n1)
                 // (c.n1 + (c.n_days - c.n1)) AS mu_micro
FROM c
"""

ORACLE_SQL["theil_nation"] = """
WITH pc_ AS (SELECT o_custkey AS ck,
                    CAST(sum(CAST(round(o_totalprice * 100)
                                  AS BIGINT)) AS BIGINT) AS x
             FROM orders GROUP BY 1),
j AS (SELECT CAST(c_nationkey AS BIGINT) AS nk, x,
             CAST(floor(ln(x) * 1000000 + 0.5) AS BIGINT) AS lx
      FROM pc_ JOIN customer ON c_custkey = ck),
g AS (SELECT nk, CAST(count(*) AS HUGEINT) AS ng,
             CAST(sum(x) AS HUGEINT) AS xg,
             sum(CAST(x AS HUGEINT) * lx) AS wg
      FROM j GROUP BY 1),
t AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
             CAST(sum(xg) AS BIGINT) AS x FROM g),
e AS (SELECT nk, ng, xg,
             wg + xg * (CAST(floor(ln(ng) * 1000000 + 0.5) AS BIGINT)
                        - CAST(floor(ln(xg) * 1000000 + 0.5)
                               AS BIGINT)) AS v,
             xg * (CAST(floor(ln(xg) * 1000000 + 0.5) AS BIGINT)
                   + (SELECT CAST(floor(ln(n) * 1000000 + 0.5)
                                  AS BIGINT) FROM t)
                   - (SELECT CAST(floor(ln(x) * 1000000 + 0.5)
                                  AS BIGINT) FROM t)
                   - CAST(floor(ln(ng) * 1000000 + 0.5) AS BIGINT))
                 AS bt
      FROM g)
SELECT n_name, CAST(ng AS BIGINT) AS n_cust,
       CAST(xg AS BIGINT) AS rev_cents,
       CAST(CASE WHEN v >= 0 THEN v // xg
                 ELSE -((-v) // xg) END AS BIGINT)
           AS theil_within_micro,
       CAST(bt AS BIGINT) AS between_term
FROM e JOIN nation ON CAST(n_nationkey AS BIGINT) = nk
ORDER BY n_name
"""


def q_abc_parts(sf_dir: str):
    """ABC inventory classification census over part revenue: parts
    sorted by revenue (desc, partkey-tied) get class A while the
    inclusive cumulative share ≤ 80%, B while ≤ 95%, else C — one
    exact-integer row per class (``cum·100 ≤ 80·tot`` comparisons,
    no float shares until the final ``share_ppm = cents·10⁶ // tot``).

    Scale plan: the global ordered cumsum is a TWO-LEVEL prefix, not
    a driver sort — parts bucket by the exact power-of-two band of
    their revenue (band order == revenue order, integer compares
    only), per-band totals fold on the driver (≤ 64 rows), and each
    band's within-band sorted cumsum + class census runs as ONE
    vectorized group callback seeded with its band prefix offset; at
    10⁹ parts this is 64 callbacks, never a part-count loop."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def rev_partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["l_extendedprice"].combine_chunks()
            .to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].combine_chunks()
               .to_numpy(zero_copy_only=False)) * 100,
            0).astype(np.int64)
        g = pa.table({"pk": b["l_partkey"], "c": pa.array(cents)}) \
            .group_by(["pk"], use_threads=False).aggregate(
            [("c", "sum")])
        return pa.table({"pk": g["pk"], "c": g["c_sum"]})

    per_part = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_extendedprice", "l_discount"]) \
        .map_batches(rev_partial, batch_format="pyarrow") \
        .groupby("pk").aggregate(Sum("c", alias_name="c"))

    _POW2 = (2 ** np.arange(63, dtype=np.int64))

    def add_band(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        band = np.searchsorted(_POW2, c, side="right") - 1
        return b.append_column("band", pa.array(band.astype(np.int64)))

    banded = per_part.map_batches(add_band, batch_format="pyarrow")
    banded = banded.materialize()     # consumed twice (totals + census)

    def band_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["band"], use_threads=False).aggregate(
            [("c", "sum")])
        return pa.table({"band": g["band"], "s": g["c_sum"]})

    btot = banded.map_batches(band_partial, batch_format="pyarrow") \
        .to_pandas().groupby("band")["s"].sum().to_dict()
    btot = {int(k): int(v) for k, v in btot.items()}
    tot = sum(btot.values())
    offset = {b: sum(v for k, v in btot.items() if k > b)
              for b in btot}

    def census(g: pa.Table) -> pa.Table:
        band = int(g["band"][0].as_py())
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = g["pk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, -c))
        cs = c[order]
        cum = offset[band] + np.cumsum(cs)
        cls = np.where(cum * 100 <= 80 * tot, 0,
                       np.where(cum * 100 <= 95 * tot, 1, 2))
        ks, idx = np.unique(cls, return_inverse=True)
        n = np.bincount(idx)
        s = np.array([cs[idx == i].sum() for i in range(len(ks))],
                     dtype=np.int64)
        return pa.table({"cls": pa.array(ks.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64)),
                         "s": pa.array(s)})

    parts = banded.groupby("band") \
        .map_groups(census, batch_format="pyarrow").to_pandas()
    agg: dict = {}
    for _, r in parts.iterrows():
        n, s = agg.get(int(r["cls"]), (0, 0))
        agg[int(r["cls"])] = (n + int(r["n"]), s + int(r["s"]))
    names = {0: "A", 1: "B", 2: "C"}
    ks = sorted(agg)
    return pa.table({
        "abc_class": pa.array([names[k] for k in ks], pa.string()),
        "n_parts": pa.array([agg[k][0] for k in ks], pa.int64()),
        "rev_cents": pa.array([agg[k][1] for k in ks], pa.int64()),
        "share_ppm": pa.array([agg[k][1] * 1_000_000 // tot
                               for k in ks], pa.int64())})


def q_price_elasticity(sf_dir: str):
    """Log-log price elasticity of demand per brand: OLS slope of
    ``L3(qty)`` on ``L3(unit price cents)`` where
    ``L3(x)=⌊ln(x)·10³+½⌋`` — all five regression moments are exact
    integers folded per brand, and both engines derive the final
    slope/intercept doubles from the SAME integer moments (brands
    with a degenerate design, den = 0, are dropped on both sides).

    Scale plan: per-batch partkey-keyed moment partials (5 int64
    sums) → one partkey cogroup attaching brand (parts-bounded rows
    shuffle, never lineitem) → one 25-bounded brand groupby."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def moment_partial(b: pa.Table) -> pa.Table:
        e = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        q = b["l_quantity"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        unit = round_away(e * 100.0 / q, 0)
        x = np.floor(np.log(unit) * 1_000 + 0.5).astype(np.int64)
        y = np.floor(np.log(round_away(q, 0)) * 1_000
                     + 0.5).astype(np.int64)
        t = pa.table({"pk": b["l_partkey"],
                      "one": pa.array(np.ones(len(x), np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxy": pa.array(x * y), "sxx": pa.array(x * x)})
        g = t.group_by(["pk"], use_threads=False).aggregate(
            [("one", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")])
        return pa.table({"pk": g["pk"], "n": g["one_sum"],
                         "sx": g["sx_sum"], "sy": g["sy_sum"],
                         "sxy": g["sxy_sum"], "sxx": g["sxx_sum"]})

    from kgforge.functions.joins import cogroup_partition_ds

    moments = _read(sf_dir, "lineitem",
                    ["l_partkey", "l_extendedprice", "l_quantity"]) \
        .map_batches(moment_partial, batch_format="pyarrow")
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    _M = ("n", "sx", "sy", "sxy", "sxx")

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep = (nl > 0) & (nr > 0)
        if not keep.any():
            return pa.table(
                {"brand": pa.array([], pa.string()),
                 **{m: pa.array([], pa.int64()) for m in _M}})
        cols = {}
        for m in _M:
            v = pc.fill_null(t[m], 0).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            cols[m] = pa.array(np.add.reduceat(v, starts)[keep])
        ridx = pa.array((starts + nl)[keep])
        return pa.table({"brand": t["p_brand"].take(ridx), **cols})

    per_part = cogroup_partition_ds(
        moments, part, "pk", "p_partkey", fuse,
        list(_M), ["p_brand"],
        left_schema=pa.schema([("pk", pa.int64())]
                              + [(m, pa.int64()) for m in _M]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_brand", pa.string())]))

    agg = per_part.groupby("brand").aggregate(
        *[Sum(m, alias_name=m) for m in _M]).to_pandas() \
        .sort_values("brand")
    rows = []
    for _, r in agg.iterrows():
        n, sx, sy, sxy, sxx = (int(r[m]) for m in _M)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        if den == 0:
            continue
        slope = float(round_away(float(num) / float(den), 6))
        icept = float(round_away(
            (float(sy) - float(num) / float(den) * float(sx))
            / float(n), 6))
        rows.append((str(r["brand"]), n, slope, icept))
    return pa.table({
        "p_brand": pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "elasticity": pa.array([r[2] for r in rows], pa.float64()),
        "intercept_millinats": pa.array([r[3] for r in rows],
                                        pa.float64())})


QUERIES["abc_parts"] = q_abc_parts
QUERIES["price_elasticity"] = q_price_elasticity

ORACLE_SQL["abc_parts"] = """
WITH pr AS (SELECT l_partkey AS pk,
                   CAST(sum(CAST(round(l_extendedprice
                                       * (1.0 - l_discount) * 100)
                                 AS BIGINT)) AS BIGINT) AS c
            FROM lineitem GROUP BY 1),
o AS (SELECT pk, c,
             CAST(sum(c) OVER (ORDER BY c DESC, pk) AS HUGEINT)
                 AS cum,
             (SELECT CAST(sum(c) AS HUGEINT) FROM pr) AS tot
      FROM pr),
cl AS (SELECT CASE WHEN cum * 100 <= 80 * tot THEN 'A'
                   WHEN cum * 100 <= 95 * tot THEN 'B'
                   ELSE 'C' END AS abc_class,
              c, tot
       FROM o)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(c) AS BIGINT) AS rev_cents,
       CAST(CAST(sum(c) AS HUGEINT) * 1000000 // max(tot) AS BIGINT)
           AS share_ppm
FROM cl GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["price_elasticity"] = """
WITH r AS (SELECT l_partkey AS pk,
                  CAST(floor(ln(round(l_extendedprice * 100
                                      / l_quantity)) * 1000 + 0.5)
                       AS BIGINT) AS x,
                  CAST(floor(ln(round(l_quantity)) * 1000 + 0.5)
                       AS BIGINT) AS y
           FROM lineitem),
j AS (SELECT p_brand, x, y FROM r JOIN part ON p_partkey = pk),
m AS (SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx
      FROM j GROUP BY 1)
SELECT p_brand, CAST(n AS BIGINT) AS n_rows,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS elasticity,
       round((CAST(sy AS DOUBLE)
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept_millinats
FROM m WHERE n * sxx - sx * sx <> 0 ORDER BY p_brand
"""


def q_embedding_pca_var(sf_dir: str):
    """Top principal component of the embedding cloud via THREE
    unrolled integer power-iteration steps on the exact count-scaled
    covariance ``C = n·S − s·sᵀ`` (micro-grid Gram S, dimension sums
    s — all integers): v₀ = 10⁶·1, vₖ₊₁ = ⌊C·vₖ·10⁶ / max|C·vₖ|⌋
    (sign-magnitude), Rayleigh quotient λ = v₂ᵀ(C·v₂) / v₂ᵀv₂ —
    reported as the exact eigenvalue / total-variance integers
    ``lambda_micro2``, ``trace_micro2`` and ``top_share_ppm`` plus
    the dominant dimension of the converged direction.  The spectral
    health census for embedding collapse (one dominant direction ⇒
    near-rank-1 features).

    Scale plan: one streaming pass shipping ONE d×d int64 Gram
    partial per batch (d²-bounded, never row-bounded); the 64×64
    fold and the three matvecs run on the driver in Python ints."""
    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.num_rows
        d = len(flat) // n
        q = round_away(flat * 1_000_000, 0).astype(np.int64) \
            .reshape(n, d)
        gram = q.T @ q
        cells = np.concatenate([
            np.arange(d * d + d + 1, dtype=np.int64), [-1]])
        vals = np.concatenate([
            gram.reshape(-1), q.sum(axis=0), [np.int64(n)],
            [np.int64(d)]])
        return pa.table({"cell": pa.array(cells),
                         "v": pa.array(vals.astype(np.int64))})

    acc: dict = {}
    d = 0
    for b in _read(sf_dir, "embeddings", ["embedding"]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        cells = b["cell"].to_numpy(zero_copy_only=False)
        vals = b["v"].to_numpy(zero_copy_only=False)
        for c, v in zip(cells, vals):
            c, v = int(c), int(v)
            if c == -1:
                d = max(d, v)
            else:
                acc[c] = acc.get(c, 0) + v
    n = acc[d * d + d]
    s = [acc[d * d + j] for j in range(d)]
    C = [[n * acc[i * d + j] - s[i] * s[j] for j in range(d)]
         for i in range(d)]

    def sdiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    def step(v):
        y = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in y)
        return y, [sdiv(x * 1_000_000, m) for x in y]

    v = [1_000_000] * d
    _, v = step(v)
    _, v2 = step(v)
    y3, _ = step(v2)
    num = sum(v2[i] * y3[i] for i in range(d))
    den = sum(x * x for x in v2)
    lam = num // den
    trace = sum(C[i][i] for i in range(d))
    dom = min(range(d), key=lambda i: (-abs(y3[i]), i))
    nn1 = n * (n - 1)
    return pa.table({
        "n_vecs": pa.array([n], pa.int64()),
        "dim": pa.array([d], pa.int64()),
        "dom_dim": pa.array([dom], pa.int64()),
        "lambda_micro2": pa.array([lam // nn1], pa.int64()),
        "trace_micro2": pa.array([trace // nn1], pa.int64()),
        "top_share_ppm": pa.array([lam * 1_000_000 // trace],
                                  pa.int64())})


QUERIES["embedding_pca_var"] = q_embedding_pca_var

ORACLE_SQL["embedding_pca_var"] = """
WITH f AS (SELECT vec_id AS r, unnest(embedding) AS e,
                  generate_subscripts(embedding, 1) AS pos
           FROM embeddings),
q AS (SELECT r, CAST(pos - 1 AS BIGINT) AS d,
             CAST(round(CAST(e AS DOUBLE) * 1000000) AS HUGEINT) AS q
      FROM f),
nn AS (SELECT CAST(count(DISTINCT r) AS HUGEINT) AS n FROM q),
s AS (SELECT d, sum(q) AS s FROM q GROUP BY 1),
g AS (SELECT a.d AS i, b.d AS j, sum(a.q * b.q) AS sij
      FROM q a JOIN q b ON a.r = b.r GROUP BY 1, 2),
c AS (SELECT i, j,
             (SELECT n FROM nn) * sij - sa.s * sb.s AS c
      FROM g JOIN s sa ON sa.d = i JOIN s sb ON sb.d = j),
y1 AS (SELECT i, sum(c) * 1000000 AS y FROM c GROUP BY 1),
m1 AS (SELECT max(abs(y)) AS m FROM y1),
v1 AS (SELECT i AS j,
              CASE WHEN y >= 0
                   THEN (y * 1000000) // (SELECT m FROM m1)
                   ELSE -(((-y) * 1000000) // (SELECT m FROM m1))
              END AS v
       FROM y1),
y2 AS (SELECT c.i, sum(c.c * v1.v) AS y
       FROM c JOIN v1 USING (j) GROUP BY 1),
m2 AS (SELECT max(abs(y)) AS m FROM y2),
v2 AS (SELECT i AS j,
              CASE WHEN y >= 0
                   THEN (y * 1000000) // (SELECT m FROM m2)
                   ELSE -(((-y) * 1000000) // (SELECT m FROM m2))
              END AS v
       FROM y2),
y3 AS (SELECT c.i, sum(c.c * v2.v) AS y
       FROM c JOIN v2 USING (j) GROUP BY 1),
ray AS (SELECT sum(v2.v * y3.y) AS num,
               (SELECT sum(v * v) FROM v2) AS den
        FROM y3 JOIN v2 ON v2.j = y3.i),
tr AS (SELECT sum(c) AS t FROM c WHERE i = j),
dm AS (SELECT i FROM y3 ORDER BY abs(y) DESC, i LIMIT 1)
SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_vecs,
       (SELECT CAST(count(*) AS BIGINT) FROM s) AS dim,
       (SELECT CAST(i AS BIGINT) FROM dm) AS dom_dim,
       CAST((num // den)
            // ((SELECT n FROM nn) * ((SELECT n FROM nn) - 1))
            AS BIGINT) AS lambda_micro2,
       CAST((SELECT t FROM tr)
            // ((SELECT n FROM nn) * ((SELECT n FROM nn) - 1))
            AS BIGINT) AS trace_micro2,
       CAST(((num // den) * 1000000) // (SELECT t FROM tr)
            AS BIGINT) AS top_share_ppm
FROM ray
"""


def q_token_simpson(sf_dir: str):
    """Per-source Simpson diversity of the token distribution:
    ``simpson_ppb = Σc(c−1)·10⁹ // (T(T−1))`` — the repeat-probability
    concentration index next to ``source_token_entropy`` (a boilerplate
    -heavy source shows a Simpson spike long before entropy moves).

    Scale plan: rides the (source, token) vocab groupby; per-batch
    int64 partials of Σc(c−1) / Σc / types → one tiny source groupby;
    the ×10⁹ fold runs on the driver in Python ints."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        src = b["source"].take(par)
        g = pa.table({"source": src, "w": flat}) \
            .group_by(["source", "w"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "w": g["w"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    vocab = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "w"]).aggregate(Sum("c", alias_name="c"))

    def fold(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({"source": b["source"],
                      "tok": pa.array(c),
                      "typ": pa.array(np.ones(len(c), np.int64)),
                      "rep": pa.array(c * (c - 1))})
        g = t.group_by(["source"], use_threads=False).aggregate(
            [("tok", "sum"), ("typ", "sum"), ("rep", "sum")])
        return pa.table({"source": g["source"], "tok": g["tok_sum"],
                         "typ": g["typ_sum"], "rep": g["rep_sum"]})

    agg = vocab.map_batches(fold, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("tok", alias_name="n_tokens"),
            Sum("typ", alias_name="n_types"),
            Sum("rep", alias_name="rep")).to_pandas() \
        .sort_values("source")
    rows = []
    for _, r in agg.iterrows():
        t, rep = int(r["n_tokens"]), int(r["rep"])
        rows.append((str(r["source"]), t, int(r["n_types"]),
                     rep * 1_000_000_000 // (t * (t - 1))))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "n_tokens": pa.array([r[1] for r in rows], pa.int64()),
        "n_types": pa.array([r[2] for r in rows], pa.int64()),
        "simpson_ppb": pa.array([r[3] for r in rows], pa.int64())})


def q_source_jsd(sf_dir: str):
    """Pairwise Jensen–Shannon divergence between source unigram
    distributions on the shared L grid — the symmetric, bounded
    domain-shift matrix next to ``source_char_kl``'s char-level KL.
    With counts a_i (total A) and b_i (total B):
    ``KL(P‖M)·A·10⁶ = Σ a_i·(L(2a_iB) − L(a_iB + b_iA))`` — pure
    integers; ``jsd_micro`` is the sum of the two sign-magnitude
    divisions (by 2A and 2B).

    Scale plan: one (source, token) vocab groupby → hash(token)%P
    partitions (P callbacks, never per-token) with dense per-source
    count vectors and one vectorized pass per source pair; per-pair
    int64 partials fold on the driver.  The corpus never shuffles and
    the vocabulary is never collected."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        src = b["source"].take(par)
        g = pa.table({"source": src, "w": flat}) \
            .group_by(["source", "w"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "w": g["w"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    vocab = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "w"]).aggregate(Sum("c", alias_name="c")) \
        .materialize()

    def tot_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"], use_threads=False).aggregate(
            [("c", "sum")])
        return pa.table({"source": g["source"], "t": g["c_sum"]})

    tots = vocab.map_batches(tot_partial, batch_format="pyarrow") \
        .to_pandas().groupby("source")["t"].sum().to_dict()
    tots = {str(k): int(v) for k, v in tots.items()}
    srcs = sorted(tots)
    pairs = [(a, b) for i, a in enumerate(srcs)
             for b in srcs[i + 1:]]

    P = 64

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__p",
                               pa.array(_part_codes(b["w"], P)))

    def pair_terms(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__p"])
        w = t["w"].combine_chunks().dictionary_encode()
        tok = w.indices.to_numpy(zero_copy_only=False)
        nv = len(w.dictionary)
        src = t["source"].to_pylist()
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dense = {}
        srcs_np = np.asarray(src)
        for s in srcs:
            v = np.zeros(nv, np.int64)
            m = srcs_np == s
            v[tok[m]] = c[m]
            dense[s] = v

        def L(v):
            safe = np.where(v > 0, v, 1).astype(np.float64)
            return np.floor(np.log(safe) * 1_000_000
                            + 0.5).astype(np.int64)

        out_a, out_b, sa_l, sb_l = [], [], [], []
        for x, y in pairs:
            a, b = dense[x], dense[y]
            A, B = tots[x], tots[y]
            mix = a * B + b * A
            ta = np.where(a > 0, a * (L(2 * a * B) - L(mix)), 0)
            tb = np.where(b > 0, b * (L(2 * b * A) - L(mix)), 0)
            sa_l.append(x)
            sb_l.append(y)
            out_a.append(int(ta.sum()))
            out_b.append(int(tb.sum()))
        return pa.table({"sa": pa.array(sa_l, pa.string()),
                         "sb": pa.array(sb_l, pa.string()),
                         "ta": pa.array(out_a, pa.int64()),
                         "tb": pa.array(out_b, pa.int64())})

    parts = vocab.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(pair_terms,
                                   batch_format="pyarrow").to_pandas()

    def sdiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    acc = {p: [0, 0] for p in pairs}
    for _, r in parts.iterrows():
        e = acc[(r["sa"], r["sb"])]
        e[0] += int(r["ta"])
        e[1] += int(r["tb"])
    rows = [(x, y, tots[x], tots[y],
             sdiv(acc[(x, y)][0], 2 * tots[x])
             + sdiv(acc[(x, y)][1], 2 * tots[y]))
            for x, y in pairs]
    return pa.table({
        "src_a": pa.array([r[0] for r in rows], pa.string()),
        "src_b": pa.array([r[1] for r in rows], pa.string()),
        "tok_a": pa.array([r[2] for r in rows], pa.int64()),
        "tok_b": pa.array([r[3] for r in rows], pa.int64()),
        "jsd_micro": pa.array([r[4] for r in rows], pa.int64())})


def q_daily_dispersion(sf_dir: str):
    """Per-type Poisson over/under-dispersion of the DAILY event
    count series, zero days included over the global calendar span:
    ``vmr_ppm = (D·Σc² − S²)·10⁶ // ((D−1)·S)`` (variance-to-mean on
    the span of D days) — the time-axis burstiness census next to
    ``token_burstiness``'s per-doc VMR (vmr ≫ 10⁶ ⇒ campaign spikes,
    ≪ 10⁶ ⇒ rate-limited).

    Scale plan: per-batch (type, day) combiner partials → one
    types×days-bounded groupby; the span and the integer fold run on
    the driver."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        day = (b["ts"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000)
        t = pa.table({"et": b["event_type"],
                      "day": pa.array(day.astype(np.int64)),
                      "one": pa.array(np.ones(len(day), np.int64))})
        g = t.group_by(["et", "day"], use_threads=False).aggregate(
            [("one", "sum")])
        return pa.table({"et": g["et"], "day": g["day"],
                         "n": g["one_sum"]})

    cells = _read(sf_dir, "events", ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["et", "day"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    span = int(cells["day"].max()) - int(cells["day"].min()) + 1
    rows = []
    for et, grp in cells.groupby("et"):
        cs = [int(x) for x in grp["n"]]
        s, q = sum(cs), sum(c * c for c in cs)
        if span < 2 or s == 0:
            continue
        rows.append((str(et), len(cs), s,
                     (span * q - s * s) * 1_000_000
                     // ((span - 1) * s)))
    rows.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_days_active": pa.array([r[1] for r in rows], pa.int64()),
        "n_events": pa.array([r[2] for r in rows], pa.int64()),
        "day_span": pa.array([span] * len(rows), pa.int64()),
        "vmr_ppm": pa.array([r[3] for r in rows], pa.int64())})


def q_gap_cv2(sf_dir: str):
    """Per-type squared coefficient of variation of same-user
    inter-event gaps (whole seconds):
    ``cv2_ppm = n·(n·Σg² − S²)·10⁶ // ((n−1)·S²)`` — the burstiness
    classifier on the inter-arrival axis (cv² ≈ 10⁶ Poisson, ≫ 10⁶
    bursty, ≪ 10⁶ pacemaker).  The gap is attributed to the EARLIER
    event's type.

    Scale plan: dwell_time's user-hash partition lane — one shuffle,
    vectorized successor shift per partition, type-bounded int64
    partials, Python-int driver fold (S² overflows int64 at sf≥1)."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    P = 64

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({"u": b["user_id"],
                      "t": pc.cast(pc.cast(b["ts"],
                                           pa.timestamp("us")),
                                   pa.int64()),
                      "eid": b["event_id"], "et": b["event_type"]})
        return t.append_column("__p",
                               pa.array(_part_codes(t["u"], P)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"),
                                            ("t", "ascending"),
                                            ("eid", "ascending")])
        t = t.take(idx)
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(u)
        if n < 2:
            return pa.table({"et": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        g = (ts[1:] - ts[:-1]) // 1_000_000
        ok = u[1:] == u[:-1]
        idx0 = np.flatnonzero(ok)
        gs = g[idx0]
        out = pa.table({"et": t["et"].combine_chunks()
                        .take(pa.array(idx0)),
                        "n": pa.array(np.ones(len(idx0), np.int64)),
                        "s": pa.array(gs),
                        "q": pa.array(gs * gs)}) \
            .group_by(["et"], use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum"), ("q", "sum")])
        return pa.table({"et": out["et"], "n": out["n_sum"],
                         "s": out["s_sum"], "q": out["q_sum"]})

    parts = _read(sf_dir, "events",
                  ["user_id", "ts", "event_id", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .to_pandas()
    acc: dict = {}
    for _, r in parts.iterrows():
        n, s, q = acc.get(r["et"], (0, 0, 0))
        acc[r["et"]] = (n + int(r["n"]), s + int(r["s"]),
                        q + int(r["q"]))
    rows = []
    for et in sorted(acc):
        n, s, q = acc[et]
        if n < 2 or s == 0:
            continue
        rows.append((str(et), n, s,
                     n * (n * q - s * s) * 1_000_000
                     // ((n - 1) * s * s)))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_gaps": pa.array([r[1] for r in rows], pa.int64()),
        "sum_gap_s": pa.array([r[2] for r in rows], pa.int64()),
        "cv2_ppm": pa.array([r[3] for r in rows], pa.int64())})


def q_streak_lengths(sf_dir: str):
    """Longest consecutive-active-day streak per user → user-count
    histogram — the habit/retention census (how many users ever
    built an N-day streak?).

    Scale plan: ONE user-hash shuffle of distinct (user, day) pairs;
    inside each of P partitions the islands are a vectorized
    diff/reduceat pass (per-user consecutive-day runs → per-user max
    → streak histogram partial); one streak-bounded groupby."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    P = 64

    def tag(b: pa.Table) -> pa.Table:
        day = (b["ts"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000)
        t = pa.table({"u": b["user_id"],
                      "day": pa.array(day.astype(np.int64))})
        g = t.group_by(["u", "day"], use_threads=False).aggregate([])
        return g.append_column("__p",
                               pa.array(_part_codes(g["u"], P)))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__p"])
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"),
                                            ("day", "ascending")])
        t = t.take(idx)
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        # batches were pre-deduped per batch; dedupe across batches
        keep = np.ones(len(u), bool)
        keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[keep], d[keep]
        n = len(u)
        if n == 0:
            return pa.table({"streak": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        brk = np.ones(n, bool)
        brk[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        starts = np.flatnonzero(brk)
        lens = np.diff(np.concatenate([starts, [n]]))
        run_u = u[starts]
        ustart = np.flatnonzero(np.concatenate(
            [[True], run_u[1:] != run_u[:-1]]))
        best = np.maximum.reduceat(lens, ustart)
        ks, cnt = np.unique(best, return_counts=True)
        return pa.table({"streak": pa.array(ks.astype(np.int64)),
                         "n_users": pa.array(cnt.astype(np.int64))})

    return _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("streak").aggregate(Sum("n_users",
                                         alias_name="n_users")) \
        .sort("streak")


QUERIES["token_simpson"] = q_token_simpson
QUERIES["source_jsd"] = q_source_jsd
QUERIES["daily_dispersion"] = q_daily_dispersion
QUERIES["gap_cv2"] = q_gap_cv2
QUERIES["streak_lengths"] = q_streak_lengths

ORACLE_SQL["token_simpson"] = r"""
WITH toks AS (SELECT source,
                     unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) AS w
              FROM documents),
v AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2),
a AS (SELECT source, CAST(sum(c) AS HUGEINT) AS t,
             CAST(count(*) AS BIGINT) AS ty,
             sum(CAST(c AS HUGEINT) * (c - 1)) AS rep
      FROM v GROUP BY 1)
SELECT source, CAST(t AS BIGINT) AS n_tokens, ty AS n_types,
       CAST(rep * 1000000000 // (t * (t - 1)) AS BIGINT)
           AS simpson_ppb
FROM a ORDER BY source
"""

ORACLE_SQL["source_jsd"] = r"""
WITH toks AS (SELECT source,
                     unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) AS w
              FROM documents),
v AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2),
t AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM v GROUP BY 1),
p AS (SELECT a.source AS sa, b.source AS sb,
             a.tot AS ta, b.tot AS tb
      FROM t a JOIN t b ON a.source < b.source),
u AS (SELECT DISTINCT w FROM v),
cells AS (SELECT p.sa, p.sb, p.ta, p.tb,
                 coalesce(va.c, 0) AS a, coalesce(vb.c, 0) AS b
          FROM p CROSS JOIN u
          LEFT JOIN v va ON va.source = p.sa AND va.w = u.w
          LEFT JOIN v vb ON vb.source = p.sb AND vb.w = u.w
          WHERE coalesce(va.c, 0) > 0 OR coalesce(vb.c, 0) > 0),
terms AS (SELECT sa, sb, ta, tb,
                 CASE WHEN a > 0 THEN
                     a * (CAST(floor(ln(2 * a * tb) * 1000000 + 0.5)
                               AS BIGINT)
                          - CAST(floor(ln(a * tb + b * ta) * 1000000
                                       + 0.5) AS BIGINT))
                 ELSE 0 END AS xa,
                 CASE WHEN b > 0 THEN
                     b * (CAST(floor(ln(2 * b * ta) * 1000000 + 0.5)
                               AS BIGINT)
                          - CAST(floor(ln(a * tb + b * ta) * 1000000
                                       + 0.5) AS BIGINT))
                 ELSE 0 END AS xb
          FROM cells),
s AS (SELECT sa, sb, ta, tb,
             CAST(sum(xa) AS BIGINT) AS suma,
             CAST(sum(xb) AS BIGINT) AS sumb
      FROM terms GROUP BY 1, 2, 3, 4)
SELECT sa AS src_a, sb AS src_b, ta AS tok_a, tb AS tok_b,
       (CASE WHEN suma >= 0 THEN suma // (2 * ta)
             ELSE -((-suma) // (2 * ta)) END
        + CASE WHEN sumb >= 0 THEN sumb // (2 * tb)
               ELSE -((-sumb) // (2 * tb)) END) AS jsd_micro
FROM s ORDER BY src_a, src_b
"""

ORACLE_SQL["daily_dispersion"] = """
WITH c AS (SELECT event_type AS et,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
sp AS (SELECT max(day) - min(day) + 1 AS d FROM c),
a AS (SELECT et, CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(n) AS HUGEINT) AS s,
             sum(CAST(n AS HUGEINT) * n) AS q
      FROM c GROUP BY 1)
SELECT et AS event_type, nd AS n_days_active,
       CAST(s AS BIGINT) AS n_events,
       CAST((SELECT d FROM sp) AS BIGINT) AS day_span,
       CAST(((SELECT d FROM sp) * q - s * s) * 1000000
            // (((SELECT d FROM sp) - 1) * s) AS BIGINT) AS vmr_ppm
FROM a WHERE (SELECT d FROM sp) >= 2 AND s > 0
ORDER BY event_type
"""

ORACLE_SQL["gap_cv2"] = """
WITH s AS (SELECT event_type AS et, epoch_us(ts) AS t,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                      AS nt
           FROM events),
g AS (SELECT et, (nt - t) // 1000000 AS gap
      FROM s WHERE nt IS NOT NULL),
a AS (SELECT et, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(gap) AS HUGEINT) AS sg,
             sum(CAST(gap AS HUGEINT) * gap) AS q
      FROM g GROUP BY 1)
SELECT et AS event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST(sg AS BIGINT) AS sum_gap_s,
       CAST(n * (n * q - sg * sg) * 1000000
            // ((n - 1) * sg * sg) AS BIGINT) AS cv2_ppm
FROM a WHERE n >= 2 AND sg > 0 ORDER BY event_type
"""

ORACLE_SQL["streak_lengths"] = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           FROM events),
i AS (SELECT user_id,
             day - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day) AS grp
      FROM d),
l AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
      FROM i GROUP BY user_id, grp),
m AS (SELECT user_id, max(len) AS streak FROM l GROUP BY 1)
SELECT streak, CAST(count(*) AS BIGINT) AS n_users
FROM m GROUP BY 1 ORDER BY streak
"""


def q_length_jarque_bera(sf_dir: str):
    """Jarque–Bera normality test of log document length — is the
    corpus log-normal in size, or has scraping mixed regimes? —
    computed entirely from exact integer raw moments of
    ``L3(n_chars)=⌊ln(n_chars)·10³+½⌋``: A = n·M2, B = n²·M3,
    C = n³·M4 clear every denominator, ``g1 = B/A^1.5``,
    ``g2 = C/A²``, ``JB = n/6·(g1² + (g2−3)²/4)`` — both engines
    derive the doubles from the SAME integers.

    Scale plan: one streaming pass of 5 int64 partials per 512-row
    batch (x⁴ bounds the batch size); the fold runs on the driver in
    Python ints (s1³ needs ~2¹²⁵ at sf 1)."""
    import pyarrow.dataset as pds

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        nc = b["n_chars"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.floor(np.log(nc) * 1_000 + 0.5).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "s1": pa.array([int(x.sum())], pa.int64()),
            "s2": pa.array([int((x * x).sum())], pa.int64()),
            "s3": pa.array([int((x * x * x).sum())], pa.int64()),
            "s4": pa.array([int((x * x * x * x).sum())], pa.int64())})

    parts = _read(sf_dir, "documents", ["n_chars"],
                  row_filter=pds.field("n_chars") > 0) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=512).to_pandas()
    n = sum(int(v) for v in parts["n"])
    s1 = sum(int(v) for v in parts["s1"])
    s2 = sum(int(v) for v in parts["s2"])
    s3 = sum(int(v) for v in parts["s3"])
    s4 = sum(int(v) for v in parts["s4"])
    a = n * s2 - s1 * s1
    bb = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    c = n ** 3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 \
        - 3 * s1 ** 4
    g2m3 = c - 3 * a * a
    fa, fb = float(a), float(bb)
    skew = float(round_away(fb / np.sqrt(fa * fa * fa), 6))
    kurt = float(round_away(float(c) / (fa * fa), 6))
    jb = float(round_away(
        float(n) / 6.0 * (fb * fb / (fa * fa * fa)
                          + float(g2m3) * float(g2m3)
                            / (4.0 * fa * fa * fa * fa)), 4))
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "mu_millinats": pa.array([s1 // n], pa.int64()),
        "skew_g1": pa.array([skew], pa.float64()),
        "kurt_g2": pa.array([kurt], pa.float64()),
        "jb": pa.array([jb], pa.float64())})


def q_user_lifespan(sf_dir: str):
    """User activity-lifespan census: days between a user's first
    and last event, bucketed by whole weeks (capped at 12) — the
    churn-horizon histogram next to ``cohort_retention``.

    Scale plan: per-batch per-user (min_day, max_day) partials → one
    user-keyed groupby (only day extrema shuffle) → per-batch bucket
    census → one 13-bounded groupby."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        day = (b["ts"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000)
        t = pa.table({"u": b["user_id"],
                      "lo": pa.array(day.astype(np.int64)),
                      "hi": pa.array(day.astype(np.int64))})
        g = t.group_by(["u"], use_threads=False).aggregate(
            [("lo", "min"), ("hi", "max")])
        return pa.table({"u": g["u"], "lo": g["lo_min"],
                         "hi": g["hi_max"]})

    spans = _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("u").aggregate(Min("lo", alias_name="lo"),
                                Max("hi", alias_name="hi"))

    def census(b: pa.Table) -> pa.Table:
        span = (b["hi"].combine_chunks()
                .to_numpy(zero_copy_only=False)
                - b["lo"].combine_chunks()
                .to_numpy(zero_copy_only=False)).astype(np.int64)
        bucket = np.minimum(span // 7, 12)
        t = pa.table({"week_bucket": pa.array(bucket),
                      "n": pa.array(np.ones(len(span), np.int64)),
                      "s": pa.array(span)})
        g = t.group_by(["week_bucket"], use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum")])
        return pa.table({"week_bucket": g["week_bucket"],
                         "n": g["n_sum"], "s": g["s_sum"]})

    return spans.map_batches(census, batch_format="pyarrow") \
        .groupby("week_bucket").aggregate(
            Sum("n", alias_name="n_users"),
            Sum("s", alias_name="sum_span_days")) \
        .sort("week_bucket")


def q_kg_pred_pairs(sf_dir: str):
    """Predicate co-occurrence within subjects of the KG: for each
    unordered predicate pair, how many subjects carry both — the
    schema-affinity census that seeds Horn-rule mining (pred_a ∧
    pred_b on one subject).  Rides the dict-lane triples and the
    generic ``cooccur_pairs_ds`` primitive (subject-keyed distinct
    pairs; predicates are bounded so the pair space is tiny)."""
    from kgforge.functions.graph import cooccur_pairs_ds

    trips = _dict_flagship_for(sf_dir)["triples"].select_columns(
        ["subj", "pred"])
    pairs = cooccur_pairs_ds(trips, ["subj"], "pred")
    return pairs.map_batches(
        lambda b: pa.table({"pred_a": b["a"], "pred_b": b["b"],
                            "n_subjects": pc.cast(b["n_groups"],
                                                  pa.int64())}),
        batch_format="pyarrow")


QUERIES["length_jarque_bera"] = q_length_jarque_bera
QUERIES["user_lifespan"] = q_user_lifespan
QUERIES["kg_pred_pairs"] = q_kg_pred_pairs

ORACLE_SQL["length_jarque_bera"] = """
WITH x AS (SELECT CAST(floor(ln(n_chars) * 1000 + 0.5) AS BIGINT)
               AS x
           FROM documents WHERE n_chars > 0),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS s1,
             sum(CAST(x AS HUGEINT) * x) AS s2,
             sum(CAST(x AS HUGEINT) * x * x) AS s3,
             sum(CAST(x AS HUGEINT) * x * x * x) AS s4
      FROM x),
z AS (SELECT n, s1,
             n * s2 - s1 * s1 AS a,
             n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS b,
             n * n * n * s4 - 4 * n * n * s1 * s3
                 + 6 * n * s1 * s1 * s2
                 - 3 * s1 * s1 * s1 * s1 AS c
      FROM m)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(s1 // n AS BIGINT) AS mu_millinats,
       round(CAST(b AS DOUBLE)
             / sqrt(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
                    * CAST(a AS DOUBLE)), 6) AS skew_g1,
       round(CAST(c AS DOUBLE)
             / (CAST(a AS DOUBLE) * CAST(a AS DOUBLE)), 6)
           AS kurt_g2,
       round(CAST(n AS DOUBLE) / 6.0
             * (CAST(b AS DOUBLE) * CAST(b AS DOUBLE)
                / (CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
                   * CAST(a AS DOUBLE))
                + CAST(c - 3 * a * a AS DOUBLE)
                  * CAST(c - 3 * a * a AS DOUBLE)
                  / (4.0 * CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
                     * CAST(a AS DOUBLE) * CAST(a AS DOUBLE))), 4)
           AS jb
FROM z
"""

ORACLE_SQL["user_lifespan"] = """
WITH s AS (SELECT user_id,
                  max(CAST(epoch_us(ts) // 86400000000 AS BIGINT))
                  - min(CAST(epoch_us(ts) // 86400000000 AS BIGINT))
                      AS span
           FROM events GROUP BY 1)
SELECT CASE WHEN span // 7 < 12 THEN span // 7 ELSE 12 END
           AS week_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(span) AS BIGINT) AS sum_span_days
FROM s GROUP BY 1 ORDER BY week_bucket
"""

ORACLE_SQL["kg_pred_pairs"] = _dict_oracle.pred_pairs_sql()


def q_nbinom_fit(sf_dir: str):
    """Method-of-moments negative-binomial fit of per-user event
    counts — the standard engagement-heterogeneity model (var > mean
    ⇒ NB; r small ⇒ a few superusers dominate).  With exact integers
    n, S = Σc, Q = Σc²: ``mean_ppm = S·10⁶ // n``, variance
    numerator V = n·Q − S², ``r_micro = S²·(n−1)·10⁶ //
    (n·(V − ... ))`` — concretely r = mean²/(var − mean) and
    p = mean/var become the two integer ratios below, every division
    a single mirrored floor.

    Scale plan: per-user counts via one user-keyed groupby of
    per-batch count partials; the moment fold is a second streaming
    pass of 3 int64 partials."""
    from ray.data.aggregate import Sum

    def cpartial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"u": g["user_id"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    counts = _read(sf_dir, "events", ["user_id"]) \
        .map_batches(cpartial, batch_format="pyarrow") \
        .groupby("u").aggregate(Sum("c", alias_name="c"))

    def mpartial(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "n": pa.array([len(c)], pa.int64()),
            "s": pa.array([int(c.sum())], pa.int64()),
            "q": pa.array([int((c * c).sum())], pa.int64())})

    parts = counts.map_batches(mpartial,
                               batch_format="pyarrow").to_pandas()
    n = sum(int(v) for v in parts["n"])
    s = sum(int(v) for v in parts["s"])
    q = sum(int(v) for v in parts["q"])
    # var = (nQ - S^2)/(n(n-1)); overdispersion var - mean
    v_num = n * q - s * s                     # = var * n(n-1)
    od_num = v_num - s * (n - 1)              # = (var - mean) * n(n-1)
    # r = mean^2/(var-mean) ; p = mean/var   (exact single floors)
    r_micro = s * s * (n - 1) * 1_000_000 // (n * od_num) \
        if od_num > 0 else -1
    p_ppm = s * (n - 1) * 1_000_000 // v_num
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "n_events": pa.array([s], pa.int64()),
        "mean_ppm": pa.array([s * 1_000_000 // n], pa.int64()),
        "var_x_nn1": pa.array([v_num], pa.int64()),
        "r_micro": pa.array([r_micro], pa.int64()),
        "p_ppm": pa.array([p_ppm], pa.int64())})


def q_weekly_churn_markov(sf_dir: str):
    """Two-state weekly activity Markov matrix over the global week
    span: per user each consecutive week pair (w, w+1) inside
    [min_week, max_week] transitions active/inactive; the 2×2 counts
    and the churn / reactivation rates ``p10_ppm = n10·10⁶ //
    (n11+n10)``, ``p01_ppm = n01·10⁶ // (n00+n01)``.  Computed by
    COUNT ALGEBRA on each user's distinct active weeks — n11 =
    consecutive active pairs, n10 = active-below-max − n11, n01 =
    active-above-min − n11, n00 = remainder — so neither engine ever
    expands the users×weeks grid.

    Scale plan: distinct (user, week) rows through ONE user-hash
    shuffle; per-partition vectorized diff/reduceat; driver folds 4
    integers."""
    from kgforge.functions.joins import _part_codes

    P = 64

    def tag(b: pa.Table) -> pa.Table:
        wk = (b["ts"].combine_chunks().cast(pa.int64())
              .to_numpy(zero_copy_only=False) // (7 * 86_400_000_000))
        t = pa.table({"u": b["user_id"],
                      "w": pa.array(wk.astype(np.int64))})
        g = t.group_by(["u", "w"], use_threads=False).aggregate([])
        return g.append_column("__p",
                               pa.array(_part_codes(g["u"], P)))

    def per_partition(t: pa.Table) -> pa.Table:
        """Emits tagged rows: kind 0 = (week, deduped active count);
        kind 1 = consecutive-pair count; kind 2 = user count — the
        global-span edge counts fold from the week histogram on the
        driver (weeks are calendar-bounded)."""
        t = t.drop_columns(["__p"])
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"),
                                            ("w", "ascending")])
        t = t.take(idx)
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.ones(len(u), bool)
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w = u[keep], w[keep]
        if len(u) == 0:
            return pa.table({"kind": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        aa = int(((u[1:] == u[:-1]) & (w[1:] == w[:-1] + 1)).sum())
        wk, cnt = np.unique(w, return_counts=True)
        kind = np.concatenate([np.zeros(len(wk), np.int64), [1, 2]])
        k = np.concatenate([wk.astype(np.int64), [0, 0]])
        v = np.concatenate([cnt.astype(np.int64),
                            [aa, len(np.unique(u))]])
        return pa.table({"kind": pa.array(kind), "k": pa.array(k),
                         "v": pa.array(v)})

    parts = _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p") \
        .map_groups(per_partition, batch_format="pyarrow").to_pandas()
    hist: dict = {}
    aa = n_users = 0
    for _, r in parts.iterrows():
        kind, k, v = int(r["kind"]), int(r["k"]), int(r["v"])
        if kind == 0:
            hist[k] = hist.get(k, 0) + v
        elif kind == 1:
            aa += v
        else:
            n_users += v
    act = sum(hist.values())
    wmin, wmax = min(hist), max(hist)
    at_max, at_min = hist[wmax], hist[wmin]
    n11 = aa
    n10 = (act - at_max) - aa
    n01 = (act - at_min) - aa
    span_w = wmax - wmin + 1
    n00 = n_users * (span_w - 1) - n11 - n10 - n01
    p10 = n10 * 1_000_000 // (n11 + n10) if n11 + n10 else 0
    p01 = n01 * 1_000_000 // (n00 + n01) if n00 + n01 else 0
    return pa.table({
        "n_users": pa.array([n_users], pa.int64()),
        "week_span": pa.array([span_w], pa.int64()),
        "n00": pa.array([n00], pa.int64()),
        "n01": pa.array([n01], pa.int64()),
        "n10": pa.array([n10], pa.int64()),
        "n11": pa.array([n11], pa.int64()),
        "p01_ppm": pa.array([p01], pa.int64()),
        "p10_ppm": pa.array([p10], pa.int64())})


def q_gap_autocorr(sf_dir: str):
    """Lag-1 serial correlation of same-user inter-event gaps (whole
    seconds), per event type of the EARLIEST event in the pair of
    gaps — do long waits follow long waits?  Exact Pearson from five
    integer moments over consecutive gap pairs (g, g'), doubles
    derived from the same integers both engines (types with a
    degenerate denominator are dropped on both sides).

    Scale plan: dwell_time's user-hash lane; inside a partition the
    gap pairs are a double shift over the (user, ts, id) sort;
    type-bounded int64 partials, Python-int driver fold."""
    from kgforge.common.hashing import round_away
    from kgforge.functions.joins import _part_codes

    P = 64

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({"u": b["user_id"],
                      "t": pc.cast(pc.cast(b["ts"],
                                           pa.timestamp("us")),
                                   pa.int64()),
                      "eid": b["event_id"], "et": b["event_type"]})
        return t.append_column("__p",
                               pa.array(_part_codes(t["u"], P)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"),
                                            ("t", "ascending"),
                                            ("eid", "ascending")])
        t = t.take(idx)
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(u)
        cols = ("n", "sx", "sy", "sxy", "sxx", "syy")
        if n < 3:
            return pa.table({"et": pa.array([], pa.string()),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        g = (ts[1:] - ts[:-1]) // 1_000_000
        same = u[1:] == u[:-1]
        # pair (g_i, g_{i+1}) valid when events i, i+1, i+2 same user
        ok = same[:-1] & same[1:]
        i0 = np.flatnonzero(ok)
        x, y = g[i0], g[i0 + 1]
        out = pa.table({"et": t["et"].combine_chunks()
                        .take(pa.array(i0)),
                        "n": pa.array(np.ones(len(i0), np.int64)),
                        "sx": pa.array(x), "sy": pa.array(y),
                        "sxy": pa.array(x * y),
                        "sxx": pa.array(x * x),
                        "syy": pa.array(y * y)}) \
            .group_by(["et"], use_threads=False).aggregate(
            [(c, "sum") for c in cols])
        return pa.table({"et": out["et"],
                         **{c: out[f"{c}_sum"] for c in cols}})

    parts = _read(sf_dir, "events",
                  ["user_id", "ts", "event_id", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .to_pandas()
    acc: dict = {}
    for _, r in parts.iterrows():
        e = acc.setdefault(r["et"], [0] * 6)
        for i, c in enumerate(("n", "sx", "sy", "sxy", "sxx", "syy")):
            e[i] += int(r[c])
    rows = []
    for et in sorted(acc):
        n, sx, sy, sxy, sxx, syy = acc[et]
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        if n < 2 or dx == 0 or dy == 0:
            continue
        r1 = float(round_away(
            float(n * sxy - sx * sy)
            / np.sqrt(float(dx) * float(dy)), 6))
        rows.append((str(et), n, r1))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
        "autocorr_r1": pa.array([r[2] for r in rows], pa.float64())})


QUERIES["nbinom_fit"] = q_nbinom_fit
QUERIES["weekly_churn_markov"] = q_weekly_churn_markov
QUERIES["gap_autocorr"] = q_gap_autocorr

ORACLE_SQL["nbinom_fit"] = """
WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(c AS HUGEINT)) AS s,
             sum(CAST(c AS HUGEINT) * c) AS q
      FROM c),
z AS (SELECT n, s, q, n * q - s * s AS v_num,
             (n * q - s * s) - s * (n - 1) AS od_num
      FROM m)
SELECT CAST(n AS BIGINT) AS n_users, CAST(s AS BIGINT) AS n_events,
       CAST(s * 1000000 // n AS BIGINT) AS mean_ppm,
       CAST(v_num AS BIGINT) AS var_x_nn1,
       CAST(CASE WHEN od_num > 0
                 THEN s * s * (n - 1) * 1000000 // (n * od_num)
                 ELSE -1 END AS BIGINT) AS r_micro,
       CAST(s * (n - 1) * 1000000 // v_num AS BIGINT) AS p_ppm
FROM z
"""

ORACLE_SQL["weekly_churn_markov"] = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS w
           FROM events),
sp AS (SELECT min(w) AS wmin, max(w) AS wmax FROM d),
aa AS (SELECT CAST(count(*) AS BIGINT) AS aa
       FROM d a JOIN d b
         ON a.user_id = b.user_id AND b.w = a.w + 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS act,
             CAST(count(DISTINCT user_id) AS BIGINT) AS nu,
             CAST(count(*) FILTER (WHERE w = (SELECT wmax FROM sp))
                  AS BIGINT) AS at_max,
             CAST(count(*) FILTER (WHERE w = (SELECT wmin FROM sp))
                  AS BIGINT) AS at_min
      FROM d),
z AS (SELECT nu, (SELECT wmax - wmin + 1 FROM sp) AS span_w,
             (SELECT aa FROM aa) AS n11,
             act - at_max - (SELECT aa FROM aa) AS n10,
             act - at_min - (SELECT aa FROM aa) AS n01,
             nu * ((SELECT wmax - wmin FROM sp))
                 - (SELECT aa FROM aa)
                 - (act - at_max - (SELECT aa FROM aa))
                 - (act - at_min - (SELECT aa FROM aa)) AS n00
      FROM t)
SELECT nu AS n_users, span_w AS week_span, n00, n01, n10, n11,
       CASE WHEN n00 + n01 > 0
            THEN n01 * 1000000 // (n00 + n01) ELSE 0 END AS p01_ppm,
       CASE WHEN n11 + n10 > 0
            THEN n10 * 1000000 // (n11 + n10) ELSE 0 END AS p10_ppm
FROM z
"""

ORACLE_SQL["gap_autocorr"] = """
WITH s AS (SELECT event_type AS et, epoch_us(ts) AS t,
                  lead(epoch_us(ts), 1) OVER w AS t1,
                  lead(epoch_us(ts), 2) OVER w AS t2
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT et, (t1 - t) // 1000000 AS x,
             (t2 - t1) // 1000000 AS y
      FROM s WHERE t2 IS NOT NULL),
a AS (SELECT et, CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM g GROUP BY 1)
SELECT et AS event_type, CAST(n AS BIGINT) AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           AS autocorr_r1
FROM a
WHERE n >= 2 AND n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
ORDER BY event_type
"""


def q_vocab_chao1(sf_dir: str):
    """Chao1 vocabulary-richness estimate per source — how many token
    types does the source REALLY have, given what we sampled?
    ``chao1_est = S + f1(f1−1) // (2(f2+1))`` (bias-corrected form,
    exact integer) plus Good–Turing sample coverage
    ``coverage_ppm = (T−f1)·10⁶ // T`` — the crawl-more-or-stop
    signal next to ``vocab_growth``'s Heaps curve.

    Scale plan: rides the (source, token) vocab groupby; per-batch
    (types, f1, f2, tokens) int64 partials → one tiny source
    groupby."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        src = b["source"].take(par)
        g = pa.table({"source": src, "w": flat}) \
            .group_by(["source", "w"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "w": g["w"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    vocab = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "w"]).aggregate(Sum("c", alias_name="c"))

    def fold(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({"source": b["source"],
                      "ty": pa.array(np.ones(len(c), np.int64)),
                      "f1": pa.array((c == 1).astype(np.int64)),
                      "f2": pa.array((c == 2).astype(np.int64)),
                      "tok": pa.array(c)})
        g = t.group_by(["source"], use_threads=False).aggregate(
            [("ty", "sum"), ("f1", "sum"), ("f2", "sum"),
             ("tok", "sum")])
        return pa.table({"source": g["source"], "ty": g["ty_sum"],
                         "f1": g["f1_sum"], "f2": g["f2_sum"],
                         "tok": g["tok_sum"]})

    agg = vocab.map_batches(fold, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("ty", alias_name="n_types"),
            Sum("f1", alias_name="f1"),
            Sum("f2", alias_name="f2"),
            Sum("tok", alias_name="n_tokens")).to_pandas() \
        .sort_values("source")
    rows = []
    for _, r in agg.iterrows():
        s, f1, f2, t = (int(r[c]) for c in
                        ("n_types", "f1", "f2", "n_tokens"))
        rows.append((str(r["source"]), s, f1, f2, t,
                     s + f1 * (f1 - 1) // (2 * (f2 + 1)),
                     (t - f1) * 1_000_000 // t))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "n_types": pa.array([r[1] for r in rows], pa.int64()),
        "f1": pa.array([r[2] for r in rows], pa.int64()),
        "f2": pa.array([r[3] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[4] for r in rows], pa.int64()),
        "chao1_est": pa.array([r[5] for r in rows], pa.int64()),
        "coverage_ppm": pa.array([r[6] for r in rows], pa.int64())})


_PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?[0-9][0-9\- ]{7,}[0-9]"),
    ("long_id", r"[0-9]{9,}"),
)


def q_pii_census(sf_dir: str):
    """PII-pattern census per source: share of documents matching an
    email / phone / long-numeric-ID regex (RE2 both engines) — the
    data-governance gate before any corpus ships.

    Scale plan: pure vectorized map (three compiled RE2 scans per
    batch), source-bounded count partials, zero shuffle of text."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b["text"], "")
        cols = {"source": b["source"],
                "n": pa.array(np.ones(b.num_rows, np.int64))}
        for name, pat in _PII_PATTERNS:
            m = pc.match_substring_regex(txt, pat)
            cols[name] = pc.cast(m, pa.int64())
        g = pa.table(cols).group_by(["source"],
                                    use_threads=False).aggregate(
            [("n", "sum")] + [(n, "sum") for n, _ in _PII_PATTERNS])
        return pa.table({"source": g["source"], "n": g["n_sum"],
                         **{n: g[f"{n}_sum"]
                            for n, _ in _PII_PATTERNS}})

    agg = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n", alias_name="n_docs"),
            *[Sum(n, alias_name=f"n_{n}") for n, _ in _PII_PATTERNS]) \
        .to_pandas().sort_values("source")
    out = {"source": pa.array(agg["source"].astype(str), pa.string()),
           "n_docs": pa.array(agg["n_docs"].astype(np.int64),
                              pa.int64())}
    nd = agg["n_docs"].to_numpy(dtype=np.int64)
    for n, _ in _PII_PATTERNS:
        v = agg[f"n_{n}"].to_numpy(dtype=np.int64)
        out[f"n_{n}"] = pa.array(v, pa.int64())
        out[f"{n}_ppm"] = pa.array(v * 1_000_000 // nd, pa.int64())
    return pa.table(out)


def q_linear_attribution(sf_dir: str):
    """Linear multi-touch attribution: each purchase splits 10⁶
    micro-credits equally (floored) over the same user's non-purchase
    touches in the strict 7-day lookback — the equal-weight
    counterpart to ``first_touch`` / ``position_attribution`` /
    ``removal_effect``.  Per touch type: touches credited and total
    micro-credit.

    Scale plan: one user-hash shuffle; per partition the window is
    TWO vectorized searchsorted calls on a user-offset time axis
    (no per-conversion Python), type credit via bounded one-hot
    prefix sums."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    P = 64
    W = 7 * 86_400_000_000

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({"u": b["user_id"],
                      "t": pc.cast(pc.cast(b["ts"],
                                           pa.timestamp("us")),
                                   pa.int64()),
                      "et": b["event_type"]})
        return t.append_column("__p",
                               pa.array(_part_codes(t["u"], P)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"),
                                            ("t", "ascending")])
        t = t.take(idx)
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        et = t["et"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False)
        types = et.dictionary.to_pylist()
        n = len(u)
        if n == 0:
            return pa.table({"et": pa.array([], pa.string()),
                             "nt": pa.array([], pa.int64()),
                             "cr": pa.array([], pa.int64()),
                             "nc": pa.array([], pa.int64()),
                             "na": pa.array([], pa.int64())})
        # user-offset time axis: globally monotone within partition
        _, urank = np.unique(u, return_inverse=True)
        adj = ts + urank.astype(np.int64) * (1 << 50)
        is_conv = np.array([types[c] == "purchase"
                            for c in range(len(types))])[codes]
        is_touch = ~is_conv
        # exclusive prefix sums: total and per type
        cum_touch = np.zeros(n + 1, np.int64)
        np.cumsum(is_touch, out=cum_touch[1:])
        conv_idx = np.flatnonzero(is_conv)
        lo = np.searchsorted(adj, adj[conv_idx] - W, side="left")
        hi = np.searchsorted(adj, adj[conv_idx], side="left")
        k = cum_touch[hi] - cum_touch[lo]
        credit = np.where(k > 0, 1_000_000 // np.maximum(k, 1), 0)
        nt_out, cr_out, et_out = [], [], []
        for ci, tname in enumerate(types):
            if tname == "purchase":
                continue
            cum_t = np.zeros(n + 1, np.int64)
            np.cumsum((codes == ci) & is_touch, out=cum_t[1:])
            cnt = cum_t[hi] - cum_t[lo]
            et_out.append(tname)
            nt_out.append(int(cnt.sum()))
            cr_out.append(int((cnt * credit).sum()))
        # sentinel row carries the conversion totals even when the
        # partition has no touch types at all
        et_out.append("\x00conv")
        nt_out.append(0)
        cr_out.append(0)
        m = len(et_out)
        return pa.table({
            "et": pa.array(et_out, pa.string()),
            "nt": pa.array(nt_out, pa.int64()),
            "cr": pa.array(cr_out, pa.int64()),
            "nc": pa.array([0] * (m - 1) + [len(conv_idx)],
                           pa.int64()),
            "na": pa.array([0] * (m - 1) + [int((k > 0).sum())],
                           pa.int64())})

    agg = _read(sf_dir, "events", ["user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("et").aggregate(
            Sum("nt", alias_name="touches"),
            Sum("cr", alias_name="credit_micro"),
            Sum("nc", alias_name="nc"),
            Sum("na", alias_name="na")).to_pandas() \
        .sort_values("et")
    n_conv = int(agg["nc"].sum())
    n_attr = int(agg["na"].sum())
    agg = agg[agg["et"] != "\x00conv"]
    return pa.table({
        "event_type": pa.array(agg["et"].astype(str), pa.string()),
        "touches": pa.array(agg["touches"].astype(np.int64),
                            pa.int64()),
        "credit_micro": pa.array(
            agg["credit_micro"].astype(np.int64), pa.int64()),
        "n_conversions": pa.array([n_conv] * len(agg), pa.int64()),
        "n_attributed": pa.array([n_attr] * len(agg), pa.int64())})


def q_doc_prefix_dup(sf_dir: str):
    """Top-20 duplicated 48-character document prefixes — the
    boilerplate / template detector (scraped headers, license
    blocks) that exact-hash dedup misses when tails differ.

    Scale plan: prefixes (not documents) shuffle once; top-k via
    sort-limit on the count table."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        pre = pc.utf8_slice_codeunits(
            pc.fill_null(b["text"], ""), 0, 48)
        g = pa.table({"prefix": pre}) \
            .group_by(["prefix"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"prefix": g["prefix"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    return _read(sf_dir, "documents", ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("prefix").aggregate(Sum("n", alias_name="n_docs")) \
        .sort(["n_docs", "prefix"], descending=[True, False]) \
        .limit(20)


QUERIES["vocab_chao1"] = q_vocab_chao1
QUERIES["pii_census"] = q_pii_census
QUERIES["linear_attribution"] = q_linear_attribution
QUERIES["doc_prefix_dup"] = q_doc_prefix_dup

ORACLE_SQL["vocab_chao1"] = r"""
WITH toks AS (SELECT source,
                     unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) AS w
              FROM documents),
v AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS s,
             CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS f1,
             CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS f2,
             CAST(sum(c) AS BIGINT) AS t
      FROM v GROUP BY 1)
SELECT source, s AS n_types, f1, f2, t AS n_tokens,
       s + f1 * (f1 - 1) // (2 * (f2 + 1)) AS chao1_est,
       (t - f1) * 1000000 // t AS coverage_ppm
FROM a ORDER BY source
"""

ORACLE_SQL["pii_census"] = r"""
WITH d AS (SELECT source, coalesce(text, '') AS text
           FROM documents),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(*) FILTER (WHERE regexp_matches(text,
                 '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'))
                 AS BIGINT) AS n_email,
             CAST(count(*) FILTER (WHERE regexp_matches(text,
                 '\+?[0-9][0-9\- ]{7,}[0-9]')) AS BIGINT) AS n_phone,
             CAST(count(*) FILTER (WHERE regexp_matches(text,
                 '[0-9]{9,}')) AS BIGINT) AS n_long_id
      FROM d GROUP BY 1)
SELECT source, n_docs, n_email, n_email * 1000000 // n_docs
           AS email_ppm,
       n_phone, n_phone * 1000000 // n_docs AS phone_ppm,
       n_long_id, n_long_id * 1000000 // n_docs AS long_id_ppm
FROM a ORDER BY source
"""

ORACLE_SQL["linear_attribution"] = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type
           FROM events),
conv AS (SELECT user_id, t,
                row_number() OVER () AS cid
         FROM e WHERE event_type = 'purchase'),
tw AS (SELECT c.cid, tch.event_type AS et
       FROM conv c JOIN e tch
         ON tch.user_id = c.user_id
        AND tch.event_type <> 'purchase'
        AND tch.t < c.t AND tch.t >= c.t - 604800000000),
k AS (SELECT cid, CAST(count(*) AS BIGINT) AS k FROM tw GROUP BY 1),
cr AS (SELECT tw.et, CAST(count(*) AS BIGINT) AS touches,
              CAST(sum(1000000 // k.k) AS BIGINT) AS credit_micro
       FROM tw JOIN k USING (cid) GROUP BY 1),
tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM conv)
                   AS n_conversions,
               (SELECT CAST(count(*) AS BIGINT) FROM k)
                   AS n_attributed)
SELECT et AS event_type, touches, credit_micro,
       tot.n_conversions, tot.n_attributed
FROM cr CROSS JOIN tot ORDER BY event_type
"""

ORACLE_SQL["doc_prefix_dup"] = """
SELECT substr(coalesce(text, ''), 1, 48) AS prefix,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1 ORDER BY n_docs DESC, prefix LIMIT 20
"""


def q_mann_kendall(sf_dir: str):
    """Mann–Kendall trend test on daily order revenue:
    ``S = Σ_{i<j} sign(c_j − c_i)`` over day order, the exact
    tie-corrected variance numerator ``var_x18 = n(n−1)(2n+5) −
    Σt(t−1)(2t+5)`` and the continuity-corrected z — the standard
    nonparametric is-revenue-trending test next to ``theil_sen``'s
    slope.

    Scale plan: daily cells are calendar-bounded; the O(days²) sign
    fold runs on the driver as one numpy broadcast."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000)
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        g = pa.table({"day": pa.array(day), "c": pa.array(cents)}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("c", "sum")])
        return pa.table({"day": g["day"], "cents": g["c_sum"]})

    days = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("cents", alias_name="cents")) \
        .to_pandas().sort_values("day")
    c = days["cents"].to_numpy(dtype=np.int64)
    n = len(c)
    sgn = np.sign(c[None, :] - c[:, None])
    s = int(np.triu(sgn, 1).sum())
    _, tcnt = np.unique(c, return_counts=True)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in tcnt)
    if s > 0:
        z = float(round_away((s - 1)
                             / np.sqrt(float(var18) / 18.0), 4))
    elif s < 0:
        z = float(round_away((s + 1)
                             / np.sqrt(float(var18) / 18.0), 4))
    else:
        z = 0.0
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "s_stat": pa.array([s], pa.int64()),
        "var_x18": pa.array([var18], pa.int64()),
        "z": pa.array([z], pa.float64())})


def q_mixed_script_census(sf_dir: str):
    """Mixed-script census per source: documents containing Latin,
    Han, and BOTH scripts (RE2 Unicode classes in both engines) —
    the encoding-noise / language-contamination smell test a lang-id
    column cannot give (a 'zh' doc full of Latin boilerplate is a
    scrape artifact).

    Scale plan: pure vectorized map, source-bounded partials, zero
    text shuffle."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b["text"], "")
        lat = pc.match_substring_regex(txt, r"[A-Za-z]")
        han = pc.match_substring_regex(txt, r"\p{Han}")
        both = pc.and_(lat, han)
        g = pa.table({"source": b["source"],
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "lat": pc.cast(lat, pa.int64()),
                      "han": pc.cast(han, pa.int64()),
                      "mix": pc.cast(both, pa.int64())}) \
            .group_by(["source"], use_threads=False).aggregate(
            [("n", "sum"), ("lat", "sum"), ("han", "sum"),
             ("mix", "sum")])
        return pa.table({"source": g["source"], "n": g["n_sum"],
                         "lat": g["lat_sum"], "han": g["han_sum"],
                         "mix": g["mix_sum"]})

    agg = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("lat", alias_name="n_latin"),
            Sum("han", alias_name="n_han"),
            Sum("mix", alias_name="n_mixed")).to_pandas() \
        .sort_values("source")
    nd = agg["n_docs"].to_numpy(dtype=np.int64)
    mx = agg["n_mixed"].to_numpy(dtype=np.int64)
    return pa.table({
        "source": pa.array(agg["source"].astype(str), pa.string()),
        "n_docs": pa.array(nd, pa.int64()),
        "n_latin": pa.array(agg["n_latin"].astype(np.int64),
                            pa.int64()),
        "n_han": pa.array(agg["n_han"].astype(np.int64), pa.int64()),
        "n_mixed": pa.array(mx, pa.int64()),
        "mixed_ppm": pa.array(mx * 1_000_000 // nd, pa.int64())})


def q_twonn_id(sf_dir: str):
    """TwoNN intrinsic-dimension estimate of the embedding cloud
    (Facco et al.): with each point's two nearest squared distances
    on the micro grid (exact int64, ties by neighbor id),
    ``id_micro = 2·n_eff·10¹² // Σ(L(d2₂)−L(d2₁))`` — how many
    degrees of freedom the embeddings REALLY use, the manifold
    counterpart to ``embedding_pca_var``'s linear census.  Exact
    duplicates (d2₁ = 0) are excluded and reported.

    Scale plan: blocked self-join (knn_graph's plan) — rows replicate
    to B block-pair buckets, each bucket keeps a per-query partial
    top-2 by (d², id), one query-hash merge; distances are integer
    matmuls (norms + dot), never float."""
    from kgforge.functions.joins import _part_codes

    B = 4
    P = 32

    def quant(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.num_rows
        d = len(flat) // n if n else 0
        from kgforge.common.hashing import round_away as ra

        q = ra(flat * 1_000_000, 0).astype(np.int64).reshape(n, d)
        return pa.table({"vec_id": b["vec_id"],
                         "q": pa.array(list(q),
                                       pa.list_(pa.int64()))})

    def replicate(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ids = b["vec_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(n, dtype=np.int64), B)
        t = np.tile(np.arange(B, dtype=np.int64), n)
        bi = (ids % B).astype(np.int64)[rep]
        lo, hi = np.minimum(bi, t), np.maximum(bi, t)
        out = b.take(pa.array(rep))
        return out.append_column("__b", pa.array(lo * B + hi))

    def bucket_top2(t: pa.Table) -> pa.Table:
        bucket = int(t["__b"][0].as_py())
        bi, bj = bucket // B, bucket % B
        ids = t["vec_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        ord_ = np.argsort(ids, kind="stable")
        ids = ids[ord_]
        qs = t["q"].combine_chunks()
        flat = pc.list_flatten(qs).to_numpy(zero_copy_only=False)
        d = len(flat) // len(ids) if len(ids) else 0
        Q = flat.reshape(len(ids), d)[ord_]
        blk = (ids % B).astype(np.int64)
        rows = []

        def emit(qi, qm, ci, cm):
            if len(qi) == 0 or len(ci) == 0:
                return
            dots = qm @ cm.T
            nq = (qm * qm).sum(axis=1)
            nc = (cm * cm).sum(axis=1)
            d2 = nq[:, None] + nc[None, :] - 2 * dots
            self_m = qi[:, None] == ci[None, :]
            sent = np.iinfo(np.int64).max
            d2m = np.where(self_m, sent, d2)
            kk = min(2, d2m.shape[1])
            part = np.argpartition(d2m, kk - 1, axis=1)[:, :kk]
            dd = np.take_along_axis(d2m, part, axis=1)
            cc = ci[part]
            if kk == 2:            # order the pair by (d2, id) asc
                swap = (dd[:, 1] < dd[:, 0]) | (
                    (dd[:, 1] == dd[:, 0]) & (cc[:, 1] < cc[:, 0]))
                dd[swap] = dd[swap][:, ::-1]
                cc[swap] = cc[swap][:, ::-1]
            qrep = np.repeat(qi, kk)
            dflat, cflat = dd.reshape(-1), cc.reshape(-1)
            keep = dflat != sent
            rows.append((qrep[keep], dflat[keep], cflat[keep]))

        mi, mj = blk == bi, blk == bj
        if bi == bj:
            emit(ids[mi], Q[mi], ids[mi], Q[mi])
        else:
            emit(ids[mi], Q[mi], ids[mj], Q[mj])
            emit(ids[mj], Q[mj], ids[mi], Q[mi])
        if rows:
            vv = np.concatenate([r[0] for r in rows])
            dv = np.concatenate([r[1] for r in rows])
            cv = np.concatenate([r[2] for r in rows])
        else:
            vv = dv = cv = np.array([], np.int64)
        out = pa.table({"vec_id": pa.array(vv.astype(np.int64)),
                        "d2": pa.array(dv.astype(np.int64)),
                        "nb": pa.array(cv.astype(np.int64))})
        return out.append_column(
            "__p", pa.array(_part_codes(out["vec_id"], P)))

    def merge_top2(t: pa.Table) -> pa.Table:
        v = t["vec_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        d2 = t["d2"].combine_chunks().to_numpy(zero_copy_only=False)
        nb = t["nb"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.lexsort((nb, d2, v))
        v, d2, nb = v[o], d2[o], nb[o]
        # drop duplicate (query, neighbor) rows from shared buckets
        keep = np.ones(len(v), bool)
        keep[1:] = (v[1:] != v[:-1]) | (nb[1:] != nb[:-1]) \
            | (d2[1:] != d2[:-1])
        v, d2, nb = v[keep], d2[keep], nb[keep]
        starts = np.flatnonzero(np.concatenate(
            [[True], v[1:] != v[:-1]]))
        ends = np.concatenate([starts[1:], [len(v)]])
        take = np.concatenate([
            np.arange(s, min(s + 2, e)) for s, e in
            zip(starts, ends)]) if len(starts) else np.array([], int)
        ok = take[(ends[np.searchsorted(starts, take, "right") - 1]
                   - starts[np.searchsorted(starts, take, "right")
                            - 1]) >= 2]
        v, d2 = v[ok], d2[ok]
        # rows come in (d2_1, d2_2) pairs per surviving query
        q1, q2 = d2[0::2], d2[1::2]
        vv = v[0::2]
        valid = q1 > 0
        lq1 = np.floor(np.log(np.where(valid, q1, 1)) * 1_000_000
                       + 0.5).astype(np.int64)
        lq2 = np.floor(np.log(np.where(valid, q2, 1).astype(
            np.float64)) * 1_000_000 + 0.5).astype(np.int64)
        ssum = int(((lq2 - lq1) * valid).sum())
        return pa.table({
            "n_eff": pa.array([int(valid.sum())], pa.int64()),
            "n_dup": pa.array([int((~valid).sum())], pa.int64()),
            "lsum": pa.array([ssum], pa.int64()),
            "nv": pa.array([len(vv)], pa.int64())})

    parts = _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .map_batches(quant, batch_format="pyarrow") \
        .map_batches(replicate, batch_format="pyarrow") \
        .groupby("__b").map_groups(bucket_top2,
                                   batch_format="pyarrow") \
        .groupby("__p").map_groups(merge_top2,
                                   batch_format="pyarrow") \
        .to_pandas()
    n_eff = sum(int(v) for v in parts["n_eff"])
    n_dup = sum(int(v) for v in parts["n_dup"])
    lsum = sum(int(v) for v in parts["lsum"])
    return pa.table({
        "n_points": pa.array([n_eff + n_dup], pa.int64()),
        "n_eff": pa.array([n_eff], pa.int64()),
        "n_dup": pa.array([n_dup], pa.int64()),
        "lsum_micro": pa.array([lsum], pa.int64()),
        "id_micro": pa.array(
            [2 * n_eff * 10 ** 12 // lsum if lsum > 0 else -1],
            pa.int64())})


QUERIES["mann_kendall"] = q_mann_kendall
QUERIES["mixed_script_census"] = q_mixed_script_census
QUERIES["twonn_id"] = q_twonn_id

ORACLE_SQL["mann_kendall"] = """
WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000
                       AS BIGINT) AS day,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS c
           FROM orders GROUP BY 1),
s AS (SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1
                           WHEN b.c < a.c THEN -1
                           ELSE 0 END) AS BIGINT) AS s
      FROM d a JOIN d b ON a.day < b.day),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
t AS (SELECT CAST(coalesce(sum(tc * (tc - 1) * (2 * tc + 5)), 0)
                  AS BIGINT) AS tie
      FROM (SELECT CAST(count(*) AS BIGINT) AS tc
            FROM d GROUP BY c) WHERE tc > 1),
v AS (SELECT n.n, s.s,
             n.n * (n.n - 1) * (2 * n.n + 5) - t.tie AS var18
      FROM n, s, t)
SELECT n AS n_days, s AS s_stat, var18 AS var_x18,
       CASE WHEN s > 0
            THEN round((s - 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0),
                       4)
            WHEN s < 0
            THEN round((s + 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0),
                       4)
            ELSE 0.0 END AS z
FROM v
"""

ORACLE_SQL["mixed_script_census"] = r"""
WITH d AS (SELECT source, coalesce(text, '') AS text
           FROM documents),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(*) FILTER (WHERE regexp_matches(text,
                 '[A-Za-z]')) AS BIGINT) AS n_latin,
             CAST(count(*) FILTER (WHERE regexp_matches(text,
                 '\p{Han}')) AS BIGINT) AS n_han,
             CAST(count(*) FILTER (WHERE regexp_matches(text,
                 '[A-Za-z]') AND regexp_matches(text, '\p{Han}'))
                 AS BIGINT) AS n_mixed
      FROM d GROUP BY 1)
SELECT source, n_docs, n_latin, n_han, n_mixed,
       n_mixed * 1000000 // n_docs AS mixed_ppm
FROM a ORDER BY source
"""

ORACLE_SQL["twonn_id"] = """
WITH f AS (SELECT vec_id AS r, unnest(embedding) AS e,
                  generate_subscripts(embedding, 1) AS pos
           FROM embeddings),
q AS (SELECT r, pos, CAST(round(CAST(e AS DOUBLE) * 1000000)
                          AS BIGINT) AS q
      FROM f),
d2 AS (SELECT a.r AS ra, b.r AS rb,
              CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS d2
       FROM q a JOIN q b ON a.pos = b.pos AND a.r <> b.r
       GROUP BY 1, 2),
rk AS (SELECT ra, d2,
              row_number() OVER (PARTITION BY ra
                                 ORDER BY d2, rb) AS rn
       FROM d2),
nn AS (SELECT ra, max(CASE WHEN rn = 1 THEN d2 END) AS d1,
              max(CASE WHEN rn = 2 THEN d2 END) AS d2_
       FROM rk WHERE rn <= 2 GROUP BY 1),
ag AS (SELECT CAST(count(*) FILTER (WHERE d1 > 0) AS BIGINT)
                  AS n_eff,
              CAST(count(*) FILTER (WHERE d1 = 0) AS BIGINT)
                  AS n_dup,
              CAST(coalesce(sum(
                  CASE WHEN d1 > 0 THEN
                      CAST(floor(ln(d2_) * 1000000 + 0.5) AS BIGINT)
                      - CAST(floor(ln(d1) * 1000000 + 0.5) AS BIGINT)
                  ELSE 0 END), 0) AS BIGINT) AS lsum
       FROM nn)
SELECT n_eff + n_dup AS n_points, n_eff, n_dup,
       lsum AS lsum_micro,
       CASE WHEN lsum > 0
            THEN CAST(2 * CAST(n_eff AS HUGEINT) * 1000000000000
                      // lsum AS BIGINT)
            ELSE -1 END AS id_micro
FROM ag
"""


_FUNNEL_STEPS = (("view", "click"), ("click", "purchase"))


def q_funnel_step_latency(sf_dir: str):
    """Funnel step latency: for each user's FIRST occurrence of each
    step, the minute-floored delay distribution of view→click and
    click→purchase (only when ordered correctly) — lower median and
    lower p90 over the bounded minute grid, exact in both engines.

    Scale plan: one user-hash shuffle; per partition the per-user
    firsts are a vectorized groupby-min; per-pair minute histograms
    (bounded domain) fold through one tiny groupby; quantiles walk
    the histogram on the driver."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    P = 64

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({"u": b["user_id"],
                      "t": pc.cast(pc.cast(b["ts"],
                                           pa.timestamp("us")),
                                   pa.int64()),
                      "et": b["event_type"]})
        return t.append_column("__p",
                               pa.array(_part_codes(t["u"], P)))

    steps = sorted({s for pair in _FUNNEL_STEPS for s in pair})

    def per_partition(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["__p"]).group_by(
            ["u", "et"], use_threads=False).aggregate([("t", "min")])
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        et = g["et"].to_pylist()
        tm = g["t_min"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        firsts: dict = {}
        for uu, ee, tt in zip(u, et, tm):
            if ee in steps:
                firsts.setdefault(int(uu), {})[ee] = int(tt)
        hist: dict = {}
        for udict in firsts.values():
            for a, bname in _FUNNEL_STEPS:
                if a in udict and bname in udict \
                        and udict[bname] > udict[a]:
                    m = (udict[bname] - udict[a]) // 60_000_000
                    key = (f"{a}->{bname}", m)
                    hist[key] = hist.get(key, 0) + 1
        ks = sorted(hist)
        return pa.table({
            "step": pa.array([k[0] for k in ks], pa.string()),
            "minute": pa.array([k[1] for k in ks], pa.int64()),
            "n": pa.array([hist[k] for k in ks], pa.int64())})

    cells = _read(sf_dir, "events", ["user_id", "ts", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby(["step", "minute"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    rows = []
    for step, grp in cells.groupby("step"):
        grp = grp.sort_values("minute")
        n_tot = int(grp["n"].sum())
        r_med = (n_tot + 1) // 2
        r_p90 = (9 * n_tot + 10) // 10
        cum = 0
        med = p90 = None
        for _, r in grp.iterrows():
            cum += int(r["n"])
            if med is None and cum >= r_med:
                med = int(r["minute"])
            if p90 is None and cum >= r_p90:
                p90 = int(r["minute"])
        rows.append((str(step), n_tot, med, p90))
    rows.sort()
    return pa.table({
        "step": pa.array([r[0] for r in rows], pa.string()),
        "n_users": pa.array([r[1] for r in rows], pa.int64()),
        "median_min": pa.array([r[2] for r in rows], pa.int64()),
        "p90_min": pa.array([r[3] for r in rows], pa.int64())})


_CTX_THRESHOLDS = (512, 1024, 2048, 4096, 8192)


def q_ctx_window_census(sf_dir: str):
    """Context-window fit census per source: how many documents
    exceed each standard context length (whitespace tokens ≥ 512 /
    1k / 2k / 4k / 8k) plus the total token mass beyond 512 — the
    chunking-budget planner next to ``pack_chunks``.

    Scale plan: pure vectorized token-count map, source-bounded
    partials, zero text shuffle."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(
            zero_copy_only=False)
        cnt = np.zeros(b.num_rows, np.int64)
        if len(par):
            np.add.at(cnt, par, nonempty.astype(np.int64))
        cols = {"source": b["source"],
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "tok": pa.array(cnt),
                "over512tok": pa.array(
                    np.where(cnt >= 512, cnt, 0))}
        for th in _CTX_THRESHOLDS:
            cols[f"ge{th}"] = pa.array((cnt >= th).astype(np.int64))
        g = pa.table(cols).group_by(["source"],
                                    use_threads=False).aggregate(
            [("n", "sum"), ("tok", "sum"), ("over512tok", "sum")]
            + [(f"ge{th}", "sum") for th in _CTX_THRESHOLDS])
        out = {"source": g["source"], "n": g["n_sum"],
               "tok": g["tok_sum"], "over": g["over512tok_sum"]}
        for th in _CTX_THRESHOLDS:
            out[f"ge{th}"] = g[f"ge{th}_sum"]
        return pa.table(out)

    agg = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("tok", alias_name="n_tokens"),
            Sum("over", alias_name="tokens_over_512"),
            *[Sum(f"ge{th}", alias_name=f"docs_ge_{th}")
              for th in _CTX_THRESHOLDS]).to_pandas() \
        .sort_values("source")
    cols = {"source": pa.array(agg["source"].astype(str),
                               pa.string())}
    for c in (["n_docs", "n_tokens", "tokens_over_512"]
              + [f"docs_ge_{th}" for th in _CTX_THRESHOLDS]):
        cols[c] = pa.array(agg[c].astype(np.int64), pa.int64())
    return pa.table(cols)


QUERIES["funnel_step_latency"] = q_funnel_step_latency
QUERIES["ctx_window_census"] = q_ctx_window_census

ORACLE_SQL["funnel_step_latency"] = """
WITH f AS (SELECT user_id, event_type, min(epoch_us(ts)) AS t
           FROM events
           WHERE event_type IN ('view', 'click', 'purchase')
           GROUP BY 1, 2),
d AS (SELECT a.event_type || '->' || b.event_type AS step,
             (b.t - a.t) // 60000000 AS m
      FROM f a JOIN f b
        ON a.user_id = b.user_id AND b.t > a.t
       AND ((a.event_type = 'view' AND b.event_type = 'click')
            OR (a.event_type = 'click'
                AND b.event_type = 'purchase'))),
r AS (SELECT step, m,
             row_number() OVER (PARTITION BY step ORDER BY m) AS rn,
             count(*) OVER (PARTITION BY step) AS n
      FROM d)
SELECT step, CAST(max(n) AS BIGINT) AS n_users,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN m END) AS BIGINT)
           AS median_min,
       CAST(max(CASE WHEN rn = (9 * n + 10) // 10 THEN m END)
            AS BIGINT) AS p90_min
FROM r GROUP BY step ORDER BY step
"""

ORACLE_SQL["ctx_window_census"] = r"""
WITH d AS (SELECT source,
                  CAST((SELECT count(*) FROM unnest(
                      regexp_extract_all(coalesce(text, ''), '\S+'))
                      x(w)) AS BIGINT) AS tok
           FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens,
       CAST(coalesce(sum(tok) FILTER (WHERE tok >= 512), 0)
            AS BIGINT) AS tokens_over_512,
       CAST(count(*) FILTER (WHERE tok >= 512) AS BIGINT)
           AS docs_ge_512,
       CAST(count(*) FILTER (WHERE tok >= 1024) AS BIGINT)
           AS docs_ge_1024,
       CAST(count(*) FILTER (WHERE tok >= 2048) AS BIGINT)
           AS docs_ge_2048,
       CAST(count(*) FILTER (WHERE tok >= 4096) AS BIGINT)
           AS docs_ge_4096,
       CAST(count(*) FILTER (WHERE tok >= 8192) AS BIGINT)
           AS docs_ge_8192
FROM d GROUP BY 1 ORDER BY source
"""


def q_hill_tail(sf_dir: str):
    """Hill estimator of the Pareto tail index of customer revenue
    (k = 100 top order statistics):
    ``alpha_micro = k·10¹² // Σ(L(x_i) − L(x_{k+1}))`` — how heavy is
    the whale tail that ``pareto_share`` and ``customer_gini`` only
    summarize?  Exact integers end-to-end (ties broken by custkey).

    Scale plan: per-customer cents via one custkey groupby; the
    top-(k+1) is a distributed sort-limit; the 101-row fold runs on
    the driver."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    K = 100

    def rev_partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        g = pa.table({"k": b["o_custkey"], "c": pa.array(cents)}) \
            .group_by(["k"], use_threads=False).aggregate([("c", "sum")])
        return pa.table({"ck": g["k"], "cents": g["c_sum"]})

    top = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(rev_partial, batch_format="pyarrow") \
        .groupby("ck").aggregate(Sum("cents", alias_name="cents")) \
        .sort(["cents", "ck"], descending=[True, False]) \
        .limit(K + 1).to_pandas()

    import math

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    xs = [int(v) for v in top["cents"]]
    lthr = L(xs[K])
    denom = sum(L(x) - lthr for x in xs[:K])
    return pa.table({
        "k": pa.array([K], pa.int64()),
        "x_threshold_cents": pa.array([xs[K]], pa.int64()),
        "denom_micro": pa.array([denom], pa.int64()),
        "alpha_micro": pa.array(
            [K * 10 ** 12 // denom if denom > 0 else -1], pa.int64())})


def q_gumbel_maxima(sf_dir: str):
    """Gumbel (EV-I) fit of WEEKLY MAXIMUM daily order revenue by the
    method of moments — the capacity-planning distribution for "how
    big can a peak day get": ``β = sqrt(6·var)/π``, ``μ = mean − γβ``
    with both doubles derived from the exact integer block-maxima
    moments (γ, π written identically in both engines).

    Scale plan: daily cells → 52·years-bounded weekly maxima →
    3-integer driver fold."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000)
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        g = pa.table({"day": pa.array(day), "c": pa.array(cents)}) \
            .group_by(["day"], use_threads=False) \
            .aggregate([("c", "sum")])
        return pa.table({"day": g["day"], "cents": g["c_sum"]})

    days = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("cents", alias_name="cents")) \
        .to_pandas()
    days["week"] = days["day"] // 7
    wk = days.groupby("week")["cents"].max()
    xs = [int(v) for v in wk]
    n = len(xs)
    s = sum(xs)
    q = sum(x * x for x in xs)
    v = n * q - s * s

    import math

    from kgforge.common.hashing import round_away as ra

    beta = math.sqrt(6.0 * float(v) / float(n * (n - 1))) / math.pi
    mu = float(s) / float(n) - 0.5772156649015329 * beta
    return pa.table({
        "n_weeks": pa.array([n], pa.int64()),
        "max_cents": pa.array([max(xs)], pa.int64()),
        "beta": pa.array([float(ra(beta, 4))], pa.float64()),
        "mu": pa.array([float(ra(mu, 4))], pa.float64())})


def q_split3_census(sf_dir: str):
    """Stratified QA of a deterministic 3-way split (md5 ppm buckets:
    train < 80, val < 90, else test): per (split, lang) document and
    character counts — does every stratum keep the corpus mix?
    Rides ``hash_split``'s md5 convention so the 3-way assignment is
    stable across runs, engines and cluster sizes.

    Scale plan: pure map + one split×lang-bounded groupby."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import md5_u64_arr

    def assign(b: pa.Table) -> pa.Table:
        buckets = (md5_u64_arr(pc.cast(b["doc_id"], pa.string()),
                               nhex=8)
                   % np.uint64(100)).astype(np.int64)
        split = np.where(buckets < 80, "train",
                         np.where(buckets < 90, "val", "test"))
        g = pa.table({"split": pa.array(split, pa.string()),
                      "lang": b["lang"],
                      "n": pa.array(np.ones(len(split), np.int64)),
                      "ch": b["n_chars"]}) \
            .group_by(["split", "lang"], use_threads=False) \
            .aggregate([("n", "sum"), ("ch", "sum")])
        return pa.table({"split": g["split"], "lang": g["lang"],
                         "n": g["n_sum"], "ch": g["ch_sum"]})

    return _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]) \
        .map_batches(assign, batch_format="pyarrow") \
        .groupby(["split", "lang"]).aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("ch", alias_name="n_chars")) \
        .sort(["split", "lang"])


QUERIES["hill_tail"] = q_hill_tail
QUERIES["gumbel_maxima"] = q_gumbel_maxima
QUERIES["split3_census"] = q_split3_census

ORACLE_SQL["hill_tail"] = """
WITH pc_ AS (SELECT o_custkey AS ck,
                    CAST(sum(CAST(round(o_totalprice * 100)
                                  AS BIGINT)) AS BIGINT) AS c
             FROM orders GROUP BY 1),
top AS (SELECT c, row_number() OVER (ORDER BY c DESC, ck) AS rn
        FROM pc_ QUALIFY rn <= 101),
thr AS (SELECT CAST(floor(ln(c) * 1000000 + 0.5) AS BIGINT) AS lt,
               c AS xc
        FROM top WHERE rn = 101),
d AS (SELECT CAST(sum(CAST(floor(ln(c) * 1000000 + 0.5) AS BIGINT)
                      - (SELECT lt FROM thr)) AS BIGINT) AS denom
      FROM top WHERE rn <= 100)
SELECT CAST(100 AS BIGINT) AS k,
       (SELECT xc FROM thr) AS x_threshold_cents,
       d.denom AS denom_micro,
       CASE WHEN d.denom > 0
            THEN CAST(100 * CAST(1000000000000 AS HUGEINT)
                      // d.denom AS BIGINT)
            ELSE -1 END AS alpha_micro
FROM d
"""

ORACLE_SQL["gumbel_maxima"] = """
WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000
                       AS BIGINT) AS day,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders GROUP BY 1),
w AS (SELECT day // 7 AS week, max(cents) AS mx FROM d GROUP BY 1),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(mx AS HUGEINT)) AS s,
             sum(CAST(mx AS HUGEINT) * mx) AS q,
             CAST(max(mx) AS BIGINT) AS mmax
      FROM w)
SELECT CAST(n AS BIGINT) AS n_weeks, mmax AS max_cents,
       round(sqrt(6.0 * CAST(n * q - s * s AS DOUBLE)
                  / CAST(n * (n - 1) AS DOUBLE)) / pi(), 4) AS beta,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             - 0.5772156649015329
               * (sqrt(6.0 * CAST(n * q - s * s AS DOUBLE)
                       / CAST(n * (n - 1) AS DOUBLE)) / pi()), 4)
           AS mu
FROM m
"""

ORACLE_SQL["split3_census"] = """
WITH s AS (SELECT CASE
               WHEN CAST(concat('0x',
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) % 100 < 80 THEN 'train'
               WHEN CAST(concat('0x',
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) % 100 < 90 THEN 'val'
               ELSE 'test' END AS split,
               lang, n_chars
           FROM documents)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM s GROUP BY 1, 2 ORDER BY split, lang
"""


def q_log_rank_test(sf_dir: str):
    """Log-rank test comparing time-to-second-event (whole days)
    between users whose FIRST event was a click vs a view — the
    survival-curve comparison that completes the ``kaplan_meier``
    family.  At each distinct duration d: O1 (group-1 events),
    ``e1_micro = N1·O·10⁶ // N`` and
    ``v_micro = N1·N2·O·(N−O)·10⁶ // (N²·(N−1))`` — per-term integer
    floors, so no cross-row float summation exists in either engine;
    ``z2_micro = diff² // (var·10⁶)``.

    Scale plan: per-user (first type, duration) via one user-hash
    pass; durations are day-bounded histograms per group; risk sets
    and the fold run on the driver."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    P = 64

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table({"u": b["user_id"],
                      "t": pc.cast(pc.cast(b["ts"],
                                           pa.timestamp("us")),
                                   pa.int64()),
                      "eid": b["event_id"], "et": b["event_type"]})
        return t.append_column("__p",
                               pa.array(_part_codes(t["u"], P)))

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"),
                                            ("t", "ascending"),
                                            ("eid", "ascending")])
        t = t.take(idx)
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        et = t["et"].to_pylist()
        n = len(u)
        starts = np.flatnonzero(np.concatenate(
            [[True], u[1:] != u[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        ok = (ends - starts) >= 2
        s_ok = starts[ok]
        g = np.asarray(et, dtype=object)[s_ok]
        dur = (ts[s_ok + 1] - ts[s_ok]) // 86_400_000_000
        keep = (g == "click") | (g == "view")
        tab = pa.table({"grp": pa.array(
            [str(x) for x in g[keep]], pa.string()),
            "dur": pa.array(dur[keep].astype(np.int64)),
            "n": pa.array(np.ones(int(keep.sum()), np.int64))}) \
            .group_by(["grp", "dur"], use_threads=False) \
            .aggregate([("n", "sum")])
        return pa.table({"grp": tab["grp"], "dur": tab["dur"],
                         "n": tab["n_sum"]})

    cells = _read(sf_dir, "events",
                  ["user_id", "ts", "event_id", "event_type"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby(["grp", "dur"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    h1 = cells[cells["grp"] == "click"].set_index("dur")["n"] \
        .astype(int).to_dict()
    h2 = cells[cells["grp"] == "view"].set_index("dur")["n"] \
        .astype(int).to_dict()
    n1_tot, n2_tot = sum(h1.values()), sum(h2.values())
    durs = sorted(set(h1) | set(h2))
    n1, n2 = n1_tot, n2_tot
    o1_sum = e1_sum = v_sum = 0
    for d in durs:
        o1, o2 = h1.get(d, 0), h2.get(d, 0)
        o = o1 + o2
        nn = n1 + n2
        o1_sum += o1
        e1_sum += n1 * o * 1_000_000 // nn
        if nn > 1:
            v_sum += n1 * n2 * o * (nn - o) * 1_000_000 \
                // (nn * nn * (nn - 1))
        n1 -= o1
        n2 -= o2
    diff = o1_sum * 1_000_000 - e1_sum
    z2 = diff * diff // v_sum if v_sum > 0 else -1   # micro z²
    return pa.table({
        "n_click": pa.array([n1_tot], pa.int64()),
        "n_view": pa.array([n2_tot], pa.int64()),
        "o1": pa.array([o1_sum], pa.int64()),
        "e1_micro": pa.array([e1_sum], pa.int64()),
        "var_micro": pa.array([v_sum], pa.int64()),
        "z2_micro": pa.array([z2], pa.int64())})


_QUANT_BITS = (2, 4, 6, 8)


def q_quant_error_curve(sf_dir: str):
    """Embedding quantization error curve: exact integer squared
    reconstruction error (micro² units) of uniform b-bit quantization
    over [−1, 1] for b ∈ {2, 4, 6, 8} — the compression-planning
    companion to ``quantize_embeddings``.

    Scale plan: one streaming pass; 4 int64 partials per batch."""
    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = round_away(flat * 1_000_000, 0).astype(np.int64)
        cols = {"n": pa.array([len(q)], pa.int64())}
        for bits in _QUANT_BITS:
            lv = (1 << bits) - 1
            # code on the micro grid: round((q+1e6)·lv / 2e6)
            code = round_away((q + 1_000_000).astype(np.float64)
                              * lv / 2_000_000, 0).astype(np.int64)
            code = np.clip(code, 0, lv)
            recon = round_away(code.astype(np.float64) * 2_000_000
                               / lv, 0).astype(np.int64) - 1_000_000
            err = q - recon
            cols[f"e{bits}"] = pa.array([int((err * err).sum())],
                                        pa.int64())
        return pa.table(cols)

    parts = _read(sf_dir, "embeddings", ["embedding"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    n = sum(int(v) for v in parts["n"])
    rows = []
    for bits in _QUANT_BITS:
        e = sum(int(v) for v in parts[f"e{bits}"])
        rows.append((bits, n, e, e // n))
    return pa.table({
        "bits": pa.array([r[0] for r in rows], pa.int64()),
        "n_values": pa.array([r[1] for r in rows], pa.int64()),
        "sse_micro2": pa.array([r[2] for r in rows], pa.int64()),
        "mse_micro2": pa.array([r[3] for r in rows], pa.int64())})


QUERIES["log_rank_test"] = q_log_rank_test
QUERIES["quant_error_curve"] = q_quant_error_curve

ORACLE_SQL["log_rank_test"] = """
WITH r AS (SELECT user_id, event_type, epoch_us(ts) AS t,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
f AS (SELECT a.user_id, a.event_type AS grp,
             (b.t - a.t) // 86400000000 AS dur
      FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn = 2
      WHERE a.rn = 1 AND a.event_type IN ('click', 'view')),
h AS (SELECT grp, dur, CAST(count(*) AS BIGINT) AS n
      FROM f GROUP BY 1, 2),
d AS (SELECT dur,
             CAST(coalesce(sum(n) FILTER (WHERE grp = 'click'), 0)
                  AS BIGINT) AS o1,
             CAST(coalesce(sum(n) FILTER (WHERE grp = 'view'), 0)
                  AS BIGINT) AS o2
      FROM h GROUP BY 1),
rs AS (SELECT dur, o1, o2,
              CAST((SELECT coalesce(sum(n), 0) FROM h
                    WHERE grp = 'click') AS BIGINT)
                  - CAST(coalesce(sum(o1) OVER (ORDER BY dur
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS n1,
              CAST((SELECT coalesce(sum(n), 0) FROM h
                    WHERE grp = 'view') AS BIGINT)
                  - CAST(coalesce(sum(o2) OVER (ORDER BY dur
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS n2
       FROM d),
terms AS (SELECT o1,
                 n1 * (o1 + o2) * 1000000 // (n1 + n2) AS e1,
                 CASE WHEN n1 + n2 > 1 THEN
                     CAST(n1 AS HUGEINT) * n2 * (o1 + o2)
                     * ((n1 + n2) - (o1 + o2)) * 1000000
                     // (CAST(n1 + n2 AS HUGEINT) * (n1 + n2)
                         * ((n1 + n2) - 1))
                 ELSE 0 END AS v
          FROM rs),
agg AS (SELECT CAST(sum(o1) AS BIGINT) AS o1,
               CAST(sum(e1) AS BIGINT) AS e1,
               CAST(sum(v) AS BIGINT) AS v
        FROM terms)
SELECT (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM h
        WHERE grp = 'click') AS n_click,
       (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM h
        WHERE grp = 'view') AS n_view,
       o1, e1 AS e1_micro, v AS var_micro,
       CASE WHEN v > 0
            THEN CAST((CAST(o1 AS HUGEINT) * 1000000 - e1)
                      * (CAST(o1 AS HUGEINT) * 1000000 - e1)
                      // CAST(v AS HUGEINT) AS BIGINT)
            ELSE -1 END AS z2_micro
FROM agg
"""

ORACLE_SQL["quant_error_curve"] = """
WITH f AS (SELECT CAST(round(CAST(unnest(embedding) AS DOUBLE)
                             * 1000000) AS BIGINT) AS q
           FROM embeddings),
e AS (SELECT b.bits,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum((q - (CAST(round(
                 least(greatest(round((q + 1000000)
                     * ((1 << b.bits) - 1) / 2000000), 0),
                     (1 << b.bits) - 1) * 2000000
                 / ((1 << b.bits) - 1)) AS BIGINT) - 1000000))
                 * (q - (CAST(round(
                 least(greatest(round((q + 1000000)
                     * ((1 << b.bits) - 1) / 2000000), 0),
                     (1 << b.bits) - 1) * 2000000
                 / ((1 << b.bits) - 1)) AS BIGINT) - 1000000)))
                 AS BIGINT) AS sse
      FROM f CROSS JOIN (SELECT unnest([2, 4, 6, 8]) AS bits) b
      GROUP BY 1)
SELECT CAST(bits AS BIGINT) AS bits, n AS n_values,
       sse AS sse_micro2, sse // n AS mse_micro2
FROM e ORDER BY bits
"""


def q_fisher_ratio(sf_dir: str):
    """Fisher discriminant trace ratio of the labeled embedding
    cloud: ``trace(S_between)·10⁶ // trace(S_within)`` from exact
    integer per-label moments (micro grid) — one scalar for "are the
    labels linearly separable at all", next to
    ``label_centroid_dist``'s pairwise table.  With per-label count
    n_c, sum vector s_c, Σ|x|² = q_c and global (n, s), both engines
    compute the per-label single floors
    ``sw = Σ_c (q_c·n_c − |s_c|²) // n_c`` and
    ``sb = Σ_c |s_c·n − s·n_c|² // (n_c·n²)`` — all-positive integer
    divisions, mirrored verbatim.

    Scale plan: per-batch (label, count, sumvec, Σ|x|²) partials —
    labels×(d+2) int64 rows — one bounded groupby; driver fold."""
    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.num_rows
        d = len(flat) // n if n else 0
        q = round_away(flat * 1_000_000, 0).astype(np.int64) \
            .reshape(n, d)
        lab = b["label"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ls, inv = np.unique(lab, return_inverse=True)
        rows = []
        for i, lv in enumerate(ls):
            m = inv == i
            qs = q[m]
            rows.append((int(lv), int(m.sum()),
                         [int(x) for x in qs.sum(axis=0)],
                         int((qs * qs).sum())))
        return pa.table({
            "label": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "s": pa.array([r[2] for r in rows],
                          pa.list_(pa.int64())),
            "q2": pa.array([r[3] for r in rows], pa.int64())})

    parts = _read(sf_dir, "embeddings", ["embedding", "label"]) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=4096).to_pandas()
    acc: dict = {}
    for _, r in parts.iterrows():
        lv = int(r["label"])
        n0, s0, q0 = acc.get(lv, (0, None, 0))
        sv = [int(x) for x in r["s"]]
        if s0 is None:
            s0 = [0] * len(sv)
        acc[lv] = (n0 + int(r["n"]),
                   [a + b for a, b in zip(s0, sv)],
                   q0 + int(r["q2"]))
    n_tot = sum(v[0] for v in acc.values())
    d = len(next(iter(acc.values()))[1])
    s_tot = [sum(v[1][j] for v in acc.values()) for j in range(d)]
    sw = sb = 0
    for n_c, s_c, q_c in acc.values():
        sw += (q_c * n_c - sum(x * x for x in s_c)) // n_c
        num = sum((x * n_tot - g * n_c) ** 2
                  for x, g in zip(s_c, s_tot))
        sb += num // (n_c * n_tot * n_tot)
    return pa.table({
        "n_vecs": pa.array([n_tot], pa.int64()),
        "n_labels": pa.array([len(acc)], pa.int64()),
        "sw_micro2": pa.array([sw], pa.int64()),
        "sb_micro2": pa.array([sb], pa.int64()),
        "fisher_micro": pa.array([sb * 1_000_000 // sw
                                  if sw > 0 else -1], pa.int64())})


def q_kg_pred_obj_entropy(sf_dir: str):
    """Per-predicate object entropy on the L grid — how concentrated
    is each relation's object distribution?  (H ≈ 0 ⇒ near-functional
    predicate; high H ⇒ open relation) — the information-theoretic
    companion to ``kg_pred_card``'s distinct counts.
    ``h_micro = sign_mag(Σ c·(L(N_p)−L(c)), N_p)``.

    Scale plan: rides the dict-lane triples; (pred, obj) counts are
    one bounded groupby (objects shuffle as counts, never text
    beyond the object surface)."""
    from ray.data.aggregate import Sum

    trips = _dict_flagship_for(sf_dir)["triples"].select_columns(
        ["pred", "obj"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["pred", "obj"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"pred": g["pred"], "obj": g["obj"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    cells = trips.map_batches(partial, batch_format="pyarrow") \
        .groupby(["pred", "obj"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()

    import math

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    rows = []
    for pred, grp in cells.groupby("pred"):
        cs = [int(x) for x in grp["c"]]
        n_p = sum(cs)
        s = sum(c * (L(n_p) - L(c)) for c in cs)
        h = s // n_p if s >= 0 else -((-s) // n_p)
        rows.append((str(pred), len(cs), n_p, h))
    rows.sort()
    return pa.table({
        "pred": pa.array([r[0] for r in rows], pa.string()),
        "n_objects": pa.array([r[1] for r in rows], pa.int64()),
        "n_triples": pa.array([r[2] for r in rows], pa.int64()),
        "h_micro": pa.array([r[3] for r in rows], pa.int64())})


def q_round_price_bias(sf_dir: str):
    """Round-number bias census of order totals: counts of cents
    endings (.00 / .50 / .99 / other) — fabricated or hand-entered
    money columns overshoot round endings; organic ones don't.  One
    row per ending with the exact ppm share.

    Scale plan: pure map; 4-bounded partials."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        e = cents % 100
        ending = np.where(e == 0, "00",
                          np.where(e == 50, "50",
                                   np.where(e == 99, "99", "other")))
        g = pa.table({"ending": pa.array(ending, pa.string()),
                      "n": pa.array(np.ones(len(e), np.int64))}) \
            .group_by(["ending"], use_threads=False).aggregate(
            [("n", "sum")])
        return pa.table({"ending": g["ending"], "n": g["n_sum"]})

    agg = _read(sf_dir, "orders", ["o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("ending").aggregate(Sum("n", alias_name="n_orders")) \
        .to_pandas().sort_values("ending")
    tot = int(agg["n_orders"].sum())
    return pa.table({
        "ending": pa.array(agg["ending"].astype(str), pa.string()),
        "n_orders": pa.array(agg["n_orders"].astype(np.int64),
                             pa.int64()),
        "share_ppm": pa.array(
            [int(v) * 1_000_000 // tot for v in agg["n_orders"]],
            pa.int64())})


QUERIES["fisher_ratio"] = q_fisher_ratio
QUERIES["kg_pred_obj_entropy"] = q_kg_pred_obj_entropy
QUERIES["round_price_bias"] = q_round_price_bias

ORACLE_SQL["fisher_ratio"] = """
WITH f AS (SELECT vec_id, label,
                  CAST(round(CAST(unnest(embedding) AS DOUBLE)
                             * 1000000) AS BIGINT) AS q,
                  generate_subscripts(embedding, 1) AS pos
           FROM embeddings),
pl AS (SELECT label, CAST(pos - 1 AS BIGINT) AS dim,
              sum(CAST(q AS HUGEINT)) AS s,
              sum(CAST(q AS HUGEINT) * q) AS q2
       FROM f GROUP BY 1, 2),
lc AS (SELECT label, CAST(count(DISTINCT vec_id) AS HUGEINT) AS n
       FROM f GROUP BY 1),
gt AS (SELECT CAST(sum(n) AS HUGEINT) AS n FROM lc),
gs AS (SELECT dim, CAST(sum(s) AS HUGEINT) AS g FROM pl GROUP BY 1),
w AS (SELECT pl.label,
             (sum(pl.q2) * max(lc.n) - sum(pl.s * pl.s))
                 // max(lc.n) AS sw_c,
             sum((pl.s * (SELECT n FROM gt) - gs.g * lc.n)
                 * (pl.s * (SELECT n FROM gt) - gs.g * lc.n))
                 // (max(lc.n) * (SELECT n FROM gt)
                     * (SELECT n FROM gt)) AS sb_c
      FROM pl JOIN lc USING (label) JOIN gs USING (dim)
      GROUP BY pl.label),
agg AS (SELECT CAST(sum(sw_c) AS BIGINT) AS sw,
               CAST(sum(sb_c) AS BIGINT) AS sb
        FROM w)
SELECT CAST((SELECT n FROM gt) AS BIGINT) AS n_vecs,
       (SELECT CAST(count(*) AS BIGINT) FROM lc) AS n_labels,
       sw AS sw_micro2, sb AS sb_micro2,
       CASE WHEN sw > 0
            THEN CAST(CAST(sb AS HUGEINT) * 1000000 // sw AS BIGINT)
            ELSE -1 END AS fisher_micro
FROM agg
"""

ORACLE_SQL["round_price_bias"] = """
WITH e AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100
               AS e
           FROM orders),
c AS (SELECT CASE WHEN e = 0 THEN '00' WHEN e = 50 THEN '50'
                  WHEN e = 99 THEN '99' ELSE 'other' END AS ending,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM e GROUP BY 1)
SELECT ending, n_orders,
       CAST(CAST(n_orders AS HUGEINT) * 1000000
            // (SELECT sum(n_orders) FROM c) AS BIGINT) AS share_ppm
FROM c ORDER BY ending
"""

ORACLE_SQL["kg_pred_obj_entropy"] = _dict_oracle.pred_obj_entropy_sql()


def q_price_dispersion_topk(sf_dir: str):
    """Top-20 parts by unit-price dispersion (CV² of round unit
    cents, ppm): catalog items whose realized prices disagree most —
    the pricing-anomaly / data-entry-error detector.
    ``cv2_ppm = n(nQ − S²)·10⁶ // ((n−1)S²)``, parts with n < 5
    excluded; ties by partkey.

    Scale plan: per-batch partkey moment partials → one partkey
    groupby (3 int64 sums shuffle, never rows) → vectorized ppm →
    sort-limit."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        e = b["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        qn = b["l_quantity"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        unit = round_away(e * 100.0 / qn, 0).astype(np.int64)
        t = pa.table({"pk": b["l_partkey"],
                      "n": pa.array(np.ones(len(unit), np.int64)),
                      "s": pa.array(unit),
                      "q": pa.array(unit * unit)})
        g = t.group_by(["pk"], use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum"), ("q", "sum")])
        return pa.table({"pk": g["pk"], "n": g["n_sum"],
                         "s": g["s_sum"], "q": g["q_sum"]})

    agg = _read(sf_dir, "lineitem",
                ["l_partkey", "l_extendedprice", "l_quantity"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("pk").aggregate(Sum("n", alias_name="n"),
                                 Sum("s", alias_name="s"),
                                 Sum("q", alias_name="q"))

    def cv2(b: pa.Table) -> pa.Table:
        n = b["n"].combine_chunks().to_numpy(zero_copy_only=False)
        s = b["s"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(object)
        q = b["q"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(object)
        keep = n >= 5
        nn = n[keep].astype(object)
        ss, qq = s[keep], q[keep]
        v = [int(a * (a * c - b_ * b_) * 1_000_000
                 // ((a - 1) * b_ * b_))
             for a, b_, c in zip(nn, ss, qq)]
        return pa.table({
            "l_partkey": b["pk"].filter(pa.array(keep)),
            "n_lines": pa.array(n[keep].astype(np.int64)),
            "cv2_ppm": pa.array(v, pa.int64())})

    return agg.map_batches(cv2, batch_format="pyarrow") \
        .sort(["cv2_ppm", "l_partkey"], descending=[True, False]) \
        .limit(20)


def q_nonascii_census(sf_dir: str):
    """Non-ASCII character share per source (codepoints outside
    printable ASCII) — the mojibake / encoding-damage detector next
    to ``mixed_script_census``'s per-doc flags.

    Scale plan: one RE2 count per batch, source-bounded partials."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b["text"], "")
        total = pc.utf8_length(txt)
        na = pc.count_substring_regex(txt, r"[^\x20-\x7E]")
        g = pa.table({"source": b["source"],
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "ch": pc.cast(total, pa.int64()),
                      "na": pc.cast(na, pa.int64())}) \
            .group_by(["source"], use_threads=False).aggregate(
            [("n", "sum"), ("ch", "sum"), ("na", "sum")])
        return pa.table({"source": g["source"], "n": g["n_sum"],
                         "ch": g["ch_sum"], "na": g["na_sum"]})

    agg = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("ch", alias_name="n_chars"),
            Sum("na", alias_name="n_nonascii")).to_pandas() \
        .sort_values("source")
    ch = agg["n_chars"].to_numpy(dtype=np.int64)
    na = agg["n_nonascii"].to_numpy(dtype=np.int64)
    return pa.table({
        "source": pa.array(agg["source"].astype(str), pa.string()),
        "n_docs": pa.array(agg["n_docs"].astype(np.int64),
                           pa.int64()),
        "n_chars": pa.array(ch, pa.int64()),
        "n_nonascii": pa.array(na, pa.int64()),
        "nonascii_ppm": pa.array(
            np.where(ch > 0, na * 1_000_000 // np.maximum(ch, 1), 0),
            pa.int64())})


QUERIES["price_dispersion_topk"] = q_price_dispersion_topk
QUERIES["nonascii_census"] = q_nonascii_census

ORACLE_SQL["price_dispersion_topk"] = """
WITH u AS (SELECT l_partkey AS pk,
                  CAST(round(l_extendedprice * 100 / l_quantity)
                       AS BIGINT) AS unit
           FROM lineitem),
m AS (SELECT pk, CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(unit AS HUGEINT)) AS s,
             sum(CAST(unit AS HUGEINT) * unit) AS q
      FROM u GROUP BY 1 HAVING count(*) >= 5)
SELECT pk AS l_partkey, CAST(n AS BIGINT) AS n_lines,
       CAST(n * (n * q - s * s) * 1000000
            // ((n - 1) * s * s) AS BIGINT) AS cv2_ppm
FROM m ORDER BY cv2_ppm DESC, l_partkey LIMIT 20
"""

ORACLE_SQL["nonascii_census"] = r"""
WITH d AS (SELECT source, coalesce(text, '') AS text
           FROM documents),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(length(text)) AS BIGINT) AS n_chars,
             CAST(sum(length(text)
                      - length(regexp_replace(text,
                          '[^\x20-\x7E]', '', 'g'))) AS BIGINT)
                 AS n_nonascii
      FROM d GROUP BY 1)
SELECT source, n_docs, n_chars, n_nonascii,
       CASE WHEN n_chars > 0
            THEN n_nonascii * 1000000 // n_chars ELSE 0 END
           AS nonascii_ppm
FROM a ORDER BY source
"""


def q_discount_lift(sf_dir: str):
    """Quantity lift by discount band (discount·100 = 0..10): line
    count, exact mean quantity in ppm and revenue share per band —
    does discounting actually move volume?

    Scale plan: 11-bounded combiner partials, zero shuffle beyond
    the tiny band groupby."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        d = round_away(
            b["l_discount"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        qn = np.rint(b["l_quantity"].combine_chunks()
                     .to_numpy(zero_copy_only=False)).astype(np.int64)
        rev = round_away(
            b["l_extendedprice"].combine_chunks()
            .to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].combine_chunks()
               .to_numpy(zero_copy_only=False)) * 100,
            0).astype(np.int64)
        g = pa.table({"band": pa.array(d),
                      "n": pa.array(np.ones(len(d), np.int64)),
                      "q": pa.array(qn), "r": pa.array(rev)}) \
            .group_by(["band"], use_threads=False).aggregate(
            [("n", "sum"), ("q", "sum"), ("r", "sum")])
        return pa.table({"band": g["band"], "n": g["n_sum"],
                         "q": g["q_sum"], "r": g["r_sum"]})

    agg = _read(sf_dir, "lineitem",
                ["l_discount", "l_quantity", "l_extendedprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("band").aggregate(
            Sum("n", alias_name="n_lines"),
            Sum("q", alias_name="sum_qty"),
            Sum("r", alias_name="rev_cents")).to_pandas() \
        .sort_values("band")
    tot_rev = sum(int(v) for v in agg["rev_cents"])
    return pa.table({
        "discount_band": pa.array(agg["band"].astype(np.int64),
                                  pa.int64()),
        "n_lines": pa.array(agg["n_lines"].astype(np.int64),
                            pa.int64()),
        "mean_qty_ppm": pa.array(
            [int(q) * 1_000_000 // int(n)
             for q, n in zip(agg["sum_qty"], agg["n_lines"])],
            pa.int64()),
        "rev_cents": pa.array(agg["rev_cents"].astype(np.int64),
                              pa.int64()),
        "rev_share_ppm": pa.array(
            [int(r) * 1_000_000 // tot_rev
             for r in agg["rev_cents"]], pa.int64())})


def q_vocab_overlap(sf_dir: str):
    """Pairwise vocabulary overlap coefficient between sources:
    ``overlap_ppm = |A∩B|·10⁶ // min(|A|,|B|)`` over token TYPE sets
    — the set-level companion to ``source_jsd``'s distributional
    divergence (high overlap + high JSD ⇒ same words, different
    mixes).

    Scale plan: (source, token) distinct rows → hash(token)%P
    partitions; per partition one dense presence matrix and a single
    int matmul emits all C(S,2) intersection partials — the
    vocabulary itself is never collected."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b["text"], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        src = b["source"].take(par)
        g = pa.table({"source": src, "w": flat}) \
            .group_by(["source", "w"], use_threads=False) \
            .aggregate([])
        return g

    from ray.data.aggregate import Count

    distinct = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "w"]).aggregate(Count(alias_name="__c"))

    P = 64

    def tag(b: pa.Table) -> pa.Table:
        b = b.drop_columns(["__c"])
        return b.append_column("__p",
                               pa.array(_part_codes(b["w"], P)))

    def inter_partial(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__p"])
        w = t["w"].combine_chunks().dictionary_encode()
        tok = w.indices.to_numpy(zero_copy_only=False)
        nv = len(w.dictionary)
        s = t["source"].combine_chunks().dictionary_encode()
        sidx = s.indices.to_numpy(zero_copy_only=False)
        snames = [str(x) for x in s.dictionary.to_pylist()]
        ns = len(snames)
        pres = np.zeros((ns, nv), np.int64)
        pres[sidx, tok] = 1
        inter = pres @ pres.T
        ia, ib, iv, sa, sb = [], [], [], [], []
        for i in range(ns):
            for j in range(ns):
                if snames[i] < snames[j]:
                    sa.append(snames[i])
                    sb.append(snames[j])
                    iv.append(int(inter[i, j]))
        sz_s, sz_n = snames, [int(x) for x in pres.sum(axis=1)]
        return pa.table({
            "sa": pa.array(sa + sz_s, pa.string()),
            "sb": pa.array(sb + [""] * len(sz_s), pa.string()),
            "v": pa.array(iv + sz_n, pa.int64())})

    parts = distinct.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(inter_partial,
                                   batch_format="pyarrow") \
        .groupby(["sa", "sb"]).aggregate(Sum("v", alias_name="v")) \
        .to_pandas()
    sizes = {r["sa"]: int(r["v"]) for _, r in parts.iterrows()
             if r["sb"] == ""}
    inter = {(str(r["sa"]), str(r["sb"])): int(r["v"])
             for _, r in parts.iterrows() if r["sb"] != ""}
    import itertools

    rows = []
    for a, b_ in itertools.combinations(sorted(sizes), 2):
        v = inter.get((a, b_), 0)
        mn = min(sizes[a], sizes[b_])
        rows.append((a, b_, sizes[a], sizes[b_], v,
                     v * 1_000_000 // mn))
    return pa.table({
        "src_a": pa.array([r[0] for r in rows], pa.string()),
        "src_b": pa.array([r[1] for r in rows], pa.string()),
        "types_a": pa.array([r[2] for r in rows], pa.int64()),
        "types_b": pa.array([r[3] for r in rows], pa.int64()),
        "n_common": pa.array([r[4] for r in rows], pa.int64()),
        "overlap_ppm": pa.array([r[5] for r in rows], pa.int64())})


QUERIES["discount_lift"] = q_discount_lift
QUERIES["vocab_overlap"] = q_vocab_overlap

ORACLE_SQL["discount_lift"] = """
WITH b AS (SELECT CAST(round(l_discount * 100) AS BIGINT) AS band,
                  CAST(round(l_quantity) AS BIGINT) AS q,
                  CAST(round(l_extendedprice * (1.0 - l_discount)
                             * 100) AS BIGINT) AS r
           FROM lineitem),
a AS (SELECT band, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(q) AS BIGINT) AS sq,
             CAST(sum(r) AS BIGINT) AS rev_cents
      FROM b GROUP BY 1)
SELECT band AS discount_band, n_lines,
       CAST(CAST(sq AS HUGEINT) * 1000000 // n_lines AS BIGINT)
           AS mean_qty_ppm,
       rev_cents,
       CAST(CAST(rev_cents AS HUGEINT) * 1000000
            // (SELECT sum(rev_cents) FROM a) AS BIGINT)
           AS rev_share_ppm
FROM a ORDER BY discount_band
"""

ORACLE_SQL["vocab_overlap"] = r"""
WITH toks AS (SELECT source,
                     unnest(regexp_extract_all(coalesce(text, ''),
                                               '\S+')) AS w
              FROM documents),
v AS (SELECT DISTINCT source, w FROM toks),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
       FROM v GROUP BY 1),
iv AS (SELECT a.source AS sa, b.source AS sb,
              CAST(count(*) AS BIGINT) AS n_common
       FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
       GROUP BY 1, 2)
SELECT p.sa AS src_a, p.sb AS src_b,
       za.n AS types_a, zb.n AS types_b,
       coalesce(iv.n_common, 0) AS n_common,
       coalesce(iv.n_common, 0) * 1000000
           // CASE WHEN za.n < zb.n THEN za.n ELSE zb.n END
           AS overlap_ppm
FROM (SELECT a.source AS sa, b.source AS sb
      FROM sz a JOIN sz b ON a.source < b.source) p
JOIN sz za ON za.source = p.sa
JOIN sz zb ON zb.source = p.sb
LEFT JOIN iv ON iv.sa = p.sa AND iv.sb = p.sb
ORDER BY src_a, src_b
"""


def q_dup_cluster_sources(sf_dir: str):
    """Cross-source reach of near-duplicate clusters: for each
    connected near-dup cluster, how many distinct sources does it
    span?  Histogram (n_sources → clusters, docs) — single-source
    clusters are scraper echo, multi-source ones are syndication /
    contamination (the cluster-level view above
    ``cross_source_dups``'s pair counts).

    Scale plan: rides ``dup_clusters``' component labels; one
    doc_id-keyed cogroup attaches source; per-batch distinct
    (cluster, source) partials → one cluster-keyed groupby →
    bounded histogram."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import cogroup_partition_ds

    # source-AGNOSTIC blocking (len bucket only) — the whole point is
    # clusters that cross sources, which jaccard_pairs' per-source
    # blocking precludes by construction
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def add_bucket(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b["text"]) \
            .to_numpy(zero_copy_only=False)
        return b.append_column(
            "len_bucket", pa.array((lens % 16).astype(np.int64)))

    pairs = F_dedup.jaccard_blocked_pairs_ds(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        block_cols=("len_bucket",), theta=0.2)
    clusters = F_dedup.dup_clusters_ds(pairs)
    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep = (nl > 0) & (nr > 0)
        if not keep.any():
            return pa.table({"cluster_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string())})
        lidx = pa.array(starts[keep])
        ridx = pa.array((starts + nl)[keep])
        return pa.table({
            "cluster_id": t["cluster_id"].take(lidx),
            "source": t["source"].take(ridx)})

    joined = cogroup_partition_ds(
        clusters, docs, "doc_id", "doc_id", fuse,
        ["cluster_id"], ["source"],
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("cluster_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("source", pa.string())]))

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["cluster_id", "source"],
                       use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"cluster_id": g["cluster_id"],
                         "source": g["source"],
                         "nd": pc.cast(g["count_all"], pa.int64())})

    cells = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby(["cluster_id", "source"]) \
        .aggregate(Sum("nd", alias_name="nd")).to_pandas()
    per = cells.groupby("cluster_id").agg(
        ns=("source", "nunique"), nd=("nd", "sum"))
    hist = per.groupby("ns").agg(n_clusters=("nd", "size"),
                                 n_docs=("nd", "sum"))
    return pa.table({
        "n_sources": pa.array(
            [int(x) for x in hist.index], pa.int64()),
        "n_clusters": pa.array(
            hist["n_clusters"].astype(np.int64).to_numpy(),
            pa.int64()),
        "n_docs": pa.array(
            hist["n_docs"].astype(np.int64).to_numpy(), pa.int64())})


def q_type_hour_jsd(sf_dir: str):
    """Pairwise Jensen–Shannon divergence between event types'
    hour-of-day profiles (L grid, same integer formulation as
    ``source_jsd``) — which behaviors share a daily rhythm?

    Scale plan: one types×24-bounded combiner groupby; the 10-pair
    fold runs on the driver."""
    from ray.data.aggregate import Sum

    import math

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.hour(b["ts"].combine_chunks())
        t = pa.table({"et": b["event_type"], "h": hour,
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["et", "h"], use_threads=False).aggregate(
            [("one", "sum")])
        return pa.table({"et": g["et"],
                         "h": pc.cast(g["h"], pa.int64()),
                         "n": g["one_sum"]})

    cells = _read(sf_dir, "events", ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["et", "h"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    def sdiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    prof: dict = {}
    for _, r in cells.iterrows():
        prof.setdefault(str(r["et"]), {})[int(r["h"])] = int(r["n"])
    types = sorted(prof)
    rows = []
    for i, x in enumerate(types):
        for y in types[i + 1:]:
            a_, b_ = prof[x], prof[y]
            A = sum(a_.values())
            B = sum(b_.values())
            sa = sb = 0
            for h in set(a_) | set(b_):
                a = a_.get(h, 0)
                b2 = b_.get(h, 0)
                mix = a * B + b2 * A
                if a > 0:
                    sa += a * (L(2 * a * B) - L(mix))
                if b2 > 0:
                    sb += b2 * (L(2 * b2 * A) - L(mix))
            rows.append((x, y, sdiv(sa, 2 * A) + sdiv(sb, 2 * B)))
    return pa.table({
        "type_a": pa.array([r[0] for r in rows], pa.string()),
        "type_b": pa.array([r[1] for r in rows], pa.string()),
        "jsd_micro": pa.array([r[2] for r in rows], pa.int64())})


QUERIES["dup_cluster_sources"] = q_dup_cluster_sources
QUERIES["type_hour_jsd"] = q_type_hour_jsd

ORACLE_SQL["dup_cluster_sources"] = ORACLE_SQL["dup_clusters"].replace(
    "ON a.source = b.source AND a.len_bucket = b.len_bucket",
    "ON a.len_bucket = b.len_bucket").replace(
    "SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id",
    """, cl AS (SELECT id AS doc_id, min(r) AS cluster_id
              FROM reach GROUP BY id),
    j AS (SELECT cl.cluster_id, d2.source
          FROM cl JOIN documents d2 USING (doc_id)),
    per AS (SELECT cluster_id,
                   CAST(count(DISTINCT source) AS BIGINT) AS ns,
                   CAST(count(*) AS BIGINT) AS nd
            FROM j GROUP BY 1)
    SELECT ns AS n_sources, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(nd) AS BIGINT) AS n_docs
    FROM per GROUP BY 1 ORDER BY 1""")

ORACLE_SQL["type_hour_jsd"] = """
WITH c AS (SELECT event_type AS et,
                  CAST(hour(ts) AS BIGINT) AS h,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
t AS (SELECT et, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
p AS (SELECT a.et AS ta, b.et AS tb, a.tot AS sa, b.tot AS sb
      FROM t a JOIN t b ON a.et < b.et),
hrs AS (SELECT DISTINCT h FROM c),
cells AS (SELECT p.ta, p.tb, p.sa, p.sb,
                 coalesce(ca.n, 0) AS a, coalesce(cb.n, 0) AS b
          FROM p CROSS JOIN hrs
          LEFT JOIN c ca ON ca.et = p.ta AND ca.h = hrs.h
          LEFT JOIN c cb ON cb.et = p.tb AND cb.h = hrs.h
          WHERE coalesce(ca.n, 0) > 0 OR coalesce(cb.n, 0) > 0),
terms AS (SELECT ta, tb, sa, sb,
                 CASE WHEN a > 0 THEN
                     a * (CAST(floor(ln(2 * a * sb) * 1000000 + 0.5)
                               AS BIGINT)
                          - CAST(floor(ln(a * sb + b * sa) * 1000000
                                       + 0.5) AS BIGINT))
                 ELSE 0 END AS xa,
                 CASE WHEN b > 0 THEN
                     b * (CAST(floor(ln(2 * b * sa) * 1000000 + 0.5)
                               AS BIGINT)
                          - CAST(floor(ln(a * sb + b * sa) * 1000000
                                       + 0.5) AS BIGINT))
                 ELSE 0 END AS xb
          FROM cells),
s AS (SELECT ta, tb, sa, sb, CAST(sum(xa) AS BIGINT) AS suma,
             CAST(sum(xb) AS BIGINT) AS sumb
      FROM terms GROUP BY 1, 2, 3, 4)
SELECT ta AS type_a, tb AS type_b,
       (CASE WHEN suma >= 0 THEN suma // (2 * sa)
             ELSE -((-suma) // (2 * sa)) END
        + CASE WHEN sumb >= 0 THEN sumb // (2 * sb)
               ELSE -((-sumb) // (2 * sb)) END) AS jsd_micro
FROM s ORDER BY type_a, type_b
"""


_DEDUP_THRESHOLDS = (20, 40, 60, 80)


def q_dedup_threshold_curve(sf_dir: str):
    """Near-dup pair count as a function of the Jaccard threshold
    (20/40/60/80%), from ONE blocked-pairs pass — the
    choose-your-theta curve that turns dedup tuning from rerun-
    and-pray into a single scan.  Also reports docs touched at each
    level.

    Scale plan: rides ``jaccard_pairs``' blocked verify (pairs only,
    never text); per-batch threshold partials → 4-bounded fold."""
    pairs = q_jaccard_pairs(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        j = b["jaccard"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        rows = {"thr": [], "n": []}
        for t in _DEDUP_THRESHOLDS:
            rows["thr"].append(t)
            rows["n"].append(int((j >= t / 100.0).sum()))
        return pa.table({"thr": pa.array(rows["thr"], pa.int64()),
                         "n": pa.array(rows["n"], pa.int64())})

    parts = pairs.map_batches(partial,
                              batch_format="pyarrow").to_pandas()
    agg = {t: 0 for t in _DEDUP_THRESHOLDS}
    for _, r in parts.iterrows():
        agg[int(r["thr"])] += int(r["n"])
    return pa.table({
        "threshold_pct": pa.array(sorted(agg), pa.int64()),
        "n_pairs": pa.array([agg[t] for t in sorted(agg)],
                            pa.int64())})


def q_lang_script_check(sf_dir: str):
    """Language-vs-script consistency QA: per declared lang, how many
    documents contain Han characters — flags zh rows with no CJK at
    all and non-zh rows dominated by CJK (label noise / encoding
    damage the ``lang`` column hides).

    Scale plan: one RE2 scan, lang-bounded partials."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b["text"], "")
        han = pc.match_substring_regex(txt, r"\p{Han}")
        g = pa.table({"lang": b["lang"],
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "han": pc.cast(han, pa.int64())}) \
            .group_by(["lang"], use_threads=False).aggregate(
            [("n", "sum"), ("han", "sum")])
        return pa.table({"lang": g["lang"], "n": g["n_sum"],
                         "han": g["han_sum"]})

    agg = _read(sf_dir, "documents", ["lang", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("han", alias_name="n_with_han")).to_pandas() \
        .sort_values("lang")
    nd = agg["n_docs"].to_numpy(dtype=np.int64)
    nh = agg["n_with_han"].to_numpy(dtype=np.int64)
    return pa.table({
        "lang": pa.array(agg["lang"].astype(str), pa.string()),
        "n_docs": pa.array(nd, pa.int64()),
        "n_with_han": pa.array(nh, pa.int64()),
        "han_ppm": pa.array(nh * 1_000_000 // nd, pa.int64())})


QUERIES["dedup_threshold_curve"] = q_dedup_threshold_curve
QUERIES["lang_script_check"] = q_lang_script_check

ORACLE_SQL["dedup_threshold_curve"] = """
WITH d AS (SELECT doc_id, source, length(text) % 16 AS len_bucket,
                  text
           FROM documents),
sh AS (SELECT DISTINCT doc_id, source, len_bucket,
              substring(text, g.i, 5) AS s
       FROM d, generate_series(1, 4096) g(i)
       WHERE g.i <= greatest(length(text) - 4, 1)),
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
          FROM sh a JOIN sh b
            ON a.source = b.source AND a.len_bucket = b.len_bucket
           AND a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
p AS (SELECT round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 4) AS j
      FROM inter
      JOIN counts ca ON ca.doc_id = ia
      JOIN counts cb ON cb.doc_id = ib
      WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2)
SELECT t.thr AS threshold_pct,
       (SELECT CAST(count(*) AS BIGINT) FROM p
        WHERE j >= t.thr / 100.0) AS n_pairs
FROM (SELECT unnest([20, 40, 60, 80]) AS thr) t
ORDER BY threshold_pct
"""

ORACLE_SQL["lang_script_check"] = r"""
WITH d AS (SELECT lang, coalesce(text, '') AS text FROM documents),
a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(*) FILTER (WHERE regexp_matches(text,
                 '\p{Han}')) AS BIGINT) AS n_with_han
      FROM d GROUP BY 1)
SELECT lang, n_docs, n_with_han,
       n_with_han * 1000000 // n_docs AS han_ppm
FROM a ORDER BY lang
"""


def q_kg_doc_yield(sf_dir: str):
    """KG construction yield: of all corpus documents, how many
    produced ≥1 mention and ≥1 triple — the end-to-end extraction
    health number (a yield drop localizes to tagger vs extractor).

    Scale plan: two distinct-doc count folds over the dict-lane
    mention / triple streams + one corpus count; only doc ids
    shuffle."""
    res = _dict_flagship_for(sf_dir)

    def distinct_docs(ds, col: str) -> int:
        from ray.data.aggregate import Count

        def partial(b: pa.Table) -> pa.Table:
            g = b.select([col]).group_by([col],
                                         use_threads=False).aggregate([])
            return g

        return ds.select_columns([col]) \
            .map_batches(partial, batch_format="pyarrow") \
            .groupby(col).aggregate(Count(alias_name="__c")) \
            .count()

    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    n_ment = distinct_docs(res["mentions"], "doc_id")
    n_trip = distinct_docs(res["triples"], "doc_id")
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "docs_with_mentions": pa.array([n_ment], pa.int64()),
        "docs_with_triples": pa.array([n_trip], pa.int64()),
        "mention_yield_ppm": pa.array(
            [n_ment * 1_000_000 // n_docs], pa.int64()),
        "triple_yield_ppm": pa.array(
            [n_trip * 1_000_000 // n_docs], pa.int64())})


def q_kg_support_stats(sf_dir: str):
    """Per-predicate edge-support distribution after dedup: edges,
    total support, max support and the exact lower-median support —
    which relations rest on single sightings vs repeated evidence?

    Scale plan: rides the deduped edges table; support is a small
    integer domain, so the median walks a bounded histogram."""
    from ray.data.aggregate import Sum

    edges = _dict_flagship_for(sf_dir)["edges"] \
        .select_columns(["pred", "support"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["pred", "support"],
                       use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"pred": g["pred"],
                         "support": pc.cast(g["support"], pa.int64()),
                         "n": pc.cast(g["count_all"], pa.int64())})

    cells = edges.map_batches(partial, batch_format="pyarrow") \
        .groupby(["pred", "support"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    rows = []
    for pred, grp in cells.groupby("pred"):
        grp = grp.sort_values("support")
        n_edges = int(grp["n"].sum())
        tot = sum(int(s) * int(c)
                  for s, c in zip(grp["support"], grp["n"]))
        r_med = (n_edges + 1) // 2
        cum = 0
        med = None
        for _, r in grp.iterrows():
            cum += int(r["n"])
            if med is None and cum >= r_med:
                med = int(r["support"])
        rows.append((str(pred), n_edges, tot,
                     int(grp["support"].max()), med))
    rows.sort()
    return pa.table({
        "pred": pa.array([r[0] for r in rows], pa.string()),
        "n_edges": pa.array([r[1] for r in rows], pa.int64()),
        "total_support": pa.array([r[2] for r in rows], pa.int64()),
        "max_support": pa.array([r[3] for r in rows], pa.int64()),
        "median_support": pa.array([r[4] for r in rows], pa.int64())})


def q_kg_multi_pred_pairs(sf_dir: str):
    """Multi-relation entity pairs: (subj, obj) pairs connected by
    more than one predicate after dedup — relation redundancy /
    conflict candidates (is `works_for` + `founded` signal, or an
    extractor leak?).  One row per predicate-multiplicity bucket.

    Scale plan: (subj, obj) pred-count groupby over the edges table
    (ids only shuffle), bounded multiplicity histogram."""
    from ray.data.aggregate import Sum

    edges = _dict_flagship_for(sf_dir)["edges"] \
        .select_columns(["subj", "obj", "pred"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["subj", "obj"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"subj": g["subj"], "obj": g["obj"],
                         "np": pc.cast(g["count_all"], pa.int64())})

    counts = edges.map_batches(partial, batch_format="pyarrow") \
        .groupby(["subj", "obj"]).aggregate(Sum("np",
                                                alias_name="np"))

    def hist(b: pa.Table) -> pa.Table:
        np_ = b["np"].combine_chunks().to_numpy(zero_copy_only=False)
        ks, cnt = np.unique(np_, return_counts=True)
        return pa.table({"n_preds": pa.array(ks.astype(np.int64)),
                         "n_pairs": pa.array(cnt.astype(np.int64))})

    return counts.map_batches(hist, batch_format="pyarrow") \
        .groupby("n_preds").aggregate(Sum("n_pairs",
                                          alias_name="n_pairs")) \
        .sort("n_preds")


def q_kg_sent_yield(sf_dir: str):
    """Triples-per-sentence histogram over the pre-dedup triple
    stream — the extraction-density profile (0-heavy ⇒ rules too
    tight; a fat tail ⇒ a template sentence is flooding the graph).
    Sentences with no triples are counted via the sentence stream.

    Scale plan: (doc, sent) triple counts via one bounded groupby;
    the zero bucket folds from the sentence count."""
    from ray.data.aggregate import Sum

    res = _dict_flagship_for(sf_dir)
    trips = res["triples"].select_columns(["doc_id", "sent_idx"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["doc_id", "sent_idx"],
                       use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"doc_id": g["doc_id"],
                         "sent_idx": g["sent_idx"],
                         "nt": pc.cast(g["count_all"], pa.int64())})

    per_sent = trips.map_batches(partial, batch_format="pyarrow") \
        .groupby(["doc_id", "sent_idx"]) \
        .aggregate(Sum("nt", alias_name="nt"))

    def hist(b: pa.Table) -> pa.Table:
        nt = b["nt"].combine_chunks().to_numpy(zero_copy_only=False)
        ks, cnt = np.unique(nt, return_counts=True)
        return pa.table({"n_triples": pa.array(ks.astype(np.int64)),
                         "n_sents": pa.array(cnt.astype(np.int64))})

    agg = per_sent.map_batches(hist, batch_format="pyarrow") \
        .groupby("n_triples").aggregate(Sum("n_sents",
                                            alias_name="n_sents")) \
        .to_pandas()
    n_sent_total = res["sentences"].count()
    nonzero = int(agg["n_sents"].sum())
    rows = [(0, n_sent_total - nonzero)] + sorted(
        (int(r["n_triples"]), int(r["n_sents"]))
        for _, r in agg.iterrows())
    return pa.table({
        "n_triples": pa.array([r[0] for r in rows], pa.int64()),
        "n_sents": pa.array([r[1] for r in rows], pa.int64())})


QUERIES["kg_doc_yield"] = q_kg_doc_yield
QUERIES["kg_support_stats"] = q_kg_support_stats
QUERIES["kg_multi_pred_pairs"] = q_kg_multi_pred_pairs
QUERIES["kg_sent_yield"] = q_kg_sent_yield

ORACLE_SQL["kg_doc_yield"] = _dict_oracle.doc_yield_sql()
ORACLE_SQL["kg_support_stats"] = _dict_oracle.support_stats_sql()
ORACLE_SQL["kg_multi_pred_pairs"] = _dict_oracle.multi_pred_pairs_sql()
ORACLE_SQL["kg_sent_yield"] = _dict_oracle.sent_yield_sql()


def q_order_width_dist(sf_dir: str):
    """Lineitems-per-order histogram — the order-width profile that
    sizes the basket-join fanout (``basket_pairs``' O(k²) cost rides
    this distribution's tail).

    Scale plan: per-batch orderkey count partials → one orderkey
    groupby → bounded width histogram."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"ok": g["l_orderkey"],
                         "w": pc.cast(g["count_all"], pa.int64())})

    widths = _read(sf_dir, "lineitem", ["l_orderkey"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("ok").aggregate(Sum("w", alias_name="w"))

    def hist(b: pa.Table) -> pa.Table:
        w = b["w"].combine_chunks().to_numpy(zero_copy_only=False)
        ks, cnt = np.unique(w, return_counts=True)
        return pa.table({"n_lines": pa.array(ks.astype(np.int64)),
                         "n_orders": pa.array(cnt.astype(np.int64))})

    return widths.map_batches(hist, batch_format="pyarrow") \
        .groupby("n_lines").aggregate(Sum("n_orders",
                                          alias_name="n_orders")) \
        .sort("n_lines")


def q_kg_surface_len_stats(sf_dir: str):
    """Entity surface-form length census per type (codepoints):
    count, exact mean length in ppm, min and max — the
    gazetteer-drift check (a LOC type whose mean length jumps has
    started absorbing sentence fragments).

    Scale plan: rides the deduped node table; per-batch (etype, n,
    Σlen, min, max) partials → one type-bounded groupby."""
    from ray.data.aggregate import Max, Min, Sum

    nodes = _dict_flagship_for(sf_dir)["nodes"] \
        .select_columns(["surface", "etype"])

    def partial(b: pa.Table) -> pa.Table:
        ln = pc.utf8_length(b["surface"])
        t = pa.table({"etype": b["etype"],
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "s": pc.cast(ln, pa.int64()),
                      "mn": pc.cast(ln, pa.int64()),
                      "mx": pc.cast(ln, pa.int64())})
        g = t.group_by(["etype"], use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum"), ("mn", "min"), ("mx", "max")])
        return pa.table({"etype": g["etype"], "n": g["n_sum"],
                         "s": g["s_sum"], "mn": g["mn_min"],
                         "mx": g["mx_max"]})

    agg = nodes.map_batches(partial, batch_format="pyarrow") \
        .groupby("etype").aggregate(
            Sum("n", alias_name="n_surfaces"),
            Sum("s", alias_name="s"),
            Min("mn", alias_name="min_len"),
            Max("mx", alias_name="max_len")).to_pandas() \
        .sort_values("etype")
    return pa.table({
        "etype": pa.array(agg["etype"].astype(str), pa.string()),
        "n_surfaces": pa.array(agg["n_surfaces"].astype(np.int64),
                               pa.int64()),
        "mean_len_ppm": pa.array(
            [int(s) * 1_000_000 // int(n)
             for s, n in zip(agg["s"], agg["n_surfaces"])],
            pa.int64()),
        "min_len": pa.array(agg["min_len"].astype(np.int64),
                            pa.int64()),
        "max_len": pa.array(agg["max_len"].astype(np.int64),
                            pa.int64())})


QUERIES["order_width_dist"] = q_order_width_dist
QUERIES["kg_surface_len_stats"] = q_kg_surface_len_stats

ORACLE_SQL["order_width_dist"] = """
WITH w AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS w
           FROM lineitem GROUP BY 1)
SELECT w AS n_lines, CAST(count(*) AS BIGINT) AS n_orders
FROM w GROUP BY 1 ORDER BY n_lines
"""

ORACLE_SQL["kg_surface_len_stats"] = _dict_oracle.surface_len_stats_sql()


def q_knn_mutual_rate(sf_dir: str):
    """Mutuality of the exact cosine kNN graph (k=3): the share of
    directed edges whose reverse is also a kNN edge — low mutuality
    is the classic hubness symptom (a few points dominate everyone's
    neighbor lists while their own lists ignore the crowd).

    Scale plan: rides the blocked kNN graph; undirected pair counts
    via one (lo, hi) groupby of id pairs."""
    from ray.data.aggregate import Sum

    edges = q_knn_graph(sf_dir)

    def pairkey(b: pa.Table) -> pa.Table:
        q = b["query_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        nb = b["neighbor_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "lo": pa.array(np.minimum(q, nb).astype(np.int64)),
            "hi": pa.array(np.maximum(q, nb).astype(np.int64)),
            "one": pa.array(np.ones(len(q), np.int64))})

    cnt = edges.map_batches(pairkey, batch_format="pyarrow") \
        .groupby(["lo", "hi"]).aggregate(Sum("one", alias_name="c")) \
        .to_pandas()
    n_edges = int(cnt["c"].sum())
    n_mutual = 2 * int((cnt["c"] == 2).sum())
    n_points = _read(sf_dir, "embeddings", ["vec_id"]).count()
    return pa.table({
        "n_points": pa.array([n_points], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_mutual": pa.array([n_mutual], pa.int64()),
        "mutual_ppm": pa.array([n_mutual * 1_000_000 // n_edges],
                               pa.int64())})


def q_knn_indegree_dist(sf_dir: str):
    """In-degree histogram of the exact cosine kNN graph (k=3) —
    the hub census itself: how many points are nobody's neighbor
    (in-degree 0) vs everyone's (fat tail)?

    Scale plan: neighbor-keyed count groupby; zero bucket from the
    vector count."""
    from ray.data.aggregate import Sum

    edges = q_knn_graph(sf_dir).select_columns(["neighbor_id"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["neighbor_id"],
                       use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"nb": g["neighbor_id"],
                         "d": pc.cast(g["count_all"], pa.int64())})

    deg = edges.map_batches(partial, batch_format="pyarrow") \
        .groupby("nb").aggregate(Sum("d", alias_name="d")) \
        .to_pandas()
    hist: dict = {}
    for _, r in deg.iterrows():
        d = int(r["d"])
        hist[d] = hist.get(d, 0) + 1
    n_points = _read(sf_dir, "embeddings", ["vec_id"]).count()
    hist[0] = n_points - len(deg)
    ks = sorted(k for k in hist if hist[k] > 0)
    return pa.table({
        "indegree": pa.array(ks, pa.int64()),
        "n_points": pa.array([hist[k] for k in ks], pa.int64())})


QUERIES["knn_mutual_rate"] = q_knn_mutual_rate
QUERIES["knn_indegree_dist"] = q_knn_indegree_dist

_KNN_EDGES_CTE = """
WITH s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                      AS sim
           FROM embeddings a JOIN embeddings b
             ON a.vec_id <> b.vec_id),
r AS (SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id)
                 AS rk
      FROM s),
e AS (SELECT query_id, neighbor_id FROM r WHERE rk <= 3)
"""

ORACLE_SQL["knn_mutual_rate"] = _KNN_EDGES_CTE + """,
p AS (SELECT least(query_id, neighbor_id) AS lo,
             greatest(query_id, neighbor_id) AS hi,
             CAST(count(*) AS BIGINT) AS c
      FROM e GROUP BY 1, 2),
m AS (SELECT CAST(sum(c) AS BIGINT) AS n_edges,
             CAST(coalesce(sum(2) FILTER (WHERE c = 2), 0)
                  AS BIGINT) AS n_mutual
      FROM p)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
           AS n_points,
       n_edges, n_mutual,
       n_mutual * 1000000 // n_edges AS mutual_ppm
FROM m
"""

ORACLE_SQL["knn_indegree_dist"] = _KNN_EDGES_CTE + """,
d AS (SELECT neighbor_id, CAST(count(*) AS BIGINT) AS deg
      FROM e GROUP BY 1),
h AS (SELECT deg AS indegree, CAST(count(*) AS BIGINT) AS n_points
      FROM d GROUP BY 1),
z AS (SELECT CAST(0 AS BIGINT) AS indegree,
             (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
                 - (SELECT CAST(count(*) AS BIGINT) FROM d)
                 AS n_points)
SELECT * FROM z WHERE n_points > 0
UNION ALL SELECT * FROM h ORDER BY indegree
"""


def q_customer_rev_deciles(sf_dir: str):
    """Customer revenue decile table (rank deciles, revenue desc):
    per decile the customer count, exact revenue cents and ppm share
    — the whale curve behind ``pareto_share``'s single cut.

    Scale plan: same two-level banded prefix as ``abc_parts`` but
    accumulating RANK offsets (counts) instead of revenue: per-band
    counts fold on the driver (≤64 rows), each band census gets its
    rank offset and the decile split is pure integer arithmetic —
    64 callbacks at any customer count."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def rev_partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["o_totalprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        g = pa.table({"ck": b["o_custkey"], "c": pa.array(cents)}) \
            .group_by(["ck"], use_threads=False).aggregate([("c", "sum")])
        return pa.table({"ck": g["ck"], "c": g["c_sum"]})

    per_cust = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(rev_partial, batch_format="pyarrow") \
        .groupby("ck").aggregate(Sum("c", alias_name="c"))

    _POW2 = (2 ** np.arange(63, dtype=np.int64))

    def add_band(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        band = np.searchsorted(_POW2, c, side="right") - 1
        return b.append_column("band",
                               pa.array(band.astype(np.int64)))

    banded = per_cust.map_batches(add_band,
                                  batch_format="pyarrow").materialize()

    def band_counts(b: pa.Table) -> pa.Table:
        g = b.group_by(["band"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"band": g["band"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    bc = banded.map_batches(band_counts, batch_format="pyarrow") \
        .to_pandas().groupby("band")["n"].sum().to_dict()
    bc = {int(k): int(v) for k, v in bc.items()}
    n_tot = sum(bc.values())
    rank_off = {b: sum(v for k, v in bc.items() if k > b)
                for b in bc}

    def census(g: pa.Table) -> pa.Table:
        band = int(g["band"][0].as_py())
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = g["ck"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -c))
        cs = c[order]
        rank = rank_off[band] + np.arange(len(cs))  # 0-based rank
        dec = rank * 10 // n_tot
        ks, idx = np.unique(dec, return_inverse=True)
        n = np.bincount(idx)
        s = np.array([cs[idx == i].sum() for i in range(len(ks))],
                     dtype=np.int64)
        return pa.table({"decile": pa.array(ks.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64)),
                         "s": pa.array(s)})

    parts = banded.groupby("band") \
        .map_groups(census, batch_format="pyarrow").to_pandas()
    agg: dict = {}
    for _, r in parts.iterrows():
        n, s = agg.get(int(r["decile"]), (0, 0))
        agg[int(r["decile"])] = (n + int(r["n"]), s + int(r["s"]))
    tot = sum(v[1] for v in agg.values())
    ks = sorted(agg)
    return pa.table({
        "decile": pa.array(ks, pa.int64()),
        "n_customers": pa.array([agg[k][0] for k in ks], pa.int64()),
        "rev_cents": pa.array([agg[k][1] for k in ks], pa.int64()),
        "share_ppm": pa.array([agg[k][1] * 1_000_000 // tot
                               for k in ks], pa.int64())})


def q_supplier_debt_census(sf_dir: str):
    """Suppliers in the red per nation: count, negative-balance count
    and ppm, plus the exact summed debt cents — the supply-risk
    census.

    Scale plan: nation-bounded combiner partials, one tiny
    groupby."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["s_acctbal"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        neg = cents < 0
        g = pa.table({"nk": pc.cast(b["s_nationkey"], pa.int64()),
                      "n": pa.array(np.ones(len(cents), np.int64)),
                      "nn": pa.array(neg.astype(np.int64)),
                      "debt": pa.array(np.where(neg, -cents, 0))}) \
            .group_by(["nk"], use_threads=False).aggregate(
            [("n", "sum"), ("nn", "sum"), ("debt", "sum")])
        return pa.table({"nk": g["nk"], "n": g["n_sum"],
                         "nn": g["nn_sum"], "debt": g["debt_sum"]})

    agg = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("nk").aggregate(
            Sum("n", alias_name="n_suppliers"),
            Sum("nn", alias_name="n_negative"),
            Sum("debt", alias_name="debt_cents")).to_pandas()
    name_of = _nation_name_lut(sf_dir)
    agg["n_name"] = agg["nk"].map(lambda k: name_of[int(k)])
    agg = agg.sort_values("n_name")
    return pa.table({
        "n_name": pa.array(agg["n_name"].astype(str), pa.string()),
        "n_suppliers": pa.array(agg["n_suppliers"].astype(np.int64),
                                pa.int64()),
        "n_negative": pa.array(agg["n_negative"].astype(np.int64),
                               pa.int64()),
        "negative_ppm": pa.array(
            [int(nn) * 1_000_000 // int(n) for nn, n in
             zip(agg["n_negative"], agg["n_suppliers"])], pa.int64()),
        "debt_cents": pa.array(agg["debt_cents"].astype(np.int64),
                               pa.int64())})


QUERIES["customer_rev_deciles"] = q_customer_rev_deciles
QUERIES["supplier_debt_census"] = q_supplier_debt_census

ORACLE_SQL["customer_rev_deciles"] = """
WITH pc_ AS (SELECT o_custkey AS ck,
                    CAST(sum(CAST(round(o_totalprice * 100)
                                  AS BIGINT)) AS BIGINT) AS c
             FROM orders GROUP BY 1),
r AS (SELECT c, (row_number() OVER (ORDER BY c DESC, ck) - 1)
                * 10 // (SELECT count(*) FROM pc_) AS dec
      FROM pc_),
a AS (SELECT dec, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(c) AS BIGINT) AS rev_cents
      FROM r GROUP BY 1)
SELECT dec AS decile, n_customers, rev_cents,
       CAST(CAST(rev_cents AS HUGEINT) * 1000000
            // (SELECT sum(rev_cents) FROM a) AS BIGINT)
           AS share_ppm
FROM a ORDER BY decile
"""

ORACLE_SQL["supplier_debt_census"] = """
WITH s AS (SELECT CAST(s_nationkey AS BIGINT) AS nk,
                  CAST(round(s_acctbal * 100) AS BIGINT) AS c
           FROM supplier),
a AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(count(*) FILTER (WHERE c < 0) AS BIGINT)
                 AS n_negative,
             CAST(coalesce(sum(-c) FILTER (WHERE c < 0), 0)
                  AS BIGINT) AS debt_cents
      FROM s GROUP BY 1)
SELECT n_name, n_suppliers, n_negative,
       n_negative * 1000000 // n_suppliers AS negative_ppm,
       debt_cents
FROM a JOIN nation ON CAST(n_nationkey AS BIGINT) = nk
ORDER BY n_name
"""


def q_order_status_mix(sf_dir: str):
    """Order-status mix per order year (counts + ppm share within
    the year) — the fulfillment-drift census: a year whose 'F' share
    sags signals backlog growth long before the open-orders curve
    peaks.

    Scale plan: years×statuses-bounded combiner census."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        yr = pc.year(b["o_orderdate"].combine_chunks())
        g = pa.table({"yr": pc.cast(yr, pa.int64()),
                      "st": b["o_orderstatus"],
                      "n": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(["yr", "st"], use_threads=False).aggregate(
            [("n", "sum")])
        return pa.table({"yr": g["yr"], "st": g["st"],
                         "n": g["n_sum"]})

    cells = _read(sf_dir, "orders",
                  ["o_orderdate", "o_orderstatus"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["yr", "st"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    ytot = cells.groupby("yr")["n"].sum().to_dict()
    cells = cells.sort_values(["yr", "st"])
    return pa.table({
        "order_year": pa.array(cells["yr"].astype(np.int64),
                               pa.int64()),
        "o_orderstatus": pa.array(cells["st"].astype(str),
                                  pa.string()),
        "n_orders": pa.array(cells["n"].astype(np.int64),
                             pa.int64()),
        "share_ppm": pa.array(
            [int(n) * 1_000_000 // int(ytot[y])
             for y, n in zip(cells["yr"], cells["n"])], pa.int64())})


def q_part_type_price_premium(sf_dir: str):
    """Catalog price premium per part type: exact mean retail cents
    vs the global mean, as a signed ppm premium
    ``(mean_type − mean_all)·10⁶ / mean_all`` computed with cleared
    denominators (``(s_t·n − s·n_t)·10⁶ // (s·n_t)``, sign-magnitude)
    — which catalog families carry the margin?

    Scale plan: type-bounded (n, Σcents) combiner census."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        cents = round_away(
            b["p_retailprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        g = pa.table({"pt": b["p_type"],
                      "n": pa.array(np.ones(len(cents), np.int64)),
                      "s": pa.array(cents)}) \
            .group_by(["pt"], use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum")])
        return pa.table({"pt": g["pt"], "n": g["n_sum"],
                         "s": g["s_sum"]})

    agg = _read(sf_dir, "part", ["p_type", "p_retailprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("pt").aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s")).to_pandas().sort_values("pt")
    n_tot = int(agg["n"].sum())
    s_tot = int(agg["s"].sum())

    def sdiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    prem = [sdiv((int(s) * n_tot - s_tot * int(n)) * 1_000_000,
                 s_tot * int(n))
            for s, n in zip(agg["s"], agg["n"])]
    return pa.table({
        "p_type": pa.array(agg["pt"].astype(str), pa.string()),
        "n_parts": pa.array(agg["n"].astype(np.int64), pa.int64()),
        "sum_cents": pa.array(agg["s"].astype(np.int64), pa.int64()),
        "premium_ppm": pa.array(prem, pa.int64())})


QUERIES["order_status_mix"] = q_order_status_mix
QUERIES["part_type_price_premium"] = q_part_type_price_premium

ORACLE_SQL["order_status_mix"] = """
WITH c AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                  o_orderstatus AS st,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY 1, 2),
t AS (SELECT yr, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT c.yr AS order_year, c.st AS o_orderstatus, c.n AS n_orders,
       CAST(CAST(c.n AS HUGEINT) * 1000000 // t.tot AS BIGINT)
           AS share_ppm
FROM c JOIN t USING (yr) ORDER BY order_year, o_orderstatus
"""

ORACLE_SQL["part_type_price_premium"] = """
WITH a AS (SELECT p_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(round(p_retailprice * 100)
                                AS BIGINT)) AS BIGINT) AS s
           FROM part GROUP BY 1),
g AS (SELECT CAST(sum(n) AS HUGEINT) AS nt,
             CAST(sum(s) AS HUGEINT) AS st FROM a)
SELECT p_type, n AS n_parts, s AS sum_cents,
       CAST(CASE WHEN (CAST(s AS HUGEINT) * (SELECT nt FROM g)
                       - (SELECT st FROM g) * n) >= 0
            THEN (CAST(s AS HUGEINT) * (SELECT nt FROM g)
                  - (SELECT st FROM g) * n) * 1000000
                 // ((SELECT st FROM g) * n)
            ELSE -((-(CAST(s AS HUGEINT) * (SELECT nt FROM g)
                      - (SELECT st FROM g) * n)) * 1000000
                   // ((SELECT st FROM g) * n)) END AS BIGINT)
           AS premium_ppm
FROM a ORDER BY p_type
"""


def q_error_rate_hourly(sf_dir: str):
    """Error share per hour-of-day (counts + ppm) — the ops-health
    rhythm census: a deploy-hour error spike shows here before any
    anomaly detector fires.

    Scale plan: 24-bounded combiner census."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.hour(b["ts"].combine_chunks())
        err = pc.equal(b["event_type"], "error")
        g = pa.table({"h": pc.cast(hour, pa.int64()),
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "e": pc.cast(err, pa.int64())}) \
            .group_by(["h"], use_threads=False).aggregate(
            [("n", "sum"), ("e", "sum")])
        return pa.table({"h": g["h"], "n": g["n_sum"],
                         "e": g["e_sum"]})

    agg = _read(sf_dir, "events", ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("h").aggregate(
            Sum("n", alias_name="n_events"),
            Sum("e", alias_name="n_errors")).to_pandas() \
        .sort_values("h")
    return pa.table({
        "hour": pa.array(agg["h"].astype(np.int64), pa.int64()),
        "n_events": pa.array(agg["n_events"].astype(np.int64),
                             pa.int64()),
        "n_errors": pa.array(agg["n_errors"].astype(np.int64),
                             pa.int64()),
        "error_ppm": pa.array(
            [int(e) * 1_000_000 // int(n)
             for e, n in zip(agg["n_errors"], agg["n_events"])],
            pa.int64())})


def q_empty_doc_census(sf_dir: str):
    """Empty / whitespace-only / sub-20-char document share per
    source — the most basic ingest-QA gate, surprisingly absent from
    most pipelines until a tokenizer divides by zero.

    Scale plan: pure vectorized map, source-bounded partials."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b["text"], "")
        stripped = pc.utf8_trim(txt, characters=" \t\n\r")
        empty = pc.equal(pc.utf8_length(stripped), 0)
        tiny = pc.and_(pc.less(pc.utf8_length(stripped), 20),
                       pc.invert(empty))
        g = pa.table({"source": b["source"],
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "e": pc.cast(empty, pa.int64()),
                      "t": pc.cast(tiny, pa.int64())}) \
            .group_by(["source"], use_threads=False).aggregate(
            [("n", "sum"), ("e", "sum"), ("t", "sum")])
        return pa.table({"source": g["source"], "n": g["n_sum"],
                         "e": g["e_sum"], "t": g["t_sum"]})

    agg = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("e", alias_name="n_empty"),
            Sum("t", alias_name="n_tiny")).to_pandas() \
        .sort_values("source")
    nd = agg["n_docs"].to_numpy(dtype=np.int64)
    bad = agg["n_empty"].to_numpy(dtype=np.int64) \
        + agg["n_tiny"].to_numpy(dtype=np.int64)
    return pa.table({
        "source": pa.array(agg["source"].astype(str), pa.string()),
        "n_docs": pa.array(nd, pa.int64()),
        "n_empty": pa.array(agg["n_empty"].astype(np.int64),
                            pa.int64()),
        "n_tiny": pa.array(agg["n_tiny"].astype(np.int64),
                           pa.int64()),
        "bad_ppm": pa.array(bad * 1_000_000 // nd, pa.int64())})


QUERIES["error_rate_hourly"] = q_error_rate_hourly
QUERIES["empty_doc_census"] = q_empty_doc_census

ORACLE_SQL["error_rate_hourly"] = """
WITH a AS (SELECT CAST(hour(ts) AS BIGINT) AS hour,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(count(*) FILTER (WHERE event_type = 'error')
                       AS BIGINT) AS n_errors
           FROM events GROUP BY 1)
SELECT hour, n_events, n_errors,
       n_errors * 1000000 // n_events AS error_ppm
FROM a ORDER BY hour
"""

ORACLE_SQL["empty_doc_census"] = """
WITH d AS (SELECT source,
                  trim(coalesce(text, ''),
                       ' ' || chr(9) || chr(10) || chr(13)) AS t
           FROM documents),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(*) FILTER (WHERE length(t) = 0) AS BIGINT)
                 AS n_empty,
             CAST(count(*) FILTER (WHERE length(t) > 0
                                   AND length(t) < 20) AS BIGINT)
                 AS n_tiny
      FROM d GROUP BY 1)
SELECT source, n_docs, n_empty, n_tiny,
       (n_empty + n_tiny) * 1000000 // n_docs AS bad_ppm
FROM a ORDER BY source
"""
