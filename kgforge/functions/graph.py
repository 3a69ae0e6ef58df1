"""Graph analytics over the materialized KG edge table.

Every operator here consumes an edge Dataset with string endpoint
columns (``src``, ``dst``) — in the engine that is the output of the
flagship's D1 dedup (``kgforge/stages/triples.py``) filtered to
entity–entity predicates — and follows the same scale discipline as
the rest of the engine:

- the only all-to-all moves are hash partitions keyed by a node id
  (``kgforge.functions.joins._part_codes``: one move per row, no
  row-count-dependent driver state);
- every per-partition kernel is vectorized (numpy run-length index
  math + pyarrow C++ joins), no per-edge Python;
- iterative ranking materializes each iteration (bounded lineage, the
  object store holds exactly one rank table per step).

Skew note (documented contract, same as ``joins.shuffle_join_ds``):
wedge enumeration (`two_hop_count_ds`, `triangle_count_ds`) is
O(deg²) per node, so a hub with millions of neighbours concentrates
deg² candidate rows in one partition.  At 100-TB scale callers cap
hubs upstream (drop or sample nodes above a degree bound — the
standard truncation in distributed triangle counting); the operators
themselves never truncate silently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgforge.functions.joins import (_part_codes, cogroup_partition_ds)

# integer PageRank constants — shared verbatim with the SQL oracle
PR_R0 = 1_000_000       # initial rank per node
PR_BASE = 150_000       # (1 - d) * R0 with d = 0.85
PR_NUM, PR_DEN = 85, 100


def _distinct_pairs_ds(edges_ds, src: str, dst: str, out_a: str,
                       out_b: str, both_directions: bool,
                       drop_self: bool = True):
    """Distinct (a, b) node pairs from the edge table — per-batch
    partial distinct (combiner), one groupby on the pair; the shuffle
    carries distinct pairs, never the raw multi-predicate edges."""
    from ray.data.aggregate import Count

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({out_a: b[src], out_b: b[dst]})
        if both_directions:
            t = pa.concat_tables(
                [t, pa.table({out_a: b[dst], out_b: b[src]})])
        if drop_self:
            t = t.filter(pc.invert(pc.equal(t[out_a], t[out_b])))
        return t.group_by([out_a, out_b], use_threads=False).aggregate([])

    def strip(b: pa.Table) -> pa.Table:
        return b.select([out_a, out_b])

    return edges_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([out_a, out_b]).aggregate(Count(alias_name="__c")) \
        .map_batches(strip, batch_format="pyarrow")


def degree_ds(edges_ds, src: str = "subj", dst: str = "obj"):
    """Per-node degrees over the DISTINCT-pair graph: ``out_deg`` =
    distinct successors, ``in_deg`` = distinct predecessors,
    ``degree`` = distinct neighbours in either direction.  Plan: both
    directions tagged with out/in flags, per-batch partial distinct,
    one groupby on (node, nbr) max-ing the flags, then a count per
    node — the second shuffle carries one row per distinct adjacency
    (already ≤ the first's output)."""
    from ray.data.aggregate import Count, Max, Sum

    def partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        t = pa.concat_tables([
            pa.table({"node": b[src], "nbr": b[dst],
                      "o": pa.array(np.ones(n, dtype=np.int64)),
                      "i": pa.array(np.zeros(n, dtype=np.int64))}),
            pa.table({"node": b[dst], "nbr": b[src],
                      "o": pa.array(np.zeros(n, dtype=np.int64)),
                      "i": pa.array(np.ones(n, dtype=np.int64))}),
        ])
        t = t.filter(pc.invert(pc.equal(t["node"], t["nbr"])))
        g = t.group_by(["node", "nbr"], use_threads=False).aggregate(
            [("o", "max"), ("i", "max")])
        return pa.table({"node": g["node"], "nbr": g["nbr"],
                         "o": g["o_max"], "i": g["i_max"]})

    adj = edges_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["node", "nbr"]) \
        .aggregate(Max("o", alias_name="om"), Max("i", alias_name="im"))

    def strip(b: pa.Table) -> pa.Table:
        return b.select(["node", "om", "im"])

    return adj.map_batches(strip, batch_format="pyarrow") \
        .groupby("node") \
        .aggregate(Sum("om", alias_name="out_deg"),
                   Sum("im", alias_name="in_deg"),
                   Count(alias_name="degree"))


def _run_starts(codes: np.ndarray) -> np.ndarray:
    if len(codes) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(
        [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1]).astype(np.int64)


def _lr_indices(starts, nl, nr):
    """Global row indices of the left / right runs in a
    ``cogroup_partition_ds`` sorted table (vectorized, no per-key
    Python)."""
    def expand(offs, lens):
        tot = int(lens.sum())
        if tot == 0:
            return np.zeros(0, dtype=np.int64)
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        return np.repeat(offs, lens) + within
    return expand(starts, nl), expand(starts + nl, nr)


def pagerank_ds(edges_ds, iters: int = 3, src: str = "subj",
                dst: str = "obj", num_partitions: int = 64,
                materialize_each: bool = False,
                seeds: list | None = None):
    """Integer-deterministic PageRank (damping 0.85) over the distinct
    directed-pair graph: ranks are int64 micro-units, each step

        rank'(v) = 150000 + (85 * Σ_{u→v} rank(u) // outdeg(u)) // 100

    Floor division at every step makes the result independent of
    summation order — bit-identical across cluster sizes AND engines
    (the SQL oracle lands on the same integers), with no float-ulp
    risk in the driver's value hash.  Dangling mass is dropped (also
    deterministic).

    Plan per iteration (2 keyed shuffles): cogroup(pairs by src,
    ranks by node) → contribution rows (dst, rank//outdeg); per-batch
    partial sum → groupby dst; cogroup(base nodes, in-sums) →
    rank'.  ``materialize_each=True`` checkpoints every iteration —
    lineage stays one step deep and a task failure re-runs one step,
    the right trade at web scale or high iteration counts.  The
    default keeps the loop LAZY: all iterations execute as one
    streaming DAG, so a small/medium graph pays Ray's per-execution
    fixed cost once instead of per iteration (measured 71s → ~10s on
    the oracle-scale graph in a contended window)."""
    from ray.data.aggregate import Sum

    pairs = _distinct_pairs_ds(edges_ds, src, dst, "s", "d",
                               both_directions=False, drop_self=False)
    pairs = pairs.materialize()
    # right-size the hash-partition fan-out to the graph: a
    # vocabulary-bound entity graph (thousands of pairs) under the
    # default 64 partitions pays 6 sorts of per-partition overhead for
    # partitions holding a handful of rows each
    n_pairs = pairs.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_pairs // 2000 + 1)))
    if n_pairs < 100_000 and pairs.num_blocks() > 2 * num_partitions:
        # a vocabulary-bound graph arrives as dozens of micro-blocks
        # (one per upstream groupby partition); six chained sorts each
        # pay per-block overhead, so coalesce once while tiny
        pairs = pairs.repartition(num_partitions).materialize()

    # base = (node, outdeg) for every node (outdeg 0 for sinks)
    def node_partial(b: pa.Table) -> pa.Table:
        t = pa.concat_tables([
            pa.table({"node": b["s"],
                      "od": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            pa.table({"node": b["d"],
                      "od": pa.array(np.zeros(b.num_rows,
                                              dtype=np.int64))}),
        ])
        g = t.group_by(["node"], use_threads=False).aggregate([("od",
                                                                "sum")])
        return pa.table({"node": g["node"], "od": g["od_sum"]})

    base = pairs.map_batches(node_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("od", alias_name="outdeg"))
    if n_pairs < 100_000:
        base = base.repartition(num_partitions)
    base = base.materialize()

    # seeds → PERSONALIZED PageRank: teleport mass (both the initial
    # rank and the per-step base term) concentrates on the seed set,
    # everything else identical — same integer-determinism contract
    seed_set = pa.array(sorted(seeds), pa.string()) \
        if seeds is not None else None

    def init_ranks(b: pa.Table) -> pa.Table:
        if seed_set is None:
            r = np.full(b.num_rows, PR_R0, dtype=np.int64)
        else:
            m = pc.is_in(b["node"], value_set=seed_set) \
                .combine_chunks().to_numpy(zero_copy_only=False)
            r = np.where(m, PR_R0, 0).astype(np.int64)
        return pa.table({
            "node": b["node"], "outdeg": b["outdeg"],
            "rank": pa.array(r),
        })

    # no materialize: init is a stateless map over the materialized
    # base — re-deriving it inside the first iteration's cogroup is
    # cheaper than one more full execution
    ranks = base.map_batches(init_ranks, batch_format="pyarrow")

    def contribs(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = pairs (payload d), right = ranks (payload rank,
        # outdeg; exactly one row per node)
        has = (nl > 0) & (nr > 0)
        ridx = (starts + nl)[has]
        rank = t["rank"].take(pa.array(ridx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        od = t["outdeg"].take(pa.array(ridx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        per = rank // np.maximum(od, 1)
        lidx, _ = _lr_indices(starts[has], nl[has],
                              np.zeros(has.sum(), dtype=nl.dtype))
        return pa.table({
            "d": t["d"].take(pa.array(lidx)),
            "c": pa.array(np.repeat(per, nl[has])),
        })

    def apply_rank(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = base (payload outdeg; one row per node), right =
        # contribution rows (payload c; any number per node) — the
        # per-node in-sum is a segment reduction INSIDE this cogroup,
        # so each iteration is exactly two Ray executions (contrib
        # cogroup + this one), no separate groupby-sum pass
        has_l = nl > 0
        lidx = starts[has_l]
        c = pc.fill_null(t["c"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # sum right runs per key: reduceat over [start+nl, start+nl+nr)
        r_starts = (starts + nl)[has_l]
        r_lens = nr[has_l]
        insum = np.zeros(int(has_l.sum()), dtype=np.int64)
        nz = r_lens > 0
        if nz.any():
            # reduceat sums each [start_i, start_{i+1}) — the rows
            # between a key's right run and the next summed start are
            # other keys' LEFT rows only (every contrib key is in
            # base, so no right-only keys exist), and their c is
            # null→0: the overshoot contributes nothing
            insum[nz] = np.add.reduceat(c, r_starts[nz])
        node_arr = t["__k"].take(pa.array(lidx))
        if seed_set is None:
            base_term: np.ndarray | int = PR_BASE
        else:
            m = pc.is_in(node_arr, value_set=seed_set) \
                .combine_chunks().to_numpy(zero_copy_only=False)
            base_term = np.where(m, PR_BASE, 0).astype(np.int64)
        new_rank = base_term + (PR_NUM * insum) // PR_DEN
        return pa.table({
            "node": node_arr,
            "outdeg": t["outdeg"].take(pa.array(lidx)),
            "rank": pa.array(new_rank),
        })

    # fixed payload schemas for the loop's lazy datasets —
    # Dataset.schema() on a lazy chained dataset would re-execute its
    # growing lineage once per iteration just to discover these types
    ranks_schema = pa.schema([("node", pa.string()),
                              ("outdeg", pa.int64()),
                              ("rank", pa.int64())])
    contrib_schema = pa.schema([("d", pa.string()), ("c", pa.int64())])

    for _ in range(iters):
        contrib = cogroup_partition_ds(
            pairs, ranks, "s", "node", contribs, ["d"],
            ["rank", "outdeg"], num_partitions=num_partitions,
            right_schema=ranks_schema)
        ranks = cogroup_partition_ds(
            base, contrib, "node", "d", apply_rank, ["outdeg"], ["c"],
            num_partitions=num_partitions, right_schema=contrib_schema)
        if materialize_each:
            ranks = ranks.materialize()

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "rank": b["rank"]})

    return ranks.map_batches(finish, batch_format="pyarrow")


def personalized_pagerank_ds(edges_ds, n_seeds: int = 4, iters: int = 3,
                             src: str = "subj", dst: str = "obj",
                             num_partitions: int = 64):
    """Personalized PageRank: teleport mass concentrated on a
    deterministic seed set — the ``n_seeds`` lexicographically
    smallest nodes (the engine's shared no-argument seed rule, same
    as ``ego_edges_ds``), so the SQL twin selects the identical set.
    Rides :func:`pagerank_ds`'s integer micro-unit machinery; output
    ``(node, rank)`` is bit-identical across engines and layouts.

    Scale shape: seed selection is a distinct + ``sort.limit(n)`` over
    the NODE table (node-bounded, n rows to the driver); the iteration
    is pagerank's two keyed cogroups per step."""
    from ray.data.aggregate import Count

    def node_rows(b: pa.Table) -> pa.Table:
        arr = pa.concat_tables([pa.table({"node": b[src]}),
                                pa.table({"node": b[dst]})])["node"]
        return pa.table({"node": arr.unique()})

    distinct_nodes = edges_ds.select_columns([src, dst]) \
        .map_batches(node_rows, batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="__c"))
    seeds = [r["node"] for r in
             distinct_nodes.sort("node").limit(n_seeds).take(n_seeds)]
    return pagerank_ds(edges_ds, iters=iters, src=src, dst=dst,
                       num_partitions=num_partitions, seeds=seeds)


def weighted_pagerank_ds(edges_ds, iters: int = 3, src: str = "subj",
                         dst: str = "obj", weight: str = "support",
                         num_partitions: int = 64):
    """Integer-deterministic WEIGHTED PageRank: mass splits along out
    edges proportionally to the ``weight`` column instead of evenly —
    each step

        rank'(v) = 150000 + (85 * Σ_{u→v} rank(u)·w_uv // W_u) // 100

    with ``W_u = Σ_x w_ux`` (floor division per edge, so the result
    is summation-order independent and bit-identical to the SQL
    twin).  Multi-edges between a pair pre-sum into one weighted pair
    row; dangling mass is dropped, like :func:`pagerank_ds`.

    Plan per iteration — same two keyed cogroups as
    :func:`pagerank_ds`, but the pair stream carries ``w`` and the
    base carries ``W_u``; shuffle volume is the distinct weighted
    pair table, never the raw multi-predicate edge stream."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import cogroup_partition_ds

    def pair_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"s": b[src], "d": b[dst],
                      "w": pc.cast(b[weight], pa.int64())})
        g = t.group_by(["s", "d"], use_threads=False) \
            .aggregate([("w", "sum")])
        return pa.table({"s": g["s"], "d": g["d"], "w": g["w_sum"]})

    pairs = edges_ds.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["s", "d"]).aggregate(Sum("w", alias_name="w")) \
        .materialize()
    n_pairs = pairs.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_pairs // 2000 + 1)))
    if n_pairs < 100_000 and pairs.num_blocks() > 2 * num_partitions:
        pairs = pairs.repartition(num_partitions).materialize()

    def node_partial(b: pa.Table) -> pa.Table:
        t = pa.concat_tables([
            pa.table({"node": b["s"],
                      "ow": pc.cast(b["w"], pa.int64())}),
            pa.table({"node": b["d"],
                      "ow": pa.array(np.zeros(b.num_rows,
                                              dtype=np.int64))}),
        ])
        g = t.group_by(["node"], use_threads=False) \
            .aggregate([("ow", "sum")])
        return pa.table({"node": g["node"], "ow": g["ow_sum"]})

    base = pairs.map_batches(node_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("ow", alias_name="outw"))
    if n_pairs < 100_000:
        base = base.repartition(num_partitions)
    base = base.materialize()

    def init_ranks(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["node"], "outw": b["outw"],
            "rank": pa.array(np.full(b.num_rows, PR_R0,
                                     dtype=np.int64))})

    ranks = base.map_batches(init_ranks, batch_format="pyarrow")

    def contribs(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = weighted pairs (payload d, w), right = ranks (one
        # row per node) — per-edge contribution rank·w // W_u
        has = (nl > 0) & (nr > 0)
        ridx = (starts + nl)[has]
        rank = t["rank"].take(pa.array(ridx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ow = t["outw"].take(pa.array(ridx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lidx, _ = _lr_indices(starts[has], nl[has],
                              np.zeros(int(has.sum()), dtype=nl.dtype))
        w = pc.fill_null(t["w"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)[lidx]
        rank_rep = np.repeat(rank, nl[has])
        ow_rep = np.maximum(np.repeat(ow, nl[has]), 1)
        return pa.table({
            "d": t["d"].take(pa.array(lidx)),
            "c": pa.array((rank_rep * w) // ow_rep)})

    def apply_rank(t: pa.Table, starts, nl, nr) -> pa.Table:
        has_l = nl > 0
        lidx = starts[has_l]
        c = pc.fill_null(t["c"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        r_starts = (starts + nl)[has_l]
        r_lens = nr[has_l]
        insum = np.zeros(int(has_l.sum()), dtype=np.int64)
        nz = r_lens > 0
        if nz.any():
            insum[nz] = np.add.reduceat(c, r_starts[nz])
        new_rank = PR_BASE + (PR_NUM * insum) // PR_DEN
        return pa.table({
            "node": t["__k"].take(pa.array(lidx)),
            "outw": t["outw"].take(pa.array(lidx)),
            "rank": pa.array(new_rank)})

    ranks_schema = pa.schema([("node", pa.string()),
                              ("outw", pa.int64()),
                              ("rank", pa.int64())])
    contrib_schema = pa.schema([("d", pa.string()), ("c", pa.int64())])

    for _ in range(iters):
        contrib = cogroup_partition_ds(
            pairs, ranks, "s", "node", contribs, ["d", "w"],
            ["rank", "outw"], num_partitions=num_partitions,
            right_schema=ranks_schema)
        ranks = cogroup_partition_ds(
            base, contrib, "node", "d", apply_rank, ["outw"], ["c"],
            num_partitions=num_partitions, right_schema=contrib_schema)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "rank": b["rank"]})

    return ranks.map_batches(finish, batch_format="pyarrow")


def _wedge_pairs_ds(und_ds, ordered: bool, num_partitions: int = 64,
                    distinct: bool = True):
    """Hash-partition the undirected adjacency by wedge CENTER and emit
    the per-center neighbour pairs — (a, b) such that a—center—b.
    ``ordered=False`` keeps all ordered pairs a≠b (two-hop);
    ``ordered=True`` keeps a<b only (triangle wedges; neighbours are
    distinct so index order after a lexicographic sort IS value
    order).  Pair generation is flat repeat/modulo index math over all
    centers at once.  ``distinct=True`` collapses pairs ACROSS centers
    (right for reachability, where only the endpoint pair matters);
    triangle counting needs ``distinct=False`` — the same (a, b) wedge
    under two different centers is two different triangles."""
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__p", pa.array(_part_codes(t["n1"], num_partitions)))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.sort_by([("n1", "ascending"), ("n2", "ascending")])
        codes = t["n1"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        starts = _run_starts(codes)
        lens = np.diff(np.concatenate([starts, [len(codes)]])) \
            .astype(np.int64)
        m = lens * lens
        tot = int(m.sum())
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        if tot == 0:
            return empty
        kofs = np.repeat(np.arange(len(m)), m)
        j = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        j1, j2 = j // lens[kofs], j % lens[kofs]
        keep = j1 < j2 if ordered else j1 != j2
        a_idx = pa.array(starts[kofs[keep]] + j1[keep])
        b_idx = pa.array(starts[kofs[keep]] + j2[keep])
        nbr = t["n2"]
        pairs = pa.table({"a": nbr.take(a_idx), "b": nbr.take(b_idx)})
        if distinct:
            pairs = pairs.group_by(["a", "b"],
                                   use_threads=False).aggregate([])
        return pairs

    return und_ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition, batch_format="pyarrow")


def two_hop_count_ds(edges_ds, src: str = "subj", dst: str = "obj",
                     num_partitions: int = 64):
    """Per-node count of nodes EXACTLY two hops away in the undirected
    distinct-pair graph (direct neighbours and the node itself
    excluded).  Plan: wedge pairs partitioned by endpoint ``a``
    cogrouped with the adjacency partitioned by node — the
    per-partition anti-join (pyarrow C++ ``left anti``) removes
    1-hop pairs, then a partition-local distinct + count per node
    (complete because everything keyed ``a`` is co-located)."""
    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    wedges = _wedge_pairs_ds(und, ordered=False,
                             num_partitions=num_partitions)

    def per_partition(t: pa.Table, starts, nl, nr) -> pa.Table:
        lidx, ridx = _lr_indices(starts, nl, nr)
        left = pa.table({"a": t["__k"].take(pa.array(lidx)),
                         "b": t["b"].take(pa.array(lidx))})
        right = pa.table({"a": t["__k"].take(pa.array(ridx)),
                          "b": t["n2"].take(pa.array(ridx))})
        two = left.filter(pc.invert(pc.equal(left["a"], left["b"]))) \
            .join(right, keys=["a", "b"], join_type="left anti")
        two = two.group_by(["a", "b"], use_threads=False).aggregate([])
        g = two.group_by(["a"], use_threads=False).aggregate(
            [("b", "count")])
        return pa.table({"node": g["a"],
                         "n_two_hop": pc.cast(g["b_count"], pa.int64())})

    sch_ab = pa.schema([("a", pa.string()), ("b", pa.string())])
    sch_nn = pa.schema([("n1", pa.string()), ("n2", pa.string())])
    # schema hints: a schema() probe on the lazy wedge/pair plans would
    # execute them once extra
    return cogroup_partition_ds(wedges, und, "a", "n1", per_partition,
                                ["b"], ["n2"],
                                num_partitions=num_partitions,
                                left_schema=sch_ab,
                                right_schema=sch_nn)


def triangle_count_ds(edges_ds, src: str = "subj", dst: str = "obj",
                      num_partitions: int = 64):
    """Total triangle count of the undirected distinct-pair graph as a
    single-row table.  Node-iterator plan: canonical edges (a<b),
    wedges (x<y) enumerated at each triangle's MINIMUM node (so each
    triangle is generated exactly once), closed wedges found by a
    per-partition pyarrow inner join against the canonical edge set
    keyed by the wedge's smaller endpoint.  Only the per-partition
    counts (one int each) reach the final aggregate."""
    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True)

    def canon(b: pa.Table) -> pa.Table:
        lt = pc.less(b["n1"], b["n2"])
        return pa.table({"n1": b["n1"].filter(lt),
                         "n2": b["n2"].filter(lt)})

    # canonical a<b adjacency = the und rows with n1<n2 (und is
    # symmetric-distinct, so this is exactly the distinct a<b set).
    # Wedges are generated from ce itself — each center only pairs
    # neighbours GREATER than it, so triangle {u<x<y} yields its
    # (x, y) wedge at u alone: counted exactly once.
    ce = und.map_batches(canon, batch_format="pyarrow").materialize()
    wedges = _wedge_pairs_ds(ce, ordered=True,
                             num_partitions=num_partitions,
                             distinct=False)

    def per_partition(t: pa.Table, starts, nl, nr) -> pa.Table:
        lidx, ridx = _lr_indices(starts, nl, nr)
        left = pa.table({"a": t["__k"].take(pa.array(lidx)),
                         "b": t["b"].take(pa.array(lidx))})
        right = pa.table({"a": t["__k"].take(pa.array(ridx)),
                          "b": t["n2"].take(pa.array(ridx))})
        closed = left.join(right, keys=["a", "b"],
                           join_type="left semi")
        return pa.table({"cnt": pa.array([closed.num_rows], pa.int64())})

    sch_ab = pa.schema([("a", pa.string()), ("b", pa.string())])
    sch_nn = pa.schema([("n1", pa.string()), ("n2", pa.string())])
    parts = cogroup_partition_ds(wedges, ce, "a", "n1", per_partition,
                                 ["b"], ["n2"],
                                 num_partitions=num_partitions,
                                 left_schema=sch_ab,
                                 right_schema=sch_nn)
    total = parts.sum("cnt") or 0
    return pa.table({"n_triangles": pa.array([int(total)], pa.int64())})


def components_ds(edges_ds, src: str = "subj", dst: str = "obj",
                  max_rounds: int = 64,
                  driver_max_pairs: int = 5_000_000):
    """Connected components of the undirected distinct-pair graph →
    (node, component) with ``component`` the lexicographically-minimum
    member.  Same MEASURED auto-selection as
    ``dedup.dup_clusters_ds``: the distinct-pair set is counted first
    — at or below ``driver_max_pairs`` a driver union-find over the
    collected pairs wins outright (label propagation pays ~3 Ray
    executions per diameter round); above it, distributed min-label
    propagation (:func:`kgforge.functions.dedup.propagate_min_labels`)
    runs with nothing on the driver.  Paths-agree tested."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    from kgforge.functions.dedup import propagate_min_labels

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()

    if und.count() <= driver_max_pairs:
        from kgforge.oracle.linking import UnionFind

        tables = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows]
        if not tables:
            return rd.from_arrow(pa.table({
                "node": pa.array([], pa.string()),
                "component": pa.array([], pa.string())}))
        pairs = pa.concat_tables([t.select(["n1", "n2"]) for t in tables])
        nodes = sorted(set(pairs["n1"].to_pylist()))
        idx = {v: i for i, v in enumerate(nodes)}
        uf = UnionFind(len(nodes))
        for a, b in zip(pairs["n1"].to_pylist(), pairs["n2"].to_pylist()):
            uf.union(idx[a], idx[b])
        roots: dict[int, str] = {}
        comp = []
        for v in nodes:            # ascending → first member is the min
            r = uf.find(idx[v])
            if r not in roots:
                roots[r] = v
            comp.append(roots[r])
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "component": pa.array(comp, pa.string())}))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["n1"], "dst": b["n2"]})

    edges = und.map_batches(rename, batch_format="pyarrow").materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["src"], "label": b["src"]})

    labels = edges.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("label", alias_name="label"))
    labels = propagate_min_labels(labels, edges, pa.string(),
                                  max_rounds=max_rounds)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "component": b["label"]})

    return labels.map_batches(finish, batch_format="pyarrow")


def _cn_nonadj_ds(und, num_partitions: int = 64,
                  with_left_degree: bool = False):
    """Exact common-neighbor counts for NON-adjacent pairs ``(a, b,
    cn)`` with a < b, from a materialized undirected distinct-pair
    dataset — the shared candidate stage of the link-prediction family
    (:func:`common_neighbors_ds`, :func:`jaccard_link_pred_ds`,
    :func:`linkpred_auc_ds`).  Wedge enumeration hash-partitions by
    center; per-block partial counts; ONE cogroup keyed by ``a`` fuses
    the exact sum with the adjacency anti-join.  With
    ``with_left_degree`` the same exchange also emits ``da`` =
    deg(a) (the full neighbor table replaces the canonical one as the
    cogroup's right side), saving the degree-attach cogroup a scorer
    would otherwise pay for the left endpoint."""
    wedges = _wedge_pairs_ds(und, ordered=True,
                             num_partitions=num_partitions,
                             distinct=False)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["a", "b"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"a": g["a"], "b": g["b"],
                         "cn": pc.cast(g["count_all"], pa.int64())})

    cn = wedges.map_batches(combine, batch_format="pyarrow")

    # canonical a<b adjacency for the anti-join; with_left_degree
    # ships the FULL neighbor table instead — candidates have b > a,
    # so anti-joining against all neighbors equals anti-joining
    # against the canonical subset, and deg(a) = the key's right-run
    # length rides the same exchange for free
    def canon(b: pa.Table) -> pa.Table:
        lt = pc.less(b["n1"], b["n2"])
        return pa.table({"n1": b["n1"].filter(lt),
                         "n2": b["n2"].filter(lt)})

    ce = und if with_left_degree else \
        und.map_batches(canon, batch_format="pyarrow")

    def per_partition(t: pa.Table, starts, nl, nr) -> pa.Table:
        lidx, ridx = _lr_indices(starts, nl, nr)
        partials = pa.table({"a": t["__k"].take(pa.array(lidx)),
                             "b": t["b"].take(pa.array(lidx)),
                             "cn": t["cn"].take(pa.array(lidx))})
        # all partials for a given `a` land in this partition → the
        # within-partition sum IS the exact common-neighbor count
        g = partials.group_by(["a", "b"], use_threads=False) \
            .aggregate([("cn", "sum")])
        left = pa.table({"a": g["a"], "b": g["b"], "cn": g["cn_sum"]})
        right = pa.table({"a": t["__k"].take(pa.array(ridx)),
                          "b": t["n2"].take(pa.array(ridx))})
        out = left.join(right, keys=["a", "b"],
                        join_type="left anti")
        if not with_left_degree:
            return out
        has = nr > 0
        da = pa.table({"a": t["__k"].take(pa.array(starts[has])),
                       "da": pa.array(nr[has].astype(np.int64))})
        return out.join(da, keys=["a"], join_type="inner")

    return cogroup_partition_ds(
        cn, ce, "a", "n1", per_partition, ["b", "cn"], ["n2"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                               ("cn", pa.int64())]),
        right_schema=pa.schema([("n1", pa.string()),
                                ("n2", pa.string())]))


def jaccard_link_pred_ds(edges_ds, src: str = "subj", dst: str = "obj",
                         k: int = 20, num_partitions: int = 64):
    """Jaccard-coefficient link prediction: top-``k`` non-adjacent
    pairs (a < b) by ``jac_score = cn·10⁶ // (deg(a)+deg(b)−cn)`` —
    integer micro-units (truncating) so the score is deterministic and
    SQL-twin-exact (same contract as :func:`ra_link_pred_ds`).

    Plan: the shared :func:`_cn_nonadj_ds` candidate stage with
    ``with_left_degree`` (deg(a) rides the candidate exchange for
    free), then ONE keyed cogroup attaches deg(b) — vectorized
    run-repeat merge, no per-key Python, no degree broadcast (the
    degree table is node-bounded but at web scale still too big to
    ship to every task).  Formerly two attach cogroups; the fusion
    cut this query's exchange count (12.2 s → 8.2 s at 32 CPUs, sf0.1)."""
    from ray.data.aggregate import Count

    from kgforge.functions.indexing import _segment_arange

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    with_da = _cn_nonadj_ds(und, num_partitions,
                            with_left_degree=True)
    deg = und.groupby("n1").aggregate(Count(alias_name="d"))

    def make_attach(key_out: str, other: str, d_out: str):
        def attach(t: pa.Table, starts, nl, nr) -> pa.Table:
            # every candidate endpoint has a degree row → inner merge;
            # one degree row per key, repeated across the key's pairs
            has = (nl > 0) & (nr > 0)
            rep = nl[has]
            lidx = np.repeat(starts[has], rep) + _segment_arange(rep)
            didx = np.repeat(starts[has] + nl[has], rep)
            cols = {key_out: t["__k"].take(pa.array(lidx)),
                    other: t[other].take(pa.array(lidx)),
                    "cn": t["cn"].take(pa.array(lidx)),
                    d_out: t["d"].take(pa.array(didx))}
            if "da" in t.column_names and d_out != "da":
                cols["da"] = t["da"].take(pa.array(lidx))
            return pa.table(cols)

        return attach

    scored_in = cogroup_partition_ds(
        with_da, deg, "b", "n1", make_attach("b", "a", "db"),
        ["a", "cn", "da"], ["d"], num_partitions=num_partitions,
        left_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                               ("cn", pa.int64()), ("da", pa.int64())]),
        right_schema=pa.schema([("n1", pa.string()),
                                ("d", pa.int64())]))

    def score(b: pa.Table) -> pa.Table:
        cn = b["cn"].combine_chunks().to_numpy(zero_copy_only=False)
        da = b["da"].combine_chunks().to_numpy(zero_copy_only=False)
        db = b["db"].combine_chunks().to_numpy(zero_copy_only=False)
        un = da + db - cn
        s = (cn * 1_000_000) // np.maximum(un, 1)
        return pa.table({"a": b["a"], "b": b["b"],
                         "jac_score": pa.array(s, pa.int64())})

    def partial_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        neg = pc.negate(b["jac_score"]).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((np.asarray(b["b"].to_pylist()),
                            np.asarray(b["a"].to_pylist()), neg))
        return b.take(pa.array(order[:k]))

    return scored_in.map_batches(score, batch_format="pyarrow") \
        .map_batches(partial_topk, batch_format="pyarrow") \
        .sort(["jac_score", "a", "b"],
              descending=[True, False, False]).limit(k)


def common_neighbors_ds(edges_ds, src: str = "subj", dst: str = "obj",
                        k: int = 20, num_partitions: int = 64):
    """Link prediction by common-neighbor count: the top-``k``
    NON-adjacent node pairs (a < b) ranked by how many neighbours they
    share in the undirected distinct-pair graph (ties broken by
    ``(a, b)`` so the cut is deterministic).

    Plan (three bounded moves, no driver row loops):

    1. wedge enumeration at each center (``_wedge_pairs_ds`` — hash
       partition by center, flat index math), per-BLOCK combine of the
       (a, b) counts so the wide step ships partial counts, not wedges;
    2. ONE cogroup keyed by ``a`` joins the partial counts against the
       canonical edge set: hash-partitioning by ``a`` already
       co-locates every (a, b) partial, so the exact sum happens
       inside the same callback as the anti-join (adjacent pairs are
       existing links, not predictions) — the separate
       ``groupby(a, b).sum`` shuffle this fuses away moved the full
       pair table twice;
    3. per-block partial top-k (vectorized lexsort) so the final
       ``sort().limit(k)`` sees at most k rows per block — the global
       sort input is O(k × blocks), never the full pair table.
    """
    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    nonadj = _cn_nonadj_ds(und, num_partitions)

    def partial_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        neg = pc.negate(b["cn"]).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((np.asarray(b["b"].to_pylist()),
                            np.asarray(b["a"].to_pylist()), neg))
        return b.take(pa.array(order[:k]))

    return nonadj.map_batches(partial_topk, batch_format="pyarrow") \
        .sort(["cn", "a", "b"], descending=[True, False, False]).limit(k)

def ego_edges_ds(edges_ds, seed: str | None = None, hops: int = 2,
                 src: str = "subj", dst: str = "obj",
                 num_partitions: int = 64,
                 driver_max_members: int = 2_000_000):
    """Ego-network extraction: the induced edges of the ``hops``-hop
    neighborhood of ``seed`` in the undirected distinct-pair graph
    (``seed=None`` → the lexicographically smallest node, a
    deterministic default shared with the SQL twin).

    Two lanes, auto-selected per hop by member-set size (the
    ``build_alias_map`` pattern):

    - **broadcast** (member set ≤ ``driver_max_members``): the members
      live on the driver, each hop is ONE streaming ``pc.is_in``
      semi-filter over the edge table (``ray.put`` once per hop, read
      zero-copy in every task) and the induced subgraph is one more
      streaming filter — ZERO shuffles, the edge table never moves.
      Ego neighborhoods are tiny next to the graph, so this is the
      common case (same-window A/B at sf0.1, 5.4M-edge graph: 40.7s
      cogroup lane → broadcast lane single-digit seconds).
    - **distributed** (a celebrity hub blows past the bound): from the
      spill hop onward, each hop is one hash cogroup semi-join plus a
      distinct, and the induced subgraph two more — the member set is
      a Dataset, never a driver collection, so a million-node
      neighborhood costs shuffle volume, not driver memory."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from kgforge.functions.joins import cogroup_partition_ds

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    if seed is None:
        seed = und.min("n1")

    member_set: set[str] = {seed}
    hops_done = 0
    while hops_done < hops and len(member_set) <= driver_max_members:
        mref = ray.put(pa.array(sorted(member_set), pa.string()))

        def hop_nbrs(b: pa.Table, _m=mref) -> pa.Table:
            mask = pc.is_in(b["n1"], value_set=ray.get(_m))
            return pa.table({"node": b["n2"].filter(mask)
                             .combine_chunks().unique()})

        for part in und.map_batches(hop_nbrs, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            member_set.update(part["node"].to_pylist())
        hops_done += 1

    if hops_done == hops and len(member_set) <= driver_max_members:
        fref = ray.put(pa.array(sorted(member_set), pa.string()))

        def induced(b: pa.Table, _m=fref) -> pa.Table:
            m = ray.get(_m)
            lt = pc.less(b["n1"], b["n2"])
            t = pa.table({"a": b["n1"].filter(lt),
                          "b": b["n2"].filter(lt)})
            return t.filter(pc.and_(pc.is_in(t["a"], value_set=m),
                                    pc.is_in(t["b"], value_set=m)))

        return und.map_batches(induced, batch_format="pyarrow")

    members = rd.from_arrow(pa.table({"node": pa.array(
        sorted(member_set), pa.string())}))
    hops -= hops_done

    def nbrs_of(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = und rows (payload n2), right = member rows: keep the
        # neighbors of every key present on the member side
        keep = np.repeat(nr > 0, nl + nr)
        sub = t.filter(pa.array(keep))
        side = sub["__side"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        nb = sub["n2"].filter(pa.array(side == 0)).combine_chunks()
        return pa.table({"node": nb.unique()})

    for _ in range(hops):
        nbrs = cogroup_partition_ds(und, members, "n1", "node",
                                    nbrs_of, ["n2"], [],
                                    num_partitions=num_partitions)
        members = members.union(nbrs) \
            .groupby("node").aggregate(Count(alias_name="__c")) \
            .map_batches(lambda b: b.select(["node"]),
                         batch_format="pyarrow").materialize()

    def canon(b: pa.Table) -> pa.Table:
        lt = pc.less(b["n1"], b["n2"])
        return pa.table({"a": b["n1"].filter(lt),
                         "b": b["n2"].filter(lt)})

    ce = und.map_batches(canon, batch_format="pyarrow")

    def keep_left(payload: list[str]):
        def f(t: pa.Table, starts, nl, nr) -> pa.Table:
            keep = np.repeat(nr > 0, nl + nr)
            sub = t.filter(pa.array(keep))
            side = sub["__side"].combine_chunks() \
                .to_numpy(zero_copy_only=False)
            lmask = pa.array(side == 0)
            return pa.table({
                "a" if "a" not in payload else "b":
                    sub["__k"].filter(lmask).combine_chunks(),
                **{c: sub[c].filter(lmask).combine_chunks()
                   for c in payload}})
        return f

    half = cogroup_partition_ds(ce, members, "a", "node",
                                keep_left(["b"]), ["b"], [],
                                num_partitions=num_partitions)
    return cogroup_partition_ds(half, members, "b", "node",
                                keep_left(["a"]), ["a"], [],
                                num_partitions=num_partitions) \
        .map_batches(lambda t: t.select(["a", "b"]),
                     batch_format="pyarrow")

def negative_samples_ds(edges_ds, src: str = "subj", pred: str = "pred",
                        dst: str = "obj", num_partitions: int = 64):
    """Deterministic negative sampling for KG-embedding / link-pred
    training: every positive edge gets one corrupted tail — the node
    at rank ``md5(subj#pred#obj) % |V|`` in the sorted node vocabulary
    — and candidates that collide with a REAL edge (or with the
    original tail) are dropped via one hash-partitioned anti-join, so
    the output is guaranteed-false triples, reproducible across runs
    and cluster sizes.

    The ranked node vocabulary is collected and broadcast (documented
    small side: node VOCAB, not edges — same bound as the alias map;
    a billion-node graph swaps this for a rank range-exchange).  The
    edge stream itself is one map + one cogroup."""
    import ray
    from ray.data.aggregate import Count

    from kgforge.functions.joins import cogroup_partition_ds

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True)
    nodes = sorted(r["n1"] for r in
                   und.groupby("n1").aggregate(
                       Count(alias_name="__c")).take_all())
    nv = np.array(nodes)
    nodes_ref = ray.put(nv)

    def corrupt(b: pa.Table) -> pa.Table:
        from kgforge.common.hashing import md5_u64_arr

        vocab = ray.get(nodes_ref)
        o = b[dst].to_pylist()
        keys = pc.binary_join_element_wise(
            b[src], b[pred], b[dst], "#")
        idx = (md5_u64_arr(keys) % np.uint64(len(vocab))) \
            .astype(np.int64)
        neg = vocab[idx]
        keep = neg != np.array(o)
        ki = pa.array(np.flatnonzero(keep))
        t = pa.table({src: b[src].take(ki), pred: b[pred].take(ki),
                      "neg_obj": pa.array(neg[keep], pa.string())})
        return t.group_by([src, pred, "neg_obj"],
                          use_threads=False).aggregate([])

    def pair_key(b: pa.Table, a_col: str, b_col: str,
                 keep: list[str]) -> pa.Table:
        k = pc.binary_join_element_wise(b[a_col], b[b_col], "\x1f")
        cols = {"k": k}
        for c in keep:
            cols[c] = b[c]
        return pa.table(cols)

    cand = edges_ds.map_batches(corrupt, batch_format="pyarrow") \
        .map_batches(lambda b: pair_key(b, src, "neg_obj",
                                        [src, pred, "neg_obj"]),
                     batch_format="pyarrow")
    real = und.map_batches(lambda b: pair_key(b, "n1", "n2", []),
                           batch_format="pyarrow")

    def anti(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep = np.repeat(nr == 0, nl + nr)
        sub = t.filter(pa.array(keep))
        side = sub["__side"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 0)
        out = pa.table({src: sub[src].filter(lmask),
                        pred: sub[pred].filter(lmask),
                        "neg_obj": sub["neg_obj"].filter(lmask)})
        # two positives (s,p,o1)/(s,p,o2) can corrupt to one neg —
        # the (s,neg) key co-locates them, dedup here is global
        return out.group_by([src, pred, "neg_obj"],
                            use_threads=False).aggregate([])

    return cogroup_partition_ds(cand, real, "k", "k", anti,
                                [src, pred, "neg_obj"], [],
                                num_partitions=num_partitions)


def _multi_key_codes(t: pa.Table, cols: list[str],
                     num_partitions: int) -> np.ndarray:
    """Partition id from a MULTI-column key: per-column u64 hashes
    FNV-folded together, so composite groups (doc, sentence) land
    whole in one partition without string concatenation."""
    from kgforge.common.hashing import hash_u64_np

    h = np.zeros(t.num_rows, dtype=np.uint64)
    for c in cols:
        arr = t[c].combine_chunks()
        if pa.types.is_integer(arr.type):
            x = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        else:
            x = hash_u64_np([s if s is not None else ""
                             for s in arr.to_pylist()])
        with np.errstate(over="ignore"):
            h = h * np.uint64(1099511628211) ^ x
    return (h % np.uint64(num_partitions)).astype(np.int32)


def cooccur_pairs_ds(ds, group_cols: list[str], item_col: str,
                     num_partitions: int = 64):
    """Within-group distinct-item co-occurrence → one row per
    unordered item pair ``(a, b)`` (a < b by item value) with
    ``n_groups`` = number of groups where both appear.  The generic
    market-basket / sentence-co-mention primitive.

    Scale shape: stage 1 collapses each batch to DISTINCT (group,
    item) rows and tags a composite group-key hash — the all-to-all
    move carries (group, item) pairs, never source rows; stage 2
    co-locates each group, re-distincts across batches, and emits
    per-pair partials via flat cartesian index math + an
    upper-triangle mask (quadratic only in items-per-group, the
    bounded basket/sentence width), combined per partition before
    stage 3's pair-keyed sum — the second exchange carries only
    distinct-pair partials, keyed by PAIR-HASH partition (a 64-value
    int32 sort), not Ray's two-column sort Aggregate (measured 15.5s
    → 3s on 1.2M pair partials at sf0.1)."""
    import pyarrow.compute as pc

    keep = [*group_cols, item_col]

    def tag(b: pa.Table) -> pa.Table:
        t = b.select(keep).group_by(keep, use_threads=False) \
            .aggregate([])
        return t.append_column(
            "__p", pa.array(_multi_key_codes(t, group_cols,
                                             num_partitions)))

    def _col_neq(t: pa.Table, c: str, n: int) -> np.ndarray:
        a = t[c].combine_chunks()
        return pc.not_equal(a.slice(1), a.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)

    def per_partition(t: pa.Table) -> pa.Table:
        item_t = t.schema.field(item_col).type
        empty = pa.table({"a": pa.array([], item_t),
                          "b": pa.array([], item_t),
                          "cnt": pa.array([], pa.int64()),
                          "__q": pa.array([], pa.int32())})
        t = t.sort_by([(c, "ascending") for c in keep])
        n = t.num_rows
        if n == 0:
            return empty
        # distinct across batches: drop rows equal to their predecessor
        if n > 1:
            any_neq = np.zeros(n - 1, dtype=bool)
            for c in keep:
                any_neq |= _col_neq(t, c, n)
            t = t.filter(pa.array(np.concatenate([[True], any_neq])))
            n = t.num_rows
        # run boundaries over the group columns only
        if n > 1:
            gneq = np.zeros(n - 1, dtype=bool)
            for c in group_cols:
                gneq |= _col_neq(t, c, n)
            starts = np.concatenate([[0], np.flatnonzero(gneq) + 1])
        else:
            starts = np.zeros(1, dtype=np.int64)
        lens = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
        m = lens * lens
        tot = int(m.sum())
        if tot == 0:
            return empty
        kofs = np.repeat(np.arange(len(m)), m)
        j = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        j1, j2 = j // lens[kofs], j % lens[kofs]
        sel = j1 < j2            # sorted within run → index order IS value order
        a_idx = pa.array(starts[kofs[sel]] + j1[sel])
        b_idx = pa.array(starts[kofs[sel]] + j2[sel])
        items = t[item_col]
        pairs = pa.table({"a": items.take(a_idx),
                          "b": items.take(b_idx)})
        g = pairs.group_by(["a", "b"], use_threads=False).aggregate(
            [([], "count_all")])
        g = pa.table({"a": g["a"], "b": g["b"],
                      "cnt": pc.cast(g["count_all"], pa.int64())})
        return g.append_column(
            "__q", pa.array(_multi_key_codes(g, ["a", "b"],
                                             num_partitions)))

    def pair_sum(t: pa.Table) -> pa.Table:
        g = t.select(["a", "b", "cnt"]).group_by(
            ["a", "b"], use_threads=False).aggregate([("cnt", "sum")])
        return pa.table({"a": g["a"], "b": g["b"],
                         "n_groups": pc.cast(g["cnt_sum"], pa.int64())})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(per_partition,
                                   batch_format="pyarrow") \
        .groupby("__q").map_groups(pair_sum, batch_format="pyarrow")


def kcore_ds(edges_ds, k: int = 2, rounds: int = 8,
             src: str = "subj", dst: str = "obj",
             num_partitions: int = 64,
             driver_max_nodes: int = 2_000_000):
    """Bounded-round k-core peeling over the undirected distinct-pair
    graph: ``rounds`` times, drop every node of degree < ``k`` and
    the edges touching it; → (node, degree) of the surviving
    subgraph.  Fixed-round semantics (not run-to-convergence) so the
    SQL twin is the IDENTICAL computation; the loop exits early once
    an iteration removes nothing — from that point every further
    round is the identity, so early exit ≡ the full ``rounds``.

    Plan per round: degree partials → one node-keyed sum; the
    surviving-node filter runs on the broadcast lane (good-node list
    ≤ ``driver_max_nodes`` → one ``ray.put`` + ``pc.is_in`` on both
    endpoint columns, zero shuffles) and spills to two bloom-semi-
    join cogroups above it; each round materializes its edge set so
    lineage stays one round deep (pagerank's checkpoint trade)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    n_edges = und.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_edges // 2000 + 1)))
    if n_edges < 100_000 and und.num_blocks() > 2 * num_partitions:
        und = und.repartition(num_partitions).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["n1"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"n": g["n1"],
                         "dg": pc.cast(g["count_all"], pa.int64())})

    for _ in range(rounds):
        deg = und.map_batches(deg_partial, batch_format="pyarrow") \
            .groupby("n").aggregate(Sum("dg", alias_name="dg")) \
            .materialize()
        bad = deg.filter(lambda r: r["dg"] < k)
        if bad.count() == 0:
            break                      # converged — identity from here
        good = deg.filter(lambda r: r["dg"] >= k)
        if good.count() <= driver_max_nodes:
            vals = pa.concat_tables(ray.get(good.to_arrow_refs()))["n"]
            ref = ray.put(vals.combine_chunks())

            def keep(b: pa.Table, _ref=ref) -> pa.Table:
                vs = ray.get(_ref)
                m = pc.and_(pc.is_in(b["n1"], value_set=vs),
                            pc.is_in(b["n2"], value_set=vs))
                return b.filter(m)

            und = und.map_batches(keep, batch_format="pyarrow") \
                .materialize()
        else:
            from kgforge.functions.joins import bloom_semi_join_ds

            gk = good.select_columns(["n"])
            und = bloom_semi_join_ds(und, gk, "n1", "n", ["n2"],
                                     num_partitions=num_partitions)
            und = bloom_semi_join_ds(und, gk, "n2", "n", ["n1"],
                                     num_partitions=num_partitions) \
                .select_columns(["n1", "n2"]).materialize()

    final = und.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("n").aggregate(Sum("dg", alias_name="dg"))
    return final.map_batches(
        lambda b: pa.table({"node": b["n"],
                            "degree": pc.cast(b["dg"], pa.int64())}),
        batch_format="pyarrow")


def _pairs_with_degrees_ds(edges_ds, src: str, dst: str,
                           num_partitions: int = 64):
    """Shared base of the degree-conditioned censuses
    (:func:`assortativity_ds`, :func:`rich_club_ds`,
    :func:`neighbor_degree_ds`): the both-directions distinct-pair
    stream with the undirected degree attached at BOTH ends —
    ``(pairs, deg)`` where ``pairs`` has int64 columns ``da``/``db``
    (one row per directed distinct pair) and ``deg`` is the
    materialized ``(n, dg)`` node-degree table.  Two hash cogroups;
    the corpus-scale edge multiset never moves — only distinct pairs
    plus two n-row degree joins shuffle."""
    import pyarrow.compute as pc

    from kgforge.functions.joins import cogroup_partition_ds

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    # right-size the fan-out to the graph (pagerank's trade): a
    # vocabulary-bound entity graph under 64 partitions pays the
    # per-partition sort overhead twice per cogroup for near-empty
    # partitions
    n_pairs = und.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_pairs // 2000 + 1)))
    if n_pairs < 100_000 and und.num_blocks() > 2 * num_partitions:
        und = und.repartition(num_partitions).materialize()

    from ray.data.aggregate import Sum

    def deg_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["n1"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"n": g["n1"],
                         "dg": pc.cast(g["count_all"], pa.int64())})

    deg = und.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("n").aggregate(Sum("dg", alias_name="dg")) \
        .materialize()

    def attach(out_col, left_cols):
        def fn(t: pa.Table, starts, nl, nr) -> pa.Table:
            # left = pair rows; right = degree rows (one per node);
            # closure args are bound per stage — the UDF pickles at
            # (lazy) execution time, so no shared mutable state here
            total = nl + nr
            row_key = np.repeat(np.arange(len(nl)), total)
            pos = np.arange(len(row_key))
            in_left = pos < (starts + nl)[row_key]
            mask = ((nl > 0) & (nr > 0))[row_key] & in_left
            lidx = np.flatnonzero(mask)
            ridx = (starts + nl)[row_key][lidx]
            cols = {c: t[c].take(pa.array(lidx)) for c in left_cols}
            cols[out_col] = t["dg"].take(pa.array(ridx))
            return pa.table(cols)
        return fn

    node_t = und.schema().base_schema.field("n1").type  # materialized
    deg_schema = pa.schema([("n", node_t), ("dg", pa.int64())])
    with_da = cogroup_partition_ds(
        und, deg, "n1", "n", attach("da", ["n2"]), ["n2"], ["dg"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("n1", node_t), ("n2", node_t)]),
        right_schema=deg_schema)
    # schema HINT for the lazy with_da side — a schema() probe on an
    # unmaterialized all-to-all output executes its whole plan
    pairs = cogroup_partition_ds(
        with_da, deg, "n2", "n", attach("db", ["da"]), ["da"], ["dg"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("n2", node_t), ("da", pa.int64())]),
        right_schema=deg_schema)
    return pairs, deg


def assortativity_ds(edges_ds, src: str = "subj", dst: str = "obj",
                     num_partitions: int = 64) -> pa.Table:
    """Degree-assortativity moments of the undirected distinct-pair
    graph: over every directed pair (a, b), the EXACT integer moment
    sums of (deg(a), deg(b)) plus the regression slope in ppm —
    ``(n_pairs, num, denx, deny, slope_ppm)`` with
    ``num = n·Σxy − Σx·Σy``, ``denx = n·Σx² − (Σx)²`` (deny
    symmetric), ``slope_ppm = num × 10⁶ // denx`` — one row, no
    floats, no sqrt (the consumer can form Pearson r from the three
    integers; a float sqrt here would risk the value hash).

    Plan: degrees via ``degree_ds``'s distinct-pair base; two
    cogroups attach deg(a) then deg(b) to the pair stream
    (:func:`_pairs_with_degrees_ds`); per-batch integer moment
    partials fold on the driver (Python ints — no int64 overflow for
    Σx², Σxy at web-scale degree sums)."""
    import pyarrow.compute as pc

    pairs, _deg = _pairs_with_degrees_ds(edges_ds, src, dst,
                                         num_partitions)

    def moments(b: pa.Table) -> pa.Table:
        x = b["da"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = b["db"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64())})

    import ray

    parts = [t for t in ray.get(
        pairs.map_batches(moments, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_columns]
    agg = {c: 0 for c in ("n", "sx", "sy", "sxy", "sxx", "syy")}
    for t in parts:
        for c in agg:
            agg[c] += int(pc.sum(t[c]).as_py() or 0)
    n, sx, sy = agg["n"], agg["sx"], agg["sy"]
    num = n * agg["sxy"] - sx * sy
    denx = n * agg["sxx"] - sx * sx
    deny = n * agg["syy"] - sy * sy
    if denx == 0:
        slope = 0
    else:
        # truncate toward zero — DuckDB // semantics, NOT Python floor
        q = abs(num) * 1_000_000 // abs(denx)
        slope = q if (num >= 0) == (denx >= 0) else -q
    return pa.table({
        "n_pairs": pa.array([n], pa.int64()),
        "num": pa.array([num], pa.int64()),
        "denx": pa.array([denx], pa.int64()),
        "deny": pa.array([deny], pa.int64()),
        "slope_ppm": pa.array([slope], pa.int64())})


RICH_CLUB_THRESHOLDS = (1, 2, 4, 8, 16, 32)


def rich_club_ds(edges_ds, src: str = "subj", dst: str = "obj",
                 thresholds=RICH_CLUB_THRESHOLDS,
                 num_partitions: int = 64) -> pa.Table:
    """Rich-club coefficient curve (Colizza et al. 2006) of the
    undirected distinct-pair graph: for each degree threshold ``k``
    in ``thresholds``, the club size ``n_nodes`` (nodes with
    degree > k), the internal edge count ``n_edges`` (edges with BOTH
    endpoints above the threshold) and the density
    ``rc_ppm = 2·n_edges·10⁶ // (n_nodes·(n_nodes−1))`` in parts per
    million (0 when the club has < 2 members) — exact integers, so
    both engines hash bit-identically.

    Plan: :func:`_pairs_with_degrees_ds` (assortativity's shape) —
    degrees from the both-directions distinct-pair table, two hash
    cogroups attach deg(a)/deg(b) to the pair stream, then a
    per-batch histogram of ``min(da, db)`` (degree-bounded, so the
    driver fold is tiny).  Each undirected edge appears twice in the
    directed stream with the same min-degree, so ``E_k = count/2`` —
    no a<b filter, no extra pass.  The node-side histogram folds
    straight off the degree table.  Shuffle volume: distinct pairs +
    two n-row degree joins — the corpus-scale edge multiset never
    moves."""
    from ray.data.aggregate import Sum

    pairs, deg = _pairs_with_degrees_ds(edges_ds, src, dst,
                                        num_partitions)

    def dmin_hist(b: pa.Table) -> pa.Table:
        da = b["da"].combine_chunks().to_numpy(zero_copy_only=False)
        db = b["db"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({"d": pa.array(np.minimum(da, db))})
        g = t.group_by("d", use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"d": g["d"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    edge_hist = {}
    for part in pairs.map_batches(dmin_hist, batch_format="pyarrow") \
            .groupby("d").aggregate(Sum("c", alias_name="c")) \
            .iter_batches(batch_format="pyarrow"):
        for d, c in zip(part["d"].to_pylist(), part["c"].to_pylist()):
            edge_hist[d] = edge_hist.get(d, 0) + c

    def deg_hist_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["dg"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"d": g["dg"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    node_hist = {}
    for part in deg.map_batches(deg_hist_partial,
                                batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for d, c in zip(part["d"].to_pylist(), part["c"].to_pylist()):
            node_hist[d] = node_hist.get(d, 0) + c

    rows = []
    for k in thresholds:
        n_nodes = sum(c for d, c in node_hist.items() if d > k)
        n_edges = sum(c for d, c in edge_hist.items() if d > k) // 2
        rc = (2 * n_edges * 1_000_000 // (n_nodes * (n_nodes - 1))
              if n_nodes >= 2 else 0)
        rows.append((int(k), n_nodes, n_edges, rc))
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "n_nodes": pa.array([r[1] for r in rows], pa.int64()),
        "n_edges": pa.array([r[2] for r in rows], pa.int64()),
        "rc_ppm": pa.array([r[3] for r in rows], pa.int64())})


def neighbor_degree_ds(edges_ds, src: str = "subj", dst: str = "obj",
                       num_partitions: int = 64) -> pa.Table:
    """Average-neighbor-degree curve knn(k) (Pastor-Satorras et al.
    2001) of the undirected distinct-pair graph — the
    degree-correlation profile that assortativity collapses to one
    slope: per degree class ``k``, the class size ``n_nodes``, the
    directed pair count ``n_pairs`` (= k·n_nodes by construction, a
    free cross-check), the exact neighbor-degree sum and
    ``knn_micro = sum_nbr_deg·10⁶ // n_pairs`` — integers only, so
    both engines hash bit-identically.  Rows ordered by degree ASC.

    Plan: :func:`_pairs_with_degrees_ds` attaches deg at both ends;
    a per-batch (da → count, Σdb) partial collapses the pair stream
    to a degree-bounded histogram; ``n_nodes = n_pairs // k`` folds
    for free (every degree-k node contributes exactly k pair rows) —
    no second pass over the degree table."""
    from ray.data.aggregate import Sum

    pairs, _deg = _pairs_with_degrees_ds(edges_ds, src, dst,
                                         num_partitions)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"degree": b["da"], "db": b["db"],
                      "one": pa.array(
                          np.ones(b.num_rows, dtype=np.int64))})
        g = t.group_by(["degree"], use_threads=False).aggregate(
            [("one", "sum"), ("db", "sum")])
        return pa.table({"degree": g["degree"], "np": g["one_sum"],
                         "sd": g["db_sum"]})

    hist = pairs.map_batches(partial, batch_format="pyarrow") \
        .groupby("degree").aggregate(
            Sum("np", alias_name="n_pairs"),
            Sum("sd", alias_name="sum_nbr_deg")).to_pandas()
    hist = hist.sort_values("degree")
    k = hist["degree"].to_numpy(np.int64)
    npair = hist["n_pairs"].to_numpy(np.int64)
    sd = hist["sum_nbr_deg"].to_numpy(np.int64)
    # Python-int fold: sd×10⁶ overflows int64 once Σ_nbr_deg passes
    # ~9·10¹² (well inside web-scale pair counts); the histogram is
    # degree-bounded so the loop is trivial
    knn = [int(s) * 1_000_000 // int(p) for s, p in zip(sd, npair)]
    return pa.table({
        "degree": pa.array(k),
        "n_nodes": pa.array(npair // k),
        "n_pairs": pa.array(npair),
        "sum_nbr_deg": pa.array(sd),
        "knn_micro": pa.array(knn, pa.int64())})


def eigencentrality_ds(edges_ds, iters: int = 3, src: str = "subj",
                       dst: str = "obj", num_partitions: int = 64,
                       k: int = 20) -> pa.Table:
    """Integer-deterministic eigenvector centrality (von Mises power
    iteration, max-normalized) over the undirected distinct-pair
    graph — the prestige score PageRank's teleport mass distorts:

        y(v)  = Σ_{u ∈ N(v)} x(u)          (x₀ ≡ 10⁶)
        x'(v) = y(v)·10⁶ // max_w y(w)

    Floor division and a scalar max per step keep every score an
    exact int64 independent of summation order — bit-identical
    across cluster sizes and engines (int64-safe while
    max-degree·10¹² fits, i.e. deg < ~9·10⁶; the SQL twin uses the
    same BIGINT grid).  → top-``k`` (node, score_micro), score DESC,
    node ASC.

    Plan per iteration (pagerank's lane on the undirected pairs):
    ONE s-keyed cogroup emits neighbor contributions, a combiner-
    first groupby sums them, one scalar ``max`` normalizes — the
    corpus-scale edge multiset never moves after the distinct-pair
    projection."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import cogroup_partition_ds

    pairs = _distinct_pairs_ds(edges_ds, src, dst, "s", "d",
                               both_directions=True).materialize()
    n_pairs = pairs.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_pairs // 2000 + 1)))
    if n_pairs < 100_000 and pairs.num_blocks() > 2 * num_partitions:
        pairs = pairs.repartition(num_partitions).materialize()
    node_t = pairs.schema().base_schema.field("s").type

    # x₀: every node at 10⁶ — derived from the distinct-d projection
    # (both_directions ⇒ every node appears as d)
    def init_partial(b: pa.Table) -> pa.Table:
        g = b.select(["d"]).group_by(["d"],
                                     use_threads=False).aggregate([])
        return pa.table({
            "node": g["d"],
            "r": pa.array(np.full(g.num_rows, 1_000_000, np.int64))})

    x = pairs.map_batches(init_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("r", alias_name="__s")) \
        .map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "r": pa.array(np.full(b.num_rows, 1_000_000,
                                      np.int64))}),
            batch_format="pyarrow").materialize()

    def contribs(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = pair rows (payload d); right = x rows (payload r,
        # exactly one per node)
        has = (nl > 0) & (nr > 0)
        ridx = (starts + nl)[has]
        r = t["r"].take(pa.array(ridx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lidx, _ = _lr_indices(starts[has], nl[has],
                              np.zeros(int(has.sum()),
                                       dtype=nl.dtype))
        out = pa.table({"d": t["d"].take(pa.array(lidx)),
                        "c": pa.array(np.repeat(r, nl[has]))})
        g = out.group_by(["d"], use_threads=False).aggregate(
            [("c", "sum")])
        return pa.table({"d": g["d"], "c": g["c_sum"]})

    x_schema = pa.schema([("node", node_t), ("r", pa.int64())])
    for _ in range(iters):
        y = cogroup_partition_ds(
            pairs, x, "s", "node", contribs, ["d"], ["r"],
            num_partitions=num_partitions,
            left_schema=pa.schema([("s", node_t), ("d", node_t)]),
            right_schema=x_schema) \
            .groupby("d").aggregate(Sum("c", alias_name="r")) \
            .materialize()
        m = int(y.max("r"))

        def norm(b: pa.Table, m=m) -> pa.Table:
            r = b["r"].combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"node": b["d"],
                             "r": pa.array(r * 1_000_000 // m)})

        # no materialize: norm is a stateless map over the
        # materialized y — re-deriving it inside the next cogroup is
        # cheaper than one more full execution (pagerank's trade)
        x = y.map_batches(norm, batch_format="pyarrow")

    def topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        r = b["r"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((np.asarray(b["node"].to_pylist()), -r))
        return b.take(pa.array(order[:k]))

    top = x.map_batches(topk, batch_format="pyarrow").to_pandas()
    top = top.sort_values(["r", "node"],
                          ascending=[False, True]).head(k)
    return pa.table({
        "node": pa.array(top["node"].tolist(), pa.string()),
        "score_micro": pa.array(top["r"].to_numpy(np.int64))})


def _edge_cn_ds(und, num_partitions: int, node_t):
    """Per-edge common-neighbor counts of a both-directions distinct
    adjacency: canonical (a < b, cn) rows, cn = 0 edges KEPT — the
    shared engine of :func:`edge_jaccard_ds` and :func:`ktruss_ds`.
    Wedge enumeration with per-block combine; one a-keyed cogroup
    sums partials and LEFT-joins onto the canonical adjacency (arrow
    C++ join per partition)."""
    wedges = _wedge_pairs_ds(und, ordered=True,
                             num_partitions=num_partitions,
                             distinct=False)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["a", "b"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"a": g["a"], "b": g["b"],
                         "cn": pc.cast(g["count_all"], pa.int64())})

    cn = wedges.map_batches(combine, batch_format="pyarrow")

    def canon(b: pa.Table) -> pa.Table:
        lt = pc.less(b["n1"], b["n2"])
        return pa.table({"n1": b["n1"].filter(lt),
                         "n2": b["n2"].filter(lt)})

    ce = und.map_batches(canon, batch_format="pyarrow")

    def join_cn(t: pa.Table, starts, nl, nr) -> pa.Table:
        li, ri = _lr_indices(starts, nl, nr)
        left = pa.table({"a": t["__k"].take(pa.array(li)),
                         "b": t["b"].take(pa.array(li)),
                         "cn": t["cn"].take(pa.array(li))})
        right = pa.table({"a": t["__k"].take(pa.array(ri)),
                          "b": t["n2"].take(pa.array(ri))})
        summed = left.group_by(["a", "b"], use_threads=False) \
            .aggregate([("cn", "sum")]) \
            .rename_columns(["a", "b", "cn"])
        out = right.join(summed, keys=["a", "b"],
                         join_type="left outer")
        return pa.table({"a": out["a"], "b": out["b"],
                         "cn": pc.fill_null(out["cn"], 0)})

    return cogroup_partition_ds(
        cn, ce, "a", "n1", join_cn, ["b", "cn"], ["n2"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("a", node_t), ("b", node_t),
                               ("cn", pa.int64())]),
        right_schema=pa.schema([("n1", node_t), ("n2", node_t)]))


def ktruss_ds(edges_ds, k: int = 4, rounds: int = 3,
              src: str = "subj", dst: str = "obj",
              num_partitions: int = 64):
    """Bounded-round k-truss peeling: iteratively drop edges whose
    within-subgraph triangle support (common-neighbor count) falls
    below ``k − 2``, ``rounds`` times, then score the survivors —
    output ``(a, b, support)`` with a < b and support = cn inside the
    FINAL subgraph.  Bounded rounds is the same fixed-round contract
    as :func:`kcore_ds` (the SQL twin unrolls the identical number);
    the loop exits early at a fixed point, which is safe because
    further rounds are then no-ops in both engines.

    Scale shape: each round is one wedge-enumeration pass + filter
    over the CURRENT edge set (monotonically shrinking); the shuffle
    carries (a, b, cn) rows, never the raw multi-predicate stream."""
    import ray.data as rd

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    n_pairs = und.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_pairs // 2000 + 1)))
    if n_pairs < 100_000 and und.num_blocks() > 2 * num_partitions:
        und = und.repartition(num_partitions).materialize()
    if n_pairs == 0:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "support": pa.array([], pa.int64())}))
    node_t = und.schema().base_schema.field("n1").type
    need = k - 2

    def keep_strong(b: pa.Table) -> pa.Table:
        m = pc.greater_equal(b["cn"], need)
        return pa.table({"a": b["a"].filter(m), "b": b["b"].filter(m)})

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "n1": pa.concat_arrays([b["a"].combine_chunks(),
                                    b["b"].combine_chunks()]),
            "n2": pa.concat_arrays([b["b"].combine_chunks(),
                                    b["a"].combine_chunks()])})

    n_edges = n_pairs // 2
    for _ in range(rounds):
        kept = _edge_cn_ds(und, num_partitions, node_t) \
            .map_batches(keep_strong, batch_format="pyarrow") \
            .materialize()
        n_new = kept.count()
        if n_new == 0:
            return rd.from_arrow(pa.table({
                "a": pa.array([], node_t), "b": pa.array([], node_t),
                "support": pa.array([], pa.int64())}))
        und = kept.map_batches(widen, batch_format="pyarrow") \
            .materialize()
        if n_new == n_edges:        # fixed point — no-op rounds left
            break
        n_edges = n_new

    def score(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["a"], "b": b["b"],
                         "support": b["cn"]})

    return _edge_cn_ds(und, num_partitions, node_t) \
        .map_batches(score, batch_format="pyarrow")


def edge_jaccard_ds(edges_ds, src: str = "subj", dst: str = "obj",
                    num_partitions: int = 64):
    """Link-strength scoring: per undirected edge (a < b) the
    neighborhood Jaccard ``|N(a)∩N(b)| × 10⁶ // |N(a)∪N(b)|`` in
    exact integer ppm (``= cn × 10⁶ // (deg(a) + deg(b) − cn)``;
    edges with NO common neighbor are kept at 0) → (a, b, cn,
    jac_ppm).  The KG-curation signal separating well-supported edges
    from one-off extractions.

    Plan: wedge enumeration with per-block combine (the only wide
    move carries (a, b, cn) partials); ONE a-keyed cogroup sums
    partials and LEFT-joins onto the canonical adjacency (arrow C++
    join per partition — cn=0 edges survive); two schema-hinted
    cogroups attach the endpoint degrees.  Same hub-cap contract as
    the other wedge operators."""
    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    n_pairs = und.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_pairs // 2000 + 1)))
    if n_pairs < 100_000 and und.num_blocks() > 2 * num_partitions:
        und = und.repartition(num_partitions).materialize()
    node_t = und.schema().base_schema.field("n1").type

    pairs = _edge_cn_ds(und, num_partitions, node_t)

    def deg_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["n1"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"n": g["n1"],
                         "dg": pc.cast(g["count_all"], pa.int64())})

    from ray.data.aggregate import Sum

    deg = und.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("n").aggregate(Sum("dg", alias_name="dg")) \
        .materialize()

    def attach(out_col, left_cols):
        def fn(t: pa.Table, starts, nl, nr) -> pa.Table:
            li, ri_all = _lr_indices(starts, nl, nr)
            # right side unique per key: map each left row to its
            # run's single right row
            run_of = np.repeat(np.arange(len(nl)), nl)
            has = nr[run_of] > 0
            li = li[has]
            ridx = (starts + nl)[run_of[has]]
            cols = {c: t[c].take(pa.array(li)) for c in left_cols}
            cols["__kk"] = t["__k"].take(pa.array(li))
            cols[out_col] = t["dg"].take(pa.array(ridx))
            out = pa.table(cols)
            return out
        return fn

    deg_schema = pa.schema([("n", node_t), ("dg", pa.int64())])
    with_da = cogroup_partition_ds(
        pairs, deg, "a", "n", attach("da", ["b", "cn"]),
        ["b", "cn"], ["dg"], num_partitions=num_partitions,
        left_schema=pa.schema([("a", node_t), ("b", node_t),
                               ("cn", pa.int64())]),
        right_schema=deg_schema)

    def rekey(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["__kk"], "b": b["b"], "cn": b["cn"],
                         "da": b["da"]})

    with_da = with_da.map_batches(rekey, batch_format="pyarrow")
    full = cogroup_partition_ds(
        with_da, deg, "b", "n", attach("db", ["a", "cn", "da"]),
        ["a", "cn", "da"], ["dg"], num_partitions=num_partitions,
        left_schema=pa.schema([("b", node_t), ("a", node_t),
                               ("cn", pa.int64()),
                               ("da", pa.int64())]),
        right_schema=deg_schema)

    def score(b: pa.Table) -> pa.Table:
        cnv = b["cn"].combine_chunks().to_numpy(zero_copy_only=False)
        da = b["da"].combine_chunks().to_numpy(zero_copy_only=False)
        db = b["db"].combine_chunks().to_numpy(zero_copy_only=False)
        den = da + db - cnv
        return pa.table({
            "a": b["a"], "b": b["__kk"], "cn": b["cn"],
            "jac_ppm": pa.array(cnv * 1_000_000 // den)})

    return full.map_batches(score, batch_format="pyarrow")


def clustering_coeff_ds(edges_ds, src: str = "subj", dst: str = "obj",
                        num_partitions: int = 64):
    """Per-node local clustering coefficient over the undirected
    distinct-pair graph, exact integer ppm:
    ``coeff_ppm = 2·tri(v)·10⁶ // (deg(v)·(deg(v)−1))`` (0 when
    deg < 2), with ``tri(v)`` = edges among v's neighbours.

    Plan: centered wedges (c, a, b with a < b) are generated per
    center-hash partition with flat index math (each center's
    neighbour run is already co-located, and its run LENGTH is the
    degree); ONE cogroup keyed by the wedge's smaller endpoint joins
    them against the canonical a<b edge set (pyarrow C++ inner join —
    the right side is distinct so no fanout) and reduces to
    per-partition (node, tri) partials; a node-keyed sum plus a
    node-keyed cogroup against :func:`degree_ds` finishes — the wide
    steps move wedges and |nodes|-bounded partials, never raw edges."""
    from ray.data.aggregate import Sum

    from kgforge.functions.joins import _part_codes, cogroup_partition_ds

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__p", pa.array(_part_codes(t["n1"], num_partitions)))

    def centered_wedges(t: pa.Table) -> pa.Table:
        t = t.sort_by([("n1", "ascending"), ("n2", "ascending")])
        codes = t["n1"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        starts = _run_starts(codes)
        lens = np.diff(np.concatenate([starts, [len(codes)]])) \
            .astype(np.int64)
        m = lens * lens
        tot = int(m.sum())
        empty = pa.table({"c": pa.array([], pa.string()),
                          "a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        if tot == 0:
            return empty
        kofs = np.repeat(np.arange(len(m)), m)
        j = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        j1, j2 = j // lens[kofs], j % lens[kofs]
        keep = j1 < j2
        kofs = kofs[keep]
        nbr = t["n2"]
        return pa.table({
            "c": t["n1"].take(pa.array(starts[kofs])),
            "a": nbr.take(pa.array(starts[kofs] + j1[keep])),
            "b": nbr.take(pa.array(starts[kofs] + j2[keep]))})

    wedges = und.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(centered_wedges,
                                   batch_format="pyarrow")

    def canon(b: pa.Table) -> pa.Table:
        lt = pc.less(b["n1"], b["n2"])
        return pa.table({"n1": b["n1"].filter(lt),
                         "n2": b["n2"].filter(lt)})

    ce = und.map_batches(canon, batch_format="pyarrow")

    def count_closed(t: pa.Table, starts, nl, nr) -> pa.Table:
        lidx, ridx = _lr_indices(starts, nl, nr)
        left = pa.table({"a": t["__k"].take(pa.array(lidx)),
                         "b": t["b"].take(pa.array(lidx)),
                         "c": t["c"].take(pa.array(lidx))})
        right = pa.table({"a": t["__k"].take(pa.array(ridx)),
                          "b": t["n2"].take(pa.array(ridx))})
        closed = left.join(right, keys=["a", "b"],
                           join_type="left semi")
        g = closed.group_by(["c"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"node": g["c"],
                         "tri": pc.cast(g["count_all"], pa.int64())})

    sch_w = pa.schema([("a", pa.string()), ("b", pa.string()),
                       ("c", pa.string())])
    sch_nn = pa.schema([("n1", pa.string()), ("n2", pa.string())])
    tri = cogroup_partition_ds(wedges, ce, "a", "n1", count_closed,
                               ["b", "c"], ["n2"],
                               num_partitions=num_partitions,
                               left_schema=sch_w,
                               right_schema=sch_nn) \
        .groupby("node").aggregate(Sum("tri", alias_name="tri"))

    deg = degree_ds(edges_ds, src, dst)

    def strip_deg(b: pa.Table) -> pa.Table:
        return b.select(["node", "degree"])

    deg = deg.map_batches(strip_deg, batch_format="pyarrow")

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = degree rows (one per node), right = tri partial sums
        keep = nl > 0
        lidx = starts[keep]
        d = t["degree"].take(pa.array(lidx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tri_v = pc.fill_null(t["tri"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tsum = np.add.reduceat(tri_v, starts)[keep] if keep.any() else \
            np.zeros(0, np.int64)
        den = d * (d - 1)
        ppm = np.where(den > 0, 2 * tsum * 1_000_000 //
                       np.maximum(den, 1), 0)
        return pa.table({"node": t["__k"].take(pa.array(lidx)),
                         "degree": pa.array(d),
                         "n_tri": pa.array(tsum),
                         "coeff_ppm": pa.array(ppm)})

    return cogroup_partition_ds(
        deg, tri, "node", "node", fuse, ["degree"], ["tri"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("node", pa.string()),
                               ("degree", pa.int64())]),
        right_schema=pa.schema([("node", pa.string()),
                                ("tri", pa.int64())]))


def _weighted_cn_topk(edges_ds, src: str, dst: str, k: int,
                      num_partitions: int, weight_of_deg, score_name: str):
    """Shared engine for the degree-weighted common-neighbor
    link-prediction family (:func:`ra_link_pred_ds`,
    :func:`adamic_adar_ds`): top-``k`` non-adjacent pairs (a < b) by
    ``Σ_z weight_of_deg(deg(z))`` over common neighbours ``z``, where
    ``weight_of_deg`` maps an int64 degree vector to int64 micro-unit
    weights (so the score is deterministic and SQL-twin-exact).

    Plan: identical shuffle shape to :func:`common_neighbors_ds`, but
    each wedge is emitted already weighted — the center's degree IS
    its co-located neighbour-run length, so the weight costs nothing
    extra; per-block partial sums, ONE cogroup keyed by ``a`` fuses
    the exact sum with the adjacency anti-join, block top-k partials
    bound the final sort to O(k × blocks)."""
    from kgforge.functions.joins import _part_codes, cogroup_partition_ds

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__p", pa.array(_part_codes(t["n1"], num_partitions)))

    def weighted_wedges(t: pa.Table) -> pa.Table:
        t = t.sort_by([("n1", "ascending"), ("n2", "ascending")])
        codes = t["n1"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        starts = _run_starts(codes)
        lens = np.diff(np.concatenate([starts, [len(codes)]])) \
            .astype(np.int64)
        m = lens * lens
        tot = int(m.sum())
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "w": pa.array([], pa.int64())})
        if tot == 0:
            return empty
        kofs = np.repeat(np.arange(len(m)), m)
        j = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        j1, j2 = j // lens[kofs], j % lens[kofs]
        keep = j1 < j2
        kofs2 = kofs[keep]
        nbr = t["n2"]
        pairs = pa.table({
            "a": nbr.take(pa.array(starts[kofs2] + j1[keep])),
            "b": nbr.take(pa.array(starts[kofs2] + j2[keep])),
            "w": pa.array(weight_of_deg(lens[kofs2]))})
        g = pairs.group_by(["a", "b"], use_threads=False) \
            .aggregate([("w", "sum")])
        return pa.table({"a": g["a"], "b": g["b"], "w": g["w_sum"]})

    wedges = und.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(weighted_wedges,
                                   batch_format="pyarrow")

    def canon(b: pa.Table) -> pa.Table:
        lt = pc.less(b["n1"], b["n2"])
        return pa.table({"n1": b["n1"].filter(lt),
                         "n2": b["n2"].filter(lt)})

    ce = und.map_batches(canon, batch_format="pyarrow")

    def per_partition(t: pa.Table, starts, nl, nr) -> pa.Table:
        lidx, ridx = _lr_indices(starts, nl, nr)
        partials = pa.table({"a": t["__k"].take(pa.array(lidx)),
                             "b": t["b"].take(pa.array(lidx)),
                             "w": t["w"].take(pa.array(lidx))})
        g = partials.group_by(["a", "b"], use_threads=False) \
            .aggregate([("w", "sum")])
        left = pa.table({"a": g["a"], "b": g["b"],
                         score_name: g["w_sum"]})
        right = pa.table({"a": t["__k"].take(pa.array(ridx)),
                          "b": t["n2"].take(pa.array(ridx))})
        return left.join(right, keys=["a", "b"], join_type="left anti")

    nonadj = cogroup_partition_ds(
        wedges, ce, "a", "n1", per_partition, ["b", "w"], ["n2"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                               ("w", pa.int64())]),
        right_schema=pa.schema([("n1", pa.string()),
                                ("n2", pa.string())]))

    def partial_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        neg = pc.negate(b[score_name]).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((np.asarray(b["b"].to_pylist()),
                            np.asarray(b["a"].to_pylist()), neg))
        return b.take(pa.array(order[:k]))

    return nonadj.map_batches(partial_topk, batch_format="pyarrow") \
        .sort([score_name, "a", "b"],
              descending=[True, False, False]).limit(k)


def ra_link_pred_ds(edges_ds, src: str = "subj", dst: str = "obj",
                    k: int = 20, num_partitions: int = 64):
    """Resource-Allocation link prediction (Zhou–Lü–Zhang 2009): the
    top-``k`` non-adjacent pairs (a < b) by
    ``ra_score = Σ_z 10⁶ // deg(z)`` over common neighbours ``z`` —
    integer micro-units (truncating), so the score is deterministic
    and SQL-twin-exact.  Plan: :func:`_weighted_cn_topk`."""
    return _weighted_cn_topk(edges_ds, src, dst, k, num_partitions,
                             lambda d: 1_000_000 // d, "ra_score")


def adamic_adar_ds(edges_ds, src: str = "subj", dst: str = "obj",
                   k: int = 20, num_partitions: int = 64):
    """Discrete Adamic–Adar link prediction: top-``k`` non-adjacent
    pairs (a < b) by ``aa_score = Σ_z 10⁶ // (1 + floor(log2 deg(z)))``
    over common neighbours ``z``.  The classical AA weight ``1/ln d``
    is transcendental — floats would make the score depend on libm and
    summation order — so the discrete form quantizes the logarithm:
    ``floor(log2 d)`` is computed bit-exactly from the IEEE-754
    exponent (``np.frexp``; exact for any int64 degree) and the SQL
    twin's ``floor(log2(d))`` matches it (verified over 1..2·10⁶,
    the full degree domain at test scale).  Same ordering as classical
    AA whenever degrees differ by a power of two; deterministic and
    SQL-twin-exact always.  Plan: :func:`_weighted_cn_topk`."""
    def weight(d: np.ndarray) -> np.ndarray:
        log2_floor = (np.frexp(d.astype(np.float64))[1] - 1).astype(np.int64)
        return 1_000_000 // (1 + log2_floor)

    return _weighted_cn_topk(edges_ds, src, dst, k, num_partitions,
                             weight, "aa_score")


def hits_ds(edges_ds, iters: int = 2, src: str = "subj",
            dst: str = "obj", num_partitions: int = 64):
    """Integer-deterministic HITS (Kleinberg) over the distinct
    directed-pair graph: hub/authority scores in int64 micro-units,
    each half-step

        auth'(v) = (Σ_{u→v} hub(u)) · 10⁶ // max_w(Σ hub)
        hub'(v)  = (Σ_{v→w} auth'(w)) · 10⁶ // max_w(Σ auth')

    L∞ (max) normalization with floor division instead of the
    classical L2 — summation-order-free and SQL-twin-exact (identical
    int64s both engines; the ·10⁶ step bounds the supported weighted
    degree at ~9.2·10⁶ before int64 overflow — both engines fail
    loudly past it, DuckDB by OverflowError, documented contract).

    Plan per half-step: the pagerank cogroup pair (scores cogrouped
    with pairs keyed by the emitting side → contribution rows →
    node-keyed segment sum), a node-bounded materialize (it is
    consumed twice: the metadata max + the normalize map), then one
    streaming normalize.  The corpus-scale table here is the pair
    set; scores stay |nodes|-bounded."""
    from ray.data.aggregate import Sum

    pairs = _distinct_pairs_ds(edges_ds, src, dst, "s", "d",
                               both_directions=False,
                               drop_self=False).materialize()
    n_pairs = pairs.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_pairs // 2000 + 1)))
    if n_pairs < 100_000 and pairs.num_blocks() > 2 * num_partitions:
        pairs = pairs.repartition(num_partitions).materialize()

    def node_partial(b: pa.Table) -> pa.Table:
        t = pa.concat_tables([pa.table({"node": b["s"]}),
                              pa.table({"node": b["d"]})])
        return t.group_by(["node"], use_threads=False).aggregate([])

    from ray.data.aggregate import Count

    def strip(b: pa.Table) -> pa.Table:
        return b.select(["node"])

    nodes = pairs.map_batches(node_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="__c")) \
        .map_batches(strip, batch_format="pyarrow")
    if n_pairs < 100_000:
        nodes = nodes.repartition(num_partitions)
    nodes = nodes.materialize()

    def init_scores(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"],
                         "v": pa.array(np.full(b.num_rows, 1_000_000,
                                               dtype=np.int64))})

    score_schema = pa.schema([("node", pa.string()), ("v", pa.int64())])
    contrib_schema = pa.schema([("t", pa.string()), ("c", pa.int64())])
    hub = nodes.map_batches(init_scores, batch_format="pyarrow")

    def emit(out_key: str):
        def contribs(t: pa.Table, starts, nl, nr) -> pa.Table:
            # left = pairs (payload = the receiving endpoint), right =
            # scores (exactly one row per node)
            has = (nl > 0) & (nr > 0)
            ridx = (starts + nl)[has]
            val = t["v"].take(pa.array(ridx)).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            lidx, _ = _lr_indices(starts[has], nl[has],
                                  np.zeros(int(has.sum()),
                                           dtype=nl.dtype))
            return pa.table({
                "t": t[out_key].take(pa.array(lidx)),
                "c": pa.array(np.repeat(val, nl[has]))})
        return contribs

    def gather(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = nodes (one row per node), right = contribution rows
        has_l = nl > 0
        lidx = starts[has_l]
        c = pc.fill_null(t["c"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        r_starts = (starts + nl)[has_l]
        r_lens = nr[has_l]
        s = np.zeros(int(has_l.sum()), dtype=np.int64)
        nz = r_lens > 0
        if nz.any():
            s[nz] = np.add.reduceat(c, r_starts[nz])
        return pa.table({"node": t["__k"].take(pa.array(lidx)),
                         "v": pa.array(s)})

    def half_step(scores, key_pair: str, key_out: str):
        """One HITS half-step: scores arrive keyed by the EMITTING
        endpoint (``key_pair``), contributions land on ``key_out``."""
        contrib = cogroup_partition_ds(
            pairs, scores, key_pair, "node", emit(key_out), [key_out],
            ["v"], num_partitions=num_partitions,
            right_schema=score_schema)
        raw = cogroup_partition_ds(
            nodes, contrib, "node", "t", gather, [], ["c"],
            num_partitions=num_partitions,
            right_schema=contrib_schema).materialize()
        mx = max(int(raw.max("v") or 0), 1)

        def norm(b: pa.Table) -> pa.Table:
            v = b["v"].combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"node": b["node"],
                             "v": pa.array(v * 1_000_000 // mx)})

        return raw.map_batches(norm, batch_format="pyarrow") \
            .materialize()

    auth = None
    for _ in range(iters):
        auth = half_step(hub, "s", "d")      # auth ← hubs of in-edges
        hub = half_step(auth, "d", "s")      # hub ← auths of out-edges

    def j(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = auth, right = hub — both exactly one row per node
        keep = (nl > 0) & (nr > 0)
        lidx = starts[keep]
        ridx = (starts + nl)[keep]
        return pa.table({"node": t["__k"].take(pa.array(lidx)),
                         "auth": t["v"].take(pa.array(lidx)),
                         "hub": t["v_r"].take(pa.array(ridx))})

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "v_r": b["v"]})

    hub_r = hub.map_batches(rename, batch_format="pyarrow")
    return cogroup_partition_ds(
        auth, hub_r, "node", "node", j, ["v"], ["v_r"],
        num_partitions=num_partitions,
        left_schema=score_schema,
        right_schema=pa.schema([("node", pa.string()),
                                ("v_r", pa.int64())]))


def label_prop_communities_ds(edges_ds, rounds: int = 2,
                              src: str = "subj", dst: str = "obj",
                              num_partitions: int = 64):
    """Synchronous label-propagation communities (Raghavan et al.
    2007, made deterministic): every node starts as its own label;
    each round ALL nodes simultaneously adopt the most frequent label
    among their neighbours, ties broken by the lexicographically
    smallest label.  Fixed ``rounds`` (default 2) with synchronous
    updates + a total tie order ⇒ bit-identical output across block
    layouts, cluster sizes and engines (the SQL twin encodes the same
    argmax).

    Plan per round (2 keyed shuffles): ONE cogroup ships each node's
    current label to its neighbours (labels are |nodes|-bounded; the
    pair set is the corpus-scale table and never re-keys), then a
    hash(node) % P partition votes — per-partition arrow count +
    vectorized lexsort argmax, no per-node Python."""
    from kgforge.functions.joins import _part_codes, cogroup_partition_ds

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    n_pairs = und.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_pairs // 2000 + 1)))
    if n_pairs < 100_000 and und.num_blocks() > 2 * num_partitions:
        und = und.repartition(num_partitions).materialize()

    # distinct nodes via one keyed pass (n1 covers every node: und is
    # symmetric, so each node appears on the left side)
    from ray.data.aggregate import Count

    def n1_only(b: pa.Table) -> pa.Table:
        return b.select(["n1"])

    nodes = und.map_batches(n1_only, batch_format="pyarrow") \
        .groupby("n1").aggregate(Count(alias_name="__c"))

    def to_labels(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["n1"], "lab": b["n1"]})

    labels = nodes.map_batches(to_labels, batch_format="pyarrow") \
        .materialize()
    label_schema = pa.schema([("node", pa.string()),
                              ("lab", pa.string())])

    def emit(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = und pairs (payload n2), right = labels (one per node)
        has = (nl > 0) & (nr > 0)
        ridx = (starts + nl)[has]
        lab = t["lab"].take(pa.array(ridx))
        lidx, _ = _lr_indices(starts[has], nl[has],
                              np.zeros(int(has.sum()), dtype=nl.dtype))
        lab_rep = lab.take(pa.array(
            np.repeat(np.arange(int(has.sum())), nl[has])))
        return pa.table({"t": t["n2"].take(pa.array(lidx)),
                         "lab": lab_rep})

    def vote(t: pa.Table) -> pa.Table:
        g = t.select(["t", "lab"]) \
            .group_by(["t", "lab"], use_threads=False) \
            .aggregate([([], "count_all")])
        cnt = g["count_all"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tt = g["t"].combine_chunks()
        lab = g["lab"].combine_chunks()
        # argmax per node: sort (node asc, count desc, lab asc), keep
        # the first row of each node run
        order = pc.sort_indices(pa.table({
            "t": tt, "c": pa.array(-cnt), "lab": lab}),
            sort_keys=[("t", "ascending"), ("c", "ascending"),
                       ("lab", "ascending")])
        o = order.to_numpy(zero_copy_only=False)
        t_sorted = tt.take(pa.array(o))
        codes = t_sorted.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        starts = _run_starts(codes)
        pick = pa.array(o[starts])
        return pa.table({"node": tt.take(pick), "lab": lab.take(pick)})

    for _ in range(rounds):
        contrib = cogroup_partition_ds(
            und, labels, "n1", "node", emit, ["n2"], ["lab"],
            num_partitions=num_partitions, right_schema=label_schema)

        def tag(b: pa.Table) -> pa.Table:
            return b.append_column(
                "__p", pa.array(_part_codes(b["t"], num_partitions)))

        labels = contrib.map_batches(tag, batch_format="pyarrow") \
            .groupby("__p").map_groups(vote, batch_format="pyarrow") \
            .materialize()

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "community": b["lab"]})

    return labels.map_batches(rename, batch_format="pyarrow")


def modularity_ds(edges_ds, rounds: int = 2, src: str = "subj",
                  dst: str = "obj",
                  num_partitions: int = 64) -> pa.Table:
    """Newman modularity of the deterministic LPA partition
    (:func:`label_prop_communities_ds`), exact-integer form: one row
    ``(m, n_comms, intra_edges, sum_dc2, q_ppm)`` with
    ``q_ppm = 10⁶·(4·m·intra_edges − Σ_c d_c²) // 4m²`` (truncating
    toward zero like the SQL twin — Q can be negative).  ``m`` =
    undirected edge count, ``d_c`` = degree mass of community ``c``.

    Plan: the partition re-runs LPA (deterministic, so both passes
    agree); intra-edge counting attaches labels to both endpoints of
    the canonical a<b edge stream via two keyed cogroups (the
    rich-club attach shape); the degree-mass squares reduce
    community-keyed.  Driver state is three scalars — communities
    never materialize on the driver."""
    from ray.data.aggregate import Sum

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    n_pairs = und.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_pairs // 2000 + 1)))
    if n_pairs < 100_000 and und.num_blocks() > 2 * num_partitions:
        und = und.repartition(num_partitions).materialize()
    node_t = und.schema().base_schema.field("n1").type
    m = n_pairs // 2
    if m == 0:
        return pa.table({c: pa.array([0], pa.int64()) for c in
                         ("m", "n_comms", "intra_edges", "sum_dc2",
                          "q_ppm")})

    labels = label_prop_communities_ds(
        edges_ds, rounds=rounds, src=src, dst=dst,
        num_partitions=num_partitions).materialize()
    lab_schema = pa.schema([("node", node_t), ("community", node_t)])

    # ---- degree mass per community → n_comms, Σ d_c² ----
    def deg_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["n1"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"n": g["n1"],
                         "dg": pc.cast(g["count_all"], pa.int64())})

    deg = und.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("n").aggregate(Sum("dg", alias_name="dg"))

    def attach_lab(out_col, left_cols, lab_col="community"):
        def fn(t: pa.Table, starts, nl, nr) -> pa.Table:
            has = (nl > 0) & (nr > 0)
            ridx = (starts + nl)[has]
            lab = t[lab_col].take(pa.array(ridx))
            lidx, _ = _lr_indices(starts[has], nl[has],
                                  np.zeros(int(has.sum()),
                                           dtype=nl.dtype))
            lab_rep = lab.take(pa.array(
                np.repeat(np.arange(int(has.sum())), nl[has])))
            cols = {c: t[c].take(pa.array(lidx)) for c in left_cols}
            cols["__kk"] = t["__k"].take(pa.array(lidx))
            cols[out_col] = lab_rep
            return pa.table(cols)
        return fn

    dc = cogroup_partition_ds(
        deg, labels, "n", "node", attach_lab("lab", ["dg"]), ["dg"],
        ["community"], num_partitions=num_partitions,
        left_schema=pa.schema([("n", node_t), ("dg", pa.int64())]),
        right_schema=lab_schema) \
        .groupby("lab").aggregate(Sum("dg", alias_name="dc"))

    n_comms = 0
    sum_dc2 = 0
    for part in dc.iter_batches(batch_format="pyarrow"):
        v = part["dc"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_comms += int(len(v))
        sum_dc2 += int((v * v).sum())

    # ---- intra-community edges over the canonical a<b stream ----
    def canon(b: pa.Table) -> pa.Table:
        lt = pc.less(b["n1"], b["n2"])
        return pa.table({"a": b["n1"].filter(lt),
                         "b": b["n2"].filter(lt)})

    ce = und.map_batches(canon, batch_format="pyarrow")
    with_la = cogroup_partition_ds(
        ce, labels, "a", "node", attach_lab("la", ["b"]), ["b"],
        ["community"], num_partitions=num_partitions,
        left_schema=pa.schema([("a", node_t), ("b", node_t)]),
        right_schema=lab_schema)

    def rekey(b: pa.Table) -> pa.Table:
        return pa.table({"b": b["b"], "la": b["la"]})

    with_lb = cogroup_partition_ds(
        with_la.map_batches(rekey, batch_format="pyarrow"), labels,
        "b", "node", attach_lab("lb", ["la"]), ["la"], ["community"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("b", node_t), ("la", node_t)]),
        right_schema=lab_schema)

    def intra_partial(b: pa.Table) -> pa.Table:
        eq = pc.equal(b["la"], b["lb"])
        return pa.table({"c": pa.array(
            [int(pc.sum(pc.cast(eq, pa.int64())).as_py() or 0)],
            pa.int64())})

    intra = 0
    for part in with_lb.map_batches(intra_partial,
                                    batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        intra += int(part["c"].to_numpy(zero_copy_only=False).sum())

    q_num = 4 * m * intra - sum_dc2
    q_den = 4 * m * m
    q = abs(q_num) * 1_000_000 // q_den
    q_ppm = q if q_num >= 0 else -q        # truncate toward zero
    return pa.table({
        "m": pa.array([m], pa.int64()),
        "n_comms": pa.array([n_comms], pa.int64()),
        "intra_edges": pa.array([intra], pa.int64()),
        "sum_dc2": pa.array([sum_dc2], pa.int64()),
        "q_ppm": pa.array([q_ppm], pa.int64())})


def katz_ds(edges_ds, iters: int = 3, src: str = "subj",
            dst: str = "obj", num_partitions: int = 64):
    """Integer-deterministic Katz centrality (attenuation β = 1/2)
    over the distinct directed-pair graph:

        katz'(v) = Σ_{u→v} (10⁶ + katz(u)) // 2,   katz₀ = 0

    — per-edge floor division (order-free), so after ``iters`` rounds
    ``katz(v)`` counts the attenuated in-walks of length ≤ iters in
    int64 micro-units, bit-identical across layouts, cluster sizes
    and engines (the SQL twin floors per edge too).

    Plan per iteration: the pagerank cogroup pair — scores cogrouped
    with pairs keyed by source → per-edge contribution rows →
    node-keyed segment sum inside the second cogroup.  Scores stay
    |nodes|-bounded; the pair set never re-keys."""
    from ray.data.aggregate import Count

    pairs = _distinct_pairs_ds(edges_ds, src, dst, "s", "d",
                               both_directions=False,
                               drop_self=False).materialize()
    n_pairs = pairs.count()
    num_partitions = int(min(num_partitions,
                             max(4, n_pairs // 2000 + 1)))
    if n_pairs < 100_000 and pairs.num_blocks() > 2 * num_partitions:
        pairs = pairs.repartition(num_partitions).materialize()

    def node_partial(b: pa.Table) -> pa.Table:
        t = pa.concat_tables([pa.table({"node": b["s"]}),
                              pa.table({"node": b["d"]})])
        return t.group_by(["node"], use_threads=False).aggregate([])

    def strip(b: pa.Table) -> pa.Table:
        return b.select(["node"])

    nodes = pairs.map_batches(node_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="__c")) \
        .map_batches(strip, batch_format="pyarrow")
    if n_pairs < 100_000:
        nodes = nodes.repartition(num_partitions)
    nodes = nodes.materialize()

    def init_scores(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"],
                         "v": pa.array(np.zeros(b.num_rows,
                                                dtype=np.int64))})

    score_schema = pa.schema([("node", pa.string()), ("v", pa.int64())])
    contrib_schema = pa.schema([("t", pa.string()), ("c", pa.int64())])
    katz = nodes.map_batches(init_scores, batch_format="pyarrow")

    def emit(t: pa.Table, starts, nl, nr) -> pa.Table:
        has = (nl > 0) & (nr > 0)
        ridx = (starts + nl)[has]
        val = t["v"].take(pa.array(ridx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        per = (1_000_000 + val) // 2
        lidx, _ = _lr_indices(starts[has], nl[has],
                              np.zeros(int(has.sum()), dtype=nl.dtype))
        return pa.table({"t": t["d"].take(pa.array(lidx)),
                         "c": pa.array(np.repeat(per, nl[has]))})

    def gather(t: pa.Table, starts, nl, nr) -> pa.Table:
        has_l = nl > 0
        lidx = starts[has_l]
        c = pc.fill_null(t["c"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        r_starts = (starts + nl)[has_l]
        r_lens = nr[has_l]
        s = np.zeros(int(has_l.sum()), dtype=np.int64)
        nz = r_lens > 0
        if nz.any():
            s[nz] = np.add.reduceat(c, r_starts[nz])
        return pa.table({"node": t["__k"].take(pa.array(lidx)),
                         "v": pa.array(s)})

    for _ in range(iters):
        contrib = cogroup_partition_ds(
            pairs, katz, "s", "node", emit, ["d"], ["v"],
            num_partitions=num_partitions, right_schema=score_schema)
        katz = cogroup_partition_ds(
            nodes, contrib, "node", "t", gather, [], ["c"],
            num_partitions=num_partitions,
            right_schema=contrib_schema)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "katz": b["v"]})

    return katz.map_batches(rename, batch_format="pyarrow")


def bfs_levels_ds(edges_ds, n_seeds: int = 5, max_hops: int = 4,
                  src: str = "subj", dst: str = "obj",
                  num_partitions: int = 64,
                  driver_max_members: int = 2_000_000):
    """Multi-source BFS hop distances: ``(node, dist)`` for every node
    reachable within ``max_hops`` undirected hops of the seed set (the
    ``n_seeds`` lexicographically smallest nodes — a deterministic
    default shared with the recursive-CTE SQL twin); ``dist`` is the
    TRUE minimum hop count, seeds at 0.

    Same two-lane design as :func:`ego_edges_ds`:

    - **broadcast** (visited set ≤ ``driver_max_members``): the
      frontier is ``ray.put`` once per hop and each hop is ONE
      streaming ``pc.is_in`` semi-filter over the undirected
      distinct-pair table — zero shuffles, the edge table never moves.
    - **distributed** (a dense neighborhood blows past the bound):
      from the spill hop onward the frontier and the visited set stay
      Datasets; each hop is one hash-cogroup semi-join (frontier →
      neighbors) plus one anti-join (drop already-visited), so a
      billion-node reachable set costs shuffle volume, not driver
      memory.

    Seed selection never sorts the graph: each batch contributes its
    ``n_seeds`` smallest distinct node ids (a bounded partial — the
    global smallest are always inside the union of per-batch
    smallest), folded on the driver."""
    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    seeds = _smallest_nodes(und, n_seeds)
    return _bfs_from(und, seeds, max_hops, num_partitions,
                     driver_max_members)


def _smallest_nodes(und, n_seeds: int) -> list:
    """The ``n_seeds`` lexicographically smallest node ids of the
    undirected pair table — per-batch bounded partials folded on the
    driver (the global smallest are always inside the union of
    per-batch smallest); the graph is never sorted."""
    def seed_partial(b: pa.Table) -> pa.Table:
        u = b["n1"].combine_chunks().unique()
        idx = pc.sort_indices(u)[:n_seeds]
        return pa.table({"n": u.take(idx)})

    cand: list[str] = []
    for part in und.map_batches(seed_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        cand.extend(part["n"].to_pylist())
    return sorted(set(cand))[:n_seeds]


def _bfs_from(und, seeds: list, max_hops: int, num_partitions: int,
              driver_max_members: int):
    """The two-lane multi-source BFS engine shared by
    :func:`bfs_levels_ds` (one multi-source call) and
    :func:`harmonic_ds` (one single-source call per seed): broadcast
    ``pc.is_in`` hops while the visited set fits the driver bound,
    hash-cogroup frontier expansion + anti-join beyond it."""
    import ray
    import ray.data as rd

    dist: dict[str, int] = {s: 0 for s in seeds}
    frontier: set[str] = set(seeds)
    hops_done = 0
    while (hops_done < max_hops and frontier
           and len(dist) <= driver_max_members):
        fref = ray.put(pa.array(sorted(frontier), pa.string()))

        def hop(b: pa.Table, _f=fref) -> pa.Table:
            mask = pc.is_in(b["n1"], value_set=ray.get(_f))
            return pa.table({"node": b["n2"].filter(mask)
                             .combine_chunks().unique()})

        nxt: set[str] = set()
        for part in und.map_batches(hop, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            nxt.update(part["node"].to_pylist())
        frontier = nxt - dist.keys()
        hops_done += 1
        for n in frontier:
            dist[n] = hops_done

    if hops_done == max_hops or not frontier:
        ks = sorted(dist)
        return rd.from_arrow(pa.table({
            "node": pa.array(ks, pa.string()),
            "dist": pa.array([dist[k] for k in ks], pa.int64())}))

    # ---- spill: continue with Dataset frontier / visited ----
    visited = rd.from_arrow(pa.table({
        "node": pa.array(sorted(dist), pa.string()),
        "dist": pa.array([dist[k] for k in sorted(dist)], pa.int64())}))
    front_ds = rd.from_arrow(pa.table({
        "node": pa.array(sorted(frontier), pa.string())}))
    node_schema = pa.schema([("node", pa.string())])

    def nbrs_of(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep = np.repeat(nr > 0, nl + nr)
        sub = t.filter(pa.array(keep))
        side = sub["__side"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        nb = sub["n2"].filter(pa.array(side == 0)).combine_chunks()
        return pa.table({"node": nb.unique()})

    def unseen(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = candidate nodes, right = visited: keep keys whose
        # visited run is empty (anti-join), one row per key
        keep = (nl > 0) & (nr == 0)
        return pa.table({"node": t["__k"].take(
            pa.array(starts[keep]))})

    while hops_done < max_hops:
        hops_done += 1
        cands = cogroup_partition_ds(
            und, front_ds, "n1", "node", nbrs_of, ["n2"], [],
            num_partitions=num_partitions, right_schema=node_schema)
        fresh = cogroup_partition_ds(
            cands, visited, "node", "node", unseen, [], ["dist"],
            num_partitions=num_partitions,
            left_schema=node_schema).materialize()
        if fresh.count() == 0:
            break
        d = hops_done

        def stamp(b: pa.Table, _d=d) -> pa.Table:
            return pa.table({
                "node": b["node"],
                "dist": pa.array(np.full(b.num_rows, _d, np.int64))})

        visited = visited.union(
            fresh.map_batches(stamp, batch_format="pyarrow")) \
            .materialize()
        front_ds = fresh

    return visited


def path_counts_ds(edges_ds, n_seeds: int = 4, max_hops: int = 4,
                   src: str = "subj", dst: str = "obj",
                   num_partitions: int = 64,
                   driver_max_members: int = 2_000_000):
    """Shortest-path COUNTS from the seed set (the exact-integer σ
    half of Brandes betweenness): for every node within ``max_hops``
    undirected hops of the ``n_seeds`` smallest nodes, ``(node,
    dist, paths)`` where ``dist`` is the min hop count and ``paths``
    = number of distinct shortest paths from the seed set (σ_S(v) =
    Σ_{u ∈ pred(v)} σ_S(u) over dist-(d−1) predecessors; seeds count
    1 at dist 0).  Pure integer recurrence — bit-exact vs the
    unrolled-by-level SQL twin.

    Two lanes like :func:`_bfs_from`: under the driver bound each
    hop collects the frontier-ADJACENT edge pairs (Σ deg(frontier)
    rows — the ego/BFS broadcast contract) and folds counts
    vectorized on the driver; past the bound the frontier rides a
    Dataset with its count payload — per hop one cogroup expands
    (und × frontier) into (n2, c) contribution rows, a groupby sums
    σ per node, and an anti-join against visited keeps the fresh
    level."""
    import ray
    import ray.data as rd

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    seeds = _smallest_nodes(und, n_seeds)

    dist: dict[str, int] = {s: 0 for s in seeds}
    cnt: dict[str, int] = {s: 1 for s in seeds}
    frontier: set[str] = set(seeds)
    hops_done = 0
    while (hops_done < max_hops and frontier
           and len(dist) <= driver_max_members):
        fref = ray.put(pa.array(sorted(frontier), pa.string()))

        def hop_edges(b: pa.Table, _f=fref) -> pa.Table:
            mask = pc.is_in(b["n1"], value_set=ray.get(_f))
            return pa.table({"u": b["n1"].filter(mask),
                             "v": b["n2"].filter(mask)})

        us: list = []
        vs: list = []
        for part in und.map_batches(hop_edges, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            us.extend(part["u"].to_pylist())
            vs.extend(part["v"].to_pylist())
        hops_done += 1
        import pandas as pd
        df = pd.DataFrame({"v": vs,
                           "c": [cnt[u] for u in us]})
        df = df[~df["v"].isin(dist.keys())]
        acc = df.groupby("v", sort=True)["c"].sum()
        frontier = set(acc.index)
        for v, c in acc.items():
            dist[v] = hops_done
            cnt[v] = int(c)

    if hops_done == max_hops or not frontier:
        ks = sorted(dist)
        return rd.from_arrow(pa.table({
            "node": pa.array(ks, pa.string()),
            "dist": pa.array([dist[k] for k in ks], pa.int64()),
            "paths": pa.array([cnt[k] for k in ks], pa.int64())}))

    # ---- spill: frontier rides a Dataset with its count payload ----
    from ray.data.aggregate import Sum

    ks = sorted(dist)
    visited = rd.from_arrow(pa.table({
        "node": pa.array(ks, pa.string()),
        "dist": pa.array([dist[k] for k in ks], pa.int64()),
        "paths": pa.array([cnt[k] for k in ks], pa.int64())}))
    fs = sorted(frontier)
    front_ds = rd.from_arrow(pa.table({
        "node": pa.array(fs, pa.string()),
        "cnt": pa.array([cnt[k] for k in fs], pa.int64())}))
    front_schema = pa.schema([("node", pa.string()),
                              ("cnt", pa.int64())])
    sum_schema = pa.schema([("node", pa.string()), ("c", pa.int64())])

    def expand(t: pa.Table, starts, nl, nr) -> pa.Table:
        # left = und pairs (payload n2), right = frontier (one row
        # per node, payload cnt): every left n2 inherits the key's σ
        has = (nl > 0) & (nr > 0)
        ridx = (starts + nl)[has]
        c = t["cnt"].take(pa.array(ridx)).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lidx, _ = _lr_indices(starts[has], nl[has],
                              np.zeros(int(has.sum()), dtype=nl.dtype))
        return pa.table({"node": t["n2"].take(pa.array(lidx)),
                         "c": pa.array(np.repeat(c, nl[has]))})

    def unseen(t: pa.Table, starts, nl, nr) -> pa.Table:
        keep = (nl > 0) & (nr == 0)
        li = starts[keep]
        return pa.table({"node": t["__k"].take(pa.array(li)),
                         "cnt": t["c"].take(pa.array(li))})

    while hops_done < max_hops:
        hops_done += 1
        contrib = cogroup_partition_ds(
            und, front_ds, "n1", "node", expand, ["n2"], ["cnt"],
            num_partitions=num_partitions, right_schema=front_schema)
        summed = contrib.groupby("node") \
            .aggregate(Sum("c", alias_name="c"))
        fresh = cogroup_partition_ds(
            summed, visited, "node", "node", unseen, ["c"],
            ["dist", "paths"], num_partitions=num_partitions,
            left_schema=sum_schema).materialize()
        if fresh.count() == 0:
            break
        d = hops_done

        def stamp(b: pa.Table, _d=d) -> pa.Table:
            return pa.table({
                "node": b["node"],
                "dist": pa.array(np.full(b.num_rows, _d, np.int64)),
                "paths": b["cnt"]})

        visited = visited.union(
            fresh.map_batches(stamp, batch_format="pyarrow")) \
            .materialize()
        front_ds = fresh

    return visited


def diameter_est_ds(edges_ds, max_hops: int = 6, src: str = "subj",
                    dst: str = "obj", num_partitions: int = 64,
                    driver_max_members: int = 2_000_000) -> pa.Table:
    """Double-sweep diameter lower bound (the standard BFS heuristic):
    sweep 1 from the lexicographically smallest node finds the
    farthest node (max dist, ties → smallest id); sweep 2 from that
    node reports its bounded-radius eccentricity — a certified lower
    bound on the component's diameter.  One row ``(seed, far_node,
    ecc1, diameter_lb)``, all within ``max_hops``.

    Plan: two runs of the shared two-lane BFS engine
    (:func:`_bfs_from`); the farthest-node argmax folds per batch
    (each batch contributes its own (max dist, smallest node) — a
    bounded partial)."""
    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    seeds = _smallest_nodes(und, 1)
    if not seeds:
        return pa.table({
            "seed": pa.array([], pa.string()),
            "far_node": pa.array([], pa.string()),
            "ecc1": pa.array([], pa.int64()),
            "diameter_lb": pa.array([], pa.int64())})
    s0 = seeds[0]

    def far_of(lv) -> tuple[str, int]:
        best_d, best_n = -1, None
        for part in lv.iter_batches(batch_format="pyarrow"):
            d = part["dist"].to_numpy(zero_copy_only=False)
            if len(d) == 0:
                continue
            mx = int(d.max())
            nodes = part["node"].to_pylist()
            cand = min(n for n, dd in zip(nodes, d) if dd == mx)
            if mx > best_d or (mx == best_d and cand < best_n):
                best_d, best_n = mx, cand
        return best_n, best_d

    far1, ecc1 = far_of(_bfs_from(und, [s0], max_hops,
                                  num_partitions, driver_max_members))
    _, ecc2 = far_of(_bfs_from(und, [far1], max_hops,
                               num_partitions, driver_max_members))
    return pa.table({
        "seed": pa.array([s0], pa.string()),
        "far_node": pa.array([far1], pa.string()),
        "ecc1": pa.array([ecc1], pa.int64()),
        "diameter_lb": pa.array([ecc2], pa.int64())})


def betweenness_ds(edges_ds, n_seeds: int = 4, max_hops: int = 4,
                   src: str = "subj", dst: str = "obj",
                   driver_max_members: int = 2_000_000):
    """Seed-set betweenness dependencies (Brandes 2001, bounded-radius
    integer form): the forward pass is :func:`path_counts_ds`'s σ
    recurrence; the backward pass accumulates
    ``dep(v) = Σ_{w ∈ succ(v)} σ(v)·(10⁶ + dep(w)) // σ(w)`` in
    micro-units (floor per DAG edge — deterministic, no float
    division), descending one BFS level at a time.  Output
    ``(node, dist, paths, dep_units)`` for every node within
    ``max_hops`` of the ``n_seeds`` smallest seeds.

    Lane contract: the level-synchronous state (distances, σ, and the
    per-level DAG edge lists) is held on the driver under
    ``driver_max_members`` — the documented bound shared with the
    ego/BFS broadcast lanes; past it the operator raises rather than
    silently degrade (the distributed extension mirrors
    :func:`path_counts_ds`'s spill lane level-by-level and is noted
    there).  Shuffle volume per hop is one ``is_in`` semi-filter over
    the distinct-pair table; the edge multiset never moves."""
    import ray
    import ray.data as rd

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    seeds = _smallest_nodes(und, n_seeds)

    dist: dict[str, int] = {s: 0 for s in seeds}
    cnt: dict[str, int] = {s: 1 for s in seeds}
    frontier: set[str] = set(seeds)
    dag: list[tuple[list, list]] = []      # dag[h-1] = (us, vs)
    hops_done = 0
    while hops_done < max_hops and frontier:
        if len(dist) > driver_max_members:
            raise ValueError(
                "betweenness_ds: reachable set exceeds "
                f"driver_max_members={driver_max_members}; raise the "
                "bound or shrink max_hops (distributed backward pass "
                "not implemented — see path_counts_ds spill lane)")
        fref = ray.put(pa.array(sorted(frontier), pa.string()))

        def hop_edges(b: pa.Table, _f=fref) -> pa.Table:
            mask = pc.is_in(b["n1"], value_set=ray.get(_f))
            return pa.table({"u": b["n1"].filter(mask),
                             "v": b["n2"].filter(mask)})

        us: list = []
        vs: list = []
        for part in und.map_batches(hop_edges, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            us.extend(part["u"].to_pylist())
            vs.extend(part["v"].to_pylist())
        hops_done += 1
        import pandas as pd
        df = pd.DataFrame({"u": us, "v": vs})
        df = df[~df["v"].isin(dist.keys())]      # DAG edges into level h
        dag.append((df["u"].tolist(), df["v"].tolist()))
        acc = df.assign(c=[cnt[u] for u in df["u"]]) \
            .groupby("v", sort=True)["c"].sum()
        frontier = set(acc.index)
        for v, c in acc.items():
            dist[v] = hops_done
            cnt[v] = int(c)

    dep: dict[str, int] = {n: 0 for n in dist}
    for h in range(len(dag), 0, -1):
        us, vs = dag[h - 1]
        for u, v in zip(us, vs):
            if dist.get(v) == h:             # true DAG edge survived
                dep[u] += cnt[u] * (1_000_000 + dep[v]) // cnt[v]

    ks = sorted(dist)
    return rd.from_arrow(pa.table({
        "node": pa.array(ks, pa.string()),
        "dist": pa.array([dist[k] for k in ks], pa.int64()),
        "paths": pa.array([cnt[k] for k in ks], pa.int64()),
        "dep_units": pa.array([dep[k] for k in ks], pa.int64())}))


def harmonic_ds(edges_ds, n_seeds: int = 4, max_hops: int = 4,
                src: str = "subj", dst: str = "obj",
                num_partitions: int = 64,
                driver_max_members: int = 2_000_000) -> pa.Table:
    """Per-seed harmonic centrality (bounded-radius form) +
    eccentricity for the ``n_seeds`` lexicographically smallest
    nodes: one row per seed with ``n_reached`` (nodes within
    ``max_hops`` undirected hops, seed excluded), ``h_units =
    Σ_v 10⁶ // dist(seed, v)`` (the harmonic sum in integer
    micro-units — exact, so the SQL twin hashes identically) and
    ``ecc = max dist`` within the radius.

    Plan: one single-source run of the shared two-lane BFS engine
    (:func:`_bfs_from` — broadcast ``is_in`` hops under the driver
    bound, keyed-cogroup + anti-join spill beyond it) per seed; the
    distance table aggregate per seed is a bounded per-batch fold.
    Cost = ``n_seeds`` BFS sweeps — n_seeds is a small constant, and
    each sweep's shuffle volume is frontier-proportional, never the
    edge multiset."""
    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()
    seeds = _smallest_nodes(und, n_seeds)
    rows = []
    for s in seeds:
        lv = _bfs_from(und, [s], max_hops, num_partitions,
                       driver_max_members)
        n_reached = h_units = ecc = 0
        for part in lv.iter_batches(batch_format="pyarrow"):
            d = part["dist"].to_numpy(zero_copy_only=False)
            d = d[d >= 1]
            if len(d):
                n_reached += int(len(d))
                h_units += int((1_000_000 // d).sum())
                ecc = max(ecc, int(d.max()))
        rows.append((s, n_reached, h_units, ecc))
    return pa.table({
        "seed": pa.array([r[0] for r in rows]),
        "n_reached": pa.array([r[1] for r in rows], pa.int64()),
        "h_units": pa.array([r[2] for r in rows], pa.int64()),
        "ecc": pa.array([r[3] for r in rows], pa.int64())})


def random_walks_ds(edges_ds, walks_per_node: int = 2,
                    walk_len: int = 3, src: str = "subj",
                    dst: str = "obj", num_partitions: int = 64):
    """Deterministic "random" walks — the DeepWalk/node2vec training-
    corpus generator: ``walks_per_node`` walks of ``walk_len`` steps
    from EVERY node of the undirected distinct-pair graph, as flat
    ``(start, walk, step, node)`` rows.  The step rule is a shared
    cross-engine convention, not a PRNG: from node c on walk w at step
    s the successor is the ``md5_u64(c|w|s) % deg(c)``-th neighbor in
    n2-ascending rank order — both engines compute the identical md5
    prefix (DuckDB's own vectorized kernel on the Ray side too), so
    the corpus is bit-reproducible and resume-safe.

    Scale plan: the ranked adjacency is ONE hash-partition exchange
    (rank + degree fall out of run-offset math, ``num_partitions``
    callbacks); each step is one hash cogroup of the frontier against
    the adjacency with a vectorized per-run gather — frontier volume
    is nodes × walks rows per step, never edges."""
    import ray.data as rd

    from kgforge.common.hashing import md5_u64_arr
    from kgforge.functions.joins import _part_codes

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True)

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b["n1"], num_partitions)))

    def rank_part(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("n1", "ascending"),
                                            ("n2", "ascending")])
        t = t.take(idx)
        codes = t["n1"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        starts = _run_starts(codes)
        lens = np.diff(np.concatenate([starts, [len(codes)]]))
        rk = np.arange(len(codes), dtype=np.int64) \
            - np.repeat(starts, lens)
        deg = np.repeat(lens, lens).astype(np.int64)
        return pa.table({"n1": t["n1"], "n2": t["n2"],
                         "rk": pa.array(rk), "deg": pa.array(deg)})

    adj = und.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(rank_part, batch_format="pyarrow") \
        .materialize()
    adj_schema = pa.schema([("n1", pa.string()), ("n2", pa.string()),
                            ("rk", pa.int64()), ("deg", pa.int64())])

    def seed_walks(b: pa.Table) -> pa.Table:
        m = b.filter(pc.equal(b["rk"], 0))
        n = m.num_rows
        rep = np.repeat(np.arange(n, dtype=np.int64), walks_per_node)
        w = np.tile(np.arange(walks_per_node, dtype=np.int64), n)
        node = m["n1"].take(pa.array(rep))
        return pa.table({"start": node, "w": pa.array(w),
                         "cur": node})

    frontier = adj.map_batches(seed_walks, batch_format="pyarrow") \
        .materialize()
    frontier_schema = pa.schema([("cur", pa.string()),
                                 ("start", pa.string()),
                                 ("w", pa.int64())])

    def with_step(ds, step: int):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "start": b["start"], "w": b["w"],
                "step": pa.array(np.full(b.num_rows, step, np.int64)),
                "node": b["cur"]})
        return ds.map_batches(f, batch_format="pyarrow")

    out = with_step(frontier, 0)
    for s in range(1, walk_len + 1):
        def step_fn(t, starts, nl, nr, _s=s):
            lidx, ridx = _lr_indices(starts, nl, nr)
            nkeys = len(nl)
            run_l = np.repeat(np.arange(nkeys), nl)
            has = nr[run_l] > 0           # cur with no adjacency: drop
            lidx, run_l = lidx[has], run_l[has]
            run_r = np.repeat(np.arange(nkeys), nr)
            rkv = t["rk"].take(pa.array(ridx)).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            ordered = np.lexsort((rkv, run_r))    # run-major, rk-asc
            roffs = np.concatenate([[0], np.cumsum(nr)[:-1]])
            key_s = t["__k"].take(pa.array(lidx))
            w_s = pc.cast(t["w"].take(pa.array(lidx)), pa.string())
            msg = pc.binary_join_element_wise(
                key_s, w_s, pa.scalar(str(_s)), "|")
            h = md5_u64_arr(msg)
            pick = h % nr[run_l].astype(np.uint64)
            gidx = ridx[ordered[roffs[run_l] + pick.astype(np.int64)]]
            return pa.table({
                "start": t["start"].take(pa.array(lidx)),
                "w": t["w"].take(pa.array(lidx)),
                "cur": t["n2"].take(pa.array(gidx))})

        frontier = cogroup_partition_ds(
            frontier, adj.map_batches(
                lambda b: b.select(["n1", "n2", "rk"]),
                batch_format="pyarrow"),
            "cur", "n1", step_fn, ["start", "w"], ["n2", "rk"],
            num_partitions=num_partitions,
            left_schema=frontier_schema,
            right_schema=adj_schema.remove(
                adj_schema.get_field_index("deg"))).materialize()
        out = out.union(with_step(frontier, s))

    return out


def typed_paths_ds(edges_ds, src: str = "subj", dst: str = "obj",
                   src_t: str = "subj_type", dst_t: str = "obj_type",
                   pred: str = "pred", num_partitions: int = 64):
    """Typed 2-path wedge census: for every (type_a, type_mid, type_b)
    triple, the number of ordered paths a–m–b (a ≠ b) in the
    undirected entity graph, where a node's type is its MIN observed
    endpoint type.  The KG-schema profiling report: which type
    patterns actually connect.

    Scale plan: no wedge is ever materialized — per middle node the
    census needs only its type-degree vector, so the partition kernel
    builds a (nodes × T) dense count matrix with one ``np.add.at``
    and reduces each middle-type slice with ONE matmul
    (``Mᵀ@M − diag(colsum)``); the shuffles carry (node, type)
    observations and (node, type, count) rows, both ≤ distinct-
    adjacency-sized, and every partial that reaches the driver is
    T³-bounded."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from kgforge.functions.joins import _part_codes, cogroup_partition_ds

    def obs(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b[pred], "mentions"))
        f = b.filter(keep)
        return pa.concat_tables([
            pa.table({"n": f[src], "t": f[src_t]}),
            pa.table({"n": f[dst], "t": f[dst_t]}),
        ]).group_by(["n", "t"], use_threads=False).aggregate([])

    nt = edges_ds.map_batches(obs, batch_format="pyarrow") \
        .groupby("n").aggregate(Min("t", alias_name="t")).materialize()
    nt_schema = pa.schema([("n", pa.string()), ("t", pa.string())])

    types = sorted(r["t"] for r in nt.map_batches(
        lambda b: pa.table({"t": b["t"].combine_chunks().unique()}),
        batch_format="pyarrow").groupby("t").aggregate(
        Min("t", alias_name="__m")).take_all())
    tcode = {t: i for i, t in enumerate(types)}
    T = len(types)

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True)

    def _gather_lr(t, starts, nl, nr):
        """(lidx, ridx): left rows of runs with both sides, each
        paired with its run's single right row — the _attach_right
        index math."""
        total = nl + nr
        row_key = np.repeat(np.arange(len(nl)), total)
        pos = np.arange(len(row_key))
        in_left = pos < (starts + nl)[row_key]
        mask = ((nl > 0) & (nr > 0))[row_key] & in_left
        lidx = np.flatnonzero(mask)
        return lidx, (starts + nl)[row_key][lidx]

    def attach_t2(t, starts, nl, nr):
        # left = und rows keyed by n2, right = nt: annotate each und
        # row with its neighbor's type
        lidx, ridx = _gather_lr(t, starts, nl, nr)
        return pa.table({
            "m": t["n1"].take(pa.array(lidx)),
            "t2": t["t"].take(pa.array(ridx))})

    adj_t = cogroup_partition_ds(
        und, nt, "n2", "n", attach_t2, ["n1"], ["t"],
        num_partitions=num_partitions, right_schema=nt_schema)

    def cnt(b: pa.Table) -> pa.Table:
        return b.group_by(["m", "t2"], use_threads=False).aggregate(
            [([], "count_all")]).rename_columns(["m", "t2", "c"])

    c = adj_t.map_batches(cnt, batch_format="pyarrow") \
        .groupby(["m", "t2"]).aggregate(Sum("c", alias_name="c"))

    def attach_tm(t, starts, nl, nr):
        lidx, ridx = _gather_lr(t, starts, nl, nr)
        return pa.table({
            "m": t["__k"].take(pa.array(lidx)),
            "tm": t["t"].take(pa.array(ridx)),
            "t2": t["t2"].take(pa.array(lidx)),
            "c": t["c"].take(pa.array(lidx))})

    ctm = cogroup_partition_ds(
        c, nt, "m", "n", attach_tm, ["t2", "c"], ["t"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("m", pa.string()),
                               ("t2", pa.string()),
                               ("c", pa.int64())]),
        right_schema=nt_schema)

    def census(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"tm": pa.array([], pa.int64()),
                             "ta": pa.array([], pa.int64()),
                             "tb": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("m", "ascending"),
                                            ("t2", "ascending")])
        t = t.take(idx)
        codes = t["m"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        starts = _run_starts(codes)
        run_id = np.cumsum(
            np.isin(np.arange(len(codes)), starts)) - 1
        R = len(starts)
        M = np.zeros((R, T), dtype=np.int64)
        t2c = np.array([tcode[x] for x in t["t2"].to_pylist()],
                       dtype=np.int64)
        cv = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        np.add.at(M, (run_id, t2c), cv)
        tmc = np.array([tcode[x] for x in
                        t["tm"].take(pa.array(starts)).to_pylist()],
                       dtype=np.int64)
        out_tm, out_ta, out_tb, out_n = [], [], [], []
        for ti in range(T):
            rows = M[tmc == ti]
            if not len(rows):
                continue
            acc = rows.T @ rows
            acc[np.diag_indices(T)] -= rows.sum(axis=0)
            nz = np.nonzero(acc)
            out_tm.append(np.full(len(nz[0]), ti, np.int64))
            out_ta.append(nz[0].astype(np.int64))
            out_tb.append(nz[1].astype(np.int64))
            out_n.append(acc[nz])
        if not out_tm:
            return pa.table({"tm": pa.array([], pa.int64()),
                             "ta": pa.array([], pa.int64()),
                             "tb": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "tm": pa.array(np.concatenate(out_tm)),
            "ta": pa.array(np.concatenate(out_ta)),
            "tb": pa.array(np.concatenate(out_tb)),
            "n": pa.array(np.concatenate(out_n).astype(np.int64))})

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b["m"], num_partitions)))

    partial = ctm.map_batches(tag, batch_format="pyarrow") \
        .groupby("__p").map_groups(
            lambda t: census(t.drop_columns(["__p"])),
            batch_format="pyarrow") \
        .groupby(["tm", "ta", "tb"]).aggregate(
            Sum("n", alias_name="n_paths")).to_pandas()

    return rd.from_arrow(pa.table({
        "type_a": pa.array([types[i] for i in partial["ta"]],
                           pa.string()),
        "type_mid": pa.array([types[i] for i in partial["tm"]],
                             pa.string()),
        "type_b": pa.array([types[i] for i in partial["tb"]],
                           pa.string()),
        "n_paths": pa.array(partial["n_paths"].astype(np.int64))}))


def compose_edges_ds(edges_ds, pred_a: str, pred_b: str,
                     out_pred: str, src: str = "subj",
                     dst: str = "obj", pred: str = "pred",
                     num_partitions: int = 64):
    """Horn-rule edge composition (KG inference):
    ``pred_a(x, y) ∧ pred_b(y, z) → out_pred(x, z)``, distinct.  The
    canonical enrichment step after extraction — e.g. works_at ∘
    located_in → based_in.

    Scale plan: both sides are pred-filtered BEFORE the exchange, meet
    in ONE hash cogroup on the shared middle node, and the per-key
    cross product is a vectorized repeat/tile expansion over run
    offsets (fanout = deg_a(y) × deg_b(y) per middle node — the
    wedge-enumeration hub contract applies: cap or pre-aggregate hub
    middles upstream).  The distinct is one pair-keyed groupby of the
    inferred pairs, never the inputs."""
    from ray.data.aggregate import Count

    def side(p: str, keep_src: bool, vcol: str):
        def f(b: pa.Table) -> pa.Table:
            m = pc.equal(b[pred], p)
            return pa.table({
                "k": (b[dst] if keep_src else b[src]).filter(m),
                vcol: (b[src] if keep_src else b[dst]).filter(m)})
        return edges_ds.map_batches(f, batch_format="pyarrow")

    left = side(pred_a, True, "xa")    # keyed by y, value x
    right = side(pred_b, False, "zb")  # keyed by y, value z

    def cross(t, starts, nl, nr):
        both = (nl > 0) & (nr > 0)
        if not both.any():
            return pa.table({src: pa.array([], pa.string()),
                             dst: pa.array([], pa.string())})
        ks, kl, kr = starts[both], nl[both], nr[both]
        pairs = kl * kr
        tot = int(pairs.sum())
        base = np.concatenate([[0], np.cumsum(pairs)[:-1]])
        within = np.arange(tot, dtype=np.int64) - np.repeat(base, pairs)
        li = np.repeat(ks, pairs) + within // np.repeat(kr, pairs)
        ri = np.repeat(ks + kl, pairs) + within % np.repeat(kr, pairs)
        return pa.table({src: t["xa"].take(pa.array(li)),
                         dst: t["zb"].take(pa.array(ri))})

    from kgforge.functions.joins import cogroup_partition_ds

    pairs = cogroup_partition_ds(
        left, right, "k", "k", cross, ["xa"], ["zb"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("k", pa.string()),
                               ("xa", pa.string())]),
        right_schema=pa.schema([("k", pa.string()),
                                ("zb", pa.string())]))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            src: b[src], pred: pa.array([out_pred] * b.num_rows,
                                        pa.string()), dst: b[dst]})

    return pairs.groupby([src, dst]) \
        .aggregate(Count(alias_name="__c")) \
        .map_batches(finish, batch_format="pyarrow")


def bowtie_ds(edges_ds, max_hops: int = 6, src: str = "subj",
              dst: str = "obj", num_partitions: int = 64,
              driver_max_members: int = 2_000_000):
    """Hop-bounded bow-tie census of the DIRECTED entity graph (Broder
    et al. 2000, "Graph structure in the Web"): from the
    lexicographically smallest node, nodes reachable forward AND
    backward within ``max_hops`` are the seed's (bounded) SCC,
    forward-only = OUT, backward-only = IN, neither = OTHER.  Output:
    one ``(cls, n_nodes)`` row per non-empty class.

    Scale shape: two :func:`_bfs_from` walks (the shared two-lane
    broadcast/spill BFS engine) over the directed distinct-pair table
    and its swap; classification is a flag-union groupby — (node,
    in_fwd, in_bwd) rows, never adjacency — followed by a 4-row class
    count.  The edge table never moves; the walks shuffle frontier
    rows only when the visited set spills past the driver bound."""
    from ray.data.aggregate import Sum

    fwd = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=False).materialize()

    def swap(b: pa.Table) -> pa.Table:
        return pa.table({"n1": b["n2"], "n2": b["n1"]})

    bwd = fwd.map_batches(swap, batch_format="pyarrow").materialize()

    # seed = smallest node over BOTH endpoint columns (directed pairs
    # don't surface sink-only nodes in n1)
    def seed_partial(b: pa.Table) -> pa.Table:
        u = pa.concat_arrays([b["n1"].combine_chunks(),
                              b["n2"].combine_chunks()]).unique()
        return pa.table({"n": u.take(pc.sort_indices(u)[:1])})

    cand: list[str] = []
    for part in fwd.map_batches(seed_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        cand.extend(part["n"].to_pylist())
    if not cand:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "cls": pa.array([], pa.string()),
            "n_nodes": pa.array([], pa.int64())}))
    seed = min(cand)

    f_lv = _bfs_from(fwd, [seed], max_hops, num_partitions,
                     driver_max_members)
    b_lv = _bfs_from(bwd, [seed], max_hops, num_partitions,
                     driver_max_members)

    def tag(flag_f: int, flag_b: int):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "node": b["node"],
                "f": pa.array(np.full(n, flag_f, dtype=np.int64)),
                "b": pa.array(np.full(n, flag_b, dtype=np.int64))})
        return fn

    def base(b: pa.Table) -> pa.Table:
        u = pa.concat_arrays([b["n1"].combine_chunks(),
                              b["n2"].combine_chunks()]).unique()
        z = np.zeros(len(u), dtype=np.int64)
        return pa.table({"node": u, "f": pa.array(z), "b": pa.array(z)})

    flags = fwd.map_batches(base, batch_format="pyarrow") \
        .union(f_lv.map_batches(tag(1, 0), batch_format="pyarrow")) \
        .union(b_lv.map_batches(tag(0, 1), batch_format="pyarrow")) \
        .groupby("node").aggregate(Sum("f", alias_name="f"),
                                   Sum("b", alias_name="b"))

    def classify(b: pa.Table) -> pa.Table:
        f = b["f"].combine_chunks().to_numpy(zero_copy_only=False) > 0
        bb = b["b"].combine_chunks().to_numpy(zero_copy_only=False) > 0
        cls = np.where(f & bb, "scc",
                       np.where(f, "out", np.where(bb, "in", "other")))
        return pa.table({"cls": pa.array(cls.tolist(), pa.string()),
                         "one": pa.array(np.ones(b.num_rows, np.int64))})

    return flags.map_batches(classify, batch_format="pyarrow") \
        .groupby("cls").aggregate(Sum("one", alias_name="n_nodes"))


def hub_knockout_ds(edges_ds, k: int = 5, src: str = "subj",
                    dst: str = "obj"):
    """Attack-tolerance census (Albert, Jeong & Barabási 2000, "Error
    and attack tolerance of complex networks"): remove the ``k``
    highest-degree hubs (degree desc, node asc tiebreak) and report
    the component structure before and after — one row per phase:
    ``(phase, n_nodes, n_pairs, n_components, largest)`` where
    ``n_nodes`` counts nodes with ≥1 surviving edge and ``n_pairs``
    the distinct undirected pairs.

    Scale shape: hub selection is a per-batch partial top-k over the
    degree table folded on the driver (k rows broadcast); the
    knockout is a pure ``is_in`` filter map; each phase's census rides
    :func:`components_ds` (auto driver-union-find / distributed
    min-label propagation) plus component-keyed aggregates — no step
    materializes the graph on the driver beyond the measured
    components bound."""
    import ray
    from ray.data.aggregate import Count, Max

    deg = degree_ds(edges_ds, src=src, dst=dst)

    def topk_partial(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[("degree", "descending"),
                                            ("node", "ascending")])
        return b.take(idx[:k]).select(["node", "degree"])

    cand = []
    for part in deg.map_batches(topk_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        cand.extend(zip(part["node"].to_pylist(),
                        part["degree"].to_pylist()))
    cand.sort(key=lambda r: (-r[1], r[0]))
    hubs = pa.array([n for n, _ in cand[:k]], pa.string())

    def knockout(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.invert(pc.is_in(b[src], value_set=hubs)),
            pc.invert(pc.is_in(b[dst], value_set=hubs)))
        return b.filter(keep)

    def census(phase: str, e_ds) -> dict:
        und = _distinct_pairs_ds(e_ds, src, dst, "n1", "n2",
                                 both_directions=True).materialize()
        n_pairs = und.map_batches(
            lambda b: b.filter(pc.less(b["n1"], b["n2"])),
            batch_format="pyarrow").count()
        comp = components_ds(e_ds, src=src, dst=dst)
        szs = comp.groupby("component").aggregate(
            Count(alias_name="size")).materialize()
        n_comp = szs.count()
        if n_comp:
            largest = szs.aggregate(Max("size"))["max(size)"]
            n_nodes = comp.count()
        else:
            largest, n_nodes = 0, 0
        return {"phase": phase, "n_nodes": int(n_nodes),
                "n_pairs": int(n_pairs),
                "n_components": int(n_comp),
                "largest": int(largest)}

    post_edges = edges_ds.map_batches(
        knockout, batch_format="pyarrow").materialize()
    rows = [census("pre", edges_ds), census("post", post_edges)]
    return pa.table({
        "phase": pa.array([r["phase"] for r in rows], pa.string()),
        "n_nodes": pa.array([r["n_nodes"] for r in rows], pa.int64()),
        "n_pairs": pa.array([r["n_pairs"] for r in rows], pa.int64()),
        "n_components": pa.array([r["n_components"] for r in rows],
                                 pa.int64()),
        "largest": pa.array([r["largest"] for r in rows], pa.int64())})


def densification_ds(triples_ds, n_docs: int, doc_col: str = "doc_id",
                     src: str = "subj", dst: str = "obj",
                     doc_num_start: int = 5) -> pa.Table:
    """Densification-law census (Leskovec, Kleinberg & Faloutsos 2005,
    "Graphs over time"): bucket the corpus into 10 arrival deciles by
    document number and report, per decile, the NEW and CUMULATIVE
    distinct edges and nodes — each edge/node stamped with its first
    arrival (min doc number over its occurrences).  Super-linear
    cum_edges vs cum_nodes growth is the densification signature.

    Scale shape: one (subj, obj)-keyed min-groupby stamps edge
    arrivals, one node-keyed min-groupby folds both endpoint roles;
    only decile histograms (10 cells each) reach the driver."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def proj(b: pa.Table) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(b[doc_col],
                                              doc_num_start, 50),
                      pa.int64())
        return pa.table({"s": b[src], "d": b[dst], "num": num})

    e_first = triples_ds.map_batches(proj, batch_format="pyarrow") \
        .groupby(["s", "d"]).aggregate(Min("num", alias_name="num"))

    def both_ends(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                b["s"].combine_chunks().cast(pa.string()),
                b["d"].combine_chunks().cast(pa.string())]),
            "num": pa.concat_arrays([b["num"].combine_chunks()] * 2)})

    n_first = e_first.map_batches(both_ends, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("num", alias_name="num"))

    def decile_hist(col: str):
        def fn(b: pa.Table) -> pa.Table:
            num = b["num"].combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            dec = np.minimum(num * 10 // max(n_docs, 1), 9)
            h = np.bincount(dec, minlength=10).astype(np.int64)
            return pa.table({"decile": pa.array(np.arange(10,
                                                          dtype=np.int64)),
                             col: pa.array(h)})
        return fn

    from ray.data.aggregate import Sum

    eh = e_first.map_batches(decile_hist("e"), batch_format="pyarrow") \
        .groupby("decile").aggregate(Sum("e", alias_name="e")) \
        .to_pandas().set_index("decile")["e"]
    nh = n_first.map_batches(decile_hist("n"), batch_format="pyarrow") \
        .groupby("decile").aggregate(Sum("n", alias_name="n")) \
        .to_pandas().set_index("decile")["n"]
    e_new = np.array([int(eh.get(d, 0)) for d in range(10)], np.int64)
    n_new = np.array([int(nh.get(d, 0)) for d in range(10)], np.int64)
    return pa.table({
        "decile": pa.array(np.arange(10, dtype=np.int64)),
        "new_edges": pa.array(e_new),
        "cum_edges": pa.array(np.cumsum(e_new).astype(np.int64)),
        "new_nodes": pa.array(n_new),
        "cum_nodes": pa.array(np.cumsum(n_new).astype(np.int64))})


def triad_census_ds(edges_ds, src: str = "subj", dst: str = "obj",
                    num_partitions: int = 64) -> pa.Table:
    """Directed closed-triad census (the two triangle motifs of Milo
    et al. 2002, "Network motifs"): count of feed-forward closures
    (2-paths a→b→c closed by a→c; each FFL instance has exactly one
    middle, so counted once) and of directed 3-cycles (2-paths closed
    by c→a; each cycle surfaces at all three rotations → ÷3).

    Scale shape: directed wedges ride ONE center-keyed cogroup
    cartesian (`shuffle_join_ds` — flat index math, no per-key
    Python), combine to (a, c, w) multiplicity rows, then each closure
    check is one hash-cogroup semi-join against the directed pair
    table summing w per partition — only per-partition scalar partials
    reach the driver."""
    from kgforge.functions.joins import (cogroup_partition_ds,
                                         shuffle_join_ds)

    dprs = _distinct_pairs_ds(edges_ds, src, dst, "s", "d",
                              both_directions=False).materialize()

    def ins(b: pa.Table) -> pa.Table:
        return pa.table({"ctr": b["d"], "a": b["s"]})

    def outs(b: pa.Table) -> pa.Table:
        return pa.table({"ctr": b["s"], "c": b["d"]})

    in_ds = dprs.map_batches(ins, batch_format="pyarrow")
    out_ds = dprs.map_batches(outs, batch_format="pyarrow")
    wedges = shuffle_join_ds(in_ds, out_ds, "ctr", "ctr",
                             ["a"], ["c"], how="inner",
                             num_partitions=num_partitions)

    from ray.data.aggregate import Sum

    def combine(b: pa.Table) -> pa.Table:
        b = b.filter(pc.invert(pc.equal(b["a"], b["c"])))
        g = b.select(["a", "c"]).group_by(
            ["a", "c"], use_threads=False).aggregate([([], "count_all")])
        return pa.table({"a": g["a"], "c": g["c"],
                         "w": pc.cast(g["count_all"], pa.int64())})

    wcnt = wedges.map_batches(combine, batch_format="pyarrow") \
        .groupby(["a", "c"]).aggregate(Sum("w", alias_name="w")) \
        .materialize()

    node_t = dprs.schema().base_schema.field("s").type

    def closure_count(key_left: str, other_left: str):
        """Σ w over wedges whose (key_left→other_left) closing edge
        exists — cogrouped on ``key_left`` = edge source."""
        def fn(t: pa.Table, starts, nl, nr) -> pa.Table:
            li, ri = _lr_indices(starts, nl, nr)
            left = pa.table({"k": t["__k"].take(pa.array(li)),
                             "o": t[other_left].take(pa.array(li)),
                             "w": t["w"].take(pa.array(li))})
            right = pa.table({"k": t["__k"].take(pa.array(ri)),
                              "o": t["d"].take(pa.array(ri))})
            hit = left.join(right, keys=["k", "o"],
                            join_type="left semi")
            tot = int(pc.sum(hit["w"]).as_py() or 0) if hit.num_rows \
                else 0
            return pa.table({"cnt": pa.array([tot], pa.int64())})

        parts = cogroup_partition_ds(
            wcnt, dprs, key_left, "s", fn, [other_left, "w"], ["d"],
            num_partitions=num_partitions,
            left_schema=pa.schema([(key_left, node_t),
                                   (other_left, node_t),
                                   ("w", pa.int64())]),
            right_schema=pa.schema([("s", node_t), ("d", node_t)]))
        return int(parts.sum("cnt") or 0)

    ffl = closure_count("a", "c")       # closing edge a→c
    cyc = closure_count("c", "a")       # closing edge c→a (÷3 below)
    return pa.table({
        "motif": pa.array(["cycle", "ffl"], pa.string()),
        "n": pa.array([cyc // 3, ffl], pa.int64())})


def linkpred_auc_ds(edges_ds, src: str = "subj", dst: str = "obj",
                    holdout_mod: int = 5,
                    num_partitions: int = 64) -> pa.Table:
    """Held-out AUC of common-neighbor link prediction — the
    evaluation row for the linkpred family (CN/RA/AA/Jaccard all rank
    by neighborhood overlap; CN is the shared backbone).  Protocol:
    canonical undirected pairs whose md5 high-32 bits satisfy
    ``h % holdout_mod == 0`` are HELD OUT (test positives, the same
    first-8-hex-chars grid as the ``hash_split`` lane); the remaining
    pairs form the training graph; candidates are every non-adjacent
    distance-2 pair of the training graph scored by common-neighbor
    count.  Positives missing from the candidate set score 0 (no
    surviving path — counted in ``n_pos_zero``); negatives are the
    non-test candidates.  AUC is the exact Mann–Whitney fold over the
    two SCORE HISTOGRAMS: ``u2 = Σ_s pos(s)·(2·cum_neg(<s) + neg(s))``
    and ``auc_micro = u2·10⁶ // (2·n_pos·n_neg)`` — all integers, so
    the SQL twin agrees bit-for-bit.

    Scale shape: the split is a pure streaming filter (no shuffle);
    scoring reuses :func:`_cn_nonadj_ds` (hash-partitioned wedges,
    per-block combiners, one cogroup); labeling is ONE pair-keyed
    cogroup of candidates against the held-out edge set (membership,
    not re-hash — a hash-matching non-edge is not a positive) that
    also surfaces zero-score positives as right-only runs; after it
    only (score, n_pos, n_neg) HISTOGRAM rows move —
    score-domain-bounded — and the AUC folds on the driver with
    Python-int exactness."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import hash_u64_np

    und = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=True).materialize()

    def is_test(lo, hi) -> np.ndarray:
        key = pc.binary_join_element_wise(lo, hi, "\x1f")
        h = hash_u64_np(key.combine_chunks()
                        if isinstance(key, pa.ChunkedArray) else key)
        return (h >> np.uint64(32)) \
            % np.uint64(holdout_mod) == np.uint64(0)

    def train_filter(b: pa.Table) -> pa.Table:
        n1 = b["n1"].combine_chunks()
        n2 = b["n2"].combine_chunks()
        lo = pc.min_element_wise(n1, n2)
        hi = pc.max_element_wise(n1, n2)
        keep = pa.array(~is_test(lo, hi))
        return pa.table({"n1": n1.filter(keep),
                         "n2": n2.filter(keep)})

    train = und.map_batches(train_filter, batch_format="pyarrow") \
        .materialize()

    def test_keys(b: pa.Table) -> pa.Table:
        n1 = b["n1"].combine_chunks()
        n2 = b["n2"].combine_chunks()
        lt = pc.less(n1, n2)
        lo, hi = n1.filter(lt), n2.filter(lt)
        if not len(lo):
            return pa.table({"k": pa.array([], pa.string())})
        m = pa.array(is_test(lo, hi))
        return pa.table({"k": pc.binary_join_element_wise(
            lo.filter(m), hi.filter(m), "\x1f")})

    tp = und.map_batches(test_keys, batch_format="pyarrow")

    def cand_key(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.binary_join_element_wise(
                b["a"].combine_chunks(), b["b"].combine_chunks(),
                "\x1f"),
            "cn": b["cn"]})

    cand = _cn_nonadj_ds(train, num_partitions) \
        .map_batches(cand_key, batch_format="pyarrow")

    empty = pa.table({"s": pa.array([], pa.int64()),
                      "pos_n": pa.array([], pa.int64()),
                      "neg_n": pa.array([], pa.int64())})

    def fuse(t: pa.Table, starts, nl, nr) -> pa.Table:
        # candidates are distinct pairs (nl ≤ 1); a test-pair run with
        # no candidate is a zero-score positive (no surviving path)
        has_c = nl > 0
        is_pos = nr > 0
        s = np.zeros(len(starts), dtype=np.int64)
        if has_c.any():
            s[has_c] = t["cn"].take(pa.array(starts[has_c])) \
                .combine_chunks().to_numpy(zero_copy_only=False)
        keep = has_c | is_pos
        if not keep.any():
            return empty
        code = s[keep] * 2 + is_pos[keep].astype(np.int64)
        uniq, counts = np.unique(code, return_counts=True)
        return pa.table({
            "s": pa.array(uniq // 2),
            "pos_n": pa.array(np.where(uniq % 2 == 1, counts, 0)
                              .astype(np.int64)),
            "neg_n": pa.array(np.where(uniq % 2 == 0, counts, 0)
                              .astype(np.int64))})

    from kgforge.functions.joins import cogroup_partition_ds

    hist = cogroup_partition_ds(
        cand, tp, "k", "k", fuse, ["cn"], [],
        num_partitions=num_partitions,
        left_schema=pa.schema([("k", pa.string()),
                               ("cn", pa.int64())]),
        right_schema=pa.schema([("k", pa.string())])) \
        .groupby("s").aggregate(
            Sum("pos_n", alias_name="pos_n"),
            Sum("neg_n", alias_name="neg_n")).to_pandas() \
        .sort_values("s").reset_index(drop=True)

    s_vals = [int(x) for x in hist["s"]]
    pos = [int(x) for x in hist["pos_n"]]
    neg = [int(x) for x in hist["neg_n"]]
    n_pos_zero = sum(p for s, p in zip(s_vals, pos) if s == 0)
    n_pos, n_neg = sum(pos), sum(neg)
    u2, cumn = 0, 0
    for p, nn in zip(pos, neg):
        u2 += p * (2 * cumn + nn)
        cumn += nn
    auc = u2 * 1_000_000 // (2 * n_pos * n_neg) \
        if n_pos and n_neg else 0
    return pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "n_pos_zero": pa.array([n_pos_zero], pa.int64()),
        "u2": pa.array([u2], pa.int64()),
        "auc_micro": pa.array([auc], pa.int64())})


def widest_paths_ds(pairs_ds, n_seeds: int = 4, max_hops: int = 4,
                    a_col: str = "a", b_col: str = "b",
                    w_col: str = "n_sents",
                    driver_max_nodes: int = 2_000_000):
    """Widest-path (max-bottleneck) widths from a deterministic seed
    set over a WEIGHTED undirected pair table: ``width(v)`` = the
    maximum over ≤ ``max_hops``-hop paths from any seed of the
    minimum edge weight along the path — the capacity/bandwidth
    question PageRank-style diffusion can't answer.  Seeds are the
    ``n_seeds`` lexicographically smallest nodes (shared with the SQL
    twin); output is (node, width) for reachable non-seed nodes,
    node ASC.  Exact int64 throughout (seed sentinel 2⁴⁰ sits above
    any co-occurrence count and never leaks: every non-seed width is
    min-ed with a real edge weight).

    Scale shape: the broadcast lane of :func:`bfs_levels_ds` — each
    hop ``ray.put``\\ s the (node, width) frontier snapshot once and
    streams ONE ``pc.index_in`` pass over the symmetrized edge table
    (per-batch (neighbor, min(width, w)) partials group-maxed before
    they reach the driver), so the edge table never shuffles.  The
    node census is vocabulary-bounded (distinct entity surfaces);
    past ``driver_max_nodes`` the same relax runs as a hash-cogroup
    frontier Dataset exactly like :func:`_bfs_from`'s spill lane —
    this entry implements the broadcast lane and raises on the bound
    so the caller picks the lane explicitly."""
    import ray
    import ray.data as rd

    INF = 1 << 40

    def sym(b: pa.Table) -> pa.Table:
        w = pc.cast(b[w_col], pa.int64())
        return pa.table({
            "n1": pa.concat_arrays([b[a_col].combine_chunks(),
                                    b[b_col].combine_chunks()]),
            "n2": pa.concat_arrays([b[b_col].combine_chunks(),
                                    b[a_col].combine_chunks()]),
            "w": pa.concat_arrays([w.combine_chunks()] * 2)})

    und = pairs_ds.map_batches(sym, batch_format="pyarrow") \
        .materialize()
    seeds = _smallest_nodes(und, n_seeds)
    width: dict = {s: INF for s in seeds}

    for _ in range(max_hops):
        if len(width) > driver_max_nodes:
            raise ValueError(
                f"widest_paths_ds broadcast lane: {len(width)} nodes "
                f"exceed driver_max_nodes={driver_max_nodes}; run the "
                "frontier-Dataset lane (see _bfs_from spill)")
        keys = sorted(width)
        karr = pa.array(keys, pa.string())
        wnp = np.array([width[k] for k in keys], dtype=np.int64)
        ref = ray.put((karr, wnp))

        def hop(b: pa.Table, _r=ref) -> pa.Table:
            ka, wv = ray.get(_r)
            idx = pc.index_in(b["n1"], value_set=ka)
            m = pc.is_valid(idx)
            sub = b.filter(m)
            if sub.num_rows == 0:
                return pa.table({"node": pa.array([], pa.string()),
                                 "cand": pa.array([], pa.int64())})
            ii = pc.index_in(sub["n1"], value_set=ka) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            cand = np.minimum(
                wv[ii],
                sub["w"].combine_chunks()
                .to_numpy(zero_copy_only=False))
            g = pa.table({"node": sub["n2"],
                          "cand": pa.array(cand, pa.int64())}) \
                .group_by(["node"], use_threads=False) \
                .aggregate([("cand", "max")])
            return pa.table({"node": g["node"], "cand": g["cand_max"]})

        changed = False
        for part in und.map_batches(hop, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            for node, cand in zip(part["node"].to_pylist(),
                                  part["cand"].to_pylist()):
                if cand > width.get(node, 0):
                    width[node] = cand
                    changed = True
        if not changed:
            break

    out = sorted(n for n in width if n not in set(seeds))
    return rd.from_arrow(pa.table({
        "node": pa.array(out, pa.string()),
        "width": pa.array([width[n] for n in out], pa.int64())}))


def mutual_reach_ds(edges_ds, n_seeds: int = 4, max_hops: int = 4,
                    src: str = "subj", dst: str = "obj",
                    driver_max_members: int = 2_000_000):
    """Bounded-hop strongly-connected-membership probe over the
    DIRECTED graph: for each of the ``n_seeds`` lexicographically
    smallest nodes, every other node v with seed→v AND v→seed within
    ``max_hops`` directed hops — i.e. the members of the seed's SCC
    that a bounded forward+backward BFS can certify (the FW-BW pivot
    step of distributed SCC).  Output (seed, node), seed/node ASC.

    Scale shape: the broadcast frontier lane of :func:`_bfs_from`,
    but ONE streaming pass per hop expands ALL 2·n_seeds frontiers
    (forward along src→dst, backward along dst→src) — per batch the
    seed loop is ``n_seeds``-bounded vectorized ``pc.is_in`` masks,
    so the directed distinct-pair table is scanned ``max_hops``
    times total, never shuffled.  Past ``driver_max_members``
    visited nodes per seed the frontier moves to the
    :func:`_bfs_from` spill lane (hash-cogroup expansion)."""
    import ray

    prs = _distinct_pairs_ds(edges_ds, src, dst, "n1", "n2",
                             both_directions=False).materialize()

    def node_partial(b: pa.Table) -> pa.Table:
        u = pa.concat_arrays([b["n1"].combine_chunks(),
                              b["n2"].combine_chunks()]).unique()
        idx = pc.sort_indices(u)[:n_seeds]
        return pa.table({"n": u.take(idx)})

    cand: list[str] = []
    for part in prs.map_batches(node_partial,
                                batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        cand.extend(part["n"].to_pylist())
    seeds = sorted(set(cand))[:n_seeds]

    fwd = [{s} for s in seeds]       # visited, forward
    bwd = [{s} for s in seeds]
    ffr = [{s} for s in seeds]       # frontiers
    bfr = [{s} for s in seeds]

    for _ in range(max_hops):
        if not any(ffr) and not any(bfr):
            break
        for vis in (*fwd, *bwd):
            if len(vis) > driver_max_members:
                raise ValueError(
                    "mutual_reach_ds broadcast lane exceeded "
                    f"driver_max_members={driver_max_members}; use "
                    "the _bfs_from spill lane")
        fref = ray.put([pa.array(sorted(f), pa.string())
                        for f in ffr])
        bref = ray.put([pa.array(sorted(f), pa.string())
                        for f in bfr])

        def hop(b: pa.Table, _f=fref, _b=bref) -> pa.Table:
            fa, ba = ray.get(_f), ray.get(_b)
            sides, sids, nodes = [], [], []
            for i in range(len(fa)):
                if len(fa[i]):
                    m = pc.is_in(b["n1"], value_set=fa[i])
                    nb = b["n2"].filter(m).combine_chunks().unique()
                    sides.append(np.zeros(len(nb), np.int8))
                    sids.append(np.full(len(nb), i, np.int32))
                    nodes.append(nb)
                if len(ba[i]):
                    m = pc.is_in(b["n2"], value_set=ba[i])
                    nb = b["n1"].filter(m).combine_chunks().unique()
                    sides.append(np.ones(len(nb), np.int8))
                    sids.append(np.full(len(nb), i, np.int32))
                    nodes.append(nb)
            if not nodes:
                return pa.table({
                    "side": pa.array([], pa.int8()),
                    "seed_i": pa.array([], pa.int32()),
                    "node": pa.array([], pa.string())})
            return pa.table({
                "side": pa.array(np.concatenate(sides)),
                "seed_i": pa.array(np.concatenate(sids)),
                "node": pa.concat_arrays(nodes)})

        nxt_f = [set() for _ in seeds]
        nxt_b = [set() for _ in seeds]
        for part in prs.map_batches(hop, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            sd = part["side"].to_numpy(zero_copy_only=False)
            si = part["seed_i"].to_numpy(zero_copy_only=False)
            nd = part["node"].to_pylist()
            for s_, i_, n_ in zip(sd, si, nd):
                (nxt_f if s_ == 0 else nxt_b)[i_].add(n_)
        for i in range(len(seeds)):
            ffr[i] = nxt_f[i] - fwd[i]
            bfr[i] = nxt_b[i] - bwd[i]
            fwd[i] |= ffr[i]
            bwd[i] |= bfr[i]

    s_out, n_out = [], []
    for i, s in enumerate(seeds):
        for n in sorted((fwd[i] & bwd[i]) - {s}):
            s_out.append(s)
            n_out.append(n)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "seed": pa.array(s_out, pa.string()),
        "node": pa.array(n_out, pa.string())}))
