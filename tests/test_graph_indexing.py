"""Graph analytics (kgforge/functions/graph.py) and tokenized-corpus
operators (kgforge/functions/indexing.py) against brute-force oracles
on small synthetic inputs."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "subj": [a for a, b in pairs],
        "obj": [b for a, b in pairs],
    }))


def _rand_digraph(rng, n_nodes=18, n_edges=60):
    names = [f"N{i:02d}" for i in range(n_nodes)]
    pairs = [(names[rng.integers(n_nodes)], names[rng.integers(n_nodes)])
             for _ in range(n_edges)]
    return names, pairs


class TestGraph:
    def test_degree_matches_bruteforce(self, ray_session):
        from kgforge.functions.graph import degree_ds

        rng = np.random.default_rng(7)
        _, pairs = _rand_digraph(rng)
        out = {r["node"]: r for r in
               degree_ds(_edges_ds(pairs)).take_all()}
        succ, pred = {}, {}
        for a, b in pairs:
            if a != b:
                succ.setdefault(a, set()).add(b)
                pred.setdefault(b, set()).add(a)
        for node in set(succ) | set(pred):
            nbrs = succ.get(node, set()) | pred.get(node, set())
            assert out[node]["out_deg"] == len(succ.get(node, set()))
            assert out[node]["in_deg"] == len(pred.get(node, set()))
            assert out[node]["degree"] == len(nbrs)
        assert set(out) == set(succ) | set(pred)

    def test_pagerank_matches_local_integer_iteration(self, ray_session):
        from kgforge.functions.graph import (PR_BASE, PR_DEN, PR_NUM,
                                             PR_R0, pagerank_ds)

        rng = np.random.default_rng(11)
        _, pairs = _rand_digraph(rng)
        dpairs = sorted(set(pairs))
        nodes = sorted({a for a, _ in dpairs} | {b for _, b in dpairs})
        od = {n: 0 for n in nodes}
        for a, _ in dpairs:
            od[a] += 1
        rank = {n: PR_R0 for n in nodes}
        for _ in range(3):
            acc = {n: 0 for n in nodes}
            for a, b in dpairs:
                acc[b] += rank[a] // od[a]
            rank = {n: PR_BASE + (PR_NUM * acc[n]) // PR_DEN
                    for n in nodes}
        out = {r["node"]: r["rank"] for r in
               pagerank_ds(_edges_ds(pairs), iters=3,
                           num_partitions=8).take_all()}
        assert out == rank
        # per-iteration checkpointing path lands on identical ranks
        mat = {r["node"]: r["rank"] for r in
               pagerank_ds(_edges_ds(pairs), iters=3, num_partitions=8,
                           materialize_each=True).take_all()}
        assert mat == rank

    def test_two_hop_matches_bruteforce(self, ray_session):
        from kgforge.functions.graph import two_hop_count_ds

        rng = np.random.default_rng(3)
        _, pairs = _rand_digraph(rng, n_nodes=14, n_edges=40)
        adj = {}
        for a, b in pairs:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        expect = {}
        for v in adj:
            two = set(itertools.chain.from_iterable(
                adj[u] for u in adj[v])) - adj[v] - {v}
            if two:
                expect[v] = len(two)
        out = {r["node"]: r["n_two_hop"] for r in
               two_hop_count_ds(_edges_ds(pairs),
                                num_partitions=8).take_all()}
        assert out == expect

    def test_components_match_bruteforce(self, ray_session):
        from kgforge.functions.graph import components_ds

        rng = np.random.default_rng(13)
        # sparse graph → several components
        _, pairs = _rand_digraph(rng, n_nodes=30, n_edges=20)
        adj = {}
        for a, b in pairs:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        expect = {}
        for start in adj:
            seen, stack = {start}, [start]
            while stack:
                for nb in adj[stack.pop()]:
                    if nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
            expect[start] = min(seen)
        # both paths (driver union-find / distributed propagation)
        # must agree with the brute force and each other
        drv = {r["node"]: r["component"] for r in
               components_ds(_edges_ds(pairs)).take_all()}
        prop = {r["node"]: r["component"] for r in
                components_ds(_edges_ds(pairs),
                              driver_max_pairs=0).take_all()}
        assert drv == expect
        assert prop == expect
        assert len(set(expect.values())) > 1

    def test_triangle_count_matches_bruteforce(self, ray_session):
        from kgforge.functions.graph import triangle_count_ds

        rng = np.random.default_rng(5)
        _, pairs = _rand_digraph(rng, n_nodes=12, n_edges=50)
        und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        nodes = sorted({x for e in und for x in e})
        n_tri = sum(1 for a, b, c in itertools.combinations(nodes, 3)
                    if (a, b) in und and (a, c) in und and (b, c) in und)
        tbl = triangle_count_ds(_edges_ds(pairs), num_partitions=8)
        assert tbl["n_triangles"][0].as_py() == n_tri


class TestIndexing:
    DOCS = pa.table({
        "doc_id": list(range(1, 7)),
        "text": ["a b c d e f g h i", "a a b x", "", "x  y\tz a",
                 "q r s t u v w", "   "],
    })

    def _ds(self):
        import ray.data as rd

        return rd.from_arrow(self.DOCS)

    def test_chunks_reconstruct_and_overlap(self, ray_session):
        from kgforge.functions.indexing import chunk_docs_ds

        rows = chunk_docs_ds(self._ds(), chunk=4, stride=3).take_all()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # empty / whitespace docs produce no chunks
        assert 3 not in by_doc and 6 not in by_doc
        for did, text in zip(self.DOCS["doc_id"].to_pylist(),
                             self.DOCS["text"].to_pylist()):
            toks = text.split()
            if not toks:
                continue
            chunks = sorted(by_doc[did], key=lambda r: r["chunk_idx"])
            for i, ch in enumerate(chunks):
                assert ch["chunk_idx"] == i
                want = toks[i * 3:i * 3 + 4]
                assert ch["chunk_text"].split(" ") == want
                assert ch["n_tokens"] == len(want)
            # stride coverage: every token index appears in some chunk
            covered = set()
            for ch in chunks:
                s = ch["chunk_idx"] * 3
                covered |= set(range(s, s + ch["n_tokens"]))
            assert covered == set(range(len(toks)))

    def test_inverted_index_postings(self, ray_session):
        from kgforge.functions.indexing import inverted_index_ds

        rows = inverted_index_ds(self._ds(), min_df=2,
                                 num_partitions=8).take_all()
        got = {r["term"]: (r["df"], r["postings"]) for r in rows}
        assert got == {"a": (3, "1,2,4"), "b": (2, "1,2"),
                       "x": (2, "2,4")}

    def test_bigram_topk_counts(self, ray_session):
        from kgforge.functions.indexing import bigram_topk_ds

        rows = bigram_topk_ds(self._ds(), k=4).take_all()
        got = [(r["bigram"], r["n"]) for r in rows]
        # corpus bigrams: doc1 a b,b c,c d,d e,e f,f g,g h,h i; doc2
        # a a,a b,b x; doc4 x y,y z,z a; doc5 q r,...  "a b" ×2 tops,
        # rest ×1 tie → lexicographic
        assert got[0] == ("a b", 2)
        assert [g[1] for g in got[1:]] == [1, 1, 1]
        assert [g[0] for g in got[1:]] == sorted(g[0] for g in got[1:])

    def test_funnel_edge_cases(self, ray_session):
        """Same-timestamp step completion counts (>= semantics); a
        user doing steps out of order does NOT advance; events arrive
        shuffled across blocks."""
        import ray.data as rd

        from kgforge.functions.events import funnel_counts_ds

        us = 1_000_000
        rows = [
            # u1: strict order view<click<purchase → reaches all 3
            (1, "view", 1 * us), (1, "click", 2 * us),
            (1, "purchase", 3 * us),
            # u2: click and purchase at the SAME ts as view → >= passes
            (2, "view", 5 * us), (2, "click", 5 * us),
            (2, "purchase", 5 * us),
            # u3: purchase BEFORE first view → stops after click
            (3, "purchase", 1 * us), (3, "view", 2 * us),
            (3, "click", 3 * us),
            # u4: click only, never viewed → counts nowhere
            (4, "click", 9 * us),
            # u5: view only
            (5, "view", 7 * us),
        ]
        tbl = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] for r in rows],
                           pa.timestamp("us")),
        })
        out = {r["step"]: r["n_users"] for r in
               funnel_counts_ds(rd.from_arrow(tbl).repartition(4),
                                num_partitions=8).take_all()}
        assert out == {"view": 4, "click": 3, "purchase": 2}

    def test_tfidf_topk_ranking(self, ray_session):
        from kgforge.functions.indexing import tfidf_topk_ds

        rows = tfidf_topk_ds(self._ds(), k=2,
                             num_partitions=8).take_all()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 2: 'a' tf=2 df=3 → 2*(6/3)=4.0 ; 'b'/'x' tie at 3.0 →
        # term asc keeps 'b'
        d2 = sorted(by_doc[2], key=lambda r: -r["score"])
        assert [r["term"] for r in d2] == ["a", "b"]
        assert d2[0]["score"] == pytest.approx(4.0)
        assert d2[1]["score"] == pytest.approx(3.0)
        assert all(len(v) <= 2 for v in by_doc.values())


class TestClusteringAndRA:
    def test_clustering_coeff_small_graph(self, ray_session):
        from kgforge.functions.graph import clustering_coeff_ds

        # triangle A-B-C plus pendant C-D
        pairs = [("A", "B"), ("B", "C"), ("A", "C"), ("C", "D")]
        out = clustering_coeff_ds(_edges_ds(pairs),
                                  num_partitions=4).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        assert out.node.tolist() == ["A", "B", "C", "D"]
        assert out.degree.tolist() == [2, 2, 3, 1]
        assert out.n_tri.tolist() == [1, 1, 1, 0]
        assert out.coeff_ppm.tolist() == [1_000_000, 1_000_000,
                                          2 * 1_000_000 // 6, 0]

    def test_clustering_matches_bruteforce(self, ray_session):
        import itertools

        from kgforge.functions.graph import clustering_coeff_ds

        rng = np.random.default_rng(11)
        _, pairs = _rand_digraph(rng, n_nodes=12, n_edges=50)
        und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        adj: dict[str, set] = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        out = clustering_coeff_ds(_edges_ds(pairs),
                                  num_partitions=8).to_pandas()
        got = {r.node: (r.degree, r.n_tri, r.coeff_ppm)
               for r in out.itertuples()}
        for v, nbrs in adj.items():
            d = len(nbrs)
            tri = sum(1 for x, y in itertools.combinations(sorted(nbrs), 2)
                      if (min(x, y), max(x, y)) in und)
            ppm = 2 * tri * 1_000_000 // (d * (d - 1)) if d >= 2 else 0
            assert got[v] == (d, tri, ppm), v

    def test_ra_link_pred_small_graph(self, ray_session):
        from kgforge.functions.graph import ra_link_pred_ds

        # triangle A-B-C + pendant C-D: non-adjacent pairs (A,D) and
        # (B,D) both share only C (deg 3) → score 1000000 // 3
        pairs = [("A", "B"), ("B", "C"), ("A", "C"), ("C", "D")]
        out = ra_link_pred_ds(_edges_ds(pairs), k=5,
                              num_partitions=4).to_pandas()
        assert out.a.tolist() == ["A", "B"]
        assert out.b.tolist() == ["D", "D"]
        assert out.ra_score.tolist() == [333333, 333333]

    def test_ra_matches_bruteforce(self, ray_session):
        from kgforge.functions.graph import ra_link_pred_ds

        rng = np.random.default_rng(13)
        _, pairs = _rand_digraph(rng, n_nodes=10, n_edges=40)
        und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        adj: dict[str, set] = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        exp = []
        nodes = sorted(adj)
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                if (a, b) in und:
                    continue
                s = sum(1_000_000 // len(adj[z])
                        for z in adj[a] & adj[b])
                if s > 0:
                    exp.append((a, b, s))
        exp.sort(key=lambda r: (-r[2], r[0], r[1]))
        out = ra_link_pred_ds(_edges_ds(pairs), k=8,
                              num_partitions=8).to_pandas()
        got = list(out.itertuples(index=False, name=None))
        assert got == exp[:8]


class TestHitsAndComponents:
    def test_hits_matches_bruteforce(self, ray_session):
        from kgforge.functions.graph import hits_ds

        rng = np.random.default_rng(17)
        _, pairs = _rand_digraph(rng, n_nodes=10, n_edges=40)
        prs = sorted({p for p in pairs})
        nodes = sorted({x for e in prs for x in e})
        h = {v: 1_000_000 for v in nodes}
        for _ in range(2):
            a_raw = {v: sum(h[s] for s, d in prs if d == v)
                     for v in nodes}
            mx = max(max(a_raw.values()), 1)
            a = {v: x * 1_000_000 // mx for v, x in a_raw.items()}
            h_raw = {v: sum(a[d] for s, d in prs if s == v)
                     for v in nodes}
            mx = max(max(h_raw.values()), 1)
            h = {v: x * 1_000_000 // mx for v, x in h_raw.items()}
        out = hits_ds(_edges_ds(pairs), iters=2,
                      num_partitions=8).to_pandas()
        got = {r.node: (r.auth, r.hub) for r in out.itertuples()}
        assert set(got) == set(nodes)
        for v in nodes:
            assert got[v] == (a[v], h[v]), v

    def test_comp_sizes_two_components(self, ray_session):
        from ray.data.aggregate import Count

        from kgforge.functions.graph import components_ds

        # K3 plus an isolated edge → sizes {3: 1, 2: 1}
        pairs = [("A", "B"), ("B", "C"), ("A", "C"), ("X", "Y")]
        comp = components_ds(_edges_ds(pairs))
        sizes = comp.groupby("component") \
            .aggregate(Count(alias_name="size_nodes")).to_pandas()
        got = sorted(sizes.size_nodes.tolist())
        assert got == [2, 3]


class TestCommunities:
    @staticmethod
    def _lpa_brute(pairs, rounds=2):
        und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        adj: dict[str, set] = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        lab = {v: v for v in adj}
        for _ in range(rounds):
            new = {}
            for v, nbrs in adj.items():
                cnt: dict[str, int] = {}
                for u in nbrs:
                    cnt[lab[u]] = cnt.get(lab[u], 0) + 1
                new[v] = min(cnt, key=lambda L: (-cnt[L], L))
            lab = new
        return lab

    def test_lpa_path_tiebreak(self, ray_session):
        from kgforge.functions.graph import label_prop_communities_ds

        pairs = [("A", "B"), ("B", "C")]
        out = label_prop_communities_ds(
            _edges_ds(pairs), rounds=2, num_partitions=4).to_pandas()
        got = dict(zip(out.node, out.community))
        assert got == self._lpa_brute(pairs)      # {'A':'A','B':'B','C':'A'}
        assert got == {"A": "A", "B": "B", "C": "A"}

    def test_lpa_matches_bruteforce(self, ray_session):
        from kgforge.functions.graph import label_prop_communities_ds

        rng = np.random.default_rng(23)
        _, pairs = _rand_digraph(rng, n_nodes=14, n_edges=45)
        out = label_prop_communities_ds(
            _edges_ds(pairs), rounds=2, num_partitions=8).to_pandas()
        got = dict(zip(out.node, out.community))
        assert got == self._lpa_brute(pairs)


def test_katz_matches_bruteforce(ray_session):
    from kgforge.functions.graph import katz_ds

    rng = np.random.default_rng(29)
    _, pairs = _rand_digraph(rng, n_nodes=10, n_edges=40)
    prs = sorted({p for p in pairs})
    nodes = sorted({x for e in prs for x in e})
    k = {v: 0 for v in nodes}
    for _ in range(3):
        k = {v: sum((1_000_000 + k[s]) // 2
                    for s, d in prs if d == v) for v in nodes}
    out = katz_ds(_edges_ds(pairs), iters=3,
                  num_partitions=8).to_pandas()
    got = dict(zip(out.node, out.katz))
    assert got == k
