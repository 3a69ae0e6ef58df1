"""DuckDB oracle SQL for the dictionary-tagger KG lane.

Generates, from the SAME constants the Ray side uses
(:mod:`kgforge.sources.dictcorpus` formulas, ``TEMPLATES``, the frozen
gazetteers, ``TRIPLE_RULES``), ANSI SQL that:

1. reconstructs every rendered sentence + its gold mention offsets
   positionally (pure modular arithmetic + ``length()`` sums), and
2. re-implements the triple rule engine
   (:func:`kgforge.oracle.triples.extract_triples`) as a mention pair
   join: gap text via ``substr``, connective via ``contains``,
   co-occurrence window, per-sentence ``mentions`` pred with
   first-occurrence etype, and the D1 dedup as a GROUP BY.

The Ray pipeline must therefore land on these values exactly — the
driver's CORRECTNESS gate value-checks the whole
explode → split → tag → mentions → triples → dedup lane.
"""

from __future__ import annotations

from kgforge.oracle.corpus import _SLOT_TYPES, TEMPLATES
from kgforge.oracle.triples import COOCCUR_WINDOW, TRIPLE_RULES
from kgforge.sources.dictcorpus import N_TPL, SENTS_PER_DOC, dict_gazetteers

_GTABLE = {"PER": "g_per", "LOC": "g_loc", "ORG": "g_org"}


def _q(s: str) -> str:
    """SQL single-quoted literal (apostrophes in gazetteer surfaces or
    template segments must not break the generated oracle)."""
    return "'" + s.replace("'", "''") + "'"


def _values(surfaces: list[str]) -> str:
    return ", ".join(f"({i}, {_q(s)})" for i, s in enumerate(surfaces))


def _slot_idx_expr(k: int, n: int) -> str:
    # keep in lockstep with dictcorpus.slot_index
    return f"(d * (3 + 2*{k} + 5*j) + {11 * k} + 7*j) % {n}"


def _template_branches() -> tuple[list[str], list[str]]:
    """Per-template SELECTs for the sentence CTE and the mention CTE."""
    gaz = dict_gazetteers()
    sent_sel: list[str] = []
    ment_sel: list[str] = []
    for t, template in enumerate(TEMPLATES):
        joins: list[str] = []
        text_parts: list[str] = []
        # running start offset: constant + length() of earlier slots
        const = 0
        start_exprs: list[tuple[int, str, str]] = []  # (k, etype, start_sql)
        var_parts: list[str] = []
        k = 0
        for seg in template:
            if seg in _SLOT_TYPES:
                tbl = _GTABLE[seg]
                joins.append(f"JOIN {tbl} s{k} ON s{k}.i = "
                             f"{_slot_idx_expr(k, len(gaz[seg]))}")
                text_parts.append(f"s{k}.s")
                start_sql = " + ".join([str(const)] + var_parts) \
                    if var_parts else str(const)
                start_exprs.append((k, seg, start_sql))
                var_parts.append(f"length(s{k}.s)")
                k += 1
            else:
                text_parts.append(_q(seg))
                const += len(seg)
        text_expr = " || ".join(text_parts)
        frm = f"FROM dj {' '.join(joins)} WHERE tpl = {t}"
        sent_sel.append(f"SELECT d, j, {text_expr} AS sent_text {frm}")
        for k, etype, start_sql in start_exprs:
            ment_sel.append(
                f"SELECT d, j, ({start_sql}) AS ms, "
                f"({start_sql}) + length(s{k}.s) AS me, "
                f"s{k}.s AS surface, '{etype}' AS etype {frm}")
    return sent_sel, ment_sel


def corpus_prelude() -> str:
    """The shared WITH-clause: gazetteers, doc×sentence grid, rendered
    sentences (with per-doc sentence offsets) and gold mentions."""
    gaz = dict_gazetteers()
    sent_sel, ment_sel = _template_branches()
    return f"""
WITH jj(j) AS (VALUES {", ".join(f"({j})" for j in range(SENTS_PER_DOC))}),
g_per(i, s) AS (VALUES {_values(gaz["PER"])}),
g_loc(i, s) AS (VALUES {_values(gaz["LOC"])}),
g_org(i, s) AS (VALUES {_values(gaz["ORG"])}),
dj AS (SELECT doc_id AS d, j, (doc_id * (1 + 2*j) + 5*j) % {N_TPL} AS tpl
       FROM documents CROSS JOIN jj),
sents0 AS ({" UNION ALL ".join(sent_sel)}),
sents AS (SELECT d, j, sent_text, printf('dict-%08d', d) AS doc_id,
                 CAST(coalesce(sum(length(sent_text))
                      OVER (PARTITION BY d ORDER BY j
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS INTEGER)
                     AS sent_offset
          FROM sents0),
ments AS ({" UNION ALL ".join(ment_sel)})"""


def mentions_sql() -> str:
    return corpus_prelude() + """
SELECT s.doc_id, 0 AS span_idx, s.j AS sent_idx, s.sent_offset AS "offset",
       m.ms AS ment_start, m.me AS ment_end, m.surface, m.etype
FROM ments m JOIN sents s ON s.d = m.d AND s.j = m.j
"""


def _rules_values() -> str:
    rows = []
    for pred, st, ot, direction, conns, max_gap in TRIPLE_RULES:
        c1 = _q(conns[0])
        c2 = _q(conns[1]) if len(conns) > 1 else "NULL"
        d = "sf" if direction == "subj_first" else "of"
        rows.append(f"({_q(pred)}, {_q(st)}, {_q(ot)}, '{d}', {c1}, {c2}, "
                    f"{max_gap})")
    return ", ".join(rows)


def _triples_ctes() -> str:
    """CTEs computing the pre-dedup triple rows (named ``trip``)."""
    return corpus_prelude() + f""",
pairs AS (
  SELECT m1.d, m1.j, m1.etype AS t1, m2.etype AS t2,
         m1.surface AS s1, m2.surface AS s2,
         m1.me AS me1, m2.ms AS ms2,
         substr(s.sent_text, m1.me + 1, m2.ms - m1.me) AS gap
  FROM ments m1
  JOIN ments m2 ON m1.d = m2.d AND m1.j = m2.j AND m1.ms < m2.ms
  JOIN sents s ON s.d = m1.d AND s.j = m1.j
  WHERE m2.ms >= m1.me
),
rules(pred, st, ot, dir, c1, c2, max_gap) AS (VALUES {_rules_values()}),
rel AS (
  SELECT CASE r.dir WHEN 'sf' THEN p.s1 ELSE p.s2 END AS subj, r.pred,
         CASE r.dir WHEN 'sf' THEN p.s2 ELSE p.s1 END AS obj,
         CASE r.dir WHEN 'sf' THEN p.t1 ELSE p.t2 END AS subj_type,
         CASE r.dir WHEN 'sf' THEN p.t2 ELSE p.t1 END AS obj_type,
         p.d, p.j
  FROM pairs p JOIN rules r
    ON length(p.gap) <= r.max_gap
   AND (contains(p.gap, r.c1)
        OR (r.c2 IS NOT NULL AND contains(p.gap, r.c2)))
   AND ((r.dir = 'sf' AND p.t1 = r.st AND p.t2 = r.ot)
     OR (r.dir = 'of' AND p.t1 = r.ot AND p.t2 = r.st))
),
cooc AS (
  SELECT CASE WHEN s1 <= s2 THEN s1 ELSE s2 END AS subj,
         'co_occurs' AS pred,
         CASE WHEN s1 <= s2 THEN s2 ELSE s1 END AS obj,
         CASE WHEN s1 <= s2 THEN t1 ELSE t2 END AS subj_type,
         CASE WHEN s1 <= s2 THEN t2 ELSE t1 END AS obj_type,
         d, j
  FROM pairs WHERE ms2 - me1 <= {COOCCUR_WINDOW} AND s1 <> s2
),
mentpred AS (
  SELECT printf('dict-%08d', d) AS subj, 'mentions' AS pred,
         surface AS obj, 'DOC' AS subj_type,
         arg_min(etype, ms) AS obj_type, d, j
  FROM ments GROUP BY d, j, surface
),
trip AS (
  SELECT subj, pred, obj, subj_type, obj_type,
         printf('dict-%08d', d) AS doc_id, 0 AS span_idx,
         j AS sent_idx, 1 AS support
  FROM (SELECT * FROM rel UNION ALL SELECT * FROM cooc
        UNION ALL SELECT subj, pred, obj, subj_type, obj_type, d, j
        FROM mentpred)
)"""


def triples_sql() -> str:
    return _triples_ctes() + "\nSELECT * FROM trip\n"


def edges_sql() -> str:
    return _triples_ctes() + """
SELECT subj, pred, obj, min(subj_type) AS subj_type,
       min(obj_type) AS obj_type, CAST(sum(support) AS BIGINT) AS support,
       min(doc_id) AS first_doc
FROM trip GROUP BY subj, pred, obj
"""


def nodes_sql() -> str:
    return corpus_prelude() + """
SELECT surface, min(etype) AS etype, CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT d) AS BIGINT) AS n_docs
FROM ments GROUP BY surface
"""


def ambiguity_sql() -> str:
    """Twin of ``q_kg_ambiguity`` — per-surface type-ambiguity census
    over the gold mention stream (majority type by count DESC, etype
    ASC; share in truncating integer ppm)."""
    return corpus_prelude() + """,
tc AS (SELECT surface, etype, CAST(count(*) AS BIGINT) AS c
       FROM ments GROUP BY 1, 2),
tot AS (SELECT surface, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS nt
        FROM tc GROUP BY 1),
top AS (SELECT surface, etype, c,
               row_number() OVER (PARTITION BY surface
                                  ORDER BY c DESC, etype) AS rn
        FROM tc)
SELECT t.surface, tot.n AS n_mentions, tot.nt AS n_types,
       t.etype AS top_type,
       CAST(t.c * 1000000 // tot.n AS BIGINT) AS top_share_ppm
FROM top t JOIN tot ON tot.surface = t.surface WHERE t.rn = 1
"""


def entity_pairs_prelude() -> str:
    """The graph-analytics base: distinct directed entity–entity pairs
    (``mentions`` doc→surface edges excluded) from the triple stream —
    the same projection :mod:`kgforge.functions.graph` computes from
    the materialized edge table."""
    return _triples_ctes() + """,
prs AS (SELECT DISTINCT subj AS s, obj AS d FROM trip
        WHERE pred <> 'mentions'),
und AS (SELECT DISTINCT n1, n2 FROM (
          SELECT s AS n1, d AS n2 FROM prs
          UNION ALL SELECT d AS n1, s AS n2 FROM prs)
        WHERE n1 <> n2)"""


def degree_sql() -> str:
    return entity_pairs_prelude() + """,
adj AS (SELECT n1, n2, max(o) AS om, max(i) AS im FROM (
          SELECT s AS n1, d AS n2, 1 AS o, 0 AS i FROM prs WHERE s <> d
          UNION ALL
          SELECT d AS n1, s AS n2, 0 AS o, 1 AS i FROM prs WHERE s <> d)
        GROUP BY n1, n2)
SELECT n1 AS node, CAST(sum(om) AS BIGINT) AS out_deg,
       CAST(sum(im) AS BIGINT) AS in_deg,
       CAST(count(*) AS BIGINT) AS degree
FROM adj GROUP BY n1
"""


def _pagerank_step(prev: str, cur: str) -> str:
    return f""",
{cur} AS (SELECT nd.n,
                 CAST(150000 + (85 * coalesce(sum({prev}.r // od.odeg),
                                              0)) // 100 AS BIGINT) AS r
          FROM nodes nd
          LEFT JOIN prs ON prs.d = nd.n
          LEFT JOIN od ON od.s = prs.s
          LEFT JOIN {prev} ON {prev}.n = prs.s
          GROUP BY nd.n)"""


def pagerank_sql(iters: int = 3) -> str:
    """Integer-deterministic PageRank twin of
    :func:`kgforge.functions.graph.pagerank_ds` — floor division at
    every step, so both engines land on identical int64 ranks."""
    sql = entity_pairs_prelude() + """,
nodes AS (SELECT DISTINCT n FROM (
            SELECT s AS n FROM prs UNION ALL SELECT d AS n FROM prs)),
od AS (SELECT s, count(*) AS odeg FROM prs GROUP BY s),
r0 AS (SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    for i in range(iters):
        sql += _pagerank_step(f"r{i}", f"r{i + 1}")
    return sql + f"""
SELECT n AS node, r AS "rank" FROM r{iters}
"""


def weighted_pagerank_sql(iters: int = 3) -> str:
    """Weighted-PageRank twin of
    :func:`kgforge.functions.graph.weighted_pagerank_ds` — pair
    weight = number of supporting triple rows (each pre-dedup triple
    carries support 1, and the edge table sums them), floor division
    per edge so both engines land on identical int64 ranks."""
    sql = _triples_ctes() + """,
wprs AS (SELECT subj AS s, obj AS d, CAST(count(*) AS BIGINT) AS w
         FROM trip WHERE pred <> 'mentions' GROUP BY 1, 2),
nodes AS (SELECT DISTINCT n FROM (
            SELECT s AS n FROM wprs UNION ALL SELECT d AS n FROM wprs)),
ow AS (SELECT s, CAST(sum(w) AS BIGINT) AS wsum FROM wprs GROUP BY s),
r0 AS (SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        sql += f""",
{cur} AS (SELECT nd.n,
                 CAST(150000 + (85 * coalesce(
                          sum(({prev}.r * wprs.w) // ow.wsum), 0))
                      // 100 AS BIGINT) AS r
          FROM nodes nd
          LEFT JOIN wprs ON wprs.d = nd.n
          LEFT JOIN ow ON ow.s = wprs.s
          LEFT JOIN {prev} ON {prev}.n = wprs.s
          GROUP BY nd.n)"""
    return sql + f"""
SELECT n AS node, r AS "rank" FROM r{iters}
"""


def _ppr_step(prev: str, cur: str) -> str:
    return f""",
{cur} AS (SELECT nd.n,
                 CAST((CASE WHEN nd.n IN (SELECT n FROM seeds)
                            THEN 150000 ELSE 0 END)
                      + (85 * coalesce(sum({prev}.r // od.odeg),
                                       0)) // 100 AS BIGINT) AS r
          FROM nodes nd
          LEFT JOIN prs ON prs.d = nd.n
          LEFT JOIN od ON od.s = prs.s
          LEFT JOIN {prev} ON {prev}.n = prs.s
          GROUP BY nd.n)"""


def ppr_sql(iters: int = 3, n_seeds: int = 4) -> str:
    """Integer-deterministic personalized-PageRank twin of
    :func:`kgforge.functions.graph.personalized_pagerank_ds` — teleport
    mass on the ``n_seeds`` lexicographically smallest nodes, floor
    division at every step, identical int64 ranks both engines."""
    sql = entity_pairs_prelude() + f""",
nodes AS (SELECT DISTINCT n FROM (
            SELECT s AS n FROM prs UNION ALL SELECT d AS n FROM prs)),
od AS (SELECT s, count(*) AS odeg FROM prs GROUP BY s),
seeds AS (SELECT n FROM nodes ORDER BY n LIMIT {n_seeds}),
r0 AS (SELECT n, CAST(CASE WHEN n IN (SELECT n FROM seeds)
                           THEN 1000000 ELSE 0 END AS BIGINT) AS r
       FROM nodes)"""
    for i in range(iters):
        sql += _ppr_step(f"r{i}", f"r{i + 1}")
    return sql + f"""
SELECT n AS node, r AS "rank" FROM r{iters}
"""


def two_hop_sql() -> str:
    return entity_pairs_prelude() + """,
two AS (SELECT DISTINCT a.n1 AS node, b.n2 AS nbr
        FROM und a JOIN und b ON b.n1 = a.n2
        WHERE b.n2 <> a.n1
          AND NOT EXISTS (SELECT 1 FROM und u
                          WHERE u.n1 = a.n1 AND u.n2 = b.n2))
SELECT node, CAST(count(*) AS BIGINT) AS n_two_hop FROM two GROUP BY node
"""


def triangles_sql() -> str:
    return entity_pairs_prelude() + """,
ce AS (SELECT n1 AS a, n2 AS b FROM und WHERE n1 < n2)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM ce e1 JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b
"""


def components_sql() -> str:
    """Connected components as a recursive reachability closure —
    fine at oracle scale; the Ray side's label propagation is the
    scale path."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    return prelude + """,
reach(node, lab) AS (
  SELECT n1 AS node, n1 AS lab FROM und
  UNION
  SELECT r.node, u.n2 FROM reach r JOIN und u ON u.n1 = r.lab)
SELECT node, min(lab) AS component FROM reach GROUP BY node
"""


def common_neighbors_sql(k: int = 20) -> str:
    """Top-k non-adjacent pairs by shared-neighbour count — the SQL
    twin of :func:`kgforge.functions.graph.common_neighbors_ds` (same
    wedge definition, same (cn DESC, a, b) deterministic cut)."""
    return entity_pairs_prelude() + f""",
w AS (SELECT l.n2 AS a, r.n2 AS b FROM und l
      JOIN und r ON r.n1 = l.n1 AND l.n2 < r.n2),
cn AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn FROM w GROUP BY 1, 2),
nonadj AS (SELECT cn.a, cn.b, cn.cn FROM cn
           WHERE NOT EXISTS (SELECT 1 FROM und u
                             WHERE u.n1 = cn.a AND u.n2 = cn.b))
SELECT a, b, cn FROM nonadj ORDER BY cn DESC, a, b LIMIT {k}
"""

def ego_sql(hops: int = 2) -> str:
    """Induced edges of the k-hop neighborhood around the
    lexicographically smallest node — twin of
    :func:`kgforge.functions.graph.ego_edges_ds` (same deterministic
    seed rule, same undirected distinct-pair graph)."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    return prelude + f""",
seedq AS (SELECT min(n1) AS s FROM und),
reach(node, d) AS (
  SELECT s, 0 FROM seedq
  UNION
  SELECT u.n2, r.d + 1 FROM reach r JOIN und u ON u.n1 = r.node
  WHERE r.d < {hops}),
m AS (SELECT DISTINCT node FROM reach)
SELECT u.n1 AS a, u.n2 AS b FROM und u
JOIN m m1 ON m1.node = u.n1 JOIN m m2 ON m2.node = u.n2
WHERE u.n1 < u.n2
"""


def cooccur_sql() -> str:
    """Sentence-level entity co-mention counts — twin of the
    ``cooccur_pairs_ds`` run in ``q_kg_cooccur`` (same distinct-
    per-sentence semantics, same a < b pair order)."""
    return corpus_prelude() + """,
mm AS (SELECT DISTINCT d, j, surface FROM ments),
pr AS (SELECT m1.surface AS a, m2.surface AS b,
              CAST(count(*) AS BIGINT) AS n_sents
       FROM mm m1 JOIN mm m2
         ON m1.d = m2.d AND m1.j = m2.j AND m1.surface < m2.surface
       GROUP BY 1, 2)
SELECT a, b, n_sents FROM pr
"""


def kcore_sql(k: int = 2, rounds: int = 8) -> str:
    """Bounded-round k-core peel — twin of
    :func:`kgforge.functions.graph.kcore_ds` (same fixed-round
    semantics; a converged round is the identity on both engines)."""
    # AS MATERIALIZED: each round references its predecessor three
    # times (directly + twice via d{r}); inlined CTEs would expand
    # the corpus-reconstruction prelude 3^rounds times
    sql = entity_pairs_prelude() + """,
e0 AS MATERIALIZED (SELECT n1, n2 FROM und)"""
    for r in range(rounds):
        sql += f""",
d{r} AS MATERIALIZED (SELECT n1 AS n, count(*) AS dg
                      FROM e{r} GROUP BY n1),
e{r + 1} AS MATERIALIZED (SELECT e.n1, e.n2 FROM e{r} e
             JOIN d{r} a ON a.n = e.n1 AND a.dg >= {k}
             JOIN d{r} b ON b.n = e.n2 AND b.dg >= {k})"""
    return sql + f"""
SELECT n1 AS node, CAST(count(*) AS BIGINT) AS degree
FROM e{rounds} GROUP BY n1
"""


def assortativity_sql() -> str:
    """Degree-assortativity moments — twin of
    :func:`kgforge.functions.graph.assortativity_ds` (same directed
    pair stream, same integer moments, DuckDB's truncating ``//``)."""
    return entity_pairs_prelude() + """,
dd AS (SELECT n1 AS n, CAST(count(*) AS BIGINT) AS dg
       FROM und GROUP BY n1),
pp AS (SELECT a.dg AS x, b.dg AS y
       FROM und JOIN dd a ON a.n = und.n1 JOIN dd b ON b.n = und.n2),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pp)
SELECT n AS n_pairs,
       CAST(n * sxy - sx * sy AS BIGINT) AS num,
       CAST(n * sxx - sx * sx AS BIGINT) AS denx,
       CAST(n * syy - sy * sy AS BIGINT) AS deny,
       CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                 ELSE (n * sxy - sx * sy) * 1000000
                      // (n * sxx - sx * sx) END AS BIGINT) AS slope_ppm
FROM m
"""


def ktruss_sql(k: int = 4, rounds: int = 3) -> str:
    """Unrolled twin of :func:`kgforge.functions.graph.ktruss_ds`:
    ``rounds`` peels of edges with within-subgraph common-neighbor
    count < ``k − 2``, then the survivors scored on the final
    subgraph (extra rounds past the engine's fixed-point early exit
    are no-ops, so the fixed unroll matches)."""
    need = k - 2
    sql = entity_pairs_prelude() + """,
e0 AS MATERIALIZED (SELECT n1 AS a, n2 AS b FROM und
                    WHERE n1 < n2),
u0 AS MATERIALIZED (SELECT a AS n1, b AS n2 FROM e0
                    UNION ALL SELECT b, a FROM e0)"""
    for i in range(rounds):
        p, c = i, i + 1
        sql += f""",
c{p} AS MATERIALIZED (
    SELECT l.n2 AS a, r.n2 AS b, CAST(count(*) AS BIGINT) AS cn
    FROM u{p} l JOIN u{p} r ON r.n1 = l.n1 AND l.n2 < r.n2
    GROUP BY 1, 2),
e{c} AS MATERIALIZED (
    SELECT e{p}.a, e{p}.b FROM e{p}
    JOIN c{p} ON c{p}.a = e{p}.a AND c{p}.b = e{p}.b
    WHERE c{p}.cn >= {need}),
u{c} AS MATERIALIZED (
    SELECT a AS n1, b AS n2 FROM e{c}
    UNION ALL SELECT b, a FROM e{c})"""
    r = rounds
    return sql + f""",
cf AS (SELECT l.n2 AS a, r.n2 AS b, CAST(count(*) AS BIGINT) AS cn
       FROM u{r} l JOIN u{r} r ON r.n1 = l.n1 AND l.n2 < r.n2
       GROUP BY 1, 2)
SELECT e{r}.a, e{r}.b,
       CAST(coalesce(cf.cn, 0) AS BIGINT) AS support
FROM e{r} LEFT JOIN cf ON cf.a = e{r}.a AND cf.b = e{r}.b
"""


def rich_club_sql(thresholds=(1, 2, 4, 8, 16, 32)) -> str:
    """Rich-club coefficient curve — twin of
    :func:`kgforge.functions.graph.rich_club_ds` (same undirected
    distinct-pair degrees; each edge counted twice in the directed
    stream then halved; nonneg integer // so floor == truncate)."""
    ks = ", ".join(str(int(k)) for k in thresholds)
    return entity_pairs_prelude() + f""",
dd AS (SELECT n1 AS n, CAST(count(*) AS BIGINT) AS dg
       FROM und GROUP BY n1),
ed AS (SELECT least(a.dg, b.dg) AS dmin
       FROM und JOIN dd a ON a.n = und.n1 JOIN dd b ON b.n = und.n2),
ks AS (SELECT CAST(unnest([{ks}]) AS BIGINT) AS k),
nk AS (SELECT ks.k, CAST(count(dd.n) AS BIGINT) AS n_nodes
       FROM ks LEFT JOIN dd ON dd.dg > ks.k GROUP BY ks.k),
ek AS (SELECT ks.k, CAST(count(ed.dmin) AS BIGINT) // 2 AS n_edges
       FROM ks LEFT JOIN ed ON ed.dmin > ks.k GROUP BY ks.k)
SELECT nk.k, nk.n_nodes, ek.n_edges,
       CAST(CASE WHEN nk.n_nodes >= 2
                 THEN 2 * ek.n_edges * 1000000
                      // (nk.n_nodes * (nk.n_nodes - 1))
                 ELSE 0 END AS BIGINT) AS rc_ppm
FROM nk JOIN ek ON ek.k = nk.k ORDER BY nk.k
"""


def neighbor_degree_sql() -> str:
    """Average-neighbor-degree curve knn(k) — twin of
    :func:`kgforge.functions.graph.neighbor_degree_ds` (same
    undirected distinct-pair degrees; every degree-k node contributes
    exactly k directed pair rows, so n_nodes = n_pairs // k; nonneg
    integer // so floor == truncate)."""
    return entity_pairs_prelude() + """,
dd AS (SELECT n1 AS n, CAST(count(*) AS BIGINT) AS dg
       FROM und GROUP BY n1)
SELECT a.dg AS degree,
       CAST(count(*) // a.dg AS BIGINT) AS n_nodes,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(b.dg) AS BIGINT) AS sum_nbr_deg,
       CAST(sum(CAST(b.dg AS HUGEINT)) * 1000000 // count(*)
            AS BIGINT) AS knn_micro
FROM und JOIN dd a ON a.n = und.n1 JOIN dd b ON b.n = und.n2
GROUP BY a.dg ORDER BY a.dg
"""


def eigencentrality_sql(iters: int = 3, k: int = 20) -> str:
    """Max-normalized power-iteration eigenvector centrality — twin
    of :func:`kgforge.functions.graph.eigencentrality_ds` (same
    undirected distinct pairs, x₀ ≡ 10⁶, nonneg integer // so floor
    == truncate; y₁ = deg·10⁶ folds in closed form)."""
    steps = ["y1 AS (SELECT n2 AS n, CAST(count(*) AS BIGINT)"
             " * 1000000 AS r FROM und GROUP BY n2)",
             "m1 AS (SELECT max(r) AS m FROM y1)",
             "x1 AS (SELECT n, r * 1000000 // (SELECT m FROM m1)"
             " AS r FROM y1)"]
    for i in range(2, iters + 1):
        steps.append(
            f"y{i} AS (SELECT und.n2 AS n, CAST(sum(x{i-1}.r)"
            f" AS BIGINT) AS r FROM und JOIN x{i-1}"
            f" ON x{i-1}.n = und.n1 GROUP BY 1)")
        steps.append(f"m{i} AS (SELECT max(r) AS m FROM y{i})")
        steps.append(
            f"x{i} AS (SELECT n, r * 1000000 //"
            f" (SELECT m FROM m{i}) AS r FROM y{i})")
    return entity_pairs_prelude() + ",\n" + ",\n".join(steps) + f"""
SELECT n AS node, CAST(r AS BIGINT) AS score_micro
FROM x{iters} ORDER BY score_micro DESC, node LIMIT {k}
"""


def edge_jaccard_sql() -> str:
    """Per-edge neighborhood Jaccard — twin of
    :func:`kgforge.functions.graph.edge_jaccard_ds` (same canonical
    a < b edges, cn = 0 edges kept, integer ppm)."""
    return entity_pairs_prelude() + """,
dd AS (SELECT n1 AS n, CAST(count(*) AS BIGINT) AS dg
       FROM und GROUP BY n1),
ce AS (SELECT n1 AS a, n2 AS b FROM und WHERE n1 < n2),
w AS (SELECT l.n2 AS a, r.n2 AS b, CAST(count(*) AS BIGINT) AS cn
      FROM und l JOIN und r ON r.n1 = l.n1 AND l.n2 < r.n2
      GROUP BY 1, 2),
j AS (SELECT ce.a, ce.b, coalesce(w.cn, 0) AS cn
      FROM ce LEFT JOIN w ON w.a = ce.a AND w.b = ce.b)
SELECT j.a, j.b, j.cn,
       CAST(j.cn * 1000000 // (da.dg + db.dg - j.cn) AS BIGINT)
           AS jac_ppm
FROM j JOIN dd da ON da.n = j.a JOIN dd db ON db.n = j.b
"""


def lift_sql() -> str:
    """Entity co-mention lift — twin of ``q_kg_lift`` (same distinct
    per-sentence semantics; N = sentences containing ≥ 1 mention;
    integer ppm, truncating division)."""
    return corpus_prelude() + """,
mm AS (SELECT DISTINCT d, j, surface FROM ments),
nn AS (SELECT count(*) AS n FROM (SELECT DISTINCT d, j FROM mm)),
ec AS (SELECT surface, CAST(count(*) AS BIGINT) AS ns
       FROM mm GROUP BY surface),
pr AS (SELECT m1.surface AS a, m2.surface AS b,
              CAST(count(*) AS BIGINT) AS n_ab
       FROM mm m1 JOIN mm m2
         ON m1.d = m2.d AND m1.j = m2.j AND m1.surface < m2.surface
       GROUP BY 1, 2)
SELECT pr.a, pr.b, pr.n_ab,
       CAST(pr.n_ab * nn.n * 1000000 // (ea.ns * eb.ns) AS BIGINT)
           AS lift_ppm
FROM pr, nn
JOIN ec ea ON ea.surface = pr.a
JOIN ec eb ON eb.surface = pr.b
"""


def clustering_coeff_sql() -> str:
    """SQL twin of :func:`kgforge.functions.graph.clustering_coeff_ds`
    — same wedge definition, same exact-integer ppm (truncating)."""
    return entity_pairs_prelude() + """,
ce AS (SELECT n1 AS a, n2 AS b FROM und WHERE n1 < n2),
w AS (SELECT l.n1 AS c, l.n2 AS a, r.n2 AS b FROM und l
      JOIN und r ON r.n1 = l.n1 AND l.n2 < r.n2),
tri AS (SELECT c, CAST(count(*) AS BIGINT) AS n_tri
        FROM w JOIN ce ON w.a = ce.a AND w.b = ce.b GROUP BY c),
deg AS (SELECT n1 AS node, CAST(count(*) AS BIGINT) AS degree
        FROM und GROUP BY n1)
SELECT node, degree, COALESCE(n_tri, 0) AS n_tri,
       CASE WHEN degree >= 2
            THEN 2 * COALESCE(n_tri, 0) * 1000000
                 // (degree * (degree - 1))
            ELSE 0 END AS coeff_ppm
FROM deg LEFT JOIN tri ON node = c
"""


def ra_link_pred_sql(k: int = 20) -> str:
    """SQL twin of :func:`kgforge.functions.graph.ra_link_pred_ds` —
    Resource-Allocation scores in integer micro-units (1000000 //
    deg(z), truncating), same (score DESC, a, b) deterministic cut."""
    return entity_pairs_prelude() + f""",
deg AS (SELECT n1, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY n1),
w AS (SELECT l.n2 AS a, r.n2 AS b, 1000000 // deg.d AS wt
      FROM und l JOIN und r ON r.n1 = l.n1 AND l.n2 < r.n2
      JOIN deg ON deg.n1 = l.n1),
ra AS (SELECT a, b, CAST(sum(wt) AS BIGINT) AS ra_score
       FROM w GROUP BY 1, 2),
nonadj AS (SELECT ra.a, ra.b, ra.ra_score FROM ra
           WHERE NOT EXISTS (SELECT 1 FROM und u
                             WHERE u.n1 = ra.a AND u.n2 = ra.b))
SELECT a, b, ra_score FROM nonadj
ORDER BY ra_score DESC, a, b LIMIT {k}
"""


def adamic_adar_sql(k: int = 20) -> str:
    """SQL twin of :func:`kgforge.functions.graph.adamic_adar_ds` —
    discrete Adamic–Adar scores in integer micro-units
    (``1000000 // (1 + floor(log2(deg(z))))``, truncating; the
    quantized log makes both engines bit-exact), same
    (score DESC, a, b) deterministic cut."""
    return entity_pairs_prelude() + f""",
deg AS (SELECT n1, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY n1),
w AS (SELECT l.n2 AS a, r.n2 AS b,
             1000000 // (1 + CAST(floor(log2(deg.d)) AS BIGINT)) AS wt
      FROM und l JOIN und r ON r.n1 = l.n1 AND l.n2 < r.n2
      JOIN deg ON deg.n1 = l.n1),
aa AS (SELECT a, b, CAST(sum(wt) AS BIGINT) AS aa_score
       FROM w GROUP BY 1, 2),
nonadj AS (SELECT aa.a, aa.b, aa.aa_score FROM aa
           WHERE NOT EXISTS (SELECT 1 FROM und u
                             WHERE u.n1 = aa.a AND u.n2 = aa.b))
SELECT a, b, aa_score FROM nonadj
ORDER BY aa_score DESC, a, b LIMIT {k}
"""


def jaccard_link_pred_sql(k: int = 20) -> str:
    """SQL twin of :func:`kgforge.functions.graph.jaccard_link_pred_ds`
    — Jaccard-coefficient scores in integer micro-units
    (``cn·1000000 // (deg(a)+deg(b)-cn)``, truncating), same
    (score DESC, a, b) deterministic cut."""
    return entity_pairs_prelude() + f""",
deg AS (SELECT n1, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY n1),
w AS (SELECT l.n2 AS a, r.n2 AS b, CAST(count(*) AS BIGINT) AS cn
      FROM und l JOIN und r ON r.n1 = l.n1 AND l.n2 < r.n2
      GROUP BY 1, 2),
nonadj AS (SELECT w.a, w.b, w.cn FROM w
           WHERE NOT EXISTS (SELECT 1 FROM und u
                             WHERE u.n1 = w.a AND u.n2 = w.b)),
sc AS (SELECT a, b,
              CAST(cn * 1000000 // (da.d + db.d - cn) AS BIGINT)
                  AS jac_score
       FROM nonadj JOIN deg da ON da.n1 = a JOIN deg db ON db.n1 = b)
SELECT a, b, jac_score FROM sc
ORDER BY jac_score DESC, a, b LIMIT {k}
"""


def _hits_half(prev: str, cur: str, edge_in: str, edge_out: str) -> str:
    """One HITS half-step CTE pair: raw in-sums from ``prev`` scores,
    then L∞ normalization in truncating integer micro-units."""
    return f""",
{cur}0 AS MATERIALIZED (SELECT nd.n,
                  CAST(coalesce(sum({prev}.v), 0) AS BIGINT) AS v
           FROM nodes nd
           LEFT JOIN prs ON prs.{edge_in} = nd.n
           LEFT JOIN {prev} ON {prev}.n = prs.{edge_out}
           GROUP BY nd.n),
{cur} AS MATERIALIZED (SELECT n, CAST(v * 1000000 //
                         greatest((SELECT max(v) FROM {cur}0), 1)
                         AS BIGINT) AS v
          FROM {cur}0)"""


def hits_sql(iters: int = 2) -> str:
    """Integer-deterministic HITS twin of
    :func:`kgforge.functions.graph.hits_ds` — max-normalized micro-unit
    scores with floor division at every half-step, identical int64s
    both engines."""
    sql = entity_pairs_prelude() + """,
nodes AS MATERIALIZED (SELECT DISTINCT n FROM (
            SELECT s AS n FROM prs UNION ALL SELECT d AS n FROM prs)),
h0 AS MATERIALIZED (SELECT n, CAST(1000000 AS BIGINT) AS v
                    FROM nodes)"""
    for i in range(iters):
        sql += _hits_half(f"h{i}", f"a{i + 1}", "d", "s")
        sql += _hits_half(f"a{i + 1}", f"h{i + 1}", "s", "d")
    return sql + f"""
SELECT a.n AS node, a.v AS auth, h.v AS hub
FROM a{iters} a JOIN h{iters} h ON a.n = h.n
"""


def comp_sizes_sql() -> str:
    """Component size distribution — the recursive-closure components
    twin aggregated to (size, count)."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    return prelude + """,
reach(node, lab) AS (
  SELECT n1 AS node, n1 AS lab FROM und
  UNION
  SELECT r.node, u.n2 FROM reach r JOIN und u ON u.n1 = r.lab),
comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
szs AS (SELECT component, CAST(count(*) AS BIGINT) AS size_nodes
        FROM comp GROUP BY component)
SELECT size_nodes, CAST(count(*) AS BIGINT) AS n_components
FROM szs GROUP BY size_nodes ORDER BY size_nodes
"""


def _lpa_step(prev: str, cur: str) -> str:
    return f""",
{cur} AS MATERIALIZED (
  SELECT node, lab FROM (
    SELECT u.n2 AS node, l.lab AS lab,
           row_number() OVER (PARTITION BY u.n2
                              ORDER BY count(*) DESC, l.lab) AS rn
    FROM und u JOIN {prev} l ON l.node = u.n1
    GROUP BY u.n2, l.lab) WHERE rn = 1)"""


def communities_sql(rounds: int = 2) -> str:
    """Deterministic synchronous label-propagation twin of
    :func:`kgforge.functions.graph.label_prop_communities_ds` — the
    same (count DESC, label ASC) argmax each round."""
    sql = entity_pairs_prelude() + """,
l0 AS MATERIALIZED (SELECT DISTINCT n1 AS node, n1 AS lab FROM und)"""
    for i in range(rounds):
        sql += _lpa_step(f"l{i}", f"l{i + 1}")
    return sql + f"""
SELECT node, lab AS community FROM l{rounds}
"""


def modularity_sql(rounds: int = 2) -> str:
    """Newman-modularity twin of
    :func:`kgforge.functions.graph.modularity_ds` over the same
    deterministic LPA partition (DuckDB's truncating ``//`` matches
    the engine's sign-aware truncation)."""
    sql = entity_pairs_prelude() + """,
l0 AS MATERIALIZED (SELECT DISTINCT n1 AS node, n1 AS lab FROM und)"""
    for i in range(rounds):
        sql += _lpa_step(f"l{i}", f"l{i + 1}")
    return sql + f""",
lf AS MATERIALIZED (SELECT node, lab FROM l{rounds}),
dd AS (SELECT n1 AS n, CAST(count(*) AS BIGINT) AS dg
       FROM und GROUP BY n1),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und WHERE n1 < n2),
dc AS (SELECT lf.lab, CAST(sum(dd.dg) AS BIGINT) AS dcm
       FROM dd JOIN lf ON lf.node = dd.n GROUP BY lf.lab),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_comms,
               CAST(sum(dcm * dcm) AS BIGINT) AS sum_dc2 FROM dc),
ie AS (SELECT CAST(count(*) AS BIGINT) AS intra
       FROM und u JOIN lf la ON la.node = u.n1
       JOIN lf lb ON lb.node = u.n2
       WHERE u.n1 < u.n2 AND la.lab = lb.lab)
SELECT mm.m, agg.n_comms, ie.intra AS intra_edges, agg.sum_dc2,
       CAST((4 * mm.m * ie.intra - agg.sum_dc2) * 1000000
            // (4 * mm.m * mm.m) AS BIGINT) AS q_ppm
FROM mm CROSS JOIN agg CROSS JOIN ie
"""


def _katz_step(prev: str, cur: str) -> str:
    return f""",
{cur} AS MATERIALIZED (SELECT nd.n,
                 CAST(coalesce(sum((1000000 + {prev}.v) // 2), 0)
                      AS BIGINT) AS v
          FROM nodes nd
          LEFT JOIN prs ON prs.d = nd.n
          LEFT JOIN {prev} ON {prev}.n = prs.s
          GROUP BY nd.n)"""


def katz_sql(iters: int = 3) -> str:
    """Integer-deterministic Katz twin of
    :func:`kgforge.functions.graph.katz_ds` — per-edge floor division
    at β = 1/2, identical int64 micro-units both engines."""
    sql = entity_pairs_prelude() + """,
nodes AS MATERIALIZED (SELECT DISTINCT n FROM (
            SELECT s AS n FROM prs UNION ALL SELECT d AS n FROM prs)),
k0 AS MATERIALIZED (SELECT n, CAST(0 AS BIGINT) AS v FROM nodes)"""
    for i in range(iters):
        sql += _katz_step(f"k{i}", f"k{i + 1}")
    return sql + f"""
SELECT n AS node, v AS katz FROM k{iters}
"""


def bfs_levels_sql(n_seeds: int = 5, max_hops: int = 4) -> str:
    """Recursive-CTE twin of
    :func:`kgforge.functions.graph.bfs_levels_ds`: seeds = the
    ``n_seeds`` lexicographically smallest nodes, dist = min hop count
    within ``max_hops`` undirected hops (the ``d < max_hops`` bound
    also terminates the recursion)."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    return prelude + f""",
bnodes AS (SELECT DISTINCT n1 AS n FROM und),
bseeds AS (SELECT n FROM bnodes ORDER BY n LIMIT {n_seeds}),
walk(node, d) AS (
  SELECT n, 0 FROM bseeds
  UNION
  SELECT u.n2, walk.d + 1 FROM walk JOIN und u ON u.n1 = walk.node
  WHERE walk.d < {max_hops})
SELECT node, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY node
"""


def path_counts_sql(n_seeds: int = 4, max_hops: int = 4) -> str:
    """Level-unrolled twin of
    :func:`kgforge.functions.graph.path_counts_ds`: min hop distances
    from the seed set via the recursive walk, then σ accumulated one
    MATERIALIZED CTE per level (σ_d(v) = Σ σ_{d−1}(u) over edges u→v
    with dist(u)=d−1, dist(v)=d)."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    sql = prelude + f""",
bnodes AS (SELECT DISTINCT n1 AS n FROM und),
bseeds AS (SELECT n FROM bnodes ORDER BY n LIMIT {n_seeds}),
walk(node, d) AS (
  SELECT n, 0 FROM bseeds
  UNION
  SELECT u.n2, walk.d + 1 FROM walk JOIN und u ON u.n1 = walk.node
  WHERE walk.d < {max_hops}),
lv AS MATERIALIZED (SELECT node, CAST(min(d) AS BIGINT) AS dist
                    FROM walk GROUP BY node),
p0 AS (SELECT n AS node, CAST(1 AS BIGINT) AS c FROM bseeds)"""
    for d in range(1, max_hops + 1):
        sql += f""",
p{d} AS MATERIALIZED (
    SELECT u.n2 AS node, CAST(sum(p{d - 1}.c) AS BIGINT) AS c
    FROM p{d - 1} JOIN und u ON u.n1 = p{d - 1}.node
    JOIN lv ON lv.node = u.n2 AND lv.dist = {d}
    GROUP BY u.n2)"""
    unions = "\nUNION ALL ".join(
        f"SELECT node, CAST({d} AS BIGINT) AS dist, c AS paths "
        f"FROM p{d}" for d in range(max_hops + 1))
    return sql + "\n" + unions + "\n"


def diameter_est_sql(max_hops: int = 6) -> str:
    """Double-sweep twin of
    :func:`kgforge.functions.graph.diameter_est_ds` — two recursive
    BFS walks, the second seeded by the first sweep's farthest node
    (max dist, ties → smallest id)."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    return prelude + f""",
bnodes AS (SELECT DISTINCT n1 AS n FROM und),
s0 AS (SELECT n FROM bnodes ORDER BY n LIMIT 1),
w1(node, d) AS (
  SELECT n, 0 FROM s0
  UNION
  SELECT u.n2, w1.d + 1 FROM w1 JOIN und u ON u.n1 = w1.node
  WHERE w1.d < {max_hops}),
lv1 AS MATERIALIZED (SELECT node, CAST(min(d) AS BIGINT) AS dist
                     FROM w1 GROUP BY node),
far AS (SELECT node, dist FROM lv1
        ORDER BY dist DESC, node LIMIT 1),
w2(node, d) AS (
  SELECT node, 0 FROM far
  UNION
  SELECT u.n2, w2.d + 1 FROM w2 JOIN und u ON u.n1 = w2.node
  WHERE w2.d < {max_hops}),
lv2 AS MATERIALIZED (SELECT node, CAST(min(d) AS BIGINT) AS dist
                     FROM w2 GROUP BY node)
SELECT (SELECT n FROM s0) AS seed,
       (SELECT node FROM far) AS far_node,
       (SELECT dist FROM far) AS ecc1,
       (SELECT max(dist) FROM lv2) AS diameter_lb
"""


def betweenness_sql(n_seeds: int = 4, max_hops: int = 4) -> str:
    """Twin of :func:`kgforge.functions.graph.betweenness_ds`:
    the :func:`path_counts_sql` forward CTEs plus the backward
    dependency pass unrolled one level at a time descending
    (``dep(v) = Σ σ(v)·(10⁶ + dep(w)) // σ(w)`` over DAG successors
    — nonneg integers, floor = truncate)."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    sql = prelude + f""",
bnodes AS (SELECT DISTINCT n1 AS n FROM und),
bseeds AS (SELECT n FROM bnodes ORDER BY n LIMIT {n_seeds}),
walk(node, d) AS (
  SELECT n, 0 FROM bseeds
  UNION
  SELECT u.n2, walk.d + 1 FROM walk JOIN und u ON u.n1 = walk.node
  WHERE walk.d < {max_hops}),
lv AS MATERIALIZED (SELECT node, CAST(min(d) AS BIGINT) AS dist
                    FROM walk GROUP BY node),
p0 AS (SELECT n AS node, CAST(1 AS BIGINT) AS c FROM bseeds)"""
    for d in range(1, max_hops + 1):
        sql += f""",
p{d} AS MATERIALIZED (
    SELECT u.n2 AS node, CAST(sum(p{d - 1}.c) AS BIGINT) AS c
    FROM p{d - 1} JOIN und u ON u.n1 = p{d - 1}.node
    JOIN lv ON lv.node = u.n2 AND lv.dist = {d}
    GROUP BY u.n2)"""
    sql += f""",
d{max_hops} AS (SELECT node, CAST(0 AS BIGINT) AS dep
                FROM p{max_hops})"""
    for d in range(max_hops - 1, -1, -1):
        w = d + 1
        sql += f""",
d{d} AS MATERIALIZED (
    SELECT p{d}.node,
           CAST(coalesce(sum(p{d}.c * (1000000 + dn.dep) // pw.c), 0)
                AS BIGINT) AS dep
    FROM p{d}
    LEFT JOIN und u ON u.n1 = p{d}.node
    LEFT JOIN p{w} pw ON pw.node = u.n2
    LEFT JOIN d{w} dn ON dn.node = u.n2 AND pw.node IS NOT NULL
    GROUP BY p{d}.node)"""
    unions = "\nUNION ALL ".join(
        f"SELECT p{d}.node, CAST({d} AS BIGINT) AS dist, p{d}.c AS "
        f"paths, d{d}.dep AS dep_units FROM p{d} "
        f"JOIN d{d} ON d{d}.node = p{d}.node"
        for d in range(max_hops + 1))
    return sql + "\n" + unions + "\n"


def harmonic_sql(n_seeds: int = 4, max_hops: int = 4) -> str:
    """Seed-keyed recursive-CTE twin of
    :func:`kgforge.functions.graph.harmonic_ds`: per-seed min hop
    distance within ``max_hops``, harmonic sum in integer micro-units
    (``1000000 // dist``, truncating), eccentricity = max dist."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    return prelude + f""",
bnodes AS (SELECT DISTINCT n1 AS n FROM und),
bseeds AS (SELECT n FROM bnodes ORDER BY n LIMIT {n_seeds}),
walk(seed, node, d) AS (
  SELECT n, n, 0 FROM bseeds
  UNION
  SELECT walk.seed, u.n2, walk.d + 1 FROM walk JOIN und u
    ON u.n1 = walk.node
  WHERE walk.d < {max_hops}),
lv AS (SELECT seed, node, CAST(min(d) AS BIGINT) AS dist
       FROM walk GROUP BY 1, 2)
SELECT seed,
       CAST(count(*) FILTER (WHERE dist >= 1) AS BIGINT) AS n_reached,
       CAST(coalesce(sum(1000000 // dist) FILTER (WHERE dist >= 1), 0)
            AS BIGINT) AS h_units,
       CAST(coalesce(max(dist), 0) AS BIGINT) AS ecc
FROM lv GROUP BY seed ORDER BY seed
"""


def random_walks_sql(walks_per_node: int = 2, walk_len: int = 3) -> str:
    """Unrolled twin of
    :func:`kgforge.functions.graph.random_walks_ds`: identical
    md5-prefix step rule (``md5_u64(cur|w|s) % deg`` over n2-ranked
    neighbors), one CTE per step."""
    vals = ", ".join(f"({i})" for i in range(walks_per_node))
    sql = entity_pairs_prelude() + f""",
wrk AS (SELECT n1, n2,
               row_number() OVER (PARTITION BY n1 ORDER BY n2) - 1
                   AS rk
        FROM und),
wdg AS (SELECT n1, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
wwj(w) AS (VALUES {vals}),
w0 AS (SELECT nd.n1 AS start, CAST(w AS BIGINT) AS w, nd.n1 AS cur
       FROM (SELECT DISTINCT n1 FROM und) nd, wwj)"""
    for s in range(1, walk_len + 1):
        sql += f""",
w{s} AS (SELECT wk.start, wk.w, nb.n2 AS cur
        FROM w{s - 1} wk
        JOIN wdg dg ON dg.n1 = wk.cur
        JOIN wrk nb ON nb.n1 = wk.cur
         AND nb.rk = CAST(
               CAST(concat('0x', substr(md5(wk.cur || '|' ||
                    CAST(wk.w AS VARCHAR) || '|' || '{s}'), 1, 16))
                    AS UBIGINT) % CAST(dg.deg AS UBIGINT) AS BIGINT))"""
    selects = [f"SELECT start, w, CAST({s} AS BIGINT) AS step, "
               f"cur AS node FROM w{s}"
               for s in range(walk_len + 1)]
    return sql + "\n" + "\nUNION ALL ".join(selects) + "\n"


def pred_card_sql() -> str:
    """Per-predicate cardinality QA twin of the engine's
    ``q_kg_pred_card``: edge/endpoint counts + subject fanout over the
    DEDUPED triple set (the D1 edge table's grain)."""
    return _triples_ctes() + """,
dtri AS (SELECT DISTINCT subj, pred, obj FROM trip)
SELECT pred, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(count(DISTINCT subj) AS BIGINT) AS n_subj,
       CAST(count(DISTINCT obj) AS BIGINT) AS n_obj,
       CAST(count(*) * 1000000 // count(DISTINCT subj) AS BIGINT)
           AS fanout_ppm
FROM dtri GROUP BY pred
"""


def type_matrix_sql() -> str:
    """Entity-type adjacency matrix twin of ``q_kg_type_matrix``:
    deduped-edge counts per (subj_type, obj_type), provenance
    ``mentions`` edges excluded."""
    return _triples_ctes() + """,
dedge AS (SELECT subj, pred, obj, min(subj_type) AS st,
                 min(obj_type) AS ot
          FROM trip GROUP BY 1, 2, 3)
SELECT st AS subj_type, ot AS obj_type,
       CAST(count(*) AS BIGINT) AS n_edges
FROM dedge WHERE pred <> 'mentions' GROUP BY 1, 2
"""


def typed_paths_sql() -> str:
    """Typed 2-path wedge census twin of
    :func:`kgforge.functions.graph.typed_paths_ds`: ordered a–m–b
    walks (a ≠ b) grouped by node types, node type = min observed
    endpoint type."""
    return entity_pairs_prelude() + """,
tnt AS (SELECT n, min(t) AS t FROM (
          SELECT subj AS n, subj_type AS t FROM trip
          WHERE pred <> 'mentions'
          UNION ALL
          SELECT obj, obj_type FROM trip WHERE pred <> 'mentions')
        GROUP BY n),
tw AS (SELECT l.n2 AS a, l.n1 AS m, r.n2 AS b
       FROM und l JOIN und r ON r.n1 = l.n1 AND l.n2 <> r.n2)
SELECT ta.t AS type_a, tm.t AS type_mid, tb.t AS type_b,
       CAST(count(*) AS BIGINT) AS n_paths
FROM tw JOIN tnt ta ON ta.n = tw.a
JOIN tnt tm ON tm.n = tw.m
JOIN tnt tb ON tb.n = tw.b
GROUP BY 1, 2, 3
"""


def entity_density_sql() -> str:
    """Per-doc mention density twin of ``q_kg_entity_density``."""
    return corpus_prelude() + """,
edm AS (SELECT d, CAST(count(*) AS BIGINT) AS n_mentions
        FROM ments GROUP BY d),
edc AS (SELECT d, CAST(sum(length(sent_text)) AS BIGINT) AS n_chars
        FROM sents GROUP BY d)
SELECT printf('dict-%08d', edc.d) AS doc_id,
       CAST(coalesce(edm.n_mentions, 0) AS BIGINT) AS n_mentions,
       edc.n_chars,
       CAST(coalesce(edm.n_mentions, 0) * 1000000
            // greatest(edc.n_chars, 1) AS BIGINT) AS density_ppm
FROM edc LEFT JOIN edm ON edm.d = edc.d
"""


def entity_span_sql() -> str:
    """Entity lifespan twin of ``q_kg_entity_span``."""
    return corpus_prelude() + """
SELECT surface, printf('dict-%08d', min(d)) AS first_doc,
       printf('dict-%08d', max(d)) AS last_doc,
       CAST(count(DISTINCT d) AS BIGINT) AS n_docs
FROM ments GROUP BY surface
"""


def inferred_sql(pred_a: str = "works_at", pred_b: str = "located_in",
                 out_pred: str = "based_in") -> str:
    """Horn-rule composition twin of ``q_kg_inferred``."""
    return _triples_ctes() + f""",
idtr AS (SELECT DISTINCT subj, pred, obj FROM trip)
SELECT DISTINCT a.subj, '{out_pred}' AS pred, b.obj
FROM idtr a JOIN idtr b ON b.subj = a.obj
WHERE a.pred = '{pred_a}' AND b.pred = '{pred_b}'
"""


def reciprocity_sql() -> str:
    """Per-pred reciprocity twin of ``q_kg_reciprocity``."""
    return _triples_ctes() + """,
rdtr AS (SELECT DISTINCT subj, pred, obj FROM trip
         WHERE pred <> 'mentions' AND subj <> obj),
rr AS (SELECT a.pred, CAST(count(*) AS BIGINT) AS n_reciprocal
       FROM rdtr a JOIN rdtr b ON b.pred = a.pred
        AND b.subj = a.obj AND b.obj = a.subj
       GROUP BY 1),
re AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_edges
       FROM rdtr GROUP BY 1)
SELECT re.pred, re.n_edges,
       CAST(coalesce(rr.n_reciprocal, 0) AS BIGINT) AS n_reciprocal,
       CAST(coalesce(rr.n_reciprocal, 0) * 1000000
            // greatest(re.n_edges, 1) AS BIGINT) AS reciprocity_ppm
FROM re LEFT JOIN rr ON rr.pred = re.pred
"""


def type_conflicts_sql() -> str:
    """Type-conflict twin of ``q_kg_type_conflicts``."""
    return corpus_prelude() + """,
tcp AS (SELECT DISTINCT surface, etype FROM ments)
SELECT surface, CAST(count(*) AS BIGINT) AS n_types,
       min(etype) AS type_min, max(etype) AS type_max
FROM tcp GROUP BY surface
"""


def mean_dist_sql(n_seeds: int = 5, max_hops: int = 4) -> str:
    """Aggregate twin of ``q_kg_mean_dist`` over the BFS levels."""
    body = bfs_levels_sql(n_seeds=n_seeds, max_hops=max_hops)
    return f"""WITH lv AS ({body})
SELECT CAST(count(*) AS BIGINT) AS n_reached,
       CAST(coalesce(sum(dist), 0) AS BIGINT) AS sum_dist,
       CAST(coalesce(sum(dist), 0) * 1000
            // greatest(count(*), 1) AS BIGINT) AS mean_dist_milli
FROM lv
"""


def bowtie_sql(max_hops: int = 6) -> str:
    """Recursive-CTE twin of :func:`kgforge.functions.graph.bowtie_ds`:
    forward and backward hop-bounded walks from the lexicographically
    smallest node over the DIRECTED distinct-pair graph (self-loops
    dropped, matching the engine's pair table), then a flag-join class
    census."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    return prelude + f""",
dprs AS (SELECT DISTINCT s, d FROM prs WHERE s <> d),
bnodes AS (SELECT DISTINCT n FROM (
             SELECT s AS n FROM dprs UNION ALL SELECT d FROM dprs)),
bseed AS (SELECT n FROM bnodes ORDER BY n LIMIT 1),
fwd(node, dd) AS (
  SELECT n, 0 FROM bseed
  UNION
  SELECT p.d, fwd.dd + 1 FROM fwd JOIN dprs p ON p.s = fwd.node
  WHERE fwd.dd < {max_hops}),
bwd(node, dd) AS (
  SELECT n, 0 FROM bseed
  UNION
  SELECT p.s, bwd.dd + 1 FROM bwd JOIN dprs p ON p.d = bwd.node
  WHERE bwd.dd < {max_hops}),
fs AS (SELECT DISTINCT node FROM fwd),
bs AS (SELECT DISTINCT node FROM bwd)
SELECT CASE WHEN fs.node IS NOT NULL AND bs.node IS NOT NULL THEN 'scc'
            WHEN fs.node IS NOT NULL THEN 'out'
            WHEN bs.node IS NOT NULL THEN 'in'
            ELSE 'other' END AS cls,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM bnodes n
LEFT JOIN fs ON fs.node = n.n
LEFT JOIN bs ON bs.node = n.n
GROUP BY 1
"""


def hub_knockout_sql(k: int = 5) -> str:
    """Twin of :func:`kgforge.functions.graph.hub_knockout_ds`: hubs =
    top-k by distinct-neighbor degree (degree DESC, node ASC), then the
    recursive-closure component census before and after the knockout."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    return prelude + f""",
degq AS (SELECT n1 AS node, CAST(count(*) AS BIGINT) AS degree
         FROM und GROUP BY 1),
hubs AS (SELECT node FROM degq ORDER BY degree DESC, node LIMIT {k}),
und2 AS (SELECT n1, n2 FROM und
         WHERE n1 NOT IN (SELECT node FROM hubs)
           AND n2 NOT IN (SELECT node FROM hubs)),
r1(node, lab) AS (
  SELECT n1, n1 FROM und
  UNION
  SELECT r.node, u.n2 FROM r1 r JOIN und u ON u.n1 = r.lab),
c1 AS (SELECT node, min(lab) AS component FROM r1 GROUP BY node),
s1 AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
       FROM c1 GROUP BY 1),
r2(node, lab) AS (
  SELECT n1, n1 FROM und2
  UNION
  SELECT r.node, u.n2 FROM r2 r JOIN und2 u ON u.n1 = r.lab),
c2 AS (SELECT node, min(lab) AS component FROM r2 GROUP BY node),
s2 AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
       FROM c2 GROUP BY 1)
SELECT 'pre' AS phase,
       CAST((SELECT count(*) FROM c1) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM und WHERE n1 < n2) AS BIGINT)
           AS n_pairs,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_components,
       CAST(coalesce((SELECT max(sz) FROM s1), 0) AS BIGINT) AS largest
UNION ALL
SELECT 'post',
       CAST((SELECT count(*) FROM c2) AS BIGINT),
       CAST((SELECT count(*) FROM und2 WHERE n1 < n2) AS BIGINT),
       CAST((SELECT count(*) FROM s2) AS BIGINT),
       CAST(coalesce((SELECT max(sz) FROM s2), 0) AS BIGINT)
"""


def densification_sql() -> str:
    """Twin of :func:`kgforge.functions.graph.densification_ds`: edge
    and node first-arrival deciles over the entity-graph triple stream
    (``mentions`` provenance edges excluded), cumulative via a window
    sum over the dense 0-9 decile axis."""
    return _triples_ctes() + """,
eF AS (SELECT subj, obj,
              min(CAST(substring(doc_id, 6) AS BIGINT)) AS num
       FROM trip WHERE pred <> 'mentions' GROUP BY 1, 2),
nF AS (SELECT node, min(num) AS num FROM (
         SELECT subj AS node, num FROM eF
         UNION ALL SELECT obj, num FROM eF) GROUP BY 1),
nd AS (SELECT count(*) AS n FROM documents),
ed AS (SELECT least(num * 10 // nd.n, 9) AS decile,
              CAST(count(*) AS BIGINT) AS e
       FROM eF, nd GROUP BY 1),
nh AS (SELECT least(num * 10 // nd.n, 9) AS decile,
              CAST(count(*) AS BIGINT) AS nn
       FROM nF, nd GROUP BY 1),
dec AS (SELECT unnest(generate_series(0, 9)) AS decile)
SELECT CAST(d.decile AS BIGINT) AS decile,
       CAST(coalesce(ed.e, 0) AS BIGINT) AS new_edges,
       CAST(sum(coalesce(ed.e, 0)) OVER (ORDER BY d.decile)
            AS BIGINT) AS cum_edges,
       CAST(coalesce(nh.nn, 0) AS BIGINT) AS new_nodes,
       CAST(sum(coalesce(nh.nn, 0)) OVER (ORDER BY d.decile)
            AS BIGINT) AS cum_nodes
FROM dec d LEFT JOIN ed ON ed.decile = d.decile
LEFT JOIN nh ON nh.decile = d.decile
"""


def triad_census_sql() -> str:
    """Twin of :func:`kgforge.functions.graph.triad_census_ds`: the
    same directed wedge table joined against the pair set for the two
    closing-edge patterns; cycles counted at all three rotations ÷ 3."""
    return entity_pairs_prelude() + """,
dprs AS (SELECT DISTINCT s, d FROM prs WHERE s <> d),
w AS (SELECT i.s AS a, i.d AS b, o.d AS c
      FROM dprs i JOIN dprs o ON o.s = i.d AND o.d <> i.s)
SELECT 'cycle' AS motif,
       CAST((SELECT count(*) FROM w
             JOIN dprs e ON e.s = w.c AND e.d = w.a) // 3
            AS BIGINT) AS n
UNION ALL
SELECT 'ffl',
       CAST((SELECT count(*) FROM w
             JOIN dprs e ON e.s = w.a AND e.d = w.c) AS BIGINT)
"""


def linkpred_auc_sql(holdout_mod: int = 5) -> str:
    """Held-out common-neighbor link-prediction AUC — twin of
    :func:`kgforge.functions.graph.linkpred_auc_ds` (same md5
    first-8-hex-chars holdout grid, same candidate protocol, same
    exact Mann–Whitney histogram fold)."""
    return entity_pairs_prelude() + f""",
canon AS (SELECT n1, n2 FROM und WHERE n1 < n2),
lab AS (SELECT n1, n2,
               CAST(concat('0x', substr(md5(n1 || chr(31) || n2),
                                        1, 8)) AS UBIGINT)
                   % {holdout_mod} = 0 AS is_test
        FROM canon),
tr AS (SELECT n1, n2 FROM lab WHERE NOT is_test),
trund AS (SELECT n1, n2 FROM tr
          UNION ALL SELECT n2 AS n1, n1 AS n2 FROM tr),
w AS (SELECT l.n2 AS a, r.n2 AS b FROM trund l
      JOIN trund r ON r.n1 = l.n1 AND l.n2 < r.n2),
cnt AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn
        FROM w GROUP BY 1, 2),
nonadj AS (SELECT cnt.a, cnt.b, cnt.cn FROM cnt
           WHERE NOT EXISTS (SELECT 1 FROM tr u
                             WHERE u.n1 = cnt.a AND u.n2 = cnt.b)),
posall AS (SELECT n1 AS a, n2 AS b FROM lab WHERE is_test),
poss AS (SELECT coalesce(cn.cn, 0) AS s FROM posall
         LEFT JOIN nonadj cn
             ON cn.a = posall.a AND cn.b = posall.b),
negs AS (SELECT cn AS s FROM nonadj
         WHERE NOT EXISTS (SELECT 1 FROM posall p
                           WHERE p.a = nonadj.a
                             AND p.b = nonadj.b)),
ph AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM poss GROUP BY 1),
nh AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM negs GROUP BY 1),
dom AS (SELECT DISTINCT s FROM
            (SELECT s FROM ph UNION ALL SELECT s FROM nh)),
grid AS (SELECT d.s, coalesce(p.c, 0) AS pc_, coalesce(q.c, 0) AS nc_
         FROM dom d LEFT JOIN ph p ON p.s = d.s
         LEFT JOIN nh q ON q.s = d.s),
wd AS (SELECT s, pc_, nc_,
              coalesce(sum(nc_) OVER (ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cumn
       FROM grid)
SELECT CAST(sum(pc_) AS BIGINT) AS n_pos,
       CAST(sum(nc_) AS BIGINT) AS n_neg,
       CAST(sum(CASE WHEN s = 0 THEN pc_ ELSE 0 END) AS BIGINT)
           AS n_pos_zero,
       CAST(sum(pc_ * (2 * cumn + nc_)) AS BIGINT) AS u2,
       CAST(sum(pc_ * (2 * cumn + nc_)) * 1000000
            // (2 * sum(pc_) * sum(nc_)) AS BIGINT) AS auc_micro
FROM wd
"""


def widest_sql(n_seeds: int = 4, max_hops: int = 4) -> str:
    """Level-unrolled twin of
    :func:`kgforge.functions.graph.widest_paths_ds`: seeds = the
    ``n_seeds`` lexicographically smallest nodes of the sentence
    co-mention graph at sentinel width 2⁴⁰, then ``max_hops`` rounds
    of the max-min relax ``w(v) ← greatest(w(v), max over edges
    (u,v) of least(w(u), weight))``; non-seed nodes with positive
    width, node ASC."""
    steps = []
    for k in range(max_hops):
        steps.append(f""",
wx{k + 1} AS (SELECT cur.n AS n,
              greatest(cur.wd,
                       coalesce(max(least(p.wd, e.w)), 0)) AS wd
          FROM wx{k} cur
          LEFT JOIN wpr e ON e.n2 = cur.n
          LEFT JOIN wx{k} p ON p.n = e.n1
          GROUP BY cur.n, cur.wd)""")
    return cooccur_sql().replace(
        "SELECT a, b, n_sents FROM pr", f""",
wpr AS (SELECT a AS n1, b AS n2, CAST(n_sents AS BIGINT) AS w FROM pr
        UNION ALL
        SELECT b, a, CAST(n_sents AS BIGINT) FROM pr),
wnodes AS (SELECT DISTINCT n1 AS n FROM wpr),
wseeds AS (SELECT n FROM wnodes ORDER BY n LIMIT {n_seeds}),
wx0 AS (SELECT n,
               CAST(CASE WHEN n IN (SELECT n FROM wseeds)
                    THEN 1099511627776 ELSE 0 END AS BIGINT) AS wd
        FROM wnodes){"".join(steps)}
SELECT n AS node, CAST(wd AS BIGINT) AS width
FROM wx{max_hops}
WHERE wd > 0 AND n NOT IN (SELECT n FROM wseeds)
ORDER BY node
""")


def mutual_reach_sql(n_seeds: int = 4, max_hops: int = 4) -> str:
    """Recursive-CTE twin of
    :func:`kgforge.functions.graph.mutual_reach_ds`: seeds = the
    ``n_seeds`` smallest nodes of the DIRECTED entity graph; a node
    is emitted when the seed reaches it forward AND backward within
    ``max_hops`` directed hops."""
    prelude = entity_pairs_prelude().replace("\nWITH jj",
                                             "\nWITH RECURSIVE jj", 1)
    return prelude + f""",
dprs AS (SELECT s, d FROM prs WHERE s <> d),
dnodes AS (SELECT DISTINCT n FROM (
             SELECT s AS n FROM dprs
             UNION ALL SELECT d FROM dprs)),
dseeds AS (SELECT n FROM dnodes ORDER BY n LIMIT {n_seeds}),
mfwd(seed, node, dh) AS (
  SELECT n, n, 0 FROM dseeds
  UNION
  SELECT mfwd.seed, p.d, mfwd.dh + 1
  FROM mfwd JOIN dprs p ON p.s = mfwd.node
  WHERE mfwd.dh < {max_hops}),
mbwd(seed, node, dh) AS (
  SELECT n, n, 0 FROM dseeds
  UNION
  SELECT mbwd.seed, p.s, mbwd.dh + 1
  FROM mbwd JOIN dprs p ON p.d = mbwd.node
  WHERE mbwd.dh < {max_hops})
SELECT f.seed, f.node
FROM (SELECT DISTINCT seed, node FROM mfwd) f
JOIN (SELECT DISTINCT seed, node FROM mbwd) b
  ON b.seed = f.seed AND b.node = f.node
WHERE f.node <> f.seed
ORDER BY f.seed, f.node
"""


def pred_pairs_sql() -> str:
    """Twin of ``q_kg_pred_pairs`` — distinct (subj, pred) pairs from
    the pre-dedup triple stream, unordered predicate pairs per
    subject (a < b), counted over subjects."""
    return _triples_ctes() + """,
sp AS (SELECT DISTINCT subj, pred FROM trip)
SELECT p1.pred AS pred_a, p2.pred AS pred_b,
       CAST(count(*) AS BIGINT) AS n_subjects
FROM sp p1 JOIN sp p2
  ON p1.subj = p2.subj AND p1.pred < p2.pred
GROUP BY 1, 2
"""


def pred_obj_entropy_sql() -> str:
    """Twin of ``q_kg_pred_obj_entropy`` — per-predicate object
    entropy on the shared L grid over the pre-dedup triple stream."""
    return _triples_ctes() + """,
po AS (SELECT pred, obj, CAST(count(*) AS BIGINT) AS c
       FROM trip GROUP BY 1, 2),
np_ AS (SELECT pred, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS nobj
        FROM po GROUP BY 1),
t AS (SELECT po.pred,
             CAST(sum(po.c
                  * (CAST(floor(ln(np_.n) * 1000000 + 0.5) AS BIGINT)
                     - CAST(floor(ln(po.c) * 1000000 + 0.5)
                            AS BIGINT))) AS BIGINT) AS s
      FROM po JOIN np_ USING (pred) GROUP BY 1)
SELECT t.pred, np_.nobj AS n_objects, np_.n AS n_triples,
       CASE WHEN t.s >= 0 THEN t.s // np_.n
            ELSE -((-t.s) // np_.n) END AS h_micro
FROM t JOIN np_ USING (pred) ORDER BY pred
"""


def doc_yield_sql() -> str:
    """Twin of ``q_kg_doc_yield``."""
    return _triples_ctes() + """,
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
nm AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n FROM ments),
nt AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM trip)
SELECT nd.n AS n_docs, nm.n AS docs_with_mentions,
       nt.n AS docs_with_triples,
       nm.n * 1000000 // nd.n AS mention_yield_ppm,
       nt.n * 1000000 // nd.n AS triple_yield_ppm
FROM nd, nm, nt
"""


def support_stats_sql() -> str:
    """Twin of ``q_kg_support_stats`` (deduped edges, lower median)."""
    return _triples_ctes() + """,
e AS (SELECT subj, pred, obj,
             CAST(sum(support) AS BIGINT) AS support
      FROM trip GROUP BY 1, 2, 3),
r AS (SELECT pred, support,
             row_number() OVER (PARTITION BY pred
                                ORDER BY support) AS rn,
             count(*) OVER (PARTITION BY pred) AS ne
      FROM e)
SELECT pred, CAST(max(ne) AS BIGINT) AS n_edges,
       CAST(sum(support) AS BIGINT) AS total_support,
       CAST(max(support) AS BIGINT) AS max_support,
       CAST(max(CASE WHEN rn = (ne + 1) // 2 THEN support END)
            AS BIGINT) AS median_support
FROM r GROUP BY pred ORDER BY pred
"""


def multi_pred_pairs_sql() -> str:
    """Twin of ``q_kg_multi_pred_pairs``."""
    return _triples_ctes() + """,
e AS (SELECT DISTINCT subj, pred, obj FROM trip),
pc_ AS (SELECT subj, obj, CAST(count(*) AS BIGINT) AS np
        FROM e GROUP BY 1, 2)
SELECT np AS n_preds, CAST(count(*) AS BIGINT) AS n_pairs
FROM pc_ GROUP BY 1 ORDER BY n_preds
"""


def sent_yield_sql() -> str:
    """Twin of ``q_kg_sent_yield`` (zero bucket from the sentence
    stream)."""
    return _triples_ctes() + """,
ps AS (SELECT doc_id, sent_idx, CAST(count(*) AS BIGINT) AS nt
       FROM trip GROUP BY 1, 2),
h AS (SELECT nt AS n_triples, CAST(count(*) AS BIGINT) AS n_sents
      FROM ps GROUP BY 1),
z AS (SELECT CAST(0 AS BIGINT) AS n_triples,
             (SELECT CAST(count(*) AS BIGINT) FROM sents)
                 - (SELECT CAST(coalesce(sum(n_sents), 0) AS BIGINT)
                    FROM h) AS n_sents)
SELECT * FROM z UNION ALL SELECT * FROM h ORDER BY n_triples
"""


def surface_len_stats_sql() -> str:
    """Twin of ``q_kg_surface_len_stats`` (node table = distinct
    surfaces with min-etype, as in nodes_sql)."""
    return corpus_prelude() + """,
nodes AS (SELECT surface, min(etype) AS etype
          FROM ments GROUP BY surface)
SELECT etype, CAST(count(*) AS BIGINT) AS n_surfaces,
       CAST(sum(length(surface)) * 1000000 // count(*) AS BIGINT)
           AS mean_len_ppm,
       CAST(min(length(surface)) AS BIGINT) AS min_len,
       CAST(max(length(surface)) AS BIGINT) AS max_len
FROM nodes GROUP BY 1 ORDER BY etype
"""
