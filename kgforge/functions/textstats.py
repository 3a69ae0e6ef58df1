"""Text analysis over a ``documents``-shaped table (doc_id, text, ...).

All per-batch work is vectorized: ``pyarrow.compute`` regex kernels for
counting (``count_substring_regex`` — no Python loop over chars), with
one cheap per-row pass only where a hash digest is inherently per-row
(md5 fingerprint).  Designed as stateless ``map_batches`` stages —
at 100 TB these run embarrassingly parallel with zero shuffle.

DuckDB-oracle parity: every output column is either an integer count,
an md5 hex digest, or an arithmetic expression rounded to a fixed
number of decimals, so the driver's value-hash comparison is exact.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Regexes shared verbatim with the SQL oracles (__ray_entry__.py).
TOKEN_RE = r"\S+"
PUNCT_RE = r"[^a-zA-Z0-9\s]"
DIGIT_RE = r"[0-9]"
UPPER_RE = r"[A-Z]"

# Tiny closed stopword list for the language-ID heuristic + quality
# scoring.  Chosen to be SQL-expressible (plain word-boundary counts).
STOPWORDS = ("the", "a", "of", "and", "data")


def _count_re(col: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    return pc.count_substring_regex(col, pattern=pattern)


def token_stats(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Per-document token/char counts → (doc_id, n_tokens, n_punct,
    n_digits, n_upper, n_chars_m).  Integer-only output."""
    text = batch[text_col]
    return pa.table({
        id_col: batch[id_col],
        "n_tokens": pc.cast(_count_re(text, TOKEN_RE), pa.int64()),
        "n_punct": pc.cast(_count_re(text, PUNCT_RE), pa.int64()),
        "n_digits": pc.cast(_count_re(text, DIGIT_RE), pa.int64()),
        "n_upper": pc.cast(_count_re(text, UPPER_RE), pa.int64()),
        "n_chars_m": pc.cast(pc.utf8_length(text), pa.int64()),
    })


BPE_ALPHA_RE = r"[A-Za-z]+"
BPE_NUM_RE = r"[0-9]+"
BPE_OTHER_RE = r"[^A-Za-z0-9\s]+"


def bpe_token_stats(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """GPT-2-style pre-tokenizer counts: maximal runs of letters,
    digits, and non-alphanumeric symbols (the three classes a BPE
    pre-tokenizer splits on before merges).  ``n_bpe_tokens`` is their
    sum — a closer LLM token-cost proxy than whitespace words (code
    and punctuation-dense text fan out into many BPE pieces).  Both
    engines run the identical RE2 patterns (pyarrow
    ``count_substring_regex`` / DuckDB ``regexp_extract_all``), so the
    counts are value-exact.  Pure map stage: zero shuffle."""
    text = batch[text_col]
    n_alpha = pc.cast(_count_re(text, BPE_ALPHA_RE), pa.int64())
    n_num = pc.cast(_count_re(text, BPE_NUM_RE), pa.int64())
    n_other = pc.cast(_count_re(text, BPE_OTHER_RE), pa.int64())
    total = pc.add(pc.add(n_alpha, n_num), n_other)
    return pa.table({
        id_col: batch[id_col],
        "n_alpha_runs": n_alpha,
        "n_num_runs": n_num,
        "n_other_runs": n_other,
        "n_bpe_tokens": pc.cast(total, pa.int64()),
    })


def quality_score(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Heuristic quality components per document.

    (doc_id, n_tokens, n_stopwords, mean_token_len, stopword_ratio) —
    ratios rounded to 4 decimals; formula mirrored exactly in the SQL
    oracle.  A real pipeline thresholds on these to drop junk docs.
    """
    text = batch[text_col]
    n_tokens = pc.cast(_count_re(text, TOKEN_RE), pa.int64())
    n_stop = pc.cast(_count_re(
        text, r"\b(" + "|".join(STOPWORDS) + r")\b"), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    from kgforge.common.hashing import round_away

    nt = np.maximum(n_tokens.to_numpy(zero_copy_only=False), 1).astype(np.float64)
    mean_tok = round_away(n_chars.to_numpy(zero_copy_only=False) / nt, 4)
    stop_ratio = round_away(
        n_stop.to_numpy(zero_copy_only=False).astype(np.float64) / nt, 4)
    return pa.table({
        id_col: batch[id_col],
        "n_tokens": n_tokens,
        "n_stopwords": n_stop,
        "mean_token_len": pa.array(mean_tok, pa.float64()),
        "stopword_ratio": pa.array(stop_ratio, pa.float64()),
    })


def lang_id(batch: pa.Table, text_col: str = "text",
            id_col: str = "doc_id") -> pa.Table:
    """Deterministic function-word language-ID heuristic.

    Scores each document by counts of closed function-word sets; the
    decision rule (argmax with fixed precedence en > de > es > unk) is
    deliberately SQL-expressible so the driver can verify it exactly.
    """
    text = batch[text_col]
    n_en = _count_re(text, r"\b(the|of|and)\b").to_numpy(zero_copy_only=False)
    n_de = _count_re(text, r"\b(der|die|und)\b").to_numpy(zero_copy_only=False)
    n_es = _count_re(text, r"\b(el|la|los)\b").to_numpy(zero_copy_only=False)
    pred = np.where(
        (n_en >= n_de) & (n_en >= n_es) & (n_en > 0), "en",
        np.where((n_de >= n_es) & (n_de > 0), "de",
                 np.where(n_es > 0, "es", "unk")))
    return pa.table({
        id_col: batch[id_col],
        "pred_lang": pa.array(pred.tolist(), pa.string()),
        "n_en": pa.array(n_en.astype(np.int64)),
        "n_de": pa.array(n_de.astype(np.int64)),
        "n_es": pa.array(n_es.astype(np.int64)),
    })


def fingerprint(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Content fingerprints: md5 hex (exact-dedup key, matches DuckDB
    ``md5()``) + a 64-bit rolling (Karp-Rabin) hash for chunk-level
    dedup.  md5 is the cross-system-verifiable digest; the rolling hash
    is the cheap streaming fingerprint."""
    from kgforge.common.hashing import md5_hex_arr

    texts = batch[text_col].to_pylist()
    fps = md5_hex_arr(pc.fill_null(batch[text_col], ""))
    rolling = [_rolling_hash(t or "") for t in texts]
    return pa.table({
        id_col: batch[id_col],
        "fp_md5": fps,
        "fp_rolling": pa.array(rolling, pa.uint64()),
    })


_ROLL_BASE = np.uint64(1000003)


def _rolling_hash(text: str) -> int:
    """Karp-Rabin over utf-8 bytes, vectorized via cumulative powers."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if data.size == 0:
        return 0
    with np.errstate(over="ignore"):
        n = data.size
        # h = sum(b[i] * BASE^(n-1-i)) mod 2^64, computed by Horner in
        # chunks would be serial; use powers table instead (vector mult)
        powers = np.empty(n, dtype=np.uint64)
        powers[0] = 1
        if n > 1:
            np.multiply.accumulate(
                np.full(n - 1, _ROLL_BASE, dtype=np.uint64), out=powers[1:])
        return int((data[::-1].astype(np.uint64) * powers).sum(dtype=np.uint64))


# Closed benchmark-contamination n-gram set (word trigrams).  A real
# decontamination pass holds millions of eval-set n-grams; the Ray
# plumbing is identical — broadcast the set once (ray.put / module
# constant shipped with the task) and scan each batch vectorized.  At
# that scale swap the per-pattern substring loop for one Aho-Corasick
# automaton built once per actor (__init__), or a bloom filter over
# document shingles; the per-doc output contract stays the same.
CONTAM_NGRAMS = (
    "hash value table",
    "agg join small",
    "row fast merge",
    "window the row",
    "data column agg",
    "slow filter value",
)


def decontaminate(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Benchmark decontamination scan: per document, how many of the
    known eval-set n-grams appear (``n_contam``) and whether the doc
    should be dropped from training data (``contaminated``, 0/1).
    One vectorized plain-substring scan per pattern — no regex, no
    per-row Python.  Integer-only output (exact oracle parity)."""
    text = batch[text_col]
    hits = np.zeros(batch.num_rows, dtype=np.int64)
    for pat in CONTAM_NGRAMS:
        present = pc.greater(pc.count_substring(text, pattern=pat), 0)
        hits += present.to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        id_col: batch[id_col],
        "n_contam": pa.array(hits),
        "contaminated": pa.array((hits > 0).astype(np.int64)),
    })


def doc_frequency_ds(ds, k: int = 25, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Document-frequency top-k (the IDF table of TF-IDF): for each
    term, in how many documents does it appear at least once.

    Scale shape: per-batch the (term, doc) pairs are made distinct and
    counted (arrow ``group_by`` — a document is exactly one row, so
    within-row distinct IS per-document distinct), so only
    ``≤ vocab`` partial rows per batch reach the global
    ``groupby(term).sum`` — the shuffle moves term counts, never
    tokens.  Deterministic tie-break (df desc, term asc) so the
    top-k boundary is stable across engines."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.fill_null(b[text_col], ""), r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        t = pa.table({"term": flat.filter(mask), "d": par.filter(mask)})
        dd = t.group_by(["term", "d"], use_threads=False).aggregate([])
        col = dd["term"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = col.value_counts()
        return pa.table({"term": vc.field("values"),
                         "df": vc.field("counts").cast(pa.int64())})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df", alias_name="df"))
    return counts.sort(["df", "term"], descending=[True, False]).limit(k)


def decontaminate_ds(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: decontaminate(b, text_col, id_col),
        batch_format="pyarrow")


# Redaction pattern list (name, RE2 pattern).  Email/long-digit-run are
# the realistic PII shapes; the closed term list stands in for a
# customer-supplied blocklist.  RE2 semantics are identical in pyarrow
# and DuckDB regexp_replace, so the SQL twin is generated from this
# same constant (driver_queries) and the engines cannot drift.
REDACT_PATTERNS = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"),
    ("digit_run", r"\b[0-9][0-9 -]{6,}[0-9]\b"),
    ("blockterm", r"\b(spark|secret)\b"),
)
REDACT_TOKEN = "[REDACTED]"


def redact(batch: pa.Table, text_col: str = "text",
           id_col: str = "doc_id") -> pa.Table:
    """PII / blocklist redaction: count matches of each pattern on the
    original text, then strip them all (sequential ``replace``, same
    order as the SQL twin's nested ``regexp_replace``).  Returns
    (doc_id, n_redact, clean_md5) — the digest of the scrubbed text is
    the cross-engine-verifiable witness that the rewrite is identical.
    Pure map stage: zero shuffle at any scale."""
    text = batch[text_col]
    n = np.zeros(batch.num_rows, dtype=np.int64)
    for _, pat in REDACT_PATTERNS:
        n += pc.count_substring_regex(text, pattern=pat) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
    clean = text
    for _, pat in REDACT_PATTERNS:
        clean = pc.replace_substring_regex(clean, pattern=pat,
                                           replacement=REDACT_TOKEN)
    from kgforge.common.hashing import md5_hex_arr

    digests = md5_hex_arr(pc.fill_null(clean, ""))
    return pa.table({
        id_col: batch[id_col],
        "n_redact": pa.array(n),
        "clean_md5": digests,
    })


def repetition_ratio(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """C4-style repetition quality signals per document: token count,
    distinct-token count, the most-frequent token's count, and the
    derived dup/top ratios (round 4).  A training-data filter drops
    docs above a dup_ratio threshold.  Vectorized: one split, one
    arrow ``group_by`` over (row, term) — no per-row Python loop.
    Pure map stage (the group_by is batch-local, not a shuffle)."""
    from kgforge.common.hashing import round_away

    toks = pc.split_pattern_regex(pc.fill_null(batch[text_col], ""), r"\s+")
    flat = pc.list_flatten(toks)
    par = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    t = pa.table({"par": par.filter(mask), "term": flat.filter(mask)})
    tc = t.group_by(["par", "term"], use_threads=False) \
        .aggregate([("term", "count")])
    rows = tc["par"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = tc["term_count"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_rows = batch.num_rows
    n_tok = np.bincount(rows, weights=cnts, minlength=n_rows).astype(np.int64)
    n_dis = np.bincount(rows, minlength=n_rows).astype(np.int64)
    top = np.zeros(n_rows, dtype=np.int64)
    np.maximum.at(top, rows, cnts)
    denom = np.maximum(n_tok, 1).astype(np.float64)
    return pa.table({
        id_col: batch[id_col],
        "n_tokens": pa.array(n_tok),
        "n_distinct": pa.array(n_dis),
        "top_n": pa.array(top),
        "dup_ratio": pa.array(round_away(1.0 - n_dis / denom, 4),
                              pa.float64()),
        "top_frac": pa.array(round_away(top / denom, 4), pa.float64()),
    })


def redact_ds(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(lambda b: redact(b, text_col, id_col),
                          batch_format="pyarrow")


def repetition_ratio_ds(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(lambda b: repetition_ratio(b, text_col, id_col),
                          batch_format="pyarrow")


def type_token_ratio(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Per-document lexical-diversity signal: whitespace-token count,
    DISTINCT-token count and their exact integer ratio in ppm
    (``n_types * 1_000_000 // n_tokens``) — a standard low-quality /
    boilerplate gate (near-zero TTR = heavy repetition).  Pure map,
    zero shuffle; split + flatten are Arrow kernels and the per-doc
    distinct count is one global ``np.unique`` over integer token
    codes (EXACT — no hash stands in for the token, so the SQL twin's
    ``count(DISTINCT tok)`` matches bit-for-bit).  Tokenization is
    ``split(' ')``, verbatim the twin's ``string_split(text, ' ')``
    (both yield one empty token for an empty document, so n_tokens
    ≥ 1 always)."""
    la = pc.split_pattern(
        pc.fill_null(batch[text_col], "").combine_chunks(), pattern=" ")
    lens = pc.list_value_length(la).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(la).to_numpy(zero_copy_only=False)
    if len(flat):
        uniq, inv = np.unique(flat, return_inverse=True)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        upair = np.unique(doc_idx * len(uniq) + inv)
        types = np.bincount(upair // len(uniq),
                            minlength=len(lens)).astype(np.int64)
    else:
        types = np.zeros(len(lens), np.int64)
    return pa.table({
        id_col: batch[id_col],
        "n_tokens": pa.array(lens, pa.int64()),
        "n_types": pa.array(types, pa.int64()),
        "ttr_ppm": pa.array(types * 1_000_000 // np.maximum(lens, 1),
                            pa.int64())})


def type_token_ratio_ds(ds, text_col: str = "text",
                        id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: type_token_ratio(b, text_col, id_col),
        batch_format="pyarrow")


def token_stats_ds(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: token_stats(b, text_col, id_col), batch_format="pyarrow")


def quality_score_ds(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: quality_score(b, text_col, id_col), batch_format="pyarrow")


def lang_id_ds(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: lang_id(b, text_col, id_col), batch_format="pyarrow")


def fingerprint_ds(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: fingerprint(b, text_col, id_col), batch_format="pyarrow")


def percentile_filter_ds(ds, q: float = 0.9, text_col: str = "text",
                         id_col: str = "doc_id"):
    """Corpus pruning by a global EXACT length percentile: keep
    documents whose token count is at or above the sorted element at
    index ``floor((N-1)·q)`` (the engine's standard quantile rule,
    shared with ``events.group_quantiles_ds`` and the SQL twin).

    Scale shape: the threshold comes from a value HISTOGRAM — per-batch
    (n_tokens → count) partials, one groupby over distinct counts
    (≤ max-doc-length rows, never documents), a tiny driver pick —
    then one broadcast filter pass.  No global sort."""
    import numpy as np
    from ray.data.aggregate import Sum

    def counts_partial(b: pa.Table) -> pa.Table:
        n = pc.cast(_count_re(b[text_col], TOKEN_RE), pa.int64())
        t = pa.table({"n_tokens": n})
        g = t.group_by(["n_tokens"], use_threads=False).aggregate(
            [("n_tokens", "count")])
        return pa.table({"n_tokens": g["n_tokens"],
                         "cnt": pc.cast(g["n_tokens_count"], pa.int64())})

    hist = ds.map_batches(counts_partial, batch_format="pyarrow") \
        .groupby("n_tokens").aggregate(Sum("cnt", alias_name="cnt")) \
        .take_all()
    hist.sort(key=lambda r: r["n_tokens"])
    cnts = np.array([r["cnt"] for r in hist], dtype=np.int64)
    cum = cnts.cumsum()
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:
        return ds.map_batches(
            lambda b: pa.table({id_col: b[id_col].slice(0, 0),
                                "n_tokens": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    idx = int(np.floor((total - 1) * q))
    pos = int(np.searchsorted(cum, idx + 1))
    threshold = int(hist[pos]["n_tokens"])

    def keep(b: pa.Table) -> pa.Table:
        n = pc.cast(_count_re(b[text_col], TOKEN_RE), pa.int64())
        mask = pc.greater_equal(n, threshold)
        return b.append_column("n_tokens", n).filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")

def value_deciles_ds(ds, value_col: str = "n_chars",
                     id_col: str = "doc_id", n_buckets: int = 10):
    """Equi-depth bucket label per row — ``floor(n_buckets · cnt_lt /
    N)`` where ``cnt_lt`` counts rows with a strictly smaller value —
    i.e. SQL's ``(rank() - 1) * n_buckets // N``.  Rank is value-based,
    so ties always share a bucket and the labels are deterministic
    under any row order (``ntile`` is not: it splits ties by physical
    order).

    Scale shape (same as :func:`percentile_filter_ds`): a value
    HISTOGRAM shuffles (distinct values, never rows), the cumulative
    rank table is a tiny broadcast, and the labeling pass is one
    vectorized ``searchsorted`` per batch.  The feature-binning
    primitive for curriculum/quality stratification."""
    import numpy as np
    from ray.data.aggregate import Sum

    def hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"v": pc.cast(b[value_col], pa.int64())})
        g = t.group_by(["v"], use_threads=False).aggregate(
            [("v", "count")])
        return pa.table({"v": g["v"],
                         "cnt": pc.cast(g["v_count"], pa.int64())})

    hist = ds.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("cnt", alias_name="cnt")).take_all()
    hist.sort(key=lambda r: r["v"])
    vals = np.array([r["v"] for r in hist], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in hist], dtype=np.int64)
    total = int(cnts.sum())
    cum_lt = np.concatenate([[0], np.cumsum(cnts)[:-1]]) \
        if len(cnts) else np.zeros(0, dtype=np.int64)
    labels = (cum_lt * n_buckets) // max(total, 1)

    def label(b: pa.Table) -> pa.Table:
        v = pc.cast(b[value_col], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vals, v)
        return pa.table({
            id_col: b[id_col],
            value_col: pa.array(v),
            "decile": pa.array(labels[pos].astype(np.int64)),
        })

    return ds.map_batches(label, batch_format="pyarrow")

def profile_columns_ds(ds, columns: list[str]):
    """Ingest-QA column profiler: per column — row count, null count,
    exact distinct count, min and max (stringified for a uniform
    output schema; ordering happens on the TYPED values before the
    cast, so integer columns compare numerically).

    Two small exchanges regardless of table width: (a) one stats row
    per column per batch (counts + typed min/max partials), (b) the
    distinct (column, value) pair stream — deduped per batch so only
    distinct pairs shuffle, counted per column after a global dedup.
    Rows never move."""
    import numpy as np
    from ray.data.aggregate import Count, Max, Min, Sum

    schema = ds.schema().base_schema
    is_num = {c: pa.types.is_integer(schema.field(c).type)
              for c in columns}

    def stats_partial(b: pa.Table) -> pa.Table:
        rows = {"column": [], "n_rows": [], "n_null": [],
                "min_num": [], "max_num": [], "min_str": [],
                "max_str": []}
        for c in columns:
            col = b[c]
            rows["column"].append(c)
            rows["n_rows"].append(b.num_rows)
            rows["n_null"].append(col.null_count)
            mm = pc.min_max(col)
            lo, hi = mm["min"], mm["max"]
            if is_num[c]:
                rows["min_num"].append(lo.as_py())
                rows["max_num"].append(hi.as_py())
                rows["min_str"].append(None)
                rows["max_str"].append(None)
            else:
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(lo.as_py())
                rows["max_str"].append(hi.as_py())
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "min_num": pa.array(rows["min_num"], pa.int64()),
            "max_num": pa.array(rows["max_num"], pa.int64()),
            "min_str": pa.array(rows["min_str"], pa.string()),
            "max_str": pa.array(rows["max_str"], pa.string()),
        })

    stats = ds.map_batches(stats_partial, batch_format="pyarrow") \
        .groupby("column").aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_null", alias_name="n_null"),
            Min("min_num", alias_name="min_num"),
            Max("max_num", alias_name="max_num"),
            Min("min_str", alias_name="min_str"),
            Max("max_str", alias_name="max_str"))

    def pairs_partial(b: pa.Table) -> pa.Table:
        parts = []
        for c in columns:
            v = pc.cast(b[c], pa.string())
            t = pa.table({"column": pa.array([c] * b.num_rows,
                                             pa.string()), "v": v})
            t = t.filter(pc.is_valid(t["v"]))
            parts.append(t.group_by(["column", "v"],
                                    use_threads=False).aggregate([]))
        return pa.concat_tables(parts)

    ndist = ds.map_batches(pairs_partial, batch_format="pyarrow") \
        .groupby(["column", "v"]).aggregate(Count(alias_name="__c")) \
        .map_batches(lambda b: b.select(["column"]),
                     batch_format="pyarrow") \
        .groupby("column").aggregate(Count(alias_name="n_distinct"))

    # both sides are |columns| rows — a driver-side zip is the join
    s = {r["column"]: r for r in stats.take_all()}
    d = {r["column"]: int(r["n_distinct"]) for r in ndist.take_all()}
    cols = sorted(s)
    return pa.table({
        "column": pa.array(cols, pa.string()),
        "n_rows": pa.array([int(s[c]["n_rows"]) for c in cols],
                           pa.int64()),
        "n_null": pa.array([int(s[c]["n_null"]) for c in cols],
                           pa.int64()),
        "n_distinct": pa.array([d.get(c, 0) for c in cols], pa.int64()),
        "min_val": pa.array(
            [str(s[c]["min_num"]) if s[c]["min_num"] is not None
             else s[c]["min_str"] for c in cols], pa.string()),
        "max_val": pa.array(
            [str(s[c]["max_num"]) if s[c]["max_num"] is not None
             else s[c]["max_str"] for c in cols], pa.string()),
    })


def budget_select_ds(ds, budget_num: int = 1, budget_den: int = 2,
                     text_col: str = "text", id_col: str = "doc_id"):
    """Token-budget corpus selection: keep the highest-quality prefix
    of the corpus — documents ordered by (score DESC, doc_id ASC) —
    whose cumulative token count stays within ``budget_num/budget_den``
    of the corpus total (exact integer arithmetic, so the budget is
    bit-identical to SQL's ``sum(n_tokens) * num // den`` at any
    corpus size — no float in the cut).  The "train on the best N tokens you can afford"
    selector; equivalent to SQL's
    ``QUALIFY sum(n_tokens) OVER (ORDER BY score DESC, doc_id) <= B``.

    Score = stopword micro-ratio ``n_stopwords · 10⁶ // max(n_tokens,
    1)`` — an integer, so score equality (and therefore the selection
    boundary) is exact, never a float tie.

    Scale shape (the global sort is eliminated): per-batch
    (score → Σtokens, count) partials → ONE groupby over ≤ 10⁶+1
    distinct scores (never documents) → driver cumsum picks the
    boundary score s* and the budget remainder → ONLY the s* score
    group (logged if degenerate) is collected to resolve the doc_id
    prefix → one broadcast filter pass.  Three passes over metadata,
    zero passes shuffling text."""
    import logging

    import numpy as np
    from ray.data.aggregate import Sum

    stop_re = r"\b(" + "|".join(STOPWORDS) + r")\b"

    def stats(b: pa.Table) -> pa.Table:
        nt = pc.cast(_count_re(b[text_col], TOKEN_RE), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ns = pc.cast(_count_re(b[text_col], stop_re), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        score = ns * 1_000_000 // np.maximum(nt, 1)
        return pa.table({id_col: b[id_col],
                         "score": pa.array(score, pa.int64()),
                         "n_tokens": pa.array(nt, pa.int64())})

    def hist_partial(b: pa.Table) -> pa.Table:
        t = stats(b).select(["score", "n_tokens"])
        g = t.group_by(["score"], use_threads=False).aggregate(
            [("n_tokens", "sum"), ("n_tokens", "count")])
        return pa.table({"score": g["score"],
                         "tok": pc.cast(g["n_tokens_sum"], pa.int64()),
                         "cnt": pc.cast(g["n_tokens_count"], pa.int64())})

    hist = ds.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("score").aggregate(Sum("tok", alias_name="tok"),
                                    Sum("cnt", alias_name="cnt")) \
        .take_all()
    hist.sort(key=lambda r: -r["score"])
    toks = np.array([r["tok"] for r in hist], dtype=np.int64)
    total = int(toks.sum()) if len(toks) else 0
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64())})
    if total == 0:
        return ds.map_batches(lambda b: empty, batch_format="pyarrow")
    budget = total * budget_num // budget_den
    cum = toks.cumsum()
    # first score-desc position whose full inclusion would overflow
    pos = int(np.searchsorted(cum, budget, side="right"))
    if pos >= len(hist):           # whole corpus fits the budget
        return ds.map_batches(stats, batch_format="pyarrow")
    s_star = int(hist[pos]["score"])
    remaining = budget - (int(cum[pos - 1]) if pos else 0)

    # resolve the doc_id-ordered prefix INSIDE the boundary score
    # group; only that one group is collected (small by construction —
    # one score value — but log if a degenerate corpus concentrates)
    if hist[pos]["cnt"] > 1_000_000:
        logging.getLogger(__name__).warning(
            "budget_select boundary score %d holds %d docs; driver "
            "resolves the prefix over all of them", s_star,
            hist[pos]["cnt"])
    def boundary_only(b: pa.Table) -> pa.Table:
        t = stats(b)
        return t.filter(pc.equal(t["score"], s_star))

    boundary = ds.map_batches(boundary_only,
                              batch_format="pyarrow").take_all()
    boundary.sort(key=lambda r: r[id_col])
    cutoff = None
    used = 0
    for r in boundary:
        if used + r["n_tokens"] > remaining:
            break
        used += r["n_tokens"]
        cutoff = r[id_col]

    def keep(b: pa.Table) -> pa.Table:
        t = stats(b)
        mask = pc.greater(t["score"], s_star)
        if cutoff is not None:
            mask = pc.or_(mask, pc.and_(
                pc.equal(t["score"], s_star),
                pc.less_equal(t[id_col], cutoff)))
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def compression_ratio_ds(ds, text_col: str = "text",
                         id_col: str = "doc_id", level: int = 6):
    """Per-document zlib compression ratio in exact integer ppm
    (``compressed_bytes × 10⁶ // raw_utf8_bytes``) — the
    Gopher/RefinedWeb-style redundancy signal: boilerplate and
    repetition compress far better than natural text, so a low ratio
    flags low-quality documents before training.  Deterministic (fixed
    zlib level); rows-only contract — DEFLATE is not expressible in
    SQL, so there is no value oracle (the unit test pins goldens).

    Scale shape: a pure map, zero shuffles; the per-batch loop is one
    C ``zlib.compress`` call per DOCUMENT (not per token) — the same
    altitude as a model-scoring actor stage."""
    import zlib

    def score(b: pa.Table) -> pa.Table:
        raws = [(t or "").encode("utf-8")
                for t in b[text_col].to_pylist()]
        ratios = np.array(
            [len(zlib.compress(r, level)) * 1_000_000 // max(len(r), 1)
             for r in raws], dtype=np.int64)
        return pa.table({
            id_col: b[id_col],
            "raw_bytes": pa.array(
                np.array([len(r) for r in raws], dtype=np.int64)),
            "ratio_ppm": pa.array(ratios)})

    return ds.map_batches(score, batch_format="pyarrow")


def oov_rate_ds(ds, vocab_k: int = 20, text_col: str = "text",
                group_col: str = "source") -> pa.Table:
    """Tokenizer-coverage report: per group, the share of token
    positions OUTSIDE the global top-``vocab_k`` vocabulary, in exact
    integer ppm → (group, total, oov, oov_ppm).  The gate run before
    committing to a fixed vocabulary / tokenizer.

    Scale shape: vocabulary from per-batch arrow value_counts partials
    + one token-keyed sum + the global top-k cut (the O1/O3 vocab
    pattern); the k winners broadcast via ``ray.put`` and the coverage
    pass is one vectorized ``pc.is_in`` map emitting per-batch
    (group, total, oov) partials — corpus rows never shuffle."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def vocab_partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.fill_null(b[text_col], ""), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    counts = ds.map_batches(vocab_partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n"))
    top = counts.sort(["n", "token"], descending=[True, False]) \
        .limit(vocab_k).to_pandas()
    vocab = pa.array(sorted(top["token"].tolist()), pa.string())
    ref = ray.put(vocab)

    def cover_partial(b: pa.Table, _ref=ref) -> pa.Table:
        vs = ray.get(_ref)
        split = pc.split_pattern_regex(pc.fill_null(b[text_col], ""),
                                       r"\s+")
        toks = pc.list_flatten(split)
        keep = pc.not_equal(toks, "")
        toks = toks.filter(keep)
        lens = pc.list_value_length(split).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # per-row non-empty token counts: subtract empties per row
        empt = np.zeros(len(lens), dtype=np.int64)
        if len(toks) != int(lens.sum()):
            # empties exist: recount per row the slow-but-rare way
            row_of = np.repeat(np.arange(len(lens)), lens)
            empt = np.bincount(
                row_of[~keep.to_numpy(zero_copy_only=False)],
                minlength=len(lens)).astype(np.int64)
        n_tok = lens - empt
        oov_mask = pc.invert(pc.is_in(toks, value_set=vs)) \
            .to_numpy(zero_copy_only=False)
        row_of_tok = np.repeat(np.arange(len(lens)), n_tok)
        oov_per_row = np.bincount(row_of_tok[oov_mask],
                                  minlength=len(lens)).astype(np.int64)
        t = pa.table({group_col: b[group_col],
                      "total": pa.array(n_tok),
                      "oov": pa.array(oov_per_row)})
        g = t.group_by([group_col], use_threads=False).aggregate(
            [("total", "sum"), ("oov", "sum")])
        return pa.table({group_col: g[group_col],
                         "total": g["total_sum"], "oov": g["oov_sum"]})

    parts = [t for t in ray.get(
        ds.map_batches(cover_partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_columns]
    if not parts:
        return pa.table({group_col: pa.array([], pa.string()),
                         "total": pa.array([], pa.int64()),
                         "oov": pa.array([], pa.int64()),
                         "oov_ppm": pa.array([], pa.int64())})
    flat = pa.concat_tables(parts).to_pandas()
    g = flat.groupby(group_col, as_index=False).sum()
    tot = g["total"].to_numpy(np.int64)
    oov = g["oov"].to_numpy(np.int64)
    return pa.table({
        group_col: pa.array(g[group_col], pa.string()),
        "total": pa.array(tot), "oov": pa.array(oov),
        "oov_ppm": pa.array(oov * 1_000_000 // np.maximum(tot, 1))})


def token_novelty_ds(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document novel-token count: a token is "novel" in the
    document with the SMALLEST id that contains it (first occurrence
    in corpus order) — the marginal-vocabulary-contribution signal for
    curriculum ordering and source triage.  Documents contributing no
    first-seen token are omitted (the SQL twin has no row for them).

    Scale shape: per-batch (term → min doc) partials (≤ batch-vocab
    rows) through ONE term-keyed Min; the per-doc count is a second
    keyed sum over ≤ |vocab| rows.  Tokens shuffle once as (term, id)
    partials — text never moves, nothing is broadcast."""
    from ray.data.aggregate import Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.fill_null(b[text_col], ""),
                                      r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        ids = b[id_col].combine_chunks().take(par.filter(mask))
        t = pa.table({"term": flat.filter(mask), id_col: ids})
        g = t.group_by("term", use_threads=False).aggregate(
            [(id_col, "min")])
        return g.rename_columns(["term", id_col])

    first = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Min(id_col, alias_name=id_col))

    def count_partial(b: pa.Table) -> pa.Table:
        col = b[id_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = col.value_counts()
        return pa.table({id_col: vc.field("values"),
                         "novel_terms": vc.field("counts")
                         .cast(pa.int64())})

    return first.map_batches(count_partial, batch_format="pyarrow") \
        .groupby(id_col) \
        .aggregate(Sum("novel_terms", alias_name="novel_terms")) \
        .sort(id_col)


def vocab_growth_ds(ds, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Heaps-law vocabulary growth curve: new and cumulative distinct
    terms per decile of the doc-id range — the tokenizer-sizing /
    curriculum signal ("is vocabulary still growing at the end of the
    corpus?").

    Scale shape: the token_novelty first-occurrence table ((term →
    min doc) partials through ONE term-keyed Min) mapped to ten decile
    buckets (``min_doc · 10 // (max_id + 1)``) with per-batch counts
    → a ≤10-row keyed sum collected on the driver for the cumsum;
    text never moves, the only full-column pass is the doc-id max."""
    import ray
    from ray.data.aggregate import Min, Sum

    mx = ds.max(id_col)
    empty = pa.table({"decile": pa.array([], pa.int64()),
                      "new_terms": pa.array([], pa.int64()),
                      "cum_terms": pa.array([], pa.int64())})
    if mx is None:
        return empty

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.fill_null(b[text_col], ""),
                                      r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        ids = b[id_col].combine_chunks().take(par.filter(mask))
        t = pa.table({"term": flat.filter(mask), id_col: ids})
        g = t.group_by("term", use_threads=False).aggregate(
            [(id_col, "min")])
        return g.rename_columns(["term", id_col])

    first = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Min(id_col, alias_name=id_col))

    def bucket_partial(b: pa.Table) -> pa.Table:
        d = b[id_col]
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        dec = d.to_numpy(zero_copy_only=False).astype(np.int64) \
            * 10 // (mx + 1)
        vc = pa.array(dec).value_counts()
        return pa.table({"decile": vc.field("values"),
                         "new_terms": vc.field("counts")
                         .cast(pa.int64())})

    agg = first.map_batches(bucket_partial, batch_format="pyarrow") \
        .groupby("decile").aggregate(Sum("new_terms",
                                         alias_name="new_terms"))
    tabs = [t for t in ray.get(agg.to_arrow_refs())
            if t.num_columns and t.num_rows]
    if not tabs:
        return empty
    m = pa.concat_tables(tabs).to_pandas().sort_values("decile")
    new = m["new_terms"].to_numpy(np.int64)
    return pa.table({"decile": pa.array(m["decile"].to_numpy(np.int64)),
                     "new_terms": pa.array(new),
                     "cum_terms": pa.array(np.cumsum(new))})


def fertility_by_lang_ds(ds, text_col: str = "text",
                         lang_col: str = "lang"):
    """Tokenizer fertility per language: BPE-pretoken count over
    whitespace-word count, exact integer ppm — the classic signal
    for how much more a BPE tokenizer fragments each language
    (tokenizer-budget sizing per language ahead of training).

    Scale shape: a pure per-batch map (two RE2 count kernels) reduced
    to (lang, sums) partials inside each batch — the shuffle carries
    langs × batches partial rows, never text; one tiny keyed sum and
    a streaming ppm map finish."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        text = b[text_col]
        bpe = pc.add(pc.add(
            pc.cast(_count_re(text, BPE_ALPHA_RE), pa.int64()),
            pc.cast(_count_re(text, BPE_NUM_RE), pa.int64())),
            pc.cast(_count_re(text, BPE_OTHER_RE), pa.int64()))
        ws = pc.cast(_count_re(text, r"\S+"), pa.int64())
        t = pa.table({"lang": b[lang_col], "bpe": bpe, "ws": ws,
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["lang"], use_threads=False).aggregate(
            [("bpe", "sum"), ("ws", "sum"), ("n", "sum")])
        return pa.table({"lang": g["lang"], "bpe": g["bpe_sum"],
                         "ws": g["ws_sum"], "n": g["n_sum"]})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(Sum("n", alias_name="n_docs"),
                                   Sum("ws", alias_name="ws_tokens"),
                                   Sum("bpe", alias_name="bpe_tokens"))

    def finish(b: pa.Table) -> pa.Table:
        bpe = b["bpe_tokens"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ws = b["ws_tokens"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "lang": b["lang"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "ws_tokens": pa.array(ws),
            "bpe_tokens": pa.array(bpe),
            "fertility_ppm": pa.array(
                bpe * 1_000_000 // np.maximum(ws, 1))})

    return agg.map_batches(finish, batch_format="pyarrow")


def _doc_bigrams(texts: list[str]):
    """All within-doc character-bigram u64 codes (hi cp << 32 | lo cp)
    over a batch, plus the per-doc bigram counts — ONE utf-32 pass
    over the concatenated batch text, no per-char Python."""
    joined = "".join(texts)
    codes = np.frombuffer(joined.encode("utf-32-le"),
                          dtype=np.uint32).astype(np.uint64)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    nb = np.maximum(lens - 1, 0)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    tot = int(nb.sum())
    if tot == 0:
        return np.zeros(0, np.uint64), nb
    within = np.arange(tot, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(nb)[:-1]]), nb)
    idx = np.repeat(starts, nb) + within
    bg = (codes[idx] << np.uint64(32)) | codes[idx + 1]
    return bg, nb


def bigram_lm_score_ds(docs_ds, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Char-bigram language-model quality score (the CCNet/perplexity
    filtering shape): per doc, the total MLE log-probability of its
    character bigrams under a model trained on the SAME corpus —
    ``logprob_micro`` = Σ round(ln(c_ab / c_a·) · 1e6) as exact int64
    (c_a· = total bigrams starting with that char, so every scored
    bigram is in-vocabulary by construction).  Docs shorter than two
    chars emit no row (no bigrams — mirrored by the SQL twin's
    ``range(1, length)``).

    Scale plan: the count pass ships per-batch ``np.unique`` partials
    of DISTINCT bigrams (alphabet²-bounded, never corpus-sized); the
    folded model is broadcast once via ``ray.put`` as a sorted u64
    key + int64 log-prob pair, and the scoring pass is one streaming
    searchsorted gather + ``np.add.reduceat`` per batch — documents
    never shuffle."""
    import ray
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def count_partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        bg, _ = _doc_bigrams([t or "" for t in texts])
        keys, counts = np.unique(bg, return_counts=True)
        # distinct bigrams only — bounded by alphabet², not rows
        s = [chr(int(k >> np.uint64(32))) + chr(int(k & np.uint64(0xFFFFFFFF)))
             for k in keys]
        return pa.table({"b": pa.array(s, pa.string()),
                         "n": pa.array(counts.astype(np.int64))})

    model = docs_ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("b").aggregate(Sum("n", alias_name="n")).to_pandas()

    keys = np.array([(np.uint64(ord(b[0])) << np.uint64(32))
                     | np.uint64(ord(b[1])) for b in model["b"]],
                    dtype=np.uint64)
    cnts = model["n"].to_numpy().astype(np.int64)
    order = np.argsort(keys)
    keys, cnts = keys[order], cnts[order]
    first = (keys >> np.uint64(32)).astype(np.int64)
    # prefix totals c_a· via one reduceat over the first-char runs
    runs = np.concatenate(
        [[0], np.flatnonzero(first[1:] != first[:-1]) + 1]) \
        if len(first) else np.zeros(0, np.int64)
    tots = np.add.reduceat(cnts, runs) if len(cnts) else cnts
    run_of = np.cumsum(np.isin(np.arange(len(first)), runs)) - 1 \
        if len(first) else np.zeros(0, np.int64)
    lp = round_away(np.log(cnts / tots[run_of]) * 1_000_000, 0) \
        .astype(np.int64) if len(cnts) else np.zeros(0, np.int64)
    side = ray.put((keys, lp))

    def score(b: pa.Table, _s=side) -> pa.Table:
        ks, lps = ray.get(_s)
        texts = b[text_col].to_pylist()
        bg, nb = _doc_bigrams([t or "" for t in texts])
        v = lps[np.searchsorted(ks, bg)] if len(bg) else \
            np.zeros(0, np.int64)
        offs = np.concatenate([[0], np.cumsum(nb)[:-1]])
        keep = nb > 0
        sums = np.zeros(len(nb), np.int64)
        if keep.any():
            sums[keep] = np.add.reduceat(v, offs[keep])
        return pa.table({
            id_col: b[id_col].filter(pa.array(keep)),
            "n_bigrams": pa.array(nb[keep]),
            "logprob_micro": pa.array(sums[keep])})

    return docs_ds.map_batches(score, batch_format="pyarrow")


# Flesch reading-ease constants ×1000 (integer-milli grid shared with
# the SQL twin; syllables proxied by vowel groups)
FLESCH_BASE_MILLI = 206_835
FLESCH_WPS_MILLI = 1_015
FLESCH_SPW_MILLI = 84_600
VOWEL_GROUP_RE = "[aeiouAEIOU]+"
SENTENCE_RE = "[.!?]+"


def reading_ease_ds(ds, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Flesch-style reading-ease score per document, fully integer:
    words = ``\\S+`` runs, sentences = ``[.!?]+`` runs (min 1),
    syllables ≈ vowel groups; the two rates are truncated integer ppm
    and the score is milli-points —
    ``206835 - 1015·wps_ppm//1e6 - 84600·spw_ppm//1e6`` — so both
    engines land on identical int64s (all terms non-negative, ``//``
    truncation == floor).  Pure per-batch map: three compiled-regex
    count kernels, zero shuffle."""

    def f(b: pa.Table) -> pa.Table:
        text = b[text_col]
        w = pc.cast(_count_re(text, TOKEN_RE), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        s = pc.cast(_count_re(text, SENTENCE_RE), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = pc.cast(_count_re(text, VOWEL_GROUP_RE), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        wps = w * 1_000_000 // np.maximum(s, 1)
        spw = v * 1_000_000 // np.maximum(w, 1)
        score = (FLESCH_BASE_MILLI
                 - FLESCH_WPS_MILLI * wps // 1_000_000
                 - FLESCH_SPW_MILLI * spw // 1_000_000)
        return pa.table({
            id_col: b[id_col],
            "n_words": pa.array(w), "n_sentences": pa.array(s),
            "n_vowel_groups": pa.array(v),
            "flesch_milli": pa.array(score.astype(np.int64))})

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Gopher-style quality-rule census (Rae et al. 2021, "Scaling Language
# Models: ... Gopher" §A1.1 — the repetition/length/stopword filter
# family, reduced to integer-exact rules)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 20, 1000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3, 5        # mean word length bounds
GOPHER_STOP_PCT = 2                          # ≥ 2% stopwords
GOPHER_UNIQ_PCT = 35                         # ≥ 35% distinct words


def gopher_rules_ds(ds, text_col: str = "text", id_col: str = "doc_id",
                    by: str = "source"):
    """Per-``by`` census of Gopher-style quality-filter rules: how many
    docs fail each rule and how many pass all of them → one row per
    group ``(by, n_docs, fail_len, fail_wordlen, fail_stop, fail_uniq,
    n_pass)``.

    Every rule is an INTEGER cross-multiplication (``sum_wl ≥ 3·n_words``
    instead of ``mean ≥ 3.0``), so the census is value-exact against the
    SQL twin with zero float risk.  Word semantics = split on single
    space (DuckDB ``string_split(text, ' ')``), all derived vectorized:
    word count and summed word length from two C kernels, stopword and
    distinct counts from one flatten + segment reductions.

    Scale shape: a pure map emits one partial-census row per (batch,
    group); the only shuffle is the final tiny ``groupby(by).sum`` over
    group-bounded partials."""
    from ray.data.aggregate import Sum

    stop_set = pa.array(list(GOPHER_STOPWORDS), pa.string())

    def partial(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b[text_col], "")
        n = len(text)
        n_spaces = pc.count_substring(text, pattern=" ") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = n_spaces + 1                       # len(string_split)
        sum_wl = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64) - n_spaces
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

        f_len = ((n_words < GOPHER_MIN_WORDS) |
                 (n_words > GOPHER_MAX_WORDS)).astype(np.int64)
        f_wl = ((sum_wl < GOPHER_MIN_MWL * n_words) |
                (sum_wl > GOPHER_MAX_MWL * n_words)).astype(np.int64)
        f_stop = (n_stop * 100 < GOPHER_STOP_PCT * n_words) \
            .astype(np.int64)
        f_uniq = (n_uniq * 100 < GOPHER_UNIQ_PCT * n_words) \
            .astype(np.int64)
        n_pass = ((f_len + f_wl + f_stop + f_uniq) == 0).astype(np.int64)
        t = pa.table({
            by: b[by],
            "n_docs": pa.array(np.ones(n, dtype=np.int64)),
            "fail_len": pa.array(f_len), "fail_wordlen": pa.array(f_wl),
            "fail_stop": pa.array(f_stop), "fail_uniq": pa.array(f_uniq),
            "n_pass": pa.array(n_pass)})
        g = t.group_by([by], use_threads=False).aggregate(
            [("n_docs", "sum"), ("fail_len", "sum"),
             ("fail_wordlen", "sum"), ("fail_stop", "sum"),
             ("fail_uniq", "sum"), ("n_pass", "sum")])
        return pa.table({by: g[by], "n_docs": g["n_docs_sum"],
                         "fail_len": g["fail_len_sum"],
                         "fail_wordlen": g["fail_wordlen_sum"],
                         "fail_stop": g["fail_stop_sum"],
                         "fail_uniq": g["fail_uniq_sum"],
                         "n_pass": g["n_pass_sum"]})

    return ds.select_columns([by, id_col, text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(by).aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("fail_len", alias_name="fail_len"),
            Sum("fail_wordlen", alias_name="fail_wordlen"),
            Sum("fail_stop", alias_name="fail_stop"),
            Sum("fail_uniq", alias_name="fail_uniq"),
            Sum("n_pass", alias_name="n_pass"))


C4_MIN_SENTS = 3            # ≥ 3 sentence terminators
C4_MIN_LINE_WORDS = 5       # mean words per line ≥ 5


def c4_rules_ds(ds, text_col: str = "text", id_col: str = "doc_id",
                by: str = "source"):
    """Per-``by`` census of C4-style quality-filter rules (the Raffel
    et al. 2020 §2.2 heuristic family, doc-level form): how many docs
    fail each rule and how many pass all → one row per group
    ``(by, n_docs, fail_sent, fail_brace, fail_lorem, fail_linewords,
    n_pass)``.

    Rules (every test integer / substring-exact, zero float risk):
    ``fail_sent`` — fewer than ``C4_MIN_SENTS`` '.' terminators;
    ``fail_brace`` — contains '{' or '}' (code marker);
    ``fail_lorem`` — contains 'lorem ipsum' (case-insensitive);
    ``fail_linewords`` — mean words per line below
    ``C4_MIN_LINE_WORDS``, tested as the cross-multiplication
    ``n_words < k·n_lines`` (words = single-space split, the shared
    word contract of :func:`gopher_rules_ds`; lines = '\\n' split).

    Scale shape: a pure vectorized map (four C substring kernels per
    batch) emits one partial-census row per (batch, group); the only
    shuffle is the tiny final ``groupby(by).sum``."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b[text_col], "")
        n = len(text)
        n_per = pc.count_substring(text, pattern=".") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_brace = pc.count_substring(text, pattern="{") \
            .to_numpy(zero_copy_only=False).astype(np.int64) + \
            pc.count_substring(text, pattern="}") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lorem = pc.match_substring(pc.utf8_lower(text), "lorem ipsum") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_lines = pc.count_substring(text, pattern="\n") \
            .to_numpy(zero_copy_only=False).astype(np.int64) + 1
        n_words = pc.count_substring(text, pattern=" ") \
            .to_numpy(zero_copy_only=False).astype(np.int64) + 1

        f_sent = (n_per < C4_MIN_SENTS).astype(np.int64)
        f_brace = (n_brace > 0).astype(np.int64)
        f_lorem = lorem
        f_lw = (n_words < C4_MIN_LINE_WORDS * n_lines).astype(np.int64)
        n_pass = ((f_sent + f_brace + f_lorem + f_lw) == 0) \
            .astype(np.int64)
        t = pa.table({
            by: b[by],
            "n_docs": pa.array(np.ones(n, dtype=np.int64)),
            "fail_sent": pa.array(f_sent),
            "fail_brace": pa.array(f_brace),
            "fail_lorem": pa.array(f_lorem),
            "fail_linewords": pa.array(f_lw),
            "n_pass": pa.array(n_pass)})
        g = t.group_by([by], use_threads=False).aggregate(
            [("n_docs", "sum"), ("fail_sent", "sum"),
             ("fail_brace", "sum"), ("fail_lorem", "sum"),
             ("fail_linewords", "sum"), ("n_pass", "sum")])
        return pa.table({by: g[by], "n_docs": g["n_docs_sum"],
                         "fail_sent": g["fail_sent_sum"],
                         "fail_brace": g["fail_brace_sum"],
                         "fail_lorem": g["fail_lorem_sum"],
                         "fail_linewords": g["fail_linewords_sum"],
                         "n_pass": g["n_pass_sum"]})

    return ds.select_columns([by, id_col, text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(by).aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("fail_sent", alias_name="fail_sent"),
            Sum("fail_brace", alias_name="fail_brace"),
            Sum("fail_lorem", alias_name="fail_lorem"),
            Sum("fail_linewords", alias_name="fail_linewords"),
            Sum("n_pass", alias_name="n_pass"))


def char_bigram_stats_ds(ds, text_col: str = "text",
                         by: str = "source"):
    """Per-``by`` character-bigram collision moments — the
    exact-integer building blocks of character-level Rényi-2 entropy
    (a language/quality signal that needs no tokenizer):
    ``(by, n_bigrams, distinct_bigrams, coll)`` with
    ``coll = Σ_bg c_bg²`` over the group's codepoint-bigram counts.
    Codepoint semantics (one UTF-32 unit per character), matching
    the SQL twin's character ``substring``.

    Scale shape: each batch decodes to a UTF-32 numpy view in one C
    call (no per-doc Python), packs bigrams as int64 codes and
    pre-reduces with one arrow ``group_by``; the shuffle carries
    (group, code, count) rows bounded by the distinct-bigram
    vocabulary, and the final reduce is a tiny groupby."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({by: pa.array([], pa.string()),
                          "code": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        text = pc.fill_null(b[text_col], "").combine_chunks()
        n = len(text)
        if n == 0:
            return empty
        src = b[by].combine_chunks()
        uniq = src.unique()
        sidx = pc.index_in(src, value_set=uniq) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        docs = text.to_pylist()
        joined = "".join(docs)
        cp = np.frombuffer(joined.encode("utf-32-le"),
                           dtype=np.uint32).astype(np.int64)
        if len(cp) < 2:
            return empty
        clens = np.array([len(t) for t in docs], dtype=np.int64)
        ends = np.cumsum(clens)
        codes = (cp[:-1] << 21) | cp[1:]
        doc_of = np.repeat(np.arange(n), clens)[:-1]
        valid = np.ones(len(codes), dtype=bool)
        bnd = ends[:-1] - 1                   # doc boundaries
        bnd = bnd[(bnd >= 0) & (bnd < len(codes))]   # empty-doc edges
        valid[bnd] = False
        t = pa.table({
            "g": pa.array(sidx[doc_of[valid]], pa.int64()),
            "code": pa.array(codes[valid], pa.int64())})
        gg = t.group_by(["g", "code"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({
            by: uniq.take(gg["g"]),
            "code": gg["code"],
            "c": pc.cast(gg["count_all"], pa.int64())})

    counts = ds.select_columns([by, text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "code"]).aggregate(Sum("c", alias_name="c"))

    def moments(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = pa.table({by: b[by],
                      "n_bigrams": pa.array(c),
                      "distinct_bigrams": pa.array(
                          np.ones(len(c), dtype=np.int64)),
                      "coll": pa.array(c * c)})
        g = t.group_by([by], use_threads=False).aggregate(
            [("n_bigrams", "sum"), ("distinct_bigrams", "sum"),
             ("coll", "sum")])
        return pa.table({by: g[by],
                         "n_bigrams": g["n_bigrams_sum"],
                         "distinct_bigrams": g["distinct_bigrams_sum"],
                         "coll": g["coll_sum"]})

    return counts.map_batches(moments, batch_format="pyarrow") \
        .groupby(by).aggregate(
            Sum("n_bigrams", alias_name="n_bigrams"),
            Sum("distinct_bigrams", alias_name="distinct_bigrams"),
            Sum("coll", alias_name="coll"))


def source_char_kl_ds(ds, text_col: str = "text", by: str = "source"):
    """Per-``by`` KL divergence of the character-unigram distribution
    from the whole-corpus distribution, in exact integer micro-nats —
    the domain-shift / contamination signal ("which source writes
    unlike the rest of the corpus").  With the shared grid
    ``L(x) = round(ln(x)·1e6)`` and per-source char counts ``c`` vs
    global counts ``C``:

        kl_micro = L(N) − L(n) − (Σ_ch c·(L(C) − L(c))) // n

    Every numerator term is non-negative (``c ≤ C``, L monotone), so
    floor division equals truncation and both engines agree
    bit-for-bit.  Codepoint semantics matching SQL character
    ``substring``.

    Scale shape: per-batch UTF-32 decode + (group, codepoint) arrow
    pre-reduce; the shuffle carries vocabulary-bounded count cells;
    the global char histogram (alphabet-bounded) broadcasts into one
    vectorized searchsorted pass over the cells; only |sources| rows
    reach the driver."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({by: pa.array([], pa.string()),
                          "cp": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        text = pc.fill_null(b[text_col], "").combine_chunks()
        n = len(text)
        if n == 0:
            return empty
        src = b[by].combine_chunks()
        uniq = src.unique()
        sidx = pc.index_in(src, value_set=uniq) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        docs = text.to_pylist()
        joined = "".join(docs)
        cp = np.frombuffer(joined.encode("utf-32-le"),
                           dtype=np.uint32).astype(np.int64)
        if len(cp) == 0:
            return empty
        clens = np.array([len(t) for t in docs], dtype=np.int64)
        doc_of = np.repeat(np.arange(n), clens)
        t = pa.table({"g": pa.array(sidx[doc_of], pa.int64()),
                      "cp": pa.array(cp)})
        gg = t.group_by(["g", "cp"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({by: uniq.take(gg["g"]), "cp": gg["cp"],
                         "c": pc.cast(gg["count_all"], pa.int64())})

    cells = ds.select_columns([by, text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "cp"]).aggregate(Sum("c", alias_name="c")) \
        .materialize()

    glob = cells.groupby("cp") \
        .aggregate(Sum("c", alias_name="gc")).to_pandas() \
        .sort_values("cp")                        # alphabet-bounded
    gcp = glob["cp"].to_numpy(dtype=np.int64)
    glc = round_away(np.log(glob["gc"].to_numpy(dtype=np.int64))
                     * 1_000_000, 0).astype(np.int64)
    big_n = int(glob["gc"].sum())

    def fold(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cp = b["cp"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lc = round_away(np.log(c) * 1_000_000, 0).astype(np.int64)
        x = c * (glc[np.searchsorted(gcp, cp)] - lc)
        return pa.table({by: b[by], "n": pa.array(c),
                         "d": pa.array(np.ones(len(c), np.int64)),
                         "x": pa.array(x)})

    agg = cells.map_batches(fold, batch_format="pyarrow") \
        .groupby(by).aggregate(
            Sum("n", alias_name="n_chars"),
            Sum("d", alias_name="distinct_chars"),
            Sum("x", alias_name="x")).to_pandas()
    n = agg["n_chars"].to_numpy(dtype=np.int64)
    l_nn = int(round_away(np.log(big_n) * 1_000_000, 0))
    l_n = round_away(np.log(n) * 1_000_000, 0).astype(np.int64)
    kl = l_nn - l_n - agg["x"].to_numpy(dtype=np.int64) // n
    out = pa.table({
        by: pa.Array.from_pandas(agg[by]),
        "n_chars": pa.array(n),
        "distinct_chars": pa.array(
            agg["distinct_chars"].to_numpy(dtype=np.int64)),
        "kl_micro": pa.array(kl.astype(np.int64))})
    return out


def source_token_entropy_ds(ds, text_col: str = "text",
                            by: str = "source"):
    """Per-``by`` Shannon entropy of the whitespace-token distribution
    in exact integer micro-nats on the shared ``L(x) =
    round(ln(x)·1e6)`` grid: ``entropy_micro = (n·L(n) − Σ_t c_t·L(c_t))
    // n`` (numerator non-negative by concavity, floor == truncate) —
    the lexical-diversity counterpart of :func:`source_char_kl_ds`.

    Scale shape: per-batch (group, term) arrow pre-reduce, a keyed
    groupby over vocabulary-bounded count cells (tokens never
    shuffle), then a cell-local fold into three per-group sums; only
    |groups| rows reach the driver."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b[text_col], ""), r"\s+")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        t = pa.table({by: b[by].take(par.filter(mask)),
                      "term": flat.filter(mask)})
        g = t.group_by([by, "term"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({by: g[by], "term": g["term"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    cells = ds.select_columns([by, text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "term"]).aggregate(Sum("c", alias_name="c"))

    def fold(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lc = round_away(np.log(c) * 1_000_000, 0).astype(np.int64)
        return pa.table({by: b[by], "n": pa.array(c),
                         "d": pa.array(np.ones(len(c), np.int64)),
                         "clc": pa.array(c * lc)})

    agg = cells.map_batches(fold, batch_format="pyarrow") \
        .groupby(by).aggregate(
            Sum("n", alias_name="n_tokens"),
            Sum("d", alias_name="distinct_tokens"),
            Sum("clc", alias_name="sum_clc")).to_pandas()
    n = agg["n_tokens"].to_numpy(dtype=np.int64)
    ln_n = round_away(np.log(n) * 1_000_000, 0).astype(np.int64)
    ent = (n * ln_n - agg["sum_clc"].to_numpy(dtype=np.int64)) // n
    return pa.table({
        by: pa.Array.from_pandas(agg[by]),
        "n_tokens": pa.array(n),
        "distinct_tokens": pa.array(
            agg["distinct_tokens"].to_numpy(dtype=np.int64)),
        "entropy_micro": pa.array(ent.astype(np.int64))})


def dsir_weights_ds(ds, target_lang: str = "en", text_col: str = "text",
                    lang_col: str = "lang", id_col: str = "doc_id",
                    num_buckets: int = 8192):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per document the
    hashed bag-of-tokens LM log-ratio ``Σ_t [log p_target(b(t)) −
    log p_raw(b(t))]`` in exact integer micro-nats on the shared
    ``L(x) = round(ln(x)·1e6)`` grid, add-one smoothed over
    ``num_buckets`` hashed feature buckets.  The target distribution
    is the ``lang_col == target_lang`` slice; raw is the whole corpus.
    High-weight docs "look like" the target slice and would be kept by
    DSIR's importance resampling.

    Scale shape: pass 1 is a per-batch arrow pre-reduce of
    (bucket, c_all, c_tgt) cells into ONE vocabulary-INDEPENDENT
    groupby — the hashing trick caps the shuffle at ``num_buckets``
    cells no matter the corpus vocabulary; pass 2 is a pure scoring
    map with the λ LUT (num_buckets int64s) broadcast once via
    ``ray.put``.  Corpus text never shuffles; token md5s run through
    DuckDB's vectorized kernel on the DISTINCT dictionary of each
    batch.  Output: one (doc_id, n_tokens, weight_micro) row per doc
    (token-less docs score 0)."""
    import ray
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import md5_u64_arr, round_away

    B = int(num_buckets)

    def _doc_buckets(b: pa.Table):
        """→ (parent doc index, bucket id) for every token of the
        batch, bucketing only the batch's distinct tokens."""
        toks = pc.split_pattern_regex(
            pc.fill_null(b[text_col], ""), r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        par = pc.list_parent_indices(toks).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        keep = np.asarray(pc.not_equal(flat, ""))
        dct = flat.dictionary_encode()
        codes = dct.indices.to_numpy(zero_copy_only=False)
        if len(dct.dictionary):
            dict_buckets = (md5_u64_arr(dct.dictionary) %
                            np.uint64(B)).astype(np.int64)
            buckets = dict_buckets[codes]
        else:
            buckets = np.empty(0, dtype=np.int64)
        return par[keep], buckets[keep]

    def census(b: pa.Table) -> pa.Table:
        par, buckets = _doc_buckets(b)
        is_tgt = pc.equal(pc.fill_null(b[lang_col], ""), target_lang) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        c_all = np.bincount(buckets, minlength=B)
        c_tgt = np.bincount(buckets[is_tgt[par]], minlength=B)
        nz = np.flatnonzero(c_all)
        return pa.table({
            "bucket": pa.array(nz.astype(np.int64)),
            "c_all": pa.array(c_all[nz].astype(np.int64)),
            "c_tgt": pa.array(c_tgt[nz].astype(np.int64))})

    cells = ds.select_columns([lang_col, text_col]) \
        .map_batches(census, batch_format="pyarrow") \
        .groupby("bucket").aggregate(
            Sum("c_all", alias_name="c_all"),
            Sum("c_tgt", alias_name="c_tgt")).to_pandas()
    c_all = np.zeros(B, dtype=np.int64)
    c_tgt = np.zeros(B, dtype=np.int64)
    bk = cells["bucket"].to_numpy(dtype=np.int64)
    c_all[bk] = cells["c_all"].to_numpy(dtype=np.int64)
    c_tgt[bk] = cells["c_tgt"].to_numpy(dtype=np.int64)
    n_all, n_tgt = int(c_all.sum()), int(c_tgt.sum())

    def _L(x) -> np.ndarray:
        return round_away(np.log(np.asarray(x, dtype=np.float64))
                          * 1_000_000, 0).astype(np.int64)

    lam = (_L(c_tgt + 1) - int(_L(n_tgt + B))) \
        - (_L(c_all + 1) - int(_L(n_all + B)))
    lam_ref = ray.put(lam)

    def score(b: pa.Table) -> pa.Table:
        lut = ray.get(lam_ref)
        par, buckets = _doc_buckets(b)
        n = b.num_rows
        n_tok = np.bincount(par, minlength=n).astype(np.int64)
        w = np.zeros(n, dtype=np.int64)
        np.add.at(w, par, lut[buckets])
        return pa.table({id_col: b[id_col],
                         "n_tokens": pa.array(n_tok),
                         "weight_micro": pa.array(w)})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(score, batch_format="pyarrow")


def source_length_w1_ds(ds, text_col: str = "text",
                        by: str = "source") -> pa.Table:
    """Pairwise 1-D Wasserstein-1 distance between per-``by``
    token-count distributions — the classic distribution-shift monitor
    between corpus slices.  Over integer support, ``W1 = Σ_v |F_a(v) −
    F_b(v)| · gap(v)``; cross-multiplying the empirical CDFs clears
    the divisions so the numerator ``Σ |F_a(v)·n_b − F_b(v)·n_a| ·
    gap`` is EXACT (arbitrary-precision ints on the driver, HUGEINT in
    the SQL twin), reported as ``w1_micro = num·10⁶ // (n_a·n_b)``.

    Scale shape: one (group, token-count) combiner groupby — the cell
    count is |groups| × |distinct lengths| (length-bounded, never
    corpus-bounded); the pairwise fold runs on the driver over that
    bounded grid (same contract as the PMI / KL census ops)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = pc.count_substring_regex(
            pc.fill_null(b[text_col], ""), pattern=r"\S+")
        t = pa.table({by: b[by], "v": pc.cast(v, pa.int64())})
        g = t.group_by([by, "v"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({by: g[by], "v": g["v"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    cells = ds.select_columns([by, text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "v"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()

    groups = sorted(cells[by].unique())
    dom = sorted(cells["v"].unique())
    vidx = {v: i for i, v in enumerate(dom)}
    hist = {g: [0] * len(dom) for g in groups}
    for g, v, c in zip(cells[by], cells["v"], cells["c"]):
        hist[g][vidx[v]] = int(c)
    cum = {}
    n_of = {}
    for g in groups:
        acc, cl = 0, []
        for c in hist[g]:
            acc += c
            cl.append(acc)
        cum[g], n_of[g] = cl, acc
    gaps = [int(dom[i + 1]) - int(dom[i]) for i in range(len(dom) - 1)]

    a_col, b_col, na_col, nb_col, w_col = [], [], [], [], []
    for i, ga in enumerate(groups):
        for gb in groups[i + 1:]:
            na, nb = n_of[ga], n_of[gb]
            num = sum(abs(cum[ga][k] * nb - cum[gb][k] * na) * gaps[k]
                      for k in range(len(gaps)))
            a_col.append(ga)
            b_col.append(gb)
            na_col.append(na)
            nb_col.append(nb)
            w_col.append(num * 1_000_000 // (na * nb)
                         if na and nb else 0)
    return pa.table({
        "source_a": pa.array(a_col, pa.string()),
        "source_b": pa.array(b_col, pa.string()),
        "n_a": pa.array(na_col, pa.int64()),
        "n_b": pa.array(nb_col, pa.int64()),
        "w1_micro": pa.array(w_col, pa.int64())})


def mannwhitney_u_ds(ds, value_col: str = "n_chars",
                     by: str = "source") -> pa.Table:
    """Pairwise Mann–Whitney U (Wilcoxon rank-sum) between per-``by``
    distributions of an integer column — the classic nonparametric
    two-sample location-shift test between corpus slices.  Over the
    shared value domain, ``U_a = Σ_v c_a(v)·(#b < v) + ½·c_a(v)·c_b(v)``
    (ties counted half); the report carries ``u2 = 2·U_a`` so every
    number stays an exact integer, plus the common-language effect
    size ``cles_micro = u2·10⁶ // (2·n_a·n_b)`` (P(a > b) + ½P(a = b),
    0.5 ⇔ no shift).

    Scale shape: one (group, value) combiner groupby — cell count is
    |groups| × |distinct values| (value-domain-bounded, never
    corpus-bounded); the pairwise fold runs on the driver over that
    bounded grid with Python-int exactness (same contract as
    :func:`source_length_w1_ds`)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "v": b[value_col].combine_chunks()
                      .cast(pa.int64())})
        g = t.group_by([by, "v"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({by: g[by], "v": g["v"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    cells = ds.select_columns([by, value_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "v"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()

    groups = sorted(cells[by].unique())
    dom = sorted(cells["v"].unique())
    vidx = {v: i for i, v in enumerate(dom)}
    hist = {g: [0] * len(dom) for g in groups}
    for g, v, c in zip(cells[by], cells["v"], cells["c"]):
        hist[g][vidx[v]] = int(c)

    a_col, b_col, na_col, nb_col, u_col, e_col = [], [], [], [], [], []
    for i, ga in enumerate(groups):
        ca = hist[ga]
        na = sum(ca)
        for gb in groups[i + 1:]:
            cb = hist[gb]
            nb = sum(cb)
            u2, cumb = 0, 0
            for k in range(len(dom)):
                u2 += 2 * ca[k] * cumb + ca[k] * cb[k]
                cumb += cb[k]
            a_col.append(ga)
            b_col.append(gb)
            na_col.append(na)
            nb_col.append(nb)
            u_col.append(u2)
            e_col.append(u2 * 1_000_000 // (2 * na * nb)
                         if na and nb else 0)
    return pa.table({
        "source_a": pa.array(a_col, pa.string()),
        "source_b": pa.array(b_col, pa.string()),
        "n_a": pa.array(na_col, pa.int64()),
        "n_b": pa.array(nb_col, pa.int64()),
        "u2": pa.array(u_col, pa.int64()),
        "cles_micro": pa.array(e_col, pa.int64())})


def temperature_mix_ds(ds, size_col: str = "n_chars",
                       by: str = "source",
                       tau: float = 0.7) -> pa.Table:
    """Temperature-scaled mixture weights per ``by`` slice — the
    standard multilingual/multi-source LM sampling allocator
    (p_i ∝ size_i^τ, τ<1 upweights small slices): per group the raw
    size ``chars``, the tempered mass ``w_pow = round(chars^τ)`` on
    the shared integer grid (round-half-away, matching SQL round()),
    and the normalized ``weight_micro = w_pow·10⁶ // Σ w_pow`` — all
    integer after the one gridded pow, so both engines agree
    bit-for-bit.

    Scale shape: a pure per-batch sum partial + one |groups|-row
    groupby; the normalization folds on the driver over bounded
    rows."""
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "c": b[size_col].combine_chunks()
                      .cast(pa.int64())})
        g = t.group_by([by], use_threads=False).aggregate(
            [("c", "sum")])
        return pa.table({by: g[by], "chars": g["c_sum"]})

    agg = ds.select_columns([by, size_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(by).aggregate(Sum("chars", alias_name="chars")) \
        .to_pandas().sort_values(by).reset_index(drop=True)

    c = agg["chars"].to_numpy().astype(np.int64)
    w = round_away(np.power(c.astype(np.float64), tau), 0) \
        .astype(np.int64)
    tot = int(w.sum())
    wm = np.array([int(x) * 1_000_000 // tot for x in w], np.int64)
    return pa.table({
        by: pa.Array.from_pandas(agg[by]),
        "chars": pa.array(c),
        "w_pow": pa.array(w),
        "weight_micro": pa.array(wm)})


def _doc_char_ngrams(texts: list[str], n: int):
    """All within-doc character n-gram u64 codes (21 bits per code
    point, so a trigram packs exactly into 63 bits) over a batch,
    plus the per-doc n-gram counts — ONE utf-32 pass over the
    concatenated batch text, no per-char Python."""
    joined = "".join(texts)
    codes = np.frombuffer(joined.encode("utf-32-le"),
                          dtype=np.uint32).astype(np.uint64)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    ng = np.maximum(lens - (n - 1), 0)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    tot = int(ng.sum())
    if tot == 0:
        return np.zeros(0, np.uint64), ng
    within = np.arange(tot, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(ng)[:-1]]), ng)
    idx = np.repeat(starts, ng) + within
    out = codes[idx]
    for j in range(1, n):
        out = (out << np.uint64(21)) | codes[idx + j]
    return out, ng


def trigram_backoff_ds(docs_ds, text_col: str = "text",
                       id_col: str = "doc_id",
                       by: str = "lang") -> "object":
    """Char-trigram stupid-backoff LM scored on a held-out split —
    the KenLM-style quality filter with honest OOV handling: the
    model trains on even ``doc_id`` docs, scores odd ones.  Per
    scored trigram (a,b,c): seen → ``L(c₃) − L(c₂(ab))``; else seen
    bigram (b,c) → ``L4 + L(c₂(bc)) − L(c₁(b))``; else seen char c →
    ``2·L4 + L(c₁(c)) − L(N)``; else OOV → ``2·L4 − L(N)`` — with
    ``L(x) = round(ln(x)·1e6)`` the shared integer grid and
    ``L4 = L(0.4)`` the backoff penalty, so every emitted number is
    an exact int64 both engines agree on.  Reports per ``by`` slice
    the scored doc/trigram counts, the per-backoff-level hit census
    and the summed log-score.

    Scale plan: the count pass ships per-batch ``np.unique`` partials
    of DISTINCT grams (alphabet³-bounded, never corpus-sized); the
    folded model broadcasts once via ``ray.put`` as three sorted u64
    key + gridded-log arrays; scoring is searchsorted gathers + one
    bounded per-slice groupby — documents never shuffle."""
    import ray
    from ray.data.aggregate import Sum

    from kgforge.common.hashing import round_away

    def count_partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].combine_chunks().to_numpy(
            zero_copy_only=False)
        texts = [(t or "") for t, i in
                 zip(b[text_col].to_pylist(), ids) if i % 2 == 0]
        lvl_col, g_col, c_col = [], [], []
        for n in (1, 2, 3):
            g, _ = _doc_char_ngrams(texts, n)
            keys, counts = np.unique(g, return_counts=True)
            lvl_col.append(np.full(len(keys), n, np.int64))
            g_col.append(keys.astype(np.int64))
            c_col.append(counts.astype(np.int64))
        return pa.table({
            "lvl": pa.array(np.concatenate(lvl_col)),
            "g": pa.array(np.concatenate(g_col)),
            "c": pa.array(np.concatenate(c_col))})

    model = docs_ds.select_columns([id_col, text_col]) \
        .map_batches(count_partial, batch_format="pyarrow") \
        .groupby(["lvl", "g"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()

    def level(n: int):
        m = model[model["lvl"] == n]
        k = m["g"].to_numpy().astype(np.uint64)
        c = m["c"].to_numpy().astype(np.int64)
        order = np.argsort(k)
        k, c = k[order], c[order]
        lg = round_away(np.log(c) * 1_000_000, 0).astype(np.int64) \
            if len(c) else np.zeros(0, np.int64)
        return k, c, lg

    k1, c1, l1 = level(1)
    k2, c2, l2 = level(2)
    k3, c3, l3 = level(3)
    big_n = int(c1.sum())
    l_n = int(round_away(np.log(big_n) * 1_000_000, 0)) if big_n \
        else 0
    l4 = int(round_away(np.log(0.4) * 1_000_000, 0))
    side = ray.put((k1, l1, k2, l2, k3, l3))

    M21 = np.uint64((1 << 21) - 1)
    M42 = np.uint64((1 << 42) - 1)

    def _lookup(keys, sk, sv):
        """Gathered values + hit mask via one searchsorted."""
        if not len(sk):
            return (np.zeros(len(keys), np.int64),
                    np.zeros(len(keys), bool))
        pos = np.searchsorted(sk, keys)
        pos_c = np.minimum(pos, len(sk) - 1)
        hit = sk[pos_c] == keys
        return sv[pos_c], hit

    def score(b: pa.Table, _s=side) -> pa.Table:
        sk1, sv1, sk2, sv2, sk3, sv3 = ray.get(_s)
        ids = b[id_col].combine_chunks().to_numpy(
            zero_copy_only=False)
        keep_doc = ids % 2 == 1
        texts = [(t or "") for t, k in
                 zip(b[text_col].to_pylist(), keep_doc) if k]
        langs = b[by].filter(pa.array(keep_doc))
        g, ng = _doc_char_ngrams(texts, 3)
        v3, h3 = _lookup(g, sk3, sv3)
        w12 = g >> np.uint64(21)
        w23 = g & M42
        w2 = w12 & M21
        w3 = g & M21
        p12, _ = _lookup(w12, sk2, sv2)
        p23, h23 = _lookup(w23, sk2, sv2)
        u2, _ = _lookup(w2, sk1, sv1)
        u3, h_u3 = _lookup(w3, sk1, sv1)
        lev = np.where(h3, 0,
                       np.where(h23, 1, np.where(h_u3, 2, 3)))
        sc = np.where(
            lev == 0, v3 - p12,
            np.where(lev == 1, l4 + p23 - u2,
                     np.where(lev == 2, 2 * l4 + u3 - l_n,
                              2 * l4 - l_n))).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(ng)[:-1]])
        has = ng > 0
        out = {"n_docs": has.astype(np.int64),
               "n_trigrams": ng}
        sums = np.zeros(len(ng), np.int64)
        if has.any():
            sums[has] = np.add.reduceat(sc, offs[has])
        out["score_micro"] = sums
        for li, name in enumerate(["n_tri", "n_bi", "n_uni",
                                   "n_oov"]):
            cnt = np.zeros(len(ng), np.int64)
            if has.any():
                cnt[has] = np.add.reduceat(
                    (lev == li).astype(np.int64), offs[has])
            out[name] = cnt
        cols = {by: langs}
        cols.update({k: pa.array(v) for k, v in out.items()})
        t = pa.table(cols)
        g_ = t.group_by([by], use_threads=False).aggregate(
            [(c, "sum") for c in out])
        return g_.rename_columns([by] + list(out))

    def drop_empty(b: pa.Table) -> pa.Table:
        # a by-slice whose scored docs are all sub-trigram emits no
        # row (mirrors the SQL twin, whose trigram rows define it)
        return b.filter(pc.greater(b["n_trigrams"], 0))

    return docs_ds.select_columns([id_col, by, text_col]) \
        .map_batches(score, batch_format="pyarrow") \
        .groupby(by).aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_trigrams", alias_name="n_trigrams"),
            Sum("score_micro", alias_name="score_micro"),
            Sum("n_tri", alias_name="n_tri"),
            Sum("n_bi", alias_name="n_bi"),
            Sum("n_uni", alias_name="n_uni"),
            Sum("n_oov", alias_name="n_oov")) \
        .map_batches(drop_empty, batch_format="pyarrow")


def ks_test_ds(ds, value_col: str = "n_chars",
               by: str = "source") -> pa.Table:
    """Pairwise two-sample Kolmogorov–Smirnov statistic between
    per-``by`` distributions of an integer column — the sup-norm
    member of the shift-test trio (:func:`source_length_w1_ds` is the
    earth-mover member, :func:`mannwhitney_u_ds` the rank member).
    Cross-multiplying the empirical CDFs clears the divisions:
    ``ks_scaled = max_v |F_a(v)·n_b − F_b(v)·n_a|`` is an exact
    integer and ``ks_micro = ks_scaled·10⁶ // (n_a·n_b)`` the
    reported statistic.

    Scale shape: identical to the W1 lane — one (group, value)
    combiner groupby bounds the cells to |groups| × |distinct
    values|; the pairwise sup fold runs on the driver over that
    bounded grid with Python-int exactness."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by],
                      "v": b[value_col].combine_chunks()
                      .cast(pa.int64())})
        g = t.group_by([by, "v"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({by: g[by], "v": g["v"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    cells = ds.select_columns([by, value_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "v"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()

    groups = sorted(cells[by].unique())
    dom = sorted(cells["v"].unique())
    vidx = {v: i for i, v in enumerate(dom)}
    hist = {g: [0] * len(dom) for g in groups}
    for g, v, c in zip(cells[by], cells["v"], cells["c"]):
        hist[g][vidx[v]] = int(c)
    cum, n_of = {}, {}
    for g in groups:
        acc, cl = 0, []
        for c in hist[g]:
            acc += c
            cl.append(acc)
        cum[g], n_of[g] = cl, acc

    a_col, b_col, na_col, nb_col, ks_col, km_col = \
        [], [], [], [], [], []
    for i, ga in enumerate(groups):
        for gb in groups[i + 1:]:
            na, nb = n_of[ga], n_of[gb]
            ks = max((abs(cum[ga][k] * nb - cum[gb][k] * na)
                      for k in range(len(dom))), default=0)
            a_col.append(ga)
            b_col.append(gb)
            na_col.append(na)
            nb_col.append(nb)
            ks_col.append(ks)
            km_col.append(ks * 1_000_000 // (na * nb)
                          if na and nb else 0)
    return pa.table({
        "source_a": pa.array(a_col, pa.string()),
        "source_b": pa.array(b_col, pa.string()),
        "n_a": pa.array(na_col, pa.int64()),
        "n_b": pa.array(nb_col, pa.int64()),
        "ks_scaled": pa.array(ks_col, pa.int64()),
        "ks_micro": pa.array(km_col, pa.int64())})
