"""Term-level corpus operators: repetition signals, global term
frequencies, tf*(N/df) top terms, exact two-pass heavy hitters,
fixed-token-budget chunk assignment, corpus-wide line dedup
(CCNet-style) and incremental anti-join dedup of a new batch against
a corpus.

These extend the doc-level analysis pipelines (pipelines/analysis.py)
down to the token/line granularity an LLM training-data pipeline works
at: within-doc repetition is a Gopher-style quality gate, hot-line
removal is the boilerplate scrub CCNet/RefinedWeb run before near-dup
detection, and the anti-join is the "ingest a new crawl against an
existing index" path (the streaming analog of the reference's
update_index skip-present semantics,
/root/reference/smqtk_indexing/interfaces/nn_index.py:103-118).

Float parity with the DuckDB oracles: every emitted double is either a
ratio of exact int64 counts or ``CAST(a*b AS DOUBLE)/c`` of int64s —
bit-identical IEEE division on both sides (same contract as
pipelines/analysis.py).

Exactness: per-batch distinct/tf counting uses Arrow dictionary codes
(string-exact, no hashing), so parity with SQL ``count(distinct ...)``
cannot be broken by hash collisions.  The corpus-wide line-frequency
pass uses a 128-bit line hash (two independent 64-bit keys), the same
birthday-safe construction as the exact-dedup content hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from smqtk_indexing_ray.functions.hashing import grouped_arange, hash_strings_u64
from smqtk_indexing_ray.functions.tokenize import tokens_flat
from smqtk_indexing_ray.stages._util import stamp_schema

_LK1 = "smqtk-ray-line-1"
_LK2 = "smqtk-ray-line-2"

REPETITION_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("n_tokens", pa.int64()),
    ("n_distinct_tokens", pa.int64()),
    ("dup_token_frac", pa.float64()),
    ("top_token_count", pa.int64()),
    ("top_token_frac", pa.float64()),
])

TERM_FREQ_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("cnt", pa.int64()),
    ("df", pa.int64()),
])

TFIDF_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("term", pa.string()),
    ("tf", pa.int64()),
    ("score", pa.float64()),
])

LINE_DEDUP_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("clean_text", pa.string()),
    ("n_lines", pa.int64()),
    ("n_removed", pa.int64()),
])


def _doc_term_runs(texts, n: int):
    """Tokenize a batch and return per-(doc, term) run structure.

    Returns ``(vocab, doc_rep, code, s_doc, s_code, run_starts, run_len,
    run_doc, counts)`` where ``counts`` is tokens-per-doc and runs are
    maximal (doc, term) groups after one lexsort.  Dictionary codes make
    term identity string-exact.
    """
    toks, off = tokens_flat(texts, lowercase=False)
    counts = np.diff(off)
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), counts)
    d = pc.dictionary_encode(toks)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    code = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = d.dictionary
    order = np.lexsort((code, doc_rep))
    s_doc = doc_rep[order]
    s_code = code[order]
    if len(s_doc):
        new_run = np.empty(len(s_doc), dtype=bool)
        new_run[0] = True
        np.logical_or(s_doc[1:] != s_doc[:-1], s_code[1:] != s_code[:-1],
                      out=new_run[1:])
        run_starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(run_starts, len(s_doc)))
    else:
        run_starts = np.empty(0, dtype=np.int64)
        run_len = np.empty(0, dtype=np.int64)
    run_doc = s_doc[run_starts] if len(run_starts) else run_starts
    return vocab, doc_rep, code, s_doc, s_code, run_starts, run_len, \
        run_doc, counts


def _repetition_batch(t: pa.Table) -> pa.Table:
    n = t.num_rows
    if n == 0:
        return REPETITION_SCHEMA.empty_table()
    (_, _, _, _, _, run_starts, run_len, run_doc,
     counts) = _doc_term_runs(t["text"], n)
    n_distinct = np.bincount(run_doc, minlength=n).astype(np.int64) \
        if len(run_doc) else np.zeros(n, dtype=np.int64)
    top = np.zeros(n, dtype=np.int64)
    if len(run_doc):
        doc_first = np.empty(len(run_doc), dtype=bool)
        doc_first[0] = True
        np.not_equal(run_doc[1:], run_doc[:-1], out=doc_first[1:])
        doc_run_starts = np.flatnonzero(doc_first)
        top[run_doc[doc_run_starts]] = np.maximum.reduceat(
            run_len, doc_run_starts)
    counts = counts.astype(np.int64)
    safe = np.where(counts > 0, counts, 1).astype(np.float64)
    dup_frac = np.where(counts > 0, (counts - n_distinct) / safe, 0.0)
    top_frac = np.where(counts > 0, top / safe, 0.0)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_tokens": pa.array(counts),
        "n_distinct_tokens": pa.array(n_distinct),
        "dup_token_frac": pa.array(dup_frac),
        "top_token_count": pa.array(top),
        "top_token_frac": pa.array(top_frac),
    })


def repetition_signals(docs):
    """Gopher-style within-doc repetition: distinct-token and
    most-frequent-token fractions, per document.

    Purely batch-local (no shuffle): one tokenize + one lexsort per
    batch; ratios are int64/int64 IEEE divisions matching the SQL
    oracle bit-for-bit.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()
    out = docs.select_columns(["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pyarrow")
    return stamp_schema(out, REPETITION_SCHEMA)


TOKEN_ENTROPY_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("n_tokens", pa.int64()),
    ("n_distinct_tokens", pa.int64()),
    ("token_entropy", pa.float64()),
])


def _entropy_batch(t: pa.Table) -> pa.Table:
    n = t.num_rows
    if n == 0:
        return TOKEN_ENTROPY_SCHEMA.empty_table()
    from smqtk_indexing_ray.functions.metrics import round6
    (_, _, _, _, _, run_starts, run_len, run_doc,
     counts) = _doc_term_runs(t["text"], n)
    counts = counts.astype(np.int64)
    n_distinct = np.bincount(run_doc, minlength=n).astype(np.int64) \
        if len(run_doc) else np.zeros(n, dtype=np.int64)
    s = np.zeros(n, dtype=np.float64)
    if len(run_doc):
        rl = run_len.astype(np.float64)
        term_s = rl * np.log2(rl)          # c * log2(c) per (doc, term)
        doc_first = np.empty(len(run_doc), dtype=bool)
        doc_first[0] = True
        np.not_equal(run_doc[1:], run_doc[:-1], out=doc_first[1:])
        doc_run_starts = np.flatnonzero(doc_first)
        s[run_doc[doc_run_starts]] = np.add.reduceat(
            term_s, doc_run_starts)
    safe = np.where(counts > 0, counts, 1).astype(np.float64)
    ent = np.where(counts > 0, np.log2(safe) - s / safe, 0.0)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_tokens": pa.array(counts),
        "n_distinct_tokens": pa.array(n_distinct),
        "token_entropy": pa.array(round6(ent)),
    })


def token_entropy(docs):
    """Shannon entropy of each document's token distribution (bits):
    ``H = log2(n) - sum_t(c_t * log2(c_t)) / n`` — the canonical
    diversity measure behind gibberish/template filters (a doc that
    repeats one phrase has near-zero entropy; natural prose sits near
    ``log2(n_distinct)``).

    Purely batch-local like :func:`repetition_signals` (same
    one-lexsort ``(doc, term)`` run structure, no shuffle); the entropy
    double goes through ``round6`` because the ``c*log2(c)`` summation
    order differs from the SQL aggregate's (everything else is exact
    int64).
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()
    out = docs.select_columns(["doc_id", "text"]).map_batches(
        _entropy_batch, batch_format="pyarrow")
    return stamp_schema(out, TOKEN_ENTROPY_SCHEMA)


def _term_freq_partial(t: pa.Table) -> pa.Table:
    n = t.num_rows
    if n == 0:
        return TERM_FREQ_SCHEMA.empty_table()
    (vocab, _, code, _, s_code, run_starts, run_len, _,
     _) = _doc_term_runs(t["text"], n)
    v = len(vocab)
    if v == 0:
        return TERM_FREQ_SCHEMA.empty_table()
    cnt = np.bincount(code, minlength=v).astype(np.int64)
    # df partial: number of (doc, term) runs per term
    df = np.bincount(s_code[run_starts], minlength=v).astype(np.int64) \
        if len(run_starts) else np.zeros(v, dtype=np.int64)
    keep = cnt > 0
    return pa.table({
        "term": vocab.filter(pa.array(keep)),
        "cnt": pa.array(cnt[keep]),
        "df": pa.array(df[keep]),
    })


def term_frequencies(docs, *, min_count: int = 1):
    """Corpus-wide term frequency + document frequency.

    Partial-aggregate combiner shape: each batch emits one
    (term, cnt, df) row per distinct term it saw, so the groupby
    shuffles vocabulary-sized partials, never the token stream —
    the same pre-aggregation pattern as the windowed event counts
    (pipelines/events.py).
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    partial = docs.select_columns(["doc_id", "text"]).map_batches(
        _term_freq_partial, batch_format="pyarrow")
    g = sorted_group_agg(
        partial, key="term", aggs={"cnt": "sum", "df": "sum"},
        schema=pa.schema([("term", pa.string()), ("cnt", pa.int64()),
                          ("df", pa.int64())]))

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return TERM_FREQ_SCHEMA.empty_table()
        out = pa.table({
            "term": t["term"],
            "cnt": pc.cast(t["cnt"], pa.int64()),
            "df": pc.cast(t["df"], pa.int64()),
        })
        if min_count > 1:
            out = out.filter(pc.greater_equal(out["cnt"], min_count))
        return out

    return stamp_schema(g.map_batches(project, batch_format="pyarrow"),
                        TERM_FREQ_SCHEMA)


#: Broadcast-vocabulary gate for tfidf_top_terms: above this many
#: distinct terms the df table no longer belongs in every worker's heap —
#: prune with min_count/min_df first (the standard web-scale move is a
#: bounded vocabulary).
TFIDF_MAX_VOCAB = 4_000_000


def _collect_vocab(docs, max_vocab: int, *, caller: str):
    """Aggregate the corpus (term, cnt, df) table, gate it at
    ``max_vocab``, and return term-sorted numpy arrays ready for
    ``np.searchsorted`` lookup inside a broadcast scoring stage.

    The gate raises loudly instead of silently truncating: above it the
    vocabulary no longer belongs in every worker's heap and the caller
    must prune (``term_frequencies(min_count=...)``) or switch to the
    token-level shuffle-join formulation.
    """
    tf_tab = term_frequencies(docs).materialize()
    n_vocab = tf_tab.count()
    if n_vocab > max_vocab:
        raise ValueError(
            f"{caller}: vocabulary has {n_vocab} terms > max_vocab="
            f"{max_vocab}; prune with term_frequencies(min_count=...) and "
            "a bounded vocabulary before broadcasting")
    if n_vocab:
        vt = pa.concat_tables(
            [b for b in tf_tab.iter_batches(batch_size=None,
                                            batch_format="pyarrow")]
        ).combine_chunks()
    else:
        vt = TERM_FREQ_SCHEMA.empty_table()
    terms = vt["term"].to_numpy(zero_copy_only=False).astype(object)
    cnts = vt["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    dfs = vt["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(terms, kind="stable")
    return terms[order], cnts[order], dfs[order]


def tfidf_top_terms(docs, *, k: int = 3, max_vocab: int = TFIDF_MAX_VOCAB):
    """Per-document top-k terms by ``tf * N / df`` (an ln-free tf-idf
    whose score is exactly reproducible in SQL: ``CAST(tf*N AS
    DOUBLE)/df``), ties broken by term ascending.

    Two passes: a vocabulary-sized (term, df) table is aggregated once,
    gated at ``max_vocab``, and broadcast via ``ray.put``; the scoring
    pass is then batch-local (tokenize + lexsort + rank, no shuffle).
    """
    import ray

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    sorted_terms, sorted_cnt, sorted_df = _collect_vocab(
        docs, max_vocab, caller="tfidf_top_terms")
    ref = ray.put((sorted_terms, sorted_df))
    n_docs = docs.count()

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return TFIDF_SCHEMA.empty_table()
        sorted_terms, sorted_df = ray.get(ref)
        (vocab, _, _, _, s_code, run_starts, run_len, run_doc,
         _) = _doc_term_runs(t["text"], t.num_rows)
        if not len(run_starts):
            return TFIDF_SCHEMA.empty_table()
        # one row per (doc, term): tf = run length
        batch_terms = vocab.to_numpy(zero_copy_only=False).astype(object)
        vidx = np.clip(np.searchsorted(sorted_terms, batch_terms), 0,
                       max(len(sorted_terms) - 1, 0))
        # every batch term exists in the corpus vocabulary by
        # construction; a miss means the upstream dataset is
        # nondeterministic between the count and score passes
        if len(sorted_terms) == 0 or not (
                sorted_terms[vidx] == batch_terms).all():
            raise ValueError(
                "tfidf: batch term missing from the corpus vocabulary; "
                "upstream dataset is nondeterministic between passes")
        term_df = sorted_df[vidx]
        tf = run_len.astype(np.int64)
        df_run = term_df[s_code[run_starts]]
        sc = (tf * np.int64(n_docs)).astype(np.float64) / \
            df_run.astype(np.float64)
        # rank within doc by (score desc, term asc); the broadcast vocab
        # index is lexicographic, so it doubles as the term tiebreak
        tkey = vidx[s_code[run_starts]]
        o = np.lexsort((tkey, -sc, run_doc))
        rd, rsc, rtf = run_doc[o], sc[o], tf[o]
        rterm = s_code[run_starts][o]
        doc_first = np.empty(len(rd), dtype=bool)
        doc_first[0] = True
        np.not_equal(rd[1:], rd[:-1], out=doc_first[1:])
        doc_sizes = np.diff(np.append(np.flatnonzero(doc_first), len(rd)))
        rank = grouped_arange(doc_sizes)
        keep = rank < k
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(doc_ids[rd[keep]]),
            "term": vocab.take(pa.array(rterm[keep], pa.int64())),
            "tf": pa.array(rtf[keep]),
            "score": pa.array(rsc[keep]),
        })

    out = docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")
    return stamp_schema(out, TFIDF_SCHEMA)


DSIR_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("n_tokens", pa.int64()),
    ("weight", pa.float64()),
])


def dsir_weights(docs, *, target_lang: str = "en", alpha: float = 0.5,
                 max_vocab: int = TFIDF_MAX_VOCAB):
    """DSIR-style importance weights (Xie et al., NeurIPS'23 "Data
    Selection for Language Models via Importance Resampling",
    arXiv:2302.03169): per-document log importance weight under unigram
    bag-of-words models of a TARGET slice (``lang == target_lang``)
    versus the rest of the corpus — the static data-selection score a
    pretraining pipeline samples against.

    ``weight(d) = Σ_runs tf(d, t) · [ln p_tgt(t) − ln p_raw(t)]`` with
    add-``alpha`` smoothing over the union vocabulary ``V``:
    ``p_side(t) = (cnt_side(t) + alpha) / (tot_side + alpha·|V|)``.
    Positive = looks like the target distribution.

    Two passes, both combiner-shaped: pass 1 aggregates per-term
    (target_cnt, raw_cnt) partials (the shuffle carries vocabulary
    rows, never tokens), gated at ``max_vocab`` exactly like the tf-idf
    broadcast; pass 2 broadcasts the sorted term -> log-ratio arrays
    once via ``ray.put`` and scores each batch locally (one
    searchsorted per batch-distinct term + a per-doc bincount sum).
    The paper's hashed-n-gram bucketing is the above-the-gate move: it
    bounds |V|, the only thing the gate protects.

    Output: ``doc_id, n_tokens, weight`` (round6 — the summation-order
    contract of token_entropy/bm25 applies).  Token-less documents are
    omitted.
    """
    import ray

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.functions.metrics import round6
    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    cnt_schema = pa.schema([("term", pa.string()), ("tgt", pa.int64()),
                            ("raw", pa.int64())])

    def count_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0 or "text" not in t.column_names:
            return cnt_schema.empty_table()
        vocab, doc_rep, code, _, _, _, _, _, _ = _doc_term_runs(
            t["text"], n)
        v = len(vocab)
        if v == 0:
            return cnt_schema.empty_table()
        is_tgt = pc.fill_null(
            pc.equal(t["lang"], target_lang), False).to_numpy(
            zero_copy_only=False)
        tok_tgt = is_tgt[doc_rep]
        tgt = np.bincount(code[tok_tgt], minlength=v).astype(np.int64)
        raw = np.bincount(code[~tok_tgt], minlength=v).astype(np.int64)
        return pa.table({"term": vocab, "tgt": pa.array(tgt),
                         "raw": pa.array(raw)}, schema=cnt_schema)

    agg = sorted_group_agg(
        docs.select_columns(["doc_id", "text", "lang"]).map_batches(
            count_partial, batch_format="pyarrow"),
        key="term", aggs={"tgt": "sum", "raw": "sum"},
        schema=cnt_schema).materialize()
    n_vocab = agg.count()
    if n_vocab == 0:
        import ray.data as rd
        return rd.from_arrow(DSIR_SCHEMA.empty_table())
    if n_vocab > max_vocab:
        raise ValueError(
            f"dsir_weights: vocabulary has {n_vocab} terms > max_vocab="
            f"{max_vocab}; hash features into bounded buckets (the "
            "DSIR paper's move) or prune before broadcasting")
    vt = pa.concat_tables(
        [b for b in agg.iter_batches(batch_size=None,
                                     batch_format="pyarrow")]
    ).combine_chunks()
    terms = vt["term"].to_numpy(zero_copy_only=False).astype(object)
    tgt = vt["tgt"].to_numpy(zero_copy_only=False).astype(np.float64)
    raw = vt["raw"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(terms, kind="stable")
    terms, tgt, raw = terms[order], tgt[order], raw[order]
    r = (np.log((tgt + alpha) / (tgt.sum() + alpha * n_vocab))
         - np.log((raw + alpha) / (raw.sum() + alpha * n_vocab)))
    ref = ray.put((terms, r))

    def score(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0 or "text" not in t.column_names:
            return DSIR_SCHEMA.empty_table()
        sorted_terms, ratio = ray.get(ref)
        (vocab, _, _, _, s_code, run_starts, run_len, run_doc,
         counts) = _doc_term_runs(t["text"], n)
        if not len(run_starts):
            return DSIR_SCHEMA.empty_table()
        batch_terms = vocab.to_numpy(zero_copy_only=False).astype(object)
        # every batch term is in the union vocabulary by construction
        # (pass 1 re-executed the same upstream); a miss means the
        # upstream dataset is nondeterministic between passes — fail
        # loudly instead of silently taking a neighbor term's ratio
        pos = np.clip(np.searchsorted(sorted_terms, batch_terms), 0,
                      max(len(sorted_terms) - 1, 0))
        if len(sorted_terms) == 0 or not (
                sorted_terms[pos] == batch_terms).all():
            raise ValueError(
                "dsir_weights: batch term missing from the pass-1 "
                "vocabulary; upstream dataset is nondeterministic "
                "between passes")
        r_term = ratio[pos]
        contrib = run_len.astype(np.float64) * r_term[s_code[run_starts]]
        w = np.bincount(run_doc, weights=contrib, minlength=n)
        keep = counts > 0
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(doc_ids[keep].astype(np.int64)),
            "n_tokens": pa.array(counts[keep].astype(np.int64)),
            "weight": pa.array(round6(w[keep])),
        }, schema=DSIR_SCHEMA)

    out = docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")
    return stamp_schema(out, DSIR_SCHEMA)


def _pair_member(hot1: np.ndarray, hot2: np.ndarray,
                 a1: np.ndarray, a2: np.ndarray) -> np.ndarray:
    """Vectorized membership of 128-bit pairs (a1, a2) in the
    lexsorted hot set (hot1, hot2).  Runs of equal hot1 are collision
    runs (nearly always length 1); only those rare longer runs take the
    per-row fallback."""
    member = np.zeros(len(a1), dtype=bool)
    if not len(hot1) or not len(a1):
        return member
    lo = np.searchsorted(hot1, a1, side="left")
    hi = np.searchsorted(hot1, a1, side="right")
    span = hi - lo
    one = span == 1
    idx = np.where(one, lo, 0)
    member[one] = hot2[idx[one]] == a2[one]
    multi = np.flatnonzero(span > 1)
    for i in multi:
        member[i] = a2[i] in hot2[lo[i]:hi[i]]
    return member


#: Broadcast gate for the hot-line set: lines with df >= min_df are a
#: tiny fraction of a web corpus (boilerplate), but an adversarial
#: min_df=1 would broadcast every distinct line — refuse instead.
LINE_DEDUP_MAX_HOT = 8_000_000


def line_dedup(docs, *, min_df: int = 2, delim: str = "\n",
               max_hot_lines: int = LINE_DEDUP_MAX_HOT):
    """CCNet-style corpus-wide line dedup: drop every instance of any
    line occurring >= ``min_df`` times across the corpus, preserving
    line order within each doc.

    Pass 1 counts line frequencies with a vocabulary-sized partial
    aggregate (only 128-bit line hashes + counts cross the shuffle,
    never line text); the df >= min_df survivors — boilerplate, a tiny
    fraction by construction — are broadcast once via ``ray.put``
    (gated at ``max_hot_lines``).  Pass 2 is batch-local: split, hash,
    membership mask, rebuild with one Arrow ``binary_join``.
    """
    import ray

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    def _lines(texts) -> tuple[pa.ListArray, pa.Array, np.ndarray]:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(texts, ""), delim)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.values
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        return lists, flat, off

    def count_partial(t: pa.Table) -> pa.Table:
        schema = pa.schema([("h1", pa.int64()), ("h2", pa.int64()),
                            ("cnt", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        _, flat, _ = _lines(t["text"])
        h1 = hash_strings_u64(flat, hash_key=_LK1).view(np.int64)
        h2 = hash_strings_u64(flat, hash_key=_LK2).view(np.int64)
        order = np.lexsort((h2, h1))
        s1, s2 = h1[order], h2[order]
        if len(s1):
            new = np.empty(len(s1), dtype=bool)
            new[0] = True
            np.logical_or(s1[1:] != s1[:-1], s2[1:] != s2[:-1], out=new[1:])
            starts = np.flatnonzero(new)
            cnt = np.diff(np.append(starts, len(s1)))
        else:
            starts = np.empty(0, dtype=np.int64)
            cnt = starts
        return pa.table({"h1": pa.array(s1[starts]),
                         "h2": pa.array(s2[starts]),
                         "cnt": pa.array(cnt.astype(np.int64))})

    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    partial = docs.select_columns(["text"]).map_batches(
        count_partial, batch_format="pyarrow")
    hot = sorted_group_agg(
        partial, key=["h1", "h2"], aggs={"cnt": "sum"},
        schema=pa.schema([("h1", pa.int64()), ("h2", pa.int64()),
                          ("cnt", pa.int64())]))
    hot = hot.filter(expr=f"cnt >= {int(min_df)}").materialize()
    n_hot = hot.count()
    if n_hot > max_hot_lines:
        raise ValueError(
            f"line_dedup: {n_hot} hot lines > max_hot_lines="
            f"{max_hot_lines}; raise min_df (boilerplate should be a "
            "small fraction of distinct lines) or raise the gate")
    if n_hot:
        cols = {"h1": [], "h2": []}
        for b in hot.iter_batches(batch_size=None, batch_format="pyarrow"):
            cols["h1"].append(b["h1"].to_numpy(zero_copy_only=False))
            cols["h2"].append(b["h2"].to_numpy(zero_copy_only=False))
        hh1 = np.concatenate(cols["h1"]).astype(np.int64)
        hh2 = np.concatenate(cols["h2"]).astype(np.int64)
        o = np.lexsort((hh2, hh1))
        hot_ref = ray.put((hh1[o], hh2[o]))
    else:
        hot_ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))

    def scrub(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return LINE_DEDUP_SCHEMA.empty_table()
        hot1, hot2 = ray.get(hot_ref)
        _, flat, off = _lines(t["text"])
        h1 = hash_strings_u64(flat, hash_key=_LK1).view(np.int64)
        h2 = hash_strings_u64(flat, hash_key=_LK2).view(np.int64)
        member = _pair_member(hot1, hot2, h1, h2)
        keep = ~member
        n = t.num_rows
        n_lines = np.diff(off).astype(np.int64)
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), n_lines)
        kept_per_doc = np.bincount(doc_rep[keep], minlength=n) \
            .astype(np.int64)
        new_off = np.concatenate(([0], np.cumsum(kept_per_doc)))
        kept_lists = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), flat.filter(pa.array(keep)))
        clean = pc.binary_join(kept_lists, delim)
        return pa.table({
            "doc_id": t["doc_id"],
            "clean_text": pc.cast(clean, pa.string()),
            "n_lines": pa.array(n_lines),
            "n_removed": pa.array(n_lines - kept_per_doc),
        })

    out = docs.select_columns(["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow")
    return stamp_schema(out, LINE_DEDUP_SCHEMA)


TOKEN_CHUNKS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("n_tokens", pa.int64()),
    ("tokens_before", pa.int64()),
    ("chunk_id", pa.int64()),
])


def token_chunks(docs, *, budget: int = 4096, num_partitions: int = 32):
    """Assign every document to a fixed-token-budget training shard:
    ``chunk_id = tokens_before // budget`` where ``tokens_before`` is
    the exact corpus-wide running token total in ascending ``doc_id``
    order — the deterministic sharding pass that turns a cleaned corpus
    into ~budget-token chunks for sequence packing.

    One narrow sort (two int64 columns — token counting happens BEFORE
    the shuffle, so document text never moves) plus the O(blocks)
    boundary-carry prefix sum of stages/prefix.py; both ``tokens_before``
    and ``chunk_id`` are pure int64 arithmetic, bit-exact against the
    SQL window oracle.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.prefix import running_total

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")

    count_schema = pa.schema([("doc_id", pa.int64()),
                              ("n_tokens", pa.int64())])

    def count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return count_schema.empty_table()
        _, off = tokens_flat(t["text"], lowercase=False)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pa.array(np.diff(off).astype(np.int64)),
        })

    counts = docs.select_columns(["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow").repartition(num_partitions)
    pref = running_total(counts, order="doc_id", value="n_tokens",
                         out="tokens_before", schema=count_schema)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return TOKEN_CHUNKS_SCHEMA.empty_table()
        before = t["tokens_before"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "chunk_id", pa.array(before // np.int64(budget)))

    return stamp_schema(pref.map_batches(finish, batch_format="pyarrow"),
                        TOKEN_CHUNKS_SCHEMA)


HEAVY_HITTERS_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("cnt", pa.int64()),
])

#: Sentinel term for the per-batch token-total partial row.  Safe:
#: ``tokens_flat`` never emits the empty string (whitespace split with
#: empties filtered, same contract as the SQL ``x <> ''`` filter).
_HH_TOTAL = ""

#: Broadcast gate for the verified-candidate set.  The pigeonhole bound
#: caps candidates at one_in * n_batches, so hitting this means one_in
#: was set absurdly high for the corpus, not that the data is skewed.
HH_MAX_CANDIDATES = 8_000_000


def heavy_hitters(docs, *, one_in: int = 1000,
                  max_candidates: int = HH_MAX_CANDIDATES):
    """Exact corpus-wide heavy hitters: every term whose count clears
    one occurrence per ``one_in`` tokens (``cnt * one_in >=
    total_tokens``, pure int64 arithmetic — no float threshold).

    Two bounded-memory passes, so the full vocabulary never crosses a
    shuffle (unlike :func:`term_frequencies`, whose shuffle is
    vocabulary-sized — the right tool below ~1e7 distinct terms, the
    wrong one on a web crawl's long tail):

    1. **Candidates** (Misra-Gries pigeonhole): each batch emits only
       terms with ``cnt_b * one_in >= tokens_b`` — at most ``one_in``
       rows per batch since those terms each hold >= 1/one_in of the
       batch — plus one token-total row.  A term above the global
       threshold must be above the batch threshold in >= 1 batch
       (if ``cnt_b * one_in < tokens_b`` in every batch, summing gives
       ``cnt * one_in < total``), so the union is a candidate
       superset; the shuffle is O(one_in x n_batches) rows.
    2. **Verify**: the distinct candidate terms are broadcast once
       (``ray.put``, gated at ``max_candidates``); each batch emits
       exact counts for candidate terms only, and a final
       candidate-sized groupby-sum + integer filter keeps the true
       heavy hitters.  Output counts are exact, not estimates.

    The reference has no sketch operators; this is the §2.7
    "aggregations" surface (SURVEY.md) extended with the
    candidate-then-verify shape its `.nn` path uses for ANN
    (/root/reference/smqtk_indexing/impls/nn_index/lsh.py:489-518:
    approximate candidates, exact re-rank).
    """
    import ray

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    if one_in < 1:
        raise ValueError(f"one_in must be >= 1, got {one_in}")

    def candidates_partial(t: pa.Table) -> pa.Table:
        schema = pa.schema([("term", pa.string()), ("cnt", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        (vocab, _, code, _, _, _, _, _, counts) = _doc_term_runs(
            t["text"], t.num_rows)
        total = int(counts.sum())
        v = len(vocab)
        if v == 0:
            return pa.table({"term": pa.array([_HH_TOTAL]),
                             "cnt": pa.array([total], pa.int64())})
        cnt = np.bincount(code, minlength=v).astype(np.int64)
        keep = cnt * one_in >= total
        return pa.table({
            "term": pa.concat_arrays(
                [vocab.filter(pa.array(keep)).cast(pa.string()),
                 pa.array([_HH_TOTAL], pa.string())]),
            "cnt": pa.array(np.append(cnt[keep], total)),
        })

    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    partial = docs.select_columns(["doc_id", "text"]).map_batches(
        candidates_partial, batch_format="pyarrow")
    agg = sorted_group_agg(
        partial, key="term", aggs={"cnt": "sum"},
        schema=pa.schema([("term", pa.string()),
                          ("cnt", pa.int64())])).materialize()

    total_tokens = 0
    cand_chunks: list[np.ndarray] = []
    n_cand = 0
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        terms = b["term"].to_numpy(zero_copy_only=False).astype(object)
        is_total = terms == _HH_TOTAL
        if is_total.any():
            total_tokens += int(
                b["cnt"].to_numpy(zero_copy_only=False)[is_total].sum())
        cand_chunks.append(terms[~is_total])
        n_cand += int((~is_total).sum())
        if n_cand > max_candidates:
            raise ValueError(
                f"heavy_hitters: > {max_candidates} candidate terms; "
                "one_in is far larger than the batch count supports — "
                "lower one_in or raise max_candidates")
    cand = np.sort(np.concatenate(cand_chunks)) if cand_chunks else \
        np.empty(0, dtype=object)
    cand_ref = ray.put(cand)

    def verify_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return HEAVY_HITTERS_SCHEMA.empty_table()
        sorted_cand = ray.get(cand_ref)
        if not len(sorted_cand):
            return HEAVY_HITTERS_SCHEMA.empty_table()
        (vocab, _, code, _, _, _, _, _, _) = _doc_term_runs(
            t["text"], t.num_rows)
        v = len(vocab)
        if v == 0:
            return HEAVY_HITTERS_SCHEMA.empty_table()
        batch_terms = vocab.to_numpy(zero_copy_only=False).astype(object)
        pos = np.searchsorted(sorted_cand, batch_terms)
        pos_c = np.minimum(pos, len(sorted_cand) - 1)
        is_cand = sorted_cand[pos_c] == batch_terms
        if not is_cand.any():
            return HEAVY_HITTERS_SCHEMA.empty_table()
        cnt = np.bincount(code, minlength=v).astype(np.int64)
        keep = is_cand & (cnt > 0)
        return pa.table({
            "term": vocab.filter(pa.array(keep)).cast(pa.string()),
            "cnt": pa.array(cnt[keep]),
        })

    verified = docs.select_columns(["doc_id", "text"]).map_batches(
        verify_partial, batch_format="pyarrow")
    out = sorted_group_agg(
        verified, key="term", aggs={"cnt": "sum"},
        schema=pa.schema([("term", pa.string()), ("cnt", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return HEAVY_HITTERS_SCHEMA.empty_table()
        cnt = pc.cast(t["cnt"], pa.int64())
        tab = pa.table({"term": pc.cast(t["term"], pa.string()),
                        "cnt": cnt})
        mask = pc.greater_equal(
            pc.multiply_checked(cnt, pa.scalar(one_in, pa.int64())),
            pa.scalar(total_tokens, pa.int64()))
        return tab.filter(mask)

    return stamp_schema(out.map_batches(finish, batch_format="pyarrow"),
                        HEAVY_HITTERS_SCHEMA)


VOCAB_STATS_SCHEMA = pa.schema([
    ("n_terms", pa.int64()),
    ("n_tokens", pa.int64()),
    ("hapax_terms", pa.int64()),
])


def vocab_stats(docs):
    """Exact one-row corpus vocabulary summary: distinct terms, total
    tokens, and hapax legomena (terms occurring exactly once — the
    long-tail mass a tokenizer-training pass cares about).

    Rides :func:`term_frequencies`' vocabulary-sized shuffle, then folds
    to a single row with a bounded driver aggregate (three int64s).
    This is the exact twin of :func:`distinct_terms_hll`; above ~1e7
    distinct terms, the sketch is the right tool.
    """
    import ray.data as rd

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()
    from ray.data.aggregate import Count, Sum

    tf = term_frequencies(docs)

    def add_hapax(t: pa.Table) -> pa.Table:
        sch = pa.schema([("cnt", pa.int64()), ("is_hapax", pa.int64())])
        if t.num_rows == 0 or "cnt" not in t.column_names:
            return sch.empty_table()
        cnt = pc.cast(t["cnt"], pa.int64())
        return pa.table({
            "cnt": cnt,
            "is_hapax": pc.cast(pc.equal(cnt, 1), pa.int64()),
        })

    agg = tf.map_batches(add_hapax, batch_format="pyarrow").aggregate(
        Count(alias_name="n_terms"),
        Sum("cnt", alias_name="n_tokens"),
        Sum("is_hapax", alias_name="hapax_terms")) or {}
    row = pa.table({
        "n_terms": pa.array([int(agg.get("n_terms") or 0)], pa.int64()),
        "n_tokens": pa.array([int(agg.get("n_tokens") or 0)], pa.int64()),
        "hapax_terms": pa.array([int(agg.get("hapax_terms") or 0)],
                                pa.int64()),
    })
    return rd.from_arrow(row)


HLL_SCHEMA = pa.schema([
    ("n_distinct_est", pa.int64()),
    ("precision_p", pa.int64()),
    ("rel_error_bound", pa.float64()),
])

#: 16-byte key for the HLL token hash (independent of every other
#: hashing domain in the engine).
_HLL_KEY = "smqtk-ray-hll-01"


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (float ``log2`` mis-rounds
    near powers of two above 2**53)."""
    x = x.astype(np.uint64, copy=True)
    n = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        n[m] += s
        x[m] >>= np.uint64(s)
    return n + (x != 0)


def distinct_terms_hll(docs, *, p: int = 14):
    """Approximate corpus-wide distinct-term count via HyperLogLog with
    ``2**p`` registers (Flajolet et al., AofA 2007) — the bounded-memory
    scale twin of :func:`vocab_stats`: the shuffle carries at most
    ``2**p`` (register, max-rank) int64 rows per batch regardless of
    vocabulary size, where the exact path shuffles the full vocabulary
    (a web crawl's long tail is billions of distinct terms).

    Fully deterministic — keyed 64-bit token hash, no RNG — so retries
    are value-stable.  Register = top ``p`` hash bits; rank = leading
    zeros of the remaining ``w = 64-p`` bits + 1; merge = per-register
    max (an associative groupby ``Max``, the same partial-aggregate
    combiner shape as :func:`term_frequencies`).  Estimate uses the
    standard bias-corrected harmonic mean with linear counting below
    ``2.5m``; standard error ``1.04/sqrt(2**p)`` (~0.8% at p=14).

    Returns one row ``(n_distinct_est, precision_p, rel_error_bound)``.
    No SQL oracle (approximate by construction); pinned by a pytest
    accuracy bound against known-cardinality corpora instead.
    """
    import ray.data as rd

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()
    from ray.data.aggregate import Max

    from smqtk_indexing_ray.functions.tokenize import tokenize_flat
    from smqtk_indexing_ray.stages._util import collect_table

    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    w = 64 - p
    reg_schema = pa.schema([("reg", pa.int64()), ("rank", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return reg_schema.empty_table()
        h, _ = tokenize_flat(t["text"], lowercase=False,
                             hash_key=_HLL_KEY)
        if not len(h):
            return reg_schema.empty_table()
        idx = (h >> np.uint64(w)).astype(np.int64)
        rest = h & ((np.uint64(1) << np.uint64(w)) - np.uint64(1))
        rank = np.int64(w) + 1 - _bit_length_u64(rest)
        reg = np.zeros(m, dtype=np.int64)
        np.maximum.at(reg, idx, rank)
        nz = np.flatnonzero(reg)
        return pa.table({"reg": pa.array(nz),
                         "rank": pa.array(reg[nz])})

    g = (docs.select_columns(["doc_id", "text"])
         .map_batches(partial, batch_format="pyarrow")
         .groupby("reg").aggregate(Max("rank", alias_name="rank")))
    # <= 2**p rows by construction: bounded driver collect
    tab = collect_table(g, reg_schema)

    regs = np.zeros(m, dtype=np.int64)
    if tab.num_rows:
        regs[tab["reg"].to_numpy(zero_copy_only=False)] = \
            tab["rank"].to_numpy(zero_copy_only=False)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * float(np.log(m / zeros))
    row = pa.table({
        "n_distinct_est": pa.array([int(round(est))], pa.int64()),
        "precision_p": pa.array([p], pa.int64()),
        "rel_error_bound": pa.array([1.04 / float(np.sqrt(m))],
                                    pa.float64()),
    })
    return rd.from_arrow(row)


def novel_docs(new_docs, corpus, *, num_partitions: int = 16):
    """Incremental ingest dedup: new docs whose exact text does not
    already exist in the corpus (the batch-vs-index anti-join an
    update_index call runs before adding,
    /root/reference/smqtk_indexing/interfaces/nn_index.py:103-118).

    Both sides are reduced to 128-bit content hashes before the
    anti-join shuffle (16 B/row); the corpus side is first collapsed to
    distinct hashes so the join's build side is bounded by distinct
    texts, not corpus rows.
    """
    from smqtk_indexing_ray.context import NARROW_JOIN_HINT, \
        ensure_data_context
    ensure_data_context()
    from ray.data.aggregate import Count

    from smqtk_indexing_ray.pipelines.analysis import _hash_text
    from smqtk_indexing_ray.stages._util import drop_empty_blocks

    hash_schema = pa.schema([("doc_id", pa.int64()), ("h1", pa.int64()),
                             ("h2", pa.int64())])
    hn = new_docs.select_columns(["doc_id", "text"]).map_batches(
        _hash_text, batch_format="pyarrow")
    hn = drop_empty_blocks(hn, hash_schema)
    hc = corpus.select_columns(["doc_id", "text"]).map_batches(
        _hash_text, batch_format="pyarrow")
    hc = hc.groupby(["h1", "h2"]).aggregate(Count(alias_name="n"))
    hc = drop_empty_blocks(hc, pa.schema([("h1", pa.int64()),
                                          ("h2", pa.int64()),
                                          ("n", pa.int64())]))
    j = hn.join(hc, join_type="left_anti", on=("h1", "h2"),
                num_partitions=num_partitions,
                partition_size_hint=NARROW_JOIN_HINT)

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        return t.select(["doc_id"])

    return stamp_schema(j.map_batches(project, batch_format="pyarrow"),
                        pa.schema([("doc_id", pa.int64())]))


BIGRAM_SCHEMA = pa.schema([
    ("w1", pa.string()),
    ("w2", pa.string()),
    ("cnt", pa.int64()),
    ("lift", pa.float64()),
])


def top_bigrams(docs, *, k: int = 100, min_count: int = 2):
    """Corpus-wide top-k bigram collocations by count, with the exact
    lift score ``cnt(w1 w2) * N / (cnt(w1) * cnt(w2))`` — the
    phrase-mining pass a tokenizer/vocabulary build runs over a corpus
    (lift is PMI without the log, so the score stays a pure int64
    product ratio and the SQL oracle is bit-exact: int64 -> double
    conversion and one IEEE division round identically on both sides).

    Shape: the bigram counts ride the same partial-aggregate combiner
    as :func:`term_frequencies` (each batch emits one row per distinct
    adjacent pair it saw — pairs never span documents — so the shuffle
    is bigram-vocabulary-sized, never the token stream).  After the
    ``min_count`` filter, each output block keeps only its local top-k
    (the global top-k is a subset of the union of per-block top-ks),
    so the final exact sort runs on <= k * blocks rows driver-side.
    Unigram counts for the <= 2k surviving terms come from a filtered
    scan of :func:`term_frequencies` — no second shuffle, no broadcast
    of the full vocabulary.

    Ties at the k-th count are broken by (w1, w2) ascending on both
    sides, so the selected SET is deterministic.
    """
    import ray.data as rd

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()
    from ray.data.aggregate import Sum

    from smqtk_indexing_ray.stages._util import collect_table

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    pair_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                             ("cnt", pa.int64())])
    from smqtk_indexing_ray.functions.tokenize import tokens_flat

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        toks, off = tokens_flat(t["text"], lowercase=False)
        total = len(toks)
        if total < 2:
            return pair_schema.empty_table()
        valid = np.ones(total - 1, dtype=bool)
        # pair (i, i+1) crosses a doc boundary when i+1 is a doc start
        starts = np.asarray(off[1:-1], dtype=np.int64) - 1
        starts = starts[(starts >= 0) & (starts < total - 1)]
        valid[starts] = False
        d = pc.dictionary_encode(toks)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        code = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary
        v = len(vocab)
        c1, c2 = code[:-1][valid], code[1:][valid]
        if not len(c1):
            return pair_schema.empty_table()
        key = c1 * v + c2
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "w1": vocab.take(pa.array(uk // v, pa.int64())).cast(
                pa.string()),
            "w2": vocab.take(pa.array(uk % v, pa.int64())).cast(
                pa.string()),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    g = sorted_group_agg(
        docs.select_columns(["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow"),
        key=["w1", "w2"], aggs={"cnt": "sum"},
        schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                          ("cnt", pa.int64())]))
    if min_count > 1:
        g = g.filter(expr=f"cnt >= {int(min_count)}")

    sort_keys = [("cnt", "descending"), ("w1", "ascending"),
                 ("w2", "ascending")]

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cnt" not in t.column_names:
            return pair_schema.empty_table()
        t = pa.table({"w1": pc.cast(t["w1"], pa.string()),
                      "w2": pc.cast(t["w2"], pa.string()),
                      "cnt": pc.cast(t["cnt"], pa.int64())})
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        return t.take(idx.slice(0, k))

    top = collect_table(g.map_batches(prune, batch_format="pyarrow"),
                        pair_schema)
    if top.num_rows > k:
        idx = pc.sort_indices(top, sort_keys=sort_keys)
        top = top.take(idx.slice(0, k))

    tf = term_frequencies(docs).materialize()
    n_tokens = int((tf.aggregate(Sum("cnt", alias_name="n")) or {})
                   .get("n") or 0)
    if top.num_rows == 0:
        return rd.from_arrow(BIGRAM_SCHEMA.empty_table())

    w1 = top["w1"].to_numpy(zero_copy_only=False).astype(object)
    w2 = top["w2"].to_numpy(zero_copy_only=False).astype(object)
    need = np.sort(np.unique(np.concatenate([w1, w2])))

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "term" not in t.column_names:
            return TERM_FREQ_SCHEMA.empty_table()
        terms = t["term"].to_numpy(zero_copy_only=False).astype(object)
        pos = np.minimum(np.searchsorted(need, terms), len(need) - 1)
        m = need[pos] == terms
        if not m.any():
            return TERM_FREQ_SCHEMA.empty_table()
        return pa.table({
            "term": pc.cast(t["term"], pa.string()).filter(pa.array(m)),
            "cnt": pc.cast(t["cnt"], pa.int64()).filter(pa.array(m)),
            "df": pc.cast(t["df"], pa.int64()).filter(pa.array(m)),
        })

    uc = collect_table(tf.map_batches(pick, batch_format="pyarrow"),
                       TERM_FREQ_SCHEMA)
    uterm = uc["term"].to_numpy(zero_copy_only=False).astype(object)
    ucnt = uc["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(uterm, kind="stable")
    uterm, ucnt = uterm[order], ucnt[order]

    def lookup(ws: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(uterm, ws)
        # every top-bigram term occurs in the corpus by construction
        return ucnt[pos]

    cnt12 = top["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    num = (cnt12 * np.int64(n_tokens)).astype(np.float64)
    den = (lookup(w1) * lookup(w2)).astype(np.float64)
    out = pa.table({
        "w1": top["w1"], "w2": top["w2"],
        "cnt": pa.array(cnt12),
        "lift": pa.array(num / den),
    })
    return rd.from_arrow(out)


DOC_COMMONNESS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("n_tokens", pa.int64()),
    ("sum_cnt", pa.int64()),
    ("min_cnt", pa.int64()),
    ("mean_cnt", pa.float64()),
])


def doc_commonness(docs, *, max_vocab: int = TFIDF_MAX_VOCAB):
    """Unigram-frequency document score: for each doc, the sum / min /
    mean corpus frequency of its tokens — the exact-arithmetic cousin
    of the CCNet/Gopher unigram-LM "perplexity" quality filter (a doc
    of globally rare tokens scores low ``mean_cnt`` and has a tiny
    ``min_cnt``; machine-generated common-word soup scores high).

    Two passes, same shape as :func:`tfidf_top_terms`: the corpus
    (term, cnt) table is aggregated from vocabulary-sized partials,
    gated at ``max_vocab`` (loud ``ValueError`` above it — prune or use
    the token-level shuffle-join formulation instead of broadcasting),
    and broadcast once via ``ray.put``; the scoring pass is then
    batch-local lookup (``np.searchsorted`` over the term-sorted vocab)
    with zero shuffle.  Docs with no tokens emit no row (the SQL join
    drops them the same way).

    Every output is exact: counts are int64 end-to-end (per-doc sums
    via ``np.add.reduceat`` over the doc-sorted run stream — no float
    accumulator), and ``mean_cnt = CAST(sum_cnt AS DOUBLE)/n_tokens``
    is a single IEEE division on both sides, so the DuckDB oracle is
    bit-exact.

    Reference parity: frequency-weighted scoring generalizes the
    reference's descriptor-count statistics surface
    (/root/reference/smqtk_indexing/interfaces/nn_index.py:60-74,
    count()); the unigram-LM filter itself is the webtext analog.
    """
    import ray

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    sorted_terms, sorted_cnt, _ = _collect_vocab(
        docs, max_vocab, caller="doc_commonness")
    ref = ray.put((sorted_terms, sorted_cnt))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return DOC_COMMONNESS_SCHEMA.empty_table()
        terms_sorted, cnt_sorted = ray.get(ref)
        (vocab, _, _, _, s_code, run_starts, run_len, run_doc,
         counts) = _doc_term_runs(t["text"], t.num_rows)
        if not len(run_starts):
            return DOC_COMMONNESS_SCHEMA.empty_table()
        batch_terms = vocab.to_numpy(zero_copy_only=False).astype(object)
        vidx = np.clip(np.searchsorted(terms_sorted, batch_terms), 0,
                       max(len(terms_sorted) - 1, 0))
        # every batch term exists in the corpus vocabulary by
        # construction; a miss means the upstream dataset is
        # nondeterministic between the count and score passes
        if len(terms_sorted) == 0 or not (
                terms_sorted[vidx] == batch_terms).all():
            raise ValueError(
                "doc_commonness: batch term missing from the corpus "
                "vocabulary; upstream dataset is nondeterministic "
                "between passes")
        cnt_run = cnt_sorted[vidx][s_code[run_starts]]
        tf = run_len.astype(np.int64)
        # run_doc is nondecreasing (lexsort is doc-primary): reduceat per doc
        doc_first = np.empty(len(run_doc), dtype=bool)
        doc_first[0] = True
        np.not_equal(run_doc[1:], run_doc[:-1], out=doc_first[1:])
        starts = np.flatnonzero(doc_first)
        sum_cnt = np.add.reduceat(tf * cnt_run, starts)
        min_cnt = np.minimum.reduceat(cnt_run, starts)
        uniq_doc = run_doc[starts]
        n_tok = counts[uniq_doc].astype(np.int64)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(doc_ids[uniq_doc]),
            "n_tokens": pa.array(n_tok),
            "sum_cnt": pa.array(sum_cnt),
            "min_cnt": pa.array(min_cnt),
            "mean_cnt": pa.array(sum_cnt.astype(np.float64)
                                 / n_tok.astype(np.float64)),
        })

    out = docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")
    return stamp_schema(out, DOC_COMMONNESS_SCHEMA)


PARA_DEDUP_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
])

_PARA_POS_CAP = 1 << 20        # max paragraphs per doc in the enc packing
_PK1 = "smqtk-ray-para-1"
_PK2 = "smqtk-ray-para-2"


def paragraph_dedup(docs, *, words_per_para: int = 10,
                    num_partitions: int = 16):
    """C4-style keep-first paragraph dedup: chunk each doc's token
    stream into ``words_per_para``-word paragraphs (last one short),
    keep only the globally FIRST occurrence (by ``(doc_id, position)``)
    of each distinct paragraph, and rebuild every doc from its
    surviving paragraphs (possibly empty).  Unlike :func:`line_dedup`
    (CCNet: drop ALL instances of hot lines) this is the C4 rule — the
    first copy survives, later copies are scrubbed.

    Distribution: paragraphs explode batch-locally into narrow rows
    ``(h1, h2, enc, para)`` where ``enc = doc_id * 2^20 + position``
    orders occurrences globally; ONE sort by the 128-bit paragraph hash
    attaches each group's min enc (:func:`stages.agg.sorted_first_attach`
    — ``min(enc) OVER (PARTITION BY hash)``), survivors filter
    batch-locally, and ONE sort back by ``enc`` rebuilds docs with the
    ordered ``concat`` agg (:func:`stages.agg.sorted_group_agg`).  Docs
    whose every paragraph was claimed elsewhere re-enter as empty text
    via a narrow left attach on ``doc_id``.  Total shuffle traffic: the
    paragraph text crosses twice (inherent: once grouped by content,
    once grouped by doc), plus 24 B/paragraph of keys.

    Reference analog: the keep-first representative selection of the
    LSH dedup path (min doc_id per cluster,
    /root/reference/smqtk_indexing/impls/nn_index/lsh.py:350-383 merges
    per-key sets keyed by first arrival) applied at paragraph rather
    than document granularity; the reference has no sub-document dedup.
    """
    import ray.data as rd

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import (
        sorted_first_attach,
        sorted_group_agg,
    )
    from smqtk_indexing_ray.stages.attach import sort_attach

    if words_per_para < 1:
        raise ValueError("words_per_para must be >= 1")

    ex_schema = pa.schema([
        ("h1", pa.int64()), ("h2", pa.int64()),
        ("enc", pa.int64()), ("para", pa.string()),
    ])

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return ex_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size and int(ids.max()) >= (1 << 42):
            raise ValueError(
                "paragraph_dedup: doc_id >= 2^42 overflows the "
                "(doc_id, position) int64 packing")
        flat, off = tokens_flat(t["text"], lowercase=False)
        counts = np.diff(off)
        n_paras = (counts + words_per_para - 1) // words_per_para
        if n_paras.size and int(n_paras.max()) >= _PARA_POS_CAP:
            raise ValueError(
                f"paragraph_dedup: a doc has >= {_PARA_POS_CAP} "
                f"paragraphs; raise words_per_para")
        pos = grouped_arange(n_paras)
        starts = np.repeat(off[:-1], n_paras) + pos * words_per_para
        # paragraphs tile the flat token stream contiguously, so the
        # run starts + the stream end ARE the list offsets
        lists = pa.LargeListArray.from_arrays(
            pa.array(np.append(starts, off[-1]), pa.int64()), flat)
        paras = pc.binary_join(lists, " ")
        enc = np.repeat(ids, n_paras) * _PARA_POS_CAP + pos
        return pa.table({
            "h1": pa.array(
                hash_strings_u64(paras, hash_key=_PK1).view(np.int64)),
            "h2": pa.array(
                hash_strings_u64(paras, hash_key=_PK2).view(np.int64)),
            "enc": pa.array(enc),
            "para": paras,
        }, schema=ex_schema)

    ex = docs.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")
    att = sorted_first_attach(ex, key=["h1", "h2"], value="enc",
                              out="min_enc", num_blocks=num_partitions,
                              schema=ex_schema)

    kept_schema = pa.schema([
        ("doc_id", pa.int64()), ("enc", pa.int64()),
        ("para", pa.string()),
    ])

    def keep_first(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "enc" not in t.column_names:
            return kept_schema.empty_table()
        m = pc.equal(t["enc"], t["min_enc"])
        s = t.filter(m)
        return pa.table({
            "doc_id": pc.divide(s["enc"], _PARA_POS_CAP),
            "enc": s["enc"],
            "para": s["para"],
        }, schema=kept_schema)

    kept = att.map_batches(keep_first, batch_format="pyarrow")
    rebuilt = sorted_group_agg(
        kept, key="doc_id", aggs={"text": ("para", "concat")},
        order="enc", num_blocks=num_partitions, schema=kept_schema,
        concat_sep=" ")

    ids_schema = pa.schema([("doc_id", pa.int64())])
    ids = docs.select_columns(["doc_id"])
    out = sort_attach(
        ids, rebuilt, key="doc_id", payload_key="doc_id",
        payload_cols=["text"], rows_schema=ids_schema,
        payload_schema=pa.schema([("doc_id", pa.int64()),
                                  ("text", pa.string())]))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return PARA_DEDUP_SCHEMA.empty_table()
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pc.fill_null(t["text"], ""),
        }, schema=PARA_DEDUP_SCHEMA)

    return stamp_schema(out.map_batches(finish, batch_format="pyarrow"),
                        PARA_DEDUP_SCHEMA)


VOCAB_OVERLAP_SCHEMA = pa.schema([
    ("source_a", pa.string()), ("source_b", pa.string()),
    ("n_common_terms", pa.int64()),
    ("vocab_a", pa.int64()), ("vocab_b", pa.int64()),
    ("jaccard", pa.float64()),
])

_SRC_TERM_SCHEMA = pa.schema([
    ("term", pa.string()), ("source", pa.string()),
])


def _group_term_partial(t: pa.Table, group_col: str):
    """Shared (group, term) batch partial: tokenize, dictionary-encode
    both axes, and collapse to distinct packed keys.  Returns ``(group
    values, term values, counts)`` Arrow/numpy arrays or ``None`` for
    an empty batch — the kernel behind both the per-source vocabulary
    and the per-language term-count partials."""
    if t.num_rows == 0:
        return None
    toks, off = tokens_flat(t["text"], lowercase=False)
    if len(toks) == 0:
        return None
    from smqtk_indexing_ray.functions.hashing import dict_codes
    counts = np.diff(off)
    g_vals, g_code = dict_codes(
        pc.fill_null(t[group_col].combine_chunks(), ""))
    g_rep = np.repeat(g_code, counts)
    t_vals, tcode = dict_codes(toks)
    v = len(t_vals)
    uniq, cnts = np.unique(g_rep * v + tcode, return_counts=True)
    return (g_vals.take(pa.array(uniq // v, pa.int64())),
            t_vals.take(pa.array(uniq % v, pa.int64())),
            cnts.astype(np.int64))


def _src_term_partial(t: pa.Table) -> pa.Table:
    """Distinct (term, source) pairs seen in one batch — the partial
    that keeps the global distinct sort vocabulary-sized, never
    token-stream-sized."""
    part = _group_term_partial(t, "source")
    if part is None:
        return _SRC_TERM_SCHEMA.empty_table()
    src, term, _ = part
    return pa.table({"term": term, "source": src},
                    schema=_SRC_TERM_SCHEMA)


def source_vocab_overlap(docs):
    """Pairwise vocabulary Jaccard between sources — the
    domain-contamination / register-drift scan (how much of source A's
    vocabulary also appears in source B's).

    Shape: per-batch distinct (term, source) partials, one sorted
    global distinct, then join-free source pairs per term
    (``stages/pairs.sorted_self_pairs`` — runs are at most #sources
    long) and a pair-count sort.  The final assembly joins two tables
    bounded by #sources and #sources**2 rows on the driver, never data.
    Only pairs sharing at least one term are emitted (matching the
    inner-join oracle).

    Output: ``source_a, source_b (a < b), n_common_terms, vocab_a,
    vocab_b, jaccard`` — jaccard an exact int64 ratio
    ``common / (vocab_a + vocab_b - common)``.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.pairs import sorted_self_pairs

    partial = docs.select_columns(["text", "source"]).map_batches(
        _src_term_partial, batch_format="pyarrow")
    distinct = sorted_group_agg(
        partial, key=["term", "source"], aggs={"n": "count"},
        schema=_SRC_TERM_SCHEMA).select_columns(
        ["term", "source"]).materialize()   # vocabulary-bounded

    vocab_sizes = sorted_group_agg(
        distinct, key="source", aggs={"v": "count"},
        schema=_SRC_TERM_SCHEMA)
    pairs = sorted_self_pairs(
        distinct, key="term", item="source", schema=_SRC_TERM_SCHEMA)
    pair_counts = sorted_group_agg(
        pairs, key=["source_a", "source_b"],
        aggs={"n_common_terms": "count"},
        schema=pa.schema([("source_a", pa.string()),
                          ("source_b", pa.string())]))

    # both tables are bounded by the number of sources, not the data
    vs = {r["source"]: int(r["v"]) for r in vocab_sizes.take_all()}
    rows = pair_counts.take_all()
    if not rows:
        return VOCAB_OVERLAP_SCHEMA.empty_table()
    sa = [r["source_a"] for r in rows]
    sb = [r["source_b"] for r in rows]
    inter = np.array([int(r["n_common_terms"]) for r in rows], np.int64)
    va = np.array([vs[s] for s in sa], np.int64)
    vb = np.array([vs[s] for s in sb], np.int64)
    return pa.table({
        "source_a": pa.array(sa, pa.string()),
        "source_b": pa.array(sb, pa.string()),
        "n_common_terms": pa.array(inter),
        "vocab_a": pa.array(va),
        "vocab_b": pa.array(vb),
        "jaccard": pa.array(inter.astype(np.float64)
                            / (va + vb - inter).astype(np.float64)),
    }, schema=VOCAB_OVERLAP_SCHEMA)


BM25_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("rank", pa.int64()),
    ("score", pa.float64()),
])

#: Query-term gate: BM25 broadcasts one (term, df) row per distinct
#: query term to every scoring task — fine for retrieval queries,
#: wrong for document-sized ones.
BM25_MAX_QUERY_TERMS = 256


def bm25_topk(docs, query: str, *, k: int = 20,
              k1: float = 1.2, b: float = 0.75):
    """BM25 retrieval (Robertson & Zaragoza 2009, public): top-``k``
    documents for a query string — the seed-corpus relevance filter
    (score a 100 TB crawl against a quality query, keep the tail).

    Two passes.  Pass 1 streams bounded partials — per-batch doc count,
    token-count sum, and per-query-term document frequency (at most
    ``len(query_terms) + 1`` rows per batch) — reduced on the driver.
    Pass 2 broadcasts the tiny (idf, N, avgdl) state in the task
    closure, scores batches vectorized over the (doc, term) run stream,
    rounds (``round6``, the oracle contract), and keeps only ``k``
    candidates per batch, so the final exact merge orders
    ``k x n_batches`` rows, never the corpus.  Distinct query terms
    (query term frequency ignored); ordering ``(round6(score) DESC,
    doc_id ASC)`` on BOTH sides of the oracle, so ties are exact.

    Float-parity notes: constants are combined identically to the SQL
    text ((k1 + 1.0), (1.0 - b)); idf/tf/length factors are evaluated
    in the same operation order; only the cross-term sum's association
    order differs, absorbed by round6 (the token_entropy precedent).
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.functions.metrics import round6

    q_terms = sorted(set(query.split()))
    if not q_terms:
        raise ValueError("bm25_topk: query has no terms")
    if len(q_terms) > BM25_MAX_QUERY_TERMS:
        raise ValueError(
            f"bm25_topk: {len(q_terms)} query terms exceeds "
            f"BM25_MAX_QUERY_TERMS={BM25_MAX_QUERY_TERMS}")
    q_sorted = np.array(q_terms, dtype=object)
    q_set = pa.array(q_terms, pa.string())

    part_schema = pa.schema([("term", pa.string()), ("df", pa.int64()),
                             ("n_docs", pa.int64()),
                             ("dl_sum", pa.int64())])

    def stats_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return part_schema.empty_table()
        flat, off = tokens_flat(t["text"], lowercase=False)
        rows_term = [None]
        rows_df = [0]
        if len(flat):
            m = pc.is_in(flat, value_set=q_set).to_numpy(
                zero_copy_only=False)
            if m.any():
                hit = flat.filter(pa.array(m))
                hit_doc = np.repeat(np.arange(n), np.diff(off))[m]
                hit_code = np.searchsorted(
                    q_sorted,
                    hit.to_numpy(zero_copy_only=False).astype(object))
                # distinct (doc, term) -> df partial per term
                uniq = np.unique(hit_doc * len(q_terms) + hit_code)
                dfp = np.bincount(uniq % len(q_terms),
                                  minlength=len(q_terms))
                for i, term in enumerate(q_terms):
                    if dfp[i]:
                        rows_term.append(term)
                        rows_df.append(int(dfp[i]))
        return pa.table({
            "term": pa.array(rows_term, pa.string()),
            "df": pa.array(rows_df, pa.int64()),
            "n_docs": pa.array([n] + [0] * (len(rows_term) - 1),
                               pa.int64()),
            "dl_sum": pa.array([int(len(flat))] + [0]
                               * (len(rows_term) - 1), pa.int64()),
        }, schema=part_schema)

    parts = docs.select_columns(["text"]).map_batches(
        stats_partial, batch_format="pyarrow").take_all()
    n_corpus = sum(int(r["n_docs"]) for r in parts)
    dl_sum = sum(int(r["dl_sum"]) for r in parts)
    df = dict.fromkeys(q_terms, 0)
    for r in parts:
        if r["term"] is not None:
            df[r["term"]] += int(r["df"])
    if n_corpus == 0:
        return BM25_SCHEMA.empty_table()
    avgdl = float(dl_sum) / float(n_corpus)
    dfv = np.array([df[term] for term in q_terms], np.float64)
    idf = np.log((float(n_corpus) - dfv + 0.5) / (dfv + 0.5) + 1.0)
    k1p1 = k1 + 1.0
    one_m_b = 1.0 - b

    cand_schema = pa.schema([("doc_id", pa.int64()),
                             ("score", pa.float64())])

    def score(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return cand_schema.empty_table()
        (vocab, _, _, _, s_code, run_starts, run_len, run_doc,
         counts) = _doc_term_runs(t["text"], n)
        if not len(run_starts):
            return cand_schema.empty_table()
        batch_terms = vocab.to_numpy(zero_copy_only=False).astype(object)
        pos = np.searchsorted(q_sorted, batch_terms)
        pos_c = np.minimum(pos, len(q_terms) - 1)
        is_q = q_sorted[pos_c] == batch_terms
        rt = s_code[run_starts]            # term code per run
        keep = is_q[rt]
        if not keep.any():
            return cand_schema.empty_table()
        rt = rt[keep]
        tf = run_len[keep].astype(np.float64)
        rdoc = run_doc[keep]
        dl = counts[rdoc].astype(np.float64)
        contrib = idf[pos_c[rt]] * (tf * k1p1) / (
            tf + k1 * (one_m_b + b * dl / avgdl))
        sc = np.zeros(n, dtype=np.float64)
        np.add.at(sc, rdoc, contrib)
        hit_docs = np.unique(rdoc)
        sc6 = round6(sc[hit_docs])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[hit_docs]
        # per-batch candidate cut on the FINAL ordering criterion
        order = np.lexsort((ids, -sc6))[:k]
        return pa.table({
            "doc_id": pa.array(ids[order].astype(np.int64)),
            "score": pa.array(sc6[order]),
        }, schema=cand_schema)

    cands = docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow").take_all()   # <= k per batch
    if not cands:
        return BM25_SCHEMA.empty_table()
    ids = np.array([r["doc_id"] for r in cands], np.int64)
    sc = np.array([r["score"] for r in cands], np.float64)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table({
        "doc_id": pa.array(ids[order]),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        "score": pa.array(sc[order]),
    }, schema=BM25_SCHEMA)


TOP_TERMS_LANG_SCHEMA = pa.schema([
    ("lang", pa.string()), ("term", pa.string()),
    ("cnt", pa.int64()), ("rank", pa.int64()),
])

_LANG_TERM_SCHEMA = pa.schema([
    ("lang", pa.string()), ("term", pa.string()), ("cnt", pa.int64()),
])


def _lang_term_partial(t: pa.Table) -> pa.Table:
    """Per-batch (lang, term, count) partials — vocabulary x langs
    rows per batch, never the token stream."""
    part = _group_term_partial(t, "lang")
    if part is None:
        return _LANG_TERM_SCHEMA.empty_table()
    lang, term, cnts = part
    return pa.table({"lang": lang, "term": term, "cnt": pa.array(cnts)},
                    schema=_LANG_TERM_SCHEMA)


def top_terms_per_lang(docs, *, k: int = 10):
    """The ``k`` most frequent terms per language (count DESC, term ASC
    tiebreak) — the per-register vocabulary profile used to spot
    boilerplate and template drift per language.

    Batch partials -> one vocabulary-sized sorted sum -> the
    distributed per-group rank stage (``stages/topk.top_k_per_group``,
    one sort + boundary carries).  Exact SQL twin:
    ``row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term)``.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.topk import top_k_per_group

    partial = docs.select_columns(["text", "lang"]).map_batches(
        _lang_term_partial, batch_format="pyarrow")
    g = sorted_group_agg(partial, key=["lang", "term"],
                         aggs={"cnt": "sum"}, schema=_LANG_TERM_SCHEMA)

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lang" not in t.column_names:
            return _LANG_TERM_SCHEMA.empty_table()
        return pa.table({
            "lang": t["lang"], "term": t["term"],
            "cnt": pc.cast(t["cnt"], pa.int64()),
        }, schema=_LANG_TERM_SCHEMA)

    counts = g.map_batches(clean, batch_format="pyarrow")
    return top_k_per_group(counts, group="lang", order="cnt",
                           tiebreak="term", k=k,
                           schema=_LANG_TERM_SCHEMA)


CMS_SCHEMA = pa.schema([
    ("term", pa.string()), ("exact_cnt", pa.int64()),
    ("est_cnt", pa.int64()), ("overcount", pa.int64()),
])

_CMS_CELL_SCHEMA = pa.schema([
    ("row", pa.int64()), ("col", pa.int64()), ("cnt", pa.int64()),
])


def _cms_key(d: int) -> str:
    return f"smqtk-ray-cms{d:03d}"     # hash keys must be 16 bytes


def count_min_freqs(docs, probe_terms, *, width: int = 1 << 14,
                    depth: int = 4):
    """Count-Min sketch term-frequency estimation (Cormode &
    Muthukrishnan 2005, public) with a built-in calibration report:
    for each probe term, the exact corpus count next to the sketch
    estimate and the (always >= 0) overcount.

    The mergeable-sketch shape: each batch emits its NONZERO sketch
    cells as sparse ``(row, col, cnt)`` partials (bounded by
    ``depth x min(batch vocab, width)`` rows — cell-sum merging is
    exactly how per-node sketches combine on a real cluster), one tiny
    sorted sum rebuilds the global sketch, and the probe is a
    driver-side min over ``depth`` cells per term.  Estimates are
    hash-seeded (rows-only query); the pytest oracle pins the CM
    guarantees (never undercounts; exact when width clears the
    vocabulary).
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    probes = list(dict.fromkeys(probe_terms))
    if not probes:
        raise ValueError("count_min_freqs: no probe terms")
    if width < 1 or depth < 1:
        raise ValueError("count_min_freqs: width and depth must be"
                         " >= 1")

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CMS_CELL_SCHEMA.empty_table()
        flat, _ = tokens_flat(t["text"], lowercase=False)
        if not len(flat):
            return _CMS_CELL_SCHEMA.empty_table()
        # count token occurrences per UNIQUE term once, then hash only
        # the uniques per depth row and scatter-add their counts —
        # O(stream) once + depth x O(uniques), not depth full passes
        from smqtk_indexing_ray.functions.hashing import dict_codes
        vocab, code = dict_codes(flat)
        term_cnt = np.bincount(code,
                               minlength=len(vocab)).astype(np.int64)
        rows, cols, cnts = [], [], []
        for d in range(depth):
            col = (hash_strings_u64(vocab, hash_key=_cms_key(d))
                   % width).astype(np.int64)
            cell = np.zeros(width, np.int64)
            np.add.at(cell, col, term_cnt)
            hit = np.flatnonzero(cell)
            rows.append(np.full(len(hit), d, np.int64))
            cols.append(hit.astype(np.int64))
            cnts.append(cell[hit])
        return pa.table({
            "row": pa.array(np.concatenate(rows)),
            "col": pa.array(np.concatenate(cols)),
            "cnt": pa.array(np.concatenate(cnts)),
        }, schema=_CMS_CELL_SCHEMA)

    cells = sorted_group_agg(
        docs.select_columns(["text"]).map_batches(
            part, batch_format="pyarrow"),
        key=["row", "col"], aggs={"cnt": "sum"},
        schema=_CMS_CELL_SCHEMA).take_all()     # <= depth x width rows
    cm = np.zeros((depth, width), np.int64)
    for r in cells:
        cm[int(r["row"]), int(r["col"])] = int(r["cnt"])

    # exact side: the corpus tf table filtered to the probes (tiny)
    tf = term_frequencies(docs)
    probe_set = pa.array(probes, pa.string())

    def keep_probes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "term" not in t.column_names:
            return TERM_FREQ_SCHEMA.empty_table()
        return t.filter(pc.is_in(t["term"], value_set=probe_set))

    exact = {r["term"]: int(r["cnt"])
             for r in tf.map_batches(
                 keep_probes, batch_format="pyarrow").take_all()}

    est = np.zeros(len(probes), np.int64)
    for d in range(depth):
        col = hash_strings_u64(probes, hash_key=_cms_key(d)) % width
        vals = cm[d, col.astype(np.int64)]
        est = vals if d == 0 else np.minimum(est, vals)
    ex = np.array([exact.get(term, 0) for term in probes], np.int64)
    return pa.table({
        "term": pa.array(probes, pa.string()),
        "exact_cnt": pa.array(ex),
        "est_cnt": pa.array(est),
        "overcount": pa.array(est - ex),
    }, schema=CMS_SCHEMA)


WINDOWS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("win_idx", pa.int64()),
    ("tok_start", pa.int64()), ("tok_len", pa.int64()),
    ("is_full", pa.bool_()),
])


def strided_windows(docs, *, window: int = 128, stride: int = 64):
    """Strided context-window layout per document — the pretraining
    sequence-packing plan: window starts at ``0, stride, 2*stride, …``
    while inside the doc, each window holding ``min(window, n_tokens -
    start)`` tokens.  Emits the (doc, window) metadata table a
    tokenizer shard consumes; empty docs emit nothing.

    Batch-local and fully vectorized (one ``np.repeat``/``arange``
    expansion per batch, no shuffle); output is ~``n_tokens/stride``
    rows — the op's cost is proportional to the training sequences it
    plans, never quadratic.  Exact SQL twin via ``generate_series``.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("strided_windows: window and stride must be"
                         " positive")
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return WINDOWS_SCHEMA.empty_table()
        _, off = tokens_flat(t["text"], lowercase=False)
        counts = np.diff(off)
        n_win = (counts + stride - 1) // stride      # ceil(n/stride)
        if not n_win.sum():
            return WINDOWS_SCHEMA.empty_table()
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), n_win)
        win_idx = grouped_arange(n_win)
        start = win_idx * stride
        tok_len = np.minimum(window, counts[doc_rep] - start)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[doc_rep].astype(np.int64)),
            "win_idx": pa.array(win_idx),
            "tok_start": pa.array(start),
            "tok_len": pa.array(tok_len),
            "is_full": pa.array(tok_len == window),
        }, schema=WINDOWS_SCHEMA)

    return docs.select_columns(["doc_id", "text"]).map_batches(
        expand, batch_format="pyarrow")


VOCAB_GROWTH_SCHEMA = pa.schema([
    ("prefix_docs", pa.int64()), ("n_distinct_terms", pa.int64()),
])

#: Fixed power-of-two prefix ladder (1 .. 2^20) so the output row set —
#: and the SQL oracle — is data-size independent.  The top rung covers
#: ~1M docs; on a larger corpus the curve reports the first-2^20-doc
#: prefix, NOT the full vocabulary — extend the ladder (and the oracle's
#: generate_series bound) together if you need deeper prefixes.
VOCAB_GROWTH_PREFIXES = [1 << i for i in range(21)]


def vocab_growth(docs):
    """Heaps'-law vocabulary growth curve: distinct terms seen within
    the first ``p`` documents (by ``doc_id`` order) for each power-of-
    two prefix ``p`` — the diagnostic for how fast a crawl stops
    contributing new vocabulary (dedup/quality regressions bend this
    curve).

    Scale shape: each term's FIRST-occurrence doc_id is one sorted
    grouped min over per-batch (term, min doc) partials; the curve is
    then a 21-bucket histogram of first-occurrence doc_ids — per-batch
    partial histograms (21 ints each) fold on the driver, so nothing
    vocabulary-sized ever leaves the workers after the grouped min.
    All counts int64-exact.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    part_schema = pa.schema([("term", pa.string()),
                             ("first_doc", pa.int64())])

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        (vocab, _, _, _, s_code, run_starts, _, run_doc,
         _) = _doc_term_runs(t["text"], t.num_rows)
        if not len(run_starts):
            return part_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        v = len(vocab)
        first = np.full(v, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, s_code[run_starts],
                      ids[run_doc].astype(np.int64))
        seen = first != np.iinfo(np.int64).max
        return pa.table({
            "term": vocab.filter(pa.array(seen)),
            "first_doc": pa.array(first[seen]),
        }, schema=part_schema)

    firsts = sorted_group_agg(
        docs.select_columns(["doc_id", "text"]).map_batches(
            part, batch_format="pyarrow"),
        key="term", aggs={"first_doc": "min"}, schema=part_schema)

    ladder = np.array(VOCAB_GROWTH_PREFIXES, np.int64)
    hist_schema = pa.schema([("bucket", pa.int64()),
                             ("n", pa.int64())])

    def hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "first_doc" not in t.column_names:
            return hist_schema.empty_table()
        fd = pc.cast(t["first_doc"], pa.int64()).to_numpy(
            zero_copy_only=False)
        # bucket = number of ladder rungs <= first_doc, so the cumsum
        # at rung p counts exactly the terms with first_doc < p
        idx = np.searchsorted(ladder, fd, side="right")
        n = np.bincount(idx, minlength=len(ladder) + 1).astype(np.int64)
        keep = np.flatnonzero(n)
        return pa.table({"bucket": pa.array(keep.astype(np.int64)),
                         "n": pa.array(n[keep])}, schema=hist_schema)

    parts = firsts.map_batches(hist, batch_format="pyarrow").take_all()
    counts = np.zeros(len(ladder) + 1, np.int64)
    for r in parts:
        counts[int(r["bucket"])] += int(r["n"])
    cum = np.cumsum(counts)[:len(ladder)]   # terms with first_doc < p
    return pa.table({
        "prefix_docs": pa.array(ladder),
        "n_distinct_terms": pa.array(cum),
    }, schema=VOCAB_GROWTH_SCHEMA)


POSTING_SCHEMA = pa.schema([
    ("term", pa.string()), ("df", pa.int64()),
    ("postings", pa.string()),
])


def posting_lists(docs, *, max_postings: int = 16):
    """Inverted-index shard build: per term, the exact document
    frequency and the first ``max_postings`` doc_ids (ascending,
    comma-joined) — the retrieval-index artifact a search stack
    materializes from a crawled corpus.

    Per-batch kernel: the dictionary-coded (doc, term) run structure
    already computed for the tf ops yields the batch's DISTINCT
    (term, doc_id) rows, pruned to each term's ``max_postings``
    smallest doc_ids BEFORE anything shuffles (the global k smallest
    survive any per-batch k-prune, so the prune is lossless for the
    capped list) — and the SAME pass emits the batch's per-term df
    partials as tagged rows, so the corpus is tokenized exactly once.
    One ranked per-term pass caps globally, one ordered ``concat`` agg
    joins the survivors, and the exact df folds from the tagged
    partials into a broadcast vocabulary lookup (gated at
    ``TFIDF_MAX_VOCAB``) — the token stream itself never crosses a
    shuffle.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    import ray

    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.topk import top_k_per_group

    # z doubles as the row tag: 0 = a pruned (term, doc) posting row,
    # >0 = this batch's COMPLETE df partial for the term (doc_id = -1)
    td_schema = pa.schema([("term", pa.string()), ("doc_id", pa.int64()),
                           ("z", pa.int64())])

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0 or "text" not in t.column_names:
            return td_schema.empty_table()
        (vocab, _, _, _, s_code, run_starts, _, run_doc,
         _) = _doc_term_runs(t["text"], n)
        if not len(run_starts):
            return td_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        code = s_code[run_starts]
        doc = ids[run_doc]
        # per-batch df partial: COMPLETE run count per term, computed
        # BEFORE the posting prune
        df_part = np.bincount(code, minlength=len(vocab))
        live = np.flatnonzero(df_part)
        # per-term k-prune inside the batch: keep each term's
        # max_postings smallest doc_ids (lossless for the capped list)
        order = np.lexsort((doc, code))
        code_s, doc_s = code[order], doc[order]
        new_run = np.empty(len(code_s), dtype=bool)
        new_run[0] = True
        new_run[1:] = code_s[1:] != code_s[:-1]
        pos_in_run = np.arange(len(code_s)) - np.repeat(
            np.flatnonzero(new_run),
            np.diff(np.append(np.flatnonzero(new_run), len(code_s))))
        keep = pos_in_run < max_postings
        n_keep = int(keep.sum())

        def _flat(a):
            return (a.combine_chunks()
                    if isinstance(a, pa.ChunkedArray) else a)

        return pa.table({
            "term": pa.concat_arrays([
                _flat(vocab.take(
                    pa.array(code_s[keep].astype(np.int64)))),
                _flat(vocab.take(
                    pa.array(live.astype(np.int64))))]).cast(
                pa.string()),
            "doc_id": pa.array(np.concatenate(
                [doc_s[keep], np.full(len(live), -1)]).astype(np.int64)),
            "z": pa.array(np.concatenate(
                [np.zeros(n_keep), df_part[live]]).astype(np.int64)),
        }, schema=td_schema)

    exploded = docs.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow").materialize()
    # materialized: consumed by BOTH the posting rank and the df fold —
    # bounded by k x vocab posting rows + vocab x blocks df partials,
    # far below the token stream a second tokenize pass would re-walk

    def only_postings(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "z" not in t.column_names:
            return td_schema.empty_table()
        return t.filter(pc.equal(t["z"], 0))

    def only_df(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "z" not in t.column_names:
            return td_schema.empty_table()
        return t.filter(pc.greater(t["z"], 0))

    dfs = sorted_group_agg(
        exploded.map_batches(only_df, batch_format="pyarrow"),
        key="term", aggs={"z": "sum"}, schema=td_schema).take_all()
    if len(dfs) > TFIDF_MAX_VOCAB:
        raise ValueError(
            f"posting_lists: vocabulary has {len(dfs)} terms > "
            f"max_vocab={TFIDF_MAX_VOCAB}; prune the corpus first")
    vt = np.array([r["term"] for r in dfs], object)
    vdf = np.array([r["z"] for r in dfs], np.int64)
    order = np.argsort(vt, kind="stable")
    terms_sorted, df_arr = vt[order], vdf[order]

    ranked = top_k_per_group(
        exploded.map_batches(only_postings, batch_format="pyarrow"),
        group="term", order="doc_id", tiebreak="z", k=max_postings,
        descending=False, schema=td_schema)

    cat_schema = pa.schema([("term", pa.string()),
                            ("doc_str", pa.string()),
                            ("rank", pa.int64())])

    def stringify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return cat_schema.empty_table()
        return pa.table({
            "term": t["term"],
            "doc_str": pc.cast(t["doc_id"], pa.string()),
            "rank": t["rank"],
        }, schema=cat_schema)

    posts = sorted_group_agg(
        ranked.map_batches(stringify, batch_format="pyarrow"),
        key="term", order="rank",
        aggs={"postings": ("doc_str", "concat")}, concat_sep=",",
        schema=cat_schema)

    # exact df rides the broadcast-vocabulary pattern (a sort-merge
    # attach would need an int64 key and a 64-bit term hash invites
    # collisions; the vocab-sized (term, df) arrays belong in the
    # closure up to TFIDF_MAX_VOCAB)
    vocab_ref = ray.put((terms_sorted, df_arr))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "postings" not in t.column_names:
            return POSTING_SCHEMA.empty_table()
        vt, vdf = ray.get(vocab_ref)
        terms = t["term"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vt, terms)
        return pa.table({
            "term": t["term"],
            "df": pa.array(vdf[idx].astype(np.int64)),
            "postings": t["postings"],
        }, schema=POSTING_SCHEMA)

    return stamp_schema(posts.map_batches(finish,
                                          batch_format="pyarrow"),
                        POSTING_SCHEMA)


DUP_NGRAM_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("dup2_frac", pa.float64()),
    ("dup3_frac", pa.float64()), ("dup4_frac", pa.float64()),
])


def _dup_ngram_batch(t: pa.Table) -> pa.Table:
    n_docs = t.num_rows
    if n_docs == 0:
        return DUP_NGRAM_SCHEMA.empty_table()
    toks, off = tokens_flat(t["text"], lowercase=False)
    counts = np.diff(off)
    doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    d = pc.dictionary_encode(toks)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tok_chars = pc.utf8_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    cc = np.concatenate([[0], np.cumsum(tok_chars)])
    n_chars = pc.cast(t["n_chars"], pa.int64()).to_numpy(
        zero_copy_only=False)

    fracs = {}
    # iterative n-gram key compaction: key_n for window [i, i+n) is
    # compact(key_{n-1}[i]) * V + codes[i+n-1], so identity stays
    # string-exact (dictionary codes, never hashes) and the packed key
    # stays < (#distinct_{n-1} windows) * V — no 64-bit overflow at
    # any realistic batch size
    key = codes.copy()
    valid_len = len(codes)
    for n in (2, 3, 4):
        dup_chars = np.zeros(n_docs, np.int64)
        if valid_len >= 1 and len(codes) >= n:
            prev = key[:valid_len]
            _, prev_c = np.unique(prev, return_inverse=True)
            nxt = codes[n - 1:]
            m = len(codes) - n + 1
            key = prev_c[:m] * np.int64(len(d.dictionary) + 1) \
                + nxt[:m]
            valid_len = m
            if m > 0:
                pos = np.arange(m)
                same_doc = doc_rep[pos] == doc_rep[pos + n - 1]
                vpos = pos[same_doc]
                if len(vpos):
                    vdoc = doc_rep[vpos]
                    vkey = key[vpos]
                    gch = cc[vpos + n] - cc[vpos] + (n - 1)
                    order = np.lexsort((vkey, vdoc))
                    sd, sk = vdoc[order], vkey[order]
                    sch_ = gch[order]
                    new_run = np.empty(len(sd), bool)
                    new_run[0] = True
                    np.logical_or(sd[1:] != sd[:-1],
                                  sk[1:] != sk[:-1], out=new_run[1:])
                    starts = np.flatnonzero(new_run)
                    lens = np.diff(np.append(starts, len(sd)))
                    run_chars = np.add.reduceat(sch_, starts)
                    dup = lens >= 2
                    if dup.any():
                        np.add.at(dup_chars, sd[starts[dup]],
                                  run_chars[dup])
        frac = np.where(n_chars > 0,
                        dup_chars / np.where(n_chars > 0, n_chars,
                                             1).astype(np.float64),
                        0.0)
        fracs[n] = frac
    return pa.table({
        "doc_id": t["doc_id"],
        "dup2_frac": pa.array(fracs[2]),
        "dup3_frac": pa.array(fracs[3]),
        "dup4_frac": pa.array(fracs[4]),
    }, schema=DUP_NGRAM_SCHEMA)


def dup_ngram_chars(docs):
    """Gopher-style duplicate-n-gram character fractions (n = 2, 3,
    4): per doc, the fraction of characters covered by word n-grams
    that occur at least twice WITHIN the doc — the repetition gate the
    unigram signals (:func:`repetition_signals`) cannot see (looping
    paragraphs, chorus spam, template stutter).

    Batch-local (no shuffle): dictionary-coded n-gram identity via
    iterative key compaction (string-exact, never hashed), occurrence
    character spans from one token-length cumsum, per-(doc, n-gram)
    runs from one lexsort.  Fractions are exact int64-over-int64 IEEE
    divisions against the doc's ``n_chars``.

    Output: ``doc_id, dup2_frac, dup3_frac, dup4_frac``.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    return stamp_schema(
        docs.select_columns(["doc_id", "text", "n_chars"]).map_batches(
            _dup_ngram_batch, batch_format="pyarrow"),
        DUP_NGRAM_SCHEMA)


_DUP_SPAN_DF_SCHEMA = pa.schema([("shingle", pa.int64()),
                                 ("df", pa.int64())])


def _shingle_df_partial(sh: np.ndarray, soff: np.ndarray) -> pa.Table:
    """Distinct-doc df partial rows for one batch's flat shingle
    stream — the shared pass-A core of the dup-span operators."""
    if not len(sh):
        return _DUP_SPAN_DF_SCHEMA.empty_table()
    did = np.repeat(np.arange(len(soff) - 1), np.diff(soff))
    order = np.lexsort((sh, did))
    d_s, s_s = did[order], sh[order]
    head = np.concatenate([[True], (d_s[1:] != d_s[:-1])
                           | (s_s[1:] != s_s[:-1])])
    uniq, counts = np.unique(s_s[head], return_counts=True)
    return pa.table({"shingle": pa.array(uniq.view(np.int64)),
                     "df": pa.array(counts.astype(np.int64))},
                    schema=_DUP_SPAN_DF_SCHEMA)


def _sorted_member(dset: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Membership mask of int64 ``vals`` in the SORTED array ``dset``."""
    if not len(dset):
        return np.zeros(len(vals), bool)
    pos = np.clip(np.searchsorted(dset, vals), 0, len(dset) - 1)
    return dset[pos] == vals


DUP_SPAN_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("n_tokens", pa.int64()),
    ("n_windows", pa.int64()),
    ("dup_windows", pa.int64()),
    ("n_dup_spans", pa.int64()),
    ("dup_tokens", pa.int64()),
    ("dup_token_frac", pa.float64()),
])

#: Broadcast gate for the duplicated-shingle set (shingles with
#: df >= min_df): web boilerplate keeps it far below the vocabulary,
#: but a pathological corpus (every doc a near-copy) can approach
#: vocabulary size — above the gate the flags ride a ``sort_attach``
#: and the span merge rides the LAG stage instead (the scale path,
#: same convention as the tf-idf/DSIR/PPJoin gates).
DUP_SPAN_MAX_BROADCAST = 8_000_000


def dup_span_stats(docs, *, k: int = 3, min_df: int = 2,
                   num_partitions: int = 16,
                   max_broadcast: int = DUP_SPAN_MAX_BROADCAST):
    """Corpus-wide duplicated-span accounting (the cross-document form
    of Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499, at k-token-window grain): for
    every document with >= ``k`` tokens, how many of its token
    positions are covered by a k-token window whose shingle occurs in
    at least ``min_df`` DISTINCT documents, and how many maximal
    contiguous such spans there are.  This is the "how much of this
    page exists verbatim elsewhere, and in how many blocks" signal —
    :func:`dup_ngram_chars` sees only WITHIN-doc repetition and the
    suffix passes only within-cluster text; this one is corpus-wide
    and position-exact.

    Decomposition (one vocabulary-sized shuffle, text never moves):

    - pass A: per-batch distinct ``(doc, shingle)`` partials ->
      ``sorted_group_agg`` df counts; the duplicated set is the
      ``df >= min_df`` slice.
    - pass B (broadcast, dup set <= ``max_broadcast``): re-shingle each
      batch (documents are rows, so every doc is batch-complete),
      flag windows by one ``searchsorted`` membership test, and merge
      flagged windows into maximal spans with a vectorized per-doc
      interval sweep: windows at positions ``p_1 < p_2 < ...`` add
      ``k`` covered tokens for a span head and ``min(p_i - p_{i-1},
      k)`` otherwise; a new span starts when the gap exceeds ``k``.
    - pass B (scale): one row per window rides a df ``sort_attach``
      (inner, pre-filtered to the duplicated slice), the previous
      flagged position comes from ``sorted_lag_attach``, the same
      per-row contributions reduce through ``sorted_group_agg``, and
      zero-dup docs re-enter via a left attach — identical output.

    Output: ``doc_id, n_tokens, n_windows, dup_windows, n_dup_spans,
    dup_tokens, dup_token_frac`` (exact int64 ratio).  Docs with fewer
    than ``k`` tokens are omitted (they have no windows).

    Reference analog: the bucket-multimap df accounting of
    /root/reference/smqtk_indexing/impls/nn_index/lsh.py:315-323,
    taken to position grain.
    """
    import ray

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.functions.tokenize import (
        shingle_flat,
        tokenize_flat,
    )
    from smqtk_indexing_ray.stages._util import (
        auto_blocks,
        collect_table,
        drop_empty_blocks,
    )
    from smqtk_indexing_ray.stages.agg import (
        sorted_group_agg,
        sorted_lag_attach,
    )
    from smqtk_indexing_ray.stages.attach import (
        _broadcast_cache_get,
        sort_attach,
    )

    df_schema = _DUP_SPAN_DF_SCHEMA
    src = docs.select_columns(["doc_id", "text"])
    nb = max(num_partitions, auto_blocks())

    def _windows(t: pa.Table):
        """(sh, soff, doc_ids, n_tok per doc) for one batch of docs."""
        tok, off = tokenize_flat(t["text"], lowercase=False)
        sh, soff = shingle_flat(tok, off, k)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return sh, soff, ids, np.diff(off)

    # --- pass A: distinct-doc df per shingle ------------------------
    def df_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return df_schema.empty_table()
        sh, soff, _ids, _ntok = _windows(t)
        return _shingle_df_partial(sh, soff)

    df_tab = sorted_group_agg(
        src.map_batches(df_partial, batch_format="pyarrow",
                        batch_size=None),
        key="shingle", aggs={"df": "sum"},
        num_blocks=nb, schema=df_schema).materialize()
    dup_tab = df_tab.filter(expr=f"df >= {int(min_df)}").materialize()
    n_dup = dup_tab.count()

    def _contrib(prev_valid, diff):
        cov = np.where(prev_valid, np.minimum(diff, k), k)
        brk = (~prev_valid) | (diff > k)
        return cov.astype(np.int64), brk

    if n_dup <= max_broadcast:
        vt = collect_table(dup_tab, df_schema)
        dup = np.sort(vt["shingle"].to_numpy(
            zero_copy_only=False).astype(np.int64))
        dup_ref = ray.put(dup)

        def span_stats(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "text" not in t.column_names:
                return DUP_SPAN_SCHEMA.empty_table()
            sh, soff, ids, ntok = _windows(t)
            nw = np.diff(soff)
            has = nw > 0
            if not has.any():
                return DUP_SPAN_SCHEMA.empty_table()
            dset = _broadcast_cache_get(dup_ref)
            flag = _sorted_member(dset, sh.view(np.int64))
            did_w = np.repeat(np.arange(len(nw)), nw)
            pos_w = np.arange(len(sh)) - np.repeat(soff[:-1], nw)
            d_f = did_w[flag]
            p_f = pos_w[flag]
            dw = np.zeros(len(nw), np.int64)
            spans = np.zeros(len(nw), np.int64)
            covered = np.zeros(len(nw), np.int64)
            if len(d_f):
                first = np.concatenate([[True], d_f[1:] != d_f[:-1]])
                diff = np.empty(len(p_f), np.int64)
                diff[0] = 0
                diff[1:] = p_f[1:] - p_f[:-1]
                cov, brk = _contrib(~first, diff)
                np.add.at(dw, d_f, 1)
                np.add.at(spans, d_f, brk.astype(np.int64))
                np.add.at(covered, d_f, cov)
            sel = has
            return pa.table({
                "doc_id": pa.array(ids[sel]),
                "n_tokens": pa.array(ntok[sel].astype(np.int64)),
                "n_windows": pa.array(nw[sel].astype(np.int64)),
                "dup_windows": pa.array(dw[sel]),
                "n_dup_spans": pa.array(spans[sel]),
                "dup_tokens": pa.array(covered[sel]),
                "dup_token_frac": pa.array(
                    covered[sel] / ntok[sel].astype(np.float64)),
            }, schema=DUP_SPAN_SCHEMA)

        return stamp_schema(
            src.map_batches(span_stats, batch_format="pyarrow",
                            batch_size=None), DUP_SPAN_SCHEMA)

    # --- scale path: window rows + df attach + LAG + sorted reduce --
    win_schema = pa.schema([("shingle", pa.int64()),
                            ("doc_id", pa.int64()),
                            ("pos", pa.int64())])
    base_schema = pa.schema([("doc_id", pa.int64()),
                             ("n_tokens", pa.int64()),
                             ("n_windows", pa.int64())])

    def explode_windows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return win_schema.empty_table()
        sh, soff, ids, _ntok = _windows(t)
        if not len(sh):
            return win_schema.empty_table()
        nw = np.diff(soff)
        return pa.table({
            "shingle": pa.array(sh.view(np.int64)),
            "doc_id": pa.array(np.repeat(ids, nw)),
            "pos": pa.array(np.arange(len(sh))
                            - np.repeat(soff[:-1], nw)),
        }, schema=win_schema)

    def per_doc_base(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return base_schema.empty_table()
        _sh, soff, ids, ntok = _windows(t)
        nw = np.diff(soff)
        sel = nw > 0
        return pa.table({
            "doc_id": pa.array(ids[sel]),
            "n_tokens": pa.array(ntok[sel].astype(np.int64)),
            "n_windows": pa.array(nw[sel].astype(np.int64)),
        }, schema=base_schema)

    windows = src.map_batches(explode_windows, batch_format="pyarrow",
                              batch_size=None)
    flagged = sort_attach(
        windows, drop_empty_blocks(dup_tab, df_schema), key="shingle",
        payload_key="shingle", payload_cols=["df"], how="inner",
        rows_schema=win_schema, payload_schema=df_schema, num_blocks=nb)
    fl_schema = pa.schema([("shingle", pa.int64()), ("doc_id", pa.int64()),
                           ("pos", pa.int64()), ("df", pa.int64())])
    lagged = sorted_lag_attach(
        flagged, key="doc_id", order="pos", value="pos", out="prev",
        num_blocks=nb, schema=fl_schema)

    part_schema = pa.schema([("doc_id", pa.int64()),
                             ("dup_windows", pa.int64()),
                             ("n_dup_spans", pa.int64()),
                             ("dup_tokens", pa.int64())])

    def contrib(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "prev" not in t.column_names:
            return part_schema.empty_table()
        pos = t["pos"].to_numpy(zero_copy_only=False)
        prev = pc.fill_null(t["prev"], -(10 ** 15)).to_numpy(
            zero_copy_only=False)
        valid = prev > -(10 ** 15)
        diff = np.where(valid, pos - prev, 0).astype(np.int64)
        cov, brk = _contrib(valid, diff)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "dup_windows": pa.array(np.ones(t.num_rows, np.int64)),
            "n_dup_spans": pa.array(brk.astype(np.int64)),
            "dup_tokens": pa.array(cov),
        }, schema=part_schema)

    per_doc = sorted_group_agg(
        lagged.map_batches(contrib, batch_format="pyarrow"),
        key="doc_id",
        aggs={"dup_windows": "sum", "n_dup_spans": "sum",
              "dup_tokens": "sum"},
        num_blocks=nb, schema=part_schema)

    base = src.map_batches(per_doc_base, batch_format="pyarrow",
                           batch_size=None)
    joined = sort_attach(
        base, per_doc, key="doc_id", payload_key="doc_id",
        payload_cols=["dup_windows", "n_dup_spans", "dup_tokens"],
        how="left", rows_schema=base_schema, payload_schema=part_schema,
        num_blocks=nb)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "dup_tokens" not in t.column_names:
            return DUP_SPAN_SCHEMA.empty_table()
        ntok = t["n_tokens"].to_numpy(zero_copy_only=False)
        dt = pc.fill_null(t["dup_tokens"], 0).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
            "n_windows": pc.cast(t["n_windows"], pa.int64()),
            "dup_windows": pc.cast(
                pc.fill_null(t["dup_windows"], 0), pa.int64()),
            "n_dup_spans": pc.cast(
                pc.fill_null(t["n_dup_spans"], 0), pa.int64()),
            "dup_tokens": pa.array(dt.astype(np.int64)),
            "dup_token_frac": pa.array(dt / ntok.astype(np.float64)),
        }, schema=DUP_SPAN_SCHEMA)

    return stamp_schema(
        joined.map_batches(finish, batch_format="pyarrow"),
        DUP_SPAN_SCHEMA)


DUP_SPAN_SCRUB_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("n_tokens", pa.int64()),
    ("n_removed", pa.int64()),
])


def dup_span_scrub(docs, *, k: int = 3, min_df: int = 2,
                   num_partitions: int = 16,
                   max_broadcast: int = DUP_SPAN_MAX_BROADCAST):
    """The actionable companion of :func:`dup_span_stats`: REMOVE every
    token covered by a k-window whose shingle occurs in >= ``min_df``
    distinct documents, and rebuild the text from the surviving tokens
    (single-space joined — the same whitespace normalization contract
    as :func:`line_dedup`'s rebuilt text).  This is the ExactSubstr-
    style cut (Lee et al. 2022) a training-data pipeline actually
    applies after the accounting pass.

    Every document is emitted (token-normalized), including docs with
    fewer than ``k`` tokens (nothing to remove) and docs scrubbed to
    the empty string.  ``n_tokens`` counts the ORIGINAL tokens,
    ``n_removed`` the covered ones.

    Scale shape: identical to :func:`line_dedup` — the duplicated
    shingle set is the only broadcast (gated at ``max_broadcast``,
    raise-with-advice above: shard the scrub by hash-bucketing shingles
    and re-running per bucket, or lift ``min_df``), text never crosses
    a shuffle, and the removal is one batch-local vectorized pass
    (coverage via a +1/-1 cumsum over window bounds, rebuild via one
    ``pc.binary_join``).
    """
    import ray

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.functions.hashing import hash_strings_u64
    from smqtk_indexing_ray.functions.tokenize import (
        shingle_flat,
        tokenize_flat,
        tokens_flat,
    )
    from smqtk_indexing_ray.stages._util import auto_blocks, collect_table
    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    df_schema = _DUP_SPAN_DF_SCHEMA
    src = docs.select_columns(["doc_id", "text"])
    nb = max(num_partitions, auto_blocks())

    def df_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return df_schema.empty_table()
        tok, off = tokenize_flat(t["text"], lowercase=False)
        sh, soff = shingle_flat(tok, off, k)
        return _shingle_df_partial(sh, soff)

    df_tab = sorted_group_agg(
        src.map_batches(df_partial, batch_format="pyarrow",
                        batch_size=None),
        key="shingle", aggs={"df": "sum"},
        num_blocks=nb, schema=df_schema).materialize()
    dup_tab = df_tab.filter(expr=f"df >= {int(min_df)}").materialize()
    n_dup = dup_tab.count()
    if n_dup > max_broadcast:
        raise ValueError(
            f"dup_span_scrub: {n_dup} duplicated shingles > "
            f"max_broadcast={max_broadcast}; shard the scrub by "
            "hash-bucketing shingles and re-running per bucket, or "
            "raise min_df")
    vt = collect_table(dup_tab, df_schema)
    dup = np.sort(vt["shingle"].to_numpy(
        zero_copy_only=False).astype(np.int64))
    dup_ref = ray.put(dup)

    from smqtk_indexing_ray.stages.attach import _broadcast_cache_get

    def scrub(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return DUP_SPAN_SCRUB_SCHEMA.empty_table()
        flat, off = tokens_flat(t["text"], lowercase=False)
        tok = hash_strings_u64(flat)
        sh, soff = shingle_flat(tok, off, k)
        n_tok = np.diff(off)
        n_flat = int(off[-1])
        covered = np.zeros(n_flat, bool)
        if len(sh):
            dset = _broadcast_cache_get(dup_ref)
            flag = _sorted_member(dset, sh.view(np.int64))
            if flag.any():
                nw = np.diff(soff)
                # global flat start of each flagged window; windows
                # never cross docs, so one +1/-1 cumsum covers all docs
                win_start = (np.arange(len(sh))
                             - np.repeat(soff[:-1], nw)
                             + np.repeat(off[:-1], nw))
                starts = win_start[flag]
                delta = np.zeros(n_flat + 1, np.int64)
                np.add.at(delta, starts, 1)
                np.add.at(delta, starts + k, -1)
                covered = np.cumsum(delta[:-1]) > 0
        kept = ~covered
        did_flat = np.repeat(np.arange(len(n_tok)), n_tok)
        kept_per_doc = np.bincount(did_flat[kept],
                                   minlength=len(n_tok)).astype(np.int64)
        kept_flat = (flat.filter(pa.array(kept)) if n_flat
                     else flat)
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        offsets = np.concatenate([[0], kept_per_doc.cumsum()])
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept_flat)
        text = pc.binary_join(lists, " ")
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "text": pc.cast(text, pa.string()),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "n_removed": pa.array(
                (n_tok - kept_per_doc).astype(np.int64)),
        }, schema=DUP_SPAN_SCRUB_SCHEMA)

    return stamp_schema(
        src.map_batches(scrub, batch_format="pyarrow",
                        batch_size=None), DUP_SPAN_SCRUB_SCHEMA)
