"""Term/line-level operators: repetition signals, term frequencies,
tf*N/df top terms, corpus line dedup, incremental anti-join dedup.

Each test cross-checks the distributed pipeline against a brute-force
(or DuckDB) oracle on an adversarial in-memory corpus: empty docs,
within-doc duplicate lines, score ties, duplicate texts inside the
"new" batch.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest


DOCS = [
    (0, "the cat sat on the mat", "en", "s0", 22),
    (1, "", "en", "s0", 0),
    (2, "cat cat cat cat", "en", "s1", 15),
    (3, "the cat sat on the mat", "en", "s1", 22),  # exact dup of 0
    (4, "one two three four five six", "en", "s2", 27),
    (5, "alpha beta alpha beta gamma", "fr", "s2", 27),
]

LINE_DOCS = [
    (0, "keep me\nBOILER\nunique line a", "en", "s0", 0),
    (1, "BOILER\nonly here", "en", "s0", 0),
    (2, "repeat\nrepeat\nsolo", "en", "s1", 0),   # within-doc dup
    (3, "", "en", "s1", 0),                        # empty -> one '' line
    (4, "", "en", "s2", 0),                        # '' line now df=2
    (5, "keep me too", "en", "s2", 0),
]


def _ds(rows):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    return rd.from_arrow(t).repartition(3)


def _table(ds, schema: pa.Schema | None = None) -> pa.Table:
    batches = [b for b in ds.iter_batches(batch_size=None,
                                          batch_format="pyarrow")]
    if not batches:
        if schema is None:
            sch = ds.schema()
            schema = (sch.base_schema
                      if hasattr(sch, "base_schema") else sch)
        return schema.empty_table()
    return pa.concat_tables(batches).combine_chunks()


def _duck(rows):
    con = duckdb.connect()
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    con.register("documents", t)
    return con


def test_repetition_signals(ray_session):
    from smqtk_indexing_ray.pipelines.terms import repetition_signals

    out = _table(repetition_signals(_ds(DOCS))).to_pydict()
    got = {d: (nt, nd, df, tc, tf) for d, nt, nd, df, tc, tf in zip(
        out["doc_id"], out["n_tokens"], out["n_distinct_tokens"],
        out["dup_token_frac"], out["top_token_count"],
        out["top_token_frac"])}
    assert got[0] == (6, 5, 1 / 6, 2, 2 / 6)      # "the" twice
    assert got[1] == (0, 0, 0.0, 0, 0.0)          # empty doc
    assert got[2] == (4, 1, 3 / 4, 4, 1.0)        # all same token
    assert got[4] == (6, 6, 0.0, 1, 1 / 6)        # all distinct
    assert got[5] == (5, 3, 2 / 5, 2, 2 / 5)


def test_token_entropy(ray_session):
    """Entropy per doc vs closed-form expectations: H = log2(n) -
    sum(c*log2(c))/n, 0 for empty docs, 0 for one-token spam, log2(n)
    for all-distinct docs — bit-compared after round6 on both sides."""
    import math

    from smqtk_indexing_ray.functions.metrics import round6
    from smqtk_indexing_ray.pipelines.terms import token_entropy

    out = _table(token_entropy(_ds(DOCS))).to_pydict()
    got = {d: (nt, nd, e) for d, nt, nd, e in zip(
        out["doc_id"], out["n_tokens"], out["n_distinct_tokens"],
        out["token_entropy"])}
    assert len(got) == len(DOCS)

    def h(counts):
        n = sum(counts)
        return float(round6(np.array(
            math.log2(n) - sum(c * math.log2(c) for c in counts) / n)))

    assert got[0] == (6, 5, h([2, 1, 1, 1, 1]))   # "the" twice
    assert got[1] == (0, 0, 0.0)                  # empty doc
    assert got[2] == (4, 1, 0.0)                  # one-token spam
    assert got[4] == (6, 6, h([1] * 6))           # all distinct
    assert got[5] == (5, 3, h([2, 2, 1]))


def test_token_entropy_null_text(ray_session):
    """Null text behaves exactly like an empty doc (0 tokens, H=0)."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.terms import token_entropy

    t = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array([None, "a b a"], pa.string()),
    })
    out = _table(token_entropy(rd.from_arrow(t))).to_pydict()
    got = dict(zip(out["doc_id"], out["token_entropy"]))
    assert got[7] == 0.0
    assert got[8] > 0.0


def test_term_frequencies(ray_session):
    from smqtk_indexing_ray.pipelines.terms import term_frequencies

    out = _table(term_frequencies(_ds(DOCS))).to_pydict()
    got = {t: (c, d) for t, c, d in zip(out["term"], out["cnt"],
                                        out["df"])}
    assert got["cat"] == (6, 3)      # docs 0, 2 (x4), 3
    assert got["the"] == (4, 2)      # docs 0 and 3, twice each
    assert got["alpha"] == (2, 1)
    assert got["gamma"] == (1, 1)
    # exactly the whitespace vocabulary, nothing else
    total_tokens = sum(len(r[1].split()) for r in DOCS)
    assert sum(out["cnt"]) == total_tokens


def test_term_frequencies_min_count(ray_session):
    from smqtk_indexing_ray.pipelines.terms import term_frequencies

    out = _table(term_frequencies(_ds(DOCS), min_count=4)).to_pydict()
    assert set(out["term"]) == {"cat", "the"}


def test_tfidf_top_terms_matches_sql(ray_session):
    from smqtk_indexing_ray.pipelines.terms import tfidf_top_terms

    out = _table(tfidf_top_terms(_ds(DOCS), k=3))
    con = _duck(DOCS)
    want = con.execute("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents),
        t AS (SELECT doc_id, unnest(w) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t
               GROUP BY doc_id, term),
        dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM t
                GROUP BY term),
        nn AS (SELECT count(*) AS n FROM documents)
        SELECT doc_id, term, tf,
               CAST(tf * nn.n AS DOUBLE) / df AS score
        FROM (SELECT tf.*, dfs.df,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY CAST(tf * (SELECT n FROM nn) AS DOUBLE)
                                / df DESC, term) AS rn
              FROM tf JOIN dfs USING (term)) CROSS JOIN nn
        WHERE rn <= 3 ORDER BY doc_id, term
    """).arrow()
    got = out.sort_by([("doc_id", "ascending"), ("term", "ascending")])
    assert got.num_rows == want.num_rows
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["term"].to_pylist() == want["term"].to_pylist()
    assert got["tf"].to_pylist() == want["tf"].to_pylist()
    assert got["score"].to_pylist() == want["score"].to_pylist()


def test_tfidf_vocab_gate(ray_session):
    from smqtk_indexing_ray.pipelines.terms import tfidf_top_terms

    with pytest.raises(ValueError, match="max_vocab"):
        tfidf_top_terms(_ds(DOCS), k=3, max_vocab=2)


def test_line_dedup(ray_session):
    from smqtk_indexing_ray.pipelines.terms import line_dedup

    out = _table(line_dedup(_ds(LINE_DOCS), min_df=2)).to_pydict()
    got = {d: (ct, nl, nr) for d, ct, nl, nr in zip(
        out["doc_id"], out["clean_text"], out["n_lines"],
        out["n_removed"])}
    # BOILER appears in docs 0 and 1 -> removed everywhere
    assert got[0] == ("keep me\nunique line a", 3, 1)
    assert got[1] == ("only here", 2, 1)
    # within-doc repeat counts toward df -> both instances removed
    assert got[2] == ("solo", 3, 2)
    # '' line has df=2 (docs 3 and 4) -> removed, doc becomes empty
    assert got[3] == ("", 1, 1)
    assert got[4] == ("", 1, 1)
    assert got[5] == ("keep me too", 1, 0)


def test_line_dedup_min_df_3_keeps_pairs(ray_session):
    from smqtk_indexing_ray.pipelines.terms import line_dedup

    out = _table(line_dedup(_ds(LINE_DOCS), min_df=3)).to_pydict()
    got = dict(zip(out["doc_id"], out["clean_text"]))
    assert got[0] == LINE_DOCS[0][1]          # df=2 lines survive
    assert got[2] == LINE_DOCS[2][1]


def test_line_dedup_hot_gate(ray_session):
    from smqtk_indexing_ray.pipelines.terms import line_dedup

    with pytest.raises(ValueError, match="max_hot_lines"):
        line_dedup(_ds(LINE_DOCS), min_df=1, max_hot_lines=2)


@pytest.mark.parametrize("one_in", [1, 5, 7, 1000])
def test_heavy_hitters_matches_brute_force(ray_session, one_in):
    from collections import Counter

    from smqtk_indexing_ray.pipelines.terms import heavy_hitters

    toks = [w for r in DOCS for w in r[1].split()]
    total = len(toks)
    expect = {t: c for t, c in Counter(toks).items()
              if c * one_in >= total}
    from smqtk_indexing_ray.pipelines.terms import HEAVY_HITTERS_SCHEMA
    out = _table(heavy_hitters(_ds(DOCS), one_in=one_in),
                 schema=HEAVY_HITTERS_SCHEMA).to_pydict()
    got = dict(zip(out["term"], out["cnt"]))
    assert got == expect


def test_heavy_hitters_exact_counts_across_batches(ray_session):
    """A term heavy globally but below the batch threshold in some
    batches must still come back with its EXACT global count (the
    verify pass recounts candidates in every batch, not just the
    batches that nominated them)."""
    from smqtk_indexing_ray.pipelines.terms import heavy_hitters

    # 'spread' is dense in doc 0 (4/10 tokens -> nominated by that
    # batch) but sparse in docs 1-4 (1/50 each -> 1 * one_in < 50 and
    # even 2 * one_in < 100, below every batch threshold there).
    # Globally 8/210 with one_in=27: 8*27=216 >= 210, a true heavy
    # hitter whose exact count needs recounts from the batches that
    # did NOT nominate it.
    rows = [(0, "spread spread spread spread a b c d e f", "en", "s", 0)]
    rows += [(i, " ".join(["spread"] + [f"w{i}_{j}" for j in range(49)]),
              "en", "s", 0) for i in range(1, 5)]
    out = _table(heavy_hitters(_ds(rows), one_in=27)).to_pydict()
    got = dict(zip(out["term"], out["cnt"]))
    assert got == {"spread": 8}


def test_heavy_hitters_candidate_gate(ray_session):
    from smqtk_indexing_ray.pipelines.terms import heavy_hitters

    with pytest.raises(ValueError, match="candidate"):
        _table(heavy_hitters(_ds(DOCS), one_in=1000, max_candidates=2))


def test_heavy_hitters_empty_and_one_in_validation(ray_session):
    from smqtk_indexing_ray.pipelines.terms import heavy_hitters

    empty = [(0, "", "en", "s0", 0), (1, "", "en", "s1", 0)]
    from smqtk_indexing_ray.pipelines.terms import HEAVY_HITTERS_SCHEMA
    out = _table(heavy_hitters(_ds(empty), one_in=10),
                 schema=HEAVY_HITTERS_SCHEMA)
    assert out.num_rows == 0
    with pytest.raises(ValueError, match="one_in"):
        heavy_hitters(_ds(DOCS), one_in=0)


def test_vocab_stats_matches_brute_force(ray_session):
    from collections import Counter

    from smqtk_indexing_ray.pipelines.terms import vocab_stats

    cnt = Counter(w for r in DOCS for w in r[1].split())
    out = _table(vocab_stats(_ds(DOCS))).to_pydict()
    assert out["n_terms"] == [len(cnt)]
    assert out["n_tokens"] == [sum(cnt.values())]
    assert out["hapax_terms"] == [sum(1 for c in cnt.values() if c == 1)]


def test_vocab_stats_empty(ray_session):
    from smqtk_indexing_ray.pipelines.terms import vocab_stats

    empty = [(0, "", "en", "s0", 0)]
    out = _table(vocab_stats(_ds(empty))).to_pydict()
    assert out == {"n_terms": [0], "n_tokens": [0], "hapax_terms": [0]}


def test_distinct_terms_hll_accuracy_and_determinism(ray_session):
    from smqtk_indexing_ray.pipelines.terms import distinct_terms_hll

    # 3000 distinct tokens, each appearing 1-3 times across 150 docs
    rng = np.random.default_rng(9)
    toks = [f"w{i}" for i in range(3000)]
    stream = toks + [toks[i] for i in rng.integers(0, 3000, size=2500)]
    rng.shuffle(stream)
    rows = [(d, " ".join(stream[d * 37:(d + 1) * 37]), "en", "s", 0)
            for d in range(len(stream) // 37 + 1)]
    exact = len(set(w for r in rows for w in r[1].split()))

    est1 = _table(distinct_terms_hll(_ds(rows))).to_pydict()
    est2 = _table(distinct_terms_hll(_ds(rows))).to_pydict()
    assert est1 == est2, "HLL must be deterministic across runs"
    assert est1["precision_p"] == [14]
    got = est1["n_distinct_est"][0]
    assert abs(got - exact) / exact < 0.05, (got, exact)


def test_distinct_terms_hll_empty_and_validation(ray_session):
    from smqtk_indexing_ray.pipelines.terms import distinct_terms_hll

    empty = [(0, "", "en", "s0", 0)]
    out = _table(distinct_terms_hll(_ds(empty))).to_pydict()
    assert out["n_distinct_est"] == [0]
    with pytest.raises(ValueError, match="p must"):
        distinct_terms_hll(_ds(DOCS), p=3)


def test_bit_length_u64_exact():
    from smqtk_indexing_ray.pipelines.terms import _bit_length_u64

    xs = np.array([0, 1, 2, 3, 4, (1 << 53) - 1, 1 << 53, (1 << 53) + 1,
                   (1 << 63) - 1, 1 << 63, (1 << 64) - 1], dtype=np.uint64)
    got = _bit_length_u64(xs)
    expect = [int(x).bit_length() for x in xs.tolist()]
    assert got.tolist() == expect


def test_novel_docs(ray_session):
    import pyarrow.compute as pc
    from smqtk_indexing_ray.pipelines.terms import novel_docs

    rows = [
        (0, "shared text", "en", "s", 0),     # corpus
        (2, "corpus only", "en", "s", 0),     # corpus
        (1, "shared text", "en", "s", 0),     # new, dup of corpus
        (3, "brand new", "en", "s", 0),       # new, novel
        (5, "brand new", "en", "s", 0),       # new, dup within new: kept
        (7, "corpus only", "en", "s", 0),     # new, dup of corpus
    ]
    ds = _ds(rows)
    new_side = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1)),
        batch_format="pyarrow")
    corpus = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)),
        batch_format="pyarrow")
    out = _table(novel_docs(new_side, corpus)).to_pydict()
    assert sorted(out["doc_id"]) == [3, 5]


def test_pair_member_collision_runs():
    from smqtk_indexing_ray.pipelines.terms import _pair_member

    hot1 = np.array([1, 5, 5, 5, 9], dtype=np.int64)
    hot2 = np.array([10, 2, 4, 8, 0], dtype=np.int64)
    a1 = np.array([1, 5, 5, 5, 9, 7, 1], dtype=np.int64)
    a2 = np.array([10, 4, 8, 3, 0, 7, 11], dtype=np.int64)
    want = np.array([True, True, True, False, True, False, False])
    assert (_pair_member(hot1, hot2, a1, a2) == want).all()


def _bigram_brute(rows, k, min_count):
    from collections import Counter
    pair = Counter()
    uni = Counter()
    for r in rows:
        ws = r[1].split()
        uni.update(ws)
        pair.update(zip(ws, ws[1:]))
    n = sum(uni.values())
    sel = sorted((p for p, c in pair.items() if c >= min_count),
                 key=lambda p: (-pair[p], p[0], p[1]))[:k]
    return {p: (pair[p], float(pair[p] * n) / float(uni[p[0]] * uni[p[1]]))
            for p in sel}


def test_top_bigrams_matches_brute_force(ray_session):
    from smqtk_indexing_ray.pipelines.terms import top_bigrams

    out = _table(top_bigrams(_ds(DOCS), k=5, min_count=1)).to_pydict()
    got = {(a, b): (c, lf) for a, b, c, lf in zip(
        out["w1"], out["w2"], out["cnt"], out["lift"])}
    expect = _bigram_brute(DOCS, k=5, min_count=1)
    assert got == expect
    # "cat cat" (doc 2) must count 3, and "mat the" (doc 0 end -> doc 3
    # start) must NOT exist: pairs never span documents
    assert got[("cat", "cat")][0] == 3
    full = _table(top_bigrams(_ds(DOCS), k=100, min_count=1)).to_pydict()
    assert ("mat", "the") not in set(zip(full["w1"], full["w2"]))


def test_top_bigrams_min_count_and_multiblock(ray_session):
    from smqtk_indexing_ray.pipelines.terms import top_bigrams

    rows = [(i, "x y " * (i % 3 + 1) + f"tail{i} x", "en", "s", 0)
            for i in range(40)]
    for n_blocks in (1, 8):
        ds = _ds(rows)
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
        out = _table(top_bigrams(ds, k=3, min_count=2)).to_pydict()
        got = {(a, b): (c, lf) for a, b, c, lf in zip(
            out["w1"], out["w2"], out["cnt"], out["lift"])}
        assert got == _bigram_brute(rows, k=3, min_count=2)


def test_top_bigrams_empty_and_validation(ray_session):
    from smqtk_indexing_ray.pipelines.terms import top_bigrams

    empty = [(0, "", "en", "s0", 0), (1, "solo", "en", "s0", 0)]
    out = _table(top_bigrams(_ds(empty))).to_pydict()
    assert out == {"w1": [], "w2": [], "cnt": [], "lift": []}
    with pytest.raises(ValueError, match="k must"):
        top_bigrams(_ds(DOCS), k=0)
    with pytest.raises(ValueError, match="min_count"):
        top_bigrams(_ds(DOCS), min_count=0)


def test_doc_commonness_matches_sql(ray_session):
    """Broadcast-vocab frequency scoring vs the exact DuckDB join
    oracle; empty doc emits no row."""
    from smqtk_indexing_ray.pipelines.terms import doc_commonness

    got = _table(doc_commonness(_ds(DOCS))).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    con = _duck(DOCS)
    want = con.sql(r"""
        WITH toks AS (
          SELECT doc_id,
            list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
          FROM documents),
        tok AS (SELECT doc_id, unnest(w) AS term FROM toks),
        tf AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term)
        SELECT tok.doc_id, count(*) AS n_tokens,
          CAST(sum(cnt) AS BIGINT) AS sum_cnt,
          CAST(min(cnt) AS BIGINT) AS min_cnt,
          CAST(sum(cnt) AS DOUBLE) / count(*) AS mean_cnt
        FROM tok JOIN tf USING (term) GROUP BY tok.doc_id
        ORDER BY tok.doc_id
    """).df()
    assert 1 not in set(got.doc_id)           # empty doc dropped
    import pandas as pd
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_doc_commonness_vocab_gate(ray_session):
    from smqtk_indexing_ray.pipelines.terms import doc_commonness
    with pytest.raises(ValueError, match="max_vocab"):
        doc_commonness(_ds(DOCS), max_vocab=3)


def _para_brute(rows, wpp):
    """Keep-first paragraph dedup oracle: global (doc_id, pos) order."""
    paras = []
    for doc_id, text, *_ in sorted(rows):
        w = text.split()
        for g in range((len(w) + wpp - 1) // wpp):
            paras.append((doc_id, g, " ".join(w[g * wpp:(g + 1) * wpp])))
    seen, kept = set(), {r[0]: [] for r in rows}
    for doc_id, _g, p in paras:
        if p not in seen:
            seen.add(p)
            kept[doc_id].append(p)
    return {d: " ".join(ps) for d, ps in kept.items()}


def test_paragraph_dedup_keep_first(ray_session):
    """Cross-doc dup paragraphs (later copy scrubbed), within-doc dup,
    short tail paragraph, empty doc, fully-claimed doc -> '' text."""
    from smqtk_indexing_ray.pipelines.terms import paragraph_dedup

    rows = [
        (0, "a b c d e f", "en", "s0", 0),       # paras: "a b c", "d e f"
        (1, "d e f g", "en", "s0", 0),           # "d e f" claimed by 0
        (2, "", "en", "s1", 0),                  # empty -> stays empty
        (3, "a b c", "en", "s1", 0),             # fully claimed -> ""
        (4, "x y z x y z x", "en", "s2", 0),     # within-doc tail differs
        (5, "x y z", "en", "s2", 0),             # claimed by 4
    ]
    for n_blocks in (1, 4):
        ds = _ds(rows)
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
        got = {r["doc_id"]: r["text"] for r in
               _table(paragraph_dedup(ds, words_per_para=3)).to_pylist()}
        assert got == _para_brute(rows, 3)


def test_paragraph_dedup_tie_goes_to_lowest_doc_pos(ray_session):
    """Same paragraph at different positions: (doc_id, pos) min wins."""
    from smqtk_indexing_ray.pipelines.terms import paragraph_dedup

    rows = [
        (7, "dup dup", "en", "s0", 0),
        (2, "zzz yyy dup dup", "en", "s0", 0),   # doc 2 pos 1 beats doc 7
    ]
    got = {r["doc_id"]: r["text"] for r in
           _table(paragraph_dedup(_ds(rows), words_per_para=2))
           .to_pylist()}
    assert got == {2: "zzz yyy dup dup", 7: ""}


def test_paragraph_dedup_validation(ray_session):
    from smqtk_indexing_ray.pipelines.terms import paragraph_dedup

    with pytest.raises(ValueError, match="words_per_para"):
        paragraph_dedup(_ds(DOCS), words_per_para=0)

    import ray.data as rd
    big = pa.table({
        "doc_id": pa.array([1 << 42], pa.int64()),
        "text": pa.array(["hi"], pa.string()),
    })
    with pytest.raises(Exception, match="2\\^42"):
        _table(paragraph_dedup(rd.from_arrow(big), words_per_para=2))


def test_source_vocab_overlap(ray_session):
    """Hand-computable pairwise vocab Jaccard: s0={the,cat,sat,on,mat},
    s1={cat,the,sat,on,mat}, s2={one..six,alpha,beta,gamma} — s0/s1
    identical vocab, s2 disjoint (so the s2 pairs are absent)."""
    from smqtk_indexing_ray.pipelines.terms import source_vocab_overlap
    got = source_vocab_overlap(_ds(DOCS)).to_pandas()
    assert len(got) == 1  # only s0-s1 share terms
    r = got.iloc[0]
    assert (r.source_a, r.source_b) == ("s0", "s1")
    assert r.vocab_a == 5 and r.vocab_b == 5  # {the,cat,sat,on,mat}
    assert r.n_common_terms == 5
    assert r.jaccard == 1.0


def test_source_vocab_overlap_matches_duckdb(ray_session):
    """Randomized corpus parity vs the exact oracle SQL shape, with
    groups straddling blocks."""
    import ray.data as rd
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    srcs = ["a", "b", "c", "d"]
    rows = []
    for i in range(60):
        words = rng.choice(vocab, size=rng.integers(3, 12))
        rows.append((i, " ".join(words), "en",
                     srcs[int(rng.integers(0, 4))], 0))
    docs = _ds(rows).repartition(5)
    from smqtk_indexing_ray.pipelines.terms import source_vocab_overlap
    got = source_vocab_overlap(docs).to_pandas().sort_values(
        ["source_a", "source_b"], ignore_index=True)
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
    }))
    exp = con.execute(r"""WITH ts AS (SELECT DISTINCT source, term FROM (
      SELECT source, unnest(list_filter(string_split_regex(text,'\s+'),
        x -> x<>'')) AS term FROM documents)),
    vs AS (SELECT source, count(*) AS v FROM ts GROUP BY source),
    i AS (SELECT a.source AS source_a, b.source AS source_b,
          count(*) AS n_common_terms FROM ts a JOIN ts b
          ON a.term = b.term AND a.source < b.source GROUP BY 1,2)
    SELECT source_a, source_b, n_common_terms, va.v AS vocab_a,
      vb.v AS vocab_b, CAST(n_common_terms AS DOUBLE)
        / (va.v + vb.v - n_common_terms) AS jaccard
    FROM i JOIN vs va ON va.source = i.source_a
    JOIN vs vb ON vb.source = i.source_b
    ORDER BY source_a, source_b""").df()
    import pandas as pd
    pd.testing.assert_frame_equal(got, exp)


def test_bm25_topk_matches_duckdb(ray_session):
    """Randomized corpus parity with the oracle SQL shape, including
    docs with zero query-term hits (absent on both sides), empty docs,
    and score ties broken by doc_id."""
    import ray.data as rd
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(20)] + ["spark", "window"]
    rows = []
    for i in range(80):
        words = rng.choice(vocab, size=rng.integers(0, 15))
        rows.append((i, " ".join(words), "en", "s0", 0))
    rows.append((80, "spark spark spark", "en", "s0", 0))
    rows.append((81, "spark spark spark", "en", "s0", 0))  # tie with 80
    docs = _ds(rows).repartition(6)
    from smqtk_indexing_ray.pipelines.terms import bm25_topk
    got = bm25_topk(docs, "spark window missingterm", k=10).to_pandas()
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    exp = con.execute(r"""
WITH toks AS (SELECT doc_id,
  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
  FROM documents),
dl AS (SELECT doc_id, len(w) AS dl FROM toks),
stats AS (SELECT count(*) AS n,
  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(w) AS term FROM toks)
  WHERE term IN ('spark', 'window', 'missingterm')
  GROUP BY doc_id, term),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id, sum(
    ln((s.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
    * (tf.tf * (1.2 + 1.0))
    / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN dfs USING (term) JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s GROUP BY tf.doc_id)
SELECT doc_id, rank, score FROM (
  SELECT doc_id, round(score, 6) AS score,
  CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
    AS BIGINT) AS rank FROM sc) WHERE rank <= 10 ORDER BY rank
""").df()
    import pandas as pd
    pd.testing.assert_frame_equal(got.to_pandas() if hasattr(got, "to_pandas")
                                  else got, exp)
    # the planted tie: equal scores, doc_id 80 ranked before 81
    r80 = got[got.doc_id == 80]
    r81 = got[got.doc_id == 81]
    if len(r80) and len(r81):
        assert float(r80.score.iloc[0]) == float(r81.score.iloc[0])
        assert int(r80["rank"].iloc[0]) < int(r81["rank"].iloc[0])


def test_bm25_validation(ray_session):
    from smqtk_indexing_ray.pipelines.terms import (
        BM25_MAX_QUERY_TERMS, bm25_topk)
    with pytest.raises(ValueError, match="no terms"):
        bm25_topk(_ds(DOCS), "   ")
    big = " ".join(f"t{i}" for i in range(BM25_MAX_QUERY_TERMS + 1))
    with pytest.raises(ValueError, match="MAX_QUERY_TERMS"):
        bm25_topk(_ds(DOCS), big)


def test_top_terms_per_lang(ray_session):
    """Hand-checked grouped top-k with count-tie term-ascending order:
    en counts: the=4(x2 docs), cat=6, ... fr: alpha=2, beta=2, gamma=1."""
    from smqtk_indexing_ray.pipelines.terms import top_terms_per_lang
    got = top_terms_per_lang(_ds(DOCS), k=2).to_pandas()
    en = got[got.lang == "en"].sort_values("rank")
    fr = got[got.lang == "fr"].sort_values("rank")
    assert list(en.term) == ["cat", "the"]       # 6 > 4
    assert list(en.cnt) == [6, 4]
    assert list(fr.term) == ["alpha", "beta"]    # tie 2==2, term asc
    assert list(fr.cnt) == [2, 2]
    assert list(fr["rank"]) == [1, 2]


def test_vocab_overlap_and_top_terms_null_group_keys(ray_session):
    """Null lang/source group keys behave exactly like '' (the Ray
    fill_null convention the oracles mirror with coalesce) — pinned
    after a review caught the oracles diverging on nulls."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.terms import (
        source_vocab_overlap, top_terms_per_lang)
    t = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["shared alone", "shared other",
                          "shared nullside", "shared nullside2"]),
        "lang": pa.array(["en", "en", None, ""], pa.string()),
        "source": pa.array(["a", "b", None, ""], pa.string()),
    })
    docs = rd.from_arrow(t).repartition(2)
    ov = source_vocab_overlap(docs).to_pandas()
    # null source merged with "": pair ("", "a") and ("", "b") exist
    assert set(zip(ov.source_a, ov.source_b)) == {
        ("", "a"), ("", "b"), ("a", "b")}
    null_row = ov[(ov.source_a == "") & (ov.source_b == "a")].iloc[0]
    assert null_row.vocab_a == 3  # shared, nullside, nullside2
    tt = top_terms_per_lang(docs, k=5).to_pandas()
    empty_lang = tt[tt.lang == ""]
    assert set(empty_lang.term) == {"shared", "nullside", "nullside2"}
    assert empty_lang[empty_lang.term == "shared"].cnt.iloc[0] == 2


def test_count_min_never_undercounts_and_exact_at_width(ray_session):
    """CM guarantees: estimates never undercount (any width), and with
    width clearing the vocabulary the estimate is exact; absent terms
    estimate 0 unless they collide."""
    from smqtk_indexing_ray.pipelines.terms import count_min_freqs
    probes = ["cat", "the", "alpha", "zzz-missing"]
    wide = count_min_freqs(_ds(DOCS), probes, width=1 << 14,
                           depth=4).to_pandas().set_index("term")
    assert wide.loc["cat", "exact_cnt"] == 6
    assert (wide.overcount == 0).all()      # no collisions at 16k width
    # brutal width forces collisions: still never undercounts
    tiny = count_min_freqs(_ds(DOCS), probes, width=4,
                           depth=2).to_pandas()
    assert (tiny.overcount >= 0).all()
    assert (tiny.est_cnt >= tiny.exact_cnt).all()


def test_count_min_validation(ray_session):
    from smqtk_indexing_ray.pipelines.terms import count_min_freqs
    with pytest.raises(ValueError, match="no probe terms"):
        count_min_freqs(_ds(DOCS), [])


def test_strided_windows(ray_session):
    """Window plan semantics: n=6 tokens with window=4 stride=2 gives
    starts 0,2,4 with lens 4,4,2; exactly-one-window docs; empty docs
    emit nothing; short tail windows flagged not-full."""
    from smqtk_indexing_ray.pipelines.terms import strided_windows
    got = strided_windows(_ds(DOCS), window=4,
                          stride=2).to_pandas()
    d0 = got[got.doc_id == 0].sort_values("win_idx")
    assert list(d0.tok_start) == [0, 2, 4]
    assert list(d0.tok_len) == [4, 4, 2]
    assert list(d0.is_full) == [True, True, False]
    assert 1 not in set(got.doc_id)              # empty doc: no windows
    d2 = got[got.doc_id == 2]                    # 4 tokens: starts 0, 2
    assert list(d2.tok_len) == [4, 2]
    # conservation: every token is covered by at least one window
    for d, g in got.groupby("doc_id"):
        n = len(DOCS[d][1].split())
        assert (g.tok_start + g.tok_len).max() == n
    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        strided_windows(_ds(DOCS), window=0, stride=2)


def test_vocab_growth(ray_session):
    """Growth curve on the fixture: prefix 1 sees only doc 0's vocab
    (5 terms), the full ladder saturates at the corpus vocabulary, and
    the curve is monotone."""
    from smqtk_indexing_ray.pipelines.terms import vocab_growth
    got = vocab_growth(_ds(DOCS)).to_pandas().sort_values(
        "prefix_docs", ignore_index=True)
    assert len(got) == 21
    by = dict(zip(got.prefix_docs, got.n_distinct_terms))
    assert by[1] == 5                      # doc 0: the cat sat on mat
    vocab_all = len({w for _, txt, *_ in DOCS for w in txt.split()})
    assert by[1 << 20] == vocab_all
    assert (got.n_distinct_terms.diff().dropna() >= 0).all()


def test_count_min_param_validation(ray_session):
    from smqtk_indexing_ray.pipelines.terms import count_min_freqs
    with pytest.raises(ValueError, match="width and depth"):
        count_min_freqs(_ds(DOCS), ["cat"], depth=0)
    with pytest.raises(ValueError, match="width and depth"):
        count_min_freqs(_ds(DOCS), ["cat"], width=0)


@pytest.mark.usefixtures("ray_session")
def test_posting_lists_matches_duckdb():
    """Inverted-index shard vs the SQL string_agg oracle: a hot term
    present in more docs than the cap keeps exact df but truncated
    postings; repeated terms within a doc post once."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.terms import posting_lists

    rng = np.random.default_rng(31)
    n = 200
    texts = []
    for i in range(n):
        words = list(rng.choice(
            ["alpha", "beta", "gamma", "delta"],
            rng.integers(3, 12)))
        words += ["common"]            # in every doc -> df 200, cap 5
        if i % 7 == 0:
            words += ["rare", "rare"]  # repeated within doc
        texts.append(" ".join(words))
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    got = posting_lists(
        rd.from_arrow(t).repartition(6),
        max_postings=5).to_pandas().sort_values(
        "term", ignore_index=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute(
        r"WITH toks AS (SELECT doc_id, list_filter("
        r" string_split_regex(text, '\s+'), x -> x <> '') AS w"
        r" FROM documents),"
        r" td AS (SELECT DISTINCT doc_id, unnest(w) AS term FROM toks),"
        r" r AS (SELECT term, doc_id, row_number() OVER ("
        r"  PARTITION BY term ORDER BY doc_id) AS rn FROM td),"
        r" dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM td"
        r"  GROUP BY term),"
        r" p AS (SELECT term, string_agg(CAST(doc_id AS VARCHAR), ','"
        r"  ORDER BY rn) AS postings FROM r WHERE rn <= 5"
        r"  GROUP BY term)"
        r" SELECT term, df, postings FROM dfs JOIN p USING (term)"
        r" ORDER BY term").df()
    assert len(got) == len(want) > 0
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col
    row = got.set_index("term").loc["common"]
    assert row.df == n and row.postings == "0,1,2,3,4"


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_chars_matches_bruteforce():
    """Gopher duplicate-n-gram char fractions vs a plain dict-based
    brute force: a looping doc scores high at every n, a unique doc
    scores 0, short docs (< n tokens) score 0, repeats crossing block
    layouts stay batch-local per doc."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.terms import dup_ngram_chars

    texts = [
        "spam ham spam ham spam ham",       # heavy bigram repetition
        "one two three four five six",      # all unique
        "x",                                # < 2 tokens
        "",                                 # empty
        "a b c a b c a b c",                # repeated trigram chorus
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array(
            np.array([len(x) for x in texts], np.int64)),
    })
    got = dup_ngram_chars(
        rd.from_arrow(t).repartition(3)).to_pandas().sort_values(
        "doc_id", ignore_index=True)

    def brute(text, n):
        w = text.split()
        if len(w) < n or not text:
            return 0.0
        grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        cnt = {}
        for g in grams:
            cnt[g] = cnt.get(g, 0) + 1
        dup = sum(len(g) * c for g, c in cnt.items() if c >= 2)
        return dup / float(len(text)) if len(text) else 0.0

    for i, text in enumerate(texts):
        for n, col in ((2, "dup2_frac"), (3, "dup3_frac"),
                       (4, "dup4_frac")):
            assert got.loc[i, col] == brute(text, n), (i, n)
    assert got.loc[0, "dup2_frac"] > 0.9        # the loop
    assert got.loc[1, "dup2_frac"] == 0.0
    assert got.loc[4, "dup3_frac"] > 0.5        # the chorus


@pytest.mark.usefixtures("ray_session")
class TestDsirWeights:
    def _ds(self, texts, langs, parts=3):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        })).repartition(parts)

    @staticmethod
    def _brute(texts, langs, target="en", alpha=0.5):
        from collections import Counter
        tgt, raw = Counter(), Counter()
        for txt, lg in zip(texts, langs):
            (tgt if lg == target else raw).update((txt or "").split())
        vocab = set(tgt) | set(raw)
        v = len(vocab)
        tt, rt = sum(tgt.values()), sum(raw.values())
        r = {w: (np.log((tgt[w] + alpha) / (tt + alpha * v))
                 - np.log((raw[w] + alpha) / (rt + alpha * v)))
             for w in vocab}
        out = {}
        for i, txt in enumerate(texts):
            ws = (txt or "").split()
            if ws:
                out[i] = (len(ws), sum(r[w] for w in ws))
        return out

    def test_matches_bruteforce(self):
        from smqtk_indexing_ray.functions.metrics import round6
        from smqtk_indexing_ray.pipelines.terms import dsir_weights
        rng = np.random.default_rng(17)
        tgt_words = ["alpha", "beta", "gamma", "shared"]
        raw_words = ["uno", "dos", "tres", "shared"]
        texts, langs = [], []
        for i in range(30):
            pool = tgt_words if i % 2 == 0 else raw_words
            texts.append(" ".join(rng.choice(pool, 25)))
            langs.append("en" if i % 2 == 0 else "de")
        texts.append("")                         # token-less: omitted
        langs.append("en")
        got = dsir_weights(self._ds(texts, langs)).to_pandas(
        ).set_index("doc_id")
        want = self._brute(texts, langs)
        assert set(got.index) == set(want)
        for i, (n, w) in want.items():
            assert got.loc[i, "n_tokens"] == n
            assert got.loc[i, "weight"] == round6(np.array([w]))[0]
        # target-like docs score positive, raw-like negative
        assert (got.loc[[i for i in got.index if i % 2 == 0],
                        "weight"] > 0).all()
        assert (got.loc[[i for i in got.index if i % 2 == 1],
                        "weight"] < 0).all()

    def test_vocab_gate_raises(self):
        from smqtk_indexing_ray.pipelines.terms import dsir_weights
        texts = ["w%d x%d y%d" % (i, i + 1, i + 2) for i in range(20)]
        with pytest.raises(ValueError, match="max_vocab"):
            dsir_weights(self._ds(texts, ["en"] * 20),
                         max_vocab=5).to_pandas()

    def test_deterministic_across_partitioning(self):
        from smqtk_indexing_ray.pipelines.terms import dsir_weights
        rng = np.random.default_rng(3)
        texts = [" ".join(rng.choice(["a", "bb", "ccc", "dd"], 40))
                 for _ in range(25)]
        langs = ["en" if i < 10 else "fr" for i in range(25)]
        a = dsir_weights(self._ds(texts, langs, parts=2)).to_pandas(
        ).sort_values("doc_id", ignore_index=True)
        b = dsir_weights(self._ds(texts, langs, parts=8)).to_pandas(
        ).sort_values("doc_id", ignore_index=True)
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestDupSpanStats:
    def _docs(self, texts, parts=3):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })).repartition(parts)

    def test_planted_spans_hand_computed(self):
        """Two docs share one 5-token phrase (one span each: 5 dup
        tokens = 3 flagged windows), a third doc is unique, a fourth
        shares TWO disjoint phrases with doc 0 (two spans)."""
        from smqtk_indexing_ray.pipelines.terms import dup_span_stats
        ph1 = "the quick brown fox jumps"
        ph2 = "over lazy sleeping dogs now"
        texts = [
            f"{ph1} u0a u0b u0c {ph2}",          # doc0: both phrases
            f"v0 v1 {ph1} v2 v3",                 # doc1: phrase 1
            "w0 w1 w2 w3 w4 w5 w6 w7",            # doc2: unique
            f"x0 {ph2} x1 x2 x3 x4",              # doc3: phrase 2
        ]
        got = dup_span_stats(self._docs(texts), k=3).to_pandas(
        ).set_index("doc_id").sort_index()
        # doc0: 13 tokens; dup windows = 3 (ph1) + 3 (ph2); spans 2;
        # dup tokens 5 + 5
        assert got.loc[0, "n_tokens"] == 13
        assert got.loc[0, "dup_windows"] == 6
        assert got.loc[0, "n_dup_spans"] == 2
        assert got.loc[0, "dup_tokens"] == 10
        assert got.loc[1, "n_dup_spans"] == 1
        assert got.loc[1, "dup_tokens"] == 5
        assert got.loc[2, "dup_windows"] == 0
        assert got.loc[2, "dup_tokens"] == 0
        assert got.loc[2, "dup_token_frac"] == 0.0
        assert got.loc[3, "n_dup_spans"] == 1
        assert got.loc[3, "dup_tokens"] == 5

    def test_scale_path_equals_broadcast(self):
        """max_broadcast=0 drives the sort_attach + LAG path; output
        must equal the broadcast path bit-for-bit, including zero-dup
        docs re-entered by the left attach."""
        from smqtk_indexing_ray.pipelines.terms import dup_span_stats
        rng = np.random.default_rng(47)
        words = ["w%d" % i for i in range(40)]
        base = [" ".join(rng.choice(words, 30)) for _ in range(15)]
        texts = base + [base[0] + " tail x y", "zz yy xx ww vv"]
        a = dup_span_stats(self._docs(texts), k=3).to_pandas(
        ).sort_values("doc_id", ignore_index=True)
        b = dup_span_stats(self._docs(texts), k=3,
                           max_broadcast=0).to_pandas().sort_values(
            "doc_id", ignore_index=True)
        assert len(a) == len(texts)
        assert a.equals(b)

    def test_short_and_empty_docs_omitted(self):
        from smqtk_indexing_ray.pipelines.terms import dup_span_stats
        texts = ["a b", "", "one two three four", "one two three four"]
        got = dup_span_stats(self._docs(texts), k=3).to_pandas()
        assert sorted(got.doc_id) == [2, 3]
        assert (got.dup_token_frac == 1.0).all()


@pytest.mark.usefixtures("ray_session")
class TestDupSpanScrub:
    def _docs(self, texts, parts=3):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })).repartition(parts)

    def test_planted_phrase_removed(self):
        from smqtk_indexing_ray.pipelines.terms import dup_span_scrub
        ph = "the quick brown fox jumps"
        texts = [
            f"{ph} u0 u1 u2",
            f"v0 v1 {ph} v2",
            "w0 w1 w2 w3 w4",
            "a b",                     # < k tokens: untouched
            None,                      # null: empty rebuild
        ]
        got = dup_span_scrub(self._docs(texts), k=3).to_pandas(
        ).set_index("doc_id").sort_index()
        assert got.loc[0, "text"] == "u0 u1 u2"
        assert got.loc[0, "n_removed"] == 5
        assert got.loc[1, "text"] == "v0 v1 v2"
        assert got.loc[1, "n_removed"] == 5
        assert got.loc[2, "text"] == "w0 w1 w2 w3 w4"
        assert got.loc[2, "n_removed"] == 0
        assert got.loc[3, "text"] == "a b"
        assert got.loc[4, "text"] == "" and got.loc[4, "n_tokens"] == 0

    def test_whole_doc_removed_is_empty(self):
        from smqtk_indexing_ray.pipelines.terms import dup_span_scrub
        texts = ["same exact tiny doc", "same exact tiny doc",
                 "an unrelated document here"]
        got = dup_span_scrub(self._docs(texts), k=3).to_pandas(
        ).set_index("doc_id").sort_index()
        assert got.loc[0, "text"] == "" and got.loc[1, "text"] == ""
        assert got.loc[0, "n_removed"] == 4
        assert got.loc[2, "n_removed"] == 0

    def test_broadcast_gate_raises(self):
        from smqtk_indexing_ray.pipelines.terms import dup_span_scrub
        texts = ["p q r s t", "p q r s t"]
        with pytest.raises(ValueError, match="max_broadcast"):
            dup_span_scrub(self._docs(texts), k=3,
                           max_broadcast=0).to_pandas()
