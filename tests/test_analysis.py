"""Text-analysis / ANN operator tests on hand-built fixtures (the driver's
DuckDB oracle covers the same ops at sf0.01; these pin exact semantics
offline, reference style: tests/impls/nn_index/test_lsh.py:190-723 exact
table assertions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d e f",
            "a b c d e f",                 # exact dup of 0
            "a b c d e g",                 # near dup (5/7 trigram overlap)
            "x y z w v u",
            "the a the a",
        ]),
        "lang": pa.array(["en", "en", "de", "de", "en"]),
    }))


def _emb(n=40, d=8):
    import ray.data as rd
    rng = np.random.default_rng(1)
    m = rng.standard_normal((n, d)).astype(np.float32)
    m[1] = m[0] + 0.01 * rng.standard_normal(d).astype(np.float32)  # near-dup
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(r) for r in m],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, dtype=np.int32)),
    }))


@pytest.mark.usefixtures("ray_session")
class TestTextAnalysis:
    def test_exact_dedup(self):
        from smqtk_indexing_ray.pipelines.analysis import exact_dedup
        df = exact_dedup(_docs()).to_pandas().sort_values(
            "rep_doc", ignore_index=True)
        assert dict(zip(df.rep_doc, df.n_copies)) == {0: 2, 2: 1, 3: 1, 4: 1}

    def test_exact_cluster_labels(self):
        from smqtk_indexing_ray.pipelines.analysis import exact_cluster_labels
        df = exact_cluster_labels(_docs()).to_pandas()
        assert dict(zip(df.doc_id, df.cluster_id)) == {
            0: 0, 1: 0, 2: 2, 3: 3, 4: 4}

    def test_exact_cluster_sizes(self):
        from smqtk_indexing_ray.pipelines.analysis import exact_cluster_sizes
        df = exact_cluster_sizes(_docs()).to_pandas()
        assert dict(zip(df.doc_id, df.cluster_size)) == {
            0: 2, 1: 2, 2: 1, 3: 1, 4: 1}

    def test_cross_source_dups(self):
        """Planted cross-source duplicates, split across blocks so both
        sorted aggregations see boundary-straddling groups."""
        import ray.data as rd

        from smqtk_indexing_ray.pipelines.analysis import cross_source_dups
        texts = (["syndicated article body"] * 4      # 3 sources, 4 copies
                 + ["single source template"] * 3     # 1 source, 3 copies
                 + ["unique page"])
        sources = ["cc", "cc", "news", "wiki",
                   "cc", "cc", "cc",
                   "wiki"]
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(8), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(sources, pa.string()),
        })).repartition(4)
        df = cross_source_dups(docs).to_pandas().set_index("rep_doc")
        assert len(df) == 3
        assert df.loc[0, "n_copies"] == 4 and df.loc[0, "n_sources"] == 3
        assert bool(df.loc[0, "is_cross_source"])
        assert df.loc[4, "n_copies"] == 3 and df.loc[4, "n_sources"] == 1
        assert not bool(df.loc[4, "is_cross_source"])
        assert df.loc[7, "n_copies"] == 1 and df.loc[7, "n_sources"] == 1

    def test_normalized_cluster_labels(self):
        """Case/whitespace tier vs the DuckDB window oracle on
        adversarial rows: case-only dups, whitespace-only dups, a
        null text, an all-whitespace text, and a unicode casefold."""
        import duckdb
        import ray.data as rd

        from smqtk_indexing_ray.pipelines.analysis import (
            normalized_cluster_labels)

        t = pa.table({
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "text": pa.array([
                "Hello World",
                "hello   world",       # ws+case dup of 0
                " hello world ",       # edge-ws dup of 0
                "hello world!",        # NOT a dup (punct differs)
                None,                  # null -> '' under the oracle
                "   ",                 # all-ws -> '' too
                "Größe Straße",
                "größe straße",        # unicode lower dup of 6
            ], pa.string()),
        })
        got = normalized_cluster_labels(
            rd.from_arrow(t).repartition(3)).to_pandas().sort_values(
            "doc_id", ignore_index=True)
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        want = con.execute(
            r"WITH n AS (SELECT doc_id, text,"
            r" lower(regexp_replace(regexp_replace(coalesce(text, ''),"
            r" '\s+', ' ', 'g'), '^ | $', '', 'g')) AS norm"
            r" FROM documents)"
            r" SELECT doc_id,"
            r" min(doc_id) OVER (PARTITION BY coalesce(text, ''))"
            r"   AS exact_cid,"
            r" min(doc_id) OVER (PARTITION BY norm) AS norm_cid"
            r" FROM n ORDER BY doc_id").df()
        assert list(got.exact_cid) == list(want.exact_cid)
        assert list(got.norm_cid) == list(want.norm_cid)
        # the rows normalization catches that byte-exact dedup misses
        assert list(got.merged_by_norm) == [0, 1, 1, 0, 0, 1, 0, 1]

    def test_exact_cluster_sizes_hot_group_spans_blocks(self):
        """A 600-copy template split over many blocks must see 600 on
        every row, matching count(*) OVER (PARTITION BY text)."""
        import ray.data as rd

        from smqtk_indexing_ray.pipelines.analysis import exact_cluster_sizes

        rng = np.random.default_rng(47)
        texts = ["hot template page"] * 600 + [
            f"unique page {i}" for i in range(400)]
        order = rng.permutation(1000)
        t = pa.table({
            "doc_id": pa.array(np.arange(1000, dtype=np.int64)),
            "text": pa.array([texts[i] for i in order]),
        })
        got = exact_cluster_sizes(
            rd.from_arrow(t).repartition(11), num_partitions=7).to_pandas()
        exp = t.to_pandas()
        exp["cluster_size"] = exp.groupby("text")["text"].transform("size")
        merged = got.merge(exp[["doc_id", "cluster_size"]], on="doc_id",
                           suffixes=("", "_exp"))
        assert len(merged) == 1000
        assert (merged.cluster_size == merged.cluster_size_exp).all()

    def test_token_stats(self):
        from smqtk_indexing_ray.pipelines.analysis import token_stats
        df = token_stats(_docs()).to_pandas().set_index("doc_id")
        assert df.loc[0, "n_tokens"] == 6
        assert df.loc[4, "n_tokens"] == 4
        assert df.loc[4, "n_uniq_tokens"] == 2
        assert df.loc[4, "stop_ratio"] == 1.0
        assert df.loc[0, "stop_ratio"] == 1.0 / 6.0
        assert df.loc[0, "chars_per_token"] == 11.0 / 6.0

    def test_lang_summary(self):
        from smqtk_indexing_ray.pipelines.analysis import lang_summary
        df = lang_summary(_docs()).to_pandas().set_index("lang")
        assert df.loc["en", "n_docs"] == 3
        assert df.loc["de", "n_docs"] == 2
        assert df.loc["en", "total_chars"] == 11 + 11 + 11
        assert df.loc["en", "avg_chars"] == 11.0

    def test_ngram_jaccard_pairs(self):
        from smqtk_indexing_ray.pipelines.analysis import ngram_jaccard_pairs
        df = ngram_jaccard_pairs(_docs(), k=3, threshold=0.4).to_pandas()
        pairs = {(a, b): j for a, b, j in
                 zip(df.doc_a, df.doc_b, df.jaccard)}
        assert pairs[(0, 1)] == 1.0
        # docs 0 and 2: trigram sets {abc,bcd,cde,def} vs {abc,bcd,cde,deg}
        assert pairs[(0, 2)] == pytest.approx(3 / 5)
        assert (3, 4) not in pairs and (0, 3) not in pairs

    def test_ngram_stop_shingle_cap(self):
        """Hot-shingle skew: shingles over the DF cap leave the JOIN but
        stay in the per-doc set sizes, so hot-only pairs vanish while
        genuine near-dups keep their exact jaccard."""
        import ray.data as rd
        from smqtk_indexing_ray.pipelines.analysis import ngram_jaccard_pairs
        n_boiler = 20
        texts = [f"c1 c2 c3 c4 u{i}" for i in range(n_boiler)]
        ids = list(range(n_boiler))
        # a clean near-dup pair sharing no hot shingle
        texts += ["x1 x2 x3 x4 x5", "x1 x2 x3 x4 x5"]
        ids += [100, 101]
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts)}))
        # uncapped: every boiler pair shares {c1c2c3, c2c3c4} -> j = 2/4
        full = ngram_jaccard_pairs(docs, k=3, threshold=0.5,
                                   max_shingle_freq=None).to_pandas()
        fp = set(zip(full.doc_a, full.doc_b))
        assert (0, 1) in fp and (100, 101) in fp
        assert len(fp) == n_boiler * (n_boiler - 1) // 2 + 1
        # capped below the boiler DF: hot-only pairs gone, per-shingle
        # join input bounded at the cap; the clean pair is untouched
        capped = ngram_jaccard_pairs(docs, k=3, threshold=0.5,
                                     max_shingle_freq=10).to_pandas()
        cp = {(a, b): j for a, b, j in
              zip(capped.doc_a, capped.doc_b, capped.jaccard)}
        assert set(cp) == {(100, 101)}
        assert cp[(100, 101)] == 1.0  # denominator still the FULL set size

    def test_jaccard_cluster_labels(self):
        from smqtk_indexing_ray.pipelines.analysis import (
            jaccard_cluster_labels)
        df = jaccard_cluster_labels(_docs(), k=3, threshold=0.4).to_pandas()
        lab = dict(zip(df.doc_id, df.cluster_id))
        assert lab == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4}

    def test_simhash_near_pairs_finds_exact_dup(self):
        from smqtk_indexing_ray.pipelines.analysis import simhash_near_pairs
        df = simhash_near_pairs(_docs(), max_hamming=3).to_pandas()
        assert (0, 1, 0) in set(zip(df.doc_a, df.doc_b, df.hamming))

    def test_doc_fingerprints_deterministic(self):
        from smqtk_indexing_ray.pipelines.analysis import doc_fingerprints
        a = doc_fingerprints(_docs()).to_pandas().sort_values(
            "doc_id", ignore_index=True)
        b = doc_fingerprints(_docs()).to_pandas().sort_values(
            "doc_id", ignore_index=True)
        assert a.equals(b)
        assert a.fingerprint[0] == a.fingerprint[1]   # exact dup
        assert a.fingerprint[0] != a.fingerprint[2]

    def test_lang_id_shape(self):
        from smqtk_indexing_ray.pipelines.analysis import lang_id
        df = lang_id(_docs()).to_pandas()
        assert len(df) == 5
        assert set(df.columns) == {"doc_id", "pred_lang", "confidence"}
        assert df.set_index("doc_id").loc[4, "pred_lang"] == "en"


@pytest.mark.usefixtures("ray_session")
class TestAnn:
    def test_hamming_topk_128bit_matches_bruteforce(self):
        """Wide-code path: 128-bit SRP codes, exact top-k vs a driver-side
        brute-force oracle with the same (seed, dim, bits) projection."""
        from smqtk_indexing_ray.functions.hashing import pack_bits_rows
        from smqtk_indexing_ray.functions.metrics import hamming_bytes
        from smqtk_indexing_ray.pipelines.ann import hamming_topk
        emb = _emb(n=60, d=8)
        n_q, k, bits, seed = 4, 5, 128, 42
        df = hamming_topk(emb, n_queries=n_q, k=k, seed=seed,
                          bits=bits).to_pandas()
        # oracle: regenerate the hyperplanes exactly as srp_codes does
        tbl = pa.concat_tables(list(
            emb.iter_batches(batch_format="pyarrow")))
        ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
        m = np.stack([np.asarray(v, np.float64)
                      for v in tbl["embedding"].to_pylist()])
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        rng = np.random.default_rng([seed, m.shape[1]])
        R = rng.standard_normal((m.shape[1], bits))
        codes = pack_bits_rows(m @ R >= 0)
        got = df.set_index(["query_id", "rank"])
        for qi in range(n_q):
            h = hamming_bytes(codes[qi][None, :], codes)
            h[qi] = bits + 1
            top = np.lexsort((ids, h))[:k]
            for r, j in enumerate(top, start=1):
                assert got.loc[(qi, r), "neighbor_id"] == ids[j]
                assert got.loc[(qi, r), "hamming"] == h[j]
                assert got.loc[(qi, r), "norm_hamming"] == h[j] / bits

    def test_cosine_near_pairs_row_cap_fires(self):
        from smqtk_indexing_ray.pipelines.ann import cosine_near_pairs
        with pytest.raises(ValueError, match="srp_near_pairs"):
            cosine_near_pairs(_emb(), max_rows=10)

    def test_brute_force_topk_matches_numpy(self):
        from smqtk_indexing_ray.pipelines.ann import brute_force_topk
        emb = _emb()
        df = brute_force_topk(emb, n_queries=4, k=5).to_pandas()
        # oracle: dense numpy
        t = pa.concat_tables(
            [b for b in emb.iter_batches(batch_format="pyarrow")])
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m[:4] @ m.T
        for q in range(4):
            s = sims[q].copy()
            s[q] = -np.inf
            want = np.lexsort((np.arange(len(s)), -s))[:5]
            got = df[df.query_id == q].sort_values("rank").neighbor_id
            np.testing.assert_array_equal(got, want)

    def test_near_pair_found(self):
        from smqtk_indexing_ray.pipelines.ann import cosine_near_pairs
        df = cosine_near_pairs(_emb(), threshold=0.95).to_pandas()
        assert (0, 1) in set(zip(df.vec_a, df.vec_b))

    def test_hamming_topk_contract(self):
        from smqtk_indexing_ray.pipelines.ann import hamming_topk
        df = hamming_topk(_emb(), n_queries=3, k=4).to_pandas()
        assert set(df.query_id) == {0, 1, 2}
        g = df[df.query_id == 0].sort_values("rank")
        assert list(g.hamming) == sorted(g.hamming)      # ascending distance
        assert (g.norm_hamming == g.hamming / 64.0).all()
        assert g.iloc[0].neighbor_id == 1                # the planted near-dup
        # excludes self
        assert not ((df.query_id == df.neighbor_id).any())

    def test_srp_near_pairs(self):
        from smqtk_indexing_ray.pipelines.ann import srp_near_pairs
        df = srp_near_pairs(_emb(), max_hamming=8).to_pandas()
        assert (0, 1) in set(zip(df.vec_a, df.vec_b))


@pytest.mark.usefixtures("ray_session")
class TestQualityAndWinnowing:
    def test_quality_signals(self):
        import ray.data as rd
        from smqtk_indexing_ray.pipelines.analysis import quality_signals
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([
                " ".join(["word"] * 60),          # passes all bounds
                "aa bb cc",                        # too few tokens
            ]),
        }))
        df = quality_signals(docs).to_pandas().set_index("doc_id")
        assert bool(df.loc[0, "passes_quality"])
        assert not bool(df.loc[1, "passes_quality"])
        assert df.loc[0, "mean_word_len"] == 4.0
        assert df.loc[1, "frac_short_words"] == 1.0

    def test_winnowing_guarantee(self):
        """Docs sharing a long substring must share >=1 fingerprint in it;
        every window of the stream is covered by a selection."""
        import ray.data as rd
        from smqtk_indexing_ray.pipelines.analysis import winnow_fingerprints
        shared = "the quick brown fox jumps over the lazy dog again and again"
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([
                "prefix words here " + shared,
                shared + " completely different suffix material",
                "no overlap with anything else at all whatsoever okay",
            ]),
        }))
        df = winnow_fingerprints(docs, k=5, window=4).to_pandas()
        f0 = set(df[df.doc_id == 0].fingerprint)
        f1 = set(df[df.doc_id == 1].fingerprint)
        f2 = set(df[df.doc_id == 2].fingerprint)
        assert f0 & f1                      # shared substring detected
        assert not (f0 & f2) and not (f1 & f2)
        # deterministic across runs
        df2 = winnow_fingerprints(docs, k=5, window=4).to_pandas()
        assert df.sort_values(["doc_id", "pos"], ignore_index=True).equals(
            df2.sort_values(["doc_id", "pos"], ignore_index=True))


class TestBandedHammingPairs:
    """Join-free banded pair enumeration (stages/hampairs.py): brute-force
    equality, global pair uniqueness, and the degenerate hot-chunk case
    the r1 self-join version was quadratic on (VERDICT r1 #4)."""

    def _brute(self, ids, codes, max_hamming):
        import numpy as np
        from smqtk_indexing_ray.functions.metrics import popcount_u64
        out = set()
        c = np.asarray(codes, dtype=np.uint64)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                x = np.uint64(c[i] ^ c[j])
                shares = any(((int(x) >> (16 * b)) & 0xFFFF) == 0
                             for b in range(4))
                h = int(popcount_u64(np.array([x]))[0])
                if shares and h <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    out.add((a, b, h))
        return out

    def test_matches_bruteforce_random(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from smqtk_indexing_ray.stages.hampairs import banded_hamming_pairs
        rng = np.random.default_rng(5)
        base = rng.integers(0, 2**63, size=40, dtype=np.int64)
        # plant near-dups: flip 1-6 bits off some bases
        codes = list(base)
        ids = list(range(40))
        for i in range(12):
            c = int(base[i])
            for b in rng.choice(64, size=int(rng.integers(1, 7)),
                                replace=False):
                c ^= 1 << int(b)
            codes.append(np.int64(np.uint64(c).astype(np.uint64).view(np.int64)))
            ids.append(100 + i)
        t = pa.table({"vid": pa.array(ids, pa.int64()),
                      "code": pa.array([int(np.uint64(c).view(np.int64))
                                        if isinstance(c, np.uint64) else int(c)
                                        for c in codes], pa.int64())})
        got = banded_hamming_pairs(
            rd.from_arrow(t).repartition(4), id_col="vid", code_col="code",
            max_hamming=8, out_a="a", out_b="b").to_pandas()
        got_set = set(map(tuple, got[["a", "b", "hamming"]].values))
        assert len(got) == len(got_set), "duplicate pair emitted"
        want = self._brute(ids, [np.uint64(c).astype(np.uint64)
                                 for c in t["code"].to_numpy()], 8)
        assert got_set == want

    def test_hot_chunk_clique(self):
        """1000 identical codes (degenerate boilerplate cloud): output is
        the full clique, emitted once each, and the plan contains no
        join."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from smqtk_indexing_ray.stages.hampairs import banded_hamming_pairs
        n = 1000
        t = pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                      "code": pa.array(np.full(n, 12345, dtype=np.int64))})
        ds = banded_hamming_pairs(
            rd.from_arrow(t).repartition(8), id_col="vid", code_col="code",
            max_hamming=3)
        df = ds.to_pandas()
        assert len(df) == n * (n - 1) // 2
        assert df.duplicated(["a", "b"]).sum() == 0
        assert (df["hamming"] == 0).all()
        assert (df["a"] < df["b"]).all()

    def test_pair_cap(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from smqtk_indexing_ray.stages.hampairs import banded_hamming_pairs
        n = 100
        t = pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                      "code": pa.array(np.full(n, 7, dtype=np.int64))})
        df = banded_hamming_pairs(
            rd.from_arrow(t), id_col="vid", code_col="code",
            max_hamming=3, max_pairs_per_bucket=50).to_pandas()
        assert len(df) == 50


@pytest.mark.usefixtures("ray_session")
def test_token_counts_matches_duckdb():
    """Arrow count_substring_regex and DuckDB regexp_extract_all run the
    same RE2 pattern — counts must be engine-identical (the oracle
    contract for the token_counts query)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import (
        BPE_PRETOKEN_RE, token_counts)
    texts = ["hello world", "  leading", "a1b2 c3!", "", None,
             "tab\tsep\nlines", "üñïçødé mix 42", "word's don't"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = token_counts(docs).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    con = duckdb.connect()
    for i, t in enumerate(texts):
        r = con.execute(
            r"SELECT len(regexp_extract_all(coalesce(?, ''), '\S+')), "
            "len(regexp_extract_all(coalesce(?, ''), ?))",
            [t, t, BPE_PRETOKEN_RE]).fetchone()
        assert got.loc[i, "n_ws_tokens"] == r[0]
        assert got.loc[i, "n_bpe_tokens"] == r[1]


@pytest.mark.usefixtures("ray_session")
def test_sentence_stats_matches_duckdb():
    """Punctuation-rich behavioral check for the C4 sentence gates (the
    sf fixture text has no punctuation, so the driver oracle there is
    structural-only) — parity with the exact oracle SQL shape."""
    import duckdb
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import sentence_stats
    texts = [
        "First line.\nSecond line!\nThird line?",      # 3 sent, all terminal
        "no punctuation single line",                   # 0 sentences
        "Ends mid\nway. But fine!",                     # mixed lines
        "Lorem Ipsum dolor. Sit amet. Consectetur.",    # lorem gate
        "has {curly}. Braces. Everywhere.",             # curly gate
        "",                                             # empty text
        "Trailing space after dot. \nNext line.",       # space kills $ match
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = sentence_stats(docs).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert bool(got.loc[0, "passes_c4"])
    assert got.loc[0, "frac_terminal_lines"] == 1.0
    assert got.loc[1, "n_sentences"] == 0 and not bool(
        got.loc[1, "passes_c4"])
    assert not bool(got.loc[3, "passes_c4"])  # lorem ipsum
    assert not bool(got.loc[4, "passes_c4"])  # curly brace
    assert got.loc[5, "n_lines"] == 1 and got.loc[5, "n_terminal_lines"] == 0
    assert got.loc[6, "n_terminal_lines"] == 1  # only the 2nd line
    con = duckdb.connect()
    for i, t in enumerate(texts):
        r = con.execute(
            "SELECT len(regexp_extract_all(coalesce(?, ''), '[.!?]')),"
            " length(coalesce(?, ''))"
            "  - length(replace(coalesce(?, ''), chr(10), '')) + 1,"
            " len(list_filter(str_split(coalesce(?, ''), chr(10)),"
            "   x -> regexp_matches(x, '[.!?]$')))",
            [t, t, t, t]).fetchone()
        assert got.loc[i, "n_sentences"] == r[0]
        assert got.loc[i, "n_lines"] == r[1]
        assert got.loc[i, "n_terminal_lines"] == r[2]


@pytest.mark.usefixtures("ray_session")
def test_doc_fingerprint_order_sensitive():
    """Token reordering must change the fingerprint (the position-mixed
    XOR keeps the rolling fold's order sensitivity in one vectorized
    pass) while leaving the order-insensitive SimHash unchanged."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import doc_fingerprints
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["alpha beta gamma delta",
                          "delta gamma beta alpha"]),
    }))
    df = doc_fingerprints(docs).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert df.fingerprint[0] != df.fingerprint[1]
    assert df.simhash[0] == df.simhash[1]


class TestBucketPairsFuzz:
    """Property fuzz of the per-bucket pair kernel (pure, no Ray): the
    distinct-code + first-agreeing-chunk emission must equal brute force
    over the bucket for any code multiset."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.integers(min_value=0, max_value=2**20),
                    min_size=0, max_size=30),
           st.integers(min_value=0, max_value=2**16 - 1))
    @settings(max_examples=50, deadline=None)
    def test_bucket_kernel_matches_brute(self, lows, chunk):
        import numpy as np
        import pyarrow as pa
        from smqtk_indexing_ray.functions.metrics import popcount_u64
        from smqtk_indexing_ray.stages.hampairs import (
            _BucketPairs, _first_agreeing_band)
        # band 0 bucket: all codes share low 16 bits == chunk; the upper
        # bits vary (lows perturb bits 16..36)
        codes = np.array([(int(x) << 16) | chunk for x in lows],
                         dtype=np.uint64)
        ids = np.arange(len(codes), dtype=np.int64)
        band_key = (np.int64(chunk) << 3) | 0
        t = pa.table({"band_key": pa.array(
            np.full(len(ids), band_key, dtype=np.int64)),
            "vid": pa.array(ids),
            "code": pa.array(codes.view(np.int64))})
        out = _BucketPairs("vid", "code", 6, None)(t)
        got = set(zip(out["a"].to_pylist(), out["b"].to_pylist(),
                      out["hamming"].to_pylist()))
        want = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                x = np.uint64(codes[i] ^ codes[j])
                h = int(popcount_u64(np.array([x]))[0])
                first = int(_first_agreeing_band(np.array([x]))[0])
                if h <= 6 and first == 0:
                    want.add((i, j, h))
        assert got == want


@pytest.mark.usefixtures("ray_session")
def test_column_quantiles_matches_duckdb():
    """Metadata-indexed point reads must reproduce DuckDB quantile_disc
    exactly across block layouts."""
    import duckdb
    import ray.data as rd
    from smqtk_indexing_ray.stages.quantiles import column_quantiles
    rng = np.random.default_rng(31)
    vals = rng.integers(0, 10_000, 5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)})).repartition(9)
    qs = [0.0, 0.01, 0.1, 0.33, 0.5, 0.9, 0.999, 1.0]
    got = column_quantiles(ds, "x", qs).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS x",
                [[int(v) for v in vals]])
    for q, v in zip(got.q, got.x):
        want = con.execute("SELECT quantile_disc(x, ?) FROM t",
                           [float(q)]).fetchone()[0]
        assert int(v) == int(want), (q, v, want)


@pytest.mark.usefixtures("ray_session")
def test_top_k_per_group_matches_pandas():
    """Per-block rank with boundary carries vs a pandas groupby rank,
    across enough blocks that groups straddle boundaries (incl. one hot
    group spanning several blocks)."""
    import ray.data as rd
    from smqtk_indexing_ray.stages.topk import top_k_per_group
    rng = np.random.default_rng(41)
    n = 3000
    g = rng.integers(0, 6, n)
    g[:1500] = 2                      # hot group straddles blocks
    t = pa.table({"grp": pa.array(g.astype(np.int64)),
                  "score": pa.array(rng.integers(0, 500, n).astype(np.int64)),
                  "rid": pa.array(np.arange(n, dtype=np.int64))})
    got = top_k_per_group(
        rd.from_arrow(t).repartition(11), group="grp", order="score",
        tiebreak="rid", k=7, schema=t.schema,
    ).to_pandas().sort_values(["grp", "rank"], ignore_index=True)
    df = t.to_pandas().sort_values(
        ["grp", "score", "rid"], ascending=[True, False, True])
    df["rank"] = df.groupby("grp").cumcount() + 1
    want = df[df["rank"] <= 7].sort_values(["grp", "rank"],
                                           ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_group_quantiles_matches_duckdb():
    """Per-group run-length stitching + point reads vs DuckDB
    quantile_disc GROUP BY, with skewed group sizes so one hot group
    spans several blocks and tiny groups sit inside one."""
    import duckdb
    import ray.data as rd
    from smqtk_indexing_ray.stages.quantiles import group_quantiles
    rng = np.random.default_rng(53)
    n = 4000
    g = rng.integers(0, 8, n)
    g[:2200] = 3                      # hot group straddles blocks
    vals = rng.integers(0, 1000, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "grp": pa.array(g.astype(np.int64)), "x": pa.array(vals),
    })).repartition(13)
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = group_quantiles(ds, group="grp", col="x", qs=qs).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS grp, "
                "unnest(?) AS x",
                [[int(v) for v in g], [int(v) for v in vals]])
    want = con.execute(
        "WITH a AS (SELECT grp, quantile_disc(x, ?) AS v FROM t"
        " GROUP BY grp) SELECT grp, unnest(v) AS x FROM a"
        " ORDER BY grp", [qs]).df()
    got = got.sort_values(["grp", "q"], ignore_index=True)
    assert list(got.grp) == list(want.grp)
    assert list(got.x) == list(want.x)


@pytest.mark.usefixtures("ray_session")
def test_ntile_per_group_matches_duckdb():
    """NTILE bucket rule (first n%nb buckets one row larger) vs the
    DuckDB window function, including groups smaller than nb."""
    import duckdb
    import ray.data as rd
    from smqtk_indexing_ray.stages.topk import ntile_per_group
    rng = np.random.default_rng(59)
    n = 2000
    g = rng.integers(0, 7, n)
    g[:5] = 99                        # a 5-row group with nb=4
    sc = rng.integers(0, 300, n).astype(np.int64)
    t = pa.table({"grp": pa.array(g.astype(np.int64)),
                  "score": pa.array(sc),
                  "rid": pa.array(np.arange(n, dtype=np.int64))})
    got = ntile_per_group(
        rd.from_arrow(t).repartition(9), group="grp", order="score",
        tiebreak="rid", nb=4, schema=t.schema,
    ).to_pandas().sort_values("rid", ignore_index=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT rid, ntile(4) OVER (PARTITION BY grp"
        " ORDER BY score DESC, rid) AS bucket FROM t ORDER BY rid"
    ).df()
    assert list(got.bucket) == list(want.bucket)


@pytest.mark.usefixtures("ray_session")
def test_robust_outliers_matches_duckdb():
    """Median/MAD flags vs a two-pass DuckDB quantile_disc oracle,
    with planted extreme rows and a group whose MAD is zero (constant
    values -> every deviating row is an outlier)."""
    import duckdb
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import robust_outliers
    rng = np.random.default_rng(67)
    n = 1500
    g = rng.integers(0, 4, n)
    x = rng.integers(90, 110, n).astype(np.int64)
    x[g == 2] = 100                      # constant group: MAD == 0
    x[:8] = 100_000                      # planted extremes
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "lang": pa.array([f"g{v}" for v in g]),
                  "n_chars": pa.array(x)})
    got = robust_outliers(
        rd.from_arrow(t).repartition(7), group="lang", col="n_chars",
        keep=["doc_id"], c=3).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute(
        "WITH m AS (SELECT lang, quantile_disc(n_chars, 0.5) AS med"
        " FROM documents GROUP BY lang),"
        " d AS (SELECT doc_id, documents.lang AS lang, n_chars, med,"
        " abs(n_chars - med) AS dev FROM documents"
        " JOIN m ON documents.lang = m.lang),"
        " md AS (SELECT lang, quantile_disc(dev, 0.5) AS mad"
        " FROM d GROUP BY lang) "
        "SELECT doc_id, med, mad,"
        " CAST(dev > 3 * mad AS BIGINT) AS outlier"
        " FROM d JOIN md ON d.lang = md.lang ORDER BY doc_id").df()
    assert list(got.med) == list(want.med)
    assert list(got.mad) == list(want.mad)
    assert list(got.outlier) == list(want.outlier)
    assert got.outlier.sum() >= 8        # extremes flagged


def _rand_emb_table(n: int, d: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(m.tolist(), pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 4).astype(np.int32)),
    })


@pytest.mark.usefixtures("ray_session")
def test_semantic_contamination_matches_bruteforce():
    """Cross-split top-k vs a numpy full-matrix oracle: every eval
    (odd) vector's nearest train (even) vectors, ranks included."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.ann import semantic_contamination
    t = _rand_emb_table(120, 16, 71)
    got = semantic_contamination(
        rd.from_arrow(t).repartition(5), k=2).to_pandas().sort_values(
        ["eval_vec", "rank"], ignore_index=True)
    m = np.array(t["embedding"].to_pylist(), np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    odd = np.arange(120) % 2 == 1
    sims = m[odd] @ m[~odd].T
    eids = np.flatnonzero(odd)
    tids = np.flatnonzero(~odd)
    rows = []
    for i, e in enumerate(eids):
        order = np.lexsort((tids, -sims[i]))[:2]
        rows += [(e, tids[j], r + 1) for r, j in enumerate(order)]
    want = sorted(rows)
    assert sorted(map(tuple, got[["eval_vec", "train_vec",
                                  "rank"]].to_numpy())) == want


@pytest.mark.usefixtures("ray_session")
def test_knn_classify_matches_bruteforce():
    """Majority-vote k-NN vs a direct numpy reference with the same
    tie rules (similarity ties -> low train vec_id, vote ties -> low
    label), across multiple blocks."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.ann import knn_classify

    t = _rand_emb_table(240, 12, 91)
    k = 5
    got = knn_classify(
        rd.from_arrow(t).repartition(6), k=k).to_pandas().sort_values(
        "vec_id", ignore_index=True)

    m = np.array(t["embedding"].to_pylist(), np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    even = ids % 2 == 0
    tids, tlab, tm = ids[even], lab[even], m[even]
    qids, qlab, qm = ids[~even], lab[~even], m[~even]
    sims = qm @ tm.T
    want = {}
    for i, q in enumerate(qids):
        order = np.lexsort((tids, -sims[i]))[:k]
        votes = np.bincount(tlab[order], minlength=int(lab.max()) + 1)
        want[int(q)] = int(np.argmax(votes))
    assert len(got) == len(qids)
    for q, pred, true in zip(got.vec_id, got.pred_label,
                             got.true_label):
        assert pred == want[int(q)], q
        assert true == qlab[list(qids).index(q)]
    assert (got.correct == (got.pred_label == got.true_label)
            .astype(np.int64)).all()


@pytest.mark.usefixtures("ray_session")
def test_label_centroids_matches_numpy():
    """Combiner-shaped partial sums vs a direct per-label mean."""
    import ray.data as rd
    from smqtk_indexing_ray.functions.metrics import round6
    from smqtk_indexing_ray.pipelines.ann import label_centroids
    t = _rand_emb_table(200, 8, 73)
    got = label_centroids(
        rd.from_arrow(t).repartition(7)).to_pandas().sort_values(
        ["label", "dim"], ignore_index=True)
    m = np.array(t["embedding"].to_pylist(), np.float64)
    lab = np.asarray(t["label"].to_pylist())
    assert len(got) == 4 * 8
    for lb in range(4):
        mine = got[got.label == lb]
        assert (mine.n_vecs == (lab == lb).sum()).all()
        want = round6(m[lab == lb].mean(axis=0))
        np.testing.assert_allclose(mine.centroid.to_numpy(), want,
                                   atol=2e-6)


@pytest.mark.usefixtures("ray_session")
def test_dedup_tier_summary_all_tiers():
    """Planted exact copies, near-duplicates, and uniques must land in
    their respective tiers with first-tier-wins attribution."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import dedup_tier_summary

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu")
    rows = []
    # 3 exact copies of doc 0 -> tier exact; doc 0 itself is the rep
    for i in range(4):
        rows.append((i, base))
    # 2 near-dups of base (one token changed) -> tier near
    rows.append((4, base.replace("mu", "nu")))
    rows.append((5, base.replace("alpha", "omega")))
    # uniques
    for i in range(6, 12):
        rows.append((i, f"totally different text number {i} "
                        f"with its own words {i * 7} {i * 11}"))
    # case/whitespace-only variants of doc 0 -> tier norm
    # (survive byte-exact, caught by the normalized form)
    rows.append((12, base.upper()))
    rows.append((13, "  " + base.replace(" ", "   ") + " "))
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows])})
    got = dedup_tier_summary(
        rd.from_arrow(t).repartition(4)).to_pandas()
    tiers = dict(zip(got.tier, got.n_docs))
    # doc 0 is rep (unique side of exact), 1-3 exact copies,
    # 12-13 norm-only, 4-5 near, 6-11 unique -> unique = 1 + 6
    assert tiers == {"exact": 3, "norm": 2, "near": 2, "unique": 7}


@pytest.mark.usefixtures("ray_session")
def test_curation_report_all_reasons():
    """Planted docs must hit every gate with first-match attribution:
    lang beats quality beats exact beats near beats kept."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import curation_report

    body = " ".join(f"tok{i % 37}xx" for i in range(80))  # passes rules
    rows = [
        (0, body, "en"),                 # kept (rep of exact group)
        (1, body, "en"),                 # exact_dup
        (2, body.replace("tok1xx", "tok999xx", 1), "en"),  # near_dup
        (3, body, "fr"),                 # lang (even though exact dup)
        (4, "short text", "en"),         # quality (too few tokens)
        (5, " ".join(f"u{i}word" for i in range(90)), "en"),  # kept
        (6, body.upper() + " ", "en"),   # norm_dup (case/ws variant
                                         # of 0, survives byte-exact)
    ]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows]),
                  "lang": pa.array([r[2] for r in rows])})
    got = curation_report(
        rd.from_arrow(t).repartition(3)).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert list(got.reason) == ["kept", "exact_dup", "near_dup",
                                "lang", "quality", "kept", "norm_dup"]


@pytest.mark.usefixtures("ray_session")
def test_trimmed_mean_matches_duckdb():
    """Quantile-cut broadcast + combiner aggregation vs the SQL oracle,
    with planted extremes that the trim must exclude."""
    import duckdb
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import trimmed_mean
    rng = np.random.default_rng(89)
    n = 1200
    g = rng.integers(0, 3, n)
    x = rng.integers(50, 150, n).astype(np.int64)
    x[:6] = 10_000_000                  # extremes to trim
    t = pa.table({"lang": pa.array([f"g{v}" for v in g]),
                  "n_chars": pa.array(x)})
    got = trimmed_mean(
        rd.from_arrow(t).repartition(7), group="lang", col="n_chars",
        lo=0.05, hi=0.95).to_pandas().sort_values(
        "lang", ignore_index=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute(
        "WITH q AS (SELECT lang, quantile_disc(n_chars, 0.05) AS lo,"
        " quantile_disc(n_chars, 0.95) AS hi FROM documents"
        " GROUP BY lang) "
        "SELECT d.lang AS lang, count(*) AS n_kept,"
        " CAST(sum(n_chars) AS BIGINT) AS total,"
        " CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean"
        " FROM documents d JOIN q ON d.lang = q.lang"
        " WHERE n_chars BETWEEN lo AND hi GROUP BY d.lang"
        " ORDER BY lang").df()
    assert list(got.lang) == list(want.lang)
    assert list(got.n_kept) == list(want.n_kept)
    assert list(got.total) == list(want.total)
    assert list(got["mean"]) == list(want["mean"])
    assert got["mean"].max() < 1000     # extremes actually trimmed


@pytest.mark.usefixtures("ray_session")
def test_stop_shingles_enforce_full_corpus_df_on_subsets():
    """A shingle hot in the FULL corpus but rare in a subset must stay
    banned when the subset scan gets the full-corpus hot set —
    otherwise a prefiltered pass would emit pairs the full scan (and
    its oracle) suppress."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import (
        hot_shingles, ngram_jaccard_pairs)

    boiler = "common boiler plate phrase"
    n_hot = 40
    rows = [(i, f"{boiler} unique tail {i} {i * 3} {i * 7}")
            for i in range(n_hot)]
    full = pa.table({"doc_id": pa.array([r[0] for r in rows],
                                        pa.int64()),
                     "text": pa.array([r[1] for r in rows])})
    # subset: just docs 0 and 1 — the boiler shingles have subset DF 2
    sub = full.slice(0, 2)
    stop_ref = hot_shingles(rd.from_arrow(full), k=3, max_df=10)
    # without the full-corpus set, the subset scan would pair 0 and 1
    # via boiler shingles (their only overlap)
    naive = ngram_jaccard_pairs(rd.from_arrow(sub), k=3, threshold=0.1,
                                max_shingle_freq=10).to_pandas()
    assert len(naive) == 1
    banned = ngram_jaccard_pairs(rd.from_arrow(sub), k=3,
                                 threshold=0.1, max_shingle_freq=10,
                                 stop_shingles_ref=stop_ref).to_pandas()
    assert len(banned) == 0


@pytest.mark.usefixtures("ray_session")
def test_bloom_no_false_negatives_and_low_fp():
    """Every inserted hash must test positive (losslessness of the
    prefilter rests on this); disjoint probes must mostly test
    negative at the designed fill rate."""
    import ray.data as rd
    from smqtk_indexing_ray.stages.bloom import bloom_test, build_bloom
    rng = np.random.default_rng(61)
    ins = rng.integers(0, 2**63, 20_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"h": pa.array(ins)})).repartition(7)
    m_bits = 1 << 18
    bloom = build_bloom(ds, hash_col="h", m_bits=m_bits, k=2)
    assert bloom_test(bloom, ins, m_bits=m_bits, k=2).all()
    probe = rng.integers(0, 2**63, 20_000).astype(np.int64)
    fresh = probe[~np.isin(probe, ins)]
    fp = bloom_test(bloom, fresh, m_bits=m_bits, k=2).mean()
    # n/m ~ 0.076, k=2 -> theoretical fp ~ (1-e^-0.153)^2 ~ 2%
    assert fp < 0.05, fp


@pytest.mark.usefixtures("ray_session")
def test_bloom_prefilter_lossless():
    """Docs sharing a shingle with the reference split must ALL
    survive the prefilter (no false negatives); unrelated docs mostly
    do not."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import bloom_prefilter
    ref_texts = [f"alpha beta gamma delta epsilon {i}" for i in range(40)]
    share = [f"alpha beta gamma shared {i}" for i in range(30)]
    other = [f"zeta eta theta iota kappa unique words {i} {i+1} {i+2}"
             for i in range(30)]
    ref = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64)),
                    "text": pa.array(ref_texts)})
    docs = pa.table({
        "doc_id": pa.array(np.arange(100, 160, dtype=np.int64)),
        "text": pa.array(share + other)})
    kept = bloom_prefilter(
        rd.from_arrow(docs).repartition(5), rd.from_arrow(ref),
        k=3).to_pandas()
    kept_ids = set(kept.doc_id)
    assert set(range(100, 130)) <= kept_ids      # sharers all survive
    assert len(kept_ids - set(range(100, 130))) <= 3  # few FPs pass


@pytest.mark.usefixtures("ray_session")
def test_source_dup_stats_exact():
    """Two-level distinct rollup vs a pandas groupby-nunique oracle,
    with dup groups straddling block boundaries."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import source_dup_stats
    rng = np.random.default_rng(7)
    n = 900
    src = rng.choice(["cc", "wiki", "books"], n)
    texts = [f"doc {i % 50} body" if s == "cc" else f"{s} doc {i}"
             for i, s in enumerate(src)]          # cc heavily duplicated
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "source": pa.array(src), "text": pa.array(texts)})
    got = source_dup_stats(rd.from_arrow(t).repartition(7)).to_pandas() \
        .sort_values("source", ignore_index=True)
    df = t.to_pandas()
    want = df.groupby("source").agg(
        n_docs=("text", "size"), n_unique=("text", "nunique")
    ).reset_index()
    want["dup_ratio"] = (want.n_docs - want.n_unique) / want.n_docs
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_length_histogram_exact():
    """Partial-agg bincount vs a pandas value_counts oracle; only
    populated buckets emitted."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import length_histogram
    rng = np.random.default_rng(11)
    texts = ["x" * int(k) for k in rng.integers(0, 950, 1200)]
    t = pa.table({"doc_id": pa.array(np.arange(1200, dtype=np.int64)),
                  "text": pa.array(texts)})
    got = length_histogram(rd.from_arrow(t).repartition(5),
                           bucket_chars=100).to_pandas() \
        .sort_values("bucket", ignore_index=True)
    want = (pd.Series([len(s) // 100 for s in texts])
            .value_counts().sort_index())
    assert list(got.bucket) == list(want.index)
    assert list(got.n_docs) == list(want.values)
    assert list(got.lo_chars) == [b * 100 for b in want.index]


@pytest.mark.usefixtures("ray_session")
def test_percent_rank_per_group_matches_pandas():
    """percent_rank + cume_dist over a hot group spanning blocks must
    match the exact (rank-1)/(n-1) and rank/n window definitions."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.topk import percent_rank_per_group

    rng = np.random.default_rng(59)
    n = 2500
    g = rng.integers(0, 30, n)
    g[:1200] = 3                         # hot group spans blocks
    t = pa.table({
        "g": pa.array(g.astype(np.int64)),
        "o": pa.array(rng.permutation(n).astype(np.int64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
    })
    got = percent_rank_per_group(
        rd.from_arrow(t).repartition(10), group="g", order="o",
        tiebreak="id").to_pandas().sort_values("id", ignore_index=True)
    df = t.to_pandas()
    df["rank"] = df.sort_values(["o", "id"]).groupby("g").cumcount() + 1
    sz = df.groupby("g")["g"].transform("size")
    df["pct_rank"] = np.where(sz > 1, (df["rank"] - 1) / np.maximum(
        sz - 1, 1), 0.0)
    df["cume_dist"] = df["rank"] / sz
    df = df.sort_values("id", ignore_index=True)
    assert list(got["rank"]) == list(df["rank"])
    assert np.array_equal(got.pct_rank.to_numpy(), df.pct_rank.to_numpy())
    assert np.array_equal(got.cume_dist.to_numpy(),
                          df.cume_dist.to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_percent_rank_singleton_groups_are_zero():
    import ray.data as rd

    from smqtk_indexing_ray.stages.topk import percent_rank_per_group

    t = pa.table({"g": pa.array(["a", "b", "c"]),
                  "o": pa.array([5, 1, 9], pa.int64()),
                  "id": pa.array([0, 1, 2], pa.int64())})
    got = percent_rank_per_group(
        rd.from_arrow(t), group="g", order="o",
        tiebreak="id").to_pandas()
    assert (got.pct_rank == 0.0).all()
    assert (got.cume_dist == 1.0).all()


@pytest.mark.usefixtures("ray_session")
def test_corpus_diff_statuses_exact():
    """Added/removed/changed/unchanged vs a pandas outer-merge oracle,
    with doc groups straddling block boundaries on both sides."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import corpus_diff
    n = 300
    ids = np.arange(n, dtype=np.int64)
    old_t = pa.table({"doc_id": pa.array(ids),
                      "text": pa.array([f"doc {i} body" for i in ids])})
    # drop %7, mutate %5, add 40 brand-new ids
    keep = ids[ids % 7 != 0]
    new_txt = [f"doc {i} body v2" if i % 5 == 0 else f"doc {i} body"
               for i in keep]
    new_ids = np.concatenate([keep, np.arange(n, n + 40, dtype=np.int64)])
    new_t = pa.table({
        "doc_id": pa.array(new_ids),
        "text": pa.array(new_txt + [f"fresh {i}" for i in range(40)])})
    got = corpus_diff(rd.from_arrow(old_t).repartition(5),
                      rd.from_arrow(new_t).repartition(7),
                      num_partitions=4).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    o = old_t.to_pandas().rename(columns={"text": "t_old"})
    w = new_t.to_pandas().rename(columns={"text": "t_new"})
    m = o.merge(w, on="doc_id", how="outer").sort_values(
        "doc_id", ignore_index=True)
    want = np.where(
        m.t_old.isna(), "added", np.where(
            m.t_new.isna(), "removed", np.where(
                m.t_old != m.t_new, "changed", "unchanged")))
    assert list(got.doc_id) == list(m.doc_id)
    assert list(got.status) == list(want)
    assert (got.status == "added").sum() == 40
    assert (got.status == "removed").sum() == len(ids[ids % 7 == 0])


@pytest.mark.usefixtures("ray_session")
def test_corpus_diff_rejects_duplicate_ids():
    """A doc_id duplicated WITHIN one snapshot must raise, not
    mis-classify."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import corpus_diff
    t = pa.table({"doc_id": pa.array([1, 1, 2], pa.int64()),
                  "text": pa.array(["a", "b", "c"])})
    u = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a", "c"])})
    with pytest.raises(Exception, match="more than once"):
        corpus_diff(rd.from_arrow(t), rd.from_arrow(u),
                    num_partitions=2).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_dominant_source_per_lang_mode_and_ties():
    """Per-lang modal source vs brute force: a count tie must resolve
    to the ascending source name, groups straddle blocks."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import (
        dominant_source_per_lang)

    rows = (
        [("en", "sB")] * 3 + [("en", "sA")] * 3 +   # tie -> sA wins
        [("fr", "sZ")] * 2 + [("fr", "sA")] * 1 +
        [("de", "sQ")] * 1
    )
    t = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(["x"] * len(rows)),
        "lang": pa.array([r[0] for r in rows]),
        "source": pa.array([r[1] for r in rows]),
        "n_chars": pa.array([1] * len(rows), pa.int64()),
    })
    got = {r["lang"]: (r["source"], r["n_docs"]) for r in
           dominant_source_per_lang(
               rd.from_arrow(t).repartition(5)).take_all()}
    assert got == {"en": ("sA", 3), "fr": ("sZ", 2), "de": ("sQ", 1)}


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_sample_is_exact_bottomk():
    """The deterministic LCG sample must equal the brute-force bottom-k
    regardless of partitioning, and the quantile estimates must land
    within the sqrt(q(1-q)/k) rank band of the exact values."""
    import math

    import ray.data as rd

    from smqtk_indexing_ray.stages.quantiles import approx_quantiles

    rng = np.random.default_rng(53)
    n, k = 20_000, 500
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(0, 1_000_000, n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(vals)})
    qs = [0.1, 0.5, 0.9]

    outs = []
    for parts in (3, 17):
        got = approx_quantiles(
            rd.from_arrow(t).repartition(parts), col="n_chars",
            qs=qs, k=k).to_pandas().sort_values("q", ignore_index=True)
        outs.append(got)
    # partition-invariant (deterministic sample -> identical output)
    assert outs[0].equals(outs[1])

    # brute-force oracle: same LCG, same bottom-k, same disc rule
    draw = (ids * 1103515245 + 12345) % 2147483648
    order = np.lexsort((ids, draw))[:k]
    sample = np.sort(vals[order])
    for q, v in zip(outs[0].q, outs[0].n_chars):
        idx = min(k - 1, max(0, math.ceil(q * k) - 1))
        assert v == sample[idx]
    # rank-error band vs the exact quantiles (4-sigma, k=500)
    sv = np.sort(vals)
    for q, v in zip(outs[0].q, outs[0].n_chars):
        est_rank = np.searchsorted(sv, v) / n
        tol = 4.0 * math.sqrt(q * (1 - q) / k)
        assert abs(est_rank - q) <= tol, (q, est_rank, tol)


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_id_bound_raises():
    """Ids >= 2**33 would overflow the LCG product: loud refusal."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.quantiles import approx_quantiles

    t = pa.table({"doc_id": pa.array([1 << 33], pa.int64()),
                  "n_chars": pa.array([5], pa.int64())})
    with pytest.raises(Exception, match="2\\*\\*33"):
        approx_quantiles(rd.from_arrow(t), col="n_chars",
                         qs=[0.5], k=10).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_length_zscores_matches_duckdb():
    """Exact grouped standardization on adversarial groups: a
    zero-variance language (z=0 everywhere) and a two-doc group."""
    import duckdb
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import length_zscores
    t = pa.table({
        "doc_id": pa.array(range(7), pa.int64()),
        "lang": pa.array(["en", "en", "en", "de", "de", "zz", "zz"]),
        "n_chars": pa.array([10, 200, 30, 50, 90, 7, 7], pa.int64()),
    })
    got = length_zscores(
        rd.from_arrow(t).repartition(3)).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute("""
WITH st AS (SELECT coalesce(lang, '') AS lang, count(*) AS n,
  CAST(sum(CAST(n_chars AS HUGEINT)) AS DOUBLE) AS s,
  CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS DOUBLE) AS ss
  FROM documents GROUP BY 1)
SELECT d.doc_id, coalesce(d.lang, '') AS lang, d.n_chars,
  CASE WHEN (st.ss - st.s * st.s / st.n) / st.n > 0
  THEN round((CAST(d.n_chars AS DOUBLE) - st.s / st.n)
    / sqrt((st.ss - st.s * st.s / st.n) / st.n), 6)
  ELSE 0.0 END AS z_len
FROM documents d JOIN st ON st.lang = coalesce(d.lang, '')
ORDER BY d.doc_id""").df()
    import pandas as pd
    pd.testing.assert_frame_equal(got, exp)
    assert (got[got.lang == "zz"].z_len == 0.0).all()  # zero variance


@pytest.mark.usefixtures("ray_session")
def test_best_rep_per_cluster():
    """The longest original form wins per normalized cluster; ties go
    to the smallest doc_id; singletons keep themselves."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import best_rep_per_cluster
    texts = [
        "Hello   World",    # 13 chars, norm 'hello world'
        "hello world",      # 11 chars, same cluster
        "HELLO WORLD  ",    # 13 chars -> tie with doc 0, doc 0 wins
        "unique page",
    ]
    t = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    got = best_rep_per_cluster(
        rd.from_arrow(t).repartition(3)).to_pandas().set_index(
        "cluster_id")
    assert len(got) == 2
    assert got.loc[0, "rep_doc"] == 0 and got.loc[0, "rep_chars"] == 13
    assert got.loc[0, "n_copies"] == 3
    assert got.loc[3, "rep_doc"] == 3 and got.loc[3, "n_copies"] == 1


@pytest.mark.usefixtures("ray_session")
def test_compression_signals_matches_zlib():
    """Direct zlib recomputation oracle + the semantics: repetitive
    text flags low-entropy, natural-ish text does not, empty docs get
    ratio 0 and no flag; unicode counts utf-8 bytes."""
    import zlib

    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import compression_signals
    texts = [
        "spam spam spam spam " * 50,             # highly repetitive
        "the quick brown fox jumps over the lazy dog and then some",
        "",                                       # empty
        "üñïçødé ÿ " * 5,                        # multibyte utf-8
    ]
    got = compression_signals(rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))).to_pandas().sort_values("doc_id", ignore_index=True)
    for i, s in enumerate(texts):
        b = s.encode("utf-8")
        assert got.loc[i, "raw_bytes"] == len(b)
        assert got.loc[i, "zlib_bytes"] == len(zlib.compress(b, 6))
        if b:
            assert got.loc[i, "compression_ratio"] == (
                len(zlib.compress(b, 6)) / len(b))
    assert bool(got.loc[0, "is_low_entropy"])
    assert not bool(got.loc[1, "is_low_entropy"])
    assert got.loc[2, "compression_ratio"] == 0.0
    assert not bool(got.loc[2, "is_low_entropy"])


@pytest.mark.usefixtures("ray_session")
def test_cross_source_dups_null_source_counts_as_empty():
    """A null source merges with the '' source (fill_null convention,
    oracle coalesces the same way)."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import cross_source_dups
    t = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(["same text"] * 3),
        "source": pa.array([None, "", "web"], pa.string()),
    })
    df = cross_source_dups(rd.from_arrow(t)).to_pandas()
    assert len(df) == 1
    assert df.n_copies.iloc[0] == 3
    assert df.n_sources.iloc[0] == 2     # {"", "web"} — null folded in
    assert bool(df.is_cross_source.iloc[0])


@pytest.mark.usefixtures("ray_session")
def test_pps_sample_matches_duckdb():
    """Systematic PPS sample: heavy docs sampled with multiplicity,
    light runs skipped, blocks split so the prefix sum carries."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import pps_sample
    rng = np.random.default_rng(13)
    w = rng.integers(1, 40, 50).astype(np.int64)
    w[7] = 250   # heavier than step=100 -> multiplicity >= 2
    t = pa.table({
        "doc_id": pa.array(np.arange(50, dtype=np.int64)),
        "text": pa.array(["x"] * 50),
        "n_chars": pa.array(w),
    })
    import smqtk_indexing_ray.pipelines.analysis as A
    got = A.pps_sample(rd.from_arrow(t).repartition(5),
                       step=100).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute("""
WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
  CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
  AS cum_before FROM documents)
SELECT doc_id, n_chars, cum_before,
  CAST((cum_before + n_chars) // 100 - cum_before // 100 AS BIGINT)
    AS n_hits
FROM c WHERE (cum_before + n_chars) // 100 > cum_before // 100
ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(got, exp)
    assert got[got.doc_id == 7].n_hits.iloc[0] >= 2   # multiplicity
    assert got.n_hits.sum() == int(w.sum()) // 100    # covers total
    with pytest.raises(ValueError, match="step"):
        pps_sample(rd.from_arrow(t), step=0)


@pytest.mark.usefixtures("ray_session")
def test_cluster_quality_rollup():
    """The near-dup pair (docs 0,1,2 via exact dup + trigram overlap)
    rolls up into one cluster with the right length stats; singletons
    keep n_docs=1."""
    from smqtk_indexing_ray.pipelines.analysis import (
        cluster_quality_rollup)
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c d e f", "a b c d e f", "a b c d e g", "x y z w v u",
        ]),
        "n_chars": pa.array([11, 11, 11, 11], pa.int64()),
    })
    got = cluster_quality_rollup(
        rd.from_arrow(t).repartition(2), k=3,
        threshold=0.4).to_pandas().set_index("cluster_id")
    assert got.loc[0, "n_docs"] == 3          # 0,1 exact + 2 near
    assert got.loc[0, "total_chars"] == 33
    assert got.loc[0, "min_chars"] == 11 and got.loc[0, "max_chars"] == 11
    assert got.loc[3, "n_docs"] == 1


@pytest.mark.usefixtures("ray_session")
def test_lang_source_matrix():
    """Pivot semantics: fixed columns, unknown langs land in n_other,
    null lang/source fold into '' groups, totals add up."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import lang_source_matrix
    t = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["x"] * 6),
        "lang": pa.array(["en", "en", "zz", None, "de", "zh"]),
        "source": pa.array(["a", "a", "a", "b", "b", None]),
    })
    got = lang_source_matrix(
        rd.from_arrow(t).repartition(3)).to_pandas().set_index("source")
    assert got.loc["a", "n_en"] == 2 and got.loc["a", "n_other"] == 1
    assert got.loc["a", "n_total"] == 3
    assert got.loc["b", "n_de"] == 1 and got.loc["b", "n_other"] == 1
    assert got.loc["", "n_zh"] == 1 and got.loc["", "n_total"] == 1
    lang_cols = [c for c in got.columns if c.startswith("n_")
                 and c != "n_total"]
    assert (got[lang_cols].sum(axis=1) == got.n_total).all()


@pytest.mark.usefixtures("ray_session")
def test_dedup_threshold_sweep():
    """Monotone sensitivity: lower thresholds merge at least as many
    docs; at 0.4 the near-dup joins the exact pair, at 0.99 only the
    exact dup merges."""
    from smqtk_indexing_ray.pipelines.analysis import (
        dedup_threshold_sweep)
    got = dedup_threshold_sweep(
        _docs(), thresholds=(0.4, 0.99)).to_pandas().set_index(
        "threshold")
    # docs: 0==1 exact, 2 near (j=5/7~0.71 trigram), 3,4 unique
    assert got.loc[0.4, "n_clusters"] == 3     # {0,1,2}, {3}, {4}
    assert got.loc[0.4, "n_dup_docs"] == 2
    assert got.loc[0.99, "n_clusters"] == 4    # exact pair only
    assert got.loc[0.99, "n_dup_docs"] == 1
    assert got.loc[0.4, "n_dup_docs"] >= got.loc[0.99, "n_dup_docs"]


@pytest.mark.usefixtures("ray_session")
def test_id_integrity_audit():
    """Integrity scan on a broken id column: one duplicated id, one
    gap — counts match the window-function oracle semantics."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import id_integrity_audit
    t = pa.table({
        "doc_id": pa.array([10, 11, 11, 13, 14], pa.int64()),
        "text": pa.array(["x"] * 5),
    })
    got = id_integrity_audit(
        rd.from_arrow(t).repartition(3)).to_pandas().iloc[0]
    assert got.n_rows == 5
    assert got.n_distinct_ids == 4
    assert got.n_dup_ids == 1          # id 11 appears twice
    assert got.min_id == 10 and got.max_id == 14
    assert got.n_missing == 1          # id 12 absent


@pytest.mark.usefixtures("ray_session")
def test_decile_dup_rates_matches_duckdb():
    """Length-decile x dup-rate report vs the SQL oracle: short docs
    planted as heavy normalized dups, NTILE remainders exercised
    (n not divisible by nb), case/whitespace variants merged."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import decile_dup_rates

    rng = np.random.default_rng(23)
    texts = []
    n = 257                              # prime: NTILE remainder path
    for i in range(n):
        if i % 5 == 0:
            # short template with case/space jitter -> normalized dup
            base = "buy cheap widgets now"
            texts.append(base.upper() if i % 2 else base + "  ")
        else:
            w = rng.integers(20, 120)
            texts.append(" ".join(
                rng.choice(["alpha", "beta", "gamma", "delta", "eps"],
                           w)))
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array(
            np.array([len(x) for x in texts], np.int64)),
    })
    got = decile_dup_rates(
        rd.from_arrow(t).repartition(6), nb=10).to_pandas().sort_values(
        "bucket", ignore_index=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute(
        r"WITH nrm AS (SELECT doc_id, n_chars,"
        r" lower(regexp_replace(regexp_replace(coalesce(text, ''),"
        r" '\s+', ' ', 'g'), '^ | $', '', 'g')) AS norm FROM documents),"
        r" lab AS (SELECT doc_id, count(*) OVER (PARTITION BY norm)"
        r"  AS csize FROM nrm),"
        r" dec AS (SELECT doc_id, CAST(NTILE(10) OVER ("
        r"  ORDER BY n_chars, doc_id) AS BIGINT) AS bucket"
        r"  FROM documents)"
        r" SELECT bucket, count(*) AS n_docs,"
        r" CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)"
        r"  AS n_dups,"
        r" CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)"
        r"  / (count(*) * 1.0) AS dup_share"
        r" FROM dec JOIN lab USING (doc_id) GROUP BY bucket"
        r" ORDER BY bucket").df()
    assert len(got) == 10
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col
    # the dup mass concentrates in the short deciles by construction
    assert got.n_dups[got.bucket <= 2].sum() > 0


@pytest.mark.usefixtures("ray_session")
def test_table_profile_matches_duckdb():
    """Per-column profile vs SQL: planted nulls in every lane, distinct
    counts exclude NULLs, string columns get NULL min/max, float
    distinctness is bit-exact, timestamps profile as epoch micros."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import table_profile

    rng = np.random.default_rng(41)
    n = 500
    base = np.datetime64("2024-03-01", "us")
    ids = np.arange(n, dtype=np.int64)
    vals = rng.choice([1.5, 2.25, -3.75, 0.5], n)
    cats = rng.choice(["x", "y", "z"], n).astype(object)
    ts = base + rng.integers(0, 10_000, n).astype("timedelta64[s]")
    t = pa.table({
        "uid": pa.array(np.where(ids % 10 == 0, None, ids),
                        pa.int64()),
        "val": pa.array(np.where(ids % 7 == 0, None, vals),
                        pa.float64()),
        "cat": pa.array([None if i % 13 == 0 else c
                         for i, c in enumerate(cats)], pa.string()),
        "stamp": pa.array(ts.astype("datetime64[us]")),
    })
    got = table_profile(
        rd.from_arrow(t).repartition(6),
        int_cols=("uid",), float_cols=("val",), str_cols=("cat",),
        ts_cols=("stamp",)).to_pandas().set_index("col")
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT 'uid' AS col, count(*) AS n_rows,"
        " CAST(count(*) - count(uid) AS BIGINT) AS n_nulls,"
        " count(DISTINCT uid) AS n_distinct,"
        " CAST(min(uid) AS DOUBLE) AS min_num,"
        " CAST(max(uid) AS DOUBLE) AS max_num FROM t"
        " UNION ALL SELECT 'val', count(*),"
        " CAST(count(*) - count(val) AS BIGINT), count(DISTINCT val),"
        " min(val), max(val) FROM t"
        " UNION ALL SELECT 'cat', count(*),"
        " CAST(count(*) - count(cat) AS BIGINT), count(DISTINCT cat),"
        " CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM t"
        " UNION ALL SELECT 'stamp', count(*),"
        " CAST(count(*) - count(stamp) AS BIGINT),"
        " count(DISTINCT stamp), CAST(epoch_us(min(stamp)) AS DOUBLE),"
        " CAST(epoch_us(max(stamp)) AS DOUBLE) FROM t").df().set_index(
        "col")
    for c in ("uid", "val", "cat", "stamp"):
        for f in ("n_rows", "n_nulls", "n_distinct"):
            assert got.loc[c, f] == want.loc[c, f], (c, f)
        for f in ("min_num", "max_num"):
            g, w = got.loc[c, f], want.loc[c, f]
            assert (pd.isna(g) and pd.isna(w)) or g == w, (c, f)


@pytest.mark.usefixtures("ray_session")
def test_table_profile_negative_zero_folds():
    """-0.0 and 0.0 count as ONE distinct float value (SQL COUNT
    DISTINCT semantics), not two bit patterns."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import table_profile

    t = pa.table({"val": pa.array([0.0, -0.0, 1.5, 1.5, -0.0],
                                  pa.float64())})
    got = table_profile(rd.from_arrow(t).repartition(2),
                        float_cols=("val",)).to_pandas()
    assert got.n_distinct[0] == 2
    assert got.min_num[0] == 0.0 and got.max_num[0] == 1.5


@pytest.mark.usefixtures("ray_session")
def test_source_pair_matrix_matches_duckdb():
    """Syndication matrix vs SQL: unordered source-pair normalization,
    within-source diagonal counted, null sources fold to ''."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import source_pair_matrix

    rng = np.random.default_rng(53)
    n = 120
    texts, sources = [], []
    base = " ".join(rng.choice(["aa", "bb", "cc", "dd", "ee"], 40))
    for i in range(n):
        if i % 4 == 0:
            texts.append(base + f" tail{i % 2}")  # near-dup family
            sources.append(["wire", "mirror", None][i % 3])
        else:
            texts.append(" ".join(
                rng.choice(["xx", "yy", "zz", "ww", "vv"],
                           rng.integers(20, 40))))
            sources.append("organic")
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(
            np.array([len(x) for x in texts], np.int64)),
    })
    got = source_pair_matrix(
        rd.from_arrow(t).repartition(5)).to_pandas().sort_values(
        ["src_lo", "src_hi"], ignore_index=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute(
        r"WITH toks AS (SELECT doc_id, length(text) AS n_chars,"
        r" list_filter(string_split_regex(text, '\s+'), x -> x <> '')"
        r" AS w FROM documents),"
        r" sh AS (SELECT DISTINCT doc_id,"
        r"  unnest(list_transform(generate_series(1,"
        r"  greatest(len(w) - 2, 0)),"
        r"  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle"
        r"  FROM toks),"
        r" sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh"
        r"  GROUP BY doc_id),"
        r" shk AS (SELECT doc_id, shingle FROM sh QUALIFY count(*)"
        r"  OVER (PARTITION BY shingle) <= 1000),"
        r" inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        r"  count(*) AS n_inter FROM shk a JOIN shk b"
        r"  ON a.shingle = b.shingle AND a.doc_id < b.doc_id"
        r"  GROUP BY 1, 2),"
        r" jpairs AS (SELECT doc_a, doc_b FROM inter"
        r"  JOIN sizes sa ON sa.doc_id = doc_a"
        r"  JOIN sizes sb ON sb.doc_id = doc_b"
        r"  WHERE CAST(n_inter AS DOUBLE)"
        r"  / (sa.n_sh + sb.n_sh - n_inter) >= 0.5)"
        r" SELECT least(coalesce(da.source, ''),"
        r"  coalesce(db.source, '')) AS src_lo,"
        r"  greatest(coalesce(da.source, ''),"
        r"  coalesce(db.source, '')) AS src_hi, count(*) AS n_pairs"
        r" FROM jpairs JOIN documents da ON da.doc_id = doc_a"
        r" JOIN documents db ON db.doc_id = doc_b"
        r" GROUP BY 1, 2 ORDER BY 1, 2").df()
    assert len(got) == len(want) > 1
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col


@pytest.mark.usefixtures("ray_session")
def test_mixture_plan_exact_arithmetic():
    """Mixture plan: over-budget sources clamp to rate 1.0 (take all),
    unweighted sources fall to the default, expected tokens floor
    exactly, counts fold across blocks."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import mixture_plan

    docs = []
    for i in range(60):
        src = ["big", "small", "other"][i % 3]
        n_tok = {"big": 100, "small": 5, "other": 20}[src]
        docs.append((i, " ".join(["w"] * n_tok), src))
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array([d[2] for d in docs], pa.string()),
        "n_chars": pa.array(
            np.array([len(d[1]) for d in docs], np.int64)),
    })
    got = mixture_plan(
        rd.from_arrow(t).repartition(5), budget_tokens=1000,
        weights_pct={"big": 50, "small": 40},
        default_pct=5).to_pandas().set_index("source")
    # big: 2000 tokens, target 500 -> rate 0.25, expected 500
    assert got.loc["big", "n_tokens"] == 2000
    assert got.loc["big", "sample_rate"] == (1000 * 50) / (2000 * 100.0)
    assert got.loc["big", "expected_tokens"] == 500
    # small: 100 tokens, target 400 -> clamps to 1.0, takes all 100
    assert got.loc["small", "sample_rate"] == 1.0
    assert got.loc["small", "expected_tokens"] == 100
    # other: default 5% -> target 50 of 400 tokens -> rate 0.125
    assert got.loc["other", "weight_pct"] == 5
    assert got.loc["other", "sample_rate"] == (1000 * 5) / (400 * 100.0)
    assert got.loc["other", "expected_tokens"] == 50
    assert got.n_docs.sum() == 60


@pytest.mark.usefixtures("ray_session")
class TestPpjoinPairs:
    def _docs(self, texts, parts=4):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })).repartition(parts)

    def test_matches_uncapped_exact_join(self):
        """PPJoin's prefix filter loses NO pairs: output must equal the
        uncapped all-pairs exact join on a corpus with planted
        near-dups."""
        from smqtk_indexing_ray.pipelines.analysis import (
            ngram_jaccard_pairs, ppjoin_pairs)
        rng = np.random.default_rng(23)
        words = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
        base = [" ".join(rng.choice(words, 40)) for _ in range(20)]
        near = [t + " tail extra bit" for t in base[:6]]   # near-dups
        texts = base + near + [base[0], base[1]]           # exact dups
        pp = ppjoin_pairs(self._docs(texts)).to_pandas().sort_values(
            ["doc_a", "doc_b"], ignore_index=True)
        ng = ngram_jaccard_pairs(
            self._docs(texts), max_shingle_freq=None).to_pandas(
        ).sort_values(["doc_a", "doc_b"], ignore_index=True)
        assert len(pp) > 0
        assert pp.equals(ng)

    def test_boilerplate_shingle_does_not_explode(self):
        """A shingle present in EVERY doc sits at the end of the
        rarest-first order and never enters a prefix — the hot-key
        blowup ngram_jaccard_pairs needs its DF cap for."""
        from smqtk_indexing_ray.pipelines.analysis import ppjoin_pairs
        rng = np.random.default_rng(5)
        boiler = "copyright footer text"
        texts = [" ".join(rng.choice(["x%d" % i for i in range(40)], 30))
                 + " " + boiler for _ in range(50)]
        got = ppjoin_pairs(self._docs(texts)).to_pandas()
        # distinct random bodies share only boilerplate -> low jaccard,
        # no pair reaches 0.5
        assert len(got) == 0

    def test_above_vocab_gate_takes_df_attach_fallback(self):
        """max_vocab forced tiny drives the web-scale path (df
        sort_attach + sorted_rank_attach instead of the broadcast):
        output must STILL equal the uncapped exact join."""
        from smqtk_indexing_ray.pipelines.analysis import (
            ngram_jaccard_pairs, ppjoin_pairs)
        rng = np.random.default_rng(23)
        words = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
        base = [" ".join(rng.choice(words, 40)) for _ in range(20)]
        near = [t + " tail extra bit" for t in base[:6]]
        texts = base + near + [base[0], base[1]]
        pp = ppjoin_pairs(self._docs(texts),
                          max_vocab=3).to_pandas().sort_values(
            ["doc_a", "doc_b"], ignore_index=True)
        ng = ngram_jaccard_pairs(
            self._docs(texts), max_shingle_freq=None).to_pandas(
        ).sort_values(["doc_a", "doc_b"], ignore_index=True)
        assert len(pp) > 0
        assert pp.equals(ng)

    def test_fallback_non_dyadic_threshold(self):
        """The epsilon-safe prefix bound must hold on the fallback
        path too (rank computed by sorted_rank_attach, not locally)."""
        from smqtk_indexing_ray.pipelines.analysis import (
            ngram_jaccard_pairs, ppjoin_pairs)
        rng = np.random.default_rng(31)
        words = ["w%d" % i for i in range(30)]
        base = [" ".join(rng.choice(words, 50)) for _ in range(12)]
        fam = [b + " extra%d tail%d" % (i, i) for i, b in
               enumerate(base[:5])]
        texts = base + fam
        t = 0.55
        pp = ppjoin_pairs(self._docs(texts), threshold=t,
                          max_vocab=1).to_pandas().sort_values(
            ["doc_a", "doc_b"], ignore_index=True)
        ng = ngram_jaccard_pairs(
            self._docs(texts), threshold=t,
            max_shingle_freq=None).to_pandas().sort_values(
            ["doc_a", "doc_b"], ignore_index=True)
        assert pp.equals(ng)

    def test_non_dyadic_threshold_no_recall_loss(self):
        """threshold=0.55: float64 rounds 0.55*100 UP past the integer
        (55.000000000000007), which without the epsilon nudge shortens
        the prefix by one and drops a true overlap-55 pair (r4 review
        finding).  PPJoin must still equal the uncapped exact join."""
        from smqtk_indexing_ray.pipelines.analysis import (
            ngram_jaccard_pairs, ppjoin_pairs)
        rng = np.random.default_rng(31)
        words = ["w%d" % i for i in range(30)]
        base = [" ".join(rng.choice(words, 50)) for _ in range(12)]
        # near-dup family with varied overlap around the threshold
        fam = [b + " extra%d tail%d" % (i, i) for i, b in
               enumerate(base[:5])]
        texts = base + fam
        t = 0.55
        pp = ppjoin_pairs(self._docs(texts), threshold=t).to_pandas(
        ).sort_values(["doc_a", "doc_b"], ignore_index=True)
        ng = ngram_jaccard_pairs(
            self._docs(texts), threshold=t,
            max_shingle_freq=None).to_pandas().sort_values(
            ["doc_a", "doc_b"], ignore_index=True)
        assert pp.equals(ng)


@pytest.mark.usefixtures("ray_session")
def test_ppjoin_duplicate_doc_id_raises():
    """Duplicate doc_id rows would silently merge into one packed blob
    (inflated df + wrong verify intersections) — the pack stage must
    fail loudly instead (r5 review guard)."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import ppjoin_pairs
    t = pa.table({
        "doc_id": pa.array([0, 1, 1], pa.int64()),
        "text": pa.array(["a b c d e", "f g h i j", "k l m n o"]),
    })
    with pytest.raises(Exception, match="duplicate doc_id"):
        ppjoin_pairs(rd.from_arrow(t)).to_pandas()
