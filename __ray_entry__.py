"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Float-parity design: every double emitted by an oracle-checked query is a
ratio of exact int64 counts (bit-identical IEEE division on both sides)
or a cosine similarity computed in float64 and rounded to 6 decimals on
both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _docs(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet")


def _emb(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def entry() -> Any:
    """Flagship near-dup pipeline over sf0.001 documents."""
    from smqtk_indexing_ray.config import DedupConfig
    from smqtk_indexing_ray.pipelines.dedup import (
        dedup_pipeline, documents_as_pages)

    pages = documents_as_pages(_docs("/root/testdata/sf0.001"))
    res = dedup_pipeline(pages, DedupConfig(), num_partitions=8)
    return res.output


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_exact_dedup(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import exact_dedup
    return exact_dedup(_docs(sf_dir))


def _q_exact_cluster_labels(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import exact_cluster_labels
    return exact_cluster_labels(_docs(sf_dir))


def _q_exact_cluster_sizes(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import exact_cluster_sizes
    return exact_cluster_sizes(_docs(sf_dir))


def _q_cross_source_dups(sf_dir: str):
    """Exact-dup clusters with DISTINCT-source attribution (the
    cross-source syndication view): two sorted aggs — (hash, source)
    first, so count(DISTINCT source) is a plain count over one row per
    (text, source)."""
    from smqtk_indexing_ray.pipelines.analysis import cross_source_dups
    return cross_source_dups(_docs(sf_dir))


def _q_normalized_dedup(sf_dir: str):
    """Case/whitespace-normalized exact-dup tier (the C4/CCNet "fuzzy
    exact" rung): normal form shared RE2-for-RE2 with the oracle, two
    sorted 128-bit-hash attaches, text never crosses a shuffle."""
    from smqtk_indexing_ray.pipelines.analysis import (
        normalized_cluster_labels)
    return normalized_cluster_labels(_docs(sf_dir))


def _q_mixture_plan(sf_dir: str):
    """Dataset-mixture plan (the static source-blending step in front
    of training): per-source sampling rates for a token budget from
    integer weights — one combiner pass, exact int64 arithmetic, one
    IEEE division per source.  Exact oracle."""
    from smqtk_indexing_ray.pipelines.analysis import mixture_plan
    return mixture_plan(_docs(sf_dir), budget_tokens=100_000,
                        weights_pct={"src0": 30, "src1": 20,
                                     "src2": 10},
                        default_pct=2)


def _q_decile_dup_rates(sf_dir: str):
    """Dup-rate-by-length-decile correlation (the length-floor
    question): ANSI-exact NTILE buckets x normalized-dup-cluster
    membership, all sort-shaped, exact int-ratio shares."""
    from smqtk_indexing_ray.pipelines.analysis import decile_dup_rates
    return decile_dup_rates(_docs(sf_dir), nb=10)


def _q_token_stats(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import token_stats
    return token_stats(_docs(sf_dir))


def _q_token_quantiles(sf_dir: str):
    """Exact discrete quantiles of per-doc token counts: one narrow
    column sort + metadata index resolution + point reads; index rule
    bit-matches DuckDB quantile_disc."""
    from smqtk_indexing_ray.pipelines.analysis import token_stats
    from smqtk_indexing_ray.stages.quantiles import column_quantiles
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    return column_quantiles(token_stats(_docs(sf_dir)), "n_tokens", qs)


def _q_group_quantiles(sf_dir: str):
    """Exact per-language discrete quantiles of doc length: one narrow
    (lang, n_chars) sort + run-length probes (output-proportional
    driver state) + point reads; per-group index rule bit-matches
    DuckDB quantile_disc."""
    from smqtk_indexing_ray.stages.quantiles import group_quantiles
    return group_quantiles(_docs(sf_dir), group="lang", col="n_chars",
                           qs=[0.1, 0.25, 0.5, 0.75, 0.9])


def _q_approx_length_quantiles(sf_dir: str):
    """Approximate doc-length quantiles from a deterministic bottom-k
    LCG sample (stages/quantiles.approx_quantiles) — the 100-TB scale
    path beside the exact narrow-sort quantiles: at most k rows per
    batch cross the exchange.  The sample is SQL-reproducible, so the
    oracle is exact despite the operator being approximate."""
    from smqtk_indexing_ray.stages.quantiles import approx_quantiles
    return approx_quantiles(_docs(sf_dir), col="n_chars",
                            qs=[0.1, 0.25, 0.5, 0.75, 0.9], k=200)


def _q_quality_buckets(sf_dir: str):
    """CCNet-style per-language quality tiers: NTILE(3) over doc length
    (head/middle/tail) — the bucketing step a pretraining pipeline uses
    to keep only the best tier per language.  Exact NTILE window
    oracle."""
    import pyarrow as pa
    from smqtk_indexing_ray.stages.topk import ntile_per_group

    schema = pa.schema([("lang", pa.string()), ("doc_id", pa.int64()),
                        ("n_chars", pa.int64())])
    ds = _docs(sf_dir).select_columns(["lang", "doc_id", "n_chars"])
    out = ntile_per_group(ds, group="lang", order="n_chars",
                          tiebreak="doc_id", nb=3, schema=schema)

    out_schema = pa.schema(list(schema)
                           + [pa.field("bucket", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "bucket" not in t.column_names:
            return out_schema.empty_table()
        return t.select(["lang", "doc_id", "n_chars", "bucket"])

    return out.map_batches(slim, batch_format="pyarrow")


def _q_length_outliers(sf_dir: str):
    """Robust per-language length-outlier flags (median/MAD, all-int64
    arithmetic): the skew-tolerant corpus-QA gate.  Exact two-pass
    quantile_disc oracle."""
    from smqtk_indexing_ray.pipelines.analysis import robust_outliers
    return robust_outliers(_docs(sf_dir), group="lang", col="n_chars",
                           keep=["doc_id"], c=3)


def _q_dedup_tier_summary(sf_dir: str):
    """Tiered-dedup attribution funnel (the graft's namesake report):
    every doc charged to the first tier that removes it — exact, norm
    (case/whitespace-normalized), near (3-gram jaccard clusters), or
    unique — with per-tier counts.  Exact recursive-CTE oracle."""
    from smqtk_indexing_ray.pipelines.analysis import dedup_tier_summary
    return dedup_tier_summary(_docs(sf_dir))


def _q_curation_report(sf_dir: str):
    """Per-doc curation audit: the first gate that rejects each doc
    (lang -> quality -> exact_dup -> near_dup) or 'kept' — four
    sort-merge attaches over the existing gate pipelines.  Exact
    composite oracle."""
    from smqtk_indexing_ray.pipelines.analysis import curation_report
    return curation_report(_docs(sf_dir))


def _q_cluster_size_histogram(sf_dir: str):
    """Distribution of near-dup cluster sizes (how much of the corpus
    sits in 2-member vs giant clusters) — two chained sorted counts
    over the jaccard labels.  Exact recursive-CTE oracle."""
    import pyarrow as pa
    from smqtk_indexing_ray.pipelines.analysis import (
        jaccard_cluster_labels)
    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    from smqtk_indexing_ray.stages._util import auto_blocks
    labels = jaccard_cluster_labels(_docs(sf_dir))
    # labels are corpus-sized (one row per doc): scale the pre-sort
    # block target per the stages/agg.py contract
    sizes = sorted_group_agg(
        labels, key="cluster_id", aggs={"size": "count"},
        num_blocks=max(16, auto_blocks()),
        schema=pa.schema([("doc_id", pa.int64()),
                          ("cluster_id", pa.int64())]))
    hist = sorted_group_agg(
        sizes, key="size", aggs={"n_clusters": "count"},
        schema=pa.schema([("cluster_id", pa.int64()),
                          ("size", pa.int64())]))
    return hist


def _q_length_pareto(sf_dir: str):
    """Corpus Pareto layout: every doc ranked by length (desc), with
    the exact char total of all strictly-earlier docs — the distributed
    prefix sum (`stages/prefix.py`), one sort + O(blocks) carries.
    Exact window oracle."""
    import pyarrow as pa
    from smqtk_indexing_ray.stages.prefix import running_total

    schema = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])
    ds = _docs(sf_dir).select_columns(["doc_id", "n_chars"])
    return running_total(ds, order=["n_chars", "doc_id"],
                         value="n_chars", out="chars_before",
                         descending=[True, False], schema=schema)


def _q_corpus_rollup(sf_dir: str):
    """GROUPING SETS corpus census over (source, lang) in one input
    pass — per-batch cell pre-aggregation expanded to all four levels.
    Exact int64 oracle."""
    from smqtk_indexing_ray.pipelines.analysis import corpus_rollup
    return corpus_rollup(_docs(sf_dir))


def _q_trimmed_length_mean(sf_dir: str):
    """Per-language 5-95% trimmed mean of doc length — quantile cuts
    broadcast, combiner-shaped aggregation, exact int-ratio mean."""
    from smqtk_indexing_ray.pipelines.analysis import trimmed_mean
    return trimmed_mean(_docs(sf_dir), group="lang", col="n_chars",
                        lo=0.05, hi=0.95)


def _q_top_docs_per_lang(sf_dir: str):
    """Per-group top-k (5 longest docs per language): one sort +
    per-block rank with boundary carries — row_number() oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from smqtk_indexing_ray.stages.topk import top_k_per_group

    schema = pa.schema([("lang", pa.string()), ("doc_id", pa.int64()),
                        ("n_tokens", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        text = pc.fill_null(t["text"], "")
        return pa.table({
            "lang": t["lang"],
            "doc_id": t["doc_id"],
            "n_tokens": pc.cast(
                pc.count_substring_regex(text, r"\S+"), pa.int64()),
        })

    tks = _docs(sf_dir).select_columns(
        ["lang", "doc_id", "text"]).map_batches(slim,
                                                batch_format="pyarrow")
    return top_k_per_group(tks, group="lang", order="n_tokens",
                           tiebreak="doc_id", k=5, schema=schema)


def _contamination_from(docs, stop_shingles_ref=None):
    """Shared tail of the contamination scans: exact jaccard pairs over
    ``docs`` -> keep cross-split (odd=eval vs even=train) pairs -> per
    eval doc the single closest train doc."""
    import pyarrow as pa
    from smqtk_indexing_ray.pipelines.analysis import ngram_jaccard_pairs
    from smqtk_indexing_ray.stages.topk import top_k_per_group

    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.5,
                                stop_shingles_ref=stop_shingles_ref)
    schema = pa.schema([("eval_doc", pa.int64()),
                        ("train_doc", pa.int64()),
                        ("jaccard", pa.float64())])

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return schema.empty_table()
        import numpy as np
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        cross = (a % 2) != (b % 2)
        a, b = a[cross], b[cross]
        j = t["jaccard"].to_numpy(zero_copy_only=False)[cross]
        a_odd = (a % 2) == 1
        ev = np.where(a_odd, a, b)
        tr = np.where(a_odd, b, a)
        return pa.table({"eval_doc": pa.array(ev),
                         "train_doc": pa.array(tr),
                         "jaccard": pa.array(j)})

    oriented = pairs.map_batches(orient, batch_format="pyarrow")
    top1 = top_k_per_group(oriented, group="eval_doc", order="jaccard",
                           tiebreak="train_doc", k=1, schema=schema)

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "eval_doc" not in t.column_names:
            return schema.empty_table()
        return t.select(["eval_doc", "train_doc", "jaccard"])

    return top1.map_batches(slim, batch_format="pyarrow")


def _q_contamination(sf_dir: str):
    """Cross-split contamination check: for every 'eval' doc (odd
    doc_id), its closest 'train' doc (even doc_id) by exact n-gram
    Jaccard >= 0.5 — the train/test leakage scan an LLM data pipeline
    runs before training.  Exact SQL window oracle."""
    return _contamination_from(_docs(sf_dir))


def _q_bloom_contamination(sf_dir: str):
    """Scale path of ``contamination``: the eval split's shingles build
    a ~1 MiB Bloom sketch, broadcast once; the train corpus is
    prefiltered inside map_batches (zero shuffle on the big side) and
    only the surviving candidates enter exact jaccard verification.
    Bloom has no false negatives, so the output is identical to the
    exact scan — same SQL oracle, UNCONDITIONALLY: the stop-shingle
    cap is enforced against the FULL corpus's shingle DF (a broadcast
    hot-shingle set from `hot_shingles`), not the DF of the filtered
    subset, so a full-corpus-hot shingle can never sneak pairs in just
    because the prefilter thinned its run."""
    import pyarrow.compute as pc
    from smqtk_indexing_ray.pipelines.analysis import (
        bloom_prefilter, hot_shingles)

    def odd(t):
        return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1))

    def even(t):
        return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0))

    stop_ref = hot_shingles(_docs(sf_dir), k=3, max_df=1000)
    eval_side = _docs(sf_dir).map_batches(odd, batch_format="pyarrow")
    train_side = _docs(sf_dir).map_batches(even, batch_format="pyarrow")
    kept_train = bloom_prefilter(train_side, eval_side, k=3)
    return _contamination_from(eval_side.union(kept_train),
                               stop_shingles_ref=stop_ref)


def _q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: 20 docs per language, selected
    by a shared LCG rank so the draw is reproducible in SQL — the
    distributed analog of seeded random_sample for per-stratum training
    budgets."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from smqtk_indexing_ray.stages.topk import top_k_per_group

    schema = pa.schema([("lang", pa.string()), ("doc_id", pa.int64()),
                        ("draw", pa.int64())])

    def add_draw(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        import numpy as np
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        draw = (d * 1103515245 + 12345) % 2147483648
        return pa.table({"lang": t["lang"], "doc_id": t["doc_id"],
                         "draw": pa.array(draw.astype(np.int64))})

    ds = _docs(sf_dir).select_columns(["lang", "doc_id"]).map_batches(
        add_draw, batch_format="pyarrow")
    return top_k_per_group(ds, group="lang", order="draw",
                           tiebreak="doc_id", k=20, descending=False,
                           schema=schema)


def _q_token_counts(sf_dir: str):
    """Whitespace + BPE-ish regex token counts (RE2 pattern shared with
    the DuckDB oracle)."""
    from smqtk_indexing_ray.pipelines.analysis import token_counts
    return token_counts(_docs(sf_dir))


def _q_lang_summary(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import lang_summary
    return lang_summary(_docs(sf_dir))


def _q_source_dup_stats(sf_dir: str):
    """Per-source exact-dup audit: two-level exact distinct over
    (source, 128-bit text hash); text never crosses a shuffle."""
    from smqtk_indexing_ray.pipelines.analysis import source_dup_stats
    return source_dup_stats(_docs(sf_dir))


def _q_length_histogram(sf_dir: str):
    """Docs per 100-char length bucket (partial-agg combiner; shuffle
    bounded by buckets x batches)."""
    from smqtk_indexing_ray.pipelines.analysis import length_histogram
    return length_histogram(_docs(sf_dir), bucket_chars=100)


def _q_doc_commonness(sf_dir: str):
    """Unigram-frequency doc score (CCNet-style LM-quality proxy):
    bounded vocab broadcast + batch-local lookup; exact int64 counts."""
    from smqtk_indexing_ray.pipelines.terms import doc_commonness
    return doc_commonness(_docs(sf_dir))


def _q_ngram_jaccard_pairs(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs(sf_dir), k=3, threshold=0.5)


def _q_ppjoin_pairs(sf_dir: str):
    """Exact Jaccard pairs via PPJoin prefix filtering (Xiao et al.
    2008): only the rarest-first prefix of each shingle set enters the
    pair-emission sort (no recall loss by the prefix bound), survivors
    verified exactly against packed shingle-set blobs.  The scale path
    for EXACT set similarity; oracle = the pure uncapped Jaccard
    join."""
    from smqtk_indexing_ray.pipelines.analysis import ppjoin_pairs
    return ppjoin_pairs(_docs(sf_dir), k=3, threshold=0.5)


def _q_jaccard_cluster_labels(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import jaccard_cluster_labels
    return jaccard_cluster_labels(_docs(sf_dir), k=3, threshold=0.5)


def _q_dup_triangles(sf_dir: str):
    """Exact triangle enumeration over the near-dup pair graph: wedges
    at the lowest vertex via the join-free pair stage + one sort-merge
    semi-join on a packed edge key — template farms show up as
    near-cliques.  Exact three-way self-join oracle."""
    from smqtk_indexing_ray.pipelines.analysis import ngram_jaccard_pairs
    from smqtk_indexing_ray.pipelines.graph import dup_triangles
    return dup_triangles(ngram_jaccard_pairs(_docs(sf_dir), k=3,
                                             threshold=0.5))


def _q_clustering_coefficients(sf_dir: str):
    """Per-doc local clustering coefficient on the near-dup graph —
    hub-of-a-star (~0) vs member-of-a-clique (~1), the mirror-set
    signal.  Degrees and triangle corners fold through batch-local
    partials; coefficient is an exact int-over-int division."""
    from smqtk_indexing_ray.pipelines.analysis import ngram_jaccard_pairs
    from smqtk_indexing_ray.pipelines.graph import clustering_coefficients
    return clustering_coefficients(ngram_jaccard_pairs(_docs(sf_dir), k=3,
                                                       threshold=0.5))


def _q_source_pair_matrix(sf_dir: str):
    """Syndication matrix: near-dup pair counts per unordered source
    pair (within-source boilerplate vs cross-source copying) — two
    int64-keyed attaches + #sources^2 partials.  Exact oracle."""
    from smqtk_indexing_ray.pipelines.analysis import source_pair_matrix
    return source_pair_matrix(_docs(sf_dir), k=3, threshold=0.5)


def _q_minhash_containment(sf_dir: str):
    """MinHash containment estimator at LSH scale (the quote/embed
    detector, scale twin of the exact suffix pass): same candidate
    generation as the flagship, one extra int32 per endpoint across
    the verify attach.  Hash-seeded — rows-only; pytest pins the
    planted containment class near 1.0."""
    from smqtk_indexing_ray.pipelines.dedup import (
        containment_pairs, documents_as_pages)
    return containment_pairs(documents_as_pages(_docs(sf_dir)),
                             threshold=0.8)


def _q_cosine_near_pairs(sf_dir: str):
    from smqtk_indexing_ray.pipelines.ann import cosine_near_pairs
    return cosine_near_pairs(_emb(sf_dir), threshold=0.4)


def _q_ann_topk(sf_dir: str):
    from smqtk_indexing_ray.pipelines.ann import brute_force_topk
    return brute_force_topk(_emb(sf_dir), n_queries=32, k=10)


def _q_lsh_dedup(sf_dir: str):
    """Flagship MinHash/LSH near-dup clustering (not SQL-expressible)."""
    from smqtk_indexing_ray.config import DedupConfig
    from smqtk_indexing_ray.pipelines.dedup import (
        dedup_pipeline, documents_as_pages)
    pages = documents_as_pages(_docs(sf_dir))
    res = dedup_pipeline(pages, DedupConfig(), num_partitions=8)
    import pyarrow as pa

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("cluster_id", pa.int64()),
                              ("keep", pa.bool_())]).empty_table()
        return t.select(["doc_id", "cluster_id", "keep"])

    return res.output.map_batches(slim, batch_format="pyarrow")


def _q_simhash_near_pairs(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import simhash_near_pairs
    return simhash_near_pairs(_docs(sf_dir), max_hamming=3)


def _q_doc_fingerprints(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import doc_fingerprints
    return doc_fingerprints(_docs(sf_dir))


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): per-doc log ratio of
    target (lang='en') vs rest unigram LMs with add-0.5 smoothing —
    the pretraining data-selection score.  Vocabulary-sized shuffle,
    broadcast log-ratio arrays, batch-local scoring; round6 floats."""
    from smqtk_indexing_ray.pipelines.terms import dsir_weights
    return dsir_weights(_docs(sf_dir), target_lang="en")


def _q_cdc_chunk_stats(sf_dir: str):
    """Chunk-level dedup accounting via content-defined chunking (the
    shift-tolerant dedup grain): gear rolling hash cuts, chunk-hash
    distinct-doc counts, per-doc shared-byte fraction.  Rolling hashes
    are not SQL-expressible — rows-only here; the kernel and pipeline
    are pinned by brute-force pytest oracles (tests/test_cdc.py)."""
    from smqtk_indexing_ray.pipelines.cdc import cdc_chunk_stats
    return cdc_chunk_stats(_docs(sf_dir))


def _q_cdc_fixed_cut_stats(sf_dir: str):
    """Partial SQL oracle for the CDC pipeline (VERDICT r4 #6):
    ``mask_bits=63`` makes the gear mask fire with probability 2^-63 —
    never in practice — so every cut lands at ``max_size`` exactly and
    the per-doc chunk count / byte total become SQL-expressible
    (``ceil(octet_length/64)`` / ``octet_length``) while still driving
    the REAL pipeline end-to-end: gear hashing, content-hash identity,
    the run-length distinct-doc attach, and the sorted per-doc rollup."""
    import pyarrow as pa

    from smqtk_indexing_ray.pipelines.cdc import cdc_chunk_stats
    out = cdc_chunk_stats(_docs(sf_dir), mask_bits=63, min_size=1,
                          max_size=64)

    def slim(t: pa.Table) -> pa.Table:
        cols = ["doc_id", "n_chunks", "total_bytes"]
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            return pa.schema([("doc_id", pa.int64()),
                              ("n_chunks", pa.int64()),
                              ("total_bytes", pa.int64())]).empty_table()
        return t.select(cols)

    return out.map_batches(slim, batch_format="pyarrow")


def _q_lsh_exact_group_consistency(sf_dir: str):
    """Partial SQL oracle for the flagship LSH pipeline (VERDICT r4
    #6): every byte-identical text group of >= 2 docs must land in
    exactly ONE predicted cluster — identical text gives identical
    MinHash signatures, identical band buckets, and an
    est_jaccard=1.0 edge (zero-shingle docs ride the 128-bit
    content-hash path).  Output one row per exact-text group (ALL
    groups — sf0.01 plants no exact dups, so a dups-only projection
    would be vacuously empty there): ``exact_cluster`` (the group's
    min doc_id, same convention as the green ``exact_cluster_labels``
    oracle), ``n_docs``, and ``n_lsh_clusters`` — the SQL twin derives
    the first two exactly and pins the third to the invariant value 1
    (trivial for singletons, the real co-clustering check for dup
    groups)."""
    import pyarrow as pa

    from smqtk_indexing_ray.config import DedupConfig
    from smqtk_indexing_ray.pipelines.analysis import exact_cluster_labels
    from smqtk_indexing_ray.pipelines.dedup import (
        dedup_pipeline, documents_as_pages)
    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.attach import sort_attach

    docs = _docs(sf_dir)
    res = dedup_pipeline(documents_as_pages(docs), DedupConfig(),
                         num_partitions=8)

    ex_schema = pa.schema([("doc_id", pa.int64()),
                           ("exact_cluster", pa.int64())])

    def ex_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cluster_id" not in t.column_names:
            return ex_schema.empty_table()
        return pa.table({"doc_id": t["doc_id"],
                         "exact_cluster": t["cluster_id"]},
                        schema=ex_schema)

    ex = exact_cluster_labels(docs).map_batches(
        ex_slim, batch_format="pyarrow")

    lsh_schema = pa.schema([("doc_id", pa.int64()),
                            ("lsh_cluster", pa.int64())])

    def lsh_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cluster_id" not in t.column_names:
            return lsh_schema.empty_table()
        return pa.table({"doc_id": t["doc_id"],
                         "lsh_cluster": t["cluster_id"]},
                        schema=lsh_schema)

    j = sort_attach(
        ex, res.output.map_batches(lsh_slim, batch_format="pyarrow"),
        key="doc_id", payload_key="doc_id", payload_cols=["lsh_cluster"],
        how="inner", rows_schema=ex_schema, payload_schema=lsh_schema)

    pair_schema = pa.schema([("exact_cluster", pa.int64()),
                             ("lsh_cluster", pa.int64()),
                             ("n", pa.int64())])

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lsh_cluster" not in t.column_names:
            return pair_schema.empty_table()
        import numpy as np
        e = t["exact_cluster"].to_numpy(zero_copy_only=False)
        l = t["lsh_cluster"].to_numpy(zero_copy_only=False)
        order = np.lexsort((l, e))
        e, l = e[order], l[order]
        head = np.concatenate([[True], (e[1:] != e[:-1])
                               | (l[1:] != l[:-1])])
        starts = np.flatnonzero(head)
        cnt = np.diff(np.append(starts, len(e))).astype(np.int64)
        return pa.table({"exact_cluster": pa.array(e[starts]),
                         "lsh_cluster": pa.array(l[starts]),
                         "n": pa.array(cnt)}, schema=pair_schema)

    pairs = sorted_group_agg(
        j.map_batches(pair_partial, batch_format="pyarrow"),
        key=["exact_cluster", "lsh_cluster"], aggs={"n": "sum"},
        schema=pair_schema)

    out_schema = pa.schema([("exact_cluster", pa.int64()),
                            ("n_docs", pa.int64()),
                            ("n_lsh_clusters", pa.int64())])
    per_g = sorted_group_agg(
        pairs, key="exact_cluster",
        aggs={"n_docs": ("n", "sum"), "n_lsh_clusters": "count"},
        schema=pair_schema)

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_docs" not in t.column_names:
            return out_schema.empty_table()
        return t.select(["exact_cluster", "n_docs", "n_lsh_clusters"])

    return per_g.map_batches(project, batch_format="pyarrow")


def _q_dup_span_stats(sf_dir: str):
    """Corpus-wide duplicated-span accounting (cross-document form of
    Lee et al. 2022 ExactSubstr, k-token-window grain): per doc, the
    token positions covered by windows whose shingle occurs in >= 2
    DISTINCT docs, merged into maximal spans.  One vocabulary-sized
    shuffle; text never moves; exact int64 ratios."""
    from smqtk_indexing_ray.pipelines.terms import dup_span_stats
    return dup_span_stats(_docs(sf_dir), k=3, min_df=2)


def _q_dup_span_scrub(sf_dir: str):
    """ExactSubstr-style cut: remove every token covered by a
    cross-document duplicated k-window and rebuild the text
    (single-space joined) — the actionable form of dup_span_stats.
    Exact string parity with the SQL rebuild."""
    from smqtk_indexing_ray.pipelines.terms import dup_span_scrub
    return dup_span_scrub(_docs(sf_dir), k=3, min_df=2)


def _q_lang_id(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import lang_id
    return lang_id(_docs(sf_dir))


def _q_hamming_topk(sf_dir: str):
    from smqtk_indexing_ray.pipelines.ann import hamming_topk
    return hamming_topk(_emb(sf_dir), n_queries=8, k=10)


def _q_hamming_topk_wide(sf_dir: str):
    """128-bit SRP codes (fixed_size_binary, byte-wise popcount): the
    arbitrary-width path of the reference's hash indexes (utils/bits.py).
    Pinned by the 128-bit brute-force pytest oracle in
    tests/test_analysis.py."""
    from smqtk_indexing_ray.pipelines.ann import hamming_topk
    return hamming_topk(_emb(sf_dir), n_queries=8, k=10, bits=128)


def _q_srp_near_pairs(sf_dir: str):
    from smqtk_indexing_ray.pipelines.ann import srp_near_pairs
    return srp_near_pairs(_emb(sf_dir), max_hamming=24)


def _q_substring_containment(sf_dir: str):
    from smqtk_indexing_ray.pipelines.suffix import substring_containment
    return substring_containment(_docs(sf_dir))


def _jaccard_labeled_texts(sf_dir: str):
    """(doc_id, cluster_id, text) under EXACT n-gram-Jaccard clustering —
    hash-family-independent labels, so downstream containment is
    SQL-checkable (VERDICT r1 #10)."""
    import pyarrow as pa
    from smqtk_indexing_ray.pipelines.analysis import jaccard_cluster_labels
    from smqtk_indexing_ray.stages.attach import sort_attach
    docs = _docs(sf_dir)
    labels = jaccard_cluster_labels(docs, k=3, threshold=0.5)
    return sort_attach(
        labels, docs.select_columns(["doc_id", "text"]),
        key="doc_id", payload_key="doc_id", payload_cols=["text"],
        how="inner",
        rows_schema=pa.schema([("doc_id", pa.int64()),
                               ("cluster_id", pa.int64())]),
        payload_schema=pa.schema([("doc_id", pa.int64()),
                                  ("text", pa.string())]))


def _q_cluster_containment(sf_dir: str):
    """Suffix-array containment within exact-Jaccard clusters (the
    clustering matches the jaccard_cluster_labels oracle, so this row has
    a full DuckDB oracle; the span-fraction surface stays in
    cluster_dup_spans)."""
    import pyarrow as pa
    from smqtk_indexing_ray.pipelines.suffix import cluster_containment

    out = cluster_containment(_jaccard_labeled_texts(sf_dir), min_span=20)

    def slim(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = ["doc_id", "cluster_id", "contained_in"]
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            return pa.schema([("doc_id", pa.int64()),
                              ("cluster_id", pa.int64()),
                              ("contained_in", pa.int64())]).empty_table()
        # -1 sentinel for "not contained": keeps the column pure int64 on
        # both sides (a NULL would surface as NaN float64 in the driver's
        # comparison frame)
        t = t.set_column(t.schema.get_field_index("contained_in"),
                         "contained_in",
                         pc.fill_null(pc.cast(t["contained_in"],
                                              pa.int64()), -1))
        return t.select(cols)

    return out.map_batches(slim, batch_format="pyarrow")


def _q_cluster_dup_spans(sf_dir: str):
    """Suffix-array duplicated-span fractions within LSH clusters
    (rows-only: span semantics are not SQL-expressible)."""
    import pyarrow as pa
    from smqtk_indexing_ray.config import DedupConfig
    from smqtk_indexing_ray.context import NARROW_JOIN_HINT
    from smqtk_indexing_ray.pipelines.dedup import (
        dedup_pipeline, documents_as_pages)
    from smqtk_indexing_ray.pipelines.suffix import cluster_containment
    pages = documents_as_pages(_docs(sf_dir))
    res = dedup_pipeline(pages, DedupConfig(), num_partitions=8)
    texts = pages.select_columns(["doc_id", "text"])
    labeled = res.labels.join(
        texts, partition_size_hint=NARROW_JOIN_HINT, join_type="inner",
        num_partitions=8, on=("doc_id",))

    def clean(t: pa.Table) -> pa.Table:
        cols = ["doc_id", "cluster_id", "text"]
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            return pa.schema([("doc_id", pa.int64()),
                              ("cluster_id", pa.int64()),
                              ("text", pa.string())]).empty_table()
        return t.select(cols)

    return cluster_containment(
        labeled.map_batches(clean, batch_format="pyarrow"), min_span=20)


def _q_media_features(sf_dir: str):
    """Multimodal plumbing over synthetic media (payload = text bytes)."""
    from smqtk_indexing_ray.stages.multimodal import (
        media_features, media_from_documents)
    import pyarrow as pa

    feats = media_features(media_from_documents(_docs(sf_dir)))

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("media_id", pa.int64()),
                              ("kind", pa.string()),
                              ("n_bytes", pa.int64())]).empty_table()
        return t.select(["media_id", "kind", "n_bytes"])

    return feats.map_batches(slim, batch_format="pyarrow")


def _q_winnow_fingerprints(sf_dir: str):
    """Winnowing local fingerprints (Schleimer et al. 2003) — rows-only."""
    from smqtk_indexing_ray.pipelines.analysis import winnow_fingerprints
    return winnow_fingerprints(_docs(sf_dir), k=5, window=4)


def _q_quality_signals(sf_dir: str):
    from smqtk_indexing_ray.pipelines.analysis import quality_signals
    return quality_signals(_docs(sf_dir))


def _q_id_integrity_audit(sf_dir: str):
    """Primary-key integrity scan: one narrow sorted grouped count over
    doc_id + a one-row partial fold."""
    from smqtk_indexing_ray.pipelines.analysis import id_integrity_audit
    return id_integrity_audit(_docs(sf_dir))


def _q_dedup_threshold_sweep(sf_dir: str):
    """Jaccard-threshold sensitivity sweep (0.4/0.5/0.7): exact
    clustering per threshold, batch-local rep/dup counting (label ==
    min doc_id marks one rep per cluster)."""
    from smqtk_indexing_ray.pipelines.analysis import (
        dedup_threshold_sweep)
    return dedup_threshold_sweep(_docs(sf_dir))


def _q_lang_source_matrix(sf_dir: str):
    """PIVOT: per-source doc counts across the fixed language column
    set — |sources|-row batch partials into one tiny sorted sum."""
    from smqtk_indexing_ray.pipelines.analysis import lang_source_matrix
    return lang_source_matrix(_docs(sf_dir))


def _q_cluster_quality_rollup(sf_dir: str):
    """Per near-dup cluster length profile (template-farm detector):
    exact-Jaccard labels + one sort-merge attach + one sorted agg;
    recursive-CTE oracle."""
    from smqtk_indexing_ray.pipelines.analysis import (
        cluster_quality_rollup)
    return cluster_quality_rollup(_docs(sf_dir), k=3, threshold=0.5)


def _q_pps_sample(sf_dir: str):
    """Deterministic PPS systematic sample (weight = n_chars): one
    distributed exclusive prefix sum + an all-int64 batch filter —
    byte-reproducible, exact window oracle."""
    from smqtk_indexing_ray.pipelines.analysis import pps_sample
    return pps_sample(_docs(sf_dir), step=10_000)


def _q_compression_signals(sf_dir: str):
    """zlib compression-ratio quality gate (rows-only: DEFLATE is
    deterministic but not SQL-expressible; the pytest oracle recomputes
    zlib directly)."""
    from smqtk_indexing_ray.pipelines.analysis import compression_signals
    return compression_signals(_docs(sf_dir))


def _q_sentence_stats(sf_dir: str):
    """C4-style terminal-punctuation / line gates — batch-local, every
    float an exact int64 ratio (synthetic sf text has no punctuation, so
    the sf oracle is structural; the punctuation-rich pytest oracle in
    tests/test_analysis.py carries the behavioral check)."""
    from smqtk_indexing_ray.pipelines.analysis import sentence_stats
    return sentence_stats(_docs(sf_dir))


def _q_funnel(sf_dir: str):
    """Per-user ordered conversion funnel (view -> click -> purchase),
    greedy earliest chain with strict (ts, event_id) ordering — one
    sort + vectorized per-block state machine + O(blocks) carry fold.
    Exact chained-row_number SQL oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import funnel
    return funnel(rd.read_parquet(f"{sf_dir}/events.parquet"),
                  steps=("view", "click", "purchase"))


def _shard_positions(ids_ds, *, n_shards: int = 16):
    """Shared tail of the shard-shuffle queries: LCG draw (decorrelated
    from stratified_sample's multiplier) -> shard -> exact in-shard
    position via the distributed running rank.  ``ids_ds`` must carry a
    non-null int64 ``doc_id`` column; one narrow sort over three int64
    columns, text never moves."""
    import pyarrow as pa
    from smqtk_indexing_ray.stages.topk import top_k_per_group

    schema = pa.schema([("doc_id", pa.int64()), ("shard", pa.int64()),
                        ("draw", pa.int64())])

    def add_draw(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return schema.empty_table()
        import numpy as np
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        draw = (d * 69069 + 1) % 2147483648
        return pa.table({
            "doc_id": t["doc_id"],
            "shard": pa.array((draw % n_shards).astype(np.int64)),
            "draw": pa.array(draw.astype(np.int64)),
        })

    ds = ids_ds.map_batches(add_draw, batch_format="pyarrow")
    ranked = top_k_per_group(ds, group="shard", order="draw",
                             tiebreak="doc_id", k=None, descending=False,
                             schema=schema)

    def project(t: pa.Table) -> pa.Table:
        out = pa.schema([("doc_id", pa.int64()), ("shard", pa.int64()),
                         ("pos", pa.int64())])
        if t.num_rows == 0 or "rank" not in t.column_names:
            return out.empty_table()
        return pa.table({"doc_id": t["doc_id"], "shard": t["shard"],
                         "pos": t["rank"]})

    return ranked.map_batches(project, batch_format="pyarrow")


def _q_shuffle_shards(sf_dir: str):
    """Deterministic training-shard shuffle: every doc gets a seeded
    pseudo-random shard and its exact position within the shard — the
    final write-ordering pass of a training-data pipeline, reproducible
    in SQL."""
    return _shard_positions(_docs(sf_dir).select_columns(["doc_id"]))


def _q_curated_corpus(sf_dir: str):
    """The complete raw-corpus -> training-corpus journey: the
    first-rejecting-gate attribution (lang -> quality -> exact-dup ->
    near-dup) keeps only surviving docs, which then get the
    deterministic shard shuffle — what a production curation run
    writes as its final output manifest.  Exact composite SQL oracle
    (shared CTEs with curation_report)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from smqtk_indexing_ray.pipelines.analysis import curation_report

    rep = curation_report(_docs(sf_dir))
    ids_schema = pa.schema([("doc_id", pa.int64())])

    def kept_ids(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "reason" not in t.column_names:
            return ids_schema.empty_table()
        return t.filter(pc.equal(t["reason"], "kept")).select(["doc_id"])

    return _shard_positions(
        rep.map_batches(kept_ids, batch_format="pyarrow"))


def _q_rolling_user_stats(sf_dir: str):
    """Bounded rolling window (ROWS BETWEEN 3 PRECEDING AND CURRENT
    ROW) per user — exact SQL oracle (int64 count + comparison-only
    float max)."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import rolling_user_stats
    return rolling_user_stats(
        rd.read_parquet(f"{sf_dir}/events.parquet"), k=3)


def _q_length_percent_ranks(sf_dir: str):
    """Per-language relative length position of every doc (distributed
    percent_rank + cume_dist windows) — exact SQL oracle: both outputs
    are int64 divisions, bit-exact by construction."""
    import pyarrow as pa
    import ray.data as rd
    from smqtk_indexing_ray.stages.topk import percent_rank_per_group

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"])
    scored = percent_rank_per_group(
        docs, group="lang", order="n_chars", tiebreak="doc_id",
        descending=False,
        schema=pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                          ("n_chars", pa.int64())]))

    def project(t: pa.Table) -> pa.Table:
        out = pa.schema([("doc_id", pa.int64()),
                         ("pct_rank", pa.float64()),
                         ("cume_dist", pa.float64())])
        if t.num_rows == 0 or "pct_rank" not in t.column_names:
            return out.empty_table()
        return t.select(["doc_id", "pct_rank", "cume_dist"])

    return scored.map_batches(project, batch_format="pyarrow")


def _q_user_event_gaps(sf_dir: str):
    """Per-user inter-arrival gaps (distributed LAG window) — exact
    SQL oracle with the repo-wide -1 first-event sentinel."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import user_event_gaps
    return user_event_gaps(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_peak_concurrency(sf_dir: str):
    """Global peak simultaneously-active sessions via the sweep-line
    boundary counter on the distributed prefix sum — never a range
    self-join, only 2 x n_sessions boundary rows sort.  Exact
    running-sum oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import peak_concurrency
    return peak_concurrency(
        rd.read_parquet(f"{sf_dir}/events.parquet"), gap_minutes=30)


def _q_events_profile(sf_dir: str):
    """Per-column data-quality profile of the events table (the
    DESCRIBE audit): exact null/DISTINCT counts + numeric min/max;
    batch-distinct lanes, never rows, across the shuffle.  Exact
    oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.analysis import table_profile
    return table_profile(
        rd.read_parquet(f"{sf_dir}/events.parquet"),
        int_cols=("event_id", "user_id"), float_cols=("value",),
        ts_cols=("ts",), str_cols=("event_type", "props"))


def _q_event_dedup(sf_dir: str):
    """Windowed event dedup (the at-least-once-ingest repair pass):
    duplicate = same (user, type) within the window before it; LAG
    semantics in one sorted pass with a single-row boundary carry.
    Exact SQL window oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import event_dedup
    return event_dedup(rd.read_parquet(f"{sf_dir}/events.parquet"),
                       window_s=300)


def _q_props_field_stats(sf_dir: str):
    """Per-event-type stats of the integer JSON field ``k`` inside
    ``props`` — the vectorized JSON scalar-fn surface (polars Rust
    parser per batch, bounded-cell partial agg). Exact oracle: ints
    plus one int64/int64 IEEE ratio."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import props_field_stats
    return props_field_stats(
        rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_user_first_last(sf_dir: str):
    """Per-user first/last event (ordered grouped arg-extremes =
    first_value/last_value windows) + activity span — exact SQL
    oracle (int64 timestamps, int-difference span division)."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import user_first_last
    return user_first_last(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_event_seq(sf_dir: str):
    """Running per-user sequence numbers over the event stream (a
    distributed row_number window) — exact SQL oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from smqtk_indexing_ray.stages.topk import top_k_per_group

    ev = rd.read_parquet(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "ts", "event_id"])
    schema = pa.schema([("user_id", pa.int64()),
                        ("ts_us", pa.int64()), ("event_id", pa.int64())])

    def to_us(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        return pa.table({"user_id": t["user_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "event_id": t["event_id"]})

    out = top_k_per_group(
        ev.map_batches(to_us, batch_format="pyarrow"), group="user_id",
        order="ts_us", tiebreak="event_id", k=None, descending=False,
        schema=schema)

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return pa.schema([("event_id", pa.int64()),
                              ("seq", pa.int64())]).empty_table()
        return pa.table({"event_id": t["event_id"],
                         "seq": pc.cast(t["rank"], pa.int64())})

    return out.map_batches(slim, batch_format="pyarrow")


def _q_window_agg(sf_dir: str):
    """Tumbling 1-hour window per-event-type aggregate (in-batch Arrow
    pre-aggregation -> tiny shuffle) — exact SQL oracle (count/min/max
    are order-independent, no float rounding needed)."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import window_agg
    return window_agg(rd.read_parquet(f"{sf_dir}/events.parquet"),
                      window_minutes=60)


def _q_hopping_window_counts(sf_dir: str):
    """Sliding (hopping) window event counts — 60-minute windows on
    30-minute hops; in-batch explode + pre-aggregation — exact SQL
    oracle via per-row generate_series."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import hopping_window_counts
    return hopping_window_counts(
        rd.read_parquet(f"{sf_dir}/events.parquet"),
        window_minutes=60, hop_minutes=30)


def _q_trailing_active_users(sf_dir: str):
    """Trailing 7-day distinct users per day (the WAU dashboard
    metric): bounded x7 expansion of per-batch-deduped (day, user)
    pairs, two-level exact distinct on the sorted-agg path — no range
    self-join.  Exact SQL oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import trailing_active_users
    return trailing_active_users(
        rd.read_parquet(f"{sf_dir}/events.parquet"), window_days=7)


def _q_window_user_counts(sf_dir: str):
    """Exact distinct users per tumbling window (two-level distinct with
    in-batch pre-dedup) — exact SQL oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import window_user_counts
    return window_user_counts(rd.read_parquet(f"{sf_dir}/events.parquet"),
                              window_minutes=60)


def _q_hourly_activity(sf_dir: str):
    """Hour-of-day seasonality per event type: 24 x |types| batch
    partials into one tiny sorted sum; shares are exact int64 ratios."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import hourly_activity
    return hourly_activity(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_event_transitions(sf_dir: str):
    """First-order Markov event-type transition counts per user stream:
    one distributed LAG + event-type-squared batch partials into a tiny
    sorted sum."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import event_transitions
    return event_transitions(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_peak_event_rate(sf_dir: str):
    """Per-user burst ceiling: RANGE-window counts reduced by a sorted
    grouped max over users-not-events partials."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import peak_event_rate
    return peak_event_rate(rd.read_parquet(f"{sf_dir}/events.parquet"),
                           window_minutes=60)


def _q_user_session_stats(sf_dir: str):
    """Per-user session rollup on top of sessionize: count, total
    events, exact-ratio mean events/session, longest span."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import user_session_stats
    return user_session_stats(
        rd.read_parquet(f"{sf_dir}/events.parquet"), gap_minutes=30)


def _q_funnel_latency(sf_dir: str):
    """Conversion-latency quantiles over fully-converted funnel users:
    the distributed funnel state machine + the exact quantile stage."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import funnel_latency
    return funnel_latency(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_trailing_event_counts(sf_dir: str):
    """RANGE-window trailing per-user event count (24 h): per-(user,ts)
    multiplicities -> exact prefix cum counts -> ONE backward as-of join
    resolving +/- signed probes -> per-event signed sum.  No range
    self-join; every intermediate integer-exact."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import trailing_event_counts
    return trailing_event_counts(
        rd.read_parquet(f"{sf_dir}/events.parquet"), window_minutes=1440)


def _q_asof_join(sf_dir: str):
    """As-of join: attach each event's latest checkpoint event (every
    10th event_id) at or before its timestamp, per user — exact DuckDB
    ASOF JOIN oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Max
    from smqtk_indexing_ray.stages._util import drop_empty_blocks
    from smqtk_indexing_ray.stages.asof import asof_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "ts", "user_id"])

    def cks_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("event_id", pa.int64()),
                              ("ts", pa.timestamp("us")),
                              ("user_id", pa.int64())]).empty_table()
        import numpy as np
        e = t["event_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(e % 10 == 0))

    # right side: one checkpoint per (user, ts) — max event_id — so the
    # as-of match is unique and the oracle is tie-free
    cks = ev.map_batches(cks_only, batch_format="pyarrow").groupby(
        ["user_id", "ts"]).aggregate(Max("event_id", alias_name="ck_id"))
    cks = drop_empty_blocks(cks, pa.schema([
        ("user_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("ck_id", pa.int64())]))

    out = asof_join(
        ev, cks, key="user_id", ts="ts", payload_cols=["ck_id"],
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("ts", pa.timestamp("us")),
                               ("user_id", pa.int64())]),
        right_schema=pa.schema([("user_id", pa.int64()),
                                ("ts", pa.timestamp("us")),
                                ("ck_id", pa.int64())]))

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return pa.schema([("event_id", pa.int64()),
                              ("ck_id", pa.int64())]).empty_table()
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "ck_id": pc.fill_null(pc.cast(t["ck_id"], pa.int64()), -1),
        })

    return out.map_batches(slim, batch_format="pyarrow")


def _q_session_join(sf_dir: str):
    """Interval (range) join: attach each event's session window — the
    disjoint-interval reduction to as-of join, with an exact SQL BETWEEN
    join oracle over the session windows."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import sessionize
    from smqtk_indexing_ray.stages.asof import interval_join

    ev_path = f"{sf_dir}/events.parquet"
    ev = rd.read_parquet(ev_path).select_columns(
        ["event_id", "ts", "user_id"])

    def to_us(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("event_id", pa.int64()),
                              ("ts_us", pa.int64()),
                              ("user_id", pa.int64())]).empty_table()
        return pa.table({"event_id": t["event_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "user_id": t["user_id"]})

    points = ev.map_batches(to_us, batch_format="pyarrow")
    sess = sessionize(rd.read_parquet(ev_path), gap_minutes=30
                      ).select_columns(["user_id", "session_key",
                                        "t_start_us", "t_end_us"])
    out = interval_join(
        points, sess, key="user_id", ts="ts_us",
        lo="t_start_us", hi="t_end_us", payload_cols=["session_key"],
        points_schema=pa.schema([("event_id", pa.int64()),
                                 ("ts_us", pa.int64()),
                                 ("user_id", pa.int64())]),
        intervals_schema=pa.schema([("user_id", pa.int64()),
                                    ("session_key", pa.int64()),
                                    ("t_start_us", pa.int64()),
                                    ("t_end_us", pa.int64())]))

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return pa.schema([("event_id", pa.int64()),
                              ("session_key", pa.int64())]).empty_table()
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "session_key": pc.fill_null(
                pc.cast(t["session_key"], pa.int64()), -1),
        })

    return out.map_batches(slim, batch_format="pyarrow")


def _q_sessionize(sf_dir: str):
    """Session windows over the events stream table (sort + segmented
    kernel + cross-block stitch) — exact SQL window-function oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import sessionize
    return sessionize(rd.read_parquet(f"{sf_dir}/events.parquet"),
                      gap_minutes=30)


def _q_euclidean_topk(sf_dir: str):
    from smqtk_indexing_ray.pipelines.ann import euclidean_topk
    return euclidean_topk(_emb(sf_dir), n_queries=16, k=10)


def _q_filtered_ann_topk(sf_dir: str):
    """Metadata-filtered exact cosine top-k (vector-DB filtered
    search): same broadcast-query shape as ann_topk, label mask applied
    inside the scoring kernel — no pre-shuffle."""
    from smqtk_indexing_ray.pipelines.ann import filtered_ann_topk
    return filtered_ann_topk(_emb(sf_dir), n_queries=16, k=10)


def _q_best_rep_per_cluster(sf_dir: str):
    """Quality-aware dedup representative: per normalized cluster keep
    the member with max n_chars (tie min doc_id) via one sorted
    arg-extreme aggregation."""
    from smqtk_indexing_ray.pipelines.analysis import best_rep_per_cluster
    return best_rep_per_cluster(_docs(sf_dir))


def _q_quantize_embeddings(sf_dir: str):
    """Per-dim min/max scalar quantization to uint8 codes (the 4x
    vector-compression stage): bounded (dim, min, max) partial reduce +
    one broadcast coding pass; code sum/min/max exact int64, max
    reconstruction error order-identical to the SQL float expression
    then round6."""
    from smqtk_indexing_ray.pipelines.ann import quantize_embeddings
    return quantize_embeddings(_emb(sf_dir))


def _q_kmeans_assign(sf_dir: str):
    """Hard k-means assignment over exactly-quantized embeddings (the
    IVF/PQ codebook-assignment step): deterministic lowest-id seeds,
    broadcast (k, d) int64 centroid matrix, exact int64 squared-L2 per
    batch — argmin cannot flip on float order.  Exact oracle."""
    from smqtk_indexing_ray.pipelines.ann import kmeans_assign
    return kmeans_assign(_emb(sf_dir), n_clusters=8)


def _q_kmeans_update(sf_dir: str):
    """One Lloyd centroid-update step: per-(cluster, dim) exact int64
    code sums over counts, combiner-shaped k x d partials — the
    shuffle carries codebook-sized rows, never vectors.  Exact
    oracle."""
    from smqtk_indexing_ray.pipelines.ann import kmeans_update
    return kmeans_update(_emb(sf_dir), n_clusters=8)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means-bucketed embedding
    near-dup pruning — within each bucket, drop every vector with a
    lower-vec_id neighbor at quantized squared-L2 <= tau.  All-integer
    arithmetic on the shared uint8 quantization, so assignment AND the
    tau compare are bit-exact vs the SQL EXISTS twin."""
    from smqtk_indexing_ray.pipelines.ann import semantic_dedup
    return semantic_dedup(_emb(sf_dir), n_clusters=8, tau=150_000)


def _q_label_scatter(sf_dir: str):
    """Per-label per-dim scatter of the quantized embedding space (the
    class-separability audit): exact int64 sum/sum-of-squares partials,
    computational-formula variance as one IEEE division.  Exact
    oracle."""
    from smqtk_indexing_ray.pipelines.ann import label_scatter
    return label_scatter(_emb(sf_dir))


def _q_kmeans_fit(sf_dir: str):
    """Full iterative Lloyd k-means (the iterative-fixpoint class —
    not window-expressible, hence rows-only): one streaming
    assign+partial-sum pass per round, fsum-deterministic driver fold;
    pytest pins monotone inertia, determinism and the fixpoint."""
    from smqtk_indexing_ray.pipelines.ann import kmeans_fit
    return kmeans_fit(_emb(sf_dir), n_clusters=8, max_iters=15)


def _q_ivf_topk(sf_dir: str):
    """IVF-list approximate top-k (FAISS-IVF analog; recall-vs-brute-force
    asserted in tests) — rows-only."""
    from smqtk_indexing_ray.pipelines.ann import ivf_topk
    return ivf_topk(_emb(sf_dir), n_queries=8, k=10, n_lists=16, n_probe=8)


def _q_mrpt_topk(sf_dir: str):
    """MRPT median-split multi-tree approximate top-k (the reference's
    value-balanced partitioning, mrpt.py:289-362; recall asserted in
    tests) — rows-only."""
    from smqtk_indexing_ray.pipelines.ann import mrpt_topk
    return mrpt_topk(_emb(sf_dir), n_queries=8, k=10, n_trees=8, depth=4)


def _q_media_dedup(sf_dir: str):
    """Exact multimodal payload dedup per kind: 128-bit content hashes
    (payload bytes never shuffle), one group-min attach + one
    run-length sort.  Exact window oracle."""
    from smqtk_indexing_ray.stages.multimodal import (
        media_dedup, media_from_documents)
    return media_dedup(media_from_documents(_docs(sf_dir)))


def _q_itq_codes(sf_dir: str):
    """ITQ trained functor (reference's flagship LshFunctor): distributed
    mean/covariance fit + driver-side rotation, batched code emission.
    Deterministic (seeded) but eigen-decomposition-based — rows-only."""
    from smqtk_indexing_ray.functions.itq import itq_codes, itq_fit
    emb = _emb(sf_dir)
    model = itq_fit(emb, bit_length=32, seed=42)
    return itq_codes(emb, model)


def _q_repetition_signals(sf_dir: str):
    """Gopher-style within-doc repetition signals (batch-local, no
    shuffle); distinct counting via Arrow dictionary codes so parity
    with count(distinct ...) is string-exact."""
    from smqtk_indexing_ray.pipelines.terms import repetition_signals
    return repetition_signals(_docs(sf_dir))


def _q_token_entropy(sf_dir: str):
    """Per-doc Shannon entropy of the token distribution (the
    gibberish/template diversity gate): batch-local lexsort runs, no
    shuffle; entropy through round6, counts exact int64."""
    from smqtk_indexing_ray.pipelines.terms import token_entropy
    return token_entropy(_docs(sf_dir))


def _q_posting_lists(sf_dir: str):
    """Inverted-index shard build: per term, exact df + the first
    max_postings doc_ids comma-joined — per-batch lossless k-prune,
    ranked global cap, ordered concat agg; the token stream never
    crosses a shuffle.  Exact string_agg oracle."""
    from smqtk_indexing_ray.pipelines.terms import posting_lists
    return posting_lists(_docs(sf_dir), max_postings=16)


def _q_dup_ngram_chars(sf_dir: str):
    """Gopher-style duplicate-n-gram character fractions (n=2,3,4):
    the within-doc repetition gate unigram signals miss.  Batch-local
    dictionary-coded n-gram runs, exact int-ratio fractions.  Exact
    oracle."""
    from smqtk_indexing_ray.pipelines.terms import dup_ngram_chars
    return dup_ngram_chars(_docs(sf_dir))


def _q_term_frequencies(sf_dir: str):
    """Corpus-wide term frequency + document frequency via the
    partial-aggregate combiner shape (vocabulary-sized shuffle)."""
    from smqtk_indexing_ray.pipelines.terms import term_frequencies
    return term_frequencies(_docs(sf_dir))


def _q_tfidf_top_terms(sf_dir: str):
    """Per-doc top-3 terms by tf*N/df (ln-free tf-idf; score exactly
    CAST(tf*N AS DOUBLE)/df on both sides), term-ascending tiebreak."""
    from smqtk_indexing_ray.pipelines.terms import tfidf_top_terms
    return tfidf_top_terms(_docs(sf_dir), k=3)


def _q_top_terms_per_lang(sf_dir: str):
    """Per-language top-10 terms (cnt DESC, term ASC): vocabulary-sized
    partials -> one sorted sum -> the distributed per-group rank stage."""
    from smqtk_indexing_ray.pipelines.terms import top_terms_per_lang
    return top_terms_per_lang(_docs(sf_dir), k=10)


def _q_length_zscores(sf_dir: str):
    """Per-language n_chars z-scores: exact arbitrary-precision integer
    moments folded on the driver, broadcast scoring pass, float ops
    order-identical to the SQL form then round6."""
    from smqtk_indexing_ray.pipelines.analysis import length_zscores
    return length_zscores(_docs(sf_dir))


_BM25_QUERY = "spark window batch stream"


def _q_bm25_topk(sf_dir: str):
    """BM25 retrieval top-20 for a fixed seed query: bounded
    (df, N, avgdl) partial reduce, broadcast scoring pass with
    per-batch candidate cut on the final (round6(score) DESC, doc_id)
    ordering, k x n_batches exact merge."""
    from smqtk_indexing_ray.pipelines.terms import bm25_topk
    return bm25_topk(_docs(sf_dir), _BM25_QUERY, k=20)


def _q_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary growth over power-of-two doc prefixes: one
    sorted grouped min of per-term first occurrence + 21-bucket partial
    histograms folded on the driver; all int64-exact."""
    from smqtk_indexing_ray.pipelines.terms import vocab_growth
    return vocab_growth(_docs(sf_dir))


def _q_strided_windows(sf_dir: str):
    """Strided pretraining context-window plan (window=128, stride=64):
    batch-local grouped-arange expansion, ~tokens/stride output rows,
    exact generate_series oracle."""
    from smqtk_indexing_ray.pipelines.terms import strided_windows
    return strided_windows(_docs(sf_dir), window=128, stride=64)


def _q_count_min_freqs(sf_dir: str):
    """Count-Min sketch calibration report over fixed probe terms
    (rows-only: hash-seeded estimates; pytest pins the never-undercount
    guarantee and exactness at clearing width)."""
    from smqtk_indexing_ray.pipelines.terms import count_min_freqs
    return count_min_freqs(
        _docs(sf_dir),
        ["the", "batch", "stream", "spark", "window", "nonexistentterm"])


def _q_source_vocab_overlap(sf_dir: str):
    """Pairwise vocabulary Jaccard between sources: batch-distinct
    (term, source) partials -> one vocabulary-sized sorted distinct ->
    join-free per-term source pairs (runs <= #sources) -> pair-count
    sort; the final #sources**2-bounded assembly is driver-side."""
    from smqtk_indexing_ray.pipelines.terms import source_vocab_overlap
    return source_vocab_overlap(_docs(sf_dir))


def _q_token_chunks(sf_dir: str):
    """Fixed-token-budget shard assignment (budget=512): exact global
    running token total in doc_id order via the O(blocks)
    boundary-carry prefix sum — a narrow two-int64-column sort, text
    never crosses the shuffle."""
    from smqtk_indexing_ray.pipelines.terms import token_chunks
    return token_chunks(_docs(sf_dir), budget=512)


def _q_heavy_hitters(sf_dir: str):
    """Exact heavy hitters (terms at >= 1 per 500 tokens corpus-wide)
    via the two-pass candidate-then-verify sketch: Misra-Gries
    pigeonhole candidates, broadcast, exact verify — the vocabulary
    long tail never crosses a shuffle."""
    from smqtk_indexing_ray.pipelines.terms import heavy_hitters
    return heavy_hitters(_docs(sf_dir), one_in=500)


def _q_vocab_stats(sf_dir: str):
    """Exact one-row vocabulary summary (distinct terms, total tokens,
    hapax legomena) folded from the term-frequency shuffle."""
    from smqtk_indexing_ray.pipelines.terms import vocab_stats
    return vocab_stats(_docs(sf_dir))


def _q_distinct_terms_hll(sf_dir: str):
    """HyperLogLog distinct-term estimate (p=14, ~0.8% standard error):
    the bounded-memory scale twin of vocab_stats — <= 2^14 register
    rows per batch cross the shuffle regardless of vocabulary size.
    No SQL oracle (approximate); pytest pins accuracy vs exact counts."""
    from smqtk_indexing_ray.pipelines.terms import distinct_terms_hll
    return distinct_terms_hll(_docs(sf_dir))


def _q_top_bigrams(sf_dir: str):
    """Corpus-wide top-k bigram collocations with exact lift scores
    (PMI without the log — int64-product-exact float parity).  Bigram
    counts ride the term_frequencies combiner shape; per-block top-k
    pruning bounds the final sort at k x blocks rows."""
    from smqtk_indexing_ray.pipelines.terms import top_bigrams
    return top_bigrams(_docs(sf_dir), k=100, min_count=2)


def _q_line_dedup(sf_dir: str):
    """CCNet-style corpus-wide duplicated-line scrub (min_df=2): hot
    128-bit line hashes broadcast once, rebuild is one Arrow
    binary_join per batch."""
    from smqtk_indexing_ray.pipelines.terms import line_dedup
    return line_dedup(_docs(sf_dir), min_df=2)


def _q_paragraph_dedup(sf_dir: str):
    """C4-style keep-first paragraph dedup: 10-word paragraphs, first
    global occurrence (by doc_id, position) survives, docs rebuilt from
    survivors; exact oracle = unnest + row_number + string_agg."""
    from smqtk_indexing_ray.pipelines.terms import paragraph_dedup
    return paragraph_dedup(_docs(sf_dir), words_per_para=10)


def _q_novel_docs(sf_dir: str):
    """Incremental ingest dedup: odd doc_ids are the 'new batch', even
    doc_ids the existing corpus; keep new docs whose exact text is not
    in the corpus (hash-only left_anti join)."""
    import pyarrow.compute as pc
    from smqtk_indexing_ray.pipelines.terms import novel_docs

    def odd(t):
        return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1))

    def even(t):
        return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0))

    new_side = _docs(sf_dir).map_batches(odd, batch_format="pyarrow")
    corpus = _docs(sf_dir).map_batches(even, batch_format="pyarrow")
    return novel_docs(new_side, corpus)


_SCRUB_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("boiler", r"\b(?:the|spark)\b", "[B]"),
)


def _q_pattern_scrub(sf_dir: str):
    """PII + boilerplate redaction: chained RE2 count+replace per
    pattern (both Arrow and DuckDB compile RE2, so the oracle is exact
    on the chained output)."""
    from smqtk_indexing_ray.pipelines.scrub import pattern_scrub
    return pattern_scrub(_docs(sf_dir), patterns=_SCRUB_PATTERNS)


def _q_semantic_contamination(sf_dir: str):
    """Embedding-space leakage scan: per odd vec_id (eval) the top-3
    even vec_ids (train) by exact cosine — broadcast eval matrix,
    streaming train side.  Exact window oracle (same float discipline
    as ann_topk)."""
    from smqtk_indexing_ray.pipelines.ann import semantic_contamination
    return semantic_contamination(_emb(sf_dir), k=3)


def _q_label_centroids(sf_dir: str):
    """Per-label mean embeddings (class prototypes), dim-exploded;
    combiner-shaped partial sums so the shuffle carries labels, not
    vectors.  Exact aggregate oracle via round6."""
    from smqtk_indexing_ray.pipelines.ann import label_centroids
    return label_centroids(_emb(sf_dir))


def _q_knn_classify(sf_dir: str):
    """Majority-vote k-NN classification of the odd split by the even
    (labeled) split — broadcast train matrix, streaming corpus, no
    shuffle.  Exact oracle: the vote is integral once the top-k sets
    match, and they ride the same ranking as ann_topk."""
    from smqtk_indexing_ray.pipelines.ann import knn_classify
    return knn_classify(_emb(sf_dir), k=5)


def _q_corpus_diff(sf_dir: str):
    """Two-snapshot corpus diff (added/removed/changed/unchanged) over
    a deterministic SQL-expressible mutation of documents: drop
    doc_id%7==0, append ' v2' to text where doc_id%5==0, add re-keyed
    copies of doc_id%13==0 at +1e9.  Join-free: one narrow sort over
    (doc_id, side, 128-bit text hash); exact oracle = FULL OUTER JOIN."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from smqtk_indexing_ray.pipelines.analysis import corpus_diff

    def mutate(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % 7 != 0
        base = t.filter(pa.array(keep))
        bids = base["doc_id"].to_numpy(zero_copy_only=False)
        txt = pc.if_else(pa.array(bids % 5 == 0),
                         pc.binary_join_element_wise(
                             base["text"], " v2", ""),
                         base["text"])
        out = pa.table({"doc_id": base["doc_id"], "text": txt})
        addm = ids % 13 == 0
        added = pa.table({
            "doc_id": pa.array(ids[addm] + 1_000_000_000),
            "text": t.filter(pa.array(addm))["text"],
        })
        return pa.concat_tables([out, added])

    new = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        mutate, batch_format="pyarrow")
    return corpus_diff(_docs(sf_dir), new)


def _q_top_customer_revenue(sf_dir: str):
    """Classic warehouse rollup over the relational tables: lineitem ->
    order -> customer revenue, top-10 per market segment — the general
    join/aggregate path on fact/dimension data.  Exact window oracle
    (round6 revenue, full-precision ordering)."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import top_customer_revenue
    return top_customer_revenue(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
        rd.read_parquet(f"{sf_dir}/customer.parquet"), k=10)


def _q_shipping_priority(sf_dir: str):
    """TPC-H-Q3-shaped backlog: top-10 highest-revenue orders placed
    before the cutoff with lineitems shipping after it — filters pushed
    into the partial kernels, exact int64 revenue units, k x n_batches
    driver merge."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import shipping_priority
    return shipping_priority(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"), k=10)


def _q_large_orders(sf_dir: str):
    """TPC-H-Q18-shaped HAVING semi-join: orders whose total lineitem
    quantity exceeds the threshold, joined out to their customer,
    top-k by exact int64 price cents.  The HAVING cut runs on the
    per-order aggregate BEFORE any join.  Exact window oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import large_orders
    return large_orders(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
        rd.read_parquet(f"{sf_dir}/customer.parquet"),
        min_qty=300, k=100)


def _q_dormant_customers(sf_dir: str):
    """TPC-H-Q22-shaped anti-join + broadcast scalar subquery: per
    nation, above-average-balance customers with no recent order.  The
    avg comparison is the exact integer cross product
    ``cents * n_pos > sum_cents`` on both sides.  Exact oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import dormant_customers
    return dormant_customers(
        rd.read_parquet(f"{sf_dir}/customer.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
        rd.read_parquet(f"{sf_dir}/nation.parquet"),
        cutoff="2000-01-01")


def _q_brand_supplier_counts(sf_dir: str):
    """TPC-H-Q16-shaped count-distinct-after-join: distinct suppliers
    per (p_brand, p_size) via two-level sorted distinct passes — never
    a hash distinct aggregate.  Exact int64 oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import (
        brand_supplier_counts)
    return brand_supplier_counts(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        rd.read_parquet(f"{sf_dir}/part.parquet"))


def _q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped pricing summary: per (returnflag, linestatus)
    totals/averages over shipped lineitems.  The extreme combiner
    shape — each batch pre-reduces to <=6 partial rows.  Exact oracle:
    int64 unit sums, int-over-int IEEE-division averages."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import pricing_summary
    return pricing_summary(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"))


def _q_order_priority_counts(sf_dir: str):
    """TPC-H-Q4-shaped EXISTS semi-join done join-free: per-order max
    shipdate aggregate + sort-merge attach + vectorized late filter.
    Exact int64 oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import (
        order_priority_counts)
    return order_priority_counts(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"))


def _q_supplier_nation_volume(sf_dir: str):
    """Broadcast-dimension join: supplier->nation->region chain composed
    driver-side, ray.put once, looked up per batch — revenue volume per
    (region, nation).  Exact oracle (round6 revenue, int64 counts)."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import (
        supplier_nation_volume)
    return supplier_nation_volume(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        rd.read_parquet(f"{sf_dir}/supplier.parquet"),
        rd.read_parquet(f"{sf_dir}/nation.parquet"),
        rd.read_parquet(f"{sf_dir}/region.parquet"))


def _q_local_supplier_volume(sf_dir: str):
    """TPC-H-Q5-shaped six-table join chain: revenue per nation where
    supplier and customer share a nation in one region over one order
    year — dimension chain broadcast, fact-fact joins via sort-merge
    attach, per-batch (order, nation) pre-reduction.  Exact oracle
    (int64-unit revenue, int64 counts)."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import (
        local_supplier_volume)
    return local_supplier_volume(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
        rd.read_parquet(f"{sf_dir}/customer.parquet"),
        rd.read_parquet(f"{sf_dir}/supplier.parquet"),
        rd.read_parquet(f"{sf_dir}/nation.parquet"),
        rd.read_parquet(f"{sf_dir}/region.parquet"),
        r_name="ASIA", start="1996-01-01", end="1997-01-01")


def _q_promo_revenue_share(sf_dir: str):
    """TPC-H-Q14-shaped promo revenue share: broadcast promo partkeys
    (sorted int64 array, ray.put once, searchsorted per batch), one
    partial row per batch; exact int64 units, one 100.0*p/u division."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import promo_revenue_share
    return promo_revenue_share(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        rd.read_parquet(f"{sf_dir}/part.parquet"))


def _q_customer_order_distribution(sf_dir: str):
    """TPC-H-Q13-shaped order-count histogram incl. zero-order
    customers: groupby-of-groupby with a left attach re-entering the
    dimension table; exact int64 oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.warehouse import (
        customer_order_distribution)
    return customer_order_distribution(
        rd.read_parquet(f"{sf_dir}/orders.parquet"),
        rd.read_parquet(f"{sf_dir}/customer.parquet"))


def _q_dominant_source_per_lang(sf_dir: str):
    """Mode per group: the source contributing the most docs per lang
    (ties by source asc) via cell-level partials + per-group top-1."""
    from smqtk_indexing_ray.pipelines.analysis import (
        dominant_source_per_lang)
    return dominant_source_per_lang(_docs(sf_dir))


def _q_cohort_retention(sf_dir: str):
    """Cohort retention matrix over the events stream: first-seen-day
    cohorts x activity days, exact distinct users + int-ratio
    retention.  Exact SQL oracle."""
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import cohort_retention
    return cohort_retention(rd.read_parquet(f"{sf_dir}/events.parquet"))


def _q_embedding_cluster_labels(sf_dir: str):
    """SemDeDup-style semantic near-dup clusters: cosine >= 0.4 pairs ->
    connected components -> min-vec_id labels; singletons self-label."""
    from smqtk_indexing_ray.pipelines.ann import embedding_cluster_labels
    return embedding_cluster_labels(_emb(sf_dir), threshold=0.4)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "exact_dedup": _q_exact_dedup,
        "cross_source_dups": _q_cross_source_dups,
        "exact_cluster_labels": _q_exact_cluster_labels,
        "exact_cluster_sizes": _q_exact_cluster_sizes,
        "normalized_dedup": _q_normalized_dedup,
        "decile_dup_rates": _q_decile_dup_rates,
        "mixture_plan": _q_mixture_plan,
        "token_stats": _q_token_stats,
        "token_counts": _q_token_counts,
        "token_quantiles": _q_token_quantiles,
        "group_quantiles": _q_group_quantiles,
        "approx_length_quantiles": _q_approx_length_quantiles,
        "quality_buckets": _q_quality_buckets,
        "length_outliers": _q_length_outliers,
        "length_pareto": _q_length_pareto,
        "dedup_tier_summary": _q_dedup_tier_summary,
        "cluster_size_histogram": _q_cluster_size_histogram,
        "curation_report": _q_curation_report,
        "corpus_rollup": _q_corpus_rollup,
        "trimmed_length_mean": _q_trimmed_length_mean,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "stratified_sample": _q_stratified_sample,
        "contamination": _q_contamination,
        "bloom_contamination": _q_bloom_contamination,
        "lang_summary": _q_lang_summary,
        "source_dup_stats": _q_source_dup_stats,
        "length_histogram": _q_length_histogram,
        "doc_commonness": _q_doc_commonness,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "ppjoin_pairs": _q_ppjoin_pairs,
        "jaccard_cluster_labels": _q_jaccard_cluster_labels,
        "dup_triangles": _q_dup_triangles,
        "minhash_containment": _q_minhash_containment,
        "source_pair_matrix": _q_source_pair_matrix,
        "clustering_coefficients": _q_clustering_coefficients,
        "cosine_near_pairs": _q_cosine_near_pairs,
        "ann_topk": _q_ann_topk,
        "lsh_dedup": _q_lsh_dedup,
        "simhash_near_pairs": _q_simhash_near_pairs,
        "doc_fingerprints": _q_doc_fingerprints,
        "cdc_chunk_stats": _q_cdc_chunk_stats,
        "dsir_weights": _q_dsir_weights,
        "lang_id": _q_lang_id,
        "hamming_topk": _q_hamming_topk,
        "hamming_topk_wide": _q_hamming_topk_wide,
        "srp_near_pairs": _q_srp_near_pairs,
        "substring_containment": _q_substring_containment,
        "cluster_containment": _q_cluster_containment,
        "cluster_dup_spans": _q_cluster_dup_spans,
        "cdc_fixed_cut_stats": _q_cdc_fixed_cut_stats,
        "lsh_exact_group_consistency": _q_lsh_exact_group_consistency,
        "dup_span_stats": _q_dup_span_stats,
        "dup_span_scrub": _q_dup_span_scrub,
        "media_features": _q_media_features,
        "media_dedup": _q_media_dedup,
        "itq_codes": _q_itq_codes,
        "ivf_topk": _q_ivf_topk,
        "mrpt_topk": _q_mrpt_topk,
        "euclidean_topk": _q_euclidean_topk,
        "quantize_embeddings": _q_quantize_embeddings,
        "kmeans_assign": _q_kmeans_assign,
        "kmeans_update": _q_kmeans_update,
        "kmeans_fit": _q_kmeans_fit,
        "semantic_dedup": _q_semantic_dedup,
        "label_scatter": _q_label_scatter,
        "filtered_ann_topk": _q_filtered_ann_topk,
        "best_rep_per_cluster": _q_best_rep_per_cluster,
        "sessionize": _q_sessionize,
        "session_join": _q_session_join,
        "asof_join": _q_asof_join,
        "window_agg": _q_window_agg,
        "window_user_counts": _q_window_user_counts,
        "trailing_active_users": _q_trailing_active_users,
        "trailing_event_counts": _q_trailing_event_counts,
        "event_transitions": _q_event_transitions,
        "hourly_activity": _q_hourly_activity,
        "funnel_latency": _q_funnel_latency,
        "peak_event_rate": _q_peak_event_rate,
        "user_session_stats": _q_user_session_stats,
        "hopping_window_counts": _q_hopping_window_counts,
        "event_seq": _q_event_seq,
        "user_event_gaps": _q_user_event_gaps,
        "event_dedup": _q_event_dedup,
        "events_profile": _q_events_profile,
        "peak_concurrency": _q_peak_concurrency,
        "props_field_stats": _q_props_field_stats,
        "user_first_last": _q_user_first_last,
        "length_percent_ranks": _q_length_percent_ranks,
        "rolling_user_stats": _q_rolling_user_stats,
        "shuffle_shards": _q_shuffle_shards,
        "curated_corpus": _q_curated_corpus,
        "funnel": _q_funnel,
        "cohort_retention": _q_cohort_retention,
        "quality_signals": _q_quality_signals,
        "sentence_stats": _q_sentence_stats,
        "compression_signals": _q_compression_signals,
        "pps_sample": _q_pps_sample,
        "cluster_quality_rollup": _q_cluster_quality_rollup,
        "lang_source_matrix": _q_lang_source_matrix,
        "dedup_threshold_sweep": _q_dedup_threshold_sweep,
        "id_integrity_audit": _q_id_integrity_audit,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "repetition_signals": _q_repetition_signals,
        "token_entropy": _q_token_entropy,
        "term_frequencies": _q_term_frequencies,
        "posting_lists": _q_posting_lists,
        "dup_ngram_chars": _q_dup_ngram_chars,
        "source_vocab_overlap": _q_source_vocab_overlap,
        "count_min_freqs": _q_count_min_freqs,
        "strided_windows": _q_strided_windows,
        "vocab_growth": _q_vocab_growth,
        "bm25_topk": _q_bm25_topk,
        "top_terms_per_lang": _q_top_terms_per_lang,
        "length_zscores": _q_length_zscores,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "token_chunks": _q_token_chunks,
        "heavy_hitters": _q_heavy_hitters,
        "vocab_stats": _q_vocab_stats,
        "distinct_terms_hll": _q_distinct_terms_hll,
        "top_bigrams": _q_top_bigrams,
        "line_dedup": _q_line_dedup,
        "paragraph_dedup": _q_paragraph_dedup,
        "novel_docs": _q_novel_docs,
        "pattern_scrub": _q_pattern_scrub,
        "embedding_cluster_labels": _q_embedding_cluster_labels,
        "semantic_contamination": _q_semantic_contamination,
        "knn_classify": _q_knn_classify,
        "corpus_diff": _q_corpus_diff,
        "top_customer_revenue": _q_top_customer_revenue,
        "shipping_priority": _q_shipping_priority,
        "large_orders": _q_large_orders,
        "dormant_customers": _q_dormant_customers,
        "brand_supplier_counts": _q_brand_supplier_counts,
        "pricing_summary": _q_pricing_summary,
        "order_priority_counts": _q_order_priority_counts,
        "supplier_nation_volume": _q_supplier_nation_volume,
        "local_supplier_volume": _q_local_supplier_volume,
        "promo_revenue_share": _q_promo_revenue_share,
        "customer_order_distribution": _q_customer_order_distribution,
        "dominant_source_per_lang": _q_dominant_source_per_lang,
        "label_centroids": _q_label_centroids,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views pre-registered on the same parquet)
# ---------------------------------------------------------------------------

_TOKS = r"""
toks AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
  FROM documents
)
"""

_SHINGLES = r"""
sh AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
      AS shingle
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), shk AS (
  SELECT doc_id, shingle FROM sh
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), jpairs AS (
  SELECT doc_a, doc_b, n_inter,
         CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
)
"""

# shared by curation_report and curated_corpus: the gate CTEs and the
# first-rejecting-gate attribution
# threshold-parameterized clustering branches for dedup_threshold_sweep:
# one shared unfiltered jpairs (the >= 0.0 substitution keeps every
# intersecting pair), then per-threshold edge/reach/label CTEs
_SWEEP_THRESHOLDS = ("0.4", "0.5", "0.7")
_SWEEP_SQL = (
    "WITH RECURSIVE " + _TOKS + ", "
    + _SHINGLES.replace(">= 0.5", ">= 0.0") + ", "
    + ", ".join(
        (
            "e{i} AS ("
            "  SELECT doc_a AS src, doc_b AS dst FROM jpairs"
            "  WHERE jaccard >= {th}"
            "  UNION ALL SELECT doc_b, doc_a FROM jpairs"
            "  WHERE jaccard >= {th}"
            "), r{i}(doc, lab) AS ("
            "  SELECT doc_id, doc_id FROM documents"
            "  UNION"
            "  SELECT e.dst, r.lab FROM r{i} r JOIN e{i} e"
            "  ON e.src = r.doc"
            "), l{i} AS ("
            "  SELECT doc, min(lab) AS lab FROM r{i} GROUP BY doc"
            ")"
        ).format(i=i, th=th)
        for i, th in enumerate(_SWEEP_THRESHOLDS)) + " "
    + " UNION ALL ".join(
        (
            "SELECT CAST({th} AS DOUBLE) AS threshold,"
            " CAST(count(*) FILTER (doc = lab) AS BIGINT) AS n_clusters,"
            " CAST(count(*) FILTER (doc <> lab) AS BIGINT) AS n_dup_docs"
            " FROM l{i}"
        ).format(i=i, th=th)
        for i, th in enumerate(_SWEEP_THRESHOLDS))
)

_CURATION_CTES = (
    "WITH RECURSIVE " + _TOKS + ", " + _SHINGLES + ", "
    "edges AS ("
    "  SELECT doc_a AS src, doc_b AS dst FROM jpairs"
    "  UNION ALL SELECT doc_b, doc_a FROM jpairs"
    "), reach(doc, lab) AS ("
    "  SELECT doc_id, doc_id FROM documents"
    "  UNION"
    "  SELECT e.dst, r.lab FROM reach r JOIN edges e"
    "  ON e.src = r.doc"
    "), jlab AS ("
    "  SELECT doc AS doc_id, min(lab) AS near_cid FROM reach"
    "  GROUP BY doc"
    "), elab AS ("
    "  SELECT doc_id, min(doc_id) OVER (PARTITION BY text)"
    "  AS exact_cid,"
    "  min(doc_id) OVER (PARTITION BY"
    "   lower(regexp_replace(regexp_replace(coalesce(text, ''),"
    "   '\\s+', ' ', 'g'), '^ | $', '', 'g'))) AS norm_cid"
    "  FROM documents"
    "), qual AS ("
    "  SELECT doc_id, len(w) AS nt,"
    "  CAST(list_sum(list_transform(w, x -> length(x)))"
    "  AS DOUBLE) / greatest(len(w), 1) AS mwl FROM toks"
    ")"
)

_CURATION_SELECT = (
    "SELECT d.doc_id, "
    "CASE WHEN d.lang <> 'en' THEN 'lang'"
    " WHEN NOT (q.nt >= 50 AND q.nt <= 100000"
    "  AND q.mwl >= 3.0 AND q.mwl <= 10.0) THEN 'quality'"
    " WHEN e.exact_cid <> d.doc_id THEN 'exact_dup'"
    " WHEN e.norm_cid <> d.doc_id THEN 'norm_dup'"
    " WHEN j.near_cid <> d.doc_id THEN 'near_dup'"
    " ELSE 'kept' END AS reason "
    "FROM documents d "
    "JOIN qual q ON q.doc_id = d.doc_id "
    "JOIN elab e ON e.doc_id = d.doc_id "
    "JOIN jlab j ON j.doc_id = d.doc_id"
)


def oracle_sql() -> dict[str, str]:
    sql = {
        "exact_dedup": (
            "SELECT min(doc_id) AS rep_doc, count(*) AS n_copies "
            "FROM documents GROUP BY text"
        ),
        "cross_source_dups": (
            "WITH g AS ("
            "  SELECT min(doc_id) AS rep_doc, count(*) AS n_copies,"
            "  count(DISTINCT coalesce(source, '')) AS n_sources"
            "  FROM documents GROUP BY text"
            ") "
            "SELECT rep_doc, n_copies, n_sources, "
            "n_sources > 1 AS is_cross_source FROM g"
        ),
        "exact_cluster_labels": (
            "SELECT doc_id, min(doc_id) OVER (PARTITION BY text) "
            "AS cluster_id FROM documents"
        ),
        "cdc_fixed_cut_stats": (
            # mask_bits=63 => the gear mask never fires, cuts land at
            # max_size=64 exactly; empty/null docs are omitted (the
            # pipeline's documented contract)
            "SELECT doc_id,"
            " CAST(ceil(strlen(text) / 64.0) AS BIGINT)"
            " AS n_chunks,"
            " CAST(strlen(text) AS BIGINT) AS total_bytes"
            " FROM documents"
            " WHERE text IS NOT NULL AND strlen(text) > 0"
        ),
        "lsh_exact_group_consistency": (
            # the invariant: a byte-identical group always lands in ONE
            # LSH cluster, so the SQL twin pins n_lsh_clusters to 1
            "SELECT min(doc_id) AS exact_cluster,"
            " count(*) AS n_docs,"
            " CAST(1 AS BIGINT) AS n_lsh_clusters"
            " FROM documents GROUP BY text"
        ),
        "dup_span_scrub": (
            r"WITH toks AS ("
            r"  SELECT doc_id, list_filter("
            r"    string_split_regex(text, '\s+'), x -> x <> '') AS w"
            r"  FROM documents"
            r"), win AS ("
            r"  SELECT doc_id, i AS pos,"
            r"         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS kg"
            r"  FROM toks, unnest(generate_series(1, len(w) - 2))"
            r"    AS t(i)"
            r"  WHERE len(w) >= 3"
            r"), dupset AS ("
            r"  SELECT kg FROM win GROUP BY kg"
            r"  HAVING count(DISTINCT doc_id) >= 2"
            r"), covered AS ("
            r"  SELECT DISTINCT f.doc_id, f.pos + s.o AS j"
            r"  FROM (SELECT w.doc_id, w.pos FROM win w"
            r"        JOIN dupset USING (kg)) f,"
            r"       unnest(generate_series(0, 2)) AS s(o)"
            r"), tok_rows AS ("
            r"  SELECT doc_id, j, w[j] AS tok FROM toks,"
            r"       unnest(generate_series(1, len(w))) AS u(j)"
            r"), kept AS ("
            r"  SELECT t.doc_id, t.j, t.tok FROM tok_rows t"
            r"  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.j = c.j"
            r"  WHERE c.j IS NULL"
            r"), rebuilt AS ("
            r"  SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS text"
            r"  FROM kept GROUP BY doc_id"
            r"), per AS ("
            r"  SELECT doc_id, count(*) AS n_removed FROM covered"
            r"  GROUP BY doc_id"
            r") SELECT t.doc_id, coalesce(r.text, '') AS text,"
            # null text -> w is NULL -> len(w) NULL; the pipeline
            # normalizes null docs to 0 tokens / empty rebuild
            r"  CAST(coalesce(len(w), 0) AS BIGINT) AS n_tokens,"
            r"  CAST(coalesce(p.n_removed, 0) AS BIGINT) AS n_removed"
            r" FROM toks t LEFT JOIN rebuilt r USING (doc_id)"
            r" LEFT JOIN per p USING (doc_id)"
        ),
        "dup_span_stats": (
            r"WITH toks AS ("
            r"  SELECT doc_id, list_filter("
            r"    string_split_regex(text, '\s+'), x -> x <> '') AS w"
            r"  FROM documents"
            r"), win AS ("
            r"  SELECT doc_id, len(w) AS n_tokens, i AS pos,"
            r"         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS kg"
            r"  FROM toks, unnest(generate_series(1, len(w) - 2))"
            r"    AS t(i)"
            r"  WHERE len(w) >= 3"
            r"), dupset AS ("
            r"  SELECT kg FROM win GROUP BY kg"
            r"  HAVING count(DISTINCT doc_id) >= 2"
            r"), flagged AS ("
            r"  SELECT w.doc_id, w.pos FROM win w JOIN dupset USING (kg)"
            r"), lagged AS ("
            r"  SELECT doc_id, pos,"
            r"    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)"
            r"      AS prev"
            r"  FROM flagged"
            r"), per AS ("
            r"  SELECT doc_id, count(*) AS dup_windows,"
            r"    sum(CASE WHEN prev IS NULL OR pos - prev > 3"
            r"        THEN 1 ELSE 0 END) AS n_dup_spans,"
            r"    sum(CASE WHEN prev IS NULL THEN 3"
            r"        ELSE least(pos - prev, 3) END) AS dup_tokens"
            r"  FROM lagged GROUP BY doc_id"
            r"), base AS ("
            r"  SELECT DISTINCT doc_id, n_tokens,"
            r"         n_tokens - 2 AS n_windows FROM win"
            r") SELECT b.doc_id, b.n_tokens, b.n_windows,"
            r"  CAST(coalesce(p.dup_windows, 0) AS BIGINT)"
            r"    AS dup_windows,"
            r"  CAST(coalesce(p.n_dup_spans, 0) AS BIGINT)"
            r"    AS n_dup_spans,"
            r"  CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,"
            r"  CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / b.n_tokens"
            r"    AS dup_token_frac"
            r" FROM base b LEFT JOIN per p USING (doc_id)"
        ),
        "exact_cluster_sizes": (
            "SELECT doc_id, count(*) OVER (PARTITION BY text) "
            "AS cluster_size FROM documents"
        ),
        "normalized_dedup": (
            r"WITH n AS ("
            r"  SELECT doc_id, text,"
            r"  lower(regexp_replace(regexp_replace("
            r"    coalesce(text, ''), '\s+', ' ', 'g'),"
            r"    '^ | $', '', 'g')) AS norm"
            r"  FROM documents"
            r") "
            r"SELECT doc_id,"
            r" min(doc_id) OVER (PARTITION BY text) AS exact_cid,"
            r" min(doc_id) OVER (PARTITION BY norm) AS norm_cid,"
            r" CAST(min(doc_id) OVER (PARTITION BY norm)"
            r"  <> min(doc_id) OVER (PARTITION BY text) AS BIGINT)"
            r" AS merged_by_norm "
            r"FROM n"
        ),
        "mixture_plan": (
            r"WITH tok AS ("
            r"  SELECT coalesce(source, '') AS source, count(*)"
            r"  AS n_docs,"
            r"  CAST(sum(len(list_filter(string_split_regex(text,"
            r"  '\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens"
            r"  FROM documents GROUP BY 1"
            r"), w AS ("
            r"  SELECT source, n_docs, n_tokens,"
            r"  CAST(CASE source WHEN 'src0' THEN 30 WHEN 'src1'"
            r"  THEN 20 WHEN 'src2' THEN 10 ELSE 2 END AS BIGINT)"
            r"  AS weight_pct FROM tok"
            r") "
            r"SELECT source, n_docs, n_tokens, weight_pct,"
            r" least(1.0, (100000 * weight_pct) / (n_tokens * 100.0))"
            r" AS sample_rate,"
            r" CAST(floor(n_tokens * least(1.0, (100000 * weight_pct)"
            r" / (n_tokens * 100.0))) AS BIGINT) AS expected_tokens"
            r" FROM w"
        ),
        "decile_dup_rates": (
            r"WITH n AS ("
            r"  SELECT doc_id, n_chars,"
            r"  lower(regexp_replace(regexp_replace("
            r"    coalesce(text, ''), '\s+', ' ', 'g'),"
            r"    '^ | $', '', 'g')) AS norm"
            r"  FROM documents"
            r"), lab AS ("
            r"  SELECT doc_id,"
            r"  count(*) OVER (PARTITION BY norm) AS csize FROM n"
            r"), dec AS ("
            r"  SELECT doc_id, CAST(NTILE(10) OVER ("
            r"  ORDER BY n_chars, doc_id) AS BIGINT) AS bucket"
            r"  FROM documents"
            r") "
            r"SELECT bucket, count(*) AS n_docs,"
            r" CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END)"
            r"  AS BIGINT) AS n_dups,"
            r" CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END)"
            r"  AS BIGINT) / (count(*) * 1.0) AS dup_share"
            r" FROM dec JOIN lab USING (doc_id) GROUP BY bucket"
        ),
        "token_stats": (
            "WITH " + _TOKS + " "
            "SELECT doc_id, len(w) AS n_tokens, "
            "len(list_distinct(w)) AS n_uniq_tokens, "
            "CAST(len(list_filter(w, t -> t IN ('the', 'a'))) AS DOUBLE)"
            " / greatest(len(w), 1) AS stop_ratio, "
            "CAST(n_chars AS DOUBLE) / greatest(len(w), 1) "
            "AS chars_per_token FROM toks"
        ),
        "contamination": (
            "WITH " + _TOKS + ", " + _SHINGLES + ", "
            "crossp AS ("
            "  SELECT CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END"
            "   AS eval_doc,"
            "  CASE WHEN doc_a % 2 = 1 THEN doc_b ELSE doc_a END"
            "   AS train_doc, jaccard"
            "  FROM jpairs WHERE (doc_a % 2) <> (doc_b % 2)"
            "), r AS ("
            "  SELECT *, row_number() OVER (PARTITION BY eval_doc"
            "  ORDER BY jaccard DESC, train_doc) AS rn FROM crossp"
            ") "
            "SELECT eval_doc, train_doc, jaccard FROM r WHERE rn = 1"
        ),
        "stratified_sample": (
            "SELECT lang, doc_id, draw, rank FROM ("
            "  SELECT lang, doc_id,"
            "  (doc_id * 1103515245 + 12345) % 2147483648 AS draw,"
            "  CAST(row_number() OVER (PARTITION BY lang ORDER BY"
            "  (doc_id * 1103515245 + 12345) % 2147483648, doc_id)"
            "  AS BIGINT) AS rank"
            "  FROM documents"
            ") WHERE rank <= 20"
        ),
        "top_docs_per_lang": (
            r"SELECT lang, doc_id, n_tokens, rank FROM ("
            r"  SELECT lang, doc_id,"
            r"  CAST(len(regexp_extract_all(coalesce(text, ''), '\S+'))"
            r"  AS BIGINT) AS n_tokens,"
            r"  CAST(row_number() OVER (PARTITION BY lang"
            r"  ORDER BY len(regexp_extract_all(coalesce(text, ''),"
            r" '\S+')) DESC, doc_id) AS BIGINT) AS rank"
            r"  FROM documents"
            r") WHERE rank <= 5"
        ),
        "token_quantiles": (
            "WITH " + _TOKS + ", agg AS ("
            "  SELECT quantile_disc(len(w),"
            "  [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS ql FROM toks"
            ") "
            "SELECT unnest(CAST([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]"
            " AS DOUBLE[])) AS q, unnest(ql) AS n_tokens FROM agg"
        ),
        "group_quantiles": (
            "WITH g AS ("
            "  SELECT lang, quantile_disc(n_chars,"
            "  [0.1, 0.25, 0.5, 0.75, 0.9]) AS v"
            "  FROM documents GROUP BY lang"
            ") "
            "SELECT lang, unnest(CAST([0.1, 0.25, 0.5, 0.75, 0.9]"
            " AS DOUBLE[])) AS q, unnest(v) AS n_chars FROM g"
        ),
        "approx_length_quantiles": (
            "WITH s AS ("
            "  SELECT n_chars FROM ("
            "    SELECT n_chars,"
            "    (doc_id * 1103515245 + 12345) % 2147483648 AS draw,"
            "    doc_id FROM documents"
            "  ) QUALIFY row_number() OVER (ORDER BY draw, doc_id)"
            "   <= 200"
            "), a AS ("
            "  SELECT quantile_disc(n_chars,"
            "  [0.1, 0.25, 0.5, 0.75, 0.9]) AS ql FROM s"
            ") "
            "SELECT unnest(CAST([0.1, 0.25, 0.5, 0.75, 0.9]"
            " AS DOUBLE[])) AS q, unnest(ql) AS n_chars FROM a"
        ),
        "length_pareto": (
            "SELECT doc_id, n_chars, "
            "CAST(coalesce(sum(n_chars) OVER (ORDER BY n_chars DESC,"
            " doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
            " 0) AS BIGINT) AS chars_before FROM documents"
        ),
        "corpus_rollup": (
            "SELECT coalesce(source, 'ALL') AS source, "
            "coalesce(lang, 'ALL') AS lang, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars "
            "FROM documents "
            "GROUP BY GROUPING SETS ((source, lang), (source),"
            " (lang), ())"
        ),
        "trimmed_length_mean": (
            "WITH q AS ("
            "  SELECT lang, quantile_disc(n_chars, 0.05) AS lo,"
            "  quantile_disc(n_chars, 0.95) AS hi"
            "  FROM documents GROUP BY lang"
            ") "
            "SELECT d.lang AS lang, count(*) AS n_kept, "
            "CAST(sum(n_chars) AS BIGINT) AS total, "
            "CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean "
            "FROM documents d JOIN q ON d.lang = q.lang "
            "WHERE n_chars BETWEEN lo AND hi GROUP BY d.lang"
        ),
        "length_outliers": (
            "WITH m AS ("
            "  SELECT lang, quantile_disc(n_chars, 0.5) AS med"
            "  FROM documents GROUP BY lang"
            "), d AS ("
            "  SELECT doc_id, documents.lang AS lang, n_chars, med,"
            "  abs(n_chars - med) AS dev"
            "  FROM documents JOIN m ON documents.lang = m.lang"
            "), md AS ("
            "  SELECT lang, quantile_disc(dev, 0.5) AS mad"
            "  FROM d GROUP BY lang"
            ") "
            "SELECT doc_id, d.lang AS lang, n_chars, med, mad, "
            "CAST(dev > 3 * mad AS BIGINT) AS outlier "
            "FROM d JOIN md ON d.lang = md.lang"
        ),
        "quality_buckets": (
            "SELECT lang, doc_id, n_chars, "
            "CAST(ntile(3) OVER (PARTITION BY lang"
            " ORDER BY n_chars DESC, doc_id) AS BIGINT) AS bucket "
            "FROM documents"
        ),
        "token_counts": (
            r"SELECT doc_id, "
            r"CAST(len(regexp_extract_all(coalesce(text, ''), '\S+')) "
            r"AS BIGINT) AS n_ws_tokens, "
            r"CAST(len(regexp_extract_all(coalesce(text, ''), "
            r"' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+')) AS BIGINT) "
            r"AS n_bpe_tokens FROM documents"
        ),
        "lang_summary": (
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(length(text)) AS BIGINT) AS total_chars, "
            "CAST(sum(length(text)) AS DOUBLE) / count(*) AS avg_chars "
            "FROM documents GROUP BY lang"
        ),
        "source_dup_stats": (
            "WITH g AS ("
            "  SELECT source, text, count(*) AS c FROM documents"
            "  GROUP BY 1, 2"
            ") SELECT source,"
            "  CAST(sum(c) AS BIGINT) AS n_docs,"
            "  count(*) AS n_unique,"
            "  CAST(sum(c) - count(*) AS DOUBLE)"
            "    / CAST(sum(c) AS DOUBLE) AS dup_ratio"
            " FROM g GROUP BY source"
        ),
        "length_histogram": (
            "SELECT CAST(length(text) // 100 AS BIGINT) AS bucket,"
            "  CAST(length(text) // 100 * 100 AS BIGINT) AS lo_chars,"
            "  count(*) AS n_docs"
            " FROM documents GROUP BY 1, 2"
        ),
        "doc_commonness": (
            "WITH " + _TOKS + ", "
            "tok AS (SELECT doc_id, unnest(w) AS term FROM toks), "
            "tf AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term) "
            "SELECT tok.doc_id, count(*) AS n_tokens,"
            "  CAST(sum(cnt) AS BIGINT) AS sum_cnt,"
            "  CAST(min(cnt) AS BIGINT) AS min_cnt,"
            "  CAST(sum(cnt) AS DOUBLE) / count(*) AS mean_cnt"
            " FROM tok JOIN tf USING (term) GROUP BY tok.doc_id"
        ),
        "ngram_jaccard_pairs": (
            "WITH " + _TOKS + ", " + _SHINGLES + " "
            "SELECT doc_a, doc_b, n_inter, jaccard FROM jpairs"
        ),
        "ppjoin_pairs": (
            # the PURE uncapped Jaccard join — ppjoin's prefix filter
            # is exact, so no QUALIFY df cap here
            "WITH " + _TOKS + ", "
            "sh AS ("
            "  SELECT DISTINCT doc_id,"
            "  unnest(list_transform(generate_series(1,"
            "    greatest(len(w) - 2, 0)),"
            "    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle"
            "  FROM toks"
            "), sizes AS ("
            "  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id"
            "), inter AS ("
            "  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
            "  count(*) AS n_inter"
            "  FROM sh a JOIN sh b ON a.shingle = b.shingle"
            "  AND a.doc_id < b.doc_id GROUP BY 1, 2"
            ") "
            "SELECT doc_a, doc_b, n_inter,"
            " CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)"
            " AS jaccard"
            " FROM inter"
            " JOIN sizes sa ON sa.doc_id = doc_a"
            " JOIN sizes sb ON sb.doc_id = doc_b"
            " WHERE CAST(n_inter AS DOUBLE)"
            " / (sa.n_sh + sb.n_sh - n_inter) >= 0.5"
        ),
        "source_pair_matrix": (
            "WITH " + _TOKS + ", " + _SHINGLES + " "
            "SELECT least(coalesce(da.source, ''),"
            " coalesce(db.source, '')) AS src_lo,"
            " greatest(coalesce(da.source, ''),"
            " coalesce(db.source, '')) AS src_hi,"
            " count(*) AS n_pairs"
            " FROM jpairs"
            " JOIN documents da ON da.doc_id = doc_a"
            " JOIN documents db ON db.doc_id = doc_b"
            " GROUP BY 1, 2"
        ),
        "dup_triangles": (
            "WITH " + _TOKS + ", " + _SHINGLES + " "
            "SELECT e1.doc_a AS doc_a, e1.doc_b AS doc_b,"
            " e2.doc_b AS doc_c"
            " FROM jpairs e1"
            " JOIN jpairs e2 ON e2.doc_a = e1.doc_b"
            " JOIN jpairs e3 ON e3.doc_a = e1.doc_a"
            " AND e3.doc_b = e2.doc_b"
        ),
        "clustering_coefficients": (
            "WITH " + _TOKS + ", " + _SHINGLES + ", "
            "tri AS ("
            "  SELECT e1.doc_a, e1.doc_b, e2.doc_b AS doc_c"
            "  FROM jpairs e1"
            "  JOIN jpairs e2 ON e2.doc_a = e1.doc_b"
            "  JOIN jpairs e3 ON e3.doc_a = e1.doc_a"
            "  AND e3.doc_b = e2.doc_b"
            "), deg AS ("
            "  SELECT doc_id, count(*) AS degree FROM ("
            "    SELECT doc_a AS doc_id FROM jpairs"
            "    UNION ALL SELECT doc_b FROM jpairs"
            "  ) GROUP BY doc_id"
            "), tcnt AS ("
            "  SELECT doc_id, count(*) AS n_triangles FROM ("
            "    SELECT doc_a AS doc_id FROM tri"
            "    UNION ALL SELECT doc_b FROM tri"
            "    UNION ALL SELECT doc_c FROM tri"
            "  ) GROUP BY doc_id"
            ") "
            "SELECT d.doc_id, d.degree,"
            " CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,"
            " CASE WHEN d.degree >= 2 THEN"
            "  (2 * coalesce(t.n_triangles, 0))"
            "  / (d.degree * (d.degree - 1) * 1.0)"
            " ELSE 0.0 END AS clustering"
            " FROM deg d LEFT JOIN tcnt t USING (doc_id)"
        ),
        "jaccard_cluster_labels": (
            "WITH RECURSIVE " + _TOKS + ", " + _SHINGLES + ", "
            "edges AS ("
            "  SELECT doc_a AS src, doc_b AS dst FROM jpairs"
            "  UNION ALL SELECT doc_b, doc_a FROM jpairs"
            "), reach(doc, lab) AS ("
            "  SELECT doc_id, doc_id FROM documents"
            "  UNION"
            "  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.doc"
            ") "
            "SELECT doc AS doc_id, min(lab) AS cluster_id FROM reach "
            "GROUP BY doc"
        ),
        "cluster_quality_rollup": (
            "WITH RECURSIVE " + _TOKS + ", " + _SHINGLES + ", "
            "edges AS ("
            "  SELECT doc_a AS src, doc_b AS dst FROM jpairs"
            "  UNION ALL SELECT doc_b, doc_a FROM jpairs"
            "), reach(doc, lab) AS ("
            "  SELECT doc_id, doc_id FROM documents"
            "  UNION"
            "  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.doc"
            "), lab AS ("
            "  SELECT doc AS doc_id, min(lab) AS cluster_id FROM reach"
            "  GROUP BY doc"
            ") "
            "SELECT l.cluster_id, count(*) AS n_docs, "
            "CAST(sum(CAST(coalesce(d.n_chars, 0) AS HUGEINT)) AS BIGINT)"
            "  AS total_chars, "
            "CAST(min(coalesce(d.n_chars, 0)) AS BIGINT) AS min_chars, "
            "CAST(max(coalesce(d.n_chars, 0)) AS BIGINT) AS max_chars "
            "FROM lab l JOIN documents d USING (doc_id) GROUP BY 1"
        ),
        "curation_report": _CURATION_CTES + " " + _CURATION_SELECT,
        "curated_corpus": (
            _CURATION_CTES + ", rep AS (" + _CURATION_SELECT + "), "
            "drawn AS ("
            "  SELECT doc_id, (doc_id * 69069 + 1) % 2147483648 AS draw"
            "  FROM rep WHERE reason = 'kept'"
            ") SELECT doc_id, CAST(draw % 16 AS BIGINT) AS shard, "
            "CAST(row_number() OVER (PARTITION BY draw % 16 "
            "ORDER BY draw, doc_id) AS BIGINT) AS pos FROM drawn"
        ),
        "cluster_size_histogram": (
            "WITH RECURSIVE " + _TOKS + ", " + _SHINGLES + ", "
            "edges AS ("
            "  SELECT doc_a AS src, doc_b AS dst FROM jpairs"
            "  UNION ALL SELECT doc_b, doc_a FROM jpairs"
            "), reach(doc, lab) AS ("
            "  SELECT doc_id, doc_id FROM documents"
            "  UNION"
            "  SELECT e.dst, r.lab FROM reach r JOIN edges e"
            "  ON e.src = r.doc"
            "), jlab AS ("
            "  SELECT doc AS doc_id, min(lab) AS cluster_id FROM reach"
            "  GROUP BY doc"
            "), csizes AS ("
            "  SELECT cluster_id, count(*) AS size FROM jlab"
            "  GROUP BY cluster_id"
            ") "
            "SELECT size, count(*) AS n_clusters FROM csizes"
            " GROUP BY size"
        ),
        "dedup_tier_summary": (
            "WITH RECURSIVE " + _TOKS + ", " + _SHINGLES + ", "
            "edges AS ("
            "  SELECT doc_a AS src, doc_b AS dst FROM jpairs"
            "  UNION ALL SELECT doc_b, doc_a FROM jpairs"
            "), reach(doc, lab) AS ("
            "  SELECT doc_id, doc_id FROM documents"
            "  UNION"
            "  SELECT e.dst, r.lab FROM reach r JOIN edges e"
            "  ON e.src = r.doc"
            "), jlab AS ("
            "  SELECT doc AS doc_id, min(lab) AS near_cid FROM reach"
            "  GROUP BY doc"
            "), elab AS ("
            "  SELECT doc_id, min(doc_id) OVER (PARTITION BY text)"
            "  AS exact_cid,"
            "  min(doc_id) OVER (PARTITION BY"
            "   lower(regexp_replace(regexp_replace(coalesce(text, ''),"
            "   '\\s+', ' ', 'g'), '^ | $', '', 'g'))) AS norm_cid"
            "  FROM documents"
            "), tiers AS ("
            "  SELECT e.doc_id,"
            "  CASE WHEN e.exact_cid <> e.doc_id THEN 'exact'"
            "       WHEN e.norm_cid <> e.doc_id THEN 'norm'"
            "       WHEN j.near_cid <> e.doc_id THEN 'near'"
            "       ELSE 'unique' END AS tier"
            "  FROM elab e JOIN jlab j ON e.doc_id = j.doc_id"
            ") "
            "SELECT tier, count(*) AS n_docs FROM tiers GROUP BY tier"
        ),
        "cosine_near_pairs": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4"
        ),
        "ann_topk": (
            "SELECT query_id, neighbor_id, rank, round(cs, 6) AS cos_sim "
            "FROM ("
            "  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            "  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "  CAST(c.embedding AS DOUBLE[])) AS cs, "
            "  row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "  CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank "
            "  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id "
            "  WHERE q.vec_id < 32"
            ") WHERE rank <= 10"
        ),
        "shipping_priority": (
            "WITH orev AS ("
            "  SELECT l_orderkey,"
            "  sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
            "  * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
            "  AS units"
            "  FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-06-01'"
            "  GROUP BY l_orderkey"
            "), j AS ("
            "  SELECT o_orderkey, units, o_orderdate, o_orderpriority"
            "  FROM orev JOIN orders ON o_orderkey = l_orderkey"
            "  WHERE o_orderdate < TIMESTAMP '1997-06-01'"
            ") "
            "SELECT o_orderkey, units / 10000.0 AS revenue, o_orderdate,"
            " o_orderpriority,"
            " CAST(row_number() OVER (ORDER BY units DESC, o_orderkey)"
            "   AS BIGINT) AS rank "
            "FROM j QUALIFY rank <= 10"
        ),
        # revenue in exact int64 units of 1e-4 dollars (cents x
        # discount basis points) — no float-summation-order dependence
        "top_customer_revenue": (
            "WITH orev AS ("
            "  SELECT l_orderkey,"
            "  sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
            "  * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
            "  AS units"
            "  FROM lineitem GROUP BY l_orderkey"
            "), crev AS ("
            "  SELECT o_custkey, CAST(sum(units) AS BIGINT) AS units"
            "  FROM orev JOIN orders ON o_orderkey = l_orderkey"
            "  GROUP BY o_custkey"
            "), r AS ("
            "  SELECT c_mktsegment, c_custkey, units,"
            "  CAST(row_number() OVER (PARTITION BY c_mktsegment"
            "  ORDER BY units DESC, c_custkey) AS BIGINT) AS rank"
            "  FROM crev JOIN customer ON c_custkey = o_custkey"
            ") "
            "SELECT c_mktsegment, c_custkey, units / 10000.0"
            " AS revenue, rank FROM r WHERE rank <= 10"
        ),
        "large_orders": (
            "WITH qsum AS ("
            "  SELECT l_orderkey,"
            "  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
            "  AS total_qty"
            "  FROM lineitem GROUP BY l_orderkey"
            "  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300"
            "), j AS ("
            "  SELECT c_custkey, c_name, o_orderkey, o_orderdate,"
            "  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,"
            "  total_qty"
            "  FROM qsum JOIN orders ON o_orderkey = l_orderkey"
            "  JOIN customer ON c_custkey = o_custkey"
            "), r AS ("
            "  SELECT *, CAST(row_number() OVER ("
            "  ORDER BY cents DESC, o_orderkey) AS BIGINT) AS rank"
            "  FROM j"
            ") "
            "SELECT c_custkey, c_name, o_orderkey, o_orderdate,"
            " cents / 100.0 AS o_totalprice, total_qty, rank"
            " FROM r WHERE rank <= 100"
        ),
        "dormant_customers": (
            "WITH pos AS ("
            "  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))"
            "  AS BIGINT) AS s, count(*) AS n"
            "  FROM customer"
            "  WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0"
            "), d AS ("
            "  SELECT c_custkey, c_nationkey,"
            "  CAST(round(c_acctbal * 100) AS BIGINT) AS cents"
            "  FROM customer, pos"
            "  WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0"
            "  AND CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s"
            "  AND NOT EXISTS (SELECT 1 FROM orders"
            "    WHERE o_custkey = c_custkey"
            "    AND o_orderdate >= TIMESTAMP '2000-01-01')"
            ") "
            "SELECT n_name, count(*) AS numcust,"
            " CAST(sum(cents) AS BIGINT) / 100.0 AS totacctbal"
            " FROM d JOIN nation ON n_nationkey = c_nationkey"
            " GROUP BY n_name"
        ),
        "brand_supplier_counts": (
            "SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,"
            " CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt"
            " FROM lineitem JOIN part ON p_partkey = l_partkey"
            " GROUP BY p_brand, p_size"
        ),
        # TPC-H-Q1 shape in exact int64 units: quantity is integral,
        # price is cents-quantized, discount/tax are basis points;
        # averages are BIGINT / (count * scale.0) IEEE divisions that
        # mirror the Ray side's int64-over-int64 numpy divisions
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus,"
            " CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
            " AS sum_qty,"
            " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
            " AS BIGINT) / 100.0 AS sum_base_price,"
            " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
            " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
            " AS BIGINT) / 10000.0 AS sum_disc_price,"
            " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
            " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
            " * (100 + CAST(round(l_tax * 100) AS BIGINT)))"
            " AS BIGINT) / 1000000.0 AS sum_charge,"
            " CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
            " / (count(*) * 1.0) AS avg_qty,"
            " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
            " AS BIGINT) / (count(*) * 100.0) AS avg_price,"
            " CAST(sum(CAST(round(l_discount * 100) AS BIGINT))"
            " AS BIGINT) / (count(*) * 100.0) AS avg_disc,"
            " count(*) AS count_order"
            " FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'"
            " GROUP BY l_returnflag, l_linestatus"
        ),
        "order_priority_counts": (
            "SELECT o_orderpriority, count(*) AS order_count"
            " FROM orders WHERE EXISTS ("
            "  SELECT 1 FROM lineitem"
            "  WHERE l_orderkey = o_orderkey"
            "  AND l_shipdate > o_orderdate"
            ") GROUP BY o_orderpriority"
        ),
        "supplier_nation_volume": (
            "SELECT r_name, n_name, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
            " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
            " AS BIGINT) / 10000.0 AS revenue, count(*) AS n_items "
            "FROM lineitem "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "JOIN region ON r_regionkey = n_regionkey "
            "GROUP BY r_name, n_name"
        ),
        "local_supplier_volume": (
            "SELECT n_name, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
            " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
            " AS BIGINT) / 10000.0 AS revenue, count(*) AS n_items "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey"
            " AND l_suppkey = s_suppkey"
            " AND c_nationkey = s_nationkey"
            " AND s_nationkey = n_nationkey"
            " AND n_regionkey = r_regionkey"
            " AND r_name = 'ASIA'"
            " AND o_orderdate >= TIMESTAMP '1996-01-01'"
            " AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name"
        ),
        "promo_revenue_share": (
            "SELECT 100.0 * CAST(sum(units) FILTER (is_promo)"
            " AS BIGINT) / CAST(sum(units) AS BIGINT)"
            " AS promo_revenue,"
            " count(*) FILTER (is_promo) AS n_promo_items,"
            " count(*) AS n_items FROM ("
            "  SELECT CAST(round(l_extendedprice * 100) AS BIGINT)"
            "   * (100 - CAST(round(l_discount * 100) AS BIGINT))"
            "   AS units, p_type = 'PROMO' AS is_promo"
            "  FROM lineitem JOIN part ON l_partkey = p_partkey"
            "  WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
            "  AND l_shipdate < TIMESTAMP '1997-01-01')"
        ),
        "customer_order_distribution": (
            "SELECT c_count, count(*) AS custdist FROM ("
            "  SELECT c.c_custkey, count(o.o_orderkey) AS c_count"
            "  FROM customer c LEFT JOIN orders o"
            "  ON c.c_custkey = o.o_custkey"
            "  GROUP BY c.c_custkey"
            ") GROUP BY c_count"
        ),
        "dominant_source_per_lang": (
            "SELECT lang, source, n_docs FROM ("
            "  SELECT lang, source, count(*) AS n_docs,"
            "   row_number() OVER (PARTITION BY lang"
            "    ORDER BY count(*) DESC, source) AS rn"
            "  FROM documents GROUP BY lang, source"
            ") WHERE rn = 1"
        ),
        "corpus_diff": (
            "WITH new AS ("
            "  SELECT doc_id, CASE WHEN doc_id % 5 = 0"
            "  THEN text || ' v2' ELSE text END AS text"
            "  FROM documents WHERE doc_id % 7 <> 0"
            "  UNION ALL"
            "  SELECT doc_id + 1000000000, text FROM documents"
            "  WHERE doc_id % 13 = 0"
            ") SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,"
            " CASE WHEN o.doc_id IS NULL THEN 'added'"
            " WHEN n.doc_id IS NULL THEN 'removed'"
            " WHEN o.text <> n.text THEN 'changed'"
            " ELSE 'unchanged' END AS status"
            " FROM documents o FULL OUTER JOIN new n"
            " ON o.doc_id = n.doc_id"
        ),
        # the vote is exact-int once the top-k neighbor sets agree;
        # similarity ties break by train vec_id, vote ties by label
        "knn_classify": (
            "WITH knn AS ("
            "  SELECT q.vec_id AS vec_id, q.label AS true_label,"
            "  c.label AS nlabel,"
            "  row_number() OVER (PARTITION BY q.vec_id ORDER BY"
            "  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),"
            "  CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank"
            "  FROM embeddings q JOIN embeddings c"
            "  ON q.vec_id % 2 = 1 AND c.vec_id % 2 = 0"
            "), votes AS ("
            "  SELECT vec_id, true_label, nlabel, count(*) AS n"
            "  FROM knn WHERE rank <= 5 GROUP BY vec_id, true_label,"
            "  nlabel"
            "), best AS ("
            "  SELECT vec_id, true_label, nlabel AS pred_label,"
            "  row_number() OVER (PARTITION BY vec_id"
            "  ORDER BY n DESC, nlabel) AS r FROM votes"
            ") "
            "SELECT vec_id, CAST(pred_label AS BIGINT) AS pred_label,"
            " CAST(true_label AS BIGINT) AS true_label,"
            " CAST(pred_label = true_label AS BIGINT) AS correct"
            " FROM best WHERE r = 1"
        ),
        "semantic_contamination": (
            "SELECT eval_vec, train_vec, rank, round(cs, 6) AS cos_sim "
            "FROM ("
            "  SELECT q.vec_id AS eval_vec, c.vec_id AS train_vec, "
            "  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "  CAST(c.embedding AS DOUBLE[])) AS cs, "
            "  CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "  CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS BIGINT)"
            "  AS rank "
            "  FROM embeddings q JOIN embeddings c "
            "  ON q.vec_id % 2 = 1 AND c.vec_id % 2 = 0"
            ") WHERE rank <= 3"
        ),
        "label_centroids": (
            "WITH e AS ("
            "  SELECT CAST(label AS BIGINT) AS label, "
            "  unnest(list_transform(generate_series(1, len(embedding)),"
            "  i -> CAST(i - 1 AS BIGINT))) AS dim, "
            "  unnest(list_transform(generate_series(1, len(embedding)),"
            "  i -> CAST(embedding[i] AS DOUBLE))) AS v"
            "  FROM embeddings"
            ") "
            "SELECT label, dim, round(sum(v) / count(*), 6) AS centroid,"
            " count(*) AS n_vecs FROM e GROUP BY label, dim"
        ),
        "cohort_retention": (
            "WITH f AS ("
            "  SELECT user_id, epoch_us(ts) // 86400000000 AS day"
            "  FROM events"
            "), c AS ("
            "  SELECT user_id, min(day) AS cohort_day FROM f"
            "  GROUP BY user_id"
            "), act AS ("
            "  SELECT DISTINCT c.cohort_day, f.day AS activity_day,"
            "  f.user_id FROM f JOIN c ON f.user_id = c.user_id"
            "), sz AS ("
            "  SELECT cohort_day, count(*) AS n FROM c"
            "  GROUP BY cohort_day"
            "), g AS ("
            "  SELECT cohort_day, activity_day, count(*) AS n_users"
            "  FROM act GROUP BY 1, 2"
            ") "
            "SELECT g.cohort_day, g.activity_day, g.n_users, "
            "CAST(g.n_users AS DOUBLE) / sz.n AS retention "
            "FROM g JOIN sz ON g.cohort_day = sz.cohort_day"
        ),
        "quality_signals": (
            "WITH toks AS ("
            "  SELECT doc_id,"
            "  list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
            "  AS w FROM documents"
            "), m AS ("
            "  SELECT doc_id, len(w) AS n_tokens,"
            "  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)"
            "   / greatest(len(w), 1) AS mean_word_len,"
            "  CAST(len(list_filter(w, x -> length(x) <= 2)) AS DOUBLE)"
            "   / greatest(len(w), 1) AS frac_short_words,"
            "  CAST(len(list_filter(w, x -> length(x) >= 8)) AS DOUBLE)"
            "   / greatest(len(w), 1) AS frac_long_words"
            "  FROM toks"
            ") "
            "SELECT doc_id, n_tokens, mean_word_len, frac_short_words, "
            "frac_long_words, (n_tokens >= 50 AND n_tokens <= 100000 AND "
            "mean_word_len >= 3.0 AND mean_word_len <= 10.0) "
            "AS passes_quality FROM m"
        ),
        "dedup_threshold_sweep": _SWEEP_SQL,
        "id_integrity_audit": (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_ids, "
            "CAST(count(DISTINCT doc_id) FILTER (cnt > 1) AS BIGINT)"
            "  AS n_dup_ids, "
            "CAST(min(doc_id) AS BIGINT) AS min_id, "
            "CAST(max(doc_id) AS BIGINT) AS max_id, "
            "CAST(max(doc_id) - min(doc_id) + 1"
            "  - count(DISTINCT doc_id) AS BIGINT) AS n_missing "
            "FROM (SELECT doc_id,"
            "  count(*) OVER (PARTITION BY doc_id) AS cnt"
            "  FROM documents)"
        ),
        "lang_source_matrix": (
            "SELECT coalesce(source, '') AS source, "
            "CAST(count(*) FILTER (coalesce(lang, '') = 'de') AS BIGINT)"
            " AS n_de, "
            "CAST(count(*) FILTER (coalesce(lang, '') = 'en') AS BIGINT)"
            " AS n_en, "
            "CAST(count(*) FILTER (coalesce(lang, '') = 'es') AS BIGINT)"
            " AS n_es, "
            "CAST(count(*) FILTER (coalesce(lang, '') = 'fr') AS BIGINT)"
            " AS n_fr, "
            "CAST(count(*) FILTER (coalesce(lang, '') = 'zh') AS BIGINT)"
            " AS n_zh, "
            "CAST(count(*) FILTER (coalesce(lang, '') NOT IN"
            " ('de', 'en', 'es', 'fr', 'zh')) AS BIGINT) AS n_other, "
            "CAST(count(*) AS BIGINT) AS n_total "
            "FROM documents GROUP BY 1"
        ),
        "pps_sample": (
            "WITH c AS ("
            "  SELECT doc_id, CAST(coalesce(n_chars, 0) AS BIGINT)"
            "    AS n_chars,"
            "  CAST(coalesce(sum(CAST(coalesce(n_chars, 0) AS BIGINT))"
            "    OVER (ORDER BY doc_id"
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
            "    0) AS BIGINT) AS cum_before"
            "  FROM documents"
            ") "
            "SELECT doc_id, n_chars, cum_before, "
            "CAST((cum_before + n_chars) // 10000"
            "  - cum_before // 10000 AS BIGINT) AS n_hits "
            "FROM c WHERE (cum_before + n_chars) // 10000"
            "  > cum_before // 10000"
        ),
        "sentence_stats": (
            "WITH m AS ("
            "  SELECT doc_id,"
            "  CAST(len(regexp_extract_all(coalesce(text, ''), '[.!?]'))"
            "    AS BIGINT) AS n_sentences,"
            "  CAST(length(coalesce(text, ''))"
            "    - length(replace(coalesce(text, ''), chr(10), ''))"
            "    + 1 AS BIGINT) AS n_lines,"
            "  CAST(len(list_filter(str_split(coalesce(text, ''), chr(10)),"
            "    x -> regexp_matches(x, '[.!?]$'))) AS BIGINT)"
            "    AS n_terminal_lines,"
            "  contains(lower(coalesce(text, '')), 'lorem ipsum')"
            "    AS has_lorem,"
            "  contains(coalesce(text, ''), '{') AS has_curly"
            "  FROM documents"
            ") "
            "SELECT doc_id, n_sentences, n_lines, n_terminal_lines, "
            "CAST(n_terminal_lines AS DOUBLE) / n_lines "
            "  AS frac_terminal_lines, "
            "has_lorem, has_curly, "
            "(n_sentences >= 3 AND NOT has_lorem AND NOT has_curly) "
            "  AS passes_c4 FROM m"
        ),
        "funnel": (
            "WITH f AS ("
            "  SELECT user_id, ts, event_id, event_type FROM events"
            "  WHERE event_type IN ('view', 'click', 'purchase')"
            "), u AS (SELECT DISTINCT user_id FROM f"
            "), s1 AS ("
            "  SELECT user_id, ts, event_id FROM ("
            "    SELECT user_id, ts, event_id, row_number() OVER ("
            "      PARTITION BY user_id ORDER BY ts, event_id) AS rn"
            "    FROM f WHERE event_type = 'view') q1 WHERE rn = 1"
            "), s2 AS ("
            "  SELECT user_id, ts, event_id FROM ("
            "    SELECT f.user_id, f.ts, f.event_id, row_number() OVER ("
            "      PARTITION BY f.user_id ORDER BY f.ts, f.event_id) AS rn"
            "    FROM f JOIN s1 ON f.user_id = s1.user_id"
            "    WHERE f.event_type = 'click' AND (f.ts > s1.ts OR"
            "      (f.ts = s1.ts AND f.event_id > s1.event_id))"
            "  ) q2 WHERE rn = 1"
            "), s3 AS ("
            "  SELECT user_id, ts, event_id FROM ("
            "    SELECT f.user_id, f.ts, f.event_id, row_number() OVER ("
            "      PARTITION BY f.user_id ORDER BY f.ts, f.event_id) AS rn"
            "    FROM f JOIN s2 ON f.user_id = s2.user_id"
            "    WHERE f.event_type = 'purchase' AND (f.ts > s2.ts OR"
            "      (f.ts = s2.ts AND f.event_id > s2.event_id))"
            "  ) q3 WHERE rn = 1"
            ") SELECT u.user_id,"
            "  CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3"
            "       WHEN s2.user_id IS NOT NULL THEN 2"
            "       WHEN s1.user_id IS NOT NULL THEN 1"
            "       ELSE 0 END AS BIGINT) AS steps_completed,"
            "  epoch_us(s1.ts) AS t_first_us,"
            "  epoch_us(coalesce(s3.ts, s2.ts, s1.ts)) AS t_last_us"
            " FROM u LEFT JOIN s1 ON u.user_id = s1.user_id"
            " LEFT JOIN s2 ON u.user_id = s2.user_id"
            " LEFT JOIN s3 ON u.user_id = s3.user_id"
        ),
        "peak_event_rate": (
            "WITH w AS ("
            "  SELECT user_id, count(*) OVER (PARTITION BY user_id"
            "  ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING"
            "  AND CURRENT ROW) AS nw FROM events"
            ") "
            "SELECT user_id, CAST(max(nw) AS BIGINT) AS peak_events "
            "FROM w GROUP BY 1"
        ),
        "user_session_stats": (
            "WITH e AS ("
            "  SELECT user_id, ts, event_id,"
            "  CASE WHEN lag(ts) OVER w IS NULL"
            "       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)"
            "          > 1800000000"
            "       THEN 1 ELSE 0 END AS brk"
            "  FROM events WINDOW w AS "
            "  (PARTITION BY user_id ORDER BY ts, event_id)"
            "), s AS ("
            "  SELECT *, sum(brk) OVER "
            "  (PARTITION BY user_id ORDER BY ts, event_id "
            "   ROWS UNBOUNDED PRECEDING) AS sn FROM e"
            "), sess AS ("
            "  SELECT user_id, count(*) AS n_events,"
            "  max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us"
            "  FROM s GROUP BY user_id, sn"
            ") "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(sum(n_events) AS BIGINT) AS total_events, "
            "CAST(sum(n_events) AS DOUBLE) / count(*)"
            "  AS events_per_session, "
            "CAST(max(span_us) AS BIGINT) AS max_session_span_us "
            "FROM sess GROUP BY 1"
        ),
        "funnel_latency": (
            "WITH f AS ("
            "  SELECT user_id, ts, event_id, event_type FROM events"
            "  WHERE event_type IN ('view', 'click', 'purchase')"
            "), s1 AS ("
            "  SELECT user_id, ts, event_id FROM ("
            "    SELECT user_id, ts, event_id, row_number() OVER ("
            "      PARTITION BY user_id ORDER BY ts, event_id) AS rn"
            "    FROM f WHERE event_type = 'view') q1 WHERE rn = 1"
            "), s2 AS ("
            "  SELECT user_id, ts, event_id FROM ("
            "    SELECT f.user_id, f.ts, f.event_id, row_number() OVER ("
            "      PARTITION BY f.user_id ORDER BY f.ts, f.event_id) AS rn"
            "    FROM f JOIN s1 ON f.user_id = s1.user_id"
            "    WHERE f.event_type = 'click' AND (f.ts > s1.ts OR"
            "      (f.ts = s1.ts AND f.event_id > s1.event_id))"
            "  ) q2 WHERE rn = 1"
            "), s3 AS ("
            "  SELECT user_id, ts, event_id FROM ("
            "    SELECT f.user_id, f.ts, f.event_id, row_number() OVER ("
            "      PARTITION BY f.user_id ORDER BY f.ts, f.event_id) AS rn"
            "    FROM f JOIN s2 ON f.user_id = s2.user_id"
            "    WHERE f.event_type = 'purchase' AND (f.ts > s2.ts OR"
            "      (f.ts = s2.ts AND f.event_id > s2.event_id))"
            "  ) q3 WHERE rn = 1"
            "), lat AS ("
            "  SELECT epoch_us(s3.ts) - epoch_us(s1.ts) AS latency_us"
            "  FROM s3 JOIN s1 USING (user_id)"
            "), agg AS ("
            "  SELECT quantile_disc(latency_us,"
            "  [0.1, 0.5, 0.9, 0.99]) AS ql FROM lat"
            ") "
            "SELECT unnest(CAST([0.1, 0.5, 0.9, 0.99] AS DOUBLE[]))"
            " AS q, unnest(ql) AS latency_us FROM agg"
        ),
        "sessionize": (
            "WITH e AS ("
            "  SELECT user_id, ts, event_id, value,"
            "  CASE WHEN lag(ts) OVER w IS NULL"
            "       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000"
            "       THEN 1 ELSE 0 END AS brk"
            "  FROM events WINDOW w AS "
            "  (PARTITION BY user_id ORDER BY ts, event_id)"
            "), s AS ("
            "  SELECT *, sum(brk) OVER "
            "  (PARTITION BY user_id ORDER BY ts, event_id "
            "   ROWS UNBOUNDED PRECEDING) AS sn FROM e"
            ") "
            "SELECT user_id, min(event_id) AS session_key, "
            "count(*) AS n_events, min(epoch_us(ts)) AS t_start_us, "
            "max(epoch_us(ts)) AS t_end_us, "
            "round(sum(value), 6) AS total_value "
            "FROM s GROUP BY user_id, sn"
        ),
        "lang_id": (
            "WITH t AS ("
            r"  SELECT doc_id, coalesce(text, '') AS text,"
            r"  list_filter(string_split_regex(lower(coalesce(text, '')),"
            r" '\s+'), x -> x <> '') AS w FROM documents"
            "), s AS ("
            "  SELECT doc_id, text, greatest(len(w), 1) AS n,"
            "  len(list_filter(w, x -> x IN ('the','a','of','and','to',"
            "'in','is','that','it','for'))) AS h_en,"
            "  len(list_filter(w, x -> x IN ('der','die','das','und',"
            "'ist','nicht','ein','mit','zu'))) AS h_de,"
            "  len(list_filter(w, x -> x IN ('le','la','les','et','est',"
            "'une','dans','que','pour'))) AS h_fr,"
            "  len(list_filter(w, x -> x IN ('el','la','los','las','es',"
            "'una','para','con','por'))) AS h_es"
            "  FROM t"
            "), sc AS ("
            "  SELECT doc_id, text,"
            "  CAST(h_en AS DOUBLE) / n AS s_en,"
            "  CAST(h_de AS DOUBLE) / n AS s_de,"
            "  CAST(h_fr AS DOUBLE) / n AS s_fr,"
            "  CAST(h_es AS DOUBLE) / n AS s_es,"
            "  CASE WHEN length(text) > 0 THEN"
            "  CAST(len(regexp_extract_all(text, '[一-鿿]')) AS DOUBLE)"
            "  / length(text) ELSE 0.0 END AS cjk"
            "  FROM s"
            ") "
            "SELECT doc_id,"
            " CASE WHEN cjk > 0.2 THEN 'zh'"
            " WHEN greatest(s_en, s_de, s_fr, s_es) = 0.0 THEN 'und'"
            " WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'"
            " WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'"
            " WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS pred_lang,"
            " CASE WHEN cjk > 0.2 THEN cjk"
            " ELSE greatest(s_en, s_de, s_fr, s_es) END AS confidence "
            "FROM sc"
        ),
        "session_join": (
            "WITH e AS ("
            "  SELECT user_id, ts, event_id,"
            "  CASE WHEN lag(ts) OVER w IS NULL"
            "       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000"
            "       THEN 1 ELSE 0 END AS brk"
            "  FROM events WINDOW w AS "
            "  (PARTITION BY user_id ORDER BY ts, event_id)"
            "), s AS ("
            "  SELECT *, sum(brk) OVER "
            "  (PARTITION BY user_id ORDER BY ts, event_id "
            "   ROWS UNBOUNDED PRECEDING) AS sn FROM e"
            "), sess AS ("
            "  SELECT user_id, min(event_id) AS session_key, "
            "  min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 "
            "  FROM s GROUP BY user_id, sn"
            ") "
            "SELECT ev.event_id, "
            "CAST(coalesce(x.session_key, -1) AS BIGINT) AS session_key "
            "FROM events ev LEFT JOIN sess x "
            "ON x.user_id = ev.user_id "
            "AND epoch_us(ev.ts) BETWEEN x.t0 AND x.t1"
        ),
        "asof_join": (
            "WITH cks AS ("
            "  SELECT user_id, ts, max(event_id) AS ck_id FROM events"
            "  WHERE event_id % 10 = 0 GROUP BY 1, 2"
            ") "
            "SELECT e.event_id, "
            "CAST(coalesce(c.ck_id, -1) AS BIGINT) AS ck_id "
            "FROM events e ASOF LEFT JOIN cks c "
            "ON c.user_id = e.user_id AND e.ts >= c.ts"
        ),
        "window_agg": (
            "SELECT make_timestamp((epoch_us(ts) // 3600000000) "
            "* 3600000000) AS window_start, event_type, "
            "count(*) AS n_events, min(value) AS min_value, "
            "max(value) AS max_value "
            "FROM events GROUP BY 1, 2"
        ),
        "event_seq": (
            "SELECT event_id, CAST(row_number() OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) "
            "AS seq FROM events"
        ),
        "user_event_gaps": (
            "SELECT event_id, user_id, "
            "CAST(coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id), -1) "
            "AS BIGINT) AS gap_us FROM events"
        ),
        "peak_concurrency": (
            "WITH e AS ("
            "  SELECT user_id, ts, event_id,"
            "  CASE WHEN lag(ts) OVER w IS NULL"
            "       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)"
            "          > 1800000000"
            "       THEN 1 ELSE 0 END AS brk"
            "  FROM events WINDOW w AS "
            "  (PARTITION BY user_id ORDER BY ts, event_id)"
            "), s AS ("
            "  SELECT *, sum(brk) OVER "
            "  (PARTITION BY user_id ORDER BY ts, event_id "
            "   ROWS UNBOUNDED PRECEDING) AS sn FROM e"
            "), sess AS ("
            "  SELECT min(event_id) AS sk,"
            "  min(epoch_us(ts)) AS t_start_us,"
            "  max(epoch_us(ts)) AS t_end_us"
            "  FROM s GROUP BY user_id, sn"
            "), pts AS ("
            "  SELECT t_start_us AS ts_us, 1 AS kind, 1 AS d, sk"
            "  FROM sess"
            "  UNION ALL SELECT t_end_us, 0, -1, sk FROM sess"
            "), r AS ("
            "  SELECT ts_us, sum(d) OVER (ORDER BY ts_us, kind, sk"
            "  ROWS UNBOUNDED PRECEDING) AS conc FROM pts"
            "), m AS (SELECT max(conc) AS peak FROM r) "
            "SELECT CAST(m.peak AS BIGINT) AS peak_concurrency,"
            " (SELECT CAST(min(ts_us) AS BIGINT) FROM r"
            "  WHERE conc = m.peak) AS at_ts_us,"
            " (SELECT count(*) FROM sess) AS n_sessions FROM m"
        ),
        "events_profile": (
            "SELECT 'event_id' AS col, count(*) AS n_rows,"
            " CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,"
            " count(DISTINCT event_id) AS n_distinct,"
            " CAST(min(event_id) AS DOUBLE) AS min_num,"
            " CAST(max(event_id) AS DOUBLE) AS max_num FROM events"
            " UNION ALL SELECT 'user_id', count(*),"
            " CAST(count(*) - count(user_id) AS BIGINT),"
            " count(DISTINCT user_id), CAST(min(user_id) AS DOUBLE),"
            " CAST(max(user_id) AS DOUBLE) FROM events"
            " UNION ALL SELECT 'value', count(*),"
            " CAST(count(*) - count(value) AS BIGINT),"
            " count(DISTINCT value), min(value), max(value) FROM events"
            " UNION ALL SELECT 'ts', count(*),"
            " CAST(count(*) - count(ts) AS BIGINT),"
            " count(DISTINCT ts),"
            " CAST(epoch_us(min(ts)) AS DOUBLE),"
            " CAST(epoch_us(max(ts)) AS DOUBLE) FROM events"
            " UNION ALL SELECT 'event_type', count(*),"
            " CAST(count(*) - count(event_type) AS BIGINT),"
            " count(DISTINCT event_type), CAST(NULL AS DOUBLE),"
            " CAST(NULL AS DOUBLE) FROM events"
            " UNION ALL SELECT 'props', count(*),"
            " CAST(count(*) - count(props) AS BIGINT),"
            " count(DISTINCT props), CAST(NULL AS DOUBLE),"
            " CAST(NULL AS DOUBLE) FROM events"
        ),
        "event_dedup": (
            "WITH l AS ("
            "  SELECT event_id, user_id, event_type,"
            "  epoch_us(ts) AS ts_us,"
            "  lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type"
            "  ORDER BY ts, event_id) AS prev FROM events"
            ") "
            "SELECT event_id, user_id, event_type, ts_us,"
            " CAST(CASE WHEN prev IS NULL OR ts_us - prev > 300000000"
            " THEN 1 ELSE 0 END AS BIGINT) AS kept FROM l"
        ),
        # ->> extracts as text, the integer-literal regex mirrors the
        # kernel's reject-non-integers rule; avg is the exact ratio
        "props_field_stats": (
            "WITH kk AS ("
            "  SELECT event_type, CAST(CASE WHEN json_valid(props) AND"
            "  regexp_matches(props->>'$.k', '^-?\\d+$')"
            "  THEN props->>'$.k' END AS BIGINT) AS k FROM events"
            ") SELECT event_type, count(*) AS n_events,"
            " count(k) AS n_with, CAST(sum(k) AS BIGINT) AS sum_k,"
            " min(k) AS min_k, max(k) AS max_k,"
            " CAST(sum(k) AS DOUBLE) / count(k) AS avg_k"
            " FROM kk GROUP BY event_type"
        ),
        "length_percent_ranks": (
            "SELECT doc_id, "
            "percent_rank() OVER "
            "(PARTITION BY lang ORDER BY n_chars, doc_id) AS pct_rank, "
            "cume_dist() OVER "
            "(PARTITION BY lang ORDER BY n_chars, doc_id) AS cume_dist "
            "FROM documents"
        ),
        "shuffle_shards": (
            "WITH drawn AS ("
            "  SELECT doc_id, (doc_id * 69069 + 1) % 2147483648 AS draw"
            "  FROM documents"
            ") SELECT doc_id, CAST(draw % 16 AS BIGINT) AS shard, "
            "CAST(row_number() OVER (PARTITION BY draw % 16 "
            "ORDER BY draw, doc_id) AS BIGINT) AS pos FROM drawn"
        ),
        # first/last are arg-extremes on the total (ts, event_id)
        # order; span is an int64 difference / 1e6 IEEE division on
        # both sides
        "user_first_last": (
            "WITH e AS ("
            "  SELECT user_id, epoch_us(ts) AS ts_us, event_id,"
            "  event_type FROM events"
            "), f AS ("
            "  SELECT user_id, ts_us, event_type, row_number() OVER ("
            "  PARTITION BY user_id ORDER BY ts_us, event_id) AS rn"
            "  FROM e"
            "), l AS ("
            "  SELECT user_id, ts_us, event_type, row_number() OVER ("
            "  PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC)"
            "  AS rn FROM e"
            "), c AS ("
            "  SELECT user_id, count(*) AS n_events FROM e"
            "  GROUP BY user_id"
            ") "
            "SELECT c.user_id, c.n_events,"
            " f.ts_us AS first_ts_us, l.ts_us AS last_ts_us,"
            " f.event_type AS first_type, l.event_type AS last_type,"
            " (l.ts_us - f.ts_us) / 1000000.0 AS span_sec"
            " FROM c"
            " JOIN f ON f.user_id = c.user_id AND f.rn = 1"
            " JOIN l ON l.user_id = c.user_id AND l.rn = 1"
        ),
        "rolling_user_stats": (
            "SELECT event_id, "
            "CAST(count(*) OVER w AS BIGINT) AS win_n, "
            "max(coalesce(value, 0.0)) OVER w AS win_max "
            "FROM events WINDOW w AS ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        ),
        "hopping_window_counts": (
            "SELECT make_timestamp(ws) AS window_start, "
            "count(*) AS n_events FROM ("
            "  SELECT unnest(generate_series("
            "    (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000,"
            "    (epoch_us(ts) // 1800000000) * 1800000000,"
            "    1800000000)) AS ws"
            "  FROM events"
            ") GROUP BY 1"
        ),
        "hourly_activity": (
            "WITH c AS ("
            "  SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour,"
            "  coalesce(event_type, '') AS event_type, count(*) AS n"
            "  FROM events GROUP BY 1, 2"
            "), t AS ("
            "  SELECT event_type, CAST(sum(n) AS BIGINT) AS tot"
            "  FROM c GROUP BY 1"
            ") "
            "SELECT c.hour, c.event_type, c.n, "
            "CAST(c.n AS DOUBLE) / t.tot AS frac_of_type "
            "FROM c JOIN t USING (event_type)"
        ),
        "event_transitions": (
            "WITH s AS ("
            "  SELECT user_id, coalesce(event_type, '') AS event_type,"
            "  lag(coalesce(event_type, '')) OVER ("
            "    PARTITION BY user_id ORDER BY ts, event_id) AS prev_type"
            "  FROM events"
            ") "
            "SELECT prev_type, event_type AS next_type, count(*) AS n "
            "FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2"
        ),
        "trailing_event_counts": (
            "SELECT event_id, user_id, ts, "
            "CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 24 HOUR PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS n_window FROM events"
        ),
        "trailing_active_users": (
            "WITH ud AS ("
            "  SELECT DISTINCT date_trunc('day', ts) AS d, user_id"
            "  FROM events"
            "), cov AS ("
            "  SELECT DISTINCT d + CAST(k AS BIGINT) * INTERVAL 1 DAY"
            "   AS day, user_id"
            "  FROM ud CROSS JOIN"
            "   (SELECT unnest(generate_series(0, 6)) AS k)"
            ") "
            "SELECT day, count(*) AS n_users_7d FROM cov GROUP BY day"
        ),
        "window_user_counts": (
            "SELECT make_timestamp((epoch_us(ts) // 3600000000) "
            "* 3600000000) AS window_start, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1"
        ),
        "euclidean_topk": (
            "SELECT query_id, neighbor_id, rank, round(d, 6) AS l2_dist "
            "FROM ("
            "  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            "  list_distance(CAST(q.embedding AS DOUBLE[]), "
            "  CAST(c.embedding AS DOUBLE[])) AS d, "
            "  row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "  list_distance(CAST(q.embedding AS DOUBLE[]), "
            "  CAST(c.embedding AS DOUBLE[])) ASC, c.vec_id) AS rank "
            "  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id "
            "  WHERE q.vec_id < 16"
            ") WHERE rank <= 10"
        ),
        "filtered_ann_topk": (
            "SELECT query_id, neighbor_id, rank, round(cs, 6) AS cos_sim "
            "FROM ("
            "  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            "  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "  CAST(c.embedding AS DOUBLE[])) AS cs, "
            "  CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "  CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS BIGINT)"
            "  AS rank "
            "  FROM embeddings q JOIN embeddings c "
            "  ON c.label = q.label AND c.vec_id <> q.vec_id "
            "  WHERE q.vec_id < 16"
            ") WHERE rank <= 10"
        ),
        "best_rep_per_cluster": (
            r"WITH n AS ("
            r"  SELECT doc_id, n_chars,"
            r"  lower(regexp_replace(regexp_replace(coalesce(text, ''),"
            r"  '\s+', ' ', 'g'), '^ | $', '', 'g')) AS norm"
            r"  FROM documents"
            r"), r AS ("
            r"  SELECT doc_id, n_chars,"
            r"  min(doc_id) OVER (PARTITION BY norm) AS cluster_id,"
            r"  CAST(count(*) OVER (PARTITION BY norm) AS BIGINT)"
            r"    AS n_copies,"
            r"  row_number() OVER (PARTITION BY norm"
            r"    ORDER BY n_chars DESC, doc_id) AS rn FROM n"
            r") "
            r"SELECT cluster_id, doc_id AS rep_doc, n_chars AS rep_chars,"
            r" n_copies FROM r WHERE rn = 1"
        ),
        "quantize_embeddings": (
            "WITH e AS ("
            "  SELECT vec_id, unnest(embedding) AS x,"
            "  unnest(generate_series(1, len(embedding))) AS dim"
            "  FROM embeddings"
            "), mm AS ("
            "  SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim"
            "), q AS ("
            "  SELECT vec_id, CAST(e.x AS DOUBLE) AS xd,"
            "  CAST(mm.mn AS DOUBLE) AS mnd, CAST(mm.mx AS DOUBLE) AS mxd,"
            "  CASE WHEN mm.mx > mm.mn THEN least(greatest(floor("
            "    (CAST(e.x AS DOUBLE) - CAST(mm.mn AS DOUBLE)) * 256.0"
            "    / (CAST(mm.mx AS DOUBLE) - CAST(mm.mn AS DOUBLE))),"
            "    0.0), 255.0) ELSE 0.0 END AS code"
            "  FROM e JOIN mm USING (dim)"
            "), r AS ("
            "  SELECT vec_id, CAST(code AS BIGINT) AS c,"
            "  CASE WHEN mxd > mnd THEN"
            "    abs(xd - (mnd + (code + 0.5) * (mxd - mnd) / 256.0))"
            "  ELSE 0.0 END AS err FROM q"
            "), agg AS ("
            "  SELECT vec_id, CAST(sum(c) AS BIGINT) AS code_sum,"
            "  min(c) AS code_min, max(c) AS code_max,"
            "  round(max(err), 6) AS max_abs_err FROM r GROUP BY vec_id"
            ") "
            "SELECT a.vec_id, CAST(len(e2.embedding) AS BIGINT) AS n_dims, "
            "a.code_sum, a.code_min, a.code_max, a.max_abs_err "
            "FROM agg a JOIN embeddings e2 ON a.vec_id = e2.vec_id"
        ),
        "kmeans_assign": (
            "WITH e AS ("
            "  SELECT vec_id, unnest(embedding) AS x,"
            "  unnest(generate_series(1, len(embedding))) AS dim"
            "  FROM embeddings"
            "), mm AS ("
            "  SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim"
            "), q AS ("
            "  SELECT vec_id, dim,"
            "  CAST(CASE WHEN mm.mx > mm.mn THEN least(greatest(floor("
            "    (CAST(e.x AS DOUBLE) - CAST(mm.mn AS DOUBLE)) * 256.0"
            "    / (CAST(mm.mx AS DOUBLE) - CAST(mm.mn AS DOUBLE))),"
            "    0.0), 255.0) ELSE 0.0 END AS BIGINT) AS c"
            "  FROM e JOIN mm USING (dim)"
            "), seeds AS ("
            "  SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8"
            "), qc AS ("
            "  SELECT q.vec_id AS cid, dim, c AS cc"
            "  FROM q JOIN seeds USING (vec_id)"
            "), dist AS ("
            "  SELECT q.vec_id, qc.cid,"
            "  CAST(sum((q.c - qc.cc) * (q.c - qc.cc)) AS BIGINT)"
            "  AS dist2"
            "  FROM q JOIN qc USING (dim) GROUP BY q.vec_id, qc.cid"
            "), r AS ("
            "  SELECT vec_id, cid, dist2, row_number() OVER ("
            "  PARTITION BY vec_id ORDER BY dist2, cid) AS rn FROM dist"
            ") "
            "SELECT vec_id, cid AS cluster, dist2 FROM r WHERE rn = 1"
        ),
        "semantic_dedup": (
            "WITH e AS ("
            "  SELECT vec_id, unnest(embedding) AS x,"
            "  unnest(generate_series(1, len(embedding))) AS dim"
            "  FROM embeddings"
            "), mm AS ("
            "  SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim"
            "), q AS ("
            "  SELECT vec_id, dim,"
            "  CAST(CASE WHEN mm.mx > mm.mn THEN least(greatest(floor("
            "    (CAST(e.x AS DOUBLE) - CAST(mm.mn AS DOUBLE)) * 256.0"
            "    / (CAST(mm.mx AS DOUBLE) - CAST(mm.mn AS DOUBLE))),"
            "    0.0), 255.0) ELSE 0.0 END AS BIGINT) AS c"
            "  FROM e JOIN mm USING (dim)"
            "), seeds AS ("
            "  SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8"
            "), qc AS ("
            "  SELECT q.vec_id AS cid, dim, c AS cc"
            "  FROM q JOIN seeds USING (vec_id)"
            "), dist AS ("
            "  SELECT q.vec_id, qc.cid,"
            "  CAST(sum((q.c - qc.cc) * (q.c - qc.cc)) AS BIGINT)"
            "  AS dist2"
            "  FROM q JOIN qc USING (dim) GROUP BY q.vec_id, qc.cid"
            "), r AS ("
            "  SELECT vec_id, cid, row_number() OVER ("
            "  PARTITION BY vec_id ORDER BY dist2, cid) AS rn FROM dist"
            "), a AS ("
            "  SELECT vec_id, cid AS cluster FROM r WHERE rn = 1"
            "), pd AS ("
            "  SELECT hi.vec_id AS v,"
            "  CAST(sum((qh.c - ql.c) * (qh.c - ql.c)) AS BIGINT) AS d2"
            "  FROM a hi JOIN a lo ON hi.cluster = lo.cluster"
            "  AND lo.vec_id < hi.vec_id"
            "  JOIN q qh ON qh.vec_id = hi.vec_id"
            "  JOIN q ql ON ql.vec_id = lo.vec_id AND ql.dim = qh.dim"
            "  GROUP BY hi.vec_id, lo.vec_id"
            ") "
            "SELECT a.vec_id, a.cluster,"
            " NOT EXISTS (SELECT 1 FROM pd"
            "             WHERE pd.v = a.vec_id AND pd.d2 <= 150000)"
            " AS keep"
            " FROM a"
        ),
        "label_scatter": (
            "WITH e AS ("
            "  SELECT vec_id, unnest(embedding) AS x,"
            "  unnest(generate_series(1, len(embedding))) AS dim"
            "  FROM embeddings"
            "), mm AS ("
            "  SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim"
            "), q AS ("
            "  SELECT vec_id, dim,"
            "  CAST(CASE WHEN mm.mx > mm.mn THEN least(greatest(floor("
            "    (CAST(e.x AS DOUBLE) - CAST(mm.mn AS DOUBLE)) * 256.0"
            "    / (CAST(mm.mx AS DOUBLE) - CAST(mm.mn AS DOUBLE))),"
            "    0.0), 255.0) ELSE 0.0 END AS BIGINT) AS c"
            "  FROM e JOIN mm USING (dim)"
            ") "
            "SELECT coalesce(CAST(emb.label AS BIGINT), -1) AS label,"
            " CAST(q.dim - 1 AS BIGINT) AS dim,"
            " count(*) AS n_vecs,"
            " CAST(sum(q.c) AS BIGINT) / (count(*) * 1.0) AS mean_code,"
            " (count(*) * CAST(sum(q.c * q.c) AS BIGINT)"
            "  - CAST(sum(q.c) AS BIGINT) * CAST(sum(q.c) AS BIGINT))"
            " / (count(*) * count(*) * 1.0) AS var_code"
            " FROM q JOIN embeddings emb USING (vec_id)"
            " GROUP BY coalesce(CAST(emb.label AS BIGINT), -1), q.dim"
        ),
        "kmeans_update": (
            "WITH e AS ("
            "  SELECT vec_id, unnest(embedding) AS x,"
            "  unnest(generate_series(1, len(embedding))) AS dim"
            "  FROM embeddings"
            "), mm AS ("
            "  SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim"
            "), q AS ("
            "  SELECT vec_id, dim,"
            "  CAST(CASE WHEN mm.mx > mm.mn THEN least(greatest(floor("
            "    (CAST(e.x AS DOUBLE) - CAST(mm.mn AS DOUBLE)) * 256.0"
            "    / (CAST(mm.mx AS DOUBLE) - CAST(mm.mn AS DOUBLE))),"
            "    0.0), 255.0) ELSE 0.0 END AS BIGINT) AS c"
            "  FROM e JOIN mm USING (dim)"
            "), seeds AS ("
            "  SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8"
            "), qc AS ("
            "  SELECT q.vec_id AS cid, dim, c AS cc"
            "  FROM q JOIN seeds USING (vec_id)"
            "), dist AS ("
            "  SELECT q.vec_id, qc.cid,"
            "  CAST(sum((q.c - qc.cc) * (q.c - qc.cc)) AS BIGINT)"
            "  AS dist2"
            "  FROM q JOIN qc USING (dim) GROUP BY q.vec_id, qc.cid"
            "), r AS ("
            "  SELECT vec_id, cid, dist2, row_number() OVER ("
            "  PARTITION BY vec_id ORDER BY dist2, cid) AS rn FROM dist"
            "), asn AS ("
            "  SELECT vec_id, cid AS cluster FROM r WHERE rn = 1"
            ") "
            "SELECT a.cluster, CAST(q.dim - 1 AS BIGINT) AS dim,"
            " CAST(sum(q.c) AS BIGINT) / (count(*) * 1.0) AS centroid,"
            " count(*) AS n_vecs"
            " FROM q JOIN asn a USING (vec_id)"
            " GROUP BY a.cluster, q.dim"
        ),
        "substring_containment": (
            "SELECT a.doc_id AS contained, min(b.doc_id) AS container "
            "FROM documents a JOIN documents b "
            "ON a.doc_id <> b.doc_id AND length(b.text) >= length(a.text) "
            "AND strpos(b.text, a.text) > 0 "
            "WHERE a.text <> '' GROUP BY a.doc_id"
        ),
        "media_dedup": (
            "WITH m AS ("
            "  SELECT doc_id AS media_id,"
            "  CASE WHEN doc_id % 3 = 0 THEN 'audio' ELSE 'image' END"
            "  AS kind, coalesce(text, '') AS p FROM documents"
            ") "
            "SELECT media_id, kind,"
            " min(media_id) OVER (PARTITION BY kind, p) AS cluster_id,"
            " CAST(count(*) OVER (PARTITION BY kind, p) AS BIGINT)"
            " AS n_copies FROM m"
        ),
        "media_features": (
            "SELECT doc_id AS media_id, "
            "CASE WHEN doc_id % 3 = 0 THEN 'audio' ELSE 'image' END AS kind, "
            "octet_length(CAST(coalesce(text, '') AS BLOB)) AS n_bytes "
            "FROM documents"
        ),
        "cluster_containment": (
            "WITH RECURSIVE " + _TOKS + ", " + _SHINGLES + ", "
            "edges AS ("
            "  SELECT doc_a AS src, doc_b AS dst FROM jpairs"
            "  UNION ALL SELECT doc_b, doc_a FROM jpairs"
            "), reach(doc, lab) AS ("
            "  SELECT doc_id, doc_id FROM documents"
            "  UNION"
            "  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.doc"
            "), labels AS ("
            "  SELECT doc AS doc_id, min(lab) AS cluster_id FROM reach "
            "  GROUP BY doc"
            "), csize AS ("
            "  SELECT cluster_id, count(*) AS n FROM labels "
            "  GROUP BY cluster_id"
            "), multi AS ("
            "  SELECT l.doc_id, l.cluster_id FROM labels l "
            "  JOIN csize s USING (cluster_id) WHERE s.n > 1"
            "), cont AS ("
            "  SELECT m.doc_id, min(m2.doc_id) AS contained_in"
            "  FROM multi m"
            "  JOIN documents ta ON ta.doc_id = m.doc_id"
            "  JOIN multi m2 ON m2.cluster_id = m.cluster_id"
            "   AND m2.doc_id <> m.doc_id"
            "  JOIN documents tb ON tb.doc_id = m2.doc_id"
            "  WHERE ta.text <> '' AND strpos(tb.text, ta.text) > 0"
            "  GROUP BY m.doc_id"
            ") "
            "SELECT m.doc_id, m.cluster_id, "
            "CAST(coalesce(c.contained_in, -1) AS BIGINT) AS contained_in "
            "FROM multi m LEFT JOIN cont c ON c.doc_id = m.doc_id"
        ),
        "repetition_signals": (
            "WITH " + _TOKS + ", per AS ("
            "  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,"
            "         count(DISTINCT term) AS n_distinct_tokens,"
            "         max(c) AS top_token_count"
            "  FROM ("
            "    SELECT doc_id, term, count(*) AS c FROM ("
            "      SELECT doc_id, unnest(w) AS term FROM toks)"
            "    GROUP BY doc_id, term)"
            "  GROUP BY doc_id"
            ") "
            "SELECT d.doc_id,"
            " CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,"
            " CAST(coalesce(p.n_distinct_tokens, 0) AS BIGINT)"
            "   AS n_distinct_tokens,"
            " CASE WHEN coalesce(p.n_tokens, 0) > 0 THEN"
            "   CAST(p.n_tokens - p.n_distinct_tokens AS DOUBLE) / p.n_tokens"
            "   ELSE 0.0 END AS dup_token_frac,"
            " CAST(coalesce(p.top_token_count, 0) AS BIGINT)"
            "   AS top_token_count,"
            " CASE WHEN coalesce(p.n_tokens, 0) > 0 THEN"
            "   CAST(p.top_token_count AS DOUBLE) / p.n_tokens"
            "   ELSE 0.0 END AS top_token_frac "
            "FROM documents d LEFT JOIN per p USING (doc_id)"
        ),
        "token_entropy": (
            "WITH " + _TOKS + ", tc AS ("
            "  SELECT doc_id, term, count(*) AS c FROM ("
            "    SELECT doc_id, unnest(w) AS term FROM toks)"
            "  GROUP BY doc_id, term"
            "), per AS ("
            "  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,"
            "         count(*) AS u,"
            "         sum(c * log2(CAST(c AS DOUBLE))) AS s"
            "  FROM tc GROUP BY doc_id"
            ") "
            "SELECT d.doc_id,"
            " CAST(coalesce(p.n, 0) AS BIGINT) AS n_tokens,"
            " CAST(coalesce(p.u, 0) AS BIGINT) AS n_distinct_tokens,"
            " CASE WHEN coalesce(p.n, 0) > 0 THEN"
            "   round(log2(CAST(p.n AS DOUBLE)) - p.s / p.n, 6)"
            " ELSE 0.0 END AS token_entropy "
            "FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id"
        ),
        "term_frequencies": (
            "WITH " + _TOKS + " "
            "SELECT term, count(*) AS cnt,"
            " count(DISTINCT doc_id) AS df "
            "FROM (SELECT doc_id, unnest(w) AS term FROM toks) "
            "GROUP BY term"
        ),
        "dup_ngram_chars": (
            "WITH " + _TOKS + ", "
            "ng2 AS ("
            "  SELECT doc_id, unnest(list_transform("
            "  generate_series(1, greatest(len(w) - 1, 0)),"
            "  i -> w[i] || ' ' || w[i+1])) AS g FROM toks"
            "), c2 AS ("
            "  SELECT doc_id, g, count(*) AS cnt FROM ng2 GROUP BY 1, 2"
            "), d2 AS ("
            "  SELECT doc_id, CAST(sum(CASE WHEN cnt >= 2"
            "  THEN cnt * length(g) ELSE 0 END) AS BIGINT) AS dup"
            "  FROM c2 GROUP BY doc_id"
            "), ng3 AS ("
            "  SELECT doc_id, unnest(list_transform("
            "  generate_series(1, greatest(len(w) - 2, 0)),"
            "  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g"
            "  FROM toks"
            "), c3 AS ("
            "  SELECT doc_id, g, count(*) AS cnt FROM ng3 GROUP BY 1, 2"
            "), d3 AS ("
            "  SELECT doc_id, CAST(sum(CASE WHEN cnt >= 2"
            "  THEN cnt * length(g) ELSE 0 END) AS BIGINT) AS dup"
            "  FROM c3 GROUP BY doc_id"
            "), ng4 AS ("
            "  SELECT doc_id, unnest(list_transform("
            "  generate_series(1, greatest(len(w) - 3, 0)),"
            "  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '"
            "  || w[i+3])) AS g FROM toks"
            "), c4 AS ("
            "  SELECT doc_id, g, count(*) AS cnt FROM ng4 GROUP BY 1, 2"
            "), d4 AS ("
            "  SELECT doc_id, CAST(sum(CASE WHEN cnt >= 2"
            "  THEN cnt * length(g) ELSE 0 END) AS BIGINT) AS dup"
            "  FROM c4 GROUP BY doc_id"
            ") "
            "SELECT d.doc_id,"
            " CASE WHEN d.n_chars > 0 THEN coalesce(d2.dup, 0)"
            "  / (d.n_chars * 1.0) ELSE 0.0 END AS dup2_frac,"
            " CASE WHEN d.n_chars > 0 THEN coalesce(d3.dup, 0)"
            "  / (d.n_chars * 1.0) ELSE 0.0 END AS dup3_frac,"
            " CASE WHEN d.n_chars > 0 THEN coalesce(d4.dup, 0)"
            "  / (d.n_chars * 1.0) ELSE 0.0 END AS dup4_frac"
            " FROM documents d"
            " LEFT JOIN d2 ON d2.doc_id = d.doc_id"
            " LEFT JOIN d3 ON d3.doc_id = d.doc_id"
            " LEFT JOIN d4 ON d4.doc_id = d.doc_id"
        ),
        "posting_lists": (
            "WITH " + _TOKS + ", "
            "td AS ("
            "  SELECT DISTINCT doc_id, unnest(w) AS term FROM toks"
            "), r AS ("
            "  SELECT term, doc_id, row_number() OVER ("
            "  PARTITION BY term ORDER BY doc_id) AS rn FROM td"
            "), dfs AS ("
            "  SELECT term, CAST(count(*) AS BIGINT) AS df FROM td"
            "  GROUP BY term"
            "), p AS ("
            "  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ','"
            "  ORDER BY rn) AS postings FROM r WHERE rn <= 16"
            "  GROUP BY term"
            ") "
            "SELECT term, df, postings FROM dfs JOIN p USING (term)"
        ),
        "top_terms_per_lang": (
            r"WITH t AS ("
            r"  SELECT coalesce(lang, '') AS lang, unnest(list_filter("
            r"    string_split_regex(text, '\s+'), x -> x <> '')) AS term"
            r"  FROM documents"
            r"), c AS ("
            r"  SELECT lang, term, count(*) AS cnt FROM t GROUP BY 1, 2"
            r") "
            r"SELECT lang, term, cnt, rank FROM ("
            r"  SELECT lang, term, cnt,"
            r"  CAST(row_number() OVER (PARTITION BY lang"
            r"    ORDER BY cnt DESC, term) AS BIGINT) AS rank FROM c"
            r") WHERE rank <= 10"
        ),
        "length_zscores": (
            "WITH st AS ("
            "  SELECT coalesce(lang, '') AS lang, count(*) AS n,"
            "  CAST(sum(CAST(n_chars AS HUGEINT)) AS DOUBLE) AS s,"
            "  CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS DOUBLE)"
            "    AS ss"
            "  FROM documents GROUP BY 1"
            ") "
            "SELECT d.doc_id, coalesce(d.lang, '') AS lang, d.n_chars, "
            "CASE WHEN (st.ss - st.s * st.s / st.n) / st.n > 0 "
            "THEN round((CAST(d.n_chars AS DOUBLE) - st.s / st.n)"
            "  / sqrt((st.ss - st.s * st.s / st.n) / st.n), 6) "
            "ELSE 0.0 END AS z_len "
            "FROM documents d JOIN st ON st.lang = coalesce(d.lang, '')"
        ),
        "vocab_growth": (
            r"WITH " + _TOKS + r", "
            r"f AS (SELECT term, min(doc_id) AS first_doc FROM ("
            r"  SELECT doc_id, unnest(w) AS term FROM toks)"
            r"  GROUP BY term), "
            r"p AS (SELECT unnest(list_transform(generate_series(0, 20),"
            r"  i -> CAST(2**i AS BIGINT))) AS prefix_docs) "
            r"SELECT p.prefix_docs,"
            r" CAST(count(*) FILTER (f.first_doc < p.prefix_docs)"
            r"   AS BIGINT) AS n_distinct_terms "
            r"FROM p LEFT JOIN f ON TRUE GROUP BY 1"
        ),
        "strided_windows": (
            "WITH " + _TOKS + ", "
            "nt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n"
            "  FROM toks), "
            "e AS (SELECT doc_id, n,"
            "  unnest(generate_series(0,"
            "    CAST((n + 63) // 64 AS BIGINT) - 1)) AS win_idx"
            "  FROM nt WHERE n > 0) "
            "SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx, "
            "CAST(win_idx * 64 AS BIGINT) AS tok_start, "
            "CAST(least(128, n - win_idx * 64) AS BIGINT) AS tok_len, "
            "least(128, n - win_idx * 64) = 128 AS is_full FROM e"
        ),
        "dsir_weights": (
            r"WITH " + _TOKS + r", "
            r"tok AS (SELECT doc_id, unnest(w) AS term FROM toks), "
            r"lab AS (SELECT doc_id,"
            r"  coalesce(lang = 'en', false) AS is_tgt FROM documents), "
            r"cnt AS (SELECT term,"
            r"  sum(CASE WHEN lab.is_tgt THEN 1 ELSE 0 END) AS tgt,"
            r"  sum(CASE WHEN lab.is_tgt THEN 0 ELSE 1 END) AS raw"
            r"  FROM tok JOIN lab USING (doc_id) GROUP BY term), "
            r"tots AS (SELECT CAST(sum(tgt) AS DOUBLE) AS tgt_tot,"
            r"  CAST(sum(raw) AS DOUBLE) AS raw_tot,"
            r"  CAST(count(*) AS DOUBLE) AS v FROM cnt), "
            r"ratio AS (SELECT term,"
            r"  ln((CAST(tgt AS DOUBLE) + 0.5) / (tgt_tot + 0.5 * v))"
            r"  - ln((CAST(raw AS DOUBLE) + 0.5) / (raw_tot + 0.5 * v))"
            r"  AS r FROM cnt CROSS JOIN tots), "
            r"dw AS (SELECT doc_id, term, count(*) AS tf FROM tok"
            r"  GROUP BY doc_id, term), "
            r"nt AS (SELECT doc_id, count(*) AS n_tokens FROM tok"
            r"  GROUP BY doc_id) "
            r"SELECT dw.doc_id, nt.n_tokens,"
            r" round(sum(CAST(dw.tf AS DOUBLE) * ratio.r), 6) AS weight"
            r" FROM dw JOIN ratio USING (term)"
            r" JOIN nt ON nt.doc_id = dw.doc_id"
            r" GROUP BY dw.doc_id, nt.n_tokens"
        ),
        "bm25_topk": (
            r"WITH " + _TOKS + r", "
            r"dl AS (SELECT doc_id, len(w) AS dl FROM toks), "
            r"stats AS (SELECT count(*) AS n,"
            r"  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl), "
            r"tf AS (SELECT doc_id, term, count(*) AS tf FROM ("
            r"    SELECT doc_id, unnest(w) AS term FROM toks)"
            r"  WHERE term IN ('spark', 'window', 'batch', 'stream')"
            r"  GROUP BY doc_id, term), "
            r"dfs AS (SELECT term, count(DISTINCT doc_id) AS df"
            r"  FROM tf GROUP BY term), "
            r"sc AS (SELECT tf.doc_id, sum("
            r"    ln((s.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)"
            r"    * (tf.tf * (1.2 + 1.0))"
            r"    / (tf.tf + 1.2 * ((1.0 - 0.75)"
            r"        + 0.75 * dl.dl / s.avgdl))) AS score"
            r"  FROM tf JOIN dfs USING (term)"
            r"  JOIN dl ON dl.doc_id = tf.doc_id"
            r"  CROSS JOIN stats s GROUP BY tf.doc_id) "
            r"SELECT doc_id, rank, score FROM ("
            r"  SELECT doc_id, round(score, 6) AS score,"
            r"  CAST(row_number() OVER (ORDER BY round(score, 6) DESC,"
            r"    doc_id) AS BIGINT) AS rank FROM sc"
            r") WHERE rank <= 20"
        ),
        "source_vocab_overlap": (
            r"WITH ts AS ("
            r"  SELECT DISTINCT source, term FROM ("
            r"    SELECT coalesce(source, '') AS source,"
            r"    unnest(list_filter(string_split_regex(text, '\s+'),"
            r"      x -> x <> '')) AS term FROM documents)"
            r"), vs AS ("
            r"  SELECT source, count(*) AS v FROM ts GROUP BY source"
            r"), i AS ("
            r"  SELECT a.source AS source_a, b.source AS source_b,"
            r"  count(*) AS n_common_terms"
            r"  FROM ts a JOIN ts b ON a.term = b.term"
            r"    AND a.source < b.source GROUP BY 1, 2"
            r") "
            r"SELECT source_a, source_b, n_common_terms,"
            r" va.v AS vocab_a, vb.v AS vocab_b,"
            r" CAST(n_common_terms AS DOUBLE)"
            r"  / (va.v + vb.v - n_common_terms) AS jaccard "
            r"FROM i JOIN vs va ON va.source = i.source_a "
            r"JOIN vs vb ON vb.source = i.source_b"
        ),
        "tfidf_top_terms": (
            "WITH " + _TOKS + ", tf AS ("
            "  SELECT doc_id, term, count(*) AS tf FROM ("
            "    SELECT doc_id, unnest(w) AS term FROM toks)"
            "  GROUP BY doc_id, term"
            "), dfs AS ("
            "  SELECT term, count(DISTINCT doc_id) AS df FROM ("
            "    SELECT doc_id, unnest(w) AS term FROM toks)"
            "  GROUP BY term"
            "), nn AS (SELECT count(*) AS n FROM documents), "
            "scored AS ("
            "  SELECT tf.doc_id, tf.term, tf.tf,"
            "         CAST(tf.tf * nn.n AS DOUBLE) / dfs.df AS score"
            "  FROM tf JOIN dfs USING (term) CROSS JOIN nn"
            ") "
            "SELECT doc_id, term, tf, score FROM ("
            "  SELECT *, row_number() OVER ("
            "    PARTITION BY doc_id ORDER BY score DESC, term) AS rn"
            "  FROM scored) WHERE rn <= 3"
        ),
        "token_chunks": (
            "WITH " + _TOKS + ", c AS ("
            "  SELECT doc_id, CAST(coalesce(len(w), 0) AS BIGINT)"
            "    AS n_tokens FROM toks"
            "), p AS ("
            "  SELECT doc_id, n_tokens,"
            "    CAST(coalesce(sum(n_tokens) OVER ("
            "      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING"
            "      AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before"
            "  FROM c"
            ") "
            "SELECT doc_id, n_tokens, tokens_before,"
            " tokens_before // 512 AS chunk_id FROM p"
        ),
        "heavy_hitters": (
            "WITH " + _TOKS + ", t AS ("
            "  SELECT unnest(w) AS term FROM toks"
            "), cnts AS ("
            "  SELECT term, count(*) AS cnt FROM t GROUP BY term"
            "), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cnts) "
            "SELECT c.term, c.cnt FROM cnts c, tot "
            "WHERE c.cnt * 500 >= tot.n"
        ),
        "vocab_stats": (
            "WITH " + _TOKS + ", t AS ("
            "  SELECT unnest(w) AS term FROM toks"
            "), cnts AS ("
            "  SELECT term, count(*) AS cnt FROM t GROUP BY term) "
            "SELECT CAST(count(*) AS BIGINT) AS n_terms,"
            " CAST(sum(cnt) AS BIGINT) AS n_tokens,"
            " CAST(count(*) FILTER (WHERE cnt = 1) AS BIGINT)"
            "   AS hapax_terms FROM cnts"
        ),
        "top_bigrams": (
            "WITH " + _TOKS + ", t AS ("
            "  SELECT unnest(w) AS term FROM toks"
            "), uc AS ("
            "  SELECT term, count(*) AS c FROM t GROUP BY term"
            "), tot AS (SELECT count(*) AS n FROM t"
            "), b AS ("
            "  SELECT unnest(list_zip(w[:len(w)-1], w[2:])) AS p"
            "  FROM toks WHERE len(w) >= 2"
            "), pcnt AS ("
            "  SELECT p[1] AS w1, p[2] AS w2, count(*) AS cnt FROM b"
            "  GROUP BY 1, 2"
            "), sel AS ("
            "  SELECT w1, w2, cnt FROM pcnt WHERE cnt >= 2"
            "  ORDER BY cnt DESC, w1, w2 LIMIT 100"
            ") SELECT s.w1, s.w2, s.cnt,"
            "  CAST(s.cnt * tot.n AS DOUBLE) / (u1.c * u2.c) AS lift"
            " FROM sel s CROSS JOIN tot"
            " JOIN uc u1 ON s.w1 = u1.term"
            " JOIN uc u2 ON s.w2 = u2.term"
        ),
        "line_dedup": (
            "WITH lines AS ("
            "  SELECT doc_id,"
            "         unnest(string_split(coalesce(text, ''), chr(10)))"
            "           AS line,"
            "         generate_subscripts("
            "           string_split(coalesce(text, ''), chr(10)), 1) AS pos"
            "  FROM documents"
            "), df AS (SELECT line, count(*) AS c FROM lines GROUP BY line) "
            "SELECT doc_id,"
            " coalesce(string_agg(line, chr(10) ORDER BY pos)"
            "   FILTER (WHERE c < 2), '') AS clean_text,"
            " count(*) AS n_lines,"
            " count(*) FILTER (WHERE c >= 2) AS n_removed "
            "FROM lines JOIN df USING (line) GROUP BY doc_id"
        ),
        "paragraph_dedup": (
            "WITH toks AS ("
            "  SELECT doc_id, list_filter(string_split_regex("
            "    coalesce(text, ''), '\\s+'), x -> x <> '') AS w"
            "  FROM documents"
            "), p AS ("
            "  SELECT doc_id, CAST(g AS BIGINT) AS pos,"
            "    array_to_string(w[g*10+1 : g*10+10], ' ') AS para"
            "  FROM toks, unnest(range(CAST(ceil("
            "    coalesce(len(w), 0) / 10.0) AS BIGINT))) AS t(g)"
            "), r AS ("
            "  SELECT doc_id, pos, para, row_number() OVER ("
            "    PARTITION BY para ORDER BY doc_id, pos) AS rn FROM p"
            "), k AS ("
            "  SELECT doc_id, string_agg(para, ' ' ORDER BY pos) AS text"
            "  FROM r WHERE rn = 1 GROUP BY doc_id"
            ") SELECT d.doc_id, coalesce(k.text, '') AS text"
            " FROM documents d LEFT JOIN k USING (doc_id)"
        ),
        "novel_docs": (
            "SELECT d.doc_id FROM documents d "
            "WHERE d.doc_id % 2 = 1 AND NOT EXISTS ("
            "  SELECT 1 FROM documents c WHERE c.doc_id % 2 = 0"
            "  AND coalesce(c.text, '') = coalesce(d.text, ''))"
        ),
        "pattern_scrub": (
            "WITH s0 AS (SELECT doc_id, coalesce(text, '') AS t"
            "  FROM documents), "
            "s1 AS (SELECT doc_id,"
            "  CAST(len(regexp_extract_all(t,"
            "    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))"
            "    AS BIGINT) AS n_email,"
            "  regexp_replace(t,"
            "    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',"
            "    '[EMAIL]', 'g') AS t FROM s0), "
            "s2 AS (SELECT doc_id, n_email,"
            "  CAST(len(regexp_extract_all(t,"
            "    '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS BIGINT)"
            "    AS n_ipv4,"
            "  regexp_replace(t, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b',"
            "    '[IP]', 'g') AS t FROM s1), "
            "s3 AS (SELECT doc_id, n_email, n_ipv4,"
            "  CAST(len(regexp_extract_all(t, '\\b(?:the|spark)\\b'))"
            "    AS BIGINT) AS n_boiler,"
            "  regexp_replace(t, '\\b(?:the|spark)\\b', '[B]', 'g') AS t"
            "  FROM s2) "
            "SELECT doc_id, t AS clean_text, n_email, n_ipv4, n_boiler,"
            " n_email + n_ipv4 + n_boiler AS n_redactions FROM s3"
        ),
        "embedding_cluster_labels": (
            "WITH RECURSIVE pairs AS ("
            "  SELECT a.vec_id AS va, b.vec_id AS vb FROM embeddings a"
            "  JOIN embeddings b ON a.vec_id < b.vec_id"
            "  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
            "    CAST(b.embedding AS DOUBLE[])) >= 0.4"
            "), edges AS ("
            "  SELECT va AS src, vb AS dst FROM pairs"
            "  UNION ALL SELECT vb, va FROM pairs"
            "), reach(v, lab) AS ("
            "  SELECT vec_id, vec_id FROM embeddings"
            "  UNION"
            "  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.v"
            ") "
            "SELECT v AS vec_id, min(lab) AS cluster_id FROM reach "
            "GROUP BY v"
        ),
        # lsh_dedup, simhash_near_pairs, doc_fingerprints, hamming_topk,
        # srp_near_pairs, itq_codes, ivf_topk, mrpt_topk, cluster_dup_spans,
        # winnow_fingerprints: hash-family-dependent / iterative /
        # span-structural — not SQL-expressible; driver records rows-only
        # checks (each has a pytest oracle: brute-force recall, golden
        # values, or structural contracts).
    }
    # the Bloom prefilter is lossless (no false negatives), so the scale
    # path must reproduce the exact scan bit-for-bit
    sql["bloom_contamination"] = sql["contamination"]
    return sql
