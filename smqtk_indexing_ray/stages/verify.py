"""Candidate-pair verification — the exact re-rank stage.

Analog of the reference's post-LSH exact-distance verification
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:499-518: fetch
candidate vectors, compute the exact metric, keep the best), restated as
two sort-merge payload attachments: candidate edges pick up each
endpoint's signature via :func:`smqtk_indexing_ray.stages.attach.
sort_attach` (the signature payload crosses the wire once per endpoint,
~0.5 KB/row, never the text), then a vectorized kernel computes the
estimated Jaccard (MinHash agreement fraction) and SimHash hamming
distance and filters below-threshold edges.

Hash joins were measured 2-10x slower here (per-join shuffle-aggregator
actor spin-up dominates; np=16: 36 s vs np=64: 145 s for the same data);
see stages/attach.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.functions.metrics import est_jaccard, hamming_u64
from smqtk_indexing_ray.registry import register_kernel, resolve_kernel
from smqtk_indexing_ray.stages.attach import sort_attach


@register_kernel("verify", "est-jaccard-or-simhash")
def keep_either(ej: np.ndarray, ham: np.ndarray,
                cfg: DedupConfig) -> np.ndarray:
    """Default edge gate: MinHash est-Jaccard above threshold OR SimHash
    hamming at most the max (the pipeline's recall belt-and-braces)."""
    return (ej >= cfg.verify_threshold) | (ham <= cfg.simhash_hamming_max)


@register_kernel("verify", "est-jaccard")
def keep_minhash_only(ej: np.ndarray, ham: np.ndarray,
                      cfg: DedupConfig) -> np.ndarray:
    """MinHash-only gate (ignore SimHash) — the reference's pure
    LSH-functor verification path (lsh.py:499-518 re-ranks on one
    metric)."""
    return ej >= cfg.verify_threshold


@register_kernel("verify", "simhash")
def keep_simhash_only(ej: np.ndarray, ham: np.ndarray,
                      cfg: DedupConfig) -> np.ndarray:
    """SimHash-only gate."""
    return ham <= cfg.simhash_hamming_max


def u8_matrix(col, p: int) -> np.ndarray:
    """Zero-copy (n, p) uint8 view of a ``fixed_size_binary[p]`` column
    (the MinHash verify sketch).  Honors chunk offsets; shared by every
    signature-scoring consumer so the buffer-slicing subtlety lives in
    exactly one place."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buf = col.buffers()[1]
    arr = np.frombuffer(buf, dtype=np.uint8)
    start = col.offset * p
    return arr[start:start + len(col) * p].reshape(len(col), p)


def _rename(mapping):
    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or any(c not in t.column_names for c in mapping):
            return t
        return t.rename_columns(
            [mapping.get(c, c) for c in t.column_names])
    return f


#: Broadcast gate for the verify sketch table: below this many
#: signature rows the (doc_id, mh8, simhash) arrays are ``ray.put``
#: once (~(num_perms + 16) B/row, e.g. 2M x 144 B = ~290 MB pinned in
#: plasma, read zero-copy by every task) and BOTH endpoint attaches
#: collapse into one streaming lookup map over the edges — no union
#: sorts.  Above it the two sort-merge attaches run (the 100-TB path);
#: same convention as ``stages/attach.BROADCAST_ATTACH_MAX_ROWS``.
VERIFY_BROADCAST_MAX_ROWS = 2_000_000


def verify_edges(edges, signatures, cfg: DedupConfig, *,
                 num_partitions: int = 32,
                 broadcast_max_rows: int = VERIFY_BROADCAST_MAX_ROWS):
    """edges(u, v) x signatures -> verified edges (u, v, est_jaccard,
    hamming).  The keep mask comes from the ``cfg.verify_kernel`` registry
    entry (default ``est-jaccard-or-simhash``: est_jaccard above threshold
    OR hamming at most the max); resolution happens here at pipeline-build
    time so test-local kernels ship in the task closure.  ``num_partitions``
    kept for API symmetry (sort_attach's sort picks its own partitioning).

    ``edges`` must be globally (u, v)-duplicate-free on the broadcast
    path (``dedup_edges`` guarantees this exactly); the sort path also
    tolerates duplicates via its fused ``dedup_rows_on``.  Callers pass
    MATERIALIZED or checkpoint-backed signatures (every call site does),
    so the row-count gate probe is metadata-cheap.
    """
    keep_fn = resolve_kernel("verify", cfg.verify_kernel)
    num_perms = cfg.num_perms
    mh8_type = pa.binary(num_perms)

    if signatures.count() <= broadcast_max_rows:
        return _verify_broadcast(edges, signatures, cfg, keep_fn,
                                 num_perms)

    # The signature stage already emits the 8-bit-per-perm verify sketch
    # (est-Jaccard bias from low-byte truncation is (1-J)/256 < 0.004);
    # the attach sort is bandwidth-bound on exactly this payload.
    sig = signatures.select_columns(["doc_id", "mh8", "simhash"])
    sig_schema = pa.schema([("doc_id", pa.int64()), ("mh8", mh8_type),
                            ("simhash", pa.int64())])
    uv_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    # dedup_rows_on=["v"]: raw star edges repeat a pair once per colliding
    # band; fusing the (u, v) dedup into this attach's sort removes the
    # standalone edge-dedup sort the pipeline used to run (VERDICT r1 #2)
    e1 = sort_attach(edges, sig, key="u", payload_key="doc_id",
                     payload_cols=["mh8", "simhash"], how="inner",
                     rows_schema=uv_schema, payload_schema=sig_schema,
                     dedup_rows_on=["v"])
    e1 = e1.map_batches(_rename({"mh8": "mh8_u", "simhash": "simhash_u"}),
                        batch_format="pyarrow")
    e1_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                           ("mh8_u", mh8_type), ("simhash_u", pa.int64())])
    e2 = sort_attach(e1, sig, key="v", payload_key="doc_id",
                     payload_cols=["mh8", "simhash"], how="inner",
                     rows_schema=e1_schema, payload_schema=sig_schema)
    e2 = e2.map_batches(_rename({"mh8": "mh8_v", "simhash": "simhash_v"}),
                        batch_format="pyarrow")

    def score(t: pa.Table) -> pa.Table:
        needed = ("u", "v", "mh8_u", "mh8_v", "simhash_u", "simhash_v")
        if t.num_rows == 0 or any(c not in t.column_names for c in needed):
            # zero-column empty blocks flow through — re-stamp the schema
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64()),
                             "hamming": pa.array([], pa.int32())})
        mu = u8_matrix(t["mh8_u"], num_perms)
        mv = u8_matrix(t["mh8_v"], num_perms)
        ej = est_jaccard(mu, mv)
        su = t["simhash_u"].to_numpy(zero_copy_only=False).view(np.uint64)
        sv = t["simhash_v"].to_numpy(zero_copy_only=False).view(np.uint64)
        ham = hamming_u64(su, sv).astype(np.int32)
        keep = keep_fn(ej, ham, cfg)
        return pa.table({
            "u": t["u"].to_numpy(zero_copy_only=False)[keep],
            "v": t["v"].to_numpy(zero_copy_only=False)[keep],
            "est_jaccard": ej[keep],
            "hamming": ham[keep],
        })

    return e2.map_batches(score, batch_format="pyarrow")


def _verify_broadcast(edges, signatures, cfg: DedupConfig, keep_fn,
                      num_perms: int):
    """Broadcast twin of the sort-merge verify: the whole
    (doc_id, mh8, simhash) sketch table rides plasma once and each edge
    batch gathers both endpoints' sketches with two ``searchsorted``
    lookups — the edges stream through ONE map, no union sorts.  Exact
    same scoring kernel and inner-endpoint-join semantics."""
    import ray

    from smqtk_indexing_ray.stages.attach import _broadcast_cache_get

    sig = signatures.select_columns(["doc_id", "mh8", "simhash"])
    mat = sig.materialize()
    refs = [ref for bundle in mat.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks
            if meta.num_rows is None or meta.num_rows > 0]
    tables = [t for t in ray.get(refs)
              if t.num_rows and "doc_id" in t.column_names]
    if tables:
        tbl = pa.concat_tables(tables).combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        mh = u8_matrix(tbl["mh8"], num_perms)
        sh = tbl["simhash"].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        o = np.argsort(ids, kind="stable")
        ids = np.ascontiguousarray(ids[o])
        mh = np.ascontiguousarray(mh[o])
        sh = np.ascontiguousarray(sh[o])
    else:
        ids = np.empty(0, np.int64)
        mh = np.empty((0, num_perms), np.uint8)
        sh = np.empty(0, np.int64)
    ref = ray.put((ids, mh, sh))

    def score_direct(t: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "est_jaccard": pa.array([], pa.float64()),
                          "hamming": pa.array([], pa.int32())})
        if t.num_rows == 0 or "u" not in t.column_names:
            return empty
        bids, bmh, bsh = _broadcast_cache_get(ref)
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64,
                                                         copy=False)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64,
                                                         copy=False)
        if not len(bids):
            return empty
        iu = np.clip(np.searchsorted(bids, u), 0, len(bids) - 1)
        iv = np.clip(np.searchsorted(bids, v), 0, len(bids) - 1)
        # inner-join semantics on both endpoints (matches the sort path)
        hit = (bids[iu] == u) & (bids[iv] == v)
        if not hit.any():
            return empty
        u, v, iu, iv = u[hit], v[hit], iu[hit], iv[hit]
        ej = est_jaccard(bmh[iu], bmh[iv])
        ham = hamming_u64(bsh[iu].view(np.uint64),
                          bsh[iv].view(np.uint64)).astype(np.int32)
        keep = keep_fn(ej, ham, cfg)
        return pa.table({
            "u": u[keep], "v": v[keep],
            "est_jaccard": ej[keep], "hamming": ham[keep],
        })

    # batch_size=None: the lookup is vectorized, slicing into default
    # batches only multiplies per-call overhead (broadcast_attach note)
    return edges.map_batches(score_direct, batch_format="pyarrow",
                             batch_size=None)
