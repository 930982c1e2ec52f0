"""Signature stage: pages -> (doc_id, n_tokens, n_shingles, minhash,
simhash, text_h1, text_h2).

The LshFunctor application loop of the reference
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:316-321 hashes one
descriptor per iteration) becomes one actor-pool ``map_batches`` stage:
permutation tables are built once per actor in ``__init__`` (the analog of
the functor's model load, itq.py:209-237) and each ``__call__`` signs a
whole zero-copy Arrow batch with segmented NumPy reductions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.functions.hashing import hash_strings_u64
from smqtk_indexing_ray.functions.minhash import make_perms, minhash_signatures
from smqtk_indexing_ray.functions.simhash import simhash_fingerprints
from smqtk_indexing_ray.functions.tokenize import (
    extract_text_from_html,
    shingle_flat,
    tokenize_flat,
)
from smqtk_indexing_ray.registry import register_kernel


def extract_text_stage(batch: pa.Table) -> pa.Table:
    """Fill null ``text`` from ``html`` (pure kernel, versioned).

    Only null-text rows are touched (a Python loop over that small
    minority); rows that already carry text are passed through untouched to
    preserve the byte-identical-text-per-url invariant.
    """
    text = batch["text"]
    nulls = pc.is_null(text)
    if not pc.any(nulls).as_py():
        return batch
    # slice to the null minority BEFORE leaving Arrow: only those rows'
    # html is pulled out (HTML extraction is inherently per-row), and the
    # results are scattered back with one replace_with_mask
    null_idx = np.flatnonzero(nulls.to_numpy(zero_copy_only=False))
    htmls = batch["html"].take(pa.array(null_idx, pa.int64())).to_pylist()
    extracted = pa.array([extract_text_from_html(h) for h in htmls],
                         type=pa.string())
    text_c = text.combine_chunks() if isinstance(text, pa.ChunkedArray) \
        else text
    new_text = pc.replace_with_mask(
        text_c, nulls.combine_chunks() if isinstance(nulls, pa.ChunkedArray)
        else nulls, extracted)
    return batch.set_column(
        batch.schema.get_field_index("text"), "text",
        pc.cast(new_text, pa.string()))


def _u64_to_i64(a: np.ndarray) -> np.ndarray:
    return a.view(np.int64)


@register_kernel("signature", "minhash-simhash")
class SignatureStage:
    """Callable class for ``map_batches(SignatureStage, fn_constructor_args=
    (cfg,), concurrency=N)`` — one seed-table build per actor."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.perm_a, self.perm_b = make_perms(cfg.num_perms, cfg.seed)
        self.key1 = cfg.hash_key
        self.key2 = cfg.hash_key[::-1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        text = pc.fill_null(batch["text"], "")
        tok, off = tokenize_flat(text, lowercase=cfg.lowercase,
                                 hash_key=cfg.hash_key)
        shingles, sh_off = shingle_flat(tok, off, cfg.shingle_k)
        sig = minhash_signatures(shingles, sh_off, self.perm_a, self.perm_b)
        simh = simhash_fingerprints(tok, off)
        # 128-bit content identity on the RAW text bytes (exact-dup key).
        # 64 bits would collide at the 10^12-doc design scale.
        h1 = hash_strings_u64(text, hash_key=self.key1)
        h2 = hash_strings_u64(text, hash_key=self.key2)
        n = batch.num_rows
        if not n:
            return _empty_signature_table(cfg)
        # The full (num_perms x uint32) signature never leaves this stage:
        # downstream needs only (a) the per-band LSH keys (computed here,
        # once) and (b) an 8-bit-per-perm verify sketch (est-Jaccard bias
        # from low-byte truncation is (1-J)/256 < 0.004).  This keeps the
        # materialized table ~2.4x narrower than shipping raw signatures.
        from smqtk_indexing_ray.functions.hashing import fold_rows_u64
        r, b = cfg.rows_per_band, cfg.bands
        bands = np.empty((n, b), dtype=np.int64)
        for band in range(b):
            bands[:, band] = fold_rows_u64(
                sig[:, band * r:(band + 1) * r],
                salt=np.uint64(band + 1)).view(np.int64)
        mh8 = np.ascontiguousarray(sig.astype(np.uint8))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(np.diff(off).astype(np.int32)),
            "n_shingles": pa.array(np.diff(sh_off).astype(np.int32)),
            # fixed_size_binary: the only fixed-width layout pyarrow's
            # acero kernels accept as a payload (fixed_size_list rejected)
            "mh8": _bytes_to_binary(mh8, cfg.num_perms),
            "bands": _bytes_to_binary(
                np.ascontiguousarray(bands).view(np.uint8).reshape(n, -1),
                b * 8),
            "simhash": pa.array(_u64_to_i64(simh)),
            "text_h1": pa.array(_u64_to_i64(h1)),
            "text_h2": pa.array(_u64_to_i64(h2)),
        })


def _empty_signature_table(cfg: DedupConfig) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "n_tokens": pa.array([], type=pa.int32()),
        "n_shingles": pa.array([], type=pa.int32()),
        "mh8": pa.array([], type=pa.binary(cfg.num_perms)),
        "bands": pa.array([], type=pa.binary(cfg.bands * 8)),
        "simhash": pa.array([], type=pa.int64()),
        "text_h1": pa.array([], type=pa.int64()),
        "text_h2": pa.array([], type=pa.int64()),
    })


def _bytes_to_binary(mat: np.ndarray, width: int) -> pa.Array:
    """(n, width) uint8 -> fixed_size_binary[width], zero-copy."""
    n = mat.shape[0]
    buf = pa.py_buffer(mat.reshape(-1))
    return pa.FixedSizeBinaryArray.from_buffers(pa.binary(width), n,
                                                [None, buf])


def fixed_binary_matrix(col: pa.ChunkedArray | pa.Array, width: int,
                        dtype=np.uint8) -> np.ndarray:
    """Zero-copy view of a ``fixed_size_binary[width]`` column as an
    (n, width/itemsize) array of ``dtype``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    buf = col.buffers()[1]
    arr = np.frombuffer(buf, dtype=dtype)
    per = width // np.dtype(dtype).itemsize
    start = col.offset * per
    return arr[start:start + n * per].reshape(n, per)
