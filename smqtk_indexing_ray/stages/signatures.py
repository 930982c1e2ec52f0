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
    null_mask = nulls.to_numpy(zero_copy_only=False)
    texts = text.to_pylist()
    htmls = batch["html"].to_pylist()
    for i in np.flatnonzero(null_mask):
        texts[i] = extract_text_from_html(htmls[i])
    return batch.set_column(
        batch.schema.get_field_index("text"), "text",
        pa.array(texts, type=pa.string()))


def _u64_to_i64(a: np.ndarray) -> np.ndarray:
    return a.view(np.int64)


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
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(np.diff(off).astype(np.int32)),
            "n_shingles": pa.array(np.diff(sh_off).astype(np.int32)),
            # fixed_size_binary: the only fixed-width layout pyarrow's hash
            # join accepts as a payload column (fixed_size_list is rejected)
            "minhash": _sig_to_binary(sig, cfg.num_perms),
            "simhash": pa.array(_u64_to_i64(simh)),
            "text_h1": pa.array(_u64_to_i64(h1)),
            "text_h2": pa.array(_u64_to_i64(h2)),
        }) if n else _empty_signature_table(cfg)


def _empty_signature_table(cfg: DedupConfig) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "n_tokens": pa.array([], type=pa.int32()),
        "n_shingles": pa.array([], type=pa.int32()),
        "minhash": pa.array([], type=pa.binary(cfg.num_perms * 4)),
        "simhash": pa.array([], type=pa.int64()),
        "text_h1": pa.array([], type=pa.int64()),
        "text_h2": pa.array([], type=pa.int64()),
    })


def _sig_to_binary(sig: np.ndarray, num_perms: int) -> pa.Array:
    """(n, P) uint32 -> fixed_size_binary[P*4], zero-copy over sig's bytes."""
    n = sig.shape[0]
    buf = pa.py_buffer(np.ascontiguousarray(sig).view(np.uint8).reshape(-1))
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(num_perms * 4), n, [None, buf])


def minhash_matrix(col: pa.ChunkedArray | pa.Array, num_perms: int) -> np.ndarray:
    """Zero-copy view of a ``fixed_size_binary[P*4]`` column as (n, P) uint32."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    buf = col.buffers()[1]
    arr = np.frombuffer(buf, dtype=np.uint32)
    start = col.offset * num_perms
    return arr[start:start + n * num_perms].reshape(n, num_perms)
