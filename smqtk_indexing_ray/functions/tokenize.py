"""Webtext front-end kernels: HTML -> text extraction, normalization,
tokenization and w-shingling — all operating on whole Arrow batches.

This is the piece the reference does not have (it consumes pre-computed
descriptor vectors); the per-row invariant we guarantee instead is
byte-identical extracted ``text`` per ``url`` (BASELINE.json input_hint):
:func:`extract_text_from_html` is a pure function of the html bytes, and its
behavior is versioned by ``EXTRACT_VERSION`` recorded in checkpoint lineage.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from smqtk_indexing_ray.functions.hashing import (
    _FNV_PRIME,
    grouped_arange,
    hash_strings_u64,
    splitmix64,
)

EXTRACT_VERSION = "extract-v1"

_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"\s+")


def extract_text_from_html(html: bytes | None) -> str | None:
    """Pure, deterministic HTML -> text: strip tags, collapse whitespace.

    Intentionally simple (no external parser libs in this container); the
    contract that matters is purity: the same bytes always produce the same
    text, so re-running a partition after a task retry is value-stable.
    """
    if html is None:
        return None
    no_tags = _TAG_RE.sub(b" ", html)
    collapsed = _WS_RE.sub(b" ", no_tags).strip()
    return collapsed.decode("utf-8", errors="replace")


def normalize_text(texts: pa.Array | pa.ChunkedArray,
                   lowercase: bool = True) -> pa.Array:
    """Vectorized normalization: null -> "", optional lowercase."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    if lowercase:
        texts = pc.utf8_lower(texts)
    return texts


def tokens_flat(texts: pa.Array | pa.ChunkedArray,
                lowercase: bool = True,
                ) -> tuple[pa.Array, np.ndarray]:
    """Whitespace-tokenize a batch into a flat token-string stream.

    Returns ``(flat_tokens, offsets)``: all tokens of all docs concatenated
    as one Arrow string array plus int64 offsets (len n_docs+1) delimiting
    each document's slice.  Empty tokens (from leading/trailing/runs of
    whitespace or empty docs) are dropped.
    """
    texts = normalize_text(texts, lowercase=lowercase)
    lists = pc.utf8_split_whitespace(texts)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    # utf8_split_whitespace of "" yields [""] — trim those empty tokens by
    # filtering the flat values (empty strings can only arise from
    # leading/trailing/double whitespace or empty docs).
    flat = lists.values if hasattr(lists, "values") else lists.flatten()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(pc.binary_length(flat), 0)
    if pc.any(pc.invert(nonempty)).as_py():
        keep = nonempty.to_numpy(zero_copy_only=False)
        # per-doc counts of kept tokens
        doc_ids = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        counts = np.bincount(doc_ids[keep], minlength=len(offsets) - 1)
        flat = flat.filter(pa.array(keep))
        offsets = np.concatenate([[0], counts.cumsum()]).astype(np.int64)
    return flat, offsets


def tokenize_flat(texts: pa.Array | pa.ChunkedArray,
                  lowercase: bool = True,
                  hash_key: str = "smqtk-ray-v1.0.0",
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a batch of documents into a flat token-hash stream.

    Returns ``(token_hashes, offsets)`` where ``token_hashes`` is uint64 of
    all tokens of all docs concatenated and ``offsets`` (int64, len n_docs+1)
    delimits each document's slice.  This flat layout is what makes MinHash /
    SimHash fully vectorizable across a batch (segmented reductions via
    ``np.minimum.reduceat`` / ``np.add.reduceat``).
    """
    flat, offsets = tokens_flat(texts, lowercase=lowercase)
    tok = hash_strings_u64(flat, hash_key=hash_key)
    return tok, offsets


def shingle_flat(token_hashes: np.ndarray, offsets: np.ndarray, k: int,
                 ) -> tuple[np.ndarray, np.ndarray]:
    """k-token w-shingles as combined uint64 hashes, flat + offsets layout.

    A shingle hash is an order-sensitive rotate-multiply-xor fold of the k
    token hashes, finalized with splitmix64 — computed for every position in
    the flat stream at once, then masked down to positions that do not cross
    a document boundary.
    """
    n = len(token_hashes)
    n_docs = len(offsets) - 1
    lens = np.diff(offsets)
    counts = np.maximum(lens - k + 1, 0)
    m = n - k + 1
    if m <= 0 or counts.sum() == 0:
        return (np.empty(0, dtype=np.uint64),
                np.zeros(n_docs + 1, dtype=np.int64))
    with np.errstate(over="ignore"):
        # out= buffers: the fold is 5 elementwise ops x k passes over the
        # stream; letting each op allocate a fresh temporary doubles the
        # memory traffic and churns mmap at high concurrency
        acc = np.zeros(m, dtype=np.uint64)
        tmp = np.empty(m, dtype=np.uint64)
        for j in range(k):
            np.left_shift(acc, np.uint64(13), out=tmp)
            np.right_shift(acc, np.uint64(51), out=acc)
            np.bitwise_or(tmp, acc, out=acc)
            np.multiply(acc, _FNV_PRIME, out=acc)
            np.bitwise_xor(acc, token_hashes[j:j + m], out=acc)
        acc = splitmix64(acc)
    starts = offsets[:-1]
    idx = np.repeat(starts, counts) + grouped_arange(counts)
    shingles = acc[idx]
    sh_offsets = np.concatenate([[0], counts.cumsum()]).astype(np.int64)
    return shingles, sh_offsets
