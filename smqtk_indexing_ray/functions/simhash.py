"""Batched 64-bit SimHash fingerprints.

Mathematical descendant of the reference's random-projection functor
(/root/reference/smqtk_indexing/impls/lsh_functor/simple_rp.py:71-127,
``hash = (x - mean) . RP >= 0``): SimHash replaces the dense Gaussian
projection with implicit +/-1 hyperplanes addressed by token hashes, so no
projection matrix is stored and no fit is needed.

Bit j of a document's fingerprint is 1 iff more than half of its tokens have
bit j set in their uint64 token hash (majority vote of +/-1 contributions).
"""

from __future__ import annotations

import numpy as np


def simhash_fingerprints(token_hashes: np.ndarray,
                         offsets: np.ndarray) -> np.ndarray:
    """SimHash for a batch in flat+offsets layout -> ``(n_docs,) uint64``.

    Documents with zero tokens get fingerprint 0.  Vectorized as 64
    segmented sums (one ``np.add.reduceat`` per bit over the uint64 stream —
    no per-doc loop, no (n, 64) blow-up in a wide dtype).
    """
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    counts = np.diff(offsets)
    nz = counts > 0
    if not nz.any():
        return out
    nz_docs = np.flatnonzero(nz)
    starts_nz = offsets[:-1][nz]          # strictly increasing
    half = counts[nz].astype(np.uint64)  # compare 2*ones > n  <=>  ones*2 > n
    one = np.uint64(1)
    total = int(offsets[-1])
    # Chunked like minhash_signatures: stream the token hashes from DRAM
    # once per L2-sized chunk and run all 64 bit-extractions over the
    # cached slice with a preallocated buffer; per-doc bit counts fold
    # into a (64, n_nz) accumulator (sum of chunk partials == global
    # sum).  The one-pass-per-bit form re-streamed the stream 64 times
    # and stalled on memory bandwidth at high concurrency.
    chunk = 1 << 16
    onesT = np.zeros((64, len(nz_docs)), dtype=np.uint64)
    buf = np.empty(min(chunk, total), dtype=np.uint64)
    for s0 in range(0, total, chunk):
        s1 = min(total, s0 + chunk)
        block = token_hashes[s0:s1]
        vb = buf[:s1 - s0]
        j0 = max(0, np.searchsorted(starts_nz, s0, side="right") - 1)
        j1 = np.searchsorted(starts_nz, s1, side="left")
        local = np.clip(starts_nz[j0:j1], s0, s1) - s0
        for j in range(64):
            np.right_shift(block, np.uint64(j), out=vb)
            np.bitwise_and(vb, one, out=vb)
            m = np.add.reduceat(vb, local)
            row = onesT[j]
            # only the chunk's first segment can straddle the boundary
            row[j0 + 1:j1] = m[1:]
            row[j0] += m[0]
    acc = np.zeros(len(nz_docs), dtype=np.uint64)
    for j in range(64):
        acc |= ((onesT[j] * np.uint64(2) > half).astype(np.uint64)
                << np.uint64(j))
    out[nz_docs] = acc
    return out
