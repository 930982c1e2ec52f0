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
    starts_nz = offsets[:-1][nz]
    half = counts[nz].astype(np.uint64)  # compare 2*ones > n  <=>  ones*2 > n
    one = np.uint64(1)
    acc = np.zeros(int(nz.sum()), dtype=np.uint64)
    for j in range(64):
        bit_col = (token_hashes >> np.uint64(j)) & one
        ones = np.add.reduceat(bit_col, starts_nz)
        acc |= ((ones * np.uint64(2) > half).astype(np.uint64) << np.uint64(j))
    out[nz] = acc
    return out
