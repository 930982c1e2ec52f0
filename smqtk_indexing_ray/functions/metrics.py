"""Vectorized distance / similarity kernels.

Analog of /root/reference/smqtk_indexing/utils/metrics.py:7-155, which
implements euclidean / cosine / histogram-intersection over single vectors
and ``hamming_distance`` as ``bin(i ^ j).count('1')`` on Python ints
(metrics.py:140-155).  Every kernel here is batched NumPy over whole
columns.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def popcount_u64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over a uint64 array (NumPy 1.x has no bitwise_count)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x -= (x >> np.uint64(1)) & _M1
        x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
        x = (x + (x >> np.uint64(4))) & _M4
        return ((x * _H01) >> np.uint64(56)).astype(np.uint8)


def hamming_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise hamming distance between two uint64 columns (0..64).

    Reference computes this one pair at a time on Python ints
    (metrics.py:140-155); normalized form (``/ 64``) matches HashIndex.nn's
    normalized-hamming contract (interfaces/hash_index.py:92-94).
    """
    return popcount_u64(np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64)))


# per-byte popcount lookup (256 entries) — the multi-word analog of
# popcount_u64 for arbitrary-width codes stored as (n, nbytes) uint8
_POP8 = popcount_u64(np.arange(256, dtype=np.uint64)).astype(np.uint8)


def popcount_bytes(x: np.ndarray) -> np.ndarray:
    """Popcount summed over the LAST axis of a uint8 array — one int64
    count per leading-shape element.  Vectorized table lookup; supports
    any code width (the reference's arbitrary-precision-int popcount is
    ``bin(i).count('1')``, utils/metrics.py:140-155)."""
    return _POP8[x].sum(axis=-1, dtype=np.int64)


def hamming_bytes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hamming distance between byte-matrix codes; broadcasts like
    ``a ^ b`` with the byte axis last (e.g. ``a[:, None, :]`` vs
    ``b[None, :, :]`` for an all-pairs (nq, n) matrix)."""
    return popcount_bytes(np.bitwise_xor(a, b))


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard from row-aligned MinHash signature matrices.

    ``sig_a``/``sig_b`` are ``(n_pairs, num_perms)``; the estimate is the
    fraction of agreeing components — the batch analog of the reference's
    exact-distance re-rank of LSH candidates (impls/nn_index/lsh.py:499-518).
    """
    return (sig_a == sig_b).mean(axis=1)


def cosine_distance(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    """1 - cosine similarity of each row of ``mat`` against vector ``q``
    (reference: utils/metrics.py:120-137)."""
    qn = np.linalg.norm(q)
    mn = np.linalg.norm(mat, axis=1)
    denom = np.where(mn * qn == 0, 1.0, mn * qn)
    sim = (mat @ q) / denom
    sim = np.where((mn == 0) | (qn == 0), 0.0, sim)
    return 1.0 - sim


def euclidean_distance(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row-wise L2 distance (reference: utils/metrics.py:73-86)."""
    d = mat - q[None, :]
    return np.sqrt((d * d).sum(axis=1))


def histogram_intersection_distance(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    """1 - histogram intersection (reference: utils/metrics.py:49-70)."""
    return 1.0 - np.minimum(mat, q[None, :]).sum(axis=1)


def round6(x: np.ndarray) -> np.ndarray:
    """Round to 6 decimals with DuckDB's semantics (half away from zero,
    computed as floor(|x|*1e6 + 0.5)/1e6).

    Neither ``pyarrow.compute.round`` nor ``np.round`` matches DuckDB
    bit-for-bit (pc.round(83.17999999999999, 6) returns the input;
    np.round is half-to-even) — and the driver's correctness gate hashes
    float bits, so every oracle-checked double goes through this.
    """
    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6
