"""Batched 128-perm MinHash — the LshFunctor analog.

The reference hashes one descriptor at a time
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:316-318,
``h_vec = lsh_functor.get_hash(d.vector())``); here a whole Arrow batch of
documents is signed in a handful of NumPy segmented reductions.

Hash family: ``h_i(x) = (a_i * x + b_i) >> 32`` over uint64 with wraparound
(multiply-add-shift universal hashing).  ``a_i`` odd, seeded — fixed seeds
replace the reference's only trained functor (ITQ fit, itq.py:291-387):
MinHash needs no global fit, which removes the driver-side training step
entirely.
"""

from __future__ import annotations

import numpy as np

UINT32_MAX = np.uint32(0xFFFFFFFF)


def make_perms(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) parameter vectors for the multiply-add-shift family."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perms, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)
    return a, b


def minhash_signatures(shingles: np.ndarray, offsets: np.ndarray,
                       a: np.ndarray, b: np.ndarray,
                       perm_chunk: int | None = None) -> np.ndarray:
    """MinHash signatures for a batch in flat+offsets layout.

    Returns ``(n_docs, num_perms) uint32``.  Documents with zero shingles get
    the sentinel signature (all ``0xFFFFFFFF``) and must be excluded from
    near-dup banding by the caller (they remain exact-dup eligible).

    Vectorization: one flat 1-D pass per permutation — hash the whole
    shingle stream, then one 1-D ``np.minimum.reduceat`` per permutation.
    Chunking permutations into a 2-D ``(total_shingles, chunk)`` temporary
    is ~25x SLOWER (measured): the outer-product layout blows the cache
    and ``reduceat`` along axis 0 of a 2-D array falls off NumPy's fast
    path.  ``perm_chunk`` is accepted for backwards compatibility and
    ignored.
    """
    num_perms = len(a)
    n_docs = len(offsets) - 1
    sig = np.full((n_docs, num_perms), UINT32_MAX, dtype=np.uint32)
    counts = np.diff(offsets)
    nz = counts > 0
    if not nz.any():
        return sig
    starts_nz = offsets[:-1][nz]
    with np.errstate(over="ignore"):
        for i in range(num_perms):
            v = (shingles * a[i] + b[i]) >> np.uint64(32)
            sig[nz, i] = np.minimum.reduceat(v, starts_nz).astype(np.uint32)
    return sig
