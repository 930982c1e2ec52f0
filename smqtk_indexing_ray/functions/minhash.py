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


#: Shingles per cache block: 2 x 512 KiB u64 working set (the shingle
#: slice + the hash buffer) stays L2-resident, so the 128 permutation
#: passes re-read cache, not DRAM.
_SHINGLE_CHUNK = 1 << 16


def minhash_signatures(shingles: np.ndarray, offsets: np.ndarray,
                       a: np.ndarray, b: np.ndarray,
                       perm_chunk: int | None = None) -> np.ndarray:
    """MinHash signatures for a batch in flat+offsets layout.

    Returns ``(n_docs, num_perms) uint32``.  Documents with zero shingles get
    the sentinel signature (all ``0xFFFFFFFF``) and must be excluded from
    near-dup banding by the caller (they remain exact-dup eligible).

    Vectorization: the flat shingle stream is processed in L2-sized
    chunks; within a chunk every permutation runs over the cached slice
    with a preallocated ``out=`` hash buffer (no per-perm allocation),
    and per-doc partial minima fold into the signature with
    ``np.minimum`` — bit-identical to the one-pass-per-perm form (min of
    chunk minima == global min) while cutting the kernel's DRAM traffic
    ~num_perms-fold.  The naive one-pass-per-perm layout re-streamed the
    whole stream (plus three temporaries) from DRAM 128 times, which
    saturated memory bandwidth when 32 workers ran concurrently — the
    measured per-doc UDF cost DOUBLED at 32-way vs 8-way concurrency.
    Chunking permutations into a 2-D ``(total_shingles, chunk)``
    temporary is ~25x slower still (outer-product layout blows the
    cache); ``perm_chunk`` is accepted for backwards compatibility and
    ignored.
    """
    num_perms = len(a)
    n_docs = len(offsets) - 1
    counts = np.diff(offsets)
    nz = counts > 0
    if not nz.any():
        return np.full((n_docs, num_perms), UINT32_MAX, dtype=np.uint32)
    nz_docs = np.flatnonzero(nz)
    starts_nz = offsets[:-1][nz]          # strictly increasing
    total = int(offsets[-1])
    # transposed accumulator: per-perm rows are contiguous for the
    # per-chunk partial-min folds; one transpose at the end
    sigT = np.full((num_perms, n_docs), UINT32_MAX, dtype=np.uint32)
    buf = np.empty(min(_SHINGLE_CHUNK, total), dtype=np.uint64)
    sh32 = np.uint64(32)
    with np.errstate(over="ignore"):
        for s0 in range(0, total, _SHINGLE_CHUNK):
            s1 = min(total, s0 + _SHINGLE_CHUNK)
            block = shingles[s0:s1]
            vb = buf[:s1 - s0]
            # segments (nonzero docs) intersecting [s0, s1)
            j0 = max(0, np.searchsorted(starts_nz, s0, side="right") - 1)
            j1 = np.searchsorted(starts_nz, s1, side="left")
            local = np.clip(starts_nz[j0:j1], s0, s1) - s0
            rows = nz_docs[j0:j1]
            for i in range(num_perms):
                np.multiply(block, a[i], out=vb)
                np.add(vb, b[i], out=vb)
                np.right_shift(vb, sh32, out=vb)
                m = np.minimum.reduceat(vb, local).astype(np.uint32)
                # only the chunk's FIRST segment can straddle the
                # boundary and carry a prior partial min; the rest are
                # whole-within-chunk and assign directly
                row = sigT[i]
                row[rows[1:]] = m[1:]
                row[rows[0]] = min(row[rows[0]], m[0])
    # zero-shingle docs' columns were never written: still the sentinel
    return np.ascontiguousarray(sigT.T)
