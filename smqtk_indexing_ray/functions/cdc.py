"""Content-defined chunking (CDC) kernels: gear rolling hash + greedy
boundary selection.

FastCDC-style chunking (Xia et al., USENIX ATC'16): a chunk boundary
falls where the top ``mask_bits`` bits of a 64-tap gear rolling hash
are zero — boundaries move WITH the content, so an insertion early in
a document shifts every byte offset but leaves all downstream chunk
hashes intact.  That is the property byte-offset shingling lacks and
the reason storage/dedup systems chunk this way; here it powers
chunk-level duplicate accounting across a webtext corpus.

The gear recurrence ``h_i = (h_{i-1} << 1) + GEAR[b_i] (mod 2^64)``
is equivalent to the 64-tap window sum ``h_i = Σ_{k=0..63}
GEAR[b_{i-k}] << k`` (older taps shift out of the word), which is how
:func:`gear_hashes_padded` vectorizes it: one shifted-add sweep per
tap over the whole batch's concatenated byte stream instead of a
per-byte Python loop.

Document purity: each document is preceded by 63 zero sentinel bytes
in the concatenated stream, so no 64-byte window ever crosses into a
neighboring document — per-document hashes (and therefore cut points
and chunk hashes) are batch-layout-independent.  The first 63
positions of a document hash a window zero-padded on the left; that IS
this module's CDC definition and the pytest brute-force twin mirrors
it.

Reference analog: the reference's rolling/banded signature kernels
(/root/reference/smqtk_indexing/impls/lsh_functor/itq.py computes
fixed-width signatures per record); CDC is the variable-width,
shift-tolerant sibling used for chunk-level exact dedup.
"""

from __future__ import annotations

import numpy as np

from smqtk_indexing_ray.functions.hashing import splitmix64

_WIN = 64
_PAD = _WIN - 1

# 256-entry gear table: splitmix64 of the byte value — deterministic,
# seed-free, PYTHONHASHSEED-independent.
_GEAR = splitmix64(np.arange(256, dtype=np.uint64))


def gear_hashes_padded(streams: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """64-tap gear rolling hashes for every byte of every stream, in
    ONE vectorized pass over the batch.

    Streams are concatenated with ``_PAD`` zero sentinel bytes before
    each, so windows never mix neighboring streams.  Returns
    ``(H, offsets)`` where ``H`` covers the padded stream (uint64) and
    ``offsets[i]`` is the padded-stream index of stream ``i``'s byte 0
    (stream ``i``'s hashes are ``H[offsets[i] : offsets[i] + len_i]``).
    """
    total = sum(len(s) for s in streams) + _PAD * len(streams)
    buf = np.zeros(total, np.uint8)
    offs = np.empty(len(streams), np.int64)
    pos = 0
    for i, s in enumerate(streams):
        pos += _PAD
        offs[i] = pos
        if s:
            b = np.frombuffer(s, np.uint8)
            buf[pos:pos + len(b)] = b
            pos += len(b)
    g = _GEAR[buf]
    n = len(g)
    h = np.empty(n, np.uint64)
    # cache-blocked tap sweep: the naive form (h[k:] += g[:-k] << k for
    # each of 64 taps) streams the whole gear array from DRAM 64x; a
    # segment + its 63-word overlap stays in L2 across all taps instead
    # (the same blocking lever as the minhash/simhash kernels)
    seg = 1 << 18
    with np.errstate(over="ignore"):
        for s0 in range(0, n, seg):
            s1 = min(s0 + seg, n)
            lo = max(s0 - _PAD, 0)
            gs = g[lo:s1]
            m = s1 - s0
            hs = np.zeros(m, np.uint64)
            off = s0 - lo
            for k in range(_WIN):
                a = off - k
                if a >= 0:
                    hs += gs[a:a + m] << np.uint64(k)
                elif m + a > 0:
                    # first segment only: global i < k has no tap k
                    hs[-a:] += gs[:m + a] << np.uint64(k)
            h[s0:s1] = hs
    return h, offs


def cdc_cut_points(h_doc: np.ndarray, *, mask_bits: int,
                   min_size: int, max_size: int) -> np.ndarray:
    """Greedy chunk-end selection over one document's rolling hashes.

    A position ``i`` (0-based, chunk end INCLUSIVE) is a candidate when
    the top ``mask_bits`` bits of ``h_doc[i]`` are zero (expected chunk
    size ``2**mask_bits``).  The greedy sweep takes the first candidate
    at least ``min_size`` bytes into the chunk, forcing a cut at
    ``max_size`` when none fires; the final chunk ends at the document
    end regardless (it may be shorter than ``min_size``).
    """
    n = len(h_doc)
    if not 1 <= mask_bits <= 63:
        # mask_bits=0 would shift 1<<64 -> 0 (every candidate silently
        # lost); >=64 can never fire
        raise ValueError(f"mask_bits must be in [1, 63], got {mask_bits}")
    if min_size < 1 or max_size < min_size:
        # min_size<=0 re-finds the consumed candidate forever (lo falls
        # behind s) — the greedy sweep would spin until OOM
        raise ValueError(
            f"need 1 <= min_size <= max_size, got min_size={min_size} "
            f"max_size={max_size}")
    if n == 0:
        return np.empty(0, np.int64)
    thresh = np.uint64(1) << np.uint64(64 - mask_bits)
    cand = np.flatnonzero(h_doc < thresh)
    ends: list[int] = []
    s = 0
    while s < n:
        lo = s + min_size - 1
        hi = min(s + max_size - 1, n - 1)
        if lo > hi:
            ends.append(n - 1)
            break
        j = int(np.searchsorted(cand, lo))
        e = int(cand[j]) if j < len(cand) and cand[j] <= hi else hi
        ends.append(e)
        s = e + 1
    return np.asarray(ends, np.int64)
