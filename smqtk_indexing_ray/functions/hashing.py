"""Vectorized 64-bit hashing primitives.

Analog of the reference's bit-packing utilities
(/root/reference/smqtk_indexing/utils/bits.py:4-56), which pack boolean hash
vectors into arbitrary-precision Python ints one element at a time.  Here
every key is a fixed-width ``uint64`` computed by NumPy over whole Arrow
batches — no Python ints, no per-row loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Public-domain mixing constants (splitmix64 / xxhash-style).
_SM64_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM64_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_M2 = np.uint64(0x94D049BB133111EB)
_FNV_PRIME = np.uint64(0x100000001B3)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a strong, cheap uint64 -> uint64 mixer.

    Vectorized; wraps mod 2**64 by construction of NumPy uint64 arithmetic.
    """
    with np.errstate(over="ignore"):
        z = (x + _SM64_GAMMA).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _SM64_M1
        z = (z ^ (z >> np.uint64(27))) * _SM64_M2
        return z ^ (z >> np.uint64(31))


def combine_u64(a: np.ndarray, b: np.ndarray | np.uint64) -> np.ndarray:
    """Order-sensitive combine of two uint64 streams (boost::hash_combine
    style, widened to 64 bits)."""
    with np.errstate(over="ignore"):
        return splitmix64(a ^ ((b * _FNV_PRIME) + np.uint64(0x9E3779B9)))


def hash_strings_u64(arr: pa.Array | pa.ChunkedArray | np.ndarray | list,
                     hash_key: str = "smqtk-ray-v1.0.0") -> np.ndarray:
    """Deterministic uint64 hash of a string array.

    Dictionary-encodes first (an O(n) Arrow kernel) so the SipHash pass runs
    only over the *unique* strings — webtext token streams are Zipfian, so
    uniques are typically 10-100x smaller than the stream.
    """
    if isinstance(arr, (list, np.ndarray)):
        arr = pa.array(arr, type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    dict_arr = arr.dictionary_encode()
    uniques = dict_arr.dictionary.to_pandas().to_numpy(dtype=object)
    hashed_uniques = pd.util.hash_array(uniques, hash_key=hash_key)
    indices = dict_arr.indices.to_numpy(zero_copy_only=False)
    return hashed_uniques[indices]


def hash_byte_segments_u64(data: np.ndarray, offsets: np.ndarray,
                           *, seed: int | np.uint64 = 0) -> np.ndarray:
    """Keyed 64-bit hash of variable-length byte SEGMENTS of one
    contiguous uint8 stream — fully vectorized, zero Python per
    segment (the batched replacement for hashing each segment's bytes
    through a per-item loop).

    Segment ``i`` is ``data[offsets[i]:offsets[i+1]]`` (``offsets`` has
    ``k+1`` entries; segments tile the covered range, empty segments
    allowed).  Each byte mixes with its within-segment position and the
    seed through splitmix64 — ``(pos << 8) | byte`` is injective for
    segments under 2^56 bytes — the per-segment fold is one
    ``np.bitwise_xor.reduceat`` (empty segments occupy zero bytes, so
    reducing between consecutive NON-empty starts is exact), and a
    length-keyed splitmix64 finalizes.  Hashes under distinct seeds
    are independent functions of the bytes (the keyed-lane shape of
    ``_bytes_hash64`` in ``stages/multimodal.py``, batched).
    """
    offs = np.asarray(offsets, np.int64)
    k = len(offs) - 1
    if k <= 0:
        return np.empty(0, np.uint64)
    seed = np.uint64(seed)
    lens = np.diff(offs)
    base = offs[0]
    with np.errstate(over="ignore"):
        seed_mix = splitmix64(np.array([seed], np.uint64))[0]
        flat = np.asarray(data[base:offs[-1]]).astype(np.uint64)
        rel_starts = offs[:-1] - base
        pos = (np.arange(len(flat), dtype=np.uint64)
               - np.repeat(rel_starts, lens).astype(np.uint64))
        m = splitmix64(((pos << np.uint64(8)) | flat) + seed_mix)
        acc = np.zeros(k, np.uint64)
        ne = lens > 0
        if ne.any():
            acc[ne] = np.bitwise_xor.reduceat(m, rel_starts[ne])
        return splitmix64(acc ^ splitmix64(lens.astype(np.uint64)
                                           + seed_mix))


def fold_rows_u64(mat: np.ndarray, salt: np.uint64 | int = 0) -> np.ndarray:
    """Fold each row of a 2-D unsigned array into one uint64 key.

    Used for LSH band keys: ``mat`` is ``(n_docs, rows_per_band)`` of MinHash
    values; the result is the bucket key.  Order-sensitive FNV-style fold
    followed by a splitmix64 finalize.
    """
    with np.errstate(over="ignore"):
        acc = np.full(mat.shape[0], np.uint64(0xCBF29CE484222325) ^ np.uint64(salt),
                      dtype=np.uint64)
        for j in range(mat.shape[1]):
            acc = (acc ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
        return splitmix64(acc)


def pack_bits_rows(bools: np.ndarray) -> np.ndarray:
    """Pack an ``(n, bits)`` bool matrix into ``(n, ceil(bits/8))`` uint8,
    bit 0 at the MSB of byte 0 — the same big-endian order as the
    reference's arbitrary-width int packing (utils/bits.py:4-20, bit 0 is
    the most significant), so ``int.from_bytes(row, 'big')`` reproduces
    the reference's integer codes for ``bits % 8 == 0``."""
    return np.packbits(np.ascontiguousarray(bools, dtype=np.uint8), axis=1)


def unpack_bits_rows(packed: np.ndarray, bits: int) -> np.ndarray:
    """Inverse of :func:`pack_bits_rows` — ``(n, nbytes)`` uint8 to
    ``(n, bits)`` bool (reference: utils/bits.py:23-56)."""
    return np.unpackbits(packed, axis=1)[:, :bits].astype(bool)


def grouped_arange(counts: np.ndarray) -> np.ndarray:
    """``concatenate([arange(c) for c in counts])`` without the Python loop."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = counts.cumsum()
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(ends - counts, counts)
    return out


def dict_codes(arr: pa.Array | pa.ChunkedArray):
    """Dictionary-encode an Arrow array and return ``(dictionary
    values, int64 code per element)`` — the shared front half of every
    packed-key grouping kernel (one Python-level pass over the UNIQUE
    values downstream, never per element)."""
    import pyarrow.compute as pc
    d = pc.dictionary_encode(arr)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    return d.dictionary, d.indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
