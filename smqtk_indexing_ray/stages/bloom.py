"""Distributed Bloom filter over 64-bit hashes.

The broadcastable membership sketch a decontamination pass needs: build
it once over the (smaller) eval split's shingle hashes, ``ray.put`` the
~1 MiB bit array, and prefilter the (huge) train corpus inside
``map_batches`` — no shuffle touches the train side until the tiny
surviving candidate set reaches exact verification.

Build shape: every input block ORs its hashes into a fresh ``m``-bit
partial (one ``large_binary`` row per batch), then a log-depth tree of
raw Ray tasks ORs the partials pairwise-by-16 — the driver never holds
more than the final array, and no combine task touches more than
16 partials.  A Bloom filter has no false negatives, so a prefilter
built from it is lossless for any downstream exact check; false
positives only add verification work (rate ~(1-e^{-kn/m})^k).

Bit positions use Kirsch-Mitzenmacher double hashing (two splitmix64
mixes of the input hash), so membership tests are fully vectorized.

Reference analog: the LSH bucket map's containment pre-check
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:462-476) plays
the same candidate-gating role per query; this is the corpus-level,
broadcastable form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from smqtk_indexing_ray.functions.hashing import splitmix64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_OR_TASK = None


def _get_or_task():
    """One session-wide OR-combine task (same export-once rationale as
    ``_util._get_probe_task``)."""
    global _OR_TASK
    if _OR_TASK is None:
        import ray

        @ray.remote(num_cpus=0.5)
        def _or_blooms(*tbls):
            acc = None
            for t in tbls:
                if t is None or t.num_rows == 0 or \
                        "bloom" not in t.column_names:
                    continue
                for i in range(t.num_rows):
                    b = np.frombuffer(t["bloom"][i].as_py(), np.uint64)
                    acc = b.copy() if acc is None else np.bitwise_or(
                        acc, b, out=acc)
            if acc is None:
                return pa.schema(
                    [("bloom", pa.large_binary())]).empty_table()
            return pa.table({
                "bloom": pa.array([acc.tobytes()], pa.large_binary())})

        _OR_TASK = _or_blooms
    return _OR_TASK


def bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions for hashes ``h`` (Kirsch-Mitzenmacher:
    ``pos_i = h1 + i*h2 mod m``).  ``m_bits`` must be a power of two."""
    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    h = h.astype(np.uint64, copy=False)
    h1 = splitmix64(h)
    h2 = splitmix64(h ^ _GOLDEN) | np.uint64(1)
    mask = np.uint64(m_bits - 1)
    out = np.empty((k, len(h)), np.uint64)
    for i in range(k):
        out[i] = (h1 + np.uint64(i) * h2) & mask
    return out


def build_bloom(ds, *, hash_col: str, m_bits: int = 1 << 23,
                k: int = 2) -> np.ndarray:
    """Build an ``m_bits`` Bloom filter over ``ds[hash_col]`` (uint64 or
    int64 hashes) -> one driver-side ``uint64[m_bits/64]`` array.

    Per-block partials + log-depth OR tree; driver memory O(m_bits).
    """
    import ray

    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        arr = np.zeros(words, np.uint64)
        if t.num_rows and hash_col in t.column_names:
            h = t[hash_col].to_numpy(zero_copy_only=False)
            pos = bloom_positions(h.view(np.uint64)
                                  if h.dtype == np.int64 else h,
                                  m_bits, k).ravel()
            np.bitwise_or.at(arr, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({
            "bloom": pa.array([arr.tobytes()], pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    refs = [ref for bundle in parts.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]
    if not refs:
        return np.zeros(words, np.uint64)
    task = _get_or_task()
    while len(refs) > 1:
        refs = [task.remote(*refs[i:i + 16])
                for i in range(0, len(refs), 16)]
    tbl = ray.get(refs[0])
    if tbl.num_rows == 0:
        return np.zeros(words, np.uint64)
    return np.frombuffer(tbl["bloom"][0].as_py(), np.uint64).copy()


def bloom_test(bloom: np.ndarray, h: np.ndarray, *, m_bits: int,
               k: int = 2) -> np.ndarray:
    """Vectorized membership: bool mask, True = possibly present (no
    false negatives)."""
    if len(h) == 0:
        return np.zeros(0, bool)
    pos = bloom_positions(h.view(np.uint64)
                          if h.dtype == np.int64 else h, m_bits, k)
    ok = np.ones(len(h), bool)
    for i in range(k):
        p = pos[i]
        word = bloom[(p >> np.uint64(6)).astype(np.int64)]
        ok &= ((word >> (p & np.uint64(63))) & np.uint64(1)) == 1
    return ok
