"""Banded hamming near-pair enumeration — join-free and skew-safe.

Replaces the band-key self-join that ``simhash_near_pairs`` /
``srp_near_pairs`` used in round 1: a hash join of a banded table with
itself emits the full O(m^2) cross product inside every bucket BEFORE any
filter, so one degenerate 16-bit chunk (a boilerplate cloud of near-zero
codes) made a single join partition quadratic (VERDICT r1 #4).

Here each bucket is processed by one vectorized group call whose cost is
O(d^2 + output) where ``d`` is the number of DISTINCT codes in the bucket
— a boilerplate cloud has d ~ 1, so the degenerate case costs O(m) to
read and O(#true pairs) to emit, which is the inherent output size of
pair semantics.  Structure:

1. explode each 64-bit code into 4 disjoint 16-bit chunk buckets
   (pigeonhole: two codes within hamming <= 3 agree on >= 1 chunk; the
   reference analog is the BallTree hamming search,
   /root/reference/smqtk_indexing/impls/hash_index/sklearn_balltree.py:
   337-375);
2. ``groupby(band_key).map_groups`` — the key space is BOUNDED
   (4 * 2^16 buckets max, independent of corpus size), so per-group
   call overhead cannot grow with the data;
3. inside a bucket: sort by code, collapse to distinct codes, verify the
   d x d popcount matrix in bounded chunks, and emit each qualifying
   pair exactly once globally — a pair is emitted only by its FIRST
   agreeing chunk, so no downstream dedup aggregate is needed (equal
   codes agree on every chunk and emit their clique from band 0 only).

``max_pairs_per_bucket`` caps emission per bucket for degenerate clouds
whose true pair count is itself quadratic (None = exact, the default;
mirrors the explicit-cap convention of the suffix pass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from smqtk_indexing_ray.functions.metrics import popcount_u64

_N_BANDS = 4
_CHUNK = 512  # rows of the distinct-code popcount matrix per slab


def _band_explode(t: pa.Table, id_col: str, code_col: str) -> pa.Table:
    schema = pa.schema([("band_key", pa.int64()), (id_col, pa.int64()),
                        (code_col, pa.int64())])
    if t.num_rows == 0 or code_col not in t.column_names:
        return schema.empty_table()
    c = t[code_col].to_numpy(zero_copy_only=False).view(np.uint64)
    ids = t[id_col]
    parts = []
    for band_id in range(_N_BANDS):
        chunk = (c >> np.uint64(16 * band_id)) & np.uint64(0xFFFF)
        key = (chunk.astype(np.int64) << np.int64(3)) | np.int64(band_id)
        parts.append(pa.table({"band_key": pa.array(key), id_col: ids,
                               code_col: t[code_col]}))
    return pa.concat_tables(parts)


def _first_agreeing_band(x: np.ndarray) -> np.ndarray:
    """For xor values ``x``: index of the lowest 16-bit chunk that is zero
    (4 if none agree)."""
    first = np.full(x.shape, _N_BANDS, dtype=np.int64)
    for b in range(_N_BANDS - 1, -1, -1):
        agree = ((x >> np.uint64(16 * b)) & np.uint64(0xFFFF)) == 0
        first[agree] = b
    return first


class _BucketPairs:
    """map_groups fn: one band bucket -> verified, globally-unique pairs."""

    def __init__(self, id_col: str, code_col: str, max_hamming: int,
                 max_pairs_per_bucket: int | None):
        self.id_col = id_col
        self.code_col = code_col
        self.max_hamming = max_hamming
        self.cap = max_pairs_per_bucket
        self.schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                 ("hamming", pa.int64())])

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or self.code_col not in t.column_names:
            return self.schema.empty_table()
        band_id = int(t["band_key"][0].as_py()) & 7
        c = t[self.code_col].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        c, ids = c[order], ids[order]
        starts = np.concatenate([[0], np.flatnonzero(c[1:] != c[:-1]) + 1])
        ends = np.concatenate([starts[1:], [len(c)]])
        uniq = c[starts]
        d = len(uniq)

        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        emitted = 0

        def room() -> int | None:
            return None if self.cap is None else max(0, self.cap - emitted)

        # equal-code cliques: all members collide in EVERY band, so band 0
        # alone owns them (global uniqueness without an aggregate)
        if band_id == 0 and self.max_hamming >= 0:
            for s, e in zip(starts, ends):
                m = e - s
                if m < 2:
                    continue
                grp = np.sort(ids[s:e])
                ju, ku = np.triu_indices(m, 1)
                if room() is not None:
                    ju, ku = ju[:room()], ku[:room()]
                out_a.append(grp[ju])
                out_b.append(grp[ku])
                out_h.append(np.zeros(len(ju), dtype=np.int64))
                emitted += len(ju)
                if room() == 0:
                    break

        # distinct-code pairs: O(d^2) popcount in bounded slabs — d is the
        # DISTINCT code count, so a uniform near-dup cloud costs ~nothing
        if d > 1 and (room() is None or room() > 0):
            for j0 in range(0, d, _CHUNK):
                j1 = min(j0 + _CHUNK, d)
                x = uniq[j0:j1, None] ^ uniq[None, :]
                h = popcount_u64(x).astype(np.int64)
                jj = np.arange(j0, j1)[:, None]
                kk = np.arange(d)[None, :]
                cand = (kk > jj) & (h <= self.max_hamming) \
                    & (_first_agreeing_band(x) == band_id)
                for rj, rk in zip(*np.nonzero(cand)):
                    gj = slice(starts[j0 + rj], ends[j0 + rj])
                    gk = slice(starts[rk], ends[rk])
                    pa_, pb_ = np.meshgrid(ids[gj], ids[gk], indexing="ij")
                    pa_, pb_ = pa_.ravel(), pb_.ravel()
                    lo = np.minimum(pa_, pb_)
                    hi = np.maximum(pa_, pb_)
                    if room() is not None:
                        lo, hi = lo[:room()], hi[:room()]
                    out_a.append(lo)
                    out_b.append(hi)
                    out_h.append(np.full(len(lo), h[rj, rk], dtype=np.int64))
                    emitted += len(lo)
                    if room() == 0:
                        break
                if room() == 0:
                    break

        if not out_a:
            return self.schema.empty_table()
        return pa.table({
            "a": pa.array(np.concatenate(out_a)),
            "b": pa.array(np.concatenate(out_b)),
            "hamming": pa.array(np.concatenate(out_h)),
        })


def banded_hamming_pairs(codes, *, id_col: str, code_col: str,
                         max_hamming: int,
                         max_pairs_per_bucket: int | None = None,
                         out_a: str = "a", out_b: str = "b"):
    """codes(id_col, code_col int64) -> pairs ``(out_a, out_b, hamming)``
    with ``out_a < out_b``, one row per pair sharing >= 1 16-bit chunk
    with hamming <= ``max_hamming``.  Join-free: one bounded-keyspace
    groupby; every pair emitted exactly once (first agreeing chunk)."""
    banded = codes.map_batches(
        lambda t: _band_explode(t, id_col, code_col),
        batch_format="pyarrow")
    bp = _BucketPairs(id_col, code_col, max_hamming, max_pairs_per_bucket)

    def bucket_pairs(t: pa.Table) -> pa.Table:  # map_groups needs __name__
        return bp(t)

    pairs = banded.groupby("band_key").map_groups(
        bucket_pairs, batch_format="pyarrow")

    schema = pa.schema([(out_a, pa.int64()), (out_b, pa.int64()),
                        ("hamming", pa.int64())])

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return schema.empty_table()
        return t.rename_columns([out_a, out_b, "hamming"])

    return pairs.map_batches(rename, batch_format="pyarrow")
