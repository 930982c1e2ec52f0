"""Suffix-array kernels for exact-substring dedup within clusters.

Pure NumPy prefix-doubling suffix array + Kasai LCP.  Used by the
within-cluster containment pass (:mod:`smqtk_indexing_ray.pipelines.
suffix`): clusters are small after LSH banding (tens of docs, tens of
KB), so an O(n log n) per-cluster build inside ``map_groups`` is cheap
and needs no cross-cluster state.

The reference has no substring machinery (it is a vector-space library);
this implements the "suffix-array pass for exact substring dedup within
clusters" extension called for by the project north star.
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (prefix doubling, O(n log n)).

    ``s``: 1-D array of non-negative ints (e.g. uint8 bytes).  Returns the
    permutation ``sa`` with suffixes in ascending lexicographic order.
    """
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # explicit copy: the doubling loop writes into this buffer (via the
    # rank/tmp swap), and np.asarray would alias the caller's array
    rank = np.array(s, dtype=np.int64, copy=True)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        # sort by (rank[i], rank[i+k]) — second key = -1 past the end
        second = np.full(n, -1, dtype=np.int64)
        second[:-k] = rank[k:]
        sa = np.lexsort((second, rank))
        # recompute ranks: new rank increments where either key differs
        tmp[sa[0]] = 0
        prev, cur = sa[:-1], sa[1:]
        diff = (rank[cur] != rank[prev]) | (second[cur] != second[prev])
        tmp[cur] = np.cumsum(diff)
        rank, tmp = tmp, rank
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i], suffix sa[i-1]); lcp[0] = 0.

    Sequential by nature; clusters are small so the Python loop is fine
    (documented trade-off — the pass runs inside per-cluster map_groups).
    """
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            m = n - max(i, j)
            while h < m and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def duplicated_span_mask(texts: list[bytes], min_span: int = 20,
                         ) -> list[np.ndarray]:
    """Per-document boolean masks of byte positions that lie inside a span
    of >= ``min_span`` bytes occurring in ANOTHER document of the group.

    Builds one suffix array over the concatenation (documents separated by
    unique out-of-band sentinels so spans cannot cross boundaries), then
    computes for EVERY suffix its longest common prefix with any suffix of
    a different document via the standard prev/next different-doc sweep
    (the nearest other-doc suffix in SA order, in either direction,
    maximizes that LCP), and marks spans >= min_span.  This is complete —
    a suffix whose SA neighbors are same-doc suffixes is still matched
    against the nearest other-doc suffix (ADVICE r1: the adjacent-pair
    approximation undercounted internally repetitive documents).
    """
    if not texts:
        return []
    seps = []
    parts = []
    doc_of = []
    for i, t in enumerate(texts):
        arr = np.frombuffer(t, dtype=np.uint8).astype(np.int64)
        parts.append(arr)
        doc_of.append(np.full(len(arr), i, dtype=np.int64))
        # unique sentinel per boundary, outside byte range
        seps.append(np.array([256 + i], dtype=np.int64))
        doc_of.append(np.array([-1], dtype=np.int64))
    s = np.concatenate([x for pair in zip(parts, seps) for x in pair])
    doc = np.concatenate(doc_of)
    starts = np.cumsum([0] + [len(p) + 1 for p in parts[:-1]])

    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    d_sa = doc[sa]
    nt = len(s)

    # best[r] = LCP(suffix sa[r], nearest different-doc suffix) — running
    # min of lcp, reset at each doc change, swept both directions.
    # Sentinel suffixes have unique symbols so their lcp entries are 0 and
    # naturally break runs.  O(n) like the Kasai loop above.
    best = np.zeros(nt, dtype=np.int64)
    run = 0
    for r in range(1, nt):
        lv = int(lcp[r])
        run = lv if d_sa[r - 1] != d_sa[r] else min(run, lv)
        if run > best[r]:
            best[r] = run
    run = 0
    for r in range(nt - 2, -1, -1):
        lv = int(lcp[r + 1])
        run = lv if d_sa[r + 1] != d_sa[r] else min(run, lv)
        if run > best[r]:
            best[r] = run

    # mark [off, off+best) per qualifying suffix via per-doc difference
    # arrays (O(n) total, no O(n*span) slice writes)
    diffs = [np.zeros(len(p) + 1, dtype=np.int64) for p in parts]
    for r in np.flatnonzero((best >= min_span) & (d_sa >= 0)):
        di = int(d_sa[r])
        off = int(sa[r]) - int(starts[di])
        ln = min(int(best[r]), len(parts[di]) - off)
        diffs[di][off] += 1
        diffs[di][off + ln] -= 1
    return [np.cumsum(d[:-1]) > 0 for d in diffs]
