"""Distributed connected components over the candidate-pair graph.

The reference's answer surface is per-query neighbor sets
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:489-518); for corpus
dedup the whole graph must be resolved at once, so we compute connected
components with the **alternating large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14).

Both star operations need "attach min(neighborhood) to every edge of the
neighborhood".  Instead of ``groupby().aggregate(Min)`` + hash join (two
shuffles per op, and Ray's join operator emits schema-less empty blocks
that poison downstream shuffles), each op is ONE range-partitioning sort:
sort edges by the center node, compute per-segment minima with
``np.minimum.reduceat`` inside ``map_batches``, and repair the (at most two
per batch) segments that straddle a batch boundary with a driver-side
fixup over ~2 rows per batch.  Converges in O(log^2 n) rounds; star-shaped
LSH candidate graphs settle in 2-4 rounds.

A driver-side union-find (:func:`driver_connected_components`) is the
small-scale oracle in tests — it holds node labels in driver memory, so it
is only for test scale (SURVEY.md's "no driver loops" rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from smqtk_indexing_ray.functions.hashing import splitmix64

_CHK_MOD = np.uint64(1_000_000_007)

_UV = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _empty_uv() -> pa.Table:
    return _UV.empty_table()


def _degenerate(t: pa.Table, *cols: str) -> bool:
    # Ray's join/aggregate operators emit ZERO-COLUMN empty blocks for empty
    # partitions, and map_batches passes empty blocks through without
    # calling the UDF — every kernel must tolerate them.
    return t.num_rows == 0 or any(c not in t.column_names for c in cols)


def _segments(k: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end indices of equal-key runs in a sorted key array."""
    starts = np.concatenate(
        [[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
    ends = np.concatenate([starts[1:], [len(k)]])
    return starts, ends


def _boundary_fixup(srt, key: str, val: str) -> dict[int, int]:
    """Global min(val) for keys whose neighborhood may straddle a batch.

    Probes emit (key, local_min) for the first/last segment of every batch
    (~2 rows per batch); keys probed more than once are split across
    batches and get their true global min from the driver-side merge.
    """
    def probe(t: pa.Table) -> pa.Table:
        if _degenerate(t, key, val):
            return pa.schema([(key, pa.int64()), ("_lm", pa.int64()),
                              ("_n", pa.int64())]).empty_table()
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[val].to_numpy(zero_copy_only=False)
        starts, ends = _segments(k)
        idx = np.unique([0, len(starts) - 1])
        lm = np.minimum.reduceat(v, starts)[idx]
        return pa.table({key: pa.array(k[starts[idx]]),
                         "_lm": pa.array(lm),
                         "_n": pa.array(np.ones(len(idx), dtype=np.int64))})

    from smqtk_indexing_ray.stages._util import probe_blocks
    ptbl = probe_blocks(srt, probe)
    pdf = ptbl.to_pandas()
    if pdf.empty:
        return {}
    g = pdf.groupby(key).agg(lm=("_lm", "min"), n=("_n", "sum"))
    g = g[g["n"] > 1]
    return dict(zip(g.index.astype(np.int64), g["lm"].astype(np.int64)))


def _apply_fix(seg_keys: np.ndarray, seg_min: np.ndarray,
               fix: dict[int, int]) -> np.ndarray:
    if not fix:
        return seg_min
    fk = np.fromiter(fix.keys(), dtype=np.int64)
    fv = np.fromiter(fix.values(), dtype=np.int64)
    order = np.argsort(fk)
    fk, fv = fk[order], fv[order]
    pos = np.searchsorted(fk, seg_keys)
    pos_c = np.clip(pos, 0, len(fk) - 1)
    hit = fk[pos_c] == seg_keys
    out = seg_min.copy()
    out[hit] = np.minimum(out[hit], fv[pos_c[hit]])
    return out


def _sym(edges):
    def f(t: pa.Table) -> pa.Table:
        if _degenerate(t, "u", "v"):
            return pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(np.concatenate([u, v])),
                         "b": pa.array(np.concatenate([v, u]))})
    return edges.map_batches(f, batch_format="pyarrow")


def _large_star(edges):
    """Emit (m, v) for every v > a adjacent to a, m = min(N(a) + {a})."""
    srt = _sym(edges).sort("a").materialize()
    fix = _boundary_fixup(srt, "a", "b")

    def emit(t: pa.Table) -> pa.Table:
        if _degenerate(t, "a", "b"):
            return _empty_uv()
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        starts, ends = _segments(a)
        seg_keys = a[starts]
        seg_min = np.minimum.reduceat(b, starts)
        seg_min = _apply_fix(seg_keys, seg_min, fix)
        m = np.repeat(np.minimum(seg_min, seg_keys), ends - starts)
        mask = b > a
        return pa.table({"u": pa.array(m[mask]), "v": pa.array(b[mask])})

    return srt.map_batches(emit, batch_format="pyarrow")


def _small_star(edges):
    """Orient high->low; attach each node's smaller neighbors (and itself)
    to the minimum of that smaller-neighborhood."""
    def orient(t: pa.Table) -> pa.Table:
        if _degenerate(t, "u", "v"):
            return pa.schema([("hi", pa.int64()), ("lo", pa.int64())]).empty_table()
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        hi = np.maximum(u, v)
        lo = np.minimum(u, v)
        mask = hi != lo
        return pa.table({"hi": pa.array(hi[mask]), "lo": pa.array(lo[mask])})

    srt = edges.map_batches(orient, batch_format="pyarrow").sort("hi").materialize()
    fix = _boundary_fixup(srt, "hi", "lo")

    def emit(t: pa.Table) -> pa.Table:
        if _degenerate(t, "hi", "lo"):
            return _empty_uv()
        hi = t["hi"].to_numpy(zero_copy_only=False)
        lo = t["lo"].to_numpy(zero_copy_only=False)
        starts, ends = _segments(hi)
        seg_keys = hi[starts]
        seg_min = np.minimum.reduceat(lo, starts)
        seg_min = _apply_fix(seg_keys, seg_min, fix)
        m = np.repeat(seg_min, ends - starts)
        mask = lo != m
        # per-segment self edge (hi, m); duplicates across straddling
        # batches are harmless
        return pa.table({
            "u": pa.array(np.concatenate([m[mask], seg_min])),
            "v": pa.array(np.concatenate([lo[mask], seg_keys])),
        })

    return srt.map_batches(emit, batch_format="pyarrow")


def _labels_of(edges, num_partitions: int = 16):
    """Edge set -> candidate labeling ``(doc_id, cluster_id)`` (groupby-min).

    Canonical by construction: the groupby collapses duplicate edges, so
    the result is identical however the edge multiset is partitioned or
    duplicated across batch boundaries.
    """
    from ray.data.aggregate import Min

    def orient_lbl(t: pa.Table) -> pa.Table:
        if _degenerate(t, "u", "v"):
            return pa.schema([("doc_id", pa.int64()),
                              ("c", pa.int64())]).empty_table()
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        return pa.table({
            "doc_id": pa.array(np.concatenate([hi, lo])),
            "c": pa.array(np.concatenate([lo, lo])),
        })

    return (edges.map_batches(orient_lbl, batch_format="pyarrow")
            .groupby("doc_id", num_partitions=num_partitions)
            .aggregate(Min("c", alias_name="cluster_id")))


def _labels_fingerprint(labels) -> tuple[int, int]:
    """(count, order-independent SET checksum) of a labels dataset.

    Works on labels, not edges: the edge multiset produced by the star
    operations carries batch-boundary-dependent duplicates, so an edge
    fingerprint jiggles round-to-round long after the labeling has
    converged (observed: count stable at round 1, checksum stable only by
    luck ~20 rounds later).  Labels are distinct rows by construction, so
    a commutative sum-hash is a true set fingerprint.
    """
    def chk(t: pa.Table) -> pa.Table:
        if _degenerate(t, "doc_id", "cluster_id"):
            return pa.table({"chk": pa.array([0], type=pa.int64()),
                             "cnt": pa.array([0], type=pa.int64())})
        u = t["doc_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        v = t["cluster_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(u * np.uint64(0x9E3779B97F4A7C15) ^ splitmix64(v))
            # mod BEFORE the sum: a raw uint64 sum wraps at 2**64, and the
            # wrap count depends on how rows are batched — (x mod 2^64)
            # mod M is not partition-invariant.  Per-element mod keeps the
            # per-batch sum exact (n * (M-1) < 2^64 for any real block).
            s = int(np.sum(h % _CHK_MOD, dtype=np.uint64) % _CHK_MOD)
        return pa.table({"chk": pa.array([s], type=pa.int64()),
                         "cnt": pa.array([t.num_rows], type=pa.int64())})

    from smqtk_indexing_ray.stages._util import probe_blocks
    mini = probe_blocks(labels, chk)
    if mini.num_rows == 0:
        return 0, 0
    cnt = int(np.sum(mini["cnt"].to_numpy(zero_copy_only=False)))
    s = int(np.sum(mini["chk"].to_numpy(zero_copy_only=False)) % _CHK_MOD)
    return cnt, s


def connected_components(edges, *, num_partitions: int = 32,
                         max_iters: int = 25):
    """Edges (u, v) -> labels Dataset ``(doc_id, cluster_id)``.

    ``cluster_id`` is the minimum ``doc_id`` of the component.  Only nodes
    that appear in an edge get a row — callers left-join and default
    singletons to their own id.  ``num_partitions`` is accepted for API
    symmetry (the sort chooses its own partitioning).

    Termination: per-node labels are monotonically non-increasing under
    the star operations, so ONE full large+small-star round with an
    unchanged label-set fingerprint is the fixpoint test (the fingerprint
    is an exact partition-invariant multiset checksum; monotonicity rules
    out a coincidentally-unchanged labeling mid-propagation).
    """
    prev = None
    stable = 0
    labels = None
    for _ in range(max_iters):
        edges = _large_star(edges)
        edges = _small_star(edges)  # materialized inside (sort)
        labels = _labels_of(edges, num_partitions).materialize()
        fp = _labels_fingerprint(labels)
        if fp[0] == 0:
            break
        if fp == prev:
            stable += 1
            # one full round with an unchanged label SET is the fixpoint
            # test (the fingerprint is exact and partition-invariant);
            # labels are monotone non-increasing under the star ops
            if stable >= 1:
                break
        else:
            stable = 0
        prev = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds")
    # labels is already materialized: filtering empty blocks is a metadata
    # pass, and downstream joins die on zero-column empty blocks
    from smqtk_indexing_ray.stages._util import drop_empty_blocks
    return drop_empty_blocks(labels, pa.schema([("doc_id", pa.int64()),
                                                ("cluster_id", pa.int64())]))


def driver_connected_components(edges) -> dict[int, int]:
    """Union-find on the driver (test oracle / provably-small edge sets)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes: set[int] = set()
    it = (edges.iter_batches(batch_format="pyarrow")
          if hasattr(edges, "iter_batches") else [edges])
    for t in it:
        for u, v in zip(t["u"].to_numpy(zero_copy_only=False),
                        t["v"].to_numpy(zero_copy_only=False)):
            u, v = int(u), int(v)
            nodes.add(u)
            nodes.add(v)
            ru, rv = find(u), find(v)
            if ru != rv:
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
    return {n: find(n) for n in nodes}
