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


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _label_hash(keys: np.ndarray, lbls: np.ndarray) -> int:
    """Partial partition-invariant label-set checksum (mod before sum —
    raw uint64 sums wrap batch-layout-dependently)."""
    if len(keys) == 0:
        return 0
    with np.errstate(over="ignore"):
        h = splitmix64(keys.astype(np.uint64) * _GOLD
                       ^ splitmix64(lbls.astype(np.uint64)))
        return int(np.sum(h % _CHK_MOD, dtype=np.uint64) % _CHK_MOD)


def _adjacency_probe(srt):
    """One raw-task probe over the a-sorted symmetric adjacency.

    Returns ``(fix, fp, boundary_labels)`` where ``fix`` is the
    straddling-key global-min dict the emit kernels need, ``fp`` is an
    EXACT ``(count, checksum)`` fingerprint of the current labeling
    ``{(a, min(N(a) ∪ {a}))}`` — identical to what a groupby-min over the
    oriented edges would produce, without the per-round hash-shuffle
    aggregate — and ``boundary_labels`` is the (tiny) dict of labels for
    keys in first/last block segments, whose rows the interior label
    emission must skip."""
    def probe(t: pa.Table) -> pa.Table:
        sch = pa.schema([("kind", pa.int8()), ("key", pa.int64()),
                         ("lm", pa.int64()), ("fp", pa.int64()),
                         ("cnt", pa.int64())])
        if _degenerate(t, "a", "b"):
            return sch.empty_table()
        k = t["a"].to_numpy(zero_copy_only=False)
        v = t["b"].to_numpy(zero_copy_only=False)
        starts, _ = _segments(k)
        seg_keys = k[starts]
        seg_min = np.minimum.reduceat(v, starts)
        nseg = len(starts)
        bidx = np.unique([0, nseg - 1])
        interior = np.ones(nseg, dtype=bool)
        interior[bidx] = False
        lbl = np.minimum(seg_min, seg_keys)
        s = _label_hash(seg_keys[interior], lbl[interior])
        nb = len(bidx)
        return pa.table({
            "kind": pa.array(
                np.concatenate([np.zeros(nb, np.int8), [1]])),
            "key": pa.array(np.concatenate([seg_keys[bidx], [0]])),
            "lm": pa.array(np.concatenate([seg_min[bidx], [0]])),
            "fp": pa.array(np.concatenate([np.zeros(nb, np.int64), [s]])),
            "cnt": pa.array(np.concatenate(
                [np.ones(nb, np.int64), [int(interior.sum())]])),
        })

    from smqtk_indexing_ray.stages._util import probe_blocks
    ptbl = probe_blocks(srt, probe)
    if ptbl.num_rows == 0 or "kind" not in ptbl.column_names:
        return {}, (0, 0), {}
    pdf = ptbl.to_pandas()
    bnd = pdf[pdf["kind"] == 0]
    intr = pdf[pdf["kind"] == 1]
    g = bnd.groupby("key").agg(lm=("lm", "min"), n=("cnt", "sum"))
    fix = dict(zip(g.index[g["n"] > 1].astype(np.int64),
                   g.loc[g["n"] > 1, "lm"].astype(np.int64)))
    bkeys = g.index.to_numpy(dtype=np.int64)
    blbls = np.minimum(g["lm"].to_numpy(dtype=np.int64), bkeys)
    cnt = int(intr["cnt"].sum()) + len(bkeys)
    chk = int((int(intr["fp"].sum() % int(_CHK_MOD))
               + _label_hash(bkeys, blbls)) % int(_CHK_MOD))
    return fix, (cnt, chk), dict(zip(bkeys, blbls))


def _emit_large_star(srt, fix):
    """Emit (m, v) for every v > a adjacent to a, m = min(N(a) + {a})."""
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


def _labels_from_adjacency(srt, boundary_labels: dict[int, int]):
    """Converged labeling straight off the sorted adjacency: one label row
    per interior segment (exact, no shuffle), plus the driver-merged
    boundary keys as a tiny literal table.  Every node that appears in an
    edge is a segment key of the symmetric adjacency, so roots label
    themselves — same surface as a groupby-min over oriented edges."""
    import ray.data as rd

    def emit(t: pa.Table) -> pa.Table:
        sch = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
        if _degenerate(t, "a", "b"):
            return sch.empty_table()
        k = t["a"].to_numpy(zero_copy_only=False)
        v = t["b"].to_numpy(zero_copy_only=False)
        starts, _ = _segments(k)
        seg_keys = k[starts]
        seg_min = np.minimum.reduceat(v, starts)
        nseg = len(starts)
        interior = np.ones(nseg, dtype=bool)
        interior[np.unique([0, nseg - 1])] = False
        lbl = np.minimum(seg_min, seg_keys)
        return pa.table({"doc_id": pa.array(seg_keys[interior]),
                         "cluster_id": pa.array(lbl[interior])})

    labels = srt.map_batches(emit, batch_format="pyarrow")
    if boundary_labels:
        btbl = pa.table({
            "doc_id": pa.array(list(boundary_labels.keys()), pa.int64()),
            "cluster_id": pa.array(list(boundary_labels.values()),
                                   pa.int64())})
        labels = labels.union(rd.from_arrow(btbl))
    return labels


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


def connected_components(edges, *, num_partitions: int = 32,
                         max_iters: int = 25):
    """Edges (u, v) -> labels Dataset ``(doc_id, cluster_id)``.

    ``cluster_id`` is the minimum ``doc_id`` of the component.  Only nodes
    that appear in an edge get a row — callers left-join and default
    singletons to their own id.  ``num_partitions`` is accepted for API
    symmetry (the sorts choose their own partitioning).

    Shuffle budget: each round costs ONE symmetric-adjacency sort (large
    star) and ONE oriented sort (small star); the large-star probe doubles
    as an exact labeling fingerprint of the round's input edge set
    (``{(a, min(N(a) ∪ {a}))}`` — what a groupby-min over oriented edges
    would compute), so no per-round label aggregate runs at all, and on
    convergence the labels are emitted straight off the already-sorted
    adjacency.  A star-shaped input resolves in 2 large sorts + 1 small
    sort total.

    Termination: per-node labels are monotonically non-increasing under
    the star operations and the component minimum propagates at least one
    hop per round, so an unchanged labeling across ONE full round is the
    fixpoint (the fingerprint is exact and partition-invariant).
    """
    import ray.data as rd
    from smqtk_indexing_ray.stages._util import auto_blocks, drop_empty_blocks

    label_schema = pa.schema([("doc_id", pa.int64()),
                              ("cluster_id", pa.int64())])
    # Size-aware compaction: every round pays O(input_blocks x partitions)
    # sort tasks plus one probe task per block, and the verify stage hands
    # us its (many, small) output blocks.  Compacting the edge set to
    # ~16 MB blocks up front sets the block count for every later round
    # too (sort output partitions follow input blocks) — measured 6.2 s ->
    # ~3 s for the whole CC phase at 8M docs / 3M edges.  Large edge sets
    # keep ~CPU-count blocks.
    mat = edges.materialize()
    n_edges = mat.count()
    target = max(8, min(auto_blocks(), (n_edges * 32) // (16 << 20) + 1))
    edges = mat.repartition(target) if mat.num_blocks() > 2 * target else mat
    prev = None
    for _ in range(max_iters):
        srt = _sym(edges).sort("a").materialize()
        fix, fp, boundary_labels = _adjacency_probe(srt)
        if fp[0] == 0:
            return rd.from_arrow(label_schema.empty_table())
        if prev is not None and fp == prev:
            labels = _labels_from_adjacency(srt, boundary_labels)
            # materialized: downstream joins die on zero-column empty
            # blocks, and drop_empty_blocks is a metadata pass
            return drop_empty_blocks(labels.materialize(), label_schema)
        prev = fp
        edges = _small_star(_emit_large_star(srt, fix))
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds")


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
