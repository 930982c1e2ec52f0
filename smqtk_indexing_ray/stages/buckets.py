"""Bucket shuffle -> candidate star edges.

The reference materializes the bucket multimap ``hash_int -> {uuid}`` in a
driver-side ``defaultdict(set)`` and a KV store
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:315-323); at 10^12
docs that multimap IS the shuffle.  Instead of ``groupby().map_groups``
(one Python call per group — millions of tiny buckets make that the
bottleneck), we sort by the bucket key and emit edges with vectorized
segmented reductions inside ``map_batches``:

* every same-key segment inside a batch emits **star edges**
  ``(local_min, member)`` — O(m) edges per bucket, never the O(m^2) pair
  clique (transitivity through connected components preserves recall,
  SURVEY.md §4.2 "cap per-group pair fanout");
* the first/last segment of each batch may continue in a neighboring batch,
  so those segments also emit a tiny ``(key, local_min)`` boundary row; a
  driver-side fixup (2 rows per batch at most) links local minima of the
  same key.

Hot buckets (boilerplate near-dup clouds): Ray's range-partitioning sort
chooses boundaries between DISTINCT key values, so a million-member
bucket lands in ONE partition/block (verified empirically: 500k rows of
one key -> a single 422k-row block).  ``salt > 1`` therefore appends a
deterministic per-node sub-key ``hash(doc) % salt`` to the SORT key only
— not the segmentation key — so boundaries can fall inside a hot bucket
and split it across up to ``salt`` blocks (each ~1/salt of the cloud),
while the existing boundary fixup links the per-block local minima
exactly as it does for any straddling bucket.  Edge semantics are
identical at any salt, the sort count is identical (one), and the only
cost is a 1-byte sort-key column, so salting is ON by default.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from smqtk_indexing_ray.functions.hashing import splitmix64

_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _empty_edges() -> pa.Table:
    return _EDGE_SCHEMA.empty_table()


def _segment_starts(key_cols: list[np.ndarray]) -> np.ndarray:
    n = len(key_cols[0])
    change = np.zeros(n - 1, dtype=bool)
    for k in key_cols:
        change |= k[1:] != k[:-1]
    return np.concatenate([[0], np.flatnonzero(change) + 1])


class _EmitStarEdges:
    """Vectorized per-batch star-edge emission over key-sorted input.

    Output schema: edge rows ``(u, v, key cols = null)``; boundary/rep rows
    ``(u = local_min, v = null, key cols set)``.
    """

    def __init__(self, keys: list[str], node: str):
        self.keys = keys
        self.node = node

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, node = self.keys, self.node
        n = batch.num_rows
        empty = pa.table(
            {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
             **{k: pa.array([], pa.int64()) for k in keys}})
        if n == 0:
            return empty
        kcols = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
        d = batch[node].to_numpy(zero_copy_only=False)
        starts = _segment_starts(kcols)
        ends = np.concatenate([starts[1:], [n]])
        mins = np.minimum.reduceat(d, starts)
        rep = np.repeat(mins, ends - starts)
        u = np.minimum(rep, d)
        v = np.maximum(rep, d)
        mask = u != v
        eu, ev = u[mask], v[mask]
        # rep rows: only the batch-boundary segments can straddle blocks
        if len(starts) == 1:
            ridx = np.array([0])
        else:
            ridx = np.array([0, len(starts) - 1])
        ru = mins[ridx]
        rkeys = [k[starts[ridx]] for k in kcols]
        edge_part = pa.table({
            "u": pa.array(eu, type=pa.int64()),
            "v": pa.array(ev, type=pa.int64()),
            **{k: pa.nulls(len(eu), type=pa.int64()) for k in keys},
        })
        rep_part = pa.table({
            "u": pa.array(ru, type=pa.int64()),
            "v": pa.nulls(len(ru), type=pa.int64()),
            **{keys[i]: pa.array(rkeys[i].astype(np.int64), type=pa.int64())
               for i in range(len(keys))},
        })
        return pa.concat_tables([edge_part, rep_part])


def star_edges(ds, keys: list[str], node: str = "doc_id", *, salt: int = 1):
    """Candidate edges from bucket co-membership.  Returns a Dataset(u, v).

    ``keys`` are int64 columns identifying the bucket; ``salt > 1``
    appends a deterministic ``hash(node) % salt`` sub-key to the SORT
    order (segmentation stays at the bucket level), letting the range
    partitioner split a degenerate hot bucket across up to ``salt``
    blocks — the boundary fixup links the per-block local minima, so the
    emitted edge set is connectivity-identical at any salt.
    """
    sort_keys = list(keys)
    if salt > 1:
        smax = min(int(salt), 127)

        def add_salt(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or node not in t.column_names:
                return t
            d = t[node].to_numpy(zero_copy_only=False)
            s = (splitmix64(d.view(np.uint64) if d.dtype == np.int64 else
                            d.astype(np.uint64)) % np.uint64(smax))
            return t.append_column("_salt",
                                   pa.array(s.astype(np.int8), pa.int8()))

        ds = ds.map_batches(add_salt, batch_format="pyarrow")
        sort_keys = keys + ["_salt"]
    return _star_edges_single(ds, sort_keys, keys, node)


def _star_edges_single(ds, sort_keys: list[str], keys: list[str], node: str):
    import ray.data as rd

    # materialized because both the edge and rep filters consume it — the
    # emitted table is ~24 B/row, far smaller than re-running the sort.
    mixed = ds.sort(sort_keys).map_batches(
        _EmitStarEdges(keys, node), batch_format="pyarrow"
    ).materialize()

    def only_edges(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.is_valid(t["v"])).select(["u", "v"])

    def only_reps(t: pa.Table) -> pa.Table | None:
        # raw-task probes see every block, including zero-column empties
        if t.num_rows == 0 or any(c not in t.column_names
                                  for c in ["u", "v"] + keys):
            return None
        return t.filter(pa.compute.is_null(t["v"])).select(["u"] + keys)

    edges = mixed.map_batches(only_edges, batch_format="pyarrow")
    # boundary fixup: tiny (<= 2 rows per batch) — link local minima of the
    # same key that straddled a batch boundary, driver-side (raw tasks over
    # the materialized blocks, no extra dataset execution).
    from smqtk_indexing_ray.stages._util import probe_blocks
    ptbl = probe_blocks(mixed, only_reps)
    bdf = ptbl.to_pandas() if ptbl.num_columns else __import__("pandas").DataFrame(columns=["u"] + keys)
    extra = _link_group_mins(bdf, keys)
    if len(extra):
        edges = edges.union(rd.from_arrow(extra))
    return edges


def _link_group_mins(bdf: pd.DataFrame, keys: list[str]) -> pa.Table:
    if bdf.empty:
        return _empty_edges()
    g = bdf.groupby(keys)["u"]
    gmin = g.transform("min")
    mask = bdf["u"].to_numpy() != gmin.to_numpy()
    if not mask.any():
        return _empty_edges()
    return pa.table({"u": pa.array(gmin.to_numpy()[mask], pa.int64()),
                     "v": pa.array(bdf["u"].to_numpy()[mask], pa.int64())})
