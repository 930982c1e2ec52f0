"""Exact distributed order statistics over one column.

``column_quantiles`` sorts ONLY the requested column (8 B/row through
the shuffle), then resolves each quantile to a global index using block
METADATA row counts (no data fetched), and reads just the few rows it
needs with raw tasks over the sorted blocks — O(n log n) narrow sort +
O(#quantiles) point reads, never a driver-side materialization.

Index rule matches DuckDB's ``quantile_disc`` exactly (element at
``ceil(q * n) - 1``, 0-based, clamped; calibrated empirically), so the
result is bit-identical to the SQL oracle.

Reference analog: the argpartition-based selection in the MRPT builder
(/root/reference/smqtk_indexing/impls/nn_index/mrpt.py:333-345) is the
in-memory form of the same order-statistic primitive.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def group_quantiles(ds, *, group: str, col: str,
                    qs: list[float]) -> pa.Table:
    """Exact per-group discrete quantiles -> table ``(group, q, col)``.

    Same machinery as :func:`column_quantiles`, generalized: one narrow
    ``(group, col)`` sort (the group key co-locates and orders every
    group's values), a run-length probe per block whose TOTAL output is
    O(#groups + #blocks) rows (each group spans contiguous blocks in a
    sorted dataset, so it contributes one run per block it touches),
    driver-side run stitching, and O(#groups x #quantiles) point reads
    batched per block.  Driver memory is proportional to the OUTPUT
    size, never the input.  Per-group index rule matches DuckDB
    ``quantile_disc`` bit-exactly (element at ``ceil(q*n_g) - 1`` within
    the group's sorted slice).

    Reference analog: the per-tree median split of the MRPT builder
    (/root/reference/smqtk_indexing/impls/nn_index/mrpt.py:333-345)
    is the single-group, q=0.5 form of this primitive.
    """
    import ray

    from smqtk_indexing_ray.stages._util import _get_probe_task

    srt = ds.select_columns([group, col]).sort([group, col]).materialize()
    sch = srt.schema()
    sch = sch.base_schema if hasattr(sch, "base_schema") else sch
    gtype = sch.field(group).type
    ctype = sch.field(col).type

    blocks = [(ref, meta.num_rows)
              for bundle in srt.iter_internal_ref_bundles()
              for ref, meta in bundle.blocks]
    if any(c is None for _, c in blocks):
        raise RuntimeError("group_quantiles: block metadata lacks row "
                           "counts; cannot resolve quantile indices")
    counts = np.array([c for _, c in blocks], dtype=np.int64)
    n = int(counts.sum())
    if n == 0:
        raise ValueError(f"group_quantiles: no rows in {col!r}")
    cum = np.concatenate([[0], np.cumsum(counts)])

    def rle(t: pa.Table) -> pa.Table:
        psch = pa.schema([("k", gtype), ("cnt", pa.int64())])
        if t.num_rows == 0 or group not in t.column_names:
            return psch.empty_table()
        g = t[group].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0],
                                 np.flatnonzero(g[1:] != g[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [t.num_rows]]))
        return pa.table({
            "k": t[group].take(pa.array(starts, pa.int64())),
            "cnt": pa.array(lens.astype(np.int64)),
        })

    task = _get_probe_task()
    per_block = ray.get([task.remote(rle, ref) for ref, _ in blocks])

    # stitch runs across block boundaries (blocks arrive in sort order)
    keys: list = []
    gcounts: list[int] = []
    for tbl in per_block:
        if tbl is None or tbl.num_rows == 0:
            continue
        for kk, cc in zip(tbl["k"].to_pylist(), tbl["cnt"].to_pylist()):
            if keys and keys[-1] == kk:
                gcounts[-1] += int(cc)
            else:
                keys.append(kk)
                gcounts.append(int(cc))
    gstarts = np.concatenate([[0], np.cumsum(gcounts)])[:-1]

    out_group: list = []
    out_q: list[float] = []
    want: dict[int, list[tuple[int, int]]] = {}
    row = 0
    for kk, ng, sg in zip(keys, gcounts, gstarts):
        for q in qs:
            gidx = int(sg) + min(ng - 1,
                                 max(0, math.ceil(float(q) * ng) - 1))
            b = int(np.searchsorted(cum, gidx, side="right") - 1)
            want.setdefault(b, []).append((row, gidx - int(cum[b])))
            out_group.append(kk)
            out_q.append(float(q))
            row += 1

    futs = {}
    for b, pairs in want.items():
        offs = tuple(o for _, o in pairs)

        def take(t: pa.Table, _offs=offs) -> pa.Table:
            return t.take(pa.array(list(_offs), pa.int64()))

        futs[b] = task.remote(take, blocks[b][0])
    got = {b: ray.get(f) for b, f in futs.items()}

    vals: list = [None] * row
    for b, pairs in want.items():
        tbl = got[b]
        for i, (r, _) in enumerate(pairs):
            vals[r] = tbl[col][i].as_py()
    return pa.table({
        group: pa.array(out_group, gtype),
        "q": pa.array(out_q, pa.float64()),
        col: pa.array(vals, ctype),
    })


def column_quantiles(ds, col: str, qs: list[float]) -> pa.Table:
    """Exact discrete quantiles of ``ds[col]`` -> table ``(q, col)``.

    ``qs`` in [0, 1]; raises ValueError on an empty column.
    """
    import ray

    from smqtk_indexing_ray.stages._util import _get_probe_task

    srt = ds.select_columns([col]).sort(col).materialize()
    blocks = [(ref, meta.num_rows)
              for bundle in srt.iter_internal_ref_bundles()
              for ref, meta in bundle.blocks]
    if any(c is None for _, c in blocks):
        # metadata row counts are always present on materialized
        # datasets; silently treating unknown as 0 would shift indices
        raise RuntimeError("column_quantiles: block metadata lacks row "
                           "counts; cannot resolve quantile indices")
    counts = np.array([c for _, c in blocks], dtype=np.int64)
    n = int(counts.sum())
    if n == 0:
        raise ValueError(f"column_quantiles: no rows in {col!r}")
    cum = np.concatenate([[0], np.cumsum(counts)])

    # global row index per quantile (DuckDB quantile_disc rule)
    want: dict[int, list[tuple[int, int]]] = {}
    for qi, q in enumerate(qs):
        gidx = min(n - 1, max(0, math.ceil(float(q) * n) - 1))
        b = int(np.searchsorted(cum, gidx, side="right") - 1)
        want.setdefault(b, []).append((qi, gidx - int(cum[b])))

    task = _get_probe_task()
    futs = {}
    for b, pairs in want.items():
        offs = [o for _, o in pairs]

        def take(t: pa.Table, _offs=tuple(offs)) -> pa.Table:
            return t.take(pa.array(list(_offs), pa.int64()))

        futs[b] = task.remote(take, blocks[b][0])
    got = {b: ray.get(f) for b, f in futs.items()}

    out_q = np.asarray(qs, dtype=np.float64)
    vals: list = [None] * len(qs)
    for b, pairs in want.items():
        tbl = got[b]
        for row, (qi, _) in enumerate(pairs):
            vals[qi] = tbl[col][row]
    return pa.table({
        "q": pa.array(out_q),
        col: pa.array([v.as_py() for v in vals],
                      srt.schema().base_schema.field(col).type
                      if hasattr(srt.schema(), "base_schema")
                      else srt.schema().field(col).type),
    })


def approx_quantiles(ds, *, col: str, qs: list[float], k: int = 1000,
                     id_col: str = "doc_id",
                     value_type: pa.DataType | None = None):
    """Approximate quantiles from a deterministic bottom-k sample —
    the 100-TB scale path beside :func:`column_quantiles`' exact
    narrow sort (which must still shuffle 8 B x N rows; this exchanges
    at most ``k`` rows per batch).

    Sampling: ``draw = (id * 1103515245 + 12345) % 2**31`` (the repo's
    SQL-reproducible LCG, shared with ``stratified_sample``); the ``k``
    rows with the smallest ``(draw, id)`` form a deterministic
    uniform-without-replacement sample, assembled by a bounded
    two-level merge (per-batch bottom-k -> per-block merge ->
    single-block merge — each level's input is #blocks x k rows, never
    the corpus).  ``quantile_disc`` over the sample estimates each q
    with rank error ~ sqrt(q(1-q)/k) (k=1000 -> about +/-1.6
    percentile points at the median, 95%); because the sample itself
    is SQL-reproducible, even this APPROXIMATE operator has an exact
    DuckDB oracle.

    Requires non-negative int64 ids below ~2**33 (the LCG product must
    not overflow int64 — the same bound the SQL side's BIGINT
    multiplication has); raises loudly above it.

    Returns a Dataset ``(q float64, <col> input-typed)``.
    """
    import pyarrow.compute as pc

    from smqtk_indexing_ray.stages._util import auto_blocks

    vt = value_type or pa.int64()
    part_schema = pa.schema([("draw", pa.int64()), ("_id", pa.int64()),
                             (col, vt)])

    def _bottomk(draw: np.ndarray, ids: np.ndarray,
                 vals: pa.Array) -> pa.Table:
        order = np.lexsort((ids, draw))[:k]
        return pa.table({
            "draw": pa.array(draw[order]),
            "_id": pa.array(ids[order]),
            col: pc.take(vals, pa.array(order)).cast(vt),
        }, schema=part_schema)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return part_schema.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.min() < 0 or ids.max() >= (1 << 33):
            raise ValueError(
                "approx_quantiles: id column must be in [0, 2**33) so "
                "the LCG draw cannot overflow int64")
        draw = (ids * 1103515245 + 12345) % 2147483648
        return _bottomk(draw, ids, t[col].combine_chunks())

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "draw" not in t.column_names:
            return part_schema.empty_table()
        draw = t["draw"].to_numpy(zero_copy_only=False)
        ids = t["_id"].to_numpy(zero_copy_only=False)
        return _bottomk(draw, ids, t[col].combine_chunks())

    # batch_size=None everywhere: each level's bottom-k must see its
    # WHOLE block, or a split block would emit several k-samples
    parts = ds.select_columns([id_col, col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
    merged = parts.repartition(auto_blocks()).map_batches(
        merge, batch_format="pyarrow", batch_size=None)
    sample = merged.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None)

    out_schema = pa.schema([("q", pa.float64()), (col, vt)])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or col not in t.column_names:
            return out_schema.empty_table()
        v = np.sort(t[col].to_numpy(zero_copy_only=False),
                    kind="stable")
        n = len(v)
        idx = [min(n - 1, max(0, math.ceil(float(q) * n) - 1))
               for q in qs]
        return pa.table({
            "q": pa.array([float(q) for q in qs], pa.float64()),
            col: pa.array(v[idx]).cast(vt),
        }, schema=out_schema)

    return sample.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)
