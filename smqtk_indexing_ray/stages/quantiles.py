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
