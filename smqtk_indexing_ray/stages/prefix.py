"""Distributed exclusive prefix sum over a globally ordered column.

One range-partitioning sort by the order key, then the per-block
boundary machinery shared with stages/topk and stages/attach: a tiny
probe per block returns its value total, the driver folds those into
per-block carries (an O(blocks) scan of int64s), and a fill task adds
``carry + batch-local exclusive cumsum`` — no second shuffle, no
driver-side data beyond one int64 per block.

Semantics match ``sum(value) OVER (ORDER BY order ROWS BETWEEN
UNBOUNDED PRECEDING AND 1 PRECEDING)`` exactly (int64 arithmetic on
both sides), so SQL window oracles are bit-exact.

Reference analog: none — the reference is single-process, where a
running total is ``np.cumsum``.  This is the distributed primitive
that makes order-dependent layouts (fixed-token training shards,
byte-offset manifests) expressible without serializing the corpus
through the driver.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa


def running_total(ds, *, order: str | list[str], value: str,
                  out: str = "before",
                  descending: bool | list[bool] = False,
                  schema: pa.Schema | None = None):
    """Append int64 column ``out`` = sum of ``value`` over all rows
    strictly before this one in ``order`` (a column name or a list of
    columns with per-column ``descending`` flags).  The combined order
    key must be unique (ties would make the prefix nondeterministic
    across retries); ``value`` must be integral and non-negative."""
    import ray
    import ray.data as rd

    from smqtk_indexing_ray.stages._util import _get_probe_task

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    out_schema = pa.schema(list(sch) + [pa.field(out, pa.int64())])
    from smqtk_indexing_ray.stages._util import coalesced_sort
    srt = coalesced_sort(ds, order, descending=descending)

    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema([("total", pa.int64())])
        if t.num_rows == 0 or value not in t.column_names:
            return pa.table({"total": pa.array([0], pa.int64())},
                            schema=psch)
        v = t[value].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"total": pa.array([int(v.sum())], pa.int64())},
                        schema=psch)

    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()
    totals = [int(t["total"][0].as_py()) if t is not None and t.num_rows
              else 0 for t in ray.get([task.remote(probe, r)
                                       for r in refs])]
    carries = np.concatenate(([0], np.cumsum(totals[:-1], dtype=np.int64)))

    def fill(t: pa.Table, carry: int) -> pa.Table:
        if t.num_rows == 0 or value not in t.column_names:
            return out_schema.empty_table()
        v = t[value].to_numpy(zero_copy_only=False).astype(np.int64)
        before = np.concatenate(([0], np.cumsum(v[:-1], dtype=np.int64)))
        before += carry
        return t.append_column(out, pa.array(before))

    filled = [task.remote(functools.partial(fill, carry=int(carries[i])), r)
              for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)
