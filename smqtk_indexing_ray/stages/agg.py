"""Sort-based grouped aggregation over a single key column.

Ray Data's hash ``groupby().aggregate()`` spins up aggregator actors
that reserve CPU + logical memory per operator; measured on this host a
147k-key aggregate over 590k partial rows costs 5.2 s where the SAME
data sorts in 0.8 s (see stages/attach.py module docstring for the join
form of the measurement).  For single-key aggregations on the hot path
this stage replaces the hash shuffle with one range-partitioning sort +
a vectorized per-block segment reduce, using the boundary-carry
machinery shared with stages/topk and stages/prefix:

- a tiny probe per sorted block returns its first/last key and the
  aggregate of its LAST run;
- the driver folds those into per-block carries (O(blocks) int64s) and
  a ``drop_last`` flag for blocks whose final key continues into the
  next block (the continuing block owns the merged segment);
- a fill task segment-reduces each block (``np.add.reduceat`` /
  ``minimum`` / ``maximum``), merges the carry into its first segment,
  and drops the handed-off last segment.

Exact int64/float64 semantics identical to ``GROUP BY key`` with
``sum/min/max/count`` — the carry combine is the same associative op as
the segment reduce, so block layout cannot change results (int sums are
exact; float sums associate differently than a hash aggregate would,
which is why oracle-facing float outputs still go through the
int64-units or round6 disciplines).

Reference analog: the per-bucket accumulation loop of the LSH bucket
map build (/root/reference/smqtk_indexing/impls/nn_index/lsh.py:315-323)
is the single-process form of this primitive.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

_OPS = {
    "sum": (np.add, 0),
    "min": (np.minimum, None),
    "max": (np.maximum, None),
    "count": (np.add, 0),
}


def sorted_group_agg(ds, *, key: str, aggs: dict[str, str],
                     schema: pa.Schema | None = None):
    """``GROUP BY key`` with per-column ``sum|min|max|count`` aggs via
    one sort instead of a hash shuffle.  ``aggs`` maps value-column ->
    op; ``count`` counts group rows into an int64 column of that name
    (the source column's values are ignored).  Output columns:
    ``key`` + the agg columns, one row per distinct key.
    """
    import ray
    import ray.data as rd

    from smqtk_indexing_ray.stages._util import _get_probe_task

    for col, op in aggs.items():
        if op not in _OPS:
            raise ValueError(f"unsupported agg {op!r} for {col!r}")

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    ktype = sch.field(key).type
    out_fields = [pa.field(key, ktype)]
    for col, op in aggs.items():
        out_fields.append(pa.field(
            col, pa.int64() if op == "count" else sch.field(col).type))
    out_schema = pa.schema(out_fields)

    # inputs here are per-batch partial aggregates: many tiny blocks.
    # Sorts cost O(input_blocks x output_partitions) merge tasks, so
    # coalesce to ~CPUs first (the measured r2 lever, _util.auto_blocks)
    from smqtk_indexing_ray.stages._util import auto_blocks
    srt = ds.repartition(auto_blocks()).sort(key).materialize()
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()

    def _segments(t: pa.Table):
        k = t[key].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0],
                                 np.flatnonzero(k[1:] != k[:-1]) + 1])
        ends = np.concatenate([starts[1:], [t.num_rows]])
        return k, starts, ends

    def _reduce_run(t: pa.Table, col: str, op: str, starts, ends):
        if op == "count":
            return (ends - starts).astype(np.int64)
        v = t[col].to_numpy(zero_copy_only=False)
        fn, _ = _OPS[op]
        out = fn.reduceat(v, starts)
        # reduceat with a start index == len-1 handles fine; segments
        # are non-empty by construction
        return out

    def probe(t: pa.Table) -> pa.Table:
        cols = {"fk": None, "lk": None}
        psch = pa.schema([("fk", ktype), ("lk", ktype)]
                         + [pa.field(f"last_{c}",
                                     pa.int64() if o == "count"
                                     else sch.field(c).type)
                            for c, o in aggs.items()])
        if t.num_rows == 0 or key not in t.column_names:
            return psch.empty_table()
        k, starts, ends = _segments(t)
        data = {
            "fk": t[key].slice(0, 1),
            "lk": t[key].slice(t.num_rows - 1, 1),
        }
        for c, o in aggs.items():
            vals = _reduce_run(t, c, o, starts, ends)
            data[f"last_{c}"] = pa.array([vals[-1]],
                                         psch.field(f"last_{c}").type)
        return pa.table(data, schema=psch)

    per_block = ray.get([task.remote(probe, r) for r in refs])

    # driver fold: carry[i] = the agg of block i's FIRST key over all
    # earlier blocks (same chain as stages/topk); drop_last[i] = block
    # i's last key continues into block i+1, which owns the merge
    carries: list[dict | None] = []
    acc_key = None
    acc: dict = {}
    first_keys: list = []         # block's OWN first key (None if empty)
    last_keys: list = []          # block's OWN last key (None if empty)
    for tbl in per_block:
        carries.append(None if acc_key is None
                       else {"k": acc_key, **acc})
        if tbl is None or tbl.num_rows == 0:
            first_keys.append(None)
            last_keys.append(None)
            continue
        fk = tbl["fk"][0].as_py()
        lk = tbl["lk"][0].as_py()
        first_keys.append(fk)
        last_keys.append(lk)
        last_vals = {c: tbl[f"last_{c}"][0].as_py() for c in aggs}
        if acc_key == lk:
            # whole block is one run continuing the chain
            for c, o in aggs.items():
                fn, _ = _OPS[o]
                acc[c] = fn(acc[c], last_vals[c])
        else:
            acc_key = lk
            acc = last_vals
    # drop the last segment iff the NEXT NON-EMPTY block starts with the
    # same key (empty range-partition blocks in between must not break
    # the handoff — a double-emit would double-count the carry)
    n_b = len(refs)
    next_fk: list = [None] * n_b
    nxt = None
    for i in range(n_b - 1, -1, -1):
        next_fk[i] = nxt
        if first_keys[i] is not None:
            nxt = first_keys[i]
    drop_last = [last_keys[i] is not None and next_fk[i] == last_keys[i]
                 for i in range(n_b)]

    def fill(t: pa.Table, carry: dict | None, drop: bool) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return out_schema.empty_table()
        k, starts, ends = _segments(t)
        nseg = len(starts)
        data = {key: t[key].take(pa.array(starts, pa.int64()))}
        reduced = {}
        for c, o in aggs.items():
            reduced[c] = _reduce_run(t, c, o, starts, ends)
        if carry is not None and carry["k"] == (
                k[0].item() if hasattr(k[0], "item") else k[0]):
            for c, o in aggs.items():
                fn, _ = _OPS[o]
                reduced[c][0] = fn(reduced[c][0], carry[c])
        stop = nseg - 1 if (drop and nseg) else nseg
        if stop <= 0:
            return out_schema.empty_table()
        data[key] = data[key].slice(0, stop)
        for c in aggs:
            data[c] = pa.array(reduced[c][:stop],
                               out_schema.field(c).type)
        return pa.table(data, schema=out_schema)

    filled = [task.remote(
        functools.partial(fill, carry=carries[i], drop=drop_last[i]), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)
