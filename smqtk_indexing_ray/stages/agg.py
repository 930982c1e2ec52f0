"""Sort-based grouped aggregation over one or more key columns.

Ray Data's hash ``groupby().aggregate()`` spins up aggregator actors
that reserve CPU + logical memory per operator; measured on this host a
147k-key aggregate over 590k partial rows costs 5.2 s where the SAME
data sorts in 0.8 s (see stages/attach.py module docstring for the join
form of the measurement).  For key-grouped aggregations on the hot path
this stage replaces the hash shuffle with one range-partitioning sort +
a vectorized per-block segment reduce, using the boundary-carry
machinery shared with stages/topk and stages/prefix:

- a tiny probe per sorted block returns its first/last key tuple and
  the aggregate of its LAST run;
- the driver folds those into per-block carries (O(blocks) scalars) and
  a ``drop_last`` flag for blocks whose final key continues into the
  next non-empty block (the continuing block owns the merged segment);
- a fill task segment-reduces each block (``np.add.reduceat`` /
  ``minimum`` / ``maximum``), merges the carry into its first segment,
  and drops the handed-off last segment.

Exact semantics identical to ``GROUP BY keys`` with
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
import pyarrow.compute as pc

_OPS = {
    "sum": (np.add, 0),
    "min": (np.minimum, None),
    "max": (np.maximum, None),
    "count": (np.add, 0),
}

# carry combine as fn(earlier, later) — sum/min/max/count are
# commutative; first/last are the order-sensitive arg-extremes and only
# make sense when the caller supplies ``order`` columns.  ``concat``
# (string_agg) is added per-call in sorted_group_agg because its
# combine closes over the separator.
_COMBINE = {
    "sum": np.add,
    "min": np.minimum,
    "max": np.maximum,
    "count": np.add,
    "first": lambda earlier, later: earlier,
    "last": lambda earlier, later: later,
}


def sorted_first_attach(ds, *, key: str | list[str],
                        value: str | list[str],
                        out: str | list[str],
                        num_blocks: int | None = None,
                        schema: pa.Schema | None = None):
    """Attach each group's FIRST row's ``value`` column(s) in
    ``(keys..., values...)`` sort order to every row of the group — the
    lexicographic group minimum, i.e. ``min(values) OVER (PARTITION BY
    keys)`` in one sort, replacing the hash-groupby + join the
    label-attach pattern would otherwise pay (two aggregator-actor
    launches).

    Works because sorting by the value columns inside the group puts
    the group minimum at the run's global head: rows in later blocks
    only ever need a FORWARD carry (the head values from the block
    where the run began), the same chain the other stages in this
    module use.
    """
    import ray
    import ray.data as rd

    from smqtk_indexing_ray.stages._util import (
        _get_probe_task,
        coalesced_sort,
    )

    keys = [key] if isinstance(key, str) else list(key)
    values = [value] if isinstance(value, str) else list(value)
    outs = [out] if isinstance(out, str) else list(out)
    if len(values) != len(outs):
        raise ValueError("value/out length mismatch")

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    vtypes = [sch.field(v).type for v in values]
    out_schema = pa.schema(list(sch) + [pa.field(o, vt)
                                        for o, vt in zip(outs, vtypes)])

    srt = coalesced_sort(ds, keys + values, num_blocks=num_blocks)
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()

    def _segments(t: pa.Table):
        n = t.num_rows
        change = np.zeros(n - 1, bool) if n > 1 else np.zeros(0, bool)
        for k in keys:
            col = t[k].to_numpy(zero_copy_only=False)
            if n > 1:
                change |= col[1:] != col[:-1]
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        ends = np.concatenate([starts[1:], [n]])
        return starts, ends

    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema(
            [pa.field(f"fk_{k}", sch.field(k).type) for k in keys]
            + [pa.field(f"lk_{k}", sch.field(k).type) for k in keys]
            + [pa.field(f"last_first_{v}", vt)
               for v, vt in zip(values, vtypes)])
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in keys):
            return psch.empty_table()
        starts, _ = _segments(t)
        data = {}
        for k in keys:
            data[f"fk_{k}"] = t[k].slice(0, 1)
            data[f"lk_{k}"] = t[k].slice(t.num_rows - 1, 1)
        for v in values:
            data[f"last_first_{v}"] = t[v].slice(int(starts[-1]), 1)
        return pa.table(data, schema=psch)

    per_block = ray.get([task.remote(probe, r) for r in refs])

    carries: list[tuple | None] = []   # (key_tuple, head_values)
    acc_key: tuple | None = None
    acc_val: tuple | None = None
    for tbl in per_block:
        carries.append(None if acc_key is None else (acc_key, acc_val))
        if tbl is None or tbl.num_rows == 0:
            continue
        lk = tuple(tbl[f"lk_{k}"][0].as_py() for k in keys)
        if acc_key != lk:
            # the last run STARTS in this block: its head values are here
            acc_key = lk
            acc_val = tuple(tbl[f"last_first_{v}"][0].as_py()
                            for v in values)
        # else: the whole block continues the chained run — the head
        # values stay from the originating block

    def fill(t: pa.Table, carry: tuple | None) -> pa.Table:
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in keys):
            return out_schema.empty_table()
        starts, ends = _segments(t)
        use_carry = False
        if carry is not None:
            first_key = tuple(t[k][0].as_py() for k in keys)
            use_carry = carry[0] == first_key
        for vi, (v, o, vt) in enumerate(zip(values, outs, vtypes)):
            if t[v].null_count:
                raise ValueError(
                    f"sorted_first_attach: {v!r} contains nulls; fill "
                    f"or filter them upstream")
            col = t[v].to_numpy(zero_copy_only=False)
            heads = col[starts].copy()
            if use_carry:
                heads[0] = carry[1][vi]
            t = t.append_column(
                o, pa.array(np.repeat(heads, ends - starts), vt))
        return t

    filled = [task.remote(
        functools.partial(fill, carry=carries[i]), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)


def sorted_run_length_attach(ds, *, key: str | list[str],
                             out: str = "run_len",
                             num_blocks: int | None = None,
                             schema: pa.Schema | None = None):
    """Attach each group's COMPLETE size to every row of the group —
    ``count(*) OVER (PARTITION BY keys)`` in one sort.

    Interior runs of a sorted block know their own length locally; only
    the (at most two) runs touching a block boundary can continue into
    neighboring blocks.  A tiny probe per block returns its first/last
    key tuples and their local run lengths; the driver folds those into
    per-boundary-key TOTALS (O(blocks) scalars — a sorted run spans
    consecutive blocks, so each block just adds its edge-run lengths to
    the shared key's total) and hands each fill task the totals for its
    own first and last keys.

    Reference analog: the per-bucket size accounting of the LSH bucket
    map (/root/reference/smqtk_indexing/impls/nn_index/lsh.py:315-323,
    count() at interfaces/nn_index.py:60-74) attached at row grain.
    """
    import ray
    import ray.data as rd

    from smqtk_indexing_ray.stages._util import (
        _get_probe_task,
        coalesced_sort,
    )

    keys = [key] if isinstance(key, str) else list(key)

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    out_schema = pa.schema(list(sch) + [pa.field(out, pa.int64())])

    srt = coalesced_sort(ds, keys, num_blocks=num_blocks)
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()

    def _segments(t: pa.Table):
        n = t.num_rows
        change = np.zeros(n - 1, bool) if n > 1 else np.zeros(0, bool)
        for k in keys:
            if t[k].null_count:
                raise ValueError(
                    f"sorted_run_length_attach: key {k!r} contains "
                    f"nulls; fill or filter them upstream")
            col = t[k].to_numpy(zero_copy_only=False)
            if n > 1:
                change |= col[1:] != col[:-1]
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        ends = np.concatenate([starts[1:], [n]])
        return starts, ends

    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema(
            [pa.field(f"fk_{k}", sch.field(k).type) for k in keys]
            + [pa.field(f"lk_{k}", sch.field(k).type) for k in keys]
            + [pa.field("first_len", pa.int64()),
               pa.field("last_len", pa.int64())])
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in keys):
            return psch.empty_table()
        starts, ends = _segments(t)
        data = {}
        for k in keys:
            data[f"fk_{k}"] = t[k].slice(0, 1)
            data[f"lk_{k}"] = t[k].slice(t.num_rows - 1, 1)
        data["first_len"] = pa.array([int(ends[0] - starts[0])],
                                     pa.int64())
        data["last_len"] = pa.array([int(ends[-1] - starts[-1])],
                                    pa.int64())
        return pa.table(data, schema=psch)

    per_block = ray.get([task.remote(probe, r) for r in refs])

    # boundary-key totals: every block adds its edge-run local lengths
    # to the shared dict; keys fully interior to one block never enter
    totals: dict[tuple, int] = {}
    edges: list[tuple | None] = []   # (fk_tuple, lk_tuple) per block
    for tbl in per_block:
        if tbl is None or tbl.num_rows == 0:
            edges.append(None)
            continue
        fk = tuple(tbl[f"fk_{k}"][0].as_py() for k in keys)
        lk = tuple(tbl[f"lk_{k}"][0].as_py() for k in keys)
        first_len = tbl["first_len"][0].as_py()
        last_len = tbl["last_len"][0].as_py()
        if fk == lk:
            totals[fk] = totals.get(fk, 0) + first_len
        else:
            totals[fk] = totals.get(fk, 0) + first_len
            totals[lk] = totals.get(lk, 0) + last_len
        edges.append((fk, lk))

    def fill(t: pa.Table, first_total: int | None,
             last_total: int | None) -> pa.Table:
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in keys):
            return out_schema.empty_table()
        starts, ends = _segments(t)
        lens = (ends - starts).astype(np.int64)
        if first_total is not None:
            lens[0] = first_total
        if last_total is not None:
            lens[-1] = last_total
        return t.append_column(
            out, pa.array(np.repeat(lens, ends - starts), pa.int64()))

    filled = []
    for i, r in enumerate(refs):
        if edges[i] is None:
            ft = lt = None
        else:
            fk, lk = edges[i]
            ft, lt = totals[fk], totals[lk]
        filled.append(task.remote(
            functools.partial(fill, first_total=ft, last_total=lt), r))
    return rd.from_arrow_refs(filled)


def sorted_rank_attach(ds, *, key: str | list[str],
                       order: str | list[str],
                       out: str = "rank",
                       num_blocks: int | None = None,
                       schema: pa.Schema | None = None):
    """Attach each row's 0-based position within its key partition in
    ``(keys..., order...)`` sort order — ``row_number() OVER (PARTITION
    BY keys ORDER BY order) - 1`` in one sort.

    A row's rank is its local offset inside its run plus the count of
    the run's rows living in EARLIER blocks; that count is the same
    forward chain the other stages here fold (probe each block's
    first/last key and edge-run lengths, accumulate block-to-block on
    the driver — O(blocks) scalars).

    Reference analog: the ascending candidate ordering of the exact
    re-rank (/root/reference/smqtk_indexing/impls/nn_index/
    lsh.py:513-518), attached as a persistent per-partition position.
    """
    import ray
    import ray.data as rd

    from smqtk_indexing_ray.stages._util import (
        _get_probe_task,
        coalesced_sort,
    )

    keys = [key] if isinstance(key, str) else list(key)
    orders = [order] if isinstance(order, str) else list(order)

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    out_schema = pa.schema(list(sch) + [pa.field(out, pa.int64())])

    srt = coalesced_sort(ds, keys + orders, num_blocks=num_blocks)
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()

    def _segments(t: pa.Table):
        n = t.num_rows
        change = np.zeros(n - 1, bool) if n > 1 else np.zeros(0, bool)
        for k in keys:
            if t[k].null_count:
                raise ValueError(
                    f"sorted_rank_attach: key {k!r} contains nulls; "
                    f"fill or filter them upstream")
            col = t[k].to_numpy(zero_copy_only=False)
            if n > 1:
                change |= col[1:] != col[:-1]
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        ends = np.concatenate([starts[1:], [n]])
        return starts, ends

    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema(
            [pa.field(f"fk_{k}", sch.field(k).type) for k in keys]
            + [pa.field(f"lk_{k}", sch.field(k).type) for k in keys]
            + [pa.field("last_len", pa.int64()),
               pa.field("n_rows", pa.int64())])
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in keys):
            return psch.empty_table()
        starts, ends = _segments(t)
        data = {}
        for k in keys:
            data[f"fk_{k}"] = t[k].slice(0, 1)
            data[f"lk_{k}"] = t[k].slice(t.num_rows - 1, 1)
        data["last_len"] = pa.array([int(ends[-1] - starts[-1])],
                                    pa.int64())
        data["n_rows"] = pa.array([t.num_rows], pa.int64())
        return pa.table(data, schema=psch)

    per_block = ray.get([task.remote(probe, r) for r in refs])

    # carry[i] = rows of block i's FIRST key run in earlier blocks
    carries: list[tuple | None] = []   # (key_tuple, count_before)
    acc_key: tuple | None = None
    acc_cnt = 0
    for tbl in per_block:
        carries.append(None if acc_key is None else (acc_key, acc_cnt))
        if tbl is None or tbl.num_rows == 0:
            continue
        fk = tuple(tbl[f"fk_{k}"][0].as_py() for k in keys)
        lk = tuple(tbl[f"lk_{k}"][0].as_py() for k in keys)
        n_rows = int(tbl["n_rows"][0].as_py())
        last_len = int(tbl["last_len"][0].as_py())
        if fk == lk and acc_key == fk:
            # whole block continues the chained run
            acc_cnt += n_rows
        else:
            acc_key = lk
            # single-run block starting a new chain counts all its rows;
            # otherwise the last run starts locally at last_len rows
            acc_cnt = n_rows if fk == lk else last_len

    def fill(t: pa.Table, carry: tuple | None) -> pa.Table:
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in keys):
            return out_schema.empty_table()
        starts, ends = _segments(t)
        rank = (np.arange(t.num_rows, dtype=np.int64)
                - np.repeat(starts, ends - starts))
        if carry is not None:
            first_key = tuple(t[k][0].as_py() for k in keys)
            if carry[0] == first_key:
                rank[:ends[0]] += carry[1]
        return t.append_column(out, pa.array(rank, pa.int64()))

    filled = [task.remote(
        functools.partial(fill, carry=carries[i]), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)


def sorted_lag_attach(ds, *, key: str | list[str],
                      order: str | list[str],
                      value: str | list[str],
                      out: str | list[str],
                      num_blocks: int | None = None,
                      schema: pa.Schema | None = None):
    """Attach the PREVIOUS row's ``value`` column(s) within each key
    partition — ``lag(value) OVER (PARTITION BY keys ORDER BY order)``
    in one sort.  First row of each partition gets null.

    Unlike the run-length/first attaches, lag needs only the single
    immediately-preceding ROW: each block's probe returns its last
    row's key tuple + values, the driver chains them in sorted block
    order (the carry for block *i* is just the last row of the nearest
    preceding non-empty block), and the fill shifts locally with a
    null-masked Arrow ``take``.

    Reference analog: the consecutive-neighbor comparison inside the
    reference's sorted re-rank (/root/reference/smqtk_indexing/impls/
    nn_index/lsh.py:513-518), lifted to a table-wide window primitive.
    """
    import ray
    import ray.data as rd

    from smqtk_indexing_ray.stages._util import (
        _get_probe_task,
        coalesced_sort,
    )

    keys = [key] if isinstance(key, str) else list(key)
    orders = [order] if isinstance(order, str) else list(order)
    values = [value] if isinstance(value, str) else list(value)
    outs = [out] if isinstance(out, str) else list(out)
    if len(values) != len(outs):
        raise ValueError("value/out length mismatch")

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    vtypes = [sch.field(v).type for v in values]
    out_schema = pa.schema(list(sch) + [pa.field(o, vt)
                                        for o, vt in zip(outs, vtypes)])

    srt = coalesced_sort(ds, keys + orders, num_blocks=num_blocks)
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()

    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema(
            [pa.field(f"lk_{k}", sch.field(k).type) for k in keys]
            + [pa.field(f"lv_{v}", vt)
               for v, vt in zip(values, vtypes)])
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in keys):
            return psch.empty_table()
        data = {}
        last = t.num_rows - 1
        for k in keys:
            if t[k].null_count:
                raise ValueError(
                    f"sorted_lag_attach: key {k!r} contains nulls; "
                    f"fill or filter them upstream")
            data[f"lk_{k}"] = t[k].slice(last, 1)
        for v in values:
            data[f"lv_{v}"] = t[v].slice(last, 1)
        return pa.table(data, schema=psch)

    per_block = ray.get([task.remote(probe, r) for r in refs])

    # carry for block i = last row of the nearest preceding non-empty
    # block (in global sort order that IS the previous row)
    carries: list[tuple | None] = []   # (key_tuple, value_tuple)
    prev: tuple | None = None
    for tbl in per_block:
        carries.append(prev)
        if tbl is None or tbl.num_rows == 0:
            continue
        prev = (tuple(tbl[f"lk_{k}"][0].as_py() for k in keys),
                tuple(tbl[f"lv_{v}"][0].as_py() for v in values))

    def fill(t: pa.Table, carry: tuple | None) -> pa.Table:
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in keys):
            return out_schema.empty_table()
        n = t.num_rows
        same = np.ones(n - 1, bool) if n > 1 else np.zeros(0, bool)
        for k in keys:
            col = t[k].to_numpy(zero_copy_only=False)
            if n > 1:
                same &= col[1:] == col[:-1]
        first_has_prev = (carry is not None and
                          carry[0] == tuple(t[k][0].as_py()
                                            for k in keys))
        # row 0 is always masked out of the take (its lag lives in the
        # carry and is patched below); masked indices are still
        # bounds-checked, so clamp them to 0
        valid = np.concatenate([[False], same])
        idx = np.arange(n, dtype=np.int64) - 1
        idx[~valid] = 0
        indices = pa.array(idx, pa.int64(), mask=~valid)
        first_mask = pa.array(np.arange(n) == 0)
        for vi, (v, o, vt) in enumerate(zip(values, outs, vtypes)):
            shifted = pc.take(t[v].combine_chunks(), indices)
            if first_has_prev:
                shifted = pc.if_else(first_mask,
                                     pa.scalar(carry[1][vi], vt),
                                     shifted)
            t = t.append_column(o, pc.cast(shifted, vt))
        return t

    filled = [task.remote(
        functools.partial(fill, carry=carries[i]), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)


def sorted_rolling_attach(ds, *, key: str | list[str],
                          order: str | list[str],
                          value: str, k: int,
                          out_count: str = "win_n",
                          out_max: str = "win_max",
                          num_blocks: int | None = None,
                          schema: pa.Schema | None = None):
    """Bounded-preceding rolling window — ``count(*)`` and
    ``max(value)`` OVER (PARTITION BY keys ORDER BY order ROWS BETWEEN
    k PRECEDING AND CURRENT ROW) in one sort.

    The window reaches back at most ``k`` rows, so the boundary carry
    is each block's last ``min(k, n)`` rows: the driver chains block
    tails in sorted order (``tail = (tail + block_tail)[-k:]``) and the
    fill prepends the carry rows that continue its first key run,
    computes the per-run sliding stats over the extended arrays
    (O(n·k) shifted-maximum passes — k is a small constant), and slices
    the prepended rows back off.  Count is exact int64; max is
    comparison-only, so float SQL parity is bit-exact.

    Reference analog: the bounded candidate re-rank window of the LSH
    query path (/root/reference/smqtk_indexing/impls/nn_index/
    lsh.py:513-518), generalized to a running table window.
    """
    import ray
    import ray.data as rd

    from smqtk_indexing_ray.stages._util import (
        _get_probe_task,
        coalesced_sort,
    )

    if k < 0:
        raise ValueError("k must be >= 0")
    keys = [key] if isinstance(key, str) else list(key)
    orders = [order] if isinstance(order, str) else list(order)

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    vtype = sch.field(value).type
    out_schema = pa.schema(list(sch) + [pa.field(out_count, pa.int64()),
                                        pa.field(out_max, vtype)])

    srt = coalesced_sort(ds, keys + orders, num_blocks=num_blocks)
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()

    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema(
            [pa.field(f"k_{c}", sch.field(c).type) for c in keys]
            + [pa.field("v", vtype)])
        if t.num_rows == 0 or any(c not in t.column_names
                                  for c in keys):
            return psch.empty_table()
        for c in keys:
            if t[c].null_count:
                raise ValueError(
                    f"sorted_rolling_attach: key {c!r} contains nulls; "
                    f"fill or filter them upstream")
        if t[value].null_count:
            raise ValueError(
                f"sorted_rolling_attach: value {value!r} contains "
                f"nulls; fill or filter them upstream")
        tail = t.slice(max(0, t.num_rows - k), min(k, t.num_rows))
        data = {f"k_{c}": tail[c] for c in keys}
        data["v"] = tail[value]
        return pa.table(data, schema=psch)

    per_block = ray.get([task.remote(probe, r) for r in refs])

    # carry[i] = the up-to-k rows immediately preceding block i in
    # global sort order: chain block tails, keep the last k
    carries: list[list] = []      # [(key_tuple, value), ...] oldest first
    tail: list = []
    for tbl in per_block:
        carries.append(list(tail))
        if tbl is None or tbl.num_rows == 0:
            continue
        rows = [(tuple(tbl[f"k_{c}"][j].as_py() for c in keys),
                 tbl["v"][j].as_py()) for j in range(tbl.num_rows)]
        tail = (tail + rows)[-k:] if k else []

    def fill(t: pa.Table, carry: list) -> pa.Table:
        if t.num_rows == 0 or any(c not in t.column_names
                                  for c in keys):
            return out_schema.empty_table()
        first_key = tuple(t[c][0].as_py() for c in keys)
        pre = [v for kt, v in carry if kt == first_key]
        m = len(pre)
        n = t.num_rows
        kcols = [np.concatenate([
            np.repeat(t[c].to_numpy(zero_copy_only=False)[:1], m),
            t[c].to_numpy(zero_copy_only=False)])
            for c in keys] if m else [
            t[c].to_numpy(zero_copy_only=False) for c in keys]
        vals = t[value].to_numpy(zero_copy_only=False)
        v = np.concatenate([np.asarray(pre, dtype=vals.dtype), vals]) \
            if m else vals
        ne = n + m
        change = np.zeros(ne - 1, bool) if ne > 1 else np.zeros(0, bool)
        for col in kcols:
            if ne > 1:
                change |= col[1:] != col[:-1]
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        seg = np.repeat(np.arange(len(starts)),
                        np.diff(np.concatenate([starts, [ne]])))
        pos = np.arange(ne) - starts[seg]
        cnt = np.minimum(pos, k).astype(np.int64) + 1
        mx = v.copy()
        for s in range(1, k + 1):
            ok = pos >= s
            if not ok.any():
                break
            shifted = np.empty_like(v)
            shifted[s:] = v[:-s]
            np.maximum(mx, shifted, out=mx, where=ok)
        t = t.append_column(out_count, pa.array(cnt[m:]))
        return t.append_column(out_max, pa.array(mx[m:], vtype))

    filled = [task.remote(
        functools.partial(fill, carry=carries[i]), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)


def sorted_group_agg(ds, *, key: str | list[str], aggs: dict[str, str],
                     order: str | list[str] | None = None,
                     num_blocks: int | None = None,
                     schema: pa.Schema | None = None,
                     concat_sep: str = "\n"):
    """``GROUP BY key(s)`` with per-column
    ``sum|min|max|count|first|last|concat`` aggs via one sort instead
    of a hash shuffle.  ``aggs`` maps output-column -> op (source
    column = output name) or -> ``(source_column, op)`` to alias, so
    one source column can feed several aggs.  ``count`` counts group
    rows into an int64 column of that name (no source column needed).
    ``first`` / ``last`` are the arg-extremes — the source value on
    the group's first/last row in ``(keys..., order...)`` sort order
    (``min/max BY`` / ``first_value/last_value`` in SQL terms) — and
    require ``order`` columns that make the within-group order total
    (e.g. a timestamp plus a unique id).  ``concat`` is the ordered
    ``string_agg(src, concat_sep ORDER BY order)``: per-block runs
    join vectorized (one ``pc.binary_join`` over the run list array);
    a group straddling blocks carries its partial string through the
    driver fold, so the carry is bounded by one group's joined size —
    callers aggregating document-scale groups are fine, do not concat
    corpus-scale ones.  Output columns: the key columns + the agg
    columns, one row per distinct key tuple.

    ``num_blocks``: pre-sort repartition target.  The default
    (~total CPUs, ``_util.auto_blocks``) is right for the common
    caller shape — per-batch PARTIAL aggregates, many tiny blocks.  A
    CORPUS-SIZED input (one row per document, e.g. exact dedup at the
    design scale) must pass a data-proportional value instead so
    blocks stay ~100 MB; every corpus-scale call site in this repo
    threads its ``num_partitions`` through.
    """
    import ray
    import ray.data as rd

    from smqtk_indexing_ray.stages._util import (
        _get_probe_task,
        coalesced_sort,
    )

    keys = [key] if isinstance(key, str) else list(key)
    orders = ([order] if isinstance(order, str)
              else list(order) if order else [])
    # normalize to out-name -> (source column, op)
    combine = dict(_COMBINE)
    combine["concat"] = lambda earlier, later: earlier + concat_sep + later
    spec: dict[str, tuple[str, str]] = {}
    for out_name, v in aggs.items():
        src, op = (out_name, v) if isinstance(v, str) else v
        if op not in combine:
            raise ValueError(f"unsupported agg {op!r} for {out_name!r}")
        if op in ("first", "last", "concat") and not orders:
            raise ValueError(
                f"agg {op!r} for {out_name!r} requires order= columns "
                f"(within-group order is undefined without them)")
        spec[out_name] = (src, op)

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    ktypes = {k: sch.field(k).type for k in keys}
    out_fields = [pa.field(k, ktypes[k]) for k in keys]
    for out_name, (src, op) in spec.items():
        out_fields.append(pa.field(
            out_name,
            pa.int64() if op == "count" else sch.field(src).type))
    out_schema = pa.schema(out_fields)

    srt = coalesced_sort(ds, keys + orders, num_blocks=num_blocks)
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()

    def _segments(t: pa.Table):
        """Run starts/ends over the composite key (change-mask OR)."""
        n = t.num_rows
        change = np.zeros(n - 1, bool) if n > 1 else np.zeros(0, bool)
        for k in keys:
            col = t[k].to_numpy(zero_copy_only=False)
            if n > 1:
                change |= col[1:] != col[:-1]
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        ends = np.concatenate([starts[1:], [n]])
        return starts, ends

    def _reduce_run(t: pa.Table, src: str, op: str, starts, ends):
        if op == "count":
            return (ends - starts).astype(np.int64)
        if t[src].null_count:
            # to_numpy silently promotes nullable ints to float/NaN,
            # which would corrupt the reduce — fail loudly instead
            raise ValueError(
                f"sorted_group_agg: {src!r} contains nulls; fill or "
                f"filter them upstream")
        if op == "concat":
            # runs tile the block contiguously (starts[0]=0,
            # ends[-1]=n), so one list array over the run offsets +
            # one vectorized binary_join does every group at once
            col = t[src]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            lists = pa.LargeListArray.from_arrays(
                pa.array(np.append(starts, t.num_rows), pa.int64()),
                col)
            return pc.binary_join(
                lists, concat_sep).to_numpy(zero_copy_only=False)
        v = t[src].to_numpy(zero_copy_only=False)
        if op == "first":
            return v[starts]
        if op == "last":
            return v[ends - 1]
        fn, _ = _OPS[op]
        return fn.reduceat(v, starts)

    def _key_tuple(t: pa.Table, row: int) -> tuple:
        return tuple(t[k][row].as_py() for k in keys)

    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema(
            [pa.field(f"fk_{k}", ktypes[k]) for k in keys]
            + [pa.field(f"lk_{k}", ktypes[k]) for k in keys]
            + [pa.field(f"last_{c}", out_schema.field(c).type)
               for c in spec])
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in keys):
            return psch.empty_table()
        starts, ends = _segments(t)
        data = {}
        for k in keys:
            data[f"fk_{k}"] = t[k].slice(0, 1)
            data[f"lk_{k}"] = t[k].slice(t.num_rows - 1, 1)
        for c, (src, o) in spec.items():
            vals = _reduce_run(t, src, o, starts, ends)
            data[f"last_{c}"] = pa.array([vals[-1]],
                                         psch.field(f"last_{c}").type)
        return pa.table(data, schema=psch)

    per_block = ray.get([task.remote(probe, r) for r in refs])

    # driver fold: carry[i] = the agg of block i's FIRST key tuple over
    # all earlier blocks (same chain as stages/topk); drop_last[i] =
    # block i's last key continues into the next NON-EMPTY block, which
    # owns the merged segment (empty range-partition blocks in between
    # must not break the handoff)
    carries: list[dict | None] = []
    acc_key: tuple | None = None
    acc: dict = {}
    first_keys: list = []
    last_keys: list = []
    for tbl in per_block:
        carries.append(None if acc_key is None
                       else {"k": acc_key, **acc})
        if tbl is None or tbl.num_rows == 0:
            first_keys.append(None)
            last_keys.append(None)
            continue
        fk = tuple(tbl[f"fk_{k}"][0].as_py() for k in keys)
        lk = tuple(tbl[f"lk_{k}"][0].as_py() for k in keys)
        first_keys.append(fk)
        last_keys.append(lk)
        last_vals = {c: tbl[f"last_{c}"][0].as_py() for c in spec}
        if acc_key == lk:
            # whole block is one run continuing the chain: fold as
            # (earlier, later) — acc accumulated the earlier blocks
            for c, (_src, o) in spec.items():
                acc[c] = combine[o](acc[c], last_vals[c])
        else:
            acc_key = lk
            acc = last_vals
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
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in keys):
            return out_schema.empty_table()
        starts, ends = _segments(t)
        nseg = len(starts)
        idx = pa.array(starts, pa.int64())
        data = {k: t[k].take(idx) for k in keys}
        reduced = {}
        for c, (src, o) in spec.items():
            reduced[c] = _reduce_run(t, src, o, starts, ends)
        if carry is not None and carry["k"] == _key_tuple(t, 0):
            # combine as (earlier, later): the carry is the agg of all
            # EARLIER blocks of this block's first run
            for c, (_src, o) in spec.items():
                reduced[c][0] = combine[o](carry[c], reduced[c][0])
        stop = nseg - 1 if (drop and nseg) else nseg
        if stop <= 0:
            return out_schema.empty_table()
        for k in keys:
            data[k] = data[k].slice(0, stop)
        for c in spec:
            data[c] = pa.array(reduced[c][:stop],
                               out_schema.field(c).type)
        return pa.table(data, schema=out_schema)

    filled = [task.remote(
        functools.partial(fill, carry=carries[i], drop=drop_last[i]), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)
