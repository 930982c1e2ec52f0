"""As-of join — attach the most recent right-side row at or before each
left row's timestamp, per key.

Ray Data has no asof/range join; this expresses one with the repo's
standard machinery (same shape as ``stages/attach.sort_attach`` and the
connected-components stars): tag right rows 0 and left rows 1, ONE
range-partitioning sort by ``(key, ts, tag)`` (right rows sort before
left rows at equal timestamps, giving inclusive ``right.ts <= left.ts``
semantics), then per-block vectorized forward-fill.  Because a sorted
dataset's blocks are range-ordered, a single driver pass over the tiny
per-block "last right row" probes yields, for every block, the exact
carry-in state (latest right row per key over all EARLIER blocks), and
each block is finished by one raw Ray task with its own carry dict — no
per-row Python, no shuffle beyond the one sort.

Reference analog: the uid->idx KV lookups of the FAISS wrapper
(/root/reference/smqtk_indexing/impls/nn_index/faiss.py:543-555) are
plain equi-lookups; the temporal "latest state at or before t" form is
the beyond-reference extension a training-data pipeline needs (e.g.
attaching the latest per-user snapshot to each event).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(left, right, *, key: str, ts: str,
              payload_cols: list[str],
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """For every ``left`` row, attach ``payload_cols`` from the ``right``
    row with the same ``key`` and the greatest ``right.ts <= left.ts``
    (inclusive; ties prefer the right row); payload columns are null
    when no such row exists.

    ``key`` and ``ts`` must be int64-castable (timestamps are carried as
    epoch micros internally and restored on output).  Pass the schemas
    for lazy inputs (``Dataset.schema()`` may execute part of the plan).
    """
    import ray
    import ray.data as rd

    def _arrow_schema(ds) -> pa.Schema:
        s = ds.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    lsch = left_schema or _arrow_schema(left)
    rsch = right_schema or _arrow_schema(right)
    ts_type = lsch.field(ts).type
    left_cols = [n for n in lsch.names if n not in (key, ts)]
    schema = pa.schema(
        [("_k", pa.int64()), ("_ts", pa.int64()), ("_tag", pa.int8())]
        + [(n, lsch.field(n).type) for n in left_cols]
        + [(n, rsch.field(n).type) for n in payload_cols])

    def tag_right(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return schema.empty_table()
        cols = {"_k": pc.cast(t[key], pa.int64()),
                "_ts": pc.cast(t[ts], pa.int64()),
                "_tag": pa.array(np.zeros(t.num_rows, np.int8))}
        for n in left_cols:
            cols[n] = pa.nulls(t.num_rows, schema.field(n).type)
        for n in payload_cols:
            cols[n] = t[n]
        return pa.table({n: cols[n] for n in schema.names})

    def tag_left(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return schema.empty_table()
        cols = {"_k": pc.cast(t[key], pa.int64()),
                "_ts": pc.cast(t[ts], pa.int64()),
                "_tag": pa.array(np.ones(t.num_rows, np.int8))}
        for n in left_cols:
            cols[n] = t[n]
        for n in payload_cols:
            cols[n] = pa.nulls(t.num_rows, schema.field(n).type)
        return pa.table({n: cols[n] for n in schema.names})

    tagged = right.map_batches(tag_right, batch_format="pyarrow").union(
        left.map_batches(tag_left, batch_format="pyarrow"))
    from smqtk_indexing_ray.stages._util import coalesced_sort
    srt = coalesced_sort(tagged, ["_k", "_ts", "_tag"])

    # ---- per-block carry state ------------------------------------------
    # probe: each block's LAST right row (key, ts, payload).  A prefix
    # sweep in block order then gives block i the latest right row per key
    # over blocks < i — exact, tiny (one entry per block), driver-side.
    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema([("_k", pa.int64()), ("_ts", pa.int64())]
                         + [(n, schema.field(n).type)
                            for n in payload_cols])
        if t.num_rows == 0 or "_tag" not in t.column_names:
            return psch.empty_table()
        tag = t["_tag"].to_numpy(zero_copy_only=False)
        ridx = np.flatnonzero(tag == 0)
        if len(ridx) == 0:
            return psch.empty_table()
        idx = pa.array([int(ridx[-1])], pa.int64())
        return pa.table({"_k": t["_k"].take(idx),
                         "_ts": t["_ts"].take(idx),
                         **{n: t[n].take(idx) for n in payload_cols}})

    from smqtk_indexing_ray.stages._util import _get_probe_task
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(pa.schema(
            [(key, pa.int64()), (ts, ts_type)]
            + [(n, schema.field(n).type)
               for n in left_cols + payload_cols]).empty_table())
    task = _get_probe_task()
    per_block = ray.get([task.remote(probe, r) for r in refs])
    carries: list[dict[int, tuple]] = []
    acc: dict[int, tuple] = {}
    for tbl in per_block:
        carries.append(dict(acc))
        if tbl is not None and tbl.num_rows:
            kk = int(tbl["_k"][0].as_py())
            acc[kk] = tuple(
                [int(tbl["_ts"][0].as_py())]
                + [tbl[n][0] for n in payload_cols])

    out_names = [key, ts] + left_cols + payload_cols
    out_schema = pa.schema(
        [(key, pa.int64()), (ts, ts_type)]
        + [(n, schema.field(n).type) for n in left_cols + payload_cols])

    def fill_block(t: pa.Table, carry: dict[int, tuple]) -> pa.Table:
        if t.num_rows == 0 or "_tag" not in t.column_names:
            return out_schema.empty_table()
        k = t["_k"].to_numpy(zero_copy_only=False)
        lts = t["_ts"].to_numpy(zero_copy_only=False)
        tag = t["_tag"].to_numpy(zero_copy_only=False)
        n = t.num_rows
        is_right = tag == 0
        # forward index of the latest right row at or before each row;
        # invalid once it points into a different key's segment
        fwd = np.maximum.accumulate(np.where(is_right, np.arange(n), -1))
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
        seg_start = starts[np.repeat(
            np.arange(len(starts)),
            np.diff(np.concatenate([starts, [n]])))]
        valid = fwd >= seg_start
        lsel = np.flatnonzero(~is_right)
        if len(lsel) == 0:
            return out_schema.empty_table()
        take_idx = np.where(valid, fwd, -1)[lsel]
        cols = {key: t["_k"].take(pa.array(lsel)),
                ts: pc.cast(t["_ts"].take(pa.array(lsel)), ts_type)}
        for nm in left_cols:
            cols[nm] = t[nm].take(pa.array(lsel))
        miss = np.flatnonzero(take_idx < 0)
        # boundary-carry patch stays Arrow-native: append the (few) carry
        # values to the source column and redirect their take indices
        # past the block, instead of to_pylist()-ing the column
        fix_rows = []
        for i in miss:
            ent = carry.get(int(k[lsel[i]]))
            if ent is not None and ent[0] <= int(lts[lsel[i]]):
                fix_rows.append((int(i), ent))
        if fix_rows:
            take_idx = take_idx.copy()
            for j, (i, _) in enumerate(fix_rows):
                take_idx[i] = n + j
        take = pa.array(take_idx, mask=take_idx < 0)
        for ci, nm in enumerate(payload_cols):
            src = t[nm]
            if fix_rows:
                extra = pa.array(
                    [e[ci + 1].as_py() if hasattr(e[ci + 1], "as_py")
                     else e[ci + 1] for _, e in fix_rows],
                    type=schema.field(nm).type)
                chunks = (list(src.chunks)
                          if isinstance(src, pa.ChunkedArray) else [src])
                src = pa.chunked_array(chunks + [extra])
            cols[nm] = src.take(take)
        return pa.table({nm: cols[nm] for nm in out_names})

    # one raw task per block with its exact carry dict; blocks stay in the
    # object store (typed empties are harmless downstream)
    filled = [task.remote(
        __import__("functools").partial(fill_block, carry=carries[i]), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)


def interval_join(points, intervals, *, key: str, ts: str, lo: str,
                  hi: str, payload_cols: list[str],
                  points_schema: pa.Schema | None = None,
                  intervals_schema: pa.Schema | None = None):
    """Attach interval payloads to every point with ``lo <= point.ts <=
    hi`` and matching ``key``; payloads are null for uncovered points.

    PARTITIONING ASSUMPTION (documented per SURVEY.md §2's custom-
    operator rule): intervals must be NON-OVERLAPPING per key (e.g.
    session windows).  Under that assumption the range join reduces to
    an as-of join on the interval start — the candidate interval is the
    one with the greatest ``lo <= ts`` — followed by a vectorized upper-
    bound check; overlapping intervals would need a different plan (an
    interval tree or an explode-by-bucket equi-join).
    """
    def _arrow_schema(ds) -> pa.Schema:
        s = ds.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    psch = points_schema or _arrow_schema(points)
    isch = intervals_schema or _arrow_schema(intervals)

    def as_right(t: pa.Table) -> pa.Table:
        out_sch = pa.schema(
            [(key, pa.int64()), ("_lo", pa.int64()), ("_hi", pa.int64())]
            + [(n, isch.field(n).type) for n in payload_cols])
        if t.num_rows == 0 or lo not in t.column_names:
            return out_sch.empty_table()
        return pa.table({
            key: pc.cast(t[key], pa.int64()),
            "_lo": pc.cast(t[lo], pa.int64()),
            "_hi": pc.cast(t[hi], pa.int64()),
            **{n: t[n] for n in payload_cols},
        })

    right = intervals.map_batches(as_right, batch_format="pyarrow")
    right_schema = pa.schema(
        [(key, pa.int64()), ("_lo", pa.int64()), ("_hi", pa.int64())]
        + [(n, isch.field(n).type) for n in payload_cols])

    def as_left(t: pa.Table) -> pa.Table:
        out_sch = pa.schema(
            [(key, pa.int64()), ("_lo", pa.int64())]
            + [(n, psch.field(n).type) for n in psch.names
               if n not in (key,)])
        if t.num_rows == 0 or key not in t.column_names:
            return out_sch.empty_table()
        cols = {key: pc.cast(t[key], pa.int64()),
                "_lo": pc.cast(t[ts], pa.int64())}
        for n in psch.names:
            if n != key:
                cols[n] = t[n]
        return pa.table(cols)

    left = points.map_batches(as_left, batch_format="pyarrow")
    left_schema = pa.schema(
        [(key, pa.int64()), ("_lo", pa.int64())]
        + [(n, psch.field(n).type) for n in psch.names if n != key])

    joined = asof_join(left, right, key=key, ts="_lo",
                       payload_cols=["_hi"] + payload_cols,
                       left_schema=left_schema, right_schema=right_schema)

    def bound(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_hi" not in t.column_names:
            return t
        inside = pc.and_kleene(
            pc.is_valid(t["_hi"]),
            pc.less_equal(t["_lo"], pc.cast(t["_hi"], pa.int64())))
        inside = pc.fill_null(inside, False)
        for n in payload_cols:
            idx = t.schema.get_field_index(n)
            t = t.set_column(
                idx, n, pc.if_else(inside, t[n],
                                   pa.nulls(t.num_rows,
                                            t.schema.field(n).type)))
        return t.drop_columns(["_hi"])

    return joined.map_batches(bound, batch_format="pyarrow")
