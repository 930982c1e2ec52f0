"""Sort-merge payload attachment — the pipeline's join primitive.

``sort_attach(rows, payload, key=...)`` attaches payload columns to every
row whose key matches, using ONE range-partitioning sort plus a segmented
fill inside ``map_batches`` — no hash-shuffle join.

Why not ``Dataset.join``: Ray's hash join spawns ``num_partitions``
aggregator ACTORS per join per dataset execution; measured on this
pipeline the actor spin-up dominates (np=16: 36 s, np=64: 145 s for the
same 400k-edge x 1M-sig verify), while a task-based sort of the same data
runs in ~6 s.  The reference's analog of this operation is the hash-int ->
uuid-set lookup (/root/reference/smqtk_indexing/impls/nn_index/lsh.py:
489-497) and the uid<->idx maps (impls/nn_index/faiss.py:543-555).

Mechanics (same sorted-segment + driver-fixup pattern as
``stages/buckets.star_edges`` and the connected-components stars):

1. payload rows are tagged ``_tag=0``, data rows ``_tag=1``; the union is
   sorted by ``(_k, _tag)`` so each key-segment leads with its payload row.
2. a probe pass collects the (at most 2 per batch) boundary segments so
   rows separated from their payload row by a batch boundary get their
   values from a tiny driver-side dict.
3. the fill pass broadcasts each segment head's payload to the segment's
   data rows with Arrow ``take`` — fully vectorized, any column type.

Assumes payload keys are UNIQUE (doc_id-keyed tables).  ``how="left"``
leaves missing payload columns null; ``how="inner"`` drops such rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: Size gate for :func:`broadcast_attach` — the largest payload (rows) a
#: caller should broadcast instead of sort-attaching.  32M rows of
#: (int64 key, int64 value) is ~0.5 GB pinned once in the object store and
#: read zero-copy by every map task; beyond that, the payload belongs in a
#: shuffle (at 10^12 docs a label table is TB-scale and always takes the
#: sort path).
BROADCAST_ATTACH_MAX_ROWS = 32_000_000

#: Per-worker-process cache of resolved broadcast payloads.  The payload
#: object is immutable in plasma; holding the deserialized (zero-copy
#: numpy view) tuple for the worker's lifetime pins it and skips the
#: raylet round-trip on every subsequent batch.  Keyed by ObjectRef hex;
#: bounded — a worker sees a handful of distinct broadcast payloads.
_BROADCAST_CACHE: dict = {}


def _broadcast_cache_get(handle):
    import ray

    key = handle.hex()
    hit = _BROADCAST_CACHE.get(key)
    if hit is None:
        if len(_BROADCAST_CACHE) > 16:
            _BROADCAST_CACHE.clear()
        hit = _BROADCAST_CACHE[key] = ray.get(handle)
    return hit


def broadcast_attach(rows, payload_mat, *, key: str, payload_col: str,
                     fill_missing_with_key: bool = False):
    """Attach one int64 ``payload_col`` from a SMALL materialized payload
    table onto ``rows`` by ``key`` (left join) — ``ray.put`` the sorted
    (key, value) arrays once, ``np.searchsorted`` lookup inside every map
    task.

    This is the broadcast-join twin of :func:`sort_attach` for payloads
    bounded by worker heap (cluster labels, representatives): no union, no
    sort, no shuffle — the big side streams through one map.  Callers gate
    on ``BROADCAST_ATTACH_MAX_ROWS``; the measured crossover is enormous
    (the 8M-row label attach dropped 67 s -> ~10 s at 8 CPUs).

    Reference analog: the driver-held ``hash2uuids`` dict of
    /root/reference/smqtk_indexing/impls/nn_index/lsh.py:315-323, made
    safe by the explicit size gate + plasma sharing instead of per-task
    copies.

    ``fill_missing_with_key`` fills lookup misses with the key value
    itself instead of null (the flagship pipeline's "unclustered doc is
    its own cluster" semantics).  Besides saving the downstream coalesce,
    this keeps the output column validity-bitmap-free, which sidesteps a
    pyarrow 16.1 kernel bug where ``pc.coalesce`` misreads the validity
    offset of re-sliced masked columns (see ``_util.safe_coalesce``).
    """
    import ray

    parts = []
    for bundle in payload_mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                parts.append(ref)
    tables = [t for t in ray.get(parts)
              if t.num_rows and key in t.column_names]
    if tables:
        tbl = pa.concat_tables(tables)
        k = tbl[key].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        v = tbl[payload_col].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        order = np.argsort(k, kind="stable")
        k, v = np.ascontiguousarray(k[order]), np.ascontiguousarray(v[order])
    else:
        k = np.empty(0, np.int64)
        v = np.empty(0, np.int64)
    handle = ray.put((k, v))

    def lookup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return t
        # zero-copy plasma read, cached per worker PROCESS: a per-batch
        # ray.get costs ~2 ms under object-store load, and fused
        # read->lookup stages can see tens of thousands of batches
        # (measured: 80k x 2.2 ms = the whole output stage's budget)
        kk, vv = _broadcast_cache_get(handle)
        d = t[key].to_numpy(zero_copy_only=False).astype(np.int64,
                                                         copy=False)
        if len(kk) == 0:
            col = (pa.array(d, pa.int64()) if fill_missing_with_key
                   else pa.nulls(t.num_rows, pa.int64()))
        else:
            pos = np.clip(np.searchsorted(kk, d), 0, len(kk) - 1)
            hit = kk[pos] == d
            if fill_missing_with_key:
                col = pa.array(np.where(hit, vv[pos], d), pa.int64())
            else:
                col = pa.array(vv[pos], pa.int64(), mask=~hit)
        return t.append_column(payload_col, col)

    # batch_size=None: whole-block batches — the lookup is a vectorized
    # searchsorted, so slicing blocks into default-size batches only adds
    # per-call overhead
    return rows.map_batches(lookup, batch_format="pyarrow", batch_size=None)


def _tagged_schema(rows_schema: pa.Schema, payload_schema: pa.Schema,
                   key: str, payload_key: str) -> pa.Schema:
    fields = [("_k", pa.int64()), ("_tag", pa.int8())]
    for f in rows_schema:
        if f.name != key:
            fields.append((f.name, f.type))
    for f in payload_schema:
        if f.name != payload_key:
            fields.append((f.name, f.type))
    return pa.schema(fields)


def sort_attach(rows, payload, *, key: str, payload_key: str,
                payload_cols: list[str], how: str = "left",
                rows_schema: pa.Schema | None = None,
                payload_schema: pa.Schema | None = None,
                dedup_rows_on: list[str] | None = None,
                num_blocks: int | None = None):
    """Attach ``payload_cols`` (from ``payload``, keyed by unique
    ``payload_key``) onto ``rows`` matching ``rows[key]``.

    Returns a Dataset with all of ``rows``'s columns plus
    ``payload_cols``; the key column keeps its name.

    Pass ``rows_schema``/``payload_schema`` whenever the input is a LAZY
    dataset: ``Dataset.schema()`` may execute part of the plan to resolve
    it, and the union below would then execute it a second time.

    ``dedup_rows_on``: additional row columns appended to the sort key;
    consecutive data rows equal on ``(key, *dedup_rows_on)`` collapse to
    one inside the fill kernel — this fuses a sort-based row dedup into
    the attach's existing sort (at most one duplicate survives per batch
    boundary, same contract as a standalone sorted dedup).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")

    def _arrow_schema(ds) -> pa.Schema:
        s = ds.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    rows_schema = rows_schema or _arrow_schema(rows)
    pay_schema = payload_schema or _arrow_schema(payload)
    row_cols = [n for n in rows_schema.names if n != key]
    schema = _tagged_schema(
        pa.schema([pa.field(n, rows_schema.field(n).type)
                   for n in rows_schema.names]),
        pa.schema([pa.field(n, pay_schema.field(n).type)
                   for n in [payload_key] + payload_cols]),
        key, payload_key)

    def tag_payload(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or payload_key not in t.column_names:
            return schema.empty_table()
        cols = {"_k": pc.cast(t[payload_key], pa.int64()),
                "_tag": pa.array(np.zeros(t.num_rows, np.int8))}
        for n in row_cols:
            cols[n] = pa.nulls(t.num_rows, schema.field(n).type)
        for n in payload_cols:
            cols[n] = t[n]
        return pa.table({n: cols[n] for n in schema.names})

    def tag_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return schema.empty_table()
        cols = {"_k": pc.cast(t[key], pa.int64()),
                "_tag": pa.array(np.ones(t.num_rows, np.int8))}
        for n in row_cols:
            cols[n] = t[n]
        for n in payload_cols:
            cols[n] = pa.nulls(t.num_rows, schema.field(n).type)
        return pa.table({n: cols[n] for n in schema.names})

    tagged = payload.map_batches(tag_payload, batch_format="pyarrow").union(
        rows.map_batches(tag_rows, batch_format="pyarrow"))
    # payload rows (_tag=0) sort before data rows per key regardless of the
    # dedup columns' null values on the payload side (_tag precedes them)
    sort_keys = ["_k", "_tag"] + list(dedup_rows_on or [])
    from smqtk_indexing_ray.stages._util import coalesced_sort
    srt = coalesced_sort(tagged, sort_keys, num_blocks=num_blocks)

    # --- probe: payload values of each batch's first/last segment --------
    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema([("_k", pa.int64())] +
                         [(n, schema.field(n).type) for n in payload_cols])
        if t.num_rows == 0 or "_k" not in t.column_names:
            return psch.empty_table()
        k = t["_k"].to_numpy(zero_copy_only=False)
        tag = t["_tag"].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
        first_last = np.unique([starts[0], starts[-1]])
        keep = [int(s) for s in first_last if tag[s] == 0]
        if not keep:
            return psch.empty_table()
        idx = pa.array(keep, pa.int64())
        return pa.table({"_k": t["_k"].take(idx),
                         **{n: t[n].take(idx) for n in payload_cols}})

    from smqtk_indexing_ray.stages._util import probe_blocks
    probe_tbl = probe_blocks(srt, probe)
    if probe_tbl.num_columns == 0:
        probe_tbl = pa.schema([("_k", pa.int64())]).empty_table()
    fix: dict[int, tuple] = {}
    if probe_tbl.num_rows and "_k" in probe_tbl.column_names:
        ks = probe_tbl["_k"].to_numpy(zero_copy_only=False)
        vals = [probe_tbl[n] for n in payload_cols]
        for i, kk in enumerate(ks):
            fix[int(kk)] = tuple(v[i] for v in vals)

    out_names = [key] + row_cols + payload_cols

    def fill(t: pa.Table) -> pa.Table:
        osch = pa.schema(
            [(key, pa.int64())] +
            [(n, schema.field(n).type) for n in row_cols + payload_cols])
        if t.num_rows == 0 or "_k" not in t.column_names:
            return osch.empty_table()
        k = t["_k"].to_numpy(zero_copy_only=False)
        tag = t["_tag"].to_numpy(zero_copy_only=False)
        n = t.num_rows
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
        ends = np.concatenate([starts[1:], [n]])
        seg_id = np.repeat(np.arange(len(starts)), ends - starts)
        head_is_payload = tag[starts] == 0
        head_per_row = starts[seg_id]
        take_idx = np.where(head_is_payload[seg_id], head_per_row, -1)
        data_mask = tag == 1
        if not data_mask.any():
            return osch.empty_table()
        dsel = np.flatnonzero(data_mask)
        if dedup_rows_on and len(dsel) > 1:
            same = k[dsel][1:] == k[dsel][:-1]
            for nm in dedup_rows_on:
                cv = pc.fill_null(t[nm], 0).to_numpy(
                    zero_copy_only=False)[dsel]
                same &= cv[1:] == cv[:-1]
            dsel = dsel[np.concatenate([[True], ~same])]
        cols = {key: t["_k"].take(pa.array(dsel))}
        for nm in row_cols:
            cols[nm] = t[nm].take(pa.array(dsel))
        miss = take_idx[dsel] < 0
        fix_rows = [i for i, m in enumerate(miss)
                    if m and int(k[dsel[i]]) in fix]
        # boundary-straddle patch stays Arrow-native: append the (few)
        # fixup values to the source column and redirect their take
        # indices past the block, instead of to_pylist()-ing the column
        tk = take_idx[dsel]
        if fix_rows:
            tk = tk.copy()
            fix_vals = [fix[int(k[dsel[i]])] for i in fix_rows]
            for j, i in enumerate(fix_rows):
                tk[i] = n + j
        take = pa.array(tk, mask=tk < 0)
        for ci, nm in enumerate(payload_cols):
            src = t[nm]
            if fix_rows:
                extra = pa.array(
                    [v[ci].as_py() if hasattr(v[ci], "as_py") else v[ci]
                     for v in fix_vals], type=schema.field(nm).type)
                chunks = (list(src.chunks)
                          if isinstance(src, pa.ChunkedArray) else [src])
                src = pa.chunked_array(chunks + [extra])
            cols[nm] = src.take(take)
        out = pa.table({nm: cols[nm] for nm in out_names})
        if how == "inner":
            out = out.filter(pc.is_valid(out[payload_cols[0]]))
        return out

    return srt.map_batches(fill, batch_format="pyarrow")
