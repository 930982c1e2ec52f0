"""Join-free self-pair emission within key groups.

``sorted_self_pairs`` replaces the ``exploded JOIN exploded ON key``
self-join (pyarrow-acero via ``Dataset.join``, whose per-join
aggregator-actor spin-up dominates at every scale measured — see
stages/attach.py) with ONE range-partitioning sort by ``(key, item)``
and a vectorized per-block run walk: every run of equal ``key`` emits
its ordered ``item_a < item_b`` pairs.

Block-boundary runs use the ownership convention shared with
stages/agg: the block where a run STARTS owns it; the driver collects
each block's boundary runs from tiny probes and ships the continuation
rows (bounded by ``cap`` per run — callers MUST bound group sizes, the
shingle DF filter here) to the owner, and continuation blocks skip
their leading run.  Σ|group|² work is inherent to the operator's
output; memory is chunked so no task materializes more than ~4M
candidate index rows at once.

Reference analog: the bucket multimap pair expansion of the LSH index
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:315-323 build,
:462-476 query-side candidate union), lifted from per-query to
corpus-wide emission.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

_CHUNK = 4_000_000


def _emit_run_pairs(tbl: pa.Table, item: str, carry: list[str],
                    starts: np.ndarray, ends: np.ndarray,
                    out_schema: pa.Schema,
                    max_group: int | None,
                    chunk_cells: int = _CHUNK) -> list[pa.Table]:
    """All ordered within-run pairs for the given run boundaries,
    chunked so index scratch stays ~bounded.  Runs longer than
    ``max_group`` emit nothing (the stop-shingle semantics)."""
    m = (ends - starts).astype(np.int64)
    use = m >= 2
    if max_group is not None:
        use &= m <= max_group
    if not use.any():
        return []
    starts = starts[use]
    m = m[use]
    sq = m * m

    out: list[pa.Table] = []

    def emit(a_idx: np.ndarray, b_idx: np.ndarray) -> None:
        if not len(a_idx):
            return
        pa_a = pa.array(a_idx, pa.int64())
        pa_b = pa.array(b_idx, pa.int64())
        data = {
            f"{item}_a": tbl[item].take(pa_a),
            f"{item}_b": tbl[item].take(pa_b),
        }
        for c in carry:
            data[f"{c}_a"] = tbl[c].take(pa_a)
            data[f"{c}_b"] = tbl[c].take(pa_b)
        out.append(pa.table(data, schema=out_schema))

    # runs whose own m^2 exceeds the chunk bound are sliced WITHIN the
    # run (a-row stripes of <= _CHUNK cells) — without this, one hot
    # key in the uncapped exact mode would allocate O(m^2) scratch in
    # a single task
    big = sq > chunk_cells
    for s0, mm in zip(starts[big], m[big]):
        step = max(1, chunk_cells // int(mm))
        for a0 in range(0, int(mm) - 1, step):
            a1 = min(a0 + step, int(mm) - 1)
            ai = np.repeat(np.arange(a0, a1), int(mm))
            bi = np.tile(np.arange(int(mm)), a1 - a0)
            keep = ai < bi
            emit((s0 + ai)[keep], (s0 + bi)[keep])

    starts = starts[~big]
    m = m[~big]
    sq = sq[~big]
    i = 0
    while i < len(m):
        j = i
        tot = 0
        while j < len(m) and (tot + sq[j] <= chunk_cells or j == i):
            tot += sq[j]
            j += 1
        mm = m[i:j]
        ss = starts[i:j]
        sqs = sq[i:j]
        run_id = np.repeat(np.arange(len(mm)), sqs)
        base = np.concatenate([[0], np.cumsum(sqs)[:-1]])
        within = np.arange(int(sqs.sum())) - base[run_id]
        ai = within // mm[run_id]
        bi = within % mm[run_id]
        keep = ai < bi
        emit((ss[run_id] + ai)[keep], (ss[run_id] + bi)[keep])
        i = j
    return out


def sorted_self_pairs(ds, *, key: str, item: str,
                      carry: list[str] | None = None,
                      cap: int = 100_000,
                      max_group: int | None = None,
                      num_blocks: int | None = None,
                      chunk_cells: int = _CHUNK,
                      schema: pa.Schema | None = None):
    """Emit every ordered pair of ``item`` values sharing a ``key``
    (rows must be unique per ``(key, item)``), with per-item ``carry``
    columns attached as ``<c>_a`` / ``<c>_b``.

    ``max_group``: groups larger than this emit NO pairs — the
    stop-shingle / hot-key guard, applied to the COMPLETE run length
    (boundary stitching included), so it matches a DF filter computed
    over the whole input exactly.  Without it, RuntimeError fires if a
    boundary run exceeds ``cap`` rows — the driver stitches boundary
    runs, so unbounded group sizes must be bounded one way or the
    other.
    """
    import ray
    import ray.data as rd

    from smqtk_indexing_ray.stages._util import (
        _get_probe_task,
        coalesced_sort,
    )

    carry = carry or []

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    cols = [key, item] + carry
    out_schema = pa.schema(
        [pa.field(f"{item}_a", sch.field(item).type),
         pa.field(f"{item}_b", sch.field(item).type)]
        + [f for c in carry
           for f in (pa.field(f"{c}_a", sch.field(c).type),
                     pa.field(f"{c}_b", sch.field(c).type))])

    srt = coalesced_sort(ds, [key, item], num_blocks=num_blocks)
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()

    def _runs(t: pa.Table):
        k = t[key].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0],
                                 np.flatnonzero(k[1:] != k[:-1]) + 1])
        ends = np.concatenate([starts[1:], [t.num_rows]])
        return k, starts, ends

    def probe(t: pa.Table) -> pa.Table:
        """One row; boundary-run payloads nested as serialized tables
        would be awkward — instead return (fk, lk, n_runs, first_len,
        last_len) and let the driver fetch boundary rows via take
        probes only where a straddle exists."""
        psch = pa.schema([("fk", sch.field(key).type),
                          ("lk", sch.field(key).type),
                          ("n_runs", pa.int64()),
                          ("first_len", pa.int64()),
                          ("last_len", pa.int64()),
                          ("n_rows", pa.int64())])
        if t.num_rows == 0 or key not in t.column_names:
            return psch.empty_table()
        _, starts, ends = _runs(t)
        return pa.table({
            "fk": t[key].slice(0, 1),
            "lk": t[key].slice(t.num_rows - 1, 1),
            "n_runs": pa.array([len(starts)], pa.int64()),
            "first_len": pa.array([int(ends[0])], pa.int64()),
            "last_len": pa.array([int(ends[-1] - starts[-1])],
                                 pa.int64()),
            "n_rows": pa.array([t.num_rows], pa.int64()),
        }, schema=psch)

    per_block = ray.get([task.remote(probe, r) for r in refs])
    meta = []
    for tbl in per_block:
        if tbl is None or tbl.num_rows == 0:
            meta.append(None)
        else:
            meta.append({
                "fk": tbl["fk"][0].as_py(),
                "lk": tbl["lk"][0].as_py(),
                "n_runs": int(tbl["n_runs"][0].as_py()),
                "first_len": int(tbl["first_len"][0].as_py()),
                "last_len": int(tbl["last_len"][0].as_py()),
            })

    n_b = len(refs)
    # skip_first[i]: block i's leading run continues a run owned earlier
    skip_first = [False] * n_b
    prev_lk = None
    for i in range(n_b):
        if meta[i] is None:
            continue
        skip_first[i] = prev_lk is not None and meta[i]["fk"] == prev_lk
        prev_lk = meta[i]["lk"]

    # extra_tail[i]: continuation rows (from following blocks) of the
    # run that ENDS block i and is OWNED by block i
    def head_slice(t: pa.Table, n: int) -> pa.Table:
        return t.select(cols).slice(0, n)

    extra_refs: dict[int, list] = {}
    skip_last = [False] * n_b
    for i in range(n_b):
        if meta[i] is None or skip_first[i] and meta[i]["n_runs"] == 1:
            continue  # not an owner of its last run
        k_last = meta[i]["lk"]
        chunks = []
        total = meta[i]["last_len"]
        oversize = False
        for j in range(i + 1, n_b):
            if meta[j] is None:
                continue
            if meta[j]["fk"] != k_last:
                break
            flen = meta[j]["first_len"]
            total += flen
            if max_group is not None and total > max_group:
                # the complete run exceeds the group cap: the owner
                # emits nothing for it (stop-shingle semantics) and no
                # boundary rows need to move at all
                oversize = True
                break
            if total > cap:
                raise RuntimeError(
                    f"sorted_self_pairs: boundary run for key {k_last!r}"
                    f" exceeds cap={cap}; bound group sizes upstream")
            chunks.append(task.remote(
                functools.partial(head_slice, n=flen), refs[j]))
            if not (meta[j]["n_runs"] == 1):
                break
        if oversize:
            skip_last[i] = True
        elif chunks:
            extra_refs[i] = chunks
    extras = {i: pa.concat_tables(ray.get(c))
              for i, c in extra_refs.items()}

    def fill(t: pa.Table, skip: bool, drop_last: bool,
             extra: pa.Table | None) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return out_schema.empty_table()
        body = t.select(cols)
        if extra is not None and extra.num_rows:
            body = pa.concat_tables([body, extra]).combine_chunks()
        _, starts, ends = _runs(body)
        if skip:
            starts = starts[1:]
            ends = ends[1:]
        if drop_last and len(starts):
            starts = starts[:-1]
            ends = ends[:-1]
        if len(starts) == 0:
            return out_schema.empty_table()
        parts = _emit_run_pairs(body, item, carry, starts, ends,
                                out_schema, max_group, chunk_cells)
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    filled = [task.remote(
        functools.partial(fill, skip=skip_first[i],
                          drop_last=skip_last[i],
                          extra=extras.get(i)), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)
