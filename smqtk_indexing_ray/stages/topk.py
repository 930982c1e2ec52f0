"""Per-group top-k — keep each group's k best rows by a sort key.

One range-partitioning sort by ``(group, -order, tiebreak)`` and a
vectorized per-block rank, with the standard boundary fixup: only the
group straddling each block boundary needs its prefix row count from
earlier blocks, and those counts come from the tiny per-block probes in
sorted block order (same machinery as stages/attach and stages/asof).

Semantics match ``row_number() OVER (PARTITION BY group ORDER BY order
DESC, tiebreak ASC) <= k`` exactly — the tiebreak column makes the rank
deterministic, so the SQL oracle is bit-exact.

Reference analog: the per-query ``sorted(...)[:n]`` re-rank of the LSH
index (/root/reference/smqtk_indexing/impls/nn_index/lsh.py:513-518),
lifted from one query's candidates to every group of a table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _group_sizes(ranked, group: str, gtype) -> dict:
    """Fold per-block partial ``max(rank)`` probes into a group→size
    map (output O(#groups x #blocks), reduced on the driver to one
    histogram-sized dict).  ``ranked`` must carry the 1-based ``rank``
    column from :func:`top_k_per_group` (k=None)."""
    from smqtk_indexing_ray.stages._util import probe_blocks

    def pmax(t: pa.Table) -> pa.Table:
        psch = pa.schema([("k", gtype), ("mx", pa.int64())])
        if t.num_rows == 0 or group not in t.column_names:
            return psch.empty_table()
        g = t[group].to_numpy(zero_copy_only=False)
        r = t["rank"].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0],
                                 np.flatnonzero(g[1:] != g[:-1]) + 1])
        ends = np.concatenate([starts[1:], [t.num_rows]]) - 1
        return pa.table({
            "k": t[group].take(pa.array(starts, pa.int64())),
            "mx": pa.array(r[ends].astype(np.int64)),
        })

    part = probe_blocks(ranked, pmax)
    sizes: dict = {}
    if part.num_rows:
        for kk, mx in zip(part["k"].to_pylist(), part["mx"].to_pylist()):
            if int(mx) > sizes.get(kk, 0):
                sizes[kk] = int(mx)
    return sizes


def percent_rank_per_group(ds, *, group: str, order: str, tiebreak: str,
                           descending: bool = False,
                           schema: pa.Schema | None = None):
    """``percent_rank()`` and ``cume_dist()`` OVER (PARTITION BY group
    ORDER BY order, tiebreak) — the relative-position windows used for
    per-language quality-percentile filtering.

    Rides :func:`top_k_per_group` (k=None) for the running rank and the
    same broadcast group-size map as :func:`ntile_per_group`.  The
    ``tiebreak`` column must make ``(order, tiebreak)`` unique within
    each group so ``rank == row_number`` — then both outputs are exact
    int64 divisions and the SQL oracle is bit-exact:
    ``pct_rank = (rank-1)/(n-1)`` (0.0 for singleton groups, the ANSI
    rule) and ``cume_dist = rank/n``.

    Output adds int64 ``rank`` and double ``pct_rank`` / ``cume_dist``.
    """
    import ray

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    gtype = sch.field(group).type
    ranked = top_k_per_group(ds, group=group, order=order,
                             tiebreak=tiebreak, k=None,
                             descending=descending,
                             schema=sch).materialize()
    sizes_ref = ray.put(_group_sizes(ranked, group, gtype))

    out_schema = pa.schema(list(sch) + [
        pa.field("rank", pa.int64()), pa.field("pct_rank", pa.float64()),
        pa.field("cume_dist", pa.float64())])

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or group not in t.column_names:
            return out_schema.empty_table()
        smap = ray.get(sizes_ref)
        g = t[group].to_numpy(zero_copy_only=False)
        rank = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0],
                                 np.flatnonzero(g[1:] != g[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [t.num_rows]]))
        ng = np.repeat(
            np.array([smap[g[s] if not hasattr(g[s], "item")
                           else g[s].item()] for s in starts],
                     dtype=np.int64), lens)
        pct = np.where(ng > 1, (rank - 1) / np.maximum(ng - 1, 1), 0.0)
        cume = rank / ng
        t = t.append_column("pct_rank", pa.array(pct, pa.float64()))
        return t.append_column("cume_dist", pa.array(cume, pa.float64()))

    return ranked.map_batches(score, batch_format="pyarrow")


def ntile_per_group(ds, *, group: str, order: str, tiebreak: str,
                    nb: int, descending: bool = True,
                    schema: pa.Schema | None = None):
    """``NTILE(nb) OVER (PARTITION BY group ORDER BY order, tiebreak)``
    — CCNet-style per-group quantile bucketing (e.g. head/middle/tail
    quality tiers per language).

    Rides :func:`top_k_per_group` (k=None) for the per-group running
    rank, then needs only each group's TOTAL size: a per-block partial
    ``max(rank)`` probe (output O(#groups x #blocks), reduced on the
    driver to one histogram-sized map) broadcast via ``ray.put`` into a
    vectorized bucket assignment.  Assumes the group-size map fits in a
    broadcast object — it is the size of a group histogram, never the
    corpus.  Bucket rule matches DuckDB/ANSI NTILE bit-exactly: the
    first ``n_g % nb`` buckets get ``n_g // nb + 1`` rows, the rest get
    ``n_g // nb``.

    Output adds int64 ``rank`` and ``bucket`` (both 1-based).
    """
    import ray

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    gtype = sch.field(group).type
    ranked = top_k_per_group(ds, group=group, order=order,
                             tiebreak=tiebreak, k=None,
                             descending=descending,
                             schema=sch).materialize()

    sizes_ref = ray.put(_group_sizes(ranked, group, gtype))

    out_schema = pa.schema(list(sch) + [pa.field("rank", pa.int64()),
                                        pa.field("bucket", pa.int64())])

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or group not in t.column_names:
            return out_schema.empty_table()
        smap = ray.get(sizes_ref)
        g = t[group].to_numpy(zero_copy_only=False)
        rank = t["rank"].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0],
                                 np.flatnonzero(g[1:] != g[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [t.num_rows]]))
        ng = np.repeat(
            np.array([smap[g[s] if not hasattr(g[s], "item")
                           else g[s].item()] for s in starts],
                     dtype=np.int64), lens)
        qq = ng // nb
        rr = ng % nb
        cut = rr * (qq + 1)
        big = np.maximum(qq + 1, 1)
        small = np.maximum(qq, 1)
        bucket = np.where(rank <= cut,
                          (rank - 1) // big + 1,
                          rr + (rank - cut - 1) // small + 1)
        return t.append_column("bucket",
                               pa.array(bucket.astype(np.int64)))

    return ranked.map_batches(bucketize, batch_format="pyarrow")


def top_k_per_group(ds, *, group: str, order: str, tiebreak: str,
                    k: int | None, descending: bool = True,
                    schema: pa.Schema | None = None):
    """Keep the ``k`` best rows per ``group`` ordered by ``order``
    (descending by default), ties broken by ascending ``tiebreak``.
    Output adds an int64 ``rank`` column (1-based).  ``group``/``order``/
    ``tiebreak`` must be orderable scalar columns.  ``k=None`` keeps
    every row — a distributed running ``row_number()`` per group."""
    import ray
    import ray.data as rd

    def _arrow_schema(d) -> pa.Schema:
        s = d.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    sch = schema or _arrow_schema(ds)
    srt = ds.sort([group, order, tiebreak],
                  descending=[False, descending, False]).materialize()

    # per-block probe: (last group key, rows of last key) — group keys
    # keep their native type (string groups work)
    gtype = sch.field(group).type

    def probe(t: pa.Table) -> pa.Table:
        psch = pa.schema([("k", gtype), ("cnt", pa.int64())])
        if t.num_rows == 0 or group not in t.column_names:
            return psch.empty_table()
        g = t[group].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.flatnonzero(g[1:] != g[:-1]) + 1])
        last_cnt = int(t.num_rows - starts[-1])
        return pa.table({"k": t[group].take(
            pa.array([int(starts[-1])], pa.int64())),
            "cnt": pa.array([last_cnt], pa.int64())})

    from smqtk_indexing_ray.stages._util import _get_probe_task
    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks]
    out_schema = pa.schema(list(sch) + [pa.field("rank", pa.int64())])
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()
    per_block = ray.get([task.remote(probe, r) for r in refs])
    # carry[i] = rows of block i's FIRST group key in earlier blocks
    carries: list[dict] = []
    acc_key = None
    acc_cnt = 0
    for tbl in per_block:
        carries.append({} if acc_key is None else {acc_key: acc_cnt})
        if tbl is None or tbl.num_rows == 0:
            continue
        kk = tbl["k"][0].as_py()
        cnt = int(tbl["cnt"][0].as_py())
        if acc_key == kk:
            acc_cnt += cnt
        else:
            acc_key, acc_cnt = kk, cnt

    def rank_block(t: pa.Table, carry: dict) -> pa.Table:
        if t.num_rows == 0 or group not in t.column_names:
            return out_schema.empty_table()
        g = t[group].to_numpy(zero_copy_only=False)
        n = t.num_rows
        starts = np.concatenate([[0], np.flatnonzero(g[1:] != g[:-1]) + 1])
        seg_id = np.repeat(np.arange(len(starts)),
                           np.diff(np.concatenate([starts, [n]])))
        rank = (np.arange(n) - starts[seg_id]).astype(np.int64) + 1
        off = carry.get(g[0] if not hasattr(g[0], "item")
                        else g[0].item(), 0)
        rank[seg_id == 0] += off
        if k is None:
            return t.append_column("rank", pa.array(rank))
        keep = rank <= k
        if not keep.any():
            return out_schema.empty_table()
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        out = t.take(idx)
        return out.append_column("rank", pa.array(rank[keep]))

    filled = [task.remote(
        __import__("functools").partial(rank_block, carry=carries[i]), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)
