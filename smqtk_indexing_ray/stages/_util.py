"""Shared stage helpers."""

from __future__ import annotations

import pyarrow as pa


def auto_blocks(cap: int = 64) -> int:
    """Target block count for pre-sort repartitions: ~total CPUs.

    Sorts cost O(input_blocks x output_partitions) tasks, and Ray picks
    output partitions ~ input blocks — a 256-block input pays ~65k merge
    tasks where a 32-block input pays ~1k (measured: the 44M-row edge
    dedup sort dropped 11.4 s -> 1.7 s after repartition(32))."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) if (
        ray.is_initialized()) else 8
    return max(8, min(cap, cpus))


def coalesced_sort(ds, keys, *, descending=None, num_blocks: int | None = None):
    """``repartition(~CPUs).sort(keys).materialize()`` — the shared
    pre-sort lever: sorts cost O(input_blocks x output_partitions)
    merge tasks and Ray picks partitions ~ input blocks, so a fan-out
    stage (or a many-row-group parquet read) must be coalesced first
    (measured: a 44M-row sort dropped 11.4 s -> 1.7 s at 32 blocks)."""
    rp = ds.repartition(num_blocks or auto_blocks())
    if descending is None:
        return rp.sort(keys).materialize()
    return rp.sort(keys, descending=descending).materialize()


def safe_coalesce(a, b):
    """``pc.coalesce(a, b)`` hardened against a pyarrow 16.1 kernel bug.

    When the first argument is a non-zero-offset slice carrying a validity
    bitmap and the second has a DIFFERENT chunk layout, ``pc.coalesce``
    misreads the validity offset and returns garbage for every null slot
    (reproduced: every sliced window containing nulls is wrong; offset-0
    inputs are fine).  Ray Data re-slices blocks between fused
    ``map_batches`` stages, so any masked column built in one stage and
    coalesced in the next can hit this.  ``combine_chunks()`` copies to
    offset-0 single-chunk arrays, which the kernel handles correctly —
    16 B/row for the int64 call sites, negligible.
    """
    import pyarrow.compute as pc

    def _flat(x):
        if isinstance(x, pa.ChunkedArray):
            return x.combine_chunks()
        if isinstance(x, pa.Array) and x.offset:
            return pa.concat_arrays([x])
        return x

    return pc.coalesce(_flat(a), _flat(b))


def stamp_schema(ds, schema: pa.Schema):
    """Schema passthrough marker (documents the intended output schema).

    NOTE: this CANNOT repair empty blocks — Ray normalizes any empty
    map_batches output to a **zero-column** block regardless of the schema
    the UDF returned (verified empirically).  Use :func:`drop_empty_blocks`
    on datasets that feed a join.
    """
    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and t.schema.names != schema.names:
            return schema.empty_table()
        return t

    return ds.map_batches(f, batch_format="pyarrow")


_PROBE_TASK = None


def _get_probe_task():
    """One session-wide remote task: ``ray.remote(fn)`` per probe call
    exports a fresh remote function every time (~0.5-1 s each — measured
    as the dominant cost of per-round CC probes); a single generic task
    taking the probe fn as an argument exports once and pickles only the
    small closure per call."""
    global _PROBE_TASK
    if _PROBE_TASK is None:
        import ray

        @ray.remote(num_cpus=0.25)
        def _apply_probe(fn, block):
            return fn(block)

        _PROBE_TASK = _apply_probe
    return _PROBE_TASK


def probe_blocks(mat_ds, fn) -> pa.Table:
    """Run ``fn(block) -> pa.Table`` over a MATERIALIZED dataset's blocks
    as raw Ray tasks and concat the (tiny) results on the driver.

    This is the escape hatch for the per-round driver probes (boundary
    fixups, convergence fingerprints): each emits ~2 rows per block, but
    as a ``map_batches`` dataset it costs a full streaming-executor
    launch (~0.3-0.5 s of pure latency).  An iterative pipeline doing
    several probes per round pays seconds of wall per round for
    micro-results; raw tasks over the already-pinned block refs cost
    ~10 ms each.  Only valid on materialized datasets.
    """
    import ray

    refs = [ref for bundle in mat_ds.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks]
    if not refs:
        return pa.table({})
    task = _get_probe_task()
    parts = [t for t in ray.get([task.remote(fn, r) for r in refs])
             if t is not None and t.num_rows]
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts)


def collect_table(ds, schema: pa.Schema) -> pa.Table:
    """Pull a BOUNDED dataset to one driver-side Arrow table.

    Zero-copy block fetch via the internal ref bundles (the
    ``take_all()`` row-dict path copies per row).  Callers own the bound:
    every call site is gated (delta caps, touched-subgraph sizes) — never
    call this on a corpus-sized dataset.
    """
    import ray

    mat = ds if type(ds).__name__ == "MaterializedDataset" \
        else ds.materialize()
    refs = [ref for bundle in mat.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks
            if meta.num_rows is None or meta.num_rows > 0]
    parts = [t.select(schema.names) for t in ray.get(refs)
             if t.num_rows and all(c in t.column_names
                                   for c in schema.names)]
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(parts).combine_chunks()


def drop_empty_blocks(ds, schema: pa.Schema):
    """Rebuild a dataset without its empty blocks (join-input hygiene).

    Ray's hash-aggregate emits zero-column blocks for empty partitions and
    map_batches normalizes empty outputs to zero-column blocks; a join
    partition that receives only such blocks dies inside pyarrow acero
    with ``No match ... for key field reference``.  Filtering by block
    METADATA (no data fetch) removes them; the dataset is materialized
    first if it is not already (call sites are small aggregate outputs —
    labels, representatives, bucket tables — never the corpus itself).

    ``schema`` is used when every block is empty (an all-empty input must
    still present typed columns to the join).
    """
    import ray.data as rd

    mat = ds if hasattr(ds, "iter_internal_ref_bundles") and \
        type(ds).__name__ == "MaterializedDataset" else ds.materialize()
    refs = [ref for bundle in mat.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks
            if meta.num_rows is None or meta.num_rows > 0]
    if not refs:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(refs)
