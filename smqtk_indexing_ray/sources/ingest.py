"""Pages ingestion: multi-format readers normalized to the pages schema.

The reference has no data-file readers (model blobs only —
/root/reference/smqtk_indexing/impls/lsh_functor/itq.py:212-237); a
webtext engine needs them.  Every reader returns a Dataset conforming to
the canonical pages schema (BASELINE.json input_hint):

    doc_id:int64, url:string, warc_ts:timestamp[us],
    html:binary(nullable), text:string(nullable), lang:string(nullable)

Missing optional columns are added as typed nulls; a missing ``doc_id``
is derived structurally from (shard, row-in-shard) — never by hashing
``url`` (a 64-bit url hash collides at the 10^12-doc design scale).
Column pruning is pushed into the parquet read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PAGES_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_REQUIRED = ("url",)


def _normalize_batch(t: pa.Table, with_ids: bool) -> pa.Table:
    if t.num_rows == 0:
        return PAGES_SCHEMA.empty_table()
    cols = {}
    for f in PAGES_SCHEMA:
        if f.name == "doc_id" and with_ids and "doc_id" not in t.column_names:
            continue
        if f.name in t.column_names:
            col = t[f.name]
            if col.type != f.type:
                col = pc.cast(col, f.type)
            cols[f.name] = col
        elif f.name == "doc_id":
            continue  # assigned below
        else:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
    if "doc_id" not in cols:
        # structural id: caller supplies the shard offset via _shard_base
        base = t.schema.metadata or {}
        cols["doc_id"] = pa.array(
            np.arange(t.num_rows, dtype=np.int64))
    names = [f.name for f in PAGES_SCHEMA]
    return pa.table({n: cols[n] for n in names})


def read_pages(path: str | list[str], *, format: str = "parquet",
               columns: list[str] | None = None):
    """Read a pages table from parquet / json(l) / csv.

    ``columns`` prunes at the read for parquet (only requested columns
    leave storage); other formats read fully then project.
    """
    import ray.data as rd

    if format == "parquet":
        want = columns or [f.name for f in PAGES_SCHEMA]
        # only pass columns that parquet might have; normalization adds
        # typed nulls for the rest
        ds = rd.read_parquet(path)
        have = set(ds.columns() or [])
        keep = [c for c in want if c in have]
        if keep and set(keep) != have:
            ds = rd.read_parquet(path, columns=keep)
    elif format in ("json", "jsonl"):
        ds = rd.read_json(path)
    elif format == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"unsupported format: {format!r}")

    have = set(ds.columns() or [])
    missing = [c for c in _REQUIRED if c not in have]
    if missing and "doc_id" not in have:
        raise ValueError(
            f"read_pages: input lacks required column(s) {missing} "
            "and has no doc_id")

    with_ids = "doc_id" in have
    out = ds.map_batches(lambda t: _normalize_batch(t, with_ids),
                         batch_format="pyarrow")
    if not with_ids:
        # structural ids: contiguous within the dataset order — stable for
        # a fixed input file list (shard-major), per the doc_id note in
        # sources/pages.py
        out = _assign_structural_ids(out)
    return out


def _assign_structural_ids(ds):
    """(shard_block_index << 40) | row — unique, no hashing, stable for a
    fixed block order."""
    def add_ids(t: pa.Table, b_idx: int) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = (np.int64(b_idx) << np.int64(40)) + np.arange(
            t.num_rows, dtype=np.int64)
        return t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                            pa.array(ids))

    # map_batches has no batch index; use a per-block map via map_batches
    # over enumerated refs is driver-side — instead derive from the first
    # url hash-free: use cumulative count via a materialize + per-block
    # task (blocks are stable once materialized)
    import ray
    import ray.data as rd
    mat = ds.materialize()
    bundles = list(mat.iter_internal_ref_bundles())
    refs = [ref for b in bundles for ref, _ in b.blocks]

    @ray.remote
    def fix(block, b_idx):
        return add_ids(block, b_idx)

    out_refs = [fix.remote(r, i) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)
