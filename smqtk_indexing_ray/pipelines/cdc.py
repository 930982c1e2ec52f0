"""Chunk-level exact dedup via content-defined chunking.

The fourth dedup grain in the engine (document exact / MinHash near /
line-level / CDC chunk): documents are cut into content-defined chunks
(:mod:`smqtk_indexing_ray.functions.cdc`), chunk hashes are counted
across distinct documents, and each document reports how much of its
byte mass lives in chunks shared with at least one OTHER document —
the shift-tolerant "how much of this page exists elsewhere" signal
that byte-offset shingles miss when boilerplate is inserted or
reordered.

Shuffle discipline: text never crosses a shuffle.  Stage 1 reduces
each batch to one row per ``(chunk_hash, doc_id)`` (a document lives
in exactly one batch row, so these rows are globally unique); the ONE
wide exchange is a sort by ``chunk_hash`` whose run lengths ARE the
distinct-document counts (``stages/agg.sorted_run_length_attach``),
and the per-document rollup rides the measured sort-based aggregation
(``sorted_group_agg``).  At 10^12 docs the exchanged rows are
O(chunks), ~40 B each — never document bytes.  Chunk identity is a
128-bit two-lane keyed hash pair computed by the vectorized segmented
byte kernel (``functions.hashing.hash_byte_segments_u64`` — zero
Python per chunk; birthday-safe at that scale, one 64-bit lane would
silently merge colliding chunks into "shared" content).

Reference analog: the bucket-multimap accounting of
/root/reference/smqtk_indexing/impls/nn_index/lsh.py:315-323 (hash ->
member-set sizes), applied to content-defined chunk keys instead of
LSH band keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from smqtk_indexing_ray.functions.cdc import cdc_cut_points, gear_hashes_padded
from smqtk_indexing_ray.functions.hashing import hash_byte_segments_u64

# Two independent keyed hash lanes (arbitrary fixed 64-bit seeds): the
# chunk identity is the 128-bit (h1, h2) pair — a single 64-bit lane
# silently merges colliding chunks into 'shared' content at the 10^12-doc
# design scale (the same birthday argument as media_dedup's key).
_CDC_SEED1 = np.uint64(0x63D1_6C75_11B4_90A7)
_CDC_SEED2 = np.uint64(0x1F8E_2A6B_D90C_4E35)

CDC_CHUNK_STATS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_chunks", pa.int64()),
    ("n_shared_chunks", pa.int64()), ("total_bytes", pa.int64()),
    ("dup_bytes", pa.int64()), ("dup_byte_frac", pa.float64()),
])

_PAIR_SCHEMA = pa.schema([
    ("chunk_h1", pa.int64()), ("chunk_h2", pa.int64()),
    ("doc_id", pa.int64()),
    ("n_in_doc", pa.int64()), ("len_sum", pa.int64()),
])


def _chunk_batch(t: pa.Table, mask_bits: int, min_size: int,
                 max_size: int) -> pa.Table:
    """One batch -> one row per (chunk_hash, doc_id) with the in-doc
    instance count and byte sum.  Zero-length texts contribute no
    rows (documented: empty docs are omitted from the stats)."""
    if t.num_rows == 0 or "doc_id" not in t.column_names:
        return _PAIR_SCHEMA.empty_table()
    texts = t["text"].to_pylist()
    streams = [x.encode("utf-8") if x else b"" for x in texts]
    dids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h, offs = gear_hashes_padded(streams)

    # chunks tile each document's byte stream completely and documents
    # tile the unpadded concatenation, so the batch's chunk bytes ARE
    # one contiguous stream with per-chunk offsets — no per-chunk
    # Python slices/strings, the identity hash rides the vectorized
    # segmented kernel over the whole batch at once
    doc_lens = np.array([len(s) for s in streams], np.int64)
    doc_base = np.concatenate([[0], np.cumsum(doc_lens)])
    chunk_doc: list[np.ndarray] = []
    chunk_start: list[np.ndarray] = []
    chunk_len: list[np.ndarray] = []
    for i, s in enumerate(streams):
        n = len(s)
        if n == 0:
            continue
        ends = cdc_cut_points(h[offs[i]:offs[i] + n], mask_bits=mask_bits,
                              min_size=min_size, max_size=max_size)
        starts = np.concatenate([[0], ends[:-1] + 1])
        chunk_doc.append(np.full(len(ends), dids[i], np.int64))
        chunk_start.append(doc_base[i] + starts)
        chunk_len.append(ends - starts + 1)
    if not chunk_doc:
        return _PAIR_SCHEMA.empty_table()
    doc = np.concatenate(chunk_doc)
    ln = np.concatenate(chunk_len)
    raw = np.frombuffer(b"".join(streams), np.uint8)
    seg_offs = np.append(np.concatenate(chunk_start), doc_base[-1])
    h1 = hash_byte_segments_u64(raw, seg_offs,
                                seed=_CDC_SEED1).view(np.int64)
    h2 = hash_byte_segments_u64(raw, seg_offs,
                                seed=_CDC_SEED2).view(np.int64)

    order = np.lexsort((h2, h1, doc))
    doc, h1, h2, ln = doc[order], h1[order], h2[order], ln[order]
    first = np.empty(len(doc), bool)
    first[0] = True
    first[1:] = ((doc[1:] != doc[:-1]) | (h1[1:] != h1[:-1])
                 | (h2[1:] != h2[:-1]))
    starts_i = np.flatnonzero(first)
    cnt = np.diff(np.append(starts_i, len(doc))).astype(np.int64)
    lsum = np.add.reduceat(ln, starts_i)
    return pa.table({
        "chunk_h1": pa.array(h1[starts_i]),
        "chunk_h2": pa.array(h2[starts_i]),
        "doc_id": pa.array(doc[starts_i]),
        "n_in_doc": pa.array(cnt),
        "len_sum": pa.array(lsum.astype(np.int64)),
    }, schema=_PAIR_SCHEMA)


def cdc_chunk_stats(docs, *, mask_bits: int = 6, min_size: int = 32,
                    max_size: int = 256, batch_size: int = 2048):
    """Per-document CDC duplicate accounting.

    Output: ``doc_id, n_chunks, n_shared_chunks, total_bytes,
    dup_bytes, dup_byte_frac`` — a chunk instance is *shared* when its
    content hash occurs in >= 2 distinct documents corpus-wide;
    ``dup_byte_frac`` is the exact int64 ratio ``dup_bytes /
    total_bytes``.  Exact duplicates report 1.0; a page that embeds a
    syndicated article inside unique boilerplate reports the embedded
    fraction (shifted offsets included — the CDC property).

    Defaults target the synthetic corpus's ~300-byte documents
    (expected chunk ``2**mask_bits`` = 64 B); production webtext wants
    ``mask_bits``~12, ``min_size``~2048, ``max_size``~16384.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import (
        sorted_group_agg,
        sorted_run_length_attach,
    )

    def chunk(t: pa.Table) -> pa.Table:
        return _chunk_batch(t, mask_bits, min_size, max_size)

    pairs = docs.select_columns(["doc_id", "text"]).map_batches(
        chunk, batch_format="pyarrow", batch_size=batch_size)

    # run length over (hash, doc)-unique rows == distinct-doc count
    sized = sorted_run_length_attach(pairs, key=["chunk_h1", "chunk_h2"],
                                     out="n_docs", schema=_PAIR_SCHEMA)

    part_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_chunks", pa.int64()),
        ("n_shared_chunks", pa.int64()), ("total_bytes", pa.int64()),
        ("dup_bytes", pa.int64()),
    ])

    def per_doc_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_docs" not in t.column_names:
            return part_schema.empty_table()
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        cnt = t["n_in_doc"].to_numpy(zero_copy_only=False)
        ls = t["len_sum"].to_numpy(zero_copy_only=False)
        shared = t["n_docs"].to_numpy(zero_copy_only=False) >= 2
        uniq, inv = np.unique(doc, return_inverse=True)
        k = len(uniq)
        out = np.zeros((k, 4), np.int64)
        np.add.at(out[:, 0], inv, cnt)
        np.add.at(out[:, 1], inv, np.where(shared, cnt, 0))
        np.add.at(out[:, 2], inv, ls)
        np.add.at(out[:, 3], inv, np.where(shared, ls, 0))
        return pa.table({
            "doc_id": pa.array(uniq), "n_chunks": pa.array(out[:, 0]),
            "n_shared_chunks": pa.array(out[:, 1]),
            "total_bytes": pa.array(out[:, 2]),
            "dup_bytes": pa.array(out[:, 3]),
        }, schema=part_schema)

    agg = sorted_group_agg(
        sized.map_batches(per_doc_partial, batch_format="pyarrow"),
        key="doc_id",
        aggs={"n_chunks": "sum", "n_shared_chunks": "sum",
              "total_bytes": "sum", "dup_bytes": "sum"},
        schema=part_schema)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "dup_bytes" not in t.column_names:
            return CDC_CHUNK_STATS_SCHEMA.empty_table()
        tot = t["total_bytes"].to_numpy(zero_copy_only=False)
        dup = t["dup_bytes"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"], "n_chunks": t["n_chunks"],
            "n_shared_chunks": t["n_shared_chunks"],
            "total_bytes": t["total_bytes"], "dup_bytes": t["dup_bytes"],
            "dup_byte_frac": pa.array(dup / (tot * 1.0)),
        }, schema=CDC_CHUNK_STATS_SCHEMA)

    return agg.map_batches(finish, batch_format="pyarrow")
