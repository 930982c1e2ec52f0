"""LSH banding: signature rows -> exploded ``(bucket, doc_id)`` rows.

Analog of the reference's hash-int bucket keying
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:319 packs the bit
vector into a Python int via utils/bits.py:4-20).  Here each of the ``b``
bands of the MinHash signature folds into one uint64 key with the band id
mixed in, so a single int64 ``bucket`` column is the shuffle key — the
narrowest possible payload to send through the group-by (SURVEY.md: only
signatures cross the shuffle; here it is 16 bytes/row, not even the
signature).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.functions.hashing import splitmix64
from smqtk_indexing_ray.stages.signatures import fixed_binary_matrix


def band_stage(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """Explode one signature batch into ``bands`` bucket rows per doc.

    Band keys are precomputed by the signature stage (the full MinHash
    signature never leaves it); this stage explodes the fixed-binary
    band-key matrix into shuffle rows.

    Zero-shingle docs (shorter than ``shingle_k`` tokens) cannot be
    near-anything, so instead of their band keys they emit ONE exact-dup
    bucket keyed by the 128-bit content hash: byte-identical short texts
    share the bucket, the verify stage passes them at est_jaccard = 1.0
    (identical signatures), and the standalone exact-dup star sort the
    pipeline used to run disappears.  A chance key collision with the
    MinHash band keyspace (p = 2^-64 per pair) only creates a candidate
    edge, which verification rejects.
    """
    empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                      "doc_id": pa.array([], type=pa.int64())})
    keep = batch.filter(pa.compute.greater(batch["n_shingles"], 0))
    n = keep.num_rows
    parts = []
    if n:
        b = cfg.bands
        keys = fixed_binary_matrix(keep["bands"], b * 8, dtype=np.int64)
        doc = keep["doc_id"].to_numpy(zero_copy_only=False)
        bucket = np.ascontiguousarray(keys).reshape(-1)   # doc-major layout
        doc_rep = np.repeat(doc, b)
        parts.append(pa.table({"bucket": pa.array(bucket),
                               "doc_id": pa.array(doc_rep)}))
    zs = batch.filter(pa.compute.equal(batch["n_shingles"], 0))
    if zs.num_rows:
        h1 = zs["text_h1"].to_numpy(zero_copy_only=False).view(np.uint64)
        h2 = zs["text_h2"].to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            eb = splitmix64(h1 ^ splitmix64(h2)).view(np.int64)
        parts.append(pa.table({"bucket": pa.array(eb),
                               "doc_id": zs["doc_id"]}))
    if not parts:
        return empty
    return pa.concat_tables(parts)


# hot-bucket skew control lives in stages/buckets.star_edges (salt as a
# secondary sort sub-key; SURVEY.md §4.2) — no key rewriting happens here.
