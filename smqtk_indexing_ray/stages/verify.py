"""Candidate-pair verification — the exact re-rank stage.

Analog of the reference's post-LSH exact-distance verification
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:499-518: fetch
candidate vectors, compute the exact metric, keep the best), restated as a
batch self-join: candidate edges hash-join the signatures table on both
endpoints (two partitioned joins — the signature payload crosses the wire
once per endpoint, ~0.5 KB/row, never the text), then a vectorized kernel
computes the estimated Jaccard (MinHash agreement fraction) and SimHash
hamming distance and filters below-threshold edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.context import NARROW_JOIN_HINT
from smqtk_indexing_ray.functions.metrics import est_jaccard, hamming_u64
from smqtk_indexing_ray.stages.signatures import minhash_matrix


def verify_edges(edges, signatures, cfg: DedupConfig, *,
                 num_partitions: int = 32):
    """edges(u, v) x signatures -> verified edges (u, v, est_jaccard,
    hamming) with ``est_jaccard >= cfg.verify_threshold`` OR
    ``hamming <= cfg.simhash_hamming_max``."""
    sig = signatures.select_columns(["doc_id", "minhash", "simhash"])

    from smqtk_indexing_ray.stages._util import drop_empty_blocks
    edges = drop_empty_blocks(
        edges, pa.schema([("u", pa.int64()), ("v", pa.int64())]))

    e1 = edges.join(sig, partition_size_hint=NARROW_JOIN_HINT,
                  join_type="inner", num_partitions=num_partitions,
                    on=("u",), right_on=("doc_id",),
                    left_suffix="", right_suffix="_u")
    e1 = e1.rename_columns({"minhash": "minhash_u", "simhash": "simhash_u"})
    e1 = e1.drop_columns(["doc_id"]) if "doc_id" in e1.columns() else e1
    e2 = e1.join(sig, partition_size_hint=NARROW_JOIN_HINT,
                  join_type="inner", num_partitions=num_partitions,
                 on=("v",), right_on=("doc_id",),
                 left_suffix="", right_suffix="_v")
    e2 = e2.rename_columns({"minhash": "minhash_v", "simhash": "simhash_v"})
    if "doc_id" in e2.columns():
        e2 = e2.drop_columns(["doc_id"])

    num_perms = cfg.num_perms
    thresh = cfg.verify_threshold
    ham_max = cfg.simhash_hamming_max

    def score(t: pa.Table) -> pa.Table:
        needed = ("u", "v", "minhash_u", "minhash_v", "simhash_u", "simhash_v")
        if t.num_rows == 0 or any(c not in t.column_names for c in needed):
            # Ray joins emit zero-column blocks for empty partitions —
            # always re-stamp the output schema.
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64()),
                             "hamming": pa.array([], pa.int32())})
        mu = minhash_matrix(t["minhash_u"], num_perms)
        mv = minhash_matrix(t["minhash_v"], num_perms)
        ej = est_jaccard(mu, mv)
        su = t["simhash_u"].to_numpy(zero_copy_only=False).view(np.uint64)
        sv = t["simhash_v"].to_numpy(zero_copy_only=False).view(np.uint64)
        ham = hamming_u64(su, sv).astype(np.int32)
        keep = (ej >= thresh) | (ham <= ham_max)
        return pa.table({
            "u": t["u"].to_numpy(zero_copy_only=False)[keep],
            "v": t["v"].to_numpy(zero_copy_only=False)[keep],
            "est_jaccard": ej[keep],
            "hamming": ham[keep],
        })

    return e2.map_batches(score, batch_format="pyarrow")
