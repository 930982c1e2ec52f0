"""Exact-substring dedup: containment + duplicated-span analysis.

Two operators:

* :func:`substring_containment` — all-pairs full-text containment.  The
  broadcast-everything form is the TEST-SCALE oracle twin (matches a SQL
  ``strpos`` self-join exactly); at corpus scale containment only matters
  within near-dup clusters, which is what :func:`cluster_containment`
  computes.
* :func:`cluster_containment` — the scale path: group by ``cluster_id``
  (clusters are small after LSH banding), and inside each group run the
  suffix-array pass (:mod:`smqtk_indexing_ray.functions.suffix`): full
  containment flags plus the fraction of each document covered by >=
  ``min_span``-byte spans duplicated elsewhere in its cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from smqtk_indexing_ray.functions.suffix import duplicated_span_mask
from smqtk_indexing_ray.stages._util import stamp_schema

_CONT_SCHEMA = pa.schema([("contained", pa.int64()),
                          ("container", pa.int64())])


def substring_containment(docs, *, batch_size: int = 1024,
                          concurrency=(1, 8), max_rows: int = 100_000):
    """All pairs (contained, container) where one doc's full text occurs
    inside another's; ``container`` = min doc_id of any containing doc.

    EXACT TEST-SCALE OP (broadcasts the whole corpus text once via
    ``ray.put``; per-doc x per-corpus scan): the SQL-oracle twin of
    :func:`cluster_containment`, the 10^12-doc path (containment only
    matters within LSH clusters).  Refuses inputs above ``max_rows``
    rather than silently broadcasting a corpus; raise the cap explicitly
    only for offline verification runs.
    """
    import ray
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    batches, n_seen = [], 0
    for b in (docs.select_columns(["doc_id", "text"])
              .iter_batches(batch_format="pyarrow")):
        n_seen += b.num_rows
        if n_seen > max_rows:
            raise ValueError(
                f"substring_containment is an exact all-pairs test-scale "
                f"oracle op; input has > {max_rows} rows. Use "
                f"cluster_containment (suffix-array pass within LSH "
                f"clusters) at scale, or pass max_rows explicitly.")
        batches.append(b)
    tbl = pa.concat_tables(
        batches or [pa.schema([("doc_id", pa.int64()),
                               ("text", pa.string())]).empty_table()])
    all_ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    all_texts = tbl["text"].to_pylist()
    corpus_ref = ray.put((all_ids, all_texts))

    class _Contain:
        def __init__(self, ref):
            self.ids, self.texts = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _CONT_SCHEMA.empty_table()
            out_a, out_b = [], []
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            texts = t["text"].to_pylist()
            for did, tx in zip(ids, texts):
                if not tx:
                    continue
                best = None
                for cid, ctx in zip(self.ids, self.texts):
                    if cid == did or not ctx or len(ctx) < len(tx):
                        continue
                    if tx in ctx and (best is None or cid < best):
                        best = cid
                if best is not None:
                    out_a.append(int(did))
                    out_b.append(int(best))
            return pa.table({"contained": pa.array(out_a, pa.int64()),
                             "container": pa.array(out_b, pa.int64())})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _Contain, fn_constructor_args=(corpus_ref,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


_SPAN_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("cluster_id", pa.int64()),
    ("contained_in", pa.int64()),          # null if not fully contained
    ("dup_span_frac", pa.float64()),       # bytes in >=min_span dup spans
])


def cluster_containment(labeled, *, min_span: int = 20,
                        max_cluster: int = 256, num_partitions: int = 16):
    """Suffix-array substring pass within each cluster.

    ``labeled``: Dataset (doc_id, cluster_id, text).  Emits one row per
    doc in a multi-doc cluster.  Clusters larger than ``max_cluster``
    members are processed over their ``max_cluster`` longest members for
    containment (a degenerate near-dup cloud's span structure is already
    captured by its representative) — the cap is logged in the output via
    ``dup_span_frac = -1`` for skipped members, never silently.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    def per_cluster(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n <= 1 or "text" not in t.column_names:
            return _SPAN_SCHEMA.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        cid = t["cluster_id"].to_numpy(zero_copy_only=False)
        texts = [x.encode() if isinstance(x, str) else (x or b"")
                 for x in t["text"].to_pylist()]
        order = np.argsort([-len(x) for x in texts], kind="stable")
        skipped = order[max_cluster:]
        order = order[:max_cluster]
        sub = [texts[i] for i in order]
        masks = duplicated_span_mask(sub, min_span=min_span)
        contained = []
        frac = []
        for j, i in enumerate(order):
            tx = sub[j]
            best = None
            for j2, i2 in enumerate(order):
                if i2 == i or len(sub[j2]) < len(tx):
                    continue
                if tx and tx in sub[j2]:
                    c = int(ids[i2])
                    if best is None or c < best:
                        best = c
            contained.append(best)
            frac.append(float(masks[j].mean()) if len(tx) else 0.0)
        out_ids = [int(ids[i]) for i in order] + [int(ids[i]) for i in skipped]
        out_cid = [int(cid[i]) for i in order] + [int(cid[i]) for i in skipped]
        contained += [None] * len(skipped)
        frac += [-1.0] * len(skipped)
        return pa.table({
            "doc_id": pa.array(out_ids, pa.int64()),
            "cluster_id": pa.array(out_cid, pa.int64()),
            "contained_in": pa.array(contained, pa.int64()),
            "dup_span_frac": pa.array(frac, pa.float64()),
        })

    out = labeled.groupby("cluster_id", num_partitions=num_partitions
                          ).map_groups(per_cluster, batch_format="pyarrow")
    return stamp_schema(out, _SPAN_SCHEMA)
