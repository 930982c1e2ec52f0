"""Dup-graph analytics: exact triangle enumeration and local
clustering coefficients over the near-duplicate pair graph.

Template farms and mirror networks show up as near-cliques in the
near-dup graph; a doc's local clustering coefficient separates
"hub of a star" (one boilerplate page linked to many distinct pages,
coefficient ~0) from "member of a clique" (mirror set, coefficient ~1)
— a curation signal the pairwise Jaccard score alone cannot give.

Shape: triangles are enumerated at their LOWEST vertex (each edge is
already oriented low -> high, so each triangle is generated exactly
once as a wedge at its minimum vertex), wedges ride the join-free
``sorted_self_pairs`` stage, and the closing-edge check is one
sort-merge semi-join on a packed 64-bit edge key.  Nothing quadratic
in the corpus ever materializes — the pass is bounded by
sum(deg_hi(v)^2), the standard oriented-wedge complexity.

Reference analog: none — the reference stops at pairwise hamming
candidates (/root/reference/smqtk_indexing/impls/hash_index/
linear.py:78-99); graph structure over the candidate pairs is part of
this graft's beyond-reference curation surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TRIANGLE_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()), ("doc_c", pa.int64()),
])

CLUSTERING_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("degree", pa.int64()),
    ("n_triangles", pa.int64()), ("clustering", pa.float64()),
])

# the packed edge key is (v << 32) | w; ids must fit 31 bits.  At the
# design scale (1e12 docs) swap the packing for a fixed_size_binary[16]
# key — the sort-merge attach is key-type agnostic.
_PACK_LIMIT = 1 << 31


def _pack_pairs(v: np.ndarray, w: np.ndarray) -> np.ndarray:
    if len(v) and (int(v.max()) >= _PACK_LIMIT
                   or int(w.max()) >= _PACK_LIMIT
                   or int(v.min()) < 0 or int(w.min()) < 0):
        raise ValueError(
            "doc_id outside [0, 2^31): widen the packed edge key to "
            "fixed_size_binary[16] for this corpus")
    return (v.astype(np.int64) << 32) | w.astype(np.int64)


def dup_triangles(pairs, *, max_degree: int | None = None):
    """Enumerate every triangle in the undirected pair graph exactly
    once as ``(doc_a < doc_b < doc_c)``.

    ``pairs`` must carry int64 ``doc_a < doc_b`` edge rows (one row per
    undirected edge — the contract of every pair producer in this
    repo).  ``max_degree``: vertices with more higher-neighbors than
    this emit no wedges (the hot-clique guard, same semantics as the
    stop-shingle cap); ``None`` bounds only by the stage's run cap.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.attach import sort_attach
    from smqtk_indexing_ray.stages.pairs import sorted_self_pairs

    # the edge set is consumed twice (wedge side + closing-edge side);
    # without this the upstream pair pipeline re-executes per consumer.
    # Bounded: the near-dup pair set, never the corpus.
    pairs = pairs.materialize()

    adj_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("u", pa.int64())])

    def adj(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return adj_schema.empty_table()
        return pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"],
                         "u": t["doc_a"]}, schema=adj_schema)

    adj_ds = pairs.map_batches(adj, batch_format="pyarrow")

    # wedges at the lowest vertex: pairs (v < w) of u's higher
    # neighbors; u rides along as a carry column
    wedges = sorted_self_pairs(adj_ds, key="doc_a", item="doc_b",
                               carry=["u"], max_group=max_degree,
                               schema=adj_schema)

    wedge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                              ("w", pa.int64()), ("pk", pa.int64())])

    def pack_wedge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_b_a" not in t.column_names:
            return wedge_schema.empty_table()
        v = t["doc_b_a"].to_numpy(zero_copy_only=False)
        w = t["doc_b_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": t["u_a"], "v": t["doc_b_a"], "w": t["doc_b_b"],
            "pk": pa.array(_pack_pairs(v, w)),
        }, schema=wedge_schema)

    wedge_pk = wedges.map_batches(pack_wedge, batch_format="pyarrow")

    edge_schema = pa.schema([("pk", pa.int64()), ("present", pa.int64())])

    def pack_edge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return edge_schema.empty_table()
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "pk": pa.array(_pack_pairs(a, b)),
            "present": pa.array(np.ones(len(a), np.int64)),
        }, schema=edge_schema)

    edge_pk = pairs.map_batches(pack_edge, batch_format="pyarrow")

    closed = sort_attach(wedge_pk, edge_pk, key="pk", payload_key="pk",
                         payload_cols=["present"], how="inner",
                         rows_schema=wedge_schema,
                         payload_schema=edge_schema)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return TRIANGLE_SCHEMA.empty_table()
        return pa.table({"doc_a": t["u"], "doc_b": t["v"],
                         "doc_c": t["w"]}, schema=TRIANGLE_SCHEMA)

    return closed.map_batches(finish, batch_format="pyarrow")


def clustering_coefficients(pairs, *, max_degree: int | None = None):
    """Per-doc degree, triangle membership count and local clustering
    coefficient ``2T / (d * (d - 1))`` over the pair graph.

    Degrees fold each edge's two endpoints through batch-local partial
    counts; triangle counts fold each triangle's three corners the
    same way; one LEFT sort-merge attach lines them up (triangle-free
    docs count 0).  The coefficient is an exact int-over-int IEEE
    division — bit-identical to the SQL oracle, no float summation
    anywhere.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.attach import sort_attach

    # consumed by the degree fold AND (twice) inside dup_triangles —
    # cache the bounded pair set once instead of re-running the
    # upstream pair pipeline three times
    pairs = pairs.materialize()

    cnt_schema = pa.schema([("doc_id", pa.int64()), ("n", pa.int64())])

    def _count_cols(cols):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or cols[0] not in t.column_names:
                return cnt_schema.empty_table()
            ids = np.concatenate([
                t[c].to_numpy(zero_copy_only=False) for c in cols])
            uniq, counts = np.unique(ids, return_counts=True)
            return pa.table({
                "doc_id": pa.array(uniq.astype(np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }, schema=cnt_schema)
        return f

    deg = sorted_group_agg(
        pairs.map_batches(_count_cols(["doc_a", "doc_b"]),
                          batch_format="pyarrow"),
        key="doc_id", aggs={"n": "sum"}, schema=cnt_schema)

    tris = dup_triangles(pairs, max_degree=max_degree)
    tri_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_triangles", pa.int64())])

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return tri_schema.empty_table()
        return pa.table({"doc_id": t["doc_id"], "n_triangles": t["n"]},
                        schema=tri_schema)

    tcnt = sorted_group_agg(
        tris.map_batches(_count_cols(["doc_a", "doc_b", "doc_c"]),
                         batch_format="pyarrow"),
        key="doc_id", aggs={"n": "sum"},
        schema=cnt_schema).map_batches(rename, batch_format="pyarrow")

    joined = sort_attach(deg, tcnt, key="doc_id", payload_key="doc_id",
                         payload_cols=["n_triangles"], how="left",
                         rows_schema=cnt_schema,
                         payload_schema=tri_schema)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return CLUSTERING_SCHEMA.empty_table()
        d = t["n"].to_numpy(zero_copy_only=False)
        tri = pc.fill_null(t["n_triangles"], 0).to_numpy(
            zero_copy_only=False)
        denom = d * (d - 1)
        coef = np.where(d >= 2, (2 * tri) / np.where(denom > 0, denom,
                                                     1).astype(np.float64),
                        0.0)
        return pa.table({
            "doc_id": t["doc_id"],
            "degree": pa.array(d),
            "n_triangles": pa.array(tri.astype(np.int64)),
            "clustering": pa.array(coef),
        }, schema=CLUSTERING_SCHEMA)

    return joined.map_batches(finish, batch_format="pyarrow")
