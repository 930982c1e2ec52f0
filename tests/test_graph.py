"""Dup-graph analytics (pipelines/graph.py) vs brute-force oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _brute_triangles(edges: set[tuple[int, int]]):
    tris = set()
    for (a, b) in edges:
        for (c, d) in edges:
            if c == b and (min(a, d), max(a, d)) in edges:
                tris.add(tuple(sorted((a, b, d))))
    return sorted(tris)


def _edges_ds(edges, n_parts=5):
    import ray.data as rd
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    return rd.from_arrow(pa.table({
        "doc_a": pa.array(a), "doc_b": pa.array(b),
    })).repartition(n_parts)


@pytest.mark.usefixtures("ray_session")
class TestDupGraph:
    @staticmethod
    def _random_edges(n=40, p=0.15, seed=7):
        rng = np.random.default_rng(seed)
        edges = set()
        for a in range(n):
            for b in range(a + 1, n):
                if rng.random() < p:
                    edges.add((a, b))
        return edges

    def test_triangles_match_bruteforce(self):
        """Every triangle exactly once, (a < b < c), on a random graph
        dense enough to have shared wedges across blocks."""
        from smqtk_indexing_ray.pipelines.graph import dup_triangles
        edges = self._random_edges()
        got = dup_triangles(_edges_ds(edges)).to_pandas().sort_values(
            ["doc_a", "doc_b", "doc_c"], ignore_index=True)
        want = _brute_triangles(edges)
        assert len(want) > 5, "degenerate test graph"
        assert [tuple(r) for r in got.itertuples(index=False)] == want

    def test_clique_and_star(self):
        """A k-clique yields C(k,3) triangles and coefficient 1.0 for
        every member; a star's hub has coefficient 0.0."""
        from smqtk_indexing_ray.pipelines.graph import (
            clustering_coefficients,
            dup_triangles,
        )
        k = 6
        clique = {(a, b) for a in range(k) for b in range(a + 1, k)}
        star = {(100, 100 + i) for i in range(1, 5)}
        edges = clique | star
        tris = dup_triangles(_edges_ds(edges)).to_pandas()
        assert len(tris) == k * (k - 1) * (k - 2) // 6
        cc = clustering_coefficients(_edges_ds(edges)).to_pandas()
        cc = cc.set_index("doc_id")
        for v in range(k):
            assert cc.loc[v, "clustering"] == 1.0
            assert cc.loc[v, "degree"] == k - 1
        assert cc.loc[100, "clustering"] == 0.0
        assert cc.loc[100, "n_triangles"] == 0
        # leaves have degree 1 -> defined as 0.0
        assert cc.loc[101, "clustering"] == 0.0

    def test_coefficients_match_bruteforce(self):
        from smqtk_indexing_ray.pipelines.graph import (
            clustering_coefficients)
        edges = self._random_edges(n=30, p=0.2, seed=13)
        got = clustering_coefficients(_edges_ds(edges)).to_pandas()
        got = got.sort_values("doc_id", ignore_index=True)
        tris = _brute_triangles(edges)
        deg, tc = {}, {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        for t in tris:
            for v in t:
                tc[v] = tc.get(v, 0) + 1
        assert list(got.doc_id) == sorted(deg)
        for _, r in got.iterrows():
            d, t = deg[r.doc_id], tc.get(r.doc_id, 0)
            assert r.degree == d and r.n_triangles == t
            want = (2 * t) / float(d * (d - 1)) if d >= 2 else 0.0
            assert r.clustering == want

    def test_max_degree_guard_drops_hot_vertex_wedges(self):
        """max_degree suppresses wedges at over-degree vertices — the
        clique collapses to zero triangles when every vertex is hot."""
        from smqtk_indexing_ray.pipelines.graph import dup_triangles
        k = 8
        clique = {(a, b) for a in range(k) for b in range(a + 1, k)}
        tris = dup_triangles(_edges_ds(clique),
                             max_degree=3).to_pandas()
        # lowest-vertex wedge counts exceed 3 only for vertices with
        # >3 HIGHER neighbors: vertices 0..3 are suppressed, 4..7 keep
        # their wedges -> exactly the triangles within {4..7} plus any
        # at vertices with <=3 higher neighbors
        want = _brute_triangles({(a, b) for (a, b) in clique})
        kept = [t for t in want if k - 1 - t[0] <= 3]
        assert sorted(tuple(r) for r in tris.itertuples(index=False)) \
            == sorted(kept)

    def test_pack_limit_raises(self):
        from smqtk_indexing_ray.pipelines.graph import dup_triangles
        big = 1 << 32
        ds = _edges_ds({(big, big + 1), (big, big + 2),
                        (big + 1, big + 2)}, n_parts=1)
        with pytest.raises(Exception):
            dup_triangles(ds).to_pandas()
