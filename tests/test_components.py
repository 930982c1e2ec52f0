"""Distributed connected components vs a driver union-find oracle."""

import numpy as np
import pyarrow as pa
import pytest

from smqtk_indexing_ray.stages.components import (
    connected_components,
    driver_connected_components,
)


def _cc_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = sorted((ru, rv))
            parent[hi] = lo
    nodes = {n for e in edges for n in e}
    return {n: find(n) for n in nodes}


def _run_cc(edges: list[tuple[int, int]]):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64()),
    }))
    labels = connected_components(ds, num_partitions=4, max_iters=25)
    df = labels.to_pandas()
    return dict(zip(df["doc_id"], df["cluster_id"]))


@pytest.mark.usefixtures("ray_session")
class TestConnectedComponents:
    def test_single_edge(self):
        assert _run_cc([(1, 2)]) == {1: 1, 2: 1}

    def test_chain(self):
        got = _run_cc([(1, 2), (2, 3), (3, 4), (4, 5)])
        assert got == {n: 1 for n in range(1, 6)}

    def test_two_components_with_duplicates(self):
        edges = [(10, 11), (11, 12), (10, 11), (20, 21), (21, 22), (22, 20)]
        got = _run_cc(edges)
        assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20}

    def test_star(self):
        edges = [(100, i) for i in range(1, 20)]
        got = _run_cc(edges)
        assert set(got.values()) == {1}

    def test_random_graphs_match_oracle(self):
        rng = np.random.default_rng(7)
        for trial in range(3):
            n = 200
            m = [60, 150, 400][trial]
            edges = [tuple(sorted(map(int, rng.integers(0, n, 2))))
                     for _ in range(m)]
            edges = [e for e in edges if e[0] != e[1]]
            got = _run_cc(edges)
            want = _cc_oracle(edges)
            assert got == want

    def test_long_path_converges(self):
        # worst case for min-label propagation: a long path
        edges = [(i, i + 1) for i in range(0, 120)]
        got = _run_cc(edges)
        assert set(got.values()) == {0}


@pytest.mark.usefixtures("ray_session")
def test_driver_union_find_matches():
    import ray.data as rd

    edges = [(1, 2), (2, 3), (7, 9), (9, 8)]
    ds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64()),
    }))
    got = driver_connected_components(ds)
    assert got == _cc_oracle(edges)


@pytest.mark.usefixtures("ray_session")
class TestConvergenceAdversarial:
    """Extra adversarial shapes for the r2 probe-based convergence test
    (labels fingerprinted at the large-star sort, earliest-stop): shapes
    chosen to maximize the chance of a premature-stop bug."""

    def test_adversarial_shapes(self):
        rng = np.random.default_rng(23)
        cases = []
        # two chains sharing no nodes (labels of separate components)
        cases.append([(i, i + 1) for i in range(0, 30)]
                     + [(i, i + 1) for i in range(100, 140)])
        # binary tree (log-depth propagation)
        cases.append([(i, 2 * i + 1) for i in range(63)]
                     + [(i, 2 * i + 2) for i in range(63)])
        # cycle (every node has two neighbors)
        cases.append([(i, (i + 1) % 50) for i in range(50)])
        # barbell: two cliques linked by a long path
        k1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
        k2 = [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
        path = [(5 + i, 5 + i + 1) for i in range(0, 95)]
        cases.append(k1 + k2 + path)
        # reversed-id chain: min is at the END of the path
        cases.append([(200 - i, 200 - i - 1) for i in range(0, 60)])
        # random sparse graphs near the percolation threshold
        for seed in range(4):
            r = np.random.default_rng(seed)
            es = [tuple(sorted(map(int, r.integers(0, 300, 2))))
                  for _ in range(160)]
            cases.append([e for e in es if e[0] != e[1]])
        for edges in cases:
            got = _run_cc(edges)
            want = _cc_oracle(edges)
            assert got == want, f"mismatch on case with {len(edges)} edges"
