"""Join-free self-pair emission (stages/pairs.py) vs brute force."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest


def _brute(k, items):
    by_key: dict = {}
    for kk, it in zip(k, items):
        by_key.setdefault(kk, []).append(it)
    out = set()
    for kk, lst in by_key.items():
        for a, b in combinations(sorted(lst), 2):
            out.add((a, b))
    return out


@pytest.mark.usefixtures("ray_session")
def test_sorted_self_pairs_matches_bruteforce():
    """Hot key spanning several blocks (ownership handoff), singleton
    keys, and duplicate pair keys across different group keys (emitted
    once per shared key, as a join would)."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.pairs import sorted_self_pairs

    rng = np.random.default_rng(103)
    n = 3000
    k = rng.integers(0, 500, n)
    k[:1400] = 42                       # hot key straddles blocks
    # unique (key, item) rows
    seen = set()
    keys, items = [], []
    for kk in k:
        it = int(rng.integers(0, 20_000))
        while (int(kk), it) in seen:
            it = int(rng.integers(0, 20_000))
        seen.add((int(kk), it))
        keys.append(int(kk))
        items.append(it)
    t = pa.table({"key": pa.array(keys, pa.int64()),
                  "item": pa.array(items, pa.int64()),
                  "w": pa.array([i * 10 for i in items], pa.int64())})
    got = sorted_self_pairs(
        rd.from_arrow(t).repartition(11), key="key", item="item",
        carry=["w"]).to_pandas()
    # multiset of pairs: one emission per shared key
    from collections import Counter
    got_pairs = Counter(zip(got.item_a, got.item_b))
    want = Counter()
    by_key: dict = {}
    for kk, it in zip(keys, items):
        by_key.setdefault(kk, []).append(it)
    for kk, lst in by_key.items():
        for a, b in combinations(sorted(lst), 2):
            want[(a, b)] += 1
    assert got_pairs == want
    assert (got.w_a == got.item_a * 10).all()
    assert (got.w_b == got.item_b * 10).all()
    assert (got.item_a < got.item_b).all()


@pytest.mark.usefixtures("ray_session")
def test_sorted_self_pairs_big_run_chunked_path():
    """A single run whose m^2 exceeds the chunk bound must go through
    the within-run striping and still emit exactly C(m, 2) pairs."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.pairs import sorted_self_pairs

    m = 120                            # m^2 = 14400 > chunk_cells
    t = pa.table({"key": pa.array([9] * m, pa.int64()),
                  "item": pa.array(np.arange(m, dtype=np.int64))})
    got = sorted_self_pairs(rd.from_arrow(t), key="key", item="item",
                            chunk_cells=1000).to_pandas()
    assert len(got) == m * (m - 1) // 2
    assert (got.item_a < got.item_b).all()
    assert len(set(zip(got.item_a, got.item_b))) == len(got)


@pytest.mark.usefixtures("ray_session")
def test_sorted_self_pairs_max_group_skips_hot_key():
    """A hot key spanning several blocks and exceeding max_group emits
    NO pairs (complete-run semantics: the cap must count rows across
    block boundaries, not per-block), while normal keys still emit."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.pairs import sorted_self_pairs

    hot = [(7, i) for i in range(300)]          # run of 300, cap 100
    cold = [(1, 10), (1, 11), (2, 5), (2, 6), (2, 7)]
    rows = hot + cold
    t = pa.table({"key": pa.array([k for k, _ in rows], pa.int64()),
                  "item": pa.array([v for _, v in rows], pa.int64())})
    got = sorted_self_pairs(
        rd.from_arrow(t).repartition(9), key="key", item="item",
        max_group=100).to_pandas()
    pairs = set(zip(got.item_a, got.item_b))
    assert pairs == {(10, 11), (5, 6), (5, 7), (6, 7)}


@pytest.mark.usefixtures("ray_session")
def test_sorted_self_pairs_cap_fires():
    import ray.data as rd

    from smqtk_indexing_ray.stages.pairs import sorted_self_pairs

    n = 600
    t = pa.table({"key": pa.array([1] * n, pa.int64()),
                  "item": pa.array(np.arange(n, dtype=np.int64))})
    with pytest.raises(RuntimeError, match="cap"):
        # one run of 600 across many tiny blocks with cap 50
        sorted_self_pairs(rd.from_arrow(t).repartition(20), key="key",
                          item="item", cap=50).materialize()
