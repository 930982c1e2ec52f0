"""Direct randomized tests of the sort-merge attach primitive
(stages/attach.py) — everything in the repo joins through it, but round
1-2 only covered it transitively through pipeline outputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from smqtk_indexing_ray.stages.attach import sort_attach


def _mk(seed, n_rows=800, n_pay=120, key_space=200):
    rng = np.random.default_rng(seed)
    rows = pa.table({
        "k": pa.array(rng.integers(0, key_space, n_rows), pa.int64()),
        "val": pa.array(rng.integers(0, 50, n_rows), pa.int64()),
    })
    pk = rng.choice(key_space, size=n_pay, replace=False).astype(np.int64)
    payload = pa.table({
        "k": pa.array(pk),
        "p1": pa.array(rng.integers(0, 1000, n_pay), pa.int64()),
        "p2": pa.array([f"s{i}" for i in pk], pa.string()),
    })
    return rows, payload


@pytest.mark.usefixtures("ray_session")
class TestSortAttach:
    @pytest.mark.parametrize("seed,how", [(0, "left"), (1, "left"),
                                          (2, "inner"), (3, "inner")])
    def test_matches_pandas_merge(self, seed, how):
        import ray.data as rd
        rows, payload = _mk(seed)
        out = sort_attach(
            rd.from_arrow(rows).repartition(5),
            rd.from_arrow(payload).repartition(3),
            key="k", payload_key="k", payload_cols=["p1", "p2"], how=how,
            rows_schema=rows.schema, payload_schema=payload.schema,
        ).to_pandas().sort_values(["k", "val"], ignore_index=True)
        want = rows.to_pandas().merge(payload.to_pandas(), on="k",
                                      how="left" if how == "left"
                                      else "inner")
        want = want.sort_values(["k", "val"], ignore_index=True)
        assert len(out) == len(want)
        np.testing.assert_array_equal(out.k, want.k)
        np.testing.assert_array_equal(out.val, want.val)
        lhs = out.p1.fillna(-1).astype(np.int64)
        rhs = want.p1.fillna(-1).astype(np.int64)
        np.testing.assert_array_equal(lhs, rhs)
        assert (out.p2.fillna("-") == want.p2.fillna("-")).all()

    def test_dedup_rows_on_contract(self):
        """dedup_rows_on collapses duplicate (key, v) rows exactly up to
        the documented at-most-one-per-batch-boundary straggler."""
        import ray.data as rd
        rng = np.random.default_rng(9)
        n = 2000
        rows = pa.table({
            "k": pa.array(rng.integers(0, 40, n), pa.int64()),
            "v": pa.array(rng.integers(0, 6, n), pa.int64()),
        })
        payload = pa.table({
            "k": pa.array(np.arange(40, dtype=np.int64)),
            "p1": pa.array(np.arange(40, dtype=np.int64) * 7),
        })
        ds = sort_attach(
            rd.from_arrow(rows).repartition(8), rd.from_arrow(payload),
            key="k", payload_key="k", payload_cols=["p1"], how="inner",
            rows_schema=rows.schema, payload_schema=payload.schema,
            dedup_rows_on=["v"]).materialize()
        out = ds.to_pandas()
        distinct = rows.to_pandas().drop_duplicates(["k", "v"])
        n_blocks = len([1 for b in ds.iter_internal_ref_bundles()
                        for _ in b.blocks])
        got_distinct = out.drop_duplicates(["k", "v"])
        assert len(got_distinct) == len(distinct)
        assert len(out) <= len(distinct) + n_blocks
        # values correct on the distinct rows
        m = got_distinct.merge(payload.to_pandas(), on="k",
                               suffixes=("", "_w"))
        assert (m.p1 == m.p1_w).all()

    def test_empty_rows_and_empty_payload(self):
        import ray.data as rd
        rows, payload = _mk(5, n_rows=50)
        empty_rows = rows.slice(0, 0)
        out = sort_attach(
            rd.from_arrow(empty_rows), rd.from_arrow(payload),
            key="k", payload_key="k", payload_cols=["p1", "p2"],
            how="left", rows_schema=rows.schema,
            payload_schema=payload.schema).to_pandas()
        assert len(out) == 0
        empty_pay = payload.slice(0, 0)
        out2 = sort_attach(
            rd.from_arrow(rows), rd.from_arrow(empty_pay),
            key="k", payload_key="k", payload_cols=["p1", "p2"],
            how="left", rows_schema=rows.schema,
            payload_schema=payload.schema).to_pandas()
        assert len(out2) == len(rows)
        assert out2.p1.isna().all()


def test_safe_coalesce_sliced_masked_layout():
    """Pin the pyarrow 16.1 kernel bug that corrupted the flagship label
    attach: pc.coalesce on a NON-ZERO-OFFSET slice of a masked column,
    paired with a differently-chunked second arg, returns garbage for
    every null slot.  safe_coalesce must return the right answer on the
    exact failing layout (and pc.coalesce documents the hazard)."""
    from smqtk_indexing_ray.stages._util import safe_coalesce

    n = 2000
    doc = pa.chunked_array(
        [pa.array(np.arange(i * 100, (i + 1) * 100)) for i in range(20)])
    vals = np.arange(n) * 7
    mask = np.zeros(n, bool)
    mask[800:860] = True
    cid = pa.array(vals, pa.int64(), mask=mask)
    t = pa.table({"doc_id": doc, "cluster_id": cid})
    for off, ln in [(0, 2000), (703, 100), (740, 131), (777, 256)]:
        s = t.slice(off, ln)
        got = safe_coalesce(s["cluster_id"], s["doc_id"]).to_numpy(
            zero_copy_only=False)
        exp = np.where(mask[off:off + ln], np.arange(off, off + ln),
                       vals[off:off + ln])
        np.testing.assert_array_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
class TestBroadcastAttach:
    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("fill", [False, True])
    def test_matches_pandas_merge(self, seed, fill):
        import ray.data as rd
        from smqtk_indexing_ray.stages.attach import broadcast_attach

        rows, payload = _mk(seed)
        payload = payload.select(["k", "p1"])
        out = broadcast_attach(
            rd.from_arrow(rows).repartition(5),
            rd.from_arrow(payload).repartition(3).materialize(),
            key="k", payload_col="p1", fill_missing_with_key=fill,
        ).to_pandas().sort_values(["k", "val"], ignore_index=True)
        want = rows.to_pandas().merge(payload.to_pandas(), on="k",
                                      how="left")
        if fill:
            want["p1"] = want.p1.fillna(want.k)
        want = want.sort_values(["k", "val"], ignore_index=True)
        assert len(out) == len(want)
        np.testing.assert_array_equal(out.k, want.k)
        np.testing.assert_array_equal(
            out.p1.fillna(-1).astype(np.int64),
            want.p1.fillna(-1).astype(np.int64))
        if fill:
            assert not out.p1.isna().any()

    def test_empty_payload(self):
        import ray.data as rd
        from smqtk_indexing_ray.stages.attach import broadcast_attach

        rows, payload = _mk(7, n_rows=60)
        empty = payload.select(["k", "p1"]).slice(0, 0)
        out = broadcast_attach(
            rd.from_arrow(rows), rd.from_arrow(empty).materialize(),
            key="k", payload_col="p1").to_pandas()
        assert len(out) == len(rows) and out.p1.isna().all()
        out2 = broadcast_attach(
            rd.from_arrow(rows), rd.from_arrow(empty).materialize(),
            key="k", payload_col="p1",
            fill_missing_with_key=True).to_pandas()
        assert (out2.p1 == out2.k).all()
