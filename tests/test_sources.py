"""Ingestion readers + IVF ANN recall."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
class TestReadPages:
    def _write_parquet(self, tmp_path, drop=()):
        t = pa.table({
            "doc_id": pa.array([10, 11], pa.int64()),
            "url": pa.array(["u/a", "u/b"]),
            "warc_ts": pa.array([1, 2], pa.timestamp("us")),
            "html": pa.array([b"<p>x</p>", None], pa.binary()),
            "text": pa.array(["x", "y"]),
            "lang": pa.array(["en", "de"]),
        })
        t = t.drop_columns(list(drop))
        p = str(tmp_path / "pages.parquet")
        pq.write_table(t, p)
        return p

    def test_parquet_full_schema(self, tmp_path):
        from smqtk_indexing_ray.sources.ingest import PAGES_SCHEMA, read_pages
        ds = read_pages(self._write_parquet(tmp_path))
        df = ds.to_pandas()
        assert list(df.columns) == [f.name for f in PAGES_SCHEMA]
        assert sorted(df.doc_id) == [10, 11]

    def test_parquet_missing_optional_columns(self, tmp_path):
        from smqtk_indexing_ray.sources.ingest import read_pages
        p = self._write_parquet(tmp_path, drop=("html", "lang"))
        df = read_pages(p).to_pandas()
        assert df.html.isna().all() and df.lang.isna().all()
        assert (df.text == ["x", "y"]).all()

    def test_jsonl_with_structural_ids(self, tmp_path):
        from smqtk_indexing_ray.sources.ingest import read_pages
        p = str(tmp_path / "pages.jsonl")
        with open(p, "w") as f:
            for i in range(5):
                f.write(json.dumps({"url": f"u/{i}", "text": f"doc {i}"})
                        + "\n")
        df = read_pages(p, format="jsonl").to_pandas()
        assert len(df) == 5
        assert df.doc_id.nunique() == 5          # structural, unique
        assert df.url.nunique() == 5

    def test_missing_required_raises(self, tmp_path):
        from smqtk_indexing_ray.sources.ingest import read_pages
        p = str(tmp_path / "bad.parquet")
        pq.write_table(pa.table({"body": pa.array(["x"])}), p)
        with pytest.raises(ValueError, match="required"):
            read_pages(p)

    def test_feeds_pipeline(self, tmp_path):
        import ray.data as rd
        from smqtk_indexing_ray.config import DedupConfig
        from smqtk_indexing_ray.pipelines.dedup import dedup_pipeline
        from smqtk_indexing_ray.sources.ingest import read_pages
        from smqtk_indexing_ray.sources.pages import (
            PagesSpec, generate_pages_table)
        p = str(tmp_path / "gen.parquet")
        pq.write_table(generate_pages_table(PagesSpec(n_docs=200, seed=9)), p)
        res = dedup_pipeline(read_pages(p), DedupConfig(
            signature_concurrency=2, batch_size=128), num_partitions=4)
        assert res.output.count() == 200


@pytest.mark.usefixtures("ray_session")
class TestIvf:
    def test_recall_vs_brute_force(self):
        import ray.data as rd
        from smqtk_indexing_ray.pipelines.ann import brute_force_topk, ivf_topk
        rng = np.random.default_rng(7)
        # clustered data so IVF lists are meaningful
        centers = rng.standard_normal((4, 16)) * 3
        m = np.concatenate([
            centers[i % 4] + rng.standard_normal(16) * 0.5
            for i in range(200)]).reshape(200, 16).astype(np.float32)
        emb = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array([list(r) for r in m],
                                  pa.list_(pa.float32())),
        }))
        bf = brute_force_topk(emb, n_queries=8, k=5).to_pandas()
        ivf = ivf_topk(emb, n_queries=8, k=5, n_lists=8,
                       n_probe=4).to_pandas()
        hits = 0
        for q in range(8):
            want = set(bf[bf.query_id == q].neighbor_id)
            got = set(ivf[ivf.query_id == q].neighbor_id)
            hits += len(want & got)
        assert hits / (8 * 5) >= 0.8             # n_probe=4/8 lists

    def test_deterministic(self):
        import ray.data as rd
        from smqtk_indexing_ray.pipelines.ann import ivf_topk
        rng = np.random.default_rng(1)
        m = rng.standard_normal((100, 8)).astype(np.float32)
        emb = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(100, dtype=np.int64)),
            "embedding": pa.array([list(r) for r in m],
                                  pa.list_(pa.float32())),
        }))
        a = ivf_topk(emb, n_queries=4, k=3).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True)
        b = ivf_topk(emb, n_queries=4, k=3).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True)
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestMrpt:
    def _emb(self, m):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.array([list(r) for r in m],
                                  pa.list_(pa.float32())),
        }))

    def test_recall_vs_bruteforce(self):
        from smqtk_indexing_ray.pipelines.ann import brute_force_topk, mrpt_topk
        rng = np.random.default_rng(11)
        centers = rng.standard_normal((4, 16)) * 3
        m = np.concatenate([
            centers[i % 4] + rng.standard_normal(16) * 0.5
            for i in range(200)]).reshape(200, 16).astype(np.float32)
        emb = self._emb(m)
        bf = brute_force_topk(emb, n_queries=8, k=5).to_pandas()
        mr = mrpt_topk(emb, n_queries=8, k=5, n_trees=8, depth=3).to_pandas()
        hits = 0
        for q in range(8):
            want = set(bf[bf.query_id == q].neighbor_id)
            got = set(mr[mr.query_id == q].neighbor_id)
            hits += len(want & got)
        assert hits / (8 * 5) >= 0.8

    def test_median_splits_balance_skewed_values(self):
        """The value-balanced property (reference mrpt.py:333-345): with a
        heavily skewed value distribution, median splits still produce
        near-uniform leaf occupancy — the skew control LSH banding lacks."""
        from smqtk_indexing_ray.pipelines.ann import (
            _mrpt_leaves, _normalize, mrpt_fit_trees)
        rng = np.random.default_rng(3)
        # skew bomb: 90% of vectors in a tight cloud, 10% spread out
        tight = rng.standard_normal((900, 8)) * 0.01 + 5.0
        wide = rng.standard_normal((100, 8)) * 4.0
        m = np.concatenate([tight, wide]).astype(np.float32)
        emb = self._emb(m)
        depth = 3
        bases, thr = mrpt_fit_trees(emb, n_trees=4, depth=depth, seed=0)
        mn = _normalize(m.astype(np.float64))
        for t in range(4):
            leaves = _mrpt_leaves(mn, bases[t], thr[t], depth)
            counts = np.bincount(leaves, minlength=1 << depth)
            # every leaf holds between 1/4x and 4x the uniform share
            assert counts.max() <= 4 * len(m) / (1 << depth)
            assert counts.min() >= len(m) / (1 << depth) / 4

    def test_deterministic(self):
        from smqtk_indexing_ray.pipelines.ann import mrpt_topk
        rng = np.random.default_rng(2)
        m = rng.standard_normal((100, 8)).astype(np.float32)
        emb = self._emb(m)
        a = mrpt_topk(emb, n_queries=4, k=3).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True)
        b = mrpt_topk(emb, n_queries=4, k=3).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True)
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestQuantize:
    def test_matches_bruteforce(self):
        """Codes/digests vs a plain numpy reimplementation, including a
        constant dimension (mx == mn -> code 0, zero error) and blocks
        split so the min/max partials must reduce across batches."""
        import ray.data as rd

        from smqtk_indexing_ray.functions.metrics import round6
        from smqtk_indexing_ray.pipelines.ann import quantize_embeddings
        rng = np.random.default_rng(3)
        n, d = 50, 6
        m = rng.standard_normal((n, d)).astype(np.float32)
        m[:, 2] = 1.5                       # constant dimension
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(r) for r in m],
                                  pa.list_(pa.float32())),
        })).repartition(5)
        got = quantize_embeddings(ds).to_pandas().sort_values(
            "vec_id", ignore_index=True)
        x = m.astype(np.float64)
        mn, mx = x.min(axis=0), x.max(axis=0)
        rng_ = mx - mn
        live = rng_ > 0
        q = np.where(live[None, :],
                     np.clip(np.floor((x - mn) * 256.0
                                      / np.where(live, rng_, 1.0)),
                             0, 255), 0.0)
        deq = mn + (q + 0.5) * rng_ / 256.0
        err = np.where(live[None, :], np.abs(x - deq), 0.0)
        qi = q.astype(np.int64)
        assert list(got.n_dims) == [d] * n
        assert list(got.code_sum) == list(qi.sum(axis=1))
        assert list(got.code_min) == list(qi.min(axis=1))
        assert list(got.code_max) == list(qi.max(axis=1))
        assert list(got.max_abs_err) == list(round6(err.max(axis=1)))
        # constant dim coded 0 everywhere, and it never drives the error
        assert (qi[:, 2] == 0).all() and (err[:, 2] == 0).all()

    def test_extremes_hit_code_bounds(self):
        """The per-dim min codes to 0 and the max to levels-1."""
        import ray.data as rd

        from smqtk_indexing_ray.pipelines.ann import quantize_embeddings
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0], [1.0]], pa.list_(pa.float32())),
        }))
        got = quantize_embeddings(ds).to_pandas().set_index("vec_id")
        assert got.loc[0, "code_min"] == 0 and got.loc[0, "code_max"] == 0
        assert got.loc[1, "code_min"] == 255 and got.loc[1, "code_max"] == 255


@pytest.mark.usefixtures("ray_session")
def test_filtered_ann_topk_matches_bruteforce():
    """Label filter honored exactly: every neighbor shares the query's
    label, self excluded, ranking matches a numpy reimplementation."""
    import ray.data as rd

    from smqtk_indexing_ray.functions.metrics import round6
    from smqtk_indexing_ray.pipelines.ann import filtered_ann_topk
    rng = np.random.default_rng(5)
    n, d = 60, 8
    m = rng.standard_normal((n, d)).astype(np.float32)
    labels = (np.arange(n) % 3).astype(np.int32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(r) for r in m], pa.list_(pa.float32())),
        "label": pa.array(labels),
    })).repartition(4)
    k = 5
    got = filtered_ann_topk(ds, n_queries=6, k=k).to_pandas()
    x = m.astype(np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    for q in range(6):
        mine = got[got.query_id == q].sort_values("rank")
        cand = np.flatnonzero((labels == labels[q])
                              & (np.arange(n) != q))
        order = cand[np.lexsort((cand, -sims[q, cand]))][:k]
        assert list(mine.neighbor_id) == list(order)
        assert list(mine.cos_sim) == list(round6(sims[q, order]))
        assert (labels[mine.neighbor_id.to_numpy()] == labels[q]).all()


@pytest.mark.usefixtures("ray_session")
def test_quantize_empty_tail_row_does_not_corrupt_neighbor():
    """Regression: an empty-embedding row at the END of a batch must
    not truncate the preceding vector's reduceat segment."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.ann import quantize_embeddings
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.0, 1.0], [1.0, 0.25], []],
                              pa.list_(pa.float32())),
    }))
    got = quantize_embeddings(ds).to_pandas().set_index("vec_id")
    # dim mins/maxes: dim0 in {0,1}, dim1 in {0.25,1}
    assert got.loc[0, "code_sum"] == 0 + 255      # (min, max) codes
    assert got.loc[1, "code_max"] == 255 and got.loc[1, "code_min"] == 0
    assert got.loc[2, "n_dims"] == 0
    assert got.loc[2, "code_sum"] == 0 and got.loc[2, "code_max"] == 0
    assert got.loc[2, "max_abs_err"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_quantize_random_with_empties_property():
    """Randomized property check: arbitrary batches with empty vectors
    scattered anywhere must match the plain-numpy digest, for several
    seeds and partitionings (guards the reduceat segment logic)."""
    import ray.data as rd

    from smqtk_indexing_ray.functions.metrics import round6
    from smqtk_indexing_ray.pipelines.ann import quantize_embeddings
    for seed, parts in [(0, 1), (1, 3), (2, 7)]:
        rng = np.random.default_rng(seed)
        n, d = 40, 5
        rows = []
        for i in range(n):
            if rng.random() < 0.25:
                rows.append([])                     # empty anywhere
            else:
                rows.append(list(rng.standard_normal(d).astype(
                    np.float32)))
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(rows, pa.list_(pa.float32())),
        })).repartition(parts)
        got = quantize_embeddings(ds).to_pandas().sort_values(
            "vec_id", ignore_index=True)
        full = [r for r in rows if r]
        if not full:
            continue
        x = np.array(full, np.float64)
        mn, mx = x.min(axis=0), x.max(axis=0)
        rng_ = mx - mn
        live = rng_ > 0
        for i, r in enumerate(rows):
            if not r:
                assert got.loc[i, "code_sum"] == 0
                assert got.loc[i, "n_dims"] == 0
                assert got.loc[i, "max_abs_err"] == 0.0
                continue
            xr = np.array(r, np.float64)
            q = np.where(live, np.clip(np.floor(
                (xr - mn) * 256.0 / np.where(live, rng_, 1.0)),
                0, 255), 0.0)
            deq = mn + (q + 0.5) * rng_ / 256.0
            err = np.where(live, np.abs(xr - deq), 0.0)
            qi = q.astype(np.int64)
            assert got.loc[i, "code_sum"] == qi.sum()
            assert got.loc[i, "code_min"] == qi.min()
            assert got.loc[i, "code_max"] == qi.max()
            assert got.loc[i, "max_abs_err"] == float(
                round6(np.array(err.max())))


@pytest.mark.usefixtures("ray_session")
class TestKmeans:
    @staticmethod
    def _corpus(n=80, d=5, seed=11):
        rng = np.random.default_rng(seed)
        m = rng.standard_normal((n, d)).astype(np.float32)
        return m

    @staticmethod
    def _brute(m, k, levels=256):
        """Plain numpy reimplementation: quantize, seed with the k
        lowest vec_ids (= first k rows), exact int squared-L2 argmin
        with lowest-seed tiebreak."""
        x = m.astype(np.float64)
        mn, mx = x.min(axis=0), x.max(axis=0)
        rng_ = mx - mn
        live = rng_ > 0
        q = np.where(live[None, :],
                     np.clip(np.floor((x - mn) * float(levels)
                                      / np.where(live, rng_, 1.0)),
                             0, levels - 1), 0.0).astype(np.int64)
        cent = q[:k]
        d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d2, axis=1)
        return q, best, d2[np.arange(len(q)), best]

    def test_assign_matches_bruteforce(self):
        """Assignments and exact int64 distances vs the numpy
        reimplementation, with blocks split so the seed scan and the
        min/max fold must merge across batches."""
        import ray.data as rd

        from smqtk_indexing_ray.pipelines.ann import kmeans_assign
        m = self._corpus()
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.array([list(r) for r in m],
                                  pa.list_(pa.float32())),
        })).repartition(7)
        got = kmeans_assign(ds, n_clusters=4).to_pandas().sort_values(
            "vec_id", ignore_index=True)
        _, best, d2 = self._brute(m, 4)
        assert list(got.cluster) == list(best.astype(np.int64))
        assert list(got.dist2) == list(d2)
        # the seeds themselves sit at distance 0 in their own cluster
        assert list(got.dist2[:4]) == [0, 0, 0, 0]

    def test_update_matches_bruteforce(self):
        """Lloyd-step centroids are the exact per-cluster per-dim code
        means; cluster populations sum to n."""
        import ray.data as rd

        from smqtk_indexing_ray.pipelines.ann import kmeans_update
        m = self._corpus(n=60, d=4, seed=13)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.array([list(r) for r in m],
                                  pa.list_(pa.float32())),
        })).repartition(5)
        got = kmeans_update(ds, n_clusters=3).to_pandas().sort_values(
            ["cluster", "dim"], ignore_index=True)
        q, best, _ = self._brute(m, 3)
        rows = []
        for c in sorted(set(best)):
            sel = q[best == c]
            for dim in range(q.shape[1]):
                rows.append((c, dim, sel[:, dim].sum() / (len(sel) * 1.0),
                             len(sel)))
        assert len(got) == len(rows)
        for (c, dim, cent, n), (_, r) in zip(rows, got.iterrows()):
            assert r.cluster == c and r.dim == dim and r.n_vecs == n
            assert r.centroid == cent
        assert got.groupby("cluster").n_vecs.first().sum() == len(m)

    def test_ragged_embeddings_raise(self):
        import ray.data as rd

        from smqtk_indexing_ray.pipelines.ann import kmeans_assign
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([[0.0, 1.0], [1.0], [0.5, 0.5]],
                                  pa.list_(pa.float32())),
        }))
        with pytest.raises(Exception, match="ragged"):
            kmeans_assign(ds, n_clusters=2).to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestKmeansFit:
    @staticmethod
    def _ds(n=120, d=6, seed=29, n_parts=7):
        import ray.data as rd
        rng = np.random.default_rng(seed)
        # three well-separated blobs so Lloyd actually moves
        centers = rng.standard_normal((3, d)) * 8.0
        m = (centers[rng.integers(0, 3, n)]
             + rng.standard_normal((n, d))).astype(np.float32)
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(r) for r in m],
                                  pa.list_(pa.float32())),
        })).repartition(n_parts), m

    def test_inertia_beats_one_step_and_converges(self):
        """Iterated Lloyd's total inertia is <= the single-assignment
        inertia of the same seeds, populations sum to n, and the run
        reaches a fixpoint before max_iters on blobs."""
        from smqtk_indexing_ray.pipelines.ann import kmeans_fit
        ds, m = self._ds()
        out = kmeans_fit(ds, n_clusters=3, max_iters=25).to_pandas()
        assert out.n_vecs.sum() == len(m)
        assert (out.n_iters < 25).all()
        total = out.inertia.sum()

        # brute one-step inertia with the same lowest-id float seeds
        x = m.astype(np.float64)
        cent = x[:3]
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        one_step = d2.min(axis=1).sum()
        assert total <= one_step + 1e-9

    def test_deterministic_per_layout_stable_across_layouts(self):
        """Same layout -> byte-identical output (the fsum fold removes
        arrival-order nondeterminism); different layouts -> identical
        ints, floats to ~1e-12 (per-batch partials round differently,
        inherent to float k-means)."""
        from smqtk_indexing_ray.pipelines.ann import kmeans_fit
        ds_a, m = self._ds(n_parts=3)
        ds_b, _ = self._ds(n_parts=11)
        a1 = kmeans_fit(ds_a, n_clusters=3).to_pandas()
        a2 = kmeans_fit(ds_a, n_clusters=3).to_pandas()
        assert a1.equals(a2)
        b = kmeans_fit(ds_b, n_clusters=3).to_pandas()
        for col in ("cluster", "n_vecs", "n_iters"):
            assert list(a1[col]) == list(b[col])
        assert np.allclose(a1.inertia, b.inertia, rtol=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_label_scatter_matches_bruteforce():
    """Per-label quantized scatter vs plain numpy: exact integer
    moments, computational-formula variance, constant dims at var 0."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.ann import label_scatter

    rng = np.random.default_rng(47)
    n, d = 90, 5
    m = rng.standard_normal((n, d)).astype(np.float32)
    m[:, 3] = 2.5                          # constant dim -> var 0
    labels = rng.integers(0, 3, n).astype(np.int32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(r) for r in m],
                              pa.list_(pa.float32())),
        "label": pa.array(labels),
    })).repartition(6)
    got = label_scatter(ds).to_pandas().sort_values(
        ["label", "dim"], ignore_index=True)

    x = m.astype(np.float64)
    mn, mx = x.min(axis=0), x.max(axis=0)
    rng_ = mx - mn
    live = rng_ > 0
    q = np.where(live[None, :],
                 np.clip(np.floor((x - mn) * 256.0
                                  / np.where(live, rng_, 1.0)),
                         0, 255), 0.0).astype(np.int64)
    i = 0
    for lab in sorted(set(labels)):
        sel = q[labels == lab]
        nn = len(sel)
        for dim in range(d):
            r = got.iloc[i]
            s, ss = sel[:, dim].sum(), (sel[:, dim] ** 2).sum()
            assert (r.label, r.dim, r.n_vecs) == (lab, dim, nn)
            assert r.mean_code == s / (nn * 1.0)
            assert r.var_code == (nn * ss - s * s) / (nn * nn * 1.0)
            i += 1
    # constant dim has zero variance in every label
    const = got[got.dim == 3]
    assert (const.var_code == 0.0).all()


@pytest.mark.usefixtures("ray_session")
def test_label_scatter_rejects_reserved_label():
    """-1 is reserved as the null-label sentinel: a genuine -1 label
    would silently merge with the null group, so it must raise."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.ann import label_scatter

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.0, 1.0], [1.0, 0.0], [0.5, 0.5]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, -1, None], pa.int32()),
    }))
    with pytest.raises(Exception, match="reserved"):
        label_scatter(ds).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_label_scatter_null_labels_fold_to_sentinel():
    """Null labels land in the -1 group (repo-wide null-group-key
    convention; the registered oracle mirrors it via coalesce)."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.ann import label_scatter

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([[0.0, 1.0], [1.0, 0.0],
                               [0.5, 0.5], [0.25, 0.75]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, None, 0, None], pa.int32()),
    }))
    got = label_scatter(ds).to_pandas()
    assert set(got.label) == {-1, 0}
    assert (got[got.label == -1].n_vecs == 2).all()


@pytest.mark.usefixtures("ray_session")
class TestSemanticDedup:
    def _ds(self, m, ids=None, parts=4):
        import ray.data as rd
        n = len(m)
        if ids is None:
            ids = np.arange(n, dtype=np.int64)
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(r) for r in m],
                                  pa.list_(pa.float32())),
        })).repartition(parts)

    @staticmethod
    def _brute(m, ids, k, tau, levels=256):
        """Pure-numpy reference: quantize, assign to lowest-id seeds,
        dominated filter within cluster."""
        x = m.astype(np.float64)
        mn, mx = x.min(0), x.max(0)
        rng = mx - mn
        live = rng > 0
        q = np.where(live,
                     np.clip(np.floor((x - mn) * float(levels)
                                      / np.where(live, rng, 1.0)),
                             0, levels - 1), 0.0).astype(np.int64)
        order = np.argsort(ids)
        cent = q[order[:k]]
        cent_ids = ids[order[:k]]
        d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        cl = cent_ids[np.argmin(d2, 1)]
        keep = {}
        for c in set(cl):
            sel = np.flatnonzero(cl == c)
            sel = sel[np.argsort(ids[sel])]
            for i, si in enumerate(sel):
                dom = any(((q[si] - q[sj]) ** 2).sum() <= tau
                          for sj in sel[:i])
                keep[int(ids[si])] = (int(c), not dom)
        return keep

    def test_matches_bruteforce_with_planted_dups(self):
        from smqtk_indexing_ray.pipelines.ann import semantic_dedup
        rng = np.random.default_rng(13)
        centers = rng.standard_normal((4, 16)) * 3
        base = np.stack([centers[i % 4]
                         + rng.standard_normal(16) * 0.5
                         for i in range(60)])
        # plant near-dups: tiny perturbations of existing rows
        dups = base[:20] + rng.standard_normal((20, 16)) * 1e-3
        m = np.concatenate([base, dups]).astype(np.float32)
        ids = np.arange(len(m), dtype=np.int64)
        tau = 500
        got = semantic_dedup(self._ds(m), n_clusters=4,
                             tau=tau).to_pandas()
        want = self._brute(m, ids, 4, tau)
        assert len(got) == len(m)
        for r in got.itertuples():
            wc, wk = want[int(r.vec_id)]
            assert (r.cluster, bool(r.keep)) == (wc, wk), r.vec_id
        # the planted copies must actually be dropped
        dropped = set(got[~got.keep].vec_id)
        assert len(dropped & set(range(60, 80))) >= 18

    def test_lowest_id_always_kept_and_deterministic(self):
        from smqtk_indexing_ray.pipelines.ann import semantic_dedup
        rng = np.random.default_rng(5)
        m = rng.standard_normal((80, 8)).astype(np.float32)
        a = semantic_dedup(self._ds(m, parts=3), n_clusters=4,
                           tau=10_000).to_pandas().sort_values(
            "vec_id", ignore_index=True)
        b = semantic_dedup(self._ds(m, parts=7), n_clusters=4,
                           tau=10_000).to_pandas().sort_values(
            "vec_id", ignore_index=True)
        assert a.equals(b)
        # within every cluster the lowest vec_id survives
        for _, grp in a.groupby("cluster"):
            assert bool(grp.loc[grp.vec_id.idxmin(), "keep"])

    def test_cluster_cap_raises(self):
        from smqtk_indexing_ray.pipelines.ann import semantic_dedup
        rng = np.random.default_rng(2)
        m = rng.standard_normal((50, 4)).astype(np.float32)
        with pytest.raises(Exception, match="max_cluster"):
            semantic_dedup(self._ds(m), n_clusters=1, tau=0,
                           max_cluster=10).to_pandas()

    def test_empty_input(self):
        import ray.data as rd
        from smqtk_indexing_ray.pipelines.ann import (
            SEMANTIC_DEDUP_SCHEMA, semantic_dedup)
        empty = rd.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }))
        out = semantic_dedup(empty)
        assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_levels_gate():
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.ann import semantic_dedup
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.0, 1.0], [1.0, 0.0]],
                              pa.list_(pa.float32())),
    }))
    with pytest.raises(ValueError, match="levels"):
        semantic_dedup(ds, levels=512).to_pandas()
