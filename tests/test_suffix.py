"""Suffix-array kernels + containment operators.

Mirrors the reference's kernel-golden test style
(/root/reference/tests/impls/lsh_functor/test_itq.py:255-336: known inputs
-> exact expected outputs)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from smqtk_indexing_ray.functions.suffix import (
    duplicated_span_mask,
    lcp_array,
    suffix_array,
)


class TestSuffixKernels:
    def test_banana_golden(self):
        s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
        sa = suffix_array(s)
        assert [bytes(s[i:].astype(np.uint8)) for i in sa] == sorted(
            b"banana"[i:] for i in range(6))
        assert list(lcp_array(s, sa)) == [0, 1, 3, 0, 0, 2]

    def test_input_not_mutated(self):
        s = np.frombuffer(b"mississippi", dtype=np.uint8).astype(np.int64)
        before = s.copy()
        suffix_array(s)
        np.testing.assert_array_equal(s, before)

    def test_random_vs_naive(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            s = rng.integers(0, 4, size=200).astype(np.int64)
            sa = suffix_array(s)
            naive = sorted(range(len(s)), key=lambda i: tuple(s[i:]))
            np.testing.assert_array_equal(sa, naive)

    def test_empty(self):
        assert len(suffix_array(np.empty(0, np.int64))) == 0

    def test_span_mask(self):
        shared = b"the quick brown fox jumps over the lazy dog"
        texts = [shared, b"pre " + shared + b" post", b"totally different"]
        masks = duplicated_span_mask(texts, min_span=10)
        assert masks[0].all()
        assert masks[1].mean() > 0.7
        assert not masks[2].any()

    def test_span_does_not_cross_documents(self):
        # halves live in different docs; no shared span within one doc
        texts = [b"aaaaaaaaaabbbbbbbbbb", b"aaaaaaaaaa", b"bbbbbbbbbb"]
        masks = duplicated_span_mask(texts, min_span=10)
        assert masks[1].all() and masks[2].all()
        assert masks[0].all()  # both halves covered, separately


@pytest.mark.usefixtures("ray_session")
class TestContainmentOps:
    def _docs(self):
        import ray.data as rd
        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "alpha beta gamma delta",
                "xx alpha beta gamma delta yy",          # contains doc 1
                "zz alpha beta gamma delta ww",          # contains doc 1
                "completely unrelated words here",
            ]),
        })
        return rd.from_arrow(t)

    def test_substring_containment(self):
        from smqtk_indexing_ray.pipelines.suffix import substring_containment
        df = substring_containment(self._docs()).to_pandas()
        assert dict(zip(df.contained, df.container)) == {1: 2}

    def test_cluster_containment(self):
        import ray.data as rd
        from smqtk_indexing_ray.pipelines.suffix import cluster_containment
        t = pa.table({
            "doc_id": pa.array([1, 2, 4], pa.int64()),
            "cluster_id": pa.array([1, 1, 1], pa.int64()),
            "text": pa.array([
                "alpha beta gamma delta",
                "xx alpha beta gamma delta yy",
                "completely unrelated words here indeed",
            ]),
        })
        df = cluster_containment(rd.from_arrow(t), min_span=10).to_pandas()
        df = df.set_index("doc_id")
        assert df.loc[1, "contained_in"] == 2
        assert pa.compute.is_null(pa.scalar(df.loc[4, "contained_in"])) or \
            df.loc[4, "contained_in"] != df.loc[4, "contained_in"]  # NaN
        assert df.loc[1, "dup_span_frac"] == 1.0
        assert df.loc[4, "dup_span_frac"] == 0.0
