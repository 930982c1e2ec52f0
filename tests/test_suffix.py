"""Suffix-array kernels + containment operators.

Mirrors the reference's kernel-golden test style
(/root/reference/tests/impls/lsh_functor/test_itq.py:255-336: known inputs
-> exact expected outputs)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

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

    def test_substring_containment_row_cap_fires(self):
        from smqtk_indexing_ray.pipelines.suffix import substring_containment
        with pytest.raises(ValueError, match="cluster_containment"):
            substring_containment(self._docs(), max_rows=2)

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


class TestSuffixHypothesis:
    """Property-based fuzz vs naive oracles (the reference has no
    property tests; these pin the prefix-doubling SA, Kasai LCP, and the
    prev/next different-doc sweep against brute force)."""

    @given(st.lists(st.integers(min_value=0, max_value=3),
                    min_size=0, max_size=60))
    @settings(max_examples=60, deadline=None)
    def test_suffix_array_matches_sorted_suffixes(self, vals):
        import numpy as np
        from smqtk_indexing_ray.functions.suffix import suffix_array
        s = np.asarray(vals, dtype=np.int64)
        sa = suffix_array(s)
        want = sorted(range(len(s)), key=lambda i: tuple(s[i:]))
        assert list(sa) == want

    @given(st.lists(st.integers(min_value=0, max_value=2),
                    min_size=1, max_size=50))
    @settings(max_examples=60, deadline=None)
    def test_lcp_matches_naive(self, vals):
        import numpy as np
        from smqtk_indexing_ray.functions.suffix import (
            lcp_array, suffix_array)
        s = np.asarray(vals, dtype=np.int64)
        sa = suffix_array(s)
        lcp = lcp_array(s, sa)

        def naive(i, j):
            n = 0
            while (i + n < len(s) and j + n < len(s)
                   and s[i + n] == s[j + n]):
                n += 1
            return n

        for r in range(1, len(s)):
            assert lcp[r] == naive(int(sa[r]), int(sa[r - 1]))

    @given(st.lists(st.text(alphabet="abc", min_size=0, max_size=40),
                    min_size=2, max_size=5),
           st.integers(min_value=2, max_value=8))
    @settings(max_examples=40, deadline=None)
    def test_span_mask_matches_naive(self, texts, min_span):
        import numpy as np
        from smqtk_indexing_ray.functions.suffix import duplicated_span_mask
        bt = [t.encode() for t in texts]
        masks = duplicated_span_mask(bt, min_span=min_span)

        # naive: byte b of doc i is covered iff some window of length
        # min_span containing it occurs in another doc
        for i, t in enumerate(bt):
            want = np.zeros(len(t), dtype=bool)
            for st_ in range(0, max(len(t) - min_span + 1, 0)):
                sub = t[st_:st_ + min_span]
                if any(j != i and sub in o for j, o in enumerate(bt)):
                    want[st_:st_ + min_span] = True
            np.testing.assert_array_equal(masks[i], want,
                                          err_msg=f"doc {i}: {texts}")
