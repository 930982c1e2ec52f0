"""Content-defined chunking: kernel brute-force parity + pipeline
contracts (shift tolerance is the property under test)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from smqtk_indexing_ray.functions.cdc import (
    _GEAR,
    _PAD,
    cdc_cut_points,
    gear_hashes_padded,
)


def brute_gear(doc: bytes) -> np.ndarray:
    """Textbook gear recurrence h_i = (h_{i-1} << 1) + G[b_i] over the
    zero-left-padded stream — the definition the vectorized 64-tap
    kernel must reproduce exactly."""
    ext = b"\x00" * _PAD + doc
    out = np.empty(len(ext), np.uint64)
    h = np.uint64(0)
    with np.errstate(over="ignore"):
        for i, b in enumerate(ext):
            h = (h << np.uint64(1)) + _GEAR[b]
            out[i] = h
    return out[_PAD:]


class TestGearKernel:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(3)
        docs = [rng.integers(0, 256, n).astype(np.uint8).tobytes()
                for n in (1, 7, 64, 65, 300)]
        h, offs = gear_hashes_padded(docs)
        for i, d in enumerate(docs):
            got = h[offs[i]:offs[i] + len(d)]
            assert (got == brute_gear(d)).all(), len(d)

    def test_batch_layout_independent(self):
        """A document's hashes must not depend on its neighbors in the
        batch (the zero-sentinel gap guarantees window purity)."""
        rng = np.random.default_rng(9)
        doc = rng.integers(0, 256, 200).astype(np.uint8).tobytes()
        other = rng.integers(0, 256, 500).astype(np.uint8).tobytes()
        h1, o1 = gear_hashes_padded([doc])
        h2, o2 = gear_hashes_padded([other, doc, other])
        a = h1[o1[0]:o1[0] + len(doc)]
        b = h2[o2[1]:o2[1] + len(doc)]
        assert (a == b).all()

    def test_empty_stream(self):
        h, offs = gear_hashes_padded([b"", b"ab"])
        assert len(offs) == 2
        assert (h[offs[1]:offs[1] + 2] == brute_gear(b"ab")).all()


class TestCutPoints:
    def _chunks(self, doc: bytes, **kw):
        h, offs = gear_hashes_padded([doc])
        ends = cdc_cut_points(h[offs[0]:offs[0] + len(doc)], **kw)
        starts = np.concatenate([[0], ends[:-1] + 1])
        return starts, ends

    def test_size_bounds_and_cover(self):
        rng = np.random.default_rng(5)
        doc = rng.integers(0, 256, 5000).astype(np.uint8).tobytes()
        starts, ends = self._chunks(doc, mask_bits=6, min_size=32,
                                    max_size=256)
        sizes = ends - starts + 1
        assert (sizes[:-1] >= 32).all() and (sizes <= 256).all()
        # chunks tile the document exactly
        assert starts[0] == 0 and ends[-1] == len(doc) - 1
        assert (starts[1:] == ends[:-1] + 1).all()

    def test_shift_tolerance(self):
        """Inserting a prefix must leave the downstream chunk set
        intact — the CDC property byte-offset shingling lacks."""
        rng = np.random.default_rng(11)
        doc = rng.integers(0, 256, 3000).astype(np.uint8).tobytes()
        pre = rng.integers(0, 256, 137).astype(np.uint8).tobytes()
        kw = dict(mask_bits=6, min_size=32, max_size=256)
        s1, e1 = self._chunks(doc, **kw)
        s2, e2 = self._chunks(pre + doc, **kw)
        set1 = {doc[a:b + 1] for a, b in zip(s1, e1)}
        set2 = {(pre + doc)[a:b + 1] for a, b in zip(s2, e2)}
        shared = len(set1 & set2)
        assert shared / len(set1) >= 0.8

    def test_max_size_forced_cut(self):
        # constant bytes -> gear hash never hits the mask -> every cut
        # is the forced max_size cut except the tail
        doc = b"\x41" * 1000
        starts, ends = self._chunks(doc, mask_bits=16, min_size=32,
                                    max_size=100)
        sizes = ends - starts + 1
        assert (sizes[:-1] == 100).all()


@pytest.mark.usefixtures("ray_session")
class TestCdcChunkStats:
    def _run(self, texts, ids=None, parts=3, **kw):
        import ray.data as rd

        from smqtk_indexing_ray.pipelines.cdc import cdc_chunk_stats
        n = len(texts)
        ids = ids if ids is not None else list(range(n))
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })).repartition(parts)
        return cdc_chunk_stats(ds, **kw).to_pandas().set_index("doc_id")

    def test_exact_dups_and_uniques(self):
        rng = np.random.default_rng(2)
        words = ["alpha", "beta", "gamma", "delta", "eps"]
        uniq = [" ".join(rng.choice(words, 60)) + f" tail{i}" * 3
                for i in range(6)]
        dup = " ".join(rng.choice(words, 80))
        texts = uniq + [dup, dup]
        got = self._run(texts)
        assert got.loc[6, "dup_byte_frac"] == 1.0
        assert got.loc[7, "dup_byte_frac"] == 1.0
        assert got.loc[6, "n_shared_chunks"] == got.loc[6, "n_chunks"]
        # totals are exact byte counts
        for i, t in enumerate(texts):
            assert got.loc[i, "total_bytes"] == len(t.encode())

    def test_embedded_article_detected_despite_shift(self):
        """A syndicated article pasted at a different offset inside
        unique wrappers still shows high dup_byte_frac in BOTH docs."""
        rng = np.random.default_rng(7)
        art = " ".join(rng.choice(["lorem", "ipsum", "dolor", "sit"],
                                  300))
        w1 = " ".join(rng.choice(["aaa", "bbb"], 40))
        w2 = " ".join(rng.choice(["ccc", "ddd"], 90))
        got = self._run([w1 + " " + art, w2 + " " + art, "zz " * 50])
        assert got.loc[0, "dup_byte_frac"] > 0.5
        assert got.loc[1, "dup_byte_frac"] > 0.5
        assert got.loc[2, "dup_byte_frac"] == 0.0

    def test_within_doc_repeat_is_not_shared(self):
        block = "qq " * 120
        got = self._run([block + block, "unrelated " * 40])
        # the repeated block collides only within doc 0 -> not shared
        assert got.loc[0, "dup_byte_frac"] == 0.0

    def test_deterministic_across_partitioning(self):
        rng = np.random.default_rng(13)
        texts = [" ".join(rng.choice(["x", "yy", "zzz", "w"], 100))
                 for _ in range(40)]
        a = self._run(texts, parts=2)
        b = self._run(texts, parts=9)
        assert a.sort_index().equals(b.sort_index())

    def test_empty_docs_omitted(self):
        got = self._run(["hello world " * 20, "", None])
        assert list(got.index) == [0]


class TestCutPointGuards:
    def test_min_size_zero_raises(self):
        with pytest.raises(ValueError, match="min_size"):
            cdc_cut_points(np.zeros(10, np.uint64), mask_bits=6,
                           min_size=0, max_size=100)

    def test_max_below_min_raises(self):
        with pytest.raises(ValueError, match="min_size"):
            cdc_cut_points(np.zeros(10, np.uint64), mask_bits=6,
                           min_size=50, max_size=10)

    def test_mask_bits_bounds(self):
        for bad in (0, 64, -1):
            with pytest.raises(ValueError, match="mask_bits"):
                cdc_cut_points(np.zeros(10, np.uint64), mask_bits=bad,
                               min_size=4, max_size=8)
