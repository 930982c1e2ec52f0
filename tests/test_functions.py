"""Kernel goldens + property tests.

Analog of the reference's kernel math goldens: ITQ decision-boundary probes
(/root/reference/tests/impls/lsh_functor/test_itq.py:255-336) and
bit-packing goldens (/root/reference/tests/utils/test_bits.py:10-54).
Pinned values guard against silent changes to the seeded hash families —
any change invalidates every checkpoint, so a failing golden here is a
versioning event, not a tweak.
"""

import numpy as np
import pyarrow as pa
import pytest

from smqtk_indexing_ray.functions import (
    est_jaccard,
    extract_text_from_html,
    hamming_u64,
    hash_strings_u64,
    popcount_u64,
    shingle_flat,
    simhash_fingerprints,
    tokenize_flat,
)
from smqtk_indexing_ray.functions.hashing import grouped_arange, splitmix64
from smqtk_indexing_ray.functions.minhash import make_perms, minhash_signatures

DOG = "the quick brown fox jumps over the lazy dog"


def _sign(texts, k=4, num_perms=128, seed=42):
    tok, off = tokenize_flat(pa.array(texts))
    sh, soff = shingle_flat(tok, off, k)
    a, b = make_perms(num_perms, seed)
    return minhash_signatures(sh, soff, a, b), tok, off


class TestGoldens:
    def test_splitmix64(self):
        got = splitmix64(np.array([0, 1, 2], dtype=np.uint64))
        assert got.tolist() == [16294208416658607535, 10451216379200822465,
                                10905525725756348110]

    def test_hash_strings(self):
        got = hash_strings_u64(["a", "b", "a"])
        assert got.tolist() == [7662307786963288888, 15541520539892041105,
                                7662307786963288888]

    def test_hash_byte_segments(self):
        """The vectorized segmented kernel must hash each segment as a
        pure function of (bytes, seed): batch layout, neighbors, and
        position in the stream must not matter; empty segments are
        legal; seeds give independent lanes."""
        from smqtk_indexing_ray.functions.hashing import (
            hash_byte_segments_u64,
        )
        segs = [b"hello", b"", b"hello", b"world!!", b"h", b"\x00" * 9]
        data = np.frombuffer(b"".join(segs), np.uint8)
        offs = np.cumsum([0] + [len(s) for s in segs])
        got = hash_byte_segments_u64(data, offs)
        # per-segment independent recompute (layout-independence)
        solo = [hash_byte_segments_u64(
            np.frombuffer(s, np.uint8), np.array([0, len(s)]))[0]
            for s in segs]
        assert got.tolist() == [int(x) for x in solo]
        assert got[0] == got[2]                      # equal content
        assert len({int(x) for x in got}) == 5       # distinct content
        # a slice of the stream (non-zero base offset) hashes the same
        sub = hash_byte_segments_u64(data, offs[2:5])
        assert sub.tolist() == got.tolist()[2:4]
        # seeds are independent lanes
        lane2 = hash_byte_segments_u64(data, offs, seed=12345)
        assert all(int(a) != int(b) for a, b in zip(got, lane2))
        assert len(hash_byte_segments_u64(
            np.empty(0, np.uint8), np.array([0]))) == 0

    def test_token_and_shingle_hashes(self):
        tok, off = tokenize_flat(pa.array([DOG]))
        assert off.tolist() == [0, 9]
        assert tok[:4].tolist() == [7738842263208419907, 5764240097465916527,
                                    6422185371103110073, 8504026214635010953]
        sh, soff = shingle_flat(tok, off, 4)
        assert soff.tolist() == [0, 6]
        assert sh[:3].tolist() == [193165261187880244, 16245589985530828488,
                                   17483332477939388327]

    def test_minhash_golden(self):
        sig, _, _ = _sign([DOG])
        assert sig.shape == (1, 128) and sig.dtype == np.uint32
        assert sig[0, :6].tolist() == [370464130, 902984660, 466033121,
                                       21943112, 171302963, 805799444]

    def test_simhash_golden(self):
        tok, off = tokenize_flat(pa.array([DOG]))
        assert simhash_fingerprints(tok, off).tolist() == [7594657530157066859]


class TestTokenize:
    def test_empty_null_whitespace(self):
        tok, off = tokenize_flat(pa.array(["", None, "  ", "a  b\tc\nd "]))
        assert off.tolist() == [0, 0, 0, 0, 4]

    def test_lowercase_folding(self):
        t1, _ = tokenize_flat(pa.array(["Hello World"]))
        t2, _ = tokenize_flat(pa.array(["hello world"]))
        assert (t1 == t2).all()

    def test_shingle_short_doc(self):
        tok, off = tokenize_flat(pa.array(["a b c", "a b c d", "x"]))
        sh, soff = shingle_flat(tok, off, 4)
        assert np.diff(soff).tolist() == [0, 1, 0]

    def test_shingles_do_not_cross_docs(self):
        # same tokens split across two docs must not produce the shingle
        tok1, off1 = tokenize_flat(pa.array(["a b", "c d"]))
        sh1, _ = shingle_flat(tok1, off1, 4)
        assert len(sh1) == 0
        tok2, off2 = tokenize_flat(pa.array(["a b c d"]))
        sh2, _ = shingle_flat(tok2, off2, 4)
        assert len(sh2) == 1

    def test_grouped_arange(self):
        assert grouped_arange(np.array([2, 0, 3])).tolist() == [0, 1, 0, 1, 2]


class TestMinHash:
    def test_estimates_jaccard(self):
        base = ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 20).split()
        variant = list(base)
        variant[10] = "zzz"  # small perturbation
        other = [f"q{i}" for i in range(200)]
        sig, _, _ = _sign([" ".join(base), " ".join(variant), " ".join(other)])
        assert est_jaccard(sig[0:1], sig[1:2])[0] > 0.5
        assert est_jaccard(sig[0:1], sig[2:3])[0] < 0.1

    def test_identical_docs_identical_sigs(self):
        sig, _, _ = _sign([DOG, DOG])
        assert (sig[0] == sig[1]).all()

    def test_zero_shingle_sentinel(self):
        sig, _, _ = _sign(["a b", DOG])
        assert (sig[0] == np.uint32(0xFFFFFFFF)).all()
        assert not (sig[1] == np.uint32(0xFFFFFFFF)).all()

    def test_order_matters(self):
        sig, _, _ = _sign(["a b c d e f g h", "h g f e d c b a"])
        assert not (sig[0] == sig[1]).all()


class TestSimHash:
    def test_near_docs_low_hamming(self):
        base = " ".join(f"w{i}" for i in range(300))
        near = " ".join(f"w{i}" if i != 7 else "x" for i in range(300))
        far = " ".join(f"q{i}" for i in range(300))
        tok, off = tokenize_flat(pa.array([base, near, far]))
        fp = simhash_fingerprints(tok, off)
        assert hamming_u64(fp[0:1], fp[1:2])[0] <= 3
        assert hamming_u64(fp[0:1], fp[2:3])[0] > 10

    def test_empty_doc_zero(self):
        tok, off = tokenize_flat(pa.array(["", DOG, ""]))
        fp = simhash_fingerprints(tok, off)
        assert fp[0] == 0 and fp[2] == 0 and fp[1] != 0


class TestMetrics:
    def test_popcount(self):
        x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], dtype=np.uint64)
        assert popcount_u64(x).tolist() == [0, 1, 2, 64, 1]

    def test_hamming(self):
        a = np.array([0b1010, 0], dtype=np.uint64)
        b = np.array([0b0101, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
        assert hamming_u64(a, b).tolist() == [4, 64]

    def test_pack_bits_rows_matches_reference_big_endian(self):
        """Reference parity: bit 0 is the integer MSB
        (/root/reference/smqtk_indexing/utils/bits.py:4-20), so
        int.from_bytes(packed_row, 'big') == int(bitstring, 2)."""
        from smqtk_indexing_ray.functions.hashing import (
            pack_bits_rows, unpack_bits_rows)
        rng = np.random.default_rng(5)
        for bits in (8, 64, 128, 512):
            bools = rng.integers(0, 2, size=(7, bits)).astype(bool)
            packed = pack_bits_rows(bools)
            assert packed.shape == (7, bits // 8)
            for row, brow in zip(packed, bools):
                expect = int("".join("1" if b else "0" for b in brow), 2)
                assert int.from_bytes(row.tobytes(), "big") == expect
            np.testing.assert_array_equal(
                unpack_bits_rows(packed, bits), bools)

    def test_popcount_and_hamming_bytes(self):
        from smqtk_indexing_ray.functions.metrics import (
            hamming_bytes, popcount_bytes)
        rng = np.random.default_rng(6)
        a = rng.integers(0, 256, size=(20, 16)).astype(np.uint8)
        b = rng.integers(0, 256, size=(20, 16)).astype(np.uint8)
        # agree with the uint64 kernel on the same 128-bit payloads
        au = a.copy().view(np.uint64)
        bu = b.copy().view(np.uint64)
        expect = hamming_u64(au[:, 0], bu[:, 0]).astype(np.int64) + \
            hamming_u64(au[:, 1], bu[:, 1]).astype(np.int64)
        np.testing.assert_array_equal(hamming_bytes(a, b), expect)
        np.testing.assert_array_equal(
            popcount_bytes(a), hamming_bytes(a, np.zeros_like(a)))
        # broadcast form used by the wide top-k scan
        m = hamming_bytes(a[:, None, :], b[None, :, :])
        assert m.shape == (20, 20)
        np.testing.assert_array_equal(np.diagonal(m), expect)


class TestExtract:
    def test_pure_and_deterministic(self):
        html = b"<html><body><p>Hello  world</p>\n<div>again</div></body></html>"
        assert extract_text_from_html(html) == "Hello world again"
        assert extract_text_from_html(html) == extract_text_from_html(html)

    def test_none(self):
        assert extract_text_from_html(None) is None


def test_json_field_kernels():
    """Vectorized JSON extraction: strings, ints, nulls on absent /
    invalid / non-integer; the polars-free regex fallback agrees on
    the integer shape it supports."""
    import pyarrow as pa

    from smqtk_indexing_ray.functions import jsonf

    docs = pa.array(['{"k": 69, "s": "hi"}', '{"k": -3}', '{"j": 1}',
                     None, "not json", '{"k": 1.5}', '{"k": "9"}'])
    assert jsonf.json_field_str(docs, "$.s").to_pylist() == [
        "hi", None, None, None, None, None, None]
    # quoted integer strings round-trip (->> unquotes on both sides)
    assert jsonf.json_field_int64(docs, "k").to_pylist() == [
        69, -3, None, None, None, None, 9]
    # chunked input
    ch = pa.chunked_array([docs.slice(0, 3), docs.slice(3)])
    assert jsonf.json_field_int64(ch, "k").to_pylist() == [
        69, -3, None, None, None, None, 9]

    # fallback path (no polars): top-level ints only
    saved = jsonf._pl
    try:
        jsonf._pl = None
        got = jsonf.json_field_int64(
            pa.array(['{"k": 69}', '{"k": -3, "x": 1}', '{"j": 2}',
                      None]), "k")
        assert got.to_pylist() == [69, -3, None, None]
    finally:
        jsonf._pl = saved
