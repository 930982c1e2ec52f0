"""Multimodal plumbing: schema, determinism, explode layout.

The codec is a stub (no image/audio libs in this container); what these
tests pin down is the Ray-side contract — actor-pool stage signature,
fixed-size-list feature layout, batch behavior, retry-stable values."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _media_table(n=20):
    rng = np.random.default_rng(5)
    payloads = [rng.bytes(50 + int(rng.integers(0, 200))) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(["image" if i % 2 else "audio" for i in range(n)]),
        "payload": pa.array(payloads, pa.binary()),
    })


@pytest.mark.usefixtures("ray_session")
class TestMediaFeatures:
    def test_schema_and_rows(self):
        import ray.data as rd
        from smqtk_indexing_ray.stages.multimodal import (
            FEATURE_DIM, media_features)
        out = media_features(rd.from_arrow(_media_table())).to_pandas()
        assert len(out) == 20
        assert set(out.columns) == {"media_id", "kind", "n_bytes", "width",
                                    "height", "decoder", "feature"}
        assert (out.decoder == "fake").all()  # no codec libs here
        assert all(len(f) == FEATURE_DIM for f in out.feature)

    def test_deterministic(self):
        import ray.data as rd
        from smqtk_indexing_ray.stages.multimodal import media_features
        a = media_features(rd.from_arrow(_media_table())).to_pandas()
        b = media_features(rd.from_arrow(_media_table())).to_pandas()
        a = a.sort_values("media_id", ignore_index=True)
        b = b.sort_values("media_id", ignore_index=True)
        for fa, fb in zip(a.feature, b.feature):
            np.testing.assert_array_equal(fa, fb)

    def test_unit_norm_features(self):
        from smqtk_indexing_ray.stages.multimodal import MediaFeatureStage
        out = MediaFeatureStage()(_media_table())
        feats = np.array(out["feature"].to_pylist())
        np.testing.assert_allclose(
            np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)

    def test_frame_explode(self):
        import ray.data as rd
        from smqtk_indexing_ray.stages.multimodal import frame_samples
        out = frame_samples(rd.from_arrow(_media_table(6)),
                            frames_per_doc=4).to_pandas()
        assert len(out) == 24
        per = out.groupby("media_id").frame_idx.apply(sorted)
        assert all(list(v) == [0, 1, 2, 3] for v in per)

    def test_media_from_documents(self):
        import ray.data as rd
        from smqtk_indexing_ray.stages.multimodal import (
            media_features, media_from_documents)
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["hello world", "second doc", None]),
        }))
        out = media_features(media_from_documents(docs)).to_pandas()
        assert len(out) == 3
        assert out.set_index("media_id").loc[1, "n_bytes"] == len(b"hello world")

    def test_decode_meta_hashseed_deterministic(self):
        """width/height must be identical across processes with different
        PYTHONHASHSEED (VERDICT r1: builtin hash() violated the stage's
        value-stable-under-retries contract)."""
        import json
        import os
        import subprocess
        import sys

        prog = (
            "import json, sys; sys.path.insert(0, '/root/repo'); "
            "from smqtk_indexing_ray.stages.multimodal import "
            "_fake_decode_meta; "
            "w, h = _fake_decode_meta([b'payload-one', b'', b'abc' * 99]); "
            "print(json.dumps([w.tolist(), h.tolist()]))"
        )
        outs = []
        for seed in ("0", "12345"):
            env = dict(os.environ, PYTHONHASHSEED=seed)
            r = subprocess.run([sys.executable, "-c", prog], env=env,
                               capture_output=True, text=True, check=True)
            outs.append(json.loads(r.stdout))
        assert outs[0] == outs[1]


@pytest.mark.usefixtures("ray_session")
def test_media_dedup_exact_per_kind():
    """Byte-identical payloads cluster to the min media_id WITHIN a
    kind; the same bytes under a different kind stay separate; copy
    counts are exact; null payloads dedup as empty bytes."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.multimodal import media_dedup

    rows = [
        (0, "image", b"AAA"), (1, "image", b"AAA"), (2, "image", b"AAA"),
        (3, "audio", b"AAA"),              # same bytes, other kind
        (4, "image", b"BBB"),
        (5, "audio", None), (6, "audio", b""),   # null == empty
        (7, "video", b"CCC"),
    ]
    t = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
    })
    got = media_dedup(
        rd.from_arrow(t).repartition(3)).to_pandas().set_index(
        "media_id")
    assert list(got.loc[[0, 1, 2], "cluster_id"]) == [0, 0, 0]
    assert list(got.loc[[0, 1, 2], "n_copies"]) == [3, 3, 3]
    assert got.loc[3, "cluster_id"] == 3 and got.loc[3, "n_copies"] == 1
    assert got.loc[4, "cluster_id"] == 4
    assert got.loc[5, "cluster_id"] == 5 and got.loc[6, "cluster_id"] == 5
    assert got.loc[5, "n_copies"] == 2
    assert got.loc[7, "cluster_id"] == 7


def test_media_hash_lanes_independent():
    """The (h1, h2) exact-dedup key must carry 128 bits: h2 is an
    INDEPENDENT keyed hash of the payload, not a function of h1
    (ADVICE r3: h2 = splitmix64(h1 ^ const) left only 64 bits, so any
    h1 collision silently collided the full key)."""
    from smqtk_indexing_ray.functions.hashing import splitmix64
    from smqtk_indexing_ray.stages.multimodal import (
        _H2_SEED,
        _bytes_hash64,
    )

    payloads = [b"", b"a", b"payload-one", b"abc" * 99, bytes(range(256))]
    for p in payloads:
        h1 = np.uint64(_bytes_hash64(p))
        h2 = np.uint64(_bytes_hash64(p, seed=_H2_SEED))
        assert h1 != h2
        # not derivable via the old lane-2 construction (or trivial mixes)
        with np.errstate(over="ignore"):
            assert h2 != splitmix64(
                h1 ^ np.uint64(0x9E3779B97F4A7C15))[()]
            assert h2 != splitmix64(np.uint64([h1]))[0]
    # seed=0 preserves the historical unkeyed values (golden)
    assert _bytes_hash64(b"payload-one") == _bytes_hash64(
        b"payload-one", seed=np.uint64(0))
    # distinct payloads keep distinct lane-2 values
    lane2 = {_bytes_hash64(p, seed=_H2_SEED) for p in payloads}
    assert len(lane2) == len(payloads)
