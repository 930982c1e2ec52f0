"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns; decode /
feature-extraction / frame-sampling are actor-pool ``map_batches`` stages
(model/codec load once per actor in ``__init__``).  The decode libraries
(PIL, soundfile, av) are NOT in this container, so the codec layer is
stubbed behind a deterministic fake (clearly marked in the ``decoder``
output column); everything Ray-side — schema, batch sizing, actor
signature, output layout — is real and tested.

Reference analog: the stateful-functor pattern of
/root/reference/smqtk_indexing/impls/lsh_functor/itq.py:209-237 (model
loaded once, applied per record), lifted to actor pools; payload bytes
never cross a shuffle — only ids + features do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from smqtk_indexing_ray.functions.hashing import splitmix64

FEATURE_DIM = 64

_FEAT_SCHEMA = pa.schema([
    ("media_id", pa.int64()), ("kind", pa.string()),
    ("n_bytes", pa.int64()), ("width", pa.int32()), ("height", pa.int32()),
    ("decoder", pa.string()),
    ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
])


# Seed of the second (independent) hash lane.  An arbitrary odd 64-bit
# constant — any fixed value works as long as it differs from lane 1's
# implicit seed of 0.
_H2_SEED = np.uint64(0xA24BAED4963EE407)


def _bytes_hash64(p: bytes, seed: np.uint64 = np.uint64(0)) -> int:
    """Value-stable 64-bit keyed hash of a byte string (splitmix64 word
    mix) — PYTHONHASHSEED-independent, so task retries / multi-process
    runs see identical values (unlike builtin ``hash``).  ``seed``
    mixes into every word of the stream, so hashes under distinct seeds
    are independent functions of the payload (NOT derivable from each
    other) — the same keyed-lane shape as ``_LK1``/``_LK2`` in
    ``pipelines/terms.py``.  ``seed=0`` reproduces the historical
    unkeyed values."""
    arr = np.frombuffer(p, dtype=np.uint8)
    pad = (-len(arr)) % 8
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
    words = arr.view(np.uint64)
    idx = np.arange(len(words), dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = splitmix64((words ^ seed) ^ splitmix64(idx + np.uint64(len(p)) + seed))
        acc = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return int(splitmix64(np.uint64([acc ^ seed]))[0])


def _fake_decode_meta(payloads: list[bytes | None]) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic stand-in for image decode: (width, height) derived
    from a payload hash.  Marked 'fake' in the output; swap for a real
    codec by subclassing :class:`MediaFeatureStage` and overriding
    ``_decode``."""
    h = np.array([_bytes_hash64(p) & 0xFFFF if p else 0 for p in payloads],
                 dtype=np.uint64)
    w = (64 + (h % np.uint64(1024))).astype(np.int32)
    ht = (64 + ((h >> np.uint64(5)) % np.uint64(1024))).astype(np.int32)
    return w, ht


def _payload_features(payloads: list[bytes | None], dim: int,
                      seed: int) -> np.ndarray:
    """Deterministic feature vector per payload: seeded mix of byte-block
    hashes (a stand-in for a real embedding model, value-stable under
    retries).  Vectorized over the byte stream of the whole batch."""
    out = np.zeros((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        if not p:
            continue
        arr = np.frombuffer(p, dtype=np.uint8)
        pad = (-len(arr)) % 8
        if pad:
            arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
        words = arr.view(np.uint64)
        idx = np.arange(len(words), dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(words ^ splitmix64(idx + np.uint64(seed)))
        buckets = (h % np.uint64(dim)).astype(np.int64)
        vals = ((h >> np.uint64(32)).astype(np.float32)
                / np.float32(2**31)) - np.float32(1.0)
        np.add.at(out[i], buckets, vals)
        nrm = float(np.linalg.norm(out[i]))
        if nrm > 0:
            out[i] /= nrm
    return out


class MediaFeatureStage:
    """Actor-pool stage: decode + feature-extract one batch of media rows.

    Constructor args are plain values (picklable); any heavyweight model
    state would be built HERE, once per actor.  STUB: no codec libraries
    in this container — ``self._decoder_name`` records what ran.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM, seed: int = 42):
        self.dim = feature_dim
        self.seed = seed
        try:  # real codec path, absent in this container
            import PIL.Image  # noqa: F401
            self._decoder_name = "pil"
        except ImportError:
            self._decoder_name = "fake"

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _FEAT_SCHEMA.empty_table()
        payloads = t["payload"].to_pylist()
        kinds = (t["kind"].to_pylist() if "kind" in t.column_names
                 else ["image"] * n)
        w, h = _fake_decode_meta(payloads)
        feats = _payload_features(payloads, self.dim, self.seed)
        return pa.table({
            "media_id": t["media_id"],
            "kind": pa.array(kinds, pa.string()),
            "n_bytes": pa.array([len(p) if p else 0 for p in payloads],
                                pa.int64()),
            "width": pa.array(w),
            "height": pa.array(h),
            "decoder": pa.array([self._decoder_name] * n, pa.string()),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.dim),
        })


def media_features(media, *, feature_dim: int = FEATURE_DIM, seed: int = 42,
                   batch_size: int = 64, concurrency=(1, 8)):
    """media(media_id, kind, payload) -> feature table.

    ``batch_size`` is deliberately small: binary payloads are wide, and a
    batch x concurrency must fit in a worker heap (SURVEY.md §4.2).
    """
    cols = [c for c in ("media_id", "kind", "payload") if c in media.columns()]
    return media.select_columns(cols).map_batches(
        MediaFeatureStage, fn_constructor_args=(feature_dim, seed),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


_FRAME_SCHEMA = pa.schema([
    ("media_id", pa.int64()), ("frame_idx", pa.int32()),
    ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
])


class FrameSampleStage:
    """Video frame sampling stub: emits ``frames_per_doc`` rows per media
    row (1 -> N via in-batch explode; the real implementation would seek
    and decode keyframes here)."""

    def __init__(self, frames_per_doc: int = 4, feature_dim: int = FEATURE_DIM,
                 seed: int = 42):
        self.k = frames_per_doc
        self.dim = feature_dim
        self.seed = seed

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _FRAME_SCHEMA.empty_table()
        payloads = t["payload"].to_pylist()
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        out_ids = np.repeat(ids, self.k)
        out_idx = np.tile(np.arange(self.k, dtype=np.int32), n)
        # frame feature = payload feature salted by frame index
        feats = np.concatenate([
            _payload_features(payloads, self.dim, self.seed + f)
            for f in range(self.k)], axis=1).reshape(n, self.k, self.dim)
        feats = feats.transpose(0, 1, 2).reshape(-1, self.dim)
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "frame_idx": pa.array(out_idx),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.dim),
        })


def frame_samples(media, *, frames_per_doc: int = 4,
                  batch_size: int = 32, concurrency=(1, 4)):
    cols = [c for c in ("media_id", "payload") if c in media.columns()]
    return media.select_columns(cols).map_batches(
        FrameSampleStage, fn_constructor_args=(frames_per_doc,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def media_from_documents(docs):
    """Deterministic synthetic media table from the documents table
    (payload = UTF-8 text bytes) — lets the media plumbing run against
    the driver's testdata without any external data."""
    import pyarrow.compute as pc

    def conv(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("media_id", pa.int64()),
                              ("kind", pa.string()),
                              ("payload", pa.binary())]).empty_table()
        kinds = np.where(
            (t["doc_id"].to_numpy(zero_copy_only=False) % 3) == 0,
            "audio", "image")
        return pa.table({
            "media_id": t["doc_id"],
            "kind": pa.array(kinds, pa.string()),
            "payload": pc.cast(pc.fill_null(t["text"], ""), pa.binary()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        conv, batch_format="pyarrow")


MEDIA_DEDUP_SCHEMA = pa.schema([
    ("media_id", pa.int64()), ("kind", pa.string()),
    ("cluster_id", pa.int64()), ("n_copies", pa.int64()),
])


def media_dedup(media):
    """Exact dedup over opaque binary media payloads, scoped per
    ``kind`` — the byte-identical tier of a multimodal pipeline (the
    same image mirrored across a CDN, the same audio re-uploaded).

    Payloads never cross a shuffle: each batch folds its payload bytes
    to a 128-bit content hash (birthday-safe at 10^12 items) and drops
    the bytes; one ``sorted_first_attach`` labels every row with its
    (kind, hash) group's minimum media_id and one run-length sort
    attaches the exact copy count — 26 B/row through both sorts.

    Output: ``media_id, kind, cluster_id, n_copies``.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    import pyarrow.compute as pc

    from smqtk_indexing_ray.stages._util import stamp_schema
    from smqtk_indexing_ray.stages.agg import (
        sorted_first_attach,
        sorted_run_length_attach,
    )

    slim_schema = pa.schema([("kind", pa.string()), ("h1", pa.int64()),
                             ("h2", pa.int64()),
                             ("media_id", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "payload" not in t.column_names:
            return slim_schema.empty_table()
        from smqtk_indexing_ray.functions.hashing import (
            hash_byte_segments_u64,
        )
        arr = t["payload"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, b"").cast(pa.large_binary())
        off = np.frombuffer(arr.buffers()[1], np.int64)[
            arr.offset: arr.offset + len(arr) + 1]
        buf = arr.buffers()[2]
        data = (np.frombuffer(buf, np.uint8) if buf is not None
                else np.empty(0, np.uint8))
        # one vectorized segmented-hash pass over the batch's
        # concatenated payload buffer (no per-payload Python loop);
        # second 64-bit lane: an INDEPENDENT keyed hash of the payload
        # bytes (not a function of h1 — that would leave only 64 bits
        # of entropy in the pair), so (h1, h2) is a true 128-bit
        # content key, birthday-safe at 10^12 items
        h1 = hash_byte_segments_u64(data, off)
        h2 = hash_byte_segments_u64(data, off, seed=_H2_SEED)
        return pa.table({
            "kind": t["kind"],
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
            "media_id": pc.cast(t["media_id"], pa.int64()),
        }, schema=slim_schema)

    hashed = media.select_columns(
        ["media_id", "kind", "payload"]).map_batches(
        slim, batch_format="pyarrow")

    lab = sorted_first_attach(hashed, key=["kind", "h1", "h2"],
                              value="media_id", out="cluster_id",
                              schema=slim_schema)
    sized = sorted_run_length_attach(
        lab, key=["kind", "h1", "h2"], out="n_copies",
        schema=slim_schema.append(pa.field("cluster_id", pa.int64())))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_copies" not in t.column_names:
            return MEDIA_DEDUP_SCHEMA.empty_table()
        return pa.table({
            "media_id": t["media_id"], "kind": t["kind"],
            "cluster_id": t["cluster_id"], "n_copies": t["n_copies"],
        }, schema=MEDIA_DEDUP_SCHEMA)

    return stamp_schema(
        sized.map_batches(finish, batch_format="pyarrow"),
        MEDIA_DEDUP_SCHEMA)
