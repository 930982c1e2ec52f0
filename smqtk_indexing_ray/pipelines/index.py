"""DedupIndex — the NearestNeighborsIndex contract over checkpoints.

The reference's uuid-addressed mutable index
(/root/reference/smqtk_indexing/interfaces/nearest_neighbor_index.py:
27-124: build_index / update_index / remove_from_index / nn / count)
re-expressed in the recompute-from-checkpoint model: the durable state is
the signature table (Parquet, versioned in a manifest); every mutation
derives a NEW signature version (additive union / anti-join filter) and
downstream artifacts (edges, labels, clusters) are recomputed from it
lazily and cached per version.

Contract parity:
* ``build``: full rebuild; empty input raises ValueError BEFORE any state
  is touched (interfaces/nearest_neighbor_index.py:43-60 peek-and-chain).
* ``update``: additive; doc_ids already present are SKIPPED with a
  warning — the FAISS idempotent-add behavior (impls/nn_index/faiss.py:
  586-598).
* ``remove``: all-or-nothing; any unknown id raises KeyError and leaves
  the index unmodified (impls/nn_index/faiss.py:664-669,
  impls/nn_index/lsh.py:407-416).
* ``nn``: single-query near-dup search: sign the query text with the same
  functor, look up colliding LSH buckets, exact-verify candidates, return
  top-n ascending by distance (1 - est_jaccard), like lsh.py:471-518.
* ``count``: indexed doc count.
"""

from __future__ import annotations

import logging
import warnings

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.functions.metrics import est_jaccard
from smqtk_indexing_ray.functions.minhash import make_perms, minhash_signatures
from smqtk_indexing_ray.functions.tokenize import shingle_flat, tokenize_flat
from smqtk_indexing_ray.state.checkpoint import Checkpoint

log = logging.getLogger(__name__)


class DedupIndex:
    """Checkpoint-backed near-duplicate index with the reference's
    mutable-index API."""

    def __init__(self, root: str, cfg: DedupConfig | None = None, *,
                 read_only: bool = False, num_partitions: int = 16):
        self.cfg = cfg or DedupConfig()
        self.root = root
        self.read_only = read_only
        self.num_partitions = num_partitions
        self._ck = Checkpoint(root, self.cfg.config_hash())

    # -- internals ---------------------------------------------------------
    def _version(self) -> int:
        return int(self._ck.manifest().get("_index_meta", {}).get(
            "version", 0))

    def _sig_stage(self, version: int | None = None) -> str:
        v = self._version() if version is None else version
        return f"signatures_v{v}"

    def _bump(self, new_version: int, rows: int) -> None:
        from smqtk_indexing_ray.state.checkpoint import StageRecord
        self._ck._record(StageRecord(
            name="_index_meta", rows=rows,
            config_hash=self.cfg.config_hash(), wall_s=0.0,
            created_at=__import__("time").time(),
            extra={"version": new_version}))

    def _guard_mutable(self) -> None:
        if self.read_only:
            raise RuntimeError("DedupIndex is read-only")

    def _signatures(self):
        return self._ck.read_stage(self._sig_stage())

    def _compute_sigs(self, pages):
        from smqtk_indexing_ray.pipelines.dedup import compute_signatures
        return compute_signatures(pages, self.cfg)

    # -- the reference contract -------------------------------------------
    def build(self, pages) -> None:
        """Full rebuild from a pages Dataset (doc_id, text[, html...])."""
        self._guard_mutable()
        if pages.limit(1).count() == 0:
            raise ValueError("build: empty input")
        v = self._version() + 1
        out = self._ck.write_stage(self._compute_sigs(pages),
                                   self._sig_stage(v))
        self._bump(v, out.count())

    def update(self, pages) -> None:
        """Additive update; already-present doc_ids are skipped (warned)."""
        self._guard_mutable()
        if pages.limit(1).count() == 0:
            raise ValueError("update: empty input")
        if self._version() == 0:
            return self.build(pages)
        existing = self._doc_id_set()
        new_sigs_tbl = pa.concat_tables(
            [b for b in self._compute_sigs(pages)
             .iter_batches(batch_format="pyarrow")])
        mask = ~np.isin(
            new_sigs_tbl["doc_id"].to_numpy(zero_copy_only=False),
            existing)
        n_skip = int((~mask).sum())
        if n_skip:
            warnings.warn(
                f"update: skipping {n_skip} doc_id(s) already indexed "
                "(idempotent add)")
        kept = new_sigs_tbl.filter(pa.array(mask))
        if kept.num_rows == 0:
            return
        import ray.data as rd
        merged = self._signatures().union(rd.from_arrow(kept))
        v = self._version() + 1
        out = self._ck.write_stage(merged, self._sig_stage(v))
        self._bump(v, out.count())

    def remove(self, doc_ids) -> None:
        """All-or-nothing removal; unknown ids raise KeyError first."""
        self._guard_mutable()
        ids = np.asarray(sorted(set(int(i) for i in doc_ids)), dtype=np.int64)
        if len(ids) == 0:
            return
        existing = self._doc_id_set()
        missing = ids[~np.isin(ids, existing)]
        if len(missing):
            raise KeyError(
                f"remove: {len(missing)} unknown doc_id(s), e.g. "
                f"{missing[:5].tolist()}; index unmodified")

        def anti(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            keep = ~np.isin(
                t["doc_id"].to_numpy(zero_copy_only=False), ids)
            return t.filter(pa.array(keep))

        filtered = self._signatures().map_batches(
            anti, batch_format="pyarrow")
        v = self._version() + 1
        out = self._ck.write_stage(filtered, self._sig_stage(v))
        self._bump(v, out.count())

    def count(self) -> int:
        if self._version() == 0:
            return 0
        return int(self._ck.manifest()[self._sig_stage()]["rows"])

    def __len__(self) -> int:
        return self.count()

    # -- derived artifacts -------------------------------------------------
    def labels(self):
        """(doc_id, cluster_id) for clustered docs — recomputed from the
        current signature version, cached per version."""
        from smqtk_indexing_ray.pipelines import dedup as D
        from smqtk_indexing_ray.stages.components import connected_components

        v = self._version()
        if v == 0:
            raise ValueError("labels: index is empty")

        def make():
            sigs = self._signatures().materialize()
            cand = D.candidate_edges(sigs, self.cfg)
            near = D.verify_edges(cand, sigs, self.cfg,
                                  num_partitions=self.num_partitions)
            edges = near.select_columns(["u", "v"])
            return connected_components(
                edges, num_partitions=self.num_partitions,
                max_iters=self.cfg.cc_max_iters)

        return self._ck.stage(f"labels_v{v}", make,
                              inputs=[self._sig_stage()])

    def nn(self, text: str, n: int = 10) -> tuple[list[int], list[float]]:
        """Top-n near duplicates of a query text: (doc_ids, distances),
        distance = 1 - est_jaccard, ascending (lsh.py:471-518).

        Raises ValueError on an empty index or a query with no shingles
        (the analog of the vector-less query guard,
        interfaces/nearest_neighbor_index.py:96-118).
        """
        if self.count() == 0:
            raise ValueError("nn: empty index")
        cfg = self.cfg
        tok, off = tokenize_flat(
            pa.array([text], pa.string()), lowercase=cfg.lowercase,
            hash_key=cfg.hash_key)
        sh, soff = shingle_flat(tok, off, cfg.shingle_k)
        if len(sh) == 0:
            raise ValueError("nn: query has no shingles")
        a, b = make_perms(cfg.num_perms, cfg.seed)
        qsig = minhash_signatures(sh, soff, a, b)[0]   # (num_perms,)

        from smqtk_indexing_ray.functions.hashing import fold_rows_u64
        r, nb = cfg.rows_per_band, cfg.bands
        qkeys = np.empty(nb, dtype=np.int64)
        for band in range(nb):
            qkeys[band] = int(fold_rows_u64(
                qsig[None, band * r:(band + 1) * r],
                salt=np.uint64(band + 1)).view(np.int64)[0])

        # candidate scan: band keys are precomputed in the signature
        # table; keep colliders (scale path: a bucket-sorted Parquet
        # checkpoint with key-range pruning; at index scale this is a
        # signature-table scan).  Verification uses the stored 8-bit
        # sketch against the query's truncated signature.
        from smqtk_indexing_ray.stages.banding import band_stage
        from smqtk_indexing_ray.stages.signatures import fixed_binary_matrix

        qmh8 = (qsig.astype(np.uint8))[None, :]
        cand_rows: list[tuple[int, float]] = []
        for t in self._signatures().iter_batches(batch_format="pyarrow"):
            bt = band_stage(t, cfg)
            if bt.num_rows == 0:
                continue
            m = np.isin(bt["bucket"].to_numpy(zero_copy_only=False),
                        qkeys)
            cds = np.unique(bt["doc_id"].to_numpy(
                zero_copy_only=False)[m])
            if len(cds) == 0:
                continue
            sel = t.filter(pa.compute.is_in(
                t["doc_id"], value_set=pa.array(cds, pa.int64())))
            sig_m = fixed_binary_matrix(sel["mh8"], cfg.num_perms)
            ej = est_jaccard(sig_m, np.broadcast_to(
                qmh8, (sel.num_rows, cfg.num_perms)))
            for did, e in zip(
                    sel["doc_id"].to_numpy(zero_copy_only=False), ej):
                cand_rows.append((int(did), float(1.0 - e)))

        cand_rows.sort(key=lambda x: (x[1], x[0]))
        top = cand_rows[:n]
        return [d for d, _ in top], [dist for _, dist in top]

    # -- helpers -----------------------------------------------------------
    def _doc_id_set(self) -> np.ndarray:
        ids = []
        for t in self._signatures().select_columns(["doc_id"]).iter_batches(
                batch_format="pyarrow"):
            ids.append(t["doc_id"].to_numpy(zero_copy_only=False))
        return np.concatenate(ids) if ids else np.empty(0, np.int64)
