"""Per-stage Parquet checkpoints with lineage — resumable runs.

The reference persists model state as opaque byte blobs after every
mutation (/root/reference/smqtk_indexing/impls/hash_index/linear.py:
121-142 save_cache on each build/update/remove; impls/nn_index/faiss.py:
398-484 index bytes + JSON params).  Here persistence is the natural
by-product of the dataflow: every stage boundary is a Parquet directory
plus a JSON manifest recording lineage (config hash, extract version,
input stage names, row count, wall time), and a resumed run skips any
stage whose checkpoint was written by an identical config.

Write protocol: write to ``<stage>.tmp-<nonce>`` then atomically rename to
``<stage>`` — a crashed run leaves only tmp dirs, never a half-complete
stage that a resume would trust.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field


@dataclass
class StageRecord:
    name: str
    rows: int
    config_hash: str
    wall_s: float
    created_at: float
    inputs: list[str] = field(default_factory=list)
    extra: dict = field(default_factory=dict)


class Checkpoint:
    """A checkpoint directory for one logical pipeline run.

    ``config_hash`` versions every stage: resuming with a different config
    invalidates (ignores) prior stages rather than silently mixing
    incompatible intermediates.
    """

    MANIFEST = "manifest.json"

    def __init__(self, root: str, config_hash: str):
        self.root = root
        self.config_hash = config_hash
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, self.MANIFEST)

    def manifest(self) -> dict[str, dict]:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def _record(self, rec: StageRecord) -> None:
        m = self.manifest()
        m[rec.name] = {
            "rows": rec.rows, "config_hash": rec.config_hash,
            "wall_s": round(rec.wall_s, 3), "created_at": rec.created_at,
            "inputs": rec.inputs, **rec.extra,
        }
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())

    # -- stages ------------------------------------------------------------
    def stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def has_stage(self, name: str) -> bool:
        rec = self.manifest().get(name)
        return (rec is not None
                and rec.get("config_hash") == self.config_hash
                and os.path.isdir(self.stage_dir(name)))

    def read_stage(self, name: str):
        import ray.data as rd
        if not self.has_stage(name):
            raise KeyError(f"no valid checkpoint for stage {name!r}")
        d = self.stage_dir(name)
        if not any(f.endswith(".parquet") for f in os.listdir(d)):
            return rd.from_items([])     # empty stage
        return rd.read_parquet(d)

    def write_stage(self, ds, name: str, *, inputs: list[str] | None = None,
                    wall_s: float = 0.0, **extra):
        """Write a Dataset as stage ``name`` (atomic tmp-then-rename) and
        return the re-read Dataset (so downstream consumes the on-disk
        partitions, releasing the object-store copy)."""
        tmp = self.stage_dir(name) + f".tmp-{uuid.uuid4().hex[:8]}"
        t0 = time.time()
        ds.write_parquet(tmp)
        # an empty dataset writes no files (and possibly no directory):
        # materialize the empty stage as an empty dir so resume semantics
        # ("stage exists, zero rows") still hold
        os.makedirs(tmp, exist_ok=True)
        final = self.stage_dir(name)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        import ray.data as rd
        if any(f.endswith(".parquet") for f in os.listdir(final)):
            out = rd.read_parquet(final)
        else:
            out = rd.from_items([])
        self._record(StageRecord(
            name=name, rows=out.count(), config_hash=self.config_hash,
            wall_s=wall_s + (time.time() - t0), created_at=time.time(),
            inputs=inputs or [], extra=extra))
        return out

    def stage(self, name: str, fn, *, inputs: list[str] | None = None,
              **extra):
        """Resume-or-compute: return the checkpointed Dataset if this
        config already produced it, else run ``fn()`` and checkpoint."""
        if self.has_stage(name):
            return self.read_stage(name)
        t0 = time.time()
        ds = fn()
        return self.write_stage(ds, name, inputs=inputs,
                                wall_s=time.time() - t0, **extra)


def checkpointed_dedup(pages_path: str, cfg, ckpt_root: str, *,
                       num_partitions: int = 16):
    """Flagship pipeline with stage-level resume.

    Stages: ``signatures`` -> ``edges`` -> ``labels`` -> ``output``.
    A crashed run resumes at the first missing stage; a config change
    (different ``cfg.config_hash()``) recomputes everything.
    """
    import ray.data as rd

    from smqtk_indexing_ray.functions.tokenize import EXTRACT_VERSION
    from smqtk_indexing_ray.pipelines import dedup as D

    ck = Checkpoint(ckpt_root, cfg.config_hash())

    sigs = ck.stage(
        "signatures",
        lambda: D.compute_signatures(rd.read_parquet(pages_path), cfg),
        inputs=[pages_path], extract_version=EXTRACT_VERSION)

    def make_edges():
        cand = D.candidate_edges(sigs, cfg)
        near = D.verify_edges(cand, sigs, cfg, num_partitions=num_partitions)
        return near.select_columns(["u", "v"])

    edges = ck.stage("edges", make_edges, inputs=["signatures"])

    from smqtk_indexing_ray.stages.components import connected_components
    labels = ck.stage(
        "labels",
        lambda: connected_components(edges, num_partitions=num_partitions,
                                     max_iters=cfg.cc_max_iters),
        inputs=["edges"])

    def make_output():
        import pyarrow as pa
        import pyarrow.compute as pc
        pages = rd.read_parquet(pages_path)
        meta_cols = [c for c in ("doc_id", "url", "warc_ts", "lang")
                     if c in pages.columns()]
        meta = pages.select_columns(meta_cols)
        from smqtk_indexing_ray.stages.attach import sort_attach
        types = {"doc_id": pa.int64(), "url": pa.string(),
                 "warc_ts": pa.timestamp("us"), "lang": pa.string()}
        j = sort_attach(
            meta, labels, key="doc_id", payload_key="doc_id",
            payload_cols=["cluster_id"], how="left",
            rows_schema=pa.schema([(c, types[c]) for c in meta_cols]),
            payload_schema=pa.schema([("doc_id", pa.int64()),
                                      ("cluster_id", pa.int64())]))

        def fill(t: pa.Table) -> pa.Table:
            want = meta_cols + ["cluster_id", "keep"]
            if t.num_rows == 0 or "cluster_id" not in t.column_names:
                types = {"doc_id": pa.int64(), "url": pa.string(),
                         "warc_ts": pa.timestamp("us"),
                         "lang": pa.string(), "cluster_id": pa.int64(),
                         "keep": pa.bool_()}
                return pa.schema([(c, types[c]) for c in want]).empty_table()
            cid = pc.coalesce(t["cluster_id"], t["doc_id"])
            t = t.set_column(t.schema.get_field_index("cluster_id"),
                             "cluster_id", cid)
            t = t.append_column("keep", pc.equal(t["doc_id"], cid))
            return t.select(want)

        return j.map_batches(fill, batch_format="pyarrow")

    output = ck.stage("output", make_output, inputs=["labels"])
    return output
