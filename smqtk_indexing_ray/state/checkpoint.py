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

    def write_partitioned(self, ds, name: str, *, key: str = "doc_id",
                          n_shards: int = 32, shard_groups: int = 1,
                          inputs: list[str] | None = None):
        """Shard-resumable Parquet sink (SURVEY.md §4.2 "resumable
        output"): rows are hash-partitioned on ``key`` into ``n_shards``
        hive-style subdirectories (``part=K/``; not ``_``-prefixed —
        parquet dataset discovery treats underscore paths as hidden), committed atomically
        per write, with the completed shard set recorded in the manifest
        — a resumed call FILTERS completed shards out of the input before
        executing, so finished partitions are never recomputed or
        rewritten.

        ``shard_groups > 1`` splits the write into that many independent
        commits (each its own execution over the shard-filtered input):
        finer crash granularity at the cost of re-reading the input per
        group — the right trade when the input is a cheap checkpoint
        read and the corpus is large.
        """
        import numpy as np
        import pyarrow as pa

        from smqtk_indexing_ray.functions.hashing import splitmix64

        final = self.stage_dir(name)
        os.makedirs(final, exist_ok=True)
        rec = self.manifest().get(name, {})
        done: set[int] = (set(rec.get("shards_done", []))
                          if rec.get("config_hash") == self.config_hash
                          else set())

        def reader():
            import ray.data as rd
            if any(True for _, _, fs in os.walk(final)
                   for f in fs if f.endswith(".parquet")):
                ds_out = rd.read_parquet(final)

                def drop_part(t):
                    return (t.drop_columns(["part"])
                            if "part" in t.column_names else t)

                return ds_out.map_batches(drop_part, batch_format="pyarrow")
            return rd.from_items([])

        if len(done) >= n_shards:
            return reader()

        t0 = time.time()
        groups = [sorted(set(range(n_shards)) - done)[i::shard_groups]
                  for i in range(shard_groups)]
        for grp in groups:
            if not grp:
                continue
            grp_set = np.asarray(grp, dtype=np.int64)

            def add_shard(t: pa.Table, _g=grp_set) -> pa.Table:
                if t.num_rows == 0 or key not in t.column_names:
                    # normalized empty blocks arrive zero-column
                    return pa.table({"part": pa.array([], pa.int64())})
                k = t[key].to_numpy(zero_copy_only=False)
                with np.errstate(over="ignore"):
                    sh = (splitmix64(k.view(np.uint64))
                          % np.uint64(n_shards)).view(np.int64)
                t = t.append_column("part", pa.array(sh))
                return t.filter(pa.array(np.isin(sh, _g)))

            tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
            ds.map_batches(add_shard, batch_format="pyarrow").write_parquet(
                tmp, partition_cols=["part"])
            os.makedirs(tmp, exist_ok=True)
            for d in sorted(os.listdir(tmp)):
                if d.startswith("part="):
                    shutil.rmtree(os.path.join(final, d),
                                  ignore_errors=True)
                    os.replace(os.path.join(tmp, d),
                               os.path.join(final, d))
            shutil.rmtree(tmp, ignore_errors=True)
            done.update(int(s) for s in grp)
            self._record(StageRecord(
                name=name, rows=int(rec.get("rows", 0)),
                config_hash=self.config_hash,
                wall_s=time.time() - t0, created_at=time.time(),
                inputs=inputs or [],
                extra={"shards_done": sorted(done),
                       "n_shards": n_shards}))
        out = reader()
        self._record(StageRecord(
            name=name, rows=out.count(), config_hash=self.config_hash,
            wall_s=time.time() - t0, created_at=time.time(),
            inputs=inputs or [],
            extra={"shards_done": sorted(done), "n_shards": n_shards}))
        return out

    def stage(self, name: str, fn, *, inputs: list[str] | None = None,
              **extra):
        """Resume-or-compute: return the checkpointed Dataset if this
        config already produced it, else run ``fn()`` and checkpoint."""
        if self.has_stage(name):
            return self.read_stage(name)
        t0 = time.time()
        ds = fn()
        out = self.write_stage(ds, name, inputs=inputs,
                               wall_s=time.time() - t0, **extra)
        # Fault-injection seam for the kill/resume checks: a preempted
        # or OOM-killed job dies with no cleanup, leaving exactly the
        # stages completed so far on disk.  SMQTK_RAY_DIE_AFTER_STAGE=
        # <name> reproduces that deterministically — os._exit skips
        # every finally/atexit, like SIGKILL — only AFTER a fresh
        # compute (a resumed run sails past the same stage).
        import os as _os
        if _os.environ.get("SMQTK_RAY_DIE_AFTER_STAGE") == name:
            import sys as _sys
            # one visible trace in case the var leaks into a real run;
            # _exit still skips every finally/atexit (the point)
            _sys.stderr.write(
                f"SMQTK_RAY_DIE_AFTER_STAGE={name}: injected death "
                f"after stage commit (exit 17)\n")
            _sys.stderr.flush()
            _os._exit(17)
        return out


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
            from smqtk_indexing_ray.stages._util import safe_coalesce
            cid = safe_coalesce(t["cluster_id"], t["doc_id"])
            t = t.set_column(t.schema.get_field_index("cluster_id"),
                             "cluster_id", cid)
            t = t.append_column("keep", pc.equal(t["doc_id"], cid))
            return t.select(want)

        return j.map_batches(fill, batch_format="pyarrow")

    # shard-resumable sink: a crashed output write resumes at the first
    # incomplete hash shard instead of rewriting the whole table
    m = ck.manifest().get("output", {})
    if (m.get("config_hash") == cfg.config_hash()
            and len(m.get("shards_done", [])) >= m.get("n_shards", 16)):
        return ck.write_partitioned(None, "output", key="doc_id",
                                    n_shards=m.get("n_shards", 16))
    output = ck.write_partitioned(make_output(), "output", key="doc_id",
                                  n_shards=16, inputs=["labels"])
    return output
