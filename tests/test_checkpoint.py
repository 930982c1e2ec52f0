"""Checkpoint/resume: stage skip, config invalidation, atomicity.

Reference analog: persistence round-trip tests
(/root/reference/tests/impls/nn_index/test_faiss.py:228-277,
tests/impls/hash_index/test_balltree.py:280-296) — rebuild from saved
state must equal the original."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.state.checkpoint import Checkpoint, checkpointed_dedup


@pytest.mark.usefixtures("ray_session")
class TestCheckpoint:
    def test_stage_compute_then_skip(self, tmp_path):
        import ray.data as rd
        ck = Checkpoint(str(tmp_path / "ck"), "cfg1")
        calls = []

        def make():
            calls.append(1)
            return rd.from_arrow(pa.table({"x": pa.array([1, 2, 3])}))

        a = ck.stage("s1", make)
        assert a.count() == 3 and calls == [1]
        b = ck.stage("s1", make)
        assert b.count() == 3 and calls == [1]  # skipped
        rec = ck.manifest()["s1"]
        assert rec["rows"] == 3 and rec["config_hash"] == "cfg1"

    def test_config_change_invalidates(self, tmp_path):
        import ray.data as rd
        root = str(tmp_path / "ck")
        calls = []

        def make():
            calls.append(1)
            return rd.from_arrow(pa.table({"x": pa.array([1])}))

        Checkpoint(root, "A").stage("s", make)
        Checkpoint(root, "B").stage("s", make)
        assert calls == [1, 1]

    def test_no_partial_stage_dirs(self, tmp_path):
        import ray.data as rd
        ck = Checkpoint(str(tmp_path / "ck"), "cfg")
        ck.stage("s", lambda: rd.from_arrow(pa.table({"x": pa.array([1])})))
        entries = os.listdir(str(tmp_path / "ck"))
        assert sorted(entries) == ["manifest.json", "s"]

    def test_checkpointed_dedup_resume(self, tmp_path):
        from smqtk_indexing_ray.sources.pages import (
            PagesSpec, generate_pages_table)
        pages_path = str(tmp_path / "pages.parquet")
        pq.write_table(generate_pages_table(PagesSpec(n_docs=300, seed=3)),
                       pages_path)
        cfg = DedupConfig()
        root = str(tmp_path / "ck")
        out1 = checkpointed_dedup(pages_path, cfg, root,
                                  num_partitions=4).to_pandas()
        man = json.load(open(os.path.join(root, "manifest.json")))
        assert set(man) == {"signatures", "edges", "labels", "output"}
        assert man["signatures"]["extract_version"] == "extract-v1"
        # resume: all stages skipped, same result
        out2 = checkpointed_dedup(pages_path, cfg, root,
                                  num_partitions=4).to_pandas()
        key = ["doc_id", "cluster_id", "keep"]
        a = out1[key].sort_values("doc_id", ignore_index=True)
        b = out2[key].sort_values("doc_id", ignore_index=True)
        assert a.equals(b)
        # matches the non-checkpointed pipeline
        import ray.data as rd
        from smqtk_indexing_ray.pipelines.dedup import dedup_pipeline
        res = dedup_pipeline(rd.read_parquet(pages_path), cfg,
                             num_partitions=4)
        c = res.output.to_pandas()[key].sort_values(
            "doc_id", ignore_index=True)
        assert a.equals(c)


@pytest.mark.usefixtures("ray_session")
class TestPartitionedOutput:
    def _mtimes(self, root):
        import os
        out = {}
        for d in os.listdir(root):
            if d.startswith("part="):
                p = os.path.join(root, d)
                out[d] = max(os.path.getmtime(os.path.join(p, f))
                             for f in os.listdir(p))
        return out

    def test_shard_resume_skips_completed(self, tmp_path):
        import os
        import time as _time

        import ray.data as rd
        from smqtk_indexing_ray.state.checkpoint import Checkpoint

        ck = Checkpoint(str(tmp_path / "ck"), "cfg1")
        t = pa.table({"doc_id": pa.array(np.arange(400, dtype=np.int64)),
                      "val": pa.array(np.arange(400, dtype=np.int64) * 2)})
        ds = rd.from_arrow(t)

        out = ck.write_partitioned(ds, "out", key="doc_id", n_shards=4,
                                   shard_groups=2)
        assert out.count() == 400
        root = ck.stage_dir("out")
        m1 = self._mtimes(root)
        assert len(m1) == 4
        assert sorted(ck.manifest()["out"]["shards_done"]) == [0, 1, 2, 3]

        # idempotent re-run: nothing rewritten, no duplicate rows
        _time.sleep(0.05)
        out2 = ck.write_partitioned(ds, "out", key="doc_id", n_shards=4)
        assert out2.count() == 400
        assert self._mtimes(root) == m1

        # partial-crash resume: mark shards 2,3 incomplete and drop their
        # dirs; only they are recomputed, 0,1 untouched
        from smqtk_indexing_ray.state.checkpoint import StageRecord
        ck._record(StageRecord(
            name="out", rows=0, config_hash="cfg1", wall_s=0.0,
            created_at=0.0, extra={"shards_done": [0, 1], "n_shards": 4}))
        import shutil
        shutil.rmtree(os.path.join(root, "part=2"))
        shutil.rmtree(os.path.join(root, "part=3"))
        _time.sleep(0.05)
        out3 = ck.write_partitioned(ds, "out", key="doc_id", n_shards=4)
        assert out3.count() == 400
        m3 = self._mtimes(root)
        assert m3["part=0"] == m1["part=0"]
        assert m3["part=1"] == m1["part=1"]
        assert m3["part=2"] > m1["part=2"]
        # no duplicated doc_ids after resume
        df = out3.to_pandas()
        assert df.doc_id.is_unique and len(df) == 400
