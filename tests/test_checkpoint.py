"""Checkpoint/resume: stage skip, config invalidation, atomicity.

Reference analog: persistence round-trip tests
(/root/reference/tests/impls/nn_index/test_faiss.py:228-277,
tests/impls/hash_index/test_balltree.py:280-296) — rebuild from saved
state must equal the original."""

from __future__ import annotations

import json
import os

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
