"""The ray-job CLI entry point (scripts/run_dedup_job.py): one run
produces a complete sharded output + JSON summary, a re-run resumes
from the checkpoint without recomputing."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pyarrow.parquet as pq
import pytest


def _load_cli():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "run_dedup_job.py")
    spec = importlib.util.spec_from_file_location("run_dedup_job", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["run_dedup_job"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    from smqtk_indexing_ray.sources import PagesSpec, generate_pages_table

    d = tmp_path_factory.mktemp("jobcli")
    p = str(d / "pages.parquet")
    pq.write_table(generate_pages_table(PagesSpec(n_docs=300, seed=5)), p)
    return p


def test_job_cli_runs_and_resumes(ray_session, pages_path, tmp_path,
                                  capsys):
    cli = _load_cli()
    ckpt = str(tmp_path / "ckpt")

    rc = cli.main(["--input", pages_path, "--checkpoint", ckpt,
                   "--num-partitions", "4"])
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert first["rows"] == 300
    assert first["clusters"] == first["kept"] > 0
    assert first["largest_cluster"] >= 1
    assert set(first["stage_wall_sec"]) == {
        "signatures", "edges", "labels", "output"}
    out_dir = os.path.join(ckpt, "output")
    shards = [p for p in os.listdir(out_dir) if p.startswith("part=")]
    assert shards, "output must be hash-sharded for resumable writes"

    # resume: identical summary, and the manifest rows prove the stages
    # were read back, not recomputed (created_at unchanged)
    with open(os.path.join(ckpt, "manifest.json")) as f:
        created_before = {k: v["created_at"]
                          for k, v in json.load(f).items()}
    rc2 = cli.main(["--input", pages_path, "--checkpoint", ckpt,
                    "--num-partitions", "4"])
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 0
    for k in ("rows", "clusters", "kept", "largest_cluster",
              "config_hash"):
        assert second[k] == first[k]
    with open(os.path.join(ckpt, "manifest.json")) as f:
        created_after = {k: v["created_at"]
                         for k, v in json.load(f).items()}
    for stage in ("signatures", "edges", "labels"):
        assert created_after[stage] == created_before[stage]


def test_job_cli_config_overrides_change_hash(ray_session, pages_path,
                                              tmp_path, capsys):
    cli = _load_cli()
    cfg_file = str(tmp_path / "cfg.json")
    with open(cfg_file, "w") as f:
        json.dump({"bands": 16, "rows_per_band": 8}, f)
    rc = cli.main(["--input", pages_path,
                   "--checkpoint", str(tmp_path / "ckpt2"),
                   "--config", cfg_file, "--num-partitions", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    from smqtk_indexing_ray.config import DedupConfig
    assert out["config_hash"] != DedupConfig().config_hash()


def test_job_cli_killed_midrun_resumes_identically(ray_session, pages_path,
                                                   tmp_path, capsys):
    """Induced mid-run KILL: the job runs as a real subprocess and dies
    with no cleanup (os._exit via the SMQTK_RAY_DIE_AFTER_STAGE seam —
    the SIGKILL/preemption equivalent) right after the `edges` stage
    commits.  The resumed run must skip the completed stages
    (created_at unchanged in the manifest) and the final sharded
    parquet must be row-identical to an uninterrupted run."""
    import subprocess

    import pandas as pd

    cli = _load_cli()

    # uninterrupted reference run (in-process, parent Ray session)
    ckpt_a = str(tmp_path / "ckpt_clean")
    rc = cli.main(["--input", pages_path, "--checkpoint", ckpt_a,
                   "--num-partitions", "4"])
    capsys.readouterr()
    assert rc == 0

    # killed run: a fresh process with its own Ray session dies
    # uncleanly right after `edges` lands on disk
    ckpt_b = str(tmp_path / "ckpt_killed")
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "run_dedup_job.py")
    repo_root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), ".."))
    env = dict(os.environ, SMQTK_RAY_DIE_AFTER_STAGE="edges",
               PYTHONPATH=repo_root + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, script, "--input", pages_path,
         "--checkpoint", ckpt_b, "--num-partitions", "4"],
        env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 17, proc.stderr[-2000:]
    with open(os.path.join(ckpt_b, "manifest.json")) as f:
        man_killed = json.load(f)
    assert set(man_killed) == {"signatures", "edges"}
    created_before = {k: v["created_at"] for k, v in man_killed.items()}

    # resume (in-process): completed stages are read back, not
    # recomputed; the run finishes and matches the clean reference
    rc2 = cli.main(["--input", pages_path, "--checkpoint", ckpt_b,
                    "--num-partitions", "4"])
    capsys.readouterr()
    assert rc2 == 0
    with open(os.path.join(ckpt_b, "manifest.json")) as f:
        man_resumed = json.load(f)
    assert set(man_resumed) == {"signatures", "edges", "labels", "output"}
    for stage in ("signatures", "edges"):
        assert man_resumed[stage]["created_at"] == created_before[stage]

    def read_out(ckpt):
        import glob

        import pyarrow.parquet as _pq
        files = sorted(glob.glob(os.path.join(ckpt, "output", "**",
                                              "*.parquet"),
                                 recursive=True))
        assert files
        df = pd.concat([_pq.read_table(f).to_pandas() for f in files])
        return df[["doc_id", "cluster_id", "keep"]].sort_values(
            "doc_id", ignore_index=True)

    a = read_out(ckpt_a)
    b = read_out(ckpt_b)
    assert len(a) == 300
    assert a.equals(b)
