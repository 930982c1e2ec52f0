#!/usr/bin/env python
"""Cluster job entry point for the flagship dedup pipeline.

The north rule runs the engine via ``ray job submit`` on a fixed-size
multi-node cluster; this script is that job. It owns the Ray session
(the library never calls ``ray.init``), connects to whatever cluster
the job runner provides (``RAY_ADDRESS``, or the local machine when
unset), and drives the checkpointed pipeline so a preempted or crashed
job resumes at the first missing stage / first incomplete output shard
instead of recomputing:

    ray job submit --working-dir . -- \
        python scripts/run_dedup_job.py \
        --input  s3_or_nfs_path/pages/    \
        --checkpoint shared_path/ckpt/run1 \
        --config cfg.json --num-partitions 256

Prints exactly one JSON summary line on stdout (rows, clusters, kept
docs, per-stage walls from the checkpoint manifest); all logs go to
stderr. Exit code 0 only if the output stage is complete.

Reference analog: the reference persists index state per mutation and
reloads it on restart (/root/reference/smqtk_indexing/impls/nn_index/
faiss.py:398-484); here the restartable unit is the whole distributed
run, with lineage in the checkpoint manifest.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="Parquet file/dir of pages "
                         "(doc_id, url, warc_ts, html, text, lang)")
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint root (shared storage on a cluster); "
                         "re-running with the same config resumes")
    ap.add_argument("--config", default=None,
                    help="JSON file of DedupConfig overrides")
    ap.add_argument("--num-partitions", type=int, default=32,
                    help="shuffle width for verify/CC (~total cluster CPUs)")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        # ray job submit / RAY_ADDRESS decide the cluster; no resource
        # knobs here — the job inherits the fixed cluster's shape.
        ray.init(include_dashboard=False, logging_level="ERROR")

    try:
        from smqtk_indexing_ray.config import DedupConfig
        from smqtk_indexing_ray.state.checkpoint import (
            Checkpoint,
            checkpointed_dedup,
        )

        overrides = {}
        if args.config:
            with open(args.config) as f:
                overrides = json.load(f)
        cfg = DedupConfig.from_dict({**DedupConfig().to_dict(), **overrides})

        t0 = time.time()
        out = checkpointed_dedup(args.input, cfg, args.checkpoint,
                                 num_partitions=args.num_partitions)
        import pyarrow.compute as pc
        from ray.data.aggregate import Count, Max, Sum

        def flag(t):
            import pyarrow as pa
            if t.num_rows == 0 or "cluster_id" not in t.column_names:
                return pa.schema([("cluster_id", pa.int64()),
                                  ("kept", pa.int64())]).empty_table()
            return pa.table({
                "cluster_id": pc.cast(t["cluster_id"], "int64"),
                "kept": pc.cast(pc.cast(t["keep"], "int8"), "int64"),
            })

        per_cluster = (out.map_batches(flag, batch_format="pyarrow")
                       .groupby("cluster_id")
                       .aggregate(Count(alias_name="n"),
                                  Sum("kept", alias_name="kept")))
        stats = per_cluster.aggregate(
            Count(alias_name="clusters"), Sum("n", alias_name="rows"),
            Sum("kept", alias_name="kept"),
            Max("n", alias_name="max_n")) or {}

        manifest = Checkpoint(args.checkpoint, cfg.config_hash()).manifest()
        summary = {
            "rows": int(stats.get("rows") or 0),
            "clusters": int(stats.get("clusters") or 0),
            "kept": int(stats.get("kept") or 0),
            "largest_cluster": int(stats.get("max_n") or 0),
            "wall_sec": round(time.time() - t0, 3),
            "config_hash": cfg.config_hash(),
            "output_dir": f"{args.checkpoint}/output",
            "stage_wall_sec": {
                name: round(rec.get("wall_s", 0.0), 3)
                for name, rec in manifest.items()},
        }
        ok = (summary["rows"] > 0
              and len(manifest.get("output", {}).get("shards_done", []))
              >= manifest.get("output", {}).get("n_shards", 16))
        print(json.dumps(summary), flush=True)
        return 0 if ok else 1
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
