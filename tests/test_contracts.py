"""Interface contract tests — behavior, not data.

Analog of the reference's template-method contract suite
(/root/reference/tests/interfaces/test_nearest_neighbors_index.py:43-305):
empty input raises before any run, re-running identical input is
idempotent/deterministic.
"""

import pyarrow as pa
import pytest

from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.pipelines.dedup import dedup_pipeline
from smqtk_indexing_ray.sources.pages import PagesSpec, generate_pages_table


@pytest.mark.usefixtures("ray_session")
def test_empty_corpus_raises_before_run():
    import ray.data as rd

    empty = generate_pages_table(PagesSpec(n_docs=100)).slice(0, 0)
    with pytest.raises(ValueError, match="empty"):
        dedup_pipeline(rd.from_arrow(empty), DedupConfig(), num_partitions=2)


@pytest.mark.usefixtures("ray_session")
def test_config_validation():
    with pytest.raises(ValueError, match="num_perms"):
        DedupConfig(bands=10, rows_per_band=10, num_perms=128)
    with pytest.raises(ValueError, match="hash_key"):
        DedupConfig(hash_key="short")


def test_config_round_trip():
    cfg = DedupConfig(bands=16, rows_per_band=8, bucket_salt=4)
    assert DedupConfig.from_dict(cfg.to_dict()) == cfg
    assert cfg.config_hash() == DedupConfig.from_dict(cfg.to_dict()).config_hash()
    assert cfg.config_hash() != DedupConfig().config_hash()


@pytest.mark.usefixtures("ray_session")
def test_idempotent_rerun_same_labels():
    import ray.data as rd

    spec = PagesSpec(n_docs=300, seed=3)
    pages = rd.from_arrow(generate_pages_table(spec))
    cfg = DedupConfig(signature_concurrency=(1, 2), batch_size=128)
    a = dedup_pipeline(pages, cfg, num_partitions=2).output.to_pandas()
    b = dedup_pipeline(pages, cfg, num_partitions=2).output.to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["cluster_id"] == b["cluster_id"]).all()
    assert (a["keep"] == b["keep"]).all()


@pytest.mark.usefixtures("ray_session")
def test_salted_buckets_equivalent_clustering():
    """Hot-bucket salting (SURVEY.md §4.2): bucket_salt=4 must produce
    identical cluster labels to salt=1 — sub-bucket representatives are
    chained, preserving connectivity while bounding per-reducer fanout.
    Uses a corpus with a deliberate 500-doc hot-template cluster."""
    import ray.data as rd

    spec = PagesSpec(n_docs=1500, seed=13, hot_blocks=5)
    pages = rd.from_arrow(generate_pages_table(spec))
    base = DedupConfig(signature_concurrency=(1, 2), batch_size=256)
    salted = DedupConfig(signature_concurrency=(1, 2), batch_size=256,
                         bucket_salt=4)
    a = dedup_pipeline(pages, base, num_partitions=4
                       ).output.to_pandas().sort_values(
        "doc_id", ignore_index=True)
    b = dedup_pipeline(pages, salted, num_partitions=4
                       ).output.to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert (a["cluster_id"] == b["cluster_id"]).all()
    assert (a["keep"] == b["keep"]).all()
    # the hot cluster exists and is fully clustered under both configs
    hot = a[a.cluster_id == a.cluster_id.value_counts().idxmax()]
    assert len(hot) == 500


@pytest.mark.usefixtures("ray_session")
def test_salt_splits_hot_bucket_across_blocks():
    """Ray's range partitioner never splits a single key value, so a
    degenerate hot bucket lands in ONE block unless salted.  With salt as
    a secondary sort sub-key the cloud spreads over multiple blocks and
    the boundary fixup still links every member to the global minimum."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from smqtk_indexing_ray.stages.buckets import star_edges
    from smqtk_indexing_ray.stages.components import (
        driver_connected_components)

    n = 200_000
    t = pa.table({
        "bucket": pa.array(np.full(n, 7, dtype=np.int64)),
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
    })
    ds = rd.from_arrow(t).repartition(16)
    edges = star_edges(ds, ["bucket"], "doc_id", salt=16).materialize()
    # every doc connects to component min 0
    cc = driver_connected_components(edges)
    assert set(cc.values()) == {0}
    assert len(cc) == n
    # and the hot bucket was actually split: more than one block holds it
    sizes = [m.num_rows for b in edges.iter_internal_ref_bundles()
             for _, m in b.blocks if m.num_rows]
    assert len(sizes) > 1
