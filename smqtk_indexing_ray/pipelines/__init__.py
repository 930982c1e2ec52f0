from smqtk_indexing_ray.pipelines.dedup import (
    DedupResult,
    compute_signatures,
    candidate_edges,
    dedup_pipeline,
    select_representatives,
)

__all__ = [
    "DedupResult",
    "compute_signatures",
    "candidate_edges",
    "dedup_pipeline",
    "select_representatives",
]
