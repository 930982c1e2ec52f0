from smqtk_indexing_ray.stages.signatures import SignatureStage, extract_text_stage
from smqtk_indexing_ray.stages.banding import band_stage
from smqtk_indexing_ray.stages.buckets import star_edges
from smqtk_indexing_ray.stages.verify import verify_edges
from smqtk_indexing_ray.stages.components import (
    connected_components,
    driver_connected_components,
)

__all__ = [
    "SignatureStage",
    "extract_text_stage",
    "band_stage",
    "star_edges",
    "verify_edges",
    "connected_components",
    "driver_connected_components",
]
