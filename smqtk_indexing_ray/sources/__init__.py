from smqtk_indexing_ray.sources.pages import (
    PagesSpec,
    generate_block,
    pages_dataset,
    truth_dataset,
    generate_pages_table,
    generate_truth_table,
)

__all__ = [
    "PagesSpec",
    "generate_block",
    "pages_dataset",
    "truth_dataset",
    "generate_pages_table",
    "generate_truth_table",
]
