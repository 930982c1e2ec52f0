"""Pure, vectorized kernels (NumPy / pyarrow.compute) used inside
``map_batches`` stages.  No Ray imports here — everything is unit-testable
without a cluster."""

from smqtk_indexing_ray.functions.hashing import (
    hash_strings_u64,
    combine_u64,
    fold_rows_u64,
    splitmix64,
)
from smqtk_indexing_ray.functions.tokenize import (
    normalize_text,
    tokens_flat,
    tokenize_flat,
    shingle_flat,
    extract_text_from_html,
)
from smqtk_indexing_ray.functions.minhash import minhash_signatures, make_perms
from smqtk_indexing_ray.functions.simhash import simhash_fingerprints
from smqtk_indexing_ray.functions.metrics import (
    popcount_u64,
    hamming_u64,
    est_jaccard,
    cosine_distance,
    euclidean_distance,
    histogram_intersection_distance,
)

__all__ = [
    "hash_strings_u64",
    "combine_u64",
    "fold_rows_u64",
    "splitmix64",
    "normalize_text",
    "tokens_flat",
    "tokenize_flat",
    "shingle_flat",
    "extract_text_from_html",
    "minhash_signatures",
    "make_perms",
    "simhash_fingerprints",
    "popcount_u64",
    "hamming_u64",
    "est_jaccard",
    "cosine_distance",
    "euclidean_distance",
    "histogram_intersection_distance",
]
