"""smqtk_indexing_ray — a Ray-Data-native near-duplicate detection and
clustering engine for web-scale text corpora.

A from-scratch reimagination of Kitware/SMQTK-Indexing's three pluggable
abstractions (see /root/reference, cited per-module):

* ``LshFunctor``  (vector -> LSH bit code)      -> batched MinHash / SimHash
  signature kernels (:mod:`smqtk_indexing_ray.functions`).
* ``HashIndex``   (hamming index of bit codes)  -> LSH band-bucket shuffles
  (:mod:`smqtk_indexing_ray.stages.banding` / ``buckets``).
* ``NearestNeighborsIndex`` (uuid-addressed index with build/update/remove/nn)
  -> a checkpointed dedup/cluster index over Parquet
  (:mod:`smqtk_indexing_ray.pipelines`).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, ``groupby`` shuffles for the wide steps.  No module in this package
calls ``ray.init()``.
"""

from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.context import ensure_data_context

# Applied at import time (before any Dataset is created) because a Dataset
# snapshots DataContext at creation: tuning applied later never reaches
# operators of already-created datasets.  This only mutates Ray Data's
# config object — it does NOT initialise Ray.
ensure_data_context()

__version__ = "0.1.0"

__all__ = ["DedupConfig", "ensure_data_context", "__version__"]
