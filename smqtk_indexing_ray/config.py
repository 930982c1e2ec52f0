"""Pipeline configuration.

Analog of the reference's ``Configurable`` JSON round-trip surface
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:60-158): a plain
dataclass whose dict form is JSON-compliant and whose hash versions every
checkpoint (lineage), instead of introspected constructor schemas.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass


@dataclass(frozen=True)
class DedupConfig:
    """Knobs for the near-duplicate detection pipeline.

    The (bands, rows_per_band) pair is the recall/speed knob — the analog of
    FAISS ``nprobe`` tuning in the reference
    (/root/reference/smqtk_indexing/impls/nn_index/faiss.py:715-749).
    Detection probability for a pair at Jaccard s is ``1-(1-s^r)^b``; the
    default (32, 4) puts the S-curve threshold at ``(1/32)^(1/4) ~= 0.42`` so
    that pairs at s >= 0.6 are found with p > 0.988 and s >= 0.7 with
    p > 0.9998, then the verify stage prunes false positives below
    ``verify_threshold``.
    """

    # --- text front-end -------------------------------------------------
    shingle_k: int = 4              # tokens per shingle (w-shingling)
    lowercase: bool = True

    # --- MinHash (the LshFunctor analog, itq.py:389-408) -----------------
    num_perms: int = 128            # MinHash signature length
    bands: int = 32                 # LSH bands (b)
    rows_per_band: int = 4          # rows per band (r); b*r == num_perms

    # --- SimHash ----------------------------------------------------------
    simhash_bits: int = 64          # fixed: packed into one uint64 column
    simhash_hamming_max: int = 3    # near-dup gate on simhash fingerprints

    # --- verification / clustering ---------------------------------------
    verify_threshold: float = 0.5   # min estimated Jaccard to keep an edge
    # Hot-bucket salt: secondary sort sub-key letting the range partitioner
    # split a degenerate near-dup cloud across up to `salt` blocks (see
    # stages/buckets.py).  Connectivity-identical at any value and costs
    # one int8 sort column, so it is ON by default (1 = off).
    bucket_salt: int = 16
    salt_min_group: int = 0         # reserved (salting is size-oblivious)

    # --- kernel selection (resolved by name from the registry, the analog
    # of the reference's entry-point plugin strings, pyproject.toml:72-84;
    # see smqtk_indexing_ray/registry.py) ----------------------------------
    signature_kernel: str = "minhash-simhash"
    verify_kernel: str = "est-jaccard-or-simhash"
    select_kernel: str = "min_doc"

    # --- determinism -------------------------------------------------------
    seed: int = 42
    hash_key: str = "smqtk-ray-v1.0.0"  # 16-char key for string hashing

    # --- execution ----------------------------------------------------------
    batch_size: int = 2048          # docs per signature batch
    # None (default) = task-pool signing fused with the parquet read (the
    # kernel's seed-derived state is cached once per worker process).
    # An int or (min, max) tuple forces an autoscaling ACTOR pool of that
    # size — the right shape only when kernel setup is genuinely expensive
    # (model load); a FIXED pool of num_cpus actors reserves every CPU and
    # starves the upstream read task, deadlocking the streaming executor.
    signature_concurrency: int | tuple | None = None
    cc_max_iters: int = 25          # connected-components round cap

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"must equal num_perms ({self.num_perms})"
            )
        if len(self.hash_key) != 16:
            raise ValueError("hash_key must be exactly 16 characters")

    # -- JSON round trip (reference: get_config/from_config) ---------------
    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        if isinstance(d.get("signature_concurrency"), tuple):
            d["signature_concurrency"] = list(d["signature_concurrency"])
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "DedupConfig":
        d = dict(d)
        sc = d.get("signature_concurrency")
        if isinstance(sc, list):
            d["signature_concurrency"] = tuple(sc)
        return cls(**d)

    def config_hash(self) -> str:
        """Stable hash identifying this config for checkpoint lineage."""
        blob = json.dumps(self.to_dict(), sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]
