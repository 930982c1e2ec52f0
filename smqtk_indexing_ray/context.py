"""Ray Data context tuning shared by every pipeline entry point.

Why this exists: Ray's hash-shuffle operators (join / groupby-aggregate /
shuffle) spawn ``num_partitions`` aggregator **actors**, each reserving up
to ``min(1, total_cpus/2/num_partitions)`` CPUs.  A pipeline that chains
several joins and aggregates (the dedup output path has three joins and
two aggregations live at once) can reserve every CPU on the node for
aggregators, starving the upstream map tasks — the streaming executor then
deadlocks, silently.  Overriding the per-partition CPU reservation to a
small value keeps aggregator scheduling dense while leaving CPUs for the
actual compute; aggregator actors are I/O-bound accumulators, not CPU
hogs, so overcommitting them is safe.

Idempotent; called at the top of every public pipeline function (the
driver imports the library without initialising Ray, so this must run
lazily, never at import time).
"""

from __future__ import annotations

_APPLIED = False


#: partition_size_hint passed to joins whose payload is known-narrow
#: (ids + signatures, never document bodies): keeps each join aggregator's
#: logical-memory reservation at ~6 MB instead of the ~0.9 GiB default
#: derived from target_max_block_size.
NARROW_JOIN_HINT = 4 << 20


def ensure_data_context() -> None:
    global _APPLIED
    if _APPLIED:
        return
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    # 1/16 CPU per partition => a 32-partition join reserves 2 CPUs.
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.0625
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.0625
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.0625
    # The default 128 MiB target block size makes every shuffle aggregator
    # reserve ~0.9 GiB of the logical memory resource (estimate = ~7x the
    # target block size); a graph with several concurrent joins/aggregates
    # then reserves the whole node's memory and the executor deadlocks.
    # Our shuffle payloads are narrow (signatures/edges/labels, <=0.5 KB a
    # row) so 32 MiB blocks keep reservations ~4x smaller and improve sort
    # parallelism at test scale.
    ctx.target_max_block_size = 32 << 20
    _APPLIED = True
