"""Shared stage helpers."""

from __future__ import annotations

import pyarrow as pa


def stamp_schema(ds, schema: pa.Schema):
    """Re-stamp zero-column empty blocks with the intended schema.

    Ray Data's hash-shuffle join and aggregate operators emit **zero-column**
    empty blocks for empty partitions; a downstream join then fails with
    ``No match ... for key field reference`` inside pyarrow.  Non-empty
    blocks pass through untouched (zero-copy).
    """
    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and t.schema.names != schema.names:
            return schema.empty_table()
        return t

    return ds.map_batches(f, batch_format="pyarrow")
