"""Classic warehouse rollups over the TPC-H-shaped tables.

These exercise the engine's GENERAL join/aggregate path (the same
primitives the dedup pipelines ride: combiner-shaped partial
aggregation, sort-merge ``sort_attach``, per-group top-k) on relational
fact/dimension data rather than text — proof the graft is a general
data-processing engine, not a dedup one-trick.

Scale shape: every aggregation pre-reduces inside ``map_batches``
before its groupby (the shuffle carries distinct keys per batch, not
fact rows), joins are the measured task-based sort-merge attach (no
aggregator-actor spin-up), and nothing corpus-sized touches the driver.

Reference analog: none directly — the reference is a pure NN-index
library — but the per-query ``sorted()[:n]`` re-rank
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:513-518) is the
in-memory form of the final top-k stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from smqtk_indexing_ray.stages._util import stamp_schema


def top_customer_revenue(lineitem, orders, customer, *, k: int = 10):
    """Top-k customers by revenue within each market segment.

    ``revenue = sum(l_extendedprice * (1 - l_discount))`` rolled up
    lineitem -> order -> customer, segment attached from the dimension
    table, then per-segment top-k.  Two combiner-shaped aggregations +
    two sort-merge attaches + one top-k sort.  Revenue doubles are
    emitted through round6 (ordering happens at full precision, same
    as the SQL window oracle).

    Output: ``c_mktsegment, c_custkey, revenue, rank``.
    """
    from ray.data.aggregate import Sum

    from smqtk_indexing_ray.functions.metrics import round6
    from smqtk_indexing_ray.stages.attach import sort_attach
    from smqtk_indexing_ray.stages.topk import top_k_per_group

    orev_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("rev", pa.float64())])

    def lpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return orev_schema.empty_table()
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = ep * (1.0 - disc)
        uniq, inv = np.unique(okey, return_inverse=True)
        out = np.zeros(len(uniq), np.float64)
        np.add.at(out, inv, rev)
        return pa.table({"l_orderkey": pa.array(uniq.astype(np.int64)),
                         "rev": pa.array(out)})

    lrev = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lpart, batch_format="pyarrow")
    orev = stamp_schema(
        lrev.groupby("l_orderkey").aggregate(
            Sum("rev", alias_name="rev")), orev_schema)

    with_cust = sort_attach(
        orev, orders.select_columns(["o_orderkey", "o_custkey"]),
        key="l_orderkey", payload_key="o_orderkey",
        payload_cols=["o_custkey"], how="inner",
        rows_schema=orev_schema,
        payload_schema=pa.schema([("o_orderkey", pa.int64()),
                                  ("o_custkey", pa.int64())]))

    crev_schema = pa.schema([("o_custkey", pa.int64()),
                             ("rev", pa.float64())])

    def cpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return crev_schema.empty_table()
        ckey = t["o_custkey"].to_numpy(zero_copy_only=False)
        rev = t["rev"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ckey, return_inverse=True)
        out = np.zeros(len(uniq), np.float64)
        np.add.at(out, inv, rev)
        return pa.table({"o_custkey": pa.array(uniq.astype(np.int64)),
                         "rev": pa.array(out)})

    crev = stamp_schema(
        with_cust.map_batches(cpart, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("rev", alias_name="rev")),
        crev_schema)

    with_seg = sort_attach(
        crev, customer.select_columns(["c_custkey", "c_mktsegment"]),
        key="o_custkey", payload_key="c_custkey",
        payload_cols=["c_mktsegment"], how="inner",
        rows_schema=crev_schema,
        payload_schema=pa.schema([("c_custkey", pa.int64()),
                                  ("c_mktsegment", pa.string())]))

    seg_schema = pa.schema([("o_custkey", pa.int64()),
                            ("rev", pa.float64()),
                            ("c_mktsegment", pa.string())])
    top = top_k_per_group(with_seg, group="c_mktsegment", order="rev",
                          tiebreak="o_custkey", k=k, schema=seg_schema)

    out_schema = pa.schema([("c_mktsegment", pa.string()),
                            ("c_custkey", pa.int64()),
                            ("revenue", pa.float64()),
                            ("rank", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "rev" not in t.column_names:
            return out_schema.empty_table()
        return pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "c_custkey": t["o_custkey"],
            "revenue": pa.array(round6(
                t["rev"].to_numpy(zero_copy_only=False))),
            "rank": t["rank"],
        })

    return top.map_batches(finish, batch_format="pyarrow")
