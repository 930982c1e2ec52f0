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
import pyarrow.compute as pc


def _revenue_units(t: pa.Table) -> np.ndarray:
    """``l_extendedprice * (1 - l_discount)`` in exact int64 units of
    1e-4 dollars (price cents x discount-complement basis points).

    The TPC-H-shaped columns are cents-quantized doubles, so
    ``rint(x*100)`` recovers the exact decimal; all downstream sums are
    int64 and the final ``units / 10000.0`` division is bit-identical
    IEEE on both the Ray and SQL sides — no float-summation-order
    dependence anywhere (a float64 revenue sum differs from DuckDB's
    in the 6th decimal at 1e8 magnitudes, measured)."""
    ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
    disc = t["l_discount"].to_numpy(zero_copy_only=False)
    cents = np.rint(ep * 100.0).astype(np.int64)
    bp = 100 - np.rint(disc * 100.0).astype(np.int64)
    return cents * bp


#: Row gate for driver-collected dimension broadcasts — the same
#: convention as the ``max_vocab`` gates and
#: ``stages/attach.BROADCAST_ATTACH_MAX_ROWS``: a dimension above it
#: takes the sort-merge ``sort_attach`` fallback instead of the driver
#: heap.  Nation (25 rows) and region (5 rows) are CONSTANT-size by the
#: TPC-H spec and are never gated; supplier/part/customer scale with SF
#: and are.
WAREHOUSE_DIM_MAX_ROWS = 8_000_000


def _nation_region_maps(nation, region):
    """Driver-side nation/region chain (25 + 5 rows, constant by spec):
    returns ``rmap`` (regionkey -> r_name) and ``nmap`` (nationkey ->
    (r_name, n_name))."""
    from smqtk_indexing_ray.stages._util import collect_table

    nat = collect_table(nation.select_columns(
        ["n_nationkey", "n_name", "n_regionkey"]),
        pa.schema([("n_nationkey", pa.int64()), ("n_name", pa.string()),
                   ("n_regionkey", pa.int64())]))
    reg = collect_table(region.select_columns(
        ["r_regionkey", "r_name"]),
        pa.schema([("r_regionkey", pa.int64()),
                   ("r_name", pa.string())]))
    rmap = dict(zip(reg["r_regionkey"].to_pylist(),
                    reg["r_name"].to_pylist()))
    nmap = {k: (rmap[rk], nm) for k, nm, rk in zip(
        nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist(),
        nat["n_regionkey"].to_pylist())}
    return rmap, nmap


def supplier_nation_volume(lineitem, supplier, nation, region, *,
                           max_dim_rows: int = WAREHOUSE_DIM_MAX_ROWS):
    """Revenue volume per (region, nation) — the broadcast-dimension
    join shape: the fact table pre-reduces per batch to its distinct
    supplier keys, and the supplier->nation->region dimension chain
    (hundreds of rows) is composed DRIVER-SIDE into one small map,
    ``ray.put`` once and looked up inside ``map_batches`` — no shuffle
    ever sees a dimension row, and the only exchange is the
    #suppliers-per-batch partial aggregate.

    This is the documented broadcast path for small-side joins (vs the
    sort-merge ``sort_attach`` used when the payload side is large —
    see :func:`top_customer_revenue` for that shape).  A supplier
    dimension above ``max_dim_rows`` takes that sort-merge path
    automatically: per-batch suppkey partials collapse through one
    sorted aggregate (one row per supplier), ``s_nationkey`` attaches
    by ``sort_attach``, and only the constant-size nation/region chain
    rides the driver — same output bit-for-bit.

    Output: ``r_name, n_name, revenue, n_items`` (exact unit-division
    doubles, exact int64 counts).
    """
    import ray
    from ray.data.aggregate import Sum

    from smqtk_indexing_ray.stages._util import collect_table

    rmap, nmap = _nation_region_maps(nation, region)

    part_schema = pa.schema([("r_name", pa.string()),
                             ("n_name", pa.string()),
                             ("units", pa.int64()),
                             ("n_items", pa.int64())])
    out_schema = pa.schema([("r_name", pa.string()),
                            ("n_name", pa.string()),
                            ("revenue", pa.float64()),
                            ("n_items", pa.int64())])

    sup_sel = supplier.select_columns(["s_suppkey", "s_nationkey"])
    sup_schema = pa.schema([("s_suppkey", pa.int64()),
                            ("s_nationkey", pa.int64())])

    if sup_sel.count() <= max_dim_rows:
        sup = collect_table(sup_sel, sup_schema)
        smap = {k: nmap[nk] for k, nk in zip(
            sup["s_suppkey"].to_pylist(), sup["s_nationkey"].to_pylist())}
        smap_ref = ray.put(smap)

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "l_suppkey" not in t.column_names:
                return part_schema.empty_table()
            m = ray.get(smap_ref)
            skey = t["l_suppkey"].to_numpy(zero_copy_only=False)
            units = _revenue_units(t)
            uniq, inv = np.unique(skey, return_inverse=True)
            out = np.zeros(len(uniq), np.int64)
            np.add.at(out, inv, units)
            cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
            names = [m[int(s)] for s in uniq]  # distinct keys, not rows
            return pa.table({
                "r_name": pa.array([r for r, _ in names], pa.string()),
                "n_name": pa.array([n for _, n in names], pa.string()),
                "units": pa.array(out),
                "n_items": pa.array(cnt),
            })

        parts = lineitem.select_columns(
            ["l_suppkey", "l_extendedprice", "l_discount"]).map_batches(
            partial, batch_format="pyarrow")
    else:
        # sort-merge fallback: suppkey partials -> one row/supplier ->
        # nationkey attach -> constant-size name lookup
        from smqtk_indexing_ray.stages.agg import sorted_group_agg
        from smqtk_indexing_ray.stages.attach import sort_attach

        sp_schema = pa.schema([("l_suppkey", pa.int64()),
                               ("units", pa.int64()),
                               ("n_items", pa.int64())])

        def spart(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "l_suppkey" not in t.column_names:
                return sp_schema.empty_table()
            skey = t["l_suppkey"].to_numpy(zero_copy_only=False)
            units = _revenue_units(t)
            uniq, inv = np.unique(skey, return_inverse=True)
            out = np.zeros(len(uniq), np.int64)
            np.add.at(out, inv, units)
            cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
            return pa.table({
                "l_suppkey": pa.array(uniq.astype(np.int64)),
                "units": pa.array(out),
                "n_items": pa.array(cnt),
            }, schema=sp_schema)

        per_sup = sorted_group_agg(
            lineitem.select_columns(
                ["l_suppkey", "l_extendedprice", "l_discount"]
            ).map_batches(spart, batch_format="pyarrow"),
            key="l_suppkey", aggs={"units": "sum", "n_items": "sum"},
            schema=sp_schema)
        att = sort_attach(
            per_sup, sup_sel, key="l_suppkey",
            payload_key="s_suppkey", payload_cols=["s_nationkey"],
            how="inner", rows_schema=sp_schema,
            payload_schema=sup_schema)
        nk_keys = np.array(sorted(nmap), np.int64)
        nk_r = np.array([nmap[int(k)][0] for k in nk_keys], object)
        nk_n = np.array([nmap[int(k)][1] for k in nk_keys], object)

        def to_names(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "s_nationkey" not in t.column_names:
                return part_schema.empty_table()
            nk = t["s_nationkey"].to_numpy(zero_copy_only=False)
            idx = np.clip(np.searchsorted(nk_keys, nk), 0,
                          max(len(nk_keys) - 1, 0))
            if len(nk_keys) == 0 or not (nk_keys[idx] == nk).all():
                # the broadcast path fails loudly at smap build on an
                # FK violation — match that instead of silently
                # attributing revenue to the neighboring nation
                raise ValueError(
                    "supplier_nation_volume: s_nationkey missing from "
                    "the nation dimension")
            return pa.table({
                "r_name": pa.array(nk_r[idx], pa.string()),
                "n_name": pa.array(nk_n[idx], pa.string()),
                "units": t["units"],
                "n_items": t["n_items"],
            }, schema=part_schema)

        parts = att.map_batches(to_names, batch_format="pyarrow")

    out = parts.groupby(["r_name", "n_name"]).aggregate(
        Sum("units", alias_name="units"),
        Sum("n_items", alias_name="n_items"))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "units" not in t.column_names:
            return out_schema.empty_table()
        u = t["units"].to_numpy(zero_copy_only=False)
        return pa.table({
            "r_name": t["r_name"],
            "n_name": t["n_name"],
            "revenue": pa.array(u / 10000.0),
            "n_items": t["n_items"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def pricing_summary(lineitem, *, cutoff: str = "1998-09-02"):
    """TPC-H-Q1-shaped pricing summary: per ``(l_returnflag,
    l_linestatus)`` totals and averages over lineitems shipped on or
    before ``cutoff``.

    The combiner shape taken to its extreme: the group key has ~6
    distinct values, so each batch pre-reduces ~10^5 fact rows to ≤6
    partial rows and the shuffle moves only #groups x #batches scalars.
    All money math is exact int64 units (cents, cents x basis points,
    cents x bp x bp — 1e-6-dollar units; a 100-TB deployment would
    promote the charge accumulator to int128/split-sum, noted here
    because cents x bp x bp sums cross 2^53 around 10^9 rows/group).
    Averages are int64-over-int64 IEEE divisions, bit-identical to the
    SQL oracle's ``BIGINT / (count(*) * 1.0)`` forms.

    Output: ``l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, sum_charge, avg_qty, avg_price, avg_disc,
    count_order``.
    """
    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    part_schema = pa.schema([
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("qty", pa.int64()), ("base_cents", pa.int64()),
        ("disc_units", pa.int64()), ("charge_units", pa.int64()),
        ("disc_bp", pa.int64()), ("count_order", pa.int64())])
    cut = np.datetime64(cutoff)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_returnflag" not in t.column_names:
            return part_schema.empty_table()
        keep = t["l_shipdate"].to_numpy(zero_copy_only=False) <= cut
        if not keep.any():
            return part_schema.empty_table()
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)[keep]
        status = t["l_linestatus"].to_numpy(zero_copy_only=False)[keep]
        qty = np.rint(t["l_quantity"].to_numpy(
            zero_copy_only=False)[keep]).astype(np.int64)
        cents = np.rint(t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        dbp = np.rint(t["l_discount"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        tbp = np.rint(t["l_tax"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        # factorize the two ~3-value string keys separately and fuse
        # the int codes — no per-row string work
        uf, fi = np.unique(flag, return_inverse=True)
        us, si = np.unique(status, return_inverse=True)
        code = fi * len(us) + si
        ncode = len(uf) * len(us)
        disc_units = cents * (100 - dbp)
        charge_units = disc_units * (100 + tbp)
        sums = {}
        for name, v in (("qty", qty), ("base_cents", cents),
                        ("disc_units", disc_units),
                        ("charge_units", charge_units),
                        ("disc_bp", dbp)):
            acc = np.zeros(ncode, np.int64)
            np.add.at(acc, code, v)
            sums[name] = acc
        cnt = np.bincount(code, minlength=ncode).astype(np.int64)
        present = cnt > 0
        return pa.table({
            "l_returnflag": pa.array(
                np.repeat(uf, len(us))[present], pa.string()),
            "l_linestatus": pa.array(
                np.tile(us, len(uf))[present], pa.string()),
            "qty": pa.array(sums["qty"][present]),
            "base_cents": pa.array(sums["base_cents"][present]),
            "disc_units": pa.array(sums["disc_units"][present]),
            "charge_units": pa.array(sums["charge_units"][present]),
            "disc_bp": pa.array(sums["disc_bp"][present]),
            "count_order": pa.array(cnt[present]),
        }, schema=part_schema)

    parts = lineitem.select_columns(
        ["l_returnflag", "l_linestatus", "l_shipdate", "l_quantity",
         "l_extendedprice", "l_discount", "l_tax"]).map_batches(
        partial, batch_format="pyarrow")
    agg = sorted_group_agg(
        parts, key=["l_returnflag", "l_linestatus"],
        aggs={"qty": "sum", "base_cents": "sum", "disc_units": "sum",
              "charge_units": "sum", "disc_bp": "sum",
              "count_order": "sum"},
        schema=part_schema)

    out_schema = pa.schema([
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("sum_qty", pa.int64()), ("sum_base_price", pa.float64()),
        ("sum_disc_price", pa.float64()), ("sum_charge", pa.float64()),
        ("avg_qty", pa.float64()), ("avg_price", pa.float64()),
        ("avg_disc", pa.float64()), ("count_order", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "qty" not in t.column_names:
            return out_schema.empty_table()
        qty = t["qty"].to_numpy(zero_copy_only=False)
        cents = t["base_cents"].to_numpy(zero_copy_only=False)
        du = t["disc_units"].to_numpy(zero_copy_only=False)
        cu = t["charge_units"].to_numpy(zero_copy_only=False)
        dbp = t["disc_bp"].to_numpy(zero_copy_only=False)
        cnt = t["count_order"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pa.array(qty),
            "sum_base_price": pa.array(cents / 100.0),
            "sum_disc_price": pa.array(du / 10000.0),
            "sum_charge": pa.array(cu / 1000000.0),
            "avg_qty": pa.array(qty / cnt),
            "avg_price": pa.array(cents / (cnt * 100.0)),
            "avg_disc": pa.array(dbp / (cnt * 100.0)),
            "count_order": pa.array(cnt),
        }, schema=out_schema)

    return agg.map_batches(finish, batch_format="pyarrow")


def order_priority_counts(lineitem, orders):
    """TPC-H-Q4-shaped order-priority check: per ``o_orderpriority``,
    how many orders have at least one lineitem shipped AFTER the order
    date (``EXISTS`` semi-join).

    The semi-join is decomposed into aggregates so no row-level join
    ever runs: lineitem pre-reduces per batch to its distinct order
    keys' max shipdate, one ``sorted_group_agg`` collapses that to one
    row per order, a sort-merge ``sort_attach`` brings in the order
    date + priority, and the EXISTS predicate becomes a vectorized
    ``max_ship > order_date`` filter before a ~5-key count rollup.
    Everything that crosses a shuffle is one row per distinct order
    key — never a lineitem row.

    Output: ``o_orderpriority, order_count`` (exact int64).
    """
    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.attach import sort_attach

    ship_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("ship_us", pa.int64())])

    def lpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return ship_schema.empty_table()
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
        ship = t["l_shipdate"].to_numpy(
            zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        uniq, inv = np.unique(okey, return_inverse=True)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ship)
        return pa.table({"l_orderkey": pa.array(uniq.astype(np.int64)),
                         "ship_us": pa.array(mx)}, schema=ship_schema)

    oship = sorted_group_agg(
        lineitem.select_columns(["l_orderkey", "l_shipdate"])
        .map_batches(lpart, batch_format="pyarrow"),
        key="l_orderkey", aggs={"ship_us": "max"}, schema=ship_schema)

    with_ord = sort_attach(
        oship, orders.select_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]),
        key="l_orderkey", payload_key="o_orderkey",
        payload_cols=["o_orderdate", "o_orderpriority"], how="inner",
        rows_schema=ship_schema,
        payload_schema=pa.schema([("o_orderkey", pa.int64()),
                                  ("o_orderdate", pa.timestamp("us")),
                                  ("o_orderpriority", pa.string())]))

    part_schema = pa.schema([("o_orderpriority", pa.string()),
                             ("order_count", pa.int64())])

    def ppart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderpriority" not in t.column_names:
            return part_schema.empty_table()
        ship = t["ship_us"].to_numpy(zero_copy_only=False)
        odate = t["o_orderdate"].to_numpy(
            zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        late = ship > odate
        if not late.any():
            return part_schema.empty_table()
        prio = t["o_orderpriority"].to_numpy(
            zero_copy_only=False)[late]
        uniq, counts = np.unique(prio, return_counts=True)
        return pa.table({
            "o_orderpriority": pa.array(uniq, pa.string()),
            "order_count": pa.array(counts.astype(np.int64)),
        }, schema=part_schema)

    return sorted_group_agg(
        with_ord.map_batches(ppart, batch_format="pyarrow"),
        key="o_orderpriority", aggs={"order_count": "sum"},
        schema=part_schema)


def top_customer_revenue(lineitem, orders, customer, *, k: int = 10):
    """Top-k customers by revenue within each market segment.

    ``revenue = sum(l_extendedprice * (1 - l_discount))`` rolled up
    lineitem -> order -> customer, segment attached from the dimension
    table, then per-segment top-k.  Two combiner-shaped aggregations +
    two sort-merge attaches + one top-k sort.  All revenue arithmetic
    is exact int64 units (:func:`_revenue_units`) — ranking compares
    integers, so ties and float-order artifacts cannot diverge from
    the SQL window oracle.

    Output: ``c_mktsegment, c_custkey, revenue, rank``.
    """
    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.attach import sort_attach
    from smqtk_indexing_ray.stages.topk import top_k_per_group

    orev_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("units", pa.int64())])

    def lpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return orev_schema.empty_table()
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
        units = _revenue_units(t)
        uniq, inv = np.unique(okey, return_inverse=True)
        out = np.zeros(len(uniq), np.int64)
        np.add.at(out, inv, units)
        return pa.table({"l_orderkey": pa.array(uniq.astype(np.int64)),
                         "units": pa.array(out)})

    lrev = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lpart, batch_format="pyarrow")
    # sort-based grouped sum: a hash groupby here costs ~5 s of
    # aggregator-actor spin-up where the sort costs <1 s (measured,
    # stages/agg.py module docstring)
    orev = sorted_group_agg(lrev, key="l_orderkey",
                            aggs={"units": "sum"}, schema=orev_schema)

    with_cust = sort_attach(
        orev, orders.select_columns(["o_orderkey", "o_custkey"]),
        key="l_orderkey", payload_key="o_orderkey",
        payload_cols=["o_custkey"], how="inner",
        rows_schema=orev_schema,
        payload_schema=pa.schema([("o_orderkey", pa.int64()),
                                  ("o_custkey", pa.int64())]))

    crev_schema = pa.schema([("o_custkey", pa.int64()),
                             ("units", pa.int64())])

    def cpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return crev_schema.empty_table()
        ckey = t["o_custkey"].to_numpy(zero_copy_only=False)
        units = t["units"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ckey, return_inverse=True)
        out = np.zeros(len(uniq), np.int64)
        np.add.at(out, inv, units)
        return pa.table({"o_custkey": pa.array(uniq.astype(np.int64)),
                         "units": pa.array(out)})

    crev = sorted_group_agg(
        with_cust.map_batches(cpart, batch_format="pyarrow"),
        key="o_custkey", aggs={"units": "sum"}, schema=crev_schema)

    with_seg = sort_attach(
        crev, customer.select_columns(["c_custkey", "c_mktsegment"]),
        key="o_custkey", payload_key="c_custkey",
        payload_cols=["c_mktsegment"], how="inner",
        rows_schema=crev_schema,
        payload_schema=pa.schema([("c_custkey", pa.int64()),
                                  ("c_mktsegment", pa.string())]))

    seg_schema = pa.schema([("o_custkey", pa.int64()),
                            ("units", pa.int64()),
                            ("c_mktsegment", pa.string())])
    top = top_k_per_group(with_seg, group="c_mktsegment",
                          order="units", tiebreak="o_custkey", k=k,
                          schema=seg_schema)

    out_schema = pa.schema([("c_mktsegment", pa.string()),
                            ("c_custkey", pa.int64()),
                            ("revenue", pa.float64()),
                            ("rank", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "units" not in t.column_names:
            return out_schema.empty_table()
        u = t["units"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "c_custkey": t["o_custkey"],
            "revenue": pa.array(u / 10000.0),
            "rank": t["rank"],
        })

    return top.map_batches(finish, batch_format="pyarrow")


def promo_revenue_share(lineitem, part, *,
                        start: str = "1996-01-01",
                        end: str = "1997-01-01",
                        max_dim_rows: int = WAREHOUSE_DIM_MAX_ROWS):
    """TPC-H-Q14-shaped promotion revenue share: of all revenue shipped
    in ``[start, end)``, what percentage came from parts of type
    ``PROMO``.

    The part dimension (thousands of rows) never crosses a shuffle: its
    promo partkeys are collected driver-side into ONE sorted int64
    array, ``ray.put`` once, and membership-tested per batch with a
    vectorized ``searchsorted`` — the broadcast-semi-join shape for a
    small dimension against a 100-TB fact table.  Each batch reduces to
    a single partial row (promo/total unit sums + counts), so the final
    "shuffle" moves one row per batch.  A part dimension above
    ``max_dim_rows`` swaps the broadcast for the sort-merge path:
    per-batch partkey partials collapse through one sorted aggregate
    and the promo flag attaches by ``sort_attach`` — same output
    bit-for-bit.  Money math is exact int64 units
    (:func:`_revenue_units`); the output percentage is one
    ``100.0 * int64 / int64`` IEEE expression, bit-identical to the SQL
    oracle's.

    Output (one row): ``promo_revenue, n_promo_items, n_items``.

    Reference analog: none — broadcast-dimension scans are outside the
    reference's NN-index scope; the driver-side small-side collect
    mirrors its bounded model-artifact loads
    (/root/reference/smqtk_indexing/impls/nn_index/faiss.py:520-534).
    """
    import ray

    from smqtk_indexing_ray.stages._util import collect_table
    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    s64 = np.datetime64(start)
    e64 = np.datetime64(end)

    part_schema = pa.schema([
        ("g", pa.int64()), ("promo_units", pa.int64()),
        ("units", pa.int64()), ("n_promo_items", pa.int64()),
        ("n_items", pa.int64())])
    part_sel = part.select_columns(["p_partkey", "p_type"])
    lcols = ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]

    if part_sel.count() <= max_dim_rows:
        pt = collect_table(
            part_sel,
            pa.schema([("p_partkey", pa.int64()),
                       ("p_type", pa.string())]))
        promo_keys = np.sort(
            pt.filter(pc.equal(pt["p_type"], "PROMO"))["p_partkey"]
            .to_numpy(zero_copy_only=False).astype(np.int64))
        promo_ref = ray.put(promo_keys)

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "l_partkey" not in t.column_names:
                return part_schema.empty_table()
            ship = t["l_shipdate"].to_numpy(zero_copy_only=False)
            keep = (ship >= s64) & (ship < e64)
            if not keep.any():
                return part_schema.empty_table()
            pk = t["l_partkey"].to_numpy(zero_copy_only=False)[keep]
            units = _revenue_units(t)[keep]
            keys = ray.get(promo_ref)
            pos = np.searchsorted(keys, pk)
            is_promo = ((pos < len(keys))
                        & (keys[np.minimum(pos, max(len(keys) - 1, 0))]
                           == pk)) if len(keys) \
                else np.zeros(len(pk), bool)
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "promo_units": pa.array([int(units[is_promo].sum())]),
                "units": pa.array([int(units.sum())]),
                "n_promo_items": pa.array([int(is_promo.sum())]),
                "n_items": pa.array([int(keep.sum())]),
            }, schema=part_schema)

        parts = lineitem.select_columns(lcols).map_batches(
            partial, batch_format="pyarrow")
    else:
        # sort-merge fallback: partkey partials -> one row/part ->
        # promo-flag attach -> one global partial row per batch
        from smqtk_indexing_ray.stages.attach import sort_attach

        pp_schema = pa.schema([("l_partkey", pa.int64()),
                               ("units", pa.int64()),
                               ("n_items", pa.int64())])

        def ppart(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "l_partkey" not in t.column_names:
                return pp_schema.empty_table()
            ship = t["l_shipdate"].to_numpy(zero_copy_only=False)
            keep = (ship >= s64) & (ship < e64)
            if not keep.any():
                return pp_schema.empty_table()
            pk = t["l_partkey"].to_numpy(zero_copy_only=False)[keep]
            units = _revenue_units(t)[keep]
            uniq, inv = np.unique(pk, return_inverse=True)
            usum = np.zeros(len(uniq), np.int64)
            np.add.at(usum, inv, units)
            cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
            return pa.table({
                "l_partkey": pa.array(uniq.astype(np.int64)),
                "units": pa.array(usum),
                "n_items": pa.array(cnt),
            }, schema=pp_schema)

        per_part = sorted_group_agg(
            lineitem.select_columns(lcols).map_batches(
                ppart, batch_format="pyarrow"),
            key="l_partkey", aggs={"units": "sum", "n_items": "sum"},
            schema=pp_schema)

        flag_schema = pa.schema([("p_partkey", pa.int64()),
                                 ("is_promo", pa.int64())])

        def flag(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "p_partkey" not in t.column_names:
                return flag_schema.empty_table()
            return pa.table({
                "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                "is_promo": pc.cast(
                    pc.equal(t["p_type"], "PROMO"), pa.int64()),
            }, schema=flag_schema)

        att = sort_attach(
            per_part, part_sel.map_batches(flag,
                                           batch_format="pyarrow"),
            key="l_partkey", payload_key="p_partkey",
            payload_cols=["is_promo"], how="left",
            rows_schema=pp_schema, payload_schema=flag_schema)

        def fpart(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "is_promo" not in t.column_names:
                return part_schema.empty_table()
            u = t["units"].to_numpy(zero_copy_only=False)
            n = t["n_items"].to_numpy(zero_copy_only=False)
            promo = pc.fill_null(t["is_promo"], 0).to_numpy(
                zero_copy_only=False).astype(bool)
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "promo_units": pa.array([int(u[promo].sum())]),
                "units": pa.array([int(u.sum())]),
                "n_promo_items": pa.array([int(n[promo].sum())]),
                "n_items": pa.array([int(n.sum())]),
            }, schema=part_schema)

        parts = att.map_batches(fpart, batch_format="pyarrow")

    agg = sorted_group_agg(
        parts, key="g",
        aggs={"promo_units": "sum", "units": "sum",
              "n_promo_items": "sum", "n_items": "sum"},
        schema=part_schema)

    out_schema = pa.schema([
        ("promo_revenue", pa.float64()),
        ("n_promo_items", pa.int64()), ("n_items", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "units" not in t.column_names:
            return out_schema.empty_table()
        p = t["promo_units"].to_numpy(zero_copy_only=False)
        u = t["units"].to_numpy(zero_copy_only=False)
        return pa.table({
            "promo_revenue": pa.array(100.0 * p / u),
            "n_promo_items": t["n_promo_items"],
            "n_items": t["n_items"],
        }, schema=out_schema)

    return agg.map_batches(finish, batch_format="pyarrow")


def customer_order_distribution(orders, customer):
    """TPC-H-Q13-shaped customer order-count distribution: for each
    order count ``c_count`` (including zero), how many customers placed
    exactly that many orders.

    The groupby-of-groupby shape: orders pre-reduce per batch to
    distinct-custkey counts, one sort collapses them to one row per
    customer, a left sort-merge attach re-enters zero-order customers
    from the dimension table (null -> 0), and the second aggregation is
    again combiner-shaped — each batch reduces to its distinct c_count
    values, so the final shuffle moves O(#distinct counts x #batches)
    rows.  Exact int64 throughout.

    Output: ``c_count, custdist``.
    """
    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.attach import sort_attach

    cnt_schema = pa.schema([("o_custkey", pa.int64()),
                            ("c_count", pa.int64())])

    def opart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return cnt_schema.empty_table()
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(ck, return_counts=True)
        return pa.table({"o_custkey": pa.array(uniq.astype(np.int64)),
                         "c_count": pa.array(counts.astype(np.int64))},
                        schema=cnt_schema)

    per_cust = sorted_group_agg(
        orders.select_columns(["o_custkey"]).map_batches(
            opart, batch_format="pyarrow"),
        key="o_custkey", aggs={"c_count": "sum"}, schema=cnt_schema)

    with_all = sort_attach(
        customer.select_columns(["c_custkey"]), per_cust,
        key="c_custkey", payload_key="o_custkey",
        payload_cols=["c_count"], how="left",
        rows_schema=pa.schema([("c_custkey", pa.int64())]),
        payload_schema=cnt_schema)

    hist_schema = pa.schema([("c_count", pa.int64()),
                             ("custdist", pa.int64())])

    def hpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_count" not in t.column_names:
            return hist_schema.empty_table()
        import pyarrow.compute as pc
        c = pc.fill_null(t["c_count"], 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, counts = np.unique(c, return_counts=True)
        return pa.table({"c_count": pa.array(uniq),
                         "custdist": pa.array(counts.astype(np.int64))},
                        schema=hist_schema)

    return sorted_group_agg(
        with_all.map_batches(hpart, batch_format="pyarrow"),
        key="c_count", aggs={"custdist": "sum"}, schema=hist_schema)


def local_supplier_volume(lineitem, orders, customer, supplier, nation,
                          region, *, r_name: str = "ASIA",
                          start: str = "1996-01-01",
                          end: str = "1997-01-01",
                          max_dim_rows: int = WAREHOUSE_DIM_MAX_ROWS):
    """TPC-H-Q5-shaped local-supplier volume: revenue per nation from
    lineitems whose SUPPLIER and ordering CUSTOMER share a nation
    inside one region, over one order-date year.

    The deepest join chain in the suite (six tables), decomposed by
    side size instead of executed as six pairwise joins:

    - the ``supplier -> nation -> region`` dimension chain composes
      DRIVER-side into one ``suppkey -> nationkey`` map restricted to
      the target region (TPC-H suppliers are 1/600 of lineitems by
      construction), broadcast once via ``ray.put``; a supplier
      dimension above ``max_dim_rows`` swaps that broadcast for a
      sort-merge ``sort_attach`` of ``s_nationkey`` onto per-batch
      ``(l_orderkey, l_suppkey)`` partials (the region filter then
      runs against the constant-size nation chain) — same output;
    - ``orders`` is date-filtered at the read projection, then the
      customer's nationkey is attached by the sort-merge
      ``sort_attach`` (both sides are fact-scale);
    - ``lineitem`` pre-reduces per batch to distinct
      ``(l_orderkey, s_nationkey)`` partial sums AFTER the region
      filter, so the widest exchange carries one row per
      (order, supplier-nation) — never a lineitem row — and the
      same-nation predicate becomes a vectorized equality filter after
      the second attach.

    Output: ``n_name, revenue, n_items`` — revenue in exact int64
    units of 1e-4 dollars divided once at the end
    (:func:`_revenue_units`), so the DuckDB oracle matches
    bit-for-bit.
    """
    import ray

    from smqtk_indexing_ray.stages._util import collect_table
    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.attach import sort_attach

    # --- dimension chain -> region-filtered nationkey -> name map
    # (nation/region are constant-size by spec; supplier is gated)
    _rmap, nmap = _nation_region_maps(nation, region)
    nname = {k: nm for k, (rn, nm) in nmap.items() if rn == r_name}

    start_us = np.datetime64(start, "us").view(np.int64)
    end_us = np.datetime64(end, "us").view(np.int64)

    ord_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_custkey", pa.int64())])

    def ofilter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return ord_schema.empty_table()
        od = t["o_orderdate"].to_numpy(
            zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        keep = (od >= start_us) & (od < end_us)
        return pa.table({
            "o_orderkey": t["o_orderkey"].filter(pa.array(keep)),
            "o_custkey": t["o_custkey"].filter(pa.array(keep)),
        }, schema=ord_schema)

    ordf = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ofilter, batch_format="pyarrow")

    with_cnat = sort_attach(
        ordf, customer.select_columns(["c_custkey", "c_nationkey"]),
        key="o_custkey", payload_key="c_custkey",
        payload_cols=["c_nationkey"], how="inner",
        rows_schema=ord_schema,
        payload_schema=pa.schema([("c_custkey", pa.int64()),
                                  ("c_nationkey", pa.int64())]))

    onat_schema = pa.schema([("o_orderkey", pa.int64()),
                             ("c_nationkey", pa.int64())])

    def oslim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return onat_schema.empty_table()
        return t.select(["o_orderkey", "c_nationkey"])

    onat = with_cnat.map_batches(oslim, batch_format="pyarrow")

    # --- lineitem: region-filter via the broadcast map, then reduce
    # per batch to distinct (l_orderkey, s_nationkey) partial sums
    lpart_schema = pa.schema([("l_orderkey", pa.int64()),
                              ("s_nationkey", pa.int64()),
                              ("units", pa.int64()),
                              ("n_items", pa.int64())])
    lcols = ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    sup_sel = supplier.select_columns(["s_suppkey", "s_nationkey"])
    sup_schema = pa.schema([("s_suppkey", pa.int64()),
                            ("s_nationkey", pa.int64())])

    if sup_sel.count() <= max_dim_rows:
        sup = collect_table(sup_sel, sup_schema)
        smap = {k: nk for k, nk in zip(sup["s_suppkey"].to_pylist(),
                                       sup["s_nationkey"].to_pylist())
                if nk in nname}
        smap_ref = ray.put(smap)

        def lpart(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "l_orderkey" not in t.column_names:
                return lpart_schema.empty_table()
            m = ray.get(smap_ref)
            skey = t["l_suppkey"].to_numpy(zero_copy_only=False)
            uniq_s, inv_s = np.unique(skey, return_inverse=True)
            snat = np.array([m.get(int(s), -1) for s in uniq_s],
                            dtype=np.int64)[inv_s]
            keep = snat >= 0
            if not keep.any():
                return lpart_schema.empty_table()
            okey = t["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
            snat = snat[keep]
            units = _revenue_units(t)[keep]
            # nationkeys are < 32 (TPC-H has 25): pack (orderkey,
            # nation) into one int64 so the reduce is one np.unique
            if snat.max() >= 32 or okey.max() >= (1 << 58):
                raise ValueError(
                    "local_supplier_volume: key packing bounds "
                    "exceeded (nationkey >= 32 or orderkey >= 2**58)")
            packed = (okey << 5) | snat
            uniq, inv = np.unique(packed, return_inverse=True)
            usum = np.zeros(len(uniq), np.int64)
            np.add.at(usum, inv, units)
            cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
            return pa.table({
                "l_orderkey": pa.array((uniq >> 5).astype(np.int64)),
                "s_nationkey": pa.array((uniq & 31).astype(np.int64)),
                "units": pa.array(usum),
                "n_items": pa.array(cnt),
            }, schema=lpart_schema)

        lrev = lineitem.select_columns(lcols).map_batches(
            lpart, batch_format="pyarrow")
    else:
        # sort-merge fallback: (l_orderkey, l_suppkey) partials ->
        # s_nationkey attach -> region filter against the constant-size
        # nation chain; downstream is identical (lrev keeps its schema)
        lsp_schema = pa.schema([("l_orderkey", pa.int64()),
                                ("l_suppkey", pa.int64()),
                                ("units", pa.int64()),
                                ("n_items", pa.int64())])

        def lpart_fb(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "l_orderkey" not in t.column_names:
                return lsp_schema.empty_table()
            okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
            skey = t["l_suppkey"].to_numpy(zero_copy_only=False)
            units = _revenue_units(t)
            order = np.lexsort((skey, okey))
            ok_s, sk_s, u_s = okey[order], skey[order], units[order]
            head = np.concatenate([[True], (ok_s[1:] != ok_s[:-1])
                                   | (sk_s[1:] != sk_s[:-1])])
            starts = np.flatnonzero(head)
            cnt = np.diff(np.append(starts, len(ok_s))).astype(np.int64)
            usum = np.add.reduceat(u_s, starts)
            return pa.table({
                "l_orderkey": pa.array(ok_s[starts].astype(np.int64)),
                "l_suppkey": pa.array(sk_s[starts].astype(np.int64)),
                "units": pa.array(usum.astype(np.int64)),
                "n_items": pa.array(cnt),
            }, schema=lsp_schema)

        lsp = lineitem.select_columns(lcols).map_batches(
            lpart_fb, batch_format="pyarrow")
        att = sort_attach(
            lsp, sup_sel, key="l_suppkey", payload_key="s_suppkey",
            payload_cols=["s_nationkey"], how="inner",
            rows_schema=lsp_schema, payload_schema=sup_schema)
        local_keys = np.array(sorted(nname), np.int64)

        def region_filter(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "s_nationkey" not in t.column_names:
                return lpart_schema.empty_table()
            nk = t["s_nationkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(local_keys, nk), 0,
                          max(len(local_keys) - 1, 0))
            keep = (local_keys[pos] == nk) if len(local_keys) \
                else np.zeros(len(nk), bool)
            mask = pa.array(keep)
            return pa.table({
                "l_orderkey": pc.cast(t["l_orderkey"].filter(mask),
                                      pa.int64()),
                "s_nationkey": pc.cast(t["s_nationkey"].filter(mask),
                                       pa.int64()),
                "units": t["units"].filter(mask),
                "n_items": t["n_items"].filter(mask),
            }, schema=lpart_schema)

        lrev = att.map_batches(region_filter, batch_format="pyarrow")

    joined = sort_attach(
        lrev, onat, key="l_orderkey", payload_key="o_orderkey",
        payload_cols=["c_nationkey"], how="inner",
        rows_schema=lpart_schema, payload_schema=onat_schema)

    nat_schema = pa.schema([("s_nationkey", pa.int64()),
                            ("units", pa.int64()),
                            ("n_items", pa.int64())])

    def local_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_nationkey" not in t.column_names:
            return nat_schema.empty_table()
        snat = t["s_nationkey"].to_numpy(zero_copy_only=False)
        cnat = t["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = snat == cnat
        if not keep.any():
            return nat_schema.empty_table()
        snat = snat[keep]
        units = t["units"].to_numpy(zero_copy_only=False)[keep]
        items = t["n_items"].to_numpy(zero_copy_only=False)[keep]
        uniq, inv = np.unique(snat, return_inverse=True)
        usum = np.zeros(len(uniq), np.int64)
        np.add.at(usum, inv, units)
        isum = np.zeros(len(uniq), np.int64)
        np.add.at(isum, inv, items)
        return pa.table({
            "s_nationkey": pa.array(uniq.astype(np.int64)),
            "units": pa.array(usum),
            "n_items": pa.array(isum),
        }, schema=nat_schema)

    pernat = sorted_group_agg(
        joined.map_batches(local_only, batch_format="pyarrow"),
        key="s_nationkey", aggs={"units": "sum", "n_items": "sum"},
        schema=nat_schema)

    out_schema = pa.schema([("n_name", pa.string()),
                            ("revenue", pa.float64()),
                            ("n_items", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "units" not in t.column_names:
            return out_schema.empty_table()
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False)
        u = t["units"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([nname[int(k)] for k in nk], pa.string()),
            "revenue": pa.array(u / 10000.0),
            "n_items": t["n_items"],
        }, schema=out_schema)

    return pernat.map_batches(finish, batch_format="pyarrow")


SHIPPING_PRIORITY_SCHEMA = pa.schema([
    ("o_orderkey", pa.int64()), ("revenue", pa.float64()),
    ("o_orderdate", pa.timestamp("us")),
    ("o_orderpriority", pa.string()), ("rank", pa.int64()),
])


def shipping_priority(lineitem, orders, *, cutoff: str = "1997-06-01",
                      k: int = 10):
    """TPC-H-Q3-shaped shipping priority: the ``k`` highest-revenue
    orders placed before ``cutoff`` whose lineitems ship after it (the
    "booked but unshipped backlog" view).

    Per-batch per-order revenue partials (exact int64 units,
    :func:`_revenue_units`) with the ship-date filter applied inside
    the kernel, one sorted grouped sum, one sort-merge attach against
    the date-filtered orders dimension, then a per-batch top-k cut and
    a k x n_batches driver merge — ranking compares integers, so ties
    cannot diverge from the SQL window oracle.

    Output: ``o_orderkey, revenue, o_orderdate, o_orderpriority, rank``.
    """
    import numpy as _np

    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.attach import sort_attach

    cutoff_us = int(_np.datetime64(cutoff, "us").astype(np.int64))
    orev_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("units", pa.int64())])

    def lpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return orev_schema.empty_table()
        ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = ship > cutoff_us
        if not keep.any():
            return orev_schema.empty_table()
        t = t.filter(pa.array(keep))
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
        units = _revenue_units(t)
        uniq, inv = np.unique(okey, return_inverse=True)
        out = np.zeros(len(uniq), np.int64)
        np.add.at(out, inv, units)
        return pa.table({"l_orderkey": pa.array(uniq.astype(np.int64)),
                         "units": pa.array(out)})

    lrev = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount",
         "l_shipdate"]).map_batches(lpart, batch_format="pyarrow")
    orev = sorted_group_agg(lrev, key="l_orderkey",
                            aggs={"units": "sum"}, schema=orev_schema)

    odim_schema = pa.schema([("o_orderkey", pa.int64()),
                             ("o_orderdate_us", pa.int64()),
                             ("o_orderpriority", pa.string())])

    def odim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return odim_schema.empty_table()
        od = pc.cast(t["o_orderdate"], pa.int64())
        t = t.filter(pc.less(od, cutoff_us))
        if t.num_rows == 0:
            return odim_schema.empty_table()
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderdate_us": pc.cast(t["o_orderdate"], pa.int64()),
            "o_orderpriority": t["o_orderpriority"],
        }, schema=odim_schema)

    placed = orders.select_columns(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        odim, batch_format="pyarrow")
    joined = sort_attach(
        orev, placed, key="l_orderkey", payload_key="o_orderkey",
        payload_cols=["o_orderdate_us", "o_orderpriority"], how="inner",
        rows_schema=orev_schema, payload_schema=odim_schema)

    cand_schema = pa.schema([("o_orderkey", pa.int64()),
                             ("units", pa.int64()),
                             ("o_orderdate_us", pa.int64()),
                             ("o_orderpriority", pa.string())])

    def cut(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "units" not in t.column_names:
            return cand_schema.empty_table()
        u = t["units"].to_numpy(zero_copy_only=False)
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, -u))[:k]
        idx = pa.array(order)
        return pa.table({
            "o_orderkey": t["l_orderkey"].take(idx),
            "units": t["units"].take(idx),
            "o_orderdate_us": t["o_orderdate_us"].take(idx),
            "o_orderpriority": t["o_orderpriority"].take(idx),
        }, schema=cand_schema)

    cands = joined.map_batches(cut, batch_format="pyarrow").take_all()
    if not cands:
        return SHIPPING_PRIORITY_SCHEMA.empty_table()
    okey = np.array([r["o_orderkey"] for r in cands], np.int64)
    units = np.array([r["units"] for r in cands], np.int64)
    order = np.lexsort((okey, -units))[:k]
    return pa.table({
        "o_orderkey": pa.array(okey[order]),
        "revenue": pa.array(units[order].astype(np.float64) / 10000.0),
        "o_orderdate": pa.array(
            np.array([cands[i]["o_orderdate_us"] for i in order],
                     np.int64)).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [cands[i]["o_orderpriority"] for i in order], pa.string()),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    }, schema=SHIPPING_PRIORITY_SCHEMA)


LARGE_ORDERS_SCHEMA = pa.schema([
    ("c_custkey", pa.int64()), ("c_name", pa.string()),
    ("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
    ("o_totalprice", pa.float64()), ("total_qty", pa.int64()),
    ("rank", pa.int64()),
])


def large_orders(lineitem, orders, customer, *, min_qty: int = 300,
                 k: int = 100):
    """TPC-H-Q18-shaped large-volume orders: orders whose total
    lineitem quantity exceeds ``min_qty`` (the HAVING semi-join shape),
    joined out to their customer, top-``k`` by order price.

    The HAVING filter runs where it is cheap: lineitem pre-reduces per
    batch to distinct order keys' quantity sums (quantities are exact
    small integers), one ``sorted_group_agg`` collapses those, and the
    ``> min_qty`` cut happens BEFORE any join — at TPC-H selectivity
    (~0.1 % of orders) the two ``sort_attach`` joins see thousandths
    of the fact table.  The final global top-k prunes per batch to
    ``k`` candidates (bounded take_all of k x blocks rows), ranking on
    exact int64 price cents so ties cannot diverge from the SQL window
    oracle.

    Output: ``c_custkey, c_name, o_orderkey, o_orderdate,
    o_totalprice, total_qty, rank`` (rank 1-based by price desc,
    orderkey asc).
    """
    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.attach import sort_attach

    qty_schema = pa.schema([("l_orderkey", pa.int64()),
                            ("total_qty", pa.int64())])

    def lpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return qty_schema.empty_table()
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
        qty = np.rint(t["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        uniq, inv = np.unique(okey, return_inverse=True)
        out = np.zeros(len(uniq), np.int64)
        np.add.at(out, inv, qty)
        return pa.table({"l_orderkey": pa.array(uniq.astype(np.int64)),
                         "total_qty": pa.array(out)}, schema=qty_schema)

    qsum = sorted_group_agg(
        lineitem.select_columns(["l_orderkey", "l_quantity"])
        .map_batches(lpart, batch_format="pyarrow"),
        key="l_orderkey", aggs={"total_qty": "sum"}, schema=qty_schema)

    def having(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "total_qty" not in t.column_names:
            return qty_schema.empty_table()
        return t.filter(pc.greater(t["total_qty"], min_qty))

    big = qsum.map_batches(having, batch_format="pyarrow")

    with_ord = sort_attach(
        big, orders.select_columns(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        key="l_orderkey", payload_key="o_orderkey",
        payload_cols=["o_custkey", "o_orderdate", "o_totalprice"],
        how="inner", rows_schema=qty_schema,
        payload_schema=pa.schema([
            ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_totalprice", pa.float64())]))

    ord_schema = pa.schema([
        ("l_orderkey", pa.int64()), ("total_qty", pa.int64()),
        ("o_custkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
        ("o_totalprice", pa.float64())])

    with_name = sort_attach(
        with_ord, customer.select_columns(["c_custkey", "c_name"]),
        key="o_custkey", payload_key="c_custkey",
        payload_cols=["c_name"], how="inner", rows_schema=ord_schema,
        payload_schema=pa.schema([("c_custkey", pa.int64()),
                                  ("c_name", pa.string())]))

    cand_schema = pa.schema([
        ("o_custkey", pa.int64()), ("c_name", pa.string()),
        ("l_orderkey", pa.int64()), ("date_us", pa.int64()),
        ("cents", pa.int64()), ("total_qty", pa.int64())])

    def cut(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_totalprice" not in t.column_names:
            return cand_schema.empty_table()
        cents = np.rint(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((okey, -cents))[:k]
        idx_a = pa.array(idx.astype(np.int64))
        return pa.table({
            "o_custkey": t["o_custkey"].take(idx_a),
            "c_name": t["c_name"].take(idx_a),
            "l_orderkey": t["l_orderkey"].take(idx_a),
            "date_us": pa.array(t["o_orderdate"].to_numpy(
                zero_copy_only=False).astype(
                "datetime64[us]").view(np.int64)[idx]),
            "cents": pa.array(cents[idx]),
            "total_qty": t["total_qty"].take(idx_a),
        }, schema=cand_schema)

    cands = with_name.map_batches(cut, batch_format="pyarrow").take_all()
    if not cands:
        return LARGE_ORDERS_SCHEMA.empty_table()
    okey = np.array([r["l_orderkey"] for r in cands], np.int64)
    cents = np.array([r["cents"] for r in cands], np.int64)
    order = np.lexsort((okey, -cents))[:k]
    return pa.table({
        "c_custkey": pa.array(
            np.array([cands[i]["o_custkey"] for i in order], np.int64)),
        "c_name": pa.array([cands[i]["c_name"] for i in order],
                           pa.string()),
        "o_orderkey": pa.array(okey[order]),
        "o_orderdate": pa.array(
            np.array([cands[i]["date_us"] for i in order],
                     np.int64)).cast(pa.timestamp("us")),
        "o_totalprice": pa.array(cents[order].astype(np.float64) / 100.0),
        "total_qty": pa.array(
            np.array([cands[i]["total_qty"] for i in order], np.int64)),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    }, schema=LARGE_ORDERS_SCHEMA)


DORMANT_SCHEMA = pa.schema([
    ("n_name", pa.string()), ("numcust", pa.int64()),
    ("totacctbal", pa.float64()),
])


def dormant_customers(customer, orders, nation, *,
                      cutoff: str = "2000-01-01"):
    """TPC-H-Q22-shaped dormant-customer report: per nation, customers
    whose account balance beats the global positive-balance average
    (the broadcast-scalar-subquery shape) and who placed NO order on or
    after ``cutoff`` (the anti-join shape).

    The scalar subquery streams one (sum_cents, n_pos) partial row per
    customer batch and folds them on the driver (bounded by block
    count); the ``balance > avg`` cut is the exact integer cross
    product ``cents * n_pos > sum_cents`` — no float average exists on
    either side, so the comparison cannot diverge from the SQL oracle.
    The anti-join pre-reduces orders per batch to distinct recent
    custkeys, attaches them with a LEFT ``sort_attach``, and keeps the
    null-matched rows; the nation dimension (25 rows) rides the task
    closure.  Only distinct custkeys and ~25-row nation partials ever
    cross a shuffle.

    Output: ``n_name, numcust, totacctbal``.
    """
    from smqtk_indexing_ray.stages._util import collect_table
    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.attach import sort_attach

    import ray.data as rd

    # --- scalar subquery: global avg of positive balances, exact ----
    pos_schema = pa.schema([("s", pa.int64()), ("n", pa.int64())])

    def pos_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_acctbal" not in t.column_names:
            return pos_schema.empty_table()
        cents = np.rint(t["c_acctbal"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        pos = cents[cents > 0]
        if not len(pos):
            return pos_schema.empty_table()
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())},
                        schema=pos_schema)

    parts = customer.select_columns(["c_acctbal"]).map_batches(
        pos_partial, batch_format="pyarrow").take_all()
    if not parts:
        return rd.from_arrow(DORMANT_SCHEMA.empty_table())
    sum_cents = int(sum(r["s"] for r in parts))
    n_pos = int(sum(r["n"] for r in parts))

    # --- anti-join side: distinct custkeys with a recent order -------
    cut_us = np.datetime64(cutoff, "us").view(np.int64)
    act_schema = pa.schema([("o_custkey", pa.int64()),
                            ("n_recent", pa.int64())])

    def opart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return act_schema.empty_table()
        ts = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)[ts >= cut_us]
        uniq = np.unique(ck)
        return pa.table({
            "o_custkey": pa.array(uniq.astype(np.int64)),
            "n_recent": pa.array(np.ones(len(uniq), np.int64)),
        }, schema=act_schema)

    active = sorted_group_agg(
        orders.select_columns(["o_custkey", "o_orderdate"]).map_batches(
            opart, batch_format="pyarrow"),
        key="o_custkey", aggs={"n_recent": "sum"}, schema=act_schema)

    # --- rich customers (exact integer avg comparison) ---------------
    rich_schema = pa.schema([("c_custkey", pa.int64()),
                             ("c_nationkey", pa.int64()),
                             ("cents", pa.int64())])

    def rich(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_acctbal" not in t.column_names:
            return rich_schema.empty_table()
        cents = np.rint(t["c_acctbal"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        keep = (cents > 0) & (cents * n_pos > sum_cents)
        if not keep.any():
            return rich_schema.empty_table()
        return pa.table({
            "c_custkey": t["c_custkey"].filter(pa.array(keep)),
            "c_nationkey": pc.cast(
                t["c_nationkey"].filter(pa.array(keep)), pa.int64()),
            "cents": pa.array(cents[keep]),
        }, schema=rich_schema)

    rich_ds = customer.select_columns(
        ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        rich, batch_format="pyarrow")

    joined = sort_attach(
        rich_ds, active, key="c_custkey", payload_key="o_custkey",
        payload_cols=["n_recent"], how="left", rows_schema=rich_schema,
        payload_schema=act_schema)

    # --- nation rollup with the 25-row dimension in the closure ------
    nat = collect_table(
        nation.select_columns(["n_nationkey", "n_name"]),
        pa.schema([("n_nationkey", pa.int64()), ("n_name", pa.string())]))
    nmap = dict(zip(nat["n_nationkey"].to_pylist(),
                    nat["n_name"].to_pylist()))

    part2 = pa.schema([("n_name", pa.string()), ("numcust", pa.int64()),
                       ("bal_cents", pa.int64())])

    def npart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_recent" not in t.column_names:
            return part2.empty_table()
        dormant = pc.is_null(t["n_recent"])
        if not pc.any(dormant).as_py():
            return part2.empty_table()
        t = t.filter(dormant)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(nk, return_inverse=True)
        bal = np.zeros(len(uniq), np.int64)
        np.add.at(bal, inv, cents)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # inner-join semantics: a nationkey missing from the dimension
        # drops the group, matching the oracle's JOIN (never KeyError)
        names = [nmap.get(int(x)) for x in uniq]
        keep = np.array([nm is not None for nm in names], bool)
        if not keep.any():
            return part2.empty_table()
        return pa.table({
            "n_name": pa.array(
                [nm for nm in names if nm is not None], pa.string()),
            "numcust": pa.array(cnt[keep]),
            "bal_cents": pa.array(bal[keep]),
        }, schema=part2)

    agg = sorted_group_agg(
        joined.map_batches(npart, batch_format="pyarrow"),
        key="n_name", aggs={"numcust": "sum", "bal_cents": "sum"},
        schema=part2)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "bal_cents" not in t.column_names:
            return DORMANT_SCHEMA.empty_table()
        return pa.table({
            "n_name": t["n_name"],
            "numcust": t["numcust"],
            "totacctbal": pa.array(t["bal_cents"].to_numpy(
                zero_copy_only=False).astype(np.float64) / 100.0),
        }, schema=DORMANT_SCHEMA)

    return agg.map_batches(finish, batch_format="pyarrow")


BRAND_SUPPLIER_SCHEMA = pa.schema([
    ("p_brand", pa.string()), ("p_size", pa.int64()),
    ("supplier_cnt", pa.int64()),
])


def brand_supplier_counts(lineitem, part):
    """TPC-H-Q16-shaped supplier diversity: per ``(p_brand, p_size)``,
    how many DISTINCT suppliers shipped that kind of part — the
    count-distinct-after-join shape.

    Distinctness is never a hash distinct aggregate: lineitem
    pre-reduces per batch to its distinct ``(partkey, suppkey)`` pairs,
    one multi-key ``sorted_group_agg`` collapses them globally, the
    part dimension attaches by sort-merge, and a second two-level
    sorted pass (distinct triples -> per-key count) yields the exact
    distinct counts.  Everything crossing a shuffle is a distinct key
    tuple, never a fact row.

    Output: ``p_brand, p_size, supplier_cnt``.
    """
    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    from smqtk_indexing_ray.stages.attach import sort_attach

    ps_schema = pa.schema([("l_partkey", pa.int64()),
                           ("l_suppkey", pa.int64()),
                           ("one", pa.int64())])

    def lpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.column_names:
            return ps_schema.empty_table()
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([pk, sk], axis=1), axis=0)
        return pa.table({
            "l_partkey": pa.array(pairs[:, 0].astype(np.int64)),
            "l_suppkey": pa.array(pairs[:, 1].astype(np.int64)),
            "one": pa.array(np.ones(len(pairs), np.int64)),
        }, schema=ps_schema)

    pairs = sorted_group_agg(
        lineitem.select_columns(["l_partkey", "l_suppkey"]).map_batches(
            lpart, batch_format="pyarrow"),
        key=["l_partkey", "l_suppkey"], aggs={"one": "max"},
        schema=ps_schema)

    with_dim = sort_attach(
        pairs, part.select_columns(["p_partkey", "p_brand", "p_size"]),
        key="l_partkey", payload_key="p_partkey",
        payload_cols=["p_brand", "p_size"], how="inner",
        rows_schema=ps_schema,
        payload_schema=pa.schema([("p_partkey", pa.int64()),
                                  ("p_brand", pa.string()),
                                  ("p_size", pa.int32())]))

    tri_schema = pa.schema([("p_brand", pa.string()),
                            ("p_size", pa.int64()),
                            ("l_suppkey", pa.int64()),
                            ("one", pa.int64())])

    def tpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p_brand" not in t.column_names:
            return tri_schema.empty_table()
        return pa.table({
            "p_brand": t["p_brand"],
            "p_size": pc.cast(t["p_size"], pa.int64()),
            "l_suppkey": t["l_suppkey"],
            "one": t["one"],
        }, schema=tri_schema)

    triples = sorted_group_agg(
        with_dim.map_batches(tpart, batch_format="pyarrow"),
        key=["p_brand", "p_size", "l_suppkey"], aggs={"one": "max"},
        schema=tri_schema)

    cnt_schema = pa.schema([("p_brand", pa.string()),
                            ("p_size", pa.int64()),
                            ("supplier_cnt", pa.int64())])

    def cpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p_brand" not in t.column_names:
            return cnt_schema.empty_table()
        return pa.table({
            "p_brand": t["p_brand"],
            "p_size": t["p_size"],
            "supplier_cnt": t["one"],
        }, schema=cnt_schema)

    return sorted_group_agg(
        triples.map_batches(cpart, batch_format="pyarrow"),
        key=["p_brand", "p_size"], aggs={"supplier_cnt": "sum"},
        schema=cnt_schema)
