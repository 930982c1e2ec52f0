"""Warehouse rollups (pipelines/warehouse.py) vs DuckDB window oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_pricing_summary_matches_duckdb():
    """TPC-H-Q1-shaped rollup vs the exact SQL oracle: int64-unit sums
    and int-over-int IEEE-division averages must match bit-for-bit,
    with the cutoff filter applied and groups straddling blocks."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import pricing_summary

    rng = np.random.default_rng(83)
    n = 5000
    base = np.datetime64("1995-01-01")
    li = pa.table({
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n)),
        "l_quantity": pa.array(
            rng.integers(1, 51, n).astype(np.float64)),
        "l_extendedprice": pa.array(rng.uniform(100, 9000, n).round(2)),
        "l_discount": pa.array(rng.uniform(0, 0.1, n).round(2)),
        "l_tax": pa.array(rng.uniform(0, 0.08, n).round(2)),
        "l_shipdate": pa.array(
            base + rng.integers(0, 2000, n).astype("timedelta64[D]")),
    })
    got = pricing_summary(
        rd.from_arrow(li).repartition(7),
        cutoff="1998-09-02").to_pandas().sort_values(
        ["l_returnflag", "l_linestatus"], ignore_index=True)
    con = duckdb.connect()
    con.register("lineitem", li.to_pandas())
    want = con.execute(
        "SELECT l_returnflag, l_linestatus,"
        " CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
        " AS sum_qty,"
        " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
        " AS BIGINT) / 100.0 AS sum_base_price,"
        " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
        " AS BIGINT) / 10000.0 AS sum_disc_price,"
        " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
        " * (100 + CAST(round(l_tax * 100) AS BIGINT)))"
        " AS BIGINT) / 1000000.0 AS sum_charge,"
        " CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
        " / (count(*) * 1.0) AS avg_qty,"
        " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
        " AS BIGINT) / (count(*) * 100.0) AS avg_price,"
        " CAST(sum(CAST(round(l_discount * 100) AS BIGINT))"
        " AS BIGINT) / (count(*) * 100.0) AS avg_disc,"
        " count(*) AS count_order"
        " FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'"
        " GROUP BY l_returnflag, l_linestatus"
        " ORDER BY l_returnflag, l_linestatus").df()
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col


@pytest.mark.usefixtures("ray_session")
def test_order_priority_counts_matches_duckdb():
    """EXISTS semi-join decomposed into aggregates vs the SQL EXISTS
    oracle, including orders with no lineitems and orders whose every
    lineitem shipped on/before the order date."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import (
        order_priority_counts)

    rng = np.random.default_rng(89)
    n_ord, n_li = 600, 3000
    base = np.datetime64("1996-01-01")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_orderdate": pa.array(
            (base + rng.integers(0, 300, n_ord).astype("timedelta64[D]"))
            .astype("datetime64[us]")),
        "o_orderpriority": pa.array(
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], n_ord)),
    })
    # only ~2/3 of orders have lineitems; ship lag in [-5, 30) days so
    # some orders are entirely on-time
    li_ok = rng.integers(0, (2 * n_ord) // 3, n_li).astype(np.int64)
    odate = orders["o_orderdate"].to_numpy(zero_copy_only=False)
    li = pa.table({
        "l_orderkey": pa.array(li_ok),
        "l_shipdate": pa.array(
            (odate[li_ok]
             + rng.integers(-5, 30, n_li).astype("timedelta64[D]"))
            .astype("datetime64[us]")),
    })
    got = order_priority_counts(
        rd.from_arrow(li).repartition(7),
        rd.from_arrow(orders).repartition(3)).to_pandas().sort_values(
        "o_orderpriority", ignore_index=True)
    con = duckdb.connect()
    con.register("lineitem", li.to_pandas())
    con.register("orders", orders.to_pandas())
    want = con.execute(
        "SELECT o_orderpriority, count(*) AS order_count FROM orders"
        " WHERE EXISTS (SELECT 1 FROM lineitem"
        "  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)"
        " GROUP BY o_orderpriority ORDER BY o_orderpriority").df()
    assert list(got.o_orderpriority) == list(want.o_orderpriority)
    assert list(got.order_count) == list(want.order_count)


@pytest.mark.usefixtures("ray_session")
def test_top_customer_revenue_matches_duckdb():
    """lineitem -> order -> customer revenue rollup + per-segment top-k
    vs the exact SQL window oracle, with order groups straddling
    blocks."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import top_customer_revenue

    rng = np.random.default_rng(79)
    n_li, n_ord, n_cust = 4000, 900, 60
    li = pa.table({
        "l_orderkey": pa.array(
            rng.integers(0, n_ord, n_li).astype(np.int64)),
        "l_extendedprice": pa.array(
            rng.uniform(100, 5000, n_li).round(2)),
        "l_discount": pa.array(rng.uniform(0, 0.1, n_li).round(2)),
    })
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(
            rng.integers(0, n_cust, n_ord).astype(np.int64)),
    })
    cust = pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_mktsegment": pa.array(
            rng.choice(["AUTO", "HOUSE", "MACH"], n_cust)),
    })
    got = top_customer_revenue(
        rd.from_arrow(li).repartition(9),
        rd.from_arrow(orders).repartition(3),
        rd.from_arrow(cust), k=5).to_pandas().sort_values(
        ["c_mktsegment", "rank"], ignore_index=True)
    con = duckdb.connect()
    con.register("lineitem", li.to_pandas())
    con.register("orders", orders.to_pandas())
    con.register("customer", cust.to_pandas())
    want = con.execute(
        "WITH orev AS (SELECT l_orderkey,"
        " sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS units"
        " FROM lineitem GROUP BY l_orderkey),"
        " crev AS (SELECT o_custkey, CAST(sum(units) AS BIGINT)"
        " AS units FROM orev"
        " JOIN orders ON o_orderkey = l_orderkey GROUP BY o_custkey),"
        " r AS (SELECT c_mktsegment, c_custkey, units,"
        " row_number() OVER (PARTITION BY c_mktsegment"
        " ORDER BY units DESC, c_custkey) AS rank"
        " FROM crev JOIN customer ON c_custkey = o_custkey) "
        "SELECT c_mktsegment, c_custkey, units / 10000.0 AS revenue,"
        " rank FROM r WHERE rank <= 5"
        " ORDER BY c_mktsegment, rank").df()
    assert list(got.c_mktsegment) == list(want.c_mktsegment)
    assert list(got.c_custkey) == list(want.c_custkey)
    assert list(got["rank"]) == list(want["rank"])
    # exact-int-unit arithmetic: revenues must match bit-for-bit
    assert list(got.revenue) == list(want.revenue)
