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


@pytest.mark.usefixtures("ray_session")
def test_promo_revenue_share_matches_duckdb():
    """Broadcast promo-partkey semi-join vs the SQL join oracle; the
    window filter, the searchsorted membership test, and the single
    100.0*p/u division must all match bit-for-bit."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import promo_revenue_share

    rng = np.random.default_rng(97)
    n_part, n_li = 300, 4000
    part = pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_type": pa.array(rng.choice(
            ["PROMO", "STANDARD", "LARGE"], n_part)),
    })
    base = np.datetime64("1995-06-01")
    li = pa.table({
        "l_partkey": pa.array(
            rng.integers(0, n_part, n_li).astype(np.int64)),
        "l_shipdate": pa.array(
            base + rng.integers(0, 900, n_li).astype("timedelta64[D]")),
        "l_extendedprice": pa.array(rng.uniform(100, 9000, n_li).round(2)),
        "l_discount": pa.array(rng.uniform(0, 0.1, n_li).round(2)),
    })
    got = promo_revenue_share(
        rd.from_arrow(li).repartition(7), rd.from_arrow(part),
        start="1996-01-01", end="1997-01-01").to_pandas()
    con = duckdb.connect()
    con.register("lineitem", li.to_pandas())
    con.register("part", part.to_pandas())
    want = con.execute(
        "SELECT 100.0 * CAST(sum(units) FILTER (is_promo) AS BIGINT)"
        " / CAST(sum(units) AS BIGINT) AS promo_revenue,"
        " count(*) FILTER (is_promo) AS n_promo_items,"
        " count(*) AS n_items FROM ("
        " SELECT CAST(round(l_extendedprice * 100) AS BIGINT)"
        "  * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS units,"
        "  p_type = 'PROMO' AS is_promo"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
        " AND l_shipdate < TIMESTAMP '1997-01-01')").df()
    assert len(got) == 1
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col


@pytest.mark.usefixtures("ray_session")
def test_promo_revenue_share_no_promo_parts():
    """Zero promo parts: membership test on an empty key array must not
    crash; share is exactly 0.0."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import promo_revenue_share

    part = pa.table({
        "p_partkey": pa.array([0, 1], pa.int64()),
        "p_type": pa.array(["STANDARD", "LARGE"]),
    })
    li = pa.table({
        "l_partkey": pa.array([0, 1, 0], pa.int64()),
        "l_shipdate": pa.array(
            np.array(["1996-02-01", "1996-03-01", "1996-04-01"],
                     dtype="datetime64[us]")),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0]),
        "l_discount": pa.array([0.0, 0.05, 0.1]),
    })
    got = promo_revenue_share(
        rd.from_arrow(li), rd.from_arrow(part)).to_pandas()
    assert list(got.promo_revenue) == [0.0]
    assert list(got.n_promo_items) == [0]
    assert list(got.n_items) == [3]


@pytest.mark.usefixtures("ray_session")
def test_customer_order_distribution_matches_duckdb():
    """Order-count histogram vs the SQL left-join oracle, with a block
    of zero-order customers and a hot customer straddling blocks."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import (
        customer_order_distribution)

    rng = np.random.default_rng(101)
    n_cust, n_ord = 400, 2500
    cust = pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
    })
    ck = rng.integers(0, 300, n_ord)      # custkeys 300..399 orderless
    ck[:800] = 7                          # hot customer spans blocks
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(ck.astype(np.int64)),
    })
    got = customer_order_distribution(
        rd.from_arrow(orders).repartition(9),
        rd.from_arrow(cust)).to_pandas().sort_values(
        "c_count", ignore_index=True)
    con = duckdb.connect()
    con.register("orders", orders.to_pandas())
    con.register("customer", cust.to_pandas())
    want = con.execute(
        "SELECT c_count, count(*) AS custdist FROM ("
        " SELECT c.c_custkey, count(o.o_orderkey) AS c_count"
        " FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey"
        " GROUP BY c.c_custkey) GROUP BY c_count ORDER BY c_count").df()
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col


@pytest.mark.usefixtures("ray_session")
def test_local_supplier_volume_matches_duckdb():
    """Q5-shaped six-table chain vs the SQL oracle: region filter,
    order-date year, same-nation supplier/customer predicate, exact
    int64-unit revenue — including orders outside the date window and
    lineitems whose supplier nation differs from the customer's."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import (
        local_supplier_volume)

    rng = np.random.default_rng(311)
    n_nat, n_sup, n_cust, n_ord, n_li = 6, 40, 150, 800, 4000
    region = pa.table({
        "r_regionkey": pa.array(np.arange(2, dtype=np.int64)),
        "r_name": pa.array(["EAST", "WEST"]),
    })
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
        "n_name": pa.array([f"N{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array(
            (np.arange(n_nat) % 2).astype(np.int64)),
    })
    supplier = pa.table({
        "s_suppkey": pa.array(np.arange(n_sup, dtype=np.int64)),
        "s_nationkey": pa.array(
            rng.integers(0, n_nat, n_sup).astype(np.int64)),
    })
    customer = pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_nationkey": pa.array(
            rng.integers(0, n_nat, n_cust).astype(np.int64)),
    })
    base = np.datetime64("1995-06-01")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(
            rng.integers(0, n_cust, n_ord).astype(np.int64)),
        "o_orderdate": pa.array(
            (base + rng.integers(0, 900, n_ord).astype("timedelta64[D]"))
            .astype("datetime64[us]")),
    })
    li = pa.table({
        "l_orderkey": pa.array(
            rng.integers(0, n_ord, n_li).astype(np.int64)),
        "l_suppkey": pa.array(
            rng.integers(0, n_sup, n_li).astype(np.int64)),
        "l_extendedprice": pa.array(rng.uniform(100, 9000, n_li).round(2)),
        "l_discount": pa.array(rng.uniform(0, 0.1, n_li).round(2)),
    })
    got = local_supplier_volume(
        rd.from_arrow(li).repartition(7),
        rd.from_arrow(orders).repartition(5),
        rd.from_arrow(customer).repartition(3),
        rd.from_arrow(supplier),
        rd.from_arrow(nation),
        rd.from_arrow(region),
        r_name="EAST", start="1996-01-01",
        end="1997-01-01").to_pandas().sort_values(
        "n_name", ignore_index=True)
    con = duckdb.connect()
    con.register("lineitem", li.to_pandas())
    con.register("orders", orders.to_pandas())
    con.register("customer", customer.to_pandas())
    con.register("supplier", supplier.to_pandas())
    con.register("nation", nation.to_pandas())
    con.register("region", region.to_pandas())
    want = con.execute(
        "SELECT n_name, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
        " AS BIGINT) / 10000.0 AS revenue, count(*) AS n_items "
        "FROM customer, orders, lineitem, supplier, nation, region "
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey"
        " AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey"
        " AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey"
        " AND r_name = 'EAST'"
        " AND o_orderdate >= TIMESTAMP '1996-01-01'"
        " AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name ORDER BY n_name").df()
    assert len(want) > 0
    assert list(got.n_name) == list(want.n_name)
    assert list(got.revenue) == list(want.revenue)
    assert list(got.n_items) == list(want.n_items)


@pytest.mark.usefixtures("ray_session")
def test_shipping_priority_matches_duckdb():
    """Q3-shaped backlog on a random fact table: both date filters
    applied, revenue ties broken by orderkey, exactly k rows."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import shipping_priority

    rng = np.random.default_rng(29)
    n_orders, n_lines = 400, 3000
    base = np.datetime64("1996-01-01")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
        "o_orderdate": pa.array(
            (base + rng.integers(0, 1000, n_orders).astype(
                "timedelta64[D]")).astype("datetime64[us]")),
        "o_orderpriority": pa.array(
            rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW"], n_orders)),
    })
    li = pa.table({
        "l_orderkey": pa.array(
            rng.integers(0, n_orders, n_lines).astype(np.int64)),
        "l_extendedprice": pa.array(
            rng.uniform(100, 9000, n_lines).round(2)),
        "l_discount": pa.array(rng.uniform(0, 0.1, n_lines).round(2)),
        "l_shipdate": pa.array(
            (base + rng.integers(0, 1000, n_lines).astype(
                "timedelta64[D]")).astype("datetime64[us]")),
    })
    got = shipping_priority(
        rd.from_arrow(li).repartition(6),
        rd.from_arrow(orders).repartition(4),
        cutoff="1997-06-01", k=10).to_pandas()
    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("orders", orders)
    exp = con.execute("""
WITH orev AS (
  SELECT l_orderkey, sum(CAST(round(l_extendedprice*100) AS BIGINT)
    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS units
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-06-01'
  GROUP BY l_orderkey
), j AS (
  SELECT o_orderkey, units, o_orderdate, o_orderpriority
  FROM orev JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderdate < TIMESTAMP '1997-06-01'
)
SELECT o_orderkey, units / 10000.0 AS revenue, o_orderdate,
 o_orderpriority,
 CAST(row_number() OVER (ORDER BY units DESC, o_orderkey) AS BIGINT)
   AS rank
FROM j QUALIFY rank <= 10 ORDER BY rank""").df()
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 10


@pytest.mark.usefixtures("ray_session")
def test_large_orders_matches_duckdb():
    """Q18-shaped HAVING semi-join vs the SQL window oracle: the
    quantity cut applies to the per-order SUM (not per lineitem),
    price ties break by orderkey, and k truncates the ranking."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import large_orders

    rng = np.random.default_rng(97)
    n_ord, n_li, n_cust = 400, 4000, 60
    base = np.datetime64("1996-01-01")
    # prices drawn from a tiny grid so ties are common
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(
            rng.integers(0, n_cust, n_ord).astype(np.int64)),
        "o_orderdate": pa.array(
            (base + rng.integers(0, 900, n_ord).astype("timedelta64[D]"))
            .astype("datetime64[us]")),
        "o_totalprice": pa.array(
            rng.choice([1000.25, 2000.5, 3000.75, 4000.0], n_ord)),
    })
    li = pa.table({
        "l_orderkey": pa.array(
            rng.integers(0, n_ord, n_li).astype(np.int64)),
        "l_quantity": pa.array(
            rng.integers(1, 51, n_li).astype(np.float64)),
    })
    cust = pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
    })
    got = large_orders(
        rd.from_arrow(li).repartition(7),
        rd.from_arrow(orders).repartition(3),
        rd.from_arrow(cust).repartition(2),
        min_qty=180, k=15).to_pandas()
    con = duckdb.connect()
    con.register("lineitem", li.to_pandas())
    con.register("orders", orders.to_pandas())
    con.register("customer", cust.to_pandas())
    want = con.execute(
        "WITH qsum AS (SELECT l_orderkey,"
        " CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
        " AS total_qty FROM lineitem GROUP BY l_orderkey"
        " HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 180),"
        " j AS (SELECT c_custkey, c_name, o_orderkey, o_orderdate,"
        "  CAST(round(o_totalprice * 100) AS BIGINT) AS cents, total_qty"
        "  FROM qsum JOIN orders ON o_orderkey = l_orderkey"
        "  JOIN customer ON c_custkey = o_custkey),"
        " r AS (SELECT *, CAST(row_number() OVER ("
        "  ORDER BY cents DESC, o_orderkey) AS BIGINT) AS rank FROM j) "
        "SELECT c_custkey, c_name, o_orderkey, o_orderdate,"
        " cents / 100.0 AS o_totalprice, total_qty, rank"
        " FROM r WHERE rank <= 15 ORDER BY rank").df()
    assert len(got) == len(want) > 0
    for col in ["c_custkey", "c_name", "o_orderkey", "o_totalprice",
                "total_qty", "rank"]:
        assert list(got[col]) == list(want[col]), col
    assert list(got.o_orderdate) == list(want.o_orderdate)


@pytest.mark.usefixtures("ray_session")
def test_dormant_customers_matches_duckdb():
    """Q22-shaped anti-join vs the SQL EXISTS oracle: negative and zero
    balances are excluded from the average, an order exactly AT the
    cutoff keeps a customer active, and customers with no orders at
    all count as dormant."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import dormant_customers

    rng = np.random.default_rng(101)
    n_cust, n_ord, n_nat = 300, 500, 5
    nkeys = rng.integers(0, n_nat, n_cust).astype(np.int32)
    bals = rng.integers(-50000, 999800, n_cust) / 100.0
    # orphan nationkey on a rich, orderless customer: the inner join
    # must DROP it (matching SQL), never KeyError
    nkeys[n_cust - 1] = 99
    bals[n_cust - 1] = 9999.99
    cust = pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_nationkey": pa.array(nkeys),
        "c_acctbal": pa.array(bals),
    })
    base = np.datetime64("1997-01-01")
    # only the first 2/3 of customers ever order; order dates straddle
    # the cutoff (including exactly at it)
    ok = rng.integers(0, (2 * n_cust) // 3, n_ord).astype(np.int64)
    dates = (base + rng.integers(0, 1200, n_ord).astype(
        "timedelta64[D]")).astype("datetime64[us]")
    dates[0] = np.datetime64("1999-06-15", "us")   # exactly the cutoff
    orders = pa.table({
        "o_custkey": pa.array(ok),
        "o_orderdate": pa.array(dates),
    })
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)]),
    })
    got = dormant_customers(
        rd.from_arrow(cust).repartition(5),
        rd.from_arrow(orders).repartition(3),
        rd.from_arrow(nation),
        cutoff="1999-06-15").to_pandas().sort_values(
        "n_name", ignore_index=True)
    con = duckdb.connect()
    con.register("customer", cust.to_pandas())
    con.register("orders", orders.to_pandas())
    con.register("nation", nation.to_pandas())
    want = con.execute(
        "WITH pos AS (SELECT"
        " CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)"
        " AS s, count(*) AS n FROM customer"
        " WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0),"
        " d AS (SELECT c_custkey, c_nationkey,"
        "  CAST(round(c_acctbal * 100) AS BIGINT) AS cents"
        "  FROM customer, pos"
        "  WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0"
        "  AND CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s"
        "  AND NOT EXISTS (SELECT 1 FROM orders"
        "   WHERE o_custkey = c_custkey"
        "   AND o_orderdate >= TIMESTAMP '1999-06-15')) "
        "SELECT n_name, count(*) AS numcust,"
        " CAST(sum(cents) AS BIGINT) / 100.0 AS totacctbal"
        " FROM d JOIN nation ON n_nationkey = c_nationkey"
        " GROUP BY n_name ORDER BY n_name").df()
    assert len(got) == len(want) > 0
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col


@pytest.mark.usefixtures("ray_session")
def test_brand_supplier_counts_matches_duckdb():
    """Q16-shaped distinct-supplier counts vs the SQL COUNT(DISTINCT)
    oracle: repeated (part, supplier) lineitems across blocks must not
    double-count, and parts never shipped are absent (inner join)."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import (
        brand_supplier_counts)

    rng = np.random.default_rng(103)
    n_part, n_li = 120, 3000
    part = pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_brand": pa.array(
            [f"Brand#{i % 5 + 1}{i % 3 + 1}" for i in range(n_part)]),
        "p_size": pa.array(
            rng.integers(1, 9, n_part).astype(np.int32)),
    })
    # heavy duplication: few suppliers, many lineitems; ~20 parts
    # never shipped
    li = pa.table({
        "l_partkey": pa.array(
            rng.integers(0, n_part - 20, n_li).astype(np.int64)),
        "l_suppkey": pa.array(
            rng.integers(0, 12, n_li).astype(np.int64)),
    })
    got = brand_supplier_counts(
        rd.from_arrow(li).repartition(7),
        rd.from_arrow(part).repartition(3)).to_pandas().sort_values(
        ["p_brand", "p_size"], ignore_index=True)
    con = duckdb.connect()
    con.register("lineitem", li.to_pandas())
    con.register("part", part.to_pandas())
    want = con.execute(
        "SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,"
        " CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt"
        " FROM lineitem JOIN part ON p_partkey = l_partkey"
        " GROUP BY p_brand, p_size ORDER BY p_brand, p_size").df()
    assert len(got) == len(want) > 0
    for col in want.columns:
        assert list(got[col]) == list(want[col]), col


@pytest.mark.usefixtures("ray_session")
def test_dim_gate_fallback_matches_broadcast():
    """max_dim_rows forced to 0 drives the sort-merge dimension
    fallback in all three gated rollups; output must equal the
    broadcast path bit-for-bit (same int64-unit math either way)."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import (
        local_supplier_volume,
        promo_revenue_share,
        supplier_nation_volume,
    )

    rng = np.random.default_rng(311)
    n_nat, n_sup, n_cust, n_ord, n_li = 6, 40, 150, 800, 4000
    region = pa.table({
        "r_regionkey": pa.array(np.arange(2, dtype=np.int64)),
        "r_name": pa.array(["EAST", "WEST"]),
    })
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int64)),
        "n_name": pa.array([f"N{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array(
            (np.arange(n_nat) % 2).astype(np.int64)),
    })
    supplier = pa.table({
        "s_suppkey": pa.array(np.arange(n_sup, dtype=np.int64)),
        "s_nationkey": pa.array(
            rng.integers(0, n_nat, n_sup).astype(np.int64)),
    })
    customer = pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_nationkey": pa.array(
            rng.integers(0, n_nat, n_cust).astype(np.int64)),
    })
    base = np.datetime64("1995-06-01")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(
            rng.integers(0, n_cust, n_ord).astype(np.int64)),
        "o_orderdate": pa.array(
            (base + rng.integers(0, 900, n_ord).astype("timedelta64[D]"))
            .astype("datetime64[us]")),
    })
    li = pa.table({
        "l_orderkey": pa.array(
            rng.integers(0, n_ord, n_li).astype(np.int64)),
        "l_suppkey": pa.array(
            rng.integers(0, n_sup, n_li).astype(np.int64)),
        "l_partkey": pa.array(
            rng.integers(0, 300, n_li).astype(np.int64)),
        "l_shipdate": pa.array(
            (base + rng.integers(0, 900, n_li).astype("timedelta64[D]"))
            .astype("datetime64[us]")),
        "l_extendedprice": pa.array(rng.uniform(100, 9000, n_li).round(2)),
        "l_discount": pa.array(rng.uniform(0, 0.1, n_li).round(2)),
    })
    part = pa.table({
        "p_partkey": pa.array(np.arange(300, dtype=np.int64)),
        "p_type": pa.array(rng.choice(
            ["PROMO", "STANDARD", "LARGE"], 300)),
    })

    def ds(t, parts=1):
        return rd.from_arrow(t).repartition(parts)

    # supplier_nation_volume
    a = supplier_nation_volume(
        ds(li, 7), ds(supplier, 3), ds(nation), ds(region)
    ).to_pandas().sort_values(["r_name", "n_name"], ignore_index=True)
    b = supplier_nation_volume(
        ds(li, 7), ds(supplier, 3), ds(nation), ds(region),
        max_dim_rows=0
    ).to_pandas().sort_values(["r_name", "n_name"], ignore_index=True)
    assert len(a) > 0 and a.equals(b)

    # local_supplier_volume
    kw = dict(r_name="EAST", start="1996-01-01", end="1997-01-01")
    a = local_supplier_volume(
        ds(li, 7), ds(orders, 5), ds(customer, 3), ds(supplier),
        ds(nation), ds(region), **kw).to_pandas().sort_values(
        "n_name", ignore_index=True)
    b = local_supplier_volume(
        ds(li, 7), ds(orders, 5), ds(customer, 3), ds(supplier),
        ds(nation), ds(region), max_dim_rows=0,
        **kw).to_pandas().sort_values("n_name", ignore_index=True)
    assert len(a) > 0 and a.equals(b)

    # promo_revenue_share
    a = promo_revenue_share(
        ds(li, 7), ds(part, 3), start="1996-01-01",
        end="1997-01-01").to_pandas()
    b = promo_revenue_share(
        ds(li, 7), ds(part, 3), start="1996-01-01", end="1997-01-01",
        max_dim_rows=0).to_pandas()
    assert len(a) == 1 and a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_supplier_nation_fallback_fk_violation_raises():
    """A supplier nationkey missing from the nation dimension must fail
    loudly on the sort-merge fallback path (the broadcast path already
    KeyErrors at map build) instead of silently crediting the
    neighboring nation (r5 review guard)."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.warehouse import (
        supplier_nation_volume)

    region = pa.table({"r_regionkey": pa.array([0], pa.int64()),
                       "r_name": pa.array(["EAST"])})
    nation = pa.table({"n_nationkey": pa.array([0, 1], pa.int64()),
                       "n_name": pa.array(["N0", "N1"]),
                       "n_regionkey": pa.array([0, 0], pa.int64())})
    supplier = pa.table({"s_suppkey": pa.array([0, 1], pa.int64()),
                         "s_nationkey": pa.array([0, 9], pa.int64())})
    li = pa.table({
        "l_suppkey": pa.array([0, 1, 0], pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0]),
        "l_discount": pa.array([0.0, 0.05, 0.1]),
    })
    with pytest.raises(Exception, match="missing from"):
        supplier_nation_volume(
            rd.from_arrow(li), rd.from_arrow(supplier),
            rd.from_arrow(nation), rd.from_arrow(region),
            max_dim_rows=0).to_pandas()
