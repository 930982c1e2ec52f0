"""Sort-based grouped aggregation (stages/agg.py) vs pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_matches_pandas():
    """sum/min/max/count vs a pandas groupby, with a hot key spanning
    many blocks (the carry/handoff path) and singleton keys."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    rng = np.random.default_rng(97)
    n = 5000
    k = rng.integers(0, 400, n)
    k[:2600] = 7                        # hot key spans several blocks
    v = rng.integers(-50, 50, n).astype(np.int64)
    t = pa.table({"k": pa.array(k.astype(np.int64)),
                  "v": pa.array(v),
                  "w": pa.array(v * 2)})
    got = sorted_group_agg(
        rd.from_arrow(t).repartition(13), key="k",
        aggs={"v": "sum", "w": "min", "k2": "count"},
        schema=pa.schema([("k", pa.int64()), ("v", pa.int64()),
                          ("w", pa.int64()),
                          ("k2", pa.int64())])).to_pandas()
    # the count column sources a missing col name on purpose: count
    # ignores values
    df = t.to_pandas()
    want = df.groupby("k").agg(v=("v", "sum"), w=("w", "min"),
                               k2=("v", "count")).reset_index()
    got = got.sort_values("k", ignore_index=True)
    want = want.sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_multikey():
    """Composite (a, b) keys with hot tuples spanning blocks."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    rng = np.random.default_rng(101)
    n = 4000
    a = rng.integers(0, 30, n)
    b = rng.integers(0, 30, n)
    a[:1800] = 5
    b[:1800] = 9                        # hot (5, 9) tuple
    v = rng.integers(0, 100, n).astype(np.int64)
    t = pa.table({"a": pa.array(a.astype(np.int64)),
                  "b": pa.array(b.astype(np.int64)),
                  "v": pa.array(v)})
    got = sorted_group_agg(
        rd.from_arrow(t).repartition(11), key=["a", "b"],
        aggs={"v": "sum", "n": "count"},
        schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                          ("v", pa.int64()),
                          ("n", pa.int64())])).to_pandas()
    want = t.to_pandas().groupby(["a", "b"]).agg(
        v=("v", "sum"), n=("v", "count")).reset_index()
    got = got.sort_values(["a", "b"], ignore_index=True)
    want = want.sort_values(["a", "b"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_first_last_arg_extremes():
    """Ordered first/last ops (aliased specs, one source feeding two
    aggs) vs pandas idxmin/idxmax, with a hot key spanning blocks so
    the order-sensitive carry chain is exercised in both directions."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    rng = np.random.default_rng(113)
    n = 4000
    k = rng.integers(0, 150, n)
    k[:2200] = 3                       # hot key spans several blocks
    ts = rng.permutation(n).astype(np.int64)   # unique total order
    label = np.array([f"s{x}" for x in rng.integers(0, 9, n)],
                     dtype=object)
    t = pa.table({"k": pa.array(k.astype(np.int64)),
                  "ts": pa.array(ts),
                  "label": pa.array(label, pa.string())})
    got = sorted_group_agg(
        rd.from_arrow(t).repartition(13), key="k", order="ts",
        aggs={"n": ("ts", "count"),
              "first_ts": ("ts", "first"),
              "last_ts": ("ts", "last"),
              "first_label": ("label", "first"),
              "last_label": ("label", "last")},
        schema=pa.schema([("k", pa.int64()), ("ts", pa.int64()),
                          ("label", pa.string())])).to_pandas()
    df = t.to_pandas().sort_values(["k", "ts"])
    want = df.groupby("k").agg(
        n=("ts", "count"), first_ts=("ts", "first"),
        last_ts=("ts", "last"), first_label=("label", "first"),
        last_label=("label", "last")).reset_index()
    got = got.sort_values("k", ignore_index=True)
    want = want.sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_first_last_requires_order():
    """first/last without order= columns is undefined — must raise."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([3, 4], pa.int64())})
    with pytest.raises(ValueError, match="requires order"):
        sorted_group_agg(rd.from_arrow(t), key="k",
                         aggs={"first_v": ("v", "first")},
                         schema=t.schema)


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_rejects_null_values():
    """Nullable value columns must fail loudly — to_numpy would
    silently promote them to float/NaN and corrupt the reduce."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    t = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([1, None, 3], pa.int64())})
    with pytest.raises(Exception, match="null"):
        sorted_group_agg(rd.from_arrow(t), key="k",
                         aggs={"v": "sum"}).materialize()


@pytest.mark.usefixtures("ray_session")
def test_sorted_first_attach_matches_window_min():
    """min(value) OVER (PARTITION BY keys) in one sort, with a hot
    group spanning blocks (forward-carry path)."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_first_attach

    rng = np.random.default_rng(107)
    n = 3000
    a = rng.integers(0, 50, n)
    b = rng.integers(0, 4, n)
    a[:1500] = 13
    b[:1500] = 2                        # hot (13, 2) group
    v = rng.permutation(n).astype(np.int64)
    t = pa.table({"a": pa.array(a.astype(np.int64)),
                  "b": pa.array(b.astype(np.int64)),
                  "v": pa.array(v)})
    got = sorted_first_attach(
        rd.from_arrow(t).repartition(11), key=["a", "b"], value="v",
        out="mn").to_pandas()
    df = t.to_pandas()
    df["mn"] = df.groupby(["a", "b"])["v"].transform("min")
    got = got.sort_values(["a", "b", "v"], ignore_index=True)
    df = df.sort_values(["a", "b", "v"], ignore_index=True)
    assert list(got.mn) == list(df.mn)


@pytest.mark.usefixtures("ray_session")
def test_sorted_first_attach_multivalue_lexicographic():
    """Two value columns: the attached pair must be the LEXICOGRAPHIC
    group minimum of (v1, v2), not the per-column minima."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_first_attach

    rng = np.random.default_rng(109)
    n = 2000
    g = rng.integers(0, 20, n)
    g[:1100] = 3                        # hot group spans blocks
    v1 = rng.integers(0, 5, n).astype(np.int64)   # heavy ties on v1
    v2 = rng.permutation(n).astype(np.int64)
    t = pa.table({"g": pa.array(g.astype(np.int64)),
                  "v1": pa.array(v1), "v2": pa.array(v2)})
    got = sorted_first_attach(
        rd.from_arrow(t).repartition(9), key="g",
        value=["v1", "v2"], out=["m1", "m2"]).to_pandas()
    df = t.to_pandas()
    lex = df.sort_values(["g", "v1", "v2"]).groupby("g").first()
    got = got.sort_values(["g", "v1", "v2"], ignore_index=True)
    for gg, grp in got.groupby("g"):
        assert (grp.m1 == lex.loc[gg, "v1"]).all()
        assert (grp.m2 == lex.loc[gg, "v2"]).all()


@pytest.mark.usefixtures("ray_session")
def test_sorted_run_length_attach_matches_window_count():
    """count(*) OVER (PARTITION BY key) in one sort: a hot key spanning
    several blocks must see its TOTAL size on every row, and singleton
    keys their local size."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_run_length_attach

    rng = np.random.default_rng(113)
    n = 4000
    k = rng.integers(0, 300, n)
    k[:2200] = 11                       # hot key spans blocks
    v = rng.permutation(n).astype(np.int64)
    t = pa.table({"k": pa.array(k.astype(np.int64)), "v": pa.array(v)})
    got = sorted_run_length_attach(
        rd.from_arrow(t).repartition(13), key="k",
        out="sz").to_pandas()
    df = t.to_pandas()
    df["sz"] = df.groupby("k")["k"].transform("size")
    got = got.sort_values(["k", "v"], ignore_index=True)
    df = df.sort_values(["k", "v"], ignore_index=True)
    assert list(got.sz) == list(df.sz)
    assert got.shape[0] == n


@pytest.mark.usefixtures("ray_session")
def test_sorted_run_length_attach_multikey_and_empty():
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_run_length_attach

    t = pa.table({"a": pa.array(["x", "x", "y", "y", "y", "z"]),
                  "b": pa.array([1, 1, 1, 2, 2, 2], pa.int64())})
    got = sorted_run_length_attach(
        rd.from_arrow(t).repartition(4), key=["a", "b"],
        out="sz").to_pandas().sort_values(["a", "b"],
                                          ignore_index=True)
    assert list(got.sz) == [2, 2, 1, 2, 2, 1]

    sch = pa.schema([("a", pa.string()), ("b", pa.int64())])
    empty = sorted_run_length_attach(
        rd.from_arrow(sch.empty_table()), key="a", out="sz", schema=sch)
    assert empty.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_sorted_rank_attach_matches_row_number():
    """row_number() OVER (PARTITION BY key ORDER BY o, v) - 1 in one
    sort: a hot key spanning several blocks must rank continuously
    across the block boundary."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_rank_attach

    rng = np.random.default_rng(211)
    n = 4000
    k = rng.integers(0, 300, n)
    k[:2200] = 11                       # hot key spans blocks
    o = rng.integers(0, 5, n).astype(np.int64)
    v = rng.permutation(n).astype(np.int64)   # unique tiebreak
    t = pa.table({"k": pa.array(k.astype(np.int64)), "o": pa.array(o),
                  "v": pa.array(v)})
    got = sorted_rank_attach(
        rd.from_arrow(t).repartition(13), key="k", order=["o", "v"],
        out="rnk").to_pandas().sort_values(["k", "o", "v"],
                                           ignore_index=True)
    df = t.to_pandas().sort_values(["k", "o", "v"], ignore_index=True)
    df["rnk"] = df.groupby("k").cumcount()
    assert list(got.rnk) == list(df.rnk)
    assert got.shape[0] == n

    sch = pa.schema([("k", pa.int64()), ("o", pa.int64()),
                     ("v", pa.int64())])
    empty = sorted_rank_attach(
        rd.from_arrow(sch.empty_table()), key="k", order="o",
        out="rnk", schema=sch)
    assert empty.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_string_keys_and_empty():
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    t = pa.table({"k": pa.array(["b", "a", "b", "c", "a", "b"]),
                  "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64())})
    got = sorted_group_agg(
        rd.from_arrow(t).repartition(4), key="k",
        aggs={"v": "sum"}).to_pandas().sort_values(
        "k", ignore_index=True)
    assert list(got.k) == ["a", "b", "c"]
    assert list(got.v) == [7, 10, 4]

    sch = pa.schema([("k", pa.string()), ("v", pa.int64())])
    empty = sorted_group_agg(rd.from_arrow(sch.empty_table()), key="k",
                             aggs={"v": "sum"}, schema=sch)
    assert empty.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_sorted_lag_attach_matches_pandas_shift():
    """lag(value) OVER (PARTITION BY key ORDER BY o, v): hot key spans
    blocks, boundary carries must chain the previous row across."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_lag_attach

    rng = np.random.default_rng(211)
    n = 3000
    k = rng.integers(0, 40, n)
    k[:1500] = 7                        # hot key spans several blocks
    o = rng.permutation(n).astype(np.int64)
    v = rng.integers(-100, 100, n).astype(np.int64)
    t = pa.table({"k": pa.array(k.astype(np.int64)),
                  "o": pa.array(o), "v": pa.array(v)})
    got = sorted_lag_attach(
        rd.from_arrow(t).repartition(12), key="k", order="o",
        value="v", out="prev_v").to_pandas()
    df = t.to_pandas().sort_values(["k", "o"])
    df["prev_v"] = df.groupby("k")["v"].shift(1)
    got = got.sort_values(["k", "o"], ignore_index=True)
    df = df.sort_values(["k", "o"], ignore_index=True)
    ge = got.prev_v.to_numpy(dtype=float, na_value=np.nan)
    ee = df.prev_v.to_numpy(dtype=float, na_value=np.nan)
    assert np.array_equal(ge, ee, equal_nan=True)


@pytest.mark.usefixtures("ray_session")
def test_sorted_lag_attach_string_values_nulls_and_empty():
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_lag_attach

    t = pa.table({"k": pa.array(["a", "a", "a", "b", "b"]),
                  "o": pa.array([1, 2, 3, 1, 2], pa.int64()),
                  "v": pa.array(["x", None, "z", "p", "q"])})
    got = sorted_lag_attach(
        rd.from_arrow(t).repartition(3), key="k", order="o",
        value="v", out="pv").to_pandas().sort_values(
            ["k", "o"], ignore_index=True)
    assert list(got.pv.fillna("-")) == ["-", "x", "-", "-", "p"]

    sch = pa.schema([("k", pa.string()), ("o", pa.int64()),
                     ("v", pa.string())])
    empty = sorted_lag_attach(
        rd.from_arrow(sch.empty_table()), key="k", order="o",
        value="v", out="pv", schema=sch)
    assert empty.count() == 0


def _rolling_expect(df, k):
    df = df.sort_values(["k", "o"], ignore_index=True)
    g = df.groupby("k")["v"]
    df["win_n"] = g.rolling(k + 1, min_periods=1).count().to_numpy()
    df["win_max"] = g.rolling(k + 1, min_periods=1).max().to_numpy()
    return df


@pytest.mark.usefixtures("ray_session")
def test_sorted_rolling_attach_matches_pandas_rolling():
    """ROWS BETWEEN k PRECEDING AND CURRENT ROW with a hot key spanning
    blocks: window contents must chain across block boundaries."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_rolling_attach

    rng = np.random.default_rng(409)
    n = 2000
    k = rng.integers(0, 20, n)
    k[:1100] = 5
    t = pa.table({"k": pa.array(k.astype(np.int64)),
                  "o": pa.array(rng.permutation(n).astype(np.int64)),
                  "v": pa.array(rng.standard_normal(n))})
    got = sorted_rolling_attach(
        rd.from_arrow(t).repartition(11), key="k", order="o",
        value="v", k=4).to_pandas().sort_values(
            ["k", "o"], ignore_index=True)
    df = _rolling_expect(t.to_pandas(), 4)
    assert list(got.win_n) == list(df.win_n.astype(int))
    assert np.array_equal(got.win_max.to_numpy(), df.win_max.to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_sorted_rolling_attach_blocks_smaller_than_window():
    """Blocks of 1-2 rows with k=5: the carry must chain through
    MULTIPLE preceding blocks, not just the adjacent one."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_rolling_attach

    n = 40
    t = pa.table({"k": pa.array(np.zeros(n, np.int64)),
                  "o": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array(np.arange(n, dtype=np.int64))})
    got = sorted_rolling_attach(
        rd.from_arrow(t).repartition(25), key="k", order="o",
        value="v", k=5).to_pandas().sort_values("o", ignore_index=True)
    exp_n = np.minimum(np.arange(n), 5) + 1
    assert list(got.win_n) == list(exp_n)
    assert list(got.win_max) == list(np.arange(n))   # ascending: max=self

    sch = pa.schema([("k", pa.int64()), ("o", pa.int64()),
                     ("v", pa.float64())])
    empty = sorted_rolling_attach(
        rd.from_arrow(sch.empty_table()), key="k", order="o",
        value="v", k=3, schema=sch)
    assert empty.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_window_stages_reject_null_keys_and_values():
    """The sorted window stages fail loudly on nulls rather than
    silently mis-grouping (nulls sort together but compare unequal in
    the numpy change masks)."""
    import ray.exceptions
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import (
        sorted_lag_attach,
        sorted_rolling_attach,
        sorted_run_length_attach,
    )

    nk = pa.table({"k": pa.array([1, None, 2], pa.int64()),
                   "o": pa.array([1, 2, 3], pa.int64()),
                   "v": pa.array([1.0, 2.0, 3.0])})
    for call in (
        lambda: sorted_run_length_attach(
            rd.from_arrow(nk), key="k", out="sz").materialize(),
        lambda: sorted_lag_attach(
            rd.from_arrow(nk), key="k", order="o", value="v",
            out="pv").materialize(),
        lambda: sorted_rolling_attach(
            rd.from_arrow(nk), key="k", order="o", value="v",
            k=2).materialize(),
    ):
        with pytest.raises((ValueError, ray.exceptions.RayTaskError),
                           match="contains nulls"):
            call()

    nv = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                   "o": pa.array([1, 2, 3], pa.int64()),
                   "v": pa.array([1.0, None, 3.0])})
    with pytest.raises((ValueError, ray.exceptions.RayTaskError),
                       match="contains nulls"):
        sorted_rolling_attach(
            rd.from_arrow(nv), key="k", order="o", value="v",
            k=2).materialize()


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_concat_matches_string_agg():
    """Ordered concat (string_agg) vs pandas, with a hot key straddling
    many blocks so partial strings chain through the carry fold."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    rng = np.random.default_rng(31)
    n = 3000
    k = rng.integers(0, 200, n)
    k[:1500] = 9                        # hot group spans blocks
    o = np.arange(n, dtype=np.int64)
    rng.shuffle(o)                      # order column, unique
    s = np.array([f"s{x}" for x in o], dtype=object)
    t = pa.table({"k": pa.array(k.astype(np.int64)),
                  "o": pa.array(o), "s": pa.array(s, pa.string())})
    got = sorted_group_agg(
        rd.from_arrow(t).repartition(11), key="k",
        aggs={"txt": ("s", "concat"), "n": "count"},
        order="o", concat_sep="|",
        schema=pa.schema([("k", pa.int64()), ("o", pa.int64()),
                          ("s", pa.string())])).to_pandas() \
        .sort_values("k", ignore_index=True)
    df = t.to_pandas().sort_values(["k", "o"])
    want = df.groupby("k").agg(
        txt=("s", "|".join), n=("s", "count")).reset_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_concat_requires_order():
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "s": pa.array(["a", "b"])})
    with pytest.raises(ValueError, match="requires order"):
        sorted_group_agg(rd.from_arrow(t), key="k",
                         aggs={"txt": ("s", "concat")})


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_randomized_vs_duckdb():
    """Differential fuzz of the central shuffle primitive: random
    skewed keys (including a hot key spanning many blocks), every agg
    kind in one call, string + int composite keys, random block
    layouts — all compared to DuckDB."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    for seed in (3, 17, 59):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(200, 2000))
        # zipf-ish skew: one hot key gets ~40% of rows
        keys = rng.choice(
            np.arange(int(rng.integers(3, 40))), n,
            p=None).astype(np.int64)
        keys[rng.random(n) < 0.4] = 0
        t = pa.table({
            "g": pa.array(
                np.array([f"k{k % 5}" for k in keys], object),
                pa.string()),
            "h": pa.array(keys),
            "v": pa.array(rng.integers(-1000, 1000, n)
                          .astype(np.int64)),
            "o": pa.array(rng.permutation(n).astype(np.int64)),
            "s": pa.array([f"s{i}" for i in range(n)], pa.string()),
        })
        got = sorted_group_agg(
            rd.from_arrow(t).repartition(int(rng.integers(2, 12))),
            key=["g", "h"], order=["o"],
            aggs={"sv": ("v", "sum"), "mn": ("v", "min"),
                  "mx": ("v", "max"), "cnt": "count",
                  "fv": ("v", "first"), "lv": ("v", "last"),
                  "cat": ("s", "concat")},
            concat_sep="|").to_pandas().sort_values(
            ["g", "h"], ignore_index=True)
        con = duckdb.connect()
        con.register("t", t.to_pandas())
        want = con.execute(
            "SELECT g, h, CAST(sum(v) AS BIGINT) AS sv,"
            " min(v) AS mn, max(v) AS mx, count(*) AS cnt,"
            " first(v ORDER BY o) AS fv, last(v ORDER BY o) AS lv,"
            " string_agg(s, '|' ORDER BY o) AS cat"
            " FROM t GROUP BY g, h ORDER BY g, h").df()
        assert len(got) == len(want), seed
        for col in want.columns:
            assert list(got[col]) == list(want[col]), (seed, col)


@pytest.mark.usefixtures("ray_session")
def test_sort_attach_randomized_vs_duckdb():
    """Differential fuzz of the sort-merge attach: random row/payload
    overlap (keys missing on either side), duplicate row keys, both
    join modes, random layouts — vs DuckDB LEFT/INNER JOIN."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.stages.attach import sort_attach

    for seed in (5, 23, 71):
        rng = np.random.default_rng(seed)
        n_rows = int(rng.integers(100, 1500))
        n_pay = int(rng.integers(20, 400))
        rows = pa.table({
            "k": pa.array(rng.integers(0, n_pay + 50, n_rows)
                          .astype(np.int64)),
            "x": pa.array(np.arange(n_rows, dtype=np.int64)),
        })
        pay = pa.table({
            "pk": pa.array(rng.permutation(n_pay + 30)[:n_pay]
                           .astype(np.int64)),
            "a": pa.array(rng.integers(0, 9, n_pay).astype(np.int64)),
            "b": pa.array([f"p{i}" for i in range(n_pay)], pa.string()),
        })
        for how in ("left", "inner"):
            got = sort_attach(
                rd.from_arrow(rows).repartition(
                    int(rng.integers(2, 9))),
                rd.from_arrow(pay).repartition(
                    int(rng.integers(2, 5))),
                key="k", payload_key="pk", payload_cols=["a", "b"],
                how=how,
                rows_schema=rows.schema,
                payload_schema=pay.schema).to_pandas().sort_values(
                ["k", "x"], ignore_index=True)
            con = duckdb.connect()
            con.register("r", rows.to_pandas())
            con.register("p", pay.to_pandas())
            join = "LEFT JOIN" if how == "left" else "JOIN"
            want = con.execute(
                f"SELECT k, x, a, b FROM r {join} p ON pk = k"
                " ORDER BY k, x").df()
            assert len(got) == len(want), (seed, how)
            assert list(got.k) == list(want.k), (seed, how)
            assert list(got.x) == list(want.x), (seed, how)
            ga = got.a.fillna(-1).astype(np.int64)
            wa = want.a.fillna(-1).astype(np.int64)
            assert list(ga) == list(wa), (seed, how)
            gb = got.b.fillna("-")
            wb = want.b.fillna("-")
            assert list(gb) == list(wb), (seed, how)
