"""Sessionization: hand-built fixture + pandas oracle + block-boundary
stitching."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

MIN = 60 * 1_000_000  # one minute in us


def _events_table(rows):
    """rows: list of (event_id, user_id, ts_minutes, value)."""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([int(r[2] * MIN) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([float(r[3]) for r in rows], pa.float64()),
    })


def _pandas_oracle(df: pd.DataFrame, gap_min=30) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.reset_index(drop=True)
        brk = [True] + [
            (g.ts[i] - g.ts[i - 1]).total_seconds() > gap_min * 60
            for i in range(1, len(g))]
        sid = np.cumsum(brk)
        for s, sg in g.groupby(sid):
            out.append({
                "user_id": uid, "session_key": int(sg.event_id.min()),
                "n_events": len(sg),
                "t_start_us": int(sg.ts.min().value // 1000),
                "t_end_us": int(sg.ts.max().value // 1000),
                "total_value": round(float(sg.value.sum()), 6),
            })
    return pd.DataFrame(out).sort_values("session_key",
                                         ignore_index=True)


@pytest.mark.usefixtures("ray_session")
class TestSessionize:
    def test_hand_built(self):
        import ray.data as rd
        from smqtk_indexing_ray.pipelines.events import sessionize
        rows = [
            # user 1: two sessions (gap 45 min between e2 and e3)
            (0, 1, 0.0, 1.0), (1, 1, 10.0, 2.0), (2, 1, 20.0, 3.0),
            (3, 1, 65.0, 4.0), (4, 1, 70.0, 5.0),
            # user 2: one session, events exactly at the 30-min gap
            (5, 2, 0.0, 1.5), (6, 2, 30.0, 2.5),
            # user 3: singleton
            (7, 3, 500.0, 9.0),
        ]
        got = sessionize(rd.from_arrow(_events_table(rows))
                         ).to_pandas().sort_values("session_key",
                                                   ignore_index=True)
        assert len(got) == 4
        s = got.set_index("session_key")
        assert s.loc[0, "n_events"] == 3 and s.loc[0, "total_value"] == 6.0
        assert s.loc[3, "n_events"] == 2
        assert s.loc[5, "n_events"] == 2      # 30-min gap is inclusive
        assert s.loc[7, "n_events"] == 1
        assert s.loc[0, "t_end_us"] == 20 * MIN

    def test_random_vs_pandas_oracle_many_blocks(self):
        import ray.data as rd
        from smqtk_indexing_ray.pipelines.events import sessionize
        rng = np.random.default_rng(11)
        n = 3000
        rows = []
        t = np.zeros(20)
        for i in range(n):
            u = int(rng.integers(0, 20))
            t[u] += float(rng.exponential(20))  # minutes
            rows.append((i, u, t[u], float(np.round(rng.random() * 10, 2))))
        tbl = _events_table(rows)
        # many small blocks to exercise cross-block session stitching
        ds = rd.from_arrow(tbl).repartition(23)
        got = sessionize(ds).to_pandas().sort_values(
            "session_key", ignore_index=True)
        want = _pandas_oracle(tbl.to_pandas())
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestWindowAgg:
    def _events(self, n=2000, seed=4):
        import ray.data as rd
        rng = np.random.default_rng(seed)
        base = 1_577_836_800_000_000
        ts = base + rng.integers(0, 6 * 3600 * 1_000_000, n)
        return rd.from_arrow(pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 50, n), pa.int64()),
            "event_type": pa.array(
                np.array(["a", "b", "c"])[rng.integers(0, 3, n)]),
            "value": pa.array(rng.standard_normal(n)),
        }))

    def test_matches_pandas_groupby(self):
        from smqtk_indexing_ray.pipelines.events import (
            window_agg, window_user_counts)
        ev = self._events()
        src = ev.to_pandas()
        w = (src.ts.astype("int64") // 3_600_000_000) * 3_600_000_000
        src = src.assign(window_start=pd.to_datetime(w, unit="us"))
        want = src.groupby(["window_start", "event_type"]).agg(
            n_events=("value", "size"), min_value=("value", "min"),
            max_value=("value", "max")).reset_index()
        got = window_agg(ev).to_pandas().sort_values(
            ["window_start", "event_type"], ignore_index=True)
        want = want.sort_values(["window_start", "event_type"],
                                ignore_index=True)
        pd.testing.assert_frame_equal(
            got.astype({"window_start": "datetime64[us]"}), want,
            check_dtype=False)
        uw = src.groupby("window_start").user_id.nunique().reset_index(
            name="n_users")
        gu = window_user_counts(ev).to_pandas().sort_values(
            "window_start", ignore_index=True)
        assert (gu.n_users.to_numpy()
                == uw.sort_values("window_start").n_users.to_numpy()).all()

    def test_partition_invariant(self):
        """Pre-aggregation must be exact under any batching."""
        from smqtk_indexing_ray.pipelines.events import window_agg
        ev = self._events(seed=9)
        a = window_agg(ev.repartition(1)).to_pandas().sort_values(
            ["window_start", "event_type"], ignore_index=True)
        b = window_agg(ev.repartition(13)).to_pandas().sort_values(
            ["window_start", "event_type"], ignore_index=True)
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
class TestAsofJoin:
    def test_matches_pandas_merge_asof(self):
        """Sorted-tag + per-block carry as-of join vs pandas merge_asof,
        with enough blocks that key segments straddle block boundaries."""
        import ray.data as rd
        from smqtk_indexing_ray.stages.asof import asof_join
        rng = np.random.default_rng(21)
        n_left, n_right = 4000, 300
        lt = pa.table({
            "user_id": pa.array(rng.integers(0, 12, n_left), pa.int64()),
            "ts": pa.array(rng.integers(0, 10_000, n_left), pa.int64()),
            "event_id": pa.array(np.arange(n_left, dtype=np.int64)),
        })
        # unique (user, ts) on the right so the match is deterministic
        ru = rng.integers(0, 12, n_right)
        rt = rng.choice(20_000, size=n_right, replace=False) % 10_000
        seen = set()
        keep = []
        for u, t in zip(ru, rt):
            keep.append((u, t) not in seen)
            seen.add((u, t))
        ru, rt = ru[keep], rt[keep]
        rtbl = pa.table({
            "user_id": pa.array(ru, pa.int64()),
            "ts": pa.array(rt.astype(np.int64), pa.int64()),
            "snap": pa.array(np.arange(len(ru), dtype=np.int64) + 1000),
        })
        out = asof_join(
            rd.from_arrow(lt).repartition(7),
            rd.from_arrow(rtbl).repartition(3),
            key="user_id", ts="ts", payload_cols=["snap"],
            left_schema=lt.schema, right_schema=rtbl.schema,
        ).to_pandas().sort_values("event_id", ignore_index=True)
        want = pd.merge_asof(
            lt.to_pandas().sort_values("ts", kind="stable"),
            rtbl.to_pandas().sort_values("ts", kind="stable"),
            on="ts", by="user_id", direction="backward",
        ).sort_values("event_id", ignore_index=True)
        assert len(out) == n_left
        lhs = out.snap.fillna(-1).astype(np.int64).to_numpy()
        rhs = want.snap.fillna(-1).astype(np.int64).to_numpy()
        np.testing.assert_array_equal(lhs, rhs)

    def test_no_match_is_null(self):
        import ray.data as rd
        from smqtk_indexing_ray.stages.asof import asof_join
        lt = pa.table({"user_id": pa.array([1, 1], pa.int64()),
                       "ts": pa.array([5, 50], pa.int64()),
                       "event_id": pa.array([0, 1], pa.int64())})
        rtbl = pa.table({"user_id": pa.array([1], pa.int64()),
                         "ts": pa.array([10], pa.int64()),
                         "snap": pa.array([7], pa.int64())})
        out = asof_join(rd.from_arrow(lt), rd.from_arrow(rtbl),
                        key="user_id", ts="ts", payload_cols=["snap"],
                        left_schema=lt.schema, right_schema=rtbl.schema
                        ).to_pandas().sort_values("event_id",
                                                  ignore_index=True)
        assert pd.isna(out.snap[0])          # ts=5 precedes every snap
        assert out.snap[1] == 7              # ts=50 takes snap at 10

    def test_interval_join_disjoint(self):
        import ray.data as rd
        from smqtk_indexing_ray.stages.asof import interval_join
        pts = pa.table({"user_id": pa.array([1, 1, 1, 2], pa.int64()),
                        "ts_us": pa.array([5, 15, 40, 15], pa.int64()),
                        "event_id": pa.array([0, 1, 2, 3], pa.int64())})
        iv = pa.table({"user_id": pa.array([1, 1], pa.int64()),
                       "t0": pa.array([10, 30], pa.int64()),
                       "t1": pa.array([20, 35], pa.int64()),
                       "sid": pa.array([100, 200], pa.int64())})
        out = interval_join(
            rd.from_arrow(pts), rd.from_arrow(iv), key="user_id",
            ts="ts_us", lo="t0", hi="t1", payload_cols=["sid"],
            points_schema=pts.schema, intervals_schema=iv.schema,
        ).to_pandas().sort_values("event_id", ignore_index=True)
        assert pd.isna(out.sid[0])       # before every interval
        assert out.sid[1] == 100         # inside [10, 20]
        assert pd.isna(out.sid[2])       # after [30, 35] upper bound
        assert pd.isna(out.sid[3])       # other key, no intervals


@pytest.mark.usefixtures("ray_session")
def test_hopping_window_counts_matches_pandas():
    import ray.data as rd
    from smqtk_indexing_ray.pipelines.events import hopping_window_counts
    rng = np.random.default_rng(6)
    n = 1500
    base = 1_577_836_800_000_000
    ts = base + rng.integers(0, 4 * 3600 * 1_000_000, n)
    ev = rd.from_arrow(pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(np.zeros(n, np.int64)),
    })).repartition(6)
    got = hopping_window_counts(ev, window_minutes=60, hop_minutes=30
                                ).to_pandas()
    got = got.set_index(got.window_start.astype("int64"))["n_events"]
    hop = 1_800_000_000
    want: dict[int, int] = {}
    for t in ts:
        wmax = int(t) - int(t) % hop
        for w in (wmax - hop, wmax):
            want[w] = want.get(w, 0) + 1
    assert dict(got) == want


def _funnel_brute(rows, steps):
    """rows: (event_id, user_id, ts_us, event_type). Greedy earliest
    chain with strict (ts, event_id) ordering between steps."""
    by_user: dict[int, list] = {}
    for eid, uid, ts, et in rows:
        if et in steps:
            by_user.setdefault(uid, []).append((ts, eid, et))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        done, t_first, t_last = 0, None, None
        pos = -1
        for j, s in enumerate(steps):
            nxt = next((i for i in range(pos + 1, len(evs))
                        if evs[i][2] == s), None)
            if nxt is None:
                break
            pos = nxt
            done = j + 1
            t_last = evs[nxt][0]
            if j == 0:
                t_first = evs[nxt][0]
        out[uid] = (done, t_first, t_last)
    return out


@pytest.mark.usefixtures("ray_session")
class TestFunnel:
    STEPS = ("view", "click", "purchase")

    def _ds(self, rows, n_blocks=1):
        import ray.data as rd
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([0.0] * len(rows), pa.float64()),
        })
        ds = rd.from_arrow(t)
        return ds.repartition(n_blocks) if n_blocks > 1 else ds

    def _run(self, rows, n_blocks=1):
        from smqtk_indexing_ray.pipelines.events import funnel
        out = funnel(self._ds(rows, n_blocks), steps=self.STEPS)
        batches = list(out.iter_batches(batch_size=None,
                                        batch_format="pyarrow"))
        if not batches:
            return {}
        d = pa.concat_tables(batches).to_pydict()
        if "user_id" not in d:
            return {}
        return {u: (s, tf, tl) for u, s, tf, tl in zip(
            d["user_id"], d["steps_completed"], d["t_first_us"],
            d["t_last_us"])}

    def test_hand_built(self):
        rows = [
            # user 1 converts fully, out-of-order noise between steps
            (0, 1, 100, "view"), (1, 1, 150, "error"),
            (2, 1, 200, "click"), (3, 1, 300, "purchase"),
            # user 2: purchase BEFORE view/click -> only view+click count
            (4, 2, 50, "purchase"), (5, 2, 100, "view"),
            (6, 2, 200, "click"),
            # user 3: click only -> 0 steps (never viewed)
            (7, 3, 10, "click"),
            # user 4: tie timestamps; event_id breaks the tie:
            # view(eid 8) and click(eid 9) at ts=500 -> click counts
            (8, 4, 500, "view"), (9, 4, 500, "click"),
            # click at SAME ts but SMALLER eid than view -> must not
            (10, 5, 500, "click"), (11, 5, 500, "view"),
            (12, 5, 400, "signup"),
        ]
        got = self._run(rows)
        assert got[1] == (3, 100, 300)
        assert got[2] == (2, 100, 200)
        assert got[3] == (0, None, None)
        assert got[4] == (2, 500, 500)
        assert got[5] == (1, 500, 500)
        assert got == _funnel_brute(
            [(r[0], r[1], r[2], r[3]) for r in rows], self.STEPS)

    def test_randomized_multiblock_vs_brute(self):
        rng = np.random.default_rng(42)
        types = list(self.STEPS) + ["error", "signup"]
        rows = []
        eid = 0
        # 6 users incl. one hot user with 600 events -> guaranteed to
        # straddle many of the 16 sorted blocks
        for uid, n in [(1, 600), (2, 40), (3, 40), (4, 5), (5, 1),
                       (6, 80)]:
            for _ in range(n):
                ts = int(rng.integers(0, 500))  # dense ts -> many ties
                rows.append((eid, uid, ts,
                             types[int(rng.integers(0, len(types)))]))
                eid += 1
        got = self._run(rows, n_blocks=16)
        expect = _funnel_brute(rows, self.STEPS)
        assert got == expect
        # and single-block agrees (block-boundary machinery is a no-op)
        assert self._run(rows, n_blocks=1) == expect

    def test_validation_and_empty(self):
        from smqtk_indexing_ray.pipelines.events import funnel
        with pytest.raises(ValueError, match="2..16|distinct"):
            funnel(self._ds([(0, 1, 1, "view")]), steps=("view",))
        with pytest.raises(ValueError, match="distinct"):
            funnel(self._ds([(0, 1, 1, "view")]),
                   steps=("view", "view"))
        got = self._run([(0, 1, 100, "error")])  # no step events at all
        assert got == {}


@pytest.mark.usefixtures("ray_session")
def test_cohort_retention_matches_duckdb():
    """First-seen cohorts x activity-day distinct users vs the exact
    SQL oracle, with users and days straddling blocks."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import cohort_retention

    rng = np.random.default_rng(83)
    n = 3000
    day_us = 86_400_000_000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            (rng.integers(0, 14, n) * day_us
             + rng.integers(0, day_us, n)).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 200, n).astype(np.int64)),
        "event_type": pa.array(["x"] * n),
        "value": pa.array(np.zeros(n)),
    })
    got = cohort_retention(
        rd.from_arrow(t).repartition(7)).to_pandas().sort_values(
        ["cohort_day", "activity_day"], ignore_index=True)
    con = duckdb.connect()
    con.register("events", t.to_pandas())
    want = con.execute(
        "WITH f AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day"
        " FROM events),"
        " c AS (SELECT user_id, min(day) AS cohort_day FROM f"
        " GROUP BY user_id),"
        " act AS (SELECT DISTINCT c.cohort_day, f.day AS activity_day,"
        " f.user_id FROM f JOIN c ON f.user_id = c.user_id),"
        " sz AS (SELECT cohort_day, count(*) AS n FROM c"
        " GROUP BY cohort_day),"
        " g AS (SELECT cohort_day, activity_day, count(*) AS n_users"
        " FROM act GROUP BY 1, 2) "
        "SELECT g.cohort_day, g.activity_day, g.n_users,"
        " CAST(g.n_users AS DOUBLE) / sz.n AS retention"
        " FROM g JOIN sz ON g.cohort_day = sz.cohort_day"
        " ORDER BY g.cohort_day, g.activity_day").df()
    assert list(got.cohort_day) == list(want.cohort_day)
    assert list(got.activity_day) == list(want.activity_day)
    assert list(got.n_users) == list(want.n_users)
    assert list(got.retention) == list(want.retention)


@pytest.mark.usefixtures("ray_session")
class TestUserEventGaps:
    def test_matches_pandas_lag(self):
        import ray.data as rd

        from smqtk_indexing_ray.pipelines.events import user_event_gaps

        rng = np.random.default_rng(31)
        n = 3000
        base = 1_577_836_800_000_000
        ts = base + rng.integers(0, 3600 * 1_000_000, n)
        ev = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
        })
        got = user_event_gaps(
            rd.from_arrow(ev).repartition(9)).to_pandas().sort_values(
                "event_id", ignore_index=True)
        df = ev.to_pandas()
        df["ts_us"] = df.ts.astype("int64")
        df = df.sort_values(["user_id", "ts_us", "event_id"])
        df["gap_us"] = (df.ts_us
                        - df.groupby("user_id").ts_us.shift(1)).fillna(
                            -1).astype("int64")
        df = df.sort_values("event_id", ignore_index=True)
        assert list(got.gap_us) == list(df.gap_us)
        assert list(got.user_id) == list(df.user_id)
        assert (got.gap_us >= -1).all()
        # every user has exactly one first-event sentinel
        assert (got.gap_us == -1).sum() == df.user_id.nunique()


@pytest.mark.usefixtures("ray_session")
def test_rolling_user_stats_matches_pandas():
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import rolling_user_stats

    rng = np.random.default_rng(67)
    n = 1500
    base = 1_577_836_800_000_000
    ev = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(base + rng.integers(0, 600 * 1_000_000, n),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 12, n), pa.int64()),
        "value": pa.array(rng.standard_normal(n)),
    })
    got = rolling_user_stats(
        rd.from_arrow(ev).repartition(7), k=3).to_pandas().sort_values(
            "event_id", ignore_index=True)
    df = ev.to_pandas()
    df["ts_us"] = df.ts.astype("int64")
    df = df.sort_values(["user_id", "ts_us", "event_id"])
    g = df.groupby("user_id")["value"]
    df["win_n"] = g.rolling(4, min_periods=1).count().to_numpy()
    df["win_max"] = g.rolling(4, min_periods=1).max().to_numpy()
    df = df.sort_values("event_id", ignore_index=True)
    assert list(got.win_n) == list(df.win_n.astype(int))
    assert np.array_equal(got.win_max.to_numpy(), df.win_max.to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_props_field_stats_matches_duckdb_with_edge_cases():
    """JSON field extraction + grouped stats vs DuckDB, including null
    props, missing field, non-integer values, invalid JSON, and an
    event type with no valid value at all (NULL aggregates)."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import props_field_stats

    rng = np.random.default_rng(17)
    types = ["view", "click", "error", "empty"]
    rows_t, rows_p = [], []
    for i in range(400):
        t = types[int(rng.integers(0, 3))]
        roll = int(rng.integers(0, 10))
        if roll == 0:
            p = None
        elif roll == 1:
            p = '{"j": 5}'              # field absent
        elif roll == 2:
            p = '{"k": 1.5}'            # non-integer -> excluded
        elif roll == 3:
            p = "not json"
        else:
            p = '{"k": %d}' % int(rng.integers(-50, 100))
        rows_t.append(t)
        rows_p.append(p)
    # a type whose every row lacks a valid k -> NULL min/max/sum/avg
    rows_t += ["empty", "empty"]
    rows_p += [None, '{"k": "str"}']

    ev = pa.table({
        "event_id": pa.array(np.arange(len(rows_t), dtype=np.int64)),
        "ts": pa.array([1_577_836_800_000_000] * len(rows_t),
                       pa.timestamp("us")),
        "user_id": pa.array(np.zeros(len(rows_t), np.int64)),
        "event_type": pa.array(rows_t),
        "value": pa.array(np.zeros(len(rows_t))),
        "props": pa.array(rows_p, pa.string()),
    })
    got = props_field_stats(
        rd.from_arrow(ev).repartition(5)).to_pandas().sort_values(
            "event_type", ignore_index=True)

    con = duckdb.connect()
    con.register("events", ev.to_pandas())
    want = con.sql(
        "WITH kk AS (SELECT event_type, CAST(CASE WHEN json_valid(props) AND"
        " regexp_matches(props->>'$.k', '^-?\\d+$')"
        " THEN props->>'$.k' END AS BIGINT) AS k FROM events)"
        " SELECT event_type, count(*) AS n_events, count(k) AS n_with,"
        " CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k,"
        " max(k) AS max_k, CAST(sum(k) AS DOUBLE) / count(k) AS avg_k"
        " FROM kk GROUP BY event_type ORDER BY event_type").df()
    assert list(got.event_type) == list(want.event_type)
    for c in ["n_events", "n_with", "sum_k", "min_k", "max_k", "avg_k"]:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert ((pd.isna(a) & pd.isna(b)) | (a == b)).all(), c
    # the empty type really exercised the NULL-aggregate path
    er = got[got.event_type == "empty"].iloc[0]
    assert er.n_with == 0 and pd.isna(er.min_k) and pd.isna(er.avg_k)


@pytest.mark.usefixtures("ray_session")
def test_trailing_active_users_matches_duckdb():
    """Sliding 7-day distinct users vs the SQL expansion oracle:
    activity gaps longer than the window must drop users out, repeated
    same-day events must count once, and a user active across many
    blocks must never double-count."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import trailing_active_users

    rng = np.random.default_rng(97)
    n = 4000
    base = np.datetime64("2024-03-01T00:00:00", "us")
    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    # 30 users, bursty: each active on a few random days over 40 days,
    # user 0 active only on day 0 (drops out after day 6), user 1
    # active every day (never drops)
    uid = rng.integers(2, 30, n).astype(np.int64)
    d = rng.integers(0, 40, n).astype(np.int64)
    uid = np.concatenate([uid, np.zeros(5, np.int64),
                          np.full(40, 1, np.int64)])
    d = np.concatenate([d, np.zeros(5, np.int64),
                        np.arange(40, dtype=np.int64)])
    ts = base + d * day + rng.integers(
        0, 86_400_000_000, len(d)).astype("timedelta64[us]")
    t = pa.table({
        "event_id": pa.array(np.arange(len(d), dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(uid),
    })
    got = trailing_active_users(
        rd.from_arrow(t).repartition(7),
        window_days=7).to_pandas().sort_values("day",
                                               ignore_index=True)
    con = duckdb.connect()
    con.register("events", t.to_pandas())
    want = con.execute(
        "WITH ud AS (SELECT DISTINCT date_trunc('day', ts) AS d,"
        " user_id FROM events), cov AS ("
        " SELECT DISTINCT d + CAST(k AS BIGINT) * INTERVAL 1 DAY AS day,"
        " user_id FROM ud CROSS JOIN"
        " (SELECT unnest(generate_series(0, 6)) AS k))"
        " SELECT day, count(*) AS n_users_7d FROM cov"
        " GROUP BY day ORDER BY day").df()
    assert list(got.day) == list(want.day)
    assert list(got.n_users_7d) == list(want.n_users_7d)
    # user 0's solo coverage ends after day 6: day 7 must not include
    # them (count there comes only from users active in days 1..7)
    got_map = dict(zip(got.day, got.n_users_7d))
    d0 = pd.Timestamp("2024-03-01")
    assert got_map[d0] >= 2              # users 0 and 1 at least


@pytest.mark.usefixtures("ray_session")
def test_trailing_event_counts_matches_duckdb():
    """RANGE-window count on an adversarial stream: exact ts ties
    (peers count each other), a burst inside the window, an event
    exactly at the window edge (inclusive), and a user with one event —
    vs the DuckDB RANGE frame, blocks split so the cum table and the
    as-of probes straddle boundaries."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import trailing_event_counts
    m = 60_000_000  # one minute in us
    rows = [
        # user 1: burst of 3 within 10 min, tie pair, edge case
        (0, 1, 0 * m), (1, 1, 5 * m), (2, 1, 9 * m),
        (3, 1, 30 * m), (4, 1, 30 * m),          # exact tie
        (5, 1, 90 * m),                          # 60 min after t=30: IN
        (6, 1, 200 * m),                         # isolated
        # user 2: single event
        (7, 2, 42 * m),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
    })
    got = trailing_event_counts(
        rd.from_arrow(t).repartition(4), window_minutes=60,
        num_partitions=3).to_pandas().sort_values(
        "event_id", ignore_index=True)
    con = duckdb.connect()
    con.register("events", t)
    exp = con.execute("""
SELECT event_id, user_id, ts,
  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT)
  AS n_window FROM events ORDER BY event_id""").df()
    pd.testing.assert_frame_equal(got, exp)
    # spot-check the semantics the frame encodes
    by_id = got.set_index("event_id").n_window
    assert by_id[3] == 5 and by_id[4] == 5   # ties are peers
    assert by_id[5] == 3                     # t=30 pair still inside
    assert by_id[6] == 1 and by_id[7] == 1


@pytest.mark.usefixtures("ray_session")
def test_event_transitions_matches_duckdb():
    """Transition counts on a hand-checked stream: first events
    excluded, within-user order by (ts, event_id), ties resolved by
    event_id, users split across blocks."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import event_transitions
    rows = [  # (event_id, user, ts_us, type)
        (0, 1, 100, "view"), (1, 1, 200, "click"), (2, 1, 300, "view"),
        (3, 1, 300, "purchase"),    # ts tie with 2: order by event_id
        (4, 2, 50, "view"),          # single-event user: no transition
        (5, 3, 10, "click"), (6, 3, 20, "click"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    got = event_transitions(
        rd.from_arrow(t).repartition(4),
        num_partitions=3).to_pandas().sort_values(
        ["prev_type", "next_type"], ignore_index=True)
    con = duckdb.connect()
    con.register("events", t)
    exp = con.execute("""
WITH s AS (SELECT user_id, event_type,
  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS prev_type FROM events)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""").df()
    pd.testing.assert_frame_equal(got, exp)
    by = {(r.prev_type, r.next_type): r.n for r in got.itertuples()}
    assert by[("view", "click")] == 1 and by[("click", "view")] == 1
    assert by[("view", "purchase")] == 1   # the ts-tie pair
    assert by[("click", "click")] == 1
    assert got.n.sum() == 4                # 7 events, 3 users


@pytest.mark.usefixtures("ray_session")
def test_hourly_activity():
    """Hand-checked hour x type counts and exact per-type shares,
    including an hour-boundary timestamp and a midnight-wrap."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import hourly_activity
    h = 3_600_000_000
    rows = [  # (ts_us, type)
        (0 * h, "view"), (0 * h + 1, "view"), (1 * h, "view"),
        (23 * h + 59, "click"), (23 * h, "click"), (0 * h, "click"),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "ts": pa.array([r[0] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
    })
    got = hourly_activity(
        rd.from_arrow(t).repartition(3)).to_pandas()
    by = {(r.hour, r.event_type): (r.n, r.frac_of_type)
          for r in got.itertuples()}
    assert by[(0, "view")] == (2, 2 / 3)
    assert by[(1, "view")] == (1, 1 / 3)
    assert by[(23, "click")] == (2, 2 / 3)
    assert by[(0, "click")] == (1, 1 / 3)
    assert len(got) == 4


@pytest.mark.usefixtures("ray_session")
def test_trailing_event_counts_random_property():
    """Randomized RANGE-window property check vs DuckDB: bursty random
    streams with many exact-ts ties, several partitionings."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import trailing_event_counts
    for seed, parts in [(3, 2), (4, 6)]:
        rng = np.random.default_rng(seed)
        n = 300
        ts = np.sort(rng.integers(0, 5_000, n)) * 60_000_000
        users = rng.integers(1, 6, n)
        t = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(users.astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64)).cast(pa.timestamp("us")),
        })
        got = trailing_event_counts(
            rd.from_arrow(t).repartition(parts), window_minutes=600,
            num_partitions=4).to_pandas().sort_values(
            "event_id", ignore_index=True)
        con = duckdb.connect()
        con.register("events", t)
        exp = con.execute("""
SELECT event_id, user_id, ts,
  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 10 HOUR PRECEDING AND CURRENT ROW)
  AS BIGINT) AS n_window FROM events ORDER BY event_id""").df()
        pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_funnel_latency():
    """Latency quantiles over converted users only: two converters with
    latencies 100us and 300us; a non-converter is ignored; no-converter
    corpora yield an empty table."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import funnel_latency
    rows = [  # (event_id, user, ts_us, type)
        (0, 1, 0, "view"), (1, 1, 50, "click"), (2, 1, 100, "purchase"),
        (3, 2, 0, "view"), (4, 2, 100, "click"), (5, 2, 300, "purchase"),
        (6, 3, 0, "view"), (7, 3, 10, "click"),      # never purchases
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    got = funnel_latency(rd.from_arrow(t).repartition(3),
                         qs=(0.5, 1.0)).to_pandas().set_index("q")
    assert got.loc[0.5, "latency_us"] == 100
    assert got.loc[1.0, "latency_us"] == 300
    none = funnel_latency(
        rd.from_arrow(t.filter(pa.array([r[3] != "purchase"
                                         for r in rows]))),
        qs=(0.5,)).to_pandas()
    assert len(none) == 0


@pytest.mark.usefixtures("ray_session")
def test_peak_event_rate_and_user_session_stats():
    """Hand-checked burst/session rollups: a 3-event burst inside one
    hour dominates the peak; two sessions split by a >30min gap."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import (
        peak_event_rate, user_session_stats)
    m = 60_000_000
    rows = [  # user 1: burst of 3 in 10 min, then isolated after 2h
        (0, 1, 0 * m), (1, 1, 5 * m), (2, 1, 9 * m), (3, 1, 120 * m),
        # user 2: steady, one event per 2h -> peak 1, one per session
        (4, 2, 0 * m), (5, 2, 120 * m),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    })
    ds = rd.from_arrow(t).repartition(3)
    peak = peak_event_rate(ds, window_minutes=60,
                           num_partitions=2).to_pandas().set_index(
        "user_id")
    assert peak.loc[1, "peak_events"] == 3
    assert peak.loc[2, "peak_events"] == 1
    sess = user_session_stats(ds, gap_minutes=30,
                              num_partitions=2).to_pandas().set_index(
        "user_id")
    assert sess.loc[1, "n_sessions"] == 2       # burst + isolated
    assert sess.loc[1, "total_events"] == 4
    assert sess.loc[1, "events_per_session"] == 2.0
    assert sess.loc[1, "max_session_span_us"] == 9 * m
    assert sess.loc[2, "n_sessions"] == 2
    assert sess.loc[2, "max_session_span_us"] == 0


@pytest.mark.usefixtures("ray_session")
def test_event_dedup_window_semantics():
    """LAG-window dedup: a retry inside the window is dropped, one just
    past it is kept, other event types never interfere, and the flags
    match the SQL LAG oracle on a random stream."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import event_dedup

    us = 1_000_000
    base = np.datetime64("2024-01-01T00:00:00", "us")

    def ts(sec):
        return base + np.timedelta64(int(sec * us), "us")

    rows = [
        # user 1 click: t=0 kept, t=10 dup, t=311 kept (301 past prev)
        (0, 1, "click", ts(0)),
        (1, 1, "click", ts(10)),
        (2, 1, "click", ts(311)),
        # user 1 view interleaves and never interferes
        (3, 1, "view", ts(5)),
        (4, 1, "view", ts(6)),
        # user 2 same timestamps — partitions are per user
        (5, 2, "click", ts(10)),
        # exactly window_s after previous is still a duplicate (>)
        (6, 2, "click", ts(310)),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array(np.array([r[3] for r in rows],
                                "datetime64[us]")),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    got = event_dedup(rd.from_arrow(t).repartition(3),
                      window_s=300).to_pandas().set_index("event_id")
    assert list(got.loc[[0, 1, 2, 3, 4, 5, 6], "kept"]) \
        == [1, 0, 1, 1, 0, 1, 0]

    # random stream vs the SQL oracle, blocks straddling partitions
    rng = np.random.default_rng(17)
    n = 3000
    tt = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        "event_type": pa.array(
            rng.choice(["a", "b", "c"], n).astype(object), pa.string()),
        "ts": pa.array(
            base + rng.integers(0, 3600 * us, n).astype(
                "timedelta64[us]")),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    })
    got = event_dedup(rd.from_arrow(tt).repartition(7),
                      window_s=120).to_pandas().sort_values(
        "event_id", ignore_index=True)
    con = duckdb.connect()
    con.register("events", tt.to_pandas())
    want = con.execute(
        "WITH l AS (SELECT event_id, epoch_us(ts) AS ts_us,"
        " lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type"
        " ORDER BY ts, event_id) AS prev FROM events)"
        " SELECT event_id, CAST(CASE WHEN prev IS NULL OR"
        " ts_us - prev > 120000000 THEN 1 ELSE 0 END AS BIGINT)"
        " AS kept FROM l ORDER BY event_id").df()
    assert list(got.kept) == list(want.kept)


@pytest.mark.usefixtures("ray_session")
def test_peak_concurrency_sweep_line():
    """Sweep-line overlap counter: hand-built overlap pattern with a
    back-to-back handoff (never overlaps) and a zero-length session
    (never raises the peak), then a random stream vs brute force."""
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.events import peak_concurrency

    m = 60 * 1_000_000
    base = np.datetime64("2024-01-01T00:00:00", "us")

    def ev(eid, uid, t_min):
        return (eid, uid, base + np.timedelta64(int(t_min * m), "us"))

    # gap 30 min: each user's events < 30 min apart form one session.
    # u1: [0, 20], u2: [10, 25], u3: [20, 40] (starts exactly at u1's
    # end -> handoff, overlap only via u2), u4: [5, 5] zero-length.
    rows = [ev(0, 1, 0), ev(1, 1, 20),
            ev(2, 2, 10), ev(3, 2, 25),
            ev(4, 3, 20), ev(5, 3, 40),
            ev(6, 4, 5)]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "ts": pa.array(np.array([r[2] for r in rows],
                                "datetime64[us]")),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    got = peak_concurrency(rd.from_arrow(t).repartition(3),
                           gap_minutes=30).to_pandas()
    assert got.n_sessions[0] == 4
    # peak: u1+u2 overlap on [10, 20]; u4's instant at t=5 lands inside
    # u1 only (zero-length never counts); handoff at 20 = still 2
    assert got.peak_concurrency[0] == 2
    assert got.at_ts_us[0] == (base + np.timedelta64(10 * m, "us")
                               ).astype(np.int64)

    # random stream vs brute-force sweep over the session bounds
    rng = np.random.default_rng(43)
    n = 2000
    tt = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 60, n).astype(np.int64)),
        "event_type": pa.array(["x"] * n),
        "ts": pa.array(base + rng.integers(0, 600 * m, n).astype(
            "timedelta64[us]")),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    })
    got = peak_concurrency(rd.from_arrow(tt).repartition(7),
                           gap_minutes=30).to_pandas()

    # brute force: sessionize per user, then scan boundaries
    df = tt.to_pandas().sort_values(["user_id", "ts", "event_id"])
    sessions = []
    for _, g in df.groupby("user_id"):
        ts_us = g.ts.astype("int64").to_numpy()
        brk = np.ones(len(ts_us), bool)
        brk[1:] = np.diff(ts_us) > 30 * m
        sid = np.cumsum(brk)
        for s in np.unique(sid):
            sel = ts_us[sid == s]
            sessions.append((sel.min(), sel.max()))
    pts = sorted([(s, 1) for s, _ in sessions]
                 + [(e, 0) for _, e in sessions])
    conc = peak = 0
    at = -1
    for ts_us, kind in pts:
        conc += 1 if kind else -1
        if kind and conc > peak:
            peak, at = conc, ts_us
    assert got.n_sessions[0] == len(sessions)
    assert got.peak_concurrency[0] == peak
    assert got.at_ts_us[0] == at
