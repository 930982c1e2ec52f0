"""Event sessionization — the windowed/stateful-streaming operator class.

Ray Data has no session-window operator; this implements one with the
repo's standard shape (SURVEY.md §4.2): ONE range-partitioning sort by
``(user_id, ts, event_id)``, a vectorized per-block segmented kernel, and
a tiny driver-side fold that stitches sessions crossing block boundaries
(blocks of a sorted dataset are globally ordered, so the fold walks the
per-block boundary probes in order and emits a head-remap dict).

A session = a maximal run of one user's events where consecutive gaps are
<= ``gap``.  Output one row per session:

    user_id, session_key (min event_id of the session), n_events,
    t_start_us, t_end_us, total_value (rounded to 6 decimals)

The reference is batch-only (SURVEY.md §2.7: no windows/watermarks); this
operator is part of the beyond-reference training-data surface and has an
exact DuckDB window-function oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from smqtk_indexing_ray.functions.metrics import round6
from smqtk_indexing_ray.stages._util import probe_blocks

_OUT_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("session_key", pa.int64()),
    ("n_events", pa.int64()), ("t_start_us", pa.int64()),
    ("t_end_us", pa.int64()), ("total_value", pa.float64()),
])


def _heads(user: np.ndarray, ts: np.ndarray, gap_us: int) -> np.ndarray:
    """Boolean mask: row starts a session (within this block)."""
    n = len(user)
    h = np.ones(n, dtype=bool)
    if n > 1:
        same = user[1:] == user[:-1]
        close = (ts[1:] - ts[:-1]) <= gap_us
        h[1:] = ~(same & close)
    return h


def sessionize(events, *, gap_minutes: int = 30, num_partitions: int = 16):
    """events Dataset -> session table (one row per session)."""
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()
    gap_us = int(gap_minutes) * 60 * 1_000_000

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([
                ("user_id", pa.int64()), ("ts_us", pa.int64()),
                ("event_id", pa.int64()), ("value", pa.float64()),
            ]).empty_table()
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "value": pc.cast(t["value"], pa.float64()),
        })

    srt = events.select_columns(["user_id", "ts", "event_id", "value"]) \
        .map_batches(slim, batch_format="pyarrow") \
        .sort(["user_id", "ts_us", "event_id"]).materialize()

    # --- boundary probe: first/last row + provisional heads per block ----
    def probe(t: pa.Table):
        cols = ("user_id", "ts_us", "event_id")
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            return None
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        h = _heads(u, ts, gap_us)
        head_idx = np.flatnonzero(h)
        # provisional head event_id for every row
        row_head = e[head_idx[np.searchsorted(head_idx, np.arange(len(u)),
                                              side="right") - 1]]
        return pa.table({
            "first_user": pa.array([int(u[0])], pa.int64()),
            "first_ts": pa.array([int(ts[0])], pa.int64()),
            "first_head": pa.array([int(row_head[0])], pa.int64()),
            "last_user": pa.array([int(u[-1])], pa.int64()),
            "last_ts": pa.array([int(ts[-1])], pa.int64()),
            "last_head": pa.array([int(row_head[-1])], pa.int64()),
        })

    pr = probe_blocks(srt, probe)
    fix: dict[int, int] = {}
    if pr.num_rows:
        fu = pr["first_user"].to_numpy(zero_copy_only=False)
        fts = pr["first_ts"].to_numpy(zero_copy_only=False)
        fh = pr["first_head"].to_numpy(zero_copy_only=False)
        lu = pr["last_user"].to_numpy(zero_copy_only=False)
        lts = pr["last_ts"].to_numpy(zero_copy_only=False)
        lh = pr["last_head"].to_numpy(zero_copy_only=False)

        def resolve(x: int) -> int:
            while x in fix:
                x = fix[x]
            return x

        for i in range(1, pr.num_rows):
            if (fu[i] == lu[i - 1]
                    and fts[i] - lts[i - 1] <= gap_us
                    and int(fh[i]) != int(lh[i - 1])):
                fix[int(fh[i])] = resolve(int(lh[i - 1]))

    # --- assign session heads per block (apply boundary remap) -----------
    def assign(t: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("session_head", pa.int64()), ("user_id", pa.int64()),
            ("ts_us", pa.int64()), ("event_id", pa.int64()),
            ("value", pa.float64()),
        ])
        cols = ("user_id", "ts_us", "event_id")
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        h = _heads(u, ts, gap_us)
        head_idx = np.flatnonzero(h)
        row_head = e[head_idx[np.searchsorted(head_idx, np.arange(len(u)),
                                              side="right") - 1]].copy()
        # only the block's first session can continue a previous block
        first_head = int(row_head[0])
        if first_head in fix:
            tgt = fix[first_head]
            while tgt in fix:
                tgt = fix[tgt]
            row_head[row_head == first_head] = tgt
        return pa.table({
            "session_head": pa.array(row_head.astype(np.int64)),
            "user_id": t["user_id"],
            "ts_us": t["ts_us"],
            "event_id": t["event_id"],
            "value": t["value"],
        })

    assigned = srt.map_batches(assign, batch_format="pyarrow")

    from ray.data.aggregate import Count, Max, Min, Sum
    agg = assigned.groupby("session_head", num_partitions=num_partitions
                           ).aggregate(
        Min("user_id", alias_name="user_id"),
        Min("event_id", alias_name="session_key"),
        Count(alias_name="n_events"),
        Min("ts_us", alias_name="t_start_us"),
        Max("ts_us", alias_name="t_end_us"),
        Sum("value", alias_name="total_value"),
    )

    def project(t: pa.Table) -> pa.Table:
        names = [f.name for f in _OUT_SCHEMA]
        if t.num_rows == 0 or any(c not in t.column_names for c in names):
            return _OUT_SCHEMA.empty_table()
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "session_key": pc.cast(t["session_key"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "t_start_us": pc.cast(t["t_start_us"], pa.int64()),
            "t_end_us": pc.cast(t["t_end_us"], pa.int64()),
            "total_value": pa.array(round6(
                t["total_value"].to_numpy(zero_copy_only=False))),
        })

    return agg.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# tumbling-window aggregates — the pre-aggregate (combiner) pattern
# ---------------------------------------------------------------------------

def _window_col(t: pa.Table, window_minutes: int) -> pa.Array:
    w_us = int(window_minutes) * 60 * 1_000_000
    ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    return pa.array(ts - ts % w_us).cast(pa.timestamp("us"))


def window_agg(events, *, window_minutes: int = 60):
    """Tumbling-window per-event-type aggregate: ``window_start,
    event_type, n_events, min_value, max_value``.

    The textbook partial-aggregation shape (SURVEY.md §4.2 "push
    aggregation partial"): each batch pre-aggregates with an in-batch
    Arrow ``group_by`` (C++ kernel), so only one tiny row per
    (window, type) per batch crosses the shuffle — at 100 TB the shuffle
    input is bounded by windows x types x batches, not by event count.
    min/max/count are order-independent, so the doubles are bit-exact
    against the SQL oracle with no rounding.
    """
    from ray.data.aggregate import Max, Min, Sum

    out_schema = pa.schema([
        ("window_start", pa.timestamp("us")), ("event_type", pa.string()),
        ("n_events", pa.int64()), ("min_value", pa.float64()),
        ("max_value", pa.float64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.column_names:
            return pa.schema([
                ("window_start", pa.timestamp("us")),
                ("event_type", pa.string()), ("n", pa.int64()),
                ("mn", pa.float64()), ("mx", pa.float64())]).empty_table()
        t2 = pa.table({"window_start": _window_col(t, window_minutes),
                       "event_type": t["event_type"],
                       "value": t["value"]})
        g = t2.group_by(["window_start", "event_type"]).aggregate(
            [("value", "count"), ("value", "min"), ("value", "max")])
        return g.rename_columns(
            ["window_start", "event_type", "n", "mn", "mx"])

    part = events.select_columns(["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow")
    agg = part.groupby(["window_start", "event_type"]).aggregate(
        Sum("n", alias_name="n_events"), Min("mn", alias_name="min_value"),
        Max("mx", alias_name="max_value"))

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_events" not in t.column_names:
            return out_schema.empty_table()
        return pa.table({
            "window_start": pc.cast(t["window_start"], pa.timestamp("us")),
            "event_type": t["event_type"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "min_value": t["min_value"],
            "max_value": t["max_value"],
        })

    return agg.map_batches(clean, batch_format="pyarrow")


def window_user_counts(events, *, window_minutes: int = 60):
    """Exact distinct users per tumbling window: ``window_start,
    n_users``.

    Two-level exact distinct: batches pre-dedup (window, user) pairs
    in-batch (Arrow group_by), the shuffle then sees at most one row per
    (window, user) per batch, and a global groupby finishes the dedup
    before the per-window count — the scale-safe exact COUNT DISTINCT.
    """
    from ray.data.aggregate import Count

    out_schema = pa.schema([("window_start", pa.timestamp("us")),
                            ("n_users", pa.int64())])

    def pair_dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.column_names:
            return pa.schema([("window_start", pa.timestamp("us")),
                              ("user_id", pa.int64())]).empty_table()
        t2 = pa.table({"window_start": _window_col(t, window_minutes),
                       "user_id": t["user_id"]})
        g = t2.group_by(["window_start", "user_id"]).aggregate([])
        return g.select(["window_start", "user_id"])

    pairs = events.select_columns(["ts", "user_id"]).map_batches(
        pair_dedup, batch_format="pyarrow")
    distinct = pairs.groupby(["window_start", "user_id"]).aggregate(
        Count(alias_name="_c"))

    def strip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "window_start" not in t.column_names:
            return pa.schema([("window_start", pa.timestamp("us")),
                              ("user_id", pa.int64())]).empty_table()
        return t.select(["window_start", "user_id"])

    counts = distinct.map_batches(strip, batch_format="pyarrow").groupby(
        "window_start").aggregate(Count(alias_name="n_users"))

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_users" not in t.column_names:
            return out_schema.empty_table()
        return pa.table({
            "window_start": pc.cast(t["window_start"], pa.timestamp("us")),
            "n_users": pc.cast(t["n_users"], pa.int64()),
        })

    return counts.map_batches(clean, batch_format="pyarrow")


def hopping_window_counts(events, *, window_minutes: int = 60,
                          hop_minutes: int = 30):
    """Sliding (hopping) window event counts: every window of length
    ``window_minutes`` starting on a ``hop_minutes`` boundary, so each
    event lands in ``window/hop`` windows.

    ``window_minutes`` must be a multiple of ``hop_minutes``.  Same
    partial-aggregation shape as :func:`window_agg` — the explode factor
    is applied in-batch and immediately pre-aggregated, so the shuffle
    sees one row per (window, batch), not per (event, window).
    """
    from ray.data.aggregate import Sum

    if window_minutes % hop_minutes:
        raise ValueError("window_minutes must be a multiple of hop_minutes")
    k = window_minutes // hop_minutes
    hop_us = int(hop_minutes) * 60 * 1_000_000

    out_schema = pa.schema([("window_start", pa.timestamp("us")),
                            ("n_events", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        psch = pa.schema([("window_start", pa.timestamp("us")),
                          ("n", pa.int64())])
        if t.num_rows == 0 or "ts" not in t.column_names:
            return psch.empty_table()
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        w_max = ts - ts % hop_us
        # windows w_max - (k-1)*hop .. w_max, all containing the event
        ws = (w_max[None, :] - (np.arange(k - 1, -1, -1,
                                          dtype=np.int64)[:, None] * hop_us)
              ).reshape(-1)
        t2 = pa.table({"window_start": pa.array(ws).cast(
            pa.timestamp("us"))})
        g = t2.group_by(["window_start"]).aggregate(
            [("window_start", "count")])
        return g.rename_columns(["window_start", "n"])

    part = events.select_columns(["ts"]).map_batches(
        partial, batch_format="pyarrow")
    agg = part.groupby("window_start").aggregate(
        Sum("n", alias_name="n_events"))

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_events" not in t.column_names:
            return out_schema.empty_table()
        return pa.table({
            "window_start": pc.cast(t["window_start"], pa.timestamp("us")),
            "n_events": pc.cast(t["n_events"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")
