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

    from smqtk_indexing_ray.stages._util import coalesced_sort
    srt = coalesced_sort(
        events.select_columns(["user_id", "ts", "event_id", "value"])
        .map_batches(slim, batch_format="pyarrow"),
        ["user_id", "ts_us", "event_id"])

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

    pair_schema = pa.schema([("window_start", pa.timestamp("us")),
                             ("user_id", pa.int64())])
    pairs = events.select_columns(["ts", "user_id"]).map_batches(
        pair_dedup, batch_format="pyarrow")
    # two-level exact distinct on the sorted-agg path (stages/agg.py)
    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    distinct = sorted_group_agg(
        pairs, key=["window_start", "user_id"],
        aggs={"_c": "count"}, schema=pair_schema)

    def strip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "window_start" not in t.column_names:
            return pair_schema.empty_table()
        return t.select(["window_start", "user_id"])

    counts = sorted_group_agg(
        distinct.map_batches(strip, batch_format="pyarrow"),
        key="window_start", aggs={"n_users": "count"},
        schema=pair_schema)

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_users" not in t.column_names:
            return out_schema.empty_table()
        return pa.table({
            "window_start": pc.cast(t["window_start"], pa.timestamp("us")),
            "n_users": pc.cast(t["n_users"], pa.int64()),
        })

    return counts.map_batches(clean, batch_format="pyarrow")


def cohort_retention(events, *, day_us: int = 86_400_000_000):
    """Cohort retention matrix: users bucketed by first-seen day, then
    counted distinct on every activity day, with the exact retention
    ratio vs cohort size — the product-analytics staple.

    Scale shape: (1) per-user first-seen day is a per-batch
    ``(user, min_day)`` partial + groupby Min (the shuffle carries one
    row per user per batch, not events); (2) the cohort day joins back
    onto the slimmed event stream via the sort-merge attach keyed by
    user_id (user cardinality is unbounded — no broadcast);
    (3) ``(cohort_day, activity_day, user_id)`` goes through the
    two-level exact distinct (in-batch Arrow group_by pre-dedup, then a
    global groupby); (4) cohort sizes are a histogram-sized map
    broadcast into the final ratio.  ``retention`` is an exact
    int64/int64 IEEE division — bit-identical to the SQL oracle.

    Output: ``cohort_day, activity_day, n_users, retention`` (day =
    int64 days since epoch).
    """
    import ray
    from ray.data.aggregate import Sum

    from smqtk_indexing_ray.stages._util import (
        collect_table,
        stamp_schema,
    )
    from smqtk_indexing_ray.stages.attach import sort_attach

    ud_schema = pa.schema([("user_id", pa.int64()),
                           ("day", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.column_names:
            return ud_schema.empty_table()
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "day": pa.array((ts // day_us).astype(np.int64)),
        })

    days = events.select_columns(["ts", "user_id"]).map_batches(
        slim, batch_format="pyarrow")

    def first_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return ud_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        d = t["day"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(u, return_inverse=True)
        md = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(md, inv, d)
        return pa.table({"user_id": pa.array(uniq.astype(np.int64)),
                         "day": pa.array(md)})

    # sort-based grouped min — a hash groupby's aggregator-actor
    # spin-up costs ~5 s at this shape (stages/agg.py docstring)
    cohort_schema = pa.schema([("user_id", pa.int64()),
                               ("cohort_day", pa.int64())])
    from smqtk_indexing_ray.stages.agg import sorted_group_agg
    firsts_raw = sorted_group_agg(
        days.map_batches(first_partial, batch_format="pyarrow"),
        key="user_id", aggs={"day": "min"},
        schema=ud_schema)

    def _ren(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return cohort_schema.empty_table()
        return t.rename_columns(["user_id", "cohort_day"])

    firsts = firsts_raw.map_batches(
        _ren, batch_format="pyarrow").materialize()

    # cohort sizes: combiner partial counts -> tiny groupby -> broadcast
    size_schema = pa.schema([("cohort_day", pa.int64()),
                             ("n", pa.int64())])

    def size_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cohort_day" not in t.column_names:
            return size_schema.empty_table()
        d = t["cohort_day"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"cohort_day": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    sizes_tbl = collect_table(
        firsts.map_batches(size_partial, batch_format="pyarrow")
        .groupby("cohort_day").aggregate(Sum("n", alias_name="n")),
        size_schema)
    sizes = dict(zip(sizes_tbl["cohort_day"].to_pylist(),
                     sizes_tbl["n"].to_pylist()))
    sizes_ref = ray.put(sizes)

    att = sort_attach(days, firsts, key="user_id",
                      payload_key="user_id",
                      payload_cols=["cohort_day"], how="inner",
                      rows_schema=ud_schema,
                      payload_schema=cohort_schema)

    triple_schema = pa.schema([("cohort_day", pa.int64()),
                               ("activity_day", pa.int64()),
                               ("user_id", pa.int64())])

    def triple_dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cohort_day" not in t.column_names:
            return triple_schema.empty_table()
        t2 = pa.table({"cohort_day": t["cohort_day"],
                       "activity_day": t["day"],
                       "user_id": t["user_id"]})
        return t2.group_by(["cohort_day", "activity_day",
                            "user_id"]).aggregate([])

    # two-level exact distinct on the sorted-agg path (stages/agg.py):
    # the global dedup and the per-cell count are each one narrow sort
    distinct = sorted_group_agg(
        att.map_batches(triple_dedup, batch_format="pyarrow"),
        key=["cohort_day", "activity_day", "user_id"],
        aggs={"_c": "count"}, schema=triple_schema)

    def strip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cohort_day" not in t.column_names:
            return triple_schema.empty_table()
        return t.select(["cohort_day", "activity_day", "user_id"])

    cells = sorted_group_agg(
        distinct.map_batches(strip, batch_format="pyarrow"),
        key=["cohort_day", "activity_day"],
        aggs={"n_users": "count"}, schema=triple_schema)

    out_schema = pa.schema([("cohort_day", pa.int64()),
                            ("activity_day", pa.int64()),
                            ("n_users", pa.int64()),
                            ("retention", pa.float64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_users" not in t.column_names:
            return out_schema.empty_table()
        smap = ray.get(sizes_ref)
        cd = t["cohort_day"].to_numpy(zero_copy_only=False)
        n = t["n_users"].to_numpy(zero_copy_only=False).astype(np.int64)
        sz = np.array([smap[int(c)] for c in cd], np.int64)
        return pa.table({
            "cohort_day": t["cohort_day"],
            "activity_day": t["activity_day"],
            "n_users": pa.array(n),
            "retention": pa.array(n / sz),
        })

    return cells.map_batches(finish, batch_format="pyarrow")


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


# --------------------------------------------------------------------------
# Ordered conversion funnel
# --------------------------------------------------------------------------

def _funnel_runs(step: np.ndarray, ts: np.ndarray,
                 run_starts: np.ndarray, run_ends: np.ndarray,
                 k: int,
                 entry0: tuple[int, int | None, int | None]) -> tuple:
    """Vectorized greedy funnel over user runs of one sorted block.

    ``step[i]`` is the funnel-step index of row i (rows sorted by
    (user, ts, event_id), runs are contiguous per-user row ranges).
    The greedy chain per run: the step-(j+1) event must come strictly
    after the chosen step-j event in ROW order — row order is
    (ts, event_id) lexicographic order, which is the strictness the SQL
    oracle uses, and is what makes cross-block entry states independent
    of timestamps (every row of a later block sorts strictly after
    every same-user row of an earlier block; event_id is unique).

    ``entry0`` seeds run 0 with ``(steps_done, t_first_us, t_last_us)``
    carried from earlier blocks.  Returns per-run arrays
    ``(steps, t_first, t_last, t_valid_first, t_valid_last)``.
    """
    n_runs = len(run_starts)
    cur = np.zeros(n_runs, dtype=np.int64)
    pos = run_starts.astype(np.int64) - 1
    t_first = np.zeros(n_runs, dtype=np.int64)
    t_last = np.zeros(n_runs, dtype=np.int64)
    v_first = np.zeros(n_runs, dtype=bool)
    v_last = np.zeros(n_runs, dtype=bool)
    if n_runs:
        e_steps, e_tf, e_tl = entry0
        cur[0] = e_steps
        if e_tf is not None:
            t_first[0], v_first[0] = e_tf, True
        if e_tl is not None:
            t_last[0], v_last[0] = e_tl, True
    step_idx = [np.flatnonzero(step == j) for j in range(k)]
    for j in range(k):
        idx_j = step_idx[j]
        act = np.flatnonzero(cur == j)
        if not len(act) or not len(idx_j):
            continue
        ins = np.searchsorted(idx_j, pos[act], side="right")
        ok = ins < len(idx_j)
        cand = np.where(ok, idx_j[np.minimum(ins, len(idx_j) - 1)], -1)
        ok &= cand < run_ends[act]
        hit = act[ok]
        chosen = cand[ok]
        cur[hit] = j + 1
        pos[hit] = chosen
        t_last[hit], v_last[hit] = ts[chosen], True
        if j == 0:  # t_first = ts of the 0 -> 1 advance only
            t_first[hit], v_first[hit] = ts[chosen], True
    return cur, t_first, t_last, v_first, v_last


def funnel(events, *, steps: tuple[str, ...] = ("view", "click",
                                                "purchase")):
    """Per-user ordered conversion funnel: how far each user progressed
    through ``steps`` using the greedy earliest chain — the step-(j+1)
    event must be strictly later than the chosen step-j event in
    ``(ts, event_id)`` order.

    Output one row per user having >= 1 event of any step type:
    ``user_id, steps_completed, t_first_us, t_last_us`` (timestamps of
    the first / latest completed step; null when ``steps_completed=0``).

    Shape (SURVEY.md §4.2): ONE range-partitioning sort of the slimmed
    (user_id, ts_us, event_id, step) stream, a vectorized multi-pass
    state machine per block (k searchsorted passes over user runs, no
    Python row loop), and an O(blocks) driver fold of per-block entry
    carries.  A user's run crossing block boundaries is threaded through
    the fold: each block's probe reports, for its first and last user
    run, the exit state under every possible entry state (k+1 values,
    independent of entry timestamps thanks to the lexicographic
    strictness above), and the fill task for the block where the run
    ends emits the composed row.  Cross-block state is O(1) per block;
    nothing user-sized ever reaches the driver.

    The reference is batch-only with no event semantics (SURVEY.md
    §2.7); this extends the beyond-reference event surface
    (sessionize / windows / as-of) with the sequential-pattern class.
    Exact DuckDB oracle: chained row_number() CTEs (see
    __ray_entry__.oracle_sql 'funnel').
    """
    import functools

    import ray
    import ray.data as rd

    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()
    from smqtk_indexing_ray.stages._util import _get_probe_task

    k = len(steps)
    if not 2 <= k <= 16:
        raise ValueError(f"funnel needs 2..16 steps, got {k}")
    if len(set(steps)) != k:
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    step_of = {s: j for j, s in enumerate(steps)}

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("steps_completed", pa.int64()),
        ("t_first_us", pa.int64()), ("t_last_us", pa.int64()),
    ])
    slim_schema = pa.schema([
        ("user_id", pa.int64()), ("ts_us", pa.int64()),
        ("event_id", pa.int64()), ("step", pa.int64()),
    ])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return slim_schema.empty_table()
        et = t["event_type"]
        sidx = pc.index_in(et, value_set=pa.array(list(steps),
                                                  pa.string()))
        mask = pc.is_valid(sidx)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()).filter(mask),
            "ts_us": pc.cast(t["ts"], pa.int64()).filter(mask),
            "event_id": pc.cast(t["event_id"], pa.int64()).filter(mask),
            "step": pc.cast(sidx, pa.int64()).filter(mask),
        })

    from smqtk_indexing_ray.stages._util import coalesced_sort
    srt = coalesced_sort(
        events.select_columns(["user_id", "ts", "event_id",
                               "event_type"])
        .map_batches(slim, batch_format="pyarrow"),
        ["user_id", "ts_us", "event_id"])

    def _arrays(t: pa.Table):
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        st = t["step"].to_numpy(zero_copy_only=False)
        new = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            np.not_equal(u[1:], u[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(u))
        return u, ts, st, starts, ends

    def probe(t: pa.Table):
        cols = ("user_id", "ts_us", "event_id", "step")
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            return None
        u, ts, st, starts, ends = _arrays(t)

        def run_exits(r: int) -> list:
            """Exit (steps, t_first, t_last) of run r per entry state."""
            s, e = int(starts[r]), int(ends[r])
            sub_st, sub_ts = st[s:e], ts[s:e]
            sub_start = np.array([0], dtype=np.int64)
            sub_end = np.array([e - s], dtype=np.int64)
            out = []
            for j in range(k):
                c, tf, tl, vf, vl = _funnel_runs(
                    sub_st, sub_ts, sub_start, sub_end, k,
                    (j, None, None))
                out.append((int(c[0]),
                            int(tf[0]) if vf[0] else None,
                            int(tl[0]) if vl[0] else None))
            return out

        first_map = run_exits(0)
        last_map = first_map if len(starts) == 1 else \
            run_exits(len(starts) - 1)
        return {
            "u_first": int(u[0]), "u_last": int(u[-1]),
            "n_runs": int(len(starts)),
            "first_map": first_map, "last_exit0": last_map[0],
        }

    refs = [ref for bundle in srt.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks]
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    task = _get_probe_task()
    probes = ray.get([task.remote(probe, r) for r in refs])

    nonempty = [i for i, p in enumerate(probes) if p is not None]
    # continues[i]: block i's last run is continued by the next
    # non-empty block
    continues = {i: False for i in nonempty}
    for a, b in zip(nonempty, nonempty[1:]):
        continues[a] = probes[b]["u_first"] == probes[a]["u_last"]

    def compose(state, m_entry):
        """Apply one block's exit-map entry to a composed chain state."""
        s, tf, tl = state
        if s >= k:
            return state
        es, m_tf, m_tl = m_entry
        if es == s:
            return state
        return (es, tf if s >= 1 else m_tf, m_tl)

    ZERO = (0, None, None)
    entries: dict[int, tuple] = {}
    pending_user, pending = None, ZERO
    for i in nonempty:
        p = probes[i]
        if pending_user is not None and pending_user == p["u_first"]:
            entries[i] = pending
        else:
            entries[i] = ZERO
        if p["n_runs"] == 1:
            # the block's only run continues the chain (or starts one)
            tail_entry = entries[i]
            exit_state = tail_entry if tail_entry[0] >= k else compose(
                tail_entry, p["first_map"][tail_entry[0]])
        else:
            # the last run starts fresh inside this block
            exit_state = compose(ZERO, p["last_exit0"])
        pending_user, pending = p["u_last"], exit_state

    def fill(t: pa.Table, entry, cont: bool) -> pa.Table:
        cols = ("user_id", "ts_us", "event_id", "step")
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            return out_schema.empty_table()
        u, ts, st, starts, ends = _arrays(t)
        cur, tf, tl, vf, vl = _funnel_runs(st, ts, starts, ends, k, entry)
        keep = np.ones(len(starts), dtype=bool)
        if cont:
            keep[-1] = False
        return pa.table({
            "user_id": pa.array(u[starts[keep]].astype(np.int64)),
            "steps_completed": pa.array(cur[keep]),
            "t_first_us": pa.array(np.where(vf[keep], tf[keep], 0),
                                   pa.int64(), mask=~vf[keep]),
            "t_last_us": pa.array(np.where(vl[keep], tl[keep], 0),
                                  pa.int64(), mask=~vl[keep]),
        })

    filled = [task.remote(
        functools.partial(fill, entry=entries.get(i, ZERO),
                          cont=continues.get(i, False)), r)
        for i, r in enumerate(refs)]
    return rd.from_arrow_refs(filled)


# ---------------------------------------------------------------------------
# per-user inter-arrival gaps — the LAG window primitive
# ---------------------------------------------------------------------------

def user_event_gaps(events, *, num_partitions: int = 16):
    """Microseconds since the same user's previous event —
    ``epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
    ORDER BY ts, event_id)``, with ``-1`` for each user's first event
    (the repo-wide no-match sentinel, cf. the asof_join oracle).

    One sorted pass (``stages/agg.sorted_lag_attach``): lag needs only
    the immediately-preceding row, so the boundary carry is a single
    row per block chained in sorted block order.  Bot-burst detection
    and session-gap tuning both start from this table.

    Reference analog: the consecutive-neighbor distance comparison in
    the reference's sorted candidate re-rank
    (/root/reference/smqtk_indexing/impls/nn_index/lsh.py:513-518).
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages._util import auto_blocks
    from smqtk_indexing_ray.stages.agg import sorted_lag_attach

    slim_schema = pa.schema([("user_id", pa.int64()),
                             ("ts_us", pa.int64()),
                             ("event_id", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return slim_schema.empty_table()
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64()),
        })

    lagged = sorted_lag_attach(
        events.select_columns(["user_id", "ts", "event_id"])
        .map_batches(slim, batch_format="pyarrow"),
        key="user_id", order=["ts_us", "event_id"],
        value="ts_us", out="prev_ts_us",
        num_blocks=max(num_partitions, auto_blocks()),
        schema=slim_schema)

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("gap_us", pa.int64())])

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "prev_ts_us" not in t.column_names:
            return out_schema.empty_table()
        gap = pc.fill_null(
            pc.subtract(t["ts_us"], t["prev_ts_us"]), -1)
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "gap_us": pc.cast(gap, pa.int64())})

    from smqtk_indexing_ray.stages._util import stamp_schema
    return stamp_schema(
        lagged.map_batches(project, batch_format="pyarrow"), out_schema)


def user_first_last(events, *, num_partitions: int = 16):
    """Per-user lifecycle summary: event count, first/last event
    timestamps, the event TYPES on those boundary rows (the
    arg-extremes — ``first_value/last_value OVER (PARTITION BY user_id
    ORDER BY ts, event_id)``), and the activity span in seconds.

    One sorted pass (``stages/agg.sorted_group_agg`` with the
    order-sensitive ``first``/``last`` ops): the entry/exit action per
    user is the standard churn-analysis shape, and doing it as a
    grouped arg-extreme instead of two row_number windows + self-joins
    keeps it a single shuffle.  ``span_sec`` is an int64-difference /
    1e6 IEEE division, bit-identical to the SQL oracle.

    Reference analog: the min/max-key accounting of the LSH bucket map
    build (/root/reference/smqtk_indexing/impls/nn_index/
    lsh.py:315-323), lifted to ordered per-group boundary rows.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages._util import auto_blocks, stamp_schema
    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    slim_schema = pa.schema([("user_id", pa.int64()),
                             ("ts_us", pa.int64()),
                             ("event_id", pa.int64()),
                             ("event_type", pa.string())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return slim_schema.empty_table()
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "event_type": pc.cast(t["event_type"], pa.string()),
        })

    agg = sorted_group_agg(
        events.select_columns(["user_id", "ts", "event_id",
                               "event_type"])
        .map_batches(slim, batch_format="pyarrow"),
        key="user_id", order=["ts_us", "event_id"],
        aggs={"n_events": ("event_id", "count"),
              "first_ts_us": ("ts_us", "first"),
              "last_ts_us": ("ts_us", "last"),
              "first_type": ("event_type", "first"),
              "last_type": ("event_type", "last")},
        num_blocks=max(num_partitions, auto_blocks()),
        schema=slim_schema)

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("n_events", pa.int64()),
        ("first_ts_us", pa.int64()), ("last_ts_us", pa.int64()),
        ("first_type", pa.string()), ("last_type", pa.string()),
        ("span_sec", pa.float64())])

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_events" not in t.column_names:
            return out_schema.empty_table()
        span = (t["last_ts_us"].to_numpy(zero_copy_only=False)
                - t["first_ts_us"].to_numpy(zero_copy_only=False))
        return pa.table({
            "user_id": t["user_id"],
            "n_events": t["n_events"],
            "first_ts_us": t["first_ts_us"],
            "last_ts_us": t["last_ts_us"],
            "first_type": t["first_type"],
            "last_type": t["last_type"],
            "span_sec": pa.array(span / 1000000.0),
        }, schema=out_schema)

    return stamp_schema(
        agg.map_batches(project, batch_format="pyarrow"), out_schema)


def rolling_user_stats(events, *, k: int = 3, num_partitions: int = 16):
    """Bounded rolling window per user — ``count(*)`` and
    ``max(value)`` OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN k PRECEDING AND CURRENT ROW) — the burst/spike
    detector over the event stream.

    One sorted pass (``stages/agg.sorted_rolling_attach``); the
    boundary carry is each block's last ``k`` rows chained in sorted
    block order, so the shuffle cost is identical to a plain sort.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages._util import auto_blocks, stamp_schema
    from smqtk_indexing_ray.stages.agg import sorted_rolling_attach

    slim_schema = pa.schema([("user_id", pa.int64()),
                             ("ts_us", pa.int64()),
                             ("event_id", pa.int64()),
                             ("value", pa.float64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return slim_schema.empty_table()
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "value": pc.cast(pc.fill_null(t["value"], 0.0),
                             pa.float64()),
        })

    rolled = sorted_rolling_attach(
        events.select_columns(["user_id", "ts", "event_id", "value"])
        .map_batches(slim, batch_format="pyarrow"),
        key="user_id", order=["ts_us", "event_id"],
        value="value", k=k,
        num_blocks=max(num_partitions, auto_blocks()),
        schema=slim_schema)

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("win_n", pa.int64()),
                            ("win_max", pa.float64())])

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "win_n" not in t.column_names:
            return out_schema.empty_table()
        return t.select(["event_id", "win_n", "win_max"])

    return stamp_schema(
        rolled.map_batches(project, batch_format="pyarrow"), out_schema)


def props_field_stats(events, *, field: str = "k"):
    """Per-event-type stats of an integer JSON field inside the
    ``props`` payload column — the "parse the JSON side-channel and
    aggregate it" pass every event pipeline runs, exercising the
    vectorized JSON kernel (:mod:`smqtk_indexing_ray.functions.jsonf`).

    Scale shape: each batch parses ``props`` columnarly (polars' Rust
    JSON parser) and pre-aggregates into one row per event type
    (bounded cells), so the final sort-based combine shuffles
    O(#types x #batches) partial rows, never events.  A field that is
    null / absent / non-integer in a row is excluded from sum/min/max
    and counted via ``n_events - n_with``; a type with no valid value
    at all gets NULL min/max/avg (SQL aggregate semantics).  ``avg_k``
    is the exact int64/int64 IEEE ratio.

    Output: ``event_type, n_events, n_with, sum_k, min_k, max_k,
    avg_k``.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.functions.jsonf import json_field_int64
    from smqtk_indexing_ray.stages._util import stamp_schema
    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    imin, imax = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    part_schema = pa.schema([
        ("event_type", pa.string()), ("n_events", pa.int64()),
        ("n_with", pa.int64()), ("sum_k", pa.int64()),
        ("min_k", pa.int64()), ("max_k", pa.int64()),
    ])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "props" not in t.column_names:
            return part_schema.empty_table()
        k = json_field_int64(t["props"], field)
        kv = k.to_numpy(zero_copy_only=False)  # float64 w/ NaN if nulls
        valid = ~pc.is_null(k).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(
            pc.fill_null(t["event_type"], "")).combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        m = len(enc.dictionary)
        n_ev = np.bincount(idx, minlength=m).astype(np.int64)
        n_w = np.bincount(idx[valid], minlength=m).astype(np.int64)
        sums = np.zeros(m, np.int64)
        mins = np.full(m, imax, np.int64)
        maxs = np.full(m, imin, np.int64)
        if valid.any():
            ki = kv[valid].astype(np.int64)
            iv = idx[valid]
            np.add.at(sums, iv, ki)
            np.minimum.at(mins, iv, ki)
            np.maximum.at(maxs, iv, ki)
        return pa.table({
            "event_type": enc.dictionary,
            "n_events": pa.array(n_ev), "n_with": pa.array(n_w),
            "sum_k": pa.array(sums), "min_k": pa.array(mins),
            "max_k": pa.array(maxs),
        }, schema=part_schema)

    parts = events.select_columns(["event_type", "props"]).map_batches(
        partial, batch_format="pyarrow")
    agg = sorted_group_agg(
        parts, key="event_type",
        aggs={"n_events": "sum", "n_with": "sum",
              "sum_k": "sum", "min_k": "min", "max_k": "max"},
        schema=part_schema)
    # re-key sums to combine n_events/n_with correctly: sorted_group_agg
    # applies the per-column op, and partial counts combine by SUM —
    # "sum" above is exactly that, so nothing further to fix; the empty
    # sentinels only need nulling where no value existed at all
    out_schema = pa.schema([
        ("event_type", pa.string()), ("n_events", pa.int64()),
        ("n_with", pa.int64()), ("sum_k", pa.int64()),
        ("min_k", pa.int64()), ("max_k", pa.int64()),
        ("avg_k", pa.float64()),
    ])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_with" not in t.column_names:
            return out_schema.empty_table()
        nw = t["n_with"].to_numpy(zero_copy_only=False).astype(np.int64)
        has = nw > 0
        sums = t["sum_k"].to_numpy(zero_copy_only=False).astype(np.int64)
        avg = np.where(has, sums.astype(np.float64) /
                       np.where(has, nw, 1).astype(np.float64), np.nan)
        mask = pa.array(~has)
        return pa.table({
            "event_type": t["event_type"],
            "n_events": t["n_events"], "n_with": t["n_with"],
            "sum_k": pc.if_else(mask, None, pa.array(sums)),
            "min_k": pc.if_else(mask, None, t["min_k"]),
            "max_k": pc.if_else(mask, None, t["max_k"]),
            "avg_k": pa.array(avg, pa.float64(),
                              mask=~has if (~has).any() else None),
        }, schema=out_schema)

    return stamp_schema(
        agg.map_batches(finish, batch_format="pyarrow"), out_schema)


def trailing_active_users(events, *, window_days: int = 7):
    """Trailing-window distinct users (the DAU/WAU dashboard metric):
    for every covered day, how many distinct users had at least one
    event in the ``window_days``-day window ENDING that day.

    Scale shape — the sliding COUNT DISTINCT without a range self-join:
    each batch pre-dedups to its distinct ``(day, user)`` pairs
    (in-batch Arrow group_by), expands each pair to the ``window_days``
    report days it covers (a bounded x7 blowup of the DEDUPED pairs,
    not of events), re-dedups in batch, and the global two-level exact
    distinct rides the sorted-agg path — the shuffle carries at most
    one row per (covered day, user) per batch.  Days keep trailing
    coverage up to ``window_days - 1`` days past a user's last event
    (documented semantics shared with the SQL oracle's expansion).

    Output: ``day (timestamp us, midnight), n_users_7d`` — exact
    int64.
    """
    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    day_us = 86_400_000_000
    pair_schema = pa.schema([("day", pa.timestamp("us")),
                             ("user_id", pa.int64())])
    out_schema = pa.schema([("day", pa.timestamp("us")),
                            ("n_users_7d", pa.int64())])

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.column_names:
            return pair_schema.empty_table()
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = ts - ts % day_us
        base = pa.table({"day": pa.array(day),
                         "user_id": t["user_id"]}) \
            .group_by(["day", "user_id"]).aggregate([])
        d = base["day"].to_numpy(zero_copy_only=False)
        u = base["user_id"].to_numpy(zero_copy_only=False)
        k = np.arange(window_days, dtype=np.int64) * day_us
        cov_day = (d[:, None] + k[None, :]).ravel()
        cov_usr = np.repeat(u, window_days)
        cov = pa.table({"day": pa.array(cov_day),
                        "user_id": pa.array(cov_usr)}) \
            .group_by(["day", "user_id"]).aggregate([])
        return pa.table({
            "day": cov["day"].cast(pa.timestamp("us")),
            "user_id": cov["user_id"],
        }, schema=pair_schema)

    pairs = events.select_columns(["ts", "user_id"]).map_batches(
        expand, batch_format="pyarrow")
    distinct = sorted_group_agg(
        pairs, key=["day", "user_id"], aggs={"_c": "count"},
        schema=pair_schema)

    def strip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "day" not in t.column_names:
            return pair_schema.empty_table()
        return t.select(["day", "user_id"])

    counts = sorted_group_agg(
        distinct.map_batches(strip, batch_format="pyarrow"),
        key="day", aggs={"n_users_7d": "count"}, schema=pair_schema)

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_users_7d" not in t.column_names:
            return out_schema.empty_table()
        return pa.table({
            "day": pc.cast(t["day"], pa.timestamp("us")),
            "n_users_7d": t["n_users_7d"],
        }, schema=out_schema)

    return counts.map_batches(clean, batch_format="pyarrow")


RANGE_COUNT_SCHEMA = pa.schema([
    ("event_id", pa.int64()), ("user_id", pa.int64()),
    ("ts", pa.timestamp("us")), ("n_window", pa.int64()),
])


def trailing_event_counts(events, *, window_minutes: int = 60,
                          num_partitions: int = 16):
    """RANGE-window trailing count per user: for every event, how many
    of the SAME user's events fall in ``[ts - window, ts]`` (self and
    ts-ties included) — ``count(*) OVER (PARTITION BY user_id ORDER BY
    ts RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW)``, the burst
    / rate-limit signal the ROWS-window stage cannot express.

    Scale shape — the sliding range count WITHOUT a range self-join:

    1. collapse events to per-(user, ts) multiplicities (one sorted
       agg; ties collapse, so downstream inputs are distinct-ts-sized);
    2. exact global prefix sum (``stages/prefix.running_total``) minus
       each user's base (``sorted_first_attach``) gives
       ``cum_le(user, ts)`` = #events of the user at or before ts;
    3. every event emits TWO signed as-of probes — +1 at ``ts`` and
       -1 at ``ts - w - 1us`` — resolved by ONE backward as-of join
       against the cum table, and a final per-event signed sum
       reassembles ``cum_le(ts) - cum_le(ts - w - 1)``, the window
       count.  Probes that precede the user's first event resolve to
       null -> 0.

    Every intermediate is integer-exact; no float, no N^2 pairs.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import (
        sorted_first_attach,
        sorted_group_agg,
    )
    from smqtk_indexing_ray.stages.asof import asof_join
    from smqtk_indexing_ray.stages.prefix import running_total

    w_us = int(window_minutes) * 60_000_000
    base_schema = pa.schema([("user_id", pa.int64()),
                             ("ts_us", pa.int64())])

    def to_us(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return base_schema.empty_table()
        return pa.table({"user_id": t["user_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64())},
                        schema=base_schema)

    per_ts = sorted_group_agg(
        events.select_columns(["user_id", "ts"]).map_batches(
            to_us, batch_format="pyarrow"),
        key=["user_id", "ts_us"], aggs={"c": "count"},
        num_blocks=num_partitions, schema=base_schema)

    cnt_schema = pa.schema([("user_id", pa.int64()),
                            ("ts_us", pa.int64()), ("c", pa.int64())])

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return cnt_schema.empty_table()
        return pa.table({"user_id": t["user_id"], "ts_us": t["ts_us"],
                         "c": pc.cast(t["c"], pa.int64())},
                        schema=cnt_schema)

    counted = per_ts.map_batches(clean, batch_format="pyarrow")
    pre = running_total(counted, order=["user_id", "ts_us"], value="c",
                        out="before", schema=cnt_schema)
    pre_schema = pa.schema(list(cnt_schema)
                           + [pa.field("before", pa.int64())])
    based = sorted_first_attach(pre, key="user_id", value="before",
                                out="user_base",
                                num_blocks=num_partitions,
                                schema=pre_schema)

    cum_schema = pa.schema([("user_id", pa.int64()), ("ats", pa.int64()),
                            ("cum_le", pa.int64())])

    def to_cum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_base" not in t.column_names:
            return cum_schema.empty_table()
        before = t["before"].to_numpy(zero_copy_only=False)
        base = t["user_base"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": t["user_id"], "ats": t["ts_us"],
                         "cum_le": pa.array(before - base + c)},
                        schema=cum_schema)

    cum = based.map_batches(to_cum, batch_format="pyarrow")

    probe_schema = pa.schema([("event_id", pa.int64()),
                              ("user_id", pa.int64()),
                              ("ats", pa.int64()), ("sign", pa.int64())])

    def probes(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return probe_schema.empty_table()
        ts_us = pc.cast(t["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": pa.array(np.concatenate([eid, eid])),
            "user_id": pa.array(np.concatenate([uid, uid])),
            "ats": pa.array(np.concatenate([ts_us, ts_us - w_us - 1])),
            "sign": pa.array(np.concatenate(
                [np.ones(n, np.int64), -np.ones(n, np.int64)])),
        }, schema=probe_schema)

    left = events.select_columns(
        ["event_id", "user_id", "ts"]).map_batches(
        probes, batch_format="pyarrow")
    att = asof_join(left, cum, key="user_id", ts="ats",
                    payload_cols=["cum_le"], left_schema=probe_schema,
                    right_schema=cum_schema)

    signed_schema = pa.schema([("event_id", pa.int64()),
                               ("user_id", pa.int64()),
                               ("ats", pa.int64()),
                               ("signed", pa.int64())])

    def signed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sign" not in t.column_names:
            return signed_schema.empty_table()
        cl = pc.fill_null(t["cum_le"], 0).to_numpy(zero_copy_only=False)
        sg = t["sign"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"], "ats": t["ats"],
                         "signed": pa.array(sg * cl)},
                        schema=signed_schema)

    g = sorted_group_agg(
        att.map_batches(signed, batch_format="pyarrow"),
        key="event_id",
        aggs={"user_id": "min", "ats": "max", "n_window": ("signed",
                                                           "sum")},
        num_blocks=num_partitions, schema=signed_schema)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return RANGE_COUNT_SCHEMA.empty_table()
        return pa.table({
            "event_id": t["event_id"],
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts": pc.cast(pc.cast(t["ats"], pa.int64()),
                          pa.timestamp("us")),
            "n_window": pc.cast(t["n_window"], pa.int64()),
        }, schema=RANGE_COUNT_SCHEMA)

    return g.map_batches(finish, batch_format="pyarrow")


TRANSITIONS_SCHEMA = pa.schema([
    ("prev_type", pa.string()), ("next_type", pa.string()),
    ("n", pa.int64()),
])


def event_transitions(events, *, num_partitions: int = 16):
    """First-order Markov transition counts over each user's event
    stream: how often ``prev_type -> next_type`` occurs across
    consecutive events of the same user in ``(ts, event_id)`` order —
    the session-flow / bot-pattern profile.

    One distributed LAG (``stages/agg.sorted_lag_attach``, single-row
    boundary carries) attaches the previous event type; each user's
    first event has a null predecessor and is excluded (matching the
    SQL ``WHERE prev IS NOT NULL``); per-batch (prev, next) partial
    counts then ride one tiny sorted sum — the shuffle carries at most
    ``|event types|**2`` rows per batch.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages._util import auto_blocks
    from smqtk_indexing_ray.stages.agg import (
        sorted_group_agg,
        sorted_lag_attach,
    )

    slim_schema = pa.schema([("user_id", pa.int64()),
                             ("ts_us", pa.int64()),
                             ("event_id", pa.int64()),
                             ("event_type", pa.string())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return slim_schema.empty_table()
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "event_type": pc.fill_null(t["event_type"], ""),
        }, schema=slim_schema)

    lagged = sorted_lag_attach(
        events.select_columns(
            ["user_id", "ts", "event_id", "event_type"]).map_batches(
            slim, batch_format="pyarrow"),
        key="user_id", order=["ts_us", "event_id"],
        value="event_type", out="prev_type",
        num_blocks=max(num_partitions, auto_blocks()),
        schema=slim_schema)

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "prev_type" not in t.column_names:
            return TRANSITIONS_SCHEMA.empty_table()
        keep = pc.is_valid(t["prev_type"])
        t = t.filter(keep)
        if t.num_rows == 0:
            return TRANSITIONS_SCHEMA.empty_table()
        # batch-local (prev, next) pre-count: the shuffle carries event-
        # type-squared partials, never events
        from smqtk_indexing_ray.functions.hashing import dict_codes
        p_vals, pcode = dict_codes(t["prev_type"].combine_chunks())
        n_vals, ncode = dict_codes(t["event_type"].combine_chunks())
        v = len(n_vals)
        uniq, cnts = np.unique(pcode * v + ncode, return_counts=True)
        return pa.table({
            "prev_type": p_vals.take(pa.array(uniq // v, pa.int64())),
            "next_type": n_vals.take(pa.array(uniq % v, pa.int64())),
            "n": pa.array(cnts.astype(np.int64)),
        }, schema=TRANSITIONS_SCHEMA)

    partial = lagged.map_batches(pairs, batch_format="pyarrow")
    g = sorted_group_agg(partial, key=["prev_type", "next_type"],
                         aggs={"n": "sum"}, schema=TRANSITIONS_SCHEMA)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "prev_type" not in t.column_names:
            return TRANSITIONS_SCHEMA.empty_table()
        return pa.table({
            "prev_type": t["prev_type"], "next_type": t["next_type"],
            "n": pc.cast(t["n"], pa.int64()),
        }, schema=TRANSITIONS_SCHEMA)

    return g.map_batches(finish, batch_format="pyarrow")


HOURLY_SCHEMA = pa.schema([
    ("hour", pa.int64()), ("event_type", pa.string()),
    ("n", pa.int64()), ("frac_of_type", pa.float64()),
])


def hourly_activity(events):
    """Hour-of-day seasonality profile per event type: counts per
    ``(hour 0-23, event_type)`` and each cell's share of its type's
    total — the traffic-shape table behind bot-burst and crawl-window
    diagnostics.

    Batch-local ``(hour, type)`` pre-counts (at most ``24 x |types|``
    partial rows per batch) into one tiny sorted sum; the per-type
    totals fold on the driver over the hours-x-types result (bounded by
    the key space, never events).  ``frac_of_type`` is an exact int64
    ratio.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    part_schema = pa.schema([("hour", pa.int64()),
                             ("event_type", pa.string()),
                             ("n", pa.int64())])

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        from smqtk_indexing_ray.functions.hashing import dict_codes
        hr = pc.hour(t["ts"].combine_chunks()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        e_vals, code = dict_codes(
            pc.fill_null(t["event_type"].combine_chunks(), ""))
        v = len(e_vals)
        uniq, cnts = np.unique(hr * v + code, return_counts=True)
        return pa.table({
            "hour": pa.array(uniq // v),
            "event_type": e_vals.take(pa.array(uniq % v, pa.int64())),
            "n": pa.array(cnts.astype(np.int64)),
        }, schema=part_schema)

    g = sorted_group_agg(
        events.select_columns(["ts", "event_type"]).map_batches(
            part, batch_format="pyarrow"),
        key=["hour", "event_type"], aggs={"n": "sum"},
        schema=part_schema).take_all()   # <= 24 x |types| rows
    if not g:
        return HOURLY_SCHEMA.empty_table()
    totals: dict[str, int] = {}
    for r in g:
        totals[r["event_type"]] = totals.get(r["event_type"], 0) \
            + int(r["n"])
    hours = np.array([int(r["hour"]) for r in g], np.int64)
    types = [r["event_type"] for r in g]
    n = np.array([int(r["n"]) for r in g], np.int64)
    tot = np.array([totals[ty] for ty in types], np.int64)
    return pa.table({
        "hour": pa.array(hours),
        "event_type": pa.array(types, pa.string()),
        "n": pa.array(n),
        "frac_of_type": pa.array(n.astype(np.float64)
                                 / tot.astype(np.float64)),
    }, schema=HOURLY_SCHEMA)


FUNNEL_LATENCY_SCHEMA = pa.schema([
    ("q", pa.float64()), ("latency_us", pa.int64()),
])


def funnel_latency(events, *, steps: tuple[str, ...] = ("view", "click",
                                                        "purchase"),
                   qs: tuple[float, ...] = (0.1, 0.5, 0.9, 0.99)):
    """Conversion-latency distribution: exact discrete quantiles of
    ``t_last - t_first`` over users who completed EVERY funnel step —
    how long the view→…→purchase journey takes (the product-health
    twin of the funnel's how-many).

    Pure composition: the distributed funnel state machine
    (:func:`funnel`) filtered to full conversions, then the exact
    quantile stage (``stages/quantiles.column_quantiles`` — narrow
    sort + metadata index resolution, quantile_disc-exact).  Returns
    an empty table when nobody converts (the oracle's empty result).
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.quantiles import column_quantiles

    full = len(steps)
    lat_schema = pa.schema([("latency_us", pa.int64())])

    def lat(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "steps_completed" not in t.column_names:
            return lat_schema.empty_table()
        t = t.filter(pc.equal(t["steps_completed"], full))
        if t.num_rows == 0:
            return lat_schema.empty_table()
        a = pc.cast(t["t_first_us"], pa.int64()).to_numpy(
            zero_copy_only=False)
        b = pc.cast(t["t_last_us"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"latency_us": pa.array(b - a)},
                        schema=lat_schema)

    lats = funnel(events, steps=steps).map_batches(
        lat, batch_format="pyarrow")
    try:
        out = column_quantiles(lats, "latency_us", list(qs))
    except ValueError:       # nobody converted
        return FUNNEL_LATENCY_SCHEMA.empty_table()
    return pa.table({
        "q": out["q"],
        "latency_us": pc.cast(out["latency_us"], pa.int64()),
    }, schema=FUNNEL_LATENCY_SCHEMA)


PEAK_RATE_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("peak_events", pa.int64()),
])


def peak_event_rate(events, *, window_minutes: int = 60,
                    num_partitions: int = 16):
    """Per-user burst ceiling: the MAX trailing-window event count any
    of the user's events sees — the rate-limit / bot-burst headline
    number (``max(count over RANGE window) per user``).

    Composition: the RANGE-window counts
    (:func:`trailing_event_counts`) reduced by one sorted grouped max
    over (user, n_window) — batch partials first, so the final sort
    sees users-not-events rows.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    part_schema = pa.schema([("user_id", pa.int64()),
                             ("peak_events", pa.int64())])

    def partial_max(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_window" not in t.column_names:
            return part_schema.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        nw = t["n_window"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(uid, return_inverse=True)
        mx = np.zeros(len(uniq), np.int64)
        np.maximum.at(mx, inv, nw)
        return pa.table({"user_id": pa.array(uniq.astype(np.int64)),
                         "peak_events": pa.array(mx)},
                        schema=part_schema)

    counts = trailing_event_counts(events,
                                   window_minutes=window_minutes,
                                   num_partitions=num_partitions)
    partial = counts.map_batches(partial_max, batch_format="pyarrow")
    g = sorted_group_agg(partial, key="user_id",
                         aggs={"peak_events": "max"},
                         schema=part_schema)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return PEAK_RATE_SCHEMA.empty_table()
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "peak_events": pc.cast(t["peak_events"], pa.int64()),
        }, schema=PEAK_RATE_SCHEMA)

    return g.map_batches(finish, batch_format="pyarrow")


USER_SESSION_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("n_sessions", pa.int64()),
    ("total_events", pa.int64()), ("events_per_session", pa.float64()),
    ("max_session_span_us", pa.int64()),
])


def user_session_stats(events, *, gap_minutes: int = 30,
                       num_partitions: int = 16):
    """Per-user session rollup: session count, total events, mean
    events per session (exact int ratio) and the longest session span —
    the engagement-shape table on top of :func:`sessionize`.

    One sorted grouped aggregation over the session table (one row per
    session, already tiny relative to events).
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages.agg import sorted_group_agg

    sess = sessionize(events, gap_minutes=gap_minutes,
                      num_partitions=num_partitions)
    span_schema = pa.schema([("user_id", pa.int64()),
                             ("n_events", pa.int64()),
                             ("span_us", pa.int64())])

    def spans(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return span_schema.empty_table()
        a = t["t_start_us"].to_numpy(zero_copy_only=False)
        b = t["t_end_us"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "span_us": pa.array((b - a).astype(np.int64)),
        }, schema=span_schema)

    g = sorted_group_agg(
        sess.map_batches(spans, batch_format="pyarrow"),
        key="user_id",
        aggs={"n_sessions": "count", "total_events": ("n_events",
                                                      "sum"),
              "max_session_span_us": ("span_us", "max")},
        num_blocks=num_partitions, schema=span_schema)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return USER_SESSION_SCHEMA.empty_table()
        ns = pc.cast(t["n_sessions"], pa.int64())
        te = pc.cast(t["total_events"], pa.int64())
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "n_sessions": ns,
            "total_events": te,
            "events_per_session": pa.array(
                te.to_numpy(zero_copy_only=False).astype(np.float64)
                / ns.to_numpy(zero_copy_only=False).astype(np.float64)),
            "max_session_span_us": pc.cast(t["max_session_span_us"],
                                           pa.int64()),
        }, schema=USER_SESSION_SCHEMA)

    return g.map_batches(finish, batch_format="pyarrow")


EVENT_DEDUP_SCHEMA = pa.schema([
    ("event_id", pa.int64()), ("user_id", pa.int64()),
    ("event_type", pa.string()), ("ts_us", pa.int64()),
    ("kept", pa.int64()),
])


def event_dedup(events, *, window_s: int = 300,
                num_partitions: int = 16):
    """Windowed event deduplication: an event is a duplicate when the
    SAME ``(user_id, event_type)`` fired within ``window_s`` seconds
    before it — the standard at-least-once-ingest repair pass
    (client retries, double-fired webhooks).

    LAG semantics (each event compares against its immediate
    predecessor, kept or not): the SQL-expressible form, one sorted
    pass through ``stages/agg.sorted_lag_attach`` with a single-row
    boundary carry per block.  Chained suppress-against-last-KEPT
    semantics would need a sequential per-partition scan — that
    variant is :func:`sessionize` with ``gap_s=window_s`` counting
    session heads.

    Output: every event with ``kept`` 0/1 — callers filter
    ``kept == 1`` for the deduplicated stream; keeping the flags makes
    the drop rate a one-aggregate audit.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    from smqtk_indexing_ray.stages._util import auto_blocks, stamp_schema
    from smqtk_indexing_ray.stages.agg import sorted_lag_attach

    slim_schema = pa.schema([("user_id", pa.int64()),
                             ("event_type", pa.string()),
                             ("ts_us", pa.int64()),
                             ("event_id", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return slim_schema.empty_table()
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": t["event_type"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64()),
        }, schema=slim_schema)

    lagged = sorted_lag_attach(
        events.select_columns(["user_id", "event_type", "ts",
                               "event_id"])
        .map_batches(slim, batch_format="pyarrow"),
        key=["user_id", "event_type"], order=["ts_us", "event_id"],
        value="ts_us", out="prev_ts_us",
        num_blocks=max(num_partitions, auto_blocks()),
        schema=slim_schema)

    window_us = int(window_s) * 1_000_000

    def flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "prev_ts_us" not in t.column_names:
            return EVENT_DEDUP_SCHEMA.empty_table()
        fresh = pc.or_kleene(
            pc.is_null(t["prev_ts_us"]),
            pc.greater(pc.subtract(t["ts_us"], t["prev_ts_us"]),
                       window_us))
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "ts_us": t["ts_us"],
            "kept": pc.cast(pc.fill_null(fresh, True), pa.int64()),
        }, schema=EVENT_DEDUP_SCHEMA)

    return stamp_schema(
        lagged.map_batches(flag, batch_format="pyarrow"),
        EVENT_DEDUP_SCHEMA)


PEAK_CONC_SCHEMA = pa.schema([
    ("peak_concurrency", pa.int64()), ("at_ts_us", pa.int64()),
    ("n_sessions", pa.int64()),
])


def peak_concurrency(events, *, gap_minutes: int = 30):
    """Global peak number of simultaneously-active sessions (and the
    first instant it is reached) — the sweep-line interval-overlap
    counter, the capacity-planning question a range self-join cannot
    answer at scale.

    Each session contributes a +start/+end boundary point; ends sort
    BEFORE starts at equal timestamps (a back-to-back handoff never
    overlaps, and a zero-length session never raises the peak — same
    convention as the SQL running-sum oracle).  Concurrency at a start
    row is ``starts_before + 1 - ends_before``, two passes of the
    distributed exclusive prefix sum (``stages/prefix.running_total``);
    the peak folds from per-block (max, argmin-ts) partials.  Only
    2 x n_sessions boundary rows ever sort — never an event row, never
    a range join.

    Output: one row — ``peak_concurrency, at_ts_us, n_sessions``
    (zeros/-1 on an empty corpus).
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    import ray.data as rd

    from smqtk_indexing_ray.stages.prefix import running_total

    pts_schema = pa.schema([("ts_us", pa.int64()), ("kind", pa.int64()),
                            ("sk", pa.int64()), ("s_one", pa.int64()),
                            ("e_one", pa.int64())])

    def pts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "session_key" not in t.column_names:
            return pts_schema.empty_table()
        n = t.num_rows
        sk = t["session_key"].to_numpy(zero_copy_only=False)
        st = t["t_start_us"].to_numpy(zero_copy_only=False)
        en = t["t_end_us"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ts_us": pa.array(np.concatenate([st, en]).astype(np.int64)),
            "kind": pa.array(np.concatenate(
                [np.ones(n, np.int64), np.zeros(n, np.int64)])),
            "sk": pa.array(np.concatenate([sk, sk]).astype(np.int64)),
            "s_one": pa.array(np.concatenate(
                [np.ones(n, np.int64), np.zeros(n, np.int64)])),
            "e_one": pa.array(np.concatenate(
                [np.zeros(n, np.int64), np.ones(n, np.int64)])),
        }, schema=pts_schema)

    sess = sessionize(events, gap_minutes=gap_minutes)
    boundary = sess.map_batches(pts, batch_format="pyarrow")

    order = ["ts_us", "kind", "sk"]
    rt = running_total(boundary, order=order, value="s_one",
                       out="bs", schema=pts_schema)
    rt = running_total(
        rt, order=order, value="e_one", out="be",
        schema=pts_schema.append(pa.field("bs", pa.int64())))

    part_schema = pa.schema([("peak", pa.int64()), ("at_ts", pa.int64()),
                             ("n_start", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "bs" not in t.column_names:
            return part_schema.empty_table()
        start = t["kind"].to_numpy(zero_copy_only=False) == 1
        n_start = int(start.sum())
        if not n_start:
            return pa.table({"peak": pa.array([0], pa.int64()),
                             "at_ts": pa.array([-1], pa.int64()),
                             "n_start": pa.array([0], pa.int64())},
                            schema=part_schema)
        conc = (t["bs"].to_numpy(zero_copy_only=False)[start] + 1
                - t["be"].to_numpy(zero_copy_only=False)[start])
        ts = t["ts_us"].to_numpy(zero_copy_only=False)[start]
        peak = int(conc.max())
        at = int(ts[conc == peak].min())
        return pa.table({"peak": pa.array([peak], pa.int64()),
                         "at_ts": pa.array([at], pa.int64()),
                         "n_start": pa.array([n_start], pa.int64())},
                        schema=part_schema)

    parts = rt.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return rd.from_arrow(pa.table({
            "peak_concurrency": pa.array([0], pa.int64()),
            "at_ts_us": pa.array([-1], pa.int64()),
            "n_sessions": pa.array([0], pa.int64()),
        }, schema=PEAK_CONC_SCHEMA))
    peak = max(int(r["peak"]) for r in parts)
    n_sessions = sum(int(r["n_start"]) for r in parts)
    ats = [int(r["at_ts"]) for r in parts if int(r["peak"]) == peak
           and int(r["at_ts"]) >= 0]
    at = min(ats) if ats else -1
    return rd.from_arrow(pa.table({
        "peak_concurrency": pa.array([peak], pa.int64()),
        "at_ts_us": pa.array([at], pa.int64()),
        "n_sessions": pa.array([n_sessions], pa.int64()),
    }, schema=PEAK_CONC_SCHEMA))
