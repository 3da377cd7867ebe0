"""Windowed / sessionized aggregates over event streams.

The reference has no streaming constructs (SURVEY.md §2.4); this is a
graft-added operator a training-data pipeline needs (per-user activity
sessionization for behavioral filtering). One coarse hash-partitioned
shuffle (stages/common.partitioned_map — NOT a per-user map_groups, whose
~35 ms/group invocation overhead dominates at millions of users); each
partition sessionizes ALL of its users in one vectorized pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize(events, gap_minutes: int = 30, *, user_col: str = "user_id",
               ts_col: str = "ts"):
    """events → (user_id, session_idx, n_events, start_us, end_us).

    A session breaks when the gap to the previous event exceeds
    ``gap_minutes``. session_idx is 1-based per user in time order;
    timestamps are epoch microseconds (int64 — oracle-hashable).
    """
    gap_us = gap_minutes * 60_000_000

    def all_users(df: pd.DataFrame) -> pd.DataFrame:
        """Sessionize every user of the partition in one vectorized pass:
        sort by (user, ts); a session starts at each user change or gap
        breach; session stats come from reduceat over run boundaries."""
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=df[user_col].dtype),
                "session_idx": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "start_us": pd.Series([], dtype="int64"),
                "end_us": pd.Series([], dtype="int64")})
        df = df.sort_values([user_col, ts_col], kind="stable")
        users = df[user_col].to_numpy()
        us = df[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        new_sess = np.ones(len(df), dtype=bool)
        new_sess[1:] = (users[1:] != users[:-1]) | (np.diff(us) > gap_us)
        starts = np.nonzero(new_sess)[0]
        ends = np.concatenate((starts[1:], [len(df)]))
        # per-user 1-based session index: global cumsum minus the value at
        # each user's first session
        gsid = np.cumsum(new_sess)
        user_first = np.ones(len(df), dtype=bool)
        user_first[1:] = users[1:] != users[:-1]
        base = np.repeat(gsid[user_first], np.diff(
            np.concatenate((np.nonzero(user_first)[0], [len(df)]))))
        sidx = (gsid - base + 1)[starts]
        return pd.DataFrame({
            "user_id": users[starts],
            "session_idx": sidx.astype(np.int64),
            "n_events": (ends - starts).astype(np.int64),
            "start_us": us[starts],
            "end_us": us[ends - 1],  # ts-sorted within session
        })

    from blurrily_ray.stages.common import partitioned_map

    return partitioned_map(events.select_columns([user_col, ts_col]),
                           [user_col], all_users)


def window_agg(events, *, window_minutes: int = 60, ts_col: str = "ts",
               type_col: str = "event_type", user_col: str = "user_id",
               value_col: str = "value", n_parts: int = 64):
    """Tumbling-window aggregate: (window_start_us, event_type) →
    n_events, n_users (exact distinct), sum_value_micro.

    Map-side combiner first collapses each batch to (window, type, user)
    partials — the shuffle then moves at most one row per distinct
    (window, type, user) per block instead of one per event, and the
    final per-partition pass is a small vectorized groupby. ``value`` is
    summed in integer MICRO-units (floor(value·1e6)) so the result is
    order-independent and exact — a float sum would hash differently per
    partitioning (and per cluster size).
    """
    from blurrily_ray.stages.common import partitioned_map

    window_us = np.int64(window_minutes) * 60_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].astype("datetime64[us]").astype(np.int64)
        w = (us // window_us) * window_us
        v = df[value_col].to_numpy(dtype=np.float64)
        # NULL values contribute 0 to the sum — same as SQL SUM's skip
        vm = np.floor(np.nan_to_num(v, nan=0.0) * 1e6).astype(np.int64)
        g = (pd.DataFrame({"window_start_us": w.to_numpy(),
                           type_col: df[type_col].to_numpy(),
                           user_col: df[user_col].to_numpy(), "_vm": vm})
             .groupby(["window_start_us", type_col, user_col], sort=False)
             .agg(_n=("_vm", "size"), _vm=("_vm", "sum")).reset_index())
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["window_start_us", type_col], sort=False)
             .agg(n_events=("_n", "sum"), n_users=(user_col, "nunique"),
                  sum_value_micro=("_vm", "sum")).reset_index())
        for c in ("n_events", "n_users", "sum_value_micro"):
            g[c] = g[c].astype(np.int64)
        return g

    partials = events.select_columns(
        [ts_col, type_col, user_col, value_col]).map_batches(
        partial, batch_format="pandas")
    return partitioned_map(partials, ["window_start_us", type_col], final,
                           n_parts=n_parts)


def hopping_window_agg(events, *, window_minutes: int = 60,
                       hop_minutes: int = 15, ts_col: str = "ts",
                       type_col: str = "event_type",
                       user_col: str = "user_id",
                       value_col: str = "value", n_parts: int = 64):
    """Hopping (sliding) window aggregate: overlapping windows of
    ``window_minutes`` starting every ``hop_minutes`` (must divide it) →
    (window_start_us, event_type) × (n_events, exact n_users,
    sum_value_micro).

    Each event belongs to exactly ``window/hop`` windows; the map side
    replicates it that many times (an EXPLICIT, bounded blow-up — the
    streaming alternative needs ordered state; replication + the tumbling
    combiner is the shuffle-minimal batch form) and then collapses to
    (window, type, user) partials exactly like :func:`window_agg`, so the
    exchange still moves at most one row per distinct partial per block.
    Window starts are the multiples of hop covering each event, including
    windows that extend before the first event (both engines compute the
    same set, so the oracle matches)."""
    if window_minutes % hop_minutes:
        raise ValueError("hop_minutes must divide window_minutes "
                         f"({hop_minutes} vs {window_minutes})")
    from blurrily_ray.stages.common import partitioned_map

    hop_us = np.int64(hop_minutes) * 60_000_000
    ratio = window_minutes // hop_minutes
    offs = (np.arange(ratio, dtype=np.int64) * hop_us)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        last = (us // hop_us) * hop_us  # latest window containing the event
        w = (last[:, None] - offs[None, :]).reshape(-1)
        v = df[value_col].to_numpy(dtype=np.float64)
        vm = np.floor(np.nan_to_num(v, nan=0.0) * 1e6).astype(np.int64)
        g = (pd.DataFrame({
                "window_start_us": w,
                type_col: np.repeat(df[type_col].to_numpy(), ratio),
                user_col: np.repeat(df[user_col].to_numpy(), ratio),
                "_vm": np.repeat(vm, ratio)})
             .groupby(["window_start_us", type_col, user_col], sort=False)
             .agg(_n=("_vm", "size"), _vm=("_vm", "sum")).reset_index())
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["window_start_us", type_col], sort=False)
             .agg(n_events=("_n", "sum"), n_users=(user_col, "nunique"),
                  sum_value_micro=("_vm", "sum")).reset_index())
        for c in ("n_events", "n_users", "sum_value_micro"):
            g[c] = g[c].astype(np.int64)
        return g

    partials = events.select_columns(
        [ts_col, type_col, user_col, value_col]).map_batches(
        partial, batch_format="pandas")
    return partitioned_map(partials, ["window_start_us", type_col], final,
                           n_parts=n_parts)


def top_k_per_group(ds, *, by: str, order_col: str, k: int,
                    descending: bool = True, tiebreak_col: str | None = None,
                    n_parts: int = 64):
    """Keep each key's top-``k`` rows by ``order_col`` — the keep-best-k
    curation primitive (best documents per domain, latest events per
    user). One coarse hash shuffle on ``by``; every partition ranks ALL
    its keys in one vectorized sort + groupby-head (never per-key UDFs).

    ``tiebreak_col`` (ascending) makes equal ``order_col`` rows rank
    deterministically — required for oracle parity; defaults to the
    first non-``by``, non-``order_col`` column.
    """
    from blurrily_ray.stages.common import partitioned_map

    names = ds.schema().names
    tb = tiebreak_col or next(c for c in names
                              if c not in (by, order_col))

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([by, order_col, tb], kind="stable",
                            ascending=[True, not descending, True])
        return df.groupby(by, sort=False).head(k).reset_index(drop=True)

    return partitioned_map(ds, [by], head_k, n_parts=n_parts)


def funnel(events, stages=("view", "click", "purchase"), *,
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type"):
    """Per-user ordered-sequence funnel (conversion analysis): depth =
    how far the user got through ``stages`` via the greedy earliest
    chain t1 < t2 < ... — t_i is the MIN timestamp of a stage-i event
    STRICTLY after t_{i-1}, the standard funnel semantics. Users with no
    stage-1 event emit nothing. Returns
    (user_id, depth, t1_us, t_last_us) with epoch-µs int64 times.

    Scale shape: ONE user_id-keyed shuffle of the pruned
    (user, type, ts) columns; each partition resolves every stage for
    ALL its users with one ``pd.merge_asof`` per stage (vectorized
    forward search, no per-user loop)."""
    from blurrily_ray.stages.common import partitioned_map

    stages = list(stages)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            user_col: pd.Series([], dtype=np.int64),
            "depth": pd.Series([], dtype=np.int64),
            "t1_us": pd.Series([], dtype=np.int64),
            "t_last_us": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        us = df[ts_col].astype("datetime64[us]").astype(np.int64)
        e = pd.DataFrame({user_col: df[user_col].to_numpy(np.int64),
                          "type": df[type_col].to_numpy(),
                          "us": us.to_numpy()})
        cur = e[e["type"] == stages[0]].groupby(user_col, as_index=False)[
            "us"].min().rename(columns={"us": "t"})
        if not len(cur):
            return empty
        depth = np.ones(len(cur), dtype=np.int64)
        t1 = cur["t"].to_numpy().copy()
        t_last = cur["t"].to_numpy().copy()
        users = cur[user_col].to_numpy()
        # active = users still advancing; one forward merge_asof per stage
        active = pd.DataFrame({user_col: users, "t": t_last})
        alive_idx = np.arange(len(cur))
        for s in stages[1:]:
            sub = e[e["type"] == s].sort_values("us", kind="stable")
            if not len(sub) or not len(active):
                break
            nxt = pd.merge_asof(
                active.sort_values("t", kind="stable"), sub,
                left_on="t", right_on="us", by=user_col,
                direction="forward", allow_exact_matches=False)
            nxt = nxt.sort_values(user_col, kind="stable")
            act_sorted = np.argsort(active[user_col].to_numpy(),
                                    kind="stable")
            hit = nxt["us"].notna().to_numpy()
            hit_users = nxt.loc[hit, user_col].to_numpy()
            hit_ts = nxt.loc[hit, "us"].to_numpy().astype(np.int64)
            # map back to the row index in the output arrays
            pos = alive_idx[act_sorted][hit]
            depth[pos] += 1
            t_last[pos] = hit_ts
            alive_idx = pos
            active = pd.DataFrame({user_col: hit_users, "t": hit_ts})
        return pd.DataFrame({
            user_col: users, "depth": depth,
            "t1_us": t1, "t_last_us": t_last})

    pruned = events.select_columns([user_col, type_col, ts_col])
    return partitioned_map(pruned, [user_col], per_part)
