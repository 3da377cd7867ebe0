"""Windowed / sessionized aggregates over event streams.

The reference has no streaming constructs (SURVEY.md §2.4); this is a
graft-added operator a training-data pipeline needs (per-user activity
sessionization for behavioral filtering). One groupby(user) shuffle;
per-group work is a sort of that user's events.
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

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable")
        us = df[ts_col].astype("datetime64[us]").astype(np.int64)
        new_session = np.ones(len(us), dtype=bool)
        new_session[1:] = np.diff(us) > gap_us
        sid = np.cumsum(new_session)
        g = pd.DataFrame({"sid": sid, "us": us}).groupby("sid")["us"]
        return pd.DataFrame({
            "user_id": df[user_col].iloc[0],
            "session_idx": g.min().index.to_numpy(dtype=np.int64),
            "n_events": g.size().to_numpy(dtype=np.int64),
            "start_us": g.min().to_numpy(dtype=np.int64),
            "end_us": g.max().to_numpy(dtype=np.int64),
        })

    return events.select_columns([user_col, ts_col]) \
        .groupby(user_col).map_groups(per_user, batch_format="pandas")
