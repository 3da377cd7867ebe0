"""Temporal join + window operators (stages/joins.py, windows.window_agg).

Brute-force pandas references on seeded random inputs; edge cases pin the
bucket-replication invariant (each qualifying pair counted exactly once)
and as-of tie-breaking.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from blurrily_ray.stages.joins import asof_join, range_join_count
from blurrily_ray.stages.windows import window_agg


def _events(n=400, users=7, span_us=10_000_000, seed=1):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts_us": rng.integers(0, span_us, n).astype(np.int64),
    })


def test_asof_join_matches_bruteforce():
    left = _events(seed=2)
    right = _events(seed=3).rename(columns={
        "event_id": "r_id", "user_id": "r_user", "ts_us": "r_ts"})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    by="user_id", on="ts_us", right_by="r_user",
                    right_on="r_ts", n_parts=5).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    exp_rows = []
    for _, lr in left.iterrows():
        cand = right[(right.r_user == lr.user_id) & (right.r_ts <= lr.ts_us)]
        if len(cand):
            best = cand.sort_values(["r_ts", "r_id"]).iloc[-1]
            exp_rows.append((lr.event_id, best.r_id, best.r_ts))
        else:
            exp_rows.append((lr.event_id, None, None))
    exp = pd.DataFrame(exp_rows, columns=["event_id", "r_id", "r_ts"]) \
        .sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(left)
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    for c in ("r_id", "r_ts"):
        a = got[c].astype("float64").to_numpy()
        b = exp[c].astype("float64").to_numpy()
        assert np.array_equal(a, b, equal_nan=True)


def test_asof_join_tiebreak_and_dtypes():
    left = pd.DataFrame({"event_id": np.array([1], dtype=np.int64),
                         "user_id": np.array([5], dtype=np.int64),
                         "ts_us": np.array([100], dtype=np.int64)})
    right = pd.DataFrame({  # two right rows at the SAME ts: larger id wins
        "r_id": np.array([10, 11, 12], dtype=np.int64),
        "r_user": np.array([5, 5, 5], dtype=np.int64),
        "r_ts": np.array([100, 100, 101], dtype=np.int64)})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    by="user_id", on="ts_us", right_by="r_user",
                    right_on="r_ts").to_pandas()
    assert got.loc[0, "r_id"] == 11  # ts=101 excluded, tie → max id
    assert got["event_id"].dtype == np.int64  # no float widening


def test_range_join_count_matches_bruteforce():
    ev = _events(n=500, users=5, span_us=3_000_000, seed=4)
    lo, hi = 0, 250_000
    ds = rd.from_pandas(ev)
    got = range_join_count(ds, ds, id_col="event_id", on="ts_us",
                           lo=lo, hi=hi, by="user_id", out_col="n",
                           n_parts=7).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    exp = []
    for _, e in ev.iterrows():
        m = ev[(ev.user_id == e.user_id) & (ev.ts_us > e.ts_us + lo)
               & (ev.ts_us <= e.ts_us + hi)]
        exp.append(len(m))
    assert len(got) == len(ev)
    assert got["n"].tolist() == exp


def test_range_join_bucket_boundary_counts_once():
    # right row exactly on a bucket edge; left window straddles the edge —
    # the pair must count exactly once even when both replicas see it
    B = 100
    left = pd.DataFrame({"event_id": np.array([1], dtype=np.int64),
                         "ts_us": np.array([95], dtype=np.int64)})
    right = pd.DataFrame({"r_ts": np.array([100, 195, 196], dtype=np.int64)})
    got = range_join_count(rd.from_pandas(left), rd.from_pandas(right),
                           id_col="event_id", on="ts_us", right_on="r_ts",
                           lo=0, hi=B, n_parts=3).to_pandas()
    # window (95, 195]: r_ts 100 and 195 qualify, 196 does not
    assert got["n_in_range"].tolist() == [2]


def test_range_join_rejects_empty_window():
    ds = rd.from_pandas(_events(n=10))
    with pytest.raises(ValueError):
        range_join_count(ds, ds, id_col="event_id", on="ts_us", lo=5, hi=5)


def test_window_agg_matches_bruteforce():
    rng = np.random.default_rng(7)
    n = 1000
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            rng.integers(0, 4 * 3600_000_000, n), unit="us"),
        "event_type": rng.choice(["a", "b"], n),
        "user_id": rng.integers(0, 9, n).astype(np.int64),
        "value": rng.normal(0, 10, n)})
    got = window_agg(rd.from_pandas(df), window_minutes=60, n_parts=5) \
        .to_pandas().sort_values(["window_start_us", "event_type"]) \
        .reset_index(drop=True)
    us = df["ts"].astype("datetime64[us]").astype(np.int64)
    w = (us // 3600_000_000) * 3600_000_000
    ref = (pd.DataFrame({
        "window_start_us": w, "event_type": df.event_type,
        "user_id": df.user_id,
        "vm": np.floor(df.value.to_numpy() * 1e6).astype(np.int64)})
        .groupby(["window_start_us", "event_type"])
        .agg(n_events=("vm", "size"), n_users=("user_id", "nunique"),
             sum_value_micro=("vm", "sum")).reset_index())
    pd.testing.assert_frame_equal(got, ref.astype(got.dtypes.to_dict()))


def test_asof_join_empty_side_partitions():
    # left-only and right-only keys land in partitions where one side is
    # empty; dtypes must stay stable and unmatched rows null
    left = pd.DataFrame({"event_id": np.arange(4, dtype=np.int64),
                         "user_id": np.array([1, 1, 3, 3], dtype=np.int64),
                         "ts_us": np.array([10, 20, 10, 20], dtype=np.int64)})
    right = pd.DataFrame({"r_id": np.array([7, 8], dtype=np.int64),
                          "r_user": np.array([3, 3], dtype=np.int64),
                          "r_ts": np.array([5, 15], dtype=np.int64)})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    by="user_id", on="ts_us", right_by="r_user",
                    right_on="r_ts", n_parts=37).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == [0, 1, 2, 3]
    assert got["r_id"].isna().tolist() == [True, True, False, False]
    assert got.loc[2, "r_id"] == 7 and got.loc[3, "r_id"] == 8


def test_empty_inputs_are_total():
    # transformed-to-empty datasets lose their schema in Ray; the join
    # operators must stay total instead of crashing on schema() == None
    empty = rd.from_pandas(pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "ts_us": pd.Series([], dtype="int64")})) \
        .map_batches(lambda b: b, batch_format="pyarrow")
    full = rd.from_pandas(_events(n=20))
    assert asof_join(empty, full, by="user_id", on="ts_us").count() == 0
    assert asof_join(full, empty, by="user_id", on="ts_us").count() == 20
    assert range_join_count(empty, full, id_col="event_id", on="ts_us",
                            lo=0, hi=100).count() == 0
    got = range_join_count(full, empty, id_col="event_id", on="ts_us",
                           lo=0, hi=100).to_pandas()
    assert len(got) == 20 and (got["n_in_range"] == 0).all()


def test_range_join_negative_lo_symmetric_window():
    # lo < 0: neighbors BEFORE the row count too (window straddles it)
    ev = _events(n=300, users=4, span_us=1_000_000, seed=9)
    ds = rd.from_pandas(ev)
    lo, hi = -50_000, 50_000
    got = range_join_count(ds, ds, id_col="event_id", on="ts_us",
                           lo=lo, hi=hi, by="user_id", out_col="n",
                           n_parts=6).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    exp = []
    for _, e in ev.iterrows():
        m = ev[(ev.user_id == e.user_id) & (ev.ts_us > e.ts_us + lo)
               & (ev.ts_us <= e.ts_us + hi)]
        exp.append(len(m))
    assert got["n"].tolist() == exp


def test_top_k_per_group_matches_bruteforce():
    from blurrily_ray.stages.windows import top_k_per_group

    rng = np.random.default_rng(12)
    df = pd.DataFrame({
        "event_id": np.arange(200, dtype=np.int64),
        "user_id": rng.integers(0, 9, 200).astype(np.int64),
        "value": rng.integers(0, 5, 200).astype(np.int64)})  # many ties
    got = top_k_per_group(rd.from_pandas(df), by="user_id",
                          order_col="value", k=3,
                          tiebreak_col="event_id", n_parts=4).to_pandas()
    got = got.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    exp = (df.sort_values(["user_id", "value", "event_id"], kind="stable",
                          ascending=[True, False, True])
           .groupby("user_id", sort=False).head(3)
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_hopping_window_degenerates_to_tumbling():
    """hop == window makes every hopping window a tumbling window — the
    two operators must agree exactly; with hop = window/2 every event
    lands in exactly 2 windows, so n_events doubles."""
    from blurrily_ray.stages.windows import hopping_window_agg

    rng = np.random.RandomState(5)
    ev = rd.from_items([
        {"ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=int(m)),
         "event_type": ["click", "buy"][i % 2], "user_id": int(i % 7),
         "value": float(rng.rand() * 10)}
        for i, m in enumerate(rng.randint(0, 600, 300))])
    tumb = window_agg(ev, window_minutes=60).to_pandas()
    hop_eq = hopping_window_agg(ev, window_minutes=60,
                                hop_minutes=60).to_pandas()
    key = ["window_start_us", "event_type"]
    assert tumb.sort_values(key).reset_index(drop=True).equals(
        hop_eq.sort_values(key).reset_index(drop=True))
    hop2 = hopping_window_agg(ev, window_minutes=60,
                              hop_minutes=30).to_pandas()
    assert hop2["n_events"].sum() == 2 * tumb["n_events"].sum()
    with pytest.raises(ValueError):
        hopping_window_agg(ev, window_minutes=60, hop_minutes=25)
