"""Randomized brute-force equivalence for the operators with the
trickiest inner kernels (coverage unions, greedy chains): hypothesis
drives small random inputs through the REAL Ray operators and a
pure-Python gold implementation. Few examples (Ray round-trips are
~seconds) — the value is hitting boundary shapes fixtures miss."""

import datetime as dt

import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

token = st.sampled_from(list("abcd"))  # tiny alphabet -> forced dups
doc = st.lists(token, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus, st.integers(2, 3))
def test_dup_ngram_random_matches_brute(texts, w):
    from collections import Counter

    from blurrily_ray.stages.dedup import dup_ngram_stats

    rows = [{"doc_id": i + 1, "text": t} for i, t in enumerate(texts)]
    cnt = Counter()
    wins = {}
    for r in rows:
        toks = r["text"].split(" ")
        ws = [tuple(toks[p:p + w]) for p in range(len(toks) - w + 1)]
        wins[r["doc_id"]] = ws
        cnt.update(ws)
    expect = {}
    for r in rows:
        toks = r["text"].split(" ")
        dup_pos = [p for p, s in enumerate(wins[r["doc_id"]])
                   if cnt[s] >= 2]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + w))
        expect[r["doc_id"]] = (len(toks), max(len(toks) - w + 1, 0),
                               len(dup_pos), len(covered))

    got = {r["doc_id"]: (r["n_tokens"], r["n_windows"],
                         r["n_dup_windows"], r["n_dup_tokens"])
           for r in dup_ngram_stats(ray.data.from_items(rows),
                                    window=w).take_all()}
    assert got == expect


event = st.tuples(st.integers(1, 4),                     # user
                  st.sampled_from(["view", "click", "purchase", "other"]),
                  st.integers(0, 20))                    # second offset


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(event, min_size=1, max_size=25))
def test_funnel_random_matches_brute(events):
    from blurrily_ray.stages.windows import funnel

    t0 = dt.datetime(2026, 1, 1)
    rows = [{"user_id": u, "event_type": ty,
             "ts": t0 + dt.timedelta(seconds=s)} for u, ty, s in events]

    stages = ["view", "click", "purchase"]
    expect = {}
    for u in {u for u, _, _ in events}:
        evs = sorted((s, ty) for uu, ty, s in events if uu == u)
        t1 = min((s for s, ty in evs if ty == stages[0]), default=None)
        if t1 is None:
            continue
        depth, prev, last = 1, t1, t1
        for stage in stages[1:]:
            nxt = min((s for s, ty in evs if ty == stage and s > prev),
                      default=None)
            if nxt is None:
                break
            depth, prev, last = depth + 1, nxt, nxt
        us = lambda sec: int((t0 + dt.timedelta(seconds=sec)
                              - dt.datetime(1970, 1, 1)).total_seconds()
                             * 1e6)
        expect[u] = (depth, us(t1), us(last))

    got = {r["user_id"]: (r["depth"], r["t1_us"], r["t_last_us"])
           for r in funnel(ray.data.from_items(rows)).take_all()}
    assert got == expect
