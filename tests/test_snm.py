"""Sorted-neighborhood blocking (stages/snm.py).

The distributed shape (range-prefix partitions + in-partition windows +
driver boundary reconciliation) must emit EXACTLY the single-machine
definition: all pairs within `window` consecutive positions of the
(normalized-text, ref) sort order, each exactly once.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from blurrily_ray.stages.editdist import normalized_texts
from blurrily_ray.stages.snm import snm_pairs


def brute_snm(docs_rows, window):
    """Reference: sort by (normalized text, ref), all pairs dist < w."""
    ds = ray.data.from_items(docs_rows)
    nt = {r["ref"]: r["_nt"] for r in normalized_texts(ds).take_all()}
    order = sorted(nt, key=lambda r: (nt[r], r))
    out = set()
    for i in range(len(order)):
        for d in range(1, window):
            if i + d < len(order):
                out.add((order[i], order[i + d], d))
    return out


ROWS = [
    {"doc_id": i, "text": t}
    for i, t in enumerate([
        "alpha beta gamma", "alpha beta gamme", "alpha beta",
        "zeta omega", "zeta omegas", "mid range value", "mid range",
        "alpha", "", "zz top", "aardvark", "aardvarks", "binary tree",
        "binary trees", "car", "cart", "carts", "dog", "dogs", "dot",
    ])
]


@pytest.mark.parametrize("window", [2, 3, 5])
def test_snm_matches_brute(window):
    got = snm_pairs(ray.data.from_items(ROWS), window=window).to_pandas()
    got_set = set(zip(got["a"], got["b"], got["rank_dist"]))
    assert len(got_set) == len(got), "duplicate pair emitted"
    assert got_set == brute_snm(ROWS, window)


def test_snm_partitioning_invariant():
    """The emitted pair set must not depend on the partition layout —
    prefix length (range granularity) or hash fan-out."""
    base = None
    for prefix_len, n_parts in [(1, 2), (2, 64), (3, 8)]:
        got = snm_pairs(ray.data.from_items(ROWS), window=4,
                        prefix_len=prefix_len, n_parts=n_parts).to_pandas()
        key = ["a", "b", "rank_dist"]
        got = got[key].sort_values(key).reset_index(drop=True)
        if base is None:
            base = got
        else:
            pd.testing.assert_frame_equal(base, got)


def test_snm_window_validation():
    with pytest.raises(ValueError):
        snm_pairs(ray.data.from_items(ROWS), window=1)


def test_snm_multi_union_semantics():
    """Multi-pass union: canonical orientation, passes = membership
    count across the forward and reversed windows (brute-checked)."""
    from blurrily_ray.stages.snm import snm_pairs_multi

    def brute_multi(rows, window):
        ds = ray.data.from_items(rows)
        nt = {r["ref"]: r["_nt"] for r in normalized_texts(ds).take_all()}
        out = {}
        for keyf in (lambda r: (nt[r], r), lambda r: (nt[r][::-1], r)):
            order = sorted(nt, key=keyf)
            for i in range(len(order)):
                for d in range(1, window):
                    if i + d < len(order):
                        p = tuple(sorted((order[i], order[i + d])))
                        out[p] = out.get(p, 0) + 1
        return out

    got = snm_pairs_multi(ray.data.from_items(ROWS), window=3).to_pandas()
    got_map = {(a, b): p for a, b, p in zip(got["a"], got["b"],
                                            got["passes"])}
    assert got_map == brute_multi(ROWS, 3)
    assert set(got["passes"]) <= {1, 2}
    assert (got["a"] < got["b"]).all()


def test_snm_cross_partition_pairs_present():
    """Adjacent sort neighbors landing in different prefix partitions
    (first letters differ) must still pair — the boundary path."""
    rows = [{"doc_id": 1, "text": "aa"}, {"doc_id": 2, "text": "bb"},
            {"doc_id": 3, "text": "cc"}, {"doc_id": 4, "text": "dd"}]
    got = snm_pairs(ray.data.from_items(rows), window=2,
                    prefix_len=2).to_pandas()
    assert set(zip(got["a"], got["b"])) == {(1, 2), (2, 3), (3, 4)}
    assert (got["rank_dist"] == 1).all()
