"""Rarity-weighted trigram Jaccard (stages/wjaccard.py)."""

import numpy as np
import pandas as pd

from blurrily_ray.functions.normalize import normalize_string
from blurrily_ray.functions.trigram import tokenize
from blurrily_ray.stages.wjaccard import (
    MICRO,
    rarity_weights,
    wjac_pairs,
    wjac_verify_edges,
)

ROWS = [
    {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
    {"doc_id": 2, "text": "the quick brown fox jumps over the lazy cat"},
    {"doc_id": 3, "text": "The QUICK brown fox jumped over a lazy dog!"},
    {"doc_id": 4, "text": "completely unrelated payload about parquet"},
    {"doc_id": 5, "text": "another unrelated string with zero overlap"},
]


def _sets():
    return {r["doc_id"]: np.unique(tokenize(normalize_string(r["text"])))
            for r in ROWS}


def _brute(min_micro):
    """Independent in-Python recomputation of the full operator."""
    sets = _sets()
    df = {}
    for tris in sets.values():
        for t in tris:
            df[t] = df.get(t, 0) + 1
    n = sum(1 for tris in sets.values() if len(tris))
    w = {t: (n * MICRO) // c for t, c in df.items()}

    def side(tris):
        return sum(w[t] for t in tris)

    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sh = sum(w[t] for t in np.intersect1d(sets[a], sets[b],
                                                  assume_unique=True))
            den = side(sets[a]) + side(sets[b]) - sh
            if den > 0:
                m = (sh * MICRO) // den
                if m >= min_micro:
                    out[(a, b)] = m
    return out


def test_wjac_pairs_matches_brute():
    import ray.data

    got = wjac_pairs(ray.data.from_items(ROWS), min_micro=1).to_pandas()
    gotm = {(min(a, b), max(a, b)): m
            for a, b, m in zip(got["a"], got["b"], got["wjac_micro"])}
    brute = _brute(1)
    # every engine pair must carry the brute-exact score; the engine may
    # emit FEWER pairs than all-pairs brute (blocking + edge threshold)
    for k, m in gotm.items():
        assert brute[k] == m
    # the near-identical pairs must survive blocking and rank on top
    assert (1, 2) in gotm and (1, 3) in gotm
    assert gotm[(1, 2)] > 600_000
    # weighted score separates rare-overlap from common-overlap: the
    # (1,2)/(1,3) clones outscore anything touching docs 4/5
    others = [m for (a, b), m in gotm.items() if {a, b} & {4, 5}]
    assert all(m < gotm[(1, 2)] for m in others)


def test_wjac_threshold_filters():
    import ray.data

    lo = wjac_pairs(ray.data.from_items(ROWS), min_micro=1).to_pandas()
    hi = wjac_pairs(ray.data.from_items(ROWS),
                    min_micro=650_000).to_pandas()
    assert len(hi) < len(lo)
    assert (hi["wjac_micro"] >= 650_000).all()


def test_wjac_broadcast_join_pinned_equal():
    import ray.data

    from blurrily_ray.stages.editdist import PAIR_MODE
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           docsets_bitsets_ref,
                                           score_pairs_fused,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docs = ray.data.from_items(ROWS)
    docsets = docsets_from_docs(docs, ref_col="doc_id",
                                text_col="text").materialize()
    hist = trigram_histogram(docsets)
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, hist, PAIR_MODE, lut_ref=lut_ref)
    pairs, _ = candidate_pairs_fused_blocking(keys, PAIR_MODE, int_refs=True)
    edges = score_pairs_fused(pairs, cfg=PAIR_MODE, lut_ref=lut_ref,
                              surrogate=True, packed=True).materialize()
    w = rarity_weights(hist, len(ROWS))
    key = ["a", "b", "matches", "wjac_micro"]

    def run(mode):
        df = wjac_verify_edges(edges, docsets, w, min_micro=1,
                               mode=mode).to_pandas()
        return df[key].sort_values(key).reset_index(drop=True)

    pd.testing.assert_frame_equal(run("broadcast"), run("join"))


def test_rarity_weights_exact():
    hist = np.zeros(21952, dtype=np.int64)
    hist[7] = 1
    hist[8] = 3
    hist[9] = 500
    w = rarity_weights(hist, 500)
    assert w[7] == 500 * MICRO
    assert w[8] == (500 * MICRO) // 3
    assert w[9] == MICRO
    assert w[10] == 0
