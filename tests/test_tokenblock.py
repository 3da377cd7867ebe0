"""Token blocking (+ block purging / meta-blocking composition) tests."""

import pyarrow as pa
import pytest
import ray.data as rd

from blurrily_ray.config import ERConfig
from blurrily_ray.stages.tokenblock import (TOKEN_MODE, token_blocking_pairs,
                                            token_meta_wep)


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r for r, _ in rows], type=pa.int64()),
        "text": pa.array([t for _, t in rows], type=pa.string())}))


def test_token_pairs_hand_counts():
    """Weights are exact shared-DISTINCT-token counts: docs 1/2 share
    {alpha, beta} (weight 2, repeats don't double-count), docs 1/3
    share {alpha} (weight 1), doc 4 shares nothing."""
    docs = _docs([(1, "Alpha beta beta gamma"),
                  (2, "alpha BETA delta"),
                  (3, "alpha epsilon"),
                  (4, "zeta eta")])
    out = token_blocking_pairs(docs).to_pandas()
    got = {(r.a, r.b): r.cbs for r in out.itertuples()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_token_block_purging_cap():
    """A token appearing in more docs than the stoplist cap is purged —
    its block generates NO pairs (the literature's block purging)."""
    hot = [(i, f"common uniq{i}") for i in range(10)]
    docs = _docs(hot)
    cfg = ERConfig(blocking_mode="trigram", min_cokeys=1, stoplist_cap=5)
    out = token_blocking_pairs(docs, cfg).to_pandas()
    assert len(out) == 0  # 'common' df=10 > 5 → purged; uniq* are singletons
    keep = ERConfig(blocking_mode="trigram", min_cokeys=1, stoplist_cap=64)
    out2 = token_blocking_pairs(docs, keep).to_pandas()
    assert len(out2) == 10 * 9 // 2 and (out2["cbs"] == 1).all()


def test_token_pairs_salting_invariant():
    """Forcing heavy salting (tiny block_cap) must not change the edge
    set or the weights — salting bounds block size, not recall."""
    docs = _docs([(i, f"shared tok{i % 3} word{i}") for i in range(12)])
    base = ERConfig(blocking_mode="trigram", min_cokeys=1, stoplist_cap=64)
    salted = ERConfig(blocking_mode="trigram", min_cokeys=1,
                      stoplist_cap=64, block_cap=2, salt_factor_max=64)
    e1 = {(r.a, r.b, r.cbs) for r in
          token_blocking_pairs(docs, base).to_pandas().itertuples()}
    e2 = {(r.a, r.b, r.cbs) for r in
          token_blocking_pairs(docs, salted).to_pandas().itertuples()}
    assert e1 == e2 and len(e1) > 0


def test_token_meta_wep_prunes_below_mean():
    """Composition with WEP: mean weight = (2+1+1)/3 → only the weight-2
    edge survives the ≥-mean test."""
    docs = _docs([(1, "alpha beta gamma"),
                  (2, "alpha beta delta"),
                  (3, "alpha epsilon"),
                  (4, "beta zeta")])
    # edges: (1,2) w=2 {alpha,beta}; (1,3) w=1; (1,4) w=1; (2,3) w=1;
    # (2,4) w=1 → mean = 6/5; WEP keeps w ≥ 6/5 ⇒ only (1,2)
    out = token_meta_wep(docs).to_pandas()
    assert set(zip(out["a"], out["b"], out["cbs"])) == {(1, 2, 2)}


def test_token_pairs_string_refs():
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(["x", "y"], pa.string()),
        "text": pa.array(["alpha beta", "alpha gamma"], pa.string())}))
    out = token_blocking_pairs(docs).to_pandas()
    assert set(zip(out["a"], out["b"], out["cbs"])) == {("x", "y", 1)}


def test_token_pairs_empty():
    """Empty corpus: zero rows, no exception. (Ray drops zero-row blocks
    through map operators, so a column-less frame is the engine-wide
    empty convention — the typed schema survives on the Dataset itself.)"""
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    out = token_blocking_pairs(docs)
    assert out.schema() is not None  # typed contract for downstream
    assert len(out.to_pandas()) == 0
