"""Meta-blocking (CBS weights + weighted edge pruning) tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd


@pytest.fixture()
def sf0001_docs():
    return rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])


def _pack(a, b):
    return (np.int64(a) << np.int64(32)) | np.int64(b)


def test_wep_prune_hand_counts():
    """Edges (0,1) w=3, (0,2) w=1, (1,2) w=2 → mean=2; WEP keeps w ≥ 2
    (exact integer cross-multiplication: w·3 ≥ 6) and restores refs."""
    from blurrily_ray.stages.metablock import wep_prune

    refs = np.array(["r0", "r1", "r2"], dtype=object)
    lut_ref = ray.put((refs, None, None, None, None))
    cbs = rd.from_arrow(pa.table({
        "ab": pa.array([_pack(0, 1), _pack(0, 2), _pack(1, 2)], pa.int64()),
        "w": pa.array([3, 1, 2], pa.int64())}))
    out = wep_prune(cbs, lut_ref, ref_type=pa.string()).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert list(zip(out["a"], out["b"], out["cbs"])) == [
        ("r0", "r1", 3), ("r1", "r2", 2)]


def test_cbs_weights_sum_partial_counts():
    """Per-partition partial counts of the same pair must SUM into the
    exact global co-key weight regardless of partitioning."""
    from blurrily_ray.stages.metablock import cbs_edge_weights

    rows = pd.DataFrame({
        "ab": np.array([_pack(0, 1)] * 3 + [_pack(2, 3)], dtype=np.int64),
        "n": np.array([2, 1, 4, 1], dtype=np.int64)})
    # split the duplicates across input blocks
    ds = rd.from_pandas([rows.iloc[:2], rows.iloc[2:]])
    for n_parts in (1, 16):
        got = cbs_edge_weights(ds, n_parts=n_parts).to_pandas() \
            .sort_values("ab").reset_index(drop=True)
        assert got["ab"].tolist() == [_pack(0, 1), _pack(2, 3)]
        assert got["w"].tolist() == [7, 1]


def test_meta_wep_matches_brute(sf0001_docs):
    """End-to-end WEP over real documents == a driver-side brute
    recomputation from the full CBS edge list (weights, mean rule and
    ref restoration all exact)."""
    from blurrily_ray.stages.editdist import PAIR_MODE
    from blurrily_ray.stages.metablock import (cbs_edge_weights,
                                               meta_block_wep)
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           docsets_bitsets_ref,
                                           trigram_histogram)
    from blurrily_ray.stages.pairs import _cached_get  # noqa: F401
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docsets = docsets_from_docs(sf0001_docs, ref_col="doc_id",
                                text_col="text").materialize()
    hist = trigram_histogram(docsets)
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, hist, PAIR_MODE, lut_ref=lut_ref)
    raw, _ = candidate_pairs_fused_blocking(keys, PAIR_MODE, int_refs=True)
    full = cbs_edge_weights(raw).to_pandas()
    assert full["ab"].is_unique and len(full) > 0
    s, c = int(full["w"].sum()), len(full)
    ref_sorted = ray.get(lut_ref)[0]
    keep = full[full["w"] * c >= s]
    exp = {(ref_sorted[int(ab) >> 32], ref_sorted[int(ab) & 0xFFFFFFFF],
            int(w)) for ab, w in zip(keep["ab"], keep["w"])}

    got_df = meta_block_wep(sf0001_docs).to_pandas()
    got = set(zip(got_df["a"], got_df["b"], got_df["cbs"]))
    assert got == exp
    assert 0 < len(got) < len(full)  # WEP actually prunes something


def test_cnp_prune_hand_counts_or_and():
    """k=1 graph: node0 edges w=3,2,1 (top1=(0,1)); node3 ties at w=1 so
    RANK keeps BOTH its edges. OR keeps all 4 edges; reciprocal (AND)
    keeps only (0,1) — retained by both endpoints."""
    from blurrily_ray.stages.metablock import cnp_prune

    refs = np.array(["r0", "r1", "r2", "r3"], dtype=object)
    lut_ref = ray.put((refs, None, None, None, None))
    cbs = rd.from_arrow(pa.table({
        "ab": pa.array([_pack(0, 1), _pack(0, 2), _pack(0, 3), _pack(2, 3)],
                       pa.int64()),
        "w": pa.array([3, 2, 1, 1], pa.int64())}))

    got_or = cnp_prune(cbs, lut_ref, k=1, ref_type=pa.string()).to_pandas()
    assert set(zip(got_or["a"], got_or["b"], got_or["cbs"])) == {
        ("r0", "r1", 3), ("r0", "r2", 2), ("r0", "r3", 1), ("r2", "r3", 1)}

    got_and = cnp_prune(cbs, lut_ref, k=1, reciprocal=True,
                        ref_type=pa.string()).to_pandas()
    assert set(zip(got_and["a"], got_and["b"], got_and["cbs"])) == {
        ("r0", "r1", 3)}


def test_meta_cnp_matches_brute(sf0001_docs):
    """End-to-end CNP over real documents == a driver-side brute
    recomputation (pandas rank method='min' == SQL RANK()), both
    variants."""
    from blurrily_ray.stages.editdist import PAIR_MODE
    from blurrily_ray.stages.metablock import cbs_edge_weights, meta_block_cnp
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           docsets_bitsets_ref,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docsets = docsets_from_docs(sf0001_docs, ref_col="doc_id",
                                text_col="text").materialize()
    hist = trigram_histogram(docsets)
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, hist, PAIR_MODE, lut_ref=lut_ref)
    raw, _ = candidate_pairs_fused_blocking(keys, PAIR_MODE, int_refs=True)
    full = cbs_edge_weights(raw).to_pandas()
    ref_sorted = ray.get(lut_ref)[0]

    k = 3
    ex = pd.concat([
        pd.DataFrame({"node": full["ab"] // (1 << 32), "ab": full["ab"],
                      "w": full["w"]}),
        pd.DataFrame({"node": full["ab"] % (1 << 32), "ab": full["ab"],
                      "w": full["w"]})])
    ex["r"] = ex.groupby("node")["w"].rank(method="min", ascending=False)
    nf = (ex["r"] <= k).groupby(ex["ab"]).sum()

    def expect(need):
        kept = full.set_index("ab").loc[nf[nf >= need].index]
        return {(ref_sorted[int(ab) >> 32], ref_sorted[int(ab) & 0xFFFFFFFF],
                 int(w)) for ab, w in zip(kept.index, kept["w"])}

    for recip, need in ((False, 1), (True, 2)):
        got_df = meta_block_cnp(sf0001_docs, k=k,
                                reciprocal=recip).to_pandas()
        got = set(zip(got_df["a"], got_df["b"], got_df["cbs"]))
        assert got == expect(need) and len(got) > 0


def test_meta_wep_single_edge_kept():
    """A one-edge graph: the edge equals the mean and must survive."""
    from blurrily_ray.stages.metablock import meta_block_wep

    docs = rd.from_items([
        {"doc_id": 1, "text": "uncommon zebra quartz flying machine"},
        {"doc_id": 2, "text": "uncommon zebra quartz flying machines"},
        {"doc_id": 3, "text": "totally different payload words here"}])
    out = meta_block_wep(docs).to_pandas()
    assert len(out) >= 1
    assert {(r.a, r.b) for r in out.itertuples()} >= {(1, 2)}
