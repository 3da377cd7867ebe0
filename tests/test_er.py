"""End-to-end entity-resolution tests (FIXTURES.md §6 gates)."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from blurrily_ray.config import ERConfig
from blurrily_ray.pipelines.er import run_er_from_paths
from blurrily_ray.sources.synth import ensure_transcripts, generate
from blurrily_ray.stages.cluster import connected_components, pairwise_f1


@pytest.fixture(scope="module")
def sf0001_paths():
    return ensure_transcripts(0.001)


@pytest.fixture(scope="module")
def er_result(sf0001_paths):
    res = run_er_from_paths(sf0001_paths["transcripts"])
    clusters = {r["ref"]: r["cluster_id"] for r in res["clusters"].take_all()}
    return res, clusters


def truth_map(paths):
    return {r["conv_id"]: r["entity_id"]
            for r in pq.read_table(paths["ground_truth"]).to_pylist()}


def test_f1_gate(er_result, sf0001_paths):
    _, clusters = er_result
    f1 = pairwise_f1(clusters, truth_map(sf0001_paths))
    assert f1["f1"] >= 0.99, f1


def test_cluster_eval_matches_pairwise_f1(er_result, sf0001_paths):
    """The distributed contingency counts (stages/cluster.cluster_eval)
    must equal the driver-side dict implementation's integers."""
    from blurrily_ray.stages.cluster import cluster_eval

    res, clusters = er_result
    exp = pairwise_f1(clusters, truth_map(sf0001_paths))
    truth = ray.data.read_parquet(sf0001_paths["ground_truth"])
    got = cluster_eval(res["clusters"], truth).iloc[0]
    assert int(got["tp_pairs"]) == exp["tp_pairs"]
    assert int(got["pred_pairs"]) == exp["pred_pairs"]
    assert int(got["truth_pairs"]) == exp["truth_pairs"]


def test_cluster_eval_bcubed_hand_counts():
    """Hand-verifiable B-cubed: clusters x={c1,c2,c3}, y={c4}; truth
    e1={c1,c2,c4}, e2={c3}.  Cells: (x,e1,n=2) (x,e2,n=1) (y,e1,n=1).
    precision = (4/3 + 1/3 + 1/1)/4, recall = (4/3 + 1/1 + 1/3)/4 —
    as per-cell micro-int floors: ⌊4e6/3⌋+⌊1e6/3⌋+1e6 both sides."""
    from blurrily_ray.stages.cluster import cluster_eval_bcubed

    clusters = ray.data.from_items(
        [{"ref": "c1", "cluster_id": "x"}, {"ref": "c2", "cluster_id": "x"},
         {"ref": "c3", "cluster_id": "x"}, {"ref": "c4", "cluster_id": "y"}])
    truth = ray.data.from_items(
        [{"conv_id": "c1", "entity_id": "e1"},
         {"conv_id": "c2", "entity_id": "e1"},
         {"conv_id": "c3", "entity_id": "e2"},
         {"conv_id": "c4", "entity_id": "e1"},
         {"conv_id": "c9", "entity_id": "e1"}])  # unclustered extra
    got = cluster_eval_bcubed(clusters, truth).iloc[0]
    exp = (4_000_000 // 3) + (1_000_000 // 3) + 1_000_000
    assert int(got["n_items"]) == 4
    assert int(got["bp_micro_sum"]) == exp
    assert int(got["br_micro_sum"]) == exp


def test_cluster_eval_bcubed_matches_driver(er_result, sf0001_paths):
    """The distributed B-cubed sums must equal a driver-side dict
    reference on the real ER output (and a perfect clustering of the
    truth itself must score 10⁶·N on both sides)."""
    from collections import Counter

    from blurrily_ray.stages.cluster import cluster_eval_bcubed

    res, clusters = er_result
    truth = truth_map(sf0001_paths)
    items = [(c, truth[r]) for r, c in clusters.items() if r in truth]
    csize = Counter(c for c, _ in items)
    esize = Counter(e for _, e in items)
    cells = Counter(items)
    bp = sum((n * n * 1_000_000) // csize[c] for (c, _), n in cells.items())
    br = sum((n * n * 1_000_000) // esize[e] for (_, e), n in cells.items())
    tds = ray.data.read_parquet(sf0001_paths["ground_truth"])
    got = cluster_eval_bcubed(res["clusters"], tds).iloc[0]
    assert (int(got["n_items"]), int(got["bp_micro_sum"]),
            int(got["br_micro_sum"])) == (len(items), bp, br)

    perfect = tds.map_batches(
        lambda df: df.rename(columns={"conv_id": "ref",
                                      "entity_id": "cluster_id"}),
        batch_format="pandas")
    pgot = cluster_eval_bcubed(perfect, tds).iloc[0]
    n = int(pgot["n_items"])
    assert int(pgot["bp_micro_sum"]) == n * 1_000_000
    assert int(pgot["br_micro_sum"]) == n * 1_000_000


def test_cluster_edge_stats_hand_counts():
    """Cluster x = {c1,c2,c3} with edges (c1,c2,m=9) and (c2,c3,m=4);
    y = {c4} singleton → zeros. min_matches=4 is the over-merge triage
    signal."""
    from blurrily_ray.stages.cluster import cluster_edge_stats

    clusters = ray.data.from_items(
        [{"ref": "c1", "cluster_id": "x"}, {"ref": "c2", "cluster_id": "x"},
         {"ref": "c3", "cluster_id": "x"}, {"ref": "c4", "cluster_id": "y"}])
    edges = ray.data.from_items(
        [{"a": "c1", "b": "c2", "matches": 9},
         {"a": "c2", "b": "c3", "matches": 4}])
    got = cluster_edge_stats(clusters, edges).to_pandas() \
        .set_index("cluster_id").sort_index()
    assert list(got.index) == ["x", "y"]
    assert got.loc["x"].tolist() == [3, 2, 4, 9, 13]
    assert got.loc["y"].tolist() == [1, 0, 0, 0, 0]


def test_eval_null_labels_excluded():
    """NULL-labeled truth rows are outside the evaluation set for BOTH
    eval operators (and the SQL oracles filter identically): pandas
    groupby silently drops NaN keys, so without the explicit filter the
    engine would diverge from SQL's NULLs-form-a-group rule."""
    import pyarrow as pa  # noqa: F811

    from blurrily_ray.stages.cluster import cluster_eval, cluster_eval_bcubed

    clusters = ray.data.from_items(
        [{"ref": "c1", "cluster_id": "x"}, {"ref": "c2", "cluster_id": "x"},
         {"ref": "c3", "cluster_id": "x"}])
    truth = ray.data.from_arrow(pa.table({
        "conv_id": ["c1", "c2", "c3"],
        "entity_id": pa.array(["e1", "e1", None], pa.string())}))
    got = cluster_eval(clusters, truth).iloc[0]
    # evaluation set = {c1, c2}: tp=1, pred=C(2,2)=1, truth=1
    assert (int(got["tp_pairs"]), int(got["pred_pairs"]),
            int(got["truth_pairs"])) == (1, 1, 1)
    b = cluster_eval_bcubed(clusters, truth).iloc[0]
    assert int(b["n_items"]) == 2
    assert int(b["bp_micro_sum"]) == 2_000_000  # both in their own cells
    assert int(b["br_micro_sum"]) == 2_000_000


def test_cluster_eval_truth_subset():
    """Truth rows restrict to refs present in clusters (inner attach) —
    extra labeled refs must not inflate truth_pairs; a perfect 2-cluster
    labeling gives tp == pred == truth."""
    from blurrily_ray.stages.cluster import cluster_eval

    clusters = ray.data.from_items(
        [{"ref": "c1", "cluster_id": "x"}, {"ref": "c2", "cluster_id": "x"},
         {"ref": "c3", "cluster_id": "y"}])
    truth = ray.data.from_items(
        [{"conv_id": "c1", "entity_id": "e1"},
         {"conv_id": "c2", "entity_id": "e1"},
         {"conv_id": "c3", "entity_id": "e2"},
         {"conv_id": "c9", "entity_id": "e1"}])  # unclustered extra
    got = cluster_eval(clusters, truth).iloc[0]
    assert (int(got["tp_pairs"]), int(got["pred_pairs"]),
            int(got["truth_pairs"])) == (1, 1, 1)


def test_cluster_golden_hand_counts():
    """Hand-verifiable survivorship: cluster x = {c1, c2}, y = {c3};
    codepoint counting (emoji = 1) must match DuckDB length()."""
    from blurrily_ray.stages.cluster import cluster_golden

    clusters = ray.data.from_items(
        [{"ref": "c2", "cluster_id": "c1"}, {"ref": "c1", "cluster_id": "c1"},
         {"ref": "c3", "cluster_id": "c3"}])
    turns = ray.data.from_items(
        [{"conv_id": "c1", "text": "hello"},       # 5
         {"conv_id": "c1", "text": "café"},   # 4 codepoints
         {"conv_id": "c2", "text": "\U0001F600"},  # 1 codepoint
         {"conv_id": "c2", "text": None},          # null == ''
         {"conv_id": "c3", "text": "xyz"},
         {"conv_id": "c9", "text": "orphan turn — no cluster"}])
    got = cluster_golden(clusters, turns).to_pandas() \
        .set_index("cluster_id").sort_index()
    assert list(got.index) == ["c1", "c3"]
    assert got.loc["c1", "canonical_ref"] == "c1"
    assert (int(got.loc["c1", "n_members"]),
            int(got.loc["c1", "n_turns"]),
            int(got.loc["c1", "text_chars"])) == (2, 4, 10)
    assert (int(got.loc["c3", "n_members"]),
            int(got.loc["c3", "n_turns"]),
            int(got.loc["c3", "text_chars"])) == (1, 1, 3)


def test_blocking_eval_hand_counts():
    """Hand-verifiable fixture: 4 nodes, truth {n1,n2,n3}=e1 + n4=e2,
    candidates (n1,n2) tp, (n1,n4) non-tp, (n1,n9) unlabeled side.
    total=C(4,2)=6, cand=3, tp=1, truth=C(3,2)=3."""
    from blurrily_ray.stages.cluster import blocking_eval

    pairs = ray.data.from_items(
        [{"a": "n1", "b": "n2"}, {"a": "n1", "b": "n4"},
         {"a": "n1", "b": "n9"}])
    truth = ray.data.from_items(
        [{"conv_id": "n1", "entity_id": "e1"},
         {"conv_id": "n2", "entity_id": "e1"},
         {"conv_id": "n3", "entity_id": "e1"},
         {"conv_id": "n4", "entity_id": "e2"},
         {"conv_id": "n8", "entity_id": "e9"}])  # outside node set
    nodes = ray.data.from_items(
        [{"ref": r} for r in ["n1", "n2", "n3", "n4"]])
    got = blocking_eval(pairs, truth, nodes).iloc[0]
    assert (int(got["n_refs"]), int(got["total_pairs"]),
            int(got["cand_pairs"]), int(got["tp_pairs"]),
            int(got["truth_pairs"])) == (4, 6, 3, 1, 3)
    assert int(got["rr_micro"]) == (6 - 3) * 1_000_000 // 6
    assert int(got["pc_micro"]) == 1 * 1_000_000 // 3
    assert int(got["pq_micro"]) == 1 * 1_000_000 // 3


def test_blocking_eval_label_universe_is_node_restricted():
    """tp and truth_pairs must read labels from the SAME node-restricted
    universe: a candidate pair whose ref is labeled in truth but outside
    `nodes` (audit over a sampled node set) counts in |cand| but NOT as
    tp — matching the SQL oracle's nlab join."""
    from blurrily_ray.stages.cluster import blocking_eval

    pairs = ray.data.from_items([{"a": "n1", "b": "x9"}])  # x9 ∉ nodes
    truth = ray.data.from_items(
        [{"conv_id": "n1", "entity_id": "e1"},
         {"conv_id": "x9", "entity_id": "e1"}])  # labeled, same entity
    nodes = ray.data.from_items([{"ref": "n1"}, {"ref": "n2"}])
    got = blocking_eval(pairs, truth, nodes).iloc[0]
    assert (int(got["cand_pairs"]), int(got["tp_pairs"]),
            int(got["truth_pairs"])) == (1, 0, 0)


def test_blocking_eval_degenerate_denominators():
    """Empty candidates / single node / no truth overlap export the
    vacuous 1.0 (pairwise_f1's empty-denominator convention)."""
    import pyarrow as pa  # noqa: F811

    from blurrily_ray.stages.cluster import blocking_eval

    empty_pairs = ray.data.from_arrow(pa.table(
        {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}))
    truth = ray.data.from_items([{"conv_id": "n1", "entity_id": "e1"}])
    nodes = ray.data.from_items([{"ref": "n1"}])
    got = blocking_eval(empty_pairs, truth, nodes).iloc[0]
    assert (int(got["cand_pairs"]), int(got["tp_pairs"]),
            int(got["truth_pairs"])) == (0, 0, 0)
    assert (int(got["rr_micro"]), int(got["pc_micro"]),
            int(got["pq_micro"])) == (1_000_000,) * 3


def test_candidate_pairs_restored_is_prethreshold_cand(sf0001_paths):
    """candidate_pairs_restored == the oracle's `cand` CTE: distinct,
    min_cokeys-filtered, ref-space, NO score threshold — a superset of
    the thresholded edges with identical (a, b, matches) on the kept."""
    import duckdb

    from blurrily_ray import oracles
    from blurrily_ray.config import DEFAULT
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           candidate_pairs_restored,
                                           docsets_bitsets_ref,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_grouped

    tpath = sf0001_paths["transcripts"]
    docsets = docsets_grouped(ray.data.read_parquet(tpath)).materialize()
    hist = trigram_histogram(docsets)
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, hist, DEFAULT, lut_ref=lut_ref)
    raw, _ = candidate_pairs_fused_blocking(keys, DEFAULT, int_refs=True)
    got = candidate_pairs_restored(raw, DEFAULT, lut_ref=lut_ref).to_pandas()
    got = set(zip(got["a"], got["b"]))
    sql = (f"WITH {oracles.pairs_cte(oracles.transcripts_src(tpath), DEFAULT)}"
           " SELECT a, b FROM cand")
    exp = set(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == exp


def test_er_refined_composes_and_keeps_f1(sf0001_paths):
    """Merge-and-refine (run_er_refined): refinement only FUSES pass-1
    clusters (never splits — every pass-1 cluster maps to exactly one
    refined label), labels stay min-member refs, and the pairwise F1
    gate still clears on the synth corpus."""
    from blurrily_ray.pipelines.er import run_er_grouped, run_er_refined

    tpath = sf0001_paths["transcripts"]
    base = {r["ref"]: r["cluster_id"]
            for r in run_er_grouped(tpath)["clusters"].take_all()}
    ref = {r["ref"]: r["cluster_id"]
           for r in run_er_refined(tpath)["clusters"].take_all()}
    assert set(ref) == set(base)
    mapping = {}
    for r, c in base.items():
        mapping.setdefault(c, set()).add(ref[r])
    assert all(len(v) == 1 for v in mapping.values())  # never splits
    f1 = pairwise_f1(ref, truth_map(sf0001_paths))
    assert f1["f1"] >= 0.99, f1


def test_er_tiered_nesting(sf0001_paths):
    """Two-resolution single-linkage: tight clusters NEST inside loose
    ones (tight edges ⊆ loose edges ⇒ finer partition), the loose tier
    equals the plain er_clusters labels, and an impossible tight
    threshold degrades to all-singletons."""
    from blurrily_ray.pipelines.er import run_er_grouped, run_er_tiered

    tpath = sf0001_paths["transcripts"]
    out = run_er_tiered(tpath)["clusters"].to_pandas()
    base = {r["ref"]: r["cluster_id"]
            for r in run_er_grouped(tpath)["clusters"].take_all()}
    assert {r: c for r, c in zip(out["ref"], out["cluster_loose"])} == base
    # nesting: each tight cluster lives inside exactly one loose cluster
    g = out.groupby("cluster_tight")["cluster_loose"].nunique()
    assert (g == 1).all()
    assert out["cluster_tight"].nunique() >= out["cluster_loose"].nunique()

    strict = run_er_tiered(
        tpath, tight_cfg=ERConfig(min_matches=10**6))["clusters"].to_pandas()
    assert (strict["cluster_tight"] == strict["ref"]).all()  # singletons


def test_er_refined_identity_under_impossible_threshold(sf0001_paths):
    """With a refine threshold no merged pair can clear, the second pass
    is a no-op: refined labels == base labels exactly."""
    from blurrily_ray.pipelines.er import run_er_grouped, run_er_refined

    tpath = sf0001_paths["transcripts"]
    base = {r["ref"]: r["cluster_id"]
            for r in run_er_grouped(tpath)["clusters"].take_all()}
    res = run_er_refined(tpath, refine_cfg=ERConfig(min_matches=10**6))
    got = {r["ref"]: r["cluster_id"] for r in res["clusters"].take_all()}
    assert got == base


def test_every_conv_labeled(er_result, sf0001_paths):
    _, clusters = er_result
    assert set(clusters) == set(truth_map(sf0001_paths))


def test_determinism(er_result, sf0001_paths):
    _, clusters = er_result
    res2 = run_er_from_paths(sf0001_paths["transcripts"])
    clusters2 = {r["ref"]: r["cluster_id"] for r in res2["clusters"].take_all()}
    assert clusters == clusters2


def test_synth_deterministic():
    t1 = generate(0.001)["transcripts"]
    t2 = generate(0.001)["transcripts"]
    assert t1.equals(t2)


def test_transitivity_and_singletons():
    edges = ray.data.from_items(
        [{"a": "x1", "b": "x2"}, {"a": "x2", "b": "x3"}])
    nodes = ray.data.from_items(
        [{"ref": r} for r in ["x1", "x2", "x3", "lone"]])
    out = {r["ref"]: r["cluster_id"]
           for r in connected_components(edges, nodes).take_all()}
    assert out["x1"] == out["x2"] == out["x3"] == "x1"
    assert out["lone"] == "lone"


def test_distributed_cc_matches_driver():
    # star + 3-chain + singleton: exercises >1 propagation round
    edges = ray.data.from_items(
        [{"a": "s0", "b": "s1"}, {"a": "s0", "b": "s2"}, {"a": "s0", "b": "s3"},
         {"a": "c1", "b": "c2"}, {"a": "c2", "b": "c3"}])
    nodes = ray.data.from_items(
        [{"ref": r} for r in ["s0", "s1", "s2", "s3", "c1", "c2", "c3", "z"]])
    cfg = ERConfig(join_partitions=2, max_cc_rounds=10)
    drv = {r["ref"]: r["cluster_id"]
           for r in connected_components(edges, nodes, cfg, mode="driver").take_all()}
    dist = {r["ref"]: r["cluster_id"]
            for r in connected_components(edges, nodes, cfg, mode="distributed").take_all()}
    assert drv == dist
    assert drv["c3"] == "c1" and drv["s3"] == "s0" and drv["z"] == "z"


def test_sharded_scorer_matches_broadcast(er_result, sf0001_paths):
    """The partitioned scorer actor pool (stages/scorer.py — NO corpus
    broadcast, NO driver materialization) must produce exactly the
    broadcast-fused path's edges and clusters."""
    _, clusters_b = er_result
    res_s = run_er_from_paths(sf0001_paths["transcripts"],
                              score_mode="sharded")
    clusters_s = {r["ref"]: r["cluster_id"]
                  for r in res_s["clusters"].take_all()}
    assert clusters_s == clusters_b


def test_sharded_scorer_packed_equals_scalar(sf0001_paths):
    """The dictionary-packed sharded dataflow (default) must emit exactly
    the scalar-row actor-pool dataflow's edge set — same pairs, same
    scores, same attached stats."""
    import tempfile

    from blurrily_ray.config import DEFAULT
    from blurrily_ray.stages.pairs import (
        blocking_keys, candidate_pairs, key_histogram, trigram_histogram)
    from blurrily_ray.stages.scorer import (
        build_bitset_shards, score_pairs_sharded)
    from blurrily_ray.stages.tokenize import assemble_docs, docsets_from_docs

    ts = ray.data.read_parquet(sf0001_paths["transcripts"])
    docsets = docsets_from_docs(assemble_docs(ts)).materialize()
    hist = trigram_histogram(docsets)
    keys = blocking_keys(docsets, hist, DEFAULT).materialize()
    pairs, _ = candidate_pairs(keys, key_histogram(keys, DEFAULT),
                               DEFAULT, distinct=False)
    pairs = pairs.materialize()
    shard_dir = tempfile.mkdtemp(prefix="packed_eq_shards_")
    build_bitset_shards(docsets, shard_dir, DEFAULT.score_shards)

    def edge_set(ds):
        return {(r["a"], r["b"], r["matches"], r["ntri_a"], r["ntri_b"],
                 r["weight_a"], r["weight_b"]) for r in ds.take_all()}

    e_packed = edge_set(score_pairs_sharded(pairs, shard_dir, DEFAULT,
                                            packed=True))
    e_scalar = edge_set(score_pairs_sharded(pairs, shard_dir, DEFAULT,
                                            packed=False))
    assert len(e_packed) > 0
    assert e_packed == e_scalar


def test_sur_sharded_edges_equal_broadcast(er_result, sf0001_paths):
    """The surrogate-space sharded dataflow (shard-build surrogates +
    fused int-key blocking + int blob exchanges) must emit EXACTLY the
    broadcast-fused path's edge rows — same pairs, same orientation
    (a < b in ref order), same scores and attached stats."""
    res_b, _ = er_result
    res_s = run_er_from_paths(sf0001_paths["transcripts"],
                              score_mode="sharded")

    def edge_rows(ds):
        return {(r["a"], r["b"], r["matches"], r["ntri_a"], r["ntri_b"],
                 r["weight_a"], r["weight_b"]) for r in ds.take_all()}

    e_b = edge_rows(res_b["edges"])
    e_s = edge_rows(res_s["edges"])
    assert len(e_s) > 0
    assert e_s == e_b


def test_sur_builder_raises_on_duplicate_refs():
    """build_bitset_shards_sur's per-shard sort must detect a ref that
    assembled twice (the assume_grouped contiguity hazard) and raise —
    it replaces the explicit refs-only validation pass on this path."""
    import tempfile

    import pyarrow as pa

    from blurrily_ray.stages.scorer import build_bitset_shards_sur

    t = pa.table({
        "ref": ["dup", "dup", "other"],
        "tris": pa.array([[1, 2], [3], [4, 5]], type=pa.list_(pa.uint16())),
        "ntri": pa.array([2, 1, 2], type=pa.int64()),
        "weight": pa.array([5, 3, 4], type=pa.int64())})
    ds = ray.data.from_arrow(t)
    out = build_bitset_shards_sur(ds, tempfile.mkdtemp(prefix="sur_dup_"), 4)
    with pytest.raises(Exception, match="duplicate ref"):
        out.materialize()


def test_auto_dispatch_honors_broadcast_limit(sf0001_paths):
    """score_mode='auto' must route to the sharded scorer when the bitset
    broadcast would exceed broadcast_limit_bytes (regression: 'auto' used
    to mean 'always broadcast')."""
    cfg = ERConfig(broadcast_limit_bytes=1024)  # force the sharded path
    res = run_er_from_paths(sf0001_paths["transcripts"], cfg=cfg)
    stages = res["metrics"].data["stages"]
    assert stages["score_dispatch"]["mode"] == "sharded"
    base = run_er_from_paths(sf0001_paths["transcripts"])
    cb = {r["ref"]: r["cluster_id"] for r in base["clusters"].take_all()}
    ca = {r["ref"]: r["cluster_id"] for r in res["clusters"].take_all()}
    assert ca == cb


def test_key_histogram_driver_cap_preserves_pairs(sf0001_paths):
    """Forcing a tiny driver_key_limit (hot-only histogram partitions)
    must not change the generated pair set — unknown keys are kept
    unsalted, never dropped."""
    from blurrily_ray.stages.pairs import (
        blocking_keys, candidate_pairs, key_histogram, trigram_histogram)
    from blurrily_ray.stages.tokenize import assemble_docs, docsets_from_docs

    ts = ray.data.read_parquet(sf0001_paths["transcripts"],
                               columns=["conv_id", "turn_idx", "text"])
    docsets = docsets_from_docs(assemble_docs(ts)).materialize()
    hist = trigram_histogram(docsets)
    base_cfg = ERConfig()
    keys = blocking_keys(docsets, hist, base_cfg).materialize()

    def pair_set(cfg):
        kh = key_histogram(keys, cfg)
        pairs, stats = candidate_pairs(keys, kh, cfg)
        return {(r["a"], r["b"]) for r in pairs.take_all()}, stats

    full, s_full = pair_set(base_cfg)
    capped, s_capped = pair_set(ERConfig(driver_key_limit=64))
    assert s_full["hist_parts_hot_only"] == 0
    assert s_capped["hist_parts_hot_only"] > 0
    assert full == capped and len(full) > 0


def test_triple_blocking_f1(sf0001_paths):
    """trigram_triple blocking (C(R,3) keys — the 10^10+-doc headroom
    mode) must still clear the F1 gate."""
    res = run_er_from_paths(sf0001_paths["transcripts"],
                            cfg=ERConfig(blocking_mode="trigram_triple"))
    clusters = {r["ref"]: r["cluster_id"] for r in res["clusters"].take_all()}
    f1 = pairwise_f1(clusters, truth_map(sf0001_paths))
    assert f1["f1"] >= 0.99, f1


def test_cokey_count_partition_invariant(sf0001_paths):
    """min_cokeys must count co-blocking-keys EXACTLY, independent of how
    keys hash into pair-gen partitions. Regression: a partition-local (a,b)
    drop_duplicates collapsed same-pair-different-key rows, undercounting
    co-keys — with join_partitions=1 every duplicate collapsed and every
    true edge was dropped by min_cokeys=2."""
    from blurrily_ray.stages.pairs import (
        blocking_keys, candidate_pairs, key_histogram, score_pairs_fused,
        trigram_histogram)
    from blurrily_ray.stages.tokenize import assemble_docs, docsets_from_docs

    ts = ray.data.read_parquet(sf0001_paths["transcripts"],
                               columns=["conv_id", "turn_idx", "text"])
    docsets = docsets_from_docs(assemble_docs(ts)).materialize()
    hist = trigram_histogram(docsets)

    def edges_with(n_parts):
        cfg = ERConfig(join_partitions=n_parts, min_cokeys=2)
        keys = blocking_keys(docsets, hist, cfg).materialize()
        pairs, _ = candidate_pairs(keys, key_histogram(keys), cfg,
                                   distinct=False)
        out = score_pairs_fused(pairs, docsets, cfg)
        return {(r["a"], r["b"]) for r in out.take_all()}

    one = edges_with(1)
    many = edges_with(32)
    assert len(one) > 0
    assert one == many


def test_distributed_cc_deep_chain():
    """A 12-node chain (diameter 11) must converge well within the round cap
    — pointer jumping gives O(log diameter) rounds — and match the driver
    union-find exactly."""
    n = 12
    names = [f"n{i:02d}" for i in range(n)]
    edges = ray.data.from_items(
        [{"a": names[i], "b": names[i + 1]} for i in range(n - 1)])
    nodes = ray.data.from_items([{"ref": r} for r in names + ["solo"]])
    cfg = ERConfig(join_partitions=2, max_cc_rounds=8)
    drv = {r["ref"]: r["cluster_id"]
           for r in connected_components(edges, nodes, cfg, mode="driver").take_all()}
    dist = {r["ref"]: r["cluster_id"]
            for r in connected_components(edges, nodes, cfg, mode="distributed").take_all()}
    assert drv == dist
    assert dist[names[-1]] == names[0] and dist["solo"] == "solo"


def test_distributed_cc_warns_on_round_cap():
    edges = ray.data.from_items(
        [{"a": f"m{i}", "b": f"m{i + 1}"} for i in range(6)])
    nodes = ray.data.from_items([{"ref": f"m{i}"} for i in range(7)])
    cfg = ERConfig(join_partitions=2, max_cc_rounds=1)
    with pytest.warns(RuntimeWarning, match="max_cc_rounds"):
        connected_components(edges, nodes, cfg, mode="distributed").take_all()


def test_salting_preserves_pairs(sf0001_paths):
    """Forcing tiny block_cap (heavy salting) must yield the same candidate
    pair set as uncapped blocking — salting bounds block size, not recall."""
    from blurrily_ray.stages.pairs import (
        blocking_keys, candidate_pairs, key_histogram, trigram_histogram)
    from blurrily_ray.stages.tokenize import assemble_docs, docsets_from_docs

    ts = ray.data.read_parquet(sf0001_paths["transcripts"],
                               columns=["conv_id", "turn_idx", "text"])
    tri = ERConfig(blocking_mode="trigram")  # single-trigram keys go hot
    docsets = docsets_from_docs(assemble_docs(ts)).materialize()
    hist = trigram_histogram(docsets)
    keys = blocking_keys(docsets, hist, tri, max_keys_per_doc=10).materialize()
    khist = key_histogram(keys)

    big = ERConfig(blocking_mode="trigram", block_cap=10_000,
                   salt_factor_max=10_000, stoplist_cap=None)
    small = ERConfig(blocking_mode="trigram", block_cap=4,
                     salt_factor_max=10_000, stoplist_cap=None)
    p_big, s_big = candidate_pairs(keys, khist, big)
    p_small, s_small = candidate_pairs(keys, khist, small)
    set_big = {(r["a"], r["b"]) for r in p_big.take_all()}
    set_small = {(r["a"], r["b"]) for r in p_small.take_all()}
    assert s_big["keys_salted"] == 0 and s_small["keys_salted"] > 0
    assert s_small["keys_dropped"] == 0
    assert set_big == set_small


def test_resume_from_checkpoint(tmp_path, sf0001_paths):
    ckpt = str(tmp_path / "er_run")
    res1 = run_er_from_paths(sf0001_paths["transcripts"], checkpoint_dir=ckpt)
    c1 = {r["ref"]: r["cluster_id"] for r in res1["clusters"].take_all()}
    # second run resumes: all stages skipped, identical output
    res2 = run_er_from_paths(sf0001_paths["transcripts"], checkpoint_dir=ckpt)
    c2 = {r["ref"]: r["cluster_id"] for r in res2["clusters"].take_all()}
    assert c1 == c2
    # config change invalidates lineage → recompute still correct
    res3 = run_er_from_paths(sf0001_paths["transcripts"], checkpoint_dir=ckpt,
                             cfg=ERConfig(min_matches=6))
    c3 = {r["ref"]: r["cluster_id"] for r in res3["clusters"].take_all()}
    assert set(c3) == set(c1)


def test_turn_invariant(sf0001_paths):
    """input_hint per-row invariant: per-turn text passes through unmodified
    and doc assembly respects stable turn ordering."""
    from blurrily_ray.stages.tokenize import assemble_docs

    tbl = pq.read_table(sf0001_paths["transcripts"])
    ts = ray.data.read_parquet(sf0001_paths["transcripts"])
    docs = {r["ref"]: r["text"] for r in assemble_docs(ts).take_all()}
    df = tbl.to_pandas()
    for conv, g in df.groupby("conv_id"):
        expected = " ".join(g.sort_values("turn_idx")["text"])
        assert docs[conv] == expected


def test_assemble_grouped_matches_default(sf0001_paths):
    """assume_grouped fast path (no bulk-text shuffle) must produce exactly
    the same documents as the general shuffle path."""
    from blurrily_ray.stages.tokenize import assemble_docs

    ts = ray.data.read_parquet(sf0001_paths["transcripts"],
                               columns=["conv_id", "turn_idx", "text"])
    base = {r["ref"]: r["text"] for r in assemble_docs(ts).take_all()}
    fast = {r["ref"]: r["text"]
            for r in assemble_docs(ts, assume_grouped=True).take_all()}
    assert base == fast
    # robust to tiny blocks (every conv is a boundary conv somewhere)
    tiny = ts.repartition(40)
    fast2 = {r["ref"]: r["text"]
             for r in assemble_docs(tiny, assume_grouped=True).take_all()}
    assert base == fast2


def test_docsets_grouped_equals_two_stage(sf0001_paths):
    """Fused assemble+tokenize (text never materialized) must equal the
    two-stage path exactly — refs, counts, weights and trigram sets."""
    import ray.data as rd

    from blurrily_ray.stages.tokenize import (
        assemble_docs, docsets_from_docs, docsets_grouped)

    ts = rd.read_parquet(sf0001_paths["transcripts"],
                         columns=["conv_id", "turn_idx", "text"])
    old = docsets_from_docs(assemble_docs(ts, assume_grouped=True)) \
        .to_pandas().sort_values("ref").reset_index(drop=True)
    ts2 = rd.read_parquet(sf0001_paths["transcripts"],
                          columns=["conv_id", "turn_idx", "text"])
    new = docsets_grouped(ts2) \
        .to_pandas().sort_values("ref").reset_index(drop=True)
    assert old["ref"].tolist() == new["ref"].tolist()
    assert old["ntri"].tolist() == new["ntri"].tolist()
    assert old["weight"].tolist() == new["weight"].tolist()
    assert all(list(x) == list(y) for x, y in zip(old["tris"], new["tris"]))


def test_grouped_path_rejects_noncontiguous_input():
    """Non-conversation-contiguous input on the assume_grouped fast path
    raises (duplicate-ref validation) instead of silently assembling a
    conversation once per block it appears interior to."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from blurrily_ray.pipelines.er import _validate_unique_refs
    from blurrily_ray.stages.tokenize import docsets_grouped

    # conversations a/b/c interleaved in blocks of unrelated convs so each
    # appears INTERIOR to more than one block
    rows = []
    for blk in range(4):
        rows.append((f"pad{blk}s", 0, "padding start words"))
        for cid in ("a", "b", "c"):
            rows.append((cid, blk, f"turn {blk} of {cid} with words"))
        rows.append((f"pad{blk}e", 0, "padding end words"))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    per_block = len(rows) // 4
    ds = rd.from_pandas([df.iloc[i:i + per_block]
                         for i in range(0, len(df), per_block)])
    docsets = docsets_grouped(ds).materialize()
    with pytest.raises(ValueError, match="not conversation-contiguous"):
        _validate_unique_refs(docsets)


def test_broadcast_lut_rejects_duplicate_refs():
    """The free sorted-pass dup check in the bitset LUT catches the same
    corruption on the broadcast scoring path."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from blurrily_ray.stages.pairs import _docsets_bitsets
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docs = pd.DataFrame({"ref": ["a", "b", "a"],
                         "text": ["first words", "other words", "again words"]})
    dsets = docsets_from_docs(rd.from_pandas(docs))
    with pytest.raises(ValueError, match="duplicate docset refs"):
        _docsets_bitsets(dsets)


def test_run_er_wires_contiguity_guard_on_all_score_modes():
    """End-to-end: run_er(assume_grouped=True) on interleaved input raises
    on the join path (explicit check) AND the broadcast path (LUT check) —
    the guard is wired into the pipeline, not just available."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from blurrily_ray.pipelines.er import run_er

    rows = []
    for blk in range(4):
        rows.append((f"pad{blk}s", 0, "padding start words"))
        for cid in ("a", "b", "c"):
            rows.append((cid, blk, f"turn {blk} of {cid} with words"))
        rows.append((f"pad{blk}e", 0, "padding end words"))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    per_block = len(rows) // 4

    def ds():
        return rd.from_pandas([df.iloc[i:i + per_block]
                               for i in range(0, len(df), per_block)])

    with pytest.raises(ValueError, match="not conversation-contiguous"):
        run_er(ds(), assume_grouped=True, score_mode="join")
    with pytest.raises(Exception, match="duplicate docset refs"):
        res = run_er(ds(), assume_grouped=True, score_mode="broadcast")
        res["clusters"].materialize()


def test_fuzzy_join_allows_duplicate_catalog_refs():
    """Duplicate catalog refs are legal for fuzzy_join (positional
    scoring); each duplicate row ranks independently."""
    import pandas as pd
    import ray.data as rd

    from blurrily_ray.stages.index import fuzzy_join

    needles = pd.DataFrame({"needle_ref": ["q"], "text": ["hello world"]})
    catalog = pd.DataFrame({"ref": ["c", "c"],
                            "text": ["hello world", "hello world exactly"]})
    out = fuzzy_join(rd.from_pandas(needles), rd.from_pandas(catalog),
                     needle_id="needle_ref", k=5).to_pandas()
    assert len(out) == 2 and set(out.ref) == {"c"}


def test_distributed_cc_volume_matches_driver():
    """Forced-distributed CC at a bulk edge volume (the native
    groupby.aggregate(Min) it replaced was measured hanging on multi-
    million-row sets — NOTES_r2): a 100k-edge random graph must converge,
    stay wall-bounded, and match driver union-find exactly."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(7)
    n_nodes, n_edges = 50_000, 100_000
    edges = ray.data.from_arrow(pa.table(
        {"a": rng.integers(0, n_nodes, n_edges),
         "b": rng.integers(0, n_nodes, n_edges)}))
    nodes = ray.data.from_arrow(pa.table({"ref": np.arange(n_nodes)}))
    cfg = ERConfig(join_partitions=8, max_cc_rounds=30)
    dist = connected_components(edges, nodes, cfg, mode="distributed") \
        .to_pandas().sort_values("ref").reset_index(drop=True)
    drv = connected_components(edges, nodes, cfg, mode="driver") \
        .to_pandas().sort_values("ref").reset_index(drop=True)
    assert dist.equals(drv)
