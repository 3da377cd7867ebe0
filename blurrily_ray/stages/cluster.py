"""Transitive clustering: connected components over the match-edge graph.

Two interchangeable engines producing identical output (cluster_id = the
lexicographically smallest member ref of each component):

- **Driver union-find** (default below ``uf_driver_limit`` edges): stream
  edge batches to the driver, union with path compression, broadcast the
  resulting label map back. Exact, one pass — the right tool whenever the
  *edge list* (not the corpus) fits on one machine, which holds far beyond
  sandbox scale since edges ≈ matched pairs ≪ corpus.

- **Distributed hash-min label propagation** (the 10^12-turn path): labels
  start as self; each round ships every node's current label across its
  edges and takes the min (coarse hash-partitioned pandas merge + min —
  see ``_distributed_hash_min`` for why not the native Ray aggregate).
  Converges in O(log n)
  rounds for the diameter-bounded components ER produces ("Finding
  connected components in MapReduce in logarithmic rounds", ICDE 2013 —
  PAPERS.md). Convergence is detected with a distributed checksum
  aggregate, never by materializing labels on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from blurrily_ray.config import DEFAULT, ERConfig
from blurrily_ray.stages.common import (join_partitions_cap, partitioned_map,
                                        partitioned_map2)
from blurrily_ray.stages.pairs import _cached_get


def _driver_cc_arrays(edges):
    """(refs, cluster_ids) numpy arrays for every ref appearing in an edge.

    Fully vectorized: refs factorize to int codes (np.unique — sorted, so
    the min code IS the lexicographically smallest ref), then min-label
    propagation over the edge arrays with pointer jumping. O(log n) rounds,
    each a handful of numpy kernels over the edge list — no per-edge
    Python. This is driver-serial time, so it must be cheap: it is the one
    stage that does not parallelize with num_cpus."""
    a_parts, b_parts = [], []
    for batch in edges.select_columns(["a", "b"]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        a_parts.append(batch["a"].to_numpy(zero_copy_only=False))
        b_parts.append(batch["b"].to_numpy(zero_copy_only=False))
    if not a_parts:
        return np.array([], dtype=object), np.array([], dtype=object)
    ab = np.concatenate(a_parts + b_parts)
    refs, codes = np.unique(ab, return_inverse=True)
    n_edges = sum(len(p) for p in a_parts)
    ai, bi = codes[:n_edges], codes[n_edges:]
    label = np.arange(len(refs), dtype=np.int64)
    while True:
        new = label.copy()
        np.minimum.at(new, ai, label[bi])
        np.minimum.at(new, bi, label[ai])
        while True:  # pointer jumping: label(label(n)) until stable
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        if np.array_equal(new, label):
            break
        label = new
    return refs, refs[label]


def _driver_union_find(edges) -> dict:
    """{ref: cluster_id} for every ref appearing in an edge."""
    refs, clusters = _driver_cc_arrays(edges)
    return dict(zip(refs.tolist(), clusters.tolist()))


def _hash_col(arr) -> np.ndarray:
    """Deterministic vectorized uint64 hash of a column (int or string)."""
    v = np.asarray(arr)
    if np.issubdtype(v.dtype, np.integer):
        h = v.astype(np.uint64, copy=True)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return h
    # pandas hash_array: stable across processes (fixed siphash key),
    # vectorized C path — no per-row Python
    return pd.util.hash_array(v, categorize=False)


def _checksum(labels) -> int:
    """Order-independent distributed checksum of (node, label) pairs —
    vectorized mix + xor-sum per batch, one tiny row to the driver each."""

    def part(batch: pa.Table) -> pa.Table:
        hn = _hash_col(batch["node"].to_numpy(zero_copy_only=False))
        hl = _hash_col(batch["label"].to_numpy(zero_copy_only=False))
        mixed = hn * np.uint64(0x9E3779B97F4A7C15) ^ hl
        tot = int(mixed.sum(dtype=np.uint64)) & ((1 << 63) - 1)
        return pa.table({"s": pa.array([tot], type=pa.int64())})

    parts = labels.map_batches(part, batch_format="pyarrow").take_all()
    return sum(int(r["s"]) for r in parts) % (1 << 63)


def _distributed_hash_min(edges, nodes, cfg: ERConfig) -> "ray.data.Dataset":
    """labels dataset (node, label) via iterative hash-min over edges.

    Both per-round exchanges run on ``partitioned_map``/``partitioned_map2``
    (pandas-fused coarse partitions) — NOT Ray's native ``Dataset.join`` /
    ``groupby().aggregate(Min)``: the native aggregate was measured hanging
    (>6 min) on 7.5M-row pair sets (NOTES_r2, same family as the round-1
    HASH_SHUFFLE hang), and native joins emit zero-column empty blocks
    that crash chained ops. Round = (1) co-partition propagation edges
    with labels by src and merge per partition → messages (node, label);
    (2) union messages with current labels, co-partition by node, min per
    node. Identical semantics, exchange count unchanged (2/round)."""
    n_parts = join_partitions_cap(cfg.join_partitions)
    edges_sym = edges.select_columns(["a", "b"]).map_batches(
        lambda t: pa.table({"src": pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()]),
                            "dst": pa.concat_arrays([t["b"].combine_chunks(), t["a"].combine_chunks()])}),
        batch_format="pyarrow").materialize()
    labels = nodes.map_batches(
        lambda t: pa.table({"node": t["ref"], "label": t["ref"]}),
        batch_format="pyarrow").materialize()
    if edges_sym.count() == 0:
        return labels.rename_columns({"node": "ref", "label": "cluster_id"})

    def deliver(edf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        out = edf.merge(ldf, left_on="src", right_on="node", how="inner")
        return pd.DataFrame({"node": out["dst"].to_numpy(),
                             "label": out["label"].to_numpy()})

    def node_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False, sort=False)["label"].min()

    prev_sum = _checksum(labels)
    converged = False
    for _round in range(cfg.max_cc_rounds):
        # propagation edges = the original graph PLUS the current label
        # pointers (label(n) → n). The pointer edges make this round
        # deliver label(label(n)) to n — pointer jumping — so deep chains
        # converge in O(log diameter) rounds instead of O(diameter)
        # (the shortcutting idea of the ICDE 2013 CC algorithm).
        lab_edges = labels.map_batches(
            lambda t: pa.table({"src": t["label"], "dst": t["node"]}),
            batch_format="pyarrow")
        msgs = partitioned_map2(edges_sym.union(lab_edges), labels,
                                ["src"], ["node"], deliver, n_parts=n_parts)
        # repartition BEFORE materializing: groupby().map_groups emits
        # roughly one (mostly empty) block per input block, so an
        # iterative loop that feeds each round's output into the next
        # TRIPLES its block count every round (measured 37 → 111 → 333 →
        # 999 on a 13-node fixture) until the streaming executor wedges
        # under thousands of empty blocks. Pinning labels back to n_parts
        # blocks per round makes the loop steady-state.
        labels_new = partitioned_map(labels.union(msgs), ["node"], node_min,
                                     n_parts=n_parts) \
            .repartition(n_parts).materialize()
        new_sum = _checksum(labels_new)
        labels = labels_new
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        import warnings

        warnings.warn(
            f"distributed CC hit max_cc_rounds={cfg.max_cc_rounds} without "
            "checksum convergence — labels may be partially propagated; "
            "raise max_cc_rounds", RuntimeWarning, stacklevel=2)
    return labels.rename_columns({"node": "ref", "label": "cluster_id"})


def connected_components(edges, nodes, cfg: ERConfig = DEFAULT, *,
                         mode: str = "auto"):
    """edges (a, b, ...) + nodes (ref, ...) → (ref, cluster_id) for every
    node; nodes without any matched edge form singleton clusters."""
    if mode == "auto":
        mode = "driver" if edges.count() <= cfg.uf_driver_limit else "distributed"

    if mode == "distributed":
        return _distributed_hash_min(edges, nodes, cfg)

    uf_refs, uf_clusters = _driver_cc_arrays(edges)
    # pd.Index = C hash table → get_indexer is a vectorized lookup for both
    # string and int refs (searchsorted on object arrays would fall back to
    # per-comparison Python)
    map_ref = ray.put((pd.Index(uf_refs), uf_clusters))

    def assign(batch: pa.Table) -> pa.Table:
        idx, clusters = _cached_get(map_ref)
        v = batch["ref"].to_numpy(zero_copy_only=False)
        out = v.copy()
        if len(idx):
            pos = idx.get_indexer(v)
            hit = pos >= 0
            out[hit] = clusters[pos[hit]]
        return pa.table({
            "ref": batch["ref"],
            "cluster_id": pa.array(out, type=batch["ref"].type),
        })

    return nodes.select_columns(["ref"]).map_batches(assign, batch_format="pyarrow")


def cluster_eval(clusters, truth, *, truth_ref_col: str = "conv_id",
                 truth_col: str = "entity_id", n_parts: int = 64):
    """Distributed pairwise linkage evaluation: (tp_pairs, pred_pairs,
    truth_pairs) of a (ref, cluster_id) labeling against a labeled
    (ref, entity_id) table — the integer numerators/denominators of the
    north rule's pairwise F1, computed WITHOUT enumerating pairs.

    Same contingency identity as :func:`pairwise_f1` (Σ C(n_g, 2) over
    group sizes), but every count is distributed: one ref-keyed
    co-partition attaches the truth label, then each of the three
    groupings (cluster, entity, cluster×entity) runs as map-side partial
    counts → one tiny keyed shuffle → exact sizes → per-partition
    partial pair-sums; the driver adds ≤ n_parts rows per grouping.
    Truth rows are restricted to refs present in ``clusters`` (inner
    attach) and NULL-labeled rows are excluded, matching pairwise_f1's
    evaluation set. Returns a one-row pandas DataFrame (int64), ready
    for the caller's F1 arithmetic."""
    n_parts = join_partitions_cap(n_parts)

    def attach(c_df: pd.DataFrame, t_df: pd.DataFrame) -> pd.DataFrame:
        t = t_df.rename(columns={truth_ref_col: "ref",
                                 truth_col: "_entity"})
        # NULL labels are excluded from the evaluation set (an unlabeled
        # item contributes to neither side; the SQL mirror filters
        # identically — and pandas groupby silently DROPS NaN keys, which
        # would otherwise diverge from SQL's NULLs-form-a-group rule)
        t = t[t["_entity"].notna()]
        return c_df.merge(t, on="ref", how="inner")[["cluster_id",
                                                     "_entity"]]

    joined = partitioned_map2(
        clusters.select_columns(["ref", "cluster_id"]),
        truth.select_columns([truth_ref_col, truth_col]),
        ["ref"], [truth_ref_col], attach, n_parts=n_parts).materialize()

    return pd.DataFrame({
        "tp_pairs": pd.Series(
            [_group_pair_sum(joined, ["cluster_id", "_entity"], n_parts)],
            dtype=np.int64),
        "pred_pairs": pd.Series(
            [_group_pair_sum(joined, ["cluster_id"], n_parts)],
            dtype=np.int64),
        "truth_pairs": pd.Series(
            [_group_pair_sum(joined, ["_entity"], n_parts)],
            dtype=np.int64),
    })


def cluster_eval_bcubed(clusters, truth, *, truth_ref_col: str = "conv_id",
                        truth_col: str = "entity_id", n_parts: int = 64):
    """Distributed B-cubed evaluation (Bagga & Baldwin 1998) — the
    second standard ER metric beside pairwise F1, item-weighted instead
    of pair-weighted (a 1000-member cluster error no longer drowns out
    fifty 2-member ones):

      B³ precision = (1/N) Σ_i |C(i) ∩ L(i)| / |C(i)|
      B³ recall    = (1/N) Σ_i |C(i) ∩ L(i)| / |L(i)|

    Via the contingency cells: each (cluster, entity) cell of size n_ce
    contributes n_ce²/|cluster| to the precision sum and n_ce²/|entity|
    to the recall sum. Everything distributes: map-side partial cell
    counts, then ONE keyed shuffle per side (cluster_id for precision,
    entity for recall — a cluster's cells land in one partition, so its
    exact size is in-partition), per-cell exact floor contributions in
    micro-ints, driver adds ≤ n_parts partials. Returns one row
    (n_items, bp_micro_sum, br_micro_sum) int64 — divide the sums by
    n_items for the averages; per-cell ⌊n_ce²·10⁶/size⌋ floors match
    the SQL oracle's BIGINT division exactly (no float anywhere).
    Truth rows restrict to refs present in ``clusters`` (inner attach)
    and NULL-labeled rows are excluded — the same evaluation set as
    :func:`cluster_eval`."""
    n_parts = join_partitions_cap(n_parts)

    def attach(c_df: pd.DataFrame, t_df: pd.DataFrame) -> pd.DataFrame:
        t = t_df.rename(columns={truth_ref_col: "ref",
                                 truth_col: "_entity"})
        # NULL labels are excluded from the evaluation set (an unlabeled
        # item contributes to neither side; the SQL mirror filters
        # identically — and pandas groupby silently DROPS NaN keys, which
        # would otherwise diverge from SQL's NULLs-form-a-group rule)
        t = t[t["_entity"].notna()]
        return c_df.merge(t, on="ref", how="inner")[["cluster_id",
                                                     "_entity"]]

    joined = partitioned_map2(
        clusters.select_columns(["ref", "cluster_id"]),
        truth.select_columns([truth_ref_col, truth_col]),
        ["ref"], [truth_ref_col], attach, n_parts=n_parts).materialize()
    n_items = joined.count()

    def partial(df: pd.DataFrame) -> pa.Table:
        out = df.groupby(["cluster_id", "_entity"],
                         sort=False).size().reset_index()
        out.columns = ["cluster_id", "_entity", "cnt"]
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    partials = joined.map_batches(
        partial, batch_format="pandas").materialize()

    def side_sum(key_col: str) -> int:
        def per_part(df: pd.DataFrame) -> pd.DataFrame:
            cells = df.groupby(["cluster_id", "_entity"],
                               sort=False)["cnt"].sum()
            level = 0 if key_col == "cluster_id" else 1
            sizes = cells.groupby(level=level).sum()
            nv = cells.to_numpy()
            sv = sizes.loc[cells.index.get_level_values(level)].to_numpy()
            if len(nv) and int(nv.max()) <= 3_000_000:
                # n_ce² · 10⁶ < 2⁶³ up to n_ce ≈ 3.03e6; each floor ≤
                # n_ce·10⁶ so the partial sum caps at 10⁶ · Σn_ce
                tot = int(((nv * nv * 1_000_000) // sv).sum())
            else:
                tot = sum((int(x) ** 2 * 1_000_000) // int(s)
                          for x, s in zip(nv, sv))
            return pd.DataFrame({"s": [tot]})

        parts = partitioned_map(partials, [key_col], per_part,
                                n_parts=n_parts).to_pandas()
        return int(parts["s"].sum()) if len(parts) else 0

    return pd.DataFrame({
        "n_items": pd.Series([n_items], dtype=np.int64),
        "bp_micro_sum": pd.Series([side_sum("cluster_id")],
                                  dtype=np.int64),
        "br_micro_sum": pd.Series([side_sum("_entity")], dtype=np.int64),
    })


def cluster_edge_stats(clusters, edges, *, n_parts: int = 64):
    """Per-cluster linkage-confidence statistics — the post-resolution
    review-queue signal (a large cluster held together by one weak
    minimum-score edge is the classic over-merge candidate; Christen
    2012's manual-review practice): (cluster_id, n_members, n_edges,
    min_matches, max_matches, sum_matches), all int64.

    Distribution: every edge's endpoints share a cluster by
    construction, so ONE a-side co-partition attaches the label; edge
    aggregates map-side combine (per-batch groupby partials → one tiny
    keyed shuffle), member counts likewise, and a final cluster-keyed
    co-partition LEFT-joins the two (singleton clusters report
    n_edges = 0 and zero min/max/sum). Nothing corpus-sized leaves the
    stream. Oracle: oracles.sql_er_cluster_stats."""
    n_parts = join_partitions_cap(n_parts)

    def attach(e_df: pd.DataFrame, c_df: pd.DataFrame) -> pd.DataFrame:
        c = c_df.rename(columns={"ref": "a"})
        return e_df.merge(c, on="a", how="inner")[["cluster_id", "matches"]]

    tagged = partitioned_map2(
        edges.select_columns(["a", "matches"]),
        clusters.select_columns(["ref", "cluster_id"]),
        ["a"], ["ref"], attach, n_parts=n_parts)

    def epartial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("cluster_id", sort=False)["matches"] \
            .agg(["size", "min", "max", "sum"]).reset_index()
        g.columns = ["cluster_id", "n", "mn", "mx", "sm"]
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def efinal(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster_id", sort=False).agg(
            n_edges=("n", "sum"), min_matches=("mn", "min"),
            max_matches=("mx", "max"), sum_matches=("sm", "sum"))
        return g.reset_index()

    estats = partitioned_map(
        tagged.map_batches(epartial, batch_format="pandas"),
        ["cluster_id"], efinal, n_parts=n_parts)

    def mpartial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("cluster_id", sort=False).size().reset_index()
        g.columns = ["cluster_id", "m"]
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    members = partitioned_map(
        clusters.select_columns(["cluster_id"]).map_batches(
            mpartial, batch_format="pandas"),
        ["cluster_id"],
        lambda df: df.groupby("cluster_id", sort=False)["m"].sum()
        .reset_index(), n_parts=n_parts)

    stat_cols = ["n_edges", "min_matches", "max_matches", "sum_matches"]

    def combine(m_df: pd.DataFrame, e_df: pd.DataFrame) -> pd.DataFrame:
        out = m_df.rename(columns={"m": "n_members"}).merge(
            e_df, on="cluster_id", how="left")
        for c in stat_cols:
            out[c] = out[c].fillna(0).astype(np.int64)
        out["n_members"] = out["n_members"].astype(np.int64)
        return out[["cluster_id", "n_members", *stat_cols]]

    # members' schema can vanish on an empty corpus — no clusters means
    # an empty one-row-free stream; surface the typed contract
    msch = members.schema()
    if msch is None:
        import ray.data as rd

        ctype = pa.string()
        csch = clusters.schema()
        if csch is not None:
            t = dict(zip(csch.names, csch.types)).get("cluster_id")
            if isinstance(t, pa.DataType):
                ctype = t
        return rd.from_arrow(pa.table({
            "cluster_id": pa.array([], type=ctype),
            "n_members": pa.array([], type=pa.int64()),
            **{c: pa.array([], type=pa.int64()) for c in stat_cols}}))
    etypes = dict(zip(msch.names, msch.types))
    right_schema = pa.schema([
        ("cluster_id", etypes["cluster_id"]
         if isinstance(etypes["cluster_id"], pa.DataType) else pa.string()),
        ("n_edges", pa.int64()), ("min_matches", pa.int64()),
        ("max_matches", pa.int64()), ("sum_matches", pa.int64())])
    return partitioned_map2(members, estats, ["cluster_id"],
                            ["cluster_id"], combine, n_parts=n_parts,
                            right_schema=right_schema)


def _group_pair_sum(ds, key_cols: list[str], n_parts: int) -> int:
    """Σ C(n_g, 2) over the sizes of ``ds``'s ``key_cols`` groups —
    map-side partial counts, one tiny keyed shuffle for the exact sizes,
    per-partition pair-sums; the driver adds ≤ n_parts rows."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key_cols, sort=False).size().reset_index()
        out.columns = [*key_cols, "cnt"]
        return out

    partials = ds.map_batches(partial, batch_format="pandas")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby(key_cols, sort=False)["cnt"].sum().to_numpy()
        return pd.DataFrame(
            {"pairs": [int((tot * (tot - 1) // 2).sum())]})

    parts = partitioned_map(partials, key_cols, per_part,
                            n_parts=n_parts).to_pandas()
    return int(parts["pairs"].sum()) if len(parts) else 0


def blocking_eval(cand_pairs, truth, nodes, *,
                  truth_ref_col: str = "conv_id",
                  truth_col: str = "entity_id", n_parts: int = 64):
    """Distributed blocking-quality evaluation (Christen 2012's standard
    metrics): given the DISTINCT candidate pairs a blocking scheme emits
    (BEFORE any similarity threshold), the labeled ground truth, and the
    evaluated node set, compute the integer numerators/denominators of

      reduction ratio   RR = 1 − |cand| / C(n, 2)
      pair completeness PC = |cand ∩ truth| / |truth-pairs|   (recall)
      pair quality      PQ = |cand ∩ truth| / |cand|          (precision)

    without enumerating anything quadratic: tp attaches the entity label
    to each pair side via two edge-sized co-partition exchanges (the
    editdist attach shape), truth-pairs is Σ C(n_e, 2) over the node-
    restricted entity sizes (map-side combined), and the ratios export as
    micro-ints via exact BIGINT floor division (no float in the compare).
    Returns a one-row pandas DataFrame, all int64.

    Pairs whose refs lack a truth label count in |cand| but not in tp
    (inner attach — the only exact reading of a partially-labeled audit
    sample). Degenerate denominators (< 2 nodes, zero truth pairs, zero
    candidates) export 1_000_000 (the vacuous 1.0, pairwise_f1's own
    convention for empty denominators)."""
    n_parts = join_partitions_cap(n_parts)

    lab_cols = [truth_ref_col, truth_col]

    # node-restrict the label table FIRST: tp, truth_pairs and the SQL
    # oracle must all read labels from the SAME universe (a pair ref
    # labeled in truth but outside `nodes` — an audit over a sampled
    # node set — must not count as tp while being absent from the
    # truth-pair denominator)
    def keep_labeled(n_df: pd.DataFrame, t_df: pd.DataFrame) -> pd.DataFrame:
        t = t_df.rename(columns={truth_ref_col: "ref", truth_col: "_entity"})
        # NULL labels excluded (cluster_eval convention: keeps pandas
        # groupby's NaN-drop from diverging vs SQL's NULL-group rule)
        t = t[t["_entity"].notna()]
        return n_df.merge(t, on="ref", how="inner")[["ref", "_entity"]]

    nlab = partitioned_map2(nodes.select_columns(["ref"]),
                            truth.select_columns(lab_cols),
                            ["ref"], [truth_ref_col], keep_labeled,
                            n_parts=n_parts).materialize()
    # an all-filtered nlab leaves no block to infer a schema from — the
    # contract is known, state it for the downstream co-partitions
    tt = dict(zip(truth.schema().names, truth.schema().types))
    nlab_schema = pa.schema([("ref", tt[truth_ref_col]),
                             ("_entity", tt[truth_col])])

    def attach(side_col: str, out_col: str):
        def fn(p_df: pd.DataFrame, t_df: pd.DataFrame) -> pd.DataFrame:
            t = t_df.rename(columns={"ref": side_col, "_entity": out_col})
            return p_df.merge(t, on=side_col, how="inner")
        return fn

    cand_pairs = cand_pairs.select_columns(["a", "b"]).materialize()
    n_cand = cand_pairs.count()
    if n_cand == 0:
        tp = 0
    else:
        cs = dict(zip(cand_pairs.schema().names, cand_pairs.schema().types))
        with_a = partitioned_map2(cand_pairs, nlab,
                                  ["a"], ["ref"], attach("a", "_ea"),
                                  n_parts=n_parts,
                                  right_schema=nlab_schema)
        wa_schema = pa.schema([("a", cs["a"]), ("b", cs["b"]),
                               ("_ea", tt[truth_col])])
        with_b = partitioned_map2(with_a, nlab,
                                  ["b"], ["ref"], attach("b", "_eb"),
                                  n_parts=n_parts, left_schema=wa_schema,
                                  right_schema=nlab_schema)

        def count_tp(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"tp": [int((df["_ea"] == df["_eb"]).sum())]})

        tp_parts = with_b.map_batches(count_tp,
                                      batch_format="pandas").to_pandas()
        tp = int(tp_parts["tp"].sum()) if len(tp_parts) else 0

    truth_pairs = _group_pair_sum(nlab, ["_entity"], n_parts)
    n_refs = nodes.count()
    total = n_refs * (n_refs - 1) // 2

    def micro(num: int, den: int) -> int:
        return num * 1_000_000 // den if den > 0 else 1_000_000

    return pd.DataFrame({
        "n_refs": pd.Series([n_refs], dtype=np.int64),
        "total_pairs": pd.Series([total], dtype=np.int64),
        "cand_pairs": pd.Series([n_cand], dtype=np.int64),
        "tp_pairs": pd.Series([tp], dtype=np.int64),
        "truth_pairs": pd.Series([truth_pairs], dtype=np.int64),
        "rr_micro": pd.Series([micro(total - n_cand, total)],
                              dtype=np.int64),
        "pc_micro": pd.Series([micro(tp, truth_pairs)], dtype=np.int64),
        "pq_micro": pd.Series([micro(tp, n_cand)], dtype=np.int64),
    })


def pairwise_f1(pred_clusters: dict, truth_clusters: dict) -> dict:
    """Pairwise precision/recall/F1 between two {item: cluster} labelings.

    Computed by counting same-cluster pairs via group sizes and the
    contingency intersection — O(n) memory, no pair enumeration."""
    from collections import Counter

    def pair_count(sizes) -> int:
        return sum(s * (s - 1) // 2 for s in sizes)

    pred_sizes = Counter(pred_clusters.values())
    truth_sizes = Counter(truth_clusters[k] for k in pred_clusters)
    both = Counter((pred_clusters[k], truth_clusters[k]) for k in pred_clusters)
    tp = pair_count(both.values())
    pp = pair_count(pred_sizes.values())
    ap = pair_count(truth_sizes.values())
    precision = tp / pp if pp else 1.0
    recall = tp / ap if ap else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp_pairs": tp, "pred_pairs": pp, "truth_pairs": ap}


def cluster_golden(clusters, transcripts, *, turn_ref_col: str = "conv_id",
                   text_col: str = "text", n_parts: int = 64):
    """Survivorship / golden-record rollup — the deliverable AFTER
    resolution: one row per entity cluster with its canonical member and
    merged integer stats. canonical_ref = MIN(ref) (the same deterministic
    survivor rule near_dedup_canonical and the cluster labeling use),
    n_members = member conversations, n_turns / text_chars = exact sums
    over every member's turns (codepoint counts — DuckDB length() parity
    pinned in tests).

    Distributed shape: per-batch partial (conv, n, chars) rows map-side
    combine the turn table, ONE conv-keyed co-partition attaches the
    cluster label, ONE cluster-keyed partition merges — corpus text is
    reduced to two ints per conversation before anything shuffles."""
    n_parts = join_partitions_cap(n_parts)

    def partial(df: pd.DataFrame) -> pa.Table:
        # codepoint counts vectorized ONCE, then a plain groupby sum —
        # no per-group Python; Arrow output so partitioned_map2 sees
        # pa.DataTypes (a pandas block schema carries numpy dtypes)
        tmp = pd.DataFrame({
            turn_ref_col: df[turn_ref_col],
            "_c": df[text_col].fillna("").str.len().astype(np.int64)})
        g = tmp.groupby(turn_ref_col, sort=False)["_c"]
        out = g.agg(n_turns="size", text_chars="sum").reset_index()
        out["n_turns"] = out["n_turns"].astype(np.int64)
        out["text_chars"] = out["text_chars"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    stats = transcripts.select_columns([turn_ref_col, text_col]) \
        .map_batches(partial, batch_format="pandas")

    def attach(c_df: pd.DataFrame, s_df: pd.DataFrame) -> pd.DataFrame:
        s = s_df.groupby(turn_ref_col, sort=False).sum().reset_index() \
            .rename(columns={turn_ref_col: "ref"})
        return c_df.merge(s, on="ref", how="inner")

    joined = partitioned_map2(
        clusters.select_columns(["ref", "cluster_id"]), stats,
        ["ref"], [turn_ref_col], attach, n_parts=n_parts)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster_id", sort=False)
        out = g.agg(canonical_ref=("ref", "min"),
                    n_members=("ref", "size"),
                    n_turns=("n_turns", "sum"),
                    text_chars=("text_chars", "sum")).reset_index()
        for c in ["n_members", "n_turns", "text_chars"]:
            out[c] = out[c].astype(np.int64)
        return out

    return partitioned_map(joined, ["cluster_id"], merge, n_parts=n_parts)
