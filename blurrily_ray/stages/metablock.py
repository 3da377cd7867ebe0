"""Meta-blocking: weighted edge pruning over the blocking graph.

Papadakis et al., "Meta-Blocking: Taking Entity Resolution to the Next
Level" (TKDE 2014): instead of scoring every blocking-generated
candidate, first build the BLOCKING GRAPH — one node per record, one
edge per co-blocked pair, weighted by co-occurrence evidence — and
prune low-evidence edges before any (comparatively expensive) pairwise
similarity work. This module implements the CBS weighting scheme
(Common Blocks Scheme: edge weight = number of blocks the pair
co-occurs in) with WEP (Weighted Edge Pruning: discard every edge whose
weight is strictly below the global mean edge weight).

Relationship to the rest of the engine: the ER pipeline's `min_cokeys`
(config.py) is a FIXED-floor version of the same co-occurrence
evidence; WEP replaces the fixed floor with the data-adaptive mean, the
standard meta-blocking baseline. It therefore operates on the FULL
blocking graph (weight ≥ 1 edges included — no min_cokeys precut), so
its output is comparable to the published algorithm, not to the
pipeline's tuned heuristic.

Exactness: weights are exact integer co-key counts (the fused pair
generation already emits per-partition (ab, n) partial counts whose sum
is the global count — the min_cokeys machinery, pinned by
test_cokey_count_partition_invariant), and the mean comparison is the
integer cross-multiplication ``w · n_edges ≥ Σw`` — no float division,
so the DuckDB mirror (oracles.sql_meta_wep) matches bit-for-bit.
Overflow: w ≤ C(pair_rarest, 2) = 66 co-keys per pair, so ``w · n``
and ``Σw`` stay under 2⁶³ up to ~10¹⁷ graph edges.

100-TB shape: ONE extra keyed exchange beyond blocking itself (the
(ab, n) blob shuffle the scorer would pay anyway), a ≤-one-row-per-block
combiner for the global (Σw, n) totals, and a pure filter map with the
broadcast ref LUT fetched once per worker for string restoration.
Nothing corpus-sized touches the driver; the pruned edge stream is the
output. Reference semantics anchor: storage.c:477-580 scores ALL
blocked candidates — meta-blocking is the published scale answer to
exactly that cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from blurrily_ray.config import ERConfig
from blurrily_ray.stages.editdist import PAIR_MODE


def cbs_edge_weights(raw_pairs, *, n_parts: int | None = None):
    """Collapse the packed (ab, n) raw pair stream into the DISTINCT
    blocking-graph edge list with exact CBS weights: one hash exchange
    on ab (all of a pair's partial counts colocate), per-partition sum.
    Returns a Dataset of (ab:int64, w:int64)."""
    import ray as _ray

    from blurrily_ray.stages.common import partitioned_map

    if n_parts is None:
        n_cpus = int(_ray.cluster_resources().get("CPU", 8))
        n_parts = max(8, 8 * n_cpus)

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ab", sort=False)["n"].sum()
        return pd.DataFrame({"ab": g.index.to_numpy(dtype=np.int64),
                             "w": g.to_numpy(dtype=np.int64)})

    return partitioned_map(raw_pairs, ["ab"], collapse, n_parts=n_parts,
                           packed_cols={"ab": np.int64, "n": np.uint16})


def wep_prune(cbs_edges, lut_ref, *, ref_type: pa.DataType):
    """Weighted Edge Pruning: keep edges with ``w ≥ mean(w)`` (integer
    cross-multiplication), restore surrogate ids to refs via the
    broadcast LUT (fetched once per worker). ``cbs_edges`` is the
    (ab, w) output of :func:`cbs_edge_weights` (materialized by the
    caller — it is consumed twice: totals combiner + filter pass)."""
    import ray as _ray
    import ray.data as rd

    from blurrily_ray.stages.pairs import _cached_get

    if cbs_edges.schema() is None:  # empty corpus: no block ever emitted
        return rd.from_arrow(pa.table({
            "a": pa.array([], type=ref_type),
            "b": pa.array([], type=ref_type),
            "cbs": pa.array([], type=pa.int64())}))

    def totals(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(w.sum())], pa.int64()),
                         "c": pa.array([len(w)], pa.int64())})

    td = cbs_edges.map_batches(totals, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    s = int(td["s"].sum()) if "s" in td.columns else 0
    c = int(td["c"].sum()) if "c" in td.columns else 0

    def keep(t: pa.Table) -> pa.Table:
        ref_sorted = _cached_get(lut_ref)[0]
        ab = t["ab"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        m = w * np.int64(c) >= np.int64(s)
        ab, w = ab[m], w[m]
        a = ref_sorted[(ab >> np.int64(32)).astype(np.int64)]
        b = ref_sorted[(ab & np.int64(0xFFFFFFFF)).astype(np.int64)]
        return pa.table({"a": pa.array(a, type=ref_type),
                         "b": pa.array(b, type=ref_type),
                         "cbs": pa.array(w, type=pa.int64())})

    return cbs_edges.map_batches(keep, batch_format="pyarrow")


def cnp_prune(cbs_edges, lut_ref, *, k: int, reciprocal: bool = False,
              ref_type: pa.DataType, n_parts: int | None = None):
    """Cardinality Node Pruning (Papadakis et al.): each node retains its
    top-``k`` incident edges by CBS weight (RANK semantics — boundary
    ties are all kept, so the result is deterministic under any
    partitioning); an edge survives if retained by EITHER endpoint
    (redefined CNP, the paper's higher-recall variant) or, with
    ``reciprocal=True``, only if retained by BOTH (BLAST-style, higher
    precision). Two edge-sized packed exchanges: node-keyed for the
    per-node ranks, ab-keyed to combine the two endpoint verdicts."""
    import ray as _ray
    import ray.data as rd

    from blurrily_ray.stages.common import partitioned_map
    from blurrily_ray.stages.pairs import _cached_get

    if cbs_edges.schema() is None:
        return rd.from_arrow(pa.table({
            "a": pa.array([], type=ref_type),
            "b": pa.array([], type=ref_type),
            "cbs": pa.array([], type=pa.int64())}))

    if n_parts is None:
        n_cpus = int(_ray.cluster_resources().get("CPU", 8))
        n_parts = max(8, 8 * n_cpus)

    def explode(t: pa.Table) -> pa.Table:
        ab = t["ab"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        node = np.concatenate([(ab >> np.int64(32)),
                               (ab & np.int64(0xFFFFFFFF))])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "ab": pa.array(np.concatenate([ab, ab]), pa.int64()),
                         "w": pa.array(np.concatenate([w, w]), pa.int64())})

    ex = cbs_edges.map_batches(explode, batch_format="pyarrow")

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        r = df.groupby("node", sort=False)["w"].rank(method="min",
                                                     ascending=False)
        return pd.DataFrame({"ab": df["ab"].to_numpy(dtype=np.int64),
                             "w": df["w"].to_numpy(dtype=np.int64),
                             "f": (r.to_numpy() <= k).astype(np.int64)})

    flags = partitioned_map(
        ex, ["node"], flag, n_parts=n_parts,
        packed_cols={"node": np.int32, "ab": np.int64, "w": np.uint16})

    need = 2 if reciprocal else 1

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ab", sort=False).agg(w=("w", "first"),
                                             nf=("f", "sum"))
        g = g[g["nf"] >= need]
        ref_sorted = _cached_get(lut_ref)[0]
        ab = g.index.to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "a": ref_sorted[(ab >> np.int64(32)).astype(np.int64)],
            "b": ref_sorted[(ab & np.int64(0xFFFFFFFF)).astype(np.int64)],
            "cbs": g["w"].to_numpy(dtype=np.int64)})

    return partitioned_map(
        flags, ["ab"], combine, n_parts=n_parts,
        packed_cols={"ab": np.int64, "w": np.uint16, "f": np.uint8})


def _cbs_graph(docs, cfg: ERConfig, ref_col: str, text_col: str):
    """Shared prelude of both pruning schemes: docsets → blocking keys →
    fused pair generation → CBS edge weights. Returns (cbs_edges
    Dataset, lut_ref, output ref type)."""
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           docsets_bitsets_ref,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docsets = docsets_from_docs(docs, ref_col=ref_col,
                                text_col=text_col).materialize()
    ref_type = _ref_type_of(docsets, docs, ref_col)
    hist = trigram_histogram(docsets)
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, hist, cfg, lut_ref=lut_ref)
    raw, _ = candidate_pairs_fused_blocking(keys, cfg, int_refs=True)
    return cbs_edge_weights(raw), lut_ref, ref_type


def meta_block_cnp(docs, cfg: ERConfig = PAIR_MODE, *, k: int = 5,
                   reciprocal: bool = False, ref_col: str = "doc_id",
                   text_col: str = "text"):
    """CBS-weighted blocking graph + cardinality node pruning over one
    document table: (a, b, cbs) for pairs retained in the top-``k``
    incident edges (by exact co-key weight, boundary ties kept) of at
    least one endpoint — or both with ``reciprocal=True`` (oracle:
    oracles.sql_meta_cnp)."""
    cbs, lut_ref, ref_type = _cbs_graph(docs, cfg, ref_col, text_col)
    return cnp_prune(cbs, lut_ref, k=k, reciprocal=reciprocal,
                     ref_type=ref_type)


def _ref_type_of(docsets, docs, ref_col: str) -> pa.DataType:
    dsch = docsets.schema()
    if dsch is not None:
        return dict(zip(dsch.names, dsch.types))["ref"]
    insch = docs.schema()  # empty corpus: no docset block to infer from
    t = (dict(zip(insch.names, insch.types)).get(ref_col)
         if insch is not None else None)
    return t if isinstance(t, pa.DataType) else pa.string()


def meta_block_wep(docs, cfg: ERConfig = PAIR_MODE, *,
                   ref_col: str = "doc_id", text_col: str = "text"):
    """CBS-weighted blocking graph + WEP over one document table:
    (a, b, cbs) for every co-blocked pair whose co-key count is at least
    the global mean — the meta-blocking pre-filter a downstream verify
    (editdist / jw / wjaccard) would consume in place of the full
    candidate set (oracle: oracles.sql_meta_wep)."""
    cbs, lut_ref, ref_type = _cbs_graph(docs, cfg, ref_col, text_col)
    return wep_prune(cbs.materialize(), lut_ref, ref_type=ref_type)
