"""Rarity-weighted trigram Jaccard — IDF-style similarity scoring.

The reference scores a pair by its RAW shared-trigram count
(storage.c:477-580): every trigram is worth the same, so two documents
sharing 40 copies of boilerplate ('the', 'ing') score like two sharing
40 rare tokens. Production linkage weights each feature by rarity
(TF-IDF / Cohen's soft-TF-IDF family): a shared trigram that appears in
3 documents is evidence, one that appears in half the corpus is noise.
This stage adds that scorer over the same blocked candidate edges:

    w(t)          = ⌊N · 10⁶ / df(t)⌋          (rarity weight, int64)
    wjac(a, b)    = Σ_{t∈A∩B} w(t) / (Σ_{t∈A} w(t) + Σ_{t∈B} w(t)
                                      − Σ_{t∈A∩B} w(t))

i.e. the weighted-Jaccard resemblance of the two trigram SETS under
rarity weights — a monotone-in-idf reweighting kept RATIONAL on purpose:
with integer weights every sum is an exact int64 and the score exports
as one BIGINT floor division, so the engine and the DuckDB oracle agree
bit-for-bit with no float summation-order or libm-ulp hazard (the same
micro-int convention as bm25/fs; a log-idf variant would differ only by
the monotone transform and would need repr-pinned float literals).

Dataflow (100-TB shape): df(t) is the existing trigram histogram — a
21,952-bin combiner, 172 KB broadcast regardless of corpus size. The
candidate edges come from the standard one-shuffle blocking + scoring;
the per-side trigram sets attach with the decontaminate-precedent
size-gated duality: broadcast (ref → codes LUT fetched once per worker,
verify is a pure map) under the gate, two edge-sized co-partition
exchanges beyond it. Nothing quadratic, nothing corpus-sized on the
driver past the gate.

Overflow: w(t) ≤ N·10⁶ and per-doc sums stay < 2⁶³ up to ~3·10⁹ docs
at 300 trigrams/doc; the final ×10⁶ product runs in Python ints (engine)
and HUGEINT (oracle), both exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from blurrily_ray.config import ERConfig
from blurrily_ray.functions.trigram import NUM_TRIGRAMS
from blurrily_ray.stages.editdist import PAIR_MODE

MICRO = 1_000_000


def rarity_weights(hist: np.ndarray, n_docs: int) -> np.ndarray:
    """Dense trigram → weight table: w(t) = ⌊n_docs · 10⁶ / df(t)⌋
    (0 for trigrams absent from the corpus). 172 KB, exact int64."""
    w = np.zeros(NUM_TRIGRAMS, dtype=np.int64)
    nz = hist > 0
    w[nz] = (np.int64(n_docs) * MICRO) // hist[nz]
    return w


def _pair_scores(ta, tb, wv, min_micro: int):
    """Per-row exact weighted-Jaccard micro-ints over two object arrays
    of sorted-unique trigram-code arrays. Returns (keep_mask, micro)."""
    n = len(ta)
    keep = np.zeros(n, dtype=bool)
    micro = np.zeros(n, dtype=np.int64)
    for i in range(n):
        a = np.asarray(ta[i], dtype=np.int64)
        b = np.asarray(tb[i], dtype=np.int64)
        sa = int(wv[a].sum())
        sb = int(wv[b].sum())
        sh = int(wv[np.intersect1d(a, b, assume_unique=True)].sum())
        den = sa + sb - sh
        if den <= 0:
            continue  # both sides empty — unreachable via blocking
        m = (sh * MICRO) // den
        if m >= min_micro:
            keep[i] = True
            micro[i] = m
    return keep, micro


def wjac_verify_edges(edges, docsets, w: np.ndarray, *, min_micro: int,
                      n_parts: int = 64, mode: str = "auto",
                      broadcast_limit_bytes: int = 256 << 20):
    """Attach both sides' trigram sets to (a, b, matches) candidate edges
    and score each with the rarity-weighted Jaccard; keep those at
    ``wjac_micro ≥ min_micro``.

    ``docsets`` is the (ref, tris, weight) table the blocking already
    built (trigram sets are its native column — no re-tokenization);
    ``w`` the :func:`rarity_weights` table (broadcast once via ray.put,
    fetched per worker). Broadcast/join duality as
    editdist.attach_texts_and_verify; the join path ships each side's
    code arrays through one edge-sized co-partition exchange."""
    import ray

    from blurrily_ray.stages.pairs import _cached_get

    w_ref = ray.put(w)
    out_cols = ["a", "b", "matches", "wjac_micro"]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "a": pd.Series([], dtype=object),
                "b": pd.Series([], dtype=object),
                "matches": pd.Series([], dtype=np.int64),
                "wjac_micro": pd.Series([], dtype=np.int64)})
        wv = _cached_get(w_ref)
        keep, micro = _pair_scores(df["_ta"].to_numpy(dtype=object),
                                   df["_tb"].to_numpy(dtype=object),
                                   wv, min_micro)
        out = df.loc[keep, ["a", "b", "matches"]].copy()
        out["wjac_micro"] = micro[keep]
        return out

    if mode == "auto":
        # ~8 B/code × ~250 codes + ref ≈ 2 KB/doc as a python LUT
        mode = ("broadcast"
                if docsets.count() * 2048 <= broadcast_limit_bytes
                else "join")

    keep_cols = ["a", "b", "matches"]

    if mode == "broadcast":
        lut: dict = {}
        for batch in docsets.iter_batches(batch_size=None,
                                          batch_format="pyarrow"):
            refs = batch["ref"].to_pylist()
            tris = batch["tris"].combine_chunks()
            flat = tris.flatten().to_numpy(zero_copy_only=False)
            offs = tris.offsets.to_numpy()
            for k, r in enumerate(refs):
                lut[r] = flat[offs[k]:offs[k + 1]]
        lut_ref = ray.put(lut)

        def attach_and_score(df: pd.DataFrame) -> pd.DataFrame:
            t = _cached_get(lut_ref)
            df = df[keep_cols].copy()
            df["_ta"] = df["a"].map(t)
            df["_tb"] = df["b"].map(t)
            # inner semantics — an edge ref absent from docsets has no
            # set to score (same convention as the text attach)
            df = df[df["_ta"].notna() & df["_tb"].notna()]
            return kernel(df)

        return edges.map_batches(attach_and_score, batch_format="pandas")

    from blurrily_ray.stages.common import (join_partitions_cap,
                                            partitioned_map2)

    n_parts = join_partitions_cap(n_parts)
    sets = docsets.select_columns(["ref", "tris"])

    def attach(side_col: str, out_col: str):
        def fn(edge_df: pd.DataFrame, set_df: pd.DataFrame) -> pd.DataFrame:
            s = set_df.rename(columns={"ref": side_col, "tris": out_col})
            return edge_df.merge(s, on=side_col, how="inner")
        return fn

    step1 = partitioned_map2(
        edges.map_batches(lambda d: d[keep_cols], batch_format="pandas"),
        sets, ["a"], ["ref"], attach("a", "_ta"), n_parts=n_parts)
    step2 = partitioned_map2(
        step1, sets, ["b"], ["ref"], attach("b", "_tb"), n_parts=n_parts)
    return step2.map_batches(kernel, batch_format="pandas")


def wjac_pairs(docs, *, min_micro: int = 200_000,
               cfg: ERConfig = PAIR_MODE,
               ref_col: str = "doc_id", text_col: str = "text"):
    """Blocking + trigram scoring + rarity-weighted Jaccard over one
    document table: (a, b, matches, wjac_micro) with wjac_micro ≥
    ``min_micro`` — the IDF-weighted rescoring of the same candidate
    edges the Levenshtein/JW verifies consume (oracle:
    oracles.sql_wjac_pairs, exact BIGINT arithmetic end to end)."""
    import pyarrow.compute as pc

    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           docsets_bitsets_ref,
                                           score_pairs_fused,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docsets = docsets_from_docs(docs, ref_col=ref_col,
                                text_col=text_col).materialize()
    hist = trigram_histogram(docsets)

    # N = docs with ≥1 trigram (the oracle's COUNT(*) FROM ntri) — a doc
    # whose normalized text is too short for one window has no postings
    def nz(t: pa.Table) -> pa.Table:
        k = pc.sum(pc.cast(pc.greater(pc.list_value_length(t["tris"]), 0),
                           pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([int(k)], pa.int64())})

    ndf = docsets.map_batches(nz, batch_format="pyarrow").to_pandas()
    # empty input: no block ever reaches nz, so the frame has no columns
    n_docs = int(ndf["n"].sum()) if "n" in ndf.columns else 0

    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, hist, cfg, lut_ref=lut_ref)
    pairs, _skew = candidate_pairs_fused_blocking(keys, cfg, int_refs=True)
    edges = score_pairs_fused(pairs, cfg=cfg, lut_ref=lut_ref,
                              surrogate=True, packed=True)
    return wjac_verify_edges(edges, docsets, rarity_weights(hist, n_docs),
                             min_micro=min_micro)
