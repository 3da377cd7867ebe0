"""Fellegi-Sunter probabilistic record linkage (JASA 1969).

The canonical probabilistic scorer of the record-linkage cascade: each
candidate pair gets a K-field agreement vector γ; under conditional
independence the match weight is Σ_k [ γ_k·ln(m_k/u_k) +
(1−γ_k)·ln((1−m_k)/(1−u_k)) ], where m_k = P(agree on field k | match)
and u_k = P(agree | non-match). The m/u parameters are learned
UNSUPERVISED by EM over the agreement-PATTERN histogram (Winkler 1988):
the E/M updates depend on the data only through the 2^K pattern counts,
so the distributed work is ONE streaming pass that bincounts patterns
per batch (a 2^K-long combiner row each) — the EM itself runs on the
driver over a constant-size table, deterministic given the corpus.

Agreement fields over blocked candidate edges (K = 3):

  g0  trigram agreement:  matches·100 ≥ 80·min(ntri_a, ntri_b)
      (the engine's exact shared-trigram score, integer predicate)
  g1  length agreement:   |weight_a − weight_b| ≤ 5
      (docset weights are the engine-default normalized lengths)
  g2  prefix agreement:   first 16 chars of the normalized texts equal

g0/g1 come straight off the scorer's edge columns; g2 attaches both
sides' normalized strings through the shared verify plumbing
(editdist.attach_texts_and_verify) — vectorized predicates, no per-pair
scan. Pattern = g0 + 2·g1 + 4·g2.

Scores export as micro-ints FLOOR(score·1e6); the oracle embeds the
engine's learned weights as repr-exact float64 literals (strtod
round-trip, the bm25 precedent) and evaluates the SAME fixed-order
float expression, so the compare is bit-safe. The pattern histogram
itself is fully SQL-oracled (integer predicates over the pairs CTE).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from blurrily_ray.config import ERConfig
from blurrily_ray.stages.editdist import (PAIR_MODE, attach_texts_and_verify,
                                          normalized_texts)

__all__ = ["fs_agreements", "fs_pattern_counts", "fs_em", "fs_weights",
           "fs_score_pairs", "N_FIELDS", "TRIGRAM_PCT", "LEN_TOL",
           "PREFIX_LEN"]

N_FIELDS = 3
TRIGRAM_PCT = 80   # g0: matches·100 ≥ TRIGRAM_PCT·min(ntri)
LEN_TOL = 5        # g1: |weight_a − weight_b| ≤ LEN_TOL
PREFIX_LEN = 16    # g2: 16-char normalized-prefix equality


def fs_agreements(edges, texts, **attach_kw):
    """(a, b, g0, g1, g2, pattern) for every candidate edge — the edge
    columns carry g0/g1; g2 needs the attached normalized strings."""
    def verify(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        if len(df):
            m = df["matches"].to_numpy(dtype=np.int64)
            na = df["ntri_a"].to_numpy(dtype=np.int64)
            nb = df["ntri_b"].to_numpy(dtype=np.int64)
            wa = df["weight_a"].to_numpy(dtype=np.int64)
            wb = df["weight_b"].to_numpy(dtype=np.int64)
            g0 = (m * 100 >= TRIGRAM_PCT * np.minimum(na, nb))
            g1 = np.abs(wa - wb) <= LEN_TOL
            ta = df["_ta"].str.slice(0, PREFIX_LEN)
            tb = df["_tb"].str.slice(0, PREFIX_LEN)
            g2 = (ta == tb).to_numpy()
        else:
            g0 = g1 = g2 = np.zeros(0, dtype=bool)
        g0 = g0.astype(np.int64)
        g1 = g1.astype(np.int64)
        g2 = g2.astype(np.int64)
        return pd.DataFrame({"a": a, "b": b, "g0": g0, "g1": g1, "g2": g2,
                             "pattern": g0 + 2 * g1 + 4 * g2})

    return attach_texts_and_verify(
        edges, texts, verify,
        extra_cols=["ntri_a", "ntri_b", "weight_a", "weight_b"],
        **attach_kw)


def fs_pattern_counts(agree_ds) -> np.ndarray:
    """Exact 2^K-long agreement-pattern histogram: per-batch bincount
    emits ONE fixed-size vector row; the driver sums ≤ n_blocks rows
    (the trigram_histogram combiner shape)."""
    import pyarrow as pa

    size = 1 << N_FIELDS

    def partial(batch: pa.Table) -> pa.Table:
        pat = batch["pattern"].to_numpy(zero_copy_only=False)
        counts = np.bincount(pat, minlength=size).astype(np.int64)
        return pa.table({"v": pa.array([counts], type=pa.list_(pa.int64()))})

    hist = np.zeros(size, dtype=np.int64)
    vecs = agree_ds.map_batches(partial, batch_format="pyarrow")
    for batch in vecs.iter_batches(batch_size=256, batch_format="pyarrow"):
        flat = batch["v"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        hist += flat.reshape(-1, size).sum(axis=0)
    return hist


_PATTERN_BITS = np.array(
    [[(p >> k) & 1 for k in range(N_FIELDS)] for p in range(1 << N_FIELDS)],
    dtype=np.float64)


def fs_em(counts: np.ndarray, *, iters: int = 100,
          clamp: float = 1e-6) -> dict:
    """Winkler-style EM over the pattern histogram — deterministic
    (fixed init p=0.1, m=0.9, u=0.1; fixed iteration count), O(2^K·iters)
    driver flops. Returns {'m', 'u', 'p'} with m/u clamped away from
    {0, 1} so the log-weights stay finite."""
    counts = np.asarray(counts, dtype=np.float64)
    n = counts.sum()
    if n == 0:
        return {"m": np.full(N_FIELDS, 0.9), "u": np.full(N_FIELDS, 0.1),
                "p": 0.1}
    g = _PATTERN_BITS  # (2^K, K)
    m = np.full(N_FIELDS, 0.9)
    u = np.full(N_FIELDS, 0.1)
    p = 0.1
    for _ in range(iters):
        pm = p * np.prod(np.where(g == 1, m, 1 - m), axis=1)
        pu = (1 - p) * np.prod(np.where(g == 1, u, 1 - u), axis=1)
        gamma = pm / np.maximum(pm + pu, 1e-300)
        wm = counts * gamma
        wu = counts * (1 - gamma)
        sm, su = wm.sum(), wu.sum()
        p = min(max(sm / n, clamp), 1 - clamp)
        m = np.clip((wm[:, None] * g).sum(axis=0) / max(sm, 1e-300),
                    clamp, 1 - clamp)
        u = np.clip((wu[:, None] * g).sum(axis=0) / max(su, 1e-300),
                    clamp, 1 - clamp)
    return {"m": m, "u": u, "p": p}


def fs_weights(m: np.ndarray, u: np.ndarray) -> np.ndarray:
    """(K, 2) float64: column 0 the agreement weight ln(m/u), column 1
    the disagreement weight ln((1−m)/(1−u))."""
    return np.stack([np.log(m / u), np.log((1 - m) / (1 - u))], axis=1)


def score_with_weights(agree_ds, weights: np.ndarray):
    """(a, b, pattern, fs_micro): the fixed-order float64 expression
    Σ_k [ g_k·w_k,agree + (1−g_k)·w_k,disagree ], floored to micro-ints.
    The oracle evaluates the SAME expression with the SAME float64
    literals, term order k = 0..K−1 — bit-identical on both sides."""
    w = np.asarray(weights, dtype=np.float64)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["a", "b", "pattern"]].copy()
        if not len(df):
            out["fs_micro"] = pd.Series([], dtype=np.int64)
            return out
        s = np.zeros(len(df), dtype=np.float64)
        for k in range(N_FIELDS):
            gk = df[f"g{k}"].to_numpy(dtype=np.float64)
            s = s + (gk * w[k, 0] + (1.0 - gk) * w[k, 1])
        out["fs_micro"] = np.floor(s * 1e6).astype(np.int64)
        return out

    return agree_ds.map_batches(score, batch_format="pandas")


def fs_candidates(docs, *, cfg: ERConfig = PAIR_MODE,
                  ref_col: str = "doc_id", text_col: str = "text"):
    """The ONE canonical FS candidate composition — blocking → fused
    pair generation → PRE-threshold ref restoration → agreement vectors
    (the classic reading: EM needs the non-match mass; thresholded edges
    would feed it only near-matches). fs_pattern_counts and
    fs_score_pairs must see the SAME pair set, so both routes call
    here."""
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           candidate_pairs_restored,
                                           docsets_bitsets_ref,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docsets = docsets_from_docs(docs, ref_col=ref_col,
                                text_col=text_col).materialize()
    hist = trigram_histogram(docsets)
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, hist, cfg, lut_ref=lut_ref)
    pairs, _ = candidate_pairs_fused_blocking(keys, cfg, int_refs=True)
    cand = candidate_pairs_restored(pairs, cfg, lut_ref=lut_ref)
    texts = normalized_texts(docs, ref_col=ref_col, text_col=text_col)
    return fs_agreements(cand, texts)


def fs_score_pairs(docs, *, cfg: ERConfig = PAIR_MODE,
                   ref_col: str = "doc_id", text_col: str = "text",
                   iters: int = 100):
    """Blocking + agreement vectors + unsupervised EM + FS scoring over
    one document table. Returns (scored_ds, params) where scored_ds is
    (a, b, pattern, fs_micro) and params carries the learned m/u/p and
    the (K, 2) weight matrix (the oracle-export surface)."""
    agree = fs_candidates(docs, cfg=cfg, ref_col=ref_col,
                          text_col=text_col).materialize()
    counts = fs_pattern_counts(agree)
    params = fs_em(counts, iters=iters)
    weights = fs_weights(params["m"], params["u"])
    params = dict(params, weights=weights, counts=counts)
    return score_with_weights(agree, weights), params
