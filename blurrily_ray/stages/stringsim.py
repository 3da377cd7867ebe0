"""Exact Jaro-Winkler verification of blocked candidate pairs.

The second classic verify metric of the record-linkage cascade (the
first — exact Levenshtein — lives in stages/editdist.py): blurrily's
shared-trigram count (reference storage.c:477-580) is a cheap filter;
Winkler's prefix-boosted Jaro similarity (Winkler 1990, building on
Jaro 1989) is the field-standard acceptance score for short-to-medium
linkage strings. This stage verifies the blocked candidates with an
EXACT Jaro-Winkler score so the final match set is defined by a true
string metric, symmetric with the Levenshtein verify.

Dataflow is identical to editdist (shared attach plumbing,
editdist.attach_texts_and_verify): only candidate EDGES and each
survivor's two normalized strings move; the verify is a pure map
(broadcast mode — zero shuffles) or two co-partition exchanges of
edge-sized data (join mode). The kernel is bit-parallel: the Jaro
matching scan resolves each s1 position's lowest unmatched in-window
s2 match with one AND + lowest-set-bit over a Python big-int posting
mask (the same unbounded-word trick as editdist.myers_distance), so a
~300-char pair costs ~l1 word-ops, not O(l1·window) character probes.

Dialect: bit-for-bit equal to DuckDB's ``jaro_winkler_similarity``
(fuzz-pinned in tests/test_stringsim.py over 4k+ random pairs):
matching window ``max(l1,l2)//2 - 1``, transpositions = half the
mismatched positions among matched chars (integer halving), prefix
boost ``sim + min(4, prefix)·0.1·(1-sim)`` applied only when
``sim > 0.7``, and BOTH-empty → 0.0 (DuckDB's convention, not the
textbook 1.0).

Oracle: DuckDB ``jaro_winkler_similarity()`` over the same
blocked-edge CTE (oracles.sql_jw_pairs); scores exported as micro-ints
``FLOOR(jw·1e6)`` — exact because the float64s agree bitwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from blurrily_ray.config import ERConfig
from blurrily_ray.stages.editdist import (PAIR_MODE, attach_texts_and_verify,
                                          normalized_texts)

__all__ = ["jaro_winkler", "jw_verify_edges", "jw_verify_pairs"]


def jaro_winkler(s1: str, s2: str) -> float:
    """Exact Jaro-Winkler similarity, DuckDB dialect (see module doc).

    Bit-parallel matching phase: Peq[c] holds the s2-position mask of
    character c; position i of s1 claims the lowest set bit of
    ``Peq[s1[i]] & window_mask(i) & ~used`` — identical to the textbook
    first-unmatched-in-window scan, one big-int op per position."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0  # DuckDB: empty vs anything (incl. empty) scores 0
    if s1 == s2:
        return 1.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0

    peq: dict[str, int] = {}
    bit = 1
    for ch in s2:
        peq[ch] = peq.get(ch, 0) | bit
        bit <<= 1

    used = 0
    a_chars: list[str] = []
    for i, ch in enumerate(s1):
        mask = peq.get(ch)
        if mask is None:
            continue
        lo = i - window
        if lo < 0:
            lo = 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        cand = mask & ~used & ((1 << hi) - (1 << lo))
        if cand:
            used |= cand & -cand
            a_chars.append(ch)
    m = len(a_chars)
    if m == 0:
        return 0.0

    # transpositions: matched chars of s2 in j-order vs of s1 in i-order
    t = 0
    k = 0
    u = used
    while u:
        j = (u & -u).bit_length() - 1
        if s2[j] != a_chars[k]:
            t += 1
        k += 1
        u &= u - 1
    t //= 2

    sim = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if sim > 0.7:
        pl = 0
        for x, y in zip(s1, s2):
            if x == y and pl < 4:
                pl += 1
            else:
                break
        sim += pl * 0.1 * (1.0 - sim)
    return sim


def jw_verify_edges(edges, texts, *, min_sim: float = 0.8,
                    n_parts: int = 64, weights_are_lengths: bool = False,
                    mode: str = "auto",
                    broadcast_limit_bytes: int = 256 << 20):
    """Attach both sides' normalized text to (a, b, matches) candidate
    edges and keep those with Jaro-Winkler similarity ≥ ``min_sim``.
    Output columns: (a, b, matches, jw_micro) with jw_micro =
    FLOOR(jw·1e6) as int64 (bit-safe vs the oracle — float64s agree).

    Exact length prefilter (only when ``weights_are_lengths`` — the
    docset weights are the engine-default normalized lengths): with
    mn = min(l1, l2) matches, zero transpositions and the maximal
    4-char prefix boost,

        jw ≤ boost(ub),  ub = (mn/l1 + mn/l2 + 1)/3

    so a pair whose bound is below ``min_sim`` cannot survive; it drops
    BEFORE the attach exchange / matching scan. A 1e-9 slack absorbs
    the bound's own float rounding (never a false drop; the survivor
    set is re-thresholded exactly after the true score)."""
    import pyarrow as pa

    def prefilter(t: pa.Table) -> pa.Table:
        names = set(t.column_names)
        if not (weights_are_lengths and {"weight_a", "weight_b"} <= names):
            return t
        la = t["weight_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        lb = t["weight_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        mn = np.minimum(la, lb)
        with np.errstate(divide="ignore", invalid="ignore"):
            ub = (mn / la + mn / lb + 1.0) / 3.0
        ub = np.where(np.isfinite(ub), ub, 1.0)  # len-0 side: kernel decides
        boosted = np.where(ub > 0.7, ub + 0.4 * (1.0 - ub), ub)
        return t.filter(pa.array(boosted >= min_sim - 1e-9))

    edges = edges.map_batches(prefilter, batch_format="pyarrow")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"a": pd.Series([], dtype=df["a"].dtype),
                                 "b": pd.Series([], dtype=df["b"].dtype),
                                 "matches": pd.Series([], dtype=np.int64),
                                 "jw_micro": pd.Series([], dtype=np.int64)})
        ta = df["_ta"].to_numpy(dtype=object)
        tb = df["_tb"].to_numpy(dtype=object)
        keep = np.zeros(len(df), dtype=bool)
        micro = np.zeros(len(df), dtype=np.int64)
        for i in range(len(df)):
            jw = jaro_winkler(ta[i], tb[i])
            if jw >= min_sim:
                keep[i] = True
                micro[i] = int(np.floor(jw * 1e6))
        out = df.loc[keep, ["a", "b", "matches"]].copy()
        out["jw_micro"] = micro[keep]
        return out

    return attach_texts_and_verify(edges, texts, verify, mode=mode,
                                   n_parts=n_parts,
                                   broadcast_limit_bytes=broadcast_limit_bytes)


def jw_verify_pairs(docs, *, min_sim: float = 0.8,
                    cfg: ERConfig = PAIR_MODE,
                    ref_col: str = "doc_id", text_col: str = "text"):
    """Blocking + trigram scoring + EXACT Jaro-Winkler verify over one
    document table: (a, b, matches, jw_micro) with jw ≥ ``min_sim``.

    Same candidate-edge composition as editdist.edit_verify_pairs (the
    broadcast one-shuffle path); a beyond-broadcast corpus produces its
    edges through the sharded ER engine and verifies them with
    :func:`jw_verify_edges` directly."""
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           docsets_bitsets_ref,
                                           score_pairs_fused,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docsets = docsets_from_docs(docs, ref_col=ref_col,
                                text_col=text_col).materialize()
    hist = trigram_histogram(docsets)
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, hist, cfg, lut_ref=lut_ref)
    pairs, _skew = candidate_pairs_fused_blocking(keys, cfg, int_refs=True)
    edges = score_pairs_fused(pairs, cfg=cfg, lut_ref=lut_ref,
                              surrogate=True, packed=True)
    texts = normalized_texts(docs, ref_col=ref_col, text_col=text_col)
    return jw_verify_edges(edges, texts, min_sim=min_sim,
                           weights_are_lengths=True)
