"""Ranked retrieval over the corpus — BM25 top-k.

The reference engine ranks by shared-trigram count (storage.c:477-580);
a training-data pipeline additionally needs TERM-WEIGHTED retrieval
(finding the most relevant documents for a probe query: contamination
audits, eval-set mining, corpus exploration). This stage scores the
standard Okapi BM25 with the Lucene idf (always positive):

    idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
    s(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Two streamed passes, nothing corpus-sized off the object store:

1. corpus stats — each batch emits ≤ (n_terms + 2) partial rows
   (per-query-term doc-frequency counts + doc/length totals); the
   driver reduces them and computes the tiny idf table.
2. scoring — (terms, idf, avgdl, term→query postings) broadcast once
   via ray.put; each batch computes tf per (doc, term) with one
   bincount, expands to (doc, query) through the term→query postings,
   integer-sums MICRO-UNIT contributions and keeps a batch-local
   top-k per query (same lexsort ranking as index.find_many); the
   driver merges ≤ Q × k × n_blocks partial rows.

EXACTNESS: per-term contributions are floored to integer nano-units
(⌊contrib · 1e9⌋) BEFORE summing, so the per-(doc, query) score is an
order-independent integer sum — the same discipline as
relational.pricing_summary — and the floats that feed the floor are
reproducible IEEE doubles: idf comes from scalar math.log (libm, which
DuckDB's ln matches bit-for-bit on this platform — verified), and the
tf/length normalization uses one fixed association order mirrored
exactly by the SQL oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from blurrily_ray.stages.textstats import _token_arrays, _tokens

K1_DEFAULT = 1.2
B_DEFAULT = 0.75
MICRO = 1_000_000_000.0  # nano-unit scale for the integer score


def query_terms(queries: list[str]) -> list[np.ndarray]:
    """Per query: its DISTINCT lowercased whitespace tokens (qtf is not
    weighted — each distinct query term contributes once)."""
    out = []
    for q in queries:
        toks = _tokens(pd.Series([q]).str.lower()).iloc[0]
        out.append(np.unique(np.asarray(toks, dtype=object)))
    return out


def bm25_topk(docs, queries: list[str], *, id_col: str = "doc_id",
              text_col: str = "text", k: int = 10,
              k1: float = K1_DEFAULT, b: float = B_DEFAULT):
    """Top-``k`` docs per query by BM25. Returns
    ``(query, rank, id_col, score_micro)`` — rank 1-based in
    (score_micro DESC, id ASC) order; queries sharing no term with any
    doc emit no rows. ``score_micro`` is the integer nano-unit score."""
    import ray
    import ray.data

    from blurrily_ray.stages.pairs import _cached_get

    per_q = query_terms(queries)
    terms = sorted({t for ts in per_q for t in ts})
    n_t = len(terms)
    t_index = pd.Index(terms)
    # term → query postings (CSR over term id, tiny)
    tq_flat, tq_ids = [], []
    for qi, ts in enumerate(per_q):
        tq_flat.append(t_index.get_indexer(ts))
        tq_ids.append(np.full(len(ts), qi, dtype=np.int64))
    tq_t = (np.concatenate(tq_flat) if tq_flat
            else np.empty(0, np.int64))
    tq_q = (np.concatenate(tq_ids) if tq_ids
            else np.empty(0, np.int64))
    o = np.argsort(tq_t, kind="stable")
    tq_offs = np.zeros(n_t + 1, np.int64)
    if n_t:
        np.cumsum(np.bincount(tq_t, minlength=n_t), out=tq_offs[1:])
    tq_post = tq_q[o]

    idx_ref = ray.put(t_index)

    # ---- pass 1: N, Σdl, df per term (≤ n_t + 2 rows per block) ----
    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        ti = _cached_get(idx_ref)
        toks = _tokens(df[text_col].str.lower())
        flat, counts = _token_arrays(toks)
        tid = ti.get_indexer(flat) if len(flat) else np.empty(0, np.int64)
        doc_of = np.repeat(np.arange(len(df), dtype=np.int64), counts)
        hit = tid >= 0
        # df = docs CONTAINING the term: distinct (doc, term)
        pairs = (np.unique(doc_of[hit] * n_t + tid[hit])
                 if n_t and hit.any() else np.empty(0, np.int64))
        dfc = np.bincount(pairs % n_t, minlength=n_t) if n_t else \
            np.empty(0, np.int64)
        return pd.DataFrame({
            "tid": np.concatenate([np.arange(n_t, dtype=np.int64),
                                   [-1, -2]]),
            "v": np.concatenate([dfc.astype(np.int64),
                                 [len(df), int(counts.sum())]]),
        })

    stats = docs.map_batches(stats_partial, batch_format="pandas") \
        .to_pandas()
    if "tid" not in stats.columns:  # zero-block corpus
        stats = pd.DataFrame({"tid": pd.Series(dtype=np.int64),
                              "v": pd.Series(dtype=np.int64)})
    agg = stats.groupby("tid")["v"].sum()
    n_docs = int(agg.get(-1, 0))
    sum_dl = int(agg.get(-2, 0))
    if n_docs == 0 or n_t == 0:
        return ray.data.from_arrow(pa.table({
            "query": pa.array([], type=pa.string()),
            "rank": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "score_micro": pa.array([], type=pa.int64()),
        }))
    df_t = np.zeros(n_t, dtype=np.int64)
    present = agg.index[agg.index >= 0].to_numpy()
    df_t[present] = agg.loc[present].to_numpy()
    avgdl = float(sum_dl) / float(n_docs)
    # scalar libm log per term — bit-matches the SQL oracle's ln()
    idf = np.array([math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)
                    for d in df_t], dtype=np.float64)

    bc_ref = ray.put((t_index, idf, tq_offs, tq_post, list(queries)))
    n_q = len(queries)
    k1f, bf = float(k1), float(b)

    # ---- pass 2: streamed scoring + batch-local top-k ----
    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        ti, idf_a, offs, post, names = _cached_get(bc_ref)
        n_rows = len(df)
        toks = _tokens(df[text_col].str.lower())
        flat, counts = _token_arrays(toks)
        dl = counts  # tokens per doc
        tid = ti.get_indexer(flat) if len(flat) else np.empty(0, np.int64)
        doc_of = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        hit = tid >= 0
        keys = doc_of[hit] * n_t + tid[hit]
        tf_all = np.bincount(keys, minlength=n_rows * n_t)
        nz = np.nonzero(tf_all)[0]
        d_nz, t_nz = nz // n_t, nz % n_t
        tf = tf_all[nz].astype(np.float64)
        # association order mirrored EXACTLY by the SQL oracle:
        # idf * ((tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * (dl / avgdl))))
        denom = tf + k1f * ((1.0 - bf)
                            + bf * (dl[d_nz].astype(np.float64) / avgdl))
        contrib = idf_a[t_nz] * ((tf * (k1f + 1.0)) / denom)
        m = np.floor(contrib * MICRO).astype(np.int64)
        # expand per-term rows to (doc, query) through term→query postings
        plen = offs[t_nz + 1] - offs[t_nz]
        from blurrily_ray.functions.trigram import _concat_ranges
        gq = post[np.repeat(offs[t_nz], plen) + _concat_ranges(plen)]
        gd = np.repeat(d_nz, plen)
        gm = np.repeat(m, plen)
        # float-weight bincount sums integers exactly here: per-term
        # nano-scores are ≤ ~6e10 and query term counts are small, so
        # every partial sum stays far below 2^53
        gkeys = gd * n_q + gq
        score = np.bincount(gkeys, weights=gm,
                            minlength=n_rows * n_q).astype(np.int64)
        snz = np.nonzero(np.bincount(gkeys, minlength=n_rows * n_q))[0]
        sd, sq = snz // n_q, snz % n_q
        sm = score[snz]
        ids = df[id_col].to_numpy()
        so = np.lexsort((ids[sd], -sm, sq))
        qs = sq[so]
        starts = np.zeros(len(qs), dtype=np.int64)
        if len(qs):
            grp = np.nonzero(np.diff(qs))[0] + 1
            starts[grp] = grp
            np.maximum.accumulate(starts, out=starts)
        keep = so[(np.arange(len(qs)) - starts) < k]
        return pd.DataFrame({
            "query": np.asarray(names, dtype=object)[sq[keep]],
            id_col: ids[sd[keep]].astype(np.int64),
            "score_micro": sm[keep],
        })

    partials = docs.map_batches(score_batch, batch_format="pandas") \
        .to_pandas()  # ≤ Q × k × n_blocks rows by construction
    if "query" not in partials.columns:  # no query term hit any block
        partials = pd.DataFrame({"query": pd.Series(dtype=object),
                                 id_col: pd.Series(dtype=np.int64),
                                 "score_micro": pd.Series(dtype=np.int64)})
    partials = partials.sort_values(["query", "score_micro", id_col],
                                    ascending=[True, False, True],
                                    kind="stable")
    partials["rank"] = partials.groupby("query", sort=False).cumcount() + 1
    out = partials[partials["rank"] <= k].reset_index(drop=True)
    out = out[["query", "rank", id_col, "score_micro"]]
    out["rank"] = out["rank"].astype(np.int64)
    if not len(out):  # from_pandas of an empty frame drops the schema
        return ray.data.from_arrow(pa.table({
            "query": pa.array([], type=pa.string()),
            "rank": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "score_micro": pa.array([], type=pa.int64()),
        }))
    return ray.data.from_pandas(out)
