"""Corpus curation: the composed pretraining-data filter pipeline.

The single most common large-scale training-data job chains the repo's
text operators: quality counts → language filter → token-budget bounds →
exact dedup. This pipeline fuses the per-doc stats into ONE vectorized
map pass (one tokenization, not one per operator) and performs the only
shuffle on the content digest (uniform md5 keys — never on raw text), so
at 100 TB the corpus streams through a map and only (digest, id, tokens)
triples of the SURVIVORS move. All thresholds are integer comparisons so
the DuckDB oracle reproduces the kept set exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from blurrily_ray.stages.textstats import (
    LANGID_NUM,
    STOPWORDS,
    _PUNCT_RE,
    _segment_sum,
    _token_arrays,
    _tokens,
)


def curate_corpus(docs, *, id_col: str = "doc_id", text_col: str = "text",
                  min_tokens: int = 5, max_tokens: int = 10_000,
                  max_punct_pct: int = 20, n_parts: int = 64):
    """docs → (doc_id, n_tokens) of documents that survive the curation
    chain: predicted-English (stopword heuristic), ``min_tokens <=
    n_tokens <= max_tokens``, punctuation < ``max_punct_pct``% of chars,
    and first-by-id among exact-content duplicates."""

    def stats_and_filter(df: pd.DataFrame) -> pd.DataFrame:
        text = df[text_col].fillna("")
        flat, n_tok = _token_arrays(_tokens(text))
        fs = pd.Series(flat, dtype=object)
        is_stop = (fs.str.lower().isin(STOPWORDS).to_numpy(dtype=np.float64)
                   if len(fs) else np.empty(0))
        n_stop = _segment_sum(is_stop, n_tok)
        n_punct = text.str.count(_PUNCT_RE).to_numpy(dtype=np.int64)
        n_chars = text.str.len().to_numpy(dtype=np.int64)
        keep = ((n_tok >= min_tokens) & (n_tok <= max_tokens)
                & (n_stop * LANGID_NUM >= n_tok)
                & (n_punct * 100 <= max_punct_pct * n_chars))
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy()[keep],
            "_h": text[keep].map(
                lambda s: hashlib.md5(s.encode()).hexdigest()),
            "n_tokens": n_tok[keep],
        })
        return out

    def first_per_digest(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_h", sort=False).agg(
            **{id_col: (id_col, "min"), "n_tokens": ("n_tokens", "min")})
        return g.reset_index()[[id_col, "n_tokens"]]

    from blurrily_ray.stages.common import partitioned_map

    survivors = docs.map_batches(stats_and_filter, batch_format="pandas")
    return partitioned_map(survivors, ["_h"], first_per_digest,
                           n_parts=n_parts)


def curate_corpus_full(docs, *, id_col: str = "doc_id",
                       text_col: str = "text", min_tokens: int = 5,
                       max_tokens: int = 10_000, max_punct_pct: int = 20,
                       top_v: int = 20, max_mean_rank_x100: int = 1450,
                       contamination_den: int = 5, n_parts: int = 64):
    """The full composed pretraining-data curation chain: the
    ``curate_corpus`` quality+dedup base, MINUS benchmark-contaminated
    docs (shared-shingle fraction > 1/``contamination_den`` with the
    held-out md5-bucket split, or IN that split), MINUS rare-token-heavy
    docs (corpus-relative unigram mean rank × 100 > ``max_mean_rank_x100``
    — the integer cross-multiplied "perplexity" cap).

    Composition stays one-shuffle-per-stage: the three per-doc verdict
    streams are bit-tagged, unioned, and intersected with a SINGLE
    doc_id-keyed shuffle (sum of tag bits == full mask) — never a chain
    of pairwise joins.

    NB on the synthetic corpus: its ~30-word vocabulary saturates the
    3-gram shingle space as the corpus grows, so at sf >= 0.1 the
    held-out split legitimately shares most shingles with almost every
    doc and the contamination filter keeps little — the engine and the
    SQL oracle agree exactly at every scale (it is a data property, not
    an operator artifact); real corpora have heavy-tailed shingle
    distributions and keep the vast majority.
    """
    import pyarrow as pa

    from blurrily_ray.stages.common import partitioned_map
    from blurrily_ray.stages.dedup import decontaminate
    from blurrily_ray.stages.textstats import unigram_rank_score

    base = curate_corpus(docs, id_col=id_col, text_col=text_col,
                         min_tokens=min_tokens, max_tokens=max_tokens,
                         max_punct_pct=max_punct_pct, n_parts=n_parts)
    dec = decontaminate(docs, id_col=id_col, text_col=text_col)
    ur = unigram_rank_score(docs, id_col=id_col, text_col=text_col,
                            top_v=top_v)

    def tag(bit: int, keep_fn, n_tok_col=None):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = keep_fn(batch)
            kept = batch.filter(keep) if keep is not None else batch
            n = (kept[n_tok_col].cast(pa.int64()) if n_tok_col
                 else pa.array(np.zeros(len(kept), dtype=np.int64)))
            return pa.table({
                id_col: kept[id_col].cast(pa.int64()),
                "n_tokens": n,
                "bit": pa.array(np.full(len(kept), bit, dtype=np.int64))})
        return fn

    import pyarrow.compute as pc

    tagged = (
        base.map_batches(tag(1, lambda b: None, n_tok_col="n_tokens"),
                         batch_format="pyarrow")
        .union(dec.map_batches(tag(2, lambda b: pc.less_equal(
            pc.multiply(b["n_shared"].cast(pa.int64()),
                        pa.scalar(contamination_den, type=pa.int64())),
            b["n_shingles"].cast(pa.int64()))), batch_format="pyarrow"))
        .union(ur.map_batches(tag(4, lambda b: pc.less_equal(
            pc.multiply(b["sum_rank"].cast(pa.int64()),
                        pa.scalar(100, type=pa.int64())),
            pc.multiply(b["n_tokens"].cast(pa.int64()),
                        pa.scalar(max_mean_rank_x100, type=pa.int64())))),
            batch_format="pyarrow")))

    def intersect(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, as_index=False).agg(
            n_tokens=("n_tokens", "max"), bits=("bit", "sum"))
        g = g[g["bits"] == 7]
        return g[[id_col, "n_tokens"]]

    return partitioned_map(tagged, [id_col], intersect, n_parts=n_parts)
