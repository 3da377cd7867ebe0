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
