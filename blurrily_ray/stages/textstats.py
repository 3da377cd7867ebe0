"""Text-analysis operators for training-data curation over a documents table.

Design rule for oracle-checkability: every operator's *output* is integers
and strings only (counts, not ratios) — ratios are derived by consumers.
Integer outputs hash identically between this engine and a DuckDB oracle;
float ratios would be hostage to rounding-mode differences.

All operators are vectorized map_batches stages (pandas str kernels /
hashlib); no shuffles.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# Fixed stopword list (also inlined into the SQL oracles — keep in sync).
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
             "that", "for", "on", "with", "as", "at", "by", "be", "this", "are")

# lang-id heuristic: English iff stopwords are ≥ 2% of tokens (integer
# comparison n_stop * 50 >= n_tokens so the oracle can reproduce it exactly).
LANGID_NUM = 50

_TOKEN_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[^a-zA-Z0-9\s]")


def _tokens(series: pd.Series) -> pd.Series:
    return series.fillna("").str.findall(_TOKEN_RE)


def token_count(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """(id, n_tokens): whitespace-delimited token count."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "n_tokens": _tokens(df[text_col]).str.len().astype(np.int64),
        })

    return docs.map_batches(fn, batch_format="pandas")


def _token_arrays(toks: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Series of token lists → (flat token array, per-row counts)."""
    counts = toks.str.len().to_numpy(dtype=np.int64)
    flat = (np.concatenate([np.asarray(t, dtype=object) for t in toks if t])
            if counts.sum() else np.empty(0, dtype=object))
    return flat, counts


def _segment_sum(values: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-row sums of a flattened ragged array — one bincount, no lambda."""
    out = np.zeros(len(counts), dtype=np.int64)
    if len(values):
        seg = np.repeat(np.arange(len(counts)), counts)
        out = np.bincount(seg, weights=values,
                          minlength=len(counts)).astype(np.int64)
    return out


# BPE-ish pre-tokenizer (GPT-2 style, ASCII-restricted so Python re and
# DuckDB's RE2 agree byte-for-byte: no \p{} classes, no lookahead).
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
_BPE_RE = re.compile(BPE_PATTERN)


def token_count_bpe(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """(id, n_bpe_tokens): BPE-style pre-tokenization count — the unit a
    GPT-2-family tokenizer would split further into subwords; the standard
    proxy for LLM training-token budgeting when no vocab is loaded."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "n_bpe_tokens": df[text_col].fillna("")
            .str.findall(_BPE_RE).str.len().astype(np.int64),
        })

    return docs.map_batches(fn, batch_format="pandas")


def quality_stats(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """(id, n_chars, n_tokens, sum_token_len, n_stop, n_punct) — the raw
    counts behind length / punctuation / stopword quality ratios.
    Token-level counts run on ONE flattened array per batch (vectorized
    pandas/numpy kernels, no per-row lambdas)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        text = df[text_col].fillna("")
        toks = _tokens(text)
        flat, counts = _token_arrays(toks)
        fs = pd.Series(flat, dtype=object)
        tok_len = fs.str.len().to_numpy(dtype=np.float64) if len(fs) \
            else np.empty(0)
        is_stop = fs.str.lower().isin(STOPWORDS).to_numpy(dtype=np.float64) \
            if len(fs) else np.empty(0)
        return pd.DataFrame({
            id_col: df[id_col],
            "n_chars": text.str.len().astype(np.int64),
            "n_tokens": counts,
            "sum_token_len": _segment_sum(tok_len, counts),
            "n_stop": _segment_sum(is_stop, counts),
            "n_punct": text.str.count(_PUNCT_RE).astype(np.int64),
        })

    return docs.map_batches(fn, batch_format="pandas")


def langid(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """(id, lang_pred): stopword-density n-gram-free heuristic — 'en' iff
    n_stop * LANGID_NUM >= n_tokens (and there is at least one token)."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(df[text_col])
        flat, n_tok = _token_arrays(toks)
        fs = pd.Series(flat, dtype=object)
        is_stop = fs.str.lower().isin(STOPWORDS).to_numpy(dtype=np.float64) \
            if len(fs) else np.empty(0)
        n_stop = _segment_sum(is_stop, n_tok)
        pred = np.where((n_tok > 0) & (n_stop * LANGID_NUM >= n_tok), "en", "unknown")
        return pd.DataFrame({id_col: df[id_col], "lang_pred": pred})

    return docs.map_batches(fn, batch_format="pandas")


def fingerprint(docs, *, id_col: str = "doc_id", text_col: str = "text",
                ngram: int = 5):
    """(id, fingerprint): document fingerprint = the minimum md5 hex digest
    over all word ``ngram``-grams (winnowing-style min-sampling); documents
    with fewer than ``ngram`` tokens hash their whole trimmed text."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # md5 once per DISTINCT n-gram of the batch (real corpora repeat
        # grams heavily), then per-doc segment-min — the min-md5 contract
        # doesn't require a digest per occurrence. Digest order == hex
        # order == big-endian 128-bit order, so the min runs on (hi, lo)
        # uint64 pairs: reduceat min on hi, tie-break min on lo among
        # hi-minima. Hex-encode only the winners.
        md5 = hashlib.md5
        texts = df[text_col].to_numpy(dtype=object)
        grams: list[str] = []
        counts = np.zeros(len(texts), dtype=np.int64)
        out = np.empty(len(texts), dtype=object)
        for i, t in enumerate(texts):
            words = _TOKEN_RE.findall(t or "")
            if len(words) < ngram:
                out[i] = md5((t or "").strip().encode()).hexdigest()
            else:
                counts[i] = len(words) - ngram + 1
                grams.extend(" ".join(words[j:j + ngram])
                             for j in range(counts[i]))
        if grams:
            uniq, inv = np.unique(np.asarray(grams, dtype=object),
                                  return_inverse=True)
            dig = b"".join(md5(g.encode()).digest() for g in uniq)
            du = np.frombuffer(dig, dtype=">u8").reshape(-1, 2) \
                   .astype(np.uint64)
            hi, lo = du[:, 0][inv], du[:, 1][inv]
            nz = counts > 0
            offs = np.concatenate(
                ([0], np.cumsum(counts[nz])[:-1])).astype(np.int64)
            seg = np.repeat(np.arange(int(nz.sum())), counts[nz])
            min_hi = np.minimum.reduceat(hi, offs)
            lo_m = np.where(hi == min_hi[seg], lo,
                            np.uint64(0xFFFFFFFFFFFFFFFF))
            min_lo = np.minimum.reduceat(lo_m, offs)
            out[np.nonzero(nz)[0]] = [
                f"{a:016x}{b:016x}"
                for a, b in zip(min_hi.tolist(), min_lo.tolist())]
        return pd.DataFrame({id_col: df[id_col], "fingerprint": out})

    return docs.map_batches(fn, batch_format="pandas")


def vocab_top_k(docs, *, text_col: str = "text", k: int = 100,
                lowercase: bool = True, n_parts: int = 64):
    """Corpus token-frequency table: the ``k`` most frequent tokens as
    (token, n), ordered (n DESC, token ASC).

    The 100-TB shape: every batch pre-aggregates to (token, partial n) —
    the shuffle moves one row per DISTINCT token per block, never one per
    occurrence; partitions merge their tokens vectorized and keep a local
    top-k (safe: the global top-k is a subset of the union of per-token-
    partition top-ks because each token lives in exactly one partition);
    only n_parts × k tiny rows reach the final sort."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(df[text_col])
        flat, _ = _token_arrays(toks)
        s = pd.Series(flat, dtype=object)
        if lowercase:
            s = s.str.lower()
        vc = s.value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype(np.int64)})

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "token"], ascending=[False, True],
                          kind="stable").head(k)
        g["n"] = g["n"].astype(np.int64)
        return g

    from blurrily_ray.stages.common import partitioned_map

    partials = docs.map_batches(partial, batch_format="pandas")
    local = partitioned_map(partials, ["token"], merge_topk,
                            n_parts=n_parts)
    if local.schema() is None:  # zero-block corpus: typed empty vocab
        from ray.data import from_arrow

        return from_arrow(pa.table({
            "token": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64())}))
    return local.sort(["n", "token"], descending=[True, False]).limit(k)


def repetition_stats(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """(id, n_bigrams, n_distinct_bigrams, max_bigram_count): word-bigram
    repetition signals per doc (Gopher-style quality rules derive their
    duplicate-n-gram fractions from these integer counts). Docs with
    fewer than 2 tokens report zeros.

    Vectorized: one (doc_idx, bigram) frame per batch, a single pandas
    groupby for counts — no shuffle (per-doc stats are map-local)."""
    from blurrily_ray.functions.trigram import _concat_ranges

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(df[text_col].str.lower())
        flat, counts = _token_arrays(toks)
        n = len(df)
        n_bg = np.maximum(counts - 1, 0)
        zeros = pd.DataFrame({
            id_col: df[id_col],
            "n_bigrams": n_bg.astype(np.int64),
            "n_distinct_bigrams": np.zeros(n, dtype=np.int64),
            "max_bigram_count": np.zeros(n, dtype=np.int64)})
        if int(n_bg.sum()) == 0:
            return zeros
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        idx = np.repeat(starts, n_bg) + _concat_ranges(n_bg)
        big = pd.DataFrame({
            "d": np.repeat(np.arange(n), n_bg),
            "b": pd.Series(flat[idx], dtype=object).str.cat(
                pd.Series(flat[idx + 1], dtype=object), sep=" "),
        })
        cnt = big.groupby(["d", "b"], sort=False).size()
        per_doc = cnt.groupby(level=0).agg(["count", "max"])
        zeros.loc[per_doc.index, "n_distinct_bigrams"] = \
            per_doc["count"].to_numpy().astype(np.int64)
        zeros.loc[per_doc.index, "max_bigram_count"] = \
            per_doc["max"].to_numpy().astype(np.int64)
        return zeros

    return docs.map_batches(fn, batch_format="pandas")


def group_quantiles(ds, *, group_col: str = "source",
                    value_col: str = "n_chars",
                    qs: tuple = ((25, 100), (50, 100), (75, 100), (95, 100))):
    """Exact per-group discrete quantiles of an integer column →
    one row per group: (group, q25, q50, q75, q95, n).

    100-TB shape: each batch pre-aggregates to (group, value, partial
    count), so the ONLY shuffle moves one row per distinct (group,
    value) per block — never one per input row — and every group's
    histogram lands whole in one partition where a cumulative-count
    scan finalizes it. Nothing is materialized on the driver; output is
    one row per group. Quantile rank uses DuckDB quantile_disc's rule,
    idx = ceil(q*n) - 1, in exact integer arithmetic.
    """
    from blurrily_ray.stages.common import partitioned_map

    qcols = [f"q{num * 100 // den}" for num, den in qs]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group_col, value_col], sort=False).size()
        out = g.reset_index()
        out.columns = [group_col, value_col, "n"]
        out["n"] = out["n"].astype(np.int64)
        return out

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        """All partial counts of every group hashed here are present:
        sum per (group, value), then a per-group cumulative scan."""
        empty = {group_col: pd.Series([], dtype=df[group_col].dtype)}
        empty.update({c: pd.Series([], dtype=np.int64)
                      for c in qcols + ["n"]})
        if len(df) == 0:
            return pd.DataFrame(empty)
        h = df.groupby([group_col, value_col], sort=True)["n"].sum() \
            .reset_index()
        rows = []
        for g, gdf in h.groupby(group_col, sort=True):
            cnt = gdf["n"].to_numpy()
            vals = gdf[value_col].to_numpy()  # sorted: groupby(sort=True)
            cum = np.cumsum(cnt)
            n = int(cum[-1])
            row = {group_col: g}
            for (num, den), qc in zip(qs, qcols):
                rank = (num * n + den - 1) // den  # 1-based ceil(q*n)
                row[qc] = int(vals[np.searchsorted(cum, max(rank, 1))])
            row["n"] = n
            rows.append(row)
        out = pd.DataFrame(rows, columns=[group_col] + qcols + ["n"])
        for c in qcols + ["n"]:
            out[c] = out[c].astype(np.int64)
        return out

    partials = ds.select_columns([group_col, value_col]) \
        .map_batches(partial, batch_format="pandas")
    return partitioned_map(partials, [group_col], finalize)


def unigram_rank_score(docs, *, id_col: str = "doc_id", text_col: str = "text",
                       top_v: int = 1000, n_parts: int = 64):
    """Corpus-relative quality score (KenLM-style filtering, integer-exact):
    rank every token by corpus frequency (rank 1 = most frequent, ties
    broken by token text; ranks beyond ``top_v`` are out-of-vocabulary at
    rank ``top_v``+1) and emit per doc the rank sum, token count, and OOV
    count. Rare-token-heavy docs score high — the standard "perplexity"
    filter signal with all-integer arithmetic so the DuckDB oracle
    bit-matches under any partitioning.

    Two passes, both scale-shaped: pass 1 is ``vocab_top_k`` (map-side
    combining, one row per distinct token per block crosses the shuffle;
    the materialized vocab is ≤ top_v rows — driver-small by construction);
    pass 2 broadcasts the rank table once via ``ray.put`` and scores each
    batch with one hash-index lookup + segment sums.
    """
    import ray

    from blurrily_ray.stages.pairs import _cached_get

    vocab = vocab_top_k(docs, text_col=text_col, k=top_v,
                        n_parts=n_parts).to_pandas()
    if "n" not in vocab.columns:  # zero-block corpus: empty vocab
        vocab = pd.DataFrame({"token": pd.Series(dtype=object),
                              "n": pd.Series(dtype=np.int64)})
    vocab = vocab.sort_values(["n", "token"], ascending=[False, True],
                              kind="stable").reset_index(drop=True)
    ref = ray.put(pd.Index(vocab["token"].to_numpy()))
    oov_rank = np.int64(top_v + 1)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        idx = _cached_get(ref)
        toks = _tokens(df[text_col])
        flat, counts = _token_arrays(toks)
        lowered = pd.Series(flat, dtype=object).str.lower().to_numpy()
        pos = idx.get_indexer(lowered) if len(lowered) else \
            np.empty(0, dtype=np.int64)
        ranks = np.where(pos >= 0, pos + 1, oov_rank).astype(np.int64)
        return pd.DataFrame({
            id_col: df[id_col],
            "sum_rank": _segment_sum(ranks, counts),
            "n_tokens": counts,
            "n_oov": _segment_sum((pos < 0).astype(np.int64), counts),
        })

    return docs.map_batches(score, batch_format="pandas")


def float_group_quantiles(ds, *, group_col: str, value_col: str,
                          scale: float = 1_000_000.0, qs=None):
    """Exact per-group discrete quantiles of a FLOAT column: values map
    to micro-unit integers ``floor(value * scale)`` per batch (a
    deterministic IEEE double expression both engines evaluate
    identically — the pricing_summary discipline), then the integer
    histogram-combine of :func:`group_quantiles` does the rest. Output
    quantiles are micro-units, keeping the oracled surface all-integer;
    the shuffle still moves one row per distinct (group, micro-value)
    per block, never one per event."""

    def to_micro(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # NULL/NaN values are SKIPPED, matching quantile_disc's NULL rule
        # (floor(NaN).astype(int64) would otherwise inject INT64_MIN)
        keep = ~np.isnan(v)
        return pa.table({
            group_col: batch[group_col].filter(pa.array(keep)),
            "value_micro": pa.array(
                np.floor(v[keep] * scale).astype(np.int64))})

    kw = {} if qs is None else {"qs": qs}
    return group_quantiles(ds.map_batches(to_micro, batch_format="pyarrow"),
                           group_col=group_col, value_col="value_micro",
                           **kw)


def collocations_top_k(docs, *, text_col: str = "text", k: int = 50,
                       n_parts: int = 64):
    """Collocation mining: the ``k`` most frequent word BIGRAMS with the
    corpus counts behind their PMI — (rank, w1, w2, n_pair, n_w1, n_w2),
    ordered (n_pair DESC, w1, w2). All-integer output; consumers derive
    PMI = log(n_pair · N / (n_w1 · n_w2)).

    100-TB shape (three map-side-combined passes, nothing corpus-sized
    anywhere): (1) per-block bigram partials → one row per DISTINCT
    bigram per block crosses the shuffle, per-partition merge keeps a
    local top-k (exact: each bigram lives in one partition), ≤ n_parts·k
    rows reach the driver; (2) the ≤2k winner WORDS broadcast back and
    one streamed pass sums only their unigram counts (≤2k rows per
    block); (3) tiny driver join."""
    import ray

    from blurrily_ray.stages.common import partitioned_map
    from blurrily_ray.stages.pairs import _cached_get

    # the shuffle key is the (w1, w2) COLUMN PAIR — never a packed string:
    # any single-string packing (e.g. w1 + '\x1f' + w2) is non-injective
    # when the separator can occur inside a \S+ token, silently merging
    # distinct bigrams' counts

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(df[text_col].str.lower())
        flat, counts = _token_arrays(toks)
        if not len(flat):
            return pd.DataFrame({"w1": pd.Series(dtype=object),
                                 "w2": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        ends = np.cumsum(counts)
        last = np.zeros(len(flat), dtype=bool)
        last[ends[counts > 0] - 1] = True  # no bigram across doc bounds
        g = pd.DataFrame({"w1": flat[~last], "w2": np.roll(flat, -1)[~last]}) \
            .groupby(["w1", "w2"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["w1", "w2"], sort=False, as_index=False)["n"].sum()
        g = g.sort_values(["n", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="stable").head(k)
        g["n"] = g["n"].astype(np.int64)
        return g

    partials = docs.map_batches(partial, batch_format="pandas")
    cand = partitioned_map(partials, ["w1", "w2"], merge_topk,
                           n_parts=n_parts).to_pandas()
    if "w1" not in cand.columns or not len(cand):
        return ray.data.from_arrow(pa.table({
            "rank": pa.array([], type=pa.int64()),
            "w1": pa.array([], type=pa.string()),
            "w2": pa.array([], type=pa.string()),
            "n_pair": pa.array([], type=pa.int64()),
            "n_w1": pa.array([], type=pa.int64()),
            "n_w2": pa.array([], type=pa.int64())}))
    cand = pd.DataFrame({"w1": cand["w1"], "w2": cand["w2"],
                         "n_pair": cand["n"].to_numpy()})
    cand = cand.sort_values(["n_pair", "w1", "w2"],
                            ascending=[False, True, True],
                            kind="stable").head(k).reset_index(drop=True)

    words = np.unique(np.concatenate([cand["w1"].to_numpy(dtype=object),
                                      cand["w2"].to_numpy(dtype=object)]))
    w_ref = ray.put(pd.Index(words))

    def unigram_partial(df: pd.DataFrame) -> pd.DataFrame:
        idx = _cached_get(w_ref)
        toks = _tokens(df[text_col].str.lower())
        flat, _ = _token_arrays(toks)
        pos = idx.get_indexer(flat) if len(flat) else np.empty(0, np.int64)
        hit = pos >= 0
        c = np.bincount(pos[hit], minlength=len(idx)).astype(np.int64)
        return pd.DataFrame({"wid": np.arange(len(idx), dtype=np.int64),
                             "c": c})

    uni = docs.map_batches(unigram_partial, batch_format="pandas") \
        .to_pandas()
    counts = uni.groupby("wid")["c"].sum()
    lookup = {words[int(i)]: int(v) for i, v in counts.items()}
    out = pd.DataFrame({
        "rank": np.arange(1, len(cand) + 1, dtype=np.int64),
        "w1": cand["w1"],
        "w2": cand["w2"],
        "n_pair": cand["n_pair"].astype(np.int64),
        "n_w1": cand["w1"].map(lookup).astype(np.int64),
        "n_w2": cand["w2"].map(lookup).astype(np.int64)})
    return ray.data.from_pandas(out)
