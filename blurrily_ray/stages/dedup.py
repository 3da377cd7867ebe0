"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hash material is md5-derived (functions/hashing.py) so a DuckDB oracle
can regenerate every signature bit-for-bit; outputs are integer/string
columns only.

Scale notes: exact dedup is a hash groupby (one shuffle, combinable);
MinHash banding turns near-dup search into a bucket groupby (shuffle keyed
by band hash — the LSH literature's standard map-reduce layout); candidate
verification re-computes exact Jaccard from the shingle sets via the same
broadcast/join duality as pair scoring (stages/pairs.py).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from blurrily_ray.functions.hashing import MERSENNE61, md5_num, minhash_params
from blurrily_ray.stages.pairs import _cached_get

_TOKEN_RE = re.compile(r"\S+")

# MinHash/LSH defaults — inlined into the SQL oracle; keep in sync.
NUM_PERM = 16
NUM_BANDS = 4  # 4 rows per band
SHINGLE_NGRAM = 3
JACCARD_THRESHOLD_NUM, JACCARD_THRESHOLD_DEN = 1, 2  # keep if inter*2 >= union
SIMHASH_BITS = 60  # 15 md5 hex chars → fits a signed int64


def exact_dedup(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the smallest id per identical text. Hash-partition by content
    digest (never by raw text — uniform keys, bounded groups)."""

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "_h": df[text_col].fillna("").map(
                lambda s: hashlib.md5(s.encode()).hexdigest()),
        })

    from ray.data.aggregate import Min

    return docs.map_batches(digest, batch_format="pandas") \
        .groupby("_h").aggregate(Min(id_col, alias_name=id_col)) \
        .select_columns([id_col])


def _shingles(text: str) -> list[str]:
    words = _TOKEN_RE.findall((text or "").lower())
    if len(words) < SHINGLE_NGRAM:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + SHINGLE_NGRAM])
            for i in range(len(words) - SHINGLE_NGRAM + 1)]


def _shingle_hashes(text: str) -> np.ndarray:
    """Distinct md5_number-mod-p hashes of the doc's shingles (aligned with
    DuckDB's md5_number so the SQL oracle reproduces them)."""
    hs = {md5_num(s) % MERSENNE61 for s in _shingles(text)}
    return np.array(sorted(hs), dtype=np.uint64)


def minhash_signatures(docs, *, id_col: str = "doc_id", text_col: str = "text",
                       num_perm: int = NUM_PERM, seed: int = 42):
    """(id, sig: list<int64>) MinHash signatures over word-shingle sets.

    The (a*h+b) mod p math runs in Python ints per doc (exact, matches the
    DuckDB HUGEINT oracle); a 128-bit-split vectorized mulmod is the drop-in
    for the 10^12-scale path.
    """
    a, b = minhash_params(num_perm, seed)
    a_list = [int(x) for x in a]
    b_list = [int(x) for x in b]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        sigs = []
        for text in df[text_col]:
            hs = [int(h) for h in _shingle_hashes(text)]
            if not hs:
                sigs.append([0] * num_perm)
                continue
            sigs.append([min((ai * h + bi) % MERSENNE61 for h in hs)
                         for ai, bi in zip(a_list, b_list)])
        return pd.DataFrame({id_col: df[id_col], "sig": sigs})

    return docs.map_batches(fn, batch_format="pandas")


def lsh_candidate_pairs(sigs, *, id_col: str = "doc_id",
                        num_bands: int = NUM_BANDS):
    """Signatures → distinct candidate (a, b) pairs via banding: docs whose
    signature agrees on ALL rows of any band share that band's bucket."""
    rows_per_band = NUM_PERM // num_bands

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_key = [], []
        for i, sig in zip(df[id_col], df["sig"]):
            for band in range(num_bands):
                chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
                key = hashlib.md5(
                    (f"b{band}|" + "-".join(str(int(x)) for x in chunk)).encode()
                ).hexdigest()
                out_id.append(i)
                out_key.append(key)
        return pd.DataFrame({id_col: out_id, "bkey": out_key})

    def pairgen_partition(df: pd.DataFrame) -> pd.DataFrame:
        """Pairs within every bucket of one hash partition, vectorized."""
        empty = pd.DataFrame({"a": pd.Series([], dtype=df[id_col].dtype),
                              "b": pd.Series([], dtype=df[id_col].dtype)})
        if len(df) == 0:
            return empty
        df = df.sort_values(["bkey", id_col], kind="stable")
        keys = df["bkey"].to_numpy()
        ids = df[id_col].to_numpy()
        boundary = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], boundary))
        ends = np.concatenate((boundary, [len(df)]))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            members = np.unique(ids[s:e])
            if len(members) < 2:
                continue
            ia, ib = np.triu_indices(len(members), k=1)
            out_a.append(members[ia])
            out_b.append(members[ib])
        if not out_a:
            return empty
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}).drop_duplicates()

    from blurrily_ray.stages.common import partitioned_map

    raw = partitioned_map(sigs.map_batches(bands, batch_format="pandas"),
                          ["bkey"], pairgen_partition)
    return partitioned_map(raw, ["a", "b"], lambda df: df.drop_duplicates())


def verify_jaccard(pairs, docs, *, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Exact shingle-set Jaccard for candidate pairs →
    (a, b, n_inter, n_union), keeping pairs with
    inter * DEN >= union * NUM (default Jaccard ≥ 1/2).
    Broadcast of the shingle-set lookup (small side); swap for the hash-join
    path in stages/pairs.score_pairs at corpus scale."""
    lut = {}
    for batch in docs.select_columns([id_col, text_col]).iter_batches(
            batch_size=4096, batch_format="pandas"):
        for i, t in zip(batch[id_col], batch[text_col]):
            lut[i] = _shingle_hashes(t)
    lut_ref = ray.put(lut)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lu = _cached_get(lut_ref)
        inter = np.empty(len(df), dtype=np.int64)
        union = np.empty(len(df), dtype=np.int64)
        for k, (x, y) in enumerate(zip(df["a"], df["b"])):
            sa, sb = lu[x], lu[y]
            ninter = np.intersect1d(sa, sb, assume_unique=True).size
            inter[k] = ninter
            union[k] = sa.size + sb.size - ninter
        out = df.assign(n_inter=inter, n_union=union)
        keep = (out["n_inter"] * JACCARD_THRESHOLD_DEN
                >= out["n_union"] * JACCARD_THRESHOLD_NUM) & (out["n_union"] > 0)
        return out[keep]

    return pairs.map_batches(score, batch_format="pandas")


def minhash_dedup_pairs(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """Full near-dup pipeline: shingle → minhash → LSH bands → exact-Jaccard
    verify. Returns (a, b, n_inter, n_union) for verified near-duplicates."""
    sigs = minhash_signatures(docs, id_col=id_col, text_col=text_col)
    cands = lsh_candidate_pairs(sigs, id_col=id_col)
    return verify_jaccard(cands, docs, id_col=id_col, text_col=text_col)


def simhash(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """(id, simhash): 60-bit SimHash over word tokens; bit j of the output
    is 1 iff the count-weighted majority of token-hash bits j is 1 (ties →
    0). Token hash = md5_number mod 2^60 (60 bits → fits int64)."""

    def one(text: str) -> int:
        words = _TOKEN_RE.findall((text or "").lower())
        if not words:
            return 0
        acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
        from collections import Counter

        for w, c in Counter(words).items():
            h = md5_num(w) % (1 << SIMHASH_BITS)
            for j in range(SIMHASH_BITS):
                acc[j] += c if (h >> j) & 1 else -c
        out = 0
        for j in range(SIMHASH_BITS):
            if acc[j] > 0:
                out |= 1 << j
        return out

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df[id_col],
                             "simhash": df[text_col].map(one).astype(np.int64)})

    return docs.map_batches(fn, batch_format="pandas")
