"""Mergeable cardinality sketches — HyperLogLog register tables.

A distinct-count over a 100-TB corpus is an all-to-all shuffle of every
distinct value; the HLL register table is the standard mergeable summary
that replaces it with map-side-combined (group, bucket, max_rank) rows —
at p=8 that is ≤256 rows per group TOTAL, independent of corpus size
(Flajolet et al. 2007).

Everything is integer and md5-derived so the DuckDB oracle reproduces the
registers bit-for-bit: hash = first 8 bytes of md5 (functions/hashing.
stable_u64 == ``CAST(('0x' || substr(md5(t),1,16)) AS UBIGINT)``), bucket
= top ``p`` bits, rank = leading-zero count of the remaining 64-p bits
plus one (bit length via exact integer searchsorted — float log2 would
misround near powers of two above 2^53). The float estimator is a
driver-side convenience over the tiny register table, not part of the
oracled surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from blurrily_ray.functions.hashing import stable_u64_array
from blurrily_ray.stages.common import partitioned_map

HLL_P = 8  # 2^p buckets
_REM_BITS = 64 - HLL_P
_POWERS = (np.uint64(1) << np.arange(_REM_BITS + 1, dtype=np.uint64))


def _ranks(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes → (bucket int64, rank int64)."""
    bucket = (h >> np.uint64(_REM_BITS)).astype(np.int64)
    rem = h & np.uint64((1 << _REM_BITS) - 1)
    bl = np.searchsorted(_POWERS, rem, side="right").astype(np.int64)
    return bucket, np.int64(_REM_BITS + 1) - bl


def hll_token_registers(docs, *, group_col: str = "source",
                        text_col: str = "text", lowercase: bool = True,
                        n_parts: int = 16):
    """Per-group HLL register table over the distinct TOKENS of a text
    column: (group, bucket, max_rank), ≤2^p rows per group. Map-side
    combine shrinks every block to its own register partials before the
    one tiny shuffle; merging registers is MAX, so the result is exact
    (as a register table) under any partitioning or row order."""
    from blurrily_ray.stages.textstats import _token_arrays, _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(df[text_col])
        flat, counts = _token_arrays(toks)
        s = pd.Series(flat, dtype=object)
        if lowercase:
            s = s.str.lower()
        groups = np.repeat(df[group_col].to_numpy(), counts)
        # hash once per DISTINCT token in the batch
        uniq, inv = np.unique(s.to_numpy(), return_inverse=True) \
            if len(s) else (np.empty(0, dtype=object),
                            np.empty(0, dtype=np.int64))
        bucket_u, rank_u = _ranks(stable_u64_array(uniq)) \
            if len(uniq) else (np.empty(0, np.int64), np.empty(0, np.int64))
        out = pd.DataFrame({group_col: groups, "bucket": bucket_u[inv],
                            "max_rank": rank_u[inv]})
        out = out.groupby([group_col, "bucket"], as_index=False).max()
        # explicit Arrow types: an all-empty block must not emit null-typed
        # columns (they poison the downstream union's schema). The group
        # column's type is DERIVED from the input (an int64 source id must
        # stay int64); only genuinely type-less empty object columns fall
        # back to string.
        try:
            gtype = pa.from_numpy_dtype(df[group_col].dtype)
            garr = pa.array(out[group_col].to_numpy(), type=gtype)
        except (pa.ArrowNotImplementedError, ValueError, TypeError):
            garr = pa.array(out[group_col].to_numpy(dtype=object),
                            type=pa.string())
        return pa.table({
            group_col: garr,
            "bucket": pa.array(out["bucket"].to_numpy(), type=pa.int64()),
            "max_rank": pa.array(out["max_rank"].to_numpy(),
                                 type=pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([group_col, "bucket"], as_index=False).max()

    partials = docs.map_batches(partial, batch_format="pandas")
    return partitioned_map(partials, [group_col], combine, n_parts=n_parts)


def hll_estimate(registers: pd.DataFrame, *, group_col: str = "source",
                 p: int = HLL_P) -> pd.DataFrame:
    """Driver-side convenience: register table → (group, est_distinct).
    Standard HLL estimator with the small-range linear-counting
    correction; float — intentionally NOT part of the oracled surface."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    out = []
    for g, sub in registers.groupby(group_col):
        regs = np.zeros(m, dtype=np.int64)
        regs[sub["bucket"].to_numpy()] = sub["max_rank"].to_numpy()
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        out.append((g, float(est)))
    return pd.DataFrame(out, columns=[group_col, "est_distinct"])


CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_token_registers(docs, *, group_col: str = "source",
                        text_col: str = "text", lowercase: bool = True,
                        depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                        n_parts: int = 16):
    """Per-group count-min sketch register table over token OCCURRENCES:
    (group, row_j, bucket, count) with ≤ depth × width rows per group,
    independent of corpus size (Cormode & Muthukrishnan 2005). Bucket
    for sketch row ``j`` = ``stable_u64("cms-{j}-" + token) % width``;
    registers merge by SUM, so — like the HLL table — the result is
    EXACT as a register table under any partitioning or row order, and
    the point estimate ``min_j count[j][h_j(x)]`` is the standard
    ≥-true-count CMS bound. This is the mergeable HEAVY-HITTER /
    frequency summary that replaces a full (group, token) count shuffle
    at 100 TB, complementing :func:`hll_token_registers`'s distinct
    counts; map-side combine shrinks every block to its own register
    partials before the one tiny shuffle."""
    from blurrily_ray.stages.textstats import _token_arrays, _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(df[text_col])
        flat, counts = _token_arrays(toks)
        s = pd.Series(flat, dtype=object)
        if lowercase:
            s = s.str.lower()
        groups = np.repeat(df[group_col].to_numpy(), counts)
        arr = s.to_numpy()
        if len(arr):
            uniq, inv = np.unique(arr, return_inverse=True)
        else:
            uniq, inv = np.empty(0, object), np.empty(0, np.int64)
        # occurrence counts per (group, DISTINCT token): hashing then
        # happens depth times per distinct token, not per occurrence
        occ = pd.DataFrame({group_col: groups, "t": inv}).groupby(
            [group_col, "t"], as_index=False).size()
        ti = occ["t"].to_numpy()
        frames = []
        for j in range(depth):
            bj = ((stable_u64_array(f"cms-{j}-" + t for t in uniq)
                   % np.uint64(width)).astype(np.int64)
                  if len(uniq) else np.empty(0, np.int64))
            frames.append(pd.DataFrame({
                group_col: occ[group_col],
                "row_j": np.int64(j),
                "bucket": bj[ti] if len(uniq) else np.empty(0, np.int64),
                "count": occ["size"].to_numpy()}))
        out = pd.concat(frames).groupby(
            [group_col, "row_j", "bucket"], as_index=False)["count"].sum()
        try:
            gtype = pa.from_numpy_dtype(df[group_col].dtype)
            garr = pa.array(out[group_col].to_numpy(), type=gtype)
        except (pa.ArrowNotImplementedError, ValueError, TypeError):
            garr = pa.array(out[group_col].to_numpy(dtype=object),
                            type=pa.string())
        return pa.table({
            group_col: garr,
            "row_j": pa.array(out["row_j"].to_numpy(), type=pa.int64()),
            "bucket": pa.array(out["bucket"].to_numpy(), type=pa.int64()),
            "count": pa.array(out["count"].to_numpy(), type=pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([group_col, "row_j", "bucket"],
                          as_index=False)["count"].sum()

    partials = docs.map_batches(partial, batch_format="pandas")
    return partitioned_map(partials, [group_col], combine, n_parts=n_parts)


def cms_estimate(registers: pd.DataFrame, group, tokens, *,
                 group_col: str = "source", depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> pd.DataFrame:
    """Driver-side convenience: register table + token list →
    (token, est_count) point estimates for one group — min over sketch
    rows, the standard CMS upper-bound estimator. Tiny input (≤ depth ×
    width rows/group); not part of the oracled surface."""
    sub = registers[registers[group_col] == group]
    regs = np.zeros((depth, width), dtype=np.int64)
    regs[sub["row_j"].to_numpy(), sub["bucket"].to_numpy()] = \
        sub["count"].to_numpy()
    out = []
    for t in tokens:
        # NB % must stay in uint64: uint64 % python-int promotes to
        # float64 and silently corrupts 64-bit hashes
        cols = [int(stable_u64_array([f"cms-{j}-{t}"])[0]
                    % np.uint64(width)) for j in range(depth)]
        out.append((t, int(min(regs[j, c] for j, c in enumerate(cols)))))
    return pd.DataFrame(out, columns=["token", "est_count"])
