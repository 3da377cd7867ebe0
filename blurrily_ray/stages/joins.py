"""Temporal join operators: as-of join and time-range join.

The reference engine has no join constructs at all (SURVEY.md §2 — its
only "join" is needle ⋈ postings inside find, storage.c:477-580); these
are graft-added operators a training-data pipeline needs (attach the
most recent label/metadata row to each sample; count neighboring events
in a time window). Neither is expressible with Ray Data's equi-join, so
both are built on the coarse co-partitioning pattern of
``stages/common.py``:

- ``asof_join``: ONE hash shuffle on the ``by`` key lands both sides'
  rows for a key in the same partition; each partition runs ONE
  vectorized ``pd.merge_asof`` over all its keys (never a per-key UDF).
  Partitioning assumption: a single key's rows fit a partition — the
  same assumption sessionize makes, valid for per-user/per-entity data.
- ``range_join_count``: interval predicates have no equality key to
  hash on, so the left side is REPLICATED into the (≤2) time buckets
  its window ``(on+lo, on+hi]`` can touch (bucket width = hi-lo) while
  each right row goes to its own bucket — every qualifying (left,
  right) row lands in exactly ONE shared partition (the one owning the
  right row's bucket), counts are partial per replica and a second tiny
  shuffle sums them. This is the standard distributed band-join layout;
  it needs NO assumption that a time range fits one partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from blurrily_ray.stages.common import partitioned_map, partitioned_map2


def asof_join(left, right, *, by: str, on: str, right_by: str | None = None,
              right_on: str | None = None, n_parts: int = 64):
    """For each left row, attach the LAST right row of the same ``by`` key
    with ``right_on <= on`` (backward as-of, exact matches allowed).
    Left rows with no such right row keep null right columns (left join).

    Ties on (key, right_on) resolve deterministically to the row that is
    largest under the remaining right columns (the right side is sorted
    by (right_on, *other_cols) and merge_asof takes the last match) —
    mirror with ``ORDER BY right_on DESC, other_cols DESC`` in SQL.

    ``on``/``right_on`` must be integer-typed (epoch microseconds); cast
    timestamps upstream so engine and oracle hash identically.
    """
    right_by = right_by or by
    right_on = right_on or on
    rschema = right.schema()
    if left.schema() is None:
        # zero left rows with no derivable schema: the as-of result is
        # empty; without left dtypes there is nothing better to type it as
        import ray.data

        return ray.data.from_items([])
    if rschema is None:
        # zero right rows: every left row keeps null right columns — but a
        # schemaless right side doesn't even tell us the column names, so
        # the output degrades to the left columns alone
        return left

    rint = {c for c, t in zip(rschema.names, rschema.types)
            if pa.types.is_integer(t)}
    tiebreak = [c for c in rschema.names if c not in (right_by, right_on)]

    def join_part(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values(on, kind="stable")
        if len(rdf) == 0:
            # merge_asof needs a sortable non-empty right; synthesize the
            # all-null outcome with stable dtypes instead
            out = ldf.copy()
            for c, t in zip(rschema.names, rschema.types):
                if c not in out.columns:
                    dt = ("Int64" if pa.types.is_integer(t) else
                          "float64" if pa.types.is_floating(t) else "object")
                    out[c] = pd.Series([None] * len(out), dtype=dt)
        else:
            rdf = rdf.sort_values([right_on, *tiebreak], kind="stable")
            out = pd.merge_asof(ldf, rdf, left_on=on, right_on=right_on,
                                left_by=by, right_by=right_by,
                                direction="backward",
                                allow_exact_matches=True)
        # unmatched rows turn integer right columns into float NaN —
        # restore nullable int64 so the Arrow schema is stable
        for c in rint:
            if c in out.columns and out[c].dtype != np.int64:
                out[c] = out[c].astype("Int64")
        return out

    return partitioned_map2(left, right, [by], [right_by], join_part,
                            n_parts=n_parts)


def range_join_count(left, right, *, id_col: str, on: str, lo: int, hi: int,
                     by: str | None = None, right_by: str | None = None,
                     right_on: str | None = None,
                     out_col: str = "n_in_range", n_parts: int = 64):
    """Per left row, COUNT right rows with ``right_on - on`` in ``(lo, hi]``
    (and, when ``by`` is given, matching keys). Returns (id_col, out_col)
    with zero-count left rows included.

    Bucket width B = hi - lo, so each left window spans at most two
    buckets; left rows are replicated to those buckets, right rows routed
    to their own, and per-replica partial counts are summed by ``id_col``.
    """
    if hi <= lo:
        raise ValueError("need hi > lo")
    right_by = right_by or by
    right_on = right_on or on
    B = np.int64(hi - lo)

    if left.schema() is None:  # zero left rows: typed empty result
        import ray.data

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            out_col: pa.array([], pa.int64())}))
    if right.schema() is None:  # zero right rows: every count is 0
        def zeros(batch: pa.Table) -> pa.Table:
            return pa.table({
                id_col: batch[id_col].cast(pa.int64()),
                out_col: pa.array(np.zeros(len(batch), dtype=np.int64))})

        return left.select_columns([id_col]).map_batches(
            zeros, batch_format="pyarrow")

    def replicate(batch: pa.Table) -> pa.Table:
        onv = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        b0 = (onv + lo) // B
        b1 = (onv + hi) // B
        keep = np.concatenate((np.ones(len(onv), dtype=bool), b1 != b0))
        idx = np.concatenate((np.arange(len(onv)), np.arange(len(onv))))[keep]
        cols = {c: batch[c].take(pa.array(idx))
                for c in (id_col, on, *( [by] if by else [] ))}
        cols["_bucket"] = pa.array(np.concatenate((b0, b1))[keep])
        return pa.table(cols)

    def bucket_of_right(batch: pa.Table) -> np.ndarray:
        return (batch[right_on].to_numpy(zero_copy_only=False)
                .astype(np.int64) // B)

    def part_left(batch: pa.Table) -> np.ndarray:
        return _part_of(batch, "_bucket", by)

    def part_right(batch: pa.Table) -> np.ndarray:
        b = bucket_of_right(batch)
        return _part_of(batch, None, right_by, bucket=b)

    def _part_of(batch, bucket_col, by_col, bucket=None):
        from blurrily_ray.stages.common import _col_hash
        if bucket is None:
            bucket = batch[bucket_col].to_numpy(zero_copy_only=False)
        h = bucket.astype(np.uint64)
        if by_col is not None:
            h = h * np.uint64(31) + _col_hash(
                pd.Series(batch[by_col].to_numpy(zero_copy_only=False)))
        h ^= h >> np.uint64(33)
        h *= np.uint64(0x9E3779B97F4A7C15)
        return (h % np.uint64(n_parts)).astype(np.int64)

    def count_part(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if len(ldf) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "_n": pd.Series([], dtype="int64")})
        lon = ldf[on].to_numpy().astype(np.int64)
        lbkt = ldf["_bucket"].to_numpy().astype(np.int64)
        n = np.zeros(len(ldf), dtype=np.int64)
        if len(rdf):
            ron = rdf[right_on].to_numpy().astype(np.int64)
            rbkt = ron // B
            # only right rows whose bucket matches the replica's bucket may
            # count here (each (left,right) pair counts in exactly one part)
            if by is None:
                lrank = np.zeros(len(ldf), dtype=np.int64)
                rrank = np.zeros(len(ron), dtype=np.int64)
            else:
                cats, uniq = pd.factorize(np.concatenate(
                    (ldf[by].to_numpy(), rdf[right_by].to_numpy())))
                lrank, rrank = cats[:len(ldf)], cats[len(ldf):]
            base = min(int(ron.min()), int((lon + lo).min()))
            span = max(int(ron.max()), int((lon + hi).max())) - base + 2
            shift = int(span).bit_length()
            # segment key = (factorized (rank, bucket) pair, rebased-on)
            # packed into one int64 → ONE sorted array serves every
            # segment's interval count via two searchsorteds. The pair is
            # factorized in two collision-free steps (raw buckets can be
            # ~2^33 — a shift-pack of rank and raw bucket could alias)
            bcat, buniq = pd.factorize(np.concatenate((lbkt, rbkt)))
            rank = np.concatenate((lrank, rrank)).astype(np.int64)
            pair, _ = pd.factorize(rank * np.int64(len(buniq)) + bcat)
            lpair, rpair = pair[:len(ldf)], pair[len(ldf):]
            if (int(pair.max()) + 1).bit_length() + shift > 62:
                raise ValueError(
                    "partition time-span × segment count overflows the "
                    "packed key; raise n_parts so partitions narrow")
            rkey = (rpair.astype(np.int64) << shift) | (ron - base)
            order = np.argsort(rkey, kind="stable")
            rkey = rkey[order]
            k_hi = (lpair.astype(np.int64) << shift) | (lon + hi - base)
            k_lo = (lpair.astype(np.int64) << shift) | (lon + lo - base)
            n = (np.searchsorted(rkey, k_hi, side="right")
                 - np.searchsorted(rkey, k_lo, side="right")).astype(np.int64)
        return pd.DataFrame({id_col: ldf[id_col].to_numpy(), "_n": n})

    lrep = left.select_columns(
        [id_col, on, *( [by] if by else [] )]).map_batches(
        replicate, batch_format="pyarrow")
    rsel = right.select_columns(
        [right_on, *( [right_by] if right_by else [] )])
    partials = partitioned_map2(lrep, rsel, ["_bucket"], [right_on],
                                count_part, n_parts=n_parts,
                                part_fn_left=part_left,
                                part_fn_right=part_right)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, sort=False)["_n"].sum()
        return pd.DataFrame({id_col: g.index.to_numpy(),
                             out_col: g.to_numpy().astype(np.int64)})

    return partitioned_map(partials, [id_col], total, n_parts=max(8, n_parts // 4))
