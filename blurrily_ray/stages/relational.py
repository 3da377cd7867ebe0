"""Generic relational operators: broadcast equi-join, shuffle hash join,
and map-side-combined aggregation pipelines over the TPC-H-shaped tables.

The reference engine has no relational constructs (SURVEY.md §2 — its only
join is needle ⋈ postings inside find, storage.c:477-580); a training-data
pipeline needs them constantly (attach dim metadata to samples, per-source
rollups). Two join strategies, picked by the side sizes:

- ``broadcast_join``: the small side is ``ray.put`` ONCE and every
  ``map_batches`` task resolves keys against the shared plasma copy
  (zero re-ship per batch, no shuffle at all). Right side must fit a
  worker heap — dims like ``nation``/``region`` stay fixed-size at any
  corpus scale.
- ``hash_join``: both sides large → ONE union + hash shuffle co-partitions
  matching keys (``common.partitioned_map2``) and each partition runs a
  single vectorized ``pd.merge`` over all its keys. Never a per-key UDF.

Aggregations follow the map-side-combine discipline (``window_agg``,
``group_quantiles``): partials inside ``map_batches`` shrink each block to
one row per group BEFORE the shuffle, the final combine shuffles only
``n_groups × n_blocks`` tiny rows. Money/quantity sums are carried in
integer MICRO-units (floor(x·1e6)) so results are bit-identical under any
partitioning and row order — float SUM would hash differently per plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from blurrily_ray.stages.common import partitioned_map, partitioned_map2


def _micros(v: np.ndarray) -> np.ndarray:
    """floor(x * 1e6) as int64 — the order-independent money/qty carrier.
    Oracle mirror: CAST(FLOOR(x * 1e6) AS BIGINT) (FLOOR, never ROUND:
    duckdb rounds half-away-from-zero, numpy half-to-even)."""
    return np.floor(np.asarray(v, dtype=np.float64) * 1e6).astype(np.int64)


def broadcast_join(ds, small, *, on: str, right_on: str | None = None,
                   how: str = "inner"):
    """Equi-join ``ds`` against a driver-resident small table.

    ``small`` (pa.Table | pd.DataFrame) is put in the object store once;
    each task builds/reuses a cached pandas hash index over its key column
    (``_cached_get`` keeps the deserialized object — and the Index's lazily
    built hash engine — alive per worker process). Non-key right columns
    are appended to every matching left row; ``how="left"`` keeps
    non-matching rows with nulls, ``"inner"`` drops them.
    """
    import ray

    from blurrily_ray.stages.pairs import _cached_get

    if how not in ("inner", "left"):
        # anything else ('outer', 'right', a typo) would silently take the
        # left-join branch below and return wrong results
        raise ValueError(f"broadcast_join: how={how!r} not supported; "
                         "use 'inner' or 'left'")
    right_on = right_on or on
    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    if right_on not in small.column_names:
        raise ValueError(f"right key {right_on!r} not in small side")
    keys = pd.Index(small[right_on].to_numpy(zero_copy_only=False))
    if len(keys) and not keys.is_unique:
        raise ValueError("broadcast_join small side must have unique keys")
    payload = small.drop_columns([right_on])
    ref = ray.put((keys, payload))

    def join_batch(batch: pa.Table) -> pa.Table:
        idx, pay = _cached_get(ref)
        overlap = set(pay.column_names) & set(batch.column_names)
        if overlap:
            # hash_join suffixes collisions via pd.merge; here a silent
            # duplicate Arrow column would break downstream selects —
            # make the caller rename instead
            raise ValueError(f"broadcast_join: column collision {overlap}; "
                             "rename before joining")
        if len(idx) == 0:
            # empty dim: inner drops everything, left null-fills all rows
            kept = batch.slice(0, 0) if how == "inner" else batch
            return _append_nulls(kept, pay)
        pos = idx.get_indexer(batch[on].to_numpy(zero_copy_only=False))
        if how == "inner":
            keep = pos >= 0
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                pos = pos[keep]
            taken = pay.take(pa.array(pos))
        else:  # left: null-fill misses
            miss = pos < 0
            taken = pay.take(pa.array(np.where(miss, 0, pos)))
            if miss.any():
                m = pa.array(~miss)
                taken = pa.table({
                    c: pa.compute.if_else(m, taken[c].combine_chunks(),
                                          pa.nulls(len(batch), taken[c].type))
                    for c in taken.column_names})
        out = batch
        for c in taken.column_names:
            out = out.append_column(c, taken[c])
        return out

    return ds.map_batches(join_batch, batch_format="pyarrow")


def _append_nulls(batch: pa.Table, payload: pa.Table) -> pa.Table:
    for c in payload.column_names:
        batch = batch.append_column(
            c, pa.nulls(len(batch), payload[c].type))
    return batch


def hash_join(left, right, *, on: str, right_on: str | None = None,
              how: str = "inner", n_parts: int = 64):
    """Shuffle equi-join: co-partition both sides by key hash, then ONE
    vectorized ``pd.merge`` per partition (all keys of the partition at
    once). Shared non-key column names get pandas ``_x``/``_y`` suffixes —
    rename upstream for a stable schema. Partitioning assumption: one
    key's rows (both sides) fit a partition; skewed hot keys need the
    salting used by the pair pipeline, not this operator."""
    right_on = right_on or on

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        return ldf.merge(rdf, how=how, left_on=on, right_on=right_on)

    return partitioned_map2(left, right, [on], [right_on], merge,
                            n_parts=n_parts)


def pricing_summary(lineitem):
    """TPC-H-Q1-shaped pricing rollup over ``lineitem`` grouped by
    (l_returnflag, l_linestatus): counts + micro-integer sums of quantity,
    base price, discounted price, and charge, plus floor-divided micro
    averages. Partials per block (map-side combine: each block → ≤|groups|
    rows), tiny final combine co-partitioned by group."""

    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax"]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        ep = df["l_extendedprice"].to_numpy()
        disc = df["l_discount"].to_numpy()
        df["sum_qty_micro"] = _micros(df["l_quantity"].to_numpy())
        df["sum_base_micro"] = _micros(ep)
        df["sum_disc_micro"] = _micros(ep * (1.0 - disc))
        df["sum_charge_micro"] = _micros(
            ep * (1.0 - disc) * (1.0 + df["l_tax"].to_numpy()))
        df["n_rows"] = np.int64(1)
        out = df.groupby(["l_returnflag", "l_linestatus"], as_index=False)[
            ["sum_qty_micro", "sum_base_micro", "sum_disc_micro",
             "sum_charge_micro", "n_rows"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        out["avg_qty_micro"] = out["sum_qty_micro"] // out["n_rows"]
        out["avg_price_micro"] = out["sum_base_micro"] // out["n_rows"]
        return out

    partials = lineitem.map_batches(partial, batch_format="pyarrow")
    return partitioned_map(partials, ["l_returnflag", "l_linestatus"],
                           combine, n_parts=8)


def revenue_by_nation(orders, customer, nation):
    """Revenue rollup: orders ⋈ customer (shuffle hash join on custkey)
    ⋈ nation (broadcast — 25 fixed rows), grouped by nation name.
    Output: (n_name, revenue_micro, n_orders). The customer side is
    pre-pruned to its two needed columns and pre-tagged with n_name so the
    big orders shuffle carries only (o_custkey, o_totalprice)."""

    cust = broadcast_join(
        customer.map_batches(
            lambda b: b.select(["c_custkey", "c_nationkey"]).set_column(
                1, "c_nationkey", b["c_nationkey"].cast(pa.int64())),
            batch_format="pyarrow"),
        _nation_table(nation),
        on="c_nationkey", right_on="n_nationkey")

    slim = orders.map_batches(
        lambda b: b.select(["o_custkey", "o_totalprice"]),
        batch_format="pyarrow")

    def per_part(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        j = ldf.merge(rdf, how="inner", left_on="o_custkey",
                      right_on="c_custkey")
        j["revenue_micro"] = _micros(j["o_totalprice"].to_numpy())
        j["n_orders"] = np.int64(1)
        return j.groupby("n_name", as_index=False)[
            ["revenue_micro", "n_orders"]].sum()

    # typed contracts for the zero-row case (map_batches over an empty
    # table loses the schema): key/price types from the source schemas
    osch, csch = orders.schema(), customer.schema()
    ot = dict(zip(osch.names, osch.types)) if osch is not None else {}
    ct = dict(zip(csch.names, csch.types)) if csch is not None else {}
    partials = partitioned_map2(
        slim, cust.drop_columns(["c_nationkey"]),
        ["o_custkey"], ["c_custkey"], per_part, n_parts=32,
        left_schema=pa.schema([
            ("o_custkey", ot.get("o_custkey", pa.int64())),
            ("o_totalprice", ot.get("o_totalprice", pa.float64()))]),
        right_schema=pa.schema([
            ("c_custkey", ct.get("c_custkey", pa.int64())),
            ("n_name", pa.string())]))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_name", as_index=False).sum()

    return partitioned_map(partials, ["n_name"], combine, n_parts=4)


def _nation_table(nation) -> pa.Table:
    """Materialize the fixed-size nation dim (25 rows at every SF) with an
    int64 key for hash-compatible joining."""
    batches = list(nation.select_columns(["n_nationkey", "n_name"])
                   .iter_batches(batch_size=None, batch_format="pyarrow"))
    t = (pa.concat_tables(batches) if batches
         else pa.table({"n_nationkey": pa.array([], type=pa.int64()),
                        "n_name": pa.array([], type=pa.string())}))
    return t.set_column(0, "n_nationkey", t["n_nationkey"].cast(pa.int64()))
