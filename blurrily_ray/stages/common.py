"""Coarse hash-partitioned processing — the scalable substitute for
per-key ``groupby().map_groups``.

Ray's ``map_groups`` invokes the UDF once per key group; with millions of
tiny groups (per-trigram blocks, per-conversation turn groups) the
per-call overhead dominates the actual work by orders of magnitude. The
pattern here instead:

1. add a ``_part`` column = stable hash of the key columns mod ``n_parts``
   (coarse — tens to hundreds of partitions, not millions);
2. one shuffle groups complete key-groups into the same partition
   (every row of a key lands in the same part — correctness preserved);
3. the UDF receives a whole partition and handles all its groups with
   vectorized numpy/pandas, amortizing invocation cost to ~zero.

``n_parts`` controls shuffle granularity: at cluster scale set it to a few
× total cores so partitions stay heap-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _col_hash(col: pd.Series) -> np.ndarray:
    """Stable (process-independent) uint64 hash of a key column. String
    keys go through ``pd.util.hash_array`` (fixed-key siphash, vectorized
    C, stable across processes) — this sits on the labeling pass of every
    string-keyed ``partitioned_map`` (digests, dedup keys, hll groups,
    vocab tokens), so a per-row Python loop here throttles the whole
    generic path."""
    v = col.to_numpy()
    if np.issubdtype(v.dtype, np.integer):
        h = v.astype(np.uint64, copy=True)
    elif v.dtype == object or v.dtype.kind in "US":
        h = pd.util.hash_array(
            v if v.dtype == object else v.astype(object), categorize=False)
    else:
        h = np.fromiter(
            (hash_str(s) for s in v.astype(str)), dtype=np.uint64, count=len(v))
    h ^= h >> np.uint64(33)
    h *= _MIX
    h ^= h >> np.uint64(29)
    return h


def hash_str(s: str) -> int:
    """Cheap deterministic string hash (FNV-1a 64)."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def join_partitions_cap(requested: int) -> int:
    """Cap a join's num_partitions at the cluster CPU count. Ray's hash
    shuffle join spawns one aggregator actor per partition; requesting far
    more partitions than CPUs (e.g. 32-way joins on an 8-CPU node, chained)
    can deadlock the actor pool. Empirically n_partitions ≤ n_cpus is safe
    even with two chained joins."""
    import ray

    n = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(requested, n))


def partitioned_map(ds, key_cols: list[str], fn, *, n_parts: int = 64,
                    batch_format: str = "pandas", part_fn=None,
                    packed_cols: list[str] | None = None):
    """Apply ``fn(partition_df) -> df`` where each partition contains all
    rows of every key-group hashed into it. ``fn`` must handle multiple
    groups (group-by ``key_cols`` inside, vectorized).

    ``part_fn(batch) -> int64 ndarray`` overrides the default key-column
    hashing — callers use it to FUSE a semantic co-partitioning (all rows
    of a key together) with a locality layout (partition id encodes a
    downstream routing dimension) into the single shuffle.

    ``packed_cols`` switches the exchange to BLOB PACKING: each producer
    block packs its rows into ONE binary row per target partition, the
    all-to-all moves ~n_blocks × n_parts blob rows instead of n_rows
    scalar rows, and the consumer reconstructs the columns zero-copy
    before calling ``fn``. Accepts a list (all int64) or a {col: dtype}
    dict of FIXED-WIDTH INTEGER numpy dtypes only (validated) — narrow
    dtypes shrink the exchange bytes; see stages/_packed.py for the wire
    format and for why variable-width (string) packing is rejected.
    Ray's sort-based shuffle is ROW-RATE bound (~2-5 M rows/s regardless
    of CPU count — NOTES_r2 study), so for the 40M+-row pair exchanges
    this turns the dominant all-to-all into noise while moving the
    identical bytes. This is exactly the map-side packing a real
    multi-node exchange does; n_parts still controls reduce fan-out.

    The partition-id column is appended on zero-copy Arrow batches (an
    int64 append, no pandas conversion or table copy) — the labeling pass
    runs over every input row, so it must stay O(row) cheap."""
    import pyarrow as pa

    if packed_cols is not None:
        return _packed_partitioned_map(ds, key_cols, fn, n_parts=n_parts,
                                       part_fn=part_fn, cols=packed_cols,
                                       out_format=batch_format)

    def add_part(batch: pa.Table) -> pa.Table:
        if part_fn is not None:
            part = np.asarray(part_fn(batch), dtype=np.int64)
        else:
            h = np.zeros(len(batch), dtype=np.uint64)
            for c in key_cols:
                col = batch[c]
                if pa.types.is_integer(col.type):
                    v = col.to_numpy(zero_copy_only=False)
                    h = h * np.uint64(31) + _col_hash(pd.Series(v))
                else:
                    h = h * np.uint64(31) + _col_hash(
                        pd.Series(np.asarray(col), dtype=object))
            part = (h % np.uint64(n_parts)).astype(np.int64)
        # strip schema metadata: a pandas-origin block carries dict-valued
        # metadata that defeats Ray's schema-dedup cache in the shuffle's
        # reduce stage (the 'Failed to hash the schemas' warning) and
        # bloats every shuffled block's schema
        return batch.append_column("_part", pa.array(part)) \
            .replace_schema_metadata(None)

    def run(df):
        # pandas groups: strip the partition column with pandas; pyarrow
        # groups (batch_format="pyarrow" — zero-copy for wide binary
        # payloads) arrive as a pa.Table
        if isinstance(df, pa.Table):
            out = fn(df.drop_columns(["_part"]))
        else:
            out = fn(df.drop(columns=["_part"]))
        if isinstance(out, pd.DataFrame):
            # emit plain Arrow with STRIPPED schema metadata: pandas-block
            # schemas embed dict metadata that defeats Ray's schema
            # deduplication cache (the 'Failed to hash the schemas'
            # warning) and bloat every shuffled block
            out = pa.Table.from_pandas(out, preserve_index=False)
            out = out.replace_schema_metadata(None)
        elif isinstance(out, pa.Table):
            out = out.replace_schema_metadata(None)
        return out

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(run, batch_format=batch_format)


def _typed_empty(schema):
    """Zero-row Dataset with an explicit Arrow schema — the substitute
    for a side whose lazy transforms left no block to infer types from.
    A None schema() implies zero rows (execution found no block), so the
    swap never drops data."""
    from ray.data import from_arrow

    return from_arrow(schema.empty_table())


def partitioned_map2(ds_left, ds_right, key_cols_left, key_cols_right, fn, *,
                     n_parts: int = 64, part_fn_left=None, part_fn_right=None,
                     left_schema=None, right_schema=None):
    """Two-sided coarse hash co-partitioning — the join-shaped analogue of
    ``partitioned_map`` for operators the Dataset API can't express
    (as-of join, range join): both datasets are side-tagged and
    schema-aligned (missing columns null-filled), ONE union + shuffle
    lands every key-group's rows from BOTH sides in the same partition,
    and ``fn(left_df, right_df) -> df`` runs per partition with each
    side's original columns.

    The two sides' key columns must hash compatibly (same logical type);
    columns sharing a name across sides must share a type — rename first
    otherwise. ``part_fn_left/right(batch) -> int64 ndarray`` override the
    default key hashing per side (bucket replication etc.)."""
    import pyarrow as pa

    ls, rs = ds_left.schema(), ds_right.schema()
    if ls is None and left_schema is not None:
        ls = left_schema
        ds_left = _typed_empty(left_schema)
    if rs is None and right_schema is not None:
        rs = right_schema
        ds_right = _typed_empty(right_schema)
    if ls is None or rs is None:
        # a zero-row side whose lazy transforms left no block to infer a
        # schema from — the caller knows its output contract (pass
        # left_schema/right_schema), we don't
        raise ValueError("partitioned_map2: a side has no rows and no "
                         "derivable schema; handle empty sides in the "
                         "calling operator (or pass left_/right_schema)")
    def _arrow_type(t):
        # a pandas-block dataset reports numpy dtypes / Python classes in
        # schema().types; null-filling the missing side needs Arrow types
        if isinstance(t, pa.DataType):
            return t
        dt = np.dtype(t)
        return pa.string() if dt == np.dtype("O") else pa.from_numpy_dtype(dt)

    ltypes = {n: _arrow_type(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {n: _arrow_type(t) for n, t in zip(rs.names, rs.types)}
    for c in set(ls.names) & set(rs.names):
        if ltypes[c] != rtypes[c]:
            raise ValueError(f"column {c!r} type differs across sides "
                             f"({ltypes[c]} vs {rtypes[c]}); rename first")
    all_names = list(ls.names) + [c for c in rs.names if c not in ltypes]
    types = {**rtypes, **ltypes}

    def tag(side: int, key_cols, side_names, pfn):
        def do(batch: pa.Table) -> pa.Table:
            if pfn is not None:
                part = np.asarray(pfn(batch), dtype=np.int64) % n_parts
            else:
                h = np.zeros(len(batch), dtype=np.uint64)
                for c in key_cols:
                    v = batch[c].to_numpy(zero_copy_only=False)
                    h = h * np.uint64(31) + _col_hash(pd.Series(v))
                part = (h % np.uint64(n_parts)).astype(np.int64)
            cols = {}
            for c in all_names:
                cols[c] = (batch[c] if c in side_names
                           else pa.nulls(len(batch), type=types[c]))
            cols["_side"] = pa.array(
                np.full(len(batch), side, dtype=np.int64))
            cols["_part"] = pa.array(part)
            return pa.table(cols)
        return do

    tagged = ds_left.map_batches(
        tag(0, key_cols_left, set(ls.names), part_fn_left),
        batch_format="pyarrow").union(ds_right.map_batches(
            tag(1, key_cols_right, set(rs.names), part_fn_right),
            batch_format="pyarrow"))

    lnames, rnames = list(ls.names), list(rs.names)

    def run(t: pa.Table):
        # split sides in ARROW, then convert each side alone: a pandas
        # conversion of the combined table would see the other side's
        # null-filled rows and silently widen int64 columns to float64
        side = t["_side"].to_numpy(zero_copy_only=False)
        out = fn(t.filter(pa.array(side == 0)).select(lnames).to_pandas(),
                 t.filter(pa.array(side == 1)).select(rnames).to_pandas())
        if isinstance(out, pd.DataFrame):
            out = pa.Table.from_pandas(out, preserve_index=False)
        return out.replace_schema_metadata(None)

    return tagged.groupby("_part").map_groups(run, batch_format="pyarrow")


def _packed_partitioned_map(ds, key_cols, fn, *, n_parts, part_fn, cols,
                            out_format: str = "pandas"):
    """Blob-packed exchange — see stages/_packed.py for the wire format
    (int64 header + per-column segments; narrow integer dtypes,
    Arrow-style string segments, and list<uint16> payloads supported)."""
    from blurrily_ray.stages._packed import packed_partitioned_map

    return packed_partitioned_map(ds, key_cols, fn, n_parts=n_parts,
                                  part_fn=part_fn, cols=cols,
                                  out_format=out_format)
