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
    """Stable (process-independent) uint64 hash of a key column."""
    v = col.to_numpy()
    if np.issubdtype(v.dtype, np.integer):
        h = v.astype(np.uint64, copy=True)
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

    ``packed_cols`` (all-int64 schemas only) switches the exchange to
    BLOB PACKING: each producer block packs its rows into ONE binary
    row per target partition (row-major int64 matrix), the all-to-all
    moves ~n_blocks × n_parts blob rows instead of n_rows scalar rows,
    and the consumer reconstructs the columns zero-copy before calling
    ``fn``. Ray's sort-based shuffle is ROW-RATE bound (~2-5 M rows/s
    regardless of CPU count — NOTES_r2 study), so for the 40M+-row pair
    exchanges this turns the dominant all-to-all into noise while moving
    the identical bytes. This is exactly the map-side packing a real
    multi-node exchange does; n_parts still controls reduce fan-out.

    The partition-id column is appended on zero-copy Arrow batches (an
    int64 append, no pandas conversion or table copy) — the labeling pass
    runs over every input row, so it must stay O(row) cheap."""
    import pyarrow as pa

    if packed_cols is not None:
        return _packed_partitioned_map(ds, key_cols, fn, n_parts=n_parts,
                                       part_fn=part_fn, cols=packed_cols)

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
        return batch.append_column("_part", pa.array(part))

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


def _packed_partitioned_map(ds, key_cols, fn, *, n_parts, part_fn, cols):
    """Blob-packed exchange body of ``partitioned_map(packed_cols=...)``.

    Pack: one map pass per WHOLE input block (batch_size=None — per-batch
    packing would shred blobs to ~n_rows/n_parts bytes) sorts the block's
    rows by target partition and emits (``_part``, ``blob``) where blob is
    the row-major int64 matrix slice, built with ONE ``tobytes`` copy and
    an offsets buffer (no per-partition Python bytes objects).

    Unpack: a partition's blobs are back-to-back in the combined Arrow
    data buffer (each a multiple of 8·k bytes, so the int64 view stays
    aligned); the consumer reconstructs columns as zero-copy numpy views
    and calls ``fn`` with a no-copy DataFrame."""
    import pyarrow as pa

    k = len(cols)
    row_bytes = 8 * k

    def pack(batch: pa.Table) -> pa.Table:
        empty = pa.table({"_part": pa.array([], pa.int64()),
                          "blob": pa.array([], pa.large_binary())})
        if len(batch) == 0:
            return empty
        if part_fn is not None:
            part = np.asarray(part_fn(batch), dtype=np.int64)
        else:
            h = np.zeros(len(batch), dtype=np.uint64)
            for c in key_cols:
                v = batch[c].to_numpy(zero_copy_only=False)
                h = h * np.uint64(31) + _col_hash(pd.Series(v))
            part = (h % np.uint64(n_parts)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        mat = np.empty((len(batch), k), dtype=np.int64)
        for j, c in enumerate(cols):
            mat[:, j] = batch[c].to_numpy(zero_copy_only=False)
        mat = mat[order]
        ps = part[order]
        bnd = np.nonzero(ps[1:] != ps[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        offsets = np.empty(len(starts) + 1, dtype=np.int64)
        offsets[:-1] = starts * row_bytes
        offsets[-1] = len(ps) * row_bytes
        blob = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), len(starts),
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(mat.tobytes())])
        return pa.table({"_part": pa.array(ps[starts]), "blob": blob})

    def run(t: pa.Table):
        bl = t["blob"].combine_chunks()
        offs = np.frombuffer(bl.buffers()[1], dtype=np.int64)
        start = offs[bl.offset]
        end = offs[bl.offset + len(bl)]
        data = np.frombuffer(bl.buffers()[2], dtype=np.uint8)[start:end]
        mat = data.view(np.int64).reshape(-1, k)
        df = pd.DataFrame({c: mat[:, j] for j, c in enumerate(cols)},
                          copy=False)
        out = fn(df)
        if isinstance(out, pd.DataFrame):
            out = pa.Table.from_pandas(out, preserve_index=False)
        return out.replace_schema_metadata(None)

    # batch_size=None: pack per WHOLE upstream block — bundling blocks
    # into bigger batches was measured SLOWER (breaks streaming overlap;
    # pack tasks idle until a bundle fills)
    return ds.map_batches(pack, batch_format="pyarrow", batch_size=None) \
        .groupby("_part").map_groups(run, batch_format="pyarrow")
