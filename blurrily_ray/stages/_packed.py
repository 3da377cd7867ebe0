"""Blob-packed exchange body of ``partitioned_map(packed_cols=...)``.

Pack: one map pass per WHOLE input block (batch_size=None — per-batch
packing would shred blobs to ~n_rows/n_parts bytes) sorts the block's rows
by target partition and emits (``_part``, ``blob``). Ray's sort-based
shuffle is ROW-RATE bound (~2-5 M rows/s regardless of CPU count —
NOTES_r2 study), so the all-to-all sees n_blocks × n_parts blob rows
instead of tens of millions of scalar rows while moving the same bytes.

``cols`` is a list (all int64) or a {col: numpy-integer-dtype} dict —
NARROW dtypes shrink the exchange bytes, which drive the all-to-all's
single-box cost superlinearly (41M (ab,n) rows: 16 B/row = 17.3 s at
2 CPUs vs the 8 B/row-equivalent volume = 9.6 s, measured).

INTEGER COLUMNS ONLY, by measurement not by accident: an extension that
shipped string keys as Arrow-style offsets+bytes segments (for the
sharded scorer's conv-id pair shuffles) was built, tested correct, and
REJECTED — it measured slower at every scale (sf0.1/16 CPUs: scoring
16-18 s unpacked vs 21-34 s packed; sf1.0/32: ~400 s vs 740 s with one
shuffle packed). Variable-width packing pays take-gathers + buffer
assembly + Arrow→object rebuilds that exceed the scalar shuffle's
row-rate cost; fixed-width int packing wins precisely because pack and
unpack are single memcpy-shaped views.

Blob layout: int64 row-count header, then one segment per column padded
to 8 bytes (every blob size stays a multiple of 8, keeping int64 views
aligned in the combined buffer).

Unpack: a partition's blobs are back-to-back in the combined Arrow data
buffer; the consumer walks the headers, views each segment zero-copy,
concatenates per column across blobs, and calls ``fn`` with a DataFrame
(sub-int64 columns widen back to int64 in heap — only the wire format is
narrow).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _pad8(n: int) -> int:
    return (n + 7) & ~7


def packed_partitioned_map(ds, key_cols, fn, *, n_parts, part_fn, cols,
                           out_format: str = "pandas"):
    from blurrily_ray.stages.common import _col_hash

    dtypes = ({c: np.dtype(np.int64) for c in cols}
              if not isinstance(cols, dict)
              else {c: np.dtype(d) for c, d in cols.items()})
    for c, dt in dtypes.items():
        if dt.kind not in "iu":  # fixed-width ints only, by measurement
            raise TypeError(
                f"packed_cols[{c!r}] = {dt}: blob packing supports "
                "fixed-width integer dtypes only (variable-width string "
                "packing was measured slower and removed — _packed.py)")
    names = list(dtypes)
    widths = [dtypes[c].itemsize for c in names]

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
        sorted_cols = []
        for c in names:
            v = batch[c].to_numpy(zero_copy_only=False)
            if v.dtype.itemsize > dtypes[c].itemsize:
                # loud overflow guard: a narrowed wire dtype relies on a
                # caller invariant (e.g. broadcast-path surrogate ids <
                # 2^31 via er.py's broadcast_limit_bytes gate); silent
                # wraparound here would corrupt pair ids downstream
                info = np.iinfo(dtypes[c])
                lo, hi = (v.min(), v.max()) if len(v) else (0, 0)
                if lo < info.min or hi > info.max:
                    raise OverflowError(
                        f"packed column {c!r} range [{lo}, {hi}] exceeds "
                        f"wire dtype {dtypes[c]}")
            sorted_cols.append(v.astype(dtypes[c], copy=False)[order])
        ps = part[order]
        bnd = np.nonzero(ps[1:] != ps[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(ps)]))
        counts = ends - starts
        blob_sizes = np.full(len(starts), 8, dtype=np.int64)
        for w in widths:
            blob_sizes += (counts * w + 7) & ~7
        offsets = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(blob_sizes, out=offsets[1:])
        buf = np.zeros(int(offsets[-1]), dtype=np.uint8)
        for i in range(len(starts)):
            pos = int(offsets[i])
            n_i = int(counts[i])
            buf[pos:pos + 8].view(np.int64)[0] = n_i
            pos += 8
            for arr, w in zip(sorted_cols, widths):
                nb = n_i * w
                # contiguous 1-D slice → zero-copy uint8 view
                buf[pos:pos + nb] = arr[starts[i]:ends[i]].view(np.uint8)
                pos += _pad8(nb)
        blob = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), len(starts),
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf)])
        return pa.table({"_part": pa.array(ps[starts]), "blob": blob})

    def run(t: pa.Table):
        bl = t["blob"].combine_chunks()
        offs = np.frombuffer(bl.buffers()[1], dtype=np.int64)
        data = np.frombuffer(bl.buffers()[2], dtype=np.uint8)
        parts_cols: list[list[np.ndarray]] = [[] for _ in names]
        for i in range(len(bl)):
            pos = int(offs[bl.offset + i])
            n_i = int(data[pos:pos + 8].view(np.int64)[0])
            pos += 8
            for j, (c, w) in enumerate(zip(names, widths)):
                seg = data[pos:pos + n_i * w].view(dtypes[c])
                parts_cols[j].append(seg)
                pos += _pad8(n_i * w)
        cols_np = {
            c: (np.concatenate(parts_cols[j]) if parts_cols[j]
                else np.empty(0, dtypes[c])).astype(np.int64, copy=False)
            for j, c in enumerate(names)}
        if out_format == "pyarrow":
            out = fn(pa.table({c: pa.array(v) for c, v in cols_np.items()}))
        else:
            out = fn(pd.DataFrame(cols_np, copy=False))
        if isinstance(out, pd.DataFrame):
            out = pa.Table.from_pandas(out, preserve_index=False)
        return out.replace_schema_metadata(None)

    # batch_size=None: pack per WHOLE upstream block — bundling blocks
    # into bigger batches was measured SLOWER (breaks streaming overlap;
    # pack tasks idle until a bundle fills)
    return ds.map_batches(pack, batch_format="pyarrow", batch_size=None) \
        .groupby("_part").map_groups(run, batch_format="pyarrow")
