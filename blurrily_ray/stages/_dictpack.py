"""Per-block DICTIONARY-packed exchange primitives for string-keyed
shuffles (the sharded scorer's pair streams).

Plain string packing (one offsets+bytes segment per row run) was built
and REJECTED in round 3 — it shipped every ref once PER PAIR and paid an
Arrow→object rebuild on the consumer (_packed.py's docstring carries the
numbers). This module is the per-block dictionary variant that removes
both costs without any global surrogate map (none may exist in sharded
mode — the corpus never fits one process):

- each producer block dictionary-encodes its refs PER TARGET PARTITION
  (``pyarrow.compute.dictionary_encode``, hash-based, C); the blob ships
  each distinct ref once per (block, partition) plus int32 codes, so the
  all-to-all moves n_blocks × n_parts blob rows and near-minimal bytes;
- the consumer rebuilds each blob's dictionary ZERO-COPY
  (``StringArray.from_buffers`` over views of the combined Arrow data
  buffer), unifies dictionaries with one more ``dictionary_encode``, and
  works in int32-code space throughout — strings only materialize for
  rows that survive (via Arrow ``take``, never Python objects).

Blob framing: an int64 header segment, then data segments each padded to
8 bytes so int64 views stay aligned in the combined buffer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pad8(n: int) -> int:
    return (n + 7) & ~7


def str_segments(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """StringArray → (int32 offsets rebased to 0, raw utf8 bytes)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], np.int32)[arr.offset:
                                            arr.offset + len(arr) + 1]
    if bufs[2] is None:
        return np.zeros(len(arr) + 1, np.int32), np.empty(0, np.uint8)
    base = int(offs[0])
    data = np.frombuffer(bufs[2], np.uint8)[base:int(offs[-1])]
    return (offs - base if base else offs).astype(np.int32, copy=False), \
        data


def str_from_segments(offsets: np.ndarray, data: np.ndarray) -> pa.Array:
    """(int32 offsets, utf8 bytes) → StringArray, zero-copy over the
    backing numpy views (kept alive by the returned array's buffers)."""
    return pa.Array.from_buffers(
        pa.utf8(), len(offsets) - 1,
        [None, pa.py_buffer(np.ascontiguousarray(offsets)),
         pa.py_buffer(np.ascontiguousarray(data))])


def pack_blobs(parts: np.ndarray, blob_segments: list[list[np.ndarray]],
               ) -> pa.Table:
    """One (``_part``, ``blob``) row per target partition: each blob is
    its segments (numpy arrays of any fixed-width dtype) back-to-back,
    each padded to 8 bytes."""
    if not len(parts):
        return pa.table({"_part": pa.array([], pa.int64()),
                         "blob": pa.array([], pa.large_binary())})
    sizes = np.array([sum(_pad8(a.nbytes) for a in segs)
                      for segs in blob_segments], dtype=np.int64)
    offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    buf = np.zeros(int(offsets[-1]), dtype=np.uint8)
    for i, segs in enumerate(blob_segments):
        pos = int(offsets[i])
        for a in segs:
            nb = a.nbytes
            if nb:
                buf[pos:pos + nb] = np.ascontiguousarray(a).view(np.uint8)
            pos += _pad8(nb)
    blob = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(sizes),
        [None, pa.py_buffer(offsets), pa.py_buffer(buf)])
    return pa.table({"_part": pa.array(np.asarray(parts, dtype=np.int64)),
                     "blob": blob})


class BlobReader:
    """Sequential zero-copy segment views over one blob in the combined
    binary buffer."""

    def __init__(self, data: np.ndarray, pos: int):
        self._data = data
        self._pos = int(pos)

    def seg(self, count: int, dtype) -> np.ndarray:
        dt = np.dtype(dtype)
        nb = int(count) * dt.itemsize
        out = self._data[self._pos:self._pos + nb].view(dt)
        self._pos += _pad8(nb)
        return out


def iter_blobs(table: pa.Table):
    """Yield a :class:`BlobReader` per blob row of an exchanged table."""
    col = table["blob"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # 0-chunk edge
        if col.num_chunks == 0:
            return
        col = col.chunk(0)
    bufs = col.buffers()
    if bufs[2] is None:
        return
    offs = np.frombuffer(bufs[1], np.int64)
    data = np.frombuffer(bufs[2], np.uint8)
    for i in range(len(col)):
        yield BlobReader(data, offs[col.offset + i])


def unify_dicts(dicts: list[pa.Array]) -> tuple[pa.Array, list[np.ndarray]]:
    """Per-blob dictionaries → (global dictionary, per-blob code remap):
    ``remap[i][local_code]`` is the global code. One hash pass in C."""
    import pyarrow.compute as pc

    combined = pa.concat_arrays(dicts)
    enc = pc.dictionary_encode(combined)
    gcodes = enc.indices.to_numpy(zero_copy_only=False)
    remaps, pos = [], 0
    for d in dicts:
        remaps.append(gcodes[pos:pos + len(d)])
        pos += len(d)
    return enc.dictionary, remaps
