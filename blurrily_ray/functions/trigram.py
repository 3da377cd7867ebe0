"""Trigram tokenizer with exact parity to the reference, vectorized.

Reference semantics (ext/blurrily/tokeniser.c:59-119 in /root/reference):

- pad the normalized string: ``"**" + s + "*"``, spaces → ``*``
  (tokeniser.c:65-70);
- emit the L+1 sliding 3-char windows, each encoded base-28 as
  ``code = c0 + 28*c1 + 784*c2`` with ``'a'..'z'`` → 1..26 and anything
  else (``*``/pad/non-letter) → 0 (tokeniser.c:21-31);
- sort codes ascending and deduplicate: each string contributes a *set*
  of trigrams (tokeniser.c:93-107).

``"foobar"`` → 7 codes (``**f,*fo,foo,oob,oba,bar,ar*``); ``""`` → 1 code
(``***`` = 0); ``"new york"`` → 9 codes (README.md:117-119).

Scalar :func:`tokenize` is the gold standard; :func:`explode_batch` is the
vectorized hot path: it reads the Arrow string column's raw offset/data
buffers (zero copy), builds one padded code array for the whole batch with
NumPy scatter ops, and extracts all windows with a single gather — no
Python-level per-row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TRIGRAM_BASE = 28
NUM_TRIGRAMS = TRIGRAM_BASE**3  # 21952, storage.c:30

# Byte → base-28 symbol value: 'a'..'z' → 1..26, everything else → 0.
_BYTE_VAL = np.zeros(256, dtype=np.uint16)
_BYTE_VAL[ord("a") : ord("z") + 1] = np.arange(1, 27, dtype=np.uint16)


def string_to_code(tri: str) -> int:
    """Encode one 3-char trigram (tokeniser.c:21-31)."""
    code = 0
    for k, ch in enumerate(tri[:3]):
        if "a" <= ch <= "z":
            code += (TRIGRAM_BASE**k) * (ord(ch) - ord("a") + 1)
    return code


def code_to_string(code: int) -> str:
    """Decode a trigram code for debugging/metrics (tokeniser.c:35-46)."""
    out = []
    for k in range(3):
        elem = (code // TRIGRAM_BASE**k) % TRIGRAM_BASE
        out.append("*" if elem == 0 else chr(ord("a") + elem - 1))
    return "".join(out)


def tokenize(normalized: str) -> list[int]:
    """Distinct sorted trigram codes of a normalized string (scalar gold)."""
    padded = "**" + normalized.replace(" ", "*") + "*"
    codes = {string_to_code(padded[k : k + 3]) for k in range(len(normalized) + 1)}
    return sorted(codes)


def _string_array_views(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets, data-bytes) views of a pa.StringArray."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return offsets, data


def _concat_ranges(counts: np.ndarray) -> np.ndarray:
    """Vectorized ``concatenate([arange(c) for c in counts])``."""
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    out -= np.repeat(starts, counts)
    return out


def explode_batch(texts: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized trigram explode of a batch of normalized strings.

    Returns ``(doc_idx, codes, lengths)`` where ``doc_idx[i]`` is the row
    index in ``texts`` owning distinct trigram ``codes[i]`` (codes sorted
    ascending within each doc), and ``lengths`` is the per-row byte length
    of the normalized text (the reference's default weight, storage.c:409).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.uint16), e
    offsets, data = _string_array_views(texts)
    lengths = np.diff(offsets).astype(np.int64)

    # Padded layout: each doc occupies 3 + L slots ("**" + body + "*"); the
    # value array is pre-zeroed so pad slots (and the 2 sentinel slots at the
    # very end) already encode '*' = 0. Scatter the body symbol values in.
    pad_lengths = lengths + 3
    pad_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(pad_lengths[:-1], out=pad_starts[1:])
    total_padded = int(pad_lengths.sum()) + 2
    vals = np.zeros(total_padded, dtype=np.uint16)

    body = _BYTE_VAL[data[offsets[0] : offsets[-1]]]
    if body.size:
        # dest index = source index + per-doc shift
        shifts = (pad_starts + 2) - (offsets[:-1].astype(np.int64) - int(offsets[0]))
        dest = np.arange(body.size, dtype=np.int64) + np.repeat(shifts, lengths)
        vals[dest] = body

    # All windows: doc i contributes L_i + 1 windows starting at pad_starts[i].
    win_counts = lengths + 1
    win_starts = np.repeat(pad_starts, win_counts) + _concat_ranges(win_counts)
    codes = vals[win_starts] + TRIGRAM_BASE * vals[win_starts + 1] + (TRIGRAM_BASE**2) * vals[win_starts + 2]
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), win_counts)

    # Per-doc distinct (tokeniser.c:96-107): unique on (doc, code) composite.
    key = doc_idx * np.int64(NUM_TRIGRAMS) + codes.astype(np.int64)
    key = np.unique(key)
    doc_idx = key // NUM_TRIGRAMS
    codes = (key % NUM_TRIGRAMS).astype(np.uint16)
    return doc_idx, codes, lengths
