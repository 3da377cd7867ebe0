"""String normalization with exact parity to the reference.

Reference semantics (lib/blurrily/map.rb:40-47 in /root/reference):

1. ``downcase`` (unicode-aware).
2. Unless the lowered string matches ``/^([a-z ])+$/``: NFKD-decompose,
   drop non-ASCII bytes, replace every non-``[a-z]`` char with a space.
3. Collapse whitespace runs to a single space; strip both ends.

``Puy-de-Dôme`` → ``puy de dome``; ``@€%é`` → ``e``; ``''`` → ``''``
(README.md:104-105, spec/blurrily/map_spec.rb:55-59).

Two implementations:

- :func:`normalize_string` — pure-Python scalar, the semantic gold standard
  used by unit tests and tiny fixture paths.
- :func:`normalize_array` — vectorized over a ``pyarrow`` string array for
  map_batches hot paths. ASCII rows stay fully inside Arrow compute kernels
  (zero Python per-row work); only rows containing non-ASCII bytes take a
  per-row NFKD fallback, mirroring the reference's own fast/slow split.
"""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

_PURE_RE = re.compile(r"^([a-z ])+$")
_NON_ALPHA_RE = re.compile(r"[^a-z]")
_WS_RE = re.compile(r"\s+")


def normalize_string(needle: str) -> str:
    """Scalar reference-parity normalizer (map.rb:40-47)."""
    result = needle.lower()
    if not _PURE_RE.match(result):
        result = unicodedata.normalize("NFKD", result)
        result = result.encode("ascii", "ignore").decode("ascii")
        result = _NON_ALPHA_RE.sub(" ", result)
    return _WS_RE.sub(" ", result).strip()


def _ascii_fold(s: str) -> str:
    """NFKD-decompose and drop non-ASCII bytes (slow path, rare rows)."""
    return unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")


def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized normalizer over an Arrow string array.

    Equivalent to ``[normalize_string(x) for x in arr]`` for every input.
    For ASCII input the reference's two branches collapse into one kernel:
    replacing every run of non-``[a-z]`` chars with a single space and
    trimming is identical to (replace non-letters with ' ') + (collapse
    ``\\s+``) + strip, and is also identical to collapse+strip alone for
    strings already matching ``^[a-z ]+$``.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # NULL text == '' (reference put semantics; every downstream stage
    # and the SQL oracles treat a missing document body as empty)
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    lowered = pc.utf8_lower(arr)
    # ASCII detection without regex: byte length == codepoint length.
    is_ascii = pc.equal(pc.binary_length(lowered), pc.utf8_length(lowered))
    if not pc.min(is_ascii).as_py():
        # Rare path: fold non-ASCII rows in Python, then rejoin.
        mask = is_ascii.to_numpy(zero_copy_only=False)
        py = lowered.to_pylist()
        folded = [
            (s if ok else _ascii_fold(s)) if s is not None else None
            for s, ok in zip(py, mask)
        ]
        lowered = pa.array(folded, type=pa.string())
    collapsed = pc.replace_substring_regex(lowered, pattern="[^a-z]+", replacement=" ")
    return pc.utf8_trim(collapsed, characters=" ")
