"""Stable, cross-process/cross-engine hashing primitives.

Everything here is md5-derived so the exact same values are reproducible in
NumPy, plain Python and DuckDB SQL (``md5(...)``) — which lets the driver's
DuckDB oracle recompute our minhashes/fingerprints bit-for-bit. Never use
Python's builtin ``hash`` (salted per process) or NumPy RNG state here.
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE61 = (1 << 61) - 1


def stable_u64(s: str) -> int:
    """First 8 bytes of md5(s) as an unsigned big-endian integer."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def md5_num(s: str) -> int:
    """md5 digest as a little-endian 128-bit integer — bit-identical to
    DuckDB's ``md5_number()`` (verified empirically), so SQL oracles can
    recompute every signature derived from this."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest(), "little")


def stable_u64_array(strings) -> np.ndarray:
    """Vectorized-ish stable_u64 over an iterable of strings → uint64."""
    return np.fromiter((stable_u64(s) for s in strings), dtype=np.uint64)


def stable_u64_pair_array(strings) -> tuple[np.ndarray, np.ndarray]:
    """TWO independent uint64 hashes per string from ONE md5 each — bytes
    [0:8) and [8:16) of the digest, big-endian. Callers that key on hash
    equality at corpus scale carry both so the effective collision width
    is 128 bits (the dedup_paragraphs md5 precedent) at zero extra md5
    cost."""
    a = np.empty(len(strings), dtype=np.uint64)
    b = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        d = hashlib.md5(s.encode("utf-8")).digest()
        a[i] = int.from_bytes(d[:8], "big")
        b[i] = int.from_bytes(d[8:], "big")
    return a, b


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) multiply-shift parameters for num_perm
    permutations over the Mersenne prime 2^61-1. Derived from md5(seed,i)
    so DuckDB can regenerate them (scripts embed the literals instead)."""
    a = np.empty(num_perm, dtype=np.uint64)
    b = np.empty(num_perm, dtype=np.uint64)
    for i in range(num_perm):
        a[i] = stable_u64(f"minhash-a-{seed}-{i}") % (MERSENNE61 - 1) + 1
        b[i] = stable_u64(f"minhash-b-{seed}-{i}") % MERSENNE61
    return a, b


def _mod61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61 - 1) for uint64 x (Mersenne reduction, branch-free)."""
    p = np.uint64(MERSENNE61)
    x = (x >> np.uint64(61)) + (x & p)
    x = (x >> np.uint64(61)) + (x & p)
    return np.where(x >= p, x - p, x)


def mulmod61(a, h: np.ndarray) -> np.ndarray:
    """(a * h) mod (2^61 - 1), fully vectorized in uint64 — the 128-bit
    product is split 31/30 bits so every partial fits 64 bits:

      a = a1·2^31 + a0,  h = h1·2^31 + h0   (a, h < 2^61)
      a·h = a1·h1·2^62 + (a1·h0 + a0·h1)·2^31 + a0·h0,  2^62 ≡ 2 (mod p)

    This replaces the per-element Python-int loop in minhash/simhash paths.
    """
    a = np.asarray(a, dtype=np.uint64)
    h = np.asarray(h, dtype=np.uint64)
    mask31 = np.uint64((1 << 31) - 1)
    a1, a0 = a >> np.uint64(31), a & mask31
    h1, h0 = h >> np.uint64(31), h & mask31
    hi = _mod61(a1 * h1 * np.uint64(2))          # a1·h1·2^62 mod p
    mid = _mod61(a1 * h0 + a0 * h1)              # < 2^62, fits
    # mid·2^31 mod p: split mid 30/31 so the shifted halves fit
    m1, m0 = mid >> np.uint64(30), mid & np.uint64((1 << 30) - 1)
    mid = _mod61(m1 + (m0 << np.uint64(31)))     # 2^61 ≡ 1
    lo = _mod61(a0 * h0)
    return _mod61(hi + mid + lo)


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Signature of one set: min((a*h + b) mod p) per permutation.

    ``hashes``: uint64 element hashes (already reduced mod p).
    Uses Python ints for the multiply to avoid 64-bit overflow; num_perm and
    set sizes are small enough that object-mode math here is not a hot path —
    the vectorized batch variant lives in stages/dedup.py.
    """
    h = hashes.astype(object)
    out = np.empty(len(a), dtype=np.uint64)
    for i in range(len(a)):
        out[i] = int(min((int(a[i]) * x + int(b[i])) % MERSENNE61 for x in h)) if len(h) else 0
    return out
