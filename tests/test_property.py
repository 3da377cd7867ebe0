"""Property-based parity tests (hypothesis): the vectorized Arrow/NumPy
kernels must equal the scalar gold implementations on arbitrary input."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from blurrily_ray.functions.normalize import normalize_array, normalize_string
from blurrily_ray.functions.trigram import NUM_TRIGRAMS, explode_batch, tokenize

texts = st.lists(st.text(max_size=60), min_size=1, max_size=30)
ascii_norm = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz ", max_size=40),
    min_size=1, max_size=30)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_normalize_array_matches_scalar(raws):
    got = normalize_array(pa.array(raws, type=pa.string())).to_pylist()
    assert got == [normalize_string(r) for r in raws]


@settings(max_examples=200, deadline=None)
@given(ascii_norm)
def test_explode_matches_tokenize(raws):
    doc_idx, codes, lengths = explode_batch(pa.array(raws, type=pa.string()))
    assert lengths.tolist() == [len(r) for r in raws]
    for i, r in enumerate(raws):
        assert codes[doc_idx == i].tolist() == tokenize(r)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80))
def test_pipeline_composition_bounds(raw):
    norm = normalize_string(raw)
    codes = tokenize(norm)
    assert len(codes) == len(set(codes))
    assert all(0 <= c < NUM_TRIGRAMS for c in codes)
    # L+1 windows before dedup bounds the distinct count
    assert 1 <= len(codes) <= len(norm) + 1


# --- codecs ---------------------------------------------------------------

import numpy as np


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.sampled_from([3, 4]),
       st.integers(0, 2**32 - 1))
def test_png_roundtrip_any_shape(h, w, ch, seed):
    from blurrily_ray.stages.multimodal import decode_png, encode_png

    px = np.random.default_rng(seed).integers(0, 256, (h, w, ch)) \
        .astype(np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_any_shape(h, w, seed):
    from blurrily_ray.stages.multimodal import decode_bmp, encode_bmp

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3)) \
        .astype(np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()


# --- join kernels (partition function vs whole-table pandas gold) ---------

@settings(max_examples=40, deadline=None)
@given(st.integers(1, 60), st.integers(1, 60), st.integers(1, 4),
       st.integers(0, 2**31 - 1))
def test_range_count_partition_kernel_matches_bruteforce(nl, nr, users, seed):
    """The per-partition interval-count kernel (single partition = no
    hashing in play) must equal the O(n²) reference for arbitrary data,
    including duplicate timestamps and bucket-edge values."""
    import pandas as pd
    import ray.data as rd

    from blurrily_ray.stages.joins import range_join_count

    rng = np.random.default_rng(seed)
    lo, hi = 0, 50
    left = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64),
        "user_id": rng.integers(0, users, nl).astype(np.int64),
        "ts_us": rng.integers(0, 300, nl).astype(np.int64)})
    right = pd.DataFrame({
        "user_id": rng.integers(0, users, nr).astype(np.int64),
        "ts_us": rng.integers(0, 300, nr).astype(np.int64)})
    got = range_join_count(rd.from_pandas(left), rd.from_pandas(right),
                           id_col="event_id", on="ts_us", lo=lo, hi=hi,
                           by="user_id", out_col="n", n_parts=3) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = [int(((right.user_id == e.user_id) & (right.ts_us > e.ts_us + lo)
                & (right.ts_us <= e.ts_us + hi)).sum())
           for _, e in left.iterrows()]
    assert got["n"].tolist() == exp


# --- round-2 additions ----------------------------------------------------

import re as _re


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 2**64 - 1))
def test_hll_rank_matches_bit_length(h):
    from blurrily_ray.stages.sketch import HLL_P, _ranks

    bucket, rank = _ranks(np.array([h], dtype=np.uint64))
    assert bucket[0] == h >> (64 - HLL_P)
    rem = h & ((1 << (64 - HLL_P)) - 1)
    assert rank[0] == (64 - HLL_P) + 1 - rem.bit_length()
    assert 0 <= bucket[0] < (1 << HLL_P) and 1 <= rank[0] <= 57


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdefgh@.-0123456789 <>", max_size=80))
def test_redact_counts_match_re_findall(text):
    from blurrily_ray.stages.redact import EMAIL_RE, IP_RE, PHONE_RE

    import pandas as pd

    s = pd.Series([text])
    for pat in (EMAIL_RE, PHONE_RE, IP_RE):
        assert s.str.count(pat, flags=_re.ASCII).iloc[0] == \
            len(_re.findall(pat, text, _re.ASCII))


@settings(max_examples=100, deadline=None)
@given(st.floats(0, 1e8, allow_nan=False, allow_infinity=False))
def test_micros_matches_python_floor(x):
    import math

    from blurrily_ray.stages.relational import _micros

    assert _micros(np.array([x]))[0] == int(math.floor(np.float64(x) * 1e6))
