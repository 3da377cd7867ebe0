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
