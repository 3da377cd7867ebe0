"""Normalization parity fixtures (FIXTURES.md §2; reference map.rb:40-47)."""

import pyarrow as pa
import pytest

from blurrily_ray.functions.normalize import normalize_array, normalize_string

CASES = [
    ("Puy-de-Dôme", "puy de dome"),  # README.md:104-105
    ("@€%é", "e"),  # map_spec.rb:55-59
    ("London", "london"),
    ("  a   b  ", "a b"),
    ("", ""),
    ("New York", "new york"),
    ("london city airport", "london city airport"),
    ("a1b\t c!", "a b c"),
    ("ÀÉÎÕÜ", "aeiou"),
    ("naïve café", "naive cafe"),
    ("123", ""),
    ("   ", ""),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_string(raw, expected):
    assert normalize_string(raw) == expected


def test_normalize_array_matches_scalar():
    raws = [c[0] for c in CASES]
    out = normalize_array(pa.array(raws, type=pa.string())).to_pylist()
    assert out == [c[1] for c in CASES]


def test_normalize_array_pure_ascii_fast_path():
    raws = ["hello world", "FOO  BAR", "a-b_c", ""]
    out = normalize_array(pa.array(raws)).to_pylist()
    assert out == [normalize_string(r) for r in raws]
