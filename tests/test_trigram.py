"""Tokenizer parity fixtures (FIXTURES.md §3; reference tokeniser.c:59-119)."""

import numpy as np
import pyarrow as pa
import pytest

from blurrily_ray.functions.trigram import (
    NUM_TRIGRAMS,
    code_to_string,
    explode_batch,
    string_to_code,
    tokenize,
)

COUNT_CASES = [
    ("foobar", 7),  # map_spec.rb:32-41
    ("", 1),  # map_spec.rb:49-53
    ("e", 2),  # map_spec.rb:55-59
    ("london", 7),  # map_spec.rb:158-161
    ("paris", 6),  # integration_spec.rb:31-35
    ("new york", 9),  # README.md:117-119
    ("great london", 13),  # 12 chars ⇒ 13 windows, all distinct (weight=12=len)
]

STRING_CASES = {
    "foobar": ["**f", "*fo", "foo", "oob", "oba", "bar", "ar*"],
    "": ["***"],
    "e": ["**e", "*e*"],
    "london": ["**l", "*lo", "lon", "ond", "ndo", "don", "on*"],
    "paris": ["**p", "*pa", "par", "ari", "ris", "is*"],
    "new york": ["**n", "*ne", "new", "ew*", "w*y", "*yo", "yor", "ork", "rk*"],
}


@pytest.mark.parametrize("text,count", COUNT_CASES)
def test_distinct_trigram_counts(text, count):
    assert len(tokenize(text)) == count


@pytest.mark.parametrize("text,tris", STRING_CASES.items())
def test_trigram_strings(text, tris):
    assert tokenize(text) == sorted(string_to_code(t) for t in tris)


def test_codec_roundtrip():
    # Only codes whose base-28 digits are 0 ('*') or 1..26 (letters) are
    # reachable; digit 27 is unused (the reference's code_to_string would
    # emit '{' for it too).
    for code in [0, 1, 26, 28, 784, string_to_code("zzz"), string_to_code("abc")]:
        assert string_to_code(code_to_string(code)) == code
    assert string_to_code("abc") == 1 + 28 * 2 + 784 * 3
    assert string_to_code("***") == 0


def test_explode_batch_matches_scalar():
    texts = [c[0] for c in COUNT_CASES] + ["a b c", "zzz", ""]
    doc_idx, codes, lengths = explode_batch(pa.array(texts))
    assert lengths.tolist() == [len(t) for t in texts]
    for i, t in enumerate(texts):
        got = codes[doc_idx == i].tolist()
        assert got == tokenize(t), t


def test_explode_batch_sliced_array():
    arr = pa.array(["xxxx", "london", "paris"])[1:]
    doc_idx, codes, lengths = explode_batch(arr)
    assert codes[doc_idx == 0].tolist() == tokenize("london")
    assert codes[doc_idx == 1].tolist() == tokenize("paris")


def test_explode_batch_empty():
    doc_idx, codes, lengths = explode_batch(pa.array([], type=pa.string()))
    assert len(doc_idx) == 0 and len(codes) == 0


def test_explode_batch_large_random():
    rng = np.random.RandomState(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    texts = ["".join(rng.choice(letters, rng.randint(0, 40))) for _ in range(500)]
    doc_idx, codes, _ = explode_batch(pa.array(texts))
    for i in rng.choice(len(texts), 40, replace=False):
        assert codes[doc_idx == i].tolist() == tokenize(texts[i])
