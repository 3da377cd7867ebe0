"""Jaro-Winkler verify stage (stages/stringsim.py).

The bit-parallel kernel is pinned two independent ways: a classic
O(l1·window) reference scan (textbook matching loop, written here) and
DuckDB's jaro_winkler_similarity() — the oracle dialect — via
hypothesis sweeps. Bit-for-bit float64 equality is the contract (the
oracle exports FLOOR(jw·1e6) micro-ints and thresholds on the float).
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from blurrily_ray.stages.editdist import normalized_texts
from blurrily_ray.stages.stringsim import (
    jaro_winkler,
    jw_verify_edges,
    jw_verify_pairs,
)


def jw_reference(s1: str, s2: str) -> float:
    """Textbook O(l1·window) scan, DuckDB conventions (both-empty → 0,
    integer-halved transpositions, >0.7 boost gate, 4-char prefix)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(0, max(l1, l2) // 2 - 1)
    m2 = [False] * l2
    a_chars, j_used = [], []
    for i in range(l1):
        for j in range(max(0, i - window), min(l2, i + window + 1)):
            if not m2[j] and s2[j] == s1[i]:
                m2[j] = True
                a_chars.append(s1[i])
                break
    m = len(a_chars)
    if m == 0:
        return 0.0
    b_chars = [s2[j] for j in range(l2) if m2[j]]
    t = sum(1 for x, y in zip(a_chars, b_chars) if x != y) // 2
    sim = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if sim > 0.7:
        pl = 0
        for x, y in zip(s1, s2):
            if x == y and pl < 4:
                pl += 1
            else:
                break
        sim += pl * 0.1 * (1.0 - sim)
    return sim


TXT = st.text(alphabet="ab c", max_size=40)
ASCII = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=30)


@settings(max_examples=300, deadline=None)
@given(TXT, TXT)
def test_kernel_matches_reference_scan(a, b):
    assert jaro_winkler(a, b) == jw_reference(a, b)


@settings(max_examples=150, deadline=None)
@given(ASCII, ASCII)
def test_kernel_matches_duckdb_bitwise(a, b):
    exp = duckdb.execute("SELECT jaro_winkler_similarity(?, ?)",
                         [a, b]).fetchone()[0]
    assert jaro_winkler(a, b) == exp


def test_kernel_edges():
    assert jaro_winkler("", "") == 0.0  # DuckDB dialect, not textbook 1.0
    assert jaro_winkler("", "abc") == 0.0
    assert jaro_winkler("abc", "") == 0.0
    assert jaro_winkler("same", "same") == 1.0
    assert jaro_winkler("martha", "marhta") == pytest.approx(
        0.9611111111111111, abs=0)
    assert jaro_winkler("xy", "yx") == jw_reference("xy", "yx")


def _docs_ds():
    import ray.data

    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "the quick brown fox jumps over the lazy cat"},
        {"doc_id": 3, "text": "The QUICK brown fox jumped over a lazy dog!"},
        {"doc_id": 4, "text": "completely unrelated payload about parquet"},
        {"doc_id": 5, "text": "another unrelated string with zero overlap"},
    ]
    return ray.data.from_items(rows)


def test_jw_verify_pairs_end_to_end():
    out = jw_verify_pairs(_docs_ds(), min_sim=0.8).to_pandas()
    got = {(min(a, b), max(a, b)): w
           for a, b, w in zip(out["a"], out["b"], out["jw_micro"])}
    assert (1, 2) in got and (1, 3) in got
    for (a, b) in got:
        assert not {a, b} & {4, 5}, "unrelated docs must not pair"
    # micro scores exact vs DuckDB on the engine-normalized strings
    texts = {r["ref"]: r["_nt"]
             for r in normalized_texts(_docs_ds()).take_all()}
    for (a, b), w in got.items():
        exp = duckdb.execute(
            "SELECT CAST(FLOOR(jaro_winkler_similarity(?, ?) * 1e6)"
            " AS BIGINT)", [texts[a], texts[b]]).fetchone()[0]
        assert w == exp


def test_jw_verify_threshold_excludes():
    # nothing in the fixture reaches 0.999 — empty result
    out = jw_verify_pairs(_docs_ds(), min_sim=0.999).to_pandas()
    assert len(out) == 0


def test_jw_verify_broadcast_join_prefilter_pinned_equal():
    """Broadcast vs co-partition attach AND prefilter-on vs -off must all
    produce identical rows (the length gate is a provable upper bound —
    never a false drop)."""
    from blurrily_ray.stages.editdist import PAIR_MODE
    from blurrily_ray.stages.pairs import (blocking_keys,
                                           candidate_pairs_fused_blocking,
                                           docsets_bitsets_ref,
                                           score_pairs_fused,
                                           trigram_histogram)
    from blurrily_ray.stages.tokenize import docsets_from_docs

    docs = _docs_ds()
    docsets = docsets_from_docs(docs, ref_col="doc_id",
                                text_col="text").materialize()
    lut_ref = docsets_bitsets_ref(docsets)
    keys = blocking_keys(docsets, trigram_histogram(docsets), PAIR_MODE,
                         lut_ref=lut_ref)
    pairs, _ = candidate_pairs_fused_blocking(keys, PAIR_MODE, int_refs=True)
    edges = score_pairs_fused(pairs, cfg=PAIR_MODE, lut_ref=lut_ref,
                              surrogate=True, packed=True).materialize()
    texts = normalized_texts(docs).materialize()
    key = ["a", "b", "matches", "jw_micro"]

    def run(mode, gate):
        df = jw_verify_edges(edges, texts, min_sim=0.8, mode=mode,
                             weights_are_lengths=gate).to_pandas()
        return df[key].sort_values(key).reset_index(drop=True)

    base = run("broadcast", True)
    pd.testing.assert_frame_equal(base, run("join", True))
    pd.testing.assert_frame_equal(base, run("broadcast", False))


def test_jw_verify_edges_missing_ref_drops():
    import ray.data

    edges = ray.data.from_items(
        [{"a": 1, "b": 2, "matches": 7}, {"a": 1, "b": 99, "matches": 5}])
    texts = normalized_texts(_docs_ds())
    out = jw_verify_edges(edges, texts, min_sim=0.0).to_pandas()
    assert set(zip(out["a"], out["b"])) == {(1, 2)}
