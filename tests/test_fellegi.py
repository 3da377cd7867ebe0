"""Fellegi-Sunter probabilistic linkage (stages/fellegi.py)."""

import duckdb
import numpy as np
import pytest
import ray.data

from blurrily_ray.stages.fellegi import (
    N_FIELDS,
    fs_agreements,
    fs_em,
    fs_pattern_counts,
    fs_score_pairs,
    fs_weights,
    score_with_weights,
)


def synth_counts(m, u, p, n=1_000_000):
    """Exact expected pattern counts under the FS independence model."""
    counts = np.zeros(1 << N_FIELDS)
    for pat in range(1 << N_FIELDS):
        g = [(pat >> k) & 1 for k in range(N_FIELDS)]
        pm = p * np.prod([m[k] if g[k] else 1 - m[k] for k in range(N_FIELDS)])
        pu = (1 - p) * np.prod([u[k] if g[k] else 1 - u[k]
                                for k in range(N_FIELDS)])
        counts[pat] = n * (pm + pu)
    return counts


def test_em_recovers_planted_parameters():
    m_true = np.array([0.95, 0.9, 0.85])
    u_true = np.array([0.05, 0.2, 0.1])
    counts = synth_counts(m_true, u_true, 0.2)
    est = fs_em(counts, iters=500)
    # label order: EM may swap match/non-match classes; the planted gap
    # is wide so it does not here
    assert np.allclose(est["m"], m_true, atol=0.02), est["m"]
    assert np.allclose(est["u"], u_true, atol=0.02), est["u"]
    assert abs(est["p"] - 0.2) < 0.02


def test_em_deterministic_and_finite():
    counts = np.array([5000, 300, 200, 50, 40, 10, 5, 100])
    a = fs_em(counts)
    b = fs_em(counts)
    assert np.array_equal(a["m"], b["m"]) and np.array_equal(a["u"], b["u"])
    w = fs_weights(a["m"], a["u"])
    assert np.isfinite(w).all()


def test_em_empty_counts_defaults():
    est = fs_em(np.zeros(1 << N_FIELDS))
    assert est["p"] == 0.1
    assert np.isfinite(fs_weights(est["m"], est["u"])).all()


def test_all_agree_scores_highest():
    """Monotonicity on real data: the all-agree pattern must out-score
    every other observed pattern (m > u on every field here)."""
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    scored, params = fs_score_pairs(docs)
    df = scored.to_pandas()
    assert len(df) > 0
    by_pat = df.groupby("pattern")["fs_micro"].first()
    full = (1 << N_FIELDS) - 1
    if full in by_pat.index:
        assert by_pat[full] == by_pat.max()
    # per-pattern scores are constant (score is a function of pattern)
    assert (df.groupby("pattern")["fs_micro"].nunique() == 1).all()


def test_pattern_counts_match_driver():
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    scored, params = fs_score_pairs(docs)
    df = scored.to_pandas()
    exp = np.bincount(df["pattern"].to_numpy(), minlength=1 << N_FIELDS)
    assert np.array_equal(params["counts"], exp)


def test_score_floor_matches_duckdb_expression():
    """The micro-int floor of the fixed-order float sum must bit-match
    DuckDB evaluating the same repr literals — across sign changes."""
    from blurrily_ray import oracles

    w = fs_weights(np.array([0.93, 0.88, 0.97]),
                   np.array([0.11, 0.33, 0.02]))
    rows = [{"a": 1, "b": 2, "g0": g0, "g1": g1, "g2": g2,
             "pattern": g0 + 2 * g1 + 4 * g2}
            for g0 in (0, 1) for g1 in (0, 1) for g2 in (0, 1)]
    got = score_with_weights(ray.data.from_items(rows), w).to_pandas()
    got = got.set_index("pattern")["fs_micro"]
    lit = [(repr(float(r[0])), repr(float(r[1]))) for r in w]
    for r in rows:
        expr = " + ".join(
            f"({r[f'g{k}']} * {wa} + (1 - {r[f'g{k}']}) * {wd})"
            for k, (wa, wd) in enumerate(lit))
        exp = duckdb.execute(
            f"SELECT CAST(FLOOR(({expr}) * 1e6) AS BIGINT)").fetchone()[0]
        assert got[r["pattern"]] == exp
