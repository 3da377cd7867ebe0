"""Generic relational operators (stages/relational.py) and PII redaction
(stages/redact.py): pandas-merge references on seeded random inputs, join
strategy equivalence (broadcast == shuffle), and redaction edge cases.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from blurrily_ray.stages.redact import redact_pii
from blurrily_ray.stages.relational import (broadcast_join, hash_join,
                                            pricing_summary)


def _sides(n=300, keys=40, seed=5):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, keys, n).astype(np.int64),
        "lv": rng.integers(0, 1000, n).astype(np.int64)})
    # right: unique keys, some keys absent from the dim
    rk = np.arange(0, keys, 2, dtype=np.int64)
    right = pd.DataFrame({"rk": rk, "rv": rk * 10 + 1})
    return left, right


def test_broadcast_join_inner_matches_pandas():
    left, right = _sides()
    got = broadcast_join(rd.from_pandas(left), right, on="k",
                         right_on="rk").to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk")[["k", "lv", "rv"]]
    key = ["k", "lv", "rv"]
    assert got[key].sort_values(key).reset_index(drop=True).equals(
        exp.sort_values(key).reset_index(drop=True))


def test_broadcast_join_left_nullfills_misses():
    left, right = _sides()
    got = broadcast_join(rd.from_pandas(left), right, on="k",
                         right_on="rk", how="left").to_pandas()
    assert len(got) == len(left)
    miss = got[got.k % 2 == 1]
    assert miss["rv"].isna().all()
    hit = got[got.k % 2 == 0]
    assert (hit["rv"].astype(np.int64) == hit["k"] * 10 + 1).all()


def test_hash_join_matches_broadcast_join():
    left, right = _sides(n=500, keys=60, seed=7)
    a = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="k", right_on="rk", n_parts=9).to_pandas()
    b = broadcast_join(rd.from_pandas(left), right, on="k",
                       right_on="rk").to_pandas()
    cols = ["k", "lv", "rv"]
    assert a[cols].sort_values(cols).reset_index(drop=True).equals(
        b[cols].sort_values(cols).reset_index(drop=True))


def test_broadcast_join_rejects_dup_keys():
    left, _ = _sides()
    dup = pd.DataFrame({"rk": np.array([1, 1], dtype=np.int64),
                        "rv": np.array([2, 3], dtype=np.int64)})
    import pytest

    with pytest.raises(ValueError, match="unique"):
        broadcast_join(rd.from_pandas(left), dup, on="k", right_on="rk")


def test_pricing_summary_matches_pandas():
    rng = np.random.default_rng(11)
    n = 2000
    li = pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_linestatus": rng.choice(["F", "O"], n),
        "l_quantity": rng.integers(1, 51, n).astype(float),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n), 2),
    })
    got = pricing_summary(rd.from_pandas(li)).to_pandas() \
        .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    df = li.copy()
    df["q"] = np.floor(df.l_quantity * 1e6).astype(np.int64)
    df["disc"] = np.floor(
        df.l_extendedprice * (1 - df.l_discount) * 1e6).astype(np.int64)
    exp = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty_micro=("q", "sum"), sum_disc_micro=("disc", "sum"),
        n_rows=("q", "size"))
    exp = exp.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    assert (got["sum_qty_micro"].to_numpy() == exp["sum_qty_micro"].to_numpy()).all()
    assert (got["sum_disc_micro"].to_numpy() == exp["sum_disc_micro"].to_numpy()).all()
    assert (got["n_rows"].to_numpy() == exp["n_rows"].to_numpy()).all()
    assert (got["avg_qty_micro"].to_numpy()
            == got["sum_qty_micro"].to_numpy() // got["n_rows"].to_numpy()).all()


def test_redact_pii_counts_and_replacements():
    rows = pd.DataFrame({
        "ticket_id": np.arange(6, dtype=np.int64),
        "text": [
            "contact alice.b@corp.com now",
            "call 555-123-4567 or 800-555-0199",
            "host 10.0.0.1 and 192.168.255.3",
            "mixed bob@x.io at 10.1.2.3 phone 212-555-7777",
            "no pii here at all",
            "",
        ]})
    got = redact_pii(rd.from_pandas(rows)).to_pandas() \
        .sort_values("ticket_id").reset_index(drop=True)
    assert got.loc[0, "red_text"] == "contact <EMAIL> now"
    assert got.loc[0, ["n_email", "n_phone", "n_ip"]].tolist() == [1, 0, 0]
    assert got.loc[1, "red_text"] == "call <PHONE> or <PHONE>"
    assert got.loc[1, "n_phone"] == 2
    assert got.loc[2, "red_text"] == "host <IP> and <IP>"
    assert got.loc[2, "n_ip"] == 2
    assert got.loc[3, "red_text"] == "mixed <EMAIL> at <IP> phone <PHONE>"
    assert got.loc[4, "red_text"] == "no pii here at all"
    assert got.loc[5, "red_text"] == ""
    assert got[["n_email", "n_phone", "n_ip"]].to_numpy().sum() == 8


def test_redact_word_boundaries():
    # digits glued to letters are NOT phones/IPs (\b with re.ASCII)
    rows = pd.DataFrame({
        "ticket_id": np.array([0], dtype=np.int64),
        "text": ["x555-123-4567 ver1.2.3.4beta a@b.co"]})
    got = redact_pii(rd.from_pandas(rows)).to_pandas()
    assert got.loc[0, "n_phone"] == 0
    assert got.loc[0, "n_ip"] == 0
    assert got.loc[0, "n_email"] == 1


def test_broadcast_join_accepts_arrow_table():
    left, right = _sides(n=50, keys=10, seed=9)
    got = broadcast_join(rd.from_pandas(left),
                         pa.Table.from_pandas(right, preserve_index=False),
                         on="k", right_on="rk").to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk")
    assert len(got) == len(exp)


def test_dedup_keep_best_picks_longest_then_smallest_key():
    from blurrily_ray.stages.dedup import dedup_keep_best

    rows = pd.DataFrame({
        "conv_id": ["a", "b", "c", "d", "e"],
        "turn_idx": np.array([0, 0, 0, 0, 0], dtype=np.int64),
        "text": [
            "Hello, World",      # group 1: normalized "hello world"
            "héllo wörld!!",     # group 1: same after NFKD fold, len 13
            "hello world",       # group 1: len 11
            "unique text here",  # singleton
            "HELLO WORLD",       # group 1: len 11 — tie with "c", c < e
        ]})
    got = dedup_keep_best(rd.from_pandas(rows), n_parts=3).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    # winner of group 1: "héllo wörld!!" (len 13 beats 12, 11, 11)
    assert set(got["conv_id"]) == {"b", "d"}
    assert got.set_index("conv_id").loc["b", "text"] == "héllo wörld!!"


def test_dedup_keep_best_tiebreak_smallest_key():
    from blurrily_ray.stages.dedup import dedup_keep_best

    rows = pd.DataFrame({
        "conv_id": ["z", "m", "a"],
        "turn_idx": np.array([1, 2, 3], dtype=np.int64),
        "text": ["same text", "same text", "same text"]})
    got = dedup_keep_best(rd.from_pandas(rows), n_parts=2).to_pandas()
    assert len(got) == 1 and got.iloc[0]["conv_id"] == "a"


def test_unigram_rank_score_matches_bruteforce():
    from collections import Counter

    from blurrily_ray.stages.textstats import unigram_rank_score

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 20)))
             for _ in range(200)] + [""]
    docs = pd.DataFrame({"doc_id": np.arange(201, dtype=np.int64),
                         "text": texts})
    top_v = 10
    got = unigram_rank_score(rd.from_pandas(docs), top_v=top_v).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    cnt = Counter(t for s in texts for t in s.split())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    rank = {t: i + 1 for i, (t, _) in enumerate(ranked)}
    for i, s in enumerate(texts):
        toks = s.split()
        exp_sum = sum(rank.get(t, top_v + 1) for t in toks)
        assert got.loc[i, "sum_rank"] == exp_sum
        assert got.loc[i, "n_tokens"] == len(toks)
        assert got.loc[i, "n_oov"] == sum(t not in rank for t in toks)


def test_hll_registers_and_estimate():
    from blurrily_ray.stages.sketch import hll_estimate, hll_token_registers

    rng = np.random.default_rng(17)
    # group A: 300 distinct tokens, group B: 40 distinct tokens
    a_vocab = [f"alpha{i}" for i in range(300)]
    b_vocab = [f"beta{i}" for i in range(40)]
    rows = []
    for _ in range(150):
        rows.append(("A", " ".join(rng.choice(a_vocab, size=12))))
        rows.append(("B", " ".join(rng.choice(b_vocab, size=12))))
    docs = pd.DataFrame(rows, columns=["source", "text"])
    regs = hll_token_registers(rd.from_pandas(docs), n_parts=4).to_pandas()
    # register table invariants: one row per (group, bucket), ranks >= 1
    assert not regs.duplicated(["source", "bucket"]).any()
    assert (regs["max_rank"] >= 1).all()
    # registers are merge-order independent: recompute at different widths
    regs2 = hll_token_registers(
        rd.from_pandas(docs).repartition(7), n_parts=2).to_pandas()
    key = ["source", "bucket", "max_rank"]
    assert regs[key].sort_values(key).reset_index(drop=True).equals(
        regs2[key].sort_values(key).reset_index(drop=True))
    est = hll_estimate(regs).set_index("source")["est_distinct"]
    n_a = len(set(t for s, txt in rows if s == "A" for t in txt.split()))
    n_b = len(set(t for s, txt in rows if s == "B" for t in txt.split()))
    assert abs(est["A"] - n_a) / n_a < 0.25
    assert abs(est["B"] - n_b) / n_b < 0.25


def test_curate_full_is_intersection_of_stages():
    """curate_corpus_full == base ∩ clean ∩ smooth computed independently
    (per-stage correctness is oracled; this pins the bit-tag composition)."""
    import ray.data

    from blurrily_ray.pipelines.curate import curate_corpus, curate_corpus_full
    from blurrily_ray.stages.dedup import decontaminate
    from blurrily_ray.stages.textstats import unigram_rank_score

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                 columns=["doc_id", "text"])
    full = curate_corpus_full(docs).to_pandas()
    base = curate_corpus(docs).to_pandas()
    dec = decontaminate(docs).to_pandas()
    clean = set(dec.loc[dec.n_shared * 5 <= dec.n_shingles, "doc_id"])
    ur = unigram_rank_score(docs, top_v=20).to_pandas()
    smooth = set(ur.loc[ur.sum_rank * 100 <= ur.n_tokens * 1450, "doc_id"])
    exp = base[base.doc_id.isin(clean) & base.doc_id.isin(smooth)]
    assert sorted(full.doc_id) == sorted(exp.doc_id)
    assert len(full) > 0
    m = full.set_index("doc_id")["n_tokens"]
    e = exp.set_index("doc_id")["n_tokens"]
    assert (m.sort_index() == e.sort_index()).all()


def test_broadcast_join_empty_dim_and_collision():
    import pytest

    left = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64),
                         "v": np.array([10, 20], dtype=np.int64)})
    empty = pd.DataFrame({"rk": np.array([], dtype=np.int64),
                          "rv": np.array([], dtype=np.int64)})
    li = broadcast_join(rd.from_pandas(left), empty, on="k",
                        right_on="rk").to_pandas()
    # NB: Ray drops the schema of transformed-to-empty datasets (NOTES_r2
    # gotcha), so only the row count is asserted on the inner path
    assert len(li) == 0
    ll = broadcast_join(rd.from_pandas(left), empty, on="k",
                        right_on="rk", how="left").to_pandas()
    assert len(ll) == 2 and ll["rv"].isna().all()
    clash = pd.DataFrame({"rk": np.array([1], dtype=np.int64),
                          "v": np.array([99], dtype=np.int64)})
    with pytest.raises(Exception, match="collision"):
        broadcast_join(rd.from_pandas(left), clash, on="k",
                       right_on="rk").to_pandas()


def test_redact_and_keep_best_null_text():
    from blurrily_ray.stages.dedup import dedup_keep_best

    rows = pa.table({
        "ticket_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["a@b.co ok", None], type=pa.string())})
    got = redact_pii(rd.from_arrow(rows)).to_pandas() \
        .sort_values("ticket_id").reset_index(drop=True)
    assert got.loc[1, "red_text"] == "" and got.loc[1, "n_email"] == 0

    t = pa.table({
        "conv_id": pa.array(["a", "b", "c"], type=pa.string()),
        "turn_idx": pa.array([0, 0, 0], type=pa.int64()),
        "text": pa.array(["hello", None, None], type=pa.string())})
    kept = dedup_keep_best(rd.from_arrow(t), n_parts=2).to_pandas()
    # both null texts share the empty-normalized digest -> one survives
    assert sorted(kept.conv_id) == ["a", "b"]


def test_hash_join_left_matches_pandas():
    left, right = _sides(n=200, keys=30, seed=21)
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", right_on="rk", how="left", n_parts=7).to_pandas()
    exp = left.merge(right, how="left", left_on="k", right_on="rk")
    assert len(got) == len(exp)
    # co-partitioning preserves per-key left-join semantics exactly
    g = got.sort_values(["k", "lv"]).reset_index(drop=True)
    e = exp.sort_values(["k", "lv"]).reset_index(drop=True)
    assert g["rv"].isna().sum() == e["rv"].isna().sum()
    hit = g["rv"].notna()
    assert (g.loc[hit, "rv"].to_numpy() == e.loc[hit, "rv"].to_numpy()).all()
