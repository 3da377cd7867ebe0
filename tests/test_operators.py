"""Tests for the graft-added training-data operators (dedup, similarity
search, text stats, sessionization, multimodal plumbing)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data


@pytest.fixture(scope="module")
def docs():
    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog"},  # exact dup of 1
        {"doc_id": 3, "text": "the quick brown fox leaps over the lazy dog"},  # near dup of 1
        {"doc_id": 4, "text": "completely different content about ray data pipelines"},
        {"doc_id": 5, "text": ""},
        {"doc_id": 6, "text": "short one"},
        {"doc_id": 7, "text": "streaming execution moves blocks of arrow data "
                              "through the object store with backpressure and spilling"},
        {"doc_id": 8, "text": "streaming execution moves blocks of arrow data "
                              "through the object store with compression and spilling"},
    ]
    return ray.data.from_items(rows)


def test_exact_dedup(docs):
    from blurrily_ray.stages.dedup import exact_dedup

    kept = sorted(r["doc_id"] for r in exact_dedup(docs).take_all())
    assert kept == [1, 3, 4, 5, 6, 7, 8]  # 2 deduped into 1


def test_dedup_paragraphs(docs):
    """First occurrence of each 3-word window wins corpus-wide; survivors
    reassemble in order; docs whose every window lost drop out."""
    from blurrily_ray.stages.dedup import dedup_paragraphs

    out = {r["doc_id"]: r
           for r in dedup_paragraphs(docs, words_per_para=3).take_all()}
    # doc 2 is an exact dup of doc 1: every window of 2 loses to 1 → dropped
    assert 2 not in out
    d1 = out[1]
    assert d1["text"] == "the quick brown fox jumps over the lazy dog"
    assert d1["n_kept"] == d1["n_orig"] == 3
    # doc 3 differs from 1 only in window 2 ('fox leaps over'): windows
    # 1 and 3 are dups of doc 1's → only the middle window survives
    assert out[3]["text"] == "fox leaps over"
    assert out[3]["n_kept"] == 1 and out[3]["n_orig"] == 3
    # the empty doc's single empty paragraph is unique → kept verbatim
    assert out[5]["text"] == "" and out[5]["n_kept"] == 1
    # within-doc repeats dedupe too
    rep = ray.data.from_items(
        [{"doc_id": 10, "text": "a b c a b c d e f"}])
    r = dedup_paragraphs(rep, words_per_para=3).take_all()[0]
    assert r["text"] == "a b c d e f" and r["n_orig"] == 3 and r["n_kept"] == 2


def test_repetition_stats(docs):
    from blurrily_ray.stages.textstats import repetition_stats

    out = {r["doc_id"]: r for r in repetition_stats(docs).take_all()}
    # doc 1: "the quick brown fox jumps over the lazy dog" → 8 bigrams,
    # all distinct
    assert out[1]["n_bigrams"] == 8
    assert out[1]["n_distinct_bigrams"] == 8
    assert out[1]["max_bigram_count"] == 1
    # empty doc and 2-token doc
    assert out[5]["n_bigrams"] == 0 and out[5]["max_bigram_count"] == 0
    assert out[6]["n_bigrams"] == 1 and out[6]["n_distinct_bigrams"] == 1
    # repeated bigrams counted: "a b a b a b" → 5 bigrams, 2 distinct,
    # 'a b' ×3
    rep = ray.data.from_items([{"doc_id": 10, "text": "a b a b a b"}])
    r = repetition_stats(rep).take_all()[0]
    assert (r["n_bigrams"], r["n_distinct_bigrams"],
            r["max_bigram_count"]) == (5, 2, 3)


def test_group_quantiles():
    import duckdb

    from blurrily_ray.stages.textstats import group_quantiles

    rows = [{"source": s, "n_chars": v}
            for s, vals in {"a": [5, 1, 3, 2, 4], "b": [10, 20, 30, 40],
                            "c": [7]}.items() for v in vals]
    out = group_quantiles(ray.data.from_items(rows)).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    import pandas as pd

    rows_df = pd.DataFrame(rows)  # noqa: F841 (registered by name below)
    ora = duckdb.sql(
        "SELECT source, CAST(quantile_disc(n_chars, 0.25) AS BIGINT) q25,"
        " CAST(quantile_disc(n_chars, 0.50) AS BIGINT) q50,"
        " CAST(quantile_disc(n_chars, 0.75) AS BIGINT) q75,"
        " CAST(quantile_disc(n_chars, 0.95) AS BIGINT) q95,"
        " CAST(COUNT(*) AS BIGINT) n FROM rows_df"
        " GROUP BY source ORDER BY source").df()
    assert out.equals(ora), f"\n{out}\nvs\n{ora}"


def test_decontaminate_modes_equal(docs):
    """Join path (co-partitioned, nothing driver-side) must equal the
    broadcast path exactly; an exact dup whose twin is in the benchmark
    is 100% contaminated."""
    from blurrily_ray.stages.dedup import _shingles, decontaminate
    from blurrily_ray.stages.sample import _bucket_array

    kw = dict(bench_lo=0, bench_hi=50)  # ~half the fixture as benchmark
    out_b = {r["doc_id"]: (r["n_shingles"], r["n_shared"])
             for r in decontaminate(docs, mode="broadcast", **kw).take_all()}
    out_j = {r["doc_id"]: (r["n_shingles"], r["n_shared"])
             for r in decontaminate(docs, mode="join", **kw).take_all()}
    assert out_b == out_j
    assert out_b  # some docs are outside the benchmark split
    buckets = {i: _bucket_array([i], "split", 100)[0] for i in range(1, 9)}
    bench = {i for i, b in buckets.items() if b < 50}
    assert set(out_b) == {i for i in range(1, 9) if i not in bench}
    # docs 1 and 2 are identical: if exactly one is benchmark, the other
    # must be fully contaminated
    if (1 in bench) != (2 in bench):
        other = 2 if 1 in bench else 1
        ns, sh = out_b[other]
        assert ns == sh > 0
    # every count is bounded by the doc's own shingle count
    for i, (ns, sh) in out_b.items():
        assert 0 <= sh <= ns
        texts = {1: "the quick brown fox jumps over the lazy dog",
                 2: "the quick brown fox jumps over the lazy dog"}
        if i in texts:
            assert ns == len(set(_shingles(texts[i])))


def test_simhash_pairs_matches_bruteforce(docs):
    """Banded candidate generation must find EXACTLY the brute-force
    hamming<=3 pair set (pigeonhole guarantees recall; verify is exact)."""
    from blurrily_ray.stages.dedup import simhash, simhash_pairs

    sig = {r["doc_id"]: r["simhash"] for r in simhash(docs).take_all()}
    expect = {}
    ids = sorted(sig)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sig[a] ^ sig[b]).count("1")
            if h <= 3:
                expect[(a, b)] = h
    got = {(r["a"], r["b"]): r["hamming"]
           for r in simhash_pairs(docs).take_all()}
    assert got == expect
    assert got[(1, 2)] == 0  # exact dup pair always present at hamming 0


def test_minhash_near_dup(docs):
    from blurrily_ray.stages.dedup import minhash_dedup_pairs

    pairs = {(r["a"], r["b"]) for r in minhash_dedup_pairs(docs).take_all()}
    assert (1, 2) in pairs  # exact dup always survives
    assert (7, 8) in pairs  # one-word-change near dup (Jaccard > 1/2)
    assert (1, 3) not in pairs  # 1-word change in a 9-word doc: Jaccard 0.4 < gate
    assert all(a < b for a, b in pairs)


def test_minhash_matches_bruteforce_jaccard(docs):
    """LSH candidates that survive verification must carry the true
    shingle-set Jaccard counts (checked against a direct computation)."""
    from blurrily_ray.stages.dedup import _shingle_hashes, minhash_dedup_pairs

    texts = {r["doc_id"]: r["text"] for r in docs.take_all()}
    for r in minhash_dedup_pairs(docs).take_all():
        sa = set(_shingle_hashes(texts[r["a"]]).tolist())
        sb = set(_shingle_hashes(texts[r["b"]]).tolist())
        assert r["n_inter"] == len(sa & sb)
        assert r["n_union"] == len(sa | sb)
        assert 2 * r["n_inter"] >= r["n_union"]


def test_simhash_near_dup_close(docs):
    from blurrily_ray.stages.dedup import simhash

    h = {r["doc_id"]: r["simhash"] for r in simhash(docs).take_all()}
    assert h[1] == h[2]  # identical text → identical simhash
    near = bin(h[1] ^ h[3]).count("1")
    far = bin(h[1] ^ h[4]).count("1")
    assert near < far  # near-dup is closer in hamming space
    assert h[5] == 0


def test_knn_and_neardup_embeddings():
    from blurrily_ray.stages.simsearch import knn_brute, lsh_neardup_pairs, neardup_pairs

    rng = np.random.RandomState(0)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    base[7] = base[3] + 0.01 * rng.standard_normal(16).astype(np.float32)  # planted near-dup
    emb = ray.data.from_items(
        [{"vec_id": i, "embedding": base[i].tolist()} for i in range(20)])

    knn = [r for r in knn_brute(emb, query_ids=[3], k=5).take_all()]
    assert [r["rank"] for r in sorted(knn, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
    assert all(r["neighbor_id"] != 3 for r in knn)  # self excluded
    top = min(knn, key=lambda r: r["rank"])
    assert top["neighbor_id"] == 7  # planted neighbor is rank 1

    nd = {(r["a"], r["b"]) for r in neardup_pairs(emb, threshold=0.95).take_all()}
    assert nd == {(3, 7)}

    # multi-table LSH finds the planted near-identical pair (single-table
    # recall at k=16 is ~p^16; 4 tables of 8 planes push it to ~1) and
    # only ever ADDS candidates over fewer tables; exact within-bucket
    # verify keeps every LSH result a subset of the brute-force pairs
    lsh4 = {(r["a"], r["b"])
            for r in lsh_neardup_pairs(emb, threshold=0.95,
                                       n_planes=8, n_tables=4).take_all()}
    lsh1 = {(r["a"], r["b"])
            for r in lsh_neardup_pairs(emb, threshold=0.95,
                                       n_planes=8, n_tables=1).take_all()}
    assert (3, 7) in lsh4
    assert lsh1 <= lsh4 <= nd
    # brute/LSH dispatch: forcing a tiny brute_limit routes to LSH
    gated = {(r["a"], r["b"])
             for r in neardup_pairs(emb, threshold=0.95,
                                    brute_limit=5).take_all()}
    lsh_default = {(r["a"], r["b"])
                   for r in lsh_neardup_pairs(emb, threshold=0.95).take_all()}
    assert gated == lsh_default


def test_ivf_knn():
    from blurrily_ray.stages.simsearch import ivf_knn, knn_brute

    rng = np.random.RandomState(3)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[17] = base[5] + 0.01 * rng.standard_normal(16).astype(np.float32)
    emb = ray.data.from_items(
        [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)])
    # with every cell probed, IVF degenerates to exact brute-force kNN
    brute = sorted((r["query_id"], r["rank"], r["neighbor_id"])
                   for r in knn_brute(emb, query_ids=[5, 6], k=5).take_all())
    full = sorted((r["query_id"], r["rank"], r["neighbor_id"])
                  for r in ivf_knn(emb, query_ids=[5, 6], k=5,
                                   n_centroids=8, n_probe=8).take_all())
    assert full == brute
    # with partial probing the planted near-identical vector (same cell
    # as its twin by construction) is still rank 1
    part = {(r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ivf_knn(emb, query_ids=[5], k=5,
                             n_centroids=8, n_probe=2).take_all()}
    assert part[(5, 1)] == 17


def test_token_count_bpe(docs):
    from blurrily_ray.stages.textstats import token_count_bpe

    out = {r["doc_id"]: r["n_bpe_tokens"]
           for r in token_count_bpe(docs).take_all()}
    # doc 5 is empty; every non-empty doc yields at least its word count
    assert out[5] == 0
    assert out[6] >= 2


def test_textstats(docs):
    from blurrily_ray.stages.textstats import langid, quality_stats, token_count

    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).take_all()}
    assert tc[1] == 9 and tc[5] == 0 and tc[6] == 2

    q = {r["doc_id"]: r for r in quality_stats(docs).take_all()}
    assert q[1]["n_stop"] == 2  # 'the' twice
    assert q[1]["n_tokens"] == 9
    assert q[1]["sum_token_len"] == sum(len(w) for w in
                                        "the quick brown fox jumps over the lazy dog".split())
    assert q[5]["n_chars"] == 0

    lang = {r["doc_id"]: r["lang_pred"] for r in langid(docs).take_all()}
    assert lang[1] == "en" and lang[5] == "unknown"


def test_fingerprint(docs):
    from blurrily_ray.stages.textstats import fingerprint

    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).take_all()}
    assert fp[1] == fp[2]  # identical docs → identical fingerprint
    assert fp[6] == hashlib.md5(b"short one").hexdigest()  # <5 words → whole text
    assert len(fp[1]) == 32


def test_sessionize():
    from datetime import datetime, timedelta

    from blurrily_ray.stages.windows import sessionize

    t0 = datetime(2026, 1, 1)
    rows = []
    for u, offsets in [(1, [0, 5, 10, 120, 125]), (2, [0, 200])]:
        for m in offsets:
            rows.append({"user_id": u, "ts": t0 + timedelta(minutes=m)})
    out = sessionize(ray.data.from_items(rows), gap_minutes=30).take_all()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["session_idx"])
    assert [r["n_events"] for r in u1] == [3, 2]  # gap at 10→120 splits
    assert len(by_user[2]) == 2


def test_bmp_codec_roundtrip():
    """The pure-numpy BMP codec is a REAL decoder: encode → decode is
    pixel-exact for arbitrary shapes (incl. rows needing 4-byte padding),
    and non-BMP payloads decode to None."""
    from blurrily_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(7)
    for h, w in ((8, 8), (5, 3), (1, 1), (7, 2)):
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_bmp(encode_bmp(px))
        assert out is not None and out.shape == (h, w, 3)
        assert (out == px).all()
    assert decode_bmp(b"not an image") is None
    assert decode_bmp(b"") is None


def test_multimodal_actor_pool(docs):
    from blurrily_ray.stages.multimodal import (
        attach_binary_payload, decode_bmp, extract_image_features)

    media = attach_binary_payload(docs)
    out = extract_image_features(media, concurrency=(1, 2), batch_size=3).take_all()
    assert len(out) == 8
    for r in out:
        # payloads are real 8x8 BMPs → real decoded dims, 8 features
        assert r["width"] == 8 and r["height"] == 8
        assert len(r["feature"]) == 8
        assert all(0.0 <= f <= 1.0 for f in r["feature"])
    # features match a direct driver-side decode of the same payload
    rows = media.take_all()
    px0 = decode_bmp(rows[0]["payload"])
    from blurrily_ray.stages.multimodal import ImageFeatureExtractor

    expect = ImageFeatureExtractor._features(px0)
    got = next(r for r in out if r["doc_id"] == rows[0]["doc_id"])["feature"]
    assert np.allclose(expect, got)
    # deterministic: same payload → same features
    a = {r["doc_id"]: tuple(r["feature"]) for r in out}
    b = {r["doc_id"]: tuple(r["feature"])
         for r in extract_image_features(attach_binary_payload(docs)).take_all()}
    assert a == b


def test_jaccard_ngram_exact_recall(docs):
    """Prefix filtering is EXACT: the output equals brute-force all-pairs
    shingle Jaccard at the threshold — no pair a probabilistic LSH layout
    could drop is missing."""
    from itertools import combinations

    from blurrily_ray.stages.dedup import (
        JACCARD_THRESHOLD_DEN, JACCARD_THRESHOLD_NUM, _shingle_hashes,
        jaccard_ngram_pairs)

    got = {(r["a"], r["b"]): (r["n_inter"], r["n_union"])
           for r in jaccard_ngram_pairs(docs).take_all()}
    texts = {r["doc_id"]: r["text"] for r in docs.take_all()}
    expect = {}
    for a, b in combinations(sorted(texts), 2):
        sa, sb = set(_shingle_hashes(texts[a])), set(_shingle_hashes(texts[b]))
        inter, union = len(sa & sb), len(sa | sb)
        if union > 0 and inter * JACCARD_THRESHOLD_DEN >= union * JACCARD_THRESHOLD_NUM:
            expect[(a, b)] = (inter, union)
    assert got == expect
    assert len(expect) >= 2  # fixture has exact + near dups


def test_wav_codec_roundtrip():
    """The pure-numpy WAV codec is a REAL decoder: encode → decode is
    sample-exact, RIFF chunk walking tolerates extra chunks before data,
    and non-WAV payloads decode to None."""
    from blurrily_ray.stages.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(11)
    for n in (1, 7, 1000):
        samples = rng.randint(-32768, 32768, n).astype(np.int16)
        out = decode_wav(encode_wav(samples, rate=8000))
        assert out is not None
        got, rate = out
        assert rate == 8000 and (got == samples).all()
    # extra chunk between fmt and data (word-aligned odd-size chunk)
    wav = encode_wav(np.array([5, -5], dtype=np.int16))
    data_at = wav.index(b"data")
    import struct as _s

    padded = wav[:data_at] + _s.pack("<4sI", b"LIST", 3) + b"abc\x00" \
        + wav[data_at:]
    got, _ = decode_wav(padded)
    assert (got == np.array([5, -5], dtype=np.int16)).all()
    assert decode_wav(b"not audio") is None
    assert decode_wav(b"") is None


def test_audio_actor_pool(docs):
    from blurrily_ray.stages.multimodal import (
        attach_audio_payload, decode_wav, extract_audio_features)

    media = attach_audio_payload(docs)
    out = extract_audio_features(media, concurrency=(1, 2),
                                 batch_size=3).take_all()
    assert len(out) == 8
    rows = {r["doc_id"]: r["payload"] for r in media.take_all()}
    for r in out:
        samples, rate = decode_wav(rows[r["doc_id"]])
        x = samples.astype(np.float64) / 32768.0
        # duration from the decoded data chunk; rms/peak vs sine math
        assert r["duration_sec"] == len(x) / rate
        assert abs(r["rms"] - np.sqrt((x * x).mean())) < 1e-12
        assert 0.0 < r["peak"] <= 1.0
        # a pure sine's rms ≈ peak / sqrt(2) (within sampling error)
        assert abs(r["rms"] - r["peak"] / np.sqrt(2)) < 0.02
        assert 0.0 < r["zcr"] < 1.0


def test_image_resize(docs):
    from blurrily_ray.stages.multimodal import (
        attach_binary_payload, decode_bmp, resize_images, resize_nearest)

    media = attach_binary_payload(docs)
    out = resize_images(media, 4, 4, concurrency=(1, 2),
                        batch_size=3).take_all()
    assert len(out) == 8 and all(r["resized"] for r in out)
    srcs = {r["doc_id"]: r["payload"] for r in media.take_all()}
    for r in out:
        px = decode_bmp(r["payload"])
        assert px.shape == (4, 4, 3)
        expect = resize_nearest(decode_bmp(srcs[r["doc_id"]]), 4, 4)
        assert (px == expect).all()


def test_validators():
    from blurrily_ray.functions.validators import (
        ValidationError, check_db_name, check_limit, check_needle,
        check_numeric_ref, check_weight)

    check_needle("ok"); check_limit(10); check_numeric_ref(1)
    check_weight(0); check_db_name("words_db")
    for fn, bad in [(check_needle, ""), (check_needle, "a\tb"),
                    (check_limit, 0), (check_limit, 2000),
                    (check_numeric_ref, 0), (check_weight, -1),
                    (check_db_name, "Nope"), (check_db_name, "")]:
        with pytest.raises(ValidationError):
            fn(bad)


def test_index_group(tmp_path):
    from blurrily_ray.namespaces import IndexGroup

    g = IndexGroup(str(tmp_path / "maps"))
    docs = ray.data.from_items([{"ref": 123, "text": "london"}])
    g.put_bulk("cities", docs)
    assert g.find("cities", "london") == [[123, 7, 6]]
    assert g.stats("cities") == {"references": 1, "trigrams": 7}
    assert g.find("other", "london") == []  # lazy empty namespace
    g.delete("cities", [123])
    assert g.find("cities", "london") == []
    g.clear("cities")
    assert g.stats("cities") == {"references": 0, "trigrams": 0}
    # isolation between names (map_group multi-db, integration_spec.rb:51-60)
    g.put_bulk("a_db", ray.data.from_items([{"ref": 1, "text": "paris"}]))
    g.put_bulk("b_db", ray.data.from_items([{"ref": 2, "text": "tokyo"}]))
    assert g.find("a_db", "paris")[0][0] == 1
    assert g.find("b_db", "paris") == []


def test_index_group_incremental_segments(tmp_path):
    """put/delete are DELTA appends: earlier segment files are never
    rewritten; put → delete → re-put across deltas replays exactly like a
    from-scratch build (map_spec.rb:78-115 delete/re-add semantics)."""
    import glob
    import os

    from blurrily_ray.namespaces import IndexGroup

    g = IndexGroup(str(tmp_path / "maps"))
    g.put_bulk("db", ray.data.from_items([{"ref": 1, "text": "london"},
                                          {"ref": 2, "text": "paris"}]))
    seg1_files = sorted(glob.glob(str(tmp_path / "maps/db/seg-000001/**/*"),
                                  recursive=True))
    seg1_mtimes = [os.path.getmtime(f) for f in seg1_files]
    assert seg1_files

    # append-only put: segment 1 untouched
    g.put_bulk("db", ray.data.from_items([{"ref": 3, "text": "tokyo"}]))
    assert [os.path.getmtime(f) for f in seg1_files] == seg1_mtimes
    assert g.stats("db")["references"] == 3

    # delete = tombstone append: segment files still untouched
    g.delete("db", [2])
    assert [os.path.getmtime(f) for f in seg1_files] == seg1_mtimes
    assert g.find("db", "paris") == []
    assert g.stats("db")["references"] == 2

    # re-put after delete re-adds (sequenced tombstones)
    g.put_bulk("db", ray.data.from_items([{"ref": 2, "text": "paris"}]))
    assert g.find("db", "paris")[0][0] == 2
    assert [os.path.getmtime(f) for f in seg1_files] == seg1_mtimes

    # equivalent from-scratch build matches find + stats exactly
    g2 = IndexGroup(str(tmp_path / "maps2"))
    g2.put_bulk("db", ray.data.from_items(
        [{"ref": 1, "text": "london"}, {"ref": 2, "text": "paris"},
         {"ref": 3, "text": "tokyo"}]))
    for needle in ("london", "paris", "tokyo"):
        assert g.find("db", needle) == g2.find("db", needle)
    assert g.stats("db") == g2.stats("db")

    # compaction folds to one segment with identical results
    g.compact("db")
    assert sorted(os.listdir(tmp_path / "maps/db")) == \
        ["SEGMENTS.json", "seg-000001"]
    for needle in ("london", "paris", "tokyo"):
        assert g.find("db", needle) == g2.find("db", needle)


def test_index_group_first_put_wins(tmp_path):
    """Re-putting an existing ref is a no-op (storage.c:408 returns 0;
    map_spec.rb:43-47 'does not store duplicate references'): find must not
    double-count matches and stats must not inflate."""
    from blurrily_ray.namespaces import IndexGroup

    g = IndexGroup(str(tmp_path / "maps"))
    g.put_bulk("db", ray.data.from_items([{"ref": 123, "text": "london"}]))
    # second put of the same ref (even with different text) is ignored
    g.put_bulk("db", ray.data.from_items([{"ref": 123, "text": "london"},
                                          {"ref": 456, "text": "paris"}]))
    assert g.find("db", "london") == [[123, 7, 6]]
    assert g.stats("db") == {"references": 2, "trigrams": 7 + 6}


def test_video_codec_roundtrip():
    from blurrily_ray.stages.multimodal import (
        decode_bmp, decode_video_index, encode_video)

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)
              for _ in range(4)]
    payload = encode_video(frames, fps=12)
    idx, fps = decode_video_index(payload)
    assert fps == 12 and len(idx) == 4
    for f, (off, ln) in zip(frames, idx):
        assert (decode_bmp(payload[off:off + ln]) == f).all()
    assert decode_video_index(b"nope") is None
    assert decode_video_index(payload[:8]) is None  # truncated header
    assert decode_video_index(payload[:-3]) is None  # truncated frame


def test_video_frame_sampler(docs):
    from blurrily_ray.stages.multimodal import (
        attach_video_payload, decode_bmp, decode_video_index,
        sample_video_frames)

    media = attach_video_payload(docs)
    out = sample_video_frames(media, stride=3, concurrency=(1, 2),
                              batch_size=3).take_all()
    srcs = {r["doc_id"]: r["payload"] for r in media.take_all()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(srcs)
    for doc_id, rows in by_doc.items():
        idx, _ = decode_video_index(srcs[doc_id])
        rows.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(0, len(idx), 3))
        for r in rows:
            off, ln = idx[r["frame_idx"]]
            px = decode_bmp(srcs[doc_id][off:off + ln])
            assert (r["width"], r["height"]) == (8, 8)
            means = px.reshape(-1, 3).mean(axis=0) / 255.0
            assert abs(r["mean_r"] - means[0]) < 1e-12
            assert abs(r["mean_g"] - means[1]) < 1e-12
            assert abs(r["mean_b"] - means[2]) < 1e-12


def test_video_sampler_stub_row():
    import ray.data as rd

    from blurrily_ray.stages.multimodal import sample_video_frames

    media = rd.from_items([{"doc_id": 9, "payload": b"not a video",
                            "media_type": "application/octet-stream"}])
    out = sample_video_frames(media).take_all()
    assert len(out) == 1 and out[0]["frame_idx"] == -1
    assert out[0]["width"] == -1 and out[0]["height"] == -1


def test_curate_corpus(docs):
    import hashlib

    from blurrily_ray.pipelines.curate import curate_corpus
    from blurrily_ray.stages.textstats import LANGID_NUM, STOPWORDS

    got = curate_corpus(docs, min_tokens=2, max_tokens=100,
                        max_punct_pct=20, n_parts=5).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    src = docs.to_pandas()
    keep, seen = [], {}
    for _, r in src.sort_values("doc_id").iterrows():
        toks = (r.text or "").split()
        n_stop = sum(t.lower() in STOPWORDS for t in toks)
        n_punct = sum(not (c.isalnum() or c.isspace()) for c in r.text or "")
        ok = (2 <= len(toks) <= 100 and n_stop * LANGID_NUM >= len(toks)
              and n_punct * 100 <= 20 * len(r.text or ""))
        h = hashlib.md5((r.text or "").encode()).hexdigest()
        if ok and h not in seen:
            seen[h] = True
            keep.append((r.doc_id, len(toks)))
    assert [tuple(x) for x in got.to_numpy()] == keep


def test_png_codec_roundtrip_and_filters():
    import struct as _struct
    import zlib

    from blurrily_ray.stages.multimodal import (
        _PNG_SIG, decode_image, decode_png, encode_png)

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (7, 5, 3)).astype(np.uint8)
    assert (decode_png(encode_png(px)) == px).all()
    rgba = rng.integers(0, 256, (4, 6, 4)).astype(np.uint8)
    assert (decode_png(encode_png(rgba)) == rgba).all()
    assert (decode_image(encode_png(rgba)) == rgba[:, :, :3]).all()
    assert decode_png(b"not a png") is None
    assert decode_png(encode_png(px)[:30]) is None

    # exercise ALL filter types: forward-filter known pixels by hand, then
    # decode and demand the original pixels back
    h, w, ch = 5, 4, 3
    pixels = rng.integers(0, 256, (h, w, ch)).astype(np.int32)
    flat = pixels.reshape(h, w * ch)
    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, np.int32)
        out = np.empty(w * ch, dtype=np.int32)
        for x in range(w * ch):
            left = cur[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb_ and pa_ <= pc_) else \
                    (up if pb_ <= pc_ else ul)
            out[x] = (cur[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(out.astype(np.uint8).tobytes())

    def chunk(tag, body):
        return (_struct.pack(">I", len(body)) + tag + body
                + _struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (_PNG_SIG + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    assert (decode_png(payload) == pixels.astype(np.uint8)).all()


def test_image_stages_accept_png(docs):
    from blurrily_ray.stages.multimodal import (
        attach_binary_payload, extract_image_features)

    media = attach_binary_payload(docs, fmt="png")
    out = extract_image_features(media, concurrency=(1, 2),
                                 batch_size=4).take_all()
    assert len(out) == 8
    assert all(r["width"] == 8 and r["height"] == 8 for r in out)
    # same pixels as the BMP payloads → identical features
    bmp = {r["doc_id"]: r["feature"] for r in extract_image_features(
        attach_binary_payload(docs, fmt="bmp"), concurrency=(1, 2),
        batch_size=4).take_all()}
    for r in out:
        assert np.allclose(r["feature"], bmp[r["doc_id"]])


def test_vocab_top_k_boundary_ties():
    import ray.data as rdata

    from blurrily_ray.stages.textstats import vocab_top_k

    # counts: zz×5, then aa/bb/cc ×3 each — k=2 must cut INSIDE the tie
    # group and keep the lexicographically smallest
    rows = [{"doc_id": 1, "text": "zz zz zz aa bb cc"},
            {"doc_id": 2, "text": "zz zz aa bb cc"},
            {"doc_id": 3, "text": "aa bb cc"}]
    got = vocab_top_k(rdata.from_items(rows), k=2, n_parts=3).to_pandas()
    assert got["token"].tolist() == ["zz", "aa"]
    assert got["n"].tolist() == [5, 3]


def test_deterministic_split_partitions_disjoint_and_stable(docs):
    from blurrily_ray.stages.sample import deterministic_split

    a = deterministic_split(docs, key_col="doc_id", lo=0, hi=40,
                            salt="s").to_pandas()
    b = deterministic_split(docs, key_col="doc_id", lo=40, hi=100,
                            salt="s").to_pandas()
    ids_a, ids_b = set(a.doc_id), set(b.doc_id)
    assert ids_a.isdisjoint(ids_b)
    assert ids_a | ids_b == set(range(1, 9))  # complete cover
    # stable across runs
    a2 = deterministic_split(docs, key_col="doc_id", lo=0, hi=40,
                             salt="s").to_pandas()
    assert set(a2.doc_id) == ids_a
    # different salt → different assignment allowed, still a partition
    import pytest as _pytest

    with _pytest.raises(ValueError):
        deterministic_split(docs, key_col="doc_id", lo=10, hi=10)


def test_ivf_knn_kmeans_centroids():
    """kmeans centroid mode: deterministic across runs, degenerates to
    exact brute kNN when every cell is probed, and the planted twin is
    still rank 1 under partial probing."""
    from blurrily_ray.stages.simsearch import (ivf_knn, kmeans_centroids,
                                               knn_brute)

    rng = np.random.RandomState(3)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[17] = base[5] + 0.01 * rng.standard_normal(16).astype(np.float32)
    emb = ray.data.from_items(
        [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)])
    c1 = kmeans_centroids(emb, 8)
    c2 = kmeans_centroids(emb, 8)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 16)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    brute = sorted((r["query_id"], r["rank"], r["neighbor_id"])
                   for r in knn_brute(emb, query_ids=[5, 6], k=5).take_all())
    full = sorted((r["query_id"], r["rank"], r["neighbor_id"])
                  for r in ivf_knn(emb, query_ids=[5, 6], k=5, n_centroids=8,
                                   n_probe=8,
                                   centroid_mode="kmeans").take_all())
    assert full == brute
    part = {(r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ivf_knn(emb, query_ids=[5], k=5, n_centroids=8,
                             n_probe=2, centroid_mode="kmeans").take_all()}
    assert part[(5, 1)] == 17


def test_trim_worker_heaps():
    from blurrily_ray.state.maintenance import trim_worker_heaps

    n = trim_worker_heaps(n_tasks=4, hold=0.05)
    assert 0 <= n <= 4
    assert n >= 1  # glibc container: malloc_trim must be reachable


def test_serving_sidecar_roundtrip(tmp_path):
    """Segment commits write an mmap serving sidecar; local_finder loads
    it verbatim, and the answer matches the Parquet-replay build exactly
    (save/load parity with storage.c:210-266's mmap open)."""
    import os
    import shutil

    from blurrily_ray.namespaces import IndexGroup
    from blurrily_ray.state.sidecar import load_sidecar, write_sidecar

    g = IndexGroup(str(tmp_path / "maps"))
    docs = ray.data.from_items(
        [{"ref": i, "text": t} for i, t in
         enumerate(["london", "londres", "paris", "tokyo", "new york"], 1)])
    g.put_bulk("db", docs)
    seg = str(tmp_path / "maps/db/seg-000001")
    arrays = load_sidecar(seg)
    assert arrays is not None  # written at put_bulk commit
    assert isinstance(arrays["ref_ids"], np.memmap)

    f_side = g.local_finder("db")
    # parquet fallback: remove the sidecar and rebuild
    shutil.rmtree(os.path.join(seg, "finder"))
    assert load_sidecar(seg) is None
    f_parq = g.local_finder("db")
    for needle in ("london", "londre", "tokio", "zzz"):
        assert f_side.find(needle, 10) == f_parq.find(needle, 10)
    assert f_side.stats() == f_parq.stats()
    assert write_sidecar(seg)  # rebuildable on demand


def test_serving_sidecar_multi_segment_tombstones(tmp_path):
    """Sidecar fast path across delta segments + sequenced tombstones
    (put -> delete -> re-put) equals the from-scratch finder, including
    a STALE sidecar being ignored rather than served."""
    import json
    import os

    from blurrily_ray.namespaces import IndexGroup
    from blurrily_ray.state.sidecar import load_sidecar

    g = IndexGroup(str(tmp_path / "maps"))
    g.put_bulk("db", ray.data.from_items(
        [{"ref": 1, "text": "london"}, {"ref": 2, "text": "paris"}]))
    g.put_bulk("db", ray.data.from_items([{"ref": 3, "text": "tokyo"}]))
    g.delete("db", [2])
    g.put_bulk("db", ray.data.from_items([{"ref": 2, "text": "madrid"}]))

    f = g.local_finder("db")
    ref = IndexGroup(str(tmp_path / "ref"))
    ref.put_bulk("db", ray.data.from_items(
        [{"ref": 1, "text": "london"}, {"ref": 2, "text": "madrid"},
         {"ref": 3, "text": "tokyo"}]))
    f2 = ref.local_finder("db")
    for needle in ("london", "paris", "madrid", "tokyo"):
        assert f.find(needle, 10) == f2.find(needle, 10)
    assert f.stats() == f2.stats()

    # corrupt staleness guard: manifest_rows mismatch -> sidecar ignored
    seg = str(tmp_path / "maps/db/seg-000001")
    meta_p = os.path.join(seg, "finder", "META.json")
    meta = json.load(open(meta_p))
    meta["manifest_rows"] += 1
    json.dump(meta, open(meta_p, "w"))
    assert load_sidecar(seg) is None
    f3 = g.local_finder("db")  # falls back per segment, same answers
    for needle in ("london", "madrid", "tokyo"):
        assert f3.find(needle, 10) == f2.find(needle, 10)


def test_sidecar_finder_is_mutable_after_mmap(tmp_path):
    """put_rows/delete_refs on an mmap-backed LocalFinder replace arrays,
    never write in place (the maps are opened read-only)."""
    from blurrily_ray.namespaces import IndexGroup

    g = IndexGroup(str(tmp_path / "maps"))
    g.put_bulk("db", ray.data.from_items([{"ref": 1, "text": "london"}]))
    f = g.local_finder("db")
    assert f.put_rows([{"ref": 2, "text": "paris", "weight": 0}]) == 1
    assert f.find("paris", 5)[0][0] == 2
    assert f.delete_refs([1]) == 1
    assert f.find("london", 5) == []
    # durable files unchanged: a fresh load still sees only ref 1
    assert g.local_finder("db").find("london", 5)[0][0] == 1


def test_near_dedup_canonical(docs):
    """Near-dup clusters collapse to their smallest doc_id; every doc is
    labeled; survivors = one per cluster."""
    from blurrily_ray.stages.dedup import minhash_dedup_pairs, near_dedup_canonical

    out = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in near_dedup_canonical(docs).take_all()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8}  # every doc labeled
    # 1==2 exact dup, 7~8 near dup (the minhash fixture facts above)
    assert out[1] == (1, 1)
    assert out[2] == (1, 0)
    assert out[7] == (7, 1) and out[8][0] == 7 and out[8][1] == 0
    # keep is 1 exactly once per cluster, on the smallest member
    import collections
    clusters = collections.defaultdict(list)
    for d, (c, k) in out.items():
        clusters[c].append((d, k))
    for c, members in clusters.items():
        assert sum(k for _, k in members) == 1
        assert (c, 1) in members and c == min(d for d, _ in members)
    # consistency with the pair engine: every verified pair co-clusters
    for r in minhash_dedup_pairs(docs).take_all():
        assert out[r["a"]][0] == out[r["b"]][0]


@pytest.fixture(scope="module")
def docs_with_lang():
    rows = [{"doc_id": i,
             "lang": ("en" if i % 3 == 0 else "de" if i % 3 == 1 else "xx"),
             "text": f"doc number {i}"} for i in range(60)]
    return ray.data.from_items(rows)


def test_stratified_sample(docs_with_lang):
    from blurrily_ray.stages.sample import _bucket_array, stratified_sample

    rates = {"en": 30, "de": 100}
    out = stratified_sample(docs_with_lang, key_col="doc_id",
                            strata_col="lang", rates=rates,
                            default_keep=0).take_all()
    rows = docs_with_lang.take_all()
    expect = []
    for r in rows:
        thr = rates.get(r["lang"], 0)
        b = _bucket_array([r["doc_id"]], "sample", 100)[0]
        if b < thr:
            expect.append(r["doc_id"])
    assert sorted(r["doc_id"] for r in out) == sorted(expect)
    # de kept whole, unknown stratum dropped entirely
    langs = {r["doc_id"]: r["lang"] for r in rows}
    assert all(langs[r["doc_id"]] != "xx" for r in out)
    assert {r["doc_id"] for r in out if langs[r["doc_id"]] == "de"} \
        == {r["doc_id"] for r in rows if r["lang"] == "de"}
    # run-stable: identical output on a second invocation
    out2 = stratified_sample(docs_with_lang, key_col="doc_id",
                             strata_col="lang", rates=rates,
                             default_keep=0).take_all()
    assert sorted(r["doc_id"] for r in out2) == sorted(r["doc_id"] for r in out)
    with pytest.raises(ValueError):
        stratified_sample(docs_with_lang, key_col="doc_id",
                          strata_col="lang", rates={"en": 101})


def test_bm25_topk_matches_bruteforce(docs):
    """Engine BM25 must equal a direct per-doc computation (same formula,
    same float association, integer nano-unit floors)."""
    import math

    from blurrily_ray.stages.retrieval import MICRO, bm25_topk, query_terms

    queries = ["quick brown fox", "arrow data store", "zzz"]
    rows = {r["doc_id"]: (r["text"] or "").lower().split()
            for r in docs.take_all()}
    n_docs = len(rows)
    sum_dl = sum(len(t) for t in rows.values())
    avgdl = float(sum_dl) / float(n_docs)
    expect = {}
    for q, ts in zip(queries, query_terms(queries)):
        scores = {}
        for d, toks in rows.items():
            s = 0
            for t in ts:
                tf = float(toks.count(t))
                if not tf:
                    continue
                df = sum(1 for tt in rows.values() if t in tt)
                idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                contrib = idf * ((tf * (1.2 + 1.0)) /
                                 (tf + 1.2 * ((1.0 - 0.75)
                                              + 0.75 * (len(toks) / avgdl))))
                s += math.floor(contrib * MICRO)
            if s or any(t in toks for t in ts):
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        for rank, (d, s) in enumerate(ranked, 1):
            expect[(q, rank)] = (d, s)
    got = {(r["query"], r["rank"]): (r["doc_id"], r["score_micro"])
           for r in bm25_topk(docs, queries, k=10).take_all()}
    assert got == expect
    assert not any(q == "zzz" for q, _ in got)  # no shared term -> no rows


def test_sq_knn_matches_brute_force():
    """sq_knn == brute-force int8 quantized MIPS computed in-process:
    identical quantization expression, integer scores, tie by id."""
    import numpy as np

    from blurrily_ray.stages.simsearch import sq_knn

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(40)]
    ds = ray.data.from_items(rows)
    k, qids = 5, [0, 3, 17]

    m = vecs.astype(np.float64)
    ma = np.abs(m).max()
    codes = np.floor(m * 127.0 / ma).astype(np.int64)
    expect = {}
    for q in qids:
        s = codes @ codes[q]
        order = [i for i in np.lexsort((np.arange(40), -s)) if i != q][:k]
        for rank, n in enumerate(order, 1):
            expect[(q, rank)] = (n, int(s[n]))

    got = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
           for r in sq_knn(ds, qids, k=k).take_all()}
    assert got == expect


def test_sq_knn_partition_invariant():
    """Integer scores make the result independent of block layout."""
    import numpy as np

    from blurrily_ray.stages.simsearch import sq_knn

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 6)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(30)]
    a = sq_knn(ray.data.from_items(rows), [1, 2], k=4).take_all()
    b = sq_knn(ray.data.from_items(rows).repartition(7), [1, 2], k=4).take_all()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(dict, a), key=key) == sorted(map(dict, b), key=key)


def test_dup_ngram_stats_brute():
    """dup_ngram_stats == pure-Python reference on planted duplicates:
    overlapping windows, corpus-global >=2 rule, coverage union."""
    from blurrily_ray.stages.dedup import dup_ngram_stats

    w = 3
    texts = {
        1: "a b c d e f",          # windows abc bcd cde def
        2: "x y z a b c d q r s",  # shares "a b c" and "b c d" with doc 1
        3: "a b c a b c a b c",    # self-repeats "a b c" (and more)
        4: "u v",                  # shorter than the window: no windows
        5: "mm nn oo pp qq rr ss tt",  # unique text, no dups
    }
    rows = [{"doc_id": i, "text": t} for i, t in texts.items()]

    # reference computation
    from collections import Counter
    wins = {}
    cnt = Counter()
    for i, t in texts.items():
        toks = t.split(" ")
        ws = [" ".join(toks[p:p + w]) for p in range(len(toks) - w + 1)]
        wins[i] = ws
        cnt.update(ws)
    expect = {}
    for i, t in texts.items():
        toks = t.split(" ")
        dup_pos = [p for p, s in enumerate(wins[i]) if cnt[s] >= 2]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + w))
        expect[i] = (len(toks), max(len(toks) - w + 1, 0),
                     len(dup_pos), len(covered))

    out = dup_ngram_stats(ray.data.from_items(rows), window=w).take_all()
    got = {r["doc_id"]: (r["n_tokens"], r["n_windows"],
                         r["n_dup_windows"], r["n_dup_tokens"])
           for r in out}
    assert got == expect
    # sanity on the planted facts
    assert got[3][2] == got[3][1]          # every window of doc 3 repeats
    assert got[3][3] == got[3][0]          # ...covering the whole doc
    assert got[4] == (2, 0, 0, 0)
    assert got[5][2] == 0
    # the count-min exchange pre-filter (scale lever, default off) must
    # not change ANY output — registers never undercount, so the drop
    # set is provably non-duplicated. Tiny cms_bits forces collisions
    # (false-keeps), which the exact in-partition count must absorb.
    for bits in (22, 4):
        pf = dup_ngram_stats(ray.data.from_items(rows), window=w,
                             prefilter=True, cms_bits=bits).take_all()
        got_pf = {r["doc_id"]: (r["n_tokens"], r["n_windows"],
                                r["n_dup_windows"], r["n_dup_tokens"])
                  for r in pf}
        assert got_pf == expect, bits


def test_cms_registers():
    """CMS register table is partition-invariant (SUM-mergeable); the
    min-over-rows estimate upper-bounds true counts and is exact when the
    tiny vocab avoids bucket collisions."""
    import pandas as pd

    from blurrily_ray.stages.sketch import cms_estimate, cms_token_registers

    rows = [{"source": "a", "text": "x y x z"},
            {"source": "a", "text": "x w"},
            {"source": "b", "text": "x x x"}]
    ds = ray.data.from_items(rows)
    k = ["source", "row_j", "bucket"]
    reg1 = pd.DataFrame(cms_token_registers(ds).take_all()) \
        .sort_values(k).reset_index(drop=True)
    reg2 = pd.DataFrame(cms_token_registers(ds.repartition(3)).take_all()) \
        .sort_values(k).reset_index(drop=True)
    assert reg1.equals(reg2)
    assert reg1.groupby("source").size().max() <= 4 * 256
    # group b: token x appears 3 times in every sketch row
    b = reg1[reg1["source"] == "b"]
    assert (b.groupby("row_j")["count"].sum() == 3).all()

    true = {"x": 3, "y": 1, "w": 1, "zzz": 0}
    est = cms_estimate(reg1, "a", list(true))
    got = dict(zip(est["token"], est["est_count"]))
    assert all(got[t] >= c for t, c in true.items())
    assert got == true  # 4-token vocab vs width 256: no collisions


def test_collocations_top_k_brute():
    """collocations == brute-force bigram/unigram counting, with the
    (n_pair DESC, w1, w2) tie order and exact PMI count columns."""
    from collections import Counter

    from blurrily_ray.stages.textstats import collocations_top_k

    rows = [{"doc_id": 1, "text": "The cat sat on the mat"},
            {"doc_id": 2, "text": "the cat ate the mat"},
            {"doc_id": 3, "text": "one"},          # no bigram
            {"doc_id": 4, "text": ""},
            {"doc_id": 5, "text": "THE CAT the cat"}]
    toks = [(r["text"] or "").lower().split() for r in rows]
    uni = Counter(t for ts in toks for t in ts)
    big = Counter((ts[i], ts[i + 1]) for ts in toks
                  for i in range(len(ts) - 1))
    expect = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:4]

    out = collocations_top_k(ray.data.from_items(rows), k=4).take_all()
    assert len(out) == 4
    for r, ((w1, w2), n) in zip(sorted(out, key=lambda r: r["rank"]),
                                expect):
        assert (r["w1"], r["w2"], r["n_pair"]) == (w1, w2, n)
        assert r["n_w1"] == uni[w1] and r["n_w2"] == uni[w2]


def test_float_group_quantiles_matches_duckdb():
    import duckdb
    import pandas as pd

    from blurrily_ray.stages.textstats import float_group_quantiles

    rows = [{"event_type": t, "value": v}
            for t, vals in {"a": [0.15, 2.5, -1.3, 0.0, 7.25],
                            "b": [10.125, 0.333, 0.333]}.items()
            for v in vals]
    out = float_group_quantiles(ray.data.from_items(rows),
                                group_col="event_type",
                                value_col="value").to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    rows_df = pd.DataFrame(rows)  # noqa: F841 (registered by name)
    ora = duckdb.sql(
        "SELECT event_type,"
        " CAST(quantile_disc(v, 0.25) AS BIGINT) q25,"
        " CAST(quantile_disc(v, 0.50) AS BIGINT) q50,"
        " CAST(quantile_disc(v, 0.75) AS BIGINT) q75,"
        " CAST(quantile_disc(v, 0.95) AS BIGINT) q95,"
        " CAST(COUNT(*) AS BIGINT) n FROM ("
        "SELECT event_type, CAST(FLOOR(CAST(value AS DOUBLE) * 1000000.0)"
        " AS BIGINT) AS v FROM rows_df)"
        " GROUP BY event_type ORDER BY event_type").df()
    assert out.equals(ora), f"\n{out}\nvs\n{ora}"


def test_funnel_brute():
    """funnel == greedy earliest-chain reference on crafted orderings:
    same-ts stages do NOT advance (strictly-after rule), repeated and
    out-of-order stage events resolve to the earliest valid chain."""
    import datetime as dt

    from blurrily_ray.stages.windows import funnel

    t0 = dt.datetime(2026, 1, 1)

    def ev(u, typ, sec):
        return {"user_id": u, "event_type": typ,
                "ts": t0 + dt.timedelta(seconds=sec)}

    rows = (
        # u1: full funnel, with decoy click BEFORE the view
        [ev(1, "click", 0), ev(1, "view", 10), ev(1, "click", 20),
         ev(1, "purchase", 30)] +
        # u2: click at SAME ts as view -> does not count (strictly after)
        [ev(2, "view", 0), ev(2, "click", 0)] +
        # u3: purchase before click -> depth 2 only
        [ev(3, "view", 0), ev(3, "purchase", 5), ev(3, "click", 10)] +
        # u4: no view at all -> no row
        [ev(4, "click", 0), ev(4, "purchase", 1)] +
        # u5: many views; chain starts at the EARLIEST view
        [ev(5, "view", 50), ev(5, "view", 5), ev(5, "click", 20),
         ev(5, "purchase", 21)])
    out = {r["user_id"]: (r["depth"], r["t1_us"], r["t_last_us"])
           for r in funnel(ray.data.from_items(rows)).take_all()}
    epoch = dt.datetime(1970, 1, 1)
    us = lambda sec: int((t0 + dt.timedelta(seconds=sec)
                          - epoch).total_seconds() * 1e6)
    assert set(out) == {1, 2, 3, 5}
    assert out[1] == (3, us(10), us(30))
    assert out[2] == (1, us(0), us(0))
    assert out[3] == (2, us(0), us(10))
    assert out[5] == (3, us(5), us(21))


def test_pq_knn_matches_brute_force():
    """pq_knn == pure-numpy re-implementation (encode + integer ADC) on
    the engine's own codebooks; training is deterministic across runs."""
    import numpy as np

    from blurrily_ray.stages.simsearch import (
        _pq_micro_tab, pq_codebooks, pq_knn)

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(60)]
    ds = ray.data.from_items(rows)
    m, n_codes, k, qids = 4, 8, 5, [0, 2, 9]

    cb1 = pq_codebooks(ds, m, n_codes)
    cb2 = pq_codebooks(ds, m, n_codes)
    assert (cb1 == cb2).all()  # rerun-deterministic (the oracle premise:
    # the query path and the oracle export re-train on the same layout;
    # float partial sums are NOT partition-layout-invariant in general)

    x = vecs.astype(np.float64)
    tab = _pq_micro_tab(x, cb1)            # (60, m, n_codes)
    codes = np.argmin(tab, axis=2)          # (60, m)
    expect = {}
    for q in qids:
        d = np.array([tab[q, j, codes[:, j]] for j in range(m)]).sum(0)
        order = [i for i in np.lexsort((np.arange(60), d)) if i != q][:k]
        for rank, n in enumerate(order, 1):
            expect[(q, rank)] = (n, int(d[n]))

    got = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["dist_micro"])
           for r in pq_knn(ds, qids, k=k, m=m, n_codes=n_codes,
                           codebooks=cb1).take_all()}
    assert got == expect
    # self-trained path agrees with the explicit-codebook path
    got2 = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["dist_micro"])
            for r in pq_knn(ds, qids, k=k, m=m,
                            n_codes=n_codes).take_all()}
    assert got2 == got


def test_cluster_size_hist_consistent():
    """Histogram == direct recount of the ER labels; mass adds up."""
    import collections
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    hist = {r["cluster_size"]: r["n_clusters"]
            for r in entry.queries()["cluster_size_hist"](sf_dir).take_all()}
    labels = entry.queries()["er_clusters"](sf_dir).take_all()
    sizes = collections.Counter(r["cluster_id"] for r in labels)
    expect = collections.Counter(sizes.values())
    assert hist == dict(expect)
    assert sum(s * n for s, n in hist.items()) == len(labels)


def test_sq_knn_no_matching_queries():
    """Query ids absent from a NON-empty corpus: typed empty result, no
    (n, dim) x (0, 0) matmul crash in the batch tasks."""
    import numpy as np

    from blurrily_ray.stages.simsearch import sq_knn

    rows = [{"vec_id": i, "embedding": [float(i), 1.0]} for i in range(20)]
    out = sq_knn(ray.data.from_items(rows), query_ids=[999], k=5)
    assert out.count() == 0


def test_float_group_quantiles_skips_nulls():
    """NULL/NaN values are skipped (quantile_disc's NULL rule) and n
    counts non-null values only — no INT64_MIN sentinel leakage."""
    from blurrily_ray.stages.textstats import float_group_quantiles

    rows = [{"event_type": "a", "value": 1.0},
            {"event_type": "a", "value": None},
            {"event_type": "a", "value": 3.0},
            {"event_type": "b", "value": None}]
    out = {r["event_type"]: r for r in float_group_quantiles(
        ray.data.from_items(rows), group_col="event_type",
        value_col="value").take_all()}
    assert out["a"]["n"] == 2
    assert out["a"]["q25"] == 1_000_000 and out["a"]["q95"] == 3_000_000
    assert "b" not in out  # all-null group emits nothing


def test_image_phash_neardup():
    """pHash: identical images hash equal; a few changed pixels stay
    within small Hamming distance; unrelated images differ; banded
    near-dup pairs find exactly the close ones. Undecodable payloads
    fall back to md5 (no false pairs)."""
    import numpy as np

    from blurrily_ray.stages.multimodal import (
        ImagePHasher, encode_bmp, image_phash, phash_neardup_pairs)

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    tweak = base.copy()
    tweak[0, 0] = 255 - tweak[0, 0]  # one pixel flipped
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    rows = [
        {"doc_id": 1, "payload": encode_bmp(base)},
        {"doc_id": 2, "payload": encode_bmp(base)},       # exact dup
        {"doc_id": 3, "payload": encode_bmp(tweak)},      # near dup
        {"doc_id": 4, "payload": encode_bmp(other)},
        {"doc_id": 5, "payload": b"not an image at all"},
    ]
    ds = ray.data.from_items(rows)
    sigs = {r["doc_id"]: r["simhash"] for r in image_phash(ds).take_all()}
    assert all(0 <= s < (1 << 60) for s in sigs.values())
    assert sigs[1] == sigs[2]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sigs[1], sigs[3]) <= 3   # one pixel barely moves tile sums
    assert ham(sigs[1], sigs[4]) > 3    # unrelated content

    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in phash_neardup_pairs(ds).take_all()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_ivfpq_knn_subset_of_pq_within_probed_cells():
    """IVF-PQ == PQ ADC restricted to probed cells: for every query, the
    result equals brute-force ADC over the candidate set the IVF probe
    admits (cells prune, ADC ranks)."""
    import numpy as np

    from blurrily_ray.stages.simsearch import (
        _pq_micro_tab, _unit, ivfpq_knn, pq_codebooks)

    rng = np.random.default_rng(6)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    ds = ray.data.from_items(rows)
    nc, npb, m, ncd, k, qids = 8, 3, 4, 8, 5, [0, 7, 31]

    cb = pq_codebooks(ds, m, ncd)
    x = vecs.astype(np.float64)
    cents = _unit(x[:nc])
    cell = np.argmax(np.round(_unit(x) @ cents.T, 6), axis=1)
    tab = _pq_micro_tab(x, cb)
    codes = np.argmin(tab, axis=2)
    expect = {}
    for q in qids:
        pr = np.argsort(-np.round(_unit(x[q:q + 1]) @ cents.T, 6)[0],
                        kind="stable")[:npb]
        d = np.array([tab[q, j, codes[:, j]] for j in range(m)]).sum(0)
        cand = [i for i in range(50) if cell[i] in pr and i != q]
        order = sorted(cand, key=lambda i: (d[i], i))[:k]
        for rank, n in enumerate(order, 1):
            expect[(q, rank)] = (n, int(d[n]))

    got = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["dist_micro"])
           for r in ivfpq_knn(ds, qids, k=k, n_centroids=nc, n_probe=npb,
                              m=m, n_codes=ncd).take_all()}
    assert got == expect
