"""Adversarial-input oracle parity: a documents table full of dialect
hazards (NULL text, empty/whitespace-only strings, accents, CJK, emoji,
tabs/newlines, heavy repetition, 500-token docs, one 3000-char token) is
run through BOTH the Ray engine and the DuckDB oracle SQL for every
documents-table query, via scripts/check_oracles.py in a subprocess
(fresh Ray session, exactly the driver's compare). Pins the NULL-text==''
and NFKD-fold==strip_accents dialect decisions."""

import glob
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"

DOC_QUERIES = [
    "normalize_docs", "postings_docs", "stats_docs", "find_docs",
    "find_many_docs", "dedup_exact_docs", "dedup_paragraphs_docs",
    "repetition_docs", "length_quantiles_docs", "token_count_docs",
    "token_count_bpe_docs", "quality_docs", "langid_docs",
    "fingerprint_docs", "minhash_pairs_docs", "jaccard_ngram_pairs_docs",
    "simhash_docs", "simhash_pairs_docs", "decontaminate_docs",
    "curate_corpus_docs", "vocab_top100_docs", "sample_docs_10pct",
    "unigram_rank_docs", "hll_registers_docs", "curate_full_docs",
    "near_dedup_canonical_docs", "stratified_sample_docs",
    "bm25_topk_docs", "dup_ngram_docs", "cms_registers_docs",
    "collocations_docs",
]

TEXTS = [
    None, "", "x", "   ", "a\tb\nc\r\nd",
    "café résumé naïve über",
    "中文文档 日本語 한국어",
    "emoji \U0001f600 test \U0001f680 done",
    "UPPER lower MiXeD CaSe WORDS upper lower",
    "the the the the the the the the",
    "word " * 500,
    " ".join(f"tok{i}" for i in range(400)),
    "a b c d e f g h i j a b c d e f g h i j",
    "punct!!! ??? ... ;;; :: (parens) [brackets] {braces}",
    "email test@example.com phone 555-123-4567 ip 10.0.0.1",
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox leaps over the lazy dog",
    "ends with space ", " starts with space",
    "double  space  between  words",
    "tab\tseparated\ttokens\there",
    "mixed éü unicode and ascii tokens together",
    "numbers 123 456 789 0 42",
    "a" * 3000,
    # non-decomposable / compatibility folds (oracles.NORM_FOLD table):
    # ß joins halves, ligatures expand, word-embedded CJK joins halves,
    # superscripts become digit-spaces, ø/ł/œ/đ drop
    "straße grüße ÆBLE",
    "ﬁle ﬂow ﬀine ﬆop ǆungla ĳssel",
    "abc中def mixed 漢kanji字 word",
    "a²b x³y ½ cup bøb łódź œuf đavo",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    # dir must parse as sf0.001 (the kmeans-centroid oracle export reads
    # the real embeddings table for that sf; ours is the identical copy)
    d = tmp_path_factory.mktemp("adv") / "sf0.001"
    d.mkdir()
    for f in glob.glob(f"{SRC}/*.parquet"):
        shutil.copy(f, d)
    n = len(TEXTS)
    t = pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(["en" if i % 3 else "zh" for i in range(n)]),
        "source": pa.array([f"s{i % 4}" for i in range(n)]),
        "n_chars": pa.array([len(x or "") for x in TEXTS], pa.int32()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_doc_queries_match_oracle_on_adversarial_input(adv_dir):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # subprocess owns its own local session
    out = subprocess.run(
        [sys.executable, "scripts/check_oracles.py", adv_dir, *DOC_QUERIES],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=1200, env=env)
    assert "ALL OK" in out.stdout, out.stdout[-4000:] + out.stderr[-2000:]
