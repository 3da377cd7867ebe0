"""DuckDB oracle SQL builders — the independent re-implementation of every
operator in ANSI-ish SQL, used by the driver's correctness gate.

Each builder returns a SQL string computing exactly what the matching Ray
pipeline computes, over the same parquet tables (pre-registered views for
the driver tables; read_parquet() for the synthesized transcripts). All
outputs are integer / string columns only (see stages/textstats.py note);
every hash is md5-based so both engines derive identical values.

The normalization fragment assumes ASCII input (true for the driver's
documents table and our synthesizer); the Python path additionally handles
non-ASCII via NFKD folding, which SQL cannot express portably.
"""

from __future__ import annotations

from blurrily_ray.config import DEFAULT, ERConfig
from blurrily_ray.functions.hashing import MERSENNE61, minhash_params
from blurrily_ray.functions.normalize import normalize_string
from blurrily_ray.functions.trigram import tokenize
from blurrily_ray.stages.dedup import (
    JACCARD_THRESHOLD_DEN,
    JACCARD_THRESHOLD_NUM,
    NUM_BANDS,
    NUM_PERM,
    SHINGLE_NGRAM,
    SIMHASH_BITS,
)
from blurrily_ray.stages.textstats import LANGID_NUM, STOPWORDS

MAX_KEYS_PER_DOC = 40


def _rel(cfg: ERConfig) -> tuple[int, int]:
    from blurrily_ray.stages.pairs import rel_fraction

    return rel_fraction(cfg)

NORM = "trim(regexp_replace(lower({col}), '[^a-z]+', ' ', 'g'))"

TOKS = "list_filter(regexp_split_to_array({col}, '\\s+'), x -> x <> '')"


def _code_expr(pos: int) -> str:
    mult = 28 ** (pos - 1)
    return (f"{mult}*(CASE WHEN substr(tri,{pos},1) BETWEEN 'a' AND 'z' "
            f"THEN ascii(substr(tri,{pos},1))-96 ELSE 0 END)")


def postings_cte(src_sql: str, prefix: str = "") -> str:
    """CTE chain: src (ref, text) → postings (ref, trigram, weight).
    ``prefix`` renames every CTE so two chains can coexist in one query."""
    # NORM_FOLD, not NORM: the engine normalizer NFKD-folds decomposable
    # accents to their base letter and byte-drops the rest joining halves
    # (functions/normalize.py; map.rb:40-47); NORM_FOLD mirrors both (see
    # its definition) — the accent-to-space NORM diverges by a few
    # trigrams per accented doc, which exact-count oracles (fuzzy_join)
    # catch even though cluster-level ones tolerate it
    norm = NORM_FOLD.format(col="text")
    code = " + ".join(_code_expr(p) for p in (1, 2, 3))
    x = prefix
    return f"""
{x}src AS ({src_sql}),
{x}norm AS (SELECT ref, {norm} AS s FROM {x}src),
{x}pad AS (SELECT ref, length(s) AS L, '**' || replace(s, ' ', '*') || '*' AS p FROM {x}norm),
{x}win AS (SELECT ref, unnest(generate_series(1, L + 1)) AS i FROM {x}pad),
{x}tri AS (SELECT {x}win.ref, {x}pad.L, substr({x}pad.p, CAST({x}win.i AS INT), 3) AS tri
        FROM {x}win JOIN {x}pad ON {x}win.ref = {x}pad.ref),
{x}postings AS MATERIALIZED (SELECT DISTINCT ref, CAST({code} AS BIGINT) AS trigram,
                    CAST(L AS BIGINT) AS weight FROM {x}tri)"""


DOCS_SRC = ("SELECT doc_id AS ref, COALESCE(text, '') "
            "AS text FROM documents")  # NULL text == ''


def transcripts_src(path: str) -> str:
    return (f"SELECT conv_id AS ref, string_agg(text, ' ' ORDER BY turn_idx) AS text "
            f"FROM read_parquet('{path}') GROUP BY conv_id")


def sql_normalize_docs() -> str:
    # NORM_FOLD, not NORM: mirrors the engine's NFKD fold + ascii byte
    # drop (functions/normalize.py; map.rb:40-47), and treats NULL text
    # as '' (reference put semantics)
    norm = NORM_FOLD.format(col="COALESCE(text, '')")
    return f"SELECT doc_id, {norm} AS norm_text FROM documents"


def sql_postings_docs() -> str:
    return f"WITH {postings_cte(DOCS_SRC)} SELECT ref, trigram, weight FROM postings"


def sql_stats_docs() -> str:
    return (f"WITH {postings_cte(DOCS_SRC)} "
            f"SELECT CAST(COUNT(DISTINCT ref) AS BIGINT) AS \"references\", "
            f"CAST(COUNT(*) AS BIGINT) AS trigrams FROM postings")


def sql_find_docs(needle: str, limit: int = 10) -> str:
    codes = ", ".join(str(c) for c in tokenize(normalize_string(needle)))
    return f"""WITH {postings_cte(DOCS_SRC)}
SELECT ref, CAST(COUNT(*) AS BIGINT) AS matches, CAST(MIN(weight) AS BIGINT) AS weight
FROM postings WHERE trigram IN ({codes})
GROUP BY ref
ORDER BY matches DESC, weight ASC, ref ASC LIMIT {limit}"""


def sql_find_many_docs(needles: list[str], limit: int = 10) -> str:
    """Batch find: every needle scored against the documents index, ranked
    (matches DESC, weight ASC, ref ASC), top ``limit`` per needle."""
    values = ", ".join("('" + n.replace("'", "''") + "')" for n in needles)
    return f"""WITH {postings_cte(DOCS_SRC)},
{postings_cte(f"SELECT needle AS ref, needle AS text FROM (VALUES {values}) AS v(needle)", "n")},
hits AS (SELECT np.ref AS needle, p.ref, COUNT(*) AS matches,
                MIN(p.weight) AS weight
         FROM npostings np JOIN postings p USING (trigram)
         GROUP BY np.ref, p.ref),
ranked AS (SELECT needle, ref, matches, weight,
           CAST(row_number() OVER (PARTITION BY needle
                ORDER BY matches DESC, weight ASC, ref ASC) AS BIGINT) AS rank
           FROM hits)
SELECT needle, rank, ref, matches, weight FROM ranked WHERE rank <= {limit}"""


def pairs_cte(src_sql: str, cfg: ERConfig = DEFAULT,
              max_keys: int = MAX_KEYS_PER_DOC, prefix: str = "",
              upto: str = "edges") -> str:
    """postings → thresholded candidate pair CTE chain (mirrors
    stages/pairs.py: rarest-key blocking + stoplist + exact rescoring).
    Handles all blocking modes (config.py), including deterministic
    key sampling (key_sample_mod): the identical integer predicate
    ((key * 2654435761) % 2^32) % mod == 0 in HUGEINT math.
    ``prefix`` namespaces every CTE (src → {prefix}src, edges →
    {prefix}edges, …) so two chains can share one WITH clause
    (sql_er_refined's second pass). ``upto='keys'`` stops the chain at
    keys_kept — DuckDB executes even UNREFERENCED materialized CTEs, so
    oracles that only read the blocking keys (meta_wep/meta_cnp) must
    not carry the cand×postings scoring tail."""
    x = prefix
    samp = (f" WHERE (key::HUGEINT * 2654435761) % 4294967296 "
            f"% {cfg.key_sample_mod} = 0"
            if cfg.key_sample_mod > 1 else "")
    if cfg.blocking_mode == "trigram_triple":
        join_col = "key"
        keys_core = f"""{x}keysq AS (SELECT ref, trigram FROM {x}ranked WHERE rk <= {cfg.triple_rarest}),
{x}comp0 AS (SELECT k1.ref,
                (k1.trigram * 21952 + k2.trigram) * 21952 + k3.trigram AS key
         FROM {x}keysq k1 JOIN {x}keysq k2 ON k1.ref = k2.ref
                                     AND k1.trigram < k2.trigram
                       JOIN {x}keysq k3 ON k1.ref = k3.ref
                                     AND k2.trigram < k3.trigram),
{x}comp AS (SELECT * FROM {x}comp0{samp}),
{x}khist AS (SELECT key, COUNT(*) AS n FROM {x}comp GROUP BY key),
{x}keys_kept AS (SELECT c.ref, c.key FROM {x}comp c JOIN {x}khist h USING (key)
              WHERE h.n <= {cfg.stoplist_cap or cfg.block_cap * cfg.salt_factor_max})"""
    elif cfg.blocking_mode == "trigram_pair":
        join_col = "key"
        keys_core = f"""{x}keysq AS (SELECT ref, trigram FROM {x}ranked WHERE rk <= {cfg.pair_rarest}),
{x}comp0 AS (SELECT k1.ref, k1.trigram * 21952 + k2.trigram AS key
         FROM {x}keysq k1 JOIN {x}keysq k2 ON k1.ref = k2.ref
                                     AND k1.trigram < k2.trigram),
{x}comp AS (SELECT * FROM {x}comp0{samp}),
{x}khist AS (SELECT key, COUNT(*) AS n FROM {x}comp GROUP BY key),
{x}keys_kept AS (SELECT c.ref, c.key FROM {x}comp c JOIN {x}khist h USING (key)
              WHERE h.n <= {cfg.stoplist_cap or cfg.block_cap * cfg.salt_factor_max})"""
    else:
        join_col = "trigram"
        samp1 = (f" WHERE (trigram::HUGEINT * 2654435761) % 4294967296 "
                 f"% {cfg.key_sample_mod} = 0"
                 if cfg.key_sample_mod > 1 else "")
        keys_core = f"""{x}keysq0 AS (SELECT ref, trigram FROM {x}ranked WHERE rk <= {max_keys}),
{x}keysq AS (SELECT * FROM {x}keysq0{samp1}),
{x}khist AS (SELECT trigram, COUNT(*) AS n FROM {x}keysq GROUP BY trigram),
{x}keys_kept AS (SELECT k.ref, k.trigram FROM {x}keysq k JOIN {x}khist h USING (trigram)
              WHERE h.n <= {cfg.stoplist_cap or cfg.block_cap * cfg.salt_factor_max})"""
    head = f"""{postings_cte(src_sql, prefix)},
{x}ntri AS (SELECT ref, COUNT(*) AS ntri FROM {x}postings GROUP BY ref),
{x}hist AS (SELECT trigram, COUNT(*) AS n FROM {x}postings GROUP BY trigram),
{x}ranked AS (SELECT p.ref, p.trigram,
           row_number() OVER (PARTITION BY p.ref ORDER BY h.n, p.trigram) AS rk
           FROM {x}postings p JOIN {x}hist h USING (trigram)),
"""
    if upto == "keys":
        return head + keys_core
    cand = f""",
{x}cand AS (SELECT k1.ref AS a, k2.ref AS b
         FROM {x}keys_kept k1 JOIN {x}keys_kept k2 USING ({join_col})
         WHERE k1.ref < k2.ref
         GROUP BY k1.ref, k2.ref HAVING COUNT(*) >= {cfg.min_cokeys}),"""
    return head + keys_core + cand + f"""
{x}score AS (SELECT c.a, c.b, COUNT(*) AS matches
          FROM {x}cand c JOIN {x}postings p1 ON p1.ref = c.a
                      JOIN {x}postings p2 ON p2.ref = c.b AND p2.trigram = p1.trigram
          GROUP BY c.a, c.b),
{x}edges AS MATERIALIZED (SELECT s.a, s.b, CAST(s.matches AS BIGINT) AS matches
          FROM {x}score s JOIN {x}ntri na ON na.ref = s.a JOIN {x}ntri nb ON nb.ref = s.b
          WHERE s.matches >= {cfg.min_matches}
            AND s.matches * {_rel(cfg)[1]} >= {_rel(cfg)[0]} * LEAST(na.ntri, nb.ntri))"""


TRIGRAM_MODE = ERConfig(blocking_mode="trigram", min_cokeys=1,
                        stoplist_cap=None)
TRIPLE_MODE = ERConfig(blocking_mode="trigram_triple")


def sql_candidate_pairs_docs(cfg: ERConfig = TRIGRAM_MODE) -> str:
    """documents is small (500 docs) — exercises the reference-faithful
    single-trigram blocking incl. its salting; the scale pipeline
    (er_clusters) uses trigram_pair mode."""
    return f"WITH {pairs_cte(DOCS_SRC, cfg)} SELECT a, b, matches FROM edges"


def sql_meta_wep() -> str:
    """Meta-blocking CBS + weighted edge pruning (stages/metablock.py):
    the blocking GRAPH's exact co-key counts from the keys_kept CTE
    (the same chain the candidate oracle uses, min_cokeys NOT applied —
    WEP replaces the fixed floor), pruned by the integer
    cross-multiplied mean test ``w · n_edges ≥ Σw``."""
    from blurrily_ray.stages.editdist import PAIR_MODE

    return f"""WITH {pairs_cte(DOCS_SRC, PAIR_MODE, upto="keys")},
cbs AS (SELECT k1.ref AS a, k2.ref AS b, CAST(COUNT(*) AS BIGINT) AS cbs
        FROM keys_kept k1 JOIN keys_kept k2 USING (key)
        WHERE k1.ref < k2.ref GROUP BY 1, 2),
tot AS (SELECT COALESCE(SUM(cbs), 0) AS s, COUNT(*) AS c FROM cbs)
SELECT a, b, cbs FROM cbs, tot WHERE cbs * c >= s"""


def sql_link_tables() -> str:
    """Two-table record linkage (stages/linkage.link_tables): the
    candidate CTE chain over the side-tagged UNION of both tables
    (blocking statistics shared — the same construction the engine
    uses), cross-side edges only, oriented A→B, refs untagged by
    position."""
    from blurrily_ray.stages.editdist import PAIR_MODE

    tagged = ("SELECT CASE WHEN doc_id % 2 = 0 THEN 'A|' ELSE 'B|' END "
              "|| CAST(doc_id AS VARCHAR) AS ref, COALESCE(text, '') "
              "AS text FROM documents")
    return f"""WITH {pairs_cte(tagged, PAIR_MODE)},
stats AS (SELECT e.a, e.b, e.matches,
                 na.ntri AS ntri_a, nb.ntri AS ntri_b,
                 pa.weight AS weight_a, pb.weight AS weight_b
          FROM edges e
          JOIN ntri na ON na.ref = e.a JOIN ntri nb ON nb.ref = e.b
          JOIN (SELECT ref, MIN(weight) AS weight FROM postings GROUP BY ref) pa ON pa.ref = e.a
          JOIN (SELECT ref, MIN(weight) AS weight FROM postings GROUP BY ref) pb ON pb.ref = e.b
          WHERE substr(e.a, 1, 1) <> substr(e.b, 1, 1))
SELECT CAST(substr(CASE WHEN s.a LIKE 'A%' THEN s.a ELSE s.b END, 3) AS BIGINT) AS a_ref,
       CAST(substr(CASE WHEN s.a LIKE 'A%' THEN s.b ELSE s.a END, 3) AS BIGINT) AS b_ref,
       s.matches,
       CAST(CASE WHEN s.a LIKE 'A%' THEN s.ntri_a ELSE s.ntri_b END AS BIGINT) AS ntri_a,
       CAST(CASE WHEN s.a LIKE 'A%' THEN s.ntri_b ELSE s.ntri_a END AS BIGINT) AS ntri_b,
       CAST(CASE WHEN s.a LIKE 'A%' THEN s.weight_a ELSE s.weight_b END AS BIGINT) AS weight_a,
       CAST(CASE WHEN s.a LIKE 'A%' THEN s.weight_b ELSE s.weight_a END AS BIGINT) AS weight_b
FROM stats s"""


def _token_blocking_cte(src_sql: str, cap: int) -> str:
    """Token-blocking graph CTEs (stages/tokenblock.py): distinct
    md5_number-mod-p token hashes per doc (the shingle-hash signedness
    correction), block purging at ``cap``, exact common-token weights."""
    toks = TOKS.format(col="lower(COALESCE(text, ''))")
    h = (f"CAST(CASE WHEN md5_number(t) < 0 "
         f"THEN ((md5_number(t) % {MERSENNE61}) + {MERSENNE61} + 64) "
         f"% {MERSENNE61} "
         f"ELSE md5_number(t) % {MERSENNE61} END AS BIGINT)")
    return f"""w AS (SELECT ref, {toks} AS ws FROM ({src_sql})),
tk0 AS (SELECT ref, unnest(ws) AS t FROM w),
tk AS (SELECT DISTINCT ref, {h} AS key FROM tk0),
kh AS (SELECT key, COUNT(*) AS n FROM tk GROUP BY key),
kept AS (SELECT tk.ref, tk.key FROM tk JOIN kh USING (key)
         WHERE kh.n <= {cap}),
cbs AS (SELECT k1.ref AS a, k2.ref AS b, CAST(COUNT(*) AS BIGINT) AS cbs
        FROM kept k1 JOIN kept k2 USING (key)
        WHERE k1.ref < k2.ref GROUP BY 1, 2)"""


def sql_token_pairs(transcripts_path: str,
                    cfg: ERConfig | None = None) -> str:
    """Token-blocking candidate edges with common-token weights over the
    assembled transcript corpus — the name/entity-rich input word-level
    blocking is built for (stages/tokenblock.token_blocking_pairs)."""
    from blurrily_ray.stages.tokenblock import TOKEN_MODE

    cfg = cfg or TOKEN_MODE
    cap = cfg.stoplist_cap or cfg.block_cap * cfg.salt_factor_max
    return f"""WITH {_token_blocking_cte(transcripts_src(transcripts_path), cap)}
SELECT a, b, cbs FROM cbs"""


def sql_token_meta_wep(transcripts_path: str,
                       cfg: ERConfig | None = None) -> str:
    """The full published meta-blocking workflow: token blocking → CBS
    → weighted edge pruning (stages/tokenblock.token_meta_wep)."""
    from blurrily_ray.stages.tokenblock import TOKEN_MODE

    cfg = cfg or TOKEN_MODE
    cap = cfg.stoplist_cap or cfg.block_cap * cfg.salt_factor_max
    return f"""WITH {_token_blocking_cte(transcripts_src(transcripts_path), cap)},
tot AS (SELECT COALESCE(SUM(cbs), 0) AS s, COUNT(*) AS c FROM cbs)
SELECT a, b, cbs FROM cbs, tot WHERE cbs * c >= s"""


def sql_meta_cnp(k: int = 5, reciprocal: bool = False) -> str:
    """Meta-blocking CBS + cardinality node pruning
    (stages/metablock.cnp_prune): per-node top-``k`` incident edges by
    weight with RANK tie-keeping; an edge survives if ≥1 endpoint
    retains it (or both, ``reciprocal``)."""
    from blurrily_ray.stages.editdist import PAIR_MODE

    need = 2 if reciprocal else 1
    return f"""WITH {pairs_cte(DOCS_SRC, PAIR_MODE, upto="keys")},
cbs AS (SELECT k1.ref AS a, k2.ref AS b, CAST(COUNT(*) AS BIGINT) AS cbs
        FROM keys_kept k1 JOIN keys_kept k2 USING (key)
        WHERE k1.ref < k2.ref GROUP BY 1, 2),
ex AS (SELECT a AS node, a, b, cbs FROM cbs
       UNION ALL SELECT b AS node, a, b, cbs FROM cbs),
rk AS (SELECT node, a, b, cbs,
              RANK() OVER (PARTITION BY node ORDER BY cbs DESC) AS r
       FROM ex),
fl AS (SELECT a, b, cbs, COUNT(*) FILTER (WHERE r <= {k}) AS nf
       FROM rk GROUP BY a, b, cbs)
SELECT a, b, cbs FROM fl WHERE nf >= {need}"""


def sql_edit_pairs(max_dist: int = 40) -> str:
    """Exact Levenshtein verify over the pair-blocked candidate edges
    (stages/editdist.py): DuckDB's unit-cost levenshtein() on the same
    normalized strings the engine's Myers bit-parallel kernel scans —
    both sides are pure-ASCII after the fold, so character vs byte
    semantics cannot diverge."""
    from blurrily_ray.stages.editdist import PAIR_MODE

    return f"""WITH {pairs_cte(DOCS_SRC, PAIR_MODE)}
SELECT e.a, e.b, e.matches, CAST(levenshtein(ta.s, tb.s) AS BIGINT) AS dist
FROM edges e JOIN norm ta ON ta.ref = e.a JOIN norm tb ON tb.ref = e.b
WHERE levenshtein(ta.s, tb.s) <= {max_dist}"""


def sql_dl_pairs(max_dist: int = 40) -> str:
    """Exact TRUE Damerau-Levenshtein verify over the pair-blocked
    candidate edges (stages/editdist.dl_verify_pairs): DuckDB's
    damerau_levenshtein() — probe-verified unrestricted Lowrance-Wagner
    ('CA'→'ABC' = 2, not OSA's 3) counting UTF-8 bytes, the same
    dialect the engine kernel scans (pure-ASCII post-normalize, so
    characters == bytes)."""
    from blurrily_ray.stages.editdist import PAIR_MODE

    return f"""WITH {pairs_cte(DOCS_SRC, PAIR_MODE)}
SELECT e.a, e.b, e.matches,
       CAST(damerau_levenshtein(ta.s, tb.s) AS BIGINT) AS dist
FROM edges e JOIN norm ta ON ta.ref = e.a JOIN norm tb ON tb.ref = e.b
WHERE damerau_levenshtein(ta.s, tb.s) <= {max_dist}"""


def sql_wjac_pairs(min_micro: int = 200_000) -> str:
    """Rarity-weighted trigram Jaccard over the pair-blocked candidate
    edges (stages/wjaccard.py): w(t) = (N·10⁶) // df(t) from the SAME
    postings/hist CTEs the blocking uses, per-side and shared weight
    sums as exact BIGINT aggregates, the final ratio one HUGEINT floor
    division — no float anywhere, so engine and oracle agree bitwise."""
    from blurrily_ray.stages.editdist import PAIR_MODE

    return f"""WITH {pairs_cte(DOCS_SRC, PAIR_MODE)},
nn AS (SELECT COUNT(*) AS n FROM ntri),
wt AS (SELECT trigram, ((SELECT n FROM nn) * 1000000) // n AS w FROM hist),
dw AS (SELECT p.ref, SUM(w.w) AS sw FROM postings p
       JOIN wt w USING (trigram) GROUP BY p.ref),
shw AS (SELECT e.a, e.b, e.matches, SUM(w.w) AS sh
        FROM edges e JOIN postings p1 ON p1.ref = e.a
        JOIN postings p2 ON p2.ref = e.b AND p2.trigram = p1.trigram
        JOIN wt w ON w.trigram = p1.trigram
        GROUP BY e.a, e.b, e.matches)
SELECT s.a, s.b, s.matches,
       CAST((CAST(s.sh AS HUGEINT) * 1000000)
            // (da.sw + db.sw - s.sh) AS BIGINT) AS wjac_micro
FROM shw s JOIN dw da ON da.ref = s.a JOIN dw db ON db.ref = s.b
WHERE (CAST(s.sh AS HUGEINT) * 1000000)
      // (da.sw + db.sw - s.sh) >= {min_micro}"""


def _fs_ag_cte() -> str:
    """Agreement-vector CTE over the PRE-threshold candidate set
    (stages/fellegi.py fields: trigram ≥80 %, length ±5, 16-char prefix).
    `score` is computed FROM `cand` in pairs_cte, so its rows ARE the
    candidate pairs (every cand pair shares ≥ arity trigrams)."""
    from blurrily_ray.stages.fellegi import LEN_TOL, PREFIX_LEN, TRIGRAM_PCT

    return f"""ag AS (SELECT s.a, s.b,
    CASE WHEN s.matches * 100 >= {TRIGRAM_PCT} * LEAST(na.ntri, nb.ntri)
         THEN 1 ELSE 0 END AS g0,
    CASE WHEN ABS(length(ta.s) - length(tb.s)) <= {LEN_TOL}
         THEN 1 ELSE 0 END AS g1,
    CASE WHEN substr(ta.s, 1, {PREFIX_LEN}) = substr(tb.s, 1, {PREFIX_LEN})
         THEN 1 ELSE 0 END AS g2
    FROM score s JOIN ntri na ON na.ref = s.a JOIN ntri nb ON nb.ref = s.b
         JOIN norm ta ON ta.ref = s.a JOIN norm tb ON tb.ref = s.b)"""


def sql_fs_counts() -> str:
    """Fellegi-Sunter agreement-pattern histogram — the distributed
    EM's sufficient statistic, fully integer."""
    from blurrily_ray.stages.editdist import PAIR_MODE

    return f"""WITH {pairs_cte(DOCS_SRC, PAIR_MODE)},
{_fs_ag_cte()}
SELECT CAST(g0 + 2*g1 + 4*g2 AS BIGINT) AS pattern,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ag GROUP BY 1"""


def sql_fs_scores(weights) -> str:
    """Fellegi-Sunter match weights over the candidate pairs GIVEN the
    engine's EM-learned (K, 2) weight matrix, embedded as repr-exact
    float64 literals (strtod round-trip — the bm25 precedent). The
    score expression parenthesizes each field term and sums
    left-to-right, exactly the engine's accumulation order, so the
    float64s and their micro-int floors agree bitwise."""
    from blurrily_ray.stages.editdist import PAIR_MODE

    w = [(repr(float(row[0])), repr(float(row[1]))) for row in weights]
    terms = " + ".join(
        f"(g{k} * {wa} + (1 - g{k}) * {wd})" for k, (wa, wd) in enumerate(w))
    return f"""WITH {pairs_cte(DOCS_SRC, PAIR_MODE)},
{_fs_ag_cte()}
SELECT a, b, CAST(g0 + 2*g1 + 4*g2 AS BIGINT) AS pattern,
       CAST(FLOOR(({terms}) * 1e6) AS BIGINT) AS fs_micro
FROM ag"""


def sql_snm_pairs(window: int = 4) -> str:
    """Sorted-neighborhood blocking (stages/snm.py): every pair within
    ``window`` consecutive positions of the (normalized-text, ref) sort
    order, as a row_number window self-join. Codepoint string order on
    both sides (pure-ASCII normalized strings), unique-ref tie-break."""
    norm = NORM_FOLD.format(col="text")
    return f"""WITH src AS ({DOCS_SRC}),
norm AS (SELECT ref, {norm} AS s FROM src),
ranked AS (SELECT ref, row_number() OVER (ORDER BY s, ref) AS rk FROM norm)
SELECT r1.ref AS a, r2.ref AS b, CAST(r2.rk - r1.rk AS BIGINT) AS rank_dist
FROM ranked r1 JOIN ranked r2 ON r2.rk > r1.rk AND r2.rk < r1.rk + {window}"""


def sql_snm_pairs_multi(window: int = 4) -> str:
    """Multi-pass SNM (stages/snm.snm_pairs_multi): union of the forward
    and reversed-key windowed pairs, canonical (a < b in ref order),
    passes = how many passes proposed the pair."""
    norm = NORM_FOLD.format(col="text")
    return f"""WITH src AS ({DOCS_SRC}),
norm AS (SELECT ref, {norm} AS s FROM src),
r1 AS (SELECT ref, row_number() OVER (ORDER BY s, ref) AS rk FROM norm),
r2 AS (SELECT ref, row_number() OVER (ORDER BY reverse(s), ref) AS rk
       FROM norm),
p1 AS (SELECT x.ref AS ra, y.ref AS rb FROM r1 x JOIN r1 y
       ON y.rk > x.rk AND y.rk < x.rk + {window}),
p2 AS (SELECT x.ref AS ra, y.ref AS rb FROM r2 x JOIN r2 y
       ON y.rk > x.rk AND y.rk < x.rk + {window}),
allp AS (SELECT LEAST(ra, rb) AS a, GREATEST(ra, rb) AS b
         FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2))
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS passes FROM allp GROUP BY a, b"""


def sql_jw_pairs(min_sim: float = 0.8) -> str:
    """Exact Jaro-Winkler verify over the pair-blocked candidate edges
    (stages/stringsim.py): DuckDB's jaro_winkler_similarity() on the
    same normalized strings the engine's bit-parallel kernel scans.
    The engine kernel is fuzz-pinned bit-for-bit to DuckDB's float64
    (tests/test_stringsim.py), so the micro-int export FLOOR(jw*1e6)
    and the >= threshold are exact on both sides."""
    from blurrily_ray.stages.editdist import PAIR_MODE

    return f"""WITH {pairs_cte(DOCS_SRC, PAIR_MODE)}
SELECT e.a, e.b, e.matches,
       CAST(FLOOR(jaro_winkler_similarity(ta.s, tb.s) * 1e6) AS BIGINT)
           AS jw_micro
FROM edges e JOIN norm ta ON ta.ref = e.a JOIN norm tb ON tb.ref = e.b
WHERE jaro_winkler_similarity(ta.s, tb.s) >= {min_sim}"""


def sql_er_clusters(transcripts_path: str, cfg: ERConfig = DEFAULT) -> str:
    """Full ER: blocking + scoring + threshold + transitive closure."""
    return f"""WITH RECURSIVE {pairs_cte(transcripts_src(transcripts_path), cfg)},
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
reach(s, d) AS (SELECT s, d FROM sym
                UNION
                SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s),
nodes AS (SELECT DISTINCT ref FROM src)
SELECT n.ref, CASE WHEN MIN(r.d) IS NULL OR n.ref <= MIN(r.d)
                   THEN n.ref ELSE MIN(r.d) END AS cluster_id
FROM nodes n LEFT JOIN reach r ON r.s = n.ref
GROUP BY n.ref"""


def sql_er_tiered(transcripts_path: str, cfg: ERConfig = DEFAULT,
                  tight_cfg: ERConfig | None = None) -> str:
    """Two-resolution single-linkage (pipelines/er.run_er_tiered): one
    candidate chain at the loose thresholds, the tight tier as a pure
    re-threshold of the SAME edges (ntri re-join), two closures,
    nested labels."""
    if tight_cfg is None:
        from dataclasses import replace

        tight_cfg = replace(cfg, min_matches=max(8, cfg.min_matches),
                            min_matches_rel=0.75)
    num2, den2 = _rel(tight_cfg)
    return f"""WITH RECURSIVE {pairs_cte(transcripts_src(transcripts_path), cfg)},
tedges AS MATERIALIZED (SELECT e.a, e.b FROM edges e
        JOIN ntri na ON na.ref = e.a JOIN ntri nb ON nb.ref = e.b
        WHERE e.matches >= {tight_cfg.min_matches}
          AND e.matches * {den2} >= {num2} * LEAST(na.ntri, nb.ntri)),
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
reach(s, d) AS (SELECT s, d FROM sym
                UNION
                SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s),
tsym AS MATERIALIZED (SELECT a AS s, b AS d FROM tedges UNION ALL SELECT b, a FROM tedges),
treach(s, d) AS (SELECT s, d FROM tsym
                 UNION
                 SELECT r.s, y.d FROM treach r JOIN tsym y ON r.d = y.s),
nodes AS (SELECT DISTINCT ref FROM src),
loose AS (SELECT n.ref, CASE WHEN MIN(r.d) IS NULL OR n.ref <= MIN(r.d)
               THEN n.ref ELSE MIN(r.d) END AS cluster_loose
          FROM nodes n LEFT JOIN reach r ON r.s = n.ref GROUP BY n.ref),
tight AS (SELECT n.ref, CASE WHEN MIN(r.d) IS NULL OR n.ref <= MIN(r.d)
               THEN n.ref ELSE MIN(r.d) END AS cluster_tight
          FROM nodes n LEFT JOIN treach r ON r.s = n.ref GROUP BY n.ref)
SELECT l.ref, t.cluster_tight, l.cluster_loose
FROM loose l JOIN tight t USING (ref)"""


def sql_er_cluster_stats(transcripts_path: str,
                         cfg: ERConfig = DEFAULT) -> str:
    """Per-cluster linkage-confidence statistics (mirrors
    stages/cluster.cluster_edge_stats): member counts + intra-cluster
    edge count / min / max / sum of matches; singletons report zeros."""
    return f"""WITH RECURSIVE {pairs_cte(transcripts_src(transcripts_path), cfg)},
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
reach(s, d) AS (SELECT s, d FROM sym
                UNION
                SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s),
nodes AS (SELECT DISTINCT ref FROM src),
clusters AS (SELECT n.ref, CASE WHEN MIN(r.d) IS NULL OR n.ref <= MIN(r.d)
                  THEN n.ref ELSE MIN(r.d) END AS cluster_id
             FROM nodes n LEFT JOIN reach r ON r.s = n.ref GROUP BY n.ref),
ec AS (SELECT c.cluster_id, e.matches FROM edges e
       JOIN clusters c ON c.ref = e.a),
es AS (SELECT cluster_id, COUNT(*) AS n_edges, MIN(matches) AS mn,
              MAX(matches) AS mx, SUM(matches) AS sm FROM ec GROUP BY 1),
mc AS (SELECT cluster_id, COUNT(*) AS n_members FROM clusters GROUP BY 1)
SELECT m.cluster_id,
       CAST(m.n_members AS BIGINT) AS n_members,
       CAST(COALESCE(es.n_edges, 0) AS BIGINT) AS n_edges,
       CAST(COALESCE(es.mn, 0) AS BIGINT) AS min_matches,
       CAST(COALESCE(es.mx, 0) AS BIGINT) AS max_matches,
       CAST(COALESCE(es.sm, 0) AS BIGINT) AS sum_matches
FROM mc m LEFT JOIN es ON es.cluster_id = m.cluster_id"""


def sql_er_refined(transcripts_path: str, cfg: ERConfig = DEFAULT,
                   refine_cfg: ERConfig | None = None) -> str:
    """Merge-and-refine ER (pipelines/er.run_er_refined): pass-1 closure
    → per-cluster merged text (string_agg of member texts, ref order) →
    a SECOND prefixed candidate chain over the merged records → second
    closure → label composition."""
    refine_cfg = refine_cfg or cfg
    return f"""WITH RECURSIVE {pairs_cte(transcripts_src(transcripts_path), cfg)},
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
reach(s, d) AS (SELECT s, d FROM sym
                UNION
                SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s),
nodes AS (SELECT DISTINCT ref FROM src),
clusters AS (SELECT n.ref, CASE WHEN MIN(r.d) IS NULL OR n.ref <= MIN(r.d)
                  THEN n.ref ELSE MIN(r.d) END AS cluster_id
             FROM nodes n LEFT JOIN reach r ON r.s = n.ref GROUP BY n.ref),
merged AS MATERIALIZED (SELECT c.cluster_id AS ref,
                  string_agg(s.text, ' ' ORDER BY s.ref) AS text
           FROM clusters c JOIN src s ON s.ref = c.ref
           GROUP BY c.cluster_id),
{pairs_cte("SELECT ref, text FROM merged", refine_cfg, prefix="r")},
rsym AS MATERIALIZED (SELECT a AS s, b AS d FROM redges
                      UNION ALL SELECT b, a FROM redges),
rreach(s, d) AS (SELECT s, d FROM rsym
                 UNION
                 SELECT r.s, y.d FROM rreach r JOIN rsym y ON r.d = y.s),
rnodes AS (SELECT DISTINCT ref FROM rsrc),
super AS (SELECT n.ref, CASE WHEN MIN(r.d) IS NULL OR n.ref <= MIN(r.d)
               THEN n.ref ELSE MIN(r.d) END AS super_id
          FROM rnodes n LEFT JOIN rreach r ON r.s = n.ref GROUP BY n.ref)
SELECT c.ref, sp.super_id AS cluster_id
FROM clusters c JOIN super sp ON sp.ref = c.cluster_id"""


def sql_er_golden(transcripts_path: str, cfg: ERConfig = DEFAULT) -> str:
    """Survivorship rollup of the SQL-derived clusters (mirrors
    stages/cluster.cluster_golden): canonical member + exact integer
    merge stats per entity cluster. length() counts codepoints in both
    DuckDB and the engine's str.len (parity pinned in tests)."""
    return f"""WITH RECURSIVE {pairs_cte(transcripts_src(transcripts_path), cfg)},
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
reach(s, d) AS (SELECT s, d FROM sym
                UNION
                SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s),
nodes AS (SELECT DISTINCT ref FROM src),
clusters AS (SELECT n.ref, CASE WHEN MIN(r.d) IS NULL OR n.ref <= MIN(r.d)
                  THEN n.ref ELSE MIN(r.d) END AS cluster_id
             FROM nodes n LEFT JOIN reach r ON r.s = n.ref GROUP BY n.ref),
stats AS (SELECT conv_id, COUNT(*) AS n_turns,
                 SUM(length(COALESCE(text, ''))) AS chars
          FROM read_parquet('{transcripts_path}') GROUP BY conv_id)
SELECT c.cluster_id, MIN(c.ref) AS canonical_ref,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(s.n_turns) AS BIGINT) AS n_turns,
       CAST(SUM(s.chars) AS BIGINT) AS text_chars
FROM clusters c JOIN stats s ON s.conv_id = c.ref
GROUP BY c.cluster_id"""


def sql_er_eval(transcripts_path: str, truth_path: str,
                cfg: ERConfig = DEFAULT) -> str:
    """Pairwise-F1 integer counts of the SQL-derived clusters against the
    labeled ground truth (mirrors stages/cluster.cluster_eval): the
    contingency identity Σ C(n_g, 2) over cluster / entity /
    cluster×entity group sizes — no pair enumeration."""
    return f"""WITH RECURSIVE {pairs_cte(transcripts_src(transcripts_path), cfg)},
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
reach(s, d) AS (SELECT s, d FROM sym
                UNION
                SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s),
nodes AS (SELECT DISTINCT ref FROM src),
clusters AS (SELECT n.ref, CASE WHEN MIN(r.d) IS NULL OR n.ref <= MIN(r.d)
                  THEN n.ref ELSE MIN(r.d) END AS cluster_id
             FROM nodes n LEFT JOIN reach r ON r.s = n.ref GROUP BY n.ref),
j AS (SELECT c.cluster_id, g.entity_id
      FROM clusters c JOIN read_parquet('{truth_path}') g ON g.conv_id = c.ref
      WHERE g.entity_id IS NOT NULL),
bs AS (SELECT COUNT(*) AS n FROM j GROUP BY cluster_id, entity_id),
ps AS (SELECT COUNT(*) AS n FROM j GROUP BY cluster_id),
ts AS (SELECT COUNT(*) AS n FROM j GROUP BY entity_id)
SELECT CAST(COALESCE((SELECT SUM((n*(n-1))//2) FROM bs), 0) AS BIGINT) AS tp_pairs,
       CAST(COALESCE((SELECT SUM((n*(n-1))//2) FROM ps), 0) AS BIGINT) AS pred_pairs,
       CAST(COALESCE((SELECT SUM((n*(n-1))//2) FROM ts), 0) AS BIGINT) AS truth_pairs"""


def sql_er_eval_bcubed(transcripts_path: str, truth_path: str,
                       cfg: ERConfig = DEFAULT) -> str:
    """B-cubed integer sums of the SQL-derived clusters against the
    labeled ground truth (mirrors stages/cluster.cluster_eval_bcubed):
    per (cluster, entity) cell of size n, precision adds
    ⌊n²·10⁶/|cluster|⌋ and recall ⌊n²·10⁶/|entity|⌋ — HUGEINT floor
    division, identical to the engine's per-cell integer floors."""
    return f"""WITH RECURSIVE {pairs_cte(transcripts_src(transcripts_path), cfg)},
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
reach(s, d) AS (SELECT s, d FROM sym
                UNION
                SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s),
nodes AS (SELECT DISTINCT ref FROM src),
clusters AS (SELECT n.ref, CASE WHEN MIN(r.d) IS NULL OR n.ref <= MIN(r.d)
                  THEN n.ref ELSE MIN(r.d) END AS cluster_id
             FROM nodes n LEFT JOIN reach r ON r.s = n.ref GROUP BY n.ref),
j AS (SELECT c.cluster_id, g.entity_id
      FROM clusters c JOIN read_parquet('{truth_path}') g ON g.conv_id = c.ref
      WHERE g.entity_id IS NOT NULL),
cells AS (SELECT cluster_id, entity_id, COUNT(*) AS n FROM j GROUP BY 1, 2),
cs AS (SELECT cluster_id, SUM(n) AS nc FROM cells GROUP BY 1),
es AS (SELECT entity_id, SUM(n) AS ne FROM cells GROUP BY 1)
SELECT CAST(COALESCE((SELECT SUM(n) FROM cells), 0) AS BIGINT) AS n_items,
       CAST(COALESCE((SELECT SUM((CAST(c.n AS HUGEINT) * c.n * 1000000) // s.nc)
                      FROM cells c JOIN cs s USING (cluster_id)), 0)
            AS BIGINT) AS bp_micro_sum,
       CAST(COALESCE((SELECT SUM((CAST(c.n AS HUGEINT) * c.n * 1000000) // s.ne)
                      FROM cells c JOIN es s USING (entity_id)), 0)
            AS BIGINT) AS br_micro_sum"""


def sql_blocking_eval(transcripts_path: str, truth_path: str,
                      cfg: ERConfig = DEFAULT) -> str:
    """Blocking-quality metrics (mirrors stages/cluster.blocking_eval):
    candidate / true-positive / truth pair counts over the pre-threshold
    `cand` CTE plus the labeled ground truth; ratios exported as exact
    BIGINT floor-division micro-ints (reduction ratio, pair completeness,
    pair quality — Christen 2012). Degenerate denominators export the
    vacuous 1.0 (1_000_000), pairwise_f1's empty-denominator convention."""
    return f"""WITH {pairs_cte(transcripts_src(transcripts_path), cfg)},
lab AS (SELECT conv_id AS ref, entity_id FROM read_parquet('{truth_path}')),
nodes AS (SELECT DISTINCT ref FROM src),
nlab AS (SELECT l.ref, l.entity_id FROM lab l JOIN nodes n USING (ref)
         WHERE l.entity_id IS NOT NULL),
m AS (SELECT
    (SELECT COUNT(*) FROM nodes) AS n_refs,
    (SELECT COUNT(*) FROM cand) AS cand_pairs,
    (SELECT COUNT(*) FROM cand p
        JOIN nlab la ON la.ref = p.a
        JOIN nlab lb ON lb.ref = p.b AND la.entity_id = lb.entity_id)
        AS tp_pairs,
    (SELECT CAST(COALESCE(SUM((n*(n-1))//2), 0) AS BIGINT)
     FROM (SELECT COUNT(*) AS n FROM nlab GROUP BY entity_id))
        AS truth_pairs)
SELECT CAST(n_refs AS BIGINT) AS n_refs,
       CAST(n_refs*(n_refs-1)//2 AS BIGINT) AS total_pairs,
       CAST(cand_pairs AS BIGINT) AS cand_pairs,
       CAST(tp_pairs AS BIGINT) AS tp_pairs,
       CAST(truth_pairs AS BIGINT) AS truth_pairs,
       CAST(CASE WHEN n_refs >= 2
            THEN (n_refs*(n_refs-1)//2 - cand_pairs) * 1000000
                 // (n_refs*(n_refs-1)//2)
            ELSE 1000000 END AS BIGINT) AS rr_micro,
       CAST(CASE WHEN truth_pairs > 0
            THEN tp_pairs * 1000000 // truth_pairs
            ELSE 1000000 END AS BIGINT) AS pc_micro,
       CAST(CASE WHEN cand_pairs > 0
            THEN tp_pairs * 1000000 // cand_pairs
            ELSE 1000000 END AS BIGINT) AS pq_micro
FROM m"""


def sql_token_blocking_eval(transcripts_path: str, truth_path: str,
                            cfg: ERConfig | None = None) -> str:
    """Christen blocking-quality metrics over the TOKEN-blocking
    candidates (same metric tail as sql_blocking_eval, cand := the
    token-blocking graph's edges) — the comparative audit of the
    word-granularity scheme against the trigram pipeline's."""
    from blurrily_ray.stages.tokenblock import TOKEN_MODE

    cfg = cfg or TOKEN_MODE
    cap = cfg.stoplist_cap or cfg.block_cap * cfg.salt_factor_max
    return f"""WITH {_token_blocking_cte(transcripts_src(transcripts_path), cap)},
cand AS (SELECT a, b FROM cbs),
lab AS (SELECT conv_id AS ref, entity_id FROM read_parquet('{truth_path}')),
nodes AS (SELECT DISTINCT ref FROM w),
nlab AS (SELECT l.ref, l.entity_id FROM lab l JOIN nodes n USING (ref)
         WHERE l.entity_id IS NOT NULL),
m AS (SELECT
    (SELECT COUNT(*) FROM nodes) AS n_refs,
    (SELECT COUNT(*) FROM cand) AS cand_pairs,
    (SELECT COUNT(*) FROM cand p
        JOIN nlab la ON la.ref = p.a
        JOIN nlab lb ON lb.ref = p.b AND la.entity_id = lb.entity_id)
        AS tp_pairs,
    (SELECT CAST(COALESCE(SUM((n*(n-1))//2), 0) AS BIGINT)
     FROM (SELECT COUNT(*) AS n FROM nlab GROUP BY entity_id))
        AS truth_pairs)
SELECT CAST(n_refs AS BIGINT) AS n_refs,
       CAST(n_refs*(n_refs-1)//2 AS BIGINT) AS total_pairs,
       CAST(cand_pairs AS BIGINT) AS cand_pairs,
       CAST(tp_pairs AS BIGINT) AS tp_pairs,
       CAST(truth_pairs AS BIGINT) AS truth_pairs,
       CAST(CASE WHEN n_refs >= 2
            THEN (n_refs*(n_refs-1)//2 - cand_pairs) * 1000000
                 // (n_refs*(n_refs-1)//2)
            ELSE 1000000 END AS BIGINT) AS rr_micro,
       CAST(CASE WHEN truth_pairs > 0
            THEN tp_pairs * 1000000 // truth_pairs
            ELSE 1000000 END AS BIGINT) AS pc_micro,
       CAST(CASE WHEN cand_pairs > 0
            THEN tp_pairs * 1000000 // cand_pairs
            ELSE 1000000 END AS BIGINT) AS pq_micro
FROM m"""


def sql_exact_dedup_docs() -> str:
    return ("SELECT MIN(doc_id) AS doc_id FROM documents "
        "GROUP BY COALESCE(text, '')")  # NULL text == ''


def sql_decontaminate(bench_lo: int = 0, bench_hi: int = 10,
                      buckets: int = 100, salt: str = "split") -> str:
    """Benchmark decontamination (stages/dedup.decontaminate): per
    non-benchmark doc, distinct shingle hashes shared with any benchmark
    doc; benchmark = the deterministic md5-bucket split [lo, hi)."""
    bexpr = (f"CAST(('0x' || substr(md5('{salt}:' || "
             f"CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) % {buckets}")
    return f"""WITH {_shingle_cte()},
bench AS (SELECT doc_id FROM documents
          WHERE {bexpr} >= {bench_lo} AND {bexpr} < {bench_hi}),
bh AS (SELECT DISTINCT s.h FROM sh s JOIN bench ON s.ref = bench.doc_id),
cnt AS (SELECT s.ref, COUNT(*) AS n_shingles,
               COUNT(bh.h) AS n_shared
        FROM sh s LEFT JOIN bh ON s.h = bh.h
        GROUP BY s.ref)
SELECT d.doc_id, CAST(COALESCE(c.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(c.n_shared, 0) AS BIGINT) AS n_shared
FROM documents d LEFT JOIN cnt c ON c.ref = d.doc_id
WHERE NOT ({bexpr} >= {bench_lo} AND {bexpr} < {bench_hi})"""


def sql_repetition_stats() -> str:
    """Word-bigram repetition signals (stages/textstats.repetition_stats)."""
    toks = TOKS.format(col="lower(text)")
    return f"""WITH w AS (SELECT doc_id, {toks} AS ws FROM documents),
bg AS (
  SELECT doc_id, array_to_string(list_slice(ws, CAST(i AS INT), CAST(i AS INT) + 1), ' ') AS b
  FROM (SELECT doc_id, ws, unnest(generate_series(1, length(ws) - 1)) AS i
        FROM w WHERE length(ws) >= 2)
),
cnt AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
agg AS (SELECT doc_id, SUM(c) AS n_bg, COUNT(*) AS n_distinct, MAX(c) AS max_c
        FROM cnt GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(a.n_bg, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct_bigrams,
       CAST(COALESCE(a.max_c, 0) AS BIGINT) AS max_bigram_count
FROM documents d LEFT JOIN agg a USING (doc_id)"""


def sql_group_quantiles() -> str:
    """Per-source exact discrete length quantiles
    (stages/textstats.group_quantiles)."""
    return """SELECT source,
       CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS q50,
       CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS q75,
       CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS q95,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY source"""


def sql_dedup_paragraphs(words_per_para: int = 10) -> str:
    """Paragraph-level exact dedup (stages/dedup.dedup_paragraphs): fixed
    word-window paragraphs, first occurrence by (doc_id, pidx) wins
    corpus-wide, survivors reassemble per doc."""
    w = words_per_para
    return f"""WITH t AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws
           FROM documents),
paras AS (
  SELECT doc_id, CAST((i - 1) // {w} AS BIGINT) AS pidx,
         array_to_string(list_slice(ws, CAST(i AS INT), CAST(i AS INT) + {w - 1}), ' ') AS para
  FROM (SELECT doc_id, ws, unnest(generate_series(1, length(ws), {w})) AS i FROM t)
),
ranked AS (
  SELECT doc_id, pidx, para,
         ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pidx) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_orig
  FROM paras
)
SELECT doc_id, string_agg(para, ' ' ORDER BY pidx) AS text,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MIN(n_orig) AS BIGINT) AS n_orig
FROM ranked WHERE rn = 1
GROUP BY doc_id"""


def sql_token_count_docs() -> str:
    toks = TOKS.format(col="COALESCE(text, '')")
    return (f"SELECT doc_id, CAST(length({toks}) AS BIGINT) "
            f"AS n_tokens FROM documents")


def _stoplist_sql() -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def sql_token_count_bpe_docs() -> str:
    from blurrily_ray.stages.textstats import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return (f"SELECT doc_id, "
            f"CAST(len(regexp_extract_all(COALESCE(text, ''), '{pat}')) "
            f"AS BIGINT) AS n_bpe_tokens FROM documents")


def sql_quality_docs() -> str:
    toks = TOKS.format(col="text")
    return f"""WITH t AS (SELECT doc_id, COALESCE(text, '') AS text, {toks} AS ws
           FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents))
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(length(ws) AS BIGINT) AS n_tokens,
  CAST(COALESCE(list_aggregate(list_transform(ws, x -> length(x)), 'sum'), 0) AS BIGINT) AS sum_token_len,
  CAST(length(list_filter(ws, x -> list_contains({_stoplist_sql()}, lower(x)))) AS BIGINT) AS n_stop,
  CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct
FROM t"""


def sql_langid_docs() -> str:
    toks = TOKS.format(col="text")
    return f"""WITH t AS (SELECT doc_id, {toks} AS ws FROM documents),
c AS (SELECT doc_id, length(ws) AS n_tok,
      length(list_filter(ws, x -> list_contains({_stoplist_sql()}, lower(x)))) AS n_stop FROM t)
SELECT doc_id, CASE WHEN n_tok > 0 AND n_stop * {LANGID_NUM} >= n_tok
                    THEN 'en' ELSE 'unknown' END AS lang_pred FROM c"""


def sql_fingerprint_docs(ngram: int = 5) -> str:
    toks = TOKS.format(col="text")
    return f"""WITH w AS (SELECT doc_id, trim(text) AS t, {toks} AS ws
           FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents)),
small AS (SELECT doc_id, md5(t) AS fingerprint FROM w WHERE length(ws) < {ngram}),
big AS (SELECT doc_id, MIN(md5(array_to_string(list_slice(ws, CAST(i AS INT), CAST(i AS INT) + {ngram - 1}), ' '))) AS fingerprint
        FROM (SELECT doc_id, ws, unnest(generate_series(1, length(ws) - {ngram - 1})) AS i
              FROM w WHERE length(ws) >= {ngram})
        GROUP BY doc_id)
SELECT * FROM small UNION ALL SELECT * FROM big"""


def _shingle_cte(src: str = "documents", id_col: str = "doc_id") -> str:
    """src → sh (ref, h): distinct md5_number-mod-p shingle hashes over
    word {SHINGLE_NGRAM}-grams of the lowered text."""
    toks = TOKS.format(col=f"lower(text)")
    n = SHINGLE_NGRAM
    return f"""w AS (SELECT {id_col} AS ref, {toks} AS ws FROM {src}),
shs AS (
  SELECT ref, array_to_string(list_slice(ws, CAST(i AS INT), CAST(i AS INT) + {n - 1}), ' ') AS s
  FROM (SELECT ref, ws, unnest(generate_series(1, length(ws) - {n - 1})) AS i
        FROM w WHERE length(ws) >= {n})
  UNION ALL
  SELECT ref, array_to_string(ws, ' ') AS s FROM w WHERE length(ws) BETWEEN 1 AND {n - 1}
),
sh AS (SELECT DISTINCT ref,
       -- md5_number is SIGNED HUGEINT: for negative v (= x - 2^128) the
       -- unsigned value is x ≡ v + 2^128, and 2^128 ≡ 64 (mod 2^61-1)
       -- (2^122 ≡ 1), so re-add 64 then renormalize — this makes h
       -- bit-identical to python's md5_num(s) % MERSENNE61, which the
       -- banding keys (md5 of sig strings) depend on
       CAST(CASE WHEN md5_number(s) < 0
                 THEN ((md5_number(s) % {MERSENNE61}) + {MERSENNE61} + 64)
                      % {MERSENNE61}
                 ELSE md5_number(s) % {MERSENNE61} END AS BIGINT) AS h
       FROM shs)"""


def sql_minhash_pairs_docs(seed: int = 42) -> str:
    """MinHash → LSH bands → exact-Jaccard verify (mirrors stages/dedup.py
    minhash_dedup_pairs)."""
    a, b = minhash_params(NUM_PERM, seed)
    perm_rows = ", ".join(f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)"
                          for i in range(NUM_PERM))
    rpb = NUM_PERM // NUM_BANDS
    return f"""WITH {_shingle_cte()},
perms(perm, pa, pb) AS (VALUES {perm_rows}),
sigs AS (SELECT sh.ref, p.perm,
         CAST(MIN((p.pa * sh.h::HUGEINT + p.pb) % {MERSENNE61}) AS BIGINT) AS sig
         FROM sh, perms p GROUP BY sh.ref, p.perm),
allrefs AS (SELECT DISTINCT ref FROM w),
sigfull AS (SELECT r.ref, p.perm,
            COALESCE(s.sig, 0) AS sig
            FROM allrefs r CROSS JOIN perms p
            LEFT JOIN sigs s ON s.ref = r.ref AND s.perm = p.perm),
bkeys AS (SELECT ref, band,
          md5('b' || CAST(band AS VARCHAR) || '|' ||
              string_agg(CAST(sig AS VARCHAR), '-' ORDER BY perm)) AS bkey
          FROM (SELECT ref, perm // {rpb} AS band, perm, sig FROM sigfull)
          GROUP BY ref, band),
cand AS (SELECT DISTINCT b1.ref AS a, b2.ref AS b
         FROM bkeys b1 JOIN bkeys b2 ON b1.bkey = b2.bkey AND b1.ref < b2.ref),
inter AS (SELECT c.a, c.b, COUNT(*) AS n_inter
          FROM cand c JOIN sh s1 ON s1.ref = c.a
                      JOIN sh s2 ON s2.ref = c.b AND s2.h = s1.h
          GROUP BY c.a, c.b),
sizes AS (SELECT ref, COUNT(*) AS n FROM sh GROUP BY ref)
SELECT c.a, c.b, CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(za.n + zb.n - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union
FROM cand c
LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN sizes za ON za.ref = c.a JOIN sizes zb ON zb.ref = c.b
WHERE COALESCE(i.n_inter, 0) * {JACCARD_THRESHOLD_DEN}
      >= (za.n + zb.n - COALESCE(i.n_inter, 0)) * {JACCARD_THRESHOLD_NUM}
  AND (za.n + zb.n - COALESCE(i.n_inter, 0)) > 0"""


def _simhash_cte() -> str:
    """CTE chain ending in sh(doc_id, simhash) — shared by the signature
    query and the banded near-dup pair query."""
    toks = TOKS.format(col="lower(text)")
    return f"""w AS (SELECT doc_id, {toks} AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS tk FROM w),
tc AS (SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY doc_id, tk),
th AS (SELECT doc_id, c, CAST(md5_number(tk) % {1 << SIMHASH_BITS} AS BIGINT) AS h FROM tc),
bits AS (SELECT doc_id, CAST(j AS INT) AS j,
         SUM(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN c ELSE -c END) AS sgn
         FROM th, unnest(generate_series(0, {SIMHASH_BITS - 1})) AS t(j)
         GROUP BY doc_id, j),
vals AS (SELECT doc_id, SUM(CASE WHEN sgn > 0 THEN (1::BIGINT << j) ELSE 0 END) AS simhash
         FROM bits GROUP BY doc_id),
sh AS (SELECT d.doc_id, CAST(COALESCE(v.simhash, 0) AS BIGINT) AS simhash
       FROM documents d LEFT JOIN vals v ON v.doc_id = d.doc_id)"""


def sql_simhash_docs() -> str:
    return f"WITH {_simhash_cte()} SELECT doc_id, simhash FROM sh"


def sql_simhash_pairs(max_hamming: int = 3, n_bands: int = 4) -> str:
    """Banded SimHash near-dup pairs (stages/dedup.simhash_pairs):
    candidates = docs agreeing exactly on ≥ 1 of the n_bands bit-bands;
    keep pairs with XOR-popcount ≤ max_hamming."""
    bb = SIMHASH_BITS // n_bands
    return f"""WITH {_simhash_cte()},
bands AS (SELECT doc_id, simhash,
          (simhash >> (CAST(b AS INT) * {bb})) & {(1 << bb) - 1} AS bval,
          CAST(b AS INT) AS band
          FROM sh, unnest(generate_series(0, {n_bands - 1})) AS t(b)),
cand AS (SELECT DISTINCT x.doc_id AS ca, y.doc_id AS cb,
                x.simhash AS sa, y.simhash AS sb
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id)
SELECT ca AS a, cb AS b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}"""


def sql_knn_embeddings(n_queries: int = 10, k: int = 10) -> str:
    return f"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {n_queries}),
sims AS (SELECT q.qid, e.vec_id AS nid,
         round(list_cosine_similarity(e.embedding, q.qe), 6) AS cos
         FROM embeddings e, q WHERE e.vec_id <> q.qid),
ranked AS (SELECT qid AS query_id, nid AS neighbor_id,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS BIGINT) AS rank
           FROM sims)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= {k}"""


def sql_ivf_knn(n_queries: int = 10, k: int = 10, n_centroids: int = 16,
                n_probe: int = 4) -> str:
    """IVF approximate kNN (mirrors simsearch.ivf_knn): centroids = the
    vectors with ids 0..C-1; every vector assigned to its nearest cell
    (round(cos,6), ties by cid); each query exhaustively scores only its
    n_probe closest cells."""
    return f"""WITH cents AS (SELECT vec_id AS cid, embedding AS ce
           FROM embeddings WHERE vec_id < {n_centroids}),
{_ivf_body(n_queries, k, n_probe)}"""


def _ivf_body(n_queries: int, k: int, n_probe: int) -> str:
    """Shared IVF assignment + probing + ranking SQL, given a ``cents``
    CTE of (cid, ce)."""
    return f"""assign AS (SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round(list_cosine_similarity(e.embedding, c.ce), 6)
                        DESC, c.cid ASC) AS rn
    FROM embeddings e, cents c) WHERE rn = 1),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id < {n_queries}),
probes AS (SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
               ORDER BY round(list_cosine_similarity(q.qe, c.ce), 6)
                        DESC, c.cid ASC) AS rn
    FROM q, cents c) WHERE rn <= {n_probe}),
cand AS (SELECT q.qid, e.vec_id AS nid,
                round(list_cosine_similarity(e.embedding, q.qe), 6) AS cos
         FROM q JOIN probes p ON p.qid = q.qid
                JOIN assign a ON a.cid = p.cid
                JOIN embeddings e ON e.vec_id = a.vec_id
         WHERE e.vec_id <> q.qid),
ranked AS (SELECT qid AS query_id, nid AS neighbor_id,
           CAST(row_number() OVER (PARTITION BY qid
                ORDER BY cos DESC, nid ASC) AS BIGINT) AS rank
           FROM cand)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= {k}"""


def sql_ivf_knn_kmeans(cents, n_queries: int = 10, k: int = 10,
                       n_probe: int = 4) -> str:
    """IVF kNN against EXPORTED k-means centroids embedded as a SQL
    literal. The Lloyd iteration itself is iterative float math with no
    SQL counterpart (determinism + exact-at-full-probe are pytest-pinned,
    stages/simsearch.kmeans_centroids); what IS oracle-checkable is the
    assignment + probing + ranking GIVEN the engine's centroid matrix —
    ``repr(float)`` round-trips each float64 exactly, so DuckDB scores
    against bit-identical centroids."""
    rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}])"
        for i, c in enumerate(cents))
    return f"""WITH cents AS (
  SELECT cid, ce FROM (VALUES {rows}) AS t(cid, ce)),
{_ivf_body(n_queries, k, n_probe)}"""


def sql_embed_neardup(threshold: float = 0.95) -> str:
    return f"""SELECT e1.vec_id AS a, e2.vec_id AS b
FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= {threshold}"""


def sql_embed_neardup_lsh(threshold: float = 0.95, n_planes: int = 16,
                          n_tables: int = 1, seed: int = 42) -> str:
    """Random-hyperplane LSH near-dup (mirrors simsearch.lsh_neardup_pairs):
    plane[d][j] = md5_number('plane-{seed}-{j}-{d}') % 2^32 / 2^31 - 1,
    table t owns projections t·k..(t+1)·k-1; bucket = (t << k) + Σ 2^(j%k)
    over positive RAW dot products; exact cosine verified within buckets,
    pairs deduped across tables. Both engines reproduce the identical
    bucketing, so outputs match exactly despite recall < 1."""
    n_proj = n_planes * n_tables
    return f"""WITH planes AS (
  -- DuckDB md5_number is a SIGNED HUGEINT; 2^32 divides 2^128, so
  -- adding 2^32 back after a negative remainder reproduces the unsigned
  -- value python's md5_num() % 2^32 computes
  SELECT j, d,
         CAST((md5_number('plane-{seed}-' || j || '-' || d) % 4294967296
               + 4294967296) % 4294967296
              AS DOUBLE) / 2147483648.0 - 1.0 AS val
  FROM (SELECT unnest(generate_series(0, {n_proj - 1})) AS j),
       (SELECT unnest(generate_series(0,
              (SELECT len(embedding) FROM embeddings LIMIT 1) - 1)) AS d)
),
em AS (SELECT vec_id, unnest(embedding) AS x,
              unnest(generate_series(0, len(embedding) - 1)) AS d
       FROM embeddings),
dots AS (SELECT em.vec_id, p.j, SUM(em.x * p.val) AS dp
         FROM em JOIN planes p USING (d) GROUP BY em.vec_id, p.j),
buckets AS (SELECT vec_id, j // {n_planes} AS t,
            CAST(((j // {n_planes})::BIGINT << {n_planes}) +
                 SUM(CASE WHEN dp > 0
                     THEN (1::BIGINT << (j % {n_planes})) ELSE 0 END)
                 AS BIGINT) AS bucket
            FROM dots GROUP BY vec_id, j // {n_planes}),
cand AS (SELECT DISTINCT b1.vec_id AS a, b2.vec_id AS b
         FROM buckets b1 JOIN buckets b2
              ON b1.bucket = b2.bucket AND b1.vec_id < b2.vec_id)
SELECT c.a, c.b
FROM cand c
JOIN embeddings e1 ON e1.vec_id = c.a
JOIN embeddings e2 ON e2.vec_id = c.b
WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= {threshold}"""


def sql_sessionize_events(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60_000_000
    return f"""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
d AS (SELECT user_id, us,
      CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > {gap_us}
           THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
s AS (SELECT user_id, us,
      SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                     ROWS UNBOUNDED PRECEDING) AS session_idx FROM d)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(us) AS BIGINT) AS start_us, CAST(MAX(us) AS BIGINT) AS end_us
FROM s GROUP BY user_id, session_idx"""


def sql_audio_duration() -> str:
    """Clip duration of the synthetic WAV payloads
    (multimodal.attach_audio_payload): sample count n = 1000 +
    byte2(md5(text)) * 16 at 8 kHz, reproduced from the md5 seed in SQL —
    an independent check that the WAV decoder reads the RIFF data-chunk
    length correctly. rms/zcr/peak are not SQL-expressible (pytest covers
    them against closed-form sine expectations)."""
    return ("SELECT doc_id, (1000 + CAST(('0x' || substr(md5(text), 3, 2)) "
            "AS INTEGER) * 16) / 8000.0 AS duration_sec FROM documents")


def sql_jaccard_ngram_pairs() -> str:
    """Exact prefix-filtered n-gram Jaccard join (mirrors
    stages/dedup.jaccard_ngram_pairs): per-doc prefix length =
    n - ceil(tau*n) + 1 under ascending-hash order; candidates share a
    prefix hash; verify is the exact intersection count."""
    num, den = JACCARD_THRESHOLD_NUM, JACCARD_THRESHOLD_DEN
    return f"""WITH {_shingle_cte()},
sizes AS (SELECT ref, COUNT(*) AS n FROM sh GROUP BY ref),
ranked AS (SELECT sh.ref, sh.h,
           ROW_NUMBER() OVER (PARTITION BY sh.ref ORDER BY sh.h) AS rk,
           z.n FROM sh JOIN sizes z ON z.ref = sh.ref),
prefix AS (SELECT ref, h FROM ranked
           WHERE rk <= n - ((n * {num} + {den} - 1) // {den}) + 1),
cand AS (SELECT DISTINCT p1.ref AS a, p2.ref AS b
         FROM prefix p1 JOIN prefix p2 ON p1.h = p2.h AND p1.ref < p2.ref),
inter AS (SELECT c.a, c.b, COUNT(*) AS n_inter
          FROM cand c JOIN sh s1 ON s1.ref = c.a
                      JOIN sh s2 ON s2.ref = c.b AND s2.h = s1.h
          GROUP BY c.a, c.b),
sizes2 AS (SELECT ref, COUNT(*) AS n FROM sh GROUP BY ref)
SELECT c.a, c.b, CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(za.n + zb.n - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union
FROM cand c
LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN sizes2 za ON za.ref = c.a JOIN sizes2 zb ON zb.ref = c.b
WHERE COALESCE(i.n_inter, 0) * {den}
      >= (za.n + zb.n - COALESCE(i.n_inter, 0)) * {num}
  AND (za.n + zb.n - COALESCE(i.n_inter, 0)) > 0"""


def sql_window_agg_events(window_minutes: int = 60) -> str:
    """Tumbling-window aggregate (stages/windows.window_agg). value is
    summed in integer micro-units (FLOOR(value*1e6)) on BOTH sides so the
    result is exact and independent of summation order — a float SUM
    would hash differently per partitioning."""
    w = window_minutes * 60_000_000
    return f"""SELECT (epoch_us(ts) // {w}) * {w} AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT)
           AS sum_value_micro
FROM events GROUP BY 1, 2"""


def sql_hopping_window_events(window_minutes: int = 60,
                              hop_minutes: int = 15) -> str:
    """Hopping-window aggregate (stages/windows.hopping_window_agg): each
    event unnests into window/hop overlapping window starts (multiples of
    hop), then the tumbling rollup; integer micro-unit sums as in
    sql_window_agg_events."""
    h = hop_minutes * 60_000_000
    span = (window_minutes // hop_minutes - 1) * h
    return f"""SELECT window_start_us, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT)
           AS sum_value_micro
FROM (SELECT unnest(generate_series(
                 (epoch_us(ts) // {h}) * {h} - {span},
                 (epoch_us(ts) // {h}) * {h}, {h})) AS window_start_us,
             event_type, user_id, value
      FROM events)
GROUP BY 1, 2"""


def sql_asof_purchase_click() -> str:
    """Backward as-of join (stages/joins.asof_join): each purchase event
    picks the user's most recent click at-or-before it; ties on click_ts
    break to the highest click event_id — the same order the engine's
    right-side sort induces. Unmatched purchases carry -1 (the engine
    fills its left-join nulls identically so value hashes agree)."""
    return """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_event_id, user_id AS cu,
             epoch_us(ts) AS click_ts_us
      FROM events WHERE event_type = 'click'),
j AS (SELECT p.event_id, c.click_event_id, c.click_ts_us,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.click_ts_us DESC,
                                         c.click_event_id DESC) AS rn
      FROM p JOIN c ON c.cu = p.user_id AND c.click_ts_us <= p.ts_us)
SELECT p.event_id, p.user_id, p.ts_us,
       CAST(COALESCE(j.click_event_id, -1) AS BIGINT) AS click_event_id,
       CAST(COALESCE(j.click_ts_us, -1) AS BIGINT) AS click_ts_us
FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)"""


def sql_range_join_events(window_sec: int = 300) -> str:
    """Time-range join (stages/joins.range_join_count): per event, the
    number of same-user events in the following ``window_sec`` seconds."""
    w = window_sec * 1_000_000
    return f"""SELECT e.event_id, CAST(COUNT(f.event_id) AS BIGINT) AS n_next
FROM events e LEFT JOIN events f
  ON f.user_id = e.user_id
 AND epoch_us(f.ts) > epoch_us(e.ts)
 AND epoch_us(f.ts) <= epoch_us(e.ts) + {w}
GROUP BY e.event_id"""


def sql_video_frames(stride: int = 2) -> str:
    """Sampled-frame inventory of the synthetic motion-BMP payloads
    (multimodal.attach_video_payload): n_frames = 4 + byte3(md5(text)) %
    12, frames are 8×8, and the sampler keeps every ``stride``-th index —
    an independent check that the container index walk and stride seek
    are correct. Per-frame channel means aren't SQL-expressible
    (pytest covers them against the encoder's pixel source)."""
    return f"""WITH n AS (SELECT doc_id,
         4 + CAST(('0x' || substr(md5(text), 7, 2)) AS INTEGER) % 12 AS nf
       FROM documents)
SELECT doc_id,
       CAST(unnest(generate_series(0, nf - 1, {stride})) AS BIGINT)
           AS frame_idx,
       CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height
FROM n"""


def sql_curate_corpus(min_tokens: int = 5, max_tokens: int = 10_000,
                      max_punct_pct: int = 20) -> str:
    """Composed curation filter (pipelines/curate.curate_corpus): English
    heuristic + token-budget bounds + punctuation cap + exact dedup
    keep-min-id. All-integer comparisons; dedup groups on md5(text)."""
    toks = TOKS.format(col="text")
    return f"""WITH t AS (SELECT doc_id, text, {toks} AS ws FROM documents),
c AS (SELECT doc_id, text, length(ws) AS n_tok,
      length(list_filter(ws, x -> list_contains({_stoplist_sql()}, lower(x))))
          AS n_stop,
      length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
          AS n_punct,
      length(text) AS n_chars
      FROM t),
kept AS (SELECT doc_id, text, n_tok FROM c
         WHERE n_tok >= {min_tokens} AND n_tok <= {max_tokens}
           AND n_stop * {LANGID_NUM} >= n_tok
           AND n_punct * 100 <= {max_punct_pct} * n_chars)
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(MIN(n_tok) AS BIGINT) AS n_tokens
FROM kept GROUP BY md5(text)"""


def sql_image_features() -> str:
    """Decode-path oracle for the synthetic image payloads
    (multimodal.attach_binary_payload): pixels tile the 16 md5 bytes over
    8×8×3, and 192 ≡ 0 (mod 3·16 interleave) makes every channel's mean
    equal the digest-byte mean — sum16/16/255, exact in float64 on both
    engines (integer sums, power-of-two divide, one shared /255
    rounding). A stubbed decode would return width = -1 and md5-derived
    features instead, so this catches any decode regression."""
    return """WITH b AS (SELECT doc_id, md5(COALESCE(text, '')) AS hx
           FROM documents),
v AS (SELECT doc_id,
             CAST(('0x' || substr(hx, 1 + 2 * i, 2)) AS INTEGER) AS byte
      FROM b, LATERAL (SELECT unnest(generate_series(0, 15)) AS i) g),
s AS (SELECT doc_id, SUM(byte) AS s16 FROM v GROUP BY doc_id)
SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       s16 / 16.0 / 255.0 AS mean_r,
       s16 / 16.0 / 255.0 AS mean_g,
       s16 / 16.0 / 255.0 AS mean_b
FROM s"""


def sql_top_events_per_user(k: int = 3) -> str:
    """top_k_per_group oracle: each user's top-k events by value
    (event_id ascending breaks ties)."""
    return f"""SELECT event_id, user_id, value FROM (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= {k}"""


def sql_vocab_top_k(k: int = 100) -> str:
    """Corpus token-frequency oracle (textstats.vocab_top_k)."""
    toks = TOKS.format(col="text")
    return f"""SELECT lower(t) AS token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest({toks}) AS t FROM documents)
GROUP BY lower(t) ORDER BY n DESC, token LIMIT {k}"""


def sql_sample_docs(lo: int = 0, hi: int = 10, buckets: int = 100,
                    salt: str = "split") -> str:
    """deterministic_split oracle: same md5-bucket expression in SQL."""
    return f"""SELECT doc_id, text FROM documents
WHERE CAST(('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 16))
           AS UBIGINT) % {buckets} >= {lo}
  AND CAST(('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 16))
           AS UBIGINT) % {buckets} < {hi}"""


def sql_pricing_summary() -> str:
    """TPC-H-Q1-shaped rollup (stages/relational.py pricing_summary).
    Micro-integer sums: CAST(FLOOR(x*1e6) AS BIGINT) per row, summed —
    FLOOR not ROUND, and the multiplication chains are left-associated in
    both engines so the IEEE doubles (and hence the floors) bit-match."""
    return """SELECT *, CAST(sum_qty_micro // n_rows AS BIGINT) AS avg_qty_micro,
       CAST(sum_base_micro // n_rows AS BIGINT) AS avg_price_micro
FROM (SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(FLOOR(l_quantity * 1e6) AS BIGINT))
                  AS BIGINT) AS sum_qty_micro,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 1e6) AS BIGINT))
                  AS BIGINT) AS sum_base_micro,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1e6)
                           AS BIGINT)) AS BIGINT) AS sum_disc_micro,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 1e6) AS BIGINT))
                  AS BIGINT) AS sum_charge_micro,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag, l_linestatus)"""


def sql_revenue_by_nation() -> str:
    """orders ⋈ customer ⋈ nation revenue rollup
    (stages/relational.py revenue_by_nation)."""
    return """SELECT n_name,
       CAST(SUM(CAST(FLOOR(o_totalprice * 1e6) AS BIGINT))
            AS BIGINT) AS revenue_micro,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name"""


def sql_redact_tickets(path: str) -> str:
    """PII redaction oracle (stages/redact.py) over the synthetic tickets
    parquet: byte-identical RE2/re-intersection patterns, counts on the
    original text, replacements applied email -> phone -> ip."""
    from blurrily_ray.stages.redact import EMAIL_RE, IP_RE, PHONE_RE

    return f"""SELECT ticket_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g'),
           '{IP_RE}', '<IP>', 'g') AS red_text,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_email,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phone,
       len(regexp_extract_all(text, '{IP_RE}')) AS n_ip
FROM read_parquet('{path}')"""


# SQL mirror of the engine's NFKD-fold normalizer (functions/normalize.py):
# lower → fold common NFKD *compatibility* chars DuckDB's strip_accents
# leaves alone (ligatures 1→N via replace, super/subscript digits 1→1 via
# translate) → strip_accents (≡ NFKD + combining-mark drop for decomposable
# accents) → DELETE any remaining non-ASCII char (the engine's
# ascii-'ignore' byte drop — halves JOIN, they are never spaced apart) →
# non-[a-z] → space → collapse/trim. Exotic compatibility mappings beyond
# this table (e.g. ℓ, №, fullwidth forms) remain engine-only dialect bound;
# the adversarial corpus pins everything listed here.
_COMPAT_FOLDS = [
    ("ﬁ", "fi"), ("ﬂ", "fl"), ("ﬀ", "ff"), ("ﬃ", "ffi"), ("ﬄ", "ffl"),
    ("ﬅ", "st"), ("ﬆ", "st"), ("ǆ", "dz"), ("ǉ", "lj"), ("ǌ", "nj"),
    ("ǳ", "dz"), ("ĳ", "ij"),
]


def _norm_fold_expr() -> str:
    inner = "lower({col})"
    for src, dst in _COMPAT_FOLDS:
        inner = f"replace({inner}, '{src}', '{dst}')"
    inner = f"translate({inner}, '¹²³⁰⁴⁵⁶⁷⁸⁹', '1230456789')"
    return ("trim(regexp_replace(regexp_replace(strip_accents(" + inner +
            "), '[^\\x00-\\x7F]', '', 'g'), '[^a-z]+', ' ', 'g'))")


NORM_FOLD = _norm_fold_expr()


def sql_csv_roundtrip(path: str) -> str:
    """Connector round-trip oracle (sources/csv.py): the CSV export +
    schema-contract re-read must reproduce the source parquet projection
    value-for-value."""
    return (f"SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, text "
            f"FROM read_parquet('{path}')")


def sql_orc_roundtrip() -> str:
    """Connector round-trip oracle (sources/orc.py): the content-addressed
    ORC sink + per-file pyarrow.orc re-read must reproduce the documents
    projection value-for-value."""
    return "SELECT doc_id, text, lang, source FROM documents"


def sql_dedup_keep_best(path: str) -> str:
    """Best-put-wins dedup oracle (stages/dedup.dedup_keep_best) over the
    synthetic transcripts. strip_accents == the engine's NFKD fold for
    decomposable accents (all this corpus has — parity pinned row-exact in
    tests); length() and Python len() agree on single-codepoint text."""
    norm = NORM_FOLD.format(col="text")
    return f"""SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, text
FROM (SELECT conv_id, turn_idx, text,
             ROW_NUMBER() OVER (PARTITION BY md5({norm})
                 ORDER BY length(text) DESC, conv_id, turn_idx) AS rn
      FROM read_parquet('{path}'))
WHERE rn = 1"""


def sql_unigram_rank(top_v: int = 1000) -> str:
    """Unigram-rank quality score oracle (textstats.unigram_rank_score):
    all-integer corpus-frequency ranks, OOV beyond top_v."""
    toks = TOKS.format(col="text")
    return f"""WITH lt AS (SELECT doc_id, lower(t) AS t
           FROM (SELECT doc_id, unnest({toks}) AS t FROM documents)),
cnt AS (SELECT t, COUNT(*) AS n FROM lt GROUP BY t),
vocab AS (SELECT t, rank FROM
          (SELECT t, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rank FROM cnt)
          WHERE rank <= {top_v}),
agg AS (SELECT lt.doc_id,
               SUM(COALESCE(vocab.rank, {top_v + 1})) AS sum_rank,
               COUNT(*) AS n_tokens,
               SUM(CASE WHEN vocab.rank IS NULL THEN 1 ELSE 0 END) AS n_oov
        FROM lt LEFT JOIN vocab ON lt.t = vocab.t
        GROUP BY lt.doc_id)
SELECT d.doc_id, CAST(COALESCE(a.sum_rank, 0) AS BIGINT) AS sum_rank,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_oov, 0) AS BIGINT) AS n_oov
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"""


def sql_hll_registers(p: int = 8) -> str:
    """HLL register-table oracle (stages/sketch.hll_token_registers):
    hash = first 8 md5 bytes big-endian (== hashing.stable_u64), bucket =
    top p bits, rank = 64-p+1 - bitlength(remainder); all integer."""
    toks = TOKS.format(col="text")
    rem_bits = 64 - p
    mask = (1 << rem_bits) - 1
    return f"""WITH lt AS (SELECT source, lower(t) AS t
           FROM (SELECT source, unnest({toks}) AS t FROM documents)),
h AS (SELECT source, CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) AS h
      FROM lt)
SELECT source, CAST(h >> {rem_bits} AS BIGINT) AS bucket,
       CAST(MAX(CASE WHEN (h & {mask}) = 0 THEN {rem_bits + 1}
                ELSE {rem_bits + 1} - length(bin(h & {mask})) END)
            AS BIGINT) AS max_rank
FROM h GROUP BY source, CAST(h >> {rem_bits} AS BIGINT)"""


def sql_curate_full(min_tokens: int = 5, max_tokens: int = 10_000,
                    max_punct_pct: int = 20, top_v: int = 20,
                    max_mean_rank_x100: int = 1450,
                    contamination_den: int = 5, bench_lo: int = 0,
                    bench_hi: int = 10, buckets: int = 100,
                    salt: str = "split") -> str:
    """Full composed curation oracle (pipelines/curate.curate_corpus_full):
    quality+dedup base ∩ decontaminated ∩ unigram-mean-rank cap."""
    toks = TOKS.format(col="text")
    bexpr = (f"CAST(('0x' || substr(md5('{salt}:' || "
             f"CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) % {buckets}")
    return f"""WITH t AS (SELECT doc_id, text, {toks} AS ws FROM documents),
c AS (SELECT doc_id, text, length(ws) AS n_tok,
      length(list_filter(ws, x -> list_contains({_stoplist_sql()}, lower(x))))
          AS n_stop,
      length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
          AS n_punct,
      length(text) AS n_chars
      FROM t),
kept AS (SELECT doc_id, text, n_tok FROM c
         WHERE n_tok >= {min_tokens} AND n_tok <= {max_tokens}
           AND n_stop * {LANGID_NUM} >= n_tok
           AND n_punct * 100 <= {max_punct_pct} * n_chars),
dd AS (SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
              CAST(MIN(n_tok) AS BIGINT) AS n_tokens
       FROM kept GROUP BY md5(text)),
{_shingle_cte()},
bench AS (SELECT doc_id FROM documents
          WHERE {bexpr} >= {bench_lo} AND {bexpr} < {bench_hi}),
bh AS (SELECT DISTINCT s.h FROM sh s JOIN bench ON s.ref = bench.doc_id),
dcnt AS (SELECT s.ref, COUNT(*) AS n_shingles, COUNT(bh.h) AS n_shared
         FROM sh s LEFT JOIN bh ON s.h = bh.h GROUP BY s.ref),
clean AS (SELECT d.doc_id FROM documents d
          LEFT JOIN dcnt ON dcnt.ref = d.doc_id
          WHERE NOT ({bexpr} >= {bench_lo} AND {bexpr} < {bench_hi})
            AND COALESCE(dcnt.n_shared, 0) * {contamination_den}
                <= COALESCE(dcnt.n_shingles, 0)),
lt AS (SELECT doc_id, lower(tk) AS tk
       FROM (SELECT doc_id, unnest({toks}) AS tk FROM documents)),
ucnt AS (SELECT tk, COUNT(*) AS n FROM lt GROUP BY tk),
vocab AS (SELECT tk, rank FROM
          (SELECT tk, ROW_NUMBER() OVER (ORDER BY n DESC, tk) AS rank
           FROM ucnt) WHERE rank <= {top_v}),
uagg AS (SELECT lt.doc_id, SUM(COALESCE(vocab.rank, {top_v + 1})) AS sum_rank,
                COUNT(*) AS n_tokens
         FROM lt LEFT JOIN vocab ON lt.tk = vocab.tk GROUP BY lt.doc_id),
smooth AS (SELECT d.doc_id FROM documents d LEFT JOIN uagg a
           ON d.doc_id = a.doc_id
           WHERE COALESCE(a.sum_rank, 0) * 100
                 <= COALESCE(a.n_tokens, 0) * {max_mean_rank_x100})
SELECT dd.doc_id, dd.n_tokens
FROM dd JOIN clean ON dd.doc_id = clean.doc_id
        JOIN smooth ON dd.doc_id = smooth.doc_id"""


def sql_fuzzy_join(path: str, k: int = 3,
                   needle_pred: str | None = None) -> str:
    """Fuzzy-linkage oracle (stages/index.fuzzy_join): every conversation
    doc linked to its top-k v0 (canonical-variant) catalog docs by shared
    trigram count, FIND ordering.

    The npostings × cpostings trigram join is quadratic in common-trigram
    frequency; at sf0.1 the full-needle query exhausts DuckDB (~106 GB,
    NOTES_r3). ``needle_pred`` restricts the NEEDLE side (catalog stays
    full) to a deterministic sample — scoring is per-needle independent,
    so the sampled oracle is EXACT on the sampled needles. Used by
    scripts/check_fuzzy_scale.py with an md5(ref)-prefix predicate the
    engine side reproduces bit-for-bit."""
    nsrc = transcripts_src(path)
    if needle_pred is not None:
        nsrc = f"SELECT * FROM ({nsrc}) WHERE {needle_pred}"
    csrc = f"SELECT * FROM ({transcripts_src(path)}) WHERE ref LIKE '%v0'"
    return f"""WITH {postings_cte(nsrc, "n")},
{postings_cte(csrc, "c")},
j AS (SELECT np.ref AS needle_ref, cp.ref AS ref, COUNT(*) AS matches,
             MIN(cp.weight) AS weight
      FROM npostings np JOIN cpostings cp ON np.trigram = cp.trigram
      GROUP BY np.ref, cp.ref)
SELECT needle_ref, ref, CAST(matches AS BIGINT) AS matches,
       CAST(weight AS BIGINT) AS weight
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY needle_ref
          ORDER BY matches DESC, weight ASC, ref ASC) AS rn FROM j)
WHERE rn <= {k}"""


def sql_near_dedup_canonical(seed: int = 42) -> str:
    """stages/dedup.near_dedup_canonical mirror: the MinHash+LSH verified
    pair query (sql_minhash_pairs_docs) as the edge set, transitive
    closure by recursive reachability, cluster label = smallest doc_id of
    the component, keep = 1 iff the doc IS its cluster's label."""
    pairs = sql_minhash_pairs_docs(seed)
    return f"""WITH RECURSIVE edges AS MATERIALIZED (
    SELECT a, b FROM ({pairs}) mp),
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM edges
                     UNION ALL SELECT b, a FROM edges),
reach(s, d) AS (SELECT s, d FROM sym
                UNION
                SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s),
lab AS (SELECT n.doc_id,
               CASE WHEN MIN(r.d) IS NULL OR n.doc_id <= MIN(r.d)
                    THEN n.doc_id ELSE MIN(r.d) END AS cluster_id
        FROM documents n LEFT JOIN reach r ON r.s = n.doc_id
        GROUP BY n.doc_id)
SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(doc_id = cluster_id AS BIGINT) AS keep FROM lab"""


def sql_stratified_sample(rates: dict, default_keep: int,
                          buckets: int = 100, salt: str = "sample") -> str:
    """stages/sample.stratified_sample mirror: identical md5-bucket
    predicate with a per-stratum CASE threshold on ``lang``."""
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in rates.items())
    bexpr = (f"CAST(('0x' || substr(md5('{salt}:' || "
             f"CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) % {buckets}")
    return f"""SELECT doc_id, text, lang FROM documents
WHERE {bexpr} < CASE lang {cases} ELSE {default_keep} END"""


def sql_bm25_topk(queries: list[str], k: int = 10,
                  k1: float = 1.2, b: float = 0.75) -> str:
    """stages/retrieval.bm25_topk mirror. Float discipline: every scalar
    constant is embedded via CAST('<repr>' AS DOUBLE) (strtod is
    correctly rounded, so the SQL double bit-matches the engine's Python
    float), the association order of the tf/length normalization is
    copied verbatim from the engine, ln() bit-matches libm (verified on
    this platform), and per-term contributions are floored to integer
    nano-units BEFORE the order-independent integer SUM."""
    from blurrily_ray.stages.retrieval import MICRO, query_terms

    def d(v: float) -> str:
        return f"CAST('{v!r}' AS DOUBLE)"

    per_q = query_terms(queries)
    rows = []
    for q, ts in zip(queries, per_q):
        qe = q.replace("'", "''")
        for t in ts:
            rows.append(f"('{qe}', '{t.replace(chr(39), chr(39)*2)}')")
    qt_rows = ", ".join(rows)
    toks = TOKS.format(col="text")
    k1p1, omb = k1 + 1.0, 1.0 - b
    avgdl = "(CAST(c.sum_dl AS DOUBLE) / CAST(c.n_docs AS DOUBLE))"
    idf = (f"ln((CAST(c.n_docs - d.df AS DOUBLE) + {d(0.5)}) / "
           f"(CAST(d.df AS DOUBLE) + {d(0.5)}) + {d(1.0)})")
    denom = (f"(CAST(tf.tf AS DOUBLE) + {d(k1)} * ({d(omb)} + {d(b)} * "
             f"(CAST(l.dl AS DOUBLE) / {avgdl})))")
    contrib = (f"{idf} * ((CAST(tf.tf AS DOUBLE) * {d(k1p1)}) / {denom})")
    return f"""WITH toks AS (
  SELECT doc_id, lower(t) AS t
  FROM (SELECT doc_id, unnest({toks}) AS t FROM documents)),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       FROM toks GROUP BY doc_id),
corpus AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
                  CAST((SELECT COALESCE(SUM(dl), 0) FROM dl) AS BIGINT) AS sum_dl),
qt(query, t) AS (VALUES {qt_rows}),
dft AS (SELECT q.t, CAST(COUNT(DISTINCT x.doc_id) AS BIGINT) AS df
        FROM (SELECT DISTINCT t FROM qt) q
        LEFT JOIN toks x ON x.t = q.t GROUP BY q.t),
tf AS (SELECT qt.query, qt.t, x.doc_id, CAST(COUNT(*) AS BIGINT) AS tf
       FROM qt JOIN toks x ON x.t = qt.t GROUP BY qt.query, qt.t, x.doc_id),
contrib AS (SELECT tf.query, tf.doc_id,
  CAST(FLOOR({contrib} * {d(MICRO)}) AS BIGINT) AS m
  FROM tf JOIN dl l ON l.doc_id = tf.doc_id
          JOIN dft d ON d.t = tf.t CROSS JOIN corpus c),
scores AS (SELECT query, doc_id, CAST(SUM(m) AS BIGINT) AS score_micro
           FROM contrib GROUP BY query, doc_id),
ranked AS (SELECT query, doc_id, score_micro,
           ROW_NUMBER() OVER (PARTITION BY query
                              ORDER BY score_micro DESC, doc_id) AS rnk
           FROM scores)
SELECT query, CAST(rnk AS BIGINT) AS rank, doc_id, score_micro
FROM ranked WHERE rnk <= {k}"""


def sql_sq_knn(n_queries: int = 10, k: int = 10) -> str:
    """Scalar-quantized int8 MIPS top-k (mirrors simsearch.sq_knn):
    codes = FLOOR((x::DOUBLE * 127.0) / max|x|) — the identical IEEE
    double expression the engine's numpy path evaluates, so codes agree
    bit-for-bit — and scores are order-independent INTEGER dot products:
    no rounding smoothing needed, the match is exact."""
    return f"""WITH em AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             unnest(generate_series(0, len(embedding) - 1)) AS d
      FROM embeddings),
-- all-zero corpus: scale falls back to 1.0, matching the engine's
-- maxabs-or-1.0 guard (codes are then all 0 on both sides)
mx AS (SELECT CASE WHEN MAX(ABS(x)) = 0 THEN 1.0
              ELSE MAX(ABS(x)) END AS ma FROM em),
codes AS (SELECT vec_id, d,
          CAST(FLOOR((x * 127.0) / (SELECT ma FROM mx)) AS BIGINT) AS c
          FROM em),
q AS (SELECT vec_id AS query_id, d, c FROM codes WHERE vec_id < {n_queries}),
scores AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                  CAST(SUM(q.c * e.c) AS BIGINT) AS score
           FROM q JOIN codes e ON q.d = e.d AND e.vec_id <> q.query_id
           GROUP BY q.query_id, e.vec_id),
ranked AS (SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, neighbor_id) AS rnk
           FROM scores)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, score
FROM ranked WHERE rnk <= {k}"""


def sql_dup_ngram_stats(window: int = 10) -> str:
    """Duplicated sliding-window metrics (mirrors dedup.dup_ngram_stats):
    overlapping ``window``-token spans over string_split(text, ' ') —
    the dedup_paragraphs tokenizer — a span is duplicated when its text
    occurs ≥2 times corpus-wide; n_dup_tokens is the union of duplicated
    span ranges via a lag-LEAST scan. The engine groups md5 hashes where
    SQL groups the raw window strings (same equivalence, precedent:
    sql_dedup_paragraphs)."""
    w = int(window)
    return f"""WITH t AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws
           FROM documents),
wins AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(list_slice(ws, CAST(i AS INT), CAST(i AS INT) + {w - 1}), ' ') AS win
         FROM (SELECT doc_id, ws, unnest(generate_series(1, length(ws) - {w - 1})) AS i
               FROM t WHERE length(ws) >= {w})),
dup AS (SELECT doc_id, pos FROM wins
        WHERE win IN (SELECT win FROM wins GROUP BY win HAVING COUNT(*) >= 2)),
cov AS (SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_dup_windows,
        CAST(SUM(CASE WHEN prev IS NULL THEN {w}
                      ELSE LEAST(pos - prev, {w}) END) AS BIGINT) AS n_dup_tokens
        FROM (SELECT doc_id, pos,
                     lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
              FROM dup)
        GROUP BY doc_id)
SELECT t.doc_id,
       CAST(length(ws) AS BIGINT) AS n_tokens,
       CAST(GREATEST(length(ws) - {w - 1}, 0) AS BIGINT) AS n_windows,
       COALESCE(c.n_dup_windows, 0) AS n_dup_windows,
       COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens
FROM t LEFT JOIN cov c USING (doc_id)"""


def sql_cms_registers(depth: int = 4, width: int = 256) -> str:
    """Count-min register-table oracle (stages/sketch.cms_token_registers):
    bucket = first-8-md5-bytes-of('cms-{j}-' || token) % width (the
    stable_u64 expression sql_hll_registers pins), counts = token
    OCCURRENCES, merged by SUM — all integer."""
    toks = TOKS.format(col="text")
    return f"""WITH lt AS (SELECT source, lower(t) AS t
           FROM (SELECT source, unnest({toks}) AS t FROM documents)),
occ AS (SELECT source, t, COUNT(*) AS c FROM lt GROUP BY source, t),
j AS (SELECT unnest(generate_series(0, {depth - 1})) AS row_j)
SELECT source, CAST(row_j AS BIGINT) AS row_j,
       CAST(CAST(('0x' || substr(md5('cms-' || row_j || '-' || t), 1, 16))
                 AS UBIGINT) % {width} AS BIGINT) AS bucket,
       CAST(SUM(c) AS BIGINT) AS count
FROM occ, j
GROUP BY source, row_j, bucket"""


def sql_value_quantiles_events() -> str:
    """Per-event-type exact discrete quantiles of the float value column
    in micro-units (stages/textstats.float_group_quantiles): FLOOR(value
    * 1000000.0) is the identical IEEE double expression the engine's
    numpy path evaluates, and quantile_disc picks elements (no float
    summation), so the match is bit-exact."""
    return """WITH m AS (SELECT event_type,
           CAST(FLOOR(CAST(value AS DOUBLE) * 1000000.0) AS BIGINT) AS v
      FROM events)
SELECT event_type,
       CAST(quantile_disc(v, 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(v, 0.50) AS BIGINT) AS q50,
       CAST(quantile_disc(v, 0.75) AS BIGINT) AS q75,
       CAST(quantile_disc(v, 0.95) AS BIGINT) AS q95,
       -- COUNT(v), not COUNT(*): NULL values are skipped on both sides
       CAST(COUNT(v) AS BIGINT) AS n
FROM m GROUP BY event_type"""


def sql_collocations(k: int = 50) -> str:
    """Top-k bigram collocations with PMI count columns
    (textstats.collocations_top_k): integer pair/unigram counts, order
    (n_pair DESC, w1, w2). The engine's packed-pair partition order
    equals this tuple order because the pack separator (0x1f) sorts
    before every printable token character."""
    toks = TOKS.format(col="lower(COALESCE(text, ''))")
    return f"""WITH lt AS (SELECT {toks} AS ws FROM documents),
big AS (SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
        FROM (SELECT ws, unnest(generate_series(1, length(ws) - 1)) AS i
              FROM lt WHERE length(ws) >= 2)),
cnt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
        FROM big GROUP BY w1, w2),
top AS (SELECT w1, w2, n_pair,
        row_number() OVER (ORDER BY n_pair DESC, w1, w2) AS rnk FROM cnt),
uni AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(ws) AS t FROM lt) GROUP BY t)
SELECT CAST(rnk AS BIGINT) AS rank, w1, w2, n_pair,
       u1.c AS n_w1, u2.c AS n_w2
FROM top JOIN uni u1 ON u1.t = top.w1 JOIN uni u2 ON u2.t = top.w2
WHERE rnk <= {k}"""


def sql_funnel_events(s1: str = "view", s2: str = "click",
                      s3: str = "purchase") -> str:
    """Per-user 3-stage funnel oracle (windows.funnel): t1 = MIN stage-1
    ts; t_i = MIN stage-i ts strictly after t_{i-1}; depth = stages
    reached; users with no stage-1 event emit nothing. All-integer
    epoch-µs."""
    return f"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
f1 AS (SELECT user_id, MIN(us) AS t1 FROM e
       WHERE event_type = '{s1}' GROUP BY user_id),
f2 AS (SELECT f1.user_id, f1.t1, MIN(e.us) AS t2
       FROM f1 LEFT JOIN e ON e.user_id = f1.user_id
            AND e.event_type = '{s2}' AND e.us > f1.t1
       GROUP BY f1.user_id, f1.t1),
f3 AS (SELECT f2.user_id, f2.t1, f2.t2, MIN(e.us) AS t3
       FROM f2 LEFT JOIN e ON e.user_id = f2.user_id
            AND e.event_type = '{s3}' AND f2.t2 IS NOT NULL
            AND e.us > f2.t2
       GROUP BY f2.user_id, f2.t1, f2.t2)
SELECT user_id,
       CAST(CASE WHEN t3 IS NOT NULL THEN 3
                 WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS depth,
       CAST(t1 AS BIGINT) AS t1_us,
       CAST(COALESCE(t3, t2, t1) AS BIGINT) AS t_last_us
FROM f3"""


def _pq_ctes(cb) -> str:
    """Shared PQ CTE fragment (codebook literal + per-(vec, subspace,
    codeword) micro distances + encoding) used by sql_pq_knn and
    sql_ivfpq_knn — ONE definition of the micro-distance contract."""
    m, n_codes, dsub = cb.shape
    rows = ",\n  ".join(
        f"({j}, {c}, {d}, {float(cb[j, c, d])!r})"
        for j in range(m) for c in range(n_codes) for d in range(dsub))
    return f"""cb(j, c, sd, v) AS (VALUES {rows}),
em AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             unnest(generate_series(0, len(embedding) - 1)) AS d
      FROM embeddings),
sub AS (SELECT vec_id, d // {dsub} AS j, d % {dsub} AS sd, x FROM em),
d2 AS (SELECT s.vec_id, s.j, cb.c,
       CAST(FLOOR(SUM((s.x - cb.v) * (s.x - cb.v)) * 1000000.0)
            AS BIGINT) AS dm
       FROM sub s JOIN cb ON cb.j = s.j AND cb.sd = s.sd
       GROUP BY s.vec_id, s.j, cb.c),
enc AS (SELECT vec_id, j, c FROM (
        SELECT vec_id, j, c,
               row_number() OVER (PARTITION BY vec_id, j
                                  ORDER BY dm, c) AS rn FROM d2)
        WHERE rn = 1)"""


def sql_pq_knn(cb, n_queries: int = 10, k: int = 10) -> str:
    """Product-quantization ADC kNN against EXPORTED codebooks embedded
    as a SQL literal (simsearch.pq_knn; the sql_ivf_knn_kmeans pattern —
    Lloyd training is pytest-pinned, assignment + ADC ranking is
    oracle-checked). Sub-distances floor to micro INTEGERS before any
    sum or argmin (float noise ~1e-15 vs 1e-6 granularity), so encoding,
    distance totals and ranking are all exact-integer on both sides."""
    return f"""WITH {_pq_ctes(cb)},
dist AS (SELECT qd.vec_id AS query_id, e.vec_id AS neighbor_id,
                CAST(SUM(qd.dm) AS BIGINT) AS dist_micro
         FROM enc e JOIN d2 qd ON qd.j = e.j AND qd.c = e.c
         WHERE qd.vec_id < {n_queries} AND e.vec_id <> qd.vec_id
         GROUP BY qd.vec_id, e.vec_id),
ranked AS (SELECT query_id, neighbor_id, dist_micro,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist_micro, neighbor_id) AS rnk
           FROM dist)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, dist_micro
FROM ranked WHERE rnk <= {k}"""


def sql_cluster_size_hist(transcripts_path: str,
                          cfg: ERConfig = DEFAULT) -> str:
    """Cluster-size distribution of the full ER output (the standard
    post-resolution audit: how many singletons / pairs / giant
    components): wraps sql_er_clusters' recursive closure with two
    GROUP BYs — (cluster_size, n_clusters) ordered by size."""
    inner = sql_er_clusters(transcripts_path, cfg)
    return f"""WITH labels AS ({inner}),
sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM labels GROUP BY cluster_id)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY cluster_size"""


def sql_ivfpq_knn(cb, n_queries: int = 10, k: int = 10,
                  n_centroids: int = 16, n_probe: int = 4) -> str:
    """IVF-PQ (mirrors simsearch.ivfpq_knn): sql_ivf_knn's id-pick
    centroid assignment + probing CTEs feed sql_pq_knn's integer ADC
    ranking — both halves keep their exact contracts, so the composed
    query hashes identically."""
    return f"""WITH cents AS (SELECT vec_id AS cid, embedding AS ce
           FROM embeddings WHERE vec_id < {n_centroids}),
assign AS (SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round(list_cosine_similarity(e.embedding, c.ce), 6)
                        DESC, c.cid ASC) AS rn
    FROM embeddings e, cents c) WHERE rn = 1),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id < {n_queries}),
probes AS (SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
               ORDER BY round(list_cosine_similarity(q.qe, c.ce), 6)
                        DESC, c.cid ASC) AS rn
    FROM q, cents c) WHERE rn <= {n_probe}),
{_pq_ctes(cb)},
cand AS (SELECT p.qid, a.vec_id AS nid
         FROM probes p JOIN assign a ON a.cid = p.cid
         WHERE a.vec_id <> p.qid),
dist AS (SELECT cd.qid AS query_id, cd.nid AS neighbor_id,
                CAST(SUM(qd.dm) AS BIGINT) AS dist_micro
         FROM cand cd JOIN enc e ON e.vec_id = cd.nid
              JOIN d2 qd ON qd.vec_id = cd.qid
                   AND qd.j = e.j AND qd.c = e.c
         GROUP BY cd.qid, cd.nid),
ranked AS (SELECT query_id, neighbor_id, dist_micro,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist_micro, neighbor_id) AS rnk
           FROM dist)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, dist_micro
FROM ranked WHERE rnk <= {k}"""
