"""Pipeline configuration.

Defaults are tuned for the sandbox (single node, 8–32 CPUs) but every knob
that matters at 100 TB is explicit: blocking cap + salting bounds (skew),
broadcast limits (small-side joins), join partitions (shuffle width), and
the driver/distributed switch for connected components.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class ERConfig:
    # --- blocking (stages/pairs.py) ---
    # 'trigram': each doc's rarest single trigrams are the blocking keys
    #   (reference-faithful; key space 28³ = 21,952 saturates at corpus
    #   scale — every key goes hot and candidate volume turns quadratic).
    # 'trigram_pair': blocking key = an ordered PAIR of the doc's
    #   pair_rarest rarest trigrams (C(R,2) keys/doc; key space 28⁶/2 ≈
    #   2.4·10⁸). Two docs collide only when they share BOTH trigrams of a
    #   key, so collisions ≈ true matches — candidate volume stays linear
    #   in the corpus. This is the 10^12-turn path.
    # 'trigram_triple': key = an ordered TRIPLE of the triple_rarest
    #   rarest trigrams (C(R,3) keys/doc; key space 28⁹/6 ≈ 1.8·10¹²).
    #   Headroom for when even the pair space saturates (~10^10 docs):
    #   random collisions need THREE shared trigrams.
    blocking_mode: str = "trigram_pair"
    # R rarest trigrams per doc in triple mode → C(R,3) composite keys.
    # R=14 → 364 keys/doc. Tuned like pair_rarest: at SMALL corpus scale
    # typo trigrams crowd the rare list, so triples (needing 3 shared)
    # lose recall faster than pairs — R=10 drops recall to 0.90 at
    # sf0.001 while R=14 restores F1=1.0; at sf0.1 R=10 already scores
    # 0.9997, so larger R only costs emissions, never recall.
    triple_rarest: int = 14
    # R rarest trigrams per doc → C(R,2) composite keys. Tuned with
    # min_cokeys: R=12 keeps ≥2 shared composite keys for true matches even
    # when typo-noise crowds the rare lists (small corpora), while random
    # two-trigram collisions (which scale ~R⁴) are filtered by min_cokeys.
    # Measured: R=15 → 3× candidates for zero extra recall; R=8 → recall
    # loss at small scale.
    pair_rarest: int = 12
    # Max posting-list length of a trigram before it is salted into buckets.
    # A block of m refs yields m(m-1)/2 candidate pairs; cap bounds that.
    block_cap: int = 64
    # Trigrams hotter than block_cap * salt_factor_max are dropped from
    # blocking entirely (logged in metrics). Such trigrams appear in a large
    # fraction of the corpus and carry no discriminative signal; any true
    # match also shares rarer trigrams, so recall is preserved (this is the
    # stoplist analogue of the reference's "pathological datasets" note,
    # README.md:15-17 — except we log instead of slowing down).
    salt_factor_max: int = 4
    # Absolute stoplist cap (overrides block_cap * salt_factor_max when
    # set): keys with more emissions than this are dropped from blocking.
    # Measured: 256 → 16 leaves F1 ≥ 0.9999 at sf0.001/0.1/1.0 (true
    # matches collide in tiny blocks; big blocks are random rare-trigram
    # coincidences) while cutting distinct candidates ~12×. Scale-aware:
    # 8 is still perfect at sf0.1 but drops recall to 0.996 at sf1.0
    # (key-space saturation grows block sizes), 4 breaks everywhere.
    stoplist_cap: int | None = 16
    # Deterministic composite-key sampling: keep a key iff
    # ((key * 2654435761) % 2^32) % key_sample_mod == 0 (exact integer
    # math, reproduced verbatim in the SQL oracle). OFF by default:
    # measured co-key counts of true matches are only ~3-6 (typo noise
    # crowds the rare lists), so even mod=2 drops F1 to 0.977 at sf0.001
    # — keep 1 unless the corpus is known clean.
    key_sample_mod: int = 1
    # Candidates must co-occur under at least this many blocking keys to be
    # exact-scored. In trigram_pair mode a true match shares ~C(8,2) ≈ 30
    # composite keys while random collisions share 1 — requiring 2 removes
    # ~90% of scoring work with negligible recall cost. Set 1 to disable
    # (the reference-faithful single-trigram mode uses 1: short strings may
    # legitimately share a single blocking trigram).
    min_cokeys: int = 2
    # --- exact pair scoring ---
    # Score = |trigrams(a) ∩ trigrams(b)| over the FULL trigram sets
    # (identical to the reference find score, storage.c:527-563), computed by
    # re-joining candidate pairs with per-doc trigram sets — never from the
    # (capped, salted) blocking output.
    min_matches: int = 5  # absolute floor on shared trigrams
    min_matches_rel: float = 0.55  # floor as fraction of min(|T(a)|,|T(b)|)
    # If the per-doc trigram sets needed for scoring fit under this many
    # bytes, broadcast them via ray.put (workers map the plasma object
    # zero-copy, so the per-worker cost is one shared mapping); above it
    # run_er switches to the partitioned scorer actor pool
    # (stages/scorer.py) — no corpus-sized broadcast, no driver
    # materialization. 2 GiB ≈ 7·10⁵ docs of bitsets; beyond that the
    # driver-side LUT build is the real bottleneck, hence the shards.
    broadcast_limit_bytes: int = 2 << 30
    # Number of hash(ref) bitset shards backing the scorer actor pool.
    # Size so one shard (~2.8 KB/doc) fits comfortably in an actor heap:
    # at 10^9 docs and 4 GB/actor that is ~1024 shards.
    score_shards: int = 32
    # --- shuffles ---
    join_partitions: int = 32
    # Cap on collidable blocking keys the driver will hold (key_histogram).
    # A histogram partition exceeding its share ships only its >block_cap
    # keys and is marked hot-only; its unknown keys stay unsalted instead
    # of being dropped — exact pairs, bounded driver memory.
    driver_key_limit: int = 20_000_000
    # --- clustering ---
    # Below this many edges, connected components run as driver-side
    # union-find (exact, one pass); above it, distributed hash-min label
    # propagation in O(log n) groupby/join rounds (ICDE 2013, see PAPERS.md).
    uf_driver_limit: int = 2_000_000
    max_cc_rounds: int = 50
    # --- misc ---
    seed: int = 42

    def digest(self) -> str:
        return hashlib.md5(json.dumps(asdict(self), sort_keys=True).encode()).hexdigest()[:12]


DEFAULT = ERConfig()
