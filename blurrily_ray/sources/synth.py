"""Deterministic synthetic transcript tables (FIXTURES.md §1).

The graft's primary input is a Parquet table of multi-turn conversation
transcripts with columns (conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp[us]) — BASELINE.json input_hint.
The driver's testdata does not ship one, so we synthesize it
deterministically (seed=42) at each scale factor:

- ``n_entities(sf)`` base conversations of 2–8 turns over a large random
  vocabulary (so unrelated entities have low trigram overlap);
- each entity emits 1–5 variants whose text is the base text mutated by the
  typo operators the reference tolerates (insertion / deletion /
  substitution / case flips / diacritics / punctuation swaps —
  map_spec.rb:176-193, map.rb:40-47);
- conv_id = ``e{entity:05d}v{variant}``; ground truth clusters are the
  entity groups.

Files are cached under /tmp/graft_testdata/sf{sf}/ and regenerated only if
missing; generation is pure-numpy-seeded and reproducible across processes.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
ROOT = "/tmp/graft_testdata"
_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_ACCENTS = {"a": "à", "e": "é", "i": "î", "o": "õ", "u": "ü", "c": "ç"}
_PUNCT = list("-_,.;:!")
_ROLES = ["user", "assistant"]
_TOOLS = ["", "", "", "search", "code", "browse"]


def n_entities_for_sf(sf: float) -> int:
    return max(60, int(120_000 * sf))


def sf_from_dir(sf_dir: str) -> float:
    """'/root/testdata/sf0.01' → 0.01 (also accepts bare floats/strings)."""
    base = os.path.basename(os.path.normpath(str(sf_dir)))
    if base.startswith("sf"):
        base = base[2:]
    return float(base)


def _make_vocab(rng: np.random.RandomState, size: int = 8000) -> list[str]:
    lens = rng.randint(3, 11, size=size)
    return ["".join(_LETTERS[i] for i in rng.randint(0, 26, size=n)) for n in lens]


def _mutate(text: str, rng: np.random.RandomState) -> str:
    """Apply 1..max(1,2% of len) reference-tolerated typo operators."""
    chars = list(text)
    n_mut = max(1, int(0.02 * len(chars)))
    for _ in range(rng.randint(1, n_mut + 1)):
        if not chars:
            break
        op = rng.randint(0, 6)
        pos = rng.randint(0, len(chars))
        c = chars[pos]
        if op == 0:  # insertion
            chars.insert(pos, _LETTERS[rng.randint(0, 26)])
        elif op == 1 and len(chars) > 3:  # deletion
            chars.pop(pos)
        elif op == 2:  # substitution
            chars[pos] = _LETTERS[rng.randint(0, 26)]
        elif op == 3:  # case flip (normalizer undoes it)
            chars[pos] = c.upper() if c.islower() else c.lower()
        elif op == 4:  # diacritic (NFKD fold undoes it)
            chars[pos] = _ACCENTS.get(c.lower(), c)
        else:  # punctuation swap on a space (normalizer re-spaces it)
            if c == " ":
                chars[pos] = _PUNCT[rng.randint(0, len(_PUNCT))]
    return "".join(chars)


def generate(sf: float) -> dict[str, pa.Table]:
    rng = np.random.RandomState(SEED)
    vocab = np.array(_make_vocab(rng), dtype=object)
    n_ent = n_entities_for_sf(sf)
    base_ts = datetime(2026, 1, 1)

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    truth_conv, truth_ent = [], []
    for ent in range(n_ent):
        n_words = rng.randint(25, 61)
        words = vocab[rng.randint(0, len(vocab), size=n_words)]
        n_turns = rng.randint(2, 9)
        # split the word list into n_turns contiguous chunks
        cuts = np.sort(rng.choice(np.arange(1, n_words), size=n_turns - 1,
                                  replace=False)) if n_turns > 1 else np.array([], dtype=int)
        chunks = np.split(words, cuts)
        base_turns = [" ".join(c) for c in chunks]
        n_variants = rng.randint(1, 6)
        for v in range(n_variants):
            conv = f"e{ent:05d}v{v}"
            truth_conv.append(conv)
            truth_ent.append(ent)
            for ti, turn in enumerate(base_turns):
                text = turn if v == 0 else _mutate(turn, rng)
                conv_ids.append(conv)
                turn_idxs.append(ti)
                roles.append(_ROLES[ti % 2])
                texts.append(text)
                tools.append(_TOOLS[rng.randint(0, len(_TOOLS))])
                tss.append(base_ts + timedelta(minutes=ent * 60 + v * 10 + ti))

    transcripts = pa.table({
        "conv_id": pa.array(conv_ids, type=pa.string()),
        "turn_idx": pa.array(turn_idxs, type=pa.int32()),
        "role": pa.array(roles, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
        "tool": pa.array(tools, type=pa.string()),
        "ts": pa.array(tss, type=pa.timestamp("us")),
    })
    truth = pa.table({
        "conv_id": pa.array(truth_conv, type=pa.string()),
        "entity_id": pa.array(truth_ent, type=pa.int64()),
    })
    return {"transcripts": transcripts, "ground_truth": truth}


def generate_tickets(sf: float) -> pa.Table:
    """Deterministic PII-bearing support-ticket table (ticket_id, text):
    vocab prose with 0-2 emails, 0-1 phone, 0-1 IPv4 injected as
    whitespace-separated tokens. Feeds ``stages.redact.redact_pii`` and
    its DuckDB oracle (both read the same cached parquet)."""
    rng = np.random.RandomState(SEED + 1)
    vocab = np.array(_make_vocab(rng, size=2000), dtype=object)
    n = max(200, int(50_000 * sf))
    texts = []
    for _ in range(n):
        words = list(vocab[rng.randint(0, len(vocab), size=rng.randint(10, 31))])
        for _e in range(rng.randint(0, 3)):
            w = vocab[rng.randint(0, len(vocab), size=3)]
            words.insert(rng.randint(0, len(words) + 1),
                         f"{w[0]}.{w[1]}@{w[2]}.com")
        if rng.randint(0, 2):
            words.insert(rng.randint(0, len(words) + 1),
                         f"{rng.randint(200, 1000)}-{rng.randint(200, 1000)}"
                         f"-{rng.randint(1000, 10000)}")
        if rng.randint(0, 2):
            words.insert(rng.randint(0, len(words) + 1),
                         f"10.{rng.randint(0, 256)}.{rng.randint(0, 256)}"
                         f".{rng.randint(0, 256)}")
        texts.append(" ".join(words))
    return pa.table({
        "ticket_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    })


def ensure_tickets(sf, root: str = ROOT) -> str:
    """Generate-once cache; returns the tickets parquet path."""
    sf = sf if isinstance(sf, float) else sf_from_dir(sf)
    d = os.path.join(root, f"sf{sf:g}")
    path = os.path.join(d, "tickets.parquet")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(generate_tickets(sf), tmp, row_group_size=32_768)
        os.replace(tmp, path)
    return path


def ensure_transcripts(sf, root: str = ROOT) -> dict[str, str]:
    """Generate-once cache; returns {'transcripts': path, 'ground_truth': path}."""
    sf = sf if isinstance(sf, float) else sf_from_dir(sf)
    d = os.path.join(root, f"sf{sf:g}")
    paths = {k: os.path.join(d, f"{k}.parquet") for k in ("transcripts", "ground_truth")}
    if not all(os.path.exists(p) for p in paths.values()):
        tables = generate(sf)
        os.makedirs(d, exist_ok=True)
        for k, p in paths.items():
            tmp = p + f".tmp.{os.getpid()}"
            # small row groups: Ray parallelizes a parquet read by row
            # group — a single-group file serializes the whole scan into
            # one task (measured: flat 6 s at ANY cpu count at sf1.0)
            pq.write_table(tables[k], tmp, row_group_size=32_768)
            os.replace(tmp, p)
    return paths
