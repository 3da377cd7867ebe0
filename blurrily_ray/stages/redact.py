"""PII redaction — scrub emails / phone numbers / IPv4 addresses from a
text column and count what was removed.

A standard LLM training-data compliance pass (not in the reference —
graft-added alongside the quality/langid filters). Embarrassingly
parallel: one vectorized ``map_batches`` stage, no shuffle, patterns
compiled once at module import.

Pattern dialect is the intersection of Python ``re`` (with ``re.ASCII``)
and RE2 (DuckDB ``regexp_*``): character classes, bounded repeats, ``\\b``
ASCII word boundaries — no backrefs, no lookaround — so the DuckDB oracle
can run the byte-identical expressions. Matching is non-overlapping
left-to-right; the patterns are alternation-free with disjoint-class
boundaries, so leftmost-first (re) and leftmost-longest agree.

Contract: counts are computed on the ORIGINAL text per category;
replacements apply sequentially email → phone → ip (an IP inside an email
is counted in both but redacted once, as part of the email token).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_EMAIL = re.compile(EMAIL_RE, re.ASCII)
_PHONE = re.compile(PHONE_RE, re.ASCII)
_IP = re.compile(IP_RE, re.ASCII)


def redact_pii(ds, *, id_col: str = "ticket_id", text_col: str = "text"):
    """→ (id, red_text, n_email, n_phone, n_ip) — one row per input row."""

    def fn(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pandas(), copy=False).fillna("")
        n_email = s.str.count(EMAIL_RE, flags=re.ASCII).astype("int64")
        n_phone = s.str.count(PHONE_RE, flags=re.ASCII).astype("int64")
        n_ip = s.str.count(IP_RE, flags=re.ASCII).astype("int64")
        red = (s.str.replace(_EMAIL, "<EMAIL>", regex=True)
                .str.replace(_PHONE, "<PHONE>", regex=True)
                .str.replace(_IP, "<IP>", regex=True))
        return pa.table({
            id_col: batch[id_col],
            "red_text": pa.array(red, type=pa.string()),
            "n_email": pa.array(n_email.to_numpy()),
            "n_phone": pa.array(n_phone.to_numpy()),
            "n_ip": pa.array(n_ip.to_numpy()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
