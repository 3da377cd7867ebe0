"""Input validators — the reference's protocol rules as pipeline predicates.

Sources: defaults.rb:6-9 (ranges), client.rb:104-110 (needle rules),
command_processor.rb:14-15, 27-45 (db name, error taxonomy). The TCP server
itself is out of scope (SURVEY.md §2.2); its validation contract survives
as these checks, applied at API entry points.
"""

from __future__ import annotations

import re

REF_RANGE = (1, 1 << 31)  # defaults.rb:8
WEIGHT_RANGE = (0, 1 << 31)  # defaults.rb:9
LIMIT_RANGE = (1, 1024)  # defaults.rb:7
LIMIT_DEFAULT = 10  # defaults.rb:6
_DB_NAME_RE = re.compile(r"^[a-z_]+$")  # command_processor.rb:15


class ValidationError(ValueError):
    pass


def check_needle(needle: str) -> str:
    if not isinstance(needle, str) or not needle:
        raise ValidationError("needle must be a non-empty string")
    if "\t" in needle or "\n" in needle:
        raise ValidationError("needle may not contain tabs or newlines")
    return needle


def check_numeric_ref(ref: int) -> int:
    """The reference restricts refs to uint32-range ints; our engine allows
    arbitrary string refs (conv_id), so this check applies only when the
    caller opts into numeric-ref compatibility mode."""
    if not (REF_RANGE[0] <= int(ref) <= REF_RANGE[1]):
        raise ValidationError(f"ref must be in {REF_RANGE}")
    return int(ref)


def check_weight(weight: int) -> int:
    if not (WEIGHT_RANGE[0] <= int(weight) <= WEIGHT_RANGE[1]):
        raise ValidationError(f"weight must be in {WEIGHT_RANGE}")
    return int(weight)


def check_limit(limit: int) -> int:
    if not (LIMIT_RANGE[0] <= int(limit) <= LIMIT_RANGE[1]):
        raise ValidationError(f"limit must be in {LIMIT_RANGE}")
    return int(limit)


def check_db_name(name: str) -> str:
    if not _DB_NAME_RE.match(name or ""):
        raise ValidationError("database name must match /^[a-z_]+$/")
    return name
