"""Time-sortable ULIDs with injectable clock and randomness.

Mirrors the reference's semantics (geostore/datasets_model.py:18-28,52):
ids sort by creation time; the dataset-version id is a human-readable
variant ``<ms-truncated ISO time with '-' separators>Z_<randomness>``; and
``now`` is injectable for deterministic tests
(geostore/dataset_versions/create.py:97-98).
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def _encode(value: int, length: int) -> str:
    out = []
    for _ in range(length):
        out.append(CROCKFORD[value & 31])
        value >>= 5
    return "".join(reversed(out))


def ulid(now: datetime | None = None, rng: random.Random | None = None) -> str:
    """26-char ULID: 48-bit ms timestamp + 80-bit randomness."""
    now = now or datetime.now(timezone.utc)
    rng = rng or random.Random()
    ms = int(now.timestamp() * 1000)
    return _encode(ms, 10) + _encode(rng.getrandbits(80), 16)


def human_readable_ulid(now: datetime | None = None, rng: random.Random | None = None) -> str:
    """e.g. ``2021-11-08T01-13-37-203Z_CJD6XKVJKS29ZXPA`` — ms-truncated
    time, filesystem-safe separators, time-sortable as a plain string."""
    now = now or datetime.now(timezone.utc)
    rng = rng or random.Random()
    formatted = now.strftime("%Y-%m-%dT%H-%M-%S-") + f"{now.microsecond // 1000:03d}"
    return f"{formatted}Z_{_encode(rng.getrandbits(80), 16)}"
