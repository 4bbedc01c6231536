"""Deterministic ids.

The reference uses ulids (time-ordered randomness, packages/graph/src/unit.ts,
dedupe.ts:361). A distributed, resumable pipeline needs ids that are pure
functions of content so that re-running a stage (or running it at a different
parallelism) yields identical output. We derive 16-hex-char ids from
blake2b-64 over a stable key. Pure Python so the test-side reference
simulator produces byte-identical ids.
"""

from __future__ import annotations

import hashlib

_SEP = "\x1f"


def stable_id(*parts: object) -> str:
    key = _SEP.join(str(p) for p in parts).encode("utf-8")
    return hashlib.blake2b(key, digest_size=8).hexdigest()
