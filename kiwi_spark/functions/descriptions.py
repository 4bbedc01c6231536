"""L14 — canonical-entity description summarization.

The reference folds an entity's source descriptions through an LLM in
chunks of 300 with a tail-merge buffer of 25 (apps/worker/lib/
description.ts:6-64: chunkDescriptionSources + buildDescription, each fold
step feeding the previous summary forward). The chunk grouping here is a
literal port; the LLM compression step is substituted with a deterministic
compressor (normalize-whitespace concat, word-boundary truncation to
DESCRIPTION_MAX_CHARS) so the fold is order-stable and reproducible.
"""

from __future__ import annotations

from .linking import normalize_ws

DESCRIPTION_SOURCE_CHUNK_SIZE = 300  # description.ts:6
DESCRIPTION_SOURCE_CHUNK_BUFFER = 25  # description.ts:7
DESCRIPTION_MAX_CHARS = 1200  # deterministic-compressor output cap


def chunk_description_sources(source_descriptions: list[str]) -> list[list[str]]:
    """description.ts:16-36, literal: slices of 300; a tail of ≤25 merges
    into the previous chunk."""
    if not source_descriptions:
        return []
    chunks = [
        source_descriptions[i : i + DESCRIPTION_SOURCE_CHUNK_SIZE]
        for i in range(0, len(source_descriptions), DESCRIPTION_SOURCE_CHUNK_SIZE)
    ]
    if len(chunks) > 1 and len(chunks[-1]) <= DESCRIPTION_SOURCE_CHUNK_BUFFER:
        chunks[-2] = chunks[-2] + chunks[-1]
        chunks.pop()
    return chunks


def fold_description(sources, current: str | None = None) -> str:
    """buildDescription's fold: per chunk, the previous summary plus the
    chunk's descriptions produce the next summary (deterministic compressor
    instead of the LLM; same \\s+-collapse postprocessing as
    description.ts:57-60)."""
    for chunk in chunk_description_sources(list(sources)):
        parts = ([current] if current else []) + [s for s in chunk if s]
        text = normalize_ws(" ".join(parts))
        if len(text) > DESCRIPTION_MAX_CHARS:
            cut = text.rfind(" ", 0, DESCRIPTION_MAX_CHARS)
            text = text[: cut if cut > 0 else DESCRIPTION_MAX_CHARS].rstrip()
        current = text
    return current or ""
