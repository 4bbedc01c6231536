"""Page fences — `:::PAGE-n:::` markers for paged documents (PDF path).

Port of packages/graph/src/lib/page-fence.ts:17-140. The web corpus emits no
fences (HTML loader), but chunkers for paged formats tag chunk page spans
through these markers; kept at full parity for the PDF/paged ingestion path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

PAGE_FENCE = re.compile(r":::PAGE-(\d+):::")
STANDALONE_FENCE_LINE = re.compile(r"^\s*:::PAGE-\d+:::\s*$")
_TRAILING_WS_NL = re.compile(r"[ \t]+\n")
_3PLUS_NL = re.compile(r"\n{3,}")


@dataclass
class PageFence:
    page: int
    index: int
    length: int


def render_page_fence(page: int) -> str:
    if not isinstance(page, int) or page < 1:
        raise ValueError(f"Invalid page number {page}")
    return f":::PAGE-{page}:::"


def extract_page_fences(text: str) -> list[PageFence]:
    fences = []
    for m in PAGE_FENCE.finditer(text):
        page = int(m.group(1))
        if page < 1:
            continue
        fences.append(PageFence(page, m.start(), len(m.group(0))))
    return fences


def strip_page_fences(text: str) -> str:
    no_standalone = "\n".join(
        line
        for line in text.replace("\r", "").split("\n")
        if not STANDALONE_FENCE_LINE.match(line)
    )
    out = PAGE_FENCE.sub("", no_standalone)
    out = _TRAILING_WS_NL.sub("\n", out)
    out = _3PLUS_NL.sub("\n\n", out)
    return out.strip()


def to_page_aware_chunks(raw_chunks: list[str]) -> list[dict]:
    """[(raw chunk)] → [{content, start_page, end_page}]; fences consumed in
    order, current page carried across chunks (page-fence.ts:61-140)."""
    chunks: list[dict] = []
    current_page: int | None = None
    for raw in raw_chunks:
        fences = extract_page_fences(raw)
        content = strip_page_fences(raw)
        if not fences:
            if content:
                chunks.append(
                    {"content": content, "start_page": current_page, "end_page": current_page}
                )
            continue
        span = _content_page_span(raw, fences, current_page)
        current_page = fences[-1].page
        if not content:
            continue
        chunks.append(
            {"content": content, "start_page": span[0], "end_page": span[1]}
        )
    return chunks


def _content_page_span(
    raw: str, fences: list[PageFence], initial_page: int | None
) -> tuple[int | None, int | None]:
    pages: list[int] = []
    active = initial_page
    cursor = 0

    def add(segment: str, page: int | None) -> None:
        if page is None or strip_page_fences(segment) == "":
            return
        pages.append(page)

    for fence in fences:
        add(raw[cursor : fence.index], active)
        active = fence.page
        cursor = fence.index + fence.length
    add(raw[cursor:], active)
    if not pages:
        return None, None
    return pages[0], pages[-1]
