"""createSourceChunks — the C9 source-chunk builder with ``<image id,key>``
span support (packages/graph/src/lib/source-chunk.ts:1-120, ported 1:1).

Units are split into ≤150-token text sub-chunks; embedded
``<image id="…" key="…">description</image>`` tags become indivisible image
chunks with XML-decoded text and attributes; structured file types (json,
sheet, …) keep the whole unit as one chunk; top-level image files/MIME
types yield a single image chunk whose text is the (OCR/caption) content.
"""

from __future__ import annotations

import re

from .chunking import chunk_text

DEFAULT_SOURCE_CHUNK_TOKENS = 150  # source-chunk.ts:4

IMAGE_TAG_PATTERN = re.compile(r"<image\b([^>]*)>([\s\S]*?)</image>", re.IGNORECASE)
SPLITTABLE_SOURCE_TEXT_FILE_TYPES = {
    "text", "pdf", "doc", "docx", "odt", "ppt", "pptx", "odp",
}
TOP_LEVEL_IMAGE_FILE_TYPES = {
    "image", "png", "jpg", "jpeg", "gif", "webp", "svg", "tif", "tiff", "bmp",
}


def decode_xml(value: str) -> str:
    return (
        value.replace("&quot;", '"')
        .replace("&apos;", "'")
        .replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&amp;", "&")
    )


def get_xml_attribute(attributes: str, name: str) -> str | None:
    match = re.search(re.escape(name) + r'\s*=\s*"([^"]*)"', attributes)
    value = match.group(1) if match else None
    return decode_xml(value) if value else None


def _should_split(file_type: str | None) -> bool:
    normalized = (file_type or "").strip().lower()
    return not normalized or normalized in SPLITTABLE_SOURCE_TEXT_FILE_TYPES


def _is_top_level_image(file_type: str | None) -> bool:
    normalized = (file_type or "").strip().lower()
    return bool(normalized) and (
        normalized.startswith("image/") or normalized in TOP_LEVEL_IMAGE_FILE_TYPES
    )


def create_source_chunks(
    content: str,
    file_type: str | None = None,
    max_tokens: int = DEFAULT_SOURCE_CHUNK_TOKENS,
    start_page: int | None = None,
    end_page: int | None = None,
) -> list[dict]:
    """source-chunk.ts:10-84 — ids are 1-based; text chunks are trimmed and
    blank ones dropped; image tags are never split."""
    trimmed = content.strip()

    if _is_top_level_image(file_type):
        return [
            {
                "id": 1,
                "type": "image",
                "text": trimmed,
                "image_id": None,
                "image_key": None,
                "start_page": start_page,
                "end_page": end_page,
            }
        ]

    chunks: list[dict] = []
    split_text = _should_split(file_type)

    def append_text_chunks(text: str) -> None:
        pieces = chunk_text(text, max_tokens) if split_text else [text]
        for piece in pieces:
            piece = piece.strip()
            if not piece:
                continue
            chunks.append(
                {
                    "id": len(chunks) + 1,
                    "type": "text",
                    "text": piece,
                    "image_id": None,
                    "image_key": None,
                    "start_page": start_page,
                    "end_page": end_page,
                }
            )

    cursor = 0
    for match in IMAGE_TAG_PATTERN.finditer(trimmed):
        append_text_chunks(trimmed[cursor : match.start()])
        attributes = match.group(1) or ""
        description = decode_xml(match.group(2) or "").strip()
        chunks.append(
            {
                "id": len(chunks) + 1,
                "type": "image",
                "text": description,
                "image_id": get_xml_attribute(attributes, "id"),
                "image_key": get_xml_attribute(attributes, "key"),
                "start_page": start_page,
                "end_page": end_page,
            }
        )
        cursor = match.end()
    append_text_chunks(trimmed[cursor:])
    return chunks
