"""Stage 1: pages → text. Arrow-batched mapInPandas, zero shuffle.

Wraps the byte-identity kernel (functions.html_text, port of
packages/graph/src/loader/html.ts) plus:
* requireReadableContentText — empty-text error rows split out
  (apps/worker/lib/readable-text.ts:3-10 → error_code column)
* estimateToken — token_count column (packages/ai/src/index.ts:264-270,
  deterministic substitute in functions.tokens)
* metadata excerpt — first+last 250 words (apps/worker/lib/metadata.ts:6,18-42)

Output schema:
    url, warc_ts, lang, text, token_count, n_chars, excerpt, error_code
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.html_text import html_to_markdown
from ..functions.loaders import payload_to_text
from ..functions.tokens import count_tokens_uncached

TEXT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, text string, "
    "token_count int, n_chars int, excerpt string, error_code string, "
    "file_type string"
)

EXCERPT_WORD_LIMIT = 250  # metadata.ts:6


def build_excerpt(text: str, limit: int = EXCERPT_WORD_LIMIT) -> str:
    """metadata.ts:18-42 — first `limit` + last `limit` words, ws-normalized."""
    words = text.split()
    if len(words) <= 2 * limit:
        return " ".join(words)
    return " ".join(words[:limit]) + " … " + " ".join(words[-limit:])


def extract_text(pages: DataFrame) -> DataFrame:
    """Multi-format ingestion: each payload is format-sniffed and routed to
    its loader (html → byte-identical renderer; ics/vcf/xml/eml/mbox/
    docx/xlsx/pptx → their markdown shapes; text-likes verbatim). The
    Common-Crawl hot path — html bytes — goes straight to html_to_markdown
    with no zip/MIME probing beyond the prefix sniff."""

    def process(batches):
        import pandas as pd

        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                error_code = None
                text = ""
                file_type = "html"
                try:
                    payload = row.html
                    if isinstance(payload, (bytes, bytearray)):
                        payload = bytes(payload)
                    else:
                        payload = str(payload or "").encode("utf-8")
                    head = payload[:64].lstrip().lower()
                    if head.startswith(b"<!doctype html") or head.startswith(b"<html"):
                        text = html_to_markdown(
                            payload.decode("utf-8", errors="replace")
                        )
                    else:
                        text, file_type = payload_to_text(
                            payload, url=getattr(row, "url", None)
                        )
                        if file_type in ("text", "markdown", "html"):
                            # default path: the column is html by contract —
                            # fragments without a doctype still render
                            # (plain text passes through the renderer intact)
                            text = html_to_markdown(
                                payload.decode("utf-8", errors="replace")
                            )
                            file_type = "html"
                except Exception:  # malformed beyond repair
                    error_code = "PARSE_ERROR"
                if not error_code and not text.strip():
                    if file_type in ("doc", "ppt", "xls", "cfb"):
                        # detected legacy OLE binary, loader not ported
                        error_code = "UNSUPPORTED_FORMAT"
                    else:
                        error_code = "EMPTY_TEXT"  # readable-text.ts:3-10
                out.append(
                    {
                        "url": row.url,
                        "warc_ts": row.warc_ts,
                        "lang": row.lang,
                        "text": text,
                        "token_count": count_tokens_uncached(text),
                        "n_chars": len(text),
                        "excerpt": build_excerpt(text),
                        "error_code": error_code,
                        "file_type": file_type,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "warc_ts", "lang", "text", "token_count",
                    "n_chars", "excerpt", "error_code", "file_type",
                ],
            )

    return pages.mapInPandas(process, schema=TEXT_SCHEMA)
