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
from ..functions.tokens import count_tokens_uncached

TEXT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, text string, "
    "token_count int, n_chars int, excerpt string, error_code string"
)

EXCERPT_WORD_LIMIT = 250  # metadata.ts:6


def build_excerpt(text: str, limit: int = EXCERPT_WORD_LIMIT) -> str:
    """metadata.ts:18-42 — first `limit` + last `limit` words, ws-normalized."""
    words = text.split()
    if len(words) <= 2 * limit:
        return " ".join(words)
    return " ".join(words[:limit]) + " … " + " ".join(words[-limit:])


def extract_text(pages: DataFrame) -> DataFrame:
    def process(batches):
        import pandas as pd

        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                error_code = None
                text = ""
                try:
                    html = row.html
                    if isinstance(html, (bytes, bytearray)):
                        html = bytes(html).decode("utf-8", errors="replace")
                    text = html_to_markdown(html)
                except Exception:  # malformed beyond repair
                    error_code = "PARSE_ERROR"
                if not error_code and not text.strip():
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
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "warc_ts", "lang", "text", "token_count",
                    "n_chars", "excerpt", "error_code",
                ],
            )

    return pages.mapInPandas(process, schema=TEXT_SCHEMA)
