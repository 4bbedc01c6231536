"""One-command activation of EXACT o200k_base token counting.

    python tools/fetch_o200k.py [--dest kiwi_spark/data/o200k_base.tiktoken]

Downloads the public o200k_base ranks file (~4 MB, the same data
js-tiktoken ships) to the vendored location ``kiwi_spark/data/
o200k_base.tiktoken``. On the next process start every token count —
chunk boundaries, the ``token_count`` column, estimateToken parity —
flips from the documented approximation to the exact tiktoken-compatible
encoder with ZERO code changes (resolution order in functions/bpe.py:
``$KIWI_SPARK_O200K_RANKS`` env var first, then the vendored path).

This build sandbox has no network access, so the script exists for
deployment environments; it validates the download by parsing it with
the same loader the engine uses and checking basic vocabulary facts.
Afterwards run the exact-count marker suite:

    python -m pytest tests/test_o200k_exact.py -q
    python tools/make_o200k_goldens.py   # stamp count goldens for CI
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kiwi_spark.functions.bpe import DATA_PATH, load_ranks

PUBLIC_URL = (
    "https://openaipublic.blob.core.windows.net/encodings/o200k_base.tiktoken"
)


def validate(path: str) -> dict:
    """Parse with the engine's own loader and sanity-check the vocabulary."""
    ranks = load_ranks(path)
    problems = []
    if len(ranks) < 150_000:
        problems.append(f"only {len(ranks)} entries — truncated download?")
    missing_bytes = [b for b in range(256) if bytes([b]) not in ranks]
    if missing_bytes:
        problems.append(f"{len(missing_bytes)} single-byte tokens missing")
    if problems:
        raise SystemExit("ranks file failed validation: " + "; ".join(problems))
    return {"entries": len(ranks), "max_rank": max(ranks.values())}


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dest", default=DATA_PATH)
    parser.add_argument("--url", default=PUBLIC_URL)
    args = parser.parse_args()

    os.makedirs(os.path.dirname(args.dest), exist_ok=True)
    tmp = args.dest + ".part"
    print(f"fetching {args.url} ...")
    urllib.request.urlretrieve(args.url, tmp)
    stats = validate(tmp)
    os.replace(tmp, args.dest)
    print(
        f"ok: {args.dest} ({stats['entries']} entries, "
        f"max rank {stats['max_rank']}) — exact o200k counting is now active"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
