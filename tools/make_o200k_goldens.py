"""Stamp exact o200k token-count goldens once real ranks data is present.

    python tools/make_o200k_goldens.py

Writes tests/goldens/o200k_counts.json with the exact encoder's count for
every string in the multilingual fixture set (tests/test_o200k_exact.py).
If the real ``tiktoken`` package is importable, every count is
cross-checked against it first (hard failure on any mismatch), making the
goldens an independent pin rather than a self-fulfilling snapshot.

Requires the ranks file (see tools/fetch_o200k.py). The marker suite
skips golden comparison until this file exists, so the flow is:
fetch → make goldens → pytest tests/test_o200k_exact.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kiwi_spark.functions.bpe import get_default_encoder

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens", "o200k_counts.json",
)


def main() -> int:
    from tests.test_o200k_exact import FIXTURES

    encoder = get_default_encoder()
    if encoder is None or len(encoder.ranks) < 150_000:
        raise SystemExit(
            "no real o200k ranks data found — run tools/fetch_o200k.py first"
        )

    try:
        import tiktoken

        ext = tiktoken.get_encoding("o200k_base")
    except Exception:
        ext = None
        print("tiktoken not importable — stamping without cross-check")

    goldens = {}
    for text in FIXTURES:
        count = encoder.count(text)
        if ext is not None:
            ref = len(ext.encode(text))
            if ref != count:
                raise SystemExit(
                    f"MISMATCH vs tiktoken on {text!r}: ours={count} ref={ref}"
                )
        goldens[text] = count
    with open(GOLDEN_PATH, "w", encoding="utf-8") as handle:
        json.dump(goldens, handle, ensure_ascii=False, indent=1)
    verified = "tiktoken-verified" if ext is not None else "unverified"
    print(f"wrote {len(goldens)} {verified} goldens to {GOLDEN_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
