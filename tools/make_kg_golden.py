"""Generate the committed KG golden-output parquets.

The goldens are produced by tests/reference_sim.py — the deliberately NAIVE
O(n²) single-process reimplementation of the reference's linking semantics
(dedupe.ts / process-file.ts / merge.ts), independent of the production
Spark operators — over the same deterministic 60-page corpus the driver
queries synthesize (pages_df(spark, 60, seed=42) ≡ pages_pandas(42, 60)).

The driver's DuckDB oracle for kg_build_graph[_fuzzy] reads these parquets,
giving the flagship pipeline a hash-checked expected output instead of a
rows-only check.

Usage: python tools/make_kg_golden.py   (writes tests/goldens/*.parquet)
"""

from __future__ import annotations

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_PAGES = 60
SEED = 42


def golden_frame(fuzzy: bool) -> pd.DataFrame:
    from kiwi_spark.sources.pages import pages_pandas
    from reference_sim import simulate_corpus

    pages, _, _ = pages_pandas(SEED, N_PAGES)
    _, triples = simulate_corpus(pages.to_dict("records"), fuzzy=fuzzy)
    rows = sorted((s, p, o, round(st, 2)) for (s, p, o, st) in triples)
    return pd.DataFrame(rows, columns=["subj", "pred", "obj", "strength"])


def main() -> None:
    out_dir = os.path.join(REPO, "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for fuzzy, name in ((False, "kg_golden_parity"), (True, "kg_golden_fuzzy")):
        df = golden_frame(fuzzy)
        path = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(path, index=False)
        print(f"{path}: {len(df)} triples")


if __name__ == "__main__":
    main()
