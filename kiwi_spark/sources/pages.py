"""Deterministic synthesizer of the Common-Crawl-style ``pages`` input table.

Schema per BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)
``text`` is NULL on input — the pipeline fills it; ``html`` is UTF-8 bytes
assembled from the fixture grammar in FIXTURES.md §2 so that every markdown
renderer branch (loader/html.ts:53-177) and every linking matcher
(dedupe.ts:102-145) is exercised, with known ground truth.

Every page is a pure function of ``(seed, page_index)`` (FIXTURES.md), so
generation is embarrassingly parallel: the distributed path maps a
``spark.range`` through ``mapInPandas`` — no driver-side data, no shuffle,
scales linearly with partitions.

Ground truth (intended mentions + alias-level relations per page) is stored
in SEPARATE tables (``truth_mentions``, ``truth_relations``) that the
pipeline never reads; tests use them plus the pure-Python reference
simulator (tests/reference_sim.py) for the P/R gate.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

from ..functions.extract_grammar import (
    CONCEPT_WORDS,
    CREATIVE_WORDS,
    EVENT_WORDS,
    FACT_TITLES,
    FIRST_NAMES,
    LAST_NAMES,
    LOCATIONS,
    MIDDLE_NAMES,
    MONTHS,
    ORG_WORDS,
    PREDICATES,
    PRODUCT_WORDS,
)

SITES = [
    "news.example.org", "blog.example.net", "wiki.example.com",
    "press.example.io", "journal.example.co", "daily.example.dev",
    "report.example.app", "gazette.example.info",
]

_FILLER_WORDS = (
    "the quick brown fox jumps over a lazy dog while markets shift and "
    "analysts debate quarterly outcomes across regions with careful "
    "optimism despite headwinds in supply chains and energy prices that "
    "keep changing every season"
).split()

_DE_FILLER = (
    "die schnelle Entwicklung der Branche zeigt z. B. deutliche Trends bzw. "
    "neue Chancen für Unternehmen die ca. zehn Prozent Wachstum erwarten "
    "vgl. aktuelle Studien usw."
).split()

_MENTION_TEMPLATES = [
    "Analysts praised {e} in a recent briefing.",
    "Observers noted that {e} exceeded expectations.",
    "The report highlighted {e} among key players.",
    "Sources close to {e} declined to comment.",
    "Regulators examined {e} during the review.",
]


@dataclass
class Family:
    fid: int
    etype: str
    aliases: list[str]
    # index of aliases eligible as relationship endpoints (all by default)
    rel: bool = True


@dataclass
class World:
    seed: int
    families: list[Family] = field(default_factory=list)
    head: Family | None = None  # the skew-inducing head entity


def build_world(seed: int) -> World:
    """Deterministic alias-family gazetteer covering every linking matcher
    (FIXTURES.md §3)."""
    rng = random.Random(seed * 7919 + 13)
    world = World(seed=seed)
    fid = 0

    def add(etype: str, aliases: list[str], rel: bool = True) -> Family:
        nonlocal fid
        fam = Family(fid, etype, aliases, rel)
        world.families.append(fam)
        fid += 1
        return fam

    base_words = [w for w in ORG_WORDS if w not in ("MÜLLER", "MULLER", "SÜDWERK", "SUDWERK")]
    rng.shuffle(base_words)
    words = iter(base_words)

    # head entity: a suffix family present on ~20% of pages (skew path)
    w = next(words)
    world.head = add("ORGANIZATION", [w, f"{w} INC", f"{w} CORPORATION"])

    # suffix families
    for _ in range(4):
        a, b = next(words), next(words)
        suf1, suf2 = rng.sample(["INC", "CORP", "LLC", "LTD", "GMBH", "PLC"], 2)
        add("ORGANIZATION", [f"{a} {b}", f"{a} {b} {suf1}", f"{a} {b} {suf2}"])

    # acronym families (unique initials by construction: consume fresh words)
    seen_acronyms: set[str] = set()
    made = 0
    while made < 3:
        a, b = next(words), next(words)
        acronym = a[0] + b[0]
        if acronym in seen_acronyms or acronym in ORG_WORDS:
            continue
        seen_acronyms.add(acronym)
        add("ORGANIZATION", [f"{a} {b}", acronym])
        made += 1

    # compact families (OPEN AI / OPENAI)
    for _ in range(2):
        a, b = next(words), next(words)
        add("ORGANIZATION", [f"{a} {b}", f"{a}{b}"])

    # & families
    for _ in range(2):
        a, b = next(words), next(words)
        add("ORGANIZATION", [f"{a} & {b}", f"{a} AND {b}"])

    # diacritics family (NFKD fold): MÜLLER GMBH ≡ MULLER
    add("ORGANIZATION", ["MÜLLER GMBH", "MULLER"])
    add("ORGANIZATION", ["SÜDWERK AG", "SUDWERK"])

    # persons: positive family (middle-name alias) + negatives sharing tokens
    firsts = list(FIRST_NAMES)
    lasts = list(LAST_NAMES)
    rng.shuffle(firsts)
    rng.shuffle(lasts)
    for i in range(6):
        f, m, l = firsts[i], MIDDLE_NAMES[i % len(MIDDLE_NAMES)], lasts[i]
        add("PERSON", [f"{f} {m} {l}", f"{f} {l}"])
    # negatives: same first different last, same last different first
    add("PERSON", [f"{firsts[0]} {lasts[10]}"])
    add("PERSON", [f"{firsts[10]} {lasts[0]}"])

    for name in rng.sample(LOCATIONS, 8):
        add("LOCATION", [name])
    for name in rng.sample(PRODUCT_WORDS, 4):
        add("PRODUCT", [f"{rng.choice(base_words)} {name}"], rel=False)
    for name in rng.sample(EVENT_WORDS, 3):
        add("EVENT", [f"{rng.choice(LOCATIONS)} {name}"], rel=False)
    for name in rng.sample(CONCEPT_WORDS, 4):
        add("CONCEPT", [name], rel=False)
    for name in rng.sample(CREATIVE_WORDS, 3):
        add("CREATIVE_WORK", [name], rel=False)
    for i in range(4):
        month = MONTHS[(seed + i * 3) % 12]
        add("DATE", [f"{month} {1 + (i * 7) % 27}, {2023 + i % 3}"], rel=False)
    for title in FACT_TITLES[:4]:
        add("FACT", [f"FACT: {title}"], rel=False)

    return world


def _pick_alias(rng: random.Random, fam: Family) -> str:
    return fam.aliases[rng.randrange(len(fam.aliases))]


def _filler_sentence(rng: random.Random, lang: str, n: int = 12) -> str:
    pool = _DE_FILLER if lang == "de" else _FILLER_WORDS
    ws = [pool[rng.randrange(len(pool))] for _ in range(n)]
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def generate_page(world: World, index: int) -> dict:
    """Pure function (world.seed, index) → one pages row + ground truth."""
    rng = random.Random(world.seed * 1_000_003 + index)
    site = SITES[rng.randrange(len(SITES))]
    url = f"https://{site}/articles/{index:08d}"
    lang = "de" if rng.random() < 0.10 else "en"
    ts = dt.datetime(2025, 1, 1) + dt.timedelta(
        seconds=(index * 137 + rng.randrange(60)) % (364 * 86400)
    )

    rel_families = [f for f in world.families if f.rel]
    mentions: list[tuple[str, str]] = []  # (alias, type)
    relations: list[tuple[str, str, str, str, str, float]] = []
    sentences: list[str] = []

    # head-entity skew: ~20% of pages mention the head org
    if rng.random() < 0.20 and world.head is not None:
        alias = _pick_alias(rng, world.head)
        other = rel_families[rng.randrange(len(rel_families))]
        if other.fid != world.head.fid:
            other_alias = _pick_alias(rng, other)
            pred = list(PREDICATES)[rng.randrange(len(PREDICATES))]
            sentences.append(f"{other_alias} {pred} {alias}.")
            mentions += [(alias, world.head.etype), (other_alias, other.etype)]
            relations.append(
                (other_alias, other.etype, pred, alias, world.head.etype, PREDICATES[pred])
            )

    n_rel = rng.randrange(2, 6)
    for _ in range(n_rel):
        a = rel_families[rng.randrange(len(rel_families))]
        b = rel_families[rng.randrange(len(rel_families))]
        alias_a, alias_b = _pick_alias(rng, a), _pick_alias(rng, b)
        pred = list(PREDICATES)[rng.randrange(len(PREDICATES))]
        sentences.append(f"{alias_a} {pred} {alias_b}.")
        mentions += [(alias_a, a.etype), (alias_b, b.etype)]
        if a.fid != b.fid:  # self-alias pairs become dropped self-loops
            relations.append((alias_a, a.etype, pred, alias_b, b.etype, PREDICATES[pred]))

    n_single = rng.randrange(1, 4)
    for _ in range(n_single):
        fam = world.families[rng.randrange(len(world.families))]
        alias = _pick_alias(rng, fam)
        tpl = _MENTION_TEMPLATES[rng.randrange(len(_MENTION_TEMPLATES))]
        sentences.append(tpl.format(e=alias))
        mentions.append((alias, fam.etype))

    # --- assemble HTML (fixture grammar, FIXTURES.md §2) -------------------
    blocks: list[str] = []
    title = " ".join(
        w.capitalize() for w in rng.sample(_FILLER_WORDS, 3)
    )
    blocks.append(f"<h1>{title} <em>update</em></h1>")

    body_paras: list[list[str]] = [[]]
    for s in sentences:
        body_paras[-1].append(s)
        if rng.random() < 0.5:
            body_paras[-1].append(_filler_sentence(rng, lang))
        if rng.random() < 0.4:
            body_paras.append([])
    if not body_paras[-1]:
        body_paras.pop()

    trap_used = False
    for i, para in enumerate(body_paras):
        text = " ".join(_esc(s) for s in para)
        if rng.random() < 0.3 and not trap_used:
            text += " Dr. Smith measured 3.14 meters on 01.01.2024."
            trap_used = True
        blocks.append(f"<p>{text}</p>")
        if rng.random() < 0.2:
            blocks.append(f"<h2>Section {i + 2} <strong>notes</strong></h2>")

    # whitespace/entity traps
    blocks.append("<p>Copyright&nbsp;&copy;&mdash;2025   with\t\tspaces</p>")
    # dropped content
    blocks.append("<script>var dropped = true;</script><style>.x{color:red}</style>")
    # list
    items = "".join(
        f"<li>{_esc(_filler_sentence(rng, lang, 4))}</li>" for _ in range(3)
    )
    blocks.append(f"<ul>{items}<li>nested<ol><li>alpha</li><li>beta</li></ol></li></ul>")
    # table (ragged + pipe escape)
    blocks.append(
        "<table><thead><tr><th>metric</th><th>value|unit</th></tr></thead>"
        "<tbody><tr><td>latency</td><td>12 ms</td></tr><tr><td>rows</td></tr></tbody></table>"
    )
    if rng.random() < 0.5:
        blocks.append("<pre>  code block   keeps    spacing  </pre>")
    if rng.random() < 0.5:
        blocks.append("<blockquote><p>quoted wisdom<br>second line</p></blockquote>")
    blocks.append('<p>See <a href="https://example.com/ref">the reference</a> '
                  'and <img src="chart.png" alt="a chart"> for details.</p>')
    blocks.append("<hr>")
    # long tail to force multi-chunk units on ~10% of pages
    n_tail = 40 if rng.random() < 0.10 else rng.randrange(2, 6)
    for _ in range(n_tail):
        blocks.append(f"<p>{_esc(_filler_sentence(rng, lang, 40))}</p>")

    html = (
        "<!doctype html><html><head><title>Ignored title</title>"
        '<meta charset="utf-8"><script>bad()</script></head><body>'
        + "".join(blocks)
        + "</body></html>"
    )

    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": None,
        "lang": lang,
        "_mentions": mentions,
        "_relations": relations,
    }


# --- pandas / Spark materialization ---------------------------------------


def pages_pandas(seed: int, n: int):
    """Driver-side generation for tests (small n)."""
    import pandas as pd

    world = build_world(seed)
    rows = [generate_page(world, i) for i in range(n)]
    pages = pd.DataFrame(
        [
            {k: r[k] for k in ("url", "warc_ts", "html", "text", "lang")}
            for r in rows
        ]
    )
    mentions = pd.DataFrame(
        [
            {"url": r["url"], "alias": a, "etype": t}
            for r in rows
            for (a, t) in r["_mentions"]
        ]
    )
    relations = pd.DataFrame(
        [
            {
                "url": r["url"], "subj": s, "subj_type": st, "pred": p,
                "obj": o, "obj_type": ot, "strength": w,
            }
            for r in rows
            for (s, st, p, o, ot, w) in r["_relations"]
        ]
    )
    return pages, mentions, relations


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark, n: int, seed: int = 42, partitions: int | None = None,
             start: int = 0):
    """Distributed generation: spark.range → mapInPandas, no shuffle.

    Each partition generates its index range independently (pure function of
    (seed, index)), so this scales to any corpus size with zero driver data.
    ``start`` offsets the index range — disjoint ranges under the same seed
    yield disjoint urls, the incremental-ingestion batch recipe.
    """
    if partitions is None:
        # oversplit 4× so downstream stage files stay small enough that every
        # core gets work even after parquet split packing
        partitions = max(4 * spark.sparkContext.defaultParallelism, 8)
    base = spark.range(start, start + n, 1, partitions)

    def gen(batches):
        import pandas as pd

        world = build_world(seed)
        for batch in batches:
            rows = [generate_page(world, int(i)) for i in batch["id"]]
            yield pd.DataFrame(
                [
                    {k: r[k] for k in ("url", "warc_ts", "html", "text", "lang")}
                    for r in rows
                ]
            )

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)


def write_pages(spark, out_dir: str, n: int, seed: int = 42) -> None:
    """Materialize pages + ground-truth tables as parquet under out_dir."""
    pages_df(spark, n, seed).write.mode("overwrite").parquet(f"{out_dir}/pages.parquet")

    truth_schema_m = "url string, alias string, etype string"
    truth_schema_r = (
        "url string, subj string, subj_type string, pred string, "
        "obj string, obj_type string, strength double"
    )
    base = spark.range(0, n, 1, max(spark.sparkContext.defaultParallelism, 8))

    def gen_truth(kind):
        def inner(batches):
            import pandas as pd

            world = build_world(seed)
            for batch in batches:
                out = []
                for i in batch["id"]:
                    r = generate_page(world, int(i))
                    if kind == "m":
                        out += [
                            {"url": r["url"], "alias": a, "etype": t}
                            for (a, t) in r["_mentions"]
                        ]
                    else:
                        out += [
                            {
                                "url": r["url"], "subj": s, "subj_type": st,
                                "pred": p, "obj": o, "obj_type": ot,
                                "strength": w,
                            }
                            for (s, st, p, o, ot, w) in r["_relations"]
                        ]
                yield pd.DataFrame(
                    out,
                    columns=(
                        ["url", "alias", "etype"]
                        if kind == "m"
                        else [
                            "url", "subj", "subj_type", "pred", "obj",
                            "obj_type", "strength",
                        ]
                    ),
                )

        return inner

    base.mapInPandas(gen_truth("m"), truth_schema_m).write.mode("overwrite").parquet(
        f"{out_dir}/truth_mentions.parquet"
    )
    base.mapInPandas(gen_truth("r"), truth_schema_r).write.mode("overwrite").parquet(
        f"{out_dir}/truth_relations.parquet"
    )
