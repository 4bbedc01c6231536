"""Linking predicate + blocking tests (dedupe.test.ts fixture families,
FIXTURES.md §3) and a property check that blocking keys are lossless with
respect to the pairwise predicate."""

import random

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from kiwi_spark.functions.extract_grammar import ORG_WORDS
from kiwi_spark.functions.linking import (
    are_duplicates,
    blocking_keys,
    compact_name_key,
    is_acronym_token,
    tokenize,
    union_find_groups,
)


def test_dedupe_fixture_families():  # dedupe.test.ts:15-120
    dup = [
        ("APPLE", "APPLE INC", "ORGANIZATION"),
        ("APPLE", "Apple Incorporated", "ORGANIZATION"),
        ("IBM", "INTERNATIONAL BUSINESS MACHINES", "ORGANIZATION"),
        ("OPEN AI", "OPENAI", "ORGANIZATION"),
        ("JOHNSON & JOHNSON", "JOHNSON AND JOHNSON", "ORGANIZATION"),
        ("ALICE MARIE SMITH", "ALICE SMITH", "PERSON"),
        ("MÜLLER GMBH", "MULLER", "ORGANIZATION"),
        ("MARCH 3, 2025", "MARCH 3 2025", "DATE"),  # normalized-equal
    ]
    for a, b, t in dup:
        assert are_duplicates(a, t, b, t), (a, b)
        assert are_duplicates(b, t, a, t), (b, a)

    not_dup = [
        ("ALICE SMITH", "ALICE JONES", "PERSON"),
        ("MARCH 3, 2025", "MARCH 4, 2025", "DATE"),
        ("FACT: RENT", "FACT: RENT LEVEL", "FACT"),
    ]
    for a, b, t in not_dup:
        assert not are_duplicates(a, t, b, t), (a, b)
    # cross-type never merges (dedupe.ts:103-105)
    assert not are_duplicates("PARIS", "LOCATION", "PARIS", "PERSON")


def test_tokenize_nfkd_and_amp():
    assert tokenize("Müller GmbH") == ["MULLER", "GMBH"]
    assert tokenize("Johnson & Johnson") == ["JOHNSON", "AND", "JOHNSON"]
    assert tokenize("  A,\r\nB  ") == ["A", "B"]


def test_compact_name_key():
    assert compact_name_key("Johnson & Johnson") == "JOHNSONANDJOHNSON"
    assert compact_name_key("Apple, Inc.") == "APPLEINC"


def _random_name(rng: random.Random) -> str:
    style = rng.randrange(5)
    words = rng.sample(ORG_WORDS[:20], rng.randrange(1, 4))
    name = " ".join(words)
    if style == 1:
        name += " " + rng.choice(["INC", "LLC", "GMBH", "CORP"])
    elif style == 2:
        name = "".join(words)
    elif style == 3 and len(words) >= 2:
        name = "".join(w[0] for w in words)
    elif style == 4 and len(words) >= 2:
        name = f"{words[0]} & {words[1]}"
    return name


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_blocking_is_lossless(seed):
    """Any pair satisfying are_duplicates shares ≥1 blocking key (and for
    acronym pairs, one side is acronym-shaped — the star-edge invariant)."""
    rng = random.Random(seed)
    entities = [( _random_name(rng), "ORGANIZATION") for _ in range(12)]
    entities += [("ALICE MARIE SMITH", "PERSON"), ("ALICE SMITH", "PERSON")]
    for i in range(len(entities)):
        for j in range(i + 1, len(entities)):
            a, ta = entities[i]
            b, tb = entities[j]
            if are_duplicates(a, ta, b, tb):
                ka = set(blocking_keys(a, ta))
                kb = set(blocking_keys(b, tb))
                assert ka & kb, (a, b, ka, kb)


def test_union_find_matches_reference_order():
    roots = union_find_groups([(0, 1), (2, 3), (1, 3)], 5)
    assert roots[0] == roots[1] == roots[2] == roots[3]
    assert roots[4] == 4


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_batch_predicate_matches_scalar(seed):
    """VERDICT r3 #3: are_duplicates_batch (numpy, per-unique-name feature
    derivation) must agree elementwise with the scalar are_duplicates on
    adversarial name pairs across every type branch."""
    from kiwi_spark.functions.linking import are_duplicates_batch

    rng = random.Random(seed)
    pool = [_random_name(rng) for _ in range(10)]
    pool += ["ALICE MARIE SMITH", "ALICE SMITH", "ALICE", "", "  ",
             "MÜLLER GMBH", "MULLER", "IBM",
             "INTERNATIONAL BUSINESS MACHINES", "MARCH 3, 2025"]
    types = ["ORGANIZATION", "PERSON", "DATE", "FACT", "LOCATION"]
    nu, tu, nv, tv = [], [], [], []
    for _ in range(120):
        nu.append(rng.choice(pool))
        nv.append(rng.choice(pool))
        tu.append(rng.choice(types))
        tv.append(rng.choice(types) if rng.random() < 0.3 else tu[-1])
    got = list(are_duplicates_batch(nu, tu, nv, tv))
    expected = [
        are_duplicates(a, b, c, d) for a, b, c, d in zip(nu, tu, nv, tv)
    ]
    assert got == expected


def test_batch_predicate_empty_batch():
    from kiwi_spark.functions.linking import are_duplicates_batch

    assert list(are_duplicates_batch([], [], [], [])) == []


@pytest.mark.parametrize("seed", range(6))
def test_blocking_is_sound_for_star_edges(seed):
    """Converse of losslessness — and the invariant the DELTA relink's
    closure proof additionally needs (operators/delta_link.py): every
    candidate pair the star-edge construction can emit — two same-type
    entities sharing a non-acronym key, or any member paired with an
    ACRONYM-SHAPED entity through a shared A key — satisfies
    are_duplicates. Hence verify_pairs rejects nothing, an active bucket
    is always one component, and anchor choice (global minimum or
    delta-subset minimum) cannot change the component structure.

    Entities whose BUILT acronyms merely collide (e.g. ALPHA BETA /
    AZURE BAY → A:AB) share a key but are NOT an emittable pair unless
    one side is itself acronym-shaped — the asymmetric dedupe.ts rule —
    so no soundness obligation arises there (and indeed the predicate
    rejects them)."""
    rng = random.Random(1000 + seed)
    entities = [(_random_name(rng), "ORGANIZATION") for _ in range(10)]
    entities += [
        ("ALPHA BETA", "ORGANIZATION"),       # built acronym AB
        ("AZURE BAY", "ORGANIZATION"),        # built acronym AB (collision)
        ("AB", "ORGANIZATION"),               # acronym-shaped token
        ("ALPHA BETA CORP", "ORGANIZATION"),  # suffix family
        ("A B", "ORGANIZATION"),
        ("ALICE SMITH", "PERSON"),
        ("ALICE MARIE SMITH", "PERSON"),
    ]
    for i in range(len(entities)):
        for j in range(len(entities)):
            if i == j:
                continue
            a, ta = entities[i]
            b, tb = entities[j]
            shared = set(blocking_keys(a, ta)) & set(blocking_keys(b, tb))
            if not shared:
                continue
            non_acr = {k for k in shared if not k.split("\x00")[1].startswith("A:")}
            if non_acr:
                assert are_duplicates(a, ta, b, tb), (a, b, non_acr)
            elif is_acronym_token(tokenize(b)):
                # A-key-only overlap with an acronym-shaped anchor side:
                # exactly the member→anchor edges blocking_edges emits
                assert are_duplicates(a, ta, b, tb), (a, b, shared)
