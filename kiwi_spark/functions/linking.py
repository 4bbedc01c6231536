"""Entity-linking kernels: name normalization, blocking keys, duplicate
predicate, and the within-document union-find.

Semantics ported from packages/graph/src/dedupe.ts:

* ``tokenize``              — dedupe.ts:25-38 (trim, CR/LF→space, ws collapse,
                              NFKD + strip combining marks, upper, &→AND,
                              non-alnum(Unicode)→space, split)
* ``strip_org_suffixes``    — dedupe.ts:5-22, 40-54
* ``significant_tokens`` / ``build_acronym`` — dedupe.ts:23, 56-67
* ``are_duplicates``        — dedupe.ts:102-145 (type equality required;
                              DATE/FACT exact-only; PERSON first+last;
                              base / compact / acronym-variant equality)
* ``blocking_keys``         — OUR scale design: every reference matcher is an
                              equality on a derivable key, so per entity we
                              emit keys whose self-join reproduces the exact
                              candidate set (lossless blocking; SURVEY §2.4 L4)
* ``union_find_groups``     — dedupe.ts:253-295 (used per-document, where the
                              reference runs it per-file; the distributed
                              cross-document pass is connected components in
                              kiwi_spark.operators.link)
* canonical orderings       — dedupe.ts:147-220 (entity/name/description)
* ``compact_name_key``      — apps/worker/lib/sql.ts:16-22 (cross-file key)

Pure Python, no Spark imports; invoked from Arrow-batched stages.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

ORGANIZATION_SUFFIXES = frozenset(
    "AG BV CO COMPANY CORP CORPORATION GMBH INC INCORPORATED LIMITED LLC "
    "LTD NV PLC SA SAS".split()
)
CONNECTOR_TOKENS = frozenset(
    "A AN AND AT BY FOR FROM IN OF ON THE TO WITH".split()
)
EXACT_ONLY_TYPES = frozenset(["DATE", "FACT"])

_RE_CRLF = re.compile(r"[\r\n]+")
_RE_WS = re.compile(r"\s+")
_RE_COMBINING = re.compile(r"[̀-ͯ]")
_RE_NON_ALNUM = re.compile(r"[^\w]+|_+", re.UNICODE)
_RE_ACRONYM_TOKEN = re.compile(r"^[^\W_]{2,10}$", re.UNICODE)


def normalize_ws(value: str) -> str:
    """trim + CR/LF→space + whitespace collapse (used for descriptions/names
    throughout dedupe.ts, e.g. :153-160, :180-186)."""
    return _RE_WS.sub(" ", _RE_CRLF.sub(" ", value.strip()))


@lru_cache(maxsize=65536)
def _tokenize_cached(value: str) -> tuple[str, ...]:
    normalized = normalize_ws(value)
    normalized = unicodedata.normalize("NFKD", normalized)
    normalized = _RE_COMBINING.sub("", normalized)
    normalized = normalized.upper()
    normalized = normalized.replace("&", " AND ")
    normalized = _RE_NON_ALNUM.sub(" ", normalized).strip()
    return tuple(normalized.split()) if normalized else ()


def tokenize(value: str) -> list[str]:
    # memoized per process: the verify/canonicalize paths call this many
    # times per entity name (NFKD + 4 regexes dominate their profile);
    # callers receive a fresh list so in-place edits stay local
    return list(_tokenize_cached(value))


def strip_org_suffixes(tokens: list[str]) -> list[str]:
    stripped = list(tokens)
    while len(stripped) > 1 and stripped[-1] in ORGANIZATION_SUFFIXES:
        stripped.pop()
    return stripped


def significant_tokens(tokens: list[str]) -> list[str]:
    return [t for t in strip_org_suffixes(tokens) if t not in CONNECTOR_TOKENS]


def build_acronym(tokens: list[str]) -> str:
    sig = significant_tokens(tokens)
    if len(sig) < 2:
        return ""
    return "".join(t[0] for t in sig if t)


def is_acronym_token(tokens: list[str]) -> bool:
    return len(tokens) == 1 and bool(_RE_ACRONYM_TOKEN.match(tokens[0]))


def are_people_duplicates(left: str, right: str) -> bool:
    lt, rt = tokenize(left), tokenize(right)
    if len(lt) < 2 or len(rt) < 2:
        return False
    return lt[0] == rt[0] and lt[-1] == rt[-1]


def are_duplicates(left_name: str, left_type: str, right_name: str, right_type: str) -> bool:
    if left_type != right_type:
        return False
    lt, rt = tokenize(left_name), tokenize(right_name)
    ln, rn = " ".join(lt), " ".join(rt)
    if not ln or not rn:
        return False
    if ln == rn:
        return True
    if left_type in EXACT_ONLY_TYPES:
        return False
    if left_type == "PERSON":
        # same predicate as are_people_duplicates, reusing lt/rt
        if len(lt) < 2 or len(rt) < 2:
            return False
        return lt[0] == rt[0] and lt[-1] == rt[-1]
    lb, rb = strip_org_suffixes(lt), strip_org_suffixes(rt)
    lbs, rbs = " ".join(lb), " ".join(rb)
    if lbs and rbs and lbs == rbs:
        return True
    lc, rc = "".join(lb), "".join(rb)
    if lc and rc and lc == rc:
        return True
    # acronym variants
    if is_acronym_token(lt) and build_acronym(rt) == ln:
        return True
    if is_acronym_token(rt) and build_acronym(lt) == rn:
        return True
    return False


def are_duplicates_batch(nu, tu, nv, tv):
    """Vectorized ``are_duplicates`` over four aligned sequences → a numpy
    bool array (VERDICT r3 #3: no per-pair Python in verify_pairs).

    Name features (norm/base/compact/acronym/first/last) are derived ONCE
    per unique name; the pair predicate itself is numpy boolean algebra, so
    candidate-heavy fuzzy batches cost O(unique names) Python instead of
    O(pairs)."""
    import numpy as np
    import pandas as pd

    names = pd.unique(
        np.concatenate([np.asarray(nu, dtype=object), np.asarray(nv, dtype=object)])
    )
    feats: dict[str, tuple] = {}
    for n in names:
        lt = tokenize(n)
        base = strip_org_suffixes(lt)
        feats[n] = (
            " ".join(lt),                      # 0 norm
            lt[0] if lt else "",               # 1 first token
            lt[-1] if lt else "",              # 2 last token
            len(lt),                           # 3 n tokens
            " ".join(base),                    # 4 base
            "".join(base),                     # 5 compact
            build_acronym(lt),                 # 6 acronym
            is_acronym_token(lt),              # 7 is acronym-shaped
        )

    def cols(series):
        rows = [feats[n] for n in series]
        arr = np.empty((len(rows), 8), dtype=object)
        if rows:
            arr[:] = rows
        return (
            arr[:, 0], arr[:, 1], arr[:, 2],
            arr[:, 3].astype(np.int64) if len(rows) else np.zeros(0, np.int64),
            arr[:, 4], arr[:, 5], arr[:, 6],
            arr[:, 7].astype(bool) if len(rows) else np.zeros(0, bool),
        )

    norm_u, first_u, last_u, ntok_u, base_u, comp_u, acr_u, isacr_u = cols(nu)
    norm_v, first_v, last_v, ntok_v, base_v, comp_v, acr_v, isacr_v = cols(nv)
    tu = np.asarray(tu, dtype=object)
    tv = np.asarray(tv, dtype=object)

    nonempty = (norm_u != "") & (norm_v != "")
    eq_norm = norm_u == norm_v
    exact_only = np.isin(tu, list(EXACT_ONLY_TYPES))
    person = tu == "PERSON"
    person_ok = (
        (ntok_u >= 2) & (ntok_v >= 2) & (first_u == first_v) & (last_u == last_v)
    )
    base_ok = (base_u != "") & (base_v != "") & (base_u == base_v)
    comp_ok = (comp_u != "") & (comp_v != "") & (comp_u == comp_v)
    acr_ok = (isacr_u & (acr_v == norm_u)) | (isacr_v & (acr_u == norm_v))
    fuzzy = base_ok | comp_ok | acr_ok
    branch = np.where(exact_only, False, np.where(person, person_ok, fuzzy))
    return (tu == tv) & nonempty & (eq_norm | branch)


def blocking_keys(name: str, etype: str) -> list[str]:
    """Lossless blocking keys: two entities satisfy ``are_duplicates`` iff
    they share at least one key AND a vectorized re-verification passes.

    Keys (all prefixed by type since type equality is required):
      N:<norm>        exact normalized name      (all types)
      B:<base>        suffix-stripped base       (fuzzy types)
      C:<compact>     no-space base              (fuzzy types)
      A:<acronym>     built acronym, plus the name itself when it *is* an
                      acronym-shaped single token (fuzzy types)
      P:<first|last>  first+last token           (PERSON only)
    """
    tokens = tokenize(name)
    norm = " ".join(tokens)
    if not norm:
        return []
    keys = [f"{etype}\x00N:{norm}"]
    if etype in EXACT_ONLY_TYPES:
        return keys
    if etype == "PERSON":
        if len(tokens) >= 2:
            keys.append(f"{etype}\x00P:{tokens[0]}\x01{tokens[-1]}")
        return keys
    base = strip_org_suffixes(tokens)
    base_s = " ".join(base)
    if base_s:
        keys.append(f"{etype}\x00B:{base_s}")
        keys.append(f"{etype}\x00C:{''.join(base)}")
    acronym = build_acronym(tokens)
    if acronym:
        keys.append(f"{etype}\x00A:{acronym}")
    if is_acronym_token(tokens):
        keys.append(f"{etype}\x00A:{norm}")
    return keys


def compact_name_key(name: str) -> str:
    """apps/worker/lib/sql.ts:16-22 — the cross-file canonical key:
    upper(trim(&→AND, non-alnum→space, collapse)) with spaces removed.
    (No NFKD fold — Postgres regexp classes don't strip accents.)"""
    value = name.replace("&", " AND ")
    # [[:alnum:]] in Postgres matches Unicode letters+digits; keep
    # letters/digits per Python str semantics, everything else → space:
    value = "".join(ch if ch.isalnum() else " " for ch in value)
    value = _RE_WS.sub(" ", value).strip().upper()
    return value.replace(" ", "")


def union_find_groups(pairs: list[tuple[int, int]], n: int) -> list[int]:
    """dedupe.ts:253-295 — returns root index per element; roots follow the
    reference's union order (right root attached to left root)."""
    parents = list(range(n))

    def find(i: int) -> int:
        root = i
        while parents[root] != root:
            root = parents[root]
        while parents[i] != root:
            parents[i], i = root, parents[i]
        return root

    for left, right in pairs:
        lr, rr = find(left), find(right)
        if lr != rr:
            parents[rr] = lr
    return [find(i) for i in range(n)]


# --- canonical selection total orders (dedupe.ts:147-220) -----------------


def canonical_entity_sort_key(n_sources: int, description: str | None, name: str, entity_id: str):
    """max() over this key ≡ chooseCanonicalEntity's reduce (dedupe.ts:147-174):
    most sources, longest normalized description, longest tokenized name,
    then smallest id."""
    desc_len = len(normalize_ws(description or ""))
    name_len = len(" ".join(tokenize(name)))
    return (n_sources, desc_len, name_len, _NegStr(entity_id))


def canonical_name_sort_key(name: str):
    """max() over distinct ws-normalized names ≡ chooseCanonicalName
    (dedupe.ts:176-211): most significant tokens, longest tokenized form,
    lexicographically smallest."""
    tokens = tokenize(name)
    return (len(significant_tokens(tokens)), len(" ".join(tokens)), _NegStr(name))


class _NegStr:
    """Reverse-ordering wrapper so 'smallest string' wins under max()."""

    __slots__ = ("value",)

    def __init__(self, value: str) -> None:
        self.value = value

    def __lt__(self, other: "_NegStr") -> bool:
        return self.value > other.value

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _NegStr) and self.value == other.value
