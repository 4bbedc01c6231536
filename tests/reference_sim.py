"""Reference simulator: a NAIVE, single-process reimplementation of the
reference pipeline's linking semantics, used as the oracle for the triple
P/R gate (BASELINE.json: P/R ≥ 0.95 vs the reference's emitted triple set).

Deliberately independent of the production path where the algorithms differ:

* within-doc dedupe here is the literal O(n²) pairwise union-find of
  dedupe.ts:253-295 with the reduce-style canonical selection of
  dedupe.ts:147-220 — the production path uses blocking keys + union-find
  (operators.build_graph/functions.docproc).
* cross-doc linking here is the literal window-function semantics of
  process-file.ts:636-857 (first_value over (type, compact key) ordered by
  id; least/greatest pair dedupe with max rank) — the production path uses
  star-edge blocking + distributed connected components (operators.link).

Shared with production (they are the *specification* of the synthetic
corpus, pinned by their own unit tests): html_to_markdown, the chunker, the
extraction grammar, tokenize/compact keys, and the stable id scheme.
"""

from __future__ import annotations

from collections import defaultdict

from kiwi_spark.functions.chunking import (
    DEFAULT_SEMANTIC_CHUNK_SIZE,
    _TEXT,
    _split_into_segments,
    chunk_text_spans,
)
from kiwi_spark.functions.extract_grammar import extract_sentence
from kiwi_spark.functions.html_text import html_to_markdown
from kiwi_spark.functions.ids import stable_id
from kiwi_spark.functions.linking import (
    are_duplicates,
    compact_name_key,
    normalize_ws,
    significant_tokens,
    tokenize,
)


class Entity:
    def __init__(self, eid, name, etype, description):
        self.id = eid
        self.name = name
        self.type = etype
        self.description = description
        self.sources = []


class Rel:
    def __init__(self, rid, source_id, target_id, pred, description, strength):
        self.id = rid
        self.source_id = source_id
        self.target_id = target_id
        self.pred = pred
        self.description = description
        self.strength = strength
        self.sources = []


def _extract_unit(url, unit_id, content):
    """Same grammar as production (it is the corpus spec)."""
    sentences = [s.text for s in _split_into_segments(content) if s.kind == _TEXT]
    entities = {}
    rels = []
    for sentence in sentences:
        spans, rel = extract_sentence(sentence)
        for name, etype, _, _ in spans:
            key = (name, etype)
            if key not in entities:
                entities[key] = Entity(
                    stable_id(unit_id, "e", name, etype),
                    name,
                    etype,
                    f"{name} is a {etype} mentioned in: {sentence}",
                )
        if rel is not None:
            subj, pred, obj, strength = rel
            rels.append((subj, pred, obj, strength, f"{subj} {pred} {obj}"))
    return entities, rels


def _merge_graphs(url, unit_graphs):
    """merge.ts:13-86, literal."""
    id_map = {}
    merged = {}
    for unit_id, entities, _ in unit_graphs:
        for (name, etype), ent in entities.items():
            key = f"{name}::{etype}"
            existing = merged.get(key)
            source = {
                "id": stable_id(unit_id, "src-e", name, etype),
                "unit_id": unit_id,
            }
            if existing is not None:
                id_map[ent.id] = existing.id
                existing.sources.append(source)
                if not existing.description and ent.description:
                    existing.description = ent.description
                continue
            ent.sources.append(source)
            merged[key] = ent
            id_map[ent.id] = ent.id

    merged_rels = {}
    order = []
    for unit_id, entities, rels in unit_graphs:
        by_name = {}
        for (name, etype), ent in entities.items():
            by_name.setdefault(name, id_map[ent.id])
        for subj, pred, obj, strength, desc in rels:
            src, dst = by_name.get(subj), by_name.get(obj)
            if src is None or dst is None:
                continue
            a, b = (src, dst) if src <= dst else (dst, src)
            source = {
                "id": stable_id(unit_id, "src-r", subj, pred, obj),
                "unit_id": unit_id,
            }
            existing = merged_rels.get((a, b))
            if existing is not None:
                existing.sources.append(source)
                existing.strength = max(existing.strength, strength)
                if not existing.description and desc:
                    existing.description = desc
                continue
            rel = Rel(stable_id(url, "r", a, b), a, b, pred, desc, strength)
            rel.sources.append(source)
            merged_rels[(a, b)] = rel
            order.append((a, b))
    return list(merged.values()), [merged_rels[k] for k in order]


def _dedupe_doc(entities, rels):
    """dedupe.ts:253-366, literal O(n²)."""
    n = len(entities)
    parents = list(range(n))

    def find(i):
        while parents[i] != i:
            parents[i] = parents[parents[i]]
            i = parents[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if are_duplicates(
                entities[i].name, entities[i].type, entities[j].name, entities[j].type
            ):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parents[rj] = ri

    groups = defaultdict(list)
    for i in range(n):
        groups[find(i)].append(i)

    id_map = {}
    out_entities = []
    for group in sorted(groups.values(), key=lambda g: g[0]):
        members = [entities[i] for i in group]
        best = members[0]
        for cur in members[1:]:
            if len(cur.sources) != len(best.sources):
                best = cur if len(cur.sources) > len(best.sources) else best
                continue
            cd = len(normalize_ws(cur.description or ""))
            bd = len(normalize_ws(best.description or ""))
            if cd != bd:
                best = cur if cd > bd else best
                continue
            cn = len(" ".join(tokenize(cur.name)))
            bn = len(" ".join(tokenize(best.name)))
            if cn != bn:
                best = cur if cn > bn else best
                continue
            best = cur if cur.id < best.id else best
        # chooseCanonicalName
        unique_names = list(dict.fromkeys(
            normalize_ws(m.name) for m in members if normalize_ws(m.name)
        ))
        best_name = ""
        for cur in unique_names:
            if not best_name:
                best_name = cur
                continue
            bt = significant_tokens(tokenize(best_name))
            ct = significant_tokens(tokenize(cur))
            if len(ct) != len(bt):
                best_name = cur if len(ct) > len(bt) else best_name
                continue
            bl = len(" ".join(tokenize(best_name)))
            cl = len(" ".join(tokenize(cur)))
            if cl != bl:
                best_name = cur if cl > bl else best_name
                continue
            best_name = cur if cur < best_name else best_name
        best_desc = ""
        for m in members:
            d = normalize_ws(m.description or "")
            if len(d) > len(best_desc):
                best_desc = d
        canon = Entity(best.id, best_name or best.name, best.type, best_desc)
        seen = set()
        for m in members:
            id_map[m.id] = best.id
            for s in m.sources:
                if s["id"] not in seen:
                    seen.add(s["id"])
                    canon.sources.append(s)
        out_entities.append(canon)

    rel_map = {}
    order = []
    for rel in rels:
        src, dst = id_map.get(rel.source_id), id_map.get(rel.target_id)
        if not src or not dst or src == dst:
            continue
        a, b = (src, dst) if src <= dst else (dst, src)
        existing = rel_map.get((a, b))
        if existing is not None:
            existing.sources.extend(rel.sources)
            existing.strength = max(existing.strength, rel.strength)
            if len(normalize_ws(rel.description or "")) > len(
                normalize_ws(existing.description or "")
            ):
                existing.description = normalize_ws(rel.description)
                existing.pred = rel.pred
            continue
        nr = Rel(
            "",  # within-doc rel id unused; edge ids assigned corpus-wide
            a,
            b,
            rel.pred,
            normalize_ws(rel.description or ""),
            rel.strength,
        )
        nr.sources = list(rel.sources)
        rel_map[(a, b)] = nr
        order.append((a, b))
    return out_entities, [rel_map[k] for k in order], id_map


def simulate_corpus(pages_rows, chunk_tokens=DEFAULT_SEMANTIC_CHUNK_SIZE,
                    fuzzy=False):
    """pages rows (dicts with url/html) → (nodes, triples).

    nodes: {canonical_id: (name, type)}
    triples: set of (src_name, pred, dst_name, strength) with src/dst ordered
    by canonical id (matching the pipeline's undirected normalization).

    ``fuzzy=True`` replaces the exact (type, compact key) cross-doc rule with
    the literal O(n²) pairwise ``are_duplicates`` union-find (the within-file
    matchers of dedupe.ts:102-145 applied corpus-wide) — the naive oracle for
    the production blocking-key + CC linker.
    """
    all_entities = {}
    all_rels = []
    for row in sorted(pages_rows, key=lambda r: r["url"]):
        url = row["url"]
        html = row["html"]
        if isinstance(html, (bytes, bytearray)):
            html = bytes(html).decode("utf-8")
        text = html_to_markdown(html)
        if not text.strip():
            continue
        unit_graphs = []
        for index, (content, _, _) in enumerate(chunk_text_spans(text, chunk_tokens)):
            unit_id = stable_id(url, "u", index)
            entities, rels = _extract_unit(url, unit_id, content)
            unit_graphs.append((unit_id, entities, rels))
        ents, rels = _merge_graphs(url, unit_graphs)
        ents, rels, _ = _dedupe_doc(ents, rels)
        for e in ents:
            all_entities[e.id] = e
        for r in rels:
            edge_id = stable_id(url, "edge", r.source_id, r.target_id)
            all_rels.append((edge_id, r))

    id_map = {}
    canon_nodes = {}
    if fuzzy:
        # --- cross-doc fuzzy: O(n²) are_duplicates union-find ---------------
        ents = sorted(all_entities.values(), key=lambda e: e.id)
        parents = list(range(len(ents)))

        def find(i):
            while parents[i] != i:
                parents[i] = parents[parents[i]]
                i = parents[i]
            return i

        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                if are_duplicates(
                    ents[i].name, ents[i].type, ents[j].name, ents[j].type
                ):
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parents[rj] = ri
        groups = defaultdict(list)
        for i in range(len(ents)):
            groups[find(i)].append(ents[i])
        for members in groups.values():
            canonical = min(members, key=lambda e: e.id)
            for m in members:
                id_map[m.id] = canonical.id
            canon_nodes[canonical.id] = (canonical.name, canonical.type)
    else:
        # --- cross-doc: L12 exact (type, compact key), canonical = min id ---
        by_key = defaultdict(list)
        for e in all_entities.values():
            by_key[(e.type, compact_name_key(e.name))].append(e)
        for (etype, _key), members in by_key.items():
            canonical = min(members, key=lambda e: e.id)
            for m in members:
                id_map[m.id] = canonical.id
            canon_nodes[canonical.id] = (canonical.name, canonical.type)

    # relationship endpoint rewrite, self-loop delete, pair dedupe
    pair_map = {}
    for edge_id, r in sorted(all_rels, key=lambda t: t[0]):
        src, dst = id_map[r.source_id], id_map[r.target_id]
        if src == dst:
            continue
        a, b = (src, dst) if src <= dst else (dst, src)
        existing = pair_map.get((a, b))
        if existing is None:
            pair_map[(a, b)] = {
                "edge_id": edge_id,
                "pred": r.pred,
                "description": r.description,
                "strength": r.strength,
            }
            continue
        existing["strength"] = max(existing["strength"], r.strength)
        if edge_id < existing["edge_id"]:
            # first_value(id ASC) keeps the min-id row's attrs
            existing["edge_id"] = edge_id
            existing["pred"] = r.pred
            existing["description"] = r.description

    triples = set()
    for (a, b), rel in pair_map.items():
        triples.add(
            (canon_nodes[a][0], rel["pred"], canon_nodes[b][0], rel["strength"])
        )
    return canon_nodes, triples
