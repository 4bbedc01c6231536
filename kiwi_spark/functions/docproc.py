"""Per-document kernel: text → units → extracted graph → within-doc dedupe.

This is the document-sharded part of the pipeline (everything the reference
runs per file in apps/worker/workflows/process-file.ts steps build-units /
build-graph). It is a pure function of (url, text), so the Spark stage that
wraps it (operators.build_graph) is an Arrow-batched mapInPandas with NO
shuffle — each web page is processed exactly where its text row lives.

Semantics ported:
* units           — SemanticChunker @ 2000 tokens (chunking/factory.ts:40,50),
                    unit rows per packages/graph/src/unit.ts:27-63
* source chunks   — ≤150-token attribution sub-chunks (lib/source-chunk.ts:4,10-85)
* extraction      — deterministic grammar (functions/extract_grammar), output
                    contract of unit.ts:119-140; one Source per entity/rel per
                    unit; source_chunk_ids = overlapping sub-chunks, deduped,
                    capped at 8 (unit.ts:13,142-166)
* unknown-name edge drop — unit.ts:226-295
* mergeGraphs     — merge.ts:13-86 (entity key name::type keeps first id,
                    first non-empty description, concat sources; relationship
                    key undirected id pair, max strength, first non-empty desc)
* within-doc dedupe — dedupe.ts:253-366, with the O(n²) pair loop replaced by
                    lossless blocking keys + union-find (same transitive
                    closure; SURVEY §2.4 L4-L5) and canonical selection via
                    the total orders of dedupe.ts:147-220.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from .chunking import (
    DEFAULT_SEMANTIC_CHUNK_SIZE,
    DEFAULT_SOURCE_CHUNK_TOKENS,
    _TEXT,
    _split_into_segments,
    chunk_text,
    chunk_text_spans,
    resolve_spans,
)
from .extract_grammar import extract_sentence
from .source_chunks import (
    IMAGE_TAG_PATTERN,
    decode_xml,
    get_xml_attribute,
)
from .ids import stable_id
from .linking import (
    are_duplicates,
    blocking_keys,
    canonical_entity_sort_key,
    canonical_name_sort_key,
    normalize_ws,
    union_find_groups,
)

MAX_SOURCE_CHUNKS_PER_SOURCE = 8  # unit.ts:13


@dataclass
class DocGraph:
    url: str
    units: list[dict] = field(default_factory=list)
    entities: list[dict] = field(default_factory=list)
    relationships: list[dict] = field(default_factory=list)
    mentions: list[dict] = field(default_factory=list)  # Source rows


def _unit_spans_for_type(file_type: str, text: str, chunk_tokens: int):
    """Chunker selection by file type (chunking/factory.ts:42-96): the
    semantic types keep the byte-identity fast path; structured formats get
    their dedicated chunkers with spans resolved against the text."""
    from .chunkers_structured import CHUNKER_TABLE, chunk_for_type

    kind, _default = CHUNKER_TABLE.get(file_type, ("semantic", chunk_tokens))
    if kind == "semantic":
        return chunk_text_spans(text, chunk_tokens)
    return resolve_spans(text, chunk_for_type(file_type, text))


def _source_chunk_spans(
    content: str, max_tokens: int, file_type: str | None = None
) -> list[tuple]:
    """Source chunks with offsets: (text, start, end, type, image_id,
    image_key). Embedded ``<image id,key>`` tags are indivisible image
    chunks (lib/source-chunk.ts:6-85); plain text takes the fast path.

    Text regions split at `max_tokens` ONLY for the splittable file types
    (text/pdf/doc…, source-chunk.ts:7); everything else — html, markdown,
    json, sheets — keeps each region as a single chunk, matching
    createSourceChunks' should-split rule (source-chunk.ts:87-89)."""
    from .source_chunks import _should_split

    split = _should_split(file_type)

    def region_spans(piece: str) -> list[tuple[str, int, int]]:
        if split:
            return resolve_spans(piece, chunk_text(piece, max_tokens))
        stripped = piece.strip()
        if not stripped:
            return []
        start = piece.find(stripped)
        return [(stripped, start, start + len(stripped))]

    if "<image" not in content:
        return [
            (c, s, e, "text", None, None) for (c, s, e) in region_spans(content)
        ]
    out: list[tuple] = []

    def add_text(region_start: int, region_end: int) -> None:
        piece = content[region_start:region_end]
        for c, s, e in region_spans(piece):
            if c.strip():
                out.append(
                    (c, region_start + s, region_start + e, "text", None, None)
                )

    cursor = 0
    for match in IMAGE_TAG_PATTERN.finditer(content):
        add_text(cursor, match.start())
        attributes = match.group(1) or ""
        description = decode_xml(match.group(2) or "").strip()
        out.append(
            (
                description,
                match.start(),
                match.end(),
                "image",
                get_xml_attribute(attributes, "id"),
                get_xml_attribute(attributes, "key"),
            )
        )
        cursor = match.end()
    add_text(cursor, len(content))
    return out


def _overlapping_chunk_ids(spans: list[tuple], start: int, end: int) -> list[int]:
    ids = [
        i
        for i, span in enumerate(spans)
        if not (end <= span[1] or start >= span[2])
    ]
    # normalizeSourceChunkIds: dedupe (order-preserving), cap 8, single-chunk
    # fallback (unit.ts:142-166)
    out: list[int] = []
    for i in ids:
        if i not in out:
            out.append(i)
        if len(out) >= MAX_SOURCE_CHUNKS_PER_SOURCE:
            break
    if not out and len(spans) == 1:
        out = [0]
    return out


def process_document(
    url: str,
    text: str,
    chunk_tokens: int = DEFAULT_SEMANTIC_CHUNK_SIZE,
    source_chunk_tokens: int = DEFAULT_SOURCE_CHUNK_TOKENS,
    units_only: bool = False,
    file_type: str = "html",
) -> DocGraph:
    doc = DocGraph(url=url)
    unit_spans = _unit_spans_for_type(file_type, text, chunk_tokens)

    # --- per-unit extraction (unit.ts processUnit, deterministic) ---------
    unit_graphs: list[tuple[dict, dict, list]] = []  # (entities, rel_list)
    for unit_index, (content, u_start, u_end) in enumerate(unit_spans):
        unit_id = stable_id(url, "u", unit_index)
        source_chunks = _source_chunk_spans(
            content, source_chunk_tokens, file_type
        )
        doc.units.append(  # noqa: the units row is built in both modes
            {
                "unit_id": unit_id,
                "url": url,
                "unit_index": unit_index,
                "content": content,
                "start_offset": u_start,
                "end_offset": u_end,
                "source_chunks": [
                    {
                        "id": i,
                        "text": sc[0],
                        "start_offset": sc[1],
                        "end_offset": sc[2],
                        "type": sc[3],
                        "image_id": sc[4],
                        "image_key": sc[5],
                    }
                    for i, sc in enumerate(source_chunks)
                ],
            }
        )
        if units_only:  # chunking stage needs no extraction
            continue

        sentences: list[tuple[str, int, int]] = []
        cursor = 0
        for seg in _split_into_segments(content):
            if seg.kind != _TEXT:
                continue
            idx = content.find(seg.text, cursor)
            if idx >= 0:
                # exact match: advance past it so a verbatim-repeated
                # sentence resolves to ITS occurrence, not the first one
                sentences.append((seg.text, idx, idx + len(seg.text)))
                cursor = idx + len(seg.text)
                continue
            # sentence was whitespace-joined across lines; locate its head
            head = seg.text.split("\n", 1)[0][:40]
            idx = content.find(head, cursor)
            if idx < 0:
                idx = cursor
            sentences.append((seg.text, idx, idx + len(seg.text)))
            cursor = idx

        entities: dict[tuple[str, str], dict] = {}
        rels: list[dict] = []
        for sentence, s_start, s_end in sentences:
            spans, rel = extract_sentence(sentence)
            chunk_ids = _overlapping_chunk_ids(source_chunks, s_start, s_end)
            for name, etype, _, _ in spans:
                key = (name, etype)
                if key not in entities:
                    entities[key] = {
                        "id": stable_id(unit_id, "e", name, etype),
                        "name": name,
                        "type": etype,
                        "description": f"{name} is a {etype} mentioned in: {sentence}",
                        "source_chunk_ids": chunk_ids,
                    }
            if rel is not None:
                subj, pred, obj, strength = rel
                rels.append(
                    {
                        "source_name": subj,
                        "target_name": obj,
                        "description": f"{subj} {pred} {obj}",
                        "pred": pred,
                        "strength": strength,
                        "source_chunk_ids": chunk_ids,
                    }
                )
        unit_graphs.append((unit_id, entities, rels))

    if units_only:
        return doc

    # --- mergeGraphs across units (merge.ts) -------------------------------
    merged: dict[str, dict] = {}  # name::type → entity
    id_map: dict[str, str] = {}
    sources_by_entity: dict[str, list[dict]] = defaultdict(list)
    for unit_id, entities, _ in unit_graphs:
        for (name, etype), ent in entities.items():
            key = f"{name}::{etype}"
            source = {
                "source_id": stable_id(unit_id, "src-e", name, etype),
                "unit_id": unit_id,
                "description": ent["description"],
                "source_chunk_ids": ent["source_chunk_ids"],
            }
            existing = merged.get(key)
            if existing is not None:
                id_map[ent["id"]] = existing["id"]
                sources_by_entity[existing["id"]].append(source)
                if not existing["description"] and ent["description"]:
                    existing["description"] = ent["description"]
                continue
            merged[key] = {
                "id": ent["id"],
                "name": name,
                "type": etype,
                "description": ent["description"],
            }
            id_map[ent["id"]] = ent["id"]
            sources_by_entity[ent["id"]].append(source)

    # per-unit name→id for relationship endpoints (unknown names dropped)
    merged_rels: dict[tuple[str, str], dict] = {}
    for unit_id, entities, rels in unit_graphs:
        name_to_id = {
            (name, etype): id_map[ent["id"]] for (name, etype), ent in entities.items()
        }
        by_name = {}
        for (name, _etype), eid in name_to_id.items():
            by_name.setdefault(name, eid)
        for rel in rels:
            src = by_name.get(rel["source_name"])
            dst = by_name.get(rel["target_name"])
            if src is None or dst is None:
                continue
            a, b = (src, dst) if src <= dst else (dst, src)
            source = {
                "source_id": stable_id(
                    unit_id, "src-r", rel["source_name"], rel["pred"], rel["target_name"]
                ),
                "unit_id": unit_id,
                "description": rel["description"],
                "source_chunk_ids": rel["source_chunk_ids"],
            }
            existing = merged_rels.get((a, b))
            if existing is not None:
                existing["sources"].append(source)
                existing["strength"] = max(existing["strength"], rel["strength"])
                if not existing["description"] and rel["description"]:
                    existing["description"] = rel["description"]
                continue
            merged_rels[(a, b)] = {
                "id": stable_id(url, "r", a, b),
                "source_id": a,
                "target_id": b,
                "description": rel["description"],
                "pred": rel["pred"],
                "strength": rel["strength"],
                "sources": [source],
            }

    # --- within-doc dedupe (dedupe.ts) via lossless blocking + union-find --
    ents = list(merged.values())
    n = len(ents)
    key_buckets: dict[str, list[int]] = defaultdict(list)
    for i, ent in enumerate(ents):
        for key in blocking_keys(ent["name"], ent["type"]):
            key_buckets[key].append(i)
    pairs: set[tuple[int, int]] = set()
    for bucket in key_buckets.values():
        if len(bucket) < 2:
            continue
        for ai in range(len(bucket)):
            for bi in range(ai + 1, len(bucket)):
                a, b = bucket[ai], bucket[bi]
                if a > b:
                    a, b = b, a
                pairs.add((a, b))
    verified = [
        (a, b)
        for a, b in sorted(pairs)
        if are_duplicates(ents[a]["name"], ents[a]["type"], ents[b]["name"], ents[b]["type"])
    ]
    roots = union_find_groups(verified, n)
    groups: dict[int, list[int]] = defaultdict(list)
    for i in range(n):
        groups[roots[i]].append(i)

    entity_id_map: dict[str, str] = {}
    for group in sorted(groups.values(), key=lambda g: g[0]):
        members = [ents[i] for i in group]
        canonical = max(
            members,
            key=lambda e: canonical_entity_sort_key(
                len(sources_by_entity[e["id"]]), e["description"], e["name"], e["id"]
            ),
        )
        # chooseCanonicalName over distinct ws-normalized names (dedupe.ts:176-211)
        distinct_names = list(dict.fromkeys(normalize_ws(m["name"]) for m in members if normalize_ws(m["name"])))
        best_name = max(distinct_names, key=canonical_name_sort_key) if distinct_names else canonical["name"]
        best_desc = max(
            (normalize_ws(m["description"] or "") for m in members), key=len
        )
        all_sources = []
        seen_src = set()
        for m in members:
            for s in sources_by_entity[m["id"]]:
                if s["source_id"] not in seen_src:
                    seen_src.add(s["source_id"])
                    all_sources.append(s)
            entity_id_map[m["id"]] = canonical["id"]
        doc.entities.append(
            {
                "entity_id": canonical["id"],
                "url": url,
                "name": best_name or canonical["name"],
                "type": canonical["type"],
                "description": best_desc,
                "n_sources": len(all_sources),
            }
        )
        for s in all_sources:
            doc.mentions.append(
                {
                    "mention_id": s["source_id"],
                    "entity_id": canonical["id"],
                    "edge_id": None,
                    "unit_id": s["unit_id"],
                    "url": url,
                    "description": s["description"],
                    "source_chunk_ids": s["source_chunk_ids"],
                }
            )

    # relationship rewrite + undirected dedupe (dedupe.ts:314-358)
    rel_out: dict[tuple[str, str], dict] = {}
    # iterate in insertion (unit) order — matches the reference's
    # relationship loop order (dedupe.ts:316), which decides length-tie wins
    for (a, b), rel in merged_rels.items():
        src = entity_id_map.get(rel["source_id"])
        dst = entity_id_map.get(rel["target_id"])
        if not src or not dst or src == dst:
            continue
        lo, hi = (src, dst) if src <= dst else (dst, src)
        existing = rel_out.get((lo, hi))
        if existing is not None:
            existing["sources"].extend(rel["sources"])
            existing["strength"] = max(existing["strength"], rel["strength"])
            if len(normalize_ws(rel["description"] or "")) > len(
                normalize_ws(existing["description"] or "")
            ):
                existing["description"] = normalize_ws(rel["description"])
                existing["pred"] = rel["pred"]
            continue
        rel_out[(lo, hi)] = {
            "id": stable_id(url, "edge", lo, hi),
            "src_id": lo,
            "dst_id": hi,
            "description": normalize_ws(rel["description"] or ""),
            "pred": rel["pred"],
            "strength": rel["strength"],
            "sources": list(rel["sources"]),
        }

    for (lo, hi), rel in rel_out.items():
        seen_src = set()
        uniq = []
        for s in rel["sources"]:
            if s["source_id"] not in seen_src:
                seen_src.add(s["source_id"])
                uniq.append(s)
        doc.relationships.append(
            {
                "edge_id": rel["id"],
                "url": url,
                "src_id": lo,
                "dst_id": hi,
                "pred": rel["pred"],
                "description": rel["description"],
                "strength": rel["strength"],
                "n_sources": len(uniq),
            }
        )
        for s in uniq:
            doc.mentions.append(
                {
                    "mention_id": s["source_id"],
                    "entity_id": None,
                    "edge_id": rel["id"],
                    "unit_id": s["unit_id"],
                    "url": url,
                    "description": s["description"],
                    "source_chunk_ids": s["source_chunk_ids"],
                }
            )

    return doc
