"""PDF table reconstruction — the "lines" strategy of the reference's
loader/pdf/table.ts (VERDICT r4 #3), over the positioned runs the layout
pass in ``pdf_text`` already produces.

Pipeline (pure geometry, the pdfplumber lattice algorithm the reference
implements):

1. **Drawing edges** from the content stream's path operators
   (``m``/``l``/``re`` + the stroke/fill flushes ``S s f F f* B B* b b*``,
   CTM tracked through ``q``/``Q``/``cm`` — content.ts:200-330,
   pathToEdges:660-760). Near-axis segments become vertical/horizontal
   edges (pointsToEdge tolerances).
2. **Snap + join** — edges cluster to their average coordinate within
   SNAP_TOLERANCE and colinear fragments join within JOIN_TOLERANCE
   (tableMergeEdges/tableSnapEdgesBy/tableJoinEdgeGroup,
   table.ts:1330-1458).
3. **Intersections → cells** — v×h crossings within
   INTERSECTION_TOLERANCE; each point's minimal bottom-right rectangle
   whose four corners are edge-connected becomes a cell
   (tableEdgesToIntersections/tableIntersectionsToCells,
   table.ts:1542-1657).
4. **Cells → tables** — corner-sharing transitive grouping
   (tableCellsToTables:1658-1712), filtered to ≥2 distinct rows and
   columns (tableFilterTablesByStructure:1294).
5. **Rows + text** — cells grouped by top coordinate into a row grid over
   the union of column x0s (tableGetRowsOrCols:1830-1860); a cell's text
   is the runs whose center lies inside it, in reading order
   (tableExtractRows:1962).
6. **Markdown** — ``| a | b |`` pipes with a ``---`` separator under the
   first dense row; leading sparse rows become caption lines; pipes in
   cells escaped (tableRowsToMarkdown:2095-2133,
   escapeMarkdownTableCell:962).

Scoped deviations (documented, COVERAGE.md): the reference's strict-mode
ladder (lines_strict → rotated/dense-grid fallbacks → text-alignment
strategy) collapses here to the single "lines" strategy accepting both
line- and rect-sourced edges — the fallbacks exist to recover tables our
acceptance already covers; the text-alignment strategy and rotated-table
transposition need per-glyph metrics from the unported rasterizer half.
Coordinates are top-down (top = page_height − y), matching table.ts.
"""

from __future__ import annotations

import re

EDGE_SNAP_TOLERANCE = 3.0
EDGE_MIN_LENGTH = 6.0
SNAP_TOLERANCE = 3.0
JOIN_TOLERANCE = 3.0
EDGE_MIN_LENGTH_FINAL = 3.0
EDGE_MIN_LENGTH_PREFILT = 1.0
INTERSECTION_TOLERANCE = 3.0
POINT_EQ = 0.001
MIN_ROWS = 2
MIN_COLS = 2
MAX_COLS = 12


# --------------------------------------------------------------------------
# 1. drawing-edge extraction (content.ts path operators)
# --------------------------------------------------------------------------

def _mat_mul(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _xform(m, x, y):
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


def _points_to_edge(p0, p1, source):
    dx, dy = abs(p1[0] - p0[0]), abs(p1[1] - p0[1])
    if dx <= EDGE_SNAP_TOLERANCE and dy >= EDGE_MIN_LENGTH:
        x = (p0[0] + p1[0]) / 2.0
        return {
            "orient": "v", "x0": x, "x1": x,
            "y_min": min(p0[1], p1[1]), "y_max": max(p0[1], p1[1]),
            "source": source,
        }
    if dy <= EDGE_SNAP_TOLERANCE and dx >= EDGE_MIN_LENGTH:
        y = (p0[1] + p1[1]) / 2.0
        return {
            "orient": "h", "y_min": y, "y_max": y,
            "x0": min(p0[0], p1[0]), "x1": max(p0[0], p1[0]),
            "source": source,
        }
    return None


_GFX_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.|\([^)]*\))*\)|<[0-9A-Fa-f\s]*>"
    rb"|/[^\s/\[\]()<>{}]*|\[|\]"
    rb"|[-+.\d][-+.\d]*"
    rb"|[A-Za-z'\"*]+"
)


def extract_drawing_edges(content: bytes, page_height: float) -> list[dict]:
    """Axis-aligned stroked/filled segments as table edges, in TOP-DOWN
    page coordinates: {orient, x0, x1, top, bottom, source}."""
    ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    stack: list[tuple] = []
    operands: list[bytes] = []
    current: tuple | None = None
    subpath_start: tuple | None = None
    segments: list[tuple] = []   # (p0, p1, source) in user space
    rects: list[tuple] = []      # (x, y, w, h)
    edges: list[dict] = []

    def nums(n):
        vals = []
        for tok in operands[-n:]:
            try:
                vals.append(float(tok))
            except ValueError:
                return None
        return vals if len(vals) == n else None

    def flush():
        nonlocal segments, rects
        for p0, p1, source in segments:
            edge = _points_to_edge(_xform(ctm, *p0), _xform(ctm, *p1), source)
            if edge:
                edges.append(edge)
        for x, y, w, h in rects:
            pts = [
                _xform(ctm, x, y), _xform(ctm, x + w, y),
                _xform(ctm, x + w, y + h), _xform(ctm, x, y + h),
            ]
            for i in range(4):
                edge = _points_to_edge(pts[i], pts[(i + 1) % 4], "rect")
                if edge:
                    edges.append(edge)
        segments, rects = [], []

    for match in _GFX_TOKEN_RE.finditer(content):
        token = match.group(0)
        first = token[:1]
        if (first in (b"(", b"<", b"/", b"[", b"]", b"-", b"+", b".")
                or first.isdigit()):
            operands.append(token)
            continue
        op = token
        if op == b"q":
            stack.append(ctm)
        elif op == b"Q":
            ctm = stack.pop() if stack else (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
        elif op == b"cm":
            vals = nums(6)
            if vals:
                ctm = _mat_mul(tuple(vals), ctm)
        elif op == b"m":
            vals = nums(2)
            if vals:
                current = subpath_start = tuple(vals)
        elif op == b"l":
            vals = nums(2)
            if vals and current is not None:
                segments.append((current, tuple(vals), "line"))
                current = tuple(vals)
        elif op in (b"c", b"v", b"y"):
            need = {b"c": 6, b"v": 4, b"y": 4}[op]
            vals = nums(need)
            if vals and current is not None:
                end = (vals[-2], vals[-1])
                segments.append((current, end, "curve"))
                current = end
        elif op == b"re":
            vals = nums(4)
            if vals:
                rects.append(tuple(vals))
                current = subpath_start = (vals[0], vals[1])
        elif op == b"h":
            if current is not None and subpath_start is not None:
                segments.append((current, subpath_start, "line"))
                current = subpath_start
        elif op in (b"S", b"f", b"F", b"f*", b"B", b"B*"):
            flush()
            current = subpath_start = None
        elif op in (b"s", b"b", b"b*"):
            if current is not None and subpath_start is not None:
                segments.append((current, subpath_start, "line"))
            flush()
            current = subpath_start = None
        elif op in (b"n", b"W", b"W*"):
            segments, rects = [], []
            current = subpath_start = None
        elif op == b"BT":
            # text object: drop any dangling path state
            segments, rects = [], []
            current = subpath_start = None
        operands.clear()

    # to top-down coordinates
    out = []
    for e in edges:
        out.append({
            "orient": e["orient"],
            "x0": e["x0"], "x1": e["x1"],
            "top": page_height - e["y_max"],
            "bottom": page_height - e["y_min"],
            "source": e["source"],
        })
    return out


# --------------------------------------------------------------------------
# 2. snap / join / filter (table.ts:1330-1458, 2040)
# --------------------------------------------------------------------------

def _edge_len(e):
    return (e["bottom"] - e["top"]) if e["orient"] == "v" else (e["x1"] - e["x0"])


def filter_edges(edges, orient="", min_length=0.0):
    return [
        e for e in edges
        if (not orient or e["orient"] == orient) and _edge_len(e) >= min_length
    ]


def _snap_by(edges, attr, tolerance):
    if not edges or tolerance <= 0:
        return [dict(e) for e in edges]
    ordered = sorted(edges, key=lambda e: e[attr])
    clusters, cluster, last = [], [], None
    for e in ordered:
        value = e[attr]
        if not cluster or value <= last + tolerance:
            cluster.append(dict(e))
        else:
            clusters.append(cluster)
            cluster = [dict(e)]
        last = value
    if cluster:
        clusters.append(cluster)
    out = []
    for cluster in clusters:
        avg = sum(e[attr] for e in cluster) / len(cluster)
        for e in cluster:
            delta = avg - e[attr]
            if e["orient"] == "v":
                e["x0"] += delta
                e["x1"] += delta
            else:
                e["top"] += delta
                e["bottom"] += delta
            out.append(e)
    return out


def _join_group(edges, orient, tolerance):
    lo, hi = ("top", "bottom") if orient == "v" else ("x0", "x1")
    ordered = sorted(edges, key=lambda e: e[lo])
    joined = [dict(ordered[0])]
    for e in ordered[1:]:
        last = joined[-1]
        if e[lo] <= last[hi] + tolerance:
            if e[hi] > last[hi]:
                last[hi] = e[hi]
        else:
            joined.append(dict(e))
    return joined


def merge_edges(edges):
    snapped = _snap_by(
        [e for e in edges if e["orient"] == "v"], "x0", SNAP_TOLERANCE
    ) + _snap_by(
        [e for e in edges if e["orient"] == "h"], "top", SNAP_TOLERANCE
    )
    coord = lambda e: e["top"] if e["orient"] == "h" else e["x0"]
    ordered = sorted(snapped, key=lambda e: (e["orient"], coord(e)))
    groups: list[list[dict]] = []
    for e in ordered:
        if (
            groups
            and groups[-1][-1]["orient"] == e["orient"]
            and abs(coord(groups[-1][-1]) - coord(e)) <= POINT_EQ
        ):
            groups[-1].append(e)
        else:
            groups.append([e])
    out = []
    for group in groups:
        out.extend(_join_group(group, group[0]["orient"], JOIN_TOLERANCE))
    return out


# --------------------------------------------------------------------------
# 3. intersections → cells (table.ts:1542-1657)
# --------------------------------------------------------------------------

def _pt_key(x, y):
    return (round(x, 6), round(y, 6))


def edges_to_intersections(edges, tolerance=INTERSECTION_TOLERANCE):
    verticals = sorted(
        filter_edges(edges, "v"), key=lambda e: (e["x0"], e["top"])
    )
    horizontals = sorted(
        filter_edges(edges, "h"), key=lambda e: (e["top"], e["x0"])
    )
    inter: dict[tuple, dict] = {}
    for v in verticals:
        for h in horizontals:
            if (
                v["top"] <= h["top"] + tolerance
                and v["bottom"] >= h["top"] - tolerance
                and v["x0"] >= h["x0"] - tolerance
                and v["x0"] <= h["x1"] + tolerance
            ):
                key = _pt_key(v["x0"], h["top"])
                entry = inter.setdefault(
                    key, {"x": v["x0"], "y": h["top"], "v": [], "h": []}
                )
                entry["v"].append(id(v))
                entry["h"].append(id(h))
    return inter


def intersections_to_cells(inter):
    points = sorted(inter.values(), key=lambda p: (p["x"], p["y"]))

    def connects(pa, pb):
        ea = inter.get(_pt_key(pa["x"], pa["y"]))
        eb = inter.get(_pt_key(pb["x"], pb["y"]))
        if not ea or not eb:
            return False
        if abs(pa["x"] - pb["x"]) <= POINT_EQ:
            return bool(set(ea["v"]) & set(eb["v"]))
        if abs(pa["y"] - pb["y"]) <= POINT_EQ:
            return bool(set(ea["h"]) & set(eb["h"]))
        return False

    cells = []
    for i, point in enumerate(points):
        rest = points[i + 1:]
        below = [p for p in rest if abs(p["x"] - point["x"]) <= POINT_EQ]
        right = [p for p in rest if abs(p["y"] - point["y"]) <= POINT_EQ]
        found = None
        for bp in below:
            if not connects(point, bp):
                continue
            for rp in right:
                if not connects(point, rp):
                    continue
                br = {"x": rp["x"], "y": bp["y"]}
                if (
                    _pt_key(br["x"], br["y"]) in inter
                    and connects(br, rp)
                    and connects(br, bp)
                ):
                    found = {
                        "x0": point["x"], "top": point["y"],
                        "x1": br["x"], "bottom": br["y"],
                    }
                    break
            if found:
                break
        if found:
            cells.append(found)
    return cells


# --------------------------------------------------------------------------
# 4. cells → tables (table.ts:1658-1712, 1294)
# --------------------------------------------------------------------------

def cells_to_tables(cells):
    remaining = list(cells)
    tables, current, corners = [], [], set()

    def cell_corners(c):
        return [
            _pt_key(c["x0"], c["top"]), _pt_key(c["x0"], c["bottom"]),
            _pt_key(c["x1"], c["top"]), _pt_key(c["x1"], c["bottom"]),
        ]

    while remaining:
        initial = len(current)
        next_remaining = []
        for cell in remaining:
            cc = cell_corners(cell)
            if not current:
                corners.update(cc)
                current.append(cell)
            elif any(k in corners for k in cc):
                corners.update(cc)
                current.append(cell)
            else:
                next_remaining.append(cell)
        if len(current) == initial:
            if len(current) > 1:
                tables.append(current)
            current, corners = [], set()
        remaining = next_remaining
    if len(current) > 1:
        tables.append(current)

    def min_corner(table):
        return (
            min(c["top"] for c in table), min(c["x0"] for c in table)
        )

    return sorted(tables, key=min_corner)


def _distinct(values, tolerance=POINT_EQ):
    count, last = 0, None
    for v in sorted(values):
        if last is None or abs(v - last) > tolerance:
            count += 1
            last = v
    return count


def filter_tables_by_structure(tables, min_rows=MIN_ROWS, min_cols=MIN_COLS):
    return [
        t for t in tables
        if _distinct([c["top"] for c in t]) >= min_rows
        and _distinct([c["x0"] for c in t]) >= min_cols
    ]


# --------------------------------------------------------------------------
# 5. row grid + cell text (table.ts:1830-1990)
# --------------------------------------------------------------------------

def table_rows(cells):
    """Group cells into row lists over the union of column x0s; missing
    grid positions are None (spanning cells occupy their origin slot)."""
    ordered = sorted(cells, key=lambda c: (c["top"], c["x0"]))
    col_xs = sorted({round(c["x0"], 6) for c in cells})
    rows_map: dict[float, dict] = {}
    order = []
    for cell in ordered:
        key = round(cell["top"], 6)
        if key not in rows_map:
            rows_map[key] = {}
            order.append(key)
        rows_map[key][round(cell["x0"], 6)] = cell
    return [
        [rows_map[k].get(x) for x in col_xs] for k in order
    ]


def extract_rows_text(cells, runs, page_height):
    """rows of cell text from positioned runs (pdf_text._Region, PDF
    coords): a run belongs to the cell containing its center
    (tableExtractRows inBBox)."""
    rows = table_rows(cells)

    def in_bbox(run, bbox):
        cx = (run.left + run.right) / 2.0
        cy = page_height - run.center_y     # top-down
        return (
            bbox["x0"] <= cx < bbox["x1"] and bbox["top"] <= cy < bbox["bottom"]
        )

    out = []
    for row in rows:
        out_row = []
        for cell in row:
            if cell is None:
                out_row.append(None)
                continue
            members = [r for r in runs if in_bbox(r, cell)]
            members.sort(key=lambda r: (-round(r.y, 1), r.left, r.seq))
            text = " ".join(m.text for m in members)
            out_row.append(re.sub(r"\s+", " ", text).strip())
        out.append(out_row)
    return out


# --------------------------------------------------------------------------
# 5b. row tidying + tabular-density gate (table.ts:2136-2239, scoped)
# --------------------------------------------------------------------------

def remove_empty_columns(rows):
    """Drop columns with no non-whitespace content in any row
    (spacer/rule columns) — table.ts removeEmptyTableColumns. Rows from
    ``extract_rows_text`` are uniform width (the grid spans the union of
    column x0s)."""
    if not rows:
        return rows
    keep = [
        c
        for c in range(len(rows[0]))
        if any((r[c] or "").strip() for r in rows)
    ]
    return [[r[c] for c in keep] for r in rows]


def is_likely_tabular(rows, max_cols=MAX_COLS, min_cell_density=0.03):
    """table.ts tableIsLikelyTabular — rejects boxed prose masquerading
    as a grid: needs ≥2 rows/cols, a minimum filled-cell density, and no
    single cell carrying ≥85% of all characters when almost everything
    else is empty (the dominant-cell rule — defense in depth here, since
    rows_to_markdown's header requirement also rejects those shapes)."""
    if len(rows) < 2:
        return False
    n_cols = max((len(r) for r in rows), default=0)
    if n_cols < 2 or n_cols > max_cols:
        return False
    non_empty = 0
    total_chars = 0
    max_chars = 0
    for row in rows:
        for cell in row:
            text = re.sub(r"\s+", " ", cell or "").strip()
            if not text:
                continue
            non_empty += 1
            total_chars += len(text)
            max_chars = max(max_chars, len(text))
    if non_empty < 2:
        return False
    if non_empty / (len(rows) * n_cols) < min_cell_density:
        return False
    if non_empty <= 2 and total_chars > 0 and max_chars >= total_chars * 0.85:
        return False
    return True


# --------------------------------------------------------------------------
# 6. markdown (table.ts:2095-2133)
# --------------------------------------------------------------------------

def _escape_cell(value):
    return value.replace("|", "\\|").strip()


def rows_to_markdown(rows, max_cols=MAX_COLS):
    trimmed = [
        [(c or "").strip() for c in row]
        for row in rows
        if any((c or "").strip() for c in row)
    ]
    if len(trimmed) < 2:
        return None
    n_cols = max(len(r) for r in trimmed)
    if n_cols < 2 or n_cols > max_cols:
        return None
    normalized = [
        [_escape_cell(row[i] if i < len(row) else "") for i in range(n_cols)]
        for row in trimmed
    ]
    header_idx = next(
        (
            i for i, row in enumerate(normalized)
            if len([c for c in row if c]) >= min(2, n_cols)
        ),
        -1,
    )
    sparse_kv = (
        n_cols == 2
        and header_idx > 1
        and all(row[0] and not row[1] for row in normalized[:header_idx])
    )
    if sparse_kv:
        header_idx = 0
    if header_idx < 0 or len(normalized) - header_idx < 2:
        return None
    captions = [
        " ".join(c for c in row if c)
        for row in normalized[:header_idx]
    ]
    captions = [c for c in captions if c]
    header = normalized[header_idx]
    sep = ["---"] * n_cols
    md = "\n".join(
        [
            "| " + " | ".join(header) + " |",
            "| " + " | ".join(sep) + " |",
            *(
                "| " + " | ".join(row) + " |"
                for row in normalized[header_idx + 1:]
            ),
        ]
    )
    return ("\n".join(captions) + "\n\n" + md) if captions else md


# --------------------------------------------------------------------------
# entry: detect tables on one page
# --------------------------------------------------------------------------

def detect_tables(content: bytes, runs, page_height: float) -> list[dict]:
    """[{bbox: {x0, top, x1, bottom}, markdown: str}] for every drawn-grid
    table on the page, in reading order. ``runs`` are pdf_text._Region
    objects (PDF coordinates, bottom-up)."""
    raw = extract_drawing_edges(content, page_height)
    edges = filter_edges(
        merge_edges(filter_edges(raw, min_length=EDGE_MIN_LENGTH_PREFILT)),
        min_length=EDGE_MIN_LENGTH_FINAL,
    )
    if not edges:
        return []
    inter = edges_to_intersections(edges)
    tables = filter_tables_by_structure(
        cells_to_tables(intersections_to_cells(inter))
    )
    out = []
    for cells in tables:
        rows = remove_empty_columns(extract_rows_text(cells, runs, page_height))
        if not is_likely_tabular(rows):
            continue
        markdown = rows_to_markdown(rows)
        if not markdown:
            continue
        out.append(
            {
                "bbox": {
                    "x0": min(c["x0"] for c in cells),
                    "top": min(c["top"] for c in cells),
                    "x1": max(c["x1"] for c in cells),
                    "bottom": max(c["bottom"] for c in cells),
                },
                "markdown": markdown,
            }
        )
    return out
