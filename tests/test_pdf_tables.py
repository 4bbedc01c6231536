"""PDF drawn-grid table reconstruction (functions/pdf_tables.py — the
loader/pdf/table.ts "lines" pipeline): byte-built fixtures, hand-derived
expected pipe tables."""

from kiwi_spark.functions.pdf_tables import (
    cells_to_tables,
    detect_tables,
    edges_to_intersections,
    extract_drawing_edges,
    filter_tables_by_structure,
    intersections_to_cells,
    merge_edges,
    rows_to_markdown,
)
from kiwi_spark.functions.pdf_text import pdf_to_text

from tests.test_pdf_text import make_pdf

H = 792.0  # default US-Letter page height (no MediaBox in make_pdf)


def _grid_stream() -> str:
    """3×3 grid drawn with stroked line paths at x∈{100,200,300,400},
    y∈{600,630,660,690}, plus heading above and a footer below."""
    lines = []
    for x in (100, 200, 300, 400):
        lines.append(f"{x} 600 m {x} 690 l S")
    for y in (600, 630, 660, 690):
        lines.append(f"100 {y} m 400 {y} l S")
    text = (
        "BT /F1 12 Tf 72 720 Td (Inventory) Tj ET "
        "BT /F1 12 Tf 110 670 Td (Name) Tj 100 0 Td (Qty) Tj 100 0 Td (Price) Tj ET "
        "BT /F1 12 Tf 110 640 Td (Widget) Tj 100 0 Td (2) Tj 100 0 Td (3.50) Tj ET "
        "BT /F1 12 Tf 110 610 Td (Gadget) Tj 100 0 Td (10) Tj 100 0 Td (1.25) Tj ET "
        "BT /F1 12 Tf 72 560 Td (End of report.) Tj ET"
    )
    return " ".join(lines) + " " + text


def test_drawn_grid_renders_pipe_table_end_to_end():
    """Hand-derived expectation: the 9 cells become a markdown pipe table
    in reading-order position; heading/footer text flows around it."""
    text = pdf_to_text(make_pdf([_grid_stream()]))
    assert text == (
        ":::PAGE-1:::\n\n"
        "Inventory\n"
        "\n"
        "| Name | Qty | Price |\n"
        "| --- | --- | --- |\n"
        "| Widget | 2 | 3.50 |\n"
        "| Gadget | 10 | 1.25 |\n"
        "\n"
        "End of report."
    )


def test_rect_drawn_grid_detected():
    """A 2×2 grid drawn as four stroked rectangles (the most common
    producer pattern) yields the same cell structure."""
    rects = []
    for x in (100, 200):
        for y in (600, 630):
            rects.append(f"{x} {y} 100 30 re S")
    content = (" ".join(rects)).encode("latin-1")
    edges = merge_edges(extract_drawing_edges(content, H))
    cells = intersections_to_cells(edges_to_intersections(edges))
    tables = filter_tables_by_structure(cells_to_tables(cells))
    assert len(tables) == 1 and len(tables[0]) == 4
    tops = sorted({round(c["top"], 1) for c in tables[0]})
    assert tops == [H - 660, H - 630]


def test_snap_and_join_tolerances():
    """Edges misaligned within the 3pt snap tolerance and split segments
    within the join tolerance still form one grid (table.ts:1330-1458)."""
    parts = [
        # vertical x=100 split into two segments with a 2pt gap; x=201.5
        # should snap onto the x=200 family? No — snap clusters within 3pt
        # of each OTHER; 200 and 201.5 merge to their average.
        "100 600 m 100 644 l S", "100 646 m 100 690 l S",
        "200 600 m 200 690 l S", "201.5 600 m 201.5 690 l S",
        "300 600 m 300 690 l S",
        "100 600 m 300 600 l S",
        "100 645 m 300 645 l S",
        "100 690 m 300 690 l S",
    ]
    content = " ".join(parts).encode("latin-1")
    edges = merge_edges(extract_drawing_edges(content, H))
    verticals = [e for e in edges if e["orient"] == "v"]
    assert len(verticals) == 3  # joined + snapped
    cells = intersections_to_cells(edges_to_intersections(edges))
    tables = filter_tables_by_structure(cells_to_tables(cells))
    assert len(tables) == 1 and len(tables[0]) == 4


def test_missing_cell_renders_empty():
    """A grid with a spanning hole: missing grid slots render as empty
    cells, not dropped columns."""
    rows = [["Name", "Qty"], ["Widget", None], ["Gadget", "10"]]
    md = rows_to_markdown(rows)
    assert md == (
        "| Name | Qty |\n| --- | --- |\n| Widget |  |\n| Gadget | 10 |"
    )


def test_caption_and_sparse_header_rules():
    # caption rows before the first dense row join into caption lines
    md = rows_to_markdown([["Table 1", ""], ["a", "b"], ["1", "2"]])
    assert md == "Table 1\n\n| a | b |\n| --- | --- |\n| 1 | 2 |"
    # 2-col sparse key-value shape: header stays at row 0
    md = rows_to_markdown([["k1", ""], ["k2", ""], ["a", "b"], ["c", "d"]])
    assert md.startswith("| k1 |  |")
    # single column / single row → not a table
    assert rows_to_markdown([["only"], ["rows"]]) is None
    assert rows_to_markdown([["a", "b"]]) is None


def test_pipe_escaping_in_cells():
    md = rows_to_markdown([["a|b", "c"], ["d", "e"]])
    assert md.splitlines()[0] == "| a\\|b | c |"


def test_no_edges_no_tables_text_unchanged():
    stream = "BT /F1 12 Tf 72 720 Td (Just prose, no grid.) Tj ET"
    text = pdf_to_text(make_pdf([stream]))
    assert text == ":::PAGE-1:::\n\nJust prose, no grid."


def test_cm_transform_applies_to_edges():
    """Edges drawn under a translated CTM land at transformed positions
    (content.ts tracks the matrix through q/cm/Q)."""
    parts = ["q 1 0 0 1 50 100 re", "Q"]
    # rectangle at (100,600) drawn inside a q 1 0 0 1 +10 +20 cm block
    content = b"q 1 0 0 1 10 20 cm 100 600 100 30 re S Q"
    edges = extract_drawing_edges(content, H)
    xs = sorted({round(e["x0"], 1) for e in edges if e["orient"] == "v"})
    assert xs == [110.0, 210.0]
    tops = sorted({round(e["top"], 1) for e in edges if e["orient"] == "h"})
    assert tops == [round(H - 650, 1), round(H - 620, 1)]


def test_even_odd_fill_operators_flush_edges():
    """f*/B*/b* painted grids (common producer output) must flush their
    rectangles as edges — and n must discard the pending path."""
    content = b"100 600 100 30 re 100 630 100 30 re f*"
    edges = extract_drawing_edges(content, H)
    assert len([e for e in edges if e["orient"] == "h"]) == 4
    # b* closes and paints
    content = b"100 600 m 200 600 l 200 630 l 100 630 l b*"
    edges = extract_drawing_edges(content, H)
    assert len(edges) == 4  # three drawn + the closing segment
    # n = no-op painting: nothing flushed
    assert extract_drawing_edges(b"100 600 100 30 re n", H) == []


def test_sentinel_sharing_a_line_with_caption_run():
    """A run whose baseline falls within 1pt of the table top merges into
    the sentinel's assembled line; the expansion must still emit both the
    text and the pipe table, never the raw NUL sentinel."""
    stream = (
        _grid_stream()
        + " BT /F1 12 Tf 420 690 Td (SIDE NOTE) Tj ET"
    )
    text = pdf_to_text(make_pdf([stream]))
    assert "\x00" not in text
    assert "SIDE NOTE" in text
    assert "| Name | Qty | Price |" in text


def test_spacer_column_dropped():
    """A grid with an all-empty middle column (spacer rule) renders
    without the empty column (table.ts removeEmptyTableColumns)."""
    lines = []
    for x in (100, 200, 220, 320):   # narrow empty gutter 200-220
        lines.append(f"{x} 600 m {x} 660 l S")
    for y in (600, 630, 660):
        lines.append(f"100 {y} m 320 {y} l S")
    text = (
        "BT /F1 12 Tf 110 640 Td (Name) Tj ET "
        "BT /F1 12 Tf 230 640 Td (Qty) Tj ET "
        "BT /F1 12 Tf 110 610 Td (Widget) Tj ET "
        "BT /F1 12 Tf 230 610 Td (7) Tj ET "
    )
    stream = " ".join(lines) + " " + text
    out = pdf_to_text(make_pdf([stream]))
    assert "| Name | Qty |" in out
    assert "|  |" not in out


def test_boxed_prose_rejected_by_density_gate():
    """A 2×2 decorative grid where one cell holds ALL the text (boxed
    prose) must NOT render as a table — here the empty-column drop
    collapses it below 2 columns; the dominant-cell rule itself is
    unit-tested below — and the text flows as normal lines instead."""
    lines = []
    for x in (100, 250, 400):
        lines.append(f"{x} 600 m {x} 690 l S")
    for y in (600, 645, 690):
        lines.append(f"100 {y} m 400 {y} l S")
    text = "BT /F1 12 Tf 110 660 Td (A long paragraph of boxed prose text here) Tj ET"
    out = pdf_to_text(make_pdf([" ".join(lines) + " " + text]))
    assert "|" not in out
    assert "A long paragraph of boxed prose" in out


def test_is_likely_tabular_rules_direct():
    from kiwi_spark.functions.pdf_tables import is_likely_tabular

    # dominant-cell rule: 2 filled cells, one carrying >=85% of chars
    assert not is_likely_tabular(
        [["A very long paragraph of prose living in one cell", None],
         [None, "x"]]
    )
    # same shape with balanced content passes
    assert is_likely_tabular([["alpha", None], [None, "bravo"]])
    # density floor: 1 filled cell in a 3x4 grid (< 2 non-empty)
    assert not is_likely_tabular(
        [["x", None, None, None], [None] * 4, [None] * 4]
    )
    # ordinary dense grid passes
    assert is_likely_tabular([["a", "b"], ["c", "d"]])
