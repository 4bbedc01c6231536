"""Branch-coverage goldens for the markdown renderer — VERDICT r3 #5.

tests/goldens/html_branch_cases.json holds adversarial cases targeting
individual branches of the reference renderer (html.ts:53-177 and the
htmlparser2 parse semantics it inherits, html.ts:28-35): malformed /
implied-close HTML, uneven-width tables, nested-list renumbering, entity
edge cases, the blockquote bare-'>' quirk, img alt/title fallbacks, etc.
The TS renderer can't run offline (npm blocked), so every expected
output was derived by hand-executing the cited html.ts lines; the
``lines`` field on each case is the audit trail.

The coverage test enforces the checklist: every branch named in the
corpus' ``branches`` list must be exercised by at least one case, so a
future edit can't silently drop a pinned branch.
"""

from __future__ import annotations

import json
import os

import pytest

from kiwi_spark.functions.html_text import html_to_markdown

GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "goldens", "html_branch_cases.json"
)

with open(GOLDEN, encoding="utf-8") as fh:
    _DATA = json.load(fh)
CASES = _DATA["cases"]
BRANCHES = _DATA["branches"]


@pytest.mark.parametrize("case", CASES, ids=lambda c: c["id"])
def test_html_branch_golden(case):
    assert html_to_markdown(case["input"]) == case["expect_markdown"], case["lines"]


def test_branch_checklist_fully_covered():
    covered = {b for case in CASES for b in case["branches"]}
    missing = set(BRANCHES) - covered
    assert not missing, f"branches with no golden case: {sorted(missing)}"
    unknown = covered - set(BRANCHES)
    assert not unknown, f"cases reference unlisted branches: {sorted(unknown)}"


def test_spot_checks_pin_hand_derived_values():
    """A few load-bearing expectations restated inline, so the JSON can't
    drift to 'whatever the implementation outputs' without tripping review:
    these byte strings came from hand-executing html.ts."""
    by_id = {c["id"]: c for c in CASES}
    assert by_id["uneven-table-width-padding"]["expect_markdown"] == (
        "| h1 | h2 | h3 |\n| --- | --- | --- |\n| a |  |  |\n| x | y |  |"
    )
    assert by_id["nested-ol-renumber-indent"]["expect_markdown"] == (
        "1. first\n    1. inner one\n    2. inner two\n2. second"
    )
    assert by_id["blockquote-blank-line-markers"]["expect_markdown"] == (
        "> first\n>\n>\n>\n> second"
    )
    assert by_id["entities-nbsp-numeric-named"]["expect_markdown"] == (
        "a b & c AB ©"
    )
    assert by_id["code-backtick-escape"]["expect_markdown"] == "`run \\`x\\` now`"
