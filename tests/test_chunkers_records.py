"""Ports of the reference's structured-chunker test families.

Sources: chunking/__tests__/yaml.test.ts, toml.test.ts, transcript.test.ts
(ported case by case), plus chunker-level tests for email/calendar/vcard
derived from their loaders' markdown record formats (loader/email.ts
"# Email Message"/"## Message N", loader/calendar.ts "## Event N",
loader/vcard.ts "## Contact N").

Chunk sizes are in tokens of the repo's deterministic o200k substitute
(functions.tokens) — the structural expectations (split counts, preserved
headers, Path/Context prefixes) are tokenizer-independent.
"""

from __future__ import annotations

from kiwi_spark.functions.chunkers_records import (
    chunk_calendar,
    chunk_email,
    chunk_lines_with_prefix,
    chunk_toml,
    chunk_transcript,
    chunk_vcard,
    chunk_yaml,
)
from kiwi_spark.functions.chunkers_structured import chunk_for_type


# --- YAML (yaml.test.ts) ----------------------------------------------------

def test_yaml_empty():
    assert chunk_yaml("", 100) == []


def test_yaml_small_single_chunk():
    text = "server:\n  host: example.test\n  port: 443"
    assert chunk_yaml(text, 100) == [text]


def test_yaml_splits_top_level_sections():
    text = "\n".join(
        [
            "# deployment settings",
            "server:",
            "  description: " + "alpha " * 80,
            "database:",
            "  description: " + "beta " * 80,
        ]
    )
    chunks = chunk_yaml(text, 30)
    joined = "\n".join(chunks)
    assert len(chunks) > 1
    assert "# deployment settings" in joined
    assert "server:" in joined
    assert "database:" in joined


def test_yaml_path_and_context_for_oversized_nested():
    text = "\n".join(
        ["root:", "  child:", "    description: " + "alpha " * 100]
    )
    chunks = chunk_yaml(text, 24)
    joined = "\n".join(chunks)
    assert len(chunks) > 1
    assert "Path: $.root.child" in joined
    assert "Context:" in joined
    assert "root:" in joined


def test_yaml_list_item_context():
    text = "\n".join(
        [
            "services:",
            "  # primary service",
            "  - name: api",
            "    description: " + "alpha " * 100,
            "  - name: worker",
            "    description: " + "beta " * 100,
        ]
    )
    chunks = chunk_yaml(text, 24)
    joined = "\n".join(chunks)
    assert len(chunks) > 1
    assert "# primary service" in joined
    assert "Path: $.services[" in joined
    assert "name: api" in joined
    assert "name: worker" in joined


# --- TOML (toml.test.ts) ----------------------------------------------------

def test_toml_empty():
    assert chunk_toml("", 100) == []


def test_toml_small_single_chunk():
    text = '[server]\nhost = "example.test"\nport = 443'
    assert chunk_toml(text, 100) == [text]


def test_toml_splits_tables_keeping_headers():
    text = "\n".join(
        [
            "[server]",
            'description = "' + "alpha " * 80 + '"',
            "[database]",
            'description = "' + "beta " * 80 + '"',
        ]
    )
    chunks = chunk_toml(text, 30)
    joined = "\n".join(chunks)
    assert len(chunks) > 1
    assert "[server]" in joined
    assert "[database]" in joined


def test_toml_repeats_table_context_for_oversized_entries():
    text = "\n".join(
        ["[server]", 'description = "' + "alpha " * 100 + '"', "port = 443"]
    )
    chunks = chunk_toml(text, 24)
    joined = "\n".join(chunks)
    assert len(chunks) > 1
    assert "Path: $.server" in joined
    assert all("[server]" in c for c in chunks)


def test_toml_array_table_and_quoted_header():
    text = "\n".join(
        [
            '[[servers."primary.node"]]',
            'host = "api.example.test"',
            'description = "' + "alpha " * 100 + '"',
            "[database]",
            'description = "' + "beta " * 100 + '"',
        ]
    )
    chunks = chunk_toml(text, 24)
    joined = "\n".join(chunks)
    assert len(chunks) > 1
    assert '[[servers."primary.node"]]' in joined
    assert 'Path: $.servers["primary.node"][]' in joined
    assert "Path: $.database" in joined


# --- transcript (transcript.test.ts) ----------------------------------------

def test_transcript_empty():
    assert chunk_transcript("", 100) == []


def test_transcript_groups_segments_with_metadata():
    text = "\n".join(
        [
            "# Audio Transcript",
            "",
            "- Language: en",
            "- Duration: 00:00:10.000",
            "",
            "## Segment 1",
            "- Time: 00:00:00.000 --> 00:00:05.000",
            "- Speaker: Alice",
            "",
            "Alpha " * 80,
            "",
            "## Segment 2",
            "- Time: 00:00:05.000 --> 00:00:10.000",
            "- Speaker: Bob",
            "",
            "Beta " * 80,
        ]
    )
    chunks = chunk_transcript(text, 50)
    assert len(chunks) > 1
    assert all(c.startswith("# Audio Transcript") for c in chunks)
    assert any("## Segment 1" in c for c in chunks)
    assert any("## Segment 2" in c for c in chunks)


def test_transcript_fallback_line_chunking():
    text = "\n".join(
        [
            "# Audio Transcript",
            "",
            "- Time: unknown",
            "- Speaker: Speaker unknown",
            "",
            "\n".join(f"Loose transcript sentence {i}." for i in range(80)),
        ]
    )
    chunks = chunk_transcript(text, 40)
    joined = "\n".join(chunks)
    assert len(chunks) > 1
    assert "Loose transcript sentence 0." in joined
    assert "Loose transcript sentence 79." in joined


def test_transcript_repeats_segment_metadata_on_split():
    text = "\n".join(
        [
            "# Audio Transcript",
            "",
            "## Segment 1",
            "- Time: 00:00:00.000 --> 00:01:00.000",
            "- Speaker: Alice",
            "",
            " ".join(f"Sentence {i}." for i in range(80)),
        ]
    )
    chunks = chunk_transcript(text, 35)
    assert len(chunks) > 1
    assert all("## Segment 1" in c for c in chunks)
    assert all("- Speaker: Alice" in c for c in chunks)
    assert all("- Time: 00:00:00.000 --> 00:01:00.000" in c for c in chunks)


# --- email --------------------------------------------------------------

def _email_doc(n_messages: int, body_words: int) -> str:
    parts = ["# Email Thread", ""]
    for i in range(1, n_messages + 1):
        parts += [
            f"## Message {i}",
            f"- From: sender{i}@example.test",
            f"- Subject: Update {i}",
            "",
            f"body{i} " * body_words,
            "",
        ]
    return "\n".join(parts)


def test_email_small_single_chunk():
    text = _email_doc(2, 5).strip()
    assert chunk_email(text, 500) == [text]


def test_email_packs_messages_under_preamble():
    chunks = chunk_email(_email_doc(4, 60), 80)
    assert len(chunks) > 1
    assert all(c.startswith("# Email Thread") for c in chunks)
    joined = "\n".join(chunks)
    for i in range(1, 5):
        assert f"## Message {i}" in joined


def test_email_oversized_message_split_with_preamble():
    chunks = chunk_email(_email_doc(1, 400), 40)
    assert len(chunks) > 1
    assert all("# Email Thread" in c for c in chunks)


# --- calendar -------------------------------------------------------------

def _calendar_doc(n_events: int, body_words: int) -> str:
    parts = ["# Calendar", ""]
    for i in range(1, n_events + 1):
        parts += [
            f"## Event {i}",
            f"- Summary: event {i}",
            "",
            f"details{i} " * body_words,
            "",
        ]
    return "\n".join(parts)


def test_calendar_one_record_per_chunk():
    chunks = chunk_calendar(_calendar_doc(3, 30), 150)
    assert len(chunks) == 3
    assert all(c.startswith("# Calendar") for c in chunks)
    for i, c in enumerate(chunks, 1):
        assert f"## Event {i}" in c


def test_calendar_oversized_record_line_split():
    chunks = chunk_calendar(_calendar_doc(1, 400), 40)
    assert len(chunks) > 1
    assert all("# Calendar" in c for c in chunks)


# --- vcard ---------------------------------------------------------------

def test_vcard_one_contact_per_chunk():
    text = "\n".join(
        [
            "# Contacts",
            "",
            "## Contact 1",
            "- Name: Ada Lovelace",
            "- Email: ada@example.test",
            "",
            "## Contact 2",
            "- Name: Alan Turing",
            "- Email: alan@example.test",
        ]
    )
    chunks = chunk_vcard(text, 25)
    assert len(chunks) == 2
    assert "Ada Lovelace" in chunks[0]
    assert "Alan Turing" in chunks[1]
    assert all(c.startswith("# Contacts") for c in chunks)


# --- chunkLinesWithPrefix edge cases (structured.ts) -----------------------

def test_chunk_lines_long_single_token_char_window():
    # a single 4000-char "word" must be split by character windows
    chunks = chunk_lines_with_prefix(["x" * 4000], 20, prefix="Path: $.blob")
    assert len(chunks) > 1
    assert all(c.startswith("Path: $.blob") for c in chunks)
    body = "".join(c.split("\n", 1)[1] for c in chunks)
    assert body == "x" * 4000


def test_chunk_lines_drops_empty_chunks():
    assert chunk_lines_with_prefix(["", "   ", ""], 10) == []


# --- factory dispatch (factory.ts:42-96) -----------------------------------

def test_factory_selects_record_chunkers():
    yaml_text = "a:\n  b: " + "x " * 900
    assert chunk_for_type("yaml", yaml_text) == chunk_yaml(yaml_text, 500)
    toml_text = "[t]\nk = \"" + "x " * 900 + "\""
    assert chunk_for_type("toml", toml_text) == chunk_toml(toml_text, 500)
    email_text = _email_doc(3, 300)
    assert chunk_for_type("email", email_text) == chunk_email(email_text, 500)
    cal_text = _calendar_doc(3, 300)
    assert chunk_for_type("calendar", cal_text) == chunk_calendar(cal_text, 500)
