"""Container-level video metadata (functions/video_meta.py): hand-built
ISO-BMFF and EBML/Matroska fixtures with hand-computed expectations —
structure parsing only, no codec."""

import struct

from kiwi_spark.functions.video_meta import (
    probe_isobmff,
    probe_matroska,
    probe_video,
)


# --- ISO-BMFF builders -----------------------------------------------------

def box(box_type: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + box_type + body


def mvhd_v0(timescale: int, duration: int) -> bytes:
    body = bytes(4)                       # version 0 + flags
    body += bytes(8)                      # ctime, mtime
    body += struct.pack(">II", timescale, duration)
    body += bytes(80)                     # rate..matrix..next_track_id
    return box(b"mvhd", body)


def tkhd_v0(width: int, height: int) -> bytes:
    body = bytearray(84)
    struct.pack_into(">II", body, 76, width << 16, height << 16)
    return box(b"tkhd", bytes(body))


def mp4(width=640, height=360, timescale=1000, duration=5000) -> bytes:
    moov = box(
        b"moov",
        mvhd_v0(timescale, duration) + box(b"trak", tkhd_v0(width, height)),
    )
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def test_isobmff_dimensions_and_duration():
    got = probe_isobmff(mp4())
    assert got == ("mp4", 640, 360, 5000)
    # odd timescale → rounded milliseconds: 90000 ticks at 90kHz = 1000ms
    got = probe_isobmff(mp4(timescale=90000, duration=135000))
    assert got == ("mp4", 640, 360, 1500)


def test_isobmff_audio_track_skipped():
    """A zero-dimension (audio) tkhd before the video trak must not win."""
    moov = box(
        b"moov",
        mvhd_v0(600, 1200)
        + box(b"trak", tkhd_v0(0, 0))
        + box(b"trak", tkhd_v0(1920, 1080)),
    )
    data = box(b"ftyp", b"mp42" + bytes(8)) + moov
    assert probe_isobmff(data) == ("mp4", 1920, 1080, 2000)


def test_isobmff_largesize_box():
    """64-bit largesize (size==1) boxes parse."""
    inner = mvhd_v0(1000, 250) + box(b"trak", tkhd_v0(320, 240))
    large = (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(inner))
        + inner
    )
    data = box(b"ftyp", b"isom" + bytes(8)) + large
    assert probe_isobmff(data) == ("mp4", 320, 240, 250)


# --- EBML builders ---------------------------------------------------------

def evint_size(n: int) -> bytes:
    """1-4 byte EBML size with marker."""
    if n < 0x7F:
        return bytes([0x80 | n])
    if n < 0x3FFF:
        return bytes([0x40 | (n >> 8), n & 0xFF])
    return bytes([0x10 | (n >> 24), (n >> 16) & 0xFF, (n >> 8) & 0xFF, n & 0xFF])


def elem(eid: bytes, body: bytes) -> bytes:
    return eid + evint_size(len(body)) + body


def mkv(width=1280, height=720, duration_s=12.5, webm=False,
        unknown_segment_size=False) -> bytes:
    header = elem(
        b"\x1a\x45\xdf\xa3",
        elem(b"\x42\x82", b"webm" if webm else b"matroska"),
    )
    info = elem(
        b"\x15\x49\xa9\x66",
        elem(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
        + elem(b"\x44\x89", struct.pack(">d", duration_s * 1000.0)),
    )
    video = elem(
        b"\xe0",
        elem(b"\xb0", width.to_bytes(2, "big"))
        + elem(b"\xba", height.to_bytes(2, "big")),
    )
    tracks = elem(b"\x16\x54\xae\x6b", elem(b"\xae", video))
    seg_body = info + tracks
    if unknown_segment_size:
        segment = b"\x18\x53\x80\x67" + b"\xff" + seg_body
    else:
        segment = elem(b"\x18\x53\x80\x67", seg_body)
    return header + segment


def test_matroska_and_webm():
    assert probe_matroska(mkv()) == ("mkv", 1280, 720, 12500)
    assert probe_matroska(mkv(webm=True)) == ("webm", 1280, 720, 12500)


def test_matroska_unknown_segment_size():
    """Streamed files leave the Segment size as all-ones (unknown) —
    children must parse to end of input (RFC 8794 unknown-size rule)."""
    assert probe_matroska(mkv(unknown_segment_size=True)) == (
        "mkv", 1280, 720, 12500
    )


def test_malformed_returns_none():
    assert probe_video(b"") is None
    assert probe_video(b"\x00" * 64) is None
    assert probe_video(b"RIFF....WEBP") is None
    assert probe_video(mp4()[:20]) is None or probe_video(mp4()[:20])[1] is None
    # truncated EBML never raises
    assert probe_video(mkv()[:10]) is None


def test_probe_operator(spark):
    from kiwi_spark.operators.multimodal import (
        ASSET_SCHEMA,
        probe_video_metadata,
    )

    assets = spark.createDataFrame(
        [
            ("v1", "u1", "video", bytearray(mp4()), ("video/mp4", None, None, None)),
            ("v2", "u1", "video", bytearray(mkv(webm=True)), ("video/webm", None, None, None)),
            ("v3", "u1", "video", bytearray(b"garbage"), (None, None, None, None)),
            ("i1", "u1", "image", bytearray(b"x"), (None, None, None, None)),
        ],
        schema=ASSET_SCHEMA,
    )
    rows = {r["asset_id"]: r for r in probe_video_metadata(assets).collect()}
    assert set(rows) == {"v1", "v2", "v3"}  # image rows filtered out
    assert (rows["v1"]["container"], rows["v1"]["width"], rows["v1"]["height"],
            rows["v1"]["duration_ms"]) == ("mp4", 640, 360, 5000)
    assert rows["v2"]["container"] == "webm" and rows["v2"]["width"] == 1280
    assert rows["v3"]["container"] is None and rows["v3"]["width"] is None


def test_mvhd_unknown_and_fragmented_durations_are_null():
    """All-ones duration ('cannot be determined') and duration 0
    (fragmented mp4 — real duration lives in mvex/mehd) must report
    NULL, not 49.7 days or 0 ms (review finding)."""
    moov = box(
        b"moov",
        mvhd_v0(1000, 0xFFFFFFFF) + box(b"trak", tkhd_v0(640, 360)),
    )
    data = box(b"ftyp", b"isom" + bytes(8)) + moov
    assert probe_isobmff(data) == ("mp4", 640, 360, None)
    moov = box(b"moov", mvhd_v0(1000, 0) + box(b"trak", tkhd_v0(640, 360)))
    data = box(b"ftyp", b"isom" + bytes(8)) + moov
    assert probe_isobmff(data) == ("mp4", 640, 360, None)


def test_matroska_first_video_track_wins():
    """A thumbnail/cover video track after the main track must not
    override the main track's dimensions (review finding)."""
    header = elem(b"\x1a\x45\xdf\xa3", elem(b"\x42\x82", b"matroska"))
    video = lambda w, h: elem(
        b"\xe0",
        elem(b"\xb0", w.to_bytes(2, "big")) + elem(b"\xba", h.to_bytes(2, "big")),
    )
    tracks = elem(
        b"\x16\x54\xae\x6b",
        elem(b"\xae", video(1920, 1080)) + elem(b"\xae", video(640, 360)),
    )
    segment = elem(b"\x18\x53\x80\x67", tracks)
    got = probe_matroska(header + segment)
    assert got == ("mkv", 1920, 1080, None)


def test_matroska_partial_first_track_blocks_later_merge():
    """A first video track carrying only PixelHeight must still block a
    later track: the guard is a saw-track flag, not `width`, so the result
    is the first track's (None, height) — never mixed-track dimensions
    (ADVICE r5)."""
    header = elem(b"\x1a\x45\xdf\xa3", elem(b"\x42\x82", b"matroska"))
    first = elem(b"\xe0", elem(b"\xba", (1080).to_bytes(2, "big")))  # h only
    second = elem(
        b"\xe0",
        elem(b"\xb0", (640).to_bytes(2, "big"))
        + elem(b"\xba", (360).to_bytes(2, "big")),
    )
    tracks = elem(b"\x16\x54\xae\x6b", elem(b"\xae", first) + elem(b"\xae", second))
    segment = elem(b"\x18\x53\x80\x67", tracks)
    assert probe_matroska(header + segment) == ("mkv", None, 1080, None)
