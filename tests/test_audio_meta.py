"""Compressed-audio metadata (functions/audio_meta.py): hand-built MP3
frames and Ogg pages with hand-computed expectations."""

import struct

from kiwi_spark.functions.audio_meta import probe_audio, probe_mp3, probe_ogg


# --- MP3 -------------------------------------------------------------------

def mp3_frame(bitrate_idx=9, rate_idx=0, padding=0, mono=False,
              version_bits=0b11) -> bytes:
    """One MPEG Layer-III frame: header + zero payload of the exact
    length the header implies."""
    b1 = 0xE0 | (version_bits << 3) | (0b01 << 1) | 1  # layer III, no CRC
    b2 = (bitrate_idx << 4) | (rate_idx << 2) | (padding << 1)
    b3 = (0b11 << 6) if mono else 0
    header = bytes([0xFF, b1, b2, b3])
    if version_bits == 0b11:  # MPEG-1
        bitrate = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                   256, 320][bitrate_idx] * 1000
        rate = [44100, 48000, 32000][rate_idx]
        samples = 1152
    else:                     # MPEG-2
        bitrate = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                   160][bitrate_idx] * 1000
        rate = [22050, 24000, 16000][rate_idx]
        samples = 576
    frame_len = samples // 8 * bitrate // rate + padding
    return header + bytes(frame_len - 4)


def id3v2(payload_size: int) -> bytes:
    return b"ID3\x03\x00\x00" + bytes(
        [(payload_size >> 21) & 0x7F, (payload_size >> 14) & 0x7F,
         (payload_size >> 7) & 0x7F, payload_size & 0x7F]
    ) + bytes(payload_size)


def test_mp3_frame_walk_duration():
    # 10 MPEG-1 frames at 128kbps/44100: 1152 samples each → 261 ms
    data = mp3_frame() * 10
    assert probe_mp3(data) == ("mp3", 44100, 2, 261)
    # with an ID3v2 tag in front and trailing junk behind
    data = id3v2(100) + mp3_frame(mono=True) * 4 + b"TAGjunk"
    got = probe_mp3(data)
    assert got == ("mp3", 44100, 1, round(4 * 1152 * 1000 / 44100))


def test_mp3_vbr_and_mpeg2():
    # VBR: alternating bitrates still walk (frame length follows header)
    data = mp3_frame(bitrate_idx=9) + mp3_frame(bitrate_idx=14) + mp3_frame(
        bitrate_idx=5, padding=1
    )
    assert probe_mp3(data) == ("mp3", 44100, 2, round(3 * 1152 * 1000 / 44100))
    # MPEG-2 Layer III: 576 samples at 22050
    data = mp3_frame(version_bits=0b10, rate_idx=0) * 5
    assert probe_mp3(data) == ("mp3", 22050, 2, round(5 * 576 * 1000 / 22050))


# --- Ogg -------------------------------------------------------------------

def ogg_page(granule: int, body: bytes, seq: int = 0, first: bool = False) -> bytes:
    lacing = []
    remaining = len(body)
    while remaining >= 255:
        lacing.append(255)
        remaining -= 255
    lacing.append(remaining)
    return (
        b"OggS" + bytes([0, 0x02 if first else 0])
        + struct.pack("<q", granule)
        + struct.pack("<I", 1) + struct.pack("<I", seq)
        + struct.pack("<I", 0)                 # crc (unchecked)
        + bytes([len(lacing)]) + bytes(lacing) + body
    )


def vorbis_ident(channels=2, rate=44100) -> bytes:
    return (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
        + struct.pack("<I", rate) + bytes(16)
    )


def opus_head(channels=2, rate=48000, pre_skip=312) -> bytes:
    return (
        b"OpusHead" + bytes([1, channels]) + struct.pack("<H", pre_skip)
        + struct.pack("<I", rate) + bytes(3)
    )


def test_ogg_vorbis():
    data = (
        ogg_page(0, vorbis_ident(), 0, first=True)
        + ogg_page(44100, bytes(10), 1)
        + ogg_page(88200 + 2205, bytes(10), 2)
    )
    assert probe_ogg(data) == ("vorbis", 44100, 2, 2050)


def test_ogg_opus_pre_skip():
    # Opus granules run at 48 kHz regardless of input rate; pre-skip
    # subtracts from the final granule (RFC 7845 §4)
    data = (
        ogg_page(0, opus_head(channels=1, rate=16000), 0, first=True)
        + ogg_page(48000 + 312, bytes(10), 1)
    )
    assert probe_ogg(data) == ("opus", 16000, 1, 1000)


def test_malformed_audio_returns_none():
    assert probe_audio(b"") is None
    assert probe_audio(b"\x00" * 64) is None
    assert probe_audio(b"OggS" + bytes(10)) is None
    assert probe_audio(b"\xff\xfb") is None  # lone sync, no full frame


def test_probe_audio_operator(spark):
    from kiwi_spark.operators.multimodal import (
        ASSET_SCHEMA,
        probe_audio_metadata,
    )

    assets = spark.createDataFrame(
        [
            ("a1", "u1", "audio", bytearray(mp3_frame() * 10),
             ("audio/mpeg", None, None, None)),
            ("a2", "u1", "audio",
             bytearray(ogg_page(0, vorbis_ident(), 0, True) + ogg_page(44100, b"x", 1)),
             ("audio/ogg", None, None, None)),
            ("a3", "u1", "audio", bytearray(b"noise"), (None, None, None, None)),
        ],
        schema=ASSET_SCHEMA,
    )
    rows = {r["asset_id"]: r for r in probe_audio_metadata(assets).collect()}
    assert rows["a1"]["codec"] == "mp3" and rows["a1"]["duration_ms"] == 261
    assert rows["a2"]["codec"] == "vorbis" and rows["a2"]["duration_ms"] == 1000
    assert rows["a3"]["codec"] is None


def test_mp3_false_sync_in_leading_junk():
    """A random byte pair that looks like a frame header must not anchor
    the walk: the implied next-frame position carries no sync, so the
    prober resyncs and reports the REAL frame run (review finding)."""
    junk = bytes([0xFF, 0xFB, 0x92, 0x00]) + bytes(100)
    data = junk + mp3_frame() * 10
    assert probe_mp3(data) == ("mp3", 44100, 2, 261)
    # false sync whose implied frame overruns the buffer, then real frames
    data = bytes([0xFF, 0xFB, 0xE2, 0x00]) + mp3_frame() * 10
    got = probe_mp3(data)
    assert got is not None and got[3] == 261


def test_ogg_chained_streams_sum_and_multiplex_isolation():
    """Chained Ogg (two concatenated logical streams, granule restarting)
    sums durations; a multiplexed non-audio stream's pages are ignored."""
    chain1 = (
        ogg_page(0, vorbis_ident(), 0, first=True)
        + ogg_page(44100, b"x", 1)
    )
    # second chain: new serial — rebuild pages with serial 2
    def page2(granule, body, seq, first=False):
        p = bytearray(ogg_page(granule, body, seq, first))
        struct.pack_into("<I", p, 14, 2)
        return bytes(p)
    chain2 = page2(0, vorbis_ident(rate=22050), 0, True) + page2(22050, b"y", 1)
    got = probe_ogg(chain1 + chain2)
    # 1 s at 44.1k + 1 s at 22.05k; codec/rate reported from the FIRST
    assert got == ("vorbis", 44100, 2, 2000)

    # multiplexed junk stream (serial 3, no recognizable ident): ignored
    def page3(granule, body, seq):
        p = bytearray(ogg_page(granule, body, seq))
        struct.pack_into("<I", p, 14, 3)
        return bytes(p)
    got = probe_ogg(chain1 + page3(999999, b"skeleton-ish", 0))
    assert got == ("vorbis", 44100, 2, 1000)


def test_ogg_chained_stream_reusing_serial_accumulates():
    """RFC 3533 only requires serials to be unique WITHIN a chain segment:
    a chained stream that reuses the serial restarts its granule at 0. The
    restart must bank the finished segment's duration, not overwrite it
    (ADVICE r5)."""
    data = (
        ogg_page(0, vorbis_ident(), 0, first=True)
        + ogg_page(44100, b"x", 1)
        # same serial (1), new chain: ident + granule restarting from 0
        + ogg_page(0, vorbis_ident(), 2, first=True)
        + ogg_page(22050, b"y", 3)
    )
    # 1 s (44100/44100) banked + 0.5 s (22050/44100) from the live chain
    assert probe_ogg(data) == ("vorbis", 44100, 2, 1500)


def test_ogg_zero_channels_reported_as_null():
    """channels == 0 in an ident header is declared-but-meaningless — map
    to NULL, not 0 (ADVICE r5)."""
    data = (
        ogg_page(0, vorbis_ident(channels=0), 0, first=True)
        + ogg_page(44100, b"x", 1)
    )
    assert probe_ogg(data) == ("vorbis", 44100, None, 1000)
