"""Compressed-audio metadata — MP3 (MPEG-1/2 Layer III) and Ogg
(Vorbis / Opus) — parsed from the public framing specs (ISO/IEC 11172-3
header layout; RFC 3533 Ogg pages; the Vorbis I identification header;
RFC 7845 OpusHead).

Amplitude features (rms/peak) genuinely need the codec (the documented
``decode_audio_features`` stub for lossy formats), but the triage
metadata — codec, sample rate, channels, duration — is pure structure:

* **MP3**: skip an ID3v2 tag, then walk sync-framed headers; each
  frame's byte length follows from (bitrate, sample rate, padding) and
  its sample count from the layer/version (1152 for MPEG-1 Layer III,
  576 for MPEG-2/2.5); duration = Σ samples / rate. VBR streams are
  handled by the walk itself (no Xing table needed).
* **Ogg**: pages carry a 64-bit granule position; duration = the LAST
  page's granule over the codec clock (Vorbis: the declared sample
  rate; Opus: 48 kHz less the OpusHead pre-skip). Channels/rate come
  from the first packet's identification header.

Malformed/foreign payloads return None — never raise.
"""

from __future__ import annotations

import struct

_MP3_BITRATES_V1_L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_MP3_BITRATES_V2_L3 = [
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
_MP3_RATES = {
    3: [44100, 48000, 32000],   # MPEG-1
    2: [22050, 24000, 16000],   # MPEG-2
    0: [11025, 12000, 8000],    # MPEG-2.5
}


def _skip_id3(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = (
        (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
        | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
    )
    return 10 + size


def probe_mp3(data: bytes):
    pos = _skip_id3(data)
    n_frames = 0
    total_samples = 0
    rate = None
    channels = None
    while pos + 4 <= len(data):
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if n_frames:
                break  # trailing garbage / tag after valid frames
            pos += 1
            continue
        version = (b1 >> 3) & 0x3        # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x3          # 1 = Layer III
        if version == 1 or layer != 1:
            if n_frames:
                break
            pos += 1
            continue
        bitrate_idx = (b2 >> 4) & 0xF
        rate_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if bitrate_idx in (0, 15) or rate_idx == 3:
            if n_frames:
                break
            pos += 1
            continue
        table = _MP3_BITRATES_V1_L3 if version == 3 else _MP3_BITRATES_V2_L3
        bitrate = table[bitrate_idx] * 1000
        rate = _MP3_RATES[version][rate_idx]
        samples = 1152 if version == 3 else 576
        frame_len = samples // 8 * bitrate // rate + padding
        if frame_len <= 4 or pos + frame_len > len(data):
            break
        channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
        n_frames += 1
        total_samples += samples
        pos += frame_len
    if n_frames == 0 or not rate:
        return None
    return "mp3", rate, channels, int(round(total_samples * 1000.0 / rate))


def _ogg_pages(data: bytes):
    pos = 0
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            return
        (granule,) = struct.unpack_from("<q", data, pos + 6)
        n_segs = data[pos + 26]
        if pos + 27 + n_segs > len(data):
            return
        lacing = data[pos + 27 : pos + 27 + n_segs]
        body_start = pos + 27 + n_segs
        body_len = sum(lacing)
        if body_start + body_len > len(data):
            return
        yield granule, data[body_start : body_start + body_len]
        pos = body_start + body_len


def probe_ogg(data: bytes):
    if data[:4] != b"OggS":
        return None
    codec = None
    rate = None
    channels = None
    clock = None            # granule units per second
    pre_skip = 0
    last_granule = None
    for granule, body in _ogg_pages(data):
        if codec is None:
            if body.startswith(b"\x01vorbis") and len(body) >= 16:
                codec = "vorbis"
                channels = body[11]
                (rate,) = struct.unpack_from("<I", body, 12)
                clock = rate
            elif body.startswith(b"OpusHead") and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                (pre_skip,) = struct.unpack_from("<H", body, 10)
                (rate,) = struct.unpack_from("<I", body, 12)
                clock = 48000  # Opus granules are always 48 kHz
            else:
                return None
        if granule >= 0:
            last_granule = granule
    if codec is None or not clock:
        return None
    duration_ms = None
    if last_granule is not None:
        effective = max(0, last_granule - (pre_skip if codec == "opus" else 0))
        duration_ms = int(round(effective * 1000.0 / clock))
    return codec, rate or None, channels, duration_ms


def probe_audio(data: bytes):
    """(codec, sample_rate, n_channels, duration_ms) or None."""
    try:
        return probe_ogg(data) or probe_mp3(data)
    except (struct.error, IndexError, OverflowError):
        return None
